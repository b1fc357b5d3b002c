package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based laws for the incremental-copy algebra ([[TableCopy.upsert]]
  * / [[TableCopy.diffTables]]), run by sbt's native scalacheck integration.
  * Keys are drawn from a tiny domain so collisions (the interesting case)
  * are frequent; values include nulls to exercise the null-safe compare.
  */
object TableCopyLawsSpec extends Properties("TableCopyLaws") {

  // Fewer cases than scalacheck's default: every case runs Spark jobs.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private type Row3 = (Long, Option[String], Double)

  private val genRow: Gen[Row3] = for {
    k <- Gen.choose(0L, 9L) // tiny key domain -> frequent collisions
    s <- Gen.option(Gen.oneOf("a", "b", "c"))
    v <- Gen.oneOf(0.0, 1.5, -2.25)
  } yield (k, s, v)

  /** Distinct keys within one table (an upsert source/dest is keyed). */
  private val genTable: Gen[List[Row3]] =
    Gen.listOfN(12, genRow).map(_.groupBy(_._1).values.map(_.head).toList)

  private def df(rows: List[Row3]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "payload", "v")
  }

  private def rowSet(d: DataFrame): Set[(Long, Option[String], Double)] =
    d.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), r.getDouble(2))).toSet

  property("upsert is idempotent") = Prop.forAll(genTable, genTable) { (src, dst) =>
    val once = TableCopy.upsert(df(src), df(dst), Seq("k"))
    val twice = TableCopy.upsert(df(src), once, Seq("k"))
    rowSet(once) == rowSet(twice)
  }

  property("after upsert, diff vs source reports nothing missing or changed") =
    Prop.forAll(genTable, genTable) { (src, dst) =>
      val merged = TableCopy.diffTables(df(src),
        TableCopy.upsert(df(src), df(dst), Seq("k")), Seq("k"))
      merged.collect().forall { r =>
        r.getString(1) == "same" || r.getString(1) == "missing_in_source"
      }
    }

  property("upsert keeps exactly the unmatched destination rows") =
    Prop.forAll(genTable, genTable) { (src, dst) =>
      val srcKeys = src.map(_._1).toSet
      val expected = src.toSet ++ dst.filterNot(r => srcKeys(r._1)).toSet
      rowSet(TableCopy.upsert(df(src), df(dst), Seq("k"))) == expected
    }

  property("incremental view maintenance is split-invariant (merge == full recompute)") =
    Prop.forAll(Gen.choose(1, 28)) { splitDay =>
      // The maintained view must not depend on WHERE history was cut.
      val at = f"2024-01-$splitDay%02d"
      val got = TableCopy.maintainAggView(spark, "/root/testdata/sf0.001", at)
        .collect().map(_.toSeq).toSeq
      val full = TableCopy.maintainAggView(spark, "/root/testdata/sf0.001", "1900-01-01")
        .collect().map(_.toSeq).toSeq
      got == full
    }

  private val genTables: Gen[List[String]] =
    Gen.choose(1, 8).map(n => (1 to n).map(i => s"t$i").toList)

  private def genRels(tables: List[String]): Gen[List[(String, String)]] =
    Gen.listOfN(tables.length * 2, for {
      c <- Gen.oneOf(tables)
      p <- Gen.oneOf(tables)
    } yield (c, p))

  property("fkTopoOrder emits every table exactly once; acyclic prefixes respect parent-first") =
    Prop.forAll(genTables.flatMap(ts => genRels(ts).map(ts -> _))) { case (tables, rels) =>
      val (order, cyclic) = TableCopy.fkTopoOrder(tables, rels)
      val pos = order.zipWithIndex.toMap
      val cyc = cyclic.toSet
      // Permutation: all tables, exactly once, cyclic ⊆ tables.
      val permutation = order.sorted == tables.sorted && cyclic.forall(tables.contains)
      // Every FK edge between two ACYCLIC tables loads parent first (edges
      // touching the cyclic fallback group are deferred by the caller).
      val parentFirst = rels.forall { case (c, p) =>
        c == p || cyc(c) || cyc(p) || pos(p) < pos(c)
      }
      // Deterministic: same inputs, same order.
      val stable = TableCopy.fkTopoOrder(tables, rels)._1 == order
      permutation && parentFirst && stable
    }

  property("diff statuses partition the key universe") =
    Prop.forAll(genTable, genTable) { (src, dst) =>
      val d = TableCopy.diffTables(df(src), df(dst), Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val srcM = src.map(r => r._1 -> r).toMap
      val dstM = dst.map(r => r._1 -> r).toMap
      (srcM.keySet ++ dstM.keySet).forall { k =>
        d(k) match {
          case "missing_in_dest"   => srcM.contains(k) && !dstM.contains(k)
          case "missing_in_source" => !srcM.contains(k) && dstM.contains(k)
          case "same"              => srcM.get(k) == dstM.get(k)
          case "changed"           => srcM.contains(k) && dstM.contains(k) &&
                                      srcM(k) != dstM(k)
          case _                   => false
        }
      }
    }
}
