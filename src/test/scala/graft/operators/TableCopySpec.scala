package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class TableCopySpec extends AnyFunSuite with SparkFixture {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-copy-test").toString

  test("copyTable roundtrips rows and schema exactly") {
    val dest = tmpDir()
    val n = TableCopy.copyTable(spark, sf, dest, "nation")
    assert(n == 25)
    val src = Tables.load(spark, sf, "nation")
    val back = spark.read.parquet(s"$dest/nation.parquet")
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("truncate mode replaces, append mode accumulates") {
    val dest = tmpDir()
    TableCopy.copyTable(spark, sf, dest, "region", TableCopy.Truncate)
    TableCopy.copyTable(spark, sf, dest, "region", TableCopy.Truncate)
    assert(spark.read.parquet(s"$dest/region.parquet").count() == 5)
    TableCopy.copyTable(spark, sf, dest, "region", TableCopy.Append)
    assert(spark.read.parquet(s"$dest/region.parquet").count() == 10)
  }

  test("copyTables honors include/exclude and reports a manifest") {
    val dest = tmpDir()
    val manifest = TableCopy.copyTables(spark, sf, dest,
      include = Seq("region", "nation", "supplier"), exclude = Seq("supplier"))
    val rows = manifest.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("nation" -> 25L, "region" -> 5L))
  }

  test("schemaManifest lists every column with ordinal and canonical type") {
    val m = TableCopy.schemaManifest(spark, sf, Seq("nation")).collect()
    assert(m.map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((1, "n_nationkey", "int"), (2, "n_name", "string"), (3, "n_regionkey", "int")))
  }

  test("parallel copyTables produces the same manifest as sequential") {
    val seqDest = tmpDir()
    val parDest = tmpDir()
    val tables = Seq("region", "nation", "customer", "supplier", "part")
    val sequential = TableCopy.copyTables(spark, sf, seqDest, include = tables)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val parallel = TableCopy.copyTables(spark, sf, parDest, include = tables,
      parallelism = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(parallel == sequential)
    assert(parallel.keySet == tables.toSet)
  }

  test("predicate copy replicates only matching rows; column copy only selected columns") {
    val dest = tmpDir()
    val n = TableCopy.copyTable(spark, sf, dest, "customer",
      columns = Seq("c_custkey", "c_mktsegment"),
      predicate = Some("c_mktsegment = 'BUILDING'"))
    val expected = Tables.load(spark, sf, "customer")
      .where("c_mktsegment = 'BUILDING'").count()
    assert(n == expected && n > 0)
    val back = spark.read.parquet(s"$dest/customer.parquet")
    assert(back.columns.toSeq == Seq("c_custkey", "c_mktsegment"))
    assert(back.where("c_mktsegment <> 'BUILDING'").count() == 0)
  }

  test("maxRecordsPerFile bounds output file sizes like a bulk-copy batch size") {
    val dest = tmpDir()
    val n = TableCopy.copyTable(spark, sf, dest, "orders",
      maxRecordsPerFile = Some(200L))
    assert(n == 1500)
    val files = new java.io.File(s"$dest/orders.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 1500 / 200) // at least ceil(rows/cap) files overall
    files.foreach { f =>
      val rows = spark.read.parquet(f.getPath).count()
      assert(rows <= 200, s"${f.getName} has $rows rows")
    }
  }

  test("partitionedRead reassembles the table exactly, regardless of partition count") {
    val full = Tables.load(spark, sf, "orders").count()
    Seq(1, 3, 8, 100).foreach { n =>
      val got = TableCopy.partitionedRead(spark, sf, "orders", "o_orderkey", n)
      assert(got.count() == full, s"numPartitions=$n")
      assert(got.select("o_orderkey").distinct().count() == full)
    }
  }
}
