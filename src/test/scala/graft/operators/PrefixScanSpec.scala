package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** PrefixScan must equal the reference single-partition window on data
  * engineered to cross chunk boundaries: shuffled arrival order, duplicate
  * order keys with composite tie-breaks, negative deltas, skewed key
  * ranges. The gate corpus is fully in-order (all lateness 0), so this
  * spec is where the carry path actually gets exercised.
  */
class PrefixScanSpec extends AnyFunSuite with SparkFixture {

  private def refWindow(orderCols: Seq[org.apache.spark.sql.Column]) =
    Window.orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  test("runningMax equals unpartitioned window on out-of-order values") {
    import spark.implicits._
    // Deterministic pseudo-shuffle: value depends on a hash of the id, so
    // the running max rises and falls; ids are skewed (dense + sparse tail)
    // so several chunks are empty and one is hot.
    val df = (1 to 5000).map { i =>
      val id = if (i <= 4500) i.toLong else 4500L + (i - 4500L) * 997L
      val v = ((id * 2654435761L) % 10000L + 10000L) % 10000L
      (id, v)
    }.toDF("id", "v")
    val got = PrefixScan
      .runningMax(df, "id", Seq(col("id")), "v", "run_max", nChunks = 16)
      .select("id", "run_max")
    val want = df.select(col("id"),
      max("v").over(refWindow(Seq(col("id")))).as("run_max"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("runningSum with negative deltas and composite tie-break order") {
    import spark.implicits._
    // Interval boundaries: many collisions on t (t = i % 50), +1/-1 deltas,
    // tie-break (delta desc, seq) — the q_concurrency shape.
    val df = (1 to 2000).map { i =>
      (i % 50L, if (i % 2 == 0) 1L else -1L, i.toLong)
    }.toDF("t", "delta", "seq")
    val order = Seq(col("t"), col("delta").desc, col("seq"))
    val got = PrefixScan
      .runningSum(df, "t", order, "delta", "run", nChunks = 7)
      .select("t", "seq", "run")
    val want = df.select(col("t"), col("seq"),
      sum("delta").over(refWindow(order)).as("run"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("exclusive runningSum/runningMax match the strictly-preceding frame") {
    import spark.implicits._
    val df = (1 to 3000).map { i =>
      val id = i.toLong * 3L % 4099L // permuted ids, many chunk crossings
      (id, (id * 48271L) % 1000L)
    }.toDF("id", "v")
    val excl = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    val gotSum = PrefixScan.runningSum(df, "id", Seq(col("id")), "v", "s",
      nChunks = 16, exclusive = true).select("id", "s")
    val wantSum = df.select(col("id"),
      coalesce(sum("v").over(excl), lit(0L)).as("s"))
    assert(gotSum.except(wantSum).isEmpty && wantSum.except(gotSum).isEmpty)
    val gotMax = PrefixScan.runningMax(df, "id", Seq(col("id")), "v", "m",
      nChunks = 16, exclusive = true).select("id", "m")
    val wantMax = df.select(col("id"), max("v").over(excl).as("m"))
    assert(gotMax.except(wantMax).isEmpty && wantMax.except(gotMax).isEmpty)
    // first row in order has an empty exclusive frame: sum 0, max null
    val first = gotSum.join(gotMax, "id").orderBy("id").limit(1).collect()(0)
    assert(first.getAs[Long]("s") == 0L && first.isNullAt(first.fieldIndex("m")))
  }

  test("rowNumber equals unpartitioned row_number over a desc order") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i * 7919L) % 100L))
      .toDF("k", "score").withColumn("neg", -col("score"))
    val got = PrefixScan.rowNumber(df, "neg",
      Seq(col("score").desc, col("k")), "rn", nChunks = 8).select("k", "rn")
    val want = df.select(col("k"),
      row_number().over(Window.orderBy(col("score").desc, col("k")))
        .cast("long").as("rn"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("equi-depth chunking balances planted skew; value-range degrades") {
    import spark.implicits._
    // 9990 keys packed into [1, 1000] plus 10 outliers near 1e12: the
    // value-range width becomes ~1e9, so every dense key lands in chunk 0
    // — one hot local-window task. Equi-depth boundaries follow the ROW
    // distribution instead.
    val df = ((1 to 9990).map(i => (i % 1000L + 1L, 1L)) ++
      (1 to 10).map(i => (1000000000000L + i, 1L))).toDF("k", "v")
    def maxShare(equiDepth: Boolean): Double = {
      val counts = PrefixScan.assignChunks(df, "k", 16, equiDepth)
        .groupBy("__chunk").count().select("count").as[Long].collect()
      counts.max.toDouble / counts.sum
    }
    assert(maxShare(equiDepth = false) > 0.9,
      "planted skew should degenerate value-range chunking (sanity)")
    assert(maxShare(equiDepth = true) < 0.25,
      "equi-depth chunks must follow the row distribution")
    // And the scan result is IDENTICAL under either chunking.
    val order = Seq(col("k"))
    val got = PrefixScan.runningSum(df.dropDuplicates("k"), "k", order,
      "v", "run", nChunks = 16, equiDepth = true).select("k", "run")
    val want = df.dropDuplicates("k").select(col("k"),
      sum("v").over(refWindow(order)).as("run"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("single distinct chunk key and empty input degenerate safely") {
    import spark.implicits._
    val same = Seq((7L, 1L, 1L), (7L, 2L, 2L), (7L, 3L, 3L)).toDF("k", "v", "s")
    val got = PrefixScan
      .runningSum(same, "k", Seq(col("k"), col("s")), "v", "run")
      .orderBy("s").select("run").as[Long].collect()
    assert(got.toSeq == Seq(1L, 3L, 6L))
    val empty = same.where(lit(false))
    assert(PrefixScan.runningMax(empty, "k", Seq(col("k")), "v", "m").count() == 0)
  }
}
