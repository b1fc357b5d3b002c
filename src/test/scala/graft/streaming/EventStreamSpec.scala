package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.streaming.EventStream.Event

class EventStreamSpec extends AnyFunSuite with SparkFixture {

  /** Explicit per-test checkpoint dir: the auto-created /tmp/temporary-*
    * checkpoint is deleted by an async shutdown hook that can race the
    * final micro-batch commit (the CANNOT_WRITE_STATE_STORE /
    * FileNotFoundException teardown flake); an explicit dir has no such
    * hook.
    */
  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("graft-ckpt").toString

  /** stop() then awaitTermination(): don't let the test (and its cleanup)
    * proceed while the query's last micro-batch is still committing.
    */
  private def stopClean(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Unit = {
    q.stop()
    q.awaitTermination()
  }

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 00:00 UTC

  test("windowedCounts aggregates into 10-minute tumbling windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(5), 11, "click", 2.0),
      Event(3, ts(12), 10, "view", 3.0),
      Event(4, ts(14), 12, "click", 4.0))
    val q = EventStream.windowedCounts(input.toDF())
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(5, ts(120), 10, "click", 5.0)) // advances watermark
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains((ts(0).getTime, "click", 2L, 3.0)))
      assert(rows.contains((ts(10).getTime, "view", 1L, 3.0)))
      assert(rows.contains((ts(10).getTime, "click", 1L, 4.0)))
    } finally stopClean(q)
  }

  test("windowedCounts on a parquet file stream equals the batch computation") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-stream").toString
    Files.copy(Paths.get(s"$sf/events.parquet"), Paths.get(s"$dir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Testdata has shipped events.ts in two physical shapes; normalize the
    // stream exactly as Tables.load normalizes the batch side (dual-shape).
    val rawSchema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(rawSchema).parquet(dir)
    val stream = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType => // MICROS, not UTC-adjusted
        raw.withColumn("ts", col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    val q = EventStream.windowedCounts(stream)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("wcfile")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          math.round(r.getDouble(3) * 100).toDouble / 100)).toSet
      val streamed = norm(spark.table("wcfile").collect())
      val batch = norm(EventStream.windowedCounts(
        graft.sources.Tables.load(spark, sf, "events")).collect())
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally stopClean(q)
  }

  test("windowedApproxUsers: stream equals batch bit-for-bit, estimate near exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 windows x 2 types with known distinct-user counts; users overlap
    // across windows so per-window distinct != global distinct.
    val events = (0 until 600).map { i =>
      Event(i, ts(i % 25 + (i % 3) * 10), i % (40 + (i % 3) * 25),
        if (i % 2 == 0) "click" else "view", 1.0)
    }
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventStream.windowedApproxUsers(input.toDF())
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("wau")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(9999, ts(120), 1, "click", 1.0)) // close all windows
      q.processAllAvailable()
      def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val streamed = norm(spark.table("wau").collect())
      // HLL merge is commutative/associative, so micro-batched execution
      // must reproduce the batch estimate EXACTLY, not approximately —
      // and the watermark driver closed every data window, so the two
      // sets must be EQUAL, not merely consistent.
      val batch = norm(EventStream.windowedApproxUsers(events.toDF())
        .collect().map(identity))
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed vs batch=$batch")
      // And the estimate itself is close to truth: within 3x the 5% rsd.
      import org.apache.spark.sql.functions.{countDistinct, window}
      val exact = events.toDF()
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(countDistinct("user_id").as("n")).collect()
        .map(r => (r.getStruct(0).getTimestamp(0).getTime, r.getString(1)) ->
          r.getLong(2)).toMap
      streamed.foreach { case (w, t, approx, _) =>
        val truth = exact((w, t)).toDouble
        assert(math.abs(approx - truth) / truth <= 0.15,
          s"window=$w type=$t approx=$approx exact=$truth")
      }
    } finally stopClean(q)
  }

  test("windowedCounts runs on a rate-micro-batch source (kafka-shaped unbounded input)") {
    // rate-micro-batch emits deterministic batches: 100 rows per batch, all
    // stamped with the batch's timestamp, advancing 10 minutes per batch —
    // a stand-in for a partitioned Kafka topic with event-time progress.
    val stream = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "100")
      .option("numPartitions", "2")
      .option("startTimestamp", "1704067200000")
      .option("advanceMillisPerBatch", "600000")
      .load()
      .selectExpr("value AS event_id", "timestamp AS ts", "value % 7 AS user_id",
        "CASE WHEN value % 2 = 0 THEN 'click' ELSE 'view' END AS event_type",
        "CAST(value % 10 AS DOUBLE) AS value")
    val q = EventStream.windowedCounts(stream)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("ratewc")
      .outputMode(OutputMode.Append()).start()
    try {
      // Unbounded source: let event time advance far enough past the
      // watermark for several windows to close, then check invariants.
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("ratewc").count() < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table("ratewc").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.length >= 4)
      // Every closed 10-minute window holds exactly one 100-row batch:
      // 50 clicks summing value%10 over even ids (=200), 50 views (=250).
      rows.foreach {
        case ("click", n, s) => assert(n == 50 && s == 200.0)
        case ("view", n, s) => assert(n == 50 && s == 250.0)
        case other => fail(s"unexpected row $other")
      }
    } finally stopClean(q)
  }

  test("stream-stream join pairs clicks with same-user views inside the time range") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "view", 1.0),  // within 10 min of click 1 -> pair
      Event(3, ts(30), 1, "view", 1.0), // outside the range -> no pair
      Event(4, ts(6), 2, "view", 1.0))  // other user -> no pair
    val q = EventStream.clickToView(input.toDF(), withinMinutes = 10)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("ctv")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(Event(5, ts(120), 3, "click", 1.0)) // advance both watermarks
      q.processAllAvailable()
      val pairs = spark.table("ctv").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id"))).toSet
      assert(pairs == Set((1L, 2L)), s"got $pairs")
    } finally stopClean(q)
  }

  test("stream-stream LEFT OUTER join emits unmatched clicks with nulls after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),  // gets a view -> matched pair
      Event(2, ts(5), 1, "view", 1.0),
      Event(3, ts(1), 2, "click", 1.0))  // no view ever -> null emission
    val q = EventStream.clickToViewOuter(input.toDF(), withinMinutes = 10)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("ctvo")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // Push BOTH sides' watermarks far past click 3's range end (the global
      // watermark is the MIN over all watermark nodes) so the engine can
      // prove no matching view will arrive and emits the null row.
      input.addData(Event(8, ts(240), 8, "click", 1.0), Event(9, ts(240), 9, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(10, ts(480), 8, "click", 1.0), Event(11, ts(480), 9, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ctvo").collect()
        .map(r => (r.getAs[Long]("click_id"),
          Option(r.getAs[java.lang.Long]("view_id")).map(_.toLong))).toSet
      assert(rows.contains((1L, Some(2L))), s"matched pair missing: $rows")
      assert(rows.contains((3L, None)), s"unmatched click not emitted with null: $rows")
    } finally stopClean(q)
  }

  test("heavyUsers tracks dominant users per shard with MG lower bounds across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventStream.Event]
    // Skewed stream: user 1 dominates shard 1, user 4 dominates shard 0
    // (shards = 2). Many singleton users pressure the m=3 counter budget.
    val heavy1 = (1 to 30).map(i => Event(100 + i, ts(i), 1, "click", 1.0))
    val heavy4 = (1 to 20).map(i => Event(200 + i, ts(i), 4, "view", 1.0))
    val noise = (1 to 8).map(i => Event(300 + i, ts(i), 5 + i * 2, "click", 1.0))
    input.addData(heavy1 ++ heavy4 ++ noise: _*)
    val q = EventStream.heavyUsers(input.toDS(), shards = 2, m = 3)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("heavy")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      input.addData((1 to 10).map(i => Event(400 + i, ts(40 + i), 1, "click", 1.0)): _*)
      q.processAllAvailable()
      // Update mode re-emits a shard's counters each batch: keep the last
      // emission per (shard, user).
      val rows = spark.table("heavy").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val latest = rows.zipWithIndex
        .groupBy { case ((s, u, _), _) => (s, u) }
        .map { case ((s, u), rs) => (s, u) -> rs.maxBy(_._2)._1._3 }
      // The true heavies survive counter pressure (MG guarantee: count >
      // n_shard/(m+1) is always tracked) and counts are lower bounds no
      // more than n_shard/(m+1) under truth.
      val trueCount1 = 40L // 30 + 10 across both batches
      val shard1Total = 40L + noise.count(e => e.user_id % 2 == 1)
      assert(latest.contains((1L, 1L)), s"user 1 missing: $latest")
      val c1 = latest((1L, 1L))
      assert(c1 <= trueCount1 && c1 >= trueCount1 - shard1Total / 4, s"c1=$c1")
      assert(latest.contains((0L, 4L)), s"user 4 missing: $latest")
      assert(latest((0L, 4L)) <= 20L)
      // State stays bounded: never more than m counters per shard emitted
      // in one batch.
      rows.groupBy(_._1).foreach { case (shard, rs) =>
        assert(rs.map(_._2).distinct.length <= 2 * 3, s"shard $shard counters")
      }
    } finally {
      stopClean(q)
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState accumulates per-user profiles across micro-batches (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventStream.Event]
    input.addData(
      Event(1, ts(0), 1, "click", 2.0),
      Event(2, ts(1), 1, "view", 3.0),
      Event(3, ts(2), 2, "click", 5.0))
    val q = EventStream.userProfile(input.toDS())
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("profiles")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      input.addData(Event(4, ts(10), 1, "purchase", 10.0)) // second batch folds into state
      q.processAllAvailable()
      // Update mode emits one row per touched user per batch; the LAST row
      // per user is the current profile.
      val latest = spark.table("profiles").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(latest(1L) == ((1L, 3L, 15.0, ts(10).getTime * 1000L)), s"user 1: ${latest(1L)}")
      assert(latest(2L) == ((2L, 1L, 5.0, ts(2).getTime * 1000L)), s"user 2: ${latest(2L)}")
    } finally {
      stopClean(q)
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("anomalyFlags scores events against the user's own running baseline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventStream.Event]
    // batch 1: five baseline observations for user 1 (n < minN at each —
    // no flags possible), plus an extreme value for user 2 whose state is
    // EMPTY (n=0 < minN — per-user baselines must not cross-contaminate).
    val base = Seq(10.0, 12.0, 11.0, 9.0, 8.0)
    input.addData(base.zipWithIndex.map { case (v, i) =>
      Event(i + 1L, ts(i), 1, "click", v) } :+ Event(90, ts(0), 2, "click", 500.0): _*)
    val q = EventStream.anomalyFlags(input.toDS())
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("anomalies")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("anomalies").collect().isEmpty, "no flags while n < minN")
      // batch 2: an extreme value for user 1 — flagged against the batch-1
      // baseline; a normal value for user 1 right after must NOT flag.
      input.addData(Event(100, ts(10), 1, "click", 100.0))
      q.processAllAvailable()
      input.addData(Event(101, ts(11), 1, "click", 10.5))
      q.processAllAvailable()
      val flags = spark.table("anomalies").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(flags.map(_._2).toSet == Set(100L), s"flags: ${flags.mkString(",")}")
      // z matches a local Welford replay of the baseline (order within the
      // first batch only perturbs M2 in low-order bits)
      val mean = base.sum / base.length
      val m2 = base.map(v => (v - mean) * (v - mean)).sum
      val sd = math.sqrt(m2 / (base.length - 1))
      val expectedZ = (100.0 - mean) / sd
      assert(math.abs(flags.head._4 - expectedZ) < 1e-3)
      assert(flags.head._1 == 1L && flags.head._3 == 100.0)
    } finally {
      stopClean(q)
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup drops repeated event ids with watermark-bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(1, ts(1), 10, "click", 1.0), // same-batch duplicate
      Event(2, ts(2), 11, "view", 2.0))
    val q = EventStream.dedupped(input.toDF())
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(Event(2, ts(3), 11, "view", 2.0)) // cross-batch duplicate
      input.addData(Event(3, ts(5), 12, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally stopClean(q)
  }

  test("stream-static join enriches events with dim attributes, statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (11L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(2), 11, "view", 2.0),
      Event(3, ts(3), 99, "click", 3.0)) // no dim row -> null tier
    val q = EventStream.enriched(input.toDF(), dim)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("tier"))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
      // Stateless: the micro-batch ran no streaming state store operator.
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally stopClean(q)
  }

  test("foreachBatch sink receives each append batch as an ordinary DataFrame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(5), 11, "click", 2.0),
      Event(3, ts(12), 10, "view", 3.0))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Double)]
    val sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => seen.synchronized {
        seen ++= batch.collect().map(r =>
          (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
      }
    val q = EventStream.windowedCounts(input.toDF())
      .writeStream.option("checkpointLocation", ckpt())
      .outputMode(OutputMode.Append()).foreachBatch(sink).start()
    try {
      input.addData(Event(4, ts(120), 10, "click", 5.0)) // advances watermark
      q.processAllAvailable()
      val got = seen.synchronized(seen.toSet)
      assert(got.contains((ts(0).getTime, "click", 2L, 3.0)))
      assert(got.contains((ts(10).getTime, "view", 1L, 3.0)))
    } finally stopClean(q)
  }

  test("sessionize splits on the idle gap and closes sessions as the watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // user 1: two sessions separated by > 30 min; user 2: one session.
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(60), 1, "click", 4.0),
      Event(4, ts(61), 1, "click", 8.0),
      Event(5, ts(0), 2, "view", 1.5))
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      def rows = spark.table("sess").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(4))).toSet
      // The first session of user 1 closes when the 60-minute event arrives
      // (processAllAvailable may also run a follow-up batch that fires
      // already-expired event-time timeouts, e.g. user 2's).
      assert(rows.contains((1L, 2, 3.0)))
      // Advance the watermark past user 2's timeout (0 + 30 < 61 already,
      // timeouts fire on the NEXT batch) with a fresh user-3 event.
      input.addData(Event(6, ts(120), 3, "click", 1.0))
      q.processAllAvailable()
      assert(rows.contains((2L, 1, 1.5)))
      // Watermark is now 120 > user 1's second-session timeout (61 + 30).
      // User 3's first session (minute 120) also closes: the 180-minute event
      // is beyond the 30-minute gap.
      input.addData(Event(7, ts(180), 3, "click", 1.0))
      q.processAllAvailable()
      assert(rows == Set((1L, 2, 3.0), (2L, 1, 1.5), (1L, 2, 12.0), (3L, 1, 1.0)))
    } finally stopClean(q)
  }

  test("observed metrics surface per-batch pipeline health without a second pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 2, "view", -3.0),
      Event(3, ts(9), 1, "click", 2.5))
    // observe() rides the existing micro-batch: row count and negative-value
    // count come out of the SAME pass that computes the aggregation — the
    // zero-cost monitoring hook a 100 TB pipeline needs (no second scan).
    val observed = input.toDF()
      .observe("ingest",
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("value") < 0, 1L)
            .otherwise(0L)).as("n_negative"))
    val q = EventStream.windowedCounts(observed)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("obs")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // processAllAvailable can run a trailing EMPTY batch (watermark
      // bookkeeping) whose metrics are all zero — read the batch that
      // actually ingested rows.
      val m = q.recentProgress.filter(_.numInputRows > 0).flatMap(p =>
        Option(p.observedMetrics.get("ingest"))).last
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Long]("n_negative") == 1L)
    } finally stopClean(q)
  }

  test("cdcApply merges keyed change batches into the destination, last writer wins") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val (src, dest, ckpt) = (s"$root/changes", s"$root/dest", s"$root/ckpt")
    val schema = Seq((1L, "x", 1L)).toDF("k", "payload", "seq").schema
    def run(): Unit = EventStream.cdcApply(spark,
      spark.readStream.schema(schema).parquet(src), dest, ckpt,
      keys = Seq("k"), seqColumn = "seq")
    def current: Map[Long, (String, Long)] =
      spark.read.parquet(s"$dest/current").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // Batch 1: k1, k2 — including an in-batch update of k1 (seq 2 wins).
    Seq((1L, "one-v1", 1L), (1L, "one-v2", 2L), (2L, "two-v1", 1L))
      .toDF("k", "payload", "seq").write.mode("append").parquet(src)
    run()
    assert(current == Map(1L -> (("one-v2", 2L)), 2L -> (("two-v1", 1L))))
    // Batch 2: update k2, insert k3; k1 must survive untouched.
    Seq((2L, "two-v2", 5L), (3L, "three-v1", 1L))
      .toDF("k", "payload", "seq").write.mode("append").parquet(src)
    run()
    assert(current == Map(1L -> (("one-v2", 2L)),
      2L -> (("two-v2", 5L)), 3L -> (("three-v1", 1L))))
  }

  test("incrementalCopy moves only new files on each run, never re-copying") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val (src, dest, ckpt) = (s"$root/src", s"$root/dest", s"$root/ckpt")
    val schema = Seq((1L, "a")).toDF("id", "val").schema
    Seq((1L, "a"), (2L, "b")).toDF("id", "val")
      .write.mode("append").parquet(src)
    val n1 = EventStream.incrementalCopy(spark, src, dest, ckpt, schema)
    assert(n1 == 2L)
    // A second run with no new input copies nothing.
    assert(EventStream.incrementalCopy(spark, src, dest, ckpt, schema) == 0L)
    // New files land; only they move.
    Seq((3L, "c")).toDF("id", "val").write.mode("append").parquet(src)
    assert(EventStream.incrementalCopy(spark, src, dest, ckpt, schema) == 1L)
    val got = spark.read.parquet(dest).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("psiMonitor: stream equals batch and flags a shifted-value window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // baseline: uniform over [0, 100) -> decile edges every 10, equal counts
    val edges = (1 to 9).map(q => q * 10.0 - 0.5)
    val baseCounts = Seq.fill(10)(100L)
    // window 0 reproduces the baseline shape; window 1 piles on one decile
    val events = (0 until 400).map { i =>
      if (i % 2 == 0) Event(i, ts(i % 9), i % 40, "click", (i % 100).toDouble)
      else Event(i, ts(10 + i % 9), i % 40, "view", 95.0)
    }
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventStream.psiMonitor(input.toDF(), edges, baseCounts)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("psimon")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(9999, ts(600), 1, "click", 1.0))
      q.processAllAvailable()
      def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSet
      val streamed = norm(spark.table("psimon").collect())
      val batch = norm(EventStream.psiMonitor(events.toDF(), edges, baseCounts)
        .collect())
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed vs batch=$batch")
      val w0 = streamed.find(_._1 == ts(0).getTime).get
      val w1 = streamed.find(_._1 == ts(10).getTime).get
      // the baseline-shaped window is quiet; the piled-up window pages
      assert(!w0._4, s"window 0 should not drift: $w0")
      assert(w1._4 && w1._3 > w0._3, s"window 1 must flag: $w1")
    } finally stopClean(q)
  }

  test("rateMonitor: stream equals batch and a spiked window flags high") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Bands: click λ=10 → [0.51, 19.49]; view λ=25 → [10, 40].
    // window 0: 10 clicks (normal) + 20 views (normal);
    // window 1: 40 clicks (high, > 19.49) + 1 view (low, < 10)
    val w0 = (0 until 10).map(i => Event(i, ts(i % 9), i, "click", 1.0)) ++
      (0 until 20).map(i => Event(100 + i, ts(i % 9), i, "view", 1.0))
    val w1 = (0 until 40).map(i => Event(200 + i, ts(10 + i % 9), i, "click", 1.0)) :+
      Event(300, ts(12), 1, "view", 1.0)
    val events = w0 ++ w1
    val baseline = Map("click" -> 10.0, "view" -> 25.0)
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventStream.rateMonitor(input.toDF(), baseline)
      .writeStream.option("checkpointLocation", ckpt()).format("memory")
      .queryName("ratemon").outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(9999, ts(600), 1, "click", 1.0)) // advance watermark
      q.processAllAvailable()
      def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getString(6))).toSet
      val streamed = norm(spark.table("ratemon").collect())
      val batch = norm(EventStream.rateMonitor(events.toDF(), baseline).collect())
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed vs batch=$batch")
      assert(streamed(((ts(0).getTime, "click", 10L, "normal"))))
      assert(streamed(((ts(0).getTime, "view", 20L, "normal"))))
      assert(streamed(((ts(10).getTime, "click", 40L, "high"))))
      assert(streamed(((ts(10).getTime, "view", 1L, "low"))))
    } finally stopClean(q)
  }

  test("jdbcUpsertSink merges micro-batches into Derby exactly once, replay is a no-op") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-upsink").toString
    val (src, ckpt) = (s"$root/src", s"$root/ckpt")
    val store = graft.operators.TableCopy.JdbcStore(
      "jdbc:derby:memory:upsink;create=true",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    val schema = Seq((1L, 10.0)).toDF("id", "amount").schema
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount")
      .write.mode("append").parquet(src)
    def run(): Unit = EventStream.jdbcUpsertSink(spark,
      spark.readStream.schema(schema).parquet(src), store, "sink_t",
      Seq("id"), ckpt)
    run()
    def state(): Map[Long, Double] = store.read(spark, "sink_t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state() == Map(1L -> 10.0, 2L -> 20.0))
    // no new files: nothing merges, nothing duplicates
    run()
    assert(state() == Map(1L -> 10.0, 2L -> 20.0))
    // a late file updates key 2 and inserts key 3 in one merge
    Seq((2L, 25.0), (3L, 30.0)).toDF("id", "amount")
      .write.mode("append").parquet(src)
    run()
    assert(state() == Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0))
    // crash-replay: re-deliver an already-committed batch id directly —
    // the ledger transaction must refuse it and leave the table untouched
    val replayed = EventStream.applyBatchUpsert(store, "sink_t", Seq("id"),
      Seq((2L, 999.0)).toDF("id", "amount"), batchId = 0L)
    assert(!replayed, "a committed batch id must be skipped")
    assert(state() == Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0))
    // a NEW batch id through the same path applies
    assert(EventStream.applyBatchUpsert(store, "sink_t", Seq("id"),
      Seq((4L, 40.0)).toDF("id", "amount"), batchId = 99L))
    assert(state() == Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("quarantineRoute splits each micro-batch by rule, exactly once per file") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-quar").toString
    val (src, dest, ckpt) = (s"$root/src", s"$root/dest", s"$root/ckpt")
    val schema = Seq((1L, 10.0)).toDF("id", "amount").schema
    Seq((1L, 10.0), (2L, -5.0), (3L, 3.0)).toDF("id", "amount")
      .write.mode("append").parquet(src)
    val rules = Seq("amount_nonpositive" -> (col("amount") <= 0.0))
    def run(): Unit = EventStream.quarantineRoute(spark,
      spark.readStream.schema(schema).parquet(src), dest, ckpt, rules)
    run()
    // Re-running with no new files must append NOTHING (checkpointed offsets).
    run()
    // A late file routes incrementally.
    Seq((4L, -1.0)).toDF("id", "amount").write.mode("append").parquet(src)
    run()
    val clean = spark.read.parquet(s"$dest/clean.parquet").collect()
      .map(_.getLong(0)).toSet
    val quar = spark.read.parquet(s"$dest/quarantine.parquet").collect()
      .map(r => (r.getLong(0), r.getAs[String]("reason"))).toSet
    assert(clean == Set(1L, 3L))
    assert(quar == Set((2L, "amount_nonpositive"), (4L, "amount_nonpositive")))
    // Crash-replay simulation: re-deliver batch 0's rows through the same
    // batch-id-keyed dynamic-partition-overwrite write. Idempotent sink =>
    // the replayed partition is overwritten in place, never double-appended.
    Seq((1L, 10.0), (3L, 3.0)).toDF("id", "amount")
      .withColumn("_batch_id", lit(0L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id").parquet(s"$dest/clean.parquet")
    val replayed = spark.read.parquet(s"$dest/clean.parquet").collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(replayed == Seq(1L, 3L), "replay of a committed batch must not duplicate rows")
  }

  test("sessionWindowAgg merges gap-overlapping events and closes on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),  // same session (10 < 0+30)
      Event(3, ts(60), 1, "click", 4.0))  // new session  (60 > 10+30)
    val q = EventStream.sessionWindowAgg(input.toDF(), gapMinutes = 30)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("swa")
      .outputMode(OutputMode.Append()).start()
    try {
      // Watermark (30 min behind max event time) must pass a session's END
      // before append mode emits it: 200 - 30 > 60 + 30.
      input.addData(Event(4, ts(200), 2, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("swa").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3), r.getDouble(4))).toSet
      assert(got == Set(
        (1L, ts(0).getTime, ts(40).getTime, 2L, 3.0),
        (1L, ts(60).getTime, ts(90).getTime, 1L, 4.0)))
    } finally stopClean(q)
  }

  test("sessionWindowAgg in batch mode agrees with Relational.sessionizeBatch") {
    val batch = graft.operators.Relational.sessionizeBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(2), r.getDouble(5))))
      .toMap // (user, first_us) -> (n_events, total)
    val events = graft.sources.Tables.load(spark, sf, "events")
    val got = EventStream.sessionWindowAgg(events, 30, watermark = None)
      .selectExpr("user_id", "unix_micros(session_start) AS s_us",
        "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == batch.size)
    got.foreach { case (uid, sUs, n, total) =>
      val (wantN, wantTotal) = batch((uid, sUs))
      assert(n == wantN, s"user $uid session@$sUs")
      assert(math.abs(total - wantTotal) < 1e-6, s"user $uid session@$sUs value")
    }
  }

  test("topTypesPerWindow emits each closed window's top-K equal to a batch rank") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 windows with distinct type mixes; ties broken by type name
    val events = (0 until 300).map { i =>
      val win = i % 3
      val tpe = (win, i % 10) match {
        case (0, d) if d < 5 => "click"       // w0: click 5, view 3, error 2
        case (0, d) if d < 8 => "view"
        case (0, _)          => "error"
        case (1, d) if d < 4 => "view"        // w1: view 4, signup 4, click 2 (tie)
        case (1, d) if d < 8 => "signup"
        case (1, _)          => "click"
        case (_, d) if d < 6 => "purchase"    // w2: purchase 6, error 4
        case _               => "error"
      }
      Event(i, ts(win * 10 + (i % 7)), i % 40, tpe, 1.0)
    }
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventStream.topTypesPerWindow(input.toDS(), 10, 2)
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("topk")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(9999, ts(600), 1, "click", 1.0)) // close all 3 windows
      q.processAllAvailable()
      val got = spark.table("topk").collect().map(r =>
        (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getInt(3))).toSet
      // batch twin: rank over windowed counts, k=2, same tiebreak
      val counts = events.groupBy(e =>
          (e.ts.getTime - e.ts.getTime % 600000L, e.event_type))
        .view.mapValues(_.size.toLong).toSeq
      val want = counts.groupBy(_._1._1).flatMap { case (w, g) =>
        g.sortBy { case ((_, t), n) => (-n, t) }.take(2).zipWithIndex
          .map { case (((_, t), n), i) => (w, t, n, i + 1) }
      }.toSet
      assert(got == want, s"stream=$got vs batch=$want")
      assert(got.size == 6) // 3 closed windows x k=2
    } finally stopClean(q)
  }

  test("srmMonitor: stream equals batch and flags a deliberately skewed window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // window 0: many distinct users (balanced-ish); window 1: 60 distinct
    // users ALL hashing to arm A (chi2 = 60 >> 3.84 — a certain SRM)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val armA = (0L until 2000L).filter { u =>
      ((md.digest(u.toString.getBytes("UTF-8"))(0) >> 4) & 0xf) <= 7
    }.take(60).toArray
    val events = (0 until 400).map { i =>
      if (i % 2 == 0) Event(i, ts(i % 9), i % 200, "click", 1.0)
      else Event(i, ts(10 + i % 9), armA((i / 2) % 60), "view", 1.0)
    }
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventStream.srmMonitor(input.toDF())
      .writeStream.option("checkpointLocation", ckpt()).format("memory").queryName("srm")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(9999, ts(600), 1, "click", 1.0))
      q.processAllAvailable()
      def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      val streamed = norm(spark.table("srm").collect())
      val batch = norm(EventStream.srmMonitor(events.toDF()).collect())
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed vs batch=$batch")
      // the all-arm-A window is a certain SRM (other arm empty, n >> critical)
      val w1 = streamed.find(_._1 == ts(10).getTime).get
      assert(w1._3 == 0L && w1._2 >= 50L)
      assert(w1._5)
    } finally stopClean(q)
  }

  // ---- crash-restart: transformWithState state must survive a stop +
  // restart from the checkpoint (VERDICT r9 #7). Protocol per test: run
  // batch 1, STOP the query (the in-process stand-in for a crash — the
  // RocksDB store's committed snapshot is all a real recovery has either),
  // enqueue batch 2, start a NEW query on the SAME checkpoint, and assert
  // values only reachable through the restored per-key state — a
  // fresh-state restart would emit provably different numbers.

  /** Run `f` with the RocksDB state store provider (the transformWithState
    * backend), restoring the previous provider afterwards.
    */
  private def withRocksDb(f: => Unit): Unit = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("userProfile state survives a crash-restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val checkpoint = ckpt()
      val input = MemoryStream[EventStream.Event]
      input.addData(
        Event(1, ts(0), 1, "click", 2.0),
        Event(2, ts(1), 1, "view", 3.0),
        Event(3, ts(2), 2, "click", 5.0))
      val q1 = EventStream.userProfile(input.toDS())
        .writeStream.option("checkpointLocation", checkpoint)
        .format("memory").queryName("prof_r1")
        .outputMode(OutputMode.Update()).start()
      q1.processAllAvailable()
      stopClean(q1)
      input.addData(Event(4, ts(10), 1, "purchase", 10.0))
      // The memory sink cannot RECOVER from a checkpoint (Spark rejects
      // it), so the restarted query writes through foreachBatch — the
      // recoverable sink — into a driver-side buffer.
      val out = new java.util.concurrent.ConcurrentLinkedQueue[UserProfile]()
      val q2 = EventStream.userProfile(input.toDS())
        .writeStream.option("checkpointLocation", checkpoint)
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserProfile], _: Long) =>
          batch.collect().foreach(out.add)
        }.start()
      try {
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val rows = out.asScala.toSeq
        // n=3 / sum=15 is only reachable by folding batch 2 into the
        // RESTORED batch-1 state (a fresh store would say n=1, sum=10).
        assert(rows.contains(UserProfile(1L, 3L, 15.0, ts(10).getTime * 1000L)),
          s"restored profile missing: ${rows.mkString(",")}")
      } finally stopClean(q2)
    }
  }

  test("anomalyFlags baseline survives a crash-restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val checkpoint = ckpt()
      val base = Seq(10.0, 12.0, 11.0, 9.0, 8.0)
      val input = MemoryStream[EventStream.Event]
      input.addData(base.zipWithIndex.map { case (v, i) =>
        Event(i + 1L, ts(i), 1, "click", v) }: _*)
      val q1 = EventStream.anomalyFlags(input.toDS())
        .writeStream.option("checkpointLocation", checkpoint)
        .format("memory").queryName("anom_r1")
        .outputMode(OutputMode.Update()).start()
      q1.processAllAvailable()
      stopClean(q1)
      input.addData(Event(100, ts(10), 1, "click", 100.0))
      val out = new java.util.concurrent.ConcurrentLinkedQueue[AnomalyFlag]()
      val q2 = EventStream.anomalyFlags(input.toDS())
        .writeStream.option("checkpointLocation", checkpoint)
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[AnomalyFlag], _: Long) =>
          batch.collect().foreach(out.add)
        }.start()
      try {
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val flags = out.asScala.toSeq
        // A flag at all proves n >= minN survived (fresh state: n=0, no
        // flag possible); the z value pins the exact restored Welford
        // moments, not just the count.
        assert(flags.map(_.event_id).toSet == Set(100L), s"flags: ${flags.mkString(",")}")
        val mean = base.sum / base.length
        val sd = math.sqrt(base.map(v => (v - mean) * (v - mean)).sum / (base.length - 1))
        assert(math.abs(flags.head.z - (100.0 - mean) / sd) < 1e-3)
      } finally stopClean(q2)
    }
  }

  test("heavyUsers MG counters survive a crash-restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val checkpoint = ckpt()
      val input = MemoryStream[EventStream.Event]
      val heavy1 = (1 to 30).map(i => Event(100 + i, ts(i), 1, "click", 1.0))
      val noise = (1 to 8).map(i => Event(300 + i, ts(i), 5 + i * 2, "click", 1.0))
      input.addData(heavy1 ++ noise: _*)
      val q1 = EventStream.heavyUsers(input.toDS(), shards = 2, m = 3)
        .writeStream.option("checkpointLocation", checkpoint)
        .format("memory").queryName("heavy_r1")
        .outputMode(OutputMode.Update()).start()
      q1.processAllAvailable()
      stopClean(q1)
      input.addData((1 to 10).map(i => Event(400 + i, ts(40 + i), 1, "click", 1.0)): _*)
      val out = new java.util.concurrent.ConcurrentLinkedQueue[ShardHeavyUser]()
      val q2 = EventStream.heavyUsers(input.toDS(), shards = 2, m = 3)
        .writeStream.option("checkpointLocation", checkpoint)
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[ShardHeavyUser], _: Long) =>
          batch.collect().foreach(out.add)
        }.start()
      try {
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val rows = out.asScala.toSeq
        val c1 = rows.filter(r => r.shard == 1L && r.user_id == 1L)
          .map(_.mg_count).max
        // Batch 1 left user 1 at >= 30 - 34/(m+1) = 22 (MG bound); batch 2
        // adds exactly 10 with no counter pressure. A fresh store could
        // report at most 10 — any value > 10 requires the restored counter,
        // and the bound pins it.
        assert(c1 >= 32L && c1 <= 40L, s"restored MG count: $c1")
      } finally stopClean(q2)
    }
  }

  test("state-store rows stay bounded by key cardinality across micro-batches (r12 #8)") {
    // VERDICT r11 #8: the transformWithState operators' state growth was
    // asserted nowhere — surface StreamingQueryProgress.stateOperators and
    // pin numRowsTotal to the KEY CARDINALITY bound, not batch count:
    // userProfile keeps one state row per distinct user, heavyUsers one
    // per shard. Five batches over the same keys must not grow state.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.userProfile(input.toDS())
      .writeStream.option("checkpointLocation", ckpt())
      .format("memory").queryName("state_bound_profiles")
      .outputMode(OutputMode.Update()).start()
    val input2 = MemoryStream[EventStream.Event]
    val q2 = EventStream.heavyUsers(input2.toDS(), shards = 2, m = 3)
      .writeStream.option("checkpointLocation", ckpt())
      .format("memory").queryName("state_bound_heavy")
      .outputMode(OutputMode.Update()).start()
    try {
      val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stateRows2 = scala.collection.mutable.ArrayBuffer.empty[Long]
      (1 to 5).foreach { b =>
        // Same 3 users / same 2 shards every batch; ids advance.
        input.addData((1 to 6).map(i =>
          Event(b * 100 + i, ts(b * 10 + i), (i % 3 + 1).toLong, "click", 1.0)): _*)
        q.processAllAvailable()
        input2.addData((1 to 6).map(i =>
          Event(b * 100 + i, ts(b * 10 + i), (i % 4 + 1).toLong, "click", 1.0)): _*)
        q2.processAllAvailable()
        val p = q.recentProgress.filter(_.numInputRows > 0).last
        assert(p.stateOperators.nonEmpty, "no state operator reported")
        stateRows += p.stateOperators.map(_.numRowsTotal).sum
        val p2 = q2.recentProgress.filter(_.numInputRows > 0).last
        stateRows2 += p2.stateOperators.map(_.numRowsTotal).sum
      }
      // userProfile: exactly one state row per distinct user, flat at 3
      // from the first batch on.
      assert(stateRows.toSeq == Seq.fill(5)(3L), s"profile state: $stateRows")
      // heavyUsers: one state row per SHARD (the MG map lives inside the
      // shard's state value), flat at 2 — bounded regardless of users.
      assert(stateRows2.toSeq == Seq.fill(5)(2L), s"heavy state: $stateRows2")
      // Memory telemetry surfaces too (RocksDB provider): nonzero bytes.
      val last = q.recentProgress.filter(_.numInputRows > 0).last
      assert(last.stateOperators.map(_.memoryUsedBytes).sum > 0L)
    } finally {
      stopClean(q); stopClean(q2)
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("temporalJoin enriches facts with the dim version at THEIR event time, across batches (r13 #393)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[EventStream.TemporalIn]
      // Batch 1: user 1 gets dim versions at t0 (v=10) and t20 (v=20); a
      // fact at t5 must see 10, a fact at t20 must see 20 (at-or-before
      // INCLUSIVE), a fact at t25 must see 20. User 2 has a fact BEFORE
      // any version — unmatched, not silently joined to a later version.
      input.addData(
        EventStream.TemporalIn(1, ts(0), "U", 10.0),
        EventStream.TemporalIn(1, ts(20), "U", 20.0),
        EventStream.TemporalIn(1, ts(5), "F", 1.0),
        EventStream.TemporalIn(1, ts(20), "F", 2.0),
        EventStream.TemporalIn(1, ts(25), "F", 3.0),
        EventStream.TemporalIn(2, ts(5), "F", 9.0))
      val q = EventStream.temporalJoin(input.toDS(), horizonMinutes = 60)
        .writeStream.option("checkpointLocation", ckpt())
        .format("memory").queryName("temporal")
        .outputMode(OutputMode.Update()).start()
      try {
        q.processAllAvailable()
        // Batch 2: a LATE fact (t10, arrives after the t20 version exists)
        // must join the t0 version — the historical resolution a
        // latest-value join gets wrong; a new version at t40 then a fact
        // at t41 proves the timeline keeps advancing.
        input.addData(
          EventStream.TemporalIn(1, ts(10), "F", 4.0),
          EventStream.TemporalIn(1, ts(40), "U", 40.0),
          EventStream.TemporalIn(1, ts(41), "F", 5.0))
        q.processAllAvailable()
        val rows = spark.table("temporal").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getLong(3), r.getDouble(4), r.getBoolean(5), r.getInt(6)))
        def at(u: Long, factMin: Int) =
          rows.find(r => r._1 == u && r._2 == ts(factMin).getTime * 1000L).get
        assert(at(1, 5)._5 == 10.0 && at(1, 5)._6)
        assert(at(1, 20)._5 == 20.0, "as-of must be at-or-before INCLUSIVE")
        assert(at(1, 25)._5 == 20.0)
        assert(at(1, 10)._5 == 10.0,
          "late fact must resolve against the HISTORICAL version")
        assert(at(1, 41)._5 == 40.0)
        assert(!at(2, 5)._6 && at(2, 5)._4 == Long.MinValue,
          "a fact before any version is unmatched, never forward-joined")
        // Stream = batch: the matched rows equal a local as-of replay of
        // the same tagged input in event-time order.
        val allIn = Seq(
          (1L, 0, "U", 10.0), (1L, 20, "U", 20.0), (1L, 40, "U", 40.0),
          (1L, 5, "F", 1.0), (1L, 20, "F", 2.0), (1L, 25, "F", 3.0),
          (1L, 10, "F", 4.0), (1L, 41, "F", 5.0))
        val versions = allIn.filter(_._3 == "U").map(v => (ts(v._2).getTime * 1000L, v._4)).sorted
        allIn.filter(_._3 == "F").foreach { f =>
          val tUs = ts(f._2).getTime * 1000L
          val want = versions.filter(_._1 <= tUs).lastOption
          assert(want.map(_._2).contains(at(f._1, f._2)._5))
        }
      } finally stopClean(q)
    }
  }

  test("temporalJoin keeps sub-millisecond versions distinct; equal-µs ties resolve by value (ADVICE r13 #4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Timestamps 250µs / 750µs into the SAME millisecond — getTime alone
    // collapses them, getNanos restores the µs the state keys on.
    def tsUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    withRocksDb {
      val input = MemoryStream[EventStream.TemporalIn]
      input.addData(
        EventStream.TemporalIn(3, tsUs(250), "U", 10.0),
        EventStream.TemporalIn(3, tsUs(750), "U", 20.0),
        EventStream.TemporalIn(3, tsUs(500), "F", 1.0),
        EventStream.TemporalIn(3, tsUs(900), "F", 2.0),
        // Equal-µs tie: two versions at exactly 2000µs — the value
        // tie-break must pick 7.0 (largest) independent of arrival order.
        EventStream.TemporalIn(4, tsUs(2000), "U", 7.0),
        EventStream.TemporalIn(4, tsUs(2000), "U", 5.0),
        EventStream.TemporalIn(4, tsUs(2000), "F", 0.0))
      val q = EventStream.temporalJoin(input.toDS(), horizonMinutes = 60)
        .writeStream.option("checkpointLocation", ckpt())
        .format("memory").queryName("temporal_us")
        .outputMode(OutputMode.Update()).start()
      try {
        q.processAllAvailable()
        val rows = spark.table("temporal_us").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
        def at(u: Long, us: Long) = rows.find(r => r._1 == u && r._2 == us).get
        assert(at(3, 500L)._4 == 10.0 && at(3, 500L)._3 == 250L,
          "fact at +500µs must see the +250µs version, not a ms-collapsed tie")
        assert(at(3, 900L)._4 == 20.0 && at(3, 900L)._3 == 750L)
        assert(at(4, 2000L)._4 == 7.0,
          "equal-µs versions must resolve deterministically to the largest value")
      } finally stopClean(q)
    }
  }

  test("temporalJoin trims versions beyond the horizon to one floor entry (bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[EventStream.TemporalIn]
      // Horizon 30 min. Versions at t0, t5, t10; frontier pushed to t60 —
      // bound = t30, so t0 and t5 are superseded-below-bound and must drop,
      // t10 survives as the floor. n_versions on the t60 fact's row is the
      // post-trim state size: floor(t10) + t50 = 2, not 4.
      input.addData(
        EventStream.TemporalIn(7, ts(0), "U", 1.0),
        EventStream.TemporalIn(7, ts(5), "U", 2.0),
        EventStream.TemporalIn(7, ts(10), "U", 3.0),
        EventStream.TemporalIn(7, ts(50), "U", 5.0),
        EventStream.TemporalIn(7, ts(60), "F", 0.0))
      val q = EventStream.temporalJoin(input.toDS(), horizonMinutes = 30)
        .writeStream.option("checkpointLocation", ckpt())
        .format("memory").queryName("temporal_trim")
        .outputMode(OutputMode.Update()).start()
      try {
        q.processAllAvailable()
        // A fact INSIDE the horizon that lands on the floor version still
        // resolves exactly (t40 → the t10 version, which was kept).
        input.addData(EventStream.TemporalIn(7, ts(40), "F", 0.0))
        q.processAllAvailable()
        val rows = spark.table("temporal_trim").collect()
          .map(r => (r.getLong(1), r.getDouble(4), r.getBoolean(5), r.getInt(6)))
        val at60 = rows.find(_._1 == ts(60).getTime * 1000L).get
        assert(at60._2 == 5.0 && at60._3)
        assert(at60._4 == 2, s"state not trimmed to floor+live: ${at60._4}")
        val at40 = rows.find(_._1 == ts(40).getTime * 1000L).get
        assert(at40._2 == 3.0 && at40._3,
          "in-horizon fact must still resolve via the kept floor version")
      } finally stopClean(q)
    }
  }
}
