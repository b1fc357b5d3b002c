package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 STRESS data generator (VERDICT r5 #6): builds a ~10× replica of an
  * existing SF directory so the most expensive operators can be driven one
  * decade past the correctness gate (sf0.1 → sf1-scale) and scale cliffs
  * that local[32] can still reach show up before a cluster does.
  *
  * This is STRESS data, not correctness data: the DuckDB oracle never runs
  * against it (the driver's gate SFs stay sf0.01/sf0.001), so the generator
  * optimizes for preserving each operator's WORKLOAD SHAPE, not for TPC-H
  * semantics:
  *
  *   - Dimensions (region/nation/customer/supplier/part) copy UNCHANGED —
  *     at 100 TB the dims don't grow with the fact tables either; the
  *     broadcast-vs-shuffle decisions under test depend on exactly that.
  *   - Facts replicate `factor`× with PRIMARY keys shifted per replica
  *     (orderkey, doc_id, event id via user shift) so FK integrity holds
  *     (lineitem's orderkey shifts in lockstep with orders) and grouping
  *     keys stay unique across replicas.
  *   - events shift user_id per replica: 10× users with the same per-user
  *     series — window partitions multiply in COUNT (the scale axis a
  *     cluster sees), not in per-partition size.
  *   - documents/embeddings keep content byte-identical across replicas —
  *     deliberately. A 90%-exact-duplicate corpus is the textbook worst
  *     case for the dedup/similarity family, and this library's explicit
  *     contract is that exact-dup collapse happens BEFORE banding/probing
  *     (DedupSpec: "candidates stay near-linear"). If that contract holds,
  *     sf1 dedup cost grows ~linearly; if it is wrong anywhere, this is
  *     the run that shows it.
  *
  * Usage: runMain graft.StressGen <srcSfDir> <destDir> [factor] [docMode]
  * The destination is a normal SF directory: Bench/Verify run against it
  * via SPARK_GRAFT_SF_DIR with no code changes.
  *
  * docMode (VERDICT r7 #7): `exact` (default) keeps replica documents
  * byte-identical — the collapse-path worst case above. `mutate` instead
  * perturbs a fraction of each replica's tokens deterministically
  * (xxhash64(doc_id, replica, pos) decides per word; rate = the optional
  * 5th arg `mutPct`, default 5), so replicas land at Jaccard ≈ 1−2·rate
  * vs their original: NEAR-duplicates that the exact-dup collapse CANNOT
  * fold away, forcing candidate generation through the MinHash band path
  * at full corpus size. Replica 0 stays unmutated. mutPct=5 gives
  * J ≈ 0.85–0.95 (comfortably above the 0.6 threshold); mutPct=30
  * (VERDICT r8 #6) lands J ≈ 0.5–0.65 — straddling the threshold, the
  * hardest regime for band tuning AND the heaviest candidate volume,
  * because borderline pairs must be exact-verified and mostly rejected.
  * A 90%-exact corpus flatters collapse; this one cannot be folded.
  */
object StressGen {

  /** Key offset: one decimal order of magnitude above the max key so
    * shifted ids are collision-free AND visually attributable to a replica.
    */
  private def offsetFor(df: DataFrame, col0: String): Long = {
    val mx = df.agg(max(col(col0)).cast("long")).collect()(0).getLong(0)
    var off = 1L
    while (off <= mx) off *= 10
    off
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val docMode = if (args.length > 3) args(3) else "exact"
    require(docMode == "exact" || docMode == "mutate" || docMode == "numeric"
        || docMode == "events" || docMode == "docs",
      s"docMode must be exact|mutate|numeric|events|docs, got $docMode")
    val mutPct = if (args.length > 4) args(4).toInt else 5
    require(mutPct >= 1 && mutPct <= 99, s"mutPct must be 1..99, got $mutPct")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = Seq("region", "nation", "customer", "supplier", "part")
    dims.foreach { t =>
      sources.Tables.load(spark, src, t)
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[stressgen] $t: copied unchanged")
    }

    // Replicate a fact `factor`×, shifting the named key columns by
    // replica*offset. The replica frame is a tiny broadcast; the transform
    // is scan→project→write, shuffle-free. Returns the offset used so that
    // the FK pair orders/lineitem shifts in LOCKSTEP — the child must reuse
    // its parent's offset, not derive one from its own max (a subset's max
    // can round to a smaller power of 10). embeddings has no doc_id FK, so
    // it shifts independently of documents.
    def replicate(t: String, shiftCols: Seq[String],
        fixedOff: Option[Long] = None): Long = {
      val df = sources.Tables.load(spark, src, t)
      // Each shifted column gets its OWN collision-free offset (events
      // mode shifts user_id AND event_id — one shared offset sized from
      // user_id would collide event ids across replicas).
      val offs: Map[String, Long] = shiftCols
        .map(c => c -> fixedOff.getOrElse(offsetFor(df, c))).toMap
      val off = offs(shiftCols.head)
      val reps = broadcast(spark.range(factor).toDF("replica"))
      val out0 = df.crossJoin(reps)
      val shifted = shiftCols.foldLeft(out0) { (d, c) =>
        d.withColumn(c, col(c) + col("replica") * offs(c))
      }
      // docMode=mutate: replicas 1..factor-1 get ~5% of tokens swapped for
      // a hash-derived nonsense token (deterministic in (doc_id, replica,
      // word position) — re-runs are byte-stable). transform()'s (elem,
      // idx) lambda avoids the descending-sequence(1,0) trap on empty
      // texts. n_chars is recomputed so the length column stays consistent
      // with the mutated text.
      val out = (if (t == "documents" && docMode == "mutate") {
        val words = split(col("text"), " ")
        val mut = array_join(
          transform(words, (w, i) =>
            when(col("replica") =!= 0 &&
                 pmod(xxhash64(col("doc_id"), col("replica"), i), lit(100))
                   < lit(mutPct),
              concat(lit("mutx"),
                pmod(abs(xxhash64(w, col("replica"), i)), lit(9973)).cast("string")))
            .otherwise(w)),
          " ")
        shifted.withColumn("text", mut)
          .withColumn("n_chars", length(col("text")))
      } else shifted).drop("replica")
      out.write.mode("overwrite").parquet(s"$dest/$t.parquet")
      val how = if (t == "documents" && docMode == "mutate")
        s" (mutated ~$mutPct%/replica)" else ""
      println(s"[stressgen] $t: x$factor, shifted ${shiftCols.mkString("+")} by k*$off$how")
      off
    }

    if (docMode == "numeric") {
      // NUMERIC-column stress (VERDICT r9 #8): r9 learned that long
      // overflow and radicand cancellation appear BETWEEN sf0.1 and sf10 —
      // the gate SFs never catch them. This mode replicates ONLY the
      // numeric fact pair (orders/lineitem, e.g. factor=100 on sf0.1 ≈
      // sf10 power sums) so the ~30 power-sum/radicand queries can be
      // driven one decade past the r9 stress without paying 100× on the
      // text/event corpora, which copy unchanged.
      Seq("events", "documents", "embeddings").foreach { t =>
        sources.Tables.load(spark, src, t)
          .write.mode("overwrite").parquet(s"$dest/$t.parquet")
        println(s"[stressgen] $t: copied unchanged (numeric mode)")
      }
      val okOff = replicate("orders", Seq("o_orderkey"))
      replicate("lineitem", Seq("l_orderkey"), Some(okOff))
    } else if (docMode == "events") {
      // EVENTS-only stress (the third fact family's decade probe): the
      // user_id shift multiplies window-partition COUNT, the event_id
      // shift keeps arrival-order ids unique — user-keyed sessions and
      // the PrefixScan lateness/concurrency family at 100× users.
      Seq("orders", "lineitem", "documents", "embeddings").foreach { t =>
        sources.Tables.load(spark, src, t)
          .write.mode("overwrite").parquet(s"$dest/$t.parquet")
        println(s"[stressgen] $t: copied unchanged (events mode)")
      }
      replicate("events", Seq("user_id", "event_id"))
    } else if (docMode == "docs") {
      // DOCUMENTS/EMBEDDINGS-only stress: the text-analysis / embedding
      // family's decade probe (replicas byte-identical — the linear
      // one-pass statistics don't care; the pair-join dedup family has
      // its own mutate-mode corpus).
      Seq("orders", "lineitem", "events").foreach { t =>
        sources.Tables.load(spark, src, t)
          .write.mode("overwrite").parquet(s"$dest/$t.parquet")
        println(s"[stressgen] $t: copied unchanged (docs mode)")
      }
      replicate("documents", Seq("doc_id"))
      replicate("embeddings", Seq("vec_id"))
    } else {
      val okOff = replicate("orders", Seq("o_orderkey"))
      replicate("lineitem", Seq("l_orderkey"), Some(okOff))
      replicate("events", Seq("user_id"))
      replicate("documents", Seq("doc_id"))
      // embeddings key on vec_id (no doc_id FK in the reduced schema), so
      // the shift is independent of documents'.
      replicate("embeddings", Seq("vec_id"))
    }

    println(s"[stressgen] done: $dest at ${factor}x ${src}")
    spark.stop()
  }
}
