package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-curation operators a production training-data pipeline runs after
  * dedup/quality (SURVEY.md §2.3): repetition filtering, vocabulary stats,
  * source mixing, sequence packing, scrubbing, and benchmark decontamination.
  *
  * Scale design: everything here is either pure per-row expression work
  * (repetition ratios, scrubbing) or a single linear shuffle on a bounded key
  * (n-gram counts, per-source aggregates, per-source packing windows). No
  * operator is quadratic in corpus size and nothing funnels through a single
  * partition except post-aggregation results that are bounded by the number
  * of sources / vocabulary cutoff, not by corpus rows.
  */
object Curation {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  private def tokensCol = split(trim(col("text")), " ")

  /** §2.3 #54 — within-document repetition stats (the Gopher-style
    * repetition filter): distinct-token ratio and the frequency of the most
    * common token. One explode + two linear aggregations; the shuffle key is
    * (doc_id, token) so a hot document spreads over many reducers and no
    * per-document state ever exceeds its own vocabulary.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        explode(col("toks")).as("tok"))
      .groupBy("doc_id", "n_tokens", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_tokens")
      .agg(count(lit(1)).as("n_distinct"), max("c").as("top_freq"))
      .withColumn("dup_ratio",
        (floor((lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("top_ratio",
        (floor((col("top_freq").cast("double") / col("n_tokens")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select("doc_id", "n_tokens", "n_distinct", "top_freq", "dup_ratio", "top_ratio")
      .orderBy("doc_id")

  /** §2.3 #55 — corpus-level vocabulary: the `topK` most frequent word
    * bigrams with a deterministic tie-break. Map-side partial counts make the
    * shuffle proportional to DISTINCT bigrams per partition, not corpus
    * tokens; the final top-K is a TakeOrderedAndProject (per-partition heaps,
    * no global sort).
    */
  def ngramFreq(spark: SparkSession, dir: String, topK: Int = 20): DataFrame =
    docs(spark, dir)
      .select(tokensCol.as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', w[i-1], w[i]))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(topK)

  /** §2.3 #56 — domain-mixing stats: per-source document/token counts,
    * language spread, and each source's share of corpus tokens (the numbers a
    * data-mixing policy is written against). One linear aggregation; the
    * 1-row token total joins back by broadcast, so nothing ever funnels
    * through a single partition.
    */
  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    val per = docs(spark, dir)
      .select(col("source"), col("lang"), size(tokensCol).as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
        countDistinct("lang").as("n_langs"))
    val total = per.agg(sum("n_tokens").as("tot"))
    per.crossJoin(broadcast(total))
      .withColumn("token_share",
        (floor((col("n_tokens").cast("double") / col("tot")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select("source", "n_docs", "n_tokens", "n_langs", "token_share")
      .orderBy("source")
  }

  /** §2.3 #171 — source × language COMPOSITION matrix: doc/token counts
    * per (source, declared lang) cell with within-source doc shares — the
    * mixing table a multilingual-corpus decision reads next to
    * [[sourceMix]] (sources only) and langid (which INFERS what this table
    * declares). One map-side-combined aggregate to a |sources|×|langs|
    * frame; the share window runs over that bounded frame, never raw docs.
    */
  def sourceLangMix(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokensCol).cast("bigint")).as("n_tokens"))
      .withColumn("doc_share_of_source", (floor((col("n_docs") /
        sum(col("n_docs")).over(Window.partitionBy("source"))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("source", "lang")

  /** §2.3 #57 — training-sequence packing: documents are concatenated in
    * (source, doc_id) order and chunked into fixed `seqLen`-token sequences
    * (documents may straddle a boundary — exactly how LLM pretraining packs
    * tokens). Each document gets its stream start offset, the sequence id its
    * first token lands in, and the offset within that sequence.
    *
    * The running offset is a DISTRIBUTED PREFIX SUM, the classic two-phase
    * decomposition: (1) contiguous doc_id ranges ("chunks") compute local
    * prefix sums independently — fully parallel, each chunk sorts only its
    * own slice; (2) per-chunk totals (sources × chunks rows, tiny) get a
    * running offset of their own, broadcast back, and every document's
    * stream offset is chunk_offset + local_offset. No source's stream ever
    * sorts on a single reducer, so one giant source cannot melt the job —
    * the fix for the naive `Window.partitionBy(source)` formulation.
    */
  def tokenPack(spark: SparkSession, dir: String, seqLen: Int = 512,
      chunkIdBits: Int = 10): DataFrame = {
    val wLocal = Window.partitionBy("source", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wChunk = Window.partitionBy("source").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = docs(spark, dir)
      .select(col("doc_id"), col("source"), size(tokensCol).as("n_tokens"))
      .withColumn("chunk", shiftright(col("doc_id"), chunkIdBits)) // order-preserving ranges
      .withColumn("local_off",
        coalesce(sum(col("n_tokens").cast("bigint")).over(wLocal), lit(0L)))
    val chunkOffsets = local
      .groupBy("source", "chunk")
      .agg(sum(col("n_tokens").cast("bigint")).as("chunk_total"))
      .withColumn("chunk_off", coalesce(sum("chunk_total").over(wChunk), lit(0L)))
      .select("source", "chunk", "chunk_off")
    local
      .join(broadcast(chunkOffsets), Seq("source", "chunk"))
      .withColumn("start_off", col("chunk_off") + col("local_off"))
      .withColumn("seq_id",
        floor(col("start_off") / lit(seqLen.toDouble)).cast("int"))
      .withColumn("seq_off", col("start_off") % seqLen)
      .select("doc_id", "source", "n_tokens", "start_off", "seq_id", "seq_off")
      .orderBy("doc_id")
  }

  /** §2.3 #58 — scrubbing pass over the `events.props` payload: numeric
    * identifiers are redacted to a placeholder and counted (the shape of a
    * PII-removal pass — swap the pattern set for emails/phones/SSNs in a real
    * corpus). Pure per-row regex, codegen'd, embarrassingly parallel.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"),
        regexp_count(col("props"), lit("[0-9]+")).as("n_redacted"),
        regexp_replace(col("props"), "[0-9]+", "<NUM>").as("scrubbed"))
      .orderBy("event_id")

  /** §2.3 #59 — benchmark decontamination: flag training documents sharing
    * any word 5-gram with the held-out benchmark slice (doc_id % 50 == 0
    * stands in for the eval suite). Candidate generation is an equi-join on
    * the 5-gram — never all-pairs — and the benchmark side is broadcast:
    * real benchmark suites are MBs against a multi-TB corpus, so the corpus
    * never shuffles at all.
    */
  /** §2.3 #93 — duplicated-span detection within the corpus (the
    * "Deduplicating Training Data Makes Language Models Better" pass):
    * per document, how many of its distinct word n-grams also appear in at
    * least one OTHER document, and the resulting duplicated share. Unlike
    * whole-document near-dup (MinHash), this catches a boilerplate paragraph
    * pasted into thousands of otherwise-distinct pages.
    *
    * Plan: explode per-doc distinct grams once, count each gram's document
    * frequency with a window over the gram key (one shuffle — no second
    * self-join of the gram table), then aggregate per doc (second shuffle,
    * key = doc_id). Linear in total gram count at any corpus size. At 100 TB
    * set `hashGrams=true`: the shuffle key becomes xxhash64(gram) — 8 bytes
    * instead of an ~n-word string — identical output save for 2^-64 hash
    * collisions (kept off in the oracle-checked query so the DuckDB compare
    * is exact by construction, asserted equal in CurationSpec).
    */
  def spanDedup(spark: SparkSession, dir: String, n: Int = 8,
      flagShare: Double = 0.2, hashGrams: Boolean = false): DataFrame = {
    val grams = docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', ${
          (0 until n).map(j => s"w[i+${j - 1}]").mkString(", ")}))"))).as("g"))
    val keyed = if (hashGrams) grams.withColumn("g", xxhash64(col("g"))) else grams
    val withDf = keyed.withColumn("dfreq",
      count(lit(1)).over(Window.partitionBy("g")))
    val per = withDf.groupBy("doc_id").agg(
      count(lit(1)).as("n_grams"),
      sum(when(col("dfreq") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
    docs(spark, dir).select("doc_id")
      .join(per, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
      .withColumn("dup_share",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_dup_grams").cast("double") / col("n_grams").cast("double")))
      .withColumn("flagged", col("dup_share") > flagShare)
      .orderBy("doc_id")
  }

  def decontaminate(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val grams = docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', ${
          (0 until n).map(j => s"w[i+${j - 1}]").mkString(", ")}))"))).as("g"))
    val bench = grams.where(col("doc_id") % 50 === 0).select("g").distinct()
    val hits = grams.where(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_grams"))
    docs(spark, dir).select("doc_id")
      .where(col("doc_id") % 50 =!= 0)
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
      .orderBy("doc_id")
  }

  /** §2.3 #68 — deterministic stratified sample: exactly `k` documents per
    * source, chosen by ordering each stratum on sha256(doc_id) — a seedless,
    * engine-reproducible shuffle. The same rows come back no matter how the
    * corpus is partitioned, re-ingested, or re-ordered, which is what makes
    * the sample auditable (unlike `TABLESAMPLE`/`rand()`).
    *
    * Fixed-k-per-stratum is inherently a per-stratum top-k: one shuffle on
    * `source` + partition-local sort (rank window). Strata are few and the
    * output is k rows each, so the sort is the cost ceiling; for a FRACTION
    * sample at 100 TB use the constant-memory hash-threshold form instead
    * (`substr(sha256(..),1,n) < t`, see [[TextAnalysis.splitHash]]) — no
    * sort, no shuffle, same determinism.
    */
  /** §2.3 #77 — sketch-based corpus profile: HyperLogLog++ distinct counts
    * and t-digest-style quantiles per source. This is the 100 TB twin of
    * [[TableCopy.statsProfile]]'s exact pass: HLL state is a few KB per
    * group no matter how many distinct values flow through it, and sketches
    * MERGE associatively, so the whole profile is one map-side-combined
    * aggregation — no Expand, no per-column re-shuffle, no memory cliff.
    *
    * Sketch VALUES are engine-specific, so raw estimates can never
    * hash-match a DuckDB run. What IS cross-engine checkable is the error
    * CONTRACT: the output carries the deterministic columns (source, exact
    * row count) plus booleans asserting each estimate landed within its
    * advertised tolerance of the exact answer (HLL rsd 2% → checked at 5%;
    * p50 within 10%, both computed in this same query). The oracle asserts
    * those booleans are TRUE for every source, so a sketch drifting out of
    * tolerance flips a value and fails the hash check. The exact twin here
    * exists only to make that contract auditable at oracle scale — the
    * production profile at 100 TB is the sketch aggregation alone.
    */
  /** The production sketch pass alone — what actually runs at 100 TB. */
  def approxStatsRaw(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy("source")
      .agg(
        approx_count_distinct(col("text"), rsd = 0.02).as("approx_distinct_texts"),
        percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("approx_p50_chars"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  def approxStats(spark: SparkSession, dir: String): DataFrame = {
    val sk = approxStatsRaw(spark, dir)
    val exact = docs(spark, dir)
      .groupBy("source")
      .agg(
        countDistinct(col("text")).as("exact_distinct_texts"),
        expr("percentile(n_chars, 0.5D)").as("exact_p50_chars"))
    sk.join(exact, Seq("source"))
      .select(
        col("source"),
        col("n_docs"),
        (abs(col("approx_distinct_texts") - col("exact_distinct_texts"))
          <= greatest(lit(2.0), col("exact_distinct_texts") * 0.05)).as("hll_within_5pct"),
        (abs(col("approx_p50_chars").cast("double") - col("exact_p50_chars"))
          <= col("exact_p50_chars") * 0.10).as("p50_within_10pct"))
      .orderBy("source")
  }

  def sampleStratified(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    docs(spark, dir)
      .select(col("source"), col("doc_id"),
        sha2(col("doc_id").cast("string"), 256).as("h"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("source").orderBy("h", "doc_id")))
      .where(col("rk") <= k)
      .select("source", "doc_id", "rk")
      .orderBy("source", "rk")

  /** Mergeable Misra-Gries frequent-items sketch over tokens: at most `m`
    * counters, where shrinking subtracts the (m+1)-th largest count from
    * every counter and drops the non-positive ones (Agarwal et al.'s
    * mergeable-summaries form — both `reduce` batches and `merge` use the
    * same operation, so partial sketches combine associatively). Guarantee:
    * any token with true count > n/(m+1) survives in the final sketch, and
    * each surviving counter undercounts by at most n/(m+1).
    */
  class MisraGries[I](m: Int, token: I => String)
      extends org.apache.spark.sql.expressions.Aggregator[
        I, Map[String, Long], Map[String, Long]] {
    private def shrink(c: Map[String, Long]): Map[String, Long] =
      if (c.size <= m) c
      else {
        val thresh = c.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
        c.collect { case (t, n) if n > thresh => t -> (n - thresh) }
      }
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], row: I): Map[String, Long] = {
      val tok = token(row)
      val nb = b.updated(tok, b.getOrElse(tok, 0L) + 1L)
      // Amortize: let the buffer grow to 2m before paying a shrink.
      if (nb.size > 2 * m) shrink(nb) else nb
    }
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val (small, big) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
      shrink(small.foldLeft(big) { case (acc, (t, n)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + n)
      })
    }
    def finish(r: Map[String, Long]): Map[String, Long] = shrink(r)
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** §2.3 #111 — corpus heavy hitters (exact top-k vocabulary) as the
    * canonical TWO-PASS sketch-then-rescore pipeline:
    *
    * Pass 1 folds every token into a [[MisraGries]] sketch — a typed
    * Aggregator, so each map task PARTIALLY aggregates its slice into ≤ 2m
    * counters and only sketches cross the wire (constant state per task,
    * associative merge; the same contract as the HLL profile). Pass 2
    * computes EXACT counts for the ≤ m surviving candidates only (an `isin`
    * prune inside the scan stage) and takes the top k with a deterministic
    * (count desc, token) tie-break via TakeOrderedAndProject.
    *
    * Exactness: MG guarantees every token with count > n/(m+1) is a
    * candidate; with m = 1024 ≫ k = 20 the true top-20 of any remotely
    * Zipfian corpus clears that bar by orders of magnitude, so the rescored
    * output equals the exact SQL top-k — which is precisely what the oracle
    * asserts (and the spec re-checks the MG superset guarantee itself).
    * A full exact groupBy over 100 TB of tokens would shuffle the whole
    * vocabulary; this ships ~m counters per task and then scans once more
    * touching only candidate tokens.
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 20, m: Int = 1024): DataFrame = {
    import spark.implicits._
    val toks = docs(spark, dir)
      .select(explode(tokensCol).as("tok"))
    val sketch = toks.as[String]
      .select(new MisraGries[String](m, identity).toColumn.name("sk"))
      .head()
    val cands = sketch.keys.toSeq
    val exact = toks.where(col("tok").isin(cands: _*))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(k)
    exact.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("tok").asc)))
      .select("rank", "tok", "n")
  }

  /** §2.3 #116 — PER-GROUP heavy hitters: top-`k` tokens per source, via
    * the same sketch-then-rescore two-pass as [[heavyHitters]] but with one
    * [[MisraGries]] sketch PER GROUP (`groupByKey(source)` + the typed
    * Aggregator, so sketches still partially aggregate map-side and only
    * ≤2m-counter maps shuffle — never raw tokens). The exact pass rescores
    * the ≤ sources·m candidate (source, token) pairs with a broadcast
    * semi-join prune at the scan, and a per-source rank window over
    * candidate counts keeps the true top-k. The per-domain vocabulary
    * fingerprint a mixing/contamination dashboard shows.
    */
  def heavyHittersGrouped(spark: SparkSession, dir: String, k: Int = 5,
      m: Int = 256): DataFrame = {
    import spark.implicits._
    val toks = docs(spark, dir)
      .select(col("source"), explode(tokensCol).as("tok"))
    val sketches = toks.as[(String, String)]
      .groupByKey(_._1)
      .agg(new MisraGries[(String, String)](m, _._2).toColumn.name("sk"))
    val cands = sketches.flatMap { case (src, sk) => sk.keysIterator.map((src, _)) }
      .toDF("source", "tok")
    val w = Window.partitionBy("source").orderBy(col("n").desc, col("tok").asc)
    toks.join(broadcast(cands), Seq("source", "tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("source", "rank", "tok", "n")
      .orderBy("source", "rank")
  }

  /** §2.3 #119 — token co-occurrence with PMI (the word2vec/GloVe-style
    * corpus statistic): unordered token pairs within a ±`window` position
    * window, ranked by count, with pointwise mutual information from exact
    * corpus counts. High-PMI pairs surface collocations; the co-occurrence
    * matrix is the input of classical embedding training and of
    * phrase-mining passes.
    *
    * Plan shape at 100 TB: pair generation is `window` SHIFTED EQUI-JOINS
    * on (doc_id, position) — never an inequality join, candidates exactly
    * N·window; pair counts partially aggregate map-side; the top-k by count
    * is TakeOrderedAndProject; PMI math runs on the k survivors only, with
    * the two corpus totals collected as scalars (two tiny aggregates) and
    * the unigram counts joined to just k rows.
    */
  def cooccurPmi(spark: SparkSession, dir: String, window: Int = 2,
      topK: Int = 20): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), posexplode(tokensCol).as(Seq("i", "tok")))
    val shifted = (1 to window).map { d =>
      toks.select(col("doc_id"), (col("i") + d).as("j"), col("tok").as("ta"))
    }.reduce(_ unionAll _)
    val pairs = shifted
      .join(toks.select(col("doc_id"), col("i").as("j"), col("tok").as("tb")),
        Seq("doc_id", "j"))
      .select(least(col("ta"), col("tb")).as("tok_a"),
        greatest(col("ta"), col("tb")).as("tok_b"))
    val nTok = toks.count().toDouble
    val nPairs = pairs.count().toDouble
    val top = pairs.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("c_ab"))
      .orderBy(col("c_ab").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(topK)
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    broadcast(top)
      .join(uni.select(col("tok").as("tok_a"), col("c").as("c_a")), "tok_a")
      .join(uni.select(col("tok").as("tok_b"), col("c").as("c_b")), "tok_b")
      .select(col("tok_a"), col("tok_b"), col("c_ab"),
        (floor((log2(col("c_ab") * nTok * nTok / (lit(nPairs) * col("c_a") * col("c_b")))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("pmi"))
      .orderBy(col("c_ab").desc, col("tok_a").asc, col("tok_b").asc)
  }

  /** §2.3 #114 — tokenizer-vocabulary coverage: per document, the fraction
    * of tokens OUTSIDE a fixed top-`vocabSize` vocabulary (the corpus's own
    * most frequent tokens stand in for a trained tokenizer's vocab). OOV
    * rate is the standard proxy for how well a tokenizer fits a corpus —
    * high-OOV documents fragment into long byte-level token sequences and
    * dilute training. Plan shape: the vocab is a top-V aggregate
    * (TakeOrderedAndProject) BROADCAST to every task; membership is then a
    * per-token broadcast hash join at scan speed, and the per-doc rate is
    * one (doc_id) shuffle with map-side combine. Nothing scales with vocab
    * choice but the broadcast's few hundred strings.
    */
  def oovRate(spark: SparkSession, dir: String, vocabSize: Int = 256): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), explode(tokensCol).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        (floor((col("n_oov").cast("double") / col("n_tokens")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("doc_id")
  }

  /** One (hash, id) sample candidate flowing through [[KSmallestByHash]]. */
  case class SampleRow(h: String, doc_id: Long)

  /** Typed Aggregator keeping the k smallest (hash, doc_id) pairs per group.
    * Unlike the window formulation, this PARTIALLY AGGREGATES: every map
    * task reduces its slice of a stratum to <= k rows before the shuffle, so
    * a billion-document stratum ships k rows per task instead of sorting the
    * whole stratum on one reducer — the skew-proof fixed-k sampler.
    */
  class KSmallestByHash(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long, String), Seq[SampleRow], Seq[SampleRow]] {
    private def keep(xs: Seq[SampleRow]): Seq[SampleRow] =
      xs.sortBy(r => (r.h, r.doc_id)).take(k)
    def zero: Seq[SampleRow] = Nil
    def reduce(b: Seq[SampleRow], a: (String, Long, String)): Seq[SampleRow] =
      keep(b :+ SampleRow(a._3, a._2))
    def merge(b1: Seq[SampleRow], b2: Seq[SampleRow]): Seq[SampleRow] = keep(b1 ++ b2)
    def finish(r: Seq[SampleRow]): Seq[SampleRow] = keep(r)
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[SampleRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SampleRow]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[SampleRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SampleRow]]()
  }

  /** §2.3 #80 — the aggregation-based twin of [[sampleStratified]]: same
    * deterministic k-per-stratum sample, but computed with a map-side
    * combining [[KSmallestByHash]] Aggregator instead of a per-stratum sort
    * window — the formulation that survives a single skewed stratum at
    * 100 TB. The spec asserts both formulations return identical rows; the
    * oracle is the same SQL as `q_sample_stratified`.
    */
  /** §2.3 #103b — deterministic WEIGHTED mixture sampling: each source keeps
    * a different fraction of its documents (the "data mixing" step that
    * up/down-weights domains before training). A document survives iff
    * frac(sha256(doc_id)) < weight(source), where frac maps the first 8 hex
    * chars to [0,1). Like [[sampleStratified]] this is seedless and
    * partition-order-independent — re-running on a re-ingested corpus keeps
    * EXACTLY the same documents — but unlike fixed-k it is a pure per-row
    * filter: no sort, no shuffle, no state, so it runs at scan speed on any
    * corpus size. Weights here derive from the source's numeric suffix
    * ((n % 5 + 1)/10 → 0.1..0.5) purely so the oracle can recompute them.
    */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("weight",
        ((regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") % 5 + 1)
          .cast("double") / 10.0))
      .withColumn("u",
        conv(substring(sha2(col("doc_id").cast("string"), 256), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0)
      .where(col("u") < col("weight"))
      .select(col("doc_id"), col("source"), col("weight"))
      .orderBy("doc_id")

  def sampleStratifiedAgg(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val typed = docs(spark, dir)
      .select(col("source"), col("doc_id"),
        sha2(col("doc_id").cast("string"), 256).as("h"))
      .as[(String, Long, String)]
    typed.groupByKey(_._1)
      .agg(new KSmallestByHash(k).toColumn.name("picks"))
      .toDF("source", "picks")
      .select(col("source"), posexplode(col("picks")).as(Seq("pos", "pick")))
      .select(col("source"), col("pick.doc_id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rk"))
      .orderBy("source", "rk")
  }

  /** §2.3 #127 — RAG/context chunking: each document splits into overlapping
    * fixed-size token windows (`chunkSize` tokens every `stride`, trailing
    * chunk short) — the ingestion shape of retrieval pipelines and of
    * long-document training-example construction (each chunk later gets its
    * own embedding / fingerprint / pack slot). Chunk identity is
    * (doc_id, chunk_id) with the token start offset, so chunks join back to
    * spans deterministically.
    *
    * Pure scan-stage work at any corpus size: the window starts come from
    * `sequence(0, n-1, stride)` exploded INSIDE the scan stage (an Expand,
    * no shuffle), and each chunk is an array slice of the already-split
    * token array — no self-join, no window function, no per-doc state. The
    * only exchange is the presentation sort.
    */
  def docChunks(spark: SparkSession, dir: String, chunkSize: Int = 64,
      stride: Int = 48): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("w"))
      .select(col("doc_id"), size(col("w")).as("n_tokens"), col("w"),
        explode(expr(s"sequence(0, size(w) - 1, $stride)")).as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast("int").as("chunk_id"),
        col("start_tok"), col("n_tokens"),
        expr(s"slice(w, start_tok + 1, $chunkSize)").as("cw"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tokens"),
        size(col("cw")).as("chunk_tokens"),
        concat_ws(" ", col("cw")).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  /** §2.3 #195 — DATA RECIPE planning: given target mixture weights and a
    * token budget, the per-source sampling rate and epoch count — the
    * "data recipe" table a training run is configured from (up-weighted
    * sources show epochs > 1, i.e. repetition; down-weighted ones a
    * sample rate < 1). One aggregation to a |sources|-bounded frame; the
    * weight here is a deterministic function of the source index
    * (w ∝ idx+1, normalized), standing in for a configured weight table —
    * at scale that table joins in as a broadcast dim exactly like this
    * expression evaluates. All ratios are deterministic IEEE double
    * chains, rounded for presentation.
    */
  def dataRecipe(spark: SparkSession, dir: String,
      tokenBudget: Long = 100000L): DataFrame = {
    val bySource = Tables.load(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), " ")).cast("long")).as("n_tokens"))
    // weight_i = (idx+1) / sum(1..20) = (idx+1)/210 for the 20 sources
    val idx = substring(col("source"), 4, 10).cast("int")
    bySource
      .withColumn("weight", (floor(((idx + 1) / lit(210.0)) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("target_tokens",
        (floor((lit(tokenBudget) * (idx + 1) / lit(210.0)) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("epochs",
        (floor((lit(tokenBudget) * (idx + 1) / lit(210.0) / col("n_tokens")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("sample_rate", least(lit(1.0), col("epochs")))
      .select("source", "n_docs", "n_tokens", "weight", "target_tokens",
        "epochs", "sample_rate")
      .orderBy("source")
  }

  /** §2.3 #211 — MUTUAL INFORMATION between the corpus's `lang` and
    * `source` columns (plus both marginal entropies and normalized MI):
    * the data-audit number that says how redundant two metadata axes are —
    * NMI ≈ 1 means sources are language-siloed (stratify on one, not
    * both), NMI ≈ 0 means independent axes that must be crossed when
    * balancing a mixture.
    *
    * Why Shannon is safe HERE when `q_entropy` had to avoid it: the float
    * log terms are per CELL of a bounded |langs|×|sources| contingency
    * table (hundreds), not per distinct token — each term is one
    * deterministic double expression over exact integer counts, the terms
    * are summed EXACTLY (decimal cast first, order-independent), and one
    * 6-decimal round absorbs ulp noise at hundreds-of-terms scale. Plan:
    * three linear aggregations of the corpus (cells + two marginals),
    * everything after is broadcast joins of bounded frames.
    */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(dec)).cast("double")
    val d = docs(spark, dir)
    val total = d.agg(count(lit(1)).as("n_docs"))
    val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val lm = d.groupBy("lang").agg(count(lit(1)).as("nl"))
    val sm = d.groupBy("source").agg(count(lit(1)).as("ns"))
    val mi = cells.join(broadcast(lm), "lang").join(broadcast(sm), "source")
      .crossJoin(broadcast(total))
      .withColumn("term", (col("n") / col("n_docs")) *
        log((col("n") * col("n_docs")) / (col("nl") * col("ns"))))
      .agg((floor((dsum(col("term"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mi_nats"))
    def entropy(m: DataFrame, cnt: String, out: String) =
      m.crossJoin(broadcast(total))
        .withColumn("term", -(col(cnt) / col("n_docs")) * log(col(cnt) / col("n_docs")))
        .agg((floor((dsum(col("term"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as(out))
    total.crossJoin(mi)
      .crossJoin(entropy(lm, "nl", "h_lang"))
      .crossJoin(entropy(sm, "ns", "h_source"))
      .withColumn("nmi",
        (floor((col("mi_nats") / least(col("h_lang"), col("h_source"))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select("n_docs", "mi_nats", "h_lang", "h_source", "nmi")
  }

  /** §2.3 #224 — CHI-SQUARE independence test of `lang` × `source` (+
    * Cramér's V): the frequentist sibling of [[mutualInfo]] — "is the
    * language mix the same across sources, or is metadata redundant". The
    * statistic is kept ARGMAX-safe by clearing denominators: the per-cell
    * term (obs−exp)²/exp is computed as (n·obs − rl·cs)² / (n·rl·cs) with
    * both sides EXACT decimal(38,0) integers (n·obs wraps long past sf≈1,
    * so the operands widen before the products), one double division per
    * bounded cell, terms decimal-summed — the [[mutualInfo]] discipline.
    * Three linear rollups + broadcast joins of bounded frames; nothing
    * corpus-scale after the cell counts.
    */
  def chi2(spark: SparkSession, dir: String): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val decT = org.apache.spark.sql.types.DecimalType(28, 12)
    val d = docs(spark, dir)
    val total = d.agg(count(lit(1)).as("n_docs"))
    val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("obs"))
    val lm = d.groupBy("lang").agg(count(lit(1)).as("rl"))
    val sm = d.groupBy("source").agg(count(lit(1)).as("cs"))
    val dims = lm.agg(count(lit(1)).as("n_lang"))
      .crossJoin(sm.agg(count(lit(1)).as("n_source")))
    val dev = cells.join(broadcast(lm), "lang").join(broadcast(sm), "source")
      .crossJoin(broadcast(total))
      .withColumn("d", col("n_docs").cast(big) * col("obs").cast(big) -
        col("rl").cast(big) * col("cs").cast(big))
      .withColumn("term", (col("d") * col("d")).cast("double") /
        (col("n_docs").cast(big) * col("rl").cast(big) * col("cs").cast(big))
          .cast("double"))
      .agg((floor((sum(col("term").cast(decT)).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("chi2"))
    total.crossJoin(dev).crossJoin(broadcast(dims))
      .withColumn("dof", (col("n_lang") - 1) * (col("n_source") - 1))
      .withColumn("cramers_v", (floor((sqrt(col("chi2") /
        (col("n_docs") * least(col("n_lang") - 1, col("n_source") - 1)))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select("n_docs", "dof", "chi2", "cramers_v")
  }

  /** §2.3 #252 — CURRICULUM INTERLEAVE: deterministic round-robin mixing
    * of sources (position = (rank-within-source − 1)·|sources| +
    * source-index) — the data-mixing primitive that turns per-source
    * shards into one training order where every window of |sources| docs
    * touches every source once; hash/random shuffles only achieve that in
    * expectation. Everything is integer rank arithmetic: per-source
    * row_number (key-partitioned window — the per-group sort a shuffle
    * would need anyway), a broadcast of the tiny ordered source index, and
    * a top-N by position (TakeOrderedAndProject — no global sort). The
    * first `take` positions are returned as the inspection window.
    */
  def curriculumInterleave(spark: SparkSession, dir: String, take: Int = 100)
      : DataFrame = {
    val d = docs(spark, dir).select("doc_id", "source")
    val srcIdx = d.select("source").distinct()
      .withColumn("src_idx",
        row_number().over(Window.orderBy("source")) - 1)
    val nS = srcIdx.count()
    d.withColumn("rn",
        row_number().over(Window.partitionBy("source").orderBy("doc_id")))
      .join(broadcast(srcIdx), "source")
      .select(col("doc_id"), col("source"),
        ((col("rn") - 1) * nS + col("src_idx")).cast("long").as("position"))
      .orderBy("position").limit(take)
  }

  /** §2.3 #344 — GOPHER-STYLE quality RULES per source: the five classic
    * hard filters (Rae et al. 2021 §A1.1 adapted to this corpus's
    * ranges) — token-count window, mean-word-length window, top-token
    * dominance, repeated-token mass, stopword presence — each a per-doc
    * boolean, rolled up per source as independent fail counts + the
    * all-rules keep rate. Unlike #32's blended score (one number, one
    * threshold), rules are AND-ed flags — the form production filter
    * stacks take, and the per-rule counts say WHICH rule does the
    * culling on which source. One explode pass for the token histogram
    * (vocab-bounded per doc), one fused per-doc projection, one
    * partial-aggregated source rollup.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val flags = gopherFlags(spark, dir)
    def fails(c: String) = sum(when(col(c), 0L).otherwise(1L)).as(s"fail_${c.drop(5)}")
    flags.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        fails("pass_len"), fails("pass_wordlen"), fails("pass_top"),
        fails("pass_rep"), fails("pass_stop"),
        sum(when(col("pass_len") && col("pass_wordlen") && col("pass_top") &&
          col("pass_rep") && col("pass_stop"), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_rate",
        floor(col("n_keep").cast("double") / col("n_docs").cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6))
      .orderBy("source")
  }

  /** Per-document Gopher rule flags — the doc-level frame [[gopherRules]]
    * rolls up and the #400 calibration outcome reads (one derivation, two
    * consumers).
    */
  private[operators] def gopherFlags(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"), col("source"), col("text"), tokensCol.as("toks"))
      .withColumn("nt", size(col("toks")))
      .withColumn("mwl",
        length(regexp_replace(col("text"), " ", "")).cast("double") / col("nt"))
      .withColumn("stop_hits",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is')))"))
    val hist = base.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top_c"), count(lit(1)).as("n_distinct"))
    // LEFT join + explicit failure on a missing histogram row: with the
    // current tokenizer `split(trim(text), " ")` never yields an empty
    // array, so every doc HAS a histogram row — but that's a tokenizer
    // invariant, not a join guarantee. An inner join would silently drop
    // such a doc from n_docs entirely (ADVICE r9); here it stays counted
    // and fails the dominance/repetition rules explicitly.
    base.join(hist, Seq("doc_id"), "left")
      .withColumn("pass_len", col("nt") >= 30 && col("nt") <= 90)
      .withColumn("pass_wordlen", col("mwl") >= 4.0 && col("mwl") <= 4.9)
      .withColumn("pass_top", coalesce(
        col("top_c").cast("double") / col("nt") <= 0.15, lit(false)))
      .withColumn("pass_rep", coalesce(
        lit(1.0) - col("n_distinct").cast("double") / col("nt") <= 0.6,
        lit(false)))
      .withColumn("pass_stop", col("stop_hits") >= 1)
  }

  /** §2.3 #357 — NEYMAN ALLOCATION for stratified labeling: per source
    * stratum h, the optimal share of a fixed annotation budget
    * nₕ ∝ Nₕ·σₕ (σ = std of doc token counts — the cost/variability
    * proxy) — the survey-sampling answer to "how many docs from each
    * source go to human review" (#68's stratified sample splits
    * EVENLY; Neyman minimizes the variance of the corpus-level estimate
    * at the same budget, oversampling big AND internally-diverse
    * strata). One power-sum pass per stratum, the Σ Nₕσₕ normalizer is a
    * broadcast 1-row frame, allocations for a 1000-doc budget rounded
    * half-up (engine-stable floor form).
    */
  def neymanAlloc(spark: SparkSession, dir: String, budget: Int = 1000)
      : DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val s = docs(spark, dir)
      .select(col("source"), size(tokensCol).cast("long").as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("st"),
        sum(col("nt").cast(big) * col("nt").cast(big)).as("qt"))
      .localCheckpoint(true)
    val nD = col("n_docs").cast("double")
    // σ via the exact-integer radicand: √(n·Σx²−(Σx)²)/n
    val sigma = sqrt((col("n_docs").cast(big) * col("qt") -
      col("st").cast(big) * col("st").cast(big)).cast("double")) / nD
    val scored = s.withColumn("ns", nD * sigma).localCheckpoint(true)
    val z = scored.agg(sum(col("ns").cast(dec)).as("zd"))
      .select(col("zd").cast("double").as("z"))
    def fl6(c: org.apache.spark.sql.Column) = Fl6(c)
    scored.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), fl6(sigma).as("sigma_tokens"),
        fl6(col("ns") / col("z")).as("alloc_share"),
        floor(col("ns") / col("z") * budget + lit(0.5)).cast("long")
          .as("alloc_n"))
      .orderBy("source")
  }

  /** §2.3 #355 — TEMPERATURE-SCALED mixture weights (τ = 0.5): per
    * source, sampling weight wᵢ ∝ pᵢ^τ renormalized — the multilingual-
    * mixture flattening that upsamples rare sources without letting any
    * one dominate (XLM-R-style; #195's data_recipe weights by a FIXED
    * index, this derives weights from the corpus's OWN shares). τ = ½
    * keeps the power exact cross-engine (√ is IEEE-correctly-rounded on
    * both; a libm pow(x, 0.7) need not match); boost = w/p says how many
    * × each source is over/under-sampled vs natural. Two bounded
    * aggregates over the per-source token counts.
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val ns = docs(spark, dir)
      .select(col("source"), size(tokensCol).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens"))
      .localCheckpoint(true)
    val tot = ns.agg(sum("n_tokens").as("n_c"))
    val p = col("n_tokens").cast("double") / col("n_c").cast("double")
    val scored = ns.crossJoin(broadcast(tot))
      .withColumn("p", p).withColumn("sq", sqrt(p))
      .localCheckpoint(true)
    val z = scored.agg(sum(col("sq").cast(dec)).as("zd"))
      .select(col("zd").cast("double").as("z"))
    def fl6(c: org.apache.spark.sql.Column) = Fl6(c)
    scored.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"), fl6(col("p")).as("share"),
        fl6(col("sq") / col("z")).as("weight"),
        fl6(col("sq") / col("z") / col("p")).as("boost"))
      .orderBy("source")
  }

  /** §2.3 #345 — COUNT-MIN SKETCH error measurement over the token
    * frequency stream: build a 3×`w` CMS (bucket = three 8-hex-digit
    * sha256 slices mod w — the #256 engine-portable hash family), read
    * the top-`topK` tokens back through it, and report estimate vs exact
    * with the ε = e·N/w theoretical bound — the calibration run before
    * trusting a fixed-memory sketch for heavy-hitter counting at 100 TB
    * (#111's MG sketch keeps a candidate LIST; CMS answers point queries,
    * and its overestimate on THIS corpus's skew is an empirical fact
    * worth one cheap job). Sketch and top-K both live on the bounded
    * vocabulary frame; the 3·w cell table broadcasts back for the probe.
    */
  def cmsError(spark: SparkSession, dir: String, w: Int = 1024,
      topK: Int = 20): DataFrame = {
    def pos(h: Int): org.apache.spark.sql.Column =
      expr(s"CAST(conv(substr(sha2(tok, 256), ${1 + 8 * h}, 8), 16, 10) " +
        s"AS BIGINT) % $w")
    val counts = docs(spark, dir)
      .select(explode(tokensCol).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("tok"), col("cnt"),
        pos(0).as("p0"), pos(1).as("p1"), pos(2).as("p2"))
      .localCheckpoint(true)
    val cells = counts
      .select(col("cnt"), explode(array(
        struct(lit(0).as("h"), col("p0").as("b")),
        struct(lit(1).as("h"), col("p1").as("b")),
        struct(lit(2).as("h"), col("p2").as("b")))).as("hb"))
      .select(col("cnt"), col("hb.h").as("h"), col("hb.b").as("b"))
      .groupBy("h", "b").agg(sum("cnt").as("cell"))
    val tot = counts.agg(sum("cnt").as("n_stream"))
    def cellFor(h: Int) = broadcast(cells.where(col("h") === h)
      .select(col("b").as(s"b$h"), col("cell").as(s"cell$h")))
    counts.orderBy(col("cnt").desc, col("tok")).limit(topK)
      .join(cellFor(0), col("p0") === col("b0"))
      .join(cellFor(1), col("p1") === col("b1"))
      .join(cellFor(2), col("p2") === col("b2"))
      .crossJoin(broadcast(tot))
      .select(col("tok"), col("cnt").as("exact_cnt"),
        least(col("cell0"), col("cell1"), col("cell2")).as("est_cnt"),
        (least(col("cell0"), col("cell1"), col("cell2")) - col("cnt"))
          .as("overestimate"),
        (floor(lit(math.E) * col("n_stream").cast("double") / lit(w.toDouble)
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("eps_bound"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** §2.3 #390 — K-ANONYMITY audit over quasi-identifiers (source, lang,
    * 100-char length bucket): any document whose QID equivalence class has
    * fewer than `k` members is re-identifiable from metadata alone — the
    * release gate a curated corpus passes BEFORE publication, complementing
    * content-level PII scrubbing (#107): scrubbing removes identifiers
    * written IN the text, this catches identification BY the row's
    * attributes. Two bounded aggregations: class sizes (shuffle keyed on
    * the QID tuple — cardinality ≤ |sources|·|langs|·|buckets|, never
    * corpus rows), then a per-source rollup of risky classes and the
    * documents exposed in them; integer-exact except the final ratio.
    */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val classes = docs(spark, dir)
      .select(col("source"), col("lang"),
        (floor(col("n_chars") / lit(100)) * 100).cast("long").as("len_bucket"))
      .groupBy("source", "lang", "len_bucket")
      .agg(count(lit(1)).as("cls"))
    classes.groupBy("source")
      .agg(count(lit(1)).as("n_classes"),
        sum("cls").as("n_docs"),
        sum(when(col("cls") < k, 1L).otherwise(0L)).as("risky_classes"),
        sum(when(col("cls") < k, col("cls")).otherwise(0L)).as("docs_at_risk"))
      .select(col("source"), col("n_classes"), col("n_docs"),
        col("risky_classes"), col("docs_at_risk"),
        Fl6(col("docs_at_risk").cast("double") / col("n_docs").cast("double"))
          .as("risk_share"))
      .orderBy("source")
  }
}
