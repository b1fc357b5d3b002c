package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Text-analysis operators for corpus curation (SURVEY.md §2.3). All pure
  * per-row expressions over `documents` — embarrassingly parallel, no
  * shuffle except the final presentation sort, codegen end-to-end.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  private def tokensCol = split(trim(col("text")), " ")

  /** §2.3 #28 — per-document stats: token count, average token length,
    * punctuation ratio. Integer ratios surfaced as doubles (single division,
    * deterministic).
    */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(tokensCol).as("n_tokens"),
        length(regexp_replace(col("text"), " ", "")).as("n_alnum"),
        length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).as("n_punct"),
        length(col("text")).as("n_chars_m"))
      .withColumn("avg_token_len", col("n_alnum").cast("double") / col("n_tokens"))
      .withColumn("punct_ratio", col("n_punct").cast("double") / col("n_chars_m"))
      .select("doc_id", "n_tokens", "avg_token_len", "punct_ratio")
      .orderBy("doc_id")

  /** Stopword profiles for the language-ID heuristic. */
  private val enStops = Seq("the", "a", "of", "and", "is")
  private val deStops = Seq("der", "die", "das", "und", "ist")
  private val esStops = Seq("el", "la", "los", "de", "es")

  private def hits(words: Seq[String]) = {
    val set = words.map(w => s"'$w'").mkString("(", ", ", ")")
    expr(s"size(filter(toks, t -> t IN $set))")
  }

  /** §2.3 #29 — language ID by stopword-profile hits with a deterministic
    * priority tie-break (en > de > es > unknown).
    */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdCore(spark, dir).orderBy("doc_id")

  /** [[langId]] without the final presentation `orderBy` — the internal
    * consumers (cohensKappa, krippendorffAlpha, langConfusion,
    * sourceLangMix) all re-aggregate immediately, so the global sort +
    * RangePartitioner sampling pass over the detection scan was wasted
    * work in their lineages (guide §2.4).
    */
  private[operators] def langIdCore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("toks"))
      .withColumn("en_hits", hits(enStops))
      .withColumn("de_hits", hits(deStops))
      .withColumn("es_hits", hits(esStops))
      .withColumn("lang_detected",
        when(col("en_hits") === 0 && col("de_hits") === 0 && col("es_hits") === 0, "unknown")
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits"), "en")
          .when(col("de_hits") >= col("es_hits"), "de")
          .otherwise("es"))
      .select("doc_id", "lang_detected", "en_hits", "de_hits", "es_hits")

  /** §2.3 #30 — token counting: whitespace tokens plus BPE-ish regex classes
    * (alpha runs, digit runs, punctuation singletons).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(tokensCol).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-zA-Z]+")).as("alpha_tokens"),
        regexp_count(col("text"), lit("[0-9]+")).as("num_tokens"),
        regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).as("punct_tokens"))
      .orderBy("doc_id")

  /** §2.3 #225 — TOKENIZER FERTILITY by language × source: tokens per 100
    * characters and bytes per token — the compute-cost planning stat for a
    * multilingual corpus (a language at 2× bytes/token costs 2× the
    * training tokens per stored byte; fertility drift across sources flags
    * encoding problems). One partial-aggregated pass: per-row token/char/
    * byte counts (codegen'd `size`/`length`/`octet_length`, no UDF) roll up
    * to the bounded lang×source grid; two divisions per cell at the end.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), col("source"), size(tokensCol).as("toks"),
        length(col("text")).as("chars"), octet_length(col("text")).as("bytes"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks").cast("long")).as("tokens"),
        sum(col("chars").cast("long")).as("chars"),
        sum(col("bytes").cast("long")).as("bytes"))
      .select(col("lang"), col("source"), col("n_docs"), col("tokens"),
        col("chars"), col("bytes"),
        (floor((col("tokens").cast("double") * 100.0 / col("chars").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("tokens_per_100_chars"),
        (floor((col("bytes").cast("double") / col("tokens").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("bytes_per_token"))
      .orderBy("lang", "source")

  /** §2.3 #234 — term BURSTINESS (Fano factor) for the top-K corpus terms:
    * variance-to-mean ratio of per-document occurrence counts, zeros
    * included. A term whose occurrences cluster in few documents (topical /
    * boilerplate — Fano ≫ 1) behaves completely differently for dedup and
    * quality filters than a uniformly sprinkled function word (Fano ≈ 1,
    * Poisson-like), so burstiness separates "content word" from "glue
    * word" with no lexicon. Zero-count documents enter through the closed
    * form Fano = (N·Σc² − (Σc)²) / (N·Σc): documents without the term
    * contribute 0 to both sums, so only docs containing the term are ever
    * aggregated — the corpus-sized pass is the token explode, partial-
    * aggregated on (doc, term) then (term); top-K is TakeOrdered, and the
    * Fano division is the single double op per surviving term.
    */
  def burstiness(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val big = DecimalType(38, 0)
    val perDoc = docs(spark, dir)
      .select(col("doc_id"), explode(tokensCol).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val byTerm = perDoc.groupBy("term")
      .agg(sum("c").as("s"),
        sum(col("c").cast(big) * col("c").cast(big)).as("sq"),
        count(lit(1)).as("df"))
    val top = byTerm.orderBy(col("s").desc, col("term").asc).limit(topK)
    val tot = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    top.crossJoin(broadcast(tot))
      .select(col("term"), col("s").as("n_occurrences"), col("df").as("n_docs_with"),
        (floor(((col("n_docs").cast(big) * col("sq") -
          col("s").cast(big) * col("s").cast(big)).cast("double") /
          (col("n_docs").cast(big) * col("s").cast(big)).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("fano"))
      .orderBy(col("n_occurrences").desc, col("term").asc)
  }

  /** §2.3 #240 — HAPAX LEGOMENA profile per source: vocabulary size, count
    * of once-occurring terms, and the hapax share — the classic vocabulary-
    * health curve (natural text runs ~40-60% hapax by Zipf; a source far
    * below is template/boilerplate-heavy, far above is OCR noise or
    * tokenizer breakage — both are curation flags that pure volume stats
    * miss). One explode → (source, term) partial-aggregated count →
    * bounded per-source rollup; integer-exact with one share division per
    * source.
    */
  def hapax(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("source"), explode(tokensCol).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("n_hapax"),
        (floor((col("n_hapax").cast("double") / col("vocab").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("hapax_share"))
      .orderBy("source")

  /** §2.3 #247 — token-weighted DUPLICATE INFLATION per source: corpus
    * tokens vs tokens over DISTINCT texts — the compute-cost statement of
    * duplication ("this source costs 3.2× the training tokens its unique
    * content justifies"), which doc-count dedup stats understate because
    * duplicated documents are often the long ones. One (source, text)
    * rollup carries both the copy count and the (identical-per-copy) token
    * count, so total = Σ copies·tokens and distinct = Σ tokens come from
    * the same bounded frame; integer-exact, one division per source.
    */
  def dupInflation(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("source"), col("text"),
        size(tokensCol).cast("long").as("tok"))
      .groupBy("source", "text")
      .agg(count(lit(1)).as("copies"), max("tok").as("tok"))
      .groupBy("source")
      .agg(sum("copies").as("n_docs"), count(lit(1)).as("n_distinct"),
        sum(col("copies") * col("tok")).as("total_tokens"),
        sum("tok").as("distinct_tokens"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        col("total_tokens"), col("distinct_tokens"),
        (floor((col("total_tokens").cast("double") /
          col("distinct_tokens").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("inflation"))
      .orderBy("source")

  /** §2.3 #250 — pairwise SOURCE VOCABULARY OVERLAP (Jaccard over term
    * sets): which sources share a lexicon — the source-level near-duplicate
    * detector (two feeds of the same upstream crawl overlap ~1.0 and
    * should be deduplicated as SOURCES before any doc-level pass spends
    * compute on them). The join is on TERM through the (term, source)
    * vocabulary table, so each term fans out C(sources-with-term, 2) ≤
    * |sources|²/2 pairs — bounded by the source count, never by corpus
    * size; per-source vocab sizes broadcast back for the union term.
    * Integer-exact, one Jaccard division per surviving pair.
    */
  def sourceVocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    val vocab = docs(spark, dir)
      .select(col("source"), explode(tokensCol).as("term"))
      .distinct()
      .localCheckpoint(true)
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("v"))
    val inter = vocab.as("a")
      .join(vocab.as("b"),
        col("a.term") === col("b.term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("v").as("va"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("v").as("vb"))), "source_b")
      .select(col("source_a"), col("source_b"), col("va"), col("vb"),
        col("n_shared"),
        (floor((col("n_shared").cast("double") /
          (col("va") + col("vb") - col("n_shared")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** §2.3 #251 — n-gram NOVELTY per document: the share of a document's
    * DISTINCT bigrams first introduced by it (attribution = min doc_id per
    * bigram over the corpus) — the marginal-diversity score a curation
    * pipeline optimizes when it asks "does adding this document teach the
    * model anything new?", and the per-doc view of the #193 vocabulary-
    * growth curve. Deterministic: first-occurrence is a min-aggregate, not
    * an ordering-dependent scan. Scale shape: explode → per-(doc, bigram)
    * distinct → min per bigram (shuffle on the bigram key) → hash join
    * back → per-doc rollup; everything linear in token count, one division
    * per doc.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', w[i-1], w[i]))"))
        .as("bigram"))
      .distinct()
      .localCheckpoint(true)
    val firstDoc = grams.groupBy("bigram").agg(min("doc_id").as("first_doc"))
    grams.join(firstDoc, "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_bigrams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_distinct_bigrams"), col("n_novel"),
        (floor((col("n_novel").cast("double") /
          col("n_distinct_bigrams").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("novelty"))
      .orderBy("doc_id")
  }

  /** §2.3 #258 — VOCABULARY COVERAGE curve: the share of corpus tokens
    * covered by the top-K most frequent terms, at the K values a tokenizer
    * designer actually sweeps (10 … 10⁴) — how much of the stream a
    * vocabulary of size K explains, the empirical basis for vocab-size /
    * byte-fallback decisions (and the integral view of `q_zipf`'s slope).
    * Exact: term counts roll up map-side; ranks and the integer prefix
    * sum both come from ONE [[PrefixScan.runningSums]] distributed scan
    * over the DISTINCT-term frame ordered (count desc, term asc) —
    * vocabulary grows with the corpus (Heaps' law has no ceiling on web
    * junk), so no one-task unpartitioned window; each K's coverage is one
    * division.
    */
  def vocabCoverage(spark: SparkSession, dir: String,
      ks: Seq[Int] = Seq(10, 100, 1000, 10000)): DataFrame = {
    import spark.implicits._
    val counts = docs(spark, dir)
      .select(explode(tokensCol).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .withColumn("negc", -col("c")).withColumn("one", lit(1L))
    val ranked = PrefixScan.runningSums(counts, "negc",
      Seq(col("c").desc, col("term").asc),
      Seq("one" -> "rk", "c" -> "cum"))
    val tot = counts.agg(sum("c").as("total"), count(lit(1)).as("vocab"))
    // clamp k to the vocabulary size so every requested k emits a row
    // (beyond-vocab k trivially covers 100%) at any scale factor
    val kDf = ks.toDF("k").crossJoin(broadcast(tot))
      .withColumn("k_eff", least(col("k").cast("long"), col("vocab")))
    ranked.join(broadcast(kDf), col("rk").cast("long") === col("k_eff"))
      .select(col("k").cast("long").as("k"), col("vocab"), col("total"),
        (floor((col("cum").cast("double") / col("total").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("coverage"))
      .orderBy("k")
  }

  /** §2.3 #267 — TOKEN-LENGTH profile per language: mean plus exact
    * percentile-disc p50/p95 of word lengths — the byte-level fingerprint
    * that separates scripts and catches tokenizer damage (a lang whose p95
    * token length doubles grew concatenation artifacts; one whose mean
    * halves got over-split). Mean is an exact integer ratio; percentiles
    * come from the bounded (lang, length) histogram (#211 convention —
    * word length is domain-bounded, so every window runs on a tiny frame).
    */
  def tokenLenProfile(spark: SparkSession, dir: String): DataFrame = {
    val lens = docs(spark, dir)
      .select(col("lang"), explode(tokensCol).as("tok"))
      .select(col("lang"), length(col("tok")).cast("long").as("len"))
    val hist = lens.groupBy("lang", "len").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("lang").orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
    def q(p: Double, out: String) =
      min(when(col("cum") >= ceil(col("n") * p).cast("long"), col("len"))).as(out)
    hist
      .select(col("lang"), col("len"), col("cnt"),
        sum("cnt").over(wCum).as("cum"), sum("cnt").over(wAll).as("n"),
        (col("len") * col("cnt")).as("lc"))
      .groupBy("lang")
      .agg(max("n").as("n_tokens"),
        (floor((sum("lc").cast("double") / max("n").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("mean_len"),
        q(0.5, "p50_len"), q(0.95, "p95_len"))
      .orderBy("lang")
  }

  /** §2.3 #270 — CHARACTER-BIGRAM ENTROPY rate per language: the
    * sub-token disorder measure (token entropy #108 is blind to
    * within-word structure — OCR noise and encoding rot raise char-level
    * entropy long before they disturb token stats, and each language has
    * a stable fingerprint band). Denominator-cleared exactness:
    * H = ln N − (Σ c·ln c)/N, so the only per-group float work is one
    * c·ln(c) per DISTINCT bigram (decimal-cast summed, #210) and two final
    * double ops — no per-row probabilities. One explode pass, bounded
    * (lang, bigram) rollup.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 12)
    // Docs shorter than 2 chars have no bigram and MUST be filtered before
    // the explode: Spark's sequence(1, 0) is the DESCENDING array [1, 0]
    // (it honors reversed bounds), which would emit two spurious "bigrams",
    // while DuckDB's generate_series(1, 0) is empty — silent divergence.
    // The per-character bigram explode (~|text| rows per doc) is map-side
    // work on the documents scan: spread it first (guide §2.5) so a
    // sub-split local file doesn't serialize the explode + partial
    // aggregation on one core. No-op at scale.
    val grams = Par.spread(docs(spark, dir)
        .where(length(col("text")) >= 2)
        .select("lang", "text"))
      .select(col("lang"), explode(expr(
        "transform(sequence(1, length(text) - 1), " +
          "i -> substr(text, i, 2))")).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
    grams.groupBy("lang")
      .agg(sum("c").as("n_bigrams"), count(lit(1)).as("vocab"),
        sum((col("c").cast("double") * log(col("c").cast("double")))
          .cast(dec)).as("s"))
      .select(col("lang"), col("n_bigrams"), col("vocab"),
        (floor((log(col("n_bigrams").cast("double")) -
          col("s").cast("double") / col("n_bigrams").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("entropy_nats"))
      .orderBy("lang")
  }

  /** §2.3 #31 — document fingerprint: rolling polynomial hash over word
    * tokens. token_hash(t) = 7*len(t) + ascii(t[0]); fp = fold over tokens of
    * (acc*131 + token_hash) mod 1e9+7 starting at 7. A sequential fold, so
    * the fingerprint is a pure function of the text — identical on any
    * engine; that's what makes it a cross-system content fingerprint.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), expr(
        """aggregate(
          |  transform(split(trim(text), ' '),
          |            t -> CAST(length(t) * 7 + ascii(substring(t, 1, 1)) AS bigint)),
          |  7L, (acc, h) -> pmod(acc * 131 + h, 1000000007L))""".stripMargin).as("fp"))
      .orderBy("doc_id")

  /** §2.3 #32 — composite quality score in [0,1]:
    * 0.4 * min(1, n_tokens/80) + 0.4 * (1 - punct_ratio) + 0.2 * stopword_ratio,
    * with a keep/drop flag at 0.5. All ratios are single int->double
    * divisions (deterministic); the score is rounded to 6 for presentation.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScoreCore(spark, dir).orderBy("doc_id")

  /** [[qualityScore]] without the final presentation `orderBy`: every
    * internal consumer (curate, dedupCanonical, qualityBySource,
    * eceQuality, dsirCalibration) immediately re-keys by join or
    * aggregation, so the global range-partition + sort of the corpus-sized
    * score frame — plus the RangePartitioner's extra sampling pass over
    * the whole scoring pipeline — was pure wasted work in their lineages
    * (guide §2.4: "an orderBy used only to make output deterministic").
    */
  private[operators] def qualityScoreCore(spark: SparkSession,
      dir: String): DataFrame =
    // Pure per-row text scoring (tokenize + regexp strip + stop-hit scan)
    // on the single local split (r15 JobProf: a 1.0 s one-task job inside
    // q_dedup_canonical) — spread first (guide §2.5; no-op at scale).
    Par.spread(docs(spark, dir))
      .select(col("doc_id"), col("text"), tokensCol.as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_hits", hits(enStops))
      .withColumn("punct_ratio",
        length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("double")
          / length(col("text")))
      .withColumn("len_score",
        least(lit(1.0), col("n_tokens").cast("double") / 80.0))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("score",
        col("len_score") * 0.4 + (lit(1.0) - col("punct_ratio")) * 0.4
          + col("stop_ratio") * 0.2)
      .select(col("doc_id"), (floor((col("score")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("quality"),
        (col("score") >= 0.5).as("keep"))

  /** §2.3 #46 — deterministic train/holdout split by content hash: the
    * first hex digit of sha256(text) buckets every document into 16 slices;
    * `holdoutHexDigits` of them form the holdout. Content-addressed
    * splitting is the 100 TB-correct way to cut datasets: stable under
    * re-partitioning, re-ingestion, and engine changes (no RNG state), and
    * exact duplicates always land on the same side of the cut, so the
    * holdout can't leak into training via a copy. Pure per-row codegen.
    */
  /** §2.3 #106 — BM25 keyword retrieval: score every document against a
    * small query-term set and keep the top `topK` — the inverted-index
    * ranking pass a corpus-search / hard-negative-mining pipeline runs.
    *
    * Plan shape at 100 TB: one explode pass computes term frequencies ONLY
    * for query terms (the isin filter prunes inside the scan stage, so the
    * shuffle carries ≤ |terms| rows per doc); document frequencies and
    * corpus stats are tiny aggregates that broadcast back; the final top-K
    * is TakeOrderedAndProject (per-partition heaps). Per-term weights are
    * summed as exact decimals so the score is order-independent, and the
    * ranking key is the ROUNDED score (+ doc_id tie-break) so ranks are
    * engine-reproducible.
    */
  def bm25(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("query", "vector", "merge"),
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("w"))
      .select(col("doc_id"), size(col("w")).cast("bigint").as("dl"),
        explode(col("w")).as("tok"))
    val tf = toks.where(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("dfq"))
    val stats = docs(spark, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(size(tokensCol).cast("bigint")).cast("double").as("sdl"))
    tf.join(broadcast(dfq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("dfq") + 0.5) / (col("dfq") + 0.5)))
      .withColumn("tw",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / (col("sdl") / col("n_docs")))))
      .groupBy("doc_id")
      .agg((floor((sum(col("tw").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
        .cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** §2.3 #108 — token-diversity profile via COLLISION entropy (Rényi-2):
    * per document, effective vocabulary size `n²/Σc²` (participation ratio)
    * and its log2 in bits — a low-diversity / boilerplate filter signal,
    * the sketch-free cousin of the Gopher repetition ratios.
    *
    * Why Rényi-2 and not Shannon: Shannon entropy sums `c·log2(c)` PER
    * DISTINCT TOKEN, and engines disagree on float logs at the ulp level, so
    * a cross-engine hash can flip on any of millions of per-token terms.
    * The collision form needs only `Σc²` — exact integer arithmetic that
    * every engine computes identically — and pays ONE float log on the
    * final already-aggregated rational, where a 6-decimal round absorbs ulp
    * noise with ~1e-10 residual risk per row instead of per token.
    *
    * Plan shape at 100 TB: shuffle key is (doc_id, token) — counts partially
    * aggregate map-side and no per-doc state or token list ever materializes
    * (same contract as [[Curation.repetition]]).
    */
  def entropy(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(tokensCol).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (floor(((col("n_tokens") * col("n_tokens")).cast("double")
          / col("sum_c2").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("eff_vocab"),
        (floor((log2((col("n_tokens") * col("n_tokens")).cast("double")
          / col("sum_c2").cast("double"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("h2_bits"))
      .orderBy("doc_id")

  def splitHash(spark: SparkSession, dir: String, holdoutHexDigits: Int = 2): DataFrame = {
    require(holdoutHexDigits >= 1 && holdoutHexDigits <= 15)
    val cut = java.lang.Integer.toHexString(holdoutHexDigits - 1)
    docs(spark, dir)
      .select(col("doc_id"),
        substring(sha2(col("text"), 256), 1, 1).as("bucket"))
      .withColumn("split",
        when(col("bucket") <= cut, lit("holdout")).otherwise(lit("train")))
      .orderBy("doc_id")
  }

  /** §2.3 #145 — ZIPF FIT of the corpus vocabulary: least-squares slope of
    * ln(freq) vs ln(rank) over the top-`topV` tokens. Natural corpora run
    * near slope −1; a corpus whose slope drifts far from its baseline has a
    * vocabulary anomaly (template flood, boilerplate injection, language
    * shift) — a one-row corpus health check next to the per-doc filters.
    *
    * Token counts partially aggregate; the top-V cut is a
    * TakeOrderedAndProject; the regression runs over topV points with
    * DECIMAL-cast moment sums (Σx, Σy, Σxy, Σxx, Σyy — order-free), and
    * slope/intercept/R² are the same closed-form double arithmetic on both
    * engines.
    */
  def zipfFit(spark: SparkSession, dir: String, topV: Int = 100): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    def m(c: org.apache.spark.sql.Column) = sum(c.cast(dec)).cast("double")
    val top = docs(spark, dir)
      .select(explode(tokensCol).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(topV)
    // Ranks over the already-cut topV rows: a tiny global window.
    val ranked = top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("tok").asc)))
    ranked
      .select(log(col("rank").cast("double")).as("x"),
        log(col("n").cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("nn"),
        m(col("x")).as("sx"), m(col("y")).as("sy"),
        m(col("x") * col("y")).as("sxy"),
        m(col("x") * col("x")).as("sxx"),
        m(col("y") * col("y")).as("syy"))
      .select(
        col("nn").cast("long").as("n_fit"),
        (floor(((col("nn") * col("sxy") - col("sx") * col("sy")) /
          (col("nn") * col("sxx") - col("sx") * col("sx"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("slope"),
        (floor(((col("sy") - (col("nn") * col("sxy") - col("sx") * col("sy")) /
          (col("nn") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("nn")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("intercept"),
        (floor((
          ((col("nn") * col("sxy") - col("sx") * col("sy")) *
           (col("nn") * col("sxy") - col("sx") * col("sy"))) /
          ((col("nn") * col("sxx") - col("sx") * col("sx")) *
           (col("nn") * col("syy") - col("sy") * col("sy")))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("r2"))
  }

  /** §2.3 #134 — bigram language-model scoring (the CCNet/Gopher-style LM
    * quality filter, with the corpus itself as the reference model): each
    * document's average token surprisal −ln P(cur|prev) under an add-one-
    * smoothed bigram model fit on the whole corpus. Low-surprisal docs are
    * repetitive/templated; high-surprisal docs are noise — the two tails a
    * quality cut removes.
    *
    * Corpus model = two partial-aggregated count tables (bigrams and
    * unigram contexts, both vocabulary-bounded, broadcast while they fit)
    * plus a 1-row vocab size; scoring joins each document's bigram
    * INSTANCES against them on the bigram/context equi-keys. Per-doc sums
    * run over DECIMAL(28,12)-cast ln terms, so the aggregation is
    * order-free and the score reproduces bit-for-bit cross-engine.
    */
  def ngramLm(spark: SparkSession, dir: String): DataFrame =
    ngramLmCore(spark, dir).orderBy("doc_id")

  /** [[ngramLm]] without the final presentation `orderBy` —
    * [[surprisalOutliers]] re-aggregates and re-joins the per-doc frame,
    * so the global sort + RangePartitioner sampling pass over the whole
    * bigram pipeline was wasted work in its lineage (guide §2.4).
    */
  private[operators] def ngramLmCore(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val bigrams = docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS a, w[i] AS b))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val bgCounts = bigrams.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val ctxCounts = bigrams.groupBy("a").agg(count(lit(1)).as("c_a"))
    val vocab = docs(spark, dir)
      .select(explode(tokensCol).as("tok"))
      .agg(countDistinct("tok").cast("double").as("v"))
    bigrams
      .join(bgCounts.hint("broadcast"), Seq("a", "b"))
      .join(ctxCounts.hint("broadcast"), Seq("a"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        -log((col("c_ab") + 1.0) / (col("c_a") + col("v"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (floor((sum(col("nll").cast(dec)).cast("double") / count(lit(1))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("avg_surprisal"))
  }

  /** §2.3 #289 — SURPRISAL OUTLIER flags: every document's [[ngramLm]]
    * average bigram surprisal z-scored against the corpus distribution —
    * the actionable form of the LM quality filter (#134 gives the score;
    * this gives the CUT): |z| > 2 low-tail docs are repetitive/templated,
    * high-tail docs are noise/gibberish — the two tails a CCNet-style
    * quality gate removes. The corpus mean/σ fences come from exact
    * decimal sums of the (rounded, engine-identical) per-doc scores — one
    * 1-row broadcast, no global sort, no percentile pass; z is one IEEE
    * formula per doc with the engine-stable floor rounding.
    */
  def surprisalOutliers(spark: SparkSession, dir: String,
      zCut: Double = 2.0): DataFrame = {
    val dec = DecimalType(28, 12)
    val lm = ngramLmCore(spark, dir).select("doc_id", "avg_surprisal")
    val st = lm.agg(count(lit(1)).as("n"),
      sum(col("avg_surprisal").cast(dec)).cast("double").as("sx"),
      sum((col("avg_surprisal") * col("avg_surprisal")).cast(dec))
        .cast("double").as("sxx"))
    val n = col("n").cast("double")
    val mean = col("sx") / n
    val z = (col("avg_surprisal") - mean) /
      sqrt(col("sxx") / n - mean * mean)
    lm.crossJoin(broadcast(st))
      .select(col("doc_id"), col("avg_surprisal"),
        (floor(z * lit(1e6) + lit(0.5)) / lit(1e6)).as("z"),
        when(z > zCut, "high").when(z < -zCut, "low").otherwise("ok")
          .as("flag"))
      .orderBy("doc_id")
  }

  /** §2.3 #290 — intra-document LANGUAGE MIXING (code-switching detector):
    * each document's first and second token halves language-ID'd
    * independently with the #29 stopword profiles; halves that disagree
    * (both confidently known) mark concatenation artifacts — two pages
    * glued by extraction, boilerplate in a second language — which
    * whole-doc langid averages away (the dominant half wins and the
    * contamination ships into a "monolingual" corpus). Output is the
    * bounded (lang_first × lang_second) matrix with the mixed flag. One
    * scan, two bounded-array filters per row, one ≤25-cell rollup.
    */
  def langMix(spark: SparkSession, dir: String): DataFrame = {
    def hitsOn(c: String, words: Seq[String]) = {
      val set = words.map(w => s"'$w'").mkString("(", ", ", ")")
      expr(s"size(filter($c, t -> t IN $set))")
    }
    def detect(en: Column, de: Column, es: Column): Column =
      when(en === 0 && de === 0 && es === 0, "unknown")
        .when(en >= de && en >= es, "en")
        .when(de >= es, "de")
        .otherwise("es")
    val halves = docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("toks"))
      .where(size(col("toks")) >= 4)
      .select(col("doc_id"),
        expr("slice(toks, 1, size(toks) DIV 2)").as("f"),
        expr("slice(toks, size(toks) DIV 2 + 1, size(toks) - size(toks) DIV 2)")
          .as("s"))
    halves
      .select(col("doc_id"),
        detect(hitsOn("f", enStops), hitsOn("f", deStops), hitsOn("f", esStops))
          .as("lang_first"),
        detect(hitsOn("s", enStops), hitsOn("s", deStops), hitsOn("s", esStops))
          .as("lang_second"))
      .groupBy("lang_first", "lang_second")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("mixed",
        col("lang_first") =!= col("lang_second") &&
          col("lang_first") =!= "unknown" && col("lang_second") =!= "unknown")
      .orderBy("lang_first", "lang_second")
  }

  /** §2.3 #124 — per-document KEYWORD extraction: the top-`k` tokens by
    * tf-idf (idf = ln((N+1)/(df+1)), the smoothed form that never divides by
    * zero). Keywords are the cheap per-doc topic signal a curation pipeline
    * uses for domain tagging, mixture audits, and search-index previews —
    * the per-document complement of the corpus-level [[bm25]] retrieval
    * scorer.
    *
    * Plan shape at 100 TB: tf is a (doc_id, token) partial-aggregated
    * count; df derives from tf by a second partial aggregation on token
    * (never re-scanning the corpus); the df table joins back on the token
    * equi-key — broadcast while the vocabulary fits (it is count-bounded,
    * not corpus-bounded), falling back to a vocabulary-sized shuffle; the
    * per-doc top-k is one row_number window partitioned by doc_id — N
    * distinct window keys, no hot partition. The rank key is the ROUNDED
    * score (with a token tie-break), so ranking is reproducible
    * cross-engine even where an unrounded ulp could flip an order.
    */
  def keywords(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val tf = docs(spark, dir)
      .select(col("doc_id"), explode(tokensCol).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs(spark, dir).agg(count(lit(1)).cast("double").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok").asc)
    tf.join(df.hint("broadcast"), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (floor((col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"),
        col("score"))
      .orderBy("doc_id", "rank")
  }

  /** §2.3 #175 — declared-vs-inferred LANGUAGE CONFUSION matrix: the
    * [[langId]] heuristic's verdict against the corpus's declared `lang`
    * column, with within-declared-language shares — the calibration table
    * that says where the cheap n-gram filter can be trusted before it
    * gates a 100 TB corpus. One per-row classification (scan-stage
    * expressions), one \|langs\|² bounded rollup.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    langIdCore(spark, dir).select("doc_id", "lang_detected")
      .join(docs(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang", "lang_detected")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share_of_lang", (floor((col("n_docs") /
        sum(col("n_docs")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang"))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("lang", "lang_detected")

  /** §2.3 #157 — document RARITY score: mean smoothed IDF
    * (ln((N+1)/(df+1)), the [[keywords]] convention) over a document's
    * token OCCURRENCES — high = mostly rare vocabulary. Curation pipelines
    * rank by this to surface specialist / long-tail documents (or, at the
    * low end, boilerplate) before sampling decisions.
    *
    * Plan shape at 100 TB: df derives from the (doc, token) presence
    * aggregate, never re-scans the corpus; the vocabulary-bounded IDF
    * table broadcasts back onto the token stream; per-doc means are one
    * partial-aggregated shuffle with DECIMAL sums (fp-order-proof); the
    * top-k cut compiles to TakeOrderedAndProject on the ROUNDED score with
    * a doc_id tie-break (cross-engine reproducible ranking).
    */
  def docRarity(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val toks = docs(spark, dir)
      .select(col("doc_id"), explode(tokensCol).as("tok"))
    val df = toks.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs(spark, dir).agg(count(lit(1)).cast("double").as("n_docs"))
    toks
      .join(df.hint("broadcast"), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", log((col("n_docs") + 1.0) / (col("df") + 1.0)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (floor((sum(col("idf").cast(dec)).cast("double") / count(lit(1))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("rarity"))
      .orderBy(col("rarity").desc, col("doc_id").asc)
      .limit(k)
  }

  /** §2.3 #158 — readability scoring (Flesch reading-ease with a
    * vowel-group syllable heuristic): 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words). The standard cheap complexity filter a
    * curation pipeline runs next to [[qualityScore]] — too-low scores are
    * jargon/run-on walls, absurdly high ones are fragment spam. Sentence
    * count = terminal-punctuation runs (min 1); syllables = [aeiouy]+
    * groups. All three counts are integer-exact regexp counts at scan
    * speed; only the final formula is floating point (deterministic: one
    * expression, fixed operand order, rounded).
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(tokensCol).as("n_words"),
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))),
          lit(1)).as("n_sentences"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .as("n_syllables"))
      .withColumn("flesch",
        (floor((lit(206.835) -
          lit(1.015) * (col("n_words") / col("n_sentences")) -
          lit(84.6) * (col("n_syllables") / col("n_words"))) * lit(1e4) + lit(0.5)) / lit(1e4)))
      .orderBy("doc_id")

  /** §2.3 #197 — per-source QUALITY rollup (which sources are dragging
    * the corpus): doc counts, keep counts/rate, and mean quality score by
    * source — the table a mixture re-weighting decision reads. Reuses
    * [[qualityScore]] verbatim (one derivation, two views — the oracle
    * wraps the quality oracle), joins source by doc_id, and means the
    * ROUNDED per-doc score through an exact decimal sum so the rollup is
    * order-independent.
    */
  def qualityBySource(spark: SparkSession, dir: String): DataFrame = {
    val q = qualityScoreCore(spark, dir)
    val src = docs(spark, dir).select("doc_id", "source")
    q.join(src, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        (floor((sum(col("quality").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean_quality"))
      .withColumn("keep_rate",
        (floor((col("n_keep") / col("n_docs").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select("source", "n_docs", "n_keep", "keep_rate", "mean_quality")
      .orderBy("source")
  }

  /** §2.3 #193 — vocabulary GROWTH curve (Heaps'-law readout: is the
    * corpus still contributing new vocabulary, or scraping the same
    * text?): cumulative distinct tokens vs cumulative tokens over doc-id
    * deciles. Cumulative-distinct never runs as such — each token
    * contributes at its FIRST document (one token→min(doc_id) partial
    * agg), so vocab-at-cut is a cumulative sum of per-decile counts: two
    * linear aggregations + a 10-row window, where the naive formulation
    * re-counts distinct per cut (10 corpus scans). Decile assignment is
    * integer DIV; the max doc id enters as a one-row broadcast.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val maxId = d.agg(max("doc_id").as("max_id"))
    val docDec = d.select(col("doc_id"), size(tokensCol).as("n_toks"))
      .crossJoin(broadcast(maxId))
      .withColumn("decile", expr("CAST(doc_id * 10 DIV (max_id + 1) AS INT) + 1"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs_d"), sum(col("n_toks").cast("long")).as("n_tokens_d"))
    val tokDec = d.select(col("doc_id"), explode(tokensCol).as("token"))
      .groupBy("token").agg(min("doc_id").as("first_doc"))
      .crossJoin(broadcast(maxId))
      .withColumn("decile", expr("CAST(first_doc * 10 DIV (max_id + 1) AS INT) + 1"))
      .groupBy("decile").agg(count(lit(1)).as("new_vocab"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docDec.join(tokDec, Seq("decile"), "left_outer")
      .withColumn("new_vocab", coalesce(col("new_vocab"), lit(0L)))
      .select(col("decile"),
        sum(col("n_docs_d")).over(w).as("n_docs_cum"),
        sum(col("n_tokens_d")).over(w).as("n_tokens_cum"),
        sum(col("new_vocab")).over(w).as("vocab_cum"),
        col("new_vocab"))
      .orderBy("decile")
  }

  /** §2.3 #208 — HYBRID RETRIEVAL via RECIPROCAL-RANK FUSION: the
    * RAG-standard way to combine two rankers without score calibration —
    * each ranker contributes 1/(60+rank), so agreement near the top
    * dominates and scale differences between scoring functions cancel.
    * Here the lexical pair every retrieval stack starts from: [[bm25]]
    * and plain tf·idf over the same query terms.
    *
    * Determinism: ranks are assigned over 6-decimal-ROUNDED scores (the
    * cross-engine-stable values the oracles already pin) with doc_id
    * tie-break, so rank assignment can never flip on an ulp; the fused
    * score is a fixed-order sum of two exact-rational doubles, rounded.
    * Scale shape: identical to [[bm25]] — candidate set bounded by the
    * query terms' document frequency, stats and df broadcast; the rank
    * windows run over the candidate set only, and the final top-K is a
    * TakeOrderedAndProject.
    */
  def rrfFusion(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("query", "vector", "merge"),
      k1: Double = 1.2, b: Double = 0.75, kRrf: Int = 60,
      topK: Int = 20): DataFrame = {
    val dec = DecimalType(28, 10)
    val toks = docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("w"))
      .select(col("doc_id"), size(col("w")).cast("bigint").as("dl"),
        explode(col("w")).as("tok"))
    val tf = toks.where(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("dfq"))
    val stats = docs(spark, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(size(tokensCol).cast("bigint")).cast("double").as("sdl"))
    val scored = tf.join(broadcast(dfq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("tw_bm25",
        log(lit(1.0) + (col("n_docs") - col("dfq") + 0.5) / (col("dfq") + 0.5)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / (col("sdl") / col("n_docs")))))
      .withColumn("tw_tfidf",
        col("tf") * log((col("n_docs") + 1.0) / (col("dfq") + 1.0)))
      .groupBy("doc_id")
      .agg((floor((sum(col("tw_bm25").cast(dec)).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("bm25"),
        (floor((sum(col("tw_tfidf").cast(dec)).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("tfidf"))
    // The candidate set is df(query-terms)-sized — corpus-growing for
    // common terms — so both ranks run as PrefixScan's distributed rank,
    // not unpartitioned windows; the scored frame is checkpointed once.
    val base = scored.withColumn("negb", -col("bm25"))
      .withColumn("negt", -col("tfidf"))
      .localCheckpoint(false)
    val ranked = PrefixScan.rowNumber(
      PrefixScan.rowNumber(base,
        "negb", Seq(col("bm25").desc, col("doc_id").asc), "rank_bm25"),
      "negt", Seq(col("tfidf").desc, col("doc_id").asc), "rank_tfidf")
    ranked
      .withColumn("rrf", (floor((
        lit(1.0) / (lit(kRrf) + col("rank_bm25")) +
        lit(1.0) / (lit(kRrf) + col("rank_tfidf"))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select("doc_id", "rank_bm25", "rank_tfidf", "rrf")
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** §2.3 #296 — per-source unigram KL DIVERGENCE vs the corpus: how far
    * each source's token distribution sits from the corpus mixture —
    * KL(source ‖ corpus) = Σ p_s·ln(p_s/p_c) over the source's observed
    * vocabulary (p_s > 0 everywhere it's summed, p_c ≥ p_s/N > 0 always,
    * so every term is finite) — the CCNet-style domain-shift score that
    * ranks sources by "how unlike the rest of the data is this" before a
    * mixture is committed. One explode pass to (source, token) counts —
    * the corpus counts DERIVE from the same frame (no second scan) — then
    * one ln per distinct (source, token) with decimal-summed terms.
    */
  def sourceKl(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 12)
    val st = docs(spark, dir)
      .select(col("source"), explode(tokensCol).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cs"))
    val ct = st.groupBy("tok").agg(sum("cs").as("cc"))
    val ns = st.groupBy("source").agg(sum("cs").as("n_s"))
    val nc = st.agg(sum("cs").as("n_c"))
    val ps = col("cs").cast("double") / col("n_s").cast("double")
    val pc = col("cc").cast("double") / col("n_c").cast("double")
    st.join(ct, "tok").join(broadcast(ns), "source")
      .crossJoin(broadcast(nc))
      .select(col("source"), col("n_s"), (ps * log(ps / pc)).as("term"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"), count(lit(1)).as("vocab"),
        (floor(sum(col("term").cast(dec)).cast("double") * lit(1e6) +
          lit(0.5)) / lit(1e6)).as("kl"))
      .orderBy("source")
  }

  /** §2.3 #297 — BURROWS' DELTA stylometric distance between sources:
    * per-source function-word rates (the 15 en/de/es stopword profiles,
    * per 1000 tokens), z-scored per word across sources, Delta(a, b) =
    * mean |z_a − z_b| — the classic authorship/stylometry measure, here
    * the "did two sources come from the same generator/mirror" detector
    * that token-overlap (#181) can't see (it compares CONTENT; Delta
    * compares function-word STYLE, which survives paraphrase). The grid
    * is dense |sources| × 15 (absent words count 0, so every z is
    * defined; zero-variance words drop out of the mean), built from one
    * token-explode pass; everything after is bounded-frame arithmetic.
    */
  def burrowsDelta(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 12)
    val words = enStops ++ deStops ++ esStops
    val tok = docs(spark, dir)
      .select(col("source"), explode(tokensCol).as("tok"))
    val ns = tok.groupBy("source").agg(count(lit(1)).as("n_s"))
    val cnt = tok.where(col("tok").isInCollection(words))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .withColumnRenamed("tok", "w")
    val grid = ns
      .select(col("source"), col("n_s"), explode(typedlit(words)).as("w"))
      .join(cnt, Seq("source", "w"), "left")
      .select(col("source"), col("w"),
        (lit(1000.0) * coalesce(col("c"), lit(0L)).cast("double") /
          col("n_s").cast("double")).as("f"))
    val stats = grid.groupBy("w")
      .agg(count(lit(1)).as("k"),
        sum(col("f").cast(dec)).cast("double").as("sf"),
        sum((col("f") * col("f")).cast(dec)).cast("double").as("sff"))
      .select(col("w"), (col("sf") / col("k").cast("double")).as("mu"),
        sqrt(col("sff") / col("k").cast("double") -
          (col("sf") / col("k").cast("double")) *
          (col("sf") / col("k").cast("double"))).as("sd"))
      .where(col("sd") > 0.0)
    val z = grid.join(broadcast(stats), "w")
      .select(col("source"), col("w"),
        ((col("f") - col("mu")) / col("sd")).as("z"))
    z.as("a").join(z.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        abs(col("a.z") - col("b.z")).as("dz"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_words"),
        (floor(sum(col("dz").cast(dec)).cast("double") /
          count(lit(1)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("delta"))
      .orderBy("source_a", "source_b")
  }

  /** The shared (source, token) count frame with corpus totals — the base
    * of [[sourceKl]], [[jsDivergence]] and [[hellinger]]: one explode pass,
    * corpus counts DERIVED from the same frame (no second scan).
    */
  private def sourceTokenFrame(spark: SparkSession, dir: String): DataFrame = {
    val st = docs(spark, dir)
      .select(col("source"), explode(tokensCol).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cs"))
    val ct = st.groupBy("tok").agg(sum("cs").as("cc"))
    val ns = st.groupBy("source").agg(sum("cs").as("n_s"))
    val nc = st.agg(sum("cs").as("n_c"))
    st.join(ct, "tok").join(broadcast(ns), "source").crossJoin(broadcast(nc))
  }

  /** §2.3 #349 — per-source JENSEN–SHANNON divergence vs the corpus token
    * mixture: JS(P‖C) = ½KL(P‖M) + ½KL(C‖M), M = ½(P+C) — the SYMMETRIC,
    * always-finite companion to #296's KL (KL explodes when the corpus has
    * mass where a source has none and isn't comparable across directions;
    * JS ∈ [0, ln2] is the number mixture dashboards can threshold).
    * Summed over the corpus vocabulary (M > 0 everywhere; a source's
    * missing token contributes only its C-side term, handled by the
    * 0·ln0 = 0 convention). Same vocab-bounded frame as #296, terms
    * decimal-summed, natural log.
    */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 12)
    val ps = col("cs").cast("double") / col("n_s").cast("double")
    val pc = col("cc").cast("double") / col("n_c").cast("double")
    val m = (ps + pc) / 2.0
    // Dense over the corpus vocabulary per source: cs = 0 rows (token
    // absent from the source) still carry the C-side ½·pc·ln(pc/m) term.
    val frame = sourceTokenFrame(spark, dir)
    val sources = frame.select("source", "n_s").distinct()
    val vocab = frame.select("tok", "cc", "n_c").distinct()
    val dense = sources.crossJoin(vocab)
      .join(frame.select("source", "tok", "cs"), Seq("source", "tok"), "left")
      .withColumn("cs", coalesce(col("cs"), lit(0L)))
    // Fixed-order per-row double math, THEN one decimal cast — the sum is
    // order-independent and the 0·ln0 = 0 convention is the explicit when.
    val term = ((when(col("cs") > 0, ps * log(ps / m)).otherwise(lit(0.0)) +
      pc * log(pc / m)) / 2.0).cast(dec)
    dense.select(col("source"), col("n_s"), term.as("half_term"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        (floor(sum(col("half_term")).cast("double") * lit(1e6) + lit(0.5)) /
          lit(1e6)).as("js"))
      .orderBy("source")
  }

  /** §2.3 #350 — per-source HELLINGER distance vs the corpus token
    * mixture: H = √(1 − Σ√(p_s·p_c)) ∈ [0,1] — the bounded metric (true
    * triangle inequality, unlike KL #296 / JS #349 which are divergences)
    * that plugs straight into clustering sources by distributional shape.
    * The Bhattacharyya sum runs over the source's OBSERVED vocabulary
    * only (√(0·q) = 0 — absent tokens contribute nothing), so the frame
    * stays sparse; terms decimal-summed, one √ per distinct (source,
    * token) in the scan stage.
    */
  def hellinger(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 12)
    val ps = col("cs").cast("double") / col("n_s").cast("double")
    val pc = col("cc").cast("double") / col("n_c").cast("double")
    sourceTokenFrame(spark, dir)
      .select(col("source"), col("n_s"), sqrt(ps * pc).cast(dec).as("bc"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"), count(lit(1)).as("vocab"),
        (floor(sqrt(greatest(lit(1.0) - sum(col("bc")).cast("double"),
          lit(0.0))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("hellinger"))
      .orderBy("source")
  }

  /** §2.3 #356 — per-source token-frequency GINI: how concentrated each
    * source's vocabulary usage is — G = (2Σᵢ i·cᵢ)/(V·Σc) − (V+1)/V over
    * frequencies ranked ascending within the source (0 = every token
    * used equally, → 1 = a few tokens dominate). The concentration
    * SCALAR next to #145's Zipf slope (a fit) and #240's hapax share (one
    * tail bucket); sources whose G drifts release-over-release changed
    * register or got templated. Ranks are a per-source window over the
    * source's vocabulary (bounded by the language's lexicon, not the
    * corpus — the zipf convention); Σi·cᵢ is exact integer, decimal-
    * summed.
    */
  def giniToken(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val cnt = docs(spark, dir)
      .select(col("source"), explode(tokensCol).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    // vocab-bounded per-source partitions (lexicon-sized at any corpus SF)
    val w = Window.partitionBy("source").orderBy("c", "tok")
    cnt.withColumn("i", row_number().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab"), sum("c").as("n_tokens"),
        sum((col("i") * col("c")).cast(big)).as("ic"))
      .select(col("source"), col("vocab"), col("n_tokens"),
        (floor((lit(2.0) * col("ic").cast("double") /
          (col("vocab") * col("n_tokens")).cast("double") -
          (col("vocab") + 1).cast("double") / col("vocab").cast("double"))
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("gini"))
      .orderBy("source")
  }

  /** §2.3 #351 — COHEN'S KAPPA of declared vs inferred language:
    * chance-corrected agreement κ = (p_o − p_e)/(1 − p_e) over the #175
    * confusion matrix — the single calibration NUMBER for the langid
    * gate (#175 shows WHERE it errs; raw accuracy flatters any skewed
    * corpus where guessing the majority language already scores high).
    * Bounded |langs|² frame; marginals re-aggregate from the cells;
    * exact integer counts down to two final divisions.
    */
  def cohensKappa(spark: SparkSession, dir: String): DataFrame = {
    val cells = langIdCore(spark, dir).select("doc_id", "lang_detected")
      .join(docs(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang", "lang_detected").agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val rows = cells.groupBy("lang").agg(sum("nij").as("nr"))
    val cols2 = cells.groupBy("lang_detected").agg(sum("nij").as("ncol"))
    val tot = cells.agg(sum("nij").as("n"),
      sum(when(col("lang") === col("lang_detected"), col("nij"))
        .otherwise(0L)).as("agree"))
    val pe = rows.join(cols2, col("lang") === col("lang_detected"))
      .agg(sum(col("nr") * col("ncol")).as("pe_num"))
    val fl6 = (c: org.apache.spark.sql.Column) => Fl6(c)
    tot.crossJoin(broadcast(pe))
      .select(col("n").as("n_docs"), col("agree").as("n_agree"),
        fl6(col("agree").cast("double") / col("n").cast("double")).as("po"),
        fl6(col("pe_num").cast("double") /
          (col("n") * col("n")).cast("double")).as("pe"),
        fl6((col("agree").cast("double") / col("n").cast("double") -
          col("pe_num").cast("double") / (col("n") * col("n")).cast("double")) /
          (lit(1.0) - col("pe_num").cast("double") /
            (col("n") * col("n")).cast("double"))).as("kappa"))
  }

  /** §2.3 #397 — KRIPPENDORFF'S ALPHA (nominal) over a three-rater
    * language-annotation grid: rater 1 = the declared `lang`, rater 2 =
    * the #29 stopword-profile inference, rater 3 = the document's
    * source-majority declared lang (majority by (count desc, lang asc) —
    * the "annotate by provenance" baseline). Alpha generalizes #351's
    * two-rater kappa to m raters (and to missing data, though this grid
    * is complete): α = 1 − D_o/D_e over the coincidence matrix — the
    * standard reliability number for judging whether a labeling scheme
    * (human or model annotators alike) is trustworthy enough to train on.
    *
    * Exactness: with m = 3 raters everywhere, the observed disagreement
    * is Σ_u (m² − Σ_c m_uc²) and the marginals n_c are plain integer
    * counts, so α = 1 − D2·(n−1)/(2·(n² − Σ n_c²)) is integers down to
    * ONE final division. Work: one per-(doc, category) count (≤3 rows per
    * doc), a ≤|langs|-row marginal frame — nothing beyond the #29 scan.
    */
  def krippendorffAlpha(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("lang"), col("source"))
    val det = langIdCore(spark, dir).select(col("doc_id"), col("lang_detected"))
    val srcCnt = d.groupBy("source", "lang").agg(count(lit(1)).as("n"))
    val wSrc = Window.partitionBy("source").orderBy(col("n").desc, col("lang").asc)
    val srcMaj = srcCnt.withColumn("rn", row_number().over(wSrc))
      .where(col("rn") === 1).select(col("source"), col("lang").as("lang_src"))
    val muc = d.join(det, "doc_id").join(broadcast(srcMaj), "source")
      .select(col("doc_id"),
        explode(array(col("lang"), col("lang_detected"), col("lang_src"))).as("cat"))
      .groupBy("doc_id", "cat").agg(count(lit(1)).as("m"))
    val obs = muc.groupBy("doc_id")
      .agg((lit(9L) - sum(col("m") * col("m"))).as("d2u"))
      .agg(sum("d2u").as("d2"), count(lit(1)).as("n_units"))
    val marg = muc.groupBy("cat").agg(sum("m").as("nc"))
      .agg(sum("nc").as("n"), sum(col("nc") * col("nc")).as("snc2"))
    val fl6 = (c: Column) => Fl6(c)
    obs.crossJoin(broadcast(marg))
      .select(col("n_units"), col("n").as("n_ratings"),
        fl6(col("d2").cast("double") /
          (lit(2.0) * col("n").cast("double"))).as("d_obs"),
        fl6((col("n") * col("n") - col("snc2")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double")).as("d_exp"),
        fl6(lit(1.0) - col("d2").cast("double") * (col("n") - 1).cast("double") /
          (lit(2.0) * (col("n") * col("n") - col("snc2")).cast("double")))
          .as("alpha"))
  }

  /** §2.3 #400 — EXPECTED-CALIBRATION-ERROR reliability table for the #32
    * quality score, judged against the INDEPENDENT #344 Gopher rule gate:
    * confidence = the per-doc quality score (its [0,1] blend read as "how
    * sure am I this doc is keepable"), outcome = the doc passes all five
    * Gopher rules; docs bucket into 10 equal-width confidence bins and
    * each bin reports size, mean confidence, accuracy, |gap|, and its ECE
    * contribution (n_b/N·gap) — the reliability diagram + ECE
    * decomposition any model-scored filtering gate should publish before
    * its scores gate a 100 TB corpus (a score can RANK well and still be
    * wildly miscalibrated — thresholds transfer only if this table is
    * flat). The two signals share no thresholds, so the comparison is a
    * genuine calibration question, not a tautology.
    *
    * Determinism: the 6-dp-rounded score is recovered to an exact INTEGER
    * (floor(q·1e6 + 0.5)) and binned with integer division — never a
    * float boundary; per-bin confidence sums ride DECIMAL(28,12),
    * accuracies are integer ratios; work is two doc-level scans + a
    * ≤10-row aggregate.
    */
  def eceQuality(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 12)
    val fl6 = (c: Column) => Fl6(c)
    val q = qualityScoreCore(spark, dir).select(col("doc_id"), col("quality"))
    val ok = Curation.gopherFlags(spark, dir)
      .select(col("doc_id"),
        when(col("pass_len") && col("pass_wordlen") && col("pass_top") &&
          col("pass_rep") && col("pass_stop"), 1L).otherwise(0L).as("ok"))
    val f = q.join(ok, "doc_id")
      .withColumn("qint", floor(col("quality") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("bin", least(expr("qint * 10 DIV 1000000"), lit(9L)))
      .withColumn("conf", col("quality"))
    val tot = f.agg(count(lit(1)).as("n_total"))
    f.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("ok").as("n_correct"),
        sum(col("conf").cast(dec)).as("sconf"))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_docs"), col("n_correct"),
        fl6(col("sconf").cast("double") / col("n_docs").cast("double"))
          .as("avg_conf"),
        fl6(col("n_correct").cast("double") / col("n_docs").cast("double"))
          .as("accuracy"),
        fl6(abs(col("sconf").cast("double") / col("n_docs").cast("double") -
          col("n_correct").cast("double") / col("n_docs").cast("double")))
          .as("gap"),
        fl6(col("n_docs").cast("double") / col("n_total").cast("double") *
          abs(col("sconf").cast("double") / col("n_docs").cast("double") -
            col("n_correct").cast("double") / col("n_docs").cast("double")))
          .as("ece_contrib"))
      .orderBy("bin")
  }

  /** §2.3 #396 — RANK-BIASED OVERLAP (Webber et al. 2010) between the
    * #208 pair of rankers (BM25 vs tf·idf over the same query terms):
    * RBO@d = (1−p)/p · Σ_{i≤d} pⁱ·|A_1..i ∩ B_1..i|/i — the top-weighted
    * "how similar are two retrieval systems" number (Kendall/Spearman
    * need identical item sets and weight the tail equally; RBO's
    * geometric weights match how users read result lists). Reported as
    * the per-depth overlap curve with the cumulative RBO in the last
    * row — the curve says WHERE the rankers diverge, the scalar says how
    * much. Ranks are assigned over the same 6-dp-ROUNDED scores as #208
    * (ulp-flip-proof, doc_id tie-break), pⁱ weights are ONE sequence of
    * Scala-computed double literals embedded in both engines (the
    * lshCurve lesson: never let two engines exponentiate independently),
    * and the cumulative sum rides DECIMAL(28,12) over a ≤d-row frame.
    * Scale shape: the candidate set is query-term-df-bounded (PrefixScan
    * distributed ranks, #208's discipline); everything after the `mx ≤ d`
    * filter is a ≤d-row local frame.
    */
  def rbo(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("query", "vector", "merge"),
      k1: Double = 1.2, b: Double = 0.75, p: Double = 0.9,
      depth: Int = 20): DataFrame = {
    val dec = DecimalType(28, 10)
    val dec12 = DecimalType(28, 12)
    val fl6 = (c: Column) => Fl6(c)
    val toks = docs(spark, dir)
      .select(col("doc_id"), tokensCol.as("w"))
      .select(col("doc_id"), size(col("w")).cast("bigint").as("dl"),
        explode(col("w")).as("tok"))
    val tf = toks.where(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("dfq"))
    val stats = docs(spark, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(size(tokensCol).cast("bigint")).cast("double").as("sdl"))
    val scored = tf.join(broadcast(dfq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("tw_bm25",
        log(lit(1.0) + (col("n_docs") - col("dfq") + 0.5) / (col("dfq") + 0.5)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / (col("sdl") / col("n_docs")))))
      .withColumn("tw_tfidf",
        col("tf") * log((col("n_docs") + 1.0) / (col("dfq") + 1.0)))
      .groupBy("doc_id")
      .agg((floor((sum(col("tw_bm25").cast(dec)).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("bm25"),
        (floor((sum(col("tw_tfidf").cast(dec)).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("tfidf"))
    val base = scored.withColumn("negb", -col("bm25"))
      .withColumn("negt", -col("tfidf"))
      .localCheckpoint(false)
    val ranked = PrefixScan.rowNumber(
      PrefixScan.rowNumber(base,
        "negb", Seq(col("bm25").desc, col("doc_id").asc), "rank_bm25"),
      "negt", Seq(col("tfidf").desc, col("doc_id").asc), "rank_tfidf")
    val mxF = ranked
      .select(col("doc_id"),
        greatest(col("rank_bm25"), col("rank_tfidf")).as("mx"))
      .where(col("mx") <= depth)
    // p^i as ONE sequence of literals shared verbatim with the oracle.
    val weights = rboWeights(p, depth)
    import spark.implicits._
    val spine = weights.toDF("depth", "w")
    val factor = (1.0 - p) / p
    val wCum = Window.orderBy("depth")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(mxF, col("mx") <= col("depth"), "left_outer")
      .groupBy("depth", "w")
      .agg(count(col("doc_id")).as("n_common"))
      .withColumn("agreement",
        col("n_common").cast("double") / col("depth").cast("double"))
      .withColumn("term", col("w") * col("agreement"))
      .withColumn("rbo_cum", fl6(lit(factor) *
        sum(col("term").cast(dec12)).over(wCum).cast("double")))
      .select(col("depth"), col("n_common"), fl6(col("agreement")).as("agreement"),
        col("rbo_cum"))
      .orderBy("depth")
  }

  /** Sequentially-multiplied (depth, p^depth) pairs — the single source of
    * truth both engines embed as literals.
    */
  private[graft] def rboWeights(p: Double, depth: Int): Seq[(Int, Double)] = {
    var w = 1.0
    (1 to depth).map { i => w *= p; (i, w) }
  }

  /** §2.3 #373 — STOPWORD-DENSITY profile per source: share of tokens
    * drawn from a fixed function-word list, with the doc-level density
    * range. The cheapest of the quality signals (Gopher's "stop word
    * count" rule, #344, thresholds it per document; this is the
    * per-SOURCE calibration view that says where to SET the threshold
    * before a 100 TB pass). One scan, pure per-row token filtering,
    * partial-aggregated; densities are single divisions of exact integer
    * counts.
    */
  def stopwordDensity(spark: SparkSession, dir: String,
      stops: Seq[String] = Seq("join", "hash", "row", "batch", "scan")): DataFrame = {
    val fl6 = (c: Column) => Fl6(c)
    // Membership test via a typed array literal, NOT string-interpolated SQL:
    // a stopword containing a quote must stay a plain value, never expression
    // text (ADVICE r11). array_contains over a <=|stops|-element literal is
    // the same codegen'd per-token check the IN list compiled to.
    val stopLit = typedLit(stops)
    docs(spark, dir)
      .select(col("source"), tokensCol.as("toks"))
      .select(col("source"), size(col("toks")).as("n_tok"),
        size(filter(col("toks"), t => array_contains(stopLit, t))).as("n_stop"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum("n_stop").as("n_stopwords"),
        max(col("n_stop").cast("double") / col("n_tok")).as("max_doc_density"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_stopwords"),
        fl6(col("n_stopwords").cast("double") / col("n_tokens").cast("double"))
          .as("density"),
        fl6(col("max_doc_density")).as("max_doc_density"))
      .orderBy("source")
  }

  /** §2.3 #384 — DSIR importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): per-document log importance
    * w(d) = Σ_t c_d(t)·[ln p_target(t) − ln p_raw(t)] under add-one
    * unigram models — the published cheap proxy for "does this raw
    * document look like the target distribution", used to resample a
    * web-scale corpus toward a quality target before training. Target
    * here = the declared-`targetLang` slice; raw = the rest. Summarized
    * per source (n_docs, mean/min/max weight) — the view that says which
    * SOURCES the resampling would up/down-weight.
    *
    * Exactness: each distinct token's log-ratio is ONE scalar double
    * (ln of identical add-one ratios — engine-identical inputs), per-doc
    * sums ride c_d(t)·ratio cast DECIMAL(38,12) (order-free), per-source
    * means decimal-summed then divided once. At 100 TB: the token-ratio
    * frame is vocab-sized, the per-doc pass is one explode + equi-join
    * keyed on token (shuffle moves (token, count) pairs, never
    * documents), everything partial-aggregates.
    */
  def dsirWeights(spark: SparkSession, dir: String,
      targetLang: String = "en"): DataFrame = {
    val dec = DecimalType(38, 12)
    val fl6 = (c: Column) => Fl6(c)
    val toks = docs(spark, dir)
      .select(col("doc_id"), col("source"),
        (col("lang") === targetLang).as("is_t"),
        explode(tokensCol).as("t"))
    val counts = toks.groupBy("doc_id", "source", "is_t", "t")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // Vocab-sized model frame: add-one token counts under both models.
    val model = counts.groupBy("t")
      .agg(sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"),
        sum(when(col("is_t"), lit(0L)).otherwise(col("c"))).as("cr"))
    val tot = model.agg(sum("ct").as("nt"), sum("cr").as("nr"),
      count(lit(1)).as("v"))
    val ratio = model.crossJoin(broadcast(tot))
      .select(col("t"),
        (log((col("ct") + 1L).cast("double") /
            (col("nt") + col("v")).cast("double")) -
          log((col("cr") + 1L).cast("double") /
            (col("nr") + col("v")).cast("double"))).as("lr"))
    val perDoc = counts.join(ratio, "t")
      .groupBy("doc_id", "source")
      .agg(sum((col("c").cast("double") * col("lr")).cast(dec)).as("w"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        fl6(sum(col("w")).cast("double") / count(lit(1))).as("mean_w"),
        fl6(min(col("w")).cast("double")).as("min_w"),
        fl6(max(col("w")).cast("double")).as("max_w"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[dsirWeights]]: same add-one unigram models, same
    * per-token scalar log-ratios, same decimal sums.
    */
  def dsirWeightsOracleSql(targetLang: String = "en"): String = {
    // Quote-unsafe interpolation guard (ADVICE r12, the stopwordDensity
    // lesson): the lang tag is interpolated into SQL, so pin it to the
    // BCP-47-ish shapes the corpus actually uses before it reaches the
    // string.
    require(targetLang.matches("[A-Za-z]{2,8}(-[A-Za-z0-9]{1,8})*"),
      s"dsirWeightsOracleSql: targetLang '$targetLang' is not a language tag")
    s"""WITH toks AS (
       |  SELECT doc_id, source, (lang = '$targetLang') AS is_t,
       |    unnest(string_split(trim(text), ' ')) AS t
       |  FROM documents
       |), counts AS (
       |  SELECT doc_id, source, is_t, t, count(*) AS c
       |  FROM toks GROUP BY 1, 2, 3, 4
       |), model AS (
       |  SELECT t,
       |    sum(CASE WHEN is_t THEN c ELSE 0 END) AS ct,
       |    sum(CASE WHEN is_t THEN 0 ELSE c END) AS cr
       |  FROM counts GROUP BY 1
       |), tot AS (
       |  SELECT sum(ct) AS nt, sum(cr) AS nr, count(*) AS v FROM model
       |), ratio AS (
       |  SELECT t,
       |    ln((ct + 1)::DOUBLE / (nt + v)::DOUBLE)
       |      - ln((cr + 1)::DOUBLE / (nr + v)::DOUBLE) AS lr
       |  FROM model, tot
       |), perdoc AS (
       |  SELECT doc_id, source,
       |    sum(CAST(c::DOUBLE * lr AS DECIMAL(38,12))) AS w
       |  FROM counts JOIN ratio USING (t) GROUP BY 1, 2
       |)
       |SELECT source, count(*) AS n_docs,
       |  floor(CAST(CAST(sum(w) AS VARCHAR) AS DOUBLE) / count(*)
       |    * 1e6 + 0.5) / 1e6 AS mean_w,
       |  floor(CAST(CAST(min(w) AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS min_w,
       |  floor(CAST(CAST(max(w) AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS max_w
       |FROM perdoc GROUP BY source ORDER BY source""".stripMargin
  }

  /** §2.3 #374 — SHINGLE-COMPRESSION (cross-document redundancy) per
    * source: 1 − |distinct word-3-grams| / Σ per-doc distinct 3-grams.
    * The dedup PLANNING number — redundancy ≈ the fraction of shingle
    * mass MinHash banding will find shared, so a source scoring 0.9 here
    * is where a 100 TB dedup pass pays for itself and a source scoring
    * 0.05 can skip it. Shingles ride the same codegen'd
    * [[graft.functions.WordNgrams]] set semantics as the dedup family
    * (per-doc distinct, <3-token docs drop out); the aggregation is one
    * explode + two-level groupBy, shuffle keyed on (source, shingle).
    */
  def shingleCompression(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftglue._
    val fl6 = (c: Column) => Fl6(c)
    val sh = docs(spark, dir)
      .select(col("source"), tokensCol.as("w"))
      .where(size(col("w")) >= 3)
      .select(col("source"),
        exprColumn(graft.functions.WordNgrams(columnExpr(col("w")), 3)).as("sh"))
      .select(col("source"), explode(col("sh")).as("g"))
    // Partial-agg friendly two-level rollup: per (source, g) counts first
    // (map-side combine collapses the heavy hitters), then per source.
    sh.groupBy("source", "g").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_shingles"),
        count(lit(1)).as("n_distinct"))
      .select(col("source"), col("n_shingles"), col("n_distinct"),
        fl6(lit(1.0) - col("n_distinct").cast("double") /
          col("n_shingles").cast("double")).as("redundancy"))
      .orderBy("source")
  }

  /** §2.3 #389 — BPE MERGE-CANDIDATE SCAN: corpus-wide adjacent
    * character-pair frequencies, top-`topK` by (count desc, pair asc) —
    * the inner loop of byte-pair-encoding training (each BPE round merges
    * the argmax of exactly this table), extracted as the distributed
    * primitive: ONE explode of ⌈len−1⌉ positions per document (pure
    * codegen: sequence + substr, no UDF), then a hash aggregation whose
    * key space is bounded by |alphabet|² — a few thousand keys at ANY
    * corpus size, so the shuffle after map-side combine is partitions ×
    * |pairs|, independent of the 100 TB scan. A full BPE trainer is this
    * scan iterated with the running merge table broadcast back; the
    * per-round cost is this operator's cost.
    *
    * Sub-2-char documents are filtered on BOTH engines: Spark's
    * `sequence(1, 0)` would DESCEND ([1,0]) rather than return empty —
    * the guard is correctness, not hygiene.
    */
  def bpePairs(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    // The ⌈len−1⌉-per-doc explode + substr is map-side on the single
    // local split (1.4 s one-task job, r15 JobProf) — spread the pruned
    // text column first (the charEntropy discipline; no-op at scale).
    val pairs = Par.spread(docs(spark, dir)
        .where(length(col("text")) >= 2)
        .select(col("text")))
      .select(col("text"),
        explode(sequence(lit(1), length(col("text")) - 1)).as("i"))
      .select(col("text").substr(col("i"), lit(2)).as("pair"))
    pairs.groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(topK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n").desc, col("pair").asc)))
      .select("rk", "pair", "n")
  }
}
