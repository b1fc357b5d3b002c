package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators for LLM-corpus curation (SURVEY.md §2.3).
  *
  * Scale design (the whole point): nothing here is ever all-pairs.
  *  - Exact dedup groups by a 256-bit content hash — one shuffle, linear.
  *  - MinHash-LSH emits (band-key, doc) rows and only equi-joins docs that
  *    collide in a band; exact Jaccard runs on candidates only. At 100 TB the
  *    band join is a plain shuffle join, linear in candidate pairs.
  *  - SimHash buckets 64-bit fingerprints by 16-bit chunks (pigeonhole: any
  *    pair within Hamming distance 3 shares at least one of 4 chunks), so the
  *    pair search is 4 equi-joins, never a cross join.
  */
object Dedup {

  /** §2.3 #23 — exact dedup. Hash-groupBy on sha256(normalized text): the
    * shuffle key is 32 bytes regardless of document size, so at 100 TB the
    * exchange moves hashes + ids, not documents.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(sha2(lower(trim(col("text"))), 256).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** Word 3-gram shingle set per document (distinct, order-preserving input).
    * Documents with fewer than 3 tokens have no shingles and drop out of
    * near-dup detection (they cannot exceed any Jaccard threshold anyway).
    */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .select(col("doc_id"),
        array_distinct(expr(
          "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"))
          .as("sh"))
      .where(size(col("w")) >= 3)

  /** MinHash parameters: 64 hash functions = 32 bands x 2 rows. With
    * r=2, b=32 a pair at Jaccard s collides in >=1 band with probability
    * 1-(1-s^2)^32: ~1-6e-7 at s=0.6, ~0.03 at s=0.03 — full recall at the
    * threshold, tiny candidate volume below it.
    * Hash family: h_j(x) = (a_j * x + b_j) mod p over x = xxhash64(shingle)
    * mod 2^32, with p prime > 2^32 and a_j < 2^31 so products stay in Long.
    */
  private val MinhashP = 4294967311L
  private val (hashA, hashB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(64)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(64)(math.abs(rnd.nextLong()) % MinhashP)
    (a, b)
  }

  /** (doc_id, sh, sig) with a 64-long MinHash signature per document.
    * Shingles are hashed to 32-bit ints ONCE (`hs`); the 64 signature lanes
    * then run as a single native codegen kernel
    * ([[graft.functions.MinhashSignature]]) — the interpreted
    * array_min/transform formulation of the same arithmetic was ~5x slower.
    */
  private[graft] def signatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftglue._
    val hs = expr("transform(sh, g -> pmod(xxhash64(g), 4294967296L))")
    shingled(spark, dir)
      .withColumn("sig", exprColumn(
        graft.functions.MinhashSignature(columnExpr(hs), hashA, hashB, MinhashP)))
  }

  /** §2.3 #24 — MinHash-LSH near-dup pairs, verified with exact Jaccard.
    * Candidates come ONLY from band collisions (equi-join on the band
    * struct); exact verification joins shingle sets for candidates only.
    */
  def nearDupJaccard(spark: SparkSession, dir: String, threshold: Double = 0.6): DataFrame = {
    val sig = signatures(spark, dir)
    val banded = sig.select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, 31), i -> struct(i AS band, sig[2*i] AS h1, sig[2*i+1] AS h2))"))
          .as("bk"))
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sets = sig.select(col("doc_id"), col("sh"))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j",
        col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
      .where(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash fingerprint per document over word tokens: bit k is the
    * majority vote of bit k across the token hashes. The hash family is the
    * cross-engine char-polynomial one ([[graft.functions.TokenSimhash]]), so
    * the fingerprints — and therefore the near-dup pairs — reproduce exactly
    * in the DuckDB oracle.
    */
  private[graft] def simhashFingerprints(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftglue._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .withColumn("fp", exprColumn(
        graft.functions.TokenSimhash(columnExpr(col("w")))))
      .select("doc_id", "fp")
  }

  /** §2.3 #25 — SimHash near-dup pairs within Hamming distance `maxDist`.
    * Pigeonhole bucketing: the 64-bit fingerprint splits into 4 x 16-bit
    * chunks; any pair with <= 3 differing bits agrees on >= 1 chunk, so
    * candidates are the union of 4 chunk-equality equi-joins. No oracle SQL
    * (driver records rows-only); ScalaTest cross-checks vs brute force.
    */
  def nearDupSimhash(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val fp = simhashFingerprints(spark, dir)
    val chunked = fp.select(col("doc_id"), col("fp"),
        explode(expr(
          "transform(sequence(0, 3), c -> struct(c AS chunk, shiftright(fp, c*16) & 65535 AS v))"))
          .as("ck"))
    chunked.as("x")
      .join(chunked.as("y"),
        col("x.ck") === col("y.ck") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.fp").as("fa"), col("y.fp").as("fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
