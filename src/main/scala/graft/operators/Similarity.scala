package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (SURVEY.md §2.3).
  *
  * Two paths, as a real 100 TB pipeline would ship them:
  *  - brute-force cosine top-k against a small broadcast query set — the
  *    exact baseline. O(N*Q), embarrassingly parallel, zero shuffle of the
  *    corpus side; the only exchange is the final per-query top-k.
  *  - random-hyperplane LSH buckets — the approximate scale path. Corpus and
  *    queries are bucketed by sign-pattern; search is an equi-join on the
  *    bucket id (never a cross join), so cost is linear in bucket occupancy.
  *
  * Vectors are cast float->double before any arithmetic, and dot products are
  * sequential left folds (`aggregate` over the array), so scores are
  * bit-deterministic across partitionings and engines.
  */
object Similarity {

  /** aggregate(zip_with(a, b, *), 0.0, +) — a sequential, deterministic fold. */
  private val dotExpr = "aggregate(zip_with(%s, %s, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(expr(dotExpr.format("v", "v"))))

  /** §2.3 #26 — brute-force cosine top-k for query vectors vec_id < nQueries.
    * The query set is broadcast; the corpus is scanned once, fully parallel.
    */
  def bruteTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val emb = embeddings(spark, dir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(dotExpr.format("v", "qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** Deterministic random hyperplanes (seeded): nBits x dim gaussians. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** §2.3 #27 — LSH-bucketed approximate top-k. Bucket id = sign pattern of
    * `nBits` hyperplane projections; candidates are bucket-mates only (plain
    * equi-join on a long key). Recall is tuned by nBits (fewer bits -> bigger
    * buckets -> higher recall); the ScalaTest suite measures recall vs the
    * brute-force baseline. Driver records a rows-only check (no SQL oracle).
    */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
              nBits: Int = 8): DataFrame = {
    val emb = embeddings(spark, dir)
    val dim = 64
    val planes = hyperplanes(nBits, dim)
    // bucket = sum over bits of (proj_j > 0) << j, built from literal plane
    // coefficients so the expression is pure codegen (no UDF, no broadcast).
    val projections = planes.zipWithIndex.map { case (p, j) =>
      val terms = p.zipWithIndex.map { case (c, d) => s"v[$d] * $c" }.mkString(" + ")
      s"(CASE WHEN ($terms) > 0D THEN shiftleft(1L, $j) ELSE 0L END)"
    }
    val bucketExpr = projections.mkString(" + ")
    val bucketed = emb.withColumn("bucket", expr(bucketExpr))
    val queries = bucketed.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("q_bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    bucketed
      .join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(dotExpr.format("v", "qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** §2.3 #34 — vector-column numerics: per-label count and exact-average L2
    * norm (norms summed in decimal so the group aggregate is order-free).
    */
  def embedStats(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        (sum(col("nrm").cast(org.apache.spark.sql.types.DecimalType(18, 9)))
          .cast("double") / count(lit(1))).as("avg_norm"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"))
      .orderBy("label")
}
