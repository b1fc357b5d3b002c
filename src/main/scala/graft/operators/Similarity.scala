package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Sequential left-fold dot product as a native codegen kernel — same
    * association order as `aggregate(zip_with(a, b, *), 0.0, +)` and the
    * DuckDB oracle's list fold, so scores stay bit-identical cross-engine.
    */
  private def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue._
    exprColumn(graft.functions.DotProduct(columnExpr(a), columnExpr(b)))
  }

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** §2.3 #26 — brute-force cosine top-k for query vectors vec_id < nQueries.
    * The query set is broadcast; the corpus is scanned once, fully parallel.
    */
  def bruteTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val emb = embeddings(spark, dir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** Deterministic random hyperplanes (seeded): nBits x dim gaussians. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** §2.3 #27 — LSH-bucketed approximate top-k, multi-table: `nTables`
    * independent hyperplane tables of `nBits` sign bits each. A vector lands
    * in one bucket per table; candidates are rows sharing (table, bucket)
    * with a query — a plain equi-join on a composite key, never a cross join.
    * Multi-probe via table count: recall ~ 1-(1-p^nBits)^nTables where p is
    * the per-plane agreement probability, so nTables trades linear work for
    * recall while each table stays selective. The ScalaTest suite measures
    * recall vs the brute-force baseline; the driver records rows-only.
    */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
              nBits: Int = 6, nTables: Int = 8): DataFrame = {
    val emb = embeddings(spark, dir)
    val dim = 64
    // One struct(tbl, bucket) per table: each sign bit is a native dot-product
    // kernel against an array literal — small plan, codegen'd projections.
    val bucketCols = (0 until nTables).map { t =>
      val planes = hyperplanes(nBits, dim, seed = 7L + t)
      val bits = (0 until nBits).map { j =>
        when(dot(col("v"), typedlit(planes(j).toSeq)) > 0d, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bits.as("b"))
    }
    val bucketed = emb.withColumn("bk", explode(array(bucketCols: _*)))
    val queries = bucketed.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bk").as("q_bk"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    bucketed
      .join(broadcast(queries),
        col("bk") === col("q_bk") && col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id", "v", "nrm", "qv", "qn")
      .dropDuplicates("q_id", "vec_id") // a pair may collide in several tables; score it once
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
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
