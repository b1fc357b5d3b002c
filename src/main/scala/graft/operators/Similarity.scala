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

  /** Engine-stable 6-dp presentation rounding: floor(x·1e6 + 0.5)/1e6 —
    * round(DOUBLE, 6)'s tie handling drifted across DuckDB versions (the
    * r7 q_cov_matrix red row), so every oracle-checked surface value uses
    * this deterministic form on BOTH engines (r11 allowlist burn-down).
    */
  private def fl6(c: Column): Column = Fl6(c)

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        // Array-level Cast, not `transform(x -> cast(x AS double))`: the
        // higher-order lambda runs interpreted OUTSIDE whole-stage codegen
        // on every row of every similarity scan (the same trap bootstrapCi
        // measured 6× on), while Cast(array<float> → array<double>) is a
        // codegen'd element-wise widening with bit-identical values.
        col("embedding").cast("array<double>").as("v"))
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
      .select(col("q_id"), col("rank"), col("vec_id"), fl6(col("cos")).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** §2.3 #371 — brute-force MAXIMUM INNER PRODUCT (MIPS) top-k for query
    * vectors vec_id < nQueries: ranked by the RAW dot product, no norm
    * division. The retrieval objective recommendation and reward models
    * actually use — cosine (#26) normalizes magnitude away, but a
    * learned-embedding store often encodes item popularity/confidence IN
    * the norm, so MIPS and cosine return genuinely different top-k sets
    * (a high-norm vector can win at a worse angle). Same scale shape as
    * #26: queries broadcast, corpus scanned once, per-query top-k via a
    * bounded window over nQueries partitions. Scores are the shared
    * sequential-fold dot (bit-identical to the oracle's list_reduce).
    */
  def annMips(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 10): DataFrame = {
    val emb = embeddings(spark, dir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("ip").desc, col("vec_id").asc)
    emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("ip", dot(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        (floor(col("ip") * lit(1e6) + lit(0.5)) / lit(1e6)).as("ip"))
      .orderBy("q_id", "rank")
  }

  /** Deterministic random hyperplanes (seeded): nBits x dim gaussians. The
    * draw is sequential, so the first b planes are identical for every
    * nBits >= b — bucket bit j never depends on how many bits are in use,
    * which is what lets the oracle gate embedded planes by a runtime bit
    * count.
    */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Bucket-bit count scaled to corpus size: ceil(log2 N) - 2, i.e. expected
    * bucket occupancy ~4 per table regardless of N. With that, per-query
    * candidates are ~4·nTables = O(1) in corpus size — the property that
    * makes the equi-join ANN path survive a 100× scale-up (a fixed bit count
    * would make candidates Θ(N)). Recall is then bought with `nTables`, whose
    * cost (nTables·nBits hyperplane dots per vector) is trivial next to one
    * brute-force pass.
    */
  private[graft] def autoBits(n: Long, maxBits: Int): Int = {
    val ceilLog2 = if (n <= 1) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.max(6, math.min(maxBits, ceilLog2 - 2))
  }

  /** §2.3 #27 — LSH-bucketed approximate top-k, multi-table: `nTables`
    * independent hyperplane tables of `nBits` sign bits each (nBits <= 0 =
    * auto-scale from the corpus count via [[autoBits]]). A vector lands in
    * one bucket per table; candidates are rows sharing (table, bucket) with a
    * query — a plain equi-join on a composite key, never a cross join.
    * Recall ~ 1-(1-p^nBits)^nTables where p is the per-plane agreement
    * probability, so nTables trades linear work for recall while each table
    * stays selective. The ScalaTest suite asserts recall vs the brute-force
    * baseline AND that the candidate set stays far below N·Q.
    */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
              nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24,
              probes: Int = 0): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    candidatePairs(spark, dir, nQueries, nBits, nTables, maxBits, probes)
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), fl6(col("cos")).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** Resolve the effective bit count for one call site (auto unless pinned). */
  private def resolveBits(spark: SparkSession, dir: String, nBits: Int, maxBits: Int): Int =
    if (nBits > 0) nBits
    else autoBits(Tables.load(spark, dir, "embeddings").count(), maxBits)

  /** Each vector exploded to its (table, bucket) assignments, one per table;
    * each sign bit is a native dot-product kernel against an array literal —
    * small plan, codegen'd projections. The (table, bucket) pair is packed
    * injectively into ONE long (table<<32 | bucket, bucket < 2^maxBits <=
    * 2^24) so the candidate equi-join shuffles and compares an 8-byte key
    * instead of a struct — same semantics, leaner exchange.
    */
  private def bucketedVectors(spark: SparkSession, dir: String, bits: Int,
                              nTables: Int): DataFrame = {
    import org.apache.spark.sql.graftglue._
    val dim = 64
    // ONE fused kernel for all nTables x bits sign tests (bit-identical to
    // the per-plane expression tree: same left-to-right dot fold, same
    // `> 0` sign test, same packed key). The expression-tree form carried
    // nTables*bits*dim literal doubles (12k at 16x12x64) through analysis,
    // optimization, and the task binary of every LSH stage — the r14 bench
    // measured 1.2 MB task-binary broadcasts per stage from exactly this.
    val planes: Array[Array[Double]] = (0 until nTables).flatMap { t =>
      hyperplanes(bits, dim, seed = 7L + t)
    }.toArray
    embeddings(spark, dir).withColumn("bk", explode(exprColumn(
      graft.functions.LshBuckets(columnExpr(col("v")), planes, nTables, bits))))
  }

  /** Distinct (query, candidate) pairs from LSH bucket collisions — the
    * pre-scoring candidate set. Exposed so SimilaritySpec can assert the
    * scale contract |candidates| << N·Q directly.
    *
    * `probes` > 0 enables multi-probe (Lv et al., "Multi-Probe LSH",
    * VLDB 2007): each QUERY additionally probes every bucket at Hamming
    * distance 1 from its own signature (1 + nBits keys per table instead of
    * 1), which multiplies near-neighbor collision probability by roughly
    * (1 + nBits·(1-p)/p) per table — recall comparable to nBits× more
    * tables with ZERO extra index cost (the corpus side is untouched; only
    * the tiny broadcast query set expands).
    */
  private[graft] def candidatePairs(spark: SparkSession, dir: String, nQueries: Int,
                                    nBits: Int, nTables: Int, maxBits: Int,
                                    probes: Int = 0): DataFrame = {
    val bits = resolveBits(spark, dir, nBits, maxBits)
    val bucketed = bucketedVectors(spark, dir, bits, nTables)
    val baseQueries = bucketed.where(col("vec_id") < nQueries)
    val queries =
      if (probes <= 0)
        baseQueries.select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("bk").as("q_bk"))
      else {
        // Packed keys: bucket bits live below bit 32, so XOR-flipping bit j
        // probes the Hamming-1 bucket within the SAME table.
        val flips = col("bk") +: (0 until bits).map { j =>
          col("bk").bitwiseXOR(lit(1L << j))
        }
        baseQueries.select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), explode(array(flips: _*)).as("q_bk"))
      }
    bucketed
      .join(broadcast(queries),
        col("bk") === col("q_bk") && col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id", "v", "nrm", "qv", "qn")
      .dropDuplicates("q_id", "vec_id") // a pair may collide in several tables; score it once
  }

  /** Shared oracle CTEs: normalized vectors (`n`), the SQL-computed bit
    * count (`p`), and per-table bucket assignment (`bk`) with every
    * hyperplane coefficient embedded as a double literal (shortest-repr
    * round-trips exactly). Every dot product is the same left-to-right fold
    * as the Spark kernel, so bucket assignments and cosine scores reproduce
    * bit-for-bit — which is what lets approximate operators have EXACT
    * oracles.
    *
    * The auto-scaled bit count is computed IN SQL from the corpus count
    * (`length(bin(count-1)) - 2` = ceil(log2 N) - 2, exactly [[autoBits]]'s
    * integer arithmetic — no floating log whose last-ulp could differ across
    * engines), and each embedded plane's bit is gated by `j < nbits`, so one
    * static oracle string stays exact at EVERY scale factor up to
    * 2^(maxBits+2) vectors.
    */
  private def bucketCtes(nTables: Int, maxBits: Int): String = {
    def dotLit(plane: Array[Double]): String = {
      val prods = plane.zipWithIndex.map { case (c, i) => s"v[${i + 1}] * $c" }.mkString(", ")
      s"list_reduce(list_prepend(0.0::DOUBLE, [$prods]), (x, y) -> x + y)"
    }
    val selfDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [v[i] * v[i] FOR i IN generate_series(1, len(v))]), (x, y) -> x + y)"
    val tables = (0 until nTables).map { t =>
      val planes = hyperplanes(maxBits, 64, seed = 7L + t)
      val bits = (0 until maxBits).map { j =>
        s"CASE WHEN $j < p.nbits AND ${dotLit(planes(j))} > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, ($bits) AS b FROM n, p"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT GREATEST(6, LEAST($maxBits, length(bin(count(*) - 1)) - 2)) AS nbits FROM e),
       |n AS (SELECT vec_id, v, sqrt($selfDot) AS nrm FROM e),
       |bk AS (
       |$tables
       |)""".stripMargin
  }

  /** DuckDB oracle SQL for [[lshTopK]]. */
  def lshOracleSql(nQueries: Int = 10, k: Int = 10, nTables: Int = 16,
                   maxBits: Int = 12): String = {
    val crossDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [cv.v[i] * qv.v[i] FOR i IN generate_series(1, len(cv.v))]), (x, y) -> x + y)"
    s"""${bucketCtes(nTables, maxBits)},
       |q AS (SELECT vec_id AS q_id, tbl, b FROM bk WHERE vec_id < $nQueries),
       |cand AS (
       |  SELECT DISTINCT q.q_id, c.vec_id
       |  FROM q JOIN bk c ON q.tbl = c.tbl AND q.b = c.b AND c.vec_id <> q.q_id
       |),
       |s AS (
       |  SELECT cand.q_id, cand.vec_id, $crossDot / (cv.nrm * qv.nrm) AS cos
       |  FROM cand
       |  JOIN n cv ON cv.vec_id = cand.vec_id
       |  JOIN n qv ON qv.vec_id = cand.q_id
       |),
       |r AS (SELECT q_id, vec_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank FROM s)
       |SELECT q_id, rank, vec_id, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** §2.3 #38 — IVF-Flat ANN: a deterministic coarse quantizer (centroids =
    * the first nCentroids vectors by vec_id — a seeded sample, the
    * cross-engine-reproducible stand-in for trained k-means centroids)
    * partitions the corpus into inverted lists by nearest-centroid cosine;
    * each query probes only the `nProbe` nearest lists and brute-forces
    * those. With nCentroids auto-scaled to ~sqrt(N) (2^ceil(ceil(log2 N)/2))
    * and nProbe fixed, per-query candidate work is ~nProbe·N/K = O(sqrt N) —
    * sublinear, and unlike hyperplane LSH the pruning adapts to the data's
    * own cluster structure. At 100 TB the inverted lists are just a
    * partition column: `repartition(cid)` + partitioned parquet turns the
    * probe into genuine partition pruning at the scan.
    *
    * All arithmetic is fold-dot-products of DATA vectors (no random
    * constants), so the oracle needs no embedded literals at all; ties in
    * the argmax assignment and probe ranking break on centroid id, making
    * the approximate result value-exact cross-engine.
    */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
              nCentroids: Int = 0, nProbe: Int = 4,
              litMaxCentroids: Int = LitMaxCentroids): DataFrame = {
    val (assigned, probes) =
      ivfCore(spark, dir, nCentroids, nQueries, nProbe, litMaxCentroids)
    ivfScore(assigned, probes, k)
  }

  /** Above this centroid count the assignment switches from plan-literal
    * centroids to a broadcast centroid RELATION: at kCent ≈ √N with N = 1B
    * vectors, ~32k literal 64-dim array expressions in one projection blow
    * past JVM method-size limits (whole-stage codegen falls back to
    * interpreted) and make the plan itself tens of MB. The broadcast +
    * max(struct) argmax (the [[kmeans]] pattern) is the scale-safe form;
    * the literal path stays for small k where it wins locally.
    */
  val LitMaxCentroids = 256

  /** (assigned corpus with `cid`, probe set with per-query `cid`s) — the
    * shared core of the inline and index-materialized IVF variants.
    */
  private def ivfCore(spark: SparkSession, dir: String, nCentroids: Int,
                      nQueries: Int, nProbe: Int,
                      litMaxCentroids: Int = LitMaxCentroids): (DataFrame, DataFrame) = {
    val emb = embeddings(spark, dir)
    val kCent =
      if (nCentroids > 0) nCentroids
      else {
        val n = Tables.load(spark, dir, "embeddings").count()
        val bitsN = if (n <= 1) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
        1 << ((bitsN + 1) / 2)
      }
    val np = math.min(nProbe, kCent)
    // NOT spread (r15 A/B: all three IVF consumers flat-to-worse with a
    // pre-exchange — q_ann_ivf_indexed 2.65 → 3.52 s): the literal-path
    // assignment pipelines into the scan and the exchange of (v, nrm)
    // payloads costs more than the single-split serialization it fixes
    // at this corpus size.
    val embS = emb
    if (kCent <= litMaxCentroids) {
      // Centroid vectors ride into the plan as literals (a few KB); their norms
      // use the same sequential left fold as the kernel so quotients match the
      // oracle bit-for-bit.
      val cents: Seq[(Long, Array[Double])] = emb.where(col("vec_id") < kCent)
        .select("vec_id", "v").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq
      def foldNorm(a: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * a(i); i += 1 }
        math.sqrt(s)
      }
      val cosArr = array(cents.map { case (_, cv) =>
        dot(col("v"), typedlit(cv.toSeq)) / (col("nrm") * lit(foldNorm(cv)))
      }: _*)
      val assigned = embS
        .withColumn("cid", array_position(cosArr, array_max(cosArr)) - 1)
      val probes = emb.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
          posexplode(cosArr).as(Seq("cid", "cc")))
        .withColumn("prank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cc").desc, col("cid").asc)))
        .where(col("prank") <= np)
        .select(col("q_id"), col("qv"), col("qn"), col("cid").cast("long").as("cid"))
      (assigned, probes)
    } else {
      // Large-k path: centroids as a broadcast RELATION, assignment via the
      // map-side-combinable max(struct) argmax with the SAME (cc DESC, cid
      // ASC) tie-break — value-identical to the literal path (same fold
      // order, same norms), so one oracle serves both.
      val cents = emb.where(col("vec_id") < kCent)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      val assigned = embS.crossJoin(broadcast(cents))
        .withColumn("cc", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
        .groupBy(col("vec_id"), col("v"), col("nrm"))
        .agg(max(struct(col("cc"), (-col("cid")).as("ncid"))).as("best"))
        .select(col("vec_id"), col("v"), col("nrm"), (-col("best.ncid")).as("cid"))
      val probes = emb.where(col("vec_id") < nQueries)
        .crossJoin(broadcast(cents))
        .withColumn("cc", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
        .withColumn("prank", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("cc").desc, col("cid").asc)))
        .where(col("prank") <= np)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
          col("cid").cast("long").as("cid"))
      (assigned, probes)
    }
  }

  /** Score bucket-joined candidates and keep the per-query top-k. */
  private def ivfScore(assigned: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    assigned
      .join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), fl6(col("cos")).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** §2.3 #84 — the IVF index MATERIALIZED as storage layout: the assigned
    * corpus is written hive-partitioned by `cid`, so each inverted list IS a
    * directory. Querying then filters `cid IN (probed lists)`, which
    * resolves as PartitionFilters — the scan plans only nProbe directories
    * per query set and never opens the rest. This is what "probe O(sqrt N)
    * of the corpus" means at 100 TB: the pruning happens in the FILE LISTING,
    * before a single byte of the unprobed lists is read. Results are
    * identical to [[ivfTopK]] (same centroids, same tie-breaks — one oracle
    * serves both).
    */
  def ivfTopKIndexed(spark: SparkSession, dir: String, indexDir: String,
                     nQueries: Int = 10, k: Int = 10, nCentroids: Int = 0,
                     nProbe: Int = 4,
                     litMaxCentroids: Int = LitMaxCentroids): DataFrame = {
    val (assigned, probes) =
      ivfCore(spark, dir, nCentroids, nQueries, nProbe, litMaxCentroids)
    assigned.write.mode("overwrite").partitionBy("cid").parquet(indexDir)
    val probeCids = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).sorted
    val index = spark.read.parquet(indexDir)
      .where(col("cid").isin(probeCids: _*))
    ivfScore(index, probes, k)
  }

  /** DuckDB oracle SQL for [[ivfTopK]]: centroids, assignments, and probe
    * rankings are all derived relationally from the data with the same
    * sequential folds — a literal-free oracle for an approximate index.
    */
  def ivfOracleSql(nQueries: Int = 10, k: Int = 10, nProbe: Int = 4): String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a.v[i] * $b.v[i] FOR i IN generate_series(1, len($a.v))]), (x, y) -> x + y)"
    val selfDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [v[i] * v[i] FOR i IN generate_series(1, len(v))]), (x, y) -> x + y)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |prm AS (SELECT 1 << ((length(bin(count(*) - 1)) + 1) // 2) AS kc FROM e),
       |n AS (SELECT vec_id, v, sqrt($selfDot) AS nrm FROM e),
       |c AS (SELECT vec_id AS cid, v, nrm FROM n, prm WHERE vec_id < prm.kc),
       |ac AS (
       |  SELECT n.vec_id, c.cid, ${fold("n", "c")} / (n.nrm * c.nrm) AS cc
       |  FROM n, c
       |),
       |a AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
       |    FROM ac) t
       |  WHERE rn = 1
       |),
       |p AS (
       |  SELECT vec_id AS q_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
       |    FROM ac WHERE vec_id < $nQueries) t
       |  WHERE rn <= $nProbe
       |),
       |cand AS (
       |  SELECT p.q_id, a.vec_id FROM p JOIN a ON a.cid = p.cid AND a.vec_id <> p.q_id
       |),
       |s AS (
       |  SELECT cand.q_id, cand.vec_id, ${fold("cv", "qv")} / (cv.nrm * qv.nrm) AS cos
       |  FROM cand
       |  JOIN n cv ON cv.vec_id = cand.vec_id
       |  JOIN n qv ON qv.vec_id = cand.q_id
       |),
       |r AS (SELECT q_id, vec_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank FROM s)
       |SELECT q_id, rank, vec_id, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** §2.3 #37 — embedding-cosine near-duplicate pairs: all (a, b) sharing an
    * LSH bucket with cosine >= `threshold`. The semantic-dedup analogue of
    * MinHash near-dup: where Jaccard catches lexical copies, embedding cosine
    * catches paraphrases. Candidates come from a bucket SELF-join (equi-join
    * on (table, bucket)) — with auto-scaled bits the expected bucket
    * occupancy is constant, so candidate pairs are
    * ~nTables · N · occupancy / 2 = O(N), never the N²/2 of all-pairs.
    * Approximate recall (a pair must agree on all bits of >= 1 table), but
    * the randomness is seeded and plane-exact in the oracle, so the result
    * is still value-exact cross-engine.
    */
  def nearDupEmbedding(spark: SparkSession, dir: String, threshold: Double = 0.4,
                       nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24): DataFrame =
    nearDupEmbeddingCore(spark, dir, threshold, nBits, nTables, maxBits)
      .orderBy("vec_a", "vec_b")

  /** [[nearDupEmbedding]] without the final presentation `orderBy`:
    * [[semanticClustersCore]] (and through it cluster purity) consumes
    * only the pair CONNECTIVITY and checkpoints immediately, so the global
    * range-partition + sort of the pair frame — plus the RangePartitioner
    * sampling pass over the whole LSH pipeline — executed as pure wasted
    * work inside every consumer lineage (guide §2.4; the knnGraphCore /
    * dedupClustersCore split, applied to the third pipeline that still
    * paid it).
    */
  private[operators] def nearDupEmbeddingCore(spark: SparkSession,
      dir: String, threshold: Double = 0.4, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    // The self-join ships (vec_id, bucket) ONLY — 16 bytes per exploded row
    // instead of the 64-dim vector riding every one of its nTables copies
    // through the exchange. Vectors re-attach to the (much smaller) distinct
    // candidate-pair set afterwards.
    val bucketed = bucketedVectors(spark, dir,
      resolveBits(spark, dir, nBits, maxBits), nTables)
      .select("vec_id", "bk")
    val cand = bucketed.as("x")
      .join(bucketed.as("y"),
        col("x.bk") === col("y.bk") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct() // a pair may collide in several tables
    val base = embeddings(spark, dir).select(col("vec_id"), col("v"), col("nrm"))
    cand
      .join(base.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na")), "vec_a")
      .join(base.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb")), "vec_b")
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), fl6(col("cos")).as("cos"))
  }

  /** DuckDB oracle SQL for [[nearDupEmbedding]] (same embedded planes and
    * SQL-computed bit count as the ANN oracle).
    */
  def embeddingNearDupOracleSql(threshold: Double = 0.4, nTables: Int = 16,
                                maxBits: Int = 12): String = {
    val crossDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [na.v[i] * nb.v[i] FOR i IN generate_series(1, len(na.v))]), (x, y) -> x + y)"
    s"""${bucketCtes(nTables, maxBits)},
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.b = b.b AND a.vec_id < b.vec_id
       |),
       |s AS (
       |  SELECT cand.va AS vec_a, cand.vb AS vec_b, $crossDot / (na.nrm * nb.nrm) AS cos
       |  FROM cand
       |  JOIN n na ON na.vec_id = cand.va
       |  JOIN n nb ON nb.vec_id = cand.vb
       |)
       |SELECT vec_a, vec_b, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM s WHERE cos >= $threshold ORDER BY vec_a, vec_b""".stripMargin
  }

  /** §2.3 #112 — approximate kNN GRAPH: every vector's top-`k` neighbors
    * among its LSH-bucket collisions — the all-vectors generalization of
    * [[lshTopK]] (where the query side is a tiny broadcast set, here every
    * vector is a query). The kNN graph is the substrate of graph-based
    * semantic dedup clusters, HNSW-style index construction, and
    * label-propagation — the batch-materialized artifact a training-data
    * pipeline computes once per corpus snapshot.
    *
    * Plan shape at 100 TB: the bucket SELF-join ships (vec_id, packed
    * bucket) pairs only — with auto-scaled bits, candidate edges are
    * ~nTables·occupancy·N = O(N); vectors re-attach to the distinct edge
    * set; the per-vector top-k is one row_number window partitioned by
    * vec_id (shuffle on a key with N distinct values — no hot partition).
    * Never N² anything. Vectors whose buckets collide with nothing simply
    * have no edges (recall is bought with nTables, like all LSH paths here).
    */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 3,
               nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24): DataFrame =
    knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .orderBy("vec_id", "rank")

  /** [[knnGraph]] without the final presentation `orderBy`: all fifteen
    * graph-analytics consumers re-key the edge list immediately (union of
    * both directions, degree aggregates, label joins), so the global
    * range-partition + sort of the O(k*N) edge frame ran as pure wasted
    * work inside every one of their lineages (r14).
    */
  private[operators] def knnGraphCore(spark: SparkSession, dir: String, k: Int = 3,
               nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    val bucketed = bucketedVectors(spark, dir,
      resolveBits(spark, dir, nBits, maxBits), nTables)
      .select("vec_id", "bk")
    val cand = bucketed.as("x")
      .join(bucketed.as("y"),
        col("x.bk") === col("y.bk") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nbr_id"))
      .distinct()
    val base = embeddings(spark, dir).select(col("vec_id"), col("v"), col("nrm"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nbr_id").asc)
    cand
      .join(base.select(col("vec_id"), col("v").as("va"), col("nrm").as("na")), "vec_id")
      .join(base.select(col("vec_id").as("nbr_id"), col("v").as("vb"),
        col("nrm").as("nb")), "nbr_id")
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("nbr_id"), fl6(col("cos")).as("cos"))
  }

  /** DuckDB oracle SQL for [[knnGraph]] (same embedded planes and
    * SQL-computed bit count as the other LSH oracles).
    */
  def knnGraphOracleSql(k: Int = 3, nTables: Int = 16, maxBits: Int = 12): String = {
    val crossDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [na.v[i] * nb.v[i] FOR i IN generate_series(1, len(na.v))]), (x, y) -> x + y)"
    s"""${bucketCtes(nTables, maxBits)},
       |cand AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.b = b.b AND a.vec_id <> b.vec_id
       |),
       |s AS (
       |  SELECT cand.vec_id, cand.nbr_id, $crossDot / (na.nrm * nb.nrm) AS cos
       |  FROM cand
       |  JOIN n na ON na.vec_id = cand.vec_id
       |  JOIN n nb ON nb.vec_id = cand.nbr_id
       |),
       |r AS (SELECT vec_id, nbr_id, cos,
       |  CAST(row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id ASC) AS INTEGER) AS rank FROM s)
       |SELECT vec_id, rank, nbr_id, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM r WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin
  }

  /** §2.3 #130 — PageRank over the approximate kNN graph: `iters` unrolled
    * power-iteration rounds of `r' = (1−d)/N + d·Σ_in r/outdeg` on the
    * [[knnGraph]] edge set — the centrality signal a curation pipeline uses
    * to pick corpus-"central" representatives from duplicate clusters and
    * to weight in-domain documents (dangling mass is not redistributed;
    * both engines state the same recurrence).
    *
    * Scale shape: each round is edges ⋈ ranks on `src` (partial-aggregated
    * shuffle on `dst`, O(E) = O(k·N) work) — the edge list and degree table
    * are localCheckpointed once so the LSH self-join never re-runs per
    * round. Exactness: each round's incoming sums run in DECIMAL(38,18)
    * (order-free), the damping arithmetic is written as the same double
    * expression on both engines ((1.0 − 0.85)/N, never a pre-folded
    * constant), so after 3 rounds ranks are still bit-identical
    * cross-engine — an exact oracle for an iterative graph algorithm.
    */
  def pageRank(spark: SparkSession, dir: String, k: Int = 3, iters: Int = 3,
      damping: Double = 0.85, nBits: Int = 0, nTables: Int = 16,
      maxBits: Int = 24): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val edges = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      .localCheckpoint(true)
    val nodes = Tables.load(spark, dir, "embeddings").select("vec_id")
    val n = nodes.count()
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("odeg"))
      .localCheckpoint(true)
    var ranks = nodes.select(col("vec_id"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iters) {
      val inSum = edges
        .join(ranks.withColumnRenamed("vec_id", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst"),
          (col("r") / col("odeg")).cast(DecimalType(38, 18)).as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      ranks = nodes
        .join(inSum.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            coalesce(col("in_sum").cast("double"), lit(0.0))).as("r"))
    }
    ranks.select(col("vec_id"), (floor(col("r") * lit(1e9) + lit(0.5)) / lit(1e9)).as("pagerank"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[pageRank]]: the kNN-graph CTEs (plane-exact) feed
    * `iters` unrolled rank CTEs with the identical decimal-summed
    * recurrence and un-folded damping arithmetic.
    */
  def pageRankOracleSql(k: Int = 3, iters: Int = 3, nTables: Int = 16,
      maxBits: Int = 12): String = {
    val crossDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [na.v[i] * nb.v[i] FOR i IN generate_series(1, len(na.v))]), (x, y) -> x + y)"
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT nd.vec_id,
         |    (1.0 - 0.85) / cnt.n + 0.85 * coalesce(s$i.in_sum, 0.0) AS r
         |  FROM nd CROSS JOIN cnt
         |  LEFT JOIN (
         |    SELECT eg.dst AS vec_id,
         |      CAST(CAST(sum(CAST(p.r / deg.odeg AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS in_sum
         |    FROM eg JOIN $prev p ON p.vec_id = eg.src JOIN deg ON deg.src = eg.src
         |    GROUP BY eg.dst
         |  ) s$i ON s$i.vec_id = nd.vec_id
         |)""".stripMargin
    }.mkString(",\n")
    s"""${bucketCtes(nTables, maxBits)},
       |cand AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.b = b.b AND a.vec_id <> b.vec_id
       |),
       |sc AS (
       |  SELECT cand.vec_id, cand.nbr_id, $crossDot / (na.nrm * nb.nrm) AS cos
       |  FROM cand
       |  JOIN n na ON na.vec_id = cand.vec_id
       |  JOIN n nb ON nb.vec_id = cand.nbr_id
       |),
       |eg AS (
       |  SELECT vec_id AS src, nbr_id AS dst FROM (
       |    SELECT vec_id, nbr_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id ASC) AS rank
       |    FROM sc) t
       |  WHERE rank <= $k
       |),
       |nd AS (SELECT vec_id FROM e),
       |cnt AS (SELECT count(*) AS n FROM e),
       |deg AS (SELECT src, count(*) AS odeg FROM eg GROUP BY 1),
       |r0 AS (SELECT nd.vec_id, 1.0 / cnt.n AS r FROM nd CROSS JOIN cnt),
       |$rounds
       |SELECT vec_id, floor(r * 1e9 + 0.5) / 1e9 AS pagerank
       |FROM r$iters ORDER BY vec_id""".stripMargin
  }

  /** §2.3 #118 — SEMANTIC duplicate clusters: connected components over the
    * embedding near-dup pair graph, every vector labeled with its
    * component's min vec_id. Where [[Dedup.dedupClusters]] clusters lexical
    * copies (MinHash/Jaccard edges), this clusters PARAPHRASES — the
    * "keep one per meaning" reduction of semantic dedup (SemDeDup-style).
    * Same engine underneath: [[Dedup.propagateMinLabels]] min-label
    * propagation with pointer jumping, O(log diameter) rounds over O(N)
    * LSH-candidate edges. The oracle re-derives the identical components
    * with a recursive CTE over the plane-exact candidate pairs.
    */
  def semanticClusters(spark: SparkSession, dir: String, threshold: Double = 0.4,
      nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24,
      maxRounds: Int = 25): DataFrame =
    semanticClustersCore(spark, dir, threshold, nBits, nTables, maxBits,
      maxRounds).orderBy("vec_id")

  /** [[semanticClusters]] without the final presentation `orderBy` (the
    * purity rollup re-shuffles by cluster immediately — r14, same waste as
    * the knnGraphCore split). */
  private[operators] def semanticClustersCore(spark: SparkSession, dir: String,
      threshold: Double = 0.4, nBits: Int = 0, nTables: Int = 16,
      maxBits: Int = 24, maxRounds: Int = 25): DataFrame = {
    // Materialize the near-dup pipeline ONCE; label propagation runs over
    // the vectors that actually have an edge (everything else is a
    // singleton component by definition and rejoins at the end) — the same
    // touched-nodes-only reduction dedupClusters applies to its
    // representatives, so round cost tracks |edges|, not corpus size.
    val pairs = nearDupEmbeddingCore(spark, dir, threshold, nBits, nTables,
      maxBits).select("vec_a", "vec_b").localCheckpoint(true)
    val touched = pairs.select(col("vec_a").as("vec_id"))
      .unionAll(pairs.select(col("vec_b").as("vec_id"))).distinct()
    val labels = Dedup.propagateMinLabels(touched, pairs, maxRounds)
    Tables.load(spark, dir, "embeddings").select("vec_id")
      .join(labels.select(col("id").as("vec_id"), col("cluster_id")),
        Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
      .withColumn("is_canonical", col("vec_id") === col("cluster_id"))
  }

  /** DuckDB oracle SQL for [[semanticClusters]]: the near-dup pair CTEs
    * (plane-exact) feed a recursive min-label closure.
    */
  def semanticClusterOracleSql(threshold: Double = 0.4, nTables: Int = 16,
      maxBits: Int = 12): String = {
    val crossDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [na.v[i] * nb.v[i] FOR i IN generate_series(1, len(na.v))]), (x, y) -> x + y)"
    s"""${bucketCtes(nTables, maxBits).replaceFirst("WITH ", "WITH RECURSIVE ")},
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.b = b.b AND a.vec_id < b.vec_id
       |),
       |prs AS (
       |  SELECT cand.va AS a, cand.vb AS b
       |  FROM cand
       |  JOIN n na ON na.vec_id = cand.va
       |  JOIN n nb ON nb.vec_id = cand.vb
       |  WHERE $crossDot / (na.nrm * nb.nrm) >= $threshold
       |),
       |e2 AS (SELECT a, b FROM prs UNION ALL SELECT b, a FROM prs),
       |reach(vec_id, r) AS (
       |  SELECT vec_id, vec_id FROM e
       |  UNION
       |  SELECT e2.b, reach.r FROM e2 JOIN reach ON reach.vec_id = e2.a
       |)
       |SELECT vec_id, min(r) AS cluster_id, (vec_id = min(r)) AS is_canonical
       |FROM reach GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** §2.3 #310 — CONNECTED-COMPONENT census of the approximate kNN graph:
    * component sizes and how many components have each size — the manifold
    * CONNECTIVITY summary (one giant component = one connected data
    * manifold; many medium islands = distinct modes or a too-coarse index;
    * a fat singleton bar = vectors whose buckets collide with nothing,
    * i.e. recall loss). [[semanticClusters]] answers "which vectors are
    * near-DUPLICATES" over the thresholded pair graph; this answers "does
    * the SPACE hang together" over the unthresholded top-k graph #112.
    * Same engine: [[Dedup.propagateMinLabels]] min-label propagation with
    * pointer jumping (O(log diameter) rounds over the O(k·N) edge list);
    * vectors with no edges are singleton components by definition and
    * rejoin at the end; the double rollup to (size, count) is bounded by
    * the component-size support. The oracle re-derives the identical
    * components with a recursive CTE over the plane-exact edges.
    */
  def knnComponents(spark: SparkSession, dir: String, k: Int = 3,
      nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24,
      maxRounds: Int = 25): DataFrame = {
    val pairs = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(col("vec_id").as("a"), col("nbr_id").as("b"))
      .localCheckpoint(true)
    val touched = pairs.select(col("a").as("vec_id"))
      .unionAll(pairs.select(col("b").as("vec_id"))).distinct()
    val labels = Dedup.propagateMinLabels(touched, pairs, maxRounds)
    Tables.load(spark, dir, "embeddings").select("vec_id")
      .join(labels.select(col("id").as("vec_id"), col("cluster_id")),
        Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
      .groupBy("cluster_id").agg(count(lit(1)).as("comp_size"))
      .groupBy("comp_size").agg(count(lit(1)).as("n_components"))
      .orderBy("comp_size")
  }

  /** DuckDB oracle for [[knnComponents]]: the kNN-graph oracle feeds a
    * recursive min-label closure and the identical size rollup.
    */
  def knnComponentsOracleSql(k: Int = 3, nTables: Int = 16,
      maxBits: Int = 12): String =
    s"""WITH RECURSIVE g AS (
       |${knnGraphOracleSql(k, nTables, maxBits)}
       |),
       |e2 AS (SELECT vec_id AS a, nbr_id AS b FROM g
       |       UNION SELECT nbr_id, vec_id FROM g),
       |allv AS (SELECT vec_id FROM embeddings),
       |reach(vec_id, r) AS (
       |  SELECT vec_id, vec_id FROM allv
       |  UNION
       |  SELECT e2.b, reach.r FROM e2 JOIN reach ON reach.vec_id = e2.a
       |),
       |lab AS (SELECT vec_id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |sz AS (SELECT cluster_id, count(*)::BIGINT AS comp_size
       |       FROM lab GROUP BY 1)
       |SELECT comp_size, count(*)::BIGINT AS n_components
       |FROM sz GROUP BY 1 ORDER BY comp_size""".stripMargin

  /** §2.3 #313 — BFS REACHABILITY curve over the approximate kNN graph:
    * from each of the first `seeds` vectors, how many vectors are within
    * 1..`rounds` hops — the navigability profile of the index graph (HNSW
    * intuition: a query greedy-walks hop by hop, so small-hop reach growth
    * IS searchability; a flat curve from some seed = a trapped region the
    * #310 component census only shows in aggregate). Unrolled frontier
    * expansion: each round is one edge join + distinct on (seed, vec) —
    * O(seeds·N) state, O(rounds) shuffles, localCheckpoint between rounds
    * so round R never re-runs 1..R−1; integer-exact counts (no floats
    * anywhere). The oracle re-derives min-hop distances with a
    * depth-bounded recursive CTE.
    */
  def bfsReach(spark: SparkSession, dir: String, k: Int = 3, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24, seeds: Int = 3,
      rounds: Int = 4): DataFrame = {
    val g = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(col("vec_id").as("a"), col("nbr_id").as("b"))
    val edges = g.unionAll(g.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    var reached = Tables.load(spark, dir, "embeddings")
      .select("vec_id").where(col("vec_id") < seeds)
      .select(col("vec_id").as("seed"), col("vec_id"))
      .localCheckpoint(true)
    val perRound = (1 to rounds).map { r =>
      reached = reached.as("r")
        .join(edges.as("e"), col("r.vec_id") === col("e.a"))
        .select(col("r.seed"), col("e.b").as("vec_id"))
        .unionAll(reached)
        .distinct().localCheckpoint(true)
      reached.groupBy("seed").agg(count(lit(1)).as("n_reached"))
        .withColumn("round", lit(r.toLong))
    }
    perRound.reduce(_ unionAll _)
      .select(col("seed"), col("round"), col("n_reached"))
      .orderBy("seed", "round")
  }

  /** §2.3 #343 — K-CORE PEELING census of the approximate kNN graph:
    * iteratively remove nodes of undirected degree < `kk` for a FIXED
    * `rounds` passes, reporting surviving nodes/edges after each — the
    * dense-backbone profile of the index graph (components #310 say what's
    * CONNECTED; the k-core says what's densely ENOUGH connected to anchor
    * navigation — hub-and-spoke regions evaporate, cliques persist; a
    * core that empties by round 2 means the graph is all periphery).
    * Fixed-round peeling (not run-to-fixpoint) keeps the computation
    * deterministic and its cost a known O(rounds) edge joins; each round
    * is one degree aggregate + two semi-joins, `localCheckpoint` between
    * rounds so round R never re-runs 1..R−1. Output is a `rounds`-row
    * summary — structurally non-empty at any SF.
    */
  def kCore(spark: SparkSession, dir: String, k: Int = 3, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24, kk: Int = 4,
      rounds: Int = 4): DataFrame = {
    val g = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(col("vec_id").as("a"), col("nbr_id").as("b"))
    var edges = g.unionAll(g.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    val perRound = (1 to rounds).map { r =>
      // surv is LAZY (r14): its two consumers below are the same
      // aggregate subtree over the checkpointed edge frame, which
      // ReuseExchange computes once — the old eager localCheckpoint paid
      // one extra job per round for a materialization the plan already
      // deduplicates.
      val surv = edges.groupBy("a").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= kk).select("a")
      edges = edges.join(surv, "a")
        .join(surv.select(col("a").as("b")), "b")
        .select("a", "b").localCheckpoint(true)
      edges.agg(countDistinct("a").as("n_nodes"), count(lit(1)).as("n_edges"))
        .withColumn("round", lit(r.toLong))
    }
    perRound.reduce(_ unionAll _)
      .select(col("round"), col("n_nodes"), col("n_edges"))
      .orderBy("round")
  }

  /** DuckDB oracle for [[kCore]]: the same fixed-round peel unrolled as
    * CTE pairs (degree filter, then both-endpoint edge restriction).
    */
  def kCoreOracleSql(k: Int = 3, nTables: Int = 16, maxBits: Int = 12,
      kk: Int = 4, rounds: Int = 4): String = {
    // Every e_r is referenced three times by round r+1 (degree filter +
    // both endpoint semi-joins); without MATERIALIZED, DuckDB inlines the
    // chain and re-derives the expensive kNN-graph CTE 3^rounds times.
    val steps = (1 to rounds).map { r =>
      s"""s$r AS MATERIALIZED (
         |  SELECT a FROM e${r - 1} GROUP BY a HAVING count(*) >= $kk),
         |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
         |        JOIN s$r sa ON e.a = sa.a JOIN s$r sb ON e.b = sb.a),
         |r$r AS (SELECT CAST($r AS BIGINT) AS round,
         |        count(DISTINCT a)::BIGINT AS n_nodes,
         |        count(*)::BIGINT AS n_edges FROM e$r)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to rounds).map(r => s"SELECT * FROM r$r")
      .mkString("\nUNION ALL ")
    s"""WITH g AS MATERIALIZED (
       |${knnGraphOracleSql(k, nTables, maxBits)}
       |),
       |e0 AS MATERIALIZED (SELECT vec_id AS a, nbr_id AS b FROM g
       |       UNION SELECT nbr_id, vec_id FROM g),
       |$steps
       |$sel
       |ORDER BY round""".stripMargin
  }

  /** §2.3 #353 — MODULARITY of the label partition over the kNN graph:
    * Q = Σ_c (e_cc/E − (d_c/E)²) with E the symmetric directed edge count
    * — does the label taxonomy match the geometry's community structure
    * (the graph-side companion to #212's per-cluster purity and #302's
    * kNN label agreement: purity scores clusters against labels,
    * modularity scores labels AS a clustering — near 0 means the labels
    * cut straight across the similarity structure). Per-label within
    * counts and degree sums are two bounded rollups over the edge list;
    * Q is decimal-summed over the |labels|-row frame and repeated per
    * row (the psi convention).
    */
  def modularity(spark: SparkSession, dir: String, k: Int = 3, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val g = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(col("vec_id").as("a"), col("nbr_id").as("b"))
    val edges = g.unionAll(g.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    val labels = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val lab = edges
      .join(labels.select(col("vec_id").as("a"), col("label").as("la")), "a")
      .join(labels.select(col("vec_id").as("b"), col("label").as("lb")), "b")
    val tot = lab.agg(count(lit(1)).as("ee"))
    val per = lab.groupBy(col("la").as("label"))
      .agg(countDistinct("a").as("n_nodes"), count(lit(1)).as("degree_sum"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("within"))
    val eD = col("ee").cast("double")
    val contrib = col("within").cast("double") / eD -
      (col("degree_sum").cast("double") / eD) *
      (col("degree_sum").cast("double") / eD)
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("contribution", contrib)
      .localCheckpoint(true)
    val q = scored.agg(sum(col("contribution").cast(dec)).as("qd"))
      .select(col("qd").cast("double").as("q"))
    scored.crossJoin(broadcast(q))
      .select(col("label"), col("n_nodes"), col("degree_sum"), col("within"),
        (floor(col("contribution") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("contribution"),
        (floor(col("q") * lit(1e6) + lit(0.5)) / lit(1e6)).as("modularity"))
      .orderBy("label")
  }

  /** DuckDB oracle for [[modularity]]: the same two rollups over the
    * kNN-graph oracle's symmetric edge set.
    */
  def modularityOracleSql(k: Int = 3, nTables: Int = 16,
      maxBits: Int = 12): String =
    s"""WITH g AS MATERIALIZED (
       |${knnGraphOracleSql(k, nTables, maxBits)}
       |),
       |e2 AS (SELECT vec_id AS a, nbr_id AS b FROM g
       |       UNION SELECT nbr_id, vec_id FROM g),
       |lab AS (SELECT e2.a, e2.b, ea.label AS la, eb.label AS lb
       |  FROM e2 JOIN embeddings ea ON ea.vec_id = e2.a
       |  JOIN embeddings eb ON eb.vec_id = e2.b),
       |tot AS (SELECT count(*)::BIGINT AS ee FROM lab),
       |per AS (SELECT la AS label, count(DISTINCT a)::BIGINT AS n_nodes,
       |    count(*)::BIGINT AS degree_sum,
       |    sum(CASE WHEN la = lb THEN 1 ELSE 0 END)::BIGINT AS within
       |  FROM lab GROUP BY 1),
       |scored AS (SELECT label, n_nodes, degree_sum, within,
       |    CAST(within AS DOUBLE) / CAST(ee AS DOUBLE)
       |    - (CAST(degree_sum AS DOUBLE) / CAST(ee AS DOUBLE))
       |      * (CAST(degree_sum AS DOUBLE) / CAST(ee AS DOUBLE)) AS contribution
       |  FROM per CROSS JOIN tot),
       |qq AS (SELECT CAST(CAST(sum(CAST(contribution AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
       |  AS q FROM scored)
       |SELECT label, n_nodes, degree_sum, within,
       |  floor(contribution * 1e6 + 0.5) / 1e6 AS contribution,
       |  floor(q * 1e6 + 0.5) / 1e6 AS modularity
       |FROM scored CROSS JOIN qq ORDER BY label""".stripMargin

  /** DuckDB oracle for [[bfsReach]]: depth-bounded recursive BFS closure
    * over the kNN-graph oracle's edges, min-hop per (seed, vec), counts at
    * each horizon.
    */
  def bfsReachOracleSql(k: Int = 3, nTables: Int = 16, maxBits: Int = 12,
      seeds: Int = 3, rounds: Int = 4): String =
    s"""WITH RECURSIVE g AS (
       |${knnGraphOracleSql(k, nTables, maxBits)}
       |),
       |e2 AS (SELECT vec_id AS a, nbr_id AS b FROM g
       |       UNION SELECT nbr_id, vec_id FROM g),
       |sd AS (SELECT vec_id AS seed FROM embeddings WHERE vec_id < $seeds),
       |reach(seed, vec_id, depth) AS (
       |  SELECT seed, seed, 0 FROM sd
       |  UNION
       |  SELECT r.seed, e2.b, r.depth + 1
       |  FROM reach r JOIN e2 ON r.vec_id = e2.a WHERE r.depth < $rounds
       |),
       |md AS (SELECT seed, vec_id, min(depth) AS d FROM reach GROUP BY 1, 2),
       |rs AS (SELECT unnest(generate_series(1, $rounds)) AS round)
       |SELECT md.seed, CAST(rs.round AS BIGINT) AS round,
       |  count(*)::BIGINT AS n_reached
       |FROM md JOIN rs ON md.d <= rs.round
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** §2.3 #95 — scalar-quantized ANN with exact rescoring (the SQ8 index
    * pattern): every vector compresses to int8 codes under ONE per-vector
    * scale (127 / max|x|); the first pass ranks all pairs by the
    * integer-arithmetic approximate dot product, keeps `rescoreC` candidates
    * per query, and only those are rescored with the exact double cosine.
    *
    * Why this is the 100 TB compression path: the scan side reads 1-byte
    * codes instead of 4-byte floats (4× less IO — the reason SQ indexes
    * exist), the approximate pass is integer math, and the expensive exact
    * cosine runs on rescoreC·Q rows, not N·Q. Code products are integers
    * (≤127² each, summed exactly), so the approximate ranking — and with it
    * the final answer — is bit-reproducible cross-engine; the codes are
    * carried as integer-valued doubles so the same native fold kernel
    * scores both passes.
    */
  def sqTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
      rescoreC: Int = 50): DataFrame = {
    val quant = embeddings(spark, dir)
      .withColumn("mx", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("qscale",
        lit(127.0) / when(col("mx") === 0.0, lit(1.0)).otherwise(col("mx")))
      .withColumn("qc",
        expr("transform(v, x -> cast(cast(floor(x * qscale + 0.5d) as int) as double))"))
    val queries = quant.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"),
        col("qscale").as("q_qscale"), col("qc").as("q_qc"))
    val approxW = Window.partitionBy("q_id").orderBy(col("approx").desc, col("vec_id").asc)
    val exactW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    quant.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("approx",
        dot(col("qc"), col("q_qc")) / (col("qscale") * col("q_qscale")))
      .withColumn("arank", row_number().over(approxW))
      .where(col("arank") <= rescoreC)
      .withColumn("cos", dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm")))
      .withColumn("rank", row_number().over(exactW))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), fl6(col("cos")).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** DuckDB twin of [[sqTopK]]: identical quantization, integer-valued
    * approximate fold, same two-stage rank with the same tie-breaks.
    */
  def sqOracleSql(nQueries: Int = 10, k: Int = 10, rescoreC: Int = 50): String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a[i] * $b[i] FOR i IN generate_series(1, len($a))]), (x, y) -> x + y)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${fold("v", "v")}) AS nrm,
       |  127.0 / (CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
       |           ELSE list_max(list_transform(v, x -> abs(x))) END) AS qscale
       |  FROM e),
       |qz AS (SELECT vec_id, v, nrm, qscale,
       |  list_transform(v, x -> CAST(CAST(floor(x * qscale + 0.5) AS INTEGER) AS DOUBLE)) AS qc
       |  FROM n),
       |pairs AS (
       |  SELECT c.vec_id, q.vec_id AS q_id, c.v AS cv, c.nrm AS cn,
       |    q.v AS qv, q.nrm AS qn,
       |    ${fold("c.qc", "q.qc")} / (c.qscale * q.qscale) AS approx
       |  FROM qz c JOIN qz q ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id),
       |a AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY approx DESC, vec_id ASC) AS arank
       |  FROM pairs),
       |s AS (SELECT q_id, vec_id, ${fold("cv", "qv")} / (cn * qn) AS cos
       |  FROM a WHERE arank <= $rescoreC),
       |r AS (SELECT q_id, vec_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
       |  FROM s)
       |SELECT q_id, rank, vec_id, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** §2.3 #120 — spherical k-means over the embedding corpus: TWO unrolled
    * Lloyd iterations with a deterministic seed (centroids₀ = the first `k`
    * vectors by vec_id, the same cross-engine-reproducible stand-in the IVF
    * quantizer uses). Iteration = assign every vector to its max-cosine
    * centroid, then recompute each centroid as the per-dimension MEAN of its
    * members. This is the clustering step SemDeDup-style semantic dedup and
    * domain-discovery pipelines run over corpus embeddings.
    *
    * Scale shape: assignment is a broadcast of k tiny centroids against one
    * corpus scan (N·k fold-dots, embarrassingly parallel); the centroid
    * update is a (cid, dim) partial aggregation — the shuffle carries
    * k·dim ≤ a few KB of sums per map task, never vectors. The final argmax
    * is a groupBy max(struct), i.e. map-side combinable — no window over N·k
    * rows. Nothing is quadratic and no step funnels the corpus through one
    * partition.
    *
    * Exactness: per-dim means come from DECIMAL(28,12) sums (order-free) cast
    * back to double — one double division both engines perform identically —
    * and every cosine is the same sequential fold as the rest of this file,
    * so assignments, the updated centroids, AND the second-pass assignments
    * are bit-identical in the DuckDB oracle: an exact oracle for an
    * iterative clustering algorithm. Ties argmax on min cid; centroids₀ are
    * their own nearest centroid (cos = 1), so no iteration-1 cluster is
    * empty and the algorithm is total.
    */
  /** §2.3 #365 — K-CENTER CORESET (Gonzalez farthest-point) over the
    * embedding corpus: greedy selection of k maximally-SEPARATED vectors
    * by cosine — the diverse-sampling seed for training-data selection
    * (#27's k-means averages toward density and over-picks the big
    * modes; k-center COVERS the space — every vector ends within the
    * final separation of some center, the classic 2-approximation of
    * optimal coverage). Scale shape: k linear scans, each scoring the
    * corpus against ≤k LITERAL center vectors (no join, no pairwise
    * work) and taking one TakeOrderedAndProject argmin; the driver holds
    * k vectors — the kmeans-seed collect discipline. Determinism: every
    * cosine is the shared left-fold dot kernel and the argmin tie-breaks
    * on vec_id, so both engines pick identical centers at every round.
    * Output: one row per round — the chosen center and its max cosine to
    * the prior centers (monotonically nondecreasing; the LAST row's
    * value is the coverage guarantee).
    */
  def kcenter(spark: SparkSession, dir: String, k: Int = 6): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    def foldNorm(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      math.sqrt(s)
    }
    val seed = emb.orderBy("vec_id").select("vec_id", "v").limit(1).collect()(0)
    var centers = Vector((seed.getLong(0), seed.getSeq[Double](1).toArray))
    val picked = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])](
      (0L, centers.head._1, None))
    for (r <- 1 until k) {
      val cosCols = centers.map { case (_, cv) =>
        dot(col("v"), typedlit(cv.toSeq)) / (col("nrm") * lit(foldNorm(cv)))
      }
      val next = emb.where(!col("vec_id").isin(centers.map(_._1): _*))
        .withColumn("mc", array_max(array(cosCols: _*)))
        .orderBy(col("mc").asc, col("vec_id").asc)
        .select("vec_id", "v", "mc").limit(1).collect()(0)
      centers :+= ((next.getLong(0), next.getSeq[Double](1).toArray))
      picked += ((r.toLong, next.getLong(0), Some(next.getDouble(2))))
    }
    picked.toSeq.toDF("round", "center_id", "mc")
      .select(col("round"), col("center_id"),
        (floor(col("mc") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("max_cos_to_prior"))
      .orderBy("round")
  }

  /** DuckDB oracle for [[kcenter]]: the greedy rounds unrolled as
    * MATERIALIZED CTEs (each min-frame references its predecessor once;
    * materialization keeps the chain linear), same fold-dot cosines,
    * same (mc ASC, vec_id ASC) argmin tie-break.
    */
  def kcenterOracleSql(k: Int = 6): String = {
    def dotv(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a.v[i] * $b.v[i] " +
        s"FOR i IN generate_series(1, len($a.v))]), (x, y) -> x + y)"
    val rounds = (1 until k).map { r =>
      val prev = if (r == 1)
        s"SELECT e.vec_id, e.v, e.nrm, ${dotv("e", "c")} / (e.nrm * c.nrm) AS mc " +
          s"FROM e, c0 c WHERE e.vec_id <> c.vec_id"
      else
        s"SELECT m.vec_id, m.v, m.nrm, greatest(m.mc, ${dotv("m", "c")} / " +
          s"(m.nrm * c.nrm)) AS mc FROM m${r - 1} m, c${r - 1} c " +
          s"WHERE m.vec_id <> c.vec_id"
      s"m$r AS MATERIALIZED ($prev),\n" +
        s"c$r AS MATERIALIZED (SELECT * FROM m$r ORDER BY mc ASC, vec_id ASC LIMIT 1)"
    }.mkString(",\n")
    val rows = (s"SELECT CAST(0 AS BIGINT) AS round, vec_id AS center_id, " +
      s"CAST(NULL AS DOUBLE) AS max_cos_to_prior FROM c0") +:
      (1 until k).map(r => s"SELECT CAST($r AS BIGINT), vec_id, " +
        s"floor(mc * 1e6 + 0.5) / 1e6 FROM c$r")
    s"""WITH e0 AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |e AS MATERIALIZED (SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |      [v[i] * v[i] FOR i IN generate_series(1, len(v))]),
       |      (x, y) -> x + y)) AS nrm
       |  FROM e0),
       |c0 AS MATERIALIZED (SELECT vec_id, v, nrm FROM e ORDER BY vec_id LIMIT 1),
       |$rounds
       |${rows.mkString("\n UNION ALL\n")}
       |ORDER BY round""".stripMargin
  }

  /** §2.3 #368 — MMR (Maximal Marginal Relevance) diversified top-k:
    * retrieve k results for a query vector that are RELEVANT but not
    * redundant — greedy re-ranking by λ·cos(q,d) − (1−λ)·max cos(d,s)
    * over the already-selected s (Carbonell & Goldstein 1998). The
    * retrieval twin of [[kcenter]]: k-center diversifies the CORPUS
    * (no query); MMR diversifies one query's RESULT LIST — what a
    * training-data search or RAG stack dedups near-identical hits with.
    * Scale shape: the only corpus-sized work is the top-`nCand`
    * relevance cut (the #26 distributed TakeOrdered); the greedy loop
    * runs driver-side over that BOUNDED candidate frame (≤ nCand rows —
    * the kmeans-seed collect discipline). Determinism: candidate cut and
    * every greedy pick tie-break on vec_id; all cosines are the shared
    * left-fold dot; scores are fixed-order doubles — the oracle unrolls
    * the same greedy as MATERIALIZED CTE rounds carrying an incremental
    * max-similarity column and agrees bit-for-bit.
    *
    * Redundancy term: maxSim seeds at 0.0 — i.e. the penalty is
    * max(0, max_s cos(d,s)), a CLAMPED variant of Carbonell & Goldstein's
    * max over selected similarities (ADVICE r10). Deliberate: a candidate
    * ANTI-correlated with everything selected is "not redundant", not
    * "extra-rewarded" — a negative cosine must not BOOST the score above
    * λ·rel. The oracle's round-1 CTE seeds maxsim = 0.0 identically, so
    * both engines state the same clamped objective.
    */
  def mmr(spark: SparkSession, dir: String, qId: Long = 0L,
      nCand: Int = 20, k: Int = 5, lambda: Double = 0.7): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val q = emb.where(col("vec_id") === qId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val cands = emb.where(col("vec_id") =!= qId)
      .crossJoin(broadcast(q))
      .withColumn("rel", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(nCand)
      .select("vec_id", "v", "nrm", "rel")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2),
        r.getDouble(3)))
    def foldDot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Double)] // (rank, vec_id, rel, score)
    val chosen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Double], Double)]
    for (r <- 0 until math.min(k, cands.length)) {
      val best = cands
        .filter(c => !chosen.exists(_._1 == c._1))
        .map { case (id, v, nrm, rel) =>
          var maxSim = 0.0
          chosen.foreach { case (_, sv, snrm) =>
            val c = foldDot(v, sv) / (nrm * snrm)
            if (c > maxSim) maxSim = c
          }
          (id, v, nrm, rel, lambda * rel - (1.0 - lambda) * maxSim)
        }
        .minBy { case (id, _, _, _, score) => (-score, id) }
      chosen += ((best._1, best._2, best._3))
      selected += ((r.toLong, best._1, best._4, best._5))
    }
    selected.toSeq.toDF("rank", "vec_id", "rel", "mmr_score")
      .select(col("rank"), col("vec_id"),
        (floor(col("rel") * lit(1e6) + lit(0.5)) / lit(1e6)).as("rel"),
        (floor(col("mmr_score") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("mmr_score"))
      .orderBy("rank")
  }

  /** DuckDB oracle for [[mmr]]: the top-nCand relevance cut, then the
    * greedy rounds unrolled as MATERIALIZED CTEs carrying the incremental
    * max-similarity-to-selected column (the [[kcenterOracleSql]] chain
    * with a relevance term).
    */
  def mmrOracleSql(qId: Long = 0L, nCand: Int = 20, k: Int = 5,
      lambda: Double = 0.7): String = {
    def dotv(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a.v[i] * $b.v[i] " +
        s"FOR i IN generate_series(1, len($a.v))]), (x, y) -> x + y)"
    val lam = lambda
    val oml = 1.0 - lambda
    val sb = new StringBuilder
    sb.append(s"""WITH e0 AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |e AS MATERIALIZED (SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |      [v[i] * v[i] FOR i IN generate_series(1, len(v))]),
       |      (x, y) -> x + y)) AS nrm
       |  FROM e0),
       |q AS MATERIALIZED (SELECT v, nrm FROM e WHERE vec_id = $qId),
       |cand AS MATERIALIZED (
       |  SELECT e.vec_id, e.v, e.nrm,
       |    ${dotv("e", "q")} / (e.nrm * q.nrm) AS rel,
       |    0.0::DOUBLE AS maxsim
       |  FROM e, q WHERE e.vec_id <> $qId
       |  ORDER BY rel DESC, vec_id ASC LIMIT $nCand),
       |s0 AS MATERIALIZED (
       |  SELECT *, $lam * rel - $oml * maxsim AS score FROM cand
       |  ORDER BY score DESC, vec_id ASC LIMIT 1)""".stripMargin)
    for (r <- 1 until k) {
      sb.append(s""",
       |m$r AS MATERIALIZED (
       |  SELECT p.vec_id, p.v, p.nrm, p.rel,
       |    greatest(p.maxsim, ${dotv("p", "s")} / (p.nrm * s.nrm)) AS maxsim
       |  FROM ${if (r == 1) "cand" else s"m${r - 1}"} p, s${r - 1} s
       |  WHERE p.vec_id <> s.vec_id),
       |s$r AS MATERIALIZED (
       |  SELECT *, $lam * rel - $oml * maxsim AS score FROM m$r
       |  ORDER BY score DESC, vec_id ASC LIMIT 1)""".stripMargin)
    }
    val rows = (0 until k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, vec_id, " +
        s"floor(rel * 1e6 + 0.5) / 1e6 AS rel, " +
        s"floor(score * 1e6 + 0.5) / 1e6 AS mmr_score FROM s$r")
    sb.append("\n" + rows.mkString("\n UNION ALL\n") + "\nORDER BY rank")
    sb.toString
  }

  def kmeans(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    kmeansSecondAssign(spark, dir, k)
      .groupBy("vec_id")
      .agg(max(struct(col("cc"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), col("best.cc").as("cc"), (-col("best.ncid")).as("cid"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        fl6(sum(col("cc").cast(
          org.apache.spark.sql.types.DecimalType(28, 10))).cast("double") /
          count(lit(1))).as("avg_cos"))
      .orderBy("cid")

  /** The shared core of [[kmeans]] and [[silhouette]]: two unrolled Lloyd
    * iterations over the seed-initialized centroids, exposed as the FULL
    * second-pass cosine frame — (vec_id, cid, cc) for every vector ×
    * updated centroid (k rows per vector; the argmax is left to callers so
    * silhouette can also see the runner-up distances).
    */
  private[graft] def kmeansSecondAssign(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // NOT spread (r15 A/B: q_silhouette 1.86 → 2.61 s, q_source_cluster_mix
    // 1.00 → 1.38 s with a spread here): the two-iteration loop pipelines
    // into the scan and its aggregates carry most of the reduction; the
    // downstream pair-join consumer that DID need parallelism gets it from
    // its own cid-keyed exchange (see semDedup).
    val emb = embeddings(spark, dir)
    // Iteration 1: assign against the k literal seed centroids (IVF-style).
    val cents: Seq[(Long, Array[Double])] = emb.where(col("vec_id") < k)
      .select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq
    def foldNorm(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      math.sqrt(s)
    }
    val cosArr = array(cents.map { case (_, cv) =>
      dot(col("v"), typedlit(cv.toSeq)) / (col("nrm") * lit(foldNorm(cv)))
    }: _*)
    val a0 = emb.withColumn("cid", array_position(cosArr, array_max(cosArr)) - 1)
    // Centroid update: per-(cid, dim) decimal-exact means, re-assembled into
    // an ordered array. k·dim rows total — a broadcast-sized relation.
    val c1 = a0
      .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("cid", "i")
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
        count(lit(1))).as("mx"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("i"), col("mx")))).as("ps"))
      .select(col("cid"), expr("transform(ps, p -> p.mx)").as("cv"))
      .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
    // Iteration 2: every (vector, updated centroid) cosine; argmax via a
    // map-side-combinable max(struct) with the same (cos DESC, cid ASC)
    // tie-break the oracle's row_number uses is applied by callers.
    emb.crossJoin(broadcast(c1))
      .withColumn("cc", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .select("vec_id", "cid", "cc")
  }

  /** §2.3 #295 — SIMPLIFIED SILHOUETTE of the k-means clustering: per
    * cluster, the mean of s = (cos_own − cos_next) / max(1 − cos_own,
    * 1 − cos_next) — each vector scored by its own-centroid cosine distance
    * a = 1 − cos_own against the best OTHER centroid b = 1 − cos_next — the
    * standard "are these clusters real or did k-means just draw lines"
    * acceptance gate (#212 needs labels; this doesn't). Centroid-based
    * (O(N·k), the simplified form) rather than pairwise (O(N²) — unpayable
    * at 100 TB); reuses [[kmeansSecondAssign]]'s cosine frame, so the only
    * extra cost over kmeans itself is one k-row-per-vector aggregation.
    */
  def silhouette(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ac = kmeansSecondAssign(spark, dir, k)
    val best = ac.groupBy("vec_id")
      .agg(max(struct(col("cc"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), (-col("best.ncid")).as("bcid"),
        col("best.cc").as("bcc"))
    val other = ac.join(best, "vec_id")
      .where(col("cid") =!= col("bcid"))
      .groupBy("vec_id").agg(max("cc").as("occ"))
    val sil = best.join(other, "vec_id")
      .select(col("vec_id"), col("bcid"),
        ((col("bcc") - col("occ")) /
          greatest(lit(1.0) - col("bcc"), lit(1.0) - col("occ"))).as("s"))
    sil.groupBy("bcid")
      .agg(count(lit(1)).as("n_vecs"),
        (floor(sum(col("s").cast(DecimalType(38, 12))).cast("double") /
          count(lit(1)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean_silhouette"))
      .select(col("bcid").as("cid"), col("n_vecs"), col("mean_silhouette"))
      .orderBy("cid")
  }

  /** The k-means cluster ASSIGNMENT frame (vec_id, cid) — the
    * [[kmeansSecondAssign]] argmax with the oracle's (cc DESC, cid ASC)
    * tie-break, shared by [[semDedup]] and [[sourceClusterMix]].
    */
  private def kmeansAssign(spark: SparkSession, dir: String,
      k: Int): DataFrame =
    kmeansSecondAssign(spark, dir, k)
      .groupBy("vec_id")
      .agg(max(struct(col("cc"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), (-col("best.ncid")).as("cid"))

  /** §2.3 #382 — SEMANTIC DEDUP (the SemDeDup shape, Abbas et al. 2023):
    * k-means-cluster the embedding space, then search duplicate pairs
    * ONLY within clusters — pairwise cosine is quadratic, but clustering
    * first bounds every pair join to one cluster's members, which is
    * exactly how the published pipeline makes semantic dedup payable at
    * extreme scale (cluster count grows with the corpus so per-cluster
    * membership stays bounded; the pair join keys on cid — bucketed,
    * never global all-pairs). A vector is DROPPED when any smaller-id
    * member of its own cluster sits above the cosine threshold (the
    * keep-lowest-id survivor rule #375 uses). Per-cluster audit out:
    * members, above-threshold pairs, dropped count, kept share.
    */
  def semDedup(spark: SparkSession, dir: String, k: Int = 8,
      tau: Double = 0.3): DataFrame = {
    // cid-keyed explicit-count exchange BEFORE the checkpoint: the
    // within-cluster pair join below keys on cid, so the checkpoint's
    // partitioning satisfies both join sides (zero join exchanges) AND
    // the CPU-expanding pair stage runs at full width instead of the
    // AQE-coalesced single task (r15 A/B: q_semdedup 3.66 → 1.9 s).
    // Count flows from spark.sql.shuffle.partitions (guide §2.5).
    val m = Par.spreadBy(embeddings(spark, dir)
      .join(kmeansAssign(spark, dir, k), "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm")), col("cid"))
      .localCheckpoint(true)
    semDedupPairGuard(spark, m, k)
    val pairs = m.as("a")
      .join(m.as("b"), col("a.cid") === col("b.cid") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .where(col("cos") >= tau)
      .select(col("a.cid").as("cid"), col("b.vec_id").as("victim"))
      .localCheckpoint(true)
    val perCluster = m.groupBy("cid").agg(count(lit(1)).as("n_members"))
    val dupPairs = pairs.groupBy("cid").agg(count(lit(1)).as("n_dup_pairs"))
    val dropped = pairs.select("cid", "victim").distinct()
      .groupBy("cid").agg(count(lit(1)).as("n_dropped"))
    perCluster
      .join(dupPairs, Seq("cid"), "left")
      .join(dropped, Seq("cid"), "left")
      .select(col("cid"), col("n_members"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        fl6((col("n_members") - coalesce(col("n_dropped"), lit(0L)))
          .cast("double") / col("n_members").cast("double")).as("keep_rate"))
      .orderBy("cid")
  }

  /** Pair ceiling for [[semDedup]]'s within-cluster pair join. The
    * operator's scale contract is that k GROWS with the corpus (SemDeDup
    * keeps per-cluster occupancy bounded, so Σ C(n_c, 2) stays ~N·n̄/2);
    * nothing used to enforce it — at the 100× decade corpus the default
    * k=8 meant ~1.5e10 cosine pairs (SURVEY §7 r12 tally). Mirrors the
    * exactGroundTruth guard (Dedup.scala): the estimate is one k-row
    * aggregate over the already-checkpointed assignment frame — free next
    * to the join it guards — and the 10× tally's ~1.5e8 pairs stay well
    * under the default ceiling.
    */
  private[graft] val SemDedupMaxPairs = 1000000000L

  /** Refuses [[semDedup]] when the per-cluster member counts imply more
    * than `spark.graft.semdedup.maxPairs` (default [[SemDedupMaxPairs]])
    * within-cluster pairs, unless `spark.graft.semdedup.force=true`
    * acknowledges the run. The error names the k ≈ √N repair.
    */
  private def semDedupPairGuard(spark: SparkSession,
      assigned: DataFrame, k: Int): Unit =
    if (!spark.conf.getOption("spark.graft.semdedup.force")
          .exists(_.toBoolean)) {
      val ceiling = spark.conf.getOption("spark.graft.semdedup.maxPairs")
        .map(_.toLong).getOrElse(SemDedupMaxPairs)
      // Spark's `/` on longs is a DOUBLE divide — sum the even product
      // n·(n−1) exactly in LONG and halve driver-side.
      val row = assigned.groupBy("cid").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - lit(1L))).as("pairs2"),
          sum(col("n")).as("n_vecs")).head()
      if (row.isNullAt(0)) return // empty corpus: nothing to guard
      val (pairs, nVecs) = (row.getLong(0) / 2, row.getLong(1))
      require(pairs <= ceiling,
        s"semDedup: k=$k puts ~$pairs within-cluster pairs over $nVecs " +
        s"vectors, past the $ceiling-pair ceiling — the operator's scale " +
        s"contract is k growing with the corpus (k ≈ √N = " +
        s"${math.round(math.sqrt(nVecs.toDouble))} here); raise k, set " +
        "spark.graft.semdedup.maxPairs, or set " +
        "spark.graft.semdedup.force=true for a signed-off run")
    }

  /** DuckDB oracle for [[semDedup]]: the kmeans-core assignment CTEs feed
    * the identical cluster-scoped pair search and survivor rule.
    */
  def semDedupOracleSql(k: Int = 8, tau: Double = 0.3,
      dim: Int = 64): String =
    s"""WITH ${kmeansCoreCtes(k, dim)},
       |a1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
       |    FROM ac1) t
       |  WHERE rn = 1
       |),
       |mem AS (SELECT a1.cid, n.vec_id, n.v, n.nrm FROM a1 JOIN n USING (vec_id)),
       |p AS (
       |  SELECT a.cid, b.vec_id AS victim
       |  FROM mem a JOIN mem b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE list_reduce(list_prepend(0.0::DOUBLE,
       |      [a.v[i] * b.v[i] FOR i IN generate_series(1, len(a.v))]),
       |      (x, y) -> x + y) / (a.nrm * b.nrm) >= $tau
       |),
       |cl AS (SELECT cid, count(*) AS n_members FROM mem GROUP BY 1),
       |dp AS (SELECT cid, count(*) AS n_dup_pairs FROM p GROUP BY 1),
       |dr AS (SELECT cid, count(*) AS n_dropped
       |       FROM (SELECT DISTINCT cid, victim FROM p) GROUP BY 1)
       |SELECT cl.cid, cl.n_members,
       |  coalesce(dp.n_dup_pairs, 0)::BIGINT AS n_dup_pairs,
       |  coalesce(dr.n_dropped, 0)::BIGINT AS n_dropped,
       |  floor((cl.n_members - coalesce(dr.n_dropped, 0))::DOUBLE
       |    / cl.n_members * 1e6 + 0.5) / 1e6 AS keep_rate
       |FROM cl LEFT JOIN dp ON cl.cid = dp.cid
       |LEFT JOIN dr ON cl.cid = dr.cid
       |ORDER BY cl.cid""".stripMargin

  /** §2.3 #383 — per-SOURCE CLUSTER MIX: the composition of each source
    * over the k-means clusters of embedding space — the semantic
    * data-recipe view (#195 weights sources by declared mix; this says
    * what each source actually CONTAINS, which is what a curriculum or
    * rebalancing pass needs before reweighting a 100 TB corpus).
    * Assignment rides the shared kmeans core; the mix is one
    * partial-aggregated count over (source, cid) after a doc_id = vec_id
    * dimension join.
    */
  def sourceClusterMix(spark: SparkSession, dir: String,
      k: Int = 8): DataFrame = {
    val src = Tables.load(spark, dir, "documents").select(
      col("doc_id").as("vec_id"), col("source"))
    val w = Window.partitionBy("source")
    kmeansAssign(spark, dir, k)
      .join(src, "vec_id")
      .groupBy("source", "cid")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        fl6(col("n_docs").cast("double") / sum("n_docs").over(w)))
      .orderBy("source", "cid")
  }

  /** DuckDB oracle for [[sourceClusterMix]]: kmeans-core assignment CTEs
    * joined to the documents dimension, same window share.
    */
  def sourceClusterMixOracleSql(k: Int = 8, dim: Int = 64): String =
    s"""WITH ${kmeansCoreCtes(k, dim)},
       |a1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
       |    FROM ac1) t
       |  WHERE rn = 1
       |),
       |mix AS (
       |  SELECT d.source, a1.cid, count(*) AS n_docs
       |  FROM a1 JOIN documents d ON a1.vec_id = d.doc_id
       |  GROUP BY 1, 2)
       |SELECT source, cid, n_docs,
       |  floor(n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY source)
       |    * 1e6 + 0.5) / 1e6 AS share
       |FROM mix ORDER BY source, cid""".stripMargin

  /** DuckDB oracle for [[kmeans]]: the same two unrolled Lloyd iterations —
    * seed centroids, fold-cosine argmax (row_number with the identical
    * tie-break), DECIMAL(28,12) per-dim means via a dimension spine,
    * `list(mx ORDER BY i)` re-assembly, second assignment, final aggregate.
    */
  /** The CTE chain through the second-pass cosine frame `ac1` — mirrors
    * [[kmeansSecondAssign]]; shared by the kmeans and silhouette oracles.
    */
  private def kmeansCoreCtes(k: Int, dim: Int): String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a.v[i] * $b.v[i] FOR i IN generate_series(1, len($a.v))]), (x, y) -> x + y)"
    val selfDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [v[i] * v[i] FOR i IN generate_series(1, len(v))]), (x, y) -> x + y)"
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt($selfDot) AS nrm FROM e),
       |c0 AS (SELECT vec_id AS cid, v, nrm FROM n WHERE vec_id < $k),
       |ac0 AS (SELECT n.vec_id, c0.cid, ${fold("n", "c0")} / (n.nrm * c0.nrm) AS cc FROM n, c0),
       |a0 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
       |    FROM ac0) t
       |  WHERE rn = 1
       |),
       |dims AS (SELECT i FROM generate_series(1, $dim) AS t(i)),
       |m AS (
       |  SELECT a0.cid, dims.i,
       |    CAST(CAST(sum(CAST(n.v[dims.i] AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / count(*) AS mx
       |  FROM a0 JOIN n USING (vec_id) CROSS JOIN dims
       |  GROUP BY 1, 2
       |),
       |c1 AS (SELECT cid, list(mx ORDER BY i) AS v FROM m GROUP BY cid),
       |c1n AS (SELECT cid, v, sqrt($selfDot) AS nrm FROM c1),
       |ac1 AS (SELECT n.vec_id, c.cid, ${fold("n", "c")} / (n.nrm * c.nrm) AS cc FROM n, c1n c)""".stripMargin
  }

  def kmeansOracleSql(k: Int = 8, dim: Int = 64): String =
    s"""WITH ${kmeansCoreCtes(k, dim)},
       |a1 AS (
       |  SELECT vec_id, cid, cc FROM (
       |    SELECT vec_id, cid, cc,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
       |    FROM ac1) t
       |  WHERE rn = 1
       |)
       |SELECT cid, count(*) AS n_vecs,
       |  floor(CAST(CAST(sum(CAST(cc AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS avg_cos
       |FROM a1 GROUP BY cid ORDER BY cid""".stripMargin

  /** DuckDB oracle for [[silhouette]]: the shared kmeans core CTEs, then
    * best/runner-up cosines per vector and the identical simplified-
    * silhouette formula with the engine-stable floor rounding.
    */
  def silhouetteOracleSql(k: Int = 8, dim: Int = 64): String =
    s"""WITH ${kmeansCoreCtes(k, dim)},
       |best AS (
       |  SELECT vec_id, cid AS bcid, cc AS bcc FROM (
       |    SELECT vec_id, cid, cc,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
       |    FROM ac1) t
       |  WHERE rn = 1
       |),
       |oth AS (
       |  SELECT a.vec_id, max(a.cc) AS occ
       |  FROM ac1 a JOIN best b ON a.vec_id = b.vec_id AND a.cid <> b.bcid
       |  GROUP BY 1
       |),
       |sil AS (
       |  SELECT b.vec_id, b.bcid,
       |    (b.bcc - o.occ) / greatest(1.0 - b.bcc, 1.0 - o.occ) AS s
       |  FROM best b JOIN oth o ON b.vec_id = o.vec_id
       |)
       |SELECT bcid AS cid, count(*)::BIGINT AS n_vecs,
       |  floor(CAST(CAST(sum(CAST(s AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / count(*)
       |    * 1e6 + 0.5) / 1e6 AS mean_silhouette
       |FROM sil GROUP BY 1 ORDER BY 1""".stripMargin

  /** §2.3 #121 — random-projection dimensionality reduction
    * (Johnson–Lindenstrauss): every 64-dim embedding maps to `pDim`
    * coordinates, each a fold-dot against a fixed seeded Gaussian plane —
    * the same plane machinery the LSH paths binarize, kept real-valued. The
    * cheap 4× shrink a pipeline applies before clustering / kNN-graph /
    * dedup passes when full-width vectors dominate shuffle volume. Reported
    * as per-(label, dim) decimal-exact means so the contract — projections
    * are deterministic, linear, reproducible across engines — is
    * value-checked; the distance-preservation property is spec-asserted.
    *
    * Scale: pure per-row projection work at scan speed (no shuffle), then
    * one (label, dim) aggregation whose output is labels·pDim rows.
    */
  def randProject(spark: SparkSession, dir: String, pDim: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val planes = hyperplanes(pDim, 64, seed = 101L)
    val projCols = (0 until pDim).map(j =>
      struct(lit(j).as("i"), dot(col("v"), typedlit(planes(j).toSeq)).as("p")))
    embeddings(spark, dir)
      .select(col("label"), explode(array(projCols: _*)).as("pr"))
      .select(col("label"), col("pr.i").as("dim_id"), col("pr.p").as("p"))
      .groupBy("label", "dim_id")
      .agg(count(lit(1)).as("n_vecs"),
        fl6(sum(col("p").cast(DecimalType(28, 12))).cast("double") /
          count(lit(1))).as("mean_proj"))
      .orderBy("label", "dim_id")
  }

  /** DuckDB oracle for [[randProject]]: the same seeded planes embedded as
    * double literals, the same sequential folds and decimal-exact means.
    */
  def randProjectOracleSql(pDim: Int = 16): String = {
    def dotLit(plane: Array[Double]): String = {
      val prods = plane.zipWithIndex.map { case (c, i) => s"v[${i + 1}] * $c" }.mkString(", ")
      s"list_reduce(list_prepend(0.0::DOUBLE, [$prods]), (x, y) -> x + y)"
    }
    val planes = hyperplanes(pDim, 64, seed = 101L)
    val projs = (0 until pDim).map(j =>
      s"SELECT label, $j AS dim_id, ${dotLit(planes(j))} AS p FROM e"
    ).mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
       |pr AS (
       |$projs
       |)
       |SELECT label, dim_id, count(*) AS n_vecs,
       |  floor(CAST(CAST(sum(CAST(p AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS mean_proj
       |FROM pr GROUP BY label, dim_id ORDER BY label, dim_id""".stripMargin
  }

  /** §2.3 #143 — PRODUCT-QUANTIZED ANN with asymmetric distance (the
    * PQ/ADC index pattern, completing the index family: brute → LSH →
    * IVF → SQ → PQ): vectors split into `nSub` orthogonal subspaces;
    * each subvector encodes to its nearest codebook entry (codebooks =
    * the first `nCents` vectors' subvectors — the same deterministic
    * seeded stand-in the IVF quantizer uses), so a 64-dim float vector
    * compresses to `nSub` single-byte codes (32× scan compression at
    * 100 TB — the reason PQ indexes exist). Queries stay full-precision:
    * ADC ranks by Σ_s ‖q_s − codebook[code_s]‖², keeps `rescoreC`
    * candidates, and only those pay the exact-cosine rescore.
    *
    * Everything is relational: subspace explosion is scan-stage work,
    * code assignment is a broadcast join against nSub·nCents tiny
    * codebook rows with a map-side-combinable min(struct) argmin, and the
    * ADC sum aggregates DECIMAL(28,12)-cast per-subspace distances —
    * order-free, so the approximate ranking (and the final answer) is
    * bit-reproducible cross-engine. An exact oracle for a doubly-
    * approximate index.
    */
  def pqTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
      nSub: Int = 8, subDim: Int = 8, nCents: Int = 16,
      rescoreC: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Bit-identical to dot(zip_with(a,b,_-_), same) — see L2Distance2.
    def l2(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graftglue._
      exprColumn(graft.functions.L2Distance2(columnExpr(a), columnExpr(b)))
    }
    // Code assignment evaluates l2 |corpus|·nSub·nCents times MAP-SIDE on
    // the embeddings scan — spread it first (guide §2.5; no-op at scale).
    val emb = Par.spread(embeddings(spark, dir))
    val subs = emb.select(col("vec_id"),
        explode(expr(s"transform(sequence(0, ${nSub - 1}), " +
          s"s -> struct(s AS s, slice(v, s * $subDim + 1, $subDim) AS sub))")).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sub").as("sub"))
    val cents = subs.where(col("vec_id") < nCents)
      .select(col("s"), col("vec_id").as("cid"), col("sub").as("cent"))
    val codes = subs.join(broadcast(cents), "s")
      .withColumn("d2", l2(col("sub"), col("cent")))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("s"), col("best.cid").as("code"))
    // The stored index is (vec_id, codes); reconstruction re-attaches the
    // codebook rows for ADC scoring.
    val dbParts = codes.join(
      broadcast(cents.withColumnRenamed("cid", "code")), Seq("s", "code"))
      .select(col("vec_id"), col("s"), col("cent"))
    val qParts = subs.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("s"), col("sub").as("q_sub"))
    val approx = dbParts.join(broadcast(qParts), "s")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("pd", l2(col("q_sub"), col("cent")).cast(DecimalType(28, 12)))
      .groupBy("q_id", "vec_id")
      .agg(sum("pd").as("adist"))
    val aw = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val cand = approx.withColumn("arank", row_number().over(aw))
      .where(col("arank") <= rescoreC)
      .select("q_id", "vec_id")
    val base = emb.select(col("vec_id"), col("v"), col("nrm"))
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val ew = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    cand.join(base, "vec_id").join(broadcast(queries), "q_id")
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(ew))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), fl6(col("cos")).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** DuckDB oracle for [[pqTopK]]: identical subspace split, codebooks,
    * argmin tie-breaks, decimal ADC sums, and two-stage ranking.
    */
  def pqOracleSql(nQueries: Int = 10, k: Int = 10, nSub: Int = 8,
      subDim: Int = 8, nCents: Int = 16, rescoreC: Int = 50): String = {
    def l2(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [($a[i] - $b[i]) * ($a[i] - $b[i]) FOR i IN generate_series(1, len($a))]), (x, y) -> x + y)"
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a[i] * $b[i] FOR i IN generate_series(1, len($a))]), (x, y) -> x + y)"
    val selfDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [v[i] * v[i] FOR i IN generate_series(1, len(v))]), (x, y) -> x + y)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt($selfDot) AS nrm FROM e),
       |sp AS (SELECT g FROM generate_series(0, ${nSub - 1}) AS t(g)),
       |subs AS (
       |  SELECT vec_id, sp.g AS s,
       |    list_slice(v, sp.g * $subDim + 1, sp.g * $subDim + $subDim) AS sub
       |  FROM e CROSS JOIN sp),
       |cents AS (SELECT s, vec_id AS cid, sub AS cent FROM subs WHERE vec_id < $nCents),
       |cd AS (
       |  SELECT subs.vec_id, subs.s, cents.cid,
       |    ${l2("subs.sub", "cents.cent")} AS d2
       |  FROM subs JOIN cents ON subs.s = cents.s),
       |codes AS (
       |  SELECT vec_id, s, cid AS code FROM (
       |    SELECT vec_id, s, cid,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, cid ASC) AS rn
       |    FROM cd) t WHERE rn = 1),
       |dbp AS (
       |  SELECT codes.vec_id, codes.s, cents.cent
       |  FROM codes JOIN cents ON cents.s = codes.s AND cents.cid = codes.code),
       |qp AS (SELECT vec_id AS q_id, s, sub AS q_sub FROM subs WHERE vec_id < $nQueries),
       |ad AS (
       |  SELECT qp.q_id, dbp.vec_id,
       |    sum(CAST(${l2("qp.q_sub", "dbp.cent")} AS DECIMAL(28,12))) AS adist
       |  FROM dbp JOIN qp ON dbp.s = qp.s AND dbp.vec_id <> qp.q_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS arank
       |    FROM ad) t WHERE arank <= $rescoreC),
       |sc AS (
       |  SELECT cand.q_id, cand.vec_id, ${fold("cv.v", "qv.v")} / (cv.nrm * qv.nrm) AS cos
       |  FROM cand
       |  JOIN n cv ON cv.vec_id = cand.vec_id
       |  JOIN n qv ON qv.vec_id = cand.q_id),
       |r AS (SELECT q_id, vec_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
       |  FROM sc)
       |SELECT q_id, rank, vec_id, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** §2.3 #394 — IVF-PQ ANN (the two indexes COMPOSED — the actual
    * billion-scale layout, FAISS's `IVFx,PQy`): the #38 coarse quantizer
    * prunes the corpus to the `nProbe` probed inverted lists, then
    * WITHIN those lists ranking runs on #143's product-quantized codes
    * (asymmetric distance), and only the ADC top-`rescoreC` pay the
    * exact-cosine rescore. Separately each index trades one thing; the
    * composition is why a 100 TB store works at all: partition pruning
    * cuts the candidate set to ~nProbe·N/K rows AND those rows are read
    * as nSub one-byte codes (32×-compressed scan), so per-query cost is
    * sublinear in N and near-free per candidate — full vectors are
    * touched only for `rescoreC` rows per query.
    *
    * Determinism is inherited wholesale: #38's seeded centroid
    * stand-ins and (cc DESC, cid ASC) probe ranking, #143's codebooks,
    * argmin tie-breaks and DECIMAL(28,12) order-free ADC sums — so the
    * doubly-approximate result is value-exact cross-engine and one
    * relational oracle verifies the whole composed index.
    */
  def ivfPqTopK(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 10, nCentroids: Int = 0, nProbe: Int = 4, nSub: Int = 8,
      subDim: Int = 8, nCents: Int = 16, rescoreC: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Bit-identical to dot(zip_with(a,b,_-_), same) — see L2Distance2.
    def l2(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graftglue._
      exprColumn(graft.functions.L2Distance2(columnExpr(a), columnExpr(b)))
    }
    val (assigned, probes) = ivfCore(spark, dir, nCentroids, nQueries, nProbe)
    // IVF stage: candidates = corpus rows in a probed list (equi-join on
    // the list id — at scale this is partition pruning, not a scan).
    val cand = assigned.select("cid", "vec_id")
      .join(broadcast(probes.select("q_id", "cid")), Seq("cid"))
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    // PQ stage: codes for the full corpus (the stored index), ADC only
    // over the IVF-pruned candidate pairs. Spread: see pqTopK.
    val emb = Par.spread(embeddings(spark, dir))
    val subs = emb.select(col("vec_id"),
        explode(expr(s"transform(sequence(0, ${nSub - 1}), " +
          s"s -> struct(s AS s, slice(v, s * $subDim + 1, $subDim) AS sub))")).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sub").as("sub"))
    val cents = subs.where(col("vec_id") < nCents)
      .select(col("s"), col("vec_id").as("cid"), col("sub").as("cent"))
    val codes = subs.join(broadcast(cents), "s")
      .withColumn("d2", l2(col("sub"), col("cent")))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("s"), col("best.cid").as("code"))
    val dbParts = codes.join(
      broadcast(cents.withColumnRenamed("cid", "code")), Seq("s", "code"))
      .select(col("vec_id"), col("s"), col("cent"))
    val qParts = subs.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("s"), col("sub").as("q_sub"))
    val approx = cand.join(dbParts, "vec_id")
      .join(broadcast(qParts), Seq("q_id", "s"))
      .withColumn("pd", l2(col("q_sub"), col("cent")).cast(DecimalType(28, 12)))
      .groupBy("q_id", "vec_id")
      .agg(sum("pd").as("adist"))
    val aw = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val shortlist = approx.withColumn("arank", row_number().over(aw))
      .where(col("arank") <= rescoreC)
      .select("q_id", "vec_id")
    val base = emb.select(col("vec_id"), col("v"), col("nrm"))
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val ew = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    shortlist.join(base, "vec_id").join(broadcast(queries), "q_id")
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(ew))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), fl6(col("cos")).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** DuckDB oracle for [[ivfPqTopK]]: the #38 IVF CTEs feed the candidate
    * set, the #143 PQ CTEs score it — the same composed pipeline,
    * relational end to end.
    */
  def ivfPqOracleSql(nQueries: Int = 10, k: Int = 10, nProbe: Int = 4,
      nSub: Int = 8, subDim: Int = 8, nCents: Int = 16,
      rescoreC: Int = 50): String = {
    def l2(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [($a[i] - $b[i]) * ($a[i] - $b[i]) FOR i IN generate_series(1, len($a))]), (x, y) -> x + y)"
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a.v[i] * $b.v[i] FOR i IN generate_series(1, len($a.v))]), (x, y) -> x + y)"
    def foldv(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a[i] * $b[i] FOR i IN generate_series(1, len($a))]), (x, y) -> x + y)"
    val selfDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [v[i] * v[i] FOR i IN generate_series(1, len(v))]), (x, y) -> x + y)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |prm AS (SELECT 1 << ((length(bin(count(*) - 1)) + 1) // 2) AS kc FROM e),
       |n AS (SELECT vec_id, v, sqrt($selfDot) AS nrm FROM e),
       |c AS (SELECT vec_id AS ccid, v, nrm FROM n, prm WHERE vec_id < prm.kc),
       |ac AS (
       |  SELECT n.vec_id, c.ccid, ${fold("n", "c")} / (n.nrm * c.nrm) AS cc
       |  FROM n, c),
       |a AS (
       |  SELECT vec_id, ccid FROM (
       |    SELECT vec_id, ccid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, ccid ASC) AS rn
       |    FROM ac) t
       |  WHERE rn = 1),
       |p AS (
       |  SELECT vec_id AS q_id, ccid FROM (
       |    SELECT vec_id, ccid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, ccid ASC) AS rn
       |    FROM ac WHERE vec_id < $nQueries) t
       |  WHERE rn <= $nProbe),
       |ivfcand AS (
       |  SELECT p.q_id, a.vec_id FROM p JOIN a ON a.ccid = p.ccid AND a.vec_id <> p.q_id),
       |sp AS (SELECT g FROM generate_series(0, ${nSub - 1}) AS t(g)),
       |subs AS (
       |  SELECT vec_id, sp.g AS s,
       |    list_slice(v, sp.g * $subDim + 1, sp.g * $subDim + $subDim) AS sub
       |  FROM e CROSS JOIN sp),
       |cents AS (SELECT s, vec_id AS cid, sub AS cent FROM subs WHERE vec_id < $nCents),
       |cd AS (
       |  SELECT subs.vec_id, subs.s, cents.cid,
       |    ${l2("subs.sub", "cents.cent")} AS d2
       |  FROM subs JOIN cents ON subs.s = cents.s),
       |codes AS (
       |  SELECT vec_id, s, cid AS code FROM (
       |    SELECT vec_id, s, cid,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, cid ASC) AS rn
       |    FROM cd) t WHERE rn = 1),
       |dbp AS (
       |  SELECT codes.vec_id, codes.s, cents.cent
       |  FROM codes JOIN cents ON cents.s = codes.s AND cents.cid = codes.code),
       |qp AS (SELECT vec_id AS q_id, s, sub AS q_sub FROM subs WHERE vec_id < $nQueries),
       |ad AS (
       |  SELECT ivfcand.q_id, ivfcand.vec_id,
       |    sum(CAST(${l2("qp.q_sub", "dbp.cent")} AS DECIMAL(28,12))) AS adist
       |  FROM ivfcand
       |  JOIN dbp ON dbp.vec_id = ivfcand.vec_id
       |  JOIN qp ON qp.q_id = ivfcand.q_id AND qp.s = dbp.s
       |  GROUP BY 1, 2),
       |shortlist AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS arank
       |    FROM ad) t WHERE arank <= $rescoreC),
       |sc AS (
       |  SELECT shortlist.q_id, shortlist.vec_id,
       |    ${foldv("cv.v", "qv.v")} / (cv.nrm * qv.nrm) AS cos
       |  FROM shortlist
       |  JOIN n cv ON cv.vec_id = shortlist.vec_id
       |  JOIN n qv ON qv.vec_id = shortlist.q_id),
       |r AS (SELECT q_id, vec_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
       |  FROM sc)
       |SELECT q_id, rank, vec_id, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** §2.3 #395 — MATRYOSHKA truncation recall (MRL, Kusupati et al.
    * 2022): recall@k of brute-force cosine retrieval over the FIRST
    * `tDim` of 64 dimensions against the full-width ground truth — the
    * measurement behind every "store the first quarter of the vector"
    * decision (MRL-trained embeddings front-load information precisely
    * so a prefix slice retrieves almost as well at a fraction of the
    * memory/shuffle bytes). Per query: the two top-k sets (full and
    * truncated, each with the house (cos DESC, vec_id ASC) tie-break)
    * joined on membership; reported as n_hits and recall@k. At 100 TB
    * the truncated pass scans tDim/64 of the vector bytes — this query
    * is the evidence for whether that 4× saving costs recall.
    *
    * Scale shape: two #26-style broadcast-query corpus scans (no
    * cross-join blow-up), k·nQueries-bounded compare.
    */
  def mrlRecall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 10, tDim: Int = 16): DataFrame = {
    val emb = embeddings(spark, dir)
    def topK(frame: DataFrame, vCol: String, nCol: String): DataFrame = {
      val queries = frame.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col(vCol).as("qv"), col(nCol).as("qn"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
      frame.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .withColumn("cos", dot(col(vCol), col("qv")) / (col(nCol) * col("qn")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("q_id", "vec_id")
    }
    val full = topK(emb, "v", "nrm")
    val trunc = topK(
      emb.withColumn("tv", slice(col("v"), 1, tDim))
        .withColumn("tn", sqrt(dot(col("tv"), col("tv")))),
      "tv", "tn")
    full.join(trunc.withColumn("hit", lit(1)), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        fl6(col("n_hits").cast("double") / col("k").cast("double")).as("recall"))
      .orderBy("q_id")
  }

  /** DuckDB oracle for [[mrlRecall]]: same two rankings (full vs
    * list_slice prefix), same tie-breaks, membership join.
    */
  def mrlRecallOracleSql(nQueries: Int = 10, k: Int = 10,
      tDim: Int = 16): String = {
    def foldv(a: String, b: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a[i] * $b[i] FOR i IN generate_series(1, len($a))]), (x, y) -> x + y)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v, list_slice(v, 1, $tDim) AS tv FROM e),
       |n AS (SELECT vec_id, v, tv, sqrt(${foldv("v", "v")}) AS nrm,
       |  sqrt(${foldv("tv", "tv")}) AS tn FROM b),
       |q AS (SELECT vec_id AS q_id, v AS qv, tv AS qtv, nrm AS qn, tn AS qtn
       |  FROM n WHERE vec_id < $nQueries),
       |full_r AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, n.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${foldv("n.v", "q.qv")} / (n.nrm * q.qn) DESC, n.vec_id ASC) AS rank
       |    FROM n, q WHERE n.vec_id <> q.q_id) t
       |  WHERE rank <= $k),
       |tr AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, n.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${foldv("n.tv", "q.qtv")} / (n.tn * q.qtn) DESC, n.vec_id ASC) AS rank
       |    FROM n, q WHERE n.vec_id <> q.q_id) t
       |  WHERE rank <= $k)
       |SELECT f.q_id, count(tr.vec_id) AS n_hits,
       |  floor(count(tr.vec_id)::DOUBLE / count(*)::DOUBLE * 1e6 + 0.5) / 1e6 AS recall
       |FROM full_r f
       |LEFT JOIN tr ON tr.q_id = f.q_id AND tr.vec_id = f.vec_id
       |GROUP BY f.q_id ORDER BY f.q_id""".stripMargin
  }

  /** §2.3 #139 — EMBEDDING DRIFT monitor: per label, the L2 distance
    * between the centroid of split-A vectors and split-B vectors, where the
    * split is sha256(vec_id) (seedless, re-ingestion-stable — the #46
    * hash split applied to vectors). On a healthy corpus the two halves
    * are exchangeable, so the distance is a null-distribution baseline;
    * run against yesterday/today instead of A/B, a large value is the
    * embedding-pipeline regression alarm (encoder version drift, input
    * corruption) before any model consumes the vectors.
    *
    * Per-(label, split, dim) means are DECIMAL(28,12) partial aggregates
    * (the shuffle carries labels·2·dim sum cells, never vectors); the
    * distance is the same sequential fold as every other score here, so
    * the result is bit-exact cross-engine.
    */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val split = substring(sha2(col("vec_id").cast("string"), 256), 1, 1) <= "7"
    // NOT spread (r15 A/B: 0.57 → 0.96 s): the (label, in_a, i) partial
    // aggregation reduces 64×N exploded rows to a bounded cell grid
    // map-side — exchanging the vectors first costs more than the
    // single-split serialization.
    val cells = embeddings(spark, dir)
      .withColumn("in_a", split)
      .select(col("label"), col("in_a"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("label", "in_a", "i")
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
        count(lit(1))).as("m"), count(lit(1)).as("nv"))
    val centroids = cells
      .groupBy("label", "in_a")
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("ps"),
        max("nv").as("n_vecs"))
      .select(col("label"), col("in_a"),
        expr("transform(ps, p -> p.m)").as("cv"), col("n_vecs"))
    val a = centroids.where(col("in_a"))
      .select(col("label"), col("cv").as("ca"), col("n_vecs").as("n_a"))
    val b = centroids.where(!col("in_a"))
      .select(col("label"), col("cv").as("cb"), col("n_vecs").as("n_b"))
    a.join(b, "label")
      .withColumn("diff", expr("zip_with(ca, cb, (x, y) -> x - y)"))
      .select(col("label"), col("n_a"), col("n_b"),
        fl6(sqrt(dot(col("diff"), col("diff")))).as("centroid_l2"))
      .orderBy("label")
  }

  /** DuckDB oracle for [[embedDrift]]: identical hash split, decimal per-dim
    * means via a dimension spine, same sequential-fold distance.
    */
  def embedDriftOracleSql(dim: Int = 64): String = {
    val selfDot =
      "list_reduce(list_prepend(0.0::DOUBLE, [d[i] * d[i] FOR i IN generate_series(1, len(d))]), (x, y) -> x + y)"
    s"""WITH e AS (
       |  SELECT label, embedding::DOUBLE[] AS v,
       |    substr(sha256(CAST(vec_id AS VARCHAR)), 1, 1) <= '7' AS in_a
       |  FROM embeddings),
       |dims AS (SELECT i FROM generate_series(1, $dim) AS t(i)),
       |cells AS (
       |  SELECT label, in_a, dims.i,
       |    CAST(CAST(sum(CAST(v[dims.i] AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / count(*) AS m,
       |    count(*) AS nv
       |  FROM e CROSS JOIN dims GROUP BY 1, 2, 3),
       |cent AS (
       |  SELECT label, in_a, list(m ORDER BY i) AS cv, max(nv) AS n_vecs
       |  FROM cells GROUP BY 1, 2),
       |ab AS (
       |  SELECT a.label, a.n_vecs AS n_a, b.n_vecs AS n_b,
       |    list_transform(generate_series(1, $dim), i -> a.cv[i] - b.cv[i]) AS d
       |  FROM cent a JOIN cent b ON a.label = b.label AND a.in_a AND NOT b.in_a)
       |SELECT label, n_a, n_b, floor(sqrt($selfDot) * 1e6 + 0.5) / 1e6 AS centroid_l2
       |FROM ab ORDER BY label""".stripMargin
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
        fl6(min(col("nrm"))).as("min_norm"),
        fl6(max(col("nrm"))).as("max_norm"))
      .orderBy("label")

  /** §2.3 #194 — ANN RECALL report: per-query recall@k of the LSH index
    * against the brute-force ground truth — the acceptance test every
    * approximate index ships with (is 16-table/12-bit LSH good enough to
    * replace the O(N·Q) scan?). Both sides are this library's own
    * operators; the join is on (query, neighbor) over two k-bounded
    * frames, so the comparison costs nothing next to either search.
    * maxBits pins to 12 where the oracle's embedded planes end (the same
    * pin as q_ann_lsh).
    */
  def annRecall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 10, maxBits: Int = 12): DataFrame = {
    val truth = bruteTopK(spark, dir, nQueries, k)
      .select(col("q_id"), col("vec_id"))
    val approx = lshTopK(spark, dir, nQueries, k, maxBits = maxBits)
      .select(col("q_id").as("l_q"), col("vec_id").as("l_v"), lit(1).as("hit"))
    truth.join(approx,
        col("q_id") === col("l_q") && col("vec_id") === col("l_v"),
        "left_outer")
      .groupBy("q_id")
      .agg(count(col("hit")).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        fl6(col("n_hits") / lit(k).cast("double")).as("recall"))
      .orderBy("q_id")
  }

  /** §2.3 #207 — per-node TRIANGLE COUNT over the [[knnGraph]] edge set:
    * how many triangles (mutually-near triples) each vector participates
    * in — the local-density signal that separates tight duplicate/template
    * clusters (triangle-rich) from chance LSH neighbors (triangle-free),
    * and the building block of clustering coefficients.
    *
    * The scalable formulation: edges are ORIENTED low-id → high-id first,
    * so every triangle {a<b<c} is generated exactly ONCE as wedge
    * (a→b, b→c) closed by edge (a→c) — no 3! duplicate discovery, no
    * symmetric-join blowup. Work is one self-join on the shared vertex
    * (Σ out-deg², bounded by the kNN fan-in) plus one semi-join back to
    * the edge set; counts are exact integers. The edge list is
    * localCheckpointed once so the LSH candidate join never re-runs per
    * use.
    */
  def triangleCount(spark: SparkSession, dir: String, k: Int = 3,
      nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    val e = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val wedge = e.as("x").join(e.as("y"), col("x.v") === col("y.u"))
      .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
    val tri = wedge.join(e.as("z"),
      col("a") === col("z.u") && col("c") === col("z.v"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_tri"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle SQL for [[triangleCount]] — the same oriented-wedge
    * closure over the [[knnGraphOracleSql]] edge set.
    */
  def triangleCountOracleSql(k: Int = 3, nTables: Int = 16,
      maxBits: Int = 12): String =
    s"""WITH e AS (
       |  SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
       |  FROM (${knnGraphOracleSql(k, nTables, maxBits)}) g
       |),
       |w AS (SELECT x.u AS a, x.v AS b, y.v AS c FROM e x JOIN e y ON x.v = y.u),
       |tri AS (SELECT a, b, c FROM w
       |        WHERE EXISTS (SELECT 1 FROM e WHERE e.u = w.a AND e.v = w.c)),
       |n AS (SELECT unnest([a, b, c]) AS vec_id FROM tri)
       |SELECT vec_id, count(*) AS n_tri FROM n GROUP BY 1 ORDER BY vec_id""".stripMargin

  /** §2.3 #284 — LOCAL CLUSTERING COEFFICIENT over the [[knnGraph]] edge
    * set: per node, closed wedges / possible wedges = 2·tri/(deg·(deg−1))
    * on the UNDIRECTED graph — the per-node version of #207's density
    * signal (a node with high degree but near-zero coefficient is a hub
    * artifact, see #233; a coefficient near 1 marks a tight
    * duplicate/template clique worth collapsing). Same oriented-wedge
    * closure as #207 (every triangle found once, O(Σ deg²) bounded by the
    * kNN fan-in), undirected degrees from the same O(k·N) edge list,
    * zero-triangle and degree-<2 nodes kept via the left join (coefficient
    * 0 — they're the anti-cluster signal). One double division per node.
    */
  def clusteringCoeff(spark: SparkSession, dir: String, k: Int = 3,
      nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    val e = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(explode(array(col("u"), col("v"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("deg"))
    val wedge = e.as("x").join(e.as("y"), col("x.v") === col("y.u"))
      .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
    val tri = wedge.join(e.as("z"),
        col("a") === col("z.u") && col("c") === col("z.v"), "left_semi")
      .select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_tri"))
    Tables.load(spark, dir, "embeddings").select("vec_id")
      .join(deg, Seq("vec_id"), "left_outer")
      .join(tri, Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("coeff",
        when(col("deg") >= 2,
          floor(lit(2.0) * col("n_tri").cast("double") /
            (col("deg").cast("double") * (col("deg").cast("double") - lit(1.0)))
            * lit(1e6) + lit(0.5)) / lit(1e6))
          .otherwise(lit(0.0)))
      .orderBy("vec_id")
  }

  /** DuckDB oracle SQL for [[clusteringCoeff]] — the same oriented-wedge
    * triangles and undirected degrees over the [[knnGraphOracleSql]] edge
    * set, with the engine-stable floor rounding.
    */
  def clusteringCoeffOracleSql(k: Int = 3, nTables: Int = 16,
      maxBits: Int = 12): String =
    s"""WITH e AS (
       |  SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
       |  FROM (${knnGraphOracleSql(k, nTables, maxBits)}) g
       |),
       |d AS (SELECT vec_id, count(*)::BIGINT AS deg
       |      FROM (SELECT unnest([u, v]) AS vec_id FROM e) GROUP BY 1),
       |w AS (SELECT x.u AS a, x.v AS b, y.v AS c FROM e x JOIN e y ON x.v = y.u),
       |tri AS (SELECT a, b, c FROM w
       |        WHERE EXISTS (SELECT 1 FROM e WHERE e.u = w.a AND e.v = w.c)),
       |tc AS (SELECT vec_id, count(*)::BIGINT AS n_tri
       |       FROM (SELECT unnest([a, b, c]) AS vec_id FROM tri) GROUP BY 1),
       |a AS (SELECT emb.vec_id, coalesce(deg, 0) AS deg, coalesce(n_tri, 0) AS n_tri
       |      FROM embeddings emb LEFT JOIN d USING (vec_id)
       |      LEFT JOIN tc USING (vec_id))
       |SELECT vec_id, deg, n_tri,
       |  CASE WHEN deg >= 2 THEN floor(2.0 * CAST(n_tri AS DOUBLE) /
       |    (CAST(deg AS DOUBLE) * (CAST(deg AS DOUBLE) - 1.0)) * 1e6 + 0.5) / 1e6
       |  ELSE 0.0 END AS coeff
       |FROM a ORDER BY vec_id""".stripMargin

  /** §2.3 #285 — ADAMIC–ADAR link prediction over the [[knnGraph]]: for
    * every NON-adjacent pair sharing ≥1 neighbor, score = Σ_b 1/ln(deg b)
    * over the common neighbors b — the classic "these two SHOULD be
    * neighbors" signal that patches LSH recall holes (a pair the index
    * missed but whose neighborhoods overlap is almost surely a true
    * near-pair; low-degree common neighbors count more than hubs). Work is
    * the same oriented wedge frame as #207/#284 (O(Σ deg²), bounded by the
    * kNN fan-in) minus an anti-join against the edge set; per-pair scores
    * sum 1/ln(deg) in decimal (order-free), top-20 by (score desc, pair) is
    * a TakeOrderedAndProject. A wedge's middle node has deg ≥ 2 by
    * construction, so ln(deg) > 0 always.
    */
  def adamicAdar(spark: SparkSession, dir: String, k: Int = 3, topN: Int = 20,
      nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(explode(array(col("u"), col("v"))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("deg"))
    // Undirected wedges a—b—c with a < c: middle node b sees both (b,a)
    // and (b,c) in its adjacency, so orient both edge copies around b.
    val adj = e.select(col("u").as("b"), col("v").as("n"))
      .unionByName(e.select(col("v").as("b"), col("u").as("n")))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.b") === col("y.b") && col("x.n") < col("y.n"))
      .select(col("x.n").as("a"), col("x.b").as("b"), col("y.n").as("c"))
    val open = wedges.join(e.as("z"),
      col("a") === col("z.u") && col("c") === col("z.v"), "left_anti")
    open.join(deg, "b")
      .groupBy("a", "c")
      .agg(count(lit(1)).as("n_common"),
        sum((lit(1.0) / log(col("deg").cast("double")))
          .cast(DecimalType(28, 12))).as("s"))
      .select(col("a").as("vec_a"), col("c").as("vec_b"), col("n_common"),
        (floor(col("s").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("aa_score"))
      .orderBy(col("aa_score").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(topN)
  }

  /** DuckDB oracle SQL for [[adamicAdar]] — the same anti-joined wedge
    * frame and decimal-summed 1/ln(deg) scores over [[knnGraphOracleSql]].
    */
  def adamicAdarOracleSql(k: Int = 3, topN: Int = 20, nTables: Int = 16,
      maxBits: Int = 12): String =
    s"""WITH e AS (
       |  SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
       |  FROM (${knnGraphOracleSql(k, nTables, maxBits)}) g
       |),
       |d AS (SELECT b, count(*)::BIGINT AS deg
       |      FROM (SELECT unnest([u, v]) AS b FROM e) GROUP BY 1),
       |adj AS (SELECT u AS b, v AS n FROM e UNION ALL SELECT v AS b, u AS n FROM e),
       |w AS (SELECT x.n AS a, x.b AS b, y.n AS c
       |      FROM adj x JOIN adj y ON x.b = y.b AND x.n < y.n),
       |open_w AS (SELECT a, b, c FROM w
       |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = w.a AND e.v = w.c)),
       |sc AS (SELECT a, c, count(*)::BIGINT AS n_common,
       |  CAST(CAST(sum(CAST(1.0 / ln(CAST(deg AS DOUBLE)) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS s
       |  FROM open_w JOIN d USING (b) GROUP BY 1, 2)
       |SELECT a AS vec_a, c AS vec_b, n_common,
       |  floor(s * 1e6 + 0.5) / 1e6 AS aa_score
       |FROM sc ORDER BY aa_score DESC, vec_a, vec_b LIMIT $topN""".stripMargin

  /** §2.3 #401 — JACCARD link prediction over the [[knnGraph]]: for every
    * NON-adjacent pair sharing ≥1 neighbor, score = |Γa ∩ Γc| / |Γa ∪ Γc|
    * — the normalized companion to #285's Adamic–Adar (AA rewards RARE
    * common neighbors; Jaccard asks what FRACTION of both neighborhoods
    * agrees, so a high-degree hub pair with two common neighbors scores
    * low where AA might rank it). Running both and comparing tops is the
    * standard link-prediction ablation. Same oriented-wedge + anti-join
    * frame as #285 (O(Σ deg²), kNN-fan-in-bounded); the score is a single
    * division of exact integers (n_common / (deg_a + deg_c − n_common)),
    * so not even a decimal sum is needed — top-20 by (score desc, pair) is
    * a TakeOrderedAndProject.
    */
  def jaccardLinkPred(spark: SparkSession, dir: String, k: Int = 3,
      topN: Int = 20, nBits: Int = 0, nTables: Int = 16,
      maxBits: Int = 24): DataFrame = {
    val e = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(explode(array(col("u"), col("v"))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("deg"))
    val adj = e.select(col("u").as("b"), col("v").as("n"))
      .unionByName(e.select(col("v").as("b"), col("u").as("n")))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.b") === col("y.b") && col("x.n") < col("y.n"))
      .select(col("x.n").as("a"), col("y.n").as("c"))
    val open = wedges.join(e.as("z"),
      col("a") === col("z.u") && col("c") === col("z.v"), "left_anti")
    open.groupBy("a", "c")
      .agg(count(lit(1)).as("n_common"))
      .join(deg.select(col("b").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("b").as("c"), col("deg").as("dc")), "c")
      .select(col("a").as("vec_a"), col("c").as("vec_b"), col("n_common"),
        fl6(col("n_common").cast("double") /
          (col("da") + col("dc") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(topN)
  }

  /** DuckDB oracle SQL for [[jaccardLinkPred]] — the same anti-joined
    * wedge counts and integer-ratio scores over [[knnGraphOracleSql]].
    */
  def jaccardLinkPredOracleSql(k: Int = 3, topN: Int = 20, nTables: Int = 16,
      maxBits: Int = 12): String =
    s"""WITH e AS (
       |  SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
       |  FROM (${knnGraphOracleSql(k, nTables, maxBits)}) g
       |),
       |d AS (SELECT b, count(*)::BIGINT AS deg
       |      FROM (SELECT unnest([u, v]) AS b FROM e) GROUP BY 1),
       |adj AS (SELECT u AS b, v AS n FROM e UNION ALL SELECT v AS b, u AS n FROM e),
       |w AS (SELECT x.n AS a, y.n AS c
       |      FROM adj x JOIN adj y ON x.b = y.b AND x.n < y.n),
       |open_w AS (SELECT a, c FROM w
       |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = w.a AND e.v = w.c)),
       |nc AS (SELECT a, c, count(*)::BIGINT AS n_common FROM open_w GROUP BY 1, 2)
       |SELECT a AS vec_a, c AS vec_b, n_common,
       |  floor(CAST(n_common AS DOUBLE) /
       |    CAST(da.deg + dc.deg - n_common AS DOUBLE) * 1e6 + 0.5) / 1e6 AS jaccard
       |FROM nc JOIN d da ON da.b = nc.a JOIN d dc ON dc.b = nc.c
       |ORDER BY jaccard DESC, vec_a, vec_b LIMIT $topN""".stripMargin

  /** §2.3 #286 — TWO-NN INTRINSIC DIMENSIONALITY (Facco et al.) from the
    * [[knnGraph]]'s rank-1/rank-2 neighbors: d̂ = n / Σ ln(r2/r1) over
    * cosine distances r = 1 − cos — the "how many dimensions is this
    * embedding space REALLY using" estimate that explains ANN behavior
    * (hubness #233 explodes and IVF recall collapses as intrinsic dim
    * grows; an embedding advertising 64 dims but measuring ~8 is ripe for
    * PQ/#143 compression). Only vectors with both neighbors and r1 > 0
    * count (r1 = 0 is an exact duplicate — its ratio is degenerate and
    * belongs to the dedup family); the log-ratios sum in decimal
    * (order-free), the estimate is one division. Work: one k-bounded
    * self-pivot of the O(k·N) edge list — nothing beyond the graph build.
    */
  def intrinsicDim(spark: SparkSession, dir: String, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val g = knnGraphCore(spark, dir, 2, nBits, nTables, maxBits)
    val r = g.groupBy("vec_id")
      .agg(min(when(col("rank") === 1, lit(1.0) - col("cos"))).as("r1"),
        min(when(col("rank") === 2, lit(1.0) - col("cos"))).as("r2"))
      .where(col("r2").isNotNull)
    r.select(count(lit(1)).as("n_with_2nn"),
        sum(when(col("r1") > 0, 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("r1") > 0, log(col("r2") / col("r1")))
          .otherwise(lit(0.0)).cast(DecimalType(28, 12))).as("s"))
      // A corpus where EVERY vector's nearest neighbors are exact
      // duplicates (r1 = 0 everywhere — the stress corpus's designed
      // worst case) has no valid ratios: the estimate is undefined, not a
      // division by zero (ANSI mode errors on x/0 for every numeric type).
      .select(col("n_with_2nn"), col("n_valid"),
        when(col("s") > 0,
          floor(col("n_valid").cast("double") / col("s").cast("double")
            * lit(1e6) + lit(0.5)) / lit(1e6))
          .otherwise(lit(null).cast("double")).as("id_mle"))
  }

  /** DuckDB oracle SQL for [[intrinsicDim]] — the same rank-1/2 pivot and
    * decimal-summed log-ratios over [[knnGraphOracleSql]] with k = 2.
    */
  def intrinsicDimOracleSql(nTables: Int = 16, maxBits: Int = 12): String =
    s"""WITH g AS (${knnGraphOracleSql(2, nTables, maxBits)}),
       |r AS (SELECT vec_id,
       |  min(CASE WHEN rank = 1 THEN 1.0 - cos END) AS r1,
       |  min(CASE WHEN rank = 2 THEN 1.0 - cos END) AS r2
       |  FROM g GROUP BY 1),
       |v AS (SELECT r1, r2 FROM r WHERE r2 IS NOT NULL),
       |a AS (SELECT count(*)::BIGINT AS n_with_2nn,
       |  sum(CASE WHEN r1 > 0 THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       |  sum(CAST(CASE WHEN r1 > 0 THEN ln(r2 / r1) ELSE 0.0 END
       |      AS DECIMAL(28,12))) AS s
       |  FROM v)
       |SELECT n_with_2nn, n_valid,
       |  CASE WHEN s > 0 THEN floor(CAST(n_valid AS DOUBLE) /
       |    CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 ELSE NULL END AS id_mle
       |FROM a""".stripMargin

  /** §2.3 #233 — HUBNESS of the kNN graph: the in-degree histogram of
    * [[knnGraph]] — how many vectors appear in k other vectors' neighbor
    * lists. High-dimensional embeddings grow "hub" points that show up in
    * everyone's top-k (and anti-hubs nobody retrieves); a heavy in-degree
    * tail means ANN results over-concentrate on a few documents, the
    * classic silent failure of embedding retrieval. Zero-degree vectors are
    * kept via a left join to the full id set (they ARE the anti-hub
    * signal). Integer-exact throughout: in-degree counts from the bounded
    * O(k·N) edge list, then a histogram aggregate — two key-partitioned
    * shuffles, nothing global.
    */
  def hubness(spark: SparkSession, dir: String, k: Int = 3, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    val indeg = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .groupBy(col("nbr_id").as("vec_id"))
      .agg(count(lit(1)).as("in_deg"))
    Tables.load(spark, dir, "embeddings").select("vec_id")
      .join(indeg, Seq("vec_id"), "left_outer")
      .withColumn("in_deg", coalesce(col("in_deg"), lit(0L)))
      .groupBy("in_deg").agg(count(lit(1)).as("n_vectors"))
      .orderBy("in_deg")
  }

  /** DuckDB oracle SQL for [[hubness]] — the same left-joined in-degree
    * histogram over the [[knnGraphOracleSql]] edge set.
    */
  def hubnessOracleSql(k: Int = 3, nTables: Int = 16, maxBits: Int = 12)
      : String =
    s"""WITH g AS (${knnGraphOracleSql(k, nTables, maxBits)}),
       |ind AS (SELECT nbr_id AS vec_id, count(*)::BIGINT AS in_deg
       |        FROM g GROUP BY 1),
       |a AS (SELECT emb.vec_id, coalesce(in_deg, 0) AS in_deg
       |      FROM embeddings emb LEFT JOIN ind USING (vec_id))
       |SELECT in_deg, count(*)::BIGINT AS n_vectors
       |FROM a GROUP BY 1 ORDER BY in_deg""".stripMargin

  /** §2.3 #238 — kNN RECIPROCITY: for every vector, how many of its k
    * out-neighbors also list it back — mutual nearest neighbors are the
    * high-precision core of the similarity graph (a reciprocated edge is
    * the standard strong-duplicate / same-cluster signal, an unreciprocated
    * one is often a hub artifact, see #233). One self-join of the O(k·N)
    * edge list on the reversed key pair (left_semi — no payload moves),
    * then a left join back to the id universe so zero-mutual vectors
    * surface. Integer-exact, two key-partitioned shuffles.
    */
  def reciprocity(spark: SparkSession, dir: String, k: Int = 3, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    val e = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select("vec_id", "nbr_id").localCheckpoint(true)
    val mutual = e.join(
        e.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id")),
        Seq("vec_id", "nbr_id"), "left_semi")
      .groupBy("vec_id").agg(count(lit(1)).as("n_mutual"))
    val outdeg = e.groupBy("vec_id").agg(count(lit(1)).as("n_out"))
    Tables.load(spark, dir, "embeddings").select("vec_id")
      .join(outdeg, Seq("vec_id"), "left_outer")
      .join(mutual, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), coalesce(col("n_out"), lit(0L)).as("n_out"),
        coalesce(col("n_mutual"), lit(0L)).as("n_mutual"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle SQL for [[reciprocity]] — the same reversed self-join
    * over the [[knnGraphOracleSql]] edge set.
    */
  def reciprocityOracleSql(k: Int = 3, nTables: Int = 16, maxBits: Int = 12)
      : String =
    s"""WITH g AS (${knnGraphOracleSql(k, nTables, maxBits)}),
       |e AS (SELECT vec_id, nbr_id FROM g),
       |m AS (SELECT vec_id, count(*)::BIGINT AS n_mutual FROM e
       |      WHERE EXISTS (SELECT 1 FROM e r
       |                    WHERE r.vec_id = e.nbr_id AND r.nbr_id = e.vec_id)
       |      GROUP BY 1),
       |o AS (SELECT vec_id, count(*)::BIGINT AS n_out FROM e GROUP BY 1)
       |SELECT emb.vec_id, coalesce(n_out, 0) AS n_out,
       |  coalesce(n_mutual, 0) AS n_mutual
       |FROM embeddings emb
       |LEFT JOIN o ON o.vec_id = emb.vec_id
       |LEFT JOIN m ON m.vec_id = emb.vec_id
       |ORDER BY emb.vec_id""".stripMargin

  /** §2.3 #239 — degree ASSORTATIVITY of the undirected kNN graph: Pearson
    * correlation of endpoint degrees over all edges (both orientations, the
    * standard Newman formulation). Negative assortativity is the hub
    * signature (low-degree vectors attach to hubs — consistent with a heavy
    * #233 tail); positive means a core-periphery embedding space. Degrees
    * and the five correlation sums are exact integers/decimals over the
    * O(k·N) distinct-edge list; the coefficient is one double formula on
    * six exact scalars.
    */
  def assortativity(spark: SparkSession, dir: String, k: Int = 3,
      nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val big = DecimalType(38, 0)
    val und = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct().localCheckpoint(true)
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val both = und.union(und.select(col("v").as("u"), col("u").as("v")))
    val pairs = both
      .join(deg.select(col("id").as("u"), col("deg").as("x")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("y")), "v")
      .select(col("x").cast(big).as("x"), col("y").cast(big).as("y"))
    val s = pairs.agg(count(lit(1)).as("m"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val mB = col("m").cast(big)
    val num = (mB * col("sxy") - col("sx") * col("sy")).cast("double")
    val d1 = (mB * col("sxx") - col("sx") * col("sx")).cast("double")
    val d2 = (mB * col("syy") - col("sy") * col("sy")).cast("double")
    s.select((col("m") / 2).cast("long").as("n_edges"),
      fl6(num / sqrt(d1 * d2)).as("assortativity"))
  }

  /** DuckDB oracle SQL for [[assortativity]] — identical degree join and
    * exact-sum Pearson over both orientations of the undirected edge set.
    */
  def assortativityOracleSql(k: Int = 3, nTables: Int = 16, maxBits: Int = 12)
      : String =
    s"""WITH g AS (${knnGraphOracleSql(k, nTables, maxBits)}),
       |und AS (SELECT DISTINCT least(vec_id, nbr_id) AS u,
       |        greatest(vec_id, nbr_id) AS v FROM g),
       |deg AS (SELECT id, count(*)::BIGINT AS deg FROM (
       |  SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und)
       |  GROUP BY 1),
       |both_e AS (SELECT u, v FROM und
       |           UNION ALL SELECT v AS u, u AS v FROM und),
       |p AS (SELECT CAST(du.deg AS HUGEINT) AS x, CAST(dv.deg AS HUGEINT) AS y
       |      FROM both_e JOIN deg du ON du.id = both_e.u
       |      JOIN deg dv ON dv.id = both_e.v),
       |s AS (SELECT count(*)::BIGINT AS m, sum(x) AS sx, sum(y) AS sy,
       |      sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM p)
       |SELECT CAST(m // 2 AS BIGINT) AS n_edges,
       |  floor(CAST(CAST(m AS HUGEINT) * sxy - sx * sy AS DOUBLE)
       |    / sqrt(CAST(CAST(m AS HUGEINT) * sxx - sx * sx AS DOUBLE)
       |         * CAST(CAST(m AS HUGEINT) * syy - sy * sy AS DOUBLE))
       |    * 1e6 + 0.5) / 1e6 AS assortativity
       |FROM s""".stripMargin

  /** §2.3 #262 — TWO-HOP neighborhood size over the undirected kNN graph:
    * per vector, the count of distinct nodes within ≤2 hops (self
    * excluded) — the expansion measure behind graph-based label
    * propagation and diversity sampling (a small 2-hop ball means an
    * isolated micro-cluster; a huge one, a hub-adjacent region that one
    * more hop would flood). One self-join of the O(k·N) undirected edge
    * list on the shared middle node + a distinct — bounded by k²·N pairs —
    * then a left join to the id universe so isolated vectors report 0.
    */
  def twoHop(spark: SparkSession, dir: String, k: Int = 3, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    val und = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct()
    val e = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val twoStep = e.as("a")
      .join(e.as("b"), col("a.v") === col("b.u"))
      .select(col("a.u").as("u"), col("b.v").as("w"))
      .where(col("u") =!= col("w"))
    val ball = e.select(col("u"), col("v").as("w")).union(twoStep)
      .distinct()
      .groupBy("u").agg(count(lit(1)).as("n_two_hop"))
    Tables.load(spark, dir, "embeddings").select(col("vec_id"))
      .join(ball.withColumnRenamed("u", "vec_id"), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), coalesce(col("n_two_hop"), lit(0L)).as("n_two_hop"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle SQL for [[twoHop]] — the same middle-node self-join over
    * the [[knnGraphOracleSql]] edge set.
    */
  def twoHopOracleSql(k: Int = 3, nTables: Int = 16, maxBits: Int = 12)
      : String =
    s"""WITH g AS (${knnGraphOracleSql(k, nTables, maxBits)}),
       |und AS (SELECT DISTINCT least(vec_id, nbr_id) AS u,
       |        greatest(vec_id, nbr_id) AS v FROM g),
       |e AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
       |ball AS (
       |  SELECT DISTINCT u, w FROM (
       |    SELECT u, v AS w FROM e
       |    UNION ALL
       |    SELECT a.u AS u, b.v AS w FROM e a JOIN e b ON a.v = b.u
       |      WHERE a.u <> b.v)),
       |cnt AS (SELECT u AS vec_id, count(*)::BIGINT AS n_two_hop
       |        FROM ball GROUP BY 1)
       |SELECT emb.vec_id, coalesce(n_two_hop, 0) AS n_two_hop
       |FROM embeddings emb LEFT JOIN cnt ON cnt.vec_id = emb.vec_id
       |ORDER BY emb.vec_id""".stripMargin

  /** §2.3 #212 — CLUSTER-vs-LABEL PURITY: for every multi-member
    * [[semanticClusters]] component, the share of members carrying the
    * cluster's dominant `label` — the acceptance metric that says whether
    * unsupervised semantic grouping recovers the known taxonomy before it
    * gates dedup/sampling decisions. Integer-exact: member and top-label
    * counts are integers, purity is one bigint/bigint double division,
    * rounded; the dominant label is a deterministic argmax (count desc,
    * label asc). Plan: one join of the cluster map to the label column,
    * one bounded (cluster × label) aggregate, windows over that bounded
    * frame only.
    */
  def clusterPurity(spark: SparkSession, dir: String, threshold: Double = 0.4,
      nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24,
      maxRounds: Int = 25): DataFrame = {
    val cl = semanticClustersCore(spark, dir, threshold, nBits, nTables, maxBits,
      maxRounds).select("vec_id", "cluster_id")
    val lab = Tables.load(spark, dir, "embeddings").select("vec_id", "label")
    val g = cl.join(lab, "vec_id")
      .groupBy("cluster_id", "label").agg(count(lit(1)).as("n"))
    val wRk = Window.partitionBy("cluster_id").orderBy(col("n").desc, col("label").asc)
    val wAll = Window.partitionBy("cluster_id")
    g.withColumn("rk", row_number().over(wRk))
      .withColumn("n_members", sum("n").over(wAll))
      .where(col("rk") === 1 && col("n_members") >= 2)
      .select(col("cluster_id"), col("n_members"), col("label").as("top_label"),
        col("n").as("n_top"), fl6(col("n") / col("n_members")).as("purity"))
      .orderBy("cluster_id")
  }

  /** DuckDB oracle SQL for [[clusterPurity]] — the same bounded argmax over
    * the [[semanticClusterOracleSql]] component map joined to labels.
    */
  def clusterPurityOracleSql(threshold: Double = 0.4, nTables: Int = 16,
      maxBits: Int = 12): String =
    s"""WITH c AS (SELECT vec_id, cluster_id
       |  FROM (${semanticClusterOracleSql(threshold, nTables, maxBits)})),
       |g AS (SELECT c.cluster_id, emb.label, count(*) AS n
       |      FROM c JOIN embeddings emb USING (vec_id) GROUP BY 1, 2),
       |r AS (SELECT cluster_id, label, n,
       |  row_number() OVER (PARTITION BY cluster_id ORDER BY n DESC, label) AS rk,
       |  CAST(sum(n) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members FROM g)
       |SELECT cluster_id, n_members, label AS top_label, n AS n_top,
       |  floor(n / n_members * 1e6 + 0.5) / 1e6 AS purity
       |FROM r WHERE rk = 1 AND n_members >= 2 ORDER BY cluster_id""".stripMargin

  /** §2.3 #213 — embedding COVARIANCE MATRIX (upper triangle): the d×d
    * second-moment statistics behind whitening, PCA initialization, and
    * drift monitoring of an embedding column. ONE distributed pass: each
    * vector explodes to its d(d+1)/2 upper-triangle products, map-side
    * partial aggregation collapses the shuffle to d² × partitions rows
    * (the blow-up never crosses the wire), and cov(i,j) =
    * E[xy] − E[x]E[y] is assembled from EXACT decimal sums of
    * deterministic per-row products — order-independent, engine-identical
    * up to the final fixed-order double expression, rounded.
    */
  def covMatrix(spark: SparkSession, dir: String): DataFrame =
    // A rounding/ordering projection over [[covCellsExact]] — the
    // fixed-point machinery exists exactly once so this query and
    // [[pcaPower]] can never desync. The display rounding is the
    // ENGINE-STABLE floor(x·1e6 + 0.5)/1e6 form: x is engine-identical
    // (pure IEEE arithmetic over exact decimal sums), ·1e6 and +0.5 are
    // IEEE ops on that identical double, and floor is exact in every
    // engine/version — unlike round(DOUBLE, 6), whose tie semantics
    // differ between Spark (shortest-decimal BigDecimal) and DuckDB
    // versions (binary-value rounding) and produced a driver-only hash
    // mismatch in r7.
    covCellsExact(spark, dir)
      .select(col("i"), col("j"), col("n"),
        (floor(col("cov") * lit(1e6) + lit(0.5)) / lit(1e6)).as("cov"))
      .orderBy("i", "j")

  /** UNROUNDED upper-triangle covariance cells — the shared frame under
    * [[covMatrix]] (which rounds for display) and [[pcaPower]] (which
    * iterates on the raw values).
    *
    * FIXED-POINT exactness at primitive-long speed: each product is
    * converted ONCE to an integer number of 1e-12 units via
    * floor(x·1e12 + 0.5) — one IEEE multiply, one IEEE add, one exact
    * floor; all three are bit-identical across engines AND engine
    * versions (unlike round(DOUBLE), whose tie handling drifted across
    * DuckDB releases) — and the hot aggregation sums those integers as
    * DECIMAL(38,0). Spark's Decimal addition stays on its compact-long
    * fast path while the running sum fits 18 digits and promotes to
    * BigDecimal only beyond — exact at ANY corpus size with no silent
    * long overflow, at a fraction of the cost of casting every double
    * through BigDecimal.setScale (the direct double->DECIMAL(38,12)
    * cast formulation was 4x slower: the per-row cast dominated).
    *
    * Upper-triangle products are generated INSIDE one row as a flat array
    * (i ascending, j=i..d−1), then exploded ONCE: d(d+1)/2 longs per row,
    * no second explode and no d-fold duplication of the vector payload —
    * the double-posexplode formulation shipped N·d intermediate rows each
    * carrying the whole array and ran 15× at 10× data (memory-bound);
    * this shape is a pure map-side explode into a partial aggregate.
    */
  private def covCellsExact(spark: SparkSession, dir: String): DataFrame = {
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    // The d(d+1)/2-products-per-row explode below is map-side work on the
    // embeddings scan (20M generated longs at sf0.1): spread the two-column
    // frame first (guide §2.5; no-op at scale).
    val base = Par.spread(embeddings(spark, dir).select(col("vec_id"), col("v")))
    val tri = base.select(posexplode(expr(
      "flatten(transform(v, (xi, i) -> " +
        "transform(slice(v, i + 1, size(v) - i), " +
        "xj -> CAST(floor(xi * xj * 1e12 + 0.5d) AS BIGINT))))"))
      .as(Seq("k", "f")))
    val d = base.select(size(col("v")).as("d")).limit(1).collect()(0).getInt(0)
    // flat index k = i·d − i(i−1)/2 + (j − i), inverted by a d(d+1)/2-row
    // broadcast mapping (bounded by the embedding dim, not the corpus)
    val mapping = {
      val rows = for (i <- 0 until d; j <- i until d)
        yield (i * d - i * (i - 1) / 2 + (j - i), i, j)
      import spark.implicits._
      rows.toDF("k", "i", "j")
    }
    val dims = base.select(posexplode(col("v")).as(Seq("i", "xi")))
      .select(col("i"), expr("CAST(floor(xi * 1e12 + 0.5d) AS BIGINT)").as("fx"))
      .groupBy("i")
      .agg((sum(col("fx").cast(dec0)).cast("double") / lit(1e12)).as("sx"),
        count(lit(1)).as("n_dim"))
    tri.groupBy("k")
      .agg((sum(col("f").cast(dec0)).cast("double") / lit(1e12)).as("sxy"),
        count(lit(1)).as("n"))
      .join(broadcast(mapping), "k")
      .join(broadcast(dims.select(col("i"), col("sx").as("sxa"),
        col("n_dim").as("na"))), "i")
      .join(broadcast(dims.select(col("i").as("j"), col("sx").as("sxb"),
        col("n_dim").as("nb"))), "j")
      .select(col("i"), col("j"), col("n"),
        (col("sxy") / col("n") -
          (col("sxa") / col("na")) * (col("sxb") / col("nb"))).as("cov"))
  }

  /** §2.3 #273 — dominant PRINCIPAL COMPONENT by power iteration: six
    * rounds of v' = C·v/‖C·v‖ on the exact covariance matrix, reporting
    * the dominant eigenvalue, its explained-variance share (λ/trace), and
    * the top-loading dimension — the "is this embedding space effectively
    * one-dimensional?" check (var_share near 1 means the cosine geometry
    * is degenerate and ANN recall numbers are misleading). Exactness is
    * the #130 iterative recipe on a BOUNDED d×d frame: every matrix-vector
    * contribution and every squared-norm term is decimal(38,18)-cast
    * before summation (order-free), the normalization divides once per
    * round on exact sums, so six rounds stay bit-identical cross-engine.
    * The only corpus-sized work is the one covariance pass (#213's
    * fixed-point machinery); the iteration itself touches d(d+1)/2 cells.
    */
  def pcaPower(spark: SparkSession, dir: String, iters: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 18)
    val cells = covCellsExact(spark, dir).select("i", "j", "cov")
      .localCheckpoint(true)
    val full = cells.union(cells.where(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("cov")))
      .localCheckpoint(true)
    val d = full.agg((max("i") + 1).cast("int")).collect()(0).getInt(0)
    var v = spark.range(d.toLong)
      .select(col("id").cast("int").as("j"),
        (lit(1.0) / sqrt(lit(d.toDouble))).as("v"))
    def multiply(vec: DataFrame): DataFrame = full
      .join(vec, "j")
      .select(col("i"), (col("cov") * col("v")).cast(dec).as("t"))
      .groupBy("i").agg(sum("t").cast("double").as("w"))
    for (_ <- 1 to iters) {
      val w = multiply(v)
      val norm = w.agg(
        sqrt(sum((col("w") * col("w")).cast(dec)).cast("double")).as("nrm"))
      v = w.crossJoin(broadcast(norm))
        .select(col("i").as("j"), (col("w") / col("nrm")).as("v"))
        .localCheckpoint(true)
    }
    val wf = multiply(v).localCheckpoint(true)
    val lam = wf.agg(
      sqrt(sum((col("w") * col("w")).cast(dec)).cast("double")).as("lambda"))
    val trace = cells.where(col("i") === col("j"))
      .agg(sum(col("cov").cast(dec)).cast("double").as("trace"))
    val top = v.select(max(struct(abs(col("v")).as("a"),
      (-col("j")).as("nj"))).as("m"))
      .select((-col("m.nj")).cast("long").as("top_dim"))
    // Engine-stable display rounding (see covMatrix): floor(x·1e6+0.5)/1e6
    // instead of round(DOUBLE, 6), whose tie semantics drift across
    // DuckDB versions.
    lam.crossJoin(broadcast(trace)).crossJoin(broadcast(top))
      .select(lit(d.toLong).as("d"),
        (floor(col("lambda") * lit(1e6) + lit(0.5)) / lit(1e6)).as("eigenvalue"),
        (floor(col("lambda") / col("trace") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("var_share"),
        col("top_dim"))
  }

  /** DuckDB oracle for [[pcaPower]]: the same fixed-point covariance cells
    * feed six unrolled decimal-summed power-iteration rounds.
    */
  def pcaPowerOracleSql(): String = {
    def rnd(prev: String, w: String, vn: String): String =
      s"""$w AS (
         |  SELECT f.i, CAST(CAST(sum(CAST(f.cov * pv.v AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS w
         |  FROM full_m f JOIN $prev pv ON pv.j = f.j GROUP BY 1),
         |${w}n AS (SELECT sqrt(CAST(CAST(sum(CAST(w * w AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)) AS nrm FROM $w),
         |$vn AS (SELECT i AS j, w / nrm AS v FROM $w, ${w}n)""".stripMargin
    s"""WITH ve AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |            FROM embeddings),
       |e AS (SELECT vec_id,
       |  CAST(unnest(generate_series(1, len(v))) AS INTEGER) - 1 AS i,
       |  unnest(v) AS x FROM ve),
       |p AS (SELECT a.i AS i, b.i AS j, a.x * b.x AS xy
       |      FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i),
       |dm AS (SELECT i, CAST(CAST(sum(CAST(floor(x * 1e12 + 0.5) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12 AS sx,
       |      count(*) AS n_dim FROM e GROUP BY 1),
       |c AS (SELECT i, j,
       |      CAST(CAST(sum(CAST(floor(xy * 1e12 + 0.5) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12 AS sxy,
       |      count(*) AS n FROM p GROUP BY 1, 2),
       |cells AS (
       |  SELECT c.i, c.j,
       |    c.sxy / c.n - (da.sx / da.n_dim) * (db.sx / db.n_dim) AS cov
       |  FROM c JOIN dm da ON da.i = c.i JOIN dm db ON db.i = c.j),
       |full_m AS (
       |  SELECT i, j, cov FROM cells
       |  UNION ALL
       |  SELECT j AS i, i AS j, cov FROM cells WHERE i <> j),
       |dd AS (SELECT CAST(max(i) + 1 AS INTEGER) AS d FROM full_m),
       |v0 AS (SELECT CAST(unnest(generate_series(1, d)) AS INTEGER) - 1 AS j,
       |       1.0 / sqrt(CAST(d AS DOUBLE)) AS v FROM dd),
       |${(1 to 6).map(r => rnd(s"v${r - 1}", s"w$r", s"v$r")).mkString(",\n")},
       |wf AS (
       |  SELECT f.i, CAST(CAST(sum(CAST(f.cov * v6.v AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS w
       |  FROM full_m f JOIN v6 ON v6.j = f.j GROUP BY 1),
       |lam AS (SELECT sqrt(CAST(CAST(sum(CAST(w * w AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)) AS lambda FROM wf),
       |tr AS (SELECT CAST(CAST(sum(CAST(cov AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS trace
       |       FROM cells WHERE i = j),
       |top AS (SELECT CAST(-(max(struct_pack(a := abs(v), nj := -j)).nj) AS BIGINT) AS top_dim
       |        FROM v6)
       |SELECT CAST(d AS BIGINT) AS d,
       |  floor(lambda * 1e6 + 0.5) / 1e6 AS eigenvalue,
       |  floor(lambda / trace * 1e6 + 0.5) / 1e6 AS var_share, top_dim
       |FROM dd, lam, tr, top""".stripMargin
  }

  /** §2.3 #302 — leave-one-out kNN LABEL AGREEMENT over the approximate
    * kNN graph: every vector's label predicted by the MAJORITY of its ≤k
    * graph neighbors (count desc, label asc tie-break) and compared to its
    * own — the standard "is this embedding space actually organized by the
    * taxonomy" evaluation (cluster purity #212 scores an unsupervised
    * grouping; this scores the METRIC itself, neighbor by neighbor).
    * Reported per true label, so a single collapsed class is visible
    * instead of averaged away. Cost on top of the materialized kNN edge
    * list (#112): two broadcast label joins and one bounded (vec, label)
    * vote rollup — O(k·N) rows end to end.
    */
  def knnClassify(spark: SparkSession, dir: String, k: Int = 3,
      nBits: Int = 0, nTables: Int = 16, maxBits: Int = 24): DataFrame = {
    val labels = Tables.load(spark, dir, "embeddings").select("vec_id", "label")
    val votes = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select("vec_id", "nbr_id")
      .join(labels.select(col("vec_id").as("nbr_id"),
        col("label").as("nbr_label")), "nbr_id")
      .groupBy("vec_id", "nbr_label").agg(count(lit(1)).as("c"))
    val pred = votes.groupBy("vec_id")
      .agg(max(struct(col("c"), (-col("nbr_label")).as("nl"))).as("best"))
      .select(col("vec_id"), (-col("best.nl")).as("predicted"))
    pred.join(labels, "vec_id")
      .groupBy(col("label").as("true_label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("predicted") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("true_label"), col("n_vecs"), col("n_correct"),
        (floor(col("n_correct").cast("double") / col("n_vecs").cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("accuracy"))
      .orderBy("true_label")
  }

  /** DuckDB oracle for [[knnClassify]]: the kNN-graph oracle as a nested
    * CTE, the identical majority vote and per-true-label rollup.
    */
  def knnClassifyOracleSql(k: Int = 3, nTables: Int = 16,
      maxBits: Int = 12): String =
    s"""WITH g AS (
       |${knnGraphOracleSql(k, nTables, maxBits)}
       |),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |votes AS (
       |  SELECT g.vec_id, nb.label AS nbr_label, count(*)::BIGINT AS c
       |  FROM g JOIN lab nb ON g.nbr_id = nb.vec_id
       |  GROUP BY 1, 2),
       |pred AS (
       |  SELECT vec_id, nbr_label AS predicted FROM (
       |    SELECT vec_id, nbr_label,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY c DESC, nbr_label ASC) AS rn
       |    FROM votes) t
       |  WHERE rn = 1)
       |SELECT lab.label AS true_label, count(*)::BIGINT AS n_vecs,
       |  sum(CASE WHEN pred.predicted = lab.label THEN 1 ELSE 0 END)::BIGINT
       |    AS n_correct,
       |  floor(CAST(sum(CASE WHEN pred.predicted = lab.label THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
       |    AS accuracy
       |FROM pred JOIN lab ON pred.vec_id = lab.vec_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** §2.3 #307 — LOCAL OUTLIER FACTOR over the approximate kNN graph
    * (Breunig et al. 2000): per vector, the ratio of its neighbors' local
    * reachability density to its own — LOF ≈ 1 for inliers, ≫ 1 for points
    * sparser than their neighborhood. The DENSITY-relative complement of
    * the global distance fences (#125 MAD, #236 IQR): a point can sit at a
    * modest absolute distance and still be the local oddball of a tight
    * cluster. Distances are cosine distances 1 − cos over the #112 edge
    * list, k-distance is each vector's max edge distance, reachability
    * reach(p←o) = max(kdist(o), dist(p,o)), lrd = n/Σreach, and
    * LOF = (Σ lrd(o))/n / lrd(p). All sums over the ≤k-row neighbor sets
    * run in DECIMAL(38,18) (order-free); divisions are guarded — a vector
    * whose whole neighborhood is exact duplicates (Σreach = 0, the stress
    * corpus's designed case) reports NULL rather than dividing by zero,
    * as does any vector with an undefined-lrd neighbor.
    *
    * Scale shape: everything after the kNN graph is O(k·N) — one
    * self-join of the edge list on nbr_id→vec_id to fetch neighbor
    * k-distances, one to fetch neighbor lrds; both shuffle on keys with N
    * distinct values. The edge list is localCheckpointed once.
    */
  def lof(spark: SparkSession, dir: String, k: Int = 3, nBits: Int = 0,
      nTables: Int = 16, maxBits: Int = 24,
      outlierCut: Double = 1.5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 18)
    val edges = knnGraphCore(spark, dir, k, nBits, nTables, maxBits)
      .select(col("vec_id"), col("nbr_id"),
        (lit(1.0) - col("cos")).as("dist"))
      .localCheckpoint(true)
    val kdist = edges.groupBy("vec_id")
      .agg(max("dist").as("kdist"), count(lit(1)).as("n_nbrs"))
      .localCheckpoint(true)
    val reach = edges
      .join(kdist.select(col("vec_id").as("nbr_id"),
        col("kdist").as("kdist_o")), "nbr_id")
      .select(col("vec_id"),
        greatest(col("kdist_o"), col("dist")).as("reach"))
    val lrd = reach.groupBy("vec_id")
      .agg(count(lit(1)).as("n"),
        sum(col("reach").cast(dec)).cast("double").as("sum_reach"))
      .select(col("vec_id"),
        when(col("sum_reach") > 0.0,
          col("n").cast("double") / col("sum_reach")).as("lrd"))
      .localCheckpoint(true)
    val nbrLrd = edges
      .join(lrd.select(col("vec_id").as("nbr_id"), col("lrd").as("lrd_o")),
        "nbr_id")
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n"), count(col("lrd_o")).as("n_def"),
        sum(col("lrd_o").cast(dec)).cast("double").as("sum_lrd"))
    val lofRaw = when(col("lrd").isNotNull && col("n_def") === col("n"),
      col("sum_lrd") / col("n").cast("double") / col("lrd"))
    nbrLrd.join(lrd, "vec_id").join(kdist.select("vec_id", "kdist", "n_nbrs"),
        "vec_id")
      .select(col("vec_id"), col("n_nbrs"),
        (floor(col("kdist") * lit(1e6) + lit(0.5)) / lit(1e6)).as("k_dist"),
        (floor(col("lrd") * lit(1e6) + lit(0.5)) / lit(1e6)).as("lrd"),
        (floor(lofRaw * lit(1e6) + lit(0.5)) / lit(1e6)).as("lof"),
        (lofRaw > outlierCut).as("is_outlier"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[lof]]: the kNN-graph oracle as a nested CTE, the
    * identical reachability/lrd/LOF chain with DECIMAL(38,18) sums and the
    * same NULL guards.
    */
  def lofOracleSql(k: Int = 3, nTables: Int = 16, maxBits: Int = 12,
      outlierCut: Double = 1.5): String =
    s"""WITH g AS (
       |${knnGraphOracleSql(k, nTables, maxBits)}
       |),
       |e AS (SELECT vec_id, nbr_id, 1.0 - cos AS dist FROM g),
       |kd AS (SELECT vec_id, max(dist) AS kdist,
       |  count(*)::BIGINT AS n_nbrs FROM e GROUP BY 1),
       |reach AS (
       |  SELECT e.vec_id,
       |    greatest(kdo.kdist, e.dist) AS reach
       |  FROM e JOIN kd kdo ON kdo.vec_id = e.nbr_id),
       |lrd AS (
       |  SELECT vec_id,
       |    CASE WHEN CAST(CAST(sum(CAST(reach AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) > 0.0
       |      THEN CAST(count(*) AS DOUBLE)
       |        / CAST(CAST(sum(CAST(reach AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
       |    END AS lrd
       |  FROM reach GROUP BY 1),
       |nl AS (
       |  SELECT e.vec_id, count(*)::BIGINT AS n,
       |    count(lo.lrd)::BIGINT AS n_def,
       |    CAST(CAST(sum(CAST(lo.lrd AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sum_lrd
       |  FROM e JOIN lrd lo ON lo.vec_id = e.nbr_id
       |  GROUP BY 1)
       |SELECT nl.vec_id, kd.n_nbrs,
       |  floor(kd.kdist * 1e6 + 0.5) / 1e6 AS k_dist,
       |  floor(lrd.lrd * 1e6 + 0.5) / 1e6 AS lrd,
       |  floor(CASE WHEN lrd.lrd IS NOT NULL AND nl.n_def = nl.n
       |      THEN nl.sum_lrd / CAST(nl.n AS DOUBLE) / lrd.lrd END
       |    * 1e6 + 0.5) / 1e6 AS lof,
       |  (CASE WHEN lrd.lrd IS NOT NULL AND nl.n_def = nl.n
       |      THEN nl.sum_lrd / CAST(nl.n AS DOUBLE) / lrd.lrd END)
       |    > $outlierCut AS is_outlier
       |FROM nl JOIN lrd ON nl.vec_id = lrd.vec_id
       |JOIN kd ON nl.vec_id = kd.vec_id
       |ORDER BY nl.vec_id""".stripMargin

  /** §2.3 #298 — per-DIMENSION variance profile of the embedding space:
    * mean, variance, and a dead-dimension flag per coordinate — the design
    * input for SQ/PQ compression (#179/#193: a near-zero-variance dim
    * wastes a quantizer bit and distorts codebook training) and the quick
    * "did the encoder collapse some dims" health check. One posexplode
    * pass with map-side partial aggregation to a d-row frame; means and
    * Σx² via the decimal-cast discipline, variance one fixed-order double
    * formula, the dead cut on the UNROUNDED variance (both engines compute
    * the identical double).
    */
  def dimVariance(spark: SparkSession, dir: String,
      deadEps: Double = 1e-4): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 12)
    embeddings(spark, dir)
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
      .select(col("i").as("dim_id"), col("n").as("n_vecs"),
        (floor((col("sx") / col("n").cast("double")) * lit(1e6) + lit(0.5)) /
          lit(1e6)).as("mean"),
        (floor((col("sxx") / col("n").cast("double") -
          (col("sx") / col("n").cast("double")) *
          (col("sx") / col("n").cast("double"))) * lit(1e6) + lit(0.5)) /
          lit(1e6)).as("variance"),
        ((col("sxx") / col("n").cast("double") -
          (col("sx") / col("n").cast("double")) *
          (col("sx") / col("n").cast("double"))) < deadEps).as("is_dead"))
      .orderBy("dim_id")
  }

  /** §2.3 #327 — PARTICIPATION RATIO of the embedding space: the
    * effective number of dimensions PR = (Σ_d v_d)²/Σ_d v_d² over the
    * per-dimension variances — the one-number answer to "how much of the
    * 64-dim space does the encoder actually use" (PR = d for isotropic
    * variance, PR → 1 under total collapse; the physics estimator of
    * effective dimensionality). #298 lists the per-dim profile; this is
    * its scalar summary, and pr/d is the utilization share a health
    * dashboard tracks release over release. One posexplode pass to the
    * d-row variance frame (the #298 machinery, unrounded), then the two
    * d-term sums ride DECIMAL(38,18) order-free; the ratio is one
    * fixed-order double.
    */
  def participationRatio(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 12)
    val dec18 = DecimalType(38, 18)
    val vars = embeddings(spark, dir)
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
      .select(
        (col("sxx") / col("n").cast("double") -
          (col("sx") / col("n").cast("double")) *
          (col("sx") / col("n").cast("double"))).as("v"))
    vars.agg(count(lit(1)).as("d"),
        sum(col("v").cast(dec18)).cast("double").as("sv"),
        sum((col("v") * col("v")).cast(dec18)).cast("double").as("svv"))
      .select(col("d"),
        (floor(col("sv") * col("sv") / col("svv") * lit(1e6) + lit(0.5)) /
          lit(1e6)).as("pr"),
        (floor(col("sv") * col("sv") / col("svv") / col("d").cast("double") *
          lit(1e6) + lit(0.5)) / lit(1e6)).as("pr_share"))
  }

  /** DuckDB oracle for [[participationRatio]]: the #298 oracle's variance
    * cells feed the identical two decimal-summed d-term sums.
    */
  def participationRatioOracleSql(dim: Int = 64): String =
    s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
       |cells AS (
       |  SELECT i, v[i] AS x FROM e
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS i)),
       |dv AS (
       |  SELECT i, count(*)::BIGINT AS n,
       |    CAST(CAST(sum(CAST(x AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sx,
       |    CAST(CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sxx
       |  FROM cells GROUP BY 1),
       |vv AS (
       |  SELECT sxx / CAST(n AS DOUBLE)
       |    - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) AS v
       |  FROM dv),
       |s AS (
       |  SELECT count(*)::BIGINT AS d,
       |    CAST(CAST(sum(CAST(v AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sv,
       |    CAST(CAST(sum(CAST(v * v AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS svv
       |  FROM vv)
       |SELECT d,
       |  floor(sv * sv / svv * 1e6 + 0.5) / 1e6 AS pr,
       |  floor(sv * sv / svv / CAST(d AS DOUBLE) * 1e6 + 0.5) / 1e6 AS pr_share
       |FROM s""".stripMargin

  /** DuckDB oracle for [[dimVariance]]: dimension spine, identical decimal
    * sums and fixed-order variance formula, dead cut on the raw double.
    */
  def dimVarianceOracleSql(dim: Int = 64, deadEps: Double = 1e-4): String =
    s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
       |dims AS (SELECT i FROM generate_series(1, $dim) AS t(i)),
       |cells AS (
       |  SELECT dims.i AS i, count(*)::BIGINT AS n,
       |    CAST(CAST(sum(CAST(v[dims.i] AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sx,
       |    CAST(CAST(sum(CAST(v[dims.i] * v[dims.i] AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sxx
       |  FROM e CROSS JOIN dims GROUP BY 1)
       |SELECT i - 1 AS dim_id, n AS n_vecs,
       |  floor((sx / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mean,
       |  floor((sxx / CAST(n AS DOUBLE)
       |    - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))) * 1e6 + 0.5)
       |    / 1e6 AS variance,
       |  (sxx / CAST(n AS DOUBLE)
       |    - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))) < $deadEps
       |    AS is_dead
       |FROM cells ORDER BY 1""".stripMargin
}
