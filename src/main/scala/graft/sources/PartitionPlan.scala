package graft.sources

/** JDBC-style stride partition planner.
  *
  * The reference streams each table in batches over a single connection
  * (SqlBulkCopy); the Spark-native scale path is N parallel chunked reads,
  * exactly like `spark.read.jdbc(partitionColumn, lowerBound, upperBound,
  * numPartitions)`. This object is the pure planning half: given bounds on a
  * numeric key it emits WHERE-clause predicates whose union covers every row
  * exactly once (including rows outside [lower, upper) and NULL keys, which
  * land in the first partition — same contract as Spark's JDBCRelation).
  *
  * Pure and deterministic so it unit-tests without a SparkSession and so a
  * 1000-executor cluster plans identical chunks on every attempt.
  */
object PartitionPlan {

  /** Predicates for `numPartitions` disjoint, covering stride ranges.
    *
    * @param column        numeric key column name
    * @param lowerBound    inclusive lower bound used for stride sizing
    * @param upperBound    exclusive upper bound used for stride sizing
    * @param numPartitions requested parallelism (clamped to >= 1)
    */
  def stridePredicates(
      column: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): Seq[String] = {
    require(lowerBound <= upperBound,
      s"lowerBound $lowerBound must be <= upperBound $upperBound")
    val n0 = math.max(1, numPartitions)
    // Never produce empty strides: at most one partition per key value.
    val span = upperBound - lowerBound
    val n = if (span <= 0) 1 else math.min(n0.toLong, math.max(1L, span)).toInt
    if (n == 1) return Seq("1 = 1")
    val stride = span / n
    val remainder = span % n
    // Boundaries: first `remainder` strides get one extra key so the chunks
    // differ in size by at most 1 (Spark's JDBCRelation uses a double stride;
    // exact integer boundaries here avoid fp drift at 100 TB key ranges).
    val bounds = new Array[Long](n + 1)
    bounds(0) = lowerBound
    var i = 0
    while (i < n) {
      bounds(i + 1) = bounds(i) + stride + (if (i < remainder) 1L else 0L)
      i += 1
    }
    (0 until n).map { p =>
      if (p == 0) s"$column < ${bounds(1)} OR $column IS NULL"
      else if (p == n - 1) s"$column >= ${bounds(p)}"
      else s"$column >= ${bounds(p)} AND $column < ${bounds(p + 1)}"
    }
  }

  /** Predicates for data-driven (equi-depth) chunk boundaries: interior
    * boundary values come from the key's own quantiles, so a skewed key
    * distribution still yields near-equal chunk ROW counts — where uniform
    * strides over [min, max] would put most rows in a few middle chunks.
    * Same coverage contract as [[stridePredicates]]: disjoint, exhaustive,
    * NULLs and out-of-range keys land in the first chunk. Duplicate
    * boundaries (heavy single keys) collapse, so no chunk is ever empty by
    * construction.
    */
  def boundaryPredicates(column: String, boundaries: Seq[Long]): Seq[String] = {
    val bs = boundaries.distinct.sorted
    if (bs.isEmpty) return Seq("1 = 1")
    val n = bs.size + 1
    (0 until n).map { p =>
      if (p == 0) s"$column < ${bs(0)} OR $column IS NULL"
      else if (p == n - 1) s"$column >= ${bs(n - 2)}"
      else s"$column >= ${bs(p - 1)} AND $column < ${bs(p)}"
    }
  }
}
