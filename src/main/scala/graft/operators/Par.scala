package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism guards for map-heavy stages (guide §2.5 "input skew:
  * one huge unsplittable file … repartition immediately after the read",
  * §1.2 "the distributed algorithm first").
  *
  * Both helpers are SCALE-ADAPTIVE, not local-mode constants: at real
  * scale they are no-ops or replace an exchange the plan would have paid
  * anyway; locally they stop a single-split scan (every sf0.1 parquet
  * file is smaller than `spark.sql.files.openCostInBytes`, so every scan
  * is ONE split) from serializing CPU-bound work on one core.
  */
object Par {

  /** Round-robin repartition iff the frame has fewer partitions than the
    * cluster has slots — the [[Dedup]] `spread` discipline, shared. Call
    * it ONLY on scan-shaped frames (projections/filters of a file scan):
    * `df.rdd` on a post-shuffle AQE frame would materialize stages early.
    * At 100 TB a fact-table scan already has ≥ slots splits and this is
    * a no-op; locally it spends one tiny exchange of the pruned columns
    * to buy full-width parallelism for the expensive map work above it.
    */
  def spread(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }

  /** Hash-repartition by `keys` at the session's shuffle parallelism with
    * an EXPLICIT partition count. A plain key-join exchange at this spot
    * would be AQE-coalesced by BYTES — correct for IO-bound stages, wrong
    * for a stage that EXPANDS work per row (pair joins inside blocks,
    * per-pair edit distance): 1 MB of keys can be minutes of CPU, and
    * coalescing to one partition serializes it. The explicit count opts
    * this one exchange out of coalescing (REPARTITION_BY_NUM); the count
    * is the configured shuffle parallelism, so production values flow
    * from conf, never a local constant.
    */
  def spreadBy(df: DataFrame, keys: Column*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val target = scala.util.Try(n.toInt).toOption.getOrElse(slots).max(slots)
    df.repartition(target, keys: _*)
  }
}
