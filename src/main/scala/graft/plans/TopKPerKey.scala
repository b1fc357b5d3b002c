package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftglue

/** Whole-operator extension demo: top-k rows per key as a FIRST-CLASS
  * physical operator (logical node → strategy → `SparkPlan`), the tier of
  * Spark extensibility below custom expressions and optimizer rules.
  *
  * Why bother when `row_number().over(window) <= k` works? The window
  * formulation SORTS AND MATERIALIZES every key's full partition before
  * discarding all but k rows — at 100 TB that is a full shuffle + full sort
  * of the fact table for a result bounded by k·|keys|. This operator
  * declares `ClusteredDistribution(keys)` (so Spark plans exactly one hash
  * exchange, same as the window) but then streams each partition once
  * through per-key BOUNDED HEAPS: memory is O(k·distinct-keys-per-
  * partition), no sort of the k+1-th..n-th rows ever happens, and spill
  * pressure disappears. It is `TakeOrderedAndProject`, generalized from
  * "one global top-N" to "top-N per key".
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] to [[TopKPerKeyExec]]; inject via
  * `spark.experimental.extraStrategies` (done by [[TopKPerKey.apply]]).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  // One hash exchange on the keys — inserted by EnsureRequirements exactly
  // like the window formulation's, but nothing downstream ever sorts the
  // full partition.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val kLimit = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions ({ iter: Iterator[InternalRow] =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // Ascending position in `sortOrder` = better rank. The max-heap's head
      // is therefore the WORST retained row — the eviction candidate.
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLimit) heap += row.copy()
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap += row.copy()
            }
          case None =>
            val heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            heap += row.copy()
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }
}

object TopKPerKey {

  /** Top `k` rows per `keyCols` group under `orderBy` ((column, ascending)
    * pairs — include a unique tie-break column for determinism). Injects
    * [[TopKStrategy]] into the session on first use.
    */
  def apply(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(_ eq TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    val ord = orderBy.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    graftglue.ofRows(spark, TopKPerKeyPlan(keyCols.map(attr), ord, k, lp))
  }
}
