package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixScan
import graft.sources.Tables

/** The audit's single-partition-window detector must catch deliberately
  * planted regressions (the r8 failure mode: q_lateness's unpartitioned
  * window over raw events passed the audit's tag set) and must NOT flag
  * the PrefixScan carry or partitioned windows.
  */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {

  private def detect(df: org.apache.spark.sql.DataFrame): Seq[String] =
    PlanAudit.singlePartitionWindows(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan)

  test("planted regression: unpartitioned window over a raw scan is 'raw'") {
    val ev = Tables.load(spark, sf, "events")
    val w = Window.orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val planted = ev.withColumn("run", max("value").over(w))
    assert(detect(planted) == Seq("raw"))
  }

  test("planted regression: unpartitioned window over an aggregate is 'agg'") {
    val ev = Tables.load(spark, sf, "events")
    val hist = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val w = Window.orderBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assert(detect(hist.withColumn("cum", sum("n").over(w))) == Seq("agg"))
  }

  test("PrefixScan plans carry no un-recognized single-partition window") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("value").cast("long").as("v"))
    val scanned = PrefixScan.runningSum(ev, "event_id",
      Seq(col("event_id")), "v", "run")
    assert(detect(scanned).isEmpty)
  }

  test("a column merely NAMED __chunk does not buy the carry exemption") {
    // r9 ADVICE: the carry check must verify the exchange child is the
    // groupBy(__chunk) summary, not trust the order key's name.
    val ev = Tables.load(spark, sf, "events")
    val hist = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumnRenamed("event_type", "__chunk")
    val w = Window.orderBy("__chunk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assert(detect(hist.withColumn("cum", sum("n").over(w))) == Seq("agg"))
  }

  test("an unrecognized node between window and exchange is surfaced, not skipped") {
    import org.apache.spark.sql.execution.LocalLimitExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val ev = Tables.load(spark, sf, "events")
    val w = Window.orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val planted = ev.withColumn("run", max("value").over(w))
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan match {
      // transformUp cannot see inside the AQE leaf — unwrap first
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val wrapped = planted.transformUp {
      case e: ShuffleExchangeExec => LocalLimitExec(10, e)
    }
    assert(PlanAudit.singlePartitionWindows(wrapped) ==
      Seq("raw(via LocalLimitExec)"))
  }

  test("key-partitioned windows are not flagged") {
    val ev = Tables.load(spark, sf, "events")
    val w = Window.partitionBy("user_id").orderBy("ts")
    assert(detect(ev.withColumn("rn", row_number().over(w))).isEmpty)
  }
}
