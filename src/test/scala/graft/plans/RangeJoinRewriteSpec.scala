package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class RangeJoinRewriteSpec extends AnyFunSuite with SparkFixture {

  private def parts(): (DataFrame, DataFrame) = {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("us").as("c_us"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("us").as("v_us"))
    (c, v)
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.EnabledFlag, "true")
    try body
    finally {
      spark.conf.unset(RangeJoinRewrite.EnabledFlag)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
    }
  }

  private def withRuleNoFlag[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
  }

  test("pure range join rewrites to a bucketized equi-join, results identical") {
    def q(): DataFrame = {
      val (c, v) = parts()
      c.join(v, col("v_us") >= col("c_us") - 3600000000L && col("v_us") < col("c_us"))
        .select("click_id", "view_id")
    }
    val before = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.nonEmpty)
    // Without the rule there is no equi key: nested-loop over all pairs.
    val basePlan = q().queryExecution.executedPlan.toString
    assert(basePlan.contains("BroadcastNestedLoopJoin") ||
      basePlan.contains("CartesianProduct"), basePlan.take(600))
    withRule {
      val df = q()
      val after = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == before)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(1200))
      assert(plan.contains("Generate explode"), plan.take(1200))
    }
  }

  test("equi+range join keeps its key, gains the bucket key, results identical") {
    def q(): DataFrame = {
      val (c, v) = parts()
      c.join(v, col("c_user") === col("v_user") &&
          col("v_us") >= col("c_us") - 3600000000L && col("v_us") < col("c_us"))
        .select("click_id", "view_id")
    }
    val before = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val df = q()
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == before)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Generate explode"), plan.take(1200))
    }
  }

  test("the rule is a no-op when spark.graft.rangeJoinRewrite.enabled is unset") {
    def q(): DataFrame = {
      val (c, v) = parts()
      c.join(v, col("v_us") >= col("c_us") - 3600000000L && col("v_us") < col("c_us"))
        .select("click_id", "view_id")
    }
    withRuleNoFlag {
      // Installed via extraOptimizations but NOT enabled: the naive
      // nested-loop plan must survive untouched (conf-gated opt-in).
      val plan = q().queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"), plan.take(600))
      assert(!plan.contains("Generate explode"), plan.take(600))
    }
  }

  test("the rule leaves non-matching joins untouched") {
    val (c, v) = parts()
    def q(): DataFrame = c.join(v, col("c_user") === col("v_user"))
    // Canonicalized form normalizes expression ids, so two separately built
    // plans compare structurally.
    val basePlan = q().queryExecution.optimizedPlan.canonicalized.toString
    withRule {
      assert(q().queryExecution.optimizedPlan.canonicalized.toString == basePlan)
    }
  }
}
