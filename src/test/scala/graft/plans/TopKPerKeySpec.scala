package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class TopKPerKeySpec extends AnyFunSuite with SparkFixture {

  private def orders =
    Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))

  private def run(k: Int) =
    TopKPerKey(orders, Seq("o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), k)

  test("TopKPerKeyExec equals the window formulation exactly") {
    val got = run(5)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5).drop("rn")
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("the custom exec replaces window+sort with heaps after one key exchange") {
    val plan = run(5).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), plan.take(800))
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"), plan.take(800))
    // No Window operator and no full-partition Sort feed the heaps.
    assert(!plan.contains("Window ["), plan.take(800))
    assert(!plan.contains("Sort ["), plan.take(800))
  }

  test("k larger than any group degenerates to the full input") {
    val n = orders.count()
    assert(run(1000000).count() == n)
  }
}
