package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class GraftExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("the extensions hook injects the range-join rewrite alongside the SQL functions") {
    // A fresh extensions instance applied to a collector must register the
    // optimizer rule (session-build path; the running-session path is
    // covered by RangeJoinRewriteSpec via extraOptimizations).
    var injectedRule = false
    val probe = new org.apache.spark.sql.SparkSessionExtensions {
      override def injectOptimizerRule(
          builder: org.apache.spark.sql.SparkSession =>
            org.apache.spark.sql.catalyst.rules.Rule[
              org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
        injectedRule = builder(spark) eq RangeJoinRewrite
        super.injectOptimizerRule(builder)
      }
    }
    new GraftExtensions().apply(probe)
    assert(injectedRule, "GraftExtensions must inject RangeJoinRewrite")
  }

  test("registered SQL functions compute the same values as the kernels") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT dot_product(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 32.0)
    // simhash of a single hash is that hash's own bit pattern (every bit's
    // majority vote is the bit itself).
    val fp = spark.sql("SELECT simhash64(array(CAST(5 AS BIGINT))) AS fp")
      .collect()(0).getLong(0)
    assert(fp == 5L)
    // Ties (equal +/- votes) resolve to 0.
    val tie = spark.sql(
      "SELECT simhash64(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS fp")
      .collect()(0).getLong(0)
    assert(tie == 0L)
  }

  test("SQL word_ngrams matches the kernel: distinct, ordered, literal-n only") {
    GraftExtensions.register(spark)
    val grams = spark.sql(
      "SELECT word_ngrams(array('a', 'b', 'a', 'b', 'c'), 2) AS g")
      .collect()(0).getSeq[String](0)
    // 'a b' appears twice but is emitted once, in first-seen order
    assert(grams == Seq("a b", "b a", "b c"))
    // shorter than n -> empty, never null
    val short = spark.sql("SELECT word_ngrams(array('a'), 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(short.isEmpty)
    // non-literal n is rejected at analysis (the width compiles into codegen)
    val err = intercept[Exception] {
      spark.sql("SELECT word_ngrams(array('a','b'), CAST(rand()*2 AS INT)) AS g")
        .collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("SQL token_simhash64 over the documents pipeline matches the operator") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      """SELECT doc_id, token_simhash64(split(trim(text), ' ')) AS fp
        |FROM docs_v ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaOperator = graft.operators.Dedup.simhashFingerprints(spark, sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaOperator)
  }
}
