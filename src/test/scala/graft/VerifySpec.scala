package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The driver gate's un-droppable contract (VERDICT r12 #1): a crashed or
  * vacuous query must not silently vanish from the correctness artifact.
  */
class VerifySpec extends AnyFunSuite with SparkFixture {

  private def tmpOut(): String =
    Files.createTempDirectory("graft_verify_spec").toString

  private val okQuery: (SparkSession, String) => DataFrame =
    (s, _) => s.range(5).toDF("id")

  test("reconcile flags a requested key the registry doesn't have") {
    val out = tmpOut()
    val report = Verify.run(spark, sf, out,
      Some(Set("q_ok", "q_dropped_key")),
      registry = Map("q_ok" -> okQuery))
    assert(report.missing == Seq("q_dropped_key"))
    assert(!report.ok)
    assert(new java.io.File(s"$out/q_ok").isDirectory)
    assert(!new java.io.File(s"$out/q_dropped_key").exists())
    val markers = Files.readString(java.nio.file.Paths.get(s"$out/_verify_markers.json"))
    assert(markers.contains("q_dropped_key"))
  }

  test("a query that always crashes is retried, removed, and reported missing") {
    val out = tmpOut()
    var calls = 0
    val crash: (SparkSession, String) => DataFrame = (_, _) => {
      calls += 1; throw new RuntimeException("synthetic crash")
    }
    val report = Verify.run(spark, sf, out, None,
      registry = Map("q_ok" -> okQuery, "q_crash" -> crash))
    assert(calls == 2, "crashing query must be retried exactly once")
    assert(report.missing == Seq("q_crash"))
    assert(report.retried.contains("q_crash"))
    // No half-written dir may satisfy the dir-exists reconcile.
    assert(!new java.io.File(s"$out/q_crash").exists())
    assert(new java.io.File(s"$out/q_ok").isDirectory)
  }

  test("a transient blank retries once and commits the non-empty rerun") {
    val out = tmpOut()
    var calls = 0
    val flaky: (SparkSession, String) => DataFrame = (s, _) => {
      calls += 1
      if (calls == 1) s.range(5).toDF("id").where("id < 0") else s.range(3).toDF("id")
    }
    val report = Verify.run(spark, sf, out, None,
      registry = Map("q_flaky" -> flaky))
    assert(report.ok)
    assert(report.retried == Seq("q_flaky"))
    assert(spark.read.parquet(s"$out/q_flaky").count() == 3)
  }

  test("a transient crash retries once and commits the rerun") {
    val out = tmpOut()
    var calls = 0
    val flaky: (SparkSession, String) => DataFrame = (s, _) => {
      calls += 1
      if (calls == 1) throw new RuntimeException("transient") else s.range(4).toDF("id")
    }
    val report = Verify.run(spark, sf, out, None,
      registry = Map("q_flaky" -> flaky))
    assert(report.ok)
    assert(report.retried == Seq("q_flaky"))
    assert(spark.read.parquet(s"$out/q_flaky").count() == 4)
  }

  test("clean run: no retries, no missing, markers empty") {
    val out = tmpOut()
    val report = Verify.run(spark, sf, out, None,
      registry = Map("q_a" -> okQuery, "q_b" -> okQuery))
    assert(report.ok && report.retried.isEmpty)
    val markers = Files.readString(java.nio.file.Paths.get(s"$out/_verify_markers.json"))
    assert(markers == """{"missing": [], "retried": []}""")
  }

  test("parallel run commits results identical to the serial run (r15 wall fix)") {
    // The thread pool only changes WHEN each query executes, never what it
    // writes: same registry through threads=1 and threads=4 must produce
    // the same per-query parquet contents and a clean report in both.
    val registry: Map[String, (SparkSession, String) => DataFrame] =
      (1 to 8).map { i =>
        s"q_par_$i" -> ((s: SparkSession, _: String) =>
          s.range(i * 10).toDF("id").selectExpr("id", s"id * $i as v"))
      }.toMap
    val outSer = tmpOut(); val outPar = tmpOut()
    val rSer = Verify.run(spark, sf, outSer, None, registry, threads = 1)
    val rPar = Verify.run(spark, sf, outPar, None, registry, threads = 4)
    assert(rSer.ok && rPar.ok)
    assert(rSer.retried.isEmpty && rPar.retried.isEmpty)
    registry.keys.foreach { k =>
      val a = spark.read.parquet(s"$outSer/$k").orderBy("id").collect().toSeq
      val b = spark.read.parquet(s"$outPar/$k").orderBy("id").collect().toSeq
      assert(a == b, s"$k differs between serial and parallel runs")
    }
  }

  test("--dump-oracles writes the full oracle map and exits cleanly (stress gate input)") {
    // Regression pin: the old `__dump_only__` subset sentinel started
    // FAILING when the reconcile hardening landed (an unknown requested
    // key now exits nonzero — correctly), which silently broke the stress
    // gate's oracle dump. The dump is its own mode now; it must cover
    // every oracle key and parse as JSON.
    val out = tmpOut()
    Verify.main(Array("--dump-oracles", out))
    val json = Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    val keyPat = "\"(q_|copy_)[a-z0-9_]+\":".r
    // Spot-parse: every oracleSql key appears exactly once as a JSON key.
    graft.SparkEntry.oracleSql.keys.foreach { k =>
      assert(json.contains("\"" + k + "\":"), s"dump missing oracle for $k")
    }
    assert(keyPat.findAllIn(json).size == graft.SparkEntry.oracleSql.size)
  }
}
