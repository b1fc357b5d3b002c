package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Honesty rules (VERDICT r1): a failed query is recorded as null (never a
  * fake elapsed time), and timing forces full materialization through a
  * noop-format write — `count()` would let Spark skip column decode and
  * under-report scan/compute cost.
  *
  * Stability rules (VERDICT r2): one untimed warm-up pass absorbs one-time
  * JIT/codegen/file-listing costs, then each query is timed over
  * SPARK_GRAFT_PASSES (default 3) passes and the MEDIAN is reported — a
  * single pass was ±30% noisy, which made regressions unattributable. If a
  * BENCH_r02.json sits next to the repo the per-query delta vs that baseline
  * is printed to stderr so drift is visible at a glance.
  */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
      }
    }
    val results: Map[String, Option[Double]] = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to passes).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      // Any failed pass marks the query failed: a median over survivors
      // would hide flakiness.
      name -> (if (times.size == passes) Some(median(times)) else None)
    }
    // Per-query drift vs the round-2 driver baseline, if present (stderr —
    // stdout stays a single parseable JSON line).
    val baselineFile = new java.io.File("BENCH_r02.json")
    if (baselineFile.exists()) {
      val txt = scala.io.Source.fromFile(baselineFile).mkString
      val entry = """"([a-z0-9_]+)":([0-9.]+)""".r
      val base = entry.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
      results.toSeq.sortBy(_._1).foreach { case (name, t) =>
        (t, base.get(name)) match {
          case (Some(now), Some(then_)) =>
            System.err.println(f"[bench] $name%-22s $now%7.3fs  r02=$then_%7.3fs  ${(now / then_ - 1) * 100}%+6.1f%%")
          case _ => ()
        }
      }
    }
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":" + v.map(s => f"$s%.3f").getOrElse("null")
    }.mkString("{", ",", "}")
    val total = results.values.flatten.sum
    val nFailed = results.values.count(_.isEmpty)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$nFailed,"passes":$passes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
