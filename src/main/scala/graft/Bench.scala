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
  * One untimed warm-up pass runs first (set SPARK_GRAFT_WARMUP=0 to skip):
  * it absorbs one-time JIT/codegen/file-listing costs so the timed pass
  * measures steady-state operator cost, which is what extrapolates to a
  * long-running 100 TB job.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      val t0 = System.nanoTime()
      val timed =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      name -> timed
    }
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":" + v.map(s => f"$s%.3f").getOrElse("null")
    }.mkString("{", ",", "}")
    val total = results.values.flatten.sum
    val nFailed = results.values.count(_.isEmpty)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
