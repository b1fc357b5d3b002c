package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the r14
  * optimization-round evidence trail (`plans/r14/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> q_a,q_b,...
  * Writes `<outDir>/<name>_<suffix>.txt` per query. Same session shape as
  * Bench (UTC, shuffle.partitions = cpus) so the dumped plan is the plan
  * the bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <q_a,q_b,...>")
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.split(",").foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
          try w.println(txt) finally w.close()
          System.err.println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
