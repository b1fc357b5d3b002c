package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query job/stage profile — the r15 optimization round's "where do the
  * seconds go" tool (guide §1.1: decide whether time is shuffle, compute, or
  * scheduling BEFORE touching code). Runs each named query once untimed
  * (JIT/codegen warm), then once instrumented, and prints per job: wall ms,
  * stage count, task count, shuffle read/write bytes. Sum of job walls ≈ the
  * bench pass; the gap is driver-side planning.
  *
  * Usage: runMain graft.JobProf <sfDir> <q_a,q_b,...>
  */
object JobProf {
  private final class L extends SparkListener {
    case class Job(id: Int, start: Long, var end: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0,
        var shufRead: Long = 0L, var shufWrite: Long = 0L,
        var inBytes: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    private val stageToJob = mutable.Map.empty[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      jobs(e.jobId) = Job(e.jobId, e.time)
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      jobs(e.jobId).stages += e.stageIds.size
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val si = e.stageInfo
      stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
        j.tasks += si.numTasks
        j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        j.inBytes += si.taskMetrics.inputMetrics.bytesRead
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProf <sfDir> <q_a,q_b,...>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(1).split(",").foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[jobprof] unknown query: $name")
        case Some(fn) =>
          // warm pass (JIT, codegen, file listing)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          val l = new L
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e6
          Thread.sleep(300) // let the listener bus drain
          spark.sparkContext.removeSparkListener(l)
          val jobSum = l.jobs.values.map(j => j.end - j.start).sum
          println(f"== $name  wall=${wall}%.0fms  jobs=${l.jobs.size}  jobSum=${jobSum}ms  planGap=${wall - jobSum}%.0fms")
          l.jobs.values.foreach { j =>
            println(f"   job ${j.id}%3d  ${j.end - j.start}%6dms  stages=${j.stages}%2d tasks=${j.tasks}%4d  in=${j.inBytes / 1024}%7dK shufR=${j.shufRead / 1024}%7dK shufW=${j.shufWrite / 1024}%7dK")
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
