package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened per VERDICT r12 #1 (the silent-dropout class): a per-query
  * exception used to vanish to stderr with exit 0 — the query simply had
  * no result dir and dropped out of the round's correctness artifact —
  * and an empty DataFrame committed as a 0-row parquet with no vacuity
  * check. Now every query retries once on failure OR on an empty first
  * result (transient pressure, the r12 trigger), the requested key set is
  * reconciled against produced result dirs after the loop (the
  * tools/stress.sh:53-61 discipline, ported), markers are written to
  * `_verify_markers.json`, and any requested-but-missing key exits
  * nonzero.
  */
object Verify {

  /** Outcome of one [[run]]: keys that produced no result dir (failed
    * twice, or were requested but aren't in the registry) and keys whose
    * first pass was empty/crashed and were retried (the retry may have
    * succeeded — `missing` is the hard-failure set).
    */
  private[graft] case class Report(missing: Seq[String], retried: Seq[String]) {
    def ok: Boolean = missing.isEmpty
  }

  /** Runs each requested query, writes `outDir/<name>` parquet, reconciles
    * requested-vs-produced. Registry is injectable so VerifySpec can prove
    * the reconcile/retry behavior on synthetic queries.
    */
  private[graft] def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Set[String]],
      registry: Map[String, (SparkSession, String) => DataFrame] =
        SparkEntry.queries,
      threads: Int =
        sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt): Report = {
    new java.io.File(outDir).mkdirs()
    val requested: Seq[String] = only match {
      // Preserve unknown names: a typo'd/dropped key must fail the
      // reconcile, not silently shrink the request (subset-mode erosion).
      case Some(names) => names.toSeq.sorted
      case None => registry.keys.toSeq.sorted
    }
    val retried = scala.collection.mutable.ArrayBuffer.empty[String]

    def writeOnce(name: String,
        fn: (SparkSession, String) => DataFrame): Long = {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      // Footer-only row count: cheap next to the query, and the vacuity
      // signal the r12 q_rolling_z dropout needed.
      spark.read.parquet(s"$outDir/$name").count()
    }

    def processOne(name: String): Unit = {
      registry.get(name) match {
        case None =>
          System.err.println(s"[verify] $name: requested but not in registry")
        case Some(fn) =>
          val first: Either[Throwable, Long] =
            try Right(writeOnce(name, fn))
            catch { case e: Throwable => Left(e) }
          first match {
            case Right(n) if n > 0 => // committed, non-vacuous
            case other =>
              val why = other.fold(e => s"failed: ${e.getMessage}",
                _ => "returned 0 rows")
              System.err.println(s"[verify] $name $why — retrying once")
              retried.synchronized { retried += name }
              try {
                val n2 = writeOnce(name, fn)
                if (n2 == 0)
                  System.err.println(s"[verify] $name: empty after retry " +
                    "(committed; legitimate-empty or persistent vacuity — " +
                    "the oracle compare decides)")
              } catch { case e2: Throwable =>
                System.err.println(s"[verify] $name failed twice: ${e2.getMessage}")
                // A half-written dir from the crashed write would satisfy
                // the dir-exists reconcile — remove it so the key counts
                // as missing, not as a committed result.
                deleteRecursively(new java.io.File(s"$outDir/$name"))
              }
          }
      }
    }

    // Independent queries overlap inside ONE session (guide §2.6: actions
    // are only sequential because the driver calls them sequentially) —
    // the serial loop left local[N] mostly idle between the many sub-second
    // queries' jobs, and the r14 round died of driver-budget walls, not of
    // any one query. Each query's result is written to its own directory
    // by the same deterministic plan as before, so the artifact is
    // byte-identical to the serial run's; only the wall changes. The
    // Derby-backed family stays serialized on the submitting thread (one
    // embedded engine per JVM; its lock manager and db lifecycle are the
    // one piece of cross-query shared state), overlapped with the pool.
    val derbyBound = (n: String) =>
      n.contains("jdbc") || n == "copy_fk_ordered" || n == "copy_whatif"
    if (threads <= 1) requested.foreach(processOne)
    else {
      val (serialQ, parQ) = requested.partition(derbyBound)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val futures = parQ.map { n =>
        pool.submit(new Runnable { def run(): Unit = processOne(n) })
      }
      serialQ.foreach(processOne)
      futures.foreach { f =>
        try f.get()
        catch { case e: Throwable =>
          System.err.println(s"[verify] pool task: ${e.getMessage}")
        }
      }
      pool.shutdown()
    }

    val missing = requested.filterNot(n =>
      new java.io.File(s"$outDir/$n").isDirectory)
    missing.foreach(n =>
      System.err.println(s"[verify] RECONCILE: requested but no result dir: $n"))
    val report = Report(missing, retried.toSeq)
    Files.writeString(Paths.get(s"$outDir/_verify_markers.json"),
      s"""{"missing": ${jsonArr(report.missing)}, "retried": ${jsonArr(report.retried)}}""")
    report
  }

  private def jsonArr(xs: Seq[String]): String =
    xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")

  /** The oracle map as one JSON object. String escape covers backslash,
    * quote, and ALL control chars (<0x20) — a tab or CR in builder-authored
    * SQL would otherwise make the driver's json.load fail and silently
    * zero the round's correctness.
    */
  private def oracleJson(): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--list")) {
      // Key inventory for tools/reconcile.sh — no Spark needed.
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    if (args.headOption.contains("--dump-oracles")) {
      // oracle_sql.json only, no queries and no Spark — the stress gate's
      // per-mode selection input. Replaces the old `__dump_only__` subset
      // sentinel, which the r12 reconcile hardening correctly turned into
      // a requested-but-missing failure (an unknown key must never again
      // pass silently, so the dump needed its own explicit mode).
      if (args.length < 2) {
        System.err.println("usage: graft.Verify --dump-oracles <outDir>")
        sys.exit(2)
      }
      val outDir = args(1)
      new java.io.File(outDir).mkdirs()
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson())
      return
    }
    if (args.length < 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [keys,...] " +
        "| --list | --dump-oracles <outDir>")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated subset of query names (dev loop).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = run(spark, sfDir, outDir, only)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson())
    spark.stop()
    if (!report.ok) {
      System.err.println(s"[verify] FAILED: ${report.missing.size} requested " +
        s"key(s) produced no result: ${report.missing.mkString(", ")}")
      sys.exit(1)
    }
  }
}
