package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.{PartitionPlan, Tables}

/** The reference's core surface: copy tables from a source catalog to a
  * destination, with schema replication, include/exclude set filtering, and
  * truncate/append write modes. Re-expressed Spark-first: a copy is a
  * distributed `read -> write` job (no driver materialization, no row ever
  * passes through the driver), so the same code moves 5 rows or 100 TB — the
  * cluster's write parallelism is the "bulk copy" batch parallelism.
  */
object TableCopy {

  /** Write-mode semantics mirroring the reference's switches:
    * Truncate = drop existing rows then load (SaveMode.Overwrite),
    * Append = add rows to whatever is there (SaveMode.Append).
    */
  sealed trait Mode { def saveMode: SaveMode }
  case object Truncate extends Mode { def saveMode: SaveMode = SaveMode.Overwrite }
  case object Append extends Mode { def saveMode: SaveMode = SaveMode.Append }

  /** Copy one table. Returns the row count at the destination after the
    * write. Fully distributed: source partitions map to write tasks 1:1; at
    * 100 TB the only tuning knob is target file size via
    * `spark.sql.files.maxPartitionBytes` on the read side.
    *
    * @param columns   optional column subset to replicate (empty = all)
    * @param predicate optional SQL predicate for incremental copies
    *                  (e.g. "o_orderdate >= '2024-01-01'") — pushed to the
    *                  source scan, so only matching row groups are read
    * @param maxRecordsPerFile optional cap on rows per output file — the
    *                  batch-size analogue of the reference's bulk-copy
    *                  BatchSize; at 100 TB this bounds individual file sizes
    *                  so downstream scans split evenly
    */
  def copyTable(
      spark: SparkSession,
      srcDir: String,
      destDir: String,
      table: String,
      mode: Mode = Truncate,
      columns: Seq[String] = Seq.empty,
      predicate: Option[String] = None,
      maxRecordsPerFile: Option[Long] = None): Long = {
    var df = Tables.load(spark, srcDir, table)
    predicate.foreach(p => df = df.where(p))
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    var writer = df.write.mode(mode.saveMode)
    maxRecordsPerFile.foreach(n => writer = writer.option("maxRecordsPerFile", n))
    writer.parquet(Tables.path(destDir, table))
    spark.read.parquet(Tables.path(destDir, table)).count()
  }

  /** Copy a filtered set of tables (the reference's include/exclude loop) and
    * return a manifest DataFrame (table_name, n_rows) for auditing.
    *
    * `parallelism > 1` mirrors the reference's -Parallel switch: independent
    * tables are submitted as concurrent Spark jobs from a thread pool. The
    * scheduler interleaves their stages, which keeps the cluster busy when
    * individual tables are too small to use every executor — the right model
    * for a catalog with many small-to-medium tables. A single 100 TB table
    * already saturates the cluster on its own, so parallelism defaults to 1.
    */
  def copyTables(
      spark: SparkSession,
      srcDir: String,
      destDir: String,
      include: Seq[String] = Seq.empty,
      exclude: Seq[String] = Seq.empty,
      mode: Mode = Truncate,
      parallelism: Int = 1): DataFrame = {
    val names = Tables.list(spark, srcDir)
      .filter(n => include.isEmpty || include.contains(n))
      .filterNot(exclude.contains)
    val manifest: Seq[(String, Long)] =
      if (parallelism <= 1) {
        names.map(t => (t, copyTable(spark, srcDir, destDir, t, mode)))
      } else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try {
          val futures = names.map(t =>
            Future(t -> copyTable(spark, srcDir, destDir, t, mode)))
          Await.result(Future.sequence(futures), Duration.Inf)
        } finally pool.shutdown()
      }
    import spark.implicits._
    manifest.toDF("table_name", "n_rows").orderBy("table_name")
  }

  /** Canonical type name for the schema manifest (engine-neutral spelling so
    * the manifest is comparable across runtimes).
    */
  private[graft] def canonicalType(dt: org.apache.spark.sql.types.DataType): String =
    dt.sql.toLowerCase

  /** Schema replication as data: for each table, one row per column with its
    * ordinal and canonical type — the Spark-native analogue of the reference
    * scripting the source DDL onto the destination before the copy. (Parquet
    * is self-describing, so replicating the schema *object* is the write
    * itself; this manifest is the auditable DDL record.)
    */
  def schemaManifest(spark: SparkSession, srcDir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = tables.sorted.flatMap { t =>
      val schema: StructType = Tables.load(spark, srcDir, t).schema
      schema.fields.zipWithIndex.map { case (f, i) =>
        (t, i + 1, f.name, canonicalType(f.dataType))
      }
    }
    rows.toDF("table_name", "ordinal", "column_name", "data_type")
      .orderBy("table_name", "ordinal")
  }

  /** JDBC-style partitioned parallel read: split a table on a numeric key into
    * stride predicates and read the chunks as one union. Bounds come from one
    * tiny min/max aggregate (the same round-trip `spark.read.jdbc` does).
    * The union of disjoint filters re-assembles the table exactly; Catalyst
    * pushes each stride predicate down to the scan.
    */
  def partitionedRead(
      spark: SparkSession,
      srcDir: String,
      table: String,
      column: String,
      numPartitions: Int): DataFrame = {
    val df = Tables.load(spark, srcDir, table)
    val Array(lo, hi) = df.agg(min(col(column)), max(col(column)))
      .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
    val preds = PartitionPlan.stridePredicates(column, lo, hi + 1, numPartitions)
    preds.map(p => df.where(p)).reduce(_ unionAll _)
  }
}
