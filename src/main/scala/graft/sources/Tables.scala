package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over a directory of parquet tables.
  *
  * Stands in for the reference's source-database catalog (the reference
  * enumerates SQL Server tables before copying them); here a "database" is a
  * directory and a "table" is `<dir>/<name>.parquet`. At 100 TB each table is
  * a multi-file parquet dataset — `spark.read.parquet` handles splits,
  * partition discovery, and schema merge identically, so nothing in this
  * catalog changes with scale.
  */
object Tables {
  /** All tables the driver's test data ships. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Load one table as a DataFrame (lazy — no job runs until an action).
    *
    * `events.ts` has shipped in two physical shapes across driver testdata
    * generations, and both normalize to a session-TZ (UTC) TIMESTAMP here so
    * every operator sees one type:
    *   - TIMESTAMP(NANOS): Spark's reader rejects it outright;
    *     `spark.sql.legacy.parquet.nanosAsLong` maps it to a raw
    *     nanos-since-epoch long, converted via floor division to micros —
    *     the same truncation DuckDB applies reading the file.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark infers
    *     TIMESTAMP_NTZ; under the UTC session timezone a cast to TIMESTAMP
    *     preserves the instant bit-for-bit, matching DuckDB's naive read.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The NTZ->TIMESTAMP cast below is instant-preserving ONLY under a UTC
      // session timezone; a non-UTC session would silently shift events.ts
      // relative to the DuckDB oracle. Every graft entrypoint sets UTC in its
      // builder — enforce the invariant here instead of assuming it.
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
        s"Tables.load(events) requires spark.sql.session.timeZone=UTC (got $tz): " +
          "the TIMESTAMP_NTZ->TIMESTAMP normalization is only instant-preserving under UTC")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path(dir, name))
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(path(dir, name))
  }

  /** Enumerate table names in a source directory, like the reference
    * enumerates `$sourceDb.Tables`. Falls back to [[all]] filtered by
    * existence so it works on any subset directory.
    */
  def list(spark: SparkSession, dir: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .toSeq.sorted
  }
}
