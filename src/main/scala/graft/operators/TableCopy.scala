package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{PartitionPlan, Tables}

/** The reference's core surface: copy tables from a source catalog to a
  * destination, with schema replication, include/exclude set filtering, and
  * truncate/recreate/append write modes. Re-expressed Spark-first: a copy is
  * a distributed `read -> write` job (no driver materialization, no row ever
  * passes through the driver), so the same code moves 5 rows or 100 TB — the
  * cluster's write parallelism is the "bulk copy" batch parallelism.
  *
  * Source/destination are [[TableCopy.Store]]s: a parquet directory (the
  * default test catalog) or a real JDBC database. The JDBC path is the
  * reference's literal surface (SQL Server -> SQL Server): reads use
  * [[graft.sources.PartitionPlan]] stride predicates as genuine
  * `spark.read.jdbc(url, table, predicates, ...)` parallel chunks, and writes
  * use the JDBC batch writer with per-table DDL from [[schemaManifest]]'s
  * type mapping (`createTableColumnTypes`).
  */
object TableCopy {

  /** Write-mode semantics mirroring the reference's switches.
    *  - Truncate: drop existing ROWS, keep the table/DDL, then load. On JDBC
    *    this is `TRUNCATE TABLE` + insert (Overwrite with truncate=true); on
    *    parquet it is an overwrite of the directory contents.
    *  - Recreate: drop the TABLE itself (DDL included) and re-create from the
    *    source schema, then load. Distinct from Truncate only on destinations
    *    that carry DDL (JDBC); parquet is self-describing so both collapse to
    *    a directory overwrite.
    *  - Append: add rows to whatever is there.
    */
  sealed trait Mode { def saveMode: SaveMode }
  case object Truncate extends Mode { def saveMode: SaveMode = SaveMode.Overwrite }
  case object Recreate extends Mode { def saveMode: SaveMode = SaveMode.Overwrite }
  case object Append extends Mode { def saveMode: SaveMode = SaveMode.Append }

  /** A table endpoint: somewhere tables can be enumerated, read, written. */
  sealed trait Store {
    def read(spark: SparkSession, table: String): DataFrame
    def write(df: DataFrame, table: String, mode: Mode): Unit
    def list(spark: SparkSession): Seq[String]
  }

  /** Directory-of-parquet catalog (the driver's test data layout). */
  final case class ParquetStore(dir: String) extends Store {
    def read(spark: SparkSession, table: String): DataFrame =
      Tables.load(spark, dir, table)
    def write(df: DataFrame, table: String, mode: Mode): Unit =
      df.write.mode(mode.saveMode).parquet(Tables.path(dir, table))
    def list(spark: SparkSession): Seq[String] = Tables.list(spark, dir)
  }

  /** Directory of delimited/semi-structured files (csv, json, parquet, orc —
    * any DataSource V2 file format). Self-describing formats carry their
    * schema; csv/json readers take an explicit `schema` (the schema-
    * replication manifest provides it when copying), falling back to
    * inference. CSV writes/reads include a header so the column order is
    * auditable.
    */
  final case class FileStore(
      dir: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      schema: Option[StructType] = None) extends Store {

    private def path(table: String): String = s"$dir/$table.$format"

    def read(spark: SparkSession, table: String): DataFrame = {
      var r = spark.read.format(format).options(options)
      if (format == "csv") r = r.option("header", "true")
      schema match {
        case Some(s) => r = r.schema(s)
        case None if format == "csv" => r = r.option("inferSchema", "true")
        case None => ()
      }
      r.load(path(table))
    }

    def write(df: DataFrame, table: String, mode: Mode): Unit = {
      var w = df.write.format(format).options(options).mode(mode.saveMode)
      if (format == "csv") w = w.option("header", "true")
      w.save(path(table))
    }

    def list(spark: SparkSession): Seq[String] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.endsWith(s".$format"))
        .map(_.stripSuffix(s".$format"))
        .toSeq.sorted
    }
  }

  /** A JDBC database endpoint. Tested against embedded Derby (the JDBC
    * driver that ships with Spark); the options map carries anything the
    * target needs (user/password/driver/isolationLevel...).
    *
    * Reads are parallel when `partitionColumn` is set: bounds come from one
    * min/max round-trip and the stride predicates are passed to
    * `spark.read.jdbc(url, table, predicates, ...)` — each executor task
    * issues its own bounded WHERE-clause query, the JDBC analogue of reading
    * one parquet row-group range per task.
    */
  final case class JdbcStore(
      url: String,
      options: Map[String, String] = Map.empty,
      numPartitions: Int = 1,
      partitionColumn: Option[String] = None) extends Store {

    private def props: java.util.Properties = {
      val p = new java.util.Properties()
      options.foreach { case (k, v) => p.setProperty(k, v) }
      p
    }

    def read(spark: SparkSession, table: String): DataFrame =
      partitionColumn match {
        case Some(c) if numPartitions > 1 =>
          val bounds = spark.read.jdbc(url, table, props)
            .agg(min(col(c)).cast("long"), max(col(c)).cast("long")).collect()(0)
          if (bounds.isNullAt(0)) spark.read.jdbc(url, table, props)
          else {
            // Quote the identifier: Spark's JDBC writer creates columns
            // case-sensitively, so a bare name would be upcased by the DB.
            val preds = PartitionPlan.stridePredicates(
              "\"" + c + "\"", bounds.getLong(0), bounds.getLong(1) + 1, numPartitions)
            spark.read.jdbc(url, table, preds.toArray, props)
          }
        case _ => spark.read.jdbc(url, table, props)
      }

    def write(df: DataFrame, table: String, mode: Mode): Unit = {
      var w = df.write.mode(mode.saveMode)
        .option("createTableColumnTypes", columnTypesDdl(df.schema))
        // Default batch size (1000) round-trips the executor→DB pipe far too
        // often for bulk loads; 10k per batch is the SqlBulkCopy-style
        // setting (store options can still override).
        .option("batchsize", "10000")
      options.foreach { case (k, v) => w = w.option(k, v) }
      // Truncate keeps the destination DDL (TRUNCATE + load); Recreate
      // drops and re-creates the table (Spark's default overwrite path).
      if (mode == Truncate) w = w.option("truncate", "true")
      w.jdbc(url, table, props)
    }

    def list(spark: SparkSession): Seq[String] = {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
        val names = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) names += rs.getString("TABLE_NAME")
        names.toSeq.sorted
      } finally conn.close()
    }
  }

  /** Copy one table between stores. Returns the row count at the destination
    * after the write. Fully distributed: source partitions map to write tasks
    * 1:1; at 100 TB the only tuning knobs are scan split size on the read
    * side and `maxRecordsPerFile` / JDBC batch size on the write side.
    *
    * @param columns   optional column subset to replicate (empty = all)
    * @param predicate optional SQL predicate for incremental copies
    *                  (e.g. "o_orderdate >= '2024-01-01'") — pushed to the
    *                  source scan (parquet row-group skip / JDBC WHERE)
    */
  def copy(
      spark: SparkSession,
      src: Store,
      dest: Store,
      table: String,
      mode: Mode = Truncate,
      columns: Seq[String] = Seq.empty,
      predicate: Option[String] = None): Long = {
    var df = src.read(spark, table)
    predicate.foreach(p => df = df.where(p))
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    dest.write(df, table, mode)
    dest.read(spark, table).count()
  }

  /** Directory-to-directory convenience wrapper (the driver-contract shape).
    *
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
    * return a manifest DataFrame (table_name, n_rows, status) for auditing.
    *
    * Failure isolation: one broken table does not abort the run — its
    * manifest row records status = "error: ..." with n_rows = -1, and every
    * other table still copies, matching the reference's per-table error
    * reporting loop.
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
      parallelism: Int = 1): DataFrame =
    copyTablesBetween(spark, ParquetStore(srcDir), ParquetStore(destDir),
      include, exclude, mode, parallelism)

  /** Store-generic multi-table copy — the reference's whole program in one
    * call: enumerate the source catalog (parquet directory or live JDBC
    * metadata), filter the set, replicate each table, report per-table
    * results. `copyTablesBetween(spark, JdbcStore(srcUrl), JdbcStore(dstUrl))`
    * IS the SQL-to-SQL copier.
    */
  def copyTablesBetween(
      spark: SparkSession,
      src: Store,
      dest: Store,
      include: Seq[String] = Seq.empty,
      exclude: Seq[String] = Seq.empty,
      mode: Mode = Truncate,
      parallelism: Int = 1): DataFrame = {
    val names = (src.list(spark) ++ include).distinct.sorted
      .filter(n => include.isEmpty || include.contains(n))
      .filterNot(exclude.contains)
    def one(t: String): (String, Long, String) =
      try { (t, copy(spark, src, dest, t, mode), "ok") }
      catch { case e: Throwable =>
        (t, -1L, s"error: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next()}")
      }
    val manifest: Seq[(String, Long, String)] =
      if (parallelism <= 1) names.map(one)
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(Future.sequence(names.map(t => Future(one(t)))), Duration.Inf)
        finally pool.shutdown()
      }
    import spark.implicits._
    manifest.toDF("table_name", "n_rows", "status").orderBy("table_name")
  }

  /** §2.1 #63 — post-copy verification: classify every key as `same` / `changed` /
    * `missing_in_dest` / `missing_in_source` between two table snapshots —
    * the audit a DBA runs after a bulk copy, and the diff that drives an
    * incremental sync. One full-outer sort-merge join on the key; non-key
    * columns compare as a single null-safe struct equality (no per-column
    * hashing, no formatting round-trip, exact for every type).
    */
  def diffTables(src: DataFrame, dst: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKey = src.columns.filterNot(keys.contains).toSeq
    // Keys-only tables have nothing to compare beyond presence: pack a
    // constant so the struct equality is vacuously true.
    def rest(df: DataFrame): org.apache.spark.sql.Column =
      if (nonKey.isEmpty) lit(0) else struct(nonKey.map(col): _*)
    def packed(df: DataFrame, restName: String, flag: String): DataFrame =
      df.select(keys.map(col) :+ rest(df).as(restName): _*)
        .withColumn(flag, lit(true))
    packed(src, "_src_rest", "_in_src")
      .join(packed(dst, "_dst_rest", "_in_dst"), keys, "full_outer")
      .select(keys.map(col) :+
        when(col("_in_dst").isNull, "missing_in_dest")
          .when(col("_in_src").isNull, "missing_in_source")
          .when(!(col("_src_rest") <=> col("_dst_rest")), "changed")
          .otherwise("same").as("status"): _*)
  }

  /** §2.1 #64 — keyed upsert, the incremental-copy merge: every source row replaces
    * the destination row with the same key (last-writer-wins), destination
    * rows without a source match survive. Expressed as source ∪ (dest
    * left-anti source-keys): one anti-join shuffle on the key plus a
    * zero-shuffle union — no row ever compares more than once, and the
    * source side only ships its KEYS into the anti-join.
    */
  def upsert(src: DataFrame, dst: DataFrame, keys: Seq[String]): DataFrame =
    src.unionByName(
      dst.join(src.select(keys.map(col): _*).distinct(), keys, "left_anti"))

  /** §2.1 #105 — high-watermark incremental copy: pull only source rows at
    * or past the destination's newest `wmCol` value, then merge by key — the
    * standard "load yesterday's partition, not the whole table" pattern for
    * periodic table sync.
    *
    * The watermark itself is a distributed 1-row max aggregate; collecting
    * that single scalar to the driver is deliberate — as a LITERAL it pushes
    * into the source scan (`PushedFilters: GreaterThanOrEqual(wmCol, …)`),
    * so at 100 TB the incremental read touches only the files whose stats
    * overlap the new range (with date/id-clustered layout: only new data).
    * `>=` re-reads the boundary value and the key anti-join dedups it —
    * strict `>` would silently drop late rows sharing the watermark value,
    * the classic incremental-load bug.
    */
  def incrementalCopy(spark: SparkSession, src: DataFrame, dst: DataFrame,
      wmCol: String, keys: Seq[String]): DataFrame = {
    val wm = dst.agg(org.apache.spark.sql.functions.max(col(wmCol))).collect()(0).get(0)
    val fresh = if (wm == null) src else src.where(col(wmCol) >= lit(wm))
    upsert(fresh, dst, keys)
  }

  /** §2.1 #92 — SCD Type-2 merge: fold today's snapshot into a dimension
    * that keeps full history (valid_from, valid_to, is_current). Per key:
    * unchanged attrs → current row passes through; changed attrs → the
    * current row is CLOSED (valid_to = loadDate) and a new open version is
    * inserted; a brand-new key inserts its first version; a key absent from
    * the snapshot stays open (no implicit deletes). Historical (non-current)
    * rows never rejoin — they bypass the merge entirely.
    *
    * One full-outer join on the key is the only shuffle; the up-to-two
    * output rows per key are emitted in the SAME pass by exploding a
    * filtered struct array (no second join, no per-branch re-scan of the
    * joined result — at 100 TB the join is the cost, so it must run once).
    *
    * `dim` carries `keys ++ attrs ++ (valid_from, valid_to, is_current)`;
    * `src` carries `keys ++ attrs`. Attr comparison is null-safe.
    */
  def scd2Merge(src: DataFrame, dim: DataFrame, keys: Seq[String],
      loadDate: Column): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "is_current")
    val attrs = src.columns.filterNot(keys.contains).toSeq
    val history = dim.where(!col("is_current"))
    val current = dim.where(col("is_current")).withColumn("_in_d", lit(true))
    val snap = src.select(keys.map(col) ++ attrs.map(a => col(a).as(s"_s_$a")): _*)
      .withColumn("_in_s", lit(true))
    val joined = current.join(snap, keys, "full_outer")
    val inBoth = col("_in_d").isNotNull && col("_in_s").isNotNull
    val changed = inBoth &&
      attrs.map(a => !(col(a) <=> col(s"_s_$a"))).reduce(_ || _)
    def emit(keep: Column, attrOf: String => Column, validFrom: Column,
        validTo: Column, isCurrent: Column): Column =
      struct(
        (keys.map(col) ++ attrs.map(a => attrOf(a).as(a)) ++ Seq(
          validFrom.as("valid_from"), validTo.cast(DateType).as("valid_to"),
          isCurrent.as("is_current"), keep.as("_keep"))): _*)
    val nullDate = lit(null).cast(DateType)
    val branches = array(
      // current version survives untouched (attrs equal, or key not in snapshot)
      emit(col("_in_d").isNotNull && !changed, col, col("valid_from"),
        col("valid_to"), lit(true)),
      // current version closed by a change
      emit(changed, col, col("valid_from"), loadDate, lit(false)),
      // new open version: changed key or brand-new key
      emit(changed || col("_in_d").isNull, a => col(s"_s_$a"), loadDate,
        nullDate, lit(true)))
    val merged = joined
      .select(explode(filter(branches, b => b("_keep"))).as("r"))
      .select((keys ++ attrs ++ meta).map(c => col(s"r.$c")): _*)
    history.select((keys ++ attrs ++ meta).map(col): _*).unionByName(merged)
  }

  /** §2.1 #78 — declarative data-quality CONSTRAINT suite (the post-copy
    * acceptance gate): each constraint is a (name, violation-count) pair,
    * and a copy is accepted when every count is zero. All row-level
    * constraints for one table fuse into a SINGLE scan (one conditional sum
    * per constraint — map-side combined, no per-constraint pass); the
    * uniqueness constraint is its own hash-aggregate on the key. This is
    * the deequ-style validation surface expressed as plain aggregates.
    */
  def constraintCheck(spark: SparkSession, dir: String): DataFrame =
    constraintCheckOn(Tables.load(spark, dir, "orders"))

  /** [[constraintCheck]] over an arbitrary orders-shaped frame (exposed so
    * the spec can inject violations).
    */
  private[graft] def constraintCheckOn(orders: DataFrame): DataFrame = {
    def viol(name: String, bad: org.apache.spark.sql.Column) =
      sum(when(bad, 1L).otherwise(0L)).as(name)
    val rowLevel = orders.agg(
      viol("key_null", col("o_orderkey").isNull),
      viol("price_nonpositive", col("o_totalprice") <= 0d),
      viol("status_domain", !col("o_orderstatus").isin("F", "O", "P")),
      viol("date_range",
        to_date(col("o_orderdate")) < to_date(lit("1990-01-01")) ||
        to_date(col("o_orderdate")) > to_date(lit("2005-12-31"))))
    val dupKeys = orders.groupBy("o_orderkey").count()
      .agg(viol("key_unique", col("count") > 1))
    val wide = rowLevel.crossJoin(dupKeys) // two 1-row frames
    val cols = Seq("key_null", "price_nonpositive", "status_domain",
      "date_range", "key_unique")
    wide.select(explode(array(cols.map(c =>
        struct(lit(c).as("constraint_name"), col(c).as("n_violations"))): _*)).as("p"))
      .select(col("p.constraint_name"), col("p.n_violations"))
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("constraint_name")
  }

  /** §2.1 #122 — copy with row-level QUARANTINE routing: every source row
    * either passes all `rules` and lands in the destination, or is diverted
    * to a quarantine table stamped with the FIRST failing rule's name (rule
    * order = severity precedence). The load never aborts on bad rows and
    * never silently drops them — the two failure modes of a naive copy; the
    * quarantine table is the re-drive queue. Row-per-row routing is the
    * complement of [[constraintCheck]]'s aggregate verdict.
    *
    * One codegen'd CASE evaluates all rules per row; the two filtered writes
    * are each a straight scan→write with the predicate pushed to the parquet
    * reader on the second pass. Returns the quarantine readback.
    */
  def quarantineCopy(spark: SparkSession, src: DataFrame, destDir: String,
      rules: Seq[(String, Column)]): DataFrame = {
    val reason = coalesce(
      rules.map { case (n, bad) => when(bad, lit(n)) } :+
        lit(null).cast("string"): _*)
    val tagged = src.withColumn("reason", reason)
    tagged.where(col("reason").isNull).drop("reason")
      .write.mode("overwrite").parquet(s"$destDir/clean.parquet")
    tagged.where(col("reason").isNotNull)
      .write.mode("overwrite").parquet(s"$destDir/quarantine.parquet")
    spark.read.parquet(s"$destDir/quarantine.parquet")
  }

  /** §2.1 #123 — CDC net-change collapse: a change feed (one row per
    * mutation, keyed, ordered by event time) reduces to its NET effect —
    * the last writer per key, with deletes tombstoning the payload. This is
    * the batch compaction a replication pipeline runs before applying a
    * day's change stream as ONE merge instead of replaying every
    * intermediate version (the batch twin of the streaming `cdcApply`).
    *
    * The feed here is the `events` table read as a change log: `error`
    * events are deletes, everything else upserts `value`. Last-writer
    * selection is a map-side-combinable max(struct(ts, id, …)) — one
    * partial-aggregated shuffle on the key, never a window over the raw
    * feed, so a billion-change day collapses at scan speed.
    */
  def cdcCollapse(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        col("value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_changes"),
        max(struct(col("ts"), col("event_id"), col("op"), col("value"))).as("last"))
      .select(col("user_id"), col("n_changes"),
        col("last.op").as("last_op"),
        when(col("last.op") === "D", lit(null).cast("double"))
          .otherwise(col("last.value")).as("final_value"))
      .orderBy("user_id")

  /** §2.1 #138 — INCREMENTAL VIEW MAINTENANCE for an aggregate view: the
    * maintained view = merge(partial(base), partial(delta)) — counts add,
    * decimal sums add — and the oracle is the FULL recompute over
    * base ∪ delta, which is exactly the algebraic claim that makes
    * incremental maintenance sound. This is how a 100 TB daily-rollup view
    * absorbs a day's delta without rescanning history: O(|delta| + |view|)
    * instead of O(|everything|). Deletes would enter as negative partials;
    * the demo feed is append-only like most event streams.
    *
    * Both inputs partially aggregate map-side; the merge is a second tiny
    * aggregation on the view key. All sums are DECIMAL, so merged values
    * are bit-identical to the recompute at any partitioning.
    */
  def maintainAggView(spark: SparkSession, dir: String,
      splitDate: String = "1998-01-01"): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    def partial(df: DataFrame): DataFrame = df
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).as("sv"))
    val base = partial(ev.where(col("day") < to_date(lit(splitDate))))
    val delta = partial(ev.where(col("day") >= to_date(lit(splitDate))))
    base.unionByName(delta)
      .groupBy("event_type", "day")
      .agg(sum("n").as("n"), sum("sv").as("sv"))
      .select(col("event_type"), col("day").cast("string").as("day"), col("n"),
        round(col("sv").cast("double"), 6).as("sum_value"))
      .orderBy("event_type", "day")
  }

  /** §2.1 #136 — JOIN-KEY SKEW PROFILE: the diagnostic run BEFORE choosing
    * a shuffle strategy (plain repartition vs #44 hot-key salting vs #100
    * equi-depth chunking). For each candidate key column: row/key counts,
    * the heaviest key's absolute count and share of all rows, and the
    * skew factor max/avg — the number that says whether one reducer will
    * eat the join. One partial-aggregated count per column plus a
    * key-count aggregate whose shuffle is bounded by distinct keys; the
    * heaviest key is a max(struct) (no sort, no top-k window).
    */
  def skewProfile(spark: SparkSession, dir: String,
      keys: Seq[(String, String)] = Seq("orders" -> "o_custkey",
        "lineitem" -> "l_orderkey", "lineitem" -> "l_partkey")): DataFrame = {
    val profiles = keys.map { case (table, key) =>
      Tables.load(spark, dir, table)
        .groupBy(col(key).cast("long").as("k"))
        .agg(count(lit(1)).as("cnt"))
        .agg(
          lit(s"$table.$key").as("key_col"),
          sum("cnt").as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(struct(col("cnt"), col("k"))).as("top"))
        .select(col("key_col"), col("n_rows"), col("n_keys"),
          col("top.cnt").as("max_cnt"), col("top.k").as("top_key"),
          round(col("top.cnt").cast("double") / col("n_rows"), 6).as("top_share"),
          round(col("top.cnt").cast("double") /
            (col("n_rows").cast("double") / col("n_keys")), 6).as("skew_factor"))
    }
    profiles.reduce(_ unionByName _).orderBy("key_col")
  }

  /** §2.1 #133 — MASKED copy (column-level governance policy applied in
    * flight): each column carries an action — `Keep` passes through,
    * `Hash` replaces the value with its sha256 (referential integrity
    * survives: equal inputs stay joinable, originals are unrecoverable),
    * `Redact` nulls the value out. The de-identified-replica pattern for
    * shipping production tables to lower environments; the masking is a
    * single codegen'd projection inside the copy's one distributed pass
    * (zero extra scans vs a plain copy). Returns the masked readback.
    */
  sealed trait MaskAction
  case object Keep extends MaskAction
  case object Hash extends MaskAction
  case object Redact extends MaskAction

  def maskedCopy(spark: SparkSession, srcDir: String, destDir: String,
      table: String, policy: Map[String, MaskAction]): DataFrame = {
    val src = Tables.load(spark, srcDir, table)
    val masked = src.select(src.schema.fields.map { f =>
      policy.getOrElse(f.name, Keep) match {
        case Keep   => col(f.name)
        case Hash   => sha2(col(f.name).cast("string"), 256).as(f.name)
        case Redact => lit(null).cast(f.dataType).as(f.name)
      }
    }.toIndexedSeq: _*)
    masked.write.mode("overwrite").parquet(s"$destDir/$table.parquet")
    spark.read.parquet(s"$destDir/$table.parquet")
  }

  /** §2.1 #90 — RANGE-CLUSTERED copy (z-order-lite): rows are
    * range-partitioned AND sorted on the cluster key, so every output file
    * covers a disjoint key interval and parquet's min/max footer stats make
    * range predicates skip whole files (and row groups) without reading
    * them. Partition pruning works at directory granularity; clustering is
    * the finer file-level sieve — at 100 TB a date-range query over a
    * date-clustered table reads only the files whose interval intersects
    * the predicate. Returns the clustered readback.
    */
  def copyClustered(spark: SparkSession, dir: String, dest: String,
      table: String = "orders", clusterCol: String = "o_orderdate",
      nFiles: Int = 8): DataFrame = {
    Tables.load(spark, dir, table)
      .repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite).parquet(dest)
    spark.read.parquet(dest)
  }

  /** §2.1 #74 — small-file COMPACTION: rewrite a fragmented destination into
    * ceil(rows / targetRowsPerFile) files. Long-running copy pipelines
    * accrete small files (per-batch appends, per-partition writers); at
    * 100 TB the file COUNT, not the byte count, is what kills scan planning
    * (one task + one open/close per file). One distributed read →
    * repartition → write into a staging dir (readers of the old path are
    * never disturbed mid-rewrite); returns the compacted readback.
    */
  def compact(spark: SparkSession, path: String,
      targetRowsPerFile: Long = 10000L): DataFrame = {
    val src = spark.read.parquet(path)
    val nFiles = math.max(1L, (src.count() + targetRowsPerFile - 1) / targetRowsPerFile)
    val staged = s"$path.compacted"
    src.repartition(nFiles.toInt).write.mode(SaveMode.Overwrite).parquet(staged)
    spark.read.parquet(staged)
  }

  /** §2.1 #75 — SCHEMA-EVOLUTION append: a later batch arrives with an extra
    * column; the destination absorbs it (parquet is self-describing per
    * file) and `mergeSchema` reads the union schema, null-filling the old
    * rows — the additive-column path every long-lived copy destination
    * eventually needs. Returns per-channel counts over the merged readback
    * ('original' rows predate the column).
    */
  def copyEvolve(spark: SparkSession, dir: String, dest: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    orders.write.mode(SaveMode.Overwrite).parquet(dest)
    orders.where(col("o_orderkey") % 100 === 0)
      .withColumn("o_channel", lit("backfill"))
      .write.mode(SaveMode.Append).parquet(dest)
    spark.read.option("mergeSchema", "true").parquet(dest)
      .groupBy(coalesce(col("o_channel"), lit("original")).as("channel"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
      .orderBy("channel")
  }

  /** §2.1 #70 — PARTITIONED copy: the destination is laid out as
    * `dest/o_year=YYYY/...` hive-style partitions, so every downstream query
    * that filters on the partition column reads only its partitions'
    * files — partition PRUNING, the single biggest scan saver at 100 TB
    * (a year filter over 7 years of data touches 1/7th of the bytes, before
    * any row is decoded). Returns the rows written.
    */
  def copyPartitioned(spark: SparkSession, dir: String, dest: String,
      table: String = "orders"): Long = {
    val src = Tables.load(spark, dir, table)
      .withColumn("o_year", year(col("o_orderdate")))
    src.write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(dest)
    src.count()
  }

  /** The partition-pruned readback over a [[copyPartitioned]] destination:
    * the `o_year = yr` predicate resolves against the directory layout
    * (PartitionFilters in the scan), never against file contents.
    */
  def partitionPrunedAgg(spark: SparkSession, dest: String, yr: Int = 1997): DataFrame =
    spark.read.parquet(dest)
      .where(col("o_year") === yr)
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
      .orderBy("o_month")

  /** §2.1 #71 — BUCKETED copy + shuffle-free co-located join: both tables
    * are written bucketed (and sorted) on the join key with the same bucket
    * count, so the subsequent sort-merge join reads matching buckets
    * pairwise — NO exchange and NO sort on either side. This is the
    * pre-partitioning that turns every future fact-fact join on this key
    * into a scan-side merge; at 100 TB it's the difference between joining
    * in place and re-shuffling the corpus every query. The join result
    * aggregates revenue per order priority (oracle: the plain join).
    */
  def copyBucketed(spark: SparkSession, dir: String, warehouseDir: String,
      nBuckets: Int = 8): DataFrame = {
    def bucketize(table: String, key: String): String = {
      val name = s"graft_bkt_$table"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Tables.load(spark, dir, table)
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(nBuckets, key).sortBy(key)
        .option("path", s"$warehouseDir/$name")
        .saveAsTable(name)
      name
    }
    val orders = spark.table(bucketize("orders", "o_orderkey"))
    val lineitem = spark.table(bucketize("lineitem", "l_orderkey"))
    lineitem.hint("merge")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(28, 6))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }

  /** §2.1 #66 — referential-integrity audit, the pre/post-copy FK check a
    * DBA runs before trusting a copied set: for each (child.fk -> parent.pk)
    * relationship, how many child rows (and distinct keys) point at a parent
    * key that does not exist. NULL FKs are not violations (SQL semantics).
    *
    * Scale shape: the child side is aggregated to (key, row-count) FIRST, so
    * the anti-join against the parent keys shuffles one row per DISTINCT
    * child key — bounded by key cardinality, never by fact-table row count.
    */
  def fkCheck(spark: SparkSession, dir: String,
      rels: Seq[(String, String, String, String)] = Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("events", "user_id", "customer", "c_custkey"))): DataFrame = {
    val perRel = rels.map { case (child, fk, parent, pk) =>
      val keyed = Tables.load(spark, dir, child)
        .where(col(fk).isNotNull)
        .groupBy(col(fk).as("k")).agg(count(lit(1)).as("n"))
      val orphans = keyed.join(
        Tables.load(spark, dir, parent).select(col(pk).as("k")), Seq("k"), "left_anti")
      orphans.agg(
        lit(s"$child.$fk->$parent.$pk").as("relationship"),
        coalesce(sum("n"), lit(0L)).as("n_orphan_rows"),
        count(lit(1)).as("n_orphan_keys"))
    }
    perRel.reduce(_.unionAll(_)).orderBy("relationship")
  }

  /** §2.1 #67 — column profile ("ANALYZE" for the copy planner): per column,
    * null count, exact distinct count, and numeric min/max. This is what
    * sizes stride partitions ([[graft.sources.PartitionPlan]] needs min/max),
    * picks partition columns (distinct counts), and validates a copy.
    *
    * One scan; the exact multi-column DISTINCTs expand the scan by the
    * column count (Spark's Expand) — the exact-profile price. At 100 TB the
    * same operator runs with `approx_count_distinct` (HLL, one pass, no
    * expand) when exactness isn't required; exact here because the oracle is.
    */
  def statsProfile(spark: SparkSession, dir: String, table: String = "orders"): DataFrame = {
    val df = Tables.load(spark, dir, table)
    val numeric: Set[String] = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSet
    val aggs = df.columns.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd")) ++
        (if (numeric(c))
          Seq(min(col(c)).cast("double").as(s"${c}__min"),
            max(col(c)).cast("double").as(s"${c}__max"))
         else Nil)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = df.columns.map { c =>
      val (mn, mx) =
        if (numeric(c)) (col(s"${c}__min"), col(s"${c}__max"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      struct(lit(c).as("col_name"), col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"), mn.as("min_num"), mx.as("max_num"))
    }
    wide.select(explode(array(stacked: _*)).as("p"))
      .select("p.col_name", "p.n_nulls", "p.n_distinct", "p.min_num", "p.max_num")
      .orderBy("col_name")
  }

  /** Canonical type name for the schema manifest (engine-neutral spelling so
    * the manifest is comparable across runtimes).
    */
  private[graft] def canonicalType(dt: DataType): String = dt.sql.toLowerCase

  /** ANSI/JDBC column type for DDL generation — what the reference's SMO
    * scripting emits per column, and what Spark's `createTableColumnTypes`
    * option consumes on a JDBC destination. Kept to types Derby/SQL Server/
    * Postgres all accept.
    */
  private[graft] def jdbcType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case StringType => "VARCHAR(4000)"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BLOB"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => canonicalType(other).toUpperCase
  }

  /** `createTableColumnTypes`-form DDL fragment for a schema:
    * "col TYPE, col TYPE, ...". (Spark's JDBC writer adds NOT NULL itself
    * from each field's nullability, so the fragment carries types only.)
    */
  private[graft] def columnTypesDdl(schema: StructType): String =
    schema.fields.map(f => s"${f.name} ${jdbcType(f.dataType)}").mkString(", ")

  /** Schema replication as data: for each table, one row per column with its
    * ordinal, canonical type, nullability, and generated JDBC DDL type — the
    * Spark-native analogue of the reference scripting the source DDL onto the
    * destination before the copy. (Parquet is self-describing, so replicating
    * the schema *object* is the write itself; this manifest is the auditable
    * DDL record, and [[columnTypesDdl]] feeds the same mapping to real JDBC
    * writes.)
    */
  def schemaManifest(spark: SparkSession, srcDir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = tables.sorted.flatMap { t =>
      val schema: StructType = Tables.load(spark, srcDir, t).schema
      schema.fields.zipWithIndex.map { case (f, i) =>
        (t, i + 1, f.name, canonicalType(f.dataType), f.nullable, jdbcType(f.dataType))
      }
    }
    rows.toDF("table_name", "ordinal", "column_name", "data_type", "nullable", "jdbc_ddl_type")
      .orderBy("table_name", "ordinal")
  }

  /** JDBC-style partitioned parallel read over the parquet catalog: split a
    * table on a numeric key into stride predicates and read the chunks as one
    * union. Bounds come from one tiny min/max aggregate (the same round-trip
    * `spark.read.jdbc` does). The union of disjoint filters re-assembles the
    * table exactly; Catalyst pushes each stride predicate down to the scan.
    * [[JdbcStore.read]] drives the identical planner against a real database.
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

  /** Skew-aware variant of [[partitionedRead]]: chunk boundaries are the
    * key's own approximate quantiles (one `percentile_approx` pass — the
    * same cost as the min/max round-trip), so a clustered key distribution
    * still produces near-equal chunk row counts. On a real JDBC source this
    * is the difference between N even bulk-copy streams and one stream
    * dragging 80% of the table. Reassembly is exact regardless of how
    * approximate the quantiles are — the predicates stay disjoint and
    * covering by construction.
    */
  def partitionedReadBalanced(
      spark: SparkSession,
      srcDir: String,
      table: String,
      column: String,
      numPartitions: Int): DataFrame = {
    val df = Tables.load(spark, srcDir, table)
    val probs = (1 until numPartitions).map(_.toDouble / numPartitions)
    val qs = df.agg(percentile_approx(col(column).cast("double"),
        typedLit(probs), lit(10000)).as("qs"))
      .collect()(0).getSeq[Double](0)
    val preds = PartitionPlan.boundaryPredicates(column, qs.map(_.toLong))
    preds.map(p => df.where(p)).reduce(_ unionAll _)
  }

  /** Keyed upsert pushed INTO a live JDBC destination (the incremental-copy
    * merge the way a real warehouse load runs it): the batch lands in a
    * staging table via the distributed JDBC writer, then ONE set-based
    * `MERGE` statement executes inside the database — update on key match,
    * insert otherwise — and the staging table is dropped. Spark moves the
    * data in parallel; the database applies the delta atomically. No row
    * ever round-trips through the driver.
    */
  def jdbcUpsert(spark: SparkSession, store: JdbcStore, df: DataFrame,
      table: String, keys: Seq[String]): Unit = {
    val staging = s"${table}_stage"
    store.write(df, staging, Recreate)
    def q(c: String) = "\"" + c + "\""
    val cols = df.columns.toSeq
    val on = keys.map(k => s"d.${q(k)} = s.${q(k)}").mkString(" AND ")
    val set = cols.filterNot(keys.contains)
      .map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
    val merge =
      s"""MERGE INTO $table d USING $staging s ON $on
         |WHEN MATCHED THEN UPDATE SET $set
         |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
         |VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
    val props = new java.util.Properties()
    store.options.foreach { case (k, v) => props.setProperty(k, v) }
    store.options.get("driver").foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(store.url, props)
    try {
      // Spark's JDBC writer creates a bare heap table; without a key index
      // the MERGE's match lookup nested-loops the whole destination per
      // staging row (O(dest·stage) — 7× the cost of the load itself at
      // sf0.1). A real warehouse destination has a primary key; create the
      // equivalent once, idempotently (X0Y32 = already exists).
      val idx = s"${table}_graft_kidx"
      try conn.createStatement().executeUpdate(
        s"CREATE INDEX $idx ON $table (${keys.map(q).mkString(", ")})")
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      conn.createStatement().executeUpdate(merge)
      conn.createStatement().executeUpdate(s"DROP TABLE $staging")
    } finally conn.close()
  }

  /** §2.1 #117 — versioned snapshot copy (time-travel-lite): every write
    * lands in a NEW immutable `v<N>` directory and readers pin either the
    * latest or any historical version. This is the snapshot-isolation
    * contract of a table format (Iceberg/Delta) reduced to its storage
    * essentials — full-copy snapshots, no manifests — which is exactly what
    * a periodic bulk copier produces: readers of v1 are never disturbed by
    * the v2 write, and yesterday's pipeline can be re-run against
    * yesterday's table. Combine with [[diffTables]] for version diffs and
    * [[checksum]] for cross-version verification.
    *
    * At 100 TB each snapshot is a distributed write like any other copy;
    * retention is directory deletion. Listing cost is one metadata call.
    */
  def writeSnapshot(spark: SparkSession, df: DataFrame, destDir: String,
      table: String): Int = {
    val next = listSnapshots(spark, destDir, table).lastOption.getOrElse(0) + 1
    df.write.parquet(s"$destDir/$table/v$next")
    next
  }

  /** All committed snapshot versions of `table`, ascending. */
  def listSnapshots(spark: SparkSession, destDir: String, table: String): Seq[Int] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(destDir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$destDir/$table")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      .sorted
  }

  /** Read one snapshot: `version` ≤ 0 means latest. */
  def readSnapshot(spark: SparkSession, destDir: String, table: String,
      version: Int = 0): DataFrame = {
    val vs = listSnapshots(spark, destDir, table)
    require(vs.nonEmpty, s"no snapshots of $table under $destDir")
    val v = if (version > 0) version else vs.last
    require(vs.contains(v), s"version $v not in $vs")
    spark.read.parquet(s"$destDir/$table/v$v")
  }

  /** Canonical cross-engine string form of one column for [[checksum]]:
    * floating point goes through DECIMAL(18,2) (both engines render a fixed
    * two-digit scale; raw double→string formatting differs between JVMs and
    * DuckDB), timestamps become epoch microseconds, and NULL becomes a 
    * marker so it can never collide with an empty string.
    */
  private def canonicalCol(f: StructField): Column = {
    val c = col(f.name)
    val s = f.dataType match {
      case DoubleType | FloatType => c.cast(DecimalType(18, 2)).cast("string")
      case TimestampType => unix_micros(c).cast("string")
      // The catalog's timestamps are NTZ; with the session pinned to UTC the
      // cast is a pure reinterpretation, matching DuckDB's epoch_us.
      case TimestampNTZType => unix_micros(c.cast(TimestampType)).cast("string")
      case DateType => date_format(c, "yyyy-MM-dd")
      case _ => c.cast("string")
    }
    coalesce(s, lit("\u0001"))
  }

  /** §2.1 #99 — schema-mapping copy: rename columns and re-type values in
    * flight, the column-mapping switch every bulk copier grows once source
    * and destination schemas drift. The mapping is applied as a projection
    * inside the copy's single distributed pass (select + cast — codegen'd,
    * no second job), so it costs nothing beyond the copy itself.
    */
  def copyMapped(spark: SparkSession, srcDir: String, destDir: String,
      table: String, mapping: Seq[(String, String, String)],
      mode: Mode = Truncate): Long = {
    val df = Tables.load(spark, srcDir, table)
      .select(mapping.map { case (src, dst, tpe) =>
        col(src).cast(tpe).as(dst)
      }: _*)
    df.write.mode(mode.saveMode).parquet(Tables.path(destDir, table))
    spark.read.parquet(Tables.path(destDir, table)).count()
  }

  /** Order-independent table content checksum — the 100 TB answer to "did the
    * copy arrive intact?". A full [[diffTables]] costs a second shuffle of
    * both tables; this costs ONE scan per side and ships 16 bytes: each row's
    * canonical form is sha256-hashed, the first 60 bits become a bigint, and
    * the commutative SUM of those (exact, as DECIMAL(38,0) — no overflow
    * below ~10^15 rows) is identical no matter how the rows were partitioned
    * or ordered. Source and destination checksums can be computed on
    * different clusters and compared as two strings. A single drifted value,
    * missing row, or duplicated row changes the sum with probability
    * 1 - 2^-60.
    */
  def checksum(df: DataFrame): DataFrame = {
    val canon = concat_ws("|", df.schema.fields.map(canonicalCol).toSeq: _*)
    df.select(
        conv(substring(sha2(canon, 256), 1, 15), 16, 10)
          .cast("long").cast(DecimalType(38, 0)).as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).cast("string").as("checksum"))
  }

  /** §2.1 #149 — checksum-VERIFIED copy: the copy and its acceptance test
    * fused into one operator — replicate the table, checksum BOTH sides
    * (one scan each, 16 bytes shipped), emit a single verdict row. The
    * "did it arrive intact" answer the reference's users compute by hand;
    * at 100 TB the two checksums can come from different clusters and the
    * verdict is still exact.
    */
  def copyVerified(spark: SparkSession, srcDir: String, destDir: String,
      table: String, mode: Mode = Truncate): DataFrame = {
    copyTable(spark, srcDir, destDir, table, mode)
    val src = checksum(Tables.load(spark, srcDir, table))
      .select(col("n_rows").as("src_rows"), col("checksum").as("src_checksum"))
    val dst = checksum(spark.read.parquet(Tables.path(destDir, table)))
      .select(col("n_rows").as("dst_rows"), col("checksum").as("dst_checksum"))
    src.crossJoin(dst) // two 1-row frames
      .select(lit(table).as("table_name"), col("src_rows"), col("dst_rows"),
        col("src_checksum"), col("dst_checksum"),
        (col("src_rows") === col("dst_rows") &&
          col("src_checksum") === col("dst_checksum")).as("verified"))
  }

  /** Per-table checksum manifest over a catalog — the post-copy verification
    * record (table_name, n_rows, checksum). One distributed scan per table,
    * one 3-column row out.
    */
  def checksumTables(spark: SparkSession, dir: String,
      tables: Seq[(String, String)]): DataFrame =
    tables.map { case (label, table) =>
      checksum(Tables.load(spark, dir, table)).select(
        lit(label).as("table_name"), col("n_rows"), col("checksum"))
    }.reduce(_ unionAll _).orderBy("table_name")
}
