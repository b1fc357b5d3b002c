package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  *
  * Every `queries` key is one §2 row; every key with a SQL-expressible result
  * also appears in `oracleSql` with IDENTICAL column names and a total
  * ORDER BY, so the driver's DuckDB compare is deterministic.
  *
  * Cross-engine conventions used throughout:
  *  - money/metric sums: sum(cast(x as decimal)) cast back to double — exact,
  *    order-independent, so Spark's parallel aggregation matches DuckDB's
  *    serial one bit-for-bit;
  *  - counts from Spark int-typed functions (size, length, row_number) are
  *    cast to INTEGER on the DuckDB side (DuckDB defaults to BIGINT);
  *  - array math is a sequential left fold on both engines.
  */
object SparkEntry {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-dest/$name"

  /** Derby URL over a FRESH database directory: every jdbc query rebuilds its
    * tables from scratch, but a `db.lck` left by a killed JVM (e.g. a verify
    * run aborted mid-boot) makes Derby refuse to start the stale database —
    * so remove the directory before connecting instead of trusting last
    * run's shutdown.
    */
  private def freshDerby(name: String): String = {
    val dir = new java.io.File(tmp(name))
    // A previous run in THIS JVM may still hold the database booted (bench
    // passes re-run the same query); deleting a booted database's files
    // makes Derby refuse the next boot. Shut it down first — Derby signals
    // even a SUCCESSFUL shutdown via SQLException, so swallow exactly that
    // (and reflection failures), never Errors like OOM.
    if (dir.exists()) {
      try {
        Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        java.sql.DriverManager.getConnection(
          s"jdbc:derby:${tmp(name)}/db;shutdown=true")
      } catch {
        case _: java.sql.SQLException => ()
        case scala.util.control.NonFatal(_) => ()
      }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
    }
    s"jdbc:derby:${tmp(name)}/db;create=true"
  }

  /** [[freshDerby]] with SQL AUTHORIZATION enabled: the static database
    * property only takes effect on the boot AFTER it is set, so the helper
    * creates the database (owner = default user APP), sets the property,
    * shuts the database down (Derby signals success via SQLException), and
    * hands back the base URL — the next connection boots with GRANT/REVOKE
    * enforced. Authentication stays off: connections CLAIM a user and
    * authorization checks the claimed identity, which is exactly what the
    * grant-replication probe needs (connect as ALICE, be denied as
    * MALLORY).
    */
  private def freshDerbyAuthz(name: String): String = {
    val url = freshDerby(name)
    val base = url.stripSuffix(";create=true")
    val c = java.sql.DriverManager.getConnection(url)
    try {
      c.createStatement().executeUpdate(
        "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
          "'derby.database.sqlAuthorization', 'true')"): Unit
    } finally c.close()
    try java.sql.DriverManager.getConnection(s"$base;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    base
  }

  /** A deterministic "stale destination copy" of orders for the diff/upsert
    * rows: every 10th key never arrived, every 7th has a drifted price.
    */
  private def staleOrders(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(s, dir, "orders")
      .where(col("o_orderkey") % 10 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))

  /** A deterministic "dirty feed" of orders for the quarantine row: every
    * 13th key's price flips negative, every 11th key's status leaves the
    * domain (keys divisible by both fail two rules — rule order decides).
    */
  private def dirtyOrders(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(s, dir, "orders")
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 11 === 0, lit("X")).otherwise(col("o_orderstatus")))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinStar(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 reference surface (table copy / ETL)
    "copy_roundtrip" -> ((s, dir) => {
      TableCopy.copyTable(s, dir, tmp("roundtrip"), "nation", TableCopy.Truncate)
      s.read.parquet(s"${tmp("roundtrip")}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
    }),
    "copy_manifest" -> ((s, dir) =>
      TableCopy.copyTables(s, dir, tmp("manifest"),
        include = Seq("customer", "nation", "part", "supplier"),
        exclude = Seq("supplier"))),
    // §2.1 #201 — resume-from-manifest: run 1 copies nation+region ok and
    // isolates the failure of a table with no source files; run 2 is the
    // "fix the broken table and rerun" pass — it resumes from run 1's
    // manifest, so the ok tables re-emit as `skipped` (prior counts
    // carried, no recopy) and only the fixed table actually copies.
    "copy_resume" -> ((s, dir) => {
      val first = TableCopy.copyTables(s, dir, tmp("resume"),
        include = Seq("nation", "region", "missing_table"))
      TableCopy.copyTables(s, dir, tmp("resume"),
        include = Seq("nation", "region", "supplier"),
        resumeFrom = Some(first))
    }),
    "copy_schema" -> ((s, dir) =>
      TableCopy.schemaManifest(s, dir, Seq("nation", "customer", "part"))),
    "copy_append" -> ((s, dir) => {
      TableCopy.copyTable(s, dir, tmp("append"), "nation", TableCopy.Truncate)
      TableCopy.copyTable(s, dir, tmp("append"), "nation", TableCopy.Append)
      s.read.parquet(s"${tmp("append")}/nation.parquet")
        .groupBy("n_nationkey", "n_name", "n_regionkey")
        .agg(count(lit(1)).as("n_copies"))
        .orderBy("n_nationkey")
    }),
    "copy_csv_roundtrip" -> ((s, dir) => {
      val schema = TableCopy.ParquetStore(dir).read(s, "nation").schema
      val csv = TableCopy.FileStore(tmp("csvrt"), "csv", schema = Some(schema))
      TableCopy.copy(s, TableCopy.ParquetStore(dir), csv, "nation", TableCopy.Truncate)
      csv.read(s, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
    }),
    "copy_json_roundtrip" -> ((s, dir) => {
      val schema = TableCopy.ParquetStore(dir).read(s, "nation").schema
      val js = TableCopy.FileStore(tmp("jsonrt"), "json", schema = Some(schema))
      TableCopy.copy(s, TableCopy.ParquetStore(dir), js, "nation", TableCopy.Truncate)
      js.read(s, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
    }),
    // ORC is self-describing (like parquet), so no schema injection needed:
    // the FileStore's format string is the only change — one Store
    // abstraction covers the whole columnar/text format family.
    "copy_orc_roundtrip" -> ((s, dir) => {
      val orc = TableCopy.FileStore(tmp("orcrt"), "orc")
      TableCopy.copy(s, TableCopy.ParquetStore(dir), orc, "nation", TableCopy.Truncate)
      orc.read(s, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
    }),
    "q_partitioned_read" -> ((s, dir) =>
      TableCopy.partitionedRead(s, dir, "orders", "o_orderkey", 8)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")),
    // Equi-depth chunking on a non-uniform key; exact reassembly is the
    // oracle claim (balance is spec-asserted, not value-visible).
    "q_partitioned_read_balanced" -> ((s, dir) =>
      TableCopy.partitionedReadBalanced(s, dir, "orders", "o_custkey", 8)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")),
    // Incremental copy merged INTO a live JDBC database: stale Derby copy +
    // fresh-slice MERGE reconstructs the source exactly (the oracle is the
    // plain source table).
    "copy_jdbc_upsert" -> ((s, dir) => {
      val db = TableCopy.JdbcStore(
        freshDerby("jdbcups"),
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val cust = graft.sources.Tables.load(s, dir, "customer")
      val stale = cust.where(col("c_custkey") % 10 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal")))
      db.write(stale, "customer", TableCopy.Recreate)
      val fresh = cust.where(col("c_custkey") % 10 === 0 || col("c_custkey") % 7 === 0)
      TableCopy.jdbcUpsert(s, db, fresh, "customer", Seq("c_custkey"))
      db.read(s, "customer").orderBy("c_custkey")
    }),
    // Full schema replication onto a live JDBC destination: PK + secondary
    // index + identity column ride with the copy (identity is BY DEFAULT,
    // so source key values are PRESERVED — the KeepIdentity semantics; the
    // % 3 filter makes preserved values distinguishable from a regenerated
    // 1..N sequence). The result row reports the DESTINATION's live
    // metadata alongside content aggregates, so the oracle's literals fail
    // if any schema fact failed to replicate.
    "copy_jdbc_schema" -> ((s, dir) => {
      val db = TableCopy.JdbcStore(
        freshDerby("jdbcschema"),
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val m = TableCopy.TableMeta(
        primaryKey = Seq("c_custkey"),
        indexes = Seq(
          ("customer_name_uq", Seq("c_name"), true),
          ("customer_nkey_idx", Seq("c_nationkey"), false)),
        identity = Seq("c_custkey"))
      TableCopy.copy(s, TableCopy.ParquetStore(dir), db, "customer",
        TableCopy.Recreate, predicate = Some("c_custkey % 3 = 0"),
        replicateMeta = true, metaOverride = Some(m))
      val back = db.meta(s, "customer")
      db.read(s, "customer")
        .agg(count(lit(1)).as("n_rows"), sum("c_custkey").as("sum_custkey"))
        .select(col("n_rows"), col("sum_custkey"),
          lit(back.primaryKey.mkString(",")).as("pk_cols"),
          lit(back.indexes.map { case (n, cs, uq) =>
            s"$n(${cs.mkString(",")})${if (uq) ":UNIQUE" else ""}" }
            .mkString(";")).as("dest_indexes"),
          lit(back.identity.mkString(",")).as("identity_cols"))
    }),
    // CHECK constraints + column DEFAULTs ride with the schema copy (the
    // SMO-parity facts beyond PK/index/identity/FK): the copy scripts both
    // onto the Derby destination, the destination CATALOG is read back
    // (SYS.SYSCHECKS + JDBC COLUMN_DEF — discovery, not an echo of the
    // input), and two live probes prove the semantics landed: an INSERT
    // omitting the defaulted columns comes back with the source's defaults,
    // and an INSERT violating the check is REJECTED by the destination.
    "copy_jdbc_constraints" -> ((s, dir) => {
      val url = freshDerby("jdbcck")
      val db = TableCopy.JdbcStore(
        url, Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val m = TableCopy.TableMeta(
        primaryKey = Seq("c_custkey"),
        checks = Seq("customer_bal_ck" -> "\"c_acctbal\" >= -1000.0"),
        defaults = Seq("c_mktsegment" -> "'BUILDING'", "c_acctbal" -> "0.0"))
      TableCopy.copy(s, TableCopy.ParquetStore(dir), db, "customer",
        TableCopy.Recreate,
        columns = Seq("c_custkey", "c_mktsegment", "c_acctbal"),
        predicate = Some("c_custkey % 5 = 0"),
        replicateMeta = true, metaOverride = Some(m))
      val back = db.meta(s, "customer")
      val conn = java.sql.DriverManager.getConnection(url)
      val (defSeg, defBal, enforced) =
        try {
          conn.createStatement().executeUpdate(
            """INSERT INTO customer ("c_custkey") VALUES (-1)""")
          val rs = conn.createStatement().executeQuery(
            """SELECT "c_mktsegment", "c_acctbal" FROM customer WHERE "c_custkey" = -1""")
          rs.next()
          val seg = rs.getString(1)
          val bal = rs.getDouble(2)
          val enf =
            try {
              conn.createStatement().executeUpdate(
                """INSERT INTO customer ("c_custkey", "c_acctbal") VALUES (-2, -99999.0)""")
              false
            } catch { case _: java.sql.SQLException => true }
          (seg, bal, enf)
        } finally conn.close()
      db.read(s, "customer").where(col("c_custkey") >= 0)
        .agg(count(lit(1)).as("n_rows"), sum("c_custkey").as("sum_custkey"))
        .select(col("n_rows"), col("sum_custkey"),
          lit(back.primaryKey.mkString(",")).as("pk_cols"),
          lit(back.checks.map { case (n, c) => s"$n:$c" }.mkString(";"))
            .as("dest_checks"),
          lit(back.defaults.map { case (c, d) => s"$c=$d" }.mkString(";"))
            .as("dest_defaults"),
          lit(defSeg).as("default_seg"), lit(defBal).as("default_bal"),
          lit(enforced).as("check_enforced"))
    }),
    // COLLATION facts on a JDBC copy (VERDICT r9 #9): SMO scripts
    // collations with the table; Derby's collation is DATABASE-scoped and
    // fixed at creation, so it cannot be scripted onto a destination — the
    // copier instead DISCOVERS both sides' collations and surfaces the
    // mismatch, and the live probe shows the semantic difference is real:
    // 'a' < 'B' is FALSE under UCS_BASIC (codepoint order, B=66 < a=97)
    // and TRUE under TERRITORY_BASED en_US (case is a secondary weight).
    // Column-level collation scripting (SQL Server / Postgres) is the
    // documented untestable remainder — discovery SQL ships per dialect.
    "copy_jdbc_collation" -> ((s, dir) => {
      val srcUrl = freshDerby("collsrc")
      val dstUrl = freshDerby("colldst") +
        ";collation=TERRITORY_BASED;territory=en_US"
      val srcDb = TableCopy.JdbcStore(srcUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val dstDb = TableCopy.JdbcStore(dstUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      srcDb.write(TableCopy.ParquetStore(dir).read(s, "customer")
        .where("c_custkey % 7 = 0").select("c_custkey", "c_name"),
        "cust", TableCopy.Recreate)
      TableCopy.copy(s, srcDb, dstDb, "cust", TableCopy.Recreate)
      def aLtB(url: String): Boolean = {
        val c = java.sql.DriverManager.getConnection(url)
        try {
          val rs = c.createStatement().executeQuery(
            "VALUES CASE WHEN 'a' < 'B' THEN 1 ELSE 0 END")
          rs.next()
          rs.getInt(1) == 1
        } finally c.close()
      }
      dstDb.read(s, "cust")
        .agg(count(lit(1)).as("n_rows"), sum("c_custkey").as("sum_custkey"))
        .select(col("n_rows"), col("sum_custkey"),
          lit(srcDb.collation().getOrElse("?")).as("src_collation"),
          lit(dstDb.collation().getOrElse("?")).as("dest_collation"),
          lit(srcDb.collation() != dstDb.collation()).as("collation_mismatch"),
          lit(aLtB(srcUrl)).as("src_a_lt_b"),
          lit(aLtB(dstUrl)).as("dest_a_lt_b"))
    }),
    // TRIGGER replication (the last SMO-parity fact, VERDICT r9 #4): the
    // source is a real Derby database carrying an AFTER INSERT audit
    // trigger; the copy DISCOVERS it from SYS.SYSTRIGGERS (not an override
    // echo), scripts CREATE TRIGGER onto the destination AFTER the bulk
    // load, and the live probes prove the semantics landed: the bulk-loaded
    // rows fired NOTHING (audit empty after copy — SqlBulkCopy's
    // no-FireTriggers default), while a post-copy INSERT on the destination
    // fires the replicated trigger exactly once.
    "copy_jdbc_triggers" -> ((s, dir) => {
      val srcUrl = freshDerby("trgsrc")
      val dstUrl = freshDerby("trgdst")
      val srcDb = TableCopy.JdbcStore(srcUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val dstDb = TableCopy.JdbcStore(dstUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      srcDb.write(TableCopy.ParquetStore(dir).read(s, "customer")
        .where("c_custkey % 5 = 0").select("c_custkey", "c_acctbal"),
        "acct", TableCopy.Recreate)
      locally {
        val c = java.sql.DriverManager.getConnection(srcUrl)
        try {
          c.createStatement().executeUpdate(
            """CREATE TABLE acct_audit ("c_custkey" BIGINT, "note" VARCHAR(16))""")
          c.createStatement().executeUpdate(
            """CREATE TRIGGER acct_tr AFTER INSERT ON acct """ +
              """REFERENCING NEW AS N FOR EACH ROW """ +
              """INSERT INTO acct_audit VALUES (N."c_custkey", 'ins')""")
        } finally c.close()
      }
      // Audit table first (the trigger's action references it), then the
      // trigger-bearing table with replicateMeta = catalog discovery.
      TableCopy.copy(s, srcDb, dstDb, "acct_audit", TableCopy.Recreate)
      TableCopy.copy(s, srcDb, dstDb, "acct", TableCopy.Recreate,
        replicateMeta = true)
      val back = dstDb.meta(s, "acct")
      val c = java.sql.DriverManager.getConnection(dstUrl)
      val (auditBulk, auditLive) =
        try {
          val rs0 = c.createStatement().executeQuery(
            "SELECT COUNT(*) FROM acct_audit")
          rs0.next()
          val nBulk = rs0.getLong(1)
          c.createStatement().executeUpdate(
            """INSERT INTO acct ("c_custkey", "c_acctbal") VALUES (-1, 0.0)""")
          val rs1 = c.createStatement().executeQuery(
            """SELECT COUNT(*) FROM acct_audit """ +
              """WHERE "c_custkey" = -1 AND "note" = 'ins'""")
          rs1.next()
          val nLive = rs1.getLong(1)
          (nBulk, nLive)
        } finally c.close()
      dstDb.read(s, "acct").where(col("c_custkey") >= 0)
        .agg(count(lit(1)).as("n_rows"), sum("c_custkey").as("sum_custkey"))
        .select(col("n_rows"), col("sum_custkey"),
          lit(back.triggers.map { case (n, d) =>
            s"$n(after_insert=${d.contains("AFTER INSERT")}," +
              s"row=${d.contains("FOR EACH ROW")})"
          }.mkString(";")).as("dest_triggers"),
          lit(auditBulk).as("audit_rows_after_copy"),
          lit(auditLive).as("audit_rows_after_insert"))
    }),
    // VIEWS on the JDBC copy path (VERDICT r11 #7): views are discovered
    // from the live SOURCE catalog (Derby SYS.SYSVIEWS — executable DDL),
    // replicated onto the destination AFTER the base table, with
    // view-on-view dependencies resolved by rounds — exercised here by
    // naming the DEPENDENT view alphabetically FIRST ("a_top" over
    // "z_base"), so round 1 must fail it and round 2 create it. The
    // oracle facts are all destination-side: the dest catalog readback
    // (discovery, not an echo) and a live query THROUGH the replicated
    // view stack.
    "copy_jdbc_views" -> ((s, dir) => {
      val srcUrl = freshDerby("viewsrc")
      val dstUrl = freshDerby("viewdst")
      val srcDb = TableCopy.JdbcStore(srcUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val dstDb = TableCopy.JdbcStore(dstUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      TableCopy.copy(s, TableCopy.ParquetStore(dir), srcDb, "nation",
        TableCopy.Recreate)
      locally {
        val c = java.sql.DriverManager.getConnection(srcUrl)
        try {
          c.createStatement().executeUpdate(
            """CREATE VIEW z_base AS SELECT "n_nationkey", "n_name" """ +
              """FROM nation WHERE "n_regionkey" <= 2""")
          c.createStatement().executeUpdate(
            """CREATE VIEW a_top AS SELECT "n_name" FROM z_base """ +
              """WHERE "n_nationkey" > 4""")
        } finally c.close()
      }
      TableCopy.copy(s, srcDb, dstDb, "nation", TableCopy.Recreate)
      val manifest = TableCopy.copyViews(s, srcDb, dstDb)
      val back = dstDb.views(s).map(_._1)
      val c = java.sql.DriverManager.getConnection(dstUrl)
      val (nTop, names) =
        try {
          val rs = c.createStatement().executeQuery(
            """SELECT COUNT(*) FROM a_top""")
          rs.next(); val n = rs.getLong(1)
          val rs2 = c.createStatement().executeQuery(
            """SELECT "n_name" FROM a_top ORDER BY "n_name"""")
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          while (rs2.next()) b += rs2.getString(1)
          (n, b.mkString(","))
        } finally c.close()
      dstDb.read(s, "nation")
        .agg(count(lit(1)).as("n_rows"), sum("n_nationkey").as("sum_nkey"))
        .select(col("n_rows"), col("sum_nkey"),
          lit(manifest.map { case (n, r) => s"$n=r$r" }.mkString(";"))
            .as("view_rounds"),
          lit(back.mkString(",")).as("dest_views"),
          lit(nTop).as("n_top_rows"),
          lit(names).as("top_names"))
    }),
    // Stored-procedure / function / sequence replication (SMO parity one
    // step past views, r13 #385): discover from the live Derby catalog,
    // replay on the destination, then LIVE-FIRE all three there — the
    // function computes, the procedure CALLs, and the sequence CONTINUES
    // past every source-issued value (the KeepIdentity analogue).
    "copy_jdbc_procs" -> ((s, dir) => {
      val srcUrl = freshDerby("procsrc")
      val dstUrl = freshDerby("procdst")
      val srcDb = TableCopy.JdbcStore(srcUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val dstDb = TableCopy.JdbcStore(dstUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      locally {
        val c = java.sql.DriverManager.getConnection(srcUrl)
        try {
          val st = c.createStatement()
          st.executeUpdate("CREATE SEQUENCE ORD_SEQ AS BIGINT " +
            "START WITH 100 INCREMENT BY 5 " +
            "MINVALUE 1 MAXVALUE 1000000 NO CYCLE")
          // Consume two values so the live position sits past START WITH
          // (fetch the row: Derby issues NEXT VALUE lazily on fetch).
          (1 to 2).foreach { _ =>
            val r = st.executeQuery("VALUES NEXT VALUE FOR ORD_SEQ")
            r.next(); r.close()
          }
          st.executeUpdate("CREATE FUNCTION ABS_F(X DOUBLE) RETURNS DOUBLE " +
            "PARAMETER STYLE JAVA NO SQL LANGUAGE JAVA " +
            "EXTERNAL NAME 'java.lang.Math.abs'")
          st.executeUpdate("CREATE PROCEDURE NAP(IN MS BIGINT) " +
            "PARAMETER STYLE JAVA NO SQL LANGUAGE JAVA " +
            "EXTERNAL NAME 'java.lang.Thread.sleep'")
        } finally c.close()
      }
      val manifest = TableCopy.copyRoutines(s, srcDb, dstDb)
      val d = java.sql.DriverManager.getConnection(dstUrl)
      val (absV, napOk, seqNext) =
        try {
          val rs = d.createStatement().executeQuery("VALUES ABS_F(-7.5E0)")
          rs.next(); val a = rs.getDouble(1)
          d.prepareCall("CALL NAP(1)").execute()
          val rs2 = d.createStatement()
            .executeQuery("VALUES NEXT VALUE FOR ORD_SEQ")
          rs2.next(); val nxt = rs2.getLong(1)
          (a, true, nxt)
        } finally d.close()
      s.range(1).select(
        lit(manifest.map { case (n, k, st) => s"$n:$k=$st" }.mkString(";"))
          .as("manifest"),
        lit(absV).as("abs_result"),
        lit(napOk).as("proc_called"),
        // The destination sequence continues on the source's grid, past
        // BOTH source-issued values (100, 105).
        lit(seqNext >= 110 && (seqNext - 100) % 5 == 0).as("seq_continues"))
    }),
    // Synonym replication (§2.1 #391): table + view + a synonym chain on
    // the source; base objects copy first, then copySynonyms replays the
    // aliases, and the destination is queried THROUGH the chain — the
    // readback proving both the DDL replay and live resolution.
    "copy_jdbc_synonyms" -> ((s, dir) => {
      val srcDb = TableCopy.JdbcStore(freshDerby("synsrc"),
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val dstDb = TableCopy.JdbcStore(freshDerby("syndst"),
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      TableCopy.copy(s, TableCopy.ParquetStore(dir), srcDb, "nation",
        TableCopy.Recreate): Unit
      locally {
        val c = java.sql.DriverManager.getConnection(srcDb.url)
        try {
          val st = c.createStatement()
          st.executeUpdate("CREATE VIEW NAT_BIG AS SELECT * FROM nation " +
            "WHERE \"n_nationkey\" >= 10")
          st.executeUpdate("CREATE SYNONYM NAT_SYN FOR nation")
          st.executeUpdate("CREATE SYNONYM NATV_SYN FOR NAT_BIG")
          st.executeUpdate("CREATE SYNONYM NAT_CHAIN FOR NAT_SYN"): Unit
        } finally c.close()
      }
      TableCopy.copy(s, srcDb, dstDb, "nation", TableCopy.Recreate): Unit
      TableCopy.copyViews(s, srcDb, dstDb): Unit
      val manifest = TableCopy.copySynonyms(s, srcDb, dstDb)
      val d = java.sql.DriverManager.getConnection(dstDb.url)
      val (chainRows, chainSum, viewRows) =
        try {
          val rs = d.createStatement().executeQuery(
            "SELECT COUNT(*), SUM(\"n_nationkey\") FROM NAT_CHAIN")
          rs.next(); val (n, sm) = (rs.getLong(1), rs.getLong(2))
          val rs2 = d.createStatement()
            .executeQuery("SELECT COUNT(*) FROM NATV_SYN")
          rs2.next(); (n, sm, rs2.getLong(1))
        } finally d.close()
      s.range(1).select(
        lit(manifest.map { case (n, st) => s"$n=$st" }.mkString(";"))
          .as("manifest"),
        lit(chainRows).as("chain_rows"), lit(chainSum).as("chain_sum"),
        lit(viewRows).as("view_rows"))
    }),
    // Permission replication (§2.1 #392): a sqlAuthorization source grants
    // table- and column-level privileges; the copy replays them and the
    // DESTINATION engine is probed live per principal — granted verbs
    // work, ungranted verbs are rejected (42500/42502), and a column-
    // scoped UPDATE is allowed on exactly its column.
    "copy_jdbc_grants" -> ((s, dir) => {
      val srcUrl = freshDerbyAuthz("grantsrc")
      val dstUrl = freshDerbyAuthz("grantdst")
      val srcDb = TableCopy.JdbcStore(srcUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val dstDb = TableCopy.JdbcStore(dstUrl,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      TableCopy.copy(s, TableCopy.ParquetStore(dir), srcDb, "region",
        TableCopy.Recreate): Unit
      locally {
        val c = java.sql.DriverManager.getConnection(srcUrl)
        try {
          val st = c.createStatement()
          st.executeUpdate("GRANT SELECT ON region TO ALICE")
          st.executeUpdate("GRANT SELECT, UPDATE ON region TO BOB")
          st.executeUpdate("GRANT UPDATE (\"r_name\") ON region TO CAROL"): Unit
        } finally c.close()
      }
      TableCopy.copy(s, srcDb, dstDb, "region", TableCopy.Recreate): Unit
      val manifest = TableCopy.copyGrants(s, srcDb, dstDb, Seq("region"))
      def as(user: String): java.sql.Connection =
        java.sql.DriverManager.getConnection(s"$dstUrl;user=$user")
      def denied(c: java.sql.Connection, sql: String): Boolean =
        try { c.createStatement().execute(sql); false }
        catch { case e: java.sql.SQLException =>
          Set("42500", "42502")(e.getSQLState) }
      val a = as("alice")
      val (aliceRows, aliceSum, aliceUpdDenied) =
        try {
          val rs = a.createStatement().executeQuery(
            "SELECT COUNT(*), SUM(\"r_regionkey\") FROM APP.region")
          rs.next()
          (rs.getLong(1), rs.getLong(2),
            denied(a, "UPDATE APP.region SET \"r_name\" = 'X'"))
        } finally a.close()
      val m = as("mallory")
      val mallorySelDenied =
        try denied(m, "SELECT COUNT(*) FROM APP.region") finally m.close()
      val ca = as("carol")
      val (carolNameOk, carolKeyDenied) =
        try {
          // Constant assignments, no WHERE: a predicate or a column
          // reference on the right-hand side would READ a column carol
          // has no SELECT grant on — the denial would then test the
          // wrong privilege (probed: Derby rejects the READ first).
          val ok =
            try { ca.createStatement()
              .executeUpdate("UPDATE APP.region SET \"r_name\" = 'ZZZ'")
              true }
            catch { case _: java.sql.SQLException => false }
          (ok, denied(ca, "UPDATE APP.region SET \"r_regionkey\" = 99"))
        } finally ca.close()
      s.range(1).select(
        lit(manifest.map { case (t, g, p, cs, st) => s"$t:$g:$p:$cs=$st" }
          .mkString(";")).as("manifest"),
        lit(aliceRows).as("alice_rows"), lit(aliceSum).as("alice_sum"),
        lit(aliceUpdDenied).as("alice_update_denied"),
        lit(mallorySelDenied).as("mallory_select_denied"),
        lit(carolNameOk).as("carol_name_update_ok"),
        lit(carolKeyDenied).as("carol_key_update_denied"))
    }),
    // -WhatIf / dry-run: the full execution plan — FK-topological order,
    // row estimates, and the EXACT DDL each table would get (shared code
    // path with the real copy, so the preview can't drift) — with NOTHING
    // written; the require proves the destination catalog stayed empty.
    "copy_whatif" -> ((s, dir) => {
      val db = TableCopy.JdbcStore(
        freshDerby("whatif"),
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val metas = Map(
        "region" -> TableCopy.TableMeta(primaryKey = Seq("r_regionkey")),
        "nation" -> TableCopy.TableMeta(primaryKey = Seq("n_nationkey"),
          foreignKeys = Seq(("n_regionkey", "region", "r_regionkey"))))
      val plan = TableCopy.whatIfCopy(s, TableCopy.ParquetStore(dir), db,
        metas, include = Seq("region", "nation"))
      val planned = plan.localCheckpoint(true)
      require(db.list(s).isEmpty, "WhatIf wrote to the destination")
      planned
    }),
    // FK-aware multi-table copy into a Derby destination with ENFORCED
    // foreign keys: the copy order is derived topologically from the FK
    // metadata (region before nation before customer) — the alphabetical /
    // catalog order copyTables uses would fail the child-first load. The
    // manifest's seq column IS the copy order, and the destination's
    // enforced constraints prove every parent was there first.
    "copy_fk_ordered" -> ((s, dir) => {
      val db = TableCopy.JdbcStore(
        freshDerby("fkorder"),
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val metas = Map(
        "region" -> TableCopy.TableMeta(primaryKey = Seq("r_regionkey")),
        "nation" -> TableCopy.TableMeta(primaryKey = Seq("n_nationkey"),
          foreignKeys = Seq(("n_regionkey", "region", "r_regionkey"))),
        "customer" -> TableCopy.TableMeta(primaryKey = Seq("c_custkey"),
          foreignKeys = Seq(("c_nationkey", "nation", "n_nationkey"))))
      TableCopy.copyTablesWithSchema(s, TableCopy.ParquetStore(dir), db,
        metas, include = Seq("customer", "nation", "region"))
    }),
    // §2.2 relational surface
    "q_filter_pushdown" -> ((s, dir) => Relational.filterPushdown(s, dir)),
    "q_agg_q1" -> ((s, dir) => Relational.aggQ1(s, dir)),
    "q_join_broadcast" -> ((s, dir) => Relational.joinBroadcast(s, dir)),
    "q_join_star" -> ((s, dir) => Relational.joinStar(s, dir)),
    "q_topn" -> ((s, dir) => Relational.topN(s, dir)),
    "q_window" -> ((s, dir) => Relational.windowFuncs(s, dir)),
    "q_time_bucket" -> ((s, dir) => Relational.timeBucket(s, dir)),
    "q_json_props" -> ((s, dir) => Relational.jsonProps(s, dir)),
    "q_setops" -> ((s, dir) => Relational.setOps(s, dir)),
    "q_semijoin" -> ((s, dir) => Relational.semiJoin(s, dir)),
    "q_antijoin" -> ((s, dir) => Relational.antiJoin(s, dir)),
    "q_rollup" -> ((s, dir) => Relational.rollupAgg(s, dir)),
    "q_distinct" -> ((s, dir) => Relational.distinctJoin(s, dir)),
    "q_string_funcs" -> ((s, dir) => Relational.stringFuncs(s, dir)),
    "q_sort_multi" -> ((s, dir) => Relational.sortMulti(s, dir)),
    "q_having" -> ((s, dir) => Relational.havingAgg(s, dir)),
    "q_casewhen" -> ((s, dir) => Relational.caseWhenAgg(s, dir)),
    "q_cube" -> ((s, dir) => Relational.cubeAgg(s, dir)),
    "q_topk_group" -> ((s, dir) => Relational.topKPerGroup(s, dir)),
    // Same top-k-per-group semantics executed by the CUSTOM physical
    // operator (bounded per-key heaps, no full partition sort).
    "q_topk_exec" -> ((s, dir) => {
      val orders = graft.sources.Tables.load(s, dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
      graft.plans.TopKPerKey(orders, Seq("o_orderpriority"),
          Seq(("o_totalprice", false), ("o_orderkey", true)), 5)
        .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
    }),
    "q_corr" -> ((s, dir) => Relational.corrAgg(s, dir)),
    "q_date_funcs" -> ((s, dir) => Relational.dateFuncs(s, dir)),
    "q_join_salted" -> ((s, dir) => Relational.joinSalted(s, dir)),
    "q_join_bloom" -> ((s, dir) => Relational.bloomJoin(s, dir)),
    "q_percentile" -> ((s, dir) => Relational.percentileAgg(s, dir)),
    "q_histogram" -> ((s, dir) => Relational.histogram(s, dir)),
    "q_outerjoin" -> ((s, dir) => Relational.outerJoin(s, dir)),
    "q_running" -> ((s, dir) => Relational.runningSum(s, dir)),
    "q_pivot" -> ((s, dir) => Relational.pivotAgg(s, dir)),
    "q_asof_join" -> ((s, dir) => Relational.asofJoin(s, dir)),
    "q_date_spine" -> ((s, dir) => Relational.dateSpine(s, dir)),
    "q_interval_join" -> ((s, dir) => Relational.intervalJoin(s, dir)),
    "q_interval_join_rule" -> ((s, dir) => Relational.intervalJoinViaRule(s, dir)),
    "q_window_distinct" -> ((s, dir) => Relational.windowDistinct(s, dir)),
    "q_session_path" -> ((s, dir) => Relational.sessionPaths(s, dir)),
    "q_mom" -> ((s, dir) => Relational.momRevenue(s, dir)),
    "q_gini" -> ((s, dir) => Relational.giniRevenue(s, dir)),
    "q_benford" -> ((s, dir) => Relational.benfordDigits(s, dir)),
    "q_autocorr" -> ((s, dir) => Relational.autocorrDaily(s, dir)),
    "q_churn" -> ((s, dir) => Relational.churnWeekly(s, dir)),
    "q_rfm" -> ((s, dir) => Relational.rfmSegments(s, dir)),
    "q_doc_rarity" -> ((s, dir) => TextAnalysis.docRarity(s, dir)),
    "q_readability" -> ((s, dir) => TextAnalysis.readability(s, dir)),
    "q_tpch_q5" -> ((s, dir) => Relational.tpchQ5(s, dir)),
    "q_hour_profile" -> ((s, dir) => Relational.hourProfile(s, dir)),
    "q_lag_features" -> ((s, dir) => Relational.lagFeatures(s, dir)),
    "q_tpch_q18" -> ((s, dir) => Relational.tpchQ18(s, dir)),
    "q_order_cadence" -> ((s, dir) => Relational.orderCadence(s, dir)),
    "q_source_lang_mix" -> ((s, dir) => Curation.sourceLangMix(s, dir)),
    "q_tpch_q6" -> ((s, dir) => Relational.tpchQ6(s, dir)),
    "q_growth" -> ((s, dir) => Relational.growthAccounting(s, dir)),
    "q_lang_confusion" -> ((s, dir) => TextAnalysis.langConfusion(s, dir)),
    "q_dedup_stats" -> ((s, dir) => Dedup.curateStats(s, dir)),
    "q_active_span" -> ((s, dir) => Relational.activitySpan(s, dir)),
    "q_abandon" -> ((s, dir) => Relational.intervalAntiJoin(s, dir)),
    "q_user_overlap" -> ((s, dir) => Relational.userOverlap(s, dir)),
    "q_dup_source" -> ((s, dir) => Dedup.dupRateBySource(s, dir)),
    "q_dup_matrix" -> ((s, dir) => Dedup.dupMatrix(s, dir)),
    "q_containment" -> ((s, dir) => Dedup.containmentPairs(s, dir)),
    "copy_verified" -> ((s, dir) =>
      TableCopy.copyVerified(s, dir, tmp("verified"), "nation")),
    "q_dau_mau" -> ((s, dir) => Relational.dauMau(s, dir)),
    "q_zipf" -> ((s, dir) => TextAnalysis.zipfFit(s, dir)),
    "q_sql_kernel" -> ((s, dir) => Dedup.simhashViaSql(s, dir)),
    "q_tpch_q3" -> ((s, dir) => Relational.tpchQ3(s, dir)),
    "q_tpch_q7" -> ((s, dir) => Relational.tpchQ7(s, dir)),
    "q_tpch_q8" -> ((s, dir) => Relational.tpchQ8(s, dir)),
    "q_tpch_q10" -> ((s, dir) => Relational.tpchQ10(s, dir)),
    "q_tpch_q13" -> ((s, dir) => Relational.tpchQ13(s, dir)),
    "q_tpch_q14" -> ((s, dir) => Relational.tpchQ14(s, dir)),
    "q_tpch_q15" -> ((s, dir) => Relational.tpchQ15(s, dir)),
    "q_tpch_q4" -> ((s, dir) => Relational.tpchQ4(s, dir)),
    "q_tpch_q17" -> ((s, dir) => Relational.tpchQ17(s, dir)),
    "q_tpch_q22" -> ((s, dir) => Relational.tpchQ22(s, dir)),
    "q_tpch_q19" -> ((s, dir) => Relational.tpchQ19(s, dir)),
    "q_tpch_q21" -> ((s, dir) => Relational.tpchQ21(s, dir)),
    "q_tpch_q9" -> ((s, dir) => Relational.tpchQ9(s, dir)),
    "q_tpch_q12" -> ((s, dir) => Relational.tpchQ12(s, dir)),
    "q_tpch_q2" -> ((s, dir) => Relational.tpchQ2(s, dir)),
    "q_tpch_q11" -> ((s, dir) => Relational.tpchQ11(s, dir)),
    "q_tpch_q16" -> ((s, dir) => Relational.tpchQ16(s, dir)),
    "q_tpch_q20" -> ((s, dir) => Relational.tpchQ20(s, dir)),
    "q_pareto" -> ((s, dir) => Relational.paretoRevenue(s, dir)),
    "q_market_basket" -> ((s, dir) => Relational.marketBasket(s, dir)),
    "q_new_vs_repeat" -> ((s, dir) => Relational.newVsRepeat(s, dir)),
    "q_prefix_dup" -> ((s, dir) => Dedup.prefixDup(s, dir)),
    "q_template_dup" -> ((s, dir) => Dedup.templateDup(s, dir)),
    "q_vocab_growth" -> ((s, dir) => TextAnalysis.vocabGrowth(s, dir)),
    "q_sliding_window" -> ((s, dir) => Relational.slidingWindow(s, dir)),
    "q_percentile_cont" -> ((s, dir) => Relational.percentileCont(s, dir)),
    // The stored file carries the mapped DECIMAL type (SparkEntrySpec pins
    // the schema); the compare projects it to DOUBLE because the driver's
    // pandas compare can't equate DuckDB and parquet decimal encodings.
    "copy_mapped" -> ((s, dir) => {
      TableCopy.copyMapped(s, dir, tmp("mapped"), "customer", Seq(
        ("c_custkey", "customer_id", "bigint"),
        ("c_name", "full_name", "string"),
        ("c_acctbal", "balance", "decimal(12,2)")))
      s.read.parquet(s"${tmp("mapped")}/customer.parquet")
        .withColumn("balance", col("balance").cast("double"))
        .orderBy("customer_id")
    }),
    "q_sessionize" -> ((s, dir) => Relational.sessionizeBatch(s, dir)),
    "q_transition" -> ((s, dir) => Relational.transitions(s, dir)),
    // Snapshot diff / upsert exercise a deterministic "stale copy": dest is
    // missing every 10th key and has drifted prices on every 7th.
    "q_copy_diff" -> ((s, dir) => {
      val src = graft.sources.Tables.load(s, dir, "orders")
      val dst = staleOrders(s, dir)
      TableCopy.diffTables(src, dst, Seq("o_orderkey"))
        .groupBy("status").agg(count(lit(1)).as("n_rows"))
        .orderBy("status")
    }),
    "q_copy_upsert" -> ((s, dir) => {
      val fresh = graft.sources.Tables.load(s, dir, "orders")
        .where(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 7 === 0)
      TableCopy.upsert(fresh, staleOrders(s, dir), Seq("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        .orderBy("o_orderkey")
    }),
    // §2.3 LLM-data-pipeline operators
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(s, dir)),
    "q_neardup_jaccard" -> ((s, dir) => Dedup.nearDupJaccard(s, dir)),
    "q_neardup_simhash" -> ((s, dir) => Dedup.nearDupSimhash(s, dir)),
    "q_ann_brute" -> ((s, dir) => Similarity.bruteTopK(s, dir)),
    "q_ann_mips" -> ((s, dir) => Similarity.annMips(s, dir)),
    "q_ann_recall" -> ((s, dir) => Similarity.annRecall(s, dir)),
    "q_data_recipe" -> ((s, dir) => Curation.dataRecipe(s, dir)),
    // maxBits=12 caps auto-nBits where the oracle's embedded planes end —
    // exact up to 2^14 vectors; the library default (24) scales further.
    "q_ann_lsh" -> ((s, dir) => Similarity.lshTopK(s, dir, maxBits = 12)),
    "q_neardup_embed" -> ((s, dir) => Similarity.nearDupEmbedding(s, dir, maxBits = 12)),
    "q_knn_graph" -> ((s, dir) => Similarity.knnGraph(s, dir, maxBits = 12)),
    "q_semantic_cluster" -> ((s, dir) => Similarity.semanticClusters(s, dir, maxBits = 12)),
    "q_ann_ivf" -> ((s, dir) => Similarity.ivfTopK(s, dir)),
    "q_ann_sq" -> ((s, dir) => Similarity.sqTopK(s, dir)),
    "q_ann_pq" -> ((s, dir) => Similarity.pqTopK(s, dir)),
    "q_ann_ivfpq" -> ((s, dir) => Similarity.ivfPqTopK(s, dir)),
    "q_mrl_recall" -> ((s, dir) => Similarity.mrlRecall(s, dir)),
    "q_ann_ivf_indexed" -> ((s, dir) =>
      Similarity.ivfTopKIndexed(s, dir, tmp("ivf_index"))),
    "q_text_stats" -> ((s, dir) => TextAnalysis.textStats(s, dir)),
    "q_langid" -> ((s, dir) => TextAnalysis.langId(s, dir)),
    "q_token_count" -> ((s, dir) => TextAnalysis.tokenCount(s, dir)),
    "q_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(s, dir)),
    "q_entropy" -> ((s, dir) => TextAnalysis.entropy(s, dir)),
    "q_quality_score" -> ((s, dir) => TextAnalysis.qualityScore(s, dir)),
    "q_quality_by_source" -> ((s, dir) => TextAnalysis.qualityBySource(s, dir)),
    "q_incremental_dedup" -> ((s, dir) => Dedup.incrementalDedup(s, dir)),
    "q_multimodal_meta" -> ((s, dir) => Multimodal.decodeMeta(s, dir)),
    "q_resize_plan" -> ((s, dir) => Multimodal.resizePlan(s, dir)),
    "q_byte_features" -> ((s, dir) => Multimodal.byteFeatures(s, dir)),
    "q_image_dedup" -> ((s, dir) => Multimodal.imageDedup(s, dir)),
    "q_split_hash" -> ((s, dir) => TextAnalysis.splitHash(s, dir)),
    "q_curate" -> ((s, dir) => Dedup.curate(s, dir)),
    "q_dedup_cluster" -> ((s, dir) => Dedup.dedupClusters(s, dir)),
    "q_repetition" -> ((s, dir) => Curation.repetition(s, dir)),
    "q_ngram_freq" -> ((s, dir) => Curation.ngramFreq(s, dir)),
    "q_source_mix" -> ((s, dir) => Curation.sourceMix(s, dir)),
    "q_token_pack" -> ((s, dir) => Curation.tokenPack(s, dir)),
    "q_pii_scrub" -> ((s, dir) => Curation.piiScrub(s, dir)),
    "q_decontaminate" -> ((s, dir) => Curation.decontaminate(s, dir)),
    "q_span_dedup" -> ((s, dir) => Curation.spanDedup(s, dir)),
    "q_embed_stats" -> ((s, dir) => Similarity.embedStats(s, dir)),
    "q_fk_check" -> ((s, dir) => TableCopy.fkCheck(s, dir)),
    "q_copy_partitioned" -> ((s, dir) => {
      val dest = tmp("partitioned")
      TableCopy.copyPartitioned(s, dir, dest)
      TableCopy.partitionPrunedAgg(s, dest)
    }),
    "q_copy_bucketed" -> ((s, dir) => TableCopy.copyBucketed(s, dir, tmp("bucketed"))),
    "q_stats_profile" -> ((s, dir) => TableCopy.statsProfile(s, dir)),
    "q_sample_stratified" -> ((s, dir) => Curation.sampleStratified(s, dir)),
    "q_sample_stratified_agg" -> ((s, dir) => Curation.sampleStratifiedAgg(s, dir)),
    // Sketch VALUES are engine-specific, but the error CONTRACT is oracle-
    // checkable: the query emits within-tolerance booleans vs exact twins
    // computed in the same pass, and the oracle asserts them TRUE.
    "q_approx_stats" -> ((s, dir) => Curation.approxStats(s, dir)),
    "q_heavy_hitters" -> ((s, dir) => Curation.heavyHitters(s, dir)),
    "q_oov_rate" -> ((s, dir) => Curation.oovRate(s, dir)),
    "q_heavy_hitters_grouped" -> ((s, dir) => Curation.heavyHittersGrouped(s, dir)),
    "q_cooccur_pmi" -> ((s, dir) => Curation.cooccurPmi(s, dir)),
    "q_frame_sample" -> ((s, dir) => Multimodal.frameSample(s, dir)),
    "q_explode" -> ((s, dir) => Relational.explodeTokens(s, dir)),
    "q_window_suite" -> ((s, dir) => Relational.windowSuite(s, dir)),
    "copy_compact" -> ((s, dir) => {
      val dest = tmp("fragmented")
      graft.sources.Tables.load(s, dir, "orders").repartition(64)
        .write.mode("overwrite").parquet(dest)
      TableCopy.compact(s, dest)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        .orderBy("o_orderkey")
    }),
    "copy_evolve" -> ((s, dir) => TableCopy.copyEvolve(s, dir, tmp("evolve"))),
    "q_constraints" -> ((s, dir) => TableCopy.constraintCheck(s, dir)),
    "q_unpivot" -> ((s, dir) => Relational.unpivotMeasures(s, dir)),
    "q_grouping_sets" -> ((s, dir) => Relational.groupingSets(s, dir)),
    "q_setops_all" -> ((s, dir) => Relational.setOpsAll(s, dir)),
    "q_window_range" -> ((s, dir) => Relational.windowRange(s, dir)),
    "q_fuzzy_join" -> ((s, dir) => Relational.fuzzyJoin(s, dir)),
    // SCD Type-2 merge over a deterministic dimension state: current rows
    // as-of 2020 with drifted balances on every 7th key and every 10th key
    // missing, plus pre-existing closed history on every 13th key.
    "q_scd2" -> ((s, dir) => {
      val cust = graft.sources.Tables.load(s, dir, "customer")
      val drift = cust.where(col("c_custkey") % 10 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal")))
      val cur = drift
        .withColumn("valid_from", to_date(lit("2020-01-01")))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(true))
      val hist = drift.where(col("c_custkey") % 13 === 0)
        .withColumn("c_acctbal", col("c_acctbal") - 5.0)
        .withColumn("valid_from", to_date(lit("2019-01-01")))
        .withColumn("valid_to", to_date(lit("2020-01-01")))
        .withColumn("is_current", lit(false))
      TableCopy.scd2Merge(cust, cur.unionByName(hist), Seq("c_custkey"),
          to_date(lit("2021-01-01")))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"),
          col("is_current"))
        .orderBy("c_custkey", "valid_from")
    }),
    // Post-copy verification checksum: source tables plus a freshly copied
    // orders must agree row-for-row — the oracle computes "orders_copy" from
    // the SOURCE table, so the equality of the copied checksum is itself the
    // verified claim.
    "q_table_checksum" -> ((s, dir) => {
      TableCopy.copyTable(s, dir, tmp("chksum"), "orders", TableCopy.Truncate)
      TableCopy.checksumTables(s, dir, Seq("nation" -> "nation", "orders" -> "orders"))
        .unionAll(TableCopy.checksumTables(s, tmp("chksum"), Seq("orders_copy" -> "orders")))
        .orderBy("table_name")
    }),
    "copy_clustered" -> ((s, dir) => {
      TableCopy.copyClustered(s, dir, tmp("clustered"))
        .where(year(col("o_orderdate")) === 1996)
        .groupBy(month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_price"))
        .orderBy("o_month")
    }),
    "q_funnel" -> ((s, dir) => Relational.funnel(s, dir)),
    "q_retention" -> ((s, dir) => Relational.retention(s, dir)),
    "q_anomaly_mad" -> ((s, dir) => Relational.anomalyMad(s, dir)),
    "q_listagg" -> ((s, dir) => Relational.listAgg(s, dir)),
    "q_attribution" -> ((s, dir) => Relational.attribution(s, dir)),
    "q_variant" -> ((s, dir) => Relational.variantProps(s, dir)),
    "q_locf" -> ((s, dir) => Relational.locfFill(s, dir)),
    "q_ab_test" -> ((s, dir) => Relational.abTest(s, dir)),
    "q_winsorize" -> ((s, dir) => Relational.winsorize(s, dir)),
    "q_ngram_lm" -> ((s, dir) => TextAnalysis.ngramLm(s, dir)),
    "q_skew_profile" -> ((s, dir) => TableCopy.skewProfile(s, dir)),
    "q_ivm" -> ((s, dir) => TableCopy.maintainAggView(s, dir)),
    "q_embed_drift" -> ((s, dir) => Similarity.embedDrift(s, dir)),
    "copy_masked" -> ((s, dir) =>
      TableCopy.maskedCopy(s, dir, tmp("masked"), "customer",
        Map("c_name" -> TableCopy.Hash, "c_acctbal" -> TableCopy.Redact))
        .orderBy("c_custkey")),
    "q_doc_chunks" -> ((s, dir) => Curation.docChunks(s, dir)),
    // maxBits pinned to 12 where the oracle's embedded planes end, as for
    // the other LSH-backed entries (q_ann_lsh, q_knn_graph, q_semantic_cluster).
    "q_pagerank" -> ((s, dir) => Similarity.pageRank(s, dir, maxBits = 12)),
    "q_keywords" -> ((s, dir) => TextAnalysis.keywords(s, dir)),
    "q_kmeans" -> ((s, dir) => Similarity.kmeans(s, dir)),
    "q_rand_proj" -> ((s, dir) => Similarity.randProject(s, dir)),
    "q_cdc_collapse" -> ((s, dir) => TableCopy.cdcCollapse(s, dir)),
    // Constraint-routed load: dirty rows divert to quarantine with the
    // first failing rule's name; the oracle rebuilds the same dirty feed
    // and routing verdicts relationally.
    "q_quarantine" -> ((s, dir) =>
      TableCopy.quarantineCopy(s, dirtyOrders(s, dir), tmp("quarantine"),
        Seq("price_nonpositive" -> (col("o_totalprice") <= 0d),
            "status_domain" -> !col("o_orderstatus").isin("F", "O", "P")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "reason")
        .orderBy("o_orderkey")),
    "q_sample_weighted" -> ((s, dir) => Curation.sampleWeighted(s, dir)),
    "q_bm25" -> ((s, dir) => TextAnalysis.bm25(s, dir)),
    // Versioned snapshot copy (time travel): v1 is a half-table snapshot,
    // v2 the full table with drifted balances; BOTH versions read back
    // concurrently — v1 undisturbed by the v2 write — and aggregate per
    // version. The oracle recomputes each version's state from the source.
    "copy_versioned" -> ((s, dir) => {
      val dest = tmp("versioned")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dest), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dest/customer"), true)
      val cust = graft.sources.Tables.load(s, dir, "customer")
      TableCopy.writeSnapshot(s, cust.where(col("c_custkey") % 2 === 0),
        dest, "customer")
      TableCopy.writeSnapshot(s, cust.withColumn("c_acctbal",
        when(col("c_custkey") % 3 === 0, col("c_acctbal") + 10.0)
          .otherwise(col("c_acctbal"))), dest, "customer")
      def agg(df: DataFrame, v: Int): DataFrame = df
        .groupBy(lit(v).as("version"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_acctbal"))
      agg(TableCopy.readSnapshot(s, dest, "customer", version = 1), 1)
        .unionByName(agg(TableCopy.readSnapshot(s, dest, "customer"), 2))
        .orderBy("version")
    }),
    // High-watermark incremental sync: dest has everything before 1997;
    // the incremental pass reads only source rows at/past the watermark
    // (pushed to the scan) and reconstructs the source exactly.
    "copy_incremental" -> ((s, dir) => {
      val src = graft.sources.Tables.load(s, dir, "orders")
      val dst = src.where(col("o_orderdate") < to_date(lit("1997-01-01")))
      TableCopy.incrementalCopy(s, src, dst, "o_orderdate", Seq("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        .orderBy("o_orderkey")
    }),
    // r7 additions (§2 #203-#209)
    "q_funnel_time" -> ((s, dir) => Relational.funnelTime(s, dir)),
    "q_concurrency" -> ((s, dir) => Relational.concurrency(s, dir)),
    "q_skyline" -> ((s, dir) => Relational.skyline(s, dir)),
    "q_bootstrap_ci" -> ((s, dir) => Relational.bootstrapCi(s, dir)),
    "q_triangle_count" -> ((s, dir) => Similarity.triangleCount(s, dir, maxBits = 12)),
    "q_rrf_fusion" -> ((s, dir) => TextAnalysis.rrfFusion(s, dir)),
    "q_rbo" -> ((s, dir) => TextAnalysis.rbo(s, dir)),
    "copy_zorder" -> ((s, dir) => TableCopy.zorderCopy(s, dir, tmp("zorder"))),
    "q_quartiles" -> ((s, dir) => Relational.quartiles(s, dir)),
    "q_mutual_info" -> ((s, dir) => Curation.mutualInfo(s, dir)),
    "q_cluster_purity" -> ((s, dir) => Similarity.clusterPurity(s, dir, maxBits = 12)),
    "q_cov_matrix" -> ((s, dir) => Similarity.covMatrix(s, dir)),
    "q_ks_test" -> ((s, dir) => Relational.ksTest(s, dir)),
    "q_psi" -> ((s, dir) => Relational.psi(s, dir)),
    "q_cusum" -> ((s, dir) => Relational.cusum(s, dir)),
    // r7 additions, session 3 (§2 #217-#222)
    "q_streaks" -> ((s, dir) => Relational.streaks(s, dir)),
    "q_linreg" -> ((s, dir) => Relational.linreg(s, dir)),
    "q_hhi" -> ((s, dir) => Relational.hhi(s, dir)),
    "q_seasonality" -> ((s, dir) => Relational.seasonality(s, dir)),
    "q_ewma" -> ((s, dir) => Relational.ewma(s, dir)),
    "q_lateness" -> ((s, dir) => Relational.latenessProfile(s, dir)),
    "q_dup_lang_matrix" -> ((s, dir) => Dedup.dupLangMatrix(s, dir)),
    "q_chi2" -> ((s, dir) => Curation.chi2(s, dir)),
    "q_tokenizer_fertility" -> ((s, dir) => TextAnalysis.tokenizerFertility(s, dir)),
    "copy_sample" -> ((s, dir) => TableCopy.sampledCopy(s, dir, tmp("sample"))),
    // r7 additions, session 4 (§2 #227-#232)
    "q_welch_ttest" -> ((s, dir) => Relational.welchTtest(s, dir)),
    "q_mannwhitney" -> ((s, dir) => Relational.mannWhitney(s, dir)),
    "q_spearman" -> ((s, dir) => Relational.spearman(s, dir)),
    "q_cohort_ltv" -> ((s, dir) => Relational.cohortLtv(s, dir)),
    "q_abc_class" -> ((s, dir) => Relational.abcClass(s, dir)),
    "q_rolling_corr" -> ((s, dir) => Relational.rollingCorr(s, dir)),
    "q_hubness" -> ((s, dir) => Similarity.hubness(s, dir, maxBits = 12)),
    "q_burstiness" -> ((s, dir) => TextAnalysis.burstiness(s, dir)),
    "copy_shard" -> ((s, dir) => TableCopy.shardCopy(s, dir, tmp("shard"))),
    "q_outlier_iqr" -> ((s, dir) => Relational.outlierIqr(s, dir)),
    "q_trimmed_mean" -> ((s, dir) => Relational.trimmedMean(s, dir)),
    "q_reciprocity" -> ((s, dir) => Similarity.reciprocity(s, dir, maxBits = 12)),
    "q_assortativity" -> ((s, dir) => Similarity.assortativity(s, dir, maxBits = 12)),
    "q_hapax" -> ((s, dir) => TextAnalysis.hapax(s, dir)),
    "q_runs_test" -> ((s, dir) => Relational.runsTest(s, dir)),
    "q_elasticity" -> ((s, dir) => Relational.elasticity(s, dir)),
    // Range-partitioned PARALLEL JDBC read: the copy lands in Derby once,
    // then comes back through 8 stride predicates on the key — the
    // multi-connection extract pattern every JDBC source needs at scale
    // (a single-connection read serializes the whole table through one
    // task). The oracle proves the 8 disjoint strides reassemble the
    // table exactly — no dropped or doubled boundary rows.
    "q_theil" -> ((s, dir) => Relational.theil(s, dir)),
    "q_markov_steady" -> ((s, dir) => Relational.markovSteady(s, dir)),
    "q_dup_inflation" -> ((s, dir) => TextAnalysis.dupInflation(s, dir)),
    "q_drawdown" -> ((s, dir) => Relational.drawdown(s, dir)),
    "q_rolling_z" -> ((s, dir) => Relational.rollingZ(s, dir)),
    "q_source_vocab_overlap" -> ((s, dir) => TextAnalysis.sourceVocabOverlap(s, dir)),
    "q_ngram_novelty" -> ((s, dir) => TextAnalysis.ngramNovelty(s, dir)),
    "q_curriculum_interleave" -> ((s, dir) => Curation.curriculumInterleave(s, dir)),
    "copy_dedup" -> ((s, dir) => TableCopy.dedupCopy(s, dir, tmp("dedupcopy"))),
    "q_decay_engagement" -> ((s, dir) => Relational.decayEngagement(s, dir)),
    "q_ab_srm" -> ((s, dir) => Relational.abSrm(s, dir)),
    "q_bloom_fpr" -> ((s, dir) => Relational.bloomFpr(s, dir)),
    "q_cluster_size_hist" -> ((s, dir) => Dedup.clusterSizeHist(s, dir)),
    "q_vocab_coverage" -> ((s, dir) => TextAnalysis.vocabCoverage(s, dir)),
    "q_watermark_reco" -> ((s, dir) => Relational.watermarkReco(s, dir)),
    "q_mode_price" -> ((s, dir) => Relational.modePrice(s, dir)),
    "q_two_hop" -> ((s, dir) => Similarity.twoHop(s, dir, maxBits = 12)),
    "q_xcorr_lags" -> ((s, dir) => Relational.xcorrLags(s, dir)),
    "q_hill_tail" -> ((s, dir) => Relational.hillTail(s, dir)),
    "q_effective_sample" -> ((s, dir) => Relational.effectiveSample(s, dir)),
    "copy_publish" -> ((s, dir) => TableCopy.publishCopy(s, dir, tmp("publish"))),
    "q_token_len_profile" -> ((s, dir) => TextAnalysis.tokenLenProfile(s, dir)),
    "q_gap_hazard" -> ((s, dir) => Relational.gapHazard(s, dir)),
    "q_weighted_median" -> ((s, dir) => Relational.weightedMedian(s, dir)),
    "q_char_entropy" -> ((s, dir) => TextAnalysis.charEntropy(s, dir)),
    "q_kendall_tau" -> ((s, dir) => Relational.kendallTau(s, dir)),
    "q_partial_corr" -> ((s, dir) => Relational.partialCorr(s, dir)),
    "q_pca_power" -> ((s, dir) => Similarity.pcaPower(s, dir)),
    "q_mood_median" -> ((s, dir) => Relational.moodMedian(s, dir)),
    "q_mcnemar" -> ((s, dir) => Relational.mcnemar(s, dir)),
    "q_acf" -> ((s, dir) => Relational.acf(s, dir)),
    "q_lead_time" -> ((s, dir) => Relational.leadTime(s, dir)),
    // r8 additions (§2 #280-#286)
    "q_moments" -> ((s, dir) => Relational.moments(s, dir)),
    "q_kruskal_wallis" -> ((s, dir) => Relational.kruskalWallis(s, dir)),
    "q_km_survival" -> ((s, dir) => Relational.kmSurvival(s, dir)),
    "q_theil_sen" -> ((s, dir) => Relational.theilSen(s, dir)),
    "q_clustering_coeff" -> ((s, dir) =>
      Similarity.clusteringCoeff(s, dir, maxBits = 12)),
    "q_adamic_adar" -> ((s, dir) => Similarity.adamicAdar(s, dir, maxBits = 12)),
    "q_jaccard_linkpred" -> ((s, dir) =>
      Similarity.jaccardLinkPred(s, dir, maxBits = 12)),
    "q_intrinsic_dim" -> ((s, dir) => Similarity.intrinsicDim(s, dir, maxBits = 12)),
    // k = 3: short suffix so footer groups exist even in small corpora
    // (k = 8 has zero qualifying groups below sf0.1 — a vacuous gate).
    "q_suffix_dup" -> ((s, dir) => Dedup.suffixDup(s, dir, k = 3)),
    "q_surprisal_outliers" -> ((s, dir) => TextAnalysis.surprisalOutliers(s, dir)),
    "q_lang_mix" -> ((s, dir) => TextAnalysis.langMix(s, dir)),
    "q_anova" -> ((s, dir) => Relational.anova(s, dir)),
    "q_icc" -> ((s, dir) => Relational.icc(s, dir)),
    "q_conformal" -> ((s, dir) => Relational.conformal(s, dir)),
    "q_levene" -> ((s, dir) => Relational.levene(s, dir)),
    "q_changepoint" -> ((s, dir) => Relational.changepoint(s, dir)),
    "q_dedup_yield" -> ((s, dir) => Dedup.dedupYield(s, dir)),
    "q_silhouette" -> ((s, dir) => Similarity.silhouette(s, dir)),
    "q_semdedup" -> ((s, dir) => Similarity.semDedup(s, dir)),
    "q_source_cluster_mix" -> ((s, dir) => Similarity.sourceClusterMix(s, dir)),
    "q_source_kl" -> ((s, dir) => TextAnalysis.sourceKl(s, dir)),
    "q_burrows_delta" -> ((s, dir) => TextAnalysis.burrowsDelta(s, dir)),
    "q_dim_variance" -> ((s, dir) => Similarity.dimVariance(s, dir)),
    "q_winnow_dup" -> ((s, dir) => Dedup.winnowDup(s, dir)),
    "q_edit_dup" -> ((s, dir) => Dedup.editDup(s, dir)),
    "q_tukey" -> ((s, dir) => Relational.tukey(s, dir)),
    "q_ljung_box" -> ((s, dir) => Relational.ljungBox(s, dir)),
    "q_ab_power" -> ((s, dir) => Relational.abPower(s, dir)),
    "q_lof" -> ((s, dir) => Similarity.lof(s, dir, maxBits = 12)),
    "q_knn_classify" -> ((s, dir) => Similarity.knnClassify(s, dir, maxBits = 12)),
    "copy_prune" -> ((s, dir) => TableCopy.pruneRetention(s, dir, tmp("prune"))),
    "copy_vacuum" -> ((s, dir) => TableCopy.vacuum(s, dir, tmp("vacuum"))),
    "q_knn_components" -> ((s, dir) => Similarity.knnComponents(s, dir, maxBits = 12)),
    "q_page_hinkley" -> ((s, dir) => Relational.pageHinkley(s, dir)),
    "q_cuped" -> ((s, dir) => Relational.cuped(s, dir)),
    "q_mann_kendall" -> ((s, dir) => Relational.mannKendall(s, dir)),
    "q_cosine_dup" -> ((s, dir) => Dedup.cosineDup(s, dir)),
    "q_item_cf" -> ((s, dir) => Relational.itemCf(s, dir)),
    "q_dedup_recall" -> ((s, dir) => Dedup.dedupRecall(s, dir)),
    "q_lsh_curve" -> ((s, dir) => Dedup.lshCurve(s, dir)),
    // The 100 TB path for the two acceptance reports: exact ground truth
    // over a deterministic 1-in-4 content-addressed sample (VERDICT r9 #1;
    // stress runs use tighter cuts like "0"/"00" — same knob).
    "q_dedup_recall_sampled" ->
      ((s, dir) => Dedup.dedupRecall(s, dir, sampleCutHex = "3")),
    "q_lsh_curve_sampled" ->
      ((s, dir) => Dedup.lshCurve(s, dir, sampleCutHex = "3")),
    "q_shingle_novelty" -> ((s, dir) => Dedup.shingleNovelty(s, dir)),
    "q_kcenter" -> ((s, dir) => Similarity.kcenter(s, dir)),
    "q_mmr" -> ((s, dir) => Similarity.mmr(s, dir)),
    "q_participation_ratio" -> ((s, dir) => Similarity.participationRatio(s, dir)),
    "q_backtest_naive" -> ((s, dir) => Relational.backtestNaive(s, dir)),
    "q_seasonal_decompose" -> ((s, dir) => Relational.seasonalDecompose(s, dir)),
    "q_price_index" -> ((s, dir) => Relational.priceIndex(s, dir)),
    "q_stratified_effect" -> ((s, dir) => Relational.stratifiedEffect(s, dir)),
    // Snapshot expiry: v1 half, v2 drifted full, v3 plain full; keepLast=2
    // expires v1. The result aggregates the SURVIVING snapshots from disk,
    // so a botched expiry (deleted survivor / kept expired) fails the hash.
    "copy_expire" -> ((s, dir) => {
      val dest = tmp("expirev")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dest), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dest/customer"), true)
      val cust = graft.sources.Tables.load(s, dir, "customer")
      TableCopy.writeSnapshot(s, cust.where(col("c_custkey") % 2 === 0),
        dest, "customer")
      TableCopy.writeSnapshot(s, cust.withColumn("c_acctbal",
        when(col("c_custkey") % 3 === 0, col("c_acctbal") + 10.0)
          .otherwise(col("c_acctbal"))), dest, "customer")
      TableCopy.writeSnapshot(s, cust, dest, "customer")
      val expired = TableCopy.expireSnapshots(s, dest, "customer", keepLast = 2)
      val survivors = TableCopy.listSnapshots(s, dest, "customer")
      survivors.map { v =>
        TableCopy.readSnapshot(s, dest, "customer", v)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("c_acctbal")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("sum_acctbal"))
          .select(lit(v.toLong).as("version"), col("n_rows"),
            col("sum_acctbal"), lit(expired.length.toLong).as("n_expired"))
      }.reduce(_ unionByName _).orderBy("version")
    }),
    "q_did" -> ((s, dir) => Relational.did(s, dir)),
    // Atomic SET publish: v1 = {nation, half supplier}, v2 = {nation,
    // full supplier}; the result reads BOTH tables through the CURRENT
    // pointer, so a half-flipped set or stale pointer fails the oracle.
    "copy_publish_set" -> ((s, dir) => {
      val dest = tmp("pubset")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dest), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dest), true)
      val nation = graft.sources.Tables.load(s, dir, "nation")
      val supplier = graft.sources.Tables.load(s, dir, "supplier")
      TableCopy.publishSet(s, Seq(
        "nation" -> nation,
        "supplier" -> supplier.where(col("s_suppkey") % 2 === 0)), dest)
      val v = TableCopy.publishSet(s, Seq(
        "nation" -> nation, "supplier" -> supplier), dest)
      def one(t: String) = TableCopy.readFromSet(s, dest, t)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), lit(v.toLong).as("version"),
          col("n_rows"))
      one("nation").unionByName(one("supplier")).orderBy("table_name")
    }),
    "q_bfs_reach" -> ((s, dir) => Similarity.bfsReach(s, dir, maxBits = 12)),
    // Snapshot restore: v1 half-table, v2 drifted balances, then RESTORE v1
    // — the head (v3) must read back as v1's state with history intact.
    "copy_restore" -> ((s, dir) => {
      val dest = tmp("restorev")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dest), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dest/customer"), true)
      val cust = graft.sources.Tables.load(s, dir, "customer")
      TableCopy.writeSnapshot(s, cust.where(col("c_custkey") % 2 === 0),
        dest, "customer")
      TableCopy.writeSnapshot(s, cust.withColumn("c_acctbal",
        when(col("c_custkey") % 3 === 0, col("c_acctbal") + 10.0)
          .otherwise(col("c_acctbal"))), dest, "customer")
      val head = TableCopy.restoreSnapshot(s, dest, "customer", version = 1)
      val nv = TableCopy.listSnapshots(s, dest, "customer").length
      TableCopy.readSnapshot(s, dest, "customer")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("c_acctbal")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_acctbal"))
        .select(lit(head.toLong).as("head_version"),
          lit(nv.toLong).as("n_versions"), col("n_rows"), col("sum_acctbal"))
    }),
    // Schema-drift report: destination copy dropped a column, re-typed
    // another, and added a load column; the diff reads the ACTUAL written
    // parquet footers back, so a drifted fact the copy missed fails it.
    "copy_schema_diff" -> ((s, dir) => {
      val dest = tmp("schemadiff")
      val cust = graft.sources.Tables.load(s, dir, "customer")
      cust.drop("c_mktsegment")
        .withColumn("c_acctbal", col("c_acctbal").cast("decimal(18,2)"))
        .withColumn("load_src", lit("graft"))
        .write.mode("overwrite").parquet(s"$dest/customer")
      TableCopy.schemaDiff(s, cust.schema,
        s.read.parquet(s"$dest/customer").schema)
    }),
    "copy_jdbc_partitioned" -> ((s, dir) => {
      val db = TableCopy.JdbcStore(freshDerby("jdbcpart"),
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"),
        numPartitions = 8, partitionColumn = Some("c_custkey"))
      val cust = graft.sources.Tables.load(s, dir, "customer")
      db.write(cust, "customer", TableCopy.Recreate)
      db.read(s, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),
    // r9 additions (§2 #329-#342): effect sizes, nonparametric pairs,
    // regression diagnostics, and the daily-series toolbox
    "q_cramers_v" -> ((s, dir) => Relational.cramersV(s, dir)),
    "q_wilcoxon_signed" -> ((s, dir) => Relational.wilcoxonSigned(s, dir)),
    "q_durbin_watson" -> ((s, dir) => Relational.durbinWatson(s, dir)),
    "q_grubbs" -> ((s, dir) => Relational.grubbs(s, dir)),
    "q_cooks_distance" -> ((s, dir) => Relational.cooksDistance(s, dir)),
    "q_wasserstein" -> ((s, dir) => Relational.wasserstein(s, dir)),
    "q_poisson_rate" -> ((s, dir) => Relational.poissonRate(s, dir)),
    "q_friedman" -> ((s, dir) => Relational.friedman(s, dir)),
    "q_bollinger" -> ((s, dir) => Relational.bollinger(s, dir)),
    "q_rsi" -> ((s, dir) => Relational.rsi(s, dir)),
    "q_sax" -> ((s, dir) => Relational.sax(s, dir)),
    "q_hurst" -> ((s, dir) => Relational.hurst(s, dir)),
    "q_entropy_rate" -> ((s, dir) => Relational.entropyRate(s, dir)),
    "q_peak_detect" -> ((s, dir) => Relational.peakDetect(s, dir)),
    // r9 additions (§2.3 #343-#347): LLM-pipeline curation + graph ops
    "q_kcore" -> ((s, dir) => Similarity.kCore(s, dir, maxBits = 12)),
    "q_gopher_rules" -> ((s, dir) => Curation.gopherRules(s, dir)),
    "q_cms_error" -> ((s, dir) => Curation.cmsError(s, dir)),
    "q_dedup_weights" -> ((s, dir) => Dedup.dedupWeights(s, dir)),
    "q_interarrival" -> ((s, dir) => Relational.interarrival(s, dir)),
    // r9 additions (§2.3 #349-#351): distribution distances + gate calibration
    "q_js_divergence" -> ((s, dir) => TextAnalysis.jsDivergence(s, dir)),
    "q_hellinger" -> ((s, dir) => TextAnalysis.hellinger(s, dir)),
    "q_cohens_kappa" -> ((s, dir) => TextAnalysis.cohensKappa(s, dir)),
    "q_krippendorff" -> ((s, dir) => TextAnalysis.krippendorffAlpha(s, dir)),
    "q_ece" -> ((s, dir) => TextAnalysis.eceQuality(s, dir)),
    // r9 additions (#353-#356): graph partition quality, reliability,
    // mixture temperature, vocabulary concentration
    "q_modularity" -> ((s, dir) => Similarity.modularity(s, dir, maxBits = 12)),
    "q_cronbach_alpha" -> ((s, dir) => Relational.cronbachAlpha(s, dir)),
    "q_temperature_mix" -> ((s, dir) => Curation.temperatureMix(s, dir)),
    "q_gini_token" -> ((s, dir) => TextAnalysis.giniToken(s, dir)),
    "q_neyman_alloc" -> ((s, dir) => Curation.neymanAlloc(s, dir)),
    "q_meta_analysis" -> ((s, dir) => Relational.metaAnalysis(s, dir)),
    // COMPUTED column replication (§2.1 #348): the destination table gets
    // GENERATED ALWAYS AS columns the bulk load never touches — the result
    // aggregates values DERBY computed and reads the generated flag back
    // from the live catalog, so a copy that materialized them as plain
    // columns (or skipped them) fails the oracle.
    "copy_computed" -> ((s, dir) => {
      val db = TableCopy.JdbcStore(freshDerby("computed"),
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      val m = TableCopy.TableMeta(
        primaryKey = Seq("c_custkey"),
        computed = Seq(
          ("c_bal_x2", "DOUBLE", "\"c_acctbal\" * 2"),
          ("c_name_len", "INTEGER", "LENGTH(\"c_name\")")))
      TableCopy.copy(s, TableCopy.ParquetStore(dir), db, "customer",
        TableCopy.Recreate, replicateMeta = true, metaOverride = Some(m))
      val back = db.meta(s, "customer")
      db.read(s, "customer")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("c_bal_x2")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_bal_x2"),
          sum(col("c_name_len").cast("long")).as("sum_name_len"))
        .select(col("n_rows"), col("sum_bal_x2"), col("sum_name_len"),
          lit(back.computed.map(c => s"${c._1}:${c._2}").mkString(";"))
            .as("computed_cols"))
    }),
    // r11 additions (§2.2 #368-#370, #372; §2.3 #373-#375; #371 = ann_mips
    // registered with the ANN family above): variance-homogeneity twin,
    // ordinal effect size, inequality curve, bot screen, stopword/redundancy
    // corpus profiles, quality-aware dedup survivor selection.
    "q_bartlett" -> ((s, dir) => Relational.bartlett(s, dir)),
    "q_cliff_delta" -> ((s, dir) => Relational.cliffDelta(s, dir)),
    "q_lorenz" -> ((s, dir) => Relational.lorenz(s, dir)),
    "q_bot_flags" -> ((s, dir) => Relational.botFlags(s, dir)),
    "q_stopword_density" -> ((s, dir) => TextAnalysis.stopwordDensity(s, dir)),
    "q_shingle_compression" -> ((s, dir) => TextAnalysis.shingleCompression(s, dir)),
    "q_dsir_weights" -> ((s, dir) => TextAnalysis.dsirWeights(s, dir)),
    "q_dedup_canonical" -> ((s, dir) => Dedup.dedupCanonical(s, dir)),
    // r13 additions (§2.2 #386-#388; §2.3 #389-#390): grouped jackknife,
    // BH multiplicity control, randomization test, BPE merge-candidate
    // scan, QID k-anonymity audit.
    "q_jackknife" -> ((s, dir) => Relational.jackknife(s, dir)),
    "q_fdr_bh" -> ((s, dir) => Relational.fdrBh(s, dir)),
    "q_permutation_test" -> ((s, dir) => Relational.permutationTest(s, dir)),
    "q_bpe_pairs" -> ((s, dir) => TextAnalysis.bpePairs(s, dir)),
    "q_k_anonymity" -> ((s, dir) => Curation.kAnonymity(s, dir)),
  )

  /** DuckDB twin of [[TableCopy.checksum]]: canonical row string → sha256 →
    * first 15 hex chars folded to a bigint (char-by-char, the hex analogue of
    * Spark's `conv(_, 16, 10)`) → commutative HUGEINT sum rendered as text.
    */
  private def checksumOracle(label: String, table: String, canon: String): String =
    s"""SELECT '$label' AS table_name, count(*) AS n_rows,
       |  CAST(sum(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    [CAST(strpos('0123456789abcdef', substr(sha256(s), i, 1)) - 1 AS BIGINT)
       |     FOR i IN generate_series(1, 15)]), (a, v) -> a * 16 + v) AS HUGEINT)) AS VARCHAR) AS checksum
       |FROM (SELECT $canon AS s FROM $table)""".stripMargin

  private val ordersCanonSql: String =
    """concat_ws('|', coalesce(CAST(o_orderkey AS VARCHAR), chr(1)),
      |  coalesce(CAST(o_custkey AS VARCHAR), chr(1)),
      |  coalesce(o_orderstatus, chr(1)),
      |  coalesce(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), chr(1)),
      |  coalesce(CAST(epoch_us(o_orderdate) AS VARCHAR), chr(1)),
      |  coalesce(o_orderpriority, chr(1)))""".stripMargin

  /** Shared CTE block of the exact near-dup connected-components oracle:
    * 3-shingles → exact all-pairs Jaccard ≥ 0.6 → recursive reachability.
    * `reach(doc_id, r)` is the component-membership frame both the cluster
    * map (`q_dedup_cluster`) and its size histogram
    * (`q_cluster_size_hist`) select from.
    */
  private val dedupClusterCtes: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      |), idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
      |  FROM toks WHERE len(w) >= 3
      |), sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
      |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |prs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM prs
      |  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      |  WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.6
      |),
      |e AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |),
      |reach(doc_id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.b, reach.r FROM e JOIN reach ON reach.doc_id = e.a
      |)""".stripMargin

  /** DuckDB fold-based dot product: same sequential left fold as Spark's
    * aggregate(zip_with(...)), so scores are bit-identical.
    */
  private def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, [$a[i] * $b[i] FOR i IN generate_series(1, len($a))]), (x, y) -> x + y)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables — every query has one. The two approximate operators
    * are exact-checkable because their randomness is deterministic and
    * engine-reproducible: q_ann_lsh's oracle embeds the hyperplane constants,
    * and q_neardup_simhash's token-hash family is a char polynomial both
    * engines compute identically.
    */
  /** Exact all-pairs Jaccard over word-3-gram shingles — shared by the
    * q_neardup_jaccard oracle and the q_dup_matrix rollup (LSH recall is
    * total at the 0.6 threshold, so the banded operator equals this exact
    * computation; see the MinHash parameter note in operators.Dedup).
    */
  /** Per-doc quality score — shared by the q_quality_score oracle and the
    * q_quality_by_source rollup (one derivation, two views).
    */
  private val qualityScoreOracle: String =
    """WITH d AS (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    len(toks)::INTEGER AS n_tokens,
      |    len(list_filter(toks, t -> t IN ('the','a','of','and','is')))::INTEGER AS stop_hits,
      |    length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio
      |  FROM d
      |), sc AS (
      |  SELECT doc_id,
      |    least(1.0::DOUBLE, n_tokens::DOUBLE / 80.0::DOUBLE) * 0.4::DOUBLE
      |      + (1.0::DOUBLE - punct_ratio) * 0.4::DOUBLE
      |      + (stop_hits::DOUBLE / n_tokens) * 0.2::DOUBLE AS score
      |  FROM m
      |)
      |SELECT doc_id, floor((score) * 1e6 + 0.5) / 1e6 AS quality, (score >= 0.5::DOUBLE) AS keep
      |FROM sc ORDER BY doc_id""".stripMargin

  /** Brute-force cosine top-10 ground truth — shared by the q_ann_brute
    * oracle and the q_ann_recall wrapper (which joins it against the LSH
    * oracle: one derivation, two views).
    */
  private lazy val bruteAnnOracle: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), n AS (
      |  SELECT vec_id, v, sqrt(${dot("v", "v")}) AS nrm FROM e
      |), q AS (
      |  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10
      |), s AS (
      |  SELECT q.q_id, n.vec_id, ${dot("n.v", "q.qv")} / (n.nrm * q.qn) AS cos
      |  FROM n, q WHERE n.vec_id <> q.q_id
      |), r AS (
      |  SELECT q_id, vec_id, cos,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
      |  FROM s
      |)
      |SELECT q_id, rank, vec_id, floor(cos * 1e6 + 0.5) / 1e6 AS cos
      |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  private val neardupJaccardOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      |), idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
      |  FROM toks WHERE len(w) >= 3
      |), sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
      |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b,
      |  floor((inter::DOUBLE / (sa.n + sb.n - inter)) * 1e6 + 0.5) / 1e6 AS jaccard
      |FROM pairs
      |JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      |WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Stopword-profile language ID — shared by the q_langid oracle and the
    * q_lang_confusion rollup.
    */
  private val langIdOracle: String =
    """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    len(list_filter(toks, t -> t IN ('the','a','of','and','is')))::INTEGER AS en_hits,
      |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist')))::INTEGER AS de_hits,
      |    len(list_filter(toks, t -> t IN ('el','la','los','de','es')))::INTEGER AS es_hits
      |  FROM d
      |)
      |SELECT doc_id,
      |  CASE WHEN en_hits = 0 AND de_hits = 0 AND es_hits = 0 THEN 'unknown'
      |       WHEN en_hits >= de_hits AND en_hits >= es_hits THEN 'en'
      |       WHEN de_hits >= es_hits THEN 'de'
      |       ELSE 'es' END AS lang_detected,
      |  en_hits, de_hits, es_hits
      |FROM h ORDER BY doc_id""".stripMargin

  /** End-to-end curation verdict oracle — shared by q_curate and the
    * q_dedup_stats funnel rollup.
    */
  private val curateOracle: String =
    """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
      |  FROM toks WHERE len(w) >= 3
      |), sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
      |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |prs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |),
      |near AS (
      |  SELECT DISTINCT prs.doc_b AS doc_id FROM prs
      |  JOIN sz sa ON sa.doc_id = prs.doc_a JOIN sz sb ON sb.doc_id = prs.doc_b
      |  WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.6
      |),
      |ex AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id, min(doc_id) OVER (PARTITION BY lower(trim(text))) AS keep_id
      |    FROM documents) t
      |  WHERE doc_id <> keep_id
      |),
      |qm AS (
      |  SELECT doc_id,
      |    len(string_split(trim(text), ' '))::INTEGER AS n_tokens,
      |    len(list_filter(string_split(trim(text), ' '), t -> t IN ('the','a','of','and','is')))::INTEGER AS stop_hits,
      |    length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio
      |  FROM documents
      |),
      |lowq AS (
      |  SELECT doc_id FROM qm
      |  WHERE least(1.0::DOUBLE, n_tokens::DOUBLE / 80.0::DOUBLE) * 0.4::DOUBLE
      |      + (1.0::DOUBLE - punct_ratio) * 0.4::DOUBLE
      |      + (stop_hits::DOUBLE / n_tokens) * 0.2::DOUBLE < 0.5::DOUBLE
      |)
      |SELECT d.doc_id,
      |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
      |       WHEN near.doc_id IS NOT NULL THEN 'near_dup'
      |       WHEN lowq.doc_id IS NOT NULL THEN 'low_quality'
      |       ELSE 'kept' END AS reason,
      |  (ex.doc_id IS NULL AND near.doc_id IS NULL AND lowq.doc_id IS NULL) AS kept
      |FROM documents d
      |LEFT JOIN ex ON ex.doc_id = d.doc_id
      |LEFT JOIN near ON near.doc_id = d.doc_id
      |LEFT JOIN lowq ON lowq.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_ann_lsh" -> Similarity.lshOracleSql(),
    "q_neardup_embed" -> Similarity.embeddingNearDupOracleSql(),
    "q_knn_graph" -> Similarity.knnGraphOracleSql(),
    "q_semantic_cluster" -> Similarity.semanticClusterOracleSql(),
    "q_ann_ivf" -> Similarity.ivfOracleSql(),
    "q_ann_sq" -> Similarity.sqOracleSql(),
    "q_ann_pq" -> Similarity.pqOracleSql(),
    "q_ann_ivfpq" -> Similarity.ivfPqOracleSql(),
    "q_mrl_recall" -> Similarity.mrlRecallOracleSql(),
    "q_kmeans" -> Similarity.kmeansOracleSql(),
    "q_rand_proj" -> Similarity.randProjectOracleSql(),
    "q_pagerank" -> Similarity.pageRankOracleSql(),
    "q_embed_drift" -> Similarity.embedDriftOracleSql(),
    // The oracle is the FULL recompute — merge(partial(base), partial(delta))
    // must equal it, which is the incremental-maintenance soundness claim.
    "q_ivm" ->
      """SELECT event_type, strftime(ts::DATE, '%Y-%m-%d') AS day, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us FROM events),
        |p AS (SELECT * FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, c.event_id AS attr_click,
        |  p.t_us - c.t_us AS latency_us
        |FROM p LEFT JOIN LATERAL (
        |  SELECT e.event_id, e.t_us FROM e
        |  WHERE e.user_id = p.user_id AND e.event_type = 'click'
        |    AND (e.t_us < p.t_us OR (e.t_us = p.t_us AND e.event_id < p.event_id))
        |  ORDER BY e.t_us DESC, e.event_id DESC LIMIT 1) c ON TRUE
        |ORDER BY p.event_id""".stripMargin,
    "q_variant" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k,
        |  count(json_extract(props, '$.absent')) AS n_absent_hits
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_doc_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |s AS (SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens, w,
        |  unnest(generate_series(0, len(w) - 1, 48)) AS start_tok FROM d)
        |SELECT doc_id, CAST(start_tok // 48 AS INTEGER) AS chunk_id,
        |  CAST(start_tok AS INTEGER) AS start_tok, n_tokens,
        |  CAST(len(list_slice(w, start_tok + 1, start_tok + 64)) AS INTEGER) AS chunk_tokens,
        |  array_to_string(list_slice(w, start_tok + 1, start_tok + 64), ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    // MAD outliers: all value arithmetic in DECIMAL(12,2) — medians via the
    // same histogram-cumulative formulation, comparisons exact, no float
    // tolerance anywhere. ROWS frame is explicit (values are distinct per
    // group after the histogram, so ROWS == RANGE, stated for clarity).
    "q_anomaly_mad" ->
      """WITH ev AS (SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS v FROM events),
        |h1 AS (SELECT event_type, v, count(*) AS cnt FROM ev GROUP BY 1, 2),
        |c1 AS (SELECT event_type, v,
        |  sum(cnt) OVER (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY event_type) AS n FROM h1),
        |med AS (SELECT event_type,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN v END) AS med
        |  FROM c1 GROUP BY 1),
        |dv AS (SELECT ev.event_id, ev.event_type, ev.v, med.med,
        |  abs(ev.v - med.med) AS dev FROM ev JOIN med USING (event_type)),
        |h2 AS (SELECT event_type, dev, count(*) AS cnt FROM dv GROUP BY 1, 2),
        |c2 AS (SELECT event_type, dev,
        |  sum(cnt) OVER (PARTITION BY event_type ORDER BY dev
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY event_type) AS n FROM h2),
        |mad AS (SELECT event_type,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN dev END) AS mad
        |  FROM c2 GROUP BY 1)
        |SELECT event_id, dv.event_type, CAST(v AS DOUBLE) AS value,
        |  CAST(dv.med AS DOUBLE) AS med, CAST(mad.mad AS DOUBLE) AS mad,
        |  CAST(dev AS DOUBLE) AS dev
        |FROM dv JOIN mad USING (event_type)
        |WHERE dev > mad.mad * 3
        |ORDER BY event_id""".stripMargin,
    "q_locf" ->
      """WITH ev AS (
        |  SELECT user_id, ts::DATE AS day, epoch_us(ts) AS t_us, event_id, value
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, value AS day_close FROM (
        |    SELECT user_id, day, value,
        |      row_number() OVER (PARTITION BY user_id, day
        |        ORDER BY t_us DESC, event_id DESC) AS rn
        |    FROM ev) t
        |  WHERE rn = 1),
        |spine AS (
        |  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
        |  FROM ev),
        |grid AS (
        |  SELECT u.user_id, s.day, d.day_close
        |  FROM (SELECT DISTINCT user_id FROM ev) u
        |  CROSS JOIN spine s
        |  LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  last_value(day_close IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
        |  day_close IS NOT NULL AS is_observed
        |FROM grid ORDER BY user_id, day""".stripMargin,
    // Same double arithmetic ORDER as Spark (mean recomputed per term, not
    // hoisted) so every intermediate bit matches before the final round.
    "q_ab_test" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |    CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM events)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  floor((CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |    / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)) * 1e6 + 0.5) / 1e6 AS mean_a,
        |  floor((CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |    / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)) * 1e6 + 0.5) / 1e6 AS mean_b,
        |  floor((
        |    (CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |       / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
        |     - CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |       / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END))
        |    / sqrt(
        |      (CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value * value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |         / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
        |       - (CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |          / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END))
        |         * (CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |            / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)))
        |        / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
        |      + (CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value * value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |           / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
        |         - (CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |            / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END))
        |           * (CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |              / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)))
        |          / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)))
        |    * 1e6 + 0.5) / 1e6 AS z_score
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,
    "copy_masked" ->
      """SELECT c_custkey, sha256(CAST(c_name AS VARCHAR)) AS c_name, c_nationkey,
        |  CAST(NULL AS DOUBLE) AS c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_winsorize" ->
      """WITH ev AS (SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v FROM events),
        |h AS (SELECT event_type, v, count(*) AS cnt FROM ev GROUP BY 1, 2),
        |c AS (SELECT event_type, v,
        |  sum(cnt) OVER (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY event_type) AS n FROM h),
        |b AS (SELECT event_type,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.05) AS BIGINT) THEN v END) AS p05,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.95) AS BIGINT) THEN v END) AS p95
        |  FROM c GROUP BY 1),
        |j AS (SELECT ev.event_type, ev.v, b.p05, b.p95,
        |  least(greatest(ev.v, b.p05), b.p95) AS clipped
        |  FROM ev JOIN b USING (event_type))
        |SELECT event_type, count(*) AS n,
        |  CAST(max(p05) AS DOUBLE) AS p05, CAST(max(p95) AS DOUBLE) AS p95,
        |  floor((CAST(CAST(sum(CAST(v AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS mean_raw,
        |  floor((CAST(CAST(sum(CAST(clipped AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS mean_winsor,
        |  CAST(sum(CASE WHEN v < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
        |  CAST(sum(CASE WHEN v > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_ngram_lm" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(2, len(w)),
        |    i -> struct_pack(a := w[i-1], b := w[i]))) AS p
        |  FROM d WHERE len(w) >= 2),
        |bgf AS (SELECT doc_id, p.a AS a, p.b AS b FROM bg),
        |cab AS (SELECT a, b, count(*) AS c_ab FROM bgf GROUP BY 1, 2),
        |ca AS (SELECT a, count(*) AS c_a FROM bgf GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM (
        |  SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents) t)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  floor((CAST(CAST(sum(CAST(-ln((c_ab + 1.0) / (c_a + v)) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
        |    / count(*)) * 1e6 + 0.5) / 1e6 AS avg_surprisal
        |FROM bgf JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN vv
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Tie-break on the heaviest key: (cnt, key) max-struct = cnt DESC then
    // key DESC, stated identically in the oracle's row_number.
    "q_skew_profile" ->
      """WITH ks AS (
        |  SELECT 'orders.o_custkey' AS key_col, CAST(o_custkey AS BIGINT) AS k FROM orders
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', CAST(l_partkey AS BIGINT) FROM lineitem),
        |kc AS (SELECT key_col, k, count(*) AS cnt FROM ks GROUP BY 1, 2),
        |top AS (SELECT key_col, k AS top_key, cnt AS max_cnt FROM (
        |  SELECT key_col, k, cnt,
        |    row_number() OVER (PARTITION BY key_col ORDER BY cnt DESC, k DESC) AS rn
        |  FROM kc) t WHERE rn = 1),
        |agg AS (SELECT key_col, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  count(*) AS n_keys FROM kc GROUP BY 1)
        |SELECT agg.key_col, n_rows, n_keys, max_cnt, top_key,
        |  floor((CAST(max_cnt AS DOUBLE) / n_rows) * 1e6 + 0.5) / 1e6 AS top_share,
        |  floor((CAST(max_cnt AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys)) * 1e6 + 0.5) / 1e6 AS skew_factor
        |FROM agg JOIN top USING (key_col) ORDER BY key_col""".stripMargin,
    "q_listagg" ->
      """SELECT r_name, count(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    // tf-idf keywords: rank key is the ROUNDED score (+ token tie-break) on
    // both engines, so an unrounded cross-engine ulp cannot flip a rank.
    "q_keywords" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
        |), tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |sc AS (
        |  SELECT doc_id, tok, tf, df,
        |    floor((tf * ln((n_docs + 1.0) / (df + 1.0))) * 1e6 + 0.5) / 1e6 AS score
        |  FROM tf JOIN df USING (tok) CROSS JOIN nd
        |), r AS (
        |  SELECT doc_id, tok, tf, df, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, tok ASC) AS INTEGER) AS rank
        |  FROM sc
        |)
        |SELECT doc_id, rank, tok, tf, df, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_cdc_collapse" ->
      """WITH c AS (
        |  SELECT user_id, value,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM events)
        |SELECT user_id, n_changes, op AS last_op,
        |  CASE WHEN op = 'D' THEN NULL ELSE value END AS final_value
        |FROM c WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_quarantine" ->
      """WITH d AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CASE WHEN o_totalprice <= 0 THEN 'price_nonpositive'
        |       WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 'status_domain' END AS reason
        |FROM d
        |WHERE o_totalprice <= 0 OR o_orderstatus NOT IN ('F', 'O', 'P')
        |ORDER BY o_orderkey""".stripMargin,
    // The materialized-index variant answers the SAME query — one oracle
    // serves both formulations.
    "q_ann_ivf_indexed" -> Similarity.ivfOracleSql(),
    "q_neardup_simhash" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(toks, t ->
        |      (list_reduce(list_prepend(CAST(7 AS BIGINT),
        |         [CAST(ascii(t[i]) AS BIGINT) FOR i IN generate_series(1, length(t))]),
        |         (a, c) -> (a * 131 + c) % 2147483647) << 31)
        |      | list_reduce(list_prepend(CAST(11 AS BIGINT),
        |         [CAST(ascii(t[i]) AS BIGINT) FOR i IN generate_series(1, length(t))]),
        |         (a, c) -> (a * 137 + c) % 2147483629)
        |    ) AS hs
        |  FROM d
        |),
        |f AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CASE WHEN 2 * len(list_filter(hs, x -> (x >> k) & 1 = 1)) > len(hs)
        |            THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END
        |       FOR k IN generate_series(0, 61)]), (a, b) -> a | b) AS fp
        |  FROM h
        |),
        |c AS (SELECT doc_id, fp, unnest([0, 1, 2, 3]) AS ck FROM f),
        |cv AS (SELECT doc_id, fp, ck, (fp >> (ck * 16)) & 65535 AS v FROM c),
        |p AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp AS fa, b.fp AS fb
        |  FROM cv a JOIN cv b ON a.ck = b.ck AND a.v = b.v AND a.doc_id < b.doc_id
        |)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
        |FROM p WHERE bit_count(xor(fa, fb)) <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    "copy_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "copy_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "copy_json_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "copy_orc_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q_scd2" ->
      """WITH drift AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1.0 ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 10 <> 0),
        |chg AS (
        |  SELECT d.c_custkey FROM drift d JOIN customer s USING (c_custkey)
        |  WHERE d.c_acctbal IS DISTINCT FROM s.c_acctbal
        |     OR d.c_name IS DISTINCT FROM s.c_name
        |     OR d.c_nationkey IS DISTINCT FROM s.c_nationkey
        |     OR d.c_mktsegment IS DISTINCT FROM s.c_mktsegment),
        |merged AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal - 5.0 AS c_acctbal,
        |    c_mktsegment, '2019-01-01' AS valid_from,
        |    CAST('2020-01-01' AS VARCHAR) AS valid_to, false AS is_current
        |  FROM drift WHERE c_custkey % 13 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |    '2020-01-01', CAST(NULL AS VARCHAR), true
        |  FROM drift WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |    '2020-01-01', '2021-01-01', false
        |  FROM drift WHERE c_custkey IN (SELECT c_custkey FROM chg)
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |    '2021-01-01', CAST(NULL AS VARCHAR), true
        |  FROM customer
        |  WHERE c_custkey IN (SELECT c_custkey FROM chg) OR c_custkey % 10 = 0)
        |SELECT * FROM merged ORDER BY c_custkey, valid_from""".stripMargin,
    "q_table_checksum" -> {
      val nationCanon =
        """concat_ws('|', coalesce(CAST(n_nationkey AS VARCHAR), chr(1)),
          |  coalesce(n_name, chr(1)),
          |  coalesce(CAST(n_regionkey AS VARCHAR), chr(1)))""".stripMargin
      s"""WITH chk AS (
         |${checksumOracle("nation", "nation", nationCanon)}
         |UNION ALL
         |${checksumOracle("orders", "orders", ordersCanonSql)}
         |UNION ALL
         |${checksumOracle("orders_copy", "orders", ordersCanonSql)}
         |) SELECT * FROM chk ORDER BY table_name""".stripMargin
    },
    "copy_versioned" ->
      """SELECT 1 AS version, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT 2, count(*),
        |  CAST(CAST(sum(CAST(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 10.0
        |                     ELSE c_acctbal END AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |FROM customer
        |ORDER BY version""".stripMargin,
    "copy_clustered" ->
      """SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders WHERE year(o_orderdate) = 1996
        |GROUP BY 1 ORDER BY o_month""".stripMargin,
    "q_fuzzy_join" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |k AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM n)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM k a JOIN k b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS t_us, value,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE) AS trailing_sum,
        |  count(*) OVER w AS trailing_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_split_hash" ->
      """SELECT doc_id, substr(sha256(text), 1, 1) AS bucket,
        |  CASE WHEN substr(sha256(text), 1, 1) <= '1' THEN 'holdout' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "copy_manifest" ->
      """SELECT 'customer' AS table_name, count(*) AS n_rows, 'ok' AS status FROM customer
        |UNION ALL SELECT 'nation', count(*), 'ok' FROM nation
        |UNION ALL SELECT 'part', count(*), 'ok' FROM part
        |ORDER BY table_name""".stripMargin,
    "copy_resume" ->
      """SELECT 'nation' AS table_name, (SELECT count(*) FROM nation) AS n_rows,
        |  'skipped' AS status
        |UNION ALL SELECT 'region', (SELECT count(*) FROM region), 'skipped'
        |UNION ALL SELECT 'supplier', (SELECT count(*) FROM supplier), 'ok'
        |ORDER BY table_name""".stripMargin,
    "copy_schema" ->
      """SELECT * FROM (VALUES
        |  ('customer', 1, 'c_custkey', 'bigint', true, 'BIGINT'),
        |  ('customer', 2, 'c_name', 'string', true, 'VARCHAR(4000)'),
        |  ('customer', 3, 'c_nationkey', 'int', true, 'INTEGER'),
        |  ('customer', 4, 'c_acctbal', 'double', true, 'DOUBLE'),
        |  ('customer', 5, 'c_mktsegment', 'string', true, 'VARCHAR(4000)'),
        |  ('nation', 1, 'n_nationkey', 'int', true, 'INTEGER'),
        |  ('nation', 2, 'n_name', 'string', true, 'VARCHAR(4000)'),
        |  ('nation', 3, 'n_regionkey', 'int', true, 'INTEGER'),
        |  ('part', 1, 'p_partkey', 'bigint', true, 'BIGINT'),
        |  ('part', 2, 'p_name', 'string', true, 'VARCHAR(4000)'),
        |  ('part', 3, 'p_brand', 'string', true, 'VARCHAR(4000)'),
        |  ('part', 4, 'p_type', 'string', true, 'VARCHAR(4000)'),
        |  ('part', 5, 'p_size', 'int', true, 'INTEGER'),
        |  ('part', 6, 'p_retailprice', 'double', true, 'DOUBLE')
        |) AS t(table_name, ordinal, column_name, data_type, nullable, jdbc_ddl_type)
        |ORDER BY table_name, ordinal""".stripMargin,
    "copy_append" ->
      """WITH doubled AS (SELECT * FROM nation UNION ALL SELECT * FROM nation)
        |SELECT n_nationkey, n_name, n_regionkey, count(*) AS n_copies
        |FROM doubled GROUP BY 1, 2, 3 ORDER BY n_nationkey""".stripMargin,
    "q_partitioned_read" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_partitioned_read_balanced" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_topk_exec" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 5
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    "copy_jdbc_upsert" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // The schema-fact literals are the CLAIM: the Spark side reads them
    // from the live destination catalog after the copy, so a PK/index/
    // identity that failed to replicate breaks the compare. Index names
    // land upper-cased (unquoted DDL identifier); columns were created
    // quoted, so they keep their exact case.
    "copy_jdbc_schema" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_custkey,
        |  'c_custkey' AS pk_cols,
        |  'CUSTOMER_NAME_UQ(c_name):UNIQUE;CUSTOMER_NKEY_IDX(c_nationkey)'
        |    AS dest_indexes,
        |  'c_custkey' AS identity_cols
        |FROM customer WHERE c_custkey % 3 = 0""".stripMargin,
    "copy_jdbc_collation" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_custkey,
        |  'UCS_BASIC' AS src_collation,
        |  'TERRITORY_BASED' AS dest_collation,
        |  true AS collation_mismatch,
        |  false AS src_a_lt_b,
        |  true AS dest_a_lt_b
        |FROM customer WHERE c_custkey % 7 = 0""".stripMargin,
    "copy_jdbc_triggers" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_custkey,
        |  'ACCT_TR(after_insert=true,row=true)' AS dest_triggers,
        |  CAST(0 AS BIGINT) AS audit_rows_after_copy,
        |  CAST(1 AS BIGINT) AS audit_rows_after_insert
        |FROM customer WHERE c_custkey % 5 = 0""".stripMargin,
    // The view facts are destination-side (catalog readback + a live query
    // through the replicated view stack); the oracle recomputes the view
    // semantics from the parquet source and pins the round manifest —
    // a_top alphabetically precedes its provider z_base, so it MUST land
    // in round 2.
    "copy_jdbc_views" ->
      """WITH base AS (SELECT * FROM nation WHERE n_regionkey <= 2),
        |top AS (SELECT n_name FROM base WHERE n_nationkey > 4)
        |SELECT (SELECT count(*) FROM nation) AS n_rows,
        |  (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation) AS sum_nkey,
        |  'APP.A_TOP=r2;APP.Z_BASE=r1' AS view_rounds,
        |  'APP.A_TOP,APP.Z_BASE' AS dest_views,
        |  (SELECT count(*) FROM top) AS n_top_rows,
        |  (SELECT string_agg(n_name, ',' ORDER BY n_name) FROM top) AS top_names""".stripMargin,
    "copy_jdbc_procs" ->
      """SELECT 'APP.ORD_SEQ:S=ok;APP.ABS_F:F=ok;APP.NAP:P=ok' AS manifest,
        |  CAST(7.5 AS DOUBLE) AS abs_result,
        |  true AS proc_called, true AS seq_continues""".stripMargin,
    "copy_jdbc_synonyms" ->
      """SELECT 'APP.NATV_SYN=ok;APP.NAT_CHAIN=ok;APP.NAT_SYN=ok' AS manifest,
        |  (SELECT count(*) FROM nation) AS chain_rows,
        |  (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation) AS chain_sum,
        |  (SELECT count(*) FROM nation WHERE n_nationkey >= 10) AS view_rows""".stripMargin,
    "copy_jdbc_grants" ->
      """SELECT 'region:ALICE:SELECT:*=ok;region:BOB:SELECT:*=ok;region:BOB:UPDATE:*=ok;region:CAROL:UPDATE:r_name=ok' AS manifest,
        |  (SELECT count(*) FROM region) AS alice_rows,
        |  (SELECT CAST(sum(r_regionkey) AS BIGINT) FROM region) AS alice_sum,
        |  true AS alice_update_denied, true AS mallory_select_denied,
        |  true AS carol_name_update_ok, true AS carol_key_update_denied""".stripMargin,
    "copy_jdbc_constraints" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_custkey,
        |  'c_custkey' AS pk_cols,
        |  'CUSTOMER_BAL_CK:("c_acctbal" >= -1000.0)' AS dest_checks,
        |  'c_mktsegment=''BUILDING'';c_acctbal=0.0' AS dest_defaults,
        |  'BUILDING' AS default_seg, CAST(0.0 AS DOUBLE) AS default_bal,
        |  true AS check_enforced
        |FROM customer WHERE c_custkey % 5 = 0""".stripMargin,
    "copy_whatif" ->
      """SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS seq, 'region' AS table_name,
        |    'create' AS action, (SELECT count(*) FROM region) AS est_rows,
        |    'CREATE TABLE region ("r_regionkey" INTEGER NOT NULL, "r_name" VARCHAR(4000), PRIMARY KEY ("r_regionkey"))' AS ddl,
        |    'planned' AS status
        |  UNION ALL SELECT 2, 'nation', 'create',
        |    (SELECT count(*) FROM nation),
        |    'CREATE TABLE nation ("n_nationkey" INTEGER NOT NULL, "n_name" VARCHAR(4000), "n_regionkey" INTEGER, PRIMARY KEY ("n_nationkey"), FOREIGN KEY ("n_regionkey") REFERENCES region ("r_regionkey"))',
        |    'planned'
        |) ORDER BY seq""".stripMargin,
    "copy_fk_ordered" ->
      """SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS seq, 'region' AS table_name,
        |    (SELECT count(*) FROM region) AS n_rows, 'ok' AS status
        |  UNION ALL SELECT 2, 'nation', (SELECT count(*) FROM nation), 'ok'
        |  UNION ALL SELECT 3, 'customer', (SELECT count(*) FROM customer), 'ok'
        |) ORDER BY seq""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01' AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "q_agg_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0::DOUBLE - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0::DOUBLE - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_star" ->
      """SELECT r_name, n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0::DOUBLE - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_window" ->
      """SELECT event_id, user_id, value,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS INTEGER) AS rn,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_time_bucket" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q_json_props" ->
      """SELECT CAST(props->>'k' AS INTEGER) % 10 AS k_bucket, count(*) AS n,
        |  min(CAST(props->>'k' AS INTEGER)) AS min_k,
        |  max(CAST(props->>'k' AS INTEGER)) AS max_k
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,
    "q_setops" ->
      """WITH custn AS (SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |     suppn AS (SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        |SELECT n_name, 'both' AS tag
        |FROM (SELECT n_name FROM custn INTERSECT SELECT n_name FROM suppn) AS i
        |UNION ALL
        |SELECT n_name, 'cust_only' AS tag
        |FROM (SELECT n_name FROM custn EXCEPT SELECT n_name FROM suppn) AS e
        |ORDER BY tag, n_name""".stripMargin,
    "q_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_antijoin" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_discount >= 0.09)
        |ORDER BY p_partkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, '*') AS returnflag,
        |       coalesce(l_linestatus, '*') AS linestatus,
        |       count(*) AS n_rows,
        |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT c_mktsegment, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_up,
        |  lower(p_type) AS type_lo,
        |  substr(p_name, 1, 8) AS name_pfx,
        |  length(p_name)::INTEGER AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, ' ', '_', 'g') AS name_us,
        |  (p_name LIKE '%e%') AS has_e
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_sort_multi" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
        |ORDER BY l_returnflag DESC, l_quantity ASC, l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "q_having" ->
      """SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_nationkey
        |HAVING count(*) * 25 > (SELECT count(*) FROM customer)
        |ORDER BY c_nationkey""".stripMargin,
    "q_casewhen" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |  CAST(CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0::DOUBLE END AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS f_revenue
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, '*') AS returnflag,
        |       coalesce(l_linestatus, '*') AS linestatus,
        |       count(*) AS n_rows,
        |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_topk_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,
    // corr from exact decimal moment sums: built-in corr() is a running
    // merge whose value depends on accumulation order; six order-free
    // decimal sums combined in double reproduce bit-for-bit on both engines.
    "q_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag,
        |  floor(((n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))) * 1e6 + 0.5) / 1e6 AS corr_qty_disc,
        |  CAST(n AS BIGINT) AS n_rows
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_date_funcs" ->
      """SELECT event_id,
        |  year(ts)::INTEGER AS yr,
        |  month(ts)::INTEGER AS mo,
        |  dayofmonth(ts)::INTEGER AS dom,
        |  hour(ts)::INTEGER AS hr,
        |  date_diff('day', DATE '2024-01-01', ts::DATE)::INTEGER AS days_since
        |FROM events ORDER BY event_id""".stripMargin,
    "q_outerjoin" ->
      """SELECT c_custkey, c_name,
        |  count(o_orderkey) AS n_orders,
        |  coalesce(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE), 0.0::DOUBLE) AS total_spent
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q_running" ->
      """SELECT event_id, user_id, value,
        |  floor((sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1e6 + 0.5) / 1e6 AS running_value,
        |  count(*) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        |FROM events ORDER BY event_id""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_percentile" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders
        |)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN o_totalprice END) AS p95,
        |  max(n) AS n_rows
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(floor((l_quantity - 1) / 5), 9) AS INTEGER) AS bucket,
        |  count(*) AS n_rows, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    // The salted join must equal the PLAIN join — the oracle is the unsalted
    // formulation, which is exactly the correctness claim of salting.
    "q_join_salted" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0::DOUBLE - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // The bloom pre-filter must not change the join result — the oracle is
    // the plain join, which is exactly the runtime-filter correctness claim
    // (false positives only admit rows; the join drops them).
    "q_join_bloom" ->
      """SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0::DOUBLE - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1997
        |GROUP BY 1 ORDER BY o_month""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY lower(trim(text)) ORDER BY keep_id""".stripMargin,
    "q_neardup_jaccard" -> neardupJaccardOracle,
    // The matrix oracle wraps the SAME exact all-pairs derivation and rolls
    // it up by unordered source pair — one oracle family, two views.
    "q_dup_matrix" ->
      s"""WITH nd AS (
         |$neardupJaccardOracle
         |)
         |SELECT least(da.source, db.source) AS source_a,
         |  greatest(da.source, db.source) AS source_b, count(*) AS n_pairs
         |FROM nd
         |JOIN documents da ON da.doc_id = nd.doc_a
         |JOIN documents db ON db.doc_id = nd.doc_b
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // End-to-end curation verdict: composes the exact-dedup, Jaccard
    // near-dup, and quality-score oracles with reason precedence.
    "q_curate" -> curateOracle,
    // Corpus-level funnel rollup of the same verdicts (one derivation,
    // two views).
    "q_dedup_stats" ->
      s"""WITH cu AS (
         |$curateOracle
         |)
         |SELECT reason, count(*) AS n_docs,
         |  floor((CAST(count(*) AS DOUBLE) / sum(count(*)) OVER ()) * 1e6 + 0.5) / 1e6 AS share
         |FROM cu GROUP BY reason ORDER BY reason""".stripMargin,
    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS t_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), s AS (
        |  SELECT user_id, event_id, value, t_us,
        |    CAST(sum(CASE WHEN prev_us IS NULL OR t_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
        |  FROM x
        |)
        |SELECT user_id, sess_seq, count(*) AS n_events,
        |  min(t_us) AS first_us, max(t_us) AS last_us,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sess_seq ORDER BY user_id, sess_seq""".stripMargin,
    "q_transition" ->
      """WITH s AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |)
        |SELECT from_type, to_type, count(*) AS n,
        |  floor((count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY from_type)) * 1e6 + 0.5) / 1e6 AS p
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,
    "q_copy_diff" ->
      """WITH dst AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0::DOUBLE
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 <> 0
        |), j AS (
        |  SELECT CASE WHEN d.o_orderkey IS NULL THEN 'missing_in_dest'
        |              WHEN s.o_orderkey IS NULL THEN 'missing_in_source'
        |              WHEN (s.o_custkey IS DISTINCT FROM d.o_custkey)
        |                OR (s.o_orderstatus IS DISTINCT FROM d.o_orderstatus)
        |                OR (s.o_totalprice IS DISTINCT FROM d.o_totalprice)
        |                OR (s.o_orderdate IS DISTINCT FROM d.o_orderdate)
        |                OR (s.o_orderpriority IS DISTINCT FROM d.o_orderpriority)
        |                THEN 'changed'
        |              ELSE 'same' END AS status
        |  FROM orders s FULL OUTER JOIN dst d ON s.o_orderkey = d.o_orderkey
        |)
        |SELECT status, count(*) AS n_rows FROM j GROUP BY status ORDER BY status""".stripMargin,
    // Upserting the fresh rows into the stale copy reconstructs the source
    // exactly — that round-trip identity IS the upsert correctness claim.
    "q_copy_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fk_check" ->
      """SELECT relationship,
        |  CAST(coalesce(sum(n), 0) AS BIGINT) AS n_orphan_rows,
        |  CAST(count(DISTINCT k) AS BIGINT) AS n_orphan_keys
        |FROM (
        |  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relationship,
        |    c.l_orderkey AS k, 1 AS n
        |  FROM lineitem c WHERE c.l_orderkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey)
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part.p_partkey', c.l_partkey, 1
        |  FROM lineitem c WHERE c.l_partkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.l_partkey)
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer.c_custkey', c.o_custkey, 1
        |  FROM orders c WHERE c.o_custkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey)
        |  UNION ALL
        |  SELECT 'customer.c_nationkey->nation.n_nationkey', c.c_nationkey, 1
        |  FROM customer c WHERE c.c_nationkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.c_nationkey)
        |  UNION ALL
        |  SELECT 'events.user_id->customer.c_custkey', c.user_id, 1
        |  FROM events c WHERE c.user_id IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.user_id)
        |) RIGHT JOIN (VALUES
        |    ('lineitem.l_orderkey->orders.o_orderkey'),
        |    ('lineitem.l_partkey->part.p_partkey'),
        |    ('orders.o_custkey->customer.c_custkey'),
        |    ('customer.c_nationkey->nation.n_nationkey'),
        |    ('events.user_id->customer.c_custkey')) AS rels(relationship)
        |  USING (relationship)
        |GROUP BY relationship ORDER BY relationship""".stripMargin,
    "q_stats_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name,
        |    CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |    CAST(min(o_orderkey) AS DOUBLE) AS min_num,
        |    CAST(max(o_orderkey) AS DOUBLE) AS max_num FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT),
        |    CAST(count(DISTINCT o_custkey) AS BIGINT),
        |    CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', CAST(count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS BIGINT),
        |    CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS BIGINT),
        |    CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |    CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', CAST(count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT),
        |    CAST(count(DISTINCT o_orderdate) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', CAST(count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS BIGINT),
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders
        |) ORDER BY col_name""".stripMargin,
    "q_window_suite" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drank,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM orders WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_orderpriority, drank, o_orderkey""".stripMargin,
    "copy_compact" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_setops_all" ->
      """WITH c AS (
        |  SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        |), s AS (
        |  SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |), u AS (
        |  SELECT 'both' AS tag, n_name FROM (SELECT * FROM c INTERSECT ALL SELECT * FROM s)
        |  UNION ALL
        |  SELECT 'cust_extra', n_name FROM (SELECT * FROM c EXCEPT ALL SELECT * FROM s)
        |)
        |SELECT tag, n_name, count(*) AS multiplicity
        |FROM u GROUP BY tag, n_name ORDER BY tag, n_name""".stripMargin,
    "q_grouping_sets" ->
      """SELECT
        |  CASE WHEN grouping(o_orderstatus) = 0 THEN o_orderstatus ELSE 'ALL' END AS status,
        |  CASE WHEN grouping(o_orderpriority) = 0 THEN o_orderpriority ELSE 'ALL' END AS priority,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "q_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |    CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
        |) ORDER BY l_returnflag, measure""".stripMargin,
    "q_constraints" ->
      """WITH r AS (
        |  SELECT
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS key_null,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS price_nonpositive,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS status_domain,
        |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
        |                    OR CAST(o_orderdate AS DATE) > DATE '2005-12-31'
        |             THEN 1 ELSE 0 END) AS BIGINT) AS date_range
        |  FROM orders
        |), u AS (
        |  SELECT CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS key_unique
        |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
        |)
        |SELECT constraint_name, n_violations, n_violations = 0 AS passed FROM (
        |  SELECT 'key_null' AS constraint_name, key_null AS n_violations FROM r
        |  UNION ALL SELECT 'price_nonpositive', price_nonpositive FROM r
        |  UNION ALL SELECT 'status_domain', status_domain FROM r
        |  UNION ALL SELECT 'date_range', date_range FROM r
        |  UNION ALL SELECT 'key_unique', key_unique FROM u
        |) ORDER BY constraint_name""".stripMargin,
    "copy_evolve" ->
      """SELECT channel, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM (
        |  SELECT 'original' AS channel, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT 'backfill', o_totalprice FROM orders WHERE o_orderkey % 100 = 0
        |) GROUP BY channel ORDER BY channel""".stripMargin,
    "q_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) // 64 AS nf FROM documents
        |), e AS (
        |  SELECT doc_id, text, unnest(generate_series(0, nf - 1)) AS i
        |  FROM d WHERE nf > 0
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  CAST(i * 64 AS INTEGER) AS frame_off,
        |  md5(substr(text, CAST(i AS INTEGER) * 64 + 1, 64)) AS frame_md5
        |FROM e WHERE i % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
    "q_explode" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS toks
        |  FROM documents WHERE doc_id < 50
        |), e AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM d
        |)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[CAST(i AS INTEGER)] AS token
        |FROM e ORDER BY doc_id, pos""".stripMargin,
    "q_copy_partitioned" ->
      """SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY 1 ORDER BY o_month""".stripMargin,
    "q_copy_bucketed" ->
      """SELECT o_orderpriority,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0::DOUBLE - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // The Misra-Gries sketch only proposes CANDIDATES; the exact rescore pass
    // makes the output the true top-k, so the oracle is plain exact SQL.
    "q_heavy_hitters" ->
      """SELECT rank, tok, n FROM (
        |  SELECT tok, count(*) AS n,
        |    CAST(row_number() OVER (ORDER BY count(*) DESC, tok) AS INTEGER) AS rank
        |  FROM (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents)
        |  GROUP BY tok) t
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // Pair generation mirrors the shifted equi-joins (±2 window, unordered
    // least/greatest pairs); PMI uses the same multiply/divide order so the
    // 6-decimal round absorbs only ulp-level noise.
    "q_cooccur_pmi" ->
      """WITH toks AS (SELECT string_split(trim(text), ' ') AS w FROM documents),
        |idx1 AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |         FROM toks WHERE len(w) >= 2),
        |idx2 AS (SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
        |         FROM toks WHERE len(w) >= 3),
        |pr AS (
        |  SELECT least(w[i], w[i+1]) AS tok_a, greatest(w[i], w[i+1]) AS tok_b FROM idx1
        |  UNION ALL
        |  SELECT least(w[i], w[i+2]), greatest(w[i], w[i+2]) FROM idx2
        |),
        |uni AS (SELECT unnest(w) AS tok FROM toks),
        |uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
        |tot AS (SELECT (SELECT count(*) FROM uni)::DOUBLE AS n_tok,
        |               (SELECT count(*) FROM pr)::DOUBLE AS n_pairs),
        |top AS (
        |  SELECT tok_a, tok_b, count(*) AS c_ab FROM pr GROUP BY tok_a, tok_b
        |  ORDER BY c_ab DESC, tok_a, tok_b LIMIT 20
        |)
        |SELECT tok_a, tok_b, c_ab,
        |  floor((log2(c_ab * n_tok * n_tok / (n_pairs * ca.c * cb.c))) * 1e6 + 0.5) / 1e6 AS pmi
        |FROM top CROSS JOIN tot
        |JOIN uc ca ON ca.tok = top.tok_a
        |JOIN uc cb ON cb.tok = top.tok_b
        |ORDER BY c_ab DESC, tok_a, tok_b""".stripMargin,
    // Per-group MG sketches only propose candidates; the exact rescore makes
    // each group's output the true top-k — plain SQL oracle again.
    "q_heavy_hitters_grouped" ->
      """SELECT source, rank, tok, n FROM (
        |  SELECT source, tok, count(*) AS n,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY count(*) DESC, tok) AS INTEGER) AS rank
        |  FROM (SELECT source, unnest(string_split(trim(text), ' ')) AS tok
        |        FROM documents) t
        |  GROUP BY source, tok) g
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "q_oov_rate" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
        |), v AS (
        |  SELECT tok, 1 AS in_vocab FROM (
        |    SELECT tok, count(*) AS n FROM t GROUP BY tok
        |    ORDER BY n DESC, tok LIMIT 256) s
        |)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  floor((CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*)) * 1e6 + 0.5) / 1e6 AS oov_rate
        |FROM t LEFT JOIN v ON t.tok = v.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // The sketch estimates themselves cannot hash-match another engine; the
    // oracle checks the deterministic columns and asserts the in-query
    // tolerance booleans (estimate vs exact twin) came out TRUE. A sketch
    // regression flips a boolean and fails the hash compare.
    "q_approx_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  TRUE AS hll_within_5pct, TRUE AS p50_within_10pct
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_sample_stratified" ->
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
        |  FROM documents) t
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,
    // Same sample, computed via the map-side-combining Aggregator: one SQL
    // truth for both formulations.
    "q_sample_stratified_agg" ->
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
        |  FROM documents) t
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,
    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, len(string_split(trim(text), ' '))::INTEGER AS n_tokens,
        |         unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, n_tokens, tok, count(*) AS c FROM t GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, n_tokens, count(*) AS n_distinct, max(c) AS top_freq,
        |  floor((1.0::DOUBLE - count(*)::DOUBLE / n_tokens) * 1e6 + 0.5) / 1e6 AS dup_ratio,
        |  floor((max(c)::DOUBLE / n_tokens) * 1e6 + 0.5) / 1e6 AS top_ratio
        |FROM g GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,
    "q_ngram_freq" ->
      """WITH toks AS (SELECT string_split(trim(text), ' ') AS w FROM documents),
        |idx AS (
        |  SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM toks WHERE len(w) >= 2
        |)
        |SELECT w[i] || ' ' || w[i+1] AS bigram, count(*) AS n
        |FROM idx GROUP BY 1 ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,
    "q_source_mix" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
        |    count(DISTINCT lang) AS n_langs
        |  FROM documents GROUP BY 1
        |), t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM s)
        |SELECT source, n_docs, n_tokens, n_langs,
        |  floor((n_tokens::DOUBLE / tot) * 1e6 + 0.5) / 1e6 AS token_share
        |FROM s, t ORDER BY source""".stripMargin,
    "q_token_pack" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    len(string_split(trim(text), ' '))::INTEGER AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(coalesce(sum(n_tokens::BIGINT) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM d
        |)
        |SELECT doc_id, source, n_tokens, start_off,
        |  CAST(floor(start_off / 512.0::DOUBLE) AS INTEGER) AS seq_id,
        |  CAST(start_off % 512 AS BIGINT) AS seq_off
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" ->
      """SELECT event_id,
        |  len(regexp_extract_all(props, '[0-9]+'))::INTEGER AS n_redacted,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed
        |FROM events ORDER BY event_id""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
        |  FROM toks WHERE len(w) >= 5
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS g
        |  FROM idx
        |), bg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0),
        |h AS (
        |  SELECT s.doc_id, count(*) AS n_hit_grams
        |  FROM sh s JOIN bg ON s.g = bg.g WHERE s.doc_id % 50 <> 0 GROUP BY 1
        |)
        |SELECT d.doc_id, CAST(coalesce(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
        |  (coalesce(h.n_hit_grams, 0) > 0) AS contaminated
        |FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
        |WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id""".stripMargin,
    "q_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, value FROM events),
        |x AS (
        |  SELECT us, value,
        |    unnest([(us // 900000000 - i) * 900000000 FOR i IN generate_series(0, 3)]) AS w_start_us
        |  FROM e)
        |SELECT w_start_us, count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM x WHERE us >= w_start_us AND us < w_start_us + 3600000000
        |GROUP BY 1 ORDER BY w_start_us""".stripMargin,
    "q_percentile_cont" -> {
      def term(q: Double, name: String) =
        s"""sum(CASE WHEN rn = floor((n - 1) * CAST($q AS DOUBLE)) + 1
           |      THEN o_totalprice * (1.0 - ((n - 1) * CAST($q AS DOUBLE) - floor((n - 1) * CAST($q AS DOUBLE))))
           |    WHEN rn = floor((n - 1) * CAST($q AS DOUBLE)) + 2 AND (n - 1) * CAST($q AS DOUBLE) - floor((n - 1) * CAST($q AS DOUBLE)) > 0
           |      THEN o_totalprice * ((n - 1) * CAST($q AS DOUBLE) - floor((n - 1) * CAST($q AS DOUBLE)))
           |    ELSE 0.0 END) AS $name""".stripMargin
      s"""WITH ranked AS (
         |  SELECT o_orderpriority, o_totalprice,
         |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
         |    count(*) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM orders)
         |SELECT o_orderpriority,
         |${term(0.5, "p50")},
         |${term(0.95, "p95")}
         |FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },
    "copy_mapped" ->
      """SELECT c_custkey AS customer_id, c_name AS full_name,
        |  CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS DOUBLE) AS balance
        |FROM customer ORDER BY customer_id""".stripMargin,
    "q_interval_join" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS v_us, value AS v_value
        |  FROM events WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.click_id, count(*) AS n_views,
        |    CAST(CAST(sum(CAST(v_value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_view_value
        |  FROM c JOIN v ON v.user_id = c.user_id
        |    AND v.v_us >= c.c_us - 3600000000 AND v.v_us < c.c_us
        |  GROUP BY 1)
        |SELECT c.click_id, c.user_id,
        |  coalesce(j.n_views, 0) AS n_views,
        |  coalesce(j.sum_view_value, 0.0) AS sum_view_value
        |FROM c LEFT JOIN j USING (click_id) ORDER BY click_id""".stripMargin,
    // The rule-rewritten naive join answers the SAME query - one oracle
    // serves the hand-bucketed and optimizer-rewritten formulations.
    "q_interval_join_rule" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS v_us, value AS v_value
        |  FROM events WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.click_id, count(*) AS n_views,
        |    CAST(CAST(sum(CAST(v_value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_view_value
        |  FROM c JOIN v ON v.user_id = c.user_id
        |    AND v.v_us >= c.c_us - 3600000000 AND v.v_us < c.c_us
        |  GROUP BY 1)
        |SELECT c.click_id, c.user_id,
        |  coalesce(j.n_views, 0) AS n_views,
        |  coalesce(j.sum_view_value, 0.0) AS sum_view_value
        |FROM c LEFT JOIN j USING (click_id) ORDER BY click_id""".stripMargin,
    "copy_verified" -> {
      val nationCanon =
        """concat_ws('|', coalesce(CAST(n_nationkey AS VARCHAR), chr(1)),
          |  coalesce(n_name, chr(1)),
          |  coalesce(CAST(n_regionkey AS VARCHAR), chr(1)))""".stripMargin
      s"""WITH s AS (
         |${checksumOracle("nation", "nation", nationCanon)}
         |)
         |SELECT 'nation' AS table_name, n_rows AS src_rows, n_rows AS dst_rows,
         |  checksum AS src_checksum, checksum AS dst_checksum, TRUE AS verified
         |FROM s""".stripMargin
    },
    "q_mom" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n_orders,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT o_month, n_orders, revenue,
        |  lag(revenue) OVER (ORDER BY o_month) AS prev_revenue,
        |  floor(((revenue - lag(revenue) OVER (ORDER BY o_month))
        |    / lag(revenue) OVER (ORDER BY o_month) * 100.0) * 1e6 + 0.5) / 1e6 AS mom_pct
        |FROM m ORDER BY o_month""".stripMargin,
    "q_gini" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x ASC, o_custkey ASC) AS i FROM rev)
        |SELECT count(*) AS n_customers,
        |  floor((2.0 * CAST(CAST(sum(CAST(i * x AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
        |      / (count(*) * CAST(sum(x) AS DOUBLE))
        |    - (count(*) + 1.0) / count(*)) * 1e6 + 0.5) / 1e6 AS gini
        |FROM r""".stripMargin,
    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
        |    AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice >= 1.0),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |s AS (SELECT digit, n,
        |    floor((CAST(n AS DOUBLE) / sum(n) OVER ()) * 1e6 + 0.5) / 1e6 AS share,
        |    floor((log10(1.0 + 1.0 / digit)) * 1e6 + 0.5) / 1e6 AS benford
        |  FROM g)
        |SELECT digit, n, share, benford, floor((abs(share - benford)) * 1e6 + 0.5) / 1e6 AS abs_dev
        |FROM s ORDER BY digit""".stripMargin,
    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    -- (19,2), not (18,2): same values, but precision 19 forces
        |    -- DuckDB onto int128 storage so the x*y multiply cannot
        |    -- overflow int64 at large SFs (Spark's (18,2)*(18,2)->(37,4)
        |    -- is already exact).
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS r
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT a.r AS x, b.r AS y FROM daily a
        |  JOIN daily b ON b.day = a.day + INTERVAL 1 DAY)
        |SELECT count(*) AS n_pairs,
        |  floor(((count(*) * CAST(CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |      - CAST(CAST(sum(CAST(x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(CAST(y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE))
        |    / (sqrt(count(*) * CAST(CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |        - CAST(CAST(sum(CAST(x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(CAST(x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE))
        |     * sqrt(count(*) * CAST(CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |        - CAST(CAST(sum(CAST(y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(CAST(y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)))) * 1e6 + 0.5) / 1e6
        |    AS autocorr_lag1
        |FROM j""".stripMargin,
    "q_churn" ->
      """WITH p AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk FROM events),
        |nx AS (SELECT user_id, wk - 7 AS wk FROM p),
        |ch AS (SELECT p.user_id, p.wk FROM p ANTI JOIN nx ON p.user_id = nx.user_id AND p.wk = nx.wk),
        |a AS (SELECT wk, count(*) AS n_active FROM p GROUP BY 1),
        |c AS (SELECT wk, count(*) AS n_churned FROM ch GROUP BY 1)
        |SELECT strftime(a.wk, '%Y-%m-%d') AS week, n_active, coalesce(n_churned, 0) AS n_churned,
        |  floor((coalesce(n_churned, 0) / CAST(n_active AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS churn_rate
        |FROM a LEFT JOIN c ON a.wk = c.wk ORDER BY week""".stripMargin,
    "q_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey, max(o_orderdate::DATE) AS last_day, count(*) AS freq,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(last_day) AS d1 FROM per),
        |s AS (
        |  SELECT o_custkey, freq, monetary, datediff('day', last_day, d1) AS recency
        |  FROM per, a),
        |q AS (
        |  SELECT monetary,
        |    ntile(4) OVER (ORDER BY recency ASC, o_custkey ASC) AS r_q,
        |    ntile(4) OVER (ORDER BY freq DESC, o_custkey ASC) AS f_q,
        |    ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_q
        |  FROM s)
        |SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS segment,
        |  count(*) AS n_customers,
        |  CAST(CAST(sum(monetary) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM q GROUP BY 1 ORDER BY segment""".stripMargin,
    "q_doc_rarity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
        |j AS (
        |  SELECT t.doc_id, ln((nd.n + 1.0) / (df.df + 1.0)) AS idf
        |  FROM t JOIN df USING (tok) CROSS JOIN nd)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor((CAST(CAST(sum(CAST(idf AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS rarity
        |FROM j GROUP BY 1 ORDER BY rarity DESC, doc_id ASC LIMIT 25""".stripMargin,
    "q_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INTEGER) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INTEGER) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  floor((206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (n_syllables / CAST(n_words AS DOUBLE))) * 1e4 + 0.5) / 1e4 AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem, orders, customer, supplier, nation, region
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_hour_profile" ->
      """WITH h AS (
        |  SELECT CAST(hour(ts) AS INTEGER) AS hour, event_type,
        |    count(*) AS n_events,
        |    floor((CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS total_value
        |  FROM events GROUP BY 1, 2)
        |SELECT hour, event_type, n_events, total_value,
        |  floor((CAST(n_events AS DOUBLE) / sum(n_events) OVER (PARTITION BY event_type)) * 1e6 + 0.5) / 1e6
        |    AS share_of_type
        |FROM h ORDER BY event_type, hour""".stripMargin,
    "q_lag_features" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, value FROM events)
        |SELECT user_id, event_id, value,
        |  count(*) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_prior,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS v_lag1,
        |  lag(value, 2) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS v_lag2,
        |  lag(value, 3) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS v_lag3
        |FROM x ORDER BY user_id, event_id""".stripMargin,
    "q_tpch_q6" ->
      """SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,
    "q_growth" ->
      """WITH p AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS first_wk FROM p GROUP BY 1),
        |pv AS (SELECT user_id, wk + 7 AS wk, TRUE AS was_prev FROM p),
        |st AS (
        |  SELECT p.user_id, p.wk,
        |    CASE WHEN p.wk = f.first_wk THEN 'new'
        |         WHEN pv.was_prev IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END AS status
        |  FROM p JOIN f ON p.user_id = f.user_id
        |  LEFT JOIN pv ON pv.user_id = p.user_id AND pv.wk = p.wk),
        |c AS (
        |  SELECT strftime(wk, '%Y-%m-%d') AS week,
        |    CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |    CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM st GROUP BY 1),
        |ch AS (
        |  SELECT strftime(a.wk, '%Y-%m-%d') AS week, count(*) AS n_churned
        |  FROM (SELECT user_id, wk + 7 AS wk FROM p) a
        |  ANTI JOIN p ON p.user_id = a.user_id AND p.wk = a.wk
        |  GROUP BY 1)
        |SELECT coalesce(c.week, ch.week) AS week,
        |  coalesce(n_new, 0) AS n_new,
        |  coalesce(n_retained, 0) AS n_retained,
        |  coalesce(n_resurrected, 0) AS n_resurrected,
        |  coalesce(n_churned, 0) AS n_churned
        |FROM c FULL JOIN ch ON c.week = ch.week ORDER BY week""".stripMargin,
    "q_order_cadence" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    datediff('day',
        |      lag(o_orderdate::DATE) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate::DATE, o_orderkey),
        |      o_orderdate::DATE) AS gap
        |  FROM orders)
        |SELECT o_custkey, count(*) AS n_gaps,
        |  floor((CAST(CAST(sum(CAST(gap AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6
        |    AS avg_gap_days,
        |  CAST(min(gap) AS BIGINT) AS min_gap_days,
        |  CAST(max(gap) AS BIGINT) AS max_gap_days
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_source_lang_mix" ->
      """WITH c AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, lang, n_docs, n_tokens,
        |  floor((CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY source)) * 1e6 + 0.5) / 1e6
        |    AS doc_share_of_source
        |FROM c ORDER BY source, lang""".stripMargin,
    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) > 300.0)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
        |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_tpch_q8" ->
      """WITH f AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)) AS vol,
        |    n1.n_name AS supp_nation
        |  FROM lineitem, part, supplier, orders, customer, nation n1, nation n2, region
        |  WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        |    AND l_suppkey = s_suppkey AND s_nationkey = n1.n_nationkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
        |    AND r_name = 'AMERICA'
        |    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01')
        |SELECT o_year,
        |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_6' THEN vol
        |    ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS nation_volume,
        |  CAST(sum(vol) AS DOUBLE) AS total_volume,
        |  floor((CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_6' THEN vol
        |      ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |    / CAST(sum(vol) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mkt_share,
        |  count(*) AS n_lines
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q13" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q14" ->
      """SELECT
        |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
        |    ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS promo_revenue,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_revenue,
        |  floor((100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
        |      ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |    AS promo_share,
        |  count(*) AS n_lines
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1'),
        |a AS (
        |  SELECT l_partkey AS a_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    count(*) AS n_li
        |  FROM li GROUP BY 1)
        |SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS small_lot_revenue,
        |  count(*) AS n_lines
        |FROM li JOIN a ON l_partkey = a_partkey
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li < sum_qty""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag AS shipmode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_returnflag IN ('R', 'A')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q2" ->
      s"""WITH ${Relational.partsuppLiteSql},
        |pp AS (SELECT p_partkey, p_name FROM part WHERE p_type = 'LARGE'),
        |sn AS (SELECT s_suppkey, s_name, s_acctbal, n_name AS nation
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |j AS (SELECT ps_partkey, ps_supplycost, p_name, s_name, s_acctbal, nation
        |  FROM ps JOIN pp ON ps_partkey = p_partkey
        |  JOIN sn ON ps_suppkey = s_suppkey),
        |m AS (SELECT ps_partkey AS m_partkey, min(ps_supplycost) AS min_cost
        |  FROM j GROUP BY 1)
        |SELECT s_acctbal, s_name, nation, ps_partkey AS p_partkey, p_name,
        |  ps_supplycost AS supplycost
        |FROM j JOIN m ON ps_partkey = m_partkey AND ps_supplycost = min_cost
        |ORDER BY s_acctbal DESC, nation ASC, s_name ASC, p_partkey ASC
        |LIMIT 100""".stripMargin,
    "q_tpch_q11" ->
      s"""WITH ${Relational.partsuppLiteSql},
        |sn AS (SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'),
        |v AS (SELECT ps_partkey,
        |  CAST(floor(ps_supplycost * 100.0 + 0.5) AS DECIMAL(18,0))
        |    * CAST(ps_availqty AS DECIMAL(18,2)) AS v
        |  FROM ps JOIN sn ON ps_suppkey = s_suppkey),
        |pp AS (SELECT ps_partkey, sum(v) AS value_d FROM v GROUP BY 1),
        |tt AS (SELECT sum(value_d) AS total_d, count(*) AS n_parts FROM pp)
        |SELECT ps_partkey,
        |  CAST(CAST(value_d AS VARCHAR) AS DOUBLE) / 100.0 AS value
        |FROM pp, tt
        |WHERE CAST(CAST(value_d AS VARCHAR) AS DOUBLE) * n_parts::DOUBLE * 10.0
        |  > CAST(CAST(total_d AS VARCHAR) AS DOUBLE) * 10.0
        |ORDER BY value DESC, ps_partkey ASC""".stripMargin,
    "q_tpch_q16" ->
      s"""WITH ${Relational.partsuppLiteSql},
        |pp AS (SELECT p_partkey, p_brand, p_type, p_size FROM part
        |  WHERE p_brand <> 'Brand#1')
        |SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN pp ON ps_partkey = p_partkey
        |WHERE ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,
    "q_tpch_q20" ->
      s"""WITH ${Relational.partsuppLiteSql},
        |pp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
        |sh AS (SELECT l_partkey AS sh_partkey, l_suppkey AS sh_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS shipped_qty
        |  FROM lineitem JOIN pp ON l_partkey = p_partkey
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  GROUP BY 1, 2),
        |hot AS (SELECT DISTINCT ps_suppkey FROM ps
        |  JOIN sh ON ps_partkey = sh_partkey AND ps_suppkey = sh_suppkey
        |  WHERE shipped_qty * 2 > ps_availqty)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (SELECT ps_suppkey FROM hot)
        |ORDER BY s_name""".stripMargin,
    "q_tpch_q22" ->
      """WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal FROM customer),
        |a AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal, count(*) AS n_pos
        |  FROM c WHERE c_acctbal > 0.0),
        |idle AS (
        |  SELECT c.* FROM c, a
        |  WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_bal
        |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |      AND o_orderdate >= DATE '1999-01-01'))
        |SELECT n_name, count(*) AS numcust,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
        |FROM idle JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q19" ->
      """SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q_tpch_q21" ->
      """WITH fin AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
        |po AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp,
        |    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS culprit
        |  FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM fin)
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM po JOIN supplier ON culprit = s_suppkey
        |WHERE n_supp >= 2 AND n_ret_supp = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,
    "q_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    - l_quantity * p_retailprice * 0.8 AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_profit,
        |  count(*) AS n_lines
        |FROM lineitem, part, supplier, nation, orders
        |WHERE l_partkey = p_partkey AND p_type = 'STANDARD'
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q_pareto" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT count(*) AS n_cust, sum(rev) AS total_rev FROM rev),
        |r AS (
        |  SELECT rev, total_rev, n_cust,
        |    row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn
        |  FROM rev, t),
        |g AS (
        |  SELECT CAST((rn - 1) * 10 // n_cust AS INTEGER) + 1 AS decile,
        |    count(*) AS n_cust, sum(rev) AS rev_d, max(total_rev) AS total_rev
        |  FROM r GROUP BY 1)
        |SELECT decile, n_cust, CAST(rev_d AS DOUBLE) AS revenue,
        |  CAST(sum(rev_d) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue,
        |  floor((CAST(sum(rev_d) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(total_rev AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS cum_share
        |FROM g ORDER BY decile""".stripMargin,
    "q_market_basket" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM d),
        |f AS (SELECT l_partkey, count(*) AS cnt FROM d GROUP BY 1),
        |p AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS pair_count
        |  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT part_a, part_b, pair_count, fa.cnt AS cnt_a, fb.cnt AS cnt_b,
        |  floor((CAST(pair_count * n_orders AS DOUBLE)
        |    / CAST(fa.cnt * fb.cnt AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS lift
        |FROM p, n
        |JOIN f fa ON part_a = fa.l_partkey
        |JOIN f fb ON part_b = fb.l_partkey
        |ORDER BY pair_count DESC, part_a, part_b LIMIT 50""".stripMargin,
    "q_new_vs_repeat" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate::DATE AS d, o_totalprice FROM orders),
        |fst AS (SELECT o_custkey, min(d) AS first_d FROM o GROUP BY 1)
        |SELECT strftime(CAST(date_trunc('month', d) AS DATE), '%Y-%m-%d') AS month,
        |  CAST(CAST(sum(CASE WHEN d = first_d
        |    THEN CAST(o_totalprice AS DECIMAL(18,2))
        |    ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS new_revenue,
        |  CAST(CAST(sum(CASE WHEN d = first_d THEN CAST(0.0 AS DECIMAL(18,2))
        |    ELSE CAST(o_totalprice AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS repeat_revenue,
        |  CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT) AS n_new_orders,
        |  CAST(sum(CASE WHEN d = first_d THEN 0 ELSE 1 END) AS BIGINT) AS n_repeat_orders
        |FROM o JOIN fst ON o.o_custkey = fst.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_prefix_dup" ->
      """SELECT array_to_string(list_slice(string_split(trim(text), ' '), 1, 8), ' ')
        |    AS prefix,
        |  min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM documents
        |GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY n_docs DESC, prefix""".stripMargin,
    "q_template_dup" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    lower(trim(regexp_replace(text, '[0-9]+', '0', 'g'))) AS norm
        |  FROM documents)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |  min(substring(norm, 1, 60)) AS template
        |FROM n GROUP BY norm ORDER BY keep_id""".stripMargin,
    "q_vocab_growth" ->
      """WITH m AS (SELECT max(doc_id) AS max_id FROM documents),
        |dd AS (
        |  SELECT CAST(doc_id * 10 // (max_id + 1) AS INTEGER) + 1 AS decile,
        |    len(string_split(trim(text), ' ')) AS n_toks
        |  FROM documents, m),
        |g AS (
        |  SELECT decile, count(*) AS n_docs_d,
        |    CAST(sum(n_toks) AS BIGINT) AS n_tokens_d
        |  FROM dd GROUP BY 1),
        |tok AS (
        |  SELECT token, min(doc_id) AS first_doc
        |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
        |        FROM documents)
        |  GROUP BY 1),
        |td AS (
        |  SELECT CAST(first_doc * 10 // (max_id + 1) AS INTEGER) + 1 AS decile,
        |    count(*) AS new_vocab
        |  FROM tok, m GROUP BY 1)
        |SELECT g.decile,
        |  CAST(sum(n_docs_d) OVER w AS BIGINT) AS n_docs_cum,
        |  CAST(sum(n_tokens_d) OVER w AS BIGINT) AS n_tokens_cum,
        |  CAST(sum(coalesce(new_vocab, 0)) OVER w AS BIGINT) AS vocab_cum,
        |  CAST(coalesce(new_vocab, 0) AS BIGINT) AS new_vocab
        |FROM g LEFT JOIN td ON g.decile = td.decile
        |WINDOW w AS (ORDER BY g.decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY g.decile""".stripMargin,
    "q_active_span" ->
      """WITH base AS (
        |  SELECT user_id, count(*) AS n_events,
        |    min(ts::DATE) AS fd, max(ts::DATE) AS ld
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT user_id, count(*) AS n_active_days
        |  FROM (SELECT DISTINCT user_id, ts::DATE AS day FROM events) GROUP BY 1)
        |SELECT base.user_id, n_events, n_active_days,
        |  strftime(fd, '%Y-%m-%d') AS first_day, strftime(ld, '%Y-%m-%d') AS last_day,
        |  CAST(datediff('day', fd, ld) + 1 AS BIGINT) AS span_days
        |FROM base JOIN d ON base.user_id = d.user_id
        |ORDER BY base.user_id""".stripMargin,
    "q_abandon" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, event_type FROM events),
        |v AS (SELECT user_id, event_id, t_us FROM e WHERE event_type = 'view'),
        |ab AS (
        |  SELECT v.user_id, v.event_id FROM v
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM e p
        |    WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
        |      AND p.t_us >= v.t_us AND p.t_us < v.t_us + 3600000000))
        |SELECT a.user_id, n_views, coalesce(n_abandoned, 0) AS n_abandoned,
        |  floor((coalesce(n_abandoned, 0) / CAST(n_views AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS abandon_rate
        |FROM (SELECT user_id, count(*) AS n_views FROM v GROUP BY 1) a
        |LEFT JOIN (SELECT user_id, count(*) AS n_abandoned FROM ab GROUP BY 1) b
        |  ON a.user_id = b.user_id
        |ORDER BY a.user_id""".stripMargin,
    "q_user_overlap" ->
      """WITH p AS (SELECT DISTINCT event_type AS et, user_id FROM events),
        |s AS (SELECT et, count(*) AS n FROM p GROUP BY 1),
        |i AS (
        |  SELECT a.et AS ta, b.et AS tb, count(*) AS n_both
        |  FROM p a JOIN p b ON a.user_id = b.user_id AND a.et < b.et GROUP BY 1, 2)
        |SELECT sa.et AS type_a, sb.et AS type_b, sa.n AS n_a, sb.n AS n_b,
        |  coalesce(i.n_both, 0) AS n_both,
        |  floor((coalesce(i.n_both, 0)
        |    / CAST(sa.n + sb.n - coalesce(i.n_both, 0) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS jaccard
        |FROM s sa JOIN s sb ON sa.et < sb.et
        |LEFT JOIN i ON i.ta = sa.et AND i.tb = sb.et
        |ORDER BY type_a, type_b""".stripMargin,
    "q_dup_source" ->
      """WITH g AS (
        |  SELECT source, lower(trim(text)) AS k, count(*) AS n
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(sum(n) AS BIGINT) AS n_docs, count(*) AS n_unique,
        |  CAST(sum(n - 1) AS BIGINT) AS n_redundant,
        |  floor((CAST(sum(n - 1) AS BIGINT) / CAST(sum(n) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS dup_rate
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "q_containment" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |  FROM toks WHERE len(w) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
        |), rare AS (
        |  SELECT g FROM (SELECT g, count(*) AS df FROM sh GROUP BY 1) WHERE df <= 100
        |), cs AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare USING (g)),
        |sz AS (SELECT doc_id, count(*) AS n FROM cs GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM cs a JOIN cs b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, inter,
        |  floor((inter::DOUBLE / least(sa.n, sb.n)) * 1e6 + 0.5) / 1e6 AS containment,
        |  floor((inter::DOUBLE / (sa.n + sb.n - inter)) * 1e6 + 0.5) / 1e6 AS jaccard
        |FROM pairs JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |WHERE inter::DOUBLE / least(sa.n, sb.n) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dau_mau" ->
      """WITH p AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |b AS (SELECT max(day) AS d1 FROM p),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM p GROUP BY 1),
        |x AS (
        |  SELECT user_id,
        |    unnest(generate_series(day::TIMESTAMP, day + INTERVAL 29 DAY, INTERVAL 1 DAY))::DATE AS day
        |  FROM p),
        |mau AS (
        |  SELECT x.day, count(DISTINCT user_id) AS mau
        |  FROM x, b WHERE x.day <= b.d1 GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, mau,
        |  floor((CAST(dau AS DOUBLE) / mau) * 1e6 + 0.5) / 1e6 AS stickiness
        |FROM dau JOIN mau ON dau.day = mau.day
        |ORDER BY day""".stripMargin,
    "q_session_path" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), s AS (
        |  SELECT user_id, event_id, event_type, t_us,
        |    CAST(sum(CASE WHEN prev_us IS NULL OR t_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
        |  FROM x
        |), r AS (
        |  SELECT user_id, sess_seq, event_type,
        |    row_number() OVER (PARTITION BY user_id, sess_seq
        |      ORDER BY t_us, event_id) AS rn
        |  FROM s
        |), p AS (
        |  SELECT string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id, sess_seq
        |)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path ASC LIMIT 10""".stripMargin,
    // Moments computed over DECIMAL casts; the closed-form slope/intercept/
    // r2 use the SAME double arithmetic shape as the Spark expressions.
    "q_zipf" ->
      """WITH tf AS (
        |  SELECT tok, count(*) AS n FROM (
        |    SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents) t
        |  GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 100
        |), rk AS (
        |  SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rank FROM tf
        |), pt AS (
        |  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y FROM rk
        |), mo AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS nn,
        |    CAST(CAST(sum(CAST(x AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(y * y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM pt
        |)
        |SELECT CAST(nn AS BIGINT) AS n_fit,
        |  floor(((nn * sxy - sx * sy) / (nn * sxx - sx * sx)) * 1e6 + 0.5) / 1e6 AS slope,
        |  floor(((sy - (nn * sxy - sx * sy) / (nn * sxx - sx * sx) * sx) / nn) * 1e6 + 0.5) / 1e6 AS intercept,
        |  floor((((nn * sxy - sx * sy) * (nn * sxy - sx * sy)) /
        |    ((nn * sxx - sx * sx) * (nn * syy - sy * sy))) * 1e6 + 0.5) / 1e6 AS r2
        |FROM mo""".stripMargin,
    // Same fingerprint family as q_neardup_simhash's oracle CTEs.
    "q_sql_kernel" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(toks, t ->
        |      (list_reduce(list_prepend(CAST(7 AS BIGINT),
        |         [CAST(ascii(t[i]) AS BIGINT) FOR i IN generate_series(1, length(t))]),
        |         (a, c) -> (a * 131 + c) % 2147483647) << 31)
        |      | list_reduce(list_prepend(CAST(11 AS BIGINT),
        |         [CAST(ascii(t[i]) AS BIGINT) FOR i IN generate_series(1, length(t))]),
        |         (a, c) -> (a * 137 + c) % 2147483629)
        |    ) AS hs
        |  FROM d
        |)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CASE WHEN 2 * len(list_filter(hs, x -> (x >> k) & 1 = 1)) > len(hs)
        |          THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END
        |     FOR k IN generate_series(0, 61)]), (a, b) -> a | b) AS fp
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_window_distinct" ->
      """WITH p AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |b AS (SELECT max(day) AS d1 FROM p),
        |x AS (
        |  SELECT user_id, unnest(generate_series(day::TIMESTAMP, day + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE AS win_end
        |  FROM p)
        |SELECT strftime(win_end, '%Y-%m-%d') AS win_end,
        |  count(DISTINCT user_id) AS n_active, count(*) AS n_presence
        |FROM x, b WHERE win_end <= b.d1
        |GROUP BY x.win_end ORDER BY win_end""".stripMargin,
    "q_tpch_q3" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1995-03-15'
        |  AND l_shipdate > DATE '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_date_spine" ->
      """WITH f AS (SELECT * FROM orders WHERE o_totalprice > 490000.0),
        |b AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |             date_trunc('month', max(o_orderdate)) AS hi FROM f),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m FROM b),
        |agg AS (
        |  SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |  FROM f GROUP BY 1)
        |SELECT strftime(m, '%Y-%m') AS o_month,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(sum_price, 0.0) AS sum_price
        |FROM spine LEFT JOIN agg USING (m) ORDER BY o_month""".stripMargin,
    "q_span_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        |  FROM toks WHERE len(w) >= 8
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
        |    w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS g
        |  FROM idx
        |), df AS (SELECT g, count(*) AS dfreq FROM sh GROUP BY g),
        |per AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |    sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS n_dup
        |  FROM sh JOIN df USING (g) GROUP BY doc_id
        |), sh2 AS (
        |  SELECT d.doc_id, CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
        |    CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_grams
        |  FROM documents d LEFT JOIN per USING (doc_id)
        |)
        |SELECT doc_id, n_grams, n_dup_grams,
        |  CASE WHEN n_grams = 0 THEN 0.0
        |       ELSE CAST(n_dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) END AS dup_share,
        |  (CASE WHEN n_grams = 0 THEN 0.0
        |        ELSE CAST(n_dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) END > 0.2) AS flagged
        |FROM sh2 ORDER BY doc_id""".stripMargin,
    "q_asof_join" ->
      """SELECT c.event_id, c.user_id, v.view_event, v.view_value
        |FROM events c LEFT JOIN LATERAL (
        |  SELECT v.event_id AS view_event, v.value AS view_value
        |  FROM events v
        |  WHERE v.user_id = c.user_id AND v.event_type = 'view'
        |    AND (v.ts < c.ts OR (v.ts = c.ts AND v.event_id < c.event_id))
        |  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
        |) v ON true
        |WHERE c.event_type = 'click'
        |ORDER BY event_id""".stripMargin,
    "q_dedup_cluster" ->
      s"""$dedupClusterCtes
        |SELECT doc_id, min(r) AS cluster_id, (doc_id = min(r)) AS is_canonical
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_cluster_size_hist" ->
      s"""$dedupClusterCtes,
        |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        |szs AS (SELECT cluster_id, count(*)::BIGINT AS sz FROM cl GROUP BY 1)
        |SELECT sz AS cluster_size, count(*)::BIGINT AS n_clusters
        |FROM szs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ann_brute" -> bruteAnnOracle,
    "q_ann_mips" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10
        |), s AS (
        |  SELECT q.q_id, e.vec_id, ${dot("e.v", "q.qv")} AS ip
        |  FROM e, q WHERE e.vec_id <> q.q_id
        |), r AS (
        |  SELECT q_id, vec_id, ip,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, vec_id ASC) AS INTEGER) AS rank
        |  FROM s
        |)
        |SELECT q_id, rank, vec_id, floor(ip * 1e6 + 0.5) / 1e6 AS ip
        |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "q_ann_recall" ->
      s"""SELECT b.q_id, count(l.vec_id) AS n_hits,
        |  floor(count(l.vec_id) / 10.0 * 1e6 + 0.5) / 1e6 AS recall
        |FROM ($bruteAnnOracle) b
        |LEFT JOIN (${Similarity.lshOracleSql()}) l
        |  ON b.q_id = l.q_id AND b.vec_id = l.vec_id
        |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin,
    "q_data_recipe" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |x AS (SELECT *, CAST(substring(source, 4) AS INTEGER) AS idx FROM s)
        |SELECT source, n_docs, n_tokens,
        |  floor(((idx + 1) / 210.0) * 1e6 + 0.5) / 1e6 AS weight,
        |  floor((100000 * (idx + 1) / 210.0) * 1e6 + 0.5) / 1e6 AS target_tokens,
        |  floor((100000 * (idx + 1) / 210.0 / n_tokens) * 1e6 + 0.5) / 1e6 AS epochs,
        |  least(1.0, floor((100000 * (idx + 1) / 210.0 / n_tokens) * 1e6 + 0.5) / 1e6) AS sample_rate
        |FROM x ORDER BY source""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id,
        |  len(string_split(trim(text), ' '))::INTEGER AS n_tokens,
        |  length(replace(text, ' ', ''))::DOUBLE / len(string_split(trim(text), ' ')) AS avg_token_len,
        |  length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_langid" -> langIdOracle,
    // Declared-vs-inferred language confusion matrix: wraps the langid
    // oracle (one derivation, two views) and joins the declared column.
    "q_lang_confusion" ->
      s"""WITH li AS (
         |$langIdOracle
         |)
         |SELECT d.lang, li.lang_detected, count(*) AS n_docs,
         |  floor((CAST(count(*) AS DOUBLE)
         |    / sum(count(*)) OVER (PARTITION BY d.lang)) * 1e6 + 0.5) / 1e6 AS share_of_lang
         |FROM li JOIN documents d ON d.doc_id = li.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(trim(text), ' '))::INTEGER AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+'))::INTEGER AS alpha_tokens,
        |  len(regexp_extract_all(text, '[0-9]+'))::INTEGER AS num_tokens,
        |  len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))::INTEGER AS punct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(7::BIGINT,
        |      list_transform(string_split(trim(text), ' '),
        |        t -> (length(t) * 7 + ascii(substr(t, 1, 1)))::BIGINT)),
        |    (acc, h) -> (acc * 131 + h) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Collision (Rényi-2) entropy: the summed quantity Σc² is exact integer
    // arithmetic on both engines; the single final log2 is rounded to 6.
    "q_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
        |), g AS (
        |  SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
        |  floor((CAST(sum(c) * sum(c) AS DOUBLE) / CAST(sum(c * c) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS eff_vocab,
        |  floor((log2(CAST(sum(c) * sum(c) AS DOUBLE) / CAST(sum(c * c) AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS h2_bits
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_quality_score" -> qualityScoreOracle,
    "q_quality_by_source" ->
      s"""WITH qs AS ($qualityScoreOracle),
        |src AS (SELECT doc_id, source FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  floor((CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS keep_rate,
        |  floor((CAST(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    / count(*)) * 1e6 + 0.5) / 1e6 AS mean_quality
        |FROM qs JOIN src ON qs.doc_id = src.doc_id
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_incremental_dedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(string_split(trim(text), ' '), 1, 8), ' ') AS k
        |  FROM documents),
        |m AS (SELECT max(doc_id) AS max_id FROM d),
        |h AS (SELECT DISTINCT k FROM d, m WHERE doc_id <= max_id // 2),
        |nw AS (SELECT doc_id, k FROM d, m WHERE doc_id > max_id // 2),
        |f AS (SELECT k, min(doc_id) AS first_id FROM nw GROUP BY 1)
        |SELECT nw.doc_id,
        |  CASE WHEN h.k IS NOT NULL THEN 'dup_of_history'
        |       WHEN nw.doc_id > f.first_id THEN 'dup_in_batch'
        |       ELSE 'keep' END AS verdict
        |FROM nw LEFT JOIN h ON nw.k = h.k JOIN f ON nw.k = f.k
        |ORDER BY nw.doc_id""".stripMargin,
    // Text payloads never parse as PNG/JPEG, so the oracle pins the fallback
    // branch; the real header parsers are covered by MultimodalSpec.
    // Text payloads all decode through the deterministic fallback, so the
    // oracle recomputes the same integer plan relationally; the real
    // header-decode path is exercised by MultimodalSpec on synthetic bytes.
    "q_resize_plan" ->
      """WITH m AS (
        |  SELECT doc_id, 'unknown' AS format,
        |    greatest(octet_length(encode(text)) % 640, 1) AS w,
        |    greatest(octet_length(encode(text)) % 480, 1) AS h
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, format, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
        |    CAST(CASE WHEN greatest(w, h) <= 256 THEN w
        |         ELSE greatest((w * 256) // greatest(w, h), 1) END AS INTEGER) AS out_w,
        |    CAST(CASE WHEN greatest(w, h) <= 256 THEN h
        |         ELSE greatest((h * 256) // greatest(w, h), 1) END AS INTEGER) AS out_h
        |  FROM m),
        |q AS (SELECT doc_id, format, w, h, out_w, out_h,
        |  CAST(out_w * out_h AS BIGINT) AS out_pixels FROM p)
        |SELECT doc_id, format, w, h, out_w, out_h, out_pixels,
        |  CAST(coalesce(sum(out_pixels) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1048576 AS BIGINT)
        |    AS batch_id
        |FROM q ORDER BY doc_id""".stripMargin,
    // Byte-4-gram SimHash fallback path (the corpus payloads are text, so
    // every doc takes the deterministic fallback — the same packed
    // two-polynomial shingle hash the token-SimHash oracle states, pure
    // integer arithmetic both engines compute identically); the oracle
    // states the doc-level all-pairs formulation, the Spark side must
    // reach the same set through pigeonhole banding (recall-complete to
    // Hamming 3, so the sets are EQUAL). generate_series(1, n-3) is empty
    // for n < 4 → all-zero fingerprint, matching the Scala n < 4 branch.
    "q_image_dedup" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |h AS (SELECT doc_id,
        |  [ (list_reduce(list_prepend(CAST(7 AS BIGINT),
        |       [CAST(ascii(substr(text, CAST(i+k AS INTEGER), 1)) AS BIGINT)
        |        FOR k IN generate_series(0, 3)]),
        |       (a, c) -> (a * 131 + c) % 2147483647) << 31)
        |    | list_reduce(list_prepend(CAST(11 AS BIGINT),
        |       [CAST(ascii(substr(text, CAST(i+k AS INTEGER), 1)) AS BIGINT)
        |        FOR k IN generate_series(0, 3)]),
        |       (a, c) -> (a * 137 + c) % 2147483629)
        |    FOR i IN generate_series(1, n - 3)] AS hs
        |  FROM d),
        |f AS (SELECT doc_id,
        |  CAST(list_aggregate(
        |    [CASE WHEN 2 * len(list_filter(hs, x -> (x >> k) & 1 = 1)) > len(hs)
        |          THEN '1' ELSE '0' END
        |     FOR k IN generate_series(0, 61)], 'string_agg', '') AS BIT) AS fp
        |  FROM h),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
        |  FROM f a JOIN f b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= 3)
        |SELECT doc_a, doc_b, hamming FROM p ORDER BY doc_a, doc_b""".stripMargin,
    "q_byte_features" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |e AS (SELECT doc_id, text, unnest(generate_series(1, n)) AS i FROM d),
        |b AS (SELECT doc_id, i, ascii(substr(text, CAST(i AS INTEGER), 1)) AS v FROM e),
        |f AS (
        |  SELECT doc_id, count(*) AS n_bytes,
        |    CAST(count(DISTINCT v) AS INTEGER) AS n_distinct_bytes,
        |    floor((CAST(sum(v) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS mean_byte,
        |    floor((sqrt(CAST(sum(v * v) AS DOUBLE) / count(*))) * 1e6 + 0.5) / 1e6 AS rms_byte
        |  FROM b GROUP BY 1),
        |wn AS (SELECT doc_id, (i - 1) // 64 AS win, sum(v * v) AS s2, count(*) AS c
        |  FROM b GROUP BY 1, 2),
        |pk AS (SELECT doc_id, floor((max(sqrt(CAST(s2 AS DOUBLE) / c))) * 1e6 + 0.5) / 1e6 AS peak_win_rms
        |  FROM wn GROUP BY 1)
        |SELECT f.doc_id, n_bytes, n_distinct_bytes, mean_byte, rms_byte, peak_win_rms
        |FROM f JOIN pk ON f.doc_id = pk.doc_id ORDER BY f.doc_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS byte_len,
        |  hex(substr(text, 1, 4)::BLOB) AS prefix_hex,
        |  'unknown' AS format,
        |  (octet_length(encode(text)) % 640)::INTEGER AS width,
        |  (octet_length(encode(text)) % 480)::INTEGER AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_embed_stats" ->
      s"""WITH e AS (
        |  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
        |), n AS (
        |  SELECT label, sqrt(${dot("v", "v")}) AS nrm FROM e
        |)
        |SELECT label, count(*) AS n_vecs,
        |  CAST(CAST(sum(CAST(nrm AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_norm,
        |  floor(min(nrm) * 1e6 + 0.5) / 1e6 AS min_norm,
        |  floor(max(nrm) * 1e6 + 0.5) / 1e6 AS max_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
        |s1 AS (SELECT user_id, min(t_us) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.t_us) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t_us > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.t_us) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t_us > s2.t2 GROUP BY 1)
        |SELECT 1 AS stage, 'signup' AS event_type, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'click', count(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY stage""".stripMargin,
    "q_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(date_diff('day', DATE '2024-01-01', ts::DATE) / 7.0) AS INTEGER) AS wk
        |  FROM events),
        |coh AS (SELECT user_id, min(wk) AS cohort_wk FROM wk GROUP BY 1),
        |act AS (
        |  SELECT cohort_wk, wk - cohort_wk AS wk_offset, count(*) AS n_active
        |  FROM wk JOIN coh USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cohort_wk, count(*) AS cohort_n FROM coh GROUP BY 1)
        |SELECT cohort_wk, wk_offset, n_active, cohort_n,
        |  floor((CAST(n_active AS DOUBLE) / cohort_n) * 1e6 + 0.5) / 1e6 AS retention
        |FROM act JOIN sz USING (cohort_wk)
        |ORDER BY cohort_wk, wk_offset""".stripMargin,
    "q_sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    (CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) % 5 + 1) / 10.0 AS weight,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(strpos('0123456789abcdef',
        |         substr(sha256(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
        |       FOR i IN generate_series(1, 8)]), (a, v) -> a * 16 + v)
        |      / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id, source, weight FROM d WHERE u < weight ORDER BY doc_id""".stripMargin,
    // Constants appear as the same double ARITHMETIC Spark runs ((1.2 + 1.0),
    // not a pre-folded 2.2 literal) so both engines hit identical bits.
    "q_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |tk AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS tok FROM d),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM tk
        |       WHERE tok IN ('query', 'vector', 'merge') GROUP BY 1, 2, 3),
        |dfq AS (SELECT tok, count(*) AS dfq FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |              CAST(sum(len(w)) AS DOUBLE) AS sdl FROM d),
        |tw AS (
        |  SELECT doc_id,
        |    ln(1.0 + (n_docs - dfq + 0.5) / (dfq + 0.5))
        |      * (tf * (1.2 + 1.0))
        |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sdl / n_docs))) AS tw
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN st
        |)
        |SELECT doc_id,
        |  floor((CAST(CAST(sum(CAST(tw AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS score,
        |  count(*) AS n_terms_hit
        |FROM tw GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "copy_incremental" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_funnel_time" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
        |s1 AS (SELECT user_id, min(t_us) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.t_us) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t_us > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.t_us) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t_us > s2.t2 GROUP BY 1),
        |d AS (
        |  SELECT 'signup->click' AS step, s2.t2 - s1.t1 AS delta_us
        |  FROM s2 JOIN s1 USING (user_id)
        |  UNION ALL
        |  SELECT 'click->purchase' AS step, s3.t3 - s2.t2
        |  FROM s3 JOIN s2 USING (user_id)),
        |h AS (SELECT step, delta_us, count(*) AS cnt FROM d GROUP BY 1, 2),
        |c AS (SELECT step, delta_us,
        |  sum(cnt) OVER (PARTITION BY step ORDER BY delta_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY step) AS n FROM h),
        |m AS (SELECT step,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN delta_us END) AS med_us
        |  FROM c GROUP BY 1)
        |SELECT d.step, count(*) AS n_users, min(delta_us) AS min_us, m.med_us,
        |  max(delta_us) AS max_us,
        |  floor((CAST(CAST(sum(CAST(delta_us AS DECIMAL(28,0))) AS VARCHAR) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS avg_us
        |FROM d JOIN m USING (step) GROUP BY d.step, m.med_us ORDER BY step""".stripMargin,
    "q_concurrency" ->
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, t_us,
        |    CAST(sum(CASE WHEN prev_us IS NULL OR t_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
        |  FROM x),
        |sess AS (SELECT user_id, sess_seq, min(t_us) AS first_us, max(t_us) AS last_us
        |         FROM s GROUP BY 1, 2),
        |b AS (
        |  SELECT first_us AS t_us, CAST(1 AS BIGINT) AS delta, user_id, sess_seq FROM sess
        |  UNION ALL
        |  SELECT last_us, CAST(-1 AS BIGINT), user_id, sess_seq FROM sess),
        |r AS (SELECT t_us, delta,
        |  CAST(sum(delta) OVER (ORDER BY t_us, delta DESC, user_id, sess_seq
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
        |  FROM b)
        |SELECT strftime(make_timestamp(t_us), '%Y-%m-%d') AS day,
        |  count(*) AS n_starts, max(running) AS peak_concurrent
        |FROM r WHERE delta = 1 GROUP BY 1 ORDER BY day""".stripMargin,
    "q_skyline" ->
      """WITH pm AS (SELECT p_retailprice, max(p_size) AS pmax FROM part GROUP BY 1),
        |r AS (SELECT p_retailprice, pmax,
        |  max(pmax) OVER (ORDER BY p_retailprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_lt
        |  FROM pm)
        |SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
        |FROM part p JOIN r USING (p_retailprice)
        |WHERE p.p_size = r.pmax AND (r.m_lt IS NULL OR r.pmax > r.m_lt)
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH o AS (SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS xc
        |           FROM orders),
        |g AS (SELECT o_orderkey, xc, unnest(generate_series(0, 6)) AS grp FROM o),
        |hs AS (SELECT xc, grp, sha256(concat(CAST(o_orderkey AS VARCHAR), '|',
        |         CAST(grp AS VARCHAR))) AS h FROM g),
        |sl AS (SELECT xc, grp * 16 + slot + 1 AS rep, substr(h, slot * 4 + 1, 4) AS h4
        |       FROM hs CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS slot) s
        |       WHERE grp * 16 + slot + 1 <= 100),
        |w AS (
        |  SELECT xc, rep,
        |    CASE WHEN h4 < '5e2d' THEN 0 WHEN h4 < 'bc5a' THEN 1
        |         WHEN h4 < 'eb71' THEN 2 WHEN h4 < 'fb23' THEN 3
        |         WHEN h4 < 'ff10' THEN 4 WHEN h4 < 'ffd9' THEN 5
        |         ELSE 6 END AS w
        |  FROM sl),
        |pw AS (SELECT rep, w, sum(CAST(xc AS DECIMAL(38,0))) AS sxc, count(*) AS nw
        |       FROM w GROUP BY 1, 2),
        |m AS (SELECT rep,
        |      CAST(sum(sxc * w) AS DOUBLE) / (CAST(sum(w * nw) AS DOUBLE) * 100.0) AS mean_b
        |      FROM pw GROUP BY 1),
        |r AS (SELECT mean_b, row_number() OVER (ORDER BY mean_b, rep) AS rk FROM m),
        |ci AS (SELECT floor((min(CASE WHEN rk = 3 THEN mean_b END)) * 1e6 + 0.5) / 1e6 AS ci_lo,
        |              floor((min(CASE WHEN rk = 98 THEN mean_b END)) * 1e6 + 0.5) / 1e6 AS ci_hi FROM r),
        |f AS (SELECT count(*) AS n_rows,
        |  floor((CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS mean_full
        |  FROM orders)
        |SELECT CAST(100 AS BIGINT) AS n_boot, f.n_rows, f.mean_full, ci.ci_lo, ci.ci_hi
        |FROM f CROSS JOIN ci""".stripMargin,
    "q_triangle_count" -> Similarity.triangleCountOracleSql(),
    "q_rrf_fusion" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |tk AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS tok FROM d),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM tk
        |       WHERE tok IN ('query', 'vector', 'merge') GROUP BY 1, 2, 3),
        |dfq AS (SELECT tok, count(*) AS dfq FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |              CAST(sum(len(w)) AS DOUBLE) AS sdl FROM d),
        |tw AS (
        |  SELECT doc_id,
        |    ln(1.0 + (n_docs - dfq + 0.5) / (dfq + 0.5)) * (tf * (1.2 + 1.0))
        |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sdl / n_docs))) AS tw_bm25,
        |    tf * ln((n_docs + 1.0) / (dfq + 1.0)) AS tw_tfidf
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN st),
        |sc AS (SELECT doc_id,
        |  floor((CAST(CAST(sum(CAST(tw_bm25 AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS bm25,
        |  floor((CAST(CAST(sum(CAST(tw_tfidf AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tfidf
        |  FROM tw GROUP BY doc_id),
        |rk AS (SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rank_bm25,
        |  CAST(row_number() OVER (ORDER BY tfidf DESC, doc_id) AS INTEGER) AS rank_tfidf
        |  FROM sc)
        |SELECT doc_id, rank_bm25, rank_tfidf,
        |  floor((1.0 / (60 + rank_bm25) + 1.0 / (60 + rank_tfidf)) * 1e6 + 0.5) / 1e6 AS rrf
        |FROM rk ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q_rbo" -> {
      val spine = TextAnalysis.rboWeights(0.9, 20)
        .map { case (i, w) => s"($i, ${w}::DOUBLE)" }.mkString(", ")
      val factor = (1.0 - 0.9) / 0.9
      s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
         |tk AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS tok FROM d),
         |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM tk
         |       WHERE tok IN ('query', 'vector', 'merge') GROUP BY 1, 2, 3),
         |dfq AS (SELECT tok, count(*) AS dfq FROM tf GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |              CAST(sum(len(w)) AS DOUBLE) AS sdl FROM d),
         |tw AS (
         |  SELECT doc_id,
         |    ln(1.0 + (n_docs - dfq + 0.5) / (dfq + 0.5)) * (tf * (1.2 + 1.0))
         |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sdl / n_docs))) AS tw_bm25,
         |    tf * ln((n_docs + 1.0) / (dfq + 1.0)) AS tw_tfidf
         |  FROM tf JOIN dfq USING (tok) CROSS JOIN st),
         |sc AS (SELECT doc_id,
         |  floor((CAST(CAST(sum(CAST(tw_bm25 AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS bm25,
         |  floor((CAST(CAST(sum(CAST(tw_tfidf AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tfidf
         |  FROM tw GROUP BY doc_id),
         |rk AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rank_bm25,
         |  CAST(row_number() OVER (ORDER BY tfidf DESC, doc_id) AS INTEGER) AS rank_tfidf
         |  FROM sc),
         |mxf AS (SELECT doc_id, greatest(rank_bm25, rank_tfidf) AS mx
         |        FROM rk WHERE greatest(rank_bm25, rank_tfidf) <= 20),
         |spine AS (SELECT * FROM (VALUES $spine) s(depth, w)),
         |agg AS (
         |  SELECT s.depth, s.w, count(m.doc_id)::BIGINT AS n_common
         |  FROM spine s LEFT JOIN mxf m ON m.mx <= s.depth GROUP BY 1, 2),
         |tm AS (SELECT depth, n_common,
         |  CAST(n_common AS DOUBLE) / CAST(depth AS DOUBLE) AS agreement,
         |  w * (CAST(n_common AS DOUBLE) / CAST(depth AS DOUBLE)) AS term
         |  FROM agg)
         |SELECT depth, n_common,
         |  floor(agreement * 1e6 + 0.5) / 1e6 AS agreement,
         |  floor(${factor} * CAST(CAST(
         |    sum(CAST(term AS DECIMAL(28,12))) OVER (ORDER BY depth
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS rbo_cum
         |FROM tm ORDER BY depth""".stripMargin
    },
    "copy_zorder" -> TableCopy.zorderOracleSql(),
    "q_quartiles" ->
      """WITH c AS (SELECT c_mktsegment AS seg, CAST(c_acctbal AS DECIMAL(12,2)) AS v
        |           FROM customer),
        |h AS (SELECT seg, v, count(*) AS cnt FROM c GROUP BY 1, 2),
        |w AS (SELECT seg, v,
        |  sum(cnt) OVER (PARTITION BY seg ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY seg) AS n FROM h)
        |SELECT seg, CAST(max(n) AS BIGINT) AS n_rows,
        |  CAST(min(CASE WHEN cum >= CAST(ceil(n * 0.25) AS BIGINT) THEN v END) AS DOUBLE) AS p25,
        |  CAST(min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN v END) AS DOUBLE) AS p50,
        |  CAST(min(CASE WHEN cum >= CAST(ceil(n * 0.75) AS BIGINT) THEN v END) AS DOUBLE) AS p75
        |FROM w GROUP BY seg ORDER BY seg""".stripMargin,
    "q_mutual_info" ->
      """WITH t AS (SELECT count(*) AS n_docs FROM documents),
        |cells AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
        |lm AS (SELECT lang, count(*) AS nl FROM documents GROUP BY 1),
        |sm AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
        |mi AS (SELECT floor((CAST(CAST(sum(CAST(
        |    (n / n_docs) * ln((n * n_docs) / (nl * ns)) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mi_nats
        |  FROM cells JOIN lm USING (lang) JOIN sm USING (source) CROSS JOIN t),
        |hl AS (SELECT floor((CAST(CAST(sum(CAST(
        |    -(nl / n_docs) * ln(nl / n_docs) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS h_lang
        |  FROM lm CROSS JOIN t),
        |hs AS (SELECT floor((CAST(CAST(sum(CAST(
        |    -(ns / n_docs) * ln(ns / n_docs) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS h_source
        |  FROM sm CROSS JOIN t)
        |SELECT t.n_docs, mi.mi_nats, hl.h_lang, hs.h_source,
        |  floor((mi.mi_nats / least(hl.h_lang, hs.h_source)) * 1e6 + 0.5) / 1e6 AS nmi
        |FROM t, mi, hl, hs""".stripMargin,
    "q_cluster_purity" -> Similarity.clusterPurityOracleSql(),
    "q_cov_matrix" ->
      """WITH ve AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |            FROM embeddings),
        |e AS (SELECT vec_id,
        |  CAST(unnest(generate_series(1, len(v))) AS INTEGER) - 1 AS i,
        |  unnest(v) AS x FROM ve),
        |p AS (SELECT a.i AS i, b.i AS j, a.x * b.x AS xy
        |      FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i),
        |d AS (SELECT i, CAST(CAST(sum(CAST(floor(x * 1e12 + 0.5) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12 AS sx,
        |      count(*) AS n_dim FROM e GROUP BY 1),
        |c AS (SELECT i, j,
        |      CAST(CAST(sum(CAST(floor(xy * 1e12 + 0.5) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12 AS sxy,
        |      count(*) AS n FROM p GROUP BY 1, 2)
        |SELECT c.i, c.j, c.n,
        |  floor((c.sxy / c.n - (da.sx / da.n_dim) * (db.sx / db.n_dim)) * 1e6 + 0.5) / 1e6 AS cov
        |FROM c JOIN d da ON da.i = c.i JOIN d db ON db.i = c.j
        |ORDER BY c.i, c.j""".stripMargin,
    "q_ks_test" ->
      """WITH v AS (
        |  SELECT c.c_mktsegment AS seg, CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |h AS (SELECT v,
        |  sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS ca,
        |  sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS cb
        |  FROM v GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM h),
        |c AS (SELECT v,
        |  CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
        |  CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
        |  FROM h),
        |d AS (SELECT v,
        |  abs(CAST(cuma AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0)) -
        |      CAST(cumb AS DECIMAL(19,0)) * CAST(na AS DECIMAL(19,0))) AS dnum
        |  FROM c CROSS JOIN t),
        |m AS (SELECT max(dnum) AS max_num FROM d)
        |SELECT t.na, t.nb,
        |  floor((CAST(CAST(m.max_num AS VARCHAR) AS DOUBLE) /
        |        CAST(CAST(CAST(t.na AS DECIMAL(19,0)) * CAST(t.nb AS DECIMAL(19,0)) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS d_stat,
        |  CAST((SELECT min(v) FROM d WHERE d.dnum = m.max_num) AS DOUBLE) AS at_value
        |FROM t CROSS JOIN m""".stripMargin,
    "q_psi" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 'ref' ELSE 'cur' END AS period,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders),
        |hist AS (SELECT v, count(*) AS cnt FROM o WHERE period = 'ref' GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_ref FROM hist),
        |cm AS (SELECT v,
        |  CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM hist),
        |edges AS (
        |  SELECT q, min(v) AS edge
        |  FROM cm CROSS JOIN tot
        |  CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS q) qs
        |  WHERE cum >= CAST(ceil(n_ref * q / 10.0) AS BIGINT)
        |  GROUP BY q),
        |pv AS (SELECT period, v, count(*) AS c FROM o GROUP BY 1, 2),
        |binned AS (
        |  SELECT period, v, c,
        |    sum(CASE WHEN v > edge THEN 1 ELSE 0 END) AS gt
        |  FROM pv CROSS JOIN edges GROUP BY 1, 2, 3),
        |cells AS (
        |  SELECT CAST(gt + 1 AS BIGINT) AS bin,
        |    CAST(sum(CASE WHEN period = 'ref' THEN c ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN period = 'cur' THEN c ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM binned GROUP BY 1),
        |tots AS (SELECT CAST(sum(n_ref) AS BIGINT) AS ta, CAST(sum(n_cur) AS BIGINT) AS tb FROM cells),
        |terms AS (
        |  SELECT bin, n_ref, n_cur,
        |    (n_ref + 1) / (ta + 10) AS pa, (n_cur + 1) / (tb + 10) AS pb
        |  FROM cells CROSS JOIN tots)
        |SELECT bin, n_ref, n_cur, floor((pa) * 1e6 + 0.5) / 1e6 AS share_ref, floor((pb) * 1e6 + 0.5) / 1e6 AS share_cur,
        |  floor(((pa - pb) * ln(pa / pb)) * 1e6 + 0.5) / 1e6 AS term,
        |  floor((CAST(CAST(sum(CAST((pa - pb) * ln(pa / pb) AS DECIMAL(28,12))) OVER () AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS psi
        |FROM terms ORDER BY bin""".stripMargin,
    "q_cusum" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT sum(rev) AS tot_rev, CAST(count(*) AS BIGINT) AS n_days FROM daily),
        |cs AS (SELECT day,
        |  sum(rev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pref,
        |  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
        |  FROM daily),
        |dev AS (SELECT day, abs(n_days * pref - idx * tot_rev) AS absdev
        |        FROM cs CROSS JOIN tot),
        |m AS (SELECT max(absdev) AS mx FROM dev)
        |SELECT tot.n_days,
        |  (SELECT min(day) FROM dev WHERE dev.absdev = m.mx) AS cp_day,
        |  floor((CAST(m.mx AS DOUBLE) / CAST(tot.n_days AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS max_dev
        |FROM tot CROSS JOIN m""".stripMargin,
    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |isl AS (SELECT user_id, day,
        |  day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS island
        |  FROM days),
        |st AS (SELECT user_id, island, count(*) AS len, min(day) AS start
        |       FROM isl GROUP BY 1, 2),
        |best AS (SELECT user_id, len AS longest_streak,
        |  strftime(start, '%Y-%m-%d') AS longest_start,
        |  row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start) AS rk
        |  FROM st),
        |agg AS (SELECT user_id, count(*) AS n_streaks,
        |  CAST(sum(len) AS BIGINT) AS n_active_days FROM st GROUP BY 1)
        |SELECT agg.user_id, n_streaks, n_active_days, longest_streak, longest_start
        |FROM agg JOIN best ON agg.user_id = best.user_id
        |WHERE rk = 1 ORDER BY agg.user_id""".stripMargin,
    "q_linreg" ->
      """WITH s AS (
        |  SELECT c_mktsegment AS segment, count(*) AS n,
        |    sum(CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT)) AS sx,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS syc,
        |    sum(CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT)
        |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxyc,
        |    sum(CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT)
        |      * CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT)) AS sxx
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
        |fit AS (SELECT segment, n,
        |  CAST(n * sxyc - sx * syc AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope_raw,
        |  sx, syc FROM s)
        |SELECT segment, n, floor((slope_raw) * 1e6 + 0.5) / 1e6 AS slope,
        |  floor(((CAST(syc AS DOUBLE) / 100.0 - slope_raw * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS intercept
        |FROM fit ORDER BY segment""".stripMargin,
    "q_hhi" ->
      """WITH crev AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS crev
        |  FROM orders GROUP BY 1),
        |nat AS (
        |  SELECT r_name, n_name,
        |    CAST(CAST(sum(crev) AS DECIMAL(18,2)) * 100 AS HUGEINT) AS nrev_c
        |  FROM crev JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT r_name, count(*) AS n_nations,
        |  floor((CAST(sum(nrev_c * nrev_c) AS DOUBLE)
        |    / CAST(sum(nrev_c) * sum(nrev_c) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS hhi,
        |  floor((CAST(max(nrev_c) AS DOUBLE) / CAST(sum(nrev_c) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS top_share
        |FROM nat GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_seasonality" ->
      """WITH d AS (
        |  SELECT dayofweek(o_orderdate::DATE) AS dow, count(*) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(rev) AS tot_rev FROM d)
        |SELECT dow, n_orders, CAST(rev AS DOUBLE) AS revenue,
        |  floor((CAST(rev * 7 AS DOUBLE) / CAST(tot_rev AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS seas_index,
        |  floor((CAST(rev AS DOUBLE) / CAST(n_orders AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS avg_order
        |FROM d CROSS JOIN t ORDER BY dow""".stripMargin,
    "q_ewma" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day FROM b),
        |full_s AS (
        |  SELECT spine.day, coalesce(rev, CAST(0 AS DECIMAL(18,2))) AS rev
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |lagged AS (SELECT day, rev,
        |  row_number() OVER (ORDER BY day) AS rn,
        |  rev * 64 + lag(rev, 1) OVER (ORDER BY day) * 32
        |    + lag(rev, 2) OVER (ORDER BY day) * 16
        |    + lag(rev, 3) OVER (ORDER BY day) * 8
        |    + lag(rev, 4) OVER (ORDER BY day) * 4
        |    + lag(rev, 5) OVER (ORDER BY day) * 2
        |    + lag(rev, 6) OVER (ORDER BY day) AS num
        |  FROM full_s)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
        |  floor(CAST(CAST(num AS VARCHAR) AS DOUBLE) / 127.0 * 1e6 + 0.5) / 1e6
        |    AS ewma
        |FROM lagged WHERE rn >= 7 ORDER BY day""".stripMargin,
    "q_lateness" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS t_us FROM events),
        |l AS (SELECT event_id,
        |  max(t_us) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - t_us AS late_us FROM e),
        |bk AS (SELECT CASE WHEN late_us = 0 THEN '0_in_order'
        |    WHEN late_us <= 60000000 THEN '1_le_1m'
        |    WHEN late_us <= 600000000 THEN '2_le_10m'
        |    WHEN late_us <= 3600000000 THEN '3_le_1h'
        |    ELSE '4_gt_1h' END AS bucket, late_us FROM l),
        |g AS (SELECT bucket, count(*) AS n_events, max(late_us) AS max_late_us
        |      FROM bk GROUP BY 1),
        |t AS (SELECT sum(n_events) AS total FROM g)
        |SELECT bucket, n_events, max_late_us,
        |  floor((CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS share
        |FROM g CROSS JOIN t ORDER BY bucket""".stripMargin,
    // Lang-pair rollup of the SAME exact all-pairs near-dup derivation the
    // jaccard/matrix oracles share — one oracle family, three views.
    "q_dup_lang_matrix" ->
      s"""WITH nd AS (
         |$neardupJaccardOracle
         |)
         |SELECT least(da.lang, db.lang) AS lang_a,
         |  greatest(da.lang, db.lang) AS lang_b, count(*) AS n_pairs
         |FROM nd
         |JOIN documents da ON da.doc_id = nd.doc_a
         |JOIN documents db ON db.doc_id = nd.doc_b
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_chi2" ->
      """WITH t AS (SELECT count(*) AS n_docs FROM documents),
        |cells AS (SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
        |lm AS (SELECT lang, count(*) AS rl FROM documents GROUP BY 1),
        |sm AS (SELECT source, count(*) AS cs FROM documents GROUP BY 1),
        |dims AS (SELECT (SELECT count(*) FROM lm) AS n_lang,
        |                (SELECT count(*) FROM sm) AS n_source),
        |dev AS (SELECT floor((CAST(CAST(sum(CAST(
        |    CAST(CAST(n_docs * obs - rl * cs AS HUGEINT)
        |         * CAST(n_docs * obs - rl * cs AS HUGEINT) AS DOUBLE)
        |      / CAST(CAST(n_docs AS HUGEINT) * rl * cs AS DOUBLE)
        |    AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS chi2
        |  FROM cells JOIN lm USING (lang) JOIN sm USING (source) CROSS JOIN t)
        |SELECT t.n_docs, (n_lang - 1) * (n_source - 1) AS dof, dev.chi2,
        |  floor((sqrt(dev.chi2 / (t.n_docs * least(n_lang - 1, n_source - 1)))) * 1e6 + 0.5) / 1e6
        |    AS cramers_v
        |FROM t, dev, dims""".stripMargin,
    "q_tokenizer_fertility" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS chars,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes,
        |  floor((CAST(sum(len(string_split(trim(text), ' '))) AS DOUBLE) * 100.0
        |    / CAST(sum(length(text)) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tokens_per_100_chars,
        |  floor((CAST(sum(octet_length(encode(text))) AS DOUBLE)
        |    / CAST(sum(len(string_split(trim(text), ' '))) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS bytes_per_token
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "copy_sample" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |ORDER BY o_orderkey""".stripMargin,
    "q_welch_ttest" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |s AS (
        |  SELECT
        |    sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)::BIGINT AS na,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END)::BIGINT AS nb,
        |    sum(CASE WHEN seg = 'BUILDING' THEN yc ELSE 0 END)::BIGINT AS sa,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN yc ELSE 0 END)::BIGINT AS sb,
        |    sum(CASE WHEN seg = 'BUILDING' THEN CAST(yc AS HUGEINT) * yc ELSE 0 END) AS qa,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN CAST(yc AS HUGEINT) * yc ELSE 0 END) AS qb
        |  FROM j),
        |v AS (
        |  SELECT na, nb, sa, sb,
        |    CAST(CAST(na AS HUGEINT) * qa - CAST(sa AS HUGEINT) * sa AS DOUBLE)
        |      / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE) AS sea,
        |    CAST(CAST(nb AS HUGEINT) * qb - CAST(sb AS HUGEINT) * sb AS DOUBLE)
        |      / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE) AS seb
        |  FROM s)
        |SELECT na AS n_a, nb AS n_b,
        |  floor((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0) * 1e6 + 0.5) / 1e6 AS mean_a,
        |  floor((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0) * 1e6 + 0.5) / 1e6 AS mean_b,
        |  floor(((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
        |       - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / sqrt(sea + seb)) * 1e6 + 0.5) / 1e6 AS t_stat,
        |  floor(((sea + seb) * (sea + seb)
        |    / (sea * sea / (CAST(na AS DOUBLE) - 1.0)
        |     + seb * seb / (CAST(nb AS DOUBLE) - 1.0))) * 1e6 + 0.5) / 1e6 AS df
        |FROM v""".stripMargin,
    "q_mannwhitney" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |hist AS (
        |  SELECT yc,
        |    sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END)::BIGINT AS cb
        |  FROM j GROUP BY 1),
        |terms AS (
        |  SELECT ca, cb,
        |    CAST(ca AS HUGEINT) * (2 * CAST(coalesce(sum(cb) OVER (ORDER BY yc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT)
        |      + CAST(cb AS HUGEINT)) AS u2_term,
        |    CAST(ca + cb AS HUGEINT) * (ca + cb) * (ca + cb)
        |      - CAST(ca + cb AS HUGEINT) AS tie_term
        |  FROM hist),
        |agg AS (
        |  SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
        |    sum(u2_term) AS u2, sum(tie_term) AS ties
        |  FROM terms)
        |SELECT na AS n_a, nb AS n_b,
        |  CAST(u2 AS DOUBLE) / 2.0 AS u,
        |  floor(((CAST(u2 AS DOUBLE) / 2.0
        |      - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
        |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
        |      * ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0)
        |        - CAST(ties AS DOUBLE) / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
        |          * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1.0))))) * 1e6 + 0.5) / 1e6 AS z,
        |  floor((CAST(u2 AS DOUBLE) / 2.0
        |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS auc
        |FROM agg""".stripMargin,
    "q_spearman" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS HUGEINT) AS rx,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_discount)
        |      + count(*) OVER (PARTITION BY l_returnflag, l_discount) - 1 AS HUGEINT) AS ry
        |  FROM lineitem),
        |s AS (
        |  SELECT flag, count(*)::BIGINT AS n, sum(rx) AS sx, sum(ry) AS sy,
        |    sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
        |  FROM r GROUP BY 1)
        |SELECT flag, n,
        |  floor((CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
        |         * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS rho
        |FROM s ORDER BY flag""".stripMargin,
    "q_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(date_part('year', o_orderdate::DATE) * 12
        |      + date_part('month', o_orderdate::DATE) - 1 AS BIGINT) AS midx,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS rev
        |  FROM orders),
        |first_m AS (SELECT o_custkey, min(midx) AS cidx FROM o GROUP BY 1),
        |sized AS (SELECT cidx, count(*)::BIGINT AS cohort_size FROM first_m GROUP BY 1),
        |cells AS (
        |  SELECT cidx, o.midx - cidx AS month_offset,
        |    count(DISTINCT o.o_custkey)::BIGINT AS n_active, sum(rev) AS rev
        |  FROM o JOIN first_m ON o.o_custkey = first_m.o_custkey
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cidx, month_offset, n_active, rev,
        |    sum(rev) OVER (PARTITION BY cidx ORDER BY month_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cells)
        |SELECT printf('%04d-%02d', CAST(cidx // 12 AS INTEGER),
        |    CAST(cidx % 12 AS INTEGER) + 1) AS cohort,
        |  month_offset, cohort_size, n_active,
        |  CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
        |  floor(CAST(CAST(cum AS VARCHAR) AS DOUBLE)
        |    / CAST(cohort_size AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cum_ltv
        |FROM cum JOIN sized USING (cidx)
        |ORDER BY cohort, month_offset""".stripMargin,
    "q_abc_class" ->
      """WITH per AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS rev
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(rev) AS total FROM per),
        |c AS (
        |  SELECT rev, total,
        |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM per, t),
        |cl AS (
        |  SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
        |    WHEN cum * 20 <= total * 19 THEN 'B' ELSE 'C' END AS abc_class,
        |    rev, total
        |  FROM c)
        |SELECT abc_class, count(*)::BIGINT AS n_parts,
        |  CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS revenue,
        |  floor((CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(max(total) AS VARCHAR) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS rev_share
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling_corr" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS xc,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS xv
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day FROM b),
        |full_s AS (
        |  SELECT spine.day, coalesce(xc, 0) AS xc, coalesce(xv, 0) AS xv
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |win AS (
        |  SELECT day, xc, xv,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    sum(xc) OVER w AS sx, sum(xv) OVER w AS sy,
        |    sum(xc * xv) OVER w AS sxy, sum(xc * xc) OVER w AS sxx,
        |    sum(xv * xv) OVER w AS syy
        |  FROM full_s
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |f AS (
        |  SELECT day, xc, xv, rn,
        |    14.0 * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    14.0 * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS d1,
        |    14.0 * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS d2
        |  FROM win)
        |SELECT strftime(day, '%Y-%m-%d') AS day, xc AS clicks, xv AS views,
        |  CASE WHEN d1 > 0 AND d2 > 0 THEN floor((num / sqrt(d1 * d2)) * 1e6 + 0.5) / 1e6 END AS roll_corr
        |FROM f WHERE rn >= 14 ORDER BY day""".stripMargin,
    "q_hubness" -> Similarity.hubnessOracleSql(),
    "q_burstiness" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents),
        |pd AS (SELECT doc_id, term, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
        |bt AS (
        |  SELECT term, sum(c)::BIGINT AS s, sum(CAST(c AS HUGEINT) * c) AS sq,
        |    count(*)::BIGINT AS df
        |  FROM pd GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |top AS (SELECT * FROM bt ORDER BY s DESC, term ASC LIMIT 20)
        |SELECT term, s AS n_occurrences, df AS n_docs_with,
        |  floor((CAST(CAST(n_docs AS HUGEINT) * sq - CAST(s AS HUGEINT) * s AS DOUBLE)
        |    / CAST(CAST(n_docs AS HUGEINT) * s AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS fano
        |FROM top, t ORDER BY n_occurrences DESC, term ASC""".stripMargin,
    "copy_shard" ->
      """SELECT substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |  count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_outlier_iqr" ->
      """WITH v AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |h AS (SELECT seg, yc, count(*)::BIGINT AS cnt FROM v GROUP BY 1, 2),
        |cm AS (
        |  SELECT seg, yc, cnt,
        |    sum(cnt) OVER (PARTITION BY seg ORDER BY yc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY seg) AS n
        |  FROM h),
        |qt AS (
        |  SELECT seg, max(n)::BIGINT AS n_orders,
        |    min(CASE WHEN cum >= CAST(ceil(n * 0.25) AS BIGINT) THEN yc END) AS q1,
        |    min(CASE WHEN cum >= CAST(ceil(n * 0.75) AS BIGINT) THEN yc END) AS q3
        |  FROM cm GROUP BY 1),
        |fl AS (
        |  SELECT cm.seg, cm.cnt, qt.n_orders, qt.q1, qt.q3,
        |    (cm.yc * 2 < qt.q1 * 2 - (qt.q3 - qt.q1) * 3
        |     OR cm.yc * 2 > qt.q3 * 2 + (qt.q3 - qt.q1) * 3) AS is_out
        |  FROM cm JOIN qt ON cm.seg = qt.seg)
        |SELECT seg, max(n_orders) AS n_orders,
        |  floor((CAST(max(q1) AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS q1,
        |  floor((CAST(max(q3) AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS q3,
        |  sum(CASE WHEN is_out THEN cnt ELSE 0 END)::BIGINT AS n_outliers,
        |  floor((CAST(sum(CASE WHEN is_out THEN cnt ELSE 0 END) AS DOUBLE)
        |    / CAST(max(n_orders) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS outlier_share
        |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_trimmed_mean" ->
      """WITH v AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT seg, yc,
        |    row_number() OVER (PARTITION BY seg ORDER BY yc) AS rn,
        |    count(*) OVER (PARTITION BY seg) AS n
        |  FROM v),
        |k AS (SELECT seg, yc, rn, n, n // 10 AS k FROM r)
        |SELECT seg, max(n)::BIGINT AS n_orders,
        |  max(k)::BIGINT AS n_trimmed_each_side,
        |  floor((CAST(sum(yc) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 100.0) * 1e6 + 0.5) / 1e6 AS mean,
        |  floor((CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN yc ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END) AS DOUBLE)
        |    / 100.0) * 1e6 + 0.5) / 1e6 AS trimmed_mean
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_reciprocity" -> Similarity.reciprocityOracleSql(),
    "q_assortativity" -> Similarity.assortativityOracleSql(),
    "q_hapax" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents),
        |tc AS (SELECT source, term, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2)
        |SELECT source, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
        |  floor((CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS hapax_share
        |FROM tc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_runs_test" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |h AS (SELECT rev, count(*)::BIGINT AS cnt FROM daily GROUP BY 1),
        |cm AS (SELECT rev,
        |  sum(cnt) OVER (ORDER BY rev ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER () AS n FROM h),
        |med AS (SELECT min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT)
        |  THEN rev END) AS med FROM cm),
        |sgn AS (SELECT day, CASE WHEN rev > med THEN 1 ELSE 0 END AS above
        |        FROM daily, med WHERE rev <> med),
        |ch AS (SELECT above,
        |  CASE WHEN lag(above) OVER (ORDER BY day) IS NULL THEN 1
        |    WHEN above <> lag(above) OVER (ORDER BY day) THEN 1 ELSE 0 END AS chg
        |  FROM sgn),
        |agg AS (SELECT
        |  sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |  sum(CASE WHEN above = 0 THEN 1 ELSE 0 END)::BIGINT AS n2,
        |  sum(chg)::BIGINT AS runs FROM ch)
        |SELECT n1 AS n_above, n2 AS n_below, runs AS n_runs,
        |  floor((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0) * 1e6 + 0.5) / 1e6 AS expected_runs,
        |  floor(((CAST(runs AS DOUBLE)
        |      - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
        |    / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
        |      / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0)))) * 1e6 + 0.5) / 1e6 AS z
        |FROM agg""".stripMargin,
    "q_elasticity" ->
      """WITH li AS (
        |  SELECT l_partkey, ln(l_extendedprice / l_quantity) AS x,
        |    ln(l_quantity) AS y
        |  FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0),
        |s AS (
        |  SELECT p_brand AS brand, count(*)::BIGINT AS n,
        |    sum(CAST(x AS DECIMAL(28,12))) AS sx,
        |    sum(CAST(y AS DECIMAL(28,12))) AS sy,
        |    sum(CAST(x * y AS DECIMAL(28,12))) AS sxy,
        |    sum(CAST(x * x AS DECIMAL(28,12))) AS sxx
        |  FROM li JOIN part ON l_partkey = p_partkey GROUP BY 1)
        |SELECT brand, n,
        |  floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS elasticity
        |FROM s ORDER BY brand""".stripMargin,
    "copy_jdbc_partitioned" ->
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_theil" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |sv AS (SELECT c_mktsegment AS seg, yc
        |       FROM rev JOIN customer ON o_custkey = c_custkey),
        |tt AS (SELECT seg, count(*)::BIGINT AS n, sum(yc)::BIGINT AS s
        |       FROM sv GROUP BY 1),
        |terms AS (SELECT sv.seg, tt.n, tt.s,
        |  CAST((CAST(yc AS DOUBLE) * CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
        |    * ln(CAST(yc AS DOUBLE) * CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
        |    AS DECIMAL(28,12)) AS term
        |  FROM sv JOIN tt USING (seg))
        |SELECT seg, max(n) AS n_customers,
        |  floor((CAST(max(s) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 100.0) * 1e6 + 0.5) / 1e6
        |    AS mean_revenue,
        |  floor((CAST(sum(term) AS DOUBLE) / CAST(max(n) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS theil_t
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_markov_steady" -> {
      def rnd(prev: String, out: String): String =
        s"""$out AS (SELECT st.event_type, coalesce(CAST(x.in_p AS DOUBLE), 0.0) AS p
           |  FROM st LEFT JOIN (
           |    SELECT tr.to_type AS event_type,
           |      sum(CAST(pp.p * (CAST(tr.nij AS DOUBLE) / CAST(rt.ni AS DOUBLE))
           |        AS DECIMAL(38,18))) AS in_p
           |    FROM tr JOIN rt USING (from_type)
           |    JOIN $prev pp ON pp.event_type = tr.from_type
           |    GROUP BY 1) x ON x.event_type = st.event_type)""".stripMargin
      s"""WITH s AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |tr AS (SELECT from_type, to_type, count(*)::BIGINT AS nij FROM s
         |       WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT from_type, sum(nij)::BIGINT AS ni FROM tr GROUP BY 1),
         |st AS (SELECT DISTINCT event_type FROM (
         |  SELECT from_type AS event_type FROM tr
         |  UNION ALL SELECT to_type FROM tr)),
         |nst AS (SELECT count(*)::BIGINT AS n FROM st),
         |p0 AS (SELECT event_type, 1.0 / n AS p FROM st, nst),
         |${rnd("p0", "r1")},
         |${rnd("r1", "r2")},
         |${rnd("r2", "r3")}
         |SELECT event_type, floor((p) * 1e9 + 0.5) / 1e9 AS pi FROM r3 ORDER BY event_type""".stripMargin
    },
    "q_dup_inflation" ->
      """WITH d AS (
        |  SELECT source, text,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |g AS (SELECT source, text, count(*)::BIGINT AS copies, max(tok) AS tok
        |      FROM d GROUP BY 1, 2)
        |SELECT source, sum(copies)::BIGINT AS n_docs, count(*)::BIGINT AS n_distinct,
        |  sum(copies * tok)::BIGINT AS total_tokens, sum(tok)::BIGINT AS distinct_tokens,
        |  floor((CAST(sum(copies * tok) AS DOUBLE) / CAST(sum(tok) AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |    AS inflation
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_drawdown" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |c AS (SELECT day, rev,
        |  sum(rev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM daily),
        |p AS (SELECT day, cum,
        |  max(cum) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM c),
        |d AS (SELECT day, cum, peak, peak - cum AS dd FROM p)
        |SELECT strftime(day, '%Y-%m-%d') AS trough_day,
        |  CAST(peak AS DOUBLE) AS peak_cum_revenue,
        |  CAST(cum AS DOUBLE) AS trough_cum_revenue,
        |  CAST(dd AS DOUBLE) AS max_drawdown,
        |  floor((CAST(dd AS DOUBLE) / CAST(peak AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS drawdown_share
        |FROM d ORDER BY dd DESC, day ASC LIMIT 1""".stripMargin,
    "q_rolling_z" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day FROM b),
        |full_s AS (
        |  SELECT spine.day, coalesce(yc, 0) AS yc
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |win AS (
        |  SELECT day, yc,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    sum(yc) OVER w AS sx,
        |    sum(CAST(yc AS HUGEINT) * yc) OVER w AS sq
        |  FROM full_s
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)),
        |f AS (
        |  SELECT day, yc, rn, sx,
        |    CAST(28 * sq - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS var_num
        |  FROM win)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  floor((CAST(yc AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS revenue,
        |  CASE WHEN var_num > 0 THEN
        |    floor(((CAST(yc AS DOUBLE) - CAST(sx AS DOUBLE) / 28.0)
        |      / sqrt(var_num / (28.0 * (28.0 - 1.0)))) * 1e6 + 0.5) / 1e6 END AS z,
        |  (var_num > 0 AND abs((CAST(yc AS DOUBLE) - CAST(sx AS DOUBLE) / 28.0)
        |      / sqrt(var_num / (28.0 * (28.0 - 1.0)))) > 2.0) AS is_anomaly
        |FROM f WHERE rn >= 28 ORDER BY day""".stripMargin,
    "q_source_vocab_overlap" ->
      """WITH vocab AS (
        |  SELECT DISTINCT source, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents),
        |sizes AS (SELECT source, count(*)::BIGINT AS v FROM vocab GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*)::BIGINT AS n_shared
        |  FROM vocab a JOIN vocab b
        |    ON a.term = b.term AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, sa.v AS va, sb.v AS vb, n_shared,
        |  floor((CAST(n_shared AS DOUBLE)
        |    / CAST(sa.v + sb.v - n_shared AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.source = inter.source_a
        |JOIN sizes sb ON sb.source = inter.source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "q_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w
        |              FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS bigram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 2)),
        |fd AS (SELECT bigram, min(doc_id) AS first_doc FROM grams GROUP BY 1)
        |SELECT g.doc_id, count(*)::BIGINT AS n_distinct_bigrams,
        |  sum(CASE WHEN fd.first_doc = g.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  floor((CAST(sum(CASE WHEN fd.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS novelty
        |FROM grams g JOIN fd USING (bigram)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_curriculum_interleave" ->
      """WITH si AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) AS INTEGER) - 1 AS src_idx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT count(*)::BIGINT AS n FROM si),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INTEGER) AS rn
        |  FROM documents)
        |SELECT doc_id, r.source,
        |  CAST((rn - 1) * n + src_idx AS BIGINT) AS position
        |FROM r JOIN si ON r.source = si.source CROSS JOIN ns
        |ORDER BY position LIMIT 100""".stripMargin,
    "q_decay_engagement" ->
      """WITH ev AS (
        |  SELECT user_id, ts::DATE AS day, value FROM events),
        |a AS (SELECT max(day) AS d1 FROM ev),
        |t AS (
        |  SELECT user_id,
        |    CAST(value AS DECIMAL(28,6))
        |      * (CAST(1 AS BIGINT) << CAST(40 - least(datediff('day', day, d1) // 7, 40) AS INTEGER)) AS term
        |  FROM ev, a)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  floor((CAST(sum(term) AS DOUBLE) / 1099511627776.0) * 1e6 + 0.5) / 1e6 AS score
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ab_srm" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events),
        |arms AS (
        |  SELECT CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |    THEN 'A' ELSE 'B' END AS arm FROM u),
        |s AS (SELECT
        |  sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT AS na,
        |  sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT AS nb FROM arms)
        |SELECT na AS n_a, nb AS n_b,
        |  floor(((CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
        |    * (CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
        |    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS chi2,
        |  ((CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
        |    * (CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
        |    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) > 3.841459) AS srm_detected
        |FROM s""".stripMargin,
    "q_bloom_fpr" -> {
      def pos(h: Int): String =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"[CAST(strpos('0123456789abcdef', substr(sha256(CAST(c_custkey AS VARCHAR)), i, 1)) - 1 AS BIGINT) " +
          s"FOR i IN generate_series(${1 + 8 * h}, ${8 + 8 * h})]), (a, v) -> a * 16 + v) % 1024"
      s"""WITH keys AS (
         |  SELECT c_custkey, ${pos(0)} AS p0, ${pos(1)} AS p1, ${pos(2)} AS p2
         |  FROM customer),
         |members AS (SELECT * FROM keys WHERE c_custkey % 2 = 0),
         |probes AS (SELECT * FROM keys WHERE c_custkey % 2 = 1),
         |bits AS (
         |  SELECT DISTINCT bit FROM (
         |    SELECT unnest([p0, p1, p2]) AS bit FROM members)),
         |fp AS (
         |  SELECT pb.c_custkey FROM (
         |    SELECT c_custkey, unnest([p0, p1, p2]) AS bit FROM probes) pb
         |  JOIN bits USING (bit)
         |  GROUP BY 1 HAVING count(*) = 3),
         |s AS (
         |  SELECT (SELECT count(*)::BIGINT FROM members) AS n_members,
         |    (SELECT count(*)::BIGINT FROM probes) AS n_probes,
         |    (SELECT count(*)::BIGINT FROM bits) AS bits_set,
         |    (SELECT count(*)::BIGINT FROM fp) AS n_false_pos)
         |SELECT n_members, n_probes, bits_set, n_false_pos,
         |  floor((CAST(n_false_pos AS DOUBLE) / CAST(n_probes AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS fpr,
         |  floor(((CAST(bits_set AS DOUBLE) / 1024.0) * (CAST(bits_set AS DOUBLE) / 1024.0)
         |    * (CAST(bits_set AS DOUBLE) / 1024.0)) * 1e6 + 0.5) / 1e6 AS expected_fpr
         |FROM s""".stripMargin
    },
    "q_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |c AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY 1),
        |r AS (SELECT c,
        |  CAST(row_number() OVER (ORDER BY c DESC, term ASC) AS INTEGER) AS rk,
        |  sum(c) OVER (ORDER BY c DESC, term ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c),
        |t AS (SELECT sum(c)::BIGINT AS total, count(*)::BIGINT AS vocab FROM c),
        |ks AS (SELECT CAST(unnest([10, 100, 1000, 10000]) AS BIGINT) AS k,
        |       least(CAST(unnest([10, 100, 1000, 10000]) AS BIGINT), vocab) AS k_eff
        |       FROM t)
        |SELECT k, vocab, total,
        |  floor((CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS coverage
        |FROM r JOIN ks ON CAST(r.rk AS BIGINT) = ks.k_eff CROSS JOIN t
        |ORDER BY k""".stripMargin,
    "q_watermark_reco" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS t_us FROM events),
        |l AS (SELECT event_id,
        |  max(t_us) OVER (ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t_us AS late_us
        |  FROM e),
        |h AS (SELECT late_us, count(*)::BIGINT AS cnt FROM l GROUP BY 1),
        |cm AS (SELECT late_us,
        |  sum(cnt) OVER (ORDER BY late_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER () AS n FROM h)
        |SELECT max(n)::BIGINT AS n_events,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN late_us END) AS p50_us,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.95) AS BIGINT) THEN late_us END) AS p95_us,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.99) AS BIGINT) THEN late_us END) AS p99_us,
        |  max(late_us) AS max_us,
        |  CAST(ceil(CAST(min(CASE WHEN cum >= CAST(ceil(n * 0.99) AS BIGINT)
        |    THEN late_us END) AS DOUBLE) / 60000000.0) AS BIGINT) AS watermark_minutes
        |FROM cm""".stripMargin,
    "q_mode_price" ->
      """WITH c AS (
        |  SELECT p_brand AS brand,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
        |    count(*)::BIGINT AS cnt
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT brand, count(*)::BIGINT AS n_price_points,
        |    max(struct_pack(cnt := cnt, npc := -pc)) AS mx
        |  FROM c GROUP BY 1)
        |SELECT brand, n_price_points, mx.cnt AS mode_count,
        |  floor((CAST(-mx.npc AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS mode_price
        |FROM m ORDER BY brand""".stripMargin,
    "q_two_hop" -> Similarity.twoHopOracleSql(),
    "q_pca_power" -> Similarity.pcaPowerOracleSql(),
    "q_mood_median" ->
      """WITH v AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |h AS (SELECT yc, count(*)::BIGINT AS cnt FROM v GROUP BY 1),
        |cm AS (SELECT yc,
        |  sum(cnt) OVER (ORDER BY yc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER () AS n FROM h),
        |med AS (SELECT min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT)
        |        THEN yc END) AS med FROM cm),
        |s AS (SELECT
        |  sum(CASE WHEN seg = 'BUILDING' AND yc > med THEN 1 ELSE 0 END)::BIGINT AS a,
        |  sum(CASE WHEN seg = 'BUILDING' AND yc <= med THEN 1 ELSE 0 END)::BIGINT AS b,
        |  sum(CASE WHEN seg = 'MACHINERY' AND yc > med THEN 1 ELSE 0 END)::BIGINT AS c,
        |  sum(CASE WHEN seg = 'MACHINERY' AND yc <= med THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM v, med)
        |SELECT a AS n_a_above, b AS n_a_below, c AS n_b_above, d AS n_b_below,
        |  floor(((CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
        |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        |    / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
        |      * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE)) * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)))) * 1e6 + 0.5) / 1e6
        |    AS chi2
        |FROM s""".stripMargin,
    "q_mcnemar" ->
      """WITH u AS (
        |  SELECT user_id, ts::DATE AS day,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT
        |  sum(CASE WHEN clicked = 1 AND purchased = 1 THEN 1 ELSE 0 END)::BIGINT AS n_both,
        |  sum(CASE WHEN clicked = 1 AND purchased = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
        |  sum(CASE WHEN clicked = 0 AND purchased = 1 THEN 1 ELSE 0 END)::BIGINT AS c,
        |  sum(CASE WHEN clicked = 0 AND purchased = 0 THEN 1 ELSE 0 END)::BIGINT AS n_neither
        |  FROM u)
        |SELECT n_both, b AS click_only, c AS purchase_only, n_neither,
        |  floor(((CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
        |      * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
        |    / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS chi2,
        |  ((CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
        |      * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
        |    / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) > 3.841459) AS asymmetric
        |FROM s""".stripMargin,
    "q_acf" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day FROM b),
        |full_s AS (
        |  SELECT spine.day, coalesce(yc, 0) AS yc
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |lags AS (SELECT unnest(generate_series(1, 14)) AS lag),
        |p AS (
        |  SELECT l.lag, prev.yc AS y0, cur.yc AS y1
        |  FROM full_s cur CROSS JOIN lags l
        |  JOIN full_s prev ON prev.day = cur.day - CAST(l.lag AS INTEGER)),
        |s AS (
        |  SELECT lag, count(*)::BIGINT AS n,
        |    sum(y0)::BIGINT AS sx, sum(y1)::BIGINT AS sy,
        |    sum(CAST(y0 AS HUGEINT) * y1) AS sxy,
        |    sum(CAST(y0 AS HUGEINT) * y0) AS sxx,
        |    sum(CAST(y1 AS HUGEINT) * y1) AS syy
        |  FROM p GROUP BY 1),
        |f AS (
        |  SELECT lag, n,
        |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
        |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS d1,
        |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS d2
        |  FROM s)
        |SELECT CAST(lag AS BIGINT) AS lag, n,
        |  CASE WHEN d1 > 0 AND d2 > 0 THEN floor((num / sqrt(d1 * d2)) * 1e6 + 0.5) / 1e6 END AS acf
        |FROM f ORDER BY lag""".stripMargin,
    "q_lead_time" ->
      """WITH fs AS (
        |  SELECT l_orderkey, min(l_shipdate::DATE) AS first_ship
        |  FROM lineitem GROUP BY 1),
        |lead_d AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(datediff('day', o_orderdate::DATE, first_ship) AS BIGINT) AS days
        |  FROM orders JOIN fs ON o_orderkey = l_orderkey),
        |h AS (SELECT priority, days, count(*)::BIGINT AS cnt
        |      FROM lead_d GROUP BY 1, 2),
        |cm AS (SELECT priority, days, cnt,
        |  sum(cnt) OVER (PARTITION BY priority ORDER BY days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY priority) AS n,
        |  days * cnt AS dc
        |  FROM h)
        |SELECT priority, max(n)::BIGINT AS n_orders,
        |  floor((CAST(sum(dc) AS DOUBLE) / CAST(max(n) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mean_days,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN days END) AS p50_days,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.95) AS BIGINT) THEN days END) AS p95_days
        |FROM cm GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_moments" ->
      """WITH s AS (
        |  SELECT o_orderpriority AS priority, count(*)::BIGINT AS n,
        |    sum(CAST(c AS HUGEINT)) AS s1,
        |    sum(CAST(c AS HUGEINT) * c) AS s2,
        |    sum(CAST(c AS HUGEINT) * c * c) AS s3,
        |    sum(CAST(c AS HUGEINT) * c * c * c) AS s4
        |  FROM (SELECT o_orderpriority,
        |          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |        FROM orders)
        |  GROUP BY 1),
        |m AS (SELECT priority, n,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        |  CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
        |  CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
        |  CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4 FROM s),
        |c AS (SELECT priority, n, m1,
        |  e2 - m1 * m1 AS m2,
        |  e3 - 3.0 * m1 * e2 + 2.0 * m1 * m1 * m1 AS m3,
        |  e4 - 4.0 * m1 * e3 + 6.0 * m1 * m1 * e2 - 3.0 * m1 * m1 * m1 * m1 AS m4
        |  FROM m),
        |sh AS (SELECT priority, n, m1, m2,
        |  m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) - 3.0 AS kurt FROM c)
        |SELECT priority, n,
        |  floor(m1 / 100.0 * 1e6 + 0.5) / 1e6 AS mean,
        |  floor(sqrt(m2) / 100.0 * 1e6 + 0.5) / 1e6 AS sd,
        |  floor(skew * 1e6 + 0.5) / 1e6 AS skewness,
        |  floor(kurt * 1e6 + 0.5) / 1e6 AS kurtosis_excess,
        |  floor(CAST(n AS DOUBLE) / 6.0 * (skew * skew + kurt * kurt / 4.0) * 1e6 + 0.5) / 1e6 AS jarque_bera
        |FROM sh ORDER BY priority""".stripMargin,
    "q_kruskal_wallis" ->
      """WITH o AS (SELECT o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc FROM orders),
        |j AS (SELECT yc, c.c_mktsegment AS seg, count(*)::BIGINT AS cnt
        |      FROM o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1, 2),
        |pv0 AS (SELECT yc, sum(cnt)::BIGINT AS tv FROM j GROUP BY 1),
        |pv AS (SELECT yc,
        |  CAST(2 * coalesce(sum(tv) OVER (ORDER BY yc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + tv + 1 AS HUGEINT) AS r2,
        |  CAST(tv AS HUGEINT) * tv * tv - tv AS tie FROM pv0),
        |pg AS (SELECT seg, sum(cnt)::BIGINT AS ng,
        |  sum(CAST(cnt AS HUGEINT) * r2) AS r2sum
        |  FROM j JOIN pv USING (yc) GROUP BY 1),
        |terms AS (SELECT seg, ng,
        |  CAST(r2sum * r2sum AS DOUBLE) / (4.0 * CAST(ng AS DOUBLE)) AS term FROM pg),
        |s AS (SELECT sum(ng)::BIGINT AS n, count(*)::BIGINT AS k,
        |  CAST(CAST(sum(CAST(term AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS terms FROM terms),
        |tt AS (SELECT sum(tie) AS ties FROM pv),
        |f AS (SELECT n, k, terms, ties,
        |  12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * terms
        |    - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
        |  1.0 - CAST(ties AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS corr
        |  FROM s, tt)
        |SELECT n, k AS k_groups,
        |  floor(h * 1e6 + 0.5) / 1e6 AS h,
        |  floor(h / corr * 1e6 + 0.5) / 1e6 AS h_tie_corrected,
        |  (k - 1) AS df
        |FROM f""".stripMargin,
    "q_km_survival" ->
      """WITH o AS (SELECT o_custkey, o_orderdate::DATE AS d FROM orders),
        |hz AS (SELECT max(d) AS hz FROM o),
        |nx AS (SELECT o_custkey, d,
        |  lead(d) OVER (PARTITION BY o_custkey ORDER BY d) AS nextd FROM o),
        |obs AS (SELECT
        |  CAST(CASE WHEN nextd IS NOT NULL THEN datediff('day', d, nextd)
        |            ELSE datediff('day', d, hz) END AS BIGINT) AS day,
        |  (nextd IS NOT NULL) AS observed
        |  FROM nx CROSS JOIN hz),
        |hist AS (SELECT day,
        |  sum(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT AS d_events,
        |  sum(CASE WHEN observed THEN 0 ELSE 1 END)::BIGINT AS c_censored
        |  FROM obs GROUP BY 1),
        |tot AS (SELECT sum(d_events + c_censored)::BIGINT AS n_total FROM hist),
        |rk AS (SELECT day, d_events, c_censored,
        |  CAST(n_total - coalesce(sum(d_events + c_censored) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM hist CROSS JOIN tot),
        |lt AS (SELECT day, d_events, c_censored, n_risk,
        |  CASE WHEN d_events > 0 AND n_risk > d_events
        |       THEN ln(CAST(n_risk - d_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |       ELSE 0.0 END AS lnterm,
        |  CASE WHEN d_events > 0 AND n_risk = d_events THEN 1 ELSE 0 END AS died_out
        |  FROM rk),
        |sv AS (SELECT day, n_risk, d_events, c_censored,
        |  CASE WHEN max(died_out) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 THEN 0.0
        |  ELSE exp(CAST(CAST(sum(CAST(lnterm AS DECIMAL(38,12))) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)) END AS survival
        |  FROM lt)
        |SELECT day AS gap_days, n_risk, d_events, c_censored,
        |  floor(survival * 1e6 + 0.5) / 1e6 AS survival
        |FROM sv WHERE d_events > 0 ORDER BY gap_days""".stripMargin,
    "q_suffix_dup" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |s AS (SELECT doc_id,
        |  array_to_string(w[greatest(len(w) - 2, 1):len(w)], ' ') AS suffix FROM t)
        |SELECT suffix, min(doc_id) AS keep_id, count(*)::BIGINT AS n_docs
        |FROM s GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY n_docs DESC, suffix""".stripMargin,
    "q_surprisal_outliers" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(2, len(w)),
        |    i -> struct_pack(a := w[i-1], b := w[i]))) AS p
        |  FROM d WHERE len(w) >= 2),
        |bgf AS (SELECT doc_id, p.a AS a, p.b AS b FROM bg),
        |cab AS (SELECT a, b, count(*) AS c_ab FROM bgf GROUP BY 1, 2),
        |ca AS (SELECT a, count(*) AS c_a FROM bgf GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM (
        |  SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents) t),
        |sc AS (SELECT doc_id,
        |  floor((CAST(CAST(sum(CAST(-ln((c_ab + 1.0) / (c_a + v)) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
        |    / count(*)) * 1e6 + 0.5) / 1e6 AS avg_surprisal
        |  FROM bgf JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN vv
        |  GROUP BY doc_id),
        |st AS (SELECT count(*)::BIGINT AS n,
        |  CAST(CAST(sum(CAST(avg_surprisal AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(sum(CAST(avg_surprisal * avg_surprisal AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sxx
        |  FROM sc),
        |zz AS (SELECT doc_id, avg_surprisal,
        |  (avg_surprisal - sx / CAST(n AS DOUBLE)) /
        |    sqrt(sxx / CAST(n AS DOUBLE)
        |      - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))) AS zv
        |  FROM sc CROSS JOIN st)
        |SELECT doc_id, avg_surprisal,
        |  floor(zv * 1e6 + 0.5) / 1e6 AS z,
        |  CASE WHEN zv > 2.0 THEN 'high' WHEN zv < -2.0 THEN 'low'
        |       ELSE 'ok' END AS flag
        |FROM zz ORDER BY doc_id""".stripMargin,
    "q_lang_mix" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |h AS (SELECT doc_id,
        |  toks[1:len(toks)//2] AS f, toks[len(toks)//2+1:len(toks)] AS s
        |  FROM d WHERE len(toks) >= 4),
        |c AS (SELECT doc_id,
        |  len(list_filter(f, t -> t IN ('the','a','of','and','is')))::INTEGER AS f_en,
        |  len(list_filter(f, t -> t IN ('der','die','das','und','ist')))::INTEGER AS f_de,
        |  len(list_filter(f, t -> t IN ('el','la','los','de','es')))::INTEGER AS f_es,
        |  len(list_filter(s, t -> t IN ('the','a','of','and','is')))::INTEGER AS s_en,
        |  len(list_filter(s, t -> t IN ('der','die','das','und','ist')))::INTEGER AS s_de,
        |  len(list_filter(s, t -> t IN ('el','la','los','de','es')))::INTEGER AS s_es
        |  FROM h),
        |det AS (SELECT doc_id,
        |  CASE WHEN f_en = 0 AND f_de = 0 AND f_es = 0 THEN 'unknown'
        |       WHEN f_en >= f_de AND f_en >= f_es THEN 'en'
        |       WHEN f_de >= f_es THEN 'de' ELSE 'es' END AS lang_first,
        |  CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 THEN 'unknown'
        |       WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |       WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS lang_second
        |  FROM c)
        |SELECT lang_first, lang_second, count(*)::BIGINT AS n_docs,
        |  (lang_first <> lang_second AND lang_first <> 'unknown'
        |   AND lang_second <> 'unknown') AS mixed
        |FROM det GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_anova" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |pg AS (SELECT seg, count(*)::BIGINT AS ng, sum(yc)::BIGINT AS sg,
        |  sum(CAST(yc AS HUGEINT) * yc) AS qg FROM j GROUP BY 1),
        |tm AS (SELECT ng, sg, qg,
        |  (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / CAST(ng AS DOUBLE) AS term
        |  FROM pg),
        |s AS (SELECT sum(ng)::BIGINT AS n, count(*)::BIGINT AS k,
        |  sum(sg)::BIGINT AS s, sum(qg) AS q,
        |  CAST(CAST(sum(CAST(term AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS terms FROM tm),
        |f AS (SELECT n, k,
        |  terms - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE) AS ssb,
        |  CAST(q AS DOUBLE) - terms AS ssw FROM s)
        |SELECT n, k AS k_groups, (k - 1) AS df_between, (n - k) AS df_within,
        |  floor((ssb / CAST(k - 1 AS DOUBLE))
        |    / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    AS f_stat,
        |  floor(ssb / (ssb + ssw) * 1e6 + 0.5) / 1e6 AS eta_sq
        |FROM f""".stripMargin,
    "q_icc" ->
      """WITH c AS (
        |  SELECT c_nationkey AS grp,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS yc
        |  FROM customer),
        |pg AS (SELECT grp, count(*)::BIGINT AS ng, sum(yc)::BIGINT AS sg,
        |  sum(CAST(yc AS HUGEINT) * yc) AS qg FROM c GROUP BY 1),
        |tm AS (SELECT ng, sg, qg,
        |  (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / CAST(ng AS DOUBLE) AS term
        |  FROM pg),
        |s AS (SELECT sum(ng)::BIGINT AS n, count(*)::BIGINT AS k,
        |  sum(sg)::BIGINT AS s, sum(qg) AS q, sum(ng * ng)::BIGINT AS sn2,
        |  CAST(CAST(sum(CAST(term AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS terms FROM tm),
        |f AS (SELECT n, k,
        |  (terms - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE))
        |    / (CAST(k AS DOUBLE) - 1.0) AS msb,
        |  (CAST(q AS DOUBLE) - terms) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
        |  (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(k AS DOUBLE) - 1.0) AS k0
        |  FROM s)
        |SELECT n, k AS k_groups,
        |  floor(k0 * 1e6 + 0.5) / 1e6 AS k0,
        |  floor((msb - msw) / (msb + (k0 - 1.0) * msw) * 1e6 + 0.5) / 1e6 AS icc
        |FROM f""".stripMargin,
    "q_conformal" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc,
        |    substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 1) AS h
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |tr AS (SELECT seg, count(*)::BIGINT AS ng, sum(yc)::BIGINT AS sg
        |       FROM j WHERE h <= '7' GROUP BY 1),
        |cal AS (SELECT j.seg, abs(yc * ng - sg) AS r2
        |        FROM j JOIN tr USING (seg) WHERE h > '7' AND h <= 'b'),
        |hist AS (SELECT seg, r2, count(*)::BIGINT AS cnt FROM cal GROUP BY 1, 2),
        |w AS (SELECT seg, r2,
        |  sum(cnt) OVER (PARTITION BY seg ORDER BY r2
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY seg) AS ncal FROM hist),
        |q AS (SELECT seg, max(ncal)::BIGINT AS n_cal,
        |  min(CASE WHEN cum >= ((ncal + 1) * 9 + 9) // 10 THEN r2 END) AS qhat
        |  FROM w GROUP BY 1),
        |tst AS (SELECT j.seg, abs(yc * ng - sg) AS r2
        |        FROM j JOIN tr USING (seg) WHERE h > 'b'),
        |cov AS (SELECT tst.seg, count(*)::BIGINT AS n_test,
        |  sum(CASE WHEN tst.r2 <= q.qhat THEN 1 ELSE 0 END)::BIGINT AS covered
        |  FROM tst JOIN q USING (seg) GROUP BY 1)
        |SELECT q.seg, tr.ng AS n_train, q.n_cal, cov.n_test,
        |  floor(CAST(qhat AS DOUBLE) / (CAST(ng AS DOUBLE) * 100.0) * 1e6 + 0.5) / 1e6
        |    AS qhat_dollars,
        |  floor(CAST(covered AS DOUBLE) / CAST(n_test AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS coverage,
        |  0.9 AS target
        |FROM q JOIN tr USING (seg) JOIN cov USING (seg) ORDER BY seg""".stripMargin,
    "q_levene" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |hist AS (SELECT seg, yc, count(*)::BIGINT AS cnt FROM j GROUP BY 1, 2),
        |cum AS (SELECT seg, yc,
        |  sum(cnt) OVER (PARTITION BY seg ORDER BY yc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY seg) AS n FROM hist),
        |med AS (SELECT seg,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN yc END) AS med
        |  FROM cum GROUP BY 1),
        |z AS (SELECT j.seg AS seg, abs(yc - med) AS yc
        |  FROM j JOIN med ON j.seg = med.seg),
        |pg AS (SELECT seg, count(*)::BIGINT AS ng, sum(yc)::BIGINT AS sg,
        |  sum(CAST(yc AS HUGEINT) * yc) AS qg FROM z GROUP BY 1),
        |tm AS (SELECT ng, sg, qg,
        |  (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / CAST(ng AS DOUBLE) AS term
        |  FROM pg),
        |s AS (SELECT sum(ng)::BIGINT AS n, count(*)::BIGINT AS k,
        |  sum(sg)::BIGINT AS s, sum(qg) AS q,
        |  CAST(CAST(sum(CAST(term AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS terms FROM tm),
        |f AS (SELECT n, k,
        |  terms - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE) AS ssb,
        |  CAST(q AS DOUBLE) - terms AS ssw FROM s)
        |SELECT n, k AS k_groups, (k - 1) AS df_between, (n - k) AS df_within,
        |  floor((ssb / CAST(k - 1 AS DOUBLE))
        |    / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    AS w_stat,
        |  floor(ssb / (ssb + ssw) * 1e6 + 0.5) / 1e6 AS eta_sq
        |FROM f""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS d,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS tn, sum(yc)::BIGINT AS ts,
        |  sum(CAST(yc AS HUGEINT) * yc) AS tq FROM daily),
        |pre AS (SELECT d, row_number() OVER (ORDER BY d) AS i,
        |  sum(yc) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
        |  sum(CAST(yc AS HUGEINT) * yc) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq
        |  FROM daily),
        |sc AS (SELECT d, i, tn, ts, tq,
        |  (CAST(cq AS DOUBLE)
        |     - (CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)) / CAST(i AS DOUBLE))
        |  + (CAST(tq - cq AS DOUBLE)
        |     - (CAST(ts - cs AS DOUBLE) * CAST(ts - cs AS DOUBLE))
        |       / CAST(tn - i AS DOUBLE)) AS sse,
        |  CAST(cs AS DOUBLE) / CAST(i AS DOUBLE) / 100.0 AS ml,
        |  CAST(ts - cs AS DOUBLE) / CAST(tn - i AS DOUBLE) / 100.0 AS mr
        |  FROM pre CROSS JOIN tot WHERE i < tn),
        |best AS (SELECT * FROM (
        |  SELECT sc.*, row_number() OVER (ORDER BY sse ASC, i ASC) AS rn FROM sc) t
        |  WHERE rn = 1)
        |SELECT strftime(d, '%Y-%m-%d') AS split_day, tn AS n_days,
        |  floor(ml * 1e6 + 0.5) / 1e6 AS mean_before,
        |  floor(mr * 1e6 + 0.5) / 1e6 AS mean_after,
        |  floor((1.0 - sse / (CAST(tq AS DOUBLE)
        |    - (CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)) / CAST(tn AS DOUBLE)))
        |    * 1e6 + 0.5) / 1e6 AS sse_reduction
        |FROM best""".stripMargin,
    "q_dedup_yield" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |  FROM toks WHERE len(w) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
        |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), jp AS (
        |  SELECT doc_a, doc_b, inter::DOUBLE / (sa.n + sb.n - inter) AS j
        |  FROM pairs
        |  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.6
        |), th AS (SELECT unnest([0.6::DOUBLE, 0.65::DOUBLE, 0.7::DOUBLE,
        |  0.75::DOUBLE, 0.8::DOUBLE, 0.85::DOUBLE, 0.9::DOUBLE]) AS threshold)
        |SELECT threshold, count(*)::BIGINT AS n_pairs,
        |  count(DISTINCT doc_b)::BIGINT AS n_docs_removed
        |FROM jp CROSS JOIN th WHERE j >= threshold
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_silhouette" -> Similarity.silhouetteOracleSql(),
    "q_semdedup" -> Similarity.semDedupOracleSql(),
    "q_dsir_weights" -> TextAnalysis.dsirWeightsOracleSql(),
    "q_source_cluster_mix" -> Similarity.sourceClusterMixOracleSql(),
    "q_source_kl" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, count(*)::BIGINT AS cs FROM tok GROUP BY 1, 2),
        |ct AS (SELECT tok, sum(cs)::BIGINT AS cc FROM st GROUP BY 1),
        |ns AS (SELECT source, sum(cs)::BIGINT AS n_s FROM st GROUP BY 1),
        |nc AS (SELECT sum(cs)::BIGINT AS n_c FROM st),
        |terms AS (SELECT source, n_s,
        |  (CAST(cs AS DOUBLE) / CAST(n_s AS DOUBLE))
        |    * ln((CAST(cs AS DOUBLE) / CAST(n_s AS DOUBLE))
        |      / (CAST(cc AS DOUBLE) / CAST(n_c AS DOUBLE))) AS term
        |  FROM st JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN nc)
        |SELECT source, max(n_s) AS n_tokens, count(*)::BIGINT AS vocab,
        |  floor(CAST(CAST(sum(CAST(term AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS kl
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_burrows_delta" ->
      """WITH words AS (SELECT unnest(['the','a','of','and','is',
        |    'der','die','das','und','ist','el','la','los','de','es']) AS w),
        |tok AS (
        |  SELECT source, unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |ns AS (SELECT source, count(*)::BIGINT AS n_s FROM tok GROUP BY 1),
        |cnt AS (SELECT source, tok AS w, count(*)::BIGINT AS c FROM tok
        |  WHERE tok IN ('the','a','of','and','is','der','die','das','und',
        |    'ist','el','la','los','de','es')
        |  GROUP BY 1, 2),
        |grid AS (SELECT ns.source, words.w,
        |  1000.0 * CAST(coalesce(cnt.c, 0) AS DOUBLE) / CAST(ns.n_s AS DOUBLE) AS f
        |  FROM ns CROSS JOIN words
        |  LEFT JOIN cnt ON cnt.source = ns.source AND cnt.w = words.w),
        |stats AS (SELECT w,
        |  CAST(CAST(sum(CAST(f AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
        |  sqrt(CAST(CAST(sum(CAST(f * f AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    - (CAST(CAST(sum(CAST(f AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |      * (CAST(CAST(sum(CAST(f AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE)))
        |    AS sd
        |  FROM grid GROUP BY 1),
        |z AS (SELECT g.source, g.w, (g.f - s.mu) / s.sd AS z
        |  FROM grid g JOIN stats s ON g.w = s.w AND s.sd > 0)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  count(*)::BIGINT AS n_words,
        |  floor(CAST(CAST(sum(CAST(abs(a.z - b.z) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS delta
        |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_dim_variance" -> Similarity.dimVarianceOracleSql(),
    "q_winnow_dup" ->
      """WITH d0 AS (SELECT doc_id, trim(text) AS tt FROM documents),
        |rep AS (SELECT min(doc_id) AS rid FROM d0 GROUP BY sha256(tt)),
        |d AS (SELECT doc_id, list_filter(string_split(tt, ' '), t -> t <> '') AS w
        |      FROM d0 JOIN rep ON doc_id = rid
        |      WHERE len(list_filter(string_split(tt, ' '), t -> t <> '')) >= 7),
        |th AS (SELECT doc_id,
        |  list_transform(w, t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(ascii(substr(t, i, 1)) AS BIGINT)
        |     FOR i IN generate_series(1, length(t))]),
        |    (acc, c) -> (acc * 31 + c) % 1000000007)) AS th FROM d),
        |kh AS (SELECT doc_id,
        |  [(((((th[i] * 1000003 + th[i+1]) % 1000000007) * 1000003 + th[i+2])
        |      % 1000000007) * 1000003 + th[i+3]) % 1000000007
        |   FOR i IN generate_series(1, len(th) - 3)] AS kh FROM th),
        |fp AS (SELECT DISTINCT doc_id, fp FROM (
        |  SELECT doc_id, unnest([list_min(kh[i:i+3])
        |    FOR i IN generate_series(1, len(kh) - 3)]) AS fp FROM kh) t)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY n_shared DESC, doc_a, doc_b""".stripMargin,
    "q_edit_dup" ->
      """WITH d0 AS (SELECT doc_id, trim(text) AS tt FROM documents),
        |rep AS (SELECT min(doc_id) AS rid FROM d0 GROUP BY sha256(tt)),
        |r AS (SELECT doc_id,
        |  array_to_string(string_split(tt, ' ')[1:8], ' ') AS pkey,
        |  substr(tt, 1, 200) AS head
        |  FROM d0 JOIN rep ON doc_id = rid),
        |sizes AS (SELECT pkey, count(*)::BIGINT AS bn FROM r GROUP BY 1),
        |sk AS (SELECT count(*)::BIGINT AS skipped_blocks,
        |  coalesce(sum(bn), 0)::BIGINT AS skipped_docs
        |  FROM sizes WHERE bn > 64),
        |keep AS (SELECT r.* FROM r JOIN sizes USING (pkey) WHERE bn <= 64)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.head, b.head)::BIGINT AS edit_dist,
        |  skipped_blocks, skipped_docs
        |FROM keep a JOIN keep b ON a.pkey = b.pkey AND a.doc_id < b.doc_id
        |CROSS JOIN sk
        |WHERE levenshtein(a.head, b.head) <= 30
        |ORDER BY 1, 2""".stripMargin,
    "q_tukey" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |pg AS (SELECT seg, count(*)::BIGINT AS ng, sum(yc)::BIGINT AS sg,
        |  sum(CAST(yc AS HUGEINT) * yc) AS qg FROM j GROUP BY 1),
        |msw AS (SELECT CAST(CAST(sum(CAST(
        |    CAST(qg AS DOUBLE) - (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |      / CAST(ng AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
        |  / CAST(sum(ng) - count(*) AS DOUBLE) AS msw FROM pg),
        |m AS (SELECT seg, ng,
        |  CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS mm FROM pg)
        |SELECT a.seg AS seg_a, b.seg AS seg_b,
        |  floor(abs(a.mm - b.mm) / 100.0 * 1e6 + 0.5) / 1e6 AS mean_diff,
        |  floor(abs(a.mm - b.mm)
        |    / sqrt(msw / 2.0 * (1.0 / CAST(a.ng AS DOUBLE)
        |        + 1.0 / CAST(b.ng AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS q_stat
        |FROM m a JOIN m b ON a.seg < b.seg CROSS JOIN msw
        |ORDER BY 1, 2""".stripMargin,
    "q_knn_classify" -> Similarity.knnClassifyOracleSql(),
    "q_lof" -> Similarity.lofOracleSql(),
    "q_knn_components" -> Similarity.knnComponentsOracleSql(),
    "q_bfs_reach" -> Similarity.bfsReachOracleSql(),
    "q_cosine_dup" ->
      """WITH m AS (SELECT doc_id, sha256(trim(text)) AS ckey FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    min(doc_id) OVER (PARTITION BY ckey) AS rep_id,
        |    count(*) OVER (PARTITION BY ckey) AS copies
        |  FROM m),
        |reps AS (SELECT doc_id, copies FROM g WHERE doc_id = rep_id),
        |nd AS (SELECT count(*)::BIGINT AS n FROM documents),
        |tf AS (
        |  SELECT d.doc_id, t.term, count(*)::BIGINT AS tf
        |  FROM documents d JOIN reps ON d.doc_id = reps.doc_id,
        |    unnest(string_split(trim(d.text), ' ')) AS t(term)
        |  GROUP BY 1, 2),
        |kept AS (
        |  SELECT term,
        |    ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS idf
        |  FROM (SELECT term, sum(copies)::BIGINT AS df
        |        FROM tf JOIN reps ON tf.doc_id = reps.doc_id GROUP BY 1)
        |    CROSS JOIN nd
        |  WHERE df <= 100),
        |wt AS (
        |  SELECT tf.doc_id, tf.term, CAST(tf AS DOUBLE) * idf AS wt
        |  FROM tf JOIN kept ON tf.term = kept.term),
        |norms AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_terms,
        |    sqrt(CAST(CAST(sum(CAST(wt * wt AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)) AS nrm
        |  FROM wt GROUP BY 1),
        |rp AS (
        |  SELECT a.doc_id AS ra, b.doc_id AS rb,
        |    count(*)::BIGINT AS shared_terms,
        |    CAST(CAST(sum(CAST(a.wt * b.wt AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS dot
        |  FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT ra, rb, shared_terms, dot / (na.nrm * nb.nrm) AS craw
        |  FROM rp
        |  JOIN norms na ON na.doc_id = rp.ra
        |  JOIN norms nb ON nb.doc_id = rp.rb
        |  WHERE dot / (na.nrm * nb.nrm) >= 0.6),
        |crossp AS (
        |  SELECT least(ga.doc_id, gb.doc_id) AS doc_a,
        |    greatest(ga.doc_id, gb.doc_id) AS doc_b,
        |    shared_terms,
        |    floor(craw * 1e6 + 0.5) / 1e6 AS cos
        |  FROM sc
        |  JOIN g ga ON ga.rep_id = sc.ra
        |  JOIN g gb ON gb.rep_id = sc.rb),
        |within AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    norms.n_terms AS shared_terms, 1.0 AS cos
        |  FROM g x JOIN g y ON x.rep_id = y.rep_id AND x.doc_id < y.doc_id
        |  JOIN norms ON norms.doc_id = x.rep_id)
        |SELECT * FROM (SELECT * FROM crossp UNION ALL SELECT * FROM within)
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_recall" -> Dedup.dedupRecallOracleSql(),
    "q_dedup_recall_sampled" -> Dedup.dedupRecallOracleSql(sampleCutHex = "3"),
    "q_lsh_curve" -> Dedup.lshCurveOracleSql(),
    "q_lsh_curve_sampled" -> Dedup.lshCurveOracleSql(sampleCutHex = "3"),
    "q_kcenter" -> Similarity.kcenterOracleSql(),
    "q_mmr" -> Similarity.mmrOracleSql(),
    "q_shingle_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |  FROM toks WHERE len(w) >= 3
        |), shl AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
        |), dfq AS (SELECT g, count(*) AS df FROM shl GROUP BY 1),
        |pd AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_sh,
        |    sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_uniq
        |  FROM shl JOIN dfq USING (g) GROUP BY 1),
        |j AS (
        |  SELECT d.source, pd.n_sh, pd.n_uniq
        |  FROM documents d LEFT JOIN pd USING (doc_id))
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN n_sh IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_docs_short,
        |  coalesce(sum(n_sh), 0)::BIGINT AS n_shingles,
        |  coalesce(sum(n_uniq), 0)::BIGINT AS n_unique,
        |  floor(CAST(coalesce(sum(n_uniq), 0) AS DOUBLE)
        |    / CAST(coalesce(sum(n_sh), 0) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS pooled_novelty,
        |  floor(CAST(CAST(sum(CAST(CAST(n_uniq AS DOUBLE) / n_sh AS DECIMAL(38,18)))
        | AS VARCHAR) AS DOUBLE) / CAST(count(n_sh) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS mean_novelty
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_participation_ratio" -> Similarity.participationRatioOracleSql(),
    "q_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day FROM b),
        |full_s AS (
        |  SELECT spine.day, coalesce(yc, 0) AS yc
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |ma AS (
        |  SELECT day, yc,
        |    count(*) OVER w AS wn,
        |    CAST(sum(yc) OVER w AS DOUBLE) / 7.0 AS trend
        |  FROM full_s
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |i AS (
        |  SELECT day, yc, trend, CAST(yc AS DOUBLE) - trend AS detr,
        |    CAST((day - DATE '1970-01-01') % 7 AS INTEGER) AS dow
        |  FROM ma WHERE wn = 7),
        |se AS (
        |  SELECT dow, CAST(CAST(sum(CAST(detr AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS s
        |  FROM i GROUP BY 1),
        |j AS (SELECT i.yc, i.trend, se.s, i.detr - se.s AS resid
        |      FROM i JOIN se ON i.dow = se.dow),
        |m AS (
        |  SELECT count(*)::BIGINT AS n_days,
        |    CAST(CAST(sum(CAST(CAST(yc AS DOUBLE) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m_y,
        |    CAST(CAST(sum(CAST(CAST(yc AS DOUBLE) * CAST(yc AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS q_y,
        |    CAST(CAST(sum(CAST(trend AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m_t,
        |    CAST(CAST(sum(CAST(trend * trend AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS q_t,
        |    CAST(CAST(sum(CAST(s AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m_s,
        |    CAST(CAST(sum(CAST(s * s AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS q_s,
        |    CAST(CAST(sum(CAST(resid AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m_e,
        |    CAST(CAST(sum(CAST(resid * resid AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS q_e
        |  FROM j)
        |SELECT n_days,
        |  CASE WHEN (q_y - m_y * m_y) / 1e4 < 9e12
        |    THEN floor((q_y - m_y * m_y) / 1e4 * 1e6 + 0.5) / 1e6
        |    ELSE (q_y - m_y * m_y) / 1e4 END AS var_total,
        |  floor((q_t - m_t * m_t) / (q_y - m_y * m_y) * 1e6 + 0.5) / 1e6 AS share_trend,
        |  floor((q_s - m_s * m_s) / (q_y - m_y * m_y) * 1e6 + 0.5) / 1e6 AS share_seasonal,
        |  floor((q_e - m_e * m_e) / (q_y - m_y * m_y) * 1e6 + 0.5) / 1e6 AS share_residual,
        |  floor((1.0 - (q_e - m_e * m_e) / (q_y - m_y * m_y)) * 1e6 + 0.5) / 1e6 AS r2
        |FROM m""".stripMargin,
    "q_price_index" ->
      """WITH mp AS (
        |  SELECT strftime(l_shipdate::DATE, '%Y-%m') AS month, l_partkey AS part,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS qty_c,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS rev_c
        |  FROM lineitem GROUP BY 1, 2),
        |mpu AS (SELECT month, part, qty_c,
        |  CAST(rev_c AS DOUBLE) / CAST(qty_c AS DOUBLE) AS u FROM mp),
        |b AS (SELECT min(month) AS m0 FROM mpu),
        |bp AS (SELECT part, u AS u0, qty_c AS q0
        |       FROM mpu CROSS JOIN b WHERE month = m0),
        |cur AS (SELECT month, part, u, qty_c
        |        FROM mpu CROSS JOIN b WHERE month <> m0),
        |s AS (
        |  SELECT month, count(*)::BIGINT AS n_parts,
        |    CAST(CAST(sum(CAST(u * CAST(q0 AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS l_num,
        |    CAST(CAST(sum(CAST(u0 * CAST(q0 AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS l_den,
        |    CAST(CAST(sum(CAST(u * CAST(qty_c AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS p_num,
        |    CAST(CAST(sum(CAST(u0 * CAST(qty_c AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS p_den
        |  FROM cur JOIN bp USING (part) GROUP BY 1)
        |SELECT month, n_parts,
        |  floor(l_num / l_den * 1e6 + 0.5) / 1e6 AS laspeyres,
        |  floor(p_num / p_den * 1e6 + 0.5) / 1e6 AS paasche,
        |  floor(sqrt((l_num / l_den) * (p_num / p_den)) * 1e6 + 0.5) / 1e6 AS fisher
        |FROM s ORDER BY month""".stripMargin,
    "q_backtest_naive" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day, mx FROM b),
        |full_s AS (
        |  SELECT spine.day, spine.mx, coalesce(yc, 0) AS yc
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |lagged AS (
        |  SELECT day, mx, yc,
        |    lag(yc, 1) OVER (ORDER BY day) AS p1,
        |    lag(yc, 7) OVER (ORDER BY day) AS p7
        |  FROM full_s),
        |test AS (SELECT * FROM lagged WHERE day > mx - 28),
        |u AS (
        |  SELECT 'naive_1' AS method, yc, abs(yc - p1) AS e FROM test
        |  WHERE p1 IS NOT NULL
        |  UNION ALL
        |  SELECT 'seasonal_7', yc, abs(yc - p7) FROM test WHERE p7 IS NOT NULL),
        |s AS (
        |  SELECT method, count(*)::BIGINT AS n_days,
        |    sum(e)::BIGINT AS sae,
        |    sum(CAST(e AS HUGEINT) * e) AS sse,
        |    CAST(CAST(sum(CASE WHEN yc > 0 THEN CAST(CAST(e AS DOUBLE)
        |      / CAST(yc AS DOUBLE) AS DECIMAL(38,18)) END) AS VARCHAR) AS DOUBLE) AS sape,
        |    sum(CASE WHEN yc > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pos
        |  FROM u GROUP BY 1)
        |SELECT method, n_days,
        |  floor(CAST(sae AS DOUBLE) / CAST(n_days AS DOUBLE) / 100.0
        |    * 1e6 + 0.5) / 1e6 AS mae,
        |  floor(sqrt(CAST(sse AS DOUBLE) / CAST(n_days AS DOUBLE)) / 100.0
        |    * 1e6 + 0.5) / 1e6 AS rmse,
        |  floor(CASE WHEN n_pos > 0 THEN sape / CAST(n_pos AS DOUBLE) END
        |    * 1e6 + 0.5) / 1e6 AS mape
        |FROM s ORDER BY method""".stripMargin,
    "copy_expire" ->
      """SELECT * FROM (
        |  SELECT CAST(2 AS BIGINT) AS version, count(*)::BIGINT AS n_rows,
        |    CAST(CAST(sum(CAST(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 10.0
        |      ELSE c_acctbal END AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_acctbal,
        |    CAST(1 AS BIGINT) AS n_expired
        |  FROM customer
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), count(*)::BIGINT,
        |    CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE),
        |    CAST(1 AS BIGINT)
        |  FROM customer)
        |ORDER BY version""".stripMargin,
    "q_item_cf" ->
      """WITH up0 AS (
        |  SELECT DISTINCT o_custkey AS cust, l_partkey AS part
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |upr AS (SELECT cust, part,
        |  row_number() OVER (PARTITION BY cust ORDER BY part) AS prank
        |  FROM up0),
        |tr AS (SELECT count(DISTINCT cust)::BIGINT AS n_truncated_custs
        |  FROM upr WHERE prank > 1000),
        |up AS (SELECT cust, part FROM upr WHERE prank <= 1000),
        |freq AS (SELECT part, count(*)::BIGINT AS n_users FROM up GROUP BY 1),
        |pairs AS (
        |  SELECT a.part AS part_a, b.part AS part_b, count(*)::BIGINT AS co_users
        |  FROM up a JOIN up b ON a.cust = b.cust AND a.part < b.part
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT part_a, part_b, co_users,
        |  fa.n_users AS users_a, fb.n_users AS users_b,
        |  floor(CAST(co_users AS DOUBLE)
        |    / sqrt(CAST(fa.n_users * fb.n_users AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |    AS cos, n_truncated_custs
        |FROM pairs
        |JOIN freq fa ON fa.part = pairs.part_a
        |JOIN freq fb ON fb.part = pairs.part_b
        |CROSS JOIN tr
        |ORDER BY co_users DESC, part_a, part_b LIMIT 50""".stripMargin,
    "q_stratified_effect" ->
      """WITH ev AS (SELECT user_id, value, ts::DATE AS day FROM events),
        |bnd AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
        |bd AS (SELECT mn + CAST(floor(datediff('day', mn, mx) / 2) AS INTEGER)
        |  AS bound FROM bnd),
        |u AS (
        |  SELECT user_id,
        |    sum(CASE WHEN day < bound THEN 1 ELSE 0 END)::BIGINT AS n_pre,
        |    sum(CASE WHEN day >= bound THEN CAST(value AS DECIMAL(28,6)) END) AS y
        |  FROM ev CROSS JOIN bd GROUP BY 1),
        |ub AS (SELECT * FROM u WHERE n_pre > 0 AND y IS NOT NULL),
        |h AS (SELECT n_pre, count(*)::BIGINT AS cnt FROM ub GROUP BY 1),
        |hc AS (SELECT n_pre,
        |  sum(cnt) OVER (ORDER BY n_pre ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(cnt) OVER () AS n FROM h),
        |md AS (SELECT min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT)
        |  THEN n_pre END) AS med FROM hc),
        |k AS (
        |  SELECT
        |    CASE WHEN n_pre < med THEN '1_below_median'
        |      ELSE '2_at_above_median' END AS stratum,
        |    CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |      THEN 'A' ELSE 'B' END AS arm, y
        |  FROM ub CROSS JOIN md),
        |s AS (
        |  SELECT stratum,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 'A' THEN y END) AS DOUBLE) AS sa,
        |    CAST(sum(CASE WHEN arm = 'B' THEN y END) AS DOUBLE) AS sb
        |  FROM k GROUP BY 1),
        |per AS (
        |  SELECT stratum, n_a, n_b,
        |    floor((sb / CAST(n_b AS DOUBLE) - sa / CAST(n_a AS DOUBLE))
        |      * 1e6 + 0.5) / 1e6 AS effect
        |  FROM s),
        |pool AS (
        |  SELECT 'ALL' AS stratum,
        |    CAST(sum(n_a) AS BIGINT) AS n_a, CAST(sum(n_b) AS BIGINT) AS n_b,
        |    floor(CAST(CAST(sum(CAST(CAST(n_a + n_b AS DOUBLE)
        |        * (sb / CAST(n_b AS DOUBLE) - sa / CAST(n_a AS DOUBLE))
        |        AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
        |      / CAST(sum(n_a) + sum(n_b) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |      AS effect
        |  FROM s)
        |SELECT * FROM (SELECT * FROM per UNION ALL SELECT * FROM pool)
        |ORDER BY stratum""".stripMargin,
    "copy_publish_set" ->
      """SELECT * FROM (
        |  SELECT 'nation' AS table_name, CAST(2 AS BIGINT) AS version,
        |    count(*)::BIGINT AS n_rows FROM nation
        |  UNION ALL
        |  SELECT 'supplier', CAST(2 AS BIGINT), count(*)::BIGINT
        |  FROM supplier)
        |ORDER BY table_name""".stripMargin,
    "q_mann_kendall" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT sum(CASE WHEN b.yc > a.yc THEN 1
        |    WHEN b.yc < a.yc THEN -1 ELSE 0 END)::BIGINT AS s_stat
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |t AS (
        |  SELECT coalesce(sum(tk * (tk - 1) * (2 * tk + 5)), 0)::BIGINT
        |    AS tie_term
        |  FROM (SELECT count(*)::BIGINT AS tk FROM daily GROUP BY yc)),
        |n AS (SELECT count(*)::BIGINT AS n_days FROM daily),
        |m AS (
        |  SELECT n_days, s_stat,
        |    CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
        |      AS DOUBLE) / 18.0 AS var_s
        |  FROM n CROSS JOIN s CROSS JOIN t),
        |zc AS (
        |  SELECT n_days, s_stat, var_s,
        |    CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
        |      WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
        |      ELSE 0.0 END AS z
        |  FROM m)
        |SELECT n_days, s_stat,
        |  floor(var_s * 1e6 + 0.5) / 1e6 AS var_s,
        |  floor(z * 1e6 + 0.5) / 1e6 AS z_stat,
        |  CASE WHEN z > 1.959964 THEN 'increasing'
        |    WHEN z < -1.959964 THEN 'decreasing'
        |    ELSE 'no trend' END AS trend
        |FROM zc""".stripMargin,
    "q_did" ->
      """WITH ev AS (SELECT user_id, value, ts::DATE AS day FROM events),
        |bnd AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
        |bd AS (SELECT mn + CAST(floor(datediff('day', mn, mx) / 2) AS INTEGER)
        |  AS bound FROM bnd),
        |c AS (
        |  SELECT value,
        |    CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    day >= bound AS post
        |  FROM ev CROSS JOIN bd),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_a0,
        |    CAST(sum(CASE WHEN arm = 'A' AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_a1,
        |    CAST(sum(CASE WHEN arm = 'B' AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_b0,
        |    CAST(sum(CASE WHEN arm = 'B' AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_b1,
        |    CAST(CAST(sum(CASE WHEN arm = 'A' AND NOT post THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS s_a0,
        |    CAST(CAST(sum(CASE WHEN arm = 'A' AND post THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS s_a1,
        |    CAST(CAST(sum(CASE WHEN arm = 'B' AND NOT post THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS s_b0,
        |    CAST(CAST(sum(CASE WHEN arm = 'B' AND post THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS s_b1,
        |    CAST(CAST(sum(CASE WHEN arm = 'A' AND NOT post THEN CAST(value * value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS q_a0,
        |    CAST(CAST(sum(CASE WHEN arm = 'A' AND post THEN CAST(value * value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS q_a1,
        |    CAST(CAST(sum(CASE WHEN arm = 'B' AND NOT post THEN CAST(value * value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS q_b0,
        |    CAST(CAST(sum(CASE WHEN arm = 'B' AND post THEN CAST(value * value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS q_b1
        |  FROM c),
        |m AS (
        |  SELECT n_a0, n_a1, n_b0, n_b1,
        |    (s_b1 / CAST(n_b1 AS DOUBLE) - s_b0 / CAST(n_b0 AS DOUBLE))
        |      - (s_a1 / CAST(n_a1 AS DOUBLE) - s_a0 / CAST(n_a0 AS DOUBLE))
        |      AS did,
        |    sqrt(
        |      (q_a0 / CAST(n_a0 AS DOUBLE)
        |        - (s_a0 / CAST(n_a0 AS DOUBLE)) * (s_a0 / CAST(n_a0 AS DOUBLE)))
        |        / CAST(n_a0 AS DOUBLE)
        |      + (q_a1 / CAST(n_a1 AS DOUBLE)
        |        - (s_a1 / CAST(n_a1 AS DOUBLE)) * (s_a1 / CAST(n_a1 AS DOUBLE)))
        |        / CAST(n_a1 AS DOUBLE)
        |      + (q_b0 / CAST(n_b0 AS DOUBLE)
        |        - (s_b0 / CAST(n_b0 AS DOUBLE)) * (s_b0 / CAST(n_b0 AS DOUBLE)))
        |        / CAST(n_b0 AS DOUBLE)
        |      + (q_b1 / CAST(n_b1 AS DOUBLE)
        |        - (s_b1 / CAST(n_b1 AS DOUBLE)) * (s_b1 / CAST(n_b1 AS DOUBLE)))
        |        / CAST(n_b1 AS DOUBLE)) AS se
        |  FROM s)
        |SELECT n_a0, n_a1, n_b0, n_b1,
        |  floor(did * 1e6 + 0.5) / 1e6 AS did,
        |  floor(se * 1e6 + 0.5) / 1e6 AS se,
        |  floor(did / se * 1e6 + 0.5) / 1e6 AS z_stat
        |FROM m""".stripMargin,
    "q_page_hinkley" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |pre AS (
        |  SELECT day, row_number() OVER (ORDER BY day) AS t,
        |    sum(yc) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
        |  FROM daily),
        |me AS (
        |  SELECT day, t, s,
        |    CAST(CAST(s AS DOUBLE) / CAST(t AS DOUBLE) AS DECIMAL(38,18))
        |      AS mean_dec
        |  FROM pre),
        |m AS (
        |  SELECT day, t,
        |    CAST(s AS DECIMAL(38,18))
        |      - sum(mean_dec) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |      - CAST(CAST(t AS DOUBLE) * 0.0 AS DECIMAL(38,18)) AS m_t
        |  FROM me),
        |p AS (
        |  SELECT day, t,
        |    m_t - min(m_t) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS ph
        |  FROM m),
        |b AS (
        |  SELECT count(*)::BIGINT AS n_days,
        |    max(struct_pack(ph := ph, nt := -t, day := day)) AS bb
        |  FROM p)
        |SELECT n_days, strftime(bb.day, '%Y-%m-%d') AS alarm_day,
        |  floor(CAST(bb.ph AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6 AS ph_stat,
        |  CAST(bb.ph AS DOUBLE) / 100.0 > 50000.0 AS is_drift
        |FROM b""".stripMargin,
    "q_cuped" ->
      """WITH ev AS (SELECT user_id, value, ts::DATE AS day FROM events),
        |bnd AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
        |bd AS (SELECT mn + CAST(floor(datediff('day', mn, mx) / 2) AS INTEGER)
        |  AS bound FROM bnd),
        |u AS (
        |  SELECT user_id,
        |    sum(CASE WHEN day < bound THEN CAST(value AS DECIMAL(28,6)) END) AS x,
        |    sum(CASE WHEN day >= bound THEN CAST(value AS DECIMAL(28,6)) END) AS y
        |  FROM ev CROSS JOIN bd GROUP BY 1),
        |kk AS (
        |  SELECT x, y,
        |    CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM u WHERE x IS NOT NULL AND y IS NOT NULL),
        |s AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
        |      AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |      AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
        |      AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN x END) AS DOUBLE) AS sxa,
        |    CAST(sum(CASE WHEN arm = 'A' THEN y END) AS DOUBLE) AS sya,
        |    CAST(sum(CASE WHEN arm = 'B' THEN x END) AS DOUBLE) AS sxb,
        |    CAST(sum(CASE WHEN arm = 'B' THEN y END) AS DOUBLE) AS syb
        |  FROM kk),
        |m AS (
        |  SELECT n, n_a,
        |    sxx / CAST(n AS DOUBLE)
        |      - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) AS vx,
        |    syy / CAST(n AS DOUBLE)
        |      - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS vy,
        |    sxy / CAST(n AS DOUBLE)
        |      - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS cxy,
        |    sxb / CAST(n - n_a AS DOUBLE) - sxa / CAST(n_a AS DOUBLE) AS diffx,
        |    syb / CAST(n - n_a AS DOUBLE) - sya / CAST(n_a AS DOUBLE) AS diffy
        |  FROM s)
        |SELECT n AS n_users, n_a,
        |  floor(CASE WHEN vx > 0.0 THEN cxy / vx END * 1e6 + 0.5) / 1e6
        |    AS theta,
        |  floor(CASE WHEN vx > 0.0 AND vy > 0.0 THEN cxy * cxy / (vx * vy) END
        |    * 1e6 + 0.5) / 1e6 AS var_reduction,
        |  floor(diffy * 1e6 + 0.5) / 1e6 AS diff_raw,
        |  floor((diffy - CASE WHEN vx > 0.0 THEN cxy / vx END * diffx)
        |    * 1e6 + 0.5) / 1e6 AS diff_adj
        |FROM m""".stripMargin,
    "copy_restore" ->
      """SELECT CAST(3 AS BIGINT) AS head_version,
        |  CAST(3 AS BIGINT) AS n_versions,
        |  count(*)::BIGINT AS n_rows,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
        |FROM customer WHERE c_custkey % 2 = 0""".stripMargin,
    "copy_schema_diff" ->
      """SELECT * FROM (VALUES
        |  ('c_acctbal', 'retyped', 'double', 'decimal(18,2)'),
        |  ('c_custkey', 'unchanged', 'bigint', 'bigint'),
        |  ('c_mktsegment', 'dropped', 'string', CAST(NULL AS VARCHAR)),
        |  ('c_name', 'unchanged', 'string', 'string'),
        |  ('c_nationkey', 'unchanged', 'int', 'int'),
        |  ('load_src', 'added', CAST(NULL AS VARCHAR), 'string'))
        |  AS t(column_name, status, src_type, dst_type)
        |ORDER BY column_name""".stripMargin,
    "q_ljung_box" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day FROM b),
        |full_s AS (
        |  SELECT spine.day, coalesce(yc, 0) AS yc
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |lags AS (SELECT unnest(generate_series(1, 14)) AS lag),
        |p AS (
        |  SELECT l.lag, prev.yc AS y0, cur.yc AS y1
        |  FROM full_s cur CROSS JOIN lags l
        |  JOIN full_s prev ON prev.day = cur.day - CAST(l.lag AS INTEGER)),
        |s AS (
        |  SELECT lag, count(*)::BIGINT AS n,
        |    sum(y0)::BIGINT AS sx, sum(y1)::BIGINT AS sy,
        |    sum(CAST(y0 AS HUGEINT) * y1) AS sxy,
        |    sum(CAST(y0 AS HUGEINT) * y0) AS sxx,
        |    sum(CAST(y1 AS HUGEINT) * y1) AS syy
        |  FROM p GROUP BY 1),
        |f AS (
        |  SELECT CAST(lag AS BIGINT) AS lag, n,
        |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
        |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS d1,
        |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS d2
        |  FROM s),
        |r AS (SELECT lag, n,
        |  CASE WHEN d1 > 0 AND d2 > 0 THEN num / sqrt(d1 * d2) END AS rho
        |  FROM f),
        |hs AS (SELECT * FROM (VALUES (7, 14.067140), (14, 23.684791))
        |  AS t(h, chi2_crit)),
        |agg AS (
        |  SELECT h, chi2_crit, max(n + lag) AS t_days,
        |    count(rho)::BIGINT AS n_terms,
        |    CAST(CAST(sum(CAST(rho * rho / CAST(n AS DOUBLE) AS DECIMAL(38,18)))
        | AS VARCHAR) AS DOUBLE) AS term_sum
        |  FROM r CROSS JOIN hs WHERE lag <= h GROUP BY 1, 2)
        |SELECT CAST(h AS BIGINT) AS h, t_days,
        |  CASE WHEN n_terms = h THEN
        |    floor(CAST(t_days AS DOUBLE) * (CAST(t_days AS DOUBLE) + 2.0)
        |      * term_sum * 1e6 + 0.5) / 1e6 END AS q_stat,
        |  CASE WHEN n_terms = h THEN
        |    CAST(t_days AS DOUBLE) * (CAST(t_days AS DOUBLE) + 2.0)
        |      * term_sum > chi2_crit END AS is_autocorrelated
        |FROM agg ORDER BY h""".stripMargin,
    "q_ab_power" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |    CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM events),
        |s AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS sa,
        |    CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS sb,
        |    CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value * value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS ssa,
        |    CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value * value AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS ssb
        |  FROM ev GROUP BY 1),
        |m AS (
        |  SELECT event_type, n_a, n_b,
        |    abs(sb / CAST(n_b AS DOUBLE) - sa / CAST(n_a AS DOUBLE)) AS diff,
        |    (1.959964 + 0.841621) * sqrt(
        |      (ssa / CAST(n_a AS DOUBLE)
        |        - (sa / CAST(n_a AS DOUBLE)) * (sa / CAST(n_a AS DOUBLE)))
        |        / CAST(n_a AS DOUBLE)
        |      + (ssb / CAST(n_b AS DOUBLE)
        |        - (sb / CAST(n_b AS DOUBLE)) * (sb / CAST(n_b AS DOUBLE)))
        |        / CAST(n_b AS DOUBLE)) AS mde
        |  FROM s)
        |SELECT event_type, n_a, n_b,
        |  floor(diff * 1e6 + 0.5) / 1e6 AS observed_diff,
        |  floor(mde * 1e6 + 0.5) / 1e6 AS mde,
        |  diff > mde AS is_detectable
        |FROM m ORDER BY event_type""".stripMargin,
    "copy_prune" ->
      """WITH e AS (SELECT ts::DATE AS day FROM events),
        |mx AS (SELECT max(day) AS mx FROM e)
        |SELECT strftime(day, '%Y-%m-%d') AS day, count(*)::BIGINT AS n_events
        |FROM e CROSS JOIN mx
        |WHERE day >= mx - 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "copy_vacuum" ->
      """SELECT count(*)::BIGINT AS n_rows, 2 AS n_orphans_removed,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders""".stripMargin,
    "q_clustering_coeff" -> Similarity.clusteringCoeffOracleSql(),
    "q_adamic_adar" -> Similarity.adamicAdarOracleSql(),
    "q_jaccard_linkpred" -> Similarity.jaccardLinkPredOracleSql(),
    "q_intrinsic_dim" -> Similarity.intrinsicDimOracleSql(),
    "q_theil_sen" ->
      """WITH daily AS (SELECT o_orderdate::DATE AS day,
        |  sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |d2 AS (SELECT day, yc,
        |  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx FROM daily),
        |pr AS (SELECT a.idx AS i, b.idx AS j,
        |  CAST(b.yc - a.yc AS DOUBLE) / CAST(b.idx - a.idx AS DOUBLE) AS slope
        |  FROM d2 a JOIN d2 b ON a.idx < b.idx),
        |m AS (SELECT count(*)::BIGINT AS n_pairs FROM pr),
        |rs AS (SELECT slope, row_number() OVER (ORDER BY slope, i, j) AS rn FROM pr),
        |sl AS (SELECT n_pairs, slope FROM rs CROSS JOIN m
        |       WHERE rn = CAST(floor((n_pairs + 1) / 2) AS BIGINT)),
        |nd AS (SELECT count(*)::BIGINT AS n_days FROM d2),
        |res AS (SELECT n_pairs, slope,
        |  CAST(yc AS DOUBLE) - slope * CAST(idx AS DOUBLE) AS resid, idx
        |  FROM d2 CROSS JOIN sl),
        |ri AS (SELECT n_pairs, slope, resid,
        |  row_number() OVER (ORDER BY resid, idx) AS rn FROM res)
        |SELECT n_days, n_pairs,
        |  floor(slope / 100.0 * 1e6 + 0.5) / 1e6 AS slope_per_day,
        |  floor(resid / 100.0 * 1e6 + 0.5) / 1e6 AS intercept
        |FROM ri CROSS JOIN nd
        |WHERE rn = CAST(floor((n_days + 1) / 2) AS BIGINT)""".stripMargin,
    "q_xcorr_lags" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS xc,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS xp
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day FROM b),
        |full_s AS (
        |  SELECT spine.day, coalesce(xc, 0) AS xc, coalesce(xp, 0) AS xp
        |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
        |lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
        |p AS (
        |  SELECT l.lag, prev.xc, cur.xp
        |  FROM full_s cur CROSS JOIN lags l
        |  JOIN full_s prev ON prev.day = cur.day - CAST(l.lag AS INTEGER)),
        |s AS (
        |  SELECT lag, count(*)::BIGINT AS n,
        |    sum(xc)::BIGINT AS sx, sum(xp)::BIGINT AS sy,
        |    sum(CAST(xc AS HUGEINT) * xp) AS sxy,
        |    sum(CAST(xc AS HUGEINT) * xc) AS sxx,
        |    sum(CAST(xp AS HUGEINT) * xp) AS syy
        |  FROM p GROUP BY 1),
        |f AS (
        |  SELECT lag, n,
        |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
        |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS d1,
        |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS d2
        |  FROM s)
        |SELECT CAST(lag AS BIGINT) AS lag, n,
        |  CASE WHEN d1 > 0 AND d2 > 0 THEN floor((num / sqrt(d1 * d2)) * 1e6 + 0.5) / 1e6 END AS xcorr
        |FROM f ORDER BY lag""".stripMargin,
    "q_hill_tail" ->
      """WITH top AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders ORDER BY yc DESC, o_orderkey ASC LIMIT 100),
        |r AS (SELECT min(yc) AS ref FROM top),
        |terms AS (
        |  SELECT CAST(ln(CAST(yc AS DOUBLE) / CAST(ref AS DOUBLE))
        |    AS DECIMAL(28,12)) AS term, ref
        |  FROM top, r)
        |SELECT count(*)::BIGINT AS k,
        |  floor((CAST(max(ref) AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS ref_value,
        |  CASE WHEN sum(term) <> 0 THEN
        |    floor((CAST(count(*) AS DOUBLE) / CAST(sum(term) AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |  END AS hill_alpha
        |FROM terms""".stripMargin,
    "copy_publish" ->
      """SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_token_len_profile" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |lens AS (SELECT lang, CAST(length(tok) AS BIGINT) AS len FROM tok),
        |h AS (SELECT lang, len, count(*)::BIGINT AS cnt FROM lens GROUP BY 1, 2),
        |cm AS (SELECT lang, len, cnt,
        |  sum(cnt) OVER (PARTITION BY lang ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY lang) AS n,
        |  len * cnt AS lc
        |  FROM h)
        |SELECT lang, max(n)::BIGINT AS n_tokens,
        |  floor((CAST(sum(lc) AS DOUBLE) / CAST(max(n) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mean_len,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN len END) AS p50_len,
        |  min(CASE WHEN cum >= CAST(ceil(n * 0.95) AS BIGINT) THEN len END) AS p95_len
        |FROM cm GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gap_hazard" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate::DATE AS d,
        |    lag(o_orderdate::DATE) OVER (PARTITION BY o_custkey ORDER BY o_orderdate::DATE) AS prev
        |  FROM orders),
        |gaps AS (
        |  SELECT least(datediff('day', prev, d) // 7, 12) AS wk
        |  FROM o WHERE prev IS NOT NULL),
        |h AS (SELECT wk, count(*)::BIGINT AS n_gaps FROM gaps GROUP BY 1),
        |r AS (SELECT wk, n_gaps,
        |  sum(n_gaps) OVER (ORDER BY wk DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS at_risk
        |  FROM h)
        |SELECT wk AS gap_weeks, n_gaps, CAST(at_risk AS BIGINT) AS at_risk,
        |  floor((CAST(n_gaps AS DOUBLE) / CAST(at_risk AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS hazard
        |FROM r ORDER BY gap_weeks""".stripMargin,
    "q_kendall_tau" ->
      """WITH joint AS (
        |  SELECT l_returnflag AS flag, l_quantity AS x, l_discount AS y,
        |    count(*)::BIGINT AS n
        |  FROM lineitem GROUP BY 1, 2, 3),
        |cd AS (
        |  SELECT a.flag,
        |    sum(CASE WHEN b.y > a.y THEN CAST(a.n AS HUGEINT) * b.n
        |      ELSE 0 END) AS c,
        |    sum(CASE WHEN b.y < a.y THEN CAST(a.n AS HUGEINT) * b.n
        |      ELSE 0 END) AS d
        |  FROM joint a JOIN joint b ON a.flag = b.flag AND b.x > a.x
        |  GROUP BY 1),
        |tx AS (
        |  SELECT flag, sum(CAST(t AS HUGEINT) * (t - 1)) AS t2_x FROM (
        |    SELECT flag, x, sum(n)::BIGINT AS t FROM joint GROUP BY 1, 2)
        |  GROUP BY 1),
        |ty AS (
        |  SELECT flag, sum(CAST(t AS HUGEINT) * (t - 1)) AS t2_y FROM (
        |    SELECT flag, y, sum(n)::BIGINT AS t FROM joint GROUP BY 1, 2)
        |  GROUP BY 1),
        |tot AS (SELECT flag, sum(n)::BIGINT AS nn FROM joint GROUP BY 1)
        |SELECT cd.flag, nn AS n,
        |  floor((2.0 * CAST(c - d AS DOUBLE)
        |    / sqrt(CAST(CAST(nn AS HUGEINT) * (nn - 1) - t2_x AS DOUBLE)
        |         * CAST(CAST(nn AS HUGEINT) * (nn - 1) - t2_y AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    AS tau_b
        |FROM cd JOIN tx USING (flag) JOIN ty USING (flag) JOIN tot USING (flag)
        |ORDER BY flag""".stripMargin,
    "q_partial_corr" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
        |    CAST(CAST(l_discount AS DECIMAL(8,3)) * 1000 AS BIGINT) AS z
        |  FROM lineitem),
        |s AS (
        |  SELECT flag, count(*)::BIGINT AS n,
        |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, sum(z)::BIGINT AS sz,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz, sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy, sum(CAST(z AS HUGEINT) * z) AS szz
        |  FROM li GROUP BY 1),
        |r AS (
        |  SELECT flag, n,
        |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |           * CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)) AS rxy,
        |    CAST(CAST(n AS HUGEINT) * sxz - CAST(sx AS HUGEINT) * sz AS DOUBLE)
        |      / sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |           * CAST(CAST(n AS HUGEINT) * szz - CAST(sz AS HUGEINT) * sz AS DOUBLE)) AS rxz,
        |    CAST(CAST(n AS HUGEINT) * syz - CAST(sy AS HUGEINT) * sz AS DOUBLE)
        |      / sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
        |           * CAST(CAST(n AS HUGEINT) * szz - CAST(sz AS HUGEINT) * sz AS DOUBLE)) AS ryz
        |  FROM s)
        |SELECT flag, n, floor((rxy) * 1e6 + 0.5) / 1e6 AS r_xy,
        |  floor(((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))) * 1e6 + 0.5) / 1e6
        |    AS r_xy_given_z
        |FROM r ORDER BY flag""".stripMargin,
    "q_weighted_median" ->
      """WITH h AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
        |    sum(CAST(l_quantity AS BIGINT))::BIGINT AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cm AS (SELECT flag, pc,
        |  sum(w) OVER (PARTITION BY flag ORDER BY pc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(w) OVER (PARTITION BY flag) AS tw
        |  FROM h)
        |SELECT flag, max(tw)::BIGINT AS total_weight,
        |  floor((CAST(min(CASE WHEN cum * 2 >= tw THEN pc END) AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2
        |    AS weighted_median_price
        |FROM cm GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_char_entropy" ->
      """WITH g AS (
        |  SELECT lang, unnest([substr(text, i, 2)
        |    FOR i IN generate_series(1, length(text) - 1)]) AS g
        |  FROM documents WHERE length(text) >= 2),
        |c AS (SELECT lang, g, count(*)::BIGINT AS c FROM g GROUP BY 1, 2)
        |SELECT lang, sum(c)::BIGINT AS n_bigrams, count(*)::BIGINT AS vocab,
        |  floor((ln(CAST(sum(c) AS DOUBLE))
        |    - CAST(CAST(sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |        AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
        |      / CAST(sum(c) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS entropy_nats
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_effective_sample" ->
      """WITH w AS (
        |  SELECT o_custkey,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS w
        |  FROM orders GROUP BY 1),
        |s AS (SELECT count(*)::BIGINT AS n, sum(w)::BIGINT AS sw,
        |      sum(CAST(w AS HUGEINT) * w) AS sww FROM w)
        |SELECT n,
        |  floor((CAST(CAST(sw AS HUGEINT) * sw AS DOUBLE) / CAST(sww AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ess,
        |  floor((CAST(CAST(sw AS HUGEINT) * sw AS DOUBLE) / CAST(sww AS DOUBLE)
        |    / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ess_ratio
        |FROM s""".stripMargin,
    "copy_dedup" ->
      """WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
        |outc AS (
        |  SELECT source, count(*)::BIGINT AS n_out
        |  FROM documents JOIN surv USING (doc_id) GROUP BY 1),
        |inc AS (SELECT source, count(*)::BIGINT AS n_in FROM documents GROUP BY 1)
        |SELECT inc.source, n_in, coalesce(n_out, 0) AS n_out,
        |  n_in - coalesce(n_out, 0) AS n_dropped
        |FROM inc LEFT JOIN outc ON inc.source = outc.source
        |ORDER BY inc.source""".stripMargin,
    // ---- r9 additions (#329-#342). All roundings are the engine-stable
    // floor(x*1e6+0.5)/1e6 form (round()-on-DOUBLE is linted out).
    "q_cramers_v" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS seg, o_orderstatus AS st, count(*)::BIGINT AS nij
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |rt AS (SELECT seg, sum(nij)::BIGINT AS nr FROM cells GROUP BY 1),
        |ct AS (SELECT st, sum(nij)::BIGINT AS nc FROM cells GROUP BY 1),
        |tot AS (SELECT sum(nij)::BIGINT AS n, count(DISTINCT seg)::BIGINT AS r,
        |        count(DISTINCT st)::BIGINT AS c FROM cells),
        |terms AS (
        |  SELECT n, r, c,
        |    (CAST(nij AS DOUBLE) - CAST(nr * nc AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(nij AS DOUBLE) - CAST(nr * nc AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(nr * nc AS DOUBLE) / CAST(n AS DOUBLE)) AS term
        |  FROM cells JOIN rt USING (seg) JOIN ct USING (st) CROSS JOIN tot)
        |SELECT max(n) AS n_total, max(r) AS n_segs, max(c) AS n_stats,
        |  floor(CAST(CAST(sum(CAST(term AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS chi2,
        |  floor(sqrt(CAST(CAST(sum(CAST(term AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
        |    / CAST(max(n) * least(max(r) - 1, max(c) - 1) AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |    AS cramers_v
        |FROM terms""".stripMargin,
    "q_wilcoxon_signed" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS cnt
        |  FROM orders),
        |pairs AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN rn = cnt THEN pc END) -
        |    max(CASE WHEN rn = 1 THEN pc END) AS d
        |  FROM o WHERE cnt >= 2 AND (rn = 1 OR rn = cnt) GROUP BY 1),
        |nz AS (SELECT o_custkey, d, abs(d) AS absd FROM pairs WHERE d <> 0),
        |rk AS (SELECT *, row_number() OVER (ORDER BY absd, o_custkey) AS gr FROM nz),
        |g AS (SELECT absd, count(*)::BIGINT AS tk,
        |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS npos,
        |    CAST(min(gr) + max(gr) AS DOUBLE) / 2.0 AS avg_rank
        |  FROM rk GROUP BY 1),
        |s AS (SELECT sum(tk)::BIGINT AS n,
        |    CAST(CAST(sum(CAST(avg_rank * CAST(npos AS DOUBLE) AS DECIMAL(38,1)))
        | AS VARCHAR) AS DOUBLE) AS wp,
        |    sum(tk * tk * tk - tk)::BIGINT AS ties FROM g)
        |SELECT n AS n_pairs, wp AS w_plus,
        |  floor(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0 * 1e6 + 0.5) / 1e6 AS mu,
        |  floor(sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |      * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
        |      - CAST(ties AS DOUBLE) / 48.0) * 1e6 + 0.5) / 1e6 AS sigma,
        |  floor((wp - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
        |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |      * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
        |      - CAST(ties AS DOUBLE) / 48.0) * 1e6 + 0.5) / 1e6 AS z_stat
        |FROM s""".stripMargin,
    "q_durbin_watson" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |f AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(yc)::BIGINT AS sy,
        |    sum(CAST(x * yc AS DECIMAL(29,0))) AS sxy,
        |    sum(x * x)::BIGINT AS sxx
        |  FROM (SELECT CAST(date_diff('day', DATE '1995-01-01', day) AS BIGINT)
        |          AS x, yc FROM daily)),
        |fit AS (SELECT n,
        |    CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxy
        |        - CAST(sx AS DECIMAL(13,0)) * CAST(sy AS DECIMAL(24,0)) AS VARCHAR) AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE)
        |      AS slope_c, sx, sy FROM f),
        |fit2 AS (SELECT n, slope_c,
        |    (CAST(sy AS DOUBLE) - slope_c * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |      AS icept_c FROM fit),
        |res AS (SELECT day, n,
        |    CAST(yc AS DOUBLE) - (icept_c + slope_c
        |      * CAST(date_diff('day', DATE '1995-01-01', day) AS DOUBLE)) AS e
        |  FROM daily CROSS JOIN fit2),
        |d AS (SELECT n, e, e - lag(e) OVER (ORDER BY day) AS de FROM res)
        |SELECT max(n) AS n_days,
        |  floor(CAST(CAST(sum(CAST(de * de AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sum(CAST(e * e AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS dw_stat,
        |  floor((1.0 - CAST(CAST(sum(CAST(de * de AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sum(CAST(e * e AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / 2.0) * 1e6 + 0.5)
        |    / 1e6 AS rho_lag1
        |FROM d""".stripMargin,
    "q_grubbs" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM daily_src GROUP BY 1),
        |s AS (SELECT count(*)::BIGINT AS n, sum(yc)::BIGINT AS sy,
        |    sum(CAST(yc AS HUGEINT) * yc) AS qy FROM daily),
        |scored AS (
        |  SELECT day, n,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS m,
        |    sqrt(CAST(n * qy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0 AS sdev,
        |    abs(CAST(yc AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS adev
        |  FROM daily CROSS JOIN s)
        |SELECT n AS n_days,
        |  floor(m * 1e6 + 0.5) / 1e6 AS mean_rev,
        |  floor(sdev * 1e6 + 0.5) / 1e6 AS sd_rev,
        |  floor(adev / (sdev * 100.0) * 1e6 + 0.5) / 1e6 AS g_stat,
        |  strftime(day, '%Y-%m-%d') AS top_day
        |FROM scored ORDER BY adev DESC, day DESC LIMIT 1""".stripMargin
        .replace("daily_src", "orders"),
    "q_cooks_distance" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |f AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(yc)::BIGINT AS sy,
        |    sum(CAST(x * yc AS DECIMAL(29,0))) AS sxy,
        |    sum(x * x)::BIGINT AS sxx
        |  FROM (SELECT CAST(date_diff('day', DATE '1995-01-01', day) AS BIGINT)
        |          AS x, yc FROM daily)),
        |fit AS (SELECT n, sx, sxx,
        |    CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxy
        |        - CAST(sx AS DECIMAL(13,0)) * CAST(sy AS DECIMAL(24,0)) AS VARCHAR) AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE)
        |      AS slope_c, sy FROM f),
        |fit2 AS (SELECT n, sx, sxx, slope_c,
        |    (CAST(sy AS DOUBLE) - slope_c * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |      AS icept_c FROM fit),
        |res AS (SELECT day, yc, n, sx, sxx,
        |    CAST(date_diff('day', DATE '1995-01-01', day) AS DOUBLE) AS x,
        |    CAST(yc AS DOUBLE) - (icept_c + slope_c
        |      * CAST(date_diff('day', DATE '1995-01-01', day) AS DOUBLE)) AS e
        |  FROM daily CROSS JOIN fit2),
        |sse AS (SELECT sum(CAST(e * e AS DECIMAL(38,6))) AS sse FROM res),
        |scored AS (
        |  SELECT day, yc, e,
        |    1.0 / CAST(n AS DOUBLE)
        |      + (x - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (x - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(sxx AS DOUBLE)
        |          - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |            * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(n AS DOUBLE))
        |      AS h,
        |    CAST(sse AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0) AS s2
        |  FROM res CROSS JOIN sse)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(yc AS DOUBLE) / 100.0 AS revenue,
        |  floor(h * 1e6 + 0.5) / 1e6 AS leverage,
        |  floor(e / 100.0 * 1e6 + 0.5) / 1e6 AS resid,
        |  floor(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) * 1e6 + 0.5) / 1e6
        |    AS cooks_d
        |FROM scored ORDER BY cooks_d DESC, day LIMIT 10""".stripMargin,
    "q_wasserstein" ->
      """WITH v AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |h AS (SELECT vc,
        |    sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END)::BIGINT AS cb
        |  FROM v GROUP BY 1),
        |c AS (SELECT vc,
        |    sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
        |    lead(vc) OVER (ORDER BY vc) AS vnext
        |  FROM h WINDOW w AS (ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT max(cuma)::BIGINT AS na, max(cumb)::BIGINT AS nb FROM c)
        |SELECT na, nb,
        |  floor(CAST(CAST(sum(CAST(abs(cuma * nb - cumb * na) AS DECIMAL(24,0))
        |      * CAST(vnext - vc AS DECIMAL(14,0))) AS VARCHAR) AS DOUBLE)
        |    / CAST(na * nb AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6 AS w1_dollars
        |FROM c CROSS JOIN t WHERE vnext IS NOT NULL GROUP BY na, nb""".stripMargin,
    "q_poisson_rate" ->
      """WITH ev AS (SELECT event_type, ts::DATE AS day FROM events),
        |span AS (SELECT CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT)
        |  AS n_days FROM ev),
        |pt AS (SELECT event_type, count(*)::BIGINT AS n_events FROM ev GROUP BY 1)
        |SELECT event_type, n_events, n_days,
        |  floor(CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS rate_per_day,
        |  floor((CAST(n_events AS DOUBLE) - 1.959964 * sqrt(CAST(n_events AS DOUBLE)))
        |    / CAST(n_days AS DOUBLE) * 1e6 + 0.5) / 1e6 AS ci_lo,
        |  floor((CAST(n_events AS DOUBLE) + 1.959964 * sqrt(CAST(n_events AS DOUBLE)))
        |    / CAST(n_days AS DOUBLE) * 1e6 + 0.5) / 1e6 AS ci_hi
        |FROM pt CROSS JOIN span ORDER BY event_type""".stripMargin,
    "q_friedman" ->
      """WITH cells AS (
        |  SELECT strftime(o_orderdate::DATE, '%Y-%m') AS month,
        |    c_mktsegment AS seg,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |kk AS (SELECT count(DISTINCT seg)::BIGINT AS k FROM cells),
        |comp AS (SELECT month, seg, yc FROM (
        |    SELECT cells.*, count(*) OVER (PARTITION BY month) AS nseg FROM cells) x
        |  CROSS JOIN kk WHERE nseg = k),
        |rkd AS (SELECT month, seg, yc,
        |    rank() OVER (PARTITION BY month ORDER BY yc) AS rk,
        |    count(*) OVER (PARTITION BY month, yc) AS tw
        |  FROM comp),
        |rs AS (SELECT seg, count(*)::BIGINT AS n_months,
        |    sum(CAST(CAST(rk AS DOUBLE) + CAST(tw - 1 AS DOUBLE) / 2.0
        |      AS DECIMAL(38,1))) AS rsum
        |  FROM rkd GROUP BY 1),
        |q AS (SELECT max(k) AS kk2, max(n_months) AS nn,
        |    sum(CAST(CAST(rsum AS DECIMAL(18,1)) * CAST(rsum AS DECIMAL(18,1))
        |      AS DECIMAL(38,2))) AS r2
        |  FROM rs CROSS JOIN kk),
        |qq AS (SELECT
        |    12.0 * CAST(r2 AS DOUBLE) / CAST(nn * kk2 * (kk2 + 1) AS DOUBLE)
        |      - 3.0 * CAST(nn * (kk2 + 1) AS DOUBLE) AS q_raw,
        |    kk2 - 1 AS dfree FROM q)
        |SELECT seg AS segment, n_months, CAST(rsum AS DOUBLE) AS rank_sum,
        |  floor(q_raw * 1e6 + 0.5) / 1e6 AS q_stat, dfree AS df
        |FROM rs CROSS JOIN qq ORDER BY segment""".stripMargin,
    "q_bollinger" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day, yc,
        |    count(*) OVER w AS cnt, sum(yc) OVER w AS s,
        |    sum(CAST(yc AS HUGEINT) * yc) OVER w AS q
        |  FROM daily WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |b AS (SELECT day, yc,
        |    CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 100.0 AS ma,
        |    sqrt(CAST(cnt * q - CAST(s AS HUGEINT) * s AS DOUBLE))
        |      / CAST(cnt AS DOUBLE) / 100.0 AS sd
        |  FROM r WHERE cnt = 20)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(yc AS DOUBLE) / 100.0 AS revenue,
        |  floor(ma * 1e6 + 0.5) / 1e6 AS ma20,
        |  floor(sd * 1e6 + 0.5) / 1e6 AS sd20,
        |  CAST(yc AS DOUBLE) / 100.0 > ma + 2.0 * sd AS breach_hi,
        |  CAST(yc AS DOUBLE) / 100.0 < ma - 2.0 * sd AS breach_lo
        |FROM b ORDER BY day""".stripMargin,
    "q_rsi" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |d AS (SELECT day, yc - lag(yc) OVER (ORDER BY day) AS d FROM daily),
        |nn AS (SELECT day, d FROM d WHERE d IS NOT NULL),
        |r AS (SELECT day,
        |    count(*) OVER w AS cnt,
        |    sum(greatest(d, 0)) OVER w AS sg,
        |    sum(greatest(-d, 0)) OVER w AS sl
        |  FROM nn WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  floor(CAST(sg AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6 AS gain_sum,
        |  floor(CAST(sl AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6 AS loss_sum,
        |  floor(100.0 * CAST(sg AS DOUBLE) / CAST(sg + sl AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS rsi,
        |  CASE WHEN 100.0 * CAST(sg AS DOUBLE) / CAST(sg + sl AS DOUBLE) > 70.0
        |    THEN 'overbought'
        |    WHEN 100.0 * CAST(sg AS DOUBLE) / CAST(sg + sl AS DOUBLE) < 30.0
        |    THEN 'oversold' ELSE 'neutral' END AS signal
        |FROM r WHERE cnt = 14 AND sg + sl > 0 ORDER BY day""".stripMargin,
    "q_sax" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |s AS (SELECT count(*)::BIGINT AS n, sum(yc)::BIGINT AS sy,
        |    sum(CAST(yc AS HUGEINT) * yc) AS qy FROM daily),
        |z AS (SELECT day,
        |    (CAST(yc AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (sqrt(CAST(n * qy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
        |      / CAST(n AS DOUBLE)) AS z
        |  FROM daily CROSS JOIN s)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  floor(z * 1e6 + 0.5) / 1e6 AS z_score,
        |  CASE WHEN z < -0.6744897501960817 THEN 'a' WHEN z < 0.0 THEN 'b'
        |    WHEN z < 0.6744897501960817 THEN 'c' ELSE 'd' END AS symbol
        |FROM z ORDER BY day""".stripMargin,
    "q_hurst" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT day, yc, row_number() OVER (ORDER BY day) AS i FROM daily),
        |sized AS (SELECT day, yc, i, w, (i - 1) // w AS blk
        |  FROM idx CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS w)),
        |blocks AS (SELECT w, blk, count(*)::BIGINT AS bn, sum(yc)::BIGINT AS bs,
        |    sum(CAST(yc AS HUGEINT) * yc) AS bq
        |  FROM sized GROUP BY 1, 2 HAVING count(*) = max(w)),
        |wc AS (SELECT s.w, s.blk, b.bn, b.bs, b.bq,
        |    row_number() OVER (PARTITION BY s.w, s.blk ORDER BY s.i) AS j,
        |    sum(s.yc) OVER (PARTITION BY s.w, s.blk ORDER BY s.i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM sized s JOIN blocks b USING (w, blk)),
        |rs AS (SELECT w, blk, max(bn) AS bn, max(bs) AS bs, max(bq) AS bq,
        |    max(CAST(cum AS DOUBLE) - CAST(j AS DOUBLE)
        |        * (CAST(bs AS DOUBLE) / CAST(w AS DOUBLE)))
        |      - min(CAST(cum AS DOUBLE) - CAST(j AS DOUBLE)
        |        * (CAST(bs AS DOUBLE) / CAST(w AS DOUBLE))) AS rng
        |  FROM wc GROUP BY 1, 2),
        |lrs AS (SELECT w, ln(rng / (sqrt(CAST(w * bq
        |      - CAST(bs AS HUGEINT) * bs AS DOUBLE)) / CAST(w AS DOUBLE))) AS lrs
        |  FROM rs
        |  WHERE sqrt(CAST(w * bq - CAST(bs AS HUGEINT) * bs AS DOUBLE))
        |    / CAST(w AS DOUBLE) > 0),
        |perw AS (SELECT w, count(*)::BIGINT AS n_blocks,
        |    CAST(CAST(sum(CAST(lrs AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS mean_lrs
        |  FROM lrs GROUP BY 1),
        |fit AS (SELECT count(*)::BIGINT AS m,
        |    sum(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(38,12))) AS sx,
        |    sum(CAST(mean_lrs AS DECIMAL(38,12))) AS sy,
        |    sum(CAST(ln(CAST(w AS DOUBLE)) * mean_lrs AS DECIMAL(38,12))) AS sxy,
        |    sum(CAST(ln(CAST(w AS DOUBLE)) * ln(CAST(w AS DOUBLE))
        |      AS DECIMAL(38,12))) AS sxx
        |  FROM perw),
        |hh AS (SELECT (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS h FROM fit)
        |SELECT w AS win_size, n_blocks,
        |  floor(mean_lrs * 1e6 + 0.5) / 1e6 AS mean_log_rs,
        |  floor(h * 1e6 + 0.5) / 1e6 AS hurst
        |FROM perw CROSS JOIN hh ORDER BY win_size""".stripMargin,
    "q_entropy_rate" -> {
      def rnd(prev: String, out: String): String =
        s"""$out AS (SELECT st.event_type, coalesce(CAST(x.in_p AS DOUBLE), 0.0) AS p
           |  FROM st LEFT JOIN (
           |    SELECT tr.to_type AS event_type,
           |      sum(CAST(pp.p * (CAST(tr.nij AS DOUBLE) / CAST(rt.ni AS DOUBLE))
           |        AS DECIMAL(38,18))) AS in_p
           |    FROM tr JOIN rt USING (from_type)
           |    JOIN $prev pp ON pp.event_type = tr.from_type
           |    GROUP BY 1) x ON x.event_type = st.event_type)""".stripMargin
      s"""WITH s AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |tr AS (SELECT from_type, to_type, count(*)::BIGINT AS nij FROM s
         |       WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT from_type, sum(nij)::BIGINT AS ni FROM tr GROUP BY 1),
         |st AS (SELECT DISTINCT event_type FROM (
         |  SELECT from_type AS event_type FROM tr
         |  UNION ALL SELECT to_type FROM tr)),
         |nst AS (SELECT count(*)::BIGINT AS n FROM st),
         |p0 AS (SELECT event_type, 1.0 / n AS p FROM st, nst),
         |${rnd("p0", "r1")},
         |${rnd("r1", "r2")},
         |${rnd("r2", "r3")},
         |rowent AS (SELECT from_type AS event_type,
         |    CAST(CAST(sum(CAST(-(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE))
         |      * ln(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE))
         |      AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS h_row
         |  FROM tr JOIN rt USING (from_type) GROUP BY 1),
         |j AS (SELECT r3.event_type, r3.p, coalesce(rowent.h_row, 0.0) AS h_row
         |  FROM r3 LEFT JOIN rowent USING (event_type)),
         |rate AS (SELECT CAST(CAST(sum(CAST(p * h_row AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
         |  AS hr FROM j)
         |SELECT event_type, floor(p * 1e9 + 0.5) / 1e9 AS pi,
         |  floor(h_row * 1e6 + 0.5) / 1e6 AS h_row,
         |  floor(hr * 1e6 + 0.5) / 1e6 AS entropy_rate
         |FROM j CROSS JOIN rate ORDER BY event_type""".stripMargin
    },
    "q_peak_detect" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS yc
        |  FROM orders GROUP BY 1),
        |n AS (SELECT day, yc, lag(yc) OVER (ORDER BY day) AS prev,
        |    lead(yc) OVER (ORDER BY day) AS nxt FROM daily)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(yc AS DOUBLE) / 100.0 AS revenue,
        |  CAST(yc - greatest(prev, nxt) AS DOUBLE) / 100.0 AS prominence
        |FROM n WHERE prev IS NOT NULL AND nxt IS NOT NULL
        |  AND yc > prev AND yc > nxt ORDER BY day""".stripMargin,
    "q_kcore" -> Similarity.kCoreOracleSql(),
    "q_gopher_rules" ->
      """WITH b2 AS (
        |  SELECT doc_id, source,
        |    len(string_split(trim(text), ' '))::INTEGER AS nt,
        |    length(replace(text, ' ', ''))::DOUBLE
        |      / len(string_split(trim(text), ' ')) AS mwl,
        |    len(list_filter(string_split(trim(text), ' '),
        |      t -> t IN ('the', 'a', 'of', 'and', 'is')))::INTEGER AS stop_hits
        |  FROM documents),
        |hist AS (SELECT doc_id, max(c) AS top_c, count(*) AS n_distinct FROM (
        |    SELECT doc_id, tok, count(*) AS c FROM (
        |      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
        |      FROM documents) GROUP BY 1, 2) GROUP BY 1),
        |flags AS (SELECT source,
        |    (nt >= 30 AND nt <= 90) AS pass_len,
        |    (mwl >= 4.0 AND mwl <= 4.9) AS pass_wordlen,
        |    coalesce(CAST(top_c AS DOUBLE) / nt <= 0.15, false) AS pass_top,
        |    coalesce(1.0 - CAST(n_distinct AS DOUBLE) / nt <= 0.6, false)
        |      AS pass_rep,
        |    (stop_hits >= 1) AS pass_stop
        |  FROM b2 LEFT JOIN hist USING (doc_id)),
        |agg AS (SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(CASE WHEN pass_len THEN 0 ELSE 1 END)::BIGINT AS fail_len,
        |    sum(CASE WHEN pass_wordlen THEN 0 ELSE 1 END)::BIGINT AS fail_wordlen,
        |    sum(CASE WHEN pass_top THEN 0 ELSE 1 END)::BIGINT AS fail_top,
        |    sum(CASE WHEN pass_rep THEN 0 ELSE 1 END)::BIGINT AS fail_rep,
        |    sum(CASE WHEN pass_stop THEN 0 ELSE 1 END)::BIGINT AS fail_stop,
        |    sum(CASE WHEN pass_len AND pass_wordlen AND pass_top
        |      AND pass_rep AND pass_stop THEN 1 ELSE 0 END)::BIGINT AS n_keep
        |  FROM flags GROUP BY 1)
        |SELECT source, n_docs, fail_len, fail_wordlen, fail_top, fail_rep,
        |  fail_stop, n_keep,
        |  floor(CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS keep_rate
        |FROM agg ORDER BY source""".stripMargin,
    "q_cms_error" -> {
      def pos(h: Int): String =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "[CAST(strpos('0123456789abcdef', substr(sha256(tok), i, 1)) - 1 AS BIGINT) " +
          s"FOR i IN generate_series(${1 + 8 * h}, ${8 + 8 * h})]), " +
          "(a, v) -> a * 16 + v) % 1024"
      s"""WITH counts AS (
         |  SELECT tok, count(*)::BIGINT AS cnt FROM (
         |    SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents)
         |  GROUP BY 1),
         |hashed AS (SELECT tok, cnt, ${pos(0)} AS p0, ${pos(1)} AS p1,
         |    ${pos(2)} AS p2 FROM counts),
         |cells AS (SELECT h, b, sum(cnt)::BIGINT AS cell FROM (
         |    SELECT cnt, unnest([0, 1, 2]) AS h, unnest([p0, p1, p2]) AS b
         |    FROM hashed) GROUP BY 1, 2),
         |tot AS (SELECT sum(cnt)::BIGINT AS n_stream FROM counts),
         |top AS (SELECT tok, cnt, p0, p1, p2 FROM hashed
         |  ORDER BY cnt DESC, tok LIMIT 20)
         |SELECT t.tok, t.cnt AS exact_cnt,
         |  least(c0.cell, c1.cell, c2.cell) AS est_cnt,
         |  least(c0.cell, c1.cell, c2.cell) - t.cnt AS overestimate,
         |  floor(2.718281828459045 * CAST(n_stream AS DOUBLE) / 1024.0
         |    * 1e6 + 0.5) / 1e6 AS eps_bound
         |FROM top t
         |JOIN cells c0 ON c0.h = 0 AND c0.b = t.p0
         |JOIN cells c1 ON c1.h = 1 AND c1.b = t.p1
         |JOIN cells c2 ON c2.h = 2 AND c2.b = t.p2
         |CROSS JOIN tot
         |ORDER BY exact_cnt DESC, tok""".stripMargin
    },
    "q_dedup_weights" ->
      s"""$dedupClusterCtes,
         |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
         |csz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
         |        FROM cl GROUP BY 1),
         |wtd AS (SELECT doc_id, cl.cluster_id, cluster_size,
         |    1.0 / CAST(cluster_size AS DOUBLE) AS w
         |  FROM cl JOIN csz USING (cluster_id)),
         |eff AS (SELECT floor(CAST(CAST(sum(CAST(w AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
         |    * 1e6 + 0.5) / 1e6 AS effective_docs FROM wtd)
         |SELECT doc_id, cluster_id, cluster_size,
         |  floor(w * 1e6 + 0.5) / 1e6 AS weight, effective_docs
         |FROM wtd CROSS JOIN eff ORDER BY doc_id""".stripMargin,
    "q_modularity" -> Similarity.modularityOracleSql(),
    "q_neyman_alloc" ->
      """WITH s AS (SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(len(string_split(trim(text), ' ')))::BIGINT AS st,
        |    sum(CAST(len(string_split(trim(text), ' ')) AS HUGEINT)
        |      * len(string_split(trim(text), ' '))) AS qt
        |  FROM documents GROUP BY 1),
        |sc AS (SELECT source, n_docs,
        |    sqrt(CAST(n_docs * qt - CAST(st AS HUGEINT) * st AS DOUBLE))
        |      / CAST(n_docs AS DOUBLE) AS sigma
        |  FROM s),
        |sc2 AS (SELECT source, n_docs, sigma,
        |    CAST(n_docs AS DOUBLE) * sigma AS ns FROM sc),
        |z AS (SELECT CAST(CAST(sum(CAST(ns AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS z
        |  FROM sc2)
        |SELECT source, n_docs,
        |  floor(sigma * 1e6 + 0.5) / 1e6 AS sigma_tokens,
        |  floor(ns / z * 1e6 + 0.5) / 1e6 AS alloc_share,
        |  CAST(floor(ns / z * 1000 + 0.5) AS BIGINT) AS alloc_n
        |FROM sc2 CROSS JOIN z ORDER BY source""".stripMargin,
    "q_meta_analysis" ->
      """WITH ev AS (
        |  SELECT user_id, value, (event_id % 8) + 1 AS nkey,
        |    CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM events),
        |per AS (SELECT nkey,
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(28,6)) END) AS s_a,
        |    sum(CASE WHEN arm = 'A' THEN CAST(value * value AS DECIMAL(28,6)) END) AS q_a,
        |    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(28,6)) END) AS s_b,
        |    sum(CASE WHEN arm = 'B' THEN CAST(value * value AS DECIMAL(28,6)) END) AS q_b
        |  FROM ev GROUP BY 1),
        |st AS (SELECT nkey, n_a, n_b,
        |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |      - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS d,
        |    (CAST(q_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
        |      / CAST(n_a AS DOUBLE)
        |    + (CAST(q_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |      - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |        * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |      / CAST(n_b AS DOUBLE) AS vv
        |  FROM per WHERE n_a >= 2 AND n_b >= 2),
        |p AS (SELECT count(*)::BIGINT AS k_studies,
        |    CAST(CAST(sum(CAST(1.0 / vv AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sw,
        |    CAST(CAST(sum(CAST(d / vv AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS swd
        |  FROM st),
        |p2 AS (SELECT k_studies, swd / sw AS d_pooled, 1.0 / sqrt(sw) AS se
        |  FROM p),
        |q AS (SELECT max(k_studies) AS k_studies, max(d_pooled) AS d_pooled,
        |    max(se) AS se,
        |    CAST(CAST(sum(CAST((d - d_pooled) * (d - d_pooled) / vv
        |      AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS qh
        |  FROM st CROSS JOIN p2)
        |SELECT k_studies,
        |  floor(d_pooled * 1e6 + 0.5) / 1e6 AS d_pooled,
        |  floor(se * 1e6 + 0.5) / 1e6 AS se,
        |  floor(d_pooled / se * 1e6 + 0.5) / 1e6 AS z_stat,
        |  floor(qh * 1e6 + 0.5) / 1e6 AS q_het,
        |  floor(greatest((qh - CAST(k_studies - 1 AS DOUBLE)) / qh, 0.0)
        |    * 1e6 + 0.5) / 1e6 AS i2
        |FROM q""".stripMargin,
    "q_cronbach_alpha" ->
      """WITH o AS (
        |  SELECT o_custkey, quarter(o_orderdate::DATE) AS qtr,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
        |  FROM orders),
        |subj AS (SELECT o_custkey,
        |    coalesce(sum(CASE WHEN qtr = 1 THEN pc END), 0)::BIGINT AS i1,
        |    coalesce(sum(CASE WHEN qtr = 2 THEN pc END), 0)::BIGINT AS i2,
        |    coalesce(sum(CASE WHEN qtr = 3 THEN pc END), 0)::BIGINT AS i3,
        |    coalesce(sum(CASE WHEN qtr = 4 THEN pc END), 0)::BIGINT AS i4
        |  FROM o GROUP BY 1),
        |s AS (SELECT count(*)::BIGINT AS n,
        |    sum(i1)::BIGINT AS s1, sum(CAST(i1 AS HUGEINT) * i1) AS q1,
        |    sum(i2)::BIGINT AS s2, sum(CAST(i2 AS HUGEINT) * i2) AS q2,
        |    sum(i3)::BIGINT AS s3, sum(CAST(i3 AS HUGEINT) * i3) AS q3,
        |    sum(i4)::BIGINT AS s4, sum(CAST(i4 AS HUGEINT) * i4) AS q4,
        |    sum(i1 + i2 + i3 + i4)::BIGINT AS st,
        |    sum(CAST(i1 + i2 + i3 + i4 AS HUGEINT) * (i1 + i2 + i3 + i4)) AS qt
        |  FROM subj),
        |v AS (SELECT n,
        |    CAST(n * q1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    + CAST(n * q2 - CAST(s2 AS HUGEINT) * s2 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    + CAST(n * q3 - CAST(s3 AS HUGEINT) * s3 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    + CAST(n * q4 - CAST(s4 AS HUGEINT) * s4 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS siv,
        |    CAST(n * qt - CAST(st AS HUGEINT) * st AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS tv
        |  FROM s)
        |SELECT CAST(4 AS BIGINT) AS k_items, n AS n_subjects,
        |  CASE WHEN siv / 10000.0 < 9e12
        |    THEN floor(siv / 10000.0 * 1e6 + 0.5) / 1e6
        |    ELSE siv / 10000.0 END AS sum_item_var,
        |  CASE WHEN tv / 10000.0 < 9e12
        |    THEN floor(tv / 10000.0 * 1e6 + 0.5) / 1e6
        |    ELSE tv / 10000.0 END AS total_var,
        |  floor(4.0 / 3.0 * (1.0 - siv / tv) * 1e6 + 0.5) / 1e6 AS alpha
        |FROM v""".stripMargin,
    "q_temperature_mix" ->
      """WITH ns AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n_tokens)::BIGINT AS n_c FROM ns),
        |scored AS (SELECT source, n_tokens,
        |    CAST(n_tokens AS DOUBLE) / CAST(n_c AS DOUBLE) AS p,
        |    sqrt(CAST(n_tokens AS DOUBLE) / CAST(n_c AS DOUBLE)) AS sq
        |  FROM ns CROSS JOIN tot),
        |z AS (SELECT CAST(CAST(sum(CAST(sq AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS z
        |  FROM scored)
        |SELECT source, n_tokens,
        |  floor(p * 1e6 + 0.5) / 1e6 AS share,
        |  floor(sq / z * 1e6 + 0.5) / 1e6 AS weight,
        |  floor(sq / z / p * 1e6 + 0.5) / 1e6 AS boost
        |FROM scored CROSS JOIN z ORDER BY source""".stripMargin,
    "q_gini_token" ->
      """WITH cnt AS (
        |  SELECT source, tok, count(*)::BIGINT AS c FROM (
        |    SELECT source, unnest(string_split(trim(text), ' ')) AS tok
        |    FROM documents) GROUP BY 1, 2),
        |rk AS (SELECT source, c,
        |    row_number() OVER (PARTITION BY source ORDER BY c, tok) AS i
        |  FROM cnt)
        |SELECT source, count(*)::BIGINT AS vocab, sum(c)::BIGINT AS n_tokens,
        |  floor((2.0 * CAST(sum(CAST(i * c AS HUGEINT)) AS DOUBLE)
        |    / CAST(count(*) * sum(c) AS DOUBLE)
        |    - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS gini
        |FROM rk GROUP BY source ORDER BY source""".stripMargin,
    "q_js_divergence" ->
      """WITH st AS (SELECT source, tok, count(*)::BIGINT AS cs FROM (
        |    SELECT source, unnest(string_split(trim(text), ' ')) AS tok
        |    FROM documents) GROUP BY 1, 2),
        |ct AS (SELECT tok, sum(cs)::BIGINT AS cc FROM st GROUP BY 1),
        |ns AS (SELECT source, sum(cs)::BIGINT AS n_s FROM st GROUP BY 1),
        |nc AS (SELECT sum(cs)::BIGINT AS n_c FROM st),
        |dense AS (SELECT s.source, s.n_s, v.tok, v.cc, nc.n_c,
        |    coalesce(f.cs, 0)::BIGINT AS cs
        |  FROM ns s CROSS JOIN ct v CROSS JOIN nc
        |  LEFT JOIN st f ON f.source = s.source AND f.tok = v.tok),
        |terms AS (SELECT source, n_s,
        |  CAST((CASE WHEN cs > 0 THEN
        |      (CAST(cs AS DOUBLE) / CAST(n_s AS DOUBLE))
        |      * ln((CAST(cs AS DOUBLE) / CAST(n_s AS DOUBLE))
        |        / ((CAST(cs AS DOUBLE) / CAST(n_s AS DOUBLE)
        |          + CAST(cc AS DOUBLE) / CAST(n_c AS DOUBLE)) / 2.0))
        |    ELSE 0.0 END
        |    + (CAST(cc AS DOUBLE) / CAST(n_c AS DOUBLE))
        |      * ln((CAST(cc AS DOUBLE) / CAST(n_c AS DOUBLE))
        |        / ((CAST(cs AS DOUBLE) / CAST(n_s AS DOUBLE)
        |          + CAST(cc AS DOUBLE) / CAST(n_c AS DOUBLE)) / 2.0))) / 2.0
        |    AS DECIMAL(38,12)) AS ht
        |  FROM dense)
        |SELECT source, max(n_s) AS n_tokens,
        |  floor(CAST(sum(ht) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS js
        |FROM terms GROUP BY 1 ORDER BY source""".stripMargin,
    "q_hellinger" ->
      """WITH st AS (SELECT source, tok, count(*)::BIGINT AS cs FROM (
        |    SELECT source, unnest(string_split(trim(text), ' ')) AS tok
        |    FROM documents) GROUP BY 1, 2),
        |ct AS (SELECT tok, sum(cs)::BIGINT AS cc FROM st GROUP BY 1),
        |ns AS (SELECT source, sum(cs)::BIGINT AS n_s FROM st GROUP BY 1),
        |nc AS (SELECT sum(cs)::BIGINT AS n_c FROM st)
        |SELECT source, max(n_s) AS n_tokens, count(*)::BIGINT AS vocab,
        |  floor(sqrt(greatest(1.0 - CAST(CAST(sum(CAST(sqrt(
        |    (CAST(cs AS DOUBLE) / CAST(n_s AS DOUBLE))
        |    * (CAST(cc AS DOUBLE) / CAST(n_c AS DOUBLE)))
        |    AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) / 1e6
        |    AS hellinger
        |FROM st JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN nc
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_krippendorff" ->
      s"""WITH li AS (
         |$langIdOracle
         |),
         |sm AS (
         |  SELECT source, lang AS lang_src FROM (
         |    SELECT source, lang, row_number() OVER (
         |      PARTITION BY source ORDER BY n DESC, lang ASC) AS rn
         |    FROM (SELECT source, lang, count(*)::BIGINT AS n
         |          FROM documents GROUP BY 1, 2) g) t
         |  WHERE rn = 1),
         |r AS (
         |  SELECT d.doc_id, unnest([d.lang, li.lang_detected, sm.lang_src]) AS cat
         |  FROM documents d
         |  JOIN li ON li.doc_id = d.doc_id
         |  JOIN sm ON sm.source = d.source),
         |muc AS (SELECT doc_id, cat, count(*)::BIGINT AS m FROM r GROUP BY 1, 2),
         |obs AS (SELECT sum(9 - sm2)::BIGINT AS d2, count(*)::BIGINT AS n_units
         |  FROM (SELECT doc_id, sum(m * m)::BIGINT AS sm2 FROM muc GROUP BY 1) u),
         |marg AS (SELECT sum(nc)::BIGINT AS n, sum(nc * nc)::BIGINT AS snc2
         |  FROM (SELECT cat, sum(m)::BIGINT AS nc FROM muc GROUP BY 1) m)
         |SELECT n_units, n AS n_ratings,
         |  floor(CAST(d2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS d_obs,
         |  floor(CAST(n * n - snc2 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS d_exp,
         |  floor((1.0 - CAST(d2 AS DOUBLE) * CAST(n - 1 AS DOUBLE)
         |    / (2.0 * CAST(n * n - snc2 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS alpha
         |FROM obs CROSS JOIN marg""".stripMargin,
    "q_ece" ->
      s"""WITH qs AS (
         |$qualityScoreOracle
         |),
         |b2 AS (
         |  SELECT doc_id,
         |    len(string_split(trim(text), ' '))::INTEGER AS nt,
         |    length(replace(text, ' ', ''))::DOUBLE
         |      / len(string_split(trim(text), ' ')) AS mwl,
         |    len(list_filter(string_split(trim(text), ' '),
         |      t -> t IN ('the', 'a', 'of', 'and', 'is')))::INTEGER AS stop_hits
         |  FROM documents),
         |hist AS (SELECT doc_id, max(c) AS top_c, count(*) AS n_distinct FROM (
         |    SELECT doc_id, tok, count(*) AS c FROM (
         |      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
         |      FROM documents) GROUP BY 1, 2) GROUP BY 1),
         |fl AS (SELECT b2.doc_id,
         |    CASE WHEN (nt >= 30 AND nt <= 90) AND (mwl >= 4.0 AND mwl <= 4.9)
         |      AND coalesce(CAST(top_c AS DOUBLE) / nt <= 0.15, false)
         |      AND coalesce(1.0 - CAST(n_distinct AS DOUBLE) / nt <= 0.6, false)
         |      AND (stop_hits >= 1) THEN 1 ELSE 0 END AS ok
         |  FROM b2 LEFT JOIN hist USING (doc_id)),
         |g AS (
         |  SELECT least(CAST(floor(quality * 1e6 + 0.5) AS BIGINT) * 10 // 1000000, 9) AS bin,
         |    quality AS conf, ok
         |  FROM qs JOIN fl USING (doc_id)),
         |t AS (SELECT count(*)::BIGINT AS n_total FROM g),
         |bins AS (
         |  SELECT bin, count(*)::BIGINT AS n_docs, sum(ok)::BIGINT AS n_correct,
         |    CAST(CAST(sum(CAST(conf AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sconf
         |  FROM g GROUP BY 1)
         |SELECT bin, n_docs, n_correct,
         |  floor(sconf / CAST(n_docs AS DOUBLE) * 1e6 + 0.5) / 1e6 AS avg_conf,
         |  floor(CAST(n_correct AS DOUBLE) / CAST(n_docs AS DOUBLE) * 1e6 + 0.5) / 1e6 AS accuracy,
         |  floor(abs(sconf / CAST(n_docs AS DOUBLE)
         |    - CAST(n_correct AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS gap,
         |  floor(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)
         |    * abs(sconf / CAST(n_docs AS DOUBLE)
         |      - CAST(n_correct AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ece_contrib
         |FROM bins CROSS JOIN t ORDER BY bin""".stripMargin,
    "q_cohens_kappa" ->
      s"""WITH li AS (
         |$langIdOracle
         |),
         |cells AS (SELECT d.lang, li.lang_detected, count(*)::BIGINT AS nij
         |  FROM li JOIN documents d ON d.doc_id = li.doc_id GROUP BY 1, 2),
         |rt AS (SELECT lang, sum(nij)::BIGINT AS nr FROM cells GROUP BY 1),
         |ctm AS (SELECT lang_detected, sum(nij)::BIGINT AS ncol
         |        FROM cells GROUP BY 1),
         |tot AS (SELECT sum(nij)::BIGINT AS n,
         |    sum(CASE WHEN lang = lang_detected THEN nij ELSE 0 END)::BIGINT
         |      AS agree FROM cells),
         |pe AS (SELECT sum(nr * ncol)::BIGINT AS pe_num
         |  FROM rt JOIN ctm ON rt.lang = ctm.lang_detected)
         |SELECT n AS n_docs, agree AS n_agree,
         |  floor(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
         |    AS po,
         |  floor(CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE) * 1e6 + 0.5)
         |    / 1e6 AS pe,
         |  floor((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
         |    - CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE))
         |    / (1.0 - CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE))
         |    * 1e6 + 0.5) / 1e6 AS kappa
         |FROM tot CROSS JOIN pe""".stripMargin,
    "copy_computed" ->
      """SELECT count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(c_acctbal * 2 AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_bal_x2,
        |  CAST(sum(length(c_name)) AS BIGINT) AS sum_name_len,
        |  'c_bal_x2:DOUBLE;c_name_len:INTEGER' AS computed_cols
        |FROM customer""".stripMargin,
    "q_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |s AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
        |    sum(CAST(gap_us AS HUGEINT)) AS sg,
        |    sum(CAST(gap_us AS HUGEINT) * gap_us) AS qg
        |  FROM g WHERE gap_us IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps,
        |  floor(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) / 1000000.0
        |    * 1e6 + 0.5) / 1e6 AS mean_gap_s,
        |  floor(sqrt(CAST(n_gaps * qg - sg * sg AS DOUBLE))
        |    / CAST(n_gaps AS DOUBLE) / 1000000.0
        |    * 1e6 + 0.5) / 1e6 AS sd_gap_s,
        |  floor(sqrt(CAST(n_gaps * qg - sg * sg AS DOUBLE))
        |    / CAST(n_gaps AS DOUBLE)
        |    / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS cv,
        |  CASE WHEN sqrt(CAST(n_gaps * qg - sg * sg AS DOUBLE))
        |      / CAST(n_gaps AS DOUBLE)
        |      / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) > 1.5
        |    THEN 'bursty'
        |    WHEN sqrt(CAST(n_gaps * qg - sg * sg AS DOUBLE))
        |      / CAST(n_gaps AS DOUBLE)
        |      / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) < 0.5
        |    THEN 'scheduled' ELSE 'poisson_like' END AS regime
        |FROM s ORDER BY event_type""".stripMargin,
    "q_bartlett" ->
      """WITH o AS (
        |  SELECT c.c_mktsegment AS seg,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (
        |  SELECT seg, count(*)::BIGINT AS n,
        |    sum(CAST(yc AS HUGEINT)) AS s1, sum(CAST(yc AS HUGEINT) * yc) AS s2
        |  FROM o GROUP BY 1 HAVING count(*) >= 2),
        |v AS (
        |  SELECT seg, n,
        |    CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS s2i
        |  FROM g),
        |a AS (
        |  SELECT count(*)::BIGINT AS k_groups, CAST(sum(n) AS BIGINT) AS n_total,
        |    CAST(CAST(sum(CAST(CAST(n - 1 AS DOUBLE) * ln(s2i) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sum_ln,
        |    CAST(CAST(sum(CAST(CAST(n - 1 AS DOUBLE) * s2i AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sum_ss,
        |    CAST(CAST(sum(CAST(1.0 / CAST(n - 1 AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sum_inv
        |  FROM v)
        |SELECT k_groups, n_total,
        |  floor((CAST(n_total - k_groups AS DOUBLE)
        |      * ln(sum_ss / CAST(n_total - k_groups AS DOUBLE)) - sum_ln)
        |    / (1.0 + (sum_inv - 1.0 / CAST(n_total - k_groups AS DOUBLE))
        |      / (3.0 * CAST(k_groups - 1 AS DOUBLE)))
        |    * 1e6 + 0.5) / 1e6 AS bartlett_chi2,
        |  CAST(k_groups - 1 AS BIGINT) AS df
        |FROM a""".stripMargin,
    "q_cliff_delta" ->
      """WITH v AS (
        |  SELECT c.c_mktsegment AS seg, CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |h AS (SELECT v,
        |  CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM v GROUP BY 1),
        |c AS (SELECT v, ca, cb,
        |  CAST(coalesce(sum(cb) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb_le
        |  FROM h),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM h),
        |a AS (SELECT max(na) AS na, max(nb) AS nb,
        |    sum(CAST(ca AS DECIMAL(19,0)) * CAST(cumb_le AS DECIMAL(19,0))) AS wins_a,
        |    sum(CAST(ca AS DECIMAL(19,0)) * CAST(nb - cumb_le - cb AS DECIMAL(19,0))) AS wins_b
        |  FROM c CROSS JOIN t)
        |SELECT na, nb, CAST(wins_a AS BIGINT) AS wins_a, CAST(wins_b AS BIGINT) AS wins_b,
        |  floor(CAST(CAST(wins_a - wins_b AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(na AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0)) AS VARCHAR) AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS cliff_delta
        |FROM a""".stripMargin,
    "q_lorenz" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        |  FROM orders GROUP BY 1),
        |r AS (SELECT o_custkey, xc,
        |  CAST(row_number() OVER (ORDER BY xc, o_custkey) AS BIGINT) AS i,
        |  CAST(sum(xc) OVER (ORDER BY xc, o_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumx
        |  FROM rev),
        |t AS (SELECT max(i) AS n, max(cumx) AS sx FROM r),
        |d AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS decile)
        |SELECT d.decile, t.n AS n_customers,
        |  CAST((t.n * d.decile) // 10 AS BIGINT) AS rank_cut,
        |  floor(CAST(CAST(r.cumx AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(t.sx AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS cum_revenue_share
        |FROM d CROSS JOIN t JOIN r ON r.i = (t.n * d.decile) // 10
        |ORDER BY d.decile""".stripMargin,
    "q_bot_flags" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS t_us,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |u AS (SELECT user_id, count(*)::BIGINT AS n_events,
        |    CAST(max(t_us) - min(t_us) AS BIGINT) AS span_us,
        |    CAST(min(gap_us) AS BIGINT) AS min_gap_us
        |  FROM g GROUP BY 1 HAVING count(*) >= 2)
        |SELECT user_id, n_events,
        |  floor(CAST(span_us AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS span_s,
        |  floor(CAST(span_us AS DOUBLE) / CAST(n_events - 1 AS DOUBLE) / 1e6
        |    * 1e6 + 0.5) / 1e6 AS mean_gap_s,
        |  floor(CAST(min_gap_us AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS min_gap_s,
        |  (n_events >= 15 AND min_gap_us < 2000000) AS is_bot
        |FROM u
        |ORDER BY floor(CAST(min_gap_us AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 ASC,
        |  n_events DESC, user_id ASC
        |LIMIT 10""".stripMargin,
    "q_stopword_density" ->
      """WITH d AS (SELECT source, string_split(trim(text), ' ') AS toks FROM documents),
        |m AS (SELECT source, len(toks)::BIGINT AS n_tok,
        |    len(list_filter(toks, t -> t IN ('join','hash','row','batch','scan')))::BIGINT AS n_stop
        |  FROM d)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_stop) AS BIGINT) AS n_stopwords,
        |  floor(CAST(sum(n_stop) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS density,
        |  floor(max(CAST(n_stop AS DOUBLE) / n_tok) * 1e6 + 0.5) / 1e6
        |    AS max_doc_density
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    "q_shingle_compression" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
        |idx AS (
        |  SELECT doc_id, source, w, unnest(generate_series(1, len(w) - 2)) AS i
        |  FROM toks WHERE len(w) >= 3),
        |shl AS (
        |  SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM idx)
        |SELECT source, count(*)::BIGINT AS n_shingles,
        |  count(DISTINCT g)::BIGINT AS n_distinct,
        |  floor((1.0 - CAST(count(DISTINCT g) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS redundancy
        |FROM shl GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_canonical" ->
      s"""$dedupClusterCtes,
        |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        |qs AS ($qualityScoreOracle),
        |sized AS (SELECT cluster_id, count(*)::BIGINT AS n_members
        |  FROM cl GROUP BY 1 HAVING count(*) >= 2),
        |j AS (SELECT cl.cluster_id, sized.n_members, cl.doc_id, qs.quality,
        |    row_number() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY qs.quality DESC, cl.doc_id ASC) AS rn
        |  FROM cl JOIN sized USING (cluster_id) JOIN qs ON qs.doc_id = cl.doc_id)
        |SELECT cluster_id, n_members, doc_id AS keep_id, quality AS keep_quality
        |FROM j WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "q_jackknife" ->
      """WITH g AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS m, count(*)::BIGINT AS ng,
        |    sum(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS sg
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS s,
        |  count(*)::BIGINT AS gcnt FROM g),
        |th AS (SELECT gcnt, n, s,
        |    CAST(floor(CAST(s - sg AS DOUBLE) / (CAST(n - ng AS DOUBLE) * 100.0)
        |      * 1e6 + 0.5) AS BIGINT) AS thi
        |  FROM g CROSS JOIN tot),
        |a AS (SELECT max(gcnt) AS g_groups, max(n) AS n_rows,
        |    CAST(max(s) AS DOUBLE) / (CAST(max(n) AS DOUBLE) * 100.0) AS mean_full,
        |    CAST(CAST(sum(CAST(thi AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sthi,
        |    CAST(CAST(sum(CAST(thi AS DECIMAL(38,0)) * CAST(thi AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sthi2
        |  FROM th)
        |SELECT g_groups, n_rows,
        |  floor(mean_full * 1e6 + 0.5) / 1e6 AS mean_full,
        |  floor(sthi / 1e6 / g_groups * 1e6 + 0.5) / 1e6 AS theta_bar,
        |  floor(sqrt(greatest(0.0, (g_groups - 1.0) / g_groups
        |    * (sthi2 / 1e12 - (sthi / 1e6) * (sthi / 1e6) / g_groups)))
        |    * 1e6 + 0.5) / 1e6 AS se_jack
        |FROM a""".stripMargin,
    "q_fdr_bh" ->
      """WITH pn AS (
        |  SELECT n_name, count(*)::BIGINT AS n1,
        |    sum(CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END)::BIGINT AS k1
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n1) AS BIGINT) AS nn, CAST(sum(k1) AS BIGINT) AS kk,
        |  count(*)::BIGINT AS m FROM pn),
        |z AS (
        |  SELECT n_name, n1, k1, m,
        |    (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(kk - k1 AS DOUBLE) / CAST(nn - n1 AS DOUBLE))
        |    / sqrt((CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * (1.0 - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(nn - n1 AS DOUBLE))) AS zs
        |  FROM pn CROSS JOIN tot),
        |p AS (
        |  SELECT n_name, n1, k1, m, zs,
        |    floor(2.0 / (1.0 + exp(1.702 * abs(zs))) * 1e6 + 0.5) / 1e6 AS p6
        |  FROM z),
        |r AS (
        |  SELECT *, CAST(floor(p6 * 1e6 + 0.5) AS BIGINT) AS p_int,
        |    row_number() OVER (ORDER BY CAST(floor(p6 * 1e6 + 0.5) AS BIGINT), n_name) AS rk
        |  FROM p),
        |c AS (SELECT coalesce(max(CASE WHEN p_int * m <= 100000 * rk THEN rk END), 0) AS crit FROM r)
        |SELECT n_name AS nation, n1 AS n_orders, k1 AS n_high,
        |  floor(zs * 1e6 + 0.5) / 1e6 AS z, p6 AS p_approx,
        |  CAST(rk AS BIGINT) AS p_rank, (rk <= crit) AS discovered
        |FROM r CROSS JOIN c
        |ORDER BY p_rank""".stripMargin,
    "q_permutation_test" ->
      """WITH base AS (
        |  SELECT o_orderkey, c_mktsegment AS seg,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS xc
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |obs AS (
        |  SELECT sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)::BIGINT AS na_o,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END)::BIGINT AS nb_o,
        |    sum(CASE WHEN seg = 'BUILDING' THEN CAST(xc AS DECIMAL(38,0)) ELSE 0 END) AS sa_o,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN CAST(xc AS DECIMAL(38,0)) ELSE 0 END) AS sb_o
        |  FROM base),
        |obsd AS (SELECT na_o, nb_o,
        |  CAST(sa_o AS DOUBLE) / (CAST(na_o AS DOUBLE) * 100.0)
        |    - CAST(sb_o AS DOUBLE) / (CAST(nb_o AS DOUBLE) * 100.0) AS d_obs FROM obs),
        |hs AS (SELECT xc, grp, sha256(concat(CAST(o_orderkey AS VARCHAR), '|',
        |         CAST(grp AS VARCHAR))) AS h
        |       FROM (SELECT o_orderkey, xc, unnest(generate_series(0, 5)) AS grp FROM base)),
        |sl AS (SELECT xc, grp * 16 + slot + 1 AS rep,
        |         substr(h, slot * 4 + 1, 4) < '8000' AS toA
        |       FROM hs CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS slot) s
        |       WHERE grp * 16 + slot + 1 <= 96),
        |pr AS (
        |  SELECT rep,
        |    sum(CASE WHEN toA THEN 1 ELSE 0 END)::BIGINT AS na,
        |    sum(CASE WHEN NOT toA THEN 1 ELSE 0 END)::BIGINT AS nb,
        |    sum(CASE WHEN toA THEN CAST(xc AS DECIMAL(38,0)) ELSE 0 END) AS sa,
        |    sum(CASE WHEN NOT toA THEN CAST(xc AS DECIMAL(38,0)) ELSE 0 END) AS sb
        |  FROM sl GROUP BY 1),
        |prd AS (SELECT rep,
        |  CAST(sa AS DOUBLE) / (CAST(na AS DOUBLE) * 100.0)
        |    - CAST(sb AS DOUBLE) / (CAST(nb AS DOUBLE) * 100.0) AS d_b FROM pr)
        |SELECT max(na_o) AS n_a, max(nb_o) AS n_b,
        |  floor(max(d_obs) * 1e6 + 0.5) / 1e6 AS d_obs,
        |  count(*)::BIGINT AS n_perm,
        |  sum(CASE WHEN abs(d_b) >= abs(d_obs) THEN 1 ELSE 0 END)::BIGINT AS n_extreme,
        |  floor((CAST(sum(CASE WHEN abs(d_b) >= abs(d_obs) THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
        |    / (CAST(count(*) AS DOUBLE) + 1.0) * 1e6 + 0.5) / 1e6 AS p_perm
        |FROM prd CROSS JOIN obsd""".stripMargin,
    "q_bpe_pairs" ->
      """WITH p AS (
        |  SELECT substr(text, i, 2) AS pair
        |  FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
        |        FROM documents WHERE length(text) >= 2)),
        |c AS (SELECT pair, count(*)::BIGINT AS n FROM p GROUP BY 1),
        |r AS (SELECT pair, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS INTEGER) AS rk FROM c)
        |SELECT rk, pair, n FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,
    "q_k_anonymity" ->
      """WITH cls AS (
        |  SELECT source, lang, CAST(floor(n_chars / 100) * 100 AS BIGINT) AS len_bucket,
        |    count(*)::BIGINT AS cls
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT source, count(*)::BIGINT AS n_classes,
        |  CAST(sum(cls) AS BIGINT) AS n_docs,
        |  sum(CASE WHEN cls < 5 THEN 1 ELSE 0 END)::BIGINT AS risky_classes,
        |  CAST(sum(CASE WHEN cls < 5 THEN cls ELSE 0 END) AS BIGINT) AS docs_at_risk,
        |  floor(CAST(sum(CASE WHEN cls < 5 THEN cls ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(cls) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS risk_share
        |FROM cls GROUP BY source ORDER BY source""".stripMargin,
  )
}
