package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class TableCopySpec extends AnyFunSuite with SparkFixture {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-copy-test").toString

  test("copyTable roundtrips rows and schema exactly") {
    val dest = tmpDir()
    val n = TableCopy.copyTable(spark, sf, dest, "nation")
    assert(n == 25)
    val src = Tables.load(spark, sf, "nation")
    val back = spark.read.parquet(s"$dest/nation.parquet")
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("truncate mode replaces, append mode accumulates") {
    val dest = tmpDir()
    TableCopy.copyTable(spark, sf, dest, "region", TableCopy.Truncate)
    TableCopy.copyTable(spark, sf, dest, "region", TableCopy.Truncate)
    assert(spark.read.parquet(s"$dest/region.parquet").count() == 5)
    TableCopy.copyTable(spark, sf, dest, "region", TableCopy.Append)
    assert(spark.read.parquet(s"$dest/region.parquet").count() == 10)
  }

  test("copyTables honors include/exclude and reports a manifest") {
    val dest = tmpDir()
    val manifest = TableCopy.copyTables(spark, sf, dest,
      include = Seq("region", "nation", "supplier"), exclude = Seq("supplier"))
    val rows = manifest.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("nation" -> 25L, "region" -> 5L))
    assert(manifest.collect().forall(_.getString(2) == "ok"))
  }

  test("copyTables isolates per-table failures: one broken table, rest still copy") {
    val dest = tmpDir()
    val rows = TableCopy.copyTables(spark, sf, dest,
      include = Seq("region", "no_such_table", "nation"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.collect { case (t, n, "ok") => t -> n }.toMap ==
      Map("nation" -> 25L, "region" -> 5L))
    val broken = rows.find(_._1 == "no_such_table").get
    assert(broken._2 == -1L && broken._3.startsWith("error:"), broken)
    // The healthy tables actually landed on disk.
    assert(spark.read.parquet(s"$dest/nation.parquet").count() == 25)
  }

  test("copyTables resumeFrom skips manifest-ok tables and copies only the rest") {
    val dest = tmpDir()
    // Run 1: two tables land ok, one has no source files and fails.
    val first = TableCopy.copyTables(spark, sf, dest,
      include = Seq("region", "nation", "missing_table"))
    val firstRows = first.collect().map(r => (r.getString(0), r.getString(2)))
    assert(firstRows.count(_._2 == "ok") == 2)
    assert(firstRows.find(_._1 == "missing_table").get._2.startsWith("error:"))
    // Prove the resume does NOT recopy ok tables: remove region's landed
    // files — a recopy would re-create them, a skip leaves them absent.
    val regionPath = new java.io.File(s"$dest/region.parquet")
    regionPath.listFiles().foreach(_.delete()); regionPath.delete()
    // Run 2: the "fixed" set (supplier stands in for the repaired table).
    val resumed = TableCopy.copyTables(spark, sf, dest,
      include = Seq("region", "nation", "supplier"), resumeFrom = Some(first))
    val rows = resumed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows.filter(_._3 == "skipped").map(t => t._1 -> t._2).toMap ==
      Map("region" -> 5L, "nation" -> 25L))
    assert(rows.find(_._1 == "supplier").get._3 == "ok")
    assert(!regionPath.exists(), "skipped table must not be recopied")
    assert(spark.read.parquet(s"$dest/supplier.parquet").count() > 0)
  }

  test("copyTables resumeFrom with parallelism > 1 skips ok tables across concurrent copies") {
    val dest = tmpDir()
    // Run 1 (sequential): two tables land ok, one fails.
    val first = TableCopy.copyTables(spark, sf, dest,
      include = Seq("region", "nation", "missing_table"))
    assert(first.collect().count(_.getString(2) == "ok") == 2)
    // Remove region's landed files: a recopy would re-create them, a
    // skip leaves them absent — same proof as the sequential resume test,
    // now under a thread pool where skips and copies interleave.
    val regionPath = new java.io.File(s"$dest/region.parquet")
    regionPath.listFiles().foreach(_.delete()); regionPath.delete()
    val resumed = TableCopy.copyTables(spark, sf, dest,
      include = Seq("region", "nation", "supplier", "customer"),
      parallelism = 3, resumeFrom = Some(first))
    val rows = resumed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows.filter(_._3 == "skipped").map(t => t._1 -> t._2).toMap ==
      Map("region" -> 5L, "nation" -> 25L))
    assert(rows.filter(_._3 == "ok").map(_._1).toSet ==
      Set("supplier", "customer"))
    assert(!regionPath.exists(), "skipped table must not be recopied")
    assert(spark.read.parquet(s"$dest/supplier.parquet").count() > 0)
    assert(spark.read.parquet(s"$dest/customer.parquet").count() > 0)
  }

  test("SqlDialect: URL dispatch, per-dialect upsert SQL, and benign states") {
    import TableCopy.SqlDialect
    assert(SqlDialect.forUrl("jdbc:derby:memory:x") == SqlDialect.Derby)
    assert(SqlDialect.forUrl("jdbc:sqlserver://h:1433;db=x") == SqlDialect.SqlServer)
    assert(SqlDialect.forUrl("jdbc:postgresql://h/x") == SqlDialect.Postgres)
    assert(SqlDialect.forUrl("jdbc:mysql://h/x") == SqlDialect.Ansi)

    val keys = Seq("id"); val cols = Seq("id", "v", "w")
    val derby = SqlDialect.Derby.mergeSql("t", "t_stage", keys, cols)
    assert(derby.startsWith("MERGE INTO t d USING t_stage s ON d.\"id\" = s.\"id\""))
    assert(derby.contains("WHEN MATCHED THEN UPDATE SET \"v\" = s.\"v\", \"w\" = s.\"w\""))
    assert(derby.contains(
      "WHEN NOT MATCHED THEN INSERT (\"id\", \"v\", \"w\")"))
    assert(!derby.endsWith(";"))

    // SQL Server: same ANSI MERGE, terminated (T-SQL requires it).
    val mssql = SqlDialect.SqlServer.mergeSql("t", "t_stage", keys, cols)
    assert(mssql.endsWith(";") && mssql.stripSuffix(";") == derby)

    // Postgres: INSERT .. ON CONFLICT with EXCLUDED pseudo-row, and the
    // key index must be UNIQUE (ON CONFLICT needs a unique arbiter).
    val pg = SqlDialect.Postgres.mergeSql("t", "t_stage", keys, cols)
    assert(pg.startsWith("INSERT INTO t (\"id\", \"v\", \"w\")"))
    assert(pg.contains("ON CONFLICT (\"id\") DO UPDATE SET " +
      "\"v\" = EXCLUDED.\"v\", \"w\" = EXCLUDED.\"w\""))
    assert(SqlDialect.Postgres.keyIndexSql("t", "t_kidx", keys)
      .startsWith("CREATE UNIQUE INDEX"))
    assert(SqlDialect.Derby.keyIndexSql("t", "t_kidx", keys)
      .startsWith("CREATE INDEX"))

    // Benign-state vocabulary is per-backend, not Derby's everywhere.
    assert(SqlDialect.Derby.missingTableStates("42Y55") &&
      SqlDialect.Derby.indexExistsStates("X0Y32"))
    assert(SqlDialect.Postgres.missingTableStates("42P01") &&
      SqlDialect.Postgres.indexExistsStates("42P07"))
    assert(SqlDialect.SqlServer.missingTableStates("S0002"))
    assert(SqlDialect.Ansi.missingTableStates.isEmpty)

    // A Derby-URL store resolves its dialect without an override.
    assert(TableCopy.JdbcStore("jdbc:derby:memory:d;create=true").dialect ==
      SqlDialect.Derby)
  }

  test("SqlDialect golden SQL: mixed-case + spaced identifiers survive every dialect verbatim") {
    import TableCopy.SqlDialect
    // Identifiers that break every unquoted code path: mixed case AND a
    // space. The generated SQL must quote each one verbatim — a backend
    // that received them unquoted would case-fold or reject them.
    val keys = Seq("Order Id"); val cols = Seq("Order Id", "netValue", "Status")
    val derby = SqlDialect.Derby.mergeSql("\"Orders\"", "\"Orders_stage\"", keys, cols)
    assert(derby ==
      """MERGE INTO "Orders" d USING "Orders_stage" s ON d."Order Id" = s."Order Id"
        |WHEN MATCHED THEN UPDATE SET "netValue" = s."netValue", "Status" = s."Status"
        |WHEN NOT MATCHED THEN INSERT ("Order Id", "netValue", "Status")
        |VALUES (s."Order Id", s."netValue", s."Status")""".stripMargin)
    assert(SqlDialect.SqlServer.mergeSql("\"Orders\"", "\"Orders_stage\"", keys, cols)
      == derby + ";")
    assert(SqlDialect.Ansi.mergeSql("\"Orders\"", "\"Orders_stage\"", keys, cols)
      == derby)
    assert(SqlDialect.Postgres.mergeSql("\"Orders\"", "\"Orders_stage\"", keys, cols) ==
      """INSERT INTO "Orders" ("Order Id", "netValue", "Status")
        |SELECT "Order Id", "netValue", "Status" FROM "Orders_stage"
        |ON CONFLICT ("Order Id") DO UPDATE SET "netValue" = EXCLUDED."netValue", "Status" = EXCLUDED."Status"""".stripMargin)
    assert(SqlDialect.Derby.keyIndexSql("\"Orders\"", "oidx", keys) ==
      """CREATE INDEX oidx ON "Orders" ("Order Id")""")
    assert(SqlDialect.Postgres.keyIndexSql("\"Orders\"", "oidx", keys) ==
      """CREATE UNIQUE INDEX oidx ON "Orders" ("Order Id")""")
  }

  test("schemaManifest lists ordinal, canonical type, nullability, and JDBC DDL type") {
    val m = TableCopy.schemaManifest(spark, sf, Seq("nation")).collect()
    assert(m.map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getString(5))).toSeq ==
      Seq((1, "n_nationkey", "int", true, "INTEGER"),
        (2, "n_name", "string", true, "VARCHAR(4000)"),
        (3, "n_regionkey", "int", true, "INTEGER")))
    assert(TableCopy.columnTypesDdl(Tables.load(spark, sf, "nation").schema) ==
      "n_nationkey INTEGER, n_name VARCHAR(4000), n_regionkey INTEGER")
  }

  test("FileStore roundtrips csv and json with the replicated schema") {
    val src = TableCopy.ParquetStore(sf)
    val schema = src.read(spark, "nation").schema
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("n_nationkey").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    val expected = norm(src.read(spark, "nation"))
    for (fmt <- Seq("csv", "json")) {
      val store = TableCopy.FileStore(tmpDir(), fmt, schema = Some(schema))
      assert(TableCopy.copy(spark, src, store, "nation", TableCopy.Truncate) == 25)
      assert(norm(store.read(spark, "nation")) == expected, fmt)
      assert(store.list(spark) == Seq("nation"), fmt)
    }
    // ORC is self-describing: no schema injection, same Store surface.
    val orc = TableCopy.FileStore(tmpDir(), "orc")
    assert(TableCopy.copy(spark, src, orc, "nation", TableCopy.Truncate) == 25)
    assert(norm(orc.read(spark, "nation")) == expected, "orc")
    assert(orc.read(spark, "nation").schema == schema, "orc schema")
  }

  // --- Real JDBC destination/source: embedded Derby (the JDBC driver that
  // ships on the Spark classpath). The same Store code drives any JDBC URL.

  private def derbyStore(): TableCopy.JdbcStore = TableCopy.JdbcStore(
    s"jdbc:derby:${tmpDir()}/db;create=true",
    Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))

  test("JDBC roundtrip: parquet -> Derby -> read back, rows and values exact") {
    val store = derbyStore()
    val n = TableCopy.copy(spark, TableCopy.ParquetStore(sf), store, "nation",
      TableCopy.Recreate)
    assert(n == 25)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("n_nationkey").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(norm(store.read(spark, "nation")) == norm(Tables.load(spark, sf, "nation")))
    assert(store.list(spark).contains("NATION")) // Derby upcases unquoted names
  }

  test("JDBC write modes: truncate keeps rows out, recreate drops DDL, append accumulates") {
    val store = derbyStore()
    val src = TableCopy.ParquetStore(sf)
    assert(TableCopy.copy(spark, src, store, "region", TableCopy.Recreate) == 5)
    assert(TableCopy.copy(spark, src, store, "region", TableCopy.Append) == 10)
    assert(TableCopy.copy(spark, src, store, "region", TableCopy.Truncate) == 5)
    assert(TableCopy.copy(spark, src, store, "region", TableCopy.Recreate) == 5)
  }

  test("copyTablesBetween replicates a table set into a live JDBC catalog") {
    val db = derbyStore()
    val m = TableCopy.copyTablesBetween(spark, TableCopy.ParquetStore(sf), db,
      include = Seq("region", "nation"), mode = TableCopy.Recreate)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(m.toSet == Set(("nation", 25L, "ok"), ("region", 5L, "ok")))
    // The destination's own JDBC metadata sees both tables.
    assert(Set("NATION", "REGION").subsetOf(db.list(spark).toSet))
  }

  test("CHECK constraints and column DEFAULTs are discovered from a live " +
    "source catalog and replicated onto the destination") {
    val src = derbyStore()
    // Build a real source table carrying a CHECK and two DEFAULTs, so the
    // copy exercises catalog DISCOVERY (SYS.SYSCHECKS + COLUMN_DEF), not a
    // metaOverride echo.
    val conn = java.sql.DriverManager.getConnection(src.url)
    try {
      conn.createStatement().executeUpdate(
        """CREATE TABLE items ("id" BIGINT NOT NULL, """ +
          """"grade" VARCHAR(4000) DEFAULT 'standard', """ +
          """"qty" INTEGER DEFAULT 1, """ +
          """PRIMARY KEY ("id"), """ +
          """CONSTRAINT items_qty_ck CHECK ("qty" >= 0))""")
      conn.createStatement().executeUpdate(
        """INSERT INTO items VALUES (1, 'premium', 5), (2, 'basic', 0)""")
    } finally conn.close()
    val m = src.meta(spark, "items")
    assert(m.checks == Seq("ITEMS_QTY_CK" -> "(\"qty\" >= 0)"))
    assert(m.defaults == Seq("grade" -> "'standard'", "qty" -> "1"))
    assert(m.primaryKey == Seq("id"))
    val dest = derbyStore()
    assert(TableCopy.copy(spark, src, dest, "items", TableCopy.Recreate,
      replicateMeta = true) == 2)
    // Destination catalog carries the replicated facts...
    val back = dest.meta(spark, "items")
    assert(back.checks == m.checks && back.defaults == m.defaults)
    // ...and the SEMANTICS landed: defaults fill omitted columns, the
    // check rejects violating rows.
    val dconn = java.sql.DriverManager.getConnection(dest.url)
    try {
      dconn.createStatement().executeUpdate(
        """INSERT INTO items ("id") VALUES (3)""")
      val rs = dconn.createStatement().executeQuery(
        """SELECT "grade", "qty" FROM items WHERE "id" = 3""")
      assert(rs.next() && rs.getString(1) == "standard" && rs.getInt(2) == 1)
      intercept[java.sql.SQLException] {
        dconn.createStatement().executeUpdate(
          """INSERT INTO items ("id", "qty") VALUES (4, -1)""")
      }
    } finally dconn.close()
  }

  test("whatIfCopy plans order, estimates, and exact DDL without writing") {
    val db = derbyStore()
    val metas = Map(
      "region" -> TableCopy.TableMeta(primaryKey = Seq("r_regionkey")),
      "nation" -> TableCopy.TableMeta(primaryKey = Seq("n_nationkey"),
        foreignKeys = Seq(("n_regionkey", "region", "r_regionkey"))))
    val plan = TableCopy.whatIfCopy(spark, TableCopy.ParquetStore(sf), db,
      metas, include = Seq("region", "nation")).collect()
    assert(db.list(spark).isEmpty, "dry run must not write")
    assert(plan.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "region"), (2L, "nation"))) // FK parent first
    assert(plan.forall(_.getString(2) == "create"))
    assert(plan.map(_.getLong(3)).toSeq == Seq(5L, 25L))
    assert(plan.forall(_.getString(5) == "planned"))
    // The previewed DDL is the DDL the real copy executes: running the
    // copy and reading the destination catalog back must agree with the
    // planned constraints.
    val nationDdl = plan(1).getString(4)
    assert(nationDdl.contains("PRIMARY KEY (\"n_nationkey\")"))
    assert(nationDdl.contains(
      "FOREIGN KEY (\"n_regionkey\") REFERENCES region (\"r_regionkey\")"))
    TableCopy.copyTablesWithSchema(spark, TableCopy.ParquetStore(sf), db,
      metas, include = Seq("region", "nation")).collect()
    val back = db.meta(spark, "nation")
    assert(back.primaryKey == Seq("n_nationkey"))
    assert(back.foreignKeys == Seq(("n_regionkey", "REGION", "r_regionkey")))
    // Re-plan against the now-populated destination: actions flip to
    // recreate, nothing else changes.
    val replan = TableCopy.whatIfCopy(spark, TableCopy.ParquetStore(sf), db,
      metas, include = Seq("region", "nation")).collect()
    assert(replan.forall(_.getString(2) == "recreate"))
  }

  test("JDBC batchSize knob plumbs through to the writer") {
    val store = derbyStore().copy(batchSize = 7)
    assert(TableCopy.copy(spark, TableCopy.ParquetStore(sf), store, "nation",
      TableCopy.Recreate) == 25)
    assert(store.read(spark, "nation").count() == 25)
  }

  test("JDBC partitioned read drives stride predicates as parallel chunk queries") {
    val base = derbyStore()
    TableCopy.copy(spark, TableCopy.ParquetStore(sf), base, "customer",
      TableCopy.Recreate)
    val expected = Tables.load(spark, sf, "customer").count()
    val partitioned = base.copy(numPartitions = 4, partitionColumn = Some("c_custkey"))
    val got = partitioned.read(spark, "customer")
    assert(got.rdd.getNumPartitions == 4) // one task per stride predicate
    assert(got.count() == expected)
    assert(got.select("c_custkey").distinct().count() == expected)
  }

  test("parallel copyTables produces the same manifest as sequential") {
    val seqDest = tmpDir()
    val parDest = tmpDir()
    val tables = Seq("region", "nation", "customer", "supplier", "part")
    val sequential = TableCopy.copyTables(spark, sf, seqDest, include = tables)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val parallel = TableCopy.copyTables(spark, sf, parDest, include = tables,
      parallelism = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(parallel == sequential)
    assert(parallel.keySet == tables.toSet)
  }

  test("predicate copy replicates only matching rows; column copy only selected columns") {
    val dest = tmpDir()
    val n = TableCopy.copyTable(spark, sf, dest, "customer",
      columns = Seq("c_custkey", "c_mktsegment"),
      predicate = Some("c_mktsegment = 'BUILDING'"))
    val expected = Tables.load(spark, sf, "customer")
      .where("c_mktsegment = 'BUILDING'").count()
    assert(n == expected && n > 0)
    val back = spark.read.parquet(s"$dest/customer.parquet")
    assert(back.columns.toSeq == Seq("c_custkey", "c_mktsegment"))
    assert(back.where("c_mktsegment <> 'BUILDING'").count() == 0)
  }

  test("maxRecordsPerFile bounds output file sizes like a bulk-copy batch size") {
    val dest = tmpDir()
    val n = TableCopy.copyTable(spark, sf, dest, "orders",
      maxRecordsPerFile = Some(200L))
    assert(n == 1500)
    val files = new java.io.File(s"$dest/orders.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 1500 / 200) // at least ceil(rows/cap) files overall
    files.foreach { f =>
      val rows = spark.read.parquet(f.getPath).count()
      assert(rows <= 200, s"${f.getName} has $rows rows")
    }
  }

  test("partitionedRead reassembles the table exactly, regardless of partition count") {
    val full = Tables.load(spark, sf, "orders").count()
    Seq(1, 3, 8, 100).foreach { n =>
      val got = TableCopy.partitionedRead(spark, sf, "orders", "o_orderkey", n)
      assert(got.count() == full, s"numPartitions=$n")
      assert(got.select("o_orderkey").distinct().count() == full)
    }
  }

  test("diffTables classifies same / changed / missing rows, null-safely") {
    val s = spark
    import s.implicits._
    val src = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("k", "name", "v")
    val dst = Seq((1L, "a", 10.0), (2L, "B", 20.0),
      (4L, null.asInstanceOf[String], 40.0), (5L, "e", 50.0)).toDF("k", "name", "v")
    val got = TableCopy.diffTables(src, dst, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "same",            // identical
      2L -> "changed",         // name differs
      3L -> "missing_in_dest", // only in source
      4L -> "same",            // null == null under null-safe compare
      5L -> "missing_in_source"))
  }

  test("diffTables on a keys-only table reduces to presence classification") {
    val s = spark
    import s.implicits._
    val src = Seq(1L, 2L, 3L).toDF("k")
    val dst = Seq(2L, 3L, 4L).toDF("k")
    val got = TableCopy.diffTables(src, dst, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "missing_in_dest", 2L -> "same",
      3L -> "same", 4L -> "missing_in_source"))
  }

  test("upsert replaces matched keys, keeps unmatched dest rows, adds new rows") {
    val s = spark
    import s.implicits._
    val dst = Seq((1L, "old", 1.0), (2L, "keep", 2.0)).toDF("k", "name", "v")
    val fresh = Seq((1L, "new", 9.0), (3L, "add", 3.0)).toDF("k", "name", "v")
    val got = TableCopy.upsert(fresh, dst, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "new", 9.0), (2L, "keep", 2.0), (3L, "add", 3.0)))
  }

  test("copyPartitioned lays out hive partitions and readback prunes them") {
    val dest = tmpDir() + "/part"
    val n = TableCopy.copyPartitioned(spark, sf, dest)
    assert(n == Tables.load(spark, sf, "orders").count())
    val years = new java.io.File(dest).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("o_year=")).sorted
    assert(years.contains("o_year=1997") && years.length >= 5)
    val agg = TableCopy.partitionPrunedAgg(spark, dest, 1997)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan.take(500))
    // Values survive the partitioned round trip.
    val want = Tables.load(spark, sf, "orders")
      .where(year(col("o_orderdate")) === 1997).count()
    assert(agg.agg(sum("n_orders")).head.getLong(0) == want)
  }

  test("copyBucketed joins co-located buckets with zero join-side exchanges") {
    val agg = TableCopy.copyBucketed(spark, sf, tmpDir() + "/bkt")
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(400))
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      "join-side shuffle present — bucketing unused")
    // Result equals the plain unbucketed join.
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = agg.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == plain)
  }

  test("JDBC reads push filters into the database scan") {
    val db = derbyStore()
    TableCopy.copy(spark, TableCopy.ParquetStore(sf), db, "nation")
    val filtered = db.read(spark, "nation").where(col("n_regionkey") === 2)
    val plan = filtered.queryExecution.executedPlan.toString
    // The predicate must reach the JDBC relation, not run as a Spark Filter
    // over a full-table pull.
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(n_regionkey,2)"),
      plan.take(600))
    assert(filtered.count() ==
      Tables.load(spark, sf, "nation").where(col("n_regionkey") === 2).count())
  }

  test("CSV readback tolerates corrupt rows in PERMISSIVE mode and flags them") {
    val dir = tmpDir()
    val f = new java.io.File(s"$dir/bad.csv")
    val w = new java.io.PrintWriter(f)
    w.println("k,v"); w.println("1,10.5"); w.println("2,not_a_number"); w.println("3,30.0")
    w.close()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    val got = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(f.getPath)
      .cache() // corrupt-record column requires materialization before filter
    assert(got.count() == 3)
    val bad = got.where(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("not_a_number"))
    assert(got.where(col("_corrupt_record").isNull).agg(sum("v")).head.getDouble(0) == 40.5)
  }

  test("constraintCheck passes a clean table and counts injected violations") {
    val clean = TableCopy.constraintCheck(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(clean.keySet == Set("date_range", "key_null", "key_unique",
      "price_nonpositive", "status_domain"))
    assert(clean.values.forall { case (n, p) => n == 0L && p })
    // Inject: a duplicated key, a negative price, a bogus status.
    val orders = Tables.load(spark, sf, "orders")
    val dirty = orders
      .unionAll(orders.limit(1)) // duplicate key
      .unionAll(orders.limit(1)
        .withColumn("o_totalprice", lit(-5.0))
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_orderkey", lit(999999999L)))
    val got = TableCopy.constraintCheckOn(dirty).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("key_unique") == 1L)     // one key now appears twice
    assert(got("price_nonpositive") == 1L)
    assert(got("status_domain") == 1L)
    assert(got("key_null") == 0L)
  }

  test("copyClustered writes files with disjoint cluster-key intervals") {
    val dest = tmpDir() + "/clustered"
    val back = TableCopy.copyClustered(spark, sf, dest, nFiles = 4)
    assert(back.count() == Tables.load(spark, sf, "orders").count())
    // Every parquet file must cover a date interval that no other file
    // overlaps — that is what lets footer min/max stats skip whole files.
    val files = new java.io.File(dest).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 2)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderdate")).cast("string"),
          max(col("o_orderdate")).cast("string")).head
      (r.getString(0), r.getString(1)) // ISO strings: lexicographic = chronological
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(hiA <= loB, s"overlapping file ranges: $hiA > $loB")
    }
  }

  test("compact collapses a fragmented directory to ceil(rows/target) files, data intact") {
    val dest = tmpDir() + "/frag"
    val orders = Tables.load(spark, sf, "orders") // 1500 rows at sf0.001
    orders.repartition(64).write.parquet(dest)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(dest) == 64)
    val back = TableCopy.compact(spark, dest, targetRowsPerFile = 500)
    assert(parquetFiles(s"$dest.compacted") == 3) // ceil(1500/500)
    assert(back.count() == orders.count())
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ==
      orders.agg(sum("o_orderkey")).head.getLong(0))
  }

  test("copyEvolve null-fills pre-evolution rows and keeps both channels countable") {
    val got = TableCopy.copyEvolve(spark, sf, tmpDir() + "/evolve").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = Tables.load(spark, sf, "orders").count()
    val backfill = Tables.load(spark, sf, "orders")
      .where(col("o_orderkey") % 100 === 0).count()
    assert(got == Map("original" -> all, "backfill" -> backfill))
  }

  test("fkCheck counts orphan rows and keys against driver-side ground truth") {
    val users = Tables.load(spark, sf, "events").select("user_id")
      .collect().map(_.getLong(0))
    val custs = Tables.load(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val orphanRows = users.count(!custs.contains(_))
    val orphanKeys = users.filter(!custs.contains(_)).distinct.length
    val got = TableCopy.fkCheck(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("events.user_id->customer.c_custkey") ==
      ((orphanRows.toLong, orphanKeys.toLong)))
    // TPC-H relationships are referentially intact by construction.
    assert(got("lineitem.l_orderkey->orders.o_orderkey") == ((0L, 0L)))
    assert(got("customer.c_nationkey->nation.n_nationkey") == ((0L, 0L)))
  }

  test("statsProfile reports nulls, exact distincts, and numeric min/max") {
    val orders = Tables.load(spark, sf, "orders")
    val p = TableCopy.statsProfile(spark, sf, "orders").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == orders.columns.toSet)
    val keys = orders.select("o_orderkey").collect().map(_.getLong(0))
    val k = p("o_orderkey")
    assert(k.getLong(1) == 0L) // no nulls
    assert(k.getLong(2) == keys.distinct.length.toLong)
    assert(k.getDouble(3) == keys.min.toDouble && k.getDouble(4) == keys.max.toDouble)
    val status = p("o_orderstatus")
    assert(status.isNullAt(3) && status.isNullAt(4)) // non-numeric: no min/max
    assert(status.getLong(2) ==
      orders.select("o_orderstatus").distinct().count())
  }

  test("upsert of the changed+missing slice reconstructs the source exactly") {
    val src = Tables.load(spark, sf, "orders")
    val stale = src.where(col("o_orderkey") % 10 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    val fresh = src.where(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 7 === 0)
    val merged = TableCopy.upsert(fresh, stale, Seq("o_orderkey"))
    assert(TableCopy.diffTables(src, merged, Seq("o_orderkey"))
      .where(col("status") =!= "same").isEmpty)
  }

  test("scd2Merge keeps one open version per key, closes changes, and is idempotent") {
    val cust = Tables.load(spark, sf, "customer")
    val drift = cust.where(col("c_custkey") % 10 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 1.0)
          .otherwise(col("c_acctbal")))
    val dim = drift
      .withColumn("valid_from", to_date(lit("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val merged = TableCopy.scd2Merge(cust, dim, Seq("c_custkey"),
      to_date(lit("2021-01-01")))
    // Exactly one open version per key, and every source key is present.
    val perKey = merged.groupBy("c_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
    assert(perKey.where(col("n_open") =!= 1).isEmpty)
    assert(merged.select("c_custkey").distinct().count() == cust.count())
    // Changed keys carry a closed 2020 version chained to the 2021 one.
    val changedKeys = merged.where(!col("is_current"))
    assert(changedKeys.count() ==
      cust.where(col("c_custkey") % 7 === 0 && col("c_custkey") % 10 =!= 0).count())
    assert(changedKeys.where(col("valid_to") =!= to_date(lit("2021-01-01"))).isEmpty)
    // Open versions now all match the snapshot → a re-merge adds nothing.
    val again = TableCopy.scd2Merge(cust, merged, Seq("c_custkey"),
      to_date(lit("2022-01-01")))
    assert(again.count() == merged.count())
    assert(again.where(col("valid_from") === to_date(lit("2022-01-01"))).isEmpty)
  }

  test("balanced partitioned read reassembles exactly and beats uniform strides on skew") {
    val got = TableCopy.partitionedReadBalanced(spark, sf, "orders", "o_custkey", 8)
    val src = Tables.load(spark, sf, "orders")
    assert(got.count() == src.count())
    assert(got.select("o_orderkey").except(src.select("o_orderkey")).isEmpty)
    // On a non-uniformly distributed key (o_totalprice is bell-shaped), the
    // quantile boundaries give flatter chunk sizes than uniform strides.
    val df = src.withColumn("k", col("o_totalprice").cast("long"))
    val Array(lo, hi) = df.agg(min(col("k")), max(col("k"))).collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    def spread(preds: Seq[String]): Double = {
      val counts = preds.map(p => df.where(p).count()).filter(_ > 0)
      counts.max.toDouble / counts.min.max(1L)
    }
    val uniform = spread(graft.sources.PartitionPlan.stridePredicates("k", lo, hi + 1, 8))
    val probs = (1 until 8).map(_.toDouble / 8)
    val qs = df.agg(percentile_approx(col("k").cast("double"),
        typedLit(probs), lit(10000))).collect()(0).getSeq[Double](0)
    val balanced = spread(
      graft.sources.PartitionPlan.boundaryPredicates("k", qs.map(_.toLong)))
    assert(balanced < uniform,
      s"equi-depth spread $balanced should beat uniform $uniform")
    assert(balanced < 2.0, s"equi-depth chunks should be near-equal, got $balanced")
  }

  test("jdbcUpsert merges a fresh slice into a live Derby table, set-based") {
    val db = derbyStore()
    val cust = Tables.load(spark, sf, "customer")
    val stale = cust.where(col("c_custkey") % 10 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 1.0)
          .otherwise(col("c_acctbal")))
    db.write(stale, "customer", TableCopy.Recreate)
    val fresh = cust.where(col("c_custkey") % 10 === 0 || col("c_custkey") % 7 === 0)
    TableCopy.jdbcUpsert(spark, db, fresh, "customer", Seq("c_custkey"))
    val back = db.read(spark, "customer")
    assert(TableCopy.diffTables(cust, back, Seq("c_custkey"))
      .where(col("status") =!= "same").isEmpty)
    // The staging table is cleaned up after the merge.
    assert(!db.list(spark).exists(_.equalsIgnoreCase("customer_stage")))
  }

  test("schema replication: PK, secondary index, and identity survive a JDBC-to-JDBC copy") {
    val src = derbyStore()
    val dst = derbyStore()
    // A real catalog source: PK + user index + identity created via SQL —
    // the metadata is DISCOVERED from the live catalog, not supplied.
    val conn = java.sql.DriverManager.getConnection(src.url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE items ("item_id" BIGINT NOT NULL GENERATED BY DEFAULT AS IDENTITY,
          |"grp" INTEGER NOT NULL, "label" VARCHAR(20), PRIMARY KEY ("item_id"))""".stripMargin)
      st.executeUpdate("CREATE INDEX items_grp_idx ON items (\"grp\")")
      st.executeUpdate("CREATE UNIQUE INDEX items_label_uq ON items (\"label\")")
      st.executeUpdate("INSERT INTO items VALUES (10, 1, 'a'), (20, 1, 'b'), (35, 2, 'c')")
    } finally conn.close()
    val m = src.meta(spark, "items")
    assert(m.primaryKey == Seq("item_id"))
    assert(m.identity == Seq("item_id"))
    assert(m.indexes == Seq(("ITEMS_GRP_IDX", Seq("grp"), false),
      ("ITEMS_LABEL_UQ", Seq("label"), true)))
    TableCopy.copy(spark, src, dst, "items", TableCopy.Recreate, replicateMeta = true)
    val back = dst.meta(spark, "items")
    assert(back.primaryKey == Seq("item_id"))
    assert(back.identity == Seq("item_id"))
    assert(back.indexes == Seq(("ITEMS_GRP_IDX", Seq("grp"), false),
      ("ITEMS_LABEL_UQ", Seq("label"), true)))
    // The replicated UNIQUE index actually enforces on the destination:
    // a duplicate label (fresh PK, fresh grp) must be rejected.
    val uconn = java.sql.DriverManager.getConnection(dst.url)
    try intercept[java.sql.SQLException] {
      uconn.createStatement().executeUpdate("INSERT INTO items VALUES (99, 9, 'a')")
    } finally uconn.close()
    // KeepIdentity semantics: the DESTINATION holds the source's identity
    // VALUES (10, 20, 35), not a regenerated 1, 2, 3 sequence.
    val ids = dst.read(spark, "items").collect()
      .map(_.getAs[Long]("item_id")).sorted.toSeq
    assert(ids == Seq(10L, 20L, 35L))
    // The destination PK actually enforces: a duplicate key must fail.
    val dconn = java.sql.DriverManager.getConnection(dst.url)
    try intercept[java.sql.SQLException] {
      dconn.createStatement().executeUpdate("INSERT INTO items VALUES (10, 9, 'dup')")
    } finally dconn.close()
  }

  test("JdbcStore.meta resolves identifier case from the live catalog, not a hard-coded fold") {
    val store = derbyStore()
    val conn = java.sql.DriverManager.getConnection(store.url)
    try {
      // Unquoted DDL: Derby stores the table name upper-cased in its
      // catalog — exactly the storesUpperCaseIdentifiers fact meta must
      // read from the connection instead of assuming.
      conn.createStatement().executeUpdate(
        """CREATE TABLE widgets ("wid" INT NOT NULL, "v" INT, PRIMARY KEY ("wid"))""")
      assert(conn.getMetaData.storesUpperCaseIdentifiers)
    } finally conn.close()
    // meta called with the caller's lower-case name must fold to the
    // catalog's stored case (metadata-driven) and find the PK; the quoted
    // lower-case COLUMN name must come back verbatim, unfolded.
    val m = store.meta(spark, "widgets")
    assert(m.primaryKey == Seq("wid"))
  }

  test("copyTablesWithSchema orders parents before children; cycles defer FKs with a warning") {
    val db = derbyStore()
    val metas = Map(
      "region" -> TableCopy.TableMeta(primaryKey = Seq("r_regionkey")),
      "nation" -> TableCopy.TableMeta(primaryKey = Seq("n_nationkey"),
        foreignKeys = Seq(("n_regionkey", "region", "r_regionkey"))))
    val man = TableCopy.copyTablesWithSchema(spark, TableCopy.ParquetStore(sf), db,
      metas, include = Seq("nation", "region"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    // Alphabetical order (nation first) would fail the enforced FK load;
    // the manifest's seq records parent-first.
    assert(man == Seq((1L, "region", 5L, "ok"), (2L, "nation", 25L, "ok")))
    // The destination FK is real: an orphan child row must be rejected.
    val conn = java.sql.DriverManager.getConnection(db.url)
    try intercept[java.sql.SQLException] {
      conn.createStatement().executeUpdate(
        "INSERT INTO nation VALUES (99, 'nowhere', 42, 'no such region')")
    } finally conn.close()
    // A true FK cycle cannot be topologically ordered: both tables copy in
    // name order with their FK clauses deferred, flagged in the manifest.
    val cyc = Map(
      "customer" -> TableCopy.TableMeta(
        foreignKeys = Seq(("c_nationkey", "supplier", "s_suppkey"))),
      "supplier" -> TableCopy.TableMeta(
        foreignKeys = Seq(("s_nationkey", "customer", "c_custkey"))))
    val man2 = TableCopy.copyTablesWithSchema(spark, TableCopy.ParquetStore(sf), db,
      cyc, include = Seq("customer", "supplier"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(man2.map(_._1) == Seq("customer", "supplier"))
    assert(man2.forall(_._3.startsWith("warning: fk cycle")))
    assert(man2.forall(_._2 > 0L))
  }

  test("copyTablesWithSchema wave-parallelism preserves FK order and the manifest") {
    val db = derbyStore()
    // region <- nation <- {customer, supplier}: customer and supplier share
    // a wave and may copy concurrently; their parents must land first.
    val metas = Map(
      "region" -> TableCopy.TableMeta(primaryKey = Seq("r_regionkey")),
      "nation" -> TableCopy.TableMeta(primaryKey = Seq("n_nationkey"),
        foreignKeys = Seq(("n_regionkey", "region", "r_regionkey"))),
      "customer" -> TableCopy.TableMeta(primaryKey = Seq("c_custkey"),
        foreignKeys = Seq(("c_nationkey", "nation", "n_nationkey"))),
      "supplier" -> TableCopy.TableMeta(primaryKey = Seq("s_suppkey"),
        foreignKeys = Seq(("s_nationkey", "nation", "n_nationkey"))))
    val man = TableCopy.copyTablesWithSchema(spark, TableCopy.ParquetStore(sf), db,
      metas, include = Seq("customer", "nation", "region", "supplier"),
      parallelism = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSeq
    assert(man.map(_._2) == Seq("region", "nation", "customer", "supplier"))
    assert(man.forall(_._3 == "ok"), man.toString)
    // Both leaf tables really landed under enforced FKs.
    assert(db.read(spark, "customer").count() ==
      Tables.load(spark, sf, "customer").count())
    assert(db.read(spark, "supplier").count() ==
      Tables.load(spark, sf, "supplier").count())
  }

  test("copyTablesWithSchema re-runs cleanly over its own FK constraints") {
    val db = derbyStore()
    val metas = Map(
      "region" -> TableCopy.TableMeta(primaryKey = Seq("r_regionkey")),
      "nation" -> TableCopy.TableMeta(primaryKey = Seq("n_nationkey"),
        foreignKeys = Seq(("n_regionkey", "region", "r_regionkey"))))
    def run() = TableCopy.copyTablesWithSchema(spark, TableCopy.ParquetStore(sf),
      db, metas, include = Seq("nation", "region"))
      .collect().map(r => (r.getString(1), r.getString(3))).toSeq
    // Second run must drop children before parents (reverse topological
    // order) or region's DROP would be blocked by nation's live FK.
    assert(run() == Seq(("region", "ok"), ("nation", "ok")))
    assert(run() == Seq(("region", "ok"), ("nation", "ok")))
  }

  test("copyMapped renames and re-types columns in the stored file") {
    val dest = tmpDir()
    val n = TableCopy.copyMapped(spark, sf, dest, "customer", Seq(
      ("c_custkey", "customer_id", "bigint"),
      ("c_name", "full_name", "string"),
      ("c_acctbal", "balance", "decimal(12,2)")))
    assert(n == Tables.load(spark, sf, "customer").count())
    val back = spark.read.parquet(s"$dest/customer.parquet")
    assert(back.schema.map(f => (f.name, f.dataType.sql.toLowerCase)) == Seq(
      ("customer_id", "bigint"), ("full_name", "string"),
      ("balance", "decimal(12,2)")))
    // Values survive the rename+cast, keyed by the renamed key.
    val src = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_acctbal").cast("decimal(12,2)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    back.collect().foreach(r => assert(src(r.getLong(0)) == r.getDecimal(2)))
  }

  test("checksum verifies a copy and catches tampering, independent of layout") {
    val src = Tables.load(spark, sf, "orders")
    def chk(df: org.apache.spark.sql.DataFrame): (Long, String) = {
      val r = TableCopy.checksum(df).collect()(0)
      (r.getLong(0), r.getString(1))
    }
    val (nSrc, cSrc) = chk(src)
    // A faithful copy matches no matter how its rows are partitioned/ordered.
    val dest = tmpDir()
    TableCopy.copyTable(spark, sf, dest, "orders")
    assert(chk(spark.read.parquet(s"$dest/orders.parquet").repartition(7)) == ((nSrc, cSrc)))
    // One drifted value in one row flips the checksum but not the row count.
    val tampered = src.withColumn("o_totalprice",
      when(col("o_orderkey") === 7, col("o_totalprice") + 0.01)
        .otherwise(col("o_totalprice")))
    val (nTam, cTam) = chk(tampered)
    assert(nTam == nSrc && cTam != cSrc)
    // A dropped row and a duplicated row both flip it too (sum, not XOR-of-set).
    assert(chk(src.where(col("o_orderkey") =!= 7))._2 != cSrc)
    assert(chk(src.unionAll(src.where(col("o_orderkey") === 7)))._2 != cSrc)
  }

  test("incrementalCopy reloads only at/past the watermark and reconstructs the source") {
    val src = Tables.load(spark, sf, "orders")
    val cut = to_date(lit("1997-01-01"))
    val dst = src.where(col("o_orderdate") < cut)
    val merged = TableCopy.incrementalCopy(spark, src, dst, "o_orderdate", Seq("o_orderkey"))
    assert(merged.count() == src.count())
    assert(merged.join(src, Seq("o_orderkey")).count() == src.count())
    // >= semantics: boundary-date rows must not duplicate through the merge.
    assert(merged.groupBy("o_orderkey").count().where(col("count") > 1).isEmpty)
    // Empty destination degrades to a full copy (null watermark path).
    val full = TableCopy.incrementalCopy(spark, src, dst.where(lit(false)),
      "o_orderdate", Seq("o_orderkey"))
    assert(full.count() == src.count())
    // The incremental scan carries a pushed watermark predicate: the filter
    // reaches the parquet scan as a literal (the 100 TB file-skipping claim).
    val wm = dst.agg(max(col("o_orderdate"))).collect()(0).get(0)
    val plan = src.where(col("o_orderdate") >= lit(wm))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      plan.take(600))
  }

  test("versioned snapshots are immutable, listable, and time-travel readable") {
    val dest = tmpDir()
    val nation = Tables.load(spark, sf, "nation")
    assert(TableCopy.listSnapshots(spark, dest, "nation").isEmpty)
    assert(TableCopy.writeSnapshot(spark, nation.where(col("n_nationkey") < 10),
      dest, "nation") == 1)
    assert(TableCopy.writeSnapshot(spark, nation, dest, "nation") == 2)
    assert(TableCopy.writeSnapshot(spark, nation.where(col("n_nationkey") >= 20),
      dest, "nation") == 3)
    assert(TableCopy.listSnapshots(spark, dest, "nation") == Seq(1, 2, 3))
    // Time travel: v1 is untouched by later writes; latest resolves to v3.
    assert(TableCopy.readSnapshot(spark, dest, "nation", version = 1).count() == 10)
    assert(TableCopy.readSnapshot(spark, dest, "nation", version = 2).count() == 25)
    assert(TableCopy.readSnapshot(spark, dest, "nation").count() == 5)
    intercept[IllegalArgumentException] {
      TableCopy.readSnapshot(spark, dest, "nation", version = 9)
    }
  }

  test("restoreSnapshot re-publishes a historical version as the new head with history intact") {
    val dest = tmpDir()
    val nation = Tables.load(spark, sf, "nation")
    TableCopy.writeSnapshot(spark, nation.where(col("n_nationkey") < 10),
      dest, "nation")
    TableCopy.writeSnapshot(spark, nation, dest, "nation")
    assert(TableCopy.restoreSnapshot(spark, dest, "nation", version = 1) == 3)
    assert(TableCopy.listSnapshots(spark, dest, "nation") == Seq(1, 2, 3))
    // head state == v1 state, exactly
    val head = TableCopy.readSnapshot(spark, dest, "nation")
      .collect().map(_.getAs[Int]("n_nationkey")).sorted
    assert(head.toSeq == (0 until 10))
    // the rolled-back head (v2) is still readable for forensics
    assert(TableCopy.readSnapshot(spark, dest, "nation", version = 2).count() == 25)
    // restore of the restore: undo works the same way
    assert(TableCopy.restoreSnapshot(spark, dest, "nation", version = 2) == 4)
    assert(TableCopy.readSnapshot(spark, dest, "nation").count() == 25)
  }

  test("schemaDiff classifies added, dropped, retyped, and unchanged columns") {
    import org.apache.spark.sql.types._
    val src = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType), StructField("d", IntegerType)))
    val dst = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DecimalType(18, 2)), StructField("e", StringType)))
    val rows = TableCopy.schemaDiff(spark, src, dst).collect()
    val byCol = rows.map(r => r.getAs[String]("column_name") ->
      (r.getAs[String]("status"), r.getAs[String]("src_type"),
        r.getAs[String]("dst_type"))).toMap
    assert(rows.map(_.getAs[String]("column_name")).toSeq ==
      Seq("a", "b", "c", "d", "e"))
    assert(byCol("a") == (("unchanged", "bigint", "bigint")))
    assert(byCol("b") == (("unchanged", "string", "string")))
    assert(byCol("c") == (("retyped", "double", "decimal(18,2)")))
    assert(byCol("d") == (("dropped", "int", null)))
    assert(byCol("e") == (("added", null, "string")))
  }

  test("expireSnapshots deletes exactly the versions beyond keepLast, head immune") {
    val dest = tmpDir()
    val nation = Tables.load(spark, sf, "nation")
    (1 to 4).foreach { i =>
      TableCopy.writeSnapshot(spark, nation.where(col("n_nationkey") < i * 5),
        dest, "nation")
    }
    assert(TableCopy.expireSnapshots(spark, dest, "nation", keepLast = 2) ==
      Seq(1, 2))
    assert(TableCopy.listSnapshots(spark, dest, "nation") == Seq(3, 4))
    // survivors intact, head still resolves
    assert(TableCopy.readSnapshot(spark, dest, "nation", version = 3).count() == 15)
    assert(TableCopy.readSnapshot(spark, dest, "nation").count() == 20)
    // expiring again is a no-op
    assert(TableCopy.expireSnapshots(spark, dest, "nation", keepLast = 2).isEmpty)
    // keepLast must retain the head
    intercept[IllegalArgumentException] {
      TableCopy.expireSnapshots(spark, dest, "nation", keepLast = 0)
    }
  }

  test("publishSet commits a whole table set with one pointer flip, keeping history") {
    val dest = tmpDir()
    val nation = Tables.load(spark, sf, "nation")
    val supplier = Tables.load(spark, sf, "supplier")
    assert(TableCopy.currentSetVersion(spark, dest) == 0)
    intercept[IllegalArgumentException] {
      TableCopy.readFromSet(spark, dest, "nation")
    }
    assert(TableCopy.publishSet(spark, Seq(
      "nation" -> nation.where(col("n_nationkey") < 10),
      "supplier" -> supplier), dest) == 1)
    assert(TableCopy.currentSetVersion(spark, dest) == 1)
    assert(TableCopy.readFromSet(spark, dest, "nation").count() == 10)
    // second publish: the set flips as a unit
    assert(TableCopy.publishSet(spark, Seq(
      "nation" -> nation,
      "supplier" -> supplier.where(col("s_suppkey") % 2 === 0)), dest) == 2)
    assert(TableCopy.readFromSet(spark, dest, "nation").count() == nation.count())
    assert(TableCopy.readFromSet(spark, dest, "supplier").count() ==
      supplier.where(col("s_suppkey") % 2 === 0).count())
    // v1 snapshot remains on disk, readable by a pinned path
    assert(spark.read.parquet(s"$dest/v1/nation").count() == 10)
    // Crash recovery: losing CURRENT (the pre-r9 delete-then-rename crash
    // window) must NOT let the next publish recompute v1 and destroy
    // history — the version derives from the max existing v<N> snapshot.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dest), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dest/CURRENT"), false)
    assert(TableCopy.currentSetVersion(spark, dest) == 0)
    assert(TableCopy.publishSet(spark, Seq(
      "nation" -> nation.where(col("n_nationkey") < 5),
      "supplier" -> supplier), dest) == 3)
    assert(TableCopy.currentSetVersion(spark, dest) == 3)
    // both historical snapshots intact
    assert(spark.read.parquet(s"$dest/v1/nation").count() == 10)
    assert(spark.read.parquet(s"$dest/v2/nation").count() == nation.count())
  }

  test("quarantineCopy partitions the source: clean ∪ quarantine = source, first-failing-rule reasons") {
    val dest = tmpDir()
    val src = Tables.load(spark, sf, "orders")
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 11 === 0, lit("X")).otherwise(col("o_orderstatus")))
    val rules = Seq(
      "price_nonpositive" -> (col("o_totalprice") <= 0d),
      "status_domain" -> !col("o_orderstatus").isin("F", "O", "P"))
    val quar = TableCopy.quarantineCopy(spark, src, dest, rules).collect()
    val clean = spark.read.parquet(s"$dest/clean.parquet")
    // Partition: counts add up and no key appears on both sides.
    assert(quar.length + clean.count() == src.count())
    val quarKeys = quar.map(_.getAs[Long]("o_orderkey")).toSet
    assert(clean.where(col("o_orderkey").isInCollection(quarKeys)).count() == 0)
    // Clean rows pass every rule.
    assert(clean.where(col("o_totalprice") <= 0d ||
      !col("o_orderstatus").isin("F", "O", "P")).count() == 0)
    // Reasons follow rule precedence: a row failing both rules reports the first.
    quar.foreach { r =>
      val expected =
        if (r.getAs[Double]("o_totalprice") <= 0) "price_nonpositive"
        else "status_domain"
      assert(r.getAs[String]("reason") == expected)
    }
    assert(quarKeys.nonEmpty)
  }

  test("maskedCopy hashes, redacts, and passes columns per policy; hashed equality is preserved") {
    val dest = tmpDir()
    val out = TableCopy.maskedCopy(spark, sf, dest, "customer",
      Map("c_name" -> TableCopy.Hash, "c_acctbal" -> TableCopy.Redact)).collect()
    val src = Tables.load(spark, sf, "customer").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r).toMap
    assert(out.length == src.size)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    out.foreach { r =>
      val s = src(r.getAs[Long]("c_custkey"))
      // Hash action: sha256 hex of the original, never the plaintext.
      val want = sha.digest(s.getAs[String]("c_name").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("c_name") == want)
      // Redact action: value gone, type kept.
      assert(r.isNullAt(r.fieldIndex("c_acctbal")))
      // Keep action: untouched.
      assert(r.getAs[String]("c_mktsegment") == s.getAs[String]("c_mktsegment"))
      assert(r.getAs[Int]("c_nationkey") == s.getAs[Int]("c_nationkey"))
    }
  }

  test("copyVerified emits a passing verdict whose checksums match an independent recompute") {
    val dest = tmpDir()
    val r = TableCopy.copyVerified(spark, sf, dest, "nation").collect().head
    assert(r.getAs[Boolean]("verified"))
    assert(r.getAs[Long]("src_rows") == Tables.load(spark, sf, "nation").count())
    assert(r.getAs[String]("src_checksum") == r.getAs[String]("dst_checksum"))
    // The verdict uses the same checksum as the standalone operator.
    val want = TableCopy.checksum(Tables.load(spark, sf, "nation"))
      .collect().head.getAs[String]("checksum")
    assert(r.getAs[String]("src_checksum") == want)
  }

  test("maintainAggView: merged partials equal the full recompute, any split date") {
    val full = TableCopy.maintainAggView(spark, sf, "1900-01-01").collect().toSeq
    // With everything in the delta and nothing in the base the merge IS the
    // recompute; a mid-corpus split must produce identical rows.
    val mid = TableCopy.maintainAggView(spark, sf, "2024-01-15").collect().toSeq
    assert(mid == full)
    // Sanity: the view covers every (type, day) with exact counts.
    val n = mid.map(_.getAs[Long]("n")).sum
    assert(n == Tables.load(spark, sf, "events").count())
  }

  test("skewProfile reports exact key counts, heaviest key, and skew factor") {
    val rows = TableCopy.skewProfile(spark, sf).collect()
      .map(r => r.getAs[String]("key_col") -> r).toMap
    assert(rows.keySet ==
      Set("orders.o_custkey", "lineitem.l_orderkey", "lineitem.l_partkey"))
    val counts = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r = rows("lineitem.l_orderkey")
    assert(r.getAs[Long]("n_rows") == counts.values.sum)
    assert(r.getAs[Long]("n_keys") == counts.size)
    val maxCnt = counts.values.max
    assert(r.getAs[Long]("max_cnt") == maxCnt)
    // Tie-break: heaviest count, then LARGEST key (the max-struct order).
    assert(r.getAs[Long]("top_key") ==
      counts.filter(_._2 == maxCnt).keys.max)
    val avg = counts.values.sum.toDouble / counts.size
    assert(math.abs(r.getAs[Double]("skew_factor") -
      BigDecimal(maxCnt / avg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("cdcCollapse keeps the last writer per key and tombstones deletes") {
    val rows = TableCopy.cdcCollapse(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("t")).collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(rows.length == ev.size, "one net-change row per key")
    rows.foreach { r =>
      val es = ev(r.getAs[Long]("user_id"))
      val last = es.maxBy(e => (e.getAs[Long]("t"), e.getAs[Long]("event_id")))
      val wantOp = if (last.getAs[String]("event_type") == "error") "D" else "U"
      assert(r.getAs[String]("last_op") == wantOp)
      assert(r.getAs[Long]("n_changes") == es.length)
      if (wantOp == "D") assert(r.isNullAt(r.fieldIndex("final_value")))
      else assert(r.getAs[Double]("final_value") == last.getAs[Double]("value"))
    }
  }

  test("zorderCopy writes disjoint zval file ranges that narrow BOTH clustered dimensions") {
    val dest = tmpDir()
    val mapping = TableCopy.zorderCopy(spark, sf, dest)
    assert(mapping.count() == Tables.load(spark, sf, "orders").count())
    val c16 = col("o_custkey").bitwiseAND(lit(65535L))
    val p16 = floor(col("o_totalprice")).cast("long").bitwiseAND(lit(65535L))
    val files = spark.read.parquet(dest)
      .select(col("zval"), c16.as("c"), p16.as("p"), input_file_name().as("f"))
      .groupBy("f").agg(min("zval").as("zmin"), max("zval").as("zmax"),
        (max("c") - min("c")).as("cspan"), (max("p") - min("p")).as("pspan"))
      .collect()
    assert(files.length == 8)
    val ranges = files.map(r => (r.getAs[Long]("zmin"), r.getAs[Long]("zmax"))).sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) => assert(hi <= lo2) }
    val g = Tables.load(spark, sf, "orders")
      .agg((max(c16) - min(c16)).as("c"), (max(p16) - min(p16)).as("p")).collect()(0)
    assert(files.map(_.getAs[Long]("cspan")).sum / files.length < g.getAs[Long]("c"))
    assert(files.map(_.getAs[Long]("pspan")).sum / files.length < g.getAs[Long]("p"))
    // interleave arithmetic spot-check against an independent Scala computation
    spark.read.parquet(dest).select("o_custkey", "o_totalprice", "zval")
      .limit(5).collect().foreach { r =>
        val c = r.getAs[Long]("o_custkey") & 0xFFFFL
        val p = math.floor(r.getAs[Double]("o_totalprice")).toLong & 0xFFFFL
        var z = 0L
        for (i <- 0 until 16) {
          z |= ((c >> i) & 1L) << (2 * i)
          z |= ((p >> i) & 1L) << (2 * i + 1)
        }
        assert(r.getAs[Long]("zval") == z)
      }
  }

  test("sampledCopy selects exactly the keys whose sha256 starts with '0'") {
    val dest = Files.createTempDirectory("sample").toString + "/orders"
    val got = TableCopy.sampledCopy(spark, sf, dest).collect()
      .map(_.getAs[Long]("o_orderkey"))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val all = Tables.load(spark, sf, "orders").select("o_orderkey").collect()
      .map(_.getLong(0))
    val expect = all.filter { k =>
      val h = md.digest(k.toString.getBytes("UTF-8"))
      (h(0) & 0xf0) == 0 // first hex digit '0'
    }.sorted
    assert(got.toSeq == expect.toSeq)
    // deterministic: a re-run of the copy yields the identical universe
    val again = TableCopy.sampledCopy(spark, sf, dest).collect()
      .map(_.getAs[Long]("o_orderkey"))
    assert(again.toSeq == got.toSeq)
    // and the rate is consistent with 1/16 Bernoulli on a hash
    assert(math.abs(got.length.toDouble / all.length - 1.0 / 16) < 0.02)
  }

  test("shardCopy fans out into hash-named shard dirs that partition the table") {
    val dest = Files.createTempDirectory("shard").toString + "/documents"
    val got = TableCopy.shardCopy(spark, sf, dest).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // shards partition the table
    assert(got.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
    assert(got.map(_.getAs[Long]("sum_chars")).sum == docs.map(_._2).sum)
    // per-shard membership matches the local hash
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def shardOf(k: Long): String = {
      val h = md.digest(k.toString.getBytes("UTF-8"))
      "%02x".format(h(0) & 0xff).substring(0, 1)
    }
    val expect = docs.groupBy(t => shardOf(t._1)).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum, g.map(_._1).min,
        g.map(_._1).max)).toMap
    got.foreach { r =>
      val e = expect(r.getAs[String]("shard"))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"),
        r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc")) == e)
    }
    // the fan-out is physical: one directory per shard value on disk
    val dirs = new java.io.File(dest).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == got.map(r => s"shard=${r.getAs[String]("shard")}").sorted.toSeq)
  }

  test("partitioned JDBC read fans into 8 stride tasks and reassembles the table") {
    val dest = Files.createTempDirectory("jdbcpart").toString
    val db = TableCopy.JdbcStore(s"jdbc:derby:$dest/db;create=true",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"),
      numPartitions = 8, partitionColumn = Some("c_custkey"))
    val cust = Tables.load(spark, sf, "customer")
    db.write(cust, "customer", TableCopy.Recreate)
    val back = db.read(spark, "customer")
    // the read plan is genuinely parallel: one task per stride predicate
    assert(back.rdd.getNumPartitions == 8)
    // and the strides are disjoint + exhaustive: exact content equality
    assert(back.count() == cust.count())
    assert(back.select("c_custkey").except(cust.select("c_custkey")).isEmpty)
    assert(cust.select("c_custkey").except(back.select("c_custkey")).isEmpty)
  }

  test("dedupCopy keeps the earliest doc per text and the ledger balances") {
    val dest = Files.createTempDirectory("dedupcopy").toString + "/documents"
    val ledger = TableCopy.dedupCopy(spark, sf, dest).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // ledger balances per source and in total
    assert(ledger.map(_.getAs[Long]("n_in")).sum == docs.length.toLong)
    ledger.foreach { r =>
      assert(r.getAs[Long]("n_in") ==
        r.getAs[Long]("n_out") + r.getAs[Long]("n_dropped"))
    }
    // the destination holds exactly the min-doc_id survivor per text
    val survivors = docs.groupBy(_._2).map(_._2.map(_._1).min).toSet
    val written = spark.read.parquet(dest).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(written == survivors)
  }

  test("publishCopy stages, audits, and atomically swaps the final directory") {
    val dest = Files.createTempDirectory("publish").toString + "/supplier"
    val out = TableCopy.publishCopy(spark, sf, dest).collect()
    val src = Tables.load(spark, sf, "supplier")
    assert(out.length == src.count())
    // the staging directory is gone, the final one exists
    assert(!new java.io.File(dest + ".staging").exists())
    assert(new java.io.File(dest).exists())
    // re-publish over the existing table succeeds (swap, not append)
    val again = TableCopy.publishCopy(spark, sf, dest).collect()
    assert(again.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).toSeq)
    assert(spark.read.parquet(dest).count() == src.count())
  }

  test("pruneRetention drops exactly the partitions older than the cutoff") {
    val dest = tmpDir() + "/events_by_day"
    val out = TableCopy.pruneRetention(spark, sf, dest, keepDays = 7).collect()
    val days = Tables.load(spark, sf, "events")
      .select(to_date(col("ts")).as("d")).collect()
      .map(_.getDate(0).toLocalDate)
    val maxDay = days.max
    val cutoff = maxDay.minusDays(7)
    val expected = days.filter(!_.isBefore(cutoff))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.length == expected.size)
    out.foreach { r =>
      val d = java.time.LocalDate.parse(r.getAs[String]("day"))
      assert(!d.isBefore(cutoff), s"$d survived past the cutoff")
      assert(r.getAs[Long]("n_events") == expected(d))
    }
    // the dropped partitions are gone from disk, the kept ones remain
    val dirs = new java.io.File(dest).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(f => java.time.LocalDate.parse(f.getName.stripPrefix("day=")))
    assert(dirs.forall(d => !d.isBefore(cutoff)))
    assert(dirs.length == expected.size)
  }

  test("vacuum removes planted orphans and restores an exact readback") {
    val dest = tmpDir() + "/orders_vacuum"
    val out = TableCopy.vacuum(spark, sf, dest).collect()(0)
    val nSrc = Tables.load(spark, sf, "orders").count()
    assert(out.getAs[Long]("n_rows") == nSrc,
      "post-vacuum readback equals the source row count")
    assert(out.getAs[Int]("n_orphans_removed") == 2)
    val names = new java.io.File(dest).listFiles().map(_.getName)
    assert(!names.contains("part-orphan-retry.parquet"))
    assert(!names.contains("writer-leftover.tmp"))
  }

  test("computed columns: dialect DDL shapes are golden") {
    assert(TableCopy.SqlDialect.Derby
      .computedColumnSql("c_bal_x2", "DOUBLE", "\"c_acctbal\" * 2") ==
      "\"c_bal_x2\" DOUBLE GENERATED ALWAYS AS (\"c_acctbal\" * 2)")
    assert(TableCopy.SqlDialect.Postgres
      .computedColumnSql("c_bal_x2", "DOUBLE PRECISION", "c_acctbal * 2") ==
      "\"c_bal_x2\" DOUBLE PRECISION GENERATED ALWAYS AS (c_acctbal * 2) STORED")
    assert(TableCopy.SqlDialect.SqlServer
      .computedColumnSql("c_bal_x2", "FLOAT", "c_acctbal * 2") ==
      "\"c_bal_x2\" AS (c_acctbal * 2) PERSISTED")
  }

  test("computed columns replicate live: Derby computes, catalog reads back, fact re-scripts") {
    val store = derbyStore()
    val m = TableCopy.TableMeta(
      primaryKey = Seq("n_nationkey"),
      computed = Seq(("n_key_x10", "BIGINT", "\"n_nationkey\" * 10")))
    TableCopy.copy(spark, TableCopy.ParquetStore(sf), store, "nation",
      TableCopy.Recreate, replicateMeta = true, metaOverride = Some(m))
    // Derby computed the column for every bulk-loaded row.
    val rows = store.read(spark, "nation")
      .select("n_nationkey", "n_key_x10").collect()
    assert(rows.length == 25)
    rows.foreach(r => assert(r.getAs[Long]("n_key_x10") == r.getInt(0) * 10L))
    // The generated fact reads back from the live catalog WITH its
    // expression, so it can re-script onto a further destination.
    val back = store.meta(spark, "nation")
    val comp = back.computed
    assert(comp.map(_._1) == Seq("n_key_x10"))
    assert(comp.head._3.replaceAll("\\s+", "") == "\"n_nationkey\"*10")
    // ...and the destination column stays LIVE: a post-copy insert gets
    // the computed value from the engine, not a NULL.
    val conn = java.sql.DriverManager.getConnection(store.url)
    try {
      conn.createStatement().executeUpdate(
        "INSERT INTO nation (\"n_nationkey\", \"n_name\", \"n_regionkey\") " +
          "VALUES (99, 'TESTLAND', 0)")
      val rs = conn.createStatement().executeQuery(
        "SELECT \"n_key_x10\" FROM nation WHERE \"n_nationkey\" = 99")
      assert(rs.next() && rs.getLong(1) == 990L)
    } finally conn.close()
  }

  test("trigger replication preserves UPDATE OF column lists and WHEN guards") {
    // ADVICE r10: a column-scoped or conditional trigger replicated as an
    // unconditional fire-on-every-update trigger is a SILENT semantic
    // change on copy. Source carries AFTER UPDATE OF "bal" ... WHEN
    // (N."bal" > 100.0); the copy must land BOTH facts, proven by firing.
    val srcStore = derbyStore()
    val dstStore = derbyStore()
    val seed = spark.range(3).selectExpr("id", "CAST(10.0 AS DOUBLE) AS bal",
      "CAST('x' AS STRING) AS note")
    srcStore.write(seed, "acct", TableCopy.Recreate)
    locally {
      val c = java.sql.DriverManager.getConnection(srcStore.url)
      try {
        c.createStatement().executeUpdate(
          """CREATE TABLE acct_audit ("id" BIGINT)""")
        c.createStatement().executeUpdate(
          """CREATE TRIGGER bal_tr AFTER UPDATE OF "bal" ON acct """ +
            """REFERENCING NEW AS N FOR EACH ROW """ +
            """WHEN (N."bal" > 100.0) """ +
            """INSERT INTO acct_audit VALUES (N."id")""")
      } finally c.close()
    }
    TableCopy.copy(spark, srcStore, dstStore, "acct_audit", TableCopy.Recreate)
    TableCopy.copy(spark, srcStore, dstStore, "acct", TableCopy.Recreate,
      replicateMeta = true)
    // The destination catalog read-back carries both clauses.
    val ddl = dstStore.meta(spark, "acct").triggers match {
      case Seq((n, d)) => assert(n == "BAL_TR"); d
      case other => fail(s"expected one replicated trigger, got $other")
    }
    assert(ddl.contains("UPDATE OF \"bal\""), ddl)
    assert(ddl.contains("WHEN (") && ddl.contains("> 100.0"), ddl)
    // Live semantics on the DESTINATION: non-scoped column update and a
    // guard-false update fire nothing; a guard-true update of the scoped
    // column fires exactly once.
    val c = java.sql.DriverManager.getConnection(dstStore.url)
    try {
      def audits(): Long = {
        val rs = c.createStatement().executeQuery(
          "SELECT COUNT(*) FROM acct_audit")
        rs.next(); rs.getLong(1)
      }
      val base = audits()
      c.createStatement().executeUpdate(
        """UPDATE acct SET "note" = 'y' WHERE "id" = 0""")
      assert(audits() == base, "non-scoped column update must not fire")
      c.createStatement().executeUpdate(
        """UPDATE acct SET "bal" = 50.0 WHERE "id" = 1""")
      assert(audits() == base, "guard-false update must not fire")
      c.createStatement().executeUpdate(
        """UPDATE acct SET "bal" = 500.0 WHERE "id" = 2""")
      assert(audits() == base + 1, "guard-true scoped update fires once")
    } finally c.close()
  }

  test("copyViews replicates the view stack in dependency rounds (r12 #7)") {
    val srcUrl = s"jdbc:derby:memory:viewsrc${System.nanoTime()};create=true"
    val dstUrl = s"jdbc:derby:memory:viewdst${System.nanoTime()};create=true"
    val srcDb = TableCopy.JdbcStore(srcUrl,
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    val dstDb = TableCopy.JdbcStore(dstUrl,
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    srcDb.write(Tables.load(spark, sf, "region"), "region", TableCopy.Recreate)
    val c = java.sql.DriverManager.getConnection(srcUrl)
    try {
      // Three-deep chain with names REVERSED vs dependency order, plus a
      // view over a table that will not exist on the destination — the
      // unresolvable (-1) manifest path.
      c.createStatement().executeUpdate(
        """CREATE VIEW v_c AS SELECT "r_regionkey", "r_name" FROM region""")
      c.createStatement().executeUpdate(
        """CREATE VIEW v_b AS SELECT "r_name" FROM v_c WHERE "r_regionkey" > 0""")
      c.createStatement().executeUpdate(
        """CREATE VIEW v_a AS SELECT "r_name" FROM v_b""")
      c.createStatement().executeUpdate(
        """CREATE TABLE only_src ("x" INT)""")
      c.createStatement().executeUpdate(
        """CREATE VIEW v_orphan AS SELECT "x" FROM only_src""")
    } finally c.close()
    dstDb.write(Tables.load(spark, sf, "region"), "region", TableCopy.Recreate)
    val manifest = TableCopy.copyViews(spark, srcDb, dstDb).toMap
    // Manifest keys are schema-qualified (ADVICE r12: bare names let
    // same-named views in two schemas clobber each other's entry).
    assert(manifest == Map("APP.V_A" -> 3, "APP.V_B" -> 2, "APP.V_C" -> 1,
      "APP.V_ORPHAN" -> -1))
    // Destination catalog readback and a live query through the stack.
    assert(dstDb.views(spark).map(_._1) == Seq("APP.V_A", "APP.V_B", "APP.V_C"))
    val d = java.sql.DriverManager.getConnection(dstUrl)
    try {
      val rs = d.createStatement().executeQuery("SELECT COUNT(*) FROM v_a")
      rs.next()
      assert(rs.getLong(1) == 4L) // 5 regions, r_regionkey > 0
    } finally d.close()
  }

  test("copyRoutines replicates sequences + routines, all live-fire on the destination (r13 #385)") {
    val srcUrl = s"jdbc:derby:memory:procsrc${System.nanoTime()};create=true"
    val dstUrl = s"jdbc:derby:memory:procdst${System.nanoTime()};create=true"
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val c = java.sql.DriverManager.getConnection(srcUrl)
    try {
      val st = c.createStatement()
      st.executeUpdate("CREATE SEQUENCE S1 AS BIGINT START WITH 10 " +
        "INCREMENT BY 3 MINVALUE 1 MAXVALUE 99999 NO CYCLE")
      // Fetch the row — Derby evaluates NEXT VALUE lazily; an unfetched
      // result set never issues the value.
      locally { val r = st.executeQuery("VALUES NEXT VALUE FOR S1")
        r.next(); assert(r.getLong(1) == 10); r.close() }
      st.executeUpdate("CREATE FUNCTION SQABS(X DOUBLE) RETURNS DOUBLE " +
        "PARAMETER STYLE JAVA NO SQL LANGUAGE JAVA " +
        "EXTERNAL NAME 'java.lang.Math.abs'")
      st.executeUpdate("CREATE PROCEDURE PNAP(IN MS BIGINT) " +
        "PARAMETER STYLE JAVA NO SQL LANGUAGE JAVA " +
        "EXTERNAL NAME 'java.lang.Thread.sleep'")
    } finally c.close()
    val srcDb = TableCopy.JdbcStore(srcUrl, drv)
    val dstDb = TableCopy.JdbcStore(dstUrl, drv)
    // Discovery reassembles executable DDL from the decomposed catalog.
    val seqs = srcDb.sequences(spark)
    assert(seqs.map(_._1) == Seq("APP.S1"))
    assert(seqs.head._2.startsWith("CREATE SEQUENCE S1 AS BIGINT START WITH "))
    val routines = srcDb.routines(spark)
    assert(routines.map(r => (r._1, r._2)) ==
      Seq(("APP.SQABS", "F"), ("APP.PNAP", "P")))
    assert(routines.head._3.contains("EXTERNAL NAME 'java.lang.Math.abs'"))
    val manifest = TableCopy.copyRoutines(spark, srcDb, dstDb)
    assert(manifest == Seq(("APP.S1", "S", "ok"), ("APP.SQABS", "F", "ok"),
      ("APP.PNAP", "P", "ok")))
    val d = java.sql.DriverManager.getConnection(dstUrl)
    try {
      val rs = d.createStatement().executeQuery("VALUES SQABS(-2.5E0)")
      rs.next(); assert(rs.getDouble(1) == 2.5)
      d.prepareCall("CALL PNAP(1)").execute()
      val rs2 = d.createStatement().executeQuery("VALUES NEXT VALUE FOR S1")
      rs2.next(); val nxt = rs2.getLong(1)
      // Continuation: on the source's grid and past the issued value 10.
      assert(nxt > 10 && (nxt - 10) % 3 == 0, s"dest sequence restarted at $nxt")
    } finally d.close()
  }

  test("copySynonyms replicates table/view/chained synonyms, live-resolved on the destination (r13 #391)") {
    val srcUrl = s"jdbc:derby:memory:synsrc${System.nanoTime()};create=true"
    val dstUrl = s"jdbc:derby:memory:syndst${System.nanoTime()};create=true"
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val srcDb = TableCopy.JdbcStore(srcUrl, drv)
    val dstDb = TableCopy.JdbcStore(dstUrl, drv)
    srcDb.write(Tables.load(spark, sf, "region"), "region", TableCopy.Recreate)
    val c = java.sql.DriverManager.getConnection(srcUrl)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        """CREATE VIEW REG_V AS SELECT "r_name" FROM region WHERE "r_regionkey" > 1""")
      st.executeUpdate("CREATE SYNONYM REG_S FOR region")
      st.executeUpdate("CREATE SYNONYM REGV_S FOR REG_V")
      st.executeUpdate("CREATE SYNONYM REG_CHAIN FOR REG_S"): Unit
    } finally c.close()
    // Discovery: target spelled exactly as the catalog stores it
    // (qualified + quoted), chain target is the intermediate synonym.
    val disc = srcDb.synonyms(spark).toMap
    assert(disc.keySet == Set("APP.REG_S", "APP.REGV_S", "APP.REG_CHAIN"))
    assert(disc("APP.REG_CHAIN") == "CREATE SYNONYM REG_CHAIN FOR \"APP\".\"REG_S\"")
    dstDb.write(Tables.load(spark, sf, "region"), "region", TableCopy.Recreate)
    assert(TableCopy.copyViews(spark, srcDb, dstDb).toMap == Map("APP.REG_V" -> 1))
    val manifest = TableCopy.copySynonyms(spark, srcDb, dstDb)
    assert(manifest.toMap ==
      Map("APP.REG_S" -> "ok", "APP.REGV_S" -> "ok", "APP.REG_CHAIN" -> "ok"))
    // Live resolution THROUGH the chain and through the view synonym —
    // creation never validates targets (Derby resolves at query time), so
    // this query is the replication proof, not the DDL replay.
    val d = java.sql.DriverManager.getConnection(dstUrl)
    try {
      val rs = d.createStatement()
        .executeQuery("SELECT COUNT(*), SUM(\"r_regionkey\") FROM REG_CHAIN")
      rs.next(); assert(rs.getLong(1) == 5L && rs.getLong(2) == 10L)
      val rs2 = d.createStatement().executeQuery("SELECT COUNT(*) FROM REGV_S")
      rs2.next(); assert(rs2.getLong(1) == 3L) // regionkeys 2,3,4
    } finally d.close()
  }

  test("copyGrants replicates table and column grants; the destination enforces them live (r13 #392)") {
    // sqlAuthorization is a STATIC database property: set, shut down,
    // reboot — only then do GRANT/REVOKE checks run. Authentication stays
    // off: connections CLAIM a user; authorization judges the claim.
    def authzDb(name: String): String = {
      val base = s"jdbc:derby:memory:$name${System.nanoTime()}"
      val c = java.sql.DriverManager.getConnection(s"$base;create=true")
      try c.createStatement().executeUpdate(
        "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
          "'derby.database.sqlAuthorization', 'true')"): Unit
      finally c.close()
      try java.sql.DriverManager.getConnection(s"$base;shutdown=true")
      catch { case _: java.sql.SQLException => () }
      base
    }
    val srcUrl = authzDb("grsrc")
    val dstUrl = authzDb("grdst")
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val srcDb = TableCopy.JdbcStore(srcUrl, drv)
    val dstDb = TableCopy.JdbcStore(dstUrl, drv)
    srcDb.write(Tables.load(spark, sf, "region"), "region", TableCopy.Recreate)
    val c = java.sql.DriverManager.getConnection(srcUrl)
    try {
      val st = c.createStatement()
      st.executeUpdate("GRANT SELECT ON region TO ALICE")
      st.executeUpdate("GRANT SELECT, UPDATE ON region TO BOB")
      st.executeUpdate("GRANT UPDATE (\"r_name\") ON region TO CAROL"): Unit
    } finally c.close()
    // Discovery: flag columns unpacked to privilege words, SYSCOLPERMS'
    // 0-based position descriptor mapped to the real column name.
    assert(srcDb.grants(spark, "region") == Seq(
      ("ALICE", "SELECT", Seq.empty), ("BOB", "SELECT", Seq.empty),
      ("BOB", "UPDATE", Seq.empty), ("CAROL", "UPDATE", Seq("r_name"))))
    dstDb.write(Tables.load(spark, sf, "region"), "region", TableCopy.Recreate)
    val manifest = TableCopy.copyGrants(spark, srcDb, dstDb, Seq("region"))
    assert(manifest == Seq(
      ("region", "ALICE", "SELECT", "*", "ok"),
      ("region", "BOB", "SELECT", "*", "ok"),
      ("region", "BOB", "UPDATE", "*", "ok"),
      ("region", "CAROL", "UPDATE", "r_name", "ok")))
    def as(user: String) =
      java.sql.DriverManager.getConnection(s"$dstUrl;user=$user")
    def denied(conn: java.sql.Connection, sql: String): Boolean =
      try { conn.createStatement().execute(sql); false }
      catch { case e: java.sql.SQLException =>
        Set("42500", "42502")(e.getSQLState) }
    // ALICE: SELECT works, UPDATE rejected by the destination engine.
    val a = as("alice")
    try {
      val rs = a.createStatement()
        .executeQuery("SELECT COUNT(*) FROM APP.region")
      rs.next(); assert(rs.getLong(1) == 5L)
      assert(denied(a, "UPDATE APP.region SET \"r_name\" = 'X'"))
    } finally a.close()
    // MALLORY (never granted): SELECT rejected.
    val m = as("mallory")
    try assert(denied(m, "SELECT COUNT(*) FROM APP.region")) finally m.close()
    // CAROL: column-scoped UPDATE allowed on exactly its column. Constant
    // right-hand sides and no WHERE — any column REFERENCE would need a
    // SELECT grant carol doesn't have and would test the wrong privilege.
    val ca = as("carol")
    try {
      assert(ca.createStatement()
        .executeUpdate("UPDATE APP.region SET \"r_name\" = 'ZZZ'") == 5)
      assert(denied(ca, "UPDATE APP.region SET \"r_regionkey\" = 99"))
    } finally ca.close()
    // BOB got both verbs.
    val b = as("bob")
    try {
      assert(!denied(b, "SELECT COUNT(*) FROM APP.region"))
      assert(!denied(b, "UPDATE APP.region SET \"r_name\" = 'W'"))
    } finally b.close()
  }

  test("copyGrants surfaces grantees missing on the destination instead of replaying blind (VERDICT r13 missing #1)") {
    // Principals are NOT replicated (SMO scripts users/roles; this engine
    // cannot create logins). Where the destination can enumerate its
    // principals, a grant to an absent grantee must SKIP with a
    // missing-grantee manifest row. No SQL Server/Postgres engine runs
    // here, so the principal set is injected through the testable seam
    // (copyGrantsWith) over live Derby — and the live probe shows the
    // skipped grantee really has no access on the destination.
    def authzDb(name: String): String = {
      val base = s"jdbc:derby:memory:$name${System.nanoTime()}"
      val c = java.sql.DriverManager.getConnection(s"$base;create=true")
      try c.createStatement().executeUpdate(
        "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
          "'derby.database.sqlAuthorization', 'true')"): Unit
      finally c.close()
      try java.sql.DriverManager.getConnection(s"$base;shutdown=true")
      catch { case _: java.sql.SQLException => () }
      base
    }
    val srcUrl = authzDb("mgsrc")
    val dstUrl = authzDb("mgdst")
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val srcDb = TableCopy.JdbcStore(srcUrl, drv)
    val dstDb = TableCopy.JdbcStore(dstUrl, drv)
    srcDb.write(Tables.load(spark, sf, "region"), "region", TableCopy.Recreate)
    val c = java.sql.DriverManager.getConnection(srcUrl)
    try {
      val st = c.createStatement()
      st.executeUpdate("GRANT SELECT ON region TO ALICE")
      st.executeUpdate("GRANT SELECT ON region TO CAROL")
      st.executeUpdate("GRANT SELECT ON region TO PUBLIC"): Unit
    } finally c.close()
    dstDb.write(Tables.load(spark, sf, "region"), "region", TableCopy.Recreate)
    // Derby cannot enumerate principals (external authentication):
    assert(dstDb.knownPrincipals().isEmpty)
    // Injected destination principal set: ALICE exists (lower case — the
    // membership check is case-insensitive), CAROL does not. PUBLIC is
    // always a valid grantee, never missing.
    val manifest = TableCopy.copyGrantsWith(
      spark, srcDb, dstDb, Seq("region"), Some(Set("alice", "dave")))
    assert(manifest.map { case (_, g, _, _, st) => (g, st.takeWhile(_ != ':')) } == Seq(
      ("ALICE", "ok"), ("CAROL", "missing-grantee"), ("PUBLIC", "ok")))
    // Live enforcement on the destination: the skipped grantee has no
    // access of her own — she reaches the table only through PUBLIC, so
    // revoke that first and probe.
    val cd = java.sql.DriverManager.getConnection(dstUrl)
    try cd.createStatement()
      .executeUpdate("REVOKE SELECT ON region FROM PUBLIC"): Unit
    finally cd.close()
    def denied(conn: java.sql.Connection, sql: String): Boolean =
      try { conn.createStatement().execute(sql); false }
      catch { case e: java.sql.SQLException =>
        Set("42500", "42502")(e.getSQLState) }
    val ca = java.sql.DriverManager.getConnection(s"$dstUrl;user=carol")
    try assert(denied(ca, "SELECT COUNT(*) FROM APP.region"))
    finally ca.close()
    val a = java.sql.DriverManager.getConnection(s"$dstUrl;user=alice")
    try assert(!denied(a, "SELECT COUNT(*) FROM APP.region"))
    finally a.close()
  }

  test("grants discovery is schema-scoped: a same-named table in another schema leaks nothing (ADVICE r13 #1)") {
    // Same authz-database setup as the live-enforcement test above; here
    // the subject is DISCOVERY. Two same-named tables with DIFFERENT
    // column layouts and different grants: unscoped discovery would merge
    // both grant sets AND concatenate both column lists, so OTHER's
    // 0-based position descriptor {2} would resolve against APP.region's
    // columns — a silently widened grant on the wrong column.
    val base = s"jdbc:derby:memory:grsc${System.nanoTime()}"
    val c0 = java.sql.DriverManager.getConnection(s"$base;create=true")
    try c0.createStatement().executeUpdate(
      "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
        "'derby.database.sqlAuthorization', 'true')"): Unit
    finally c0.close()
    try java.sql.DriverManager.getConnection(s"$base;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    val db = TableCopy.JdbcStore(base,
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    val c = java.sql.DriverManager.getConnection(base)
    try {
      val st = c.createStatement()
      st.executeUpdate("CREATE TABLE region (r_key INT, r_name VARCHAR(10))")
      st.executeUpdate("CREATE SCHEMA OTHER")
      st.executeUpdate(
        "CREATE TABLE OTHER.region (a INT, b INT, zz_only_other VARCHAR(5))")
      st.executeUpdate("GRANT SELECT ON region TO ALICE")
      st.executeUpdate("GRANT DELETE ON OTHER.region TO EVE")
      // Position {2} in OTHER.region = zz_only_other; in a merged
      // APP+OTHER ordinal list position 2 would still bounds-check but
      // name an APP column.
      st.executeUpdate(
        "GRANT UPDATE (zz_only_other) ON OTHER.region TO EVE"): Unit
    } finally c.close()
    assert(db.grants(spark, "region") ==
      Seq(("ALICE", "SELECT", Seq.empty)),
      "bare name must bind the CURRENT schema only")
    assert(db.grants(spark, "OTHER.region") == Seq(
      ("EVE", "DELETE", Seq.empty),
      ("EVE", "UPDATE", Seq("ZZ_ONLY_OTHER"))),
      "qualified name must bind its own schema and resolve positions " +
        "against its own column list")
  }

  test("multi-schema copy: same-named tables stay distinct, FK order crosses schemas (r13 VERDICT #5)") {
    val srcUrl = s"jdbc:derby:memory:mssrc${System.nanoTime()};create=true"
    val dstUrl = s"jdbc:derby:memory:msdst${System.nanoTime()};create=true"
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val c = java.sql.DriverManager.getConnection(srcUrl)
    try {
      val st = c.createStatement()
      st.executeUpdate("CREATE SCHEMA ALPHA")
      st.executeUpdate("CREATE SCHEMA BETA")
      st.executeUpdate(
        """CREATE TABLE BETA.CUSTS ("id" INT PRIMARY KEY, "name" VARCHAR(20))""")
      st.executeUpdate(
        """CREATE TABLE ALPHA.ORDERS ("oid" INT PRIMARY KEY,
          | "cust" INT REFERENCES BETA.CUSTS ("id"), "amt" INT)""".stripMargin)
      // The dbo.Orders / archive.Orders shape: SAME table name, different
      // schema, different columns and rows.
      st.executeUpdate(
        """CREATE TABLE ALPHA.ITEMS ("k" INT PRIMARY KEY, "v" VARCHAR(10))""")
      st.executeUpdate(
        """CREATE TABLE BETA.ITEMS ("k" INT PRIMARY KEY, "w" INT)""")
      st.executeUpdate("INSERT INTO BETA.CUSTS VALUES (1, 'ada'), (2, 'bob')")
      st.executeUpdate("INSERT INTO ALPHA.ORDERS VALUES (10, 1, 100), (11, 2, 250)")
      st.executeUpdate("INSERT INTO ALPHA.ITEMS VALUES (1, 'x'), (2, 'y')")
      st.executeUpdate("INSERT INTO BETA.ITEMS VALUES (7, 70)")
    } finally c.close()
    val srcDb = TableCopy.JdbcStore(srcUrl, drv, schemaPattern = Some("%"))
    val dstDb = TableCopy.JdbcStore(dstUrl, drv)
    // Discovery: schema-qualified names; pattern = include, exclude subtracts.
    assert(srcDb.list(spark) ==
      Seq("ALPHA.ITEMS", "ALPHA.ORDERS", "BETA.CUSTS", "BETA.ITEMS"))
    assert(TableCopy.JdbcStore(srcUrl, drv, schemaPattern = Some("ALPHA"))
      .list(spark) == Seq("ALPHA.ITEMS", "ALPHA.ORDERS"))
    assert(TableCopy.JdbcStore(srcUrl, drv, schemaPattern = Some("%"),
      excludeSchemas = Set("BETA")).list(spark) ==
      Seq("ALPHA.ITEMS", "ALPHA.ORDERS"))
    // Per-schema metadata: the FK parent is qualified by ITS schema.
    assert(srcDb.meta(spark, "ALPHA.ORDERS").foreignKeys ==
      Seq(("cust", "BETA.CUSTS", "id")))
    assert(srcDb.meta(spark, "ALPHA.ITEMS").primaryKey == Seq("k"))
    assert(srcDb.meta(spark, "BETA.ITEMS").primaryKey == Seq("k"))
    val manifest = TableCopy.copyTablesWithSchema(spark, srcDb, dstDb)
      .collect().map(r => (r.getAs[String]("table_name"),
        r.getAs[Long]("n_rows"), r.getAs[String]("status")))
    assert(manifest.forall(_._3 == "ok"), manifest.mkString("; "))
    val pos = manifest.map(_._1).zipWithIndex.toMap
    assert(pos("BETA.CUSTS") < pos("ALPHA.ORDERS"),
      "FK topological order must cross schemas: parent BETA.CUSTS first")
    // Same-named tables landed DISTINCT, each with its own shape and rows.
    val aItems = dstDb.read(spark, "ALPHA.ITEMS")
    val bItems = dstDb.read(spark, "BETA.ITEMS")
    assert(aItems.columns.toSeq == Seq("k", "v") && aItems.count() == 2)
    assert(bItems.columns.toSeq == Seq("k", "w") && bItems.count() == 1)
    assert(dstDb.read(spark, "ALPHA.ORDERS").count() == 2)
    // The cross-schema FK is LIVE on the destination.
    val d = java.sql.DriverManager.getConnection(dstUrl)
    try {
      val e = intercept[java.sql.SQLException] {
        d.createStatement().executeUpdate(
          "INSERT INTO ALPHA.ORDERS VALUES (12, 99, 1)")
      }
      assert(e.getSQLState == "23503", s"expected FK violation, got $e")
    } finally d.close()
  }
}
