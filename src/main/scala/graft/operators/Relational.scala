package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** The relational query surface (SURVEY.md §2.2) as declarative DataFrame
  * programs. Everything is built from `org.apache.spark.sql.functions` so
  * Catalyst owns pushdown / pruning / join selection and whole-stage codegen
  * covers the hot paths. No UDFs, no collect-loops.
  *
  * Cross-engine determinism: double aggregations are computed as
  * `sum(cast(x as decimal)) :: double` — the decimal sum is exact, so the
  * result is bit-identical regardless of partition count or add order. This is
  * also the 100 TB-safe formulation (a parallel double sum is
  * order-dependent; a decimal sum is not).
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact money sum: cast to decimal(18,2) (inputs are 2-decimal), sum
    * exactly, surface as double.
    */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Distributed `ntile(k)` over a global order: [[PrefixScan.rowNumber]]
    * plus the standard SQL tile formula (with n = q·k + r, the first r
    * tiles hold q+1 rows) — bit-identical to Spark's and DuckDB's `ntile`,
    * with no unpartitioned window over the frame being ranked.
    */
  private def globalNtile(df: DataFrame, k: Int, chunkOn: String,
      orderCols: Seq[Column], outCol: String): DataFrame = {
    val rn = PrefixScan.rowNumber(df, chunkOn, orderCols, "__rn")
    val n = df.agg(count(lit(1)).as("__n"))
    rn.crossJoin(broadcast(n))
      .withColumn(outCol, expr(
        s"CAST(CASE WHEN __rn <= (__n div $k + 1) * (__n % $k) " +
          s"THEN (__rn - 1) div (__n div $k + 1) + 1 " +
          s"ELSE (__n % $k) + ((__rn - 1) - (__n div $k + 1) * (__n % $k)) " +
          s"div (__n div $k) + 1 END AS INT)"))
      .drop("__rn", "__n")
  }

  /** Exact sum of per-row double products (e.g. price * (1-discount)): the
    * per-row product is deterministic IEEE math; casting it to decimal(28,6)
    * before the sum makes the aggregation order-independent.
    */
  private def dsum6(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** §2.2 #6 — filter + projection; predicate and column pruning reach the
    * parquet scan (PushedFilters / ReadSchema in explain).
    */
  def filterPushdown(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01") &&
             col("l_shipdate") < lit("1997-01-01") &&
             col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // TOTAL order: the synthetic corpus has duplicate (orderkey,
      // linenumber) pairs, and a non-total ORDER BY leaves tie order
      // engine-dependent (caught by the sf10 probe — equal multisets,
      // different row order). Order by every output column.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** §2.2 #7 — TPC-H Q1-shaped rollup over lineitem. Partial (map-side)
    * aggregation + a 6-group shuffle; scan reads only the 5 needed columns.
    */
  def aggQ1(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** §2.2 #8 — fact x small-dim join. `broadcast(part)` pins a broadcast hash
    * join: zero shuffle of the fact side at any scale (part is bounded).
    */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("p_brand")

  /** §2.2 #9 — multi-way star join: all dimension hops broadcast, the single
    * fact-fact hop (orders x lineitem) shuffles once on the join key. AQE can
    * still re-plan skew at runtime.
    */
  def joinStar(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region")
    val nation = t(spark, dir, "nation")
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
    val lineitem = t(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** §2.2 #10 — global top-N: orderBy + limit compiles to
    * TakeOrderedAndProject (per-partition heap + driver merge of N rows, never
    * a full global sort). Tie-broken on the unique key for determinism.
    */
  def topN(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** §2.2 #11 — window functions per user over events. One shuffle on
    * user_id; ordering inside the window is on the unique event_id so results
    * are reproducible across engines and partitionings.
    */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(spark, dir, "events")
      .select(
        col("event_id"), col("user_id"), col("value"),
        row_number().over(w).as("rn"),
        lag("value", 1).over(w).as("prev_value"))
      .orderBy("event_id")
  }

  /** §2.2 #12 — timestamp bucketing: events per day x type. The day bucket is
    * surfaced as an ISO string so the result is representation-stable across
    * engines (DATE physical encodings differ; 'yyyy-MM-dd' does not).
    */
  def timeBucket(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("day", "event_type")

  /** §2.2 #13 — semi-structured parse: props JSON -> typed column -> agg.
    * `from_json` with an explicit schema keeps the whole pipeline codegen'd.
    */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .groupBy(pmod(col("k"), lit(10)).as("k_bucket"))
      .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("k_bucket")

  /** §2.2 #14 — set operations: nations that have customers INTERSECT / EXCEPT
    * nations that have suppliers.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation")
    val custN = t(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select("n_name")
    val suppN = t(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("n_name")
    custN.intersect(suppN).withColumn("tag", lit("both"))
      .unionByName(custN.except(suppN).withColumn("tag", lit("cust_only")))
      .orderBy("tag", "n_name")
  }

  /** §2.2 #85 — BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    * multiplicities survive — a nation with 7 customers and 3 suppliers
    * intersects 3 times and excepts 4. Spark plans both as aggregate+join
    * on (value, count) — one shuffle each, no row explosion. Multiset
    * results surface as (tag, name, multiplicity) counts so the comparison
    * is order-free.
    */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation")
    val custN = t(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select("n_name")
    val suppN = t(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("n_name")
    custN.intersectAll(suppN).withColumn("tag", lit("both"))
      .unionByName(custN.exceptAll(suppN).withColumn("tag", lit("cust_extra")))
      .groupBy("tag", "n_name")
      .agg(count(lit(1)).as("multiplicity"))
      .orderBy("tag", "n_name")
  }

  /** §2.2 #15 — left-semi join (EXISTS): customers with at least one order.
    * Semi join never duplicates or widens rows — at scale it shuffles only the
    * join keys of the probe side.
    */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** §2.2 #16 — left-anti join (NOT EXISTS): parts never sold near the
    * maximum discount (the right side is pre-filtered so the anti set is
    * non-empty at every scale factor).
    *
    * The build side is pre-aggregated to DISTINCT join keys: an anti join
    * only needs key existence, and the distinct is bounded by part
    * cardinality no matter how large lineitem grows — the scale-robust
    * shape (a raw filtered fact table as build side grows with the data).
    * AQE picks broadcast vs shuffle for the key set from its runtime size.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val soldKeys = t(spark, dir, "lineitem")
      .where(col("l_discount") >= 0.09)
      .select("l_partkey").distinct()
    t(spark, dir, "part")
      .join(soldKeys, col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** §2.2 #17 — ROLLUP grouping sets with subtotal rows; grouping-set nulls
    * surfaced as '*' so ordering is engine-neutral (null-order defaults
    * differ across engines).
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("*")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("*")).as("linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** §2.2 #18 — DISTINCT projection across a join (dedup after widening). */
  def distinctJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .select("c_mktsegment", "o_orderpriority")
      .distinct()
      .orderBy("c_mktsegment", "o_orderpriority")

  /** §2.2 #19 — string function suite over part (all codegen'd builtins). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"),
        col("p_name").like("%e%").as("has_e"))
      .orderBy("p_partkey")

  /** §2.2 #20 — multi-column global sort (range-partitioned exchange; each
    * output partition is a sorted, non-overlapping key range).
    */
  def sortMulti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .orderBy(col("l_returnflag").desc, col("l_quantity").asc,
               col("l_orderkey").asc, col("l_linenumber").asc)

  /** §2.2 #21 — aggregation + HAVING (post-agg filter): nations with an
    * above-average customer count. The threshold is relative (count * 25 >
    * total), so the query is meaningful at every scale factor; the scalar
    * total rides along as a 1-row broadcast, not a driver round-trip.
    */
  def havingAgg(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val total = customer.agg(count(lit(1)).as("total_cust"))
    customer
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .crossJoin(broadcast(total))
      .where(col("n_cust") * 25 > col("total_cust"))
      .select("c_nationkey", "n_cust", "sum_bal")
      .orderBy("c_nationkey")
  }

  /** §2.2 #22 — conditional aggregation (CASE WHEN pivot-style). */
  def caseWhenAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0)))
          .as("f_revenue"))
      .orderBy("o_orderpriority")

  /** §2.2 #39 — CUBE grouping sets: every (returnflag x linestatus) subtotal
    * combination including both-axis totals; grouping-set nulls surfaced as
    * '*' for engine-neutral ordering. Same partial-aggregation expansion as
    * ROLLUP — each input row feeds 4 grouping sets map-side, one shuffle.
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("*")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("*")).as("linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** §2.2 #40 — top-k per group (the "latest/largest N per key" workhorse):
    * rank() over each order-priority partition, keep the top 3 orders by
    * price. One shuffle on the partition key; each partition ranks
    * independently — at 100 TB this is the skew-safe alternative to a global
    * sort when only per-group leaders are needed.
    */
  def topKPerGroup(spark: SparkSession, dir: String, k: Int = 3,
      buckets: Int = 32): DataFrame = {
    // Two-phase: rank within (group, bucket) first and keep local rank <= k.
    // For any row, global rank >= local rank (the global ordering sees a
    // superset of strictly-greater rows), so no row with global rank <= k is
    // ever dropped — tie semantics of rank() preserved exactly. Each bucket
    // sorts 1/buckets of a group; the final rank runs over ~k·buckets
    // candidates per group instead of the whole group on one reducer.
    val order = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val wLocal = Window.partitionBy(col("o_orderpriority"), col("bkt")).orderBy(order: _*)
    val wGlobal = Window.partitionBy("o_orderpriority").orderBy(order: _*)
    t(spark, dir, "orders")
      .withColumn("bkt", pmod(col("o_orderkey"), lit(buckets)))
      .withColumn("lrnk", rank().over(wLocal))
      .where(col("lrnk") <= k)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(wGlobal).as("rnk"))
      .where(col("rnk") <= k)
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  /** §2.2 #41 — Pearson correlation per group, computed from EXACT decimal
    * moment sums (n, Σx, Σy, Σxy, Σx², Σy²) combined in double at the end.
    * Built-in corr() is a running-merge formula whose result depends on
    * partition order — useless both for cross-engine checks and for
    * reproducible 100 TB runs. Decimal moments are order-free, so this
    * formulation is simultaneously the deterministic one and the one whose
    * aggregation state is 6 numbers per group regardless of data size.
    */
  def corrAgg(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = sum(c.cast(DecimalType(28, 6))).cast("double")
    val x = col("l_quantity"); val y = col("l_discount")
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        d(x).as("sx"), d(y).as("sy"),
        d(x * y).as("sxy"), d(x * x).as("sxx"), d(y * y).as("syy"))
      .select(col("l_returnflag"),
        // Non-finite-guarded fl6 (ADVICE r12): a zero-variance group's
        // 0/0 or sqrt-of-0 denominator must not fabricate a finite corr.
        fl6((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_qty_disc"),
        col("n").cast("long").as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** §2.2 #110 — bloom-filter runtime-filter join (the explicit form of
    * Spark's InjectRuntimeFilter): a selective predicate on one fact side
    * (urgent 1997 orders) would normally still force the OTHER fact side
    * (lineitem) to shuffle in full for the sort-merge join. Instead the
    * selected keys are folded into a bloom filter — built distributedly,
    * partial filters OR-merge associatively, a few MB at any build size —
    * and probed inside the lineitem scan via the codegen'd
    * [[graft.functions.BloomMightContain]] kernel, so ~96% of lineitem
    * never reaches the exchange. False positives only ever ADMIT rows and
    * the real join drops them, so the result is provably identical to the
    * plain join — which is exactly what the oracle asserts.
    *
    * At 100 TB: build-side count + bloom build are one pass over the small
    * selection (the count sizes the filter; stats would replace it on a
    * real cluster); the probe is scan-speed per-row work with zero shuffle.
    * Broadcast-hash-join is NOT generally available here — the selection is
    * only small at low SF; the bloom path works at any build size where a
    * broadcast would OOM.
    */
  def bloomJoin(spark: SparkSession, dir: String, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftglue.{columnExpr, exprColumn}
    val sel = t(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT" && year(col("o_orderdate")) === 1997)
      .select("o_orderkey", "o_orderdate")
    val nKeys = math.max(1L, sel.count())
    val bloom = sel.stat.bloomFilter("o_orderkey", nKeys, fpp)
    val fact = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .where(exprColumn(graft.functions.BloomMightContain(
        columnExpr(col("l_orderkey")), bloom)))
    fact.join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_month")
  }

  /** §2.2 #44 — skew-salted fact-fact join, HOT KEYS ONLY: a cheap
    * keys-with-most-rows pass (aggregate + top-k, broadcast back — at real
    * scale this runs over a sample) identifies the `hotK` heaviest join
    * keys; only THOSE keys salt (probe side: deterministic salt from the
    * unique line number; build side: replicated across all `salts` values),
    * everything else joins on salt 0 unreplicated. One hot key spreads over
    * `salts` reducers instead of melting one, while the replication cost is
    * `salts × hotK` rows — independent of table size — rather than
    * `salts × |orders|` as whole-side salting would pay. Result is provably
    * identical to the plain join (the oracle IS the plain join). At 100 TB
    * this is the manual fallback when single keys exceed even AQE's
    * skew-split thresholds.
    */
  def joinSalted(spark: SparkSession, dir: String, salts: Int = 8,
      hotK: Int = 100): DataFrame = {
    val hot = t(spark, dir, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_orderkey"))
      .limit(hotK)
      .select(col("l_orderkey").as("hot_key"))
    val li = t(spark, dir, "lineitem")
      .join(broadcast(hot), col("l_orderkey") === col("hot_key"), "left_outer")
      .withColumn("salt",
        when(col("hot_key").isNotNull, pmod(col("l_linenumber"), lit(salts)))
          .otherwise(lit(0)))
      .drop("hot_key")
    val ord = t(spark, dir, "orders")
      .join(broadcast(hot), col("o_orderkey") === col("hot_key"), "left_outer")
      .withColumn("salt", explode(
        when(col("hot_key").isNotNull, expr(s"sequence(0, ${salts - 1})"))
          .otherwise(array(lit(0)))))
      .drop("hot_key")
    li.join(ord,
        col("l_orderkey") === col("o_orderkey") && li("salt") === ord("salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** §2.2 #50 — left outer join with null-extension: every customer with
    * their order count and spend, INCLUDING customers who never ordered
    * (the rows an inner join silently drops). Nulls from the outer side are
    * coalesced to zero so the result is engine-neutral. Same shuffle
    * economics as the inner join; the outer side just keeps its unmatched
    * rows.
    */
  def outerJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_name")
      .agg(
        count(col("o_orderkey")).as("n_orders"), // count(col) skips nulls
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")

  /** §2.2 #51 — running aggregate with an explicit window frame: cumulative
    * event value per user in event order (ROWS UNBOUNDED PRECEDING). The
    * frame order is pinned by the unique event_id, so the sequential
    * accumulation is identical on every engine and partitioning.
    */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        (floor((sum("value").over(w)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("running_value"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy("event_id")
  }

  /** §2.2 #52 — relational pivot: order counts by priority x status, statuses
    * widened to columns through the Dataset `pivot` API with an explicit
    * value list (explicit values keep the plan a single pass — no extra job
    * to discover the pivot domain).
    */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  /** §2.2 #48 — exact discrete percentiles per group (p50/p95 of order
    * totals by priority) via a VALUE HISTOGRAM: first `groupBy(group,
    * value).count()` — fully parallel, shuffle keyed on (group, value) —
    * then a cumulative count over the DISTINCT values of each group picks
    * the smallest value whose cumulative count reaches ceil(p·n). That is
    * definitionally the rank-ceil(p·n) value (what percentile_disc
    * computes), but the per-group sort runs over distinct values, not rows:
    * at 100 TB a group's reducer handles |distinct prices| entries (bounded
    * by the value domain) instead of sorting terabytes of rows — the
    * difference between an exact percentile that scales and one that melts
    * a reducer per group.
    */
  def percentileAgg(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy("o_orderpriority")
      .orderBy("o_totalprice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("o_orderpriority")
    t(spark, dir, "orders")
      .groupBy("o_orderpriority", "o_totalprice")
      .agg(count(lit(1)).as("cnt"))
      .select(col("o_orderpriority"), col("o_totalprice"),
        sum("cnt").over(wCum).as("cum"),
        sum("cnt").over(wAll).as("n"))
      .groupBy("o_orderpriority")
      .agg(
        min(when(col("cum") >= ceil(col("n") * 0.5).cast("long"), col("o_totalprice"))).as("p50"),
        min(when(col("cum") >= ceil(col("n") * 0.95).cast("long"), col("o_totalprice"))).as("p95"),
        max(col("n")).as("n_rows"))
      .orderBy("o_orderpriority")
  }

  /** §2.2 #49 — fixed-width histogram of lineitem quantity: 10 buckets of
    * width 5 over [1, 50]. Bucketing is integer-floor arithmetic — a single
    * map-side expression — then one tiny aggregation; the 100 TB histogram
    * costs one scan.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(least(floor((col("l_quantity") - 1) / 5), lit(9)).cast("int").as("bucket"),
        col("l_quantity"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"))
      .orderBy("bucket")

  /** §2.2 #42 — calendar/date function suite over event timestamps (year /
    * month / day-of-month / hour / day difference from a fixed epoch). Pure
    * per-row projections, codegen'd; the day difference uses DATE-level
    * arithmetic which both engines define identically.
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        year(col("ts")).as("yr"),
        month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("hr"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("days_since"))
      .orderBy("event_id")

  /** §2.2 #65 — batch sessionization: the window-function twin of the
    * streaming `EventStream.sessionize`. A new session starts when the gap
    * from the previous event (per user, ordered by event time with event_id
    * tie-break) exceeds `gapMinutes`; the session id is the running count of
    * session starts. One shuffle on user_id + one partition-local sort
    * covers both windows AND the final aggregation — timestamps surface as
    * epoch micros so the result is engine-exact.
    */
  def sessionizeBatch(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("prev_us", lag("t_us", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("t_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_seq",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_seq")
      .agg(count(lit(1)).as("n_events"),
        min("t_us").as("first_us"), max("t_us").as("last_us"),
        dsum(col("value")).as("total_value"))
      .orderBy("user_id", "sess_seq")
  }

  /** §2.2 #109 — event-sequence transition matrix (first-order Markov):
    * for every (from_type → to_type) pair, how many times a user's next
    * event was `to_type`, and the row-normalized transition probability.
    * The sequence-mining primitive behind funnel discovery and
    * next-event-prediction features.
    *
    * Plan shape at 100 TB: ONE shuffle (partition by user) pays for the
    * `lead` window; the transition aggregate then collapses billions of
    * steps to |types|² rows, and the probability normalization is a window
    * over that tiny result — cost independent of event volume. Ordering is
    * pinned by (ts, event_id) so ties can't flip transitions between runs
    * or engines.
    */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", (floor((col("n").cast("double")
        / sum("n").over(Window.partitionBy("from_type"))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("from_type", "to_type")
  }

  /** §2.2 #88 — fuzzy string-similarity join: distinct part names within
    * Levenshtein distance `maxDist`, with BLOCKED candidate generation —
    * names equi-join on their last token (the blocking key) and only
    * same-block pairs pay the edit-distance compare. The all-pairs quadratic
    * never happens; block sizes bound the candidate count, exactly the
    * entity-resolution pattern (blocking + verify) at any scale. Distinct
    * names first: duplicates collapse before candidates.
    */
  def fuzzyJoin(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val names = t(spark, dir, "part").select("p_name").distinct()
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .where(col("dist") <= maxDist)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"), col("dist"))
      .orderBy("name_a", "name_b")
  }

  /** §2.2 #86 — RANGE-frame window: trailing 1-hour sum of event values per
    * user (the moving time-window aggregate ROWS frames cannot express —
    * the frame is defined by VALUE distance on the order key, so it
    * absorbs however many rows fall inside the hour). Ordering on integer
    * epoch-micros makes the frame arithmetic — and the result — exact and
    * engine-identical. Same single-shuffle profile as any window.
    */
  def windowRange(spark: SparkSession, dir: String, trailingMinutes: Int = 60): DataFrame = {
    val us = trailingMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("t_us")
      .rangeBetween(-us, Window.currentRow)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("value"))
      .withColumn("trailing_sum",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .orderBy("event_id")
  }

  /** §2.2 #83 — arbitrary GROUPING SETS (rollup and cube are special
    * cases): exactly the (status), (priority), and () groupings — no
    * intermediate combinations — via the SQL surface over a temp view
    * (grouping sets have no DataFrame-API spelling; `spark.sql` on a
    * registered view IS the idiomatic Spark path). One Expand + one
    * aggregate, same physical shape as rollup. `grouping()` flags
    * disambiguate real NULLs from subtotal rows.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT
        |  CASE WHEN grouping(o_orderstatus) = 0 THEN o_orderstatus ELSE 'ALL' END AS status,
        |  CASE WHEN grouping(o_orderpriority) = 0 THEN o_orderpriority ELSE 'ALL' END AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** §2.2 #81 — UNPIVOT / melt: wide measure columns rotate into
    * (measure, value) rows — the inverse of [[pivotAgg]]. Aggregate first
    * (6 groups), THEN unpivot the 1-row-per-group frame: the rotation runs
    * over group-count rows, not fact rows, so it costs nothing at any scale.
    */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")

  /** §2.2 #76 — analytic window suite: dense_rank / ntile / percent_rank /
    * cume_dist in ONE window pass (same partition + order ⇒ one shuffle, one
    * sort, one Window operator). The order key carries the unique o_orderkey
    * tie-break, which is what makes ntile and the rank family deterministic —
    * and percent_rank/cume_dist are rank arithmetic over exact integers, so
    * their doubles reproduce bit-for-bit cross-engine.
    */
  def windowSuite(spark: SparkSession, dir: String, maxKey: Long = 2000): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .where(col("o_orderkey") < maxKey)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        dense_rank().over(w).as("drank"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("o_orderpriority", "drank", "o_orderkey")
  }

  /** §2.2 #73 — flatten / lateral explode with ordinality: one row per token
    * with its position (the UNNEST-WITH-ORDINALITY / LATERAL VIEW
    * posexplode shape every nested-data pipeline needs). `posexplode` is a
    * generator inside whole-stage codegen — rows fan out inside the scan
    * stage with no shuffle; the only exchange is the presentation sort.
    */
  def explodeTokens(spark: SparkSession, dir: String, maxDoc: Long = 50): DataFrame =
    t(spark, dir, "documents")
      .where(col("doc_id") < maxDoc)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), " ")).as(Seq("pos", "token")))
      .orderBy("doc_id", "pos")

  /** §2.2 #61 — as-of join: every click event picks up the latest view event
    * by the same user at-or-before it (the canonical point-in-time lookup —
    * trades enriched with the prevailing quote, events with the last state
    * snapshot). "Before" is the total order (ts, event_id), so ties are
    * deterministic.
    *
    * Spark has no ASOF JOIN operator; the scalable formulation is the
    * union-and-carry-forward trick: tag both streams, sort each user's
    * timeline once, and carry the last view forward with
    * `last(..., ignoreNulls)` over the running frame. One shuffle on
    * user_id + one partition-local sort — O(N log N) per user timeline —
    * where a naive per-click lookup join would be a range join (quadratic
    * per user). This beats even a point-lookup broadcast at 100 TB because
    * neither side ever materializes per-key candidate lists.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("v_event"), col("value").as("v_value"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("bigint").as("v_event"), lit(null).cast("double").as("v_value"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionAll(clicks)
      .withColumn("view_event", last("v_event", ignoreNulls = true).over(w))
      .withColumn("view_value", last("v_value", ignoreNulls = true).over(w))
      .where(col("v_event").isNull)
      .select("event_id", "user_id", "view_event", "view_value")
      .orderBy("event_id")
  }

  /** §2.2 #97 — hopping (sliding) window aggregation in batch: events per
    * 1-hour window advancing every 15 minutes, via Spark's native
    * `window(ts, win, slide)` — the SAME expression Structured Streaming
    * uses, so batch and stream share one formulation. Each row expands to
    * win/slide = 4 window assignments inside the scan stage (an Expand,
    * no extra shuffle beyond the final aggregate); windows align to the
    * epoch, so assignment is pure integer arithmetic.
    */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("n_events"), col("sum_value"))
      .orderBy("w_start_us")

  /** §2.2 #98 — exact interpolated (continuous) percentiles, the type-7
    * quantile every BI tool reports: pos = (n-1)·q, value = v⌊pos⌋ +
    * frac·(v⌈pos⌉ − v⌊pos⌋). One window pass ranks values per group; one
    * conditional aggregate picks the two boundary rows and interpolates —
    * no per-group collect, no second sort. (The histogram formulation in
    * [[percentileAgg]] is the DISCRETE twin; this one interpolates.)
    */
  def percentileCont(spark: SparkSession, dir: String,
      qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    val ranked = t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
    val aggs = qs.map { q =>
      val pos = (col("n") - 1) * lit(q)
      val lo = floor(pos)
      val frac = pos - lo
      sum(
        when(col("rn") === lo + 1,
          col("o_totalprice") * (lit(1.0) - frac))
          .when(col("rn") === lo + 2 && frac > 0, col("o_totalprice") * frac)
          .otherwise(lit(0.0)))
        .as(s"p${(q * 100).round}")
    }
    ranked.groupBy("o_orderpriority")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("o_orderpriority")
  }

  /** §2.2 #96 — bounded interval join (the batch twin of the streaming
    * stream-stream range join): for every click, the same user's views in
    * the strictly-preceding hour. A raw BETWEEN-predicate join degenerates
    * to a per-key cartesian at scale; the scalable formulation replicates
    * each probe (click) into the at-most-two hour buckets its window can
    * overlap and equi-joins on (user_id, bucket) — candidate count is
    * bounded by bucket occupancy, and the exact range predicate filters
    * after the hash join. One shuffle per side, never a range-join blowup.
    * Bucket ids use integer division on epoch micros (`div`), so bucketing
    * is exact — no double rounding at bucket boundaries.
    */
  def intervalJoin(spark: SparkSession, dir: String, windowMinutes: Int = 60): DataFrame = {
    val us = windowMinutes * 60L * 1000000L
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"),
        col("event_type"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("t_us").as("c_us"))
    val probes = clicks.withColumn("bkt",
      explode(array(expr(s"c_us div $us"), expr(s"c_us div $us - 1"))))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("t_us").as("v_us"), col("value").as("v_value"))
      .withColumn("bkt", expr(s"v_us div $us"))
    val matched = probes.join(views, Seq("user_id", "bkt"))
      .where(col("v_us") >= col("c_us") - us && col("v_us") < col("c_us"))
      .groupBy("click_id")
      .agg(count(lit(1)).as("n_views"), dsum(col("v_value")).as("sum_view_value"))
    clicks.join(matched, Seq("click_id"), "left_outer")
      .select(col("click_id"), col("user_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("sum_view_value"), lit(0.0)).as("sum_view_value"))
      .orderBy("click_id")
  }

  /** §2.2 #140 — the #96 interval join written NAIVELY (plain BETWEEN
    * condition, no hand bucketing) and handed to the
    * [[graft.plans.RangeJoinRewrite]] OPTIMIZER RULE, which rebuilds the
    * bucketized equi-join plan automatically — the library-as-extension
    * story: users write the obvious query, the rule supplies the 100 TB
    * plan. Runs in a child session (`newSession`) so the rule is scoped to
    * this query and can never perturb another query's plan; results are
    * checked against the SAME oracle as the hand-bucketed #96.
    */
  def intervalJoinViaRule(spark: SparkSession, dir: String,
      windowMinutes: Int = 60): DataFrame = {
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRewrite)
    s2.conf.set(graft.plans.RangeJoinRewrite.EnabledFlag, "true")
    val us = windowMinutes * 60L * 1000000L
    val ev = Tables.load(s2, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"),
        col("event_type"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("t_us").as("c_us"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("t_us").as("v_us"),
        col("value").as("v_value"))
    val matched = clicks
      .join(views, col("user_id") === col("v_user") &&
        col("v_us") >= col("c_us") - us && col("v_us") < col("c_us"))
      .groupBy("click_id")
      .agg(count(lit(1)).as("n_views"), dsum(col("v_value")).as("sum_view_value"))
    clicks.join(matched, Seq("click_id"), "left_outer")
      .select(col("click_id"), col("user_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("sum_view_value"), lit(0.0)).as("sum_view_value"))
      .orderBy("click_id")
  }

  /** §2.2 #147 — period-over-period: monthly revenue with month-over-month
    * absolute and percentage deltas. The heavy work is one partial-agg
    * rollup to months; the lag window then runs over a CALENDAR-BOUNDED
    * frame (#months rows — a global window is fine when the domain is time,
    * not data). Exact decimal revenue; the pct delta is one rounded double
    * division stated identically in the oracle.
    */
  def momRevenue(spark: SparkSession, dir: String): DataFrame = {
    val monthly = t(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    val w = Window.orderBy("o_month")
    monthly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .select(col("o_month"), col("n_orders"), col("revenue"),
        col("prev_revenue"),
        (floor(((col("revenue") - col("prev_revenue")) / col("prev_revenue") * 100.0) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("mom_pct"))
      .orderBy("o_month")
  }

  /** §2.2 #148 — DAU/MAU stickiness per day: daily active users over
    * trailing-30-day active users — the engagement ratio every consumer
    * product reports. Both distinct counts ride the #141 decomposition:
    * presence dedupes once, DAU is a per-day distinct count, MAU expands
    * each presence row to its ≤30 window ends in the scan stage. No
    * count-distinct ever re-scans raw events.
    */
  def dauMau(spark: SparkSession, dir: String, mauDays: Int = 30): DataFrame = {
    val presence = t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val bounds = presence.agg(max("day").as("d1"))
    val dau = presence.groupBy("day")
      .agg(countDistinct("user_id").as("dau"))
    val mau = presence
      .select(col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${mauDays - 1}))")).as("day"))
      .join(broadcast(bounds), col("day") <= col("d1"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("mau"))
    dau.join(mau, "day")
      .select(col("day").cast("string").as("day"), col("dau"), col("mau"),
        (floor((col("dau").cast("double") / col("mau")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("stickiness"))
      .orderBy("day")
  }

  /** §2.2 #144 — SESSION PATH MINING: the most common first-`pathLen`
    * event-type sequences across sessions (the "how do users start"
    * product-analytics staple). Sessions are the #65 gap>30min
    * assignment; each session's prefix is bounded BEFORE any collection
    * (a row_number filter keeps ≤ pathLen rows per session, so the
    * collect_list state is O(pathLen), never a whole session); the final
    * top-k is a TakeOrderedAndProject over path counts.
    */
  def sessionPaths(spark: SparkSession, dir: String, gapMinutes: Int = 30,
      pathLen: Int = 5, topK: Int = 10): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val wOrd = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("prev_us", lag(col("t_us"), 1).over(wOrd))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("t_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_seq", sum("new_s").over(wCum))
    val wSess = Window.partitionBy("user_id", "sess_seq").orderBy("t_us", "event_id")
    ev.withColumn("rn", row_number().over(wSess))
      .where(col("rn") <= pathLen)
      .groupBy("user_id", "sess_seq")
      .agg(array_sort(collect_list(struct(col("rn"), col("event_type")))).as("ps"))
      .select(concat_ws(">", expr("transform(ps, p -> p.event_type)")).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  /** §2.2 #141 — trailing-window DISTINCT users per day (7-day active
    * users): count-distinct over a sliding window is NOT decomposable the
    * way sums are, so the naive per-day `COUNT(DISTINCT ...)` re-scans the
    * window every day. The scalable decomposition: dedupe to (user, day)
    * PRESENCE first (billions of events → users×days rows, one
    * partial-agg shuffle), then EXPLODE each presence row into the ≤7
    * window-end days it contributes to (an Expand in the scan stage — the
    * same trick as the #97 hopping window) and count distinct users per
    * window end. Work is presence×window, independent of raw event volume.
    */
  def windowDistinct(spark: SparkSession, dir: String, windowDays: Int = 7): DataFrame = {
    val presence = t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val bounds = presence.agg(min("day").as("d0"), max("day").as("d1"))
    presence
      .select(col("user_id"), col("day"),
        explode(expr(s"sequence(day, date_add(day, ${windowDays - 1}))")).as("win_end"))
      .join(broadcast(bounds), col("win_end") <= col("d1"))
      .groupBy("win_end")
      .agg(countDistinct("user_id").as("n_active"),
        count(lit(1)).as("n_presence"))
      .select(col("win_end").cast("string").as("win_end"), col("n_active"),
        col("n_presence"))
      .orderBy("win_end")
  }

  /** §2.2 #142 — the TPC-H Q3 "shipping priority" shape: top unshipped
    * order revenues for one customer segment before a cutoff date — the
    * canonical selective-dim ⋈ fact ⋈ fact composite. Segment-filtered
    * customers broadcast into orders; the order slice joins lineitem on the
    * shuffle key; revenue aggregates partial/final; the top-10 compiles to
    * TakeOrderedAndProject. Both date filters push to the parquet scans.
    */
  def tpchQ3(spark: SparkSession, dir: String, segment: String = "BUILDING",
      cutoff: String = "1995-03-15", topK: Int = 10): DataFrame = {
    val cust = t(spark, dir, "customer")
      .where(col("c_mktsegment") === segment).select("c_custkey")
    val ord = t(spark, dir, "orders")
      .where(col("o_orderdate") < to_date(lit(cutoff)))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t(spark, dir, "lineitem")
      .where(col("l_shipdate") > to_date(lit(cutoff)))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).cast("string").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(topK)
  }

  /** §2.2 #94 — calendar-spine gap fill: a month dimension generated from
    * the data's own [min, max] bounds, left-joined to the monthly aggregate
    * so months with NO qualifying rows still surface (as zeros) — the
    * reporting pattern "every month must appear even when empty". The spine
    * comes from one 2-value aggregate + `sequence()` (bounded by calendar
    * length, never a driver loop) and broadcasts; the filtered fact-side
    * aggregate is the only real shuffle, and the filter pushes to the scan.
    */
  def dateSpine(spark: SparkSession, dir: String, minPrice: Double = 490000.0): DataFrame = {
    val f = t(spark, dir, "orders").where(col("o_totalprice") > minPrice)
    val monthly = f
      .groupBy(to_date(date_trunc("MONTH", col("o_orderdate"))).as("m"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
    val spine = f
      .agg(to_date(date_trunc("MONTH", min(col("o_orderdate")))).as("lo"),
        to_date(date_trunc("MONTH", max(col("o_orderdate")))).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("m"))
    spine.join(monthly, Seq("m"), "left_outer")
      .select(date_format(col("m"), "yyyy-MM").as("o_month"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("sum_price"), lit(0.0)).as("sum_price"))
      .orderBy("o_month")
  }

  /** §2.2 #103 — funnel analysis: how many users progress signup → click →
    * purchase IN ORDER (each stage strictly after the previous one's first
    * completion — the product-analytics "conversion funnel").
    *
    * Each stage is one linear aggregation (min event time per user) plus an
    * equi-join against the previous stage's survivors, so the work SHRINKS
    * monotonically down the funnel and every shuffle is keyed on user_id —
    * no per-user event-list collection, no window over a user's whole
    * history. At 100 TB the stage-1 aggregate dominates and is map-side
    * combined; later joins ride the same hash partitioning.
    */
  def funnel(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
    // reached(i): users whose stage-i event happens strictly after their
    // stage-(i-1) completion time, carrying the new completion time forward.
    val reached = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val mine = ev.where(col("event_type") === stage)
        val qualified = prev match {
          case None => mine
          case Some(p) => mine.join(p.select(col("user_id"), col("t_done")), "user_id")
            .where(col("t_us") > col("t_done"))
        }
        Some(qualified.groupBy("user_id").agg(min("t_us").as("t_done")))
    }.flatten
    reached.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(stage).as("event_type"), col("n_users"))
    }.reduce(_ unionAll _).orderBy("stage")
  }

  /** §2.2 #104 — cohort retention: users grouped by the week of their FIRST
    * event (the cohort); for each later week, the share of the cohort still
    * active. The classic growth-analytics matrix.
    *
    * Plan: (user, week) activity is deduplicated FIRST (one aggregation —
    * at 100 TB this collapses billions of events to |users|×|weeks| rows),
    * cohorts are a min-aggregate over that, and the matrix is a second small
    * aggregation. Cohort sizes join back by broadcast (weeks are bounded by
    * calendar, not data).
    */
  def retention(spark: SparkSession, dir: String,
      epoch: String = "2024-01-01"): DataFrame = {
    val weeks = t(spark, dir, "events")
      .select(col("user_id"),
        floor(datediff(to_date(col("ts")), to_date(lit(epoch))) / 7).cast("int").as("wk"))
      .distinct()
    val cohorts = weeks.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val active = weeks.join(cohorts, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohorts.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_n"))
    active.join(broadcast(sizes), "cohort_wk")
      .select(col("cohort_wk"), col("wk_offset"), col("n_active"), col("cohort_n"),
        (floor((col("n_active").cast("double") / col("cohort_n")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("retention"))
      .orderBy("cohort_wk", "wk_offset")
  }

  /** §2.2 #125 — robust outlier detection via MEDIAN ABSOLUTE DEVIATION:
    * per event type, flag events whose |value − median| exceeds
    * `kSigma`·MAD. Median/MAD are the robust location/scale pair — unlike
    * mean/stddev they don't let the outliers being hunted drag the
    * threshold toward themselves.
    *
    * Both medians are EXACT lower medians computed with the #48 VALUE
    * HISTOGRAM formulation (cumulative counts over distinct values, never a
    * per-group row sort), and all value arithmetic runs in DECIMAL(12,2) —
    * subtraction, abs, and the `dev > mad·k` comparison are exact, so the
    * flagged set is bit-reproducible cross-engine with no float tolerance
    * at all. Two histogram passes + two broadcast joins of
    * |event types|-row frames; nothing sorts raw rows.
    */
  def anomalyMad(spark: SparkSession, dir: String, kSigma: Int = 3): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value").cast(dec).as("v"))
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val wCum = Window.partitionBy("event_type").orderBy(valueCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("event_type")
      df.groupBy(col("event_type"), col(valueCol))
        .agg(count(lit(1)).as("cnt"))
        .select(col("event_type"), col(valueCol),
          sum("cnt").over(wCum).as("cum"), sum("cnt").over(wAll).as("n"))
        .groupBy("event_type")
        .agg(min(when(col("cum") >= ceil(col("n") * 0.5).cast("long"),
          col(valueCol))).as(out))
    }
    val med = lowerMedian(ev, "v", "med")
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = lowerMedian(dev, "dev", "mad")
    dev.join(broadcast(mad), "event_type")
      .where(col("dev") > col("mad") * kSigma)
      .select(col("event_id"), col("event_type"),
        col("v").cast("double").as("value"),
        col("med").cast("double").as("med"),
        col("mad").cast("double").as("mad"),
        col("dev").cast("double").as("dev"))
      .orderBy("event_id")
  }

  /** §2.2 #128 — LAST-TOUCH ATTRIBUTION: every purchase is credited to the
    * user's most recent click strictly preceding it (lexicographically on
    * (event time, event_id), so same-microsecond rows resolve
    * deterministically); purchases with no prior click stay unattributed
    * (`attr_click` null = "direct"). The marketing twin of the as-of join:
    * clicks and purchases ride ONE tagged union through ONE user-partitioned
    * window with a carry-forward `last(_, ignoreNulls)` — never a per-pair
    * range join, so a user with millions of touches costs their own sort
    * slice and nothing more.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t(spark, dir, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
      .withColumn("click_t",
        when(col("event_type") === "click", col("t_us")))
      .withColumn("attr_click", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("attr_t", last(col("click_t"), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("attr_click"),
        (col("t_us") - col("attr_t")).as("latency_us"))
      .orderBy("event_id")
  }

  /** §2.2 #129 — semi-structured access via the VARIANT type (Spark 4):
    * `parse_json` ingests the payload ONCE into the binary variant encoding
    * with no declared schema, then `variant_get` extracts typed paths and
    * `try_variant_get` null-safely probes a path that may not exist — the
    * schema-on-read pattern for payloads whose shape drifts, where
    * [[jsonProps]]'s fixed `from_json` schema would reject new fields.
    * Extraction is per-row scan-stage work; one small aggregation follows.
    */
  def variantProps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("vr"))
      .select(col("event_type"),
        expr("variant_get(vr, '$.k', 'int')").as("k"),
        expr("try_variant_get(vr, '$.absent', 'int')").as("miss"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast("bigint")).as("sum_k"),
        countDistinct(col("k")).as("n_distinct_k"),
        count(col("miss")).as("n_absent_hits"))
      .orderBy("event_type")

  /** §2.2 #131 — LOCF gap fill (last observation carried forward): every
    * (user, day) cell of a dense user × calendar grid gets the value of the
    * user's last event at-or-before that day — the standard
    * missing-observation fill for feature matrices and daily state
    * snapshots. Composes the #94 data-driven calendar spine with a
    * carry-forward window: per-user daily closing values (one partial
    * aggregation — `max(struct(ts, id, value))`, so "last that day" is
    * deterministic), a broadcast spine fan-out to the dense grid, then ONE
    * user-partitioned `last(_, ignoreNulls)` window. A user's cost is their
    * own days-×-1 slice; nothing global.
    */
  def locfFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("t_us"), col("event_id"), col("value"))
    // Per-user-day closing value (last event of the day wins, ties on id).
    val daily = ev.groupBy("user_id", "day")
      .agg(max(struct(col("t_us"), col("event_id"), col("value"))).as("last"))
      .select(col("user_id"), col("day"), col("last.value").as("day_close"))
    // Data-driven calendar spine × user list: the dense grid.
    val spine = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val users = ev.select("user_id").distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    users.crossJoin(broadcast(spine))
      .join(daily, Seq("user_id", "day"), "left")
      .withColumn("value_filled", last(col("day_close"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day").cast("string").as("day"),
        col("value_filled"), col("day_close").isNotNull.as("is_observed"))
      .orderBy("user_id", "day")
  }

  /** §2.2 #132 — deterministic A/B experiment readout: users split into
    * arms by their id's sha256 (seedless, re-ingestion-stable — the #46
    * split applied to users), per-arm event counts and decimal-exact mean
    * values per event type, and the z-statistic for the difference in
    * means. Count/sum/sum-of-squares are one fused scan (conditional
    * aggregates per arm); variances come from exact decimal moments, so
    * only the final sqrt/divide is float — rounded to 6, both engines
    * identical. The assignment-hash trick is what makes the experiment
    * analyzable at 100 TB with no user-assignment table to join.
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val ev = t(spark, dir, "events")
      .withColumn("arm",
        when(substring(sha2(col("user_id").cast("string"), 256), 1, 1) <= "7",
          lit("A")).otherwise(lit("B")))
    ev.groupBy("event_type")
      .agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "A", col("value").cast(dec))).as("sa"),
        sum(when(col("arm") === "B", col("value").cast(dec))).as("sb"),
        sum(when(col("arm") === "A", (col("value") * col("value")).cast(dec))).as("ssa"),
        sum(when(col("arm") === "B", (col("value") * col("value")).cast(dec))).as("ssb"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        (col("sa").cast("double") / col("n_a")).as("mean_a"),
        (col("sb").cast("double") / col("n_b")).as("mean_b"),
        (floor((
          (col("sb").cast("double") / col("n_b") - col("sa").cast("double") / col("n_a")) /
          sqrt(
            (col("ssa").cast("double") / col("n_a") -
              (col("sa").cast("double") / col("n_a")) * (col("sa").cast("double") / col("n_a"))) / col("n_a") +
            (col("ssb").cast("double") / col("n_b") -
              (col("sb").cast("double") / col("n_b")) * (col("sb").cast("double") / col("n_b"))) / col("n_b"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("z_score"))
      .withColumn("mean_a", (floor((col("mean_a")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("mean_b", (floor((col("mean_b")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("event_type")
  }

  /** §2.2 #306 — A/B MINIMUM DETECTABLE EFFECT: for each event type, the
    * smallest mean difference the experiment in its CURRENT size can detect
    * at α = 0.05 two-sided with 80% power — MDE = (z_{α/2} + z_{0.8})·SE
    * where SE = √(s²_A/n_A + s²_B/n_B) — and whether the OBSERVED difference
    * clears it. The honest companion to #132's z-score: a "not significant"
    * readout means nothing until you know the experiment could have seen the
    * effect at all (and an SRM-clean #255 experiment can still be simply too
    * small). Same single fused scan as #132 (per-arm count/Σ/Σx² in exact
    * DECIMAL), then per-type O(1) double formulas in fixed order — the
    * normal quantiles are literals, so no CDF machinery is needed and both
    * engines state the identical expression. Detectability compares
    * UNROUNDED doubles.
    */
  def abPower(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    // z_{0.025} + z_{0.20} (two-sided 5%, 80% power), stated to 6 decimals.
    val zSum = lit(1.959964 + 0.841621)
    val ev = t(spark, dir, "events")
      .withColumn("arm",
        when(substring(sha2(col("user_id").cast("string"), 256), 1, 1) <= "7",
          lit("A")).otherwise(lit("B")))
    val s = ev.groupBy("event_type")
      .agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "A", col("value").cast(dec))).as("sa"),
        sum(when(col("arm") === "B", col("value").cast(dec))).as("sb"),
        sum(when(col("arm") === "A", (col("value") * col("value")).cast(dec)))
          .as("ssa"),
        sum(when(col("arm") === "B", (col("value") * col("value")).cast(dec)))
          .as("ssb"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sa").cast("double") / na
    val mb = col("sb").cast("double") / nb
    val va = col("ssa").cast("double") / na - ma * ma
    val vb = col("ssb").cast("double") / nb - mb * mb
    val se = sqrt(va / na + vb / nb)
    val diff = abs(mb - ma)
    s.select(col("event_type"), col("n_a"), col("n_b"),
      fl6(diff).as("observed_diff"),
      fl6(zSum * se).as("mde"),
      (diff > zSum * se).as("is_detectable"))
      .orderBy("event_type")
  }

  /** §2.2 #135 — WINSORIZED robust means: per group, exact p05/p95 bounds
    * via the #48 value-histogram formulation, then a second scan clips
    * values into [p05, p95] and aggregates — the outlier-insensitive mean a
    * metrics pipeline reports next to the raw one (the transform twin of
    * #125's outlier DETECTION). All clipping and sums run in DECIMAL(12,2)
    * / DECIMAL(28,6), so bounds, clip counts, and both means are exact
    * cross-engine; bounds ride back via a |groups|-row broadcast.
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val sumDec = org.apache.spark.sql.types.DecimalType(28, 6)
    val ev = t(spark, dir, "events")
      .select(col("event_type"), col("value").cast(dec).as("v"))
    val wCum = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val bounds = ev.groupBy("event_type", "v")
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"), col("v"),
        sum("cnt").over(wCum).as("cum"), sum("cnt").over(wAll).as("n"))
      .groupBy("event_type")
      .agg(
        min(when(col("cum") >= ceil(col("n") * 0.05).cast("long"), col("v"))).as("p05"),
        min(when(col("cum") >= ceil(col("n") * 0.95).cast("long"), col("v"))).as("p95"))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("clipped", least(greatest(col("v"), col("p05")), col("p95")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        max(col("p05")).cast("double").as("p05"),
        max(col("p95")).cast("double").as("p95"),
        (sum(col("v").cast(sumDec)).cast("double") / count(lit(1))).as("mean_raw"),
        (sum(col("clipped").cast(sumDec)).cast("double") / count(lit(1))).as("mean_winsor"),
        sum(when(col("v") < col("p05"), 1L).otherwise(0L)).as("n_clip_low"),
        sum(when(col("v") > col("p95"), 1L).otherwise(0L)).as("n_clip_high"))
      .withColumn("mean_raw", (floor((col("mean_raw")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("mean_winsor", (floor((col("mean_winsor")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("event_type")
  }

  /** §2.2 #126 — ordered string aggregation (LISTAGG / string_agg): each
    * region's nations as one deterministic comma-joined list. The collect
    * is per-group bounded (list size = group cardinality, a dimension
    * here); ordering happens INSIDE the aggregated array (`array_sort`), so
    * no input ordering assumption leaks in — partial aggregation remains
    * legal and the result is partition-order-independent.
    */
  def listAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("r_name")

  /** §2.2 #152 — Gini coefficient of per-customer revenue: the standard
    * inequality summary (G = 2·Σ i·xᵢ / (n·Σxᵢ) − (n+1)/n over ascending
    * xᵢ) a marketplace reports for revenue concentration. Revenue per
    * customer is one partial-aggregated shuffle over orders; the rank is
    * [[PrefixScan.rowNumber]]'s chunked distributed rank over CUSTOMERS
    * (a 1B-customer dim in one unpartitioned window task is still a
    * wall). Ties in revenue are permutation-invariant in Σ i·xᵢ (equal x
    * across a tied rank block), so the result is deterministic without a
    * tie-break. Decimal rank-weighted sums make the quotient exact
    * cross-engine.
    */
  def giniRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("x"))
    val ranked = PrefixScan.rowNumber(rev, "x",
      Seq(col("x").asc, col("o_custkey").asc), "i")
    ranked.agg(
        count(lit(1)).as("n_customers"),
        sum(col("x")).cast("double").as("sx"),
        sum((col("i") * col("x")).cast(DecimalType(38, 2))).cast("double").as("six"))
      .select(col("n_customers"),
        (floor((lit(2.0) * col("six") / (col("n_customers") * col("sx")) -
          (col("n_customers") + lit(1.0)) / col("n_customers")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("gini"))
  }

  /** §2.2 #153 — Benford first-digit audit over order totals: observed
    * first-significant-digit shares vs Benford's log10(1 + 1/d) — the
    * classic fabricated-data / corrupted-load screen a DBA runs on a
    * copied fact table. The digit is taken from the DECIMAL(18,2) string
    * form (exact, no float log10 at the boundary); one scan, one 9-row
    * aggregate, everything map-side combined.
    */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .where(col("o_totalprice") >= 1.0)
      .select(substring(col("o_totalprice").cast(DecimalType(18, 2))
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        (floor((col("n") / sum(col("n")).over(Window.partitionBy())) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("benford", (floor((log10(lit(1.0) + lit(1.0) / col("digit"))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("abs_dev", (floor((abs(col("share") - col("benford"))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("digit")

  /** §2.2 #154 — lag-1 autocorrelation of daily revenue: does today's
    * revenue predict tomorrow's (seasonality/trend screen before
    * forecasting)? The lag pairing is a SHIFTED EQUI-JOIN of the daily
    * rollup with itself (day ↔ day+1) — never a window over raw orders —
    * so the join input is calendar-bounded. Pearson moments ride the exact
    * decimal-sum pattern of [[corrAgg]].
    */
  def autocorrDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      // Re-narrow the sum to (18,2) so the cross-moment products type
      // identically in Spark and the DuckDB oracle (a (38,2)x(38,2)
      // multiply would overflow DuckDB's decimal width).
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast(DecimalType(18, 2)).as("r"))
    val nxt = daily.select(date_add(col("day"), -1).as("day"), col("r").as("r_next"))
    def d(c: Column) = sum(c.cast(DecimalType(38, 6))).cast("double")
    daily.join(nxt, "day")
      .agg(
        count(lit(1)).cast("double").as("n"),
        d(col("r")).as("sx"), d(col("r_next")).as("sy"),
        d(col("r") * col("r_next")).as("sxy"),
        d(col("r") * col("r")).as("sxx"),
        d(col("r_next") * col("r_next")).as("syy"))
      .select(col("n").cast("long").as("n_pairs"),
        (floor(((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy")))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("autocorr_lag1"))
  }

  /** §2.2 #155 — weekly churn: users active in ISO week w with NO activity
    * in week w+1 (the subscription-business health metric, at the weekly
    * grain the events table's span supports). Presence dedupes events to
    * one (user, week) row FIRST — the #141 decomposition — so the
    * anti-join ships presence rows, never raw events; both sides of the
    * join are presence-bounded. The final week reports churn against an
    * empty successor (standard right-censoring caveat, kept explicit).
    */
  def churnWeekly(spark: SparkSession, dir: String): DataFrame = {
    val presence = t(spark, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    // A user active in week w+1 cancels churn for week w: shift activity
    // back one week and anti-join.
    val nextActive = presence.select(col("user_id"), date_sub(col("wk"), 7).as("wk"))
    val churned = presence.join(nextActive, Seq("user_id", "wk"), "left_anti")
    presence.groupBy("wk").agg(count(lit(1)).as("n_active"))
      .join(churned.groupBy("wk").agg(count(lit(1)).as("n_churned")), Seq("wk"), "left_outer")
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"), col("n_active"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"),
        (floor((coalesce(col("n_churned"), lit(0L)) / col("n_active").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("churn_rate"))
      .orderBy("week")
  }

  /** §2.2 #156 — RFM segmentation: per customer, Recency (days since last
    * order), Frequency (order count), Monetary (exact decimal revenue),
    * each cut into quartiles; customers report as one of ≤64 R·F·M
    * segments. The per-customer rollup is the only fact-scale shuffle;
    * quartiles come from [[globalNtile]]'s chunked distributed rank over
    * CUSTOMERS (no unpartitioned window over the dim — 1B customers in
    * one task is still a wall) with full (metric, custkey) tie-breaks so
    * quartile assignment is deterministic cross-engine.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("monetary"))
    val anchor = per.agg(max("last_day").as("d1"))
    // EAGER checkpoint, and one per rank level (r15): each globalNtile
    // reads its input 3-4 times (chunk bounds, local windows, carry, row
    // count), so chaining three of them over ONE lazy checkpoint
    // re-executed the previous levels 3× each — 1+3+9 = 13 full re-rolls
    // of orders measured in the job profile (the lazy checkpoint's blocks
    // are not guaranteed before the fan-out replans it). Materializing
    // each level once makes the chain 3 linear passes over the bounded
    // customer frame at any scale (guide §5 "cut lineage when an
    // intermediate is reused").
    val base = per.crossJoin(broadcast(anchor))
      .withColumn("recency", datediff(col("d1"), col("last_day")))
      .withColumn("negfreq", -col("freq"))
      .withColumn("negmon", -col("monetary"))
      .localCheckpoint(true)
    val scored = globalNtile(globalNtile(globalNtile(base,
      4, "recency", Seq(col("recency").asc, col("o_custkey").asc), "r_q")
        .localCheckpoint(true),
      4, "negfreq", Seq(col("freq").desc, col("o_custkey").asc), "f_q")
        .localCheckpoint(true),
      4, "negmon", Seq(col("monetary").desc, col("o_custkey").asc), "m_q")
    scored
      .groupBy((col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
        .cast("long").as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        // monetary sums are DECIMAL(18,2): exact at 2 dp already, so the
        // old 2-dp floor-form was a value no-op with a floor→BIGINT
        // saturation hazard above ~9.2e16 cents (ADVICE r12). Spark's
        // decimal→double cast is correctly rounded; the oracle matches
        // via its VARCHAR round-trip.
        sum(col("monetary")).cast("double").as("revenue"))
      .orderBy("segment")
  }

  /** §2.2 #164 — hour-of-day load profile: events and value per
    * (hour, event_type) with each type's within-type share — the capacity /
    * seasonality picture an operations dashboard opens with. One map-side-
    * combined aggregate to a 24×|types| frame; the share window runs over
    * that bounded frame, never raw events. Exact decimal value sums.
    */
  def hourProfile(spark: SparkSession, dir: String): DataFrame = {
    val byHour = t(spark, dir, "events")
      .groupBy(hour(col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum6(col("value")).as("total_value"))
    byHour
      .withColumn("share_of_type", (floor((col("n_events") /
        sum(col("n_events")).over(Window.partitionBy("event_type"))) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("total_value", (floor((col("total_value")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("event_type", "hour")
  }

  /** §2.2 #165 — per-event LAG FEATURES: each event annotated with its
    * user's previous `k` event values (the feature-engineering shape an ML
    * training pipeline materializes before model fit). One window per lag
    * over the SAME (user, time) sort — Spark evaluates all lags in a
    * single WindowExec pass, so the cost is one user-keyed shuffle + sort
    * regardless of k. Values are carried raw (no arithmetic), so the
    * feature columns are bit-exact across engines.
    */
  def lagFeatures(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t_us").asc, col("event_id").asc)
    val base = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"),
        col("value"))
    val withLags = (1 to k).foldLeft(base) { (df, i) =>
      df.withColumn(s"v_lag$i", lag(col("value"), i).over(w))
    }
    withLags
      .withColumn("n_prior", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .select(Seq(col("user_id"), col("event_id"), col("value"), col("n_prior")) ++
        (1 to k).map(i => col(s"v_lag$i")): _*)
      .orderBy("user_id", "event_id")
  }

  /** §2.2 #177 — TPC-H Q6 (forecast revenue change): the canonical
    * single-table filtered aggregate — date-range + discount-band +
    * quantity predicates ALL push to the parquet scan (PushedFilters), and
    * the whole query is one map-side-combined 1-row aggregate: the minimal
    * "scan efficiency" benchmark shape. Exact decimal revenue.
    */
  def tpchQ6(spark: SparkSession, dir: String, year: Int = 1996): DataFrame =
    t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= to_date(lit(f"$year%04d-01-01")) &&
        col("l_shipdate") < to_date(lit(f"${year + 1}%04d-01-01")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** §2.2 #178 — weekly GROWTH ACCOUNTING: every active (user, week)
    * classified as new (first week ever), retained (also active the prior
    * week), or resurrected (active before, absent the prior week), plus
    * churned (active prior week, absent this one) — the canonical
    * new/retained/resurrected/churned decomposition behind every growth
    * dashboard. Everything derives from ONE presence dedup: first-week is
    * a per-user min, prior-week membership is a shifted self-join, churn a
    * shifted anti-join — presence-bounded throughout, raw events never
    * join. active(w) = new + retained + resurrected by construction.
    *
    * Churn attaches by FULL OUTER join (ADVICE r5): a calendar week with
    * zero active users still owns the churn of the prior week's actives —
    * a left join from the active-week counts would silently drop exactly
    * the weeks where churn is total (gap weeks, and the week after the
    * final active week). All four counts coalesce to 0 on either side.
    */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val first = p.groupBy("user_id").agg(min("wk").as("first_wk"))
    val prevActive = p.select(col("user_id"), date_add(col("wk"), 7).as("wk"))
      .withColumn("was_prev", lit(true))
    val status = p.join(first, "user_id")
      .join(prevActive, Seq("user_id", "wk"), "left_outer")
      .withColumn("status",
        when(col("wk") === col("first_wk"), "new")
          .when(col("was_prev").isNotNull, "retained")
          .otherwise("resurrected"))
    val counts = status
      .groupBy(date_format(col("wk"), "yyyy-MM-dd").as("week"))
      .agg(sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val churned = p.select(col("user_id"), date_add(col("wk"), 7).as("wk"))
      .join(p, Seq("user_id", "wk"), "left_anti")
      .groupBy(date_format(col("wk"), "yyyy-MM-dd").as("week"))
      .agg(count(lit(1)).as("n_churned"))
    counts.join(churned, Seq("week"), "full_outer")
      .select(col("week"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy("week")
  }

  /** §2.2 #172 — repeat-purchase CADENCE: per customer with ≥2 orders, the
    * count, exact-decimal mean gap in days between consecutive orders, and
    * min/max gap — the replenishment-cycle metric behind every
    * "time-to-next-order" model. Consecutive gaps come from ONE lag window
    * per customer (N window keys, no hot partition); the mean is a decimal
    * quotient so it is partition- and order-independent.
    */
  def orderCadence(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("d").asc, col("o_orderkey").asc)
    val gaps = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)))
      .where(col("gap").isNotNull)
    gaps.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_gaps"),
        (floor((sum(col("gap").cast(DecimalType(18, 0))).cast("double") /
          count(lit(1))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("avg_gap_days"),
        min("gap").cast("long").as("min_gap_days"),
        max("gap").cast("long").as("max_gap_days"))
      .orderBy("o_custkey")
  }

  /** §2.2 #167 — TPC-H Q18 (large-volume orders): orders whose total line
    * quantity exceeds a threshold, with their customers. The qualifying
    * set derives from ONE partial-aggregated rollup of lineitem; it
    * rejoins lineitem as a semi-filter and orders/customer by key — the
    * aggregate-then-semijoin decomposition that never re-scans the fact
    * for the HAVING. Exact decimal quantities; top-100 via
    * TakeOrderedAndProject with full tie-breaks.
    */
  def tpchQ18(spark: SparkSession, dir: String, minQty: Double = 300.0,
      topK: Int = 100): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .where(col("sum_qty") > minQty)
    val ord = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).cast("string").as("o_orderdate"),
        col("o_totalprice"))
    val cust = t(spark, dir, "customer").select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey").asc)
      .limit(topK)
  }

  /** §2.2 #168 — per-user ACTIVITY SPAN (the user-dimension build every
    * event warehouse materializes): first/last seen, lifetime events,
    * distinct active days, calendar span. One partial-aggregated pass for
    * the min/max/count; the distinct-day count rides the presence-dedup
    * decomposition (events → user×day FIRST), so no count-distinct
    * re-scans raw events.
    */
  def activitySpan(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val base = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        min(to_date(col("ts"))).as("first_day"),
        max(to_date(col("ts"))).as("last_day"))
    val days = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy("user_id").agg(count(lit(1)).as("n_active_days"))
    base.join(days, "user_id")
      .select(col("user_id"), col("n_events"), col("n_active_days"),
        date_format(col("first_day"), "yyyy-MM-dd").as("first_day"),
        date_format(col("last_day"), "yyyy-MM-dd").as("last_day"),
        (datediff(col("last_day"), col("first_day")) + 1).cast("long").as("span_days"))
      .orderBy("user_id")
  }

  /** §2.2 #169 — interval ANTI-join (abandonment): views with NO purchase
    * by the same user within the following `windowMinutes` — the inverse
    * of #128's attribution join, and the shape behind every
    * "started-but-never-finished" funnel metric. The anti-join keeps the
    * user equi-key (hash-joinable) with the time window as the residual
    * condition, so it plans as a sort-merge LEFT ANTI on user — candidates
    * per view are bounded by that user's purchases, never by the corpus.
    * Reported per user so the result is compact at any scale.
    */
  def intervalAntiJoin(spark: SparkSession, dir: String,
      windowMinutes: Int = 60): DataFrame = {
    val us = windowMinutes * 60L * 1000000L
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"),
        col("event_type"))
    val views = ev.where(col("event_type") === "view")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("t_us").as("p_us"))
    val abandoned = views.join(purchases,
        col("user_id") === col("p_user") &&
        col("p_us") >= col("t_us") && col("p_us") < col("t_us") + us,
        "left_anti")
    views.groupBy("user_id").agg(count(lit(1)).as("n_views"))
      .join(abandoned.groupBy("user_id").agg(count(lit(1)).as("n_abandoned")),
        Seq("user_id"), "left_outer")
      .select(col("user_id"), col("n_views"),
        coalesce(col("n_abandoned"), lit(0L)).as("n_abandoned"),
        (floor((coalesce(col("n_abandoned"), lit(0L)) /
          col("n_views").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("abandon_rate"))
      .orderBy("user_id")
  }

  /** §2.2 #159 — TPC-H Q5 (local supplier volume): the 6-table snowflake
    * join with the same-nation customer/supplier constraint. Plan shape at
    * 100 TB: region filter prunes nation, nation prunes supplier — the
    * whole dim chain folds into ONE broadcast against the lineitem scan;
    * orders (date-filtered at the scan) joins lineitem on the shuffle key
    * both tables would bucket on; customer is fact-scale so it joins by
    * shuffle too, NEVER broadcast. The c_nationkey = s_nationkey residual
    * rides the customer join. Exact decimal revenue, (revenue DESC, name)
    * deterministic ordering.
    */
  def tpchQ5(spark: SparkSession, dir: String, region: String = "ASIA",
      year: Int = 1996): DataFrame = {
    val nat = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region").where(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = t(spark, dir, "orders")
      .where(col("o_orderdate") >= to_date(lit(f"$year%04d-01-01")) &&
        col("o_orderdate") < to_date(lit(f"${year + 1}%04d-01-01")))
      .select("o_orderkey", "o_custkey")
    val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** §2.2 #161 — audience overlap: pairwise Jaccard between the USER SETS
    * of every two event types (does the purchase audience overlap the
    * error audience?). Presence dedup first, then a user-keyed self-join —
    * each user carries ≤|types| presence rows, so the join fans out ≤
    * |types|² per user (bounded, never quadratic in events). All-pairs
    * frame is |types|²-bounded; zero-overlap pairs still report.
    */
  def userOverlap(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "events")
      .select(col("event_type").as("et"), col("user_id")).distinct()
    val sizes = p.groupBy("et").agg(count(lit(1)).as("n"))
    val inter = p.select(col("et").as("type_a"), col("user_id"))
      .join(p.select(col("et").as("type_b"), col("user_id")), "user_id")
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
    val pairs = sizes.select(col("et").as("type_a"), col("n").as("n_a"))
      .crossJoin(sizes.select(col("et").as("type_b"), col("n").as("n_b")))
      .where(col("type_a") < col("type_b"))
    pairs.join(inter, Seq("type_a", "type_b"), "left_outer")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        (floor((coalesce(col("n_both"), lit(0L)) /
          (col("n_a") + col("n_b") - coalesce(col("n_both"), lit(0L))).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  /** §2.2 #179 — TPC-H Q7 (volume shipping): bilateral trade between two
    * nations — revenue where the SUPPLIER sits in one and the CUSTOMER in
    * the other, by direction and ship year. Plan shape at 100 TB: nation
    * (25 rows) broadcasts onto supplier and customer; the pair predicate
    * prunes BOTH dims before they meet the facts, so the supplier join
    * carries only the two nations' suppliers (broadcastable after
    * pruning — Catalyst sees the filtered size, AQE re-plans if stats
    * mislead); lineitem⋈orders shuffles on orderkey, orders⋈customer on
    * custkey — the two shuffle keys a bucketed layout would co-locate.
    * The OR-of-two-directions predicate needs both sides attached, so it
    * rides the LAST join as a residual, never a cartesian.
    */
  def tpchQ7(spark: SparkSession, dir: String, nationA: String = "NATION_13",
      nationB: String = "NATION_19"): DataFrame = {
    val nat = t(spark, dir, "nation")
      .where(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1998-01-01")))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        ((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
         (col("supp_nation") === nationB && col("cust_nation") === nationA)))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** §2.2 #180 — TPC-H Q8 (national market share): one nation's share of a
    * region's imports of one part type, by order year. The share is a
    * ratio of two sums over the SAME joined frame — computed as
    * conditional aggregation in one pass (never two scans), both sums
    * exact decimals so the double quotient is bit-identical cross-engine.
    * Part (type-filtered) and the region-pruned customer-nation dim
    * broadcast; lineitem⋈orders⋈customer shuffle on their natural keys;
    * supplier-nation attaches by broadcast to label the numerator.
    */
  def tpchQ8(spark: SparkSession, dir: String, region: String = "AMERICA",
      shareNation: String = "NATION_6", partType: String = "PROMO"): DataFrame = {
    val part = t(spark, dir, "part").where(col("p_type") === partType)
      .select("p_partkey")
    val regionNations = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region").where(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(regionNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supNation = t(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(supNation), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val ord = t(spark, dir, "orders")
      .where(col("o_orderdate") >= to_date(lit("1996-01-01")) &&
        col("o_orderdate") < to_date(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        dsum6(when(col("supp_nation") === shareNation, vol).otherwise(lit(0.0)))
          .as("nation_volume"),
        dsum6(vol).as("total_volume"),
        count(lit(1)).as("n_lines"))
      .withColumn("mkt_share",
        (floor((col("nation_volume") / col("total_volume")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select("o_year", "nation_volume", "total_volume", "mkt_share", "n_lines")
      .orderBy("o_year")
  }

  /** §2.2 #181 — TPC-H Q10 (returned-item reporting): top-20 customers by
    * revenue lost to returns in one quarter. The date filter prunes
    * orders AT THE SCAN and the returnflag filter prunes lineitem at the
    * scan (PushedFilters both); the quarter-bounded orders side is small
    * enough to broadcast onto lineitem at any corpus scale where a
    * quarter ≪ history, customer attaches by shuffle on custkey, nation
    * broadcasts. Top-20 is TakeOrderedAndProject (never a global sort)
    * with custkey tie-break.
    */
  def tpchQ10(spark: SparkSession, dir: String, quarterStart: String = "1996-01-01",
      quarterEnd: String = "1996-04-01", topK: Int = 20): DataFrame = {
    val ord = t(spark, dir, "orders")
      .where(col("o_orderdate") >= to_date(lit(quarterStart)) &&
        col("o_orderdate") < to_date(lit(quarterEnd)))
      .select("o_orderkey", "o_custkey")
    val rev = t(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    val nat = t(spark, dir, "nation").select("n_nationkey", "n_name")
    t(spark, dir, "customer")
      .join(rev, col("c_custkey") === col("o_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(topK)
  }

  /** §2.2 #182 — TPC-H Q13 (customer order-count distribution): how many
    * customers placed exactly k orders, INCLUDING k=0 — the left outer
    * join that survives the aggregate (count(o_orderkey) counts non-null
    * only). Two partial-agg shuffles (custkey, then the ≤|max-k| count
    * key); the second groupBy input is one row per customer, so the
    * distribution frame is customer-bounded, never order-bounded.
    */
  def tpchQ13(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "customer").select("c_custkey")
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** §2.2 #188 — Pareto revenue concentration (the 80/20 readout): customers
    * ranked by lifetime revenue, bucketed into rank deciles, cumulative
    * revenue share per decile. The per-customer rollup is fact→dim
    * reduction (one partial-agg shuffle); the global rank runs as
    * [[PrefixScan.rowNumber]]'s chunked distributed rank over the customer
    * frame (never an unpartitioned window — a 1B-customer dim in one task
    * is a wall), and the cumulative window is 10 rows. Totals enter as a
    * one-row broadcast
    * (computed once, never a correlated re-scan); decile assignment is
    * integer arithmetic (DIV), share the only division — over exact
    * decimal sums, rounded for presentation.
    */
  def paretoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val totals = rev.agg(count(lit(1)).as("n_cust"), sum(col("rev")).as("total_rev"))
    val ranked = PrefixScan.rowNumber(rev.withColumn("negrev", -col("rev")),
        "negrev", Seq(col("rev").desc, col("o_custkey").asc), "rn")
      .crossJoin(broadcast(totals))
      .withColumn("decile", expr("CAST((rn - 1) * 10 DIV n_cust AS INT) + 1"))
    val byDec = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n_cust"), sum(col("rev")).as("rev_d"),
        max(col("total_rev")).as("total_rev"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDec
      .withColumn("cum_rev", sum(col("rev_d")).over(w))
      .select(col("decile"), col("n_cust"),
        col("rev_d").cast("double").as("revenue"),
        col("cum_rev").cast("double").as("cum_revenue"),
        (floor((col("cum_rev").cast("double") / col("total_rev").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("cum_share"))
      .orderBy("decile")
  }

  /** §2.2 #189 — market-basket pair mining: co-ordered part pairs with
    * support and lift. Candidates come from a within-order self-join of
    * the DISTINCT (order, part) frame — pair fan-out is C(parts-per-
    * order, 2), bounded by basket size, never corpus-quadratic (the same
    * bound as co-occurrence PMI's window). Part frequencies are
    * part-bounded so they attach by broadcast; the order count enters as
    * a one-row broadcast. Lift = count·N / (cnt_a·cnt_b): integer
    * products below 2^53 are exact doubles, so the quotient is identical
    * cross-engine. Top-k via TakeOrderedAndProject with full tie-breaks.
    *
    * The part-frequency frame is FACT-derived (distinct partkeys seen in
    * lineitem), so its broadcast hint is gated (VERDICT r5 #8): |distinct
    * parts| ≤ |part|, and the dimension's row count is one footer-stats
    * count, so the hint applies only below `maxBroadcastParts` — above
    * that the frequency attach degrades to a plain shuffle join on the
    * part key rather than OOMing every executor with the build side.
    */
  def marketBasket(spark: SparkSession, dir: String, minSupport: Int = 2,
      topK: Int = 50, maxBroadcastParts: Long = 10000000L): DataFrame = {
    val d = t(spark, dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    val nOrders = d.agg(count_distinct(col("l_orderkey")).as("n_orders"))
    val freq = d.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val hint: DataFrame => DataFrame =
      if (t(spark, dir, "part").count() <= maxBroadcastParts) broadcast else identity
    val pairs = d.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(d.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        "l_orderkey")
      .where(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("pair_count"))
      .where(col("pair_count") >= minSupport)
    pairs
      .join(hint(freq.select(col("l_partkey").as("part_a"),
        col("cnt").as("cnt_a"))), "part_a")
      .join(hint(freq.select(col("l_partkey").as("part_b"),
        col("cnt").as("cnt_b"))), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("pair_count"),
        col("cnt_a"), col("cnt_b"),
        (floor(((col("pair_count") * col("n_orders")).cast("double") /
          (col("cnt_a") * col("cnt_b")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("lift"))
      .orderBy(col("pair_count").desc, col("part_a").asc, col("part_b").asc)
      .limit(topK)
  }

  /** §2.2 #319 — ITEM-ITEM collaborative similarity: parts scored by the
    * cosine of their CUSTOMER co-purchase vectors — co/√(n_a·n_b) over the
    * binary customer×part matrix — the "customers who bought X also
    * bought Y" primitive (#189 mines WITHIN-order pairs and lift; this
    * sees cross-order taste at the customer level, which is where
    * recommendations live). Candidates from the within-customer pair
    * fan-out (C(basket,2) per customer — never parts²), WHALE baskets
    * capped at `maxBasket` distinct parts (one 10k-part reseller account
    * would emit 50M pairs from one customer; the kept parts are the
    * lowest part keys — deterministic — and the truncation is surfaced
    * as `n_truncated_custs`, never silent), part user-counts over the
    * capped frame broadcast back, cosine from exact integers in fixed
    * order; output ordered by the INTEGER co-count (double-free
    * ordering), cosine floor-rounded alongside.
    */
  def itemCf(spark: SparkSession, dir: String, minCo: Int = 2,
      topK: Int = 50, maxBroadcastParts: Long = 10000000L,
      maxBasket: Int = 1000): DataFrame = {
    val li = t(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
    val o = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    // ONE eager materialization of the ranked user×part frame; both the
    // truncation counter and the capped pair-join input are cheap filters
    // over its cached blocks. (r9 shipped two eager checkpoints — each
    // re-ran the join+distinct+window — a 1.81× solo regression.)
    val upAll = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
      .withColumn("prank", row_number().over(
        Window.partitionBy("cust").orderBy("part")))
      .localCheckpoint(true)
    val truncated = upAll.where(col("prank") > maxBasket)
      .agg(countDistinct("cust").as("n_truncated_custs"))
    val up = upAll.where(col("prank") <= maxBasket).drop("prank")
    val freq = up.groupBy("part").agg(count(lit(1)).as("n_users"))
    val hint: DataFrame => DataFrame =
      if (t(spark, dir, "part").count() <= maxBroadcastParts) broadcast else identity
    // The basket self-join EXPANDS to Σ C(basket,2) pairs per cust — AQE's
    // byte-based coalescing saw ~9 MB of keys and ran the 7M-pair
    // expansion + partial count on 8 tasks (2.4 s of the query, r15
    // JobProf). Explicit-count co-partitioning by cust (one exchange,
    // reused by both identical sides) opts it out; count flows from
    // spark.sql.shuffle.partitions, so production values come from conf.
    val upS = Par.spreadBy(up, col("cust"))
    upS.select(col("cust"), col("part").as("part_a"))
      .join(upS.select(col("cust"), col("part").as("part_b")), "cust")
      .where(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("co_users"))
      .where(col("co_users") >= minCo)
      .join(hint(freq.select(col("part").as("part_a"),
        col("n_users").as("users_a"))), "part_a")
      .join(hint(freq.select(col("part").as("part_b"),
        col("n_users").as("users_b"))), "part_b")
      .crossJoin(broadcast(truncated))
      .select(col("part_a"), col("part_b"), col("co_users"),
        col("users_a"), col("users_b"),
        fl6(col("co_users").cast("double") /
          sqrt((col("users_a") * col("users_b")).cast("double"))).as("cos"),
        col("n_truncated_custs"))
      .orderBy(col("co_users").desc, col("part_a").asc, col("part_b").asc)
      .limit(topK)
  }

  /** §2.2 #320 — STRATIFIED treatment effect: the #315 arms × periods
    * frame adjusted for pre-period ACTIVITY strata — per-user pre-period
    * event counts bucket users into low/mid/high, the per-stratum arm
    * difference of post-period value sums surfaces heterogeneous effects
    * (and confounding: if arms were imbalanced on activity, the pooled
    * difference lies — the stratified weighted sum Σ(n_s/N)·Δ_s is the
    * direct-standardization fix). One user shuffle (pre count + post sum,
    * exact DECIMAL), a bounded ≤3-row stratum rollup, and an 'ALL' row
    * carrying the weighted pooled effect; all divisions fixed-order
    * doubles over exact integers/decimals.
    */
  def stratifiedEffect(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("value"), to_date(col("ts")).as("day"))
    val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
      .select(expr("date_add(mn, CAST(floor(datediff(mx, mn) / 2) AS INT))")
        .as("bound"))
    val base = ev.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(sum(when(col("day") < col("bound"), 1L).otherwise(0L)).as("n_pre"),
        sum(when(col("day") >= col("bound"), col("value").cast(dec))).as("y"))
      .where(col("n_pre") > 0 && col("y").isNotNull)
      .localCheckpoint(true)
    // Scale-free strata: below / at-or-above the exact lower MEDIAN of
    // pre-period activity (a fixed count boundary degenerates when the SF
    // changes the per-user event rate; the median splits at any scale).
    // Median via the value histogram — the #274 convention.
    val wCum = Window.orderBy("n_pre")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = base.groupBy("n_pre").agg(count(lit(1)).as("cnt"))
      .select(col("n_pre"), sum("cnt").over(wCum).as("cum"),
        sum("cnt").over(Window.partitionBy()).as("n"))
      .agg(min(when(col("cum") >= ceil(col("n") * 0.5).cast("long"),
        col("n_pre"))).as("med"))
    val users = base.crossJoin(broadcast(med))
      .withColumn("stratum",
        when(col("n_pre") < col("med"), lit("1_below_median"))
          .otherwise(lit("2_at_above_median")))
      .withColumn("arm",
        when(substring(sha2(col("user_id").cast("string"), 256), 1, 1) <= "7",
          lit("A")).otherwise(lit("B")))
    val strat = users.groupBy("stratum")
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "A", col("y"))).as("sa"),
        sum(when(col("arm") === "B", col("y"))).as("sb"))
      .localCheckpoint(true)
    val effect = col("sb").cast("double") / col("n_b").cast("double") -
      col("sa").cast("double") / col("n_a").cast("double")
    val perStratum = strat.select(col("stratum"), col("n_a"), col("n_b"),
      fl6(effect).as("effect"))
    val pooled = strat
      .select(col("n_a"), col("n_b"),
        ((col("n_a") + col("n_b")).cast("double") * effect).cast(dec12)
          .as("we"))
      .agg(sum("n_a").as("n_a"), sum("n_b").as("n_b"),
        sum("we").as("wsum"))
      .select(lit("ALL").as("stratum"), col("n_a"), col("n_b"),
        fl6(col("wsum").cast("double") /
          (col("n_a") + col("n_b")).cast("double")).as("effect"))
    perStratum.unionByName(pooled).orderBy("stratum")
  }

  /** §2.2 #190 — new-vs-repeat revenue split by month: each order labeled
    * by whether it falls on its customer's FIRST order date — the
    * aggregate-then-rejoin on custkey (customer-bounded first-date frame,
    * one equi-join back to orders on the key both would bucket on), then
    * one conditional aggregation to a month-bounded frame. The classic
    * acquisition-vs-retention revenue decomposition.
    */
  def newVsRepeat(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        col("o_totalprice"))
    val first = o.groupBy("o_custkey").agg(min("d").as("first_d"))
    o.join(first, "o_custkey")
      .withColumn("is_new", col("d") === col("first_d"))
      .groupBy(date_format(date_trunc("month", col("d")), "yyyy-MM-dd").as("month"))
      .agg(
        dsum(when(col("is_new"), col("o_totalprice")).otherwise(lit(0.0)))
          .as("new_revenue"),
        dsum(when(!col("is_new"), col("o_totalprice")).otherwise(lit(0.0)))
          .as("repeat_revenue"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new_orders"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_repeat_orders"))
      .orderBy("month")
  }

  /** §2.2 #184 — TPC-H Q15 (top supplier, ties included): suppliers whose
    * quarter revenue equals the maximum — the classic view-then-max. The
    * per-supplier rollup is ONE partial-agg shuffle; the max re-enters as
    * a broadcast single-row frame (never a window over all suppliers, and
    * never a second scan of lineitem — the rollup is reused for both the
    * max and the filter via one cached-in-plan subtree Catalyst shares).
    */
  def tpchQ15(spark: SparkSession, dir: String, quarterStart: String = "1996-01-01",
      quarterEnd: String = "1996-04-01"): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= to_date(lit(quarterStart)) &&
        col("l_shipdate") < to_date(lit(quarterEnd)))
      .groupBy("l_suppkey")
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_rev"))
    t(spark, dir, "supplier").select("s_suppkey", "s_name")
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(top), col("total_revenue") === col("max_rev"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** §2.2 #185 — TPC-H Q4 shape (order-priority check): orders in a
    * quarter counted by priority where at least ONE line was returned —
    * the EXISTS that plans as a LEFT SEMI join (each order tests
    * membership once; the semi probe never multiplies rows, so the count
    * is per-order no matter how many lines matched). The reduced schema
    * has no commit/receipt dates, so "late line" becomes "returned line"
    * (`l_returnflag = 'R'`) — identical plan shape, same semi-join
    * physics.
    */
  def tpchQ4(spark: SparkSession, dir: String, quarterStart: String = "1996-01-01",
      quarterEnd: String = "1996-04-01"): DataFrame = {
    val returned = t(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R").select("l_orderkey")
    t(spark, dir, "orders")
      .where(col("o_orderdate") >= to_date(lit(quarterStart)) &&
        col("o_orderdate") < to_date(lit(quarterEnd)))
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** §2.2 #186 — TPC-H Q17 shape (small-lot revenue): revenue from lines
    * whose quantity is below 20% of their part's average — the
    * aggregate-then-rejoin on partkey (the correlated scalar subquery
    * de-correlated by hand into one partial-agg rollup + an equi-join).
    * The per-part average frame is part-bounded so it broadcasts; brand
    * filter prunes BOTH the rollup and the probe at their scans. The
    * reduced schema has no p_container, so the cut is brand-only. Exact
    * decimal average (decimal quotient, not double) so the threshold
    * comparison is deterministic cross-engine.
    */
  def tpchQ17(spark: SparkSession, dir: String, brand: String = "Brand#1"): DataFrame = {
    val part = t(spark, dir, "part").where(col("p_brand") === brand)
      .select("p_partkey")
    val lines = t(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    // qty < 0.2 * (sum/n)  ⟺  5 * qty * n < sum — division-free, so the
    // threshold is exact decimal/integer arithmetic on BOTH engines
    // (decimal-division rounding rules differ cross-engine; multiplying
    // through by 5n removes the quotient entirely).
    val avgQty = lines.groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
        count(lit(1)).as("n_li"))
    lines.join(broadcast(avgQty), col("l_partkey") === col("a_partkey"))
      .where(col("l_quantity").cast(DecimalType(18, 2)) * lit(5) * col("n_li") <
        col("sum_qty"))
      .agg(dsum(col("l_extendedprice")).as("small_lot_revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** §2.2 #187 — TPC-H Q22 shape (idle wealthy customers): customers with
    * above-average positive balance and NO orders since a cutoff, counted
    * per nation — the global-average scalar (one-row broadcast cross
    * join, computed once, never a correlated re-scan) plus the anti-join
    * that proves absence. The reduced schema has no c_phone country
    * codes, so the cut is nation instead; and this synthetic data gives
    * every customer SOME order, so absence is time-windowed ("no orders
    * since") — the real churn formulation, and the date filter prunes
    * the anti side at its scan. Candidates are balance-pruned BEFORE the
    * probe, so the anti side ships only the qualifying slice.
    */
  def tpchQ22(spark: SparkSession, dir: String,
      idleSince: String = "1999-01-01"): DataFrame = {
    val cust = t(spark, dir, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal")
    // bal > sum/n  ⟺  bal * n > sum — division-free (see tpchQ17): the
    // global-average threshold stays exact decimal arithmetic cross-engine.
    val avgBal = cust.where(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("sum_bal"),
        count(lit(1)).as("n_pos"))
    val idle = cust
      .crossJoin(broadcast(avgBal))
      .where(col("c_acctbal").cast(DecimalType(18, 2)) * col("n_pos") >
        col("sum_bal"))
      .join(t(spark, dir, "orders")
          .where(col("o_orderdate") >= to_date(lit(idleSince)))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
    val nat = t(spark, dir, "nation").select("n_nationkey", "n_name")
    idle.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("n_name")
  }

  /** §2.2 #198 — TPC-H Q19 (discounted revenue, disjunctive predicate):
    * revenue over an OR of three (brand, size-range, quantity-range)
    * conjunctions — the pushdown stress test: Catalyst must push the
    * part-only disjuncts (brand OR-tree, size bounds) to the part scan
    * and the quantity bounds to the lineitem scan (each side keeps the
    * union of its own columns' bounds), with the cross-table residual
    * evaluated on the joined row. Part is dim-bounded and broadcasts;
    * one pass, exact decimal revenue.
    */
  def tpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part").select("p_partkey", "p_brand", "p_size")
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 40))
    t(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .where(cond)
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** §2.2 #199 — TPC-H Q21 shape (suppliers who kept waiting): finished
    * multi-supplier orders where EXACTLY ONE supplier had returned lines —
    * that supplier failed while the others delivered. The reference
    * formulation is EXISTS + NOT EXISTS correlated on the same fact;
    * de-correlated here into ONE per-order aggregate (distinct suppliers
    * overall, distinct suppliers among returns, max = the culprit when
    * unique) — one shuffle on orderkey instead of two correlated fact
    * re-probes, the form that survives 100 TB. Counted per supplier,
    * top-k with full tie-breaks.
    */
  def tpchQ21(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val fin = t(spark, dir, "orders")
      .where(col("o_orderstatus") === "F").select("o_orderkey")
    val perOrder = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag")
      .join(fin, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(count_distinct(col("l_suppkey")).as("n_supp"),
        count_distinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_ret_supp"),
        max(when(col("l_returnflag") === "R", col("l_suppkey"))).as("culprit"))
      .where(col("n_supp") >= 2 && col("n_ret_supp") === 1)
    perOrder
      .join(t(spark, dir, "supplier").select("s_suppkey", "s_name"),
        col("culprit") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(topK)
  }

  /** §2.2 #200 — TPC-H Q9 shape (product-type profit by nation and year):
    * profit = revenue − quantity·(0.8·retail) with the supply cost
    * derived from part's retail price (the reduced schema has no
    * partsupp); the plan is the real Q9 tree — part (name-filtered) and
    * the supplier→nation dim chain broadcast onto lineitem, orders
    * attaches by the orderkey shuffle, group by (nation, year). Profit
    * terms are cast to decimal per-row so the aggregate is
    * order-independent.
    */
  def tpchQ9(spark: SparkSession, dir: String, partType: String = "STANDARD"): DataFrame = {
    val part = t(spark, dir, "part").where(col("p_type") === partType)
      .select("p_partkey", "p_retailprice")
    val nat = t(spark, dir, "nation").select("n_nationkey", "n_name")
    val sup = t(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val ord = t(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("l_quantity") * col("p_retailprice") * lit(0.8)
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum6(profit).as("sum_profit"), count(lit(1)).as("n_lines"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** §2.2 #183 — TPC-H Q14 (promotion effect): promo revenue share in one
    * month — conditional aggregation over ONE pass of the month's lines,
    * part type attached by broadcast; the month filter reaches the
    * lineitem scan. Single-row result; numerator and denominator are
    * exact decimal sums so the percentage is deterministic.
    */
  def tpchQ14(spark: SparkSession, dir: String, monthStart: String = "1996-03-01",
      monthEnd: String = "1996-04-01"): DataFrame = {
    val part = t(spark, dir, "part").select("p_partkey", "p_type")
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= to_date(lit(monthStart)) &&
        col("l_shipdate") < to_date(lit(monthEnd)))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        dsum6(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0)))
          .as("promo_revenue"),
        dsum6(vol).as("total_revenue"),
        count(lit(1)).as("n_lines"))
      .withColumn("promo_share",
        (floor((lit(100.0) * col("promo_revenue") / col("total_revenue")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select("promo_revenue", "total_revenue", "promo_share", "n_lines")
  }

  /** §2.2 #203 — funnel TIME-TO-CONVERT: for each adjacent stage pair of
    * [[funnel]]'s qualified completion chain, the latency distribution
    * (count / min / exact lower median / max / mean, µs) between completing
    * stage i and stage i+1. The companion to the stage-count funnel: counts
    * say WHERE users drop, latencies say how long the survivors took.
    *
    * Exactness: deltas are integer microseconds; the median is the #48
    * VALUE-HISTOGRAM lower median (cumulative counts over distinct deltas,
    * partitioned by step — never a per-group row sort), the mean is an
    * exact integer sum divided once in double and rounded. Scale shape:
    * the per-stage completion frames are user-keyed aggregates (the same
    * plan as [[funnel]]); each stage pair is ONE user-keyed join of
    * |users|-row frames, and the final stats collapse to |stages|−1 rows.
    */
  def funnelTime(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
    val reached = stages.scanLeft(Option.empty[DataFrame]) {
      case (prev, stage) =>
        val mine = ev.where(col("event_type") === stage)
        val qualified = prev match {
          case None => mine
          case Some(p) => mine.join(p.select(col("user_id"), col("t_done")), "user_id")
            .where(col("t_us") > col("t_done"))
        }
        Some(qualified.groupBy("user_id").agg(min("t_us").as("t_done")))
    }.flatten
    val deltas = reached.zip(reached.tail).zip(stages.zip(stages.tail)).map {
      case ((a, b), (sa, sb)) =>
        b.select(col("user_id"), col("t_done").as("t_b"))
          .join(a.select(col("user_id"), col("t_done").as("t_a")), "user_id")
          .select(lit(s"$sa->$sb").as("step"), (col("t_b") - col("t_a")).as("delta_us"))
    }.reduce(_ unionAll _)
    val wCum = Window.partitionBy("step").orderBy("delta_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("step")
    val med = deltas.groupBy(col("step"), col("delta_us"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("step"), col("delta_us"),
        sum("cnt").over(wCum).as("cum"), sum("cnt").over(wAll).as("n"))
      .groupBy("step")
      .agg(min(when(col("cum") >= ceil(col("n") * 0.5).cast("long"),
        col("delta_us"))).as("med_us"))
    deltas.groupBy("step")
      .agg(count(lit(1)).as("n_users"),
        min("delta_us").as("min_us"), max("delta_us").as("max_us"),
        (floor((sum(col("delta_us").cast(DecimalType(28, 0))).cast("double") /
          count(lit(1))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("avg_us"))
      .join(broadcast(med), "step")
      .select("step", "n_users", "min_us", "med_us", "max_us", "avg_us")
      .orderBy("step")
  }

  /** §2.2 #204 — PEAK CONCURRENCY: per day, the maximum number of
    * simultaneously-open sessions ([[sessionizeBatch]] sessions, 30-min
    * gap) — the capacity-planning number behind "how many live sessions
    * must the serving tier hold". Classic interval-stacking sweep: each
    * session contributes a +1 boundary at its start and a −1 at its end;
    * the running sum over time-ordered boundaries IS the concurrency
    * curve, and its per-day max is read at start boundaries only (the
    * curve rises only at starts; ends at instant t keep counting at t, so
    * +1 sorts before −1 on ties).
    *
    * Scale shape: sessions are already a user-keyed aggregate; boundaries
    * are 2 rows/session. The global time-ordered prefix sum runs as
    * [[PrefixScan.runningSum]]'s chunked two-pass scan — per-time-range
    * chunk windows in parallel plus a bounded carry broadcast (an
    * unpartitioned Spark window would drag every boundary row into ONE
    * task). Chunks split on t_us VALUE ranges, so all boundaries at an
    * instant share a chunk and the (+1 before −1, then user/seq) tie-break
    * stays local; the carry-in is a sum over whole prior chunks, which is
    * order-independent. The per-row max is read at start boundaries only
    * (the curve rises only at starts), so the result is engine- and
    * partition-count-invariant.
    */
  def concurrency(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val sess = sessionizeBatch(spark, dir, gapMinutes)
      .select("user_id", "sess_seq", "first_us", "last_us")
    val bounds = sess.select(col("first_us").as("t_us"), lit(1L).as("delta"),
        col("user_id"), col("sess_seq"))
      .unionAll(sess.select(col("last_us").as("t_us"), lit(-1L).as("delta"),
        col("user_id"), col("sess_seq")))
    PrefixScan.runningSum(bounds, "t_us",
        Seq(col("t_us"), col("delta").desc, col("user_id"), col("sess_seq")),
        "delta", "running")
      .where(col("delta") === 1L)
      .groupBy(date_format(timestamp_micros(col("t_us")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_starts"), max("running").as("peak_concurrent"))
      .orderBy("day")
  }

  /** §2.2 #205 — 2-D PARETO SKYLINE of `part` (minimize price, maximize
    * size): the rows no other row strictly dominates — the
    * multi-objective shortlist query ("no part is both cheaper and
    * bigger"). NOT the O(n²) dominance anti-join: for 2-D the skyline is a
    * running max over the price-sorted DISTINCT-price profile — a part is
    * dominated iff a strictly cheaper price reached its size, or its own
    * price has a strictly larger size. The strict-predecessor max runs as
    * [[PrefixScan.runningMax]]'s chunked distributed scan (exclusive
    * frame) over the distinct-price profile — no one-task unpartitioned
    * window — then one shuffle join back on price; at 100 TB the
    * dominance test never touches row pairs.
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
      .select("p_partkey", "p_name", "p_retailprice", "p_size")
    val profile = PrefixScan.runningMax(
      p.groupBy("p_retailprice").agg(max("p_size").as("pmax")),
      "p_retailprice", Seq(col("p_retailprice")), "pmax", "m_lt",
      exclusive = true)
    p.join(profile, "p_retailprice")
      .where(col("p_size") === col("pmax") &&
        (col("m_lt").isNull || col("pmax") > col("m_lt")))
      .select("p_partkey", "p_name", "p_retailprice", "p_size")
      .orderBy("p_retailprice", "p_partkey")
  }

  /** §2.2 #206 — POISSON-BOOTSTRAP confidence interval for mean order
    * price: `nBoot` deterministic resamples, each weighting every row by a
    * Poisson(1) draw derived from sha256(orderkey|replicate) — the
    * streaming-friendly bootstrap (per-row independent weights, no global
    * resampling pass) that scales to massive data because each replicate
    * is just a weighted aggregate. The 95% CI is the empirical
    * 2.5%/97.5% order statistics of the replicate means.
    *
    * Determinism: the uniform draws are 4-hex-char SLICES of
    * sha256(orderkey|group) compared LEXICOGRAPHICALLY against fixed hex
    * thresholds (floor of the cumulative Poisson(1) pmf × 2¹⁶) — string
    * compares both engines execute identically, no float RNG anywhere.
    * ONE hash feeds 16 replicates (the 64-hex digest sliced into 16
    * independent 16-bit draws), so the scan pays ⌈nBoot/16⌉ hashes per
    * row, not nBoot — hashing is the entire cost of this operator and
    * this is the 13× lever that makes it linear-cheap at 100 TB.
    * Replicate means are exact decimal/integer sums divided once in
    * double. Scale shape: the explode-by-replicate multiplies scan-side
    * work by nBoot but map-side partial aggregation collapses the shuffle
    * to nBoot × partitions rows; the order-statistics window runs over
    * `nBoot` rows.
    */
  def bootstrapCi(spark: SparkSession, dir: String, nBoot: Int = 100): DataFrame = {
    // floor(cumsum(Poisson(1) pmf at k=0..5) * 2^16) in hex; weight 6 beyond.
    val thresholds = Seq("5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9")
    val nGroups = (nBoot + 15) / 16
    // Three hot-path design points, each worth integer factors at 100 TB:
    //  - h4 is materialized ONCE per slot row (its own projection —
    //    CollapseProject keeps it because the CASE references it six
    //    times; inlined, the plan paid six substring evaluations per row).
    //    A transform-lambda variant that precomputed all 16 weights per
    //    hash was MEASURED 6× slower — higher-order functions run
    //    interpreted, outside whole-stage codegen; the explode+substring
    //    shape stays fully codegen'd;
    //  - prices ride as integer CENTS summed into DECIMAL(38,0) (compact
    //    long adds until the running sum outgrows 18 digits — exact at any
    //    volume, no BigDecimal on the per-row path);
    //  - the aggregation groups by (rep, weight) so the scan-side work is
    //    a plain integer sum — the ×weight multiply happens on the
    //    7·nBoot-row frame after, never on the exploded corpus.
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val wgt = thresholds.zipWithIndex.foldRight(lit(6): Column) {
      case ((thr, k), rest) => when(col("h4") < lit(thr), k).otherwise(rest)
    }
    // The ×⌈nBoot/16⌉ explode+hash below is the operator's entire cost and
    // runs MAP-SIDE on the scan: spread the pruned two-column frame first
    // (guide §2.5) so a sub-split local file doesn't serialize 7 sha256
    // evaluations per order on one core. No-op at scale (scan splits ≥
    // slots); r15 measured 7.1 s single-task → sub-second at 32 tasks.
    val o = Par.spread(t(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT)").as("xc")))
    val means = o
      .select(col("o_orderkey"), col("xc"),
        explode(sequence(lit(0), lit(nGroups - 1))).as("grp"))
      .withColumn("h", sha2(concat(col("o_orderkey").cast("string"), lit("|"),
        col("grp").cast("string")), 256))
      .select(col("xc"), col("grp"), col("h"),
        explode(sequence(lit(0), lit(15))).as("slot"))
      .withColumn("rep", col("grp") * 16 + col("slot") + 1)
      .where(col("rep") <= nBoot)
      .withColumn("h4", expr("substring(h, slot * 4 + 1, 4)"))
      .withColumn("w", wgt)
      .groupBy("rep", "w")
      .agg(sum(col("xc").cast(dec0)).as("sxc"), count(lit(1)).as("nw"))
      .groupBy("rep")
      .agg((sum(col("sxc") * col("w")).cast("double") /
        (sum(col("w").cast("long") * col("nw")).cast("double") * lit(100.0)))
        .as("mean_b"))
    val loRk = math.max(1, math.floor(0.025 * nBoot).toInt + 1)
    val hiRk = math.min(nBoot, math.ceil(0.975 * nBoot).toInt)
    val ci = means
      .withColumn("rk", row_number().over(Window.orderBy("mean_b", "rep")))
      .agg(min(when(col("rk") === loRk, col("mean_b"))).as("ci_lo"),
        min(when(col("rk") === hiRk, col("mean_b"))).as("ci_hi"))
    t(spark, dir, "orders")
      .agg(count(lit(1)).as("n_rows"),
        (floor((sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double") /
          count(lit(1))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean_full"))
      .crossJoin(ci)
      .select(lit(nBoot).cast("long").as("n_boot"), col("n_rows"),
        col("mean_full"), (floor((col("ci_lo")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("ci_lo"),
        (floor((col("ci_hi")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("ci_hi"))
  }

  /** §2.2 #210 — EXACT grouped QUARTILES (p25/p50/p75 of customer balance
    * per market segment) via the #48 VALUE-HISTOGRAM formulation: cumulative
    * counts over DISTINCT values per group, quantile q = min value whose
    * cumulative count reaches ⌈n·q⌉ — the lower order statistic, exact and
    * engine-identical, never a per-group row sort and never an approximate
    * sketch. The grouped generalization of the median machinery the MAD
    * operator uses: one histogram aggregation (shuffle ∝ distinct values,
    * not rows), one window over the histogram, one |groups|-row rollup.
    */
  def quartiles(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(12, 2)
    val c = t(spark, dir, "customer")
      .select(col("c_mktsegment").as("seg"), col("c_acctbal").cast(dec).as("v"))
    val wCum = Window.partitionBy("seg").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("seg")
    def q(p: Double, out: String) =
      min(when(col("cum") >= ceil(col("n") * p).cast("long"), col("v")))
        .cast("double").as(out)
    c.groupBy("seg", "v").agg(count(lit(1)).as("cnt"))
      .select(col("seg"), col("v"),
        sum("cnt").over(wCum).as("cum"), sum("cnt").over(wAll).as("n"))
      .groupBy("seg")
      .agg(max("n").as("n_rows"), q(0.25, "p25"), q(0.5, "p50"), q(0.75, "p75"))
      .orderBy("seg")
  }

  /** §2.2 #214 — two-sample KOLMOGOROV-SMIRNOV statistic between the order
    * price distributions of two customer segments, computed EXACTLY: D =
    * max |F_A − F_B| over the pooled value histogram, with the comparison
    * done on the INTEGER cross product |cumA·nB − cumB·nA| — no float CDF
    * anywhere, so the argmax (and the reported location) can never flip on
    * an ulp; the single division happens once, on the already-maximized
    * integer, rounded. The distribution-drift test behind "did this
    * segment's spend profile change" at any data volume: one histogram
    * aggregation (shuffle ∝ distinct prices), then BOTH cumulative CDFs in
    * one [[PrefixScan.runningSums]] distributed scan (no one-task window
    * over the histogram), bounded-frame joins after.
    */
  def ksTest(spark: SparkSession, dir: String, segA: String = "BUILDING",
      segB: String = "MACHINERY"): DataFrame = {
    val dec = DecimalType(18, 2)
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val v = t(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin(segA, segB))
      .select(col("c_mktsegment").as("seg"), col("o_totalprice").cast(dec).as("v"))
    val h = v.groupBy("v").agg(
      sum(when(col("seg") === segA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("seg") === segB, 1L).otherwise(0L)).as("cb"))
    val totals = h.agg(sum("ca").as("na"), sum("cb").as("nb"))
    // The cross products cumA·n_B / cumB·n_A (and the denominator n_A·n_B)
    // wrap LONG silently past ~3e9 rows per side — the same overflow class
    // fixed in wasserstein/interarrival (r9/r10); factors are cast to
    // DECIMAL(19,0) BEFORE the multiply so the (38,0) product stays exact
    // at any order count (r10 VERDICT #4).
    val f19 = DecimalType(19, 0)
    val d = PrefixScan.runningSums(h, "v", Seq(col("v")),
        Seq("ca" -> "cuma", "cb" -> "cumb"))
      .select("v", "cuma", "cumb")
      .crossJoin(broadcast(totals))
      .withColumn("dnum", abs(col("cuma").cast(f19) * col("nb").cast(f19) -
        col("cumb").cast(f19) * col("na").cast(f19)))
    val maxd = d.agg(max("dnum").as("max_num"))
    d.join(broadcast(maxd), col("dnum") === col("max_num"))
      .groupBy("na", "nb", "max_num")
      .agg(min("v").cast("double").as("at_value"))
      .select(col("na"), col("nb"),
        (floor((col("max_num").cast("double") /
          (col("na").cast(f19) * col("nb").cast(f19)).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("d_stat"),
        col("at_value"))
  }

  /** §2.2 #215 — POPULATION STABILITY INDEX of order price, pre- vs
    * post-split-date: the production drift monitor for "did the
    * distribution my model/pipeline was tuned on move". Reference deciles
    * are EXACT lower order statistics from the value histogram (cumulated
    * by [[PrefixScan.runningSum]]'s distributed scan over distinct prices
    * — no one-task window); both periods then bin against the broadcast
    * 9-row edge set via per-distinct-value counting (never a per-row edge
    * scan), and PSI = Σ (p_ref − p_cur)·ln(p_ref/p_cur) over the 10
    * bounded cells with Laplace-smoothed shares (+1/+10 — a decile of the
    * current period CAN be empty after real drift; smoothing keeps the
    * statistic finite without a data-dependent guard). Cell terms are
    * deterministic doubles over exact integer counts, summed exactly via
    * decimal cast.
    */
  def psi(spark: SparkSession, dir: String, split: String = "1997-01-01"): DataFrame = {
    val dec = DecimalType(18, 2)
    val decT = DecimalType(28, 12)
    val o = t(spark, dir, "orders")
      .select(when(col("o_orderdate") < to_date(lit(split)), "ref")
        .otherwise("cur").as("period"), col("o_totalprice").cast(dec).as("v"))
    val hist = o.where(col("period") === "ref")
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val tot = hist.agg(sum("cnt").as("n_ref"))
    val edges = PrefixScan
      .runningSum(hist, "v", Seq(col("v")), "cnt", "cum")
      .select("v", "cum")
      .crossJoin(broadcast(tot))
      .select(col("v"), col("cum"), col("n_ref"),
        explode(sequence(lit(1), lit(9))).as("q"))
      .where(col("cum") >= ceil(col("n_ref") * col("q") / 10.0).cast("long"))
      .groupBy("q").agg(min("v").as("edge"))
    val pv = o.groupBy("period", "v").agg(count(lit(1)).as("c"))
    val cells = pv.crossJoin(broadcast(edges.select("edge")))
      .groupBy("period", "v", "c")
      .agg(sum(when(col("v") > col("edge"), 1L).otherwise(0L)).as("gt"))
      .groupBy((col("gt") + 1).as("bin"))
      .agg(sum(when(col("period") === "ref", col("c")).otherwise(0L)).as("n_ref"),
        sum(when(col("period") === "cur", col("c")).otherwise(0L)).as("n_cur"))
    val tots = cells.agg(sum("n_ref").as("ta"), sum("n_cur").as("tb"))
    cells.crossJoin(broadcast(tots))
      .withColumn("pa", (col("n_ref") + lit(1L)) / (col("ta") + lit(10L)))
      .withColumn("pb", (col("n_cur") + lit(1L)) / (col("tb") + lit(10L)))
      .withColumn("term", (col("pa") - col("pb")) * log(col("pa") / col("pb")))
      .withColumn("psi", (floor((sum(col("term").cast(decT))
        .over(Window.partitionBy()).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        (floor((col("pa")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("share_ref"), (floor((col("pb")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("share_cur"),
        (floor((col("term")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("term"), col("psi"))
      .orderBy("bin")
  }

  /** §2.2 #216 — CUSUM CHANGEPOINT over daily revenue: the day where the
    * cumulative deviation from the global mean peaks — the classic
    * single-changepoint locator for "when did the level shift". Kept
    * ENTIRELY in integer/decimal arithmetic by maximizing the n-SCALED
    * deviation n·Σ_{≤d}(r−μ) = n·prefix(d) − idx(d)·total (exact decimal —
    * no float mean subtraction per day, so the argmax is engine-exact);
    * the one division happens after the max, for display. Day frame is
    * calendar-bounded: the windows run over |days| rows, the daily rollup
    * is the only corpus-sized aggregation.
    */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val tot = daily.agg(sum("rev").as("tot_rev"), count(lit(1)).as("n_days"))
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wIdx = Window.orderBy("day")
    val cs = daily.crossJoin(broadcast(tot))
      .withColumn("pref", sum("rev").over(wCum))
      .withColumn("idx", row_number().over(wIdx))
      .withColumn("absdev",
        abs(col("n_days") * col("pref") - col("idx") * col("tot_rev")))
    val mx = cs.agg(max("absdev").as("mx"))
    cs.join(broadcast(mx), col("absdev") === col("mx"))
      .groupBy("n_days", "mx")
      .agg(min("day").as("cp_day"))
      .select(col("n_days"), col("cp_day"),
        (floor((col("mx").cast("double") / col("n_days").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("max_dev"))
  }

  /** §2.2 #217 — GAPS-AND-ISLANDS activity streaks: per user, the runs of
    * CONSECUTIVE active calendar days (count of streaks, total active days,
    * longest streak + its start date). The island key is the classic
    * `day − row_number` date: constant within a consecutive run, strictly
    * decreasing across gaps — so streak detection is one partitioned window
    * + one groupBy, never a self-join on adjacent days. All windows are
    * partitioned by user over that user's bounded distinct-day list (events
    * are presence-deduped to user×day FIRST, the same decomposition as
    * #168), so nothing global-sorts. Longest-streak argmax is deterministic:
    * (len DESC, start ASC) rank. Integer-exact end to end.
    */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val wU = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("island", date_sub(col("day"), row_number().over(wU)))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"), min("day").as("start"))
    val wBest = Window.partitionBy("user_id")
      .orderBy(col("len").desc, col("start").asc)
    val best = islands.withColumn("rk", row_number().over(wBest))
      .where(col("rk") === 1)
      .select(col("user_id"), col("len").as("longest_streak"),
        date_format(col("start"), "yyyy-MM-dd").as("longest_start"))
    islands.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"), sum("len").as("n_active_days"))
      .join(best, "user_id")
      .select("user_id", "n_streaks", "n_active_days", "longest_streak",
        "longest_start")
      .orderBy("user_id")
  }

  /** §2.2 #218 — per-segment OLS TREND (slope/intercept of order value vs
    * time): the closed-form least-squares fit from five distributive sums
    * (n, Σx, Σy, Σxy, Σx²) — ONE partial-aggregated pass over the fact
    * join, no iteration, no centering pass. Engine-exactness: y is held in
    * integer CENTS (decimal ×100 → long) and x in integer day offsets, so
    * every sum and the slope numerator/denominator n·Σxy − Σx·Σy are exact
    * integers (widened to decimal(38,0) before the products — a long×long
    * product would silently wrap at sf≫1); the only float ops are the two
    * final divisions. Customer is fact-scale so it joins orders by shuffle
    * on the key both would bucket on; the per-segment rollup is 5 rows.
    */
  def linreg(spark: SparkSession, dir: String, anchor: String = "1995-01-01")
      : DataFrame = {
    val big = DecimalType(38, 0)
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      datediff(to_date(col("o_orderdate")), to_date(lit(anchor)))
        .cast("long").as("x"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val c = t(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val s = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("yc").as("syc"),
        sum(col("x") * col("yc")).as("sxyc"), sum(col("x") * col("x")).as("sxx"))
    val num = col("n").cast(big) * col("sxyc").cast(big) -
      col("sx").cast(big) * col("syc").cast(big)
    val den = col("n").cast(big) * col("sxx").cast(big) -
      col("sx").cast(big) * col("sx").cast(big)
    val slopeC = num.cast("double") / den.cast("double")
    s.withColumn("slope_raw", slopeC / 100.0)
      .withColumn("intercept_raw",
        (col("syc").cast("double") / 100.0 -
          col("slope_raw") * col("sx").cast("double")) / col("n").cast("double"))
      .select(col("segment"), col("n"), (floor((col("slope_raw")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("slope"),
        (floor((col("intercept_raw")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("intercept"))
      .orderBy("segment")
  }

  /** §2.2 #219 — HERFINDAHL–HIRSCHMAN concentration of revenue by nation
    * within each region: Σ share² + the top-nation share — the antitrust /
    * portfolio-concentration metric, and the skew early-warning for
    * partition planning. Kept ratio-exact by NEVER materializing float
    * shares: HHI = Σ nat_rev² / region_rev² with both sides exact decimals
    * (nation totals re-narrowed to decimal(18,2) so the squares stay inside
    * decimal(38,4) — the unnarrowed sum type would overflow the product),
    * one double division at the end. Orders pre-aggregate by custkey before
    * the fact-scale customer join (shuffle on the natural bucket key);
    * nation/region fold into one broadcast.
    */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val custRev = t(spark, dir, "orders").groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(dec)).as("crev"))
    val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val dims = t(spark, dir, "nation")
      .join(t(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
    val natRev = custRev.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
      .groupBy("r_name", "n_name")
      .agg(sum("crev").cast(dec).as("nrev"))
    natRev.groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"),
        sum(col("nrev") * col("nrev")).as("sum_sq"),
        sum("nrev").cast(dec).as("rrev"), max("nrev").as("top_rev"))
      .select(col("r_name"), col("n_nations"),
        (floor((col("sum_sq").cast("double") /
          (col("rrev") * col("rrev")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("hhi"),
        (floor((col("top_rev").cast("double") / col("rrev").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("top_share"))
      .orderBy("r_name")
  }

  /** §2.2 #220 — DAY-OF-WEEK SEASONALITY index of revenue: each weekday's
    * share of revenue relative to a flat 1/7 baseline (index 1.0 = no
    * seasonality) + order counts and average order value. One
    * partial-aggregated pass to 7 cells; ratios computed as exact-decimal
    * numerators (rev×7) over the exact total with a single double division
    * per cell. Weekday numbering pinned to 0=Sunday (Spark `dayofweek`−1)
    * so the key is engine-portable.
    */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val byDow = t(spark, dir, "orders")
      .groupBy((dayofweek(to_date(col("o_orderdate"))) - 1).as("dow"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).as("rev"))
    val tot = byDow.agg(sum("rev").as("tot_rev"))
    byDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        (floor(((col("rev") * 7).cast("double") / col("tot_rev").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("seas_index"),
        (floor((col("rev").cast("double") / col("n_orders").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("avg_order"))
      .orderBy("dow")
  }

  /** §2.2 #221 — EWMA smoothing of daily revenue with DYADIC weights: a
    * 7-term exponentially-weighted moving average with α = 1/2, so the
    * weights 2⁻¹…2⁻⁷ are exact binary fractions — the whole weighted sum
    * stays in decimal (Σ rev_{d−j}·2^{6−j}, integer multipliers 64…1) and
    * the normalization is one division by 127 at the end: bit-identical on
    * any engine, unlike a float-recursive EWMA whose rounding drifts with
    * evaluation order. The series runs on the CONTIGUOUS calendar spine
    * (missing days = 0 revenue) so lag-j is always day−j; the single-
    * partition window is calendar-bounded (|days| rows — same justification
    * as #216), the daily rollup is the only corpus-sized aggregation.
    * Truncated-window start-up rows (first 6 days) are dropped rather than
    * renormalized.
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(dec)).as("rev"))
    val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
    val spine = bounds.select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val full = spine.join(daily, Seq("day"), "left_outer")
      .withColumn("rev", coalesce(col("rev"), lit(0).cast(dec)))
    val w = Window.orderBy("day")
    val num = (0 to 6).map(j => lag(col("rev"), j).over(w) * (1L << (6 - j)))
      .reduce(_ + _)
    full.withColumn("rn", row_number().over(w))
      .withColumn("num", num)
      .where(col("rn") >= 7)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("rev").cast("double").as("revenue"),
        // fl6, not round(): at sf10 the ewma sits at ~1.5e9 where a 6-dp
        // round is below the double's ulp and the two engines' round()
        // implementations leak different tie behavior (sf10 probe).
        fl6(col("num").cast("double") / 127.0).as("ewma"))
      .orderBy("day")
  }

  /** §2.2 #222 — event-time LATENESS profile: how far out-of-order events
    * arrive, measured against the running max event-time in ARRIVAL order
    * (event_id) — the empirical basis for choosing a Structured-Streaming
    * watermark delay (`withWatermark`'s parameter IS this distribution's
    * tail). The arrival-order prefix max runs as [[PrefixScan.runningMax]]'s
    * chunked two-pass scan (per-chunk window + bounded carry broadcast —
    * stock Spark would put an unpartitioned window in ONE task), and the
    * output is a fixed 5-bucket histogram whose total comes from a window
    * over the 5-row bucket frame, so the event scan feeds ONE plan path.
    */
  def latenessProfile(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"))
    val late = PrefixScan
      .runningMax(ev, "event_id", Seq(col("event_id")), "t_us", "run_max")
      .withColumn("late_us", col("run_max") - col("t_us"))
      .withColumn("bucket",
        when(col("late_us") === 0, "0_in_order")
          .when(col("late_us") <= 60L * 1000000L, "1_le_1m")
          .when(col("late_us") <= 600L * 1000000L, "2_le_10m")
          .when(col("late_us") <= 3600L * 1000000L, "3_le_1h")
          .otherwise("4_gt_1h"))
    val buckets = late.groupBy("bucket").agg(count(lit(1)).as("n_events"),
      max("late_us").as("max_late_us"))
    // Share denominator via a window over the 5-row aggregated frame (the
    // bucket key is a literal CASE, so cardinality is a constant 5): one
    // pass, no second evaluation of the lateness subtree.
    buckets
      .withColumn("total", sum("n_events").over(Window.partitionBy()))
      .select(col("bucket"), col("n_events"), col("max_late_us"),
        (floor((col("n_events").cast("double") / col("total").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("share"))
      .orderBy("bucket")
  }

  /** §2.2 #227 — WELCH two-sample t-test of order value between two customer
    * segments (unequal variances — the honest default for revenue data,
    * whose variance differs wildly across segments). The parametric sibling
    * of `q_ks_test`/`q_mannwhitney`: one partial-aggregated pass computes
    * n/Σ/Σ² per side in cents (prices are 2-decimal, so cents-longs are
    * exact; Σ of squares runs in decimal(38,0) because cents² sums wrap
    * long past ~1e4 rows), then the t statistic and Welch–Satterthwaite df
    * are a fixed double formula over six exact scalars — bit-identical
    * cross-engine because every division happens once, on exact inputs, in
    * the same written order. Scale shape: a broadcast-dim join + one
    * map-side-combined aggregate to a single row; nothing ordered, nothing
    * collected.
    */
  def welchTtest(spark: SparkSession, dir: String, segA: String = "BUILDING",
      segB: String = "MACHINERY"): DataFrame = {
    val big = DecimalType(38, 0)
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val c = t(spark, dir, "customer")
      .where(col("c_mktsegment").isin(segA, segB))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val s = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy()
      .agg(
        sum(when(col("seg") === segA, 1L).otherwise(0L)).as("na"),
        sum(when(col("seg") === segB, 1L).otherwise(0L)).as("nb"),
        sum(when(col("seg") === segA, col("yc")).otherwise(0L)).as("sa"),
        sum(when(col("seg") === segB, col("yc")).otherwise(0L)).as("sb"),
        sum(when(col("seg") === segA,
          col("yc").cast(big) * col("yc").cast(big)).otherwise(lit(0).cast(big)))
          .as("qa"),
        sum(when(col("seg") === segB,
          col("yc").cast(big) * col("yc").cast(big)).otherwise(lit(0).cast(big)))
          .as("qb"))
    // Sample variance in cents²: (n·Σx² − (Σx)²) / (n·(n−1)), exact numerator.
    def varC(n: Column, s1: Column, q: Column): Column =
      (n.cast(big) * q - s1.cast(big) * s1.cast(big)).cast("double") /
        (n.cast("double") * (n.cast("double") - 1.0))
    val va = varC(col("na"), col("sa"), col("qa"))
    val vb = varC(col("nb"), col("sb"), col("qb"))
    val sea = va / col("na").cast("double")
    val seb = vb / col("nb").cast("double")
    val tStat = (col("sa").cast("double") / col("na").cast("double") -
      col("sb").cast("double") / col("nb").cast("double")) / sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (col("na").cast("double") - 1.0) +
        seb * seb / (col("nb").cast("double") - 1.0))
    s.select(col("na").as("n_a"), col("nb").as("n_b"),
      (floor((col("sa").cast("double") / col("na").cast("double") / 100.0) * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("mean_a"),
      (floor((col("sb").cast("double") / col("nb").cast("double") / 100.0) * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("mean_b"),
      (floor((tStat) * lit(1e6) + lit(0.5)) / lit(1e6)).as("t_stat"), (floor((df) * lit(1e6) + lit(0.5)) / lit(1e6)).as("df"))
  }

  /** §2.2 #228 — MANN-WHITNEY U (rank-sum) test of order value between two
    * segments — the distribution-free sibling of #227 (no normality
    * assumption; robust to revenue's heavy tail). Computed WITHOUT ranking
    * rows: 2U = Σ_v cntA(v)·(2·cntB(<v) + cntB(v)) over the VALUE HISTOGRAM
    * (group-by price, then [[PrefixScan.runningSum]]'s chunked distributed
    * exclusive scan over distinct values — no one-task window even if the
    * price domain is millions of cent values), so the scan touches
    * |distinct prices| entries, not |orders|, while a row-level rank would
    * shuffle the fact table. Tie correction Σ(t³−t)
    * comes from the same histogram. All counts exact decimal; z and the
    * AUC effect size (U/nA·nB — P(A > B) + ½P(tie)) are one double formula
    * each over exact scalars.
    */
  def mannWhitney(spark: SparkSession, dir: String, segA: String = "BUILDING",
      segB: String = "MACHINERY"): DataFrame = {
    val big = DecimalType(38, 0)
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val c = t(spark, dir, "customer")
      .where(col("c_mktsegment").isin(segA, segB))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val hist = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("yc")
      .agg(sum(when(col("seg") === segA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("seg") === segB, 1L).otherwise(0L)).as("cb"))
    val terms = PrefixScan
      .runningSum(hist, "yc", Seq(col("yc")), "cb", "cb_less",
        exclusive = true)
      .select(
        col("ca"), col("cb"),
        (col("ca").cast(big) * (lit(2).cast(big) * col("cb_less").cast(big) +
          col("cb").cast(big))).as("u2_term"),
        ((col("ca") + col("cb")).cast(big) * (col("ca") + col("cb")).cast(big) *
          (col("ca") + col("cb")).cast(big) -
          (col("ca") + col("cb")).cast(big)).as("tie_term"))
      .agg(sum("ca").as("na"), sum("cb").as("nb"), sum("u2_term").as("u2"),
        sum("tie_term").as("ties"))
    val na = col("na").cast("double")
    val nb = col("nb").cast("double")
    val n = na + nb
    val u = col("u2").cast("double") / 2.0
    val z = (u - na * nb / 2.0) /
      sqrt(na * nb / 12.0 * ((n + 1.0) - col("ties").cast("double") / (n * (n - 1.0))))
    terms.select(col("na").as("n_a"), col("nb").as("n_b"), u.as("u"),
      (floor((z) * lit(1e6) + lit(0.5)) / lit(1e6)).as("z"), (floor((u / (na * nb)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("auc"))
  }

  /** §2.2 #229 — SPEARMAN rank correlation of quantity vs discount per
    * return flag — the monotone-association check (Pearson `q_corr` only
    * sees linear signal; rank ρ survives any monotone transform, the right
    * tool for bounded ordinal-ish columns like discount tiers). Tie-aware:
    * doubled average ranks 2·r̄ = 2·rank_min + tiecount − 1 stay INTEGER
    * (window rank + tie count per group, both partitioned by flag — no
    * global sort), so the five Pearson sums over (2r̄x, 2r̄y) run exact in
    * decimal(38,0); the 2× scaling cancels in ρ. One double formula per
    * bounded group at the end.
    */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    // Ranks come from the VALUE HISTOGRAM, not from row-level windows: the
    // doubled tie-average rank 2r̄ = 2·(#smaller) + tiecount + 1 is a pure
    // function of the per-(flag, value) marginal, so one corpus pass builds
    // the bounded JOINT histogram and every window/join after runs on
    // ≤ |x-domain|·|y-domain| cells per flag — the row-rank formulation
    // sorted whole flag partitions (8× at 10× data, and a 100 TB hazard:
    // one partition per flag).
    val joint = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), col("l_quantity").as("x"),
        col("l_discount").as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    def marginal(v: String, out: String): DataFrame = {
      val wc = Window.partitionBy("flag").orderBy(v)
        .rowsBetween(Window.unboundedPreceding, -1)
      joint.groupBy(col("flag"), col(v)).agg(sum("c").as("cv"))
        .withColumn("cum_less", coalesce(sum("cv").over(wc), lit(0L)))
        .select(col("flag"), col(v),
          (lit(2) * col("cum_less") + col("cv") + 1).cast(big).as(out))
    }
    val s = joint
      .join(marginal("x", "rx"), Seq("flag", "x"))
      .join(marginal("y", "ry"), Seq("flag", "y"))
      .groupBy("flag").agg(sum("c").as("n"),
        sum(col("c").cast(big) * col("rx")).as("sx"),
        sum(col("c").cast(big) * col("ry")).as("sy"),
        sum(col("c").cast(big) * col("rx") * col("ry")).as("sxy"),
        sum(col("c").cast(big) * col("rx") * col("rx")).as("sxx"),
        sum(col("c").cast(big) * col("ry") * col("ry")).as("syy"))
    val nB = col("n").cast(big)
    val num = (nB * col("sxy") - col("sx") * col("sy")).cast("double")
    val d1 = (nB * col("sxx") - col("sx") * col("sx")).cast("double")
    val d2 = (nB * col("syy") - col("sy") * col("sy")).cast("double")
    s.select(col("flag"), col("n"),
      (floor((num / sqrt(d1 * d2)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("rho"))
      .orderBy("flag")
  }

  /** §2.2 #230 — COHORT LTV: customers grouped by first-order month, revenue
    * tracked by months-since-acquisition, cumulative LTV per cohort member —
    * the canonical cohort retention/value curve ("do newer cohorts monetize
    * faster?"). Month indices are pure integers (y·12 + m−1), the cohort
    * assignment is a min-aggregate re-joined on the customer key (shuffle on
    * custkey, then one bounded cohort×offset rollup ≤ |months|² cells), the
    * cumulative sum runs per-cohort (partitioned window over a bounded
    * frame), and revenue stays decimal until the final per-cell LTV
    * division. 100 TB shape: two key-partitioned aggregations + a
    * broadcast-sized grid; no global ordering anywhere.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("midx"),
      col("o_totalprice").cast(dec).as("rev"))
    val first = o.groupBy("o_custkey").agg(min("midx").as("cidx"))
    val sized = first.groupBy("cidx").agg(count(lit(1)).as("cohort_size"))
    val cells = o.join(first, "o_custkey")
      .groupBy(col("cidx"), (col("midx") - col("cidx")).as("month_offset"))
      .agg(countDistinct("o_custkey").as("n_active"), sum("rev").as("rev"))
    val w = Window.partitionBy("cidx").orderBy("month_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sized), "cidx")
      .withColumn("cum", sum("rev").over(w))
      .select(
        format_string("%04d-%02d", (col("cidx") / 12).cast("int"),
          pmod(col("cidx"), lit(12)).cast("int") + 1).as("cohort"),
        col("month_offset"), col("cohort_size"), col("n_active"),
        col("rev").cast("double").as("revenue"),
        // fl6, not round(): the q_ewma sf10 lesson — engine round() tie
        // behavior leaks once the 6-dp grid is below the double's ulp.
        fl6(col("cum").cast("double") / col("cohort_size").cast("double"))
          .as("cum_ltv"))
      .orderBy("cohort", "month_offset")
  }

  /** §2.2 #231 — ABC inventory classification of parts by discounted
    * lineitem revenue: class A holds the parts covering the first 80% of
    * cumulative revenue, B to 95%, C the tail — procurement's
    * Pareto-with-thresholds. The class boundary test is EXACT decimal
    * (5·cum ≤ 4·total and 20·cum ≤ 19·total — integer-scaled comparisons,
    * no float thresholds drifting a part across a class edge), over a
    * running sum ordered by (revenue desc, partkey) that executes as
    * [[PrefixScan.runningSum]]'s chunked distributed scan over the |parts|
    * frame (no one-task unpartitioned window). Output is the 3-row class
    * summary.
    */
  def abcClass(spark: SparkSession, dir: String): DataFrame = {
    val rev6 = DecimalType(28, 6)
    val perPart = t(spark, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(rev6)).as("rev"))
    val tot = perPart.agg(sum("rev").as("total"))
    PrefixScan.runningSum(perPart.withColumn("negrev", -col("rev")),
        "negrev", Seq(col("rev").desc, col("l_partkey")), "rev", "cum")
      .crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when(col("cum") * 5 <= col("total") * 4, "A")
          .when(col("cum") * 20 <= col("total") * 19, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum("rev").as("class_rev"),
        max("total").as("total"))
      .select(col("abc_class"), col("n_parts"),
        col("class_rev").cast("double").as("revenue"),
        (floor((col("class_rev").cast("double") / col("total").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("rev_share"))
      .orderBy("abc_class")
  }

  /** §2.2 #232 — ROLLING 14-day correlation between daily click and view
    * counts — the ops-dashboard "did these two signals decouple?" monitor
    * (a correlation break flags instrumentation loss or a funnel change
    * upstream of volume alarms). Daily counts are integers on the
    * CONTIGUOUS calendar spine (missing days = 0, same spine discipline as
    * #221), the five Pearson sums per window are integer window-sums over a
    * fixed 14-row frame, and each day emits one guarded double division
    * (NULL when either side is constant in the window — no ±inf/NaN
    * cross-engine lottery). Calendar-bounded single-partition window, same
    * justification as #216/#221.
    */
  def rollingCorr(spark: SparkSession, dir: String, winDays: Int = 14)
      : DataFrame = {
    val daily = t(spark, dir, "events")
      .where(col("event_type").isin("click", "view"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("xv"))
    val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
    val spine = bounds.select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val full = spine.join(daily, Seq("day"), "left_outer")
      .withColumn("xc", coalesce(col("xc"), lit(0L)))
      .withColumn("xv", coalesce(col("xv"), lit(0L)))
    val ord = Window.orderBy("day")
    val w = ord.rowsBetween(-(winDays - 1), Window.currentRow)
    val n = lit(winDays.toDouble)
    val num = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val d1 = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val d2 = n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    full
      .withColumn("rn", row_number().over(ord))
      .withColumn("sx", sum("xc").over(w))
      .withColumn("sy", sum("xv").over(w))
      .withColumn("sxy", sum(col("xc") * col("xv")).over(w))
      .withColumn("sxx", sum(col("xc") * col("xc")).over(w))
      .withColumn("syy", sum(col("xv") * col("xv")).over(w))
      .where(col("rn") >= winDays)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("xc").as("clicks"), col("xv").as("views"),
        when(d1 > 0 && d2 > 0, (floor((num / sqrt(d1 * d2)) * lit(1e6) + lit(0.5)) / lit(1e6))).as("roll_corr"))
      .orderBy("day")
  }

  /** §2.2 #236 — IQR (Tukey-fence) outlier census of order value per
    * segment: count of orders beyond [q1 − 1.5·IQR, q3 + 1.5·IQR]. The
    * fences are tested as INTEGER cent comparisons (2x < 2·q1 − 3·IQR,
    * 2x > 2·q3 + 3·IQR — the 1.5 multiplier never exists as a float, so no
    * order can drift across a fence on an ulp), with exact
    * percentile-disc quartiles from the per-segment value histogram (the
    * #211 convention). Scale shape: one histogram aggregation (shuffle ∝
    * distinct prices per segment), windows over the bounded histogram, a
    * broadcast join of 5 quartile rows back to the histogram — the fact
    * table is touched once.
    */
  def outlierIqr(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val h = t(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
      .groupBy("seg", "yc").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("seg").orderBy("yc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("seg")
    val cum = h.select(col("seg"), col("yc"), col("cnt"),
      sum("cnt").over(wCum).as("cum"), sum("cnt").over(wAll).as("n"))
    def q(p: Double, out: String) =
      min(when(col("cum") >= ceil(col("n") * p).cast("long"), col("yc"))).as(out)
    val quart = cum.groupBy("seg")
      .agg(max("n").as("n_orders"), q(0.25, "q1"), q(0.75, "q3"))
    cum.join(broadcast(quart), "seg")
      .withColumn("is_out",
        (col("yc") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3) ||
          (col("yc") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3))
      .groupBy("seg")
      .agg(max("n_orders").as("n_orders"),
        (floor((max(col("q1")).cast("double") / 100.0) * lit(1e2) + lit(0.5)) / lit(1e2)).as("q1"),
        (floor((max(col("q3")).cast("double") / 100.0) * lit(1e2) + lit(0.5)) / lit(1e2)).as("q3"),
        sum(when(col("is_out"), col("cnt")).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_share",
        (floor((col("n_outliers").cast("double") / col("n_orders").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy("seg")
  }

  /** §2.2 #237 — 10% TRIMMED mean of order value per segment vs the plain
    * mean — the robust center that survives the revenue tail (the
    * plain-vs-trimmed gap IS the tail-contamination signal). Trim count
    * k = ⌊n/10⌋ per side by VALUE rank; ties need no tiebreak because
    * dropping any k lowest-by-value rows removes the same value multiset —
    * the trimmed sum is rank-resolution invariant, which is what makes an
    * exact cross-engine oracle possible at all. Cents stay integer until
    * the two final divisions. Per-segment sort (partitioned window, no
    * global ordering); one pass over orders.
    */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val v = t(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val w = Window.partitionBy("seg").orderBy("yc")
    val wAll = Window.partitionBy("seg")
    val kept = col("rn") > col("k") && col("rn") <= col("n") - col("k")
    v.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("k", expr("n div 10"))
      .groupBy("seg")
      .agg(max("n").as("n_orders"), max("k").as("n_trimmed_each_side"),
        sum("yc").as("s_all"),
        sum(when(kept, col("yc")).otherwise(0L)).as("s_trim"),
        sum(when(kept, 1L).otherwise(0L)).as("n_trim"))
      .select(col("seg"), col("n_orders"), col("n_trimmed_each_side"),
        (floor((col("s_all").cast("double") / col("n_orders").cast("double")
          / 100.0) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean"),
        (floor((col("s_trim").cast("double") / col("n_trim").cast("double")
          / 100.0) * lit(1e6) + lit(0.5)) / lit(1e6)).as("trimmed_mean"))
      .orderBy("seg")
  }

  /** §2.2 #241 — WALD-WOLFOWITZ runs test on daily revenue vs its median:
    * is the above/below-median sign sequence random, or does revenue
    * trend/mean-shift (too few runs) or oscillate (too many)? The
    * randomness check that validates i.i.d. assumptions before any of the
    * test-family operators (#214/#227/#228) are trusted. Exact machinery:
    * the median is percentile-disc over the daily-revenue histogram (#211),
    * median-tied days are dropped (classic dichotomization), the run count
    * is 1 + Σ sign-changes via lag over day order, and μ/σ/z are one double
    * formula over the exact (n₁, n₂, R) integers. The day-ordered window is
    * calendar-bounded (single partition over |days| rows — #216); the
    * corpus-sized work is the daily rollup.
    */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(dec)).as("rev"))
    val wCum = Window.orderBy("rev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = daily.groupBy("rev").agg(count(lit(1)).as("cnt"))
      .select(col("rev"), sum("cnt").over(wCum).as("cum"),
        sum("cnt").over(Window.partitionBy()).as("n"))
      .agg(min(when(col("cum") >= ceil(col("n") * 0.5).cast("long"), col("rev")))
        .as("med"))
    val signed = daily.crossJoin(broadcast(med))
      .where(col("rev") =!= col("med"))
      .withColumn("above", (col("rev") > col("med")).cast("int"))
    val wDay = Window.orderBy("day")
    val r = signed
      .withColumn("chg",
        when(lag("above", 1).over(wDay).isNull, 1)
          .when(col("above") =!= lag("above", 1).over(wDay), 1).otherwise(0))
      .agg(sum(when(col("above") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("above") === 0, 1L).otherwise(0L)).as("n2"),
        sum(col("chg").cast("long")).as("runs"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val n = n1 + n2
    val mu = lit(2.0) * n1 * n2 / n + 1.0
    val sig2 = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n) / (n * n * (n - 1.0))
    r.select(col("n1").as("n_above"), col("n2").as("n_below"),
      col("runs").as("n_runs"), (floor((mu) * lit(1e6) + lit(0.5)) / lit(1e6)).as("expected_runs"),
      (floor(((col("runs").cast("double") - mu) / sqrt(sig2)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("z"))
  }

  /** §2.2 #242 — log-log PRICE ELASTICITY per brand: OLS slope of
    * ln(quantity) on ln(unit price) over lineitem — the demand-curve
    * exponent (β < 0 elastic, the marketing-mix primitive #219's linear
    * fit can't express). Determinism discipline for a TRANSFORMED
    * regression: each per-row ln/product is pure IEEE double (identical on
    * any engine), every SUM runs over decimal(28,12)-cast terms so
    * aggregation order can't leak in (the #210 mutual-information
    * precedent), and the slope is one double formula over the five exact
    * sums. One broadcast part join + one partial-aggregated pass to
    * |brands| cells.
    */
  def elasticity(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 12)
    // Two ln() + four double→decimal(28,12) casts per row are the cost
    // here, all map-side on a ≤3-split local scan (2.9 s single job, r15
    // JobProf) — spread the pruned columns first (guide §2.5; no-op at
    // scale, where the fact scan has ≥ slots splits).
    val li = Par.spread(t(spark, dir, "lineitem")
      .where(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .select(col("l_partkey"),
        log(col("l_extendedprice") / col("l_quantity")).as("x"),
        log(col("l_quantity")).as("y")))
    val parts = t(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
    val s = li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"))
    val nD = col("n").cast("double")
    val slope = (nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) /
      (nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    s.select(col("brand"), col("n"), (floor((slope) * lit(1e6) + lit(0.5)) / lit(1e6)).as("elasticity"))
      .orderBy("brand")
  }

  /** §2.2 #245 — THEIL T inequality index of customer revenue per segment:
    * T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ) — the decomposable complement to `q_gini`
    * (Theil splits exactly into between-group + within-group terms, which
    * a segment-level report needs; Gini does not decompose). Determinism:
    * the per-row ratio and ln are pure IEEE doubles over exact cents and
    * the exact segment (n, Σ) scalars, every sum runs over
    * decimal(28,12)-cast terms (#210 discipline), one division at the end.
    * Plan: customer-revenue rollup, a 5-row broadcast of segment totals
    * back onto it, one partial-aggregated pass.
    */
  def theil(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val rev = t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("yc"))
    val totals = rev.groupBy("seg")
      .agg(count(lit(1)).as("n"), sum("yc").as("s"))
    val r = col("yc").cast("double") * col("n").cast("double") /
      col("s").cast("double")
    rev.join(broadcast(totals), "seg")
      .select(col("seg"), col("n"), col("s"),
        (r * log(r)).cast(DecimalType(28, 12)).as("term"))
      .groupBy("seg")
      .agg(max("n").as("n_customers"),
        (floor((max(col("s")).cast("double") / max(col("n")).cast("double")
          / 100.0) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean_revenue"),
        (floor((sum("term").cast("double") / max(col("n")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("theil_t"))
      .orderBy("seg")
  }

  /** §2.2 #246 — MARKOV STEADY-STATE of the event-type transition chain:
    * three unrolled power-iteration rounds of π' = π·P from uniform, where
    * P is the row-normalized transition-count matrix (`q_transition`'s
    * estimator) — where user behavior CONVERGES, vs the transition matrix's
    * one-step view (the #109 sibling). Exactness is the pageRank (#130)
    * recipe: each round's contribution πᵢ·(nᵢⱼ/nᵢ) is deterministic double
    * math, cross-row sums run in DECIMAL(38,18) (order-free), so three
    * rounds stay bit-identical cross-engine. The matrix is |types|² —
    * every frame after the one corpus-sized lead() pass is bounded.
    */
  def markovSteady(spark: SparkSession, dir: String, iters: Int = 3)
      : DataFrame = {
    val dec = DecimalType(38, 18)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead("from_type", 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val rowTot = trans.groupBy("from_type").agg(sum("nij").as("ni"))
    val states = trans.select(col("from_type").as("event_type"))
      .union(trans.select(col("to_type").as("event_type"))).distinct()
      .localCheckpoint(true)
    val n = states.count()
    var pi = states.select(col("event_type"), lit(1.0 / n).as("p"))
    for (_ <- 1 to iters) {
      val contrib = trans.join(rowTot, "from_type")
        .join(pi.withColumnRenamed("event_type", "from_type"), "from_type")
        .select(col("to_type").as("event_type"),
          (col("p") * (col("nij").cast("double") / col("ni").cast("double")))
            .cast(dec).as("c"))
        .groupBy("event_type").agg(sum("c").as("in_p"))
      pi = states.join(contrib, Seq("event_type"), "left_outer")
        .select(col("event_type"),
          coalesce(col("in_p").cast("double"), lit(0.0)).as("p"))
    }
    pi.select(col("event_type"), (floor((col("p")) * lit(1e9) + lit(0.5)) / lit(1e9)).as("pi"))
      .orderBy("event_type")
  }

  /** §2.2 #254 — exponential-DECAY engagement score per user:
    * Σ value · 2^(−⌊age/halflife⌋) — the recency-weighted activity metric
    * behind churn-risk ranking (yesterday's click outweighs last
    * quarter's). Decay is PIECEWISE-DYADIC (the #221 trick generalized):
    * the weight is an exact power of two 2^(40−k), so each term is one
    * decimal × long multiply and the single division by 2⁴⁰ happens once
    * at the end — no float pow drifting with evaluation order. One 1-row
    * anchor broadcast (max event day), one partial-aggregated pass per
    * user.
    */
  def decayEngagement(spark: SparkSession, dir: String, halfLifeDays: Int = 7)
      : DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
    val anchor = ev.agg(max("day").as("d1"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("k",
        least(expr(s"datediff(d1, day) div $halfLifeDays"), lit(40L)))
      .withColumn("term",
        col("value").cast(DecimalType(28, 6)) *
          expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - k AS INT))"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (floor((sum("term").cast("double") / lit(math.pow(2, 40))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"))
      .orderBy("user_id")
  }

  /** §2.2 #255 — SAMPLE-RATIO MISMATCH guardrail for the A/B assignment
    * (#132's mandatory companion): a 1-df chi-square of the observed arm
    * split against the designed 50/50 — an imbalanced split means the
    * bucketing itself is broken and every downstream lift number is
    * garbage. Counts DISTINCT USERS (assignment is per-user; event-level
    * counts would double-weight heavy users), chi² = (n_a−n_b)²/n exact
    * integers to one double division, flag at the 0.05 critical value.
    */
  def abSrm(spark: SparkSession, dir: String): DataFrame = {
    val arms = t(spark, dir, "events")
      .select(col("user_id")).distinct()
      .withColumn("arm",
        when(substring(sha2(col("user_id").cast("string"), 256), 1, 1) <= "7", "A")
          .otherwise("B"))
    val s = arms.agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"))
    val na = col("na").cast("double"); val nb = col("nb").cast("double")
    val chi2 = (na - nb) * (na - nb) / (na + nb)
    s.select(col("na").as("n_a"), col("nb").as("n_b"),
      (floor((chi2) * lit(1e6) + lit(0.5)) / lit(1e6)).as("chi2"), (chi2 > 3.841459).as("srm_detected"))
  }

  /** §2.2 #256 — BLOOM-FILTER false-positive measurement: build a 1024-bit
    * k=3 filter from the even customer keys IN SQL (bit positions = three
    * 8-hex-digit slices of sha256 mod m — engine-portable, no opaque
    * native sketch), probe with the odd keys, and report the MEASURED
    * false-positive rate next to the (bits_set/m)^k prediction — the
    * calibration check before trusting a Bloom-style pre-filter (#110's
    * runtime bloom) on a new key domain. The filter is a ≤m-row DISTINCT
    * frame (broadcast to the probe side); everything else is exact integer
    * counting.
    */
  def bloomFpr(spark: SparkSession, dir: String, mBits: Int = 1024)
      : DataFrame = {
    def pos(h: Int): Column =
      expr(s"CAST(conv(substr(sha2(CAST(c_custkey AS STRING), 256), " +
        s"${1 + 8 * h}, 8), 16, 10) AS BIGINT) % $mBits")
    val keys = t(spark, dir, "customer")
      .select(col("c_custkey") +: (0 until 3).map(h => pos(h).as(s"p$h")): _*)
      .localCheckpoint(true)
    val members = keys.where(col("c_custkey") % 2 === 0)
    val probes = keys.where(col("c_custkey") % 2 === 1)
    val bits = members
      .select(explode(array(col("p0"), col("p1"), col("p2"))).as("bit"))
      .distinct().localCheckpoint(true)
    val falsePos = probes
      .select(col("c_custkey"),
        explode(array(col("p0"), col("p1"), col("p2"))).as("bit"))
      .join(broadcast(bits), "bit")
      .groupBy("c_custkey").agg(count(lit(1)).as("nhit"))
      .where(col("nhit") === 3)
    val s = members.agg(count(lit(1)).as("n_members"))
      .crossJoin(broadcast(probes.agg(count(lit(1)).as("n_probes"))))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("bits_set"))))
      .crossJoin(broadcast(falsePos.agg(count(lit(1)).as("n_false_pos"))))
    val load = col("bits_set").cast("double") / lit(mBits.toDouble)
    s.select(col("n_members"), col("n_probes"), col("bits_set"),
      col("n_false_pos"),
      (floor((col("n_false_pos").cast("double") / col("n_probes").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("fpr"),
      (floor((load * load * load) * lit(1e6) + lit(0.5)) / lit(1e6)).as("expected_fpr"))
  }

  /** §2.2 #260 — WATERMARK RECOMMENDATION from the empirical lateness
    * distribution: exact percentile-disc p50/p95/p99/max of per-event
    * lateness (vs the running max event-time in arrival order — #222's
    * measurement), plus the p99 rounded UP to whole minutes, which is the
    * number a Structured-Streaming author pastes into `withWatermark` —
    * closing the loop from measurement to policy. BOTH global scans run as
    * [[PrefixScan]]'s chunked two-pass pattern: the arrival-order prefix
    * max over raw events, AND the cumulative count over the distinct-µs
    * lateness histogram (µs-resolution lateness is near event cardinality —
    * NOT a bounded value histogram, so it gets the same distributed
    * treatment, not an unpartitioned window). The lateness frame is
    * lazily `localCheckpoint`ed so the histogram pass reuses it instead of
    * re-deriving the prefix max. One row out.
    */
  def watermarkReco(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"))
    val late = PrefixScan
      .runningMax(ev, "event_id", Seq(col("event_id")), "t_us", "run_max")
      .withColumn("late_us", col("run_max") - col("t_us"))
      .select("late_us")
      .localCheckpoint(false)
    val hist = late.groupBy("late_us").agg(count(lit(1)).as("cnt"))
    val cum = PrefixScan
      .runningSum(hist, "late_us", Seq(col("late_us")), "cnt", "cum")
    val tot = hist.agg(sum("cnt").as("n"))
    def q(p: Double, out: String) =
      min(when(col("cum") >= ceil(col("n") * p).cast("long"), col("late_us")))
        .as(out)
    cum.crossJoin(broadcast(tot))
      .agg(max("n").as("n_events"), q(0.5, "p50_us"), q(0.95, "p95_us"),
        q(0.99, "p99_us"), max("late_us").as("max_us"))
      .withColumn("watermark_minutes",
        ceil(col("p99_us").cast("double") / 60000000.0).cast("long"))
  }

  /** §2.2 #261 — MODAL price point per brand (the "price ladder" anchor):
    * the most frequent extended price, ties broken to the LOWEST price —
    * computed with the window-free max-struct argmax (the #120/#123
    * discipline: `max(struct(cnt, −price))` per brand), so no per-brand
    * sort exists anywhere; two partial-aggregated rollups, bounded by
    * |brands| × |distinct prices|.
    */
  def modePrice(spark: SparkSession, dir: String): DataFrame = {
    val cents = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val counts = t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), cents.as("pc"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy("brand")
      .agg(count(lit(1)).as("n_price_points"),
        max(struct(col("cnt"), (-col("pc")).as("npc"))).as("m"))
      .select(col("brand"), col("n_price_points"),
        col("m.cnt").as("mode_count"),
        (floor(((-col("m.npc")).cast("double") / 100.0) * lit(1e2) + lit(0.5)) / lit(1e2)).as("mode_price"))
      .orderBy("brand")
  }

  /** §2.2 #263 — lagged CROSS-CORRELATION between daily click and purchase
    * counts (lags 0-7 days): the argmax lag IS the empirical conversion
    * delay — the calibration number for attribution windows (#128) and
    * stream-stream join bounds (#47), which lag-0 correlation (#232) is
    * blind to. Exact: the calendar spine explodes against the 8-row lag
    * frame, one date-shifted self-equi-join aligns (t−L, t) pairs, and the
    * five Pearson sums per lag are integer aggregates; one guarded double
    * division per lag row.
    */
  def xcorrLags(spark: SparkSession, dir: String, maxLag: Int = 7)
      : DataFrame = {
    import spark.implicits._
    val big = DecimalType(38, 0)
    val daily = t(spark, dir, "events")
      .where(col("event_type").isin("click", "purchase"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("xp"))
    val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
    val spine = bounds.select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val full = spine.join(daily, Seq("day"), "left_outer")
      .withColumn("xc", coalesce(col("xc"), lit(0L)))
      .withColumn("xp", coalesce(col("xp"), lit(0L)))
      .localCheckpoint(true)
    val lags = (0 to maxLag).toDF("lag")
    val pairs = full.select(col("day"), col("xp")).crossJoin(broadcast(lags))
      .join(full.select(col("day").as("pday"), col("xc")),
        expr("pday = date_sub(day, lag)"))
    val s = pairs.groupBy("lag").agg(count(lit(1)).as("n"),
      sum("xc").as("sx"), sum("xp").as("sy"),
      sum(col("xc").cast(big) * col("xp").cast(big)).as("sxy"),
      sum(col("xc").cast(big) * col("xc").cast(big)).as("sxx"),
      sum(col("xp").cast(big) * col("xp").cast(big)).as("syy"))
    val nB = col("n").cast(big)
    val num = (nB * col("sxy") - col("sx").cast(big) * col("sy").cast(big))
      .cast("double")
    val d1 = (nB * col("sxx") - col("sx").cast(big) * col("sx").cast(big))
      .cast("double")
    val d2 = (nB * col("syy") - col("sy").cast(big) * col("sy").cast(big))
      .cast("double")
    s.select(col("lag").cast("long").as("lag"), col("n"),
      when(d1 > 0 && d2 > 0, (floor((num / sqrt(d1 * d2)) * lit(1e6) + lit(0.5)) / lit(1e6))).as("xcorr"))
      .orderBy("lag")
  }

  /** §2.2 #264 — HILL tail-index estimator over the top-100 order values:
    * α̂ = k / Σ ln(xᵢ/x₍ₖ₎) — is revenue's upper tail power-law, and how
    * heavy (α ≤ 2 means variance-free planning numbers are fiction)? The
    * revenue-side sibling of `q_zipf`'s text slope. The order statistics
    * come from one TakeOrderedAndProject (per-partition heaps — no global
    * sort of the fact table, deterministic (value desc, key asc)
    * tie-break), the reference x₍ₖ₎ is their exact min, and the ln terms
    * sum decimal-cast (#210); one division at the end.
    */
  def hillTail(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val dec = DecimalType(28, 12)
    val top = t(spark, dir, "orders")
      .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("yc"), col("o_orderkey"))
      .orderBy(col("yc").desc, col("o_orderkey").asc).limit(k)
      .localCheckpoint(true)
    val ref = top.agg(min("yc").as("ref"))
    top.crossJoin(broadcast(ref))
      .select((log(col("yc").cast("double") / col("ref").cast("double")))
        .cast(dec).as("term"), col("ref"))
      .groupBy()
      .agg(count(lit(1)).as("k"), max("ref").as("ref_cents"),
        sum("term").as("s"))
      .select(col("k"),
        (floor((col("ref_cents").cast("double") / 100.0) * lit(1e2) + lit(0.5)) / lit(1e2)).as("ref_value"),
        // Σ log(y/ref) = 0 when the whole top-k TIES at one value (the
        // sf10 replica corpus does exactly this): the Hill estimator is
        // UNDEFINED on a degenerate tail — emit null, never divide
        // (ANSI division by a zero decimal throws; caught at sf10).
        when(col("s") =!= 0,
          (floor((col("k").cast("double") / col("s").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)))
          .as("hill_alpha"))
  }

  /** §2.2 #265 — EFFECTIVE SAMPLE SIZE under importance weights
    * (customer revenue as the weight column): ESS = (Σw)²/Σw² and the
    * ESS/n ratio — the one-number audit of how much a weighted sample
    * (#107's machinery) actually carries ("n=1M at ESS ratio 0.01 is ten
    * thousand effective customers"). Exact cent sums, Σw² in
    * decimal(38,0), two double divisions at the end, one row.
    */
  def effectiveSample(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val w = t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("w"))
    val s = w.agg(count(lit(1)).as("n"), sum("w").as("sw"),
      sum(col("w").cast(big) * col("w").cast(big)).as("sww"))
    val ess = (col("sw").cast(big) * col("sw").cast(big)).cast("double") /
      col("sww").cast("double")
    s.select(col("n"), (floor((ess) * lit(1e6) + lit(0.5)) / lit(1e6)).as("ess"),
      (floor((ess / col("n").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("ess_ratio"))
  }

  /** §2.2 #268 — discrete re-order HAZARD curve: for each whole-week gap
    * length w, the probability a customer who has gone w weeks since their
    * last order comes back EXACTLY then, h(w) = #(gap = w) / #(gap ≥ w) —
    * the survival-analysis view of `q_order_cadence` that needs NO
    * floating product chain (the Kaplan-Meier estimator's cross-engine
    * hazard: every h(w) is one integer ratio, so an exact oracle exists
    * where the KM product would drift). Gaps come from one per-customer
    * lag window (key-partitioned), the at-risk denominator from a reverse
    * cumulative sum over the bounded week histogram.
    */
  def gapHazard(spark: SparkSession, dir: String, maxWeeks: Int = 12)
      : DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("d")
    val gaps = t(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .withColumn("prev", lag("d", 1).over(w))
      .where(col("prev").isNotNull)
      .select(least(expr("datediff(d, prev) div 7"), lit(maxWeeks.toLong))
        .as("wk"))
    val hist = gaps.groupBy("wk").agg(count(lit(1)).as("n_gaps"))
    val wRisk = Window.orderBy(col("wk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("at_risk", sum("n_gaps").over(wRisk))
      .select(col("wk").as("gap_weeks"), col("n_gaps"), col("at_risk"),
        (floor((col("n_gaps").cast("double") / col("at_risk").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("hazard"))
      .orderBy("gap_weeks")
  }

  /** §2.2 #269 — QUANTITY-WEIGHTED median price per return flag: the
    * median dollar actually moved, not the median line item — a handful
    * of 50-unit lines outweigh many singles, which the unweighted
    * percentile family (#48/#211) can't express. Same exact machinery as
    * #211 with the histogram counting WEIGHT instead of rows: cum weight ≥
    * ⌈total/2⌉ over the (flag, price) frame, integer throughout, one
    * histogram shuffle.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread (r15 A/B: 2.37 → 2.87 s): the histogram groupBy's
    // map-side partial aggregation on the scan beats exchanging the raw
    // rows — spread only pays when per-row map work dominates, not for a
    // plain decimal-cast rollup.
    val hist = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("pc"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
    val wCum = Window.partitionBy("flag").orderBy("pc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("flag")
    hist
      .select(col("flag"), col("pc"), sum("w").over(wCum).as("cum"),
        sum("w").over(wAll).as("tw"))
      .groupBy("flag")
      .agg(max("tw").as("total_weight"),
        (floor((min(when(col("cum") * 2 >= col("tw"), col("pc")))
          .cast("double") / 100.0) * lit(1e2) + lit(0.5)) / lit(1e2)).as("weighted_median_price"))
      .orderBy("flag")
  }

  /** §2.2 #271 — KENDALL τ-b of quantity vs discount per return flag: the
    * concordant-discordant rank statistic with full tie correction — more
    * robust than Spearman (#229) for heavily tied ordinal pairs because it
    * counts PAIR ORIENTATIONS, not rank magnitudes. The naive O(n²) pair
    * scan becomes exact O(|domain|²) arithmetic on the bounded JOINT
    * histogram (#229's trick pushed one level further): concordant/
    * discordant sums are one self-join of the (flag, x, y, n) frame on
    * x₂ > x₁ (≤ (50·11)² cell pairs per flag), tie terms come from the
    * marginals, everything integer decimal until the final τ division.
    */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val joint = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), col("l_quantity").as("x"),
        col("l_discount").as("y"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val cd = joint.as("a")
      .join(joint.as("b"),
        col("a.flag") === col("b.flag") && col("b.x") > col("a.x"))
      .groupBy(col("a.flag").as("flag"))
      .agg(
        sum(when(col("b.y") > col("a.y"),
          col("a.n").cast(big) * col("b.n").cast(big)).otherwise(lit(0).cast(big)))
          .as("c"),
        sum(when(col("b.y") < col("a.y"),
          col("a.n").cast(big) * col("b.n").cast(big)).otherwise(lit(0).cast(big)))
          .as("d"))
    // Doubled tie/pair counts (t(t−1), n(n−1)) keep the algebra in exact
    // integers — τ picks up a compensating factor 2 in the numerator.
    def tieTerm(v: String): DataFrame = joint
      .groupBy("flag", v).agg(sum("n").as("t"))
      .groupBy("flag")
      .agg(sum(col("t").cast(big) * (col("t").cast(big) - 1)).as(s"t2_$v"))
    val totals = joint.groupBy("flag").agg(sum("n").as("nn"))
    val n02 = col("nn").cast(big) * (col("nn").cast(big) - 1)
    cd.join(tieTerm("x"), "flag").join(tieTerm("y"), "flag")
      .join(totals, "flag")
      .select(col("flag"), col("nn").as("n"),
        (floor((lit(2.0) * (col("c") - col("d")).cast("double") /
          sqrt((n02 - col("t2_x")).cast("double") *
            (n02 - col("t2_y")).cast("double"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("tau_b"))
      .orderBy("flag")
  }

  /** §2.2 #272 — PARTIAL correlation of quantity and price CONTROLLING for
    * discount: r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) — does
    * the quantity-price relation survive once the discount channel is
    * removed, the confounder check plain `q_corr` cannot make. All three
    * pairwise correlations come from ONE partial-aggregated pass of exact
    * integer sums (quantity units, price cents, discount millis — every
    * Σ and Σ·Σ in decimal(38,0)); the partial-correlation algebra is a
    * fixed double formula over nine exact scalars per flag.
    */
  def partialCorr(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val li = t(spark, dir, "lineitem").select(
      col("l_returnflag").as("flag"),
      col("l_quantity").cast("long").as("x"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long")
        .as("y"),
      (col("l_discount").cast(DecimalType(8, 3)) * 1000).cast("long").as("z"))
    val s = li.groupBy("flag").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
      sum(col("x").cast(big) * col("y").cast(big)).as("sxy"),
      sum(col("x").cast(big) * col("z").cast(big)).as("sxz"),
      sum(col("y").cast(big) * col("z").cast(big)).as("syz"),
      sum(col("x").cast(big) * col("x").cast(big)).as("sxx"),
      sum(col("y").cast(big) * col("y").cast(big)).as("syy"),
      sum(col("z").cast(big) * col("z").cast(big)).as("szz"))
    val nB = col("n").cast(big)
    def r(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column)
        : Column =
      (nB * sab - sa.cast(big) * sb.cast(big)).cast("double") /
        sqrt((nB * saa - sa.cast(big) * sa.cast(big)).cast("double") *
          (nB * sbb - sb.cast(big) * sb.cast(big)).cast("double"))
    val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
    val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
    val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
    s.select(col("flag"), col("n"), (floor((rxy) * lit(1e6) + lit(0.5)) / lit(1e6)).as("r_xy"),
      (floor(((rxy - rxz * ryz) /
        sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))) * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("r_xy_given_z"))
      .orderBy("flag")
  }

  /** §2.2 #274 — MOOD'S MEDIAN test between two segments: 2×2 chi-square
    * of (above vs at-or-below the POOLED exact median) × segment — the
    * bluntest, most outlier-proof location test (only the sign relative to
    * one exact order statistic matters; #228's rank machinery is overkill
    * when the question is just "do the medians differ"). Pooled median =
    * percentile-disc on the combined cent histogram (#211), the 2×2 counts
    * are one conditional aggregation, χ² = n(ad−bc)²/row·col products —
    * exact integers (decimal — ad·bc wraps long) to one double division.
    */
  def moodMedian(spark: SparkSession, dir: String, segA: String = "BUILDING",
      segB: String = "MACHINERY"): DataFrame = {
    val big = DecimalType(38, 0)
    val v = t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")
        .where(col("c_mktsegment").isin(segA, segB))
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("yc"))
    val vh = v.groupBy("yc").agg(count(lit(1)).as("cnt"))
    val vn = vh.agg(sum("cnt").as("n"))
    val med = PrefixScan.runningSum(vh, "yc", Seq(col("yc")), "cnt", "cum")
      .crossJoin(broadcast(vn))
      .agg(min(when(col("cum") >= ceil(col("n") * 0.5).cast("long"),
        col("yc"))).as("med"))
    val s = v.crossJoin(broadcast(med)).agg(
      sum(when(col("seg") === segA && col("yc") > col("med"), 1L)
        .otherwise(0L)).as("a"),
      sum(when(col("seg") === segA && col("yc") <= col("med"), 1L)
        .otherwise(0L)).as("b"),
      sum(when(col("seg") === segB && col("yc") > col("med"), 1L)
        .otherwise(0L)).as("c"),
      sum(when(col("seg") === segB && col("yc") <= col("med"), 1L)
        .otherwise(0L)).as("d"))
    // χ² in doubles over the exact counts (decimal intermediates of
    // n·(ad−bc)² would wrap 38 digits at extreme n; the double formula is
    // deterministic because both engines state the identical op order).
    val aD = col("a").cast("double"); val bD = col("b").cast("double")
    val cD = col("c").cast("double"); val dD = col("d").cast("double")
    val det = aD * dD - bD * cD
    val chi2 = (aD + bD + cD + dD) * det * det /
      ((aD + bD) * (cD + dD) * (aD + cD) * (bD + dD))
    s.select(col("a").as("n_a_above"), col("b").as("n_a_below"),
      col("c").as("n_b_above"), col("d").as("n_b_below"),
      (floor((chi2) * lit(1e6) + lit(0.5)) / lit(1e6)).as("chi2"))
  }

  /** §2.2 #275 — McNEMAR test of paired click→purchase behavior on
    * USER-DAY units: b = days a user clicked but didn't purchase, c = days
    * they purchased without clicking; χ² = (b−c)²/(b+c) asks whether the
    * two "funnel escape" directions are symmetric — the PAIRED test the
    * independent-sample family (#227/#228/#274) cannot express, because
    * each user-day is its own control (per-USER pairing saturates: at this
    * event density every user eventually does everything). One per-
    * (user, day) boolean rollup (partial-aggregated), four exact counts,
    * one division.
    */
  def mcnemar(spark: SparkSession, dir: String): DataFrame = {
    val perUser = t(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max(when(col("event_type") === "click", 1).otherwise(0))
        .as("clicked"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("purchased"))
    val s = perUser.agg(
      sum(when(col("clicked") === 1 && col("purchased") === 1, 1L)
        .otherwise(0L)).as("n_both"),
      sum(when(col("clicked") === 1 && col("purchased") === 0, 1L)
        .otherwise(0L)).as("b"),
      sum(when(col("clicked") === 0 && col("purchased") === 1, 1L)
        .otherwise(0L)).as("c"),
      sum(when(col("clicked") === 0 && col("purchased") === 0, 1L)
        .otherwise(0L)).as("n_neither"))
    val bD = col("b").cast("double"); val cD = col("c").cast("double")
    s.select(col("n_both"), col("b").as("click_only"),
      col("c").as("purchase_only"), col("n_neither"),
      (floor(((bD - cD) * (bD - cD) / (bD + cD)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("chi2"),
      ((bD - cD) * (bD - cD) / (bD + cD) > 3.841459).as("asymmetric"))
  }

  /** §2.2 #276 — AUTOCORRELATION function of daily revenue at lags 1-14:
    * the full ACF (lag-1 #154 generalized) — the memory signature that
    * picks seasonality periods (#220 assumes weekly; the ACF shows it)
    * and the effective-history horizon for forecasting features. Each
    * lag's Pearson runs over exact cent integers on the calendar spine
    * via one date-shifted self-join against the bounded 14-row lag frame
    * (#263's machinery, self-paired); one guarded division per lag.
    */
  def acf(spark: SparkSession, dir: String, maxLag: Int = 14): DataFrame =
    acfRho(spark, dir, maxLag)
      .select(col("lag"), col("n"), (floor((col("rho")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("acf"))
      .orderBy("lag")

  /** Per-lag autocorrelation frame shared by [[acf]] (which rounds for
    * display) and [[ljungBox]] (which needs the UNROUNDED ρ): lag, pair
    * count n = T − lag, and ρ as the raw double of the fixed-order Pearson
    * formula over exact integer power sums (both engines state the same
    * expression over the same exact integers → identical doubles).
    */
  private def acfRho(spark: SparkSession, dir: String,
      maxLag: Int): DataFrame = {
    import spark.implicits._
    val big = DecimalType(38, 0)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
    val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
    val spine = bounds.select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val full = spine.join(daily, Seq("day"), "left_outer")
      .withColumn("yc", coalesce(col("yc"), lit(0L)))
      .localCheckpoint(true)
    val lags = (1 to maxLag).toDF("lag")
    val pairs = full.select(col("day"), col("yc").as("y1"))
      .crossJoin(broadcast(lags))
      .join(full.select(col("day").as("pday"), col("yc").as("y0")),
        expr("pday = date_sub(day, lag)"))
    val s = pairs.groupBy("lag").agg(count(lit(1)).as("n"),
      sum("y0").as("sx"), sum("y1").as("sy"),
      sum(col("y0").cast(big) * col("y1").cast(big)).as("sxy"),
      sum(col("y0").cast(big) * col("y0").cast(big)).as("sxx"),
      sum(col("y1").cast(big) * col("y1").cast(big)).as("syy"))
    val nB = col("n").cast(big)
    val num = (nB * col("sxy") - col("sx").cast(big) * col("sy").cast(big))
      .cast("double")
    val d1 = (nB * col("sxx") - col("sx").cast(big) * col("sx").cast(big))
      .cast("double")
    val d2 = (nB * col("syy") - col("sy").cast(big) * col("sy").cast(big))
      .cast("double")
    s.select(col("lag").cast("long").as("lag"), col("n"),
      when(d1 > 0 && d2 > 0, num / sqrt(d1 * d2)).as("rho"))
  }

  /** §2.2 #305 — LJUNG–BOX portmanteau white-noise test over the #276 ACF:
    * Q(h) = T(T+2)·Σ_{k=1..h} ρ_k²/(T−k) at h = 7 and h = 14 — the single
    * "is there ANY serial structure" gate a forecasting pipeline runs
    * before trusting residuals, where #276 shows the per-lag picture.
    * ρ_k are the unrounded doubles of the shared [[acfRho]] frame (exact
    * integer power sums underneath), each term ρ²/(T−k) is one
    * deterministic double, and the h-term sum runs in DECIMAL(38,18) so it
    * is order-free; the χ²(h) comparison uses the unrounded statistic
    * against the literal 5% critical value. Cost: the #276 pair frame
    * (calendar-bounded) plus a ≤28-row bounded rollup — nothing new
    * touches the fact table.
    */
  def ljungBox(spark: SparkSession, dir: String,
      horizons: Seq[Int] = Seq(7, 14)): DataFrame = {
    // χ²(df) upper 5% critical values for the supported horizons.
    val crit = Map(7 -> 14.067140, 14 -> 23.684791)
    val rho = acfRho(spark, dir, horizons.max).localCheckpoint(true)
    // Fan each ≤maxLag row out to its horizons by explode — a join-free
    // shape (a 2-row broadcast cross-join would compile to a
    // BroadcastNestedLoopJoin for no benefit on a 14-row frame).
    val critCol = element_at(
      map(horizons.flatMap(h => Seq(lit(h), lit(crit(h)))): _*),
      col("h").cast("int"))
    rho.select(col("lag"), col("n"), col("rho"),
        explode(array(horizons.map(h => lit(h)): _*)).as("h"))
      .where(col("lag") <= col("h"))
      .withColumn("chi2_crit", critCol)
      .groupBy("h", "chi2_crit")
      .agg(max(col("n") + col("lag")).as("t_days"),
        count(col("rho")).as("n_terms"),
        sum((col("rho") * col("rho") / col("n").cast("double"))
          .cast(DecimalType(38, 18))).as("term_sum"))
      .select(col("h").cast("long").as("h"),
        col("t_days"),
        when(col("n_terms") === col("h"),
          fl6(col("t_days").cast("double") *
            (col("t_days").cast("double") + lit(2.0)) *
            col("term_sum").cast("double"))).as("q_stat"),
        when(col("n_terms") === col("h"),
          col("t_days").cast("double") *
            (col("t_days").cast("double") + lit(2.0)) *
            col("term_sum").cast("double") > col("chi2_crit"))
          .as("is_autocorrelated"))
      .orderBy("h")
  }

  /** §2.2 #277 — order LEAD TIME by priority: days from order date to the
    * FIRST line shipment, with exact percentile-disc p50/p95 and the mean
    * per priority class — the SLA evidence ("does URGENT actually ship
    * faster, and by how much at the tail"). First-ship is a min-aggregate
    * per order (no window), lead days are small bounded integers, so the
    * percentiles ride the (priority, days) histogram (#211) and the mean
    * is an exact integer ratio; one orders⋈lineitem join (the Q3/Q18
    * shuffle shape), everything after is histogram-sized.
    */
  def leadTime(spark: SparkSession, dir: String): DataFrame = {
    val firstShip = t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    val lead = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("od"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(col("priority"), datediff(col("first_ship"), col("od"))
        .cast("long").as("days"))
    val hist = lead.groupBy("priority", "days").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("priority").orderBy("days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("priority")
    def q(p: Double, out: String) =
      min(when(col("cum") >= ceil(col("n") * p).cast("long"), col("days")))
        .as(out)
    hist
      .select(col("priority"), col("days"), col("cnt"),
        sum("cnt").over(wCum).as("cum"), sum("cnt").over(wAll).as("n"),
        (col("days") * col("cnt")).as("dc"))
      .groupBy("priority")
      .agg(max("n").as("n_orders"),
        (floor((sum("dc").cast("double") / max("n").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("mean_days"),
        q(0.5, "p50_days"), q(0.95, "p95_days"))
      .orderBy("priority")
  }

  /** §2.2 #248 — maximum DRAWDOWN of cumulative daily revenue: the largest
    * peak-to-trough drop of the running revenue total — finance's risk
    * primitive applied to the business series ("how bad was the worst
    * slump, and when"). EXACT throughout: cumulative revenue and its
    * running max are decimal prefix aggregates over the CALENDAR-bounded
    * daily frame (one-task window, |days| rows — not data-sized), the
    * drawdown per day is a decimal subtraction, and the argmax
    * day is a deterministic (drawdown desc, day asc) top-1 — so peak/trough
    * days can never flip on float noise. One daily rollup, then
    * calendar-bounded windows.
    */
  def drawdown(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(dec)).as("rev"))
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily
      .withColumn("cum", sum("rev").over(wCum))
      .withColumn("peak", max(col("cum")).over(wCum))
      .withColumn("dd", col("peak") - col("cum"))
    dd.orderBy(col("dd").desc, col("day").asc).limit(1)
      .select(date_format(col("day"), "yyyy-MM-dd").as("trough_day"),
        col("peak").cast("double").as("peak_cum_revenue"),
        col("cum").cast("double").as("trough_cum_revenue"),
        col("dd").cast("double").as("max_drawdown"),
        (floor((col("dd").cast("double") / col("peak").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("drawdown_share"))
  }

  /** §2.2 #249 — rolling 28-day Z-SCORE anomalies of daily revenue: each
    * day scored against its own trailing window's mean/std — the
    * local-context anomaly detector (complements the global-MAD #125 and
    * the single-changepoint #215: a drifting series re-centers the window,
    * so only LOCAL breaks alarm). Exact machinery: integer cent sums and
    * sum-of-squares per fixed 28-row frame (Σx² in decimal(38,0) — cents²
    * wraps long), z's numerator n·x−Σx stays integer, one guarded double
    * division per day (NULL for a constant window). Calendar spine +
    * calendar-bounded window (#216/#232 discipline).
    */
  def rollingZ(spark: SparkSession, dir: String, winDays: Int = 28)
      : DataFrame = {
    val big = DecimalType(38, 0)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
    val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
    val spine = bounds.select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val full = spine.join(daily, Seq("day"), "left_outer")
      .withColumn("yc", coalesce(col("yc"), lit(0L)))
    val ord = Window.orderBy("day")
    val w = ord.rowsBetween(-(winDays - 1), Window.currentRow)
    val n = lit(winDays.toDouble)
    // sample variance of the window, cents²; numerator exact decimal
    val varNum = (lit(winDays).cast(big) * col("sq") -
      col("sx").cast(big) * col("sx").cast(big)).cast("double")
    val sd = sqrt(varNum / (n * (n - 1.0)))
    val z = (col("yc").cast("double") - col("sx").cast("double") / n) / sd
    full
      .withColumn("rn", row_number().over(ord))
      .withColumn("sx", sum("yc").over(w))
      .withColumn("sq", sum(col("yc").cast(big) * col("yc").cast(big)).over(w))
      .where(col("rn") >= winDays)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        (floor((col("yc").cast("double") / 100.0) * lit(1e2) + lit(0.5)) / lit(1e2)).as("revenue"),
        when(varNum > 0, (floor((z) * lit(1e6) + lit(0.5)) / lit(1e6))).as("z"),
        (varNum > 0 && abs(z) > 2.0).as("is_anomaly"))
      .orderBy("day")
  }

  /** ENGINE-STABLE display rounding to 6 decimals: floor(x·1e6 + 0.5)/1e6.
    * Unlike round(DOUBLE, 6) — whose tie handling differs between Spark
    * (shortest-decimal BigDecimal) and DuckDB versions (binary-value
    * rounding) and produced the r7 q_cov_matrix driver-only mismatch — the
    * multiply, add, and floor are all exact/correctly-rounded IEEE ops on
    * an engine-identical double, so the result is bit-identical in every
    * engine and version. New operators use this; the oracle side spells
    * the same floor(x * 1e6 + 0.5) / 1e6.
    */
  private def fl6(c: Column): Column = Fl6(c)

  /** §2.2 #280 — HIGHER MOMENTS per order priority: mean, standard
    * deviation, skewness, excess kurtosis, and the Jarque–Bera normality
    * statistic of order value — the distribution-shape profile behind
    * "is revenue per order normal enough for the t-test family
    * (#227/#218), or do we need the rank tests (#228/#281)?". ONE
    * distributed pass: the four RAW POWER SUMS Σc, Σc², Σc³, Σc⁴ of
    * integer cents accumulate exactly in DECIMAL(38,0) (map-side partial
    * agg, order-free; c⁴ ≈ 1e31 per row and ~1e37 summed stays inside 38
    * digits at sf1), central moments and the shape statistics are one
    * fixed-order double formula per bounded group at the end. No row-level
    * float work at all.
    */
  def moments(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val c = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast("long").as("c")
    val s = t(spark, dir, "orders")
      .select(col("o_orderpriority").as("priority"), c)
      .groupBy("priority")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(big)).as("s1"),
        sum(col("c").cast(big) * col("c")).as("s2"),
        sum(col("c").cast(big) * col("c") * col("c")).as("s3"),
        sum(col("c").cast(big) * col("c") * col("c") * col("c")).as("s4"))
    val n = col("n").cast("double")
    val m1 = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n - m1 * m1
    val m3 = col("s3").cast("double") / n - lit(3.0) * m1 *
      (col("s2").cast("double") / n) + lit(2.0) * m1 * m1 * m1
    val m4 = col("s4").cast("double") / n - lit(4.0) * m1 *
      (col("s3").cast("double") / n) + lit(6.0) * m1 * m1 *
      (col("s2").cast("double") / n) - lit(3.0) * m1 * m1 * m1 * m1
    val skew = m3 / (m2 * sqrt(m2))
    val kurt = m4 / (m2 * m2) - lit(3.0)
    s.select(col("priority"), col("n"),
        fl6(m1 / lit(100.0)).as("mean"),
        fl6(sqrt(m2) / lit(100.0)).as("sd"),
        fl6(skew).as("skewness"),
        fl6(kurt).as("kurtosis_excess"),
        fl6(n / lit(6.0) * (skew * skew + kurt * kurt / lit(4.0)))
          .as("jarque_bera"))
      .orderBy("priority")
  }

  /** §2.2 #281 — KRUSKAL–WALLIS H test of order value across ALL market
    * segments: the k-group generalization of Mann-Whitney #228 ("does ANY
    * segment's order-value distribution differ?" — the gate before
    * pairwise tests). Same 100 TB-safe rank machinery as #228/#229: ranks
    * never touch rows — the (price, segment) JOINT HISTOGRAM gives doubled
    * tie-midranks 2r̄(v) = 2·cum_less(v) + t(v) + 1 from one window over
    * DISTINCT prices (bounded by the price domain, not the fact table),
    * doubled rank sums 2R_g accumulate exactly in decimal, and H plus its
    * tie correction are one double formula over k+1 exact scalars. Each
    * group's Σ(2R)²/(4n) term is exact-integer-numerator (decimal square,
    * then one cast+divide), so H is bit-identical cross-engine.
    */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val cst = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val joint = o.join(broadcast(cst), col("o_custkey") === col("c_custkey"))
      .groupBy("yc", "seg").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // Checkpointed: perValue feeds BOTH the per-group rank join and the
    // tie-correction aggregate below — lazily it re-ran the whole
    // PrefixScan (3 passes over the histogram) once per consumer (r15
    // JobProf: two of the query's three 2-3 s jobs were the same scan
    // subtree twice). ≤|distinct yc| rows.
    val perValue = PrefixScan.runningSum(
        joint.groupBy("yc").agg(sum("cnt").as("tv")),
        "yc", Seq(col("yc")), "tv", "cum_less", exclusive = true)
      .select(col("yc"),
        (lit(2) * col("cum_less") + col("tv") + 1).cast(big).as("r2"),
        (col("tv").cast(big) * col("tv") * col("tv") - col("tv")).as("tie"))
      .localCheckpoint(true)
    val perGroup = joint.join(perValue.select("yc", "r2"), "yc")
      .groupBy("seg")
      .agg(sum("cnt").as("ng"), sum(col("cnt").cast(big) * col("r2")).as("r2sum"))
      .select(col("seg"), col("ng"),
        // (2R_g)²/(4n_g): the square stays exact in decimal, ONE division
        ((col("r2sum") * col("r2sum")).cast("double") /
          (lit(4.0) * col("ng").cast("double"))).as("term"))
    val dec12 = DecimalType(38, 12)
    val s = perGroup.agg(sum("ng").as("n"), count(lit(1)).as("k"),
      sum(col("term").cast(dec12)).cast("double").as("terms"))
      .crossJoin(broadcast(
        perValue.agg(sum("tie").as("ties"))))
    val n = col("n").cast("double")
    val h = lit(12.0) / (n * (n + lit(1.0))) * col("terms") -
      lit(3.0) * (n + lit(1.0))
    val corr = lit(1.0) -
      col("ties").cast("double") / (n * n * n - n)
    s.select(col("n"), col("k").as("k_groups"),
        fl6(h).as("h"), fl6(h / corr).as("h_tie_corrected"),
        (col("k") - 1).as("df"))
  }

  /** §2.2 #282 — KAPLAN–MEIER reorder survival: the right-censored
    * survival curve of "days until a customer's NEXT order" — gaps between
    * consecutive orders are observed events, each customer's tail (last
    * order → end of the data window) is a CENSORED observation, which the
    * naive gap histogram (#268's hazard) silently drops; KM is the
    * standard estimator that uses it. The day domain is calendar-bounded,
    * so after one orders-shuffle (lag per customer) everything runs on the
    * (day → events, censored) histogram: risk sets are reverse-cumulative
    * integer sums, each factor ln((n−d)/n) is one IEEE op on an exact
    * rational, the log-survival accumulates in decimal, and S(t) = exp(·)
    * — per-day exact counts ride along so the curve is auditable.
    */
  def kmSurvival(spark: SparkSession, dir: String): DataFrame = {
    val wC = Window.partitionBy("o_custkey").orderBy("d")
    val orders = t(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
    val horizon = orders.agg(max("d").as("hz"))
    val nxt = orders
      .withColumn("nextd", lead("d", 1).over(wC))
      .crossJoin(broadcast(horizon))
      .select(
        when(col("nextd").isNotNull, datediff(col("nextd"), col("d")))
          .otherwise(datediff(col("hz"), col("d"))).cast("long").as("day"),
        col("nextd").isNotNull.as("observed"))
    val hist = nxt.groupBy("day")
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d_events"),
        sum(when(col("observed"), 0L).otherwise(1L)).as("c_censored"))
    val wPrev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("d_events") + col("c_censored")).as("n_total"))
    val dec12 = DecimalType(38, 12)
    hist.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") -
          coalesce(sum(col("d_events") + col("c_censored")).over(wPrev), lit(0L)))
      // If some day the whole risk set dies (n_risk == d_events), ln(0)
      // would poison the decimal sum — survival is exactly 0 from there on.
      .withColumn("lnterm",
        when(col("d_events") > 0 && col("n_risk") > col("d_events"),
          log((col("n_risk") - col("d_events")).cast("double") /
            col("n_risk").cast("double"))).otherwise(lit(0.0)))
      .withColumn("died_out",
        when(col("d_events") > 0 && col("n_risk") === col("d_events"), 1)
          .otherwise(0))
      .withColumn("survival",
        when(max("died_out").over(wCum) === 1, lit(0.0))
          .otherwise(exp(sum(col("lnterm").cast(dec12)).over(wCum)
            .cast("double"))))
      .where(col("d_events") > 0)
      .select(col("day").as("gap_days"), col("n_risk"), col("d_events"),
        col("c_censored"), fl6(col("survival")).as("survival"))
      .orderBy("gap_days")
  }

  /** §2.2 #283 — THEIL–SEN robust trend of daily revenue: the median slope
    * over ALL day pairs — one wild day moves OLS (#218) arbitrarily but
    * moves a median-of-slopes not at all (29% breakdown point), the right
    * trend estimate for spiky revenue. The fact table collapses to the
    * bounded daily frame FIRST (one shuffle); the O(|days|²) pair frame
    * (~265k pairs at 2 years — calendar-bounded, it does NOT grow with the
    * corpus) carries exact integer (Δcents, Δdays) pairs, the median is
    * the deterministic lower order statistic via row_number over
    * (slope, i, j) — slope compares as one IEEE division of exact ints —
    * and the intercept is the follow-up median of rev − slope·idx.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
      .withColumn("idx", row_number().over(Window.orderBy("day")).cast("long"))
      .localCheckpoint(true)
    // Pair generation is a BNLJ that EXPANDS ~n²/2 rows out of the bounded
    // daily frame: stream the left side at full width (explicit-count
    // round-robin — AQE would coalesce the 1-partition checkpoint read and
    // serialize the expansion, r15 measured 2.6 s in one task) against the
    // broadcast right side. Broadcast is safe at any corpus size: the
    // frame is calendar-bounded.
    // The daily frame is CALENDAR-BOUNDED (one row per day — thousands of
    // rows at any corpus size), so it joins the repo's accepted bounded-
    // collect class (≤k centroid sets, per-table manifests): pull it to
    // the driver ONCE and ship the yc series as a broadcast array literal.
    // Pair work stays fully distributed — `spark.range` over i is
    // splittable, each task explodes its own j-range and reads yc by
    // index, so generation is pure parallel map work with NO join and NO
    // shuffle (the pre-r15 BNLJ shape paid ~1 s per pass just building
    // 3.3M joined rows at sf0.1, and its single-task row_number median
    // paid another 3.6 s).
    val dRows = daily.select("idx", "yc").collect()
    val nDays = dRows.length
    val yc = new Array[Long](nDays + 1)
    dRows.foreach(r => yc(r.getLong(0).toInt) = r.getLong(1))
    val ycLit = typedlit(yc.toSeq)
    val nPairs = nDays.toLong * (nDays - 1) / 2
    def genPairs: DataFrame = spark.range(1L, nDays.toLong)
      .select(col("id").cast("long").as("i"),
        explode(sequence(col("id") + 1, lit(nDays.toLong))).as("j"))
      .select(col("i"), col("j"),
        ((element_at(ycLit, col("j").cast("int") + 1) -
          element_at(ycLit, col("i").cast("int") + 1)).cast("double") /
          (col("j") - col("i")).cast("double")).as("slope"))
    // The median is a SELECTION, not a sort: nothing pair-sized is ever
    // sorted, shuffled, or stored. Two refinement levels of a monotone
    // value-range histogram (map-side partial agg; the only shuffle is
    // ≤nb rows) narrow rank ⌊(m+1)/2⌋ to a sliver of the slope range —
    // one level degenerates when the distribution spikes (r15 measured a
    // 1M-row median bucket = a 23 MB single-task sort); the second level
    // divides the spike by nb² — then only that sliver's rows pay a sort.
    val nb = 1024
    // Exact a-priori slope bounds from the daily series (|Δidx| ≥ 1):
    // every slope lies in [minYc−maxYc, maxYc−minYc] — no bounds pass.
    val mn0 = (yc.slice(1, nDays + 1).min - yc.slice(1, nDays + 1).max).toDouble
    val w0 = math.max((-mn0 - mn0) / nb, java.lang.Double.MIN_NORMAL)
    // Monotone, clamp-consistent bucket id: equal slopes share a bucket
    // and bucket id is non-decreasing in slope, so bucket-cumulative
    // counts embed the global (slope, i, j) order. Membership below is
    // always tested with THIS function (never a range predicate, whose
    // top-edge semantics differ from the clamp).
    def bucketOf(s: Column, lo: Column, w: Column): Column =
      least(lit(nb - 1L), greatest(lit(0L), floor((s - lo) / w)))
    // Level 1: histogram all pairs into nb buckets, pick the bucket
    // holding global rank ⌊(m+1)/2⌋ and the residual in-bucket rank.
    val t1 = lit((nPairs + 1) / 2)
    val l1 = genPairs
      .groupBy(bucketOf(col("slope"), lit(mn0), lit(w0)).as("bk1"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("bk1") // ≤ nb rows
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum") >= t1 && col("cum") - col("c") < t1)
      .select(col("bk1"), (t1 - (col("cum") - col("c"))).as("rk1"),
        (lit(mn0) + col("bk1") * lit(w0)).as("lo1"),
        greatest(lit(w0 / nb), lit(java.lang.Double.MIN_NORMAL)).as("w1"))
      .localCheckpoint(true) // 1 row
    // Level 2: sub-bucket ONLY the selected bucket's rows (spiky slope
    // distributions put ~1/3 of all pairs in one level-1 bucket — r15
    // measured a 23 MB single-task sort without this level; w1 = w0/nb²
    // divides the spike again).
    val l2 = genPairs.crossJoin(broadcast(l1))
      .where(bucketOf(col("slope"), lit(mn0), lit(w0)) === col("bk1"))
      .groupBy(col("bk1"), col("rk1"), col("lo1"), col("w1"),
        bucketOf(col("slope"), col("lo1"), col("w1")).as("bk2"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("bk2") // ≤ nb rows
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum") >= col("rk1") && col("cum") - col("c") < col("rk1"))
      .select(col("bk1"), col("lo1"), col("w1"), col("bk2"),
        (col("rk1") - (col("cum") - col("c"))).as("rk2"))
      .localCheckpoint(true) // 1 row
    val slope = genPairs.crossJoin(broadcast(l2))
      .where(bucketOf(col("slope"), lit(mn0), lit(w0)) === col("bk1") &&
        bucketOf(col("slope"), col("lo1"), col("w1")) === col("bk2"))
      .withColumn("rn", row_number().over( // one sliver: ~m/nb² rows
        Window.orderBy(col("slope"), col("i"), col("j"))))
      .where(col("rn") === col("rk2"))
      .select(lit(nPairs).as("n_pairs"), col("slope"))
    val wI = Window.orderBy(col("resid"), col("idx"))
    val nd = daily.agg(count(lit(1)).as("n_days"))
    daily.crossJoin(broadcast(slope))
      .select(col("n_pairs"), col("slope"),
        (col("yc").cast("double") - col("slope") * col("idx").cast("double"))
          .as("resid"), col("idx"))
      .withColumn("rn", row_number().over(wI))
      .crossJoin(broadcast(nd))
      .where(col("rn") === floor((col("n_days") + lit(1)) / lit(2)))
      .select(col("n_days"), col("n_pairs"),
        fl6(col("slope") / lit(100.0)).as("slope_per_day"),
        fl6(col("resid") / lit(100.0)).as("intercept"))
  }

  /** §2.2 #314 — MANN–KENDALL trend TEST on daily revenue: S = Σ_{i<j}
    * sign(y_j − y_i) over all day pairs, tie-corrected variance
    * var(S) = [n(n−1)(2n+5) − Σ_k t_k(t_k−1)(2t_k+5)]/18, and the
    * continuity-corrected z — the hypothesis-test companion to Theil–Sen
    * #283 (same pair frame; #283 estimates the slope, this says whether a
    * monotone trend EXISTS at 5%). S and both variance terms are exact
    * integers (BIGINT sign sum, tie counts from the value histogram), so
    * the only floats are one division by 18 and the final z — fixed-order,
    * engine-identical. The O(|days|²) pair frame is calendar-bounded (does
    * not grow with the corpus), the tie histogram is value-bounded.
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
      .localCheckpoint(true)
    // Same expansion shape as Theil–Sen's pair frame: stream left at full
    // width (explicit count — AQE would coalesce the tiny checkpoint read
    // to one task and serialize the n²/2 sign evaluations), broadcast the
    // calendar-bounded right side; the sign sum partial-aggregates map-side.
    val s = daily.repartition(spark.sparkContext.defaultParallelism).as("a")
      .join(broadcast(daily).as("b"), col("a.day") < col("b.day"))
      .agg(sum(signum(col("b.yc") - col("a.yc")).cast("long")).as("s_stat"))
    val ties = daily.groupBy("yc").agg(count(lit(1)).as("tk"))
      .agg(coalesce(sum(col("tk") * (col("tk") - 1) * (lit(2) * col("tk") + 5)),
        lit(0L)).as("tie_term"))
    val n = daily.agg(count(lit(1)).as("n_days"))
    val varNum = col("n_days") * (col("n_days") - 1) *
      (lit(2) * col("n_days") + 5) - col("tie_term")
    val varS = varNum.cast("double") / lit(18.0)
    val sD = col("s_stat").cast("double")
    val z = when(col("s_stat") > 0, (sD - lit(1.0)) / sqrt(varS))
      .when(col("s_stat") < 0, (sD + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    n.crossJoin(s).crossJoin(ties)
      .select(col("n_days"), col("s_stat"),
        fl6(varS).as("var_s"), fl6(z).as("z_stat"),
        when(z > 1.959964, lit("increasing"))
          .when(z < -1.959964, lit("decreasing"))
          .otherwise(lit("no trend")).as("trend"))
  }

  /** §2.2 #315 — DIFFERENCE-IN-DIFFERENCES readout: arms by the #132 sha
    * rule × pre/post periods at the #312 calendar midpoint, cell means
    * from exact DECIMAL sums, DiD = (B_post − B_pre) − (A_post − A_pre),
    * its standard error √(Σ s²_g/n_g) over the four cells, and z — the
    * quasi-experimental estimate when assignment isn't random (and, on a
    * hash split, the parallel-trends sanity check that a healthy
    * experiment's DiD ≈ its post-period difference). ONE fused scan:
    * per-cell count/Σ/Σx² as conditional aggregates (no join anywhere —
    * the four cells are columns, not rows), then fixed-order double
    * formulas. The single 1-row midpoint frame rides the #312 broadcast.
    */
  def did(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("value"), to_date(col("ts")).as("day"))
    val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
      .select(expr("date_add(mn, CAST(floor(datediff(mx, mn) / 2) AS INT))")
        .as("bound"))
    val cells = ev.crossJoin(broadcast(bounds))
      .withColumn("arm",
        when(substring(sha2(col("user_id").cast("string"), 256), 1, 1) <= "7",
          lit("A")).otherwise(lit("B")))
      .withColumn("post", col("day") >= col("bound"))
    def cell(a: String, p: Boolean, out: String): Seq[Column] = {
      val in = col("arm") === a && col("post") === p
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$out"),
        sum(when(in, col("value").cast(dec))).as(s"s_$out"),
        sum(when(in, (col("value") * col("value")).cast(dec))).as(s"q_$out"))
    }
    val aggs = cell("A", false, "a0") ++ cell("A", true, "a1") ++
      cell("B", false, "b0") ++ cell("B", true, "b1")
    val s = cells.agg(aggs.head, aggs.tail: _*)
    def m(g: String) = col(s"s_$g").cast("double") / col(s"n_$g").cast("double")
    def v(g: String) =
      col(s"q_$g").cast("double") / col(s"n_$g").cast("double") - m(g) * m(g)
    val didV = (m("b1") - m("b0")) - (m("a1") - m("a0"))
    val se = sqrt(v("a0") / col("n_a0").cast("double") +
      v("a1") / col("n_a1").cast("double") +
      v("b0") / col("n_b0").cast("double") +
      v("b1") / col("n_b1").cast("double"))
    s.select(col("n_a0"), col("n_a1"), col("n_b0"), col("n_b1"),
      fl6(didV).as("did"), fl6(se).as("se"), fl6(didV / se).as("z_stat"))
  }

  /** Exact per-segment power sums of order value in cents — (n, Σx, Σx²)
    * per market segment — the shared base frame of [[anova]] (raw values)
    * and the F formula both it and [[levene]] (median-centered values)
    * apply. One broadcast join + one map-side-combined aggregate; the
    * output is a ≤5-row frame however large the fact table is.
    */
  private def segPowerSums(values: DataFrame): DataFrame = {
    val big = DecimalType(38, 0)
    values.groupBy("seg")
      .agg(count(lit(1)).as("ng"), sum("yc").as("sg"),
        sum(col("yc").cast(big) * col("yc").cast(big)).as("qg"))
  }

  /** One-way F statistic from a (seg, ng, sg, qg) power-sum frame:
    * SSB = Σ_g S_g²/n_g − S²/N and SSW = Q − Σ_g S_g²/n_g, each group's
    * S_g²/n_g one deterministic double formula over exact integers,
    * decimal(38,12)-summed order-free (#210 discipline); F and η² are one
    * fixed-order double expression over the resulting scalars.
    */
  private def fFromPowerSums(pg: DataFrame, statName: String): DataFrame = {
    val dec12 = DecimalType(38, 12)
    val s = pg
      .select(col("ng"), col("sg"), col("qg"),
        ((col("sg").cast("double") * col("sg").cast("double")) /
          col("ng").cast("double")).as("term"))
      .agg(sum("ng").as("n"), count(lit(1)).as("k"),
        sum("sg").as("s"), sum("qg").as("q"),
        sum(col("term").cast(dec12)).cast("double").as("terms"))
    val n = col("n").cast("double")
    val grand = (col("s").cast("double") * col("s").cast("double")) / n
    val ssb = col("terms") - grand
    val ssw = col("q").cast("double") - col("terms")
    val f = (ssb / (col("k") - 1).cast("double")) /
      (ssw / (n - col("k").cast("double")))
    s.select(col("n"), col("k").as("k_groups"),
      (col("k") - 1).as("df_between"),
      (col("n") - col("k")).as("df_within"),
      fl6(f).as(statName),
      fl6(ssb / (ssb + ssw)).as("eta_sq"))
  }

  /** §2.2 #291 — one-way ANOVA of order value across ALL market segments:
    * the parametric k-group complement to Kruskal–Wallis (#281 asks "do the
    * rank distributions differ"; this asks "do the MEANS differ" and yields
    * the η² effect size a report wants next to the p-value). Everything
    * reduces to the ≤5-row per-segment (n, Σx, Σx²) frame — one broadcast
    * dim join + one partial-aggregated pass over the fact table, zero
    * row-level sorts — so the 100 TB cost is exactly one scan.
    */
  def anova(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val cst = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val joint = o.join(broadcast(cst), col("o_custkey") === col("c_custkey"))
      .select("seg", "yc")
    fFromPowerSums(segPowerSums(joint), "f_stat")
  }

  /** §2.2 #398 — ONE-WAY INTRACLASS CORRELATION ICC(1,1) of customer
    * balance grouped by nation: the share of total variance attributable
    * to the GROUPING — the reliability/clustering number behind "are
    * ratings from the same annotator (or rows from the same shard/source)
    * exchangeable", and the design-effect input that says how much a
    * cluster-sampled estimate really n-counts. Unequal group sizes use
    * the standard k0 = (N − Σn_g²/N)/(G−1) correction;
    * ICC = (MSB − MSW)/(MSB + (k0 − 1)·MSW) from [[anova]]'s exact
    * power-sum frame — the fact table is scanned once, everything after
    * is a ≤|nations|-row reduction (per-group S_g²/n_g doubles
    * decimal-summed order-free, then one fixed-order double expression).
    */
  def icc(spark: SparkSession, dir: String): DataFrame = {
    val dec12 = DecimalType(38, 12)
    val big = DecimalType(38, 0)
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("grp"),
      (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast("long").as("yc"))
    val pg = c.groupBy("grp")
      .agg(count(lit(1)).as("ng"), sum("yc").as("sg"),
        sum(col("yc").cast(big) * col("yc").cast(big)).as("qg"))
    val s = pg
      .select(col("ng"), col("sg"), col("qg"),
        ((col("sg").cast("double") * col("sg").cast("double")) /
          col("ng").cast("double")).as("term"))
      .agg(sum("ng").as("n"), count(lit(1)).as("k"),
        sum("sg").as("s"), sum("qg").as("q"),
        sum(col("ng") * col("ng")).as("sn2"),
        sum(col("term").cast(dec12)).cast("double").as("terms"))
    val n = col("n").cast("double")
    val k = col("k").cast("double")
    val grand = (col("s").cast("double") * col("s").cast("double")) / n
    val msb = (col("terms") - grand) / (k - 1.0)
    val msw = (col("q").cast("double") - col("terms")) / (n - k)
    val k0 = (n - col("sn2").cast("double") / n) / (k - 1.0)
    s.select(col("n"), col("k").as("k_groups"),
      fl6(k0).as("k0"),
      fl6((msb - msw) / (msb + (k0 - 1.0) * msw)).as("icc"))
  }

  /** §2.2 #399 — SPLIT-CONFORMAL PREDICTION intervals, Mondrian
    * (per-segment) form: orders hash-split (sha256(o_orderkey), the #46
    * seedless convention) into train/calibration/test; the "model" is the
    * train-split segment mean, the nonconformity is |y − ŷ|, and q̂ is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual — the
    * distribution-free interval with guaranteed ≥1−α coverage that a
    * model-scored 100 TB filter should ship instead of a point estimate.
    * Coverage is then MEASURED on the held-out test split per segment —
    * the empirical check of the conformal guarantee.
    *
    * Exactness end to end: with ŷ_seg = S_g/n_g, the residual order
    * statistic runs on the INTEGER |y·n_g − S_g| (monotone-equivalent,
    * cents·count — no double ever enters the ranking), q̂ via the
    * histogram-cumulative trick (the #280 discipline: the sort touches
    * distinct residual values, never fact rows), and the ceil-rank is
    * integer arithmetic. Work: one scan to split+join, two bounded
    * aggregations.
    */
  def conformal(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val cst = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val h = substring(sha2(col("o_orderkey").cast("string"), 256), 1, 1)
    val j = o.join(broadcast(cst), col("o_custkey") === col("c_custkey"))
      .select(col("seg"), col("yc"), h.as("h"))
      .localCheckpoint(true)
    val tr = j.where(col("h") <= "7").groupBy("seg")
      .agg(count(lit(1)).as("ng"), sum("yc").as("sg"))
    val cal = j.where(col("h") > "7" && col("h") <= "b")
      .join(broadcast(tr), "seg")
      .select(col("seg"), abs(col("yc") * col("ng") - col("sg")).as("r2"))
    val wCum = Window.partitionBy("seg").orderBy("r2")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSeg = Window.partitionBy("seg")
    val q = cal.groupBy("seg", "r2").agg(count(lit(1)).as("cnt"))
      .select(col("seg"), col("r2"), sum("cnt").over(wCum).as("cum"),
        sum("cnt").over(wSeg).as("ncal"))
      .groupBy("seg")
      .agg(max("ncal").as("n_cal"),
        min(when(col("cum") >=
          expr("CAST((ncal + 1) * 9 + 9 AS BIGINT) DIV 10"), col("r2")))
          .as("qhat"))
    val tst = j.where(col("h") > "b").join(broadcast(tr), "seg")
      .select(col("seg"), abs(col("yc") * col("ng") - col("sg")).as("r2"))
    val cov = tst.join(broadcast(q.select("seg", "qhat")), "seg")
      .groupBy("seg")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r2") <= col("qhat"), 1L).otherwise(0L)).as("covered"))
    q.join(tr, "seg").join(cov, "seg")
      .select(col("seg"), col("ng").as("n_train"), col("n_cal"), col("n_test"),
        fl6(col("qhat").cast("double") /
          (col("ng").cast("double") * 100.0)).as("qhat_dollars"),
        fl6(col("covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"),
        lit(0.9).as("target"))
      .orderBy("seg")
  }

  /** §2.2 #292 — BROWN–FORSYTHE (median-centered Levene) test of variance
    * homogeneity across market segments: the assumption check behind #291's
    * F (and Welch's whole reason to exist) — are the group SPREADS equal?
    * Robust form: z = |x − median_g|, then the one-way F on z. Group
    * medians come from the per-(segment, price) HISTOGRAM (cumulative
    * counts over distinct cent values — the #280 trick: the global sort
    * touches |segments × distinct prices| histogram rows, never the fact
    * table), broadcast back as a ≤5-row frame; z is exact integer cents,
    * so the F inherits [[anova]]'s exact power-sum path unchanged.
    */
  def levene(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val cst = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val joint = o.join(broadcast(cst), col("o_custkey") === col("c_custkey"))
      .select("seg", "yc")
    val hist = joint.groupBy("seg", "yc").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("seg").orderBy("yc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSeg = Window.partitionBy("seg")
    // Lower median: the smallest value whose cumulative count reaches
    // ⌈n_g/2⌉ (the q_mood_median convention).
    val med = hist
      .select(col("seg"), col("yc"), sum("cnt").over(wCum).as("cum"),
        sum("cnt").over(wSeg).as("n"))
      .groupBy("seg")
      .agg(min(when(col("cum") >= ceil(col("n") * 0.5).cast("long"),
        col("yc"))).as("med"))
    val centered = joint.join(broadcast(med), "seg")
      .select(col("seg"), abs(col("yc") - col("med")).as("yc"))
    fFromPowerSums(segPowerSums(centered), "w_stat")
  }

  /** §2.2 #301 — TUKEY HSD post-hoc q statistics: after #291's ANOVA says
    * "some mean differs", this says WHICH — for every segment pair,
    * q = |m_i − m_j| / √(MSW/2 · (1/n_i + 1/n_j)) (the studentized-range
    * statistic on the unequal-n Tukey–Kramer form), plus the raw mean
    * difference in dollars. Everything derives from the SAME ≤5-row
    * power-sum frame the ANOVA reduces to — MSW from decimal-summed
    * per-group SSW terms, then a bounded ≤10-row pair self-join of exact
    * scalars; the fact table is scanned exactly once.
    */
  def tukey(spark: SparkSession, dir: String): DataFrame = {
    val dec12 = DecimalType(38, 12)
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val cst = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val pg = segPowerSums(
      o.join(broadcast(cst), col("o_custkey") === col("c_custkey"))
        .select("seg", "yc"))
      .localCheckpoint(true)
    val msw = pg
      .select(col("ng"),
        (col("qg").cast("double") -
          (col("sg").cast("double") * col("sg").cast("double")) /
            col("ng").cast("double")).as("sswg"))
      .agg(sum("ng").as("n"), count(lit(1)).as("k"),
        sum(col("sswg").cast(dec12)).cast("double").as("ssw"))
      .select((col("ssw") / (col("n") - col("k")).cast("double")).as("msw"))
    val a = pg.select(col("seg").as("seg_a"), col("ng").as("na"),
      (col("sg").cast("double") / col("ng").cast("double")).as("ma"))
    val b = pg.select(col("seg").as("seg_b"), col("ng").as("nb"),
      (col("sg").cast("double") / col("ng").cast("double")).as("mb"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .crossJoin(broadcast(msw))
      .select(col("seg_a"), col("seg_b"),
        fl6(abs(col("ma") - col("mb")) / lit(100.0)).as("mean_diff"),
        fl6(abs(col("ma") - col("mb")) /
          sqrt(col("msw") / lit(2.0) *
            (lit(1.0) / col("na").cast("double") +
             lit(1.0) / col("nb").cast("double")))).as("q_stat"))
      .orderBy("seg_a", "seg_b")
  }

  /** §2.2 #311 — PAGE–HINKLEY sequential drift test on daily revenue: the
    * classic online changepoint monitor — m_t = Σ_{s≤t}(x_s − x̄_s − δ)
    * with x̄_s the RUNNING mean, M_t = min_{s≤t} m_s, alarm statistic
    * PH = max_t (m_t − M_t) and the day it peaks. The online sibling of
    * CUSUM #216 (fixed reference mean) and binary-segmentation #293
    * (offline, one split): PH is what a monitoring job computes
    * incrementally as days arrive. Exactness: prefix sums S_s are exact
    * cent integers; each running mean S_s/s is one deterministic double,
    * accumulated in DECIMAL(38,18) so the prefix sum of means is
    * order-free; m_t is a fixed-order double expression; running min and
    * the (ph, earliest-day) arg-max are deterministic. Cost: one map-side
    * rollup to the |days| frame, then calendar-bounded windows.
    */
  def pageHinkley(spark: SparkSession, dir: String, delta: Double = 0.0,
      lambdaDollars: Double = 50000.0): DataFrame = {
    val dec18 = DecimalType(38, 18)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
    val wOrd = Window.orderBy("day")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = daily.select(col("day"),
      row_number().over(wOrd).as("t"),
      sum("yc").over(wCum).as("s"))
    val means = pre.select(col("day"), col("t"), col("s"),
      (col("s").cast("double") / col("t").cast("double")).cast(dec18)
        .as("mean_dec"))
    // m_t = s − Σmean − t·δ subtracts two ~equal cumulative sums; in
    // doubles the cancellation amplifies 1-ulp decimal→double conversion
    // noise past the 6-dp floor boundary (caught by the sf10 numeric
    // probe: s ~ 1e15 cents, noise ~0.125, ph_stat hashed differently).
    // Subtract in EXACT DECIMAL(38,18) on both engines, convert once.
    val m = means.select(col("day"), col("t"), col("s"),
      (col("s").cast(dec18) - sum("mean_dec").over(wCum) -
        (col("t").cast("double") * lit(delta)).cast(dec18)).as("m_t"))
    val ph = m.select(col("day"), col("t"),
      (col("m_t") - min("m_t").over(wCum)).as("ph"))
    ph.agg(max(struct(col("ph"), (-col("t")).as("nt"), col("day"))).as("b"),
        count(lit(1)).as("n_days"))
      .select(col("n_days"),
        date_format(col("b.day"), "yyyy-MM-dd").as("alarm_day"),
        fl6(col("b.ph").cast("double") / lit(100.0)).as("ph_stat"),
        (col("b.ph").cast("double") / lit(100.0) > lambdaDollars).as("is_drift"))
  }

  /** §2.2 #312 — CUPED variance-reduced A/B readout (Deng et al. 2013):
    * per user, the pre-period value sum X (covariate) and experiment-period
    * value sum Y; θ = cov(X,Y)/var(X) pooled across users, the adjusted
    * metric Y′ = Y − θ(X − X̄), and the report: variance-reduction share
    * ρ² = cov²/(var_X·var_Y), the raw arm difference, and the adjusted arm
    * difference diff_adj = diff_Y − θ·diff_X — the industry-standard trick
    * that makes #132's z-test detect effects 1/(1−ρ²)× smaller at the same
    * traffic. Period split at the calendar midpoint (re-ingestion-stable),
    * arms by the #132 sha rule; users present in BOTH periods enter. One
    * shuffle by user (exact DECIMAL period sums), then one power-sum
    * rollup (per-user cross terms decimal-summed order-free), θ/ρ²/diffs
    * fixed-order doubles with var(X) = 0 NULL-guarded.
    */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val dec12 = DecimalType(38, 12)
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("value"), to_date(col("ts")).as("day"))
    val bounds = ev.agg(min("day").as("mn"), max("day").as("mx"))
      .select(expr("date_add(mn, CAST(floor(datediff(mx, mn) / 2) AS INT))")
        .as("bound"))
    val users = ev.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(sum(when(col("day") < col("bound"), col("value").cast(dec)))
          .as("x"),
        sum(when(col("day") >= col("bound"), col("value").cast(dec)))
          .as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .withColumn("arm",
        when(substring(sha2(col("user_id").cast("string"), 256), 1, 1) <= "7",
          lit("A")).otherwise(lit("B")))
    val xd = col("x").cast("double"); val yd = col("y").cast("double")
    val s = users.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((xd * yd).cast(dec12)).as("sxy"),
      sum((xd * xd).cast(dec12)).as("sxx"),
      sum((yd * yd).cast(dec12)).as("syy"),
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("x"))).as("sxa"),
      sum(when(col("arm") === "A", col("y"))).as("sya"),
      sum(when(col("arm") === "B", col("x"))).as("sxb"),
      sum(when(col("arm") === "B", col("y"))).as("syb"))
    val nD = col("n").cast("double")
    val mx = col("sx").cast("double") / nD
    val my = col("sy").cast("double") / nD
    val vx = col("sxx").cast("double") / nD - mx * mx
    val vy = col("syy").cast("double") / nD - my * my
    val cxy = col("sxy").cast("double") / nD - mx * my
    val naD = col("n_a").cast("double")
    val nbD = (col("n") - col("n_a")).cast("double")
    val diffX = col("sxb").cast("double") / nbD - col("sxa").cast("double") / naD
    val diffY = col("syb").cast("double") / nbD - col("sya").cast("double") / naD
    val theta = when(vx > 0.0, cxy / vx)
    val rho2 = when(vx > 0.0 && vy > 0.0, cxy * cxy / (vx * vy))
    s.select(col("n").as("n_users"), col("n_a"),
      fl6(theta).as("theta"), fl6(rho2).as("var_reduction"),
      fl6(diffY).as("diff_raw"),
      fl6(diffY - theta * diffX).as("diff_adj"))
  }

  /** §2.2 #323 — NAIVE-FORECAST BACKTEST: last-value (lag-1) and
    * seasonal-naive (lag-7) predictions of daily revenue scored with
    * MAE / RMSE / MAPE over the final 28 days — the baseline every real
    * forecast must beat (and the honest yardstick: if a model doesn't
    * beat seasonal-naive, the #220 weekly cycle is all it learned). The
    * fact table collapses to the zero-filled calendar spine; lags are one
    * ordered window over the bounded frame; errors are exact cent
    * integers, squared errors exact DECIMAL(38,0) sums, MAPE's per-day
    * ratios DECIMAL(38,18)-summed order-free, finals fixed-order doubles.
    */
  def backtestNaive(spark: SparkSession, dir: String,
      testDays: Int = 28): DataFrame = {
    val big = DecimalType(38, 0)
    val dec18 = DecimalType(38, 18)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
    val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
    val spine = bounds
      .select(explode(sequence(col("mn"), col("mx"))).as("day"), col("mx"))
    val full = spine.join(daily, Seq("day"), "left_outer")
      .withColumn("yc", coalesce(col("yc"), lit(0L)))
    val wOrd = Window.orderBy("day")
    val lagged = full
      .withColumn("p1", lag("yc", 1).over(wOrd))
      .withColumn("p7", lag("yc", 7).over(wOrd))
      .where(col("day") > date_sub(col("mx"), testDays))
      .localCheckpoint(true)
    def score(pred: Column, name: String): DataFrame = {
      val e = abs(col("yc") - pred)
      lagged.where(pred.isNotNull)
        .select(col("yc"), e.as("e"))
        .agg(count(lit(1)).as("n_days"),
          sum("e").as("sae"),
          sum((col("e").cast(big) * col("e").cast(big))).as("sse"),
          sum(when(col("yc") > 0,
            (col("e").cast("double") / col("yc").cast("double")).cast(dec18)))
            .as("sape"),
          sum(when(col("yc") > 0, 1L).otherwise(0L)).as("n_pos"))
        .select(lit(name).as("method"), col("n_days"),
          fl6(col("sae").cast("double") / col("n_days").cast("double") /
            lit(100.0)).as("mae"),
          fl6(sqrt(col("sse").cast("double") / col("n_days").cast("double")) /
            lit(100.0)).as("rmse"),
          fl6(when(col("n_pos") > 0,
            col("sape").cast("double") / col("n_pos").cast("double")))
            .as("mape"))
    }
    score(col("p1"), "naive_1").unionByName(score(col("p7"), "seasonal_7"))
      .orderBy("method")
  }

  /** §2.2 #324 — SEASONAL VARIANCE DECOMPOSITION of daily revenue: trend =
    * centered 7-day moving average, seasonal = day-of-week means of the
    * detrended series, residual = what's left — and the variance share of
    * each. Where #220 ASSUMES the weekly cycle and reports its profile,
    * this measures how much of the series the cycle + trend actually
    * explain (R² = 1 − var(resid)/var(total)) — the one-row answer to "is
    * this series forecastable structure or noise". Interior days only
    * (full 7-day windows); day-of-week via epoch-day mod 7 (identical in
    * both engines, no locale); every mean/variance from DECIMAL-summed
    * fixed-order doubles over exact cents.
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val dec18 = DecimalType(38, 18)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
    val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
    val spine = bounds.select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val full = spine.join(daily, Seq("day"), "left_outer")
      .withColumn("yc", coalesce(col("yc"), lit(0L)))
    val wMa = Window.orderBy("day").rowsBetween(-3, 3)
    val interior = full
      .withColumn("wn", count(lit(1)).over(wMa))
      .withColumn("trend", sum("yc").over(wMa).cast("double") / lit(7.0))
      .where(col("wn") === 7)
      .withColumn("detr", col("yc").cast("double") - col("trend"))
      .withColumn("dow",
        pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)))
      .localCheckpoint(true)
    val seas = interior.groupBy("dow")
      .agg((sum(col("detr").cast(dec18)).cast("double") /
        count(lit(1)).cast("double")).as("s"))
    val joined = interior.join(broadcast(seas), "dow")
      .withColumn("resid", col("detr") - col("s"))
    // Squared terms ride DECIMAL(38,12): cents² at 10× data would graze
    // (38,18)'s 10²⁰ integer headroom; 12 fractional digits buys 10²⁶.
    val dec12 = DecimalType(38, 12)
    def meanVar(c: Column, nm: String): Seq[Column] = Seq(
      (sum(c.cast(dec18)).cast("double") / count(lit(1)).cast("double"))
        .as(s"m_$nm"),
      (sum((c * c).cast(dec12)).cast("double") / count(lit(1)).cast("double"))
        .as(s"q_$nm"))
    val aggs = meanVar(col("yc").cast("double"), "y") ++
      meanVar(col("trend"), "t") ++ meanVar(col("s"), "s") ++
      meanVar(col("resid"), "e") :+ count(lit(1)).as("n_days")
    val agg = joined.agg(aggs.head, aggs.tail: _*)
    def v(nm: String) = col(s"q_$nm") - col(s"m_$nm") * col(s"m_$nm")
    // var_total in dollars² grows quadratically with daily revenue —
    // past ~9e12 Spark's floor-to-LONG saturates (the cronbachAlpha
    // class, caught by the sf10 probe): identity above the cap, where a
    // 6-dp round is below the double's own ulp anyway.
    def fl6cap(c: Column): Column = when(c < lit(9e12), fl6(c)).otherwise(c)
    agg.select(col("n_days"),
      fl6cap(v("y") / lit(1e4)).as("var_total"),
      fl6(v("t") / v("y")).as("share_trend"),
      fl6(v("s") / v("y")).as("share_seasonal"),
      fl6(v("e") / v("y")).as("share_residual"),
      fl6(lit(1.0) - v("e") / v("y")).as("r2"))
  }

  /** §2.2 #325 — monthly PRICE INDEX by the three classical formulas:
    * Laspeyres (base-month quantity weights), Paasche (current-month
    * weights), Fisher (their geometric mean) — unit prices from exact
    * decimal Σrevenue/Σquantity per (month, part), each index a weighted
    * sum of per-part unit prices over parts present in BOTH months
    * (matched-sample, the statistical-agency convention). The "is revenue
    * growth price or volume" decomposition (#178 shows growth; this says
    * which kind). One lineitem rollup to the (month, part) frame, the
    * base month broadcast back, products DECIMAL(38,12)-summed.
    */
  def priceIndex(spark: SparkSession, dir: String): DataFrame = {
    val dec12 = DecimalType(38, 12)
    // NOT spread (r15 A/B: 2.28 → 2.28): the (month, part) cell count is
    // close to the row count, so the map-side partial agg already carries
    // most of the work and a pre-exchange buys nothing.
    val mp = t(spark, dir, "lineitem")
      .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM").as("month"),
        col("l_partkey").as("part"))
      .agg(sum((col("l_quantity").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("qty_c"),
        sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("rev_c"))
      .withColumn("u", col("rev_c").cast("double") / col("qty_c").cast("double"))
      .localCheckpoint(true)
    val base = mp.agg(min("month").as("m0"))
    val baseP = mp.join(broadcast(base), col("month") === col("m0"))
      .select(col("part"), col("u").as("u0"), col("qty_c").as("q0"))
    val cur = mp.join(broadcast(base), col("month") =!= col("m0"))
      .select(col("month"), col("part"), col("u"), col("qty_c"))
    cur.join(baseP, "part")
      .groupBy("month")
      .agg(count(lit(1)).as("n_parts"),
        sum((col("u") * col("q0").cast("double")).cast(dec12)).as("l_num"),
        sum((col("u0") * col("q0").cast("double")).cast(dec12)).as("l_den"),
        sum((col("u") * col("qty_c").cast("double")).cast(dec12)).as("p_num"),
        sum((col("u0") * col("qty_c").cast("double")).cast(dec12)).as("p_den"))
      .select(col("month"), col("n_parts"),
        fl6(col("l_num").cast("double") / col("l_den").cast("double"))
          .as("laspeyres"),
        fl6(col("p_num").cast("double") / col("p_den").cast("double"))
          .as("paasche"),
        fl6(sqrt((col("l_num").cast("double") / col("l_den").cast("double")) *
          (col("p_num").cast("double") / col("p_den").cast("double"))))
          .as("fisher"))
      .orderBy("month")
  }

  /** §2.2 #293 — best single CHANGEPOINT of the daily-revenue series by
    * SSE reduction (binary segmentation, first split): the day that
    * maximizes the drop from the series' total squared error to
    * SSE(left) + SSE(right) — the "did the level SHIFT, and when" detector
    * next to CUSUM #262 (which accumulates drift but names no split) and
    * Theil–Sen #283 (monotone trend, not a step). The fact table collapses
    * to the CALENDAR-bounded daily frame first; prefix power sums make
    * every candidate split one O(1) double formula over exact integers
    * (T−1 candidates for T days — no pair frame at all), and the argmin is
    * a deterministic (sse, day) struct-min. 100 TB cost: one map-side
    * combined aggregate to |days| rows, then driver-scale arithmetic.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val daily = t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
    val wCum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(count(lit(1)).as("tn"), sum("yc").as("ts"),
      sum(col("yc").cast(big) * col("yc").cast(big)).as("tq"))
    val pre = daily
      .select(col("d"), row_number().over(Window.orderBy("d")).as("i"),
        sum("yc").over(wCum).as("cs"),
        sum(col("yc").cast(big) * col("yc").cast(big)).over(wCum).as("cq"))
      .crossJoin(broadcast(tot))
      .where(col("i") < col("tn"))
    def sseOf(q: Column, s: Column, n: Column): Column =
      q.cast("double") -
        (s.cast("double") * s.cast("double")) / n.cast("double")
    val nl = col("i").cast("double")
    val nr = (col("tn") - col("i")).cast("double")
    val sse = sseOf(col("cq"), col("cs"), col("i")) +
      sseOf(col("tq") - col("cq"), col("ts") - col("cs"), col("tn") - col("i"))
    val scored = pre.select(col("d"), col("tn"), col("ts"), col("tq"),
      col("cs"), col("i"), sse.as("sse"),
      (col("cs").cast("double") / nl / 100.0).as("ml"),
      ((col("ts") - col("cs")).cast("double") / nr / 100.0).as("mr"))
    val best = scored
      .agg(max(struct((-col("sse")).as("nsse"), (-col("i")).as("ni"),
        col("d"), col("ml"), col("mr"), col("tn"), col("ts"), col("tq")))
        .as("b"))
      .select(col("b.d").as("split_day"), col("b.tn").as("n_days"),
        (-col("b.nsse")).as("sse_split"), col("b.ml").as("ml"),
        col("b.mr").as("mr"), col("b.ts").as("ts"), col("b.tq").as("tq"))
    val sseTotal = sseOf(col("tq"), col("ts"), col("n_days"))
    best.select(
      date_format(col("split_day"), "yyyy-MM-dd").as("split_day"),
      col("n_days"),
      fl6(col("ml")).as("mean_before"), fl6(col("mr")).as("mean_after"),
      fl6(lit(1.0) - col("sse_split") / sseTotal).as("sse_reduction"))
  }

  /** The shared CALENDAR-bounded daily-revenue frame (day, yc cents):
    * one map-side-combined aggregate collapses the fact table to ≤|days|
    * rows, after which unpartitioned day-ordered windows are bounded by
    * the calendar span, not the data size (the house allowlist rule).
    */
  private def dailyCents(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))

  /** §2.2 #329 — CRAMÉR'S V association between market segment and order
    * status: the χ² of the r×c contingency table normalized to [0,1] so
    * association strength is comparable across table shapes (χ² alone
    * grows with n — #224 flags significance, this says EFFECT SIZE).
    * One broadcast-joined fact pass collapses to the ≤r·c cell frame;
    * margins come from re-aggregating the cells (never a second fact
    * scan); each cell's (o−e)²/e is one fixed-order double formula over
    * exact integer counts, decimal-summed.
    */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val cells = t(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val rowsT = cells.groupBy("seg").agg(sum("nij").as("nr"))
    val colsT = cells.groupBy("st").agg(sum("nij").as("nc"))
    val tot = cells.agg(sum("nij").as("n"),
      countDistinct("seg").as("r"), countDistinct("st").as("c"))
    val e = (col("nr") * col("nc")).cast("double") / col("n").cast("double")
    val term = (col("nij").cast("double") - e) * (col("nij").cast("double") - e) / e
    cells.join(broadcast(rowsT), "seg").join(broadcast(colsT), "st")
      .crossJoin(broadcast(tot))
      .agg(max("n").as("n_total"), max("r").as("n_segs"), max("c").as("n_stats"),
        sum(term.cast(DecimalType(38, 12))).as("chi2d"))
      .select(col("n_total"), col("n_segs"), col("n_stats"),
        fl6(col("chi2d").cast("double")).as("chi2"),
        fl6(sqrt(col("chi2d").cast("double") /
          (col("n_total") * least(col("n_segs") - 1, col("n_stats") - 1))
            .cast("double"))).as("cramers_v"))
  }

  /** §2.2 #330 — WILCOXON SIGNED-RANK test of first-vs-last order value
    * per customer (paired, distribution-free): did repeat customers'
    * spend SHIFT, without assuming normality (the paired companion to
    * the two-sample #228). Pairs are exact cents (first/last picked by a
    * user-partitioned window — no averaging, no division), zeros dropped
    * per the classic procedure, and |d| ranks come from
    * [[PrefixScan.rowNumber]]'s distributed rank with average-rank tie
    * folding ((min+max)/2 per distinct |d|, exact at .5 granularity) —
    * no customer-dimension-sized single-task window. Normal
    * approximation with the tie-corrected variance.
    */
  def wilcoxonSigned(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("pc"))
      .select(col("o_custkey"), col("pc"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("o_custkey")).as("cnt"))
    val pairs = o.where(col("cnt") >= 2 &&
        (col("rn") === 1 || col("rn") === col("cnt")))
      .groupBy("o_custkey")
      .agg((max(when(col("rn") === col("cnt"), col("pc"))) -
        max(when(col("rn") === 1, col("pc")))).as("d"))
      .where(col("d") =!= 0)
      .select(col("o_custkey"), col("d"), abs(col("d")).as("absd"))
    val rn = PrefixScan.rowNumber(pairs, "absd",
      Seq(col("absd"), col("o_custkey")), "gr")
    val ranked = rn.groupBy("absd")
      .agg(min("gr").as("lo"), max("gr").as("hi"), count(lit(1)).as("tk"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("npos"))
      .select(col("absd"), col("tk"), col("npos"),
        ((col("lo") + col("hi")).cast("double") / 2.0).as("avg_rank"))
    val s = ranked.agg(
      sum("tk").as("n"),
      sum((col("avg_rank") * col("npos").cast("double"))
        .cast(DecimalType(38, 1))).as("wp"),
      sum(col("tk") * col("tk") * col("tk") - col("tk")).as("ties"))
    val nD = col("n").cast("double")
    val mu = nD * (nD + 1.0) / 4.0
    val sig = sqrt(nD * (nD + 1.0) * (lit(2.0) * nD + 1.0) / 24.0 -
      col("ties").cast("double") / 48.0)
    s.select(col("n").as("n_pairs"), col("wp").cast("double").as("w_plus"),
      fl6(mu).as("mu"), fl6(sig).as("sigma"),
      fl6((col("wp").cast("double") - mu) / sig).as("z_stat"))
  }

  /** OLS of daily revenue (cents) on the day offset from 1995-01-01:
    * (n, Σx, Σy, slope, intercept) from exact integer power sums — the
    * shared fit of [[durbinWatson]] and [[cooksDistance]]. 1-row frame.
    */
  private def dailyFit(daily: DataFrame): DataFrame = {
    val big = DecimalType(38, 0)
    // x·yc per row fits a long at any SF (x is a day offset), and so do
    // the power sums — but the normal-equation cross products n·Σxy and
    // Σx·Σy reach ~1e19 already at sf0.1, so THEY are decimal. The
    // denominator only involves calendar-sized terms (days, day offsets).
    val s = daily
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("x"),
        col("yc"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("yc").as("sy"),
        sum((col("x") * col("yc")).cast(big)).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    s.select(col("n"), col("sx"), col("sy"), col("sxx"),
      ((col("n").cast(big) * col("sxy") - col("sx").cast(big) * col("sy").cast(big))
        .cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("slope_c"))
      .withColumn("icept_c",
        (col("sy").cast("double") - col("slope_c") * col("sx").cast("double")) /
          col("n").cast("double"))
  }

  /** §2.2 #331 — DURBIN–WATSON autocorrelation test on the daily-revenue
    * OLS residuals: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² ≈ 2(1−ρ₁) — "are the
    * regression's errors serially correlated" (if yes, #218's reported
    * fit is overconfident and a time-series model is warranted; the
    * residual-side companion to #154's raw-series ACF). Fit and
    * residuals from exact integer power sums; the lag-1 frame is the
    * CALENDAR-bounded daily series.
    */
  def durbinWatson(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(spark, dir).localCheckpoint(true)
    val res = daily.crossJoin(broadcast(dailyFit(daily)))
      .select(col("day"), col("n"),
        (col("yc").cast("double") -
          (col("icept_c") + col("slope_c") *
            datediff(col("day"), lit("1995-01-01")).cast("double")))
          .as("e"))
    val lagW = Window.orderBy("day") // calendar-bounded daily frame
    val d = res.withColumn("de", col("e") - lag("e", 1).over(lagW))
    d.agg(max("n").as("n_days"),
        sum((col("e") * col("e")).cast(DecimalType(38, 6))).as("sse"),
        sum((col("de") * col("de")).cast(DecimalType(38, 6))).as("ssd"))
      .select(col("n_days"),
        fl6(col("ssd").cast("double") / col("sse").cast("double")).as("dw_stat"),
        fl6(lit(1.0) - col("ssd").cast("double") /
          col("sse").cast("double") / 2.0).as("rho_lag1"))
  }

  /** §2.2 #332 — GRUBBS outlier statistic for the daily-revenue series:
    * G = max|y−ȳ|/s and the day achieving it — the single-most-extreme-
    * day detector (vs #125's per-group MAD flags and #236's IQR fences:
    * Grubbs names THE candidate and its sigma distance). Mean/sd from
    * one exact power-sum row; the argmax is a deterministic struct-max
    * (ties break to the later day on both engines).
    */
  def grubbs(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val daily = dailyCents(spark, dir).localCheckpoint(true)
    val s = daily.agg(count(lit(1)).as("n"), sum("yc").as("sy"),
      sum(col("yc").cast(big) * col("yc").cast(big)).as("qy"))
    val nD = col("n").cast("double")
    val mean = col("sy").cast("double") / nD
    // Exact-integer radicand (the bollinger discipline): n·Σx²−(Σx)²
    // subtracted before any double conversion.
    val sd = sqrt((col("n").cast(big) * col("qy") -
      col("sy").cast(big) * col("sy").cast(big)).cast("double") /
      (nD * (nD - 1.0)))
    val scored = daily.crossJoin(broadcast(s))
      .select(col("day"), col("n"),
        (mean / 100.0).as("m"), (sd / 100.0).as("sdev"),
        abs(col("yc").cast("double") - mean).as("adev"))
    scored.agg(max(struct(col("adev"), col("day"), col("m"), col("sdev"),
        col("n"))).as("b"))
      .select(col("b.n").as("n_days"), fl6(col("b.m")).as("mean_rev"),
        fl6(col("b.sdev")).as("sd_rev"),
        fl6(col("b.adev") / (col("b.sdev") * 100.0)).as("g_stat"),
        date_format(col("b.day"), "yyyy-MM-dd").as("top_day"))
  }

  /** §2.2 #333 — COOK'S DISTANCE influence diagnostics for the daily
    * OLS: Dᵢ = eᵢ²hᵢ / (p·s²·(1−hᵢ)²) with leverage
    * hᵢ = 1/n + (xᵢ−x̄)²/Sxx — which days SINGLE-HANDEDLY steer the trend
    * fit (#218 reports the fit, #332 the biggest outlier; Cook's D finds
    * points that are outlier AND high-leverage). All inputs are exact
    * power sums; top-10 via TakeOrderedAndProject, never a global sort.
    */
  def cooksDistance(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(spark, dir).localCheckpoint(true)
    val fit = dailyFit(daily)
    val res = daily.crossJoin(broadcast(fit))
      .select(col("day"), col("yc"), col("n"), col("sx"), col("sxx"),
        datediff(col("day"), lit("1995-01-01")).cast("double").as("x"),
        (col("yc").cast("double") -
          (col("icept_c") + col("slope_c") *
            datediff(col("day"), lit("1995-01-01")).cast("double")))
          .as("e"))
    val sse = res.agg(sum((col("e") * col("e")).cast(DecimalType(38, 6)))
      .as("sse"))
    val nD = col("n").cast("double")
    val xbar = col("sx").cast("double") / nD
    val sxxC = col("sxx").cast("double") - xbar * xbar * nD
    val h = lit(1.0) / nD + (col("x") - xbar) * (col("x") - xbar) / sxxC
    val s2 = col("sse").cast("double") / (nD - 2.0)
    val dcook = col("e") * col("e") * h / (lit(2.0) * s2 * (lit(1.0) - h) * (lit(1.0) - h))
    res.crossJoin(broadcast(sse))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        (col("yc").cast("double") / 100.0).as("revenue"),
        fl6(h).as("leverage"), fl6(col("e") / 100.0).as("resid"),
        fl6(dcook).as("cooks_d"))
      .orderBy(col("cooks_d").desc, col("day")).limit(10)
  }

  /** §2.2 #334 — 1-D WASSERSTEIN (earth-mover) distance between the
    * order-value distributions of two market segments: ∫|F_A−F_B| dv —
    * the "how far apart, in dollars" companion to #214's KS (max gap:
    * sensitive to one crossing; W₁ integrates ALL mass displacement).
    * Same value-histogram frame as KS: both CDFs in ONE
    * [[PrefixScan.runningSums]] pass over distinct prices, the
    * next-value gap by an equi-join on the scan's own row number, and
    * every term |cumA·n_B − cumB·n_A|·gap EXACT integer arithmetic
    * (decimal-summed) down to one final division.
    */
  def wasserstein(spark: SparkSession, dir: String, segA: String = "BUILDING",
      segB: String = "MACHINERY"): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val v = t(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin(segA, segB))
      .select(col("c_mktsegment").as("seg"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("vc"))
    val h = v.groupBy("vc").agg(
      sum(when(col("seg") === segA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("seg") === segB, 1L).otherwise(0L)).as("cb"))
      .withColumn("__one", lit(1L))
    val scanned = PrefixScan.runningSums(h, "vc", Seq(col("vc")),
      Seq("ca" -> "cuma", "cb" -> "cumb", "__one" -> "rn"))
      .select("vc", "cuma", "cumb", "rn").localCheckpoint(true)
    val totals = scanned.agg(max("cuma").as("na"), max("cumb").as("nb"))
    val nxt = scanned.select((col("rn") - 1).as("rn"), col("vc").as("vnext"))
    // The cross products cumA·n_B / cumB·n_A reach ~9e18 — the LONG
    // ceiling — at a 100 TB-scale order count, and Spark wraps longs
    // silently, so the factors are cast to decimal BEFORE the multiply
    // (ADVICE r9); the price-gap product (which can reach ~1e20) was
    // already decimal. The whole numerator stays exact integers.
    val big0 = DecimalType(38, 0)
    scanned.join(nxt, "rn")
      .crossJoin(broadcast(totals))
      .agg(max("na").as("na"), max("nb").as("nb"),
        sum(abs(col("cuma").cast(big0) * col("nb") -
            col("cumb").cast(big0) * col("na")) *
          (col("vnext") - col("vc")).cast(DecimalType(19, 0))).as("num"))
      .select(col("na"), col("nb"),
        fl6(col("num").cast("double") /
          (col("na") * col("nb")).cast("double") / 100.0).as("w1_dollars"))
  }

  /** §2.2 #335 — POISSON RATE with a 95% CI per event type: events/day
    * over the observed span with the normal-approximation interval
    * (n ± 1.96√n)/T — the "is this event type's arrival rate X/day, give
    * or take" readout behind alerting thresholds. One partial-aggregated
    * pass; the 1-row global span broadcasts.
    */
  def poissonRate(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val span = ev.agg((datediff(max("day"), min("day")) + 1).cast("long")
      .as("n_days"))
    val perType = ev.groupBy("event_type").agg(count(lit(1)).as("n_events"))
    val tD = col("n_days").cast("double")
    val nD = col("n_events").cast("double")
    perType.crossJoin(broadcast(span))
      .select(col("event_type"), col("n_events"), col("n_days"),
        fl6(nD / tD).as("rate_per_day"),
        fl6((nD - lit(1.959964) * sqrt(nD)) / tD).as("ci_lo"),
        fl6((nD + lit(1.959964) * sqrt(nD)) / tD).as("ci_hi"))
      .orderBy("event_type")
  }

  /** §2.2 #336 — FRIEDMAN rank test: do the market segments keep the
    * same revenue ORDER month after month (blocks = months, treatments =
    * segments — the k-sample repeated-measures analogue of #281, immune
    * to month-level seasonality because ranking happens WITHIN each
    * month). Cells are exact cents; within-block average ranks come from
    * rank() + tie-width (both engines break ties identically on exact
    * integers); Q = 12/(nk(k+1))·ΣRⱼ² − 3n(k+1) over the k-row rank-sum
    * frame. Only complete blocks (all k segments) count, per the
    * classical procedure.
    */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val cells = t(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(date_format(to_date(col("o_orderdate")), "yyyy-MM").as("month"),
        col("c_mktsegment").as("seg"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("yc"))
      .localCheckpoint(true)
    val k = cells.agg(countDistinct("seg").as("k"))
    val complete = cells
      .withColumn("nseg", count(lit(1)).over(Window.partitionBy("month")))
      .crossJoin(broadcast(k)).where(col("nseg") === col("k"))
    val ranked = complete
      .withColumn("rk", rank().over(
        Window.partitionBy("month").orderBy("yc")))
      .withColumn("tw", count(lit(1)).over(
        Window.partitionBy("month", "yc")))
      .withColumn("avg_rank",
        col("rk").cast("double") + (col("tw") - 1).cast("double") / 2.0)
    val rsums = ranked.groupBy("seg")
      .agg(max("k").as("k"), count(lit(1)).as("n_months"),
        sum(col("avg_rank").cast(DecimalType(38, 1))).as("rsum"))
      .localCheckpoint(true)
    val q = rsums.agg(max("k").as("kk"), max("n_months").as("nn"),
      sum((col("rsum") * col("rsum")).cast(DecimalType(38, 2))).as("r2"))
      .select((lit(12.0) * col("r2").cast("double") /
        (col("nn") * col("kk") * (col("kk") + 1)).cast("double") -
        lit(3.0) * (col("nn") * (col("kk") + 1)).cast("double")).as("q_raw"),
        (col("kk") - 1).as("dfree"))
    rsums.crossJoin(broadcast(q))
      .select(col("seg").as("segment"), col("n_months"),
        col("rsum").cast("double").as("rank_sum"),
        fl6(col("q_raw")).as("q_stat"), col("dfree").as("df"))
      .orderBy("segment")
  }

  /** §2.2 #337 — BOLLINGER BANDS over daily revenue: 20-day rolling
    * mean ± 2σ with breach flags — the self-scaling volatility envelope
    * (vs #249's rolling z: same frame, but bands surface the LEVELS a
    * dashboard plots and the breach days an alert fires on). Rolling
    * count/Σ/Σ² in exact cents over the CALENDAR-bounded daily frame;
    * σ = √(n·Σx²−(Σx)²)/n keeps the radicand exact-integer. Warmup rows
    * (fewer than 20 prior days) are excluded, not emitted half-baked.
    */
  def bollinger(spark: SparkSession, dir: String, win: Int = 20): DataFrame = {
    val big = DecimalType(38, 0)
    val daily = dailyCents(spark, dir)
    val w = Window.orderBy("day").rowsBetween(-(win - 1), 0) // calendar frame
    val r = daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s", sum("yc").over(w))
      .withColumn("q", sum(col("yc").cast(big) * col("yc").cast(big)).over(w))
      .where(col("cnt") === win)
    val nD = col("cnt").cast("double")
    // The radicand n·Σx² − (Σx)² sits near 2e21 at sf0.1 while the
    // difference is ~1e19: computing it in doubles amplifies 1-ulp
    // conversion noise past the 6-dp display boundary (caught by the
    // three-SF probe). Subtract EXACT integers, convert once.
    val sd = sqrt((col("cnt").cast(big) * col("q") -
      col("s").cast(big) * col("s").cast(big)).cast("double")) / nD / 100.0
    val ma = col("s").cast("double") / nD / 100.0
    val rev = col("yc").cast("double") / 100.0
    r.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        rev.as("revenue"), fl6(ma).as("ma20"), fl6(sd).as("sd20"),
        (rev > ma + lit(2.0) * sd).as("breach_hi"),
        (rev < ma - lit(2.0) * sd).as("breach_lo"))
      .orderBy("day")
  }

  /** §2.2 #338 — RSI (14-day, simple-average form) over daily revenue:
    * 100·Σgains/(Σgains+Σlosses) — the bounded momentum oscillator
    * behind overbought/oversold alerting (vs #221's EWMA level: RSI
    * reads DIRECTION persistence, not level). Day-over-day diffs are
    * exact cents over the calendar frame; the whole statistic reduces to
    * ONE division of exact integer sums, so the 70/30 signal flags can't
    * flip on float noise.
    */
  def rsi(spark: SparkSession, dir: String, win: Int = 14): DataFrame = {
    val daily = dailyCents(spark, dir)
    val lagW = Window.orderBy("day") // calendar-bounded daily frame
    val diffs = daily
      .withColumn("d", col("yc") - lag("yc", 1).over(lagW))
      .where(col("d").isNotNull)
    val w = Window.orderBy("day").rowsBetween(-(win - 1), 0)
    val r = diffs
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sg", sum(greatest(col("d"), lit(0L))).over(w))
      .withColumn("sl", sum(greatest(-col("d"), lit(0L))).over(w))
      .where(col("cnt") === win && (col("sg") + col("sl")) > 0)
    val rsiC = lit(100.0) * col("sg").cast("double") /
      (col("sg") + col("sl")).cast("double")
    r.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        fl6(col("sg").cast("double") / 100.0).as("gain_sum"),
        fl6(col("sl").cast("double") / 100.0).as("loss_sum"),
        fl6(rsiC).as("rsi"),
        when(rsiC > 70.0, "overbought").when(rsiC < 30.0, "oversold")
          .otherwise("neutral").as("signal"))
      .orderBy("day")
  }

  /** §2.2 #339 — SAX symbolization of the daily-revenue series: global
    * z-score quantized to a 4-letter alphabet at the standard normal
    * quartile breakpoints (±0.6744897501960817, 0) — the discretization
    * that turns a numeric series into a STRING for motif/anomaly mining
    * with plain string ops (the symbolic front-end #192-style template
    * ops can consume). μ/σ from one exact power-sum row; each z is one
    * fixed-order double formula, so the letter assignment is
    * deterministic cross-engine.
    */
  def sax(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val daily = dailyCents(spark, dir).localCheckpoint(true)
    val s = daily.agg(count(lit(1)).as("n"), sum("yc").as("sy"),
      sum(col("yc").cast(big) * col("yc").cast(big)).as("qy"))
    val nD = col("n").cast("double")
    val mean = col("sy").cast("double") / nD
    // population σ via the exact-integer radicand: √(n·Σx²−(Σx)²)/n
    val sd = sqrt((col("n").cast(big) * col("qy") -
      col("sy").cast(big) * col("sy").cast(big)).cast("double")) / nD
    val z = (col("yc").cast("double") - mean) / sd
    daily.crossJoin(broadcast(s))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        fl6(z).as("z_score"),
        when(z < -0.6744897501960817, "a").when(z < 0.0, "b")
          .when(z < 0.6744897501960817, "c").otherwise("d").as("symbol"))
      .orderBy("day")
  }

  /** §2.2 #340 — HURST EXPONENT of daily revenue by rescaled-range
    * analysis: per-block R/S at window sizes 8/16/32/64, log-log slope
    * over the 4 sizes — H>0.5 trending, H≈0.5 random walk, H<0.5 mean-
    * reverting (the long-memory companion to #154's fixed-lag ACF).
    * Blocks are value-range slices of the day index, so every window is
    * partitioned by (size, block) and bounded by 64 rows; block
    * means/σ from exact integer sums; per-size means and the final
    * 4-point regression decimal-summed.
    */
  def hurst(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val dec12 = DecimalType(38, 12)
    val lagW = Window.orderBy("day") // calendar-bounded daily frame
    val daily = dailyCents(spark, dir)
      .withColumn("i", row_number().over(lagW))
      .localCheckpoint(true)
    val sized = daily.select(col("day"), col("yc"), col("i"),
      explode(array(lit(8), lit(16), lit(32), lit(64))).as("w"))
      .withColumn("blk", expr("(i - 1) div w"))
    val blocks = sized.groupBy("w", "blk")
      .agg(count(lit(1)).as("bn"), sum("yc").as("bs"),
        sum(col("yc").cast(big) * col("yc").cast(big)).as("bq"))
      .where(col("bn") === col("w"))
    val wB = Window.partitionBy("w", "blk").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = sized
      .withColumn("j", row_number().over(
        Window.partitionBy("w", "blk").orderBy("i")))
      .withColumn("cum", sum("yc").over(wB))
      .join(blocks, Seq("w", "blk"))
    val m = col("bs").cast("double") / col("w").cast("double")
    val dev = col("cum").cast("double") - col("j").cast("double") * m
    val rs = withCum.groupBy("w", "blk")
      .agg(max("bn").as("bn"), max("bs").as("bs"), max("bq").as("bq"),
        (max(dev) - min(dev)).as("rng"))
    val wD = col("w").cast("double")
    // block σ via the exact-integer radicand: √(w·Σx²−(Σx)²)/w
    val sBlk = sqrt((col("w").cast(big) * col("bq") -
      col("bs").cast(big) * col("bs").cast(big)).cast("double")) / wD
    val logrs = rs.where(sBlk > 0)
      .select(col("w"), log(col("rng") / sBlk).as("lrs"))
    val perW = logrs.groupBy("w")
      .agg(count(lit(1)).as("n_blocks"),
        (sum(col("lrs").cast(dec12)).cast("double") /
          count(lit(1)).cast("double")).as("mean_lrs"))
      .localCheckpoint(true)
    val fit = perW
      .select(log(col("w").cast("double")).as("x"), col("mean_lrs").as("y"))
      .agg(count(lit(1)).as("m"),
        sum(col("x").cast(dec12)).as("sx"), sum(col("y").cast(dec12)).as("sy"),
        sum((col("x") * col("y")).cast(dec12)).as("sxy"),
        sum((col("x") * col("x")).cast(dec12)).as("sxx"))
      .select(((col("m").cast("double") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (col("m").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))).as("h"))
    perW.crossJoin(broadcast(fit))
      .select(col("w").as("win_size"), col("n_blocks"),
        fl6(col("mean_lrs")).as("mean_log_rs"), fl6(col("h")).as("hurst"))
      .orderBy("win_size")
  }

  /** §2.2 #341 — ENTROPY RATE of the user-journey Markov chain:
    * H = Σᵢ πᵢ·Hᵢ with Hᵢ = −Σⱼ pᵢⱼ·log₂pᵢⱼ — how PREDICTABLE the next
    * event is given the current one (the information-theoretic summary
    * on top of #109's transition matrix and #246's steady state: 0 bits
    * = deterministic funnel, log₂k = uniform chaos). Same bounded
    * state-space frames: transitions partial-aggregate to k² rows, π by
    * the #246 fixed-3-iteration power method, every sum decimal-exact.
    */
  def entropyRate(spark: SparkSession, dir: String, iters: Int = 3)
      : DataFrame = {
    val dec = DecimalType(38, 18)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead("from_type", 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val rowTot = trans.groupBy("from_type").agg(sum("nij").as("ni"))
    val states = trans.select(col("from_type").as("event_type"))
      .union(trans.select(col("to_type").as("event_type"))).distinct()
      .localCheckpoint(true)
    val n = states.count()
    var pi = states.select(col("event_type"), lit(1.0 / n).as("p"))
    for (_ <- 1 to iters) {
      val contrib = trans.join(rowTot, "from_type")
        .join(pi.withColumnRenamed("event_type", "from_type"), "from_type")
        .select(col("to_type").as("event_type"),
          (col("p") * (col("nij").cast("double") / col("ni").cast("double")))
            .cast(dec).as("c"))
        .groupBy("event_type").agg(sum("c").as("in_p"))
      pi = states.join(contrib, Seq("event_type"), "left_outer")
        .select(col("event_type"),
          coalesce(col("in_p").cast("double"), lit(0.0)).as("p"))
    }
    // Entropies in NATS (natural log matches bit-for-bit cross-engine;
    // a log2 primitive need not).
    val pij = col("nij").cast("double") / col("ni").cast("double")
    val rowEnt = trans.join(rowTot, "from_type")
      .groupBy("from_type")
      .agg(sum((-pij * log(pij)).cast(dec)).as("hd"))
      .select(col("from_type").as("event_type"),
        col("hd").cast("double").as("h_row"))
    val joined = pi.join(rowEnt, Seq("event_type"), "left_outer")
      .select(col("event_type"), col("p"),
        coalesce(col("h_row"), lit(0.0)).as("h_row"))
      .localCheckpoint(true)
    val rate = joined.agg(sum((col("p") * col("h_row")).cast(dec)).as("hr"))
      .select(col("hr").cast("double").as("hr"))
    joined.crossJoin(broadcast(rate))
      .select(col("event_type"),
        (floor(col("p") * lit(1e9) + lit(0.5)) / lit(1e9)).as("pi"),
        fl6(col("h_row")).as("h_row"), fl6(col("hr")).as("entropy_rate"))
      .orderBy("event_type")
  }

  /** §2.2 #347 — INTERARRIVAL-TIME profile per event type: mean gap and
    * coefficient of variation of the within-user gaps preceding each
    * event type — the Poisson-ness check on top of #335's rate (CV ≈ 1
    * is exponential/memoryless; CV ≫ 1 bursty — sessions, retries;
    * CV ≪ 1 scheduled — heartbeats), which decides whether a rate alert
    * can use Poisson bands at all. Gaps from the same user-partitioned
    * lag the sessionizer uses (scale-safe: user keys shard), moments in
    * exact integer µs (Σgap long, Σgap² DECIMAL(38,0)), one rollup to
    * the |event types| frame.
    */
  def interarrival(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("gap_us", col("t_us") - lag("t_us", 1).over(w))
      .where(col("gap_us").isNotNull)
    // Σgap_us approaches the long ceiling at stress SFs (users × span in
    // µs) — decimal-summed like the squares.
    val s = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us").cast(big)).as("sg"),
        sum(col("gap_us").cast(big) * col("gap_us").cast(big)).as("qg"))
    val nD = col("n_gaps").cast("double")
    val mean = col("sg").cast("double") / nD
    // σ via the exact-integer radicand: √(n·Σg²−(Σg)²)/n. Both terms sit
    // near the DECIMAL(38,0) ceiling at extreme SFs (Σg ~ users×span in
    // µs → (Σg)² ~ 1e38); past it Spark yields NULL where DuckDB errors,
    // so a silent null would diverge engines — fail LOUDLY instead
    // (ADVICE r9). Documented bound: exact up to Σgap_us < 1e19 per type.
    val radRaw = (col("n_gaps").cast(big) * col("qg") -
      col("sg") * col("sg"))
    val rad = when(radRaw.isNull, raise_error(lit(
      "interarrival: σ radicand overflowed DECIMAL(38,0) — corpus past " +
        "the documented Σgap_us < 1e19 bound"))).otherwise(radRaw)
    val sd = sqrt(rad.cast("double")) / nD
    val cv = sd / mean
    s.select(col("event_type"), col("n_gaps"),
        fl6(mean / 1000000.0).as("mean_gap_s"),
        fl6(sd / 1000000.0).as("sd_gap_s"), fl6(cv).as("cv"),
        when(cv > 1.5, "bursty").when(cv < 0.5, "scheduled")
          .otherwise("poisson_like").as("regime"))
      .orderBy("event_type")
  }

  /** §2.2 #354 — CRONBACH'S ALPHA of quarterly spend consistency:
    * subjects = customers, items = the four calendar quarters (spend per
    * quarter-of-year, 0 where inactive), α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total)
    * — "is quarterly spend a RELIABLE per-customer trait or noise"
    * (α → 1: customers keep their rank every quarter, a stable scoring
    * basis; α → 0: quarters disagree, #156-style RFM scores built on one
    * quarter won't transfer). ONE fused scan: the four item columns are
    * conditional DECIMAL aggregates per customer (the #315 cell
    * discipline — columns, not rows), then a single power-sum row drives
    * the five population variances in fixed-order doubles.
    */
  def cronbachAlpha(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), quarter(col("o_orderdate")).as("qtr"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("pc"))
    def item(q: Int) =
      coalesce(sum(when(col("qtr") === q, col("pc"))), lit(0L)).as(s"i$q")
    val subj = o.groupBy("o_custkey").agg(item(1), item(2), item(3), item(4))
      .withColumn("tot", col("i1") + col("i2") + col("i3") + col("i4"))
    val aggs = (1 to 4).flatMap(q => Seq(
      sum(col(s"i$q")).as(s"s$q"),
      sum(col(s"i$q").cast(big) * col(s"i$q").cast(big)).as(s"q$q"))) ++ Seq(
      count(lit(1)).as("n"), sum("tot").as("st"),
      sum(col("tot").cast(big) * col("tot").cast(big)).as("qt"))
    val s = subj.agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    // population variances via the exact-integer radicand (n·Σx²−(Σx)²)/n²
    def popVar(sc: Column, qc: Column): Column =
      (col("n").cast(big) * qc - sc.cast(big) * sc.cast(big)).cast("double") /
        (nD * nD)
    val sumItemVar = (1 to 4).map(q => popVar(col(s"s$q"), col(s"q$q")))
      .reduce(_ + _)
    val totVar = popVar(col("st"), col("qt"))
    // Spark's floor(double) returns LONG, which SATURATES at Long.Max —
    // at sf10-scale the dollar² variances pass 8e15, floor(x·1e6) wraps
    // to 9.22e12 while DuckDB's double-floor keeps the value (caught by
    // the sf10 numeric probe). Above ~9e12 a 6-dp round is below the
    // double's own ulp anyway, so both engines switch to identity there.
    def fl6cap(c: Column): Column =
      when(c < lit(9e12), fl6(c)).otherwise(c)
    s.select(lit(4L).as("k_items"), col("n").as("n_subjects"),
      fl6cap(sumItemVar / 10000.0).as("sum_item_var"),
      fl6cap(totVar / 10000.0).as("total_var"),
      fl6(lit(4.0) / 3.0 * (lit(1.0) - sumItemVar / totVar)).as("alpha"))
  }

  /** §2.2 #358 — FIXED-EFFECT META-ANALYSIS of the A/B effect across 8
    * event-hash sites: per-site arm difference dᵢ with variance vᵢ,
    * pooled effect d̂ = Σwᵢdᵢ/Σwᵢ (wᵢ = 1/vᵢ, inverse-variance
    * weighting), its SE = 1/√Σwᵢ, Cochran's Q = Σwᵢ(dᵢ−d̂)² and
    * I² = (Q−df)/Q — the "portfolio of experiments" readout (#132 pools
    * users blindly; this says whether the per-site effects AGREE enough
    * to pool at all — high I² means one global number misleads). Sites
    * slice by EVENT id, not user id: the #132 arms are a per-user hash,
    * so user-keyed strata degenerate to single-arm cells whenever the
    * user population is small relative to the strata. One fused fact
    * scan to per-(site, arm) power sums (the #315 cell discipline), then
    * bounded-frame double arithmetic with decimal-summed w/wd/Q terms.
    */
  def metaAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 12)
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("value"),
        (pmod(col("event_id"), lit(8)) + 1).as("nkey"),
        when(substring(sha2(col("user_id").cast("string"), 256), 1, 1) <= "7",
          lit("A")).otherwise(lit("B")).as("arm"))
    def cell(a: String, out: String): Seq[Column] = {
      val in = col("arm") === a
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$out"),
        sum(when(in, col("value").cast(DecimalType(28, 6)))).as(s"s_$out"),
        sum(when(in, (col("value") * col("value")).cast(DecimalType(28, 6))))
          .as(s"q_$out"))
    }
    val per = ev.groupBy("nkey").agg((cell("A", "a") ++ cell("B", "b")).head,
      (cell("A", "a") ++ cell("B", "b")).tail: _*)
    def m(g: String) = col(s"s_$g").cast("double") / col(s"n_$g").cast("double")
    def v(g: String) =
      (col(s"q_$g").cast("double") / col(s"n_$g").cast("double") - m(g) * m(g)) /
        col(s"n_$g").cast("double")
    val studies = per.where(col("n_a") >= 2 && col("n_b") >= 2)
      .select(col("nkey"), col("n_a"), col("n_b"),
        (m("b") - m("a")).as("d"), (v("a") + v("b")).as("vv"))
      .localCheckpoint(true)
    val pooledS = studies.agg(count(lit(1)).as("k_studies"),
      sum((lit(1.0) / col("vv")).cast(dec)).as("sw"),
      sum((col("d") / col("vv")).cast(dec)).as("swd"))
    val dhat = col("swd").cast("double") / col("sw").cast("double")
    val pooled = pooledS
      .select(col("k_studies"), dhat.as("d_pooled"),
        (lit(1.0) / sqrt(col("sw").cast("double"))).as("se"))
      .localCheckpoint(true)
    val qS = studies.crossJoin(broadcast(pooled))
      .agg(max("k_studies").as("k_studies"), max("d_pooled").as("d_pooled"),
        max("se").as("se"),
        sum(((col("d") - col("d_pooled")) * (col("d") - col("d_pooled")) /
          col("vv")).cast(dec)).as("qd"))
    val qHet = col("qd").cast("double")
    val dfD = (col("k_studies") - 1).cast("double")
    qS.select(col("k_studies"), fl6(col("d_pooled")).as("d_pooled"),
      fl6(col("se")).as("se"),
      fl6(col("d_pooled") / col("se")).as("z_stat"),
      fl6(qHet).as("q_het"),
      fl6(greatest((qHet - dfD) / qHet, lit(0.0))).as("i2"))
  }

  /** §2.2 #342 — local PEAK detection over daily revenue: strict local
    * maxima with their prominence over the higher neighbor — the
    * spike-day lister feeding #220's seasonality check ("are the peaks
    * the same weekday?"). Pure integer lag/lead compares on the
    * calendar-bounded frame: no float, no threshold to tune, endpoints
    * excluded (one-sided neighbors can't certify a peak).
    */
  def peakDetect(spark: SparkSession, dir: String): DataFrame = {
    val lagW = Window.orderBy("day") // calendar-bounded daily frame
    dailyCents(spark, dir)
      .withColumn("prev", lag("yc", 1).over(lagW))
      .withColumn("nxt", lead("yc", 1).over(lagW))
      .where(col("prev").isNotNull && col("nxt").isNotNull &&
        col("yc") > col("prev") && col("yc") > col("nxt"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        (col("yc").cast("double") / 100.0).as("revenue"),
        ((col("yc") - greatest(col("prev"), col("nxt"))).cast("double") / 100.0)
          .as("prominence"))
      .orderBy("day")
  }

  /** §2.2 #368 — BARTLETT'S TEST of variance homogeneity of order value
    * across ALL market segments: the parametric twin of Levene #292
    * (Bartlett is more powerful under normality, fragile otherwise — a
    * pipeline reports both). χ² = [(N−k)·ln S²_p − Σ(nᵢ−1)·ln S²ᵢ] / C
    * with the Bartlett correction C. Exactness discipline: each group's
    * variance NUMERATOR nᵢ·Σx²ᵢ − (Σxᵢ)² is computed in exact
    * DECIMAL(38,0) over cents (the q_bollinger cancellation lesson — the
    * two terms sit ~1e22 apart from a ~1e19 difference at big SFs; doubles
    * would cancel), converted to double ONCE; ln is applied to values
    * ~1e9-1e15 where 1 libm ulp is ~1e-7 RELATIVE — far below the 6-dp
    * floor of the O(100) statistic. One partial-aggregated pass over the
    * orders⋈customer join; k+1 scalars do the rest.
    *
    * Exactness BOUND (ADVICE r11): the integer numerator n·Σx² − (Σx)²
    * holds while n·Σx² fits DECIMAL(38,0) — with cents ~1e7 that is
    * roughly 1e12–1e13 rows per group (~1.7e38 ceiling; the DuckDB
    * HUGEINT oracle shares it). Past that the multiply NULLs under
    * ANSI-off, so the guard below turns silent-NULL into a loud
    * raise_error naming the segment instead of a NULL χ².
    */
  def bartlett(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("yc"))
    val cst = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val g = o.join(broadcast(cst), col("o_custkey") === col("c_custkey"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        sum(col("yc").cast(big)).as("s1"),
        sum(col("yc").cast(big) * col("yc")).as("s2"))
      .where(col("n") >= 2)
      // Exact integer variance numerator; S²ᵢ = num / (n(n−1)) in one
      // double division (cents² units — the units cancel inside the ln
      // differences up to an additive constant that Σ(nᵢ−1) redistributes,
      // so both engines MUST keep the same units; they do).
      .withColumn("num", col("n").cast(big) * col("s2") - col("s1") * col("s1"))
      // Overflow guard: with the n>=2 filter above, s1/s2 are non-null, so
      // a NULL num can ONLY be the DECIMAL(38,0) multiply overflowing
      // (ANSI-off NULLs instead of throwing). Fail loud with the segment.
      .withColumn("num", when(col("num").isNull, raise_error(concat(
          lit("bartlett: DECIMAL(38,0) variance-numerator overflow for seg="),
          col("seg"), lit(" n="), col("n").cast("string"))))
        .otherwise(col("num")))
      .withColumn("s2i", col("num").cast("double") /
        (col("n").cast("double") * (col("n") - 1).cast("double")))
    // Cross-group sums ride the #210 discipline (fFromPowerSums): each
    // group's term is ONE deterministic double formula over exact
    // integers, then summed ORDER-FREE via decimal — a plain double sum's
    // partition-order rounding would differ between engines.
    val dec12 = DecimalType(38, 12)
    val agg = g.agg(
        count(lit(1)).as("k_groups"),
        sum("n").as("n_total"),
        sum(((col("n") - 1).cast("double") * log(col("s2i"))).cast(dec12))
          .cast("double").as("sum_ln"),
        sum(((col("n") - 1).cast("double") * col("s2i")).cast(dec12))
          .cast("double").as("sum_ss"),
        sum((lit(1.0) / (col("n") - 1).cast("double")).cast(dec12))
          .cast("double").as("sum_inv"))
      .withColumn("df_pool", (col("n_total") - col("k_groups")).cast("double"))
      .withColumn("s2p", col("sum_ss") / col("df_pool"))
      .withColumn("c_corr", lit(1.0) +
        (col("sum_inv") - lit(1.0) / col("df_pool")) /
        (lit(3.0) * (col("k_groups") - 1).cast("double")))
      .withColumn("chi2",
        (col("df_pool") * log(col("s2p")) - col("sum_ln")) / col("c_corr"))
    agg.select(col("k_groups"), col("n_total"),
      fl6(col("chi2")).as("bartlett_chi2"),
      (col("k_groups") - 1).as("df"))
  }

  /** §2.2 #369 — CLIFF'S DELTA effect size of order value, BUILDING vs
    * MACHINERY: δ = (#{x>y} − #{x<y}) / (n_A·n_B) — the ordinal,
    * distribution-free companion to Mann-Whitney #228 (U says WHETHER the
    * segments differ; δ says HOW MUCH, on a [-1,1] scale robust to any
    * monotone transform of price). Same 100 TB-safe machinery as the U
    * family: win counts come from the joint value HISTOGRAM — for every
    * distinct price, wins_A(v) = c_A(v) · #{B < v} via one exclusive
    * [[PrefixScan.runningSums]] over distinct prices — so nothing ever
    * pairs rows. Counts are exact DECIMAL(19,0)² products (the long-wrap
    * class fixed in ksTest this round); δ is one double division of exact
    * integers.
    */
  def cliffDelta(spark: SparkSession, dir: String, segA: String = "BUILDING",
      segB: String = "MACHINERY"): DataFrame = {
    val f19 = DecimalType(19, 0)
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val v = t(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin(segA, segB))
      .select(col("c_mktsegment").as("seg"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("v"))
    val h = v.groupBy("v").agg(
      sum(when(col("seg") === segA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("seg") === segB, 1L).otherwise(0L)).as("cb"))
    // Exclusive running counts of B strictly below v; B strictly above v
    // derives from the total (nb − cumb_lt − cb).
    val scanned = PrefixScan.runningSums(h, "v", Seq(col("v")),
      Seq("cb" -> "cumb_le"), exclusive = true)
    val tot = h.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val agg = scanned.crossJoin(broadcast(tot))
      .agg(max("na").as("na"), max("nb").as("nb"),
        sum(col("ca").cast(f19) * col("cumb_le").cast(f19)).as("wins_a"),
        sum(col("ca").cast(f19) *
          (col("nb") - col("cumb_le") - col("cb")).cast(f19)).as("wins_b"))
    agg.select(col("na"), col("nb"), col("wins_a").cast("long").as("wins_a"),
      col("wins_b").cast("long").as("wins_b"),
      fl6((col("wins_a") - col("wins_b")).cast("double") /
        (col("na").cast(f19) * col("nb").cast(f19)).cast("double"))
        .as("cliff_delta"))
  }

  /** §2.2 #370 — LORENZ CURVE decile points of per-customer revenue: for
    * d = 1..10, the cumulative revenue share held by the bottom ⌊n·d/10⌋
    * customers (revenue-ascending, custkey tie-break) — the curve BEHIND
    * #152's Gini scalar, the shape a marketplace actually plots ("the
    * bottom 50% hold 9% of revenue"). Rank and cumulative revenue come
    * from ONE [[PrefixScan]] multi-scan over the customer dim (never an
    * unpartitioned window); each decile row is then a bounded equi-join
    * of the 10-row cut frame against the ranked frame. Shares are exact
    * decimal cumsums divided once.
    */
  def lorenz(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("x"))
      // Re-narrow for the scan's value column (cents in LONG).
      .select(col("o_custkey"), (col("x") * 100).cast("long").as("xc"))
    val ranked = PrefixScan.runningSums(
        rev.withColumn("__one", lit(1L)),
        "xc", Seq(col("xc").asc, col("o_custkey").asc),
        Seq("xc" -> "cumx", "__one" -> "i"))
      .select("i", "cumx")
      .localCheckpoint(true)
    val tot = ranked.agg(max("i").as("n"), max("cumx").as("sx"))
    val cuts = broadcast(spark.range(1, 11).toDF("decile")
      .crossJoin(broadcast(tot))
      .select(col("decile"), expr("n * decile DIV 10").as("i"),
        col("n"), col("sx")))
    ranked.join(cuts, "i")
      .select(col("decile"), col("n").as("n_customers"),
        col("i").as("rank_cut"),
        fl6(col("cumx").cast("double") / col("sx").cast("double"))
          .as("cum_revenue_share"))
      .orderBy("decile")
  }

  /** Shared PARTSUPP-LITE derivation for the partsupp-centric TPC-H
    * shapes (#376 Q2, #377 Q11, #378 Q16, #379 Q20): the reduced schema
    * ships no partsupp table, so one is derived from lineitem — the
    * `q_tpch_q9` precedent (which derived supply COST the same way).
    * `ps_availqty` is the exact decimal Σ l_quantity per (part, supp)
    * and `ps_supplycost` is min(l_extendedprice) — a min over identical
    * input doubles, order-free and engine-identical; no division
    * anywhere, so every downstream comparison is deterministic.
    *
    * At 100 TB: one partial-aggregated pass over lineitem with the
    * shuffle keyed (partkey, suppkey) — the same reduction a real
    * partsupp materialization runs; the result is |parts|×|supps per
    * part| bounded, dimension-sized relative to the fact.
    */
  private def partsuppLite(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("ps_availqty"),
        min(col("l_extendedprice")).as("ps_supplycost"))

  /** The partsupp-lite CTE as DuckDB SQL (oracle twin of
    * [[partsuppLite]]) — DECIMAL sum and double min, same as Spark.
    */
  private[graft] val partsuppLiteSql: String =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty,
      |    min(l_extendedprice) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** §2.2 #380 — TPC-H Q12 (shipmode priority classification): lines
    * shipped in a window, restricted to two "ship modes" (the reduced
    * schema has no l_shipmode; l_returnflag's R/A classes stand in —
    * same two-class IN filter, same plan), joined to orders, counting
    * high-priority (1-URGENT / 2-HIGH) vs lower-priority orders per
    * mode. The IN + date predicates reach the lineitem scan
    * (PushedFilters); the join is fact-to-fact on orderkey — sort-merge
    * by design, never broadcast (both sides scale with SF); the
    * conditional counts partial-aggregate map-side.
    */
  def tpchQ12(spark: SparkSession, dir: String,
      yearStart: String = "1996-01-01", yearEnd: String = "1997-01-01",
      modes: Seq[String] = Seq("R", "A")): DataFrame = {
    val hi = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= to_date(lit(yearStart)) &&
        col("l_shipdate") < to_date(lit(yearEnd)) &&
        col("l_returnflag").isin(modes: _*))
      .select(col("l_orderkey"), col("l_returnflag").as("shipmode"))
      .join(t(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("shipmode")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("shipmode")
  }

  /** §2.2 #376 — TPC-H Q2 (min-cost supplier): for every part of one
    * type in one region, the supplier(s) quoting the minimum supply
    * cost, with their nation and balance. The correlated MIN subquery is
    * de-correlated into a per-part aggregate + equi-join on exact double
    * equality (both sides read the identical min, so the equality is
    * deterministic). Supplier⋈nation⋈region is dimension-sized and
    * BROADCAST against partsupp-lite; the part filter prunes the probe
    * at its scan. Top-100 by balance via distributed TakeOrdered, the
    * canonical Q2 LIMIT.
    */
  def tpchQ2(spark: SparkSession, dir: String, partType: String = "LARGE",
      region: String = "ASIA", topK: Int = 100): DataFrame = {
    val part = t(spark, dir, "part")
      .where(col("p_type") === partType).select("p_partkey", "p_name")
    val nat = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")
          .where(col("r_name") === region).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = t(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name").as("nation"))
    // The filtered partsupp-lite frame feeds BOTH the per-part min and the
    // final equality join — materialize it once (dimension-sized after the
    // part/supplier cuts) instead of scanning lineitem twice.
    val ps = partsuppLite(spark, dir)
      .join(broadcast(part), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
      .localCheckpoint(true)
    val minCost = ps.groupBy(col("ps_partkey").as("m_partkey"))
      .agg(min(col("ps_supplycost")).as("min_cost"))
    ps.join(minCost, col("ps_partkey") === col("m_partkey") &&
        col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("nation"),
        col("ps_partkey").as("p_partkey"), col("p_name"),
        col("ps_supplycost").as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("nation").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(topK)
  }

  /** §2.2 #377 — TPC-H Q11 (important stock value): per-part stock value
    * Σ cost·qty over one nation's suppliers, keeping parts whose value
    * exceeds `tenths` tenths of the MEAN part value. The canonical spec's
    * threshold is fraction/SF — explicitly scale-dependent — so the
    * scale-free restatement anchors on the mean (value·n_parts·10 >
    * total·tenths): the decade-stress gate caught the fixed-basis-point
    * form going VACUOUS at 100× (2 000 parts ⇒ every share < 0.1%), and
    * an empty==empty gate row proves nothing. Same scalar-subquery plan;
    * the cut compares deterministic doubles of decimal-exact operands.
    * Nation supplier set is broadcast; the per-part and total aggregates
    * share one scan of the filtered partsupp-lite frame.
    */
  def tpchQ11(spark: SparkSession, dir: String, nation: String = "NATION_3",
      tenths: Int = 10): DataFrame = {
    // Supply cost to exact integer CENTS via floor(x·100+0.5) — a
    // double→DECIMAL cast would round half-up (Spark) vs round-half-even
    // (engine-dependent) at representation ties; floor of identical
    // doubles is engine-stable (the fl6 discipline at 2 dp).
    val cents = floor(col("ps_supplycost") * lit(100.0) + lit(0.5))
      .cast(DecimalType(18, 0))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
          .where(col("n_name") === nation).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val vals = partsuppLite(spark, dir)
      .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"),
        (cents * col("ps_availqty").cast(DecimalType(18, 2))).as("v"))
    val perPart = vals.groupBy("ps_partkey").agg(sum(col("v")).as("value_d"))
    val total = perPart.agg(sum(col("value_d")).as("total_d"),
      count(lit(1)).as("n_parts"))
    // Threshold in DOUBLE over decimal-exact operands: both engines cast
    // the identical decimals and run the identical IEEE multiplies, so
    // the cut is deterministic without pushing decimal precision past 38.
    perPart.crossJoin(broadcast(total))
      .where(col("value_d").cast("double") * col("n_parts").cast("double") *
        lit(10.0) > col("total_d").cast("double") * lit(tenths.toDouble))
      .select(col("ps_partkey"),
        (col("value_d").cast("double") / lit(100.0)).as("value"))
      .orderBy(col("value").desc, col("ps_partkey").asc)
  }

  /** §2.2 #378 — TPC-H Q16 (supplier-part relationship count): distinct
    * suppliers per (brand, type, size) bucket over a brand-excluded part
    * subset, excluding "complaint" suppliers (the reduced schema has no
    * s_comment; negative account balance stands in — same anti-join
    * plan). The count-distinct shuffles (brand, type, size, suppkey)
    * pre-deduplicated keys — the presence-dedup shape, never a
    * collect_set. Part dim broadcasts; the exclusion list broadcasts as
    * an anti-join build.
    */
  def tpchQ16(spark: SparkSession, dir: String,
      excludeBrand: String = "Brand#1"): DataFrame = {
    val part = t(spark, dir, "part")
      .where(col("p_brand") =!= excludeBrand)
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSup = t(spark, dir, "supplier")
      .where(col("s_acctbal") < 0).select("s_suppkey")
    partsuppLite(spark, dir)
      .join(broadcast(part), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(badSup), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  /** §2.2 #379 — TPC-H Q20 (excess-demand suppliers): suppliers in one
    * nation whose shipments of name-prefixed parts in one year exceeded
    * half their all-time volume of that part — the Q20 nested-subquery
    * chain (parts LIKE → per-(part,supp) year aggregate → threshold
    * semi-join into supplier). The canonical availqty > ½·shipped flips
    * here because partsupp-lite DERIVES availqty as all-time shipped
    * volume (a superset of any year); 2·shipped > availqty keeps the
    * identical plan — aggregate-vs-aggregate threshold, division-free in
    * exact DECIMAL — with a selective predicate. Semi-join into the
    * supplier dim so each supplier lists once. The geography cut is a
    * REGION (five nations), not the canonical single nation: the reduced
    * corpus yields zero single-nation hits at the smallest gate SF and
    * an empty==empty gate row proves nothing (the r8 vacuity lesson);
    * the join shape is identical.
    */
  def tpchQ20(spark: SparkSession, dir: String, namePrefix: String = "small",
      yearStart: String = "1996-01-01", yearEnd: String = "1997-01-01",
      region: String = "EUROPE"): DataFrame = {
    val part = t(spark, dir, "part")
      .where(col("p_name").startsWith(namePrefix)).select("p_partkey")
    // ONE lineitem scan computes both aggregates of the nested-subquery
    // chain: all-time volume (the partsupp-lite availqty derivation,
    // value-identical to [[partsuppLite]]) and the year-window shipped
    // quantity as a conditional sum — the semi-join against the LIKE'd
    // part set broadcasts and prunes the scan's rows before the shuffle.
    val inWindow = col("l_shipdate") >= to_date(lit(yearStart)) &&
      col("l_shipdate") < to_date(lit(yearEnd))
    val qty = col("l_quantity").cast(DecimalType(18, 2))
    val hot = t(spark, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(qty).as("ps_availqty"),
        sum(when(inWindow, qty).otherwise(lit(0).cast(DecimalType(18, 2))))
          .as("shipped_qty"))
      .where(col("shipped_qty") * lit(2) > col("ps_availqty"))
      .select(col("l_suppkey").as("ps_suppkey")).distinct()
    val regNations = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")
          .where(col("r_name") === region).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    t(spark, dir, "supplier")
      .join(broadcast(regNations), col("s_nationkey") === col("n_nationkey"))
      .join(hot, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** §2.2 #372 — BOT-RATE screen over the event stream: per-user volume,
    * active span, mean/min inter-arrival gap, and a superhuman-rate flag
    * (≥ `minEvents` events with min gap below `minGapMs`) — the standard
    * pre-training filter that keeps scripted traffic out of behavioral
    * data. Gaps ride the partitioned per-user lag window (#347's shape);
    * everything after is one partial-aggregated pass. Output is the
    * bounded suspicious top-`topK` by (min gap, volume desc, user) via
    * distributed TakeOrdered — never a full per-user dump.
    */
  def botFlags(spark: SparkSession, dir: String, minEvents: Int = 15,
      minGapMs: Long = 2000, topK: Int = 10): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("gap_us", col("t_us") - lag("t_us", 1).over(w))
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (max("t_us") - min("t_us")).as("span_us"),
        min("gap_us").as("min_gap_us"))
      .where(col("n_events") >= 2)
      .select(col("user_id"), col("n_events"),
        fl6(col("span_us").cast("double") / 1e6).as("span_s"),
        fl6(col("span_us").cast("double") /
          (col("n_events") - 1).cast("double") / 1e6).as("mean_gap_s"),
        fl6(col("min_gap_us").cast("double") / 1e6).as("min_gap_s"),
        (col("n_events") >= minEvents &&
          col("min_gap_us") < minGapMs * 1000L).as("is_bot"))
      .orderBy(col("min_gap_s").asc, col("n_events").desc, col("user_id").asc)
      .limit(topK)
  }

  /** §2.2 #386 — DELETE-ONE-GROUP JACKKNIFE standard error of the mean
    * order price, grouped by order month: each replicate mean θ_g drops
    * one month, var_jack = (G−1)/G · Σ(θ_g − θ̄)². The resampling-free
    * uncertainty estimate for a ratio metric over correlated batches
    * (months) — the grouped complement of the Poisson bootstrap (#206):
    * G replicates instead of nBoot, each an O(1) algebraic correction
    * (S−s_g)/(N−n_g) of the SAME one-pass group sums, so the whole
    * operator is ONE scan + a |months|-bounded frame — at 100 TB the
    * jackknife costs exactly what the monthly rollup already costs.
    *
    * Determinism: group sums ride exact integer cents in DECIMAL(38,0);
    * each θ_g is one IEEE division of exact values (bit-identical on both
    * engines) QUANTIZED to integer micro-units by the floor-form — a
    * double→scaled-decimal cast would multiply past 2⁵³ and round
    * differently per engine, an exact integer never can — so Σθ and Σθ²
    * are add-order-free integer sums; the variance is clamped at 0 before
    * sqrt (an all-identical corpus would otherwise hand sqrt a −1 ulp
    * residue).
    */
  def jackknife(spark: SparkSession, dir: String): DataFrame = {
    val dec0 = DecimalType(38, 0)
    val g = t(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT)").as("xc"))
      .groupBy("m")
      .agg(count(lit(1)).as("ng"), sum(col("xc").cast(dec0)).as("sg"))
    val tot = g.agg(sum("ng").as("n"), sum("sg").as("s"),
      count(lit(1)).as("gcnt"))
    val th = g.crossJoin(broadcast(tot))
      .withColumn("theta", (col("s") - col("sg")).cast("double") /
        ((col("n") - col("ng")).cast("double") * lit(100.0)))
      .withColumn("thi", expr("CAST(floor(theta * 1e6 + 0.5d) AS BIGINT)"))
    val a = th.agg(
      max("gcnt").as("g_groups"), max("n").as("n_rows"),
      (max("s").cast("double") / (max("n").cast("double") * lit(100.0)))
        .as("mean_full"),
      sum(col("thi").cast(dec0)).cast("double").as("sthi"),
      sum((col("thi").cast(dec0) * col("thi").cast(dec0))).cast("double")
        .as("sthi2"))
    val gd = col("g_groups").cast("double")
    a.select(col("g_groups"), col("n_rows"), fl6(col("mean_full")).as("mean_full"),
      fl6(col("sthi") / lit(1e6) / gd).as("theta_bar"),
      fl6(sqrt(greatest(lit(0.0), (gd - 1.0) / gd *
        (col("sthi2") / lit(1e12) -
         (col("sthi") / lit(1e6)) * (col("sthi") / lit(1e6)) / gd))))
        .as("se_jack"))
  }

  /** §2.2 #387 — BENJAMINI–HOCHBERG FDR control over one z-test per
    * nation: "which nations' high-value-order rate really differs from
    * the rest?" asked 25 times needs multiplicity control — BH's step-up
    * (largest i with p_(i) ≤ αi/m; everything ranked at or below
    * discovers) bounds the expected false-discovery fraction at α where
    * Bonferroni would throw away power. Per-nation pooled two-proportion
    * z from integer counts in ONE fact scan; the BH walk runs on the
    * |nations|-bounded frame (the unpartitioned window is over ≤25 rows,
    * never the corpus).
    *
    * Determinism: counts are exact; z is IEEE arithmetic on exact values
    * (bit-identical both engines); Φ(|z|) uses the logistic surrogate
    * 1/(1+exp(1.702·|z|)) — an explicit, documented approximation chosen
    * because neither engine exposes erf, identical formula both sides;
    * the BH comparison runs on INTEGERS (p6·1e6·m ≤ 1e5·α₁₀·i with α =
    * α₁₀/10), so no float threshold can flip a rank between engines.
    */
  def fdrBh(spark: SparkSession, dir: String, priceCut: Double = 250000.0,
      alpha10: Int = 1): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val nat = t(spark, dir, "nation").select("n_nationkey", "n_name")
    val perNation = t(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n1"),
        sum(when(col("o_totalprice") > priceCut, 1L).otherwise(0L)).as("k1"))
    val tot = perNation.agg(sum("n1").as("nn"), sum("k1").as("kk"),
      count(lit(1)).as("m"))
    val z = perNation.crossJoin(broadcast(tot))
      .withColumn("n2", col("nn") - col("n1"))
      .withColumn("k2", col("kk") - col("k1"))
      .withColumn("phat", col("kk").cast("double") / col("nn").cast("double"))
      .withColumn("zs",
        (col("k1").cast("double") / col("n1").cast("double") -
         col("k2").cast("double") / col("n2").cast("double")) /
        sqrt(col("phat") * (lit(1.0) - col("phat")) *
          (lit(1.0) / col("n1").cast("double") +
           lit(1.0) / col("n2").cast("double"))))
      // Two-sided p through the logistic CDF surrogate (see scaladoc).
      .withColumn("p6", fl6(lit(2.0) /
        (lit(1.0) + exp(lit(1.702) * abs(col("zs"))))))
      .withColumn("p_int",
        expr("CAST(floor(p6 * 1e6 + 0.5d) AS BIGINT)"))
    val wRank = Window.orderBy(col("p_int"), col("n_name"))
    val ranked = z
      .withColumn("rk", row_number().over(wRank))
      // step-up: integer-exact p_(i) ≤ (α10/10)·(i/m)  ⇔  m·p_int ≤ 1e5·α10·i
      .withColumn("below",
        col("p_int") * col("m") <= lit(100000L * alpha10) * col("rk"))
    val crit = ranked.agg(
      coalesce(max(when(col("below"), col("rk"))), lit(0L)).as("crit"))
    ranked.crossJoin(broadcast(crit))
      .select(col("n_name").as("nation"), col("n1").as("n_orders"),
        col("k1").as("n_high"), fl6(col("zs")).as("z"), col("p6").as("p_approx"),
        col("rk").cast("long").as("p_rank"),
        (col("rk") <= col("crit")).as("discovered"))
      .orderBy("p_rank")
  }

  /** §2.2 #388 — RANDOMIZATION (permutation) TEST for the BUILDING vs
    * MACHINERY mean-order-price difference: `nPerm` deterministic 50/50
    * re-labelings of the pooled sample, p = (#{|d_b| ≥ |d_obs|} + 1) /
    * (B + 1) — the assumption-free companion to Welch (#227): no normality,
    * no variance model, just exchangeability under H₀. Runs as the #206
    * bootstrap shape: ONE hash per 16 replicates (4-hex sha slices, '8000'
    * lexicographic midpoint = fair coin), assignment resolved per
    * (replicate, side) by partial-aggregated integer-cent sums, so the
    * scan fans out ⌈B/16⌉× and the shuffle carries 2·B·partitions rows —
    * scan-dominated and embarrassingly parallel at 100 TB.
    *
    * Determinism: per-replicate sums are exact decimals; each d_b is IEEE
    * on exact values (bit-identical both engines), so the |d_b| ≥ |d_obs|
    * count — and therefore p — cannot flip on an ulp between engines.
    */
  def permutationTest(spark: SparkSession, dir: String, nPerm: Int = 96,
      segA: String = "BUILDING", segB: String = "MACHINERY"): DataFrame = {
    val dec0 = DecimalType(38, 0)
    val cust = t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    // Spread the pruned orders scan BEFORE the broadcast join + ×⌈B/16⌉
    // explode (guide §2.5): the hash fan-out is map-side and a sub-split
    // local file would run it on one core. No-op at scale.
    val base = Par.spread(t(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin(segA, segB))
      .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
        expr("CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT)").as("xc"))
    val obs = base.agg(
      sum(when(col("seg") === segA, 1L).otherwise(0L)).as("na_o"),
      sum(when(col("seg") === segB, 1L).otherwise(0L)).as("nb_o"),
      sum(when(col("seg") === segA, col("xc")).otherwise(0L).cast(dec0)).as("sa_o"),
      sum(when(col("seg") === segB, col("xc")).otherwise(0L).cast(dec0)).as("sb_o"))
      .withColumn("d_obs",
        col("sa_o").cast("double") / (col("na_o").cast("double") * 100.0) -
        col("sb_o").cast("double") / (col("nb_o").cast("double") * 100.0))
    val nGroups = (nPerm + 15) / 16
    val perms = base
      .select(col("o_orderkey"), col("xc"),
        explode(sequence(lit(0), lit(nGroups - 1))).as("grp"))
      .withColumn("h", sha2(concat(col("o_orderkey").cast("string"), lit("|"),
        col("grp").cast("string")), 256))
      .select(col("xc"), col("grp"), col("h"),
        explode(sequence(lit(0), lit(15))).as("slot"))
      .withColumn("rep", col("grp") * 16 + col("slot") + 1)
      .where(col("rep") <= nPerm)
      .withColumn("toA", expr("substring(h, slot * 4 + 1, 4)") < lit("8000"))
      .groupBy("rep")
      .agg(sum(when(col("toA"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("toA"), 1L).otherwise(0L)).as("nb"),
        sum(when(col("toA"), col("xc")).otherwise(0L).cast(dec0)).as("sa"),
        sum(when(!col("toA"), col("xc")).otherwise(0L).cast(dec0)).as("sb"))
      .withColumn("d_b",
        col("sa").cast("double") / (col("na").cast("double") * 100.0) -
        col("sb").cast("double") / (col("nb").cast("double") * 100.0))
    perms.crossJoin(broadcast(obs))
      .agg(max("na_o").as("n_a"), max("nb_o").as("n_b"),
        count(lit(1)).as("n_perm"),
        sum(when(abs(col("d_b")) >= abs(col("d_obs")), 1L).otherwise(0L))
          .as("n_extreme"),
        max("d_obs").as("d_obs_raw"))
      .select(col("n_a"), col("n_b"), fl6(col("d_obs_raw")).as("d_obs"),
        col("n_perm"), col("n_extreme"),
        fl6((col("n_extreme") + lit(1)).cast("double") /
          (col("n_perm") + lit(1)).cast("double")).as("p_perm"))
  }
}
