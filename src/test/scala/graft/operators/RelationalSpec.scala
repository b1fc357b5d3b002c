package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class RelationalSpec extends AnyFunSuite with SparkFixture {

  test("aggQ1 has the six returnflag x linestatus groups and exact counts") {
    val rows = Relational.aggQ1(spark, sf).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.load(spark, sf, "lineitem").count())
    // exact sum check vs an independent computation
    val sumQty = rows.map(_.getAs[Double]("sum_qty")).sum
    val expected = Tables.load(spark, sf, "lineitem")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).collect()(0).getDouble(0)
    assert(sumQty == expected)
  }

  test("topN returns exactly 10 rows in strictly non-increasing price order") {
    val rows = Relational.topN(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("window row_number restarts at 1 per user and lag aligns with previous value") {
    val rows = Relational.windowFuncs(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { evs =>
      val sorted = evs.sortBy(_.getAs[Long]("event_id"))
      assert(sorted.head.getAs[Int]("rn") == 1)
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur.getAs[Double]("prev_value") == prev.getAs[Double]("value"))
        case _ =>
      }
    }
  }

  test("setOps tags partition nations correctly") {
    val rows = Relational.setOps(spark, sf).collect()
    val both = rows.filter(_.getAs[String]("tag") == "both").map(_.getString(0)).toSet
    val custOnly = rows.filter(_.getAs[String]("tag") == "cust_only").map(_.getString(0)).toSet
    assert(both.intersect(custOnly).isEmpty)
    // suppliers exist in 'both' nations only
    val suppNations = Tables.load(spark, sf, "supplier")
      .join(Tables.load(spark, sf, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select("n_name").distinct().collect().map(_.getString(0)).toSet
    assert(both.subsetOf(suppNations))
  }

  test("rollup contains the grand-total row equal to the table size") {
    val rows = Relational.rollupAgg(spark, sf).collect()
    val grand = rows.find(r => r.getString(0) == "*" && r.getString(1) == "*").get
    assert(grand.getAs[Long]("n_rows") == Tables.load(spark, sf, "lineitem").count())
  }

  test("semi and anti joins partition the left side") {
    val nCust = Tables.load(spark, sf, "customer").count()
    val semi = Relational.semiJoin(spark, sf).count()
    assert(semi <= nCust && semi > 0)
    val nPart = Tables.load(spark, sf, "part").count()
    val anti = Relational.antiJoin(spark, sf).count()
    val sold = Tables.load(spark, sf, "part").join(
      Tables.load(spark, sf, "lineitem").where(col("l_discount") >= 0.09),
      col("p_partkey") === col("l_partkey"), "left_semi").count()
    assert(anti + sold == nPart)
  }

  test("filterPushdown plan pushes predicates and prunes columns at the scan") {
    val plan = Relational.filterPushdown(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull"))
    // Scan must not read money columns we did not select/filter on.
    assert(!plan.contains("l_tax"))
  }

  test("joinBroadcast compiles to a broadcast hash join, not a shuffle join") {
    val plan = Relational.joinBroadcast(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("asofJoin picks the latest view at-or-before each click, per user") {
    val events = graft.sources.Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime * 1000
        + r.getTimestamp(2).getNanos / 1000 % 1000, r.getString(3), r.getDouble(4)))
    val views = events.filter(_._4 == "view")
    val clicks = events.filter(_._4 == "click")
    val expected = clicks.map { c =>
      val before = views.filter(v =>
        v._2 == c._2 && (v._3 < c._3 || (v._3 == c._3 && v._1 < c._1)))
      val best = if (before.isEmpty) None
        else Some(before.maxBy(v => (v._3, v._1)))
      c._1 -> best.map(v => (v._1, v._5))
    }.toMap
    val got = Relational.asofJoin(spark, sf).collect()
    assert(got.length == clicks.length)
    got.foreach { r =>
      val want = expected(r.getLong(0))
      val gotV = if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))
      assert(gotV == want, s"click ${r.getLong(0)}: got $gotV want $want")
    }
  }

  test("hot-key salted join equals the plain join and replicates only hot keys") {
    val plain = graft.sources.Tables.load(spark, sf, "lineitem")
      .join(graft.sources.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Relational.joinSalted(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("sessionizeBatch matches a driver-side brute-force sessionization") {
    val gapUs = 30L * 60 * 1000000
    val events = graft.sources.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) as t_us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // Brute force: per user, sort by (t_us, event_id), split on gap > 30 min.
    val expected = events.groupBy(_._1).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e._3 - acc.head.head._3 > gapUs) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (ss, i) =>
        (uid, i + 1L) -> ((ss.length.toLong, ss.map(_._3).min, ss.map(_._3).max,
          BigDecimal(ss.map(e => BigDecimal(e._4)).sum.toDouble)))
      }
    }.toMap
    val got = Relational.sessionizeBatch(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val want = expected((r.getLong(0), r.getLong(1)))
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((want._1, want._2, want._3)),
        s"user ${r.getLong(0)} session ${r.getLong(1)}")
      assert(math.abs(r.getDouble(5) - want._4.toDouble) < 1e-6)
    }
  }

  test("bloomJoin equals the plain join and the bloom pre-filter prunes the probe side") {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.load(spark, sf, "orders")
    val lineitem = graft.sources.Tables.load(spark, sf, "lineitem")
    val sel = orders
      .where(col("o_orderpriority") === "1-URGENT" && year(col("o_orderdate")) === 1997)
      .select("o_orderkey", "o_orderdate")
    val plain = lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(28, 6))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_month").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val got = Relational.bloomJoin(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == plain.toSeq)
    // The runtime filter must actually cut the probe side: rows passing the
    // bloom ≈ matching rows (+ false positives), far below the full scan.
    val bloom = sel.stat.bloomFilter("o_orderkey", math.max(1L, sel.count()), 0.01)
    import org.apache.spark.sql.graftglue.{columnExpr, exprColumn}
    val passed = lineitem.where(exprColumn(graft.functions.BloomMightContain(
      columnExpr(col("l_orderkey")), bloom))).count()
    val total = lineitem.count()
    assert(passed < total / 5, s"bloom passed $passed of $total — no pruning")
  }

  test("transitions match a driver-side brute-force next-event count and rows normalize to 1") {
    val events = graft.sources.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) as t_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._4)
      sorted.zip(sorted.tail)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Relational.transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, n) => assert(got(k)._1 == n, s"pair $k") }
    // Each from_type's probabilities sum to 1 (up to the per-cell rounding).
    got.keys.toSeq.groupBy(_._1).foreach { case (from, ks) =>
      val s = ks.map(got(_)._2).sum
      assert(math.abs(s - 1.0) < 1e-4, s"from $from sums to $s")
    }
  }

  test("bucketized interval join equals the naive range join, without a range-join plan") {
    val got = Relational.intervalJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // Naive BETWEEN-predicate reference (fine at test scale, a per-key
    // cartesian at 100 TB — exactly what the bucketed plan avoids).
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"),
        col("event_type"), col("value"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("u"), col("event_id").as("click_id"), col("t_us").as("c_us"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("u"), col("t_us").as("v_us"), col("value").as("v_value"))
    val want = c.join(v,
        c("u") === v("u") && col("v_us") >= col("c_us") - 3600000000L &&
          col("v_us") < col("c_us"), "left_outer")
      .groupBy(col("click_id"), c("u"))
      .agg(
        sum(when(col("v_us").isNotNull, 1L).otherwise(0L)).as("n_views"),
        coalesce(sum(col("v_value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double"), lit(0.0)).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.sorted == want.sorted)
    // The production plan must be hash-join shaped, not a nested-loop range join.
    val plan = Relational.intervalJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(500))
  }

  test("percentileCont matches a local type-7 quantile computation") {
    def local(q: Double): Map[String, Double] =
      Tables.load(spark, sf, "orders")
        .select("o_orderpriority", "o_totalprice").collect()
        .groupBy(_.getString(0))
        .map { case (g, rows) =>
          val v = rows.map(_.getDouble(1)).sorted
          val pos = (v.length - 1) * q
          val lo = pos.toInt
          val frac = pos - lo
          g -> (if (frac > 0) v(lo) * (1.0 - frac) + v(lo + 1) * frac else v(lo))
        }
    val p50 = local(0.5); val p95 = local(0.95)
    Relational.percentileCont(spark, sf).collect().foreach { r =>
      val g = r.getString(0)
      assert(math.abs(r.getDouble(1) - p50(g)) < 1e-9, s"$g p50")
      assert(math.abs(r.getDouble(2) - p95(g)) < 1e-9, s"$g p95")
    }
  }

  test("slidingWindow assigns every event to exactly window/slide hops") {
    val rows = Relational.slidingWindow(spark, sf).collect()
    val nEvents = Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getLong(1)).sum == 4 * nEvents)
    // Window starts are slide-aligned.
    assert(rows.forall(_.getLong(0) % 900000000L == 0))
  }

  test("dateSpine is gapless month-by-month and fills empty months with zeros") {
    val rows = Relational.dateSpine(spark, sf).collect()
    val months = rows.map(_.getString(0)).toSeq
    // Contiguous: every month between min and max appears exactly once.
    def next(m: String): String = {
      val Array(y, mo) = m.split("-").map(_.toInt)
      if (mo == 12) f"${y + 1}%04d-01" else f"$y%04d-${mo + 1}%02d"
    }
    months.sliding(2).foreach {
      case Seq(a, b) => assert(next(a) == b, s"gap between $a and $b")
      case _ => ()
    }
    // The filter is sparse enough that some months are gap-filled zeros,
    // and zero-count months carry zero revenue.
    val zeros = rows.filter(_.getLong(1) == 0L)
    assert(zeros.nonEmpty)
    zeros.foreach(r => assert(r.getDouble(2) == 0.0))
    // Non-empty months agree with a direct recompute.
    val direct = Tables.load(spark, sf, "orders")
      .where(col("o_totalprice") > 490000.0)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == direct.getOrElse(r.getString(0), 0L)))
  }

  test("funnel stages shrink monotonically and stage 1 matches distinct signup users") {
    val rows = Relational.funnel(spark, sf).collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.map(_.getAs[String]("event_type")).toSeq ==
      Seq("signup", "click", "purchase"))
    val counts = rows.map(_.getAs[Long]("n_users"))
    counts.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "funnel must not grow downstream")
      case _ => ()
    }
    val signups = Tables.load(spark, sf, "events")
      .where(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(counts(0) == signups)
    // Strict ordering claim: every stage-2 user has a click after their
    // first signup (checked independently on collected events).
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().groupBy(_.getAs[Long]("user_id"))
    val expectedS2 = ev.count { case (_, es) =>
      val s = es.filter(_.getString(1) == "signup").map(_.getLong(2))
      val c = es.filter(_.getString(1) == "click").map(_.getLong(2))
      s.nonEmpty && c.exists(_ > s.min)
    }
    assert(counts(1) == expectedS2)
  }

  test("retention offsets start at 0 with full cohort and rates never exceed 1") {
    val rows = Relational.retention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Int]("cohort_wk"))
    byCohort.values.foreach { rs =>
      val zero = rs.filter(_.getAs[Int]("wk_offset") == 0)
      assert(zero.length == 1, "every cohort has an offset-0 row")
      assert(zero.head.getAs[Long]("n_active") == zero.head.getAs[Long]("cohort_n"))
      assert(zero.head.getAs[Double]("retention") == 1.0)
      rs.foreach(r => assert(r.getAs[Double]("retention") <= 1.0))
    }
    // Cohort sizes partition the user base: each user is in exactly one cohort.
    val users = Tables.load(spark, sf, "events").select("user_id").distinct().count()
    assert(byCohort.values.map(_.head.getAs[Long]("cohort_n")).sum == users)
  }

  test("anomalyMad flags exactly the rows beyond 3 MAD of an independent exact median") {
    val flagged = Relational.anomalyMad(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id")).toSet
    // Independent computation in exact BigDecimal arithmetic.
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    def lowerMedian(xs: Seq[BigDecimal]): BigDecimal = {
      val s = xs.sorted
      s((math.ceil(s.size * 0.5) - 1).toInt)
    }
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val med = lowerMedian(es.map(_._3).toSeq)
      val devs = es.map { case (id, _, v) => (id, (v - med).abs) }
      val mad = lowerMedian(devs.map(_._2).toSeq)
      devs.filter(_._2 > mad * 3).map(_._1).toSeq
    }.toSet
    assert(flagged == expected)
    assert(flagged.nonEmpty)
  }

  test("attribution credits each purchase to the latest strictly-preceding click") {
    val rows = Relational.attribution(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t")).collect()
    val purchases = ev.filter(_.getString(2) == "purchase")
    assert(rows.length == purchases.length, "one row per purchase")
    val clicksByUser = ev.filter(_.getString(2) == "click")
      .groupBy(_.getAs[Long]("user_id"))
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    purchases.foreach { p =>
      val r = byId(p.getAs[Long]("event_id"))
      import scala.math.Ordering.Implicits._
      val pKey = (p.getAs[Long]("t"), p.getAs[Long]("event_id"))
      val want: Option[org.apache.spark.sql.Row] =
        clicksByUser.getOrElse(p.getAs[Long]("user_id"),
            Array.empty[org.apache.spark.sql.Row])
          .filter(c => (c.getAs[Long]("t"), c.getAs[Long]("event_id")) < pKey)
          .sortBy(c => (c.getAs[Long]("t"), c.getAs[Long]("event_id")))
          .lastOption
      want match {
        case Some(c) =>
          assert(r.getAs[Long]("attr_click") == c.getAs[Long]("event_id"))
          assert(r.getAs[Long]("latency_us") ==
            p.getAs[Long]("t") - c.getAs[Long]("t"))
        case None =>
          assert(r.isNullAt(r.fieldIndex("attr_click")), "direct purchase")
      }
    }
  }

  test("variantProps schema-on-read extraction agrees with a local JSON parse") {
    val rows = Relational.variantProps(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select("event_type", "props").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val kRe = """"k"\s*:\s*(-?\d+)""".r
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    rows.foreach { r =>
      val ks = byType(r.getAs[String]("event_type"))
        .map(e => kRe.findFirstMatchIn(e._2).map(_.group(1).toLong))
      assert(r.getAs[Long]("n") == ks.length)
      assert(r.getAs[Long]("sum_k") == ks.flatten.sum)
      assert(r.getAs[Long]("n_distinct_k") == ks.flatten.distinct.length)
      // try_variant_get on a path no payload has: null for every row.
      assert(r.getAs[Long]("n_absent_hits") == 0L)
    }
  }

  test("momRevenue deltas agree with consecutive months' exact revenues") {
    val rows = Relational.momRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    val months = rows.map(_.getAs[String]("o_month"))
    assert(months.sorted.toSeq == months.toSeq)
    assert(rows.head.isNullAt(rows.head.fieldIndex("prev_revenue")))
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getAs[Double]("prev_revenue") == prev.getAs[Double]("revenue"))
        val want = (cur.getAs[Double]("revenue") - prev.getAs[Double]("revenue")) /
          prev.getAs[Double]("revenue") * 100.0
        assert(math.abs(cur.getAs[Double]("mom_pct") - BigDecimal(want)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      case _ => ()
    }
    // Revenue rollup is exhaustive: per-month order counts sum to the table.
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.load(spark, sf, "orders").count())
  }

  test("dauMau stickiness is DAU over trailing-30-day actives, bounded by 1") {
    val rows = Relational.dauMau(spark, sf).collect()
    val pres = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { r =>
      val day = r.getAs[String]("day")
      val dau = pres.filter(_._2 == day).map(_._1).distinct.length
      val lo = java.time.LocalDate.parse(day).minusDays(29).toString
      val mau = pres.filter(p => p._2 >= lo && p._2 <= day).map(_._1).distinct.length
      assert(r.getAs[Long]("dau") == dau, s"dau $day")
      assert(r.getAs[Long]("mau") == mau, s"mau $day")
      assert(r.getAs[Double]("stickiness") <= 1.0 + 1e-9)
    }
    assert(rows.map(_.getAs[String]("day")).toSet == pres.map(_._2).toSet)
  }

  test("sessionPaths mines bounded prefixes whose counts cover the session universe") {
    val rows = Relational.sessionPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // Paths are >-joined event types, at most 5 segments.
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      val segs = r.getAs[String]("path").split(">")
      assert(segs.length <= 5 && segs.forall(types))
    }
    // Counts are non-increasing (top-k order) and bounded by total sessions.
    val counts = rows.map(_.getAs[Long]("n_sessions"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val nSessions = Relational.sessionizeBatch(spark, sf).count()
    assert(counts.sum <= nSessions)
  }

  test("windowDistinct equals a naive per-day trailing count-distinct") {
    val rows = Relational.windowDistinct(spark, sf).collect()
      .map(r => r.getAs[String]("win_end") -> r.getAs[Long]("n_active")).toMap
    val pres = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = pres.map(_._2).distinct.sorted((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    days.foreach { d =>
      val lo = d.minusDays(6)
      val want = pres.filter { case (_, pd) =>
        !pd.isBefore(lo) && !pd.isAfter(d)
      }.map(_._1).distinct.length
      assert(rows(d.toString) == want, s"window ending $d")
    }
    // Every window end that has any presence appears.
    assert(days.map(_.toString).toSet.subsetOf(rows.keySet))
  }

  test("tpchQ3 matches an independent composite computation with exact revenue") {
    val rows = Relational.tpchQ3(spark, sf).collect()
    assert(rows.length == 10)
    val cust = Tables.load(spark, sf, "customer")
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val ord = Tables.load(spark, sf, "orders")
      .where(col("o_orderdate") < to_date(lit("1995-03-15"))).collect()
      .filter(r => cust(r.getAs[Long]("o_custkey")))
      .map(r => r.getAs[Long]("o_orderkey")).toSet
    val rev = Tables.load(spark, sf, "lineitem")
      .where(col("l_shipdate") > to_date(lit("1995-03-15"))).collect()
      .filter(r => ord(r.getAs[Long]("l_orderkey")))
      .groupBy(_.getAs[Long]("l_orderkey")).view.mapValues { ls =>
        ls.map(l => BigDecimal(l.getAs[Double]("l_extendedprice") *
          (1.0 - l.getAs[Double]("l_discount")))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      }.toMap
    val want = rev.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    assert(rows.map(r => (r.getAs[Long]("o_orderkey"),
      r.getAs[Double]("revenue"))).toSeq == want)
  }

  test("winsorize bounds are exact percentiles and the clipped mean is outlier-insensitive") {
    val rows = Relational.winsorize(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    rows.foreach { r =>
      val vs = ev.filter(_._1 == r.getAs[String]("event_type")).map(_._2).sorted
      def pct(p: Double) = vs((math.ceil(vs.length * p) - 1).toInt)
      assert(r.getAs[Double]("p05") == pct(0.05).toDouble)
      assert(r.getAs[Double]("p95") == pct(0.95).toDouble)
      val p05 = pct(0.05); val p95 = pct(0.95)
      assert(r.getAs[Long]("n_clip_low") == vs.count(_ < p05))
      assert(r.getAs[Long]("n_clip_high") == vs.count(_ > p95))
      val winsor = vs.map(v => v.max(p05).min(p95))
      def mean(xs: Seq[BigDecimal]) =
        BigDecimal(xs.sum.toDouble / xs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("mean_winsor") - mean(winsor)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_raw") - mean(vs)) < 1e-9)
    }
    assert(rows.nonEmpty)
  }

  test("locfFill builds a dense user×day grid where fills equal the last observed close") {
    val rows = Relational.locfFill(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"),
        unix_micros(col("ts")).as("t"), col("event_id"), col("value")).collect()
    val users = ev.map(_.getAs[Long]("user_id")).distinct
    val days = ev.map(_.getAs[String]("day")).distinct.sorted
    // Dense grid: spine spans min..max day for every user.
    assert(rows.length >= users.length * days.length)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.keySet == users.toSet)
    byUser.foreach { case (u, grid) =>
      val sorted = grid.sortBy(_.getAs[String]("day"))
      var lastClose: Option[Double] = None
      sorted.foreach { cell =>
        val day = cell.getAs[String]("day")
        val obs = ev.filter(e => e.getAs[Long]("user_id") == u &&
          e.getAs[String]("day") == day)
        if (obs.nonEmpty) {
          assert(cell.getAs[Boolean]("is_observed"))
          lastClose = Some(obs.maxBy(e =>
            (e.getAs[Long]("t"), e.getAs[Long]("event_id"))).getAs[Double]("value"))
        } else assert(!cell.getAs[Boolean]("is_observed"))
        lastClose match {
          case Some(v) => assert(cell.getAs[Double]("value_filled") == v, s"$u/$day")
          case None => assert(cell.isNullAt(cell.fieldIndex("value_filled")))
        }
      }
    }
  }

  test("abTest arms partition events deterministically and moments match a local recompute") {
    val rows = Relational.abTest(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value"),
        substring(sha2(col("user_id").cast("string"), 256), 1, 1).as("h")).collect()
    rows.foreach { r =>
      val es = ev.filter(_.getString(0) == r.getAs[String]("event_type"))
      val (a, b) = es.partition(_.getString(2) <= "7")
      assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
      def mean(xs: Array[org.apache.spark.sql.Row]) =
        xs.map(e => BigDecimal(e.getDouble(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / xs.length
      assert(math.abs(r.getAs[Double]("mean_a") - mean(a)) < 1e-6)
      assert(math.abs(r.getAs[Double]("mean_b") - mean(b)) < 1e-6)
      // Same-population split: z-scores should be unremarkable.
      assert(math.abs(r.getAs[Double]("z_score")) < 6.0)
    }
    assert(rows.length == ev.map(_.getString(0)).distinct.length)
  }

  test("giniRevenue matches a local Gini computation and lands in [0, 1)") {
    val r = Relational.giniRevenue(spark, sf).collect()(0)
    val xs = Tables.load(spark, sf, "orders")
      .groupBy("o_custkey").agg(sum(col("o_totalprice")).as("x"))
      .collect().map(_.getDouble(1)).sorted
    val n = xs.length
    val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val local = 2.0 * six / (n * xs.sum) - (n + 1.0) / n
    assert(r.getAs[Long]("n_customers") == n)
    assert(math.abs(r.getAs[Double]("gini") - local) < 1e-4)
    assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
  }

  test("benfordDigits covers digits 1-9 with shares summing to 1") {
    val rows = Relational.benfordDigits(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.load(spark, sf, "orders").count())
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    val benford = rows.map(_.getAs[Double]("benford")).sum
    assert(math.abs(benford - 1.0) < 1e-4) // log10 masses sum to 1 exactly
  }

  test("autocorrDaily pairs every consecutive-day revenue and stays in [-1, 1]") {
    val r = Relational.autocorrDaily(spark, sf).collect()(0)
    val days = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d")).distinct()
      .collect().map(_.getDate(0).toLocalDate).sorted
    val expectPairs = days.sliding(2).count {
      case Array(a, b) => a.plusDays(1) == b
      case _ => false
    }
    assert(r.getAs[Long]("n_pairs") == expectPairs)
    val ac = r.getAs[Double]("autocorr_lag1")
    assert(ac >= -1.0 && ac <= 1.0)
  }

  test("churnWeekly: churned <= active, rates in [0,1], last week fully right-censored") {
    val rows = Relational.churnWeekly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, c) = (r.getAs[Long]("n_active"), r.getAs[Long]("n_churned"))
      assert(c >= 0 && c <= a)
      val rate = r.getAs[Double]("churn_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // No week-after data exists for the last week: everyone "churns".
    assert(rows.last.getAs[Double]("churn_rate") == 1.0)
  }

  test("rfmSegments partitions all customers into valid RFM codes") {
    val rows = Relational.rfmSegments(spark, sf).collect()
    val nCust = Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    rows.foreach { r =>
      val seg = r.getAs[Long]("segment")
      val (rq, fq, mq) = ((seg / 100).toInt, ((seg / 10) % 10).toInt, (seg % 10).toInt)
      assert(Seq(rq, fq, mq).forall(q => q >= 1 && q <= 4), s"segment $seg")
      assert(r.getAs[Double]("revenue") > 0.0)
    }
  }

  test("tpchQ5 matches a local recomputation of the 6-table join") {
    val rows = Relational.tpchQ5(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // Independent computation via one flat SQL join in a fresh local plan.
    Seq("nation", "region", "supplier", "customer", "orders", "lineitem")
      .foreach(n => Tables.load(spark, sf, n).createOrReplaceTempView(n))
    val local = spark.sql(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem, orders, customer, supplier, nation, region
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.toSeq == local.toSeq)
    assert(rows.nonEmpty)
    // Revenue strictly ordered descending (with name tie-break).
    assert(rows.map(-_._2).toSeq == rows.map(-_._2).sorted.toSeq)
  }

  test("userOverlap reports every type pair with set-exact Jaccard") {
    val rows = Relational.userOverlap(spark, sf).collect()
    val sets = Tables.load(spark, sf, "events")
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val types = sets.keys.toSeq.sorted
    assert(rows.length == types.combinations(2).size)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val (sa, sb) = (sets(a), sets(b))
      assert(r.getAs[Long]("n_a") == sa.size && r.getAs[Long]("n_b") == sb.size)
      val both = (sa & sb).size
      assert(r.getAs[Long]("n_both") == both)
      val j = BigDecimal(both.toDouble / (sa.size + sb.size - both))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("jaccard") == j)
    }
  }

  test("hourProfile covers every event once and shares sum to 1 per type") {
    val rows = Relational.hourProfile(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.load(spark, sf, "events").count())
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val s = rs.map(_.getAs[Double]("share_of_type")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"type $et shares sum to $s")
      assert(rs.map(_.getAs[Int]("hour")).forall(h => h >= 0 && h <= 23))
    }
  }

  test("lagFeatures carries each user's prior values in event-time order") {
    val rows = Relational.lagFeatures(spark, sf).collect()
    assert(rows.length == Tables.load(spark, sf, "events").count())
    val byUser = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._3, e._2)).map(e => (e._2, e._4)).toSeq).toMap
    rows.foreach { r =>
      val (u, e) = (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))
      val seq = byUser(u)
      val i = seq.indexWhere(_._1 == e)
      assert(r.getAs[Long]("n_prior") == i)
      def lagAt(k: Int): Option[Double] = if (i - k >= 0) Some(seq(i - k)._2) else None
      Seq(1, 2, 3).foreach { k =>
        val got = Option(r.getAs[java.lang.Double](s"v_lag$k")).map(_.doubleValue())
        assert(got == lagAt(k), s"user $u event $e lag $k")
      }
    }
  }

  test("tpchQ18 returns exactly the orders above the quantity threshold") {
    val rows = Relational.tpchQ18(spark, sf, minQty = 300.0).collect()
    val truth = Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("s"))
      .where(col("s") > 300.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.length == math.min(truth.size, 100))
    rows.foreach { r =>
      val ok = r.getAs[Long]("o_orderkey")
      assert(truth.contains(ok))
      assert(math.abs(r.getAs[Double]("sum_qty") - truth(ok)) < 1e-9)
    }
    val qtys = rows.map(-_.getAs[Double]("sum_qty"))
    assert(qtys.toSeq == qtys.sorted.toSeq, "descending by sum_qty")
  }

  test("activitySpan: active days never exceed span, span brackets all events") {
    val rows = Relational.activitySpan(spark, sf).collect()
    assert(rows.length == Tables.load(spark, sf, "events")
      .select("user_id").distinct().count())
    rows.foreach { r =>
      val (days, span) = (r.getAs[Long]("n_active_days"), r.getAs[Long]("span_days"))
      assert(days >= 1 && days <= span)
      assert(r.getAs[Long]("n_events") >= days)
      assert(r.getAs[String]("first_day") <= r.getAs[String]("last_day"))
    }
  }

  test("intervalAntiJoin flags exactly the views with no purchase in-window") {
    val rows = Relational.intervalAntiJoin(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS t", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val purchases = ev.filter(_._3 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val views = ev.filter(_._3 == "view")
    val localAbandoned = views.count { case (u, t, _) =>
      !purchases.getOrElse(u, Array.empty[Long])
        .exists(p => p >= t && p < t + 3600000000L)
    }
    assert(rows.map(_.getAs[Long]("n_views")).sum == views.length)
    assert(rows.map(_.getAs[Long]("n_abandoned")).sum == localAbandoned)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_abandoned") <= r.getAs[Long]("n_views"))
    }
  }

  test("orderCadence gaps match a local per-customer computation") {
    val rows = Relational.orderCadence(spark, sf).collect()
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val byCust = orders.groupBy(_._1).view.mapValues { os =>
      val sorted = os.sortBy(o => (o._3.toEpochDay, o._2))
      sorted.sliding(2).collect {
        case Array(a, b) => b._3.toEpochDay - a._3.toEpochDay
      }.toSeq
    }.toMap
    assert(rows.length == byCust.count(_._2.nonEmpty))
    rows.foreach { r =>
      val gaps = byCust(r.getAs[Long]("o_custkey"))
      assert(r.getAs[Long]("n_gaps") == gaps.length)
      assert(r.getAs[Long]("min_gap_days") == gaps.min)
      assert(r.getAs[Long]("max_gap_days") == gaps.max)
      val mean = BigDecimal(gaps.sum) / gaps.length
      assert(math.abs(r.getAs[Double]("avg_gap_days") -
        mean.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("tpchQ6 equals the unfiltered-aggregate recomputation of its slice") {
    val r = Relational.tpchQ6(spark, sf).collect()(0)
    val slice = Tables.load(spark, sf, "lineitem").collect().filter { row =>
      val sd = row.getAs[Any]("l_shipdate") match {
        case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
        case t: java.time.LocalDateTime => t.toLocalDate
        case t: java.time.Instant =>
          t.atZone(java.time.ZoneOffset.UTC).toLocalDate
      }
      val d = row.getAs[Double]("l_discount")
      !sd.isBefore(java.time.LocalDate.of(1996, 1, 1)) &&
        sd.isBefore(java.time.LocalDate.of(1997, 1, 1)) &&
        d >= 0.05 && d <= 0.07 && row.getAs[Double]("l_quantity") < 24.0
    }
    assert(r.getAs[Long]("n_lines") == slice.length)
    val local = slice.map(row => BigDecimal(
        row.getAs[Double]("l_extendedprice") * row.getAs[Double]("l_discount"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(math.abs(r.getAs[Double]("revenue") - local) < 1e-6)
  }

  test("growthAccounting: statuses partition weekly actives and churn reconciles") {
    val rows = Relational.growthAccounting(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val active = rows.map { case (w, n, r2, rs, _) => w -> (n + r2 + rs) }.toMap
    // Weekly actives from an independent presence count.
    val presence = Tables.load(spark, sf, "events")
      .select(col("user_id"), date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("w"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val localActive = presence.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // Weeks with activity match the independent presence count exactly; the
    // FULL OUTER churn attach (ADVICE r5) also emits churn-only weeks (gap
    // weeks and the week after the final active one) — those must carry
    // zero active mass and strictly positive churn.
    assert(active.filter(_._2 > 0) == localActive)
    rows.filter { case (_, n, r2, rs, _) => n + r2 + rs == 0 }.foreach {
      case (w, _, _, _, ch) =>
        assert(!localActive.contains(w) && ch > 0, s"churn-only week $w")
    }
    // First week has no retained/resurrected/churned; churn(w) =
    // active(w-7) - retained(w) for every later week.
    val sorted = rows.sortBy(_._1)
    assert(sorted.head._3 == 0L && sorted.head._4 == 0L && sorted.head._5 == 0L)
    sorted.sliding(2).foreach {
      case Array((_, _, _, _, _), (w, _, ret, _, ch)) =>
        val prevW = java.time.LocalDate.parse(w).minusDays(7).toString
        assert(ch == localActive(prevW) - ret, s"week $w")
      case _ => ()
    }
  }

  test("listAgg emits each region's nations sorted, comma-joined, with exact counts") {
    val rows = Relational.listAgg(spark, sf).collect()
    assert(rows.length == 5)
    val nations = Tables.load(spark, sf, "nation")
      .join(Tables.load(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).sorted).toMap
    rows.foreach { r =>
      val expect = nations(r.getAs[String]("r_name"))
      assert(r.getAs[Long]("n_nations") == expect.length)
      assert(r.getAs[String]("nations") == expect.mkString(","))
    }
  }

  test("tpchQ15 winners all carry the identical maximum revenue") {
    val rows = Relational.tpchQ15(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "every returned supplier ties at the max")
  }

  test("tpchQ13 distribution covers every customer exactly once") {
    val rows = Relational.tpchQ13(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total == Tables.load(spark, sf, "customer").count())
    // zero-order customers appear iff some customer has no orders
    val nOrderedCust = Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    val zeroRow = rows.find(_.getAs[Long]("c_count") == 0L)
    val nZero = zeroRow.map(_.getAs[Long]("custdist")).getOrElse(0L)
    assert(nZero == Tables.load(spark, sf, "customer").count() - nOrderedCust)
  }

  test("paretoRevenue deciles partition all customers and cum_share ends at 1") {
    val rows = Relational.paretoRevenue(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val nCust = rows.map(_.getAs[Long]("n_cust")).sum
    assert(nCust == Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count())
    assert(rows.last.getAs[Double]("cum_share") == 1.0)
    // concentration: the top decile out-earns the bottom decile
    assert(rows.head.getAs[Double]("revenue") > rows.last.getAs[Double]("revenue"))
    // cumulative share is non-decreasing
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
  }

  test("marketBasket pairs are ordered, above support, and lift-consistent") {
    val rows = Relational.marketBasket(spark, sf).collect()
    assert(rows.nonEmpty)
    val d = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    val nOrders = d.select("l_orderkey").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      val pc = r.getAs[Long]("pair_count")
      assert(pc >= 2)
      val lift = r.getAs[Double]("lift")
      val expect = BigDecimal((pc * nOrders).toDouble /
          (r.getAs[Long]("cnt_a") * r.getAs[Long]("cnt_b")).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(lift == expect)
    }
  }

  test("marketBasket freq broadcast degrades to a shuffle join above the part threshold") {
    // Pin the conf so BroadcastHashJoin in the plan can ONLY come from the
    // operator's own hints (no stats/AQE auto-broadcast), then assert the
    // gate: default = both freq attaches broadcast; forced-large |part|
    // (threshold 0) = both degrade to shuffle joins, values identical.
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val prevThresh = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val default = Relational.marketBasket(spark, sf)
      val forced = Relational.marketBasket(spark, sf, maxBroadcastParts = 0L)
      val d = default.queryExecution.executedPlan.toString
      val f = forced.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(d).size >= 2,
        "default plan must broadcast both freq attaches")
      assert(!f.contains("BroadcastHashJoin"),
        "gated plan must not broadcast the fact-derived freq frame")
      assert(f.contains("SortMergeJoin") || f.contains("ShuffledHashJoin"),
        "gated plan must shuffle-join the freq attaches")
      assert(forced.collect().map(_.toString).toSeq ==
        default.collect().map(_.toString).toSeq)
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("newVsRepeat reconciles to total order count and revenue") {
    val rows = Relational.newVsRepeat(spark, sf).collect()
    val orders = Tables.load(spark, sf, "orders")
    val nOrders = rows.map(r =>
      r.getAs[Long]("n_new_orders") + r.getAs[Long]("n_repeat_orders")).sum
    assert(nOrders == orders.count())
    // every customer contributes at least one "new" order (their first date)
    val nNew = rows.map(_.getAs[Long]("n_new_orders")).sum
    assert(nNew >= orders.select("o_custkey").distinct().count())
  }

  test("tpchQ21 culprits are the unique returning supplier of multi-supplier orders") {
    val rows = Relational.tpchQ21(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent recomputation of one culprit's wait count
    val li = Tables.load(spark, sf, "lineitem")
    val fin = Tables.load(spark, sf, "orders")
      .where(col("o_orderstatus") === "F").select("o_orderkey")
    val perOrder = li.join(fin, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey"))).as("nr"),
        max(when(col("l_returnflag") === "R", col("l_suppkey"))).as("culprit"))
      .where(col("ns") >= 2 && col("nr") === 1)
      .groupBy("culprit").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(perOrder(r.getAs[Long]("s_suppkey")) == r.getAs[Long]("numwait"))
    }
  }

  test("tpchQ4 semi-join counts orders once regardless of matching line count") {
    val rows = Relational.tpchQ4(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("order_count")).sum
    // recompute independently: quarter orders with >=1 returned line
    val o = Tables.load(spark, sf, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
    val r = Tables.load(spark, sf, "lineitem")
      .where(col("l_returnflag") === "R").select("l_orderkey").distinct()
    val expect = o.join(r, col("o_orderkey") === col("l_orderkey")).count()
    assert(total == expect)
  }

  test("funnelTime pair counts equal funnel stage counts; min <= med <= max bound avg") {
    val ft = Relational.funnelTime(spark, sf).collect()
    assert(ft.length == 2)
    val f = Relational.funnel(spark, sf).collect()
      .map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users")).toMap
    val byStep = ft.map(r => r.getAs[String]("step") -> r).toMap
    assert(byStep("signup->click").getAs[Long]("n_users") == f(2))
    assert(byStep("click->purchase").getAs[Long]("n_users") == f(3))
    ft.foreach { r =>
      val mn = r.getAs[Long]("min_us"); val md = r.getAs[Long]("med_us")
      val mx = r.getAs[Long]("max_us"); val av = r.getAs[Double]("avg_us")
      assert(mn > 0 && mn <= md && md <= mx)
      assert(av >= mn && av <= mx)
    }
  }

  test("concurrency equals a brute-force interval sweep per day") {
    val sess = Relational.sessionizeBatch(spark, sf).collect()
      .map(r => (r.getAs[Long]("first_us"), r.getAs[Long]("last_us")))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val byDay = sess.groupBy { case (s, _) =>
      fmt.format(java.time.Instant.ofEpochSecond(s / 1000000L, (s % 1000000L) * 1000)) }
    val got = Relational.concurrency(spark, sf).collect()
    assert(got.map(_.getAs[String]("day")).toSet == byDay.keySet)
    got.foreach { r =>
      val day = r.getAs[String]("day")
      val starts = byDay(day)
      assert(r.getAs[Long]("n_starts") == starts.length.toLong)
      val brute = starts.map { case (t, _) =>
        sess.count { case (a, b) => a <= t && t <= b } }.max
      assert(r.getAs[Long]("peak_concurrent") == brute.toLong)
    }
  }

  test("skyline is exactly the non-dominated set (brute-force dominance)") {
    val parts = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("p_size")))
    def dominated(x: (Long, Double, Int)): Boolean = parts.exists { o =>
      o._2 <= x._2 && o._3 >= x._3 && (o._2 < x._2 || o._3 > x._3) }
    val sky = Relational.skyline(spark, sf).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(sky == parts.filterNot(dominated).map(_._1).toSet)
  }

  test("bootstrapCi brackets the full mean and the hash draw carries Poisson(1) zero-mass") {
    val r = Relational.bootstrapCi(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_boot") == 100L)
    assert(r.getAs[Long]("n_rows") == Tables.load(spark, sf, "orders").count())
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    val m = r.getAs[Double]("mean_full")
    assert(lo < hi && lo <= m && m <= hi)
    // replicate 1 = slot 0 of hash group 0 under the 16-draws-per-hash scheme
    val o = Tables.load(spark, sf, "orders").select(col("o_orderkey"))
    val z = o.withColumn("h4",
        substring(sha2(concat(col("o_orderkey").cast("string"), lit("|0")), 256), 1, 4))
      .where(col("h4") < "5e2d").count()
    assert(math.abs(z.toDouble / o.count() - 0.3679) < 0.05)
  }

  test("quartiles are the exact lower order statistics per segment") {
    val rows = Relational.quartiles(spark, sf).collect()
    val data = Tables.load(spark, sf, "customer")
      .select("c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1)
    assert(rows.map(_.getAs[String]("seg")).toSet == data.keySet)
    rows.foreach { r =>
      val vs = data(r.getAs[String]("seg")).map(_._2).sorted
      assert(r.getAs[Long]("n_rows") == vs.length.toLong)
      def q(p: Double) = vs(math.ceil(vs.length * p).toInt - 1).toDouble
      assert(r.getAs[Double]("p25") == q(0.25))
      assert(r.getAs[Double]("p50") == q(0.5))
      assert(r.getAs[Double]("p75") == q(0.75))
    }
  }

  test("ksTest equals a brute-force two-sample KS computation") {
    val r = Relational.ksTest(spark, sf).collect()(0)
    val rows = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select("c_mktsegment", "o_totalprice").collect()
      .map(x => (x.getString(0), BigDecimal(x.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
    val a = rows.filter(_._1 == "BUILDING").map(_._2).sorted
    val b = rows.filter(_._1 == "MACHINERY").map(_._2).sorted
    assert(r.getAs[Long]("na") == a.length.toLong)
    assert(r.getAs[Long]("nb") == b.length.toLong)
    val pooled = (a ++ b).distinct.sorted
    val dnums = pooled.map { v =>
      val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
      (math.abs(ca * b.length - cb * a.length), v)
    }
    val maxNum = dnums.map(_._1).max
    val expD = BigDecimal(maxNum.toDouble / (a.length.toLong * b.length).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("d_stat") == expD)
    assert(r.getAs[Double]("at_value") ==
      dnums.filter(_._1 == maxNum).map(_._2).min.toDouble)
  }

  test("psi bins cover both periods exactly and terms sum to the reported psi") {
    val rows = Relational.psi(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (1L to 10L))
    val o = Tables.load(spark, sf, "orders").count()
    assert(rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum == o)
    val psis = rows.map(_.getAs[Double]("psi")).distinct
    assert(psis.length == 1 && psis.head >= 0.0)
    // shares are the smoothed ratios
    val ta = rows.map(_.getAs[Long]("n_ref")).sum
    rows.foreach { r =>
      val exp = BigDecimal((r.getAs[Long]("n_ref") + 1.0) / (ta + 10.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("share_ref") == exp)
    }
  }

  test("cusum changepoint equals a local scan over exact daily sums") {
    val r = Relational.cusum(spark, sf).collect()(0)
    val daily = Tables.load(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_totalprice"))
      .collect()
      .map(x => (x.getString(0), BigDecimal(x.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val n = daily.length
    assert(r.getAs[Long]("n_days") == n.toLong)
    val tot = daily.map(_._2).sum
    var pref = BigDecimal(0)
    val devs = daily.zipWithIndex.map { case ((day, rev), i) =>
      pref += rev
      (day, (BigDecimal(n) * pref - BigDecimal(i + 1) * tot).abs)
    }
    val mx = devs.map(_._2).max
    assert(r.getAs[String]("cp_day") == devs.filter(_._2 == mx).map(_._1).min)
    val expDev = BigDecimal((mx / n).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("max_dev") - expDev) < 1e-6)
  }

  test("streaks: islands partition active days and the longest streak is a real run") {
    val rows = Relational.streaks(spark, sf).collect()
    val dayCount = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_active_days")).sum == dayCount)
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_streak") <= r.getAs[Long]("n_active_days"))
      assert(r.getAs[Long]("n_streaks") >= 1L)
    }
    // brute-force one user's streaks from their raw day list
    val uid = rows.head.getAs[Long]("user_id")
    val days = Tables.load(spark, sf, "events")
      .where(col("user_id") === uid)
      .select(to_date(col("ts")).as("day")).distinct()
      .collect().map(_.getDate(0).toLocalDate).sorted
    val runs = days.foldLeft(List.empty[(java.time.LocalDate, Long)]) {
      case (acc @ ((start, len) :: rest), d)
          if start.plusDays(len) == d => (start, len + 1) :: rest
      case (acc, d) => (d, 1L) :: acc
    }.reverse
    val r = rows.find(_.getAs[Long]("user_id") == uid).get
    assert(r.getAs[Long]("n_streaks") == runs.length.toLong)
    val bestLen = runs.map(_._2).max
    assert(r.getAs[Long]("longest_streak") == bestLen)
    assert(r.getAs[String]("longest_start") ==
      runs.filter(_._2 == bestLen).map(_._1).min.toString)
  }

  test("linreg matches the closed-form fit recomputed from raw rows") {
    val rows = Relational.linreg(spark, sf).collect()
    assert(rows.length == 5)
    val seg = rows.head.getAs[String]("segment")
    val raw = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment") === seg)
      .select(datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
        .cast("long"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val n = BigDecimal(raw.length)
    val sx = BigDecimal(raw.map(_._1).sum)
    val sy = raw.map(_._2).sum
    val sxy = raw.map { case (x, y) => BigDecimal(x) * y }.sum
    val sxx = BigDecimal(raw.map(t => t._1 * t._1).sum)
    val slope = ((n * sxy - sx * sy) / (n * sxx - sx * sx)).toDouble
    val r0 = rows.find(_.getAs[String]("segment") == seg).get
    assert(r0.getAs[Long]("n") == raw.length.toLong)
    assert(math.abs(r0.getAs[Double]("slope") - slope) < 1e-5)
    val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    assert(math.abs(r0.getAs[Double]("intercept") - intercept) < 1e-3)
  }

  test("hhi lies in [1/n, 1], dominates top_share^2 and is bounded by top_share") {
    val rows = Relational.hhi(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (h, top, n) = (r.getAs[Double]("hhi"), r.getAs[Double]("top_share"),
        r.getAs[Long]("n_nations"))
      assert(h >= 1.0 / n - 1e-9 && h <= 1.0 + 1e-9)
      assert(h >= top * top - 1e-9)
      assert(h <= top + 1e-9)
    }
  }

  test("seasonality indexes revenue-average to 1 and counts cover all orders") {
    val rows = Relational.seasonality(spark, sf).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.load(spark, sf, "orders").count())
    // each index is that weekday's revenue share against the flat 1/7 baseline
    val tot = rows.map(_.getAs[Double]("revenue")).sum
    rows.foreach { r =>
      val exp = r.getAs[Double]("revenue") / tot * 7
      assert(math.abs(exp - r.getAs[Double]("seas_index")) < 1e-5)
      assert(math.abs(r.getAs[Double]("avg_order") -
        r.getAs[Double]("revenue") / r.getAs[Long]("n_orders")) < 1e-5)
    }
  }

  test("ewma is the dyadic-weighted mean of the trailing 7 spine days") {
    val out = Relational.ewma(spark, sf).collect()
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => (r.getDate(0).toLocalDate, BigDecimal(r.getDecimal(1))))
      .toMap
    val allDays = daily.keys.toSeq.sorted
    val spine = Iterator.iterate(allDays.head)(_.plusDays(1))
      .takeWhile(!_.isAfter(allDays.last)).toVector
    assert(out.length == spine.length - 6)
    val checkIdx = Seq(6, spine.length / 2, spine.length - 1)
    checkIdx.foreach { i =>
      val day = spine(i)
      val num = (0 to 6).map { j =>
        daily.getOrElse(spine(i - j), BigDecimal(0)) * BigDecimal(1L << (6 - j))
      }.sum
      val exp = BigDecimal(num.toDouble / 127.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = out.find(_.getAs[String]("day") == day.toString).get
        .getAs[Double]("ewma")
      assert(math.abs(got - exp) < 1e-6, s"day $day")
    }
  }

  test("latenessProfile buckets synthetic out-of-order arrivals exactly") {
    import java.sql.Timestamp
    val base = 1700000000000000L // us
    // arrival order = event_id; event-times deliberately disordered:
    // id2 arrives 30s late, id4 arrives 20min late (-> le_1h bucket),
    // id5 arrives 2h late
    val rows = Seq(
      (1L, base),
      (2L, base - 30L * 1000000L),
      (3L, base + 60L * 1000000L),
      (4L, base - 20L * 60L * 1000000L + 60L * 1000000L),
      (5L, base - 2L * 3600L * 1000000L),
      (6L, base + 120L * 1000000L))
    val dir = java.nio.file.Files.createTempDirectory("lateness").toString
    val df = spark.createDataFrame(rows.map { case (id, us) =>
      (id, new Timestamp(us / 1000L), 1L, "view", 0.0, "{}")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Relational.latenessProfile(spark, dir).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n_events")).toMap
    assert(out == Map("0_in_order" -> 3L, "1_le_1m" -> 1L,
      "3_le_1h" -> 1L, "4_gt_1h" -> 1L))
    val shares = Relational.latenessProfile(spark, dir).collect()
      .map(_.getAs[Double]("share")).sum
    // shares are individually rounded to 6 decimals, so the sum is 1 ± 4 ulp-of-round
    assert(math.abs(shares - 1.0) < 1e-5)
  }

  private def segCents(segA: String, segB: String): (Array[Long], Array[Long]) = {
    val rows = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin(segA, segB))
      .select("c_mktsegment", "o_totalprice").collect()
      .map(x => (x.getString(0), (BigDecimal(x.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
    (rows.filter(_._1 == segA).map(_._2), rows.filter(_._1 == segB).map(_._2))
  }

  test("welchTtest matches a local BigDecimal recomputation") {
    val r = Relational.welchTtest(spark, sf).collect()(0)
    val (a, b) = segCents("BUILDING", "MACHINERY")
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    def stats(x: Array[Long]): (Double, Double) = {
      val n = x.length
      val s = x.map(BigDecimal(_)).sum
      val q = x.map(v => BigDecimal(v) * BigDecimal(v)).sum
      val va = (BigDecimal(n) * q - s * s).toDouble / (n.toDouble * (n.toDouble - 1.0))
      (s.toDouble / n, va)
    }
    val (ma, va) = stats(a); val (mb, vb) = stats(b)
    val sea = va / a.length; val seb = vb / b.length
    val tExp = (ma - mb) / math.sqrt(sea + seb)
    val dfExp = (sea + seb) * (sea + seb) /
      (sea * sea / (a.length - 1.0) + seb * seb / (b.length - 1.0))
    assert(math.abs(r.getAs[Double]("mean_a") - ma / 100.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("t_stat") - tExp) < 1e-5)
    assert(math.abs(r.getAs[Double]("df") - dfExp) < 1e-3)
  }

  test("mannWhitney U equals the brute-force pairwise count") {
    val r = Relational.mannWhitney(spark, sf).collect()(0)
    val (a, b) = segCents("BUILDING", "MACHINERY")
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    // 2U = #{(x,y): x>y}*2 + #{ties}; brute force over all pairs
    var u2 = 0L
    for (x <- a; y <- b) u2 += (if (x > y) 2L else if (x == y) 1L else 0L)
    assert(r.getAs[Double]("u") == u2.toDouble / 2.0)
    val aucExp = BigDecimal(u2.toDouble / 2.0 / (a.length.toDouble * b.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("auc") == aucExp)
    // z has the right sign and |z| is consistent with u vs its null mean
    val z = r.getAs[Double]("z")
    assert((u2.toDouble / 2.0 > a.length.toDouble * b.length / 2.0) == (z > 0))
  }

  test("spearman matches a local tie-aware rank correlation for one flag") {
    val rows = Relational.spearman(spark, sf).collect()
    val flag = rows.head.getAs[String]("flag")
    val raw = Tables.load(spark, sf, "lineitem")
      .where(col("l_returnflag") === flag)
      .select("l_quantity", "l_discount").collect()
      .map(x => (x.getDouble(0), x.getDouble(1)))
    def r2(vs: Array[Double]): Array[Long] = {
      // doubled tie-average rank per value
      val sorted = vs.sorted
      val minRank = sorted.zipWithIndex.reverse.toMap.map { case (v, i) => v -> (i + 1L) }
      val cnt = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      vs.map(v => 2 * minRank(v) + cnt(v) - 1)
    }
    val rx = r2(raw.map(_._1)); val ry = r2(raw.map(_._2))
    val n = raw.length
    def bd(l: Long) = BigDecimal(l)
    val sx = rx.map(bd).sum; val sy = ry.map(bd).sum
    val sxy = rx.zip(ry).map { case (x, y) => bd(x) * bd(y) }.sum
    val sxx = rx.map(x => bd(x) * bd(x)).sum
    val syy = ry.map(y => bd(y) * bd(y)).sum
    val rho = (BigDecimal(n) * sxy - sx * sy).toDouble /
      math.sqrt((BigDecimal(n) * sxx - sx * sx).toDouble *
        (BigDecimal(n) * syy - sy * sy).toDouble)
    val got = rows.find(_.getAs[String]("flag") == flag).get
    assert(got.getAs[Long]("n") == n.toLong)
    assert(math.abs(got.getAs[Double]("rho") - rho) < 1e-5)
  }

  test("cohortLtv: offset-0 actives equal cohort size and LTV is cumulative") {
    val rows = Relational.cohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    // at offset 0 every cohort member is active (first order defines the cohort)
    rows.filter(_.getAs[Long]("month_offset") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"))
    }
    // cum_ltv is non-decreasing within a cohort
    rows.groupBy(_.getAs[String]("cohort")).foreach { case (_, rs) =>
      val ltvs = rs.sortBy(_.getAs[Long]("month_offset")).map(_.getAs[Double]("cum_ltv"))
      assert(ltvs.zip(ltvs.tail).forall { case (x, y) => y >= x - 1e-9 })
    }
    // total revenue across all cells equals total order revenue
    val tot = rows.map(r => BigDecimal(r.getAs[Double]("revenue"))).sum.toDouble
    val exp = Tables.load(spark, sf, "orders")
      .select(sum(col("o_totalprice").cast(
        org.apache.spark.sql.types.DecimalType(18, 2)))).collect()(0)
      .getDecimal(0).doubleValue
    assert(math.abs(tot - exp) < 1e-4)
  }

  test("abcClass partitions parts, shares sum to 1, and A covers <= 80% + one part") {
    val rows = Relational.abcClass(spark, sf).collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSeq == Seq("A", "B", "C"))
    val nParts = Tables.load(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == nParts)
    val shares = rows.map(_.getAs[Double]("rev_share")).sum
    assert(math.abs(shares - 1.0) < 1e-5)
    val a = rows.find(_.getAs[String]("abc_class") == "A").get
    // A-class revenue is at most 80% of total (boundary part goes to B)
    assert(a.getAs[Double]("rev_share") <= 0.8 + 1e-9)
    val b = rows.find(_.getAs[String]("abc_class") == "B").get
    assert(a.getAs[Double]("rev_share") + b.getAs[Double]("rev_share") <= 0.95 + 1e-9)
  }

  test("rollingCorr matches a local 14-day window recomputation") {
    val rows = Relational.rollingCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.load(spark, sf, "events")
      .where(col("event_type").isin("click", "view"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("xv"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // contiguous spine
    val d0 = daily.map(_._1).min; val d1 = daily.map(_._1).max
    val byDay = daily.map(t => t._1 -> (t._2, t._3)).toMap
    val spine = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).toArray
      .map(d => (d, byDay.getOrElse(d, (0L, 0L))))
    val last = rows.last
    val lastDay = java.time.LocalDate.parse(last.getAs[String]("day"))
    val win = spine.filter { case (d, _) =>
      !d.isAfter(lastDay) && !d.isBefore(lastDay.minusDays(13)) }
    assert(win.length == 14)
    val xs = win.map(_._2._1.toDouble); val ys = win.map(_._2._2.toDouble)
    val n = 14.0
    val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum
    val dd1 = n * xs.map(x => x * x).sum - xs.sum * xs.sum
    val dd2 = n * ys.map(y => y * y).sum - ys.sum * ys.sum
    if (dd1 > 0 && dd2 > 0)
      assert(math.abs(last.getAs[Double]("roll_corr") - num / math.sqrt(dd1 * dd2)) < 1e-5)
    else assert(last.isNullAt(last.fieldIndex("roll_corr")))
  }

  private def segmentCents(seg: String): Array[Long] =
    Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment") === seg)
      .select("o_totalprice").collect()
      .map(x => (BigDecimal(x.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)

  test("outlierIqr fences match a local percentile-disc computation") {
    val rows = Relational.outlierIqr(spark, sf).collect()
    assert(rows.length == 5)
    val r = rows.head
    val seg = r.getAs[String]("seg")
    val v = segmentCents(seg).sorted
    val n = v.length
    def qd(p: Double): Long = v(math.ceil(n * p).toInt - 1)
    val (q1, q3) = (qd(0.25), qd(0.75))
    assert(r.getAs[Long]("n_orders") == n.toLong)
    assert(r.getAs[Double]("q1") == q1 / 100.0)
    assert(r.getAs[Double]("q3") == q3 / 100.0)
    val out = v.count(x => 2 * x < 2 * q1 - 3 * (q3 - q1) ||
      2 * x > 2 * q3 + 3 * (q3 - q1))
    assert(r.getAs[Long]("n_outliers") == out.toLong)
  }

  test("trimmedMean drops exactly n/10 per side and matches a local recompute") {
    val rows = Relational.trimmedMean(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val v = segmentCents(r.getAs[String]("seg")).sorted
      val n = v.length; val k = n / 10
      assert(r.getAs[Long]("n_orders") == n.toLong)
      assert(r.getAs[Long]("n_trimmed_each_side") == k.toLong)
      val mean = v.map(BigDecimal(_)).sum.toDouble / n / 100.0
      val core = v.slice(k, n - k)
      val tm = core.map(BigDecimal(_)).sum.toDouble / core.length / 100.0
      assert(math.abs(r.getAs[Double]("mean") - mean) < 1e-5)
      assert(math.abs(r.getAs[Double]("trimmed_mean") - tm) < 1e-5)
    }
  }

  test("runsTest counts sign runs over daily revenue exactly") {
    val r = Relational.runsTest(spark, sf).collect()(0)
    val daily = Tables.load(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_totalprice"))
      .collect()
      .map(x => (x.getString(0), BigDecimal(x.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val vals = daily.map(_._2).sorted
    val med = vals(math.ceil(vals.length * 0.5).toInt - 1)
    val signs = daily.filter(_._2 != med).map(_._2 > med)
    val n1 = signs.count(identity); val n2 = signs.count(!_)
    val runs = 1 + signs.zip(signs.tail).count { case (a, b) => a != b }
    assert(r.getAs[Long]("n_above") == n1.toLong)
    assert(r.getAs[Long]("n_below") == n2.toLong)
    assert(r.getAs[Long]("n_runs") == runs.toLong)
    val n = (n1 + n2).toDouble
    val mu = 2.0 * n1 * n2 / n + 1.0
    val sig2 = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    assert(math.abs(r.getAs[Double]("expected_runs") - mu) < 1e-5)
    assert(math.abs(r.getAs[Double]("z") - (runs - mu) / math.sqrt(sig2)) < 1e-5)
  }

  test("elasticity matches a local log-log OLS for one brand") {
    val rows = Relational.elasticity(spark, sf).collect()
    assert(rows.length == 25)
    val brand = rows.head.getAs[String]("brand")
    val raw = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .where(col("p_brand") === brand &&
        col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .select("l_extendedprice", "l_quantity").collect()
      .map(x => (math.log(x.getDouble(0) / x.getDouble(1)),
        math.log(x.getDouble(1))))
    val n = raw.length.toDouble
    val sx = raw.map(_._1).sum; val sy = raw.map(_._2).sum
    val sxy = raw.map(t => t._1 * t._2).sum
    val sxx = raw.map(t => t._1 * t._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = rows.find(_.getAs[String]("brand") == brand).get
    assert(r.getAs[Long]("n") == raw.length.toLong)
    assert(math.abs(r.getAs[Double]("elasticity") - slope) < 1e-4)
  }

  test("theil matches a local recomputation and is non-negative") {
    val rows = Relational.theil(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Double]("theil_t") >= -1e-9))
    val seg = rows.head.getAs[String]("seg")
    val cents = Tables.load(spark, sf, "orders")
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment") === seg)
      .select("rev").collect()
      .map(x => (BigDecimal(x.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
    val n = cents.length
    val s = cents.map(BigDecimal(_)).sum.toLongExact
    val t0 = cents.map { x =>
      val ratio = x.toDouble * n / s
      ratio * math.log(ratio)
    }.sum / n
    val r = rows.find(_.getAs[String]("seg") == seg).get
    assert(r.getAs[Long]("n_customers") == n.toLong)
    assert(math.abs(r.getAs[Double]("theil_t") - t0) < 1e-4)
  }

  test("markovSteady follows the exact power-iteration recurrence and conserves mass") {
    val rows = Relational.markovSteady(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("pi")).toMap
    // local recompute of 3 rounds from the raw transitions
    val ev = Tables.load(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val s = g.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val states = (trans.keys.map(_._1) ++ trans.keys.map(_._2)).toSeq.distinct.sorted
    var pi = states.map(_ -> 1.0 / states.length).toMap
    for (_ <- 1 to 3) {
      pi = states.map { j =>
        j -> trans.collect { case ((f, t), nij) if t == j =>
          BigDecimal(pi(f) * (nij.toDouble / rowTot(f)))
            .setScale(18, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      }.toMap
    }
    assert(rows.keySet == states.toSet)
    states.foreach(s => assert(math.abs(rows(s) - pi(s)) < 1e-6, s))
    // chain has every type outgoing at this SF: mass conserved
    assert(math.abs(rows.values.sum - 1.0) < 1e-6)
  }

  test("drawdown finds the exact worst peak-to-trough of cumulative revenue") {
    val r = Relational.drawdown(spark, sf).collect()(0)
    val daily = Tables.load(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_totalprice"))
      .collect()
      .map(x => (x.getString(0), BigDecimal(x.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var cum = BigDecimal(0); var peak = BigDecimal(0)
    var best = (BigDecimal(-1), "", BigDecimal(0), BigDecimal(0))
    daily.foreach { case (day, rev) =>
      cum += rev; peak = peak.max(cum)
      val dd = peak - cum
      if (dd > best._1) best = (dd, day, peak, cum)
    }
    assert(r.getAs[String]("trough_day") == best._2)
    assert(r.getAs[Double]("max_drawdown") == best._1.toDouble)
    assert(r.getAs[Double]("peak_cum_revenue") == best._3.toDouble)
  }

  test("rollingZ matches a local trailing-window z computation") {
    val rows = Relational.rollingZ(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect()
      .map(x => (x.getDate(0).toLocalDate, (BigDecimal(x.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val d0 = daily.keys.min; val d1 = daily.keys.max
    val spine = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => (d, daily.getOrElse(d, 0L))).toArray
    val last = rows.last
    val lastDay = java.time.LocalDate.parse(last.getAs[String]("day"))
    val win = spine.filter { case (d, _) =>
      !d.isAfter(lastDay) && !d.isBefore(lastDay.minusDays(27)) }.map(_._2)
    assert(win.length == 28)
    val n = 28.0
    val sx = win.sum.toDouble
    val varNum = 28.0 * win.map(x => BigDecimal(x) * BigDecimal(x)).sum.toDouble -
      sx * sx
    val z = (win.last - sx / n) / math.sqrt(varNum / (n * (n - 1.0)))
    if (varNum > 0) {
      assert(math.abs(last.getAs[Double]("z") - z) < 1e-5)
      assert(last.getAs[Boolean]("is_anomaly") == (math.abs(z) > 2.0))
    } else assert(last.isNullAt(last.fieldIndex("z")))
  }

  test("decayEngagement halves weight every 7 days against a local recompute") {
    val rows = Relational.decayEngagement(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val anchor = ev.map(_._2).max
    val uid = rows.head.getAs[Long]("user_id")
    val mine = ev.filter(_._1 == uid)
    val score = mine.map { case (_, day, v) =>
      val k = math.min(java.time.temporal.ChronoUnit.DAYS.between(day, anchor) / 7, 40L)
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(1L << (40 - k).toInt)
    }.sum.toDouble / math.pow(2, 40)
    val r = rows.find(_.getAs[Long]("user_id") == uid).get
    assert(r.getAs[Long]("n_events") == mine.length.toLong)
    assert(math.abs(r.getAs[Double]("score") - score) < 1e-5)
    // recency dominance: an event today weighs 2x one from 7-13 days ago
    assert(rows.forall(_.getAs[Double]("score") >= 0.0))
  }

  test("abSrm counts distinct users per arm and flags only real imbalance") {
    val r = Relational.abSrm(spark, sf).collect()(0)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().collect().map(_.getLong(0))
    val na = users.count { u =>
      val h = md.digest(u.toString.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf) <= 7
    }
    val nb = users.length - na
    assert(r.getAs[Long]("n_a") == na.toLong)
    assert(r.getAs[Long]("n_b") == nb.toLong)
    val chi2 = (na - nb).toDouble * (na - nb) / users.length
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-5)
    assert(r.getAs[Boolean]("srm_detected") == (chi2 > 3.841459))
  }

  test("bloomFpr counts only genuine 3-hit false positives") {
    val r = Relational.bloomFpr(spark, sf).collect()(0)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def positions(k: Long): Seq[Long] = {
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (0 until 3).map(h => java.lang.Long.parseLong(hex.substring(8 * h, 8 * h + 8), 16) % 1024)
    }
    val keys = Tables.load(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val members = keys.filter(_ % 2 == 0)
    val probes = keys.filter(_ % 2 != 0)
    val bits = members.flatMap(positions).toSet
    val fp = probes.count(p => positions(p).forall(bits))
    assert(r.getAs[Long]("n_members") == members.length.toLong)
    assert(r.getAs[Long]("n_probes") == probes.length.toLong)
    assert(r.getAs[Long]("bits_set") == bits.size.toLong)
    assert(r.getAs[Long]("n_false_pos") == fp.toLong)
    val load = bits.size.toDouble / 1024
    assert(math.abs(r.getAs[Double]("expected_fpr") - load * load * load) < 1e-5)
  }

  test("watermarkReco percentiles match a local lateness recount") {
    val r = Relational.watermarkReco(spark, sf).collect()(0)
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "ts").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime * 1000L))
      .sortBy(_._1)
    var runMax = Long.MinValue
    val late = ev.map { case (_, t) => runMax = math.max(runMax, t); runMax - t }
    val sorted = late.sorted
    def qd(p: Double): Long = sorted(math.ceil(sorted.length * p).toInt - 1)
    assert(r.getAs[Long]("n_events") == ev.length.toLong)
    assert(r.getAs[Long]("p50_us") == qd(0.5))
    assert(r.getAs[Long]("p95_us") == qd(0.95))
    assert(r.getAs[Long]("p99_us") == qd(0.99))
    assert(r.getAs[Long]("max_us") == sorted.last)
    assert(r.getAs[Long]("watermark_minutes") ==
      math.ceil(qd(0.99).toDouble / 60000000.0).toLong)
  }

  test("modePrice picks the most frequent price with lowest-price tie-break") {
    val rows = Relational.modePrice(spark, sf).collect()
    assert(rows.length == 25)
    val r = rows.head
    val brand = r.getAs[String]("brand")
    val prices = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .where(col("p_brand") === brand)
      .select("l_extendedprice").collect()
      .map(x => (BigDecimal(x.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
    val counts = prices.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(r.getAs[Long]("n_price_points") == counts.size.toLong)
    val best = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
    assert(r.getAs[Long]("mode_count") == best._2)
    assert(r.getAs[Double]("mode_price") == best._1 / 100.0)
  }

  test("xcorrLags: lag 0 equals a direct Pearson over the daily spine") {
    val rows = Relational.xcorrLags(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (0L to 7L))
    val daily = Tables.load(spark, sf, "events")
      .where(col("event_type").isin("click", "purchase"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("xp"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val d0 = daily.map(_._1).min; val d1 = daily.map(_._1).max
    val m = daily.map(t => t._1 -> (t._2, t._3)).toMap
    val spine = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => m.getOrElse(d, (0L, 0L))).toArray
    val xs = spine.map(_._1.toDouble); val ys = spine.map(_._2.toDouble)
    val n = xs.length.toDouble
    val num = n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum
    val den = math.sqrt((n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
      (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
    val r0 = rows.find(_.getAs[Long]("lag") == 0L).get
    assert(r0.getAs[Long]("n") == spine.length.toLong)
    assert(math.abs(r0.getAs[Double]("xcorr") - num / den) < 1e-5)
    // higher lags correlate over n - lag pairs
    rows.foreach(r => assert(r.getAs[Long]("n") ==
      spine.length - r.getAs[Long]("lag")))
  }

  test("hillTail estimates alpha over exactly the top-100 order values") {
    val r = Relational.hillTail(spark, sf).collect()(0)
    val cents = Tables.load(spark, sf, "orders")
      .select("o_totalprice").collect()
      .map(x => (BigDecimal(x.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      .sorted.reverse.take(100)
    val ref = cents.min
    assert(r.getAs[Long]("k") == 100L)
    assert(r.getAs[Double]("ref_value") == ref / 100.0)
    val s = cents.map(x => math.log(x.toDouble / ref)).sum
    assert(math.abs(r.getAs[Double]("hill_alpha") - 100.0 / s) < 1e-4)
    assert(r.getAs[Double]("hill_alpha") > 0.0)
  }

  test("effectiveSample: ESS <= n with equality only for equal weights") {
    val r = Relational.effectiveSample(spark, sf).collect()(0)
    val w = Tables.load(spark, sf, "orders")
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
      .collect().map(x => (BigDecimal(x.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
    assert(r.getAs[Long]("n") == w.length.toLong)
    val sw = w.map(BigDecimal(_)).sum
    val sww = w.map(x => BigDecimal(x) * BigDecimal(x)).sum
    val ess = (sw * sw).toDouble / sww.toDouble
    assert(math.abs(r.getAs[Double]("ess") - ess) < 1e-3)
    assert(r.getAs[Double]("ess") <= r.getAs[Long]("n").toDouble + 1e-9)
    assert(math.abs(r.getAs[Double]("ess_ratio") - ess / w.length) < 1e-6)
  }

  test("gapHazard: hazards are ratios of a conserved at-risk population") {
    val rows = Relational.gapHazard(spark, sf).collect()
    val gaps = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(_._1).values.flatMap { g =>
        val ds = g.map(_._2).toSeq.sorted
        ds.zip(ds.tail).map { case (a, b) => math.min((b - a) / 7, 12L) }
      }.toSeq
    val hist = gaps.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == gaps.length.toLong)
    rows.foreach { r =>
      val wk = r.getAs[Long]("gap_weeks")
      assert(r.getAs[Long]("n_gaps") == hist(wk))
      val atRisk = hist.filter(_._1 >= wk).values.sum
      assert(r.getAs[Long]("at_risk") == atRisk)
      assert(math.abs(r.getAs[Double]("hazard") -
        hist(wk).toDouble / atRisk) < 1e-6)
    }
    // at-risk telescopes: first row covers every gap
    assert(rows.minBy(_.getAs[Long]("gap_weeks")).getAs[Long]("at_risk") ==
      gaps.length.toLong)
  }

  test("weightedMedian: half the quantity sits at or below the reported price") {
    val rows = Relational.weightedMedian(spark, sf).collect()
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0),
        (BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact,
        r.getDouble(2).toLong))
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      val mine = li.filter(_._1 == flag)
      val tw = mine.map(_._3).sum
      assert(r.getAs[Long]("total_weight") == tw)
      val med = (r.getAs[Double]("weighted_median_price") * 100).round
      val below = mine.filter(_._2 <= med).map(_._3).sum
      val strictlyBelow = mine.filter(_._2 < med).map(_._3).sum
      // med is the smallest price whose cumulative weight reaches half
      assert(2 * below >= tw)
      assert(2 * strictlyBelow < tw)
    }
  }

  test("kendallTau equals a brute-force pair orientation count for one flag") {
    val rows = Relational.kendallTau(spark, sf).collect()
    val flag = rows.head.getAs[String]("flag")
    val pts = Tables.load(spark, sf, "lineitem")
      .where(col("l_returnflag") === flag)
      .select("l_quantity", "l_discount").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    var c = 0L; var d = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val sx = math.signum(pts(j)._1 - pts(i)._1)
      val sy = math.signum(pts(j)._2 - pts(i)._2)
      if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
    }
    val n = pts.length.toLong
    def ties(vs: Array[Double]): Long =
      vs.groupBy(identity).values.map(g => g.length.toLong * (g.length - 1)).sum
    val n02 = n * (n - 1)
    val tau = 2.0 * (c - d) /
      math.sqrt((n02 - ties(pts.map(_._1))).toDouble *
        (n02 - ties(pts.map(_._2))).toDouble)
    val r = rows.find(_.getAs[String]("flag") == flag).get
    assert(r.getAs[Long]("n") == n)
    assert(math.abs(r.getAs[Double]("tau_b") - tau) < 1e-5)
  }

  test("partialCorr removes the controlled channel (matches local algebra)") {
    val rows = Relational.partialCorr(spark, sf).collect()
    assert(rows.length == 3)
    val flag = rows.head.getAs[String]("flag")
    val raw = Tables.load(spark, sf, "lineitem")
      .where(col("l_returnflag") === flag)
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getDouble(0),
        (BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toDouble,
        (BigDecimal(r.getDouble(2)).setScale(3,
          BigDecimal.RoundingMode.HALF_UP) * 1000).toDouble))
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map(p => p._1 * p._2).sum
      (n * sab - sa * sb) / math.sqrt(
        (n * a.map(x => x * x).sum - sa * sa) *
          (n * b.map(x => x * x).sum - sb * sb))
    }
    val (xs, ys, zs) = (raw.map(_._1), raw.map(_._2), raw.map(_._3))
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val part = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    val r = rows.find(_.getAs[String]("flag") == flag).get
    assert(math.abs(r.getAs[Double]("r_xy") - rxy) < 1e-4)
    assert(math.abs(r.getAs[Double]("r_xy_given_z") - part) < 1e-4)
  }

  test("moodMedian splits both segments at the exact pooled median") {
    val r = Relational.moodMedian(spark, sf).collect()(0)
    val (a, b) = segCents("BUILDING", "MACHINERY")
    val pooled = (a ++ b).sorted
    val med = pooled(math.ceil(pooled.length * 0.5).toInt - 1)
    assert(r.getAs[Long]("n_a_above") == a.count(_ > med).toLong)
    assert(r.getAs[Long]("n_a_below") == a.count(_ <= med).toLong)
    assert(r.getAs[Long]("n_b_above") == b.count(_ > med).toLong)
    assert(r.getAs[Long]("n_b_below") == b.count(_ <= med).toLong)
    val (aa, bb, cc, dd) = (a.count(_ > med).toDouble, a.count(_ <= med).toDouble,
      b.count(_ > med).toDouble, b.count(_ <= med).toDouble)
    val chi2 = (aa + bb + cc + dd) * (aa * dd - bb * cc) * (aa * dd - bb * cc) /
      ((aa + bb) * (cc + dd) * (aa + cc) * (bb + dd))
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-5)
  }

  test("mcnemar counts discordant user-days exactly and they are nonzero") {
    val r = Relational.mcnemar(spark, sf).collect()(0)
    val ud = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .collect().map(x => ((x.getLong(0), x.getDate(1)), x.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val b = ud.values.count(s => s("click") && !s("purchase")).toLong
    val c = ud.values.count(s => !s("click") && s("purchase")).toLong
    assert(b + c > 0)
    assert(r.getAs[Long]("click_only") == b)
    assert(r.getAs[Long]("purchase_only") == c)
    assert(r.getAs[Long]("n_both") ==
      ud.values.count(s => s("click") && s("purchase")).toLong)
    val chi2 = (b - c).toDouble * (b - c) / (b + c)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-5)
  }

  test("acf lag-7 shows the weekly cadence and lag-1 matches local Pearson") {
    val rows = Relational.acf(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (1L to 14L))
    val daily = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect()
      .map(x => (x.getDate(0).toLocalDate, (BigDecimal(x.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val d0 = daily.keys.min; val d1 = daily.keys.max
    val spine = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => daily.getOrElse(d, 0L).toDouble).toArray
    def acfL(l: Int): Double = {
      val x = spine.dropRight(l); val y = spine.drop(l)
      val n = x.length.toDouble
      val num = n * x.zip(y).map(p => p._1 * p._2).sum - x.sum * y.sum
      num / math.sqrt((n * x.map(v => v * v).sum - x.sum * x.sum) *
        (n * y.map(v => v * v).sum - y.sum * y.sum))
    }
    val r1 = rows.find(_.getAs[Long]("lag") == 1L).get
    assert(r1.getAs[Long]("n") == spine.length - 1L)
    assert(math.abs(r1.getAs[Double]("acf") - acfL(1)) < 1e-5)
    val r7 = rows.find(_.getAs[Long]("lag") == 7L).get
    assert(math.abs(r7.getAs[Double]("acf") - acfL(7)) < 1e-5)
  }

  test("leadTime percentiles match a local order-to-first-ship recount") {
    val rows = Relational.leadTime(spark, sf).collect()
    assert(rows.length == 5)
    val firstShip = Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(min(to_date(col("l_shipdate"))).as("fs"))
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    val byPrio = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("od")).collect()
      .flatMap { r =>
        firstShip.get(r.getLong(0)).map(fs =>
          (r.getString(1),
            java.time.temporal.ChronoUnit.DAYS.between(
              r.getDate(2).toLocalDate, fs)))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val days = byPrio(r.getAs[String]("priority"))
      def qd(p: Double): Long = days(math.ceil(days.length * p).toInt - 1)
      assert(r.getAs[Long]("n_orders") == days.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_days") -
        days.sum.toDouble / days.length) < 1e-5)
      assert(r.getAs[Long]("p50_days") == qd(0.5))
      assert(r.getAs[Long]("p95_days") == qd(0.95))
    }
  }

  test("moments match a local power-sum computation per priority") {
    val rows = Relational.moments(spark, sf).collect()
    val cents = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    assert(rows.length == cents.size)
    rows.foreach { r =>
      val xs = cents(r.getAs[String]("priority"))
      val n = xs.length.toDouble
      val m1 = xs.sum / n
      val m2 = xs.map(x => (x - m1) * (x - m1)).sum / n
      val m3 = xs.map(x => math.pow(x - m1, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - m1, 4)).sum / n
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("mean") - m1 / 100.0) < 1e-4)
      assert(math.abs(r.getAs[Double]("sd") - math.sqrt(m2) / 100.0) < 1e-2)
      assert(math.abs(r.getAs[Double]("skewness") -
        m3 / (m2 * math.sqrt(m2))) < 1e-4)
      assert(math.abs(r.getAs[Double]("kurtosis_excess") -
        (m4 / (m2 * m2) - 3.0)) < 1e-4)
    }
  }

  test("kruskalWallis H equals a local tie-aware rank computation") {
    val r = Relational.kruskalWallis(spark, sf).collect()(0)
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val seg = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val data = o.map { case (ck, yc) => (seg(ck), yc) }
    val n = data.length
    // tie-average ranks
    val byVal = data.map(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val sortedVals = byVal.keys.toArray.sorted
    val rankOf = scala.collection.mutable.Map.empty[Long, Double]
    var below = 0L
    sortedVals.foreach { v =>
      val t = byVal(v)
      rankOf(v) = below + (t + 1) / 2.0
      below += t
    }
    val groups = data.groupBy(_._1)
    val term = groups.values.map { g =>
      val rsum = g.map(x => rankOf(x._2)).sum
      rsum * rsum / g.length
    }.sum
    val h = 12.0 / (n * (n + 1.0)) * term - 3.0 * (n + 1.0)
    val ties = byVal.values.map(t => t.toDouble * t * t - t).sum
    val hc = h / (1.0 - ties / (n.toDouble * n * n - n))
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("k_groups") == groups.size.toLong)
    assert(math.abs(r.getAs[Double]("h") - h) < 1e-4)
    assert(math.abs(r.getAs[Double]("h_tie_corrected") - hc) < 1e-4)
    assert(r.getAs[Long]("df") == groups.size.toLong - 1)
  }

  test("kmSurvival is a non-increasing curve with consistent risk sets") {
    val rows = Relational.kmSurvival(spark, sf).collect()
    assert(rows.nonEmpty)
    // survival strictly within (0, 1], non-increasing over gap days
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 })
    // risk sets: n_risk is non-increasing and drops by at least the events
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a })
    // total observations: events + censored across ALL days equals
    // the number of orders (every order yields a gap or a censored tail)
    val nOrders = Tables.load(spark, sf, "orders").count()
    // recompute the full histogram locally for the conservation check
    val byCust = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate"))).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val horizon = byCust.map(_._2).max
    var events = 0L; var censored = 0L
    byCust.groupBy(_._1).values.foreach { os =>
      val ds = os.map(_._2).sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      ds.sliding(2).foreach {
        case Array(a, b) => events += 1
        case _ => ()
      }
      censored += 1
    }
    assert(events + censored == nOrders)
    // the engine's KM at the first event day matches 1 - d1/n1 locally
    val first = rows.head
    val expected = 1.0 -
      first.getAs[Long]("d_events").toDouble / first.getAs[Long]("n_risk")
    assert(math.abs(first.getAs[Double]("survival") - expected) < 1e-6 ||
      first.getAs[Long]("d_events") == first.getAs[Long]("n_risk"))
  }

  test("theilSen equals the local median of pairwise slopes") {
    val r = Relational.theilSen(spark, sf).collect()(0)
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
      .orderBy("day").collect().map(_.getAs[Long]("yc"))
    val slopes = for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j) - daily(i)).toDouble / (j - i)
    val sortedS = slopes.sorted
    val med = sortedS((slopes.length + 1) / 2 - 1)
    assert(r.getAs[Long]("n_days") == daily.length.toLong)
    assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
    assert(math.abs(r.getAs[Double]("slope_per_day") - med / 100.0) < 1e-4)
    // intercept: median residual at the chosen slope
    val resid = daily.zipWithIndex
      .map { case (yc, i) => yc - med * (i + 1) }.sorted
    val medR = resid((daily.length + 1) / 2 - 1)
    assert(math.abs(r.getAs[Double]("intercept") - medR / 100.0) < 1e-2)
  }

  private def segValuesCents: Map[String, Array[Long]] = {
    val custSeg = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map(r => custSeg(r.getLong(0)) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  private def fOneWay(groups: Map[String, Array[Long]]): (Double, Double) = {
    val n = groups.values.map(_.length).sum.toDouble
    val k = groups.size.toDouble
    val s = groups.values.map(_.map(BigInt(_)).sum).sum
    val q = groups.values.map(_.map(x => BigInt(x) * BigInt(x)).sum).sum
    val terms = groups.values.map { g =>
      val sg = g.map(BigInt(_)).sum.toDouble
      sg * sg / g.length
    }.sum
    val ssb = terms - s.toDouble * s.toDouble / n
    val ssw = q.toDouble - terms
    ((ssb / (k - 1)) / (ssw / (n - k)), ssb / (ssb + ssw))
  }

  test("icc matches a local one-way ICC(1,1) recomputation with the k0 correction") {
    val r = Relational.icc(spark, sf).collect()(0)
    val groups = Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"),
        (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(row => row.getInt(0) -> row.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = groups.values.map(_.length).sum.toDouble
    val k = groups.size.toDouble
    val s = groups.values.map(_.map(BigInt(_)).sum).sum
    val q = groups.values.map(_.map(x => BigInt(x) * BigInt(x)).sum).sum
    val terms = groups.values.map { g =>
      val sg = g.map(BigInt(_)).sum.toDouble; sg * sg / g.length
    }.sum
    val msb = (terms - s.toDouble * s.toDouble / n) / (k - 1)
    val msw = (q.toDouble - terms) / (n - k)
    val sn2 = groups.values.map(g => g.length.toLong * g.length).sum.toDouble
    val k0 = (n - sn2 / n) / (k - 1)
    val icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert(r.getAs[Long]("n") == n.toLong && r.getAs[Long]("k_groups") == k.toLong)
    assert(math.abs(r.getAs[Double]("k0") - k0) < 1e-4)
    assert(math.abs(r.getAs[Double]("icc") - icc) < 1e-6)
    // Balance is near-random across nations: ICC sits near 0, inside [-1, 1].
    assert(r.getAs[Double]("icc") >= -1.0 && r.getAs[Double]("icc") <= 1.0)
  }

  test("conformal q-hat is the exact calibration order statistic and test coverage lands near 1 - alpha") {
    val rows = Relational.conformal(spark, sf).collect()
    assert(rows.length == 5)
    // Local replay of one segment: same hash split, same integer residuals.
    val custSeg = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex1(s: String): Char = {
      val d = md.digest(s.getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0)
    }
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map(r => (custSeg(r.getLong(1)), r.getLong(2), hex1(r.getLong(0).toString)))
    rows.foreach { r =>
      val seg = r.getAs[String]("seg")
      val inSeg = orders.filter(_._1 == seg)
      val train = inSeg.filter(_._3 <= '7').map(_._2)
      val (ng, sg) = (train.length.toLong, train.sum)
      val cal = inSeg.filter(o => o._3 > '7' && o._3 <= 'b')
        .map(o => math.abs(o._2 * ng - sg)).sorted
      val rank = (((cal.length + 1) * 9) + 9) / 10
      val qhat = cal(rank.toInt - 1)
      assert(r.getAs[Long]("n_train") == ng && r.getAs[Long]("n_cal") == cal.length)
      assert(math.abs(r.getAs[Double]("qhat_dollars") -
        qhat.toDouble / (ng * 100.0)) < 1e-5, seg)
      val tst = inSeg.filter(_._3 > 'b').map(o => math.abs(o._2 * ng - sg))
      val cov = tst.count(_ <= qhat).toDouble / tst.length
      assert(math.abs(r.getAs[Double]("coverage") - cov) < 1e-6, seg)
      // The conformal guarantee: coverage >= 1 - alpha in expectation;
      // with thousands of test rows it cannot stray far below 0.9.
      assert(r.getAs[Double]("coverage") > 0.85, s"$seg: $cov")
    }
  }

  test("anova F and eta2 match a local exact-sum recomputation") {
    val r = Relational.anova(spark, sf).collect()(0)
    val groups = segValuesCents
    val (f, eta) = fOneWay(groups)
    assert(r.getAs[Long]("n") == groups.values.map(_.length).sum.toLong)
    assert(r.getAs[Long]("k_groups") == groups.size.toLong)
    assert(r.getAs[Long]("df_between") == groups.size - 1L)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-4)
    assert(math.abs(r.getAs[Double]("eta_sq") - eta) < 1e-6)
    assert(r.getAs[Double]("eta_sq") >= 0 && r.getAs[Double]("eta_sq") <= 1)
  }

  test("levene (Brown-Forsythe) W matches a local median-centered recomputation") {
    val r = Relational.levene(spark, sf).collect()(0)
    val groups = segValuesCents
    val centered = groups.map { case (seg, xs) =>
      val sorted = xs.sorted
      // lower median: smallest value whose cumulative count >= ceil(n/2)
      val med = sorted((xs.length + 1) / 2 - 1)
      seg -> xs.map(x => math.abs(x - med))
    }
    val (w, _) = fOneWay(centered)
    assert(r.getAs[Long]("n") == groups.values.map(_.length).sum.toLong)
    assert(math.abs(r.getAs[Double]("w_stat") - w) < 1e-4)
    assert(r.getAs[Double]("w_stat") >= 0)
  }

  test("tukey q statistics match a local Tukey-Kramer recomputation") {
    val rows = Relational.tukey(spark, sf).collect()
    val groups = segValuesCents
    val k = groups.size
    assert(rows.length == k * (k - 1) / 2)
    val n = groups.values.map(_.length).sum.toDouble
    val ssw = groups.values.map { g =>
      val sg = g.map(BigInt(_)).sum.toDouble
      val qg = g.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      qg - sg * sg / g.length
    }.sum
    val msw = ssw / (n - k)
    val means = groups.view.mapValues(g =>
      g.map(BigInt(_)).sum.toDouble / g.length).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("seg_a"), r.getAs[String]("seg_b"))
      assert(a < b)
      val diff = math.abs(means(a) - means(b))
      val q = diff / math.sqrt(msw / 2.0 *
        (1.0 / groups(a).length + 1.0 / groups(b).length))
      assert(math.abs(r.getAs[Double]("mean_diff") - diff / 100.0) < 1e-4)
      assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-4, s"($a,$b)")
    }
  }

  test("ljungBox Q matches a local ACF recomputation at both horizons") {
    val rows = Relational.ljungBox(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("h")).toSeq == Seq(7L, 14L))
    // local daily series on the calendar spine, zero-filled
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate,
        r.getAs[Long]("yc"))).toMap
    val days = daily.keys
    val (mn, mx) = (days.min(Ordering.by((_: java.time.LocalDate).toEpochDay)),
      days.max(Ordering.by((_: java.time.LocalDate).toEpochDay)))
    val ys = Iterator.iterate(mn)(_.plusDays(1)).takeWhile(!_.isAfter(mx))
      .map(d => daily.getOrElse(d, 0L)).toArray
    val tDays = ys.length
    def rho(lag: Int): Double = {
      val pairs = ys.dropRight(lag).zip(ys.drop(lag))
      val n = pairs.length.toDouble
      val sx = pairs.map(p => BigInt(p._1)).sum.toDouble
      val sy = pairs.map(p => BigInt(p._2)).sum.toDouble
      val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum.toDouble
      val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
      val syy = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum.toDouble
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    rows.foreach { r =>
      val h = r.getAs[Long]("h").toInt
      val q = tDays.toDouble * (tDays + 2.0) *
        (1 to h).map(k => rho(k) * rho(k) / (tDays - k)).sum
      assert(r.getAs[Long]("t_days") == tDays.toLong)
      assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-3, s"h=$h")
      val crit = if (h == 7) 14.067140 else 23.684791
      assert(r.getAs[Boolean]("is_autocorrelated") == (q > crit) ||
        math.abs(q - crit) < 1e-3)
    }
  }

  test("abPower MDE matches a local recomputation and flags agree") {
    val rows = Relational.abPower(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value"),
        substring(sha2(col("user_id").cast("string"), 256), 1, 1).as("h"))
      .collect()
    val zSum = 1.959964 + 0.841621
    rows.foreach { r =>
      val es = ev.filter(_.getString(0) == r.getAs[String]("event_type"))
      val (a, b) = es.partition(_.getString(2) <= "7")
      assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
      def moments(xs: Array[org.apache.spark.sql.Row]) = {
        val vs = xs.map(e => BigDecimal(e.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        val m = vs.sum.toDouble / xs.length
        val ss = xs.map { e =>
          val v = e.getDouble(1)
          BigDecimal(v * v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble / xs.length
        (m, ss - m * m)
      }
      val (ma, va) = moments(a); val (mb, vb) = moments(b)
      val diff = math.abs(mb - ma)
      val mde = zSum * math.sqrt(va / a.length + vb / b.length)
      assert(math.abs(r.getAs[Double]("observed_diff") - diff) < 1e-4)
      assert(math.abs(r.getAs[Double]("mde") - mde) < 1e-4)
      assert(r.getAs[Boolean]("is_detectable") == (diff > mde) ||
        math.abs(diff - mde) < 1e-4)
      // same-population split: MDE should be positive and small vs means
      assert(r.getAs[Double]("mde") > 0)
    }
  }

  test("pageHinkley statistic matches a local sequential recomputation") {
    val r = Relational.pageHinkley(spark, sf).collect()(0)
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
      .orderBy("day").collect()
      .map(row => (row.getAs[java.sql.Date]("day").toString,
        row.getAs[Long]("yc")))
    var s = 0L; var meanSum = 0.0; var minM = Double.MaxValue
    var bestPh = Double.MinValue; var bestDay = ""
    daily.zipWithIndex.foreach { case ((day, yc), i) =>
      s += yc
      meanSum += s.toDouble / (i + 1)
      val m = s.toDouble - meanSum
      minM = math.min(minM, m)
      val ph = m - minM
      if (ph > bestPh) { bestPh = ph; bestDay = day }
    }
    assert(r.getAs[Long]("n_days") == daily.length.toLong)
    assert(r.getAs[String]("alarm_day") == bestDay)
    assert(math.abs(r.getAs[Double]("ph_stat") - bestPh / 100.0) < 1e-3)
    assert(r.getAs[Boolean]("is_drift") == (bestPh / 100.0 > 50000.0) ||
      math.abs(bestPh / 100.0 - 50000.0) < 1e-3)
  }

  test("cuped theta and adjusted difference match a local recomputation") {
    val r = Relational.cuped(spark, sf).collect()(0)
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("value"), to_date(col("ts")).as("day"))
      .collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getAs[java.sql.Date](2).toLocalDate))
    val (mn, mx) = (ev.map(_._3).min(Ordering.by((_: java.time.LocalDate).toEpochDay)),
      ev.map(_._3).max(Ordering.by((_: java.time.LocalDate).toEpochDay)))
    val bound = mn.plusDays(
      java.time.temporal.ChronoUnit.DAYS.between(mn, mx) / 2)
    def d6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val users = ev.groupBy(_._1).flatMap { case (u, es) =>
      val (pre, post) = es.partition(_._3.isBefore(bound))
      if (pre.nonEmpty && post.nonEmpty)
        Some((u, pre.map(e => d6(e._2)).sum.toDouble,
          post.map(e => d6(e._2)).sum.toDouble))
      else None
    }.toSeq
    val n = users.length.toDouble
    val mxx = users.map(_._2).sum / n; val myy = users.map(_._3).sum / n
    val vx = users.map(u => u._2 * u._2).sum / n - mxx * mxx
    val cxy = users.map(u => u._2 * u._3).sum / n - mxx * myy
    val theta = cxy / vx
    assert(r.getAs[Long]("n_users") == users.length.toLong)
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-3)
    val vr = r.getAs[Double]("var_reduction")
    assert(vr >= 0.0 && vr <= 1.0 + 1e-9)
    // the adjusted diff differs from raw by exactly theta * diffX
    def sha1hex(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(1)
    }
    val (a, b) = users.partition(u => sha1hex(u._1) <= "7")
    val diffX = b.map(_._2).sum / b.length - a.map(_._2).sum / a.length
    val diffY = b.map(_._3).sum / b.length - a.map(_._3).sum / a.length
    assert(math.abs(r.getAs[Double]("diff_raw") - diffY) < 1e-3)
    assert(math.abs(r.getAs[Double]("diff_adj") - (diffY - theta * diffX)) < 1e-3)
  }

  test("itemCf cosine matches a local co-purchase recomputation") {
    val rows = Relational.itemCf(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val up = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byPart = up.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // top-of-list ordering: co_users non-increasing
    val cos = rows.map(_.getAs[Long]("co_users"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      assert(a < b)
      val co = byPart(a).intersect(byPart(b)).size
      assert(r.getAs[Long]("co_users") == co.toLong)
      assert(r.getAs[Long]("users_a") == byPart(a).size.toLong)
      assert(r.getAs[Long]("users_b") == byPart(b).size.toLong)
      val local = co / math.sqrt(byPart(a).size.toDouble * byPart(b).size)
      assert(math.abs(r.getAs[Double]("cos") - local) < 1e-6)
    }
  }

  test("itemCf maxBasket caps whale customers and reports the truncation") {
    // Gate corpus sits under the default cap: nothing truncated.
    val dflt = Relational.itemCf(spark, sf).collect()
    assert(dflt.forall(_.getAs[Long]("n_truncated_custs") == 0L))
    // Cap 1: every customer keeps ONE part — no within-customer pair can
    // form, and every multi-part customer is reported truncated.
    val capped = Relational.itemCf(spark, sf, maxBasket = 1)
    assert(capped.count() == 0L)
    val cap2 = Relational.itemCf(spark, sf, minCo = 1, maxBasket = 2).collect()
    assert(cap2.nonEmpty)
    val multi = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_partkey").distinct()
      .groupBy("o_custkey").count().where(col("count") > 2).count()
    assert(cap2.head.getAs[Long]("n_truncated_custs") == multi)
    // With cap 2 each kept basket has <= 2 parts: co_users of any pair is
    // bounded by the number of customers, and every pair's parts are that
    // customer's two LOWEST part keys — spot-check determinism by rerun.
    val rerun = Relational.itemCf(spark, sf, minCo = 1, maxBasket = 2).collect()
    assert(cap2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      rerun.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("stratifiedEffect strata partition users and the pooled row is the weighted mean") {
    val rows = Relational.stratifiedEffect(spark, sf).collect()
    val byStr = rows.map(r => r.getAs[String]("stratum") -> r).toMap
    assert(byStr.contains("ALL"))
    val strata = rows.filter(_.getAs[String]("stratum") != "ALL")
    val all = byStr("ALL")
    assert(strata.map(_.getAs[Long]("n_a")).sum == all.getAs[Long]("n_a"))
    assert(strata.map(_.getAs[Long]("n_b")).sum == all.getAs[Long]("n_b"))
    // pooled effect = Σ (n_s/N) * effect_s
    val n = (all.getAs[Long]("n_a") + all.getAs[Long]("n_b")).toDouble
    val pooled = strata.map { r =>
      (r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).toDouble / n *
        r.getAs[Double]("effect")
    }.sum
    assert(math.abs(all.getAs[Double]("effect") - pooled) < 1e-3)
  }

  test("mannKendall S, variance, and z match a local pairwise recomputation") {
    val r = Relational.mannKendall(spark, sf).collect()(0)
    val ys = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
      .orderBy("day").collect().map(_.getAs[Long]("yc"))
    val n = ys.length
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n)
      s += java.lang.Long.signum(ys(j) - ys(i)).toLong
    val ties = ys.groupBy(identity).values.map(_.length.toLong)
      .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - ties).toDouble / 18.0
    val z = if (s > 0) (s - 1.0) / math.sqrt(varS)
      else if (s < 0) (s + 1.0) / math.sqrt(varS) else 0.0
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("s_stat") == s)
    assert(math.abs(r.getAs[Double]("var_s") - varS) < 1e-3)
    assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-4)
    val expectedTrend = if (z > 1.959964) "increasing"
      else if (z < -1.959964) "decreasing" else "no trend"
    assert(r.getAs[String]("trend") == expectedTrend)
  }

  test("did estimate matches a local four-cell recomputation") {
    val r = Relational.did(spark, sf).collect()(0)
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("value"), to_date(col("ts")).as("day"),
        substring(sha2(col("user_id").cast("string"), 256), 1, 1).as("h"))
      .collect()
      .map(x => (x.getString(3) <= "7", x.getDouble(1),
        x.getAs[java.sql.Date](2).toLocalDate))
    val (mn, mx) = (ev.map(_._3).min(Ordering.by((_: java.time.LocalDate).toEpochDay)),
      ev.map(_._3).max(Ordering.by((_: java.time.LocalDate).toEpochDay)))
    val bound = mn.plusDays(
      java.time.temporal.ChronoUnit.DAYS.between(mn, mx) / 2)
    def d6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def cell(isA: Boolean, post: Boolean) = {
      val xs = ev.filter(e => e._1 == isA && !e._3.isBefore(bound) == post)
        .map(_._2)
      (xs.length.toLong, xs.map(d6).sum.toDouble / xs.length)
    }
    val (na0, ma0) = cell(true, false); val (na1, ma1) = cell(true, true)
    val (nb0, mb0) = cell(false, false); val (nb1, mb1) = cell(false, true)
    assert(r.getAs[Long]("n_a0") == na0 && r.getAs[Long]("n_a1") == na1)
    assert(r.getAs[Long]("n_b0") == nb0 && r.getAs[Long]("n_b1") == nb1)
    val didLocal = (mb1 - mb0) - (ma1 - ma0)
    assert(math.abs(r.getAs[Double]("did") - didLocal) < 1e-3)
    assert(r.getAs[Double]("se") > 0)
    assert(math.abs(r.getAs[Double]("z_stat") -
      r.getAs[Double]("did") / r.getAs[Double]("se")) < 1e-2)
  }

  test("backtestNaive MAE/RMSE match a local replay of both baselines") {
    val rows = Relational.backtestNaive(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("naive_1", "seasonal_7"))
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate, r.getAs[Long]("yc")))
      .toMap
    val (mn, mx) = (daily.keys.min(Ordering.by((_: java.time.LocalDate).toEpochDay)),
      daily.keys.max(Ordering.by((_: java.time.LocalDate).toEpochDay)))
    val ys = Iterator.iterate(mn)(_.plusDays(1)).takeWhile(!_.isAfter(mx))
      .map(d => daily.getOrElse(d, 0L)).toArray
    def check(lagN: Int, name: String): Unit = {
      val idx = ys.indices.filter(i =>
        i >= lagN && i > ys.length - 1 - 28)
      val errs = idx.map(i => math.abs(ys(i) - ys(i - lagN)))
      val r = rows(name)
      assert(r.getAs[Long]("n_days") == idx.length.toLong, name)
      val mae = errs.map(BigInt(_)).sum.toDouble / errs.length / 100.0
      assert(math.abs(r.getAs[Double]("mae") - mae) < 1e-3, name)
      val rmse = math.sqrt(
        errs.map(e => BigInt(e) * BigInt(e)).sum.toDouble / errs.length) / 100.0
      assert(math.abs(r.getAs[Double]("rmse") - rmse) < 1e-3, name)
      // the seasonal baseline should never be wildly worse than last-value
      assert(r.getAs[Double]("mape") >= 0.0)
    }
    check(1, "naive_1"); check(7, "seasonal_7")
  }

  test("seasonalDecompose shares match a local decomposition replay") {
    val r = Relational.seasonalDecompose(spark, sf).collect()(0)
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
      .orderBy("day").collect()
      .map(x => (x.getAs[java.sql.Date]("day").toLocalDate, x.getAs[Long]("yc")))
      .toMap
    val (mn, mx) = (daily.keys.min(Ordering.by((_: java.time.LocalDate).toEpochDay)),
      daily.keys.max(Ordering.by((_: java.time.LocalDate).toEpochDay)))
    val days = Iterator.iterate(mn)(_.plusDays(1)).takeWhile(!_.isAfter(mx)).toArray
    val ys = days.map(d => daily.getOrElse(d, 0L).toDouble)
    val interior = (3 until ys.length - 3).map { i =>
      val trend = (i - 3 to i + 3).map(ys).sum / 7.0
      (days(i), ys(i), trend, ys(i) - trend)
    }
    val seas = interior.groupBy(x => x._1.toEpochDay % 7)
      .view.mapValues(g => g.map(_._4).sum / g.length).toMap
    val resid = interior.map(x => x._4 - seas(x._1.toEpochDay % 7))
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => x * x).sum / xs.length - m * m
    }
    val vy = variance(interior.map(_._2))
    assert(r.getAs[Long]("n_days") == interior.length.toLong)
    assert(math.abs(r.getAs[Double]("var_total") - vy / 1e4) < math.abs(vy / 1e4) * 1e-3)
    assert(math.abs(r.getAs[Double]("share_trend") -
      variance(interior.map(_._3)) / vy) < 1e-3)
    assert(math.abs(r.getAs[Double]("share_residual") -
      variance(resid) / vy) < 1e-3)
    assert(math.abs(r.getAs[Double]("r2") -
      (1.0 - variance(resid) / vy)) < 1e-3)
    assert(r.getAs[Double]("share_trend") >= 0 &&
      r.getAs[Double]("share_residual") >= 0)
  }

  test("priceIndex Fisher is the geometric mean and one month matches a local replay") {
    val rows = Relational.priceIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (l, p, f) = (r.getAs[Double]("laspeyres"), r.getAs[Double]("paasche"),
        r.getAs[Double]("fisher"))
      assert(l > 0 && p > 0)
      assert(math.abs(f - math.sqrt(l * p)) < 1e-4)
    }
    // full local replay of the first reported month
    val li = Tables.load(spark, sf, "lineitem")
      .select(date_format(to_date(col("l_shipdate")), "yyyy-MM").as("m"),
        col("l_partkey"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("e"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val byMP = li.groupBy(x => (x._1, x._2)).view
      .mapValues(g => (g.map(_._3).sum, g.map(_._4).sum)).toMap
    val m0 = li.map(_._1).min
    val base = byMP.collect { case ((m, p), (q, e)) if m == m0 =>
      p -> (e.toDouble / q, q) }.toMap
    val target = rows.head.getAs[String]("month")
    val curr = byMP.collect { case ((m, p), (q, e)) if m == target && base.contains(p) =>
      (p, e.toDouble / q, q) }
    val lNum = curr.map { case (p, u, _) => u * base(p)._2 }.sum
    val lDen = curr.map { case (p, _, _) => base(p)._1 * base(p)._2 }.sum
    assert(rows.head.getAs[Long]("n_parts") == curr.size.toLong)
    assert(math.abs(rows.head.getAs[Double]("laspeyres") - lNum / lDen) < 1e-3)
  }

  test("changepoint picks the split a local brute-force SSE scan picks") {
    val r = Relational.changepoint(spark, sf).collect()(0)
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
      .orderBy("day").collect()
      .map(row => (row.getAs[java.sql.Date]("day").toString,
        row.getAs[Long]("yc")))
    val ys = daily.map(_._2)
    def sse(xs: Array[Long]): Double = {
      val s = xs.map(BigInt(_)).sum.toDouble
      val q = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      q - s * s / xs.length
    }
    val total = sse(ys)
    val best = (1 until ys.length)
      .map(i => (sse(ys.take(i)) + sse(ys.drop(i)), i)).minBy(identity)
    assert(r.getAs[Long]("n_days") == ys.length.toLong)
    assert(r.getAs[String]("split_day") == daily(best._2 - 1)._1)
    assert(math.abs(r.getAs[Double]("sse_reduction") -
      (1.0 - best._1 / total)) < 1e-5)
    val mb = ys.take(best._2).map(BigInt(_)).sum.toDouble / best._2 / 100.0
    assert(math.abs(r.getAs[Double]("mean_before") - mb) < 1e-4)
  }

  test("tpchQ12 high/low counts match a local join recomputation") {
    val rows = Relational.tpchQ12(spark, sf).collect()
      .map(r => r.getAs[String]("shipmode") ->
        (r.getAs[Long]("high_line_count"), r.getAs[Long]("low_line_count")))
      .toMap
    val prio = Tables.load(spark, sf, "orders").collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        r.getAs[String]("o_orderpriority")).toMap
    val want = Tables.load(spark, sf, "lineitem")
      .where(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1997-01-01")))
      .select("l_orderkey", "l_returnflag").collect()
      .filter(r => Set("R", "A")(r.getAs[String]("l_returnflag")))
      .groupBy(_.getAs[String]("l_returnflag")).view.mapValues { ls =>
        val hi = ls.count(l =>
          Set("1-URGENT", "2-HIGH")(prio(l.getAs[Long]("l_orderkey"))))
        (hi.toLong, (ls.size - hi).toLong)
      }.toMap
    assert(rows == want && rows.nonEmpty)
  }

  test("tpchQ2 rows quote exactly the per-part min cost within the cut") {
    val rows = Relational.tpchQ2(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // Recompute partsupp-lite min cost per part over the filtered sets.
    val parts = Tables.load(spark, sf, "part")
      .where(col("p_type") === "LARGE").collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    val asiaN = Tables.load(spark, sf, "nation").collect()
      .filter(_.getAs[Int]("n_regionkey") == 2) // ASIA per region table
      .map(_.getAs[Int]("n_nationkey")).toSet
    val sups = Tables.load(spark, sf, "supplier").collect()
      .filter(r => asiaN(r.getAs[Int]("s_nationkey")))
      .map(_.getAs[Long]("s_suppkey")).toSet
    val cost = Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .filter(r => parts(r.getAs[Long]("l_partkey")) &&
        sups(r.getAs[Long]("l_suppkey")))
      .groupBy(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .view.mapValues(_.map(_.getAs[Double]("l_extendedprice")).min).toMap
    val minPer = cost.groupBy(_._1._1).view.mapValues(_.values.min).toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      assert(r.getAs[Double]("supplycost") == minPer(pk))
    }
    // Ordered by balance desc with the canonical tie-break chain.
    val key = rows.map(r => (-r.getAs[Double]("s_acctbal"),
      r.getAs[String]("nation"), r.getAs[String]("s_name"),
      r.getAs[Long]("p_partkey")))
    assert(key.sameElements(key.sorted))
  }

  test("tpchQ11 keeps exactly the parts above the basis-point threshold") {
    val rows = Relational.tpchQ11(spark, sf).collect()
    assert(rows.nonEmpty)
    val nat3 = Tables.load(spark, sf, "nation")
      .where(col("n_name") === "NATION_3").collect()
      .map(_.getAs[Int]("n_nationkey")).toSet
    val sups = Tables.load(spark, sf, "supplier").collect()
      .filter(r => nat3(r.getAs[Int]("s_nationkey")))
      .map(_.getAs[Long]("s_suppkey")).toSet
    val perPair = Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .collect()
      .groupBy(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .view.mapValues { ls =>
        val qty = ls.map(l => BigDecimal(l.getAs[Double]("l_quantity"))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
        val cents = BigDecimal(
          math.floor(ls.map(_.getAs[Double]("l_extendedprice")).min
            * 100.0 + 0.5))
        cents * qty
      }.toMap
    val perPart = perPair.toSeq
      .filter { case ((_, sk), _) => sups(sk) }
      .groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val total = perPart.values.sum
    val want = perPart.filter { case (_, v) =>
      v.toDouble * perPart.size * 10.0 > total.toDouble * 10.0 }
    assert(rows.map(_.getAs[Long]("ps_partkey")).toSet == want.keySet)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("value") -
        want(r.getAs[Long]("ps_partkey")).toDouble / 100.0) < 1e-6)
    }
  }

  test("tpchQ16 counts distinct non-complaint suppliers per part bucket") {
    val rows = Relational.tpchQ16(spark, sf).collect()
    assert(rows.nonEmpty)
    val bad = Tables.load(spark, sf, "supplier")
      .where(col("s_acctbal") < 0).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    val pmeta = Tables.load(spark, sf, "part").collect()
      .filter(_.getAs[String]("p_brand") != "Brand#1")
      .map(r => r.getAs[Long]("p_partkey") -> (r.getAs[String]("p_brand"),
        r.getAs[String]("p_type"), r.getAs[Int]("p_size"))).toMap
    val want = Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .filter(r => pmeta.contains(r.getAs[Long]("l_partkey")) &&
        !bad(r.getAs[Long]("l_suppkey")))
      .groupBy(r => pmeta(r.getAs[Long]("l_partkey")))
      .view.mapValues(_.map(_.getAs[Long]("l_suppkey")).distinct.size.toLong)
      .toMap
    val got = rows.map(r => (r.getAs[String]("p_brand"),
      r.getAs[String]("p_type"), r.getAs[Int]("p_size")) ->
      r.getAs[Long]("supplier_cnt")).toMap
    assert(got == want)
  }

  test("tpchQ20 lists exactly the region's excess-demand suppliers") {
    val rows = Relational.tpchQ20(spark, sf).collect()
    assert(rows.nonEmpty)
    val smallParts = Tables.load(spark, sf, "part").collect()
      .filter(_.getAs[String]("p_name").startsWith("small"))
      .map(_.getAs[Long]("p_partkey")).toSet
    def qsum(ls: Seq[org.apache.spark.sql.Row]): BigDecimal =
      ls.map(l => BigDecimal(l.getAs[Double]("l_quantity"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    val avail = Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .groupBy(r => (r.getAs[Long]("l_partkey"),
        r.getAs[Long]("l_suppkey"))).view.mapValues(qsum(_)).toMap
    val hot = Tables.load(spark, sf, "lineitem")
      .where(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1997-01-01")))
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .filter(r => smallParts(r.getAs[Long]("l_partkey")))
      .groupBy(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .view.mapValues(qsum(_)).toSeq
      .filter { case (k, shipped) => shipped * 2 > avail(k) }
      .map(_._1._2).toSet
    val eurN = Tables.load(spark, sf, "nation").collect()
      .filter(_.getAs[Int]("n_regionkey") == 3) // EUROPE per region table
      .map(_.getAs[Int]("n_nationkey")).toSet
    val want = Tables.load(spark, sf, "supplier").collect()
      .filter(r => eurN(r.getAs[Int]("s_nationkey")) &&
        hot(r.getAs[Long]("s_suppkey")))
      .map(_.getAs[Long]("s_suppkey")).toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == want)
    val names = rows.map(_.getAs[String]("s_name"))
    assert(names.sameElements(names.sorted))
  }
}
