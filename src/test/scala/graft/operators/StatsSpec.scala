package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The r9 stats/time-series batch (#329-#342) against independent
  * reference formulations: the distributed-rank paths must equal the
  * plain single-partition window they replace, and the closed-form
  * statistics must satisfy the identities the textbook derivations
  * guarantee. The DuckDB oracle pins exact VALUES; this spec pins the
  * ALGEBRA (so a same-wrong-both-sides oracle bug can't hide).
  */
class StatsSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("wilcoxonSigned W+ equals a single-partition-window recomputation") {
    // Reference: same pairs, ranks from a plain unpartitioned window with
    // classic average ranks ((min+max)/2 per tie group).
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val o = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("pc"))
      .select(col("o_custkey"), col("pc"), row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("o_custkey")).as("cnt"))
    val pairs = o.where(col("cnt") >= 2 &&
        (col("rn") === 1 || col("rn") === col("cnt")))
      .groupBy("o_custkey")
      .agg((max(when(col("rn") === col("cnt"), col("pc"))) -
        max(when(col("rn") === 1, col("pc")))).as("d"))
      .where(col("d") =!= 0)
      .withColumn("absd", abs(col("d")))
    val gw = Window.orderBy("absd", "o_custkey")
    val ranked = pairs.withColumn("gr", row_number().over(gw))
      .groupBy("absd")
      .agg(((min("gr") + max("gr")).cast("double") / 2.0).as("avg_rank"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("npos"),
        count(lit(1)).as("tk"))
    val ref = ranked.agg(
      sum(col("avg_rank") * col("npos").cast("double")).as("wp"),
      sum("tk").as("n")).collect()(0)
    val got = Relational.wilcoxonSigned(spark, dir).collect()(0)
    assert(got.getAs[Long]("n_pairs") === ref.getAs[Long]("n"))
    assert(math.abs(got.getAs[Double]("w_plus") - ref.getAs[Double]("wp")) < 1e-6)
    // z is (W+ - mu)/sigma by construction
    val z = (got.getAs[Double]("w_plus") - got.getAs[Double]("mu")) /
      got.getAs[Double]("sigma")
    assert(math.abs(got.getAs[Double]("z_stat") - z) < 1e-5)
  }

  test("wasserstein equals a single-partition-window recomputation and is a metric") {
    val got = Relational.wasserstein(spark, dir).collect()(0)
    // Reference: plain-window CDFs over the same value histogram.
    val cust = graft.sources.Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment")
    val v = graft.sources.Tables.load(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("vc"))
    val h = v.groupBy("vc").agg(
      sum(when(col("seg") === "BUILDING", 1L).otherwise(0L)).as("ca"),
      sum(when(col("seg") === "MACHINERY", 1L).otherwise(0L)).as("cb"))
    val cw = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    val c = h.select(col("vc"),
      sum("ca").over(cw).as("cuma"), sum("cb").over(cw).as("cumb"),
      lead("vc", 1).over(Window.orderBy("vc")).as("vnext"))
    val na = v.where(col("seg") === "BUILDING").count()
    val nb = v.where(col("seg") === "MACHINERY").count()
    val num = c.where(col("vnext").isNotNull)
      .agg(sum(abs(col("cuma") * nb - col("cumb") * na) *
        (col("vnext") - col("vc"))).as("num")).collect()(0).getAs[Long]("num")
    val ref = num.toDouble / (na.toDouble * nb.toDouble) / 100.0
    assert(got.getAs[Long]("na") === na && got.getAs[Long]("nb") === nb)
    assert(math.abs(got.getAs[Double]("w1_dollars") - ref) < 1e-5)
    assert(got.getAs[Double]("w1_dollars") >= 0.0)
    // Symmetry: swapping the segments changes nothing (|F_A-F_B| = |F_B-F_A|)
    val swapped = Relational.wasserstein(spark, dir, "MACHINERY", "BUILDING")
      .collect()(0)
    assert(got.getAs[Double]("w1_dollars") ===
      swapped.getAs[Double]("w1_dollars"))
  }

  test("friedman rank sums total n*k(k+1)/2 and Q is nonnegative") {
    val rows = Relational.friedman(spark, dir).collect()
    val k = rows.length
    val n = rows.head.getAs[Long]("n_months")
    assert(rows.forall(_.getAs[Long]("n_months") == n))
    val total = rows.map(_.getAs[Double]("rank_sum")).sum
    assert(math.abs(total - n.toDouble * k * (k + 1) / 2.0) < 1e-9)
    assert(rows.head.getAs[Double]("q_stat") >= 0.0)
    assert(rows.head.getAs[Long]("df") === (k - 1).toLong)
  }

  test("durbinWatson is in (0, 4) and consistent with rho_lag1") {
    val r = Relational.durbinWatson(spark, dir).collect()(0)
    val dw = r.getAs[Double]("dw_stat")
    assert(dw > 0.0 && dw < 4.0)
    assert(math.abs(r.getAs[Double]("rho_lag1") - (1.0 - dw / 2.0)) < 1e-5)
  }

  test("cooksDistance rows have valid leverage and descending influence") {
    val rows = Relational.cooksDistance(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val h = r.getAs[Double]("leverage")
      assert(h > 0.0 && h < 1.0)
      assert(r.getAs[Double]("cooks_d") >= 0.0)
    }
    val ds = rows.map(_.getAs[Double]("cooks_d")).toSeq
    assert(ds === ds.sorted.reverse)
  }

  test("bollinger emits exactly n_days - 19 rows with sd >= 0") {
    val nDays = graft.sources.Tables.load(spark, dir, "orders")
      .select(to_date(col("o_orderdate"))).distinct().count()
    val rows = Relational.bollinger(spark, dir).collect()
    assert(rows.length === (nDays - 19).toInt)
    assert(rows.forall(_.getAs[Double]("sd20") >= 0.0))
  }

  test("sax letters partition the z line and grubbs names the max-|z| day") {
    val sax = Relational.sax(spark, dir).collect()
    sax.foreach { r =>
      val z = r.getAs[Double]("z_score"); val s = r.getAs[String]("symbol")
      val want =
        if (z < -0.674489) "a" else if (z < 0.0) "b"
        else if (z < 0.674490) "c" else "d"
      // only rounded z is visible; allow the two boundary-straddle cells
      if (math.abs(z + 0.674490) > 1e-5 && math.abs(z) > 1e-5 &&
          math.abs(z - 0.674490) > 1e-5)
        assert(s === want, s"day ${r.getAs[String]("day")} z=$z")
    }
    val g = Relational.grubbs(spark, dir).collect()(0)
    val topZ = sax.map(r => math.abs(r.getAs[Double]("z_score"))).max
    // G uses the SAMPLE sd, sax the population sd: G = |z_pop| * sqrt((n-1)/n)^-1
    val n = g.getAs[Long]("n_days").toDouble
    assert(math.abs(g.getAs[Double]("g_stat") -
      topZ * math.sqrt((n - 1.0) / n)) < 1e-3)
  }

  test("entropyRate is the pi-weighted row entropy, bounded by ln k") {
    val rows = Relational.entropyRate(spark, dir).collect()
    val k = rows.length
    val rate = rows.head.getAs[Double]("entropy_rate")
    assert(rows.forall(r => math.abs(r.getAs[Double]("entropy_rate") - rate) < 1e-12))
    val recomputed = rows.map(r =>
      r.getAs[Double]("pi") * r.getAs[Double]("h_row")).sum
    assert(math.abs(rate - recomputed) < 1e-4)
    assert(rate >= 0.0 && rate <= math.log(k.toDouble) + 1e-9)
    rows.foreach(r => assert(r.getAs[Double]("h_row") >= 0.0 &&
      r.getAs[Double]("h_row") <= math.log(k.toDouble) + 1e-9))
  }

  test("hurst reports all four window sizes with a finite exponent") {
    val rows = Relational.hurst(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("win_size")).toSeq === Seq(8, 16, 32, 64))
    // R/S grows with window size (the whole point of the log-log fit)
    val m = rows.map(_.getAs[Double]("mean_log_rs")).toSeq
    assert(m === m.sorted)
    val h = rows.head.getAs[Double]("hurst")
    assert(!h.isNaN && h > 0.0 && h < 1.5)
    assert(rows.forall(r => math.abs(r.getAs[Double]("hurst") - h) < 1e-12))
  }

  test("metaAnalysis pools per-nation effects with inverse-variance weights") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def arm(u: Long): String = {
      val h = sha.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) <= '7') "A" else "B"
    }
    val studies = ev.groupBy(e => e._1 % 8 + 1).values.flatMap { rows =>
      val (a, b) = rows.map(e => (e._2, e._3))
        .partition(e => arm(e._1) == "A")
      if (a.size >= 2 && b.size >= 2) {
        def mv(xs: Seq[Double]) = {
          val n = xs.size; val m = xs.sum / n
          (m, (xs.map(x => x * x).sum / n - m * m) / n)
        }
        val (ma, va) = mv(a.map(_._2).toSeq)
        val (mb, vb) = mv(b.map(_._2).toSeq)
        Some((mb - ma, va + vb))
      } else None
    }.toSeq
    val sw = studies.map(s => 1.0 / s._2).sum
    val dhat = studies.map(s => s._1 / s._2).sum / sw
    val q = studies.map(s => (s._1 - dhat) * (s._1 - dhat) / s._2).sum
    val r = Relational.metaAnalysis(spark, dir).collect()(0)
    assert(r.getAs[Long]("k_studies") == studies.size.toLong)
    assert(math.abs(r.getAs[Double]("d_pooled") - dhat) < 1e-4)
    assert(math.abs(r.getAs[Double]("se") - 1.0 / math.sqrt(sw)) < 1e-4)
    assert(math.abs(r.getAs[Double]("q_het") - q) < 1e-3)
    val i2 = r.getAs[Double]("i2")
    assert(i2 >= 0.0 && i2 < 1.0)
  }

  test("cronbachAlpha matches a local quarterly-item recompute") {
    val subj = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), quarter(col("o_orderdate")).as("q"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("pc"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (_, rows) =>
        (1 to 4).map(q => rows.filter(_._2 == q).map(_._3).sum.toDouble)
      }.toSeq
    val n = subj.size.toDouble
    def popVar(xs: Seq[Double]): Double = {
      val m = xs.sum / n; xs.map(x => x * x).sum / n - m * m
    }
    val itemVars = (0 until 4).map(i => popVar(subj.map(_(i)))).sum
    val totVar = popVar(subj.map(_.sum))
    val alpha = 4.0 / 3.0 * (1.0 - itemVars / totVar)
    val r = Relational.cronbachAlpha(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_subjects") == n.toLong)
    assert(math.abs(r.getAs[Double]("sum_item_var") - itemVars / 10000.0) < 1e-2)
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-4)
    assert(r.getAs[Double]("alpha") <= 4.0 / 3.0 + 1e-9)
  }

  test("interarrival moments match a local per-user gap recompute") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"), col("ts"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("t_us")))
    val gaps = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).toSeq
        .sliding(2).collect { case Seq(a, b) => (b._4, b._5 - a._5) }
    }.toSeq
    val local = gaps.groupBy(_._1).map { case (t, gs) =>
      val n = gs.size
      val mean = gs.map(_._2).sum.toDouble / n
      val sd = math.sqrt(gs.map(g => g._2.toDouble * g._2).sum / n - mean * mean)
      t -> (n.toLong, mean / 1e6, sd / mean)
    }
    val rows = Relational.interarrival(spark, dir).collect()
    assert(rows.length == local.size)
    rows.foreach { r =>
      val (n, m, cv) = local(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_gaps") == n)
      assert(math.abs(r.getAs[Double]("mean_gap_s") - m) < 1e-4)
      assert(math.abs(r.getAs[Double]("cv") - cv) < 1e-4)
    }
  }

  test("peakDetect days are strict local maxima of the daily series") {
    val daily = graft.sources.Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("yc"))
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("yc")))
    val peaks = daily.sliding(3).collect {
      case Array((_, a), (d, b), (_, c)) if b > a && b > c =>
        d -> (b - math.max(a, c)) / 100.0
    }.toMap
    val got = Relational.peakDetect(spark, dir).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Double]("prominence")).toMap
    assert(got === peaks)
  }

  // ---- r11 additions (#368-#370, #372) --------------------------------

  private def segCents(): Map[String, Seq[Long]] = {
    val o = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("yc"))
    val c = graft.sources.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "yc").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  test("bartlett chi2 equals an exact-BigInt local recomputation") {
    val gs = segCents().filter(_._2.length >= 2)
    val terms = gs.values.map { xs =>
      val n = xs.length
      val s1 = xs.map(BigInt(_)).sum
      val s2 = xs.map(x => BigInt(x) * x).sum
      val s2i = (BigInt(n) * s2 - s1 * s1).toDouble / (n.toDouble * (n - 1))
      (n, (n - 1) * math.log(s2i), (n - 1) * s2i, 1.0 / (n - 1))
    }
    val k = terms.size
    val nTot = terms.map(_._1).sum
    val dfp = (nTot - k).toDouble
    val s2p = terms.map(_._3).sum / dfp
    val c = 1.0 + (terms.map(_._4).sum - 1.0 / dfp) / (3.0 * (k - 1))
    val chi2 = (dfp * math.log(s2p) - terms.map(_._2).sum) / c
    val row = Relational.bartlett(spark, dir).collect().head
    assert(row.getAs[Long]("k_groups") == k)
    assert(row.getAs[Long]("n_total") == nTot)
    assert(math.abs(row.getAs[Double]("bartlett_chi2") - chi2) < 1e-4)
  }

  test("cliffDelta equals brute-force pair counting") {
    val gs = segCents()
    val a = gs("BUILDING"); val b = gs("MACHINERY")
    var winsA = 0L; var winsB = 0L
    for (x <- a; y <- b) {
      if (x > y) winsA += 1 else if (x < y) winsB += 1
    }
    val row = Relational.cliffDelta(spark, dir).collect().head
    assert(row.getAs[Long]("na") == a.length.toLong)
    assert(row.getAs[Long]("nb") == b.length.toLong)
    assert(row.getAs[Long]("wins_a") == winsA)
    assert(row.getAs[Long]("wins_b") == winsB)
    val delta = (winsA - winsB).toDouble / (a.length.toDouble * b.length)
    assert(math.abs(row.getAs[Double]("cliff_delta") - delta) < 1e-6)
  }

  test("lorenz decile shares equal a local sort's cumulative shares") {
    val rev = graft.sources.Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("xc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, x) => (x, k) }
    val n = rev.length
    val total = rev.map(_._2).sum.toDouble
    val cums = rev.scanLeft(0L)(_ + _._2).drop(1)
    val rows = Relational.lorenz(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val cut = (n.toLong * r.getAs[Long]("decile")) / 10
      assert(r.getAs[Long]("rank_cut") == cut)
      assert(math.abs(r.getAs[Double]("cum_revenue_share") -
        cums(cut.toInt - 1) / total) < 1e-6)
    }
    // Lorenz curve invariants: nondecreasing, ends at exactly 1.
    val shares = rows.sortBy(_.getAs[Long]("decile"))
      .map(_.getAs[Double]("cum_revenue_share"))
    assert(shares.zip(shares.tail).forall { case (p, q) => p <= q })
    assert(shares.last == 1.0)
  }

  test("botFlags top rows match a local per-user gap recomputation") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._2))
      .toMap
    val local = ev.collect { case (u, ts) if ts.length >= 2 =>
      val gaps = ts.zip(ts.tail).map { case (p, q) => q - p }
      (u, ts.length.toLong, ts.max - ts.min, gaps.min)
    }.toSeq
    def fl6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = local
      .map { case (u, n, span, mg) => (fl6(mg / 1e6), -n, u) }
      .sorted.take(10)
    val got = Relational.botFlags(spark, dir).collect()
      .map(r => (r.getAs[Double]("min_gap_s"), -r.getAs[Long]("n_events"),
        r.getAs[Long]("user_id")))
    assert(got.toSeq == expect)
  }

  private def fl6l(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("jackknife equals a local delete-one-month recomputation") {
    val o = graft.sources.Tables.load(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT)").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byM = o.groupBy(_._1).view.mapValues(v =>
      (v.length.toLong, v.map(x => BigInt(x._2)).sum)).toMap
    val n = o.length.toLong
    val s = o.map(x => BigInt(x._2)).sum
    // Same quantization as the operator: per-replicate mean floored to
    // integer micro-units before the cross-replicate moments.
    val this6 = byM.values.map { case (ng, sg) =>
      math.floor((s - sg).toDouble / ((n - ng).toDouble * 100.0) * 1e6 + 0.5)
        .toLong
    }.toSeq
    val g = byM.size
    val sth = this6.map(BigInt(_)).sum.toDouble
    val sth2 = this6.map(t => BigInt(t) * BigInt(t)).sum.toDouble
    val varJ = (g - 1.0) / g *
      (sth2 / 1e12 - (sth / 1e6) * (sth / 1e6) / g)
    val r = Relational.jackknife(spark, dir).collect()(0)
    assert(r.getAs[Long]("g_groups") == g && r.getAs[Long]("n_rows") == n)
    assert(r.getAs[Double]("mean_full") ==
      fl6l(s.toDouble / (n.toDouble * 100.0)))
    assert(r.getAs[Double]("theta_bar") == fl6l(sth / 1e6 / g))
    assert(r.getAs[Double]("se_jack") == fl6l(math.sqrt(math.max(0.0, varJ))))
    // The jackknife SE of a mean over ~n rows must sit in the same decade
    // as sd/sqrt(n) — a sanity fence against unit slips (cents vs units).
    assert(r.getAs[Double]("se_jack") > 0.0)
  }

  test("fdrBh discoveries are exactly the local BH step-up prefix") {
    val j = graft.sources.Tables.load(spark, dir, "orders")
      .join(graft.sources.Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.sources.Tables.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val per = j.groupBy(_._1).view.mapValues(v =>
      (v.length.toLong, v.count(_._2 > 250000.0).toLong)).toMap
    val nn = per.values.map(_._1).sum
    val kk = per.values.map(_._2).sum
    val m = per.size
    val p6 = per.map { case (nat, (n1, k1)) =>
      val phat = kk.toDouble / nn.toDouble
      val z = (k1.toDouble / n1.toDouble -
        (kk - k1).toDouble / (nn - n1).toDouble) /
        math.sqrt(phat * (1.0 - phat) * (1.0 / n1.toDouble + 1.0 / (nn - n1).toDouble))
      nat -> fl6l(2.0 / (1.0 + math.exp(1.702 * math.abs(z))))
    }
    val ranked = p6.toSeq.sortBy { case (nat, p) =>
      (math.floor(p * 1e6 + 0.5).toLong, nat) }.zipWithIndex
      .map { case ((nat, p), i) => (nat, p, i + 1L) }
    val crit = ranked.collect { case (_, p, rk)
      if math.floor(p * 1e6 + 0.5).toLong * m <= 100000L * rk => rk }
      .maxOption.getOrElse(0L)
    val rows = Relational.fdrBh(spark, dir).collect()
    assert(rows.length == m)
    rows.foreach { r =>
      val rk = r.getAs[Long]("p_rank")
      val (nat, p, _) = ranked(rk.toInt - 1)
      assert(r.getAs[String]("nation") == nat)
      assert(r.getAs[Double]("p_approx") == p)
      assert(r.getAs[Boolean]("discovered") == (rk <= crit))
    }
    // BH step-up structure: the discovery set is a prefix of the p-ranking.
    val disc = rows.filter(_.getAs[Boolean]("discovered"))
      .map(_.getAs[Long]("p_rank")).sorted
    assert(disc.sameElements(1L to disc.length))
  }

  test("permutationTest equals an independent sha-replay of all replicates") {
    val base = graft.sources.Tables.load(spark, dir, "orders")
      .join(graft.sources.Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        expr("CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT)").as("xc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def sha(sIn: String): String =
      md.digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val naO = base.count(_._2 == "BUILDING").toLong
    val nbO = base.count(_._2 == "MACHINERY").toLong
    val saO = base.collect { case (_, "BUILDING", x) => BigInt(x) }.sum
    val sbO = base.collect { case (_, "MACHINERY", x) => BigInt(x) }.sum
    val dObs = saO.toDouble / (naO.toDouble * 100.0) -
      sbO.toDouble / (nbO.toDouble * 100.0)
    val diffs = (1 to 96).map { rep =>
      val grp = (rep - 1) / 16
      val slot = (rep - 1) % 16
      var na = 0L; var nb = 0L; var sa = BigInt(0); var sb = BigInt(0)
      base.foreach { case (k, _, x) =>
        val h4 = sha(s"$k|$grp").substring(slot * 4, slot * 4 + 4)
        if (h4 < "8000") { na += 1; sa += x } else { nb += 1; sb += x }
      }
      sa.toDouble / (na.toDouble * 100.0) - sb.toDouble / (nb.toDouble * 100.0)
    }
    val nExtreme = diffs.count(d => math.abs(d) >= math.abs(dObs)).toLong
    val r = Relational.permutationTest(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_a") == naO && r.getAs[Long]("n_b") == nbO)
    assert(r.getAs[Long]("n_perm") == 96L)
    assert(r.getAs[Double]("d_obs") == fl6l(dObs))
    assert(r.getAs[Long]("n_extreme") == nExtreme)
    assert(r.getAs[Double]("p_perm") == fl6l((nExtreme + 1.0) / 97.0))
    // Under H0-compatible synthetic data the add-one p can never be 0 or 1
    // exactly at the boundary forms — the estimator's support contract.
    assert(r.getAs[Double]("p_perm") > 0.0 && r.getAs[Double]("p_perm") <= 1.0)
  }
}
