package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class CurationSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs: Array[(Long, String, Array[String])] =
    Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).trim.split(" ")))

  test("repetition stats match a local recompute") {
    val got = Curation.repetition(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    docs.foreach { case (id, _, toks) =>
      val counts = toks.groupBy(identity).map(_._2.length)
      val (n, d, f) = got(id)
      assert(n == toks.length && d == counts.size && f == counts.max,
        s"doc $id: got ($n,$d,$f) want (${toks.length},${counts.size},${counts.max})")
    }
  }

  test("ngramFreq returns the true top-20 bigrams with deterministic tie-break") {
    val local = docs.flatMap(_._3.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).map { case (g, v) => (g, v.length.toLong) }.toSeq
      .sortBy { case (g, n) => (-n, g) }.take(20)
    val got = Curation.ngramFreq(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == local)
  }

  test("sourceMix token shares sum to 1 and match local totals") {
    val rows = Curation.sourceMix(spark, sf).collect()
    val localTokens = docs.groupBy(_._2).view.mapValues(_.map(_._3.length.toLong).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == localTokens(r.getAs[String]("source")))
    }
    val share = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(share - 1.0) < 1e-3)
  }

  test("sourceLangMix cells cover every document and shares sum to 1 per source") {
    val rows = Curation.sourceLangMix(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val s = rs.map(_.getAs[Double]("doc_share_of_source")).sum
      assert(math.abs(s - 1.0) < 1e-3, s"source $src shares sum to $s")
    }
  }

  test("tokenPack offsets are per-source cumulative sums and seq ids are consistent") {
    val got = Curation.tokenPack(spark, sf, 512).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))).toMap
    docs.groupBy(_._2).foreach { case (_, members) =>
      var off = 0L
      members.sortBy(_._1).foreach { case (id, _, toks) =>
        val (_, n, start, seqId, seqOff) = got(id)
        assert(n == toks.length && start == off,
          s"doc $id: start=$start want $off")
        assert(seqId == (off / 512).toInt && seqOff == off % 512)
        off += toks.length
      }
    }
  }

  test("piiScrub removes every digit run and counts them") {
    val rows = Curation.piiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getAs[String]("scrubbed")
      assert(!scrubbed.exists(_.isDigit), s"digits survived: $scrubbed")
    }
    val byId = Tables.load(spark, sf, "events").select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(100).foreach { r =>
      val want = "[0-9]+".r.findAllIn(byId(r.getLong(0))).size
      assert(r.getInt(1) == want)
    }
  }

  test("decontaminate flags exactly the docs sharing a 5-gram with the benchmark slice") {
    val grams = docs.map { case (id, _, toks) =>
      id -> toks.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }.toMap
    val benchGrams = grams.collect { case (id, g) if id % 50 == 0 => g }
      .foldLeft(Set.empty[String])(_ ++ _)
    val got = Curation.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.nonEmpty && got.forall(_._1 % 50 != 0))
    got.foreach { case (id, hits, flag) =>
      val want = grams(id).count(benchGrams.contains)
      assert(hits == want && flag == (want > 0), s"doc $id: hits=$hits want $want")
    }
  }

  test("approxStats sketches stay within tolerance of the exact answers") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("source", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._1)
    val got = Curation.approxStatsRaw(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, rows) =>
      val (apxDistinct, apxP50, nDocs) = got(src)
      assert(nDocs == rows.length.toLong)
      val exactDistinct = rows.map(_._2).distinct.length
      assert(math.abs(apxDistinct - exactDistinct) <= math.max(2, exactDistinct / 10),
        s"$src: approx $apxDistinct vs exact $exactDistinct")
      val sorted = rows.map(_._3).sorted
      // percentile_approx at accuracy 10000 on small groups is exact; allow
      // one rank of slack anyway.
      val lo = sorted((sorted.length - 1) / 2 - 1 max 0)
      val hi = sorted(math.min(sorted.length - 1, (sorted.length - 1) / 2 + 1))
      assert(apxP50 >= lo && apxP50 <= hi, s"$src: p50 $apxP50 not in [$lo,$hi]")
    }
    // Oracle-facing wrapper: every tolerance boolean must come out TRUE
    // (this is exactly what the DuckDB oracle asserts).
    val wrapped = Curation.approxStats(spark, sf).collect()
    assert(wrapped.nonEmpty)
    wrapped.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3), s"${r.getString(0)}: tolerance check failed")
    }
  }

  test("heavyHitters equals the exact top-k and MG keeps every frequent token") {
    val allToks = graft.sources.Tables.load(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).trim.split(" "))
    val exact = allToks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val k = 20
    val expected = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
    val got = Curation.heavyHitters(spark, sf, k).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.length == k)
    got.zip(expected).zipWithIndex.foreach { case (((rank, tok, n), (et, en)), i) =>
      assert(rank == i + 1 && tok == et && n == en, s"rank ${i + 1}: got ($tok,$n) want ($et,$en)")
    }
    // The sketch's superset guarantee: every token with count > n/(m+1)
    // must survive as a candidate (checked with a small m to make the
    // threshold bite on this corpus).
    val m = 64
    val n = allToks.length.toLong
    val sketch = allToks.foldLeft(Map.empty[String, Long]) { (b, t) =>
      val nb = b.updated(t, b.getOrElse(t, 0L) + 1L)
      if (nb.size > m) {
        val thresh = nb.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
        nb.collect { case (tk, c) if c > thresh => tk -> (c - thresh) }
      } else nb
    }
    exact.filter(_._2 > n / (m + 1)).keys.foreach { t =>
      assert(sketch.contains(t), s"frequent token '$t' missing from MG sketch")
    }
  }

  test("heavyHittersGrouped equals the exact per-source top-k") {
    val rows = graft.sources.Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val k = 5
    val expected = rows.groupBy(_._1).flatMap { case (src, docs) =>
      val counts = docs.flatMap(_._2.trim.split(" ")).groupBy(identity)
        .map { case (t, xs) => t -> xs.length.toLong }
      counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
        .map { case ((t, n), i) => (src, i + 1, t, n) }
    }.toSet
    val got = Curation.heavyHittersGrouped(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${expected -- got}  extra=${got -- expected}")
  }

  test("cooccurPmi counts windowed pairs exactly and PMI matches a local formula") {
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0).trim.split(" ").toSeq)
    val window = 2
    val localPairs = texts.flatMap { w =>
      (1 to window).flatMap(d => w.dropRight(d).zip(w.drop(d)))
    }.map { case (a, b) => if (a <= b) (a, b) else (b, a) }
    val pairCounts = localPairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val uni = texts.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val nTok = texts.map(_.size).sum.toDouble
    val nPairs = localPairs.size.toDouble
    val expected = pairCounts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(20)
    val got = Curation.cooccurPmi(spark, sf, window).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((a, b, c, pmi), ((ea, eb), ec)) =>
      assert((a, b, c) == ((ea, eb, ec)), s"pair ($a,$b,$c) vs ($ea,$eb,$ec)")
      val want = math.log(c * nTok * nTok / (nPairs * uni(a) * uni(b))) / math.log(2)
      assert(math.abs(pmi - want) < 1e-5, s"pmi($a,$b)=$pmi want $want")
    }
  }

  test("oovRate matches a local vocabulary-coverage computation") {
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" ").toSeq).toMap
    val vocabSize = 64
    val freq = texts.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val vocab = freq.toSeq.sortBy { case (t, n) => (-n, t) }.take(vocabSize).map(_._1).toSet
    val got = Curation.oovRate(spark, sf, vocabSize).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == texts.keySet)
    got.foreach { case (id, n, oov, rate) =>
      val toks = texts(id)
      val wantOov = toks.count(!vocab.contains(_)).toLong
      assert(n == toks.length.toLong && oov == wantOov, s"doc $id: $oov vs $wantOov")
      assert(math.abs(rate - wantOov.toDouble / toks.length) < 1e-5, s"doc $id rate")
    }
  }

  test("sampleStratified returns exactly k docs per source, deterministically") {
    val k = 7
    val a = Curation.sampleStratified(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val perSource = a.groupBy(_._1)
    val nSources = graft.sources.Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(perSource.size == nSources)
    perSource.foreach { case (src, rows) =>
      assert(rows.length == k, s"source $src")
      assert(rows.map(_._3).sorted.toSeq == (1 to k), s"source $src ranks")
    }
    // Deterministic: a second run picks the identical rows.
    val b = Curation.sampleStratified(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("aggregator-based stratified sample equals the window formulation") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows(Curation.sampleStratifiedAgg(spark, sf, 7)) ==
      rows(Curation.sampleStratified(spark, sf, 7)))
    // The aggregator plan partially aggregates (map-side combine), the
    // skew-proof property: a partial_ aggregation mode appears before the
    // exchange.
    val plan = Curation.sampleStratifiedAgg(spark, sf, 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_ksmallestbyhash"), plan.take(800))
  }

  test("spanDedup counts cross-document spans; hashed-key mode agrees exactly") {
    val exact = Curation.spanDedup(spark, sf)
    // The corpus carries near-duplicate docs sharing long spans: some docs
    // must show duplicated grams, and a shared gram flags BOTH its docs
    // (document frequency counts documents, so dup docs come in groups >= 2).
    assert(exact.where(col("n_dup_grams") > 0).count() >= 2)
    // A local recompute of one duplicated gram's document frequency agrees.
    assert(exact.where(col("n_dup_grams") > col("n_grams")).isEmpty)
    // Every doc with >= 8 tokens contributes sliding-window many grams.
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), " ")).as("n_toks"))
    val joined = exact.join(docs, "doc_id")
      .where(col("n_toks") >= 8)
      .where(col("n_grams") > col("n_toks") - 7) // distinct grams <= window count
    assert(joined.isEmpty)
    // The 8-byte-shuffle-key variant (100 TB mode) is row-identical here.
    val hashed = Curation.spanDedup(spark, sf, hashGrams = true)
    assert(hashed.collect().toSeq == exact.collect().toSeq)
  }

  test("sampleWeighted keeps per-source fractions near their weights, deterministically") {
    val kept = Curation.sampleWeighted(spark, sf)
    val rows = kept.collect()
    // Deterministic: a second run (fresh plan) returns the identical set.
    assert(Curation.sampleWeighted(spark, sf).collect().toSeq == rows.toSeq)
    // Every kept row's weight matches the source-suffix rule.
    rows.foreach { r =>
      val n = r.getAs[String]("source").replaceAll("[^0-9]", "").toInt
      assert(r.getAs[Double]("weight") == (n % 5 + 1) / 10.0)
    }
    // Acceptance rate per source tracks the weight (binomial tolerance on
    // 25-doc strata is wide; just require monotone plausibility bounds).
    val bySource = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    val totalPer = Tables.load(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Small strata (25 docs) are noisy; allow ~4.5 sigma per source but hold
    // the corpus-level total to a tight binomial band.
    bySource.foreach { case (src, k) =>
      val w = (src.replaceAll("[^0-9]", "").toInt % 5 + 1) / 10.0
      val n = totalPer(src).toDouble
      assert(k <= n * w + 4.5 * math.sqrt(n * w * (1 - w)) + 1,
        s"$src kept $k of $n at weight $w")
    }
    val expTotal = totalPer.map { case (src, n) =>
      n * ((src.replaceAll("[^0-9]", "").toInt % 5 + 1) / 10.0)
    }.sum
    assert(math.abs(rows.length - expTotal) <= 3 * math.sqrt(expTotal),
      s"kept ${rows.length}, expected ~$expTotal")
  }

  test("docChunks tile every document with the declared size/stride and reassemble exactly") {
    val chunkSize = 64
    val stride = 48
    val rows = Curation.docChunks(spark, sf, chunkSize, stride).collect()
    val texts = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" ").toSeq).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == texts.keySet, "every document chunks")
    byDoc.foreach { case (id, cs) =>
      val toks = texts(id)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_id"))
      assert(sorted.length == math.ceil(toks.length.toDouble / stride).toInt)
      sorted.foreach { c =>
        val s = c.getAs[Int]("start_tok")
        val expect = toks.slice(s, s + chunkSize)
        assert(c.getAs[String]("chunk_text") == expect.mkString(" "))
        assert(c.getAs[Int]("chunk_tokens") == expect.length)
        assert(c.getAs[Int]("n_tokens") == toks.length)
      }
      // Strided starts: chunk i begins at i*stride, so consecutive chunks
      // overlap by chunkSize - stride tokens.
      assert(sorted.map(_.getAs[Int]("start_tok")).toSeq ==
        sorted.indices.map(_ * stride))
    }
  }

  test("dataRecipe weights sum to 1 and epochs/rate are consistent") {
    val rows = Curation.dataRecipe(spark, sf).collect()
    assert(rows.length == 20)
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4) // rounded weights, 20 * 5e-7 slack
    rows.foreach { r =>
      val epochs = r.getAs[Double]("epochs")
      val rate = r.getAs[Double]("sample_rate")
      assert(rate == math.min(1.0, epochs))
      assert(r.getAs[Long]("n_tokens") > 0)
    }
    // the weight formula up-weights later sources
    val bySrc = rows.map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    assert(bySrc("src19") > bySrc("src0"))
  }

  test("mutualInfo is bounded by both marginal entropies and matches a local recompute") {
    val r = Curation.mutualInfo(spark, sf).collect()(0)
    val mi = r.getAs[Double]("mi_nats"); val hl = r.getAs[Double]("h_lang")
    val hs = r.getAs[Double]("h_source"); val nmi = r.getAs[Double]("nmi")
    assert(mi >= 0.0 && mi <= math.min(hl, hs) + 1e-6)
    assert(nmi >= 0.0 && nmi <= 1.0 + 1e-6)
    // local recompute from raw counts
    val pairs = graft.sources.Tables.load(spark, sf, "documents")
      .select("lang", "source").collect().map(r2 => (r2.getString(0), r2.getString(1)))
    val n = pairs.length.toDouble
    val cells = pairs.groupBy(identity).view.mapValues(_.length.toDouble)
    val lm = pairs.groupBy(_._1).view.mapValues(_.length.toDouble)
    val sm = pairs.groupBy(_._2).view.mapValues(_.length.toDouble)
    val miLocal = cells.map { case ((l, s), c) =>
      (c / n) * math.log(c * n / (lm(l) * sm(s))) }.sum
    assert(math.abs(mi - miLocal) < 1e-5)
    val hlLocal = lm.values.map(c => -(c / n) * math.log(c / n)).sum
    assert(math.abs(hl - hlLocal) < 1e-5)
  }

  test("chi2 matches a brute-force contingency recomputation") {
    val r = Curation.chi2(spark, sf).collect().head
    val pairs = Tables.load(spark, sf, "documents")
      .select("lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = pairs.length.toDouble
    val cells = pairs.groupBy(identity).view.mapValues(_.length.toDouble)
    val lm = pairs.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val sm = pairs.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val chi2Local = cells.map { case ((l, s), obs) =>
      val exp = lm(l) * sm(s) / n
      (obs - exp) * (obs - exp) / exp
    }.sum
    assert(r.getAs[Long]("n_docs") == pairs.length.toLong)
    assert(r.getAs[Long]("dof") == (lm.size - 1).toLong * (sm.size - 1).toLong)
    assert(math.abs(r.getAs[Double]("chi2") - chi2Local) < 1e-4)
    val v = math.sqrt(r.getAs[Double]("chi2") /
      (n * math.min(lm.size - 1, sm.size - 1)))
    assert(math.abs(r.getAs[Double]("cramers_v") - v) < 1e-5)
  }

  test("curriculumInterleave round-robins sources deterministically") {
    val rows = Curation.curriculumInterleave(spark, sf).collect()
    assert(rows.length == 100)
    // positions are the first 100 of the interleaved order
    val positions = rows.map(_.getAs[Long]("position"))
    assert(positions.toSeq == positions.sorted.toSeq)
    val sources = graft.sources.Tables.load(spark, sf, "documents")
      .select("source").distinct().collect().map(_.getString(0)).sorted
    val nS = sources.length
    // every window of |sources| consecutive positions covers each source once
    rows.grouped(nS).filter(_.length == nS).foreach { w =>
      assert(w.map(_.getAs[String]("source")).toSet == sources.toSet)
    }
    // position encodes (rank-within-source, source-index) exactly
    rows.foreach { r =>
      val p = r.getAs[Long]("position")
      assert(sources((p % nS).toInt) == r.getAs[String]("source"))
    }
  }

  test("gopherRules fail counts match a local rule recompute") {
    val stops = Set("the", "a", "of", "and", "is")
    val local = docs.groupBy(_._2).map { case (src, ds) =>
      val flags = ds.map { case (_, _, toks) =>
        val nt = toks.length
        val mwl = toks.map(_.length).sum.toDouble / nt
        val counts = toks.groupBy(identity).map(_._2.length)
        val passLen = nt >= 30 && nt <= 90
        val passWl = mwl >= 4.0 && mwl <= 4.9
        val passTop = counts.max.toDouble / nt <= 0.15
        val passRep = 1.0 - counts.size.toDouble / nt <= 0.6
        val passStop = toks.exists(stops)
        (passLen, passWl, passTop, passRep, passStop)
      }
      src -> (flags.length.toLong, flags.count(!_._1).toLong,
        flags.count(!_._2).toLong, flags.count(!_._3).toLong,
        flags.count(!_._4).toLong, flags.count(!_._5).toLong,
        flags.count(f => f._1 && f._2 && f._3 && f._4 && f._5).toLong)
    }
    val rows = Curation.gopherRules(spark, sf).collect()
    assert(rows.length == local.size)
    rows.foreach { r =>
      val want = local(r.getAs[String]("source"))
      val got = (r.getAs[Long]("n_docs"), r.getAs[Long]("fail_len"),
        r.getAs[Long]("fail_wordlen"), r.getAs[Long]("fail_top"),
        r.getAs[Long]("fail_rep"), r.getAs[Long]("fail_stop"),
        r.getAs[Long]("n_keep"))
      assert(got == want, s"source ${r.getAs[String]("source")}")
    }
    // the thresholds must actually discriminate at the gate SF: some docs
    // kept, some culled (an all-pass or all-fail rule set proves nothing)
    val kept = rows.map(_.getAs[Long]("n_keep")).sum
    val all = rows.map(_.getAs[Long]("n_docs")).sum
    assert(kept > 0 && kept < all, s"keep $kept of $all is not discriminating")
  }

  test("temperatureMix weights are a distribution that flattens the natural shares") {
    val rows = Curation.temperatureMix(spark, sf).collect()
    val localTokens = docs.groupBy(_._2).view
      .mapValues(_.map(_._3.length.toLong).sum).toMap
    assert(rows.length == localTokens.size)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_tokens") == localTokens(r.getAs[String]("source"))))
    val ws = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(ws - 1.0) < 1e-4, s"weights sum to $ws")
    // temperature < 1 flattens: boost strictly decreases as share grows
    val byShare = rows.sortBy(_.getAs[Double]("share"))
      .map(r => (r.getAs[Double]("share"), r.getAs[Double]("boost")))
    byShare.sliding(2).foreach {
      case Array((s1, b1), (s2, b2)) if s1 < s2 =>
        assert(b1 >= b2, s"boost not decreasing: ($s1,$b1) -> ($s2,$b2)")
      case _ => ()
    }
  }

  test("neymanAlloc shares follow N_h*sigma_h and spend the whole budget") {
    val rows = Curation.neymanAlloc(spark, sf).collect()
    val local = docs.groupBy(_._2).view.mapValues { ds =>
      val xs = ds.map(_._3.length.toDouble); val n = xs.size
      val m = xs.sum / n
      val sd = math.sqrt(xs.map(x => x * x).sum / n - m * m)
      (n.toLong, sd, n * sd)
    }.toMap
    val z = local.values.map(_._3).sum
    rows.foreach { r =>
      val (n, sd, ns) = local(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(math.abs(r.getAs[Double]("sigma_tokens") - sd) < 1e-4)
      assert(math.abs(r.getAs[Double]("alloc_share") - ns / z) < 1e-4)
      assert(r.getAs[Long]("alloc_n") ==
        math.floor(ns / z * 1000 + 0.5).toLong)
    }
    val shares = rows.map(_.getAs[Double]("alloc_share")).sum
    assert(math.abs(shares - 1.0) < 1e-4)
  }

  test("cmsError never underestimates and names the true top-20 tokens") {
    val exact = docs.flatMap(_._3).groupBy(identity)
      .map { case (t, v) => (t, v.length.toLong) }
    val top = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    val rows = Curation.cmsError(spark, sf).collect()
    assert(rows.map(r => (r.getAs[String]("tok"), r.getAs[Long]("exact_cnt")))
      .toSeq == top)
    val n = exact.values.sum
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
        s"CMS underestimated ${r.getAs[String]("tok")}")
      assert(r.getAs[Long]("overestimate") ==
        r.getAs[Long]("est_cnt") - r.getAs[Long]("exact_cnt"))
      assert(math.abs(r.getAs[Double]("eps_bound") -
        math.E * n / 1024.0) < 1e-3)
    }
  }

  test("kAnonymity risky classes match a local QID equivalence-class count") {
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select("source", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val classes = d.groupBy { case (s, l, nc) =>
      (s, l, math.floor(nc / 100.0).toLong * 100) }
      .view.mapValues(_.length.toLong).toMap
    val rows = Curation.kAnonymity(spark, sf).collect()
    val bySource = classes.groupBy(_._1._1)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val cls = bySource(src).values.toSeq
      assert(r.getAs[Long]("n_classes") == cls.length.toLong)
      assert(r.getAs[Long]("n_docs") == cls.sum)
      assert(r.getAs[Long]("risky_classes") == cls.count(_ < 5).toLong)
      val atRisk = cls.filter(_ < 5).sum
      assert(r.getAs[Long]("docs_at_risk") == atRisk)
      assert(r.getAs[Double]("risk_share") ==
        math.floor(atRisk.toDouble / cls.sum * 1e6 + 0.5) / 1e6)
    }
  }
}
