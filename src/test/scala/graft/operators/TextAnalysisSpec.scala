package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class TextAnalysisSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs: Map[Long, String] =
    Tables.load(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("textStats token counts match a local split for every document") {
    val rows = TextAnalysis.textStats(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = docs(id).trim.split(" ").length
      assert(r.getAs[Int]("n_tokens") == expected, s"doc $id")
    }
  }

  test("langId is deterministic and majority-en on this corpus") {
    val rows = TextAnalysis.langId(spark, sf).collect()
    val langs = rows.map(_.getAs[String]("lang_detected"))
    assert(langs.toSet.subsetOf(Set("en", "de", "es", "unknown")))
    assert(langs.count(_ == "en") > rows.length / 2)
  }

  test("fingerprint equals a local reimplementation of the rolling hash") {
    val rows = TextAnalysis.fingerprint(spark, sf).collect()
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id).trim.split(" ")
      val expected = toks.foldLeft(7L) { (acc, t) =>
        val h = t.length * 7L + t.charAt(0).toLong
        (acc * 131 + h) % 1000000007L
      }
      assert(r.getAs[Long]("fp") == expected, s"doc $id")
    }
  }

  test("quality scores are in [0,1] and keep flag matches the 0.5 cut") {
    val rows = TextAnalysis.qualityScore(spark, sf).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Boolean]("keep") == (q >= 0.5) ||
        math.abs(q - 0.5) < 1e-6) // rounded display value near the cut
    }
  }

  test("bm25 ranks term-bearing docs, scores positive, and matches a local recompute") {
    val terms = Seq("query", "vector", "merge")
    val rows = TextAnalysis.bm25(spark, sf, terms).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    scores.foreach(s => assert(s > 0.0))
    // Local BM25 recompute over collected docs agrees (to the 6dp rounding).
    val docsRows = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" ").toSeq)
    val n = docsRows.length.toDouble
    val avgdl = docsRows.map(_._2.length).sum.toDouble / n
    val dfq = terms.map(t => t -> docsRows.count(_._2.contains(t)).toDouble).toMap
    def score(toks: Seq[String]): Double = terms.map { t =>
      val tf = toks.count(_ == t).toDouble
      if (tf == 0) 0.0
      else math.log(1.0 + (n - dfq(t) + 0.5) / (dfq(t) + 0.5)) *
        (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
    }.sum
    val expected = docsRows.map { case (id, toks) => (id, score(toks)) }
      .filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(20)
    rows.zip(expected).foreach { case (r, (id, s)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(math.abs(r.getAs[Double]("score") - s) < 1e-5)
    }
  }

  test("entropy matches a local collision-entropy reimplementation") {
    val rows = TextAnalysis.entropy(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == docs.keySet)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val counts = docs(id).trim.split(" ").groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val sumC2 = counts.map(c => c * c).sum
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id n")
      assert(r.getAs[Long]("n_distinct") == counts.size.toLong, s"doc $id d")
      val eff = (n.toDouble * n) / sumC2
      assert(math.abs(r.getAs[Double]("eff_vocab") - eff) < 1e-5, s"doc $id eff")
      assert(math.abs(r.getAs[Double]("h2_bits") - math.log(eff) / math.log(2)) < 1e-5,
        s"doc $id h2")
      // Collision entropy is bounded by log2 of the distinct count, with
      // equality iff tokens are uniform.
      assert(r.getAs[Double]("h2_bits") <= math.log(counts.size.toDouble) / math.log(2) + 1e-6)
    }
  }

  test("multimodal decode emits consistent byte metadata (text falls back to stub dims)") {
    val rows = Multimodal.decodeMeta(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val len = r.getAs[Long]("byte_len")
      assert(len == docs(id).getBytes("UTF-8").length.toLong)
      assert(r.getAs[String]("format") == "unknown")
      assert(r.getAs[Int]("width") == (len % 640).toInt)
      assert(r.getAs[String]("prefix_hex").length == 8)
    }
  }

  test("zipfFit recovers the least-squares line of a local log-log regression") {
    val r = TextAnalysis.zipfFit(spark, sf).collect().head
    val freqs = docs.values.flatMap(_.trim.split(" ")).toSeq
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (tok, n) => (-n, tok) }.take(100).map(_._2)
    val pts = freqs.zipWithIndex.map { case (n, i) =>
      (math.log((i + 1).toDouble), math.log(n.toDouble)) }
    def dsum(xs: Seq[Double]) = xs.map(BigDecimal(_)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val nn = pts.length.toDouble
    val (sx, sy) = (dsum(pts.map(_._1)), dsum(pts.map(_._2)))
    val sxy = dsum(pts.map(p => p._1 * p._2))
    val sxx = dsum(pts.map(p => p._1 * p._1))
    val slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    assert(r.getAs[Long]("n_fit") == freqs.length.toLong,
      "fit covers min(topV, vocabulary) points")
    assert(math.abs(r.getAs[Double]("slope") - BigDecimal(slope)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(r.getAs[Double]("slope") < 0.0, "frequency decays with rank")
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("ngramLm surprisal matches a local add-one bigram model fit on the corpus") {
    val rows = TextAnalysis.ngramLm(spark, sf).collect()
    val toks = docs.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val allBigrams = toks.values.filter(_.length >= 2)
      .flatMap(w => w.sliding(2).map(p => (p(0), p(1)))).toSeq
    val cab = allBigrams.groupBy(identity).view.mapValues(_.size).toMap
    val ca = allBigrams.groupBy(_._1).view.mapValues(_.size).toMap
    val v = toks.values.flatten.toSet.size.toDouble
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    toks.filter(_._2.length >= 2).foreach { case (id, w) =>
      val bgs = w.sliding(2).map(p => (p(0), p(1))).toSeq
      val want = bgs.map { bg =>
        BigDecimal(-math.log((cab(bg) + 1.0) / (ca(bg._1) + v)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / bgs.length
      val r = byDoc(id)
      assert(r.getAs[Long]("n_bigrams") == bgs.length)
      assert(math.abs(r.getAs[Double]("avg_surprisal") -
        BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc $id")
    }
    // Surprisal is positive under add-one smoothing on a finite corpus.
    rows.foreach(r => assert(r.getAs[Double]("avg_surprisal") > 0.0))
  }

  test("keywords ranks per-doc tf-idf top-3 matching an independent computation") {
    val rows = TextAnalysis.keywords(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // Independent tf/df/score computation over the collected corpus.
    val corpus = docs.map { case (id, text) => (id, text.trim.split(" ").toSeq) }
    val nDocs = corpus.size.toDouble
    val dfm = corpus.values.flatMap(_.distinct).groupBy(identity).view
      .mapValues(_.size).toMap
    byDoc.foreach { case (id, rs) =>
      val tf = corpus(id).groupBy(identity).view.mapValues(_.size).toMap
      val scored = tf.map { case (tok, f) =>
        val s = BigDecimal(f * math.log((nDocs + 1.0) / (dfm(tok) + 1.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (tok, f, s)
      }.toSeq.sortBy { case (tok, _, s) => (-s, tok) }.take(3)
      val got = rs.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[String]("tok"), r.getAs[Long]("tf").toInt,
          r.getAs[Double]("score")))
      assert(got.toSeq == scored, s"doc $id")
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
    assert(byDoc.size == docs.size, "every doc gets keywords")
  }

  test("langConfusion cells cover every document and agree with langId row-by-row") {
    val rows = TextAnalysis.langConfusion(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows.values.sum == docs.size)
    val local = TextAnalysis.langId(spark, sf).select("doc_id", "lang_detected")
      .join(Tables.load(spark, sf, "documents").select("doc_id", "lang"), "doc_id")
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_detected")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows == local)
  }

  test("docRarity matches a local mean-IDF computation on the top documents") {
    val rows = TextAnalysis.docRarity(spark, sf, k = 10).collect()
    assert(rows.length == 10)
    val corpus = docs.map { case (id, t) => id -> t.trim.split(" ", -1).toSeq }
    val nDocs = corpus.size
    val dfm = corpus.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    def localRarity(id: Long): Double = {
      val toks = corpus(id)
      val s = toks.map(t => BigDecimal(math.log((nDocs + 1.0) / (dfm(t) + 1.0)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      (s / toks.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_tokens") == corpus(id).length)
      assert(math.abs(r.getAs[Double]("rarity") - localRarity(id)) < 1e-5, s"doc $id")
    }
    // Descending by rarity with doc_id tie-break.
    val scores = rows.map(r => (-r.getAs[Double]("rarity"), r.getAs[Long]("doc_id")))
    assert(scores.sortBy(identity).toSeq == scores.toSeq)
  }

  test("readability counts words/sentences/syllables exactly and scores every doc") {
    val rows = TextAnalysis.readability(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = docs(id)
      val words = text.trim.split(" ", -1).length
      val sentences = math.max("[.!?]+".r.findAllIn(text).size, 1)
      val syllables = "[aeiouy]+".r.findAllIn(text.toLowerCase).size
      assert(r.getAs[Int]("n_words") == words, s"doc $id words")
      assert(r.getAs[Int]("n_sentences") == sentences, s"doc $id sentences")
      assert(r.getAs[Int]("n_syllables") == syllables, s"doc $id syllables")
      val local = BigDecimal(206.835 - 1.015 * (words.toDouble / sentences) -
        84.6 * (syllables.toDouble / words))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("flesch") - local) < 1e-9, s"doc $id flesch")
    }
  }

  test("qualityBySource reconciles with per-doc quality verdicts") {
    val perDoc = TextAnalysis.qualityScore(spark, sf).collect()
    val rows = TextAnalysis.qualityBySource(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == perDoc.length)
    assert(rows.map(_.getAs[Long]("n_keep")).sum ==
      perDoc.count(_.getAs[Boolean]("keep")))
    rows.foreach { r =>
      val rate = r.getAs[Double]("keep_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      val mq = r.getAs[Double]("mean_quality")
      assert(mq >= 0.0 && mq <= 1.0)
    }
  }

  test("vocabGrowth cumulatives are monotone and close at corpus totals") {
    val rows = TextAnalysis.vocabGrowth(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val docs = Tables.load(spark, sf, "documents")
    assert(rows.last.getAs[Long]("n_docs_cum") == docs.count())
    val vocabTotal = docs
      .select(explode(split(trim(col("text")), " ")).as("t"))
      .distinct().count()
    assert(rows.last.getAs[Long]("vocab_cum") == vocabTotal)
    // vocab can only grow, and new_vocab must reconcile with the deltas
    val cums = rows.map(_.getAs[Long]("vocab_cum"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val news = rows.map(_.getAs[Long]("new_vocab"))
    assert(cums.head == news.head)
    assert(news.sum == vocabTotal)
  }

  test("rrfFusion fuses the two rank lists with exact reciprocal weights, sorted") {
    val rows = TextAnalysis.rrfFusion(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val ra = r.getAs[Long]("rank_bm25"); val rb = r.getAs[Long]("rank_tfidf")
      assert(ra >= 1 && rb >= 1)
      val expect = BigDecimal(1.0 / (60 + ra) + 1.0 / (60 + rb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf") == expect)
    }
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (x, y) => x >= y })
    val top = TextAnalysis.bm25(spark, sf).collect().head.getAs[Long]("doc_id")
    assert(rows.map(_.getAs[Long]("doc_id")).contains(top))
  }

  test("tokenizerFertility cells recompute from raw docs and cover the corpus") {
    val rows = TextAnalysis.tokenizerFertility(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val r = rows.head
    val raw = docs.where(col("lang") === r.getAs[String]("lang") &&
        col("source") === r.getAs[String]("source"))
      .select("text").collect().map(_.getString(0))
    val toks = raw.map(_.trim.split(" ", -1).length.toLong).sum
    val chars = raw.map(_.length.toLong).sum
    val bytes = raw.map(_.getBytes("UTF-8").length.toLong).sum
    assert(r.getAs[Long]("tokens") == toks)
    assert(r.getAs[Long]("chars") == chars)
    assert(r.getAs[Long]("bytes") == bytes)
    assert(math.abs(r.getAs[Double]("tokens_per_100_chars") -
      toks * 100.0 / chars) < 1e-5)
    assert(math.abs(r.getAs[Double]("bytes_per_token") -
      bytes.toDouble / toks) < 1e-5)
  }

  test("burstiness Fano factor matches a local zero-inclusive recomputation") {
    val rows = TextAnalysis.burstiness(spark, sf).collect()
    assert(rows.length == 20)
    val texts = Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val n = texts.length
    // counts are ordered by total occurrences desc
    val occs = rows.map(_.getAs[Long]("n_occurrences"))
    assert(occs.zip(occs.tail).forall { case (a, b) => a >= b })
    rows.take(3).foreach { r =>
      val term = r.getAs[String]("term")
      val counts = texts.map(_.trim.split(" ", -1).count(_ == term).toLong)
      assert(r.getAs[Long]("n_occurrences") == counts.sum)
      assert(r.getAs[Long]("n_docs_with") == counts.count(_ > 0).toLong)
      val s = counts.sum.toDouble
      val sq = counts.map(c => c.toDouble * c).sum
      val fano = (n * sq - s * s) / (n * s)
      assert(math.abs(r.getAs[Double]("fano") - fano) < 1e-5)
      // a real corpus content term is overdispersed vs Poisson
      assert(r.getAs[Double]("fano") > 0.0)
    }
  }

  test("hapax profile matches a local per-source vocabulary recount") {
    val rows = TextAnalysis.hapax(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.map(_.getAs[String]("source")).toSet == docs.map(_._1).toSet)
    val src = rows.head.getAs[String]("source")
    val counts = docs.filter(_._1 == src)
      .flatMap(_._2.trim.split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = rows.find(_.getAs[String]("source") == src).get
    assert(r.getAs[Long]("n_tokens") == counts.values.sum)
    assert(r.getAs[Long]("vocab") == counts.size.toLong)
    val hap = counts.values.count(_ == 1L).toLong
    assert(r.getAs[Long]("n_hapax") == hap)
    assert(math.abs(r.getAs[Double]("hapax_share") -
      hap.toDouble / counts.size) < 1e-5)
  }

  test("dupInflation weighs duplicates by tokens and is >= 1") {
    val rows = TextAnalysis.dupInflation(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Double]("inflation") >= 1.0 - 1e-9))
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val src = rows.head.getAs[String]("source")
    val mine = docs.filter(_._1 == src).map(_._2)
    def tok(t: String): Long = t.trim.split(" ", -1).length.toLong
    val r = rows.find(_.getAs[String]("source") == src).get
    assert(r.getAs[Long]("n_docs") == mine.length.toLong)
    assert(r.getAs[Long]("n_distinct") == mine.distinct.length.toLong)
    assert(r.getAs[Long]("total_tokens") == mine.map(tok).sum)
    assert(r.getAs[Long]("distinct_tokens") == mine.distinct.map(tok).sum)
  }

  test("sourceVocabOverlap Jaccard equals a local set computation for one pair") {
    val rows = TextAnalysis.sourceVocabOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val r = rows.head
    val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
    assert(a < b)
    def vocab(s: String): Set[String] =
      docs.filter(_._1 == s).flatMap(_._2.trim.split(" ", -1)).toSet
    val (va, vb) = (vocab(a), vocab(b))
    assert(r.getAs[Long]("va") == va.size.toLong)
    assert(r.getAs[Long]("vb") == vb.size.toLong)
    val shared = (va & vb).size.toLong
    assert(r.getAs[Long]("n_shared") == shared)
    assert(math.abs(r.getAs[Double]("jaccard") -
      shared.toDouble / (va.size + vb.size - shared)) < 1e-5)
  }

  test("ngramNovelty attributes each bigram to its earliest doc exactly") {
    val rows = TextAnalysis.ngramNovelty(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bigrams(t: String): Set[String] = {
      val w = t.trim.split(" ", -1)
      if (w.length < 2) Set.empty
      else w.zip(w.tail).map { case (a, b) => s"$a $b" }.toSet
    }
    val all = docs.map { case (id, t) => id -> bigrams(t) }.toMap
    val first = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, t) =>
      bigrams(t).foreach(g => if (!first.contains(g)) first(g) = id)
    }
    // every doc with >= 2 tokens appears; novelty matches the local recount
    assert(rows.length == docs.count(d => bigrams(d._2).nonEmpty))
    rows.take(5).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val g = all(id)
      assert(r.getAs[Long]("n_distinct_bigrams") == g.size.toLong)
      val novel = g.count(first(_) == id).toLong
      assert(r.getAs[Long]("n_novel") == novel)
    }
    // the earliest doc is 100% novel
    val firstRow = rows.minBy(_.getAs[Long]("doc_id"))
    assert(firstRow.getAs[Double]("novelty") == 1.0)
  }

  test("vocabCoverage is monotone in k and matches a local prefix sum") {
    val rows = TextAnalysis.vocabCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val covs = rows.map(_.getAs[Double]("coverage"))
    assert(covs.zip(covs.tail).forall { case (a, b) => b >= a })
    val toks = Tables.load(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).trim.split(" ", -1))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }
    val total = toks.length.toLong
    rows.foreach { r =>
      val k = r.getAs[Long]("k").toInt
      assert(r.getAs[Long]("total") == total)
      assert(r.getAs[Long]("vocab") == counts.length.toLong)
      val cum = counts.take(k).map(_._2).sum
      assert(math.abs(r.getAs[Double]("coverage") - cum.toDouble / total) < 1e-5)
    }
  }

  test("tokenLenProfile percentiles match a local histogram walk") {
    val rows = TextAnalysis.tokenLenProfile(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val lang = rows.head.getAs[String]("lang")
    val lens = docs.filter(_._1 == lang)
      .flatMap(_._2.trim.split(" ", -1)).map(_.length.toLong).sorted
    def qd(p: Double): Long = lens(math.ceil(lens.length * p).toInt - 1)
    val r = rows.find(_.getAs[String]("lang") == lang).get
    assert(r.getAs[Long]("n_tokens") == lens.length.toLong)
    assert(math.abs(r.getAs[Double]("mean_len") -
      lens.sum.toDouble / lens.length) < 1e-5)
    assert(r.getAs[Long]("p50_len") == qd(0.5))
    assert(r.getAs[Long]("p95_len") == qd(0.95))
  }

  test("charEntropy equals a local bigram-distribution entropy") {
    val rows = TextAnalysis.charEntropy(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val lang = rows.head.getAs[String]("lang")
    val grams = docs.filter(_._1 == lang)
      .flatMap(t => t._2.sliding(2).filter(_.length == 2))
    val counts = grams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = grams.length.toDouble
    val h = math.log(n) - counts.values.map(c => c * math.log(c.toDouble)).sum / n
    val r = rows.find(_.getAs[String]("lang") == lang).get
    assert(r.getAs[Long]("n_bigrams") == grams.length.toLong)
    assert(r.getAs[Long]("vocab") == counts.size.toLong)
    assert(math.abs(r.getAs[Double]("entropy_nats") - h) < 1e-4)
    assert(h >= 0)
  }

  test("surprisalOutliers z-scores standardize ngramLm and flags obey the cut") {
    val lm = TextAnalysis.ngramLm(spark, sf)
      .select("doc_id", "avg_surprisal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = lm.size.toDouble
    val mean = lm.values.sum / n
    val sd = math.sqrt(lm.values.map(x => x * x).sum / n - mean * mean)
    val rows = TextAnalysis.surprisalOutliers(spark, sf).collect()
    assert(rows.length == lm.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val zExact = (lm(id) - mean) / sd
      val z = r.getAs[Double]("z")
      assert(math.abs(z - math.floor(zExact * 1e6 + 0.5) / 1e6) < 1e-9,
        s"doc $id")
      val flag = r.getAs[String]("flag")
      if (zExact > 2.0) assert(flag == "high", s"doc $id")
      else if (zExact < -2.0) assert(flag == "low", s"doc $id")
      else assert(flag == "ok", s"doc $id")
    }
    // standardized scores: corpus mean ~0, sd ~1
    val zs = rows.map(_.getAs[Double]("z"))
    assert(math.abs(zs.sum / zs.length) < 1e-3)
    assert(math.abs(zs.map(z => z * z).sum / zs.length - 1.0) < 1e-2)
  }

  test("sourceKl is nonnegative and matches a local recomputation per source") {
    val rows = TextAnalysis.sourceKl(spark, sf).collect()
    val toks = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.split(" ").map(r.getString(0) -> _))
    val bySource = toks.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val corpus = toks.map(_._2)
    val cc = corpus.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nC = corpus.length.toDouble
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val xs = bySource(src)
      val cs = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nS = xs.length.toDouble
      val kl = cs.map { case (t, c) =>
        val ps = c / nS; val pc = cc(t) / nC
        ps * math.log(ps / pc)
      }.sum
      assert(r.getAs[Long]("n_tokens") == xs.length.toLong)
      assert(r.getAs[Long]("vocab") == cs.size.toLong)
      assert(math.abs(r.getAs[Double]("kl") - kl) < 1e-6, src)
      assert(r.getAs[Double]("kl") >= -1e-9, s"KL must be >= 0 for $src")
    }
  }

  test("burrowsDelta matches a local stopword-rate z-score recomputation") {
    val words = Seq("the", "a", "of", "and", "is", "der", "die", "das", "und",
      "ist", "el", "la", "los", "de", "es")
    val toks = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.split(" ").map(r.getString(0) -> _))
    val bySource = toks.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val f = bySource.map { case (s, xs) =>
      s -> words.map(w =>
        w -> 1000.0 * xs.count(_ == w) / xs.length).toMap
    }
    val k = f.size.toDouble
    val zs = words.flatMap { w =>
      val vals = f.values.map(_(w)).toSeq
      val mu = vals.sum / k
      val sd = math.sqrt(vals.map(v => v * v).sum / k - mu * mu)
      if (sd > 0) f.keys.map(s => (s, w) -> (f(s)(w) - mu) / sd) else Nil
    }.toMap
    val rows = TextAnalysis.burrowsDelta(spark, sf).collect()
    val srcs = f.keys.toSeq.sorted
    assert(rows.length == srcs.size * (srcs.size - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b)
      val ws = words.filter(w => zs.contains((a, w)))
      val delta = ws.map(w => math.abs(zs((a, w)) - zs((b, w)))).sum / ws.size
      assert(r.getAs[Long]("n_words") == ws.size.toLong)
      assert(math.abs(r.getAs[Double]("delta") - delta) < 1e-5, s"($a,$b)")
    }
  }

  test("langMix matrix matches a local half-split detector and counts all docs") {
    val stops = Map(
      "en" -> Set("the", "a", "of", "and", "is"),
      "de" -> Set("der", "die", "das", "und", "ist"),
      "es" -> Set("el", "la", "los", "de", "es"))
    def detect(toks: Array[String]): String = {
      val en = toks.count(stops("en"))
      val de = toks.count(stops("de"))
      val es = toks.count(stops("es"))
      if (en == 0 && de == 0 && es == 0) "unknown"
      else if (en >= de && en >= es) "en"
      else if (de >= es) "de" else "es"
    }
    val local = docs.values.toSeq
      .map(_.trim.split(" ")).filter(_.length >= 4)
      .map { w =>
        val (f, s) = w.splitAt(w.length / 2)
        (detect(f), detect(s))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = TextAnalysis.langMix(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == local.values.sum)
    assert(rows.length == local.size)
    rows.foreach { r =>
      val lf = r.getAs[String]("lang_first")
      val ls = r.getAs[String]("lang_second")
      assert(r.getAs[Long]("n_docs") == local((lf, ls)), s"cell ($lf,$ls)")
      assert(r.getAs[Boolean]("mixed") ==
        (lf != ls && lf != "unknown" && ls != "unknown"))
    }
  }

  /** Per-source and corpus token distributions recomputed locally — the
    * shared ground truth of the JS / Hellinger tests.
    */
  private lazy val tokenDists: (Map[String, Map[String, Double]], Map[String, Double]) = {
    val bySource = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).trim.split(" ").toSeq)
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSeq).toMap
    val srcDist = bySource.view.mapValues { toks =>
      val n = toks.size.toDouble
      toks.groupBy(identity).map { case (t, v) => t -> v.size / n }
    }.toMap
    val all = bySource.values.flatten.toSeq
    val corpus = all.groupBy(identity)
      .map { case (t, v) => t -> v.size.toDouble / all.size }
    (srcDist, corpus)
  }

  test("jsDivergence matches a local recompute, bounded by ln 2, zero vs itself") {
    val (srcDist, corpus) = tokenDists
    val rows = TextAnalysis.jsDivergence(spark, sf).collect()
    assert(rows.length == srcDist.size)
    rows.foreach { r =>
      val p = srcDist(r.getAs[String]("source"))
      val js = corpus.keysIterator.map { t =>
        val ps = p.getOrElse(t, 0.0); val pc = corpus(t)
        val m = (ps + pc) / 2.0
        (if (ps > 0) ps * math.log(ps / m) else 0.0) + pc * math.log(pc / m)
      }.sum / 2.0
      assert(math.abs(r.getAs[Double]("js") - js) < 1e-4,
        s"source ${r.getAs[String]("source")}")
      assert(r.getAs[Double]("js") >= 0.0 &&
        r.getAs[Double]("js") <= math.log(2.0) + 1e-9)
    }
  }

  test("hellinger matches a local recompute and sits in [0, 1]") {
    val (srcDist, corpus) = tokenDists
    val rows = TextAnalysis.hellinger(spark, sf).collect()
    rows.foreach { r =>
      val p = srcDist(r.getAs[String]("source"))
      val bc = p.iterator.map { case (t, ps) => math.sqrt(ps * corpus(t)) }.sum
      val h = math.sqrt(math.max(1.0 - bc, 0.0))
      assert(math.abs(r.getAs[Double]("hellinger") - h) < 1e-4)
      assert(r.getAs[Double]("hellinger") >= 0.0 &&
        r.getAs[Double]("hellinger") <= 1.0)
    }
  }

  test("giniToken matches a local ranked recompute and sits in [0, 1)") {
    val bySource = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).trim.split(" ").toSeq)
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSeq).toMap
    val rows = TextAnalysis.giniToken(spark, sf).collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val toks = bySource(r.getAs[String]("source"))
      val counts = toks.groupBy(identity).toSeq
        .map { case (t, v) => (t, v.size.toLong) }
        .sortBy { case (t, c) => (c, t) }
      val v = counts.size.toLong; val nt = counts.map(_._2).sum
      val ic = counts.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
      val g = 2.0 * ic / (v * nt).toDouble - (v + 1).toDouble / v
      assert(r.getAs[Long]("vocab") == v && r.getAs[Long]("n_tokens") == nt)
      assert(math.abs(r.getAs[Double]("gini") - g) < 1e-5)
      assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
    }
  }

  test("krippendorffAlpha equals a local three-rater coincidence recomputation") {
    val d = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val det = TextAnalysis.langId(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_detected")).toMap
    val srcMaj = d.groupBy(_._3).view.mapValues { docs =>
      docs.groupBy(_._2).view.mapValues(_.length).toSeq
        .minBy { case (lang, n) => (-n, lang) }._1
    }.toMap
    // Per-unit category multiplicities of the 3 ratings.
    val units = d.map { case (id, lang, src) =>
      Seq(lang, det(id), srcMaj(src)).groupBy(identity).view.mapValues(_.size).toMap
    }
    val d2 = units.map(m => 9L - m.values.map(v => v.toLong * v).sum).sum
    val margins = units.flatten.groupBy(_._1).view
      .mapValues(_.map(_._2.toLong).sum).toMap
    val n = margins.values.sum
    val snc2 = margins.values.map(v => v * v).sum
    val alpha = 1.0 - d2.toDouble * (n - 1) / (2.0 * (n * n - snc2))
    val r = TextAnalysis.krippendorffAlpha(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_units") == d.length.toLong)
    assert(r.getAs[Long]("n_ratings") == 3L * d.length)
    assert(math.abs(r.getAs[Double]("d_obs") - d2 / (2.0 * n)) < 1e-6)
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-6)
    assert(r.getAs[Double]("alpha") <= 1.0)
  }

  test("eceQuality bins partition the corpus; per-bin stats match a local quality-vs-gopher replay") {
    val rows = TextAnalysis.eceQuality(spark, sf).collect()
    val q = TextAnalysis.qualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val keepBySource = Curation.gopherRules(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_keep")).toMap
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every doc lands in exactly one bin")
    // Total kept across bins equals the gopher rollup's total keeps —
    // the outcome column is the SAME gate, independently aggregated.
    assert(rows.map(_.getAs[Long]("n_correct")).sum == keepBySource.values.sum)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val inBin = q.values.filter(v =>
        math.min(math.round(v * 1e6) * 10 / 1000000, 9L) == bin)
      assert(inBin.size.toLong == r.getAs[Long]("n_docs"), s"bin $bin")
      val avg = inBin.sum / inBin.size
      assert(math.abs(r.getAs[Double]("avg_conf") - avg) < 1e-5, s"bin $bin")
      val acc = r.getAs[Double]("accuracy")
      val gap = r.getAs[Double]("gap")
      assert(math.abs(gap - math.abs(r.getAs[Double]("avg_conf") - acc)) < 2e-6)
      assert(math.abs(r.getAs[Double]("ece_contrib") -
        r.getAs[Long]("n_docs").toDouble / nDocs * gap) < 2e-6)
    }
    assert(rows.length >= 3, "the score must spread over several bins")
  }

  test("rbo curve matches a local replay over the full fused rankings and is monotone") {
    val rows = TextAnalysis.rbo(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("depth")).toSeq == (1 to 20))
    // Full candidate ranks from the fusion operator itself (topK large
    // enough to keep every candidate).
    val ranks = TextAnalysis.rrfFusion(spark, sf, topK = 1000000).collect()
      .map(r => math.max(r.getAs[Number]("rank_bm25").longValue,
        r.getAs[Number]("rank_tfidf").longValue))
    val weights = TextAnalysis.rboWeights(0.9, 20).toMap
    var cum = 0.0
    rows.foreach { r =>
      val depth = r.getAs[Int]("depth")
      val x = ranks.count(_ <= depth).toLong
      assert(r.getAs[Long]("n_common") == x, s"depth $depth")
      val agreement = x.toDouble / depth
      assert(math.abs(r.getAs[Double]("agreement") - agreement) < 1e-6)
      cum += weights(depth) * agreement
      assert(math.abs(r.getAs[Double]("rbo_cum") - (1.0 - 0.9) / 0.9 * cum) < 1e-5)
    }
    // RBO is a weighted average of agreements, so it stays in [0, 1];
    // the cumulative form can only grow with depth.
    val cums = rows.map(_.getAs[Double]("rbo_cum"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(cums.last >= 0.0 && cums.last <= 1.0)
  }

  test("cohensKappa equals the confusion-matrix formula and is below raw accuracy") {
    val conf = TextAnalysis.langConfusion(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_detected"),
        r.getAs[Long]("n_docs")))
    val n = conf.map(_._3).sum.toDouble
    val po = conf.collect { case (a, b, c) if a == b => c }.sum / n
    val rowT = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colT = conf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val pe = rowT.keysIterator
      .map(l => rowT(l) * colT.getOrElse(l, 0L) / (n * n)).sum
    val r = TextAnalysis.cohensKappa(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_docs") == n.toLong)
    assert(math.abs(r.getAs[Double]("po") - po) < 1e-5)
    assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-5)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-4)
    // chance correction can only LOWER the score
    assert(r.getAs[Double]("kappa") <= r.getAs[Double]("po") + 1e-9)
  }

  test("stopwordDensity matches a local token recount (r11 #373)") {
    val stops = Set("join", "hash", "row", "batch", "scan")
    val local = graft.sources.Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split(" ", -1)))
      .groupBy(_._1).view.mapValues { ds =>
        val toks = ds.map(_._2)
        val nTok = toks.map(_.length.toLong).sum
        val nStop = toks.map(_.count(stops).toLong).sum
        val maxD = toks.map(t => t.count(stops).toDouble / t.length).max
        (ds.length.toLong, nTok, nStop, maxD)
      }.toMap
    val rows = TextAnalysis.stopwordDensity(spark, sf).collect()
    assert(rows.length == local.size)
    rows.foreach { r =>
      val (nd, nt, ns, maxD) = local(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_tokens") == nt)
      assert(r.getAs[Long]("n_stopwords") == ns)
      assert(math.abs(r.getAs[Double]("density") - ns.toDouble / nt) < 1e-6)
      assert(math.abs(r.getAs[Double]("max_doc_density") - maxD) < 1e-6)
    }
  }

  test("shingleCompression matches a local distinct-3-gram recount (r11 #374)") {
    val local = graft.sources.Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split(" ", -1)))
      .filter(_._2.length >= 3)
      .map { case (s, w) =>
        (s, w.sliding(3).map(_.mkString(" ")).toSet)
      }
      .groupBy(_._1).view.mapValues { ds =>
        val total = ds.map(_._2.size.toLong).sum
        val distinct = ds.flatMap(_._2).toSet.size.toLong
        (total, distinct)
      }.toMap
    val rows = TextAnalysis.shingleCompression(spark, sf).collect()
    assert(rows.length == local.size)
    rows.foreach { r =>
      val (tot, dis) = local(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_shingles") == tot, r.toString)
      assert(r.getAs[Long]("n_distinct") == dis, r.toString)
      assert(math.abs(r.getAs[Double]("redundancy") -
        (1.0 - dis.toDouble / tot)) < 1e-6)
    }
  }

  test("dsirWeights matches a local add-one unigram importance recomputation (r12 #384)") {
    val rows = TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_w"))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("lang") == "en",
        r.getAs[String]("text").trim.split(" ").toSeq))
    val ct = scala.collection.mutable.Map.empty[String, Long]
    val cr = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, _, isT, toks) =>
      toks.foreach { t =>
        if (isT) ct(t) = ct.getOrElse(t, 0L) + 1
        else cr(t) = cr.getOrElse(t, 0L) + 1
      }
    }
    val vocab = (ct.keySet ++ cr.keySet)
    val (nt, nr, v) = (ct.values.sum, cr.values.sum, vocab.size.toLong)
    val lr = vocab.map { t =>
      t -> (math.log((ct.getOrElse(t, 0L) + 1).toDouble / (nt + v)) -
        math.log((cr.getOrElse(t, 0L) + 1).toDouble / (nr + v)))
    }.toMap
    val perDoc = docs.map { case (_, src, _, toks) =>
      src -> toks.groupBy(identity).map { case (t, ts) =>
        BigDecimal(ts.size.toDouble * lr(t))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    }
    perDoc.groupBy(_._1).foreach { case (src, ws) =>
      val (n, mean) = rows(src)
      assert(n == ws.size.toLong, s"source=$src")
      val want = (ws.map(_._2).sum / ws.size).toDouble
      assert(math.abs(mean - math.floor(want * 1e6 + 0.5) / 1e6) < 1e-9,
        s"source=$src mean=$mean want=$want")
    }
    // The weights discriminate: English-heavy sources must average higher
    // than the corpus minimum (the resampling signal is real, not flat).
    assert(rows.values.map(_._2).max > rows.values.map(_._2).min)
  }

  test("bpePairs equals a local adjacent-pair count with the same tie-break") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.values.filter(_.length >= 2).foreach { t =>
      (0 until t.length - 1).foreach { i =>
        val p = t.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + 1
      }
    }
    val top = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val rows = TextAnalysis.bpePairs(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(r => (r.getAs[String]("pair"), r.getAs[Long]("n")))
      .toSeq == top)
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to 20))
    // The argmax pair is what one BPE merge round would fuse; on a
    // space-joined word corpus it must straddle or touch a space far more
    // often than chance — sanity that the scan reads adjacency, not bags.
    assert(rows.head.getAs[Long]("n") >= rows.last.getAs[Long]("n"))
  }
}
