package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class DedupSpec extends AnyFunSuite with SparkFixture {

  /** Brute-force word-3-gram Jaccard pairs >= t, computed locally (the test
    * oracle for the LSH path — independent of every Spark expression used by
    * the implementation under test).
    */
  private def brutePairs(threshold: Double): Set[(Long, Long, Double)] = {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ")))
      .filter(_._2.length >= 3)
      .map { case (id, w) => (id, w.sliding(3).map(_.mkString(" ")).toSet) }
    (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (ia, sa) = docs(i)
      (ib, sb) = docs(j)
      inter = sa.intersect(sb).size
      union = sa.size + sb.size - inter
      jac = inter.toDouble / union
      if jac >= threshold
      (lo, hi) = if (ia < ib) (ia, ib) else (ib, ia)
    } yield (lo, hi, jac)).toSet
  }

  test("exact dedup keeps one representative per content hash, covering all docs") {
    val rows = Dedup.exact(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_copies")).sum
    assert(total == Tables.load(spark, sf, "documents").count())
    assert(rows.map(_.getAs[Long]("keep_id")).distinct.length == rows.length)
  }

  test("MinHash-LSH near-dup pairs equal brute-force Jaccard pairs at t=0.6") {
    val got = Dedup.nearDupJaccard(spark, sf, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = brutePairs(0.6).map(p => (p._1, p._2))
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
    assert(expected.nonEmpty, "test data should contain near-duplicates")
  }

  test("SimHash bucketing finds EXACTLY the pairs within Hamming distance 3 (pigeonhole)") {
    val got = Dedup.nearDupSimhash(spark, sf, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    // Ground truth from the fingerprints themselves: all-pairs Hamming scan.
    val fps = Dedup.simhashFingerprints(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      i <- fps.indices.iterator
      j <- (i + 1) until fps.length
      d = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if d <= 3
    } yield (fps(i)._1, fps(j)._1, d.toLong)).toSet
    assert(got == expected, s"missing=${expected -- got} spurious=${got -- expected}")
    assert(expected.nonEmpty, "test data should contain simhash near-dups")
    // Sanity: simhash should catch most of the strongest Jaccard pairs too.
    val strong = brutePairs(0.9).map(p => (p._1, p._2))
    val gotPairs = got.map(p => (p._1, p._2))
    val recall = if (strong.isEmpty) 1.0
      else strong.count(gotPairs.contains).toDouble / strong.size
    assert(recall >= 0.5, s"simhash recall on strong Jaccard pairs: $recall")
  }

  /** Write a synthetic documents.parquet so operators can run on a corpus
    * with a controlled duplicate structure (the driver corpus is read-only).
    */
  private def corpusDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact-duplicate clusters collapse before banding: candidates stay near-linear") {
    // 100 identical docs + 100 mutually-unrelated docs. Without pre-grouping
    // the identical cluster alone emits C(100,2)=4950 band candidates; with
    // it, the cluster is ONE representative and candidate count is ~0.
    val dup = (0L until 100L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val uniq = (100L until 200L).map(i => (i, s"u$i v$i w$i x$i y$i"))
    val dir = corpusDir(dup ++ uniq)
    assert(Dedup.jaccardCandidates(spark, dir).count() <= 10)
    // ...and the final output still contains every duplicate pair, expanded
    // back from the representative, at Jaccard exactly 1.0.
    val pairs = Dedup.nearDupJaccard(spark, dir, 0.6).collect()
    assert(pairs.length == 100 * 99 / 2)
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.forall { case (a, b) => a < b && b < 100 })
    assert(ids.distinct.length == ids.length)
  }

  test("simhash multi-block keys: identical fingerprints pre-group, candidates near-linear") {
    val dup = (0L until 100L).map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
    // Unrelated docs need unrelated TOKENS: the cross-engine char-polynomial
    // hash maps strings differing only in a final digit to hashes differing
    // by ±1, which correlates fingerprints by construction. Random words
    // model a real heterogeneous corpus.
    val uniq = (100L until 200L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Seq.fill(8)(Seq.fill(8)(('a' + rnd.nextInt(26)).toChar).mkString).mkString(" "))
    }
    val dir = corpusDir(dup ++ uniq)
    // Candidate generation runs over DISTINCT fingerprints with >=32-bit
    // composite keys: random collisions need a 1-in-2^32 agreement, so the
    // unrelated docs contribute ~0 candidates.
    assert(Dedup.simhashCandidates(spark, dir).count() <= 10)
    val got = Dedup.nearDupSimhash(spark, dir, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // All C(100,2) identical pairs surface at Hamming 0 via the group path.
    val withinDup = got.filter { case (a, b, _) => a < 100 && b < 100 }
    assert(withinDup.size == 100 * 99 / 2)
    assert(withinDup.forall(_._3 == 0))
    // Cross-check the whole output against a brute-force Hamming scan.
    val fps = Dedup.simhashFingerprints(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      i <- fps.indices.iterator
      j <- (i + 1) until fps.length
      d = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if d <= 3
    } yield (math.min(fps(i)._1, fps(j)._1), math.max(fps(i)._1, fps(j)._1), d)).toSet
    assert(got == expected, s"missing=${expected -- got} spurious=${got -- expected}")
  }

  test("curate tags every doc with exactly one fate and precedence holds") {
    val rows = Dedup.curate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(rows.length == Tables.load(spark, sf, "documents").count())
    assert(rows.forall { case (_, reason, kept) => kept == (reason == "kept") })
    val reasons = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(reasons.getOrElse("kept", 0) > 0, s"reasons=$reasons")
    // Independent cross-check of the exact-dup tag: docs that are not the
    // min id of their normalized-content group, minus those claimed first
    // by nothing (exact_dup has top precedence).
    val byContent = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase))
      .groupBy(_._2).values.flatMap { g =>
        val minId = g.map(_._1).min
        g.map(_._1).filter(_ != minId)
      }.toSet
    assert(rows.filter(r => r._2 == "exact_dup").map(_._1).toSet == byContent)
  }

  test("dedupClusters equals union-find over the brute-force near-dup pairs") {
    val pairs = brutePairs(0.6).map(p => (p._1, p._2))
    // Local union-find ground truth.
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = Dedup.dedupClusters(spark, sf, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val ids = Tables.load(spark, sf, "documents").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == ids, "every document gets a cluster label")
    got.foreach { case (id, cluster, canonical) =>
      assert(cluster == find(id), s"doc $id: cluster $cluster want ${find(id)}")
      assert(canonical == (id == cluster))
    }
    assert(got.exists(g => g._1 != g._2), "test data should contain non-trivial clusters")
  }

  test("simhash fingerprints are deterministic across runs") {
    val a = Dedup.simhashFingerprints(spark, sf).orderBy("doc_id").collect().toSeq
    val b = Dedup.simhashFingerprints(spark, sf).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("the SQL-surface token_simhash64 equals the DataFrame kernel fingerprints") {
    val viaSql = Dedup.simhashViaSql(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDf = Dedup.simhashFingerprints(spark, sf).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf)
  }

  test("WordNgrams kernel equals the transform/concat_ws lambda formulation") {
    import org.apache.spark.sql.graftglue._
    val base = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .where(size(col("w")) >= 3)
    val kernel = base.select(col("doc_id"),
      exprColumn(graft.functions.WordNgrams(columnExpr(col("w")), 3)).as("sh"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSeq))
    val lambda = base.select(col("doc_id"),
      array_distinct(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"))
        .as("sh"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSeq))
    assert(kernel.toSeq == lambda.toSeq)
    // And the codegen path is actually exercised: sub-n-gram inputs yield [].
    assert(graft.functions.WordNgrams
      .compute(new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("one"))), 3)
      .numElements() == 0)
  }

  test("dupRateBySource: totals reconcile and rates are exact per source") {
    val rows = Dedup.dupRateBySource(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.toLowerCase))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    val bySource = docs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val texts = bySource(src).map(_._2)
      assert(r.getAs[Long]("n_docs") == texts.length)
      assert(r.getAs[Long]("n_unique") == texts.distinct.length)
      assert(r.getAs[Long]("n_redundant") == texts.length - texts.distinct.length)
    }
  }

  test("curateStats reconciles exactly with the per-document curate verdicts") {
    val perDoc = Dedup.curate(spark, sf).collect()
      .map(_.getAs[String]("reason"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = Dedup.curateStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("share")))
    assert(rows.map(r => r._1 -> r._2).toMap == perDoc)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
  }

  test("dupMatrix totals equal the near-dup pair count, keys are unordered source pairs") {
    val pairs = Dedup.nearDupJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = Dedup.dupMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum == pairs.length)
    rows.foreach { case (a, b, n) => assert(a <= b && n > 0) }
    // Cross-check one cell against a local join of pairs x sources.
    val src = Tables.load(spark, sf, "documents").select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val local = pairs.map { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.length).toMap
    rows.foreach { case (a, b, n) => assert(local((a, b)) == n, s"($a,$b)") }
  }

  test("containmentPairs finds subset-shaped near-dups Jaccard banding misses") {
    val rows = Dedup.containmentPairs(spark, sf, threshold = 0.9).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, inter) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("inter"))
      assert(inter <= math.min(na, nb))
      val c = r.getAs[Double]("containment")
      val j = r.getAs[Double]("jaccard")
      assert(c >= 0.9 && c <= 1.0)
      assert(j <= c + 1e-9, "containment dominates jaccard")
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("cosineDup matches a local tf-idf cosine recomputation over the capped vocabulary") {
    val rows = Dedup.cosineDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("shared_terms"), r.getAs[Double]("cos"))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim)
    val n = docs.length.toDouble
    val tf = docs.map { case (id, text) =>
      id -> text.split(" ").groupBy(identity).view.mapValues(_.length).toMap
    }.toMap
    val df = docs.flatMap(d => tf(d._1).keys.map(_ -> d._1))
      .groupBy(_._1).view.mapValues(_.length).toMap
    val idf = df.filter(_._2 <= 100).map { case (t, d) =>
      t -> math.log(n / d)
    }
    val vecs = tf.view.mapValues(m => m.collect {
      case (t, c) if idf.contains(t) => t -> c * idf(t)
    }.toMap).toMap
    def cos(a: Long, b: Long): Option[Double] = {
      val (va, vb) = (vecs(a), vecs(b))
      if (va.isEmpty || vb.isEmpty) None
      else {
        val dot = va.keySet.intersect(vb.keySet).toSeq
          .map(t => va(t) * vb(t)).sum
        val na = math.sqrt(va.values.map(x => x * x).sum)
        val nb = math.sqrt(vb.values.map(x => x * x).sum)
        Some(dot / (na * nb))
      }
    }
    // every engine pair is locally confirmed
    rows.foreach { case ((a, b), (shared, c)) =>
      assert(a < b)
      val local = cos(a, b)
      assert(local.isDefined, s"($a,$b)")
      assert(math.abs(c - local.get) < 1e-4 || c == 1.0 && docs.toMap.apply(a) == docs.toMap.apply(b), s"($a,$b)")
      assert(c >= 0.6 - 1e-6)
      assert(shared > 0)
    }
    // every clearly-above-threshold local pair is found
    val ids = docs.map(_._1).sorted
    for (i <- ids.indices; j <- i + 1 until ids.length) {
      val (a, b) = (ids(i), ids(j))
      cos(a, b).foreach { c =>
        if (c >= 0.6 + 1e-4)
          assert(rows.contains((a, b)), s"missing pair ($a,$b) cos=$c")
      }
    }
    // exact duplicates score exactly 1.0
    val byText = docs.groupBy(_._2).values.filter(_.length >= 2)
    byText.foreach { g =>
      val sorted = g.map(_._1).sorted
      if (vecs(sorted.head).nonEmpty)
        assert(rows((sorted(0), sorted(1)))._2 == 1.0)
    }
  }

  test("dedupRecall counts match a doc-level local recomputation and recall is monotone") {
    val rows = Dedup.dedupRecall(spark, sf).collect()
      .map(r => r.getAs[Double]("tau") ->
        (r.getAs[Long]("gt_pairs"), r.getAs[Long]("detected_pairs"))).toMap
    assert(rows.keySet == Set(0.5, 0.6, 0.7, 0.8))
    // local doc-level ground truth: exact Jaccard over 3-gram shingle sets
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" "))
      .filter(_._2.length >= 3)
    val sets = docs.map { case (id, w) =>
      id -> w.sliding(3).map(_.mkString(" ")).toSet
    }
    // local simhash agreement is checked via the engine's own fingerprints
    val fps = Dedup.simhashFingerprints(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairStats = for {
      i <- sets.indices.iterator
      j <- (i + 1 until sets.length).iterator
      inter = sets(i)._2.intersect(sets(j)._2).size
      if inter > 0
    } yield {
      val jac = inter.toDouble /
        (sets(i)._2.size + sets(j)._2.size - inter)
      val ham = java.lang.Long.bitCount(fps(sets(i)._1) ^ fps(sets(j)._1))
      (jac, ham)
    }
    val stats = pairStats.toSeq
    Seq(0.5, 0.6, 0.7, 0.8).foreach { tau =>
      val gt = stats.count(_._1 >= tau).toLong
      val det = stats.count(p => p._1 >= tau && p._2 <= 3).toLong
      assert(rows(tau) == ((gt, det)), s"tau=$tau")
    }
    // recall can only improve as the threshold tightens
    val recalls = Seq(0.5, 0.6, 0.7, 0.8).flatMap { t =>
      val (g, d) = rows(t); if (g > 0) Some(d.toDouble / g) else None
    }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-9 })
  }

  test("lshCurve expectations match a local collision-probability replay") {
    val rows = Dedup.lshCurve(spark, sf).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")) -> r)
      .toMap
    assert(rows.keySet == Set((32L, 2L), (20L, 3L), (16L, 4L), (8L, 8L)))
    // local doc-level Jaccard distribution
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" "))
      .filter(_._2.length >= 3)
    val sets = docs.map { case (id, w) =>
      w.sliding(3).map(_.mkString(" ")).toSet
    }
    val js = (for {
      i <- sets.indices.iterator
      j <- (i + 1 until sets.length).iterator
      inter = sets(i).intersect(sets(j)).size
      if inter > 0
    } yield inter.toDouble / (sets(i).size + sets(j).size - inter)).toSeq
    def pCollide(j: Double, b: Int, r: Int) =
      1.0 - math.pow(1.0 - math.pow(j, r), b)
    rows.foreach { case ((b, r), row) =>
      val gt = js.count(_ >= 0.6).toLong
      assert(row.getAs[Long]("gt_pairs") == gt)
      val expCand = js.map(pCollide(_, b.toInt, r.toInt)).sum
      val expDet = js.filter(_ >= 0.6).map(pCollide(_, b.toInt, r.toInt)).sum
      assert(math.abs(row.getAs[Double]("exp_candidates") - expCand) < 1e-3)
      assert(math.abs(row.getAs[Double]("exp_detected") - expDet) < 1e-3)
      if (gt > 0)
        assert(math.abs(row.getAs[Double]("exp_recall") - expDet / gt) < 1e-3)
    }
    // more bands at fewer rows per band must never lower expected recall
    val r32 = rows((32L, 2L)).getAs[Double]("exp_recall")
    val r8 = rows((8L, 8L)).getAs[Double]("exp_recall")
    assert(r32 >= r8 - 1e-9)
  }

  test("prefixDup groups all exceed 1 doc and keep_id is a group member") {
    val rows = Dedup.prefixDup(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("n_docs") >= 2))
    // spot-check: a reported prefix really is shared by n_docs documents
    if (rows.nonEmpty) {
      val r0 = rows.head
      val n = Tables.load(spark, sf, "documents")
        .where(concat_ws(" ", slice(split(trim(col("text")), " "), 1, 8)) ===
          r0.getAs[String]("prefix"))
        .count()
      assert(n == r0.getAs[Long]("n_docs"))
    }
  }

  test("suffixDup groups match a local last-8-token fingerprint exactly") {
    val rows = Dedup.suffixDup(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("n_docs") >= 2))
    // recompute the whole grouping locally and compare group-for-group
    val local = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).trim.split(" ")
        (w.drop(math.max(w.length - 8, 0)).mkString(" "), r.getLong(0))
      }
      .groupBy(_._1).view.mapValues(g => (g.map(_._2).min, g.length.toLong))
      .filter(_._2._2 >= 2).toMap
    assert(rows.length == local.size)
    rows.foreach { r =>
      val (keep, n) = local(r.getAs[String]("suffix"))
      assert(r.getAs[Long]("keep_id") == keep)
      assert(r.getAs[Long]("n_docs") == n)
    }
  }

  test("dedupYield is monotone in threshold and its 0.6 row equals nearDupJaccard") {
    val rows = Dedup.dedupYield(spark, sf).collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs_removed"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9))
    // tightening the threshold can only shrink both counts
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2, s"pairs monotone at ${hi._1}")
      assert(lo._3 >= hi._3, s"docs monotone at ${hi._1}")
    }
    // the loosest row is exactly the nearDupJaccard(0.6) pair list
    val nd = Dedup.nearDupJaccard(spark, sf, 0.6).collect()
    assert(rows.head._2 == nd.length.toLong)
    assert(rows.head._3 ==
      nd.map(_.getAs[Long]("doc_b")).distinct.length.toLong)
  }

  test("winnowDup pair counts equal a local winnowing fingerprint recomputation") {
    val P = 1000000007L
    val B = 1000003L
    def tokHash(t: String): Long =
      t.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % P)
    def fingerprints(text: String): Set[Long] = {
      val w = text.trim.split(" ").filter(_.nonEmpty)
      if (w.length < 7) return Set.empty
      val th = w.map(tokHash)
      val kh = (0 to th.length - 4).map(i =>
        (((th(i) * B + th(i + 1)) % P * B + th(i + 2)) % P * B + th(i + 3)) % P)
      (0 to kh.length - 4).map(i => kh.slice(i, i + 4).min).toSet
    }
    val docsArr = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // rep collapse: min doc_id per trimmed content
    val reps = docsArr.groupBy(_._2.trim).map(_._2.minBy(_._1)).toArray
    val fps = reps.map { case (id, t) => id -> fingerprints(t) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      shared = (fa & fb).size if shared >= 3
    } yield (a, b) -> shared.toLong).toMap
    val rows = Dedup.winnowDup(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(expected(key) == r.getAs[Long]("n_shared"), key)
    }
  }

  test("editDup distances are exact Levenshtein within prefix blocks") {
    val rows = Dedup.editDup(spark, sf).collect()
    val texts = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val cur = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(a.length)
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a < b)
      val dist = r.getAs[Int]("edit_dist")
      assert(dist <= 30)
      assert(dist == lev(texts(a).take(200), texts(b).take(200)), s"($a,$b)")
      // blocked pairs really share the 8-token prefix
      assert(texts(a).split(" ").take(8).toSeq ==
        texts(b).split(" ").take(8).toSeq)
    }
  }

  test("incrementalDedup covers the batch once with consistent verdicts") {
    val docs = Tables.load(spark, sf, "documents")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val rows = Dedup.incrementalDedup(spark, sf).collect()
    // exactly the post-cutoff batch, each doc once
    assert(rows.map(_.getAs[Long]("doc_id")).toSet ==
      docs.where(col("doc_id") > maxId / 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    val verdicts = rows.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.subsetOf(Set("keep", "dup_of_history", "dup_in_batch")))
    // a keep verdict means its prefix key is absent from history: spot-check
    // by recomputing one doc's key membership
    val keyOf = concat_ws(" ", slice(split(trim(col("text")), " "), 1, 8))
    val histKeys = docs.where(col("doc_id") <= maxId / 2)
      .select(keyOf.as("k")).distinct().collect().map(_.getString(0)).toSet
    val textById = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val words = textById(r.getAs[Long]("doc_id")).trim.split(" ", -1).take(8)
      val inHist = histKeys.contains(words.mkString(" "))
      val v = r.getAs[String]("verdict")
      if (v == "dup_of_history") assert(inHist)
      if (v == "keep") assert(!inHist)
    }
  }

  test("templateDup partitions the corpus and digit-variants collapse") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = Dedup.templateDup(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum == docs.count())
    // injected check on real text: normalizing digits of any document maps
    // it into exactly one group whose exemplar matches its own normal form
    val sample = docs.select(lower(trim(regexp_replace(col("text"),
      "[0-9]+", "0"))).as("norm")).head().getAs[String]("norm")
    val tmpl = sample.substring(0, math.min(60, sample.length))
    assert(rows.count(_.getAs[String]("template") == tmpl) >= 1)
  }

  test("dupLangMatrix accounts for every near-dup pair with ordered lang keys") {
    val rows = Dedup.dupLangMatrix(spark, sf).collect()
    val nPairs = Dedup.nearDupJaccard(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nPairs)
    rows.foreach { r =>
      assert(r.getAs[String]("lang_a") <= r.getAs[String]("lang_b"))
      assert(r.getAs[Long]("n_pairs") >= 1L)
    }
    // cross-check one cell against a direct pair-level lang join
    val langs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byCell = Dedup.nearDupJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map { r =>
        val (la, lb) = (langs(r.getLong(0)), langs(r.getLong(1)))
        if (la <= lb) (la, lb) else (lb, la)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(byCell((r.getAs[String]("lang_a"), r.getAs[String]("lang_b"))) ==
        r.getAs[Long]("n_pairs"))
    }
  }

  test("editDup blockCap skips oversized prefix blocks and reports the mass") {
    // Default cap (64) skips nothing on the gate corpus...
    val dflt = Dedup.editDup(spark, sf).collect()
    assert(dflt.forall(_.getAs[Long]("skipped_blocks") == 0L))
    // ...a cap of 1 skips EVERY multi-rep block, so no pair can survive.
    assert(Dedup.editDup(spark, sf, blockCap = 1).count() == 0L)
    // A cap of 2 keeps only 2-rep blocks: every surviving pair's block
    // had exactly 2 members, and the skip counters are visible on rows.
    val two = Dedup.editDup(spark, sf, maxDist = 1000, blockCap = 2).collect()
    assert(two.nonEmpty, "gate corpus needs a 2-rep prefix block")
    val expSkipBlocks = {
      Tables.load(spark, sf, "documents")
        .withColumn("ckey", sha2(trim(col("text")), 256))
        .withColumn("rep_id", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("ckey")))
        .where(col("doc_id") === col("rep_id"))
        .select(concat_ws(" ",
          slice(split(trim(col("text")), " "), 1, 8)).as("pkey"))
        .groupBy("pkey").count().where(col("count") > 2).count()
    }
    assert(two.head.getAs[Long]("skipped_blocks") == expSkipBlocks)
  }

  test("dedupRecall stop-shingle cap excludes boilerplate and reports it") {
    val dflt = Dedup.dedupRecall(spark, sf).collect()
    assert(dflt.forall(_.getAs[Long]("n_stop_shingles") == 0L),
      "default cap (1024) must not trigger on the gate corpus")
    // Cap 0: EVERY shingle is a stop shingle — the ground truth empties
    // (gt = detected = 0 at every tau) and the full exclusion is reported.
    val all = Dedup.dedupRecall(spark, sf, shingleDfCap = 0).collect()
    assert(all.forall(r => r.getAs[Long]("gt_pairs") == 0L &&
      r.getAs[Long]("detected_pairs") == 0L &&
      r.getAs[Long]("n_stop_shingles") > 0L))
  }

  test("lshCurve rejects non-positive band/row configs") {
    // r12 lifted the power-of-two restriction (binary exponentiation);
    // the remaining input contract is positivity.
    intercept[IllegalArgumentException] {
      Dedup.lshCurve(spark, sf, configs = Seq((0, 3)))
    }
    intercept[IllegalArgumentException] {
      Dedup.lshCurveOracleSql(configs = Seq((8, -1)))
    }
  }

  test("clusterSizeHist is the exact histogram of the engine's own cluster map") {
    val hist = Dedup.clusterSizeHist(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters")).toMap
    val assign = Dedup.dedupClusters(spark, sf).collect()
      .map(_.getAs[Long]("cluster_id"))
    val expect = assign.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(hist == expect)
    // histogram conserves documents
    assert(hist.map { case (sz, n) => sz * n }.sum == assign.length.toLong)
  }

  test("dedupWeights: weights are 1/cluster-size and sum to the cluster count") {
    val rows = Dedup.dedupWeights(spark, sf).collect()
    val assign = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val sizes = assign.values.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    assert(rows.length == assign.size)
    rows.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      assert(assign(r.getAs[Long]("doc_id")) == cid)
      assert(r.getAs[Long]("cluster_size") == sizes(cid).toLong)
      val w = 1.0 / sizes(cid)
      assert(math.abs(r.getAs[Double]("weight") -
        math.floor(w * 1e6 + 0.5) / 1e6) < 1e-12)
    }
    // Σw = number of clusters (each cluster's members sum to exactly 1)
    val eff = rows.head.getAs[Double]("effective_docs")
    assert(rows.forall(r => math.abs(r.getAs[Double]("effective_docs") - eff) < 1e-12))
    assert(math.abs(eff - sizes.size.toDouble) < 1e-3,
      s"effective $eff vs ${sizes.size} clusters")
  }

  test("dedupCanonical keeps the max-quality member of every >=2 cluster (r11 #375)") {
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    val quality = TextAnalysis.qualityScore(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"))).toMap
    val expect = clusters.groupBy(_._2).filter(_._2.length >= 2)
      .map { case (cid, ms) =>
        val keep = ms.map(_._1).minBy(d => (-quality(d), d))
        cid -> (ms.length.toLong, keep, quality(keep))
      }
    val rows = Dedup.dedupCanonical(spark, sf).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, keep, q) = expect(r.getAs[Long]("cluster_id"))
      assert(r.getAs[Long]("n_members") == n)
      assert(r.getAs[Long]("keep_id") == keep)
      assert(r.getAs[Double]("keep_quality") == q)
    }
  }

  test("lshCurve scores non-power-of-two band configs via binary exponentiation (r12 #326)") {
    // (20,3): 1-(1-j^3)^20 — the old squaring chain could only do powers
    // of two. Cross-check the collision formula against a local BigDecimal
    // recomputation from the exact pair distribution at a single j.
    val rows = Dedup.lshCurve(spark, sf, configs = Seq((20, 3), (32, 2)))
      .collect()
    assert(rows.length == 2)
    val r203 = rows.find(r => r.getAs[Long]("bands") == 20L).get
    assert(r203.getAs[Long]("rows_per_band") == 3L)
    val rec = r203.getAs[Double]("exp_recall")
    assert(rec >= 0.0 && rec <= 1.0)
    // Cross-config ordering that holds analytically for every j in (0,1):
    // 32*ln(1-j^2) < 20*ln(1-j^3) (both logs negative, |j^2| > |j^3|), so
    // P(32,2)(j) > P(20,3)(j) pointwise and the expected candidate mass of
    // (20,3) is strictly lower whenever any pair sits below j = 1.
    val r322 = rows.find(r => r.getAs[Long]("bands") == 32L).get
    assert(r203.getAs[Double]("exp_candidates") <
      r322.getAs[Double]("exp_candidates"))
  }

  test("exact ground-truth acceptance ceiling refuses oversized corpora unless forced (r12 #322/#326)") {
    // Lower the ceiling below the test corpus so the guard fires, then
    // confirm the two escape hatches: a sampling cut, and the explicit
    // force flag for signed-off acceptance runs.
    spark.conf.set("spark.graft.exactGroundTruth.maxDocs", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.dedupRecall(spark, sf)
      }
      assert(e.getMessage.contains("acceptance ceiling"))
      val e2 = intercept[IllegalArgumentException] {
        Dedup.lshCurve(spark, sf)
      }
      assert(e2.getMessage.contains("acceptance ceiling"))
      // Sampled mode never blocks — it IS the scale path.
      assert(Dedup.dedupRecall(spark, sf, sampleCutHex = "3").collect()
        .nonEmpty)
      spark.conf.set("spark.graft.exactGroundTruth.force", "true")
      assert(Dedup.dedupRecall(spark, sf).collect().nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.exactGroundTruth.maxDocs")
      spark.conf.unset("spark.graft.exactGroundTruth.force")
    }
  }
}
