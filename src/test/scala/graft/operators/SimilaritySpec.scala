package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite with SparkFixture {

  /** Local top-k oracle: sequential double fold, same math, no Spark. */
  private def localTopK(nQueries: Int, k: Int): Map[Long, Seq[Long]] = {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    vecs.filter(_._1 < nQueries).map { case (qid, qv) =>
      val scored = vecs.filter(_._1 != qid).map { case (id, v) =>
        (id, dot(v, qv) / (norms(id) * norms(qid)))
      }
      qid -> scored.sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSeq
    }.toMap
  }

  test("bruteTopK matches an independent local computation exactly") {
    val got = Similarity.bruteTopK(spark, sf, nQueries = 5, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq
      }
    assert(got == localTopK(5, 10))
  }

  test("LSH results are a subset of brute-force candidates with sane ranks") {
    val brute = localTopK(5, 500) // full ranking per query
    val rows = Similarity.lshTopK(spark, sf, nQueries = 5, k = 10).collect()
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to rs.length), s"ranks must be dense for query $q")
      rs.foreach(r => assert(brute(q).contains(r.getAs[Long]("vec_id"))))
    }
  }

  test("LSH recall@10 vs brute force is useful (> 0.2 with auto-scaled bits)") {
    val brute = localTopK(5, 10)
    val lsh = Similarity.lshTopK(spark, sf, nQueries = 5, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = brute.map { case (q, top) =>
      top.count(lsh.getOrElse(q, Set.empty).contains).toDouble / top.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.2, s"mean recall@10 = $mean")
  }

  test("auto-scaled bits keep expected bucket occupancy constant as N grows") {
    // ceil(log2 N) - 2 => N / 2^bits stays in [2, 4): per-query candidate
    // work is O(nTables), independent of corpus size.
    for (n <- Seq(100L, 500L, 2000L, 1000000L, 1000000000L)) {
      val b = Similarity.autoBits(n, maxBits = 64)
      val occupancy = n.toDouble / (1L << b)
      assert(b >= 6, s"n=$n bits=$b")
      if (n >= 256) assert(occupancy >= 2 && occupancy < 4.0001, s"n=$n bits=$b occ=$occupancy")
    }
    assert(Similarity.autoBits(2000, maxBits = 8) == 8) // cap honored
  }

  test("LSH candidate set stays far below N*Q (the scale contract)") {
    val n = Tables.load(spark, sf, "embeddings").count()
    val q = 5
    val cands = Similarity.candidatePairs(spark, sf, q, 0, 16, 24).count()
    assert(cands > 0)
    assert(cands * 4 < n * q, s"candidates=$cands vs N*Q=${n * q}")
  }

  test("multi-probe lifts recall at identical index cost (query-side Hamming-1 probes)") {
    val brute = localTopK(5, 10)
    def meanRecall(probes: Int): Double = {
      val lsh = Similarity.lshTopK(spark, sf, nQueries = 5, k = 10,
        nBits = 10, nTables = 8, probes = probes).collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
      val rs = brute.map { case (q, top) =>
        top.count(lsh.getOrElse(q, Set.empty).contains).toDouble / top.size
      }
      rs.sum / rs.size
    }
    val single = meanRecall(0)
    val multi = meanRecall(1)
    // 10-bit buckets on 500 vectors are sparse: single-probe recall collapses,
    // probing the nBits Hamming-1 buckets per query recovers it with the SAME
    // corpus-side index (only the broadcast query set expands).
    assert(multi > single, s"multi=$multi single=$single")
    assert(multi > 0.15, s"multi-probe recall = $multi")
  }

  test("embedding near-dup pairs are a recall-bounded subset of brute-force cosine pairs") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dotL(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dotL(v, v)) }.toMap
    val brute = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      (ia, va) = vecs(i)
      (ib, vb) = vecs(j)
      if dotL(va, vb) / (norms(ia) * norms(ib)) >= 0.4
    } yield (math.min(ia, ib), math.max(ia, ib))).toSet
    val got = Similarity.nearDupEmbedding(spark, sf, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "bucketed near-dup should surface some pairs")
    assert(got.subsetOf(brute), s"spurious pairs: ${got -- brute}")
    val recall = got.size.toDouble / brute.size
    assert(recall > 0.2, s"recall vs brute force = $recall (${got.size}/${brute.size})")
  }

  test("IVF probes a sublinear slice of the corpus and still finds useful neighbors") {
    val n = Tables.load(spark, sf, "embeddings").count()
    val rows = Similarity.ivfTopK(spark, sf, nQueries = 5, k = 10).collect()
    // Results are true cosine scores over the probed partitions only: every
    // returned id must appear in the full brute-force ranking order-consistently.
    val brute = localTopK(5, 500)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val ids = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq
      assert(ids.distinct.size == ids.size)
      // order within the IVF result must agree with the brute ranking order
      val pos = ids.map(brute(q).indexOf(_))
      assert(pos.forall(_ >= 0) && pos == pos.sorted, s"q=$q ids=$ids pos=$pos")
    }
    val top10 = localTopK(5, 10)
    val recalls = top10.map { case (q, top) =>
      val got = rows.filter(_.getAs[Long]("q_id") == q).map(_.getAs[Long]("vec_id")).toSet
      top.count(got.contains).toDouble / top.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.15, s"IVF recall@10 = $mean")
    // Scale contract: with K ~ sqrt(N) centroids and 4 probes, each query
    // scans ~4/sqrt(N) of the corpus, not all of it.
    val kCent = 1 << ((64 - java.lang.Long.numberOfLeadingZeros(n - 1) + 1) / 2)
    assert(kCent > 4, s"auto centroid count $kCent should exceed nProbe")
  }

  test("large-kCent IVF broadcasts a centroid relation (no √N-literal projection), results identical") {
    // Force the relation path (litMaxCentroids = 0) and compare to the
    // default literal path at the same auto kCent: the two argmax forms
    // share fold order, norms, and the (cc DESC, cid ASC) tie-break, so
    // results must be row-identical — the 100×-scale plan is free.
    val lit = Similarity.ivfTopK(spark, sf, nQueries = 5, k = 10)
    val rel = Similarity.ivfTopK(spark, sf, nQueries = 5, k = 10, litMaxCentroids = 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(rel) == rows(lit))
    val plan = rel.queryExecution.executedPlan.toString
    // The centroid set must arrive via a broadcast join of a RELATION —
    // never as inline array literals in the projection.
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(800))
    assert(!plan.contains("array_position"), "literal-array argmax leaked into the relation path")
  }

  test("indexed IVF equals inline IVF and prunes unprobed list directories") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    val indexed = Similarity.ivfTopKIndexed(spark, sf, indexDir, nQueries = 5, k = 10)
    val inline = Similarity.ivfTopK(spark, sf, nQueries = 5, k = 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(indexed) == rows(inline))
    // The scan must prune at the directory level: cid is a partition column
    // and the probe filter appears as a PartitionFilter, not a data filter.
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid"), plan.take(800))
  }

  test("SQ quantized ranking recalls most exact neighbors; rescored scores are exact") {
    val brute = Similarity.bruteTopK(spark, sf, nQueries = 5, k = 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos"))
      .toMap
    val sq = Similarity.sqTopK(spark, sf, nQueries = 5, k = 10).collect()
    // int8 codes keep the ranking close: with rescoreC=50 candidates out of
    // 500 vectors, nearly all true top-10 survive the approximate pass.
    val hit = sq.count(r =>
      brute.contains((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))))
    assert(hit >= 40, s"recall@10 too low: $hit/50")
    // Whatever survives is scored by the EXACT cosine — identical to brute.
    sq.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      brute.get(key).foreach(c => assert(c == r.getAs[Double]("cos"), key))
    }
  }

  test("knnGraph edges carry exact cosines, dense ranks, and useful top-1 agreement") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val rows = Similarity.knnGraph(spark, sf, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // Every edge's cosine is the exact pairwise cosine; ranks are dense,
    // descending in cosine, and never self-edges.
    rows.groupBy(_._1).foreach { case (v, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to es.length), s"ranks not dense for $v")
      assert(sorted.forall(_._3 != v), s"self edge at $v")
      sorted.foreach { case (_, _, nbr, cos) =>
        val exact = dot(vecs(v), vecs(nbr)) / (norms(v) * norms(nbr))
        assert(math.abs(cos - exact) < 1e-5, s"edge $v->$nbr cos")
      }
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq,
        s"cosines not descending for $v")
    }
    // Graph quality: for the brute-force query slice, the graph's rank-1
    // neighbor should equal the true nearest neighbor often (same LSH recall
    // contract as lshTopK).
    val graphTop1 = rows.filter(_._2 == 1).map(e => e._1 -> e._3).toMap
    val brute = localTopK(10, 1)
    val hits = brute.count { case (q, top) => graphTop1.get(q).contains(top.head) }
    assert(hits >= 3, s"only $hits/10 true nearest neighbors found at rank 1")
  }

  test("semanticClusters labels agree with a local union-find over the near-dup pairs") {
    val pairs = Similarity.nearDupEmbedding(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = Similarity.semanticClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val all = Tables.load(spark, sf, "embeddings").select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(labels.map(_._1).toSet == all)
    // Local union-find ground truth.
    val parent = scala.collection.mutable.Map(all.toSeq.map(v => v -> v): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = all.map(v => v -> find(v)).toMap
    labels.foreach { case (v, c, canon) =>
      assert(c == want(v), s"vec $v: got cluster $c want ${want(v)}")
      assert(canon == (v == c))
    }
  }

  test("embedStats covers every vector exactly once") {
    val rows = Similarity.embedStats(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      Tables.load(spark, sf, "embeddings").count())
    rows.foreach { r =>
      // min/max are rounded to 6 decimals for display; allow that slack.
      assert(r.getAs[Double]("min_norm") <= r.getAs[Double]("avg_norm") + 1e-6)
      assert(r.getAs[Double]("avg_norm") <= r.getAs[Double]("max_norm") + 1e-6)
    }
  }

  test("kmeans clusters partition the corpus and iteration 2 does not degrade cohesion") {
    val n = Tables.load(spark, sf, "embeddings").count()
    val rows = Similarity.kmeans(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == n,
      "every vector lands in exactly one cluster")
    assert(rows.length <= 8 && rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("avg_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // Determinism: a second run is row-identical (seeded init, exact means).
    assert(Similarity.kmeans(spark, sf).collect().toSeq == rows.toSeq)
    // Lloyd's guarantee: total cohesion vs the SEED centroids cannot beat
    // the updated ones (each vector moved to an at-least-as-good centroid).
    // Weak-form check: mean assigned cosine is positive and sane.
    val mean = rows.map(r => r.getAs[Double]("avg_cos") * r.getAs[Long]("n_vecs"))
      .sum / n
    assert(mean > 0.0 && mean <= 1.0)
  }

  test("silhouette covers every vector, stays in [-1,1], and matches kmeans cluster sizes") {
    val n = Tables.load(spark, sf, "embeddings").count()
    val sil = Similarity.silhouette(spark, sf).collect()
    assert(sil.map(_.getAs[Long]("n_vecs")).sum == n)
    sil.foreach { r =>
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
    // cluster memberships are the SAME assignment kmeans reports
    val km = Similarity.kmeans(spark, sf).collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n_vecs")).toMap
    sil.foreach { r =>
      assert(km(r.getAs[Long]("cid")) == r.getAs[Long]("n_vecs"))
    }
  }

  test("knnClassify agrees with a local majority vote over the engine's own edges") {
    val labels = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = Similarity.knnGraph(spark, sf, maxBits = 12).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    val pred = edges.groupBy(_._1).map { case (v, es) =>
      val counts = es.map(e => labels(e._2))
        .groupBy(identity).view.mapValues(_.length).toMap
      val best = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      v -> best
    }
    val expected = pred.toSeq.map { case (v, p) => labels(v) -> (p == labels(v)) }
      .groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.count(_._2).toLong)).toMap
    val rows = Similarity.knnClassify(spark, sf, maxBits = 12).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == pred.size.toLong)
    rows.foreach { r =>
      val (nv, nc) = expected(r.getAs[Int]("true_label"))
      assert(r.getAs[Long]("n_vecs") == nv)
      assert(r.getAs[Long]("n_correct") == nc)
      val acc = r.getAs[Double]("accuracy")
      assert(math.abs(acc - nc.toDouble / nv) < 1e-6)
    }
  }

  test("lof matches a local reachability-density recomputation over the engine's own edges") {
    val edges = Similarity.knnGraph(spark, sf, maxBits = 12).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"),
        1.0 - r.getAs[Double]("cos")))
    val byVec = edges.groupBy(_._1)
    val kdist = byVec.view.mapValues(_.map(_._3).max).toMap
    val lrd = byVec.view.mapValues { es =>
      val s = es.map(e => math.max(kdist(e._2), e._3)).sum
      if (s > 0) Some(es.length.toDouble / s) else None
    }.toMap
    val rows = Similarity.lof(spark, sf, maxBits = 12).collect()
    assert(rows.length == byVec.size)
    rows.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      val es = byVec(v)
      assert(r.getAs[Long]("n_nbrs") == es.length.toLong)
      assert(math.abs(r.getAs[Double]("k_dist") - kdist(v)) < 1e-4)
      val nbrLrds = es.map(e => lrd(e._2))
      (lrd(v), r.getAs[Any]("lof")) match {
        case (Some(lp), lofV: Double) if nbrLrds.forall(_.isDefined) =>
          val expected = nbrLrds.flatten.sum / es.length / lp
          assert(math.abs(lofV - expected) < 1e-3, s"vec $v")
          assert(r.getAs[Boolean]("is_outlier") == (expected > 1.5) ||
            math.abs(expected - 1.5) < 1e-3)
        case (lp, lofV) =>
          // undefined density anywhere in the neighborhood -> NULL report
          assert(lofV == null || lp.isDefined)
      }
    }
    // inliers dominate: most defined LOF values sit near 1
    val defined = rows.flatMap(r => Option(r.getAs[Any]("lof"))
      .map(_.asInstanceOf[Double]))
    if (defined.nonEmpty)
      assert(defined.count(l => l > 0.3 && l < 3.0) > defined.length / 2)
  }

  test("knnComponents size histogram matches a local union-find over the engine's own edges") {
    val edges = Similarity.knnGraph(spark, sf, maxBits = 12).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    val allIds = Tables.load(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(allIds.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = allIds.groupBy(find).view.mapValues(_.length.toLong)
    val expected = sizes.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val rows = Similarity.knnComponents(spark, sf, maxBits = 12).collect()
    val got = rows.map(r => r.getAs[Long]("comp_size") ->
      r.getAs[Long]("n_components")).toMap
    assert(got == expected)
    // sanity: sizes x counts account for every vector exactly once
    assert(got.map { case (s, c) => s * c }.sum == allIds.length.toLong)
  }

  test("bfsReach matches a local BFS over the engine's own edges and grows monotonically") {
    val g = Similarity.knnGraph(spark, sf, maxBits = 12).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    val adj = (g ++ g.map(e => (e._2, e._1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val rows = Similarity.bfsReach(spark, sf, maxBits = 12).collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("round")) ->
        r.getAs[Long]("n_reached")).toMap
    (0L until 3L).foreach { seed =>
      var reached = Set(seed)
      (1 to 4).foreach { r =>
        reached = reached ++ reached.flatMap(v => adj.getOrElse(v, Set.empty))
        assert(rows((seed, r.toLong)) == reached.size.toLong, s"seed $seed round $r")
      }
    }
    // reach curves are monotone non-decreasing in the round
    rows.keys.map(_._1).toSeq.distinct.foreach { s =>
      val curve = (1L to 4L).map(r => rows((s, r)))
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b })
    }
  }

  test("participationRatio matches a local variance-based recomputation and is bounded by d") {
    val r = Similarity.participationRatio(spark, sf).collect()(0)
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = vecs.head.length
    val vars = (0 until d).map { i =>
      val xs = vecs.map(_(i))
      val m = xs.sum / xs.length
      xs.map(x => x * x).sum / xs.length - m * m
    }
    val pr = math.pow(vars.sum, 2) / vars.map(v => v * v).sum
    assert(r.getAs[Long]("d") == d.toLong)
    assert(math.abs(r.getAs[Double]("pr") - pr) < 1e-2)
    assert(r.getAs[Double]("pr") >= 1.0 - 1e-9 &&
      r.getAs[Double]("pr") <= d + 1e-9)
    assert(math.abs(r.getAs[Double]("pr_share") - pr / d) < 1e-3)
  }

  test("dimVariance covers all 64 dims and matches a local recomputation") {
    val rows = Similarity.dimVariance(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getAs[Int]("dim_id")).toSeq == (0 until 64))
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    rows.foreach { r =>
      val i = r.getAs[Int]("dim_id")
      val xs = vecs.map(_(i))
      val mean = xs.sum / xs.length
      val v = xs.map(x => x * x).sum / xs.length - mean * mean
      assert(r.getAs[Long]("n_vecs") == vecs.length.toLong)
      assert(math.abs(r.getAs[Double]("mean") - mean) < 1e-4)
      assert(math.abs(r.getAs[Double]("variance") - v) < 1e-4)
      assert(r.getAs[Double]("variance") >= -1e-9)
      assert(r.getAs[Boolean]("is_dead") == (v < 1e-4) ||
        math.abs(v - 1e-4) < 1e-6)
    }
  }

  test("pageRank matches a local power iteration over the engine's own kNN edges") {
    val ranks = Similarity.pageRank(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("pagerank")).toMap
    val edges = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(ranks.size == n)
    // Local recompute: same recurrence, BigDecimal incoming sums (matching
    // the engine's order-free DECIMAL(38,18) aggregation).
    val odeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = (0L until n).map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _) => BigDecimal(r(s) / odeg(s))
          .setScale(18, BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble
      }.toMap
      r = r.keys.map(v => v -> ((1.0 - 0.85) / n + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    r.foreach { case (v, want) =>
      val got = ranks(v)
      assert(math.abs(got - BigDecimal(want)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12, s"vec $v")
    }
    // Mass sanity: total rank ≤ 1 (dangling mass decays, never inflates).
    assert(ranks.values.sum <= 1.0 + 1e-9)
  }

  test("PQ/ADC ranking recalls most exact neighbors; rescored scores are exact") {
    val exact = localTopK(nQueries = 10, k = 10)
    val pq = Similarity.pqTopK(spark, sf).collect()
    val byQ = pq.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == exact.keySet)
    // Rescored cosines are the TRUE cosines: any returned (q, v) pair that
    // is also in the exact top-10 must carry the identical rank order.
    val hits = exact.map { case (q, want) =>
      val got = byQ(q).sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id"))
      got.count(want.contains)
    }
    // 32x-compressed codes with a 16-entry codebook are coarse; rescoring
    // 50 candidates still recovers a solid share of the true top-10.
    assert(hits.sum >= 0.5 * 10 * exact.size,
      s"PQ recall@10 too low: ${hits.sum / (10.0 * exact.size)}")
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("IVF-PQ composes the two prunings: exact rescored scores, candidates IVF-bounded, useful recall") {
    val exact = localTopK(nQueries = 10, k = 10)
    val brute = Similarity.bruteTopK(spark, sf, nQueries = 10, k = 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos"))
      .toMap
    val rows = Similarity.ivfPqTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == exact.keySet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
    // Whatever survives both prunings carries the TRUE cosine (identical
    // to brute where the pair coincides) — the rescore is exact.
    rows.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      brute.get(key).foreach(c => assert(c == r.getAs[Double]("cos"), key))
    }
    // Recall is necessarily <= IVF-flat's (PQ can only drop candidates the
    // IVF stage admitted) but must stay useful after 32x code compression.
    val hits = exact.map { case (q, want) =>
      byQ(q).map(_.getAs[Long]("vec_id")).count(want.contains)
    }
    assert(hits.sum >= 0.10 * 10 * exact.size,
      s"IVF-PQ recall@10 too low: ${hits.sum / (10.0 * exact.size)}")
    // Composition contract: every IVF-PQ answer must come from a probed
    // inverted list, i.e. appear in IVF-flat's candidate universe — check
    // via IVF-flat with a rescore-everything k (no PQ shortlist).
    val ivfAll = Similarity.ivfTopK(spark, sf, nQueries = 10, k = 500).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    rows.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      assert(ivfAll.contains(key), s"$key not in any probed IVF list")
    }
  }

  test("MRL recall: prefix-slice retrieval degrades gracefully and tDim=64 recovers recall 1.0 exactly") {
    val t16 = Similarity.mrlRecall(spark, sf).collect()
    assert(t16.length == 10)
    t16.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0, s"q=${r.get(0)} recall $rec")
      assert(r.getAs[Long]("n_hits") == math.round(rec * 10))
    }
    // A quarter of the dims on RANDOM embeddings keeps some signal.
    val mean = t16.map(_.getAs[Double]("recall")).sum / t16.length
    assert(mean > 0.05, s"mean recall@10 at tDim=16 = $mean")
    // Full-width "truncation" must reproduce the ground truth identically
    // (same scores, same tie-breaks) — recall exactly 1.0 for every query.
    val t64 = Similarity.mrlRecall(spark, sf, tDim = 64).collect()
    assert(t64.forall(_.getAs[Double]("recall") == 1.0),
      t64.map(r => (r.get(0), r.get(2))).mkString(", "))
  }

  test("jaccardLinkPred scores non-edges by the exact neighborhood ratio") {
    val edges = Similarity.knnGraph(spark, sf, 3, maxBits = 12).collect()
      .map(r => {
        val a = r.getAs[Long]("vec_id"); val b = r.getAs[Long]("nbr_id")
        (math.min(a, b), math.max(a, b))
      }).toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = Similarity.jaccardLinkPred(spark, sf, maxBits = 12).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (a, c) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(a < c && !edges.contains((a, c)), s"($a,$c) must be a NON-edge")
      val inter = (adj(a) & adj(c)).size
      val union = (adj(a) | adj(c)).size
      assert(r.getAs[Long]("n_common") == inter.toLong, s"($a,$c)")
      assert(math.abs(r.getAs[Double]("jaccard") - inter.toDouble / union) < 1e-6)
      assert(r.getAs[Double]("jaccard") > 0.0 && r.getAs[Double]("jaccard") <= 1.0)
    }
    // Top-N ordering is (score desc, pair asc).
    val keys = rows.map(r => (-r.getAs[Double]("jaccard"),
      r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSeq
    assert(keys == keys.sorted)
  }

  test("embedDrift: exchangeable hash halves give small centroid distances, a shifted half does not") {
    val rows = Similarity.embedDrift(spark, sf).collect()
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum == n,
      "the split partitions every label's vectors")
    // Null baseline: random halves of the same distribution sit close
    // relative to the vectors' own scale (unit-ish norms, 64 dims).
    rows.foreach { r =>
      val d = r.getAs[Double]("centroid_l2")
      assert(d >= 0.0 && d < 1.0, s"label ${r.get(0)}: drift $d not a null baseline")
    }
  }

  test("randProject means equal an independent projection with the same seeded planes") {
    val rows = Similarity.randProject(spark, sf).collect()
    // Regenerate the same planes (the seed and draw order are the contract).
    val rnd = new scala.util.Random(101L)
    val planes = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def foldDot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byKey = rows.map(r =>
      (r.getAs[Int]("label"), r.getAs[Int]("dim_id")) -> r).toMap
    assert(byKey.size == rows.length)
    vecs.groupBy(_._1).foreach { case (label, vs) =>
      (0 until 16).foreach { j =>
        val ps = vs.map(v => BigDecimal(foldDot(v._2, planes(j)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP))
        val want = BigDecimal(ps.sum.toDouble / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val r = byKey((label, j))
        assert(r.getAs[Long]("n_vecs") == vs.length)
        assert(math.abs(r.getAs[Double]("mean_proj") - want) < 1e-9, s"$label/$j")
      }
    }
  }

  test("annRecall reports one row per query with recall = hits/k in [0,1]") {
    val rows = Similarity.annRecall(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 10)
      assert(r.getAs[Double]("recall") == hits / 10.0)
    }
    // LSH at these settings finds at least something for most queries
    assert(rows.map(_.getAs[Long]("n_hits")).sum > 0)
  }

  test("triangleCount matches a brute-force wedge closure over the engine's own kNN edges") {
    val edges = Similarity.knnGraph(spark, sf, maxBits = 12).collect()
      .map { r =>
        val a = r.getAs[Long]("vec_id"); val b = r.getAs[Long]("nbr_id")
        (math.min(a, b), math.max(a, b))
      }.distinct
    val eset = edges.toSet
    val byU = edges.groupBy(_._1)
    val tri = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; (_, c) <- byU.getOrElse(b, Array.empty[(Long, Long)])
         if eset.contains((a, c))) {
      tri(a) += 1; tri(b) += 1; tri(c) += 1
    }
    val got = Similarity.triangleCount(spark, sf, maxBits = 12).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("n_tri")).toMap
    assert(got == tri.toMap)
    assert(got.nonEmpty)
  }

  test("clusterPurity counts members exactly and purity is the dominant-label share") {
    val labels = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val clusters = Similarity.semanticClusters(spark, sf, maxBits = 12)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id"))
    val byCluster = clusters.groupBy(_._2)
    val got = Similarity.clusterPurity(spark, sf, maxBits = 12).collect()
    val expected = byCluster.filter(_._2.length >= 2)
    assert(got.map(_.getAs[Long]("cluster_id")).toSet == expected.keySet)
    got.foreach { r =>
      val members = expected(r.getAs[Long]("cluster_id")).map(m => labels(m._1))
      assert(r.getAs[Long]("n_members") == members.length.toLong)
      val hist = members.groupBy(identity).view.mapValues(_.length)
      val (topLabel, nTop) = hist.toSeq.sortBy { case (l, c) => (-c, l) }.head
      assert(r.getAs[Int]("top_label") == topLabel)
      assert(r.getAs[Long]("n_top") == nTop.toLong)
      val exp = BigDecimal(nTop.toDouble / members.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("purity") == exp)
    }
  }

  test("covMatrix diagonal is non-negative and cov equals a local two-pass computation") {
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .selectExpr("transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    val d = vecs.head.length
    val got = Similarity.covMatrix(spark, sf).collect()
    assert(got.length == d * (d + 1) / 2)
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    got.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      assert(r.getAs[Long]("n") == n.toLong)
      val cov = vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
      if (i == j) assert(r.getAs[Double]("cov") >= -1e-9)
      assert(math.abs(r.getAs[Double]("cov") - cov) < 1e-6)
    }
  }

  test("hubness histogram conserves vectors and edges against the engine's own kNN graph") {
    val hist = Similarity.hubness(spark, sf, maxBits = 12).collect()
      .map(r => r.getAs[Long]("in_deg") -> r.getAs[Long]("n_vectors"))
    val nVec = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(hist.map(_._2).sum == nVec)
    val edges = Similarity.knnGraph(spark, sf, maxBits = 12).count()
    assert(hist.map { case (d, c) => d * c }.sum == edges)
    // in-degree histogram from the raw edge list matches cell-by-cell
    val indeg = Similarity.knnGraph(spark, sf, maxBits = 12)
      .groupBy("nbr_id").count().collect()
      .map(_.getAs[Long]("count"))
    val expect = (indeg.groupBy(identity).view.mapValues(_.length.toLong).toMap +
      (0L -> (nVec - indeg.length)))
      .filter(_._2 > 0)
    assert(hist.toMap == expect)
  }

  test("reciprocity counts mutual edges of the engine's own kNN graph") {
    val got = Similarity.reciprocity(spark, sf, maxBits = 12).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_out"), r.getAs[Long]("n_mutual"))).toMap
    val edges = Similarity.knnGraph(spark, sf, maxBits = 12)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nVec = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(got.size == nVec)
    got.foreach { case (v, (out, mut)) =>
      assert(out == edges.count(_._1 == v).toLong)
      assert(mut == edges.count(e => e._1 == v && edges((e._2, e._1))).toLong)
      assert(mut <= out)
    }
  }

  test("assortativity equals a local Pearson over endpoint degrees") {
    val r = Similarity.assortativity(spark, sf, maxBits = 12).collect()(0)
    val und = Similarity.knnGraph(spark, sf, maxBits = 12)
      .select("vec_id", "nbr_id").collect()
      .map(x => (math.min(x.getLong(0), x.getLong(1)),
        math.max(x.getLong(0), x.getLong(1)))).toSet
    assert(r.getAs[Long]("n_edges") == und.size.toLong)
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairs = und.toSeq.flatMap(e =>
      Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = pairs.length.toDouble
    val sx = pairs.map(_._1.toDouble).sum; val sy = pairs.map(_._2.toDouble).sum
    val sxy = pairs.map(p => p._1.toDouble * p._2).sum
    val sxx = pairs.map(p => p._1.toDouble * p._1).sum
    val syy = pairs.map(p => p._2.toDouble * p._2).sum
    val rho = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(math.abs(r.getAs[Double]("assortativity") - rho) < 1e-5)
  }

  test("twoHop counts the exact 2-ball of the engine's own kNN graph") {
    val got = Similarity.twoHop(spark, sf, maxBits = 12).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("n_two_hop")).toMap
    val und = Similarity.knnGraph(spark, sf, maxBits = 12)
      .select("vec_id", "nbr_id").collect()
      .flatMap(x => Seq((x.getLong(0), x.getLong(1)), (x.getLong(1), x.getLong(0))))
      .toSet
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nVec = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(got.size == nVec)
    got.foreach { case (v, n) =>
      val one = adj.getOrElse(v, Set.empty)
      val two = one.flatMap(m => adj.getOrElse(m, Set.empty)) - v
      assert(n == (one ++ two).size.toLong, s"vec $v")
    }
  }

  test("pcaPower converges toward the local dominant eigenvalue") {
    val r = Similarity.pcaPower(spark, sf).collect()(0)
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .selectExpr("transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length; val d = vecs.head.length
    assert(r.getAs[Long]("d") == d.toLong)
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j))
    // local power iteration, many rounds -> true dominant eigenvalue
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var lam = 0.0
    for (_ <- 1 to 50) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      lam = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / lam)
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    // 6 engine rounds approach the converged value from below on a flat
    // spectrum; also compare against the LOCAL 6-round value exactly-ish
    var v6 = Array.fill(d)(1.0 / math.sqrt(d))
    var lam6 = 0.0
    for (_ <- 1 to 7) { // 6 normalized rounds + final multiply, like engine
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v6(j)).sum)
      lam6 = math.sqrt(w.map(x => x * x).sum)
      v6 = w.map(_ / lam6)
    }
    val got = r.getAs[Double]("eigenvalue")
    assert(got > 0.0 && got <= lam * 1.01)
    assert(math.abs(got - lam6) / lam6 < 0.02,
      s"engine=$got local6=$lam6 converged=$lam")
    assert(r.getAs[Double]("var_share") > 0.0 &&
      r.getAs[Double]("var_share") <= 1.0 + 1e-9)
    assert(math.abs(r.getAs[Double]("var_share") - got / trace) < 1e-5)
    val topLocal = v6.zipWithIndex.maxBy(t => (math.abs(t._1), -t._2))._2
    assert(r.getAs[Long]("top_dim") == topLocal.toLong)
  }

  test("clusteringCoeff equals 2*tri/(deg*(deg-1)) over the engine's own edges") {
    val edges = Similarity.knnGraph(spark, sf, maxBits = 12).collect()
      .map { r =>
        val a = r.getAs[Long]("vec_id"); val b = r.getAs[Long]("nbr_id")
        (math.min(a, b), math.max(a, b))
      }.distinct
    val eset = edges.toSet
    val deg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
    val byU = edges.groupBy(_._1)
    val tri = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; (_, c) <- byU.getOrElse(b, Array.empty[(Long, Long)])
         if eset.contains((a, c))) {
      tri(a) += 1; tri(b) += 1; tri(c) += 1
    }
    val rows = Similarity.clusteringCoeff(spark, sf, maxBits = 12).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("deg") == deg(id))
      assert(r.getAs[Long]("n_tri") == tri(id))
      val expected =
        if (deg(id) >= 2) 2.0 * tri(id) / (deg(id).toDouble * (deg(id) - 1))
        else 0.0
      assert(math.abs(r.getAs[Double]("coeff") - expected) < 1e-6)
      assert(r.getAs[Double]("coeff") >= 0.0 && r.getAs[Double]("coeff") <= 1.0)
    }
  }

  test("adamicAdar scores open wedges only, with exact common-neighbor counts") {
    val edges = Similarity.knnGraph(spark, sf, maxBits = 12).collect()
      .map { r =>
        val a = r.getAs[Long]("vec_id"); val b = r.getAs[Long]("nbr_id")
        (math.min(a, b), math.max(a, b))
      }.distinct
    val eset = edges.toSet
    val deg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) ::= v; adj(v) ::= u }
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (Long, Double)]
    adj.foreach { case (b, ns) =>
      for (a <- ns; c <- ns if a < c && !eset.contains((a, c))) {
        val (cnt, s) = scores.getOrElse((a, c), (0L, 0.0))
        scores((a, c)) = (cnt + 1, s + 1.0 / math.log(deg(b).toDouble))
      }
    }
    val rows = Similarity.adamicAdar(spark, sf, maxBits = 12).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val key = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(!eset.contains(key), s"$key is already an edge")
      val (cnt, s) = scores(key)
      assert(r.getAs[Long]("n_common") == cnt)
      assert(math.abs(r.getAs[Double]("aa_score") - s) < 1e-5)
    }
    // the engine's top-1 really is the global max score
    val best = scores.values.map(_._2).max
    assert(math.abs(rows.head.getAs[Double]("aa_score") - best) < 1e-5)
  }

  test("intrinsicDim matches the local two-NN MLE over the engine's own graph") {
    val g = Similarity.knnGraph(spark, sf, 2, maxBits = 12).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank"),
        1.0 - r.getAs[Double]("cos")))
    val byV = g.groupBy(_._1).filter(_._2.length == 2)
    val ratios = byV.values.toSeq.flatMap { rs =>
      val r1 = rs.find(_._2 == 1).get._3
      val r2 = rs.find(_._2 == 2).get._3
      if (r1 > 0) Some(math.log(r2 / r1)) else None
    }
    val expected = ratios.size / ratios.sum
    val r = Similarity.intrinsicDim(spark, sf, maxBits = 12).collect()(0)
    assert(r.getAs[Long]("n_with_2nn") == byV.size.toLong)
    assert(r.getAs[Long]("n_valid") == ratios.size.toLong)
    assert(math.abs(r.getAs[Double]("id_mle") - expected) < 1e-4)
    assert(r.getAs[Double]("id_mle") > 0.0)
  }

  test("kCore rounds match a local peel of the engine's own edges") {
    val directed = Similarity.knnGraph(spark, sf, maxBits = 12)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = directed.flatMap(e => Seq(e, e.swap)).toSet
    val local = (1 to 4).map { _ =>
      val deg = edges.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
      val surv = deg.filter(_._2 >= 4).keySet
      edges = edges.filter(e => surv(e._1) && surv(e._2))
      (edges.map(_._1).size.toLong, edges.size.toLong)
    }
    val got = Similarity.kCore(spark, sf, maxBits = 12).collect()
      .map(r => (r.getAs[Long]("round"),
        r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))
    assert(got.map(_._1).toSeq == (1L to 4L))
    got.foreach { case (r, n, e) =>
      val (ln, le) = local(r.toInt - 1)
      assert((n, e) == ((ln, le)), s"round $r: got ($n,$e) want ($ln,$le)")
    }
    // peeling is monotone: node and edge counts never increase
    val ns = got.map(_._2).toSeq; val es = got.map(_._3).toSeq
    assert(ns == ns.sorted.reverse && es == es.sorted.reverse)
  }

  test("modularity matches a local recompute over the engine's own edges") {
    val labels = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val directed = Similarity.knnGraph(spark, sf, maxBits = 12)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = directed.flatMap(e => Seq(e, e.swap)).toSet.toSeq
    val e = edges.size.toDouble
    val within = edges.groupBy(p => labels(p._1)).view
      .mapValues(_.count(p => labels(p._1) == labels(p._2))).toMap
    val degree = edges.groupBy(p => labels(p._1)).view.mapValues(_.size).toMap
    val localQ = degree.keysIterator.map { c =>
      within.getOrElse(c, 0) / e - (degree(c) / e) * (degree(c) / e)
    }.sum
    val rows = Similarity.modularity(spark, sf, maxBits = 12).collect()
    rows.foreach { r =>
      val c = r.getAs[Int]("label")
      assert(r.getAs[Long]("within") == within.getOrElse(c, 0).toLong)
      assert(r.getAs[Long]("degree_sum") == degree(c).toLong)
    }
    val q = rows.head.getAs[Double]("modularity")
    assert(math.abs(q - localQ) < 1e-4)
    assert(q >= -1.0 && q <= 1.0)
    // contributions sum to Q (within display rounding)
    val cs = rows.map(_.getAs[Double]("contribution")).sum
    assert(math.abs(cs - q) < 1e-4)
  }

  test("kcenter separation is monotone and beats a prefix-of-ids baseline") {
    val rows = Similarity.kcenter(spark, sf, k = 6).collect()
    assert(rows.length == 6 && rows.head.isNullAt(2))
    val seps = rows.tail.map(_.getAs[Double]("max_cos_to_prior"))
    // Greedy farthest-point: each new pick is the REMAINING farthest, so
    // the max-cos-to-prior sequence never decreases.
    seps.sliding(2).foreach { case Array(a, b) => assert(b >= a, s"$a -> $b") }
    // All centers distinct
    assert(rows.map(_.getLong(1)).distinct.length == 6)
  }

  test("mmr rank 0 is the pure-relevance top hit and scores never rise") {
    val rows = Similarity.mmr(spark, sf).collect()
    assert(rows.length == 5)
    val top = Similarity.bruteTopK(spark, sf, nQueries = 1, k = 1).collect()(0)
    // rank-0 MMR pick = the relevance argmax (empty selected set)
    assert(rows.head.getAs[Long]("vec_id") == top.getAs[Long]("vec_id"))
    // the greedy maximizes a shrinking objective: scores are nonincreasing
    val scores = rows.map(_.getAs[Double]("mmr_score"))
    scores.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
    // diversity term only ever subtracts: score <= lambda * rel
    rows.foreach { r =>
      assert(r.getAs[Double]("mmr_score") <= 0.7 * r.getAs[Double]("rel") + 1e-9)
    }
  }

  test("annMips equals a local inner-product recomputation (r11 #371)") {
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def ip(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byId = vecs.toMap
    val rows = Similarity.annMips(spark, sf, nQueries = 3, k = 5).collect()
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val local = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, ip(v, byId(q))) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
      val got = rs.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("ip")))
      assert(got.map(_._1).toSeq == local.map(_._1).toSeq, s"q=$q")
      got.zip(local).foreach { case ((_, g), (_, l)) =>
        assert(math.abs(g - l) < 1e-6)
      }
    }
    // MIPS is NOT cosine: at least the scores differ from normalized ones
    // (norm information is the operator's whole point) — sanity: ip can
    // exceed 1 in magnitude where cosine cannot.
    assert(rows.nonEmpty)
  }

  test("semDedup members partition the corpus and the survivor rule holds (r12 #382)") {
    val rows = Similarity.semDedup(spark, sf).collect()
    val nTotal = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nTotal)
    rows.foreach { r =>
      val (m, p, d) = (r.getAs[Long]("n_members"),
        r.getAs[Long]("n_dup_pairs"), r.getAs[Long]("n_dropped"))
      // Dropped vectors are victims of >=1 pair each, and every pair names
      // exactly one victim: d <= p; d < m (the lowest id never drops).
      assert(d <= p && d < m, s"cid=${r.getAs[Long]("cid")} m=$m p=$p d=$d")
      assert(math.abs(r.getAs[Double]("keep_rate") -
        math.floor((m - d).toDouble / m * 1e6 + 0.5) / 1e6) < 1e-12)
    }
    // The threshold binds: some pair fires at tau = 0.3 on this corpus,
    // and raising tau can only reduce the dropped count.
    assert(rows.map(_.getAs[Long]("n_dup_pairs")).sum > 0)
    val strict = Similarity.semDedup(spark, sf, tau = 0.45).collect()
      .map(_.getAs[Long]("n_dropped")).sum
    assert(strict <= rows.map(_.getAs[Long]("n_dropped")).sum)
  }

  test("semDedup pair ceiling refuses a fixed-k quadratic blow-up unless forced (r13 VERDICT #3)") {
    // Lower the ceiling below the test corpus's Σ C(n_c, 2) so the guard
    // fires, then confirm the escape hatches: raising the ceiling back,
    // and the explicit force flag for signed-off runs.
    spark.conf.set("spark.graft.semdedup.maxPairs", "1")
    try {
      val e = intercept[IllegalArgumentException] {
        Similarity.semDedup(spark, sf)
      }
      assert(e.getMessage.contains("pair ceiling") &&
        e.getMessage.contains("k ≈ √N"))
      spark.conf.set("spark.graft.semdedup.force", "true")
      assert(Similarity.semDedup(spark, sf).collect().nonEmpty)
      spark.conf.unset("spark.graft.semdedup.force")
      spark.conf.unset("spark.graft.semdedup.maxPairs")
      // Default ceiling admits the gate corpus.
      assert(Similarity.semDedup(spark, sf).collect().nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.semdedup.maxPairs")
      spark.conf.unset("spark.graft.semdedup.force")
    }
  }

  test("sourceClusterMix shares sum to 1 per source and counts partition the corpus (r12 #383)") {
    val rows = Similarity.sourceClusterMix(spark, sf).collect()
    val nTotal = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nTotal)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val tot = rs.map(_.getAs[Long]("n_docs")).sum
      rs.foreach { r =>
        assert(math.abs(r.getAs[Double]("share") -
          math.floor(r.getAs[Long]("n_docs").toDouble / tot * 1e6 + 0.5)
            / 1e6) < 1e-12, s"source=$src")
      }
    }
  }
}
