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

  test("simhash fingerprints are deterministic across runs") {
    val a = Dedup.simhashFingerprints(spark, sf).orderBy("doc_id").collect().toSeq
    val b = Dedup.simhashFingerprints(spark, sf).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
