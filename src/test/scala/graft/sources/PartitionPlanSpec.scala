package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class PartitionPlanSpec extends AnyFunSuite {

  test("single partition covers everything") {
    assert(PartitionPlan.stridePredicates("k", 0, 100, 1) == Seq("1 = 1"))
  }

  test("degenerate range collapses to one partition") {
    assert(PartitionPlan.stridePredicates("k", 5, 5, 8) == Seq("1 = 1"))
  }

  test("first partition catches NULLs and underflow, last catches overflow") {
    val preds = PartitionPlan.stridePredicates("k", 0, 100, 4)
    assert(preds.length == 4)
    assert(preds.head.contains("IS NULL"))
    assert(preds.head.startsWith("k < "))
    assert(preds.last.startsWith("k >= "))
  }

  private def matches(pred: String, v: Long): Boolean = {
    if (pred == "1 = 1") true
    else if (pred.contains("IS NULL"))
      v < pred.stripPrefix("k < ").stripSuffix(" OR k IS NULL").trim.toLong
    else if (pred.contains("AND")) {
      val Array(a, b) = pred.split(" AND ")
      v >= a.stripPrefix("k >= ").trim.toLong && v < b.stripPrefix("k < ").trim.toLong
    } else v >= pred.stripPrefix("k >= ").trim.toLong
  }

  test("strides are contiguous, disjoint, and cover the full key space") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val lo = rnd.between(-1000L, 1000L)
      val hi = lo + rnd.between(1L, 3000L)
      val n = rnd.between(1, 64)
      val preds = PartitionPlan.stridePredicates("k", lo, hi, n)
      (lo - 10 to hi + 10).foreach { v =>
        assert(preds.count(p => matches(p, v)) == 1,
          s"key $v matched != 1 predicate (lo=$lo hi=$hi n=$n)")
      }
    }
  }

  test("more partitions than keys never produces empty strides") {
    val preds = PartitionPlan.stridePredicates("k", 0, 3, 16)
    assert(preds.length == 3)
  }

  test("boundary predicates are contiguous, disjoint, and absorb duplicates") {
    // Duplicated boundaries (a heavy key) collapse instead of creating
    // empty chunks.
    val preds = PartitionPlan.boundaryPredicates("k", Seq(10L, 20L, 20L, 40L))
    assert(preds.length == 4)
    (-5L to 60L).foreach { v =>
      assert(preds.count(p => matches(p, v)) == 1, s"key $v")
    }
    assert(preds.head.contains("IS NULL"))
    assert(PartitionPlan.boundaryPredicates("k", Nil) == Seq("1 = 1"))
  }
}
