package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the dedup signature hot loops.
  *
  * The SQL higher-order-function formulations (`aggregate`/`transform`
  * lambdas) are interpreted per element — 64 lanes x tokens x rows of lambda
  * dispatch dominated the near-dup queries (~14s of a 60s bench at sf0.1).
  * These expressions run the same arithmetic as tight JVM loops inside
  * whole-stage codegen: same inputs, bit-identical outputs, two orders of
  * magnitude less interpretive overhead.
  */

/** simhash64(array<long> tokenHashes) -> long: bit k of the result is the
  * majority vote of bit k across the token hashes (ties -> 0), identical to
  * the aggregate-based formulation it replaces.
  */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    Simhash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object Simhash64 {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < 64) {
        counts(k) += ((h >>> k) & 1L).toInt
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      // majority: #ones > #zeros  <=>  2 * ones > n (sum of +/-1 > 0)
      if (2 * counts(k) > n) fp |= (1L << k)
      k += 1
    }
    fp
  }
}

/** token_simhash64(array<string> tokens) -> long: SimHash over a
  * cross-engine token-hash family. Each token hashes through two 31-bit
  * char polynomials (h1: x131 mod 2147483647 from seed 7; h2: x137 mod
  * 2147483629 from seed 11) combined as (h1 << 31) | h2 — 62 usable bits,
  * all arithmetic reproducible in plain SQL on any engine (unlike xxhash64),
  * which is what makes the near-dup operator value-checkable in DuckDB.
  * Assumes single-byte (ASCII) token text, matching SQL `ascii()` semantics.
  */
case class TokenSimhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TokenSimhash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSimhash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenSimhash =
    copy(child = newChild)
}

object TokenSimhash {
  def hashToken(bytes: Array[Byte]): Long = {
    var h1 = 7L
    var h2 = 11L
    var j = 0
    while (j < bytes.length) {
      val c = (bytes(j) & 0xff).toLong
      h1 = (h1 * 131 + c) % 2147483647L
      h2 = (h2 * 137 + c) % 2147483629L
      j += 1
    }
    (h1 << 31) | h2
  }

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](62)
    var i = 0
    while (i < n) {
      val h = hashToken(arr.getUTF8String(i).getBytes)
      var k = 0
      while (k < 62) {
        counts(k) += ((h >>> k) & 1L).toInt
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 62) {
      if (2 * counts(k) > n) fp |= (1L << k)
      k += 1
    }
    fp
  }
}

/** minhash_sig(array<long> shingleHashes) -> array<long>(64):
  * lane j is min over shingles x of (a(j)*x + b(j)) mod p — the classic
  * universal-hash MinHash family. a(j) < 2^31 and x < 2^32 keep the product
  * inside a Long; the result is identical to the array_min/transform SQL.
  */
/** hashed_shingles(array<string>) -> array<long>: per element,
  * pmod(xxhash64(s), 2^32) — the MinHash pre-hash. Bit-identical to the
  * `transform(sh, g -> pmod(xxhash64(g), 4294967296L))` lambda it replaces
  * (same XXH64 with Spark's seed 42, same positive-mod), but one codegen'd
  * loop per row instead of an interpreted per-shingle lambda dispatch over
  * the whole corpus (r14: the lambda was the largest single cost left in
  * the near-dup signature stage).
  */
case class HashedShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override protected def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedShingles.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  private final val Mod = 4294967296L // 2^32

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // Exactly Spark's xxhash64(string) (XxHash64 expression, seed 42).
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val m = h % Mod
      out(i) = if (m < 0) m + Mod else m
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class MinhashSignature(child: Expression, a: Array[Long], b: Array[Long], p: Long)
  extends UnaryExpression {
  require(a.length == b.length)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSignature.compute($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  def compute(arr: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val lanes = a.length
    val n = arr.numElements()
    val mins = new Array[Long](lanes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < lanes) {
        val v = (a(j) * x + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** dot_product(array<double>, array<double>) -> double: a STRICTLY
  * left-to-right fold (acc = acc + a(i)*b(i)), the same association order as
  * `aggregate(zip_with(a, b, *), 0.0, +)` and DuckDB's sequential list fold —
  * so cosine scores remain bit-identical across engines while running as one
  * codegen'd loop instead of interpreted lambdas.
  */
case class DotProduct(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** bloom_might_contain(long) -> boolean over a pre-built
  * `org.apache.spark.util.sketch.BloomFilter`: the membership probe of a
  * RUNTIME FILTER. The filter is built distributedly on the join's build
  * side (partial filters OR-merge associatively), shipped to every task via
  * the plan's reference array, and evaluated inside whole-stage codegen —
  * one hash-and-test per row, no join, no shuffle. False positives only
  * ever ADMIT a row (the real join still drops it), so pre-filtering with
  * this expression never changes a join result — it only cuts the probe
  * side's shuffle volume by roughly the build side's selectivity.
  */
case class BloomMightContain(child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object DotProduct {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** l2_distance2(array<double>, array<double>) -> double: squared L2
  * distance as a strictly left-to-right fold acc += (a(i)−b(i))², the
  * exact op sequence of `DotProduct(zip_with(a,b,(x,y)=>x−y), same)` it
  * replaces — each element difference is rounded once, then squared, then
  * added, in index order — so results are bit-identical while skipping the
  * interpreted zip_with lambda AND the intermediate diff-array allocation
  * per evaluation (the PQ paths evaluate this ~|corpus|·nCents times per
  * query — the hottest scalar loop in the ANN family, guide §1.2 step 2).
  */
case class L2Distance2(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_distance2"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    L2Distance2.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.L2Distance2.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance2 =
    copy(left = newLeft, right = newRight)
}

object L2Distance2 {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** lsh_buckets(array<double> v) -> array<long>: the packed multi-table LSH
  * bucket keys (table << 32 | signBits) for ALL hyperplane tables in one
  * codegen'd kernel. Value-identical to the per-plane expression tree it
  * replaces — each plane's dot product is the same strictly left-to-right
  * fold as [[DotProduct]], the sign test is `> 0.0`, bit j of table t is
  * `1L << j`, and the pack is `t << 32 | bits` — but the plan carries ONE
  * expression with the plane matrix as a reference object instead of
  * nTables x nBits literal arrays (16 x 12 x 64 = 12k double literals):
  * the r14 bench showed those plans broadcasting 1.2 MB task binaries per
  * stage and paying optimizer/codegen walks over ~200 expression nodes per
  * LSH consumer. Per row it also converts the vector to a primitive
  * double[] once instead of re-reading ArrayData per plane.
  */
case class LshBuckets(child: Expression, planes: Array[Array[Double]],
    nTables: Int, bits: Int) extends UnaryExpression {
  require(planes.length == nTables * bits,
    s"planes must be nTables*bits rows (got ${planes.length} for $nTables x $bits)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], planes, nTables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBuckets.compute($c, $pRef, $nTables, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  def compute(arr: ArrayData, planes: Array[Array[Double]], nTables: Int,
      bits: Int): ArrayData = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = arr.getDouble(i); i += 1 }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bitSum = 0L
      var j = 0
      while (j < bits) {
        val p = planes(t * bits + j)
        val m = math.min(n, p.length)
        // Same left-to-right fold as DotProduct.compute — bit-identical.
        var acc = 0.0
        var d = 0
        while (d < m) { acc += v(d) * p(d); d += 1 }
        if (acc > 0.0) bitSum += (1L << j)
        j += 1
      }
      out(t) = (t.toLong << 32) + bitSum
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** word_ngrams(array<string> words, n) -> array<string>: DISTINCT
  * space-joined word n-grams in first-occurrence order — value-identical to
  * `array_distinct(transform(sequence(1, size(w)-2), i -> concat_ws(' ',
  * w[i-1], w[i], w[i+1])))` for n=3, but one codegen'd loop instead of
  * interpreted lambda dispatch per shingle (which dominated the shingle
  * family's runtime the way the signature lambdas did before [[Simhash64]]).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): ArrayData = {
    val cnt = words.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var k = 0
      while (k < n) { parts(k) = words.getUTF8String(i + k); k += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }
}
