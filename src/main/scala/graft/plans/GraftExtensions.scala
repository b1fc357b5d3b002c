package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Simhash64, TokenSimhash, WordNgrams}

/** SparkSessionExtensions hook exposing graft's native kernels as SQL
  * functions, so `spark.sql("SELECT simhash64(...)")` works anywhere — the
  * standard extension-point pattern for custom Catalyst expressions.
  *
  * Activate at session build:
  *   `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * or on an already-running session (e.g. a notebook) with
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // The library's optimizer rules ride the same hook: one
    // `spark.sql.extensions=graft.plans.GraftExtensions` conf brings the
    // SQL functions AND the range-join rewrite to every session. The rule
    // itself is gated on `spark.graft.rangeJoinRewrite.enabled` (default
    // false), so sessions that want only the SQL functions never get plan
    // rewrites — the rewrite's explode doubles probe-side rows, which is
    // only a win when the original plan was nested-loop/cartesian.
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  private val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      info("simhash64", "simhash64(array<long>) - 64-bit SimHash of token hashes"),
      (args: Seq[Expression]) => Simhash64(args.head)),
    ("token_simhash64",
      info("token_simhash64", "token_simhash64(array<string>) - SimHash over char-polynomial token hashes"),
      (args: Seq[Expression]) => TokenSimhash(args.head)),
    ("dot_product",
      info("dot_product", "dot_product(array<double>, array<double>) - sequential-fold dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("word_ngrams",
      info("word_ngrams",
        "word_ngrams(array<string>, n) - distinct order-preserving word n-gram shingles; n must be a literal"),
      (args: Seq[Expression]) => {
        val n = args(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"word_ngrams: n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "word_ngrams: n must be a literal (the shingle width compiles into the kernel)")
        }
        WordNgrams(args.head, n)
      }),
  )

  /** Register the functions on an existing session (extensions configured at
    * build time are not applied retroactively by getOrCreate).
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
