package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-stable 6-dp presentation rounding: floor(x·1e6 + 0.5)/1e6 —
  * round(DOUBLE, 6)'s tie handling drifted across DuckDB versions (the r7
  * q_cov_matrix red row), so every oracle-checked surface value uses this
  * deterministic form on BOTH engines (r11 allowlist burn-down).
  *
  * Non-finite guard (ADVICE r12): Spark's floor(DOUBLE) returns BIGINT, so
  * an unguarded floor-form fabricates 0.0 from NaN and ±9.22e12 from ±Inf
  * (Long saturation), while DuckDB's floor stays DOUBLE and preserves
  * NaN/Inf — a zero-variance z-score or 0-denominator ratio would silently
  * diverge. NaN/±Inf now pass through unrounded on the Spark side, which
  * is exactly what DuckDB's own floor-form yields (NaN·1e6 = NaN,
  * floor(NaN) = NaN; same for ±Inf), so one static oracle string stays
  * exact. NULL flows through both branches as NULL.
  */
private[operators] object Fl6 {
  def apply(c: Column): Column = {
    val d = c.cast("double")
    when(isnan(d) || d === lit(Double.PositiveInfinity) ||
         d === lit(Double.NegativeInfinity), d)
      .otherwise(floor(d * lit(1e6) + lit(0.5)) / lit(1e6))
  }
}
