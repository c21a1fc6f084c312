package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The shared Abramowitz–Stegun 7.1.25 two-sided normal p-value used by
  * `q_fdr_bh` ([[Stats]]) and `q_mcnemar` ([[Eval]]): neither engine's
  * erfc/Φ built-in is cross-engine portable, so both queries evaluate
  * the SAME rational+exp polynomial in the SAME operand order on Spark
  * and DuckDB — erfc(x) ≈ t·(a₁ + t·(a₂ + t·a₃))·e^(−x²) with
  * t = 1/(1+px), x = |z|/√2 (|ε| ≤ 5e−5 two-sided). Extracted here so
  * the numerically delicate constants and any future domain-handling
  * fix live in ONE place per engine spelling instead of four copies
  * that could silently diverge in method.
  *
  * Both entry points take |z| internally, so callers whose z is already
  * floored at 0 (McNemar's continuity-corrected statistic) and callers
  * with signed z (the FDR family's drift z) get identical values and
  * identical operand order.
  */
private[ops] object ASErfc {

  /** Spark spelling: two-sided p for a z-score (unrounded — callers
    * quantize at their documented precision). */
  def pTwoSided(z: Column): Column = {
    val x = abs(z) / sqrt(lit(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.47047) * x)
    t * (lit(0.3480242) + t * (lit(-0.0958798) + t * lit(0.7478556))) *
      exp(-x * x)
  }

  /** DuckDB spelling over a z expression string — the same arithmetic in
    * the same operand order as [[pTwoSided]] (t is re-spelled inline at
    * each use, exactly as the Spark expression tree duplicates the
    * subexpression; engines CSE it). */
  def sqlPTwoSided(z: String): String = {
    val t = s"(1.0 / (1.0 + 0.47047 * (abs($z) / sqrt(2))))"
    s"$t * (0.3480242 + $t * (-0.0958798 + $t * 0.7478556))" +
      s" * exp(-(abs($z) / sqrt(2)) * (abs($z) / sqrt(2)))"
  }
}
