package graft

import org.apache.spark.sql.functions._

/** Pins the engine behaviors the round-20 overflow/signed-zero
  * discipline rests on (full story: the [[graft.ops.Stats.qSpearman]]
  * Scaladoc). The DuckDB oracle gate cannot see these classes — both
  * spellings are written by the same hand — so the discipline (widen
  * every corpus-scaling integer product/sum to DECIMAL(38,0) on the
  * OPERAND, HUGEINT on the oracle side; normalize negative-capable
  * rounded statistics with `+ 0.0`) is only as durable as the Spark
  * semantics it assumes. Writing this spec found the semantics were
  * NOT what the first draft of the discipline's comments claimed:
  * these sessions run Spark 4's ANSI default, so an unwidened long
  * overflow THROWS at scale (a legacy session would wrap silently to
  * a wrong value) — either way the unwidened query cannot match the
  * oracle's exact HUGEINT past 2^63, and the widening is the only
  * spelling that stays correct and running on both engines. Each test
  * fails with re-adjudication context if a Spark upgrade moves the
  * ground.
  */
class OverflowDisciplineSpec extends GraftSuite {

  import spark.implicits._

  // 2^62 — two of these sum past Long.MaxValue (2^63 - 1)
  private val big = 1L << 62
  // floor(sqrt(2^63)) + 1 — smallest v with v*v past Long.MaxValue
  private val v = 3037000500L

  test("ANSI is the effective mode: a long sum past 2^63 THROWS at scale") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "the effective ANSI mode changed: every overflow-discipline " +
        "comment and the qSpearman anchor describe an ANSI-throw " +
        "failure mode — re-adjudicate (legacy mode wraps SILENTLY, " +
        "turning crashes-at-scale into silent oracle divergence)")
    val e = intercept[ArithmeticException] {
      Seq(big, big).toDF("x").agg(sum($"x")).head
    }
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW"),
      s"long-sum overflow no longer raises ARITHMETIC_OVERFLOW: $e")
  }

  test("a long product past 2^63 THROWS even when cast after the multiply") {
    // the q_lead_lag find: (x*x).cast(decimal) is NOT a widening — the
    // long multiply overflows before the cast sees it (under legacy
    // mode it would silently wrap instead); the cast must be on the
    // OPERAND
    val e = intercept[ArithmeticException] {
      Seq(v).toDF("x").select(($"x" * $"x").cast("decimal(38,0)")).head
    }
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW"),
      s"cast-after-product stopped overflowing — if Spark now widens " +
        s"long multiplication itself, re-check the operand-cast rule: $e")
  }

  test("the DECIMAL(38,0) operand widening is exact past 2^63") {
    val sumExact = Seq(big, big, big, big).toDF("x")
      .agg(sum($"x".cast("decimal(38,0)")).cast("string")).head.getString(0)
    assert(sumExact == (BigInt(big) * 4).toString,
      s"widened sum lost exactness (got $sumExact)")
    val prodExact = Seq(v).toDF("x")
      .select(($"x".cast("decimal(38,0)") * $"x").cast("string"))
      .head.getString(0)
    assert(prodExact == (BigInt(v) * BigInt(v)).toString,
      s"operand-widened product lost exactness (got $prodExact)")
  }

  test("Spark round never emits -0.0; the +0.0 idiom maps -0.0 to +0.0") {
    // a tiny negative statistic rounds to POSITIVE zero on Spark, while
    // DuckDB's round yields -0.0 — the one-sided divergence every
    // negative-capable statistic's `round(...) + 0.0` exists to absorb
    val r = spark.range(1).select(round(lit(-1e-13), 4)).head.getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(r) == 0L,
      "Spark round(-1e-13, 4) no longer yields +0.0: the signed-zero " +
        "adjudication flipped — re-check every `round(...) + 0.0` site")
    // and the normalization itself holds in IEEE on any conforming
    // engine: -0.0 + 0.0 is +0.0 under round-to-nearest
    val n = spark.range(1).select(lit(-0.0) + lit(0.0)).head.getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(n) == 0L,
      "-0.0 + 0.0 stopped normalizing to +0.0")
  }
}
