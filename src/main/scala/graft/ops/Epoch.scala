package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed epoch-day origin shared by every calendar-indexed query in the
  * Sessions/Stats families (trend slope, drawdown, seasonal decompose,
  * lead-lag, Kaplan-Meier, Theil-Sen, Pareto share).
  *
  * Several of those queries rely on the day index being NONNEGATIVE for
  * their cross-engine equivalences to hold: Spark `pmod(day, 7)` agrees
  * with DuckDB `day % 7`, and Spark `DIV` (truncating) agrees with DuckDB
  * `//` (flooring), only when `day >= 0`. That is true for the current
  * testdata vintage (min(o_orderdate) = 1995-01-01) but nothing enforced
  * it — a regenerated vintage with earlier dates would flip signs
  * silently. [[day]] therefore carries an in-plan guard: any negative
  * index raises at execution time instead of producing a silently
  * oracle-divergent answer. The guard is one codegen'd comparison per
  * input row ahead of the first aggregate — negligible against the scan.
  */
object Epoch {
  /** The origin date literal; also hard-coded in each query's DuckDB
    * oracle SQL string (the oracle side needs no guard — it only has to
    * match Spark's output, and Spark now fails fast on the precondition).
    */
  val Origin = "1995-01-01"

  /** Days since [[Origin]] as LONG, erroring on any date before it.
    * Null dates pass through as null (unchanged grouping semantics). */
  def day(d: Column): Column = {
    val raw = datediff(d, lit(Origin).cast("date")).cast("long")
    when(raw < 0, raise_error(concat(
      lit(s"graft: date precedes epoch origin $Origin (pmod-vs-% / " +
        "DIV-vs-// oracle equivalences require nonnegative day index): "),
      d.cast("string")))).otherwise(raw)
  }
}
