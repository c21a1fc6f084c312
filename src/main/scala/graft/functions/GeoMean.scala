package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF: geometric mean via sum-of-logs (numerically stable —
  * the direct product overflows immediately at scale).
  *
  * Uses the public `Aggregator` API so Catalyst plans it as a two-phase
  * (partial + final) aggregate: `reduce` runs map-side per partition,
  * `merge` combines partial buffers at the exchange — the same distributed
  * shape as any built-in aggregate, safe at any row count.
  *
  * Reference capability: keystone's node library is full of custom
  * per-partition aggregations (e.g. gram-matrix accumulation in the block
  * solvers, SURVEY.md §2.A nodes.learning); this is the same pattern on the
  * public Spark SQL surface.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1L)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
