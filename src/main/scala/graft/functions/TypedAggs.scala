package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset` aggregation surface — the `Aggregator[IN, BUF, OUT]`
  * API (`KeyValueGroupedDataset.agg(aggregator.toColumn)`), the one
  * custom-aggregation style the native-Catalyst suite
  * ([[SketchAggs]]/[[TopKAgg]]: `TypedImperativeAggregate`) doesn't
  * exercise: buffers are CASE CLASSES moved through Encoders (Spark
  * serializes them to unsafe rows between partial and final), merge is
  * plain Scala, and the whole thing composes with the typed
  * `groupByKey` pipeline a `Dataset[T]`-first codebase writes.
  *
  * Float discipline: the running sum is a `java.math.BigDecimal` with
  * each addend first rounded to scale 12 HALF_UP — exactly the
  * `rel.Queries.dsum` route (cast DOUBLE→DECIMAL(38,12), exact
  * decimal addition, order-independent), so the typed path is
  * bit-compatible with the DECIMAL-route oracle and with the
  * untyped `dsum` aggregations it mirrors.
  */
object TypedAggs {

  case class ValueStats(n: Long, sum: JBigDecimal, min: Double, max: Double)

  /** (n, Σ value via the dsum decimal route, min, max) over a stream of
    * doubles. Buffer and output are the same case class; the zero uses
    * NaN-free sentinels resolved on first reduce. */
  val valueStats: Aggregator[Double, ValueStats, ValueStats] =
    new Aggregator[Double, ValueStats, ValueStats] {
      private def dec(v: Double): JBigDecimal =
        JBigDecimal.valueOf(v).setScale(12, RoundingMode.HALF_UP)
      def zero: ValueStats =
        ValueStats(0L, JBigDecimal.ZERO.setScale(12), Double.MaxValue, Double.MinValue)
      def reduce(b: ValueStats, v: Double): ValueStats =
        ValueStats(b.n + 1L, b.sum.add(dec(v)),
          math.min(b.min, v), math.max(b.max, v))
      def merge(a: ValueStats, b: ValueStats): ValueStats =
        ValueStats(a.n + b.n, a.sum.add(b.sum),
          math.min(a.min, b.min), math.max(a.max, b.max))
      def finish(r: ValueStats): ValueStats = r
      def bufferEncoder: Encoder[ValueStats] = Encoders.product[ValueStats]
      def outputEncoder: Encoder[ValueStats] = Encoders.product[ValueStats]
    }

  /** The aggregator as a typed column, ready for
    * `ds.groupByKey(...).agg(TypedAggs.valueStatsCol)`. */
  def valueStatsCol: TypedColumn[Double, ValueStats] = valueStats.toColumn
}
