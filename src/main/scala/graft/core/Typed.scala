package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed `Dataset[T]` surface: case-class rows + a custom
  * [[Aggregator]], the compile-time-checked face of the same engine. The
  * DataFrame API is the default everywhere else (dynamic schemas, fewer
  * deserialization boundaries); this module exists because per-row
  * *business logic* benefits from the compiler, and it demonstrates the
  * remaining Spark extension point the engine uses nowhere else —
  * a typed Aggregator with partial+final merge semantics.
  *
  * Scale notes: an Aggregator compiles to the same
  * partial-aggregate/shuffle/final-aggregate plan as a built-in (state is
  * the `BUF` type per group per partition, merged associatively), unlike
  * `groupByKey.mapGroups` which materializes whole groups. Sums are exact
  * (Long for counts, scaled-long micro-units for money) so the fold is
  * order-independent and the result engine-reproducible.
  */
object Typed {

  /** The slice of lineitem the typed pricing summary needs. */
  case class LineSlim(l_returnflag: String, l_quantity: Double,
                      l_extendedprice: Double)

  /** Partial state: exact counts plus money in micro-units (1e-6), so
    * merging is integer addition — associative, overflow-safe for
    * ~9.2e12 in summed price at 1e6 scale.
    */
  case class PricingBuf(n: Long, qtyMicros: Long, priceMicros: Long)

  /** Per-group result: count, exact sums rendered back to 6dp doubles. */
  case class PricingSummary(n: Long, sum_qty: Double, sum_price: Double)

  /** Typed pricing-summary aggregator. Quantities/prices in the fixture
    * carry ≤2 decimal places, so the micro-unit rounding is exact.
    */
  val pricingAgg: Aggregator[LineSlim, PricingBuf, PricingSummary] =
    new Aggregator[LineSlim, PricingBuf, PricingSummary] {
      override def zero: PricingBuf = PricingBuf(0L, 0L, 0L)
      override def reduce(b: PricingBuf, a: LineSlim): PricingBuf =
        PricingBuf(b.n + 1,
          b.qtyMicros + math.round(a.l_quantity * 1e6),
          b.priceMicros + math.round(a.l_extendedprice * 1e6))
      override def merge(x: PricingBuf, y: PricingBuf): PricingBuf =
        PricingBuf(x.n + y.n, x.qtyMicros + y.qtyMicros,
          x.priceMicros + y.priceMicros)
      override def finish(b: PricingBuf): PricingSummary =
        PricingSummary(b.n, b.qtyMicros / 1e6, b.priceMicros / 1e6)
      override def bufferEncoder: Encoder[PricingBuf] = Encoders.product
      override def outputEncoder: Encoder[PricingSummary] = Encoders.product
    }

  /** Typed q1: per return flag, the pricing summary via the Aggregator —
    * partial+final over the shuffle like any built-in aggregate.
    */
  def pricingSummary(spark: SparkSession, dir: String): Dataset[(String, PricingSummary)] = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[LineSlim]
      .groupByKey(_.l_returnflag)
      .agg(pricingAgg.toColumn)
  }
}
