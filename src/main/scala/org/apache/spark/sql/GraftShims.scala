package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Same-package accessor for the `private[sql]` Column ↔ Expression
  * converters Spark 4 moved behind `org.apache.spark.sql.classic`.
  *
  * The engine's native Catalyst expressions (CosineSim, PqEncode, …) reach
  * the Column API through the function registry, which works when every
  * non-column argument can ride as a foldable literal child. The range-
  * partition token expression ([[graft.functions.RangeToken]]) instead
  * carries driver-computed bounds of mixed runtime types, which have no
  * literal encoding the registry path could express — so it needs direct
  * Column construction. Public-knowledge technique (the Spark source and
  * every extension project use the same seam); no behavior is modified.
  */
object GraftShims {
  /** Wrap a Catalyst expression as a public Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a (classic) Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Block until the listener bus has delivered every queued event (or
    * the timeout elapses). Test instrumentation that counts records via a
    * SparkListener must drain the ASYNC bus before sampling — a fixed
    * sleep undercounts under load (r14 ADVICE #3).
    */
  def waitListenerBus(spark: SparkSession, timeoutMs: Long): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}
