package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Comparators over INTERNAL (Catalyst) values matching Spark's SQL sort
  * order for the orderable atomic types — ascending, nulls first, floats
  * with `-0.0 == 0.0` and NaN greatest (SQLOrderingUtil), strings binary
  * (UTF8String). [[graft.core.Positional]]'s fast range-partition path
  * uses ONE comparator family for both the driver-side bound selection and
  * the per-row bucket search, so the bucket assignment is monotone under
  * the exact ordering `sortWithinPartitions` later applies.
  */
private[graft] object RangeKeyOrder {

  /** Key types the fast path handles; anything else falls back to
    * `repartitionByRange` (decimal/binary/interval/complex are rare as
    * interactive sort keys and not worth a bespoke comparator).
    */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BooleanType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  /** Null-first comparator for one key field's internal values. */
  def cmpFor(dt: DataType): (Any, Any) => Int = {
    val base: (Any, Any) => Int = dt match {
      case ByteType => (a, b) =>
        java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte])
      case ShortType => (a, b) =>
        java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
      case IntegerType | DateType => (a, b) =>
        java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType => (a, b) =>
        java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case FloatType => (a, b) => {
        val x = a.asInstanceOf[Float]; val y = b.asInstanceOf[Float]
        if (x == y) 0 else java.lang.Float.compare(x, y)
      }
      case DoubleType => (a, b) => {
        val x = a.asInstanceOf[Double]; val y = b.asInstanceOf[Double]
        if (x == y) 0 else java.lang.Double.compare(x, y)
      }
      case StringType => (a, b) =>
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      case BooleanType => (a, b) =>
        java.lang.Boolean.compare(a.asInstanceOf[Boolean],
          b.asInstanceOf[Boolean])
      case other =>
        throw new IllegalArgumentException(s"unsupported range key: $other")
    }
    (a, b) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else base(a, b)
  }

  /** Lexicographic comparator over multi-field keys. */
  def keyCmp(types: Seq[DataType]): (Array[Any], Array[Any]) => Int = {
    val cmps = types.map(cmpFor).toArray
    (x, y) => {
      var i = 0
      var r = 0
      while (r == 0 && i < cmps.length) { r = cmps(i)(x(i), y(i)); i += 1 }
      r
    }
  }
}

/** `graft_range_token(k1, k2, …)` → int: the shuffle token whose
  * hash-partition slot under `HashPartitioning(_, nParts)` equals the
  * key's range-bucket id.
  *
  * This is the per-row half of [[graft.core.Positional]]'s sampling-free
  * range exchange: `bounds` are nParts−1 (or fewer, after dedup)
  * driver-sampled split keys sorted ascending; bucket(key) = first bound
  * ≥ key (binary search, ties low — any monotone convention works, ties
  * under the sort are arbitrary anyway); `tokens(b)` is a precomputed int
  * with `pmod(murmur3(tokens(b)), nParts) == b`, so a plain
  * `repartition(nParts, this)` lands bucket b exactly in output partition
  * b — a range partitioning through the PUBLIC hash-repartition API, with
  * no second execution of the child for sampling.
  *
  * Bounds and tokens ride in the codegen references array (one
  * `addReferenceObj` — generated source is identical no matter the
  * bounds, exactly the [[PqExpressionBase]] precedent), and the per-row
  * work is a ~log2(nParts)-step binary search in compiled Scala.
  */
case class RangeToken(keys: Seq[Expression], keyTypes: Seq[DataType],
                      bounds: Array[Array[Any]], tokens: Array[Int])
    extends Expression {

  override def children: Seq[Expression] = keys
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_range_token"

  @transient private lazy val cmp = RangeKeyOrder.keyCmp(keyTypes)

  /** Bucket token for one key: binary search for the first bound ≥ key. */
  def tokenOf(key: Array[Any]): Int = {
    var lo = 0
    var hi = bounds.length // buckets are [0, bounds.length]
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(key, bounds(mid)) <= 0) hi = mid else lo = mid + 1
    }
    tokens(lo)
  }

  override def eval(input: InternalRow): Any = {
    val key = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) { key(i) = keys(i).eval(input); i += 1 }
    java.lang.Integer.valueOf(tokenOf(key))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rangeToken", this,
      classOf[RangeToken].getName)
    val evals = keys.map(_.genCode(ctx))
    val keyArr = ctx.freshName("rtKey")
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      code"${e.code}\n$keyArr[$i] = ${e.isNull} ? null : (Object) ${e.value};\n"
    }.reduce(_ + _)
    ev.copy(
      code = code"Object[] $keyArr = new Object[${keys.length}];\n" + assigns +
        code"final int ${ev.value} = $ref.tokenOf($keyArr);",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keys = newChildren)
}
