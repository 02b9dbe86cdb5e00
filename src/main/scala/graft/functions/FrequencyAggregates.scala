package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al.) frequent-items summary as a
  * [[TypedImperativeAggregate]]: O(capacity) state per group no matter how
  * large the key universe — the primitive that finds heavy hitters over a
  * billion-key vocabulary where a full `groupBy(key).count()` would carry
  * the whole vocabulary through the shuffle.
  *
  * Guarantees (standard SpaceSaving): every item with true frequency
  * > n/capacity is present in the summary; each reported count
  * overestimates the true count by at most its recorded `err`. Merging two
  * summaries (partial aggregation) degrades the bound to the sum of the
  * parts' bounds — callers that need an exact final answer verify
  * candidates with a second exact pass
  * ([[graft.operators.Frequency.exactHeavyHitters]]), so the summary only
  * has to be a superset of the true heavy hitters.
  */
case class SpaceSavingSummary(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "spacesaving_summary"

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def minEntry(buf: mutable.HashMap[String, (Long, Long)]): (String, (Long, Long)) =
    // deterministic tie-break on the item so eviction order never depends
    // on hash-map iteration order
    buf.minBy { case (item, (c, _)) => (c, item) }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some((c, e)) => buf(item) = (c + 1, e)
        case None if buf.size < capacity => buf(item) = (1L, 0L)
        case None =>
          val (evict, (c, _)) = minEntry(buf)
          buf.remove(evict)
          buf(item) = (c + 1, c) // inherits the evicted count as error
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, (Long, Long)],
                     b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    b.foreach { case (item, (c, e)) =>
      val (c0, e0) = a.getOrElse(item, (0L, 0L))
      a(item) = (c0 + c, e0 + e)
    }
    // truncate back to capacity, dropping the smallest counts (item
    // tie-break keeps the merge result partitioning-deterministic)
    if (a.size > capacity) {
      val keep = a.toSeq.sortBy { case (item, (c, _)) => (-c, item) }
        .take(capacity)
      a.clear(); keep.foreach { case (k, v) => a(k) = v }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any =
    new GenericArrayData(buf.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e)
      }.toArray[Any])

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, (c, e)) =>
      out.writeUTF(item); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf(in.readUTF()) = (in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object FrequencyAggregates {
  val SPACESAVING_FN = "graft_spacesaving"

  /** Registers `graft_spacesaving(item, capacity)`; capacity must be a
    * literal.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SPACESAVING_FN, { exprs =>
        val cap = exprs(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"capacity must be a literal, got $other")
        }
        SpaceSavingSummary(exprs(0), cap)
      }, "built-in")
}
