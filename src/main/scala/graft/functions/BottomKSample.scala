package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic distributed sampling as a custom
  * TypedImperativeAggregate: keep the k rows whose md5(value) is
  * smallest ("bottom-k by hash" — a mergeable, order-independent
  * reservoir). Buffer is a bounded max-heap, so state is O(k) per
  * partition and merges are associative — the same sample comes out
  * regardless of partitioning, parallelism, or row order, which is
  * what makes it oracle-checkable (DuckDB: ORDER BY md5(...) LIMIT k).
  */
case class BottomKSample(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_sample expects a BIGINT column, got ${child.dataType}")

  // one digest per task, reset per row — not one allocation per row
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")

  private def md5Hex(s: String): String = {
    digest.reset()
    val d = digest.digest(s.getBytes("UTF-8"))
    // manual hex: `"%02x".format` costs a Formatter per BYTE per row
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = BottomKSample.HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = BottomKSample.HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)](Ordering.by(_._1)) // max-heap on hash

  override def update(buf: mutable.PriorityQueue[(String, Long)],
                      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val value = v.asInstanceOf[Long]
      val h = md5Hex(value.toString)
      if (buf.size < k) buf.enqueue((h, value))
      else if (h < buf.head._1) { buf.dequeue(); buf.enqueue((h, value)) }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, Long)],
                     other: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    other.foreach { case (h, value) =>
      if (buf.size < k) buf.enqueue((h, value))
      else if (h < buf.head._1) { buf.dequeue(); buf.enqueue((h, value)) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(buf.toArray.sortBy(_._1).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeUTF(h); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readUTF(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BottomKSample =
    copy(child = cs.head)
}

object BottomKSample {
  private[functions] val HexChars = "0123456789abcdef".toCharArray
}
