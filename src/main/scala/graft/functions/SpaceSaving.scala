package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** SpaceSaving heavy-hitters summary (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * mergeable TypedImperativeAggregate: O(m) state per partition no
  * matter how many distinct items flow through — the way to ask "top
  * users / services / IPs" over 100 TB without a full
  * groupBy-every-key shuffle.
  *
  * Estimates carry their error: for every tracked item,
  * `est - err <= true count <= est`. Any item whose true frequency
  * exceeds n/m is guaranteed tracked (single summary); merging two
  * summaries (Agarwal et al., "Mergeable summaries") adds each side's
  * min-count as the upper bound for items the other side did not
  * track, so the bound survives partial aggregation — correctness
  * does not depend on partitioning, only the tightness of `err` does.
  *
  * Eviction scans the m entries for the min (m is small by design —
  * hundreds); a production variant with m in the millions would keep a
  * min-heap beside the hash map.
  */
case class SpaceSavingTopK(child: Expression, m: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && m >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_heavy_hitters expects a STRING column and capacity >= 1, got ${child.dataType} / m=$m")

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  private def minEntry(buf: mutable.LinkedHashMap[String, (Long, Long)]): (String, Long) = {
    var mk: String = null
    var mc = Long.MaxValue
    buf.foreach { case (k, (c, _)) => if (c < mc) { mc = c; mk = k } }
    (mk, mc)
  }

  private def offer(buf: mutable.LinkedHashMap[String, (Long, Long)],
                    item: String, c: Long, e: Long): Unit =
    buf.get(item) match {
      case Some((c0, e0)) => buf.update(item, (c0 + c, e0 + e))
      case None if buf.size < m => buf.update(item, (c, e))
      case None =>
        val (mk, mc) = minEntry(buf)
        // the unseen item could have occurred up to mc times already:
        // inherit the evicted slot's count as error, SpaceSaving-style
        buf.remove(mk)
        buf.update(item, (mc + c, mc + e))
    }

  override def update(buf: mutable.LinkedHashMap[String, (Long, Long)],
                      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: mutable.LinkedHashMap[String, (Long, Long)],
                     other: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    // mergeable-summaries rule: an item one side never tracked may
    // still have occurred up to that side's min count; add it as both
    // estimate and error so `est - err <= true <= est` keeps holding
    val minB = if (buf.size < m) 0L else minEntry(buf)._2
    val minO = if (other.size < m) 0L else minEntry(other)._2
    val out = createAggregationBuffer()
    val keys = buf.keySet ++ other.keySet
    keys.foreach { k =>
      val (cb, eb) = buf.getOrElse(k, (minB, minB))
      val (co, eo) = other.getOrElse(k, (minO, minO))
      out.update(k, (cb + co, eb + eo))
    }
    // keep the m best upper-bound items
    val kept = out.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(m)
    buf.clear()
    kept.foreach { case (k, v) => buf.update(k, v) }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any =
    new GenericArrayData(buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.map {
      case (k, (c, e)) => InternalRow(UTF8String.fromString(k), c, e)
    })

  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (c, e)) =>
      // length-prefixed raw UTF-8, not writeUTF: tracked items can be
      // arbitrary strings (log bodies, documents) and writeUTF throws
      // past 65535 encoded bytes
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val k = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(k, (in.readLong(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = cs.head)
}
