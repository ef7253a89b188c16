package graft.sources

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg spec's BUCKET transform, evaluated row-side: 32-bit
  * Murmur3 (x86, seed 0) over the spec's byte layouts —
  * int/long/date/timestamp promote to the 8-byte little-endian LONG
  * value, strings hash their UTF-8 bytes — then
  * `(hash & Int.MaxValue) % N` (iceberg.apache.org/spec Appendix B).
  * Validated against the spec's published vectors (34 → 2017239379,
  * "iceberg" → 1210000089, date 2017-11-16 → -653330422, timestamp
  * 2017-11-16T22:31:08 → -2047944441) in the export spec.
  *
  * This is what lets [[IcebergExport.readChain]] honor
  * partition-scoped deletes on `bucket[N]` fields and callers prune
  * bucket-partitioned external tables — Spark's own `hash()` is
  * murmur3 with a DIFFERENT seed and byte layout and would silently
  * bucket every row wrong.
  */
object IcebergBucketOps {

  /** murmur3_x86_32, the public algorithm, seed 0. */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h1 = 0
    val rounded = data.length & 0xfffffffc
    var i = 0
    while (i < rounded) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | (data(i + 3) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    (data.length & 3) match {
      case 3 =>
        k1 = ((data(rounded + 2) & 0xff) << 16) |
          ((data(rounded + 1) & 0xff) << 8) | (data(rounded) & 0xff)
      case 2 =>
        k1 = ((data(rounded + 1) & 0xff) << 8) | (data(rounded) & 0xff)
      case 1 =>
        k1 = data(rounded) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** The spec's integer-family hash: the value as an 8-byte
    * little-endian long (ints/dates/timestamps promote).
    */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n

  def bucketUtf8(s: UTF8String, n: Int): Int =
    (murmur3(s.getBytes) & Int.MaxValue) % n
}

/** `graft_iceberg_bucket(value, n)`: the spec bucket index of a
  * partition source value — int/long/date/timestamp/string columns.
  */
case class IcebergBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case IntegerType | LongType | DateType | TimestampType |
         TimestampNTZType | StringType if right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_iceberg_bucket expects (int|long|date|timestamp|string, int), got ($t, ${right.dataType})")
  }
  override def nullSafeEval(v: Any, n: Any): Any = {
    val buckets = n.asInstanceOf[Int]
    v match {
      case s: UTF8String => IcebergBucketOps.bucketUtf8(s, buckets)
      case i: java.lang.Integer => IcebergBucketOps.bucketLong(i.longValue, buckets)
      case l: java.lang.Long => IcebergBucketOps.bucketLong(l.longValue, buckets)
      case other => sys.error(s"unhashable bucket source value $other")
    }
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = left.dataType match {
      case StringType => "bucketUtf8"
      case _ => "bucketLong"
    }
    val castV = left.dataType match {
      case StringType => (v: String) => v
      case _ => (v: String) => s"(long) $v"
    }
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.sources.IcebergBucketOps.$call(${castV(v)}, $n)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): IcebergBucket =
    copy(left = newLeft, right = newRight)
}
