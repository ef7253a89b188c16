package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a unigram piece model — the
  * application primitive of the SentencePiece-style trainer
  * ([[graft.operators.Unigram]]; Kudo 2018, arXiv:1804.10959): given
  * the piece vocabulary and integer MICRO-NAT costs as array literals,
  * returns the minimum-cost segmentation of the word.
  *
  * Determinism contract (mirrored bit-for-bit by the spec replay and
  * the trainer's own E-step):
  *  - best[i] = min over piece lengths l of best[i-l] + cost(piece);
  *    a character absent from the vocabulary costs [[UnigramSegment
  *    .UnkCost]] (segmentation is TOTAL — no word can fail);
  *  - ties prefer the LONGER final piece (scan l ascending, replace on
  *    strictly-lower cost or equal cost with larger l).
  *
  * One expression evaluation per VOCABULARY word (the trainer and
  * encoder both run it on the word histogram, never per occurrence),
  * so interpreted eval with a per-instance lazy piece table is the
  * right cost point — the same rationale as [[MinHashSignature]]
  * (CodegenFallback; the DP loop is already primitive Scala).
  */
object UnigramSegment {
  /** Cost of an out-of-vocabulary single character, in micro-nats —
    * larger than any trained piece cost (ln p ≥ −20 for any piece seen
    * once in ≤ e^20 total), so UNK chars are used only when no trained
    * piece covers a position.
    */
  val UnkCost: Long = 20000000L
}

case class UnigramSegment(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  import UnigramSegment.UnkCost

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == StringType &&
      (second.dataType match { case ArrayType(StringType, _) => true; case _ => false }) &&
      (third.dataType match { case ArrayType(LongType, _) => true; case _ => false })
    if (ok && second.foldable && third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_unigram_segment(word, pieces, costs) needs (string, literal array<string>, literal array<bigint>)")
  }

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val ps = second.eval().asInstanceOf[ArrayData]
    val cs = third.eval().asInstanceOf[ArrayData]
    require(ps.numElements() == cs.numElements(),
      s"graft_unigram_segment: ${ps.numElements()} pieces vs ${cs.numElements()} costs")
    val m = new java.util.HashMap[String, java.lang.Long](ps.numElements() * 2)
    var i = 0
    // skip null entries: the type check admits containsNull arrays
    while (i < ps.numElements()) {
      if (!ps.isNullAt(i) && !cs.isNullAt(i))
        m.put(ps.getUTF8String(i).toString, cs.getLong(i))
      i += 1
    }
    m
  }

  @transient private lazy val maxPieceLen: Int = {
    var mx = 1
    val it = table.keySet().iterator()
    while (it.hasNext) mx = math.max(mx, it.next().length)
    mx
  }

  override def nullSafeEval(w: Any, p: Any, c: Any): Any = {
    val word = w.toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val inf = Long.MaxValue / 4
    val best = Array.fill(n + 1)(inf)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      val maxL = math.min(maxPieceLen, i)
      var l = 1
      while (l <= maxL) {
        val piece = word.substring(i - l, i)
        val tc = table.get(piece)
        val pieceCost =
          if (tc != null) tc.longValue()
          else if (l == 1) UnkCost
          else inf
        if (pieceCost < inf && best(i - l) < inf) {
          val cand = best(i - l) + pieceCost
          if (cand < best(i) || (cand == best(i) && l > back(i))) {
            best(i) = cand
            back(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = n
    while (pos > 0) {
      val l = back(pos)
      out.prepend(UTF8String.fromString(word.substring(pos - l, pos)))
      pos -= l
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UnigramSegment =
    copy(first = f, second = s, third = t)
}
