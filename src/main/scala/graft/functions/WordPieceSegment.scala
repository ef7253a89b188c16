package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first WordPiece segmentation (the BERT
  * tokenizer's inference rule, Wu et al. 2016, arXiv:1609.08144 §4.1)
  * — the application primitive of [[graft.operators.Wordpiece]]: given
  * the piece vocabulary as ONE literal string array (continuation
  * pieces carry their `##` prefix, exactly as a shipped `vocab.txt`
  * does), returns the word's piece sequence.
  *
  * Determinism contract (mirrored by the trainer's spec replay):
  *  - at each position take the LONGEST vocabulary piece that matches
  *    (`##`-prefixed lookup at non-initial positions);
  *  - if no piece matches at any position, the WHOLE word is `[UNK]`
  *    (the HuggingFace/BERT rule — no partial fallback).
  *
  * One evaluation per VOCABULARY word, never per occurrence (the
  * encoder joins the word histogram), so interpreted eval with a lazy
  * per-instance hash table is the right cost point — the same
  * rationale as [[UnigramSegment]].
  */
case class WordPieceSegment(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == StringType &&
      (right.dataType match { case ArrayType(StringType, _) => true; case _ => false })
    if (ok && right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_wordpiece_segment(word, vocab) needs (string, literal array<string>)")
  }

  @transient private lazy val vocab: java.util.HashSet[String] = {
    val vs = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](vs.numElements() * 2)
    var i = 0
    // skip null elements: the type check admits containsNull arrays
    while (i < vs.numElements()) {
      if (!vs.isNullAt(i)) s.add(vs.getUTF8String(i).toString)
      i += 1
    }
    s
  }

  @transient private lazy val maxPieceLen: Int = {
    var mx = 1
    val it = vocab.iterator()
    while (it.hasNext) {
      val p = it.next()
      val bare = if (p.startsWith("##")) p.length - 2 else p.length
      mx = math.max(mx, bare)
    }
    mx
  }

  override def nullSafeEval(w: Any, v: Any): Any = {
    val word = w.toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      var l = math.min(maxPieceLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val bare = word.substring(pos, pos + l)
        val cand = if (pos == 0) bare else "##" + bare
        if (vocab.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString("[UNK]")))
      out += UTF8String.fromString(hit)
      pos += hit.length - (if (pos == 0) 0 else 2)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordPieceSegment =
    copy(left = l, right = r)
}
