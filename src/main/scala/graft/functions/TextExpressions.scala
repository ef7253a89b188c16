package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-entropy scorer for text-quality filtering.
  *
  * Low-entropy documents (one character repeated, trivial boilerplate,
  * base64-free padding) and pathologically high-entropy ones (random
  * bytes) are both classic pre-training noise; per-document character
  * entropy is the standard cheap gate (C4/Gopher-family heuristics).
  *
  * Emitted in integer MICRO-NATS, the same convention as
  * [[graft.operators.TrainPrep]]'s unigram log-prob: with
  * M(x) = round(1e6·ln x), the score is (M(n)·n − Σ cᵢ·M(cᵢ)) ÷ n
  * over per-codepoint counts cᵢ (n = Σ cᵢ). Every intermediate is an
  * integer, so the result is independent of the order the counts are
  * visited in — the float-sum nondeterminism that plagues entropy
  * formulas across engines is engineered out, and DuckDB reproduces
  * the value bit-exactly from a GROUP BY over split characters.
  * (ln is concave, so M(n)·n bounds the sum and the numerator is
  * non-negative; floor division matches DuckDB's `//`.)
  *
  * The explode-free design matters at 100 TB: a per-doc map in one
  * projection (this expression) versus exploding every document into
  * per-character rows and shuffling them back — corpus × avg-length
  * rows through a shuffle for a per-row statistic.
  */
object TextOps {
  def entropyMicroNats(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 0L
    val counts = new java.util.HashMap[Int, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      counts.merge(cp, 1L, java.lang.Long.sum _)
      n += 1
    }
    var t = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      t += c * Math.round(1e6 * Math.log(c.toDouble))
    }
    // floorDiv, not '/': matches DuckDB's '//' exactly. The numerator
    // is non-negative up to per-term rounding (≤ ~n µnat), so a huge
    // near-uniform doc could dip it below zero, where truncating and
    // floor division differ by 1.
    Math.floorDiv(Math.round(1e6 * Math.log(n.toDouble)) * n - t, n)
  }
}

/** `graft_entropy(text)`: [[TextOps.entropyMicroNats]] as a codegen'd
  * unary expression — one static call per row inside whole-stage
  * codegen, no lambda/HOF overhead.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_entropy expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TextOps.entropyMicroNats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.entropyMicroNats($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
