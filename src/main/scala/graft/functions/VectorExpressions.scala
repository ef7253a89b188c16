package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for vector dot products.
  *
  * The `aggregate`/`zip_with` higher-order-function form is evaluated
  * interpretively (one closure call per element, per row) and blocks
  * whole-stage codegen; for all-pairs cosine work that lambda overhead
  * dominates. This expression generates a tight primitive loop instead
  * — ~20× faster on the dedup/ANN paths — while computing bitwise the
  * same sequential double summation the oracle computes.
  *
  * Accepts float or double arrays; floats are promoted exactly to
  * double per element (same as casting first, without the copy).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects float/double arrays, got ${left.dataType} and ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getL = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += $getL * $getR; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** MinHash signature: 64 universal-hash permutation minima over a
  * document's shingle-hash array, in one tight primitive loop.
  *
  * The pure-SQL form (`transform(perms, p -> array_min(transform(hs,
  * h -> ...)))`) pays interpreted-lambda overhead per (perm × shingle)
  * — ~40µs each — which made signatures the dominant cost. One
  * expression evaluation per document replaces 64 × |shingles| closure
  * calls. Interpreted eval is already a primitive loop; wholestage
  * codegen around it is not needed (CodegenFallback).
  */
object MinHashPerms {
  val P: Long = 2147483647L // 2^31 - 1
  val NumPerms = 64
  val A: Array[Long] = (1 to NumPerms).map(k => (1103515245L * k + 12345L) % P).toArray
  val B: Array[Long] = (1 to NumPerms).map(k => (214013L * k + 2531011L) % P).toArray
}

case class MinHashSignature(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import MinHashPerms._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i) // caller guarantees h in [0, P)
      var k = 0
      while (k < NumPerms) {
        val v = (h * A(k) + B(k)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** SimHash signature over a token-STRING array, packed into ONE long:
  * hashes each token (FNV-1a 64 over UTF-8 bytes, in-loop — no
  * per-token lambda) and sets bit i iff the ±1 vote sum for bit i is
  * positive. Packing the 64 bits into a single BIGINT (instead of an
  * array) lets verification run as `bit_count(a ^ b) <= d` — a single
  * codegen'd integer op per candidate pair instead of an interpreted
  * 64-element zip_with + aggregate.
  */
case class SimHashBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      var j = 0
      while (j < bytes.length) { h = (h ^ (bytes(j) & 0xffL)) * 1099511628211L; j += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) packed |= (1L << b); b += 1 }
    packed
  }

  override protected def withNewChildInternal(c: Expression): SimHashBits = copy(child = c)
}

/** Deterministic ±1 random hyperplanes (xorshift64, fixed seed) for
  * sign-random-projection LSH. Generation is sequential and therefore
  * PREFIX-STABLE: the first k planes are identical no matter how many
  * are requested, so signatures computed with different plane counts
  * agree on their shared prefix.
  */
object Hyperplanes {
  val Dim = 64
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  def planes(n: Int): Array[Array[Double]] =
    cache.computeIfAbsent(n, _ => {
      var state = 88172645463325252L
      def next(): Long = {
        state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
      }
      Array.fill(n, Dim)(if ((next() & 1L) == 0L) -1.0 else 1.0)
    })
}

/** Banded hyperplane-LSH bucket ids for a float/double vector, one
  * tight loop per row: element k of the result is band k's bucket —
  * `planesPerBand` sign bits of the vector's dot products against
  * consecutive planes. Two vectors are near-duplicate CANDIDATES when
  * any band agrees; exact cosine verification happens on candidates
  * only. The equivalent SQL (`bands × planes` separate `graft_dot` +
  * CASE expressions) pays per-plane expression overhead and explodes
  * the codegen size; this is one expression evaluation per row.
  */
case class HyperplaneBuckets(child: Expression, planesPerBand: Int, bands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        if (planesPerBand >= 1 && planesPerBand <= 30 && bands >= 1)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_hyperplanes needs 1<=planesPerBand<=30 and bands>=1, got ($planesPerBand, $bands)")
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hyperplanes expects a float/double array, got $t")
    }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val pl = Hyperplanes.planes(planesPerBand * bands)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = math.min(v.numElements(), Hyperplanes.Dim)
    val out = new Array[Int](bands)
    var band = 0
    while (band < bands) {
      var bucket = 0
      var p = 0
      while (p < planesPerBand) {
        val plane = pl(band * planesPerBand + p)
        var s = 0.0
        var i = 0
        while (i < dim) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          s += x * plane(i)
          i += 1
        }
        if (s > 0) bucket |= (1 << p)
        p += 1
      }
      out(band) = bucket
      band += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}

/** 0-based indices of the k largest values of a double array,
  * descending, ties broken by lower index — one selection loop per row
  * instead of an interpreted zip_with + array_sort-with-comparator +
  * transform chain (three closure evaluations per element per row).
  * Used for IVF cell ranking where k (cells probed) is small.
  */
case class TopKIndices(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) if k >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk_idx expects a double array and k >= 1, got $t / k=$k")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = math.min(k, n)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](n)
    var r = 0
    var exhausted = false
    while (r < m && !exhausted) {
      var best = -1
      var bestV = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val v = arr.getDouble(i)
          // NaN never compares greater, so NaN scores are simply never
          // selected; -Infinity IS selectable via the best<0 arm
          if (v > bestV || (best < 0 && !java.lang.Double.isNaN(v))) { bestV = v; best = i }
        }
        i += 1
      }
      if (best < 0) exhausted = true // only NaNs remain — return what we have
      else { taken(best) = true; out(r) = best; r += 1 }
    }
    ArrayData.toArrayData(if (r == m) out else java.util.Arrays.copyOf(out, r))
  }

  override protected def withNewChildInternal(c: Expression): TopKIndices = copy(child = c)
}

/** Scalar int8 quantization of a float/double vector (faiss-SQ8-style,
  * per-vector max-|v| scale): q_i = round(127 * v_i / max|v|), emitted
  * as BINARY — 4× smaller than float32 at rest and in shuffle/cache.
  * For COSINE ranking the per-vector scale cancels
  * (cos ≈ dot8(a,b) / (√dot8(a,a)·√dot8(b,b))), so no scale is stored.
  * An all-zero vector quantizes to all-zero bytes.
  */
case class Quantize8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_quantize8 expects a float/double array, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      if (v > mx) mx = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (mx > 0.0) {
      i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = math.round(127.0 * v / mx).toByte
        i += 1
      }
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Quantize8 = copy(child = c)
}

/** Exact integer dot product of two int8-quantized (BINARY) vectors —
  * the hot inner loop of the quantized ANN scan. Accumulates in long
  * (max |dim|·127² ≈ 2^24 fits easily), whole-stage-codegen'd: one
  * multiply-add per byte pair, no boxing, no lambda.
  */
case class Dot8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot8 expects two binary columns, got ${left.dataType} and ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) { $acc += (long) $a[$i] * (long) $b[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Dot8 =
    copy(left = l, right = r)
}

/** `graft_bloom_any(bloom, hashes)` — does the serialized bloom filter
  * (a [[graft.functions.VectorFunctions]] `graft_bloom` aggregate
  * result, i.e. Spark's `util.sketch.BloomFilter` wire format) possibly
  * contain ANY of the 64-bit hashes?
  *
  * Unlike Spark's internal `BloomFilterMightContain`, the bloom side is
  * a per-ROW column, not a required-constant — the shape a file-level
  * bloom index needs ([[graft.sources.LakeIndex]]: one bloom per data
  * file, probed with the lookup keys). Deserialization happens once per
  * bloom row and the k hashes probe the same instance, so a multi-key
  * probe (DML upsert pruning) costs one deserialize + k probes per
  * file. Interpreted eval is fine here: the probed relation is the
  * index (one row per FILE), never the data.
  */
case class BloomContainsAny(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_any expects (binary, array<bigint>), got $l and $r")
    }

  override def nullSafeEval(bloomBytes: Any, hashes: Any): Any = {
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes.asInstanceOf[Array[Byte]]))
    val arr = hashes.asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (bf.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContainsAny =
    copy(left = l, right = r)
}

object VectorFunctions {

  /** One guarded builder per function name, shared by the per-session
    * registry ([[register]]) and the session-extension path
    * ([[graft.GraftExtensions]]) so both fail with the same clear
    * arity/literalness message instead of an obscure eval error.
    */
  private def litInt(name: String, e: Expression, argName: String): Int = {
    require(e.foldable, s"$name: $argName must be a literal, got non-foldable ${e.sql}")
    e.eval().asInstanceOf[Number].intValue()
  }

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "graft_dot" -> { exprs =>
      require(exprs.length == 2, s"graft_dot(a, b) takes 2 arguments, got ${exprs.length}")
      DotProduct(exprs(0), exprs(1))
    },
    "graft_unigram_segment" -> { exprs =>
      require(exprs.length == 3,
        s"graft_unigram_segment(word, pieces, costs) takes 3 arguments, got ${exprs.length}")
      UnigramSegment(exprs(0), exprs(1), exprs(2))
    },
    "graft_wordpiece_segment" -> { exprs =>
      require(exprs.length == 2,
        s"graft_wordpiece_segment(word, vocab) takes 2 arguments, got ${exprs.length}")
      WordPieceSegment(exprs(0), exprs(1))
    },
    "graft_minhash" -> { exprs =>
      require(exprs.length == 1, s"graft_minhash(hashes) takes 1 argument, got ${exprs.length}")
      MinHashSignature(exprs.head)
    },
    "graft_simhash" -> { exprs =>
      require(exprs.length == 1, s"graft_simhash(tokens) takes 1 argument, got ${exprs.length}")
      SimHashBits(exprs.head)
    },
    "graft_topk_idx" -> { exprs =>
      require(exprs.length == 2, s"graft_topk_idx(arr, k) takes 2 arguments, got ${exprs.length}")
      TopKIndices(exprs(0), litInt("graft_topk_idx", exprs(1), "k"))
    },
    "graft_hyperplanes" -> { exprs =>
      require(exprs.length == 3,
        s"graft_hyperplanes(vec, planesPerBand, bands) takes 3 arguments, got ${exprs.length}")
      HyperplaneBuckets(exprs(0),
        litInt("graft_hyperplanes", exprs(1), "planesPerBand"),
        litInt("graft_hyperplanes", exprs(2), "bands"))
    },
    "graft_sample" -> { exprs =>
      require(exprs.length == 2, s"graft_sample(col, k) takes 2 arguments, got ${exprs.length}")
      BottomKSample(exprs(0), litInt("graft_sample", exprs(1), "k")).toAggregateExpression()
    },
    "graft_heavy_hitters" -> { exprs =>
      require(exprs.length == 2,
        s"graft_heavy_hitters(col, m) takes 2 arguments, got ${exprs.length}")
      SpaceSavingTopK(exprs(0), litInt("graft_heavy_hitters", exprs(1), "m"))
        .toAggregateExpression()
    },
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // runtime join filters but registers them internal-only; exposing
    // them lets an operator build an explicit semi-join prefilter (the
    // bloom is KBs — broadcastable as a literal) without reimplementing
    // the sketch.
    "graft_bloom" -> { exprs =>
      require(exprs.length == 2,
        s"graft_bloom(longCol, expectedItems) takes 2 arguments, got ${exprs.length}")
      val est = litInt("graft_bloom", exprs(1), "expectedItems").toLong
      org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0),
        org.apache.spark.sql.catalyst.expressions.Literal(est),
        org.apache.spark.sql.catalyst.expressions.Literal(est * 10L), 0, 0)
        .toAggregateExpression()
    },
    "graft_quantize8" -> { exprs =>
      require(exprs.length == 1,
        s"graft_quantize8(vec) takes 1 argument, got ${exprs.length}")
      Quantize8(exprs.head)
    },
    "graft_entropy" -> { exprs =>
      require(exprs.length == 1,
        s"graft_entropy(text) takes 1 argument, got ${exprs.length}")
      CharEntropy(exprs.head)
    },
    "graft_dot8" -> { exprs =>
      require(exprs.length == 2, s"graft_dot8(a, b) takes 2 arguments, got ${exprs.length}")
      Dot8(exprs(0), exprs(1))
    },
    "graft_bloom_contains" -> { exprs =>
      require(exprs.length == 2,
        s"graft_bloom_contains(bloom, longCol) takes 2 arguments, got ${exprs.length}")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
    },
    "graft_bloom_any" -> { exprs =>
      require(exprs.length == 2,
        s"graft_bloom_any(bloom, hashArray) takes 2 arguments, got ${exprs.length}")
      BloomContainsAny(exprs(0), exprs(1))
    },
    "graft_otlp_json" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_json(bin) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpProtoToJson(exprs.head)
    },
    "graft_otlp_json_try" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_json_try(bin) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpProtoToJsonTry(exprs.head)
    },
    "graft_otlp_proto" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_proto(struct) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpProtoEncode(exprs.head)
    },
    "graft_otlp_trace_json" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_trace_json(bin) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpTraceProtoToJson(exprs.head)
    },
    "graft_otlp_trace_json_try" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_trace_json_try(bin) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpTraceProtoToJsonTry(exprs.head)
    },
    "graft_otlp_metric_json" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_metric_json(bin) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpMetricProtoToJson(exprs.head)
    },
    "graft_otlp_metric_json_try" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_metric_json_try(bin) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpMetricProtoToJsonTry(exprs.head)
    },
    "graft_iceberg_bucket" -> { exprs =>
      require(exprs.length == 2,
        s"graft_iceberg_bucket(value, n) takes 2 arguments, got ${exprs.length}")
      graft.sources.IcebergBucket(exprs(0), exprs(1))
    },
    "graft_otlp_span_proto" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_span_proto(struct) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpSpanProtoEncode(exprs.head)
    },
    "graft_otlp_sum_proto" -> { exprs =>
      require(exprs.length == 1,
        s"graft_otlp_sum_proto(struct) takes 1 argument, got ${exprs.length}")
      graft.sources.OtlpSumProtoEncode(exprs.head)
    })

  /** Idempotently register every graft function so operators can use
    * `expr("graft_dot(a, b)")`.
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, build, "scala_udf")
    }
}
