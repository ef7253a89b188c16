package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** OTLP/PROTOBUF intake — the reference's otlp2parquet accepts
  * OTLP/HTTP protobuf (reference README.md "Sending Telemetry"); this
  * closes the one intake gap the JSON path left, with a PURE-JVM
  * wire-format codec (no generated stubs, no external library): the
  * protobuf wire grammar is three primitives (varint, fixed64/32,
  * length-delimited) and the OTLP `LogsData` message tree
  * (opentelemetry-proto logs/v1/logs.proto, a published public spec)
  * is shallow enough to walk directly.
  *
  * Decode strategy: protobuf bytes → the SAME OTLP/JSON envelope shape
  * [[OtlpLogs.parse]] already consumes, so both transports land behind
  * ONE parse surface and every downstream column derivation (attr
  * flattening, severity, trace ids) exists exactly once. The
  * conversion is a codegen'd unary expression (static call inside
  * whole-stage codegen — the [[graft.functions.CharEntropy]] pattern);
  * per-record cost is linear in payload size, map-only, zero shuffles,
  * so the intake scales like any projection.
  *
  * OTLP/JSON mapping rules honored (the parts the 15-column schema
  * consumes): `int_value` renders as a JSON STRING, trace/span ids as
  * lowercase hex, fixed64 nanos as strings; nested array/kvlist/bytes
  * attribute values are outside the flattened schema's vocabulary and
  * are skipped (the JSON intake ignores them identically — its
  * attrType carries only string/int/double/bool).
  */
object OtlpProtoOps {

  // ---- wire reader -------------------------------------------------

  // Every read is bounds-checked against the reader's OWN end, not
  // just the buffer: a nested message whose declared length truncates
  // a field must FAIL (quarantine path), not silently consume the
  // parent's following bytes; and a negative/oversized skip length
  // must throw, never move `pos` backward (an unchecked negative
  // length would loop the decoder forever on adversarial payloads).
  private[sources] final class R(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    // `n > end - pos`, never `pos + n > end`: a declared length near
    // Int.MaxValue makes `pos + n` wrap negative and sail past the
    // guard (then fail later as an index error instead of the intended
    // IllegalArgumentException); `end - pos` is small and non-negative,
    // so the comparison cannot overflow
    private def need(n: Int): Unit =
      if (n < 0 || n > end - pos) throw new IllegalArgumentException(
        s"truncated or malformed field: need $n bytes, ${end - pos} remain")
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        need(1)
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed64(): Long = {
      need(8)
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def fixed32(): Int = {
      need(4)
      var v = 0; var i = 0
      while (i < 4) { v |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    /** length-delimited payload as a sub-reader */
    def sub(): R = {
      val len = varint().toInt
      need(len)
      val r = new R(buf, pos, pos + len); pos += len; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => need(8); pos += 8
      case 2 => val len = varint().toInt; need(len); pos += len
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private[sources] def utf8(r: R): String = {
    val s = new String(r.buf, r.pos, r.end - r.pos, "UTF-8"); r.pos = r.end; s
  }

  private[sources] def hex(r: R): String = {
    val sb = new java.lang.StringBuilder((r.end - r.pos) * 2)
    var i = r.pos
    while (i < r.end) { sb.append(f"${r.buf(i) & 0xff}%02x"); i += 1 }
    r.pos = r.end
    sb.toString
  }

  // ---- decoded model (bounded: one envelope's tree) ----------------

  private[sources] final case class PVal(s: String, b: java.lang.Boolean, i: java.lang.Long,
                                d: java.lang.Double)
  private[sources] final case class PAttr(key: String, v: PVal)
  private final case class PLog(timeNs: Long, obsNs: Long, sevNum: Int, sevText: String,
                                body: PVal, traceHex: String, spanHex: String,
                                attrs: List[PAttr])
  private[sources] final case class PScope(name: String, version: String, attrs: List[PAttr])

  private[sources] def readAnyValue(r: R): PVal = {
    var v = PVal(null, null, null, null)
    while (r.hasMore) {
      val tag = r.varint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => v = v.copy(s = utf8(r.sub()))
        case (2, 0) => v = v.copy(b = r.varint() != 0L)
        case (3, 0) => v = v.copy(i = r.varint())
        case (4, 1) => v = v.copy(d = java.lang.Double.longBitsToDouble(r.fixed64()))
        case (_, w) => r.skip(w) // array/kvlist/bytes: outside the flat schema
      }
    }
    v
  }

  private[sources] def readKeyValue(r: R): PAttr = {
    var key = ""; var v = PVal(null, null, null, null)
    while (r.hasMore) {
      val tag = r.varint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => key = utf8(r.sub())
        case (2, 2) => v = readAnyValue(r.sub())
        case (_, w) => r.skip(w)
      }
    }
    PAttr(key, v)
  }

  private def readLogRecord(r: R): PLog = {
    var log = PLog(0L, 0L, 0, null, PVal(null, null, null, null), null, null, Nil)
    while (r.hasMore) {
      val tag = r.varint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 1)  => log = log.copy(timeNs = r.fixed64())
        case (2, 0)  => log = log.copy(sevNum = r.varint().toInt)
        case (3, 2)  => log = log.copy(sevText = utf8(r.sub()))
        case (5, 2)  => log = log.copy(body = readAnyValue(r.sub()))
        case (6, 2)  => log = log.copy(attrs = log.attrs :+ readKeyValue(r.sub()))
        case (9, 2)  => log = log.copy(traceHex = hex(r.sub()))
        case (10, 2) => log = log.copy(spanHex = hex(r.sub()))
        case (11, 1) => log = log.copy(obsNs = r.fixed64())
        case (_, w)  => r.skip(w)
      }
    }
    log
  }

  private[sources] def readScope(r: R): PScope = {
    var s = PScope(null, null, Nil)
    while (r.hasMore) {
      val tag = r.varint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => s = s.copy(name = utf8(r.sub()))
        case (2, 2) => s = s.copy(version = utf8(r.sub()))
        case (3, 2) => s = s.copy(attrs = s.attrs :+ readKeyValue(r.sub()))
        case (_, w) => r.skip(w)
      }
    }
    s
  }

  // ---- JSON rendering (the OtlpLogs.otlpSchema envelope shape) -----

  private[sources] def esc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private[sources] def attrJson(sb: java.lang.StringBuilder, a: PAttr): Unit = {
    sb.append("{\"key\":"); esc(sb, a.key); sb.append(",\"value\":{")
    if (a.v.s != null) { sb.append("\"stringValue\":"); esc(sb, a.v.s) }
    else if (a.v.i != null) { sb.append("\"intValue\":\"").append(a.v.i.longValue).append('"') }
    else if (a.v.d != null) {
      // protobuf JSON mapping: non-finite doubles render as the quoted
      // strings "NaN"/"Infinity"/"-Infinity" — unquoted they are not
      // JSON and from_json would null the WHOLE envelope, silently
      // dropping every record in the payload
      val d = a.v.d.doubleValue
      sb.append("\"doubleValue\":")
      if (java.lang.Double.isFinite(d)) sb.append(d)
      else sb.append('"').append(d).append('"')
    }
    else if (a.v.b != null) { sb.append("\"boolValue\":").append(a.v.b.booleanValue) }
    sb.append("}}")
  }

  private[sources] def attrsJson(sb: java.lang.StringBuilder, name: String, attrs: List[PAttr],
                        leading: Boolean): Unit =
    if (attrs.nonEmpty) {
      if (leading) sb.append(',')
      sb.append('"').append(name).append("\":[")
      var first = true
      attrs.foreach { a => if (!first) sb.append(','); attrJson(sb, a); first = false }
      sb.append(']')
    }

  /** Decode one OTLP/HTTP protobuf `LogsData` payload into the
    * equivalent OTLP/JSON envelope (the [[OtlpLogs.otlpSchema]] shape).
    * Called per row from generated code.
    */
  def toJson(bytes: Array[Byte]): UTF8String = {
    val top = new R(bytes, 0, bytes.length)
    val sb = new java.lang.StringBuilder(bytes.length * 2 + 64)
    sb.append("{\"resourceLogs\":[")
    var firstRl = true
    while (top.hasMore) {
      val tag = top.varint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => // ResourceLogs
          if (!firstRl) sb.append(','); firstRl = false
          val rl = top.sub()
          var resAttrs: List[PAttr] = Nil
          val scopes = List.newBuilder[(PScope, List[PLog])]
          while (rl.hasMore) {
            val t2 = rl.varint().toInt
            (t2 >> 3, t2 & 7) match {
              case (1, 2) => // Resource
                val res = rl.sub()
                while (res.hasMore) {
                  val t3 = res.varint().toInt
                  (t3 >> 3, t3 & 7) match {
                    case (1, 2) => resAttrs = resAttrs :+ readKeyValue(res.sub())
                    case (_, w) => res.skip(w)
                  }
                }
              case (2, 2) => // ScopeLogs
                val sl = rl.sub()
                var scope = PScope(null, null, Nil)
                var logs: List[PLog] = Nil
                while (sl.hasMore) {
                  val t3 = sl.varint().toInt
                  (t3 >> 3, t3 & 7) match {
                    case (1, 2) => scope = readScope(sl.sub())
                    case (2, 2) => logs = logs :+ readLogRecord(sl.sub())
                    case (_, w) => sl.skip(w)
                  }
                }
                scopes += ((scope, logs))
              case (_, w) => rl.skip(w)
            }
          }
          sb.append("{\"resource\":{")
          attrsJson(sb, "attributes", resAttrs, leading = false)
          sb.append("},\"scopeLogs\":[")
          var firstSl = true
          scopes.result().foreach { case (scope, logs) =>
            if (!firstSl) sb.append(','); firstSl = false
            sb.append("{\"scope\":{")
            var lead = false
            if (scope.name != null) { sb.append("\"name\":"); esc(sb, scope.name); lead = true }
            if (scope.version != null) {
              if (lead) sb.append(',')
              sb.append("\"version\":"); esc(sb, scope.version); lead = true
            }
            attrsJson(sb, "attributes", scope.attrs, leading = lead)
            sb.append("},\"logRecords\":[")
            var firstLr = true
            logs.foreach { log =>
              if (!firstLr) sb.append(','); firstLr = false
              sb.append("{\"timeUnixNano\":\"")
                .append(java.lang.Long.toUnsignedString(log.timeNs)).append('"')
              if (log.obsNs != 0L)
                sb.append(",\"observedTimeUnixNano\":\"")
                  .append(java.lang.Long.toUnsignedString(log.obsNs)).append('"')
              if (log.sevText != null) { sb.append(",\"severityText\":"); esc(sb, log.sevText) }
              if (log.sevNum != 0) sb.append(",\"severityNumber\":").append(log.sevNum)
              if (log.body.s != null) {
                sb.append(",\"body\":{\"stringValue\":"); esc(sb, log.body.s); sb.append('}')
              }
              if (log.traceHex != null) { sb.append(",\"traceId\":"); esc(sb, log.traceHex) }
              if (log.spanHex != null) { sb.append(",\"spanId\":"); esc(sb, log.spanHex) }
              attrsJson(sb, "attributes", log.attrs, leading = true)
              sb.append('}')
            }
            sb.append("]}")
          }
          sb.append("]}")
        case (_, w) => top.skip(w)
      }
    }
    sb.append("]}")
    UTF8String.fromString(sb.toString)
  }

  /** [[toJson]] with decode failures as NULL — the protobuf
    * transport's quarantine primitive ([[OtlpLogs.parseProtoWithInvalid]]):
    * one malformed collector payload must not kill an intake job, it
    * must land in the rejected stream like a bad JSON POST does.
    * Catches only decode-shaped failures, never VM errors.
    */
  def tryToJson(bytes: Array[Byte]): UTF8String =
    try toJson(bytes)
    catch {
      case _: IllegalArgumentException      => null
      case _: IndexOutOfBoundsException     => null
      case _: NegativeArraySizeException    => null
    }

  // ---- wire writer (test-data generator, mirrors toOtlpJsonTraced) -

  private[graft] final class W {
    private var buf = new Array[Byte](128)
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def vint(v0: Long): Unit = {
      var v = v0; ensure(10)
      while ((v & ~0x7fL) != 0L) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      buf(len) = v.toByte; len += 1
    }
    def tag(field: Int, wt: Int): Unit = vint(((field.toLong) << 3) | wt)
    def fixed64(field: Int, v: Long): Unit = {
      tag(field, 1); ensure(8)
      var i = 0; while (i < 8) { buf(len + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      len += 8
    }
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); vint(b.length.toLong); ensure(b.length)
      System.arraycopy(b, 0, buf, len, b.length); len += b.length
    }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int)(body: W => Unit): Unit = {
      val w = new W; body(w); bytes(field, w.result)
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private[graft] def hexBytes(hex: String): Array[Byte] = {
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte; i += 1
    }
    out
  }

  private[graft] def strAttr(w: W, field: Int, key: String, value: String): Unit =
    w.msg(field) { kv =>
      kv.str(1, key)
      kv.msg(2)(_.str(1, value))
    }

  /** Encode ONE traced record as a protobuf `LogsData` envelope — the
    * wire twin of [[OtlpLogs.toOtlpJsonTraced]]: resource
    * {service.name}, scope {"graft", version, code.namespace attr},
    * one log record with time/severity/body/trace identity. Field
    * order follows the proto field numbers. Called per row from
    * generated code with the argument struct's InternalRow.
    */
  def encodeFromRow(row: InternalRow): Array[Byte] = {
    val timeUs = row.getLong(0)
    val service = row.getUTF8String(1)
    val sevText = row.getUTF8String(2)
    val sevNum = row.getInt(3)
    val body = row.getUTF8String(4)
    val traceHex = row.getUTF8String(5)
    val spanHex = row.getUTF8String(6)
    val scopeVersion = row.getUTF8String(7)
    val codeNamespace = row.getUTF8String(8)
    val top = new W
    top.msg(1) { rl => // ResourceLogs
      rl.msg(1) { res => // Resource
        if (service != null) strAttr(res, 1, "service.name", service.toString)
      }
      rl.msg(2) { sl => // ScopeLogs
        sl.msg(1) { sc => // InstrumentationScope
          sc.str(1, "graft")
          if (scopeVersion != null) sc.str(2, scopeVersion.toString)
          if (codeNamespace != null) strAttr(sc, 3, "code.namespace", codeNamespace.toString)
        }
        sl.msg(2) { lr => // LogRecord
          lr.fixed64(1, timeUs * 1000L)
          lr.vint(2L << 3); lr.vint(sevNum.toLong) // field 2, varint
          if (sevText != null) lr.str(3, sevText.toString)
          if (body != null) lr.msg(5)(_.str(1, body.toString))
          if (traceHex != null) lr.bytes(9, hexBytes(traceHex.toString))
          if (spanHex != null) lr.bytes(10, hexBytes(spanHex.toString))
        }
      }
    }
    top.result
  }
}

/** `graft_otlp_json(bin)`: protobuf `LogsData` bytes → OTLP/JSON
  * envelope string, codegen'd static call.
  */
case class OtlpProtoToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_otlp_json expects binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    OtlpProtoOps.toJson(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.OtlpProtoOps.toJson($c)")
  override protected def withNewChildInternal(newChild: Expression): OtlpProtoToJson =
    copy(child = newChild)
}

/** `graft_otlp_json_try(bin)`: like [[OtlpProtoToJson]] but malformed
  * wire bytes yield NULL instead of failing the task — the decode
  * result carries its own validity, so intake jobs can split
  * valid/rejected streams ([[OtlpLogs.parseProtoWithInvalid]]).
  */
case class OtlpProtoToJsonTry(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_otlp_json_try expects binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    OtlpProtoOps.tryToJson(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // not defineCodeGen: the static call itself can return null (decode
    // failure), so validity must be re-derived from the result
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.sources.OtlpProtoOps.tryToJson($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): OtlpProtoToJsonTry =
    copy(child = newChild)
}

/** `graft_otlp_proto(struct(...))`: one traced record (9-field struct,
  * see [[OtlpProtoOps.encodeFromRow]]) → protobuf `LogsData` bytes.
  * The argument rides as ONE struct so the expression stays unary and
  * the generated code passes the InternalRow straight through.
  */
case class OtlpProtoEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 9 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_otlp_proto expects a 9-field struct, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    OtlpProtoOps.encodeFromRow(input.asInstanceOf[InternalRow])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.OtlpProtoOps.encodeFromRow($c)")
  override protected def withNewChildInternal(newChild: Expression): OtlpProtoEncode =
    copy(child = newChild)
}
