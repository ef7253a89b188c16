package graft.sources

/** Minimal recursive-descent JSON parser + renderer for Iceberg
  * `metadata.json` resolution on the DRIVER (control-plane only — a
  * few KB per table). Exists because the metadata walk must be
  * STRUCTURAL: the previous regex scrape took the first
  * `"manifest-list"` occurrence in the file, which silently reads the
  * WRONG snapshot the moment a metadata version retains snapshot
  * history (exactly what incremental export now produces). Spark's
  * `from_json` is executor-side and schema-bound, so a tiny
  * driver-side parser is the dependency-free fit (the
  * [[IcebergExport]] `jstr` hand-writer's reading half).
  *
  * Numbers keep their RAW text: Iceberg snapshot ids are arbitrary
  * 64-bit longs, and a double round-trip corrupts anything above
  * 2^53.
  */
private[graft] object IcebergJson {

  sealed trait V {
    def apply(k: String): V = this match {
      case JObj(f) => f.getOrElse(k, sys.error(s"missing JSON field '$k'"))
      case _ => sys.error(s"not a JSON object (looking up '$k')")
    }
    def opt(k: String): Option[V] = this match {
      case JObj(f) => f.get(k).filter(_ != JNull)
      case _ => None
    }
    def arr: Vector[V] = this match {
      case JArr(xs) => xs
      case _ => sys.error("not a JSON array")
    }
    def str: String = this match {
      case JStr(s) => s
      case _ => sys.error("not a JSON string")
    }
    def long: Long = this match {
      case JNum(raw) => raw.toLong
      case _ => sys.error("not a JSON number")
    }
    def int: Int = long.toInt
    def bool: Boolean = this match {
      case JBool(b) => b
      case _ => sys.error("not a JSON boolean")
    }
  }
  final case class JObj(fields: Map[String, V]) extends V {
    private[IcebergJson] var order: Vector[String] = fields.keys.toVector
  }
  final case class JArr(items: Vector[V]) extends V
  final case class JStr(s: String) extends V
  final case class JNum(raw: String) extends V
  final case class JBool(b: Boolean) extends V
  case object JNull extends V

  def parse(s: String): V = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing JSON content at offset ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at offset $pos")
      pos += 1
    }
    def value(): V = {
      ws()
      require(!eof, "unexpected end of JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => array()
        case '"' => JStr(string())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => number()
      }
    }
    private def lit(w: String): Unit = {
      require(s.regionMatches(pos, w, 0, w.length), s"bad literal at offset $pos")
      pos += w.length
    }
    private def obj(): V = {
      expect('{'); ws()
      var fields = Vector.empty[(String, V)]
      if (!eof && s.charAt(pos) == '}') { pos += 1 }
      else {
        var more = true
        while (more) {
          ws()
          val k = string()
          ws(); expect(':')
          fields :+= (k -> value())
          ws()
          if (!eof && s.charAt(pos) == ',') pos += 1
          else { expect('}'); more = false }
        }
      }
      val o = JObj(fields.toMap)
      o.order = fields.map(_._1)
      o
    }
    private def array(): V = {
      expect('['); ws()
      var items = Vector.empty[V]
      if (!eof && s.charAt(pos) == ']') { pos += 1 }
      else {
        var more = true
        while (more) {
          items :+= value()
          ws()
          if (!eof && s.charAt(pos) == ',') pos += 1
          else { expect(']'); more = false }
        }
      }
      JArr(items)
    }
    private def string(): String = {
      expect('"')
      val b = new StringBuilder
      while (!eof && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          require(!eof, "bad escape at end of JSON")
          s.charAt(pos) match {
            case '"' => b.append('"')
            case '\\' => b.append('\\')
            case '/' => b.append('/')
            case 'b' => b.append('\b')
            case 'f' => b.append('\f')
            case 'n' => b.append('\n')
            case 'r' => b.append('\r')
            case 't' => b.append('\t')
            case 'u' =>
              require(pos + 4 < s.length, "bad unicode escape")
              b.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => sys.error(s"bad escape '\\$other' at offset $pos")
          }
        } else b.append(c)
        pos += 1
      }
      expect('"')
      b.toString
    }
    private def number(): V = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos)))) pos += 1
      require(pos > start, s"bad JSON value at offset $start")
      JNum(s.substring(start, pos))
    }
  }

  /** Replace one top-level field of an object, preserving key order
    * (new keys append) — the no-change re-export's `last-updated-ms`
    * touch.
    */
  def updated(o: JObj, k: String, v: V): JObj = {
    val n = JObj(o.fields + (k -> v))
    n.order = if (o.order.contains(k)) o.order else o.order :+ k
    n
  }

  /** Functional field set on an object (insertion order preserved;
    * new keys append) — the REST catalog's commit applier mutates
    * metadata structurally with these, never by string surgery.
    */
  def set(v: V, k: String, value: V): JObj = v match {
    case o @ JObj(f) =>
      val n = JObj(f + (k -> value))
      n.order = if (f.contains(k)) o.order else o.order :+ k
      n
    case _ => sys.error(s"not a JSON object (setting '$k')")
  }

  /** Functional field removal (no-op when absent). */
  def remove(v: V, k: String): JObj = v match {
    case o @ JObj(f) =>
      val n = JObj(f - k)
      n.order = o.order.filterNot(_ == k)
      n
    case _ => sys.error(s"not a JSON object (removing '$k')")
  }

  /** Append to an array value. */
  def append(v: V, item: V): JArr = v match {
    case JArr(xs) => JArr(xs :+ item)
    case _ => sys.error("not a JSON array (appending)")
  }

  /** Render back to compact JSON — object key order preserved from the
    * parse, so carried-forward fragments (prior `snapshots` entries in
    * an incremental export's metadata) re-serialize byte-stable.
    */
  def render(v: V): String = v match {
    case o @ JObj(f) =>
      o.order.map(k => s"${quote(k)}:${render(f(k))}").mkString("{", ",", "}")
    case JArr(xs) => xs.map(render).mkString("[", ",", "]")
    case JStr(s) => quote(s)
    case JNum(raw) => raw
    case JBool(b) => b.toString
    case JNull => "null"
  }

  private def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
}
