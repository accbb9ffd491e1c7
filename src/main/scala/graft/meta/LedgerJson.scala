package graft.meta

import org.apache.spark.sql.types.{DataType, StructType}

/** The metastore ledger's on-disk value codec: a VERSIONED, explicit,
  * self-describing JSON encoding of the metadata collections —
  * replacing Java serialization, whose byte format is hostage to
  * Scala/JVM library versions (a minor upgrade could make every
  * existing ledger unreadable; the reference's RDBMS metastore schema
  * has no such coupling — ref metastore ObjectStore.java).
  *
  * Every value is a `[tag, payload]` pair so decode needs no
  * out-of-band type information:
  *  - `["s", "text"]` string, `["i", 42]` Int, `["l", 42]` Long,
  *    `["d", 4.2]` Double, `["b", true]` Boolean, `["n"]` null
  *  - `["f", 4.2]` Float, `["h", 4]` Short, `["y", 4]` Byte
  *  - `["d!", "NaN"]` / `["f!", "-Infinity"]` non-finite Double/Float
  *    (bare NaN/Infinity tokens are not JSON — encoded tagged so a
  *    single non-finite statistic can never write a ledger the next
  *    load chokes on)
  *  - `["t", [v...]]` tuple (arity from length, 2..6)
  *  - `["q", [v...]]` Seq → Vector
  *  - `["e", [v...]]` insertion-ordered Set → mutable.LinkedHashSet
  *  - `["m", [[k,v]...]]` immutable Map
  *  - `["M", [[k,v]...]]` mutable map → mutable.LinkedHashMap
  *    (insertion order preserved — TBLPROPERTIES render in set order)
  *  - `["st", "<DataType json>"]` StructType via Spark's stable
  *    schema-JSON format
  */
object LedgerJson {

  // ---------------------------------------------------------------
  // encode
  // ---------------------------------------------------------------

  def encode(v: Any): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.result()
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 =>
        sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private def writeArr(vs: Iterable[Any], sb: StringBuilder): Unit = {
    sb.append('[')
    var first = true
    vs.foreach { v =>
      if (!first) sb.append(',')
      first = false
      write(v, sb)
    }
    sb.append(']')
  }

  private def writePairs(kvs: Iterable[(Any, Any)],
      sb: StringBuilder): Unit = {
    sb.append('[')
    var first = true
    kvs.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      sb.append('[')
      write(k, sb); sb.append(','); write(v, sb)
      sb.append(']')
    }
    sb.append(']')
  }

  private def write(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("[\"n\"]")
    case s: String =>
      sb.append("[\"s\","); writeString(s, sb); sb.append(']')
    case i: Int => sb.append("[\"i\",").append(i).append(']')
    case l: Long => sb.append("[\"l\",").append(l).append(']')
    case d: Double =>
      if (java.lang.Double.isFinite(d))
        sb.append("[\"d\",").append(d).append(']')
      else { sb.append("[\"d!\","); writeString(d.toString, sb)
        sb.append(']') }
    case f: Float =>
      if (java.lang.Float.isFinite(f))
        sb.append("[\"f\",").append(f).append(']')
      else { sb.append("[\"f!\","); writeString(f.toString, sb)
        sb.append(']') }
    case h: Short => sb.append("[\"h\",").append(h).append(']')
    case y: Byte => sb.append("[\"y\",").append(y).append(']')
    case b: Boolean =>
      sb.append("[\"b\",").append(b).append(']')
    case st: StructType =>
      sb.append("[\"st\","); writeString(st.json, sb); sb.append(']')
    case m: scala.collection.mutable.Map[_, _] =>
      sb.append("[\"M\",")
      writePairs(m.asInstanceOf[Iterable[(Any, Any)]], sb)
      sb.append(']')
    case m: scala.collection.Map[_, _] =>
      sb.append("[\"m\",")
      writePairs(m.asInstanceOf[Iterable[(Any, Any)]], sb)
      sb.append(']')
    case s: scala.collection.Set[_] =>
      sb.append("[\"e\","); writeArr(s, sb); sb.append(']')
    case p: Product if p.productPrefix.startsWith("Tuple") =>
      sb.append("[\"t\","); writeArr(p.productIterator.toSeq, sb)
      sb.append(']')
    case s: scala.collection.Iterable[_] =>
      sb.append("[\"q\","); writeArr(s, sb); sb.append(']')
    case other => throw new IllegalArgumentException(
      s"unledgerable value class ${other.getClass.getName}")
  }

  // ---------------------------------------------------------------
  // decode (minimal recursive-descent JSON, arrays/strings/scalars —
  // exactly the subset encode emits)
  // ---------------------------------------------------------------

  def decode(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    untag(v)
  }

  private def untag(v: Any): Any = v match {
    case arr: Vector[_] =>
      val tag = arr.head.asInstanceOf[String]
      tag match {
        case "n" => null
        case "s" => arr(1)
        case "i" => arr(1).asInstanceOf[java.math.BigDecimal].intValue
        case "l" => arr(1).asInstanceOf[java.math.BigDecimal].longValue
        case "d" =>
          arr(1).asInstanceOf[java.math.BigDecimal].doubleValue
        case "d!" => arr(1).asInstanceOf[String].toDouble
        case "f" =>
          arr(1).asInstanceOf[java.math.BigDecimal].floatValue
        case "f!" => arr(1).asInstanceOf[String].toFloat
        case "h" =>
          arr(1).asInstanceOf[java.math.BigDecimal].shortValue
        case "y" =>
          arr(1).asInstanceOf[java.math.BigDecimal].byteValue
        case "b" => arr(1)
        case "st" => DataType.fromJson(arr(1).asInstanceOf[String])
        case "t" =>
          val vs = arr(1).asInstanceOf[Vector[Any]].map(untag)
          vs.size match {
            case 2 => (vs(0), vs(1))
            case 3 => (vs(0), vs(1), vs(2))
            case 4 => (vs(0), vs(1), vs(2), vs(3))
            case 5 => (vs(0), vs(1), vs(2), vs(3), vs(4))
            case 6 => (vs(0), vs(1), vs(2), vs(3), vs(4), vs(5))
            case 7 => (vs(0), vs(1), vs(2), vs(3), vs(4), vs(5), vs(6))
            case 8 =>
              (vs(0), vs(1), vs(2), vs(3), vs(4), vs(5), vs(6), vs(7))
            case n => throw new IllegalArgumentException(
              s"unledgerable tuple arity $n")
          }
        case "q" => arr(1).asInstanceOf[Vector[Any]].map(untag)
        case "e" =>
          val out = scala.collection.mutable.LinkedHashSet[Any]()
          arr(1).asInstanceOf[Vector[Any]].foreach(e => out += untag(e))
          out
        case "m" =>
          arr(1).asInstanceOf[Vector[Any]].map { kv =>
            val p = kv.asInstanceOf[Vector[Any]]
            untag(p(0)) -> untag(p(1))
          }.toMap
        case "M" =>
          val out = scala.collection.mutable.LinkedHashMap[Any, Any]()
          arr(1).asInstanceOf[Vector[Any]].foreach { kv =>
            val p = kv.asInstanceOf[Vector[Any]]
            out(untag(p(0))) = untag(p(1))
          }
          out
        case other => throw new IllegalArgumentException(
          s"unknown ledger tag $other")
      }
    case other => other
  }

  private final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit =
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def value(): Any = {
      ws()
      s.charAt(i) match {
        case '[' =>
          i += 1; ws()
          val out = Vector.newBuilder[Any]
          if (s.charAt(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              out += value()
              ws()
              s.charAt(i) match {
                case ',' => i += 1
                case ']' => i += 1; more = false
                case c => throw new IllegalArgumentException(
                  s"ledger parse: expected , or ] at $i, got $c")
              }
            }
          }
          out.result()
        case '"' => string()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case '{' =>
          // objects appear only as the version header envelope
          i += 1; ws()
          val out = scala.collection.mutable.LinkedHashMap[String, Any]()
          if (s.charAt(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws()
              val k = string()
              ws()
              require(s.charAt(i) == ':', s"ledger parse: ':' at $i")
              i += 1
              out(k) = value()
              ws()
              s.charAt(i) match {
                case ',' => i += 1
                case '}' => i += 1; more = false
                case c => throw new IllegalArgumentException(
                  s"ledger parse: expected , or }} at $i, got $c")
              }
            }
          }
          out
        case _ =>
          val start = i
          while (i < s.length && "+-.eE0123456789".indexOf(
              s.charAt(i)) >= 0) i += 1
          new java.math.BigDecimal(s.substring(start, i))
      }
    }
    private def string(): String = {
      require(s.charAt(i) == '"', s"ledger parse: '\"' at $i")
      i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(
                s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case o => sb.append(o)
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.result()
    }
    def parseObjectHeader(): scala.collection.Map[String, Any] =
      value().asInstanceOf[scala.collection.Map[String, Any]]
  }

  /** Parse one `{"k":"<name>","v":<tagged>}` ledger line. */
  def decodeLine(line: String): (String, Any) = {
    val p = new Parser(line)
    val obj = p.parseObjectHeader()
    (obj("k").asInstanceOf[String], untag(obj.getOrElse("v", null)))
  }

  /** Is this line a deletion tombstone (`{"k":…,"del":true}`)? A
    * delta segment records a REMOVED per-entry key this way — the
    * loader drops the key instead of assigning it a value. */
  def isTombstone(line: String): Boolean = {
    val p = new Parser(line)
    p.parseObjectHeader().get("del").contains(true)
  }

  def encodeTombstone(key: String): String = {
    val sb = new StringBuilder
    sb.append("{\"k\":")
    writeString(key, sb)
    sb.append(",\"del\":true}")
    sb.result()
  }

  def encodeLine(key: String, v: Any): String = {
    val sb = new StringBuilder
    sb.append("{\"k\":")
    writeString(key, sb)
    sb.append(",\"v\":")
    write(v, sb)
    sb.append('}')
    sb.result()
  }
}
