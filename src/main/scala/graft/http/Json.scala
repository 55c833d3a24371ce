package graft.http

import scala.collection.mutable

/** Minimal JSON AST + parser + renderer (zero dependencies — the facade
  * runs on JDK-only `com.sun.net.httpserver`, SURVEY-sanctioned
  * substitution for the reference's Pekko-HTTP/spray stack since that jar
  * set is not in the environment). Covers exactly what the route envelope
  * contract needs: objects, arrays, strings, numbers, booleans, null.
  * Parity: the request/response shapes of routes/BatchRoutes.scala,
  * routes/StreamRoutes.scala, routes/ControlRoutes.scala.
  */
sealed trait JVal {
  def render: String = this match {
    case JNull        => "null"
    case JBool(b)     => b.toString
    case JNum(n)      => if (n.isWhole && n.abs < BigDecimal("1e18")) n.toBigInt.toString else n.toString
    case JStr(s)      => Json.quote(s)
    case JArr(items)  => items.map(_.render).mkString("[", ",", "]")
    case JObj(fields) => fields.map { case (k, v) => Json.quote(k) + ":" + v.render }.mkString("{", ",", "}")
  }
  def asObj: Map[String, JVal] = this match {
    case JObj(fields) => fields.toMap
    case other        => throw new IllegalArgumentException(s"expected object, got $other")
  }
  def str: String = this match {
    case JStr(s) => s
    case other   => throw new IllegalArgumentException(s"expected string, got $other")
  }
}
case object JNull extends JVal
final case class JBool(v: Boolean) extends JVal
final case class JNum(v: BigDecimal) extends JVal
final case class JStr(v: String) extends JVal
final case class JArr(items: Vector[JVal]) extends JVal
final case class JObj(fields: Vector[(String, JVal)]) extends JVal

object JObj { def of(fields: (String, JVal)*): JObj = JObj(fields.toVector) }

object Json {

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Recursive-descent parse; throws IllegalArgumentException on malformed
    * input (callers translate to a 400). */
  def parse(input: String): JVal = {
    val p = new Parser(input)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def ch: Char = { require(!eof, "unexpected end of input"); s.charAt(pos) }
    private def expect(c: Char): Unit = {
      require(!eof && ch == c, s"expected '$c' at offset $pos")
      pos += 1
    }

    def value(): JVal = {
      skipWs()
      ch match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _   => num()
      }
    }

    private def lit(w: String): Unit = {
      require(s.regionMatches(pos, w, 0, w.length), s"bad literal at offset $pos")
      pos += w.length
    }

    private def obj(): JObj = {
      expect('{'); skipWs()
      val fields = mutable.ArrayBuffer.empty[(String, JVal)]
      if (ch == '}') { pos += 1; return JObj(fields.toVector) }
      while (true) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        fields += (k -> value())
        skipWs()
        ch match {
          case ',' => pos += 1
          case '}' => pos += 1; return JObj(fields.toVector)
          case c   => throw new IllegalArgumentException(s"expected ',' or '}' got '$c' at $pos")
        }
      }
      JObj(fields.toVector)
    }

    private def arr(): JArr = {
      expect('['); skipWs()
      val items = mutable.ArrayBuffer.empty[JVal]
      if (ch == ']') { pos += 1; return JArr(items.toVector) }
      while (true) {
        items += value()
        skipWs()
        ch match {
          case ',' => pos += 1
          case ']' => pos += 1; return JArr(items.toVector)
          case c   => throw new IllegalArgumentException(s"expected ',' or ']' got '$c' at $pos")
        }
      }
      JArr(items.toVector)
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (ch != '"') {
        if (ch == '\\') {
          pos += 1
          ch match {
            case '"'  => sb.append('"'); pos += 1
            case '\\' => sb.append('\\'); pos += 1
            case '/'  => sb.append('/'); pos += 1
            case 'b'  => sb.append('\b'); pos += 1
            case 'f'  => sb.append('\f'); pos += 1
            case 'n'  => sb.append('\n'); pos += 1
            case 'r'  => sb.append('\r'); pos += 1
            case 't'  => sb.append('\t'); pos += 1
            case 'u'  =>
              pos += 1
              sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
              pos += 4
            case c    => throw new IllegalArgumentException(s"bad escape '\\$c' at $pos")
          }
        } else { sb.append(ch); pos += 1 }
      }
      pos += 1
      sb.toString
    }

    private def num(): JNum = {
      val start = pos
      if (!eof && (ch == '-' || ch == '+')) pos += 1
      while (!eof && (ch.isDigit || ch == '.' || ch == 'e' || ch == 'E' || ch == '-' || ch == '+'))
        pos += 1
      require(pos > start, s"expected a JSON value at offset $start")
      JNum(BigDecimal(s.substring(start, pos)))
    }
  }
}
