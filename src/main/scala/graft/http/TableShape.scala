package graft.http

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StringType}

/** Server-side projection + predicate pushdown for the table-serving
  * routes (`GET /table/data`, `GET /table/changes`) — the shape hints of
  * the public Delta Sharing protocol (`predicateHints` /
  * `jsonPredicateHints` + column selection), which exists for exactly this
  * reason: an HTTP consumer paging a LAKE-SCALE table must be able to say
  * which columns and rows it wants BEFORE the scan, not filter the pages
  * client-side (ref serves whole rows of whole snapshots,
  * `BatchRoutes.scala:216-241` — at 100 TB that plan is unservable).
  *
  * Grammar (deliberately tight — every accepted input compiles to a
  * pushable Catalyst predicate, so there is no "accepted but unpushed"
  * corner):
  *
  *   columns=a,b,c            projection, validated against the schema
  *   where=day=2026-01-01;k>5 `;`-separated conjuncts, AND semantics
  *                            (the split is quote-aware: `note='a;b'`
  *                            keeps the `;` inside the quoted literal)
  *
  * Each conjunct is `col OP literal` with OP one of `= != <= >= < >`;
  * literals may be single-quoted (quotes stripped), the bare literal
  * `null` turns `=`/`!=` into IS NULL / IS NOT NULL, and an unquoted
  * `=`/`!=` literal with `|` alternatives (`day=2026-01-01|2026-01-02`)
  * compiles to a pushed In / Not(In) — the Delta Sharing hint set's
  * IN-list. Literals are cast to
  * the COLUMN's schema type — a plain `col(c) op lit(v).cast(t)`
  * comparison on a scan attribute, which Spark's parquet source pushes to
  * footers and the engine's partition-dir + stats/bloom sidecar pruning
  * exploit at planning time. Unknown columns, malformed conjuncts, and
  * uncastable literals are client errors (Left), never silent empty
  * results: an uncastable literal yields `cast(...) IS NULL`, which this
  * parser REFUSES up front by test-casting on the driver.
  *
  * The filter applies BEFORE the projection, so `where` may reference
  * columns the response omits. The parsed form ([[Conjunct]]) is public
  * to the package so the indexed-serving path can route bounds through
  * the stats/bloom sidecars while this object stays the single grammar. */
private[graft] object TableShape {

  /** One parsed `col OP value` conjunct; `isNull` marks the bare `null`
    * literal form (`value` then holds "null"); `quoted` records that the
    * literal arrived single-quoted (so `|` inside it is a character, not
    * the IN-list separator). */
  final case class Conjunct(column: String, op: String, value: String,
      isNull: Boolean, quoted: Boolean = false)

  private val ConjunctRe =
    """^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(!=|<=|>=|=|<|>)\s*(.*?)\s*$""".r

  /** Split on `;` OUTSIDE single-quoted literals, so a quoted literal may
    * contain the conjunct separator (`where=note='a;b'`). The grammar has
    * no quote-escape form (tight by design); an unterminated quote is a
    * loud parse error, never a silently mangled predicate. */
  private[http] def splitConjuncts(w: String): Either[String, Seq[String]] = {
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    w.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ';' if !inQuote => parts += cur.result(); cur.clear()
      case c => cur += c
    }
    if (inQuote)
      Left(s"unterminated single quote in where=$w (quoted literals may " +
        "contain ; and |, but the closing quote is required)")
    else {
      parts += cur.result()
      Right(parts.result().filter(_.trim.nonEmpty))
    }
  }

  /** Parse `where=` into conjuncts — pure syntax, no schema yet. */
  def parseWhere(w: String): Either[String, Seq[Conjunct]] = {
    val parts = splitConjuncts(w) match {
      case Left(m) => return Left(m)
      case Right(ps) => ps
    }
    if (parts.isEmpty) return Left("where= must contain a predicate")
    val parsed = parts.map {
      case ConjunctRe(c, op, rawV) =>
        val quoted = rawV.length >= 2 && rawV.startsWith("'") && rawV.endsWith("'")
        val v = if (quoted) rawV.substring(1, rawV.length - 1) else rawV
        val isNull = !quoted && v.equalsIgnoreCase("null")
        if (isNull && op != "=" && op != "!=")
          Left(s"$op null is not a predicate; use =null / !=null")
        else Right(Conjunct(c, op, v, isNull, quoted))
      case other =>
        Left(s"malformed where conjunct: '$other' (expected col OP value " +
          "with OP in = != < <= > >=, conjuncts ;-separated)")
    }
    parsed.collectFirst { case Left(m) => Left(m) }
      .getOrElse(Right(parsed.map(_.toOption.get)))
  }

  /** Driver-side test cast of a string literal to `dt` — Some(typed value)
    * when it parses, None when the cast would yield null (which compiled
    * into a comparison silently matches nothing). */
  def castLiteral(v: String, dt: DataType): Option[Any] =
    if (dt == StringType) Some(v)
    else scala.util.Try(org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(v), StringType),
      dt, Some(java.time.ZoneOffset.UTC.getId)).eval(null))
      .toOption.flatMap(Option(_))

  /** Compile parsed conjuncts against `df`'s schema into one AND chain. */
  def compileConjuncts(
      df: DataFrame, conjuncts: Seq[Conjunct]): Either[String, Column] = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val compiled = conjuncts.map { cj =>
      fields.get(cj.column) match {
        case None =>
          Left(s"where column ${cj.column} is not a column of the result " +
            s"(have: ${df.columns.sorted.mkString(", ")})")
        case Some(_) if cj.isNull =>
          Right(if (cj.op == "=") col(cj.column).isNull
                else col(cj.column).isNotNull)
        case Some(dt) =>
          // IN-list: an unquoted `=`/`!=` literal with `|` alternatives
          // (the Delta Sharing hint set's In) — compiles to a pushed
          // In/Not(In); a quoted literal keeps its pipes as characters
          val values =
            if (!cj.quoted && (cj.op == "=" || cj.op == "!=") &&
                cj.value.contains("|"))
              cj.value.split("\\|").toSeq.map(_.trim).filter(_.nonEmpty)
            else Seq(cj.value)
          if (values.isEmpty)
            Left(s"where IN-list for ${cj.column} has no values")
          else values.find(v => castLiteral(v, dt).isEmpty) match {
            case Some(bad) =>
              Left(s"where literal '$bad' does not parse as " +
                s"${dt.simpleString} (column ${cj.column})")
            case None if values.size > 1 =>
              val in = col(cj.column).isin(
                values.map(v => lit(v).cast(dt)): _*)
              Right(if (cj.op == "=") in else !in)
            case None =>
              val l = lit(cj.value).cast(dt)
              Right(cj.op match {
                case "="  => col(cj.column) === l
                case "!=" => col(cj.column) =!= l
                case "<"  => col(cj.column) < l
                case "<=" => col(cj.column) <= l
                case ">"  => col(cj.column) > l
                case ">=" => col(cj.column) >= l
              })
          }
      }
    }
    compiled.collectFirst { case Left(m) => Left(m) }
      .getOrElse(Right(compiled.map(_.toOption.get).reduce(_ && _)))
  }

  /** Apply `columns`/`where` from the decoded query params to `df`.
    * Left(message) = 400. */
  def apply(df: DataFrame, q: Map[String, String]): Either[String, DataFrame] =
    for {
      filtered <- q.get("where").filter(_.nonEmpty) match {
        case None => Right(df)
        case Some(w) =>
          parseWhere(w).flatMap(compileConjuncts(df, _)).map(df.filter)
      }
      projected <- q.get("columns").filter(_.nonEmpty) match {
        case None => Right(filtered)
        case Some(cs) =>
          val want = cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val missing = want.filterNot(df.columns.contains)
          if (want.isEmpty)
            Left("columns= must name at least one column")
          else if (missing.nonEmpty)
            Left(s"columns not in the table: ${missing.mkString(", ")} " +
              s"(have: ${df.columns.sorted.mkString(", ")})")
          else Right(filtered.select(want.map(col): _*))
      }
    } yield projected
}
