package graft.http

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

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
  *
  * Each conjunct is `col OP literal` with OP one of `= != <= >= < >`;
  * literals may be single-quoted (quotes stripped), and the bare literal
  * `null` turns `=`/`!=` into IS NULL / IS NOT NULL. Literals are cast to
  * the COLUMN's schema type — a plain `col(c) op lit(v).cast(t)`
  * comparison on a scan attribute, which Spark's parquet source pushes to
  * footers and the engine's partition-dir + stats/bloom sidecar pruning
  * exploit at planning time. Unknown columns, malformed conjuncts, and
  * uncastable literals are client errors (Left), never silent empty
  * results: an uncastable literal yields `cast(...) IS NULL`, which this
  * parser REFUSES up front by test-casting on the driver.
  *
  * The filter applies BEFORE the projection, so `where` may reference
  * columns the response omits. */
private[graft] object TableShape {

  private val Conjunct =
    """^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(!=|<=|>=|=|<|>)\s*(.*?)\s*$""".r

  /** Apply `columns`/`where` from the decoded query params to `df`.
    * Left(message) = 400. */
  def apply(df: DataFrame, q: Map[String, String]): Either[String, DataFrame] =
    for {
      filtered <- q.get("where").filter(_.nonEmpty) match {
        case None    => Right(df)
        case Some(w) => compileWhere(df, w).map(df.filter)
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

  private def compileWhere(df: DataFrame, w: String): Either[String, Column] = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val conjuncts = w.split(";").toSeq.filter(_.trim.nonEmpty)
    if (conjuncts.isEmpty) return Left("where= must contain a predicate")
    val compiled = conjuncts.map {
      case Conjunct(c, op, rawV) =>
        fields.get(c) match {
          case None =>
            Left(s"where column $c is not a column of the result " +
              s"(have: ${df.columns.sorted.mkString(", ")})")
          case Some(dt) =>
            val v = if (rawV.length >= 2 && rawV.startsWith("'") &&
                rawV.endsWith("'")) rawV.substring(1, rawV.length - 1)
              else rawV
            if (v.equalsIgnoreCase("null") &&
                !(rawV.startsWith("'") && rawV.endsWith("'"))) op match {
              case "="  => Right(col(c).isNull)
              case "!=" => Right(col(c).isNotNull)
              case _ => Left(s"$op null is not a predicate; use =null / !=null")
            }
            else {
              // refuse uncastable literals LOUDLY on the driver: a silent
              // cast-to-null comparison matches nothing and reads as an
              // empty table
              val castOk = scala.util.Try(org.apache.spark.sql.catalyst.expressions.Cast(
                org.apache.spark.sql.catalyst.expressions.Literal(
                  org.apache.spark.unsafe.types.UTF8String.fromString(v),
                  org.apache.spark.sql.types.StringType),
                dt, Some(java.time.ZoneOffset.UTC.getId)).eval(null)).toOption
              if (castOk.flatMap(Option(_)).isEmpty && dt !=
                  org.apache.spark.sql.types.StringType)
                Left(s"where literal '$v' does not parse as ${dt.simpleString} " +
                  s"(column $c)")
              else {
                val l = lit(v).cast(dt)
                Right(op match {
                  case "="  => col(c) === l
                  case "!=" => col(c) =!= l
                  case "<"  => col(c) < l
                  case "<=" => col(c) <= l
                  case ">"  => col(c) > l
                  case ">=" => col(c) >= l
                })
              }
            }
        }
      case other =>
        Left(s"malformed where conjunct: '$other' (expected col OP value " +
          "with OP in = != < <= > >=, conjuncts ;-separated)")
    }
    compiled.collectFirst { case Left(m) => Left(m) }
      .getOrElse(Right(compiled.map(_.toOption.get).reduce(_ && _)))
  }
}
