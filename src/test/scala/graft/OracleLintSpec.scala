package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-gate enforcement of the oracle dtype handoff convention.
  *
  * The driver's value hash is TYPE-sensitive: DuckDB types `sum(<integral>)`
  * as HUGEINT, which pandas materializes as float64/object, so an oracle
  * output column written as a bare `sum(x)` over integer data hash-mismatches
  * Spark's BIGINT even when every value is equal (the round-9 `unimax_mixture`
  * red row). The convention — every whole-expression `sum(...)` that reaches
  * the oracle's output carries an explicit `CAST` — was previously enforced
  * only by the optional local mirror (`tools/verify_local.py`, dtype-kind
  * compare); this spec puts a static form of it inside `sbt test`, the gate
  * every change actually runs.
  *
  * Scope (deliberately exact, zero false positives on the 222-query corpus):
  *   1. an output column of the FINAL select list whose entire expression is
  *      one `sum(...)` call — flagged unless wrapped in a cast;
  *   2. an output column that is a bare identifier defined elsewhere in the
  *      statement as an uncast `sum(...) AS ident` (CTE pass-through —
  *      DuckDB's HUGEINT survives the reference untouched).
  * A sum feeding further arithmetic (e.g. `SUM(..)/10000.0`) is NOT flagged:
  * the arithmetic re-types the result, and the float-division idiom is the
  * corpus's standard exact-cents pattern. String literals are blanked before
  * scanning so parentheses inside regex/text fragments can't skew depth.
  */
object OracleLint {

  /** Blank the contents of single-quoted SQL string literals (preserving the
    * quotes and length) so structural scanning ignores them; handles the ''
    * escape.
    */
  def stripStrings(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        out.append('\''); i += 1
        var closed = false
        while (i < s.length && !closed) {
          if (s.charAt(i) == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
            out.append("  "); i += 2
          } else if (s.charAt(i) == '\'') {
            out.append('\''); i += 1; closed = true
          } else { out.append(' '); i += 1 }
        }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private def kwAt(s: String, i: Int, kw: String): Boolean =
    s.regionMatches(true, i, kw, 0, kw.length) &&
      (i == 0 || !isWordChar(s.charAt(i - 1))) &&
      (i + kw.length >= s.length || !isWordChar(s.charAt(i + kw.length)))

  /** The select-list items of the final (depth-0) SELECT, split on depth-0
    * commas, trimmed. None if no depth-0 SELECT exists (malformed — callers
    * flag that too).
    */
  def finalSelectItems(sql: String): Option[Seq[String]] = {
    val s = stripStrings(sql)
    var depth = 0; var lastSel = -1
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && kwAt(s, i, "select")) lastSel = i
      }
      i += 1
    }
    if (lastSel < 0) return None
    val body = s.substring(lastSel + 6)
    depth = 0; var end = body.length
    var j = 0
    var done = false
    while (j < body.length && !done) {
      body.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && kwAt(body, j, "from")) { end = j; done = true }
      }
      j += 1
    }
    val sel = body.substring(0, end)
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    depth = 0
    sel.foreach { ch =>
      if (ch == '(') depth += 1
      if (ch == ')') depth -= 1
      if (ch == ',' && depth == 0) { items += cur.toString; cur.clear() }
      else cur.append(ch)
    }
    items += cur.toString
    Some(items.map(_.trim).filter(_.nonEmpty).toSeq)
  }

  private val sumOpen = "(?is)^\\s*sum\\s*\\(".r
  private val aliasTail = "(?is)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
  private val bareIdent = "(?is)^[A-Za-z_][A-Za-z0-9_.]*$".r

  /** True iff `expr` is exactly one sum(...) call — nothing after the
    * matching close paren (arithmetic tails re-type the result and are out
    * of scope).
    */
  def isWholeSum(expr: String): Boolean = sumOpen.findFirstMatchIn(expr) match {
    case None => false
    case Some(m) =>
      var depth = 0; var j = m.end - 1
      while (j < expr.length) {
        expr.charAt(j) match {
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return expr.substring(j + 1).trim.isEmpty
          case _ =>
        }
        j += 1
      }
      false
  }

  /** Identifiers defined anywhere in the statement as an UNCAST whole
    * `sum(...) AS ident` (the CTE pass-through surface).
    */
  def bareSumIdents(sql: String): Set[String] = {
    val s = stripStrings(sql)
    val found = scala.collection.mutable.Set.empty[String]
    var from = 0
    val open = "(?is)\\bsum\\s*\\(".r
    open.findAllMatchIn(s).foreach { m =>
      var depth = 0; var j = m.end - 1; var close = -1
      while (j < s.length && close < 0) {
        s.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = j
          case _ =>
        }
        j += 1
      }
      if (close > 0) {
        val tail = s.substring(close + 1)
        val am = "(?is)^\\s*AS\\s+([A-Za-z_][A-Za-z0-9_]*)".r.findFirstMatchIn(tail)
        val before = s.substring(0, m.start).reverse.dropWhile(_.isWhitespace).reverse.toLowerCase
        if (am.isDefined && !before.endsWith("cast(")) found += am.get.group(1).toLowerCase
      }
      from = m.end
    }
    found.toSet
  }

  /** All convention violations in one oracle statement. Empty = clean. */
  def lint(sql: String): Seq[String] = finalSelectItems(sql) match {
    case None => Seq("no depth-0 SELECT found (unparseable statement shape)")
    case Some(items) =>
      val cteIdents = bareSumIdents(sql)
      items.flatMap { it =>
        val expr = aliasTail.findFirstMatchIn(it).map(m => it.substring(0, m.start)).getOrElse(it)
        if (isWholeSum(expr))
          Some(s"bare SUM output column (DuckDB types it HUGEINT; wrap in CAST): ${it.take(80)}")
        else if (bareIdent.pattern.matcher(expr.trim).matches &&
                 cteIdents.contains(expr.trim.split('.').last.toLowerCase))
          Some(s"output passes through a CTE column defined as an uncast SUM: ${it.take(80)}")
        else None
      }
  }
}

class OracleLintSpec extends AnyFunSuite {

  test("every gated oracle follows the cast-your-sums dtype convention") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      OracleLint.lint(sql).map(v => s"$name: $v")
    }
    assert(violations.isEmpty,
      s"\noracle dtype lint failures (driver hash is type-sensitive):\n  ${violations.mkString("\n  ")}")
  }

  test("the lint catches the round-9 failure class (planted bare sums go red)") {
    // the exact unimax_mixture shape: bare integral sum in output position
    assert(OracleLint.lint(
      "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1").nonEmpty)
    // CTE pass-through: the HUGEINT survives into the final select untouched
    assert(OracleLint.lint(
      "WITH a AS (SELECT sum(x) AS s FROM t) SELECT s FROM a").nonEmpty)
    // the convention-following forms stay green
    assert(OracleLint.lint(
      "SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty FROM lineitem GROUP BY 1").isEmpty)
    assert(OracleLint.lint(
      "WITH a AS (SELECT CAST(sum(x) AS BIGINT) AS s FROM t) SELECT s FROM a").isEmpty)
    // arithmetic re-types the sum — the corpus's exact-cents division idiom
    assert(OracleLint.lint(
      "SELECT SUM(CAST(round(p*100) AS BIGINT)) / 10000.0 AS revenue FROM t").isEmpty)
    // parens inside string literals must not skew the structural scan
    assert(OracleLint.lint(
      "WITH d AS (SELECT 'x(' || v AS t FROM u) SELECT t FROM d").isEmpty)
  }
}
