package graft.cql

/** STAC FREE-TEXT SEARCH extension (`GET /search?q=...`): the `q`
  * parameter's query grammar, parsed onto the SAME [[Cql]] AST every other
  * filter path compiles through — so free-text search inherits both
  * backends (Catalyst Column + oracle SQL) and the whole gate suite.
  *
  * Grammar (the extension's advanced conformance class, the subset with
  * deterministic relational semantics — no fuzzy/proximity):
  *
  * {{{
  *   query  := or
  *   or     := and ((OR | ',') and)*          -- comma = OR (basic class)
  *   and    := unary (AND? unary)*            -- adjacency = AND
  *   unary  := (- | NOT) unary | ( query ) | "phrase" | term
  * }}}
  *
  * A term/phrase matches a document when its text appears ANYWHERE in one
  * of the searchable fields, case-insensitively — compiled to an OR of
  * `ILIKE '%term%'` across the fields. Terms containing LIKE
  * metacharacters (`% _ \`) are rejected up front: Spark and DuckDB
  * disagree on default LIKE escape semantics, so accepting them would
  * make the two backends diverge silently.
  */
object FreeText {

  /** Parse `q` into a predicate over `fields` (each field a column name
    * holding searchable text).
    */
  def parse(q: String, fields: Seq[String]): Cql =
    new P(tokenize(q), fields).query()

  // ------------------------------------------------------------- tokens
  private sealed trait Tok
  private case class Term(s: String) extends Tok
  private case class Phrase(s: String) extends Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object Comma extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      q.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case ',' => out += Comma; i += 1
        case '-' => out += NotTok; i += 1
        case '+' => i += 1 // "+term" = required = plain AND operand
        case '"' =>
          val end = q.indexOf('"', i + 1)
          if (end < 0) throw new IllegalArgumentException(
            s"free-text q: unterminated phrase at offset $i")
          out += Phrase(q.substring(i + 1, end))
          i = end + 1
        case _ =>
          var j = i
          while (j < q.length && !" \t\n(),\"".contains(q.charAt(j))) j += 1
          q.substring(i, j) match {
            case s if s.equalsIgnoreCase("AND") => out += AndTok
            case s if s.equalsIgnoreCase("OR")  => out += OrTok
            case s if s.equalsIgnoreCase("NOT") => out += NotTok
            case s => out += Term(s)
          }
          i = j
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- parser
  private final class P(var toks: List[Tok], fields: Seq[String]) {
    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = {
      val t = toks.head; toks = toks.tail; t
    }

    def query(): Cql = {
      val e = or()
      if (toks.nonEmpty) throw new IllegalArgumentException(
        s"free-text q: unexpected trailing input: $toks")
      e
    }

    private def or(): Cql = {
      var xs = List(and())
      while (peek.contains(OrTok) || peek.contains(Comma)) {
        next(); xs ::= and()
      }
      if (xs.size == 1) xs.head else Cql.Or(xs.reverse)
    }

    private def and(): Cql = {
      var xs = List(unary())
      var more = true
      while (more) peek match {
        case Some(AndTok) => next(); xs ::= unary()
        case Some(Term(_) | Phrase(_) | LParen | NotTok) => xs ::= unary()
        case _ => more = false
      }
      if (xs.size == 1) xs.head else Cql.And(xs.reverse)
    }

    private def unary(): Cql = peek match {
      case Some(NotTok) => next(); Cql.Not(unary())
      case Some(LParen) =>
        next()
        val e = or()
        if (!peek.contains(RParen))
          throw new IllegalArgumentException("free-text q: expected ')'")
        next(); e
      case Some(Term(s))   => next(); contains(s)
      case Some(Phrase(s)) => next(); contains(s)
      case other => throw new IllegalArgumentException(
        s"free-text q: expected a term, got $other")
    }

    /** term → OR over fields of case-insensitive containment. */
    private def contains(term: String): Cql = {
      if (term.isEmpty)
        throw new IllegalArgumentException("free-text q: empty term")
      if (term.exists("%_\\".contains(_)))
        throw new IllegalArgumentException(
          s"free-text q: LIKE metacharacters unsupported in term: $term")
      val likes = fields.map(f => Cql.Like(Cql.Prop(f), s"%$term%", ci = true))
      if (likes.size == 1) likes.head else Cql.Or(likes)
    }
  }
}
