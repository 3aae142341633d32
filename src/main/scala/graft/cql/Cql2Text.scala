package graft.cql

import graft.spatial.Shape

/** OGC CQL2-TEXT parser onto the SAME [[Cql]] AST the cql2-json path
  * compiles — the second mandated encoding of the STAC filter extension
  * (the reference app accepts `filter-lang=cql2-text` at its REST layer;
  * its engine only ever sees the converted tree, cf. filter_client.py).
  * One AST → both backends, so every text filter inherits the Column
  * compilation, SQL oracle rendering, property resolution, and the whole
  * gate suite unchanged.
  *
  * Surface (matches the AST): AND/OR/NOT + parentheses; = <> < <= > >=;
  * [NOT] LIKE; [NOT] IN; [NOT] BETWEEN; IS [NOT] NULL; CASEI(x);
  * arithmetic + - * / with precedence and parenthesized grouping;
  * TIMESTAMP('…'); T_BEFORE/T_AFTER/T_DURING(field, …); S_INTERSECTS
  * with WKT geometry (POINT, MULTIPOINT, LINESTRING, MULTILINESTRING,
  * POLYGON with holes, MULTIPOLYGON, GEOMETRYCOLLECTION) against
  * `geometry` or `footprint`.
  *
  * Hand-rolled recursive descent over a flat token array; `(` ambiguity
  * (boolean group vs arithmetic group) is resolved by bounded
  * backtracking on the saved token index. Keywords are case-insensitive;
  * identifiers keep their case.
  */
object Cql2Text {
  import Cql._

  // ------------------------------------------------------------- tokens
  private sealed trait Tok
  private case class Ident(s: String) extends Tok // raw case preserved
  private case class StrTok(s: String) extends Tok
  private case class NumTok(text: String) extends Tok
  private case class Sym(s: String) extends Tok // ( ) , = <> <= >= < > + - * /

  private def lex(in: String): Array[Tok] = {
    val out = Array.newBuilder[Tok]
    var i = 0
    def err(msg: String) =
      throw new IllegalArgumentException(s"cql2-text: $msg at offset $i in: $in")
    while (i < in.length) {
      val c = in.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < in.length && !closed) {
          val ch = in.charAt(i)
          if (ch == '\'') {
            if (i + 1 < in.length && in.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += ch; i += 1 }
        }
        if (!closed) err("unterminated string literal")
        out += StrTok(sb.toString)
      }
      else if (c.isDigit || (c == '.' && i + 1 < in.length && in.charAt(i + 1).isDigit)) {
        val start = i
        while (i < in.length && (in.charAt(i).isDigit || in.charAt(i) == '.' ||
          in.charAt(i) == 'e' || in.charAt(i) == 'E' ||
          ((in.charAt(i) == '+' || in.charAt(i) == '-') && i > start &&
            (in.charAt(i - 1) == 'e' || in.charAt(i - 1) == 'E')))) i += 1
        out += NumTok(in.substring(start, i))
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < in.length && (in.charAt(i).isLetterOrDigit ||
          in.charAt(i) == '_' || in.charAt(i) == '.')) i += 1
        out += Ident(in.substring(start, i))
      }
      else if (c == '<' && i + 1 < in.length && in.charAt(i + 1) == '>') { out += Sym("<>"); i += 2 }
      else if (c == '<' && i + 1 < in.length && in.charAt(i + 1) == '=') { out += Sym("<="); i += 2 }
      else if (c == '>' && i + 1 < in.length && in.charAt(i + 1) == '=') { out += Sym(">="); i += 2 }
      else if ("(),=<>+-*/".indexOf(c) >= 0) { out += Sym(c.toString); i += 1 }
      else err(s"unexpected character '$c'")
    }
    out.result()
  }

  // ------------------------------------------------------------- parser
  def parse(text: String): Cql = new P(lex(text), text).parseAll()

  private final class P(toks: Array[Tok], src: String) {
    private var pos = 0

    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"cql2-text: $msg near token ${if (pos < toks.length) toks(pos) else "<end>"} in: $src")

    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = peek.getOrElse(err("unexpected end")); pos += 1; t }
    private def kw(t: Tok): Option[String] = t match {
      case Ident(s) => Some(s.toUpperCase)
      case _ => None
    }
    private def peekKw: Option[String] = peek.flatMap(kw)
    private def eatKw(k: String): Boolean =
      if (peekKw.contains(k)) { pos += 1; true } else false
    private def expectKw(k: String): Unit = if (!eatKw(k)) err(s"expected $k")
    private def eatSym(s: String): Boolean = peek match {
      case Some(Sym(`s`)) => pos += 1; true
      case _ => false
    }
    private def expectSym(s: String): Unit = if (!eatSym(s)) err(s"expected '$s'")

    def parseAll(): Cql = {
      val e = orExpr()
      if (pos != toks.length) err("trailing input")
      e
    }

    private def orExpr(): Cql = {
      var xs = List(andExpr())
      while (eatKw("OR")) xs ::= andExpr()
      if (xs.tail.isEmpty) xs.head else Or(xs.reverse)
    }

    private def andExpr(): Cql = {
      var xs = List(notExpr())
      while (eatKw("AND")) xs ::= notExpr()
      if (xs.tail.isEmpty) xs.head else And(xs.reverse)
    }

    private def notExpr(): Cql =
      if (eatKw("NOT")) Not(notExpr()) else predicate()

    /** `(` opens either a boolean group or an arithmetic operand —
      * resolved by backtracking: try boolean first; if the parse fails OR
      * the closing paren is followed by a comparison/predicate tail, redo
      * as an operand comparison.
      */
    private def predicate(): Cql = peek match {
      case Some(Sym("(")) =>
        val save = pos
        try {
          pos += 1
          val e = orExpr()
          expectSym(")")
          peek match {
            case Some(Sym("=" | "<>" | "<" | "<=" | ">" | ">=" | "+" | "-" | "*" | "/")) =>
              pos = save; comparison() // it was an arithmetic group
            case Some(t) if kw(t).exists(
              Set("LIKE", "ILIKE", "IN", "BETWEEN", "IS", "NOT")) =>
              pos = save; comparison()
            case _ => e
          }
        } catch {
          case _: IllegalArgumentException if pos != save =>
            pos = save; comparison()
        }
      case Some(t) if kw(t).exists(Set("T_BEFORE", "T_AFTER", "T_DURING")) =>
        temporalFn()
      case Some(t) if kw(t).exists(Set(
        "T_INTERSECTS", "T_CONTAINS", "T_EQUALS", "T_STARTS", "T_STARTEDBY",
        "T_FINISHES", "T_FINISHEDBY", "T_MEETS", "T_METBY", "T_OVERLAPS",
        "T_OVERLAPPEDBY", "T_DISJOINT")) =>
        tIntervalFn(kw(t).get.toLowerCase)
      case Some(t) if kw(t).exists(
        Set("S_INTERSECTS", "S_DISJOINT", "S_WITHIN", "S_CONTAINS",
          "S_EQUALS", "S_TOUCHES", "S_CROSSES", "S_OVERLAPS")) =>
        spatialFn(kw(t).get)
      case Some(t) if kw(t).exists(
        Set("A_EQUALS", "A_CONTAINS", "A_CONTAINEDBY", "A_OVERLAPS")) =>
        arrayFn()
      case _ => comparison()
    }

    /** `A_CONTAINS(tags, ('a', 'b'))` — array predicates; an argument is
      * a property name or a parenthesized literal list (the cql2-text
      * array literal).
      */
    private def arrayFn(): Cql = {
      val op = kw(next()).get.toLowerCase
      expectSym("(")
      val l = arrayOperand()
      expectSym(",")
      val r = arrayOperand()
      expectSym(")")
      ArrayPred(op, l, r)
    }

    private def arrayOperand(): Operand = peek match {
      case Some(Sym("(")) =>
        pos += 1
        var vs = List(operand())
        while (eatSym(",")) vs ::= operand()
        expectSym(")")
        Arr(vs.reverse)
      case _ => operand()
    }

    private def temporalFn(): Cql = {
      val op = kw(next()).get.toLowerCase
      expectSym("(")
      // INTERVAL as the first argument selects the interval-valued Allen
      // form of t_before / t_after / t_during (mirrors the json parser)
      if (peekKw.contains("INTERVAL")) {
        val (ls, le) = interval()
        expectSym(",")
        val (rs, re) = interval()
        expectSym(")")
        return TIntervalPred(op, ls, le, rs, re)
      }
      val l = operand()
      expectSym(",")
      val c = op match {
        case "t_during" =>
          expectKw("INTERVAL"); expectSym("(")
          val lo = tsLit(); expectSym(","); val hi = tsLit()
          expectSym(")")
          Temporal("t_during", l, lo, Some(hi))
        case other => Temporal(other, l, tsLit(), None)
      }
      expectSym(")")
      c
    }

    /** `INTERVAL(a, b)` — each bound is a property name, a (quoted /
      * TIMESTAMP()) literal, or the open bound `'..'` (§4.9).
      */
    private def interval(): (Operand, Operand) = {
      expectKw("INTERVAL"); expectSym("(")
      def bound(): Operand = peek match {
        case Some(StrTok("..")) => pos += 1; OpenBound // open bound, §4.9
        case Some(Ident(n)) => pos += 1; Prop(n)
        case _ => tsLit()
      }
      val lo = bound(); expectSym(","); val hi = bound()
      expectSym(")")
      (lo, hi)
    }

    /** `T_INTERSECTS(INTERVAL(a, b), INTERVAL(c, d))` and the rest of the
      * Allen set; T_DISJOINT compiles to NOT T_INTERSECTS (exact
      * complements, mirrors the json parser).
      */
    private def tIntervalFn(op: String): Cql = {
      pos += 1
      expectSym("(")
      val (ls, le) = interval()
      expectSym(",")
      val (rs, re) = interval()
      expectSym(")")
      if (op == "t_disjoint") Not(TIntervalPred("t_intersects", ls, le, rs, re))
      else TIntervalPred(op, ls, le, rs, re)
    }

    private def tsLit(): Ts = peek match {
      case Some(t) if kw(t).contains("TIMESTAMP") =>
        pos += 1; expectSym("(")
        val s = next() match {
          case StrTok(v) => v
          case _ => err("TIMESTAMP expects a quoted literal")
        }
        expectSym(")")
        Ts(s)
      case Some(StrTok(v)) => pos += 1; Ts(v)
      case _ => err("expected TIMESTAMP('…')")
    }

    private def spatialFn(op: String): Cql = {
      pos += 1
      expectSym("(")
      val target = next() match {
        case Ident(n) => n
        case _ => err(s"$op expects a geometry property first")
      }
      expectSym(",")
      val shape = wkt()
      expectSym(")")
      op match {
        case "S_INTERSECTS" => SIntersects(shape, target)
        case "S_DISJOINT"   => Not(SIntersects(shape, target))
        // mirrors the json parser: geometry → point-in-shape, footprint →
        // the exact general box-within-region kernel; bad targets are a
        // typed error HERE (not a misleading message at compile time)
        case "S_WITHIN" if target == "footprint" => SWithinBox(shape)
        case "S_WITHIN" if target == "geometry"  => SIntersects(shape, target)
        case "S_WITHIN" => err(s"bad s_within target: $target")
        case rel if target == "geometry" || target == "footprint" =>
          SRel(rel.toLowerCase, shape, target)
        case rel => err(s"bad ${rel.toLowerCase} target: $target")
      }
    }

    private def comparison(): Cql = {
      val l = operand()
      val negate = eatKw("NOT")
      val c: Cql = peek match {
        case Some(Sym(op @ ("=" | "<>" | "<" | "<=" | ">" | ">="))) =>
          if (negate) err("NOT must precede LIKE/IN/BETWEEN")
          pos += 1; Cmp(op, l, operand())
        case Some(t) if kw(t).contains("LIKE") =>
          pos += 1
          next() match {
            case StrTok(p) => Like(l, p)
            case _ => err("LIKE expects a string pattern")
          }
        case Some(t) if kw(t).contains("ILIKE") => // extension, mirrors json path
          pos += 1
          next() match {
            case StrTok(p) => Like(l, p, ci = true)
            case _ => err("ILIKE expects a string pattern")
          }
        case Some(t) if kw(t).contains("IN") =>
          pos += 1; expectSym("(")
          var vs = List(operand())
          while (eatSym(",")) vs ::= operand()
          expectSym(")")
          In(l, vs.reverse)
        case Some(t) if kw(t).contains("BETWEEN") =>
          pos += 1
          val lo = operand()
          expectKw("AND")
          Between(l, lo, operand())
        case Some(t) if kw(t).contains("IS") =>
          pos += 1
          val n2 = eatKw("NOT")
          expectKw("NULL")
          if (n2) return if (negate) IsNull(l) else Not(IsNull(l))
          IsNull(l)
        case _ => err("expected a comparison operator")
      }
      if (negate) Not(c) else c
    }

    // ----------------------------------------------- arithmetic operands
    private def operand(): Operand = {
      var l = term()
      var go = true
      while (go) peek match {
        case Some(Sym(op @ ("+" | "-"))) => pos += 1; l = Arith(op, l, term())
        case _ => go = false
      }
      l
    }

    private def term(): Operand = {
      var l = factor()
      var go = true
      while (go) peek match {
        case Some(Sym(op @ ("*" | "/"))) => pos += 1; l = Arith(op, l, factor())
        case _ => go = false
      }
      l
    }

    private def factor(): Operand = peek match {
      case Some(Sym("(")) => pos += 1; val o = operand(); expectSym(")"); o
      case Some(Sym("-")) =>
        pos += 1
        factor() match {
          case IntNum(v) => IntNum(-v)
          case Num(v)    => Num(-v)
          case _ => err("unary minus applies to numeric literals")
        }
      case Some(NumTok(t)) =>
        pos += 1
        if (t.forall(_.isDigit)) IntNum(t.toLong) else Num(t.toDouble)
      case Some(StrTok(s)) => pos += 1; Str(s)
      case Some(t) if kw(t).contains("TRUE")  => pos += 1; Bool(true)
      case Some(t) if kw(t).contains("FALSE") => pos += 1; Bool(false)
      case Some(t) if kw(t).contains("TIMESTAMP") => tsLit()
      case Some(t) if kw(t).contains("CASEI") =>
        pos += 1; expectSym("(")
        val o = operand()
        expectSym(")")
        CaseI(o)
      case Some(t) if kw(t).contains("ACCENTI") =>
        pos += 1; expectSym("(")
        val o = operand()
        expectSym(")")
        Accenti(o)
      case Some(Ident(n)) => pos += 1; Prop(n)
      case _ => err("expected an operand")
    }

    // -------------------------------------------------------- WKT shapes
    private def num(): Double = next() match {
      case NumTok(t) => t.toDouble
      case Sym("-") => -num()
      case t => err(s"expected a number, got $t")
    }

    private def wktPoint(): (Double, Double) = { val x = num(); val y = num(); (x, y) }

    /** `(x y, x y, …)` — a position list; polygon rings drop the closing
      * vertex (same convention as the GeoJSON parser).
      */
    private def posList(closeRing: Boolean): Array[Double] = {
      expectSym("(")
      var pts = List(wktPoint())
      while (eatSym(",")) pts ::= wktPoint()
      expectSym(")")
      val seq = pts.reverse
      val open = if (closeRing && seq.length > 1 && seq.head == seq.last) seq.init else seq
      open.flatMap(p => Seq(p._1, p._2)).toArray
    }

    private def rings(): Array[Array[Double]] = {
      expectSym("(")
      var rs = List(posList(closeRing = true))
      while (eatSym(",")) rs ::= posList(closeRing = true)
      expectSym(")")
      rs.reverse.toArray
    }

    private def wkt(): Shape = {
      import Shape._
      kw(next()).getOrElse(err("expected a WKT geometry")) match {
        case "POINT" =>
          expectSym("("); val (x, y) = wktPoint(); expectSym(")")
          PointS(x, y)
        case "MULTIPOINT" =>
          // both MULTIPOINT(1 2, 3 4) and MULTIPOINT((1 2), (3 4))
          expectSym("(")
          val flat = Array.newBuilder[Double]
          def one(): Unit =
            if (eatSym("(")) { val (x, y) = wktPoint(); expectSym(")"); flat += x += y }
            else { val (x, y) = wktPoint(); flat += x += y }
          one()
          while (eatSym(",")) one()
          expectSym(")")
          MultiPointS(flat.result())
        case "LINESTRING" => LinesS(Array(posList(closeRing = false)))
        case "MULTILINESTRING" =>
          expectSym("(")
          var ls = List(posList(closeRing = false))
          while (eatSym(",")) ls ::= posList(closeRing = false)
          expectSym(")")
          LinesS(ls.reverse.toArray)
        case "POLYGON" =>
          PolyS(graft.spatial.Shape.normalizePoly(Array(rings())))
        case "MULTIPOLYGON" =>
          expectSym("(")
          var ps = List(rings())
          while (eatSym(",")) ps ::= rings()
          expectSym(")")
          PolyS(graft.spatial.Shape.normalizePoly(ps.reverse.toArray))
        case "GEOMETRYCOLLECTION" =>
          expectSym("(")
          var gs = List(wkt())
          while (eatSym(",")) gs ::= wkt()
          expectSym(")")
          CollS(gs.reverse.toArray)
        // cql2-text's own (non-WKT) spatial literal: BBOX(W, S, E, N)
        // with an optional z-interval (6 numbers, dropped in the fold) —
        // comma-separated per the 21-065 BNF, unlike WKT's space pairs
        case "BBOX" =>
          expectSym("(")
          var ns = List(num())
          while (eatSym(",")) ns ::= num()
          expectSym(")")
          try Shape.fromBbox(ns.reverse.toArray)
          catch { case e: IllegalArgumentException => err(e.getMessage) }
        case other => err(s"unsupported WKT type $other")
      }
    }
  }
}
