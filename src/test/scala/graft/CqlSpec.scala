package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cql.Cql
import graft.cql.Cql._

class CqlSpec extends AnyFunSuite {

  test("stac query extension: ops map to the CQL2 AST, clauses AND, " +
      "__ denotes a nested path, bad ops rejected") {
    val ast = Cql.parseStacQuery(
      """{"properties__value": {"gte": 1.5, "lt": 9},
        | "collection": {"in": ["a", "b"]},
        | "id": {"startsWith": "x"},
        | "name": {"contains": "mid"},
        | "user_id": {"neq": 7}}""".stripMargin)
    assert(ast == And(Seq(
      Cmp(">=", Prop("properties.value"), Num(1.5)),
      Cmp("<", Prop("properties.value"), IntNum(9)),
      In(Prop("collection"), Seq(Str("a"), Str("b"))),
      Like(Prop("id"), "x%"),
      Like(Prop("name"), "%mid%"),
      Cmp("<>", Prop("user_id"), IntNum(7)))))
    // properties.value resolves to the bare column like every CQL2 ref
    assert(Cql.resolve(ast, Seq("value", "collection", "id", "name", "user_id"))
      .toSql.startsWith("(value >= 1.5 AND value < 9"))
    // a single clause stays bare (no 1-element AND)
    assert(Cql.parseStacQuery("""{"v": {"eq": 3}}""") == Cmp("=", Prop("v"), IntNum(3)))
    intercept[IllegalArgumentException] {
      Cql.parseStacQuery("""{"v": {"regex": "a.*"}}""")
    }
    intercept[IllegalArgumentException] { Cql.parseStacQuery("""{}""") }
    intercept[IllegalArgumentException] { Cql.parseStacQuery("""{"v": 3}""") }
  }

  test("parses comparison ops to AST and SQL") {
    val ast = Cql.parseJson("""{">=":[{"property":"value"},50.25]}""")
    assert(ast == Cmp(">=", Prop("value"), Num(50.25)))
    assert(ast.toSql == "value >= 50.25")
  }

  test("parses and/or/not trees, not accepts array or node form") {
    val a = Cql.parseJson(
      """{"and":[{"=":[{"property":"c"},"x"]},{"not":[{"<":[{"property":"v"},1]}]}]}""")
    assert(a.toSql == "(c = 'x' AND NOT (v < 1))")
    val b = Cql.parseJson("""{"not":{"=":[{"property":"c"},"x"]}}""")
    assert(b.toSql == "NOT (c = 'x')")
  }

  test("standard op/args encoding parses to the SAME AST as the compact " +
      "single-key form, nesting included") {
    val std = Cql.parseJson(
      """{"op":"and","args":[
        |  {"op":">","args":[{"property":"value"},100]},
        |  {"op":"not","args":[{"op":"like","args":[{"property":"p"},"ab%"]}]}]}"""
        .stripMargin)
    val compact = Cql.parseJson(
      """{"and":[{">":[{"property":"value"},100]},
        |        {"not":[{"like":[{"property":"p"},"ab%"]}]}]}""".stripMargin)
    assert(std == compact)
    assert(std.toSql == "(value > 100 AND NOT (p LIKE 'ab%'))")
  }

  test("like / ilike / in / between / isNull") {
    assert(Cql.parseJson("""{"like":[{"property":"p"},"ab%"]}""").toSql == "p LIKE 'ab%'")
    assert(Cql.parseJson("""{"ilike":[{"property":"p"},"AB%"]}""").toSql ==
      "LOWER(p) LIKE 'ab%'")
    assert(Cql.parseJson("""{"in":[{"property":"u"},[1,2]]}""").toSql == "u IN (1, 2)")
    assert(Cql.parseJson("""{"between":[{"property":"v"},1.5,2.5]}""").toSql ==
      "v BETWEEN 1.5 AND 2.5")
    assert(Cql.parseJson("""{"isNull":{"property":"d"}}""").toSql == "d IS NULL")
    assert(Cql.parseJson("""{"isNull":[{"property":"d"}]}""").toSql == "d IS NULL")
  }

  test("string values escaped in SQL backend") {
    assert(Cmp("=", Prop("s"), Str("o'brien")).toSql == "s = 'o''brien'")
  }

  test("unknown operator rejected") {
    assertThrows[IllegalArgumentException] {
      Cql.parseJson("""{"regex":[{"property":"p"},"x"]}""")
    }
  }

  test("empty and/or/in have defined semantics instead of reduce-crashing") {
    import Cql._
    assert(And(Nil).toSql == "TRUE")
    assert(Or(Nil).toSql == "FALSE")
    assert(In(Prop("u"), Nil).toSql == "FALSE")
    // Column backend builds without throwing
    And(Nil).toColumn; Or(Nil).toColumn; In(Prop("u"), Nil).toColumn
  }

  test("malformed cql2-json gets a clear error, not an NPE") {
    val cases = Seq(
      """{"=":[{"property":"p"}]}""",          // missing rhs
      """{"between":[{"property":"v"},1.5]}""", // missing hi
      """{"in":[{"property":"u"},5]}""",        // values not an array
      """{"and":{"=":[{"property":"p"},1]}}""", // and over non-array
      """{"t_during":[{"property":"d"},["2024-01-01 00:00:00"]]}""") // 1-elem interval
    cases.foreach { json =>
      val e = intercept[IllegalArgumentException](Cql.parseJson(json))
      assert(e.getMessage.contains("cql2"), s"$json → ${e.getMessage}")
    }
  }

  test("malformed s_intersects geometry gets a clear error, not an NPE") {
    val cases = Seq(
      """{"s_intersects":[{"property":"geometry"},{"coordinates":[]}]}""",      // no type
      """{"s_intersects":[{"property":"geometry"},{"type":"Polygon"}]}""",      // no coords
      """{"s_intersects":[{"property":"geometry"},{"type":"Polygon","coordinates":[[[1,2],[3,4]]]}]}""", // 2-pt ring
      """{"s_intersects":[{"property":"geometry"},{"type":"Polygon","coordinates":[[[1,"x"],[3,4],[5,6]]]}]}""", // non-numeric
      """{"s_intersects":[{"property":"geometry"},{"type":"MultiPolygon","coordinates":[]}]}""")
    cases.foreach { json =>
      val e = intercept[IllegalArgumentException](Cql.parseJson(json))
      assert(e.getMessage.contains("cql2"), s"$json → ${e.getMessage}")
    }
  }

  test("property resolution rewrites name variants across the whole AST") {
    val ast = Cql.parseJson(
      """{"and":[{">":[{"property":"properties.value"},1.0]},
        |        {"in":[{"property":"properties__user_id"},[1,2]]},
        |        {"isNull":{"property":"datetime"}}]}""".stripMargin)
    val resolved = Cql.resolve(ast, Seq("value", "user_id", "datetime"))
    assert(resolved.toSql == "(value > 1.0 AND user_id IN (1, 2) AND datetime IS NULL)")
  }

  test("Column backend filters rows identically to semantics") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq((1L, "click", 10.0), (2L, "view", 150.0), (3L, "click", 200.0))
      .toDF("id", "c", "v")
    val ast = Cql.parseJson(
      """{"and":[{"=":[{"property":"c"},"click"]},{">":[{"property":"v"},100.0]}]}""")
    val ids = df.where(ast.toColumn).select("id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("arithmetic operands parse, render to SQL, resolve, and filter") {
    val s = TestSpark.spark
    import s.implicits._
    val ast = Cql.parseJson(
      """{">=":[{"+":[{"*":[{"property":"properties.v"},2.0]},{"property":"u"}]},25.0]}""")
    val resolved = Cql.resolve(ast, Seq("v", "u"))
    assert(resolved.toSql == "((v * 2.0) + u) >= 25.0")
    val df = Seq((1L, 5.0, 10L), (2L, 10.0, 10L), (3L, 2.0, 1L))
      .toDF("id", "v", "u")
    val ids = df.where(resolved.toColumn).select("id").as[Long].collect().toSet
    assert(ids == Set(2L)) // 5*2+10=20 <25; 10*2+10=30 ≥25; 2*2+1=5 <25
    // malformed arity fails with a clear message
    val e = intercept[IllegalArgumentException](
      Cql.parseJson("""{"=":[{"+":[1.0]},2.0]}"""))
    assert(e.getMessage.contains("'+' expects"), e.getMessage)
  }

  test("array predicates: json + text parse to one AST; both backends agree " +
      "on set semantics") {
    val ast = Cql.parseJson(
      """{"a_contains":[{"property":"tags"},["a","b"]]}""")
    assert(ast == ArrayPred("a_contains", Prop("tags"), Arr(Seq(Str("a"), Str("b")))))
    assert(ast.toSql == "list_has_all(tags, ['a', 'b'])")
    // text encoding (A_CONTAINEDBY spelled per spec) → same AST
    val t = graft.cql.Cql2Text.parse("A_containedBy(tags, ('a', 'b'))")
    assert(t == ArrayPred("a_containedby", Prop("tags"), Arr(Seq(Str("a"), Str("b")))))
    // Column backend: set semantics on duplicated/reordered elements
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("b", "a", "a")),
      (3L, Seq("c")),
      (4L, Seq.empty[String])).toDF("id", "tags")
    def ids(json: String): Seq[Long] =
      df.where(Cql.parseJson(json).toColumn).select("id")
        .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids("""{"a_contains":[{"property":"tags"},["a","b"]]}""") == Seq(1, 2))
    assert(ids("""{"a_containedBy":[{"property":"tags"},["a","b","c","d"]]}""") ==
      Seq(1, 2, 3, 4)) // empty set is contained by anything
    assert(ids("""{"a_overlaps":[{"property":"tags"},["c","zz"]]}""") == Seq(1, 3))
    // order and multiplicity irrelevant for a_equals
    assert(ids("""{"a_equals":[{"property":"tags"},["b","a"]]}""") == Seq(2))
    assert(ids("""{"a_equals":[{"property":"tags"},["a","b","c"]]}""") == Seq(1))
  }

  test("free-text q grammar: terms, phrases, comma-OR, adjacency-AND, " +
      "-/NOT, parens, +required — onto the one AST") {
    import graft.cql.FreeText
    def p(q: String) = FreeText.parse(q, Seq("t"))
    val like = (s: String) => Like(Prop("t"), s"%$s%", ci = true)
    assert(p("cat") == like("cat"))
    assert(p("cat,dog") == Or(Seq(like("cat"), like("dog"))))
    assert(p("cat dog") == And(Seq(like("cat"), like("dog"))))
    assert(p("cat AND dog OR fish") ==
      Or(Seq(And(Seq(like("cat"), like("dog"))), like("fish"))))
    assert(p("(cat OR dog) -fish") ==
      And(Seq(Or(Seq(like("cat"), like("dog"))), Not(like("fish")))))
    assert(p("""+cat NOT "hot dog"""") == And(Seq(like("cat"), Not(like("hot dog")))))
    // multi-field: a term fans out to an OR across searchable fields
    assert(FreeText.parse("x", Seq("a", "b")) ==
      Or(Seq(Like(Prop("a"), "%x%", ci = true), Like(Prop("b"), "%x%", ci = true))))
    // rejections: LIKE metacharacters, empty/unterminated input
    assertThrows[IllegalArgumentException](p("100%"))
    assertThrows[IllegalArgumentException](p("\"unterminated"))
    assertThrows[IllegalArgumentException](p("(cat"))
    assertThrows[IllegalArgumentException](p(""))
  }

  test("cql2-text parses to the same AST as cql2-json (SQL renderings equal)") {
    import graft.cql.Cql2Text
    val text = Cql2Text.parse(
      """(collection = 'click' OR collection = 'view') AND NOT value < 100.5
        |AND user_id BETWEEN 5 AND 120 AND id LIKE 'a%'
        |AND value IN (1.5, 2.5) AND datetime IS NULL
        |AND value * 2.0 + user_id >= 25.0""".stripMargin)
    val json = Cql.parseJson(
      """{"and":[
        |  {"or":[{"=":[{"property":"collection"},"click"]},
        |         {"=":[{"property":"collection"},"view"]}]},
        |  {"not":[{"<":[{"property":"value"},100.5]}]},
        |  {"between":[{"property":"user_id"},5,120]},
        |  {"like":[{"property":"id"},"a%"]},
        |  {"in":[{"property":"value"},[1.5,2.5]]},
        |  {"isNull":{"property":"datetime"}},
        |  {">=":[{"+":[{"*":[{"property":"value"},2.0]},{"property":"user_id"}]},25.0]}
        |]}""".stripMargin)
    // text AND-chains flatten where json nests — compare via SQL rendering
    assert(Cql.And(Seq(text)).toSql.replace("(", "").replace(")", "") ==
      Cql.And(Seq(json)).toSql.replace("(", "").replace(")", ""))
  }

  test("cql2-text postfix forms: NOT LIKE, IS NOT NULL, ILIKE, casei, timestamps") {
    import graft.cql.Cql2Text
    assert(Cql2Text.parse("id NOT LIKE '%7'").toSql == "NOT (id LIKE '%7')")
    assert(Cql2Text.parse("datetime IS NOT NULL").toSql == "NOT (datetime IS NULL)")
    assert(Cql2Text.parse("collection ILIKE 'CL%'").toSql ==
      "LOWER(collection) LIKE 'cl%'")
    assert(Cql2Text.parse("CASEI(collection) = CASEI('Click')").toSql ==
      "LOWER(collection) = LOWER('Click')")
    assert(Cql2Text.parse("datetime >= TIMESTAMP('2024-01-03 00:00:00')").toSql ==
      "datetime >= TIMESTAMP '2024-01-03 00:00:00'")
    assert(Cql2Text.parse(
      "T_DURING(datetime, INTERVAL(TIMESTAMP('2024-01-01 00:00:00'), TIMESTAMP('2024-02-01 00:00:00')))").toSql ==
      "(datetime >= TIMESTAMP '2024-01-01 00:00:00' AND datetime <= TIMESTAMP '2024-02-01 00:00:00')")
    // escaped quote in string literal
    assert(Cql2Text.parse("id = 'o''brien'").toSql == "id = 'o''brien'")
  }

  test("cql2-text WKT geometries parse to the same Shape as GeoJSON") {
    import graft.cql.Cql2Text
    val t = Cql2Text.parse(
      "S_INTERSECTS(geometry, GEOMETRYCOLLECTION(POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2)), MULTIPOINT((30 20), (-17 -8)), LINESTRING(12 -7, 15 7)))")
    val j = Cql.parseJson(
      """{"s_intersects":[{"property":"geometry"},
        |  {"type":"GeometryCollection","geometries":[
        |    {"type":"Polygon","coordinates":[
        |      [[0,0],[10,0],[10,10],[0,10],[0,0]],
        |      [[2,2],[4,2],[4,4],[2,4],[2,2]]]},
        |    {"type":"MultiPoint","coordinates":[[30,20],[-17,-8]]},
        |    {"type":"LineString","coordinates":[[12,-7],[15,7]]}]}]}""".stripMargin)
    assert(t.toSql == j.toSql) // identical Shape ⇒ identical rendered kernel SQL
  }

  test("s_disjoint and s_within: json and text forms agree, disjoint is " +
      "exactly NOT intersects, within implies intersects, concave answered " +
      "exactly (r10: the convex-only rejection is gone)") {
    import graft.cql.Cql2Text
    val poly = """{"type":"Polygon","coordinates":[[[0.0,0.0],[10.0,0.0],
                 |[10.0,10.0],[0.0,10.0],[0.0,0.0]]]}""".stripMargin
    val dJson = Cql.parseJson(s"""{"s_disjoint":[{"property":"geometry"},$poly]}""")
    val iJson = Cql.parseJson(s"""{"s_intersects":[{"property":"geometry"},$poly]}""")
    assert(dJson.toSql == Not(iJson).toSql,
      "disjoint must render as the negated intersects")
    val dText = Cql2Text.parse(
      "S_DISJOINT(geometry, POLYGON((0 0, 10 0, 10 10, 0 10, 0 0)))")
    assert(dText.toSql == dJson.toSql, "text and json renderings must agree")
    val wJson = Cql.parseJson(s"""{"s_within":[{"property":"footprint"},$poly]}""")
    val wText = Cql2Text.parse(
      "S_WITHIN(footprint, POLYGON((0 0, 10 0, 10 10, 0 10, 0 0)))")
    assert(wJson.toSql == wText.toSql)
    // within(point target) degrades to intersects
    assert(Cql.parseJson(s"""{"s_within":[{"property":"geometry"},$poly]}""")
      .toSql == iJson.toSql)
    // a concave query ring is ANSWERED exactly by the general kernel
    // (boxWithinGeom) — r9's typed rejection replaced in r10. A box in
    // the notch of this arrowhead is not within; a box clear of it is.
    val concave = """{"type":"Polygon","coordinates":[[[0.0,0.0],[10.0,0.0],
                    |[5.0,5.0],[10.0,10.0],[0.0,10.0],[0.0,0.0]]]}""".stripMargin
    val wConcave = Cql.parseJson(s"""{"s_within":[{"property":"footprint"},$concave]}""")
    assert(wConcave.toSql.nonEmpty) // renders, no rejection
    val sess0 = TestSpark.spark
    import sess0.implicits._
    val boxes = Seq(
      ("clear", 1.0, 1.0, 3.0, 9.0),     // left of the notch: within
      ("notch", 6.0, 4.0, 8.0, 6.0),     // inside the notch: not within
      ("straddle", 3.0, 4.0, 7.0, 6.0),  // notch edges cross it: not within
      ("outside", 20.0, 20.0, 22.0, 22.0)
    ).toDF("label", "xmin", "ymin", "xmax", "ymax")
    val within = boxes.where(wConcave.toColumn).select("label").as[String].collect().toSet
    assert(within == Set("clear"), s"concave within claimed $within")
    // semantics on live data: within ⊆ intersects; disjoint ≡ complement
    val s = TestSpark.spark
    val items = graft.core.Tables.items(s, TestSpark.sf)
    val inter = items.where(iJson.toColumn).count()
    val disj = items.where(dJson.toColumn).count()
    assert(inter + disj == items.count(), "disjoint must complement intersects")
  }

  test("t_intersects / t_contains interval predicates: json and text parse " +
      "to one AST, rendering is the closed-interval algebra, nulls 3VL") {
    import graft.cql.Cql2Text
    val j = Cql.parseJson(
      """{"t_intersects":[
        |  {"interval":[{"property":"start_datetime"},{"property":"end_datetime"}]},
        |  {"interval":["2024-01-10 00:00:00","2024-01-12 00:00:00"]}]}""".stripMargin)
    val t = Cql2Text.parse(
      "T_INTERSECTS(INTERVAL(start_datetime, end_datetime), " +
        "INTERVAL('2024-01-10 00:00:00', '2024-01-12 00:00:00'))")
    assert(j == t, "json and text must build the same AST")
    assert(j.toSql ==
      "(start_datetime <= TIMESTAMP '2024-01-12 00:00:00' AND " +
        "end_datetime >= TIMESTAMP '2024-01-10 00:00:00')")
    val c = Cql.parseJson(
      """{"t_contains":[
        |  {"interval":[{"property":"start_datetime"},{"property":"end_datetime"}]},
        |  {"interval":["2024-01-10 00:00:00","2024-01-12 00:00:00"]}]}""".stripMargin)
    // Allen's STRICT contains (OGC 21-065): start1 < start2 AND end1 > end2
    assert(c.toSql ==
      "(start_datetime < TIMESTAMP '2024-01-10 00:00:00' AND " +
        "end_datetime > TIMESTAMP '2024-01-12 00:00:00')")
    // contains implies intersects; null bounds claim nothing
    val s = TestSpark.spark
    val items = graft.core.Tables.items(s, TestSpark.sf)
    val ni = items.where(j.toColumn).count()
    val nc = items.where(c.toColumn).count()
    assert(nc <= ni && ni > 0)
    val nullRows = items.where("start_datetime IS NULL")
    assert(nullRows.where(j.toColumn).count() == 0, "3VL: unknown never claimed")
    // malformed interval gets a clear error
    val e = intercept[IllegalArgumentException](Cql.parseJson(
      """{"t_intersects":[{"property":"datetime"},{"interval":["a","b"]}]}"""))
    assert(e.getMessage.contains("interval"), e.getMessage)
  }

  test("open interval bounds ('..' / null, OGC 21-065 §4.9) fold conjuncts " +
      "instead of casting to NULL — json and text agree") {
    import graft.cql.Cql2Text
    // t_intersects with an open end = a one-sided 'from' filter
    val j = Cql.parseJson(
      """{"t_intersects":[
        |  {"interval":[{"property":"start_datetime"},{"property":"end_datetime"}]},
        |  {"interval":["2024-01-10 00:00:00",".."]}]}""".stripMargin)
    val t = Cql2Text.parse(
      "T_INTERSECTS(INTERVAL(start_datetime, end_datetime), " +
        "INTERVAL('2024-01-10 00:00:00', '..'))")
    assert(j == t, "json '..' and text '..' must build the same AST")
    val jn = Cql.parseJson(
      """{"t_intersects":[
        |  {"interval":[{"property":"start_datetime"},{"property":"end_datetime"}]},
        |  {"interval":["2024-01-10 00:00:00",null]}]}""".stripMargin)
    assert(j == jn, "json null bound ≡ '..'")
    // folded conjuncts are DROPPED (r10: the shared Allen algebra
    // renders only live terms — no "TRUE AND" noise in pushed-down SQL)
    assert(j.toSql == "(end_datetime >= TIMESTAMP '2024-01-10 00:00:00')")
    // fully open interval intersects everything with a known interval
    val full = Cql.parseJson(
      """{"t_intersects":[
        |  {"interval":[{"property":"start_datetime"},{"property":"end_datetime"}]},
        |  {"interval":["..",".."]}]}""".stripMargin)
    assert(full.toSql == "TRUE")
    // t_contains: open OUTER bound is ±∞ (conjunct TRUE); open INNER
    // start is unbeatable (FALSE)
    val cOuter = Cql.parseJson(
      """{"t_contains":[
        |  {"interval":["..",".."]},
        |  {"interval":["2024-01-10 00:00:00","2024-01-12 00:00:00"]}]}""".stripMargin)
    assert(cOuter.toSql == "TRUE")
    val cInner = Cql.parseJson(
      """{"t_contains":[
        |  {"interval":[{"property":"start_datetime"},{"property":"end_datetime"}]},
        |  {"interval":["..","2024-01-12 00:00:00"]}]}""".stripMargin)
    assert(cInner.toSql == "FALSE")
    // live data: one-sided from-filter ≡ the plain end >= bound predicate
    val s = TestSpark.spark
    val items = graft.core.Tables.items(s, TestSpark.sf)
    val n1 = items.where(j.toColumn).count()
    val n2 = items.where("end_datetime >= timestamp'2024-01-10 00:00:00'").count()
    assert(n1 == n2 && n1 > 0)
    // an open bound outside an interval is a typed error, not a NULL cast
    val esc = intercept[IllegalArgumentException](
      Cql.Cmp("=", Cql.Prop("datetime"), Cql.OpenBound).toColumn)
    assert(esc.getMessage.contains("open bound"), esc.getMessage)
  }

  test("complete Allen interval set: every OGC 21-065 temporal function " +
      "claims exactly its relation on a constructed interval frame, " +
      "json ≡ text AST, 3VL on null bounds") {
    import graft.cql.Cql2Text
    val s = TestSpark.spark
    import s.implicits._
    // reference interval R = [10:00, 20:00]; one row per Allen relation
    def t(hm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00")
    val rows = Seq(
      ("eq", t("10:00"), t("20:00")), ("starts", t("10:00"), t("15:00")),
      ("startedby", t("10:00"), t("23:00")), ("finishes", t("15:00"), t("20:00")),
      ("finishedby", t("05:00"), t("20:00")), ("meets", t("05:00"), t("10:00")),
      ("metby", t("20:00"), t("23:00")), ("overlaps", t("05:00"), t("15:00")),
      ("overlappedby", t("15:00"), t("23:00")), ("during", t("12:00"), t("18:00")),
      ("contains", t("05:00"), t("23:00")), ("before", t("01:00"), t("05:00")),
      ("after", t("21:00"), t("23:00")),
      ("nullrow", null.asInstanceOf[java.sql.Timestamp], t("15:00")))
    val df = rows.toDF("label", "s", "e")
    val expected = Map(
      "t_equals" -> Set("eq"), "t_starts" -> Set("starts"),
      "t_startedby" -> Set("startedby"), "t_finishes" -> Set("finishes"),
      "t_finishedby" -> Set("finishedby"), "t_meets" -> Set("meets"),
      "t_metby" -> Set("metby"), "t_overlaps" -> Set("overlaps"),
      "t_overlappedby" -> Set("overlappedby"), "t_during" -> Set("during"),
      "t_contains" -> Set("contains"), "t_before" -> Set("before"),
      "t_after" -> Set("after"),
      "t_intersects" -> (rows.map(_._1).toSet -- Set("before", "after", "nullrow")),
      "t_disjoint" -> Set("before", "after"))
    expected.foreach { case (op, want) =>
      val json = Cql.parseJson(
        s"""{"$op":[
           |  {"interval":[{"property":"s"},{"property":"e"}]},
           |  {"interval":["2024-01-01 10:00:00","2024-01-01 20:00:00"]}]}""".stripMargin)
      val text = Cql2Text.parse(
        s"${op.toUpperCase}(INTERVAL(s, e), " +
          "INTERVAL('2024-01-01 10:00:00', '2024-01-01 20:00:00'))")
      assert(json == text, s"$op: json and text must build the same AST")
      val got = df.where(json.toColumn).select("label").as[String].collect().toSet
      assert(got == want, s"$op claimed $got, expected $want")
    }
    // the boundary-equality ops compose with property pairs + open bounds
    // (the a76 gate's construction): starts([s,e],[s,..]) holds wherever
    // the interval is known
    val st = Cql.parseJson(
      """{"t_starts":[
        |  {"interval":[{"property":"s"},{"property":"e"}]},
        |  {"interval":[{"property":"s"},".."]}]}""".stripMargin)
    assert(df.where(st.toColumn).count() == rows.length - 1)
    // t_equals against a half-open literal interval can never hold —
    // folds to constant FALSE in BOTH renderings (not a NULL cast)
    val eqOpen = Cql.parseJson(
      """{"t_equals":[
        |  {"interval":[{"property":"s"},{"property":"e"}]},
        |  {"interval":["2024-01-01 10:00:00",".."]}]}""".stripMargin)
    assert(eqOpen.toSql == "FALSE")
    assert(df.where(eqOpen.toColumn).count() == 0)
    // ...but equality of two same-signed infinities is TRUE: [s,..] starts [..,..]? no —
    // starts needs equal starts; [..,..] startedby [..,e]: ls(-inf)=rs(-inf), le(+inf)>e
    val infEq = Cql.parseJson(
      """{"t_startedby":[
        |  {"interval":["..",".."]},
        |  {"interval":["..",{"property":"e"}]}]}""".stripMargin)
    assert(infEq.toSql == "TRUE")
    // interval-valued t_before/t_after/t_during parse via the interval
    // first arg; the legacy instant forms still parse to Temporal
    assert(Cql.parseJson(
      """{"t_before":[{"interval":[{"property":"s"},{"property":"e"}]},
        |             {"interval":["2024-01-01 10:00:00",".."]}]}""".stripMargin)
      .isInstanceOf[Cql.TIntervalPred])
    assert(Cql.parseJson(
      """{"t_before":[{"property":"datetime"},"2024-01-03 00:00:00"]}""")
      .isInstanceOf[Cql.Temporal])
    assert(Cql2Text.parse(
      "T_DURING(INTERVAL(s, e), INTERVAL('2024-01-01 10:00:00', '2024-01-01 20:00:00'))")
      .isInstanceOf[Cql.TIntervalPred])
    assert(Cql2Text.parse(
      "T_DURING(datetime, INTERVAL('2024-01-01 10:00:00', '2024-01-01 20:00:00'))")
      .isInstanceOf[Cql.Temporal])
    // T_DISJOINT parses to NOT T_INTERSECTS in both grammars
    val dj = Cql.parseJson(
      """{"t_disjoint":[
        |  {"interval":[{"property":"s"},{"property":"e"}]},
        |  {"interval":["2024-01-01 10:00:00","2024-01-01 20:00:00"]}]}""".stripMargin)
    val dt = Cql2Text.parse(
      "T_DISJOINT(INTERVAL(s, e), INTERVAL('2024-01-01 10:00:00', '2024-01-01 20:00:00'))")
    assert(dj == dt)
    assert(dj.isInstanceOf[Cql.Not])
  }

  test("accenti accessor: json ≡ text AST, strip_accents SQL rendering, " +
      "NFD kernel semantics on a constructed accent frame, 3VL on null") {
    import graft.cql.Cql2Text
    import org.apache.spark.sql.functions.col
    val s = TestSpark.spark
    import s.implicits._
    val json = Cql.parseJson(
      """{"=":[{"accenti":{"property":"name"}},{"accenti":"cäfé"}]}""")
    val text = Cql2Text.parse("ACCENTI(name) = ACCENTI('cäfé')")
    assert(json == text, "accenti: json and text must build the same AST")
    assert(json.toSql == "strip_accents(name) = strip_accents('cäfé')")
    // resolve passes through the wrapper like casei does
    assert(Cql.resolve(json, Seq("name")).toSql == json.toSql)

    val df = Seq("café", "cafe", "CAFÉ", "ß", "Łódź", "Łodz", "ấǡḸ",
      null.asInstanceOf[String]).toDF("name")
    def claims(ast: Cql): Set[String] =
      df.where(ast.toColumn).as[String].collect().toSet
    // accent-insensitive equality: literal and column both strip
    assert(claims(json) == Set("café", "cafe"))
    // casei ∘ accenti claims the case variant too
    assert(claims(Cql.parseJson(
      """{"=":[{"casei":{"accenti":{"property":"name"}}},
        |      {"casei":{"accenti":"CÀFÉ"}}]}""".stripMargin)) ==
      Set("café", "cafe", "CAFÉ"))
    // accenti ∘ casei (strip(LOWER(x))) — same claim set on this frame
    assert(claims(Cql.parseJson(
      """{"=":[{"accenti":{"casei":{"property":"name"}}},
        |      {"accenti":{"casei":"CÀFÉ"}}]}""".stripMargin)) ==
      Set("café", "cafe", "CAFÉ"))
    // no-decomposition pass-through: ß survives, so only ß matches
    assert(claims(Cql.parseJson(
      """{"=":[{"accenti":{"property":"name"}},"ß"]}""")) == Set("ß"))
    // mixed word: Ł passes through while ó/ź strip → both spellings land
    // on 'Łodz'
    assert(claims(Cql.parseJson(
      """{"=":[{"accenti":{"property":"name"}},"Łodz"]}""")) ==
      Set("Łódź", "Łodz"))
    // multi-mark canonical decompositions strip fully
    assert(claims(Cql.parseJson(
      """{"=":[{"accenti":{"property":"name"}},"aaL"]}""")) == Set("ấǡḸ"))
    // the null row never matches anything (3VL: strip(NULL) is NULL)

    // kernel directly: ASCII fast path is the identity, and the codegen
    // and interpreted paths agree on every row of the frame
    val k = df.select(col("name"),
      graft.functions.StripAccents(col("name")).as("st"))
    val got = k.as[(String, String)].collect().toMap
    assert(got("cafe") == "cafe" && got("café") == "cafe" &&
      got("CAFÉ") == "CAFE" && got("ß") == "ß" && got("Łódź") == "Łodz" &&
      got("ấǡḸ") == "aaL")
    assert(k.where(col("name").isNull && col("st").isNotNull).count() == 0)
  }

  test("bbox spatial literal: json ≡ text AST, antimeridian split, " +
      "z-interval dropped, bad arity is a typed error") {
    import graft.cql.Cql2Text
    val s = TestSpark.spark
    import s.implicits._
    val json = Cql.parseJson(
      """{"s_intersects":[{"property":"geometry"},{"bbox":[150,-40,-150,40]}]}""")
    val text = Cql2Text.parse("S_INTERSECTS(geometry, BBOX(150, -40, -150, 40))")
    // Shape carries Arrays (reference equality) — identical rendered SQL
    // is the established same-AST proof for geometry forms
    assert(json.toSql == text.toSql, "bbox: json and text must build the same AST")
    // W > E folds to TWO rectangles (union across the antimeridian)
    json match {
      case Cql.SIntersects(graft.spatial.Shape.PolyS(polys), _) =>
        assert(polys.length == 2)
      case other => fail(s"expected a two-polygon fold, got $other")
    }
    val df = Seq((0.0, 0.0), (179.0, 0.0), (-179.0, 0.0), (150.0, -40.0),
      (100.0, 0.0)).toDF("lon", "lat")
    def claims(ast: Cql): Set[(Double, Double)] =
      df.where(ast.toColumn).as[(Double, Double)].collect().toSet
    // the split box claims both sides of the antimeridian, its own
    // boundary corner (closed semantics), and nothing in the gap
    assert(claims(json) ==
      Set((179.0, 0.0), (-179.0, 0.0), (150.0, -40.0)))
    // plain box, and its 6-number form with a z-interval: same claims
    val flat = Cql.parseJson(
      """{"s_intersects":[{"property":"geometry"},{"bbox":[-30,-20,40,35]}]}""")
    val withZ = Cql.parseJson(
      """{"s_intersects":[{"property":"geometry"},{"bbox":[-30,-20,-5.5,40,35,5.5]}]}""")
    assert(flat.toSql == withZ.toSql, "z-interval must be dropped in the fold")
    assert(claims(flat) == Set((0.0, 0.0)))
    // identical SQL rendering from both grammars
    assert(text.toSql == json.toSql)
    // arity: 4 or 6 numbers only — typed errors in BOTH grammars
    intercept[IllegalArgumentException] {
      Cql.parseJson("""{"s_intersects":[{"property":"geometry"},{"bbox":[1,2,3]}]}""")
    }
    intercept[IllegalArgumentException] {
      Cql2Text.parse("S_INTERSECTS(geometry, BBOX(1, 2, 3, 4, 5))")
    }
  }

  test("cql2-text malformed input gets a clear error, not a crash") {
    import graft.cql.Cql2Text
    val cases = Seq(
      "id = 'unterminated",
      "value >",
      "value ** 2 = 4",
      "value = 1 extra_token",
      "S_INTERSECTS(geometry, TRIANGLE((0 0, 1 1, 2 2)))",
      "value BETWEEN 1 OR 2")
    cases.foreach { c =>
      val e = intercept[IllegalArgumentException](Cql2Text.parse(c))
      assert(e.getMessage.contains("cql2-text"), s"$c → ${e.getMessage}")
    }
  }
}
