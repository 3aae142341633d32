package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("dot_product and point_in_polygon usable from SQL after registration") {
    GraftFunctions.register(s)
    val d = s.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
    val inside = s.sql(
      "SELECT point_in_polygon(5.0d, 5.0d, array(0d,0d, 10d,0d, 10d,10d, 0d,10d)) AS p")
      .collect()(0).getBoolean(0)
    val outside = s.sql(
      "SELECT point_in_polygon(15.0d, 5.0d, array(0d,0d, 10d,0d, 10d,10d, 0d,10d)) AS p")
      .collect()(0).getBoolean(0)
    assert(inside && !outside)
  }

  test("point_in_polygon rejects a non-literal ring") {
    GraftFunctions.register(s)
    assertThrows[Exception] {
      s.sql("SELECT point_in_polygon(1.0d, 1.0d, array(rand(), rand())) AS p").collect()
    }
  }

  test("RollingHash kernel ≡ the interpreted HOF fold on real data") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(s, TestSpark.sf).limit(200)
    val both = docs.select(
      graft.functions.RollingHash(col("text")).as("k"),
      expr(graft.ops.TextAnalysis.rollSpark).as("h"))
    assert(both.where(col("k") =!= col("h")).count() == 0)
    assert(both.count() > 0)
  }

  test("HashedClassScore kernel ≡ the interpreted HOF fold on real data") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(s, TestSpark.sf).limit(200)
    val both = docs.select(
      graft.functions.HashedClassScore(col("text"), "wmid:").as("k"),
      expr(graft.ops.TextAnalysis.c39ScoreHof("mid")).as("h"))
    assert(both.where(col("k") =!= col("h")).count() == 0)
    assert(both.count() > 0)
  }

  test("WordShingleHashes kernel ≡ the interpreted HOF form on real data") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextExprs._
    val n = 8
    val gram = (0 until n)
      .map(k => s"element_at(w, i + $k)").mkString("concat_ws(' ', ", ", ", ")")
    val hof = s"transform(sequence(1, size(w) - ${n - 1}), i -> " +
      s"${h64Spark(s"concat('p8:', $gram)")})"
    val docs = graft.core.Tables.documents(s, TestSpark.sf).limit(200)
      .withColumn("w", expr(wordsSpark))
      .where(expr(s"size(w) >= $n"))
    val both = docs.select(
      graft.functions.WordShingleHashes(col("text"), n, "p8:").as("k"),
      expr(hof).as("h"))
    assert(both.where(col("k") =!= col("h")).count() == 0)
    assert(both.count() > 0)
    // under-n-word text → empty array, not a crash or a descending sequence
    val short = s.sql("SELECT 'one two three' AS text")
    assert(short.select(graft.functions.WordShingleHashes(col("text"), n, "p8:"))
      .collect()(0).getSeq[Long](0).isEmpty)
  }

  test("SimHashSig kernel ≡ the explode + 32-column groupBy pipeline") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextExprs._
    val bits = 32
    val docs = graft.core.Tables.documents(s, TestSpark.sf).limit(200)
    val sums = docs
      .select(col("doc_id"), explode(expr(wordsSpark)).as("x"))
      .select(col("doc_id"), expr(h64Spark("concat('sh:', x)")).as("h"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("(shiftright(h, 0) & 1) * 2 - 1")).as("s0"),
        (1 until bits).map(k =>
          sum(expr(s"(shiftright(h, $k) & 1) * 2 - 1")).as(s"s$k")): _*)
    val assemble = (0 until bits)
      .map(k => s"(CASE WHEN s$k > 0 THEN ${1L << k} ELSE 0 END)")
      .mkString("(", " + ", ")")
    val ref = sums.select(col("doc_id"), expr(assemble).as("h"))
    val kern = docs.select(col("doc_id"),
      graft.functions.SimHashSig(col("text"), "sh:", bits).as("k"))
    val joined = kern.join(ref, "doc_id")
    assert(joined.where(col("k") =!= col("h")).count() == 0)
    assert(joined.count() > 0)
  }

  test("MinHashSig kernel ≡ the explode + per-lane-min groupBy pipeline") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextExprs._
    val lanes = 8
    val h2Mod = 576460752303423488L
    val docs = graft.core.Tables.documents(s, TestSpark.sf).limit(200)
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 3"))
    val ref = docs
      .select(col("doc_id"), explode(expr(trigramsSpark)).as("g"))
      .select(col("doc_id"), expr("md5(concat('mh:', g))").as("hex"))
      .select(col("doc_id"),
        expr("CAST(conv(substr(hex, 1, 15), 16, 10) AS BIGINT)").as("h1"),
        (expr("CAST(conv(substr(hex, 17, 15), 16, 10) AS BIGINT)") % h2Mod).as("h2"))
      .groupBy(col("doc_id"))
      .agg(min(col("h1")).as("r0"),
        (1 until lanes).map(j => min(col("h1") + lit(j.toLong) * col("h2")).as(s"r$j")): _*)
    val kern = docs.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), lanes).as("mh"))
    val joined = kern.join(ref, "doc_id")
    val mismatch = (0 until lanes).map(j =>
      joined.where(expr(s"element_at(mh, ${j + 1}) <> r$j")).count()).sum
    assert(mismatch == 0)
    assert(joined.count() > 0)
  }

  test("RepetitionStats kernel ≡ the explode + count + roll-up pipeline") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextExprs._
    val docs = graft.core.Tables.documents(s, TestSpark.sf).limit(200)
    val wordStats = docs
      .select(col("doc_id"), explode(expr(wordsSpark)).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_w"), sum(col("c")).as("n_w"))
    val bigramStats = docs.withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 2"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> " +
          "concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_b"), sum(col("c")).as("n_b"),
        count(lit(1)).as("distinct_b"))
    val ref = wordStats.join(bigramStats, Seq("doc_id"))
    val kern = docs.select(col("doc_id"),
      graft.functions.RepetitionStats(col("text")).as("r"))
    val joined = kern.join(ref, "doc_id")
    val bad = joined.where(
      expr("r[0] <> top_w OR r[1] <> n_w OR r[2] <> top_b OR " +
        "r[3] <> n_b OR r[4] <> distinct_b")).count()
    assert(bad == 0)
    assert(joined.count() > 0)
  }

  test("extensions class wires the same builders") {
    assert(GraftFunctions.builders.map(_._1).toSet ==
      Set("dot_product", "rolling_hash", "point_in_polygon",
        "point_in_geom", "box_intersects_geom",
        "wkb_envelope", "wkb_type", "wkb_num_points", "wkb_geojson", "wkb_point"))
    new GraftExtensions() // constructible for spark.sql.extensions
  }

  test("geometry + hash kernels usable from SQL") {
    GraftFunctions.register(s)
    // square with a hole, as a nested literal geometry
    val geom = "array(array(array(0d,0d, 20d,0d, 20d,20d, 0d,20d), " +
      "array(5d,5d, 15d,5d, 15d,15d, 5d,15d)))"
    val inShell = s.sql(s"SELECT point_in_geom(2.0d, 2.0d, $geom) AS p")
      .collect()(0).getBoolean(0)
    val inHole = s.sql(s"SELECT point_in_geom(10.0d, 10.0d, $geom) AS p")
      .collect()(0).getBoolean(0)
    assert(inShell && !inHole)
    val boxInHole = s.sql(s"SELECT box_intersects_geom(8d, 8d, 12d, 12d, $geom) AS p")
      .collect()(0).getBoolean(0)
    val boxOnEdge = s.sql(s"SELECT box_intersects_geom(-2d, -2d, 1d, 1d, $geom) AS p")
      .collect()(0).getBoolean(0)
    assert(!boxInHole && boxOnEdge)
    val rh = s.sql("SELECT rolling_hash('ab') AS h").collect()(0).getLong(0)
    assert(rh == (97L * 31 + 98) % 1000000007L)
  }

  test("c25 bloom decontamination == c19 exact anti-join, and the bloom actually prunes") {
    val sf = TestSpark.sf
    val exact = graft.ops.TextAnalysis.queries("c19_decontaminate")(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = graft.ops.TextAnalysis.queries("c25_decontaminate_bloom")(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed == exact)
    assert(exact.nonEmpty)
    // the probe itself: members always hit; selectivity on the corpus is
    // near the eval fraction (1/97) plus the 1% fpp, far below 1.0
    import org.apache.spark.sql.functions._
    val fps = graft.core.Tables.documents(s, sf)
      .withColumn("w", expr(graft.ops.TextExprs.wordsSpark))
      .where(expr("size(w) >= 3"))
      .select(col("doc_id"),
        expr(s"array_min(transform(${graft.ops.TextExprs.trigramsSpark}, g -> ${graft.ops.TextExprs.h64Spark("g")}))").as("fp"))
    val evalFps = fps.where(col("doc_id") % 97 === 0).select(col("fp"))
    val bf = evalFps.stat.bloomFilter("fp", 4096L, 0.01)
    val corpus = fps.where(col("doc_id") % 97 =!= 0)
    val hits = corpus.where(graft.functions.BloomMightContainLong(col("fp"), bf)).count()
    val total = corpus.count()
    assert(hits.toDouble / total < 0.2, s"bloom pruned nothing: $hits/$total")
    val evalHits = evalFps.where(graft.functions.BloomMightContainLong(col("fp"), bf)).count()
    assert(evalHits == evalFps.count(), "bloom must never false-negative")
  }

  test("CosinePairs kernel: emits exactly the i<j pairs clearing the " +
      "threshold, dot values bit-identical to DotProduct") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    // four unit-ish vectors with known pairwise cosines
    val vs = Seq(
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.0, 0.0)),   // cos(1,2)=1.0
      (3L, Array(0.0, 1.0, 0.0)),   // cos(1,3)=cos(2,3)=0.0
      (4L, Array(0.8, 0.6, 0.0)))   // cos(1,4)=cos(2,4)=0.8, cos(3,4)=0.6
    val df = vs.toDF("vec_id", "nv")
      .agg(array_sort(collect_list(struct(col("vec_id"), col("nv")))).as("vs"))
      .select(explode(graft.functions.CosinePairs(col("vs"), 0.5)).as("p"))
      .select(col("p.v1"), col("p.v2"), col("p.cos_sim"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq((1L, 2L, 1.0), (1L, 4L, 0.8), (2L, 4L, 0.8), (3L, 4L, 0.6)))
    // v1 < v2 structurally (bucket array_sorted by vec_id)
    assert(got.forall { case (a, b, _) => a < b })
    // empty / singleton buckets emit nothing
    val one = Seq((9L, Array(1.0, 0.0, 0.0))).toDF("vec_id", "nv")
      .agg(collect_list(struct(col("vec_id"), col("nv"))).as("vs"))
      .select(explode(graft.functions.CosinePairs(col("vs"), 0.0)).as("p"))
    assert(one.count() == 0)
  }

  test("wkb_* SQL functions round-trip through the SQL surface") {
    val gj = s.sql("SELECT wkb_geojson(wkb_point(1.5d, -2.5d)) AS g").collect()(0).getString(0)
    assert(gj == """{"type":"Point","coordinates":[1.5,-2.5]}""")
    val env = s.sql("SELECT wkb_envelope(wkb_point(3d, 4d)) AS e").collect()(0).getSeq[Double](0)
    assert(env == Seq(3.0, 4.0, 3.0, 4.0))
    val t = s.sql("SELECT wkb_type(wkb_point(0d, 0d)) AS t, wkb_num_points(wkb_point(0d, 0d)) AS n").collect()(0)
    assert(t.getString(0) == "Point" && t.getInt(1) == 1)
  }
}
