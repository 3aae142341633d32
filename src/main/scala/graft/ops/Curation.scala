package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import TextExprs._

/** C16: the capstone composition — a training-corpus curation pipeline
  * chaining the C-series operators end to end:
  *
  *   1. quality gate: ≥ 20 words and ≥ 100 characters;
  *   2. exact dedup: keep the smallest doc_id per content hash;
  *   3. near-dup removal: for every MinHash-LSH candidate pair (same
  *      banding as C2), drop the GREATER doc_id — a deterministic greedy
  *      that keeps one representative per duplicate cluster seed.
  *
  * Output is the surviving corpus (doc_id + stats), verified against a
  * DuckDB oracle that restates the identical chain. At scale each stage is
  * the already-audited shape: ONE corpus scan (stats + content hash +
  * MinHash signature in one projection — text never survives the scan
  * stage), one content-hash shuffle carrying slim rows, one
  * banded-signature shuffle — no O(n²), no join-back, no second scan.
  */
object Curation {

  private val minWords = 20
  private val minChars = 100

  def c16CurationPipeline(s: SparkSession, d: String): DataFrame = {
    // One scan: quality gate + every downstream input (content hash for
    // exact dedup, codegen'd MinHashSig for the near-dup banding — same
    // 'mh:' trigram md5 / 2^59 split / h1 + j·h2 lanes as C2, parity
    // asserted in GraftFunctionsSpec). Computing the signature before
    // exact dedup does spend the kernel on exact-dup rows too, but it
    // lets the shuffle carry ~70-byte rows instead of documents and
    // removes the former survivor join-back (which re-ran the tokenize
    // scan per consumer).
    val scanned = Tables.documentsRebalanced(s, d) // kernels off the 1-partition scan
      .withColumn("w", expr(wordsSpark))
      .withColumn("n_words", expr("size(w)"))
      .where(col("n_words") >= minWords && length(col("text")) >= minChars)
      .select(col("doc_id"), col("lang"), col("n_words"),
        length(col("text")).as("n_chars"),
        graft.functions.MinHashSig(col("text"), 8).as("mh"),
        md5(col("text")).as("h"))

    // exact dedup: smallest doc_id per content hash survives — a single
    // min_by aggregation (no groupBy-then-join-back). The banding and the
    // final anti-join both consume the survivors, and both consumers sit
    // ABOVE the content-hash Exchange with identical subtrees below it, so
    // Spark's exchange reuse runs the scan + kernels + partial aggregate
    // ONCE and reads the shuffle twice — the single-scan guarantee a
    // checkpoint would give, minus the extra materialization job
    // (PlanAuditSpec pins the ReusedExchange).
    val surviving = scanned
      .groupBy(col("h"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_words"),
        col("n_chars"), col("mh")), col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.n_words").as("n_words"), col("r.n_chars").as("n_chars"),
        col("r.mh").as("mh"))

    val bandKeys = (0 until 4).map { b =>
      expr(s"concat(CAST(element_at(mh, ${2 * b + 1}) AS STRING), '_', " +
        s"CAST(element_at(mh, ${2 * b + 2}) AS STRING))")
    }
    val bands = surviving.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    // no .distinct(): anti-join semantics ignore right-side duplicates,
    // and the extra exchange+aggregate pair costs a full stage wave
    val dropNear = bands.groupBy(col("band"), col("bkey"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) >= 2)
      .select(explode(expr("slice(ds, 2, size(ds) - 1)")).as("doc_id"))

    surviving.join(dropNear, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_words"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val c16Sql: String = {
    val lanes = (0 until 8).map(j => s"min(h1 + $j * h2) AS m$j").mkString(", ")
    val bandCase = (0 until 4)
      .map(b => s"WHEN b = $b THEN CAST(m${2 * b} AS VARCHAR)||'_'||CAST(m${2 * b + 1} AS VARCHAR)")
      .mkString(" ")
    s"""WITH docs AS (
       |  SELECT doc_id, lang, text, len($wordsDuck) AS n_words
       |  FROM documents
       |  WHERE len($wordsDuck) >= $minWords AND length(text) >= $minChars),
       |keep_exact AS (
       |  SELECT min(doc_id) AS doc_id FROM docs GROUP BY md5(text)),
       |surviving AS (SELECT docs.* FROM docs JOIN keep_exact USING (doc_id)),
       |g AS (SELECT doc_id, $trigramsDuck AS g
       |      FROM (SELECT doc_id, $wordsDuck AS w FROM surviving)),
       |sh AS (SELECT doc_id, ('0x'||substr(hex,1,15))::BIGINT AS h1,
       |         ('0x'||substr(hex,17,15))::BIGINT % 576460752303423488 AS h2
       |       FROM (SELECT doc_id, md5('mh:'||s) AS hex
       |             FROM (SELECT doc_id, unnest(g) AS s FROM g))),
       |sig AS (SELECT doc_id, $lanes FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, b, CASE $bandCase END AS bkey
       |  FROM sig, range(4) t(b)),
       |buckets AS (
       |  SELECT band, bkey, list_sort(list(doc_id)) AS ds
       |  FROM (SELECT DISTINCT b AS band, bkey, doc_id FROM bands) z
       |  GROUP BY band, bkey HAVING len(ds) >= 2),
       |drop_near AS (
       |  SELECT DISTINCT unnest(ds[2:]) AS doc_id FROM buckets)
       |SELECT doc_id, lang, n_words, length(text) AS n_chars
       |FROM surviving
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)
       |ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------- C45 curation pipeline v2
  /** C45: the MODERN curation chain — C16 rebuilt from this round's
    * richer stages, end to end in one plan:
    *
    *   1. Gopher rule battery (C43's integer-exact verdict);
    *   2. exact dedup (C1: smallest doc_id per content hash);
    *   3. benchmark decontamination (C19's fingerprint anti-join against
    *      the broadcast eval set — eval docs themselves leave the corpus);
    *   4. deterministic stratified sampling (C22's hash-of-id decision
    *      at per-source keep-rates).
    *
    * Each stage keeps its already-audited scale shape (projection /
    * content-hash shuffle / broadcast anti-join / scalar predicate), and
    * the oracle restates the identical chain from the SAME shared CTE
    * bodies the stage oracles use — so the composition can't drift from
    * the pieces.
    *
    * Plan shape: ONE corpus scan — the C43 battery projection also emits
    * the content hash and the C19 fingerprint (pass-through columns into
    * [[TextAnalysis.c43ScoredOn]]'s single select), staged slim (no
    * text) for its two consumers (the eval-fingerprint side and the
    * dedup chain). Exact dedup is a single min_by aggregation — no
    * groupBy-then-join-back, which previously re-ran the battery scan
    * per consumer.
    */
  def c45CurationV2(s: SparkSession, d: String): DataFrame = {
    val scanned = TextAnalysis.c43ScoredOn(
        Tables.documentsRebalanced(s, d),
        Seq(md5(col("text")).as("h"),
          // C19's fingerprint (null below the 3-word trigram floor — the
          // quality gate's n_words ≥ 50 keeps only non-null fps, and the
          // eval side filters explicitly)
          when(expr("size(w) >= 3"), expr(fpSpark)).as("fp")))
      .select(col("doc_id"), col("source"), col("n_words"), col("keep"),
        col("h"), col("fp"))
      .localCheckpoint(true)
    // eval set = doc_id % 97 (C19's definition) over the FULL corpus —
    // eval docs themselves leave the corpus below
    val evalFps = scanned
      .where(col("doc_id") % 97 === 0 && col("fp").isNotNull)
      .select(col("fp"))
    scanned.where(col("keep"))
      // exact dedup BEFORE the eval-id filter: an eval doc can be the
      // min-id survivor of a duplicate group (and then drop), exactly as
      // in the join-back formulation
      .groupBy(col("h"))
      .agg(min_by(struct(col("doc_id"), col("source"), col("n_words"),
        col("fp")), col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.n_words").as("n_words"), col("r.fp").as("fp"))
      .where(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalFps), Seq("fp"), "left_anti")
      .where(expr(s"${h64Spark("concat('samp:', CAST(doc_id AS STRING))")} % 1000")
        < expr(TextAnalysis.rateCaseSpark))
      .select(col("doc_id"), col("source"), col("n_words"))
      .orderBy(col("doc_id"))
  }

  val c45Sql: String = {
    val rateCase = TextAnalysis.sampleRates
      .map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString("CASE ", " ", " ELSE 100 END")
    s"""WITH ${TextAnalysis.c43ScoredSqlCte},
       |base AS (
       |  SELECT d.doc_id, d.source, d.text, s.n_words
       |  FROM documents d JOIN scored s ON d.doc_id = s.doc_id AND s.keep),
       |keep_exact AS (
       |  SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
       |deduped AS (SELECT base.* FROM base JOIN keep_exact USING (doc_id)),
       |fps AS (
       |  SELECT doc_id, list_min(list_transform($trigramsDuck, g -> ${h64Duck("g")})) AS fp
       |  FROM (SELECT doc_id, $wordsDuck AS w FROM documents)
       |  WHERE len(w) >= 3)
       |SELECT doc_id, source, n_words
       |FROM deduped JOIN fps USING (doc_id)
       |WHERE doc_id % 97 <> 0
       |  AND fp NOT IN (SELECT fp FROM fps WHERE doc_id % 97 = 0)
       |  AND ${h64Duck("'samp:'||CAST(doc_id AS VARCHAR)")} % 1000 < ($rateCase)
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------ C106 quality-aware near-dup
  /** C106: QUALITY-AWARE near-dup survivor selection — production dedup
    * keeps the BEST document of a duplicate cluster, not the lowest id
    * (a syndicated article survives as its cleanest copy; Penedo et al.
    * 2023 keep by length/quality heuristics). Same MinHash-LSH banding
    * as C2/C16, but each bucket's survivor is the argmax by
    * (quality score, then smallest doc_id) — the quality is C39's
    * integer-exact hashed classifier score, so the argmax is
    * deterministic and hash-stable in both engines. Every other member
    * of any bucket drops (C16's greedy), and the output is the
    * surviving corpus with its scores.
    *
    * Plan shape: ONE corpus scan computes (score, signature) in one
    * projection; the band shuffle carries slim (doc_id, q, bkey) rows;
    * per-bucket argmax is an in-row fold over the sorted member list
    * (bounded by bucket size); the drop set broadcasts into the final
    * anti-join. No join-back, no second scan — the c16 r12 doctrine.
    */
  def c106QualityDedup(s: SparkSession, d: String): DataFrame = {
    val scanned = Tables.documentsRebalanced(s, d) // kernels off the 1-partition scan
      // C16's quality floor: banding 2-lane buckets over very short docs
      // reads as mass collision, not duplication
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w)") >= minWords && length(col("text")) >= minChars)
      .select(col("doc_id"),
        graft.functions.HashedClassScore(col("text"), "whi:").as("q"),
        graft.functions.MinHashSig(col("text"), 8).as("mh"))
    val bandKeys = (0 until 4).map { b =>
      expr(s"concat(CAST(element_at(mh, ${2 * b + 1}) AS STRING), '_', " +
        s"CAST(element_at(mh, ${2 * b + 2}) AS STRING))")
    }
    val bands = scanned.select(col("doc_id"), col("q"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    // ascending (q, -doc_id): the LAST element is (max q, min doc_id) —
    // the survivor; everything before it drops
    val dropNear = bands.groupBy(col("band"), col("bkey"))
      .agg(array_sort(collect_list(
        struct(col("q"), (-col("doc_id")).as("nid"), col("doc_id")))).as("ms"))
      .where(size(col("ms")) >= 2)
      .select(explode(expr(
        "transform(slice(ms, 1, size(ms) - 1), x -> x.doc_id)")).as("doc_id"))
    scanned.join(dropNear, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("q"))
      .orderBy(col("doc_id"))
  }

  val c106Sql: String = {
    val lanes = (0 until 8).map(j => s"min(h1 + $j * h2) AS m$j").mkString(", ")
    val bandCase = (0 until 4)
      .map(b => s"WHEN b = $b THEN CAST(m${2 * b} AS VARCHAR)||'_'||CAST(m${2 * b + 1} AS VARCHAR)")
      .mkString(" ")
    s"""WITH docs AS (
       |  SELECT doc_id, ${TextAnalysis.c39ScoreDuck("hi")} AS q, w
       |  FROM (SELECT doc_id, text, $wordsDuck AS w FROM documents)
       |  WHERE len(w) >= $minWords AND length(text) >= $minChars),
       |g AS (SELECT doc_id, $trigramsDuck AS g FROM docs),
       |sh AS (SELECT doc_id, ('0x'||substr(hex,1,15))::BIGINT AS h1,
       |         ('0x'||substr(hex,17,15))::BIGINT % 576460752303423488 AS h2
       |       FROM (SELECT doc_id, md5('mh:'||s) AS hex
       |             FROM (SELECT doc_id, unnest(g) AS s FROM g))),
       |sig AS (SELECT doc_id, $lanes FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, b, CASE $bandCase END AS bkey
       |  FROM sig, range(4) t(b)),
       |ranked AS (
       |  SELECT b AS band, bkey, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY b, bkey
       |      ORDER BY d.q DESC, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY b, bkey) AS n
       |  FROM bands JOIN docs d USING (doc_id)),
       |drop_near AS (
       |  SELECT DISTINCT doc_id FROM ranked WHERE n >= 2 AND rk > 1)
       |SELECT doc_id, q FROM docs
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c16_curation_pipeline" -> (c16CurationPipeline _),
    "c45_curation_v2" -> (c45CurationV2 _),
    "c106_quality_dedup" -> (c106QualityDedup _)
  )

  val oracle: Map[String, String] = Map(
    "c16_curation_pipeline" -> c16Sql,
    "c45_curation_v2" -> c45Sql,
    "c106_quality_dedup" -> c106Sql
  )
}
