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
  * the already-audited shape: projections, one content-hash shuffle, one
  * banded-signature shuffle — no O(n²) anywhere.
  */
object Curation {

  private val minWords = 20
  private val minChars = 100

  def c16CurationPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documentsRebalanced(s, d) // tokenize off the 1-partition scan
      .withColumn("w", expr(wordsSpark))
      .withColumn("n_words", expr("size(w)"))
      .where(col("n_words") >= minWords && length(col("text")) >= minChars)

    // exact dedup: smallest doc_id per content hash survives. Staged once
    // (slim doc_id frame): both the survivor join and the final anti-join
    // re-derive `surviving`, and without the checkpoint the content-hash
    // shuffle would run per consumer.
    val keepExact = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
      .localCheckpoint(true)

    val surviving = docs.join(keepExact, "doc_id")

    // near-dup candidates over the survivors — C2's banding via the
    // codegen'd MinHashSig kernel (one md5 per shingle inside a
    // projection; shingle rows never exist), replacing the former
    // explode → per-lane-min groupBy and its shuffle. Value-identical:
    // the kernel computes the same 'mh:'-prefixed trigram md5, the same
    // 15-hex-digit h1/h2 split mod 2^59, the same h1 + j·h2 lane mins
    // (parity asserted in GraftFunctionsSpec).
    val sig = surviving.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 8).as("mh"))
    val bandKeys = (0 until 4).map { b =>
      expr(s"concat(CAST(element_at(mh, ${2 * b + 1}) AS STRING), '_', " +
        s"CAST(element_at(mh, ${2 * b + 2}) AS STRING))")
    }
    val bands = sig.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    val dropNear = bands.groupBy(col("band"), col("bkey"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) >= 2)
      .select(explode(expr("slice(ds, 2, size(ds) - 1)")).as("doc_id"))
      .distinct()

    surviving.join(dropNear, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_words"),
        length(col("text")).as("n_chars"))
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
    */
  def c45CurationV2(s: SparkSession, d: String): DataFrame = {
    val quality = TextAnalysis.c43Scored(s, d)
      .where(col("keep")).select(col("doc_id"), col("n_words"))
    val base = Tables.documents(s, d).join(quality, "doc_id")
    val keepExact = base
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = base.join(keepExact, "doc_id")
    // full-corpus fingerprints (C19's definition: eval set = doc_id % 97),
    // staged once — the eval side and the corpus join both consume them
    val fps = Tables.documentsRebalanced(s, d) // fpSpark off the 1-partition scan
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 3"))
      .select(col("doc_id"), expr(fpSpark).as("fp"))
      .localCheckpoint(true)
    val evalFps = fps.where(col("doc_id") % 97 === 0).select(col("fp"))
    deduped
      .where(col("doc_id") % 97 =!= 0)
      .join(fps, "doc_id")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c16_curation_pipeline" -> (c16CurationPipeline _),
    "c45_curation_v2" -> (c45CurationV2 _)
  )

  val oracle: Map[String, String] = Map(
    "c16_curation_pipeline" -> c16Sql,
    "c45_curation_v2" -> c45Sql
  )
}
