package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import TextExprs._

/** C8-C11: text analysis operators for an LLM training-data pipeline,
  * run over the `documents` fixture table (SURVEY.md §2.C).
  *
  * All operators are single-pass projections — no shuffle except the final
  * deterministic ORDER BY (which at scale would be a write partitioning, not
  * a sort). Expressions stay inside whole-stage codegen: no UDFs, only
  * `functions._` and higher-order array functions.
  */
object TextAnalysis {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // ----------------------------------------------------------- C8 lang id
  /** Stopword-profile language ID. Scores text against per-language marker
    * sets; argmax with fixed priority tiebreak (en>de>es>fr>zh). The
    * fixture text is synthetic so predictions are mostly 'en' — the gate
    * verifies the operator (scores + argmax), not corpus realism.
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "es" -> Seq("el", "la", "que", "y", "los", "se", "por"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une", "dans"),
    "zh" -> Seq("de", "shi", "bu", "wo", "zai", "you", "ta"))

  private def inList(vs: Seq[String]): String =
    vs.map(v => s"'$v'").mkString("(", ", ", ")")

  private def scoreSpark(vs: Seq[String]): String =
    s"size(filter(w, x -> x IN ${inList(vs)}))"

  private def scoreDuck(vs: Seq[String]): String =
    s"len(list_filter(w, x -> x IN ${inList(vs)}))"

  /** argmax CASE with fixed priority order — identical text both engines. */
  private def argmaxCase: String = {
    val langs = markers.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${langs.last}' END"
  }

  def c8LangId(s: SparkSession, d: String): DataFrame = {
    val scored = docs(s, d)
      .withColumn("w", expr(wordsSpark))
      .select(Seq(col("doc_id"), col("lang")) ++
        markers.map { case (l, vs) => expr(scoreSpark(vs)).as(s"s_$l") }: _*)
    scored.withColumn("pred_lang", expr(argmaxCase))
      .orderBy(col("doc_id"))
  }

  val c8Sql: String = {
    val scores = markers.map { case (l, vs) => s"${scoreDuck(vs)} AS s_$l" }.mkString(", ")
    s"""SELECT doc_id, lang, ${markers.map(m => "s_" + m._1).mkString(", ")},
       |  $argmaxCase AS pred_lang
       |FROM (SELECT doc_id, lang, $scores
       |      FROM (SELECT doc_id, lang, $wordsDuck AS w FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------- C9 quality score
  /** Quality scoring: length, punctuation ratio, stopword ratio, composite
    * score. Pure double arithmetic in a fixed op order (bit-identical to
    * the oracle).
    */
  private val stopEn = inList(Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"))
  private val punctPat = "[.,!?;:]"

  def c9TextQuality(s: SparkSession, d: String): DataFrame =
    // rebalanced: the tokenize+regex kernel is row-wise and otherwise
    // runs at the 1-partition scan width — both here and inside the
    // c36/c61/c85 consumers that broadcast this frame
    graft.core.Tables.documentsRebalanced(s, d)
      .withColumn("w", expr(wordsSpark))
      .select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        expr("size(w)").as("n_words"),
        expr(s"size(filter(w, x -> x IN $stopEn))").as("n_stop"),
        expr(s"CAST(size(regexp_extract_all(text, '$punctPat', 0)) AS BIGINT)").as("n_punct"))
      .withColumn("stop_ratio", expr("CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE)"))
      .withColumn("punct_ratio", expr("CAST(n_punct AS DOUBLE) / CAST(len_chars AS DOUBLE)"))
      .withColumn("quality",
        expr("stop_ratio * 0.4 + least(CAST(1.0 AS DOUBLE), CAST(n_words AS DOUBLE) / 100.0) * 0.4 + " +
          "(1.0 - least(CAST(1.0 AS DOUBLE), punct_ratio * 10.0)) * 0.2"))
      .orderBy(col("doc_id"))

  val c9Sql: String =
    s"""SELECT doc_id, len_chars, n_words, n_stop, n_punct,
       |  stop_ratio, punct_ratio,
       |  stop_ratio * 0.4 + least(CAST(1.0 AS DOUBLE), CAST(n_words AS DOUBLE) / 100.0) * 0.4 +
       |    (1.0 - least(CAST(1.0 AS DOUBLE), punct_ratio * 10.0)) * 0.2 AS quality
       |FROM (
       |  SELECT doc_id, len_chars, n_words, n_stop, n_punct,
       |    CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
       |    CAST(n_punct AS DOUBLE) / CAST(len_chars AS DOUBLE) AS punct_ratio
       |  FROM (
       |    SELECT doc_id, length(text) AS len_chars, len(w) AS n_words,
       |      len(list_filter(w, x -> x IN $stopEn)) AS n_stop,
       |      len(regexp_extract_all(text, '$punctPat')) AS n_punct
       |    FROM (SELECT doc_id, text, $wordsDuck AS w FROM documents)))
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- C10 token count
  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs | digit runs | single non-alnum). The pattern avoids
    * `\s`-class dialect differences by using a literal space.
    */
  private val bpePat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def c10TokenCount(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(
        col("doc_id"),
        expr(s"size($wordsSpark)").as("ws_tokens"),
        expr(s"CAST(size(regexp_extract_all(text, '$bpePat', 0)) AS BIGINT)").as("bpe_tokens"),
        (length(col("text")).cast("double") / 4.0).as("est_tokens"))
      .orderBy(col("doc_id"))

  val c10Sql: String =
    s"""SELECT doc_id, len($wordsDuck) AS ws_tokens,
       |  len(regexp_extract_all(text, '$bpePat')) AS bpe_tokens,
       |  CAST(length(text) AS DOUBLE) / 4.0 AS est_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- C11 fingerprint
  /** Document fingerprinting: (a) polynomial rolling hash over characters
    * (base 31 mod 1e9+7, explicit sequential fold), (b) min word-trigram
    * md5 lane — a 1-lane minhash usable as a cheap near-dup prefilter.
    */
  /** HOF form of the rolling hash — kept as the parity reference for
    * [[graft.functions.RollingHash]] (asserted equal in
    * GraftFunctionsSpec); the operator itself uses the codegen'd kernel.
    */
  private[graft] val rollSpark =
    "aggregate(filter(split(text, ''), c -> c <> ''), CAST(0 AS BIGINT), " +
      "(a, c) -> (a * 31 + ascii(c)) % 1000000007)"

  private val rollDuck =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(list_filter(string_split(text, ''), c -> c <> ''), " +
      "c -> CAST(ascii(c) AS BIGINT))), (a, c) -> (a * 31 + c) % 1000000007)"

  /** Spark side: the rolling hash is the codegen'd
    * [[graft.functions.RollingHash]] kernel (the `aggregate` HOF runs its
    * lambda interpreted per character — 2M steps at sf0.1), and the
    * min-gram lane uses the inline-explode → codegen'd md5 → partial-agg
    * min shape instead of an interpreted per-gram `transform` lambda.
    * Identical integer math to [[c11Sql]] either way.
    */
  def c11Fingerprint(s: SparkSession, d: String): DataFrame = {
    val rolling = graft.core.Tables.documentsRebalanced(s, d)
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 3"))
      .select(col("doc_id"),
        graft.functions.RollingHash(col("text")).as("rolling_fp"))
    val minGram = graft.core.Tables.documentsRebalanced(s, d)
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 3"))
      .select(col("doc_id"), explode(expr(trigramsSpark)).as("g"))
      .select(col("doc_id"), expr(h64Spark("g")).as("gh"))
      .groupBy(col("doc_id")).agg(min(col("gh")).as("min_gram_fp"))
    rolling.join(minGram, "doc_id").orderBy(col("doc_id"))
  }

  val c11Sql: String =
    s"""SELECT doc_id, $rollDuck AS rolling_fp,
       |  list_min(list_transform($trigramsDuck, g -> ${h64Duck("g")})) AS min_gram_fp
       |FROM (SELECT doc_id, text, $wordsDuck AS w FROM documents)
       |WHERE len(w) >= 3
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- C15 top n-grams
  /** Corpus vocabulary: top-50 word trigrams by document frequency —
    * explode distinct grams → count per gram (partial agg) → global top-k
    * (TakeOrderedAndProject). The vocabulary-building primitive for
    * tokenizer training / contamination checks.
    */
  def c15TopNgrams(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 3"))
      .select(col("doc_id"), explode(expr(s"array_distinct($trigramsSpark)")).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("gram"))
      .limit(50)

  val c15Sql: String =
    s"""SELECT gram, COUNT(*) AS df FROM (
       |  SELECT doc_id, unnest(list_distinct($trigramsDuck)) AS gram
       |  FROM (SELECT doc_id, $wordsDuck AS w FROM documents)
       |  WHERE len(w) >= 3)
       |GROUP BY gram ORDER BY df DESC, gram LIMIT 50""".stripMargin

  // ------------------------------------------- C17 keyword search (TF-IDF)
  /** Relevance-ranked keyword search: score(doc) = Σ_term tf(term, doc) ·
    * (N / df(term)) — tf-idf with a rational idf instead of log so every
    * arithmetic step is a single correctly-rounded double op (libm `log`
    * is allowed 1-ulp error and differs between engines). Terms are scored
    * in fixed order; top-20 by (score, doc_id). The inverted-index shape:
    * one pass for df (broadcastable — it's |terms| rows), one for tf.
    */
  private val searchTerms = Seq("spark", "window", "stream")

  def c17KeywordSearch(s: SparkSession, d: String): DataFrame = {
    val terms = searchTerms.zipWithIndex
    val base = docs(s, d).withColumn("w", expr(wordsSpark))
    // ONE conditional-aggregation pass → a 1-row (N, df_0..df_k) frame,
    // broadcast into the scorer: 2 corpus scans total, ZERO driver-side
    // actions. (The round-1 form ran 1+|terms| eager .count() jobs — at
    // 100 TB that's 4 full-corpus passes to fetch 4 integers.)
    val stats = base.agg(
      count(lit(1)).as("n"),
      terms.map { case (t, i) =>
        sum(when(expr(s"array_contains(w, '$t')"), 1L).otherwise(0L)).as(s"df_$i")
      }: _*)
    val score = terms.map { case (t, i) =>
      s"CAST(size(filter(w, x -> x = '$t')) AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df_$i AS DOUBLE))"
    }.mkString(" + ")
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), expr(s"($score)").as("score"))
      .where(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id")).limit(20)
  }

  val c17Sql: String = {
    // the oracle recomputes N and df in SQL — same integers, same ops
    val dfSub = searchTerms.map(t =>
      s"(SELECT COUNT(*) FROM (SELECT $wordsDuck AS w FROM documents) WHERE list_contains(w, '$t'))")
    val score = searchTerms.zip(dfSub).map { case (t, df) =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) * " +
        s"(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / CAST($df AS DOUBLE))"
    }.mkString(" + ")
    s"""SELECT doc_id, score FROM (
       |  SELECT doc_id, ($score) AS score
       |  FROM (SELECT doc_id, $wordsDuck AS w FROM documents))
       |WHERE score > 0.0
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  // --------------- C78 persisted inverted index (c17's scale path)
  /** C78: keyword search served from a PERSISTED INVERTED INDEX — the
    * state-table form of C17 (which rescans every document text per
    * query; correct, but at 100 TB a search engine pays the text scan
    * ONCE, at index build): three tables written once per corpus
    * snapshot — postings (term, doc_id, tf; repartitioned + sorted by
    * term so a term-list query prunes row groups via the pushed IN
    * filter), per-term document frequencies, and the 1-row corpus meta
    * (N) — and the query touches ONLY them: postings for the query
    * terms → per-doc tf pivoted to per-term columns (conditional
    * aggregation), df/N broadcast as a 1-row frame, and the SAME
    * fixed-term-order score expression as C17, so double summation
    * order is identical and the gate shares C17's oracle verbatim
    * (two physical strategies, one answer — C72's doctrine).
    * Plan-audited: the serving plan reads no `text` column and no
    * documents.parquet — index tables only.
    */
  private[graft] def c78IndexPath(s: SparkSession, d: String): String = {
    val key = graft.core.FixtureGuard.stateKey(d, "documents")
    // v2: postings carry POSITIONS (C79's phrase serving); C78's
    // tf-only query prunes the column away (plan-audited)
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_invindex_v2_$key").getAbsolutePath
    if (!new java.io.File(s"$root/meta", "_SUCCESS").exists()) {
      val postings = docs(s, d)
        .select(col("doc_id"), posexplode(expr(wordsSpark)).as(Seq("p", "w")))
        .where(col("w") =!= "")
        .groupBy(col("w"), col("doc_id"))
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("p"))).as("positions"))
      postings
        .repartition(col("w")).sortWithinPartitions(col("w"), col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/postings")
      postings.groupBy(col("w"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .write.mode("overwrite").parquet(s"$root/terms")
      docs(s, d).agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$root/meta")
    }
    root
  }

  /** The index-serving score plan over a postings frame (w, doc_id, tf)
    * and a 1-row stats frame (n, df_0..df_k): per-doc tf pivoted to
    * fixed term columns, then C17's EXACT score expression in the same
    * term order — shared by the batch-built index (C78) and the
    * stream-maintained one (D33), so every serving path computes
    * bit-identical doubles.
    */
  private[graft] def keywordScore(postings: DataFrame, stats: DataFrame): DataFrame = {
    val terms = searchTerms.zipWithIndex
    val tfCols = terms.map { case (t, i) =>
      sum(when(col("w") === t, col("tf"))).as(s"tf_$i")
    }
    val perDoc = postings.where(col("w").isin(searchTerms: _*))
      .groupBy(col("doc_id"))
      .agg(tfCols.head, tfCols.tail: _*)
    val score = terms.map { case (_, i) =>
      s"CAST(coalesce(tf_$i, 0L) AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df_$i AS DOUBLE))"
    }.mkString(" + ")
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), expr(s"($score)").as("score"))
      .where(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id")).limit(20)
  }

  private[graft] def searchTermList: Seq[String] = searchTerms

  def c78IndexSearch(s: SparkSession, d: String): DataFrame = {
    val root = c78IndexPath(s, d)
    val terms = searchTerms.zipWithIndex
    val dfCols = terms.map { case (t, i) =>
      sum(when(col("w") === t, col("df"))).as(s"df_$i")
    }
    val stats = s.read.parquet(s"$root/meta").crossJoin(
      s.read.parquet(s"$root/terms").where(col("w").isin(searchTerms: _*))
        .agg(dfCols.head, dfCols.tail: _*))
    keywordScore(s.read.parquet(s"$root/postings"), stats)
  }

  // --------------- C79 positional PHRASE search on the index
  /** C79: PHRASE search served from the positional postings — the
    * classic inverted-index extension (bag-of-words C78 can rank
    * "spark … fast" and "fast spark" identically; a phrase query needs
    * POSITIONS): the two terms' posting lists join on doc_id and the
    * occurrence count is |{p ∈ pos(t1) : p+1 ∈ pos(t2)}| — set
    * intersection on shifted positions, no text access (same index
    * tables as C78; the tf-only query prunes the positions column,
    * this one reads it). The oracle is INDEPENDENT semantics — direct
    * token-adjacency counting over the raw documents — so a positions
    * bug in the index build cannot self-confirm.
    */
  private val c79Phrase = ("fast", "spark")

  def c79PhraseSearch(s: SparkSession, d: String): DataFrame = {
    val root = c78IndexPath(s, d)
    val (t1, t2) = c79Phrase
    val post = s.read.parquet(s"$root/postings")
    val p1 = post.where(col("w") === t1)
      .select(col("doc_id"), col("positions").as("pos1"))
    val p2 = post.where(col("w") === t2)
      .select(col("doc_id"), col("positions").as("pos2"))
    p1.join(p2, "doc_id")
      .select(col("doc_id"),
        size(array_intersect(expr("transform(pos1, p -> p + 1)"), col("pos2")))
          .cast("long").as("n_occurrences"))
      .where(col("n_occurrences") > 0)
      .orderBy(col("doc_id"))
  }

  val c79Sql: String = {
    val (t1, t2) = c79Phrase
    s"""SELECT doc_id, n_occurrences FROM (
       |  SELECT doc_id,
       |    CAST(len(list_filter(range(1, len(w)), i -> w[i] = '$t1' AND w[i + 1] = '$t2')) AS BIGINT) AS n_occurrences
       |  FROM (SELECT doc_id, $wordsDuck AS w FROM documents))
       |WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------- C21 repetition stats (Gopher)
  /** Gopher-style repetition filters (Rae et al. 2021, §A1.1): documents
    * dominated by a few tokens or repeated n-grams are low-quality
    * boilerplate. Per document: top-word fraction, top-bigram fraction,
    * duplicate-bigram fraction, and the keep/drop verdict at the standard
    * thresholds. Shape: explode → (doc, token) partial-agg counts →
    * per-doc roll-up — two shuffles on (doc_id, token), both map-side
    * combined; fractions are single exact-int IEEE divisions (bit-identical
    * across engines).
    */
  private val topWordMax = 0.20
  private val topBigramMax = 0.18
  private val dupBigramMax = 0.30

  def c21RepetitionStats(s: SparkSession, d: String): DataFrame =
    // the full repetition profile is ONE codegen'd projection
    // ([[graft.functions.RepetitionStats]]) — token rows never exist;
    // the former two explode → count → roll-up rounds (and their
    // shuffles) are gone, value-identical because max/sum/distinct are
    // order-insensitive (asserted in GraftFunctionsSpec). Single-word
    // docs have no bigrams → null fractions, matching the old left join.
    docs(s, d)
      .select(col("doc_id"), graft.functions.RepetitionStats(col("text")).as("r"))
      .select(col("doc_id"),
        expr("CAST(r[0] AS DOUBLE) / CAST(r[1] AS DOUBLE)").as("top_word_frac"),
        expr("CASE WHEN r[3] = 0 THEN NULL ELSE CAST(r[2] AS DOUBLE) / CAST(r[3] AS DOUBLE) END")
          .as("top_bigram_frac"),
        expr("CASE WHEN r[3] = 0 THEN NULL ELSE CAST(r[3] - r[4] AS DOUBLE) / CAST(r[3] AS DOUBLE) END")
          .as("dup_bigram_frac"))
      .withColumn("keep",
        col("top_word_frac") <= topWordMax &&
          coalesce(col("top_bigram_frac") <= topBigramMax, lit(true)) &&
          coalesce(col("dup_bigram_frac") <= dupBigramMax, lit(true)))
      .orderBy(col("doc_id"))

  val c21Sql: String =
    s"""WITH base AS (SELECT doc_id, $wordsDuck AS w FROM documents),
       |ws AS (
       |  SELECT doc_id, max(c) AS top_w, sum(c) AS n_w FROM (
       |    SELECT doc_id, t, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(w) AS t FROM base) GROUP BY doc_id, t)
       |  GROUP BY doc_id),
       |bs AS (
       |  SELECT doc_id, max(c) AS top_b, sum(c) AS n_b, COUNT(*) AS distinct_b FROM (
       |    SELECT doc_id, t, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i]||' '||w[i+1])) AS t
       |          FROM base WHERE len(w) >= 2)
       |    GROUP BY doc_id, t)
       |  GROUP BY doc_id)
       |SELECT doc_id, top_word_frac, top_bigram_frac, dup_bigram_frac,
       |  (top_word_frac <= $topWordMax
       |   AND coalesce(top_bigram_frac <= $topBigramMax, TRUE)
       |   AND coalesce(dup_bigram_frac <= $dupBigramMax, TRUE)) AS keep
       |FROM (
       |  SELECT ws.doc_id AS doc_id,
       |    CAST(top_w AS DOUBLE) / CAST(n_w AS DOUBLE) AS top_word_frac,
       |    CAST(top_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS top_bigram_frac,
       |    CAST(n_b - distinct_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS dup_bigram_frac
       |  FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- C19 decontamination
  /** Benchmark decontamination: flag training documents whose min-trigram
    * fingerprint collides with an eval-set fingerprint (stand-in eval set:
    * docs with doc_id % 97 = 0). The eval fingerprint list is tiny →
    * broadcast semi/anti-join; corpus-side cost is one fingerprint
    * projection. Output: the CLEAN corpus (benchmark docs and collisions
    * removed).
    */
  def c19Decontaminate(s: SparkSession, d: String): DataFrame = {
    // stage the fingerprint projection ONCE (c47/c66 doctrine): both the
    // eval side and the corpus side of the anti-join consume it, and the
    // trigram minhash is the dominant cost — without the checkpoint the
    // projection runs twice (at scale: the staged fingerprint table)
    // rebalanced: the checkpoint otherwise pins the trigram-minhash
    // kernel to the 1-partition scan width (measured: a single-task
    // 0.7-1.0 s job)
    val fps = graft.core.Tables.documentsRebalanced(s, d)
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 3"))
      .select(col("doc_id"),
        expr(fpSpark).as("fp"))
      .localCheckpoint(true)
    val evalFps = fps.where(col("doc_id") % 97 === 0).select(col("fp"))
    fps.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalFps), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  val c19Sql: String =
    s"""WITH fps AS (
       |  SELECT doc_id, list_min(list_transform($trigramsDuck, g -> ${h64Duck("g")})) AS fp
       |  FROM (SELECT doc_id, $wordsDuck AS w FROM documents)
       |  WHERE len(w) >= 3)
       |SELECT doc_id, fp FROM fps
       |WHERE doc_id % 97 <> 0
       |  AND fp NOT IN (SELECT fp FROM fps WHERE doc_id % 97 = 0)
       |ORDER BY doc_id""".stripMargin

  // -------------------------------- C25 Bloom-filter decontamination
  /** The 100 TB decontamination shape: a Bloom filter over the eval-set
    * fingerprints (built once, a few MB, broadcast as a codegen reference
    * object) pre-filters the corpus — rows failing the probe are
    * DEFINITIVELY clean and never touch a join; only probable hits
    * (|eval| + fpp·|corpus|) pay the exact broadcast anti-join, so false
    * positives cannot leak into the output. Same result set as C19's
    * plain anti-join by construction; same oracle proves it.
    */
  def c25DecontaminateBloom(s: SparkSession, d: String): DataFrame = {
    // materialize the fingerprints ONCE (2 longs/doc): four consumers
    // (bloom build, eval side, clean branch, verify branch) read the
    // staged result instead of re-deriving trigram minhashes per branch —
    // at scale this is the staged fingerprint table
    // rebalanced: the checkpoint otherwise pins the trigram-minhash
    // kernel to the 1-partition scan width (measured: a single-task
    // 0.7-1.0 s job)
    val fps = graft.core.Tables.documentsRebalanced(s, d)
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 3"))
      .select(col("doc_id"),
        expr(fpSpark).as("fp"))
      .localCheckpoint(true)
    val evalFps = fps.where(col("doc_id") % 97 === 0).select(col("fp"))
    val bf = evalFps.stat.bloomFilter("fp", 4096L, 0.01)
    val corpus = fps.where(col("doc_id") % 97 =!= 0)
    val might = graft.functions.BloomMightContainLong(col("fp"), bf)
    val clean = corpus.where(!might)
    val verified = corpus.where(might)
      .join(broadcast(evalFps), Seq("fp"), "left_anti")
    clean.unionByName(verified)
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------- C22 deterministic stratified sample
  /** Per-source deterministic sampling — the domain-mixing primitive of a
    * training-data pipeline (e.g. downweight a crawl source, keep all of a
    * curated one). The keep decision is a pure function of doc_id
    * (md5-derived hash mod 1000 < per-source rate), so the sample is
    * REPRODUCIBLE across runs, engines, and cluster sizes — no RNG state,
    * no seed-ordering dependence — and the filter pushes into the scan
    * projection like any scalar predicate. Output: per-source kept/total
    * counts plus the exact kept ids (oracle-checked).
    */
  private[ops] val sampleRates: Seq[(String, Int)] = // ‰ keep-rates per source
    Seq("src0" -> 1000, "src1" -> 500, "src2" -> 250, "src3" -> 125, "src4" -> 50)

  private[ops] def rateCaseSpark: String =
    sampleRates.map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString("CASE ", " ", " ELSE 100 END")

  def c22StratifiedSample(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("keep",
        expr(s"${h64Spark("concat('samp:', CAST(doc_id AS STRING))")} % 1000") < expr(rateCaseSpark))
      .where(col("keep"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  val c22Sql: String = {
    val rateCase = sampleRates.map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString("CASE ", " ", " ELSE 100 END")
    s"""SELECT doc_id, source FROM documents
       |WHERE ${h64Duck("'samp:'||CAST(doc_id AS VARCHAR)")} % 1000 < ($rateCase)
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- C23 sequence packing (bins)
  /** Greedy sequence packing: assign documents (in deterministic doc_id
    * order, per source) to fixed token-budget bins — the "pack short docs
    * into one context window" step before tokenization. Bin id =
    * floor(cumulative_tokens_before_doc / budget): a running-sum window
    * per source, ONE shuffle+sort, no driver loop. (This is budget-packing
    * — a doc may straddle two bins in exact greedy packing; the
    * floor-of-prefix-sum form is the standard relational approximation
    * and is what both engines compute here, identically.)
    */
  private val packBudget = 512

  def c23SequencePacking(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, d)
      .select(col("doc_id"), col("source"), expr(s"size($wordsSpark)").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        ((col("cum") - col("n_tokens")) / packBudget).cast("bigint").as("bin"))
      .orderBy(col("source"), col("doc_id"))
  }

  val c23Sql: String =
    s"""SELECT doc_id, source, n_tokens,
       |  CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / $packBudget) AS BIGINT) AS bin
       |FROM (
       |  SELECT doc_id, source, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM (SELECT doc_id, source, len($wordsDuck) AS n_tokens FROM documents))
       |ORDER BY source, doc_id""".stripMargin

  // ------------------------------------------------------------ registry
  // ------------------------------------------------------------ C26 PII
  /** C26: PII detection + redaction. The fixture corpus is synthetic and
    * PII-free, so the gate INJECTS deterministic PII — emails, phone
    * numbers, IPv4 hosts derived from doc_id, via the SAME SQL expression
    * evaluated in both engines — then the operator redacts and counts.
    * Patterns live in the RE2 ∩ java.util.regex common subset (character
    * classes, bounded repetition, \b, non-capturing groups; no
    * lookaround) so both engines implement identical match semantics.
    * The Spark side applies them through the DataFrame API — NOT SQL
    * string literals, whose backslash escaping differs between engines —
    * and DuckDB replaces with the 'g' flag to match Spark's replace-all.
    * One projection pass, fully codegen'd, no shuffle except the gate's
    * ORDER BY; the md5 of the redacted text makes the gate sensitive to
    * every byte of the replacement output.
    */
  private val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val piiPhoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  private val piiIpRe    = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Deterministic PII injection — identical text in both engines. */
  private val piiInjectSql: String =
    "text || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' Contact user' || CAST(doc_id AS STRING) || '@example.com now.' ELSE '' END || " +
      "CASE WHEN doc_id % 5 = 0 THEN ' Call +1-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' today.' ELSE '' END || " +
      "CASE WHEN doc_id % 7 = 0 THEN ' Host 10.' || CAST(doc_id % 256 AS STRING) || '.0.' || CAST(doc_id % 100 AS STRING) || ' up.' ELSE '' END"

  def c26PiiRedact(s: SparkSession, d: String): DataFrame = {
    // Occurrences of a literal token: character-length diff after a plain
    // (non-regex, codegen'd) string replace, divided by the token length.
    def occ(c: Column, tok: String): Column =
      (length(c) - length(replace(c, lit(tok), lit("")))) / lit(tok.length)
    val red1 = regexp_replace(col("pt"), piiEmailRe, "<EMAIL>")
    val red2 = regexp_replace(red1, piiPhoneRe, "<PHONE>")
    val red  = regexp_replace(red2, piiIpRe, "<IP>")
    docs(s, d)
      // The corpus parquet is bytes-tiny relative to the regex work, so
      // the scan arrives in far fewer partitions than cores
      // (maxPartitionBytes sizes partitions for byte-proportional cost);
      // rebalance the CHEAP rows before the expensive projection — the
      // same shape as the multimodal decode gates. Range-partition +
      // sort BELOW the projection (a43Source doctrine): a global sort
      // ABOVE it would execute the regex chain twice (the range
      // exchange's bounds-sampling pass runs its child in full), while
      // here the sampling pass touches only narrow source rows and
      // projections preserve the established global order. At 100 TB
      // the scan already has more partitions than cores and the
      // exchange moves source rows, never the redacted text.
      .repartitionByRange(s.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pt", expr(piiInjectSql))
      // n_* are REDACTION counts — replacements actually made per stage,
      // derived from each stage's output as (token occurrences after −
      // token occurrences before) with zero extra regex passes (r10: the
      // previous raw-match regexp_count battery doubled the regex scans
      // to 6/row; counting from the replace outputs halves them — the
      // chained red1/red2 stage references dedupe under whole-stage
      // codegen subexpression elimination, so each regex still runs
      // once). Redaction runs sequentially (email→phone→IP), so a match
      // created or destroyed by an earlier replacement is counted as
      // what the redactor actually did, not what a raw scan of `pt`
      // would see. Both engines compute the identical diff.
      .select(col("doc_id"),
        (occ(red1, "<EMAIL>") - occ(col("pt"), "<EMAIL>")).cast("int").as("n_emails"),
        (occ(red2, "<PHONE>") - occ(red1, "<PHONE>")).cast("int").as("n_phones"),
        (occ(red, "<IP>") - occ(red2, "<IP>")).cast("int").as("n_ips"),
        length(red).cast("bigint").as("red_len"),
        md5(red).as("red_md5"))
  }

  val c26Sql: String =
    s"""WITH p AS (SELECT doc_id, $piiInjectSql AS pt FROM documents),
       |r1 AS (SELECT doc_id, pt,
       |  regexp_replace(pt, '$piiEmailRe', '<EMAIL>', 'g') AS red1 FROM p),
       |r2 AS (SELECT doc_id, pt, red1,
       |  regexp_replace(red1, '$piiPhoneRe', '<PHONE>', 'g') AS red2 FROM r1),
       |r3 AS (SELECT doc_id, pt, red1, red2,
       |  regexp_replace(red2, '$piiIpRe', '<IP>', 'g') AS red FROM r2)
       |SELECT doc_id,
       |  CAST((length(red1) - length(replace(red1, '<EMAIL>', ''))) // 7
       |     - (length(pt) - length(replace(pt, '<EMAIL>', ''))) // 7 AS INTEGER) AS n_emails,
       |  CAST((length(red2) - length(replace(red2, '<PHONE>', ''))) // 7
       |     - (length(red1) - length(replace(red1, '<PHONE>', ''))) // 7 AS INTEGER) AS n_phones,
       |  CAST((length(red) - length(replace(red, '<IP>', ''))) // 4
       |     - (length(red2) - length(replace(red2, '<IP>', ''))) // 4 AS INTEGER) AS n_ips,
       |  CAST(length(red) AS BIGINT) AS red_len,
       |  md5(red) AS red_md5
       |FROM r3 ORDER BY doc_id""".stripMargin

  // ---------------------------------------- C27 corpus-frequency score
  /** C27: corpus-typicality scoring, the integer-exact cousin of a
    * unigram-LM perplexity filter (rare/garbled text scores low). Two
    * passes: (1) global token occurrence counts via a map-side-combined
    * groupBy, thresholded into a vocabulary (at 100 TB the vocab
    * aggregate is tiny next to the corpus and broadcastable — the same
    * "aggregate, then broadcast back" shape as C17's tf-idf); (2) each
    * token occurrence left-joins the broadcast vocab and docs aggregate
    * the EXACT INTEGER sum of their tokens' corpus frequencies plus the
    * out-of-vocabulary count. No floats anywhere, so the gate is
    * hash-exact (the b11 lesson: a log-prob double sum would be
    * partition-order-dependent).
    */
  private val c27MinCount = 50L

  /** Broadcast the vocab only while it fits an executor comfortably.
    * ~10⁷ entries ≈ a few hundred MB of broadcast hash map; above that a
    * driver OOM or per-executor memory blowout is the failure mode, so
    * the join falls back to a shuffle on `w`.
    */
  private[graft] val c27BroadcastMaxVocab = 10_000_000L

  def c27RareTokenScore(s: SparkSession, d: String): DataFrame =
    c27ScoreWith(s, d, c27BroadcastMaxVocab)

  /** C27 with an explicit vocab-size ceiling for the broadcast path. The
    * vocabulary is tiny relative to the corpus but UNBOUNDED (it grows
    * with corpus diversity), so the join side is picked from the
    * MEASURED vocab size, not hoped: `limit(max+1).count()` touches at
    * most max+1 aggregated rows to decide. That decision is one extra
    * aggregate pass here; at 100 TB the vocab would be persisted before
    * reuse and the count comes free from that materialization. Above the
    * ceiling the vocab is pinned to a shuffle join (`hint("merge")`) so
    * the planner's size guess for the aggregate can't sneak the
    * broadcast back in. `max == Long.MaxValue` / `max == 0` short-circuit
    * the measurement (always / never broadcast).
    */
  private[graft] def c27ScoreWith(s: SparkSession, d: String, maxVocab: Long): DataFrame = {
    val words = docs(s, d).select(col("doc_id"), explode(expr(wordsSpark)).as("w"))
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= c27MinCount)
    val fits = maxVocab == Long.MaxValue ||
      (maxVocab > 0 &&
        vocab.limit(math.min(maxVocab + 1, Int.MaxValue.toLong).toInt).count() <= maxVocab)
    val v = if (fits) broadcast(vocab) else vocab.hint("merge")
    words.join(v, Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("cnt"), lit(0L))).as("freq_sum"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("n_oov"))
      .orderBy(col("doc_id"))
  }

  val c27Sql: String =
    s"""WITH w AS (SELECT doc_id, unnest($wordsDuck) AS w FROM documents),
       |v AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w HAVING COUNT(*) >= $c27MinCount)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(COALESCE(cnt, 0)) AS BIGINT) AS freq_sum,
       |  CAST(SUM(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
       |FROM w LEFT JOIN v USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------- C28 domain mixture planning
  /** C28: training-mix planning — given target mixture weights over
    * domains (web 50%, code 20%, books 20%, wiki 10%), compute each
    * domain's available tokens, the largest total token budget whose
    * per-domain demand fits what's available (the binding domain caps the
    * mix), and per-domain take counts + keep rates. The corpus pass is
    * one map-side-combined aggregation; the plan math runs on the tiny
    * per-domain aggregate (a window over a handful of rows — at 100 TB
    * domains number dozens, not millions). ALL-INTEGER arithmetic
    * (weights as tenths, rates as basis points, floor division) so both
    * engines produce bit-identical plans — no float shares.
    */
  private val c28Weights = Seq("web" -> 5L, "code" -> 2L, "books" -> 2L, "wiki" -> 1L)

  private val c28DomainSql: String =
    "CASE WHEN CAST(substr(source, 4) AS INT) % 4 = 0 THEN 'web' " +
      "WHEN CAST(substr(source, 4) AS INT) % 4 = 1 THEN 'code' " +
      "WHEN CAST(substr(source, 4) AS INT) % 4 = 2 THEN 'books' ELSE 'wiki' END"

  private val c28WtSql: String =
    "CASE " + c28Weights.init.map { case (d, w) => s"WHEN domain = '$d' THEN ${w}" }
      .mkString(" ") + s" ELSE ${c28Weights.last._2} END"

  def c28MixturePlan(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs(s, d)
      .select(expr(c28DomainSql).as("domain"), expr(s"size($wordsSpark)").as("nt"))
      .groupBy(col("domain")).agg(sum(col("nt")).as("avail_tokens"))
      .withColumn("wt", expr(c28WtSql).cast("bigint"))
      // the binding constraint: total budget T satisfies T*wt/10 <= avail
      .withColumn("t_total", min(expr("avail_tokens * 10 DIV wt"))
        .over(Window.partitionBy()))
      .select(col("domain"), col("wt"), col("avail_tokens"),
        expr("t_total * wt DIV 10").as("take_tokens"),
        expr("(t_total * wt DIV 10) * 10000 DIV avail_tokens").as("rate_bp"))
      .orderBy(col("domain"))
  }

  val c28Sql: String =
    s"""WITH t AS (SELECT $c28DomainSql AS domain, len($wordsDuck) AS nt FROM documents),
       |a AS (SELECT domain, CAST(SUM(nt) AS BIGINT) AS avail_tokens FROM t GROUP BY domain),
       |w AS (SELECT domain, avail_tokens, CAST($c28WtSql AS BIGINT) AS wt FROM a),
       |m AS (SELECT *, MIN(avail_tokens * 10 // wt) OVER () AS t_total FROM w)
       |SELECT domain, wt, avail_tokens,
       |  CAST(t_total * wt // 10 AS BIGINT) AS take_tokens,
       |  CAST((t_total * wt // 10) * 10000 // avail_tokens AS BIGINT) AS rate_bp
       |FROM m ORDER BY domain""".stripMargin

  // ------------------------------- C59 mixture plan EXECUTION
  /** C59: mixture MATERIALIZATION — C28 plans ("take this many tokens
    * per domain"), C59 executes: each document survives iff its
    * md5-lane hash lands under its domain's planned sampling rate
    * (C22's engine-reproducible hash-of-id decision, with the rate per
    * domain coming from the C28 plan instead of a constant). The plan
    * frame (4 rows) broadcasts into a single corpus scan; output is the
    * per-domain realized sample (docs kept, tokens realized) — the
    * "assemble the training mix" step between planning and writing.
    * The oracle restates the plan chain from C28's own CTEs and applies
    * the identical hash decision — plan and execution can't drift from
    * the gated plan. Deterministic and restart-stable: re-running
    * selects the exact same documents (the resampling contract C22
    * established).
    */
  def c59MixtureMaterialize(s: SparkSession, d: String): DataFrame = {
    val plan = c28MixturePlan(s, d).select(col("domain"), col("rate_bp"))
    docs(s, d)
      .select(col("doc_id"), expr(c28DomainSql).as("domain"),
        expr(s"size($wordsSpark)").cast("bigint").as("nt"))
      .join(broadcast(plan), "domain")
      .where(expr(s"${h64Spark("concat('mix:', CAST(doc_id AS STRING))")} % 10000")
        < col("rate_bp"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("nt")).as("realized_tokens"))
      .orderBy(col("domain"))
  }

  val c59Sql: String =
    s"""WITH t AS (SELECT doc_id, $c28DomainSql AS domain,
       |             CAST(len($wordsDuck) AS BIGINT) AS nt FROM documents),
       |a AS (SELECT domain, CAST(SUM(nt) AS BIGINT) AS avail_tokens FROM t GROUP BY domain),
       |w AS (SELECT domain, avail_tokens, CAST($c28WtSql AS BIGINT) AS wt FROM a),
       |m AS (SELECT *, MIN(avail_tokens * 10 // wt) OVER () AS t_total FROM w),
       |plan AS (
       |  SELECT domain,
       |    CAST((t_total * wt // 10) * 10000 // avail_tokens AS BIGINT) AS rate_bp
       |  FROM m)
       |SELECT domain, COUNT(*) AS n_docs_kept,
       |  CAST(SUM(nt) AS BIGINT) AS realized_tokens
       |FROM t JOIN plan USING (domain)
       |WHERE ${h64Duck("'mix:'||CAST(doc_id AS VARCHAR)")} % 10000 < rate_bp
       |GROUP BY domain ORDER BY domain""".stripMargin

  // ------------------------------- C80 word-blocklist filtering
  /** C80: WORD-BLOCKLIST document filtering — the C4 "bad words" filter
    * (Raffel et al. 2020 §2.2: drop any page containing a word on the
    * blocklist; the first gate of most web-corpus pipelines, ahead of
    * every quality model): a document survives iff NONE of its
    * whitespace tokens is blocklisted. The stand-in list carries one
    * word present in the fixture vocabulary ('dup') and two absent
    * ('leak', 'spam') — zero hits on absent entries proves membership is
    * exact token equality, not substring fuzz. The list compiles into
    * the codegen'd projection as a literal IN (a production list of a
    * few thousand words rides a broadcast hashed set exactly like C27's
    * under-threshold vocabulary — per-row cost stays O(tokens) either
    * way). Report per source: docs scanned, docs dropped, blocklisted
    * occurrences, and surviving tokens — ONE map-side-combined scan,
    * shuffle carries |sources| rows, all-integer so the gate is
    * hash-exact.
    */
  private val c80Blocklist = Seq("dup", "leak", "spam")
  private val c80InList = c80Blocklist.map(w => s"'$w'").mkString("(", ", ", ")")

  def c80BlocklistFilter(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("source"),
        expr(s"size($wordsSpark)").cast("bigint").as("nt"),
        expr(s"size(filter($wordsSpark, x -> x IN $c80InList))")
          .cast("bigint").as("hits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_dropped"),
        sum(col("hits")).as("banned_hits"),
        sum(when(col("hits") === 0L, col("nt")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))

  val c80Sql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(SUM(hits) AS BIGINT) AS banned_hits,
       |  CAST(SUM(CASE WHEN hits = 0 THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM (SELECT source, CAST(len($wordsDuck) AS BIGINT) AS nt,
       |        CAST(len(list_filter($wordsDuck, x -> x IN $c80InList)) AS BIGINT) AS hits
       |      FROM documents)
       |GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------- C81 temperature-scaled mixture
  /** C81: TEMPERATURE-scaled language sampling weights — the
    * multilingual rebalancing rule (Conneau & Lample 2019 §3.1; mT5's
    * α-sampling): sample language l with probability ∝ n_l^α (α = 1/2
    * here), boosting low-resource languages relative to proportional
    * sampling so they aren't drowned by the head language. The α-power
    * runs in EXACT integer arithmetic: ⌊√n⌋ via floor(sqrt(double))
    * corrected ±1 — sqrt is correctly rounded in IEEE 754, so after
    * floor the candidate is off by at most one, and the two CASE
    * corrections pin the exact integer square root in BOTH engines
    * regardless of libm; everything downstream is BIGINT floor division
    * (hash-exact, no float shares). Output per lang: tokens,
    * proportional share (bp), α-share (bp), and the boost factor
    * α-share/share (bp) — the low-resource multiplier the mixture
    * review reads. One corpus scan to |langs| rows; the corpus totals
    * come from a 1-row scalar aggregate CROSS-JOINED back (c66's
    * doctrine — never an unpartitioned window, even on a tiny frame).
    */
  def c81TemperatureMix(s: SparkSession, d: String): DataFrame = {
    // |langs| rows with TWO consumers (the totals aggregate, the join
    // side) — checkpointed once so the corpus scan behind it runs once
    val perLang = docs(s, d)
      .select(col("lang"), expr(s"size($wordsSpark)").cast("bigint").as("nt"))
      .groupBy(col("lang")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("r0", expr("CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)"))
      .withColumn("isq", expr(
        "r0 + (CASE WHEN (r0+1)*(r0+1) <= n_tokens THEN 1 ELSE 0 END)" +
          " - (CASE WHEN r0*r0 > n_tokens THEN 1 ELSE 0 END)"))
      .localCheckpoint(true)
    val totals = perLang.agg(sum(col("n_tokens")).as("tot"), sum(col("isq")).as("itot"))
    perLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_tokens"),
        expr("n_tokens * 10000 DIV tot").as("share_bp"),
        expr("isq * 10000 DIV itot").as("alpha_share_bp"),
        expr("(isq * 10000 DIV itot) * 10000 DIV (n_tokens * 10000 DIV tot)")
          .as("boost_bp"))
      .orderBy(col("lang"))
  }

  val c81Sql: String =
    s"""WITH a AS (
       |  SELECT lang, CAST(SUM(len($wordsDuck)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY lang),
       |r AS (SELECT *, CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS r0 FROM a),
       |i AS (SELECT lang, n_tokens,
       |        r0 + (CASE WHEN (r0+1)*(r0+1) <= n_tokens THEN 1 ELSE 0 END)
       |           - (CASE WHEN r0*r0 > n_tokens THEN 1 ELSE 0 END) AS isq FROM r),
       |t AS (SELECT *, SUM(n_tokens) OVER () AS tot, SUM(isq) OVER () AS itot FROM i)
       |SELECT lang, n_tokens,
       |  CAST(n_tokens * 10000 // tot AS BIGINT) AS share_bp,
       |  CAST(isq * 10000 // itot AS BIGINT) AS alpha_share_bp,
       |  CAST((isq * 10000 // itot) * 10000 // (n_tokens * 10000 // tot) AS BIGINT) AS boost_bp
       |FROM t ORDER BY lang""".stripMargin

  // ------------------------------- C87 compression-ratio quality proxy
  /** C87: COMPRESSION-RATIO quality scoring — zlib's ratio as the
    * information-density proxy quality pipelines use alongside the rule
    * batteries (templated/repetitive text compresses far below prose,
    * random garble barely compresses; BOTH tails get reviewed — the
    * signal behind "drop documents with extreme compression ratio" in
    * web-corpus curation): per document, DEFLATE (fixed level 6) the
    * UTF-8 text in a batched mapPartitions pass — the Deflater is JVM
    * machinery a Catalyst expression can't host, the same justification
    * as C12's ImageIO; ONE Deflater per partition, reset per document,
    * fixed scratch buffers. Report per source: docs, raw/compressed
    * byte totals, the corpus ratio (bp, integer), and the extreme-tail
    * counts under/over fixed ratio bounds. DEFLATE is deterministic for
    * a fixed level + input; no SQL engine speaks zlib, so the gate is
    * no SQL engine speaks zlib — so the gate splits the work at the
    * kernel boundary: the Spark pass materializes the per-doc
    * `(doc_id, comp_bytes)` frame to a parquet sidecar, and the oracle
    * reads that sidecar back while INDEPENDENTLY recomputing everything
    * SQL can express — n_docs, raw UTF-8 byte totals
    * (`octet_length(encode(text))`), the ratio thresholds, and the
    * per-source rollup — inner-joined on doc_id so a missing, extra, or
    * duplicated sidecar row breaks the count/hash. The deflate kernel
    * itself stays spec-verified (kernel contrast on constructed inputs:
    * repetition ≪ prose ≪ hex noise; pipeline ≡ standalone kernel).
    */
  private[graft] def deflatedSize(text: String): Long = {
    val defl = new java.util.zip.Deflater(6)
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    defl.setInput(bytes); defl.finish()
    val out = new Array[Byte](4096)
    var total = 0L
    while (!defl.finished()) total += defl.deflate(out)
    defl.end()
    total
  }

  // Last sidecar written by c87CompressionRatio; read lazily by c87Sql so
  // the oracle dumped AFTER the Verify query loop points at this run's
  // per-doc deflate frame (Verify.scala evaluates oracleSql post-loop).
  @volatile private[graft] var c87SidecarPath: String = "/tmp/graft_c87_bytes_unset"

  def c87CompressionRatio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // keyed on a CONTENT fingerprint of the input files (not the dir
    // string): an in-place fixture regeneration or a sanitized-path
    // collision (sf0.1 vs sf0_1) gets a fresh sidecar, never stale bytes
    val path = "/tmp/graft_c87_bytes_" +
      graft.core.FixtureGuard.fingerprint(d, "documents")
    c87SidecarPath = path
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      docs(s, d).select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions { it =>
          val defl = new java.util.zip.Deflater(6)
          val out = new Array[Byte](4096)
          it.map { case (id, src, text) =>
            val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            defl.reset(); defl.setInput(bytes); defl.finish()
            var comp = 0L
            while (!defl.finished()) comp += defl.deflate(out)
            (id, src, bytes.length.toLong, comp)
          }
        }.toDF("doc_id", "source", "raw_bytes", "comp_bytes")
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw_bytes")).as("raw_bytes"),
        sum(col("comp_bytes")).as("comp_bytes"),
        sum(when(expr("comp_bytes * 10000 DIV raw_bytes < 2000"), 1L)
          .otherwise(0L)).as("n_too_compressible"),
        sum(when(expr("comp_bytes * 10000 DIV raw_bytes > 9000"), 1L)
          .otherwise(0L)).as("n_incompressible"))
      .withColumn("ratio_bp", expr("comp_bytes * 10000 DIV raw_bytes"))
      .orderBy(col("source"))
  }

  /** Oracle for C87 (def: embeds the sidecar written by the gate run).
    * DuckDB independently recomputes source, n_docs, raw UTF-8 bytes and
    * every derived threshold from the documents table; only the zlib
    * output sizes come from the Spark-materialized sidecar, inner-joined
    * on doc_id (coverage drift → count/hash mismatch).
    */
  def c87Sql: String =
    s"""WITH comp AS (
       |  SELECT doc_id, comp_bytes
       |  FROM read_parquet('$c87SidecarPath/*.parquet')),
       |per AS (
       |  SELECT d.source,
       |    CAST(octet_length(encode(d.text)) AS BIGINT) AS raw_bytes,
       |    c.comp_bytes
       |  FROM documents d JOIN comp c USING (doc_id))
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(raw_bytes) AS BIGINT) AS raw_bytes,
       |  CAST(SUM(comp_bytes) AS BIGINT) AS comp_bytes,
       |  CAST(SUM(CASE WHEN comp_bytes * 10000 // raw_bytes < 2000
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_too_compressible,
       |  CAST(SUM(CASE WHEN comp_bytes * 10000 // raw_bytes > 9000
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_incompressible,
       |  CAST(SUM(comp_bytes) * 10000 // SUM(raw_bytes) AS BIGINT) AS ratio_bp
       |FROM per GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------- C91 fill-in-middle construction
  /** C91: FIM (fill-in-the-middle) training-example construction
    * (Bavarian et al. 2022 — the infilling transform code models train
    * on): split each selected document's token sequence at two cut
    * points into prefix/middle/suffix and emit the PSM reordering
    * `<PRE> prefix <SUF> suffix <MID> middle`, so the model learns to
    * generate the middle conditioned on both sides. The canonical recipe
    * transforms a RATE of documents (50% here) with uniformly random
    * spans; both decisions here come from md5 lanes of doc_id (C22's
    * reproducibility doctrine: the same doc gets the same transform on
    * every run, engine, and cluster size — a retrain is bit-identical).
    * Cut points: c1 ∈ [1, n−1), c2 ∈ (c1, n) from two independent
    * lanes, so prefix/middle/suffix are all non-empty on transformed
    * docs. One codegen'd projection — split, two slices, three joins —
    * no shuffle but the final ORDER BY; the oracle rebuilds the exact
    * strings from the same lanes and list slices, so an off-by-one in
    * either engine's slicing breaks the hash.
    */
  private val c91RateBp = 5000L
  private val c91Pre = "<PRE> "
  private val c91Suf = " <SUF> "
  private val c91Mid = " <MID> "

  def c91FimConstruct(s: SparkSession, d: String): DataFrame = {
    val h1 = h64Spark("concat('fim1:', CAST(doc_id AS STRING))")
    val h2 = h64Spark("concat('fim2:', CAST(doc_id AS STRING))")
    val hk = h64Spark("concat('fimk:', CAST(doc_id AS STRING))")
    docs(s, d)
      .withColumn("w", expr(wordsSpark))
      .withColumn("n", expr("size(w)").cast("bigint"))
      .where(col("n") >= 3 && expr(s"$hk % 10000") < c91RateBp)
      .withColumn("c1", expr(s"1 + $h1 % (n - 2)")) // 1 .. n-2
      .withColumn("c2", expr(s"c1 + 1 + $h2 % (n - c1 - 1)")) // c1+1 .. n-1
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("c1").as("prefix_len"),
        (col("c2") - col("c1")).as("middle_len"),
        (col("n") - col("c2")).as("suffix_len"),
        concat(lit(c91Pre),
          expr("array_join(slice(w, 1, CAST(c1 AS INT)), ' ')"),
          lit(c91Suf),
          expr("array_join(slice(w, CAST(c2 AS INT) + 1, CAST(n - c2 AS INT)), ' ')"),
          lit(c91Mid),
          expr("array_join(slice(w, CAST(c1 AS INT) + 1, CAST(c2 - c1 AS INT)), ' ')"))
          .as("fim_text"))
      .orderBy(col("doc_id"))
  }

  val c91Sql: String = {
    val h1 = h64Duck("'fim1:'||CAST(doc_id AS VARCHAR)")
    val h2 = h64Duck("'fim2:'||CAST(doc_id AS VARCHAR)")
    val hk = h64Duck("'fimk:'||CAST(doc_id AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT doc_id, $wordsDuck AS w, CAST(len($wordsDuck) AS BIGINT) AS n
       |  FROM documents),
       |sel AS (SELECT * FROM base WHERE n >= 3 AND $hk % 10000 < $c91RateBp),
       |cut AS (SELECT doc_id, w, n, c1, c1 + 1 + $h2 % (n - c1 - 1) AS c2
       |        FROM (SELECT doc_id, w, n, 1 + $h1 % (n - 2) AS c1 FROM sel))
       |SELECT doc_id, n AS n_tokens, c1 AS prefix_len,
       |  c2 - c1 AS middle_len, n - c2 AS suffix_len,
       |  '$c91Pre' || array_to_string(w[1:CAST(c1 AS INTEGER)], ' ')
       |    || '$c91Suf' || array_to_string(w[CAST(c2 AS INTEGER) + 1:CAST(n AS INTEGER)], ' ')
       |    || '$c91Mid' || array_to_string(w[CAST(c1 AS INTEGER) + 1:CAST(c2 AS INTEGER)], ' ')
       |    AS fim_text
       |FROM cut ORDER BY doc_id""".stripMargin
  }

  // ------------------------------- C83 robust length-outlier filter
  /** C83: ROBUST length-outlier filtering — the median/MAD screen (Leys
    * et al. 2013; the mean/stddev form breaks on exactly the corpora
    * that need filtering, because the outliers poison the moments):
    * per source, flag documents whose |len − median| exceeds 3×MAD
    * (median absolute deviation). All-INTEGER: the median is the lower
    * median (rank (n+1) DIV 2 under (len, doc_id) — deterministic under
    * ties), MAD the same rank over deviations, so both engines agree
    * bit-for-bit with no interpolation convention to reconcile. Shape:
    * two shuffle+sort windows per source with the \|sources\|-row
    * median/MAD frames broadcast back between them; at 100 TB the rank
    * selection reads off B16's two-level histogram instead of a full
    * sort — the rank form here is the shared semantics contract, same
    * doctrine as C63.
    */
  private val c83MadMult = 3L

  def c83LengthOutliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs(s, d).select(col("doc_id"), col("source"),
      length(col("text")).cast("bigint").as("len"))
    val wCnt = Window.partitionBy(col("source"))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame =
      df.withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(col(v), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(wCnt))
        .where(col("rk") === expr("(n + 1) DIV 2"))
        .select(col("source"), col(v).as(out))
    val med = lowerMedian(base, "len", "med")
    val dev = base.join(broadcast(med), "source")
      .withColumn("dev", abs(col("len") - col("med")))
    val mad = lowerMedian(dev, "dev", "mad")
    dev.join(broadcast(mad), "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("med")).as("med_chars"),
        max(col("mad")).as("mad_chars"),
        sum(when(col("dev") > col("mad") * c83MadMult, 1L).otherwise(0L))
          .as("n_flagged"))
      .orderBy(col("source"))
  }

  val c83Sql: String =
    s"""WITH base AS (SELECT doc_id, source, CAST(len(text) AS BIGINT) AS len FROM documents),
       |medr AS (SELECT source, len AS med FROM (
       |  SELECT source, doc_id, len,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS n FROM base) WHERE rk = (n + 1) // 2),
       |dev AS (SELECT b.doc_id, b.source, abs(b.len - m.med) AS dev, m.med
       |        FROM base b JOIN medr m USING (source)),
       |madr AS (SELECT source, dev AS mad FROM (
       |  SELECT source, doc_id, dev,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS n FROM dev) WHERE rk = (n + 1) // 2)
       |SELECT source, COUNT(*) AS n_docs, MAX(d.med) AS med_chars,
       |  MAX(m.mad) AS mad_chars,
       |  CAST(SUM(CASE WHEN d.dev > m.mad * $c83MadMult THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_flagged
       |FROM dev d JOIN madr m USING (source)
       |GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------- C84 templated-prefix detection
  /** C84: BOILERPLATE-TEMPLATE detection — documents opening with an
    * identical token prefix are template families (the "mirrored site /
    * generated page" signal a crawl review reads before dedup thresholds
    * are tuned; C1 catches whole-document copies, this catches shared
    * SCAFFOLDING with divergent bodies): group by the exact first-8-word
    * prefix, keep families with ≥ 2 members, report family size and the
    * id span. ONE map-side-combined aggregate — the shuffle carries
    * \|distinct prefixes\| partials (at 100 TB the group key is the
    * prefix's 64-bit hash and the family list feeds C2's verifier, same
    * candidate-then-verify doctrine as every near-dup path).
    */
  private val c84PrefixWords = 8

  def c84TemplatePrefixes(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"),
        expr(s"array_join(slice($wordsSpark, 1, $c84PrefixWords), ' ')").as("prefix"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .where(col("n_docs") >= 2)
      .orderBy(col("prefix"))

  val c84Sql: String =
    s"""SELECT prefix, COUNT(*) AS n_docs,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM (SELECT doc_id,
       |        array_to_string(string_split(text, ' ')[1:$c84PrefixWords], ' ') AS prefix
       |      FROM documents)
       |GROUP BY prefix HAVING COUNT(*) >= 2 ORDER BY prefix""".stripMargin

  // ------------------------- C60 per-source score calibration cut
  /** C60: PER-SOURCE quality-threshold calibration — a single global
    * classifier cutoff over heterogeneous sources keeps whatever the
    * score distributions happen to be (a clean source's median can sit
    * below a noisy source's p90), so production filters calibrate the
    * cut per source: keep each source's top 90% by C39 classifier
    * score. Rank-based and all-integer (`rk·100 ≤ n·90` over
    * (score desc, doc_id) — no score-scale assumptions, hash-exact),
    * one shuffle+sort window per source; output = per-source doc count,
    * kept count, and the realized cut score (min kept). The oracle runs
    * the same windows over the same C39 score expressions — the gate
    * pins that per-source calibration reads the identical frame.
    */
  def c60CalibratedCut(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), col("source"),
        graft.functions.HashedClassScore(col("text"), "whi:").as("score"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("keep", col("rk") * 100 <= col("n") * 90)
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        count(when(col("keep"), 1)).as("n_kept"),
        min(when(col("keep"), col("score"))).as("cut_score"))
      .orderBy(col("source"))
  }

  val c60Sql: String = {
    s"""WITH sc AS (
       |  SELECT doc_id, source, ${c60ScoreDuck} AS score
       |  FROM (SELECT doc_id, source, $wordsDuck AS w FROM documents)),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM sc)
       |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rk * 100 <= n * 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(MIN(CASE WHEN rk * 100 <= n * 90 THEN score END) AS BIGINT) AS cut_score
       |FROM r GROUP BY source ORDER BY source""".stripMargin
  }

  /** The DuckDB form of the calibration score — C39's class-score fold
    * under the dedicated `whi:` weight namespace.
    */
  private def c60ScoreDuck: String = {
    val uni = s"(${h64Duck("'whi:' || t")} % 1001) - 500"
    val bi = s"(${h64Duck("'whi:' || w[i] || '_' || w[i+1]")} % 1001) - 500"
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(w, t -> $uni)), (s, x) -> s + x)" +
      s" + (CASE WHEN len(w) >= 2 THEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len(w)), i -> $bi)), (s, x) -> s + x) " +
      s"ELSE CAST(0 AS BIGINT) END)"
  }

  // ------------------------------- C31 n-gram overlap contamination score
  /** C31: GRADED contamination scoring — where C19/C25 REMOVE exact
    * fingerprint collisions, this measures per-document overlap with the
    * eval set as the fraction of its 8-gram shingles that appear anywhere
    * in the eval corpus (the n-gram-overlap contamination metric of the
    * GPT-3/PaLM eval-contamination appendices). Output is integer basis
    * points (n_hits·10⁴ ÷ n_grams, floor) so the gate is hash-exact.
    * Shapes: one shingle explode per side, distinct eval grams broadcast
    * (eval sets are small by definition — above broadcast size the same
    * plan shuffle-joins on the gram, C27's fallback pattern), one
    * map-side-combined per-doc aggregate. No pairwise doc comparisons
    * anywhere.
    */
  private val c31GramLen = 8

  def c31OverlapScore(s: SparkSession, d: String): DataFrame = {
    val gram = (0 until c31GramLen).map(k => s"element_at(w, i + $k)")
      .mkString("concat_ws(' ', ", ", ", ")")
    def grams(src: DataFrame) = src
      .withColumn("w", expr(wordsSpark))
      .where(expr(s"size(w) >= $c31GramLen"))
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(w) - ${c31GramLen - 1}), i -> $gram)")).as("g"))
    // rebalanced: the 8-gram explode otherwise runs at the 1-partition
    // scan width on the corpus side (the eval side's doc_id filter still
    // pushes below the exchange to the scan)
    val all = grams(graft.core.Tables.documentsRebalanced(s, d))
    val evalGrams = all.where(col("doc_id") % 97 === 0)
      .select(col("g")).distinct().withColumn("hit", lit(1))
    all.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_hits"))
      .withColumn("overlap_bp", expr("n_hits * 10000 DIV n_grams"))
      .orderBy(col("doc_id"))
  }

  val c31Sql: String =
    s"""WITH d0 AS (SELECT doc_id, $wordsDuck AS ws FROM documents),
       |g AS (SELECT doc_id, array_to_string(ws[i:i+${c31GramLen - 1}], ' ') AS g
       |      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${c31GramLen - 2})) AS i
       |            FROM d0 WHERE len(ws) >= $c31GramLen)),
       |e AS (SELECT DISTINCT g, 1 AS hit FROM g WHERE doc_id % 97 = 0)
       |SELECT doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_hits,
       |  CAST(SUM(COALESCE(hit, 0)) * 10000 // COUNT(*) AS BIGINT) AS overlap_bp
       |FROM (SELECT g.doc_id, e.hit FROM g LEFT JOIN e ON g.g = e.g
       |      WHERE g.doc_id % 97 <> 0)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------- C30 BPE merge-step counts
  /** C30: BPE merge-step candidate counting — the tokenizer-training
    * primitive (Sennrich et al. 2016, "Neural Machine Translation of Rare
    * Words with Subword Units"): count adjacent character-pair
    * occurrences across the corpus and rank merge candidates. The scale
    * shape is the VOCABULARY TRICK production BPE trainers use: aggregate
    * identical words FIRST (vocab rows ≪ corpus tokens), then explode
    * each DISTINCT word's character pairs weighted by the word's corpus
    * count — pair counting costs O(vocab · word length), not O(corpus
    * tokens), and re-runs per merge iteration touch only the vocab.
    * All-integer counts (hash-exact), top-50 by (count desc, pair asc) —
    * a deterministic total order, planned as TakeOrderedAndProject.
    */
  def c30BpePairs(s: SparkSession, d: String): DataFrame = {
    val vocab = docs(s, d).select(explode(expr(wordsSpark)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    vocab
      .where(length(col("w")) >= 2)
      .select(col("w"), col("wc"),
        explode(expr("sequence(1, length(w) - 1)")).as("i"))
      .select(concat(expr("substr(w, i, 1)"), lit(" "),
        expr("substr(w, i + 1, 1)")).as("pair"), col("wc"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(50)
  }

  val c30Sql: String =
    s"""WITH v AS (
       |  SELECT w, COUNT(*) AS wc
       |  FROM (SELECT unnest($wordsDuck) AS w FROM documents) GROUP BY w),
       |p AS (
       |  SELECT substr(w, i, 1) || ' ' || substr(w, i + 1, 1) AS pair, wc
       |  FROM (SELECT w, wc, unnest(range(1, length(w))) AS i
       |        FROM v WHERE length(w) >= 2))
       |SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
       |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin

  // ---------------------------------------------- C32 BPE merge loop
  /** C32: the full BPE TRAINER (Sennrich et al. 2016) — C30 iterated:
    * apply the top-ranked merge to the vocabulary, recount pairs, repeat.
    * Output = the learned merge table (step, pair, count), the artifact a
    * tokenizer trainer ships.
    *
    * Scale shape (the vocabulary trick, as C30): every iteration touches
    * only the DISTINCT-word vocabulary (rows ≪ corpus tokens), cut from
    * the corpus-scan lineage by one eager localCheckpoint; per iteration
    * the driver collects exactly ONE row (the argmax pair — the same
    * O(iterations) driver-action pattern as C18's pointer doubling; BPE
    * training is inherently sequential in the merge order).
    *
    * Merge mechanics: words are held as marker-wrapped symbol strings,
    * `hello` → `(h)(e)(l)(l)(o)`; merging pair (a, b) is the literal
    * string replace `(a)(b)` → `(ab)`. Because each occurrence consumes
    * exactly its own two symbols (no shared separator), left-to-right
    * non-overlapping `replace` — identical semantics in both engines — IS
    * canonical greedy BPE application: `(a)(a)(a)` merges once, and a
    * symbol that PREFIXES another (`(a)(b)` vs `(a)(bc)`) can't false-
    * match, since the closing marker pins the symbol end. Markers are
    * safe: the fixture alphabet is lowercase a–y (asserted cheaply by the
    * oracle agreeing on every merged pair).
    *
    * Oracle: DuckDB re-trains the same merges in unrolled CTEs (C14's
    * re-train-in-SQL pattern) — bit-identical merge table.
    */
  val c32Merges = 8

  private def c32Wrapped(w: String) = s"'(' || array_join(split($w, ''), ')(') || ')'"

  /** The marker-delimited symbols of a merged vocabulary string. */
  private val c32Symbols = "regexp_extract_all(ws, '\\\\(([^)]*)\\\\)', 1)"

  /** Shared C32/C37 training loop: learns the merge table AND returns the
    * post-merge vocabulary `(w, ws, wc)` — which is exactly the encode
    * dictionary a tokenizer ships (original word → its merged symbol
    * string). Carrying `w` through the loop costs nothing: the pair
    * counts group by `pair`, never by the carry columns.
    */
  private def c32Train(
      s: SparkSession, d: String): (Seq[(Int, String, Long)], DataFrame) =
    c32TrainOn(docs(s, d))

  /** Training entry over an arbitrary document frame (needs a `text`
    * column) — the corpus-as-of-a-version input for C50's retrains.
    */
  private[graft] def c32TrainOn(corpus: DataFrame): (Seq[(Int, String, Long)], DataFrame) = {
    val vocab = corpus
      .select(explode(expr(wordsSpark)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("w"), expr(c32Wrapped("w")).as("ws"), col("wc"))
      .localCheckpoint(true) // cut the corpus scan out of the loop lineage
    var v = vocab
    val merges = Seq.newBuilder[(Int, String, Long)]
    for (step <- 1 to c32Merges) {
      val top = v
        .select(col("wc"), expr(c32Symbols).as("sy"))
        .where(expr("size(sy) >= 2"))
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(sy) - 1), i -> " +
            "concat(element_at(sy, i), ' ', element_at(sy, i + 1)))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1).collect()(0)
      val Array(a, b) = top.getString(0).split(' ')
      merges += ((step, top.getString(0), top.getLong(1)))
      v = v.withColumn("ws", expr(s"replace(ws, '($a)($b)', '($a$b)')"))
    }
    (merges.result(), v)
  }

  def c32BpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (merges, _) = c32Train(s, d)
    merges.toDF("step", "pair", "n").orderBy(col("step"))
  }

  /** The tokenizer ARTIFACT store: C32's post-merge vocabulary (the
    * encode dictionary) materialized ONCE per corpus as a parquet
    * artifact — what a production pipeline ships to every downstream
    * job. C37/C41/C42 read it instead of re-running the merge loop per
    * query: train once, tokenize forever (the oracle still RE-TRAINS
    * from scratch in SQL each time — the independent check is
    * unchanged). Idempotent per dir (B24's materialize pattern); the
    * fixture dirs are immutable so the artifact can't go stale.
    */
  private def c32Dictionary(s: SparkSession, d: String): DataFrame = {
    val key = graft.core.FixtureGuard.stateKey(d, "documents")
    val p = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_tokenizer_$key").getAbsolutePath
    if (!new java.io.File(p, "_SUCCESS").exists()) {
      val (_, vocab) = c32Train(s, d)
      vocab.select(col("w"), expr(s"size($c32Symbols)").cast("long").as("n_tok"))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(p)
  }

  // ------------------- C50 versioned tokenizer artifact state table
  /** C50: the tokenizer artifact as a VERSIONED state table — the
    * pipeline contract for "retrain the tokenizer without breaking
    * yesterday's runs". Each retrain appends the full encode dictionary
    * (w → merged-token count) under a new `version` PARTITION: a
    * directory add, old versions immutable (any past run stays exactly
    * reproducible — the provenance requirement a training pipeline has
    * that a mutable artifact can't meet). Serving reads ONLY the latest
    * version — partition-pruned, so read cost is one dictionary
    * regardless of retrain history (B25's latest-wins applied at
    * partition granularity; the max-version probe touches the partition
    * listing, not data). The gate materializes v1 (trained on the
    * even-doc half corpus) then v2 (full corpus) and reads the latest —
    * the oracle re-trains the full corpus from scratch, so equality IS
    * the append-only-retrain maintenance proof (A54's pattern).
    */
  /** The shipped artifact row: word, its TRAINING-corpus frequency (what
    * downstream rarity/sampling jobs read), and its post-merge token
    * count (what the encoder reads).
    */
  private[graft] def c50Dict(vocab: DataFrame): DataFrame =
    vocab.select(col("w"), col("wc"),
      expr(s"size($c32Symbols)").cast("long").as("n_tok"))

  private[graft] def c50Retrain(corpus: DataFrame): DataFrame =
    c50Dict(c32TrainOn(corpus)._2)

  private[graft] def c50Materialize(s: SparkSession, d: String): String = {
    val key = graft.core.FixtureGuard.stateKey(d, "documents")
    val p = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_tokver1_$key").getAbsolutePath
    if (!new java.io.File(p, "_SUCCESS").exists()) {
      // v1: the corpus as of the first build; v2: a later full retrain.
      // Each append is a new partition — nothing existing is rewritten.
      Seq(1 -> docs(s, d).where(col("doc_id") % 2 === 0), 2 -> docs(s, d))
        .foreach { case (v, corpus) =>
          c50Retrain(corpus).withColumn("version", lit(v))
            .write.mode("append").partitionBy("version").parquet(p)
        }
    }
    p
  }

  def c50TokenizerVersions(s: SparkSession, d: String): DataFrame = {
    val st = s.read.parquet(c50Materialize(s, d))
    // scalar probe of the partition column — resolves from the listing
    val latest = st.agg(max(col("version"))).collect()(0).getInt(0)
    st.where(col("version") === latest)
      .select(col("version").cast("int").as("version"), col("w"), col("wc"),
        col("n_tok"))
      .orderBy(col("w"))
  }

  val c50Sql: String =
    s"""WITH ${c32SqlChain(carryW = true)}
       |SELECT 2 AS version, w, CAST(wc AS BIGINT) AS wc,
       |  CAST(len(regexp_extract_all(ws, '\\(([^)]*)\\)', 1)) AS BIGINT) AS n_tok
       |FROM v$c32Merges ORDER BY w""".stripMargin

  /** The v0→v_k merge-chain CTEs, shared by the C32 and C37 oracles.
    * `carryW = true` keeps the original word alongside the evolving
    * symbol string (the C37 encode dictionary needs the word as the
    * join key); the pair counting is identical either way.
    */
  private def c32SqlChain(carryW: Boolean): String = {
    val w = if (carryW) "w, " else ""
    val v0 =
      s"""v0 AS (
         |  SELECT $w'(' || array_to_string(string_split(w, ''), ')(') || ')' AS ws,
         |         COUNT(*) AS wc
         |  FROM (SELECT unnest($wordsDuck) AS w FROM documents)
         |  WHERE w <> '' GROUP BY ${if (carryW) "w" else "1"})""".stripMargin
    val steps = (1 to c32Merges).map { k =>
      s"""p$k AS (
         |  SELECT sy[i] || ' ' || sy[i+1] AS pair, wc
         |  FROM (SELECT sy, wc, unnest(range(1, len(sy))) AS i
         |        FROM (SELECT regexp_extract_all(ws, '\\(([^)]*)\\)', 1) AS sy, wc
         |              FROM v${k - 1})
         |        WHERE len(sy) >= 2)),
         |t$k AS (
         |  SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
         |  FROM p$k GROUP BY pair ORDER BY n DESC, pair LIMIT 1),
         |v$k AS (
         |  SELECT ${w}replace(ws,
         |    '(' || split_part(pair, ' ', 1) || ')(' || split_part(pair, ' ', 2) || ')',
         |    '(' || replace(pair, ' ', '') || ')') AS ws, wc
         |  FROM v${k - 1}, t$k)""".stripMargin
    }
    s"$v0,\n${steps.mkString(",\n")}"
  }

  val c32Sql: String = {
    val out = (1 to c32Merges)
      .map(k => s"SELECT $k AS step, pair, n FROM t$k")
      .mkString("\nUNION ALL\n")
    s"WITH ${c32SqlChain(carryW = false)}\n$out\nORDER BY step"
  }

  // ---------------------------------------------- C37 BPE tokenization
  /** C37: BPE tokenizer APPLICATION — encode the corpus with the merge
    * table C32 just learned (train → SHIP → tokenize, the step a data
    * pipeline actually runs per document). Per doc: whitespace words,
    * base (character) token count, and the post-merge BPE token count +
    * chars-per-token compression, all integers.
    *
    * Scale shape is the vocabulary trick INVERTED: the tokenizer runs
    * once per DISTINCT word (the post-training vocabulary — rows ≪
    * corpus tokens — already holds each word's merged symbol string, so
    * "encoding" is `size(symbols)`), and per-document stats come from a
    * BROADCAST join of the corpus' exploded words against that tiny
    * dictionary + one map-side-combined per-doc aggregate. Documents
    * never re-run the merge loop; at 100 TB the dictionary is a
    * constant-size build side and the corpus is one pass.
    *
    * Oracle: re-trains the same merges (C32's unrolled chain, carrying
    * the word) and re-joins — bit-identical integer stats.
    */
  def c37BpeEncode(s: SparkSession, d: String): DataFrame = {
    val dict = c32Dictionary(s, d)
    docs(s, d)
      .select(col("doc_id"), explode(expr(wordsSpark)).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(dict), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("n_chars"),
        sum(col("n_tok")).as("bpe_tokens"))
      .withColumn("compression_centi", expr("n_chars * 100 DIV bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  val c37Sql: String =
    s"""WITH ${c32SqlChain(carryW = true)},
       |enc AS (
       |  SELECT w, CAST(len(regexp_extract_all(ws, '\\(([^)]*)\\)', 1)) AS BIGINT) AS n_tok
       |  FROM v$c32Merges),
       |dw AS (
       |  SELECT doc_id, w
       |  FROM (SELECT doc_id, unnest($wordsDuck) AS w FROM documents)
       |  WHERE w <> '')
       |SELECT doc_id, COUNT(*) AS n_words,
       |  CAST(SUM(length(w)) AS BIGINT) AS n_chars,
       |  CAST(SUM(n_tok) AS BIGINT) AS bpe_tokens,
       |  CAST(CAST(SUM(length(w)) AS BIGINT) * 100 // CAST(SUM(n_tok) AS BIGINT) AS BIGINT)
       |    AS compression_centi
       |FROM dw JOIN enc USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------ C39 hashed linear classifier
  /** C39: hashed-linear-classifier INFERENCE at scan speed — the
    * fastText-style quality/domain classifier every curation pipeline
    * runs over the whole corpus (CCNet, LLaMA data prep). Features are
    * word unigrams + adjacent bigrams; the weight table is IMPLICIT via
    * the hashing trick (Weinberger et al. 2009): weight(class, feature) =
    * h64("w<class>:" + feature) mapped to [-500, 500] — deterministic
    * integers, so per-class scores are exact BIGINT sums and the argmax
    * is hash-stable. (A TRAINED weight table would broadcast-join like
    * C27's vocabulary; the hash-derived one keeps the gate free of a
    * training loop while exercising the identical scoring plumbing.)
    *
    * Scale shape: ONE projection — no join, no shuffle, no UDF; the md5
    * lanes and the sequential integer folds run inside codegen, and the
    * oracle computes the same folds with DuckDB list primitives.
    */
  private val c39Classes = Seq("lo", "mid", "hi")

  private def c39WUnit(c: String)(tok: String): (String, String) =
    (s"(${h64Spark(s"concat('w$c:', $tok)")} % 1001) - 500",
      s"(${h64Duck(s"'w$c:' || $tok")} % 1001) - 500")

  /** The interpreted HOF form of one class score — kept ONLY as the
    * parity reference for the codegen'd kernel (GraftFunctionsSpec); the
    * per-feature lambda is why it is 7× slower than the kernel.
    */
  private[graft] def c39ScoreHof(c: String): String = {
    val uni = c39WUnit(c)("t")._1
    val bi = c39WUnit(c)(
      s"concat(element_at($wordsSpark, i), '_', element_at($wordsSpark, i + 1))")._1
    s"aggregate(transform($wordsSpark, t -> $uni), CAST(0 AS BIGINT), (s, x) -> s + x)" +
      s" + (CASE WHEN size($wordsSpark) >= 2 THEN aggregate(" +
      s"transform(sequence(1, size($wordsSpark) - 1), i -> $bi), " +
      s"CAST(0 AS BIGINT), (s, x) -> s + x) ELSE CAST(0 AS BIGINT) END)"
  }

  def c39ClassifierScore(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(Seq(col("doc_id"),
        expr(s"size($wordsSpark) + greatest(size($wordsSpark) - 1, 0)")
          .cast("long").as("n_feats")) ++
        c39Classes.map(c =>
          graft.functions.HashedClassScore(col("text"), s"w$c:").as(s"s_$c")): _*)
      .withColumn("pred", expr(c39ArgmaxSql))
      .orderBy(col("doc_id"))

  /** Fixed-priority argmax — identical CASE text in both engines. */
  private val c39ArgmaxSql =
    "CASE WHEN s_lo >= s_mid AND s_lo >= s_hi THEN 'lo' " +
      "WHEN s_mid >= s_hi THEN 'mid' ELSE 'hi' END"

  /** The DuckDB form of one class score (over a word-list column `w`) —
    * shared by the C39 gate and C51's budget selection.
    */
  private[ops] def c39ScoreDuck(c: String): String = {
    val uni = c39WUnit(c)("t")._2
    val bi = c39WUnit(c)("w[i] || '_' || w[i+1]")._2
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(w, t -> $uni)), (s, x) -> s + x)" +
      s" + (CASE WHEN len(w) >= 2 THEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len(w)), i -> $bi)), (s, x) -> s + x) " +
      s"ELSE CAST(0 AS BIGINT) END)"
  }

  val c39Sql: String = {
    val scores = c39Classes.map(c => s"${c39ScoreDuck(c)} AS s_$c").mkString(",\n  ")
    s"""SELECT doc_id, n_feats, s_lo, s_mid, s_hi, $c39ArgmaxSql AS pred
       |FROM (
       |  SELECT doc_id, CAST(len(w) + greatest(len(w) - 1, 0) AS BIGINT) AS n_feats,
       |  $scores
       |  FROM (SELECT doc_id, $wordsDuck AS w FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------- C41 tokenizer-budget packing
  /** C41: sequence packing by TOKENIZER budget — C23's prefix-sum binning
    * where the budget counts the tokens that actually fill a context
    * window: C37's BPE token counts (the trained tokenizer applied via
    * the broadcast encode dictionary), not whitespace words. The plan
    * composes the two proven shapes end to end: one corpus pass + a
    * broadcast dictionary join + one map-side-combined per-doc aggregate
    * (C37), then ONE shuffle+sort prefix-sum window per source (C23) —
    * no driver loop anywhere; the merge training's O(iterations) driver
    * argmaxes are a constant prefix, amortized over any number of
    * downstream packings.
    */
  private val c41Budget = 4096

  def c41BpePacking(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dict = c32Dictionary(s, d)
    val perDoc = docs(s, d)
      .select(col("doc_id"), col("source"), explode(expr(wordsSpark)).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(dict), Seq("w"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("n_tok")).as("bpe_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDoc
      .withColumn("cum", sum(col("bpe_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("bpe_tokens"),
        ((col("cum") - col("bpe_tokens")) / c41Budget).cast("bigint").as("bin"))
      .orderBy(col("source"), col("doc_id"))
  }

  val c41Sql: String =
    s"""WITH ${c32SqlChain(carryW = true)},
       |enc AS (
       |  SELECT w, CAST(len(regexp_extract_all(ws, '\\(([^)]*)\\)', 1)) AS BIGINT) AS n_tok
       |  FROM v$c32Merges),
       |dw AS (
       |  SELECT doc_id, source, w
       |  FROM (SELECT doc_id, source, unnest($wordsDuck) AS w FROM documents)
       |  WHERE w <> ''),
       |pd AS (
       |  SELECT doc_id, source, CAST(SUM(n_tok) AS BIGINT) AS bpe_tokens
       |  FROM dw JOIN enc USING (w) GROUP BY doc_id, source)
       |SELECT doc_id, source, bpe_tokens,
       |  CAST(FLOOR(CAST(cum - bpe_tokens AS DOUBLE) / $c41Budget) AS BIGINT) AS bin
       |FROM (
       |  SELECT doc_id, source, bpe_tokens,
       |    SUM(bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM pd)
       |ORDER BY source, doc_id""".stripMargin

  // ------------------------------- C42 training-sequence assembly
  /** C42: training-SEQUENCE assembly — the step after C41's packing that
    * actually produces model inputs: per (source, bin), concatenate the
    * member documents in doc_id order with an EOS separator, carrying
    * the bin's document count and BPE token total. The pipeline endpoint:
    * C32 trains the tokenizer, C37 encodes, C41 packs, C42 emits the
    * sequences a trainer reads.
    *
    * Scale shape: ONE groupBy over C41's output joined back to the text —
    * the aggregate's group key is (source, bin) so the shuffle carries
    * documents once; in-group order is pinned by sorting the collected
    * (doc_id, text) structs, deterministic in both engines (the oracle
    * uses `string_agg ... ORDER BY doc_id`).
    */
  private val c42Eos = " <eos> "

  def c42SequenceAssemble(s: SparkSession, d: String): DataFrame =
    c41BpePacking(s, d)
      .join(docs(s, d).select(col("doc_id"), col("text")), Seq("doc_id"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe_tokens")).as("seq_tokens"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(doc_id, text))), x -> x.text)"),
          c42Eos).as("seq_text"))
      .orderBy(col("source"), col("bin"))

  val c42Sql: String =
    s"""WITH packed AS (${c41Sql.replace("ORDER BY source, doc_id", "")})
       |SELECT source, bin, COUNT(*) AS n_docs,
       |  CAST(SUM(bpe_tokens) AS BIGINT) AS seq_tokens,
       |  string_agg(text, '$c42Eos' ORDER BY doc_id) AS seq_text
       |FROM packed JOIN (SELECT doc_id, text FROM documents) USING (doc_id)
       |GROUP BY source, bin ORDER BY source, bin""".stripMargin

  // ----------------------------------- C43 Gopher static quality rules
  /** C43: the Gopher STATIC quality battery (Rae et al. 2021 §A1.1 —
    * the rule set C21's repetition filters complement): word-count
    * bounds, mean-word-length bounds, symbol-to-word ratio, alphabetic-
    * word fraction, stopword presence. (The line-shape rules are
    * inapplicable: the fixture corpus is single-line.) Every threshold
    * compares as INTEGER cross-multiplication (3 ≤ chars/words ≤ 10
    * becomes `3·words ≤ chars AND chars ≤ 10·words`), so the verdict is
    * hash-exact with no float anywhere; chars-of-words comes from
    * `length(text) − (words − 1)` — exact for the single-space-joined
    * corpus and computed identically in both engines. One projection, no
    * shuffle, no join.
    */
  private val c43Stop = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-doc stats + verdict projection shared by C43 (the per-doc gate),
    * C44 (the datasheet rollup) and C45 (the curation pipeline). Carries
    * source/lang for grouping.
    */
  private[ops] def c43Scored(s: SparkSession, d: String): DataFrame =
    // batch path rebalances the 1-partition scan under the battery; the
    // streaming twin passes its own micro-batch frame to c43ScoredOn
    c43ScoredOn(graft.core.Tables.documentsRebalanced(s, d))

  /** The rule battery over an arbitrary document frame (doc_id, source,
    * lang, text) — D19's per-micro-batch scoring input. `extra` columns
    * are evaluated in the SAME projection (with the token array `w` in
    * scope), letting composite pipelines (C45) derive content hashes /
    * fingerprints in the battery's single corpus scan instead of
    * re-scanning.
    */
  private[graft] def c43ScoredOn(
      corpus: DataFrame,
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val stopList = c43Stop.map(t => s"'$t'").mkString("(", ", ", ")")
    corpus
      .withColumn("w", expr(wordsSpark))
      .select(Seq(col("doc_id"), col("source"), col("lang"),
        expr("CAST(size(w) AS BIGINT)").as("n_words"),
        expr("CAST(length(text) - (size(w) - 1) AS BIGINT)").as("n_chars"),
        expr("CAST(size(filter(w, t -> t LIKE '%#%' OR t LIKE '%...%')) AS BIGINT)")
          .as("n_syms"),
        expr("CAST(size(filter(w, t -> t RLIKE '[a-z]')) AS BIGINT)").as("n_alpha"),
        expr(s"CAST(size(filter(w, t -> t IN $stopList)) AS BIGINT)").as("n_stop"))
        ++ extra: _*)
      .withColumn("keep",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("n_chars") >= col("n_words") * 3 &&
          col("n_chars") <= col("n_words") * 10 &&
          col("n_syms") * 10 < col("n_words") &&
          col("n_alpha") * 5 >= col("n_words") * 4 &&
          col("n_stop") >= 2)
  }

  def c43GopherRules(s: SparkSession, d: String): DataFrame =
    c43Scored(s, d)
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_syms"),
        col("n_alpha"), col("n_stop"), col("keep"))
      .orderBy(col("doc_id"))

  val c43Sql: String = {
    val stopList = c43Stop.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""SELECT doc_id, n_words, n_chars, n_syms, n_alpha, n_stop,
       |  (n_words >= 50 AND n_words <= 100000
       |   AND n_chars >= n_words * 3 AND n_chars <= n_words * 10
       |   AND n_syms * 10 < n_words AND n_alpha * 5 >= n_words * 4
       |   AND n_stop >= 2) AS keep
       |FROM (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(length(text) - (len(w) - 1) AS BIGINT) AS n_chars,
       |    CAST(len(list_filter(w, t -> t LIKE '%#%' OR t LIKE '%...%')) AS BIGINT) AS n_syms,
       |    CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter(w, t -> t IN $stopList)) AS BIGINT) AS n_stop
       |  FROM (SELECT doc_id, text, $wordsDuck AS w FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ----------------------- C103 Naive-Bayes classifier TRAINING
  /** C103: quality-classifier TRAINING — the step C39 deliberately
    * skipped (its weights are hash-derived; the doc notes "a trained
    * table would broadcast"). This is the CCNet/LLaMA recipe made
    * distributed: label seed data with the C43 Gopher rule battery
    * (keep/reject), featurize as word unigrams + adjacent bigrams
    * hashed into [[c103Buckets]] buckets (the hashing trick —
    * Weinberger et al. 2009), and train multinomial Naive Bayes, whose
    * sufficient statistics are pure COUNTS: per-(label, bucket) feature
    * occurrences and per-label document counts. Counts are exact
    * integers, so the learned table is hash-exact across engines and
    * the oracle re-derives it in SQL end to end (labeling included).
    *
    * Scale shape: ONE corpus pass — label battery and feature explode in
    * the same projection, map-side-combined groupBy on (label, bucket)
    * whose result is ≤ 2·64 rows, plus a 2-row label-count aggregate
    * broadcast back on. No iteration: NB's M-step IS the aggregation
    * (contrast C32's O(iterations) BPE loop). [[c103ScoreDocs]] then
    * broadcasts the learned table into C39's scan-speed scoring shape
    * as per-class log-likelihood array literals (+1 smoothing) — spec
    * pins train → score → select composition.
    */
  private val c103Buckets = 64

  /** Unigrams + adjacent bigrams over a word array column `w` — the
    * CASE guards Spark's descending-sequence footgun on 1-word docs.
    */
  private val c103FeatsSpark: String =
    "concat(w, CASE WHEN size(w) >= 2 THEN " +
      "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), '_', element_at(w, i + 1))) " +
      "ELSE slice(w, 1, 0) END)"

  private val c103FeatsDuck: String =
    "w || (CASE WHEN len(w) >= 2 THEN " +
      "list_transform(range(1, len(w)), i -> w[i] || '_' || w[i+1]) " +
      "ELSE []::VARCHAR[] END)"

  /** C43's keep-verdict over the stat columns (shared text — the one
    * battery definition rendered into both engines).
    */
  private val c103KeepSql =
    "(n_words >= 50 AND n_words <= 100000" +
      " AND n_chars >= n_words * 3 AND n_chars <= n_words * 10" +
      " AND n_syms * 10 < n_words AND n_alpha * 5 >= n_words * 4" +
      " AND n_stop >= 2)"

  /** Labeled corpus with the word array still attached (c43Scored drops
    * it; training needs both the verdict and the features in one pass).
    */
  /** Probe-visible alias of [[c103Labeled]] (ProbeC103 stage timing). */
  def c103LabeledProbe(s: SparkSession, d: String): DataFrame = c103Labeled(s, d)

  private def c103Labeled(s: SparkSession, d: String): DataFrame = {
    val stopList = c43Stop.map(t => s"'$t'").mkString("(", ", ", ")")
    // The corpus parquet is bytes-tiny relative to the tokenize + battery
    // + feature-hash work below, so the scan arrives in fewer partitions
    // than cores (1 at sf0.1 — the whole training pass ran single-
    // threaded); rebalance the CHEAP source rows before the expensive
    // projection (c26 doctrine). Round-robin is enough: everything above
    // is a commutative aggregation, no order to preserve. At 100 TB the
    // scan already has more partitions than cores and the exchange moves
    // source rows, never exploded features.
    docs(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("w", expr(wordsSpark))
      .withColumn("n_words", expr("CAST(size(w) AS BIGINT)"))
      .withColumn("n_chars", expr("CAST(length(text) - (size(w) - 1) AS BIGINT)"))
      .withColumn("n_syms",
        expr("CAST(size(filter(w, t -> t LIKE '%#%' OR t LIKE '%...%')) AS BIGINT)"))
      .withColumn("n_alpha", expr("CAST(size(filter(w, t -> t RLIKE '[a-z]')) AS BIGINT)"))
      .withColumn("n_stop", expr(s"CAST(size(filter(w, t -> t IN $stopList)) AS BIGINT)"))
      .withColumn("label", expr(s"CASE WHEN $c103KeepSql THEN 'keep' ELSE 'reject' END"))
  }

  def c103ClassifierTrain(s: SparkSession, d: String): DataFrame = {
    // LITERALLY one corpus pass: a per-doc MARKER element (NULL — split
    // can't produce one, so no feature can collide with it) rides the
    // feature explode and maps to bucket -1, so the doc priors and the
    // feature counts fall out of the SAME map-side-combined aggregation —
    // no staged corpus frame, no second Gopher-battery scan. The hash
    // stays OUTSIDE the lambda: a codegen'd projection after the explode
    // (inside `transform` it would run interpreted per element).
    val agg = c103Labeled(s, d)
      .select(col("label"), explode(expr(
        s"concat($c103FeatsSpark, array(CAST(NULL AS STRING)))")).as("f"))
      .select(col("label"),
        expr(s"CASE WHEN f IS NULL THEN CAST(-1 AS BIGINT)" +
          s" ELSE ${h64Spark("concat('nb:', f)")} % $c103Buckets END").as("bucket"))
      .groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect() // ≤ 2·(buckets+1) rows — bounded by construction
    // the marker row's count IS the label prior: one corpus pass ended,
    // the ≤130-row monoid result finishes on the driver (no second job,
    // no join, no window)
    val labelDocs = agg.filter(_.getLong(1) == -1L)
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val rows = agg.filter(_.getLong(1) >= 0L)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        labelDocs(r.getString(0))))
      .sortBy(t => (t._1, t._2))
    import s.implicits._
    rows.toSeq.toDF("label", "bucket", "n", "label_docs")
  }

  val c103Sql: String = {
    val stopList = c43Stop.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH lab AS (
       |  SELECT doc_id, w,
       |    CASE WHEN $c103KeepSql THEN 'keep' ELSE 'reject' END AS label
       |  FROM (
       |    SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_words,
       |      CAST(length(text) - (len(w) - 1) AS BIGINT) AS n_chars,
       |      CAST(len(list_filter(w, t -> t LIKE '%#%' OR t LIKE '%...%')) AS BIGINT) AS n_syms,
       |      CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
       |      CAST(len(list_filter(w, t -> t IN $stopList)) AS BIGINT) AS n_stop
       |    FROM (SELECT doc_id, text, $wordsDuck AS w FROM documents))),
       |feats AS (
       |  SELECT label, unnest(list_append($c103FeatsDuck, NULL)) AS f FROM lab),
       |agg AS (
       |  SELECT label,
       |    CASE WHEN f IS NULL THEN -1
       |         ELSE ${h64Duck("'nb:' || f")} % $c103Buckets END AS bucket,
       |    COUNT(*) AS n
       |  FROM feats GROUP BY 1, 2),
       |ld AS (SELECT label, n AS label_docs FROM agg WHERE bucket = -1)
       |SELECT label, bucket, CAST(n AS BIGINT) AS n,
       |  CAST(label_docs AS BIGINT) AS label_docs
       |FROM agg JOIN ld USING (label)
       |WHERE bucket >= 0
       |ORDER BY label, bucket""".stripMargin
  }

  /** Score documents with the TRAINED table — C39's scan-speed shape
    * with learned weights: the ≤ 2·[[c103Buckets]] count table collects
    * driver-side (bounded by construction), folds into per-class
    * log-likelihood ARRAY LITERALS w[b] = ln((n_b + 1) / (total + B))
    * (+1 smoothing), and scoring is one codegen'd projection —
    * `aggregate` over the hashed features indexing the literal array —
    * plus the log-prior. No join, no shuffle, no UDF. Spec-pinned
    * (train→score→select); not oracle-gated — the log is float, the
    * TABLE gate above is the exact-integer contract.
    */
  def c103ScoreDocs(s: SparkSession, d: String): DataFrame = {
    val t = c103ClassifierTrain(s, d).collect()
    val classes = Seq("keep", "reject")
    val counts: Map[String, Map[Long, Long]] = classes.map { c =>
      c -> t.filter(_.getString(0) == c)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
    }.toMap
    val totals = counts.map { case (c, m) => c -> m.values.sum }
    val docsPerLabel: Map[String, Long] = classes.map { c =>
      c -> t.filter(_.getString(0) == c).headOption.map(_.getLong(3)).getOrElse(0L)
    }.toMap
    val allDocs = docsPerLabel.values.sum.toDouble
    def weightArr(c: String): String =
      (0 until c103Buckets).map { b =>
        val w = math.log((counts(c).getOrElse(b.toLong, 0L) + 1).toDouble /
          (totals(c) + c103Buckets))
        s"CAST($w AS DOUBLE)"
      }.mkString("array(", ", ", ")")
    def scoreExpr(c: String): String = {
      val prior = math.log(math.max(docsPerLabel(c), 1L) / allDocs)
      s"CAST($prior AS DOUBLE) + aggregate(transform($c103FeatsSpark, " +
        s"f -> element_at(${weightArr(c)}, CAST(${h64Spark("concat('nb:', f)")} % $c103Buckets AS INT) + 1)), " +
        "CAST(0 AS DOUBLE), (s, x) -> s + x)"
    }
    docs(s, d)
      .withColumn("w", expr(wordsSpark))
      .select(col("doc_id"),
        expr(scoreExpr("keep")).as("s_keep"),
        expr(scoreExpr("reject")).as("s_reject"))
      .withColumn("pred",
        expr("CASE WHEN s_keep >= s_reject THEN 'keep' ELSE 'reject' END"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------- C44 corpus datasheet rollup
  /** C44: the corpus DATASHEET ("Datasheets for Datasets", Gebru et al.
    * 2021 — the reporting pass every curated release ships): per
    * (source, lang) plus rollup subtotals and the grand total, in ONE
    * corpus pass — doc counts, word/char totals, quality-gate pass
    * counts (C43's verdict), and integer words-per-doc. The rollup rides
    * the same partial-aggregated scan as the leaf groups (B10's shape);
    * at 100 TB the report costs one corpus read regardless of how many
    * subtotal levels it carries.
    */
  def c44CorpusDatasheet(s: SparkSession, d: String): DataFrame =
    c43Scored(s, d)
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("keep").cast("long")).as("n_kept"),
        grouping_id().as("gid"))
      .withColumn("words_per_doc", expr("total_words DIV n_docs"))
      .orderBy(col("gid"),
        col("source").asc_nulls_first, col("lang").asc_nulls_first)

  /** The scored-documents CTE body (doc_id + grouping cols + verdict) —
    * THE single SQL copy of the C43 rule battery, shared by the C44 and
    * C45 oracles.
    */
  private[ops] def c43ScoredSqlCte: String = {
    val stopList = c43Stop.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""scored AS (
       |  SELECT doc_id, source, lang, n_words, n_chars,
       |    (n_words >= 50 AND n_words <= 100000
       |     AND n_chars >= n_words * 3 AND n_chars <= n_words * 10
       |     AND n_syms * 10 < n_words AND n_alpha * 5 >= n_words * 4
       |     AND n_stop >= 2) AS keep
       |  FROM (
       |    SELECT doc_id, source, lang, CAST(len(w) AS BIGINT) AS n_words,
       |      CAST(length(text) - (len(w) - 1) AS BIGINT) AS n_chars,
       |      CAST(len(list_filter(w, t -> t LIKE '%#%' OR t LIKE '%...%')) AS BIGINT) AS n_syms,
       |      CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
       |      CAST(len(list_filter(w, t -> t IN $stopList)) AS BIGINT) AS n_stop
       |    FROM (SELECT doc_id, source, lang, text, $wordsDuck AS w FROM documents)))"""
      .stripMargin
  }

  val c44Sql: String =
    s"""WITH $c43ScoredSqlCte
       |SELECT source, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS total_words,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  CAST(SUM(CAST(keep AS BIGINT)) AS BIGINT) AS n_kept,
       |  CAST(GROUPING(source, lang) AS BIGINT) AS gid,
       |  CAST(SUM(n_words) AS BIGINT) // COUNT(*) AS words_per_doc
       |FROM scored GROUP BY ROLLUP (source, lang)
       |ORDER BY gid, source ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin

  // ---------------- D19 streaming corpus-datasheet feeder (C44 live)
  /** D19: C44's datasheet maintained LIVE — D11's foreachBatch shape on
    * the documents surface: each micro-batch is C43-scored and reduced
    * to (source, lang) MONOID partials (doc/word/char/kept counts),
    * appended as-is under the source partition — no watermark, no
    * stateful operator, no cross-batch coordination; the table is the
    * state. The ROLLUP is deferred to read: every datasheet column is a
    * sum over leaf groups, and sums of partial sums are the same sums,
    * so rolling up merged partials ≡ C44's rollup over raw documents
    * even when batches split a (source, lang) group — the derived
    * words-per-doc is computed AFTER the merge (IncrementalStateSpec
    * proves a two-batch stream serves the exact batch datasheet).
    */
  def appendBatchDatasheetPartials(batch: DataFrame, path: String): Unit =
    c43ScoredOn(batch)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("keep").cast("long")).as("n_kept"))
      .write.mode("append").partitionBy("source").parquet(path)

  /** Merge-on-read: the full C44 datasheet (rollup levels included) off
    * \|batches × sources × langs\| partial rows — raw documents never
    * re-read.
    */
  def datasheetFrom(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .rollup(col("source"), col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_words")).as("total_words"),
        sum(col("total_chars")).as("total_chars"),
        sum(col("n_kept")).as("n_kept"),
        grouping_id().as("gid"))
      .withColumn("words_per_doc", expr("total_words DIV n_docs"))
      .select(col("source"), col("lang"), col("n_docs"), col("total_words"),
        col("total_chars"), col("n_kept"), col("gid"), col("words_per_doc"))
      .orderBy(col("gid"),
        col("source").asc_nulls_first, col("lang").asc_nulls_first)

  // ----------------------- C51 budget-constrained corpus selection
  /** C51: QUALITY-RANKED selection under a per-source token budget — the
    * CCNet-style "keep the best documents until the budget runs out"
    * step that turns classifier scores into an actual training set.
    * Documents rank per source by the C39 classifier's `hi` score
    * (desc, doc_id tiebreak); a document is kept iff the tokens of
    * strictly better-ranked documents fit the budget (C23's
    * tokens-before form — all-integer, guarantees at least one document
    * per source, and the kept set is exactly the maximal quality-first
    * prefix). Scale shape: one codegen'd projection (the
    * HashedClassScore kernel) + ONE shuffle+sort window per source —
    * rank and prefix sum come off the same sort, no join, no driver
    * loop.
    */
  private val c51Budget = 600L // words per source — binds at every fixture SF

  def c51BudgetSelect(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("s_hi").desc, col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), col("source"),
        expr(s"CAST(size($wordsSpark) AS BIGINT)").as("n_words"),
        graft.functions.HashedClassScore(col("text"), "whi:").as("s_hi"))
      .withColumn("tokens_before", coalesce(sum(col("n_words")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("kept", col("tokens_before") < c51Budget)
      .orderBy(col("source"), col("doc_id"))
  }

  val c51Sql: String =
    s"""SELECT doc_id, source, n_words, s_hi,
       |  CAST(COALESCE(SUM(n_words) OVER (PARTITION BY source
       |    ORDER BY s_hi DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS tokens_before,
       |  CAST(COALESCE(SUM(n_words) OVER (PARTITION BY source
       |    ORDER BY s_hi DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    < $c51Budget AS kept
       |FROM (
       |  SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_words,
       |    ${c39ScoreDuck("hi")} AS s_hi
       |  FROM (SELECT doc_id, source, $wordsDuck AS w FROM documents))
       |ORDER BY source, doc_id""".stripMargin

  // ----------------------------- C53 vocabulary coverage curve
  /** C53: vocabulary COVERAGE curve — the tokenizer-diagnostics readout
    * (what vocab size covers what share of the corpus): for vocab sizes
    * K ∈ {1, 2, 4, …, 32}, the fraction (basis points) of corpus token
    * occurrences covered by the top-K words by frequency (ties broken
    * lexically). One corpus scan to word counts (C15's partial-agg
    * shape — the shuffle carries \|vocab\|), then a DISTRIBUTED
    * top-K_max (TakeOrderedAndProject: every partition keeps ≤32 rows —
    * never a \|vocab\|-wide window, which would drag 10⁸⁺ distinct
    * words onto one task at 100 TB) folded into ONE ≤32-element array
    * row; the K-ladder prefix sums expand in-row (tie order among equal
    * counts cannot change a prefix sum of equal values). The scalar
    * total consumes the SAME word-count Exchange (exchange reuse — one
    * scan, one shuffle, no checkpoint, no driver collect). All-integer
    * (`covered·10⁴ DIV total`), hash-exact.
    */
  private val c53Ks = Seq(1, 2, 4, 8, 16, 32)

  def c53CoverageCurve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = docs(s, d)
      .select(explode(expr(wordsSpark)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val head = counts
      .orderBy(col("cnt").desc, col("w")).limit(c53Ks.max)
      .agg(reverse(sort_array(collect_list(col("cnt")))).as("hs"))
    broadcast(head)
      .crossJoin(c53Ks.toDF("k"))
      .select(col("k"),
        expr("aggregate(slice(hs, 1, k), 0L, (a, x) -> a + x)")
          .as("covered_tokens"))
      .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total_tokens"))))
      .withColumn("coverage_bp",
        expr("covered_tokens * 10000 DIV total_tokens"))
      .orderBy(col("k"))
  }

  val c53Sql: String = {
    val ks = c53Ks.map(k => s"($k)").mkString(", ")
    s"""WITH counts AS (
       |  SELECT w, COUNT(*) AS cnt
       |  FROM (SELECT unnest($wordsDuck) AS w FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |ranked AS (
       |  SELECT w, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rk
       |  FROM counts)
       |SELECT k,
       |  CAST(SUM(CASE WHEN rk <= k THEN cnt ELSE 0 END) AS BIGINT) AS covered_tokens,
       |  CAST(SUM(cnt) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN rk <= k THEN cnt ELSE 0 END) AS BIGINT) * 10000
       |    // CAST(SUM(cnt) AS BIGINT) AS coverage_bp
       |FROM ranked, (VALUES $ks) AS kv(k)
       |GROUP BY k ORDER BY k""".stripMargin
  }

  // ----------------------------- C58 tokenizer fertility by language
  /** C58: tokenizer FERTILITY diagnostics — tokens-per-word by language,
    * the standard readout for "whom does this tokenizer tax": a
    * language whose words fragment into many BPE pieces pays more
    * context budget per word (fertility is the per-language multiplier
    * multilingual tokenizer papers report). Rides C37's encode chain
    * (the C32-trained dictionary broadcasts; the corpus is scanned
    * once), aggregated per language instead of per document: docs,
    * words, BPE tokens, and fertility in integer basis points
    * (`tokens·10⁴ DIV words` — hash-exact). The oracle re-derives the
    * encode dictionary through the same unrolled merge chain and
    * regroups — one tokenizer, two aggregation paths.
    */
  def c58Fertility(s: SparkSession, d: String): DataFrame = {
    val dict = c32Dictionary(s, d)
    docs(s, d)
      .select(col("doc_id"), col("lang"), explode(expr(wordsSpark)).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(dict), Seq("w"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("bpe_tokens"))
      .withColumn("fertility_bp", expr("bpe_tokens * 10000 DIV n_words"))
      .orderBy(col("lang"))
  }

  val c58Sql: String =
    s"""WITH ${c32SqlChain(carryW = true)},
       |enc AS (
       |  SELECT w, CAST(len(regexp_extract_all(ws, '\\(([^)]*)\\)', 1)) AS BIGINT) AS n_tok
       |  FROM v$c32Merges),
       |dw AS (
       |  SELECT doc_id, lang, w
       |  FROM (SELECT doc_id, lang, unnest($wordsDuck) AS w FROM documents)
       |  WHERE w <> '')
       |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_words,
       |  CAST(SUM(n_tok) AS BIGINT) AS bpe_tokens,
       |  CAST(CAST(SUM(n_tok) AS BIGINT) * 10000 // COUNT(*) AS BIGINT) AS fertility_bp
       |FROM dw JOIN enc USING (w)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------- C66 LM-familiarity scoring
  /** C66: LANGUAGE-MODEL familiarity scoring — the CCNet/RefinedWeb
    * perplexity-filter shape (score each document by how typical its
    * n-grams are of the corpus; outliers both ways get reviewed: very
    * unfamiliar = noise/garble, very familiar = boilerplate): the "LM"
    * is the corpus's own bigram frequency table (one aggregate pass,
    * shuffle = |bigram vocab|), broadcast back into a scoring pass
    * whose per-doc mean bigram frequency lands in integer
    * parts-per-million of corpus mass (`Σcnt·10⁶ DIV (n_bg·T)` —
    * hash-exact, no logs; the ranking this induces is the monotone core
    * of the perplexity filter, with float log-probs left to the
    * consumer). C55's two-pass broadcast shape with an n-gram LM
    * instead of a target contrast; docs under 2 words carry no bigram
    * and drop (stated in both engines).
    *
    * Scale shape (round-8 reshape): the corpus total `t` is a 1-row
    * SCALAR aggregate over the lm frame cross-joined after the per-doc
    * aggregate — never an unpartitioned window (which would drag the
    * whole |bigram vocab| onto one partition); and the lm join side is
    * picked from the MEASURED vocab size exactly like C27 (broadcast
    * under the ceiling, pinned merge join above it — a 100 TB bigram
    * vocab is billions of rows and cannot broadcast). The lm frame is
    * referenced twice (join + total); at scale it would be persisted
    * once, here the recompute is the same |vocab| aggregate C27 pays
    * for its measurement.
    */
  private[graft] val c66BroadcastMaxVocab = 10_000_000L

  def c66Familiarity(s: SparkSession, d: String): DataFrame =
    c66ScoreWith(s, d, c66BroadcastMaxVocab)

  private[graft] def c66ScoreWith(s: SparkSession, d: String, maxVocab: Long): DataFrame = {
    val bg = graft.core.Tables.documentsRebalanced(s, d)
      .withColumn("w", expr(wordsSpark))
      .where(expr("size(w) >= 2"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> " +
          "concat(element_at(w, i), '_', element_at(w, i + 1)))")).as("bgr"))
      .select(col("doc_id"), expr(h64Spark("concat('fb:', bgr)")).as("bh"))
      // staged: the bigram explode feeds BOTH the lm build and the final
      // scoring join — without the checkpoint it runs twice
      .localCheckpoint(true)
    // the lm frame has THREE consumers (the size measurement, the join
    // side, the scalar total) — checkpointed once so the corpus bigram
    // explode behind it runs once, not once per consumer (at scale this
    // is the persisted lm artifact; the |vocab|-row frame is what a
    // production pipeline materializes anyway)
    val lm = bg.groupBy(col("bh")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // r13 job-floor collapse: the vocab-size measurement (join-strategy
    // pick) and the scalar corpus total used to be TWO jobs (a
    // limit+count probe and a broadcast 1-row agg build); both are scalar
    // facts of the checkpointed lm, so one tiny agg job yields both and
    // the total rides into the scoring expression as a literal — same
    // arithmetic, one fewer sequential job (plus the former
    // crossJoin(broadcast(tot)) BNLJ node gone).
    val r = lm.agg(count(lit(1)).as("vocab"), sum(col("cnt")).as("t"))
      .collect()(0)
    val fits = maxVocab == Long.MaxValue ||
      (maxVocab > 0 && r.getLong(0) <= maxVocab)
    val t = if (r.isNullAt(1)) 1L else r.getLong(1) // empty corpus guard
    val v = if (fits) broadcast(lm) else lm.hint("merge")
    bg.join(v, "bh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("sum_cnt"))
      .select(col("doc_id"), col("n_bigrams"),
        expr(s"CAST(sum_cnt * 1000000 DIV (n_bigrams * CAST($t AS BIGINT)) AS BIGINT)")
          .as("familiarity_ppm"))
      .orderBy(col("doc_id"))
  }

  val c66Sql: String =
    s"""WITH bg AS (
       |  SELECT doc_id, ${h64Duck("'fb:'||bgr")} AS bh
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(w)), i -> w[i]||'_'||w[i+1])) AS bgr
       |    FROM (SELECT doc_id, $wordsDuck AS w FROM documents)
       |    WHERE len(w) >= 2)),
       |lm AS (SELECT bh, COUNT(*) AS cnt FROM bg GROUP BY bh),
       |lmt AS (SELECT bh, cnt, SUM(cnt) OVER () AS t FROM lm)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(cnt) * 1000000 // (COUNT(*) * MAX(t)) AS BIGINT)
       |    AS familiarity_ppm
       |FROM bg JOIN lmt USING (bh)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------- C104 Stupid-Backoff bigram LM + CCNet buckets
  /** C104: distributed N-GRAM LANGUAGE MODEL (Stupid Backoff, Brants et
    * al. 2007 "Large Language Models in Machine Translation") plus the
    * CCNet head/middle/tail PERPLEXITY BUCKETING that consumes it —
    * the literal CCNet pipeline step C66's corpus-familiarity ranking
    * approximates. The LM is trained and applied in one job: bigram
    * conditional score cb·10⁶ DIV cu(prefix) when the bigram was seen,
    * else the backoff lane α·cu(word)/T with α = 0.4 kept exact as
    * (2·cu·10⁶) DIV (5·T) — every score an integer in parts-per-million,
    * so the whole model (train + apply + bucket) is hash-exact across
    * engines with the float log left to the consumer (C66's doctrine).
    * Per document the mean token score is its fluency ppm; per LANGUAGE
    * the docs are cut into terciles by ppm rank — head = most fluent
    * third, the buckets CCNet ships as dataset splits.
    *
    * Scale shape: the token stream (one explode carrying all three hash
    * lanes: prefix unigram, current unigram, bigram) is staged once and
    * feeds both the bigram-count build and the scoring joins; the
    * unigram table is staged once for its three consumers (the size
    * measurement, two join lanes, and the scalar total). Join sides are
    * picked from MEASURED vocab sizes exactly like C66/C27 — broadcast
    * under the ceiling, pinned merge join above it (a 100 TB bigram
    * vocab is billions of rows and cannot broadcast). The tercile cut
    * is a BOUNDED-DOMAIN HISTOGRAM rank (C93's doctrine): ppm ∈
    * [0, 10⁶], so the per-language rank comes from a ≤10⁶-row histogram
    * window and a broadcast join back — never a corpus-wide sort.
    */
  private[graft] val c104BroadcastMaxVocab = 10_000_000L

  /** The bucketed-doc frame (doc_id, lang, ppm, bucket, nt) is memoized
    * per (session, dir): C104 gates it and C105 plans the mixture on it —
    * in a deployment the CCNet bucket assignment IS a persisted table
    * consumed by every downstream split decision.
    */
  private def c104Memo(s: SparkSession, d: String): DataFrame =
    graft.core.FrameMemo.cached(s, s"c104buckets:$d")(
      c104BucketsWith(s, d, c104BroadcastMaxVocab))

  def c104NgramLm(s: SparkSession, d: String): DataFrame =
    c104Memo(s, d)
      .select(col("doc_id"), col("lang"), col("ppm"), col("bucket"))
      .orderBy(col("doc_id"))

  private[graft] def c104BucketsWith(
      s: SparkSession, d: String, maxVocab: Long): DataFrame = {
    // staged: the scored per-doc frame feeds the histogram build AND the
    // bucket join-back
    val doc = c104ScoredDoc(s, d, maxVocab).localCheckpoint(true)
    val hist = doc.groupBy(col("lang"), col("ppm")).agg(count(lit(1)).as("c"))
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("lang")).orderBy(col("ppm").desc)
    val wAll = Window.partitionBy(col("lang"))
    val buck = hist.select(col("lang"), col("ppm"),
      (sum(col("c")).over(wOrd) - col("c") + lit(1)).as("r"),
      sum(col("c")).over(wAll).as("n"))
    doc.join(broadcast(buck), Seq("lang", "ppm"))
      .select(col("doc_id"), col("lang"), col("ppm"),
        expr("CASE WHEN 3 * r <= n THEN 'head'" +
          " WHEN 3 * r <= 2 * n THEN 'middle' ELSE 'tail' END").as("bucket"),
        col("nt"))
  }

  /** Bigram-position explode over a (doc_id, lang, text) frame — one
    * explode carries all three hash lanes; sub-2-word docs drop (a
    * bigram LM cannot score them, stated in both engines).
    */
  private def c104TokOf(frame: DataFrame): DataFrame =
    frame
      .select(col("doc_id"), col("lang"), expr(wordsSpark).as("w"))
      .where(expr("size(w) >= 2"))
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(2, size(w)), i -> named_struct(" +
          s"'hp', ${h64Spark("concat('sbu:', element_at(w, i - 1))")}, " +
          s"'hc', ${h64Spark("concat('sbu:', element_at(w, i))")}, " +
          s"'hb', ${h64Spark("concat('sbb:', element_at(w, i - 1), chr(1), element_at(w, i))")}))"))
        .as("t"))
      .select(col("doc_id"), col("lang"),
        col("t.hp").as("hp"), col("t.hc").as("hc"), col("t.hb").as("hb"))

  // the trained LM IS three memoized artifacts — corpus token stream,
  // unigram counts, bigram counts; in a deployment these are the
  // persisted model tables every scoring job (batch or stream) joins
  private def c104CorpusTok(s: SparkSession, d: String): DataFrame =
    graft.core.FrameMemo.cached(s, s"c104tok:$d")(c104TokOf(docs(s, d)))

  private def c104Uni(s: SparkSession, d: String): DataFrame =
    graft.core.FrameMemo.cached(s, s"c104uni:$d")(
      docs(s, d)
        .select(col("doc_id"), expr(wordsSpark).as("w"))
        .where(expr("size(w) >= 2"))
        .select(explode(col("w")).as("wd"))
        .select(expr(h64Spark("concat('sbu:', wd)")).as("uh"))
        .groupBy(col("uh")).agg(count(lit(1)).as("cu")))

  private def c104Big(s: SparkSession, d: String): DataFrame =
    graft.core.FrameMemo.cached(s, s"c104big:$d")(
      c104CorpusTok(s, d).groupBy(col("hb")).agg(count(lit(1)).as("cb")))

  /** Score a token stream against the trained tables — the join+agg
    * pipeline up to the per-doc (ppm, nt) aggregate, un-checkpointed so
    * its join shape stays plan-auditable.
    */
  private def c104Score(
      tok: DataFrame, uni: DataFrame, big: DataFrame, maxVocab: Long): DataFrame = {
    def measuredFits(t: DataFrame): Boolean = maxVocab == Long.MaxValue ||
      (maxVocab > 0 &&
        t.limit(math.min(maxVocab + 1, Int.MaxValue.toLong).toInt).count() <= maxVocab)
    val uFits = measuredFits(uni)
    val bFits = measuredFits(big)
    def uniLane(k: String, c: String): DataFrame = {
      val lane = uni.select(col("uh").as(k), col("cu").as(c))
      if (uFits) broadcast(lane) else lane.hint("merge")
    }
    val tot = uni.agg(sum(col("cu")).as("t"))
    tok
      .join(if (bFits) broadcast(big) else big.hint("merge"), Seq("hb"), "left")
      .join(uniLane("hp", "cu_p"), Seq("hp"))
      .join(uniLane("hc", "cu_c"), Seq("hc"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("lang"),
        expr("CASE WHEN cb IS NOT NULL THEN cb * 1000000 DIV cu_p" +
          " ELSE (2 * cu_c * 1000000) DIV (5 * t) END").as("sc"))
      .groupBy(col("doc_id"), col("lang"))
      // nt = word count: bigram positions + 1 (the ≥2-word filter holds)
      .agg(expr("CAST(sum(sc) DIV count(1) AS BIGINT)").as("ppm"),
        expr("CAST(count(1) + 1 AS BIGINT)").as("nt"))
  }

  private[graft] def c104ScoredDoc(
      s: SparkSession, d: String, maxVocab: Long): DataFrame =
    c104Score(c104CorpusTok(s, d), c104Uni(s, d), c104Big(s, d), maxVocab)

  /** Score an ARBITRARY (doc_id, lang, text) frame against the
    * corpus-trained LM — the serving path (D39 scores micro-batches
    * through it). Unseen BIGRAMS take the backoff lane; positions whose
    * words are outside the training vocabulary drop via the inner
    * unigram joins (Stupid Backoff reserves no OOV mass), so on served
    * data `nt` counts scoreable positions + 1 and a doc with zero
    * scoreable positions emits no row. On the training corpus itself
    * every position is in-vocabulary and this equals [[c104ScoredDoc]].
    */
  private[graft] def c104ScoreBatch(
      s: SparkSession, d: String, frame: DataFrame): DataFrame =
    c104Score(c104TokOf(frame), c104Uni(s, d), c104Big(s, d),
      c104BroadcastMaxVocab)

  /** The shared train+score+rank CTE chain — C104 reads the bucket
    * assignment off it, C105 plans the mixture off it (ONE SQL copy of
    * the model, the c43ScoredSqlCte pattern).
    */
  private val c104CtesSql: String =
    s"""base AS (
       |  SELECT doc_id, lang, w
       |  FROM (SELECT doc_id, lang, $wordsDuck AS w FROM documents)
       |  WHERE len(w) >= 2),
       |tok AS (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(2, len(w) + 1),
       |      i -> ${h64Duck("'sbu:'||w[i-1]")})) AS hp,
       |    unnest(list_transform(range(2, len(w) + 1),
       |      i -> ${h64Duck("'sbu:'||w[i]")})) AS hc,
       |    unnest(list_transform(range(2, len(w) + 1),
       |      i -> ${h64Duck("'sbb:'||w[i-1]||chr(1)||w[i]")})) AS hb
       |  FROM base),
       |uni AS (
       |  SELECT ${h64Duck("'sbu:'||wd")} AS uh, COUNT(*) AS cu
       |  FROM (SELECT unnest(w) AS wd FROM base) GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS t FROM uni),
       |big AS (SELECT hb, COUNT(*) AS cb FROM tok GROUP BY 1),
       |ts AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN cb IS NOT NULL THEN cb * 1000000 // up.cu
       |         ELSE (2 * uc.cu * 1000000) // (5 * t) END AS sc
       |  FROM tok LEFT JOIN big USING (hb)
       |    JOIN uni up ON tok.hp = up.uh
       |    JOIN uni uc ON tok.hc = uc.uh
       |    CROSS JOIN tot),
       |doc AS (
       |  SELECT doc_id, lang, CAST(SUM(sc) // COUNT(*) AS BIGINT) AS ppm,
       |    CAST(COUNT(*) + 1 AS BIGINT) AS nt
       |  FROM ts GROUP BY doc_id, lang),
       |hist AS (SELECT lang, ppm, COUNT(*) AS c FROM doc GROUP BY 1, 2),
       |buck AS (
       |  SELECT lang, ppm,
       |    SUM(c) OVER (PARTITION BY lang ORDER BY ppm DESC) - c + 1 AS r,
       |    SUM(c) OVER (PARTITION BY lang) AS n
       |  FROM hist),
       |bb AS (
       |  SELECT doc_id, d.lang AS lang, d.ppm AS ppm,
       |    CASE WHEN 3 * r <= n THEN 'head'
       |         WHEN 3 * r <= 2 * n THEN 'middle' ELSE 'tail' END AS bucket,
       |    nt
       |  FROM doc d JOIN buck b ON d.lang = b.lang AND d.ppm = b.ppm)""".stripMargin

  val c104Sql: String =
    s"""WITH $c104CtesSql
       |SELECT doc_id, lang, ppm, bucket FROM bb
       |ORDER BY doc_id""".stripMargin

  // ------------------- C105 perplexity-filtered mixture plan
  /** C105: PERPLEXITY-FILTERED equal-parts mixture — the step where
    * CCNet's buckets become a dataset decision (Wenzek et al. 2020 keep
    * head+middle per language and drop the tail; the multilingual mix
    * then takes equal parts per language, capped by the scarcest one):
    * per language, raw scoreable tokens vs tokens surviving the tail cut,
    * the equal-parts take (min over kept — the binding language), and the
    * realized sampling rates in basis points against BOTH denominators
    * (vs kept = the mixture discount alone; vs raw = the compounded
    * perplexity × mixture discount — C102's raw-beside-clean reporting).
    * Sub-2-word docs are unscoreable by a bigram LM and sit outside both
    * denominators (stated in both engines via the shared ≥2-word base).
    *
    * Scale shape: ONE projection + map-side-combined aggregate over the
    * memoized C104 bucket frame (no second LM train), plan math on the
    * \|langs\|-row aggregate via a bounded-frame window (C28's doctrine).
    * Zero-kept languages (possible below 3 docs: a tercile of n < 3 has
    * no head) take 0 with 0 bp, guarded identically in both engines.
    */
  def c105PerplexityMixture(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    c104Memo(s, d)
      .groupBy(col("lang"))
      .agg(sum(col("nt")).as("raw_tokens"),
        sum(expr("CASE WHEN bucket <> 'tail' THEN nt ELSE 0 END"))
          .as("kept_tokens"))
      .withColumn("take_tokens",
        min(col("kept_tokens")).over(Window.partitionBy()))
      .select(col("lang"), col("raw_tokens"), col("kept_tokens"),
        col("take_tokens"),
        expr("CASE WHEN kept_tokens = 0 THEN 0" +
          " ELSE take_tokens * 10000 DIV kept_tokens END").as("keep_rate_bp"),
        expr("take_tokens * 10000 DIV raw_tokens").as("raw_rate_bp"))
      .orderBy(col("lang"))
  }

  val c105Sql: String =
    s"""WITH $c104CtesSql,
       |agg AS (
       |  SELECT lang, CAST(SUM(nt) AS BIGINT) AS raw_tokens,
       |    CAST(SUM(CASE WHEN bucket <> 'tail' THEN nt ELSE 0 END) AS BIGINT)
       |      AS kept_tokens
       |  FROM bb GROUP BY lang),
       |m AS (SELECT *, MIN(kept_tokens) OVER () AS take_tokens FROM agg)
       |SELECT lang, raw_tokens, kept_tokens,
       |  CAST(take_tokens AS BIGINT) AS take_tokens,
       |  CAST(CASE WHEN kept_tokens = 0 THEN 0
       |       ELSE take_tokens * 10000 // kept_tokens END AS BIGINT)
       |    AS keep_rate_bp,
       |  CAST(take_tokens * 10000 // raw_tokens AS BIGINT) AS raw_rate_bp
       |FROM m ORDER BY lang""".stripMargin

  // ------------------------------- C63 exact-k stratified sample
  /** C63: EXACT-K deterministic sample per stratum — C22 samples at a
    * RATE (kept count varies with |stratum|); an eval set wants exactly
    * k docs per source, reproducibly. Rank by the doc's md5-lane hash
    * (a uniform, engine-identical, restart-stable shuffle order) within
    * each source and keep rank ≤ k: the same "random but deterministic"
    * contract as every other sampling decision, now with a hard size.
    * One shuffle+sort window per stratum; at 100 TB a top-k-per-group
    * (partial per-partition heaps) replaces the full sort — the rank
    * form is the semantics contract both share.
    */
  private[graft] val c63K = 25

  def c63ExactKSample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), col("source"),
        expr(s"${h64Spark("concat('ek:', CAST(doc_id AS STRING))")}").as("hv"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= c63K)
      .select(col("source"), col("rk"), col("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  val c63Sql: String =
    s"""SELECT source, rk, doc_id FROM (
       |  SELECT source, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
       |  FROM (SELECT doc_id, source,
       |          ${h64Duck("'ek:'||CAST(doc_id AS VARCHAR)")} AS hv
       |        FROM documents))
       |WHERE rk <= $c63K ORDER BY source, rk""".stripMargin

  // ------------------------------- C62 corpus snapshot diff
  /** C62: SNAPSHOT DIFF — the release-notes table between two corpus
    * versions (what did the new crawl add, what did the cleanup remove,
    * per source): full-outer join of the two snapshots on doc_id,
    * three-way classification (added / removed / kept), and a per-source
    * rollup of documents and tokens in each class. Snapshots here are
    * deterministic overlapping views of the fixture (v1 = doc_id%10 < 8,
    * v2 = doc_id%10 ≥ 2 — both diff classes non-empty); in production
    * they are two partition versions of the same table (C50's
    * append-only versioning). One full-outer join on doc_id (the shuffle
    * carries |v1 ∪ v2| rows once) + a 4-row aggregate; token deltas are
    * exact BIGINTs.
    */
  def c62SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("source"),
      expr(s"size($wordsSpark)").cast("long").as("nt"))
    val v1 = base.where(col("doc_id") % 10 < 8)
      .select(col("doc_id").as("d1"), col("source").as("s1"), col("nt").as("nt1"))
    val v2 = base.where(col("doc_id") % 10 >= 2)
      .select(col("doc_id").as("d2"), col("source").as("s2"), col("nt").as("nt2"))
    v1.join(v2, col("d1") === col("d2"), "full_outer")
      .select(coalesce(col("s1"), col("s2")).as("source"),
        when(col("d1").isNull, lit("added"))
          .when(col("d2").isNull, lit("removed"))
          .otherwise(lit("kept")).as("status"),
        coalesce(col("nt1"), col("nt2")).as("nt"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens"))
      .orderBy(col("source"), col("status"))
  }

  val c62Sql: String =
    s"""WITH base AS (
       |  SELECT doc_id, source, CAST(len($wordsDuck) AS BIGINT) AS nt
       |  FROM documents),
       |v1 AS (SELECT doc_id AS d1, source AS s1, nt AS nt1 FROM base WHERE doc_id % 10 < 8),
       |v2 AS (SELECT doc_id AS d2, source AS s2, nt AS nt2 FROM base WHERE doc_id % 10 >= 2)
       |SELECT COALESCE(s1, s2) AS source,
       |  CASE WHEN d1 IS NULL THEN 'added'
       |       WHEN d2 IS NULL THEN 'removed' ELSE 'kept' END AS status,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(COALESCE(nt1, nt2)) AS BIGINT) AS tokens
       |FROM v1 FULL OUTER JOIN v2 ON d1 = d2
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------- C55 hashed importance weighting (DSIR)
  /** C55: DSIR-shaped importance weighting (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling") — score
    * every corpus document by how much its hashed-feature profile looks
    * like a TARGET domain's profile vs the corpus at large, the step
    * that turns "we want more data like this" into per-document weights.
    * Features are word unigrams hashed into 256 buckets (DSIR's hashed
    * n-gram generative model); the target distribution is the `src0`
    * slice (a stand-in for the downstream/eval corpus). Where DSIR
    * scores log p_tgt(f) − p_corp(f), this keeps the repo's all-integer
    * contract with the cross-multiplied linear contrast
    * Σ_tokens (tgt(b)·N − corp(b)·T): same sign semantics (positive ⇔
    * feature over-represented in the target), exact BIGINT, hash-stable
    * across engines.
    *
    * Scale shape: ONE conditional-aggregate scan builds BOTH
    * distributions (256 counter rows regardless of corpus size — the
    * bucket stats are a BROADCAST side), then the scoring pass re-scans
    * the corpus, equi-joins the broadcast frame, and map-side-combines
    * the per-doc sum — the shuffle carries |docs| partials, never
    * tokens. No collect, no driver loop; at 100 TB both passes stream.
    */
  private val c55Buckets = 256
  private val c55Target = "src0"

  def c55ImportanceWeight(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.core.Tables.documentsRebalanced(s, d)
      .select(col("doc_id"), col("source"),
        explode(expr(wordsSpark)).as("t"))
      .where(col("t") =!= "")
      .withColumn("bucket", expr(s"${h64Spark("t")} % $c55Buckets"))
    // both distributions in ONE pass; totals via a window over 256 rows
    val stats = toks.groupBy(col("bucket"))
      .agg(count(lit(1)).as("corp_n"),
        count(when(col("source") === c55Target, 1)).as("tgt_n"))
      .withColumn("n_tot", sum(col("corp_n")).over(Window.partitionBy()))
      .withColumn("t_tot", sum(col("tgt_n")).over(Window.partitionBy()))
    toks.join(broadcast(stats), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_toks"),
        sum(col("tgt_n") * col("n_tot") - col("corp_n") * col("t_tot"))
          .cast("long").as("score"))
      .orderBy(col("doc_id"))
  }

  val c55Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, ${h64Duck("t")} % $c55Buckets AS bucket
       |  FROM (SELECT doc_id, source, unnest($wordsDuck) AS t FROM documents)
       |  WHERE t <> ''),
       |stats AS (
       |  SELECT bucket, COUNT(*) AS corp_n,
       |    COUNT(*) FILTER (WHERE source = '$c55Target') AS tgt_n
       |  FROM toks GROUP BY bucket),
       |tot AS (
       |  SELECT bucket, corp_n, tgt_n,
       |    SUM(corp_n) OVER () AS n_tot, SUM(tgt_n) OVER () AS t_tot
       |  FROM stats)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
       |  CAST(SUM(tgt_n * n_tot - corp_n * t_tot) AS BIGINT) AS score
       |FROM toks JOIN tot USING (bucket)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------- C48 datasheet quantiles under CUBE
  /** C48: the corpus datasheet widened with DISTRIBUTION columns — per
    * (source, lang) and every CUBE subtotal, median and p90 words-per-doc
    * read off a fixed-width histogram (B30's bin-selection under C44's
    * reporting rollup). One corpus pass: the grouping-set expansion and
    * the histogram share a single partial-aggregated scan whose shuffle
    * carries \|sets × groups × bins\| counter rows — never documents —
    * and the quantile read-off is a window + aggregate over that tiny
    * frame. `bin` rides INSIDE each grouping set (always grouped), so
    * the same histogram rows serve every subtotal level. All-integer
    * (`cum·100 ≥ total·p`, bin lower bounds), hash-exact gate; error ≤
    * one bin width, a bound merging provably can't widen. grouping_id
    * over (source, lang, bin) carries bin as the always-0 LSB —
    * `gid = grouping_id() DIV 2` matches DuckDB's GROUPING(source, lang)
    * (first column = MSB in both engines, pinned by B29).
    */
  private val c48BinW = 20L

  def c48DatasheetQuantiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = col("source"); val lng = col("lang"); val bin = col("bin")
    val hist = c43Scored(s, d)
      .withColumn("bin", expr(s"n_words DIV $c48BinW"))
      .groupingSets(
        Seq(Seq(src, lng, bin), Seq(src, bin), Seq(lng, bin), Seq(bin)),
        src, lng, bin)
      .agg(count(lit(1)).as("n"), (grouping_id() / 2).cast("long").as("gid"))
    val w = Window.partitionBy(col("gid"), src, lng)
    hist
      .withColumn("cum", sum(col("n")).over(w.orderBy(bin)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(w))
      .groupBy(col("gid"), src, lng)
      .agg(max(col("total")).as("n_docs"),
        (min(when(col("cum") * 100 >= col("total") * 50, bin)) * c48BinW)
          .as("p50_words_lo"),
        (min(when(col("cum") * 100 >= col("total") * 90, bin)) * c48BinW)
          .as("p90_words_lo"))
      .orderBy(col("gid"), src.asc_nulls_first, lng.asc_nulls_first)
  }

  val c48Sql: String =
    s"""WITH $c43ScoredSqlCte,
       |hist AS (
       |  SELECT source, lang, bin, COUNT(*) AS n,
       |    CAST(GROUPING(source, lang) AS BIGINT) AS gid
       |  FROM (SELECT source, lang, n_words // $c48BinW AS bin FROM scored)
       |  GROUP BY GROUPING SETS ((source, lang, bin), (source, bin),
       |                          (lang, bin), (bin))),
       |c AS (
       |  SELECT *,
       |    SUM(n) OVER (PARTITION BY gid, source, lang ORDER BY bin
       |                 ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(n) OVER (PARTITION BY gid, source, lang) AS total
       |  FROM hist)
       |SELECT gid, source, lang, CAST(MAX(total) AS BIGINT) AS n_docs,
       |  CAST(MIN(CASE WHEN cum * 100 >= total * 50 THEN bin END)
       |       * $c48BinW AS BIGINT) AS p50_words_lo,
       |  CAST(MIN(CASE WHEN cum * 100 >= total * 90 THEN bin END)
       |       * $c48BinW AS BIGINT) AS p90_words_lo
       |FROM c GROUP BY gid, source, lang
       |ORDER BY gid, source ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin

  // ------------------------- C74 cross-source vocabulary similarity
  /** C74: cross-source VOCABULARY-similarity matrix — the distribution-
    * level "are these two sources telling me the same thing" read taken
    * before mixture planning (C28) or paying for more of a source
    * (C70's novelty is the document-level complement; C52 attributes
    * literal duplication — this measures distributional redundancy even
    * when no text is shared). Each source becomes a hashed-unigram
    * count vector over [[c74Buckets]] buckets (the DSIR/hashed-feature
    * trick: a fixed-width profile regardless of vocabulary size), and
    * every source pair gets the cosine between the two count vectors.
    *
    * Scale shape: ONE map-side-combined aggregate over the corpus
    * (shuffle = |sources|×buckets rows); the pairwise stage joins
    * bucket-to-bucket — S·V rows per side, never an S² array
    * materialization — with the probe side BROADCAST (it is bounded by
    * construction at |sources|·64 rows — the bucket constant times the
    * catalog's source count, never corpus-sized; Catalyst's estimate
    * for a derived aggregate is "unknown = huge", which planned a
    * sort-merge join over a 640-row frame) and the |sources|-row norm
    * frame broadcasts likewise.
    * Exactness: counts, squared norms and dots are all integer sums
    * (order-insensitive); float math is confined to the final cosine
    * projection over exact integers (B15's doctrine) where IEEE
    * sqrt/mul/div are correctly rounded — hash-exact in both engines.
    */
  private[graft] val c74Buckets = 64

  /** C74's hashed-unigram bucket expression over a word column `w` —
    * shared with D32's streaming drift monitor so live profiles and the
    * batch similarity matrix bucket identically.
    */
  private[graft] val c74BucketSpark: String =
    s"${h64Spark("concat('vb:', w)")} % $c74Buckets"

  def c74SourceVocabSim(s: SparkSession, d: String): DataFrame = {
    val cnts = Tables.documentsRebalanced(s, d) // tokenize off the 1-partition scan
      .select(col("source"), explode(expr(wordsSpark)).as("w"))
      .where(col("w") =!= "")
      .withColumn("b", expr(c74BucketSpark))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val lhs = cnts.select(col("source").as("s1"), col("b"), col("c").as("c1"))
    val rhs = cnts.select(col("source").as("s2"), col("b"), col("c").as("c2"))
    // keep the DIAGONAL through the pair aggregation: dot(s, s) IS the
    // squared norm, so the norms come off the same pair frame instead of
    // a second corpus aggregation (whose different partial-agg shape
    // defeated exchange reuse and re-tokenized the whole corpus)
    val pairs = lhs.join(broadcast(rhs), "b")
      .where(col("s1") <= col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(sum(col("c1") * col("c2")).as("dot"))
    val diag = pairs.where(col("s1") === col("s2"))
    pairs.where(col("s1") < col("s2"))
      .join(broadcast(diag.select(col("s1"), col("dot").as("n2a"))), "s1")
      .join(broadcast(diag.select(col("s1").as("s2"), col("dot").as("n2b"))), "s2")
      .select(col("s1"), col("s2"), col("dot"),
        (col("dot").cast("double") /
          (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))))
          .as("cos_sim"))
      .orderBy(col("s1"), col("s2"))
  }

  val c74Sql: String =
    s"""WITH cnts AS (
       |  SELECT source, b, COUNT(*) AS c FROM (
       |    SELECT source, ${h64Duck("'vb:'||w")} % $c74Buckets AS b
       |    FROM (SELECT source, unnest($wordsDuck) AS w FROM documents)
       |    WHERE w <> '')
       |  GROUP BY source, b),
       |norms AS (
       |  SELECT source, CAST(SUM(c * c) AS BIGINT) AS n2 FROM cnts GROUP BY source),
       |dots AS (
       |  SELECT lhs.source AS s1, rhs.source AS s2,
       |    CAST(SUM(lhs.c * rhs.c) AS BIGINT) AS dot
       |  FROM cnts lhs JOIN cnts rhs ON lhs.b = rhs.b
       |  WHERE lhs.source < rhs.source
       |  GROUP BY 1, 2)
       |SELECT s1, s2, dot,
       |  CAST(dot AS DOUBLE) /
       |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
       |FROM dots
       |JOIN norms na ON na.source = s1
       |JOIN norms nb ON nb.source = s2
       |ORDER BY s1, s2""".stripMargin

  // ------------------------- C75 vocabulary frequency spectrum
  /** C75: corpus FREQUENCY SPECTRUM — the Zipf/heavy-tail diagnostic
    * (how many distinct words occur k times, k binned by powers of two):
    * the one-page readout that catches a broken tokenizer (hapax
    * explosion), boilerplate flooding (mass piling into the top bins),
    * or a truncated crawl (missing tail) before any downstream op
    * trusts the vocabulary. Two map-side-combined aggregates — word →
    * frequency (shuffle = |vocab|), then frequency → power-of-two bin
    * (~40 output rows regardless of corpus size). The bin index is
    * floor(log2 f) computed INTEGER-exactly from the binary-digit count
    * (`length(bin(f)) − 1` / `length(printf('%b', f)) − 1`) — float
    * log2 at exact powers of two is an engine-rounding coin flip, the
    * digit count is not.
    */
  def c75FreqSpectrum(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(expr(wordsSpark)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .withColumn("bucket", (length(expr("bin(f)")) - 1).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_words"), sum(col("f")).as("n_occurrences"))
      .select(col("bucket"), expr("CAST(shiftleft(1L, bucket) AS BIGINT)").as("freq_lo"),
        col("n_words"), col("n_occurrences"))
      .orderBy(col("bucket"))

  val c75Sql: String =
    s"""SELECT bucket, CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS freq_lo,
       |  COUNT(*) AS n_words, CAST(SUM(f) AS BIGINT) AS n_occurrences
       |FROM (
       |  SELECT f, CAST(length(printf('%b', f)) - 1 AS INTEGER) AS bucket
       |  FROM (
       |    SELECT w, COUNT(*) AS f
       |    FROM (SELECT unnest($wordsDuck) AS w FROM documents)
       |    WHERE w <> '' GROUP BY w))
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  // ------------------------- C76 retrieval chunking with overlap
  /** C76: sliding-window CHUNKING — the retrieval/context-window prep
    * step between raw documents and an embedding or packing stage
    * (C23/C41 pack whole docs into budgets; this SPLITS each doc into
    * overlapping windows so no boundary-straddling passage is lost):
    * fixed window of [[c76Size]] words at stride [[c76Stride]] (tail
    * window shorter), each chunk carrying its position and a content
    * hash — the key chunk-level dedup and caching run on downstream.
    *
    * Scale shape: one scan, the window enumeration is a per-row
    * `sequence`/`explode` (output rows ≈ |corpus words| / stride — a
    * LINEAR blow-up bounded by the stride, no shuffle until the
    * deterministic output sort, which at scale is the write
    * partitioning). Invariants spec-pinned: strides cover every word,
    * consecutive chunks overlap by size − stride, the hash matches the
    * joined window text in both engines.
    */
  private val c76Size = 32
  private val c76Stride = 24

  /** The chunk frame (doc_id, source, chunk_idx, start_word,
    * n_chunk_words, chunk_hash) — C76's gate output plus provenance,
    * shared with C77's cache planning.
    */
  private def c76Chunks(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("source"), expr(wordsSpark).as("w"))
      .withColumn("n", size(col("w")))
      .select(col("doc_id"), col("source"), col("w"), col("n"),
        posexplode(expr(s"sequence(1, n, $c76Stride)")).as(Seq("chunk_idx", "start_word")))
      .select(col("doc_id"), col("source"), col("chunk_idx"), col("start_word"),
        expr(s"least($c76Size, n - start_word + 1)").cast("long").as("n_chunk_words"),
        expr(s"${h64Spark(s"concat_ws(' ', slice(w, start_word, $c76Size))")}").as("chunk_hash"))

  def c76Chunk(s: SparkSession, d: String): DataFrame =
    c76Chunks(s, d)
      .select(col("doc_id"), col("chunk_idx"), col("start_word"),
        col("n_chunk_words"), col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val c76Sql: String =
    s"""SELECT doc_id,
       |  CAST(i - 1 AS INTEGER) AS chunk_idx,
       |  CAST((i - 1) * $c76Stride + 1 AS INTEGER) AS start_word,
       |  CAST(least($c76Size, n - ((i - 1) * $c76Stride + 1) + 1) AS BIGINT) AS n_chunk_words,
       |  ${h64Duck(s"array_to_string(w[(i - 1) * $c76Stride + 1 : least((i - 1) * $c76Stride + $c76Size, n)], ' ')")} AS chunk_hash
       |FROM (
       |  SELECT doc_id, w, len(w) AS n,
       |    unnest(range(1, CAST(ceil(len(w) / $c76Stride.0) AS BIGINT) + 1)) AS i
       |  FROM (SELECT doc_id, $wordsDuck AS w FROM documents))
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------- C77 embedding-cache hit-rate planning
  /** C77: EMBEDDING-CACHE planning over the chunk stream — the cost
    * readout run before paying for an embedding pass (chunk embeddings
    * are cached by content hash; re-embedding an already-cached chunk is
    * pure waste): against the history side's chunk-hash set (docs below
    * the shared C67 80/20 split — the "already embedded" state), the
    * incoming side reports per source: chunks total, cache HITS
    * (hash already embedded), and the DISTINCT fresh hashes — the
    * number of embedding calls actually owed (within-increment
    * duplicates collapse too, so n_to_embed ≤ misses).
    *
    * Scale shape: C47's incremental-state discipline on the chunk
    * table — the history side is a hash-keyed state table probed by an
    * equi-join (bucketed at scale, C72's layout), never rescanned text;
    * the readout is one aggregate over the joined increment.
    */
  def c77EmbedCachePlan(s: SparkSession, d: String): DataFrame = {
    val split = graft.ops.Dedup.c67SplitFor(s, d)
    val chunks = c76Chunks(s, d)
    val cached = chunks.where(col("doc_id") < split)
      .select(col("chunk_hash")).distinct()
      .withColumn("hit", lit(1))
    chunks.where(col("doc_id") >= split)
      .join(cached, Seq("chunk_hash"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        count(col("hit")).as("n_cached"),
        countDistinct(when(col("hit").isNull, col("chunk_hash"))).as("n_to_embed"))
      .orderBy(col("source"))
  }

  val c77Sql: String = {
    val chunkExpr =
      s"""SELECT doc_id, source,
         |  ${h64Duck(s"array_to_string(w[(i - 1) * $c76Stride + 1 : least((i - 1) * $c76Stride + $c76Size, n)], ' ')")} AS chunk_hash
         |FROM (
         |  SELECT doc_id, source, w, len(w) AS n,
         |    unnest(range(1, CAST(ceil(len(w) / $c76Stride.0) AS BIGINT) + 1)) AS i
         |  FROM (SELECT doc_id, source, $wordsDuck AS w FROM documents))""".stripMargin
    // the oracle re-derives the same relative split: 80% of (max id + 1)
    s"""WITH chunks AS ($chunkExpr),
       |split AS (SELECT (MAX(doc_id) + 1) * 4 // 5 AS cut FROM documents),
       |cached AS (
       |  SELECT DISTINCT chunk_hash FROM chunks, split WHERE doc_id < cut),
       |incoming AS (
       |  SELECT c.source, c.chunk_hash,
       |    EXISTS (SELECT 1 FROM cached h WHERE h.chunk_hash = c.chunk_hash) AS hit
       |  FROM chunks c, split WHERE c.doc_id >= cut)
       |SELECT source, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_cached,
       |  COUNT(DISTINCT CASE WHEN NOT hit THEN chunk_hash END) AS n_to_embed
       |FROM incoming GROUP BY source ORDER BY source""".stripMargin
  }

  // ------------------------- C102 contamination-aware mixture plan
  /** C102: the mixture planned on the CLEAN corpus — the pipeline
    * ORDERING constraint C28 alone can't see: waterfilling quotas on raw
    * availability overshoots when part of a domain is contaminated (the
    * plan promises tokens that decontamination then removes; the
    * materialized mix silently under-delivers the binding domain and the
    * ratios drift). Here the C101 closure (direct + transitive over dup
    * clusters) is computed FIRST, per-domain availability splits into
    * raw vs clean, and C28's integer waterfilling runs on the CLEAN
    * side; the raw column rides along so the overshoot a dirty plan
    * would have baked in is visible per domain.
    *
    * Scale shape: the dirty-doc frame is |contaminated| (tiny — C101's
    * scale note), broadcast-joined onto the one corpus pass C28 already
    * pays; the plan math stays on the |domains|-row aggregate (C28's
    * bounded-frame window doctrine).
    */
  def c102CleanMixture(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (direct, transitive) = Dedup.closureParts(
      Dedup.contamFps(s, d), Dedup.c18DupClusters(s, d))
    val dirty = direct.unionAll(transitive).distinct()
      .withColumn("dirty", lit(1L))
    docs(s, d)
      .where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), expr(c28DomainSql).as("domain"),
        expr(s"size($wordsSpark)").as("nt"))
      .join(broadcast(dirty), Seq("doc_id"), "left")
      .groupBy(col("domain"))
      .agg(sum(col("nt")).as("avail_raw"),
        sum(when(col("dirty").isNull, col("nt")).otherwise(lit(0L)))
          .as("avail_clean"))
      .withColumn("wt", expr(c28WtSql).cast("bigint"))
      .withColumn("t_total", min(expr("avail_clean * 10 DIV wt"))
        .over(Window.partitionBy()))
      .select(col("domain"), col("wt"), col("avail_raw"), col("avail_clean"),
        expr("t_total * wt DIV 10").as("take_tokens"),
        expr("(t_total * wt DIV 10) * 10000 DIV avail_clean").as("rate_bp"))
      .orderBy(col("domain"))
  }

  lazy val c102Sql: String = {
    val closure = graft.ops.Dedup.c101ClosureCtes
    s"""WITH RECURSIVE ${closure},
       |dirtydocs AS (
       |  SELECT doc_id FROM direct UNION SELECT doc_id FROM trans),
       |t AS (
       |  SELECT doc_id, $c28DomainSql AS domain, len($wordsDuck) AS nt
       |  FROM documents WHERE doc_id % 97 <> 0),
       |a AS (
       |  SELECT domain, CAST(SUM(nt) AS BIGINT) AS avail_raw,
       |    CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM dirtydocs)
       |      THEN 0 ELSE nt END) AS BIGINT) AS avail_clean
       |  FROM t GROUP BY domain),
       |w AS (SELECT domain, avail_raw, avail_clean,
       |        CAST($c28WtSql AS BIGINT) AS wt FROM a),
       |m AS (SELECT *, MIN(avail_clean * 10 // wt) OVER () AS t_total FROM w)
       |SELECT domain, wt, avail_raw, avail_clean,
       |  CAST(t_total * wt // 10 AS BIGINT) AS take_tokens,
       |  CAST((t_total * wt // 10) * 10000 // avail_clean AS BIGINT) AS rate_bp
       |FROM m ORDER BY domain""".stripMargin
  }

  // ------------------------- C93 quality-signal rank fusion (Borda)
  /** C93: RANK FUSION of heterogeneous quality signals — how a pipeline
    * combines incommensurable scores (chars, lexical diversity, stopword
    * density) into one keep-priority without inventing magic weights:
    * rank each signal independently, Borda-fuse (score = Σᵢ N − rankᵢ —
    * the integer form of mean-rank fusion; reciprocal-rank fusion is the
    * same shape with a different discount). All-integer end to end.
    *
    * The scale point is HOW the ranks are computed: a global
    * `RANK() OVER (ORDER BY …)` is a global sort — at 100 TB, a
    * single-partition window. But each signal here has a BOUNDED integer
    * domain (basis points ∈ [0,10⁴]; char lengths bounded by the doc-size
    * cap), so competition rank ≡ 1 + Σ counts of strictly-better VALUES:
    * one map-side-combined value histogram per signal (all three in one
    * shuffle via a melted (signal, value) key), a running sum over the
    * tiny per-signal histogram (window PARTITIONED by signal, frame =
    * |distinct values| ≪ corpus — B30's bounded-frame doctrine), and a
    * broadcast join back. No global sort anywhere; the oracle computes
    * the very RANK() the histogram path replaces — equality proves the
    * two formulations identical, tie semantics included.
    */
  def c93RankFusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = docs(s, d)
      .withColumn("w", expr(wordsSpark))
      // empty/whitespace docs: DIV 0 → NULL s_div/s_stop, and the two
      // rank formulations diverge on NULLs (Spark drops the null join
      // key; the oracle's RANK() places it NULLS LAST) — exclude them
      // identically in both engines
      .where(size(col("w")) >= 1)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("s_len"),
        expr("CAST(size(array_distinct(w)) * 10000 DIV size(w) AS BIGINT)")
          .as("s_div"),
        expr(s"CAST(size(filter(w, x -> x IN $stopEn)) * 10000 DIV size(w) AS BIGINT)")
          .as("s_stop"))
    val melted = sig.select(col("doc_id"), explode(map(
      lit("len"), col("s_len"), lit("div"), col("s_div"),
      lit("stop"), col("s_stop"))).as(Seq("sig", "v")))
    val w = Window.partitionBy(col("sig")).orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = melted.groupBy(col("sig"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", coalesce(sum(col("cnt")).over(w), lit(0L)) + 1L)
      .select(col("sig"), col("v"), col("rk"))
    val n = sig.agg(count(lit(1)).as("n_docs"))
    melted.join(broadcast(ranks), Seq("sig", "v"))
      .groupBy(col("doc_id"))
      .agg(max(when(col("sig") === "len", col("rk"))).as("r_len"),
        max(when(col("sig") === "div", col("rk"))).as("r_div"),
        max(when(col("sig") === "stop", col("rk"))).as("r_stop"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("r_len"), col("r_div"), col("r_stop"),
        (lit(3L) * col("n_docs") - col("r_len") - col("r_div") - col("r_stop"))
          .as("borda"))
      .orderBy(col("doc_id"))
  }

  val c93Sql: String =
    s"""WITH sig AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS s_len,
       |    CAST(len(list_distinct(w)) * 10000 // len(w) AS BIGINT) AS s_div,
       |    CAST(len(list_filter(w, x -> x IN $stopEn)) * 10000 // len(w) AS BIGINT) AS s_stop
       |  FROM (SELECT doc_id, text, $wordsDuck AS w FROM documents)
       |  WHERE len(w) >= 1),
       |r AS (
       |  SELECT doc_id,
       |    CAST(RANK() OVER (ORDER BY s_len DESC) AS BIGINT) AS r_len,
       |    CAST(RANK() OVER (ORDER BY s_div DESC) AS BIGINT) AS r_div,
       |    CAST(RANK() OVER (ORDER BY s_stop DESC) AS BIGINT) AS r_stop,
       |    COUNT(*) OVER () AS n
       |  FROM sig)
       |SELECT doc_id, r_len, r_div, r_stop,
       |  CAST(3 * n - r_len - r_div - r_stop AS BIGINT) AS borda
       |FROM r ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c93_rank_fusion" -> (c93RankFusion _),
    "c102_clean_mixture" -> (c102CleanMixture _),
    "c75_freq_spectrum" -> (c75FreqSpectrum _),
    "c76_chunk" -> (c76Chunk _),
    "c77_embed_cache_plan" -> (c77EmbedCachePlan _),
    "c78_index_search" -> (c78IndexSearch _),
    "c79_phrase_search" -> (c79PhraseSearch _),
    "c74_source_vocab_sim" -> (c74SourceVocabSim _),
    "c55_importance_weight" -> (c55ImportanceWeight _),
    "c58_fertility" -> (c58Fertility _),
    "c59_mixture_materialize" -> (c59MixtureMaterialize _),
    "c80_blocklist_filter" -> (c80BlocklistFilter _),
    "c81_temperature_mix" -> (c81TemperatureMix _),
    "c83_length_outliers" -> (c83LengthOutliers _),
    "c87_compression_ratio" -> (c87CompressionRatio _),
    "c91_fim_construct" -> (c91FimConstruct _),
    "c84_template_prefixes" -> (c84TemplatePrefixes _),
    "c60_calibrated_cut" -> (c60CalibratedCut _),
    "c62_snapshot_diff" -> (c62SnapshotDiff _),
    "c63_exact_k_sample" -> (c63ExactKSample _),
    "c66_familiarity" -> (c66Familiarity _),
    "c104_ngram_lm" -> (c104NgramLm _),
    "c105_perplexity_mixture" -> (c105PerplexityMixture _),
    "c53_coverage_curve" -> (c53CoverageCurve _),
    "c51_budget_select" -> (c51BudgetSelect _),
    "c50_tokenizer_versions" -> (c50TokenizerVersions _),
    "c48_datasheet_quantiles" -> (c48DatasheetQuantiles _),
    "c44_corpus_datasheet" -> (c44CorpusDatasheet _),
    "c43_gopher_rules" -> (c43GopherRules _),
    "c103_classifier_train" -> (c103ClassifierTrain _),
    "c42_sequence_assemble" -> (c42SequenceAssemble _),
    "c41_bpe_packing" -> (c41BpePacking _),
    "c39_classifier_score" -> (c39ClassifierScore _),
    "c37_bpe_encode" -> (c37BpeEncode _),
    "c32_bpe_train" -> (c32BpeTrain _),
    "c31_overlap_score" -> (c31OverlapScore _),
    "c30_bpe_pairs" -> (c30BpePairs _),
    "c28_mixture_plan" -> (c28MixturePlan _),
    "c26_pii_redact"  -> (c26PiiRedact _),
    "c27_rare_token_score" -> (c27RareTokenScore _),
    "c8_lang_id"      -> (c8LangId _),
    "c9_text_quality" -> (c9TextQuality _),
    "c10_token_count" -> (c10TokenCount _),
    "c11_fingerprint" -> (c11Fingerprint _),
    "c15_top_ngrams"  -> (c15TopNgrams _),
    "c17_keyword_search" -> (c17KeywordSearch _),
    "c19_decontaminate"  -> (c19Decontaminate _),
    "c25_decontaminate_bloom" -> (c25DecontaminateBloom _),
    "c21_repetition_stats" -> (c21RepetitionStats _),
    "c22_stratified_sample" -> (c22StratifiedSample _),
    "c23_sequence_packing"  -> (c23SequencePacking _)
  )

  // def, not val: c87's oracle embeds the sidecar path recorded when the
  // c87 gate last ran, so the map must be (re)built when Verify dumps it.
  def oracle: Map[String, String] = Map(
    "c87_compression_ratio" -> c87Sql,
    "c75_freq_spectrum" -> c75Sql,
    "c76_chunk" -> c76Sql,
    "c77_embed_cache_plan" -> c77Sql,
    // C17's oracle verbatim — two physical strategies, one answer
    "c78_index_search" -> c17Sql,
    "c79_phrase_search" -> c79Sql,
    "c74_source_vocab_sim" -> c74Sql,
    "c55_importance_weight" -> c55Sql,
    "c58_fertility" -> c58Sql,
    "c59_mixture_materialize" -> c59Sql,
    "c80_blocklist_filter" -> c80Sql,
    "c81_temperature_mix" -> c81Sql,
    "c83_length_outliers" -> c83Sql,
    "c91_fim_construct" -> c91Sql,
    "c93_rank_fusion" -> c93Sql,
    "c102_clean_mixture" -> c102Sql,
    "c84_template_prefixes" -> c84Sql,
    "c60_calibrated_cut" -> c60Sql,
    "c62_snapshot_diff" -> c62Sql,
    "c63_exact_k_sample" -> c63Sql,
    "c66_familiarity" -> c66Sql,
    "c104_ngram_lm" -> c104Sql,
    "c105_perplexity_mixture" -> c105Sql,
    "c53_coverage_curve" -> c53Sql,
    "c51_budget_select" -> c51Sql,
    "c50_tokenizer_versions" -> c50Sql,
    "c48_datasheet_quantiles" -> c48Sql,
    "c44_corpus_datasheet" -> c44Sql,
    "c43_gopher_rules" -> c43Sql,
    "c103_classifier_train" -> c103Sql,
    "c42_sequence_assemble" -> c42Sql,
    "c41_bpe_packing" -> c41Sql,
    "c39_classifier_score" -> c39Sql,
    "c37_bpe_encode" -> c37Sql,
    "c32_bpe_train" -> c32Sql,
    "c31_overlap_score" -> c31Sql,
    "c30_bpe_pairs" -> c30Sql,
    "c28_mixture_plan" -> c28Sql,
    "c26_pii_redact"  -> c26Sql,
    "c27_rare_token_score" -> c27Sql,
    "c8_lang_id"      -> c8Sql,
    "c9_text_quality" -> c9Sql,
    "c10_token_count" -> c10Sql,
    "c11_fingerprint" -> c11Sql,
    "c15_top_ngrams"  -> c15Sql,
    "c17_keyword_search" -> c17Sql,
    "c19_decontaminate"  -> c19Sql,
    "c25_decontaminate_bloom" -> c19Sql,
    "c21_repetition_stats" -> c21Sql,
    "c22_stratified_sample" -> c22Sql,
    "c23_sequence_packing"  -> c23Sql
  )
}
