package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.DotProduct
import TextExprs._

/** C6-C7: approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors), SURVEY.md §2.C.
  *
  * C6 is the brute-force baseline: a tiny broadcast query set against the
  * corpus — the correct plan at ANY corpus size (queries broadcast, corpus
  * streams, per-query top-k via window). C7 is the scale path: deterministic
  * random-hyperplane LSH buckets make the candidate join O(bucket size).
  *
  * Vectors are normalized ONCE in a projection below the join (cosine =
  * single dot product per pair), and dot products run in a codegen'd
  * Catalyst expression ([[graft.functions.DotProduct]]) — the interpreted
  * higher-order-function fold was 25× slower at sf0.1. The DuckDB oracle
  * mirrors the same normalize-then-dot op order, so doubles stay
  * bit-identical.
  */
object Similarity {

  private val kNN = 10
  private val nQueries = 8 // query set: vec_id < 8
  private val nPlanes = 4
  private val kLsh = 5

  /** plane(j)(i) ∈ [-1, 1] from md5("pl j : i") — deterministic, computed
    * at plan build and inlined into both backends.
    */
  private[ops] def plane(j: Int): Array[Double] =
    Array.tabulate(64)(i => ((h64Local(s"pl$j:$i") % 2001L) - 1000L) / 1000.0)

  private def planeCol(j: Int): Column = array(plane(j).map(lit).toIndexedSeq: _*)

  private def planeLitDuck(p: Array[Double]): String =
    p.mkString("([", ", ", "]::DOUBLE[])")

  /** vec_id, nv (unit-normalized), bucket (LSH hyperplane signs) — the one
    * shared projection every similarity op builds on.
    */
  private[ops] def prepared(s: SparkSession, d: String): DataFrame = {
    val bucket = (0 until nPlanes).map { j =>
      when(DotProduct(col("v"), planeCol(j)) >= 0.0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    Tables.embeddings(s, d)
      .select(col("vec_id"), expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .withColumn("nrm", sqrt(DotProduct(col("v"), col("v"))))
      .select(col("vec_id"),
        expr("transform(v, x -> x / nrm)").as("nv"),
        bucket.as("bucket"))
  }

  /** Oracle CTE mirroring [[prepared]] — same op order. */
  private[ops] val preparedDuck: String = {
    val bucket = (0 until nPlanes).map { j =>
      s"(CASE WHEN ${dotDuck("v", planeLitDuck(plane(j)))} >= 0.0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    s"""prep AS (
       |  SELECT vec_id, list_transform(v, x -> x / nrm) AS nv, $bucket AS bucket
       |  FROM (SELECT vec_id, v, sqrt(${norm2Duck("v")}) AS nrm
       |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)))""".stripMargin
  }

  /** Normalized-vector dot in the oracle (cosine of unit vectors). */
  private[ops] def nvDotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> $a[i] * $b[i])), (s, x) -> s + x)"

  // ----------------------------------------- C6 brute-force cosine top-k
  def c6AnnBruteforce(s: SparkSession, d: String): DataFrame = {
    val e = prepared(s, d)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("nv").as("qnv"))
    val corpus = e.where(col("vec_id") >= nQueries)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        DotProduct(col("qnv"), col("nv")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= kNN)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rk"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  val c6Sql: String =
    s"""WITH $preparedDuck,
       |q AS (SELECT vec_id AS q_id, nv AS qnv FROM prep WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q_id, vec_id, ${nvDotDuck("qnv", "nv")} AS cos_sim
       |  FROM prep CROSS JOIN q WHERE vec_id >= $nQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id AS n_id, rk, cos_sim FROM ranked
       |WHERE rk <= $kNN ORDER BY q_id, rk""".stripMargin

  // --------------------------------------------- C7 LSH-bucketed ANN
  def c7AnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = prepared(s, d)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("nv").as("qnv"), col("bucket"))
    val corpus = e.where(col("vec_id") >= nQueries)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.join(broadcast(q), "bucket")
      .select(col("q_id"), col("vec_id"),
        DotProduct(col("qnv"), col("nv")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= kLsh)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rk"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  val c7Sql: String =
    s"""WITH $preparedDuck,
       |q AS (SELECT vec_id AS q_id, nv AS qnv, bucket FROM prep WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q_id, prep.vec_id AS vec_id, ${nvDotDuck("qnv", "nv")} AS cos_sim
       |  FROM prep JOIN q USING (bucket) WHERE prep.vec_id >= $nQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id AS n_id, rk, cos_sim FROM ranked
       |WHERE rk <= $kLsh ORDER BY q_id, rk""".stripMargin

  // ------------------------------------------- C13 multi-probe LSH ANN
  /** Multi-probe LSH: each query searches its own bucket PLUS every bucket
    * at hamming distance 1 in sign-space (flip one hyperplane) — the
    * standard recall recovery that costs probe-count on the tiny query
    * side and nothing on the corpus layout. A neighbor lives in exactly
    * one bucket, so probes never duplicate candidates.
    */
  def c13AnnMultiprobe(s: SparkSession, d: String): DataFrame = {
    val e = prepared(s, d)
    val probeCols = col("bucket") +:
      (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1 << j)))
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("nv").as("qnv"),
        explode(array(probeCols: _*)).as("bucket"))
    val corpus = e.where(col("vec_id") >= nQueries)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.join(broadcast(q), "bucket")
      .select(col("q_id"), col("vec_id"),
        DotProduct(col("qnv"), col("nv")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= kLsh)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rk"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  val c13Sql: String = {
    val probes = ("bucket" +: (0 until nPlanes).map(j => s"xor(bucket, ${1 << j})"))
      .mkString("[", ", ", "]")
    s"""WITH $preparedDuck,
       |q AS (SELECT vec_id AS q_id, nv AS qnv, unnest($probes) AS bucket
       |      FROM prep WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q_id, prep.vec_id AS vec_id, ${nvDotDuck("qnv", "nv")} AS cos_sim
       |  FROM prep JOIN q USING (bucket) WHERE prep.vec_id >= $nQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id AS n_id, rk, cos_sim FROM ranked
       |WHERE rk <= $kLsh ORDER BY q_id, rk""".stripMargin
  }

  // ------------------------------------------------- C14 IVF-flat ANN
  /** IVF (inverted-file) ANN: corpus vectors are assigned to their nearest
    * of [[nCentroids]] seed centroids (vectors 100..115 of the corpus —
    * deterministic, no k-means iterations so both engines agree exactly);
    * a query probes its [[nProbe]] nearest centroid lists and ranks only
    * those. At scale the centroid id is the partition key: each query
    * touches nProbe/nCentroids of the corpus.
    */
  private val nCentroids = 16
  private val centroidBase = 100 // vec_ids [100, 116) serve as seeds
  private val nProbe = 2
  private val kIvf = 5

  /** (vec_id, nv, cent) — every vector tagged with its nearest seed.
    *
    * ZERO-exchange assignment: the 16 seed vectors are a driver-side
    * constant (one 16-row pushdown-filtered lookup, like a page fetch),
    * inlined as literals so the argmax is a single narrow projection —
    * all 16 dot products + first-position-of-max computed per row inside
    * codegen. (The previous form crossJoined the corpus with the seeds
    * and ranked through a Window: a 16×-expanded corpus shuffled to
    * compute an argmin that needs no shuffle.) `array_position` returns
    * the FIRST max index, and the seed array is sid-ascending, so ties
    * break exactly like the oracle's ORDER BY sim DESC, sid.
    */
  private def ivfAssigned(s: SparkSession, d: String): DataFrame = {
    val e = prepared(s, d)
    val seedRows = e.where(col("vec_id") >= centroidBase &&
        col("vec_id") < centroidBase + nCentroids)
      .select(col("vec_id"), col("nv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val simCols = seedRows.map { case (_, sv) =>
      DotProduct(col("nv"), array(sv.map(lit).toIndexedSeq: _*))
    }
    val sids = array(seedRows.map(s => lit(s._1)).toIndexedSeq: _*)
    e.select(col("vec_id"), col("nv"),
        array(simCols.toIndexedSeq: _*).as("sims"))
      .select(col("vec_id"), col("nv"),
        element_at(sids, array_position(col("sims"), array_max(col("sims"))).cast("int"))
          .as("cent"))
  }

  private val ivfAssignedDuck: String =
    s"""seeds AS (SELECT vec_id AS sid, nv AS sv FROM prep
       |          WHERE vec_id >= $centroidBase AND vec_id < ${centroidBase + nCentroids}),
       |assigned AS (
       |  SELECT vec_id, nv, sid AS cent FROM (
       |    SELECT prep.vec_id AS vec_id, nv, sid,
       |      ROW_NUMBER() OVER (PARTITION BY prep.vec_id
       |        ORDER BY ${nvDotDuck("nv", "sv")} DESC, sid) AS rk
       |    FROM prep CROSS JOIN seeds)
       |  WHERE rk = 1)""".stripMargin

  def c14AnnIvf(s: SparkSession, d: String): DataFrame = {
    val assigned = ivfAssigned(s, d)
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("qsim").desc, col("cent"))
    // per-query probe list: its nProbe nearest centroids
    val e = prepared(s, d)
    val seeds = e.where(col("vec_id") >= centroidBase &&
        col("vec_id") < centroidBase + nCentroids)
      .select(col("vec_id").as("cent"), col("nv").as("sv"))
    val probes = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("nv").as("qnv"))
      .crossJoin(broadcast(seeds))
      .select(col("q_id"), col("qnv"), col("cent"),
        DotProduct(col("qnv"), col("sv")).as("qsim"))
      .withColumn("prk", row_number().over(wq))
      .where(col("prk") <= nProbe)
      .select(col("q_id"), col("qnv"), col("cent"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    assigned.where(col("vec_id") >= nQueries)
      .join(broadcast(probes), "cent")
      .select(col("q_id"), col("vec_id"),
        DotProduct(col("qnv"), col("nv")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= kIvf)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rk"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  val c14Sql: String =
    s"""WITH $preparedDuck,
       |$ivfAssignedDuck,
       |probes AS (
       |  SELECT q_id, qnv, cent FROM (
       |    SELECT prep.vec_id AS q_id, nv AS qnv, sid AS cent,
       |      ROW_NUMBER() OVER (PARTITION BY prep.vec_id
       |        ORDER BY ${nvDotDuck("nv", "sv")} DESC, sid) AS prk
       |    FROM prep CROSS JOIN seeds WHERE prep.vec_id < $nQueries)
       |  WHERE prk <= $nProbe),
       |scored AS (
       |  SELECT q_id, assigned.vec_id AS vec_id, ${nvDotDuck("qnv", "nv")} AS cos_sim
       |  FROM assigned JOIN probes USING (cent) WHERE assigned.vec_id >= $nQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id AS n_id, rk, cos_sim FROM ranked
       |WHERE rk <= $kIvf ORDER BY q_id, rk""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c6_ann_bruteforce"  -> (c6AnnBruteforce _),
    "c7_ann_lsh"         -> (c7AnnLsh _),
    "c13_ann_multiprobe" -> (c13AnnMultiprobe _),
    "c14_ann_ivf"        -> (c14AnnIvf _)
  )

  val oracle: Map[String, String] = Map(
    "c6_ann_bruteforce"  -> c6Sql,
    "c7_ann_lsh"         -> c7Sql,
    "c13_ann_multiprobe" -> c13Sql,
    "c14_ann_ivf"        -> c14Sql
  )
}
