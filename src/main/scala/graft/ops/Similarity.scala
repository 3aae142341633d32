package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import TextExprs._

/** C6-C7: approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors), SURVEY.md §2.C.
  *
  * C6 is the brute-force baseline: a tiny broadcast query set against the
  * corpus — the correct plan at ANY corpus size (queries broadcast, corpus
  * streams, per-query top-k via window). C7 is the scale path: deterministic
  * random-hyperplane LSH buckets make the candidate join O(bucket size).
  */
object Similarity {

  private val kNN = 10
  private val nQueries = 8 // query set: vec_id < 8

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))

  // ----------------------------------------- C6 brute-force cosine top-k
  def c6AnnBruteforce(s: SparkSession, d: String): DataFrame = {
    val e = vecs(s, d)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val corpus = e.where(col("vec_id") >= nQueries)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        expr(cosSpark("qv", "v")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= kNN)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rk"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  val c6Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q_id, vec_id,
       |    ${cosDuck("qv", "v")} AS cos_sim
       |  FROM e CROSS JOIN q WHERE vec_id >= $nQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id AS n_id, rk, cos_sim FROM ranked
       |WHERE rk <= $kNN ORDER BY q_id, rk""".stripMargin

  // --------------------------------------------- C7 LSH-bucketed ANN
  /** Random-hyperplane LSH: 4 deterministic md5-derived hyperplanes → 16
    * buckets; candidates share the query's bucket; top-5 within bucket.
    * Hyperplane constants are computed once at plan build (same md5 math
    * as the engines) and inlined into BOTH backends as literals.
    */
  private val nPlanes = 4
  private val kLsh = 5

  /** plane(j)(i) ∈ [-1, 1] from md5("pl j : i") — deterministic. */
  private[ops] def plane(j: Int): Array[Double] =
    Array.tabulate(64)(i => ((h64Local(s"pl$j:$i") % 2001L) - 1000L) / 1000.0)

  private def planeLitSpark(p: Array[Double]): String =
    p.map(x => s"CAST($x AS DOUBLE)").mkString("array(", ", ", ")")

  private def planeLitDuck(p: Array[Double]): String =
    p.mkString("([", ", ", "]::DOUBLE[])")

  private def bucketSpark: String =
    (0 until nPlanes).map { j =>
      s"(CASE WHEN ${dotSpark("v", planeLitSpark(plane(j)))} >= 0.0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def bucketDuck: String =
    (0 until nPlanes).map { j =>
      s"(CASE WHEN ${dotDuck("v", planeLitDuck(plane(j)))} >= 0.0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def c7AnnLsh(s: SparkSession, d: String): DataFrame = {
    val bucketed = vecs(s, d).withColumn("bucket", expr(bucketSpark))
    val q = bucketed.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val corpus = bucketed.where(col("vec_id") >= nQueries)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.join(broadcast(q), "bucket")
      .select(col("q_id"), col("vec_id"),
        expr(cosSpark("qv", "v")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= kLsh)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rk"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  val c7Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, v, $bucketDuck AS bucket
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
       |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM e WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q_id, e.vec_id AS vec_id,
       |    ${cosDuck("qv", "v")} AS cos_sim
       |  FROM e JOIN q USING (bucket) WHERE e.vec_id >= $nQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id AS n_id, rk, cos_sim FROM ranked
       |WHERE rk <= $kLsh ORDER BY q_id, rk""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c6_ann_bruteforce" -> (c6AnnBruteforce _),
    "c7_ann_lsh"        -> (c7AnnLsh _)
  )

  val oracle: Map[String, String] = Map(
    "c6_ann_bruteforce" -> c6Sql,
    "c7_ann_lsh"        -> c7Sql
  )
}
