package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the MinHash-LSH near-dup path (docs/PERF.md): the
  * 100 TB question for any near-dup design is whether CANDIDATE PAIRS
  * grow with the duplication actually present (linear) or with the
  * corpus squared (the all-pairs cliff). This synthesizes corpora with a
  * FIXED duplication rate (2% of docs are exact twins of a neighbor, the
  * rest unique — so true near-dup pairs = n/50 by construction), runs
  * the PRODUCTION kernel ([[graft.ops.Dedup.bandsOf]] →
  * `pairsFromBands`: codegen'd MinHashSig, band equi-buckets, in-bucket
  * pair expansion), and reports candidate pairs + wall time per size.
  * Linear growth in both — and candidates ≈ planted pairs, i.e. ~zero
  * false-positive collisions at 8 lanes × 4 bands — is the evidence the
  * bucket-first design stands on. Usage: `runMain graft.ProbeLsh [n …]`.
  */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(500000, 1000000, 2000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sizes.foreach { n =>
      // doc id%50==1 copies doc id-1's text (seed = id-1); all others
      // unique. 24 pseudo-words of 8 hex chars per doc, derived from
      // (seed, position) — deterministic, no data files needed.
      val docs = spark.range(n).select(col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(0, 23), i ->
               |substr(md5(concat(CAST(IF(id % 50 = 1 AND id > 0, id - 1, id)
               |AS STRING), ':', CAST(i AS STRING))), 1, 8)))"""
          .stripMargin.replace("\n", " ")).as("text"))
      val t0 = System.nanoTime()
      val pairs = ops.Dedup.pairsFromBands(ops.Dedup.bandsOf(docs)).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val planted = n / 50
      println(f"[probe-lsh] n=$n%9d docs  planted=$planted%8d  " +
        f"candidates=$pairs%8d  time=$dt%7.2fs  (${n / dt}%.0f docs/s)")
    }
    spark.stop()
  }
}
