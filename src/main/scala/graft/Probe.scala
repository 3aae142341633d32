package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the codegen'd text kernels (docs/PERF.md): builds an
  * N× copy of the sf0.1 documents corpus (doc_id offset per copy, so
  * hashes/dedup behave like real distinct docs where the id matters) and
  * times each kernel as a full materialized pass. Usage:
  * `runMain graft.Probe [multiplier]` (default 20 → ~100k docs / ~30M
  * words at sf0.1).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = core.Tables.documents(spark, "/root/testdata/sf0.1")
    val dir = java.nio.file.Files.createTempDirectory("graft_probe").toString
    (0 until mult)
      .map(k => src.withColumn("doc_id", col("doc_id") + lit(k.toLong * 10000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    println(s"probe corpus: $n docs (${mult}x sf0.1)")

    def time(name: String)(df: DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("c39 HashedClassScore x3")(docs.select(
      functions.HashedClassScore(col("text"), "wlo:"),
      functions.HashedClassScore(col("text"), "wmid:"),
      functions.HashedClassScore(col("text"), "whi:")))
    time("c2 MinHashSig(8)")(docs.select(functions.MinHashSig(col("text"), 8)))
    time("c3 SimHashSig(32)")(docs.select(functions.SimHashSig(col("text"), "sh:", 32)))
    time("c21 RepetitionStats")(docs.select(functions.RepetitionStats(col("text"))))
    time("p8 WordShingleHashes")(docs.select(
      functions.WordShingleHashes(col("text"), 8, "p8:")))
    spark.stop()
  }
}
