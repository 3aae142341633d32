package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Scale probe for ANN serving (docs/PERF.md): how much of the corpus
  * does one query TOUCH? Brute-force scoring touches all N vectors per
  * query; the C7 bucket layout touches one bucket (~N/2^planes expected).
  * This synthesizes N pseudo-random unit vectors (pure-arithmetic lanes,
  * no md5 — generation must not dominate the measurement), buckets them
  * with the PRODUCTION hyperplanes ([[graft.ops.Similarity.c7Plane]]),
  * and times brute vs bucket-only top-5 serving for 8 queries, reporting
  * the measured candidate fraction and the recall of the bucket path
  * (via the SAME [[graft.ops.Similarity.recallFrame]] harness C94 and
  * D36 use). Usage: `runMain graft.ProbeAnn [n ...]`.
  */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(250000, 1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nPlanes = ops.Similarity.c7NPlanes
    val nQ = 8
    val k = 5

    sizes.foreach { n =>
      val raw = spark.range(n).select(col("id").as("vec_id"), expr(
        """transform(sequence(0, 63), i ->
          |CAST((id * 2654435761 + i * 40503 + (id + i) * (id + i) * 73) % 2001
          |- 1000 AS DOUBLE) / 1000.0)""".stripMargin.replace("\n", " "))
        .as("v"))
      val bucket = (0 until nPlanes).map { j =>
        val p = ops.Similarity.c7Plane(j)
        when(DotProduct(col("nv"), array(p.map(lit).toIndexedSeq: _*)) >= 0.0,
          lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      val prep = raw
        .withColumn("nrm", sqrt(DotProduct(col("v"), col("v"))))
        .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("nv"))
        .withColumn("bucket", bucket)
        .localCheckpoint(true)
      val q = prep.where(col("vec_id") < nQ)
        .select(col("vec_id").as("q_id"), col("nv").as("qnv"), col("bucket"))
        .localCheckpoint(true)
      val corpus = prep.where(col("vec_id") >= nQ)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))

      def topk(cands: DataFrame): DataFrame = cands
        .select(col("q_id"), col("vec_id"),
          DotProduct(col("qnv"), col("nv")).as("cos"))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
        .select(col("q_id"), col("vec_id").as("n_id"))

      def time[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (brute, tB) = time {
        topk(corpus.crossJoin(broadcast(q.drop("bucket")))).localCheckpoint(true)
      }
      val (bucketed, tK) = time {
        topk(corpus.join(broadcast(q), "bucket")).localCheckpoint(true)
      }
      val cands = corpus.join(broadcast(q), "bucket").count()
      val frac = cands.toDouble / ((n - nQ).toLong * nQ)
      val recall = ops.Similarity.recallFrame(brute, bucketed, "bucket", k)
        .agg(avg(col("recall_bp"))).collect()(0).getDouble(0)
      println(f"[probe-ann] n=$n%8d  brute=$tB%6.2fs  bucket=$tK%6.2fs  " +
        f"(${tB / tK}%4.1fx)  touched=${frac * 100}%5.2f%% of corpus/query  " +
        f"recall@5=${recall / 100}%5.1f%%")
    }
    spark.stop()
  }
}
