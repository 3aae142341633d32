package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage wall clock for the c103 classifier-training gate (the
  * one adult gate near the bench bar in r10 — 1.9×): times the labeling
  * projection, the feature explode + hash, and the full train at sf0.1
  * so the optimization lands where the time actually is. Usage:
  * `runMain graft.ProbeC103 [sfDir] [reps]`.
  */
object ProbeC103 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false") // Bench's conf
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[c103] $name%-40s min=${ts.min}%.3f s")
    }
    def drain(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = core.Tables.documents(spark, sfDir)
    println(s"[c103] corpus: ${docs.count()} docs")

    val feats = "concat(w, CASE WHEN size(w) >= 2 THEN " +
      "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), '_', element_at(w, i + 1))) " +
      "ELSE slice(w, 1, 0) END)"
    val h = "CAST(conv(substr(md5(concat('nb:', f)), 1, 15), 16, 10) AS BIGINT)"
    def aggFrame = ops.TextAnalysis.c103LabeledProbe(spark, sfDir)
      .select(col("label"), explode(expr(
        s"concat($feats, array(CAST(NULL AS STRING)))")).as("f"))
      .select(col("label"),
        expr(s"CASE WHEN f IS NULL THEN CAST(-1 AS BIGINT)" +
          s" ELSE $h % 64 END").as("bucket"))
      .groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("n"))

    time("full gate (current impl)") {
      ops.TextAnalysis.c103ClassifierTrain(spark, sfDir).collect()
    }
    time("labeling only (c43 battery)") {
      drain(ops.TextAnalysis.c103LabeledProbe(spark, sfDir)
        .select(col("label")))
    }
    time("label + explode (no hash)") {
      drain(ops.TextAnalysis.c103LabeledProbe(spark, sfDir)
        .select(col("label"), explode(expr(
          s"concat($feats, array(CAST(NULL AS STRING)))")).as("f")))
    }
    time("label + explode + hash (no agg)") {
      drain(ops.TextAnalysis.c103LabeledProbe(spark, sfDir)
        .select(col("label"), explode(expr(
          s"concat($feats, array(CAST(NULL AS STRING)))")).as("f"))
        .select(col("label"),
          expr(s"CASE WHEN f IS NULL THEN CAST(-1 AS BIGINT)" +
            s" ELSE $h % 64 END").as("bucket")))
    }
    time("agg only (collect 130 rows)") { aggFrame.collect() }
    println(s"[c103] scan partitions: ${docs.rdd.getNumPartitions}")
    time("variant: repartitioned corpus pass") {
      core.Tables.documents(spark, sfDir).repartition(32)
        .withColumn("w", expr("split(text, ' ')"))
        .withColumn("n_words", expr("CAST(size(w) AS BIGINT)"))
        .select(col("n_words"), explode(expr(
          s"concat($feats, array(CAST(NULL AS STRING)))")).as("f"))
        .select(expr(s"CASE WHEN f IS NULL THEN CAST(-1 AS BIGINT)" +
          s" ELSE $h % 64 END").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n")).collect()
    }
    time("variant: checkpoint + join") {
      val a = aggFrame.localCheckpoint(true)
      val perLabel = a.where(col("bucket") === -1)
        .select(col("label"), col("n").as("label_docs"))
      a.where(col("bucket") >= 0)
        .join(broadcast(perLabel), Seq("label"))
        .orderBy(col("label"), col("bucket")).collect()
    }
    spark.stop()
  }
}
