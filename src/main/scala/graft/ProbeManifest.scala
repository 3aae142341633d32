package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the A63 covering-index path (docs/PERF.md): builds an
  * N× copy of the sf0.1 items view (default 100× → ~5M items), lays it
  * out z-ordered across 64 files, builds the file-level covering
  * manifest, then times the same compact-bbox search BOTH ways — full
  * scan vs manifest-pruned — and reports files touched. The probe is
  * the measured form of A63's claim: the manifest turns z-order
  * locality into file-level I/O elimination, and the win grows with the
  * corpus while the manifest read stays |files|-sized.
  * Usage: `runMain graft.ProbeManifest [multiplier]`.
  */
object ProbeManifest {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val items0 = core.Tables.items(spark, "/root/testdata/sf0.1")
    val items = (0 until mult)
      .map(k => items0.withColumn("id_num", col("id_num") + lit(k.toLong * 100000000L)))
      .reduce(_ unionAll _)
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_manifest").toString
    val layout = s"$dir/items"
    val manifest = s"$dir/manifest"
    core.ItemsLayout.materializeZOrdered(items, search.StacSearch.zCellColumn,
      layout, numFiles = 64)
    core.ItemsLayout.coveringManifest(spark, layout)
      .write.mode("overwrite").parquet(manifest)
    val n = spark.read.parquet(layout).count()
    println(s"probe corpus: $n items (${mult}x sf0.1), 64-file z-layout")

    val (w, so, e, nn) = (-175.0, -20.0, -120.0, 25.0)
    def bboxFilter(df: org.apache.spark.sql.DataFrame) =
      df.where(col("lon") >= w && col("lon") <= e &&
        col("lat") >= so && col("lat") <= nn)

    def time(name: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val rows = body
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($rows rows)")
    }

    val files = spark.read.parquet(manifest)
      .where(col("xmin") <= e && col("xmax") >= w &&
        col("ymin") <= nn && col("ymax") >= so)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    println(s"manifest prune: ${files.size} of 64 files survive")

    time("full scan + bbox")(bboxFilter(spark.read.parquet(layout)).count())
    time("manifest-pruned scan + bbox")(bboxFilter(spark.read.parquet(files: _*)).count())
    spark.stop()
  }
}
