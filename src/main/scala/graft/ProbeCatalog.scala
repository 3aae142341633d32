package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the `geocatalog` DataSource against Spark's native parquet
  * reader over the SAME exported files — the honest when-to-use-which
  * readout (docs/PERF.md): the source's row reader is parquet-mr
  * Group-based (row-at-a-time, no vectorization), so an UNSELECTIVE full
  * scan should prefer the native reader; the source earns its keep when
  * the footer prune or a metadata-served aggregate deletes I/O the
  * native path cannot (file skip before data plane; COUNT/extremes with
  * zero data pages). Usage:
  * `runMain graft.ProbeCatalog [sfDir] [reps] [zShards]` — raise zShards
  * to probe the metadata plane at higher file counts (files ≈
  * collections × shards).
  */
object ProbeCatalog {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val zShards = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shardCol = (graft.search.StacSearch.zCellColumn.cast("long") * lit(zShards) / lit(4096))
      .cast("long")
    val cat = graft.core.GeoParquet.export(spark, sfDir, zShards, Some(shardCol), tag = "z")
    println(s"[catalog] files: ${graft.core.GeoParquet.footerInfo(cat).size} " +
      s"(zShards=$zShards)")
    def viaSource = spark.read.format("graft.sources.GeoCatalogSource").load(cat)
    def viaParquet = spark.read.parquet(cat)
    val (w, s, e, n) = (-130.005, -60.005, -20.005, 10.005)
    def boxed(df: org.apache.spark.sql.DataFrame) =
      df.where(col("bbox.xmin") <= e && col("bbox.xmax") >= w &&
        col("bbox.ymin") <= n && col("bbox.ymax") >= s)

    def time(name: String)(body: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val rows = body
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[catalog] $name%-38s min=${times.map(_._1).min}%.3f s rows=${times.head._2}")
    }

    // warmup both paths
    viaParquet.count(); viaSource.count()

    time("full scan, native parquet")(viaParquet.agg(sum(length(col("id")))).head().getLong(0))
    time("full scan, geocatalog source")(viaSource.agg(sum(length(col("id")))).head().getLong(0))
    time("bbox query, native (no file skip)")(boxed(viaParquet).count())
    time("bbox query, geocatalog (file skip)")(boxed(viaSource).count())
    time("count, native parquet")(viaParquet.count())
    time("count, geocatalog (footers only)")(viaSource.count())
    spark.stop()
  }
}
