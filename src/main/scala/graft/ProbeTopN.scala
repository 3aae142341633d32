package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Files-axis probe for the r12 GENERALIZED TopN pushdown: on a many-file
  * catalog, an arbitrary-order page (the A71 `value DESC, id ASC` shape)
  * must hand Spark at most k rows PER FILE (the bounded selection heap),
  * and a keyset `id_num` page must stay the early-stop fast path. Prints,
  * per file count: page wall time via the DSv2 vs Spark's native parquet
  * reader over the identical files, and the counted emission bound.
  * Results recorded in docs/PERF.md. Usage:
  * `runMain graft.ProbeTopN [sfDir] [reps]`.
  */
object ProbeTopN {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def best(body: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    for (shards <- Seq(250, 1000, 2500)) {
      val cat = core.GeoParquet.export(spark, sfDir, shards, tag = "f")
      val files = core.GeoParquet.footerInfo(cat).size
      def viaCatalog = spark.read.format("graft.sources.GeoCatalogSource").load(cat)
      def viaParquet = spark.read.parquet(cat)
      def page(df: org.apache.spark.sql.DataFrame) =
        df.orderBy(col("value").desc, col("id")).limit(10)
          .select(col("id"), col("value"))
      val tCat = best(page(viaCatalog).collect())
      val tPq = best(page(viaParquet).collect())
      sources.GeoCatalogMetrics.topNEmitted.set(0L)
      val got = page(viaCatalog).collect()
      val emitted = sources.GeoCatalogMetrics.topNEmitted.get()
      val same = got.map(_.toString).toSeq ==
        page(viaParquet).collect().map(_.toString).toSeq
      val tKeyset = best(
        viaCatalog.where(col("id_num") > 1000L)
          .orderBy(col("id_num")).limit(10).select(col("id_num")).collect())
      println(f"[topn] files=$files%6d heapPage=$tCat%6.3f s nativeSort=$tPq%6.3f s " +
        f"emitted=$emitted%8d (bound=${10L * files}%8d) exact=$same " +
        f"keysetPage=$tKeyset%6.3f s")
    }
    // ID-RANGE sharding (the layout a keyset-paged serving catalog would
    // choose — D42's generation files are id-sorted runs): the consumed
    // `id_num > token` predicate prunes FILES on the sidecar extremes,
    // so a page opens O(covering files) instead of O(files)
    for (idsPerFile <- Seq(100L, 25L, 10L)) {
      val shard = col("id_num") / lit(idsPerFile)
      val cat = core.GeoParquet.export(spark, sfDir, 1, Some(shard),
        tag = s"idr$idsPerFile")
      val files = core.GeoParquet.footerInfo(cat).size
      def page = spark.read.format("graft.sources.GeoCatalogSource").load(cat)
        .where(col("id_num") > 60000L)
        .orderBy(col("id_num")).limit(10).select(col("id_num"))
      val t = best(page.collect())
      sources.GeoCatalogMetrics.opens.set(0L)
      page.collect()
      val opens = sources.GeoCatalogMetrics.opens.get()
      println(f"[topn] id-range files=$files%6d keysetPage=$t%6.3f s " +
        f"opens=$opens%6d of $files%6d")
    }
    spark.stop()
  }
}