package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.search.{SearchParams, SortBy, StacApi}

/** Scale probe for A23/A71's claim that keyset (search-after) pagination
  * is the 100 TB story and OFFSET is not (docs/PERF.md): builds an N×
  * copy of the sf0.1 events table (default 100× → 10M items), then pages
  * the TYPED API (`StacApi.search`, real tokens, token decode, fields
  * projection — the production path) at increasing depths both ways:
  *
  *  - keyset `ks:` token: the page predicate pushes into the scan and a
  *    TakeOrderedAndProject returns one page — cost CONSTANT in depth;
  *  - `off:` token: Spark must sort/skip everything before the offset —
  *    cost grows with depth, i.e. a deep-pagination user pays the whole
  *    prefix on every page.
  *
  * The boundary rows used to mint the deep keyset tokens come from an
  * untimed setup query; the timed section is exactly one page fetch.
  * Usage: `runMain graft.ProbeKeyset [multiplier]`.
  */
object ProbeKeyset {
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

    val src = core.Tables.events(spark, "/root/testdata/sf0.1")
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_keyset").toString
    (0 until mult)
      .map(k => src.withColumn("event_id", col("event_id") + lit(k.toLong * 10000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val items = core.Tables.items(spark, dir)
    val n = items.count()
    println(s"probe corpus: $n items (${mult}x sf0.1)")

    val p = SearchParams(sortBy = Seq(SortBy("value")), limit = 100,
      withCount = false)
    val depths = Seq(1000L, n / 2, n - n / 100)

    def timePage(token: Option[String], label: String): Unit = {
      val t0 = System.nanoTime()
      try {
        val r = StacApi.search(spark, dir, p.copy(token = token))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$label%-28s ${dt}%7.2f s  (${r.items.length} rows, " +
          f"next=${r.nextToken.isDefined})")
      } catch {
        // offset-at-depth is not merely slow — Spark's offset collects
        // the whole skipped prefix toward the driver, so a deep page
        // blows spark.driver.maxResultSize outright. That failure IS the
        // probe's finding; report it instead of crashing the run.
        case e: org.apache.spark.SparkException =>
          println(f"$label%-28s FAILED: ${e.getMessage.linesIterator.next()}")
      }
    }

    timePage(None, "first page (mints ks token)")
    depths.foreach { d =>
      // untimed setup: the boundary row that a client at depth d would
      // hold in its last ks: token
      val b = items.orderBy(col("value").asc, col("id").asc)
        .select(col("value"), col("id")).offset(d.toInt).limit(1).collect()(0)
      val ksToken = s"ks:${b.getDouble(0)}\u0001${b.getString(1)}"
      timePage(Some(ksToken), f"keyset page @ depth $d%,d")
      timePage(Some(s"off:$d"), f"offset page @ depth $d%,d")
    }
    spark.stop()
  }
}
