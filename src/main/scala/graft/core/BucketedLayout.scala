package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B22: bucketed-table materialization — the zero-shuffle fact⋈fact join
  * (SURVEY.md §2.B, round-7 candidate; the storage counterpart of
  * [[ItemsLayout]]/[[DocumentsLayout]] for the relational fact tables).
  *
  * B4 joins orders⋈lineitem by shuffling BOTH facts on the order key —
  * at 100 TB that shuffle IS the query cost (every byte of both tables
  * crosses the wire once per query). Bucketing moves that cost to write
  * time, once: both tables are hash-bucketed AND sorted by the join key
  * with the same bucket count, so every join/groupBy on that key reads
  * co-located, pre-sorted buckets — SortMergeJoin with NO Exchange and
  * NO per-query Sort (asserted in BucketedLayoutSpec).
  *
  * Write shape: `repartition(buckets, key)` uses the same murmur3 hash
  * partitioning as `bucketBy`, so each write task holds exactly one
  * bucket's rows and writes exactly ONE file per bucket — the
  * one-file-per-bucket layout Spark requires before it trusts the
  * written sort order (otherwise a per-query Sort reappears).
  *
  * At 100 TB: bucket count scales with table size (buckets ≈ table-bytes /
  * target-file-bytes, same count on both tables); the join parallelism
  * equals the bucket count, and adding executors never re-shuffles data.
  * Cf. reference database_logic.py:831-853 — its per-collection file scan
  * has no co-location story at all; every join re-reads and re-hashes.
  */
object BucketedLayout {

  /** Bucket count at test scale; production = table-bytes / ~256 MB. */
  val buckets = 8

  private def tableName(which: String, dir: String): String =
    s"graft_bucketed_${which}_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** Materialize orders + lineitem bucketed and sorted by the order key.
    * Idempotent per (session, dir): the catalog entry is the marker.
    */
  def materialize(spark: SparkSession, dir: String): (String, String) = {
    val ot = tableName("orders", dir)
    val lt = tableName("lineitem", dir)
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_bucketed").getAbsolutePath
    if (!spark.catalog.tableExists(ot)) {
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .repartition(buckets, col("o_orderkey"))
        .write.mode("overwrite")
        .option("path", s"$base/$ot")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ot)
    }
    if (!spark.catalog.tableExists(lt)) {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
        .repartition(buckets, col("l_orderkey"))
        .write.mode("overwrite")
        .option("path", s"$base/$lt")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lt)
    }
    (ot, lt)
  }

  /** The audited join: orders⋈lineitem on the bucket key, then a
    * per-order aggregate on the SAME key — both reuse the bucketing, so
    * the whole plan (join + aggregate) carries zero Exchange. The final
    * orderBy is the gate's determinism requirement only;
    * BucketedLayoutSpec audits the pre-sort plan.
    */
  def joinAggregate(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = materialize(spark, dir)
    spark.table(ot)
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
  }

  def b22BucketedJoin(spark: SparkSession, dir: String): DataFrame =
    joinAggregate(spark, dir).orderBy(col("o_orderkey"))

  /** Oracle: same join on the raw parquet — bucketing must not change
    * results, only the plan.
    */
  val b22Sql: String =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey, o_orderdate ORDER BY o_orderkey""".stripMargin
}
