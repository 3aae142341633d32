package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Co-located fact⋈fact join via bucketing (SURVEY.md §5): writing both
  * sides bucketed on the join key removes the per-query shuffle — at
  * 100 TB the dominant cost of repeated fact joins. Asserted: the bucketed
  * join plans with NO Exchange, and results equal the shuffled join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed orders ⋈ lineitem plans without a shuffle and matches results") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val prevBcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the fact-fact (non-broadcast) path the bucketing targets
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // external tables via option("path") — no warehouse-dir dependency
      Tables.orders(s, sf).select("o_orderkey", "o_orderdate", "o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.lineitem(s, sf).select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val joined = s.table("orders_b")
        .join(s.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("rev"),
          count(lit(1)).as("n"))
      val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val joinSection = p.substring(0, p.indexOf("HashAggregate"))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // no exchange below the join: bucket layout IS the partitioning
      assert(!joinSection.contains("Exchange"),
        s"join should read co-located buckets, plan:\n$p")

      val expected = Tables.orders(s, sf).select("o_orderkey", "o_orderdate")
        .join(Tables.lineitem(s, sf).select("l_orderkey", "l_extendedprice"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("rev"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
      val got = joined.collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == expected)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
      new scala.reflect.io.Directory(new java.io.File(wh)).deleteRecursively()
    }
  }
}
