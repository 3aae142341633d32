package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.core.BucketedLayout

/** B22 audit: the bucketed layout's value is the plan shape — a
  * fact⋈fact join plus same-key aggregate with ZERO Exchange and no
  * per-query Sort — so that is what's asserted, alongside result
  * equality with the unbucketed join (bucketing must never change
  * results, only physics).
  */
class BucketedLayoutSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed fact-fact join: zero Exchange, no per-query Sort, same results") {
    // force the join decision away from broadcast so the audit proves the
    // bucketed SMJ path (at real scale neither fact side broadcasts)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = BucketedLayout.joinAggregate(s, sf)
      val p = agg.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p)
      // one file per bucket was written, so the written sort order is
      // trusted and no Sort node appears above either scan
      assert(!p.split('\n').exists(_.trim.startsWith("Sort")), p)
      // join parallelism = bucket count (a bucketed scan reads one
      // partition per bucket; adding executors never re-shuffles)
      assert(agg.rdd.getNumPartitions == BucketedLayout.buckets)

      // result equality vs the same join on raw parquet
      val bucketed = BucketedLayout.b22BucketedJoin(s, sf).collect()
      val plain = core.Tables.orders(s, sf)
        .join(core.Tables.lineitem(s, sf), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderkey"))
        .collect()
      assert(bucketed.length == plain.length)
      assert(bucketed.sameElements(plain))
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed as-of: window runs over the sorted bucketed scan — no Exchange, no Sort") {
    val asof = BucketedLayout.asofWindow(s, sf)
    val p = asof.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.split('\n').exists(_.trim.startsWith("Sort")), p)

    // result equality with B18's one-shuffle union-merge as-of
    val viaLayout = BucketedLayout.b23BucketedAsof(s, sf).collect()
    val viaUnion = ops.Analytics.queries("b18_asof_join")(s, sf).collect()
    assert(viaLayout.length == viaUnion.length)
    assert(viaLayout.sameElements(viaUnion))
  }
}
