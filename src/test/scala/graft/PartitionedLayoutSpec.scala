package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode

import graft.core.PartitionedLayout

/** B36: the 100 TB guarantee is the plan — dynamic partition pruning
  * must actually reach the partitioned fact scan.
  */
class PartitionedLayoutSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val sf = TestSpark.sf

  test("b36: the dim filter prunes fact partitions at runtime — " +
      "dynamicpruningexpression in the scan's partition filters") {
    val df = PartitionedLayout.prunedJoin(s, sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    // and the pruning is real: the executed scan reads 3 month
    // directories of the full year(s) laid out
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("graft_part_orders"))
    assert(scans.nonEmpty)
    val parts = s.table(PartitionedLayout.materialize(s, sf))
      .select("slice").distinct().count()
    val kept = df.select("slice").distinct().count()
    // Q1 = 3 of 12 months per year: kept ≈ parts/4 (calendar edges ±1yr)
    assert(kept <= parts / 3 + 1, s"kept $kept of $parts partitions — not pruned to Q1")
  }
}
