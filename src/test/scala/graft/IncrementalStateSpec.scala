package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.IncrementalState

/** B24 audit: the materialized state table is tiny relative to raw data,
  * and APPENDING one slice's partials (recomputing only that slice from
  * raw) merges to the same answer as a full recompute — the property
  * that lets a nightly pipeline never re-read history.
  */
class IncrementalStateSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("slice-wise append ≡ full recompute; state rows ≪ raw rows") {
    val direct = ops.Analytics.queries("b21_incremental_agg")(s, sf).collect()

    // day 1: state for every slice except the newest
    val slices = IncrementalState.partials(s, sf)
      .select(col("slice")).distinct().collect().map(_.getString(0)).sorted
    val last = slices.last
    val tmp = java.nio.file.Files.createTempDirectory("graft_state_append").toString
    IncrementalState.materialize(s, sf, tmp, s"slice < '$last'")
    // day 2: append ONLY the newest slice's partials
    IncrementalState.materialize(s, sf, tmp, s"slice = '$last'")

    val merged = IncrementalState.mergedFrom(s, tmp).collect()
    assert(merged.sameElements(direct))

    val stateRows = s.read.parquet(tmp).count()
    val rawRows = core.Tables.orders(s, sf).count()
    info(s"state rows=$stateRows raw rows=$rawRows")
    assert(stateRows < rawRows / 4, s"state ($stateRows) not small vs raw ($rawRows)")
  }
}
