package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FixtureGuard, Tables}
import org.apache.spark.sql.types.TimestampType

/** Round-7 postmortem guard: the driver regenerating fixtures with a new
  * physical type for `events.ts` silently broke 75 gates for two rounds.
  * These tests (a) pin the current fixtures to the schema contract, so
  * the NEXT drift fails here with the column named, and (b) pin the
  * loader's normalization of `events.ts` to TIMESTAMP for both physical
  * generations the fixtures have shipped.
  */
class FixtureGuardSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("fixtures at sf0.001 match the schema contract (drift names the column)") {
    val drift = FixtureGuard.check(s, TestSpark.sf)
    assert(drift.isEmpty, s"fixture schema drift:\n  ${drift.mkString("\n  ")}")
  }

  test("Tables.events normalizes ts to TIMESTAMP whatever the physical type") {
    val e = Tables.events(s, TestSpark.sf)
    assert(e.schema("ts").dataType == TimestampType)
    // and it evaluates: the round-7 break was an ANALYSIS error, so force one
    assert(e.limit(1).count() == 1L)
  }
}
