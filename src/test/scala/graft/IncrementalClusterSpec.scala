package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** C67 incremental near-dup cluster maintenance: the nightly increment
  * merges into the persisted history cluster state — the result must be
  * indistinguishable from re-clustering the whole corpus (the A54-style
  * maintenance proof), and untouched history clusters must pass through
  * the merge untouched.
  */
class IncrementalClusterSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private lazy val incremental =
    Dedup.c67IncrementalClusters(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  private lazy val full =
    Dedup.c18DupClusters(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  private lazy val split = Dedup.c67SplitFor(s, d)
  private lazy val history =
    s.read.parquet(Dedup.c67StatePath(s, d)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental merge ≡ full-corpus re-clustering (same members, same labels)") {
    assert(incremental == full)
  }

  test("the merge is non-vacuous: increment docs join, some history clusters grow") {
    val incDocs = incremental.keySet.filter(_ >= split)
    assert(incDocs.nonEmpty, "no increment doc entered the cluster graph")
    // at least one increment doc landed in a cluster labeled by a history doc
    assert(incDocs.exists(doc => incremental(doc) < split),
      "no history cluster was extended by the increment — the cross-split path is untested")
  }

  test("a history doc is relabeled ONLY when its merged cluster gained an increment doc") {
    // the bounded-work contract: the merge may not disturb a component
    // the increment never reached
    val membersByLabel = incremental.groupBy(_._2).view.mapValues(_.keySet).toMap
    var kept = 0
    history.foreach { case (doc, oldLab) =>
      val newLab = incremental(doc)
      if (newLab == oldLab) kept += 1
      else assert(membersByLabel(newLab).exists(_ >= split),
        s"history doc $doc relabeled $oldLab -> $newLab with no increment member in the cluster")
    }
    assert(kept > 0, "fixture left no untouched history row — weaken the split")
  }

  test("compaction: latest version serves the merge, v1 stays the immutable pre-merge state") {
    val latest = Dedup.c67CompactState(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == incremental, "latest compacted version must equal the merge result")
    val v1 = s.read.parquet(Dedup.c67VersionsPath(s, d))
      .where(org.apache.spark.sql.functions.col("version") === 1)
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1 == history, "version=1 must remain the pre-merge history state")
    // idempotent: a second compaction call appends nothing new
    val again = Dedup.c67CompactState(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == latest)
  }
}
