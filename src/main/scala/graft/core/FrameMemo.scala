package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for shared derived frames (the staged-table
  * pattern): several gates consume the same deterministic intermediate —
  * capped trigram postings (C4/C56), the positional 8-gram shingle stream
  * (C24/C40/C70), the MinHash band index (C2/C18/C47/C67/C98) — and each
  * independently re-derived it from the corpus. In a deployment these ARE
  * persisted tables built once per corpus snapshot; locally we memoize
  * the `localCheckpoint`ed frame per (session, key) so one session builds
  * each of them once.
  *
  * Keys include the session identity: checkpoint blocks die with their
  * session, so a frame cached under a stopped session is never returned
  * for a new one (stale entries are just unreferenced garbage).
  */
object FrameMemo {
  private val memo =
    new scala.collection.concurrent.TrieMap[(Int, String), DataFrame]

  /** `build` runs at most once per (live session, key); the result is
    * eagerly localCheckpoint'ed so every consumer starts from the
    * materialized blocks instead of the lineage.
    */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((System.identityHashCode(s), key),
      build.localCheckpoint(true))
}
