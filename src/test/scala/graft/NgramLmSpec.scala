package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis
import graft.ops.TextExprs.h64Local

/** C104 — Stupid-Backoff bigram LM + CCNet perplexity terciles. The gate
  * is oracle-SQL'd end to end; this spec pins what the oracle can't:
  * (1) a FULL independent recomputation in plain Scala (different code
  * path from both engines — local MD5 hashing, Long arithmetic, no SQL),
  * and (2) that the measured-size merge-join path (what a 100 TB vocab
  * takes) computes bit-identically to the broadcast path.
  */
class NgramLmSpec extends AnyFunSuite {

  private lazy val s = TestSpark.spark

  /** (doc_id, lang, ppm, bucket) recomputed from the raw fixture with
    * none of the engine plumbing.
    */
  private lazy val local: Set[(Long, String, Long, String)] = {
    val rows = s.read.parquet(TestSpark.sf + "/documents.parquet")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
      .filter(_._3.length >= 2)
    val uni = scala.collection.mutable.Map.empty[Long, Long]
    val big = scala.collection.mutable.Map.empty[Long, Long]
    rows.foreach { case (_, _, w) =>
      w.foreach(t => uni.updateWith(h64Local("sbu:" + t))(c => Some(c.getOrElse(0L) + 1)))
      w.sliding(2).foreach(p =>
        big.updateWith(h64Local("sbb:" + p(0) + "\u0001" + p(1)))(c => Some(c.getOrElse(0L) + 1)))
    }
    val t = uni.values.sum
    val doc = rows.map { case (id, lang, w) =>
      val scores = w.sliding(2).map { p =>
        val hb = h64Local("sbb:" + p(0) + "\u0001" + p(1))
        if (big.contains(hb)) big(hb) * 1000000L / uni(h64Local("sbu:" + p(0)))
        else (2L * uni(h64Local("sbu:" + p(1))) * 1000000L) / (5L * t)
      }.toSeq
      (id, lang, scores.sum / scores.length)
    }
    doc.toSeq.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      val n = ds.length.toLong
      // min-rank by ppm descending, ties share the rank
      val byPpm = ds.groupBy(_._3).toSeq.sortBy(-_._1)
      val ranks = byPpm.scanLeft(1L)(_ + _._2.length).zip(byPpm).map {
        case (r, (ppm, _)) => ppm -> r
      }.toMap
      ds.map { case (id, lang, ppm) =>
        val r = ranks(ppm)
        val b = if (3 * r <= n) "head" else if (3 * r <= 2 * n) "middle" else "tail"
        (id, lang, ppm, b)
      }
    }.toSet
  }

  test("full independent recomputation matches the gate") {
    val got = TextAnalysis.c104NgramLm(s, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(local.nonEmpty && got == local)
    // every language carries all three CCNet splits at this fixture size
    val langs = local.map(_._2)
    langs.foreach { l =>
      assert(local.filter(_._2 == l).map(_._4) == Set("head", "middle", "tail"))
    }
  }

  test("merge-join (100 TB vocab) path is bit-identical to broadcast path") {
    val merged = TextAnalysis.c104BucketsWith(s, TestSpark.sf, 0L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(merged == local)
  }

  test("c105 mixture: equal-parts take = min kept, tail mass excluded, " +
      "rates reproduce the local recomputation") {
    val docsNt = s.read.parquet(TestSpark.sf + "/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS nt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byLang = local.toSeq.groupBy(_._2).map { case (l, ds) =>
      val raw = ds.map(d => docsNt(d._1)).sum
      val kept = ds.filter(_._4 != "tail").map(d => docsNt(d._1)).sum
      l -> (raw, kept)
    }
    val take = byLang.values.map(_._2).min
    val want = byLang.map { case (l, (raw, kept)) =>
      (l, raw, kept, take,
        if (kept == 0) 0L else take * 10000 / kept, take * 10000 / raw)
    }.toSet
    val got = TextAnalysis.c105PerplexityMixture(s, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.forall(r => r._3 <= r._2 && r._5 <= 10000 && r._6 <= r._5))
  }
}
