package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.ops.TextExprs.h64Local

/** C103 — Naive-Bayes quality-classifier TRAINING and its composition
  * with scan-speed scoring (C39's shape) and budget selection (C51's
  * shape). The trained table itself is oracle-gated (exact integer
  * counts); this spec pins what SQL can't: the sufficient-statistics
  * invariants and that scoring reproduces hand-computed NB math.
  */
class ClassifierTrainSpec extends AnyFunSuite {

  private lazy val s = TestSpark.spark
  private lazy val table = TextAnalysis.c103ClassifierTrain(s, TestSpark.sf).collect()

  test("trained table: labels, bucket range, positive counts, consistent priors") {
    assert(table.nonEmpty)
    val labels = table.map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("keep", "reject")) && labels.contains("reject"))
    assert(table.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    assert(table.forall(_.getLong(2) > 0))
    // label_docs is one value per label, and the values sum to the corpus
    val perLabel = table.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(3)).toSet)
    assert(perLabel.values.forall(_.size == 1), "label_docs must be constant per label")
    val totalDocs = perLabel.values.map(_.head).sum
    assert(totalDocs == graft.core.Tables.documents(s, TestSpark.sf).count())
    // total feature mass == unigrams + bigrams over the whole corpus:
    // sum over docs of (n_words + max(n_words - 1, 0))
    val mass = table.map(_.getLong(2)).sum
    val expected = graft.core.Tables.documents(s, TestSpark.sf)
      .select(expr("CAST(size(split(text, ' ')) AS BIGINT)").as("nw"))
      .agg(sum(expr("nw + greatest(nw - 1, 0)"))).head().getLong(0)
    assert(mass == expected, s"feature mass $mass != $expected")
  }

  test("scoring reproduces hand-computed NB log-likelihoods; train→score→select " +
      "composition is deterministic") {
    val classes = Seq("keep", "reject")
    val counts = classes.map { c =>
      c -> table.filter(_.getString(0) == c).map(r => r.getLong(1) -> r.getLong(2)).toMap
    }.toMap
    val totals = counts.map { case (c, m) => c -> m.values.sum }
    val docsPerLabel = classes.map { c =>
      c -> table.filter(_.getString(0) == c).headOption.map(_.getLong(3)).getOrElse(0L)
    }.toMap
    val allDocs = docsPerLabel.values.sum.toDouble

    def nbScore(text: String, c: String): Double = {
      val w = text.split(" ", -1)
      val feats = w.toSeq ++ (if (w.length >= 2) w.sliding(2).map(p => p(0) + "_" + p(1)).toSeq
                              else Seq.empty)
      val prior = math.log(math.max(docsPerLabel(c), 1L) / allDocs)
      prior + feats.map { f =>
        val b = h64Local("nb:" + f) % 64
        math.log((counts(c).getOrElse(b, 0L) + 1).toDouble / (totals(c) + 64))
      }.sum
    }

    val scored = TextAnalysis.c103ScoreDocs(s, TestSpark.sf)
    val sample = scored.limit(5).collect()
    val texts = graft.core.Tables.documents(s, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sample.foreach { r =>
      val id = r.getLong(0)
      val expKeep = nbScore(texts(id), "keep")
      val expRej = nbScore(texts(id), "reject")
      // same fold order (sequential left fold over features) → tight tol
      assert(math.abs(r.getDouble(1) - expKeep) < 1e-9, s"doc $id s_keep")
      assert(math.abs(r.getDouble(2) - expRej) < 1e-9, s"doc $id s_reject")
      val pred = if (r.getDouble(1) >= r.getDouble(2)) "keep" else "reject"
      assert(r.getString(3) == pred)
    }
    // C51-shape selection on the learned score: deterministic top-k
    val k = 10
    val top1 = scored.orderBy(col("s_keep").desc, col("doc_id"))
      .limit(k).select("doc_id").collect().map(_.getLong(0)).toSeq
    val top2 = TextAnalysis.c103ScoreDocs(s, TestSpark.sf)
      .orderBy(col("s_keep").desc, col("doc_id"))
      .limit(k).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top1 == top2 && top1.length == k)
  }
}
