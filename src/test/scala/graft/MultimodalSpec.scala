package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val sf = TestSpark.sf

  test("featurize: deterministic across partitionings and batch sizes") {
    val a = Multimodal.featurize(s, sf, batchSize = 64).collect()
      .map(f => f.doc_id -> (f.n_bytes, f.feature.toSeq)).toMap
    val b = Multimodal.featurize(s, sf, batchSize = 7).collect()
      .map(f => f.doc_id -> (f.n_bytes, f.feature.toSeq)).toMap
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.values.forall(_._2.length == 8))
  }

  test("payload byte length matches source text length (plumbing intact)") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(s, sf)
      .select(col("doc_id"), length(col("text")).cast("int").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val feats = Multimodal.featurize(s, sf).collect()
    feats.foreach(f => assert(f.n_bytes == docs(f.doc_id)))
  }

  test("decodeStub is a pure function of payload") {
    val m1 = Multimodal.Media(1L, "hello world".getBytes, 16, 16)
    val m2 = Multimodal.Media(1L, "hello world".getBytes, 16, 16)
    assert(Multimodal.decodeStub(m1).feature.toSeq == Multimodal.decodeStub(m2).feature.toSeq)
  }
}
