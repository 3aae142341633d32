package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val sf = TestSpark.sf

  test("makeImage produces a real BMP that ImageIO round-trips") {
    val bytes = Multimodal.makeImage(42L, 20, 10)
    // BMP magic
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val f = Multimodal.decode(Multimodal.Media(42L, bytes, 20, 10))
    assert(f.dec_width == 20 && f.dec_height == 10)
    // row y is 20 pixels of (42 + y) % 256
    val expected = (0 until 10).map(y => 20L * ((42 + y) % 256)).sum
    assert(f.pixel_sum == expected)
  }

  test("decode handles the mod-256 wrap (closed form's GREATEST branch)") {
    val id = 250L
    val w = Multimodal.widthOf(id)
    val h = Multimodal.heightOf(id)
    val f = Multimodal.decode(Multimodal.Media(id, Multimodal.makeImage(id, w, h), w, h))
    val a = id % 256
    val expected = w * (h * a + h.toLong * (h - 1) / 2 - 256L * math.max(0, a + h - 256))
    assert(f.pixel_sum == expected)
  }

  test("featurize: real decode, deterministic across partitionings and batch sizes") {
    val a = Multimodal.featurize(s, sf, batchSize = 64).collect()
      .map(f => f.doc_id -> (f.dec_width, f.dec_height, f.pixel_sum, f.feature.toSeq)).toMap
    val b = Multimodal.featurize(s, sf, batchSize = 7).collect()
      .map(f => f.doc_id -> (f.dec_width, f.dec_height, f.pixel_sum, f.feature.toSeq)).toMap
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.values.forall(_._4.length == 8))
  }

  test("decoded dimensions equal the metadata for every row") {
    val feats = Multimodal.featurize(s, sf).collect()
    feats.foreach { f =>
      assert(f.dec_width == Multimodal.widthOf(f.doc_id))
      assert(f.dec_height == Multimodal.heightOf(f.doc_id))
    }
  }

  test("c29 header-only metadata agrees with the full ImageIO decode; non-BMP → null") {
    import org.apache.spark.sql.functions._
    // header fields vs the decoded raster, joined per doc
    val meta = Multimodal.queries("c29_media_metadata")(s, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    val full = Multimodal.featurize(s, sf).collect()
    assert(full.nonEmpty)
    full.foreach { f =>
      val (size, w, h, bpp) = meta(f.doc_id)
      assert(size == f.n_bytes, s"doc ${f.doc_id}")
      assert(w == f.dec_width && h == f.dec_height, s"doc ${f.doc_id}")
      assert(bpp == 24)
    }
    // corrupt / non-BMP payloads surface as null metadata, not a crash
    val spark = s
    import spark.implicits._
    val bad: Seq[Array[Byte]] = Seq(Array[Byte](0x42, 0x41, 0x44), Array.emptyByteArray, null)
    val rows = bad.toDF("payload")
      .select(graft.functions.BmpMeta(col("payload")).as("m")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("c54: perceptual hash groups collisions, and a re-rendered (wider) " +
      "copy of the same picture collides — width invariance") {
    val rows = Multimodal.queries("c54_perceptual_dedup")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.exists(_._3 > 1L), "no perceptual collisions found")
    assert(rows.map(_._2).distinct.length > 1, "hash is degenerate")
    // groups are consistent: n_same really is the hash-group size
    rows.groupBy(_._2).foreach { case (ph, g) =>
      assert(g.forall(_._3 == g.length), s"phash $ph group size mismatch")
    }
    // width-invariance: brightness-profile bits compare row MEANS, so the
    // same picture rendered 3× wider must hash identically
    def hashOf(m: Multimodal.Media): Long = {
      val f = Multimodal.decode(m)
      val h = f.dec_height
      def n(i: Int) = (((i + 1) * h + 7) / 8 - (i * h + 7) / 8).toLong
      (0 until 7).map { i =>
        if (f.row_blocks(i + 1) * n(i) > f.row_blocks(i) * n(i + 1)) 1L << i
        else 0L
      }.sum
    }
    val id = 123L
    val h = Multimodal.heightOf(id)
    val narrow = hashOf(Multimodal.Media(id, Multimodal.makeImage(id, 20, h), 20, h))
    val wide = hashOf(Multimodal.Media(id, Multimodal.makeImage(id, 60, h), 60, h))
    assert(narrow == wide, "3x-wider rendering of the same picture must collide")
  }

  test("c88: WAV encode→decode is lossless — canonical 44-byte header, and " +
      "the decoded features equal the generative model sample-by-sample") {
    val id = 321L
    val n = Multimodal.nSamplesOf(id)
    val wav = Multimodal.makeWav(id, n)
    assert(wav.length == 44 + 2 * n, s"canonical RIFF header expected: ${wav.length}")
    // the REAL codec must hand back the model's samples bit-for-bit
    val f = Multimodal.decodeWav(Multimodal.Audio(id, wav, 8000, n))
    assert(f.sample_rate == 8000 && f.n_samples == n && f.n_bytes == wav.length)
    var energy = 0L
    val frames = new Array[Long](8)
    (0 until n).foreach { i =>
      val v = Multimodal.sampleOf(id, i).toLong
      energy += v * v
      frames(8 * i / n) += math.abs(v)
    }
    assert(f.energy == energy)
    assert(f.frame_abs.toSeq == frames.toSeq)
    // a truncated payload fails loudly, not silently
    intercept[Exception] {
      Multimodal.decodeWav(Multimodal.Audio(id, wav.take(20), 8000, n))
    }
  }

  test("c90: cross-modal agreement counts recompute from the C54 gate " +
      "output, and all three classes are non-vacuous") {
    val r = Multimodal.queries("c90_crossmodal_agreement")(s, sf).head()
    val (textPairs, both, imagePairs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(textPairs > 0 && both > 0 && imagePairs > 0)
    assert(both <= textPairs, "agreement is a subset of text pairs")
    // image_pairs = Σ_groups C(n,2) = Σ_docs (n_same − 1) / 2 off C54's output
    val c54 = Multimodal.queries("c54_perceptual_dedup")(s, sf).collect()
    val expectedImagePairs = c54.map(row => row.getLong(2) - 1).sum / 2
    assert(imagePairs == expectedImagePairs, s"$imagePairs != $expectedImagePairs")
  }

  test("c89: frame sampling decodes only sampled frames — a poisoned " +
      "unsampled frame is skipped untouched, a poisoned sampled one fails") {
    val id = 17L // nFramesOf(17) = 9 frames, samples 0,2,4,6,8
    val payload = Multimodal.makeVideo(id)
    val clean = Multimodal.decodeVideoSampled(Multimodal.Video(id, payload, 9))
    assert(clean.n_frames == 9 && clean.n_sampled == 5)
    // recompute from the generative model
    val w = Multimodal.widthOf(id); val h = Multimodal.heightOf(id)
    def frameSum(f: Int): Long = {
      val a = (id + f) % 256
      w.toLong * (h * a + h.toLong * (h - 1) / 2 - 256 * math.max(0, a + h - 256))
    }
    val sums = Seq(0, 2, 4, 6, 8).map(frameSum)
    assert(clean.sampled_sum == sums.sum)
    assert(clean.max_cut == sums.sliding(2).map(p => math.abs(p(1) - p(0))).max)
    // poison frame 1 (unsampled): zero its BMP magic — decode must not care
    def frameOffset(k: Int): Int = { // offset of frame k's data
      var off = 8
      (0 until k).foreach { _ =>
        val len = java.nio.ByteBuffer.wrap(payload, off, 4).getInt
        off += 4 + len
      }
      off + 4
    }
    val poisonedUnsampled = payload.clone()
    poisonedUnsampled(frameOffset(1)) = 0
    poisonedUnsampled(frameOffset(1) + 1) = 0
    val still = Multimodal.decodeVideoSampled(Multimodal.Video(id, poisonedUnsampled, 9))
    assert(still == clean, "unsampled frames must never reach the codec")
    // poison frame 2 (sampled): must fail loudly
    val poisonedSampled = payload.clone()
    poisonedSampled(frameOffset(2)) = 0
    poisonedSampled(frameOffset(2) + 1) = 0
    intercept[Exception] {
      Multimodal.decodeVideoSampled(Multimodal.Video(id, poisonedSampled, 9))
    }
  }
}
