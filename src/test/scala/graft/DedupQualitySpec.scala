package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.search.StacSearch

class DedupQualitySpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("c74: source-vocab similarity is a full strict-upper-triangle matrix " +
      "with cosines in (0, 1], and self-cosine would be 1") {
    val rows = graft.ops.TextAnalysis.queries("c74_source_vocab_sim")(s, sf).collect()
    val sources = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.length
    assert(rows.length == sources * (sources - 1) / 2,
      s"expected C($sources,2) pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), r.toString) // strict upper triangle
      val cos = r.getDouble(3)
      assert(cos > 0.0 && cos <= 1.0 + 1e-12, r.toString)
    }
  }

  test("c75: spectrum bins partition the vocabulary — counts and mass add up " +
      "to the corpus totals, every bin is a power of two") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.TextAnalysis.queries("c75_freq_spectrum")(s, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == (1L << r.getInt(0)), r.toString) // freq_lo = 2^bucket
    }
    val words = graft.core.Tables.documents(s, sf)
      .select(explode(expr("split(text, ' ')")).as("w")).where(col("w") =!= "")
    val total = words.count()
    val vocab = words.distinct().count()
    assert(rows.map(_.getLong(3)).sum == total, "occurrence mass must sum to |corpus words|")
    assert(rows.map(_.getLong(2)).sum == vocab, "word counts must sum to |vocab|")
  }

  test("c76: chunks tile each document — full coverage, fixed stride, " +
      "size-stride overlap, exact tail") {
    val chunks = graft.ops.TextAnalysis.queries("c76_chunk")(s, sf).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.sortBy(_.getInt(1)).map(r => (r.getInt(2), r.getLong(3)))
      }
    val lens = graft.core.Tables.documents(s, sf)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == lens.keySet, "every document must chunk")
    chunks.foreach { case (d, cs) =>
      val n = lens(d)
      // starts advance by the stride from 1; last chunk ends exactly at n
      cs.zipWithIndex.foreach { case ((start, _), i) => assert(start == 1 + 24 * i) }
      val (lastStart, lastLen) = cs.last
      assert(lastStart + lastLen - 1 == n, s"doc $d tail must end at word $n")
      // every chunk is the full window clipped at the document end
      cs.foreach { case (start, len) =>
        assert(len == math.min(32, n - start + 1), s"doc $d start=$start len=$len n=$n")
      }
    }
  }

  test("c77: cache-plan accounting — hits + misses = chunks, distinct fresh " +
      "hashes never exceed misses, and some cache hits exist") {
    val rows = graft.ops.TextAnalysis.queries("c77_embed_cache_plan")(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, cached, toEmbed) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cached + toEmbed <= n, r.toString) // within-increment dups collapse
      assert(toEmbed <= n - cached, r.toString)
      assert(cached >= 0 && toEmbed >= 0, r.toString)
    }
    assert(rows.map(_.getLong(2)).sum > 0, "fixture should produce some cache hits")
  }

  test("every true near-dup pair (jaccard ≥ 0.6) appears in the MinHash candidates") {
    // at jac ≈ 0.98 the per-pair miss probability of 4 bands × 2 lanes is
    // ~2e-6 — a miss here means a banding bug, not bad luck
    val truth = Dedup.queries("c4_dedup_jaccard")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = Dedup.queries("c2_dedup_minhash")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty || truth.isEmpty) // truth may be empty at tiny SF
    assert(truth.subsetOf(candidates),
      s"missed: ${truth.diff(candidates)}")
  }

  test("simhash pairs at hamming<=3 include the exact-duplicate-level pairs") {
    val sim = Dedup.queries("c3_dedup_simhash")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.queries("c4_dedup_jaccard")(s, sf).collect()
      .filter(_.getDouble(2) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash at 32 bits / hamming 3 is coarser than jaccard — require
    // substantial overlap rather than containment
    if (truth.nonEmpty) {
      val hit = truth.intersect(sim).size.toDouble / truth.size
      info(f"simhash coverage of jac>=0.9 pairs: $hit%.2f")
      assert(hit >= 0.5, s"coverage $hit")
    }
  }

  test("c20 LSH-table near-dup ≡ the all-pairs threshold join (cover proof)") {
    val allPairs = Dedup.queries("c5_dedup_embedding")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.queries("c20_dedup_embedding_lsh")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == allPairs, s"missed: ${allPairs.diff(bucketed)}")
    assert(allPairs.nonEmpty)
  }

  test("c20 skew valve: a degenerate oversized bucket split into triangular " +
      "cells yields the EXACT pair set of the unsplit verify") {
    import org.apache.spark.sql.functions._
    import s.implicits._
    // 60 vectors in just 3 distinct directions → every LSH bucket is a
    // dense clump far above a cap of 8, and near-dup pairs abound
    val vecs = (0L until 60L).map { i =>
      val base = Array.tabulate(64)(k => math.sin((i % 3) + k * 0.1) + 2.0)
      val v = base.map(_ / math.sqrt(base.map(x => x * x).sum))
      (i, v)
    }
    val e = vecs.toDF("vec_id", "nv")
    def pairSet(maxBucket: Int) =
      Dedup.c20Over(e, 4, 2, 0.9, maxBucket).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unsplit = pairSet(Int.MaxValue)
    val split = pairSet(8)
    assert(unsplit.nonEmpty, "fixture must produce qualifying pairs")
    assert(split == unsplit,
      s"valve changed the pair set: missing=${unsplit.diff(split).take(3)} " +
        s"extra=${split.diff(unsplit).take(3)}")
    // and the valve genuinely engaged: buckets of 20 > cap 8 exist
    assert(vecs.size / 3 > 8)
  }

  test("c20 plane-count policy keeps bucket occupancy constant as n grows") {
    assert(Dedup.c20PlanesFor(500) == 3)
    assert(Dedup.c20PlanesFor(64L * 1024) == 10)       // 2^16 / 64 = 2^10
    assert(Dedup.c20PlanesFor(1L << 30) == 24)         // 2^30 / 64 = 2^24
    // monotone non-decreasing
    val ns = Seq(100L, 1000L, 100000L, 10000000L, 1000000000L)
    val ps = ns.map(Dedup.c20PlanesFor(_))
    assert(ps == ps.sorted, ps.toString)
  }

  test("z-range cover is consistent with the z-cell cover (both equal plain bbox)") {
    val viaRanges = StacSearch.queries("a30_zrange_scan")(s, sf)
      .select("id").collect().map(_.getString(0)).toSet
    val viaCells = StacSearch.queries("a24_zcurve_cells")(s, sf)
      .select("id").collect().map(_.getString(0)).toSet
    val plain = StacSearch.queries("a8_bbox")(s, sf)
      .select("id").collect().map(_.getString(0)).toSet
    assert(viaRanges == plain && viaCells == plain)
  }

  test("c40 removal ≡ c24 mask: kept_tokens = n_tokens − dup_tokens, " +
      "and cleaned text re-joins to exactly the kept token count") {
    import graft.ops.Dedup
    val mask = Dedup.queries("c24_dup_passages")(s, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // doc_id -> dup_tokens
    val removed = Dedup.queries("c40_passage_remove")(s, sf).collect()
    assert(removed.nonEmpty)
    var fullyCut = 0
    removed.foreach { r =>
      val (id, n, kept, text) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(kept == n - mask.getOrElse(id, 0L), s"doc $id")
      val rejoined = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(rejoined == kept, s"doc $id: rejoined=$rejoined kept=$kept")
      if (kept == 0) fullyCut += 1
    }
    assert(fullyCut > 0, "expected some fully-duplicated docs in the fixture")
  }

  test("c36 keeps exactly one member per cluster, and it is the best-quality one") {
    val rows = Dedup.queries("c36_cluster_reps")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // full corpus covered, one verdict per document
    val corpus = graft.ops.TextAnalysis.c9TextQuality(s, sf).count()
    assert(rows.length == corpus)
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      val kept = members.filter(_._4 == 1)
      assert(kept.length == 1, s"cluster $cluster kept ${kept.length}")
      // the keeper dominates on (quality desc, doc_id asc)
      val winner = members.minBy(m => (-m._3, m._1))
      assert(kept.head._1 == winner._1,
        s"cluster $cluster kept ${kept.head._1}, best is ${winner._1}")
    }
    // docs outside the near-dup graph are singleton clusters and kept
    val graph = Dedup.queries("c18_dup_clusters")(s, sf).collect()
      .map(_.getLong(0)).toSet
    rows.filterNot(r => graph.contains(r._1)).foreach { r =>
      assert(r._2 == r._1 && r._4 == 1, s"singleton ${r._1} not kept as own cluster")
    }
  }

  test("c48 histogram quantiles land within one bin width of the exact " +
      "per-group percentiles, at every CUBE level") {
    import org.apache.spark.sql.functions._
    val binW = 20L
    val est = ops.TextAnalysis.queries("c48_datasheet_quantiles")(s, sf).collect()
    // exact per-doc word counts, keyed the same way the cube groups them
    val words = core.Tables.documents(s, sf)
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    est.foreach { r =>
      val gid = r.getLong(0)
      val grp = words.filter { case (src, lng, _) =>
        ((gid & 2L) != 0 || src == r.getString(1)) &&
          ((gid & 1L) != 0 || lng == r.getString(2))
      }.map(_._3).sorted
      assert(grp.length == r.getLong(3), s"gid=$gid n_docs mismatch")
      Seq(50 -> r.getLong(4), 90 -> r.getLong(5)).foreach { case (p, lo) =>
        // same ceil-rank definition as the read-off
        val exact = grp((grp.length * p + 99) / 100 - 1)
        assert(lo <= exact && exact < lo + binW,
          s"gid=$gid (${r.getString(1)},${r.getString(2)}) p$p: est_lo=$lo exact=$exact")
      }
    }
    // all four grouping-set levels are present
    assert(est.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("c51: the kept set is the maximal quality-first prefix per source — " +
      "nothing kept below a dropped doc, at least one doc per source") {
    val rows = ops.TextAnalysis.queries("c51_budget_select")(s, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.exists(_._6) && rows.exists(!_._6), "budget should bind")
    rows.groupBy(_._2).foreach { case (src, docs) =>
      // re-derive the greedy prefix independently
      val ranked = docs.sortBy(d => (-d._4, d._1))
      var cum = 0L
      ranked.foreach { d =>
        assert(d._5 == cum, s"$src doc ${d._1}: tokens_before ${d._5} != $cum")
        assert(d._6 == (cum < 600L), s"$src doc ${d._1} kept flag wrong")
        cum += d._3
      }
      assert(docs.count(_._6) >= 1, s"$src kept nothing")
      // prefix property: every kept doc ranks strictly above every dropped one
      val worstKept = ranked.lastIndexWhere(_._6)
      val firstDrop = ranked.indexWhere(!_._6)
      assert(firstDrop == -1 || worstKept < firstDrop,
        s"$src kept a doc ranked below a dropped doc")
    }
  }

  test("c53: coverage is monotone in vocab size and saturates at the " +
      "full vocabulary") {
    val rows = ops.TextAnalysis.queries("c53_coverage_curve")(s, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8, 16, 32))
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted, "not monotone")
    assert(rows.forall(r => r._3 == rows.head._3), "total varies by k")
    // the fixture vocabulary is 31 words → k=32 covers everything
    assert(rows.last._2 == rows.last._3 && rows.last._4 == 10000L)
    assert(rows.head._4 > 0L && rows.head._4 < 10000L)
  }

  test("c56: containment is asymmetric — a short doc quoted inside a long one " +
      "fires containment (src = the short doc) while Jaccard stays low") {
    import s.implicits._
    // doc 1: a 40-word document; doc 2: those same 40 words embedded in
    // 160 words of other text → C(1,2) = 1.0, J ≈ 40/160 = 0.25
    val quote = (1 to 40).map(i => s"q$i").mkString(" ")
    val filler = (1 to 120).map(i => s"f$i").mkString(" ")
    val corpus = Seq(
      (1L, quote),
      (2L, s"$filler $quote"),
      (3L, (1 to 50).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val posting = ops.Dedup.cappedPostingsForTest(corpus)
    val out = ops.Dedup.c56ContainmentOver(posting).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the quote direction fires: src=1 contained in dst=2
    val hit = out.find(r => r._1 == 1L && r._2 == 2L)
    assert(hit.isDefined, s"containment 1→2 missing: ${out.toSeq}")
    assert(hit.get._3 >= 9000L, s"cont_bp ${hit.get._3}")
    assert(hit.get._4 < 6000L, s"Jaccard should be low: ${hit.get._4}")
    // the reverse direction must NOT fire (2 is not contained in 1)
    assert(!out.exists(r => r._1 == 2L && r._2 == 1L), out.toSeq.toString)
    // the unrelated doc pairs with nobody
    assert(!out.exists(r => r._1 == 3L || r._2 == 3L), out.toSeq.toString)
  }

  test("c18 state table: the cluster frame persists on disk and a fresh " +
      "read serves exactly the computed components") {
    val served = ops.Dedup.queries("c18_dup_clusters")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val p = ops.Dedup.c18StatePath(sf)
    assert(new java.io.File(p, "_SUCCESS").exists(), s"no state table at $p")
    // a cold read of the table (bypassing the memo) is the same frame
    val cold = s.read.parquet(p).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"))).sorted
    assert(cold.sameElements(served.sorted))
  }

  test("c57: the split is leakage-free — every dup-cluster member lands on " +
      "the same side, and the test fraction is near the 10% design point") {
    val rows = ops.Dedup.queries("c57_leakfree_split")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    rows.groupBy(_._2).foreach { case (cl, g) =>
      assert(g.map(_._3).distinct.length == 1, s"cluster $cl split across sides")
    }
    val testFrac = rows.count(_._3 == "test").toDouble / rows.length
    assert(testFrac > 0.05 && testFrac < 0.15, s"test fraction $testFrac")
    // multi-member clusters exist in the fixture, so the guarantee bites
    assert(rows.groupBy(_._2).exists(_._2.length > 1))
  }

  test("c55: importance weights separate the target domain — target-source " +
      "docs average a higher per-token score than the rest") {
    val df = ops.TextAnalysis.queries("c55_importance_weight")(s, sf)
    val srcs = core.Tables.documents(s, sf).select("doc_id", "source")
    val rows = df.join(srcs, "doc_id").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_toks"), r.getAs[Long]("score")))
    // Σ_docs score = Σ_buckets corp(b)·(tgt(b)·N − corp(b)·T); the
    // contrast is zero-sum only in expectation, but target-vs-rest
    // separation is the operator's point:
    def meanPerTok(p: ((String, Long, Long)) => Boolean): Double = {
      val xs = rows.filter(p)
      xs.map(_._3.toDouble).sum / xs.map(_._2.toDouble).sum
    }
    val tgt = meanPerTok(_._1 == "src0")
    val rest = meanPerTok(_._1 != "src0")
    assert(tgt > rest, s"target mean/token $tgt !> rest $rest")
  }

  test("c91: FIM construction — spans are non-empty and partition the doc, " +
      "PSM reassembles to the original text, the rate is ~50%, reproducible") {
    val rows = ops.TextAnalysis.queries("c91_fim_construct")(s, sf).collect()
    val texts = core.Tables.documents(s, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val frac = rows.length.toDouble / texts.size
    assert(frac > 0.35 && frac < 0.65, s"transform rate $frac")
    rows.foreach { r =>
      val (p, m, sfx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p >= 1 && m >= 1 && sfx >= 1, r.toString)
      assert(p + m + sfx == r.getLong(1), r.toString)
      // PSM → original round trip
      val t = r.getString(5)
      val pre = t.stripPrefix("<PRE> ")
      val Array(prefix, rest) = pre.split(" <SUF> ", 2)
      val Array(suffix, middle) = rest.split(" <MID> ", 2)
      assert(s"$prefix $middle $suffix" == texts(r.getLong(0)), r.getLong(0).toString)
    }
    // deterministic: a second run selects and cuts identically
    val again = ops.TextAnalysis.queries("c91_fim_construct")(s, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("c87: compression kernel orders repetition < prose < noise, and the " +
      "per-source gate aggregate equals the standalone kernel's recompute") {
    import ops.TextAnalysis.deflatedSize
    // contrast pins on constructed inputs
    val rep = Array.fill(200)("spark").mkString(" ")
    val prose = core.Tables.documents(s, sf).selectExpr("text")
      .orderBy("text").head().getString(0)
    val rng = new scala.util.Random(87)
    val noise = Seq.fill(2000)(rng.nextPrintableChar()).mkString
    def bp(t: String) = deflatedSize(t) * 10000 / t.getBytes("UTF-8").length
    assert(bp(rep) < bp(prose) && bp(prose) < bp(noise),
      s"${bp(rep)} / ${bp(prose)} / ${bp(noise)}")
    // determinism
    assert(deflatedSize(prose) == deflatedSize(prose))
    // pipeline ≡ kernel: recompute the per-source aggregate
    val docs = core.Tables.documents(s, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).view.mapValues { g =>
      val raw = g.map(_._2.getBytes("UTF-8").length.toLong).sum
      val comp = g.map(t => deflatedSize(t._2)).sum
      (g.length.toLong, raw, comp, comp * 10000 / raw)
    }.toMap
    ops.TextAnalysis.queries("c87_compression_ratio")(s, sf).collect().foreach { r =>
      val e = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((e._1, e._2, e._3)), r.toString)
      assert(r.getAs[Long]("ratio_bp") == e._4, r.toString)
    }
  }

  test("c81 isqrt law: the ±1-corrected floor(sqrt(double)) is exactly ⌊√n⌋ " +
      "over randomized longs incl. perfect squares and off-by-one neighbors") {
    import s.implicits._
    val rng = new scala.util.Random(81)
    // mix magnitudes up to 10^15 (corpus-token scale; the c81 doctrine's
    // stated domain) and adversarial k², k²±1 values where the double
    // rounds closest to the boundary
    val raw = Seq.fill(400)(math.abs(rng.nextLong()) % 1000000000000000L) ++
      Seq.fill(200) { val k = math.abs(rng.nextLong()) % 31622776L
        Seq(k * k, k * k - 1, k * k + 1) }.flatten.filter(_ >= 0) ++
      Seq(0L, 1L, 2L, 3L, 4L)
    val got = raw.toDF("n_tokens")
      .selectExpr("n_tokens",
        "CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS r0")
      .selectExpr("n_tokens",
        "r0 + (CASE WHEN (r0+1)*(r0+1) <= n_tokens THEN 1 ELSE 0 END)" +
          " - (CASE WHEN r0*r0 > n_tokens THEN 1 ELSE 0 END) AS isq")
      .collect()
    got.foreach { r =>
      val (n, isq) = (r.getLong(0), r.getLong(1))
      assert(isq * isq <= n && (isq + 1) * (isq + 1) > n, s"isqrt($n) = $isq")
    }
  }

  test("c85: duplication cap — every cluster keeps exactly min(size, 2) " +
      "members, keepers dominate on (quality, doc_id), C36's keeper is kept") {
    val rows = ops.Dedup.queries("c85_dup_cap")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    rows.groupBy(_._2).foreach { case (cl, g) =>
      assert(g.forall(_._3 == g.length), s"cluster $cl copies")
      assert(g.count(_._5 == 1) == math.min(g.length, 2), s"cluster $cl kept")
      // kept ranks are exactly the best ranks
      assert(g.filter(_._5 == 1).map(_._4).sorted.toSeq ==
        (1L to math.min(g.length, 2).toLong), s"cluster $cl ranks")
    }
    // the cap generalizes C36: its single keeper (rank 1) is always kept
    val c36keep = ops.Dedup.queries("c36_cluster_reps")(s, sf).collect()
      .filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    val rank1 = rows.filter(_._4 == 1L).map(_._1).toSet
    assert(rank1 == c36keep)
    // multi-member clusters exist so the cap actually bites
    assert(rows.exists(r => r._3 > 2 && r._5 == 0), "a cluster must exceed the cap")
  }

  test("c83: length outliers — median/MAD recompute exactly, flags match, " +
      "and the robust screen actually fires somewhere") {
    val lens = core.Tables.documents(s, sf)
      .selectExpr("source", "doc_id", "CAST(length(text) AS BIGINT) AS len")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val rows = ops.TextAnalysis.queries("c83_length_outliers")(s, sf).collect()
    var fired = 0L
    rows.foreach { r =>
      val g = lens(r.getString(0)).sortBy(t => (t._3, t._2))
      val med = g((g.length + 1) / 2 - 1)._3
      val devs = g.map(t => (math.abs(t._3 - med), t._2)).sortBy(identity)
      val mad = devs((devs.length + 1) / 2 - 1)._1
      assert(r.getLong(2) == med, s"${r.getString(0)} median")
      assert(r.getLong(3) == mad, s"${r.getString(0)} mad")
      val flagged = devs.count(_._1 > mad * 3)
      assert(r.getLong(4) == flagged, s"${r.getString(0)} flags")
      fired += flagged
    }
    assert(fired > 0, "the screen must fire on the fixture")
    assert(fired < lens.values.map(_.length).sum / 10, "and flag a minority")
  }

  test("c84: template families are exactly the docs sharing a first-8-word " +
      "prefix, singletons excluded, multi-member families exist") {
    val fams = ops.TextAnalysis.queries("c84_template_prefixes")(s, sf).collect()
    val prefixes = core.Tables.documents(s, sf)
      .selectExpr("doc_id", "array_join(slice(split(text, ' '), 1, 8), ' ') AS p")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(fams.nonEmpty, "fixture must contain template families")
    fams.foreach { f =>
      val members = prefixes(f.getString(0))
      assert(f.getLong(1) == members.length && members.length >= 2, f.toString)
      assert(f.getLong(2) == members.min && f.getLong(3) == members.max, f.toString)
    }
    val expected = prefixes.count(_._2.length >= 2)
    assert(fams.length == expected, s"${fams.length} != $expected families")
  }

  test("c80: blocklist drop accounting — dropped docs are exactly those " +
      "containing a blocklisted token, absent list entries hit nothing") {
    import org.apache.spark.sql.functions._
    val rows = ops.TextAnalysis.queries("c80_blocklist_filter")(s, sf).collect()
    val docs = core.Tables.documents(s, sf)
      .select(col("source"), col("doc_id"),
        expr("size(filter(split(text, ' '), x -> x = 'dup'))").as("dup_hits"),
        expr("size(filter(split(text, ' '), x -> x IN ('leak', 'spam')))").as("ghost"))
      .collect()
    assert(docs.forall(_.getAs[Int]("ghost") == 0), "absent words must never match")
    val bySrc = docs.groupBy(_.getString(0))
    rows.foreach { r =>
      val g = bySrc(r.getString(0))
      assert(r.getAs[Long]("n_docs") == g.length, r.toString)
      assert(r.getAs[Long]("n_dropped") == g.count(_.getAs[Int]("dup_hits") > 0), r.toString)
      assert(r.getAs[Long]("banned_hits") == g.map(_.getAs[Int]("dup_hits").toLong).sum, r.toString)
    }
    // the filter must bite somewhere AND keep most of the corpus
    assert(rows.map(_.getAs[Long]("n_dropped")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_dropped")).sum < docs.length / 2)
  }

  test("c81: temperature mix — isqrt is exactly ⌊√n⌋, α-shares sum to ~1, " +
      "and the boost favors low-resource languages monotonically") {
    val rows = ops.TextAnalysis.queries("c81_temperature_mix")(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // α-share basis points sum to 10000 minus at most |langs| floor loss
    val aSum = rows.map(_._4).sum
    assert(aSum > 10000 - rows.length && aSum <= 10000, s"alpha shares sum $aSum")
    // smaller languages get a strictly larger boost (n^(-1/2) is monotone);
    // sort by tokens and require non-increasing boost
    val byTokens = rows.sortBy(_._2)
    assert(byTokens.zip(byTokens.tail).forall { case (lo, hi) => lo._5 >= hi._5 },
      byTokens.mkString(", "))
    // the head language is down-weighted, the tail language up-weighted
    assert(byTokens.head._5 > 10000 && byTokens.last._5 < 10000, byTokens.mkString(", "))
    // cross-check the integer sqrt against BigInt on the real values
    rows.foreach { case (_, n, _, aBp, _) =>
      val isq = math.sqrt(n.toDouble).toLong // fixture n ≪ 2^52: exact after correction
      val exact = Iterator.iterate(isq)(r => if ((r + 1) * (r + 1) <= n) r + 1 else if (r * r > n) r - 1 else r)
        .drop(2).next()
      assert(exact * exact <= n && (exact + 1) * (exact + 1) > n, s"isqrt($n)")
      assert(aBp > 0)
    }
  }

  test("c97: source-overlap matrix is strict upper triangle, containment " +
      "≤ 10000, and a pair's shared-shingle count recomputes exactly") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Dedup.queries("c97_source_overlap")(s, sf).collect()
    assert(rows.nonEmpty, "fixtures share passages across sources")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), r.toString)
      assert(r.getLong(3) > 0 && r.getLong(3) <= 10000, r.toString)
    }
    // recompute the heaviest pair driver-side from raw shingle sets
    val top = rows.maxBy(_.getLong(2))
    val (sa, sb) = (top.getString(0), top.getString(1))
    def shingles(src: String): Set[String] =
      graft.core.Tables.documents(s, sf)
        .where(col("source") === src)
        .selectExpr("split(text, ' ') AS w").where(expr("size(w) >= 8"))
        .selectExpr("explode(transform(sequence(1, size(w) - 7), i -> " +
          "concat_ws(' ', slice(w, i, 8)))) AS g")
        .collect().map(_.getString(0)).toSet
    val shared = shingles(sa).intersect(shingles(sb)).size
    assert(top.getLong(2) == shared, s"$sa/$sb: ${top.getLong(2)} != $shared")
  }

  test("c101: contamination closure — on a crafted graph the transitive " +
      "path fires, eval rows never count, accounting partitions the corpus") {
    import org.apache.spark.sql.functions._
    import TestSpark.spark.implicits._
    // doc 97 is the eval row (97 % 97 == 0) with fp 11; doc 1 matches it
    // directly; docs 1,2,3 share a cluster → 2 and 3 are transitive; doc
    // 4 is clean; doc 5 shares a cluster with nobody contaminated
    val fps = Seq(
      (97L, "eval", 11L), (1L, "a", 11L), (2L, "a", 22L), (3L, "b", 33L),
      (4L, "b", 44L), (5L, "a", 55L), (6L, "a", 66L))
      .toDF("doc_id", "source", "fp")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster")
    val out = graft.ops.Dedup.closureOf(fps, clusters).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("a") == (4L, 1L, 1L, 2L), out.toString) // 1 direct, 2 transitive
    assert(out("b") == (2L, 0L, 1L, 1L), out.toString) // 3 transitive
    assert(!out.contains("eval") || out("eval")._1 == 0,
      "eval rows must not appear as corpus")
    // and the live gate's accounting always partitions the corpus
    val gate = graft.ops.Dedup.queries("c101_contamination_closure")(s, sf).collect()
    gate.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4), r.toString)
    }
  }

  test("c102: clean mixture — clean ≤ raw with a real contamination bite, " +
      "the binding domain is fully taken, takes follow the weights") {
    val rows = graft.ops.TextAnalysis.queries("c102_clean_mixture")(s, sf).collect()
    assert(rows.length >= 2)
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2), r.toString))
    assert(rows.exists(r => r.getLong(3) < r.getLong(2)),
      "contamination must actually remove tokens from some domain")
    assert(rows.exists(_.getLong(5) == 10000L),
      "the binding domain must be taken completely")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "cannot take more than clean avail")
    }
    // take_tokens follow the waterfilling rule exactly: the shared budget
    // is the min over domains of clean·10 DIV wt, each take = T·wt DIV 10
    val t = rows.map(r => r.getLong(3) * 10 / r.getLong(1)).min
    rows.foreach { r =>
      assert(r.getLong(4) == t * r.getLong(1) / 10,
        s"take ≠ T·wt DIV 10 for ${r.getString(0)} (T=$t): $r")
    }
  }

  test("c98: minhash calibration — estimates are multiples of 1/8 in bp, " +
      "true Jaccard recomputes exactly on the heaviest pair, error bounded") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Dedup.queries("c98_minhash_calibration")(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) % 1250 == 0, s"est must be k/8: $r") // 10000/8
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000, r.toString)
      assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)), r.toString)
    }
    // independent recompute of true Jaccard for the first pair
    val r0 = rows.head
    def grams(id: Long): Set[String] = {
      val txt = graft.core.Tables.documents(s, sf)
        .where(col("doc_id") === id).select("text").collect()(0).getString(0)
      val w = txt.split(' ')
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val (a, b) = (grams(r0.getLong(0)), grams(r0.getLong(1)))
    val expect = a.intersect(b).size.toLong * 10000 / (a.size + b.size - a.intersect(b).size)
    assert(r0.getLong(3) == expect, s"true_bp ${r0.getLong(3)} != $expect")
  }

  test("c93: histogram ranks are exactly competition ranks (1 + #strictly " +
      "better), ties share a rank, and fusion reorders vs any single signal") {
    val out = graft.ops.TextAnalysis.queries("c93_rank_fusion")(s, sf).collect()
    val sig = graft.core.Tables.documents(s, sf)
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS s_len",
        "CAST(size(array_distinct(split(text, ' '))) * 10000 DIV size(split(text, ' ')) AS BIGINT) AS s_div")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lens = sig.map(_._2)
    val divs = sig.map(_._3)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(out.length == sig.length)
    sig.foreach { case (id, len, dv) =>
      val r = byId(id)
      assert(r.getLong(1) == 1 + lens.count(_ > len), s"doc $id r_len")
      assert(r.getLong(2) == 1 + divs.count(_ > dv), s"doc $id r_div")
      assert(r.getLong(4) ==
        3L * sig.length - r.getLong(1) - r.getLong(2) - r.getLong(3))
    }
    // ties share the rank: some signal must actually have a tie in fixtures
    assert(lens.distinct.length < lens.length, "fixture should tie on length")
    // fusion is not just one signal in disguise
    val byBorda = out.sortBy(r => (-r.getLong(4), r.getLong(0))).map(_.getLong(0))
    val byLen = out.sortBy(r => (r.getLong(1), r.getLong(0))).map(_.getLong(0))
    assert(byBorda.toSeq != byLen.toSeq, "fusion must differ from rank-by-length")
  }
}
