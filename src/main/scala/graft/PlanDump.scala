package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val picks = Seq(
      "a22_combined_search" -> "Flagship search: every filter pushed, TakeOrderedAndProject page",
      "a18_count" -> "numMatched: count over pruned columns only",
      "a35_footprint_intersects" -> "Box-footprint ∩ concave polygon: envelope prune + codegen'd exact kernel",
      "b5_star_join" -> "Star join: all dimensions broadcast",
      "b18_asof_join" -> "As-of join: union-merge, ONE shuffle+sort, running last() window",
      "c2_dedup_minhash" -> "MinHash LSH: inline-explode-hash-partial-agg, bucket pair expansion",
      "c6_ann_bruteforce" -> "Brute-force ANN: query set broadcast, corpus streams",
      "c14_ann_ivf" -> "IVF ANN: shuffle-free centroid assignment (inlined seed argmax projection)",
      "c17_keyword_search" -> "tf-idf: one stats pass broadcast into the scorer, 2 corpus scans",
      "c20_dedup_embedding_lsh" -> "Bucketed embedding near-dup: LSH tables, no cartesian",
      "d2_sessionize" -> "Sessionization: one shuffle reused by windows + groupBy",
      "a70_agg_bundle" -> "Aggregations bundle: ONE scan + Expand + shuffle for every granularity",
      "c92_semantic_decon" -> "Semantic decon: eval set broadcast, corpus streams, per-row max/count",
      "c93_rank_fusion" -> "Rank fusion: value-histogram ranks broadcast back — no global sort",
      "c105_perplexity_mixture" -> "Perplexity-filtered mixture: joinless over the memoized LM bucket frame",
      "a87_catalog_source" -> "Catalog DataSource V2: plan-time footer file prune, filters pushed",
      "a88_polygon_footprint" -> "True-polygon relations: scan + one codegen'd projection of exact kernels",
      "a89_catalog_coldt_prune" -> "Catalog collection+datetime prune: sidecar constraints from the pushed tree",
      "c103_classifier_train" -> "NB training: rebalanced corpus pass, one map-side-combined aggregation",
      "c16_curation_pipeline" -> "Curation: one scan, min_by exact dedup, survivors' exchange reused (r12)",
      "c53_coverage_curve" -> "Coverage curve: distributed TakeOrdered head, NO vocab-wide window (r12)",
      "c97_source_overlap" -> "Source overlap: one shingle exchange, in-row pair expansion, no self-join (r12)",
      "c74_source_vocab_sim" -> "Vocab similarity: one corpus pass, norms off the pair diagonal (r12)",
      "a95_line_footprint" -> "Non-areal stored WKB relations: scan + one codegen'd kernel projection (r12)")
    val out = new StringBuilder
    out ++= "# Physical plans (generated snapshot, sf0.01)\n\n"
    out ++= "Regenerate: `sbt \"runMain graft.PlanDump\"` (writes docs/PLANS.md).\n"
    picks.foreach { case (name, caption) =>
      val p = SparkEntry.queries(name)(s, d).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      out ++= s"\n## $name — $caption\n\n```\n$p```\n"
    }
    Files.writeString(Paths.get("docs/PLANS.md"), out.toString)
    println("WROTE docs/PLANS.md " + out.length)
    s.stop()
  }
}
