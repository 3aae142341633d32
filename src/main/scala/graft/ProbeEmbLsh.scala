package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the EMBEDDING-LSH near-dup path (docs/PERF.md) — the
  * in-bucket CosinePairs verify at corpus sizes far beyond the fixtures.
  * Synthesizes n deterministic 64-dim vectors (md5-lane pseudo-randoms,
  * normalized) with a FIXED duplication rate: every 50th vector copies
  * its neighbor, so planted near-dup pairs = n/50 by construction, and
  * unrelated random vectors sit near cosine 0 (≈N(0, 1/64 per dim) — far
  * below any realistic near-dup threshold). Planes/tables come from the
  * production scale policy ([[graft.ops.Dedup.c20PlanesFor]] /
  * `c20TablesFor`) at designCos = 0.95 — the NEAR-EXACT regime real
  * embedding dedup runs at — and the report shows the numbers the 100 TB
  * question turns on: the table count b (sign-LSH's b× shuffle
  * amplification, the OR-construction's honest cost — it explodes as the
  * design threshold drops, which is why the sub-0.8 regime belongs to
  * C38's IVF-bucketed semantic dedup instead), in-bucket candidate
  * volume (Σ C(|bucket|, 2) — the verify FLOPs), survivors vs planted,
  * and wall time. Linear candidate growth with total planted recall is
  * the evidence the bucket-first + in-bucket-verify design stands on.
  * Usage: `runMain graft.ProbeEmbLsh [n …]`.
  */
object ProbeEmbLsh {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(250000, 500000, 1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup

    val designCos = 0.95
    sizes.foreach { n =>
      val planes = Dedup.c20PlanesFor(n.toLong)
      val tables = Dedup.c20TablesFor(planes, designCos)
      // vec id%50==1 copies vector id-1 (seed = id-1); 64 dims from md5
      // lanes mapped to [-1, 1], then L2-normalized — deterministic, no
      // data files needed.
      val e = spark.range(n).select(col("id").as("vec_id"),
          expr("""transform(sequence(0, 63), i -> CAST(
                 |  CAST(conv(substr(md5(concat(
                 |    CAST(IF(id % 50 = 1 AND id > 0, id - 1, id) AS STRING),
                 |    ':', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT)
                 |  % 2001 - 1000 AS DOUBLE) / 1000.0)"""
            .stripMargin.replace("\n", " ")).as("v"))
        .withColumn("nrm", sqrt(graft.functions.DotProduct(col("v"), col("v"))))
        .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("nv"))
        // stage the synthetic corpus: 64 md5 derivations per vector is
        // probe scaffolding, not the operator under test, and both the
        // timed pass and the candidate diagnostic read it
        .localCheckpoint(true)

      // timed section = the production dedup query (bucket shuffle →
      // in-bucket verify → survivor distinct); the candidate-volume
      // diagnostic is a separate untimed pass over the same plan (the
      // bucket frame is tables × corpus and must stream, not materialize)
      val t0 = System.nanoTime()
      val found = Dedup.c20Buckets(e, tables, planes)
        .select(explode(graft.functions.CosinePairs(col("vs"), designCos)).as("p"))
        .select(col("p.v1"), col("p.v2")).distinct().count()
      val dt = (System.nanoTime() - t0) / 1e9
      val cand = Dedup.c20Buckets(e, tables, planes)
        .agg(sum(expr("CAST(size(vs) AS BIGINT) * (size(vs) - 1) DIV 2")))
        .collect()(0).getLong(0)
      val planted = n / 50
      println(f"[probe-emb-lsh] n=$n%8d  planes=$planes%2d tables=$tables%3d  " +
        f"in-bucket pairs=$cand%11d  found=$found%7d / planted=$planted%7d  " +
        f"time=$dt%7.2fs (${n / dt}%.0f vec/s)")
    }
    spark.stop()
  }
}
