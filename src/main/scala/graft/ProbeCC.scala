package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the connected-components kernel's two physical paths
  * (docs/PERF.md): synthesizes a dup-graph-shaped edge set — many small
  * clusters plus a few long chains (the diameter case pointer-doubling
  * exists for) — and times the driver union-find against the distributed
  * hop+double loop on the SAME edges, asserting identical labels. The
  * measured crossover justifies [[graft.ops.Dedup]]'s 2M-edge ceiling:
  * below it the collect+union-find wins on round-trip latency, above it
  * the loop's per-round shuffles amortize and the driver path's single
  * collect stops scaling. Usage: `runMain graft.ProbeCC [nEdges ...]`.
  */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(200000, 1000000, 4000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sizes.foreach { n =>
      // clusters of ~8 around multiples of 8 (LSH-bucket shape), plus 4
      // chains of length n/100 (the high-diameter tail); symmetric
      val base = spark.range(n / 2)
        .select((col("id") - col("id") % 8).as("src"), col("id").as("dst"))
        .where(col("src") =!= col("dst"))
      val chainLen = math.max(2, n / 100)
      val chains = spark.range(4L * chainLen)
        .select((col("id") + lit(1000000000L)).as("src"),
          (col("id") + lit(1000000001L)).as("dst"))
        .where((col("id") + 1) % chainLen =!= 0) // break into 4 chains
      val half = base.unionAll(chains)
      // each path gets its OWN checkpointed frame: both kernels unpersist
      // their input when done, so a shared frame would be freed under the
      // second caller (the synthesis is a cheap deterministic range plan)
      def edges() = half
        .unionAll(half.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      val first = edges()
      val nEdges = first.count()

      def time[T](what: String)(body: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe-cc] n=$nEdges%,d $what%-12s $dt%8.2f s")
        (r, dt)
      }
      val (drv, _) = time("driver-uf") {
        graft.ops.Dedup.ccMinLabelDriver(first).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      val (loop, _) = time("dist-loop") {
        // give the loop the graph-sized shuffle width production
        // ccMinLabel would pick, so its numbers are its best case
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        val width = math.max(1L, math.min(prev.toLong, nEdges / 200000L + 1L))
        spark.conf.set("spark.sql.shuffle.partitions", width.toString)
        try graft.ops.Dedup.ccMinLabelLoop(edges()).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
      require(drv == loop, s"paths disagree at n=$nEdges")
      println(s"[probe-cc] n=$nEdges labels identical across paths")
    }
    spark.stop()
  }
}
