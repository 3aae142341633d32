package graft

import org.apache.spark.sql.SparkSession

/** Per-gate repeat timer: runs named `SparkEntry.queries` gates K times in
  * one warm session and prints each run, separating steady-state cost from
  * first-run JIT/codegen/state-build noise (the Bench harness times one
  * pass of everything, so a gate's number there carries whatever warmup it
  * happened to pay). Usage:
  * `runMain graft.ProbeGate <sfDir> <gate[,gate...]> [reps]`
  */
object ProbeGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Confs PINNED to Bench.scala's: the r9 judge measured a 7× divergence
    // on identical code (c90 7.6 s under default-AQE ProbeGate vs 1.05 s
    // under Bench) — every steady-state number this probe prints must be
    // comparable to the bench harness, so the two builders must not drift.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup on a cheap unrelated gate
    SparkEntry.queries("c1_dedup_exact")(spark, sfDir).collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-32s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f s")
    }
    spark.stop()
  }
}
