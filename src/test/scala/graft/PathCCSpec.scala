package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PathCCSpec extends AnyFunSuite {
  test("hop+double CC on a 512-path converges in O(log n) rounds") {
    val s = TestSpark.spark
    import s.implicits._
    val n = 512
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("d1", "d2")
    val edges = pairs.union(pairs.select(col("d2"), col("d1")))
      .toDF("src", "dst").localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node")).localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      val prop = edges.join(labels, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("lab")).as("cand"))
      val hopped = labels.join(prop, col("node") === col("dst"), "left")
        .select(col("node"), col("lab").as("old_lab"),
          least(col("lab"), coalesce(col("cand"), col("lab"))).as("lab1"))
      val l2 = hopped.select(col("node").as("pnode"), col("lab1").as("plab"))
      val step = hopped.join(l2, hopped("lab1") === l2("pnode"), "left")
        .select(hopped("node"), hopped("old_lab"),
          least(hopped("lab1"), coalesce(l2("plab"), hopped("lab1"))).as("lab"))
        .localCheckpoint(true)
      changed = step.where(col("lab") < col("old_lab")).count()
      rounds += 1
      labels = step.select(col("node"), col("lab"))
    }
    info(s"rounds=$rounds")
    val labs = labels.collect().map(r => r.getLong(1)).toSet
    assert(labs == Set(0L), s"all nodes should label 0, got $labs")
    assert(rounds <= 12, s"expected O(log n) rounds, got $rounds")
  }
}
