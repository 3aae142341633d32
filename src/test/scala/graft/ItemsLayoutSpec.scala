package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.core.{ItemsLayout, Tables}

class ItemsLayoutSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("materialized layout: collection filter is a partition prune, datetime pushes down") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_items_layout").toString
    try {
      val items = Tables.items(s, sf)
      ItemsLayout.materialize(items, tmp)
      val back = ItemsLayout.read(s, tmp)
      assert(back.count() == items.count())

      val q = back.where(col("collection") === "click")
        .where(col("datetime") >= lit("2024-01-10 00:00:00").cast("timestamp"))
      val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
      // directory-level pruning on the partition column
      assert(p.contains("PartitionFilters") &&
        p.split('\n').exists(l => l.contains("PartitionFilters") && l.contains("collection")), p)
      // row-group-level pruning on the sorted datetime column
      assert(p.split('\n').exists(l => l.contains("PushedFilters") &&
        l.contains("GreaterThanOrEqual(datetime")), p)
      // result equality vs the unmaterialized view
      val expected = Tables.items(s, sf)
        .where(col("collection") === "click")
        .where(col("datetime") >= lit("2024-01-10 00:00:00").cast("timestamp"))
        .select("id").collect().map(_.getLong(0)).toSet
      val got = q.select("id").collect().map(_.getLong(0)).toSet
      assert(got == expected)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}
