package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.core.{DocumentsLayout, Tables}

/** Write-layout audit for the documents corpus, mirroring
  * ItemsLayoutSpec: the layout's value is that pipeline predicates become
  * I/O pruning, so that is what's asserted — directory pruning on the
  * source partition, pushed fingerprint range filters, and (via the
  * parquet footers) row-group min/max stats that actually exclude
  * non-overlapping row groups.
  */
class DocumentsLayoutSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("documents layout: source prunes directories, fingerprint range prunes row groups") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_docs_layout").toString
    try {
      val docs = Tables.documents(s, sf)
      DocumentsLayout.materialize(docs, tmp)
      val back = DocumentsLayout.read(s, tmp)
      assert(back.count() == docs.count())

      // probe range = the middle ~quarter of the observed fingerprints
      val fps = docs.select(DocumentsLayout.fingerprintCol.as("fp"))
        .collect().map(_.getLong(0)).sorted
      val (lo, hi) = (fps(fps.length * 3 / 8), fps(fps.length * 5 / 8))

      val q = back.where(col("source") === "src1")
        .where(col("fingerprint").between(lo, hi))
      val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
      // directory-level pruning on the partition column
      assert(p.split('\n').exists(l =>
        l.contains("PartitionFilters") && l.contains("source")), p)
      // fingerprint range reaches parquet as pushed filters
      assert(p.split('\n').exists(l => l.contains("PushedFilters") &&
        l.contains("GreaterThanOrEqual(fingerprint")), p)

      // footer audit: each row group carries min/max stats on the sorted
      // fingerprint column, ranges are (near-)disjoint by construction,
      // and the probe range overlaps only a minority of them — the row
      // groups a reader actually skips.
      val conf = s.sessionState.newHadoopConf()
      val files = new java.io.File(tmp).listFiles.filter(_.getName.startsWith("source="))
        .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
      val rowGroupBounds = files.toSeq.flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.map { b =>
            val st = b.getColumns.asScala
              .find(_.getPath.toDotString == "fingerprint").get.getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }.toSeq
        } finally r.close()
      }
      assert(rowGroupBounds.size >= 8, s"expected >=8 row groups, got ${rowGroupBounds.size}")
      val overlapping = rowGroupBounds.count { case (mn, mx) => mx >= lo && mn <= hi }
      assert(overlapping < rowGroupBounds.size / 2,
        s"probe range [$lo,$hi] overlaps $overlapping of ${rowGroupBounds.size} row groups — no pruning")

      // correctness: pruned scan ≡ recompute on the raw table
      val expected = docs
        .withColumn("fp", DocumentsLayout.fingerprintCol)
        .where(col("source") === "src1" && col("fp").between(lo, hi))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val got = q.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}
