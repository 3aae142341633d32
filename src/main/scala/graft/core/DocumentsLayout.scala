package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production storage layout for the documents corpus — the write-side
  * counterpart of [[ItemsLayout]] for the LLM-pipeline tables.
  *
  * The dedup/decontamination pipeline (C11/C18/C19/C25) probes documents
  * by content FINGERPRINT (point lookups of suspected duplicates, range
  * scans of cluster neighborhoods, anti-join verification of bloom hits),
  * and curation queries slice by SOURCE/domain. The layout turns both
  * predicates into I/O pruning:
  *
  *  - `partitionBy(source)` — a source filter prunes directories before
  *    any file is opened (`PartitionFilters` in the scan);
  *  - range-partitioned + sorted within files by `(fingerprint, doc_id)`
  *    — the fingerprint is STORED (computed once at write time, not per
  *    query) and each file/row group covers a disjoint fingerprint range,
  *    so a fingerprint range probe skips every non-overlapping row group
  *    via parquet min/max stats (`PushedFilters`).
  *
  * At 100 TB the same shape holds with more range buckets: bucket count
  * scales with corpus size so files stay row-group sized, and the range
  * exchange samples only the narrow (fingerprint, source) columns.
  */
object DocumentsLayout {

  /** The stored fingerprint column: C11's codegen'd rolling hash. */
  def fingerprintCol: Column = graft.functions.RollingHash(col("text"))

  /** Materialize a documents DataFrame in the production layout. */
  def materialize(docs: DataFrame, path: String, rangeBuckets: Int = 8): Unit =
    docs
      .withColumn("fingerprint", fingerprintCol)
      .repartitionByRange(rangeBuckets, col("fingerprint"), col("doc_id"))
      .sortWithinPartitions(col("fingerprint"), col("doc_id"))
      .write.partitionBy("source").mode("overwrite").parquet(path)

  /** Read back a materialized documents table. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
