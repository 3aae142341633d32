package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production storage layout for the items corpus (SURVEY.md §3.1).
  *
  * The reference scans one GeoParquet URL per collection and UNION ALLs
  * (database_logic.py:831-853). At 100 TB the corpus should instead be ONE
  * dataset laid out so the query predicates become I/O pruning:
  *
  *  - `partitionBy(collection)` — a collections filter prunes directories
  *    before any file is opened (`PartitionFilters` in the scan);
  *  - sorted within partitions by `(datetime, id)` — parquet row-group
  *    min/max stats make datetime ranges skip row groups
  *    (`PushedFilters`), and the id tiebreak keeps keyset pagination
  *    aligned with the physical order;
  *  - at larger scale add the Z-order cell (StacSearch.a24) as a second
  *    partition level for spatial pruning.
  */
object ItemsLayout {

  /** Materialize an items DataFrame in the production layout. */
  def materialize(items: DataFrame, path: String): Unit =
    items
      .repartition(col("collection"))
      .sortWithinPartitions(col("collection"), col("datetime"), col("id"))
      .write.partitionBy("collection").mode("overwrite").parquet(path)

  /** Read back a materialized items table. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Z-ordered spatial layout: the Z-cell is STORED and the data is
    * range-partitioned + sorted by it, so a bbox query's OR-of-BETWEENs
    * over the merged z-ranges (StacSearch.zRangesSplit) prunes at BOTH
    * levels — file skipping from the range partitioning, row-group
    * skipping from parquet min/max stats on the sorted column. This is the
    * 100 TB spatial layout; ItemsLayoutSpec audits the pushed filters.
    */
  def materializeZOrdered(items: DataFrame, zcell: org.apache.spark.sql.Column,
                          path: String): Unit =
    items.withColumn("zcell", zcell)
      .repartitionByRange(col("zcell"), col("id"))
      .sortWithinPartitions(col("zcell"), col("id"))
      .write.mode("overwrite").parquet(path)
}
