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
}
