package graft.sources

import java.util.{Map => JMap, Set => JSet}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual,
  LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.GeoParquet

/** `geocatalog` — a DataSource V2 over the exported GeoParquet catalog
  * (core/GeoParquet.export) whose FILE PRUNE runs at PLANNING time from
  * pushed filters: the explicit two-step the engine exposed until now
  * (`searchBboxPruned`: read footers, pick files, read those) becomes
  * `spark.read.format("geocatalog").load(dir).where(bbox ranges)` — the
  * scan itself opens only files whose spec'd `geo` footer bbox can
  * contain a matching row. This is the catalog-level analogue of parquet
  * row-group skipping expressed in the engine's own planning: at 100 TB
  * the metadata plane is O(files) and the data plane shrinks to the
  * query's region before the first row is read.
  *
  * Pushdown semantics are CONSERVATIVE and double-checked: a footer bbox
  * [W, S, E, N] folds min(xmin)/min(ymin)/max(xmax)/max(ymax) over the
  * file's rows, so exactly four filter shapes prune —
  * `bbox.xmin <= v` (needs W <= v), `bbox.xmax >= v` (needs E >= v),
  * `bbox.ymin <= v` (needs S <= v), `bbox.ymax >= v` (needs N >= v), in
  * <=/< and >=/> variants. Every filter (pruning or not) is ALSO
  * returned as a post-scan filter, so Spark re-evaluates rows and a
  * too-aggressive prune could only ever lose rows — which the A85-family
  * oracles (full scans) would catch as a hash break, and the footers are
  * written exact. Column pruning maps straight onto the reader: only
  * requested fields are materialized into rows.
  *
  * Reference: this is the engine-native form of the reference's
  * per-collection GeoParquet store (database_logic.py:831-853 plans
  * per-collection scans over downloaded files).
  */
class GeoCatalogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoCatalogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GeoCatalogTable(properties.get("path"))
}

object GeoCatalogSource {
  /** The export writer's schema (core/GeoParquet.schema) in Spark types —
    * the writer and this source are two views of one fixed layout, so the
    * schema is declared, not inferred per file.
    */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("id_num", LongType, nullable = false),
    StructField("collection", StringType, nullable = false),
    StructField("datetime", TimestampNTZType, nullable = true),
    StructField("start_datetime", TimestampNTZType, nullable = true),
    StructField("end_datetime", TimestampNTZType, nullable = true),
    StructField("value", DoubleType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("bbox", StructType(Seq(
      StructField("xmin", DoubleType, nullable = false),
      StructField("ymin", DoubleType, nullable = false),
      StructField("xmax", DoubleType, nullable = false),
      StructField("ymax", DoubleType, nullable = false))), nullable = false),
    StructField("geometry", BinaryType, nullable = false)))
}

private class GeoCatalogTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "geocatalog requires a path")
  override def name(): String = s"geocatalog($path)"
  override def schema(): StructType = GeoCatalogSource.schema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoCatalogScanBuilder(path)
}

private class GeoCatalogScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GeoCatalogSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(f => GeoCatalogScan.constraintOf(f).isDefined)
    filters // every filter stays post-scan: the prune is file-granular
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GeoCatalogScan(path, accepted, required)
}

/** One catalog file = one partition; the footer prune happens HERE, at
  * plan time — `description()` records files kept/total so the decision
  * is visible in `explain`.
  */
private class GeoCatalogScan(path: String, pushed: Array[Filter],
                             required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private lazy val (kept, total) = {
    val footers = GeoParquet.footerBboxes(path).toSeq.sortBy(_._1)
    val cs = pushed.flatMap(GeoCatalogScan.constraintOf)
    val keep = footers.collect {
      case (name, b) if cs.forall(_(b)) => s"$path/$name.parquet"
    }
    (keep, footers.size)
  }

  override def description(): String =
    s"geocatalog $path footer-pruned files ${kept.size}/$total, " +
      s"pushed [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    kept.map(f => GeoCatalogPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GeoCatalogReaderFactory(required)
}

private object GeoCatalogScan {
  /** The file-level constraint a pushed filter implies, as a predicate
    * over the footer bbox [W, S, E, N] — None = not prunable. Strict and
    * non-strict variants share bounds: footer extremes are attained by
    * real rows, so `xmin < v` admits a file iff W < v, etc.
    */
  def constraintOf(f: Filter): Option[Seq[Double] => Boolean] = f match {
    case LessThanOrEqual("bbox.xmin", v: Double) => Some(b => b(0) <= v)
    case LessThan("bbox.xmin", v: Double) => Some(b => b(0) < v)
    case GreaterThanOrEqual("bbox.xmax", v: Double) => Some(b => b(2) >= v)
    case GreaterThan("bbox.xmax", v: Double) => Some(b => b(2) > v)
    case LessThanOrEqual("bbox.ymin", v: Double) => Some(b => b(1) <= v)
    case LessThan("bbox.ymin", v: Double) => Some(b => b(1) < v)
    case GreaterThanOrEqual("bbox.ymax", v: Double) => Some(b => b(3) >= v)
    case GreaterThan("bbox.ymax", v: Double) => Some(b => b(3) > v)
    case _ => None
  }
}

private case class GeoCatalogPartition(file: String) extends InputPartition

private class GeoCatalogReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GeoCatalogReader(p.asInstanceOf[GeoCatalogPartition].file, required)
}

/** Row reader over one catalog file via parquet-mr's example Group API —
  * the catalog's files are the engine's OWN export (fixed schema), so a
  * simple record reader suffices; only the fields the scan requires are
  * materialized.
  */
private class GeoCatalogReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(new Configuration()).build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  private def fieldValue(g: Group, f: StructField): Any = {
    val present = g.getType.containsField(f.name) &&
      g.getFieldRepetitionCount(f.name) > 0
    if (!present) return null
    f.dataType match {
      case StringType => UTF8String.fromString(g.getString(f.name, 0))
      case LongType => g.getLong(f.name, 0)
      case DoubleType => g.getDouble(f.name, 0)
      case TimestampNTZType => g.getLong(f.name, 0) // already micros
      case BinaryType => g.getBinary(f.name, 0).getBytes
      case st: StructType =>
        val sub = g.getGroup(f.name, 0)
        new GenericInternalRow(st.fields.map(sf => fieldValue(sub, sf)))
      case other => throw new IllegalStateException(s"unsupported $other")
    }
  }

  override def get(): InternalRow =
    new GenericInternalRow(required.fields.map(f => fieldValue(current, f)))

  override def close(): Unit = reader.close()
}
