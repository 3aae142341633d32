package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** C12: multimodal binary-column pipeline (SURVEY.md §2.C).
  *
  * Media is carried as an opaque `binary` payload column with a typed
  * metadata struct — never parsed by the engine, so scans of non-media
  * columns prune it away entirely (parquet column pruning). The decode /
  * feature-extract step is STUBBED deterministically (no image/audio libs
  * in this environment); the Spark-side plumbing — schema, per-partition
  * batching, feature vector shape — is real and unit-tested
  * (MultimodalSpec).
  *
  * The gate query `c12_multimodal` verifies the relational half against
  * the DuckDB oracle: payload byte length, metadata derivation, content
  * hash, and a byte-statistic "feature" — everything except the faked
  * codec call.
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  case class Media(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** Extracted features per media row. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, feature: Array[Float])

  private val featDim = 8

  /** STUB decode/feature-extract: a real build would call an image/audio
    * codec here (???). Deterministic fake: folds payload bytes into a
    * fixed-width feature vector — stable across runs and partitionings.
    */
  def decodeStub(m: Media): MediaFeatures = {
    val acc = new Array[Long](featDim)
    var i = 0
    while (i < m.payload.length) {
      acc(i % featDim) += (m.payload(i) & 0xff).toLong
      i += 1
    }
    MediaFeatures(m.doc_id, m.payload.length,
      acc.map(v => (v % 1000L).toFloat / 1000f))
  }

  /** Media table: documents with the text re-cast as the binary payload
    * plus deterministic metadata. In production this is the parquet schema
    * itself — payload column written as BYTE_ARRAY with metadata columns
    * beside it.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        ((col("doc_id") % 64) + 16).cast("int").as("width"),
        (((col("doc_id") * 7) % 64) + 16).cast("int").as("height"))
      .as[Media]
  }

  /** The batched decode pipeline: partition-local batching (the shape a
    * vectorized codec / model-inference call needs), no shuffle, no
    * driver round-trip. Batch size bounds peak memory per task.
    */
  def featurize(s: SparkSession, d: String, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, d).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real codec would process `batch` as one vectorized call
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Gate query: the oracle-checkable relational half of the pipeline. */
  def c12Multimodal(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        ((col("doc_id") % 64) + 16).as("width"),
        (((col("doc_id") * 7) % 64) + 16).as("height"),
        md5(col("text")).as("content_hash"),
        expr("CAST(aggregate(filter(split(text, ''), c -> c <> ''), " +
          "CAST(0 AS BIGINT), (a, c) -> a + ascii(c)) AS DOUBLE) / " +
          "CAST(length(text) AS DOUBLE)").as("mean_byte"))
      .orderBy(col("doc_id"))

  val c12Sql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  (doc_id % 64) + 16 AS width,
      |  ((doc_id * 7) % 64) + 16 AS height,
      |  md5(text) AS content_hash,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(list_filter(string_split(text, ''), c -> c <> ''),
      |      c -> CAST(ascii(c) AS BIGINT))), (a, c) -> a + c) AS DOUBLE) /
      |    CAST(length(text) AS DOUBLE) AS mean_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c12_multimodal" -> (c12Multimodal _)
  )

  val oracle: Map[String, String] = Map(
    "c12_multimodal" -> c12Sql
  )
}
