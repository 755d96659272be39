package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables.t

/** Multimodal-column plumbing (SURVEY.md §2.10 x_multimodal_cols).
  *
  * Media payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct beside them — the pattern a 100 TB training-data
  * pipeline uses for image/audio/video. The decode step is STUBBED (this
  * container has no media codecs — deterministic fake dimensions derived
  * from the bytes); everything Spark-side is real: schema, batch shape,
  * partition-parallel extraction, metadata pushdown-friendly layout.
  *
  * Two implementations:
  *  - `metaColumns`: pure-Column (codegen) version used by the oracle query;
  *  - `extractMetaPartitions`: `mapPartitions` over a typed Dataset — the
  *    seam where a real decoder (JNI/codec lib) would batch-process payloads
  *    per partition, mirrored after Python's `mapInPandas` batch UDF shape.
  */
object MultimodalOps {

  /** Typed row for the mapPartitions decode seam. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed decode result — dims are a DETERMINISTIC FAKE of a real decode. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, fake_width: Int, fake_height: Int)

  /** STUB decoder: a real implementation would parse the container header
    * (PNG/JPEG/WAV...). Deterministic fake so tests are stable. */
  private def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val n = payload.length
    val first = if (n > 0) payload(0) & 0xff else 0
    (n % 640, (first * 7) % 480)
  }

  /** The batch-decode seam: partition-parallel, zero driver involvement. */
  def extractMetaPartitions(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decodeStub(r.payload)
        MediaMeta(r.doc_id, r.payload.length, w, h)
      }
    }
  }

  /** documents.text cast to binary plays the opaque media payload. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_multimodal_meta" -> ((s, d) => {
      // pure-Column twin of extractMetaPartitions (oracle-comparable):
      // byte length, first-4-bytes hex magic, stub-decoded dimensions
      mediaTable(s, d)
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"), // duck BIGINT
          upper(substring(hex(col("payload")), 1, 8)).as("magic"),
          (length(col("payload")) % 640).cast("long").as("fake_width"),
          ((ascii(col("payload").cast("string")) * 7) % 480).as("fake_height"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x_multimodal_meta" ->
      """SELECT doc_id,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         upper(substr(hex(CAST(text AS BLOB)), 1, 8)) AS magic,
         octet_length(CAST(text AS BLOB)) % 640 AS fake_width,
         (ascii(text) * 7) % 480 AS fake_height
         FROM documents ORDER BY doc_id"""
  )
}
