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

  /** Typed row for the feature-extract seam: a 16-bin byte-value histogram
    * per payload — the feature vector a real pipeline would hand to an
    * embedding model. Unlike the decode stub this is REAL computation over
    * the bytes, exercising the exact batch shape a codec would use. */
  case class MediaFeatures(doc_id: Long, histogram: Array[Long])

  /** Feature extraction over payload bytes, one pass per partition. */
  def byteHistogramPartitions(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bins = new Array[Long](16)
        var i = 0
        while (i < r.payload.length) {
          bins((r.payload(i) & 0xff) >> 4) += 1
          i += 1
        }
        MediaFeatures(r.doc_id, bins)
      }
    }
  }

  /** Frame sampling over an opaque payload: K fixed-width slices at evenly
    * spaced offsets — the video-frame-sample plumbing with a byte window
    * standing in for a decoded frame. Offset arithmetic is identical in
    * both engines (double floor, then int). */
  private val FrameLen = 8
  private val NFrames = 4

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
    }),

    "x_frame_sample" -> ((s, d) => {
      // K evenly spaced fixed-width slices per payload (frame sampling);
      // explode(sequence) fans out row-per-frame WITHOUT shuffling — a
      // Generate node inside the scan stage
      val doc = t(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("frame_idx",
          explode(sequence(lit(0), lit(NFrames - 1))))
      val span = greatest(length(col("text")) - FrameLen, lit(0))
      val pos = lit(1) +
        floor((span * col("frame_idx")) / lit((NFrames - 1).toDouble))
          .cast("int")
      doc.select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          upper(hex(col("text").substr(pos, lit(FrameLen)).cast("binary")))
            .as("frame_hex"))
        .orderBy("doc_id", "frame_idx")
    }),

    "x_resize_meta" -> ((s, d) => {
      // resize stub: scale the stub-decoded dimensions to fit a 256-px
      // box preserving aspect ratio — pure column arithmetic, the shape a
      // real resize UDF's metadata output would take
      val w = greatest((length(col("payload")) % 640).cast("double"), lit(1.0))
      val h = greatest(((ascii(col("payload").cast("string")) * 7) % 480)
        .cast("double"), lit(1.0))
      val scale = least(lit(256.0) / w, lit(256.0) / h, lit(1.0))
      mediaTable(s, d)
        .select(col("doc_id"),
          w.cast("long").as("src_w"), h.cast("long").as("src_h"),
          floor(w * scale).cast("long").as("dst_w"),
          floor(h * scale).cast("long").as("dst_h"))
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
         FROM documents ORDER BY doc_id""",

    "x_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         upper(hex(CAST(substring(text,
           1 + CAST(floor((greatest(length(text) - 8, 0) * i) / 3.0) AS INT),
           8) AS BLOB))) AS frame_hex
         FROM documents, generate_series(0, 3) AS t(i)
         ORDER BY doc_id, frame_idx""",

    "x_resize_meta" ->
      """WITH dims AS (
           SELECT doc_id,
             greatest(CAST(octet_length(CAST(text AS BLOB)) % 640 AS DOUBLE),
               1.0) AS w,
             greatest(CAST((ascii(text) * 7) % 480 AS DOUBLE), 1.0) AS h
           FROM documents)
         SELECT doc_id,
           CAST(w AS BIGINT) AS src_w, CAST(h AS BIGINT) AS src_h,
           CAST(floor(w * least(256.0 / w, 256.0 / h, 1.0)) AS BIGINT) AS dst_w,
           CAST(floor(h * least(256.0 / w, 256.0 / h, 1.0)) AS BIGINT) AS dst_h
         FROM dims ORDER BY doc_id"""
  )
}
