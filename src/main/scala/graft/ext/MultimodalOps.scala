package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables.t

/** Multimodal-column plumbing (SURVEY.md §2.10 x_multimodal_cols).
  *
  * Media payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct beside them — the pattern a 100 TB training-data
  * pipeline uses for image/audio/video. Round 4 retires the decode STUB:
  * payloads are wrapped in real public container formats (PNG / GIF89a /
  * BMP — ImageHeaders) and the decode step genuinely parses the header
  * bytes for dimensions, in two equivalent implementations:
  *
  *  - pure-Column (codegen): magic dispatch via `hex(substring(...))`,
  *    big/little-endian dimension reads via `conv(hex(...), 16, 10)` —
  *    used by the oracle queries, stays inside WholeStageCodegen;
  *  - `extractMetaPartitions`: `mapPartitions` over a typed Dataset with
  *    the byte-level `ImageHeaders.parse` — the seam where a full pixel
  *    decoder (JNI/codec lib) would batch-process payloads per partition,
  *    mirrored after Python's `mapInPandas` batch UDF shape. Oracle-checked
  *    end-to-end by `x_image_header_decode`.
  */
object MultimodalOps {

  /** Typed row for the mapPartitions decode seam. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed decode result: real header-parsed format and dimensions. */
  case class MediaMeta(doc_id: Long, format: String,
                       width: Long, height: Long, n_bytes: Long)

  /** The batch-decode seam: partition-parallel, zero driver involvement.
    * Unrecognized payloads degrade to ("unknown", 0, 0) instead of
    * failing the batch — at corpus scale a corrupt payload is data, not
    * an exception. */
  def extractMetaPartitions(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (fmt, w, h) =
          ImageHeaders.parse(r.payload).getOrElse(("unknown", 0, 0))
        MediaMeta(r.doc_id, fmt, w.toLong, h.toLong, r.payload.length.toLong)
      }
    }
  }

  /** Typed row for the feature-extract seam: a 16-bin byte-value histogram
    * per payload — the feature vector a real pipeline would hand to an
    * embedding model. Real computation over the bytes, exercising the
    * exact batch shape a codec would use. */
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

  // ---- pure-Column container synthesis + header decode -----------------

  /** Big-endian n-byte binary of an int column. */
  private def be(n: Column, bytes: Int): Column =
    unhex(lpad(hex(n), bytes * 2, "0"))

  /** Little-endian n-byte binary of an int column (byte-reversed hex). */
  private def le(n: Column, bytes: Int): Column = {
    val hx = lpad(hex(n), bytes * 2, "0")
    unhex(concat((bytes to 1 by -1).map(i => substring(hx, i * 2 - 1, 2)): _*))
  }

  /** Deterministic per-doc dimensions — the "stored meta" the oracle
    * recomputes: width 1..640 from the payload length, height 1..480 from
    * the first byte. */
  private def dimW(payload: Column): Column =
    pmod(length(payload), lit(640)) + lit(1)
  private def dimH(payload: Column): Column =
    pmod(ascii(payload.cast("string")) * lit(7), lit(480)) + lit(1)

  /** Wrap a payload in a REAL container header (format by doc_id % 3:
    * png / gif / bmp), dimensions from the deterministic derivation
    * above. Byte-identical to ImageHeaders.{png,gif,bmp} except the PNG
    * CRC (zeros here — not computable in Column space; the parse is a
    * dimension probe and ignores it). */
  def wrapImage(docId: Column, payload: Column): Column = {
    val w = dimW(payload)
    val h = dimH(payload)
    val png = concat(
      lit(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)),
      be(lit(13), 4), lit("IHDR".getBytes("US-ASCII")),
      be(w, 4), be(h, 4),
      lit(Array[Byte](8, 2, 0, 0, 0)), // depth, RGB, deflate, std, none
      lit(Array.fill[Byte](4)(0)),     // CRC (see Scaladoc)
      payload)
    val gif = concat(
      lit("GIF89a".getBytes("US-ASCII")), le(w, 2), le(h, 2),
      lit(Array[Byte](0, 0, 0)),       // GCT flags, background, aspect
      payload)
    val bmp = concat(
      lit("BM".getBytes("US-ASCII")),
      le(length(payload) + lit(ImageHeaders.BmpHeaderLen), 4), // file size
      le(lit(0), 4),                   // reserved
      le(lit(ImageHeaders.BmpHeaderLen), 4), // pixel data offset
      le(lit(40), 4),                  // BITMAPINFOHEADER size
      le(w, 4), le(h, 4), le(lit(1), 2), le(lit(24), 2),
      lit(Array.fill[Byte](24)(0)),    // compression..importantColors
      payload)
    when(pmod(docId, lit(3)) === 0, png)
      .when(pmod(docId, lit(3)) === 1, gif)
      .otherwise(bmp)
  }

  /** Header decode in pure Columns: (format, width, height) parsed from
    * the actual container bytes — the codegen twin of ImageHeaders.parse. */
  def decodeHeader(img: Column): (Column, Column, Column) = {
    def beInt(pos: Int, n: Int): Column =
      conv(hex(substring(img, pos, n)), 16, 10).cast("long")
    def leInt(pos: Int, n: Int): Column =
      conv(concat((n to 1 by -1).map(i =>
        hex(substring(img, pos + i - 1, 1))): _*), 16, 10).cast("long")
    val isPng = hex(substring(img, 1, 8)) === lit("89504E470D0A1A0A") &&
      hex(substring(img, 13, 4)) === lit("49484452") // "IHDR"
    val isGif = hex(substring(img, 1, 6)) === lit("474946383961")
    val isBmp = hex(substring(img, 1, 2)) === lit("424D")
    val format = when(isPng, lit("png")).when(isGif, lit("gif"))
      .when(isBmp, lit("bmp")).otherwise(lit("unknown"))
    val width = when(isPng, beInt(17, 4)).when(isGif, leInt(7, 2))
      .when(isBmp, leInt(19, 4)).otherwise(lit(0L))
    val height = when(isPng, beInt(21, 4)).when(isGif, leInt(9, 2))
      .when(isBmp, leInt(23, 4)).otherwise(lit(0L))
    (format, width, height)
  }

  /** Wrap a payload in a real RIFF/WAVE PCM header (audio modality):
    * sample rate and channel count derived deterministically from the
    * doc; byte-identical to ImageHeaders.wav. */
  def wrapWav(docId: Column, payload: Column): Column = {
    val rate = element_at(
      array(lit(8000), lit(16000), lit(22050), lit(44100)),
      (pmod(docId, lit(4)) + 1).cast("int"))
    val channels = pmod(docId, lit(2)).cast("int") + lit(1)
    concat(
      lit("RIFF".getBytes("US-ASCII")),
      le(length(payload) + lit(36), 4),
      lit("WAVEfmt ".getBytes("US-ASCII")),
      le(lit(16), 4), le(lit(1), 2),
      le(channels, 2), le(rate, 4),
      le(rate * channels * lit(2), 4),
      le(channels * lit(2), 2), le(lit(16), 2),
      lit("data".getBytes("US-ASCII")),
      le(length(payload), 4),
      payload)
  }

  /** RIFF/WAVE header decode in pure Columns: (sample_rate, channels,
    * bits, data_len) read from the actual bytes. */
  def decodeWavHeader(img: Column): (Column, Column, Column, Column) = {
    def leInt(pos: Int, n: Int): Column =
      conv(concat((n to 1 by -1).map(i =>
        hex(substring(img, pos + i - 1, 1))): _*), 16, 10).cast("long")
    (leInt(25, 4), leInt(23, 2), leInt(35, 2), leInt(41, 4))
  }

  // constant byte runs of the fixed-layout MP4 synth, sliced from the
  // JVM synthesis so the Column twin is byte-identical by construction:
  // [0,48) = ftyp + moov hdr + mvhd hdr/version/times, then timescale(4)
  // + duration(4), [56,136) = rate..next-track, then mdat hdr + payload
  private val mp4Skeleton = ImageHeaders.mp4(0, 0, Array.emptyByteArray)
  private val mp4Prefix = mp4Skeleton.slice(0, 48)
  private val mp4MvhdTail = mp4Skeleton.slice(56, 136)

  /** Wrap a payload in a real ISO BMFF (MP4) prefix — ftyp(isom) +
    * moov[mvhd v0] + mdat — timescale derived per doc, duration units =
    * payload bytes. */
  def wrapMp4(docId: Column, payload: Column): Column = {
    val ts = element_at(array(lit(600), lit(1000), lit(90000)),
      (pmod(docId, lit(3)) + 1).cast("int"))
    concat(
      lit(mp4Prefix),
      be(ts, 4), be(length(payload), 4),
      lit(mp4MvhdTail),
      be(length(payload) + lit(8), 4),
      lit("mdat".getBytes("US-ASCII")),
      payload)
  }

  /** MP4 header decode in pure Columns over the fixed synth layout,
    * box types VALIDATED from the bytes: (brand, timescale,
    * duration_units). The JVM twin (ImageHeaders.parseMp4) is the real
    * box walker; x_video_meta pins both to the oracle. */
  def decodeMp4Header(img: Column): (Column, Column, Column) = {
    def beInt(pos: Int, n: Int): Column =
      conv(hex(substring(img, pos, n)), 16, 10).cast("long")
    val ok = hex(substring(img, 5, 4)) === lit("66747970") &&   // ftyp
      hex(substring(img, 25, 4)) === lit("6D6F6F76") &&         // moov
      hex(substring(img, 33, 4)) === lit("6D766864")            // mvhd
    (when(ok, substring(img, 9, 4).cast("string")).otherwise(lit("unknown")),
      when(ok, beInt(49, 4)).otherwise(lit(0L)),
      when(ok, beInt(53, 4)).otherwise(lit(0L)))
  }

  /** Wrap a payload as a minimal REAL JPEG: SOI + a JFIF APP0 whose
    * length varies per doc (16 + doc_id%8 — the scanner must USE the
    * length field, not assume an offset) + an optional COM segment on
    * odd docs (2 + 6 + doc_id%5 bytes) + a 1-component SOF0 carrying the
    * dimensions + the payload as the "entropy-coded" body. Unlike
    * PNG/GIF/BMP the dimensions are NOT at a fixed offset — that is the
    * point of the format and of the scanning parser below. */
  def wrapJpeg(docId: Column, payload: Column): Column = {
    val w = dimW(payload)
    val h = dimH(payload)
    val pad = pmod(docId, lit(8)).cast("int")
    val app0 = concat(
      lit(Array(0xff, 0xe0).map(_.toByte)), be(lit(16) + pad, 2),
      lit("JFIF".getBytes("US-ASCII")), lit(Array[Byte](0)),
      lit(Array[Byte](1, 1, 0, 0, 0x48, 0, 0x48, 0, 0)), // ver/units/dens
      substring(lit(Array.fill[Byte](7)(0)), lit(1), pad))
    val comLen = (lit(6) + pmod(docId, lit(5))).cast("int")
    val com = concat(
      lit(Array(0xff, 0xfe).map(_.toByte)), be(comLen, 2),
      substring(lit("metaXXXXX".getBytes("US-ASCII")), lit(1), comLen - 2))
    val sof0 = concat(
      lit(Array(0xff, 0xc0).map(_.toByte)), be(lit(11), 2),
      lit(Array[Byte](8)), be(h, 2), be(w, 2),
      lit(Array[Byte](1, 1, 0x11, 0)))
    concat(
      lit(Array(0xff, 0xd8).map(_.toByte)), app0,
      when(pmod(docId, lit(2)) === 1, com)
        .otherwise(lit(Array.emptyByteArray)),
      sof0, payload)
  }

  /** JPEG dimension probe in pure Columns: WALK the segment chain from
    * SOI — read each marker, skip non-SOF segments by their length
    * field — until an SOF0/1/2 frame header, then read (height, width)
    * from it. Statically unrolled to 3 segments (APP0 [+COM] + SOF covers
    * the synthesis; a real corpus would widen the unroll or drop to the
    * mapPartitions parser). Returns (segments_skipped, width, height). */
  def decodeJpegDims(img: Column): (Column, Column, Column) = {
    def beAt(pos: Column, n: Int): Column =
      conv(hex(img.substr(pos, lit(n))), 16, 10).cast("long")
    def markerAt(pos: Column): Column = hex(img.substr(pos, lit(2)))
    def isSof(m: Column): Column = m.isin("FFC0", "FFC1", "FFC2")
    val p1 = lit(2L) + 1L // 1-based: first marker after the 2-byte SOI
    val m1 = markerAt(p1)
    val p2 = p1 + lit(2L) + beAt(p1 + 2L, 2)
    val m2 = markerAt(p2)
    val p3 = p2 + lit(2L) + beAt(p2 + 2L, 2)
    val m3 = markerAt(p3)
    val sofPos = when(isSof(m1), p1).when(isSof(m2), p2)
      .when(isSof(m3), p3).otherwise(lit(null).cast("long"))
    val skipped = when(isSof(m1), 0L).when(isSof(m2), 1L)
      .when(isSof(m3), 2L).otherwise(-1L)
    (skipped, beAt(sofPos + 7L, 2), beAt(sofPos + 5L, 2))
  }

  /** documents.text cast to binary plays the opaque media payload. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Media table wrapped in real container headers. */
  def wrappedTable(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), wrapImage(col("doc_id"), col("payload"))
        .as("payload"))

  /** The oracle's view of the stored meta: per-format header size added
    * to the body length. */
  private val oracleHeaderLenSql =
    s"""CASE doc_id % 3 WHEN 0 THEN ${ImageHeaders.PngHeaderLen}
        WHEN 1 THEN ${ImageHeaders.GifHeaderLen}
        ELSE ${ImageHeaders.BmpHeaderLen} END"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_multimodal_meta" -> ((s, d) => {
      // wrap in a real container, then parse the header back out of the
      // BYTES (not the stored derivation) — pure-Column codegen path
      val img = wrappedTable(s, d)
      val (format, width, height) = decodeHeader(col("payload"))
      img.select(col("doc_id"), format.as("format"),
          length(col("payload")).cast("long").as("n_bytes"),
          width.as("width"), height.as("height"))
        .orderBy("doc_id")
    }),

    "x_image_header_decode" -> ((s, d) => {
      // the mapPartitions decode seam end-to-end under oracle: typed
      // Dataset → per-partition ImageHeaders.parse → typed meta. Proves
      // the JVM byte parser agrees with the stored-meta derivation on
      // every row and every format.
      import s.implicits._
      extractMetaPartitions(wrappedTable(s, d).as[MediaRow])
        .toDF().orderBy("doc_id")
    }),

    "x_audio_meta" -> ((s, d) => {
      // audio modality: wrap in a real RIFF/WAVE PCM header, parse the
      // header BYTES back (sample rate, channels, bits, data length),
      // and derive frame count and duration — integer-exact arithmetic
      // in both engines
      val img = mediaTable(s, d)
        .select(col("doc_id"),
          wrapWav(col("doc_id"), col("payload")).as("payload"))
      val (rate, channels, bits, dataLen) = decodeWavHeader(col("payload"))
      img.select(col("doc_id"),
          rate.as("sample_rate"), channels.as("channels"), bits.as("bits"),
          floor(dataLen / (channels * lit(2))).cast("long").as("n_frames"),
          floor(dataLen * lit(1000) / (rate * channels * lit(2)))
            .cast("long").as("duration_ms"))
        .orderBy("doc_id")
    }),

    "x_video_meta" -> ((s, d) => {
      // video modality: wrap in a real ISO BMFF prefix, parse the box
      // bytes back (brand, timescale, duration units) and derive wall
      // duration — completing the image/audio/video triple
      val img = mediaTable(s, d)
        .select(col("doc_id"),
          wrapMp4(col("doc_id"), col("payload")).as("payload"))
      val (brand, ts, dur) = decodeMp4Header(col("payload"))
      img.select(col("doc_id"), brand.as("brand"),
          ts.as("timescale"), dur.as("duration_units"),
          floor(dur * lit(1000) / ts).cast("long").as("duration_ms"),
          length(col("payload")).cast("long").as("n_bytes"))
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

    "x_jpeg_header_scan" -> ((s, d) => {
      // JPEG completes the image-container set, and unlike PNG/GIF/BMP
      // its dimensions sit behind a VARIABLE-length segment chain — this
      // entry proves the scanning parser (read marker → skip by length
      // field → repeat until SOF) against the stored-meta derivation on
      // every row: variable APP0 padding (doc_id%8) and an optional COM
      // segment (odd docs) make every skip distance doc-dependent, so a
      // fixed-offset "parser" cannot pass. Pure-Column codegen, one
      // narrow map over the scan — no shuffle until the output sort.
      val img = mediaTable(s, d)
        .select(col("doc_id"),
          wrapJpeg(col("doc_id"), col("payload")).as("payload"))
      val (skipped, width, height) = decodeJpegDims(col("payload"))
      img.select(col("doc_id"), skipped.as("segments_skipped"),
          width.as("width"), height.as("height"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy("doc_id")
    }),

    "x_resize_meta" -> ((s, d) => {
      // aspect-preserving resize planning over REAL decoded dimensions:
      // parse the container header, fit into a 256-px box
      val img = wrappedTable(s, d)
      val (_, width, height) = decodeHeader(col("payload"))
      val w = width.cast("double")
      val h = height.cast("double")
      val scale = least(lit(256.0) / w, lit(256.0) / h, lit(1.0))
      img.select(col("doc_id"),
          width.as("src_w"), height.as("src_h"),
          floor(w * scale).cast("long").as("dst_w"),
          floor(h * scale).cast("long").as("dst_h"))
        .orderBy("doc_id")
    }),

    "x_image_dhash" -> ((s, d) => {
      // PERCEPTUAL near-dup detection for the image modality — the
      // multimodal twin of x_simhash_hamming: an average-hash (aHash)
      // over a 64-cell downsample of the payload bytes (the bytes play
      // the luma plane; a real pipeline swaps byteAt for a pixel
      // decoder, everything downstream is unchanged), banded 4×16 for
      // multi-index candidate generation with pigeonhole-guaranteed
      // recall at hamming ≤ 3, verified by bit_count(xor). The gauge
      // corpus plants a last-byte-perturbed replica of every 10th doc
      // (byte SUBSTITUTION, the aligned small-noise edit a re-encoded
      // image shows) and the output reports how many replicas the
      // banded index recovers. All integer: cell bytes, the 64·v > Σv
      // threshold (no float mean), fingerprint bit-sums, hamming.
      // Plan: the hash is one scan-side codegen'd expression per row;
      // the shuffle carries (band, 16-bit value) keys — O(4·docs) rows
      // with ~2^-16 random collision, exactly the text-SimHash scale
      // posture.
      val ReplOff = 10000000L
      val base = mediaTable(s, d)
      val corpus = base.unionByName(
        base.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + lit(ReplOff)).as("doc_id"),
            concat(
              col("payload").substr(lit(1), length(col("payload")) - 1),
              lit("z".getBytes("US-ASCII"))).as("payload")))
      def byteAt(i: Int): Column = conv(hex(col("payload").substr(
        expr(s"CAST((CAST($i AS BIGINT) * length(payload)) div 64 AS INT) + 1"),
        lit(1))), 16, 10).cast("long")
      val withCells = corpus.select(
        col("doc_id") +: (0 until 64).map(i => byteAt(i).as(s"v$i")): _*)
      val sm = (0 until 64).map(i => col(s"v$i")).reduce(_ + _)
      val fp0 = (0 until 32).map(i =>
        when(col(s"v$i") * 64 > col("sm"), lit(1L << (31 - i)))
          .otherwise(lit(0L))).reduce(_ + _)
      val fp1 = (32 until 64).map(i =>
        when(col(s"v$i") * 64 > col("sm"), lit(1L << (63 - i)))
          .otherwise(lit(0L))).reduce(_ + _)
      val fps = withCells.withColumn("sm", sm)
        .select(col("doc_id"), fp0.as("fp0"), fp1.as("fp1"))
        .localCheckpoint()
      val bands = fps.select(col("doc_id"), col("fp0"), col("fp1"),
          explode(expr("array(0, 1, 2, 3)")).as("bidx"))
        .withColumn("bv", expr(
          "shiftright(IF(bidx < 2, fp0, fp1), (bidx % 2) * 16) & 65535"))
      val cand = bands.alias("x").join(bands.alias("y"),
          col("x.bidx") === col("y.bidx") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("x.fp0").as("fa0"),
          col("x.fp1").as("fa1"), col("y.doc_id").as("b"),
          col("y.fp0").as("fb0"), col("y.fp1").as("fb1"))
        .distinct()
        .withColumn("hamming", expr(
          "CAST(bit_count(fa0 ^ fb0) + bit_count(fa1 ^ fb1) AS BIGINT)"))
      val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
      val nRepl = base.filter(pmod(col("doc_id"), lit(10)) === 0)
        .agg(count(lit(1)).as("n_replicas"))
      val cagg = cand.agg(count(lit(1)).as("n_band_candidates"),
        coalesce(sum(when(col("hamming") <= 3, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_verified_d3"),
        coalesce(sum(when(col("hamming") <= 3 &&
            col("b") === col("a") + ReplOff, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_replica_found"))
      nDocs.crossJoin(broadcast(nRepl)).crossJoin(broadcast(cagg))
        .select(col("n_docs"), col("n_replicas"),
          col("n_band_candidates"), col("n_verified_d3"),
          col("n_replica_found"),
          graft.types.Coercions.detRound(
            col("n_replica_found").cast("double") / col("n_replicas"), 4)
            .as("recall"))
    })
  )

  private val FrameLen = 8
  private val NFrames = 4

  def oracleSql: Map[String, String] = Map(
    "x_multimodal_meta" ->
      s"""SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
           ELSE 'bmp' END AS format,
         CAST(octet_length(CAST(text AS BLOB)) + $oracleHeaderLenSql
           AS BIGINT) AS n_bytes,
         CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS BIGINT) AS width,
         CAST((ascii(text) * 7) % 480 + 1 AS BIGINT) AS height
         FROM documents ORDER BY doc_id""",

    "x_image_header_decode" ->
      s"""SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
           ELSE 'bmp' END AS format,
         CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS BIGINT) AS width,
         CAST((ascii(text) * 7) % 480 + 1 AS BIGINT) AS height,
         CAST(octet_length(CAST(text AS BLOB)) + $oracleHeaderLenSql
           AS BIGINT) AS n_bytes
         FROM documents ORDER BY doc_id""",

    "x_audio_meta" ->
      """WITH a AS (
           SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS dl,
             CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 ELSE 44100 END AS rate,
             doc_id % 2 + 1 AS ch
           FROM documents)
         SELECT doc_id,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(ch AS BIGINT) AS channels,
           CAST(16 AS BIGINT) AS bits,
           CAST(floor(dl / (ch * 2)) AS BIGINT) AS n_frames,
           CAST(floor(dl * 1000 / (rate * ch * 2)) AS BIGINT) AS duration_ms
         FROM a ORDER BY doc_id""",

    "x_video_meta" ->
      s"""WITH v AS (
           SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS dl,
             CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
               ELSE 90000 END AS ts
           FROM documents)
         SELECT doc_id, 'isom' AS brand,
           CAST(ts AS BIGINT) AS timescale,
           dl AS duration_units,
           CAST(floor(dl * 1000 / ts) AS BIGINT) AS duration_ms,
           dl + ${ImageHeaders.Mp4HeaderLen} AS n_bytes
         FROM v ORDER BY doc_id""",

    "x_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         upper(hex(CAST(substring(text,
           1 + CAST(floor((greatest(length(text) - 8, 0) * i) / 3.0) AS INT),
           8) AS BLOB))) AS frame_hex
         FROM documents, generate_series(0, 3) AS t(i)
         ORDER BY doc_id, frame_idx""",

    "x_jpeg_header_scan" ->
      """SELECT doc_id,
         CAST(CASE doc_id % 2 WHEN 1 THEN 2 ELSE 1 END AS BIGINT)
           AS segments_skipped,
         CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS BIGINT)
           AS width,
         CAST((ascii(text) * 7) % 480 + 1 AS BIGINT) AS height,
         CAST(octet_length(CAST(text AS BLOB))
              + 2 + (2 + 16 + doc_id % 8)
              + (CASE doc_id % 2 WHEN 1 THEN 2 + 6 + doc_id % 5 ELSE 0 END)
              + 13 AS BIGINT) AS n_bytes
         FROM documents ORDER BY doc_id""",

    "x_resize_meta" ->
      """WITH dims AS (
           SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS DOUBLE) AS w,
             CAST((ascii(text) * 7) % 480 + 1 AS DOUBLE) AS h
           FROM documents)
         SELECT doc_id,
           CAST(w AS BIGINT) AS src_w, CAST(h AS BIGINT) AS src_h,
           CAST(floor(w * least(256.0 / w, 256.0 / h, 1.0)) AS BIGINT) AS dst_w,
           CAST(floor(h * least(256.0 / w, 256.0 / h, 1.0)) AS BIGINT) AS dst_h
         FROM dims ORDER BY doc_id""",

    "x_image_dhash" -> {
      val cells = (0 until 64).map(i =>
        s"ord(substr(p, CAST(($i * length(p)) // 64 + 1 AS INT), 1)) AS v$i")
        .mkString(",\n                  ")
      val smSum = (0 until 64).map(i => s"v$i").mkString(" + ")
      val hi = (0 until 32).map(i =>
        s"(CASE WHEN 64 * v$i > sm THEN ${1L << (31 - i)} ELSE 0 END)")
        .mkString(" + ")
      val lo = (32 until 64).map(i =>
        s"(CASE WHEN 64 * v$i > sm THEN ${1L << (63 - i)} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH corpus AS (
            SELECT doc_id, text AS p FROM documents
            UNION ALL
            SELECT doc_id + 10000000,
                   substr(text, 1, CAST(length(text) AS INT) - 1) || 'z'
            FROM documents WHERE doc_id % 10 = 0),
          cells AS (
            SELECT doc_id,
                  $cells
            FROM corpus),
          cs AS (SELECT *, $smSum AS sm FROM cells),
          fps AS MATERIALIZED (
            SELECT doc_id, CAST($hi AS BIGINT) AS fp0,
                   CAST($lo AS BIGINT) AS fp1
            FROM cs),
          bands AS (
            SELECT doc_id, fp0, fp1, i AS bidx,
                   ((CASE WHEN i < 2 THEN fp0 ELSE fp1 END)
                    >> ((i % 2) * 16)) & 65535 AS bv
            FROM fps, range(4) t(i)),
          cand AS (
            SELECT DISTINCT x.doc_id AS a, x.fp0 AS fa0, x.fp1 AS fa1,
                            y.doc_id AS b, y.fp0 AS fb0, y.fp1 AS fb1
            FROM bands x JOIN bands y
              ON x.bidx = y.bidx AND x.bv = y.bv
                 AND x.doc_id < y.doc_id),
          h AS (
            SELECT a, b, bit_count(xor(fa0, fb0))
                         + bit_count(xor(fa1, fb1)) AS hamming
            FROM cand),
          agg AS (
            SELECT COUNT(*) AS n_band_candidates,
                   CAST(COALESCE(SUM(CASE WHEN hamming <= 3
                          THEN 1 ELSE 0 END), 0) AS BIGINT)
                     AS n_verified_d3,
                   CAST(COALESCE(SUM(CASE WHEN hamming <= 3
                          AND b = a + 10000000 THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_replica_found
            FROM h),
          nd AS (SELECT COUNT(*) AS n_docs FROM corpus),
          nr AS (SELECT COUNT(*) AS n_replicas FROM documents
                 WHERE doc_id % 10 = 0)
          SELECT n_docs, n_replicas, n_band_candidates, n_verified_d3,
                 n_replica_found,
                 floor(n_replica_found / CAST(n_replicas AS DOUBLE)
                       * 1e4 + 0.5) / 1e4 AS recall
          FROM nd CROSS JOIN nr CROSS JOIN agg"""
    }
  )
}
