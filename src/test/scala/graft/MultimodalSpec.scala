package graft

import org.apache.spark.sql.functions._

import graft.ext.{ImageHeaders, MultimodalOps}
import graft.ext.MultimodalOps.{MediaFeatures, MediaRow}

/** Multimodal plumbing: real container-header synthesis + parsing
  * (round 4 — ImageHeaders), the typed mapPartitions seams, and the
  * frame-sample fan-out. Column-twin value equivalence runs through
  * Verify + the DuckDB oracle (x_multimodal_meta, x_image_header_decode). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def media = MultimodalOps.mediaTable(spark, sf).as[MediaRow]

  test("ImageHeaders round-trips dimensions through all three formats") {
    val body = "not really pixels".getBytes("UTF-8")
    val dims = Seq((1, 1), (640, 480), (65535, 1), (1, 65535), (123, 457))
    dims.foreach { case (w, h) =>
      assert(ImageHeaders.parse(ImageHeaders.png(w, h, body))
        === Some(("png", w, h)))
      assert(ImageHeaders.parse(ImageHeaders.gif(w, h, body))
        === Some(("gif", w, h)))
      assert(ImageHeaders.parse(ImageHeaders.bmp(w, h, body))
        === Some(("bmp", w, h)))
    }
    // beyond GIF's 16-bit screen: PNG/BMP carry 32-bit dimensions
    assert(ImageHeaders.parse(ImageHeaders.png(100000, 3, body))
      === Some(("png", 100000, 3)))
    assert(ImageHeaders.parse(ImageHeaders.bmp(100000, 3, body))
      === Some(("bmp", 100000, 3)))
    // non-image bytes are rejected, not misparsed
    assert(ImageHeaders.parse("plain text document".getBytes) === None)
    assert(ImageHeaders.parse(Array.emptyByteArray) === None)
    // a PNG signature with a torn header is rejected (length guard)
    assert(ImageHeaders.parse(
      ImageHeaders.png(9, 9, body).take(20)) === None)
  }

  test("mapPartitions decode agrees with the pure-Column header parse") {
    val wrapped = MultimodalOps.wrappedTable(spark, sf).as[MediaRow]
    val typed = MultimodalOps.extractMetaPartitions(wrapped)
      .collect().map(m => m.doc_id -> (m.format, m.width, m.height, m.n_bytes))
      .toMap
    val twin = MultimodalOps.queries("x_multimodal_meta")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(2))).toMap
    assert(typed === twin)
    // every format appears and every payload parsed (no "unknown")
    val formats = typed.values.map(_._1).toSet
    assert(formats === Set("png", "gif", "bmp"))
  }

  test("Column-synthesized containers parse under the byte-level JVM " +
      "parser, matching the JVM synthesis except the PNG CRC") {
    val row = MultimodalOps.wrappedTable(spark, sf)
      .filter($"doc_id" % 3 === 0).limit(1).as[MediaRow].head()
    val parsed = ImageHeaders.parse(row.payload)
    assert(parsed.isDefined && parsed.get._1 === "png")
    val (_, w, h) = parsed.get
    val body = row.payload.drop(ImageHeaders.PngHeaderLen)
    val jvm = ImageHeaders.png(w, h, body)
    // identical bytes everywhere but the 4 CRC bytes (29..32)
    assert(jvm.length === row.payload.length)
    jvm.indices.filterNot(i => i >= 29 && i < 33).foreach { i =>
      assert(jvm(i) === row.payload(i), s"byte $i differs")
    }
  }

  test("WAV header round-trips; Column synthesis is byte-identical to " +
      "the JVM synthesis") {
    val body = "not really pcm frames".getBytes("UTF-8")
    assert(ImageHeaders.parseWav(ImageHeaders.wav(44100, 2, body))
      === Some((44100, 2, 16, body.length)))
    assert(ImageHeaders.parseWav(ImageHeaders.wav(8000, 1, body))
      === Some((8000, 1, 16, body.length)))
    assert(ImageHeaders.parseWav("RIFF but not wave data".getBytes) === None)
    // Column-side wrap (doc_id=3 → 44100 Hz stereo) equals the JVM bytes
    val row = MultimodalOps.mediaTable(spark, sf)
      .filter($"doc_id" === 3)
      .select($"doc_id", MultimodalOps.wrapWav($"doc_id", $"payload")
        .as("payload")).as[MediaRow].head()
    val payload = media.filter(_.doc_id == 3L).head().payload
    assert(row.payload.toSeq ===
      ImageHeaders.wav(44100, 2, payload).toSeq)
  }

  test("MP4 parser genuinely walks boxes: round-trip, leading free box, " +
      "mvhd v1; Column synthesis is byte-identical to the JVM synthesis") {
    val body = "not really h264 samples".getBytes("UTF-8")
    assert(ImageHeaders.parseMp4(ImageHeaders.mp4(90000, 123456, body))
      === Some(("isom", 90000L, 123456L)))
    // a leading `free` box shifts every offset — a fixed-offset reader
    // would misparse; the walker must not
    val free = java.nio.ByteBuffer.allocate(16).putInt(16)
      .put("free".getBytes("US-ASCII")).put(new Array[Byte](8)).array()
    assert(ImageHeaders.parseMp4(
      ImageHeaders.mp4(1000, 77, body, leading = free))
      === Some(("isom", 1000L, 77L)))
    // mvhd version 1 (64-bit times): synthesize by hand
    val v1 = {
      val out = new java.io.ByteArrayOutputStream()
      def be(v: Long, n: Int): Unit =
        (n - 1 to 0 by -1).foreach(i => out.write(((v >>> (i * 8)) & 0xff).toInt))
      be(20, 4); out.write("ftypisom".getBytes); be(0, 4); out.write("isom".getBytes)
      be(8 + 8 + 32, 4); out.write("moov".getBytes)
      be(8 + 32, 4); out.write("mvhd".getBytes)
      out.write(Array[Byte](1, 0, 0, 0))  // version 1
      be(0, 8); be(0, 8)                  // 64-bit times
      be(600, 4)                          // timescale
      be(5000000000L, 8)                  // 64-bit duration
      out.toByteArray
    }
    assert(ImageHeaders.parseMp4(v1) === Some(("isom", 600L, 5000000000L)))
    assert(ImageHeaders.parseMp4("plain text, no boxes here".getBytes) === None)
    // Column wrap (doc_id=2 → timescale 90000) equals the JVM bytes
    val row = MultimodalOps.mediaTable(spark, sf)
      .filter($"doc_id" === 2)
      .select($"doc_id", MultimodalOps.wrapMp4($"doc_id", $"payload")
        .as("payload")).as[MediaRow].head()
    val payload = media.filter(_.doc_id == 2L).head().payload
    assert(row.payload.toSeq ===
      ImageHeaders.mp4(90000, payload.length, payload).toSeq)
  }

  test("byte histogram: 16 bins, bins sum to payload length, ASCII text " +
      "lands in the 0x20-0x7f bins") {
    val feats: Array[MediaFeatures] =
      MultimodalOps.byteHistogramPartitions(media).collect()
    val sizes = media.collect().map(r => r.doc_id -> r.payload.length).toMap
    assert(feats.length === sizes.size)
    feats.foreach { f =>
      assert(f.histogram.length === 16)
      assert(f.histogram.sum === sizes(f.doc_id).toLong)
      // word-salad ASCII: every byte in [0x20, 0x7f) ⇒ bins 2..7 only
      assert(f.histogram.zipWithIndex.collect {
        case (n, bin) if n > 0 => bin }.forall(b => b >= 2 && b <= 7))
    }
  }

  test("frame sample: 4 frames per doc, each an 8-byte slice of the text") {
    val frames = MultimodalOps.queries("x_frame_sample")(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 4).count()
    assert(frames === 0)
    val one = MultimodalOps.queries("x_frame_sample")(spark, sf)
      .filter(col("doc_id") === 0).orderBy("frame_idx")
      .select("frame_hex").as[String].collect()
    val text = media.filter(_.doc_id == 0L).head().payload
    one.foreach { hexStr =>
      val bytes = hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      assert(new String(text, "UTF-8").contains(new String(bytes, "UTF-8")))
    }
  }

  test("JPEG scan genuinely walks the segment chain: skip counts follow " +
      "the synthesis (1 even / 2 odd docs), dims in range, and a " +
      "chain with no SOF within the unroll reports -1") {
    val rows = MultimodalOps.queries("x_jpeg_header_scan")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val sk = r.getAs[Long]("segments_skipped")
      assert(sk == (if (id % 2 == 1) 2L else 1L),
        s"doc $id skipped $sk segments")
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      assert(w >= 1 && w <= 640 && h >= 1 && h <= 480)
    }
    // negative: SOI + three APP segments and never a SOF — the unrolled
    // walker must report not-found (-1), not misread a length as dims
    val app = Array(0xff, 0xe1, 0x00, 0x04, 0x00, 0x00).map(_.toByte)
    val noSof = (Array(0xff, 0xd8).map(_.toByte) ++ app ++ app ++ app)
    val df = Seq((1L, noSof)).toDF("doc_id", "payload")
    val (skipped, _, _) =
      MultimodalOps.decodeJpegDims(col("payload"))
    assert(df.select(skipped).head().getLong(0) === -1L)
  }
}
