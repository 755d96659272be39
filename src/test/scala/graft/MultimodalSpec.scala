package graft

import org.apache.spark.sql.functions._

import graft.ext.MultimodalOps
import graft.ext.MultimodalOps.{MediaFeatures, MediaRow}

/** Multimodal plumbing: the typed mapPartitions seams (decode stub,
  * feature extract) and the frame-sample fan-out. Column-twin value
  * equivalence runs through Verify + the DuckDB oracle. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def media = MultimodalOps.mediaTable(spark, sf)
    .as[MediaRow]

  test("extractMetaPartitions matches the pure-column twin") {
    val typed = MultimodalOps.extractMetaPartitions(media)
      .collect().map(m => m.doc_id -> (m.n_bytes, m.fake_width, m.fake_height))
      .toMap
    val twin = MultimodalOps.queries("x_multimodal_meta")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1).toInt, r.getLong(3).toInt, r.getInt(4))).toMap
    assert(typed === twin)
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
}
