package graft.ext

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Pure-JVM image container header synthesis and parsing (round 4).
  *
  * Replaces the round-3 decode STUB: the engine now wraps its synthetic
  * payloads in REAL public container formats (PNG, GIF89a, BMP) and the
  * decode step is a genuine header parse — magic-number dispatch plus
  * big/little-endian dimension reads at the offsets each specification
  * defines (PNG IHDR, GIF logical screen descriptor, BITMAPINFOHEADER).
  * No external codec library is needed: dimension probing is a pure
  * byte-level operation, which is exactly what fast image-probe tools do.
  *
  * `parse` validates signature and layout but not the PNG CRC — it is a
  * dimension probe, not a pixel decoder (the in-engine Column synthesis
  * cannot compute CRC32, so probe semantics keep the two synthesis paths
  * equivalent; the JVM synthesis below writes the real CRC).
  */
object ImageHeaders {

  val PngHeaderLen = 33 // 8 signature + 8 IHDR len/type + 13 data + 4 CRC
  val GifHeaderLen = 13 // 6 signature + 7 logical screen descriptor
  val BmpHeaderLen = 54 // 14 file header + 40 BITMAPINFOHEADER

  /** (format, width, height) if the bytes open with a well-formed PNG,
    * GIF, or BMP header; None otherwise. */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length >= PngHeaderLen &&
        u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        be32(8) == 13 &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (b.length >= GifHeaderLen &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '9' || b(4) == '7') && b(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= BmpHeaderLen &&
        b(0) == 'B' && b(1) == 'M' && le32(14) >= 40)
      Some(("bmp", le32(18), le32(22)))
    else None
  }

  // ---- JVM synthesis (spec fixtures; the engine-side twin is the pure
  // Column construction in MultimodalOps.wrapImage) -----------------------

  private def be(out: ByteArrayOutputStream, v: Int, n: Int): Unit =
    (n - 1 to 0 by -1).foreach(i => out.write((v >>> (i * 8)) & 0xff))

  private def le(out: ByteArrayOutputStream, v: Int, n: Int): Unit =
    (0 until n).foreach(i => out.write((v >>> (i * 8)) & 0xff))

  def png(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    be(out, 13, 4)
    val ihdr = new ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes("US-ASCII"))
    be(ihdr, w, 4); be(ihdr, h, 4)
    ihdr.write(Array[Byte](8, 2, 0, 0, 0)) // depth, RGB, deflate, std, none
    val chunk = ihdr.toByteArray
    out.write(chunk)
    val crc = new CRC32(); crc.update(chunk)
    be(out, crc.getValue.toInt, 4)
    out.write(body)
    out.toByteArray
  }

  def gif(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    le(out, w, 2); le(out, h, 2)
    out.write(Array[Byte](0, 0, 0)) // GCT flags, background, aspect
    out.write(body)
    out.toByteArray
  }

  // ---- audio: canonical 44-byte RIFF/WAVE PCM header -------------------

  val WavHeaderLen = 44

  /** (sampleRate, channels, bitsPerSample, dataLen) if the bytes open
    * with a well-formed RIFF/WAVE fmt header; None otherwise. */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length >= WavHeaderLen &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
        b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ')
      Some((le32(24), le16(22), le16(34), le32(40)))
    else None
  }

  def wav(sampleRate: Int, channels: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    le(out, 36 + body.length, 4)
    out.write("WAVEfmt ".getBytes("US-ASCII"))
    le(out, 16, 4)                         // fmt chunk size
    le(out, 1, 2)                          // PCM
    le(out, channels, 2)
    le(out, sampleRate, 4)
    le(out, sampleRate * channels * 2, 4)  // byte rate
    le(out, channels * 2, 2)               // block align
    le(out, 16, 2)                         // bits per sample
    out.write("data".getBytes("US-ASCII"))
    le(out, body.length, 4)
    out.write(body)
    out.toByteArray
  }

  // ---- video: ISO BMFF (MP4) ftyp + moov/mvhd ---------------------------

  /** ftyp(20) + moov(8) + mvhd(108) — the fixed prefix the Column twin
    * synthesizes; mdat header adds 8 more before the payload. */
  val Mp4HeaderLen = 20 + 8 + 108 + 8

  /** (majorBrand, timescale, durationUnits) by genuinely WALKING the
    * top-level box list to moov and moov's children to mvhd (v0 and v1
    * layouts) — not fixed offsets, so inputs with extra leading boxes
    * (free, skip) parse too. None if the box structure is malformed. */
  def parseMp4(b: Array[Byte]): Option[(String, Long, Long)] = {
    def u8(i: Int) = (b(i) & 0xff).toLong
    def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int) = (be32(i) << 32) | be32(i + 4)
    def typ(i: Int) = new String(b, i + 4, 4, "US-ASCII")
    def boxes(from: Int, until: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] { // (type, payloadStart, payloadEnd)
        private var at = from
        def hasNext: Boolean = at + 8 <= until && be32(at) >= 8 &&
          at + be32(at) <= until
        def next(): (String, Int, Int) = {
          val sz = be32(at).toInt
          val r = (typ(at), at + 8, at + sz)
          at += sz
          r
        }
      }
    if (b.length < 20) return None
    for {
      brand <- boxes(0, b.length).collectFirst {
        case ("ftyp", s, e) if e - s >= 4 => new String(b, s, 4, "US-ASCII")
      }
      (ms, me) <- boxes(0, b.length).collectFirst {
        case ("moov", s, e) => (s, e)
      }
      p <- boxes(ms, me).collectFirst { case ("mvhd", s, _) => s }
      meta <- u8(p) match { // version byte
        case 0 if p + 20 <= b.length =>
          Some((brand, be32(p + 12), be32(p + 16)))
        case 1 if p + 32 <= b.length =>
          Some((brand, be32(p + 20), be64(p + 24)))
        case _ => None
      }
    } yield meta
  }

  /** Minimal ISO BMFF synth: ftyp(isom) + moov[mvhd v0] + mdat[body].
    * `leading` prepends extra boxes (e.g. a `free` box) so specs can
    * prove the parser walks rather than assumes offsets. */
  def mp4(timescale: Int, durationUnits: Int, body: Array[Byte],
          leading: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(leading)
    be(out, 20, 4); out.write("ftypisom".getBytes("US-ASCII"))
    be(out, 0, 4); out.write("isom".getBytes("US-ASCII"))
    be(out, 8 + 108, 4); out.write("moov".getBytes("US-ASCII"))
    be(out, 108, 4); out.write("mvhd".getBytes("US-ASCII"))
    be(out, 0, 4)                   // version 0 + flags
    be(out, 0, 4); be(out, 0, 4)    // creation / modification time
    be(out, timescale, 4)
    be(out, durationUnits, 4)
    be(out, 0x00010000, 4)          // rate 1.0
    be(out, 0x0100, 2); be(out, 0, 2) // volume, reserved
    (0 until 8).foreach(_ => out.write(0)) // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      .foreach(v => be(out, v, 4))  // unity matrix
    (0 until 24).foreach(_ => out.write(0)) // pre_defined
    be(out, 1, 4)                   // next track id
    be(out, 8 + body.length, 4); out.write("mdat".getBytes("US-ASCII"))
    out.write(body)
    out.toByteArray
  }

  def bmp(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("BM".getBytes("US-ASCII"))
    le(out, BmpHeaderLen + body.length, 4) // file size
    le(out, 0, 4)                          // reserved
    le(out, BmpHeaderLen, 4)               // pixel data offset
    le(out, 40, 4)                         // BITMAPINFOHEADER size
    le(out, w, 4); le(out, h, 4)
    le(out, 1, 2)                          // planes
    le(out, 24, 2)                         // bits per pixel
    (0 until 24).foreach(_ => out.write(0)) // compression..importantColors
    out.write(body)
    out.toByteArray
  }
}
