package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BMP/WAV codecs to the REAL file formats via hand-built golden
  * byte arrays written straight from the format specs — independent of the
  * encoder, so an encode/decode bug pair that cancels in the round-trip
  * still fails here. */
class MultimodalSpec extends AnyFunSuite {

  private def leI(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def leS(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** A 2x2 24-bit BMP hand-assembled from the spec: bottom-up rows, each
    * 2-pixel row is 6 bytes + 2 pad bytes. Logical pixels (BGR):
    * (0,0)=(1,2,3) (1,0)=(4,5,6) / (0,1)=(7,8,9) (1,1)=(10,11,12). */
  private val goldenBmp: Array[Byte] = {
    val rowBytes = 8 // (3*2+3) & ~3
    val img = 2 * rowBytes
    (Seq('B'.toByte, 'M'.toByte) ++ leI(54 + img) ++ leI(0) ++ leI(54) ++
      leI(40) ++ leI(2) ++ leI(2) ++ leS(1) ++ leS(24) ++ leI(0) ++ leI(img) ++
      leI(2835) ++ leI(2835) ++ leI(0) ++ leI(0) ++
      // file row 0 = logical BOTTOM row y=1: pixels (7,8,9),(10,11,12) + pad
      Seq[Byte](7, 8, 9, 10, 11, 12, 0, 0) ++
      // file row 1 = logical TOP row y=0: pixels (1,2,3),(4,5,6) + pad
      Seq[Byte](1, 2, 3, 4, 5, 6, 0, 0)).toArray
  }

  test("bmpDecode reads a hand-built spec BMP: dims, channel sums, position weights") {
    val r = MediaCodec.bmpDecode(goldenBmp)
    assert(r != null)
    assert(r.getInt(0) == 2 && r.getInt(1) == 2)
    assert(r.getLong(2) == 3L + 6 + 9 + 12, "sum_r = third byte of each BGR pixel")
    assert(r.getLong(3) == 2L + 5 + 8 + 11, "sum_g")
    assert(r.getLong(4) == 1L + 4 + 7 + 10, "sum_b")
    // wsum_b weights blue by logical pixel index+1, top row first:
    // 1*1 + 2*4 + 3*7 + 4*10
    assert(r.getLong(5) == 1L * 1 + 2 * 4 + 3 * 7 + 4 * 10,
      "bottom-up storage must map back to logical order")
  }

  test("bmpDecode handles top-down BMPs (negative height)") {
    val b = goldenBmp.clone()
    // height := -2 (i32le at 22) and swap the two pixel rows so the image
    // is the same logical picture stored top-down
    val neg = leI(-2)
    (0 until 4).foreach(i => b(22 + i) = neg(i))
    val tmp = b.slice(54, 62)
    Array.copy(b, 62, b, 54, 8)
    Array.copy(tmp, 0, b, 62, 8)
    val r = MediaCodec.bmpDecode(b)
    assert(r != null && r.getInt(1) == 2)
    assert(r.getLong(5) == 1L * 1 + 2 * 4 + 3 * 7 + 4 * 10, "same logical wsum")
  }

  test("bmpDecode returns null on malformed input, not an exception") {
    assert(MediaCodec.bmpDecode(null) == null)
    assert(MediaCodec.bmpDecode(Array[Byte](1, 2, 3)) == null)
    assert(MediaCodec.bmpDecode(goldenBmp.take(53)) == null) // truncated header
    val wrongMagic = goldenBmp.clone(); wrongMagic(0) = 'X'
    assert(MediaCodec.bmpDecode(wrongMagic) == null)
    val bpp8 = goldenBmp.clone(); bpp8(28) = 8 // unsupported depth
    assert(MediaCodec.bmpDecode(bpp8) == null)
    val truncPixels = goldenBmp.take(60) // header ok, pixel data short
    assert(MediaCodec.bmpDecode(truncPixels) == null)
  }

  /** A 3-sample 8 kHz mono 16-bit WAV hand-assembled from the RIFF spec,
    * with an extra junk chunk BETWEEN fmt and data (real files carry LIST
    * metadata there — a fixed-44-byte-offset reader fails this). */
  private val goldenWav: Array[Byte] = {
    val samples = Seq(100, -200, 32767)
    val data = samples.flatMap(s => leS(s & 0xffff))
    val junk = Seq('j'.toByte, 'u'.toByte, 'n'.toByte, 'k'.toByte) ++ leI(3) ++
      Seq[Byte](9, 9, 9, 0) // 3 payload bytes + 1 pad (word alignment)
    val fmt = Seq('f'.toByte, 'm'.toByte, 't'.toByte, ' '.toByte) ++ leI(16) ++
      leS(1) ++ leS(1) ++ leI(8000) ++ leI(16000) ++ leS(2) ++ leS(16)
    val dataCh = Seq('d'.toByte, 'a'.toByte, 't'.toByte, 'a'.toByte) ++ leI(data.length) ++ data
    val body = fmt ++ junk ++ dataCh
    (Seq('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte) ++ leI(4 + body.length) ++
      Seq('W'.toByte, 'A'.toByte, 'V'.toByte, 'E'.toByte) ++ body).toArray
  }

  test("wavDecode chunk-walks a spec WAV with an interposed junk chunk") {
    val r = MediaCodec.wavDecode(goldenWav)
    assert(r != null)
    assert(r.getInt(0) == 8000 && r.getInt(1) == 3)
    assert(r.getLong(2) == 100L + 200 + 32767, "sum_abs")
    assert(r.getInt(3) == 32767, "max_abs")
    assert(r.getLong(4) == 1L * 100 + 2L * -200 + 3L * 32767, "position-weighted sum")
  }

  test("wavDecode returns null on malformed/unsupported input") {
    assert(MediaCodec.wavDecode(null) == null)
    assert(MediaCodec.wavDecode(Array.fill[Byte](44)(0)) == null)
    val stereo = goldenWav.clone()
    // channels u16le sits at fmt payload +2 (file offset 12+8+2 = 22)
    stereo(22) = 2
    assert(MediaCodec.wavDecode(stereo) == null)
    assert(MediaCodec.wavDecode(goldenWav.take(40)) == null)
  }

  test("encode/decode round-trip equals directly computed stats (fuzz)") {
    val texts = Seq("hello world example text", "a", "zzzz yyy xx w",
      (0 until 200).map(i => ('a' + i % 26).toChar).mkString)
    for (t <- texts; (w, h) <- Seq((1, 1), (3, 2), (12, 9), (5, 4)); seed <- Seq(0, 11, 33)) {
      val bytes = t.getBytes("UTF-8")
      val bmp = MediaCodec.bmpEncode(bytes, w, h, seed)
      assert(bmp.length == 54 + h * ((3 * w + 3) & ~3))
      val r = MediaCodec.bmpDecode(bmp)
      assert(r != null && r.getInt(0) == w && r.getInt(1) == h)
      val l = bytes.length
      def px(k: Int, c: Int): Int = bytes((seed + 3 * k + c) % l) & 0xff
      val n = w * h
      assert(r.getLong(2) == (0 until n).map(px(_, 2).toLong).sum, "sum_r")
      assert(r.getLong(4) == (0 until n).map(px(_, 0).toLong).sum, "sum_b")
      assert(r.getLong(5) == (0 until n).map(k => (k + 1L) * px(k, 0)).sum, "wsum_b")
    }
    for (t <- texts; (rate, n) <- Seq((8000, 1), (9000, 64), (10000, 163)); seed <- Seq(0, 5)) {
      val bytes = t.getBytes("UTF-8")
      val wav = MediaCodec.wavEncode(bytes, rate, n, seed)
      assert(wav.length == 44 + 2 * n)
      val r = MediaCodec.wavDecode(wav)
      assert(r != null && r.getInt(0) == rate && r.getInt(1) == n)
      val l = bytes.length
      def s(i: Int): Int = (((bytes((seed + i) % l) & 0xff) * 131 + i * 7) % 65536) - 32768
      assert(r.getLong(2) == (0 until n).map(i => math.abs(s(i)).toLong).sum, "sum_abs")
      assert(r.getInt(3) == (0 until n).map(i => math.abs(s(i))).max, "max_abs")
      assert(r.getLong(4) == (0 until n).map(i => (i + 1L) * s(i)).sum, "wsum")
    }
  }

  test("adversarial bytes never throw: random and header-mutated inputs yield null or a valid row") {
    // the null-on-malformed contract at 10^9-asset scale: NO byte stream
    // may crash the decoder — including headers crafted to overflow Int
    // size arithmetic (width near 2^31, chunk size near 2^31)
    val rng = new scala.util.Random(0xBAD5EED)
    for (trial <- 0 until 300) {
      val len = rng.nextInt(200)
      val junk = Array.fill[Byte](len)(rng.nextInt().toByte)
      MediaCodec.bmpDecode(junk); MediaCodec.wavDecode(junk) // must not throw
    }
    // mutate every header byte of the golden files to random values
    for (_ <- 0 until 300) {
      val b = goldenBmp.clone()
      (0 until 4).foreach(_ => b(rng.nextInt(54)) = rng.nextInt().toByte)
      MediaCodec.bmpDecode(b)
      val w = goldenWav.clone()
      (0 until 4).foreach(_ => w(rng.nextInt(44)) = rng.nextInt().toByte)
      MediaCodec.wavDecode(w)
    }
    // targeted overflow headers: width = Int.MaxValue/3-ish, height Int.MinValue
    val wide = goldenBmp.clone()
    val leMax = Seq(0xfe, 0xff, 0xff, 0x7f).map(_.toByte)
    (0 until 4).foreach(i => wide(18 + i) = leMax(i))
    assert(MediaCodec.bmpDecode(wide) == null)
    val negH = goldenBmp.clone()
    val leMin = Seq(0x00, 0x00, 0x00, 0x80).map(_.toByte)
    (0 until 4).foreach(i => negH(22 + i) = leMin(i))
    assert(MediaCodec.bmpDecode(negH) == null)
    val hugeChunk = goldenWav.clone()
    (0 until 4).foreach(i => hugeChunk(16 + i) = leMax(i)) // fmt size ~ 2^31
    assert(MediaCodec.wavDecode(hugeChunk) == null)
  }

  // ---- PNG: goldens hand-assembled from the spec in this file (chunk
  // layout, CRCs, forward filtering, Deflater compression all written
  // here, independent of the encoder) so an encode/decode bug pair that
  // cancels in the round-trip still fails

  private def pngChunk(name: String, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(data.length)
    dos.write(name.getBytes("US-ASCII")); dos.write(data)
    val crc = new java.util.zip.CRC32
    crc.update(name.getBytes("US-ASCII")); crc.update(data)
    dos.writeInt(crc.getValue.toInt)
    bos.toByteArray
  }
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 128)
    val n = d.deflate(buf); d.end()
    buf.take(n)
  }
  private def mkPng(w: Int, h: Int, idat: Array[Byte], split: Boolean = false): Array[Byte] = {
    val ihdr = new java.io.ByteArrayOutputStream()
    val di = new java.io.DataOutputStream(ihdr)
    di.writeInt(w); di.writeInt(h); di.write(8); di.write(2); di.write(0); di.write(0); di.write(0)
    val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 13.toByte, 10.toByte, 26.toByte, 10.toByte)
    val idats =
      if (split) pngChunk("IDAT", idat.take(idat.length / 2)) ++ pngChunk("IDAT", idat.drop(idat.length / 2))
      else pngChunk("IDAT", idat)
    sig ++ pngChunk("IHDR", ihdr.toByteArray) ++ idats ++ pngChunk("IEND", Array.emptyByteArray)
  }
  private def testPaeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }
  /** Forward-apply a spec filter to one row (the inverse of what the
    * decoder reconstructs). */
  private def filterRow(f: Int, cur: Array[Byte], prev: Array[Byte]): Array[Byte] =
    cur.indices.map { x =>
      val left = if (x >= 3) cur(x - 3) & 0xff else 0
      val up = prev(x) & 0xff
      val ul = if (x >= 3) prev(x - 3) & 0xff else 0
      val pred = f match {
        case 0 => 0
        case 1 => left
        case 2 => up
        case 3 => (left + up) >> 1
        case 4 => testPaeth(left, up, ul)
      }
      (((cur(x) & 0xff) - pred) & 0xff).toByte
    }.toArray

  test("pngDecode inflates a Deflater-compressed stream and undoes every filter type") {
    // 2x3 RGB pixels, values chosen to exercise byte wraparound in filters
    val px = Array[Int](
      10, 250, 3, 200, 7, 99,
      1, 128, 255, 30, 40, 50,
      77, 0, 13, 211, 180, 5)
    val w = 2; val h = 3
    val sumR = px.grouped(3).map(_(0)).sum
    val sumG = px.grouped(3).map(_(1)).sum
    val sumB = px.grouped(3).map(_(2)).sum
    val wsumB = px.grouped(3).zipWithIndex.map { case (p, k) => (k + 1L) * p(2) }.sum
    for (f <- 0 to 4; split <- Seq(false, true)) {
      val rows = px.map(_.toByte).grouped(3 * w).toSeq
      var prev = new Array[Byte](3 * w)
      val raw = rows.flatMap { r =>
        val fr = f.toByte +: filterRow(f, r, prev)
        prev = r
        fr
      }.toArray
      val r = MediaCodec.pngDecode(mkPng(w, h, deflate(raw), split))
      assert(r != null, s"filter $f split=$split must decode")
      assert(r.getInt(0) == w && r.getInt(1) == h)
      assert(r.getLong(2) == sumR && r.getLong(3) == sumG && r.getLong(4) == sumB,
        s"filter $f channel sums")
      assert(r.getLong(5) == wsumB, s"filter $f position weights")
    }
  }

  test("pngDecode returns null on malformed input: signature, CRC, IHDR, stream, filter") {
    val raw = Array[Byte](0, 1, 2, 3) // 1x1: filter 0 + one RGB pixel
    val good = mkPng(1, 1, deflate(raw))
    assert(MediaCodec.pngDecode(good) != null)
    assert(MediaCodec.pngDecode(null) == null)
    assert(MediaCodec.pngDecode(Array[Byte](1, 2, 3)) == null)
    val badSig = good.clone(); badSig(0) = 'X'
    assert(MediaCodec.pngDecode(badSig) == null)
    val badCrc = good.clone(); badCrc(good.length - 5) = (badCrc(good.length - 5) ^ 0x7f).toByte
    assert(MediaCodec.pngDecode(badCrc) == null, "chunk CRC must be verified")
    // IHDR variants: 16-bit depth, palette color, interlaced
    for ((off, v) <- Seq((24, 16), (25, 3), (28, 1))) {
      val b = good.clone(); b(off) = v.toByte
      // re-CRC the IHDR chunk so only the field (not the checksum) differs
      val crc = new java.util.zip.CRC32; crc.update(b, 12, 17)
      val cv = crc.getValue.toInt
      b(29) = ((cv >> 24) & 0xff).toByte; b(30) = ((cv >> 16) & 0xff).toByte
      b(31) = ((cv >> 8) & 0xff).toByte; b(32) = (cv & 0xff).toByte
      assert(MediaCodec.pngDecode(b) == null, s"IHDR byte $off=$v must be rejected")
    }
    // truncated zlib stream
    assert(MediaCodec.pngDecode(mkPng(1, 1, deflate(raw).dropRight(3))) == null)
    // stream inflates to the wrong size (2 pixels declared, 1 present)
    assert(MediaCodec.pngDecode(mkPng(2, 1, deflate(raw))) == null)
    // unknown filter type 5
    assert(MediaCodec.pngDecode(mkPng(1, 1, deflate(Array[Byte](5, 1, 2, 3)))) == null)
    // random junk must never throw
    val rng = new scala.util.Random(0x5EED)
    for (_ <- 0 until 300) {
      val junk = Array.fill[Byte](rng.nextInt(200))(rng.nextInt().toByte)
      MediaCodec.pngDecode(junk)
      val mut = good.clone()
      (0 until 4).foreach(_ => mut(rng.nextInt(good.length)) = rng.nextInt().toByte)
      MediaCodec.pngDecode(mut)
    }
  }

  test("png encode/decode round-trip equals BMP stats and the size formula") {
    val texts = Seq("hello world example text", "a", (0 until 200).map(i => ('a' + i % 26).toChar).mkString)
    for (t <- texts; (w, h) <- Seq((1, 1), (3, 2), (12, 9), (5, 4)); seed <- Seq(0, 11, 33)) {
      val bytes = t.getBytes("UTF-8")
      val png = MediaCodec.pngEncode(bytes, w, h, seed)
      assert(png.length == MediaCodec.pngSize(w, h), "stored-block size formula")
      val r = MediaCodec.pngDecode(png)
      assert(r != null && r.getInt(0) == w && r.getInt(1) == h)
      // the two image formats share the logical pixel source: stats equal
      val b = MediaCodec.bmpDecode(MediaCodec.bmpEncode(bytes, w, h, seed))
      assert((2 to 5).forall(i => r.getLong(i) == b.getLong(i)),
        "png and bmp must decode to identical stats for the same inputs")
    }
  }

  test("encode expressions null out empty sources instead of throwing") {
    import graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("ok", "some pixel text"), ("empty", ""))
      .toDF("tag", "text")
      .withColumn("bmp", BmpEncode($"text", lit(2), lit(2), lit(0)))
      .withColumn("wav", WavEncode($"text", lit(8000), lit(4), lit(0)))
      .withColumn("png", PngEncode($"text", lit(2), lit(2), lit(0)))
      .withColumn("png_st", PngStats($"png"))
    val rows = df.select($"tag", $"bmp", $"wav", $"png", $"png_st").collect()
    val bad = rows.find(_.getString(0) == "empty").get
    // an empty doc is DATA: null asset, row survives, job does not die
    assert(bad.isNullAt(1) && bad.isNullAt(2) && bad.isNullAt(3) && bad.isNullAt(4))
    val ok = rows.find(_.getString(0) == "ok").get
    assert(!ok.isNullAt(1) && !ok.isNullAt(2) && !ok.isNullAt(3))
    assert(ok.getStruct(4).getInt(0) == 2, "png decodes through the expression pipeline")
  }

  test("decode expressions run inside codegen and null out corrupt assets") {
    import graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("ok", "hello world sample"), ("bad", "x"))
      .toDF("tag", "text")
      .withColumn("content",
        when($"tag" === "ok", BmpEncode($"text", lit(4), lit(3), lit(0)))
          .otherwise(lit("not a bmp".getBytes)))
      .withColumn("st", BmpStats($"content"))
    val rows = df.select($"tag", $"st").collect()
    val ok = rows.find(_.getString(0) == "ok").get
    assert(!ok.isNullAt(1) && ok.getStruct(1).getInt(0) == 4)
    val bad = rows.find(_.getString(0) == "bad").get
    assert(bad.isNullAt(1), "corrupt asset decodes to NULL, the row survives")
    // wav path through expressions too
    val wdf = Seq(("ok", "audio text goes here"), ("bad", "y"))
      .toDF("tag", "text")
      .withColumn("content",
        when($"tag" === "ok", WavEncode($"text", lit(8000), lit(32), lit(0)))
          .otherwise(lit(Array[Byte](1, 2, 3, 4))))
      .withColumn("st", WavStats($"content"))
    val wrows = wdf.select($"tag", $"st").collect()
    assert(wrows.find(_.getString(0) == "ok").exists(r => !r.isNullAt(1) && r.getStruct(1).getInt(1) == 32))
    assert(wrows.find(_.getString(0) == "bad").exists(_.isNullAt(1)))
  }
}
