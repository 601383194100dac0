package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real (not stubbed) multimodal asset codecs for the p13/p28 pipelines —
  * pure-JVM formats that need no media libraries: uncompressed 24-bit BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows with 4-byte
  * row padding), RIFF/WAVE PCM (16-bit mono, chunk-walked), and 8-bit
  * truecolor PNG (CRC-checked chunk walk, real zlib inflate via
  * `java.util.zip`, full five-filter scanline reconstruction). The encode
  * side manufactures the binary assets deterministically from document
  * text (the container ships no real media, so the fixture IS the
  * generator); the decode side is a genuine parser: it reads dimensions,
  * sample rate and sample data out of the BYTES, so a header laid out
  * wrong, a row padded wrong, or a sample written in the wrong endianness
  * shows up as a stats mismatch against the oracle's direct arithmetic.
  *
  * Scale notes: both decoders are single-pass, allocation-free per row
  * (no intermediate pixel/sample arrays), and run inside whole-stage
  * codegen via static calls — the shape a 100 TB asset-ingest pass needs:
  * content stays an opaque BINARY column, per-asset work is a projection,
  * and malformed assets decode to NULL (data, not exceptions — a corrupt
  * file must not kill a 10^9-asset batch; callers count nulls). */
object MediaCodec {

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Deterministic pixel source: channel c of logical pixel k reads text
    * byte (seed + 3k + c) mod len — the formula the DuckDB oracle
    * recomputes directly from the text. */
  def bmpEncode(text: Array[Byte], w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384, s"bmp dims out of range: ${w}x$h")
    // an empty document can't source pixels: that's DATA (null asset, the
    // decode side's own contract), not an exception — one empty doc must
    // not kill a corpus-wide encode pass
    if (text.length == 0) return null
    val l = text.length
    val rowBytes = (3 * w + 3) & ~3
    val imgSize = rowBytes * h
    val out = new Array[Byte](54 + imgSize)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, 54 + imgSize); putU32(out, 10, 54)
    putU32(out, 14, 40); putU32(out, 18, w); putU32(out, 22, h)
    putU16(out, 26, 1); putU16(out, 28, 24); putU32(out, 30, 0)
    putU32(out, 34, imgSize); putU32(out, 38, 2835); putU32(out, 42, 2835)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up storage
      var base = 54 + fileRow * rowBytes
      var x = 0
      while (x < w) {
        val k = y * w + x
        out(base) = text((seed + 3 * k) % l)         // B
        out(base + 1) = text((seed + 3 * k + 1) % l) // G
        out(base + 2) = text((seed + 3 * k + 2) % l) // R
        base += 3; x += 1
      }
      fileRow += 1 // padding bytes stay zero
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP; null on anything malformed. Output:
    * (width, height, sum_r, sum_g, sum_b, wsum_b) where wsum_b weights
    * each blue byte by its logical pixel index + 1 — POSITION-sensitive,
    * so a decoder that mishandles bottom-up order or row padding cannot
    * pass by luck of permutation-invariant sums. */
  def bmpDecode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return null
    val off = i32le(bytes, 10)
    val w = i32le(bytes, 18)
    val hRaw = i32le(bytes, 22)
    val planes = u16le(bytes, 26)
    val bpp = u16le(bytes, 28)
    val comp = i32le(bytes, 30)
    // adversarial-header guards: all size arithmetic in Long, dims capped —
    // a width near 2^31 would make the Int rowBytes negative and slip past
    // a naive bounds check into an out-of-bounds read; corrupt input must
    // yield null, never an exception (MultimodalSpec fuzzes random bytes)
    if (w <= 0 || w > (1 << 20) || hRaw == 0 || hRaw == Int.MinValue ||
        math.abs(hRaw) > (1 << 20) || planes != 1 || bpp != 24 || comp != 0) return null
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val rowBytes = ((3L * w + 3) & ~3L).toInt
    if (off < 54 || off.toLong + rowBytes.toLong * h > bytes.length) return null
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsumB = 0L
    var fileRow = 0
    while (fileRow < h) {
      val y = if (topDown) fileRow else h - 1 - fileRow
      var base = off + fileRow * rowBytes
      var x = 0
      while (x < w) {
        val b = bytes(base) & 0xff
        sumB += b
        sumG += bytes(base + 1) & 0xff
        sumR += bytes(base + 2) & 0xff
        wsumB += (y.toLong * w + x + 1) * b
        base += 3; x += 1
      }
      fileRow += 1
    }
    new GenericInternalRow(Array[Any](w, h, sumR, sumG, sumB, wsumB))
  }

  /** Deterministic sample source: s(i) = ((text[(seed+i) mod len]*131 +
    * i*7) mod 65536) - 32768, signed 16-bit — again the exact formula the
    * oracle recomputes. */
  def wavEncode(text: Array[Byte], rate: Int, n: Int, seed: Int): Array[Byte] = {
    require(rate >= 1 && rate <= (1 << 22) && n >= 1 && n <= (1 << 24),
      s"wav params out of range: rate=$rate n=$n")
    if (text.length == 0) return null // data, not an exception (see bmpEncode)
    val l = text.length
    val dataSize = 2 * n
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16); putU16(out, 20, 1); putU16(out, 22, 1)
    putU32(out, 24, rate); putU32(out, 28, rate * 2)
    putU16(out, 32, 2); putU16(out, 34, 16)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, dataSize)
    var i = 0
    while (i < n) {
      val s = (((text((seed + i) % l) & 0xff) * 131 + i * 7) % 65536) - 32768
      putU16(out, 44 + 2 * i, s & 0xffff)
      i += 1
    }
    out
  }

  /** Walk RIFF chunks to the fmt and data chunks (tolerating extra chunks
    * in between, per spec — a fixed 44-byte assumption breaks on LIST
    * metadata); null on malformed / non-PCM / non-mono / non-16-bit.
    * Output: (sample_rate, n_samples, sum_abs, max_abs, wsum) with wsum =
    * Σ (i+1)·s(i), position-sensitive like the BMP wsum. */
  def wavDecode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 44) return null
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
        bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return null
    var pos = 12
    var rate = -1
    var dataOff = -1; var dataSize = -1
    while (pos + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val size = i32le(bytes, pos + 4)
      // Long bound check: a chunk size near 2^31 would wrap pos+8+size
      // negative and slip past an Int comparison
      if (size < 0 || pos.toLong + 8L + size > bytes.length) return null
      val isFmt = bytes(pos) == 'f' && bytes(pos + 1) == 'm' && bytes(pos + 2) == 't' && bytes(pos + 3) == ' '
      val isData = bytes(pos) == 'd' && bytes(pos + 1) == 'a' && bytes(pos + 2) == 't' && bytes(pos + 3) == 'a'
      if (isFmt) {
        if (size < 16) return null
        val fmt = u16le(bytes, pos + 8)
        val channels = u16le(bytes, pos + 10)
        val bits = u16le(bytes, pos + 22)
        if (fmt != 1 || channels != 1 || bits != 16) return null
        rate = i32le(bytes, pos + 12)
        if (rate <= 0) return null
      } else if (isData) {
        dataOff = pos + 8; dataSize = size
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (rate < 0 || dataOff < 0 || dataSize % 2 != 0) return null
    val n = dataSize / 2
    var sumAbs = 0L; var maxAbs = 0; var wsum = 0L
    var i = 0
    while (i < n) {
      val s = u16le(bytes, dataOff + 2 * i).toShort.toInt
      val a = math.abs(s)
      sumAbs += a
      if (a > maxAbs) maxAbs = a
      wsum += (i + 1).toLong * s
      i += 1
    }
    new GenericInternalRow(Array[Any](rate, n, sumAbs, maxAbs, wsum))
  }

  // ------------------------------------------------------------- PNG

  private val PngSig: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def u32be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def putU32be(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 24) & 0xff).toByte; b(off + 1) = ((v >> 16) & 0xff).toByte
    b(off + 2) = ((v >> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
  }
  private def crcOf(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  /** Raw (filtered) scanline bytes of a w×h truecolor PNG: one filter
    * byte + 3w pixel bytes per row. */
  private def pngRawSize(w: Int, h: Int): Int = h * (1 + 3 * w)

  /** Exact encoded size — formula-computable because [[pngEncode]] emits
    * the zlib stream as STORED blocks: the oracle recomputes
    * 63 + 5·⌈raw/65535⌉ + raw without ever deflating anything. */
  def pngSize(w: Int, h: Int): Int = {
    val raw = pngRawSize(w, h)
    63 + 5 * ((raw + 65534) / 65535) + raw
  }

  /** Deterministic pixel source shared with [[bmpEncode]] at the LOGICAL
    * channel level — blue of pixel k reads text byte (seed+3k), green
    * +1, red +2 — serialized in PNG's RGB order with filter-0 rows, so
    * both image formats decode to identical stats for the same inputs
    * and the oracle needs one formula set. The zlib stream is written
    * here as stored (uncompressed) deflate blocks + Adler-32: byte-
    * deterministic and size-predictable, while [[pngDecode]] runs a real
    * `Inflater` and accepts ANY conforming zlib stream (golden tests
    * feed it best-compression Deflater output and all four nontrivial
    * row filters). */
  def pngEncode(text: Array[Byte], w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384, s"png dims out of range: ${w}x$h")
    if (text.length == 0) return null // data, not an exception (see bmpEncode)
    val l = text.length
    val raw = new Array[Byte](pngRawSize(w, h))
    var pos = 0
    var y = 0
    while (y < h) {
      raw(pos) = 0 // filter type None
      pos += 1
      var x = 0
      while (x < w) {
        val k = y * w + x
        raw(pos) = text((seed + 3 * k + 2) % l)     // R
        raw(pos + 1) = text((seed + 3 * k + 1) % l) // G
        raw(pos + 2) = text((seed + 3 * k) % l)     // B
        pos += 3; x += 1
      }
      y += 1
    }
    // zlib stream: 2-byte header, stored blocks (5-byte header each), adler
    val nblocks = (raw.length + 65534) / 65535
    val idat = new Array[Byte](2 + 5 * nblocks + raw.length + 4)
    idat(0) = 0x78; idat(1) = 0x01
    var ip = 2; var rp = 0
    while (rp < raw.length) {
      val blk = math.min(raw.length - rp, 65535)
      idat(ip) = if (rp + blk == raw.length) 1 else 0 // BFINAL + BTYPE=00
      idat(ip + 1) = (blk & 0xff).toByte; idat(ip + 2) = ((blk >> 8) & 0xff).toByte
      idat(ip + 3) = (~blk & 0xff).toByte; idat(ip + 4) = ((~blk >> 8) & 0xff).toByte
      System.arraycopy(raw, rp, idat, ip + 5, blk)
      ip += 5 + blk; rp += blk
    }
    val adler = new java.util.zip.Adler32
    adler.update(raw, 0, raw.length)
    putU32be(idat, idat.length - 4, adler.getValue.toInt)
    // file: signature + IHDR + IDAT + IEND, each chunk CRC'd over type+data
    val out = new Array[Byte](8 + 25 + (12 + idat.length) + 12)
    System.arraycopy(PngSig, 0, out, 0, 8)
    def chunk(off: Int, name: String, data: Array[Byte]): Int = {
      putU32be(out, off, data.length)
      var i = 0
      while (i < 4) { out(off + 4 + i) = name.charAt(i).toByte; i += 1 }
      System.arraycopy(data, 0, out, off + 8, data.length)
      putU32be(out, off + 8 + data.length, crcOf(out, off + 4, 4 + data.length))
      off + 12 + data.length
    }
    val ihdr = new Array[Byte](13)
    putU32be(ihdr, 0, w); putU32be(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type 2 (truecolor)
    var off = chunk(8, "IHDR", ihdr)
    off = chunk(off, "IDAT", idat)
    chunk(off, "IEND", Array.emptyByteArray)
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Parse an 8-bit truecolor PNG — a genuine decoder: chunk walk with
    * per-chunk CRC verification, multi-IDAT concatenation, real zlib
    * inflate (`java.util.zip.Inflater` — deflate ships in the JDK, which
    * is why PNG needs no native media library), and full scanline
    * UNFILTERING for all five filter types (None/Sub/Up/Average/Paeth).
    * Output schema matches [[bmpDecode]] so the two image formats mix in
    * one pipeline: (width, height, sum_r, sum_g, sum_b, wsum_b), wsum_b
    * position-weighted over top-down logical pixel order. Null on
    * anything malformed: bad signature, CRC mismatch, oversized dims
    * (the same Long-bounds discipline as the BMP header guards),
    * interlaced/paletted/non-8-bit files, a zlib stream that inflates to
    * the wrong length, or an unknown filter byte. */
  def pngDecode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 57) return null
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return null; i += 1 }
    var pos = 8
    var w = 0; var h = 0
    var sawIhdr = false; var sawIend = false
    // IDAT payload bounded by the file itself, so pre-size conservatively
    var idat = new Array[Byte](0); var idatLen = 0
    while (pos + 12 <= bytes.length && !sawIend) {
      val len = u32be(bytes, pos)
      // Long bound: a length near 2^31 would wrap pos+12+len negative
      if (len < 0 || pos.toLong + 12L + len > bytes.length) return null
      if (crcOf(bytes, pos + 4, 4 + len) != u32be(bytes, pos + 8 + len)) return null
      val t0 = bytes(pos + 4); val t1 = bytes(pos + 5)
      val t2 = bytes(pos + 6); val t3 = bytes(pos + 7)
      if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
        if (sawIhdr || len != 13) return null
        sawIhdr = true
        w = u32be(bytes, pos + 8); h = u32be(bytes, pos + 12)
        val (depth, color, comp, filt, ilace) = (bytes(pos + 16), bytes(pos + 17),
          bytes(pos + 18), bytes(pos + 19), bytes(pos + 20))
        if (w <= 0 || w > 16384 || h <= 0 || h > 16384 ||
            depth != 8 || color != 2 || comp != 0 || filt != 0 || ilace != 0) return null
      } else if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        if (!sawIhdr) return null
        if (idatLen + len > idat.length) {
          val grown = new Array[Byte](math.max(idat.length * 2, idatLen + len))
          System.arraycopy(idat, 0, grown, 0, idatLen)
          idat = grown
        }
        System.arraycopy(bytes, pos + 8, idat, idatLen, len)
        idatLen += len
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        sawIend = true
      }
      pos += 12 + len
    }
    if (!sawIhdr || !sawIend || idatLen == 0) return null
    // inflate to EXACTLY the expected raw size (h·(1+3w) ≤ ~768 MB is
    // already excluded by the 16384 dim cap; allocation is raw-bounded,
    // never attacker-chosen — a zip bomb can't expand past `raw.length`)
    val raw = new Array[Byte](pngRawSize(w, h))
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat, 0, idatLen)
      var got = 0
      try {
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          // zero-progress without finishing = malformed: truncated stream
          // (needsInput) or an FDICT zlib header demanding a preset
          // dictionary (needsDictionary) — our encoder never emits FDICT,
          // so treat both as NULL rather than spinning forever on
          // adversarial bytes. (n == 0 with finished() is the legal
          // trailer-consuming final call; the loop condition exits it.)
          if (n == 0 && !inf.finished()) return null
          got += n
        }
      } catch { case _: java.util.zip.DataFormatException => return null }
      if (got != raw.length || !inf.finished()) return null
    } finally inf.end()
    // unfilter + accumulate in one pass; prior row needed for Up/Avg/Paeth
    val rowBytes = 3 * w
    val prev = new Array[Byte](rowBytes)
    val cur = new Array[Byte](rowBytes)
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsumB = 0L
    var y = 0
    while (y < h) {
      val base = y * (1 + rowBytes)
      val f = raw(base) & 0xff
      if (f > 4) return null
      var x = 0
      while (x < rowBytes) {
        val v = raw(base + 1 + x) & 0xff
        val left = if (x >= 3) cur(x - 3) & 0xff else 0
        val up = prev(x) & 0xff
        val upLeft = if (x >= 3) prev(x - 3) & 0xff else 0
        val recon = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + ((left + up) >> 1)
          case _ => v + paeth(left, up, upLeft)
        }
        cur(x) = (recon & 0xff).toByte
        x += 1
      }
      var px = 0
      while (px < w) {
        val k = y.toLong * w + px
        sumR += cur(3 * px) & 0xff
        sumG += cur(3 * px + 1) & 0xff
        val b = cur(3 * px + 2) & 0xff
        sumB += b
        wsumB += (k + 1) * b
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    new GenericInternalRow(Array[Any](w, h, sumR, sumG, sumB, wsumB))
  }
}

/** Encode a BMP from (text, width, height, seed). NULL on null inputs AND
  * on an empty text (no pixel source — the encode mirror of the decoders'
  * malformed-is-data contract), so the result is nullable even over
  * non-null children and codegen must re-check the call result. */
final case class BmpEncode(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any, w: Any, h: Any, s: Any): Any =
    MediaCodec.bmpEncode(t.asInstanceOf[UTF8String].getBytes,
      w.asInstanceOf[Int], h.asInstanceOf[Int], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, h, s) =>
      s"""${ev.value} = graft.functions.MediaCodec.bmpEncode($t.getBytes(), $w, $h, $s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): BmpEncode =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Encode a PCM WAV from (text, sampleRate, nSamples, seed); NULL on an
  * empty sample source (see [[BmpEncode]]). */
final case class WavEncode(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any, r: Any, n: Any, s: Any): Any =
    MediaCodec.wavEncode(t.asInstanceOf[UTF8String].getBytes,
      r.asInstanceOf[Int], n.asInstanceOf[Int], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, r, n, s) =>
      s"""${ev.value} = graft.functions.MediaCodec.wavEncode($t.getBytes(), $r, $n, $s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): WavEncode =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Encode a truecolor PNG from (text, width, height, seed); NULL on an
  * empty pixel source (see [[BmpEncode]]). */
final case class PngEncode(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any, w: Any, h: Any, s: Any): Any =
    MediaCodec.pngEncode(t.asInstanceOf[UTF8String].getBytes,
      w.asInstanceOf[Int], h.asInstanceOf[Int], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, h, s) =>
      s"""${ev.value} = graft.functions.MediaCodec.pngEncode($t.getBytes(), $w, $h, $s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PngEncode =
    copy(first = f, second = s, third = t, fourth = q)
}
object PngEncode {
  def apply(text: Column, w: Column, h: Column, seed: Column): Column =
    ColumnBridge.column(PngEncode(ColumnBridge.expression(text),
      ColumnBridge.expression(w), ColumnBridge.expression(h), ColumnBridge.expression(seed)))
}

/** Decode a truecolor PNG to the [[BmpStats]] stat schema (width, height,
  * sum_r, sum_g, sum_b, wsum_b); NULL for malformed bytes. */
final case class PngStats(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BmpStats.schema
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    MediaCodec.pngDecode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.MediaCodec.pngDecode(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }
  override protected def withNewChildInternal(newChild: Expression): PngStats = copy(child = newChild)
}
object PngStats {
  def apply(c: Column): Column = ColumnBridge.column(PngStats(ColumnBridge.expression(c)))
}

/** Decode a BMP binary to (width, height, sum_r, sum_g, sum_b, wsum_b);
  * NULL for malformed bytes (corrupt assets are data, not exceptions). */
final case class BmpStats(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BmpStats.schema
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    MediaCodec.bmpDecode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.MediaCodec.bmpDecode(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }
  override protected def withNewChildInternal(newChild: Expression): BmpStats = copy(child = newChild)
}
object BmpStats {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("wsum_b", LongType, nullable = false)))
  def apply(c: Column): Column = ColumnBridge.column(BmpStats(ColumnBridge.expression(c)))
}

/** Decode a RIFF/WAVE PCM binary to (sample_rate, n_samples, sum_abs,
  * max_abs, wsum); NULL for malformed/unsupported bytes. */
final case class WavStats(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = WavStats.schema
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    MediaCodec.wavDecode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.MediaCodec.wavDecode(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }
  override protected def withNewChildInternal(newChild: Expression): WavStats = copy(child = newChild)
}
object WavStats {
  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("max_abs", IntegerType, nullable = false),
    StructField("wsum", LongType, nullable = false)))
  def apply(c: Column): Column = ColumnBridge.column(WavStats(ColumnBridge.expression(c)))
}

object BmpEncode {
  def apply(text: Column, w: Column, h: Column, seed: Column): Column =
    ColumnBridge.column(BmpEncode(ColumnBridge.expression(text),
      ColumnBridge.expression(w), ColumnBridge.expression(h), ColumnBridge.expression(seed)))
}
object WavEncode {
  def apply(text: Column, rate: Column, n: Column, seed: Column): Column =
    ColumnBridge.column(WavEncode(ColumnBridge.expression(text),
      ColumnBridge.expression(rate), ColumnBridge.expression(n), ColumnBridge.expression(seed)))
}
