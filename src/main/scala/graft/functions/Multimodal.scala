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
  * row padding) and RIFF/WAVE PCM (16-bit mono, chunk-walked). The encode
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
    require(text.length > 0, "empty pixel source")
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
    require(text.length > 0, "empty sample source")
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
}

/** Encode a BMP from (text, width, height, seed). */
final case class BmpEncode(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any, w: Any, h: Any, s: Any): Any =
    MediaCodec.bmpEncode(t.asInstanceOf[UTF8String].getBytes,
      w.asInstanceOf[Int], h.asInstanceOf[Int], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, h, s) =>
      s"${ev.value} = graft.functions.MediaCodec.bmpEncode($t.getBytes(), $w, $h, $s);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): BmpEncode =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Encode a PCM WAV from (text, sampleRate, nSamples, seed). */
final case class WavEncode(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any, r: Any, n: Any, s: Any): Any =
    MediaCodec.wavEncode(t.asInstanceOf[UTF8String].getBytes,
      r.asInstanceOf[Int], n.asInstanceOf[Int], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, r, n, s) =>
      s"${ev.value} = graft.functions.MediaCodec.wavEncode($t.getBytes(), $r, $n, $s);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): WavEncode =
    copy(first = f, second = s, third = t, fourth = q)
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
