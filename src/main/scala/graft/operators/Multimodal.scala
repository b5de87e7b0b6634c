package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: image/audio payloads as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract stage a
  * training-data pipeline runs over them.
  *
  * The container has no media fixtures, so [[Codec.synthBmp]] /
  * [[Codec.synthWav]] SYNTHESIZE real containers (valid 24-bpp BMP files
  * with row padding; valid PCM WAV files with RIFF chunk structure) from
  * document text, and [[Codec.decode]] is a REAL parser: it walks the
  * actual header bytes (magic, offsets, chunk lists), validates them, and
  * computes pixel/sample statistics from the encoded payload — the same
  * code would decode any simple external BMP/WAV. Decode runs
  * partition-parallel via `mapPartitions` (rows stream through; nothing is
  * collected), the shape that fans a codec across 1000 executors.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("byte_len", LongType)))

  /** Wrap a text corpus as opaque binary payloads (utf-8 bytes stand in
    * for undecoded blobs — the plumbing is identical for real media).
    */
  def asBinaryPayloads(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("media_type"),
      octet_length(col(textCol)).cast("long").as("byte_len"))

  /** Real container synthesis + real header-walking decode. Synthesis
    * parameters are closed forms of (text length, doc id) so an external
    * oracle can verify the decode roundtrip from the source table alone.
    */
  object Codec {
    private def i32(b: java.nio.ByteBuffer, v: Int): Unit = b.putInt(v)
    private def i16(b: java.nio.ByteBuffer, v: Int): Unit = b.putShort(v.toShort)

    // empty payload sources still synthesize a valid container (the
    // fixtures have none, so the closed-form oracle is unaffected; a real
    // corpus must not kill the stage on a blank row)
    private def nonEmpty(text: Array[Byte]): Array[Byte] =
      if (text.isEmpty) Array[Byte](0) else text

    /** Valid 24-bpp bottom-up BMP: width 4+n%29, height 4+id%13, pixel
      * byte i (row-major, padding excluded) = text byte i mod n.
      */
    def synthBmp(text0: Array[Byte], docId: Long): Array[Byte] = {
      val text = nonEmpty(text0)
      val n = text.length
      val w = 4 + n % 29
      val h = (4 + docId % 13).toInt
      val stride = (w * 3 + 3) / 4 * 4
      val size = 54 + h * stride
      val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
      i32(buf, size); i32(buf, 0); i32(buf, 54) // file size, reserved, pixel offset
      i32(buf, 40); i32(buf, w); i32(buf, h)    // BITMAPINFOHEADER, dims
      i16(buf, 1); i16(buf, 24)                 // planes, bpp
      i32(buf, 0); i32(buf, h * stride)         // BI_RGB, image size
      i32(buf, 2835); i32(buf, 2835); i32(buf, 0); i32(buf, 0) // ppm, palette
      var r = 0
      while (r < h) {
        var x = 0
        while (x < stride) {
          buf.put(if (x < w * 3) text((r * w * 3 + x) % n) else 0.toByte)
          x += 1
        }
        r += 1
      }
      buf.array()
    }

    /** Valid mono 16-bit PCM WAV: rate 8000+(id%5)*1000, 50+n%200 samples,
      * sample i = (text byte i mod n − 64) · 256.
      */
    def synthWav(text0: Array[Byte], docId: Long): Array[Byte] = {
      val text = nonEmpty(text0)
      val n = text.length
      val rate = (8000 + (docId % 5) * 1000).toInt
      val ns = 50 + n % 200
      val size = 44 + ns * 2
      val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes); i32(buf, size - 8); buf.put("WAVE".getBytes)
      buf.put("fmt ".getBytes); i32(buf, 16)
      i16(buf, 1); i16(buf, 1)                  // PCM, mono
      i32(buf, rate); i32(buf, rate * 2)        // sample rate, byte rate
      i16(buf, 2); i16(buf, 16)                 // block align, bits/sample
      buf.put("data".getBytes); i32(buf, ns * 2)
      var i = 0
      while (i < ns) {
        i16(buf, ((text(i % n) & 0xFF) - 64) * 256)
        i += 1
      }
      buf.array()
    }

    final case class Decoded(width: Option[Int], height: Option[Int],
                             sampleRate: Option[Int], nSamples: Option[Long],
                             f0: Option[Double], features: Array[Float])

    private val failed = Decoded(None, None, None, None, None, Array.empty)

    /** Parse a BMP from its actual bytes: magic, pixel-array offset, dims
      * and bpp from the info header, stride-aware row walk; f0 = mean
      * pixel byte (padding excluded).
      */
    def decodeBmp(bytes: Array[Byte]): Decoded = {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return failed
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val h = buf.getInt(22)
      val bpp = buf.getShort(28).toInt
      // dimension sanity bounds also rule out int overflow in the stride
      // and pixel-count arithmetic below (a crafted huge width would
      // otherwise wrap negative and slip past the byte-range check)
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) || bpp != 24) return failed
      if (offset < 0) return failed
      val strideL = (w.toLong * 3 + 3) / 4 * 4
      if (offset.toLong + h.toLong * strideL > bytes.length) return failed
      val stride = strideL.toInt // bounded by bytes.length after the check
      var sum = 0L
      var r = 0
      while (r < h) {
        var x = 0
        while (x < w * 3) {
          sum += (bytes(offset + r * stride + x) & 0xFF)
          x += 1
        }
        r += 1
      }
      val count = w.toLong * 3 * h
      val mean = sum.toDouble / count
      Decoded(Some(w), Some(h), None, None, Some(mean),
        Array((mean / 255.0).toFloat, w / 64.0f, h / 64.0f, 1.0f))
    }

    /** Nearest-neighbor resize of a 24-bpp BMP to (newW, newH) — REAL
      * pixel math on the real container: parse with the same
      * header/bounds checks as [[decodeBmp]], sample source pixels at
      * floor-scaled coordinates, and re-emit a valid stride-padded BMP.
      * None for anything decodeBmp would reject (corrupt blobs are data,
      * not task failures).
      */
    def resizeBmp(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
      if (newW <= 0 || newH <= 0 || newW > (1 << 12) || newH > (1 << 12)) return None
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val h = buf.getInt(22)
      val bpp = buf.getShort(28).toInt
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) || bpp != 24) return None
      if (offset < 0) return None
      val srcStrideL = (w.toLong * 3 + 3) / 4 * 4
      if (offset.toLong + h.toLong * srcStrideL > bytes.length) return None
      val srcStride = srcStrideL.toInt
      val dstStride = (newW * 3 + 3) / 4 * 4
      val size = 54 + newH * dstStride
      val out = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte)
      i32(out, size); i32(out, 0); i32(out, 54)
      i32(out, 40); i32(out, newW); i32(out, newH)
      i16(out, 1); i16(out, 24)
      i32(out, 0); i32(out, newH * dstStride)
      i32(out, 2835); i32(out, 2835); i32(out, 0); i32(out, 0)
      var r = 0
      while (r < newH) {
        val sr = (r.toLong * h / newH).toInt // floor-scaled source row
        var c = 0
        while (c < newW) {
          val sc = (c.toLong * w / newW).toInt
          val src = offset + sr * srcStride + sc * 3
          out.put(bytes(src)).put(bytes(src + 1)).put(bytes(src + 2))
          c += 1
        }
        var pad = newW * 3
        while (pad < dstStride) { out.put(0.toByte); pad += 1 }
        r += 1
      }
      Some(out.array())
    }

    /** RIFF chunk walk shared by [[decodeWav]] and [[audioFeaturesOf]]:
      * (sample rate, decoded 16-bit samples), or None for anything a
      * corrupt blob can do to the container (bad magic, negative/huge
      * chunk lengths, non-16-bit PCM, truncated data).
      */
    private def wavSamples(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
      if (bytes.length < 44) return None
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos = 12
      var rate = -1
      var bits = -1
      var dataOff = -1
      var dataLen = -1
      while (pos + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
        val id = tag(pos)
        val len = buf.getInt(pos + 4)
        // a corrupt negative/huge chunk length must not loop forever,
        // walk backwards, or overflow the cursor — bail out
        if (len < 0 || len > bytes.length - pos - 8) return None
        if (id == "fmt " && len >= 16) {
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22).toInt
        } else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1) // RIFF chunks are 2-byte aligned
      }
      if (rate <= 0 || bits != 16 || dataOff < 0 ||
          dataOff.toLong + dataLen.toLong > bytes.length)
        return None
      val ns = dataLen / 2
      val samples = new Array[Int](ns)
      var i = 0
      while (i < ns) { samples(i) = buf.getShort(dataOff + i * 2).toInt; i += 1 }
      Some((rate, samples))
    }

    /** Parse a WAV by walking RIFF chunks to `fmt ` and `data`; f0 = mean
      * absolute sample amplitude.
      */
    def decodeWav(bytes: Array[Byte]): Decoded = wavSamples(bytes) match {
      case None => failed
      case Some((rate, samples)) =>
        val ns = samples.length
        var sum = 0L
        var i = 0
        while (i < ns) { sum += math.abs(samples(i)); i += 1 }
        val mean = if (ns == 0) 0.0 else sum.toDouble / ns
        Decoded(None, None, Some(rate), Some(ns.toLong), Some(mean),
          Array((mean / 32768.0).toFloat, rate / 16000.0f, ns / 256.0f, 0.5f))
    }

    /** The audio SCREENING statistics a training-data pipeline filters
      * on, computed from the decoded samples:
      *
      *   - `rms`: root-mean-square amplitude, normalized to [0, 1] by
      *     the 16-bit full scale (the sum of squares is an exact long —
      *     s² ≤ 2³⁰ and ns·2³⁰ fits — so the value is bit-deterministic
      *     and SQL-replayable).
      *   - `nZeroCross`: count of strict sign changes between adjacent
      *     samples (zeros neither cross nor reset) — an exact integer;
      *     high ZCR at low RMS is the classic noise signature.
      *   - `centroidHz`: spectral centroid Σ f_k·|X_k| / Σ |X_k| over
      *     the positive-frequency bins of a direct DFT (k = 1 .. n/2;
      *     DC excluded — it is offset, not pitch), computed over the
      *     first `min(ns, dftWindow)` samples: the direct transform is
      *     O(n²), so an uncapped clip (a minute at 16 kHz is ~10¹²
      *     multiply-adds) would turn one hot row into a task-killer —
      *     the cap bounds per-row work at dftWindow²/2 regardless of
      *     payload size (screening wants the spectral SHAPE, which a
      *     fixed prefix window carries; frame-level analysis is the
      *     caller's loop over [[sampleFrames]]). Pure-JVM double trig,
      *     no FFT dependency. Fixed-point funnel for cross-engine
      *     exactness
      *     (the engine's decimal-funnel discipline): each magnitude
      *     rounds to an integer, each frequency-weighted term rounds to
      *     an integer, and the centroid is a ratio of two exact integer
      *     sums — the only doubles that cross the engine boundary are
      *     the DFT magnitudes themselves, whose ~1e-8 trig/summation
      *     variance faces a 0.5 rounding boundary, so the SQL replay is
      *     bit-deterministic.
      *   - `isSilence`: rms < silenceRms (default 0.001 of full scale).
      *   - `isClipped`: the fraction of samples at ≥ 99% of full scale
      *     exceeds clipFrac (default 1%) — the saturation gate.
      *
      * None for anything [[wavSamples]] rejects — corrupt blobs are
      * data, not task failures.
      */
    final case class AudioFeatures(sampleRate: Int, nSamples: Long,
                                   rms: Double, nZeroCross: Long,
                                   centroidHz: Double, isSilence: Boolean,
                                   isClipped: Boolean)

    def audioFeaturesOf(bytes: Array[Byte], silenceRms: Double = 0.001,
                        clipFrac: Double = 0.01,
                        dftWindow: Int = 4096): Option[AudioFeatures] =
      wavSamples(bytes).map { case (rate, s) =>
        val ns = s.length
        var sumSq = 0L
        var zc = 0L
        var clipped = 0L
        var i = 0
        while (i < ns) {
          val v = s(i)
          sumSq += v.toLong * v
          if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
          if (math.abs(v) >= 32440) clipped += 1 // ceil(0.99 * 32767)
          i += 1
        }
        val rms = if (ns == 0) 0.0 else math.sqrt(sumSq.toDouble / ns) / 32768.0
        // direct DFT magnitudes over positive frequencies of the capped
        // window (see scaladoc — per-row work bounded at dftWindow²/2),
        // integer-quantized: num/den are exact longs, so the centroid
        // has no summation-order dependence
        val n = math.min(ns, dftWindow)
        var num = 0L
        var den = 0L
        var k = 1
        while (k <= n / 2) {
          var re = 0.0
          var im = 0.0
          var j = 0
          while (j < n) {
            val ang = 2.0 * math.Pi * k * j / n
            re += s(j) * math.cos(ang)
            im -= s(j) * math.sin(ang)
            j += 1
          }
          val magInt = math.floor(math.sqrt(re * re + im * im) + 0.5).toLong
          num += math.floor(k.toDouble * rate / n * magInt + 0.5).toLong
          den += magInt
          k += 1
        }
        val centroid = if (den == 0L) 0.0 else num.toDouble / den
        AudioFeatures(rate, ns.toLong, rms, zc, centroid,
          rms < silenceRms,
          ns > 0 && clipped.toDouble / ns >= clipFrac)
      }

    /** Deterministic PNG/JPEG synthesis via the JDK's ImageIO (offline,
      * no new dependency): pixel (x, y) channel c = closed form of
      * (docId, x, y, c), so a spec can replay the expected image without
      * re-encoding. PNG is lossless — decode-back is exact; JPEG is
      * lossy — specs compare within a tolerance.
      */
    def synthImageIO(docId: Long, w: Int, h: Int, format: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((docId + x * 7 + y * 13) % 256).toInt
          val g = ((docId * 3 + x * 5 + y * 11) % 256).toInt
          val b = ((docId * 7 + x * 3 + y * 17) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, out)
      out.toByteArray
    }

    /** Decode a PNG/JPEG through `javax.imageio` (pure-JVM, headless,
      * works offline) and compute the SAME statistics the BMP path
      * reports: f0 = mean channel byte over R,G,B — so a pipeline
      * profiling a mixed BMP/PNG/JPEG corpus gets one comparable metric.
      * Anything ImageIO rejects (corrupt bytes, truncated stream, an
      * unsupported container) → [[failed]], never a task failure.
      */
    def decodeImageIO(bytes: Array[Byte]): Decoded = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null } // corrupt blobs are data
      if (img == null) return failed
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return failed
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
          x += 1
        }
        y += 1
      }
      val mean = sum.toDouble / (w.toLong * 3 * h)
      Decoded(Some(w), Some(h), None, None, Some(mean),
        Array((mean / 255.0).toFloat, w / 64.0f, h / 64.0f, 1.0f))
    }

    /** Nearest-neighbor resize of a PNG/JPEG with EXACTLY the BMP path's
      * sampling rule — out(r, c) = src(⌊r·h/newH⌋, ⌊c·w/newW⌋), explicit
      * pixel loops rather than Graphics2D interpolation so the resize is
      * bit-deterministic across JVMs — re-encoded in the SAME container
      * (`format` = "png" | "jpg"). None for anything ImageIO rejects.
      */
    def resizeImageIO(bytes: Array[Byte], newW: Int, newH: Int,
                      format: String): Option[Array[Byte]] = {
      if (newW <= 0 || newH <= 0 || newW > (1 << 12) || newH > (1 << 12)) return None
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
      val out = new java.awt.image.BufferedImage(
        newW, newH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var r = 0
      while (r < newH) {
        val sr = (r.toLong * h / newH).toInt
        var c = 0
        while (c < newW) {
          out.setRGB(c, r, img.getRGB((c.toLong * w / newW).toInt, sr) & 0xFFFFFF)
          c += 1
        }
        r += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      if (!javax.imageio.ImageIO.write(out, format, bos)) None
      else Some(bos.toByteArray)
    }

    /** Valid YUV4MPEG2 (Y4M) clip — the plain-header video container
      * (mplayer/ffmpeg-compatible): `YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1
      * C420\n`, then per frame `FRAME\n` + planar 4:2:0 payload. Even
      * dims w = 4 + 2·(n mod 4), h = 4 + 2·(id mod 3); 3 + n mod 5
      * frames; luma byte j of frame f = text byte (f·w·h + j) mod n,
      * chroma planes constant 128 — closed forms an oracle replays
      * from the source text alone.
      */
    def synthY4m(text0: Array[Byte], docId: Long): Array[Byte] = {
      val text = nonEmpty(text0)
      val n = text.length
      val w = 4 + 2 * (n % 4)
      val h = (4 + 2 * (docId % 3)).toInt
      val nf = 3 + n % 5
      val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
      val frameHdr = "FRAME\n".getBytes("US-ASCII")
      val ySize = w * h
      val cSize = ySize / 4
      val out = java.nio.ByteBuffer.allocate(
        header.length + nf * (frameHdr.length + ySize + 2 * cSize))
      out.put(header)
      var f = 0
      while (f < nf) {
        out.put(frameHdr)
        var j = 0
        while (j < ySize) { out.put(text((f * ySize + j) % n)); j += 1 }
        var c = 0
        while (c < 2 * cSize) { out.put(128.toByte); c += 1 }
        f += 1
      }
      out.array()
    }

    /** Parse a Y4M clip by walking the real header and frame markers:
      * (width, height, fps numerator, fps denominator, per-frame mean
      * luma). Only C420 (the synthesized and overwhelmingly common
      * layout) is decoded; anything malformed — bad magic, odd/missing
      * dims, a truncated frame, a corrupt FRAME marker — returns None
      * (corrupt blobs are data, not task failures).
      */
    def decodeY4m(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Array[Double])] = {
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 9) return None
      val header = new String(bytes, 0, nl, "US-ASCII")
      val parts = header.split(" ")
      if (parts.isEmpty || parts(0) != "YUV4MPEG2") return None
      var (w, h, fn, fd) = (-1, -1, -1, -1)
      var c420 = true
      parts.drop(1).foreach { p =>
        try p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'F' =>
            val r = p.substring(1).split(":")
            fn = r(0).toInt; fd = r(1).toInt
          case 'C' => c420 = p.substring(1).startsWith("420")
          case _ => ()
        } catch { case _: Exception => return None }
      }
      if (w <= 0 || h <= 0 || w % 2 != 0 || h % 2 != 0 || fn <= 0 || fd <= 0 ||
          w > (1 << 15) || h > (1 << 15) || !c420) return None
      val ySize = w * h
      val frameSize = ySize + ySize / 2
      val lumas = Array.newBuilder[Double]
      var pos = nl + 1
      while (pos < bytes.length) {
        // FRAME marker, optional params, newline
        if (pos + 6 > bytes.length ||
            new String(bytes, pos, 5, "US-ASCII") != "FRAME") return None
        val fnl = {
          var i = pos + 5
          while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
          i
        }
        if (fnl >= bytes.length || fnl + 1 + frameSize > bytes.length) return None
        var sum = 0L
        var j = 0
        while (j < ySize) { sum += (bytes(fnl + 1 + j) & 0xFF); j += 1 }
        lumas += sum.toDouble / ySize
        pos = fnl + 1 + frameSize
      }
      Some((w, h, fn, fd, lumas.result()))
    }

    /** Nearest-neighbor gw×gh luma grid of a 24-bpp BMP, in DISPLAY
      * orientation (BMPs store rows bottom-up; grid row gy samples file
      * row h−1−⌊gy·h/gh⌋, so a BMP and a top-down decode of the same
      * picture grid identically). Cell value = integer ITU-R 601 luma
      * ×1000: 299·R + 587·G + 114·B (bytes are BGR in the file). Same
      * header/bounds discipline as [[decodeBmp]]; None for anything it
      * would reject.
      *
      * The floor-scaled NN sampling composes with [[resizeBmp]]'s: an
      * exact k× NN upscale samples back to the SAME source pixels
      * (⌊⌊k·x⌋/k⌋ = ⌊x⌋), so a scaled copy grids — and therefore
      * dHashes — identically to its original (MultimodalSpec pins it).
      */
    def lumaGridBmp(bytes: Array[Byte], gw: Int, gh: Int): Option[Array[Int]] = {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val h = buf.getInt(22)
      val bpp = buf.getShort(28).toInt
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) || bpp != 24) return None
      if (offset < 0) return None
      val strideL = (w.toLong * 3 + 3) / 4 * 4
      if (offset.toLong + h.toLong * strideL > bytes.length) return None
      val stride = strideL.toInt
      val grid = new Array[Int](gw * gh)
      var gy = 0
      while (gy < gh) {
        val sr = h - 1 - (gy.toLong * h / gh).toInt // display-order row
        var gx = 0
        while (gx < gw) {
          val sc = (gx.toLong * w / gw).toInt
          val p = offset + sr * stride + sc * 3
          grid(gy * gw + gx) = 299 * (bytes(p + 2) & 0xFF) +
            587 * (bytes(p + 1) & 0xFF) + 114 * (bytes(p) & 0xFF)
          gx += 1
        }
        gy += 1
      }
      Some(grid)
    }

    /** [[lumaGridBmp]] for PNG/JPEG via ImageIO (already top-down). */
    def lumaGridImageIO(bytes: Array[Byte], gw: Int, gh: Int): Option[Array[Int]] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val grid = new Array[Int](gw * gh)
          var gy = 0
          while (gy < gh) {
            val sr = (gy.toLong * h / gh).toInt
            var gx = 0
            while (gx < gw) {
              val sc = (gx.toLong * w / gw).toInt
              val v = img.getRGB(sc, sr)
              grid(gy * gw + gx) = 299 * ((v >> 16) & 0xFF) +
                587 * ((v >> 8) & 0xFF) + 114 * (v & 0xFF)
              gx += 1
            }
            gy += 1
          }
          Some(grid)
        }
      } catch { case _: Exception => None }

    /** Per-frame luma grids of a Y4M clip (frames are top-down; the Y
      * plane IS the luma, scaled ×1000 to share [[lumaGridBmp]]'s units
      * so image and video signatures live in one distance space).
      */
    def lumaGridsY4m(bytes: Array[Byte], gw: Int, gh: Int): Option[Array[Array[Int]]] = {
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 9) return None
      val header = new String(bytes, 0, nl, "US-ASCII")
      val parts = header.split(" ")
      if (parts.isEmpty || parts(0) != "YUV4MPEG2") return None
      var (w, h) = (-1, -1)
      var c420 = true
      parts.drop(1).foreach { p =>
        try p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'C' => c420 = p.substring(1).startsWith("420")
          case _ => ()
        } catch { case _: Exception => return None }
      }
      if (w <= 0 || h <= 0 || w % 2 != 0 || h % 2 != 0 ||
          w > (1 << 15) || h > (1 << 15) || !c420) return None
      val ySize = w * h
      val frameSize = ySize + ySize / 2
      val grids = Array.newBuilder[Array[Int]]
      var pos = nl + 1
      while (pos < bytes.length) {
        if (pos + 6 > bytes.length ||
            new String(bytes, pos, 5, "US-ASCII") != "FRAME") return None
        val fnl = {
          var i = pos + 5
          while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
          i
        }
        if (fnl >= bytes.length || fnl + 1 + frameSize > bytes.length) return None
        val grid = new Array[Int](gw * gh)
        var gy = 0
        while (gy < gh) {
          val sr = (gy.toLong * h / gh).toInt
          var gx = 0
          while (gx < gw) {
            val sc = (gx.toLong * w / gw).toInt
            grid(gy * gw + gx) = 1000 * (bytes(fnl + 1 + sr * w + sc) & 0xFF)
            gx += 1
          }
          gy += 1
        }
        grids += grid
        pos = fnl + 1 + frameSize
      }
      Some(grids.result())
    }

    /** Loudness-envelope grid of a WAV — the audio member of the
      * perceptual-signature family (images/video get luma grids): the
      * sample stream splits into gw·gh floor-scaled windows, window
      * energy = Σ|sample| (exact integer), and the grid is normalized
      * to the images' 0..255000 unit scale by `E_i · 255000 / max(E)`
      * (integer floor). Gradient SIGNS of the envelope — which is what
      * [[dhashOf]] extracts — survive gain changes (positive scaling
      * preserves ordering) and the normalization makes grid-L1
      * distances comparable across modalities. None for anything the
      * RIFF walk rejects.
      */
    def envelopeGridWav(bytes: Array[Byte], gw: Int, gh: Int): Option[Array[Int]] =
      wavSamples(bytes).map { case (_, samples) =>
        val cells = gw * gh
        val ns = samples.length
        val e = new Array[Long](cells)
        var i = 0
        while (i < cells) {
          val lo = (i.toLong * ns / cells).toInt
          val hi = ((i + 1).toLong * ns / cells).toInt
          var s = 0L
          var j = lo
          while (j < hi) { s += math.abs(samples(j).toLong); j += 1 }
          e(i) = s
          i += 1
        }
        var maxE = 0L
        i = 0
        while (i < cells) { if (e(i) > maxE) maxE = e(i); i += 1 }
        val grid = new Array[Int](cells)
        if (maxE > 0) {
          i = 0
          while (i < cells) { grid(i) = (e(i) * 255000L / maxE).toInt; i += 1 }
        }
        grid
      }

    /** Difference hash over a luma grid: bit gy·(gw−1)+gx is set iff
      * cell (gx+1, gy) > cell (gx, gy) — the classic dHash (gw=9, gh=8
      * gives the canonical 64-bit signature). Gradient signs survive
      * brightness/contrast shifts and lossy recompression, which is why
      * every image training corpus perceptual-dedups on exactly this.
      */
    def dhashOf(grid: Array[Int], gw: Int, gh: Int): Long = {
      var sig = 0L
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw - 1) {
          if (grid(gy * gw + gx + 1) > grid(gy * gw + gx))
            sig |= 1L << (gy * (gw - 1) + gx)
          gx += 1
        }
        gy += 1
      }
      sig
    }

    def decode(mediaType: String, bytes: Array[Byte]): Decoded = mediaType match {
      case "image/bmp" => decodeBmp(bytes)
      case "image/png" | "image/jpeg" => decodeImageIO(bytes)
      case "audio/wav" => decodeWav(bytes)
      case "video/y4m" => decodeY4m(bytes) match {
        // video reports its geometry, frame count (as n_samples — the
        // time-axis cardinality) and mean luma across frames as f0, so
        // the generic decode/screen paths treat clips as first-class
        // decodable media rather than rejecting them as corrupt
        case Some((w, h, fn, _, lumas)) =>
          val f0 = if (lumas.isEmpty) 0.0 else lumas.sum / lumas.length
          Decoded(Some(w), Some(h), None, Some(lumas.length.toLong), Some(f0),
            Array((f0 / 255.0).toFloat, w / 64.0f, h / 64.0f, fn / 30.0f))
        case None => failed
      }
      case _ => failed
    }
  }

  /** Synthesize real media containers from the corpus: even ids become
    * BMP images, odd ids PCM WAV clips (see [[Codec]]). Partition-parallel
    * `mapPartitions` — synthesis is the per-row-expensive stage here, the
    * stand-in for transcode/resize in a real pipeline.
    */
  def synthesizeMedia(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = graft.Tables.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // null-safe: a blank row synthesizes a minimal container rather
          // than NPE-ing the task (see Codec.nonEmpty)
          val text = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
          val (payload, mediaType) =
            if (id % 2 == 0) (Codec.synthBmp(text, id), "image/bmp")
            else (Codec.synthWav(text, id), "audio/wav")
          Row(id, payload, mediaType, payload.length.toLong)
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("f0", DoubleType),
    StructField("features", ArrayType(FloatType))))

  /** Partition-parallel decode/feature-extract over the payload column.
    * Streams rows (no driver collect); each partition is an independent
    * task. Malformed payloads yield null fields, not task failures — a
    * 100 TB corpus always contains corrupt blobs.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = graft.Tables.fanOut(
        media.select("doc_id", "payload", "media_type", "byte_len")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = Codec.decode(r.getAs[String]("media_type"), r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
            r.getAs[Long]("byte_len"),
            d.width.map(Integer.valueOf).orNull,
            d.height.map(Integer.valueOf).orNull,
            d.sampleRate.map(Integer.valueOf).orNull,
            d.nSamples.map(java.lang.Long.valueOf).orNull,
            d.f0.map(java.lang.Double.valueOf).orNull,
            d.features)
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Synthesize a Y4M video clip per document (the [[synthesizeMedia]]
    * shape for the video modality) — partition-parallel mapPartitions.
    */
  def synthesizeVideos(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = graft.Tables.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val text = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
          val payload = Codec.synthY4m(text, r.getLong(0))
          Row(r.getLong(0), payload, "video/y4m", payload.length.toLong)
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  val videoFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("fps_num", IntegerType),
    StructField("fps_den", IntegerType),
    StructField("n_frames", LongType),
    StructField("frame_idx", LongType),
    StructField("luma", DoubleType)))

  /** Partition-parallel Y4M frame walk: one row per DECODED frame with
    * its mean luma (the screening statistic for black/flat-frame gates),
    * plus the clip geometry on every row. Corrupt or non-video payloads
    * emit one row with null frame columns — corrupt blobs are data. The
    * per-frame explode happens executor-side inside the codec walk;
    * nothing collects.
    */
  def videoFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = graft.Tables.fanOut(
        media.select("doc_id", "payload", "media_type")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("doc_id")
          val parsed =
            if (r.getAs[String]("media_type") != "video/y4m") None
            else Codec.decodeY4m(r.getAs[Array[Byte]]("payload"))
          parsed match {
            case Some((w, h, fn, fd, lumas)) =>
              lumas.iterator.zipWithIndex.map { case (l, i) =>
                Row(id, w, h, fn, fd, lumas.length.toLong, i.toLong, l)
              }
            case None =>
              Iterator.single(Row(id, null, null, null, null, null, null, null))
          }
        }
      }
    spark.createDataFrame(rdd, videoFrameSchema)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("rms", DoubleType),
    StructField("n_zero_cross", LongType),
    StructField("centroid_hz", DoubleType),
    StructField("is_silence", BooleanType),
    StructField("is_clipped", BooleanType)))

  /** Partition-parallel audio feature extraction over WAV payloads —
    * the screening metrics (silence / clipping / spectral shape) an
    * audio corpus is actually filtered on, next to [[decodeFeatures]]'s
    * container metadata. One row per input row: non-audio media types
    * and corrupt payloads yield null feature columns, never task
    * failures. Streams rows via mapPartitions (no driver collect) —
    * the per-row DFT is the expensive stage, exactly the shape that
    * fans across 1000 executors.
    */
  def audioFeatures(media: DataFrame, silenceRms: Double = 0.001,
                    clipFrac: Double = 0.01, dftWindow: Int = 4096): DataFrame = {
    val spark = media.sparkSession
    val rdd = graft.Tables.fanOut(
        media.select("doc_id", "payload", "media_type")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val feats =
            if (r.getAs[String]("media_type") != "audio/wav") None
            else Codec.audioFeaturesOf(r.getAs[Array[Byte]]("payload"),
              silenceRms, clipFrac, dftWindow)
          feats match {
            case Some(f) =>
              Row(r.getAs[Long]("doc_id"), f.sampleRate, f.nSamples, f.rms,
                f.nZeroCross, f.centroidHz, f.isSilence, f.isClipped)
            case None =>
              Row(r.getAs[Long]("doc_id"), null, null, null, null, null,
                null, null)
          }
        }
      }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  /** Partition-parallel image resize: every image payload (BMP via the
    * hand-rolled parser, PNG/JPEG via ImageIO — same floor-scaled
    * nearest-neighbor sampling rule on all three) is resized to
    * (newW, newH) and re-emitted in its own container — the
    * thumbnail/model-input normalization pass of a multimodal pipeline.
    * Non-image rows pass through untouched (a mixed-modality corpus
    * resizes in place); malformed image payloads come out with a null
    * payload and byte_len 0 — corrupt blobs are data, not task
    * failures. Streams rows, no driver collect.
    */
  def resizeImages(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = graft.Tables.fanOut(
        media.select("doc_id", "payload", "media_type", "byte_len")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val mt = r.getAs[String]("media_type")
          val resized: Option[Option[Array[Byte]]] = mt match {
            case "image/bmp" =>
              Some(Codec.resizeBmp(r.getAs[Array[Byte]]("payload"), newW, newH))
            case "image/png" =>
              Some(Codec.resizeImageIO(r.getAs[Array[Byte]]("payload"), newW, newH, "png"))
            case "image/jpeg" =>
              Some(Codec.resizeImageIO(r.getAs[Array[Byte]]("payload"), newW, newH, "jpg"))
            case _ => None // not an image: pass through untouched
          }
          resized match {
            case None =>
              Row(r.getAs[Long]("doc_id"), r.getAs[Array[Byte]]("payload"), mt,
                r.getAs[Long]("byte_len"))
            case Some(Some(bytes)) =>
              Row(r.getAs[Long]("doc_id"), bytes, mt, bytes.length.toLong)
            case Some(None) =>
              Row(r.getAs[Long]("doc_id"), null, mt, 0L)
          }
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Integer-factor nearest-neighbor upscale of every image payload —
    * the per-image twin of [[resizeImages]] (which targets one fixed
    * geometry): each image is re-emitted at (factor·w, factor·h) in its
    * own container. Because the NN sampling rules compose exactly
    * (⌊⌊k·x⌋/k⌋ = ⌊x⌋), an upscaled copy decodes to the same
    * [[Codec.lumaGridBmp]] grid as its source — the closed-form
    * duplicate generator the perceptual-dedup oracle replays.
    * Non-images pass through; corrupt payloads — AND images whose
    * scaled geometry exceeds the resize paths' 4096-pixel cap (a
    * deliberate bound: an upscale product past that is a memory bomb,
    * not a thumbnail) — emit a null payload rather than failing the
    * task or silently passing the un-upscaled original off as a copy.
    * Streams rows, no driver collect.
    */
  def upscaleImages(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1 && factor <= 8, "factor in [1, 8]")
    val spark = media.sparkSession
    val rdd = graft.Tables.fanOut(
        media.select("doc_id", "payload", "media_type", "byte_len")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val mt = r.getAs[String]("media_type")
          val bytes = r.getAs[Array[Byte]]("payload")
          def dims(b: Array[Byte]): Option[(Int, Int)] = mt match {
            case "image/bmp" =>
              if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') None
              else {
                val buf = java.nio.ByteBuffer.wrap(b)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                val (w, h) = (buf.getInt(18), buf.getInt(22))
                if (w <= 0 || h <= 0) None else Some((w, h))
              }
            case "image/png" | "image/jpeg" =>
              // header-only dims via ImageReader — a full ImageIO.read
              // here would decode every image TWICE (dims + resize),
              // doubling the dominant cost of the whole operator. The
              // stream MUST be closed explicitly: with ImageIO's default
              // use-cache it is file-backed, and leaking one temp file +
              // fd per row kills an executor millions of images later
              try {
                val iis = javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(b))
                try {
                  val readers = javax.imageio.ImageIO.getImageReaders(iis)
                  if (!readers.hasNext) None
                  else {
                    val rd = readers.next()
                    try { rd.setInput(iis); Some((rd.getWidth(0), rd.getHeight(0))) }
                    finally rd.dispose()
                  }
                } finally iis.close()
              } catch { case _: Exception => None }
            case _ => None
          }
          val scaled: Option[Option[Array[Byte]]] = mt match {
            case "image/bmp" =>
              Some(dims(bytes).flatMap { case (w, h) =>
                Codec.resizeBmp(bytes, w * factor, h * factor) })
            case "image/png" =>
              Some(dims(bytes).flatMap { case (w, h) =>
                Codec.resizeImageIO(bytes, w * factor, h * factor, "png") })
            case "image/jpeg" =>
              Some(dims(bytes).flatMap { case (w, h) =>
                Codec.resizeImageIO(bytes, w * factor, h * factor, "jpg") })
            case _ => None // not an image: pass through untouched
          }
          scaled match {
            case None =>
              Row(r.getAs[Long]("doc_id"), bytes, mt, r.getAs[Long]("byte_len"))
            case Some(Some(b)) => Row(r.getAs[Long]("doc_id"), b, mt, b.length.toLong)
            case Some(None) => Row(r.getAs[Long]("doc_id"), null, mt, 0L)
          }
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  val visualHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("grid", ArrayType(IntegerType, containsNull = false)),
    StructField("dhash", LongType)))

  /** Perceptual signature extraction — the decode→downscale→dHash stage
    * every media training corpus runs BEFORE anything else: one row per
    * image (frame_idx 0), one per sampled video frame (every
    * `frameStride`-th), and one per audio clip (the normalized loudness
    * envelope plays the luma grid's role — [[Codec.envelopeGridWav]]),
    * each carrying the gw×gh grid and its 64-bit dHash
    * ([[Codec.dhashOf]]). Non-media types and corrupt payloads emit one
    * row with null grid/dhash — corrupt blobs are data, not task
    * failures. Partition-parallel mapPartitions (the codec-work shape);
    * nothing collects. Feed the result to [[Dedup.dhashPairs]] for
    * banded Hamming near-dup candidates.
    */
  def visualHashes(media: DataFrame, gw: Int = 9, gh: Int = 8,
                   frameStride: Int = 1): DataFrame = {
    require(gw >= 2 && gh >= 1 && (gw - 1) * gh <= 64,
      "dHash needs 2 <= gw, (gw-1)*gh <= 64 bits")
    require(frameStride >= 1, "frameStride >= 1")
    val spark = media.sparkSession
    val nullRow = (id: Long) => Row(id, null, null, null)
    val rdd = graft.Tables.fanOut(
        media.select("doc_id", "payload", "media_type")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("doc_id")
          val bytes = r.getAs[Array[Byte]]("payload")
          r.getAs[String]("media_type") match {
            case _ if bytes == null => Iterator.single(nullRow(id))
            case "image/bmp" =>
              Iterator.single(Codec.lumaGridBmp(bytes, gw, gh)
                .map(g => Row(id, 0L, g.toSeq, Codec.dhashOf(g, gw, gh)))
                .getOrElse(nullRow(id)))
            case "image/png" | "image/jpeg" =>
              Iterator.single(Codec.lumaGridImageIO(bytes, gw, gh)
                .map(g => Row(id, 0L, g.toSeq, Codec.dhashOf(g, gw, gh)))
                .getOrElse(nullRow(id)))
            case "audio/wav" =>
              Iterator.single(Codec.envelopeGridWav(bytes, gw, gh)
                .map(g => Row(id, 0L, g.toSeq, Codec.dhashOf(g, gw, gh)))
                .getOrElse(nullRow(id)))
            case "video/y4m" =>
              Codec.lumaGridsY4m(bytes, gw, gh) match {
                case Some(grids) if grids.nonEmpty =>
                  grids.iterator.zipWithIndex
                    .filter { case (_, i) => i % frameStride == 0 }
                    .map { case (g, i) =>
                      Row(id, i.toLong, g.toSeq, Codec.dhashOf(g, gw, gh)) }
                case _ => Iterator.single(nullRow(id))
              }
            case _ => Iterator.single(nullRow(id))
          }
        }
      }
    spark.createDataFrame(rdd, visualHashSchema)
  }

  /** Deterministic frame sampling for time-media: pick every `stride`-th
    * chunk of the payload as a pseudo-frame (the real pipeline samples
    * decoded frames; the chunking/explode shape is the same).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest(lit(1L), (col("byte_len") / (frameBytes.toLong * stride)).cast("long")))
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1)))
      .select(
        col("doc_id"), col("frame_idx"),
        col("payload").substr((col("frame_idx") * frameBytes * stride + 1).cast("int"),
          lit(frameBytes)).as("frame_bytes"))
}
