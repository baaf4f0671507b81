package graft.sources

/** Pure-JVM writers + parsers for two public, trivially-documented
  * media containers: BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp
  * uncompressed) and WAV (RIFF/WAVE, 16-bit mono PCM). No external
  * codec libraries: both formats are fixed-layout little-endian
  * structs, so a few dozen lines of byte arithmetic make the
  * multimodal decode path REAL — the engine writes genuine containers
  * from raw payload bytes and its decoder recovers
  * width/height/frames/duration by parsing the headers back, not by
  * trusting side-channel metadata.
  *
  * Layout references (public format docs):
  *  - BMP: 14-byte file header ("BM", u32 file size, u32 reserved,
  *    u32 pixel-array offset), then a 40-byte BITMAPINFOHEADER
  *    (u32 struct size, i32 width, i32 height, u16 planes, u16 bpp,
  *    u32 compression, u32 image size, ...); 24bpp rows are padded to
  *    4-byte multiples.
  *  - WAV: "RIFF" + u32 riff size + "WAVE", then tagged chunks; the
  *    "fmt " chunk carries u16 format (1 = PCM), u16 channels,
  *    u32 sample rate, u32 byte rate, u16 block align, u16 bits per
  *    sample; the "data" chunk carries the PCM payload.
  */
object MediaContainers {

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  object Bmp {
    val HeaderLen = 54 // 14 (file header) + 40 (BITMAPINFOHEADER)

    /** Padded byte length of one 24bpp pixel row. */
    def rowStride(width: Int): Int = (3 * width + 3) & ~3

    def fileSize(width: Int, height: Int): Int =
      HeaderLen + rowStride(width) * height

    /** A valid 24bpp BMP: pixel bytes are `payload` repeated/truncated
      * to fill the padded pixel array (content doesn't matter to the
      * header contract; determinism does). */
    def write(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dims ${width}x$height")
      val size = fileSize(width, height)
      val out = new Array[Byte](size)
      out(0) = 'B'; out(1) = 'M'
      putLe32(out, 2, size)
      putLe32(out, 10, HeaderLen)          // pixel array offset
      putLe32(out, 14, 40)                 // BITMAPINFOHEADER size
      putLe32(out, 18, width)
      putLe32(out, 22, height)
      putLe16(out, 26, 1)                  // planes
      putLe16(out, 28, 24)                 // bits per pixel
      putLe32(out, 34, size - HeaderLen)   // image size
      if (payload.nonEmpty) {
        var i = HeaderLen
        while (i < size) {
          out(i) = payload((i - HeaderLen) % payload.length)
          i += 1
        }
      }
      out
    }

    /** Parsed header fields of one BMP. */
    final case class Header(width: Int, height: Int, fileSize: Int)

    /** Parse the BMP starting at `off`; None on anything malformed
      * (bad magic, truncated header, non-positive dims, file size not
      * matching the dims — a corrupt container must never decode). */
    def parse(b: Array[Byte], off: Int = 0): Option[Header] = {
      if (off < 0 || b.length - off < HeaderLen) return None
      if (b(off) != 'B' || b(off + 1) != 'M') return None
      val size = le32(b, off + 2)
      val w = le32(b, off + 18)
      val h = le32(b, off + 22)
      val bpp = le16(b, off + 28)
      if (w <= 0 || h <= 0 || bpp != 24) return None
      if (size != fileSize(w, h) || off + size > b.length) return None
      Some(Header(w, h, size))
    }

    /** Nearest-neighbor resample of the BMP at `off` to w×h — a real
      * (if minimal) scaler: reads source pixels through the parsed
      * header's stride, writes a fresh valid container. Caller passes
      * the already-parsed header so corrupt bytes can't reach the
      * pixel loop. */
    def resizeNearest(src: Array[Byte], hdr: Header, w: Int, h: Int,
                      off: Int = 0): Array[Byte] = {
      require(w > 0 && h > 0, s"bad target dims ${w}x$h")
      val sStride = rowStride(hdr.width)
      val oStride = rowStride(w)
      val out = write(w, h, Array.emptyByteArray)
      var y = 0
      while (y < h) {
        val sy = y * hdr.height / h
        var x = 0
        while (x < w) {
          val sx = x * hdr.width / w
          val sOff = off + HeaderLen + sy * sStride + 3 * sx
          val dOff = HeaderLen + y * oStride + 3 * x
          out(dOff) = src(sOff)
          out(dOff + 1) = src(sOff + 1)
          out(dOff + 2) = src(sOff + 2)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Parse a concatenation of BMPs (the engine's video container:
      * one BMP per frame, back to back). Returns per-frame headers;
      * None if any frame fails to parse or bytes trail the last one. */
    def parseConcat(b: Array[Byte]): Option[Vector[Header]] = {
      var off = 0
      val frames = Vector.newBuilder[Header]
      var n = 0
      while (off < b.length) {
        parse(b, off) match {
          case Some(h) => frames += h; off += h.fileSize; n += 1
          case None => return None
        }
      }
      if (n == 0) None else Some(frames.result())
    }
  }

  object Wav {
    val HeaderLen = 44 // RIFF(12) + fmt chunk(24) + data chunk header(8)

    /** A valid 16-bit mono PCM WAV: one sample per payload byte
      * (sample value = (byte - 128) << 8 — full-scale, deterministic). */
    def write(sampleRate: Int, payload: Array[Byte]): Array[Byte] = {
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      val dataLen = 2 * payload.length
      val out = new Array[Byte](HeaderLen + dataLen)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putLe32(out, 4, 36 + dataLen)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putLe32(out, 16, 16)                 // fmt chunk size
      putLe16(out, 20, 1)                  // PCM
      putLe16(out, 22, 1)                  // mono
      putLe32(out, 24, sampleRate)
      putLe32(out, 28, sampleRate * 2)     // byte rate
      putLe16(out, 32, 2)                  // block align
      putLe16(out, 34, 16)                 // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putLe32(out, 40, dataLen)
      var i = 0
      while (i < payload.length) {
        val sample = ((payload(i) & 0xff) - 128) << 8
        putLe16(out, HeaderLen + 2 * i, sample & 0xffff)
        i += 1
      }
      out
    }

    final case class Header(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, nSamples: Int) {
      /** Integer milliseconds (floor) — both engines divide exact
        * integers, so the value is engine-reproducible. */
      def durationMs: Long =
        nSamples.toLong * 1000L / (sampleRate.toLong * channels)
    }

    /** Chunk-walking parser (not fixed offsets): validates RIFF/WAVE,
      * then scans tagged chunks for "fmt " and "data" — tolerant of
      * extra chunks a foreign writer may insert, strict about
      * truncation and non-PCM. */
    def parse(b: Array[Byte]): Option[Header] =
      parseWithData(b).map(_._1)

    /** Like [[parse]] but also returns the byte offset and length of
      * the data chunk's sample bytes, for consumers that read the PCM
      * content itself (e.g. the acoustic-stats query) rather than just
      * the header geometry. */
    def parseWithData(b: Array[Byte]): Option[(Header, Int, Int)] = {
      if (b.length < 12) return None
      if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return None
      if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var dataLen = -1
      var dataOff = -1
      while (off + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
        val tag = new String(b, off, 4, "US-ASCII")
        val len = le32(b, off + 4)
        if (len < 0 || off + 8 + len > b.length) return None
        tag match {
          case "fmt " =>
            if (len < 16) return None
            val format = le16(b, off + 8)
            if (format != 1) return None // PCM only
            fmt = Some((le16(b, off + 10), le32(b, off + 12), le16(b, off + 22)))
          case "data" => dataLen = len; dataOff = off + 8
          case _ => ()
        }
        off += 8 + len + (len & 1) // RIFF chunks are 2-byte aligned
      }
      fmt match {
        case Some((ch, rate, bits))
            if dataLen >= 0 && ch > 0 && rate > 0 && bits > 0 &&
              bits % 8 == 0 =>
          Some((Header(rate, ch, bits, dataLen / (bits / 8)), dataOff, dataLen))
        case _ => None
      }
    }
  }
}
