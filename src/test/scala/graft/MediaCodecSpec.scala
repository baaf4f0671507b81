package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.sources.MediaContainers.{Bmp, Wav}

/** Golden-byte and round-trip fixtures for the pure-JVM BMP/WAV
  * containers behind the multimodal decode path: the writer emits the
  * documented header layout byte-for-byte, the parser recovers exactly
  * what was written, and corrupt bytes degrade to None (decode →
  * frames=0), never an exception. */
class MediaCodecSpec extends AnyFunSuite {

  private val payload = Array.tabulate(64)(i => (i * 7 + 3).toByte)

  test("BMP golden header: 2x2 24bpp is 70 bytes with documented field layout") {
    val b = Bmp.write(2, 2, payload)
    // stride for w=2: 3*2=6 padded to 8; 54 + 8*2 = 70
    assert(b.length == 70)
    assert(b(0) == 'B' && b(1) == 'M')
    assert((b(2) & 0xff) == 70 && b(3) == 0)        // u32 file size @2
    assert((b(10) & 0xff) == 54)                    // pixel offset @10
    assert((b(14) & 0xff) == 40)                    // info header size @14
    assert((b(18) & 0xff) == 2)                     // width @18
    assert((b(22) & 0xff) == 2)                     // height @22
    assert((b(26) & 0xff) == 1)                     // planes @26
    assert((b(28) & 0xff) == 24)                    // bpp @28
    assert(Bmp.parse(b).contains(Bmp.Header(2, 2, 70)))
  }

  test("BMP write→parse round-trips across a dim grid incl. stride padding") {
    for (w <- Seq(1, 2, 3, 4, 5, 31, 63); h <- Seq(1, 2, 44, 47)) {
      val b = Bmp.write(w, h, payload)
      assert(b.length == Bmp.fileSize(w, h))
      assert(Bmp.parse(b).contains(Bmp.Header(w, h, b.length)),
        s"roundtrip failed at ${w}x$h")
    }
  }

  test("BMP parser rejects corrupt containers instead of throwing") {
    val good = Bmp.write(4, 4, payload)
    assert(Bmp.parse(Array[Byte]()).isEmpty)
    assert(Bmp.parse("not a bitmap at all......................................"
      .getBytes("US-ASCII")).isEmpty)
    assert(Bmp.parse(good.take(20)).isEmpty, "truncated header must not parse")
    val badSize = good.clone(); badSize(2) = (badSize(2) + 1).toByte
    assert(Bmp.parse(badSize).isEmpty, "file size not matching dims must not parse")
  }

  test("concatenated BMPs parse as frames; trailing garbage kills the parse") {
    val f = Bmp.write(4, 4, payload)
    val three = f ++ f ++ f
    assert(Bmp.parseConcat(three).exists(_.length == 3))
    assert(Bmp.parseConcat(three ++ Array[Byte](1, 2, 3)).isEmpty)
    assert(Bmp.parseConcat(Array[Byte]()).isEmpty)
  }

  test("WAV golden header: 8kHz mono 16-bit, duration from sample count") {
    val b = Wav.write(8000, Array.fill(16000)(0x40.toByte))
    assert(b.length == 44 + 32000)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    val h = Wav.parse(b)
    assert(h.contains(Wav.Header(8000, 1, 16, 16000)))
    assert(h.get.durationMs == 2000L) // 16000 samples / 8000 Hz = 2 s
  }

  test("WAV chunk walker tolerates foreign chunks, rejects truncation and non-PCM") {
    val b = Wav.write(8000, payload)
    // splice a LIST chunk between "WAVE" and "fmt " — a foreign writer's
    // metadata; the chunk walker must skip it
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = b.slice(0, 12) ++ list ++ b.drop(12)
    // fix the RIFF size for the inserted 12 bytes
    val riffLen = (b.length - 8) + list.length
    spliced(4) = riffLen.toByte
    spliced(5) = (riffLen >>> 8).toByte
    assert(Wav.parse(spliced).contains(Wav.Header(8000, 1, 16, payload.length)))
    assert(Wav.parse(b.take(30)).isEmpty, "truncated fmt must not parse")
    val nonPcm = b.clone(); nonPcm(20) = 3 // IEEE-float format tag
    assert(Wav.parse(nonPcm).isEmpty, "non-PCM must not parse")
  }

  test("nearest-neighbor resize samples the documented source pixels") {
    // 4x4 source whose pixel (x, y) carries value (16*y + x) in all 3
    // channels → resize to 2x2 must pick sx = x*4/2, sy = y*4/2
    val stride4 = Bmp.rowStride(4)
    val src = Bmp.write(4, 4, Array.emptyByteArray)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      src(Bmp.HeaderLen + y * stride4 + 3 * x + c) = (16 * y + x).toByte
    val hdr = Bmp.parse(src).get
    val out = Bmp.resizeNearest(src, hdr, 2, 2)
    assert(Bmp.parse(out).contains(Bmp.Header(2, 2, Bmp.fileSize(2, 2))))
    val stride2 = Bmp.rowStride(2)
    def px(x: Int, y: Int): Int = out(Bmp.HeaderLen + y * stride2 + 3 * x) & 0xff
    assert(px(0, 0) == 0)          // source (0, 0)
    assert(px(1, 0) == 2)          // source (2, 0)
    assert(px(0, 1) == 32)         // source (0, 2)
    assert(px(1, 1) == 34)         // source (2, 2)
  }

  test("decode sniffs magic and degrades corrupt bytes to frames=0") {
    import MultimodalOps.{Asset, decode}
    val bmp = decode(Asset(1L, "image", Bmp.write(5, 3, payload)))
    assert(bmp.width == 5 && bmp.height == 3 && bmp.frames == 1
      && bmp.sample_rate == 0 && bmp.duration_ms == 0L)
    val vid = decode(Asset(2L, "video",
      Bmp.write(5, 3, payload) ++ Bmp.write(5, 3, payload)))
    assert(vid.frames == 2 && vid.duration_ms == 80L)
    val wav = decode(Asset(3L, "audio", Wav.write(8000, Array.fill(4000)(1.toByte))))
    assert(wav.sample_rate == 8000 && wav.duration_ms == 500L
      && wav.width == 0 && wav.frames == 1)
    val junk = decode(Asset(4L, "image", Array.fill[Byte](100)(42)))
    assert(junk.frames == 0, "corrupt container must decode to frames=0")
    assert(junk.byte_len == 100)
  }
}
