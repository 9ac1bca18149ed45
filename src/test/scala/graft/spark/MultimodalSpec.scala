package graft.spark

import graft.pipeline.{MediaRow, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Codec correctness without Spark: the encoder emits spec-conformant files
  * (cross-checked against the JDK's own ImageIO / AudioSystem parsers) and
  * the decoder's reported stats match independently computed values. */
class MultimodalSpec extends AnyFunSuite {

  test("BMP codec: encode -> decode parity and ImageIO pixel cross-check") {
    val pix = Array(
      Array((255, 0, 0), (0, 255, 0), (0, 0, 255)),
      Array((10, 20, 30), (200, 100, 50), (0, 0, 0)))
    val bytes = Multimodal.encodeBmp(3, 2, (x, y) => pix(y)(x))
    val f = Multimodal.decode(MediaRow(1L, "image/bmp", bytes))
    assert(f.width === 3 && f.height === 2)
    assert(f.n_bytes === bytes.length.toLong)
    assert(f.sample_rate === 0 && f.duration_ms === 0L)
    // mean luminance vs an independent computation (BT.601 integer approx)
    val lums = for (y <- 0 until 2; x <- 0 until 3) yield {
      val (r, g, b) = pix(y)(x); (77 * r + 150 * g + 29 * b) >> 8
    }
    assert(math.abs(f.mean_level - lums.sum.toDouble / lums.size) < 1e-9)
    assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
    // the JDK's BMP reader sees the same dimensions and exact pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse our BMP")
    assert(img.getWidth === 3 && img.getHeight === 2)
    for (y <- 0 until 2; x <- 0 until 3) {
      val rgb = img.getRGB(x, y)
      val (r, g, b) = pix(y)(x)
      assert(((rgb >> 16) & 0xff) === r, s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) === g, s"G at ($x,$y)")
      assert((rgb & 0xff) === b, s"B at ($x,$y)")
    }
  }

  test("WAV codec: encode -> decode parity and AudioSystem cross-check") {
    // 1 s of a full-scale 440 Hz sine at 8 kHz mono: RMS = 1/sqrt(2)
    val bytes = Multimodal.encodeWav(8000, 8000, 1,
      (f, _) => math.sin(2 * math.Pi * 440 * f / 8000))
    val feat = Multimodal.decode(MediaRow(2L, "audio/wav", bytes))
    assert(feat.sample_rate === 8000 && feat.channels === 1)
    assert(feat.duration_ms === 1000L)
    assert(feat.n_bytes === bytes.length.toLong)
    assert(feat.width === 0 && feat.height === 0)
    assert(math.abs(feat.mean_level - 1 / math.sqrt(2)) < 0.01)
    assert(math.abs(feat.histogram.sum - 1.0) < 1e-9)
    // the JDK's WAV reader agrees on format and frame count
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate === 8000f && fmt.getChannels === 1 &&
      fmt.getSampleSizeInBits === 16)
    assert(ais.getFrameLength === 8000L)
    // stereo: duration counts frames, not samples
    val stereo = Multimodal.decode(MediaRow(3L, "audio/wav",
      Multimodal.encodeWav(4000, 8000, 2, (f, c) => if (c == 0) 0.5 else -0.5)))
    assert(stereo.channels === 2 && stereo.duration_ms === 500L)
  }

  test("decode degrades to byte-level features instead of failing") {
    val junk = Multimodal.decode(MediaRow(4L, "application/x-unknown",
      Array[Byte](1, 2, 3, 4)))
    assert(junk.width === 0 && junk.sample_rate === 0)
    assert(junk.n_bytes === 4L && junk.histogram(0) === 1.0)
    // truncated magic bytes fall through, never throw
    val truncBmp = Multimodal.decode(MediaRow(5L, "image/bmp", "BM".getBytes))
    assert(truncBmp.width === 0 && truncBmp.n_bytes === 2L)
    val truncWav = Multimodal.decode(MediaRow(6L, "audio/wav", "RIFF".getBytes))
    assert(truncWav.sample_rate === 0 && truncWav.n_bytes === 4L)
    val empty = Multimodal.decode(MediaRow(7L, "x", null))
    assert(empty.n_bytes === 0L)
  }
}
