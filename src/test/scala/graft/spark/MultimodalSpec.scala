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

  test("hostile BMP header: width*height overflow must not slip the bound check") {
    // width=height=0x7FFFFFFF wraps rowSize*height negative — the naive
    // bound check passes and the pixel loop AIOOBEs out of decode()
    val b = new Array[Byte](54)
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b(0) = 'B'; b(1) = 'M'
    buf.putInt(10, 54)                 // pixelOffset
    buf.putInt(18, Int.MaxValue)       // width
    buf.putInt(22, Int.MaxValue)       // height
    buf.putShort(28, 24.toShort)       // bpp
    buf.putInt(30, 0)                  // compression
    val f = Multimodal.decode(MediaRow(1L, "image/bmp", b))
    // degraded to byte-level features (no decoded dimensions), not thrown
    assert(f.n_bytes === 54L && f.width === 0 && f.height === 0)
    assert(Multimodal.resizeBmp(b, 4) != null) // pass-through, not thrown
  }

  test("exact-duplicate clusters larger than the bucket cap still pair up") {
    val s = spark
    import s.implicits._
    // 30 identical solid-color thumbnails + cap 10: every band bucket is
    // oversized, so the approximate tier alone would emit ZERO pairs —
    // the hash-equality star tier must keep exact dedup complete
    val bmp = Multimodal.encodeBmp(4, 4, (_, _) => (255, 255, 255))
    val other = Multimodal.encodeBmp(4, 4, (x, y) => (x * 40, y * 40, 9))
    val media = ((1L to 30L).map(i => MediaRow(i, "image/bmp", bmp)) :+
      MediaRow(99L, "image/bmp", other)).toDS()
    val pairs = Multimodal.imageNearDuplicates(media, maxHamming = 0,
        maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (2L to 30L).map(i => (1L, i)).toSet,
      "star pairs: cluster min to every member, nothing for the singleton")
  }

  test("syntheticMedia: null text degrades to empty media, no NPE") {
    val s = spark
    import s.implicits._
    val df = Seq((2L, Option.empty[String]), (4L, Option("hello")))
      .toDF("doc_id", "text")
    val rows = Multimodal.syntheticMedia(df, "doc_id", "text")
      .collect().map(m => m.media_id -> m.media.length).toMap
    assert(rows.contains(2L) && rows.contains(4L))
    assert(rows(4L) > 0)
  }

  test("decode and resizeBmp never throw on fuzzed/truncated payloads") {
    val rnd = new scala.util.Random(31)
    val wav = Multimodal.encodeWav(100, 8000, 1, (f, _) => math.sin(f * 0.1))
    val bmp = Multimodal.encodeBmp(9, 7, (x, y) => (x * 20, y * 30, 40))
    val payloads =
      (0 until 200).map(_ => Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)) ++
      (0 until wav.length by 7).map(wav.take) ++   // truncated WAVs
      (0 until bmp.length by 7).map(bmp.take) ++   // truncated BMPs
      Seq(bmp.clone(), wav.clone()).map { b =>     // valid magic, mangled body
        (20 until b.length).foreach(i => b(i) = rnd.nextInt(256).toByte); b
      } ++
      (0 until 100).map { _ =>                     // valid magic, fuzzed header
        val b = (if (rnd.nextBoolean()) bmp else wav).clone()
        (0 until 8).foreach { _ =>
          b(4 + rnd.nextInt(50 min (b.length - 4))) = rnd.nextInt(256).toByte
        }
        b
      }
    payloads.zipWithIndex.foreach { case (b, i) =>
      val f = Multimodal.decode(MediaRow(i.toLong, "x", b))
      assert(f.n_bytes === b.length.toLong, s"payload $i")
      Multimodal.resizeBmp(b, 4) // must return, never throw
    }
    // the sample-level WAV parse behind audioWindows survives the same fuzz
    val s = spark
    import s.implicits._
    val media = payloads.zipWithIndex.map { case (b, i) => MediaRow(i.toLong, "x", b) }.toDS()
    Multimodal.audioWindows(media, windowMs = 10, hopMs = 10).count()
  }

  lazy val spark: org.apache.spark.sql.SparkSession = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("resizeBmp preserves top-down (negative height) row order") {
    // hand-build a top-down 4x2 24bpp BMP: same pixels as the bottom-up
    // encoder output, stored in reading order with height = -2
    val srcPix = (x: Int, y: Int) => (x * 9 + y, 200 - x * 3, y * 50)
    val bottomUp = Multimodal.encodeBmp(4, 2, srcPix)
    val topDown = bottomUp.clone()
    val bb = java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2) // height: top-down
    // swap the two pixel rows (bottom-up stores row 1 first)
    val rowSize = ((4 * 3 + 3) / 4) * 4
    val r0 = topDown.slice(54, 54 + rowSize)
    System.arraycopy(topDown, 54 + rowSize, topDown, 54, rowSize)
    System.arraycopy(r0, 0, topDown, 54 + rowSize, rowSize)
    // both encodings decode to the same image, so both resizes must too
    val a = Multimodal.decode(MediaRow(1L, "image/bmp",
      Multimodal.resizeBmp(bottomUp, 2).get))
    val b = Multimodal.decode(MediaRow(2L, "image/bmp",
      Multimodal.resizeBmp(topDown, 2).get))
    assert(a.width === b.width && a.height === b.height)
    assert(a.mean_level === b.mean_level)
    assert(a.histogram.toSeq === b.histogram.toSeq)
  }

  test("resizeBmpBox: exact block averages, uniform preservation, fuzz safety") {
    // 4x2 -> 2x1: each output pixel averages its exact 2x2 block
    val pix = Array(
      Array((10, 20, 30), (20, 40, 50), (100, 0, 0), (200, 0, 0)),
      Array((30, 60, 70), (40, 80, 90), (0, 0, 100), (0, 0, 200)))
    val src = Multimodal.encodeBmp(4, 2, (x, y) => pix(y)(x))
    val out = Multimodal.resizeBmpBox(src, 2).get
    val expect = Multimodal.encodeBmp(2, 1, (x, _) => {
      val block = for (dy <- 0 to 1; dx <- 0 to 1) yield pix(dy)(x * 2 + dx)
      (block.map(_._1).sum / 4, block.map(_._2).sum / 4, block.map(_._3).sum / 4)
    })
    assert(out.toSeq === expect.toSeq)
    // uniform color is exact under any box size; within-bounds passes through
    val uni = Multimodal.encodeBmp(33, 17, (_, _) => (7, 77, 177))
    val f = Multimodal.decode(MediaRow(1L, "image/bmp",
      Multimodal.resizeBmpBox(uni, 8).get))
    assert(math.abs(f.mean_level - ((77 * 7 + 150 * 77 + 29 * 177) >> 8)) < 1e-9)
    assert(Multimodal.resizeBmpBox(src, 8).get eq src)
    // never throws on junk
    val rnd = new scala.util.Random(17)
    (0 until 100).foreach { _ =>
      Multimodal.resizeBmpBox(Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte), 4)
    }
  }

  test("resizeBmp: golden nearest-neighbor mapping, pass-through, mean preservation") {
    // 4x2 gradient; maxDim=2 -> outW=2, outH=1; src pixel = floor(x*4/2, y*2/1)
    val srcPix = (x: Int, y: Int) => (x * 10 + y, x * 20, y * 30)
    val small = Multimodal.resizeBmp(Multimodal.encodeBmp(4, 2, srcPix), 2).get
    val expect = Multimodal.encodeBmp(2, 1, (x, y) => srcPix(x * 2, y * 2))
    assert(small.toSeq === expect.toSeq)
    // within bounds: byte-identical pass-through
    val tiny = Multimodal.encodeBmp(3, 2, srcPix)
    assert(Multimodal.resizeBmp(tiny, 8).get eq tiny)
    // uniform color survives any resample exactly
    val uni = Multimodal.encodeBmp(37, 23, (_, _) => (10, 200, 60))
    val f = Multimodal.decode(MediaRow(1L, "image/bmp",
      Multimodal.resizeBmp(uni, 8).get))
    assert(f.width === 8 && f.height === 5) // ceil(37*8/37), ceil(23*8/37)
    val lum = (77 * 10 + 150 * 200 + 29 * 60) >> 8
    assert(math.abs(f.mean_level - lum) < 1e-9)
    // non-BMP payloads are refused, not mangled
    assert(Multimodal.resizeBmp("RIFF....WAVE".getBytes, 8).isEmpty)
  }

  test("audioWindows: constant-amplitude goldens, partial final window, non-WAV drops") {
    lazy val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // 2500 frames at 1 kHz mono, constant 0.5 amplitude: windowMs=1000,
    // hopMs=1000 -> windows of 1000, 1000, 500 frames, rms=peak=~0.5
    val amp = math.round(0.5 * 32767.0) / 32768.0
    val wav = Multimodal.encodeWav(2500, 1000, 1, (_, _) => 0.5)
    val media = Seq(MediaRow(1L, "audio/wav", wav),
      MediaRow(2L, "text/plain", "not audio".getBytes)).toDS()
    val rows = Multimodal.audioWindows(media, windowMs = 1000, hopMs = 1000)
      .orderBy("media_id", "window_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq ===
      Seq((1L, 0, 0L, 1000L, 1000), (1L, 1, 1000L, 2000L, 1000),
        (1L, 2, 2000L, 2500L, 500)))
    rows.foreach { t =>
      assert(math.abs(t._6 - amp) < 1e-9, s"rms ${t._6}")
      assert(math.abs(t._7 - amp) < 1e-9, s"peak ${t._7}")
    }
  }

  test("audioSegments merges consecutive active windows; silence splits") {
    lazy val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // 5 s at 1 kHz: loud [0,2s), silent [2,3s), loud [3,5s)
    val wav = Multimodal.encodeWav(5000, 1000, 1,
      (f, _) => if (f < 2000 || f >= 3000) 0.5 else 0.0)
    val media = Seq(MediaRow(1L, "audio/wav", wav)).toDS()
    val segs = Multimodal.audioSegments(media, windowMs = 1000, hopMs = 1000,
        minRms = 0.1)
      .orderBy("segment").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(segs.toSeq === Seq((0, 0L, 2000L, 2), (1, 3000L, 5000L, 2)))
  }

  test("imageDHash: row-constant exposure shift is invisible to the gradient hash, not to aHash") {
    // base luminance <= ~170, shift <= 62 -> no channel clips, so the
    // per-row shift averages out EXACTLY inside each grid row
    def img(shift: Int => Int): Array[Byte] =
      Multimodal.encodeBmp(32, 32, (x, y) => {
        val v = (x * 7 + y * 2) % 170
        val s = shift(y)
        (v + s, (v / 2) + s, (170 - v) / 2 + s)
      })
    val flat = img(_ => 0)
    val vignette = img(y => y * 2) // top-to-bottom brightness ramp
    assert(Multimodal.imageDHash(flat) === Multimodal.imageDHash(flat.clone()))
    assert(Multimodal.imageDHash(flat) === Multimodal.imageDHash(vignette),
      "dHash compares cells WITHIN a row: a row-constant shift must cancel")
    val aFlat = Multimodal.imageAHash(flat).get
    val aVig = Multimodal.imageAHash(vignette).get
    assert(java.lang.Long.bitCount(aFlat ^ aVig) > 0,
      "the ramp lifts whole rows over aHash's global mean — the case dHash exists for")
    assert(Multimodal.imageDHash("RIFFxxxxWAVE".getBytes).isEmpty)
    // dedup path on dHash: the shifted duplicate lands at hamming 0
    lazy val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image/bmp", flat),
      MediaRow(2L, "image/bmp", vignette), // exposure-shifted duplicate
      MediaRow(3L, "image/bmp", Multimodal.encodeBmp(32, 32,
        (x, y) => ((x * 13 + y * 11) % 200, x % 150, y % 150)))).toDS()
    val viaD = Multimodal.imageNearDuplicates(media, maxHamming = 0, useDHash = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(viaD.toSeq === Seq((1L, 2L, 0)))
  }

  test("imageAHash: identical payloads collide, noise stays near, dedup finds planted pairs") {
    lazy val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def noisy(seed: Int, flips: Int): Array[Byte] = {
      val r2 = new scala.util.Random(seed)
      val img = Multimodal.encodeBmp(32, 32,
        (x, y) => { val v = (x * 8 + y * 3 + seed * 7) % 256; (v, 255 - v, v / 2) })
      (0 until flips).foreach { _ =>
        img(54 + r2.nextInt(img.length - 54)) = r2.nextInt(256).toByte
      }
      img
    }
    val base = noisy(1, 0)
    assert(Multimodal.imageAHash(base) === Multimodal.imageAHash(base.clone()))
    // a few flipped bytes move the hash only slightly
    val near = Multimodal.imageAHash(noisy(1, 12)).get
    val ham = java.lang.Long.bitCount(Multimodal.imageAHash(base).get ^ near)
    assert(ham <= 8, s"noise moved hash too far: $ham")
    assert(Multimodal.imageAHash("RIFFxxxxWAVE".getBytes).isEmpty)
    // banded dedup: planted copies found at hamming 0, disjoint images not
    val media = (Seq(
      MediaRow(1L, "image/bmp", noisy(1, 0)),
      MediaRow(2L, "image/bmp", noisy(1, 0)),      // exact copy of 1
      MediaRow(3L, "image/bmp", noisy(99, 0)),     // unrelated
      MediaRow(4L, "audio/wav", Multimodal.encodeWav(10, 1000, 1, (_, _) => 0.1))))
      .toDS()
    val pairs = Multimodal.imageNearDuplicates(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
  }

  test("resizeMedia bounds every BMP; WAV passes through untouched") {
    lazy val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, ("x" * (1 + i.toInt % 97)) + "y"))
      .toDF("doc_id", "text")
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val resized = Multimodal.resizeMedia(media, maxDim = 8)
    val feats = Multimodal.extractFeatures(resized).collect()
    feats.foreach { f =>
      if (f.mime == "image/bmp") {
        assert(f.width <= 8 && f.height <= 8 && f.width > 0, s"dims $f")
      }
    }
    // WAV payloads byte-identical to the originals
    val origWav = media.collect().filter(_.mime == "audio/wav")
      .map(r => r.media_id -> r.media.toSeq).toMap
    resized.collect().filter(_.mime == "audio/wav").foreach { r =>
      assert(r.media.toSeq === origWav(r.media_id))
    }
  }

  test("resize planner dims equal the payload codec's dims (exact integer " +
       "ceil-division; the float formulation planned 8 for 25x25 at maxDim 7)") {
    lazy val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // 25x25 at maxDim=7 is the verified float counterexample:
    // ceil(25 * (7/25.0)) = ceil(7.000000000000001) = 8, while the codec's
    // (25*7+24)/25 = 7
    val bmp = Multimodal.encodeBmp(25, 25, (_, _) => (10, 20, 30))
    val media = Seq(MediaRow(1L, "image/bmp", bmp)).toDS()
    val planned = Multimodal.resize(Multimodal.extractFeatures(media), maxDim = 7)
      .select("out_width", "out_height").head()
    assert((planned.getInt(0), planned.getInt(1)) === ((7, 7)))
    val decoded = Multimodal.extractFeatures(
      Multimodal.resizeMedia(media, maxDim = 7)).head()
    assert((decoded.width, decoded.height) === ((7, 7)))
    // pass-through regime: planned dims are the original dims
    val pass = Multimodal.resize(Multimodal.extractFeatures(media), maxDim = 25)
      .select("out_width", "out_height").head()
    assert((pass.getInt(0), pass.getInt(1)) === ((25, 25)))
  }

  test("syntheticMedia handles negative ids (signed surrogate keys) and " +
       "frameSample validates its parameters") {
    lazy val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // -2 % 16 == -2 in Scala: the old height 1 + (id % 16) was -1 and
    // tripped encodeBmp's require inside the executor
    val docs = Seq((-2L, "some text"), (-15L, "other text")).toDF("doc_id", "text")
    val rows = Multimodal.syntheticMedia(docs, "doc_id", "text").collect()
    assert(rows.length === 2)
    val media = Seq(MediaRow(1L, "application/octet-stream",
      Array.fill[Byte](10)(1))).toDS()
    intercept[IllegalArgumentException] { Multimodal.frameSample(media, 0, 2) }
    intercept[IllegalArgumentException] { Multimodal.frameSample(media, 4, 0) }
  }
}
