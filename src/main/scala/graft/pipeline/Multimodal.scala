package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata. */
final case class MediaRow(
    media_id: Long,
    mime: String,
    media: Array[Byte])

/** Decoded features for one media item. Image fields are zero for audio and
  * vice versa; the fallback (unknown format) fills only n_bytes + histogram. */
final case class MediaFeatures(
    media_id: Long,
    mime: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    sample_rate: Int,
    channels: Int,
    duration_ms: Long,
    mean_level: Double,
    histogram: Array[Double])

/**
 * Multimodal column plumbing: image/audio/video as opaque binary columns
 * with typed metadata, processed in per-partition batches — the Spark-side
 * schema/partitioning/batch shape a 100 TB media pipeline needs, with an
 * HONEST pure-JVM codec for two public formats:
 *
 *  - BMP (Windows BITMAPINFOHEADER, 24-bpp uncompressed): header parse
 *    (width/height/bpp/compression) + real pixel walk (mean luminance,
 *    16-bin luminance histogram, bottom-up and top-down row orders).
 *  - WAV (RIFF PCM): fmt/data chunk walk (channels/sample rate/bits) +
 *    real sample scan (duration, RMS level, 16-bin amplitude histogram).
 *
 * Anything else degrades to byte-level features (n_bytes + byte histogram)
 * rather than failing — the behavior a curation pipeline wants for the
 * long tail of unparseable payloads. Heavier codecs (JPEG/PNG/ffmpeg) slot
 * into [[decode]]'s dispatch without touching the pipeline shape.
 */
object Multimodal {

  /** Magic-dispatching decode: BMP / WAV get a real parse; unknown payloads
    * degrade to byte-level features. Never throws on malformed bytes —
    * a truncated header falls through to the byte-level path. */
  def decode(row: MediaRow): MediaFeatures = {
    val bytes = if (row.media == null) Array.emptyByteArray else row.media
    decodeBmp(row.media_id, row.mime, bytes)
      .orElse(decodeWav(row.media_id, row.mime, bytes))
      .getOrElse(byteFeatures(row.media_id, row.mime, bytes))
  }

  /** Partition-parallel feature extraction: batches flow through the codec
    * without ever collecting to the driver. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decode))
  }

  // ------------------------------------------------------------------ BMP

  /** Validated 24-bpp uncompressed BMP header. */
  private final case class BmpHeader(pixelOffset: Int, width: Int,
                                     rawHeight: Int, height: Int, rowSize: Int) {
    /** File row index for IMAGE row y (bottom-up unless rawHeight < 0). */
    def srcRow(y: Int): Int = if (rawHeight > 0) height - 1 - y else y
  }

  /** The ONE header parse/validate for every BMP operator (decode, resize,
    * box resize, aHash): BITMAPFILEHEADER (2B magic, 4B size, 4B reserved,
    * 4B pixel offset) + BITMAPINFOHEADER (4B size, 4B width, 4B height —
    * negative = top-down, 2B planes, 2B bpp, 4B compression). All size
    * checks run in LONG arithmetic — a hostile width*3 or rowSize*height
    * overflows int past the bound check — and Int.MinValue height (whose
    * abs is negative) is rejected. */
  private def parseBmpHeader(b: Array[Byte]): Option[BmpHeader] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    if (width <= 0 || rawHeight == 0 || rawHeight == Int.MinValue ||
        bpp != 24 || compression != 0) return None
    val height = math.abs(rawHeight)
    val rowSizeL = ((width.toLong * 3 + 3) / 4) * 4
    // bound rowSize and height by the payload FIRST: a hostile header with
    // width*height near 2^31 makes rowSizeL*height wrap negative, slipping
    // past the bound check and crashing the pixel loop on a 54-byte array
    // (decode's contract is never-throws); with both factors <= b.length
    // the product cannot overflow a Long
    if (pixelOffset < 54 || rowSizeL > b.length.toLong || height > b.length ||
        pixelOffset.toLong + rowSizeL * height > b.length) return None
    Some(BmpHeader(pixelOffset, width, rawHeight, height, rowSizeL.toInt))
  }

  /** Pixel stats: mean luminance + 16-bin histogram (ITU-R BT.601 integer
    * approx (77R + 150G + 29B) >> 8). */
  private def decodeBmp(id: Long, mime: String, b: Array[Byte]): Option[MediaFeatures] =
    parseBmpHeader(b).map { h =>
      val hist = new Array[Double](16)
      var lumSum = 0.0
      var y = 0
      while (y < h.height) {
        var x = 0
        val base = h.pixelOffset + h.srcRow(y) * h.rowSize
        while (x < h.width) {
          val blue = b(base + x * 3) & 0xff
          val green = b(base + x * 3 + 1) & 0xff
          val red = b(base + x * 3 + 2) & 0xff
          val lum = (77 * red + 150 * green + 29 * blue) >> 8
          hist(lum >> 4) += 1
          lumSum += lum
          x += 1
        }
        y += 1
      }
      val n = h.width.toLong * h.height
      MediaFeatures(id, mime, b.length.toLong, h.width, h.height,
        sample_rate = 0, channels = 0, duration_ms = 0L,
        mean_level = lumSum / n, histogram = hist.map(_ / n))
    }

  /** Build a 24-bpp bottom-up BMP from a pixel function (x, y) => (r, g, b).
    * A real, spec-conformant file — Java ImageIO reads it. */
  def encodeBmp(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = ((width * 3 + 3) / 4) * 4
    val size = 54 + rowSize * height
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(rowSize * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var y = 0
    while (y < height) {
      val imgY = height - 1 - y // bottom-up row order
      var x = 0
      while (x < width) {
        val (r, g, bl) = pixel(x, imgY)
        buf.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y += 1
    }
    buf.array()
  }

  // ------------------------------------------------------------------ WAV

  /** Per-file stats over the PCM samples from [[parseWavSamples]] — the
    * one RIFF chunk walk all WAV operators share. Level = RMS over
    * normalized [-1, 1] samples; 16-bin amplitude histogram. */
  private def decodeWav(id: Long, mime: String, b: Array[Byte]): Option[MediaFeatures] =
    parseWavSamples(b).map { case (sampleRate, channels, samples) =>
      val nFrames = samples.length / channels
      val hist = new Array[Double](16)
      var sumSq = 0.0
      var i = 0
      while (i < samples.length) {
        val s = samples(i) / 32768.0
        sumSq += s * s
        // amplitude bin over [-1, 1): (s+1)/2 * 16
        val bin = math.min(15, ((s + 1.0) * 8).toInt)
        hist(bin) += 1
        i += 1
      }
      val nSamples = samples.length
      MediaFeatures(id, mime, b.length.toLong, width = 0, height = 0,
        sample_rate = sampleRate, channels = channels,
        duration_ms = nFrames.toLong * 1000L / sampleRate,
        mean_level = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples),
        histogram = if (nSamples == 0) hist else hist.map(_ / nSamples))
    }

  /** Build a 16-bit PCM RIFF/WAVE file from a sample function (frame index,
    * channel) => [-1, 1]. */
  def encodeWav(nFrames: Int, sampleRate: Int, channels: Int,
                sample: (Int, Int) => Double): Array[Byte] = {
    require(nFrames >= 0 && sampleRate > 0 && channels > 0)
    val dataLen = nFrames * channels * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)           // byte rate
      .putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = math.max(-1.0, math.min(1.0, sample(f, c)))
        buf.putShort(math.round(v * 32767.0).toShort)
        c += 1
      }
      f += 1
    }
    buf.array()
  }

  // ------------------------------------------------------------- fallback

  /** Byte-level degradation for unknown/malformed payloads: n_bytes + raw
    * byte histogram. Keeps the long tail flowing instead of failing. */
  private def byteFeatures(id: Long, mime: String, bytes: Array[Byte]): MediaFeatures = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1
      i += 1
    }
    val total = math.max(1, bytes.length)
    MediaFeatures(id, mime, bytes.length.toLong, 0, 0, 0, 0, 0L, 0.0,
      hist.map(_ / total))
  }

  // ------------------------------------------------------------ pipelines

  /** Resize planning: a metadata-level operation (target dims from the
    * same ceil-division [[resizeBmp]] performs on the payload). */
  def resize(features: Dataset[MediaFeatures], maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive: $maxDim")
    val f = features.toDF()
    // EXACT integer ceil-division via SQL DIV, the same rule resizeBmp
    // applies to the payload: the float formulation ceil(width *
    // (maxDim/longest)) rounds up past the true ceiling (25×25 at
    // maxDim=7: 25*(7/25.0) = 7.000000000000001 → planned 8 vs the
    // payload's 7), and routing the long numerator through double `/`
    // loses bit-parity once dim*maxDim exceeds 2^53. DIV stays in long
    // arithmetic end to end, so planned dims match the codec at any
    // magnitude.
    // staging column must not collide with (and silently drop) a column the
    // caller already carries — pick the first free __longest[_N] name
    val lcol = Iterator.from(0)
      .map(i => if (i == 0) "__longest" else s"__longest_$i")
      .find(n => !f.columns.contains(n)).get
    val withLongest = f.withColumn(lcol,
      greatest(col("width"), col("height")).cast("long"))
    def planned(name: String): org.apache.spark.sql.Column =
      when(col(lcol) <= maxDim, col(name).cast("int"))
        .otherwise(expr(
          s"CAST((CAST($name AS BIGINT) * $maxDim + `$lcol` - 1) DIV `$lcol` AS INT)"))
    withLongest.withColumn("out_width", planned("width"))
      .withColumn("out_height", planned("height"))
      .drop(lcol)
  }

  /** REAL downsample of a 24-bpp BMP payload: nearest-neighbor resample so
    * the longest side is <= maxDim, re-encoded as a spec-conformant BMP.
    * Output dims use exact integer ceil-division
    * (`(dim * maxDim + longest - 1) / longest`) so they are reproducible in
    * integer SQL; source pixel for output (x, y) is the floor-scaled
    * (x * w / outW, y * h / outH). Images already within bounds pass
    * through byte-identical; non-BMP/malformed payloads return None. */
  def resizeBmp(b: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    require(maxDim > 0, s"maxDim must be positive: $maxDim")
    parseBmpHeader(b).map { h =>
      val longest = math.max(h.width, h.height)
      if (longest <= maxDim) b
      else {
        val outW = ((h.width.toLong * maxDim + longest - 1) / longest).toInt
        val outH = ((h.height.toLong * maxDim + longest - 1) / longest).toInt
        encodeBmp(outW, outH, (x, y) => {
          val sx = (x.toLong * h.width / outW).toInt
          val sy = (y.toLong * h.height / outH).toInt
          val base = h.pixelOffset + h.srcRow(sy) * h.rowSize + sx * 3
          ((b(base + 2) & 0xff, b(base + 1) & 0xff, b(base) & 0xff))
        })
      }
    }
  }

  /** Box-filter (area-average) downsample of a 24-bpp BMP: each output
    * pixel averages its exact source rectangle `[x*w/outW, (x+1)*w/outW) x
    * [y*h/outH, (y+1)*h/outH)` per channel (integer-truncated mean) — the
    * anti-aliased quality baseline where [[resizeBmp]]'s nearest-neighbor
    * aliases. Same integer ceil-division output dims; same pass-through /
    * rejection behavior. */
  def resizeBmpBox(b: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    require(maxDim > 0, s"maxDim must be positive: $maxDim")
    parseBmpHeader(b).map { h =>
      val longest = math.max(h.width, h.height)
      if (longest <= maxDim) b
      else {
        val outW = ((h.width.toLong * maxDim + longest - 1) / longest).toInt
        val outH = ((h.height.toLong * maxDim + longest - 1) / longest).toInt
        encodeBmp(outW, outH, (x, y) => {
          val x0 = (x.toLong * h.width / outW).toInt
          val x1 = math.max(x0 + 1, ((x + 1).toLong * h.width / outW).toInt)
          val y0 = (y.toLong * h.height / outH).toInt
          val y1 = math.max(y0 + 1, ((y + 1).toLong * h.height / outH).toInt)
          var r = 0L; var g = 0L; var bl = 0L
          var sy = y0
          while (sy < y1) {
            val rowBase = h.pixelOffset + h.srcRow(sy) * h.rowSize
            var sx = x0
            while (sx < x1) {
              val base = rowBase + sx * 3
              bl += b(base) & 0xff; g += b(base + 1) & 0xff; r += b(base + 2) & 0xff
              sx += 1
            }
            sy += 1
          }
          val n = (x1 - x0).toLong * (y1 - y0)
          ((r / n).toInt, (g / n).toInt, (bl / n).toInt)
        })
      }
    }
  }

  /** 64-bit average-hash (aHash) of a 24-bpp BMP — the perceptual
    * fingerprint for image dedup: luminance box-averaged onto a fixed 8x8
    * grid, bit (8*gy+gx) set when the cell mean >= the global mean.
    * Identical payloads hash identically; small pixel noise flips few
    * bits, so near-duplicate frames sit at small Hamming distance.
    * Non-BMP/malformed payloads return None. */
  def imageAHash(b: Array[Byte]): Option[Long] = lumaGrid(b, 8, 8).map { cell =>
    val mean = cell.sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) { if (cell(i) >= mean) hash |= 1L << i; i += 1 }
    hash
  }

  /** 64-bit difference-hash (dHash): luminance box-averaged onto a 9x8
    * grid, bit (8*gy+gx) set when cell (gx+1) is brighter than cell gx in
    * its row — the horizontal-GRADIENT fingerprint. Same banded-dedup
    * contract as [[imageAHash]] with one extra property the spec pins: a
    * uniform brightness shift moves every cell mean equally, so gradients
    * (and the hash) are INVARIANT — the exposure-variant near-dup case
    * aHash's global-mean threshold gets wrong. */
  def imageDHash(b: Array[Byte]): Option[Long] = lumaGrid(b, 9, 8).map { cell =>
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (cell(gy * 9 + gx + 1) > cell(gy * 9 + gx)) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Shared grid pass for the perceptual hashes: mean luminance of a
    * gw×gh box grid over a 24-bpp BMP (one pass over the pixels). */
  private def lumaGrid(b: Array[Byte], gw: Int, gh: Int): Option[Array[Double]] =
    parseBmpHeader(b).map { h =>
      val cell = new Array[Double](gw * gh)
      var gy = 0
      while (gy < gh) {
        val y0 = (gy.toLong * h.height / gh).toInt
        val y1 = math.max(y0 + 1, ((gy + 1).toLong * h.height / gh).toInt)
        var gx = 0
        while (gx < gw) {
          val x0 = (gx.toLong * h.width / gw).toInt
          val x1 = math.max(x0 + 1, ((gx + 1).toLong * h.width / gw).toInt)
          var sum = 0L
          var sy = y0
          while (sy < y1) {
            val rowBase = h.pixelOffset + h.srcRow(sy) * h.rowSize
            var sx = x0
            while (sx < x1) {
              val base = rowBase + sx * 3
              sum += (77 * (b(base + 2) & 0xff) + 150 * (b(base + 1) & 0xff) +
                29 * (b(base) & 0xff)) >> 8
              sx += 1
            }
            sy += 1
          }
          cell(gy * gw + gx) = sum.toDouble / ((x1 - x0).toLong * (y1 - y0))
          gx += 1
        }
        gy += 1
      }
      cell
    }

  /** Perceptual hashes of the BMP payloads in a media stream:
    * (media_id, ahash). Non-BMP rows are absent. Scan-local. */
  def imageHashes(media: Dataset[MediaRow], useDHash: Boolean = false): DataFrame = {
    import media.sparkSession.implicits._
    val hashFn: Array[Byte] => Option[Long] =
      if (useDHash) imageDHash else imageAHash
    media.flatMap { r =>
      hashFn(if (r.media == null) Array.emptyByteArray else r.media)
        .map(h => (r.media_id, h))
    }.toDF("media_id", "ahash")
  }

  /** Image near-duplicate pairs (id1 < id2) within `maxHamming` bits of
    * aHash distance — image-space dedup on the same banded-LSH shape as
    * the text paths: the 64-bit hash splits into `bands` equal chunks,
    * candidates share at least one chunk (guaranteed complete for
    * maxHamming < bands by pigeonhole; approximate above), and the exact
    * `bit_count(xor)` verifies. Only (id, hash) travels — no payloads.
    * `useDHash` swaps in the gradient hash ([[imageDHash]]) — the variant
    * that survives exposure shifts between duplicate fetches. */
  def imageNearDuplicates(media: Dataset[MediaRow], maxHamming: Int = 3,
                          bands: Int = 4, useDHash: Boolean = false,
                          maxBucketSize: Int = 1000): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64: $bands")
    val bits = 64 / bands
    // -1L >>> (64-bits) is correct at bits=64 too; (1L << 64) - 1 would
    // overflow to 0 and collapse every hash into one cross-product bucket
    val mask = -1L >>> (64 - bits)
    val hashes = imageHashes(media, useDHash)
    val allBands = hashes.select(col("media_id"), col("ahash"),
      posexplode(array((0 until bands).map(bd =>
        shiftrightunsigned(col("ahash"), bd * bits)
          .bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // session-cached (see Dedup band table): sizing + both join sides
    // cap degenerate buckets (same guard as every text LSH path): a
    // scraped corpus is full of solid-color/uniform images whose hash is
    // all-ones or all-zeros — one hot chunk squares the self-join. An
    // oversized bucket is an exact-hash duplicate CLUSTER; collapse it by
    // hash equality instead of pairwise Hamming
    val sized = allBands.groupBy("band", "chunk").agg(count(lit(1)).as("bucket_n"))
    val banded = allBands.join(
      sized.where(col("bucket_n") <= maxBucketSize).select("band", "chunk"),
      Seq("band", "chunk"), "left_semi")
    val approx = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.chunk") === col("r.chunk") &&
        col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("id1"), col("r.media_id").as("id2"),
        col("l.ahash").as("h1"), col("r.ahash").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .where(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
    // the promised hash-equality collapse for clusters the cap drops: an
    // exact-duplicate cluster larger than maxBucketSize saturates every
    // band bucket, so the approximate tier would emit ZERO pairs for it.
    // Star pairs (cluster min -> member) via a hash-keyed join — linear in
    // cluster size, no collected member lists — keep exact dedup complete
    // at any cluster size; the cap bounds only the hamming>0 tier.
    // band 0 carries every (media_id, ahash) exactly once and reads from
    // the persisted band table — no second image-decode pass
    val hashRows = allBands.where(col("band") === 0).select("media_id", "ahash")
    val mins = hashRows.groupBy("ahash")
      .agg(min(col("media_id")).as("id1"), count(lit(1)).as("n"))
      .where(col("n") > 1).select("ahash", "id1")
    val exact = hashRows.join(mins, Seq("ahash"))
      .where(col("media_id") =!= col("id1"))
      .select(col("id1"), col("media_id").as("id2"), lit(0).as("hamming"))
    approx.unionByName(exact).dropDuplicates("id1", "id2")
  }

  /** Payload-level resize over a media stream: BMP payloads re-encoded
    * through [[resizeBmp]] (nearest-neighbor) or [[resizeBmpBox]]
    * (area-average) per `antialias`, everything else passed through
    * untouched — scan-local batches, nothing collects. */
  def resizeMedia(media: Dataset[MediaRow], maxDim: Int,
                  antialias: Boolean = false): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val f: Array[Byte] => Option[Array[Byte]] =
      if (antialias) resizeBmpBox(_, maxDim) else resizeBmp(_, maxDim)
    media.mapPartitions(_.map { r =>
      f(if (r.media == null) Array.emptyByteArray else r.media)
        .map(out => r.copy(media = out)).getOrElse(r)
    })
  }

  /** Windowed audio features — the frame-sample path with real samples:
    * each 16-bit PCM WAV yields one row per analysis window (`windowMs`
    * long, advancing by `hopMs`, final partial window kept) with the RMS
    * and peak of the window's normalized samples across all channels.
    * Non-WAV payloads yield no rows. Scan-local (flatMap in partition
    * batches); window count per item is ceil(nFrames / hopFrames). */
  def audioWindows(media: Dataset[MediaRow], windowMs: Int, hopMs: Int): DataFrame = {
    require(windowMs > 0 && hopMs > 0, s"windowMs/hopMs must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val b = if (r.media == null) Array.emptyByteArray else r.media
      parseWavSamples(b) match {
        case None => Iterator.empty
        case Some((sampleRate, channels, samples)) =>
          val nFrames = samples.length / channels
          // clamp BEFORE truncating to int: a hostile fmt-chunk sample rate
          // (sampleRate near 2^31) times windowMs overflows the int cast,
          // giving zero/negative frame counts (divide-by-zero NaN rms)
          def frames(ms: Int): Int =
            math.min(Int.MaxValue.toLong,
              math.max(1L, sampleRate.toLong * ms / 1000)).toInt
          val winF = frames(windowMs)
          val hopF = frames(hopMs)
          Iterator.range(0, nFrames, hopF).zipWithIndex.map { case (startF, idx) =>
            val endF = math.min(nFrames, startF + winF)
            var sumSq = 0.0
            var peak = 0.0
            var i = startF * channels
            val end = endF * channels
            while (i < end) {
              val s = samples(i) / 32768.0
              sumSq += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              i += 1
            }
            val n = end - startF * channels
            (r.media_id, idx, startF.toLong * 1000 / sampleRate,
              endF.toLong * 1000 / sampleRate,
              endF - startF, math.sqrt(sumSq / n), peak)
          }
      }
    }.toDF("media_id", "window_idx", "start_ms", "end_ms", "n_frames", "rms", "peak")
  }

  /** Active-audio segments — VAD-style energy segmentation: windows with
    * RMS >= `minRms` merge when CONSECUTIVE (adjacent hop indices) into
    * (media_id, segment, start_ms, end_ms, n_windows). The grouping is the
    * classic idx-minus-rank trick; the per-media window partitions the
    * bounded per-item window list, never corpus rows. */
  def audioSegments(media: Dataset[MediaRow], windowMs: Int, hopMs: Int,
                    minRms: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val active = audioWindows(media, windowMs, hopMs)
      .where(col("rms") >= minRms)
    val w = Window.partitionBy("media_id").orderBy("window_idx")
    active
      .withColumn("grp", col("window_idx") - row_number().over(w))
      .groupBy(col("media_id"), col("grp"))
      .agg(min(col("start_ms")).as("start_ms"), max(col("end_ms")).as("end_ms"),
        count(lit(1)).cast("int").as("n_windows"))
      .withColumn("segment",
        (row_number().over(Window.partitionBy("media_id").orderBy("start_ms")) - 1))
      .select("media_id", "segment", "start_ms", "end_ms", "n_windows")
  }

  /** WAV parse down to raw 16-bit samples (interleaved) — shared by
    * [[decodeWav]]-style feature paths that need the sample stream. */
  private def parseWavSamples(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataStart = -1
    var dataLen = 0
    while (pos + 8 <= b.length) {
      val tag = new String(b, pos, 4, StandardCharsets.US_ASCII)
      val len = buf.getInt(pos + 4)
      if (len < 0 || pos.toLong + 8 + len > b.length) return None // long: hostile len overflows int
      tag match {
        case "fmt " =>
          if (len < 16 || buf.getShort(pos + 8) != 1) return None
          channels = buf.getShort(pos + 10) & 0xffff
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22) & 0xffff
        case "data" =>
          dataStart = pos + 8
          dataLen = len
        case _ =>
      }
      pos += 8 + len + (len & 1)
    }
    if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataStart < 0) return None
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = buf.getShort(dataStart + i * 2); i += 1 }
    Some((sampleRate, channels, out))
  }

  /** Frame sampling for video-like payloads: every nth chunk index. */
  def frameSample(media: Dataset[MediaRow], chunkBytes: Int, everyN: Int): DataFrame = {
    // fail fast at call time (sibling operators all validate): chunkBytes=0
    // is an ANSI divide-by-zero mid-job, everyN=0 a pmod-null that
    // silently empties the output
    require(chunkBytes > 0, s"chunkBytes must be positive: $chunkBytes")
    require(everyN > 0, s"everyN must be positive: $everyN")
    val df = media.toDF()
    val nChunks = ceil(length(col("media")).cast("double") / chunkBytes).cast("int")
    df.select(col("media_id"), col("mime"),
        explode(when(nChunks > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))).as("chunk"))
      .where(pmod(col("chunk"), lit(everyN)) === 0)
  }

  /** Fixture builder: wrap a text column as opaque binary media (UTF-8
    * bytes), so the pipeline runs on the driver-provided documents table. */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit("text/plain").as("mime"),
        encode(col(textCol), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** Fixture builder producing REAL media files deterministically from a
    * text column: even ids encode a 24-bpp BMP (dims derived from the UTF-8
    * byte length, pixels from the text bytes tiled), odd ids a 16-bit PCM
    * WAV (sample count from the byte length, samples from the text bytes).
    * Everything the decoder reports is therefore predictable from
    * (id, byte length) — the oracle recomputes it in SQL while the pixels/
    * samples exercise the full parse path. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        encode(col(textCol), "UTF-8").as("media"))
      .as[(Long, Array[Byte])]
      .map { case (id, rawBytes) =>
        // null text encodes to a null array — the one payload-null boundary
        // the other media entry points guard; empty media is the honest form
        val textBytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
        val len = textBytes.length
        def tb(i: Int): Int = if (len == 0) 0 else textBytes(i % len) & 0xff
        if (id % 2 == 0) {
          val width = 1 + len % 32
          // floorMod: Scala % keeps the dividend's sign, so a negative
          // even id (signed surrogate keys) would plan height <= 0 and
          // trip encodeBmp's require mid-job
          val height = 1 + math.floorMod(id, 16L).toInt
          val bmp = encodeBmp(width, height,
            (x, y) => (tb(x + y), tb(x + 2 * y + 1), tb(2 * x + y + 2)))
          MediaRow(id, "image/bmp", bmp)
        } else {
          val nFrames = 100 + len % 500
          val wav = encodeWav(nFrames, 8000, 1,
            (f, _) => (tb(f) - 128) / 128.0)
          MediaRow(id, "audio/wav", wav)
        }
      }
  }
}
