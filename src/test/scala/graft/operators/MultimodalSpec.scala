package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdrLen = Array(0, 0, 0, 13)
    val ihdr = "IHDR".getBytes("US-ASCII").map(_.toInt)
    val dims = Array(w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff)
    (sig ++ ihdrLen ++ ihdr ++ dims ++ Array(8, 6, 0, 0, 0)).map(_.toByte)
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8)
    // APP0 segment before the SOF, as real encoders emit.
    val app0 = Array(0xff, 0xe0, 0x00, 0x10) ++ "JFIF".getBytes("US-ASCII").map(_.toInt) ++
      Array.fill(10)(0)
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 0x08,
      (h >>> 8) & 0xff, h & 0xff, (w >>> 8) & 0xff, w & 0xff, 0x03)
    (soi ++ app0 ++ sof0 ++ Array.fill(9)(0)).map(_.toByte)
  }

  test("PNG IHDR parse extracts real dimensions") {
    assert(Multimodal.parseImageHeader(pngBytes(640, 360)) == Some(("png", 640, 360)))
    assert(Multimodal.parseImageHeader(pngBytes(19, 70000)) == Some(("png", 19, 70000)))
  }

  test("JPEG SOF parse walks marker segments to the frame header") {
    assert(Multimodal.parseImageHeader(jpegBytes(1024, 768)) == Some(("jpeg", 1024, 768)))
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    ("GIF89a".getBytes("US-ASCII").map(_.toInt) ++
      Array(w & 0xff, w >>> 8, h & 0xff, h >>> 8) ++ Array(0xf7, 0, 0)).map(_.toByte)

  private def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    def le32(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, v >>> 24)
    def le16(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff)
    ("RIFF".getBytes("US-ASCII").map(_.toInt) ++ le32(36) ++
      "WAVE".getBytes("US-ASCII").map(_.toInt) ++
      // a JUNK chunk first, as real recorders emit, to exercise the walk
      "JUNK".getBytes("US-ASCII").map(_.toInt) ++ le32(4) ++ Array(0, 0, 0, 0) ++
      "fmt ".getBytes("US-ASCII").map(_.toInt) ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16)).map(_.toByte)
  }

  test("GIF logical screen descriptor parse extracts dimensions") {
    assert(Multimodal.parseAvHeader(gifBytes(320, 200)) == Some(("gif", 320, 200)))
    assert(Multimodal.decode(Multimodal.MediaBlob(1L, gifBytes(320, 200))).format == "gif")
  }

  test("WAV fmt-chunk walk skips leading chunks and reads rate and channels") {
    assert(Multimodal.parseAvHeader(wavBytes(44100, 2)) == Some(("wav", 44100, 2)))
    assert(Multimodal.parseAvHeader(wavBytes(16000, 1)) == Some(("wav", 16000, 1)))
    // Truncated RIFF (no fmt chunk) falls through to None.
    assert(Multimodal.parseAvHeader(wavBytes(44100, 2).take(20)).isEmpty)
  }

  test("non-media bytes fall back to the deterministic stub") {
    assert(Multimodal.parseImageHeader("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseImageHeader(Array[Byte]()).isEmpty)
    assert(Multimodal.parseImageHeader(Array[Byte](0x89.toByte, 0x50)).isEmpty)
    val meta = Multimodal.decode(Multimodal.MediaBlob(7L, "abcdef".getBytes("UTF-8")))
    assert(meta == Multimodal.MediaMeta(7L, 6L, "61626364", "unknown", 6, 6))
  }

  test("decodeMeta pipeline decodes real image payloads inside mapPartitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Seq((1L, "not an image"), (2L, "also text"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Multimodal.decodeMeta(spark, dir).collect()
    assert(rows.map(_.getAs[String]("format")).toSeq == Seq("unknown", "unknown"))
    // Direct Dataset path with real image bytes exercises the codec branch.
    val blobs = Seq(
      Multimodal.MediaBlob(1L, pngBytes(800, 600)),
      Multimodal.MediaBlob(2L, jpegBytes(320, 240)),
      Multimodal.MediaBlob(3L, "plain".getBytes("UTF-8"))).toDS()
    val decoded = blobs.mapPartitions(_.map(Multimodal.decode)).collect()
      .sortBy(_.doc_id).map(m => (m.format, m.width, m.height)).toSeq
    assert(decoded == Seq(("png", 800, 600), ("jpeg", 320, 240), ("unknown", 5, 5)))
  }

  test("resizePlan computes aspect-preserving targets and pixel-budget batches") {
    val rows = Multimodal.resizePlan(spark, sf, maxSide = 256,
      pixelBudget = 50000L).collect()
    var pixBefore = 0L
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("w"), r.getAs[Int]("h"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      val ls = math.max(w, h)
      if (ls <= 256) assert(ow == w && oh == h)
      else {
        assert(math.max(ow, oh) <= 256 && ow >= 1 && oh >= 1)
        assert(ow == math.max(w.toLong * 256 / ls, 1L).toInt)
        assert(oh == math.max(h.toLong * 256 / ls, 1L).toInt)
      }
      assert(r.getAs[Long]("out_pixels") == ow.toLong * oh)
      assert(r.getAs[Long]("batch_id") == pixBefore / 50000L)
      pixBefore += r.getAs[Long]("out_pixels")
    }
    // Real decode feeds the same plan arithmetic: a 4000x1000 PNG plans to
    // a 256-long-side target.
    val big = Multimodal.decode(Multimodal.MediaBlob(1L, pngBytes(4000, 1000)))
    assert((big.width, big.height) == ((4000, 1000)))
    val ls = math.max(big.width, big.height)
    assert(big.width.toLong * 256 / ls == 256L)
    assert(big.height.toLong * 256 / ls == 64L)
  }

  test("byteFeatures matches a local byte-level computation") {
    val rows = Multimodal.byteFeatures(spark, sf).collect()
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    assert(rows.length == texts.size)
    rows.take(50).foreach { r =>
      val d = texts(r.getAs[Long]("doc_id")).map(_ & 0xff)
      assert(r.getAs[Long]("n_bytes") == d.length)
      assert(r.getAs[Int]("n_distinct_bytes") == d.distinct.length)
      val mean = BigDecimal(d.map(_.toLong).sum.toDouble / d.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("mean_byte") - mean) < 1e-9)
      val peak = d.grouped(64).map { wBytes =>
        math.sqrt(wBytes.map(v => v.toLong * v).sum.toDouble / wBytes.length)
      }.max
      assert(math.abs(r.getAs[Double]("peak_win_rms") -
        BigDecimal(peak).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("frameSample emits every k-th full frame with the exact content digest") {
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"${x & 0xff}%02x").mkString
    val expected = texts.toSeq.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      (0 until bytes.length / 64 by 2).map { i =>
        (id, i, i * 64, md5hex(bytes.slice(i * 64, i * 64 + 64)))
      }
    }.sorted
    val got = Multimodal.frameSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).sorted.toSeq
    assert(got.nonEmpty && got == expected)
  }

  // ---- perceptual image dedup (dHash + pigeonhole banding) ------------

  /** A real PNG via javax.imageio: horizontal luminance ramp with an
    * optional uniform brightness shift and optional sparse pixel noise.
    */
  private def rampPng(w: Int, h: Int, shift: Int, noisy: Boolean,
      reversed: Boolean = false): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val ramp = if (reversed) 255 - x * 255 / w else x * 255 / w
      val n = if (noisy && (x * 31 + y * 17) % 89 == 0) 60 else 0
      val v = math.min(255, math.max(0, ramp + shift + n))
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("dHash on decoded PNGs: brightness-invariant, edit-tolerant, content-sensitive") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.dHash64(rampPng(64, 48, 0, noisy = false))
    val bright = Multimodal.dHash64(rampPng(64, 48, 40, noisy = false))
    val edited = Multimodal.dHash64(rampPng(64, 48, 0, noisy = true))
    val other = Multimodal.dHash64(rampPng(64, 48, 0, noisy = false, reversed = true))
    // uniform brightness never flips a gradient sign
    assert(ham(base, bright) == 0, s"brightness moved the hash: ${ham(base, bright)}")
    // sparse noise flips few bits; a reversed ramp flips (nearly) all
    assert(ham(base, edited) <= 3, s"near-dup too far: ${ham(base, edited)}")
    assert(ham(base, other) > 16, s"distinct images too close: ${ham(base, other)}")
    // corrupt container bytes fall back deterministically, no throw
    val broken = rampPng(64, 48, 0, noisy = false).take(40)
    assert(Multimodal.dHash64(broken) == Multimodal.dHash64(broken))
  }

  test("imageDedupFrom pairs planted near-duplicate PNGs via banding, not all-pairs") {
    import spark.implicits._
    val blobs = Seq(
      Multimodal.MediaBlob(1L, rampPng(64, 48, 0, noisy = false)),
      Multimodal.MediaBlob(2L, rampPng(64, 48, 40, noisy = false)), // brightness twin
      Multimodal.MediaBlob(3L, rampPng(64, 48, 0, noisy = true)),   // sparse edit
      Multimodal.MediaBlob(4L, rampPng(64, 48, 0, noisy = false, reversed = true)),
      Multimodal.MediaBlob(5L, "just some text payload, undecodable".getBytes("UTF-8")),
      Multimodal.MediaBlob(6L, "just some text payload, undecodable".getBytes("UTF-8")))
    val got = Multimodal.imageDedupFrom(blobs.toDS()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val pairs = got.map(p => (p._1, p._2)).toSet
    // the perceptual pairs among decodable images
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)), s"missing planted near-dups: $got")
    // identical undecodable payloads pair at Hamming 0 via the fallback
    assert(got.contains((5L, 6L, 0)), s"fallback exact pair missing: $got")
    // the reversed ramp pairs with nothing
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"false positive: $got")
    // brightness twin is an EXACT dHash match (within path, hamming 0)
    assert(got.contains((1L, 2L, 0)), s"brightness twin not hamming 0: $got")
  }
}
