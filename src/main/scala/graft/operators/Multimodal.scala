package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2.3 #33).
  *
  * Pattern for image/audio/video at 100 TB: the payload travels as an opaque
  * `binary` column; decode / feature-extraction runs per-partition so each
  * task touches only its batch (bounded memory, no driver involvement), and
  * everything downstream of decode is ordinary typed columns.
  *
  * The decode is REAL for PNG and JPEG: container headers are parsed from the
  * raw bytes (pure-JVM byte arithmetic — IHDR for PNG, SOFn for JPEG — no
  * codec library needed for dimensions). Payloads that are not recognizable
  * media fall back to a deterministic stub (dimensions derived from byte
  * length), which keeps the pipeline oracle-checkable end-to-end on the text
  * corpus while MultimodalSpec exercises the real parsers on synthetic
  * image bytes.
  */
object Multimodal {

  /** An opaque media payload: id + raw bytes. */
  case class MediaBlob(doc_id: Long, data: Array[Byte])

  /** Decoded metadata: container format + dimensions (fallback dimensions
    * for unrecognized payloads).
    */
  case class MediaMeta(doc_id: Long, byte_len: Long, prefix_hex: String,
                       format: String, width: Int, height: Int)

  private def be32(d: Array[Byte], p: Int): Int =
    ((d(p) & 0xff) << 24) | ((d(p + 1) & 0xff) << 16) | ((d(p + 2) & 0xff) << 8) | (d(p + 3) & 0xff)

  private def be16(d: Array[Byte], p: Int): Int =
    ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)

  private val PngSignature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse (format, width, height) from a PNG IHDR or JPEG SOFn header.
    * Returns None for anything that is not a well-formed PNG/JPEG prefix —
    * the caller decides the fallback. Bounded work: O(header bytes), never
    * scans the payload body.
    */
  private[graft] def parseImageHeader(d: Array[Byte]): Option[(String, Int, Int)] = {
    if (d.length >= 24 && d.take(8).sameElements(PngSignature) &&
        d(12) == 'I' && d(13) == 'H' && d(14) == 'D' && d(15) == 'R') {
      Some(("png", be32(d, 16), be32(d, 20)))
    } else if (d.length >= 4 && (d(0) & 0xff) == 0xff && (d(1) & 0xff) == 0xd8) {
      // Walk JPEG marker segments to the first start-of-frame (SOF0..SOF15
      // minus DHT/JPG/DAC), which carries the frame dimensions.
      var p = 2
      while (p + 3 < d.length) {
        if ((d(p) & 0xff) != 0xff) return None
        val m = d(p + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (p + 8 >= d.length) return None
          return Some(("jpeg", be16(d, p + 7), be16(d, p + 5)))
        } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) {
          p += 2 // standalone marker, no length field
        } else {
          val segLen = be16(d, p + 2)
          if (segLen < 2) return None
          p += 2 + segLen
        }
      }
      None
    } else None
  }

  private def le32(d: Array[Byte], p: Int): Int =
    (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8) | ((d(p + 2) & 0xff) << 16) | ((d(p + 3) & 0xff) << 24)

  private def le16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8)

  /** Parse audio/animation container headers: RIFF/WAVE (walks chunks to
    * `fmt `) and GIF87a/89a (logical screen descriptor). For WAV the two
    * dimension slots carry (sample_rate, channels) — the audio analogue of
    * width×height in this typed-metadata shape. Bounded work like
    * [[parseImageHeader]]: header bytes only, never the payload body.
    */
  private[graft] def parseAvHeader(d: Array[Byte]): Option[(String, Int, Int)] = {
    def ascii(p: Int, s: String): Boolean =
      p + s.length <= d.length && s.indices.forall(i => (d(p + i) & 0xff) == s.charAt(i).toInt)
    if (d.length >= 10 && (ascii(0, "GIF87a") || ascii(0, "GIF89a"))) {
      Some(("gif", le16(d, 6), le16(d, 8)))
    } else if (d.length >= 12 && ascii(0, "RIFF") && ascii(8, "WAVE")) {
      // Chunk walk: [id(4), size(LE32), data(size, word-aligned)]*
      var p = 12
      while (p + 8 <= d.length) {
        val size = le32(d, p + 4)
        if (size < 0) return None
        if (ascii(p, "fmt ")) {
          if (size < 16 || p + 8 + 16 > d.length) return None
          val channels = le16(d, p + 10)
          val sampleRate = le32(d, p + 12)
          return Some(("wav", sampleRate, channels))
        }
        p += 8 + size + (size & 1)
      }
      None
    } else None
  }

  /** Decode one payload: real header parse for PNG/JPEG/GIF/WAV,
    * deterministic fallback ("unknown", fake dims from byte length)
    * otherwise.
    */
  def decode(blob: MediaBlob): MediaMeta = {
    val len = blob.data.length.toLong
    val prefix = blob.data.take(4).map(b => f"${b & 0xff}%02X").mkString
    parseImageHeader(blob.data).orElse(parseAvHeader(blob.data)) match {
      case Some((fmt, w, h)) => MediaMeta(blob.doc_id, len, prefix, fmt, w, h)
      case None =>
        MediaMeta(blob.doc_id, len, prefix, "unknown",
          width = (len % 640).toInt, height = (len % 480).toInt)
    }
  }

  /** Binary-column pipeline: text bytes stand in for a media payload. The
    * decode runs inside `mapPartitions` (one JVM call per batch of rows — the
    * Scala analogue of `mapInPandas` batch processing); this is the plug-in
    * point where a full codec (pixel decode, resampling, frame extraction)
    * would run, which is why it is deliberately NOT a Catalyst expression:
    * codecs need scratch buffers and library handles that amortize across a
    * partition, not per-row codegen.
    */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[MediaBlob] = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
    blobs.mapPartitions(_.map(decode)).toDF().orderBy("doc_id")
  }

  /** §2.3 #173 — RESIZE planning (the batch-shape half of an image-resize
    * stage): per payload, the aspect-preserving target dimensions inside a
    * `maxSide`×`maxSide` box (integer arithmetic on DECODED dims — real
    * for recognized containers, deterministic fallback otherwise), the
    * output pixel count, and the PIXEL-BUDGETED batch id — a running
    * pixel-sum cut every `pixelBudget`, which is exactly how a
    * pandas-UDF/mapPartitions resize kernel batches its GPU/BLAS calls
    * (uniform-row batches OOM on mixed image sizes; pixel budgets don't).
    * The pixel transform itself is the stub; everything Spark owns —
    * decode, plan, batching — is real and oracle-checked.
    */
  def resizePlan(spark: SparkSession, dir: String, maxSide: Int = 256,
      pixelBudget: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[MediaBlob] = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
    val metas = blobs.mapPartitions(_.map(decode)).toDF()
    val planned = metas
      .withColumn("w", greatest(col("width"), lit(1)))
      .withColumn("h", greatest(col("height"), lit(1)))
      .withColumn("long_side", greatest(col("w"), col("h")))
      .withColumn("out_w",
        when(col("long_side") <= maxSide, col("w"))
          .otherwise(greatest(
            expr(s"(CAST(w AS BIGINT) * $maxSide) div long_side"), lit(1L)))
          .cast("int"))
      .withColumn("out_h",
        when(col("long_side") <= maxSide, col("h"))
          .otherwise(greatest(
            expr(s"(CAST(h AS BIGINT) * $maxSide) div long_side"), lit(1L)))
          .cast("int"))
      .withColumn("out_pixels", (col("out_w") * col("out_h")).cast("long"))
      // Lazy-checkpoint: the prefix scan reads the decoded frame a few
      // times; decode once, not per pass.
      .localCheckpoint(false)
    // Batch id = how many full pixel budgets precede this row in doc
    // order — a corpus-sized running sum, so it runs as PrefixScan's
    // chunked distributed scan (an unpartitioned window would decode and
    // sum EVERY payload in one task).
    PrefixScan
      .runningSum(planned, "doc_id", Seq(col("doc_id")), "out_pixels",
        "pix_before", exclusive = true)
      .withColumn("batch_id", expr(s"pix_before div ${pixelBudget}L"))
      .select("doc_id", "format", "w", "h", "out_w", "out_h", "out_pixels", "batch_id")
      .orderBy("doc_id")
  }

  private val Window = org.apache.spark.sql.expressions.Window

  /** Per-payload byte-level features for [[byteFeatures]]. */
  case class ByteFeatures(doc_id: Long, n_bytes: Long, n_distinct_bytes: Int,
      mean_byte: Double, rms_byte: Double, peak_win_rms: Double)

  /** §2.3 #174 — FEATURE EXTRACTION over raw payload bytes: per blob, byte
    * count, distinct-byte alphabet size, mean and RMS byte value, and the
    * PEAK windowed RMS (64-byte windows — for PCM audio this IS short-time
    * energy; for any payload it is a cheap structure/entropy proxy). Runs
    * in `mapPartitions` with per-task scratch buffers (the codec batch
    * shape — a real extractor amortizes FFT plans/model handles the same
    * way); integer sums inside, one double division + sqrt at the edges,
    * so every feature is oracle-exact.
    */
  def byteFeatures(spark: SparkSession, dir: String, winBytes: Int = 64): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[MediaBlob] = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
    blobs.mapPartitions { it =>
      val seen = new Array[Boolean](256) // per-task scratch, reused per row
      it.map { b =>
        val d = b.data; val n = d.length
        java.util.Arrays.fill(seen, false)
        var sum = 0L; var sumSq = 0L
        var i = 0
        while (i < n) {
          val v = d(i) & 0xff
          sum += v; sumSq += v.toLong * v; seen(v) = true
          i += 1
        }
        var peak = 0.0; var off = 0
        while (off < n) {
          val end = math.min(off + winBytes, n)
          var s2 = 0L; var j = off
          while (j < end) { val v = d(j) & 0xff; s2 += v.toLong * v; j += 1 }
          val rms = math.sqrt(s2.toDouble / (end - off))
          if (rms > peak) peak = rms
          off += winBytes
        }
        ByteFeatures(b.doc_id, n.toLong, seen.count(identity),
          sum.toDouble / n, math.sqrt(sumSq.toDouble / n), peak)
      }
    }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("n_distinct_bytes"),
        (floor((col("mean_byte")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean_byte"),
        (floor((col("rms_byte")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("rms_byte"),
        (floor((col("peak_win_rms")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("peak_win_rms"))
      .orderBy("doc_id")
  }

  /** 64-bit difference hash (dHash) of a media payload — the perceptual
    * fingerprint behind content-level image dedup.
    *
    * REAL path: payloads `javax.imageio` can decode (PNG/JPEG/GIF/BMP in a
    * stock JVM) are resampled to a 9×8 luminance grid by NEAREST-NEIGHBOR
    * sampling — explicit integer pixel picks, because Graphics2D
    * interpolation is platform-variant while nearest sampling is
    * bit-deterministic — and bit (x,y) = 1 iff gray(x+1,y) > gray(x,y):
    * the classic horizontal-gradient fingerprint, invariant to uniform
    * brightness shifts and robust to small local edits (the property the
    * spec plants and asserts).
    *
    * FALLBACK path (the [[decode]] discipline): undecodable payloads get a
    * 62-bit SIMHASH over byte 4-grams — each shingle hashed by the same
    * two packed 31-bit polynomial hashes the token-SimHash oracle states,
    * bit k = majority of shingle-hash bit k. Byte-shingle SimHash is
    * insertion-robust (a position-sampled gradient was not: one inserted
    * byte shifts every later pick, so text near-dups never landed within
    * Hamming 3), content-sensitive (a byte-VALUE histogram was not: every
    * English doc shares the letter-frequency shape, so ~96% of all pairs
    * collided), and pure integer arithmetic — the text-corpus pipeline
    * stays DuckDB-oracle-checkable end-to-end while MultimodalSpec
    * exercises the real decoder on planted PNGs.
    */
  def dHash64(data: Array[Byte]): Long = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data)))
      catch { case _: Exception => None } // corrupt container → fallback
    img match {
      case Some(im) if im.getWidth > 0 && im.getHeight > 0 =>
        val g = Array.ofDim[Int](8, 9)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val px = ((x.toLong * im.getWidth) / 9).toInt
            val py = ((y.toLong * im.getHeight) / 8).toInt
            val rgb = im.getRGB(px, py)
            g(y)(x) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        var fp = 0L
        var bit = 0
        y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (g(y)(x + 1) > g(y)(x)) fp |= 1L << bit
            bit += 1
            x += 1
          }
          y += 1
        }
        fp
      case _ =>
        val n = data.length
        if (n < 4) 0L
        else {
          val counts = new Array[Int](62)
          val m1 = 2147483647L
          val m2 = 2147483629L
          var i = 0
          while (i + 3 < n) {
            var h1 = 7L
            var h2 = 11L
            var k = 0
            while (k < 4) {
              val v = data(i + k) & 0xff
              h1 = (h1 * 131 + v) % m1
              h2 = (h2 * 137 + v) % m2
              k += 1
            }
            val h = (h1 << 31) | h2
            var b = 0
            while (b < 62) {
              if (((h >> b) & 1L) == 1L) counts(b) += 1
              b += 1
            }
            i += 1
          }
          val nsh = n - 3
          var fp = 0L
          var b = 0
          while (b < 62) {
            if (2 * counts(b) > nsh) fp |= 1L << b
            b += 1
          }
          fp
        }
    }
  }

  /** §2.3 #359 — PERCEPTUAL IMAGE DEDUP over an arbitrary blob frame:
    * near-duplicate payload pairs at dHash Hamming distance ≤ `maxDist`.
    * Scale shape mirrors [[Dedup.nearDupSimhash]] exactly: identical
    * fingerprints collapse BEFORE banding, candidates come from the
    * 6-block / C(6,3)-composite-key pigeonhole equi-join (any pair within
    * Hamming 3 shares ≥ 1 key — full recall, never all-pairs), verified
    * pairs expand back through the fingerprint→doc membership, and
    * identical-fingerprint pairs emit directly at Hamming 0. The decode
    * runs per-partition (`ImageIO.setUseCache(false)`: no per-row temp
    * files), so a 100 TB image corpus streams through without driver or
    * all-pairs involvement.
    */
  def imageDedupFrom(blobs: Dataset[MediaBlob], maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      s"6-block/3-combo keys guarantee recall only to Hamming 3, got $maxDist")
    val spark = blobs.sparkSession
    import spark.implicits._
    val fp = blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-task, idempotent
      it.map(b => (b.doc_id, dHash64(b.data)))
    }.toDF("doc_id", "fp").localCheckpoint(true)
    val dfp = fp.select("fp").distinct()
    val keyed = dfp.select(col("fp"),
      explode(Dedup.simhashKeys(col("fp"))).as("k"))
    val cross = keyed.as("x")
      .join(keyed.as("y"), col("x.k") === col("y.k") && col("x.fp") < col("y.fp"))
      .select(col("x.fp").as("fa"), col("y.fp").as("fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= maxDist)
      .join(fp.select(col("fp").as("fa"), col("doc_id").as("da")), "fa")
      .join(fp.select(col("fp").as("fb"), col("doc_id").as("db")), "fb")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    val within = fp.as("x")
      .join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0).as("hamming"))
    cross.unionAll(within).orderBy("doc_a", "doc_b")
  }

  /** [[imageDedupFrom]] over the gate corpus (text bytes as payloads — all
    * take the deterministic byte-gradient fallback, which is what makes
    * the DuckDB oracle exact; the real decoder path is spec-planted).
    */
  def imageDedup(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    import spark.implicits._
    val blobs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
    imageDedupFrom(blobs, maxDist)
  }

  /** One sampled frame: position + content hash of the frame bytes. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_off: Int, frame_md5: String)

  /** §2.3 #72 — frame sampling over a binary "video" payload: the payload is
    * treated as fixed-size frames and every `every`-th full frame is emitted
    * with its offset and an MD5 of the frame bytes. This is the batch shape
    * of real video frame-sampling (ffmpeg seek + decode per selected frame):
    * per-partition iteration with a per-task reusable codec handle (here the
    * MessageDigest), output fanning out to multiple typed rows per input
    * blob — never materializing all frames of a partition at once. Text
    * bytes stand in for the codec-less sandbox; the digest IS real, so the
    * result is oracle-exact (ASCII text: byte slice == char slice).
    */
  def frameSample(spark: SparkSession, dir: String,
      frameBytes: Int = 64, every: Int = 2): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[MediaBlob] = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
    blobs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // amortized per task
      it.flatMap { b =>
        val nFrames = b.data.length / frameBytes
        (0 until nFrames by every).iterator.map { i =>
          val off = i * frameBytes
          md.reset()
          val h = md.digest(java.util.Arrays.copyOfRange(b.data, off, off + frameBytes))
            .map(x => f"${x & 0xff}%02x").mkString
          Frame(b.doc_id, i, off, h)
        }
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }
}
