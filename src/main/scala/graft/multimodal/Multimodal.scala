package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support (SURVEY §2.11 X4): media travels as an opaque
  * `BinaryType` payload with typed metadata, and per-item decode/featurize
  * runs as a partition-parallel map — the Scala analog of a Pandas-UDF
  * `mapInPandas` stage: one iterator pass per partition, no driver
  * materialization, output schema declared up front.
  *
  * DECODE IS A STUB: this container has no image/audio codecs, so
  * `decodeStub` derives deterministic fake features from the raw bytes.
  * The Spark-side contract — schema, batching, partitioning, encoder
  * signatures — is the real, tested part; swap `decodeStub` for a codec
  * call in production.
  */
object Multimodal {

  /** Typed rows crossing the mapPartitions boundary. */
  final case class MediaItem(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, features: Array[Float], n_bytes: Int)

  /** Build an opaque media table from the documents fixture: the text bytes
    * stand in for an encoded image/audio blob; metadata rides alongside as a
    * typed struct. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("blob").as("kind"),
      col("text").cast(BinaryType).as("payload"),
      struct(col("n_chars").as("len"), col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  /** The one byte-bucket counting kernel: shared by the stub decoder and
    * [[byteBuckets]] so the normalized features and the oracle-gated integer
    * counts (q117) can never desynchronize. */
  private def byteHist(bytes: Array[Byte], dims: Int): Array[Long] = {
    val hist = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) {
      hist(((bytes(i) & 0xff) * dims) / 256) += 1L
      i += 1
    }
    hist
  }

  /** STUB decoder: a real implementation would hand `bytes` to a codec;
    * this one normalizes [[byteHist]] so the pipeline is deterministic and
    * testable end-to-end. */
  private[multimodal] def decodeStub(bytes: Array[Byte], dims: Int): Array[Float] = {
    val n = math.max(bytes.length, 1).toFloat
    byteHist(bytes, dims).map(_ / n)
  }

  /** Feature extraction as a partition-parallel typed map. The iterator →
    * iterator shape is the scalable contract: constant memory per partition,
    * codecs initialized once per partition (not per row). */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val items: Dataset[MediaItem] = media
      .select("media_id", "kind", "payload").as(Encoders.product[MediaItem])
    items.mapPartitions { it =>
      // per-partition setup (codec init would go here)
      it.map(m => MediaFeatures(m.media_id, decodeStub(m.payload, dims), m.payload.length))
    }(Encoders.product[MediaFeatures]).toDF()
  }

  /** "Frame sampling" stub: split the payload into fixed-size chunks and keep
    * every `stride`-th — the plumbing shape of video frame extraction
    * (explodes into one row per kept frame). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    val items = media.select("media_id", "kind", "payload").as(Encoders.product[MediaItem])
    items.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => (m.media_id, i, chunk) }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY))
      .toDF("media_id", "frame_no", "frame")
  }

  /** Typed rows for [[frameEnergy]]. */
  final case class FrameEnergy(media_id: Long, frame_no: Int, energy: Long)

  /** Per-frame integer energy (Σ byte², the audio RMS-energy analog on
    * opaque payloads) through the partition-parallel iterator contract —
    * the feature-extraction stage that follows [[sampleFrames]] in a
    * waveform pipeline. Exact integers over the raw bytes, so a byte-level
    * oracle replays it (q213). */
  def frameEnergy(frames: DataFrame): DataFrame = {
    val items = frames.select("media_id", "frame_no", "frame")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY))
    items.mapPartitions { it =>
      it.map { case (id, no, b) =>
        var e = 0L
        var i = 0
        while (i < b.length) { val v = b(i) & 0xff; e += v.toLong * v; i += 1 }
        FrameEnergy(id, no, e)
      }
    }(Encoders.product[FrameEnergy]).toDF()
  }

  /** Typed rows for [[byteBuckets]]. */
  final case class ByteBucket(media_id: Long, bucket: Int, n: Long)

  /** Integer byte-value bucket counts per media item, through the same
    * partition-parallel iterator contract as [[extractFeatures]] — the
    * exact-arithmetic twin of `decodeStub`'s normalized histogram. Because
    * the counts are integers over the payload's raw bytes, a byte-level
    * oracle can replay them exactly (q117), which puts the decode path's
    * CONTENT — not just its length arithmetic (q100) — under the
    * cross-engine hash gate. */
  def byteBuckets(media: DataFrame, dims: Int = 8): DataFrame = {
    val items = media.select("media_id", "kind", "payload")
      .as(Encoders.product[MediaItem])
    items.mapPartitions { it =>
      it.flatMap { m =>
        byteHist(m.payload, dims).zipWithIndex.collect {
          case (n, bkt) if n > 0 => ByteBucket(m.media_id, bkt, n)
        }
      }
    }(Encoders.product[ByteBucket]).toDF()
  }

  /** Typed rows for the PPM decode path. */
  final case class PpmStats(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Encode each document's bytes as a REAL image: a binary Netpbm P6 (PPM)
    * — `"P6\n<w> <h>\n255\n"` header + w·h·3 raw RGB bytes (public format,
    * Netpbm spec). Width is fixed at 4; height grows with the payload
    * (⌈len/12⌉ pixels-rows, min 1); the raster is the text bytes zero-padded
    * to w·h·3. This gives the decode path an honest codec target without
    * image libraries: the bytes ARE a valid P6 file any viewer would open. */
  def ppmFromDocuments(docs: DataFrame, width: Int = 4): DataFrame = {
    val items = docs.select(col("doc_id").as("media_id"), lit("ppm").as("kind"),
        col("text").cast(BinaryType).as("payload"))
      .as(Encoders.product[MediaItem])
    items.map { m =>
      val h = math.max(1, (m.payload.length + width * 3 - 1) / (width * 3))
      val header = s"P6\n$width $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + width * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(m.payload, 0, out, header.length, m.payload.length)
      MediaItem(m.media_id, "ppm", out)
    }(Encoders.product[MediaItem]).toDF()
  }

  /** A real P6 parser: magic, whitespace/comment-tolerant header ints
    * (width, height, maxval), single whitespace, then the raster. Returns
    * null on malformed input (quarantine-style, never throws on data). */
  /** Header parse shared by [[parsePpm]] and [[resizePpm]]: returns
    * (width, height, raster offset) or null on malformed input. */
  private[multimodal] def parsePpmHeader(bytes: Array[Byte]): Array[Int] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return null
    var pos = 2
    def skipWs(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0; var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return null
    pos += 1 // exactly one whitespace byte separates header and raster
    if (pos + w * h * 3 > bytes.length) return null
    Array(w, h, pos)
  }

  private[multimodal] def parsePpm(bytes: Array[Byte]): PpmStats = {
    val hdr = parsePpmHeader(bytes)
    if (hdr == null) return null
    val Array(w, h, pos) = hdr
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = pos
    val end = pos + w * h * 3
    while (i < end) {
      sr += bytes(i) & 0xff
      sg += bytes(i + 1) & 0xff
      sb += bytes(i + 2) & 0xff
      i += 3
    }
    PpmStats(0L, w, h, sr, sg, sb)
  }

  /** Decode P6 payloads to integer per-channel pixel sums through the same
    * partition-parallel iterator contract as [[extractFeatures]] — but with
    * a REAL decoder ([[parsePpm]]) and exact integer outputs, so a byte-level
    * oracle can replay the whole encode→decode→aggregate path (q37).
    * Malformed payloads are dropped (the quarantine contract of the
    * sources layer, applied to media). */
  def decodePpm(media: DataFrame): DataFrame = {
    val items = media.select("media_id", "kind", "payload")
      .as(Encoders.product[MediaItem])
    items.mapPartitions { it =>
      it.flatMap { m =>
        parsePpm(m.payload) match {
          case null => Iterator.empty
          case s => Iterator.single(s.copy(media_id = m.media_id))
        }
      }
    }(Encoders.product[PpmStats]).toDF()
  }

  /** "Resize" stub: truncate or zero-pad the payload to `targetBytes` —
    * the shape of an image resize (fixed-size output per row). For the
    * REAL codec-level transform see [[resizePpm]]. */
  def resizePayload(media: DataFrame, targetBytes: Int): DataFrame = {
    val items = media.select("media_id", "kind", "payload").as(Encoders.product[MediaItem])
    items.map { m =>
      val out = java.util.Arrays.copyOf(m.payload, targetBytes)
      MediaItem(m.media_id, m.kind, out)
    }(Encoders.product[MediaItem]).toDF()
  }

  private[multimodal] case class MediaHash(media_id: Long, dhash: Long)

  /** 63-bit difference hash (dHash) over a decoded P6 — the perceptual
    * fingerprint of image dedup pipelines (row-wise brightness gradient
    * signs; robust to small pixel perturbations, unlike a byte hash):
    * gray(x,y) = (r+g+b) div 3 over the raster, bit y·(w−1)+x =
    * [gray(x+1,y) > gray(x,y)], bits capped at 63 so the hash never touches
    * the int64 sign bit (the q159 63-bit discipline — a 64th bit would
    * overflow differently across engines). Chain after [[resizePpm]] to a
    * fixed 9×8 grid for the standard 64-cell/63-bit dHash. Exact integer
    * arithmetic end to end, so a byte-level oracle replays
    * encode → resize → gray → sign bits from the original payload.
    * Malformed payloads are dropped (the quarantine contract). */
  def dHash63(media: DataFrame): DataFrame = {
    val items = media.select("media_id", "kind", "payload")
      .as(Encoders.product[MediaItem])
    items.mapPartitions { it =>
      it.flatMap { m =>
        parsePpmHeader(m.payload) match {
          case null => Iterator.empty
          case hdr =>
            val w = hdr(0); val h = hdr(1); val off = hdr(2)
            def gray(x: Int, y: Int): Int = {
              val b = off + 3 * (y * w + x)
              ((m.payload(b) & 0xff) + (m.payload(b + 1) & 0xff) +
                (m.payload(b + 2) & 0xff)) / 3
            }
            var bits = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w - 1) {
                val idx = y * (w - 1) + x
                if (idx < 63 && gray(x + 1, y) > gray(x, y))
                  bits |= 1L << idx
                x += 1
              }
              y += 1
            }
            Iterator.single(MediaHash(m.media_id, bits))
        }
      }
    }(Encoders.product[MediaHash]).toDF()
  }

  /** REAL nearest-neighbor P6 resize — decode, sample, re-encode, through
    * the same partition-parallel iterator contract as [[decodePpm]]: each
    * target pixel (ty, tx) samples source pixel (ty·h div th, tx·w div tw)
    * — the standard floor-rule NN kernel, exact integer arithmetic so a
    * byte-level oracle can replay the sampling from the original payload
    * (q208). The output is itself a valid P6 any viewer opens, so resize
    * chains compose with [[decodePpm]] and with further resizes.
    * Malformed payloads are dropped (the quarantine contract). */
  def resizePpm(media: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw > 0 && th > 0, "target dimensions must be positive")
    val items = media.select("media_id", "kind", "payload")
      .as(Encoders.product[MediaItem])
    items.mapPartitions { it =>
      it.flatMap { m =>
        parsePpmHeader(m.payload) match {
          case null => Iterator.empty
          case hdr =>
            val w = hdr(0); val h = hdr(1); val off = hdr(2)
            val header = s"P6\n$tw $th\n255\n".getBytes("US-ASCII")
            val out = new Array[Byte](header.length + tw * th * 3)
            System.arraycopy(header, 0, out, 0, header.length)
            var o = header.length
            var ty = 0
            while (ty < th) {
              val sy = ty * h / th
              var tx = 0
              while (tx < tw) {
                val sx = tx * w / tw
                val base = off + 3 * (sy * w + sx)
                out(o) = m.payload(base)
                out(o + 1) = m.payload(base + 1)
                out(o + 2) = m.payload(base + 2)
                o += 3; tx += 1
              }
              ty += 1
            }
            Iterator.single(MediaItem(m.media_id, "ppm", out))
        }
      }
    }(Encoders.product[MediaItem]).toDF()
  }
}
