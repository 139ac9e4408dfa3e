package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2.11 extension surface):
  * media as opaque `binary` columns with typed metadata, processed in
  * partition-streamed batches — the Scala/Tungsten analogue of an
  * Arrow-batched `mapInPandas` decode stage.
  *
  * Image media is decoded for real via JDK `ImageIO` (PNG/JPEG/BMP/GIF
  * readers ship with the JDK — no codec dependency): [[decodeImage]]
  * yields dimensions, band count, and per-channel means, and q56
  * oracle-verifies the full encode→decode→feature path (PNG is
  * lossless, so DuckDB recomputes the same features from the pixel
  * formula in closed form). PCM audio ([[decodeAudio]]), uncompressed
  * Y4M video ([[decodeVideo]]), and COMPRESSED Motion-JPEG video
  * ([[decodeMjpeg]] — RIFF/AVI walk + the JDK's real JPEG codec per
  * frame) all decode for real too; only inter-frame codecs
  * (H.264/VP9/AV1) remain behind the [[decodeMedia]] stub — no JDK
  * codec exists for them. Their CONTAINER metadata is served anyway:
  * [[parseMp4]] walks the ISO-BMFF `moov` box tree (duration, dims,
  * sample census — the most common real ask against a video column,
  * no codec needed, q352). Non-image fallback features come from a
  * deterministic byte-level fake ([[fakeFeatures]], q37) behind the
  * same schema/batching contract.
  *
  * Scale: `mapPartitions` streams one partition per task with O(batch)
  * memory; a decode stage at 100 TB is embarrassingly parallel and
  * this shape (no shuffle before or after, columnar scan in, typed
  * Dataset out) is the one you want.
  */
object Multimodal {
  // ImageIO's default stream cache is FILE-backed: without this,
  // every encode (ImageIO.write to a byte stream) and every decode
  // (createImageInputStream over in-memory bytes) round-trips a temp
  // file on disk — a create+write+read+delete syscall set PER IMAGE,
  // ~100K files per sf0.1 bench pass. All payloads here are in-memory
  // binary columns, so the memory-cached stream is strictly better.
  // JVM-global and idempotent; runs wherever this object first loads,
  // which includes each executor JVM (the decode closures call into
  // object methods).
  javax.imageio.ImageIO.setUseCache(false)

  private def r4(c: org.apache.spark.sql.Column) = graft.Num.r4(c)

  /** A media row: opaque bytes + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  /** Output contract of the (stubbed) decode/feature stage. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, byte_sum: Long,
                                 content_hash: String, feat_mean: Double)

  /** Batch size of the decode stage — mirrors an Arrow record-batch. */
  val DecodeBatchSize = 64

  /** STUB — compressed-video decode (H.264/VP9/AV1). No JDK codec
    * exists; images decode via [[decodeImage]], PCM audio via
    * [[decodeAudio]], and uncompressed Y4M video via [[decodeVideo]].
    */
  def decodeMedia(bytes: Array[Byte]): Nothing =
    throw new UnsupportedOperationException(
      "decodeMedia is a stub: compressed-video codec libraries are not " +
      "available in this environment; see decodeImage/decodeAudio/decodeVideo")

  /** Decoded-video features: stream geometry plus per-stream luma
    * stats over all frames. */
  final case class VideoFeatures(doc_id: Long, n_frames: Int, width: Int,
                                 height: Int, fps: Int, mean_luma: Double)

  /** Real (container-level) video decode: YUV4MPEG2 — the standard
    * uncompressed interchange format (`YUV4MPEG2 W.. H.. F..` header,
    * then `FRAME\n` + raw planar YUV per frame). No codec needed, so
    * the JDK parses it outright; compressed formats stay behind the
    * [[decodeMedia]] stub. Returns None on malformed headers or
    * truncated frames — same drop-don't-fail policy as the other
    * decoders.
    */
  /** Largest accepted frame edge — bounds a crafted header's memory
    * claim (16k × 16k C444 ≈ 800 MB/frame is already absurd for this
    * path) and keeps every size computation in exact range. */
  private val MaxVideoDim = 16384

  def decodeVideo(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Double)] = {
    val headerEnd = bytes.indexOf('\n'.toByte)
    if (headerEnd < 0) return None
    val header = new String(bytes, 0, headerEnd, "US-ASCII")
    if (!header.startsWith("YUV4MPEG2")) return None
    val params = header.split(" ").drop(1)
    def num(prefix: Char): Option[Int] =
      params.find(_.headOption.contains(prefix))
        .flatMap(p => scala.util.Try(p.tail.takeWhile(_.isDigit).toInt).toOption)
    // chroma subsampling → per-frame chroma bytes. Spec-legal odd
    // dimensions subsample to ceil(w/2) × ceil(h/2) planes, so compute
    // plane sizes per-axis instead of scaling total luma bytes (which
    // is only correct for even w/h). Absent C means C420 per the spec.
    val colorspace = params.find(_.startsWith("C")).map(_.tail).getOrElse("420")
    def chromaLen(w: Long, h: Long): Option[Long] = {
      val cw = (w + 1) / 2 // ceil(w/2)
      val ch = (h + 1) / 2
      if (colorspace.startsWith("420")) Some(2 * cw * ch) // U + V quarter planes
      else if (colorspace.startsWith("422")) Some(2 * cw * h)
      else if (colorspace.startsWith("444")) Some(2 * w * h)
      else if (colorspace.startsWith("mono")) Some(0L)
      else None
    }
    (num('W'), num('H'), num('F')) match {
      case (Some(w), Some(h), Some(fpsNum))
          if w > 0 && h > 0 && w <= MaxVideoDim && h <= MaxVideoDim &&
             chromaLen(w, h).isDefined =>
        // dims bounded above → all products fit comfortably in Long
        val lumaLen = w.toLong * h
        val frameLen = lumaLen + chromaLen(w, h).get
        val marker = "FRAME".getBytes("US-ASCII")
        var pos = (headerEnd + 1).toLong
        var frames = 0
        var lumaSum = 0L
        while (pos + marker.length <= bytes.length) {
          var ok = true
          var i = 0
          while (ok && i < marker.length) {
            if (bytes(pos.toInt + i) != marker(i)) ok = false
            i += 1
          }
          if (!ok) return None
          // per the spec a FRAME line may carry parameters up to '\n'
          var lineEnd = pos.toInt + marker.length
          while (lineEnd < bytes.length && bytes(lineEnd) != '\n'.toByte) lineEnd += 1
          if (lineEnd >= bytes.length || lineEnd + 1 + frameLen > bytes.length)
            return None
          val yStart = lineEnd + 1
          var p = 0L
          while (p < lumaLen) { // luma plane only
            lumaSum += bytes((yStart + p).toInt) & 0xff
            p += 1
          }
          frames += 1
          pos = yStart + frameLen
        }
        if (pos != bytes.length) None
        else Some((frames, w, h, fpsNum,
          if (frames == 0) 0.0 else lumaSum.toDouble / (frames * lumaLen)))
      case _ => None
    }
  }

  /** Deterministic synthetic Y4M clip: 4×4 C420, `2 + doc_id mod 3`
    * frames, luma(f, p) = (doc_id*17 + f*29 + p*13) mod 256, flat
    * chroma — closed-form for the oracle, mirror of [[syntheticPng]] /
    * [[syntheticWav]].
    */
  def syntheticY4m(docId: Long): Array[Byte] = {
    val (w, h) = (4, 4)
    val frames = 2 + (docId % 3).toInt
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    var f = 0
    while (f < frames) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      var p = 0
      while (p < w * h) {
        bos.write((((docId * 17 + f * 29 + p * 13) % 256)).toInt)
        p += 1
      }
      var c = 0
      while (c < w * h / 2) { bos.write(128); c += 1 } // flat U+V planes
      f += 1
    }
    bos.toByteArray
  }

  /** Video media table: one synthetic Y4M clip per document id. */
  def videoMedia(spark: SparkSession, d: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id").as[Long]
      // NO fan-out here (contrast imageMedia): this codec's synth+
      // decode is cheap enough that the added exchange + 32-task stage
      // cost more than the single-split serialization it removed
      // (measured: q58 0.8s -> 1.6s with the fan-out)
      .map(id => MediaRow(id, "video/x-yuv4mpeg", syntheticY4m(id)))
  }

  /** The video decode stage: partition-streamed, batched, real Y4M
    * parse; undecodable rows are dropped. */
  def decodeVideoRows(media: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          decodeVideo(m.content).map { case (n, w, h, fps, luma) =>
            VideoFeatures(m.doc_id, n, w, h, fps, luma)
          }
        }
      }
    }
  }

  /** Decoded-MJPEG features: container geometry plus per-stream luma
    * stats over all REAL JPEG-decoded frames. */
  final case class MjpegFeatures(doc_id: Long, n_frames: Int, width: Int,
                                 height: Int, mean_luma: Double)

  /** COMPRESSED-video decode, pure JDK: Motion-JPEG in an AVI (RIFF)
    * container — each `00dc` chunk is an independent JPEG frame, and
    * ImageIO ships a real JPEG codec, so this path upgrades the
    * former blanket [[decodeMedia]] stub to an actual compressed
    * format. Container walk: verify `RIFF…AVI `, iterate top-level
    * chunks to the `LIST movi` payload, iterate its `00dc` chunks
    * (word-aligned per RIFF), decode each via `ImageIO.read`. Frames
    * must agree on geometry (MJPEG streams do); luma is the ITU-R 601
    * integer weighting (299·R + 587·G + 114·B)/1000 over every pixel
    * of every frame. Returns None on a malformed container, an
    * undecodable frame, or inconsistent geometry — the same
    * drop-don't-fail policy as the other decoders. Inter-frame
    * codecs (H.264/VP9/AV1) remain behind [[decodeMedia]]: the JDK
    * has no codec for them, and MJPEG + animated GIF
    * ([[decodeGif]] — LZW, losslessly oracle-hashed) are the honest
    * boundary of dependency-free decode.
    */
  def decodeMjpeg(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    def fourcc(off: Int): String =
      if (off + 4 > bytes.length) "" else new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val riffEnd = math.min(8L + u32(4), bytes.length.toLong)
    // find the LIST whose list-type is 'movi'
    var pos = 12L
    var movi = -1L
    var moviEnd = -1L
    while (movi < 0 && pos + 8 <= riffEnd) {
      val id = fourcc(pos.toInt)
      val sz = u32(pos.toInt + 4)
      if (sz < 0) return None
      if (id == "LIST" && fourcc(pos.toInt + 8) == "movi") {
        movi = pos + 12
        moviEnd = math.min(pos + 8 + sz, riffEnd)
      }
      pos += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (movi < 0) return None
    var p = movi
    var frames = 0
    var w = -1
    var h = -1
    var lumaSum = 0L
    while (p + 8 <= moviEnd) {
      val id = fourcc(p.toInt)
      val sz = u32(p.toInt + 4)
      if (sz < 0 || p + 8 + sz > moviEnd) return None
      if (id == "00dc") {
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes, (p + 8).toInt, sz.toInt))
          catch { case _: Throwable => null }
        if (img == null) return None
        if (w < 0) { w = img.getWidth; h = img.getHeight }
        else if (w != img.getWidth || h != img.getHeight) return None
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            lumaSum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            x += 1
          }
          y += 1
        }
        frames += 1
      }
      p += 8 + sz + (sz & 1)
    }
    if (frames == 0) None
    else Some((frames, w, h, lumaSum.toDouble / (frames.toLong * w * h)))
  }

  /** Deterministic synthetic MJPEG-AVI clip: `2 + doc_id mod 3`
    * frames of an 8×8 gradient keyed by (doc_id, frame), each frame
    * REALLY JPEG-encoded by ImageIO, wrapped in a minimal RIFF/AVI
    * (`hdrl` with a standard 56-byte `avih`, then `LIST movi` of
    * `00dc` chunks). JPEG is lossy, so decoded luma is
    * codec-determined — this path is spec-verified (round-trip
    * determinism + geometry + corruption rejection), not
    * oracle-hashed, exactly like the format boundary says.
    */
  def syntheticMjpegAvi(docId: Long): Array[Byte] = {
    val (w, h) = (8, 8)
    val frames = 2 + (docId % 3).toInt
    val jpegs = (0 until frames).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < w * h) {
        val v = ((docId * 17 + f * 29 + p * 13) % 256).toInt
        img.setRGB(p % w, p / w, (v << 16) | (v << 8) | v)
        p += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    // standard 56-byte avih: µs/frame, rates zeroed, frame count, dims
    val avih = chunk("avih", le32(40000L) ++ le32(0) ++ le32(0) ++ le32(16) ++
      le32(frames) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
      Array.fill(16)(0.toByte))
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload
  }

  /** Synthetic ANIMATED GIF — a second real compressed codec beside
    * MJPEG, again pure JDK: multi-frame LZW through ImageIO's GIF
    * writer. Frames are 8-bit GRAYSCALE on the same deterministic
    * grid as the other media generators; gray needs at most 256
    * palette entries, so the GIF round-trip is LOSSLESS — unlike
    * JPEG, the decoded luma here is closed-form and oracle-hashable
    * (the q65 Y4M property, on a compressed container). */
  def syntheticGif(docId: Long): Array[Byte] = {
    val (w, h) = (8, 8)
    val frames = 2 + (docId % 3).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var p = 0
        while (p < w * h) {
          img.getRaster.setSample(p % w, p / w, 0,
            ((docId * 17 + f * 29 + p * 13) % 256).toInt)
          p += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** GIF media table: one synthetic animated clip per document id. */
  def gifMedia(spark: SparkSession, d: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id").as[Long]
      // the synthesize+decode stage below is compute-bound but its
      // input is the documents scan's ONE small split — without a
      // fan-out the whole media pipeline of this lane runs on one
      // core. Spread the 8-byte ids across the session width BEFORE
      // any content bytes exist (guide §8: move keys, not payloads);
      // deterministic under retries (sort-before-repartition is on,
      // content is a pure function of the id).
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .map(id => MediaRow(id, "image/gif", syntheticGif(id)))
  }

  /** Real multi-frame GIF decode via the JDK reader: every frame is
    * read independently (`reader.read(i)`), geometry must agree
    * across frames, luma is the ITU-R 601 integer weighting — which
    * on a gray palette is the gray value itself, exactly. None on
    * undecodable bytes or inconsistent geometry, the standard
    * drop-don't-fail policy. */
  def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          if (reader.getFormatName.toLowerCase != "gif") return None
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          var w = -1
          var h = -1
          var lumaSum = 0L
          var i = 0
          while (i < n) {
            val img = reader.read(i)
            if (img == null) return None
            if (img.getWidth > MaxImageDim ||
              img.getHeight > MaxImageDim) return None
            if (w < 0) { w = img.getWidth; h = img.getHeight }
            else if (w != img.getWidth || h != img.getHeight) return None
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                lumaSum += (299L * ((rgb >> 16) & 0xff) +
                  587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)) / 1000L
                x += 1
              }
              y += 1
            }
            i += 1
          }
          Some((n, w, h, lumaSum.toDouble / (n.toLong * w * h)))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case _: Throwable => None }
  }

  /** Decoded-GIF features row. */
  final case class GifFeatures(doc_id: Long, n_frames: Int, width: Int,
                               height: Int, mean_luma: Double)

  /** The GIF decode stage: partition-streamed, batched, real LZW
    * decode per clip; undecodable rows are dropped. */
  def decodeGifRows(media: Dataset[MediaRow]): Dataset[GifFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          decodeGif(m.content).map { case (n, w, h, luma) =>
            GifFeatures(m.doc_id, n, w, h, luma)
          }
        }
      }
    }
  }

  /** q320: animated-GIF encode→decode→feature round-trip — a REAL
    * compressed (LZW) multi-frame decode whose luma IS oracle-exact:
    * grayscale fits one 256-entry palette, so the codec round-trip is
    * lossless and the decoded mean luma equals the generator's pixel
    * formula in closed form — the full q65 contract on a genuinely
    * compressed container (where q263's JPEG could only pin
    * geometry). */
  def gifFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    decodeGifRows(gifMedia(spark, d))
      .toDF()
      .select($"doc_id", $"n_frames", $"width", $"height",
        r4($"mean_luma").as("mean_luma"))
      .orderBy($"doc_id")
  }

  /** MJPEG media table: one synthetic AVI clip per document id. */
  def mjpegMedia(spark: SparkSession, d: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id").as[Long]
      // the synthesize+decode stage below is compute-bound but its
      // input is the documents scan's ONE small split — without a
      // fan-out the whole media pipeline of this lane runs on one
      // core. Spread the 8-byte ids across the session width BEFORE
      // any content bytes exist (guide §8: move keys, not payloads);
      // deterministic under retries (sort-before-repartition is on,
      // content is a pure function of the id).
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .map(id => MediaRow(id, "video/x-msvideo", syntheticMjpegAvi(id)))
  }

  /** The MJPEG decode stage: partition-streamed, batched, real JPEG
    * decode per frame; undecodable rows are dropped. */
  def decodeMjpegRows(media: Dataset[MediaRow]): Dataset[MjpegFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          decodeMjpeg(m.content).map { case (n, w, h, luma) =>
            MjpegFeatures(m.doc_id, n, w, h, luma)
          }
        }
      }
    }
  }

  /** q263: MJPEG-AVI encode→decode→feature round-trip — a REAL
    * compressed-video decode (ImageIO JPEG) behind the same map-only
    * shape as q65. The emitted columns are the CODEC-INDEPENDENT
    * facts of the decoded stream — frame count and geometry, read
    * from the actually-decoded frames, whose closed forms the
    * generator fixes (frames = 2 + doc_id % 3 at 8×8) — so the query
    * is oracle-hashed like everything else. Decoded LUMA is
    * deliberately not emitted here: JPEG is lossy and the
    * reconstruction is codec-determined, so luma lives in
    * MultimodalSpec (round-trip approximation + corruption
    * rejection), not in the DuckDB compare. */
  def mjpegFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    decodeMjpegRows(mjpegMedia(spark, d))
      .toDF()
      .select($"doc_id", $"n_frames", $"width", $"height")
      .orderBy($"doc_id")
  }

  /** MP4 (ISO-BMFF) METADATA — the practical half of the
    * compressed-video gap: duration, dimensions and sample count come
    * from the `moov` box tree, which needs NO codec (ftyp/moov/mdat
    * atoms are plain big-endian size+fourcc framing; Bento4/mp4box do
    * exactly this walk). Frame DECODE of H.264/VP9/AV1 payloads
    * remains behind the loud [[decodeMedia]] stub — the JDK ships no
    * inter-frame codec.
    *
    * Walk: top-level `moov` → `mvhd` (timescale, duration),
    * `trak` → `tkhd` (width/height, 16.16 fixed point),
    * `trak` → `mdia` → `minf` → `stbl` → `stsz` (sample count + total
    * sample bytes); top-level `mdat` payload size. Every atom size is
    * bounds-checked against the buffer — a TRUNCATED container (size
    * field pointing past the end) returns None, never a partial
    * parse (MultimodalSpec pins this).
    */
  final case class Mp4Meta(doc_id: Long, width: Int, height: Int,
                           n_samples: Int, duration_ms: Long,
                           sample_bytes: Long, mdat_bytes: Long)

  def parseMp4(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Long, Long)] = {
    def u32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def fourcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    // children of the atom spanning [from, to): Seq of (type, bodyFrom,
    // bodyTo); None on any malformed/truncated size
    def children(from: Long, to: Long): Option[Seq[(String, Long, Long)]] = {
      val out = Seq.newBuilder[(String, Long, Long)]
      var pos = from
      while (pos < to) {
        if (pos + 8 > to) return None
        val sz = u32(pos.toInt)
        if (sz < 8 || pos + sz > to) return None // truncation guard
        out += ((fourcc(pos.toInt + 4), pos + 8, pos + sz))
        pos += sz
      }
      Some(out.result())
    }
    def find(cs: Seq[(String, Long, Long)], t: String): Option[(Long, Long)] =
      cs.collectFirst { case (`t`, f, e) => (f, e) }
    for {
      top <- children(0L, bytes.length.toLong)
      _ <- find(top, "ftyp")
      (moovF, moovE) <- find(top, "moov")
      (mdatF, mdatE) <- find(top, "mdat")
      moovKids <- children(moovF, moovE)
      (mvhdF, _) <- find(moovKids, "mvhd")
      (trakF, trakE) <- find(moovKids, "trak")
      trakKids <- children(trakF, trakE)
      (tkhdF, _) <- find(trakKids, "tkhd")
      (mdiaF, mdiaE) <- find(trakKids, "mdia")
      mdiaKids <- children(mdiaF, mdiaE)
      (minfF, minfE) <- find(mdiaKids, "minf")
      minfKids <- children(minfF, minfE)
      (stblF, stblE) <- find(minfKids, "stbl")
      stblKids <- children(stblF, stblE)
      (stszF, stszE) <- find(stblKids, "stsz")
      timescale = u32(mvhdF.toInt + 12)
      duration = u32(mvhdF.toInt + 16)
      if timescale > 0 && duration >= 0
      // tkhd v0 body: ver/flags 4, times 8, id 4, res 4, dur 4, res 8,
      // layer/alt/vol/res 8, matrix 36 -> width at +76, height at +80
      w = u32(tkhdF.toInt + 76) >> 16 // 16.16 fixed
      h = u32(tkhdF.toInt + 80) >> 16
      if w > 0 && h > 0
      // stsz v0: ver/flags 4, uniform sample_size 4, sample_count 4
      uniform = u32(stszF.toInt + 4)
      n = u32(stszF.toInt + 8)
      if n >= 0
      sampleBytes <- {
        if (uniform > 0) Some(uniform * n)
        else if (stszF + 12 + 4L * n > stszE) None // truncated size table
        else Some((0L until n).map(i => u32((stszF + 12 + 4 * i).toInt)).sum)
      }
    } yield (w.toInt, h.toInt, n.toInt,
      duration * 1000L / timescale, sampleBytes, mdatE - mdatF)
  }

  /** Deterministic synthetic MP4: `2 + doc_id mod 5` samples at 40
    * ticks each (timescale 600 = 15 fps), geometry
    * `(16 + 16·(doc_id mod 4)) × (16 + 16·(doc_id mod 3))`, sample i
    * sized `100 + (doc_id + i) mod 50` bytes of opaque payload in
    * `mdat` — every emitted feature is closed-form for the oracle.
    */
  def syntheticMp4(docId: Long): Array[Byte] = {
    val n = 2 + (docId % 5).toInt
    val (w, h) = (16 + 16 * (docId % 4).toInt, 16 + 16 * (docId % 3).toInt)
    val sizes = (0 until n).map(i => 100 + ((docId + i) % 50).toInt)
    val timescale = 600L
    val duration = 40L * n
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def atom(t: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ t.getBytes("US-ASCII") ++ body
    val identityMatrix = // 16.16 / 2.30 fixed, the spec's unity matrix
      be32(0x10000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x10000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000L)
    val mvhd = atom("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ be32(0x10000) ++
      Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++ identityMatrix ++
      new Array[Byte](24) ++ be32(2))
    val tkhd = atom("tkhd", be32(7) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(duration) ++ new Array[Byte](8) ++
      new Array[Byte](8) ++ identityMatrix ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val mdhd = atom("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ Array[Byte](0x55, 0xc4.toByte) ++
      new Array[Byte](2))
    val stsz = atom("stsz", be32(0) ++ be32(0) ++ be32(n.toLong) ++
      sizes.flatMap(s => be32(s.toLong)).toArray)
    val stbl = atom("stbl", stsz)
    val minf = atom("minf", stbl)
    val mdia = atom("mdia", mdhd ++ minf)
    val trak = atom("trak", tkhd ++ mdia)
    val moov = atom("moov", mvhd ++ trak)
    val ftyp = atom("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val payload = new Array[Byte](sizes.sum)
    var i = 0
    while (i < payload.length) { // opaque codec payload, deterministic
      payload(i) = ((docId * 31 + i * 7) % 256).toByte
      i += 1
    }
    ftyp ++ moov ++ atom("mdat", payload)
  }

  def mp4Media(spark: SparkSession, d: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id").as[Long]
      // NO fan-out here (contrast imageMedia): this codec's synth+
      // decode is cheap enough that the added exchange + 32-task stage
      // cost more than the single-split serialization it removed
      // (measured: q58 0.8s -> 1.6s with the fan-out)
      .map(id => MediaRow(id, "video/mp4", syntheticMp4(id)))
  }

  def parseMp4Rows(media: Dataset[MediaRow]): Dataset[Mp4Meta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          parseMp4(m.content).map { case (w, h, n, ms, sb, mb) =>
            Mp4Meta(m.doc_id, w, h, n, ms, sb, mb)
          }
        }
      }
    }
  }

  /** q352: MP4 encode→moov-walk→metadata round-trip — map-only, no
    * shuffle before the presentation sort, the q65/q263 shape with
    * metadata-only extraction standing in for the codec the JDK
    * doesn't have. */
  def mp4Metadata(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    parseMp4Rows(mp4Media(spark, d))
      .toDF()
      .select($"doc_id", $"width", $"height", $"n_samples",
        $"duration_ms", $"sample_bytes", $"mdat_bytes")
      .orderBy($"doc_id")
  }

  /** q65: Y4M encode→decode→feature round-trip — map-only, no shuffle
    * before the presentation sort. */
  def videoFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    decodeVideoRows(videoMedia(spark, d))
      .toDF()
      .select($"doc_id", $"n_frames", $"width", $"height", $"fps",
        r4($"mean_luma").as("mean_luma"))
      .orderBy($"doc_id")
  }

  /** Decoded-image features: dimensions, raster band count, and
    * per-channel means over the full pixel grid. */
  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                                 n_channels: Int, mean_r: Double,
                                 mean_g: Double, mean_b: Double)

  /** Real image decode via JDK ImageIO. Returns None for bytes no
    * registered reader accepts (corrupt or non-image payloads) —
    * callers drop such rows instead of failing the job, the behavior
    * a 100 TB crawl pipeline needs when a fraction of blobs is
    * always garbage.
    */
  /** Largest accepted image edge — mirror of [[MaxVideoDim]]. Checked
    * against the header-declared dimensions BEFORE `ImageIO.read`
    * allocates the raster: a tiny crafted PNG/GIF header can declare
    * e.g. 60000×60000 and the resulting allocation failure is an
    * `Error`, not an exception — it must be prevented, not caught.
    */
  private val MaxImageDim = 16384

  /** Header-validated ImageIO read; null for bytes no registered
    * reader accepts or whose declared dimensions fail the gate. */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w > MaxImageDim || h > MaxImageDim) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    }
    catch { case _: java.io.IOException => null case _: RuntimeException => null }

  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Double, Double, Double)] = {
    val img = readImage(bytes)
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some((w, h, img.getRaster.getNumBands,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
    }
  }

  /** Deterministic synthetic PNG for a doc id: dimensions and every
    * channel value are closed-form functions of (doc_id, x, y), so an
    * oracle can recompute the decoded features without any image
    * library — PNG is lossless, decode(encode(pixels)) == pixels.
    */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 5).toInt
    val h = 6 + (docId % 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((docId * 11 + x * 5 + y * 7) % 256).toInt
        val b = ((docId * 13 + x * 7 + y * 11) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image media table: one synthetic PNG per document id — real
    * encoded bytes in a binary column, the test environment's stand-in
    * for crawled images.
    */
  def imageMedia(spark: SparkSession, d: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id").as[Long]
      // the synthesize+decode stage below is compute-bound but its
      // input is the documents scan's ONE small split — without a
      // fan-out the whole media pipeline of this lane runs on one
      // core. Spread the 8-byte ids across the session width BEFORE
      // any content bytes exist (guide §8: move keys, not payloads);
      // deterministic under retries (sort-before-repartition is on,
      // content is a pure function of the id).
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .map(id => MediaRow(id, "image/png", syntheticPng(id)))
  }

  /** The image decode stage: partition-streamed, batched, real ImageIO
    * decode; undecodable rows are dropped.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          decodeImage(m.content).map { case (w, h, nc, mr, mg, mb) =>
            ImageFeatures(m.doc_id, w, h, nc, mr, mg, mb)
          }
        }
      }
    }
  }

  /** Decoded-audio features: stream shape plus amplitude stats over
    * the full sample sequence. */
  final case class AudioFeatures(doc_id: Long, n_samples: Int, sample_rate: Int,
                                 channels: Int, mean_amp: Double, rms: Double)

  /** Real audio decode via JDK javax.sound (WAV/AIFF/AU PCM readers
    * ship with the JDK): stream format + 16-bit sample reconstruction.
    * Returns None for bytes no installed reader accepts — corrupt
    * blobs are dropped, not fatal, same policy as [[decodeImage]].
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Int, Double, Double)] = {
    val stream =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (stream == null) None
    else
      try {
        val fmt = stream.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val data = stream.readAllBytes()
          val n = data.length / 2
          var sum = 0L; var sumSq = 0L
          var i = 0
          while (i < n) {
            val lo = data(2 * i) & 0xff
            val hi = data(2 * i + 1)
            val s = if (fmt.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort.toInt
                    else ((hi << 8) | lo).toShort.toInt
            sum += s; sumSq += s.toLong * s
            i += 1
          }
          val frames = n / fmt.getChannels
          Some((frames, fmt.getSampleRate.toInt, fmt.getChannels,
            if (n == 0) 0.0 else sum.toDouble / n,
            if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)))
        }
      } finally stream.close()
  }

  /** Deterministic synthetic 16-bit PCM mono WAV for a doc id — RIFF
    * container written by hand, sample k = ((doc_id*31 + k*17) mod
    * 4001) - 2000. PCM is lossless, so decode(encode(samples))
    * reproduces the formula exactly and the oracle recomputes features
    * in closed form (mirror of [[syntheticPng]]).
    */
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = 64 + (docId % 32).toInt
    val rate = 8000
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < n) {
      buf.putShort((((docId * 31 + k * 17) % 4001) - 2000).toShort)
      k += 1
    }
    buf.array()
  }

  /** Audio media table: one synthetic WAV per document id. */
  def audioMedia(spark: SparkSession, d: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id").as[Long]
      // NO fan-out here (contrast imageMedia): this codec's synth+
      // decode is cheap enough that the added exchange + 32-task stage
      // cost more than the single-split serialization it removed
      // (measured: q58 0.8s -> 1.6s with the fan-out)
      .map(id => MediaRow(id, "audio/wav", syntheticWav(id)))
  }

  /** The audio decode stage: partition-streamed, batched, real
    * javax.sound decode; undecodable rows are dropped. */
  def decodeAudioRows(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          decodeAudio(m.content).map { case (n, rate, ch, mean, rms) =>
            AudioFeatures(m.doc_id, n, rate, ch, mean, rms)
          }
        }
      }
    }
  }

  /** q58: WAV encode→decode→feature round-trip — map-only, no shuffle
    * before the presentation sort.
    */
  def audioFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    decodeAudioRows(audioMedia(spark, d))
      .toDF()
      .select($"doc_id", $"n_samples", $"sample_rate", $"channels",
        r4($"mean_amp").as("mean_amp"), r4($"rms").as("rms"))
      .orderBy($"doc_id")
  }

  /** q56: encode→decode→feature round-trip over real PNG bytes —
    * map-only, no shuffle before the presentation sort.
    */
  def imageFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    decodeImages(imageMedia(spark, d))
      .toDF()
      .select($"doc_id", $"width", $"height", $"n_channels",
        r4($"mean_r").as("mean_r"), r4($"mean_g").as("mean_g"),
        r4($"mean_b").as("mean_b"))
      .orderBy($"doc_id")
  }

  /** Deterministic fake standing in for the decoder: byte-level stats
    * and a content hash.
    */
  def fakeFeatures(m: MediaRow): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < m.content.length) { sum += (m.content(i) & 0xff); i += 1 }
    val digest = MessageDigest.getInstance("SHA-256").digest(m.content)
    val hex = digest.map("%02x".format(_)).mkString
    MediaFeatures(m.doc_id, m.content.length, sum, hex,
      if (m.content.isEmpty) 0.0 else sum.toDouble / m.content.length)
  }

  /** Media table derived from `documents` (text bytes as the opaque
    * payload — the test environment's stand-in for image bytes).
    */
  def mediaFromDocuments(spark: SparkSession, d: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", lit("text/plain").as("media_type"),
              $"text".cast("binary").as("content"))
      .as[MediaRow]
  }

  /** The decode/feature-extract stage: partition-streamed, batched like
    * an Arrow UDF, stub-decoded.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // A real decoder would process `batch` as one columnar block
        // (e.g. hand it to a native library); the fake is per-row.
        batch.iterator.map(fakeFeatures)
      }
    }
  }

  /** q37: the full multimodal pipeline — binary ingestion, batched
    * decode stub, typed features — with deterministic output.
    */
  def mediaFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, d))
      .toDF()
      .select($"doc_id", $"n_bytes", $"byte_sum", $"content_hash",
        (round($"feat_mean" * lit(10000.0), 0) / lit(10000.0)).as("feat_mean"))
      .orderBy($"doc_id")
  }

  // ---------- audio fingerprint dedup ----------

  /** Per-frame energy signature of a decoded PCM stream: samples split
    * into [[AudioFingerprintFrames]] equal time slices (frame of
    * sample k is (k·F) div n — integer math an oracle can mirror),
    * energy = Σ s² per slice, exact in Long. The robust-feature
    * fingerprint audio dedup groups on: resistant to container
    * re-muxing and metadata churn, which byte hashes (q25) are not.
    * None for undecodable or non-16-bit payloads.
    */
  val AudioFingerprintFrames = 8

  def audioFrameEnergies(bytes: Array[Byte]): Option[Array[Long]] = {
    val stream =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (stream == null) None
    else
      try {
        val fmt = stream.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val data = stream.readAllBytes()
          val n = data.length / 2
          if (n == 0) None
          else {
            val e = new Array[Long](AudioFingerprintFrames)
            var i = 0
            while (i < n) {
              val lo = data(2 * i) & 0xff
              val hi = data(2 * i + 1)
              val s = if (fmt.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort.toInt
                      else ((hi << 8) | lo).toShort.toInt
              e((i * AudioFingerprintFrames) / n) += s.toLong * s
              i += 1
            }
            Some(e)
          }
        }
      } finally stream.close()
  }

  /** Audio dedup groups by frame-energy fingerprint: every document
    * with the rep (smallest doc id) of its fingerprint group and the
    * group size. Map-only decode (the same batched drop-on-corrupt
    * stage as every media path), then ONE window over the fingerprint
    * key — groups are near-singleton by construction, so the
    * partition-by-8-energies window never funnels.
    */
  def audioDupGroups(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    val eCols = (0 until AudioFingerprintFrames).map(i => s"e$i")
    val energies = media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap(m =>
          audioFrameEnergies(m.content).map(e => (m.doc_id, e)))
      }
    }.toDF("doc_id", "e")
      .select($"doc_id" +: (0 until AudioFingerprintFrames)
        .map(i => element_at($"e", i + 1).as(s"e$i")): _*)
    val byFp = Window.partitionBy(eCols.map(col): _*)
    energies
      .select($"doc_id",
        min($"doc_id").over(byFp).as("rep_doc"),
        count(lit(1)).over(byFp).as("n_members"))
      .orderBy($"doc_id")
  }

  // ---------- perceptual near-dup (dHash) ----------

  /** 64-bit difference hash of decoded pixels: nearest-neighbor sample
    * onto a 9×8 luma grid (integer Rec.601 weights — deterministic
    * across JVMs), one bit per horizontal gradient sign. Crops,
    * re-encodes, and small pixel noise move few bits, so near-dup
    * detection is a small-Hamming-radius search. None for undecodable
    * bytes, like every decode here.
    */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    val img = readImage(bytes)
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val g = Array.ofDim[Int](8, 9)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val px = if (w == 1) 0 else gx * (w - 1) / 8
          val py = if (h == 1) 0 else gy * (h - 1) / 7
          val rgb = img.getRGB(px, py)
          g(gy)(gx) = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
          gx += 1
        }
        gy += 1
      }
      var bits = 0L; var i = 0
      while (i < 64) {
        if (g(i / 8)(i % 8 + 1) > g(i / 8)(i % 8)) bits |= 1L << i
        i += 1
      }
      Some(bits)
    }
  }

  final case class ImageHash(doc_id: Long, dhash: Long)
  final case class ImagePair(doc_a: Long, doc_b: Long, hamming: Int)

  /** Per-image dHash — the same batched, drop-on-corrupt decode stage
    * shape as [[decodeImages]]. */
  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.flatMap(m => dHash(m.content).map(ImageHash(m.doc_id, _)))
      }
    }
  }

  /** Perceptual near-dup pairs at Hamming radius `maxHamming` — the
    * image member of the dedup family, banded exactly like the text
    * MinHash LSH: the 64-bit dHash splits into 4 disjoint 16-bit
    * bands, and by pigeonhole any pair within Hamming distance 3 (< 4
    * bands) collides on at least one UNCHANGED band, so candidates
    * come from 4 equi-joins on (band_idx, band_key) — never an
    * all-pairs scan — and the exact popcount verify keeps pairs
    * within the radius. Bucketed, bounded, 100 TB-shaped.
    */
  def imageNearDupPairs(media: Dataset[MediaRow],
                        maxHamming: Int = 3): Dataset[ImagePair] = {
    import media.sparkSession.implicits._
    // both sides of the band self-join consume the hashes: persist the
    // (doc_id, dhash) frame — two plain longs per row, cheap in the
    // columnar cache — so the PNG decode stage runs once, not twice
    val hashes = imageHashes(media).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.Derived.adopt(hashes)
    val banded = hashes.select($"doc_id", $"dhash",
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_idx"),
          shiftright($"dhash", b * 16).bitwiseAND(lit(0xffffL)).as("band_key"))): _*)).as("b"))
      .select($"doc_id", $"dhash", $"b.band_idx", $"b.band_key")
    banded.toDF("doc_a", "ha", "band_idx", "band_key")
      .join(banded.toDF("doc_b", "hb", "band_idx", "band_key"),
        Seq("band_idx", "band_key"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        bit_count($"ha".bitwiseXOR($"hb")).cast("int").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
      .as[ImagePair]
  }
}
