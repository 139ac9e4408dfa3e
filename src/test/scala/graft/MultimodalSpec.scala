package graft

import graft.ext.Multimodal

/** Real ImageIO decode path: PNG round-trip reproduces the exact pixel
  * formula, corrupt payloads are dropped (not fatal), and the q56
  * pipeline keeps every decodable row.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeImage reproduces the synthetic pixel formula exactly") {
    val id = 42L
    val Some((w, h, nc, mr, mg, mb)) =
      Multimodal.decodeImage(Multimodal.syntheticPng(id))
    assert(w == 8 + (id % 5).toInt && h == 6 + (id % 4).toInt)
    assert(nc == 3)
    def mean(a: Long, bx: Long, by: Long): Double = {
      val vals = for (y <- 0 until h; x <- 0 until w)
        yield (id * a + x * bx + y * by) % 256
      vals.sum.toDouble / (w * h)
    }
    assert(mr == mean(7, 3, 5))
    assert(mg == mean(11, 5, 7))
    assert(mb == mean(13, 7, 11))
  }

  test("corrupt bytes are dropped, not fatal") {
    assert(Multimodal.decodeImage("definitely not a png".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    // a PNG header with truncated body must not crash the stage either
    val truncated = Multimodal.syntheticPng(1L).take(20)
    assert(Multimodal.decodeImage(truncated).isEmpty)

    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", Multimodal.syntheticPng(1L)),
      Multimodal.MediaRow(2L, "image/png", "garbage".getBytes),
      Multimodal.MediaRow(3L, "image/png", Multimodal.syntheticPng(3L)))
    val out = Multimodal.decodeImages(spark.createDataset(rows)).collect()
    assert(out.map(_.doc_id).sorted.toSeq == Seq(1L, 3L))
  }

  test("crafted huge image headers are rejected before raster allocation") {
    // take a real PNG and rewrite its IHDR to claim 60000×60000 (with a
    // valid chunk CRC, so the reader trusts the header): the guard must
    // reject it from the header alone — ImageIO.read would attempt a
    // multi-GB raster allocation, which surfaces as an uncatchable-by-
    // policy OutOfMemoryError, not an IOException
    val png = Multimodal.syntheticPng(1L)
    def be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // PNG layout: 8-byte sig, 4-byte len, "IHDR" at 12, width at 16,
    // height at 20, CRC over bytes 12..28 stored at 29
    System.arraycopy(be(60000), 0, png, 16, 4)
    System.arraycopy(be(60000), 0, png, 20, 4)
    val crc = new java.util.zip.CRC32()
    crc.update(png, 12, 17)
    System.arraycopy(be(crc.getValue.toInt), 0, png, 29, 4)
    assert(Multimodal.decodeImage(png).isEmpty)
  }

  test("q56 pipeline decodes every document's image") {
    val d = "/root/testdata/sf0.001"
    val n = graft.sources.Tables.documents(spark, d).count()
    assert(Multimodal.imageFeatures(spark, d).count() == n)
  }

  test("decodeAudio reproduces the synthetic PCM formula exactly") {
    val id = 7L
    val Some((n, rate, ch, mean, rms)) =
      Multimodal.decodeAudio(Multimodal.syntheticWav(id))
    assert(n == 64 + (id % 32).toInt && rate == 8000 && ch == 1)
    val amps = (0 until n).map(k => ((id * 31 + k * 17) % 4001 - 2000).toInt)
    assert(mean == amps.sum.toDouble / n)
    assert(rms == math.sqrt(amps.map(a => a.toLong * a).sum.toDouble / n))
  }

  test("corrupt audio bytes are dropped, not fatal") {
    assert(Multimodal.decodeAudio("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(Multimodal.syntheticWav(1L).take(10)).isEmpty)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio/wav", Multimodal.syntheticWav(1L)),
      Multimodal.MediaRow(2L, "audio/wav", "garbage".getBytes))
    val out = Multimodal.decodeAudioRows(spark.createDataset(rows)).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
  }

  test("q58 pipeline decodes every document's audio") {
    val d = "/root/testdata/sf0.001"
    val n = graft.sources.Tables.documents(spark, d).count()
    assert(Multimodal.audioFeatures(spark, d).count() == n)
  }

  test("decodeVideo reproduces the synthetic Y4M formula exactly") {
    val id = 11L
    val Some((frames, w, h, fps, luma)) =
      Multimodal.decodeVideo(Multimodal.syntheticY4m(id))
    assert(frames == 2 + (id % 3).toInt && w == 4 && h == 4 && fps == 25)
    val lumas = for (f <- 0 until frames; p <- 0 until 16)
      yield (id * 17 + f * 29 + p * 13) % 256
    assert(luma == lumas.sum.toDouble / lumas.length)
  }

  test("parseMp4 reproduces the synthetic container's closed forms " +
    "and rejects truncation at every box depth") {
    val id = 13L
    val Some((w, h, n, ms, sb, mb)) =
      Multimodal.parseMp4(Multimodal.syntheticMp4(id))
    assert(w == 16 + 16 * (id % 4).toInt && h == 16 + 16 * (id % 3).toInt)
    assert(n == 2 + (id % 5).toInt)
    assert(ms == 40L * n * 1000L / 600L)
    val sizes = (0 until n).map(i => 100L + (id + i) % 50L)
    assert(sb == sizes.sum && mb == sizes.sum)
    // truncation at ANY point must yield None, never a partial parse
    // (atom sizes point past the buffer end somewhere at every depth)
    val full = Multimodal.syntheticMp4(id)
    for (cut <- Seq(3, 10, 40, 100, 180, full.length - 1))
      assert(Multimodal.parseMp4(full.take(cut)).isEmpty,
        s"truncated at $cut must not parse")
    // garbage and a headerless payload are dropped too
    assert(Multimodal.parseMp4("not an mp4 at all".getBytes).isEmpty)
    assert(Multimodal.parseMp4(Array.empty[Byte]).isEmpty)
    // a zero-sized atom must not loop or parse
    val zeroAtom = Array[Byte](0, 0, 0, 0) ++ "ftyp".getBytes("US-ASCII")
    assert(Multimodal.parseMp4(zeroAtom).isEmpty)
    // an stsz whose declared count overruns its own box is truncation
    val stszCut = full.clone()
    // (flip the last size entry's box length by cutting mdat off and
    // leaving moov intact is covered above; here: undecodable rows in
    // the pipeline are dropped, not fatal)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video/mp4", Multimodal.syntheticMp4(1L)),
      Multimodal.MediaRow(2L, "video/mp4", stszCut.take(60)))
    val out = Multimodal.parseMp4Rows(spark.createDataset(rows)).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
  }

  test("corrupt video bytes are dropped, not fatal") {
    assert(Multimodal.decodeVideo("MPEG".getBytes).isEmpty)
    assert(Multimodal.decodeVideo(Array.empty[Byte]).isEmpty)
    // truncated mid-frame must not crash or return partial stats
    assert(Multimodal.decodeVideo(Multimodal.syntheticY4m(1L).dropRight(5)).isEmpty)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video/x-yuv4mpeg", Multimodal.syntheticY4m(1L)),
      Multimodal.MediaRow(2L, "video/x-yuv4mpeg", "YUV4MPEG2 garbage".getBytes))
    val out = Multimodal.decodeVideoRows(spark.createDataset(rows)).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
  }

  test("crafted video headers cannot overflow or mis-size frames") {
    def y4m(header: String, body: Array[Byte]): Array[Byte] =
      (header + "\n").getBytes("US-ASCII") ++ body
    // dimensions over the sanity bound (and the old Int-overflow trap)
    assert(Multimodal.decodeVideo(
      y4m("YUV4MPEG2 W50000 H50000 F25:1", "FRAME\n".getBytes)).isEmpty)
    assert(Multimodal.decodeVideo(
      y4m("YUV4MPEG2 W65536 H65536 F25:1", "FRAME\n".getBytes)).isEmpty)
    // unsupported colorspace is rejected, not mis-sized
    assert(Multimodal.decodeVideo(
      y4m("YUV4MPEG2 W4 H4 F25:1 C411", Array.fill(30)(1.toByte))).isEmpty)

    // spec-legal FRAME parameters are accepted
    val frame420 = "FRAME Ip\n".getBytes("US-ASCII") ++ Array.fill(24)(10.toByte)
    val Some((n1, w1, h1, _, luma1)) = Multimodal.decodeVideo(
      y4m("YUV4MPEG2 W4 H4 F25:1 C420", frame420))
    assert(n1 == 1 && w1 == 4 && h1 == 4 && luma1 == 10.0)

    // mono colorspace sizes frames as pure luma
    val frameMono = "FRAME\n".getBytes("US-ASCII") ++ Array.fill(16)(7.toByte)
    val Some((n2, _, _, _, luma2)) = Multimodal.decodeVideo(
      y4m("YUV4MPEG2 W4 H4 F25:1 Cmono", frameMono))
    assert(n2 == 1 && luma2 == 7.0)
  }

  test("odd-dimension Y4M clips size chroma planes as ceil(w/2)*ceil(h/2)") {
    def y4m(header: String, body: Array[Byte]): Array[Byte] =
      (header + "\n").getBytes("US-ASCII") ++ body
    // 3×3 C420: luma 9 + chroma 2*ceil(3/2)*ceil(3/2) = 8 → 17 bytes
    val f420 = "FRAME\n".getBytes("US-ASCII") ++ Array.fill(17)(9.toByte)
    val Some((n1, w1, h1, _, luma1)) = Multimodal.decodeVideo(
      y4m("YUV4MPEG2 W3 H3 F25:1 C420", f420))
    assert(n1 == 1 && w1 == 3 && h1 == 3 && luma1 == 9.0)
    // 3×3 C422: luma 9 + chroma 2*ceil(3/2)*3 = 12 → 21 bytes
    val f422 = "FRAME\n".getBytes("US-ASCII") ++ Array.fill(21)(5.toByte)
    val Some((n2, _, _, _, luma2)) = Multimodal.decodeVideo(
      y4m("YUV4MPEG2 W3 H3 F25:1 C422", f422))
    assert(n2 == 1 && luma2 == 5.0)
    // the even-dimension byte count (16+8=24 for 4×4 C420) must still
    // hold — ceil sizing degenerates to the original formula
    val f4 = "FRAME\n".getBytes("US-ASCII") ++ Array.fill(24)(3.toByte)
    assert(Multimodal.decodeVideo(y4m("YUV4MPEG2 W4 H4 F25:1 C420", f4)).isDefined)
  }

  test("q65 pipeline decodes every document's video") {
    val d = "/root/testdata/sf0.001"
    val n = graft.sources.Tables.documents(spark, d).count()
    assert(Multimodal.videoFeatures(spark, d).count() == n)
  }

  test("decodeMjpeg: real JPEG frames out of a RIFF/AVI container — " +
    "geometry exact, luma deterministic, corruption rejected") {
    val avi = Multimodal.syntheticMjpegAvi(7L)
    val got = Multimodal.decodeMjpeg(avi)
    assert(got.isDefined, "a well-formed MJPEG-AVI must decode")
    val (frames, w, h, luma) = got.get
    assert(frames == 2 + (7 % 3) && w == 8 && h == 8,
      s"container geometry must be exact, got ($frames, $w, $h)")
    // JPEG is lossy but the CODEC is deterministic: same bytes, same
    // lumas — and a grayscale gradient must stay within one JPEG
    // quantization step of the source mean
    assert(Multimodal.decodeMjpeg(avi).get == got.get,
      "decode must be deterministic")
    val srcMean = (0 until frames).flatMap(f => (0 until 64).map(p =>
      ((7L * 17 + f * 29 + p * 13) % 256).toDouble)).sum / (frames * 64)
    assert(math.abs(luma - srcMean) < 16.0,
      s"decoded luma $luma must approximate the source mean $srcMean")
  }

  test("corrupt MJPEG bytes are dropped, not fatal") {
    import spark.implicits._
    val avi = Multimodal.syntheticMjpegAvi(3L)
    // flip bytes inside the first JPEG payload: ImageIO must fail or
    // the container walk must reject — either way the row drops
    val broken = avi.clone()
    val moviAt = {
      val s = new String(broken.map(_.toChar))
      s.indexOf("00dc")
    }
    (moviAt + 12 until (moviAt + 60).min(broken.length))
      .foreach(i => broken(i) = 0x55)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video/x-msvideo", avi),
      Multimodal.MediaRow(2L, "video/x-msvideo", broken),
      Multimodal.MediaRow(3L, "video/x-msvideo", "RIFFjunk".getBytes))
    val out = Multimodal.decodeMjpegRows(rows.toDS()).collect()
    assert(out.map(_.doc_id).toSet == Set(1L),
      s"only the intact clip may survive, got ${out.toSeq}")
  }

  test("q263 pipeline decodes every document's MJPEG clip") {
    val d = "/root/testdata/sf0.001"
    val n = graft.sources.Tables.documents(spark, d).count()
    assert(Multimodal.mjpegFeatures(spark, d).count() == n)
  }

  test("GIF round-trip is lossless; corrupt GIF bytes drop, not fail") {
    // grayscale fits one 256-entry palette: decoded luma must equal
    // the generator's formula EXACTLY, not approximately (the JPEG
    // path can only approximate)
    val got = Multimodal.decodeGif(Multimodal.syntheticGif(7L)).get
    val frames = 2 + (7 % 3)
    val want = (0 until frames).flatMap(f => (0 until 64).map(p =>
      ((7L * 17 + f * 29 + p * 13) % 256).toDouble)).sum / (frames * 64)
    assert(got._1 == frames && got._2 == 8 && got._3 == 8)
    assert(got._4 == want,
      s"lossless codec must round-trip luma exactly: ${got._4} vs $want")
    // corrupt payloads drop: a mid-stream truncation (the LZW data
    // ends mid-frame) and non-GIF bytes (mid-byte FLIPS can survive —
    // GIF has no payload checksum, the reader just decodes altered
    // pixels, which is the format's honest behavior)
    val full = Multimodal.syntheticGif(3L)
    val truncated = full.take(full.length / 2)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/gif", Multimodal.syntheticGif(1L)),
      Multimodal.MediaRow(2L, "image/gif", truncated),
      Multimodal.MediaRow(3L, "image/gif", "GIF89ajunk".getBytes))
    import spark.implicits._
    val out = Multimodal.decodeGifRows(rows.toDS()).collect()
    assert(out.map(_.doc_id).toSet == Set(1L),
      s"only the intact clip may survive, got ${out.toSeq}")
  }

  /** syntheticPng with every blue channel nudged by +1 (clamped) — a
    * perceptual near-dup: luma moves by at most one count per pixel,
    * so the dHash gradient signs flip on near-ties only. */
  private def tweakedPng(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 5).toInt
    val h = 6 + (docId % 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((docId * 7 + x * 3 + y * 5) % 256).toInt
      val g = ((docId * 11 + x * 5 + y * 7) % 256).toInt
      val b = math.min(((docId * 13 + x * 7 + y * 11) % 256).toInt + 1, 255)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("audioDupGroups: identical PCM content groups together, corrupt rows drop") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "audio/wav", Multimodal.syntheticWav(7)),
      Multimodal.MediaRow(2L, "audio/wav", Multimodal.syntheticWav(7)),
      Multimodal.MediaRow(3L, "audio/wav", Multimodal.syntheticWav(8)),
      Multimodal.MediaRow(4L, "audio/wav", Array[Byte](1, 2, 3)))
    val got = Multimodal.audioDupGroups(spark.createDataset(media)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)), s"got $got")
  }

  test("imageNearDupPairs: banded dHash equals brute force at radius 3, finds plants") {
    import spark.implicits._
    val media = (1L to 10L).map(i =>
      Multimodal.MediaRow(i, "image/png", Multimodal.syntheticPng(i))) ++
      (1L to 3L).map(i =>
        Multimodal.MediaRow(100L + i, "image/png", tweakedPng(i)))
    val hs = media.map(m => m.doc_id -> Multimodal.dHash(m.content).get).toMap
    // the plants must actually sit inside the search radius
    (1L to 3L).foreach(i => assert(
      java.lang.Long.bitCount(hs(i) ^ hs(100L + i)) <= 3, s"plant $i drifted"))
    val expected = (for {
      a <- hs.keys; b <- hs.keys if a < b
      hd = java.lang.Long.bitCount(hs(a) ^ hs(b)) if hd <= 3
    } yield (a, b, hd)).toSet
    // 4-band pigeonhole is EXACT at radius 3: banded candidates +
    // popcount verify must equal the all-pairs scan, not approximate it
    val got = Multimodal.imageNearDupPairs(spark.createDataset(media))
      .collect().map(p => (p.doc_a, p.doc_b, p.hamming)).toSet
    assert(got == expected, s"banded=$got brute=$expected")
    assert((1L to 3L).forall(i => got.exists(p => p._1 == i && p._2 == 100L + i)))
  }
}
