package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "some fake image payload bytes"),
    (2L, "a much longer fake video payload with many more bytes in it"),
    (3L, "")
  ).toDF("id", "payload_str").withColumn("payload", col("payload_str").cast("binary"))

  test("decodeMeta: stable schema + deterministic stub decode") {
    val meta = Multimodal.decodeMeta(docs, "id", "payload")
    assert(meta.schema.fieldNames.toSeq ==
      Seq("id", "n_bytes", "width", "height", "n_frames", "format"))
    val rows = meta.collect().map(m => m.id -> m).toMap
    assert(rows(1L).n_bytes == 29)
    assert(rows(3L).n_bytes == 0)
    // deterministic: same input → same meta on re-run
    assert(Multimodal.decodeMeta(docs, "id", "payload").collect().toSet == meta.collect().toSet)
  }

  test("extractFeatures: fixed-dim L1-normalized feature vectors") {
    val feats = Multimodal.extractFeatures(docs, "id", "payload", dim = 16).collect()
    assert(feats.forall(_.feature.length == 16))
    val f1 = feats.find(_.id == 1L).get
    assert(math.abs(f1.feature.sum - 1f) < 1e-5)
    val f3 = feats.find(_.id == 3L).get
    assert(f3.feature.sum == 0f) // empty payload → zero vector, no NaN
  }

  // ---- real image path (javax.imageio) -------------------------------

  /** Deterministic 8×5 RGB gradient, PNG-encoded. */
  private def pngFixture(w: Int = 8, h: Int = 5): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 32 << 16) | (y * 48 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageCodec: real PNG decode — exact dims, format, single frame") {
    val png = pngFixture()
    assert(Multimodal.ImageCodec.sniffFormat(png).contains("png"))
    val meta = Multimodal.ImageCodec.decodeMeta(7L, png)
    assert(meta == Multimodal.MediaMeta(7L, png.length, 8, 5, 1, "png"))
    // non-image bytes fall through to the stub (format flag differs)
    val stub = Multimodal.ImageCodec.decodeMeta(7L, "not an image".getBytes)
    assert(Set("img", "vid").contains(stub.format))
  }

  test("ImageCodec: pixel luminance histogram is real and L1-normalized") {
    val png = pngFixture()
    val f = Multimodal.ImageCodec.extractFeature(1L, png, dim = 16)
    assert(f.feature.length == 16 && math.abs(f.feature.sum - 1f) < 1e-5)
    // differs from the stub's byte histogram of the *encoded* bytes —
    // proof the pixels were decoded
    val stub = Multimodal.StubCodec.extractFeature(1L, png, 16)
    assert(!f.feature.sameElements(stub.feature))
    // all-black image → all luma in bucket 0
    val black = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.ImageCodec.extractFeature(2L, bos.toByteArray, 16)
    }
    assert(black.feature(0) == 1f && black.feature.drop(1).forall(_ == 0f))
  }

  test("ImageCodec: resize produces a decodable PNG at the target dims") {
    val resized = Multimodal.ImageCodec.resize(pngFixture(16, 10), 4, 3)
    assert(resized.isDefined)
    val meta = Multimodal.ImageCodec.decodeMeta(0L, resized.get)
    assert(meta.width == 4 && meta.height == 3 && meta.format == "png")
    assert(Multimodal.ImageCodec.resize("plain text".getBytes, 4, 3).isEmpty)
  }

  test("decodeMeta pipeline: mixed image + non-image partition") {
    val png = pngFixture()
    val mixed = Seq((10L, png), (11L, "audio-ish payload".getBytes))
      .toDF("id", "payload")
    val rows = Multimodal.decodeMeta(mixed, "id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(rows(10L).format == "png" && rows(10L).width == 8 && rows(10L).height == 5)
    assert(Set("img", "vid").contains(rows(11L).format))
  }

  // ---- real audio path (javax.sound.sampled) -------------------------

  /** Deterministic mono 16-bit PCM WAV: a 440-ish integer ramp wave. */
  private def wavFixture(nFrames: Int = 800, rate: Int = 8000,
                         channels: Int = 1): Array[Byte] = {
    val samples = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames * channels) {
      val s = ((i * 331) % 16384 - 8192).toShort // deterministic ramp
      samples(2 * i) = (s & 0xff).toByte
      samples(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioCodec: real WAV decode — rate, channels, frame count") {
    val wav = wavFixture(nFrames = 800, rate = 8000, channels = 2)
    assert(Multimodal.AudioCodec.sniffFormat(wav).contains("wav"))
    val meta = Multimodal.AudioCodec.decodeMeta(3L, wav)
    assert(meta == Multimodal.MediaMeta(3L, wav.length,
      width = 8000, height = 2, n_frames = 800, format = "wav"))
    // non-audio bytes fall through to the stub
    val stub = Multimodal.AudioCodec.decodeMeta(3L, "not audio".getBytes)
    assert(Set("img", "vid").contains(stub.format))
  }

  test("AudioCodec: amplitude histogram is real and L1-normalized") {
    val wav = wavFixture()
    val f = Multimodal.AudioCodec.extractFeature(5L, wav, dim = 16)
    assert(f.feature.length == 16 && math.abs(f.feature.sum - 1f) < 1e-4)
    // ramp spans [-8192, 8191] of 32768 → all mass in bins 0-4 (the
    // single i=0 sample hits |−8192| = bin-4 boundary exactly)
    assert(f.feature.drop(5).forall(_ == 0f) && f.feature.take(5).sum > 0.99f)
    // differs from the stub's byte histogram of the *encoded* bytes —
    // proof the samples were decoded
    val stub = Multimodal.StubCodec.extractFeature(5L, wav, 16)
    assert(!f.feature.sameElements(stub.feature))
    // silence → all mass in bin 0
    val silent = Multimodal.AudioCodec.extractFeature(6L,
      wavFixture(nFrames = 100).clone(), 16)
    val silence = {
      val z = new Array[Byte](200)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(z), fmt, 100L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      Multimodal.AudioCodec.extractFeature(7L, bos.toByteArray, 16)
    }
    assert(silence.feature(0) == 1f && silence.feature.drop(1).forall(_ == 0f))
  }

  test("decodeMeta pipeline: image + audio + opaque in one partition") {
    val mixed = Seq((20L, pngFixture()), (21L, wavFixture()),
      (22L, "opaque video payload".getBytes))
      .toDF("id", "payload")
    val rows = Multimodal.decodeMeta(mixed, "id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(rows(20L).format == "png")
    assert(rows(21L).format == "wav" && rows(21L).width == 8000)
    assert(Set("img", "vid").contains(rows(22L).format))
  }

  test("frameSamplePlan: explodes frame indices with stride") {
    val meta = Multimodal.decodeMeta(docs, "id", "payload")
    val plan = Multimodal.frameSamplePlan(meta, stride = 2)
    val byId = plan.groupBy("id").count().as[(Long, Long)].collect().toMap
    val metaById = meta.collect().map(m => m.id -> m.n_frames).toMap
    metaById.foreach { case (id, nf) =>
      assert(byId(id) == (nf + 1) / 2, s"id=$id frames=$nf")
    }
  }

  /** Animated GIF fixture: `n` solid frames cycling R, G, B. */
  private def animatedGif(n: Int, w: Int = 6, h: Int = 4): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff)
    (0 until n).foreach { i =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(colors(i % 3))); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("VideoCodec: real animated-GIF decode — frame count, dims, sampling") {
    val gif = animatedGif(5)
    assert(Multimodal.VideoCodec.frameCount(gif) == 5)
    assert(Multimodal.VideoCodec.isAnimated(gif))
    val meta = Multimodal.VideoCodec.decodeMeta(3L, gif)
    assert(meta == Multimodal.MediaMeta(3L, gif.length, 6, 4, 5, "gif-anim"))
    // stride-2 sampling decodes frames 0, 2, 4 as real PNGs
    val frames = Multimodal.VideoCodec.sampleFrames(gif, stride = 2)
    assert(frames.map(_._1) == Seq(0, 2, 4))
    frames.foreach { case (_, png) =>
      assert(Multimodal.ImageCodec.sniffFormat(png).contains("png"))
      val m = Multimodal.ImageCodec.decodeMeta(0L, png)
      assert(m.width == 6 && m.height == 4)
    }
    // a single-frame GIF is NOT video — it stays on the image path
    val single = animatedGif(1)
    assert(!Multimodal.VideoCodec.isAnimated(single))
  }

  test("VideoCodec: frame-averaged luminance feature is real and L1-normalized") {
    val gif = animatedGif(3) // one R, one G, one B frame
    val feat = Multimodal.VideoCodec.extractFeature(9L, gif, dim = 8)
    assert(feat.dim == 8)
    assert(math.abs(feat.feature.sum - 1.0f) < 1e-3)
    // luma bins: R=76 → bin 2, G=150 → bin 4, B=29 → bin 0; each 1/3
    assert(math.abs(feat.feature(2) - 1f / 3) < 1e-3)
    assert(math.abs(feat.feature(4) - 1f / 3) < 1e-3)
    assert(math.abs(feat.feature(0) - 1f / 3) < 1e-3)
  }

  test("decodeMeta pipeline routes animated GIF to the video codec") {
    val rows = Seq(
      (1L, animatedGif(4)),
      (2L, pngFixture()),
      (3L, "opaque-bytes".getBytes)
    ).toDF("id", "payload")
    val meta = Multimodal.decodeMeta(rows, "id", "payload").collect()
      .map(m => m.id -> m).toMap
    assert(meta(1L).format == "gif-anim" && meta(1L).n_frames == 4)
    assert(meta(2L).format == "png")
    assert(Set("img", "vid").contains(meta(3L).format))
  }

  test("Mp4Meta: real ISO-BMFF box walk — video-track dims + frame count") {
    // hand-built minimal container: ftyp + moov(mvhd, audio trak,
    // video trak(tkhd 640×360, hdlr 'vide', mdia>minf>stbl>stsz n=48))
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
      bb.array()
    }
    def tkhd(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](84) // version 0 layout
      val bb = java.nio.ByteBuffer.wrap(b)
      bb.position(76); bb.putInt(w << 16); bb.putInt(h << 16)
      b
    }
    def hdlr(kind: String): Array[Byte] = {
      val b = new Array[Byte](24)
      System.arraycopy(kind.getBytes("ISO-8859-1"), 0, b, 8, 4)
      b
    }
    def stsz(n: Int): Array[Byte] = {
      val b = new Array[Byte](12)
      java.nio.ByteBuffer.wrap(b, 8, 4).putInt(n)
      b
    }
    def hdlrBox(kind: String) = box("hdlr", hdlr(kind))
    val videoTrak = box("trak", box("tkhd", tkhd(640, 360)) ++
      box("mdia", hdlrBox("vide") ++
        box("minf", box("stbl", box("stsz", stsz(48))))))
    val audioTrak = box("trak", box("tkhd", tkhd(0, 0)) ++
      box("mdia", hdlrBox("soun") ++
        box("minf", box("stbl", box("stsz", stsz(9999))))))
    val mp4 = box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", new Array[Byte](100)) ++ audioTrak ++ videoTrak)

    assert(Multimodal.Mp4Meta.isMp4(mp4))
    val m = Multimodal.Mp4Meta.decodeMeta(7L, mp4)
    assert(m.isDefined, "mp4 metadata must parse")
    // video track wins: 640×360 and 48 frames — NOT the audio track's
    // 9999 samples
    assert(m.get.width == 640 && m.get.height == 360)
    assert(m.get.n_frames == 48 && m.get.format == "mp4")

    // non-mp4 bytes pass through to the stub path
    assert(Multimodal.Mp4Meta.decodeMeta(8L, Array[Byte](1, 2, 3, 4)).isEmpty)

    // the pipeline dispatcher routes mp4 payloads to the real parser
    val df = Seq((7L, mp4)).toDF("id", "payload")
    val viaPipeline = Multimodal.decodeMeta(df, "id", "payload").collect().head
    assert(viaPipeline.format == "mp4" && viaPipeline.n_frames == 48)
  }

  test("WebmMeta: real EBML walk — video TrackEntry pixel dims") {
    // hand-built: EBML header + Segment(Tracks(audio entry, video entry))
    def el(id: Array[Int], body: Array[Byte]): Array[Byte] = {
      require(body.length < 127)
      id.map(_.toByte) ++ Array((0x80 | body.length).toByte) ++ body
    }
    def u16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val audioEntry = el(Array(0xAE),
      el(Array(0x83), Array(2.toByte)))             // TrackType 2 = audio
    val videoEntry = el(Array(0xAE),
      el(Array(0x83), Array(1.toByte)) ++           // TrackType 1 = video
        el(Array(0xE0),                             // Video
          el(Array(0xB0), u16(1280)) ++             // PixelWidth
            el(Array(0xBA), u16(720))))             // PixelHeight
    val tracks = el(Array(0x16, 0x54, 0xAE, 0x6B), audioEntry ++ videoEntry)
    val webm = el(Array(0x1A, 0x45, 0xDF, 0xA3),
      el(Array(0x42, 0x82), "webm".getBytes)) ++    // EBML header + DocType
      el(Array(0x18, 0x53, 0x80, 0x67), tracks)     // Segment

    assert(Multimodal.WebmMeta.isEbml(webm))
    val m = Multimodal.WebmMeta.decodeMeta(9L, webm)
    assert(m.isDefined, "webm metadata must parse")
    assert(m.get.width == 1280 && m.get.height == 720 && m.get.format == "webm")
    assert(Multimodal.WebmMeta.decodeMeta(9L, "nope".getBytes).isEmpty)

    val viaPipeline = Multimodal.decodeMeta(
      Seq((9L, webm)).toDF("id", "payload"), "id", "payload").collect().head
    assert(viaPipeline.format == "webm" && viaPipeline.width == 1280)
  }

  test("Mp4Meta.keyframes: stss/stsz/stsc/stco walk yields exact byte ranges") {
    // 5 samples of sizes 10..14 in two chunks (3+2), sync samples 1,3,5
    val sizes = Seq(10, 11, 12, 13, 14)
    val mp4 = Mp4Fixture.build(sizes, chunkSplit = 3,
      syncSamples = Seq(1, 3, 5), width = 64, height = 48, seed = 100L)

    // the metadata walk still sees the same container
    val meta = Multimodal.Mp4Meta.decodeMeta(1L, mp4).get
    assert(meta.width == 64 && meta.height == 48 && meta.n_frames == 5)

    val kfs = Multimodal.Mp4Meta.keyframes(mp4)
    assert(kfs.map(_.sample) == Seq(1, 3, 5))
    assert(kfs.map(_.nBytes) == Seq(10L, 12L, 14L))
    // offsets are cumulative sums of the preceding sample sizes —
    // including across the chunk boundary (samples 4,5 live in chunk 2)
    val rel = kfs.map(_.offset - kfs.head.offset)
    assert(rel == Seq(0L, 21L, 46L), s"got $rel")
    // and absolutely correct: each keyframe's slice is its fill byte
    kfs.foreach { k =>
      val slice = mp4.slice(k.offset.toInt, (k.offset + k.nBytes).toInt)
      val expect = ((100L + k.sample - 1) % 251).toByte
      assert(slice.forall(_ == expect), s"sample ${k.sample} slice wrong")
    }

    // single-chunk variant + malformed bytes
    val one = Mp4Fixture.build(Seq(8, 8, 8), chunkSplit = 99,
      syncSamples = Seq(2), width = 8, height = 8)
    val k1 = Multimodal.Mp4Meta.keyframes(one)
    assert(k1.map(_.sample) == Seq(2) && k1.head.nBytes == 8L)
    assert(Multimodal.Mp4Meta.keyframes("....ftyp12345678".getBytes).isEmpty)
  }

  test("videoKeyframes: index flows as rows, payloads stay in the scan") {
    val rows = (0 until 6).map { i =>
      val n = i % 3 + 2
      (i.toLong, Mp4Fixture.build((0 until n).map(j => 10 + j), chunkSplit = 2,
        syncSamples = (1 to n by 2), width = 32, height = 32, seed = i.toLong))
    }
    val df = rows.toDF("id", "payload")
    val idx = Multimodal.videoKeyframes(df, "id", "payload")
    val got = idx.collect().groupBy(_.id).view.mapValues(_.map(_.sample).toSeq.sorted).toMap
    rows.foreach { case (id, _) =>
      val n = (id % 3 + 2).toInt
      assert(got(id) == (1 to n by 2).toSeq, s"id $id")
    }
  }

  test("sampleKeyframesPipe: keyframe slices reach the external decoder per-partition") {
    // `cat` is the identity decoder: the engine's side of the contract
    // (index → slice → base64 TSV line per keyframe) comes back verbatim
    val sizes = Seq(10, 11, 12, 13, 14)
    val mp4 = Mp4Fixture.build(sizes, chunkSplit = 3,
      syncSamples = Seq(1, 3, 5), width = 64, height = 48, seed = 7L)
    val df = Seq((42L, mp4)).toDF("id", "payload")
    val out = Multimodal.sampleKeyframesPipe(df, "id", "payload", Seq("cat"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(_._2)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((42L, 1), (42L, 3), (42L, 5)))
    // the slice the decoder received is the actual keyframe byte range
    val dec = java.util.Base64.getDecoder
    assert(out.map(t => dec.decode(t._3).length).toSeq == Seq(10, 12, 14))
    assert(dec.decode(out(1)._3).forall(_ == ((7L + 2) % 251).toByte))

    // stride skips keyframes; webm ships whole with sample = -1
    val strided = Multimodal.sampleKeyframesPipe(df, "id", "payload", Seq("cat"), stride = 2)
      .collect().map(_.getInt(1)).sorted
    assert(strided.toSeq == Seq(1, 5))
    val webm = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++ Array[Byte](0x42.toByte)
    val wout = Multimodal.sampleKeyframesPipe(
      Seq((9L, webm)).toDF("id", "payload"), "id", "payload", Seq("cat")).collect()
    assert(wout.length == 1 && wout.head.getInt(1) == -1)
  }

  test("fragmented mp4: trun sync flags index keyframes across moof boxes, three styles") {
    import Multimodal.Mp4Meta

    // style A: per-sample trun flags, two fragments, global numbering
    val fragsA = Seq((Seq(10, 11, 12), Seq(1, 3)), (Seq(13, 14), Seq(2)))
    val a = Mp4Fixture.buildFragmented(fragsA, width = 64, height = 48, seed = 5L)
    val ka = Mp4Meta.keyframes(a)
    assert(ka.map(_.sample) == Seq(1, 3, 5), s"got $ka")
    assert(ka.map(_.nBytes) == Seq(10L, 12L, 14L))
    // the indexed slices are the actual sample bytes (deterministic fill
    // continues ACROSS fragments)
    ka.foreach { k =>
      val slice = a.slice(k.offset.toInt, (k.offset + k.nBytes).toInt)
      assert(slice.length == k.nBytes.toInt)
      assert(slice.forall(_ == ((5L + k.sample - 1) % 251).toByte), s"sample ${k.sample}")
    }

    // style B: tfhd default flags non-sync + trun first-sample-flags sync
    // (the CMAF fragment-opens-with-keyframe shape)
    val fragsB = Seq((Seq(9, 9, 9), Seq(1)), (Seq(8, 8), Seq(1)))
    val b = Mp4Fixture.buildFragmented(fragsB, width = 32, height = 32,
      seed = 2L, style = "firstSampleSync")
    assert(Mp4Meta.keyframes(b).map(_.sample) == Seq(1, 4))

    // style C: flags and sizes resolve ONLY from mvex/trex defaults
    val fragsC = Seq((Seq(7, 7), Seq()), (Seq(7, 7, 7), Seq()))
    val cNone = Mp4Fixture.buildFragmented(fragsC, width = 16, height = 16,
      style = "trexDefaults", trexDefaultSize = 7L,
      trexDefaultFlags = Mp4Fixture.NonSyncFlags)
    assert(Mp4Meta.keyframes(cNone).isEmpty, "all non-sync by trex default")
    val cAll = Mp4Fixture.buildFragmented(fragsC, width = 16, height = 16,
      style = "trexDefaults", trexDefaultSize = 7L,
      trexDefaultFlags = Mp4Fixture.SyncFlags)
    val kc = Mp4Meta.keyframes(cAll)
    assert(kc.map(_.sample) == Seq(1, 2, 3, 4, 5), "all sync by trex default")
    assert(kc.forall(_.nBytes == 7L), "sizes from trex default")

    // a traf whose track id is NOT the video track contributes nothing:
    // patch the moov tkhd track_ID (body offset 12) so the trafs (still
    // track 1) belong to some other, non-video track
    val mismatch = a.clone()
    val tkhdAt = mismatch.indexOfSlice("tkhd".getBytes("ISO-8859-1"))
    assert(tkhdAt > 0)
    mismatch(tkhdAt + 4 + 12 + 3) = 9 // track_ID 1 → 9
    assert(Mp4Meta.keyframes(mismatch).isEmpty, "foreign-track trafs must be ignored")

    // the Dataset index + pipe seam consume fragmented payloads unchanged
    val df = Seq((11L, a)).toDF("id", "payload")
    assert(Multimodal.videoKeyframes(df, "id", "payload")
      .collect().map(_.sample).sorted.toSeq == Seq(1, 3, 5))
    val piped = Multimodal.sampleKeyframesPipe(df, "id", "payload", Seq("cat"))
      .collect().map(_.getInt(1)).sorted
    assert(piped.toSeq == Seq(1, 3, 5))

    // fuzz: truncations and bit flips yield an empty-or-valid index,
    // never a throw (the moof walk joins the existing fuzz contract)
    (1 until a.length by 3).foreach { cut => Mp4Meta.keyframes(a.take(cut)) }
    val rnd = new scala.util.Random(99)
    (0 until 200).foreach { _ =>
      val mut = a.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Mp4Meta.keyframes(mut)
    }
  }

  test("pipe fallback chunks cueless payloads; corrupt keyframe ranges are counted, not silent") {
    // cueless EBML bigger than the chunk cap ships as multiple
    // negative-sample lines in stream order (reassembly = concatenation),
    // so staging memory is bounded by the chunk, not the payload
    val body = Array.tabulate(2500)(i => (i % 251).toByte)
    val webm = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++ body
    val chunks = Multimodal.sampleKeyframesPipe(
      Seq((3L, webm)).toDF("id", "payload"), "id", "payload", Seq("cat"),
      fallbackChunkBytes = 1000)
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(-_._1)
    assert(chunks.map(_._1).toSeq == Seq(-1, -2, -3), s"got ${chunks.map(_._1).toSeq}")
    val dec = java.util.Base64.getDecoder
    val reassembled = chunks.flatMap(c => dec.decode(c._2))
    assert(reassembled.toSeq == webm.toSeq, "chunk reassembly must be the payload")

    // a keyframe range beyond the payload (corrupt index) is dropped AND
    // counted — under-sampling is visible, not inferred
    val mp4 = Mp4Fixture.build(Seq(10, 11, 12), chunkSplit = 3,
      syncSamples = Seq(1, 3), width = 32, height = 32, seed = 1L)
    val truncated = mp4.take(mp4.length - 6) // cuts into the LAST sample's bytes
    val dropped = spark.sparkContext.longAccumulator("droppedKeyframeRanges")
    val out = Multimodal.sampleKeyframesPipe(
      Seq((4L, truncated)).toDF("id", "payload"), "id", "payload", Seq("cat"),
      droppedRanges = Some(dropped))
      .collect().map(_.getInt(1)).sorted
    assert(out.toSeq == Seq(1), "in-bounds keyframe still flows")
    assert(dropped.value == 1L, s"corrupt range must be counted, got ${dropped.value}")
  }

  test("videoFrameFeatures: configured decoder bypasses the stub, features are the decoder's") {
    // toy external decoder: base64-decodes each keyframe slice and
    // reports [n_bytes, mean_byte] — values only derivable from the
    // ACTUAL slice bytes, so a match proves the decoder (not StubCodec)
    // produced the features. Spawn-per-line sh is fine at spec scale.
    val script = new java.io.File(tmpDir("dec"), "toy_decoder.sh")
    val w = new java.io.PrintWriter(script)
    try w.println(
      """while IFS="$(printf '\t')" read -r id sample b64; do
        |  stats=$(printf '%s' "$b64" | base64 -d | od -An -v -tu1 | tr -s ' ' '\n' \
        |    | awk 'NF { s += $1; n += 1 } END { printf "%d,%.6f", n, (n ? s / n : 0) }')
        |  printf '%s\t%s\t%s\n' "$id" "$sample" "$stats"
        |done""".stripMargin)
    finally w.close()

    val sizes = Seq(10, 11, 12, 13, 14)
    val mp4 = Mp4Fixture.build(sizes, chunkSplit = 3,
      syncSamples = Seq(1, 3, 5), width = 64, height = 48, seed = 7L)
    val df = Seq((42L, mp4)).toDF("id", "payload")

    val out = Multimodal.videoFrameFeatures(df, "id", "payload",
      decoderCommand = Some(Seq("/bin/sh", script.getAbsolutePath)))
    // payloads never shuffle: the pipe's RDD lineage is shuffle-free
    assert(!hasShuffle(out.queryExecution.toRdd), "frame-feature pipe lineage shuffles")
    val rows = out.collect()
      .map(r => (r.getInt(1), r.getSeq[Double](2))).sortBy(_._1)
    // keyframes 1/3/5; Mp4Fixture fills sample s with ((seed + s - 1) % 251)
    assert(rows.map(_._1).toSeq == Seq(1, 3, 5))
    rows.foreach { case (s, feat) =>
      assert(feat.length == 2)
      assert(feat(0) == sizes(s - 1).toDouble, s"sample $s byte count")
      assert(math.abs(feat(1) - ((7L + s - 1) % 251).toDouble) < 1e-4, s"sample $s mean byte")
    }

    // NO decoder and NO opt-in flag → loud failure, not silent fakes
    spark.conf.unset(Multimodal.AllowStubKey)
    val e = intercept[IllegalStateException] {
      Multimodal.videoFrameFeatures(df, "id", "payload", decoderCommand = None)
    }
    assert(e.getMessage.contains(Multimodal.DecoderCommandKey), e.getMessage)

    // the stub is OPT-IN: with the flag set the declared fake answers
    // (sample = -1, whole-payload histogram)
    spark.conf.set(Multimodal.AllowStubKey, "true")
    try {
      val stub = Multimodal.videoFrameFeatures(df, "id", "payload", decoderCommand = None)
        .collect().map(r => (r.getInt(1), r.getSeq[Double](2)))
      assert(stub.length == 1 && stub.head._1 == -1 && stub.head._2.length == 8)
    } finally spark.conf.unset(Multimodal.AllowStubKey)

    // deployment entry point: the conf-configured command drives the
    // SAME real pipe path as the explicit argument
    spark.conf.set(Multimodal.DecoderCommandKey,
      s"/bin/sh ${script.getAbsolutePath}")
    try {
      assert(Multimodal.configuredDecoderCommand(spark)
        .contains(Seq("/bin/sh", script.getAbsolutePath)))
      val auto = Multimodal.videoFrameFeaturesAuto(df, "id", "payload")
        .collect().map(r => (r.getInt(1), r.getSeq[Double](2))).sortBy(_._1)
      assert(auto.map(_._1).toSeq == Seq(1, 3, 5), "conf-driven decoder must run the real path")
    } finally spark.conf.unset(Multimodal.DecoderCommandKey)
  }

  private def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean = {
    def walk(r: org.apache.spark.rdd.RDD[_]): Boolean =
      r.dependencies.exists {
        case _: org.apache.spark.ShuffleDependency[_, _, _] => true
        case d => walk(d.rdd)
      }
    walk(rdd)
  }

  test("WebmMeta: unknown-size Segment (streamed webm) still parses; no audio fallthrough") {
    def el(id: Array[Int], body: Array[Byte]): Array[Byte] = {
      require(body.length < 127)
      id.map(_.toByte) ++ Array((0x80 | body.length).toByte) ++ body
    }
    def u16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val videoEntry = el(Array(0xAE),
      el(Array(0x83), Array(1.toByte)) ++
        el(Array(0xE0), el(Array(0xB0), u16(320)) ++ el(Array(0xBA), u16(200))))
    val tracks = el(Array(0x16, 0x54, 0xAE, 0x6B), videoEntry)
    // Segment with the all-ones 1-byte size (0xFF = unknown): standard
    // for live-streamed webm — must extend to end of input, not abort
    val segment = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte) ++
      Array(0xFF.toByte) ++ tracks
    val webm = el(Array(0x1A, 0x45, 0xDF, 0xA3),
      el(Array(0x42, 0x82), "webm".getBytes)) ++ segment

    val m = Multimodal.WebmMeta.decodeMeta(3L, webm)
    assert(m.isDefined && m.get.width == 320 && m.get.height == 200,
      s"unknown-size segment failed: $m")

    // EBML with NO parseable video track: webm with zero dims — never
    // misclassified as audio by the dispatcher
    val noVideo = el(Array(0x1A, 0x45, 0xDF, 0xA3),
      el(Array(0x42, 0x82), "webm".getBytes))
    val m2 = Multimodal.WebmMeta.decodeMeta(4L, noVideo)
    assert(m2.isDefined && m2.get.format == "webm" && m2.get.width == 0)
    val viaPipeline = Multimodal.decodeMeta(
      Seq((4L, noVideo)).toDF("id", "payload"), "id", "payload").collect().head
    assert(viaPipeline.format == "webm")
  }

  test("WebmMeta.cueRanges: Matroska cue index yields cluster byte ranges") {
    def el(id: Array[Int], body: Array[Byte]): Array[Byte] = {
      require(body.length < 16384)
      val size =
        if (body.length < 127) Array((0x80 | body.length).toByte)
        else Array((0x40 | (body.length >> 8)).toByte, (body.length & 0xff).toByte)
      id.map(_.toByte) ++ size ++ body
    }
    def u32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def cluster(fill: Byte, n: Int) =
      el(Array(0x1F, 0x43, 0xB6, 0x75), Array.fill(n)(fill))
    def cuePoint(timeMs: Long, pos: Long) =
      el(Array(0xBB), el(Array(0xB3), u32(timeMs)) ++
        el(Array(0xB7), el(Array(0xF1), u32(pos))))

    // fixed-width cue values → cues length is structure-determined, so
    // cluster positions (relative to segment body) can be computed
    val c1 = cluster(1, 20)
    val c2 = cluster(2, 30)
    val cuesLen = el(Array(0x1C, 0x53, 0xBB, 0x6B),
      cuePoint(0, 0) ++ cuePoint(40, 0)).length
    val c1Pos = cuesLen           // segment body = [cues][c1][c2]
    val c2Pos = cuesLen + c1.length
    val cues = el(Array(0x1C, 0x53, 0xBB, 0x6B),
      cuePoint(0, c1Pos) ++ cuePoint(40, c2Pos))
    val header = el(Array(0x1A, 0x45, 0xDF, 0xA3), el(Array(0x42, 0x82), "webm".getBytes))
    val webm = header ++ el(Array(0x18, 0x53, 0x80, 0x67), cues ++ c1 ++ c2)

    val ranges = Multimodal.WebmMeta.cueRanges(webm)
    assert(ranges.map(_.sample) == Seq(1, 2))
    // ranges cover [cluster1 start, cluster2 start) and [cluster2, end)
    val segBody = webm.length - (cues.length + c1.length + c2.length)
    assert(ranges(0).offset == segBody + c1Pos && ranges(0).nBytes == c1.length.toLong)
    assert(ranges(1).offset == segBody + c2Pos &&
      ranges(1).nBytes == (webm.length - (segBody + c2Pos)).toLong)
    // the sliced bytes ARE the cluster elements
    val s1 = webm.slice(ranges(0).offset.toInt, (ranges(0).offset + ranges(0).nBytes).toInt)
    assert((s1(0) & 0xff) == 0x1F && s1.count(_ == 1.toByte) == 20)

    // Dataset API + pipe seam route webm through cue slices, not whole-payload
    val df = Seq((5L, webm)).toDF("id", "payload")
    val idx = Multimodal.videoKeyframes(df, "id", "payload").collect()
    assert(idx.map(_.sample).sorted.toSeq == Seq(1, 2))
    val piped = Multimodal.sampleKeyframesPipe(df, "id", "payload", Seq("cat"))
      .collect().map(_.getInt(1)).sorted
    assert(piped.toSeq == Seq(1, 2), "webm with cues must ship cue slices")

    // cueless EBML still falls back to whole-payload, sample = -1
    val noCues = header
    val whole = Multimodal.sampleKeyframesPipe(
      Seq((6L, noCues)).toDF("id", "payload"), "id", "payload", Seq("cat")).collect()
    assert(whole.length == 1 && whole.head.getInt(1) == -1)

    // multi-track: cue points carry one CueTrackPositions PER track —
    // only the VIDEO track's (TrackType 1, here TrackNumber 2) cluster
    // positions are keyframe ranges; the audio track's are ignored
    def u8(v: Int) = Array(v.toByte)
    def trackEntry(num: Int, ttype: Int) =
      el(Array(0xAE), el(Array(0xD7), u8(num)) ++ el(Array(0x83), u8(ttype)))
    val tracks2 = el(Array(0x16, 0x54, 0xAE, 0x6B),
      trackEntry(1, 2) ++ trackEntry(2, 1))
    def cuePoint2(timeMs: Long, audioPos: Long, videoPos: Long) =
      el(Array(0xBB), el(Array(0xB3), u32(timeMs)) ++
        el(Array(0xB7), el(Array(0xF7), u8(1)) ++ el(Array(0xF1), u32(audioPos))) ++
        el(Array(0xB7), el(Array(0xF7), u8(2)) ++ el(Array(0xF1), u32(videoPos))))
    val cues2Len = el(Array(0x1C, 0x53, 0xBB, 0x6B),
      cuePoint2(0, 0, 0) ++ cuePoint2(40, 0, 0)).length
    val base2 = tracks2.length + cues2Len
    val v1Pos = base2           // segment body = [tracks][cues][c1][c2]
    val v2Pos = base2 + c1.length
    val cues2 = el(Array(0x1C, 0x53, 0xBB, 0x6B),
      cuePoint2(0, 7, v1Pos) ++ cuePoint2(40, 9, v2Pos)) // audio pos = junk
    val webm2 = header ++
      el(Array(0x18, 0x53, 0x80, 0x67), tracks2 ++ cues2 ++ c1 ++ c2)
    val segBody2 = webm2.length - (tracks2.length + cues2.length + c1.length + c2.length)
    val ranges2 = Multimodal.WebmMeta.cueRanges(webm2)
    assert(ranges2.map(_.offset) == Seq(segBody2 + v1Pos, segBody2 + v2Pos).map(_.toLong),
      s"video-track cue positions expected, got $ranges2")
    assert(ranges2(0).nBytes == c1.length.toLong)
  }

  test("container parsers never throw on malformed or adversarial bytes") {
    val mp4ish = "....ftyp".getBytes
    val ebmlMagic = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte)
    val adversarial: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      mp4ish,                                          // header only
      mp4ish ++ Array.fill(4)(0xff.toByte),            // giant box size
      mp4ish ++ Array[Byte](0, 0, 0, 1),               // 64-bit size, truncated
      mp4ish ++ Array[Byte](0, 0, 0, 0),               // size-0 box to EOF
      ebmlMagic,                                       // magic only
      ebmlMagic ++ Array[Byte](0),                     // invalid varint (0x00)
      ebmlMagic ++ Array(0xAE.toByte, 0xFF.toByte),    // size runs past end
      Array.fill(64)(0xAB.toByte)                      // noise
    )
    // deterministic pseudo-random fuzz: corrupt valid-looking prefixes
    val rnd = new scala.util.Random(42)
    val fuzz = (0 until 200).map { _ =>
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (n >= 8 && rnd.nextBoolean())
        System.arraycopy("ftyp".getBytes, 0, b, 4, 4)
      else if (n >= 4 && rnd.nextBoolean())
        System.arraycopy(ebmlMagic, 0, b, 0, 4)
      b
    }
    (adversarial ++ fuzz).zipWithIndex.foreach { case (p, i) =>
      // must return cleanly (Some or None), never throw
      Multimodal.Mp4Meta.decodeMeta(i.toLong, p)
      Multimodal.WebmMeta.decodeMeta(i.toLong, p)
    }
  }

  // ---- perceptual hash (aHash) + image near-dup ----------------------

  test("aHash64: PNG round-trip is integer-exact against the fixture pixel math") {
    // expected hash computed straight from ImageFixture.pixels — the
    // decode path (PNG bytes → BufferedImage → luma) must reproduce it
    def expected(id: Long): Long = {
      val px = ImageFixture.pixels(id)
      val cells = Array.tabulate(64) { c =>
        val (bx, by) = (c % 8, c / 8)
        (px(2 * by * 16 + 2 * bx) + px(2 * by * 16 + 2 * bx + 1) +
          px((2 * by + 1) * 16 + 2 * bx) + px((2 * by + 1) * 16 + 2 * bx + 1)).toLong / 4
      }
      val mean = cells.sum / 64
      (0 until 64).foldLeft(0L)((h, c) => if (cells(c) > mean) h | (1L << c) else h)
    }
    (0L until 40L).foreach { id =>
      val got = Multimodal.ImageCodec.perceptualHash(ImageFixture.build(id))
      assert(got.contains(expected(id)), s"id=$id")
    }
  }

  test("aHash64: near pair close, unrelated bases far, gray raster path, non-image None") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val h = (id: Long) =>
      Multimodal.ImageCodec.perceptualHash(ImageFixture.build(id)).get
    assert(ham(h(6L), h(7L)) <= 10)   // odd id perturbs its even partner
    assert(ham(h(0L), h(40L)) > 10)   // different bases are far apart
    // TYPE_BYTE_GRAY must read raster samples (getRGB would colorspace-
    // convert); a constant image has no cell above the mean → hash 0
    val gray = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 16).foreach(y => (0 until 16).foreach(x =>
      gray.getRaster.setSample(x, y, 0, 128)))
    assert(Multimodal.ImageCodec.aHash64(gray) == 0L)
    assert(Multimodal.ImageCodec.perceptualHash("not an image".getBytes).isEmpty)
  }

  test("fingerprint64: WAV round-trip is integer-exact against the fixture sample math") {
    def expected(id: Long): Long = {
      val wins = Array.tabulate(64) { w =>
        (0 until 16).map(t =>
          math.abs(AudioFixture.sampleValue(id, w * 16 + t)).toLong).sum / 16
      }
      val mean = wins.sum / 64
      (0 until 64).foldLeft(0L)((h, c) => if (wins(c) > mean) h | (1L << c) else h)
    }
    (0L until 40L).foreach { id =>
      val got = Multimodal.AudioCodec.fingerprint64(AudioFixture.build(id))
      assert(got.contains(expected(id)), s"id=$id")
    }
    // watermarked partner is near, unrelated base is far, non-audio None
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val h = (id: Long) =>
      Multimodal.AudioCodec.fingerprint64(AudioFixture.build(id)).get
    assert(ham(h(6L), h(7L)) <= 10)
    assert(ham(h(0L), h(40L)) > 10)
    assert(Multimodal.AudioCodec.fingerprint64("not audio".getBytes).isEmpty)
    // the direct RIFF walk must agree with the javax.sound path on the
    // fixture WAVs, and non-PCM16 payloads fall back to it
    (0L until 10L).foreach { id =>
      val wav = AudioFixture.build(id)
      assert(Multimodal.AudioCodec.fingerprint64(wav) ==
        Multimodal.AudioCodec.fingerprint64ViaSound(wav), s"fastpath id=$id")
    }
    val eightBit = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
      val raw = Array.tabulate(200)(i => (i % 120 - 60).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, 200L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(Multimodal.AudioCodec.fingerprint64(eightBit) ==
      Multimodal.AudioCodec.fingerprint64ViaSound(eightBit))
    assert(Multimodal.AudioCodec.fingerprint64(eightBit).isDefined)
    // audioFingerprints drops undecodable rows instead of stub-hashing
    import spark.implicits._
    val mixed = Seq((1L, AudioFixture.build(1L)), (2L, "junk".getBytes))
      .toDF("id", "payload")
    assert(Multimodal.audioFingerprints(mixed, "id", "payload").count() == 1L)
  }

  test("persisted phash index: replace wins, null-payload delete purges, probe sees live only") {
    import spark.implicits._
    val path = tmpDir("phash-idx") + "/idx"
    Multimodal.savePHashIndex(
      Seq((2L, 10L), (4L, 20L), (10L, 30L)).toDF("id", "ph"), "id", "ph", path)
    // delta: id 4 re-ingested with a NEW hash, id 10 deleted (no row)
    Multimodal.mergePHashDelta(Seq(4L, 10L).toDF("id"),
      Seq((4L, 21L)).toDF("id", "ph"), "id", "ph", path)
    val live = Multimodal.phashIndexRows(spark, path)
      .as[(Long, Long)].collect().toSet
    assert(live == Set((2L, 10L), (4L, 21L)))
    // probe: only live rows answer — the deleted id 10 (hash 30, which
    // WOULD match incoming 101 at hamming 2) must stay silent
    val probe = Multimodal.probePHashIndex(path,
        Seq((100L, 21L), (101L, 30L)).toDF("id", "ph"), "id", "ph",
        maxHamming = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(probe == Set((100L, 4L, 0L), (101L, 2L, 2L)))
    // asOf=0 snapshots the pre-delta state: the segment-1 replace and
    // delete can't reach back (same machinery as the BM25 asOf read)
    val v0 = Multimodal.phashIndexRows(spark, path, asOf = 0)
      .as[(Long, Long)].collect().toSet
    assert(v0 == Set((2L, 10L), (4L, 20L), (10L, 30L)))
  }

  test("hammingNearDup: banded candidates + popcount verify + bucket occupancy cap") {
    import spark.implicits._
    // hashes: 1L and 3L differ in 1 bit (pair); the far hash shares no
    // 16-bit band with them; 1L vs 0x0002 differ by 2 bits (pair)
    val far = 0x5a5aa5a55a5aa5a5L
    val hashes = Seq((1L, 1L), (2L, 3L), (3L, far), (4L, 2L))
      .toDF("id", "phash")
    val pairs = Multimodal.hammingNearDup(hashes, "id", "phash", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 1L), (1L, 4L, 2L), (2L, 4L, 1L)))
    // non-image rows never reach hashing: imagePHashes drops them
    val docs = Seq((1L, ImageFixture.build(1L)), (2L, "junk".getBytes))
      .toDF("id", "payload")
    assert(Multimodal.imagePHashes(docs, "id", "payload").count() == 1L)
    // occupancy cap: all four rows share band keys of hash 0 except far;
    // cap 1 excludes every bucket with 2+ members → no pairs at all
    val capped = Multimodal.hammingNearDup(hashes, "id", "phash",
      maxHamming = 10, maxBucket = 1)
    assert(capped.count() == 0L)
  }
}
