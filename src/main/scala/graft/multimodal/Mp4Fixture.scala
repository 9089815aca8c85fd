package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic minimal ISO-BMFF (mp4) writer — the fixture generator
  * behind the video keyframe-index tests and the oracle-gated
  * `mm_video_keyframes` query (payloads are synthesized at query time,
  * so the builder lives with the engine, not the specs). Emits exactly
  * the boxes [[Multimodal.Mp4Meta]] reads: ftyp, moov(trak(tkhd,
  * mdia(hdlr, minf(stbl(stsz, stsc, stco, stss))))), mdat — with real
  * sample-table semantics (per-sample sizes, multi-chunk stsc runs,
  * 1-based stss sync samples) so the parser is exercised on the true
  * box layout, not a caricature.
  */
object Mp4Fixture {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(8L + body.length))
    out.write(typ.getBytes("ISO-8859-1"))
    out.write(body)
    out.toByteArray
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** Build an mp4 whose video track has `frameSizes.length` samples with
    * the given byte sizes, laid out in two chunks (first `chunkSplit`
    * samples, then the rest — one chunk if chunkSplit >= n), and whose
    * sync (key) samples are `syncSamples` (1-based). Sample bytes are a
    * deterministic fill: sample i (0-based) is bytes of value
    * `(seed + i) % 251`.
    */
  def build(frameSizes: Seq[Int], chunkSplit: Int, syncSamples: Seq[Int],
            width: Int, height: Int, seed: Long = 0L): Array[Byte] = {
    val n = frameSizes.length
    require(n >= 1 && frameSizes.forall(_ >= 0), "need >= 1 sample")

    val ftyp = box("ftyp", cat("isom".getBytes("ISO-8859-1"), be32(0)))

    // tkhd v0: 76 bytes of fixed fields before the 16.16 width/height
    val tkhd = box("tkhd", cat(new Array[Byte](76),
      be32(width.toLong << 16), be32(height.toLong << 16)))
    // hdlr: version/flags, pre_defined, handler_type
    val hdlr = box("hdlr", cat(be32(0), be32(0),
      "vide".getBytes("ISO-8859-1"), new Array[Byte](12)))

    val stsz = box("stsz", cat(be32(0), be32(0) /* per-sample table */,
      be32(n.toLong), cat(frameSizes.map(s => be32(s.toLong)): _*)))
    val split = math.min(math.max(chunkSplit, 1), n)
    val twoChunks = split < n
    val stsc = box("stsc",
      if (twoChunks) cat(be32(0), be32(2),
        be32(1), be32(split.toLong), be32(1),
        be32(2), be32((n - split).toLong), be32(1))
      else cat(be32(0), be32(1), be32(1), be32(n.toLong), be32(1)))
    val stss = box("stss", cat(be32(0), be32(syncSamples.length.toLong),
      cat(syncSamples.map(s => be32(s.toLong)): _*)))

    // stco needs the absolute mdat data offset → assemble sizes first
    val nChunks = if (twoChunks) 2 else 1
    val stcoLen = 8 + 8 + 4 * nChunks
    def stblOf(stco: Array[Byte]) = box("stbl", cat(stsz, stsc, stco, stss))
    val shellLen = {
      // moov(trak(tkhd mdia(hdlr minf(stbl)))) adds 5 box headers
      val stbl = stsz.length + stsc.length + stcoLen + stss.length + 8
      val minf = stbl + 8
      val mdia = hdlr.length + minf + 8
      val trak = tkhd.length + mdia + 8
      trak + 8
    }
    val dataStart = ftyp.length + shellLen + 8 // + mdat header
    val chunk2Start = dataStart + frameSizes.take(split).map(_.toLong).sum
    val stco = box("stco",
      if (twoChunks) cat(be32(0), be32(2), be32(dataStart.toLong), be32(chunk2Start))
      else cat(be32(0), be32(1), be32(dataStart.toLong)))

    val moov = box("moov", box("trak", cat(tkhd,
      box("mdia", cat(hdlr, box("minf", stblOf(stco)))))))
    require(ftyp.length + moov.length + 8 == dataStart, "layout drifted")

    val mdatBody = new ByteArrayOutputStream()
    frameSizes.zipWithIndex.foreach { case (sz, i) =>
      val b = new Array[Byte](sz)
      java.util.Arrays.fill(b, ((seed + i) % 251).toByte)
      mdatBody.write(b)
    }
    cat(ftyp, moov, box("mdat", mdatBody.toByteArray))
  }
}
