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

  /** Sample-flags words: bit 16 is `sample_is_non_sync_sample`; the
    * sync word also sets sample_depends_on = 2 (I-picture) like real
    * muxers do, so the parser is tested against non-zero surrounding
    * bits, not a convenient 0.
    */
  val SyncFlags: Long = 0x02000000L
  val NonSyncFlags: Long = 0x01010000L

  /** How a fragment encodes its sync information (all shapes occur in
    * real streaming output):
    *  - `"perSampleFlags"`: trun carries flags for every sample;
    *  - `"firstSampleSync"`: tfhd default flags = non-sync, trun's
    *    first-sample-flags = sync (the common CMAF shape — one
    *    keyframe opening each fragment);
    *  - `"trexDefaults"`: neither tfhd nor trun carry flags or sizes —
    *    everything resolves from mvex/trex (fragment sizes must then
    *    all equal the trex default, and every sample inherits the trex
    *    default flags).
    */
  def buildFragmented(fragments: Seq[(Seq[Int], Seq[Int])], width: Int, height: Int,
                      seed: Long = 0L, trackId: Long = 1L,
                      style: String = "perSampleFlags",
                      trexDefaultSize: Long = 0L,
                      trexDefaultFlags: Long = NonSyncFlags): Array[Byte] = {
    require(fragments.nonEmpty)
    val ftyp = box("ftyp", cat("iso5".getBytes("ISO-8859-1"), be32(0)))

    // movie box: mvex/trex fragment defaults + a video trak whose stbl
    // is EMPTY (the fragmented-init shape) but carries the track id
    val tkhdBody = new Array[Byte](76)
    System.arraycopy(be32(trackId), 0, tkhdBody, 12, 4) // track_ID, v0 offset
    val tkhd = box("tkhd", cat(tkhdBody,
      be32(width.toLong << 16), be32(height.toLong << 16)))
    val hdlr = box("hdlr", cat(be32(0), be32(0),
      "vide".getBytes("ISO-8859-1"), new Array[Byte](12)))
    val stbl = box("stbl", cat(
      box("stsz", cat(be32(0), be32(0), be32(0))),
      box("stsc", cat(be32(0), be32(0))),
      box("stco", cat(be32(0), be32(0)))))
    val trex = box("trex", cat(be32(0), be32(trackId),
      be32(1), be32(0), be32(trexDefaultSize), be32(trexDefaultFlags)))
    val moov = box("moov", cat(box("mvex", trex),
      box("trak", cat(tkhd, box("mdia", cat(hdlr, box("minf", stbl)))))))

    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    var globalIdx = 0
    fragments.zipWithIndex.foreach { case ((sizes, syncWithin), fi) =>
      val n = sizes.length
      val mfhd = box("mfhd", cat(be32(0), be32(fi + 1L)))
      // tfhd: no base-data-offset → base defaults to the moof start
      // (both default-base-is-moof 0x020000 and the first-traf rule)
      val (tfFlags, tfBody, trFlags, perEntryBytes) = style match {
        case "perSampleFlags" =>
          (0x020000L, Array.empty[Byte],
            TrunDataOffset | TrunSize | TrunFlags, 8)
        case "firstSampleSync" =>
          require(syncWithin == Seq(1), "firstSampleSync fixture syncs sample 1 only")
          (0x020000L | 0x20L, be32(NonSyncFlags),
            TrunDataOffset | TrunSize | TrunFirstFlags, 4)
        case "trexDefaults" =>
          require(sizes.forall(_.toLong == trexDefaultSize), "trexDefaults: constant size")
          (0x020000L, Array.empty[Byte], TrunDataOffset, 0)
        case other => throw new IllegalArgumentException(s"style $other")
      }
      val tfhd = box("tfhd", cat(be32(tfFlags), be32(trackId), tfBody))
      val trunHeadLen = 8 + 4 /* data_offset */ +
        (if ((trFlags & TrunFirstFlags) != 0) 4 else 0)
      val trunLen = 8 + trunHeadLen + n * perEntryBytes
      val trafLen = 8 + tfhd.length + trunLen
      val moofLen = 8 + mfhd.length + trafLen
      val dataOffset = moofLen + 8 // first sample byte, relative to moof start

      val trunBody = new ByteArrayOutputStream()
      trunBody.write(be32(trFlags))
      trunBody.write(be32(n.toLong))
      trunBody.write(be32(dataOffset.toLong))
      if ((trFlags & TrunFirstFlags) != 0) trunBody.write(be32(SyncFlags))
      (0 until n).foreach { i =>
        if ((trFlags & TrunSize) != 0) trunBody.write(be32(sizes(i).toLong))
        if ((trFlags & TrunFlags) != 0)
          trunBody.write(be32(if (syncWithin.contains(i + 1)) SyncFlags else NonSyncFlags))
      }
      val trun = box("trun", trunBody.toByteArray)
      require(trun.length == trunLen, s"trun layout drifted: ${trun.length} != $trunLen")
      val moof = box("moof", cat(mfhd, box("traf", cat(tfhd, trun))))
      require(moof.length == moofLen, "moof layout drifted")

      val mdatBody = new ByteArrayOutputStream()
      sizes.foreach { sz =>
        val b = new Array[Byte](sz)
        java.util.Arrays.fill(b, ((seed + globalIdx) % 251).toByte)
        mdatBody.write(b)
        globalIdx += 1
      }
      out.write(moof); out.write(box("mdat", mdatBody.toByteArray))
    }
    out.toByteArray
  }

  private val TrunDataOffset = 0x1L
  private val TrunFirstFlags = 0x4L
  private val TrunSize = 0x200L
  private val TrunFlags = 0x400L
}
