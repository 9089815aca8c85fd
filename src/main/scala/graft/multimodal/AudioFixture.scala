package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic mono 16-bit PCM WAV fixture generator — the payload
  * source behind the audio-fingerprint queries (`mm_audio_fingerprint`,
  * `mm_audio_neardup`). Same discipline as [[ImageFixture]]: query-time
  * synthesis and the DuckDB oracle replay identical closed-form sample
  * math, while the engine path decodes the REAL container
  * (`javax.sound.sampled`).
  *
  *  - base waveform (shared by the id pair `2k`/`2k+1`), with
  *    `base = id/2` and sample index `t`:
  *    `kk = t + base·17; raw = (kk² + 5·kk + base) mod 4001 − 2000` —
  *    quadratic, so different bases fingerprint ~32 bits apart.
  *  - odd ids boost `id mod 4` of the 64 fingerprint windows (window
  *    indexes `((base + 11j)·29) mod 64`) by +100 amplitude on every
  *    sample — an audible-watermark-sized edit that leaves the pair
  *    within a few bits of Hamming distance.
  */
object AudioFixture {

  val SampleRate = 8000
  val NumSamples = 1024 // 64 fingerprint windows × 16 samples

  /** Fingerprint windows boosted for odd ids. */
  def perturbedWindows(id: Long): Set[Int] =
    if (id % 2 == 1) (0 until (id % 4).toInt)
      .map(j => ((id / 2 + 11L * j) * 29 % 64).toInt).toSet
    else Set.empty

  /** Signed 16-bit sample value at index `t` (|value| ≤ 2100). */
  def sampleValue(id: Long, t: Int): Int = {
    val base = id / 2
    val kk = t + base * 17
    val raw = ((kk * kk + 5 * kk + base) % 4001).toInt - 2000
    val boost = if (perturbedWindows(id).contains(t / 16)) 100 else 0
    if (raw < 0) -(-raw + boost) else raw + boost
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** RIFF/WAVE (PCM16LE mono) payload for `id`, decoded back by the
    * real [[Multimodal.AudioCodec]] path at query time.
    */
  def build(id: Long): Array[Byte] = {
    val dataLen = NumSamples * 2
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("ISO-8859-1"))
    out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("ISO-8859-1"))
    out.write("fmt ".getBytes("ISO-8859-1"))
    out.write(le32(16)) // PCM fmt chunk size
    out.write(le16(1)) // PCM
    out.write(le16(1)) // mono
    out.write(le32(SampleRate))
    out.write(le32(SampleRate * 2)) // byte rate
    out.write(le16(2)) // block align
    out.write(le16(16)) // bits per sample
    out.write("data".getBytes("ISO-8859-1"))
    out.write(le32(dataLen))
    var t = 0
    while (t < NumSamples) {
      out.write(le16(sampleValue(id, t) & 0xffff))
      t += 1
    }
    out.toByteArray
  }
}
