package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic 16×16 RGB PNG fixture generator — the payload source
  * behind the perceptual-hash queries (`mm_image_phash`,
  * `mm_image_neardup`). Like [[Mp4Fixture]], the builder lives with the
  * engine so query-time synthesis and the DuckDB oracle replay the SAME
  * closed-form pixel math:
  *
  *  - base pattern (shared by the id pair `2k`/`2k+1`), with
  *    `base = id/2` and row-major pixel index `i = y·16 + x`:
  *    `kk = i + base·37; raw = (kk² + 3·kk + base) mod 251` — quadratic,
  *    NOT affine in `i`, because the aHash of any affine gradient is
  *    near-constant across bases (every smooth ramp thresholds to the
  *    same half-plane bit pattern). Written as gray RGB (r=g=b=raw) so
  *    integer luma `(r·299+g·587+b·114)/1000` round-trips to exactly
  *    `raw` through the lossless PNG encode/decode.
  *  - odd ids perturb `id mod 4` pixels (positions
  *    `((base + 7j)·53) mod 256`, value `255 − raw`) — a near-duplicate
  *    of their even partner within a few bits of Hamming distance;
  *    unrelated bases land ~32 bits apart.
  *  - bases repeat mod 251 (the pattern is periodic in `base`), so at
  *    larger scale factors the corpus deliberately contains clusters of
  *    IDENTICAL images — the repeated-boilerplate shape a real crawl
  *    has, and exactly what a near-dup detector must surface.
  */
object ImageFixture {

  // same once-per-JVM memory-path switch as ImageCodec: fixture encode
  // happens in executor threads before any decode touches that object
  javax.imageio.ImageIO.setUseCache(false)

  val Size = 16

  /** Unperturbed pixel value at (x, y) for pair-base `base`. */
  def rawPixel(base: Long, x: Int, y: Int): Int = {
    val kk = (y * Size + x) + base * 37
    ((kk * kk + 3 * kk + base) % 251).toInt
  }

  /** Row-major (i = y·16 + x) positions overwritten for odd ids. */
  def flipPositions(id: Long): Seq[Int] =
    if (id % 2 == 1) (0 until (id % 4).toInt)
      .map(j => ((id / 2 + 7L * j) * 53 % 256).toInt)
    else Seq.empty

  /** The 256 row-major pixel values the PNG encodes. */
  def pixels(id: Long): Array[Int] = {
    val base = id / 2
    val a = Array.tabulate(Size * Size)(i => rawPixel(base, i % Size, i / Size))
    flipPositions(id).foreach(p => a(p) = 255 - rawPixel(base, p % Size, p / Size))
    a
  }

  /** PNG-encoded payload for `id` (real `javax.imageio` encode; decoded
    * back by the real [[Multimodal.ImageCodec]] path at query time).
    */
  def build(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(Size, Size,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = pixels(id)
    var y = 0
    while (y < Size) {
      var x = 0
      while (x < Size) {
        val v = px(y * Size + x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
