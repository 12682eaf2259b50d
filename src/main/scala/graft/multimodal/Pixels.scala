package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL pixel codec via `javax.imageio` — pure JDK, no JNI, no external
  * library, so it runs in any executor JVM. PNG/JPEG/GIF payloads
  * decode to actual pixels; unknown containers return None and callers
  * fall back to the declared deterministic stubs (the r1–r8 contract:
  * swapping the codec changes no plan shape, and now the swap has
  * happened for the three formats the header parsers recognize).
  *
  * Container recognition stays on [[ImageHeaders]] (cheap byte probe)
  * so non-image payloads — the common case in a mixed corpus — never
  * pay an ImageIO reader-discovery pass, and the decoded dimensions
  * can be cross-checked against the independent header parse.
  */
object Pixels {

  // ImageIO's default decode path spills through a disk-backed cache
  // file per image — a per-row temp-file cost executors don't need for
  // byte-array inputs. Static, set once per JVM at first use.
  ImageIO.setUseCache(false)

  /** Luma histogram bins for [[Multimodal.decodePixels]]. */
  val HistBins = 16

  /** Decode a payload that [[ImageHeaders]] recognizes; None for
    * unrecognized containers or corrupt image data (routine at corpus
    * scale — never throws).
    */
  def decode(payload: Array[Byte]): Option[(String, BufferedImage)] =
    ImageHeaders.parse(payload).flatMap { case (fmt, _, _) =>
      try Option(ImageIO.read(new ByteArrayInputStream(payload))).map(fmt -> _)
      catch { case _: Exception => None }
    }

  /** Bilinear resample to exactly (w, h) — real pixel interpolation via
    * Graphics2D, headless-safe (BufferedImage needs no display).
    */
  def resample(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** Re-encode as PNG (lossless, always writable by the JDK). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
