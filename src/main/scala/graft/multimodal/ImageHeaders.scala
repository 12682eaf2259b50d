package graft.multimodal

/** Pure-JVM container-header parsing for the multimodal decode path —
  * no imaging library needed: PNG/GIF dimensions sit at fixed offsets
  * and JPEG dimensions live in the first SOF marker segment. This is
  * the real part of `decodeMeta` (the pixel codec itself remains a
  * declared stub); payloads that match no known magic fall back to the
  * stub dimensions.
  *
  * Reference: the reference pipeline treats media as opaque attachments
  * (fetch_pages.py file-property handling); dimension extraction is the
  * minimal real decode a 100 TB media pipeline runs at ingest.
  */
object ImageHeaders {

  /** Returns (format, width, height) when the payload starts with a
    * recognized image container; None otherwise (never throws — corrupt
    * headers are routine at corpus scale).
    */
  def parse(p: Array[Byte]): Option[(String, Int, Int)] =
    try {
      if (isPng(p)) parsePng(p)
      else if (isJpeg(p)) parseJpeg(p)
      else if (isGif(p)) parseGif(p)
      else None
    } catch { case _: Exception => None }

  private def u8(b: Byte): Int = b & 0xff
  private def be32(p: Array[Byte], o: Int): Int =
    (u8(p(o)) << 24) | (u8(p(o + 1)) << 16) | (u8(p(o + 2)) << 8) | u8(p(o + 3))
  private def be16(p: Array[Byte], o: Int): Int = (u8(p(o)) << 8) | u8(p(o + 1))
  private def le16(p: Array[Byte], o: Int): Int = u8(p(o)) | (u8(p(o + 1)) << 8)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 24 && u8(p(0)) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
      u8(p(4)) == 0x0d && u8(p(5)) == 0x0a && u8(p(6)) == 0x1a && u8(p(7)) == 0x0a

  /** PNG: 8-byte signature, then the IHDR chunk (len+type at 8..15),
    * width/height big-endian at byte 16/20.
    */
  private def parsePng(p: Array[Byte]): Option[(String, Int, Int)] =
    if (p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      Some(("png", be32(p, 16), be32(p, 20)))
    else None

  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 4 && u8(p(0)) == 0xff && u8(p(1)) == 0xd8

  /** JPEG: walk marker segments from offset 2 until a start-of-frame
    * marker (C0-CF minus C4/C8/CC, which are not SOFs); the segment body
    * is [len][precision][height][width]. Markers may be padded by any
    * number of 0xFF fill bytes (the spec allows them between segments),
    * and TEM (0x01), SOI, and RSTn are standalone markers with no length
    * field; EOI or SOS before any SOF means no dimensions are findable.
    */
  private def parseJpeg(p: Array[Byte]): Option[(String, Int, Int)] = {
    var o = 2
    while (o + 1 < p.length) {
      if (u8(p(o)) != 0xff) return None
      while (o < p.length && u8(p(o)) == 0xff) o += 1 // skip 0xFF fill bytes
      if (o >= p.length) return None
      val marker = u8(p(o))
      o += 1 // o now points at the segment body (length field, if any)
      if (marker == 0x01 || marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        () // standalone markers have no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan without a prior SOF
      } else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return if (o + 6 < p.length) Some(("jpeg", be16(p, o + 5), be16(p, o + 3)))
               else None
      } else {
        if (o + 1 >= p.length) return None
        o += be16(p, o)
      }
    }
    None
  }

  private def isGif(p: Array[Byte]): Boolean =
    p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  /** GIF: "GIF87a"/"GIF89a", then little-endian logical screen size. */
  private def parseGif(p: Array[Byte]): Option[(String, Int, Int)] =
    Some(("gif", le16(p, 6), le16(p, 8)))
}
