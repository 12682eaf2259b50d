package graft.multimodal

/** Pure-JVM audio container-header parsing — the audio half of the
  * multimodal decode path (ImageHeaders is the image half; the sample
  * codec itself remains a declared stub — no media libraries in this
  * environment). WAV carries its format in the RIFF `fmt ` chunk, FLAC
  * in the STREAMINFO metadata block, MP3 in the first frame header
  * (after an optional ID3v2 tag); all three sit at byte offsets a
  * header walk reaches without decoding any samples — the minimal real
  * decode a 100 TB media pipeline runs at ingest.
  *
  * Reference: the reference pipeline treats media as opaque attachments
  * (alsyefs/notion fetch_pages.py file-property handling); typed audio
  * metadata is the corpus-scale extension.
  */
object AudioHeaders {

  /** Parsed audio metadata: sample rate in Hz, channel count, bit
    * depth (0 where the container does not store one, e.g. MP3), and
    * duration in milliseconds (for MP3 an estimate from the payload
    * size at the first frame's bitrate — exact duration needs a full
    * frame walk, which is sample-decode territory).
    */
  final case class AudioInfo(format: String, sampleRate: Int,
                             channels: Int, bits: Int, durationMs: Long)

  /** Returns the parsed header when the payload starts with a
    * recognized audio container; None otherwise (never throws —
    * corrupt headers are routine at corpus scale).
    */
  def parse(p: Array[Byte]): Option[AudioInfo] =
    try {
      if (isWav(p)) parseWav(p)
      else if (isFlac(p)) parseFlac(p)
      else parseMp3(p) // MP3 has no magic beyond the frame sync
    } catch { case _: Exception => None }

  private def u8(b: Byte): Int = b & 0xff
  private def le16(p: Array[Byte], o: Int): Int = u8(p(o)) | (u8(p(o + 1)) << 8)
  private def le32(p: Array[Byte], o: Int): Long =
    (u8(p(o)) | (u8(p(o + 1)) << 8) | (u8(p(o + 2)) << 16)).toLong |
      (u8(p(o + 3)).toLong << 24)
  private def be24(p: Array[Byte], o: Int): Int =
    (u8(p(o)) << 16) | (u8(p(o + 1)) << 8) | u8(p(o + 2))

  private def ascii(p: Array[Byte], o: Int, s: String): Boolean =
    o + s.length <= p.length && s.indices.forall(i => p(o + i) == s(i).toByte)

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 44 && ascii(p, 0, "RIFF") && ascii(p, 8, "WAVE")

  /** WAV: walk the RIFF chunk list for `fmt ` (PCM layout: format tag,
    * channels, sample rate, byte rate, block align, bits) and `data`
    * (payload size → duration at the byte rate). Chunks are
    * word-aligned; either chunk may appear in any order.
    */
  private def parseWav(p: Array[Byte]): Option[AudioInfo] = {
    var o = 12
    var rate = 0; var ch = 0; var bits = 0; var byteRate = 0L; var dataLen = -1L
    while (o + 8 <= p.length) {
      val len = le32(p, o + 4)
      if (ascii(p, o, "fmt ") && o + 24 <= p.length) {
        ch = le16(p, o + 10)
        rate = le32(p, o + 12).toInt
        byteRate = le32(p, o + 16)
        bits = le16(p, o + 22)
      } else if (ascii(p, o, "data")) dataLen = len
      // a corrupt length beyond the payload (or one whose Int cast
      // would wrap negative and stall the walk) ends the scan — what
      // is parsed so far still stands
      if (len < 0 || len > p.length) o = p.length
      else o += 8 + len.toInt + (len.toInt & 1) // chunks pad to even offsets
    }
    if (rate > 0 && ch > 0)
      Some(AudioInfo("wav", rate, ch, bits,
        if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L))
    else None
  }

  private def isFlac(p: Array[Byte]): Boolean =
    p.length >= 42 && ascii(p, 0, "fLaC")

  /** FLAC: the first metadata block must be STREAMINFO (34 bytes);
    * sample rate is 20 bits at block offset 10, then 3 bits channels-1,
    * 5 bits bits-per-sample-1, 36 bits total samples.
    */
  private def parseFlac(p: Array[Byte]): Option[AudioInfo] = {
    val blockType = u8(p(4)) & 0x7f
    val blockLen = be24(p, 5)
    if (blockType != 0 || blockLen < 34) return None
    val b = 8 // STREAMINFO body start
    val rate = (u8(p(b + 10)) << 12) | (u8(p(b + 11)) << 4) | (u8(p(b + 12)) >> 4)
    val ch = ((u8(p(b + 12)) >> 1) & 0x07) + 1
    val bits = (((u8(p(b + 12)) & 0x01) << 4) | (u8(p(b + 13)) >> 4)) + 1
    val total = ((u8(p(b + 13)) & 0x0f).toLong << 32) |
      ((u8(p(b + 14)).toLong << 24) | (u8(p(b + 15)).toLong << 16) |
        (u8(p(b + 16)).toLong << 8) | u8(p(b + 17)).toLong)
    if (rate > 0) Some(AudioInfo("flac", rate, ch, bits, total * 1000L / rate))
    else None
  }

  /** MPEG1 Layer III bitrate (kbps) and sample-rate tables. */
  private val Mp3Bitrate =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3Rate = Array(44100, 48000, 32000, 0)

  /** MP3: skip an ID3v2 tag if present (syncsafe 28-bit size at bytes
    * 6–9), then require an MPEG1 Layer III frame sync (0xFFE). Duration
    * is estimated as payload bits / first-frame bitrate — the standard
    * CBR estimate; VBR exactness needs a full frame walk.
    */
  private def parseMp3(p: Array[Byte]): Option[AudioInfo] = {
    var o = 0
    if (ascii(p, 0, "ID3") && p.length >= 10) {
      val size = (u8(p(6)) << 21) | (u8(p(7)) << 14) | (u8(p(8)) << 7) | u8(p(9))
      o = 10 + size
    }
    if (o + 4 > p.length) return None
    if (u8(p(o)) != 0xff || (u8(p(o + 1)) & 0xe0) != 0xe0) return None
    val versionBits = (u8(p(o + 1)) >> 3) & 0x03
    val layerBits = (u8(p(o + 1)) >> 1) & 0x03
    if (versionBits != 3 || layerBits != 1) return None // MPEG1 Layer III only
    val bitrate = Mp3Bitrate((u8(p(o + 2)) >> 4) & 0x0f)
    val rate = Mp3Rate((u8(p(o + 2)) >> 2) & 0x03)
    val mono = ((u8(p(o + 3)) >> 6) & 0x03) == 3
    if (bitrate == 0 || rate == 0) return None
    val durMs = (p.length - o).toLong * 8L / bitrate // bits / (kbit/s) = ms
    Some(AudioInfo("mp3", rate, if (mono) 1 else 2, 0, durMs))
  }
}
