package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Real, pure-JVM media codecs for the multimodal plane — no native
  * libraries, everything ships with the JDK:
  *
  *  - images: lossless PNG via `javax.imageio.ImageIO` (8-bit grayscale,
  *    content carried as an n x 1 scanline);
  *  - audio: WAV via `javax.sound.sampled.AudioSystem` (8-bit unsigned
  *    PCM mono, 16 kHz — bit-exact roundtrip by construction);
  *  - video: an MJPEG-style container of length-prefixed PNG frames —
  *    the demuxer can SKIP undecoded frames (a sampler pays decode cost
  *    only for sampled frames, the property real frame sampling relies on).
  *
  * Both encode and decode run executor-side inside `mapPartitions`; every
  * codec here is deterministic in CONTENT (encoded bytes may differ across
  * JDK encoder versions, but all three formats are lossless, so any feature
  * computed on decoded content is stable — which is why the m01–m04 oracle
  * rows stay hashable with a real decoder on the path).
  *
  * [[Multimodal.FakeCodec]] remains the codec-free twin: the spec asserts
  * real-decode features == twin features on the same corpus.
  */
object JvmCodec {
  import java.awt.image.BufferedImage
  import javax.imageio.ImageIO
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

  /** Lossless 8-bit grayscale PNG of `bytes` as an n x 1 scanline.
    * (Kept for interop; [[encodeBmp]] is the fast path — PNG's deflate
    * costs ~10x more per tiny image and buys nothing for synthesis.) */
  def encodePng(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.isEmpty) return Array.emptyByteArray
    val img = new BufferedImage(bytes.length, 1, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < bytes.length) { raster.setSample(i, 0, 0, bytes(i) & 0xff); i += 1 }
    val bos = new ByteArrayOutputStream(bytes.length + 64)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Lossless 8-bit palettized BMP (BI_RGB, grayscale palette) of `bytes`
    * as an n x 1 scanline — a real, spec-conformant container that ImageIO
    * decodes natively, written directly (BMP is header + palette + padded
    * rows; routing the encode through ImageIO would only add overhead). */
  // palette entry i = (i, i, i): index == gray value; constant, so built
  // once — the video container encodes one BMP per ~16-byte frame, and the
  // 256-entry put loop per frame was most of its encode work (r14)
  private val grayPalette: Array[Byte] = {
    val p = new Array[Byte](256 * 4)
    var i = 0
    while (i < 256) { p(i * 4) = i.toByte; p(i * 4 + 1) = i.toByte; p(i * 4 + 2) = i.toByte; i += 1 }
    p
  }

  def encodeBmp(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.isEmpty) return Array.emptyByteArray
    val n = bytes.length
    val rowSize = (n + 3) & ~3 // rows pad to 4-byte boundaries
    val dataOffset = 14 + 40 + 256 * 4
    val fileSize = dataOffset + rowSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(dataOffset)
    out.putInt(40).putInt(n).putInt(1).putShort(1).putShort(8)
      .putInt(0).putInt(rowSize).putInt(2835).putInt(2835).putInt(256).putInt(0)
    out.put(grayPalette)
    out.put(bytes)
    out.array()
  }

  /** Reusable image decoder — the "initialize the codec once per
    * partition" object the mapPartitions stages hold: one ImageIO
    * ImageReader per format, re-targeted per image, instead of the
    * per-call reader lookup + stream sniffing `ImageIO.read` does. */
  final class ImageDecoder {
    private val bmp = ImageIO.getImageReadersByFormatName("bmp").next()
    private val png = ImageIO.getImageReadersByFormatName("png").next()

    def decode(encoded: Array[Byte]): Array[Byte] = {
      if (encoded.isEmpty) return Array.emptyByteArray
      // r14 hot path: 8-bit uncompressed BMP scanlines are parsed directly
      // from the buffer. The ImageIO route paid a MemoryCacheImageInputStream
      // + reader reset + BufferedImage build + per-pixel getSample PER CALL —
      // ruinous for the video container, whose frames are ~16-byte images
      // (one ImageIO round-trip per 16 content bytes). The direct parse
      // returns the same bytes the raster loop did: for an indexed image
      // getSample yields the palette INDEX, which is exactly the stored
      // scanline byte, whatever the palette (ours is identity). Anything not
      // plain 8-bit BI_RGB BMP still takes the ImageIO readers below.
      if (encoded.length >= 34 && encoded(0) == 'B'.toByte && encoded(1) == 'M'.toByte) {
        val bb = java.nio.ByteBuffer.wrap(encoded).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val dataOffset = bb.getInt(10)
        val w = bb.getInt(18)
        val hRaw = bb.getInt(22)
        val bpp = bb.getShort(28)
        val comp = bb.getInt(30)
        if (bpp == 8 && comp == 0 && w > 0 && hRaw != 0) {
          val h = math.abs(hRaw)
          val bottomUp = hRaw > 0 // positive height = rows stored bottom-up
          val rowSize = (w + 3) & ~3
          if (dataOffset.toLong + h.toLong * rowSize <= encoded.length) {
            val out = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              val srcRow = if (bottomUp) h - 1 - y else y
              System.arraycopy(encoded, dataOffset + srcRow * rowSize, out, y * w, w)
              y += 1
            }
            return out
          }
        }
      }
      val reader = if (encoded(0) == 'B'.toByte) bmp else png
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(encoded))
      try {
        reader.setInput(iis)
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val out = new Array[Byte](w * h)
        var y = 0; var k = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(k) = raster.getSample(x, y, 0).toByte; k += 1; x += 1 }
          y += 1
        }
        out
      } finally iis.close()
    }
  }

  /** One-shot decode of any grayscale image container (PNG, BMP). Hot
    * loops should hold an [[ImageDecoder]] per partition instead. */
  def decodeImage(encoded: Array[Byte]): Array[Byte] =
    new ImageDecoder().decode(encoded)

  /** Back-compat alias for [[decodeImage]]. */
  def decodePng(png: Array[Byte]): Array[Byte] = decodeImage(png)

  /** 8-bit unsigned PCM mono at 16 kHz — one byte per sample, so the WAV
    * data chunk is the input verbatim and the roundtrip is bit-exact. */
  private def pcmFormat: AudioFormat = new AudioFormat(16000f, 8, 1, false, false)

  def encodeWav(pcm: Array[Byte]): Array[Byte] = {
    if (pcm.isEmpty) return Array.emptyByteArray
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), pcmFormat, pcm.length.toLong)
    val bos = new ByteArrayOutputStream(pcm.length + 64)
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def decodeWav(wav: Array[Byte]): Array[Byte] = {
    if (wav.isEmpty) return Array.emptyByteArray
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    try in.readAllBytes() finally in.close()
  }

  /** Chunk `bytes` into `frameBytes`-sized frames, each a lossless BMP,
    * length-prefixed (4-byte big-endian) so a reader can seek past frames
    * it does not decode. */
  def encodeFrameContainer(bytes: Array[Byte], frameBytes: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length * 2 + 64)
    val out = new DataOutputStream(bos)
    var off = 0
    while (off < bytes.length) {
      val end = math.min(off + frameBytes, bytes.length)
      val frame = encodeBmp(java.util.Arrays.copyOfRange(bytes, off, end))
      out.writeInt(frame.length)
      out.write(frame)
      off = end
    }
    out.flush()
    bos.toByteArray
  }

  /** Demux WITHOUT decoding: the still-encoded image frame bytes, in order.
    * A sampler decodes only the frames it keeps. */
  def demuxFrames(container: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val in = new DataInputStream(new ByteArrayInputStream(container))
      override def hasNext: Boolean = in.available() >= 4
      override def next(): Array[Byte] = {
        val frame = new Array[Byte](in.readInt())
        in.readFully(frame)
        frame
      }
    }
}
