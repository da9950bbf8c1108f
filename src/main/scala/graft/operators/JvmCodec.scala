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

  /** Lossless 8-bit grayscale PNG of `bytes` as an n x 1 scanline. */
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

  /** Decode any grayscale PNG back to its sample bytes, row-major. */
  def decodePng(png: Array[Byte]): Array[Byte] = {
    if (png.isEmpty) return Array.emptyByteArray
    val img = ImageIO.read(new ByteArrayInputStream(png))
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
  }

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

  /** Chunk `bytes` into `frameBytes`-sized frames, each a lossless PNG,
    * length-prefixed (4-byte big-endian) so a reader can seek past frames
    * it does not decode. */
  def encodeFrameContainer(bytes: Array[Byte], frameBytes: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length * 2 + 64)
    val out = new DataOutputStream(bos)
    var off = 0
    while (off < bytes.length) {
      val end = math.min(off + frameBytes, bytes.length)
      val png = encodePng(java.util.Arrays.copyOfRange(bytes, off, end))
      out.writeInt(png.length)
      out.write(png)
      off = end
    }
    out.flush()
    bos.toByteArray
  }

  /** Demux WITHOUT decoding: the still-encoded PNG frame bytes, in order.
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
