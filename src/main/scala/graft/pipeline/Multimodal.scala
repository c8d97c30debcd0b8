package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with per-partition batched feature extraction.
  *
  * Two formats decode FOR REAL, pure-JVM (no codec libraries needed):
  * uncompressed 24-bit BMP ([[decodeBmp]] — header parse, bottom-up row
  * order, 4-byte row padding, per-channel pixel statistics) and PCM WAV
  * ([[decodeWav]] — RIFF chunk walk, 16-bit little-endian samples,
  * amplitude statistics). Compressed formats (JPEG/MP3/H.264) remain a
  * DETERMINISTIC STUB ([[extractFeatures]]) — this container has no
  * codecs — but the Spark-side shape is identical: binary columns with
  * typed metadata, partition-preserving `mapPartitions` over a typed
  * `Dataset` (the Scala analogue of `mapInPandas` batch processing), and a
  * declared output schema. Swapping a stub for a JNI/codec call changes
  * nothing structurally.
  */
object Multimodal {

  final case class BinaryDoc(id: Long, payload: Array[Byte], format: String, n_bytes: Int)
  final case class DocFeatures(
      id: Long,
      n_bytes: Int,
      head_byte: Int,
      tail_byte: Int,
      byte_sum_mod: Long,
      feature: Array[Double])

  /** Treat a text column as an opaque binary payload with typed metadata —
    * the storage shape image/audio/video columns use (binary + meta). */
  def asBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("fake/raw").as("format"),
      length(encode(col(textCol), "UTF-8")).as("n_bytes"))

  /** Batched per-partition feature extraction (decode STUB).
    *
    * Real decoders plug in here: the iterator-in/iterator-out shape keeps
    * memory bounded to one batch regardless of partition size and preserves
    * partitioning (no shuffle).
    */
  def extractFeatures(ds: Dataset[BinaryDoc]): Dataset[DocFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { doc =>
        // --- STUB decode: deterministic pseudo-features from raw bytes ---
        val bytes = doc.payload
        val head = if (bytes.nonEmpty) bytes.head & 0xff else 0
        val tail = if (bytes.nonEmpty) bytes.last & 0xff else 0
        var s = 0L
        var i = 0
        while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
        val feat = Array.tabulate(8)(k => ((s + k * 31 + head) % 997).toDouble / 997.0)
        DocFeatures(doc.id, bytes.length, head, tail, s % 997, feat)
      }
    }
  }

  /** "Frame sampling": take k evenly spaced fixed-width slices of the
    * payload (what frame extraction looks like structurally — offset
    * computation + slice — without a codec). Pure Column ops. */
  def frameSample(bin: DataFrame, k: Int, frameBytes: Int = 16): DataFrame = {
    val frames = (0 until k).map { f =>
      struct(
        lit(f).as("frame"),
        substring(
          col("payload"),
          // explicit floor: integer-division semantics identical across
          // engines (double casts round rather than truncate in some)
          (floor(col("n_bytes") * f / k) + 1).cast("int"),
          lit(frameBytes)).as("bytes"))
    }
    bin.select(col("id"), explode(array(frames: _*)).as("fr"))
      .select(col("id"), col("fr.frame").as("frame"), col("fr.bytes").as("frame_bytes"))
  }

  /** End-to-end helper: documents table → binary → features DataFrame. */
  def documentFeatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val bin = asBinary(documents, "doc_id", "text").as[BinaryDoc]
    extractFeatures(bin).toDF()
  }

  // ------------------------------------------------------------------
  // Real decoders: uncompressed 24-bit BMP and 16-bit PCM WAV. Both are
  // codec-free container formats, so a full spec-compliant decode needs
  // nothing beyond byte arithmetic — header parse, layout (row padding /
  // chunk walk), and sample statistics.
  // ------------------------------------------------------------------

  final case class BmpFeatures(
      doc_id: Long, width: Int, height: Int,
      mean_b: Double, mean_g: Double, mean_r: Double)

  final case class WavFeatures(
      doc_id: Long, n_samples: Long, sample_rate: Int,
      mean_amp: Double, peak_amp: Long)

  private def le32At(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | (b(i + 1) & 0xff) << 8 | (b(i + 2) & 0xff) << 16 | (b(i + 3) & 0xff) << 24
  private def le16At(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | (b(i + 1) & 0xff) << 8

  /** Deterministic spec-compliant BMP fixture: BITMAPFILEHEADER +
    * BITMAPINFOHEADER + BI_RGB 24-bit pixel rows (bottom-up, 4-byte
    * padded). Every pixel-area byte at absolute file offset `m` is
    * `(id·31 + m) mod 256`, so the decoded per-channel means have a closed
    * form a SQL oracle can compute independently. */
  def syntheticBmp(id: Long, width: Int = 5, height: Int = 4): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    val off = 54
    val size = off + stride * height
    val b = new Array[Byte](size)
    def le32(pos: Int, v: Int): Unit = {
      b(pos) = (v & 0xff).toByte; b(pos + 1) = ((v >> 8) & 0xff).toByte
      b(pos + 2) = ((v >> 16) & 0xff).toByte; b(pos + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(pos: Int, v: Int): Unit = {
      b(pos) = (v & 0xff).toByte; b(pos + 1) = ((v >> 8) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, off)
    le32(14, 40); le32(18, width); le32(22, height)
    le16(26, 1); le16(28, 24); le32(30, 0) // planes, bpp, BI_RGB
    le32(34, stride * height); le32(38, 2835); le32(42, 2835)
    var m = off
    while (m < size) { b(m) = ((id * 31 + m) % 256).toByte; m += 1 }
    b
  }

  /** Decode an uncompressed bottom-up 24-bit BMP: validates the magic,
    * header type, bit depth and compression fields, honors `bfOffBits` and
    * the 4-byte row stride, and returns per-channel pixel means. */
  def decodeBmp(id: Long, bytes: Array[Byte]): BmpFeatures = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', s"doc $id: not a BMP")
    val off = le32At(bytes, 10)
    require(le32At(bytes, 14) == 40, s"doc $id: not BITMAPINFOHEADER")
    val w = le32At(bytes, 18)
    val h = le32At(bytes, 22)
    require(w > 0 && h > 0, s"doc $id: top-down or empty BMP unsupported")
    require(le16At(bytes, 28) == 24, s"doc $id: only 24-bit BMP supported")
    require(le32At(bytes, 30) == 0, s"doc $id: only BI_RGB (uncompressed) supported")
    val stride = ((w * 3 + 3) / 4) * 4
    require(bytes.length >= off + stride * h, s"doc $id: truncated pixel array")
    var sb = 0L; var sg = 0L; var sr = 0L
    var row = 0
    while (row < h) { // file order; channel stats are row-order invariant
      var x = 0
      val base = off + row * stride
      while (x < w) {
        sb += bytes(base + 3 * x) & 0xff
        sg += bytes(base + 3 * x + 1) & 0xff
        sr += bytes(base + 3 * x + 2) & 0xff
        x += 1
      }
      row += 1
    }
    val n = (w.toLong * h).toDouble
    BmpFeatures(id, w, h, sb / n, sg / n, sr / n)
  }

  final case class BmpAHash(
      doc_id: Long, width: Int, height: Int, ahash: Long, n_set: Int)

  /** Perceptual average-hash of a decoded 24-bit BMP: one bit per pixel,
    * set iff the pixel's brightness exceeds the image mean — the classic
    * aHash near-duplicate signature (tolerant to re-encode and small
    * edits; compose with [[graft.pipeline.Dedup.hammingPairs]] for banded
    * near-dup search). Production images resize to 8×8 before hashing;
    * here the grid IS small, and the resize step would slot in before the
    * threshold.
    *
    * All arithmetic is EXACT integers: brightness = b+g+r (0..765) and
    * the threshold compares gray·n > Σgray — no float mean, so the hash
    * is bit-reproducible on any engine. Bit order is file order
    * (bottom-up rows), index row·width+x. Requires w·h ≤ 63 (one long).
    */
  def aHashBmp(id: Long, bytes: Array[Byte]): BmpAHash = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', s"doc $id: not a BMP")
    val off = le32At(bytes, 10)
    require(le32At(bytes, 14) == 40, s"doc $id: not BITMAPINFOHEADER")
    val w = le32At(bytes, 18)
    val h = le32At(bytes, 22)
    require(w > 0 && h > 0, s"doc $id: top-down or empty BMP unsupported")
    require(w.toLong * h <= 63, s"doc $id: aHash grid must fit one long (w·h ≤ 63)")
    require(le16At(bytes, 28) == 24, s"doc $id: only 24-bit BMP supported")
    require(le32At(bytes, 30) == 0, s"doc $id: only BI_RGB (uncompressed) supported")
    val stride = ((w * 3 + 3) / 4) * 4
    require(bytes.length >= off + stride * h, s"doc $id: truncated pixel array")
    val n = w * h
    val gray = new Array[Long](n)
    var tot = 0L
    var row = 0
    while (row < h) {
      val base = off + row * stride
      var x = 0
      while (x < w) {
        val g = (bytes(base + 3 * x) & 0xff).toLong +
          (bytes(base + 3 * x + 1) & 0xff) + (bytes(base + 3 * x + 2) & 0xff)
        gray(row * w + x) = g
        tot += g
        x += 1
      }
      row += 1
    }
    var hash = 0L
    var set = 0
    var i = 0
    while (i < n) {
      if (gray(i) * n > tot) { hash |= (1L << i); set += 1 }
      i += 1
    }
    BmpAHash(id, w, h, hash, set)
  }

  /** Batched aHash over a binary image column (iterator-in/iterator-out,
    * partition-preserving — the [[extractFeatures]] shape). */
  def bmpAHashes(ds: Dataset[BinaryDoc]): Dataset[BmpAHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(d => aHashBmp(d.id, d.payload)))
  }

  /** Deterministic PCM WAV fixture: RIFF/WAVE with a canonical fmt chunk
    * (mono, 16-bit, `sampleRate`) and a data chunk whose k-th sample is
    * `(id·7 + k·13) mod 65536 − 32768` — again closed-form for the oracle. */
  def syntheticWav(id: Long, nSamples: Int = 64, sampleRate: Int = 8000): Array[Byte] = {
    val dataBytes = nSamples * 2
    val b = new Array[Byte](44 + dataBytes)
    def le32(pos: Int, v: Int): Unit = {
      b(pos) = (v & 0xff).toByte; b(pos + 1) = ((v >> 8) & 0xff).toByte
      b(pos + 2) = ((v >> 16) & 0xff).toByte; b(pos + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(pos: Int, v: Int): Unit = {
      b(pos) = (v & 0xff).toByte; b(pos + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(pos: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(b, pos)
    tag(0, "RIFF"); le32(4, 36 + dataBytes); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1); le16(22, 1) // PCM, mono
    le32(24, sampleRate); le32(28, sampleRate * 2); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, dataBytes)
    var k = 0
    while (k < nSamples) {
      le16(44 + 2 * k, (((id * 7 + k * 13) % 65536) - 32768).toInt & 0xffff)
      k += 1
    }
    b
  }

  /** Decode a PCM WAV by walking the RIFF chunk list (fmt may not
    * immediately precede data in the wild — the walk handles any order and
    * skips unknown chunks, including odd-length padding). Returns sample
    * count, rate, mean amplitude, and peak |amplitude|. */
  def decodeWav(id: Long, bytes: Array[Byte]): WavFeatures = {
    require(bytes.length >= 44, s"doc $id: truncated WAV")
    def tagAt(i: Int) = new String(bytes, i, 4, "US-ASCII")
    require(tagAt(0) == "RIFF" && tagAt(8) == "WAVE", s"doc $id: not a RIFF/WAVE")
    var pos = 12
    var rate = -1; var bits = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length) {
      val tg = tagAt(pos)
      val len = le32At(bytes, pos + 4)
      tg match {
        case "fmt " =>
          require(le16At(bytes, pos + 8) == 1, s"doc $id: only PCM WAV supported")
          channels = le16At(bytes, pos + 10)
          rate = le32At(bytes, pos + 12)
          bits = le16At(bytes, pos + 22)
        case "data" => dataOff = pos + 8; dataLen = len
        case _ => // skip unknown chunk
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && dataOff >= 0, s"doc $id: missing fmt/data chunk")
    require(bits == 16 && channels == 1, s"doc $id: only mono 16-bit supported")
    val n = dataLen / 2
    var sum = 0L; var peak = 0L
    var k = 0
    while (k < n) {
      val v = le16At(bytes, dataOff + 2 * k).toShort.toLong
      sum += v
      val a = math.abs(v)
      if (a > peak) peak = a
      k += 1
    }
    WavFeatures(id, n.toLong, rate, if (n > 0) sum.toDouble / n else 0.0, peak)
  }

  /** Batched BMP decode over a binary Dataset — same iterator-in/
    * iterator-out shape as [[extractFeatures]], real decode. */
  def bmpFeatures(ds: Dataset[BinaryDoc]): Dataset[BmpFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(d => decodeBmp(d.id, d.payload)))
  }

  /** Batched WAV decode over a binary Dataset. */
  def wavFeatures(ds: Dataset[BinaryDoc]): Dataset[WavFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(d => decodeWav(d.id, d.payload)))
  }
}
