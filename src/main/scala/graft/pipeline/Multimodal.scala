package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with per-partition batched feature extraction.
  *
  * The decode step is a DETERMINISTIC STUB — this container has no
  * image/audio codecs — but the Spark-side shape is real: binary columns
  * with metadata structs, partition-preserving `mapPartitions` over a typed
  * `Dataset` (the Scala analogue of `mapInPandas` batch processing), and a
  * declared output schema. Swapping the stub for a JNI/codec call changes
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
}
