package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal}

/** Scratch: throughput of the multimodal family at a ×100-scale binary
  * corpus — 500k synthetic 32×32 BMPs (~3.1 KB payload each, ≈1.5 GB
  * raw) and 500k 256-sample WAVs, written ONCE as a parquet binary
  * column and re-read per measurement so the numbers include the real
  * scan of binary data, not Dataset-in-memory shortcuts. Measures the
  * typed decode path (header walk + pixel/sample statistics), the
  * aHash, and the banded-Hamming near-dup join over the hashes — the
  * q39/q151/q152/q68 shapes at 1000× the driver fixture. Not part of
  * the driver contract. */
object ProfMultimodal {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROF_N", "500000").toLong
    val iters = sys.env.getOrElse("PROF_ITERS", "2").toInt
    val dir = sys.env.getOrElse("PROF_MM_DIR", "/tmp/x100mm")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val bmpPath = s"$dir/bmp.parquet"
    val bmpSmallPath = s"$dir/bmp_small.parquet" // aHash grid: w·h ≤ 63
    val wavPath = s"$dir/wav.parquet"
    def gen(path: String)(mk: Long => Multimodal.BinaryDoc): Unit =
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        spark.range(0, n, 1, 32).as[Long].map(mk)
          .toDF().write.mode("overwrite").parquet(path)
    gen(bmpPath) { id =>
      val b = Multimodal.syntheticBmp(id, width = 32, height = 32)
      Multimodal.BinaryDoc(id, b, "image/bmp", b.length)
    }
    // the post-resize shape aHash consumes (production resizes to ~8×8
    // before hashing; 7×9 = 63 bits fills the one-long grid exactly).
    // syntheticBmp's pixel fill is id mod 256 — only 256 distinct images
    // at any size, which makes every LSH band bucket quadratic (measured:
    // the pair join never finishes at 500k). Near-dup needs a DIVERSE
    // corpus: refill the pixel area from splitmix64(id) so hashes are
    // ~uniform, and plant one near-duplicate per 100 ids (id ≡ 1 mod 100
    // copies id−1 with a single brightened pixel) so the join has real
    // positives to surface.
    gen(bmpSmallPath) { id =>
      val seed = if (id % 100 == 1) id - 1 else id
      val b = Multimodal.syntheticBmp(seed, width = 7, height = 9)
      var x = seed * 0x9E3779B97F4A7C15L
      var m = 54
      while (m < b.length) {
        x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
        x ^= x >>> 27; x *= 0x94D049BB133111EBL
        x ^= x >>> 31
        b(m) = (x & 0xff).toByte
        m += 1
      }
      if (id % 100 == 1) b(54) = (~b(54)).toByte
      Multimodal.BinaryDoc(id, b, "image/bmp", b.length)
    }
    gen(wavPath) { id =>
      val b = Multimodal.syntheticWav(id, nSamples = 256)
      Multimodal.BinaryDoc(id, b, "audio/wav", b.length)
    }
    val bmpBytes = spark.read.parquet(bmpPath)
      .agg(sum(length(col("payload")))).head.getLong(0)
    println(f"[prof] n=$n bmp_payload=${bmpBytes / 1e6}%.0f MB")

    def time(name: String, rows: Long = n)(f: => Long): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val out = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name: $dt%.2f s out=$out rows/s=${rows / dt}%.0f")
        dt
      }
      println(f"[prof] $name MIN: ${ts.min}%.2f s (${rows / ts.min / 1e6}%.2f M rows/s)")
    }

    def bmpDs = spark.read.parquet(bmpPath).as[Multimodal.BinaryDoc]
    def bmpSmallDs = spark.read.parquet(bmpSmallPath).as[Multimodal.BinaryDoc]
    def wavDs = spark.read.parquet(wavPath).as[Multimodal.BinaryDoc]

    time("bmp_decode_features") {
      Multimodal.bmpFeatures(bmpDs).toDF().queryExecution.toRdd.count()
    }
    time("bmp_ahash") {
      Multimodal.bmpAHashes(bmpSmallDs).toDF().queryExecution.toRdd.count()
    }
    time("bmp_neardup_pairs") {
      val hashes = Multimodal.bmpAHashes(bmpSmallDs).toDF()
      Dedup.hammingPairs(hashes, "doc_id", "ahash", bits = 20, maxHamming = 3)
        .queryExecution.toRdd.count()
    }
    time("wav_decode_features") {
      Multimodal.wavFeatures(wavDs).toDF().queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
