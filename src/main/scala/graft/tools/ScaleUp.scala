package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for throughput measurement.
  *
  * The driver ships sf0.001/0.01/0.1; the scaling claim in BENCH_NOTES.md
  * needs at least one point an order of magnitude up. This tool replicates
  * the three bench tables `factor` times with deterministic per-replica
  * transforms chosen so the *workload shape* scales the way a real corpus
  * would:
  *
  *   - `lineitem`: rows replicate with shifted `l_orderkey`; the FE columns
  *     (`l_returnflag`, `l_linestatus`) keep their original low cardinality,
  *     so compress-strategy cell counts stay constant while scan volume
  *     grows linearly — exactly the regime the reference's 178M-row
  *     benchmark exercises (BASELINE.md).
  *   - `documents`: `doc_id` shifts per replica and every token is salted
  *     with a replica tag, so intra-replica duplicate/near-duplicate
  *     structure is preserved verbatim while NO cross-replica similarity
  *     exists. Duplicate-pair counts therefore scale linearly (x factor),
  *     not quadratically — replicating text unchanged would turn every doc
  *     into a factor-sized duplicate class and benchmark a different
  *     problem.
  *   - `embeddings`: `vec_id` shifts per replica and the vector is rotated
  *     by the replica index, decorrelating replicas; replica 0 is kept
  *     bit-identical so the bench's fixed query ids (0..4) still exist.
  *
  * Output is written as one directory per table (`<dst>/<table>.parquet/`)
  * with `partitions` part-files, so reads split across cores — the
  * driver-shipped single-row-group files cannot (see PLANS.md).
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <factor> [partitions] [tables]
  * `tables` = comma list (default lineitem,documents,embeddings) — big-factor
  * runs that only need one table (the 178M-row baseline replication) skip
  * the rest.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleUp <srcSfDir> <dstDir> <factor> [partitions] [tables]")
    val src = args(0)
    val dst = args(1)
    val factor = args(2).toInt
    val partitions = if (args.length > 3) args(3).toInt else 32
    val tables: Set[String] =
      (if (args.length > 4) args(4).split(",").map(_.trim).toSet
       else Set("lineitem", "documents", "embeddings"))
    // `events` is opt-in via the tables arg (the default bench tables
    // above predate it)
    require(factor >= 1, s"factor must be >= 1, got $factor")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame)(transform: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => transform(df, r)).reduce(_ unionAll _)

    val keyStride = 1L << 40 // far above any driver-generated key

    // lineitem: shift the order key past the source key space per replica.
    if (tables("lineitem")) {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val liScaled = replicate(li) { (d, r) =>
        d.withColumn("l_orderkey", col("l_orderkey") + lit(r * keyStride))
      }
      liScaled.repartition(partitions)
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    }

    // documents: salt every token for r > 0 (replica 0 stays verbatim).
    // Salting each token rewrites every shingle, so MinHash/Jaccard see
    // zero cross-replica similarity while within-replica pairs persist.
    if (tables("documents")) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val docsScaled = replicate(docs) { (d, r) =>
        if (r == 0) d
        else {
          val salted = concat_ws(" ",
            transform(split(col("text"), " "), w => concat(w, lit(s"q$r"))))
          d.withColumn("doc_id", col("doc_id") + lit(r * keyStride))
            .withColumn("text", salted)
            .withColumn("n_chars", length(salted))
        }
      }
      docsScaled.repartition(partitions)
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    }

    // events: each replica shifts the TIMELINE by the source span (plus a
    // day of slack), not the density — a corpus 100x the size spans more
    // time at the same events/hour, so time-bucketed joins and windowed
    // aggs scale linearly in matches the way a real longer stream would.
    // Replicating timestamps verbatim would multiply per-bucket density by
    // `factor` and benchmark a quadratically different join problem.
    // Decode `ts` to epoch-µs via the schema probe (EventTime — works on
    // TIMESTAMP, TIMESTAMP_NTZ, and legacy raw-nanos reads alike), shift
    // in integer µs, and re-encode with timestamp_micros so the replica
    // parquet keeps a timestamp-typed `ts` the same probe decodes.
    if (tables("events")) {
      val evRaw = spark.read.parquet(s"$src/events.parquet")
      val ev = graft.sources.EventTime.withEpochMicros(evRaw, out = "__tus")
      val span = ev.agg(max(col("__tus")) - min(col("__tus")))
        .collect()(0).getLong(0) + 86400L * 1000000L
      val evScaled = replicate(ev) { (d, r) =>
        d.withColumn("event_id", col("event_id") + lit(r * keyStride))
          .withColumn("user_id", col("user_id") + lit(r * keyStride))
          .withColumn("__tus", col("__tus") + lit(r * span))
      }
      evScaled
        .withColumn("ts", timestamp_micros(col("__tus")))
        .drop("__tus")
        .select(evRaw.columns.map(col).toIndexedSeq: _*)
        .repartition(partitions)
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
    }

    // orders: shift o_orderkey by the SAME stride as lineitem, so
    // orderkey-joins (e.g. the Bloom semi join) keep per-replica
    // referential integrity and match counts scale linearly.
    if (tables("orders")) {
      val o = spark.read.parquet(s"$src/orders.parquet")
      val oScaled = replicate(o) { (d, r) =>
        d.withColumn("o_orderkey", col("o_orderkey") + lit(r * keyStride))
      }
      oScaled.repartition(partitions)
        .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    }

    // part: shift p_partkey and salt p_brand per replica (r 0 verbatim) —
    // a 10x parts catalog has more brands, not 10x-deeper (brand, size)
    // blocks; leaving the blocking keys unsalted would grow every
    // linkage block by `factor` and benchmark a quadratically harder
    // per-block join than a real catalog poses.
    if (tables("part")) {
      val p = spark.read.parquet(s"$src/part.parquet")
      val pScaled = replicate(p) { (d, r) =>
        if (r == 0) d
        else d.withColumn("p_partkey", col("p_partkey") + lit(r * keyStride))
          .withColumn("p_brand", concat(col("p_brand"), lit(s"-r$r")))
      }
      pScaled.repartition(partitions)
        .write.mode("overwrite").parquet(s"$dst/part.parquet")
    }

    // embeddings: rotate the vector by r to decorrelate replicas; cast back
    // to array<float> so the schema matches the driver's tables.
    if (tables("embeddings")) {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val embScaled = replicate(emb) { (d, r) =>
        if (r == 0) d
        else {
          val e = col("embedding")
          val rot = lit(r) % size(e) // keep the shift inside the vector length
          val rotated = concat(slice(e, rot + lit(1), size(e) - rot), slice(e, lit(1), rot))
          d.withColumn("vec_id", col("vec_id") + lit(r * keyStride))
            .withColumn("embedding", rotated.cast("array<float>"))
        }
      }
      embScaled.repartition(partitions)
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    }

    val rows = tables.toSeq.sorted.map { t =>
      t -> spark.read.parquet(s"$dst/$t.parquet").count()
    }
    println(rows.map { case (t, n) => s"$t=$n" }.mkString(s"[scaleup] x$factor -> $dst: ", ", ", ""))
    spark.stop()
  }
}
