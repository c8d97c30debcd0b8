package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch: throughput of the stateful streaming family at the ×100
  * events point (10M rows, 150k users) — the one family with correctness
  * parity specs but no recorded scale numbers. Drives the REAL
  * micro-batch machinery (parquet file source → state store →
  * foreachBatch) with Trigger.AvailableNow in two regimes: one
  * all-files batch (state-store overhead vs the batch twin) and
  * maxFilesPerTrigger=8 (8 micro-batches — cross-batch state handoff,
  * the production cadence shape). Watermark is set past the replica's
  * 8.5-year span so no event is late-dropped and no timeout fires:
  * output is deterministic and state holds its true bound (≤1 open
  * session per user; one row per (hour, event_type) window). Not part
  * of the driver contract. */
object ProfStreaming {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_EV_DIR", "/tmp/x100")
    val iters = sys.env.getOrElse("PROF_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val nIn = spark.read.parquet(path).count()
    println(s"[prof] dir=$dir events=$nIn")

    def stream(maxFiles: Option[Int]): DataFrame = {
      val r = spark.readStream.schema(schema)
      maxFiles.fold(r)(m => r.option("maxFilesPerTrigger", m)).parquet(path)
    }

    // far past the replica's max event time: nothing late, no timeouts
    val wm = "200000 hours"

    def run(name: String, mk: DataFrame => DataFrame,
            mode: String, maxFiles: Option[Int]): Unit = {
      val ts = (1 to iters).map { i =>
        var rows = 0L
        var batches = 0L
        val ckpt = s"/tmp/profstream_ckpt/${name}_${i}_${System.nanoTime()}"
        val t0 = System.nanoTime()
        val q = mk(stream(maxFiles)).writeStream
          .outputMode(mode)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) =>
            rows += b.count(); batches += 1
          }
          .start()
        q.awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name: $dt%.2f s out_rows=$rows batches=$batches " +
          f"in_rows/s=${nIn / dt}%.0f")
        dt
      }
      println(f"[prof] $name MIN: ${ts.min}%.2f s " +
        f"(${nIn / ts.min / 1e6}%.2f M rows/s)")
    }

    // 1. custom-state flagship: gap sessionization (flatMapGroupsWithState)
    run("sessionize_1batch",
      df => streaming.StreamingReg.streamingSessionize(
        df, "ts", "user_id", "value", gapMs = 30L * 60 * 1000, watermark = wm),
      "append", None)
    run("sessionize_8batch",
      df => streaming.StreamingReg.streamingSessionize(
        df, "ts", "user_id", "value", gapMs = 30L * 60 * 1000, watermark = wm),
      "append", Some(8))

    // 1b. the other custom-state op: 3-step funnel (view → click →
    // purchase), state = first order-respecting match time per step
    run("funnel_1batch",
      df => streaming.StreamingReg.streamingFunnel(
        df, "ts", "user_id", "event_type",
        Seq("view", "click", "purchase"), watermark = wm),
      "append", None)

    // 1c. stream-stream bucketized range join: every purchase joins the
    // same user's clicks in the preceding 10 minutes (~2M × ~2M events)
    if (sys.env.get("PROF_ATTRIB").contains("1")) {
      val ts = (1 to iters).map { i =>
        var rows = 0L
        val ckpt = s"/tmp/profstream_ckpt/attrib_${i}_${System.nanoTime()}"
        val t0 = System.nanoTime()
        def side(et: String, prefix: String): DataFrame =
          stream(None).filter(col("event_type") === et)
            .select(col("ts"), col("user_id").as(s"${prefix}_user"),
              col("event_id").as(s"${prefix}_id"))
        val joined = streaming.StreamingReg.streamingAttribution(
            side("purchase", "p"), side("click", "t"), "ts",
            windowUs = 600000000L, watermark = wm)
          .filter(col("p_user") === col("t_user"))
        val q = joined.writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) => rows += b.count() }
          .start()
        q.awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] attribution_1batch: $dt%.2f s out_rows=$rows " +
          f"in_rows/s=${nIn / dt}%.0f")
        dt
      }
      println(f"[prof] attribution_1batch MIN: ${ts.min}%.2f s")
    }

    // 2. built-in watermarked tumbling-window agg (hour × event_type)
    run("windowed_agg_1batch",
      df => streaming.StreamingReg.windowedEventAgg(
        df, "ts", "event_type", "value", window_ = "1 hour", watermark = wm),
      "update", None)
    run("windowed_agg_8batch",
      df => streaming.StreamingReg.windowedEventAgg(
        df, "ts", "event_type", "value", window_ = "1 hour", watermark = wm),
      "update", Some(8))

    // 3. bounded-state exact dedup (user × type × day fingerprint)
    val fp = md5(concat_ws("|",
      col("user_id"), col("event_type"), date_trunc("day", col("ts"))))
    run("dedup_1batch",
      df => streaming.StreamingReg.streamingDedup(df, "ts", fp, watermark = wm),
      "append", None)

    // ordered replay: a time-range-partitioned copy (part-00000 holds the
    // earliest range; the file source lists ties in path order) makes the
    // 8-batch replay arrive time-ordered ACROSS batches, so a realistic
    // watermark is semantically exact: emitted rows must equal the
    // 1-batch run's (cross-batch state handoff + event-time timeouts
    // exercised for real, zero late drops by construction)
    if (sys.env.get("PROF_ORDERED").contains("1")) {
      val sortedPath = s"$dir/events_tsorted.parquet"
      if (!new java.io.File(s"$sortedPath/_SUCCESS").exists()) {
        spark.read.parquet(path)
          .repartitionByRange(64, col("ts"))
          .sortWithinPartitions("ts")
          .write.mode("overwrite").parquet(sortedPath)
        // the file source lists by (mtime, path); all parts share one
        // mtime, so stamp strictly increasing mtimes in range order to
        // guarantee batch k's files precede batch k+1's in event time
        val parts = new java.io.File(sortedPath).listFiles()
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        val base = System.currentTimeMillis() - parts.length * 2000L
        parts.zipWithIndex.foreach { case (f, i) =>
          f.setLastModified(base + i * 2000L)
        }
      }
      def orderedStream(maxFiles: Int): DataFrame =
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", maxFiles).parquet(sortedPath)
      // A/B the state-store provider: the default HDFS-backed store
      // rewrites a full snapshot per batch; RocksDB maintains incremental
      // SST state — the production choice for large keyed state
      for (store <- Seq("hdfs", "rocksdb")) {
        if (store == "rocksdb")
          spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        else spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        val ts = (1 to iters).map { i =>
          var rows = 0L
          var batches = 0L
          val ckpt = s"/tmp/profstream_ckpt/ordered_${store}_${i}_${System.nanoTime()}"
          val t0 = System.nanoTime()
          val q = streaming.StreamingReg.streamingSessionize(
              orderedStream(8), "ts", "user_id", "value",
              gapMs = 30L * 60 * 1000, watermark = "1 hour")
            .writeStream
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              rows += b.count(); batches += 1
            }
            .start()
          q.awaitTermination()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[prof] sessionize_8batch_ordered[$store]: $dt%.2f s " +
            f"out_rows=$rows batches=$batches in_rows/s=${nIn / dt}%.0f")
          dt
        }
        println(f"[prof] sessionize_8batch_ordered[$store] MIN: ${ts.min}%.2f s " +
          f"(${nIn / ts.min / 1e6}%.2f M rows/s)")
      }
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    // big-state store crossover: hour × USER windowed agg (~9.7M state
    // rows vs sessionize's 150k) over the ordered 8-batch replay — the
    // regime where incremental SST maintenance should beat full
    // in-memory-map snapshots
    if (sys.env.get("PROF_BIGSTATE").contains("1")) {
      val sortedPath = s"$dir/events_tsorted.parquet"
      require(new java.io.File(s"$sortedPath/_SUCCESS").exists(),
        "run PROF_ORDERED=1 first to build the sorted replica")
      for (store <- Seq("hdfs", "rocksdb")) {
        if (store == "rocksdb")
          spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        else spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        var rows = 0L
        val ckpt = s"/tmp/profstream_ckpt/big_${store}_${System.nanoTime()}"
        val t0 = System.nanoTime()
        val q = streaming.StreamingReg.windowedEventAgg(
            spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 8).parquet(sortedPath),
            "ts", "user_id", "value", window_ = "1 hour", watermark = wm)
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) => rows += b.count() }
          .start()
        q.awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] bigstate_windowed_user[$store]: $dt%.2f s " +
          f"out_rows=$rows in_rows/s=${nIn / dt}%.0f")
      }
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    // batch twin of the sessionization for context: lag window + running
    // session index + per-session agg — same output cardinality
    val t0 = System.nanoTime()
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(path)
      .select(col("user_id").cast("string").as("k"),
        col("ts").cast("timestamp").as("ts"), col("value").as("v"))
    val w = Window.partitionBy("k").orderBy("ts")
    val nBatchSessions = ev
      .withColumn("__gap",
        when(unix_millis(col("ts")) -
          unix_millis(lag("ts", 1).over(w)) > 30L * 60 * 1000 ||
          lag("ts", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("__sid", sum("__gap").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("k", "__sid")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .count()
    val dtB = (System.nanoTime() - t0) / 1e9
    println(f"[prof] sessionize_batch_twin: $dtB%.2f s sessions=$nBatchSessions")
    spark.stop()
  }
}
