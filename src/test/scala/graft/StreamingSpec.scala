package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingReg

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming moments accumulate across micro-batches and solve to batch OLS") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Double, Double)] // (y, x)
    val df = input.toDF().toDF("y", "x")
    val agg = StreamingReg.momentsStream(df, "y", Seq("x"))
    val q = agg.writeStream.format("memory").queryName("mom").outputMode("complete").start()

    val batch1 = (1 to 50).map(i => (2.0 + 3.0 * i + (i % 5) * 0.1, i.toDouble))
    val batch2 = (51 to 100).map(i => (2.0 + 3.0 * i + (i % 5) * 0.1, i.toDouble))
    input.addData(batch1: _*); q.processAllAvailable()
    input.addData(batch2: _*); q.processAllAvailable()
    val row = spark.table("mom").collect()(0)
    q.stop()

    val beta = StreamingReg.solve(row, 1)
    // batch OLS on the union for comparison
    val all = batch1 ++ batch2
    val n = all.size.toDouble
    val sx = all.map(_._2).sum; val sy = all.map(_._1).sum
    val sxx = all.map(p => p._2 * p._2).sum; val sxy = all.map(p => p._1 * p._2).sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = sy / n - b1 * sx / n
    assert(math.abs(beta(0) - b0) < 1e-8, s"${beta(0)} vs $b0")
    assert(math.abs(beta(1) - b1) < 1e-8, s"${beta(1)} vs $b1")
  }

  test("streamed moments fit a ridge path identical to the batch fit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Double, Double, Double)] // (y, x1, x2)
    val df = input.toDF().toDF("y", "x1", "x2")
    val agg = StreamingReg.momentsStream(df, "y", Seq("x1", "x2"))
    val q = agg.writeStream.format("memory").queryName("rmom")
      .outputMode("complete").start()

    val rng = new scala.util.Random(23)
    val all = (1 to 300).map { _ =>
      val x1 = rng.nextDouble() * 10; val x2 = 0.4 * x1 + rng.nextGaussian()
      (1.0 + 2.0 * x1 - x2 + rng.nextGaussian(), x1, x2)
    }
    all.grouped(100).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    val row = spark.table("rmom").collect()(0)
    q.stop()

    val lambdas = Seq(0.0, 5.0, 500.0)
    val streamed = StreamingReg.solveRidge(row, Seq("x1", "x2"), lambdas)
    val batch = graft.reg.Ridge.path("y ~ x1 + x2", all.toDF("y", "x1", "x2"), lambdas)
    streamed.zip(batch).foreach { case (s, b) =>
      s.estimates.zip(b.estimates).foreach { case (se, be) =>
        assert(math.abs(se - be) < 1e-9, s"λ=${s.lambda}: $se vs $be")
      }
      assert(math.abs(s.dfEff - b.dfEff) < 1e-9)
      assert(math.abs(s.gcv - b.gcv) < 1e-6 * b.gcv)
    }
  }

  test("watermarked windowed aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "etype", "value")
    val agg = StreamingReg.windowedEventAgg(df, "ts", "etype", "value", "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("win").outputMode("complete").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData(
      (t(10, 5), "click", 1.0), (t(10, 40), "click", 2.0),
      (t(10, 20), "view", 5.0), (t(11, 10), "click", 3.0))
    q.processAllAvailable()
    val rows = spark.table("win")
      .select(col("window.start").cast("string"), col("etype"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    q.stop()
    assert(rows(("2024-01-01 10:00:00", "click")) == (2L, 3.0))
    assert(rows(("2024-01-01 10:00:00", "view")) == (1L, 5.0))
    assert(rows(("2024-01-01 11:00:00", "click")) == (1L, 3.0))
  }

  test("streaming dedup drops repeated fingerprints within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val out = StreamingReg.streamingDedup(df, "ts", md5(col("text")), "1 hour")
    val q = out.writeStream.format("memory").queryName("dd").outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    input.addData((t(0), "aaa"), (t(1), "bbb"), (t(2), "aaa"))
    q.processAllAvailable()
    input.addData((t(3), "aaa"), (t(4), "ccc"))
    q.processAllAvailable()
    val texts = spark.table("dd").collect().map(_.getString(1)).sorted
    q.stop()
    assert(texts.toSeq == Seq("aaa", "bbb", "ccc")) // dups within watermark dropped
  }

  test("streaming attribution matches the batch range join on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Timestamp)]
    val tIn = MemoryStream[(Long, Timestamp)]
    val joined = StreamingReg.streamingAttribution(
      pIn.toDF().toDF("p_id", "ts"), tIn.toDF().toDF("w_id", "ts"), "ts",
      windowUs = 600000000L, watermark = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    def t(m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")
    // triggers at :00 and :20; points inside, at the inclusive edge, and out
    tIn.addData((100L, t(0)), (101L, t(20)))
    pIn.addData((1L, t(5)), (2L, t(10)), (3L, t(15)), (4L, t(25)), (5L, t(31)))
    q.processAllAvailable()
    // advance both watermarks so bounded state can evict, then add a late
    // point that can only match the second trigger
    tIn.addData((102L, t(55)))
    pIn.addData((6L, t(56)))
    q.processAllAvailable()
    val got = spark.table("attr").select("p_id", "w_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    // batch truth from the bucketized range join over the same rows
    import graft.operators.RangeJoin
    val pts = Seq(1L -> t(5), 2L -> t(10), 3L -> t(15), 4L -> t(25),
      5L -> t(31), 6L -> t(56)).map { case (i, ts) => (i, ts.getTime) }
      .toDF("p_id", "p_ms")
    val ws = Seq(100L -> t(0), 101L -> t(20), 102L -> t(55)).map { case (i, ts) =>
      (i, ts.getTime, ts.getTime + 600000L)
    }.toDF("w_id", "lo", "hi")
    val expected = RangeJoin.pointInInterval(pts, "p_ms", ws, "lo", "hi", 600000L)
      .select("p_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"stream $got vs batch $expected")
    assert(got.contains((2L, 100L)) && got.contains((4L, 101L)) && got.contains((6L, 102L)))
    assert(!got.exists(_._1 == 5L)) // :31 is outside both windows
  }

  test("mapGroupsWithState running stats match direct computation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val df = input.toDF().toDF("k", "v")
    val out = StreamingReg.runningStatsPerKey(df, "k", "v")
    val q = out.writeStream.format("memory").queryName("rs").outputMode("update").start()
    input.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
    q.processAllAvailable()
    input.addData(("a", 5.0), ("b", 20.0))
    q.processAllAvailable()
    val rows = spark.table("rs").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    q.stop()
    // latest state for a: n=3 mean=3 var=4 ; b: n=2 mean=15 var=50
    assert(rows(("a", 3L))._1 == 3.0)
    assert(math.abs(rows(("a", 3L))._2 - 4.0) < 1e-12)
    assert(rows(("b", 2L)) == (15.0, 50.0))
  }

  test("minhash signatures are computable on a stream (narrow per-row ops)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.{Dedup, TextOps}
    val texts = Seq((1L, "the quick brown fox jumps"), (2L, "a completely different doc"))
    val input = MemoryStream[(Long, String)]
    val sigExpr = Dedup.minhashSigCol(
      org.apache.spark.sql.functions.array_distinct(
        TextOps.wordShingles(TextOps.tokens(col("text")), 2)))
    val out = input.toDF().toDF("id", "text").select(col("id"), sigExpr.as("sig"))
    val q = out.writeStream.format("memory").queryName("msig").outputMode("append").start()
    input.addData(texts: _*)
    q.processAllAvailable()
    val streamed = spark.table("msig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    q.stop()
    // identical to the batch signatures on the same rows
    val batch = Dedup.minhashSignatures(
      spark.createDataFrame(texts).toDF("id", "text"), "id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(streamed == batch)
  }

  test("PII redaction, markup strip, and chunking run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.TextOps
    val texts = Seq(
      (1L, "<p>mail a@b.co then</p> <b>one</b> two three four five six"),
      (2L, "<script>drop()</script>at 10.0.0.1 alpha beta gamma delta"))
    val input = MemoryStream[(Long, String)]
    def clean(df: org.apache.spark.sql.DataFrame) = df.select(col("id"),
      TextOps.redactPii(TextOps.stripMarkup(col("text"))).as("text"))
    val out = TextOps.chunkDocs(
      clean(input.toDF().toDF("id", "text")),
      "id", "text", chunkTokens = 4, overlap = 0)
    val q = out.writeStream.format("memory").queryName("pchunk").outputMode("append").start()
    input.addData(texts: _*)
    q.processAllAvailable()
    val streamed = spark.table("pchunk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    q.stop()
    val batch = TextOps.chunkDocs(
      clean(spark.createDataFrame(texts).toDF("id", "text")),
      "id", "text", chunkTokens = 4, overlap = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed == batch)
    // chunk text is lowercased by the tokenizer, so the tokens appear as
    // <email>/<ip> — the redaction demonstrably happened upstream, and no
    // markup token survived the strip
    assert(streamed.exists(_._3.contains("<email>")))
    assert(streamed.exists(_._3.contains("<ip>")))
    assert(!streamed.exists(t => t._3.contains("script") || t._3.contains("<p>")))
  }

  test("incremental span removal runs per micro-batch via foreachBatch, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    // the ingest shape: corpus span fingerprints are the frozen static
    // state; each micro-batch shard cleans against them exactly as the
    // batch operator would (removeDupSpansAgainst is aggs + joins, so the
    // streaming composition is foreachBatch — the dedupAgainst pattern)
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val fps = Dedup.spanFingerprints(corpus, "doc_id", "text", width = 3)
      .cache()
    val shard = Seq(
      (10L, "x alpha beta gamma y"), // corpus span strips
      (11L, "fresh words only here") // untouched
    )
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Dedup.removeDupSpansAgainst(fps, batch, "doc_id", "text",
            width = 3)
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
        got.synchronized { got ++= out }; ()
      }
      .start()
    input.addData(shard: _*)
    q.processAllAvailable()
    q.stop()
    val expected = Dedup.removeDupSpansAgainst(fps,
        shard.toDF("doc_id", "text"), "doc_id", "text", width = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(got.toSet == expected)
    // the corpus span really stripped through the stream path
    val doc10 = got.find(_._1 == 10L).get
    assert(doc10._2 == 3L && doc10._3 == "x y", s"got $doc10")
  }

  test("minhash ingest dedup streams from a frozen state via foreachBatch, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    // steady-state shape: the corpus rep/bucket tables are built ONCE
    // (minhashDedupState) and every micro-batch applies against them —
    // no corpus-side recompute per batch
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val state = Dedup.minhashDedupState(corpus, "doc_id", "text")
    state.reps.cache().count()
    state.buckets.cache().count()
    val shard = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (11L, "one two three four five six seven nine"),        // near dup
      (12L, "totally different words entirely here now"))
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Dedup.dedupAgainstState(state, batch, "doc_id", "text")
          .collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1))))
        got.synchronized { got ++= out }; ()
      }
      .start()
    input.addData(shard: _*)
    q.processAllAvailable()
    q.stop()
    val expected = Dedup.dedupAgainstState(state,
        shard.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got.toSet == expected)
    assert(expected.contains((10L, Some(1L))) &&
      expected.contains((12L, None)))
  }

  test("SemDeDup ingest streams from a frozen state via foreachBatch, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Similarity
    // the embedding-modality frozen state: codebook + valved members
    // built ONCE, each micro-batch of shard vectors applies against them
    val corpus = sf("sf0.001", "embeddings")
      .filter(col("vec_id") % 10 =!= 0)
    val state = Similarity.semDedupState(corpus, "vec_id", "embedding",
      k = 8, iters = 2, dim = 64)
    state.members.cache().count()
    val shardRows = sf("sf0.001", "embeddings")
      .filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Similarity.semDedupAgainst(state, batch, "vec_id",
            "embedding", threshold = 0.45)
          .collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1))))
        got.synchronized { got ++= out }; ()
      }
      .start()
    val (h1, h2) = shardRows.splitAt(shardRows.length / 2)
    input.addData(h1.toIndexedSeq: _*)
    q.processAllAvailable()
    input.addData(h2.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val expected = Similarity.semDedupAgainst(state,
        shardRows.toIndexedSeq.toDF("vec_id", "embedding"), "vec_id",
        "embedding", threshold = 0.45)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got.toSet == expected && expected.nonEmpty)
  }

  test("incremental line dedup runs per micro-batch via foreachBatch, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    // same ingest shape as span removal: the corpus line-fingerprint set
    // is the frozen static state, each micro-batch shard cleans against it
    val corpus = Seq(
      (1L, "cookie banner\nreal content")).toDF("doc_id", "text")
    val fps = Dedup.lineFingerprints(corpus, "doc_id", "text").cache()
    val shard = Seq(
      (10L, "cookie banner\nfresh words"), // corpus line strips
      (11L, "dup me\nother\ndup me"),      // within-shard: first stays
      (12L, "untouched page")
    )
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Dedup.removeDupLinesAgainst(fps, batch, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
        got.synchronized { got ++= out }; ()
      }
      .start()
    input.addData(shard: _*)
    q.processAllAvailable()
    q.stop()
    val expected = Dedup.removeDupLinesAgainst(fps,
        shard.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(got.toSet == expected)
    val doc10 = got.find(_._1 == 10L).get
    assert(doc10._2 == 1L && doc10._3 == "fresh words", s"got $doc10")
  }

  test("contamination ingest streams from a frozen state via foreachBatch, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    // the decontamination member of the frozen-state family: the eval
    // suite's shingle set is the static broadcast state, each micro-batch
    // shard probes it map-side (per-row measure, so shards decompose)
    val suite = Seq(
      (1L, "question answer pair benchmark text")).toDF("doc_id", "text")
    val state = Dedup.contaminationState(suite, "doc_id", "text", n = 2,
      suite = "s")
    state.shingles.cache().count()
    val shard = Seq(
      (10L, "question answer pair from the eval set"), // overlaps
      (11L, "completely fresh training document"),
      (12L, "answer pair benchmark")                   // overlaps more
    )
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Dedup.contaminationAgainst(state, batch, "doc_id", "text",
            n = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        got.synchronized { got ++= out }; ()
      }
      .start()
    val (h1, h2) = shard.splitAt(2)
    input.addData(h1: _*)
    q.processAllAvailable()
    input.addData(h2: _*)
    q.processAllAvailable()
    q.stop()
    val expected = Dedup.contaminationAgainst(state,
        shard.toDF("doc_id", "text"), "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet == expected && expected.nonEmpty)
    assert(got.find(_._1 == 11L).exists(_._3 == 0L))
    assert(got.find(_._1 == 12L).exists(_._3 > 0L))
  }

  test("decontamination scrub streams via foreachBatch, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    // the scrub is a pure per-row function of the frozen suite state
    // (mask + rebuild never cross documents), so shards decompose
    val suite = Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val state = Dedup.contaminationState(suite, "doc_id", "text", n = 5,
      suite = "s")
    state.shingles.cache().count()
    val shard = Seq(
      (10L, "xx aa bb cc dd ee yy"), // one span hit: 5 tokens scrubbed
      (11L, "completely fresh training document"),
      (12L, "aa bb cc dd ee aa bb cc dd ee") // two hits: all scrubbed
    )
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Dedup.decontaminate(state, batch, "doc_id", "text")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3)))
        got.synchronized { got ++= out }; ()
      }
      .start()
    val (h1, h2) = shard.splitAt(2)
    input.addData(h1: _*)
    q.processAllAvailable()
    input.addData(h2: _*)
    q.processAllAvailable()
    q.stop()
    val expected = Dedup.decontaminate(state, shard.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got.toSet == expected && expected.nonEmpty)
    assert(got.find(_._1 == 10L).exists(o => o._3 == 5L && o._4 == "xx yy"))
    assert(got.find(_._1 == 11L).exists(_._3 == 0L))
    assert(got.find(_._1 == 12L).exists(o => o._3 == 10L && o._4 == ""))
  }

  test("leakage-safe split streams against a frozen cluster state via foreachBatch, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    import graft.sources.ScaleOps
    // the against-state split is a STATELESS deterministic projection of
    // each row (one frozen-state join + the salted hash) — shards
    // decompose, and members of one cluster keep landing on the same
    // side even when they arrive in DIFFERENT micro-batches
    val state = Dedup.dupClusterState(
      Seq((1L, 2L), (5L, 6L)).toDF("id1", "id2"))
    state.clusters.cache().count()
    val weights = Seq("train" -> 0.5, "eval" -> 0.5)
    val corpus = Seq((1L, "a"), (2L, "b"), (5L, "c"), (6L, "d"),
      (9L, "e"), (10L, "f"))
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = ScaleOps.leakageSafeSplitAgainst(state, batch, "doc_id",
            weights, salt = "stream")
          .select("doc_id", "split").collect()
          .map(r => (r.getLong(0), r.getString(1)))
        got.synchronized { got ++= out }; ()
      }
      .start()
    // split the cluster pairs ACROSS micro-batches on purpose
    input.addData(corpus.take(1): _*) // 1 alone
    q.processAllAvailable()
    input.addData(corpus.drop(1): _*) // 2 arrives later; must follow 1
    q.processAllAvailable()
    q.stop()
    val expected = ScaleOps.leakageSafeSplitAgainst(state,
        corpus.toDF("doc_id", "text"), "doc_id", weights, salt = "stream")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.toSet == expected && got.size == corpus.size)
    val m = got.toMap
    assert(m(2L) == m(1L) && m(6L) == m(5L)) // never straddle, cross-batch
  }

  test("incremental dedup runs per micro-batch via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    // dedupAgainst is a multi-pass batch operator (keyed aggs + joins +
    // localCheckpoint), so the streaming composition is foreachBatch — each
    // micro-batch is the "daily shard" joined against the static corpus
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Dedup.dedupAgainst(corpus, batch, "doc_id", "text")
          .select(col("id"), col("dup_of").isNotNull.as("dup"))
          .collect().map(r => (r.getLong(0), r.getBoolean(1)))
        got.synchronized { got ++= out }; ()
      }
      .start()
    input.addData(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy
      (11L, "completely fresh content nothing shared here at all"))
    q.processAllAvailable()
    input.addData(
      (12L, "one two three four five six seven nine")) // near copy of 2
    q.processAllAvailable()
    q.stop()
    val byId = got.toMap
    assert(byId(10L) && !byId(11L) && byId(12L))
  }

  test("drift monitors run per micro-batch via foreachBatch, equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.reg.Eval
    // PSI/KS are multi-pass batch aggregations (reference stats + keyed
    // counts), so the streaming composition is foreachBatch: each
    // micro-batch is the "current window" monitored against a static
    // reference — the production drift-alert loop
    val ref = (0 until 200).map(i => (i % 20).toDouble).toDF("v")
    val input = MemoryStream[Double]
    val psis = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = input.toDF().toDF("v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val psi = Eval.psi(ref, batch, col("v"), bins = 10)
          .agg(sum(col("contrib"))).collect()(0).getDouble(0)
        psis.synchronized { psis += ((id, psi)) }; ()
      }
      .start()
    val calm = (0 until 100).map(i => (i % 20).toDouble)
    val shifted = Seq.fill(100)(19.0)
    input.addData(calm: _*)
    q.processAllAvailable()
    input.addData(shifted: _*)
    q.processAllAvailable()
    q.stop()
    val byBatch = psis.toMap
    // batch equivalence: the micro-batch result IS the batch operator's
    val batchCalm = Eval.psi(ref, calm.toDF("v"), col("v"), bins = 10)
      .agg(sum(col("contrib"))).collect()(0).getDouble(0)
    assert(byBatch(0L) == batchCalm)
    assert(byBatch(0L) < 0.1, s"calm window flagged: ${byBatch(0L)}")
    assert(byBatch(1L) > 0.25, s"shifted window missed: ${byBatch(1L)}")
  }

  test("GLM scoring and gopher rules run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.TextOps
    import graft.reg.Glm
    // train on a static frame, then apply the fitted scorer to a stream —
    // predictResponse is a pure projection, so append mode just works
    val train = Seq((1.0, 120.0), (0.0, 20.0), (1.0, 200.0), (0.0, 35.0),
      (1.0, 150.0), (0.0, 10.0)).toDF("label", "len")
    val fit = Glm.fit("label ~ len", train, family = "binomial",
      strategy = "irls", maxIter = 8, tol = 0.0)
    val texts = Seq(
      (1L, ("the quick brown fox jumps over a lazy dog and it was fine " * 6).trim),
      (2L, "#tag #tag #tag"))
    val input = MemoryStream[(Long, String)]
    def score(df: org.apache.spark.sql.DataFrame) = {
      val sigs = TextOps.gopherSignals(col("text"), TextOps.tokens(col("text")))
      fit.predictResponse(
        df.withColumn("len", org.apache.spark.sql.functions.length(col("text"))
          .cast("double")), "p_good")
        .select(col("id") +: col("p_good") +:
          sigs.collect { case ("keep", c) => c.as("keep") }: _*)
    }
    val q = score(input.toDF().toDF("id", "text"))
      .writeStream.format("memory").queryName("gscore").outputMode("append").start()
    input.addData(texts: _*)
    q.processAllAvailable()
    val streamed = spark.table("gscore").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    q.stop()
    val batch = score(spark.createDataFrame(texts).toDF("id", "text"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed == batch)
    val byId = streamed.map(t => t._1 -> t).toMap
    assert(byId(1L)._3 && !byId(2L)._3) // gopher keep fires correctly
    assert(byId(1L)._2 > byId(2L)._2) // longer doc scores higher
  }

  test("streaming sessionization closes sessions by gap and by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "user", "value")
    val sess = StreamingReg.streamingSessionize(df, "ts", "user", "value",
      gapMs = 30L * 60L * 1000L, watermark = "10 minutes")
    val q = sess.writeStream.format("memory").queryName("sess").outputMode("append").start()
    def t(h: Int, m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:$s%02d")
    // batch 1: A has two events 10s apart (one session); B one event
    input.addData((t(10, 0), "A", 1.0), (t(10, 0, 10), "A", 2.0), (t(10, 0, 5), "B", 7.0))
    q.processAllAvailable()
    // batch 2: A reappears 3h later — gap closes A's first session
    // immediately; the watermark advancing to ~12:50 times out B's session
    input.addData((t(13, 0), "A", 9.0))
    q.processAllAvailable()
    input.addData((t(13, 1), "A", 1.0)) // extra batch so timeouts fire
    q.processAllAvailable()
    val rows = spark.table("sess").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getDouble(4))).toSet
    q.stop()
    assert(rows.contains(("A", 2L, 3.0)), s"A session missing in $rows") // 2 events, 1+2
    assert(rows.contains(("B", 1L, 7.0)), s"B session missing in $rows")
    // A's 13:00 session is still open — not emitted
    assert(!rows.exists { case (k, _, sv) => k == "A" && sv >= 9.0 })
  }

  test("streaming sessionization survives a late replay behind the watermark") {
    // regression (found replaying a ×100 file stream): when data batches
    // chain back-to-back, the LATE-event filter uses the previous batch's
    // watermark while getCurrentWatermarkMs is the advanced one — so a
    // session extended by a straggler event can have horizon ≤ current
    // watermark, and setTimeoutTimestamp below the watermark throws and
    // KILLS THE QUERY. (A MemoryStream can't reach this: the engine's
    // timeout-sweep batch between adds evicts the stale state first; a
    // file source with queued files goes straight to the next batch.)
    // The fix finalizes the session immediately, as the timeout would.
    import java.io.File
    val dir = java.nio.file.Files.createTempDirectory("sessstale").toFile
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def writeFile(name: String, rows: Seq[(Timestamp, String, Double)],
                  mtime: Long): Unit = {
      val stage = new File(dir, s"_stage_$name")
      spark.createDataFrame(rows).toDF("ts", "user", "value")
        .coalesce(1).write.mode("overwrite").parquet(stage.getPath)
      val part = stage.listFiles().find(_.getName.startsWith("part-")).get
      val dst = new File(dir, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(mtime))
    }
    val base = System.currentTimeMillis() - 60000L
    // batch 1: A opens at 10:00 (horizon 10:30); Z at 14:00 pushes the
    // post-batch watermark to 13:50
    writeFile("f1.parquet", Seq((t(10, 0), "A", 1.0), (t(14, 0), "Z", 2.0)), base)
    // batch 2: A's straggler at 10:20 — not late vs batch 1's watermark
    // (0), merges into the open session, horizon 10:50 ≤ 13:50 → pre-fix
    // setTimeoutTimestamp threw StreamingQueryException here
    writeFile("f2.parquet", Seq((t(10, 20), "A", 5.0)), base + 10000L)
    val schema = spark.read.parquet(new File(dir, "f1.parquet").getPath).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
    val sess = StreamingReg.streamingSessionize(stream, "ts", "user", "value",
      gapMs = 30L * 60L * 1000L, watermark = "10 minutes")
    val q = sess.writeStream.format("memory").queryName("sessstale")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("sessstale").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getDouble(4))).toSet
    assert(rows.contains(("A", 2L, 6.0)), s"merged session not finalized in $rows")
    assert(!rows.exists(_._1 == "Z"), s"Z should still be open in $rows")
  }

  test("weighted sample and int8 quantization run unchanged on a stream") {
    // both are narrow (a filter projection / HOF projections), so the same
    // code drives batch and streaming — prove stream ≡ batch on shared rows
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Similarity
    import graft.sources.ScaleOps
    val rows = (0L until 40L).map(i =>
      (i, Array.fill(8)(((i * 7 + 3) % 13).toFloat - 6f)))
    val input = MemoryStream[(Long, Array[Float])]
    val df = input.toDF().toDF("id", "vec")
    def pipe(d: org.apache.spark.sql.DataFrame) =
      ScaleOps.weightedSample(d, "id", lit(0.5), salt = "st")
        .select(col("id"), col("vec"),
          Similarity.int8Scale(col("vec")).as("scale"))
        .select(col("id"),
          concat_ws(",", Similarity.int8Quantize(col("vec"), col("scale"))
            .cast("array<string>")).as("q"))
    val q = pipe(df).writeStream.format("memory").queryName("wsq")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("wsq").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    q.stop()
    val batch = pipe(spark.createDataFrame(rows).toDF("id", "vec"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.size < rows.size) // filter really ran
  }

  test("approx token budget applies to a stream from a frozen batch inventory") {
    // the deployment shape: the per-domain rate comes from a REFERENCE
    // batch inventory (sampleToTokenBudgetApprox's own derivation —
    // aggregates don't run on an unbounded stream), and the cut itself
    // is weightedSample's stateless filter, identical on stream and batch
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.ScaleOps
    val rows = (0L until 60L).map(i => (i, if (i % 3 == 0) "en" else "de",
      (i % 7 + 1).toInt))
    val batchDf = spark.createDataFrame(rows).toDF("id", "dom", "nt")
    val budgets = Seq("en" -> 30L, "de" -> 50L)
    val expected = ScaleOps.sampleToTokenBudgetApprox(batchDf, "dom", "id",
        col("nt"), budgets, salt = "stb")
      .collect().map(_.getLong(0)).toSet
    // freeze the rates from the batch inventory, replay them on a stream
    val totals = batchDf.groupBy("dom").agg(sum(col("nt")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rate = when(col("dom") === "en",
        lit(math.min(1.0, 30.0 / totals("en"))))
      .when(col("dom") === "de", lit(math.min(1.0, 50.0 / totals("de"))))
    val input = MemoryStream[(Long, String, Int)]
    val q = ScaleOps.weightedSample(
        input.toDF().toDF("id", "dom", "nt"), "id", rate, salt = "stb")
      .writeStream.format("memory").queryName("stb")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("stb").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(streamed == expected)
    assert(streamed.nonEmpty && streamed.size < rows.size)
  }

  test("EXACT token budget streams from a frozen state via foreachBatch, equals batch") {
    // the exact cut's streaming story (the removeDupSpansAgainst pattern):
    // phase-1 state — crossing bucket, below-sum, sliver rows — is frozen
    // from the reference inventory by tokenBudgetState; each micro-batch
    // then applies sampleToTokenBudgetAgainst, a pure per-row function of
    // that state, so replaying the corpus through micro-batches reproduces
    // the batch operator's keep set bit-for-bit
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.ScaleOps
    val rows = (0L until 80L).map(i => (i, if (i % 3 == 0) "en" else "de",
      (i % 7 + 1).toInt))
    val corpus = spark.createDataFrame(rows).toDF("id", "dom", "nt")
    val budgets = Seq("en" -> 30L, "de" -> 50L)
    val state = ScaleOps.tokenBudgetState(corpus, "dom", "id", col("nt"),
      budgets, salt = "etb", buckets = 8).cache()
    // wrap ONCE outside the micro-batch loop: the (salt, n_buckets) meta
    // probe then costs one driver job per state, not one per batch
    val prepared = ScaleOps.PreparedTokenBudgetState(state)
    val expected = ScaleOps.sampleToTokenBudget(corpus, "dom", "id",
        col("nt"), budgets, salt = "etb", buckets = 8)
      .collect().map(_.getLong(0)).toSet
    val input = MemoryStream[(Long, String, Int)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().toDF("id", "dom", "nt").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = ScaleOps.sampleToTokenBudgetAgainst(prepared, batch,
            "dom", "id", col("nt"))
          .collect().map(_.getLong(0))
        got.synchronized { got ++= kept }; ()
      }
      .start()
    val (h1, h2) = rows.splitAt(37)
    input.addData(h1: _*)
    q.processAllAvailable()
    input.addData(h2: _*)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == expected, s"${got.size} vs ${expected.size}")
    assert(expected.nonEmpty && expected.size < rows.size)
  }

  test("REPEAT token budget streams from a frozen state via foreachBatch, equals batch") {
    // the upsampling mixture's streaming story: repeatBudgetState freezes
    // the per-domain epoch counts plus the remainder cut's phase-1 state;
    // each micro-batch emits its full epochs and applies the frozen
    // remainder window — replaying the corpus reproduces the batch mixture
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.ScaleOps
    val rows = (0L until 80L).map(i => (i, if (i % 3 == 0) "en" else "de",
      (i % 7 + 1).toInt))
    val corpus = spark.createDataFrame(rows).toDF("id", "dom", "nt")
    // en: upsampled past 2 epochs; de: downsampled (0 full epochs)
    val budgets = Seq("en" -> 260L, "de" -> 50L)
    val state = ScaleOps.repeatBudgetState(corpus, "dom", "id", col("nt"),
      budgets, salt = "rtb", buckets = 8).cache()
    // wrap ONCE outside the micro-batch loop (the PreparedTokenBudgetState
    // recipe): the epoch map and remainder meta probe once per state
    val prepared = ScaleOps.PreparedRepeatBudgetState(state)
    val expected = ScaleOps.repeatToTokenBudget(corpus, "dom", "id",
        col("nt"), budgets, salt = "rtb", buckets = 8)
      .select("id", "epoch")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val input = MemoryStream[(Long, String, Int)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val q = input.toDF().toDF("id", "dom", "nt").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = ScaleOps.repeatToTokenBudgetAgainst(prepared, batch,
            "dom", "id", col("nt"))
          .select("id", "epoch")
          .collect().map(r => (r.getLong(0), r.getInt(1)))
        got.synchronized { got ++= kept }; ()
      }
      .start()
    val (h1, h2) = rows.splitAt(41)
    input.addData(h1: _*)
    q.processAllAvailable()
    input.addData(h2: _*)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == expected, s"${got.size} vs ${expected.size}")
    // the en side really upsampled (epoch 1 exists), de downsampled
    assert(expected.exists(_._2 == 1) && expected.size > rows.size)
  }

  test("PRIORITY token budget streams from a frozen state via foreachBatch, equals batch") {
    // the takeTopTokenBudget twin of the exact-cut streaming story:
    // topTokenBudgetState freezes the reference inventory's quality
    // ranking (crossing bin, above-sum, sliver); each micro-batch applies
    // takeTopTokenBudgetAgainst, a pure per-row function of that state
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.ScaleOps
    val rows = (0L until 80L).map(i => (i, if (i % 3 == 0) "en" else "de",
      (i % 7 + 1).toInt, (i * 37 % 101).toDouble))
    val corpus = spark.createDataFrame(rows).toDF("id", "dom", "nt", "q")
    val budgets = Seq("en" -> 30L, "de" -> 50L)
    val state = ScaleOps.topTokenBudgetState(corpus, "dom", "id", col("nt"),
      col("q"), budgets, buckets = 8).cache()
    val expected = ScaleOps.takeTopTokenBudget(corpus, "dom", "id",
        col("nt"), col("q"), budgets, buckets = 8)
      .collect().map(_.getLong(0)).toSet
    val input = MemoryStream[(Long, String, Int, Double)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().toDF("id", "dom", "nt", "q").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = ScaleOps.takeTopTokenBudgetAgainst(state, batch,
            "dom", "id", col("nt"), col("q"))
          .collect().map(_.getLong(0))
        got.synchronized { got ++= kept }; ()
      }
      .start()
    val (h1, h2) = rows.splitAt(29)
    input.addData(h1: _*)
    q.processAllAvailable()
    input.addData(h2: _*)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == expected, s"${got.size} vs ${expected.size}")
    assert(expected.nonEmpty && expected.size < rows.size)
  }

  test("Count-Min sketch accumulates across micro-batches (mergeable state)") {
    // the sketch's elementwise-add merge is exactly what streaming state
    // needs: complete-mode estimates over two batches equal one batch of
    // the union
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.CountMinAgg
    val input = MemoryStream[String]
    val agg = input.toDF().toDF("t")
      .agg(CountMinAgg(col("t"), Seq("a", "b", "z"), 4, 64).as("e"))
    val q = agg.writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    input.addData(Seq.fill(5)("a") ++ Seq.fill(2)("b"): _*)
    q.processAllAvailable()
    input.addData(Seq.fill(3)("a") :+ "b": _*)
    q.processAllAvailable()
    val ests = spark.table("cms").collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(ests === Map("a" -> 8L, "b" -> 3L, "z" -> 0L))
  }

  test("quantile sketch on a stream: complete-mode equals batch quantile_cont") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.QuantileSketchAgg
    val input = MemoryStream[Double]
    val agg = input.toDF().toDF("x")
      .agg(QuantileSketchAgg(col("x"), Seq(0.5), 64).as("q"))
    val q = agg.writeStream.format("memory").queryName("qsk")
      .outputMode("complete").start()
    input.addData(1.0, 2.0, 3.0); q.processAllAvailable()
    input.addData(4.0); q.processAllAvailable()
    val med = spark.table("qsk").collect().head.getSeq[Double](0).head
    q.stop()
    assert(med === 2.5) // quantile_cont(0.5) of 1,2,3,4
  }

  test("decay scores run per micro-batch via foreachBatch, equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Features
    val input = MemoryStream[(Long, Long)]
    val collected = scala.collection.mutable.Map[Long, Double]()
    val q = input.toDF().toDF("u", "t").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Features.decayScores(batch, "u", "t", halfLifeUs = 10L,
          tRefUs = Some(20L))
          .collect()
          .foreach(r => collected.synchronized {
            collected(r.getAs[Long]("u")) =
              collected.getOrElse(r.getAs[Long]("u"), 0.0) +
                r.getAs[Double]("score")
          })
        ()
      }
      .start()
    input.addData((1L, 20L), (1L, 10L)); q.processAllAvailable()
    input.addData((1L, 0L), (2L, 10L)); q.processAllAvailable()
    q.stop()
    // the pinned reference makes per-batch scores ADDITIVE, so the merged
    // map equals the batch run over all events
    assert(math.abs(collected(1L) - (1.0 + 0.5 + 0.25)) < 1e-12)
    assert(math.abs(collected(2L) - 0.5) < 1e-12)
  }

  test("grouped-calibrated GLM scoring through a stream equals batch (q99/q101 shape)") {
    // the per-domain production scoring composition: train a logistic
    // PER GROUP (batch, q99 shape), isotonic-calibrate the pooled scores
    // (q112 shape), then drive NEW rows through score→calibrate as a
    // STREAM — the whole apply path is a broadcast stream-static join
    // plus pure projections, so append mode carries it unchanged
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(3)
    val train = (1 to 400).map { i =>
      val dom = if (i % 2 == 0) "a" else "b"
      val x = rng.nextDouble() * 10.0
      val p = 1.0 / (1.0 + math.exp(-(if (dom == "a") -3.0 + 0.8 * x else 1.0 - 0.4 * x)))
      (dom, x, if (rng.nextDouble() < p) 1.0 else 0.0)
    }.toDF("domain", "x", "y")
    val coefs = graft.reg.Glm
      .fitGrouped("y ~ x", train, "domain", family = "binomial",
        strategy = "compress", maxIter = 4)
      .groupBy("group")
      .agg(
        first(when(col("term") === "(Intercept)", col("estimate")), ignoreNulls = true).as("b0"),
        first(when(col("term") === "x", col("estimate")), ignoreNulls = true).as("b1"))
    def score(df: org.apache.spark.sql.DataFrame) = df
      .join(broadcast(coefs), col("domain") === col("group"))
      .withColumn("mu", lit(1.0) / (lit(1.0) + exp(-(col("b0") + col("b1") * col("x")))))
      .drop("group", "b0", "b1")
    val iso = graft.reg.Isotonic.fit(score(train), col("mu"), col("y"),
      quantize = Some(2))
    def calibrated(df: org.apache.spark.sql.DataFrame) =
      graft.reg.Isotonic.calibrate(score(df), col("mu"), iso, quantize = Some(2))

    val fresh = (1 to 60).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", (i % 11).toDouble)
    }
    val batchOut = calibrated(fresh.toDF("id", "domain", "x"))
      .select(col("id"), col("mu"), col("calibrated")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap
    val input = MemoryStream[(Long, String, Double)]
    val sdf = input.toDF().toDF("id", "domain", "x")
    val q = calibrated(sdf)
      .select(col("id"), col("mu"), col("calibrated"))
      .writeStream.format("memory").queryName("glmscore")
      .outputMode("append").start()
    input.addData(fresh.take(30): _*); q.processAllAvailable()
    input.addData(fresh.drop(30): _*); q.processAllAvailable()
    val streamOut = spark.table("glmscore").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap
    q.stop()
    assert(streamOut.keySet === batchOut.keySet)
    streamOut.foreach { case (id, (mu, cal)) =>
      val (bMu, bCal) = batchOut(id)
      assert(mu === bMu, s"mu mismatch at id=$id")
      assert((cal.isNaN && bCal.isNaN) || cal === bCal, s"calibrated mismatch at id=$id")
    }
    // the calibration map really fired on seen scores
    assert(streamOut.values.exists(v => !v._2.isNaN))
  }

  test("incremental dedup in a stream (foreachBatch) equals one batch dedupAgainst") {
    // the daily-ingest shape: each micro-batch of new docs dedups against
    // the STATIC corpus via foreachBatch (dedupAgainst stages internally,
    // so it runs per-batch, not as a continuous query). Decisions are
    // per-new-doc vs corpus only, so the result is BATCH-SPLIT INVARIANT:
    // any micro-batching of the ingest gives the batch answer
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "how vexingly quick daft zebras jump")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "one two three four five six seven eight"), // exact dup of 1
      (11L, "one two three four five six seven nine"), // near dup of 1
      (12L, "completely unrelated sentence about astronomy and tea"))
    val batch = graft.pipeline.Dedup
      .dedupAgainst(corpus, fresh.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2))))
      .toMap
    val got = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.pipeline.Dedup
          .dedupAgainst(corpus, b, "doc_id", "text")
          .collect().foreach { r =>
            got(r.getLong(0)) =
              ((if (r.isNullAt(1)) -1L else r.getLong(1),
                if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
          }
      }
      .start()
    // two micro-batches splitting the ingest mid-stream
    input.addData(fresh.take(1): _*); q.processAllAvailable()
    input.addData(fresh.drop(1): _*); q.processAllAvailable()
    q.stop()
    assert(got.keySet === batch.keySet)
    got.foreach { case (id, (dup, j)) =>
      val (bDup, bJ) = batch(id)
      assert(dup === bDup, s"dup_of mismatch at id=$id")
      assert((j.isNaN && bJ.isNaN) || j === bJ, s"jaccard mismatch at id=$id")
    }
    // the decisions themselves are right: exact dup, near dup, novel
    assert(got(10L)._1 === 1L && got(10L)._2 === 1.0)
    assert(got(11L)._1 === 1L && got(11L)._2 < 1.0)
    assert(got(12L)._1 === -1L)
  }

  test("cross-corpus bigram-LM scoring through a stream equals batch (stream-static model join)") {
    // the CCNet daily-ingest shape: the model tables are STATIC (trained
    // on the reference corpus); scoring a stream is explode + two
    // stream-static left joins + one per-doc aggregate (update mode)
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog")).toDF("doc_id", "text")
    val model = graft.pipeline.TextOps.bigramLmTrain(train, "text")
    val fresh = Seq((10L, "the cat sat"), (11L, "zebra quokka axolotl"),
      (12L, "a dog sat on the mat"))
    val batch = graft.pipeline.TextOps
      .bigramLmScoreWith(model, fresh.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val input = MemoryStream[(Long, String)]
    val q = graft.pipeline.TextOps
      .bigramLmScoreWith(model, input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("lmscore")
      .outputMode("update").start()
    input.addData(fresh: _*); q.processAllAvailable()
    val streamed = spark.table("lmscore")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    q.stop()
    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (id, (s, nb)) =>
      assert(nb === batch(id)._2, s"n_bigrams mismatch at id=$id")
      assert(math.abs(s - batch(id)._1) < 1e-12, s"lm_score mismatch at id=$id")
    }
    // OOV doc really hit the smoothing floor: strictly below the in-vocab doc
    assert(streamed(11L)._1 < streamed(10L)._1)
  }

  test("quantile-regression scoring through a stream equals batch (fitCol is a pure projection)") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(12)
    val train = (1 to 300).map { _ =>
      val x = rng.nextDouble() * 8.0
      (x, 1.0 + 2.0 * x + (rng.nextDouble() * 2.0 - 1.0) * x)
    }.toDF("x", "y")
    val fit = graft.reg.Qreg.fit("y ~ x", train, tau = 0.9, maxIter = 3,
      tol = 0.0, eps = 1e-4)
    val fresh = (1 to 40).map(i => (i.toLong, (i % 9).toDouble))
    val batch = fit.predict(fresh.toDF("id", "x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val input = MemoryStream[(Long, Double)]
    val q = fit.predict(input.toDF().toDF("id", "x"))
      .writeStream.format("memory").queryName("qregscore")
      .outputMode("append").start()
    input.addData(fresh: _*); q.processAllAvailable()
    val streamed = spark.table("qregscore")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    q.stop()
    assert(streamed === batch)
    assert(batch.nonEmpty && batch.values.forall(v => !v.isNaN))
  }

  test("streaming funnel emits the batch cascade's step reaches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "user", "etype")
    val steps = Seq("view", "click", "purchase")
    val out = StreamingReg.streamingFunnel(df, "ts", "user", "etype", steps)
    val q = out.writeStream.format("memory").queryName("fun")
      .outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // A completes in order; B purchases BEFORE clicking (order violation —
    // purchase must not count); C only views
    input.addData(
      (t(0), "A", "view"), (t(1), "A", "click"),
      (t(0), "B", "view"), (t(1), "B", "purchase"),
      (t(0), "C", "view"))
    q.processAllAvailable()
    // cross-batch continuation: A purchases, B clicks (purchase stays
    // unreached — its only event predates the click)
    input.addData((t(5), "A", "purchase"), (t(6), "B", "click"))
    q.processAllAvailable()
    val reaches = spark.table("fun").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    q.stop()
    assert(reaches === Set(
      ("A", 1), ("A", 2), ("A", 3),
      ("B", 1), ("B", 2),
      ("C", 1)))
    // per-step counts equal the batch funnel on the union of all events
    val batch = graft.operators.Events.funnel(
      Seq((t(0), "A", "view"), (t(1), "A", "click"), (t(5), "A", "purchase"),
        (t(0), "B", "view"), (t(1), "B", "purchase"), (t(6), "B", "click"),
        (t(0), "C", "view")).toDF("ts", "user", "etype"),
      "user", "ts", "etype", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val streamCounts = reaches.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    steps.indices.foreach { i =>
      assert(streamCounts.getOrElse(i + 1, 0L) === batch(i + 1),
        s"step ${i + 1} stream vs batch")
    }
  }

  test("streaming funnel conversion window gates step advances") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "user", "etype")
    val out = StreamingReg.streamingFunnel(df, "ts", "user", "etype",
      Seq("view", "click"), maxGapMs = Some(60L * 1000L), watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("fungap")
      .outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // A clicks within the 1-minute window; B clicks 10 minutes later
    input.addData((t(0), "A", "view"), (t(1), "A", "click"),
      (t(0), "B", "view"))
    q.processAllAvailable()
    input.addData((t(10), "B", "click"))
    q.processAllAvailable()
    val reaches = spark.table("fungap").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    q.stop()
    assert(reaches === Set(("A", 1), ("A", 2), ("B", 1)))
  }

  test("streaming funnel idle TTL evicts one-step users without a conversion window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "user", "etype")
    // no maxGapMs: without the TTL, A's step-1 state would live forever
    val out = StreamingReg.streamingFunnel(df, "ts", "user", "etype",
      Seq("view", "click"), maxGapMs = None, watermark = "1 minute",
      idleTtlMs = Some(2L * 60L * 1000L))
    val q = out.writeStream.format("memory").queryName("funttl")
      .outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    input.addData((t(0), "A", "view"), (t(0), "B", "view"))
    q.processAllAvailable()
    // advance the watermark far past A's 2-minute idle deadline; B stays
    // live via fresh activity
    input.addData((t(10), "B", "view"), (t(10), "C", "view"))
    q.processAllAvailable()
    input.addData((t(20), "Z", "view"))
    q.processAllAvailable()
    // A's progress was forgotten: this click has no step-1 predecessor
    // in state, so step 2 is NOT reached (TTL trade, documented); a
    // fresh view restarts the funnel from step 1
    input.addData((t(21), "A", "click"))
    q.processAllAvailable()
    val reaches = spark.table("funttl").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    q.stop()
    assert(reaches === Set(("A", 1), ("B", 1), ("C", 1), ("Z", 1)))
  }

  test("streaming funnel survives a stale event after the watermark passed the deadline") {
    // regression: setTimeoutTimestamp below the current watermark throws
    // and kills the query; a deadline the watermark already passed must
    // drop the state instead
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "user", "etype")
    val out = StreamingReg.streamingFunnel(df, "ts", "user", "etype",
      Seq("view", "click"), maxGapMs = Some(60L * 1000L), watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("funstale")
      .outputMode("append").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((t(10, 0), "B", "view"))       // deadline 10:01
    q.processAllAvailable()
    input.addData((t(11, 0), "Z", "view"))       // watermark → ~10:55
    q.processAllAvailable()
    // B's duplicate view: no step advances, deadline 10:01 < watermark —
    // pre-fix this threw IllegalArgumentException and killed the query.
    // Z's click lands 30 s after its view (inside the 60 s gap).
    input.addData((t(11, 30), "B", "view"),
      (Timestamp.valueOf("2024-01-01 11:00:30"), "Z", "click"))
    q.processAllAvailable()
    val reaches = spark.table("funstale").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    q.stop()
    assert(reaches.contains(("Z", 2))) // the healthy cascade still lands
    assert(!reaches.contains(("B", 2)))
  }

  test("streaming funnel cascades same-timestamp events in step order") {
    // regression: the tie-break sorted by raw type string, so a
    // same-second signup→purchase processed purchase first and missed it
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "user", "etype")
    val out = StreamingReg.streamingFunnel(df, "ts", "user", "etype",
      Seq("signup", "purchase")) // "purchase" < "signup" lexicographically
    val q = out.writeStream.format("memory").queryName("funtie")
      .outputMode("append").start()
    val ts = Timestamp.valueOf("2024-01-01 10:00:00")
    input.addData((ts, "A", "signup"), (ts, "A", "purchase"))
    q.processAllAvailable()
    val reaches = spark.table("funtie").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    q.stop()
    assert(reaches === Set(("A", 1), ("A", 2)))
  }

  test("SES forecast through a stream equals batch (mergeable period-sum state)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Events
    // the corpus-sized half of sesForecast is its leading (type, period)
    // value-sum aggregation — a plain mergeable streaming agg; the SES
    // weighting then runs on the BOUNDED period table per trigger. The
    // same split serves acf (its state is the (type, period) count agg).
    val periodUs = 100L
    val input = MemoryStream[(String, Long, Double)]
    val agg = input.toDF().toDF("event_type", "tus", "value")
      .select(col("event_type"),
        expr(s"tus DIV ${periodUs}L").as("period"),
        col("value").cast("double").as("v"))
      .groupBy("event_type", "period").agg(sum("v").as("y"))
    val q = agg.writeStream.format("memory").queryName("ses_state")
      .outputMode("complete").start()
    val batch1 = Seq(("a", 10L, 1.0), ("a", 120L, 2.0), ("b", 10L, 5.0))
    val batch2 = Seq(("a", 130L, 3.0), ("a", 250L, 4.0), ("b", 350L, 6.0))
    input.addData(batch1: _*); q.processAllAvailable()
    input.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    // finish on the streamed state: one synthetic event per (type,
    // period) at the period boundary reuses the production operator
    // unchanged (its leading agg is idempotent on an already-aggregated
    // series)
    val state = spark.table("ses_state")
    val streamed = Events.sesForecast(
        state.select(col("event_type"),
          (col("period") * periodUs).as("tus"), col("y").as("value")),
        "event_type", "tus", "value", periodUs, alpha = 0.3)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val direct = Events.sesForecast((batch1 ++ batch2).toDF("event_type", "tus", "value"),
        "event_type", "tus", "value", periodUs, alpha = 0.3)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(streamed.keySet === direct.keySet)
    streamed.keySet.foreach { t =>
      assert(streamed(t)._1 === direct(t)._1, s"$t n_periods")
      assert(java.lang.Double.doubleToLongBits(streamed(t)._2) ==
        java.lang.Double.doubleToLongBits(direct(t)._2), s"$t last_y")
      assert(java.lang.Double.doubleToLongBits(streamed(t)._3) ==
        java.lang.Double.doubleToLongBits(direct(t)._3), s"$t level")
    }
    // hand value: series a = periods 0,1,2 with y = 1, 5, 4; alpha .3
    // level = .3*4 + .7*(.3*5 + .7*1) = 2.74
    assert(math.abs(streamed("a")._3 - 2.74) < 1e-12)
  }

  test("streaming rolling actives match exact per-window distincts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "user")
    val out = StreamingReg.streamingRollingActives(df, "ts", "user",
      window_ = "2 hours", slide = "1 hour", watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("act")
      .outputMode("complete").start()
    def t(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((t(10), "u1"), (t(10, 30), "u2"), (t(10, 40), "u1"))
    q.processAllAvailable()
    input.addData((t(11), "u3"), (t(12, 15), "u1"))
    q.processAllAvailable()
    val rows = spark.table("act")
      .select(col("window.start").cast("string"), col("n_active_approx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    // HLL is exact at these cardinalities: window [10,12) sees u1,u2,u3;
    // [09,11) sees u1,u2; [11,13) sees u3,u1; [12,14) sees u1
    assert(rows("2024-01-01 10:00:00") === 3L)
    assert(rows("2024-01-01 09:00:00") === 2L)
    assert(rows("2024-01-01 11:00:00") === 2L)
    assert(rows("2024-01-01 12:00:00") === 1L)
  }
}
