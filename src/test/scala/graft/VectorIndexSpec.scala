package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Similarity, VectorIndex}

/** The persisted IVF index must (a) reproduce the in-memory ivfTopK result
  * exactly through its disk roundtrip and (b) actually PRUNE: the cell
  * partitioning has to reach the scan as a PartitionFilter so queries read
  * only the probed directories. */
class VectorIndexSpec extends SparkTestBase {

  private lazy val embs = sf("sf0.001", "embeddings")

  test("index roundtrip reproduces ivfTopK with the same trained centroids") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-spec").toString
    val cents = VectorIndex.build(embs, "vec_id", "embedding", dir, k = 8, iters = 2)
    assert(cents.length == 8)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))
    val fromIndex = VectorIndex.topK(spark, dir, embs.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10, nprobe = 3)
      .collect().map(key).toMap
    val inMemory = Similarity.ivfTopK(embs, "vec_id", "embedding",
      Seq(0L, 1L, 2L, 3L, 4L), 10, nprobe = 3, trainedCentroids = Some(cents))
      .collect().map(key).toMap
    assert(fromIndex.nonEmpty && fromIndex == inMemory)
  }

  test("cell partitioning prunes: probed query reads a strict subset of files") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-prune").toString
    VectorIndex.build(embs, "vec_id", "embedding", dir, k = 8, iters = 1)
    val assigned = spark.read.parquet(s"$dir/assigned.parquet")
    val allFiles = assigned.inputFiles.length
    // inputFiles reports the unfiltered relation; input_file_name() at
    // execution time reflects the files actually scanned post-pruning
    val prunedFiles = assigned.filter(col("cell").isInCollection(Seq(0, 1)))
      .select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles,
      s"$prunedFiles vs $allFiles files — partition pruning is not happening")
    // and the end-to-end query plan carries the partition filter
    val plan = VectorIndex.topK(spark, dir, embs.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter in plan:\n${plan.take(2000)}")
  }

  test("append grows the index: topK equals in-memory ivfTopK over the grown corpus") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-append").toString
    val corpus = embs.filter(col("vec_id") % 10 =!= 0)
    val shard = embs.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val cents = VectorIndex.build(corpus, "vec_id", "embedding", dir,
      k = 8, iters = 2)
    VectorIndex.append(shard, "vec_id", "embedding", dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))
    val queries = embs.filter(col("vec_id").isin(1L, 2L, 3L))
    val fromIndex = VectorIndex.topK(spark, dir, queries,
      "vec_id", "embedding", k = 10, nprobe = 3)
      .collect().map(key).toMap
    // the frozen centroids assign the grown corpus identically in memory
    val inMemory = Similarity.ivfTopK(corpus.unionByName(shard), "vec_id",
        "embedding", Seq(1L, 2L, 3L), 10, nprobe = 3,
        trainedCentroids = Some(cents))
      .collect().map(key).toMap
    assert(fromIndex.nonEmpty && fromIndex == inMemory)
    // appended vectors are actually retrievable (some neighbor id > 1M)
    assert(fromIndex.values.exists(_._1 > 1000000L),
      "no appended vector surfaced in any top-10")
    // partition pruning survives the append
    val assigned = spark.read.parquet(s"$dir/assigned.parquet")
    val allFiles = assigned.inputFiles.length
    val pruned = assigned.filter(col("cell").isInCollection(Seq(0, 1)))
      .select(input_file_name()).distinct().count()
    assert(pruned < allFiles, s"$pruned of $allFiles — pruning lost")
    // appending to a missing index refuses
    val e = intercept[Exception] {
      VectorIndex.append(shard, "vec_id", "embedding",
        dir + "/nonexistent")
    }
    assert(e != null)
  }

  test("driftCheck: in-distribution shard near zero, out-of-distribution drifts") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-drift").toString
    val corpus = embs.filter(col("vec_id") % 10 =!= 0)
    VectorIndex.build(corpus, "vec_id", "embedding", dir, k = 8, iters = 2)
    // a shard drawn from the same distribution: drift about zero
    val inDist = embs.filter(col("vec_id") % 10 === 0)
    val r1 = VectorIndex.driftCheck(spark, dir, inDist, "vec_id", "embedding")
      .collect()(0)
    assert(r1.getLong(0) > 0 && r1.getLong(1) > 0)
    val driftIn = r1.getDouble(4)
    // a structurally different shard: one-hot axis vectors concentrate
    // all mass on a single dimension — nothing in the training
    // distribution looks like that, best-cell cosines collapse toward
    // |c_j|/||c||, drift goes clearly positive
    val oneHot = inDist.select(col("vec_id"),
      transform(col("embedding"),
        (_, i) => when(i === pmod(col("vec_id"), lit(64)).cast("int"),
          lit(1.0f)).otherwise(lit(0.0f))).as("embedding"))
    val driftOut = VectorIndex.driftCheck(spark, dir, oneHot,
      "vec_id", "embedding").collect()(0).getDouble(4)
    // the synthetic embeddings are near-isotropic, so absolute cosine
    // gaps are small at k = 8 — the pin is the ORDERING, with a margin
    // above host/sampling noise
    assert(driftOut > driftIn + 0.02,
      s"one-hot shard should drift: in=$driftIn out=$driftOut")
    assert(math.abs(driftIn) < 0.1, s"in-distribution drift too large: $driftIn")
  }

  test("manifest enforces write-once: orphan and vanished files refuse loudly") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-manifest").toString
    VectorIndex.build(embs, "vec_id", "embedding", dir, k = 8, iters = 1)
    // the manifest exists and names every cell file
    val manifested = spark.read.parquet(s"$dir/_vmanifest")
      .collect().map(_.getString(0)).toSet
    assert(manifested.nonEmpty && manifested.forall(_.startsWith("cell=")))
    val queries = embs.filter(col("vec_id") < 3)
    // clean index reads fine
    assert(VectorIndex.topK(spark, dir, queries, "vec_id", "embedding",
      k = 3, nprobe = 2).count() > 0)
    // plant an orphan (what a crashed append leaves): every reader and
    // append's own pre-check must refuse — the file would otherwise be
    // silently read
    val cellDir = java.nio.file.Paths.get(s"$dir/assigned.parquet")
      .toFile.listFiles().filter(f => f.isDirectory &&
        f.getName.startsWith("cell=")).head
    val victim = cellDir.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val orphan = new java.io.File(cellDir, "part-orphan.parquet")
    java.nio.file.Files.copy(victim.toPath, orphan.toPath)
    val e1 = intercept[IllegalArgumentException] {
      VectorIndex.topK(spark, dir, queries, "vec_id", "embedding", 3, 2)
    }
    assert(e1.getMessage.contains("unmanifested") &&
      e1.getMessage.contains("part-orphan.parquet"))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndex.append(embs.limit(3), "vec_id", "embedding", dir)
    }
    assert(e2.getMessage.contains("unmanifested"))
    val e3 = intercept[IllegalArgumentException] {
      VectorIndex.driftCheck(spark, dir, queries, "vec_id", "embedding")
    }
    assert(e3.getMessage.contains("unmanifested"))
    // a vanished file (manifest entry with no data) also refuses
    assert(orphan.delete() && victim.delete())
    val e4 = intercept[IllegalArgumentException] {
      VectorIndex.topK(spark, dir, queries, "vec_id", "embedding", 3, 2)
    }
    assert(e4.getMessage.contains("no data file"))
    // a pre-manifest (or crashed-build) index refuses with the rebuild hint
    val bare = java.nio.file.Files.createTempDirectory("vindex-bare").toString
    embs.limit(5).select(col("vec_id").as("cell")).write
      .parquet(s"$bare/centroids.parquet") // wrong everything — never read
    val e5 = intercept[IllegalArgumentException] {
      VectorIndex.topK(spark, bare, queries, "vec_id", "embedding", 3, 2)
    }
    assert(e5.getMessage.contains("no _vmanifest"))
  }

  test("driftCheck sampling: deterministic, se-calibrated, fraction 1.0 unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-sdrift").toString
    val corpus = embs.filter(col("vec_id") % 10 =!= 0)
    VectorIndex.build(corpus, "vec_id", "embedding", dir, k = 8, iters = 1)
    val shard = embs.filter(col("vec_id") % 10 === 0)
    val full = VectorIndex.driftCheck(spark, dir, shard, "vec_id", "embedding")
      .collect()(0)
    assert(full.schema.fieldNames.toSeq ==
      Seq("n_corpus", "n_shard", "corpus_mean_cos", "shard_mean_cos",
        "drift", "se"))
    assert(full.getDouble(5) > 0.0, "se must be positive")
    // fraction 1.0 IS the full scan (same rows, same numbers)
    val f1 = VectorIndex.driftCheck(spark, dir, shard, "vec_id", "embedding",
      sampleFraction = 1.0, salt = "ignored").collect()(0)
    assert(f1.getLong(0) == full.getLong(0) &&
      f1.getDouble(4) == full.getDouble(4))
    // a half-sample: deterministic across reruns, n_corpus reports rows
    // USED, and the sampled mean sits within a few combined-se of the
    // full-scan mean (the se column is the advertised precision)
    val s1 = VectorIndex.driftCheck(spark, dir, shard, "vec_id", "embedding",
      sampleFraction = 0.5, salt = "spec").collect()(0)
    val s2 = VectorIndex.driftCheck(spark, dir, shard, "vec_id", "embedding",
      sampleFraction = 0.5, salt = "spec").collect()(0)
    assert(s1 == s2, "hash sample must be deterministic")
    assert(s1.getLong(0) < full.getLong(0) && s1.getLong(0) > 0)
    assert(s1.getLong(1) == full.getLong(1), "shard side is never sampled")
    val tol = 4.0 * math.max(s1.getDouble(5), 1e-12)
    assert(math.abs(s1.getDouble(2) - full.getDouble(2)) <= tol,
      s"sampled corpus mean ${s1.getDouble(2)} vs full ${full.getDouble(2)} " +
        s"beyond 4*se=$tol")
  }

  test("driftCheck refuses an empty sample loudly (no null-drift monitor)") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-esample").toString
    VectorIndex.build(embs.limit(20), "vec_id", "embedding", dir,
      k = 4, iters = 1)
    val e = intercept[Exception] {
      VectorIndex.driftCheck(spark, dir, embs.limit(5), "vec_id",
        "embedding", sampleFraction = 1e-9, salt = "none").collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(e).contains("sample is empty"), chain(e).take(500))
  }

  test("build clears stale cell files under dynamic partition overwrite") {
    // two well-separated clusters so both cells populate; then rebuild at
    // the same dir (dynamic overwrite mode) with a corpus that vacates
    // cell 1 — without the explicit pre-delete, the old cell-1 files
    // would survive AND get manifested, silently serving the old corpus
    import spark.implicits._
    def oneHot(axis: Int, ids: Seq[Long]) = ids.toDF("vec_id")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.array(
          (0 until 64).map(i =>
            lit(if (i == axis) 1.0f else 0.0f)): _*).as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("vindex-dyn").toString
    val both = oneHot(0, Seq(1L, 3L, 5L)).unionByName(oneHot(7, Seq(2L, 4L)))
    VectorIndex.build(both, "vec_id", "embedding", dir, k = 2, iters = 1)
    val cells0 = spark.read.parquet(s"$dir/assigned.parquet")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells0.size == 2)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      VectorIndex.build(oneHot(0, Seq(11L, 12L, 13L)), "vec_id",
        "embedding", dir, k = 2, iters = 0)
      val ids = spark.read.parquet(s"$dir/assigned.parquet")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(11L, 12L, 13L),
        s"stale vectors survived the rebuild: $ids")
      // and the manifest agrees with the cleaned listing (reads pass)
      assert(VectorIndex.topK(spark, dir, oneHot(0, Seq(99L)), "vec_id",
        "embedding", k = 3, nprobe = 2).count() > 0)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("freezeSemDedupState: index-frozen state == withCodebook, valve prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-freeze").toString
    val corpus = embs.filter(col("vec_id") % 10 =!= 0)
    VectorIndex.build(corpus, "vec_id", "embedding", dir, k = 8, iters = 2)
    val fromIndex = VectorIndex.freezeSemDedupState(spark, dir)
    val cb = fromIndex.centroidArray
    val direct = Similarity.semDedupStateWithCodebook(
      corpus, "vec_id", "embedding", cb)
    def memberSet(st: Similarity.SemDedupState) =
      st.members.select("id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(memberSet(fromIndex) == memberSet(direct) &&
      memberSet(fromIndex).nonEmpty)
    def metaSet(st: Similarity.SemDedupState) =
      st.centroids.select("cell", "max_cell", "n_members").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(metaSet(fromIndex) == metaSet(direct))
    // the apply path is identical through either freeze
    val shard = embs.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    def apply(st: Similarity.SemDedupState) =
      Similarity.semDedupAgainst(st, shard, "vec_id", "embedding", 0.45)
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(apply(fromIndex) == apply(direct))
    // the layout bonus: the members' valve filter is a PARTITION filter —
    // a valved cell's files never get read. Cap = largest cell size − 1,
    // so at least one cell valves out and (cells are not all equal-sized
    // here) at least one survives to keep a real scan in the plan
    val sizes = spark.read.parquet(s"$dir/assigned.parquet")
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(sizes.distinct.length > 1, "degenerate: all cells equal-sized")
    val tiny = VectorIndex.freezeSemDedupState(spark, dir,
      maxCellSize = Some(sizes.max - 1))
    val plan = tiny.members.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"valve filter did not reach the partition layer:\n${plan.take(1500)}")
    val tinyCount = tiny.members.count()
    assert(tinyCount > 0 && tinyCount < sizes.sum)
    // and it grows like any state: append then apply still equals the
    // withCodebook rebuild over the union
    val grown = Similarity.semDedupStateAppend(fromIndex, shard, "vec_id",
      "embedding")
    val rebuilt = Similarity.semDedupStateWithCodebook(
      corpus.unionByName(shard), "vec_id", "embedding", cb)
    assert(memberSet(grown) == memberSet(rebuilt))
  }

  test("handle: check once serve many — one listing for N queries, " +
      "bit-identical to the one-shot API, revalidate picks up appends") {
    val dir = java.nio.file.Files.createTempDirectory("vindex-handle").toString
    VectorIndex.build(embs, "vec_id", "embedding", dir, k = 8, iters = 1)
    val queries = embs.filter(col("vec_id") < 5)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))
    // one-shot API: every call pays a fresh manifest listing
    VectorIndex.listingCount.set(0L)
    val oneShot = (1 to 3).map(_ =>
      VectorIndex.topK(spark, dir, queries, "vec_id", "embedding",
        k = 10, nprobe = 3).collect().map(key).toMap)
    assert(VectorIndex.listingCount.get == 3L,
      s"one-shot listings: ${VectorIndex.listingCount.get}")
    assert(oneShot.forall(_ == oneShot.head))
    // handle: ONE listing at open; queries, drift, and freeze add none
    VectorIndex.listingCount.set(0L)
    val h = VectorIndex.open(spark, dir)
    val viaHandle = (1 to 3).map(_ =>
      h.topK(queries, "vec_id", "embedding", k = 10, nprobe = 3)
        .collect().map(key).toMap)
    h.driftCheck(embs.filter(col("vec_id") % 7 === 0), "vec_id",
      "embedding").collect()
    h.freezeSemDedupState().members.count()
    assert(VectorIndex.listingCount.get == 1L,
      s"handle listings: ${VectorIndex.listingCount.get}")
    assert(viaHandle.forall(_ == oneShot.head), "handle != one-shot")
    // drift + freeze match their one-shot twins over the same files
    val hd = h.driftCheck(embs.filter(col("vec_id") % 7 === 0), "vec_id",
      "embedding").collect()(0)
    val od = VectorIndex.driftCheck(spark, dir,
      embs.filter(col("vec_id") % 7 === 0), "vec_id", "embedding")
      .collect()(0)
    assert(hd == od)
    def memberSet(st: Similarity.SemDedupState) =
      st.members.select("id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(memberSet(h.freezeSemDedupState()) ==
      memberSet(VectorIndex.freezeSemDedupState(spark, dir)))
    // append AFTER open: the handle serves the files it VALIDATED (the
    // documented pin — never torn, possibly stale) until revalidate()
    val shard = embs.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    VectorIndex.append(shard, "vec_id", "embedding", dir)
    val pinned = h.topK(queries, "vec_id", "embedding", k = 10, nprobe = 3)
      .collect().map(key).toMap
    assert(pinned == oneShot.head, "handle should still serve the pinned files")
    h.revalidate()
    val afterRe = h.topK(queries, "vec_id", "embedding", k = 10, nprobe = 3)
      .collect().map(key).toMap
    val oneShotAfter = VectorIndex.topK(spark, dir, queries,
      "vec_id", "embedding", k = 10, nprobe = 3).collect().map(key).toMap
    assert(afterRe == oneShotAfter, "revalidated handle != one-shot")
    assert(afterRe != oneShot.head,
      "append should change the top-10 (exact duplicates landed)")
    // a violated layout refuses at revalidate exactly like every reader
    val assignedDir = new java.io.File(s"$dir/assigned.parquet")
    val cellDir = assignedDir.listFiles().filter(_.isDirectory).head
    val orphan = new java.io.File(cellDir, "part-orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val e = intercept[IllegalArgumentException] { h.revalidate() }
    assert(e.getMessage.contains("write-once"))
    orphan.delete()
  }
}
