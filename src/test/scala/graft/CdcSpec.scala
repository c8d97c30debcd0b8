package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** CDC table maintenance: SCD1 merge semantics (upsert, insert, delete,
  * latest-change-wins, fail-fast on bad ops) and SCD2 interval
  * construction (half-open, gap-free, current flagging). */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private val baseCols = Seq("k", "v")

  test("merge: upsert, insert, delete, and untouched passthrough") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF(baseCols: _*)
    val changes = Seq(
      (1L, "U", "a2", 10L, 100L),  // update existing
      (3L, "D", "x", 11L, 101L),   // delete existing
      (9L, "I", "new", 12L, 102L)) // insert fresh key
      .toDF("k", "op", "v", "t", "id")
    val out = Cdc.merge(base, "k", "v", changes, "op", "t", "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a2", 2L -> "b", 9L -> "new"))
  }

  test("merge: only each key's latest change applies (ts, id order)") {
    val base = Seq((1L, "a")).toDF(baseCols: _*)
    val changes = Seq(
      (1L, "D", "x", 10L, 100L),
      (1L, "U", "final", 10L, 101L), // same ts, higher id wins
      (1L, "U", "mid", 9L, 99L))
      .toDF("k", "op", "v", "t", "id")
    val out = Cdc.merge(base, "k", "v", changes, "op", "t", "id").collect()
    assert(out.length === 1 && out.head.getString(1) === "final")
    // flip: delete is latest → key disappears
    val del = Seq((1L, "U", "x", 10L, 100L), (1L, "D", "y", 11L, 101L))
      .toDF("k", "op", "v", "t", "id")
    assert(Cdc.merge(base, "k", "v", del, "op", "t", "id").count() === 0L)
  }

  test("merge: unknown op fails fast") {
    val base = Seq((1L, "a")).toDF(baseCols: _*)
    val bad = Seq((1L, "Z", "x", 1L, 1L)).toDF("k", "op", "v", "t", "id")
    val e = intercept[Exception] {
      Cdc.merge(base, "k", "v", bad, "op", "t", "id").collect()
    }
    assert(e.getMessage.contains("unknown op") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown op")))
  }

  test("merge: a malformed op fails even when a newer change shadows it") {
    // validation runs on the RAW stream before latest-change aggregation —
    // a bad op must not be silently discarded by max_by
    val base = Seq((1L, "a")).toDF(baseCols: _*)
    val bad = Seq(
      (1L, "Z", "x", 1L, 1L),          // malformed, NOT the latest
      (1L, "U", "newer", 2L, 2L))      // latest change is fine
      .toDF("k", "op", "v", "t", "id")
    val e = intercept[Exception] {
      Cdc.merge(base, "k", "v", bad, "op", "t", "id").collect()
    }
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("")
    assert(msg(e).contains("unknown op") ||
      Option(e.getCause).exists(c => msg(c).contains("unknown op")))
  }

  test("merge: null op raises with a readable message, not a null one") {
    val base = Seq((1L, "a")).toDF(baseCols: _*)
    val bad = Seq((1L, Option.empty[String], "x", 1L, 1L))
      .toDF("k", "op", "v", "t", "id")
    val e = intercept[Exception] {
      Cdc.merge(base, "k", "v", bad, "op", "t", "id").collect()
    }
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("")
    assert(msg(e).contains("NULL") ||
      Option(e.getCause).exists(c => msg(c).contains("NULL")))
  }

  test("scd2: half-open, gap-free intervals with one current version") {
    val d = Seq(
      (1L, 10L, 100L, "v1"), (1L, 20L, 101L, "v2"), (1L, 30L, 102L, "v3"),
      (2L, 5L, 200L, "only")).toDF("k", "t", "id", "v")
    val out = Cdc.scd2(d, "k", "t", "id", "v")
      .orderBy(col("k"), col("valid_from")).collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq === Seq("v1", "v2", "v3"))
    assert(k1.map(r => Option(r.get(3)).map(_.asInstanceOf[Long])).toSeq ===
      Seq(Some(20L), Some(30L), None))
    // adjacency: each valid_to equals the next valid_from
    assert(k1(0).getLong(3) === k1(1).getLong(2))
    assert(k1.count(_.getBoolean(4)) === 1)
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2.head.getBoolean(4))
  }
}
