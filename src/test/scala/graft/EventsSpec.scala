package graft

import org.apache.spark.sql.functions._

import graft.operators.Events

/** Funnel conversion + retention cohorts on hand-built event logs with
  * known reach depths, order violations, and timestamp ties. */
class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("u", "t", "e")

  test("funnel: earliest order-respecting match, ties count, order violations don't") {
    // A: full depth; B: click BEFORE its first view (reaches view only);
    // C: view then click (depth 2); D: purchase only (reaches nothing);
    // E: all three at the SAME timestamp — >= semantics reach full depth
    val d = ev(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "click"), (2L, 2L, "view"),
      (3L, 5L, "view"), (3L, 7L, "click"),
      (4L, 1L, "purchase"),
      (5L, 4L, "view"), (5L, 4L, "click"), (5L, 4L, "purchase"))
    val out = Events.funnel(d, "u", "t", "e", Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(out.map(_.getAs[String]("step")).toSeq ===
      Seq("view", "click", "purchase"))
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(4L, 3L, 2L))
    val conv = out.map(_.getAs[Double]("conversion"))
    assert(conv(0) === 1.0)
    assert(math.abs(conv(1) - 3.0 / 4) < 1e-15)
    assert(math.abs(conv(2) - 2.0 / 3) < 1e-15)
  }

  test("funnel: a step nobody reaches zeroes the tail, conversion 0") {
    val d = ev((1L, 1L, "view"), (2L, 2L, "view"))
    val out = Events.funnel(d, "u", "t", "e", Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(2L, 0L, 0L))
    assert(out(1).getAs[Double]("conversion") === 0.0)
    assert(out(2).getAs[Double]("conversion") === 0.0) // 0/0 guarded to 0
  }

  test("funnel input validation") {
    val d = ev((1L, 1L, "view"))
    intercept[IllegalArgumentException] {
      Events.funnel(d, "u", "t", "e", Nil)
    }
    intercept[IllegalArgumentException] {
      Events.funnel(d, "u", "t", "e", Seq("view", "view"))
    }
  }

  test("retention cohorts: first-activity period anchors each user's offsets") {
    // period 10: A active in periods {0, 2} (cohort 0); B in {1, 3}
    // (cohort 1); C in {0} only — duplicate events in one period count once
    val d = ev(
      (1L, 0L, "x"), (1L, 5L, "x"), (1L, 25L, "x"),
      (2L, 12L, "x"), (2L, 33L, "x"),
      (3L, 9L, "x"), (3L, 9L, "x"))
    val out = Events.retentionCohorts(d, "u", "t", periodUs = 10L)
      .orderBy("cohort_period", "period_offset")
      .collect()
      .map(r => (r.getAs[Long]("cohort_period"), r.getAs[Long]("period_offset"),
        r.getAs[Long]("n_users")))
    assert(out.toSeq === Seq((0L, 0L, 2L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("retention validates the period") {
    intercept[IllegalArgumentException] {
      Events.retentionCohorts(ev((1L, 1L, "x")), "u", "t", periodUs = 0L)
    }
  }
}
