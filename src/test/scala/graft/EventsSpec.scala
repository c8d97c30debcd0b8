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

  test("windowed funnel: steps outside the gap don't convert") {
    // A converts within gap; B's click comes 100 ticks after the view
    // (gap 10 → no), C's purchase is late but click is in time
    val d = ev(
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 9L, "purchase"),
      (2L, 0L, "view"), (2L, 100L, "click"),
      (3L, 0L, "view"), (3L, 8L, "click"), (3L, 200L, "purchase"))
    val out = Events.funnel(d, "u", "t", "e",
      Seq("view", "click", "purchase"), maxGapUs = Some(10L))
      .orderBy("step_idx").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(3L, 2L, 1L))
    // unbounded funnel would convert everyone
    val unbounded = Events.funnel(d, "u", "t", "e",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(unbounded.map(_.getAs[Long]("n_users")).toSeq === Seq(3L, 3L, 2L))
  }

  test("windowed funnel: gap applies to the EARLIEST in-window match, per step") {
    // view at 0; clicks at 50 (out of gap 10) — never reaches step 2 even
    // though a later view at 45 would have put the click in range: the
    // cascade anchors at the EARLIEST step-1 time (deterministic funnel)
    val d = ev((1L, 0L, "view"), (1L, 45L, "view"), (1L, 50L, "click"))
    val out = Events.funnel(d, "u", "t", "e", Seq("view", "click"),
      maxGapUs = Some(10L)).orderBy("step_idx").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 0L))
  }

  private def evId(rows: (Long, Long, Long, String)*) =
    rows.toDF("u", "t", "i", "e")

  test("sequencePatterns: trigram counts across users, top-k total order") {
    // user1: a,b,c,b,c → "a > b > c", "b > c > b", "c > b > c"
    // user2: a,b,c     → "a > b > c"
    val d = evId(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
      (1L, 4L, 4L, "b"), (1L, 5L, 5L, "c"),
      (2L, 1L, 6L, "a"), (2L, 2L, 7L, "b"), (2L, 3L, 8L, "c"))
    val out = Events.sequencePatterns(d, "u", "t", "e", "i", n = 3, topK = 10)
      .collect().map(r => r.getAs[String]("pattern") -> r.getAs[Long]("n"))
    assert(out.head === ("a > b > c", 2L))
    assert(out.toMap === Map("a > b > c" -> 2L, "b > c > b" -> 1L, "c > b > c" -> 1L))
    // top-k cuts deterministically on (count desc, pattern asc)
    val top1 = Events.sequencePatterns(d, "u", "t", "e", "i", n = 3, topK = 1)
      .collect().map(_.getAs[String]("pattern"))
    assert(top1.toSeq === Seq("a > b > c"))
  }

  test("sequencePatterns: sequences never cross users; short streams drop") {
    val d = evId((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (2L, 3L, 3L, "c"))
    val out = Events.sequencePatterns(d, "u", "t", "e", "i", n = 2, topK = 10)
      .collect().map(r => r.getAs[String]("pattern") -> r.getAs[Long]("n"))
    assert(out.toMap === Map("a > b" -> 1L)) // no "b > c" across the user break
    intercept[IllegalArgumentException] {
      Events.sequencePatterns(d, "u", "t", "e", "i", n = 1, topK = 5)
    }
  }

  test("transitions: per-user pair counts, tiebreak total order, row-normalized probs") {
    // user 1: a→b→a (pairs a→b, b→a); user 2: a→b; user 3: single event
    // (no pair); user 4: two events at the SAME t — the id tiebreak fixes
    // the direction as a→b, never b→a
    val d = evId(
      (1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"), (1L, 3L, 12L, "a"),
      (2L, 5L, 20L, "a"), (2L, 6L, 21L, "b"),
      (3L, 1L, 30L, "c"),
      (4L, 7L, 40L, "a"), (4L, 7L, 41L, "b"))
    val out = Events.transitions(d, "u", "t", "e", "i")
      .orderBy("from_event", "to_event").collect()
      .map(r => (r.getAs[String]("from_event"), r.getAs[String]("to_event"),
        r.getAs[Long]("n"), r.getAs[Double]("prob")))
    assert(out.toSeq === Seq(("a", "b", 3L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitions: probabilities normalize within each from-state") {
    // from a: 2× to b, 1× to c → probs 2/3, 1/3
    val d = evId(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (2L, 1L, 3L, "a"), (2L, 2L, 4L, "b"),
      (3L, 1L, 5L, "a"), (3L, 2L, 6L, "c"))
    val probs = Events.transitions(d, "u", "t", "e", "i")
      .orderBy("to_event").collect().map(_.getAs[Double]("prob"))
    assert(math.abs(probs(0) - 2.0 / 3) < 1e-15)
    assert(math.abs(probs(1) - 1.0 / 3) < 1e-15)
  }

  test("anomalousPeriods: 3×MAD rule flags the spike, median/MAD are robust to it") {
    // periods 0..6 have count 10 except period 3 = 100: med=10, mad=0 →
    // the spike flags (any deviation beyond 0), the flat periods don't
    val rows = (0L to 6L).flatMap { p =>
      val n = if (p == 3L) 100 else 10
      (1 to n).map(i => (i.toLong, p * 10L, "x"))
    }
    val out = Events.anomalousPeriods(rows.toDF("u", "t", "e"), "t", periodUs = 10L)
      .orderBy("period").collect()
    assert(out.length === 7)
    assert(out.map(_.getAs[Boolean]("is_anomaly")).toSeq ===
      Seq(false, false, false, true, false, false, false))
    assert(out.head.getAs[Double]("med") === 10.0)
    assert(out.head.getAs[Double]("mad") === 0.0)
  }

  test("anomalousPeriods: nonzero MAD keeps ordinary variation unflagged") {
    // counts 8,9,10,11,12,30: med=10.5, mad=1.5, cut=4.5 → only 30 flags
    val rows = Seq(8, 9, 10, 11, 12, 30).zipWithIndex.flatMap { case (n, p) =>
      (1 to n).map(i => (i.toLong, p * 10L, "x"))
    }
    val out = Events.anomalousPeriods(rows.toDF("u", "t", "e"), "t", periodUs = 10L)
      .orderBy("period").collect()
    assert(out.map(_.getAs[Boolean]("is_anomaly")).toSeq ===
      Seq(false, false, false, false, false, true))
    assert(out.head.getAs[Double]("med") === 10.5)
    assert(out.head.getAs[Double]("mad") === 1.5)
  }

  test("cusumShifts: sustained level shift accumulates and flags; spike-free series doesn't") {
    // 10 periods at n=10, then 10 at n=14: σ≈2.05, drift per shifted
    // period ≈ 14−12−0.5σ ≈ 0.97 → the cusum grows linearly after the
    // shift and crosses 5σ before the series ends
    val rows = (0 until 20).flatMap { p =>
      val n = if (p < 10) 10 else 14
      (1 to n).map(i => (i.toLong, p * 10L, "x"))
    }
    val out = Events.cusumShifts(rows.toDF("u", "t", "e"), "t",
      periodUs = 10L, k = 0.5, h = 2.0)
      .orderBy("period").collect()
    assert(!out.take(10).exists(_.getAs[Boolean]("is_shift")))
    assert(out.takeRight(3).forall(_.getAs[Boolean]("is_shift")))
    // cusum is non-negative everywhere and non-decreasing after the shift
    val cs = out.map(_.getAs[Double]("cusum"))
    assert(cs.forall(_ >= 0.0))
    assert(cs.slice(10, 20).sliding(2).forall(w => w(1) >= w(0)))
  }

  test("cusumShifts: flat series stays at zero cusum") {
    // identical counts: σ=0, dev=0 → cusum exactly 0, nothing flags
    val rows = (0 until 8).flatMap(p => (1 to 5).map(i => (i.toLong, p * 10L, "x")))
    val out = Events.cusumShifts(rows.toDF("u", "t", "e"), "t", periodUs = 10L)
      .collect()
    assert(out.forall(_.getAs[Double]("cusum") === 0.0))
    assert(!out.exists(_.getAs[Boolean]("is_shift")))
  }

  test("funnelBySegment: per-segment cascade with zero-filled spine") {
    // segment X: u1 full depth, u2 stops at view → 2,1,1
    // segment Y: u3 view only → 1,0,0 (zero-filled, conversion 0 then 0)
    val d = ev(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "view"),
      (3L, 1L, "view"))
    val seg = Seq((1L, "X"), (2L, "X"), (3L, "Y")).toDF("u", "segment")
    val out = Events.funnelBySegment(d, "u", "t", "e",
      Seq("view", "click", "purchase"), seg)
      .orderBy("segment", "step_idx").collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Int]("step_idx"),
        r.getAs[Long]("n_users"), r.getAs[Double]("conversion")))
    assert(out.toSeq === Seq(
      ("X", 1, 2L, 1.0), ("X", 2, 1L, 0.5), ("X", 3, 1L, 1.0),
      ("Y", 1, 1L, 1.0), ("Y", 2, 0L, 0.0), ("Y", 3, 0L, 0.0)))
  }

  test("entrySegments picks the tiebreak-first event type") {
    val d = evId((1L, 5L, 10L, "b"), (1L, 5L, 9L, "a"), (2L, 1L, 1L, "c"))
    val seg = Events.entrySegments(d, "u", "t", "e", "i")
      .collect().map(r => r.getAs[Long]("u") -> r.getAs[String]("segment")).toMap
    assert(seg === Map(1L -> "a", 2L -> "c")) // id 9 beats id 10 at the same t
  }

  test("rollingActiveUsers: DAU and trailing-w distinct counts, clipped at max") {
    // periods: u1 active {0, 2}; u2 active {0}; u3 active {3}
    // w=1: p0→2, p2→1, p3→1
    // w=2: p0→2, p1→2 (carry of p0), p2→1, p3→2 (u1 from p2 + u3)
    //   (no p4 row: clipped at the observed max period 3)
    val d = ev(
      (1L, 0L, "x"), (1L, 5L, "x"), (1L, 25L, "x"),
      (2L, 3L, "x"),
      (3L, 30L, "x"))
    val out = Events.rollingActiveUsers(d, "u", "t", periodUs = 10L,
      windows = Seq(1, 2))
      .orderBy("win", "period").collect()
      .map(r => (r.getAs[Int]("win"), r.getAs[Long]("period"),
        r.getAs[Long]("n_active")))
    assert(out.toSeq === Seq(
      (1, 0L, 2L), (1, 2L, 1L), (1, 3L, 1L),
      (2, 0L, 2L), (2, 1L, 2L), (2, 2L, 1L), (2, 3L, 2L)))
  }

  test("rollingActiveUsers validates windows") {
    val d = ev((1L, 0L, "x"))
    intercept[IllegalArgumentException] {
      Events.rollingActiveUsers(d, "u", "t", 10L, Seq())
    }
    intercept[IllegalArgumentException] {
      Events.rollingActiveUsers(d, "u", "t", 10L, Seq(1, 1))
    }
  }

  test("survivalCurve: hand-computed KM with censoring, buckets, and at-risk sets") {
    // quantize 10; A converts dur 5 (b0), B dur 25 (b2), E dur 0 censored
    // (b0), D dur 10 censored (b1), C dur 30 censored (b3); tmax = 40.
    // Event buckets: b0 (n=5, d=1 → 0.8), b2 (n=2, d=1 → 0.8·0.5 = 0.4)
    val d = ev(
      (1L, 0L, "view"), (1L, 5L, "purchase"),
      (2L, 0L, "view"), (2L, 25L, "purchase"),
      (3L, 10L, "view"),
      (4L, 30L, "view"),
      (5L, 40L, "view"))
    val out = Events.survivalCurve(d, "u", "t", "e", "view", "purchase",
      quantizeUs = 10L).orderBy("t").collect()
    assert(out.map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
      r.getAs[Long]("n_events"))).toSeq === Seq((0L, 5L, 1L), (2L, 2L, 1L)))
    val s = out.map(_.getAs[Double]("survival"))
    assert(math.abs(s(0) - 0.8) < 1e-12)
    assert(math.abs(s(1) - 0.4) < 1e-12)
  }

  test("survivalCurve: everyone-converts bucket zeroes the tail (no log(0) leak)") {
    // both users convert in bucket 0 → factor 0 at the only event time
    val d = ev(
      (1L, 0L, "view"), (1L, 1L, "purchase"),
      (2L, 0L, "view"), (2L, 2L, "purchase"))
    val out = Events.survivalCurve(d, "u", "t", "e", "view", "purchase",
      quantizeUs = 10L).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("survival") === 0.0)
    // an end event BEFORE the user's first start never counts
    val d2 = ev((1L, 5L, "view"), (1L, 2L, "purchase"), (2L, 0L, "view"))
    val out2 = Events.survivalCurve(d2, "u", "t", "e", "view", "purchase",
      quantizeUs = 10L).collect()
    assert(out2.isEmpty) // nobody converts → no event buckets
  }

  test("rollingActivity: trailing ROWS window over existing periods, exact ratios") {
    // type x: periods 0,1,2 with n=2,4,6 → w=2 ma: 2, 3, 5
    val d = Seq(
      (1L, 1L, "x"), (1L, 2L, "x"),
      (1L, 11L, "x"), (1L, 12L, "x"), (1L, 13L, "x"), (1L, 14L, "x"),
      (1L, 21L, "x"), (1L, 22L, "x"), (1L, 23L, "x"),
      (1L, 24L, "x"), (1L, 25L, "x"), (1L, 26L, "x"))
      .toDF("u", "t", "e")
    val out = Events.rollingActivity(d, "e", "t", periodUs = 10L, w = 2)
      .orderBy("period").collect()
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(2L, 4L, 6L))
    assert(out.map(_.getAs[Double]("ma")).toSeq === Seq(2.0, 3.0, 5.0))
    assert(out.map(_.getAs[Double]("ratio")).toSeq === Seq(1.0, 4.0 / 3, 1.2))
  }

  test("activityStreaks: islands, gaps, and multi-event days") {
    // user 1 active periods {0,1,2, 5,6, 9} → longest 3, 3 streaks, 6 days
    // user 2 active period {4} (three events same day) → 1/1/1
    val d = Seq(
      (1L, 0L), (1L, 5L), (1L, 12L), (1L, 27L), (1L, 51L), (1L, 68L),
      (1L, 91L),
      (2L, 40L), (2L, 42L), (2L, 47L)).toDF("u", "t")
    val out = Events.activityStreaks(d, "u", "t", periodUs = 10L)
      .orderBy("user_id").collect()
    assert(out.length === 2)
    val u1 = out(0)
    assert(u1.getAs[Long]("longest_streak") === 3L)
    assert(u1.getAs[Long]("n_streaks") === 3L)
    assert(u1.getAs[Long]("n_active_periods") === 6L)
    val u2 = out(1)
    assert((u2.getAs[Long]("longest_streak"), u2.getAs[Long]("n_streaks"),
      u2.getAs[Long]("n_active_periods")) === ((1L, 1L, 1L)))
  }

  test("seasonalResiduals: phase profile means and z, degenerate phases NULL") {
    // period 10, season 2 → phases 0/1. type x counts:
    // periods 0,2 (phase 0): n=2,4 → mean 3, var 2, sd √2
    // period 1 (phase 1): n=3 → single obs → z NULL
    val rows =
      Seq.fill(2)((1L, "x")) ++ Seq.fill(3)((12L, "x")) ++ Seq.fill(4)((25L, "x"))
    val d = rows.map { case (t, e) => (e, t) }.toDF("e", "t")
    val out = Events.seasonalResiduals(d, "e", "t", periodUs = 10L, season = 2)
      .orderBy("period").collect()
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(2L, 3L, 4L))
    assert(out(0).getAs[Double]("phase_mean") === 3.0)
    assert(math.abs(out(0).getAs[Double]("z") + 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("z") - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(out(1).isNullAt(out(1).fieldIndex("z")))
  }

  test("debounce: bursts collapse to their opening event, per key") {
    // user 1: 0,5,9 with gap 6 — raw-predecessor rule keeps ONLY t=0
    // (5-0<=6 drops, 9-5<=6 drops even though 9-0>6); then 20 starts anew
    val d = Seq(
      (1L, 0L, 10L), (1L, 5L, 11L), (1L, 9L, 12L), (1L, 20L, 13L),
      (2L, 3L, 20L)).toDF("u", "t", "id")
    val out = Events.debounce(d, Seq("u"), "t", "id", gapUs = 6L)
      .orderBy("u", "t").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 0L), (1L, 20L), (2L, 3L)))
    // payload columns pass through
    assert(out.head.schema.fieldNames.toSet === Set("u", "t", "id"))
  }

  test("resampleFill: per-key grid, forward fill, within-period latest wins") {
    val d = Seq(
      // user 1: obs at periods 0 (two events — later wins) and 3
      (1L, 1L, 10L, 5.0), (1L, 7L, 11L, 6.0), (1L, 33L, 12L, 9.0),
      // user 2: single period → single grid row
      (2L, 55L, 20L, 4.0)).toDF("u", "t", "id", "v")
    val out = Events.resampleFill(d, "u", "t", "id", "v", periodUs = 10L)
      .orderBy("key", "period").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(u1.map(_.getAs[Double]("value")).toSeq === Seq(6.0, 6.0, 6.0, 9.0))
    assert(u1.map(_.getAs[Boolean]("is_observed")).toSeq ===
      Seq(true, false, false, true))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2.head.getAs[Double]("value") === 4.0)
  }

  test("latestPerKey: max_by (ts, id) snapshot with version counts") {
    val d = Seq(
      // user 1 / x: versions at t=1,5 → last v=7.0; same-t tie at key 2/y
      (1L, "x", 1L, 100L, 3.0), (1L, "x", 5L, 101L, 7.0),
      (2L, "y", 4L, 200L, 1.0), (2L, "y", 4L, 201L, 2.0))
      .toDF("u", "e", "t", "id", "v")
    val out = Events.latestPerKey(d, Seq("u", "e"), "t", "id", "v")
      .orderBy("u").collect()
    assert(out(0).getAs[Double]("last_value") === 7.0)
    assert(out(0).getAs[Long]("last_id") === 101L)
    assert(out(0).getAs[Long]("n_versions") === 2L)
    // simultaneous versions: larger id wins deterministically
    assert(out(1).getAs[Double]("last_value") === 2.0)
    assert(out(1).getAs[Long]("last_ts") === 4L)
  }

  test("rollingTrend: exact slope over the trailing window, NULL when degenerate") {
    // type x: periods 0,1,2 with y = 1, 3, 5 → slope 2 everywhere the
    // window holds ≥2 points; first period slope NULL
    val d = Seq(
      ("x", 1L, 1.0),
      ("x", 11L, 3.0),
      ("x", 21L, 2.0), ("x", 22L, 3.0)).toDF("e", "t", "v")
    val out = Events.rollingTrend(d, "e", "t", "v", periodUs = 10L, w = 3)
      .orderBy("period").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("slope")))
    assert(math.abs(out(1).getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("slope") - 2.0) < 1e-12)
    assert(out(2).getAs[Double]("y") === 5.0)
  }

  test("sessionStats: bounce rate and exact ratios over gap sessions") {
    // user 1: events at 0,5 (one session, 2 events, dur 5), then 100
    // (bounce) → 2 sessions, 1 bounce, 3 events, durations 5+0
    // user 2: single event → 1 session, 1 bounce
    val d = Seq(
      (1L, 0L, 10L), (1L, 5L, 11L), (1L, 100L, 12L),
      (2L, 7L, 20L)).toDF("u", "t", "id")
    val out = Events.sessionStats(d, "u", "t", "id", gapUs = 20L)
      .orderBy("user_id").collect()
    val u1 = out(0)
    assert(u1.getAs[Long]("n_sessions") === 2L)
    assert(u1.getAs[Long]("n_bounces") === 1L)
    assert(u1.getAs[Double]("bounce_rate") === 0.5)
    assert(u1.getAs[Long]("n_events") === 3L)
    assert(u1.getAs[Double]("events_per_session") === 1.5)
    assert(u1.getAs[Double]("avg_dur_us") === 2.5)
    val u2 = out(1)
    assert((u2.getAs[Long]("n_sessions"), u2.getAs[Long]("n_bounces")) === ((1L, 1L)))
  }

  test("ohlcDownsample: open/close by (ts, id) order, high/low/sum exact") {
    val d = Seq(
      // type x, period 0: ts 1,3,9 → open=5.0, close=2.0
      ("x", 1L, 10L, 5.0), ("x", 9L, 11L, 2.0), ("x", 3L, 12L, 9.0),
      // type x, period 1: single event
      ("x", 12L, 13L, 4.0),
      // type y, period 0: simultaneous ts → id tiebreak (20 before 21)
      ("y", 5L, 21L, 7.0), ("y", 5L, 20L, 1.0)).toDF("e", "t", "id", "v")
    val out = Events.ohlcDownsample(d, "e", "t", "id", "v", periodUs = 10L)
      .orderBy("event_type", "period").collect()
    val x0 = out(0)
    assert((x0.getAs[Double]("open"), x0.getAs[Double]("high"),
      x0.getAs[Double]("low"), x0.getAs[Double]("close")) === ((5.0, 9.0, 2.0, 2.0)))
    assert(x0.getAs[Long]("n_events") === 3L)
    assert(x0.getAs[Double]("value_sum") === 16.0)
    val x1 = out(1)
    assert((x1.getAs[Double]("open"), x1.getAs[Double]("close")) === ((4.0, 4.0)))
    val y0 = out(2)
    assert((y0.getAs[Double]("open"), y0.getAs[Double]("close")) === ((1.0, 7.0)))
  }

  test("sesForecast: closed-form weighted sum equals the recurrence") {
    // type x, periods 0/1/2 (periodUs = 10), per-period sums 1, 2, 4:
    // s1 = 1, s2 = .5*2 + .5*1 = 1.5, s3 = .5*4 + .5*1.5 = 2.75
    val df = Seq(
      ("x", 1L, 0.5), ("x", 7L, 0.5), // period 0 sums to 1
      ("x", 12L, 2.0), ("x", 25L, 4.0),
      ("y", 3L, 3.0) // single-period series: level = x1
    ).toDF("event_type", "tus", "value")
    val out = graft.operators.Events
      .sesForecast(df, "event_type", "tus", "value",
        periodUs = 10L, alpha = 0.5)
      .orderBy("event_type").collect()
    assert(out.length === 2)
    assert(out(0).getString(0) === "x" && out(0).getLong(1) === 3L)
    assert(out(0).getDouble(2) === 4.0)
    assert(math.abs(out(0).getDouble(3) - 2.75) < 1e-12)
    assert(out(1).getString(0) === "y" && out(1).getLong(1) === 1L)
    assert(out(1).getDouble(2) === 3.0)
    assert(math.abs(out(1).getDouble(3) - 3.0) < 1e-12)
    // alpha = 1: level is just the last observation
    val a1 = graft.operators.Events
      .sesForecast(df, "event_type", "tus", "value",
        periodUs = 10L, alpha = 1.0)
      .orderBy("event_type").collect()
    assert(a1(0).getDouble(3) === 4.0)
  }

  test("acf: dense-spine autocorrelation matches hand sums") {
    // counts by period (periodUs = 10): [2, 0, 2, 1] — period 1 has no
    // events and must be zero-filled by the spine; x̄ = 5/4, den = 11/4,
    // r1 = -3/4, r2 = 7/22
    val df = Seq(
      ("x", 1L), ("x", 5L), // period 0: 2 events
      ("x", 21L), ("x", 29L), // period 2: 2 events
      ("x", 33L) // period 3: 1 event
    ).toDF("event_type", "tus")
    val out = graft.operators.Events
      .acf(df, "event_type", "tus", periodUs = 10L, maxLag = 2)
      .orderBy("lag").collect()
    assert(out.length === 2)
    assert(out(0).getInt(1) === 1 && out(0).getLong(2) === 4L)
    assert(math.abs(out(0).getDouble(3) - (-0.75)) < 1e-12)
    assert(math.abs(out(1).getDouble(3) - 7.0 / 22.0) < 1e-12)
    // constant series: zero denominator, NULL acf
    val const = Seq(("y", 1L), ("y", 11L), ("y", 21L))
      .toDF("event_type", "tus")
    val oc = graft.operators.Events
      .acf(const, "event_type", "tus", periodUs = 10L, maxLag = 1)
      .collect()
    assert(oc.length === 1 && oc(0).isNullAt(3))
    // lag past the series length: no pairs, acf 0 by the zero-pad rule
    // (counts [2, 1]: x̄ = 1.5, den = 0.5, r1 = -0.5; r2/r3 padded 0)
    val short = Seq(("z", 1L), ("z", 5L), ("z", 11L))
      .toDF("event_type", "tus")
    val os = graft.operators.Events
      .acf(short, "event_type", "tus", periodUs = 10L, maxLag = 3)
      .orderBy("lag").collect()
    assert(os.length === 3)
    assert(math.abs(os(0).getDouble(3) - (-0.5)) < 1e-12)
    assert(math.abs(os(1).getDouble(3)) < 1e-12)
    assert(math.abs(os(2).getDouble(3)) < 1e-12)
  }
}
