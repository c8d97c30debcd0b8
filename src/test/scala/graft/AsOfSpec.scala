package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join attaches most recent prior value, inclusive at equal ts") {
    val views = Seq(
      (1L, 10L, 100L, 1.0), // before any click → null
      (1L, 20L, 101L, 2.0), // click at 20 exists → inclusive
      (1L, 35L, 102L, 3.0), // after clicks at 20, 30 → 30's value
      (2L, 50L, 103L, 4.0)  // other key, no clicks → null
    ).toDF("user_id", "tus", "event_id", "value")
    val clicks = Seq(
      (1L, 20L, 900L, 7.5),
      (1L, 30L, 901L, 8.5)
    ).toDF("user_id", "tus", "event_id", "click_value")
    val out = AsOf.joinAsOf(views, clicks, "user_id", "tus", Seq("click_value"),
      tieBreakCol = Some("event_id"))
      .orderBy("user_id", "tus")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[Any]("click_value_asof"))))
    assert(out.toSeq == Seq(
      100L -> None, 101L -> Some(7.5), 102L -> Some(8.5), 103L -> None))
  }

  test("joinAsOf rejects reserved-name collisions, duplicate/missing valueCols") {
    val r = Seq((1L, 5L, 2.0)).toDF("k", "ts", "v")
    val lReserved = Seq((1L, 10L, 1.0)).toDF("k", "ts", "__side")
    intercept[IllegalArgumentException] { AsOf.joinAsOf(lReserved, r, "k", "ts", Seq("v")) }
    val lOut = Seq((1L, 10L, 1.0)).toDF("k", "ts", "v_asof")
    intercept[IllegalArgumentException] { AsOf.joinAsOf(lOut, r, "k", "ts", Seq("v")) }
    val l = Seq((1L, 10L)).toDF("k", "ts")
    intercept[IllegalArgumentException] { AsOf.joinAsOf(l, r, "k", "ts", Seq("v", "v")) }
    intercept[IllegalArgumentException] { AsOf.joinAsOf(l, r, "k", "ts", Seq("nope")) }
  }

  test("ties among right rows at one timestamp resolve to the highest tiebreak") {
    val views = Seq((1L, 20L, 100L, 0.0)).toDF("user_id", "tus", "event_id", "value")
    val clicks = Seq((1L, 20L, 900L, 1.0), (1L, 20L, 901L, 2.0))
      .toDF("user_id", "tus", "event_id", "click_value")
    val out = AsOf.joinAsOf(views, clicks, "user_id", "tus", Seq("click_value"),
      tieBreakCol = Some("event_id")).collect()
    assert(out(0).getAs[Double]("click_value_asof") == 2.0)
  }
}
