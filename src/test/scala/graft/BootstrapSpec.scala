package graft

import org.apache.spark.sql.functions._
import graft.reg.Bootstrap

class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  private def frame = (1 to 400)
    .map(i => (i.toLong, 10.0 + (i % 21).toDouble)) // mean 20, spread 10..30
    .toDF("id", "x")

  test("Poisson CDF thresholds are a valid truncated distribution") {
    val c = Bootstrap.PoisCdf
    assert(c.length == 9)
    assert(c.zip(c.tail).forall { case (a, b) => a < b })
    assert(math.abs(c.head - math.exp(-1.0)) < 1e-15)
    assert(c.last > 0.999998 && c.last < 1.0)
  }

  test("CI brackets the point estimate, est is the exact mean, deterministic") {
    val a = Bootstrap.meanCI(frame, col("x"), "id", reps = 100, salt = "s").head
    val exact = (1 to 400).map(i => 10.0 + (i % 21)).sum / 400.0
    assert(math.abs(a.getDouble(0) - exact) < 1e-12)
    assert(a.getDouble(1) < a.getDouble(0) && a.getDouble(0) < a.getDouble(2))
    assert(a.getDouble(2) - a.getDouble(1) > 0.0) // positive width
    assert(a.getLong(3) == 400L && a.getLong(4) == 100L)
    val b = Bootstrap.meanCI(frame, col("x"), "id", reps = 100, salt = "s").head
    assert(a.getDouble(1) == b.getDouble(1) && a.getDouble(2) == b.getDouble(2))
  }

  test("wider level gives a containing interval; salt moves the draws") {
    val narrow = Bootstrap.meanCI(frame, col("x"), "id", reps = 100,
      level = 0.8, salt = "s").head
    val wide = Bootstrap.meanCI(frame, col("x"), "id", reps = 100,
      level = 0.99, salt = "s").head
    assert(wide.getDouble(1) <= narrow.getDouble(1))
    assert(wide.getDouble(2) >= narrow.getDouble(2))
    val other = Bootstrap.meanCI(frame, col("x"), "id", reps = 100,
      salt = "t").head
    assert(other.getDouble(1) != Bootstrap.meanCI(frame, col("x"), "id",
      reps = 100, salt = "s").head.getDouble(1)) // different deal, different CI
  }

  test("constant data collapses the interval to the constant") {
    val const = (1 to 50).map(i => (i.toLong, 7.5)).toDF("id", "x")
    val r = Bootstrap.meanCI(const, col("x"), "id", reps = 50, salt = "s").head
    assert(r.getDouble(1) == 7.5 && r.getDouble(2) == 7.5)
  }
}
