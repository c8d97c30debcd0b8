package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomAgg, BloomMightContain}
import graft.operators.BloomJoin

/** Bloom filter: no false negatives ever, exactness of the filtered semi
  * join (FPs removed by the verifying join), mergeability across
  * partitions, and null semantics. */
class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def buildBloom(keys: org.apache.spark.sql.DataFrame,
      m: Int, k: Int): Array[Byte] =
    keys.agg(BloomAgg(xxhash64(col("k")), m, k).as("b"))
      .collect()(0).getAs[Array[Byte]](0)

  test("no false negatives: every inserted key passes might_contain") {
    val keys = (1L to 500L).toDF("k").repartition(7) // force partial-merge
    val bloom = buildBloom(keys, 4096, 5)
    val checked = keys
      .select(BloomMightContain(xxhash64(col("k")), bloom, 4096, 5).as("hit"))
      .collect()
    assert(checked.forall(_.getBoolean(0)), "a member key was rejected")
  }

  test("filter prunes most non-members at sane sizing") {
    val bloom = buildBloom((1L to 100L).toDF("k"), 8192, 5)
    val probes = (10000L to 11000L).toDF("k")
    val fp = probes
      .filter(BloomMightContain(xxhash64(col("k")), bloom, 8192, 5))
      .count()
    // ~1000 probes, expected FP rate well under 1% at m/n = 80
    assert(fp < 20, s"false-positive count too high: $fp")
  }

  test("semiJoin equals the plain left_semi join") {
    val big = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "payload")
    val small = Seq(3L, 500L, 999L, 1500L).toDF("j")
    val got = BloomJoin.semiJoin(big, col("k"), small, col("j"))
      .orderBy("k").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(3L, 500L, 999L))
  }

  test("semiJoin stays exact even with a deliberately tiny filter") {
    val big = (1L to 2000L).map(i => (i, i % 7)).toDF("k", "v")
    val small = (1L to 2000L by 13).toDF("j")
    val expected = big.join(small, col("k") === col("j"), "left_semi")
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    // 64 bits for 154 keys: almost every probe is a false positive —
    // the verifying join must still produce the exact result
    val got = BloomJoin.semiJoin(big, col("k"), small, col("j"),
        numBits = 64, numHashes = 2)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got === expected)
  }

  test("empty small side yields an empty result") {
    val big = (1L to 50L).toDF("k")
    val small = Seq.empty[Long].toDF("j")
    assert(BloomJoin.semiJoin(big, col("k"), small, col("j")).count() === 0L)
  }

  test("null hash returns NULL (row dropped by filter semantics)") {
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("k", "t")
    val bloom = buildBloom(Seq(1L).toDF("k"), 256, 3)
    // xxhash64(null) is null, so might_contain is null → filtered out
    val kept = df
      .filter(BloomMightContain(xxhash64(col("k")), bloom, 256, 3))
      .collect()
    assert(kept.map(_.getString(1)).toSeq === Seq("a"))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      graft.functions.BloomMightContain(lit(1L), new Array[Byte](4), 32, 3)
    }
    intercept[IllegalArgumentException] {
      graft.functions.BloomMightContain(lit(1L), new Array[Byte](32), 256, 0)
    }
    intercept[IllegalArgumentException] {
      // byte length must match numBits
      graft.functions.BloomMightContain(lit(1L), new Array[Byte](4), 256, 3)
    }
  }

  test("semiJoin: type-mismatched integral keys widen and stay exact") {
    // int big key vs long small key: the equi join coerces and matches,
    // so the bloom must hash a common type or it false-negatives every row
    val big = (1 to 1000).map(i => (i, s"r$i")).toDF("k", "payload")
    val small = Seq(3L, 500L, 999L, 1500L).toDF("j")
    val got = BloomJoin.semiJoin(big, col("k"), small, col("j"))
      .orderBy("k").collect().map(_.getInt(0))
    assert(got.toSeq === Seq(3, 500, 999))
  }

  test("semiJoin: non-integral type mismatch is refused, not silently wrong") {
    val big = (1 to 10).map(_.toString).toDF("k")
    val small = Seq(3L).toDF("j")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(big, col("k"), small, col("j"))
    }
    assert(e.getMessage.contains("cast both keys"))
  }

  test("might_contain probes with identical content compare equal (CSE/reuse)") {
    val bloom1 = buildBloom((1L to 50L).toDF("k"), 256, 3)
    val bloom2 = buildBloom((1L to 50L).toDF("k"), 256, 3) // fresh array, same bits
    assert(!(bloom1 eq bloom2))
    val keyHash = org.apache.spark.sql.catalyst.expressions.Literal(42L)
    val a = new graft.functions.BloomMightContain(keyHash, bloom1, 256, 3)
    val b = new graft.functions.BloomMightContain(keyHash, bloom2, 256, 3)
    assert(a === b)
    assert(a.hashCode === b.hashCode)
    assert(a.semanticEquals(b))
    // and content INEQUALITY still separates different filters
    val bloom3 = buildBloom((51L to 99L).toDF("k"), 256, 3)
    assert(a !== new graft.functions.BloomMightContain(keyHash, bloom3, 256, 3))
  }
}
