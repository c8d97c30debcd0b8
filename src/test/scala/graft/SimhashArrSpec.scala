package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextOps}

/** The narrow one-pass SimHash (SimhashArr inside a generator) must be
  * row-identical to the pre-r16 explode+groupBy aggregate shape,
  * including the absent-row semantics for token-less and null-text docs
  * (the old explode emitted no row for them). */
class SimhashArrSpec extends SparkTestBase {
  import spark.implicits._

  // the pre-r16 explode + 16-aggregate groupBy shape, verbatim
  private def aggSimhash(df: org.apache.spark.sql.DataFrame, bits: Int) = {
    val tok = df
      .select(col("doc_id").as("id"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("x", TextOps.hash32(col("tok")))
    val bitSums = (0 until bits).map { k =>
      sum(when(shiftright(col("x"), k) % 2 === 1, 1).otherwise(-1)).as(s"b$k")
    }
    tok.groupBy("id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until bits)
          .map(k => when(col(s"b$k") > 0, 1L << k).otherwise(0L))
          .reduce((a, b) => a + b).as("simhash"))
  }

  private def mkDocs(n: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val text =
        if (i % 13 == 0) "" // token-less: must emit NO row
        else if (i % 17 == 0) null // null text: must emit NO row
        else Seq.fill(1 + rng.nextInt(30))(s"tok${rng.nextInt(40)}").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("row-identical to the explode+groupBy shape at 16 and 32 bits") {
    val docs = mkDocs(120, 47)
    Seq(16, 32).foreach { bits =>
      val native = Dedup.simhash(docs, "doc_id", "text", bits)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val agg = aggSimhash(docs, bits)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(native == agg, s"bits=$bits")
      // the empty/null docs are genuinely absent (not zero-signature rows)
      assert(!native.exists(p => p._1 % 13 == 0 || p._1 % 17 == 0))
    }
  }

  test("real testdata: identical signatures to the aggregate shape") {
    val docs = sf("sf0.001", "documents")
    val native = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val agg = aggSimhash(docs, Dedup.SimhashBits)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native == agg)
  }
}
