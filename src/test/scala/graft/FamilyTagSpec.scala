package graft

import org.scalatest.funsuite.AnyFunSuite

/** Battery hygiene (round-8 verdict item #7): every query carries exactly
  * one operator-family tag, so the oracle gate's per-family report can
  * never silently omit a query. Pure map algebra — no Spark session. */
class FamilyTagSpec extends AnyFunSuite {

  test("every battery query has a family tag and no tag is stale") {
    val qs = SparkEntry.queries.keySet
    val tagged = Queries.families.keySet
    val missing = qs -- tagged
    val stale = tagged -- qs
    assert(missing.isEmpty, s"untagged queries: ${missing.toSeq.sorted}")
    assert(stale.isEmpty, s"tags for nonexistent queries: ${stale.toSeq.sorted}")
  }

  test("every query with an oracle is in the battery") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: ${orphans.toSeq.sorted}")
  }
}
