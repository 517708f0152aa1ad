package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: a typo'd oracle key or a
  * misshapen query name would not fail anything at build time — it would
  * silently demote a query to rows-only (or orphan an oracle), which is
  * exactly the class of quiet contract drift round 1 suffered. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names an existing query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("query names are safe directory basenames for the Verify dump") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"unsafe query names: $bad")
  }

  test("oracle SQL strings are nonempty and reference no placeholder except " +
      "__SF_DIR__ / __WAREHOUSE__ (both substituted by Verify at dump time)") {
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(v.trim.nonEmpty, s"$k: empty oracle")
      val leftover = "__[A-Z_]+__".r.findAllIn(v).toSet - "__SF_DIR__" - "__WAREHOUSE__"
      assert(leftover.isEmpty, s"$k: unresolved placeholders $leftover")
    }
  }

  test("oracle coverage: every query has a DuckDB oracle") {
    // everything downstream of the kernel is DuckDB-replayed over the
    // materialized extraction spans since round 5; since round 6 even
    // j5_golden_compare is oracled (row-set comparison of the two dumped
    // extractor stores), so NOTHING may lack an oracle
    val kernelOnly = Set.empty[String]
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing == kernelOnly,
      s"oracle coverage drifted: unexpected=${missing.diff(kernelOnly)} " +
        s"newly-covered=${kernelOnly.diff(missing)} (update this list deliberately)")
  }
}
