package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate-coverage pin: every query in [[SparkEntry.queries]] must carry a
  * DuckDB oracle, except members of the explicit rows-only allowlist. The
  * driver silently downgrades an oracle-less query to the weak >0-rows
  * check — so forgetting the `oracles` entry ships a query the gate can
  * never fail (the r11 t38 near-miss: the query landed, the oracle
  * didn't, and 383/383 still read green). SparkEntry already rejects the
  * REVERSE orphan (an oracle without a query); this is the other half.
  */
class OracleCoverageSpec extends AnyFunSuite {

  /** Queries adjudicated rows-only. Currently empty — every query has a
    * full oracle (mm2, the last rows-only member, gained its oracle in
    * r9). A new entry here needs the same adjudication a plan-allowlist
    * entry does: a comment naming WHY DuckDB cannot express the check. */
  private val rowsOnly: Set[String] = Set()

  test("every query carries a DuckDB oracle unless adjudicated rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      rowsOnly
    assert(missing.isEmpty,
      s"queries with NO oracle entry (the gate silently downgrades them " +
        s"to rows-only): ${missing.toSeq.sorted.mkString(", ")} — add the " +
        "DuckDB oracle, or adjudicate into rowsOnly with a reason")
    val stale = rowsOnly & SparkEntry.oracleSql.keySet
    assert(stale.isEmpty,
      s"rows-only entries that HAVE an oracle now (prune them): " +
        stale.toSeq.sorted.mkString(", "))
    val unknown = rowsOnly -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"rows-only entries naming no existing query: " +
        unknown.toSeq.sorted.mkString(", "))
  }
}
