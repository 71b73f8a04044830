package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Registry invariants the docs cite — README/SURVEY counts reference
 * THESE tested constants, so the numbers can't silently drift (it
 * happened three rounds running when they were prose).
 */
class RegistrySpec extends AnyFunSuite {

  test("registry counts match the documented surface") {
    assert(SparkEntry.queries.size == 259)
    assert(SparkEntry.oracleSql.size == 259)
  }

  test("no oracle carries a lone '|' outside string literals") {
    // the round-8 oracleSql normalization once included stripMargin,
    // which ate the first pipe of any line-leading '||' (two oracles
    // bitten before removal). stripMargin is gone; this guard keeps
    // the corruption class out for good — we never use SQL bitwise
    // OR, so a lone '|' outside string literals is always a mangled
    // concatenation.
    val lone = "(?<!\\|)\\|(?!\\|)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val outsideLiterals = sql.replaceAll("'[^']*'", "''")
      assert(lone.findFirstIn(outsideLiterals).isEmpty,
        s"$name has a lone '|' outside string literals — a mangled " +
          "'||' concatenation; check the oracle literal")
    }
  }

  test("every oracle belongs to a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("the rows-only set is empty — every query is oracle-paired") {
    // round 12 promoted the last 7 sketch/hash-family queries to
    // bounded-error gates (approx AND exact in-plan, constant-row or
    // data-derived oracle verdicts); a rows-only entry reappearing here
    // means a gate was silently demoted
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"rows-only queries crept back: $rowsOnly")
  }
}
