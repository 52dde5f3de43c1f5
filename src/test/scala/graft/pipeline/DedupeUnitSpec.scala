package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.block.ConjStats

class DedupeUnitSpec extends AnyFunSuite {

  test("min_rr/max_compare stop refuses low-rr conjunctions") {
    val conjs = Seq(
      ConjStats(Seq("a"), 10, 5, 5, 0.9999),
      ConjStats(Seq("b"), 10, 5, 5, 0.99),
      ConjStats(Seq("c"), 10, 5, 5, 0.5),
      // even a high-rr conjunction AFTER a refused one stays refused
      // (best-first list, reference blocking.py:74-86 break semantics)
      ConjStats(Seq("d"), 10, 5, 5, 0.9999))
    // n = 10000 → C(n,2) = 49,995,000; maxCompare 1e6 → minRr ≈ 0.98
    val kept = Dedupe.applicableConjunctions(conjs, 10000L, 1000000L)
    assert(kept.map(_.conjunction) == Seq(Seq("a"), Seq("b")))
    // unbounded budget admits everything
    assert(Dedupe.applicableConjunctions(conjs, 10000L,
      Long.MaxValue).size == 4)
    // degenerate corpus (n < 2) admits everything
    assert(Dedupe.applicableConjunctions(conjs, 1L, 10L).size == 4)
  }
}
