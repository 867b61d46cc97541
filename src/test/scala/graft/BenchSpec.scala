package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.hostProfileRatio]]'s computation — the probe itself
  * can't be meaningfully tested locally (one cannot plant a slow
  * host), so the spec pins the pure math the artifact field is
  * derived from: median of per-query probe/baseline ratios over the
  * fixed probe set, None below two overlapping queries. */
class BenchSpec extends AnyFunSuite {

  private val q = Bench.hostProfileQueries

  test("median of three per-query ratios, robust to one outlier") {
    val base = Map(q(0) -> 1.0, q(1) -> 2.0, q(2) -> 0.5)
    // ratios 1.2, 1.5, 6.0 -> median 1.5 (the 6.0 flutter is ignored)
    val probe = Map(q(0) -> 1.2, q(1) -> 3.0, q(2) -> 3.0)
    assert(Bench.hostProfileRatio(probe, base).contains(1.5))
  }

  test("two overlapping queries -> mean of the two ratios; one -> None") {
    val base = Map(q(0) -> 1.0, q(1) -> 1.0)
    val probe = Map(q(0) -> 1.0, q(1) -> 2.0, q(2) -> 9.9)
    assert(Bench.hostProfileRatio(probe, base).contains(1.5))
    assert(Bench.hostProfileRatio(Map(q(0) -> 1.0), base).isEmpty)
  }

  test("non-positive and missing entries never contribute") {
    val base = Map(q(0) -> 0.0, q(1) -> -1.0, q(2) -> 2.0)
    val probe = Map(q(0) -> 1.0, q(1) -> 1.0, q(2) -> 4.0)
    // only q(2) has a usable baseline -> below the 2-query floor
    assert(Bench.hostProfileRatio(probe, base).isEmpty)
    assert(Bench.hostProfileRatio(Map.empty, base).isEmpty)
  }

  test("only the fixed probe set is consulted — stray keys in either " +
      "map cannot skew the profile") {
    val base = Map(q(0) -> 1.0, q(1) -> 1.0, "q_other" -> 1.0)
    val probe = Map(q(0) -> 1.0, q(1) -> 1.0, "q_other" -> 100.0)
    assert(Bench.hostProfileRatio(probe, base).contains(1.0))
  }

  test("hostProfileOverlap reports exactly the contributing sample " +
      "count — the artifact-side flag for a degenerate 2-ratio median") {
    val base = Map(q(0) -> 1.0, q(1) -> 1.0, q(2) -> 2.0)
    val full = Map(q(0) -> 1.0, q(1) -> 2.0, q(2) -> 4.0)
    assert(Bench.hostProfileOverlap(full, base) == 3)
    assert(Bench.hostProfileOverlap(full - q(2), base) == 2)
    assert(Bench.hostProfileOverlap(Map(q(0) -> 1.0), base) == 1)
    assert(Bench.hostProfileOverlap(Map.empty, base) == 0)
    // non-positive entries drop out of the count exactly as they
    // drop out of the median
    assert(Bench.hostProfileOverlap(full, base + (q(0) -> 0.0)) == 2)
  }
}
