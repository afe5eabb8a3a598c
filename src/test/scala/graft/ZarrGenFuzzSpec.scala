package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.ZarrGenFuzz

/** Fuzz v4 in the suite: a slice of the snapshot/overwrite/GC
  * interleaving fuzz (the full 250-seed run is a gate-lane command —
  * see the verify skill). Eight seeds keep suite time bounded while
  * still covering redirected snapshot reads and at least one chained
  * overwrite on most shuffles of the op grammar; the runner's
  * required-case exit check guards full coverage at 250. */
class ZarrGenFuzzSpec extends AnyFunSuite {
  import TestSession._

  test("snapshot/overwrite/GC interleavings: 8 seeded sequences verify against the model") {
    val c = new ZarrGenFuzz.Counters
    val errs = (0L until 8L).flatMap(seed => ZarrGenFuzz.runSeed(spark, seed, c))
    assert(errs.isEmpty, errs.mkString("; "))
    // the 8-seed slice must at least read through a redirect — the
    // machinery under test is pointless if no sequence exercised it
    assert(c.redirectRead > 0, s"no redirected snapshot read in 8 seeds: ${c.toJson}")
  }
}
