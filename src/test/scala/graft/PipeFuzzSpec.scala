package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.PipeFuzz

/** PipeFuzz generator invariants + a small executed slice. The full
  * 250-seed differential run (Spark vs DuckDB) is driven by
  * `graft.fuzz.PipeFuzzRun` + tools/compare.py outside the suite. */
class PipeFuzzSpec extends AnyFunSuite {
  import TestSession._

  test("generator is deterministic: same seed, same family/tag/sql") {
    (0L until 60L).foreach { seed =>
      val a = PipeFuzz.gen(seed)
      val b = PipeFuzz.gen(seed)
      assert(a.family === b.family)
      assert(a.tag === b.tag)
      assert(a.sql === b.sql)
    }
  }

  test("250-seed space covers every family and both emb dispatch sides") {
    val gens = (0L until 250L).map(PipeFuzz.gen)
    val fams = gens.groupBy(_.family).map { case (f, g) => f -> g.size }
    Seq("span_detect", "span_apply", "exact_dedup", "ngram_pairs",
        "minhash_pairs", "simhash_pairs", "emb_pairs", "ann_topk",
        "sem_dedup", "kmeans", "ann_ivf", "decon")
      .foreach(f => assert(fams.getOrElse(f, 0) > 0, s"family $f never drawn"))
    val thetas = gens.filter(_.family == "emb_pairs")
      .map(_.tag.split(" ").head.stripPrefix("theta=").toDouble)
    assert(thetas.exists(_ >= 0.8), "LSH dispatch side never drawn")
    assert(thetas.exists(_ < 0.8), "tiled dispatch side never drawn")
    // d8's dispatch side is data-dependent (sliced count vs k), but the
    // tcs DRAW must span values that land flat (k small) and
    // hierarchical (k > 64) on the unsliced sf0.01 corpus of 500
    // vectors — the runner then proves the sides actually taken
    val tcss = gens.filter(_.family == "sem_dedup")
      .map(_.tag.split(" ").head.stripPrefix("tcs=").toInt)
    assert(tcss.exists(_ >= 8), "a flat-side tcs (k <= 64 at N=500) never drawn")
    assert(tcss.exists(_ <= 4), "a hier-side tcs (k > 64 at N=500) never drawn")
    // count only families that CAN slice (tag carries a where marker):
    // decon's tag has no where and must not inflate the sliced count
    val sliced = gens.count(g =>
      g.tag.contains("where=[") && !g.tag.endsWith("where=[]"))
    assert(sliced > 0 && sliced < gens.size,
      "slices must appear but not dominate")
  }

  test("first 8 seeds execute on the gate corpus") {
    (0L until 8L).foreach { seed =>
      val g = PipeFuzz.gen(seed)
      val n = g.fn(spark, sf).count()
      assert(n >= 0, s"seed $seed (${g.family}) failed")
    }
    spark.catalog.clearCache()
  }
}
