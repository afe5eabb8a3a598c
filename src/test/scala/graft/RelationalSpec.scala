package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Smoke + shape checks for the relational surface (exact value
  * equality vs DuckDB is the driver's gate; tools/compare.py replicates
  * it at dev time). */
class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty on sf0.001 and has an oracle") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("q1 aggregates are exact decimals cast to double") {
    val row = operators.Relational.q1_agg(spark, sf)
      .filter("l_returnflag = 'A' AND l_linestatus = 'F'")
    assert(row.count() == 1)
  }

  test("q11 topk is deterministic across runs") {
    val a = operators.Relational.q11_topk(spark, sf).collect().map(_.toSeq)
    val b = operators.Relational.q11_topk(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("q25 approx distinct within 5% of exact") {
    operators.Relational.q25_raw(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.06, s"approx=$approx exact=$exact")
    }
  }

  test("q25 gate restatement: every group within_bound") {
    val rows = operators.Relational.q25_approx_distinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_bound"), r.toString))
  }

  test("q34 approx quantiles within the GK rank-error bound of exact") {
    operators.Relational.q34_raw(spark, sf).collect().foreach { r =>
      for (p <- Seq("25", "50", "75")) {
        val ap = r.getAs[Long](s"ap$p").toDouble
        val ep = r.getAs[Double](s"ep$p")
        // accuracy 10000 ⇒ rank error ≤ n/10000; quantities are dense
        // integers 1..50, so that is at most one value step
        assert(math.abs(ap - ep) <= 1.0 + 1e-9, s"p$p approx=$ap exact=$ep")
      }
    }
  }

  test("q34 gate restatement: every group within_bound") {
    val rows = operators.Relational.q34_approx_quantile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_bound"), r.toString))
  }

  test("q35 raw arrays: head3 is the upper-cased 3-token prefix") {
    val rows = operators.Relational.q35_arrays(spark, sf).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val head3 = r.getSeq[String](r.fieldIndex("head3"))
      val n = r.getAs[Long]("n_toks")
      assert(head3.length == math.min(n, 3L), s"head3 len ${head3.length} vs n_toks $n")
      assert(head3.forall(t => t == t.toUpperCase), s"not upper-cased: $head3")
    }
  }

  test("q35 serialized head3 round-trips the array form") {
    val ser = operators.Relational.q35_higher_order(spark, sf)
      .orderBy("doc_id").limit(20).collect()
    val raw = operators.Relational.q35_arrays(spark, sf)
      .orderBy("doc_id").limit(20).collect()
    ser.zip(raw).foreach { case (s0, r0) =>
      assert(s0.getAs[String]("head3") ==
        r0.getSeq[String](r0.fieldIndex("head3")).mkString("|"))
    }
  }

  test("q36 raw arrays: ids sorted ascending, bounds match lo/hi/n") {
    operators.Relational.q36_arrays(spark, sf).collect().foreach { r =>
      val ids = r.getSeq[Long](r.fieldIndex("ids"))
      assert(ids == ids.sorted, "ids not sorted")
      assert(ids.head == r.getAs[Long]("lo") && ids.last == r.getAs[Long]("hi"))
      assert(ids.length.toLong == r.getAs[Long]("n"))
    }
  }

  test("q17 set ops return distinct custkeys") {
    val rows = operators.Relational.q17_intersect_except(spark, sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
