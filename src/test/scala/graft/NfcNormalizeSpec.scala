package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize
import graft.pipeline.TextAnalysis

/** Unit checks for the codegen'd NFC expression + the t10 op. */
class NfcNormalizeSpec extends AnyFunSuite {
  import TestSession._

  private val decomposed = "café" // e + combining acute
  private val precomposed = "café" // é

  test("decomposed input collapses to precomposed; NFC input passes through") {
    import spark.implicits._
    val rows = Seq(decomposed, precomposed, "plain ascii", "")
      .toDF("s").select(NfcNormalize(col("s")).as("n")).collect().map(_.getString(0))
    assert(rows(0) == precomposed)
    assert(rows(1) == precomposed)
    assert(rows(2) == "plain ascii")
    assert(rows(3) == "")
  }

  test("null propagates; SQL name resolves via extensions") {
    import spark.implicits._
    val viaSql = spark.sql(s"SELECT nfc_normalize('$decomposed')").collect()(0).getString(0)
    assert(viaSql == precomposed)
    val n = Seq[Option[String]](None).toDF("s")
      .select(NfcNormalize(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = NfcNormalize(Literal(decomposed))
    val interp = e.eval(null).toString
    assert(interp == precomposed)
  }

  test("t10 rows: even ids normalized (length shrinks), odd ids untouched") {
    val rows = TextAnalysis.t10_text_normalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val even = r.getAs[Long]("doc_id") % 2 == 0
      assert(r.getAs[Boolean]("changed") == even)
      val diff = r.getAs[Long]("n_raw") - r.getAs[Long]("n_nfc")
      assert(diff == (if (even) 1L else 0L))
    }
  }
}
