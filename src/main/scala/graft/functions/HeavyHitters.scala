package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries / SpaceSaving heavy-hitters sketch as a typed Spark
  * [[Aggregator]] — the "novel sketch" slot of the training-pipeline
  * brief, on the Spark-native custom-aggregate surface (`functions
  * .udaf`), the documented path for stateful aggregates the built-ins
  * don't cover (the next tier after a Catalyst `Expression`, which
  * suits scalar functions, not merge-able aggregation state).
  *
  * State is AT MOST `k` counters regardless of input size, and states
  * merge associatively, so Spark runs it map-side-partial like any
  * built-in aggregate: each task summarises its partition in O(k)
  * memory, the shuffle moves only sketches. Guarantees (Misra-Gries
  * 1982): after observing N items, every item with true frequency
  * > N/k is present in the sketch, and each reported count c_est
  * satisfies c_true - maxUndercount ≤ c_est ≤ c_true. Merging keeps
  * both bounds (Agarwal et al. 2013, "Mergeable Summaries").
  *
  * Deterministic given the same merge tree; near-threshold survivors
  * can differ between merge orders, so downstream filters should use
  * `count + maxUndercount > threshold` (guaranteed-complete) rather
  * than exact equality — see TextAnalysisSpec for the checked bound.
  */
case class MGSketch(counters: Map[String, Long], maxUndercount: Long)

/** One reported heavy hitter: `est_count ≤ true ≤ max_count`. */
case class TokenCount(token: String, est_count: Long, max_count: Long)

class MisraGries(k: Int) extends Aggregator[String, MGSketch, Seq[TokenCount]] {

  override def zero: MGSketch = MGSketch(Map.empty, 0L)

  /** Shrink to ≤ k counters by subtracting the smallest counter value
    * from all (the classic MG decrement, batched): every subtracted
    * unit is accounted in maxUndercount. */
  private def shrink(m: Map[String, Long], under: Long): MGSketch =
    if (m.size <= k) MGSketch(m, under)
    else {
      // remove the (size-k) smallest counters in one step: subtract
      // the (size-k)-th smallest value d, drop non-positive
      val d = m.valuesIterator.toArray.sorted.apply(m.size - k - 1)
      val kept = m.collect { case (t, c) if c > d => t -> (c - d) }
      MGSketch(kept, under + d)
    }

  override def reduce(b: MGSketch, token: String): MGSketch = {
    val bumped = b.counters.updated(token, b.counters.getOrElse(token, 0L) + 1L)
    shrink(bumped, b.maxUndercount)
  }

  override def merge(a: MGSketch, b: MGSketch): MGSketch = {
    val summed = b.counters.foldLeft(a.counters) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    shrink(summed, a.maxUndercount + b.maxUndercount)
  }

  /** Both bounds per survivor, deterministically ordered. Filters
    * needing the GUARANTEED-complete frequent set must test
    * `max_count` (upper bound); `est_count` never overcounts. */
  override def finish(r: MGSketch): Seq[TokenCount] =
    r.counters.toSeq
      .map { case (t, c) => TokenCount(t, c, c + r.maxUndercount) }
      .sortBy(tc => (-tc.est_count, tc.token))

  override def bufferEncoder: Encoder[MGSketch] = Encoders.product[MGSketch]
  override def outputEncoder: Encoder[Seq[TokenCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenCount]]()
}
