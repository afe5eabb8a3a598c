package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations — the
  * manual salting patterns for when AQE's skew-join splitting isn't
  * available (e.g., a broadcast side too big to broadcast but with a
  * few dominant keys on the probe side).
  *
  * Semantics contract: results are identical to the unsalted
  * equivalents (SkewSpec asserts equality); only the shuffle layout
  * changes — each hot key spreads over `saltFactor` reducers.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side: big rows
    * get a deterministic salt in [0, saltFactor), the small side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — so one hot key occupies `saltFactor` tasks instead
    * of one. */
  /** Salt derived from ROW CONTENT, never from
    * monotonically_increasing_id: the id depends on partition layout
    * and row order, so a task re-executed after a fetch failure (or a
    * speculative duplicate) would re-salt rows other reducers already
    * consumed — the SPARK-23207 class of silent corruption. A content
    * hash re-salts identically on every attempt. Identical rows
    * share a salt, which only matters if one (key, row) pair
    * dominates — the hot-KEY case this mitigates spreads fine. */
  private def contentSalt(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor))

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt", contentSalt(big, saltFactor))
    val replicated = small.withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with salted keys: phase 1
    * aggregates on (key, salt) spreading hot keys, phase 2 merges the
    * partials. `agg` must be decomposable (sum/count/min/max). */
  def saltedSum(df: DataFrame, key: String, valueCol: Column, alias: String,
      saltFactor: Int): DataFrame =
    df.withColumn("__salt", contentSalt(df, saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(alias))
}
