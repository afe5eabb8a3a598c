package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's `private[sql]` InternalRow-RDD DataFrame plumbing,
  * in the sql package namespace for access (same technique as
  * [[ColumnBridge]]). Used by the Zarr streaming sink to re-wrap a V1
  * sink's micro-batch as a batch DataFrame WITHOUT collecting it to the
  * driver — the pattern Spark's own ForeachBatchSink uses
  * (LogicalRDD over `queryExecution.toRdd`).
  */
object DataFrameBridge {

  /** The physical InternalRow RDD of this dataset's already-planned
    * execution. No re-plan happens: for a streaming micro-batch this is
    * the IncrementalExecution's plan, so stateful operators keep their
    * per-batch state-store wiring (a fresh `df.rdd`/`df.persist` would
    * re-plan the logical tree outside the incremental planner). */
  def internalRows(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd

  /** A plain batch DataFrame over executor-resident InternalRows. */
  def fromInternalRows(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
