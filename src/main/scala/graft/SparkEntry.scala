package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family:
  *   - graft.operators.Relational — the delegated relational surface
  *     (SURVEY §2.B) over the TPC-H-ish corpus
  *   - graft.pipeline.* — training-data pipeline ops (dedup, similarity
  *     search, text analysis) over documents/embeddings
  * Each key has a DuckDB oracle in `oracleSql` unless the op is not
  * SQL-expressible (driver then records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1_agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      pipeline.TextAnalysis.queries ++
      pipeline.Dedup.queries ++
      pipeline.Curation.queries ++
      pipeline.Similarity.queries ++
      pipeline.Multimodal.queries ++
      sources.zarr.ZarrQueries.queries ++
      streaming.EventsStreaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      pipeline.TextAnalysis.oracle ++
      pipeline.Dedup.oracle ++
      pipeline.Curation.oracle ++
      pipeline.Similarity.oracle ++
      pipeline.Multimodal.oracle ++
      sources.zarr.ZarrQueries.oracle ++
      streaming.EventsStreaming.oracle
}
