package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Relational, Normalize, Events, TextOps, Dedup, Similarity, Scale, MultimodalMeta, Analytics, TemporalJoins, Curation, Mixing, Retrieval, Corpus, Passages, IndexOps}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Normalize.queries ++ Events.queries ++
      TextOps.queries ++ Dedup.queries ++ Similarity.queries ++ Scale.queries ++
      MultimodalMeta.queries ++ Analytics.queries ++ TemporalJoins.queries ++
      Curation.queries ++ Mixing.queries ++ Retrieval.queries ++ Corpus.queries ++
      Passages.queries ++ IndexOps.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Normalize.oracleSql ++ Events.oracleSql ++
      TextOps.oracleSql ++ Dedup.oracleSql ++ Similarity.oracleSql ++ Scale.oracleSql ++
      MultimodalMeta.oracleSql ++ Analytics.oracleSql ++ TemporalJoins.oracleSql ++
      Curation.oracleSql ++ Mixing.oracleSql ++ Retrieval.oracleSql ++ Corpus.oracleSql ++
      Passages.oracleSql ++ IndexOps.oracleSql
}
