package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Literal JDBC sink parity for the KPI table.
  *
  * The reference loads its KPI rows into Postgres over a database
  * connection (`etl/app/shift_data_processor.py:123-144` — one multi-row
  * INSERT per run, a single VALUES list in one transaction, into table
  * `kpis`). The engine's primary sink is the
  * transactional parquet warehouse (atomic commit markers, as-of
  * snapshots — strictly stronger guarantees), but deployments that keep
  * the KPI table in an RDBMS get this 1:1 face: Spark's JDBC writer,
  * appending each partition as one batched-INSERT transaction.
  *
  * Scale/ops notes: the KPI frame is tall-and-tiny (6 rows/run), so it is
  * coalesced to ONE partition — one connection, one transaction holding
  * the whole run's batched INSERT, exactly the reference's commit unit. Fact-sized JDBC writes would instead tune
  * `numPartitions`/`batchsize`/`isolationLevel` (one transaction per
  * partition — idempotent-key or staging-table patterns cover partial
  * failure; that is why bulk data lands in the warehouse, not an RDBMS).
  * Tests run against embedded Derby (the RDBMS shipped with Spark);
  * production points the same code at a Postgres JDBC URL — nothing else
  * changes.
  */
object JdbcKpiSink {

  /** Embedded-Derby URL for local/test runs (`;create=true` bootstraps). */
  def derbyUrl(dir: String): String = s"jdbc:derby:$dir;create=true"

  private def props: Properties = new Properties()

  /** Append one run's KPI rows (tagged with `run_id`) to a JDBC table.
    * Creates the table on first write — with explicit VARCHAR DDL for the
    * string keys: Spark's default string mapping is the dialect's TEXT
    * type (CLOB on Derby), which some engines refuse to compare in WHERE
    * clauses, silently breaking filter pushdown on the read side. Keyed
    * columns in a JDBC table get bounded, comparable, indexable types.
    * Default table name is the reference's (`kpis`); the `run_id` tag is
    * this sink's one extension (the reference relies on insert time). */
  def append(kpis: DataFrame, url: String, runId: String,
      table: String = "kpis"): Unit =
    kpis.withColumn("run_id", lit(runId))
      .coalesce(1)
      .write.mode(SaveMode.Append)
      .option("createTableColumnTypes", "kpi_name VARCHAR(64), run_id VARCHAR(64)")
      .jdbc(url, table, props)

  /** Read the KPI table back. Predicates on the returned frame push down
    * to the database as WHERE clauses (JDBC source supports filter
    * pushdown — pinned in JdbcKpiSinkSpec). */
  def read(spark: SparkSession, url: String,
      table: String = "kpis"): DataFrame =
    spark.read.jdbc(url, table, props)
}
