package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV bulk-ingest edge — the reference README suggests "CSV files and
  * COPY ... for very large datasets" but never implements it
  * (/root/reference/README.md:129). This is the Spark analog: a
  * schema'd, parallel CSV scan (one task per split — the distributed
  * COPY) with malformed-record QUARANTINE instead of a load abort,
  * feeding the same transactional warehouse commit path as the JSON
  * source. CSV stays at the ingest edge only: the warehouse remains
  * parquet (typed, columnar, prunable — everything CSV is not).
  *
  * Quarantine semantics (the part Postgres COPY lacks): PERMISSIVE
  * parsing routes each unparsable line into a raw-text column instead
  * of failing the batch; callers commit the valid rows and persist the
  * quarantine for inspection. A malformed row costs one row, never the
  * load. (FAILFAST — COPY's behavior — is one option away when
  * all-or-nothing ingest is wanted; the warehouse's staged commit
  * already gives batch atomicity either way.)
  */
object CsvBulk {

  /** Pinned so write and read agree and ingest is re-runnable across
    * engine/locale defaults. */
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ssXXX"
  private val CorruptCol = "_corrupt_record"

  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(dir)

  /** Read a CSV directory against a DECLARED schema (never inferred —
    * inference is an extra full scan and silently drifts types) and
    * hand (valid rows, quarantined rows) to `use`. Loan pattern by
    * necessity: Spark disallows plans whose only referenced scan column
    * is the internal corrupt-record one, so the parse is materialized
    * ONCE (cache) and both splits derive from it — the cache is
    * released when `use` returns, so callers must consume (commit /
    * write out) inside the scope, which is what an ingest step does
    * anyway. One IO pass over the arriving batch, never the corpus. */
  def read[T](spark: SparkSession, dir: String, schema: StructType)(
      use: (DataFrame, DataFrame) => T): T = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType))
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("timestampFormat", TsFormat)
      .schema(withCorrupt)
      .csv(dir)
      .cache()
    try {
      val valid = raw.filter(col(CorruptCol).isNull)
        .select(schema.fieldNames.map(col).toSeq: _*)
      // quarantine keeps the typed columns alongside the raw line — the
      // partial parse shows WHICH field broke
      val quarantine = raw.filter(col(CorruptCol).isNotNull)
      use(valid, quarantine)
    } finally raw.unpersist()
  }
}
