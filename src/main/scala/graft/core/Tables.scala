package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit schemas + readers for the driver-provided testdata star schema
  * (TESTDATA.md). Schemas are declared, never inferred: at 100 TB a schema
  * inference pass is a full extra scan, and silent type drift between files
  * becomes a correctness bug. Declaring `ReadSchema` also guarantees column
  * pruning reaches the parquet scan.
  */
object Tables {

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  /** events.parquet has shipped `ts` as parquet TIMESTAMP(NANOS) in some
    * testdata generations and TIMESTAMP(MICROS) in others; Spark's
    * micros-precision TimestampType cannot read the NANOS form directly,
    * so `ts` is always read as a raw int64 (legacy.parquet.nanosAsLong)
    * and unit-normalized in [[events]]. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "lineitem" -> lineitemSchema,
    "orders" -> ordersSchema,
    "customer" -> customerSchema,
    "supplier" -> supplierSchema,
    "part" -> partSchema,
    "nation" -> nationSchema,
    "region" -> regionSchema,
    "events" -> eventsSchema,
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  /** Read one testdata table with its declared schema. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "region")
  /** int64 `ts` values at or above this are nanoseconds, below it micros
    * (2^56 ≈ 1973-04 in ns, ≈ 4254 in us — see the comment in [[events]]). */
  private val NanosMagnitude = 1L << 56

  /** Per-(session, corpus) memo of the events ts unit: true = nanos.
    * review r9 (advisor): the unit used to be decided per ROW by
    * magnitude, which silently misreads nano-encoded timestamps before
    * ~April 1973 (below 2^56 in ns) as micros. The unit is a property of
    * the FILE's encoding, not of a row — decide it once from the
    * column's max (a column-pruned one-number agg, memoized for the
    * session like the Staging frames), and assert the file is not
    * mixed-magnitude when nanos is chosen. */
  private val tsUnitNanos =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Boolean]()

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Session-level by necessity: nanosAsLong is a SQL conf consulted at
    // scan time, not a per-read option. Side-effect scope is narrow — it
    // only changes TIMESTAMP(NANOS) columns, which Spark otherwise fails
    // to read at all, and this repo's readers always declare schemas (no
    // inference), so no other read observes a type change.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The raw int64 may hold NANOS (older testdata generations, and the
    // ns→us floor matches DuckDB's own truncation), MICROS (current
    // generation — DuckDB reads them verbatim), or either unit in a
    // plain-INT64 scaled copy (ScaleUp rewrites the column annotation
    // away). 2^56/1e9 s ≈ year 1973 in nanos vs year ~4254 in micros,
    // so the file-level max cleanly names the unit for any post-1973
    // dataset; the min-side assert catches the one ambiguous shape
    // (nanos data straddling 1973) instead of silently splitting it.
    val raw = read(spark, sfDir, "events")
    val isNanos = tsUnitNanos.computeIfAbsent(
      (System.identityHashCode(spark), sfDir), { _ =>
        val Array(mn, mx) = raw.agg(min(col("ts")), max(col("ts")))
          .collect()(0).toSeq.map {
            case null => 0L
            case v => v.asInstanceOf[Long]
          }.toArray
        val nanos = mx >= NanosMagnitude
        require(!nanos || mn >= NanosMagnitude,
          s"events.ts mixes magnitudes (min=$mn, max=$mx): nano-encoded " +
            "rows before 1973 cannot be told from micros — fix the data")
        nanos
      })
    raw.withColumn("ts", timestamp_micros(
        if (isNanos) expr("ts div 1000") else col("ts")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")
}
