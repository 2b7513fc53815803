package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Driver-visible slice of the multimodal surface (graft.multimodal):
  * binary-payload metadata extraction expressed with engine-portable
  * operations (byte length + md5-derived fake dimensions), so the DuckDB
  * oracle verifies the plumbing — payload bytes in, typed metadata out —
  * without needing a codec on either side. The batched mapPartitions
  * decode path (which a SQL oracle cannot express) is unit-tested in
  * MultimodalSpec instead.
  */
object MultimodalMeta {

  def qAssetMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payload = $"text".cast("binary")
    val hv = conv(substring(md5(payload), 1, 8), 16, 10).cast("long")
    Tables.documents(spark, sfDir).select(
      $"doc_id".as("asset_id"),
      length(payload).cast("long").as("n_bytes"),
      (lit(64) + pmod(hv, lit(897L))).cast("int").as("width"),
      (lit(64) + pmod(conv(substring(md5(payload), 9, 8), 16, 10).cast("long"), lit(457L)))
        .cast("int").as("height"))
  }

  val qAssetMetaSql: String =
    """SELECT doc_id AS asset_id,
      |       CAST(strlen(text) AS BIGINT) AS n_bytes,
      |       CAST(64 + (('0x' || substr(md5(text), 1, 8))::BIGINT % 897) AS INTEGER) AS width,
      |       CAST(64 + (('0x' || substr(md5(text), 9, 8))::BIGINT % 457) AS INTEGER) AS height
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asset_meta" -> (qAssetMeta _))

  val oracleSql: Map[String, String] = Map(
    "q_asset_meta" -> qAssetMetaSql)
}
