package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** End-to-end corpus curation — the composite query a pretraining data
  * pipeline actually runs, assembled from the already-verified operator
  * building blocks:
  *
  *   1. exact dedup: keep only the min-doc_id copy of each distinct text
  *      (semi join against the fingerprint keeper set, Dedup.qDedupExact);
  *   2. near-dup removal: drop the higher-id member of every verified
  *      minhash-LSH pair (anti join, Dedup.nearDupPairs);
  *   3. quality filter: drop documents scoring below the review threshold
  *      (TextOps.qQualityScore);
  *   4. annotate the survivors with predicted language (TextOps.qLangId)
  *      and token count.
  *
  * Scale shape: two broadcast-able semi/anti joins against small derived
  * sets (keepers ≈ corpus keys, near-dup victims ≪ corpus) plus row-local
  * scoring — no new shuffle beyond what the building blocks already do.
  * The oracle SQL reuses the same verified subquery texts, so this also
  * pins that the composition semantics (join keys, filter thresholds)
  * agree between engines end to end.
  */
object Curation {

  def qCurate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val keepers = Dedup.qDedupExact(spark, sfDir)
      .select($"keeper_id")
    val nearVictims = Dedup.nearDupPairs(spark, sfDir)
      .select($"doc_b")
    val quality = TextOps.qQualityScore(spark, sfDir)
      .filter($"label" =!= "drop")
      .select($"doc_id", $"quality")
    val lang = TextOps.qLangId(spark, sfDir)
      .select($"doc_id", $"pred_lang")
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        (length($"text") - length(translate($"text", " ", "")) + 1)
          .cast("long").as("n_tokens"))
      .join(keepers, $"doc_id" === $"keeper_id", "left_semi")
      .join(nearVictims, $"doc_id" === $"doc_b", "left_anti")
      .join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .select($"doc_id", $"n_tokens", $"quality", $"pred_lang")
  }

  val qCurateSql: String =
    s"""WITH keepers AS (SELECT keeper_id FROM (${Dedup.qDedupExactSql})),
       |near_victims AS (SELECT doc_b FROM (${Dedup.qDedupNearSql})),
       |qual AS (SELECT doc_id, quality FROM (${TextOps.qQualityScoreSql})
       |         WHERE label <> 'drop'),
       |lang_pred AS (SELECT doc_id, pred_lang FROM (${TextOps.qLangIdSql}))
       |SELECT d.doc_id,
       |       CAST(length(d.text) - length(replace(d.text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
       |       qual.quality, lang_pred.pred_lang
       |FROM documents d
       |JOIN qual ON qual.doc_id = d.doc_id
       |JOIN lang_pred ON lang_pred.doc_id = d.doc_id
       |WHERE d.doc_id IN (SELECT keeper_id FROM keepers)
       |  AND d.doc_id NOT IN (SELECT doc_b FROM near_victims)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curate" -> (qCurate _))

  val oracleSql: Map[String, String] = Map(
    "q_curate" -> qCurateSql)
}
