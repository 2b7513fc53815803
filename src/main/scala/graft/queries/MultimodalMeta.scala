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

  // --------------------------------------------------------------------
  // Frame sampling: one binary payload → N frame rows. The Spark side
  // does REAL binary slicing (Column.substr over the payload — the
  // codegen'd shape a video frame sampler produces: 1-to-many generate,
  // binary out, no driver involvement); the oracle reproduces the frame
  // *metadata* from byte-length arithmetic. 256-byte "frames", head-
  // sampled to at most 4 per asset (a real sampler would stride or pick
  // keyframes — same plan shape), 40 ms apart.
  def qFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payload = $"text".cast("binary")
    Tables.documents(spark, sfDir)
      .select($"doc_id".as("asset_id"), payload.as("payload"),
        length(payload).cast("long").as("nb"))
      // `div`, not `/`: Spark's `/` on longs returns DOUBLE, which breaks
      // sequence()'s integral-type requirement (and would round, not floor)
      .select($"asset_id", $"payload",
        least(lit(4L), greatest(lit(1L), expr("(nb + 255) div 256"))).as("nf"))
      .select($"asset_id",
        posexplode(transform(sequence(lit(0L), $"nf" - 1),
          i => $"payload".substr((i * 256 + 1).cast("int"), lit(256)))))
      .select($"asset_id",
        $"pos".cast("int").as("frame_idx"),
        ($"pos" * 40).cast("int").as("frame_ms"),
        length($"col").cast("long").as("frame_bytes"))
  }

  val qFrameSampleSql: String =
    """WITH f AS (
      |  SELECT doc_id AS asset_id, strlen(text) AS nb,
      |         least(4, greatest(1, (strlen(text) + 255) // 256)) AS nf
      |  FROM documents)
      |SELECT asset_id,
      |       CAST(i AS INTEGER) AS frame_idx,
      |       CAST(i * 40 AS INTEGER) AS frame_ms,
      |       CAST(least(256, nb - i * 256) AS BIGINT) AS frame_bytes
      |FROM f, unnest(range(nf)) AS t(i)""".stripMargin

  // --------------------------------------------------------------------
  // Feature-extract → nearest assets: the modality-agnostic similarity
  // pipeline (decode → fixed-dim feature vector → distance → top-k),
  // with an engine-portable "feature extractor" standing in for the
  // codec: 8 per-byte frequencies computed by length/replace arithmetic
  // (a real deployment swaps ONLY the extractor stage for the batched
  // decoder in graft.multimodal — the plan downstream is identical).
  // Probe = asset 0's vector (1 row, broadcast); distance = squared L2
  // written LONGHAND so both engines evaluate the identical
  // left-to-right float expression; output is rank-only (ids, no
  // floats), the fp-stable convention of the ANN family.
  private val FeatureChars = Seq("a", "e", "r", "s", "t", "n", "o", "l")

  def qAssetSim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def freqCols(prefix: String) = FeatureChars.zipWithIndex.map { case (ch, i) =>
      ((length($"text") - length(replace($"text", lit(ch), lit(""))))
        .cast("double") / length($"text")).as(s"$prefix$i")
    }
    val feats = Tables.documents(spark, sfDir)
      .select($"doc_id" +: freqCols("f"): _*)
    val probe = feats.filter($"doc_id" === 0)
      .select((0 until FeatureChars.size).map(i => col(s"f$i").as(s"p$i")): _*)
    val dist = (0 until FeatureChars.size)
      .map(i => (col(s"f$i") - col(s"p$i")) * (col(s"f$i") - col(s"p$i")))
      .reduceLeft(_ + _)
    feats.filter($"doc_id" =!= 0)
      .join(broadcast(probe))
      .select($"doc_id".as("asset_id"), dist.as("d"))
      .orderBy($"d", $"asset_id")
      .limit(5)
      .select($"asset_id")
  }

  val qAssetSimSql: String = {
    val f = FeatureChars.zipWithIndex.map { case (ch, i) =>
      s"CAST(length(text) - length(replace(text, '$ch', '')) AS DOUBLE) / length(text) AS f$i"
    }.mkString(",\n      |         ")
    s"""WITH feats AS (
       |  SELECT doc_id,
       |         $f
       |  FROM documents),
       |probe AS (SELECT ${(0 until FeatureChars.size).map(i => s"f$i AS p$i").mkString(", ")}
       |          FROM feats WHERE doc_id = 0)
       |SELECT doc_id AS asset_id
       |FROM feats CROSS JOIN probe
       |WHERE doc_id <> 0
       |ORDER BY ${(0 until FeatureChars.size).map(i => s"(f$i - p$i) * (f$i - p$i)").mkString(" + ")}, asset_id
       |LIMIT 5""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asset_meta" -> (qAssetMeta _),
    "q_frame_sample" -> (qFrameSample _),
    "q_asset_sim" -> (qAssetSim _))

  val oracleSql: Map[String, String] = Map(
    "q_asset_meta" -> qAssetMetaSql,
    "q_frame_sample" -> qFrameSampleSql,
    "q_asset_sim" -> qAssetSimSql)
}
