package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means (Lloyd 1982; spherical update per
  * Dhillon & Modha 2001) over an embedding column — the index-build
  * step a production IVF ANN deployment runs before
  * graft.queries.Similarity.qAnnIvf (which uses a deterministic centroid
  * subset so its DuckDB oracle stays bit-identical; see the note at
  * Similarity.scala's qAnnIvf).
  *
  * Shape per iteration (all DataFrame ops, no RDDs):
  *   1. assignment: corpus × broadcast(centroids) cosine argmax — the
  *      only nested loop, bounded by k ≪ n;
  *   2. update: posexplode the vectors, per-(cluster, dim) mean — two
  *      narrow shuffles keyed by (cluster, dim) then cluster;
  *   3. the k×dim centroid table is collected to the driver and
  *      re-broadcast — model state, not data (k·dim doubles).
  *
  * Deterministic: init is the first k vectors by id, argmax ties break
  * by centroid id, and the per-dimension mean is a single avg aggregate —
  * repeated runs produce identical centroids (asserted in KMeansSpec).
  */
object KMeans {

  /** Normalize an embedding table to the (vid, v: array<double>) shape
    * the other entry points take. */
  def prep(emb: DataFrame, vecCol: String, idCol: String): DataFrame =
    emb.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))

  /** One (cluster_id, cv: array<double>) row per cluster. */
  def fit(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    var centroids: DataFrame = corpus.orderBy($"vid").limit(k)
      .select((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"vid")) - 1).as("cluster_id"),
        $"v".as("cv"))

    var i = 0
    while (i < iters) {
      val next = assign(corpus, centroids)
        .select($"cluster_id", posexplode($"v").as(Seq("dim", "x")))
        .groupBy($"cluster_id", $"dim")
        .agg(avg($"x").as("m"))
        .groupBy($"cluster_id")
        .agg(array_sort(collect_list(struct($"dim", $"m"))).as("dm"))
        // spherical k-means: normalize the mean to unit length — with
        // cosine assignment this is the update that provably descends the
        // objective (plain Euclidean means need not). HOFs are interpreted
        // but run over k·dim values, not data.
        .select($"cluster_id",
          expr("""transform(dm, s -> s.m /
                 |  greatest(sqrt(aggregate(dm, 0.0d, (a, t) -> a + t.m * t.m)),
                 |           1e-300d))""".stripMargin)
            .as("cv"))
      // materialize the tiny model table; the next iteration broadcasts it
      val rows: java.util.List[Row] = java.util.Arrays.asList(next.collect(): _*)
      centroids = spark.createDataFrame(rows, next.schema)
      i += 1
    }
    centroids
  }

  /** Nearest-centroid assignment: (vid, v, cluster_id). */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vid").orderBy($"ccos".desc, $"cluster_id")
    corpus.join(broadcast(centroids))
      .withColumn("ccos", graft.functions.functions.cosine_sim($"v", $"cv"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"vid", $"v", $"cluster_id")
  }

  /** Within-cluster sum of (1 − cosine) — the objective Lloyd's descends. */
  def wcss(corpus: DataFrame, centroids: DataFrame): Double = {
    val spark = corpus.sparkSession
    import spark.implicits._
    assign(corpus, centroids)
      .join(broadcast(centroids), Seq("cluster_id"))
      .select(sum(lit(1.0) - graft.functions.functions.cosine_sim($"v", $"cv")))
      .head().getDouble(0)
  }
}
