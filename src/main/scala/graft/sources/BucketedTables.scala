package graft.sources

import java.nio.file.{Files, Paths, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.Tables

/** Bucketed mirrors of the fact tables — the co-located-join lever.
  *
  * At 100 TB the single biggest shuffle in the whole workload is the
  * fact-to-fact join (lineitem ⋈ orders): both sides are too big to
  * broadcast, so every query pays a full two-sided hash repartition.
  * The standing fix is to land the data bucketed on the join key:
  * `bucketBy(n, key)` writes each output file hash-assigned by key, the
  * catalog records the layout, and every later equi-join or aggregation
  * on that key satisfies its clustered-distribution requirement straight
  * off the scan — no Exchange on either side, for every query, forever
  * (amortized across the table's lifetime, which is why warehouses
  * bucket their fact tables at ingest).
  *
  * [[bucketed]] materializes the mirror once per (session, corpus):
  * an external parquet table under target/ (same repo-local scratch
  * policy as PartitionedCorpus), registered in the session catalog,
  * memoized by table existence. Bucket count is a deploy knob — it
  * should roughly match target parallelism for the key's volume (8 here
  * for the local runs; a 1000-executor cluster picks hundreds to a few
  * thousand and both sides must agree for exchange-free joins).
  */
object BucketedTables {

  private def suffix(sfDir: String): String =
    graft.core.Scratch.corpusHash(sfDir)

  private def mirrorPath(sfDir: String, name: String): Path =
    graft.core.Scratch.dir("bucketed-mirror", sfDir).resolve(name)

  /** Read table `name` bucketed on `key` (building the mirror if this
    * session hasn't yet). Thread-safe; idempotent per (session, corpus,
    * key, buckets) — the layout parameters are part of the mirror
    * identity, or a later caller asking for a different bucketing would
    * silently get the first one's layout (and a plan that shuffles
    * after all, or worse, wrong bucket pruning assumptions; pinned in
    * BucketedJoinSpec).
    *
    * Scope assumptions (the local analogs of "bucketing is an ingest
    * decision"): ONE JVM owns the scratch mirror directory — the
    * `synchronized` build is per-process, so two concurrent JVMs
    * pointed at the same target/ could race the same Overwrite (sbt
    * test forks get their own working dirs; a shared deployment would
    * bucket at ingest, not on first query). And the corpus under
    * `sfDir` is IMMUTABLE for the session — a corpus rewritten in
    * place needs its mirrors rebuilt (drop the catalog table or use a
    * fresh session), exactly like Staging's invalidation contract. */
  def bucketed(spark: SparkSession, sfDir: String, name: String, key: String,
      buckets: Int = 8): DataFrame = {
    val layout = s"${name}_${key}_$buckets"
    val tbl = s"${layout}_b_${suffix(sfDir)}"
    this.synchronized {
      if (!spark.catalog.tableExists(tbl)) {
        // stage → move → marker through the shared publish protocol
        // (graft.core.CommitProtocol): the bucketed data lands at a
        // staging path under a STAGING catalog name (saveAsTable is
        // what records the bucket spec, so the write must go through
        // it), and the marker step is the catalog flip — point the
        // staged table at the published path, then rename it to the
        // final name readers key on. A crash mid-publish leaves only
        // the staging table/dir, which the next build clears.
        val dest = mirrorPath(sfDir, layout)
        val staging = dest.resolveSibling(dest.getFileName.toString + ".staging")
        val stagingTbl = s"${tbl}_staging"
        spark.sql(s"DROP TABLE IF EXISTS `$stagingTbl`")
        graft.core.CommitProtocol.deleteRecursively(staging)
        try {
          Tables.read(spark, sfDir, name)
            .write.mode(SaveMode.Overwrite).format("parquet")
            .bucketBy(buckets, key).sortBy(key)
            .option("path", staging.toString)
            .saveAsTable(stagingTbl)
          graft.core.CommitProtocol.publish(staging, Seq(staging -> dest)) {
            spark.sql(s"ALTER TABLE `$stagingTbl` SET LOCATION '${dest.toString}'")
            spark.sql(s"ALTER TABLE `$stagingTbl` RENAME TO `$tbl`")
            ()
          }
        } catch {
          // the staging catalog entry is residue either way; data
          // rollback already happened inside the protocol
          case e: Throwable =>
            spark.sql(s"DROP TABLE IF EXISTS `$stagingTbl`")
            throw e
        }
      }
    }
    spark.table(tbl)
  }
}
