package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import scala.jdk.CollectionConverters._
import scala.util.Using

/** Incremental aggregate maintenance — the materialized-view pattern a
  * 100 TB pipeline uses so dashboards/KPIs never rescan history: per
  * ingested batch, compute the batch's PARTIAL aggregates (one pass over
  * the new data only) and MERGE them into the stored state. All state
  * columns are mergeable partials — count and decimal sum add, min/max
  * combine, averages derive as sum/count at read time — so the merge
  * costs O(|state| + |batch keys|) regardless of how much history the
  * state summarizes. This is the same partial/final split Spark's own
  * hash aggregate does across tasks, lifted across BATCHES.
  *
  * Sums are exact DECIMAL: merging must be order-independent (batch
  * arrival order is an accident), and float sums are not.
  *
  * Storage follows the warehouse's crash-safe idiom
  * (ShiftWarehouse.appendTables): each merge writes a fresh versioned
  * state dir via staging + atomic move, then drops a commit marker
  * LAST. Readers resolve the highest marker whose directory exists, so
  * a crash mid-publish leaves the previous version visible and the
  * half-written one invisible. Old versions stay readable (as-of reads
  * for reproducibility) until [[prune]]. Single writer, like the
  * reference's one ETL process.
  */
final class IncrementalAgg(
    spark: SparkSession, root: String,
    keyCols: Seq[String], valueCol: String) {

  private def rootPath: Path = Paths.get(root)
  private def commitsDir: Path = rootPath.resolve("_commits")
  private def versionDir(v: Long): Path = rootPath.resolve(f"v=$v%08d")

  private def committedVersions: Seq[Long] = {
    if (!Files.isDirectory(commitsDir)) return Seq.empty
    Using.resource(Files.list(commitsDir)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .flatMap(n => n.toLongOption)
        .filter(v => Files.isDirectory(versionDir(v)))
        .toSeq
    }
  }

  def currentVersion: Option[Long] = committedVersions.maxOption

  /** Batch partials: every column is mergeable. */
  private def partial(batch: DataFrame): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(DecimalType(38, 6))).as("vsum"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  private def merge(state: DataFrame, part: DataFrame): DataFrame =
    state.unionByName(part)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("vsum")).as("vsum"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))

  /** Stored state at a committed version (parquet is self-describing —
    * this reads our own written schema, not an inference over foreign
    * data). */
  def stateAt(v: Long): DataFrame = {
    require(committedVersions.contains(v), s"version $v is not committed")
    spark.read.parquet(versionDir(v).toString)
  }

  def state: DataFrame = stateAt(currentVersion.getOrElse(
    throw new IllegalStateException("no committed state — ingest first")))

  /** Read-time summary with the derived average; sums surface as DOUBLE
    * (decimal stays internal, per the repo's output rule). */
  def summary: DataFrame =
    state.select(
      keyCols.map(col) ++ Seq(
        col("cnt"),
        col("vsum").cast("double").as("vsum"),
        col("vmin"), col("vmax"),
        (col("vsum") / col("cnt")).cast("double").as("vavg")): _*)

  /** Merge one batch into the state and commit a new version. */
  def ingest(batch: DataFrame): Long = {
    val next = currentVersion.getOrElse(0L) + 1
    val merged = currentVersion match {
      case Some(v) => merge(stateAt(v), partial(batch))
      case None => partial(batch)
    }
    val staging = rootPath.resolve("_staging").resolve(f"v=$next%08d")
    try {
      merged.write.mode("overwrite").parquet(staging.toString)
      Files.createDirectories(rootPath)
      // a crash between a previous move and its marker leaves an
      // UNCOMMITTED dir at the target version — invisible to readers,
      // safe to reclaim (committed versions are never the target: next
      // is past the max marker)
      graft.etl.ShiftWarehouse.deleteRecursively(versionDir(next))
      Files.move(staging, versionDir(next), StandardCopyOption.ATOMIC_MOVE)
      Files.createDirectories(commitsDir)
      Files.createFile(commitsDir.resolve(f"$next%08d"))
      next
    } catch {
      case e: Throwable =>
        graft.etl.ShiftWarehouse.deleteRecursively(staging)
        graft.etl.ShiftWarehouse.deleteRecursively(versionDir(next))
        throw e
    } finally {
      graft.etl.ShiftWarehouse.deleteRecursively(rootPath.resolve("_staging"))
    }
  }

  /** Drop all committed versions older than the newest `keep` (marker
    * first so readers never resolve a dropped dir). */
  def prune(keep: Int = 1): Unit = {
    require(keep >= 1, "must keep at least the current version")
    committedVersions.sorted.dropRight(keep).foreach { v =>
      Files.deleteIfExists(commitsDir.resolve(f"$v%08d"))
      graft.etl.ShiftWarehouse.deleteRecursively(versionDir(v))
    }
  }
}
