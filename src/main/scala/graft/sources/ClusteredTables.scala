package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.Tables

/** Sort-clustered mirrors of the fact tables — the DATA-SKIPPING lever,
  * complementing [[BucketedTables]]' shuffle-elimination lever.
  *
  * Parquet stores min/max statistics per row group (and per page); the
  * reader skips any row group whose [min, max] cannot satisfy a pushed
  * predicate. Those statistics are only selective if the data is laid
  * out so each row group covers a NARROW key range — on an unsorted
  * table every row group spans the whole key domain and the stats prune
  * nothing. `repartitionByRange(key) + sortWithinPartitions(key)` at
  * write time gives every file a disjoint key range and every row group
  * within it a monotone sub-range, so a point or range predicate on the
  * cluster key touches O(selectivity) of the data instead of all of it.
  * This is the single biggest scan-cost lever a 100 TB immutable fact
  * table has: it needs no index structure, no table format, and pays
  * one range-shuffle at ingest, amortized over every later query.
  * (Multi-key layouts interleave bits — Z-order/Hilbert — to spread
  * selectivity across keys; the single-key range-cluster here is the
  * degenerate and most common case. ClusteredTablesSpec reads the
  * parquet footers and proves the pruning arithmetic; at cluster scale
  * a table format would ALSO prune whole files from the same stats at
  * PLAN time, before any task launches.)
  *
  * Mirror lifecycle matches BucketedTables: built once per (corpus,
  * layout) under target/ scratch, memoized by a _SUCCESS-marked
  * directory; single-JVM, immutable-corpus assumptions apply.
  */
object ClusteredTables {

  private def suffix(sfDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  private def mirrorPath(sfDir: String, layout: String): Path = {
    val target = Paths.get("target")
    val base =
      if (Files.isDirectory(target)) target
      else Paths.get(sys.props("java.io.tmpdir"), "graft-scratch")
    base.resolve("clustered-mirror").resolve(suffix(sfDir)).resolve(layout)
      .toAbsolutePath
  }

  /** Read table `name` range-clustered on `keys` (building the mirror on
    * first use). `partitions` sizes the range split — the local analog
    * of targeting ~1 GB files per key range at scale. */
  def clustered(spark: SparkSession, sfDir: String, name: String,
      keys: Seq[String], partitions: Int = 8): DataFrame = {
    val layout = s"${name}_${keys.mkString("_")}_$partitions"
    val path = mirrorPath(sfDir, layout)
    this.synchronized {
      if (!Files.exists(path.resolve("_SUCCESS"))) {
        Tables.read(spark, sfDir, name)
          .repartitionByRange(partitions, keys.map(col): _*)
          .sortWithinPartitions(keys.map(col): _*)
          .write.mode(SaveMode.Overwrite).parquet(path.toString)
      }
    }
    spark.read.schema(graft.core.Tables.read(spark, sfDir, name).schema)
      .parquet(path.toString)
  }
}
