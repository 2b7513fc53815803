package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, max, min}

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
    * of targeting ~1 GB files per key range at scale.
    *
    * `bloomKeys` additionally writes a parquet BLOOM FILTER per listed
    * column — the skipping lever for point lookups on columns the sort
    * order does NOT cover: min/max stats on an unsorted column span the
    * whole domain and prune nothing, while the bloom answers "key
    * definitely absent from this row group" at ~1% false-positive cost
    * (the reader consults it for = predicates automatically). Sort
    * covers the range queries on the cluster key; blooms cover point
    * probes on everything else — together they are the poor-man's
    * secondary index an immutable 100 TB fact table actually gets.
    *
    * Dictionary encoding is turned OFF for bloom columns: parquet-mr
    * drops the bloom when a chunk stays fully dictionary-encoded (the
    * dictionary is already an exact membership filter), which is every
    * chunk at test scale. At 100 TB cardinality the dictionary caps out
    * chunk-by-chunk and the bloom takes over; forcing plain encoding
    * locally exercises the same path the big corpus would take. */
  def clustered(spark: SparkSession, sfDir: String, name: String,
      keys: Seq[String], partitions: Int = 8,
      bloomKeys: Seq[String] = Seq.empty): DataFrame = {
    val layout = (s"${name}_${keys.mkString("_")}_$partitions" +:
      bloomKeys.map(k => s"bf_$k")).mkString("_")
    build(spark, sfDir, name, layout,
      bloomKeys.flatMap(k => Seq(
        s"parquet.bloom.filter.enabled#$k" -> "true",
        s"parquet.enable.dictionary#$k" -> "false")).toMap) { df =>
      df.repartitionByRange(partitions, keys.map(col): _*)
        .sortWithinPartitions(keys.map(col): _*)
    }
  }

  /** Read table `name` Z-ORDER clustered on two integral keys: each key
    * is min/max-rescaled to [0, 2^32) and bit-interleaved
    * (functions.zorder64 — a native codegen'd Morton curve), and the
    * table is range-clustered on the interleaved value. Rows end up
    * close in BOTH key dimensions, so row-group min/max stats prune a
    * predicate on EITHER key — where a plain sort prunes only its
    * leading key (proven from the footers in ClusteredTablesSpec).
    * The curve column itself is dropped before the write: it is a
    * layout decision, not data. */
  def zOrdered(spark: SparkSession, sfDir: String, name: String,
      keyA: String, keyB: String, partitions: Int = 8): DataFrame = {
    val layout = s"${name}_z_${keyA}_${keyB}_$partitions"
    build(spark, sfDir, name, layout) { df =>
      // min/max rescale per key (one tiny agg job at build time): the
      // curve needs both keys on comparable 32-bit scales, or the wider
      // domain monopolizes the high interleaved bits
      val Seq((loA, hiA), (loB, hiB)) = Seq(keyA, keyB).map { k =>
        val r = df.agg(min(col(k)), max(col(k))).head()
        (r.getLong(0), math.max(r.getLong(1), r.getLong(0) + 1))
      }
      def norm(k: String, lo: Long, hi: Long) =
        (((col(k) - lo).cast("double") / (hi - lo).toDouble)
          * ((1L << 32) - 1).toDouble).cast("long")
      df.withColumn("_z",
          graft.functions.functions.zorder64(
            norm(keyA, loA, hiA), norm(keyB, loB, hiB)))
        .repartitionByRange(partitions, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_z")
    }
  }

  /** On-disk location of a mirror built by [[clustered]] (spec access —
    * the footer assertions read the parquet files directly). */
  private[graft] def clusteredPath(sfDir: String, name: String,
      keys: Seq[String], partitions: Int = 8,
      bloomKeys: Seq[String] = Seq.empty): String =
    mirrorPath(sfDir, (s"${name}_${keys.mkString("_")}_$partitions" +:
      bloomKeys.map(k => s"bf_$k")).mkString("_")).toString

  /** On-disk location of a mirror built by [[zOrdered]]. */
  private[graft] def zOrderedPath(sfDir: String, name: String,
      keyA: String, keyB: String, partitions: Int = 8): String =
    mirrorPath(sfDir, s"${name}_z_${keyA}_${keyB}_$partitions").toString

  private def build(spark: SparkSession, sfDir: String, name: String,
      layout: String, writeOptions: Map[String, String] = Map.empty)(
      shape: DataFrame => DataFrame): DataFrame = {
    val path = mirrorPath(sfDir, layout)
    this.synchronized {
      if (!Files.exists(path.resolve("_SUCCESS"))) {
        shape(Tables.read(spark, sfDir, name))
          .write.mode(SaveMode.Overwrite).options(writeOptions)
          .parquet(path.toString)
      }
    }
    spark.read.schema(Tables.read(spark, sfDir, name).schema)
      .parquet(path.toString)
  }
}
