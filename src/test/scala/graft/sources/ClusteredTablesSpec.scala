package graft.sources

import graft.SparkTestBase
import graft.core.Tables

/** Range-clustered mirrors: prove, from the parquet footers themselves,
  * that the clustered layout's row-group min/max statistics prune a
  * range predicate the unsorted layout cannot — the data-skipping
  * arithmetic a 100 TB scan relies on (the reader skips any row group
  * whose [min, max] cannot satisfy the pushed predicate; a table format
  * would additionally prune whole files from the same stats at plan
  * time).
  */
class ClusteredTablesSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private val lo = 100L
  private val hi = 400L

  /** Per-row-group [min, max] of an INT64 column across a parquet dir. */
  private def rowGroupRanges(dir: String, column: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0).sorted
    files.toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.toSeq.map { block =>
        val stats = block.getColumns.asScala
          .find(_.getPath.toDotString == column).get.getStatistics
        (stats.genericGetMin.asInstanceOf[Long], stats.genericGetMax.asInstanceOf[Long])
      } finally r.close()
    }
  }

  test("clustered layout: row-group stats prune the range predicate; unsorted stats cannot") {
    import spark.implicits._
    // build the clustered mirror and an unsorted same-partition-count twin
    ClusteredTables.clustered(spark, sfDir, "lineitem", Seq("l_orderkey"))
    val unsortedDir = tempDir("unsorted-twin") + "/lineitem"
    Tables.lineitem(spark, sfDir).repartition(8)
      .write.mode("overwrite").parquet(unsortedDir)

    val clusteredDir =
      ClusteredTables.clusteredPath(sfDir, "lineitem", Seq("l_orderkey"))
    def overlapping(ranges: Seq[(Long, Long)]): Int =
      ranges.count { case (mn, mx) => mx >= lo && mn < hi }

    val clustered = rowGroupRanges(clusteredDir, "l_orderkey")
    val unsorted = rowGroupRanges(unsortedDir, "l_orderkey")
    assert(clustered.size >= 6, s"expected >=6 row groups, got $clustered")
    info(s"clustered row groups overlapping [$lo,$hi): ${overlapping(clustered)}/${clustered.size}")
    info(s"unsorted  row groups overlapping [$lo,$hi): ${overlapping(unsorted)}/${unsorted.size}")
    // range clustering gives disjoint narrow ranges: the predicate spans
    // ~20% of the key domain, so it can straddle at most 3 of the 8
    // ~190-key-wide groups (⌈300/190⌉ + 1 boundary group)...
    assert(overlapping(clustered) <= 3,
      s"clustered stats must prune: $clustered")
    // ...while hash repartitioning spreads every key range over every
    // row group — the same stats prune nothing
    assert(overlapping(unsorted) == unsorted.size,
      s"unsorted twin unexpectedly selective (layout assumption broke): $unsorted")
  }

  test("zorder64 interleave: exact bit placement and order preservation on quadrants") {
    // slow reference interleave vs the magic-mask kernel
    def slow(a: Long, b: Long): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val samples = Seq(0L, 1L, 2L, 0xFFFFFFFFL, 0x12345678L, 0xAAAA5555L, 305419896L)
    for (a <- samples; b <- samples)
      assert(graft.functions.ZOrder64.compute(a, b) == slow(a, b), s"($a, $b)")
    // the curve's locality property the layout relies on: if BOTH
    // coordinates of x are <= those of y, z(x) <= z(y)
    assert(graft.functions.ZOrder64.compute(3, 7) <=
      graft.functions.ZOrder64.compute(5, 9))
    // SQL registration
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder64(1L, 1L) AS z").head().getLong(0) == 3L)
  }

  test("zorder64 on [0,2^31) keys stays nonnegative — signed sort equals unsigned Morton order") {
    // the layout normalizes both keys below 2^31 precisely so the
    // interleaved value tops out at bit 61 (advisor r7: 2^32-scaled keys
    // put keyB's top bit at long bit 63, and the SIGNED repartitionByRange
    // split the curve at the sign wrap); pin the boundary arithmetic
    val top = (1L << 31) - 1
    val rnd = new scala.util.Random(7)
    val keys = Seq(0L, 1L, top, top - 1) ++ Seq.fill(200)(rnd.nextLong(top + 1))
    for (a <- keys; b <- Seq(0L, top, keys(rnd.nextInt(keys.size)))) {
      val z = graft.functions.ZOrder64.compute(a, b)
      assert(z >= 0, s"zorder64($a, $b) = $z went negative")
      assert((z >> 62) == 0, s"zorder64($a, $b) uses bits above 61")
    }
    // monotone along each axis at the top of the range (the wrap case):
    // unsigned Morton order must equal signed Long order
    assert(graft.functions.ZOrder64.compute(0, top) >
      graft.functions.ZOrder64.compute(top, top / 2))
  }

  test("z-order layout prunes row groups on BOTH keys; single-key sort only on its leading key") {
    // build both mirrors, then read their footers off disk
    ClusteredTables.zOrdered(spark, sfDir, "lineitem", "l_orderkey", "l_partkey")
    ClusteredTables.clustered(spark, sfDir, "lineitem", Seq("l_orderkey"))
    val zDir = ClusteredTables.zOrderedPath(sfDir, "lineitem", "l_orderkey", "l_partkey")
    val sortedDir = ClusteredTables.clusteredPath(sfDir, "lineitem", Seq("l_orderkey"))
    def overlapping(ranges: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      ranges.count { case (mn, mx) => mx >= lo && mn < hi }

    // secondary-key predicate (l_partkey ∈ [10, 60), ~25% of the domain
    // at sf0.001): the l_orderkey-sorted layout can NEVER skip on it...
    val sortedPart = rowGroupRanges(sortedDir, "l_partkey")
    assert(overlapping(sortedPart, 10, 60) == sortedPart.size,
      s"single-key sort unexpectedly selective on the secondary key: $sortedPart")
    // ...the z-layout must (each z range covers a sub-rectangle of the
    // key plane, so some row groups exclude the partkey band entirely)
    val zPart = rowGroupRanges(zDir, "l_partkey")
    val zPartHit = overlapping(zPart, 10, 60)
    info(s"z-layout row groups overlapping partkey [10,60): $zPartHit/${zPart.size}")
    assert(zPartHit < zPart.size, s"z-layout pruned nothing on l_partkey: $zPart")
    // and it still prunes on the primary key too (weaker than the pure
    // sort, but real): some row group must exclude orderkey [100,400)
    val zOrd = rowGroupRanges(zDir, "l_orderkey")
    val zOrdHit = overlapping(zOrd, 100, 400)
    info(s"z-layout row groups overlapping orderkey [100,400): $zOrdHit/${zOrd.size}")
    assert(zOrdHit < zOrd.size, s"z-layout pruned nothing on l_orderkey: $zOrd")
  }

  test("z-order scan matches the flat layout") {
    import spark.implicits._
    val z = graft.queries.Scale.qZorderScan(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    val flat = Tables.lineitem(spark, sfDir)
      .filter($"l_partkey" >= 10 && $"l_partkey" < 60)
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum($"l_quantity").cast("double").as("sum_qty"))
      .as[(String, Long, Double)].collect().toSet
    assert(z == flat)
  }

  test("bloom-filtered write: point probes on a non-sort column get definite-absent answers") {
    import scala.jdk.CollectionConverters._
    // sort on l_orderkey, bloom on l_partkey: min/max stats can't prune
    // a point probe on l_partkey (every group spans the domain — proven
    // in the z-order test), but the bloom can
    ClusteredTables.clustered(spark, sfDir, "lineitem", Seq("l_orderkey"),
      bloomKeys = Seq("l_partkey"))
    val dir = ClusteredTables.clusteredPath(sfDir, "lineitem", Seq("l_orderkey"),
      bloomKeys = Seq("l_partkey"))
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0).sorted
    assert(files.nonEmpty)
    // present keys per row group (ground truth), absent probe set
    val presentByFile = files.map { f =>
      f.getAbsolutePath -> spark.read.parquet(f.getAbsolutePath)
        .select("l_partkey").distinct()
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val allPresent = presentByFile.values.flatten.toSet
    val absentProbes = (1L to 5000L).filterNot(allPresent).take(100)
    assert(absentProbes.size >= 50, "need absent keys for the FPR check")
    var falsePositives = 0
    var definiteAbsent = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.foreach { block =>
        val cm = block.getColumns.asScala
          .find(_.getPath.toDotString == "l_partkey").get
        val bloom = r.getBloomFilterDataReader(block).readBloomFilter(cm)
        assert(bloom != null, s"no bloom filter written in ${f.getName}")
        // NO false negatives, ever: every present key must hit
        presentByFile(f.getAbsolutePath).take(50).foreach { k =>
          assert(bloom.findHash(bloom.hash(k)), s"false negative for $k")
        }
        absentProbes.foreach { k =>
          if (bloom.findHash(bloom.hash(k))) falsePositives += 1
          else definiteAbsent += 1
        }
      } finally r.close()
    }
    info(s"absent-key probes: $definiteAbsent definite-absent, $falsePositives false-positive")
    // ~1% target FPR; assert the skip signal is real with wide slack
    assert(definiteAbsent > falsePositives * 4,
      s"bloom rejects too few absent keys: $definiteAbsent vs $falsePositives")
  }

  test("files.maxPartitionBytes is the scan-parallelism knob: smaller splits, more tasks") {
    // the spill-sizing lever from the scale brief, pinned: the same file
    // set fans out to more scan partitions as the split size shrinks
    val dir = s"$sfDir/lineitem.parquet"
    def scanPartitions(maxBytes: Long): Int = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxBytes.toString)
      try Tables.lineitem(spark, sfDir).rdd.getNumPartitions
      finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
    val coarse = scanPartitions(128L * 1024 * 1024)
    val fine = scanPartitions(64L * 1024)
    info(s"scan partitions: $coarse at 128MB splits, $fine at 64KB splits")
    assert(fine > coarse,
      s"shrinking maxPartitionBytes must add scan parallelism: $coarse -> $fine")
  }

  test("manifest prunes files at plan time; missing manifest falls back to all files") {
    import spark.implicits._
    val pruned = ClusteredTables.clusteredRange(
      spark, sfDir, "lineitem", Seq("l_orderkey"), "l_orderkey", lo, hi)
    val total = ClusteredTables.clustered(spark, sfDir, "lineitem", Seq("l_orderkey"))
      .inputFiles.length
    info(s"pruned read plans ${pruned.inputFiles.length} of $total files")
    // ~20% key-range selectivity over 8 disjoint file ranges → ≤3 files
    // ever reach the scan; the skipped 5 launch no tasks at all
    assert(total >= 6 && pruned.inputFiles.length <= 3, s"${pruned.inputFiles.length}/$total")
    // parity after the row-level filter
    val flatRows = Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey" >= lo && $"l_orderkey" < hi).count()
    assert(pruned.filter($"l_orderkey" >= lo && $"l_orderkey" < hi).count() == flatRows)
    // a range outside the key domain plans ZERO files and returns empty
    val none = ClusteredTables.clusteredRange(
      spark, sfDir, "lineitem", Seq("l_orderkey"), "l_orderkey", -500, -100)
    assert(none.inputFiles.isEmpty && none.count() == 0)
    // fallback: with the manifest moved aside, every file is planned and
    // results are unchanged — a lost manifest costs pruning, not rows
    val dir = java.nio.file.Paths.get(
      ClusteredTables.clusteredPath(sfDir, "lineitem", Seq("l_orderkey")))
    val mf = dir.resolve("_key_manifest.tsv")
    val aside = dir.resolve("_key_manifest.tsv.bak")
    java.nio.file.Files.move(mf, aside)
    try {
      val full = ClusteredTables.clusteredRange(
        spark, sfDir, "lineitem", Seq("l_orderkey"), "l_orderkey", lo, hi)
      assert(full.inputFiles.length == total)
      assert(full.filter($"l_orderkey" >= lo && $"l_orderkey" < hi).count() == flatRows)
    } finally java.nio.file.Files.move(aside, mf)
    // the z-order manifest carries BOTH keys: the secondary key alone
    // prunes files too (the sort-only layout never can — proven above)
    val zPruned = ClusteredTables.zOrderedRange(
      spark, sfDir, "lineitem", "l_orderkey", "l_partkey", "l_partkey", 10, 60)
    info(s"z-pruned read on secondary key plans ${zPruned.inputFiles.length} of $total files")
    assert(zPruned.inputFiles.length < total, s"${zPruned.inputFiles.length}/$total")
  }

  test("clustered scan pushes the range predicate and matches the flat layout") {
    import spark.implicits._
    val p = graft.queries.Scale.qClusteredScan(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_orderkey"), p)
    val clustered = graft.queries.Scale.qClusteredScan(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    val flat = Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey" >= lo && $"l_orderkey" < hi)
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum($"l_quantity").cast("double").as("sum_qty"))
      .as[(String, Long, Double)].collect().toSet
    assert(clustered == flat)
  }
}
