package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Incremental aggregate maintenance: merged partials must equal a full
  * recompute after every batch, half-published versions must stay
  * invisible, and old versions must remain as-of readable until pruned. */
class IncrementalAggSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def events = graft.core.Tables.events(spark, sfDir)

  private def fullRecompute(upToMod: Int) = {
    import spark.implicits._
    events.filter($"event_id" % 3 <= upToMod)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"),
        sum($"value".cast("decimal(38,6)")).cast("double").as("vsum"),
        min($"value").as("vmin"), max($"value").as("vmax"))
      .withColumn("vavg", ($"vsum".cast("decimal(38,6)") / $"cnt").cast("double"))
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
  }

  test("merging batch partials equals a full recompute after every batch") {
    import spark.implicits._
    val agg = new IncrementalAgg(spark, tempDir("incragg"),
      Seq("event_type"), "value")
    (0 to 2).foreach { m =>
      agg.ingest(events.filter($"event_id" % 3 === m))
      val got = agg.summary
        .as[(String, Long, Double, Double, Double, Double)].collect().toSet
      assert(got == fullRecompute(m), s"divergence after batch $m")
    }
    assert(agg.currentVersion.contains(3L))
  }

  test("a version directory without its commit marker is invisible") {
    import spark.implicits._
    val root = tempDir("incrcrash")
    val agg = new IncrementalAgg(spark, root, Seq("event_type"), "value")
    agg.ingest(events.filter($"event_id" % 3 === 0))
    // simulate a crash between the state move and the marker write
    val orphan = Paths.get(root, "v=00000002")
    events.limit(1).groupBy($"event_type").agg(count(lit(1)).as("cnt"),
        sum($"value".cast("decimal(38,6)")).as("vsum"),
        min($"value").as("vmin"), max($"value").as("vmax"))
      .write.parquet(orphan.toString)
    assert(agg.currentVersion.contains(1L), "unmarked version must not resolve")
    // the next ingest reclaims the uncommitted orphan on its own
    agg.ingest(events.filter($"event_id" % 3 === 1))
    assert(agg.currentVersion.contains(2L))
    assert(agg.state.agg(sum($"cnt")).head().getLong(0) ==
      events.filter($"event_id" % 3 <= 1).count())
  }

  test("a stream maintains the same state through foreachBatch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the streaming face of incremental view maintenance: each
    // micro-batch is just another ingest; replay safety comes from the
    // versioned commit (a re-run of the same batch would double-count —
    // production keys the version off batchId, exactly like the
    // warehouse's replay-safe foreachBatch sink in EventStream)
    val agg = new IncrementalAgg(spark, tempDir("incrstream"),
      Seq("event_type"), "value")
    val in = MemoryStream[(String, Double)]
    val q = in.toDS().toDF("event_type", "value")
      .writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => { agg.ingest(batch); () })
      .start()
    in.addData(("click", 1.0), ("view", 2.0))
    q.processAllAvailable()
    in.addData(("click", 3.5))
    q.processAllAvailable()
    q.stop()
    val got = agg.summary
      .select($"event_type", $"cnt", $"vsum", $"vavg")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(got == Set(("click", 2L, 4.5, 2.25), ("view", 1L, 2.0, 2.0)))
    assert(agg.currentVersion.contains(2L))
  }

  test("old versions stay as-of readable until pruned") {
    import spark.implicits._
    val agg = new IncrementalAgg(spark, tempDir("incrprune"),
      Seq("event_type"), "value")
    agg.ingest(events.filter($"event_id" % 3 === 0))
    agg.ingest(events.filter($"event_id" % 3 === 1))
    val v1Rows = agg.stateAt(1L).agg(sum($"cnt")).head().getLong(0)
    assert(v1Rows == events.filter($"event_id" % 3 === 0).count())
    agg.prune(keep = 1)
    assert(agg.currentVersion.contains(2L))
    intercept[IllegalArgumentException](agg.stateAt(1L))
  }
}
