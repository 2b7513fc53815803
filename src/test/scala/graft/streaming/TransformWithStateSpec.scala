package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Spark-4 arbitrary-state API (transformWithState + RocksDB store):
  * per-user running stats accumulate across micro-batches in named typed
  * state with native TTL. Runs on an isolated newSession so the RocksDB
  * provider conf never leaks into the other streaming specs. */
class TransformWithStateSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("per-user running stats accumulate across micro-batches in RocksDB state") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // 4.1's checksummed checkpoint files deadlock on close() when many
    // local tasks zip RocksDB checkpoints concurrently (every task parks
    // in ChecksumCancellableFSDataOutputStream awaiting its checksum
    // future — observed via jstack); checksums add nothing on a local FS
    s2.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val in = MemoryStream[EventStream.EventRow]
    val q = EventStream.userStats(in.toDS())
      .writeStream.format("memory").queryName("ustats")
      .outputMode("update")
      .option("checkpointLocation", tempDir("tws-ckpt"))
      .start()

    // batch 1: two users
    in.addData(
      EventStream.EventRow(1, ts("2024-01-01 10:00:00"), 1, "click", 1.50),
      EventStream.EventRow(2, ts("2024-01-01 10:01:00"), 1, "view", 2.25),
      EventStream.EventRow(3, ts("2024-01-01 10:02:00"), 2, "click", 5.00))
    q.processAllAvailable()
    // batch 2: user 1 returns — state must carry the earlier (2, 3.75)
    in.addData(
      EventStream.EventRow(4, ts("2024-01-01 11:00:00"), 1, "click", 3.00))
    q.processAllAvailable(); q.stop()

    val rows = s2.table("ustats")
      .as[EventStream.UserStats].collect().toSet
    assert(rows == Set(
      EventStream.UserStats(1, 2, 3.75), // batch-1 update
      EventStream.UserStats(2, 1, 5.00),
      EventStream.UserStats(1, 3, 6.75))) // batch-2 update: prior state + 3.00
  }
}
