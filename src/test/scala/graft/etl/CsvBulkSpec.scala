package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.Row
import java.nio.file.{Files, Paths}

/** CSV bulk-ingest edge: schema'd roundtrip, malformed-row quarantine,
  * and commit into the transactional warehouse — the implemented form
  * of the reference's suggested-but-unbuilt "CSV + COPY" path
  * (/root/reference/README.md:129). */
class CsvBulkSpec extends SparkTestBase {

  private def emptyTable(schema: org.apache.spark.sql.types.StructType) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  test("schema'd CSV roundtrip preserves dates, timestamps, and decimals") {
    import spark.implicits._
    val dir = tempDir("csvrt")
    val src = Seq(
      ("s1", "2023-11-27", "2023-11-27T08:00:00Z", "2023-11-27T17:00:00Z", "12.3456"),
      ("s2", "2023-11-28", "2023-11-28T09:15:00Z", "2023-11-28T18:45:00Z", "0.5000"))
      .toDF("shift_id", "d", "st", "fi", "c")
      .selectExpr("shift_id", "CAST(d AS DATE) AS shift_date",
        "CAST(st AS TIMESTAMP) AS shift_start",
        "CAST(fi AS TIMESTAMP) AS shift_finish",
        "CAST(c AS DECIMAL(13,4)) AS shift_cost")
    CsvBulk.write(src, s"$dir/shifts_csv")
    CsvBulk.read(spark, s"$dir/shifts_csv", ShiftSchemas.shiftsTable) {
      (valid, quarantine) =>
        assert(quarantine.count() == 0)
        assert(valid.schema == ShiftSchemas.shiftsTable)
        assert(valid.collect().toSet == src.collect().toSet)
    }
  }

  test("a malformed line is quarantined, not a load failure") {
    val dir = tempDir("csvbad")
    val f = Paths.get(dir, "part-0.csv")
    Files.createDirectories(f.getParent)
    Files.writeString(f,
      """shift_id,shift_date,shift_start,shift_finish,shift_cost
        |s1,2023-11-27,2023-11-27T08:00:00Z,2023-11-27T17:00:00Z,12.3456
        |s2,not-a-date,not-a-timestamp,also-bad,abc
        |s3,2023-11-28,2023-11-28T09:00:00Z,2023-11-28T18:00:00Z,7.2500
        |""".stripMargin)
    CsvBulk.read(spark, dir, ShiftSchemas.shiftsTable) { (valid, quarantine) =>
      assert(valid.count() == 2)
      assert(valid.select("shift_id").collect().map(_.getString(0)).toSet == Set("s1", "s3"))
      val bad = quarantine.collect()
      assert(bad.length == 1)
      assert(bad.head.getAs[String]("_corrupt_record").startsWith("s2,"))
    }
  }

  test("CSV-ingested rows commit through the warehouse like any batch") {
    import spark.implicits._
    val dir = tempDir("csvwh")
    val src = Seq(("s1", "2023-11-27", "2023-11-27T08:00:00Z",
        "2023-11-27T17:00:00Z", "12.3456"))
      .toDF("shift_id", "d", "st", "fi", "c")
      .selectExpr("shift_id", "CAST(d AS DATE) AS shift_date",
        "CAST(st AS TIMESTAMP) AS shift_start",
        "CAST(fi AS TIMESTAMP) AS shift_finish",
        "CAST(c AS DECIMAL(13,4)) AS shift_cost")
    CsvBulk.write(src, s"$dir/incoming")
    val wh = new ShiftWarehouse(spark, s"$dir/warehouse")
    // commit happens inside the read scope — the ingest consume step
    CsvBulk.read(spark, s"$dir/incoming", ShiftSchemas.shiftsTable) {
      (valid, _) =>
        wh.appendBatch(NormalizedShifts(valid,
          emptyTable(ShiftSchemas.breaksTable),
          emptyTable(ShiftSchemas.allowancesTable),
          emptyTable(ShiftSchemas.awardsTable)), "csv-batch-1")
    }
    assert(wh.shifts.count() == 1)
    assert(wh.shifts.select("shift_id").head().getString(0) == "s1")
  }
}
