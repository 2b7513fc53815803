package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.etl.{ShiftGenerator, ShiftNormalizer}

class PagedJsonSourceSpec extends SparkTestBase {

  private def writePages(n: Int): String = {
    val dir = tempDir("pages")
    val shifts = ShiftGenerator.generate(5L, java.time.LocalDate.of(2023, 1, 1), n * 4)
    (0 until n).foreach { i =>
      Files.write(Paths.get(dir, f"page$i%03d.json"),
        ShiftGenerator.pageJson(shifts, i * 4, 4).getBytes("UTF-8"))
    }
    dir
  }

  private def read(dir: String) =
    spark.read.format("graft.sources.PagedJsonSource").load(dir)

  test("reads one row per page with the declared schema") {
    val dir = writePages(5)
    val df = read(dir)
    assert(df.schema == graft.etl.ShiftSchemas.pageSchema)
    assert(df.count() == 5)
    import spark.implicits._
    // envelope fields parse (pruned projection of the page header)
    val sizes = df.select($"size").as[Int].collect()
    assert(sizes.forall(_ == 4))
  }

  test("pushed LIMIT prunes input partitions to the limit") {
    val dir = writePages(6)
    val limited = read(dir).limit(2)
    assert(limited.count() == 2)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("limit=2"), plan)
  }

  test("an unparseable page fails the read instead of vanishing") {
    // LIMIT pushdown prunes to the first n page FILES; if a bad page were
    // silently skipped, LIMIT n would return fewer than n rows even though
    // later valid pages exist. The reader must raise instead.
    val dir = writePages(3)
    Files.write(Paths.get(dir, "page000.json"), "{not json".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      read(dir).limit(2).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unparseable page")), e.getMessage)
  }

  test("bare COUNT(*) is answered from the file listing — no page bytes parsed") {
    val dir = writePages(4)
    // one row per page file makes a global count pure metadata (the
    // DSv2 analog of parquet's footer count): plant a malformed page to
    // prove the pushed path never parses content
    Files.write(Paths.get(dir, "page999.json"), "{not json".getBytes("UTF-8"))
    val counted = read(dir).groupBy().count()
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("PagedJsonCountScan"), plan)
    assert(counted.head().getLong(0) == 5)
    // the row-reading path still fails loudly on the same directory
    intercept[org.apache.spark.SparkException](read(dir).collect())
    // and a LIMIT below the count disables the pushdown (partial limit
    // pushdown may not be double-counted by a metadata count)
    val limited = read(dir).limit(2).groupBy().count()
    assert(!limited.queryExecution.executedPlan.toString.contains("PagedJsonCountScan"))
  }

  test("pages flow into the normalizer like any other page DataFrame") {
    val dir = writePages(3)
    import org.apache.spark.sql.functions.explode
    val norm = ShiftNormalizer.shifts(read(dir))
    assert(norm.count() == 12) // 3 pages × 4 shifts
    assert(norm.columns.toSeq ==
      Seq("shift_id", "shift_date", "shift_start", "shift_finish", "shift_cost"))
  }
}
