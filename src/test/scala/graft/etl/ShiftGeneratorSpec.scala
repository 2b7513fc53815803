package graft.etl

import java.time.LocalDate

import graft.SparkTestBase

/** S7 generator: determinism, distribution shape, and end-to-end ETL over
  * a generated paginated corpus (the reference's full-system test shape,
  * test_shift_data_processor.py:127-240, against generated data). */
class ShiftGeneratorSpec extends SparkTestBase {

  private val start = LocalDate.of(2023, 1, 1)

  test("same seed reproduces the corpus; different seed varies it") {
    val a = ShiftGenerator.generate(7L, start, 50)
    val b = ShiftGenerator.generate(7L, start, 50)
    val c = ShiftGenerator.generate(8L, start, 50)
    assert(a == b)
    assert(a != c)
  }

  test("distributions match the reference generator's envelope") {
    val shifts = ShiftGenerator.generate(42L, start, 360)
    assert(shifts.size == 360)
    shifts.foreach { s =>
      val startMin = (s.start / 60000) % 1440
      assert(startMin >= 7 * 60 && startMin < 10 * 60 && startMin % 15 == 0, s"start $startMin")
      val lenMin = (s.finish - s.start) / 60000
      assert(lenMin >= 8 * 60 && lenMin < 12 * 60 && lenMin % 15 == 0)
      assert(s.breaks.size <= 1)
      assert(s.allowances.size <= 3 && s.award_interpretations.size <= 3)
      s.allowances.foreach(a => assert(a.cost >= 1.0 && a.cost <= 50.0))
    }
    // break probability ~0.7
    val withBreak = shifts.count(_.breaks.nonEmpty)
    assert(withBreak > 360 * 0.6 && withBreak < 360 * 0.8, s"breaks: $withBreak")
  }

  test("generated corpus runs the full paginated ETL with consistent counts") {
    val shifts = ShiftGenerator.generate(1L, start, 40)
    val wh = new ShiftWarehouse(spark, tempDir("wh-gen"))
    val pages = PageSource.pages("http://gen/api/shifts?start=0&limit=7") { url =>
      val q = java.net.URI.create(url).getQuery
        .split("&").map(_.split("=")).map(kv => kv(0) -> kv(1).toInt).toMap
      val json = ShiftGenerator.pageJson(shifts, q("start"), q("limit"))
      val df = PageSource.parsePage(spark, json)
      val next = if (q("start") + q("limit") >= shifts.size) None
        else Some(s"/api/shifts?start=${q("start") + q("limit")}&limit=${q("limit")}")
      (df, next)
    }
    ShiftsEtl.run(pages, wh, LocalDate.of(2023, 3, 1), runId = "gen")
    assert(wh.shifts.count() == 40)
    assert(wh.breaks.count() == shifts.map(_.breaks.size).sum.toLong)
    assert(wh.allowances.count() == shifts.map(_.allowances.size).sum.toLong)
    assert(wh.awardInterpretations.count() == shifts.map(_.award_interpretations.size).sum.toLong)
    assert(wh.kpis.count() == 6)
  }
}
