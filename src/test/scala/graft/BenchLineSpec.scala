package graft

import org.scalatest.funsuite.AnyFunSuite

/** Budget pin for the bench's LAST printed line (judge r16 wrong #1):
  * the driver captures only the tail ~2000 chars of the log, and twice
  * now a dirty window has blown the compact summary past it (r14: the
  * full query map; r16: a 108-mover warm map) — truncating the head off
  * the JSON and shipping parsed:null. The line must stay under budget
  * for ANY window shape, so this spec feeds a synthetic 150-mover run
  * with worst-case-length names and asserts the hard cap holds. */
class BenchLineSpec extends AnyFunSuite {

  private def syntheticLine(nWarm: Int): String = {
    // realistic worst case: long query names (the registry's longest is
    // ~28 chars), 4-digit-second times, every scalar populated
    def m(n: Int, tag: String) =
      (1 to n).map(i => f"q_synthetic_${tag}_face_name_$i%03d" -> (1000.0 - i))
    Bench.compactLine(
      scalars = Seq(
        "metric" -> "\"total\"",
        "value" -> "1234.567",
        "clean_value" -> "1111.111",
        "n_warm_sub" -> "150",
        "unit" -> "\"sec\"",
        "sf" -> "\"/root/testdata/sf0.1\"",
        "failed" -> "0",
        "n_queries" -> "264",
        "load1" -> "1.832",
        "load1_end" -> "5.298",
        "gc_sec" -> "5.470",
        "idle_wait_sec" -> "130.049",
        "midrun_wait_sec" -> "300.000",
        "ext_cores_avg" -> "0.386",
        "n_contended" -> "150",
        "calib_base" -> "2.085",
        "n_calib_drift" -> "12",
        "setup_sec" -> "103.912",
        "warm_failed" -> "0",
        "n_movers" -> nWarm.toString),
      setup = m(24, "setup"),
      slowest = m(12, "slow"),
      warm = m(nWarm, "warm"),
      calib = m(30, "calib"))
  }

  test("a 150-mover dirty window still fits the driver tail capture") {
    val line = syntheticLine(150)
    assert(line.length < 1900, s"${line.length} chars")
    // headline fields survive at the head — the exact thing truncation
    // destroyed in BENCH_r16
    assert(line.startsWith("""{"metric":"total""""))
    assert(line.contains(""""clean_value":"""))
    // structurally one JSON object: balanced braces, no nesting errors
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // the caps actually bit: 8 warm entries + the count field
    assert("""q_synthetic_warm_face_name_\d+""".r
      .findAllIn(line).size == 8)
    assert(line.contains(""""n_warm":150"""))
  }

  test("a clean window keeps its full (small) maps") {
    val line = syntheticLine(5)
    assert(line.length < 1900, s"${line.length} chars")
    assert("""q_synthetic_warm_face_name_\d+""".r
      .findAllIn(line).size == 5)
  }
}
