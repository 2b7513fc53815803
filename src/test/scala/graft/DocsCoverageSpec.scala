package graft

import org.scalatest.funsuite.AnyFunSuite

/** Docs-sync gate (review r11 item 8): the SURVEY §8 coverage table and
  * the registry drifted twice in round-11 commit messages (219 vs 220).
  * Coverage facts are now derived from `SparkEntry.queries` IN A TEST,
  * so the docs cannot lag the code:
  *   - every registered query name must appear in SURVEY §8;
  *   - §8's machine-checkable count line must equal the registry size.
  * Tests run with cwd = the project root (forked JVM), the same
  * convention every Scratch/target-relative path in the repo relies on.
  */
class DocsCoverageSpec extends AnyFunSuite {

  private lazy val survey: String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
    "UTF-8")

  private lazy val section8: String = {
    val start = survey.indexOf("\n## 8.")
    assert(start >= 0, "SURVEY.md must have a §8 coverage section")
    survey.substring(start)
  }

  test("every SparkEntry query appears in SURVEY §8") {
    val missing = SparkEntry.queries.keys
      .filterNot(section8.contains).toSeq.sorted
    assert(missing.isEmpty,
      s"SURVEY §8 lags the registry by ${missing.size}: ${missing.mkString(", ")}")
  }

  test("SURVEY §8's registry-count line equals SparkEntry.queries.size") {
    val m = """Driver-visible queries: (\d+)""".r.findFirstMatchIn(section8)
    assert(m.isDefined,
      "SURVEY §8 must carry a 'Driver-visible queries: N' count line")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"SURVEY §8 says ${m.get.group(1)}, registry has ${SparkEntry.queries.size}")
  }

  test("README's query-count line equals SparkEntry.queries.size") {
    // review r12: README said 225 while the registry, SURVEY §8 and the
    // correctness artifact all said 226 — the same drift class §8's
    // count assertion was added for, now closed for README too
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      "UTF-8")
    // earlier matches are per-round HISTORY ("69 … at the end of round
    // 3"); only the last, current-state mention must track the registry
    val ms = """(\d+) driver-visible queries""".r.findAllMatchIn(readme).toSeq
    assert(ms.nonEmpty,
      "README.md must carry an 'N driver-visible queries' count line")
    assert(ms.last.group(1).toInt == SparkEntry.queries.size,
      s"README says ${ms.last.group(1)}, registry has ${SparkEntry.queries.size}")
  }

  test("ARCHITECTURE's query-count line equals SparkEntry.queries.size") {
    // review r13: ARCHITECTURE said 234 (and the bench paragraph 238)
    // while the registry shipped 240 in the same commit range — the
    // same drift class, now guarded for the third doc
    val arch = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("ARCHITECTURE.md")), "UTF-8")
    val ms = """(\d+) driver-visible queries""".r.findAllMatchIn(arch).toSeq ++
      """(\d+) queries in""".r.findAllMatchIn(arch).toSeq
    assert(ms.nonEmpty, "ARCHITECTURE.md must carry a query-count line")
    ms.foreach { m =>
      assert(m.group(1).toInt == SparkEntry.queries.size,
        s"ARCHITECTURE says ${m.group(1)}, registry has ${SparkEntry.queries.size}")
    }
  }

  test("every query has an oracle and every oracle has a query") {
    // the driver records a weaker rows-only check for oracle-less
    // queries; this repo's contract is the stronger one — keep it total
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"asymmetric: ${(SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet) ++
        (SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet)}")
  }
}
