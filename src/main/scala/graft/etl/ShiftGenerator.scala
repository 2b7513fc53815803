package graft.etl

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.util.UUID

import scala.util.Random

/** S7: seeded synthetic shift source with the reference generator's
  * distributional semantics (api/app/generator.py:39-89): one shift per
  * day; start between 7–10 am on a :15 boundary; length 8–12 h on :15;
  * one break with probability 0.7, starting 2–3 h in, Gaussian length
  * μ=23 min σ=5, paid with p=0.5; 0–3 allowances with value ∈
  * {0.5, 0.75, 1.0, 1.5} and cost ∈ [1.0, 50.0]; 0–3 award
  * interpretations with cost ∈ [1.0, 100.0].
  *
  * Unlike the reference (module-import-time `random` state), this
  * generator is explicitly seeded and pure — the same (seed, startDate,
  * days) always produces the same corpus, so tests can pin counts.
  */
object ShiftGenerator {

  case class GenBreak(id: String, start: Long, finish: Long, paid: Boolean)
  case class GenAllowance(id: String, value: Double, cost: Double)
  case class GenAward(id: String, date: String, units: Double, cost: Double)
  case class GenShift(id: String, date: String, start: Long, finish: Long,
      breaks: Seq[GenBreak], allowances: Seq[GenAllowance],
      award_interpretations: Seq[GenAward])

  private val choices = Array(0.5, 0.75, 1.0, 1.5)

  private def epochMs(dt: LocalDateTime): Long =
    dt.toInstant(ZoneOffset.UTC).toEpochMilli

  private def uuid(rnd: Random): String =
    new UUID(rnd.nextLong(), rnd.nextLong()).toString

  def generate(seed: Long, startDate: LocalDate, days: Int = 360): Seq[GenShift] = {
    val rnd = new Random(seed)
    (0 until days).map { i =>
      val date = startDate.plusDays(i.toLong)
      val dayStart = date.atStartOfDay()
      // start 7-10am on :15 (api/app/generator.py:46-48)
      val start = dayStart.plusMinutes((7 * 60 + rnd.nextInt(12) * 15).toLong)
      // length 8-12h on :15 (generator.py:51-53)
      val finish = start.plusMinutes((8 * 60 + rnd.nextInt(16) * 15).toLong)
      // break p=0.7, 2-3h in, gaussian 23±5 min (generator.py:12-22,56-59)
      val breaks =
        if (rnd.nextDouble() < 0.7) {
          val bStart = start.plusMinutes((120 + rnd.nextInt(61)).toLong)
          val bFinish = bStart.plusSeconds(math.round((23.0 + rnd.nextGaussian() * 5.0) * 60.0))
          Seq(GenBreak(uuid(rnd), epochMs(bStart), epochMs(bFinish), rnd.nextDouble() > 0.5))
        } else Seq.empty
      val allowances = Seq.fill(rnd.nextInt(4))(
        GenAllowance(uuid(rnd), choices(rnd.nextInt(4)), (10 + rnd.nextInt(491)) / 10.0))
      val awards = Seq.fill(rnd.nextInt(4))(
        GenAward(uuid(rnd), date.toString, choices(rnd.nextInt(4)), (10 + rnd.nextInt(991)) / 10.0))
      GenShift(uuid(rnd), date.toString, epochMs(start), epochMs(finish),
        breaks, allowances, awards)
    }
  }

  /** Serve the generated corpus as reference-shaped JSON pages with
    * prev/next links (api/app/main.py:78-113) — an in-memory stand-in for
    * the HTTP source, pluggable into [[PageSource.pages]]. */
  def pageJson(shifts: Seq[GenShift], start: Int, limit: Int, base: String = "http://gen/api/shifts"): String = {
    val slice = shifts.slice(start, start + limit)
    def q(s: String) = "\"" + s + "\""
    def brk(b: GenBreak) =
      s"""{"id": ${q(b.id)}, "start": ${b.start}, "finish": ${b.finish}, "paid": ${b.paid}}"""
    def alw(a: GenAllowance) =
      s"""{"id": ${q(a.id)}, "value": ${a.value}, "cost": ${a.cost}}"""
    def awd(w: GenAward) =
      s"""{"id": ${q(w.id)}, "date": ${q(w.date)}, "units": ${w.units}, "cost": ${w.cost}}"""
    val results = slice.map { s =>
      s"""{"id": ${q(s.id)}, "date": ${q(s.date)}, "start": ${s.start}, "finish": ${s.finish},
         | "breaks": [${s.breaks.map(brk).mkString(", ")}],
         | "allowances": [${s.allowances.map(alw).mkString(", ")}],
         | "award_interpretations": [${s.award_interpretations.map(awd).mkString(", ")}]}""".stripMargin
    }
    val prev =
      if (start <= 0) "null"
      else q(s"/api/shifts?start=${math.max(0, start - limit)}&limit=$limit")
    val next =
      if (start + limit >= shifts.size) "null"
      else q(s"/api/shifts?start=${start + limit}&limit=$limit")
    s"""{"results": [${results.mkString(", ")}],
       | "links": {"base": ${q(base)}, "prev": $prev, "next": $next},
       | "start": $start, "limit": $limit, "size": ${slice.size}}""".stripMargin
  }
}
