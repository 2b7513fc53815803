package graft.queries

import graft.SparkTestBase

/** PMI collocations and TextRank keywords: both are checked against a
  * driver-side reimplementation from first principles on the real
  * corpus (independent counting, exact-integer scoring, same rounding
  * discipline), plus plan shape for the bounded global top-k.
  */
class CollocationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def corpusTokens(): Seq[Array[String]] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select($"text").as[String].collect().toSeq
      .map(_.split(" ").filter(_.nonEmpty))
  }

  private def bigrams(): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    corpusTokens().foreach { ws =>
      // the shipped extraction slices the raw split arrays, which keep
      // interior empty tokens; the corpus has none (asserted here), so
      // the filtered reimplementation is equivalent
      (0 until ws.length - 1).foreach { i =>
        m((ws(i), ws(i + 1))) = m.getOrElse((ws(i), ws(i + 1)), 0L) + 1
      }
    }
    m.toMap
  }

  test("corpus split has no interior empty tokens (extraction equivalence)") {
    import spark.implicits._
    val n = graft.core.Tables.documents(spark, dir)
      .select($"text").as[String].collect()
      .count(t => t.split(" ", -1).exists(_.isEmpty))
    assert(n == 0, s"$n documents with empty tokens")
  }

  test("PMI collocations equal a first-principles driver recompute") {
    import spark.implicits._
    val uni = corpusTokens().flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val bi = bigrams()
    val n = uni.values.sum
    val bt = bi.values.sum
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = bi.toSeq.collect { case ((a, b), cab) if cab >= 5 =>
      val s = (BigInt(cab) * n * n).toDouble /
        (BigInt(uni(a)) * uni(b) * bt).toDouble
      (a, b, cab, s)
    }
    val top = scored.sortBy { case (a, b, _, s) => (-s, a, b) }.take(50)
    val expected = top.zipWithIndex.map { case ((a, b, cab, s), i) =>
      (a, b, cab, round9(math.log(s)), i + 1)
    }.toSet
    val got = TextOps.qPmiCollocations(spark, dir)
      .as[(String, String, Long, Double, Int)].collect().toSet
    assert(got == expected,
      s"missing: ${expected -- got}\nextra: ${got -- expected}")
  }

  test("TextRank equals the exact-integer reference iteration") {
    import spark.implicits._
    val bi = bigrams().filter { case ((a, b), _) => a != b }
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    bi.foreach { case ((a, b), c) =>
      edges((a, b)) = edges.getOrElse((a, b), 0L) + c
      edges((b, a)) = edges.getOrElse((b, a), 0L) + c
    }
    val wt = edges.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val scale = 1000000L
    var r: Map[String, Long] = wt.keys.map(_ -> scale).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case ((src, dst), w) =>
        in(dst) = in.getOrElse(dst, 0L) + r(src) * w / wt(src)
      }
      r = in.map { case (node, s) => node -> (15L * scale / 100 + 85 * s / 100) }.toMap
    }
    val expected = r.toSeq.sortBy { case (t, v) => (-v, t) }.take(20)
      .zipWithIndex
      .map { case ((t, v), i) => (t, i + 1, v.toDouble / scale) }.toSet
    val got = TextOps.qTextrank(spark, dir)
      .as[(String, Int, Double)].collect().toSet
    assert(got == expected,
      s"missing: ${expected -- got}\nextra: ${got -- expected}")
  }

  test("both global top-k reads are bounded (TakeOrderedAndProject, no full sort)") {
    for (df <- Seq(TextOps.qPmiCollocations(spark, dir),
        TextOps.qTextrank(spark, dir))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"), p)
    }
  }
}
