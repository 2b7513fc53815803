package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Count-min sketch: never-underestimate guarantee, bounded
  * overestimate, and agreement between the JVM update loop and the
  * Column-expression estimator across partial-aggregation merges. */
class CountMinAggSpec extends SparkTestBase {

  private val D = 4
  private val W = 256

  test("estimates dominate exact counts with bounded overestimate") {
    import spark.implicits._
    // skewed corpus: token frequency ~ 1/rank, over 8 partitions so the
    // sketch goes through partial-buffer merges
    val rows = (1 to 5000).map(i => s"tok${i % 97}") ++ (1 to 2000).map(_ => "hot")
    val toks = rows.toDF("tok").repartition(8)
    val sketch = toks.agg(
      CountMinAgg.count_min_agg($"tok", D, W).as("sk"),
      count(lit(1)).as("total"))
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
    val est = CountMinAgg.count_min_estimate($"sk", $"tok", D, W)
    val checked = exact.join(broadcast(sketch))
      .select($"tok", $"n", est.as("est"), $"total")
      .as[(String, Long, Long, Long)].collect()
    assert(checked.length == 98)
    checked.foreach { case (tok, n, e, total) =>
      assert(e >= n, s"$tok: estimate $e under exact $n — violates the CM guarantee")
      assert(e <= n + (math.E / W * total).ceil.toLong * 3,
        s"$tok: estimate $e too far above $n")
    }
  }

  test("sketch is insensitive to partitioning (merge == single buffer)") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => s"w${i % 53}")
    def sk(parts: Int) = rows.toDF("tok").repartition(parts)
      .agg(CountMinAgg.count_min_agg($"tok", D, W)).head().getSeq[Long](0)
    assert(sk(1) == sk(7))
  }
}
