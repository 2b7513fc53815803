package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join on a skewed key sends every row of a hot key to one
  * task; at 100 TB a single hot key stalls the stage. Salting splits each
  * hot key across `salts` tasks: the large (skewed) side gets a
  * deterministic salt in [0, salts) per row, the small side is replicated
  * once per salt value, and the join key becomes (key, salt). Results are
  * identical to the plain join; only the shuffle distribution changes.
  *
  * The per-row salt is `pmod(hash(<entire row>), salts)` — deterministic
  * (re-runnable tasks produce the same salt, unlike rand()) and
  * independent of the join key (rows of one hot key spread evenly).
  *
  * Prefer AQE's skew-join handling (`spark.sql.adaptive.skewJoin`, on by
  * default) when it applies; explicit salting remains the tool when the
  * skew is known ahead of time, the small side is too big to broadcast,
  * or the engine's split thresholds don't trigger.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, with the large side salted
    * `salts` ways. Column sets must be disjoint apart from `key`. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol: Column =
      pmod(hash(large.columns.map(large(_)).toIndexedSeq: _*), lit(salts))
    val saltedLarge = large.withColumn("__salt", saltCol)
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
