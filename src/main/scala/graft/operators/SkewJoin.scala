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
  * The per-row salt mixes the row content with
  * `monotonically_increasing_id()` — deterministic under task retry (the
  * id is a pure function of partition id and row position) and, unlike a
  * content-only hash, it spreads even fully IDENTICAL rows of a hot key
  * across salts (duplicate-heavy fact tables are exactly where skew
  * bites).
  *
  * Prefer AQE's skew-join handling (`spark.sql.adaptive.skewJoin`, on by
  * default) when it applies; explicit salting remains the tool when the
  * skew is known ahead of time, the small side is too big to broadcast,
  * or the engine's split thresholds don't trigger.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, with the large side salted
    * `salts` ways. Column sets must be disjoint apart from `key`. */
  private val SaltCol = "__graft_salt"

  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!large.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"inputs must not already contain a $SaltCol column")
    val saltCol: Column = pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int")
    val saltedLarge = large.withColumn(SaltCol, saltCol)
    val replicatedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, SaltCol), "inner")
      .drop(SaltCol)
  }
}
