package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salted rewrite for a skewed fact-fact equi-join (SURVEY.md §4.2
  * skew pattern, join flavor — `a14_salted_groupby` is the aggregation
  * flavor).
  *
  * Problem shape: the LEFT side's join key is Zipf-skewed (one hot key holds
  * ≥30% of rows — at web scale, the mega-customer / mirror-host / null-ish
  * sentinel key), the RIGHT side is key-unique but too large to broadcast.
  * A plain shuffle join hash-partitions on the key, so the hot key's entire
  * row mass lands in ONE reducer task and serializes the stage (the last
  * task runs ~hot_share × total work while the rest idle).
  *
  * Rewrite: left rows get `salt = pmod(hash(saltSource), nSalts)` (a
  * deterministic column hash, no RNG — engine invariant); right rows are
  * replicated `nSalts`× with every salt value; the join key becomes
  * (key, salt), splitting the hot key across nSalts reducers. Replication
  * cost is right_rows × nSalts — chosen instead of AQE's runtime skew split
  * when the skew is KNOWN ahead of time (AQE's OptimizeSkewedJoin covers the
  * unknown case and cannot help when the hot key sits in one map output
  * block; both are pinned in SkewSpec).
  *
  * Result is row-identical to `left.join(right, leftKey === rightKey)`:
  * every left row keeps exactly one salt, and the matching right row exists
  * at every salt. Verified by SkewSpec (equivalence) and the driver oracle
  * (`j9_skew_join` runs the PLAIN join in DuckDB).
  */
object SkewJoin {

  def saltedInner(left: DataFrame, leftKey: String, saltSource: Column,
      right: DataFrame, rightKey: String, nSalts: Int): DataFrame = {
    require(nSalts > 0)
    // the internal salt column is overwritten-then-dropped — refuse inputs
    // that already carry one rather than silently losing the caller's data
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedInner reserves the __salt column; rename it on the inputs first")
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
    val r = right.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
