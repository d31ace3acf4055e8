package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting. AQE's skew-join handles
  * most runtime skew; salting is the explicit fallback when one key
  * dominates so heavily that even split shuffle blocks overwhelm a task
  * (the classic power-law key at 100 TB).
  */
object Skew {

  /** Inner equi-join with the large side scattered across `salt` buckets
    * and the small side replicated `salt` times, so one hot key spreads
    * over `salt` tasks instead of one. Result equals
    * `large.join(small, key)` exactly.
    *
    * The scatter uses a deterministic hash of the large side's whole row
    * (so no row-id column is required); replication multiplies the small
    * side by `salt`, which is why this composes with broadcast for truly
    * small dimensions (broadcast already avoids the shuffle entirely —
    * salt only when the small side is too big to broadcast AND keys are
    * skewed).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    val scatter = pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(salt))
    val saltedLarge = large.withColumn("_salt", scatter)
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
