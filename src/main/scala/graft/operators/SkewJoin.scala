package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew (100-TB escape hatch when
  * AQE's skew-join split isn't enough — e.g. one key holding >10% of a
  * fact table):
  *
  *  - the skewed (large) side gets a pseudo-random salt in [0, salts);
  *  - the dim side is exploded `salts`× so every (key, salt) partition
  *    finds its match;
  *  - join on (key, salt) spreads the hot key over `salts` reducers.
  *
  * The salt uses a hash of a per-row id, so rows of the hot key scatter
  * uniformly; correctness is unaffected (every large-side row still meets
  * every dim row of its key exactly once).
  */
object SkewJoin {

  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = "__graft_salt"
    val s = skewed.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val d = dim.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    s.join(d, Seq(key, saltCol)).drop(saltCol)
  }
}
