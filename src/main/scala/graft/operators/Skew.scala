package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for 100 TB joins: AQE's skew-join split covers sort-merge
  * joins automatically (enabled in our sessions); this helper provides
  * explicit key salting for the cases AQE can't re-plan — e.g. a skewed
  * large⋈medium join where the medium side is too big to broadcast but
  * cheap to replicate `salt` times.
  *
  * Mechanics: the skewed (large) side gets a random salt in [0, salt); the
  * other side is exploded once per salt value; the join key becomes
  * (key, salt), spreading each hot key over `salt` reducers.
  */
object Skew {

  /** Join types where replicating `other` is semantics-preserving: the
    * skewed (left) side carries ONE salt per row, so inner/left variants
    * see each left row at most once. Right/full outer would emit `salt`
    * null-extended copies of every unmatched replicated-side row, and
    * semi/anti with the sides swapped would be equally wrong. */
  private val SafeJoinTypes = Set(
    "inner", "cross", "left", "leftouter", "leftsemi", "leftanti")

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replaceAll("[_ ]", "")
    require(SafeJoinTypes.contains(jt),
      s"saltedJoin supports inner/left join types only (got '$joinType'): " +
        "the replicated side duplicates unmatched rows under right/full outer")
    val saltedL = skewed.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val saltedR = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedL.join(saltedR, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
