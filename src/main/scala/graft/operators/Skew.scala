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

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    val saltedL = skewed.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val saltedR = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedL.join(saltedR, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
