package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (point-in-interval) join — the join shape with NO equality key,
  * which Spark would otherwise plan as BroadcastNestedLoopJoin (fine for a
  * tiny interval side, quadratic death when both sides are large). The
  * reference delegates all join shapes to external engines (SURVEY.md §2.A);
  * we expose the scalable decomposition natively.
  *
  * Composition tier (a) of the custom-op ladder: fixed-width bucketing turns
  * the inequality pair into a derived equi-join key that Catalyst shuffles,
  * broadcasts, and AQE-optimizes like any other — no custom plan needed.
  */
object Ranges {

  /** Join `points` to every interval of `intervals` containing them
    * (lo ≤ p < hi) via fixed-width bucket decomposition: each point lands in
    * exactly one bucket of `bucketWidth`, each interval explodes to the
    * buckets it covers, and the pair meets in the point's bucket — exactly
    * once, so no post-join dedup. Output: point columns + interval columns.
    *
    * Plan: the bucket id is a genuine equi-join key — both sides shuffle
    * (or the small side broadcasts) on it, never a nested-loop pairing, so
    * the join scales to two LARGE inputs. The interval side is replicated
    * ×(span/bucketWidth): pick `bucketWidth` near the median interval
    * length (≈1 extra row per interval); empty intervals (hi ≤ lo) drop.
    * Point-side bucket skew (a hot time window) is AQE-splittable since the
    * exact range predicate rides ON the equi-join as a join condition. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__b", expr(s"$pointCol div $bucketWidth"))
    val iv = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__b",
        explode(expr(s"sequence($loCol div $bucketWidth, ($hiCol - 1) div $bucketWidth)")))
    p.join(iv, p("__b") === iv("__b")
        && col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__b")
  }

  // q74 — attribution windows: count events (and distinct users) falling in
  // each of 20 deterministic 12-hour campaign windows spaced 36 h apart
  // from 2024-01-01 (epoch 1704067200) — a pure point-in-interval join, no
  // equality key, exact integer seconds.
  private def q74(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val windows = (0 until 20).map { i =>
      val lo = 1704067200L + i * 129600L
      (i, lo, lo + 43200L)
    }.toDF("window_id", "lo", "hi")
    val ev = Tables.events(s, d).select(expr("ts DIV 1000000000").as("sec"), $"user_id")
    pointInInterval(ev, "sec", windows, "lo", "hi", bucketWidth = 43200L)
      .groupBy($"window_id")
      .agg(count(lit(1)).as("n_events"), countDistinct($"user_id").as("n_users"))
      .orderBy($"window_id")
  }
  private val q74Sql =
    """WITH w AS (SELECT CAST(i AS INTEGER) AS window_id,
      |                  1704067200 + i * 129600 AS lo,
      |                  1704067200 + i * 129600 + 43200 AS hi
      |           FROM unnest(range(0, 20)) t(i)),
      |e AS (SELECT epoch_ns(ts) // 1000000000 AS sec, user_id FROM events)
      |SELECT window_id, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
      |FROM w JOIN e ON sec >= lo AND sec < hi
      |GROUP BY 1 ORDER BY window_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_range_join" -> q74,
  )

  val oracles: Map[String, String] = Map(
    "q74_range_join" -> q74Sql,
  )
}
