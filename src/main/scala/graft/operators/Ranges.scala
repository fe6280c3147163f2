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

  /** Buckets an interval covers at `bucketWidth` granularity. */
  private def spanBuckets(loCol: String, hiCol: String, bucketWidth: Long) =
    expr(s"($hiCol - 1) div $bucketWidth - ($loCol div $bucketWidth) + 1")

  /** Join `points` to every interval of `intervals` containing them
    * (lo ≤ p < hi) via fixed-width bucket decomposition: each point lands in
    * exactly one bucket of `bucketWidth`, each interval explodes to the
    * buckets it covers, and the pair meets in the point's bucket — exactly
    * once, so no post-join dedup. Output: point columns + interval columns
    * (names must be disjoint across the two inputs; alias before calling).
    *
    * Plan: the bucket id is a genuine equi-join key — both sides shuffle
    * (or the small side broadcasts) on it, never a nested-loop pairing, so
    * the join scales to two LARGE inputs. The interval side is replicated
    * ×(span/bucketWidth): pick `bucketWidth` near the median interval
    * length (≈1 extra row per interval); empty intervals (hi ≤ lo) drop.
    * Point-side bucket skew (a hot time window) is AQE-splittable since the
    * exact range predicate rides ON the equi-join as a join condition.
    *
    * Degenerate-interval guard: an interval spanning more than
    * `maxBucketsPerInterval` buckets (a null-ish sentinel hi, a
    * domain-spanning outlier) would silently explode to span/bucketWidth
    * rows; instead such intervals route through a BROADCAST residual join
    * on the raw range predicate. With `bucketWidth` near the median length
    * they are outliers by definition — broadcast-small; if a large
    * fraction of intervals lands in the residual, the bucketWidth is wrong
    * for the data, so widen it. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 256): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "alias point/interval columns to distinct names before the range join")
    val live = intervals.filter(col(hiCol) > col(loCol))
    val span = spanBuckets(loCol, hiCol, bucketWidth)
    val inRange = col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    val p = points.withColumn("__b", expr(s"$pointCol div $bucketWidth"))
    val iv = live.filter(span <= maxBucketsPerInterval)
      .withColumn("__b",
        explode(expr(s"sequence($loCol div $bucketWidth, ($hiCol - 1) div $bucketWidth)")))
    val bucketed = p.join(iv, p("__b") === iv("__b") && inRange).drop("__b")
    // an interval is wide XOR narrow, so each (point, interval) pair is
    // emitted by exactly one path — the exactly-once contract holds
    val residual = points.join(
      broadcast(live.filter(span > maxBucketsPerInterval)), inRange)
    bucketed.unionByName(residual)
  }

  /** Join two interval relations on overlap (aLo < bHi ∧ bLo < aHi) via the
    * same bucket decomposition. Both sides explode to their covered buckets,
    * so an overlapping pair shares EVERY bucket in the intersection of its
    * ranges — the join keeps only the FIRST shared bucket
    * (max of the two start buckets), so each pair emits exactly once with
    * no dedup pass. Column names must be disjoint across the two inputs
    * (alias before calling); `extraKeys` adds (left, right) equality pairs
    * that Catalyst folds into the hash-join key alongside the bucket — use
    * them to bound candidates when a natural partition key exists.
    *
    * Plan: a genuine equi-join on (bucket [, extraKeys…]) — shuffled or
    * broadcast like any other, never a nested loop. Each side is
    * replicated ×(span/bucketWidth); pick the width near the median
    * interval length.
    *
    * Degenerate-interval guard (same contract as [[pointInInterval]]):
    * intervals spanning more than `maxBucketsPerInterval` buckets on
    * EITHER side skip the explode and pair through a broadcast residual
    * join on the raw overlap predicate. The pair space partitions as
    * (wide-left × all) ∪ (narrow-left × wide-right) ∪ (narrow × narrow via
    * buckets), so each overlapping pair still emits exactly once. Wide
    * intervals must be outliers (broadcast-small) — if many are wide,
    * widen `bucketWidth` instead. */
  def intervalOverlap(left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      bucketWidth: Long, extraKeys: Seq[(String, String)] = Nil,
      maxBucketsPerInterval: Int = 256): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "alias left/right columns to distinct names before the overlap join")
    val lLive = left.filter(col(leftHi) > col(leftLo))
    val rLive = right.filter(col(rightHi) > col(rightLo))
    val lSpan = spanBuckets(leftLo, leftHi, bucketWidth)
    val rSpan = spanBuckets(rightLo, rightHi, bucketWidth)
    val overlaps = col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi)
    val withKeys = extraKeys.foldLeft(overlaps) {
      case (c, (a, b)) => c && col(a) === col(b) }
    val l = lLive.filter(lSpan <= maxBucketsPerInterval).withColumn("__bl",
      explode(expr(s"sequence($leftLo div $bucketWidth, ($leftHi - 1) div $bucketWidth)")))
    val r = rLive.filter(rSpan <= maxBucketsPerInterval).withColumn("__br",
      explode(expr(s"sequence($rightLo div $bucketWidth, ($rightHi - 1) div $bucketWidth)")))
    // narrow × narrow meet in the FIRST shared bucket — exactly once
    val bucketed = l.join(r, withKeys && col("__bl") === col("__br") &&
        col("__bl") === greatest(
          expr(s"$leftLo div $bucketWidth"), expr(s"$rightLo div $bucketWidth")))
      .drop("__bl", "__br")
    // wide-left pairs with EVERYTHING on the right; narrow-left with
    // wide-right — together with the bucket path this partitions the pair
    // space, so no pair emits twice and none drops
    val wideLeftPairs = rLive.join(
      broadcast(lLive.filter(lSpan > maxBucketsPerInterval)), withKeys)
    val wideRightPairs = lLive.filter(lSpan <= maxBucketsPerInterval).join(
      broadcast(rLive.filter(rSpan > maxBucketsPerInterval)), withKeys)
    bucketed.unionByName(wideLeftPairs).unionByName(wideRightPairs)
  }

  // q75 — overlapping order service windows per customer: each order opens
  // a 90-day window from its order date; count pairs of the SAME customer's
  // orders whose windows overlap (an interval-overlap self-join; the
  // customer key rides the bucket hash join as an extra equi key). Exact
  // integer epoch days.
  private def q75(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def win(p: String) = Tables.orders(s, d).select(
        $"o_orderkey".as(s"${p}_key"), $"o_custkey".as(s"${p}_cust"),
        datediff(to_date($"o_orderdate"), lit("1970-01-01")).cast("long").as(s"${p}_lo"))
      .withColumn(s"${p}_hi", col(s"${p}_lo") + 90L)
    intervalOverlap(win("a"), "a_lo", "a_hi", win("b"), "b_lo", "b_hi",
        bucketWidth = 90L, extraKeys = Seq(("a_cust", "b_cust")))
      .filter($"a_key" < $"b_key")
      .groupBy($"a_cust".as("custkey"))
      .agg(count(lit(1)).as("n_overlap_pairs"))
      .orderBy($"custkey")
  }
  private val q75Sql =
    """WITH w AS (SELECT o_orderkey AS k, o_custkey AS c,
      |                  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo
      |           FROM orders)
      |SELECT a.c AS custkey, COUNT(*) AS n_overlap_pairs
      |FROM w a JOIN w b ON a.c = b.c AND a.k < b.k
      |  AND a.lo < b.lo + 90 AND b.lo < a.lo + 90
      |GROUP BY 1 ORDER BY custkey""".stripMargin

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

  /** Concurrency step-curve over an integer-tick interval relation
    * [lo, hi): how many intervals are open at each tick where the count
    * CHANGES — the open-orders / concurrent-sessions / usage-metering
    * curve. Between change points the count is constant, so the step
    * representation is lossless and needs no gap fill.
    *
    * Scale: delta decomposition — each interval emits exactly two rows
    * (+1 at lo, −1 at hi) regardless of span (never an explode), deltas
    * collapse in a combiner aggregate to ≤ #distinct-ticks rows, and the
    * running sum is ONE global window over that bounded change-point
    * frame (ticks are calendar-grain in practice — days/hours — so the
    * frame is bounded by the calendar, not the data; re-bucket upstream
    * if your ticks are event-grain). Output: (tick, open), delta ≠ 0
    * rows only, empty intervals (hi ≤ lo) dropped. */
  def concurrency(intervals: DataFrame, loCol: String,
      hiCol: String): DataFrame = {
    val live = intervals.filter(col(hiCol) > col(loCol))
    val deltas = live.select(col(loCol).cast("long").as("tick"), lit(1L).as("d"))
      .unionAll(live.select(col(hiCol).cast("long").as("tick"), lit(-1L).as("d")))
      .groupBy(col("tick")).agg(sum(col("d")).as("delta"))
      .filter(col("delta") =!= 0)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("tick"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    deltas.withColumn("open", sum(col("delta")).over(w))
      .select(col("tick"), col("delta"), col("open"))
  }

  // q219 — open orders per day: each order is open from its order day
  // until its last shipment day (exclusive bound = last ship day + 1);
  // the step curve counts concurrently open orders at every change day.
  // Day ticks are exact integer day-diffs from the epoch on both engines.
  private def q219(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val epoch = lit("1970-01-01").cast(org.apache.spark.sql.types.DateType)
    val lastShip = Tables.lineitem(s, d)
      .groupBy($"l_orderkey").agg(max($"l_shipdate").as("last_ship"))
    val iv = Tables.orders(s, d)
      .join(lastShip, $"o_orderkey" === $"l_orderkey")
      .select(datediff($"o_orderdate".cast(org.apache.spark.sql.types.DateType), epoch).as("lo"),
        (datediff($"last_ship".cast(org.apache.spark.sql.types.DateType), epoch) + 1).as("hi"))
    concurrency(iv, "lo", "hi").orderBy($"tick")
  }
  private val q219Sql =
    """WITH iv AS (
      |  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS lo,
      |    CAST(MAX(l_shipdate) AS DATE) - DATE '1970-01-01' + 1 AS hi
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY o_orderkey, o_orderdate),
      |deltas AS (
      |  SELECT tick, CAST(SUM(d) AS BIGINT) AS delta FROM (
      |    SELECT lo AS tick, 1 AS d FROM iv WHERE hi > lo
      |    UNION ALL
      |    SELECT hi AS tick, -1 AS d FROM iv WHERE hi > lo)
      |  GROUP BY tick HAVING SUM(d) <> 0)
      |SELECT CAST(tick AS BIGINT) AS tick, delta,
      |  CAST(SUM(delta) OVER (ORDER BY tick
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open
      |FROM deltas ORDER BY tick""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_range_join" -> q74,
    "q75_interval_overlap" -> q75,
    "q219_open_orders_curve" -> q219,
  )

  val oracles: Map[String, String] = Map(
    "q74_range_join" -> q74Sql,
    "q75_interval_overlap" -> q75Sql,
    "q219_open_orders_curve" -> q219Sql,
  )
}
