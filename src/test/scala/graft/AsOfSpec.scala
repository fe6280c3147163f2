package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** Generic backward as-of join: trades enriched with the latest quote at or
  * before each trade, per symbol, with and without a staleness tolerance. */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "t", "px")

  private val trades = Seq(
    ("A", 5L, 100L),   // before any quote -> null
    ("A", 20L, 101L),  // exactly at a quote -> 2.0 (<= semantics)
    ("A", 25L, 102L),  // between -> 2.0
    ("A", 99L, 103L),  // long after -> 3.0 (unbounded lookback)
    ("B", 16L, 104L),  // -> 9.0
    ("C", 50L, 105L)   // key with no quotes -> null
  ).toDF("sym", "t", "qty")

  test("backward as-of join picks the latest right row at or before left time") {
    val out = AsOf.joinBackward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .collect().map(r => r.getAs[Long]("qty") ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double])).toMap
    assert(out(100L).isEmpty)
    assert(out(101L).contains(2.0))
    assert(out(102L).contains(2.0))
    assert(out(103L).contains(3.0))
    assert(out(104L).contains(9.0))
    assert(out(105L).isEmpty)
    // left row count is preserved exactly (enrichment, not a filter)
    assert(AsOf.joinBackward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .count() == trades.count())
  }

  test("tolerance nulls out stale matches") {
    val out = AsOf.joinBackward(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
      tolerance = Some(10L))
      .collect().map(r => r.getAs[Long]("qty") ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double])).toMap
    assert(out(102L).contains(2.0), "within tolerance (25-20=5)")
    assert(out(103L).isEmpty, "stale (99-30=69 > 10) must be null")
  }

  test("tied right rows resolve by value hash, independent of input order") {
    // two quotes for the same (sym, t) with different values: which one is
    // attached must be a pure function of the data — identical across input
    // orderings and partitionings
    val dup1 = Seq(("A", 10L, 1.0), ("A", 10L, 2.0)).toDF("sym", "t", "px")
    val dup2 = Seq(("A", 10L, 2.0), ("A", 10L, 1.0)).toDF("sym", "t", "px")
      .repartition(3)
    val tr = Seq(("A", 11L, 1L)).toDF("sym", "t", "qty")
    def pick(q: org.apache.spark.sql.DataFrame): Double =
      AsOf.joinBackward(tr, q, Seq("sym"), "t", "t", Seq("px"))
        .collect().head.getAs[Double]("px")
    assert(pick(dup1) == pick(dup2))
  }

  test("q48 equals the generic operator instantiated on events") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .withColumn("tsec", expr("ts DIV 1000000000"))
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", ($"tsec" * 1000000L + $"event_id").as("tt"),
        $"value".as("last_signup_value"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value",
        ($"tsec" * 1000000L + $"event_id").as("tt"))
    val generic = AsOf.joinBackward(purchases, signups, Seq("user_id"),
      "tt", "tt", Seq("last_signup_value"))
      .select($"event_id", $"user_id", $"value", $"last_signup_value")
      .orderBy($"event_id")
    val q48 = SparkEntry.queries("q48_asof_join")(spark, sf)
    assert(generic.collect().toSeq == q48.collect().toSeq)
  }
}
