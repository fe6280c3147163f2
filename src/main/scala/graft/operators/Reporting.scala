package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Ops._

/** Realistic reporting workloads (TPC-H Q3/Q5/Q10 shapes) — the multi-join
  * analytics a deployment of the reference actually serves through its Spark
  * connector. These are the headline BENCH queries for join planning: facts
  * shuffle on join keys, dims broadcast, AQE re-plans at runtime.
  */
object Reporting {

  // q43 — shipping priority (TPC-H Q3 shape): segment-filtered 3-way join,
  // revenue per order, top 10.
  private def q43(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1997-06-01").cast(TimestampType)
    val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, d).filter($"o_orderdate" < cutoff)
    val li = Tables.lineitem(s, d).filter($"l_shipdate" > cutoff)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // scaling dim: AQE decides
      .groupBy($"o_orderkey", $"o_orderdate".cast(DateType).cast(StringType).as("order_day"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey".asc)
      .limit(10)
  }
  private val q43Sql =
    s"""SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day,
       | ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
       |GROUP BY o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
       |ORDER BY revenue DESC, o_orderkey ASC
       |LIMIT 10""".stripMargin

  // q44 — local supplier volume (TPC-H Q5 shape): 6-way join with the
  // customer-nation = supplier-nation colocation condition.
  private def q44(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r = Tables.region(s, d).filter($"r_name" === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val su = Tables.supplier(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // scaling dim: AQE decides
      .join(su, // scaling dim: AQE decides
        li("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"revenue".desc, $"n_name".asc)
  }
  private val q44Sql =
    s"""SELECT n_name,
       | ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       | COUNT(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name ASC""".stripMargin

  // q45 — returned-item reporting (TPC-H Q10 shape): top 20 customers by
  // lost revenue on returned lines.
  private def q45(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // push the aggregation below the joins: collapse lineitem to one exact
    // decimal revenue row per orderkey BEFORE joining (shrinks the join
    // input ~4× here, orders of magnitude at 100 TB), then re-sum per
    // customer — decimal sums re-aggregate exactly, so the result is
    // identical to aggregating after the join.
    val perOrder = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
      .groupBy($"l_orderkey")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast(DecimalType(30, 6))).as("order_rev"))
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    perOrder.join(o, $"l_orderkey" === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // scaling dim: AQE decides
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(sum($"order_rev").cast(DoubleType).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey".asc)
      .limit(20)
  }
  private val q45Sql =
    s"""SELECT c_custkey, c_name, n_name,
       | ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  // q50 — large-volume orders (TPC-H Q18 shape): aggregate-then-join. The
  // lineitem rollup runs FIRST (one shuffle on l_orderkey, heavy side shrinks
  // ~4× here, ~#lines/#orders at scale) and only qualifying orders join out
  // to orders/customer — the aggregate-pushdown pattern q45 uses, with the
  // HAVING acting as the join's semi-filter.
  private def q50(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 250.0)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    big.join(o, $"l_orderkey" === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // scaling dim: AQE decides
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(20)
  }
  private val q50Sql =
    s"""SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
       |FROM (SELECT l_orderkey, ${dsumSql("l_quantity")} AS sum_qty
       |      FROM lineitem GROUP BY l_orderkey
       |      HAVING ${dsumSql("l_quantity")} > 250.0) big
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey ASC
       |LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_tpch3_shipping_priority" -> q43,
    "q44_tpch5_local_volume" -> q44,
    "q45_tpch10_returns" -> q45,
    "q50_tpch18_big_orders" -> q50,
  )

  val oracles: Map[String, String] = Map(
    "q43_tpch3_shipping_priority" -> q43Sql,
    "q44_tpch5_local_volume" -> q44Sql,
    "q45_tpch10_returns" -> q45Sql,
    "q50_tpch18_big_orders" -> q50Sql,
  )
}
