package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // q147 — nation-pair trade volume (TPC-H Q7 shape): revenue shipped
  // between two nations per direction per year. The two nation dims are
  // broadcast; the fact side shuffles once for the join chain and once for
  // the (supp, cust, year) aggregate.
  private def q147(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1998-01-01").cast(TimestampType))
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val su = Tables.supplier(s, d)
    val n1 = Tables.nation(s, d).select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(s, d).select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // scaling dim: AQE decides
      .join(su, li("l_suppkey") === su("s_suppkey")) // scaling dim: AQE decides
      .join(broadcast(n1), $"s_nationkey" === $"sk")
      .join(broadcast(n2), $"c_nationkey" === $"ck")
      .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
        ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }
  private val q147Sql =
    s"""SELECT supp_nation, cust_nation, l_year,
       | ${dsumSql("volume")} AS revenue
       |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |        EXTRACT(year FROM l_shipdate) AS l_year,
       |        l_extendedprice * (1.0 - l_discount) AS volume
       |      FROM lineitem
       |      JOIN orders ON l_orderkey = o_orderkey
       |      JOIN customer ON o_custkey = c_custkey
       |      JOIN supplier ON l_suppkey = s_suppkey
       |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))) t
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // q148 — national market share (TPC-H Q8 shape): NATION_2's share of
  // LARGE-part revenue sold to ASIA customers, per order year. Numerator and
  // denominator are both exact decimal sums; the share is one final IEEE
  // division, identical in any engine.
  private def q148(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d).filter($"p_type" === "LARGE")
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val su = Tables.supplier(s, d)
    val n1 = Tables.nation(s, d).select($"n_nationkey".as("ck"), $"n_regionkey")
    val r = Tables.region(s, d).filter($"r_name" === "ASIA")
    val n2 = Tables.nation(s, d).select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val D = DecimalType(30, 6)
    val vol = ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(D)
    li.join(p, li("l_partkey") === p("p_partkey")) // scaling dim: AQE decides
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // scaling dim: AQE decides
      .join(broadcast(n1), $"c_nationkey" === $"ck")
      .join(broadcast(r), $"n_regionkey" === r("r_regionkey"))
      .join(su, li("l_suppkey") === su("s_suppkey")) // scaling dim: AQE decides
      .join(broadcast(n2), $"s_nationkey" === $"sk")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg((sum(when($"supp_nation" === "NATION_2", vol).otherwise(lit(0).cast(D)))
        .cast(DoubleType) / sum(vol).cast(DoubleType)).as("mkt_share"))
      .orderBy($"o_year")
  }
  private val q148Sql =
    s"""SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       | CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
       |     THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))
       |     ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
       |   / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
       |   AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN region ON n1.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |WHERE p_type = 'LARGE' AND r_name = 'ASIA'
       |GROUP BY EXTRACT(year FROM o_orderdate)
       |ORDER BY o_year""".stripMargin

  // q149 — late-shipment accounting (TPC-H Q12 shape, adapted: the testdata
  // has no commit/receipt dates or ship modes, so "late" = shipped more than
  // 90 days after the order date, bucketed by ship year and order-priority
  // class). One join + one conditional aggregate.
  private def q149(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(datediff($"l_shipdate", $"o_orderdate") > 90)
      .groupBy(year($"l_shipdate").as("ship_year"))
      .agg(
        sum(when($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH", 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority" =!= "1-URGENT" && $"o_orderpriority" =!= "2-HIGH", 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy($"ship_year")
  }
  private val q149Sql =
    """SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE date_diff('day', o_orderdate, l_shipdate) > 90
      |GROUP BY EXTRACT(year FROM l_shipdate)
      |ORDER BY ship_year""".stripMargin

  // q150 — promo revenue share per month (TPC-H Q14 shape): two exact
  // decimal sums over one join, one final division. The month label uses the
  // same yyyy-MM rendering on both engines.
  private def q150(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d)
    val li = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1997-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1998-01-01").cast(TimestampType))
    val D = DecimalType(30, 6)
    val vol = ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(D)
    li.join(p, li("l_partkey") === p("p_partkey")) // scaling dim: AQE decides
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
      .agg((lit(100.0) * sum(when($"p_type" === "PROMO", vol).otherwise(lit(0).cast(D)))
        .cast(DoubleType) / sum(vol).cast(DoubleType)).as("promo_share"))
      .orderBy($"ship_month")
  }
  private val q150Sql =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      | 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |     THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))
      |     ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
      |   / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
      |   AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY strftime(l_shipdate, '%Y-%m')
      |ORDER BY ship_month""".stripMargin

  // q151 — top supplier(s) by quarter revenue (TPC-H Q15 shape): the
  // per-supplier rollup computes once, its 1-row max broadcasts back as the
  // filter — the "CREATE VIEW revenue" pattern without a second scan. The
  // equality compares two doubles produced by the identical decimal→double
  // conversion, so it is exact.
  private def q151(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1996-04-01").cast(TimestampType))
      .groupBy($"l_suppkey".as("supplier_no"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("total_revenue"))
    val top = rev.agg(max($"total_revenue").as("max_rev"))
    val su = Tables.supplier(s, d)
    rev.join(broadcast(top), $"total_revenue" === $"max_rev").drop("max_rev")
      .join(su, $"supplier_no" === su("s_suppkey")) // scaling dim: AQE decides
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }
  private val q151Sql =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM revenue JOIN supplier ON supplier_no = s_suppkey
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // q152 — small-quantity-order revenue (TPC-H Q17 shape): the per-part
  // average joins BACK onto the lines it came from. The avg comparison is
  // cross-multiplied into exact decimal arithmetic (qty * n * 5 < sum_qty
  // ⇔ qty < 0.2 * avg) so no engine-specific division rounding can flip a
  // row; the single division by 7 happens once, on the final total.
  private def q152(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val li = Tables.lineitem(s, d)
    val brand = li.join(Tables.part(s, d).filter($"p_brand" === "Brand#23"),
      li("l_partkey") === $"p_partkey") // scaling dim: AQE decides
    val perPart = brand.groupBy($"l_partkey".as("pk"))
      .agg(sum($"l_quantity".cast(D)).as("sum_qty"), count(lit(1)).as("n_qty"))
    brand.join(perPart, $"l_partkey" === $"pk")
      .filter($"l_quantity".cast(D) * $"n_qty" * lit(5) < $"sum_qty")
      .agg((sum($"l_extendedprice".cast(D)).cast(DoubleType) / lit(7.0)).as("avg_yearly"))
  }
  private val q152Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN (SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(30,6))) AS sum_qty,
      |        COUNT(*) AS n_qty
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE p_brand = 'Brand#23' GROUP BY l_partkey) t ON l_partkey = pk
      |WHERE p_brand = 'Brand#23'
      |  AND CAST(l_quantity AS DECIMAL(30,6)) * n_qty * 5 < sum_qty""".stripMargin

  // q153 — idle wealthy customers (TPC-H Q22 shape): above-average balances
  // with no recent orders. The global average is a 1-row broadcast; the
  // "no orders" test is a left-anti join against the distinct recent
  // custkeys — no correlated subquery ever materializes per row.
  private def q153(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val avgBal = c.filter($"c_acctbal" > 0.0)
      .agg(davg($"c_acctbal").as("avg_bal"))
    val recent = Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1999-07-01").cast(TimestampType))
      .select($"o_custkey").distinct()
    c.join(broadcast(avgBal)).filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_nationkey")
  }
  private val q153Sql =
    s"""SELECT c_nationkey, COUNT(*) AS numcust,
       | ${dsumSql("c_acctbal")} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (SELECT ${davgSql("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
       |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
       |                        WHERE o_orderdate >= TIMESTAMP '1999-07-01 00:00:00')
       |GROUP BY c_nationkey
       |ORDER BY c_nationkey""".stripMargin

  // q154 — priority-queue accounting (TPC-H Q4 shape, adapted: "problem
  // order" = any line shipped more than 60 days after the order date). The
  // EXISTS is a left-semi join — each order emits at most once, no distinct
  // needed, and the probe side carries only the join key.
  private def q154(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1996-07-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1996-10-01").cast(TimestampType))
    val li = Tables.lineitem(s, d)
    val late = o.join(li, o("o_orderkey") === li("l_orderkey") &&
      datediff(li("l_shipdate"), o("o_orderdate")) > 60, "left_semi")
    late.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }
  private val q154Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |              AND date_diff('day', o_orderdate, l_shipdate) > 60)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // q167 — month-over-month revenue growth in exact signed ppm: revenue
  // lands as exact integer cents (decimal sum → integral), the delta is
  // sign·(|cur−prev|·10⁶ DIV prev) — truncation toward zero on BOTH
  // engines (a raw signed DIV would floor in DuckDB and truncate in
  // Spark and disagree on negative deltas). First month → NULL.
  //
  // Scale: one combiner aggregate (→ #months rows); the lag window runs
  // on that bounded frame (#months, not data). Long bound: |Δ|·10⁶ needs
  // cents ≤ ~9·10¹² (~$90B/month); swap to DECIMAL beyond.
  private def q167(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val m = Tables.orders(s, d)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast(D)) * 100).cast(LongType).as("rev_cents"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"month")
    m.withColumn("prev", lag($"rev_cents", 1).over(w))
      .withColumn("mom_ppm",
        when($"prev".isNull, lit(null).cast(LongType))
          .otherwise((when($"rev_cents" < $"prev", -1L).otherwise(1L) *
            expr("CAST(abs(rev_cents - prev) AS DECIMAL(19,0)) * 1000000 DIV prev")).cast(LongType)))
      .select($"month", $"rev_cents", $"mom_ppm")
      .orderBy($"month")
  }
  private val q167Sql =
    """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) * 100 AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |l AS (SELECT month, rev_cents,
      |    lag(rev_cents, 1) OVER (ORDER BY month) AS prev FROM m)
      |SELECT month, rev_cents,
      |  CASE WHEN prev IS NULL THEN NULL
      |    ELSE CAST((CASE WHEN rev_cents < prev THEN -1 ELSE 1 END)
      |      * (abs(rev_cents - prev) * 1000000 // prev) AS BIGINT) END AS mom_ppm
      |FROM l ORDER BY month""".stripMargin

  // q174 — share-of-parent reporting: each nation's slice of its region's
  // order revenue in exact integer ppm. Revenue lands as exact cents; the
  // region totals are a re-aggregate of the #nations-row frame, broadcast
  // back — the hierarchy never touches the fact twice.
  private def q174(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    val byNation = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg((sum($"o_totalprice".cast(D)) * 100).cast(LongType).as("nat_cents"))
    val byRegion = byNation.groupBy($"r_name".as("__r"))
      .agg(sum($"nat_cents").as("reg_cents"))
    byNation.join(broadcast(byRegion), $"r_name" === $"__r")
      .select($"r_name", $"n_name", $"nat_cents",
        expr("CAST(CAST(nat_cents AS DECIMAL(19,0)) * 1000000 DIV reg_cents AS BIGINT)")
          .as("share_ppm"))
      .orderBy($"r_name", $"n_name")
  }
  private val q174Sql =
    """WITH bn AS (SELECT r_name, n_name,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) * 100 AS BIGINT) AS nat_cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |br AS (SELECT r_name, SUM(nat_cents) AS reg_cents FROM bn GROUP BY 1)
      |SELECT bn.r_name, n_name, nat_cents,
      |  CAST(nat_cents * 1000000 // reg_cents AS BIGINT) AS share_ppm
      |FROM bn JOIN br ON bn.r_name = br.r_name
      |ORDER BY bn.r_name, n_name""".stripMargin

  // q181 — fulfillment SLA report: per order priority, the exact-ppm
  // fraction of lines shipped within 30/60/90 days of the order. One
  // join + one conditional aggregate; the thresholds are whole-day
  // integer comparisons on both engines.
  private def q181(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    def within(days: Int) =
      sum(when(datediff($"l_shipdate", $"o_orderdate") <= days, 1L)
        .otherwise(0L))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        within(30).as("w30"), within(60).as("w60"), within(90).as("w90"))
      .select($"o_orderpriority", $"n_lines",
        expr("CAST(CAST(w30 AS DECIMAL(19,0)) * 1000000 DIV n_lines AS BIGINT)").as("within30_ppm"),
        expr("CAST(CAST(w60 AS DECIMAL(19,0)) * 1000000 DIV n_lines AS BIGINT)").as("within60_ppm"),
        expr("CAST(CAST(w90 AS DECIMAL(19,0)) * 1000000 DIV n_lines AS BIGINT)").as("within90_ppm"))
      .orderBy($"o_orderpriority")
  }
  private val q181Sql =
    """WITH j AS (SELECT o_orderpriority,
      |    date_diff('day', o_orderdate, l_shipdate) AS lag
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |a AS (SELECT o_orderpriority, COUNT(*) AS n_lines,
      |    SUM(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS w30,
      |    SUM(CASE WHEN lag <= 60 THEN 1 ELSE 0 END) AS w60,
      |    SUM(CASE WHEN lag <= 90 THEN 1 ELSE 0 END) AS w90
      |  FROM j GROUP BY 1)
      |SELECT o_orderpriority, n_lines,
      |  CAST(w30 * 1000000 // n_lines AS BIGINT) AS within30_ppm,
      |  CAST(w60 * 1000000 // n_lines AS BIGINT) AS within60_ppm,
      |  CAST(w90 * 1000000 // n_lines AS BIGINT) AS within90_ppm
      |FROM a ORDER BY o_orderpriority""".stripMargin

  // q186 — RFM segmentation: recency / frequency / monetary buckets per
  // customer (fixed engine-portable thresholds — whole-day and exact-cent
  // integer comparisons), rolled up to segment counts. One aggregate to
  // per-customer stats, one 1-row broadcast for "today" (the data's max
  // order date), map-only bucketing, one rollup.
  private def q186(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val o = Tables.orders(s, d)
    val per = o.groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last_order"),
        count(lit(1)).as("f"),
        (sum($"o_totalprice".cast(D)) * 100).cast(LongType).as("m_cents"))
    val today = o.agg(max($"o_orderdate").as("today"))
    per.join(broadcast(today))
      .withColumn("r_days", datediff($"today", $"last_order"))
      .select(
        when($"r_days" <= 180, "active").when($"r_days" <= 365, "cooling")
          .otherwise("dormant").as("r_seg"),
        when($"f" >= 12, "frequent").when($"f" >= 6, "regular")
          .otherwise("rare").as("f_seg"),
        when($"m_cents" >= 40000000000L / 100, "high")
          .when($"m_cents" >= 15000000000L / 100, "mid")
          .otherwise("low").as("m_seg"))
      .groupBy($"r_seg", $"f_seg", $"m_seg")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"r_seg", $"f_seg", $"m_seg")
  }
  private val q186Sql =
    """WITH per AS (SELECT o_custkey, MAX(o_orderdate) AS last_order,
      |    COUNT(*) AS f,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) * 100 AS BIGINT) AS m_cents
      |  FROM orders GROUP BY 1),
      |t AS (SELECT MAX(o_orderdate) AS today FROM orders),
      |seg AS (SELECT
      |    CASE WHEN date_diff('day', last_order, today) <= 180 THEN 'active'
      |         WHEN date_diff('day', last_order, today) <= 365 THEN 'cooling'
      |         ELSE 'dormant' END AS r_seg,
      |    CASE WHEN f >= 12 THEN 'frequent' WHEN f >= 6 THEN 'regular'
      |         ELSE 'rare' END AS f_seg,
      |    CASE WHEN m_cents >= 400000000 THEN 'high'
      |         WHEN m_cents >= 150000000 THEN 'mid' ELSE 'low' END AS m_seg
      |  FROM per CROSS JOIN t)
      |SELECT r_seg, f_seg, m_seg, COUNT(*) AS n_customers
      |FROM seg GROUP BY 1, 2, 3 ORDER BY r_seg, f_seg, m_seg""".stripMargin

  // q187 — new-vs-repeat revenue split per month: each order classified
  // by whether its month is the customer's FIRST order month. One
  // aggregate to per-customer first months, one join-back, one rollup —
  // exact cents and ppm.
  private def q187(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val o = Tables.orders(s, d)
      .withColumn("month", date_format($"o_orderdate", "yyyy-MM"))
    val firstMonth = o.groupBy($"o_custkey".as("__ck"))
      .agg(min($"month").as("first_month"))
    o.join(firstMonth, $"o_custkey" === $"__ck")
      .groupBy($"month")
      .agg(
        (sum(when($"month" === $"first_month", $"o_totalprice".cast(D))
          .otherwise(lit(0).cast(D))) * 100).cast(LongType).as("new_cents"),
        (sum(when($"month" =!= $"first_month", $"o_totalprice".cast(D))
          .otherwise(lit(0).cast(D))) * 100).cast(LongType).as("repeat_cents"))
      .withColumn("new_share_ppm",
        expr("CAST(CAST(new_cents AS DECIMAL(19,0)) * 1000000 DIV (new_cents + repeat_cents) AS BIGINT)")
          .cast(LongType))
      .orderBy($"month")
  }
  private val q187Sql =
    """WITH o AS (SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month,
      |    o_totalprice FROM orders),
      |fm AS (SELECT o_custkey, MIN(month) AS first_month FROM o GROUP BY 1),
      |a AS (SELECT month,
      |    CAST(SUM(CASE WHEN month = first_month
      |      THEN CAST(o_totalprice AS DECIMAL(30,6))
      |      ELSE CAST(0 AS DECIMAL(30,6)) END) * 100 AS BIGINT) AS new_cents,
      |    CAST(SUM(CASE WHEN month <> first_month
      |      THEN CAST(o_totalprice AS DECIMAL(30,6))
      |      ELSE CAST(0 AS DECIMAL(30,6)) END) * 100 AS BIGINT) AS repeat_cents
      |  FROM o JOIN fm USING (o_custkey) GROUP BY 1)
      |SELECT month, new_cents, repeat_cents,
      |  CAST(new_cents * 1000000 // (new_cents + repeat_cents) AS BIGINT)
      |    AS new_share_ppm
      |FROM a ORDER BY month""".stripMargin

  // q188 — tail-latency SLA: exact p50/p95/p99 ship lag (whole days) per
  // order priority — the percentile complement of q181's threshold view.
  // Shared linear-interpolation percentile (q46 pattern) over integer
  // day lags.
  private def q188(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .withColumn("lag", datediff($"l_shipdate", $"o_orderdate").cast(LongType))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        expr("percentile(lag, 0.5)").as("p50_days"),
        expr("percentile(lag, 0.95)").as("p95_days"),
        expr("percentile(lag, 0.99)").as("p99_days"))
      .orderBy($"o_orderpriority")
  }
  private val q188Sql =
    """WITH j AS (SELECT o_orderpriority,
      |    CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  quantile_cont(lag, 0.5) AS p50_days,
      |  quantile_cont(lag, 0.95) AS p95_days,
      |  quantile_cont(lag, 0.99) AS p99_days
      |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // q189 — inter-purchase cadence: per customer the gaps between
  // consecutive orders (entity-keyed lead window), then the exact global
  // gap percentiles — "median days between orders", the reorder-cycle
  // metric.
  private def q189(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("nxt", lead($"o_orderdate", 1).over(w))
      .filter($"nxt".isNotNull)
      .withColumn("gap", datediff($"nxt", $"o_orderdate").cast(LongType))
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap, 0.25)").as("p25_days"),
        expr("percentile(gap, 0.5)").as("p50_days"),
        expr("percentile(gap, 0.75)").as("p75_days"))
  }
  private val q189Sql =
    """WITH g AS (SELECT
      |    CAST(date_diff('day', o_orderdate,
      |      lead(o_orderdate) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey)) AS BIGINT) AS gap
      |  FROM orders)
      |SELECT COUNT(*) AS n_gaps,
      |  quantile_cont(gap, 0.25) AS p25_days,
      |  quantile_cont(gap, 0.5) AS p50_days,
      |  quantile_cont(gap, 0.75) AS p75_days
      |FROM g WHERE gap IS NOT NULL""".stripMargin

  // q190 — cohort LTV curve: cumulative revenue per signup cohort (first
  // order month) by months-since-first — the growth-accounting table.
  // One aggregate to (cohort, age) cells; the cum-window runs per cohort
  // over ≤ #months rows (calendar-bounded, not data-bounded).
  private def q190(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val o = Tables.orders(s, d)
      .withColumn("ym", (year($"o_orderdate") * 12 + month($"o_orderdate"))
        .cast(LongType))
    val first = o.groupBy($"o_custkey".as("__ck")).agg(min($"ym").as("cohort_ym"))
    val cells = o.join(first, $"o_custkey" === $"__ck")
      .withColumn("age_months", ($"ym" - $"cohort_ym").cast(LongType))
      .groupBy($"cohort_ym", $"age_months")
      .agg((sum($"o_totalprice".cast(D)) * 100).cast(LongType).as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cohort_ym").orderBy($"age_months")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cells.withColumn("cum_cents", sum($"cents").over(w))
      .orderBy($"cohort_ym", $"age_months")
  }
  private val q190Sql =
    """WITH o AS (SELECT o_custkey,
      |    EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate) AS ym,
      |    o_totalprice FROM orders),
      |fm AS (SELECT o_custkey, MIN(ym) AS cohort_ym FROM o GROUP BY 1),
      |cells AS (SELECT cohort_ym, ym - cohort_ym AS age_months,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) * 100 AS BIGINT) AS cents
      |  FROM o JOIN fm USING (o_custkey) GROUP BY 1, 2)
      |SELECT cohort_ym, age_months, cents,
      |  CAST(SUM(cents) OVER (PARTITION BY cohort_ym ORDER BY age_months
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |FROM cells ORDER BY cohort_ym, age_months""".stripMargin

  // q194 — right-to-be-forgotten cascade audit: for a deletion request
  // set (customers with custkey ≡ 0 mod 97 here; a real run passes the
  // request table), how many rows each table in the FK cascade
  // customer → orders → lineitem would purge. Every hop is a left-semi
  // join carrying only keys — the probe the purge job itself would run,
  // with counts instead of deletes.
  private def q194(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val victims = Tables.customer(s, d)
      .filter($"c_custkey" % 97 === 0).select($"c_custkey")
    val custN = victims.agg(count(lit(1)).as("n_purged"))
      .withColumn("table_name", lit("customer"))
    val orders = Tables.orders(s, d)
      .join(victims, $"o_custkey" === $"c_custkey", "left_semi")
    val orderN = orders.agg(count(lit(1)).as("n_purged"))
      .withColumn("table_name", lit("orders"))
    val lineN = Tables.lineitem(s, d)
      .join(orders.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey",
        "left_semi")
      .agg(count(lit(1)).as("n_purged"))
      .withColumn("table_name", lit("lineitem"))
    custN.unionByName(orderN).unionByName(lineN)
      .select($"table_name", $"n_purged")
      .orderBy($"table_name")
  }
  private val q194Sql =
    """WITH v AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |o AS (SELECT o_orderkey FROM orders
      |  WHERE EXISTS (SELECT 1 FROM v WHERE v.c_custkey = o_custkey))
      |SELECT 'customer' AS table_name, COUNT(*) AS n_purged FROM v
      |UNION ALL
      |SELECT 'orders', COUNT(*) FROM o
      |UNION ALL
      |SELECT 'lineitem', COUNT(*) FROM lineitem
      |  WHERE EXISTS (SELECT 1 FROM o WHERE o.o_orderkey = l_orderkey)
      |ORDER BY table_name""".stripMargin

  // q201 — forecast revenue change (TPC-H Q6): the canonical scan-filter-
  // aggregate. Every predicate reaches the parquet scan as a pushed filter
  // (PushedFilters on l_shipdate/l_discount/l_quantity), the projection
  // prunes to three columns, and the 1-row aggregate is a map-side combine
  // — at 100 TB this query is I/O-bound on exactly the bytes it needs.
  private def q201(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1997-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1998-01-01").cast(TimestampType) &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24.0)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"))
  }
  private val q201Sql =
    s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // q202 — min-cost supplier per part (TPC-H Q2 shape, adapted: the
  // testdata has no partsupp, so supply cost = the minimum unit price
  // (l_extendedprice / l_quantity) the supplier ever charged for the part).
  // The per-(part,supplier) rollup is one combiner aggregate; the per-part
  // min joins back on exact-equal doubles (both sides minimize over the
  // same IEEE values, so equality is deterministic); nation/region
  // broadcast. No correlated subquery ever materializes per row.
  private def q202(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val unit = Tables.lineitem(s, d)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"l_extendedprice" / $"l_quantity").as("supplycost"))
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter($"r_name" === "EUROPE")
    val eligible = unit
      .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey") // scaling dim: AQE decides
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
    val p = Tables.part(s, d).filter($"p_size" <= 15 && $"p_type" === "LARGE")
    // per-part min via a window over ONE eligible pipeline, not
    // groupBy + join-back: the join-back shape ran the supplier/nation/
    // region join chain twice and shuffled eligible twice more (agg +
    // join); the window is one l_partkey exchange, and the equality
    // filter keeps exactly the min-achieving rows — same IEEE doubles
    // minimized on both paths, so tie semantics are identical
    // (plans/r17/q202_*.txt: 9 lineitem/dim scans → 5, SortMergeJoin
    // gone).
    eligible
      .withColumn("best_cost",
        min($"supplycost").over(Window.partitionBy($"l_partkey")))
      .filter($"supplycost" === $"best_cost")
      .join(p, $"l_partkey" === p("p_partkey")) // scaling dim: AQE decides
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"supplycost")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }
  private val q202Sql =
    """WITH unit AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supplycost
      |  FROM lineitem GROUP BY 1, 2),
      |eligible AS (
      |  SELECT l_partkey, l_suppkey, supplycost, s_acctbal, s_name, n_name
      |  FROM unit
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, supplycost
      |FROM eligible
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_size <= 15 AND p_type = 'LARGE'
      |  AND supplycost = (SELECT MIN(e2.supplycost) FROM eligible e2
      |                    WHERE e2.l_partkey = eligible.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // q203 — product-type profit (TPC-H Q9 shape, adapted: no partsupp, so
  // supply cost = half the part's retail price). Profit per supplier
  // nation per order year; the amount stays one double expression with
  // identical shape on both engines, summed DECIMAL-exact by dsum.
  private def q203(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d).filter($"p_name".like("red%"))
    val li = Tables.lineitem(s, d)
    val amount = $"l_extendedprice" * (lit(1.0) - $"l_discount") -
      $"p_retailprice" * lit(0.5) * $"l_quantity"
    li.join(p, li("l_partkey") === p("p_partkey")) // scaling dim: AQE decides
      .join(Tables.supplier(s, d), li("l_suppkey") === $"s_suppkey") // scaling dim: AQE decides
      .join(Tables.orders(s, d), li("l_orderkey") === $"o_orderkey")
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
      .agg(dsum(amount).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }
  private val q203Sql =
    s"""SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       | ${dsumSql("l_extendedprice * (1.0 - l_discount) - p_retailprice * 0.5 * l_quantity")} AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE 'red%'
       |GROUP BY n_name, EXTRACT(year FROM o_orderdate)
       |ORDER BY nation, o_year DESC""".stripMargin

  // q204 — important stock value share (TPC-H Q11 shape, adapted: a part's
  // "stock value" = total extended price × quantity shipped by NATION_1
  // suppliers). The global total is a 1-row broadcast back over the
  // per-part rollup; the 0.01%-share threshold compares DECIMAL-exact sums
  // (value·10⁴ > total — no division, no rounding to flip a boundary row).
  private def q204(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val n = Tables.nation(s, d).filter($"n_name" === "NATION_1")
    val perPart = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey") // scaling dim: AQE decides
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"l_partkey")
      .agg(sum(($"l_extendedprice" * $"l_quantity").cast(D)).as("value_d"))
    val total = perPart.agg(sum($"value_d").as("total_d"))
    perPart.join(broadcast(total))
      .filter($"value_d" * 10000 > $"total_d")
      .select($"l_partkey", $"value_d".cast(DoubleType).as("value"))
      .orderBy($"value".desc, $"l_partkey")
  }
  private val q204Sql =
    """WITH pp AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6))) AS value_d
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_1'
      |  GROUP BY l_partkey)
      |SELECT l_partkey, CAST(value_d AS DOUBLE) AS value
      |FROM pp
      |WHERE value_d * 10000 > (SELECT SUM(value_d) FROM pp)
      |ORDER BY value DESC, l_partkey""".stripMargin

  // q205 — customer order-count distribution (TPC-H Q13): LEFT OUTER join
  // so zero-order customers land in the c_count=0 bucket, then two cascaded
  // integer aggregates — no doubles anywhere, exact on any engine.
  private def q205(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
    Tables.customer(s, d)
      .join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }
  private val q205Sql =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |      GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // q206 — supplier relationship counts (TPC-H Q16 shape, adapted: observed
  // part→supplier pairs come from lineitem; "complaint" suppliers =
  // negative account balance, excluded via broadcast anti-join — the NOT IN
  // never rewrites to a null-prone anti-condition because s_suppkey is a
  // key). COUNT(DISTINCT) shuffles once on the group keys.
  private def q206(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d)
      .filter($"p_brand" =!= "Brand#23" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(1, 4, 9, 14, 19, 23, 36, 45))
    val bad = Tables.supplier(s, d).filter($"s_acctbal" < 0.0).select($"s_suppkey")
    Tables.lineitem(s, d)
      .join(p, $"l_partkey" === p("p_partkey")) // scaling dim: AQE decides
      .join(broadcast(bad), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }
  private val q206Sql =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // q207 — disjunctive promo revenue (TPC-H Q19): one OR-of-ANDs predicate
  // over the part join — Catalyst pushes the l_quantity bounds and the
  // p_brand/p_size disjunction down to the respective scans and evaluates
  // the cross-table residual post-join.
  private def q207(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(p, li("l_partkey") === p("p_partkey")) // scaling dim: AQE decides
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
          $"l_quantity".between(1.0, 11.0)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
          $"l_quantity".between(10.0, 20.0)) ||
        ($"p_brand" === "Brand#15" && $"p_size".between(1, 15) &&
          $"l_quantity".between(20.0, 30.0)))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }
  private val q207Sql =
    s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |        AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |        AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // q208 — concentrated shippers (TPC-H Q20 shape, adapted: no partsupp
  // availability, so a supplier qualifies when over half its lifetime
  // volume of some red part shipped in 1997). The nested aggregate is one
  // combiner pass; qualification is a DECIMAL-exact comparison (q97·2 >
  // qall, no division); the supplier list filters via left-semi join.
  private def q208(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val red = Tables.part(s, d).filter($"p_name".like("red%"))
    val vol = Tables.lineitem(s, d)
      .join(red, $"l_partkey" === $"p_partkey") // scaling dim: AQE decides
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(when(year($"l_shipdate") === 1997, $"l_quantity")
          .otherwise(0.0).cast(D)).as("q97"),
        sum($"l_quantity".cast(D)).as("qall"))
    val qualified = vol.filter($"q97" * 2 > $"qall").select($"l_suppkey").distinct()
    val me = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter($"r_name" === "MIDDLE EAST")),
        $"n_regionkey" === $"r_regionkey")
    Tables.supplier(s, d)
      .join(broadcast(me), $"s_nationkey" === $"n_nationkey")
      .join(qualified, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }
  private val q208Sql =
    """WITH vol AS (
      |  SELECT l_suppkey, l_partkey,
      |    SUM(CAST(CASE WHEN EXTRACT(year FROM l_shipdate) = 1997
      |          THEN l_quantity ELSE 0.0 END AS DECIMAL(30,6))) AS q97,
      |    SUM(CAST(l_quantity AS DECIMAL(30,6))) AS qall
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%' GROUP BY 1, 2)
      |SELECT s_suppkey, s_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'MIDDLE EAST'
      |  AND s_suppkey IN (SELECT l_suppkey FROM vol WHERE q97 * 2 > qall)
      |ORDER BY s_suppkey""".stripMargin

  // q209 — suppliers who kept orders waiting (TPC-H Q21 shape, adapted: a
  // line is "late" when it ships >90 days after the order date). The
  // classic double-EXISTS collapses into one grouped pass per order —
  // distinct-supplier count, distinct-late-supplier count, and the lone
  // late supplier via MIN — then a count per supplier. No correlated
  // subquery, no self-join storm: two shuffles total on keys that scale.
  private def q209(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).filter($"o_orderstatus" === "F")
    val lines = Tables.lineitem(s, d)
      .join(o, $"l_orderkey" === $"o_orderkey")
      .withColumn("is_late",
        (datediff($"l_shipdate", $"o_orderdate") > 90).cast("int"))
    val perOrder = lines.groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct(when($"is_late" === 1, $"l_suppkey")).as("n_late_supp"),
        min(when($"is_late" === 1, $"l_suppkey")).as("late_supp"))
    perOrder.filter($"n_supp" >= 2 && $"n_late_supp" === 1)
      .groupBy($"late_supp")
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(s, d), $"late_supp" === $"s_suppkey") // scaling dim: AQE decides
      .select($"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }
  private val q209Sql =
    """WITH lines AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
      |      THEN 1 ELSE 0 END AS is_late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |po AS (
      |  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
      |    COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp,
      |    MIN(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
      |  FROM lines GROUP BY 1)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM po JOIN supplier ON late_supp = s_suppkey
      |WHERE n_supp >= 2 AND n_late_supp = 1
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  // q212 — seasonal-naive forecast backtest: forecast(day) = revenue(day−7),
  // scored per day in exact integer cents (abs error + APE ppm via integer
  // DIV — truncation identical on both engines for the non-negative
  // operands). The join is the daily rollup against its own 7-day shift —
  // an equi-join on the day, #days rows on both sides, so the backtest
  // costs two combiner aggregates regardless of order volume.
  private def q212(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, d)
      .groupBy($"o_orderdate".cast(DateType).as("day"))
      .agg((sum($"o_totalprice".cast(DecimalType(30, 6))) * 100)
        .cast(LongType).as("rev_cents"))
    val fc = daily.select(date_add($"day", 7).as("day"),
      $"rev_cents".as("forecast_cents"))
    daily.join(fc, Seq("day"))
      .withColumn("abs_err_cents", abs($"rev_cents" - $"forecast_cents"))
      .withColumn("ape_ppm", expr("CAST(CAST(abs_err_cents AS DECIMAL(19,0)) * 1000000 DIV rev_cents AS BIGINT)"))
      .select($"day".cast(StringType).as("day"),
        $"rev_cents".as("actual_cents"), $"forecast_cents",
        $"abs_err_cents", $"ape_ppm")
      .orderBy($"day")
  }
  private val q212Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) * 100 AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1)
      |SELECT CAST(a.day AS VARCHAR) AS day, a.rev_cents AS actual_cents,
      |  f.rev_cents AS forecast_cents,
      |  abs(a.rev_cents - f.rev_cents) AS abs_err_cents,
      |  CAST(abs(a.rev_cents - f.rev_cents) * 1000000 // a.rev_cents AS BIGINT) AS ape_ppm
      |FROM daily a JOIN daily f ON a.day = f.day + 7
      |ORDER BY day""".stripMargin

  // q224 — order-total reconciliation: recompute each order's total from
  // its lines (exact DECIMAL cents) and bucket the header-vs-detail
  // discrepancy — the cross-table consistency audit that catches partial
  // loads and double-applied discounts. One combiner aggregate below the
  // join (the q45/q50 aggregate-below-join shape), then a 4-way bucket
  // rollup; headers with no lines surface as their own bucket, never
  // silently vanish.
  private def q224(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = DecimalType(30, 6)
    val recalc = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") *
        (lit(1.0) + $"l_tax")).cast(D)).as("recalc"))
    // micro-units: the scale-6 decimal diff × 10⁶ is exactly integral, so
    // the long cast cannot round — a cents cast (×100) would leave 4
    // fractional digits and truncate-vs-round differently across engines
    Tables.orders(s, d)
      .join(recalc, $"o_orderkey" === $"l_orderkey", "left_outer")
      .withColumn("diff_micros",
        (($"o_totalprice".cast(D) - coalesce($"recalc", lit(0).cast(D))) * 1000000)
          .cast(LongType))
      .withColumn("bucket",
        when($"recalc".isNull, "no_lines")
          .when($"diff_micros" === 0L, "exact")
          .when(abs($"diff_micros") <= 100000000L, "within_100")
          .otherwise("over_100"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"),
        min($"diff_micros").as("min_diff_micros"),
        max($"diff_micros").as("max_diff_micros"))
      .orderBy($"bucket")
  }
  private val q224Sql =
    """WITH recalc AS (
      |  SELECT l_orderkey,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
      |      AS DECIMAL(30,6))) AS recalc
      |  FROM lineitem GROUP BY 1),
      |j AS (SELECT o_orderkey, recalc,
      |    CAST((CAST(o_totalprice AS DECIMAL(30,6)) - coalesce(recalc, 0)) * 1000000
      |      AS BIGINT) AS diff_micros
      |  FROM orders LEFT OUTER JOIN recalc ON o_orderkey = l_orderkey)
      |SELECT CASE WHEN recalc IS NULL THEN 'no_lines'
      |            WHEN diff_micros = 0 THEN 'exact'
      |            WHEN abs(diff_micros) <= 100000000 THEN 'within_100'
      |            ELSE 'over_100' END AS bucket,
      |  COUNT(*) AS n_orders,
      |  MIN(diff_micros) AS min_diff_micros,
      |  MAX(diff_micros) AS max_diff_micros
      |FROM j GROUP BY 1 ORDER BY bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q224_order_reconciliation" -> q224,
    "q212_seasonal_backtest" -> q212,
    "q201_tpch6_forecast_revenue" -> q201,
    "q202_tpch2_min_cost_supplier" -> q202,
    "q203_tpch9_product_profit" -> q203,
    "q204_tpch11_important_stock" -> q204,
    "q205_tpch13_order_distribution" -> q205,
    "q206_tpch16_supplier_counts" -> q206,
    "q207_tpch19_disjunct_revenue" -> q207,
    "q208_tpch20_concentrated_shippers" -> q208,
    "q209_tpch21_waiting_suppliers" -> q209,
    "q194_purge_audit" -> q194,
    "q188_sla_percentiles" -> q188,
    "q189_interpurchase_gaps" -> q189,
    "q190_ltv_curve" -> q190,
    "q186_rfm_segments" -> q186,
    "q187_new_vs_repeat" -> q187,
    "q181_sla_report" -> q181,
    "q174_share_of_parent" -> q174,
    "q167_mom_growth" -> q167,
    "q43_tpch3_shipping_priority" -> q43,
    "q44_tpch5_local_volume" -> q44,
    "q45_tpch10_returns" -> q45,
    "q50_tpch18_big_orders" -> q50,
    "q147_tpch7_nation_volume" -> q147,
    "q148_tpch8_market_share" -> q148,
    "q149_tpch12_late_lines" -> q149,
    "q150_tpch14_promo_share" -> q150,
    "q151_tpch15_top_supplier" -> q151,
    "q152_tpch17_small_qty" -> q152,
    "q153_tpch22_idle_customers" -> q153,
    "q154_tpch4_priority_semi" -> q154,
  )

  val oracles: Map[String, String] = Map(
    "q212_seasonal_backtest" -> q212Sql,
    "q224_order_reconciliation" -> q224Sql,
    "q201_tpch6_forecast_revenue" -> q201Sql,
    "q202_tpch2_min_cost_supplier" -> q202Sql,
    "q203_tpch9_product_profit" -> q203Sql,
    "q204_tpch11_important_stock" -> q204Sql,
    "q205_tpch13_order_distribution" -> q205Sql,
    "q206_tpch16_supplier_counts" -> q206Sql,
    "q207_tpch19_disjunct_revenue" -> q207Sql,
    "q208_tpch20_concentrated_shippers" -> q208Sql,
    "q209_tpch21_waiting_suppliers" -> q209Sql,
    "q194_purge_audit" -> q194Sql,
    "q188_sla_percentiles" -> q188Sql,
    "q189_interpurchase_gaps" -> q189Sql,
    "q190_ltv_curve" -> q190Sql,
    "q186_rfm_segments" -> q186Sql,
    "q187_new_vs_repeat" -> q187Sql,
    "q181_sla_report" -> q181Sql,
    "q174_share_of_parent" -> q174Sql,
    "q167_mom_growth" -> q167Sql,
    "q43_tpch3_shipping_priority" -> q43Sql,
    "q44_tpch5_local_volume" -> q44Sql,
    "q45_tpch10_returns" -> q45Sql,
    "q50_tpch18_big_orders" -> q50Sql,
    "q147_tpch7_nation_volume" -> q147Sql,
    "q148_tpch8_market_share" -> q148Sql,
    "q149_tpch12_late_lines" -> q149Sql,
    "q150_tpch14_promo_share" -> q150Sql,
    "q151_tpch15_top_supplier" -> q151Sql,
    "q152_tpch17_small_qty" -> q152Sql,
    "q153_tpch22_idle_customers" -> q153Sql,
    "q154_tpch4_priority_semi" -> q154Sql,
  )
}
