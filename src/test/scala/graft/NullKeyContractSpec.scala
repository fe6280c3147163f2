package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Extended, Similarity, TextStats}

/** Pins each public group-keyed API's documented NULL-key class
  * (SCALE.md "Two idioms coexist and differ on NULL keys"):
  *
  *  - NULL-KEEPING (pure `groupBy(g).agg` / group-keyed windows): a NULL
  *    key is a group like any other — its rows stay, under a NULL group.
  *  - NULL-DROPPING (aggregate-then-join-back): the equi-join back to the
  *    per-group frame drops NULL-key rows (NULL ≠ NULL) — they vanish
  *    from the OUTPUT even though thresholds saw them.
  *
  * The class is a CONTRACT: callers that must keep NULL metadata coalesce
  * the key upstream. This table keeps the docs honest — an implementation
  * change that silently flips an API's class fails here, not in a
  * production corpus with NULL `lang`. */
class NullKeyContractSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val df = Seq[(String, Long, Long, Long, String)](
    ("a", 1L, 10L, 20L, "w"), ("a", 2L, 11L, 19L, "w"),
    ("a", 3L, 12L, 18L, "z"), (null, 4L, 5L, 6L, "w"),
    (null, 5L, 7L, 8L, "w")).toDF("grp", "id", "x", "y", "item")

  // (api, run, keepsNullKey per the documented class)
  private lazy val table: Seq[(String, DataFrame => DataFrame, Boolean)] = Seq(
    ("topKPerKey",
      (d: DataFrame) => Similarity.topKPerKey(d, Seq("grp"), "id", "x", 2),
      true),
    ("groupCorr",
      (d: DataFrame) => Extended.groupCorr(d, "x", "y", Seq("grp")), true),
    ("groupMoments",
      (d: DataFrame) => Extended.groupMoments(d, "x", Seq("grp")), true),
    ("histQuantiles",
      (d: DataFrame) => Extended.histQuantiles(d, "x", Seq(50),
        lo = 0.0, width = 1.0, bins = 100, groupCols = Seq("grp")), true),
    ("heavyHittersByGroup",
      (d: DataFrame) => TextStats.heavyHittersByGroup(d, Seq("grp"), "item",
        minFreqPpm = 500000L), false),
    ("winsorizeByQuantile",
      (d: DataFrame) => Extended.winsorizeByQuantile(d, "x", 10, 90,
        lo = 0.0, width = 1.0, bins = 100, groupCols = Seq("grp")), false),
    ("percentileRankByGroup",
      (d: DataFrame) => Extended.percentileRankByGroup(d, Seq("grp"), "x",
        lo = 0.0, width = 1.0, bins = 100), false),
  )

  test("every group-keyed API matches its documented NULL-key class") {
    for ((name, run, keeps) <- table) {
      val out = run(df)
      val nullRows = out.filter(col("grp").isNull).count()
      val aRows = out.filter(col("grp") === "a").count()
      assert(aRows > 0, s"$name: non-NULL group must always survive")
      if (keeps)
        assert(nullRows > 0,
          s"$name is documented NULL-KEEPING but dropped the NULL group")
      else
        assert(nullRows == 0,
          s"$name is documented NULL-DROPPING but emitted NULL-group rows")
    }
  }
}
