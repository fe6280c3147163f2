package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: `runMain graft.tools.ExplainNew q251,q252 [sfDir]`
  * prints the formatted physical plan of each named gate query — the
  * .explain step of the per-operator checklist (scan pruning, pushed
  * filters, aggregate shape, no stray exchanges). Prefix match, like
  * Verify's filter. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q250", "q251", "q252"))
    val d = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
      .foreach { n =>
        println(s"===== $n")
        graft.SparkEntry.queries(n)(spark, d).explain("formatted")
      }
  }
}
