package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit tool: prints the formatted physical plan of the named
  * queries (all of them with no names given) at the given sf dir —
  * `sbt "runMain graft.Explain q80_hybrid_rrf"` (a leading /path
  * argument overrides the sf dir). The per-operator plan locks live in
  * the specs; this is for eyeballing new plans (PushedFilters, broadcast
  * vs shuffle, WholeStageCodegen spans) before locking them. */
object Explain {
  def main(args: Array[String]): Unit = {
    val (dirArgs, nameArgs) = args.toSeq.partition(_.startsWith("/"))
    val sfDir = dirArgs.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (nameArgs.nonEmpty) nameArgs
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      try println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
      catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
