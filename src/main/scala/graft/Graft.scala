package graft

import org.apache.spark.sql.SparkSession

/** Engine facade: one-call session bootstrap with graft's settings and
  * function registry installed — what a library user starts from.
  *
  * Settings mirror the builder-environment conventions (SURVEY.md §6 env):
  * shuffle partitions sized to cores (not the 200 default), AQE on (runtime
  * re-planning incl. skew-join split), UTC session time, nano-parquet
  * tolerance for event streams.
  */
object Graft {
  def session(master: String = "local[*]", appName: String = "graft",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val cores = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    functions.Registry.install(spark)
    // the session-local equivalents of GraftExtensions' injected rules
    // (metadata-only manifest aggregates; rollup-mode serving) — a
    // spark-submit deployment gets them via spark.sql.extensions instead
    val rules = Seq(plans.ManifestAggregates(spark),
      plans.RollupServingRule(spark))
      .filterNot(r => spark.experimental.extraOptimizations
        .exists(_.getClass == r.getClass))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations ++ rules
    spark
  }

  /** Open a scale-factor directory as a registered catalog. */
  def open(spark: SparkSession, dir: String): Unit = Tables.register(spark, dir)
}
