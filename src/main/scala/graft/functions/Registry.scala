package graft.functions

import org.apache.spark.sql.SparkSession

import graft.plans.{JaroWinkler, ScaledDotProduct}

/** SQL function registry — the UDF/extension surface the reference lacks
  * entirely (SURVEY.md §2.A.3: "no UDF/UDAF/UDTF registration surface").
  * Registers graft's native expressions so they are reachable from
  * `spark.sql` text as well as the Column API.
  */
object Registry {
  // once per session: re-registering an existing temp function logs a
  // "replaced a previously registered function" WARN per call site, which
  // pollutes the bench tail the log-hygiene work keeps as a signal channel
  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def install(spark: SparkSession): Unit = installed.synchronized {
    if (installed.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "scaled_dot", exprs => ScaledDotProduct(exprs.head, exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "jaro_winkler", exprs => JaroWinkler(exprs.head, exprs(1)), "built-in")
    }
  }
}
