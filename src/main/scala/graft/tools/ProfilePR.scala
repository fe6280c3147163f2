package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the PageRank cold-build investigation (round 9).
  * Times q84/q87 cold in isolation, mirroring Bench's cold methodology. */
object ProfilePR {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm the JIT + parquet footers like Bench's warmup pass does
    graft.SparkEntry.queries("q84_pagerank")(spark, sfDir).count()
    graft.SparkEntry.queries("q87_pagerank_personalized")(spark, sfDir).count()
    for (i <- 1 to 3) {
      graft.operators.Text.invalidateCaches(spark, sfDir)
      time(s"q84 cold #$i") {
        graft.SparkEntry.queries("q84_pagerank")(spark, sfDir).count()
      }
      graft.operators.Text.invalidateCaches(spark, sfDir)
      time(s"q87 cold #$i") {
        graft.SparkEntry.queries("q87_pagerank_personalized")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
