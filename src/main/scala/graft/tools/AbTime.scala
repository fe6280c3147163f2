package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B timing scratch harness: time a comma-separated list of queries
  * (all queries with no list) for N passes under the session config
  * given by env, printing per-query seconds per pass. Unlike Bench this
  * makes no artifact and applies no schedule — it exists to measure one
  * config or code delta on a handful of queries quickly:
  *
  *   SPARK_GRAFT_AB_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false,spark.sql.adaptive.advisoryPartitionSizeInBytes=16m" \
  *   sbt "runMain graft.tools.AbTime q03_agg_tpch1,q13_join_facts"
  */
object AbTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_AB_PASSES", "3").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    // entries split on ';' (conf VALUES may contain ','); ',' is still
    // accepted as a separator when no ';' is present, for the historical
    // invocations. An entry without '=' fails loudly, not with MatchError.
    sys.env.get("SPARK_GRAFT_AB_CONF").foreach { raw =>
      val sep = if (raw.contains(';')) ';' else ','
      raw.split(sep).map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => b.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_AB_CONF entry is not key=value: '$kv'")
        }
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.flatMap(_.split(",")).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val walls = names.map { n =>
      val ts = (0 until passes).map { _ =>
        val t0 = System.nanoTime()
        try graft.SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable => println(s"AB FAIL $n: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"AB $n%-34s " +
        ts.map(t => f"$t%7.3f").mkString(" ") + f"  min=${ts.min}%7.3f")
      n -> ts.min
    }
    println(f"AB TOTAL min-of-$passes%d: ${walls.map(_._2).sum}%.3f s over ${names.size}%d queries")
    spark.stop()
  }
}
