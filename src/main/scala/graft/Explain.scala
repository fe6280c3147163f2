package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the headline queries so scan
  * pushdown (PushedFilters/ReadSchema), broadcast choices and whole-stage
  * codegen spans can be audited. Usage:
  *   sbt "runMain graft.Explain [queryName ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q03_agg_tpch1", "q13_join_facts", "q14_join_broadcast_star",
        "q37_ann_brute", "q44_tpch5_local_volume", "q34_dedup_ngram_jaccard",
        "q50_tpch18_big_orders", "q53_repetition_ratio", "q54_passage_overlap",
        "q57_boilerplate_removal", "q58_tfidf_topk", "q59_pack_sequences",
        "q60_decontaminate", "q65_exact_against", "q66_term_rarity",
        "q68_minhash_against", "q69_bm25_topk", "q70_funnel",
        "q73_quantile_sketch", "q74_range_join")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
