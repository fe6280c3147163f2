package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: bpeFit at tokenizer-realistic scale (tens of
  * thousands of word types, thousands of merges) — validates the local
  * incremental trainer + lazy-heap argmax stay seconds-fast where the
  * round-8 job-per-merge loop would have paid thousands of Spark jobs. */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // ~30k distinct 6-12 char words over a 20-letter alphabet, zipf-ish
    val vocab = Seq.fill(30000)(
      Seq.fill(6 + rnd.nextInt(7))(('a' + rnd.nextInt(20)).toChar).mkString)
    val docs = Seq.fill(20000)(
      Seq.fill(30)(vocab(math.min(vocab.size - 1,
        (math.pow(rnd.nextDouble(), 2) * vocab.size).toInt))).mkString(" "))
      .toDF("text")
    for (m <- Seq(500, 2000, 8000)) {
      val t0 = System.nanoTime()
      val n = graft.operators.TextStats.bpeFit(docs, "text", numMerges = m).count()
      println(f"[profile] bpeFit($m merges): ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
