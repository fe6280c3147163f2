package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: the incremental-dedup asymmetry at a corpus scale
  * the gate can't reach — a large standing corpus represented only by
  * its signature index vs a small appended batch. Validates that batch
  * cost tracks BATCH size (the operator's reason to exist): doubling
  * the standing corpus must not move the per-batch time, because only
  * the index (k longs/doc) participates.
  */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(4000)(
      Seq.fill(4 + rnd.nextInt(6))(('a' + rnd.nextInt(20)).toChar).mkString)
    def corpus(n: Int, base: Long) = (0 until n).map { i =>
      (base + i, Seq.fill(40)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (oldN <- Seq(20000, 40000, 80000)) {
      val old = corpus(oldN, base = 0L)
      // batch = fresh docs + 50 verbatim copies of standing docs, so the
      // profile also demonstrates detection, not just cost flatness
      val batch = corpus(1950, base = 10000000L).unionByName(
        old.limit(50).withColumn("doc_id", col("doc_id") + 20000000L))
        .cache()
      batch.count()
      val t0 = System.nanoTime()
      val index = graft.operators.Dedup
        .minhashIndex(old, "doc_id", "text").cache()
      val ic = index.count()
      val t1 = System.nanoTime()
      val pairs = graft.operators.Dedup
        .dedupIncremental(batch, "doc_id", "text", index, minSim = 0.75)
        .count()
      val t2 = System.nanoTime()
      println(f"[profile] old=$oldN%6d index build ${(t1 - t0) / 1e9}%6.2f s " +
        f"($ic rows) | batch(2000) dedup ${(t2 - t1) / 1e9}%6.2f s ($pairs pairs)")
      index.unpersist(); batch.unpersist()
    }
    spark.stop()
  }
}
