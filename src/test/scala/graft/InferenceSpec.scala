package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Inference

class InferenceSpec extends AnyFunSuite {
  import TestSpark._

  // a scorer that enforces the batch contract: every batch within
  // batchSize, every row scored by position
  private final class GuardedScorer(maxBatch: Int)
      extends Inference.BatchScorer {
    def score(batch: Array[Array[Double]]): Array[Double] = {
      require(batch.length <= maxBatch,
        s"batch of ${batch.length} exceeds $maxBatch")
      require(batch.nonEmpty, "empty batch must never be emitted")
      batch.map(x => x(0) * 2 + x(1))
    }
  }

  test("scoreBatched: batches bounded, every row scored once, values exact") {
    import spark.implicits._
    val df = (1L to 2500L).map(i => (i, i.toDouble, (i % 7).toDouble))
      .toDF("id", "f1", "f2").repartition(3)
    val out = Inference.scoreBatched(df, "id", Seq("f1", "f2"),
      new GuardedScorer(100), batchSize = 100)
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 2500)
    (1L to 2500L).foreach { i =>
      assert(got(i) == i * 2 + (i % 7), s"row $i")
    }
  }

  test("scoreBatched: scores independent of partitioning and batch size") {
    import spark.implicits._
    val df = (1L to 321L).map(i => (i, i * 0.5, i * 0.25)).toDF("id", "a", "b")
    val s = new Inference.LinearScorer(Array(0.3, -0.7), 2.0)
    def run(parts: Int, bs: Int) =
      Inference.scoreBatched(df.repartition(parts), "id", Seq("a", "b"), s, bs)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = run(1, 1024)
    assert(run(7, 10) == base)
    assert(run(3, 1) == base)
  }

  test("LinearScorer rejects arity mismatch; scoreBatched rejects bad scorers") {
    val s = new Inference.LinearScorer(Array(1.0, 2.0), 0.0)
    intercept[IllegalArgumentException] {
      s.score(Array(Array(1.0)))
    }
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("id", "f")
    val lying = new Inference.BatchScorer {
      def score(batch: Array[Array[Double]]): Array[Double] = Array.empty
    }
    val ex = intercept[org.apache.spark.SparkException] {
      Inference.scoreBatched(df, "id", Seq("f"), lying).collect()
    }
    assert(ex.getMessage != null)
  }
}
