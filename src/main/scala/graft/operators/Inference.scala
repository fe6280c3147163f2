package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Pluggable model-inference stage — the quality-classifier / reward-model
  * scoring pass a training-data pipeline runs between curation and packing.
  *
  * Mirrors the [[Multimodal.MediaDecoder]] boundary: the heavy model
  * runtime (ONNX session, XGBoost booster, JNI tokenizer…) is a deployment
  * plug-in behind the [[Inference.BatchScorer]] trait, while the Spark-side
  * plumbing — feature assembly, per-partition BATCHED invocation (real
  * runtimes amortize per-call overhead over a batch, not a row), output
  * schema — is real and correctness-gated here via the deterministic
  * [[Inference.LinearScorer]] (whose fixed accumulation order makes scores
  * bit-identical to the SQL oracle).
  *
  * Scale: `scoreBatched` is mapPartitions — map-only, no shuffle, no
  * driver involvement; model state loads once per partition (wrap the
  * expensive init in a lazy val inside the scorer). Batch size bounds peak
  * memory at batchSize × nFeatures doubles per task.
  */
object Inference {

  /** A batched scorer: one score per input row. Implementations must be
    * deterministic per batch ROW (not per batch shape): the same feature
    * vector yields the same score regardless of how rows are batched or
    * partitioned — the contract that makes inference reproducible across
    * cluster sizes. */
  trait BatchScorer extends Serializable {
    def score(batch: Array[Array[Double]]): Array[Double]
  }

  /** Deterministic linear model (margin = bias + Σ wᵢ·xᵢ, accumulated
    * left-to-right from the bias): the gate implementation, and the shape
    * real calibrated-logistic deployments reduce to before the sigmoid.
    * The accumulation order is part of the contract — it matches the
    * parenthesized SQL `((b + w1*x1) + w2*x2) + …` so engine results are
    * IEEE-identical. */
  final class LinearScorer(weights: Array[Double], bias: Double)
      extends BatchScorer {
    def score(batch: Array[Array[Double]]): Array[Double] =
      batch.map { x =>
        require(x.length == weights.length,
          s"feature arity ${x.length} != model arity ${weights.length}")
        var acc = bias
        var i = 0
        while (i < weights.length) { acc += weights(i) * x(i); i += 1 }
        acc
      }
  }

  /** Score every row: assemble `featureCols` (numeric, cast to double),
    * invoke `scorer` once per `batchSize` rows per partition, emit
    * (idCol, score). Map-only; batches never cross partitions. */
  def scoreBatched(df: DataFrame, idCol: String, featureCols: Seq[String],
      scorer: BatchScorer, batchSize: Int = 1024): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(batchSize >= 1, "batchSize must be positive")
    val s = df.sparkSession
    val prepared = df.select(
      (col(idCol).cast(LongType).as("__id") +:
        featureCols.map(c => col(c).cast(DoubleType))): _*)
    val scored = prepared.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val ids = rows.map(_.getLong(0))
        val feats = rows.map(r =>
          Array.tabulate(featureCols.length)(j => r.getDouble(j + 1))).toArray
        val out = scorer.score(feats)
        require(out.length == feats.length,
          s"scorer returned ${out.length} scores for ${feats.length} rows")
        ids.zip(out).map { case (id, sc) => Row(id, sc) }
      }
    }
    s.createDataFrame(scored, StructType(Seq(
      StructField("__id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))))
      .withColumnRenamed("__id", idCol)
  }

  // q215 — document quality margin through the inference stage: three
  // exact-integer features (chars, tokens, distinct tokens) scored by the
  // deterministic linear model. The mapPartitions batching is the real
  // deployment path; the oracle recomputes the identical parenthesized
  // margin in SQL, so scores hash-match bit-for-bit.
  private val q215W = Array(0.001, -0.02, 0.05)
  private val q215B = 1.0
  private def q215(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val uniq = docs
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("t"))
      .groupBy($"doc_id").agg(countDistinct($"t").as("n_uniq"))
    val feats = docs.select($"doc_id", $"n_chars",
        size(split(trim($"text"), "\\s+")).cast(LongType).as("n_tokens"))
      .join(uniq, "doc_id")
    scoreBatched(feats, "doc_id", Seq("n_chars", "n_tokens", "n_uniq"),
        new LinearScorer(q215W, q215B), batchSize = 256)
      .orderBy($"doc_id")
  }
  private val q215Sql =
    s"""WITH uniq AS (
       |  SELECT doc_id, COUNT(DISTINCT t) AS n_uniq
       |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
       |        FROM documents) GROUP BY 1),
       |f AS (SELECT d.doc_id, CAST(n_chars AS DOUBLE) AS f1,
       |        CAST(length(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS f2,
       |        CAST(n_uniq AS DOUBLE) AS f3
       |      FROM documents d JOIN uniq ON d.doc_id = uniq.doc_id)
       |SELECT doc_id,
       |  ((((${q215B} + (${q215W(0)} * f1)) + (${q215W(1)} * f2)) + (${q215W(2)} * f3))) AS score
       |FROM f ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_inference_quality_margin" -> q215)
  val oracles: Map[String, String] = Map(
    "q215_inference_quality_margin" -> q215Sql)
}
