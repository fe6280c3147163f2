package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Public text-analysis API over ANY DataFrame (caller-named id/text
  * columns) — the library form of the q29–q32 operators. All are map-only
  * (per-row expressions) except fingerprint's bag hash (one shuffle on the
  * id); language-ID marker lists are caller-extensible.
  */
object TextStats {

  private def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("doc_id"), col(textCol).as("text"))

  private val toks = split(trim(col("text")), "\\s+")

  /** Whitespace + BPE-ish token counts, lengths, average token length. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    normalized(df, idCol, textCol)
      .withColumn("toks", toks)
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("n_bpeish"),
        length(col("text")).as("len"),
        (length(regexp_replace(col("text"), "\\s", "")).cast(DoubleType) / size(col("toks")))
          .as("avg_tok_len"))

  /** Length / stopword / alpha / punctuation quality signals. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame =
    normalized(df, idCol, textCol)
      .withColumn("toks", toks)
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        size(col("toks")).as("n_words"),
        regexp_count(col("text"), lit("\\b(the|a|or|and)\\b")).as("n_stop"),
        (regexp_count(col("text"), lit("\\b(the|a|or|and)\\b")).cast(DoubleType) / size(col("toks")))
          .as("stop_ratio"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast(DoubleType) / length(col("text")))
          .as("alpha_ratio"),
        regexp_count(col("text"), lit("[.,;:!?]")).as("n_punct"))

  /** Stopword-argmax language ID. `markers` maps language → marker regex;
    * ties resolve to the EARLIER entry (so order = prior); no hits →
    * "unknown". Output: doc_id, c_<lang>…, predicted. */
  def langId(df: DataFrame, idCol: String, textCol: String,
      markers: Seq[(String, String)]): DataFrame = {
    val counted = normalized(df, idCol, textCol)
      .select((col("doc_id") +:
        markers.map { case (l, re) => regexp_count(col("text"), lit(re)).as(s"c_$l") }): _*)
    // first language whose count is ≥ every LATER language's count and > 0
    val predicted = markers.zipWithIndex.foldRight(lit("unknown")) {
      case (((l, _), i), alt) =>
        val c = col(s"c_$l")
        val beatsLater = markers.drop(i + 1)
          .map { case (m, _) => c >= col(s"c_$m") }
          .foldLeft(c > 0)(_ && _)
        when(beatsLater, l).otherwise(alt)
    }
    counted.withColumn("predicted", predicted)
  }

  /** Corpus-frequency term-rarity score — the cross-document quality signal
    * (an LM-perplexity proxy: documents of corpus-rare terms score high,
    * boilerplate scores low) in exact integer arithmetic, so it replicates
    * bit-for-bit in any engine (a float log-prob would drift at the ulp
    * level across libm implementations — same discipline as TF-IDF's
    * scaled-integer idf). Per document over corpus term-instance counts:
    * rarity_scaled = (Σ_term tf·((T·scale) div freq)) div n_tokens, i.e.
    * the mean scaled inverse term probability. Output: (doc_id, n_tokens,
    * rarity_scaled).
    *
    * Plan: tf = one groupBy(doc, term); corpus freq = a combiner-friendly
    * groupBy(term) SUM (a corpus-wide hot term shrinks to #partitions
    * partial rows — never a term-keyed window); join-back broadcast (the
    * build side is vocab-sized); final agg is doc-keyed. Pass `totalHint`
    * when the corpus token count is known to skip the count pass. T·scale
    * must fit a long — lower `scale` for corpora beyond ~10^12 tokens. */
  def termRarity(df: DataFrame, idCol: String, textCol: String,
      scale: Long = 1000000L, totalHint: Option[Long] = None): DataFrame = {
    val tf = normalized(df, idCol, textCol)
      .withColumn("toks", toks)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy(col("term")).agg(sum(col("tf")).as("freq"))
    val total = totalHint.getOrElse(
      freq.agg(sum(col("freq"))).head().getLong(0))
    val ts = math.multiplyExact(total, scale)
    tf.join(broadcast(freq), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("nt"),
        sum(expr(s"tf * (CAST($ts AS BIGINT) div freq)")).as("rw"))
      .select(col("doc_id"), col("nt").cast(IntegerType).as("n_tokens"),
        expr("CAST(rw div nt AS BIGINT)").as("rarity_scaled"))
  }

  /** md5 content fingerprint + positional polynomial bag hash (exact
    * integers — reproducible in any engine). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.Ops.md5Long
    normalized(df, idCol, textCol)
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .withColumn("toks", split(col("norm"), " "))
      .select(col("doc_id"), col("norm"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .groupBy(col("doc_id"))
      .agg(
        min(md5(col("norm"))).as("md5_fp"),
        sum((md5Long(col("tok")) % 1000003L) * ((col("pos") % 31) + 1)).as("bag_fp"))
  }
}
