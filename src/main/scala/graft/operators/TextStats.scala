package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

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
    * partial rows — never a term-keyed window); join-back UNHINTED (the
    * build side is VOCAB-sized — web-scale vocabularies reach 10⁹ terms,
    * so AQE decides: broadcast when small, shuffle when not); final agg
    * is doc-keyed. Pass `totalHint`
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
    tf.join(freq, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("nt"),
        // DECIMAL per row: a hapax term's scaled inverse probability IS
        // T·scale (up to ~9e18) — any tf ≥ 2 on it wraps a LONG product
        sum(expr(s"CAST(tf AS DECIMAL(19,0))" +
          s" * (CAST($ts AS BIGINT) div freq)")).as("rw"))
      .select(col("doc_id"), col("nt").cast(IntegerType).as("n_tokens"),
        expr("CAST(rw div nt AS BIGINT)").as("rarity_scaled"))
  }

  /** BM25 top-k keyword retrieval (k1 = 1.2, b = 0.75) in exact integer
    * arithmetic. The standard ln((N−df+0.5)/(df+0.5)+1) idf is replaced by
    * the scaled rational (N−df+0.5)/(df+0.5) — a monotone transform of the
    * same document frequency, so single-term rankings are identical and
    * multi-term rankings weight rare terms more sharply; in exchange every
    * score replicates bit-for-bit in any engine (libm ln() differs in the
    * last ulp across implementations — same discipline as [[termRarity]]).
    * Fixed-point ppm pipeline per (doc, term):
    * {{{
    *   idf_m      = ((2(N − df) + 1) · 1000) div (2·df + 1)
    *   c          = (N · 10^6) div T            // ppm of 1/avgdl, a constant
    *   k1term_ppm = (1.2e6 · (0.25e6 + (0.75e6 · dl · c) div 10^6)) div 10^6
    *   score      = idf_m · ((2.2e9 · tf) div (10^6 · tf + k1term_ppm))
    * }}}
    * summed over matched query terms (long addition — order-independent).
    * Longs bound the corpus at N ≤ ~10^9 docs, dl ≤ ~10^5 tokens (score ≤
    * ~2.4e16); beyond that lower the idf scale. Output: top `k` rows of
    * (doc_id, n_terms_hit, score_scaled), score desc / doc_id asc.
    *
    * Plan: tf restricts to the query terms BEFORE its aggregate (a
    * vocabulary-sized filter on the exploded tokens), so the candidate
    * relation is query-selective; df is a combiner-friendly groupBy over it
    * (≤ |terms| rows — broadcast back); doc lengths join on doc_id (AQE
    * splits any skew); top-k is a global TakeOrderedAndProject, never a
    * single-partition window. Pass `statsHint = (nDocs, totalTokens)` when
    * corpus stats are known to skip the stats pass. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 20,
      statsHint: Option[(Long, Long)] = None): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val base = normalized(df, idCol, textCol)
      .select(col("doc_id"), toks.as("toks"))
    val lens = base.select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"))
    val (nDocs, totToks) = statsHint.getOrElse {
      val r = lens.agg(count(lit(1)), sum(col("dl"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    require(totToks > 0, "bm25TopK needs a non-empty corpus")
    val c = math.multiplyExact(nDocs, 1000000L) / totToks
    val tf = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfc), Seq("term"))
      .join(lens, Seq("doc_id"))
      .withColumn("s", expr(
        s"((2 * (${nDocs}L - df) + 1) * 1000L div (2 * df + 1)) * " +
          s"((2200000000L * tf) div (1000000L * tf + " +
          s"(1200000L * (250000L + (750000L * dl * ${c}L) div 1000000L)) div 1000000L))"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("s")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Inverted-index posting lists — the index-build pass behind keyword
    * retrieval (the batch analogue of the reference's per-segment string
    * indices, ExtIndex_Str_Hash: ours is a queryable corpus-level index
    * relation). One row per term with document frequency in
    * [minDf, maxDf]: (term, df, postings) — postings the comma-joined
    * doc ids in ascending numeric order (deterministic in any engine).
    *
    * Scale: the df pass is a combiner-friendly groupBy over distinct
    * (term, doc) pairs; ELIGIBILITY FILTERS BEFORE THE LIST BUILD — the
    * eligible-vocab frame broadcasts back, so a stop word (df ≈ corpus
    * size) never reaches collect_list: every built list is ≤ maxDf ids by
    * construction (the same df-cap discipline as the shingle joins).
    * maxDf is required, not defaulted — an unbounded posting list is the
    * hot-key hazard. */
  def postings(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDf: Long): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, "need 1 <= minDf <= maxDf")
    val td = normalized(df, idCol, textCol)
      .withColumn("toks", toks)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .distinct()
    val dfc = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    td.join(dfc, "term")  // dfc is minDf/maxDf-filtered VOCAB — AQE decides
      .groupBy(col("term"), col("df"))
      .agg(concat_ws(",", expr("array_sort(collect_list(doc_id))")).as("postings"))
  }

  /** Positional phrase search: documents containing the exact consecutive
    * token sequence `phrase`, with occurrence counts — the positional
    * complement of the bag-of-words [[postings]]/[[bm25TopK]] retrieval
    * path. Output: (doc_id, n_matches), docs with ≥ 1 occurrence.
    *
    * Scale: the (doc, pos, term) relation filters MAP-ONLY to just the
    * phrase's terms before any join (|phrase| posting-list reads, never a
    * corpus-wide shuffle); term i then meets term 0 by the (doc_id,
    * pos − i) equi-join, so candidates shrink monotonically with each
    * join. Lead with the phrase as given — reordering by rarity is the
    * caller's optimization (join order does not change the result). */
  def phraseMatch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    val tp = normalized(df, idCol, textCol)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "term")))
    val t0 = tp.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(t0) {
      case (acc, (t, i)) =>
        val ti = tp.filter(col("term") === t)
          .select(col("doc_id").as("__d"), (col("pos") - i).as("__p"))
        acc.join(ti, acc("doc_id") === col("__d") && acc("pos") === col("__p"))
          .drop("__d", "__p")
    }
    matched.groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
  }

  /** Exact heavy hitters in two bounded passes: a Misra–Gries sketch pass
    * (≤ `k` counters per partition, k×#partitions rows shuffled — never
    * the full #distinct keyspace) proposes candidates, then a recount
    * pass computes EXACT counts for just those ≤ k items and keeps the
    * ones at/above `minFreqPpm` of the stream. Because MG admits no
    * false negatives above n/(k+1), requiring
    * `minFreqPpm·(k+1) > 10⁶` makes the final answer exactly the set
    * `{x : count(x)·10⁶ ≥ n·minFreqPpm}` — deterministic and
    * SQL-oracle-able despite the sketch inside. Output: (itemCol, cnt).
    *
    * Scale: pass 1 is one combiner-friendly aggregate to a single
    * k-bounded summary; the ≤ k candidate strings touch the driver (a
    * bounded list by construction — never the keyspace) and return as a
    * broadcast IN filter; pass 2 aggregates ≤ k keys. Nulls are
    * dropped. */
  def heavyHitters(df: DataFrame, itemCol: String, minFreqPpm: Long,
      k: Int = 1024): DataFrame = {
    require(minFreqPpm >= 1 && minFreqPpm <= 1000000L, "minFreqPpm in [1, 1e6]")
    require(minFreqPpm * (k + 1L) > 1000000L,
      s"k = $k cannot guarantee the ${minFreqPpm}ppm threshold: " +
        "need minFreqPpm * (k+1) > 1e6 for the no-false-negative bound")
    val items = df.select(col(itemCol).cast(StringType).as("__it"))
      .filter(col("__it").isNotNull)
    val mg = udaf(new graft.functions.MisraGriesAgg(k),
      org.apache.spark.sql.Encoders.STRING)
    val summary = items.agg(mg(col("__it")).as("s"))
      .select(col("s.n"), map_keys(col("s.items")).as("cands"))
      .head()
    val n = summary.getLong(0)
    val cands = summary.getSeq[String](1)
    if (cands.isEmpty) {
      items.sparkSession.emptyDataFrame
        .withColumn(itemCol, lit(null).cast(StringType))
        .withColumn("cnt", lit(null).cast(LongType))
        .limit(0)
    } else {
      items.filter(col("__it").isin(cands: _*))
        .groupBy(col("__it").as(itemCol))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(1000000L) >= lit(n) * lit(minFreqPpm))
    }
  }

  /** Sparse TF-IDF cosine similarity pairs through the inverted index —
    * the bag-of-words complement of the shingle-Jaccard and embedding
    * near-dup detectors: document pairs sharing ≥ 1 indexable term, with
    * cosine over integer TF-IDF weights (w = tf · (N·1000 div df)). All
    * sums run in DECIMAL(38,0) (oracle: HUGEINT) so accumulation order
    * cannot drift, and only the final cosine assembly is one identical
    * double expression — bit-reproducible in any engine. Terms with
    * df > `maxDf` are excluded from the vector space entirely (norms
    * included — the standard stopword cut, and the skew guard). Output:
    * (doc_a, doc_b, shared, cosine), doc_a < doc_b, cosine ≥ threshold.
    *
    * Scale: candidates are the term equi-join of the df-capped index —
    * Σ_t df(t)² pairs, bounded by maxDf²·|vocab|, never corpus
    * all-pairs; tf/df/norms/dots are all combiner-friendly aggregates;
    * the doc total is a 1-row broadcast. */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long, threshold: Double): DataFrame = {
    require(maxDf >= 1, "maxDf must be positive")
    val D = DecimalType(38, 0)
    val tf = normalized(df, idCol, textCol)
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val n1 = tf.agg(countDistinct(col("doc_id")).as("__n"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
    val w = tf.join(dfc, "term").crossJoin(broadcast(n1))
      .select(col("doc_id"), col("term"),
        (col("tf") * expr("(__n * 1000L) div __df")).as("w"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sum(col("w").cast(D) * col("w").cast(D)).as("norm"))
    val dots = w.select(col("doc_id").as("doc_a"), col("term"), col("w").as("wa"))
      .join(w.select(col("doc_id").as("doc_b"), col("term"), col("w").as("wb")),
        "term")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("wa").cast(D) * col("wb").cast(D)).as("dot"),
        count(lit(1)).as("shared"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("norm").as("__na")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("norm").as("__nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("dot").cast("double") /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Bigram language-model statistics: for every adjacent token pair
    * (w1, w2) seen at least `minCount` times corpus-wide, the pair count
    * and the exact-integer conditional probability
    * `P(w2|w1) = count(w1,w2)·10⁶ div count(w1,·)` — the next-token
    * table an n-gram LM (or a data-quality "surprisal" pass) reads.
    * Output: (w1, w2, pair_n, cond_ppm).
    *
    * Scale: bigrams are assembled MAP-SIDE from each document's token
    * array (`transform` over indices — no positional self-join, no
    * shuffle before the count); both counts are combiner-friendly
    * aggregates and the unigram table joins back by w1 (AQE-splittable
    * on hot head words). */
  def bigramStats(df: DataFrame, textCol: String, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, "minCount must be positive")
    val bi = df.select(split(trim(col(textCol)), "\\s+").as("__t"))
      // sequence(1, 0) DESCENDS in Spark: a 1-token doc would fabricate
      // null bigrams — guard short docs out before the transform
      .filter(size(col("__t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__t) - 1), i -> struct(__t[i-1] AS w1, __t[i] AS w2))"))
        .as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val pairs = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minCount)
    val uni = bi.groupBy(col("w1")).agg(count(lit(1)).as("__u"))
    pairs.join(uni, "w1")
      .select(col("w1"), col("w2"), col("pair_n"),
        expr("pair_n * 1000000L div __u").as("cond_ppm"))
  }

  /** Byte-pair-encoding vocabulary trainer (Sennrich et al., ACL 2016 —
    * the subword tokenizer fit every LLM pipeline runs): starting from
    * characters, repeatedly merge the most frequent adjacent symbol pair
    * (ties → lexicographic) for `numMerges` rounds, counting pairs
    * word-wise weighted by corpus word frequency. Returns the merge
    * table: (rank, left, right, pair_count) in merge order — the
    * artifact a tokenizer ships. Symbols are plain strings (merged pair
    * = concatenation), the standard text-BPE simplification.
    *
    * Scale: the trainer touches the corpus EXACTLY ONCE — one
    * combiner-friendly word-count aggregate, capped to the `maxVocab`
    * most frequent word types (deterministic freq-desc / word-asc
    * tie-break; `minFreq` prunes the junk-token tail first). The capped
    * vocabulary is bounded by construction (≤ maxVocab rows of short
    * strings — the fast-tokenizer memoization every production trainer
    * uses), so the merge rounds run LOCALLY on the collected word table
    * with an incremental pair index: each round is an in-memory argmax +
    * a rewrite of only the words containing the merged pair — no
    * per-merge Spark job, no driver-paced job storm. A real 32K-merge
    * fit costs one Spark aggregate plus seconds of local work, instead
    * of 32K sequential job round-trips. */
  def bpeFit(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 1L, maxVocab: Int = 1 << 20): DataFrame = {
    require(numMerges >= 1, "numMerges must be positive")
    require(minFreq >= 1, "minFreq must be positive")
    require(maxVocab >= 1 && maxVocab <= (1 << 22),
      s"maxVocab must be in [1, ${1 << 22}] — it bounds the driver-side vocabulary")
    val s = df.sparkSession
    import s.implicits._
    // the ONE corpus pass: word-type counts, junk tail pruned, capped to
    // the maxVocab most frequent types (TakeOrdered — bounded by k)
    val vocabRows = df.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .filter($"freq" >= minFreq)
      .orderBy($"freq".desc, $"w".asc)
      .limit(maxVocab)
      .collect()
    // split to code points (parity with split(w, "") on the Spark side)
    def codePoints(w: String): mutable.ArrayBuffer[String] = {
      val buf = new mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        buf += w.substring(i, i + n); i += n
      }
      buf
    }
    val words = vocabRows.map(r => codePoints(r.getString(0)))
    val freqs = vocabRows.map(_.getLong(1))
    // incremental pair index (Sennrich et al. 2016 trainer): corpus-wide
    // weighted adjacent-pair counts + which words contain each pair, so a
    // merge re-counts only the affected words. The argmax is a
    // lazy-invalidation priority queue — every count CHANGE pushes a
    // fresh (count, pair) entry and pops discard entries whose count no
    // longer matches the live table — so each round costs
    // O(affected-pairs·log) instead of a full scan of the pair table
    // (a 32K-merge fit over a 10⁷-word vocab would otherwise pay
    // merges×|pairs| comparisons). Same total order (count desc, then
    // (left, right) asc), so results are unchanged.
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2.compareTo(a._2) // reversed: smaller left wins ties
          if (l != 0) l else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    def addPairs(i: Int, sign: Long): Unit = {
      val syms = words(i); val f = freqs(i) * sign
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val c = pairCounts.getOrElse(p, 0L) + f
        if (c == 0L) pairCounts.remove(p) else pairCounts(p) = c
        if (c > 0L) heap.enqueue((c, p._1, p._2))
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }
    var i = 0
    while (i < words.length) { addPairs(i, 1L); i += 1 }
    // greedy left-to-right merge of (l, r) in one word — a fold, so
    // overlapping runs ("aaa" under (a,a)) merge exactly once
    def mergeWord(syms: mutable.ArrayBuffer[String], l: String,
        r: String): mutable.ArrayBuffer[String] = {
      val out = new mutable.ArrayBuffer[String](syms.length)
      syms.foreach { x =>
        if (out.nonEmpty && out.last == l && x == r)
          out(out.length - 1) = l + r
        else out += x
      }
      out
    }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 0
    while (round < numMerges && pairCounts.nonEmpty) {
      // argmax: pop stale heap entries (count no longer live) until the
      // top reflects the table — count desc, then (left, right) asc
      var bl: String = null; var br: String = null; var bc = -1L
      while (bl == null) {
        if (heap.isEmpty) // defensive: every live count was pushed, but refill beats a crash
          pairCounts.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }
        val (c, l, r) = heap.dequeue()
        if (pairCounts.get((l, r)).contains(c)) { bl = l; br = r; bc = c }
      }
      merges += ((round + 1, bl, br, bc))
      val members = pairWords.getOrElse((bl, br), mutable.BitSet.empty).toArray
      pairWords.remove((bl, br))
      members.foreach { w =>
        // membership sets are add-only (stale after rewrites) — re-check
        val syms = words(w)
        var hit = false; var j = 0
        while (!hit && j < syms.length - 1) {
          hit = syms(j) == bl && syms(j + 1) == br; j += 1
        }
        if (hit) {
          addPairs(w, -1L)
          words(w) = mergeWord(syms, bl, br)
          addPairs(w, 1L)
        }
      }
      round += 1
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Apply a [[bpeFit]] merge table: segment each document's words into
    * the learned subword symbols (merges replayed in rank order — the
    * standard greedy BPE encoder) and return per-document subword counts.
    * Output: (doc_id, n_words, n_subwords) — the real token counter that
    * [[tokenCounts]]' whitespace/BPE-ish regex approximates.
    *
    * Scale: merges replay over the DISTINCT-WORD vocabulary only (the
    * fast-tokenizer memoization: segment each unique word once), each
    * round a map-only rewrite on the vocab-sized frame with a
    * localCheckpoint so the expression tree stays one-merge deep — the
    * corpus itself is touched by ONE word explode + an equi-join on the
    * word (AQE broadcasts the vocab side while it fits) + one per-doc
    * combiner aggregate. Never numMerges corpus-wide passes. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame): DataFrame =
    bpeEncodeWith(df, idCol, textCol, bpeSegmentVocab(df, textCol, mergesDf))

  /** Segment a corpus's distinct-word vocabulary with a [[bpeFit]] merge
    * table: (w, syms) — the memoizable half of [[bpeEncode]] (a deploy
    * artifact like the fit itself: segment each unique word once, reuse
    * across every encode pass and micro-batch). The whole merge replay is
    * ONE map-only pass via the native [[graft.plans.BpeSegment]]
    * expression (the merge table rides along as a broadcast-sized
    * literal) — numMerges×len scalar work per distinct word inside the
    * task, never a plan layer or eager checkpoint per merge (the round-8
    * form paid one Spark job per merge round). */
  def bpeSegmentVocab(df: DataFrame, textCol: String,
      mergesDf: DataFrame): DataFrame = {
    val merges = mergesDf.select(col("rank"), col("left"), col("right"))
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .select(col("w"), graft.plans.BpeSegment(col("w"), merges).as("syms"))
  }

  /** [[bpeEncode]] against a precomputed [[bpeSegmentVocab]] frame: one
    * corpus word explode + an equi-join on the word (AQE broadcasts the
    * vocab side while it fits) + one per-doc combiner aggregate. Words
    * absent from the segmentation (OOV at serve time) fall back to
    * their character count — the char-level BPE backstop. */
  def bpeEncodeWith(df: DataFrame, idCol: String, textCol: String,
      vocabSegs: DataFrame): DataFrame = {
    val docWords = df.select(col(idCol).cast(LongType).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("__ws"))
      .select(col("doc_id"), explode(col("__ws")).as("w"))
      .filter(length(col("w")) > 0)
    docWords
      .join(vocabSegs.select(col("w"), size(col("syms")).as("__n")), Seq("w"),
        "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("__n"), length(col("w")))).as("n_subwords"))
  }

  /** Per-group tokenizer serving audit over a precomputed
    * [[bpeSegmentVocab]] frame — the "which domain does this tokenizer
    * serve worst" dashboard: word instances, subword totals, fertility
    * (subwords per word, ppm — the standard tokenizer-eval metric),
    * fragmented instances (words splitting into >1 piece, ppm) and OOV
    * instances (absent from the segmentation, i.e. the char-fallback
    * path). Exact integer/ppm arithmetic (DECIMAL cross-multiplies).
    * One word explode + the vocab equi-join (AQE broadcasts the vocab
    * side) + one combiner aggregate to #groups rows. */
  def tokenizerFertility(df: DataFrame, textCol: String, groupCol: String,
      vocabSegs: DataFrame): DataFrame = {
    val words = df.select(col(groupCol),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    words
      .join(vocabSegs.select(col("w"), size(col("syms")).as("__n")),
        Seq("w"), "left")
      .select(col(groupCol),
        coalesce(col("__n"), length(col("w"))).cast(LongType).as("__pieces"),
        col("__n").isNull.cast(LongType).as("__oov"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__pieces")).as("n_subwords"),
        sum(when(col("__pieces") > 1L, 1L).otherwise(0L)).as("__frag"),
        sum(col("__oov")).as("oov_words"))
      .select(col(groupCol), col("n_words"), col("n_subwords"),
        expr("CAST(CAST(n_subwords AS DECIMAL(19,0)) * 1000000" +
          " DIV n_words AS BIGINT)").as("fertility_ppm"),
        expr("CAST(CAST(__frag AS DECIMAL(19,0)) * 1000000" +
          " DIV n_words AS BIGINT)").as("frag_ppm"),
        col("oov_words"))
  }

  /** Bigram-LM quality score per document — the surprisal-proxy filter:
    * each document's bigrams are scored with the corpus conditional
    * table ([[bigramStats]], pass it precomputed via `statsDf` to reuse
    * a memoized build) and the document gets the exact-integer mean
    * `avg_cond_ppm = Σ cond_ppm div n_bigrams` (bigrams absent from the
    * table — rarer than the stats' minCount — count as 0, the "unseen =
    * surprising" penalty). Low scores ≈ improbable token transitions ≈
    * gibberish/boilerplate candidates; a rational mean instead of mean
    * log-prob keeps every value engine-exact (no libm ln drift) while
    * ordering documents the same way for filtering. Documents with < 2
    * tokens score NULL (no bigrams). Output: (doc_id, n_bigrams,
    * avg_cond_ppm).
    *
    * Scale: doc bigrams assemble MAP-SIDE (the [[bigramStats]] fan-out);
    * the stats join is a (w1, w2) equi-join (AQE-splittable on hot
    * pairs); one combiner mean aggregate per doc. */
  def lmQualityScore(df: DataFrame, idCol: String, textCol: String,
      statsDf: Option[DataFrame] = None, minCount: Long = 1L): DataFrame = {
    val stats = statsDf.getOrElse(bigramStats(df, textCol, minCount))
      .select(col("w1"), col("w2"), col("cond_ppm"))
    val bi = df.select(col(idCol).cast(LongType).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(__t) - 1), i -> struct(__t[i-1] AS w1, __t[i] AS w2))"))
        .as("__b"))
      .select(col("doc_id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    bi.join(stats, Seq("w1", "w2"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("cond_ppm"), lit(0L))).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("__s div n_bigrams").as("avg_cond_ppm"))
  }

  /** Windowed co-occurrence statistics (word-association / word2vec-style
    * PMI pass): for every unordered token pair co-occurring within
    * `window` positions at least `minCount` times, the co-occurrence
    * count and the PMI ratio `P(x,y)/(P(x)·P(y)) = pair_n·T/(c_x·c_y)`
    * (= e^PMI; marginals over pair-slot occurrences, T = total pair
    * events). The ratio is one double expression over exact integer
    * counts — the [[Extended.associationRules]] lift tree — so it
    * reproduces bit-for-bit in any engine. Output: (w1, w2, pair_n,
    * pmi_ratio), w1 ≤ w2.
    *
    * Scale: like [[bigramStats]], pairs are assembled MAP-SIDE from each
    * document's token array (index `transform`, fan-out ≤ window·len per
    * doc — no positional self-join); pair counts and slot marginals are
    * combiner-friendly aggregates; the total is a 1-row broadcast. The
    * pair frame feeds three consumers, so it is persisted for the pass
    * and released after a `localCheckpoint` snap (the [[Extended
    * .associationRules]] materialize pattern). The persisted frame and
    * every shuffle carry `xxhash64` LONG word keys, not the word strings
    * (the canonical w1 ≤ w2 string ordering is fixed map-side BEFORE
    * hashing): at sf1 the pair fan-out is tens of millions of rows, and
    * 16-byte key rows cache and shuffle severalfold cheaper than string
    * pairs. Labels rejoin from a vocabulary-sized distinct dictionary.
    * Both the pair fan-out and the dictionary derive from ONE persisted
    * tokenized frame, so the input is evaluated exactly once — with a
    * non-deterministic source (an unseeded sample, a freshly-shuffled
    * frame) a second raw scan could tokenize a DIFFERENT vocabulary and
    * the inner label joins would silently drop pairs (the evalSplitExact
    * single-evaluation hazard). A 64-bit collision across a vocabulary
    * needs ~2³² distinct tokens to become likely; deterministic, so gated
    * by the oracle.
    *
    * `materialize = false` returns the LAZY frame and leaves the shared
    * tokenized/pair frames persisted for the session — the persist IS the
    * single-evaluation guarantee, so it cannot be dropped before the
    * caller's action runs. Callers choosing `false` own the release:
    * evaluate the result, then `spark.catalog.clearCache()` or re-call
    * with `materialize = true` (the default, which snaps via
    * `localCheckpoint` and unpersists both frames before returning). */
  def cooccurrencePairs(df: DataFrame, textCol: String, window: Int,
      minCount: Long = 1L, materialize: Boolean = true): DataFrame = {
    require(window >= 1, "window must be positive")
    require(minCount >= 1, "minCount must be positive")
    // single evaluation point: every downstream frame (pairs, marginals,
    // total, dictionary) reads this materialization, never df again.
    // Docs with <2 tokens can't contribute a pair, and a word appearing
    // only in such docs can't survive the inner join onto pruned pairs,
    // so filtering them out before the dictionary changes nothing.
    val tok = df.select(split(trim(col(textCol)), "\\s+").as("__t"))
      .filter(size(col("__t")) >= 2)
      .persist()
    val pr = tok
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size(__t) - 2), i ->
           |  transform(sequence(i + 1, least(i + $window, size(__t) - 1)), j ->
           |    struct(xxhash64(least(__t[i], __t[j])) AS h1,
           |           xxhash64(greatest(__t[i], __t[j])) AS h2))))""".stripMargin))
        .as("__p"))
      .select(col("__p.h1").as("h1"), col("__p.h2").as("h2"))
      .persist()
    val pairs = pr.groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minCount)
    val marg = pr.select(explode(array(col("h1"), col("h2"))).as("__h"))
      .groupBy(col("__h")).agg(count(lit(1)).as("__c"))
    val tot = pr.agg(count(lit(1)).as("__T"))
    val dict = tok.select(explode(col("__t")).as("__w"))
      .distinct()
      .select(xxhash64(col("__w")).as("__h"), col("__w"))
    val out = pairs
      .join(marg.select(col("__h").as("h1"), col("__c").as("__cx")), "h1")
      .join(marg.select(col("__h").as("h2"), col("__c").as("__cy")), "h2")
      .join(dict.select(col("__h").as("h1"), col("__w").as("w1")), "h1")
      .join(dict.select(col("__h").as("h2"), col("__w").as("w2")), "h2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("pair_n"),
        ((col("pair_n").cast(DoubleType) * col("__T").cast(DoubleType)) /
          (col("__cx").cast(DoubleType) * col("__cy").cast(DoubleType)))
          .as("pmi_ratio"))
    if (!materialize) out
    else {
      val snapped = out.localCheckpoint()
      pr.unpersist(blocking = false)
      tok.unpersist(blocking = false)
      snapped
    }
  }

  /** Per-group [[heavyHitters]]: items at ≥ `minFreqPpm` of EACH group's
    * own stream (e.g. top terms per language, hot keys per tenant), exact
    * by the same sketch-then-recount argument applied group-wise. Output:
    * (groupCols…, itemCol, cnt).
    *
    * Scale: pass 1 is one combiner-friendly aggregate to a k-bounded
    * summary PER GROUP (the sketch state shuffled is k counters per
    * group per partition — independent of each group's keyspace); the
    * candidate relation stays distributed (≤ #groups·k rows — explicitly
    * broadcast, nothing touches the driver, so #groups can be large);
    * pass 2 is a map-only broadcast join + an aggregate over ≤ #groups·k
    * keys. A group's `n` rides the candidate rows — no third pass. */
  def heavyHittersByGroup(df: DataFrame, groupCols: Seq[String],
      itemCol: String, minFreqPpm: Long, k: Int = 1024): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(!groupCols.contains(itemCol), "itemCol cannot be a group column")
    require(minFreqPpm >= 1 && minFreqPpm <= 1000000L, "minFreqPpm in [1, 1e6]")
    require(minFreqPpm * (k + 1L) > 1000000L,
      s"k = $k cannot guarantee the ${minFreqPpm}ppm threshold: " +
        "need minFreqPpm * (k+1) > 1e6 for the no-false-negative bound")
    val g = groupCols.map(col)
    val items = df.select(g :+ col(itemCol).cast(StringType).as("__it"): _*)
      .filter(col("__it").isNotNull)
    val mg = udaf(new graft.functions.MisraGriesAgg(k),
      org.apache.spark.sql.Encoders.STRING)
    val cands = items.groupBy(g: _*).agg(mg(col("__it")).as("__s"))
      .select(g ++ Seq(col("__s.n").as("__n"),
        explode(map_keys(col("__s.items"))).as("__it")): _*)
    items.join(cands, groupCols :+ "__it")  // #groups×k rows, caller-keyed groups — AQE decides
      .groupBy(g :+ col("__it"): _*)
      .agg(count(lit(1)).as("cnt"), max(col("__n")).as("__n"))
      .filter(col("cnt") * lit(1000000L) >= col("__n") * lit(minFreqPpm))
      .select(g ++ Seq(col("__it").as(itemCol), col("cnt")): _*)
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

  // ---------------------------------------------------------------------
  // Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
  // local fingerprinting algorithm). Guarantee: any verbatim token match
  // of length ≥ w+k-1 between two documents shares at least one SELECTED
  // fingerprint, while the index keeps only ~2/(w+1) of all k-gram
  // hashes — the bounded-size sub-document overlap index that whole-doc
  // hashing ([[fingerprint]]) and whole-doc MinHash dilute away.
  // ---------------------------------------------------------------------

  /** Largest token position the sortable window key encodes (7 digits).
    * Longer docs are out of contract — chunk upstream (the span family's
    * PosEnc bound at 2^20 is already far tighter) — and fail loudly. */
  private val WinnowMaxPos = 9999999L

  /** Selected winnowing fingerprints: md5 every k-token gram, slide a
    * w-hash window over each document's gram sequence, keep the RIGHTMOST
    * minimal hash per window, dedupe the picks. Docs with fewer than w
    * grams emit their single overall minimum so every tokenizable doc is
    * represented. Output: (doc_id, pos, fp) — 0-based token offset of the
    * selected gram, one row per distinct pick.
    *
    * Scale: one map-side gram pass; the only window is doc-keyed (bounded
    * by document length — the island-merge class, never corpus-keyed).
    * Rightmost-min-on-ties rides a single window MIN over the sortable
    * key struct(digest bytes, −pos) — no per-window argmin self-join.
    *
    * Key-order equivalence (round 18 — the key used to be the 39-char
    * string `fp || lpad(maxPos−pos, 7)`): md5() emits exactly 32
    * LOWERCASE hex chars, and for fixed-width lowercase hex the UTF8
    * lexicographic order equals the unsigned bytewise order of the
    * decoded 16-byte digest (the hex alphabet '0'<…<'9'<'a'<…<'f' is
    * monotone in nibble value, most-significant nibble first) — which is
    * exactly BinaryType's comparison. The fixed-width positional suffix
    * ordered by maxPos−pos ⇔ the long −pos. struct comparison is
    * field-by-field, so min(struct(unhex(fp), −pos)) selects the same
    * gram as min of the concat key — locked by the naive-MOSS property
    * test and the q242 oracle. */
  def winnow(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1, s"gram size k must be >= 1, got $k")
    require(w >= 1, s"window w must be >= 1, got $w")
    val s = df.sparkSession
    import s.implicits._
    val g = Text.gramPosRows(normalized(df, idCol, textCol), k)
      .select($"doc_id", $"pos", unhex(md5($"gram")).as("fpb"))
    // the 7-digit string encoding is gone, but docs beyond the positional
    // contract still fail loudly (same message, same bound)
    val posKey = when($"pos" > WinnowMaxPos,
        raise_error(concat(lit(s"winnow: token position exceeds " +
          s"$WinnowMaxPos (chunk docs upstream): doc_id="), $"doc_id",
          lit(" pos="), $"pos")))
      .otherwise(-$"pos")
    val sel = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(-(w - 1), 0)
    val perDoc = Window.partitionBy($"doc_id")
    g.withColumn("__key", struct($"fpb".as("f"), posKey.cast(LongType).as("p")))
      .withColumn("__sel", min($"__key").over(sel))
      .withColumn("__n", count(lit(1)).over(perDoc))
      // a window's pick is read at its last row; short docs (< w grams)
      // read the all-doc min at their final gram instead
      .filter($"pos" >= w - 1 || ($"__n" < w && $"pos" === $"__n" - 1))
      .select($"doc_id",
        (-$"__sel".getField("p")).as("pos"),
        lower(hex($"__sel".getField("f"))).as("fp"))
      .distinct()
  }

  /** Document pairs sharing selected winnowing fingerprints, with the
    * shared count — sub-document overlap candidates (quote/plagiarism
    * detection, where MinHash's whole-doc Jaccard dilutes a copied
    * paragraph below any workable threshold). `maxDocFreq` drops
    * fingerprints present in more than that many docs (boilerplate — the
    * equi-join skew cap, same discipline and machinery as the shingle
    * family). Output: (doc_a, doc_b, shared_fps), doc_a < doc_b. */
  def winnowOverlap(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, maxDocFreq: Option[Long] = None): DataFrame =
    winnowOverlapFrom(winnow(df, idCol, textCol, k, w), maxDocFreq)

  /** Internal key for fp equality work (joins, distincts, df caps): the
    * decoded 16-byte digest — half the bytes of the hex string to hash
    * and compare, and injective over valid md5 hex (unhex ∘ lower-hex is
    * a bijection on 32-hex-char strings), so every equality/count over
    * `fpb` equals the same operation over `fp` (guide §4 — cheap keys in
    * hot comparisons; fp never appears in these operators' outputs).
    * Picks frames that already carry a precomputed `fpb` (the memoized
    * index in Text) are used as-is. */
  private def withFpb(picks: DataFrame): DataFrame =
    if (picks.columns.contains("fpb")) picks
    else picks.withColumn("fpb", unhex(col("fp")))

  /** [[winnowOverlap]] over an already-built (possibly persisted) picks
    * frame — the winnowed index is the REUSABLE artifact; pipelines build
    * it once and run overlap/decontam passes from it. */
  def winnowOverlapFrom(picks: DataFrame,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val s = picks.sparkSession
    import s.implicits._
    val fps0 = withFpb(picks).select($"doc_id", $"fpb".as("s")).distinct()
    val fps = maxDocFreq.map(Text.capShingles(fps0, _)).getOrElse(fps0)
    fps.toDF("doc_a", "s")
      .join(fps.toDF("doc_b", "s2"), $"s" === $"s2" && $"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("shared_fps"))
  }

  /** Sub-document decontamination via winnowing: corpus docs sharing
    * selected fingerprints with a benchmark/reference corpus — detects
    * the same verbatim ≥ w+k-1-token quotes as the exact span family
    * (Dedup.spansAgainst) from an index ~2/(w+1) the size of the full
    * gram set, at the price of approximate span positions. `maxDocFreq`
    * caps CORPUS-side fingerprint document frequency (boilerplate); the
    * reference side is benchmark-sized and rides the equi-join as the
    * build side. Output: (doc_id, ref_id, shared_fps). */
  def winnowAgainst(corpus: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refIdCol: String, refTextCol: String,
      k: Int = 4, w: Int = 4, maxDocFreq: Option[Long] = None): DataFrame =
    winnowAgainstFrom(winnow(corpus, idCol, textCol, k, w),
      winnow(ref, refIdCol, refTextCol, k, w), maxDocFreq)

  /** Approximate aligned overlap SPANS between document pairs, from the
    * winnowed index alone — the MOSS report step. Matched fingerprints
    * carry both token positions; picks on the same alignment diagonal
    * (pos_b − pos_a) within `gap` grams of each other coalesce into one
    * span (a verbatim run's selected picks are at most w grams apart, so
    * gap defaults to w). Output: (doc_a, doc_b, start_a, start_b,
    * span_len, n_fps) with span_len in tokens (k-gram end included) —
    * sub-document overlap localization without re-reading any text.
    *
    * Scale: the pair join is the capped fp equi-join (winnowOverlap's
    * discipline); the island merge is the only window, partitioned by
    * (doc_a, doc_b, diagonal) — bounded by a single document's picks. */
  def winnowOverlapSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, maxDocFreq: Option[Long] = None,
      gap: Option[Int] = None): DataFrame =
    winnowOverlapSpansFrom(winnow(df, idCol, textCol, k, w), k,
      gap.getOrElse(w), maxDocFreq)

  /** [[winnowOverlapSpans]] over an already-built picks frame. */
  def winnowOverlapSpansFrom(picks: DataFrame, k: Int, gap: Int,
      maxDocFreq: Option[Long] = None): DataFrame = {
    require(k >= 1, s"gram size k must be >= 1, got $k")
    require(gap >= 1, s"merge gap must be >= 1, got $gap")
    val s = picks.sparkSession
    import s.implicits._
    // df cap counts DOCS per fp (combiner-friendly distinct aggregate);
    // only the over-cap fps — tiny, they're the boilerplate — broadcast
    // back as an anti-join, so the positioned picks stay map-only
    // (capShingles' own discipline, without a corpus-wide semi-join)
    val pk = withFpb(picks)
    val kept = maxDocFreq match {
      case Some(cap) =>
        val hot = pk.select($"doc_id", $"fpb").distinct()
          .groupBy($"fpb").agg(count(lit(1)).as("__df"))
          .filter($"__df" > cap).select($"fpb")
        pk.join(broadcast(hot), Seq("fpb"), "left_anti")
      case None => pk
    }
    val a = kept.select($"doc_id".as("doc_a"), $"pos".as("pos_a"), $"fpb")
    val b = kept.select($"doc_id".as("doc_b"), $"pos".as("pos_b"), $"fpb")
    val m = a.join(b, Seq("fpb")).filter($"doc_a" < $"doc_b")
      .withColumn("diag", $"pos_b" - $"pos_a")
    val byDiag = Window.partitionBy($"doc_a", $"doc_b", $"diag")
      .orderBy($"pos_a")
    val runs = Window.partitionBy($"doc_a", $"doc_b", $"diag")
      .orderBy($"pos_a").rowsBetween(Window.unboundedPreceding, 0)
    m.withColumn("__prev", lag($"pos_a", 1).over(byDiag))
      .withColumn("__new",
        when($"__prev".isNull || $"pos_a" - $"__prev" > gap, 1L).otherwise(0L))
      .withColumn("__island", sum($"__new").over(runs))
      .groupBy($"doc_a", $"doc_b", $"diag", $"__island")
      .agg(min($"pos_a").as("start_a"),
        (min($"pos_a") + $"diag").as("start_b"),
        (max($"pos_a") - min($"pos_a") + k).as("span_len"),
        count(lit(1)).as("n_fps"))
      .select($"doc_a", $"doc_b", $"start_a", $"start_b", $"span_len",
        $"n_fps")
  }

  /** [[winnowAgainst]] over already-built picks frames (winnow is a pure
    * per-document function, so picks of a filtered corpus ≡ filtered
    * picks of the corpus — build the index once, slice it per pass). */
  def winnowAgainstFrom(corpusPicks: DataFrame, refPicks: DataFrame,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val s = corpusPicks.sparkSession
    import s.implicits._
    val cfp0 = withFpb(corpusPicks).select($"doc_id", $"fpb".as("s")).distinct()
    val cfp = maxDocFreq.map(Text.capShingles(cfp0, _)).getOrElse(cfp0)
    val rfp = withFpb(refPicks)
      .select($"doc_id".as("ref_id"), $"fpb".as("s")).distinct()
    cfp.join(rfp, "s")
      .groupBy($"doc_id", $"ref_id").agg(count(lit(1)).as("shared_fps"))
  }
}
