package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Ops._

/** Text-analysis + deduplication operators over the `documents` table — the
  * LLM-training-data-pipeline extension surface (SURVEY.md §7.2 M5). All are
  * shuffle-conscious: candidate generation always goes through an equi-join
  * key (shingle, band signature, hash) so the plan is a shuffled hash join on
  * a high-cardinality key — never a cartesian — and survives a 100×
  * scale-up. Hashes are md5-derived (graft.functions.Ops.md5Long) so every
  * engine reproduces them bit-for-bit.
  */
object Text {

  /** whitespace tokenization; `\s+` split of trimmed text. */
  private[operators] val toks: Column = split(trim(col("text")), "\\s+")

  /** Positioned word n-gram rows (doc_id, pos, gram, carry...), one row per
    * gram INSTANCE with its 0-based start position, built codegen-friendly:
    * posexplode tokens, stitch each gram with window lead()s, keep
    * positions that fit. A `transform(sequence, …)` array expression is
    * interpreted (higher-order functions don't codegen) and re-evaluates
    * per explode output row — measured 8× slower at sf0.1. Cost: one
    * shuffle on doc_id (window sort by pos); docs ≫ partitions so it
    * scales evenly. The single body behind both the shingle family
    * (positions dropped) and the repeated-span family (positions kept). */
  private[operators] def gramPosRows(docs: DataFrame, n: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    val parts = $"tok" +: (1 until n).map(i => lead($"tok", i).over(byDoc))
    docs.withColumn("toks", toks)
      .select(Seq($"doc_id", size($"toks").as("n_toks"),
        posexplode($"toks").as(Seq("pos", "tok")): Column) ++
        carryCols.map(col): _*)
      .withColumn("gram", concat_ws(" ", parts: _*))
      .filter($"pos" <= $"n_toks" - n)
      .select($"doc_id" +: $"pos" +: $"gram" +: carryCols.map(col): _*)
  }

  /** word n-gram rows (doc_id, gram, carry...) — [[gramPosRows]] with the
    * position dropped (the shingle-family layout). */
  private[operators] def gramRows(docs: DataFrame, n: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    gramPosRows(docs, n, carryCols)
      .select($"doc_id" +: $"gram" +: carryCols.map(col): _*)
  }

  /** (doc_id, s) distinct 4-gram shingle pairs — the inverted-index layout.
    * Memoized per (session, dir) and persisted: three operators (Jaccard,
    * MinHash, clustering) share this relation, and recomputing the shingle
    * generation dominates their cost. */
  private val shCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    shCache.getOrElseUpdate((s, d), {
      import s.implicits._
      gramRows(Tables.documents(s, d), 4)
        .select($"doc_id", $"gram".as("s")).distinct()
        .persist()
    })

  /** Drop shingles whose document frequency exceeds `cap` — skew-safely:
    * df via combiner-friendly groupBy (map-side partials shrink a
    * corpus-wide shingle to #partitions rows), over-cap keys (tiny — only
    * the hot shingles) anti-joined back broadcast, map-only over the corpus
    * side. Never a shingle-keyed window. */
  private[operators] def capShingles(sh: DataFrame, cap: Long): DataFrame = {
    val s = sh.sparkSession
    import s.implicits._
    val hot = sh.groupBy($"s").agg(count(lit(1)).as("__df"))
      .filter($"__df" > cap).select($"s")
    // a USING-column join moves the key first; restore (doc_id, s) so
    // downstream positional renames keep working
    sh.join(broadcast(hot), Seq("s"), "left_anti").select($"doc_id", $"s")
  }

  /** df cap for the oracled near-dup pair chain (q34 → q47 → q49): a shingle
    * in more than this many documents is boilerplate — it can't discriminate
    * near-dups, and it blows the candidate equi-join up quadratically (df
    * docs → df² candidate pairs). The DuckDB oracles apply the identical cap
    * (HAVING COUNT(*) <= cap on the shingle CTE), so correctness is checked
    * on the capped semantics. q54 (overlap) and q35 (minhash sigs) stay
    * uncapped: overlap *measures* hot shingles, and minhash aggregates
    * per-doc without a shingle-keyed join. */
  private[operators] val MaxDocFreq = 100L
  private val cappedShCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def cappedShingleRows(s: SparkSession, d: String): DataFrame =
    cappedShCache.getOrElseUpdate((s, d),
      capShingles(shingleRows(s, d), MaxDocFreq).persist())

  /** Drop every materialized dedup stage for (session, dir) — call after
    * re-ingesting/compacting the documents table in a long-lived session so
    * the pipeline rebuilds from the new files. */
  def invalidateCaches(s: SparkSession, d: String): Unit = {
    Seq(shCache, cappedShCache, pairCache, labelCache, sigCache, spanCache,
      decontamSpanCache, winnowCache).foreach { c =>
      c.remove((s, d)).foreach(_.unpersist(blocking = false))
    }
    Curation.invalidateCaches(s, d)
    Similarity.invalidateCaches(s, d)
    Corpus.invalidateCaches(s, d)
    Graphs.invalidateCaches(s, d)
    Extended.invalidateCaches(s, d)
  }

  /** Which memoized CHAIN artifacts are live for (session, dir) —
    * everything [[invalidateCaches]] would drop, EXCLUDING the scalar
    * count caches (a Long recount is not a chain build worth cold-timing).
    * [[graft.ColdDetect]] derives Bench's cold-set contract from this:
    * a query that repopulates any chain after a full invalidation is a
    * query whose warm time hides a build, and every chain LABEL must
    * have at least one cold-timed representative. */
  def cacheLabels(s: SparkSession, d: String): Set[String] =
    Seq("text.shingles" -> shCache, "text.cappedShingles" -> cappedShCache,
      "text.pairs" -> pairCache, "text.labels" -> labelCache,
      "text.sigs" -> sigCache, "text.spans" -> spanCache,
      "text.decontamSpans" -> decontamSpanCache,
      "text.winnow" -> winnowCache)
      .collect { case (l, c) if c.contains((s, d)) => l }.toSet ++
      Curation.cacheLabels(s, d) ++ Similarity.cacheLabels(s, d) ++
      Corpus.cacheLabels(s, d) ++ Graphs.cacheLabels(s, d) ++
      Extended.cacheLabels(s, d)
  /** Shared minhash oracle snippets — the SQL twins of minhashSigsFrom /
    * bandedKeys / estSim, reused by every minhash oracle (q35, q68, q227,
    * q245) so signature salts and banding can never drift per-oracle:
    * `sigs` + `banded` CTEs over a preceding `sh` shingle CTE (k=8, 2
    * bands of 4), and the per-signature match-count expression. */
  private[operators] val minhashSigBandSql: String = {
    val mins = (0 until 8).map(i =>
      s"min(${graft.functions.Ops.md5LongSql(s"concat('s$i:', s)")}) AS h$i")
      .mkString(",\n  ")
    s"""sigs AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, 0 AS band, concat_ws(',', h0, h1, h2, h3) AS bkey FROM sigs
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, concat_ws(',', h4, h5, h6, h7) AS bkey FROM sigs)""".stripMargin
  }
  private[operators] val minhashMatchesSql: String =
    (0 until 8).map(i => s"CASE WHEN x.h$i = y.h$i THEN 1 ELSE 0 END")
      .mkString(" + ")

  // AS MATERIALIZED on every multi-referenced CTE: DuckDB re-inlines a
  // plain CTE per reference, so a deep consumer chain re-runs the shingle
  // explosion once per path — q175's chain reached 96 evaluations of
  // `sh`/`toks` under inline semantics (the q98/q125 sf1-DNF class,
  // caught by the round-14 lint regex fix that made column-aliased CTE
  // defs visible to the multiplicity walk)
  private[operators] val shingleRowsSql =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(t)-2,1)),
      |       i -> array_to_string(t[i:i+3], ' ')))) AS s FROM toks)""".stripMargin
  // identical df cap as cappedShingleRows, applied oracle-side: sh is
  // already distinct (doc_id, s), so COUNT(*) per s IS the doc frequency
  private def cappedShingleRowsSql =
    s"""$shingleRowsSql,
       |hot AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) > $MaxDocFreq),
       |shc AS MATERIALIZED (SELECT doc_id, s FROM sh
       |        WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.s = sh.s))""".stripMargin

  // q29 — token counting: whitespace tokens + a BPE-ish regex token count
  // (letters / digits / single punctuation as separate tokens).
  private def q29(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextStats.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      .orderBy($"doc_id")
  }
  private val q29Sql =
    """SELECT doc_id,
      | CAST(length(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
      | CAST(length(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_bpeish,
      | CAST(length(text) AS INTEGER) AS len,
      | CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      |   / length(string_split_regex(trim(text), '\s+')) AS avg_tok_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // q30 — quality scoring: length, stopword ratio, alpha ratio, punctuation.
  private def q30(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextStats.quality(Tables.documents(s, d), "doc_id", "text")
      .orderBy($"doc_id")
  }
  private val q30Sql =
    """SELECT doc_id,
      | CAST(length(text) AS INTEGER) AS n_chars,
      | CAST(length(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_words,
      | CAST(length(regexp_extract_all(text, '\b(the|a|or|and)\b')) AS INTEGER) AS n_stop,
      | CAST(length(regexp_extract_all(text, '\b(the|a|or|and)\b')) AS DOUBLE)
      |   / length(string_split_regex(trim(text), '\s+')) AS stop_ratio,
      | CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
      | CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS INTEGER) AS n_punct
      |FROM documents ORDER BY doc_id""".stripMargin

  // q31 — language-ID heuristic: per-language stopword hit counts, argmax
  // with a fixed tie-break order (en > de > es > fr > unknown).
  private val langMarkers = Seq(
    "en" -> "\\b(the|and|of|to|or)\\b",
    "de" -> "\\b(der|die|das|und|nicht)\\b",
    "es" -> "\\b(el|los|las|y|que)\\b",
    "fr" -> "\\b(le|les|et|est|une)\\b")
  private def q31(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    TextStats.langId(docs, "doc_id", "text", langMarkers)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .withColumn("is_match", when($"predicted" === $"lang", 1).otherwise(0))
      .orderBy($"doc_id")
  }
  private val q31Sql = {
    val counts = langMarkers.map { case (l, re) =>
      val dre = re.replace("\\b", "\\b") // same in RE2
      s"CAST(length(regexp_extract_all(text, '$dre')) AS INTEGER) AS c_$l"
    }.mkString(",\n ")
    """SELECT doc_id, lang, %s,
      | CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en > 0 THEN 'en'
      |      WHEN c_de >= c_es AND c_de >= c_fr AND c_de > 0 THEN 'de'
      |      WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
      |      WHEN c_fr > 0 THEN 'fr'
      |      ELSE 'unknown' END AS predicted,
      | CASE WHEN (CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en > 0 THEN 'en'
      |      WHEN c_de >= c_es AND c_de >= c_fr AND c_de > 0 THEN 'de'
      |      WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
      |      WHEN c_fr > 0 THEN 'fr'
      |      ELSE 'unknown' END) = lang THEN 1 ELSE 0 END AS is_match
      |FROM documents ORDER BY doc_id""".stripMargin.format(counts)
  }

  // q222 — lang-ID confusion matrix: gold label × prediction counts from
  // the q31 heuristic — the eval table that tells you WHERE the classifier
  // fails, not just how often. One combiner aggregate over the scored
  // relation.
  private def q222(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    TextStats.langId(docs, "doc_id", "text", langMarkers)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"predicted")
  }
  private val q222Sql = {
    val counts = langMarkers.map { case (l, re) =>
      s"CAST(length(regexp_extract_all(text, '$re')) AS INTEGER) AS c_$l"
    }.mkString(",\n ")
    """WITH scored AS (SELECT lang, %s FROM documents),
      |p AS (SELECT lang,
      |  CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en > 0 THEN 'en'
      |       WHEN c_de >= c_es AND c_de >= c_fr AND c_de > 0 THEN 'de'
      |       WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
      |       WHEN c_fr > 0 THEN 'fr'
      |       ELSE 'unknown' END AS predicted
      |  FROM scored)
      |SELECT lang, predicted, COUNT(*) AS n_docs
      |FROM p GROUP BY lang, predicted
      |ORDER BY lang, predicted""".stripMargin.format(counts)
  }

  // q223 — leakage-safe train/val/test split: assignment keyed by the
  // near-dup cluster (q47's canonical labels), so near-duplicates can
  // never straddle splits — by construction, which the n_clusters sums
  // across splits confirm (Σ n_clusters = total distinct clusters only
  // when no cluster repeats per split pair).
  private def q223(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val labels = clusterLabels(s, d)
    val clustersDf = Tables.documents(s, d)
      .join(labels, $"doc_id" === $"n", "left_outer")
      .select($"doc_id", coalesce($"lbl", $"doc_id").as("canonical_id"))
    Curation.splitByCluster(
        Tables.documents(s, d).select($"doc_id", $"n_chars"), "doc_id", clustersDf)
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"canonical_id").as("n_clusters"),
        sum($"n_chars").as("sum_chars"))
      .orderBy($"split")
  }
  private lazy val q223Sql =
    s"""WITH RECURSIVE $closureCtes,
       |canon AS (SELECT d.doc_id, coalesce(c.lbl, d.doc_id) AS canonical_id,
       |    d.n_chars
       |  FROM documents d LEFT OUTER JOIN comp c ON d.doc_id = c.n),
       |sp AS (SELECT *,
       |    CASE WHEN ${graft.functions.Ops.md5LongSql("'split:' || canonical_id")} % 100 < 80 THEN 'train'
       |         WHEN ${graft.functions.Ops.md5LongSql("'split:' || canonical_id")} % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM canon)
       |SELECT split, COUNT(*) AS n_docs,
       |  COUNT(DISTINCT canonical_id) AS n_clusters,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM sp GROUP BY split ORDER BY split""".stripMargin

  // q32 — document fingerprinting: md5 of the normalized text + a positional
  // polynomial bag hash over tokens (rolling-hash style, exact integers).
  private def q32(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextStats.fingerprint(Tables.documents(s, d), "doc_id", "text")
      .orderBy($"doc_id")
  }
  private val q32Sql =
    s"""WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
       |           FROM documents),
       |t AS (SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM n)
       |SELECT doc_id, min(md5(norm)) AS md5_fp,
       | CAST(SUM((${md5LongSql("toks[i]")} % 1000003) * (((i-1) % 31) + 1)) AS BIGINT) AS bag_fp
       |FROM t, unnest(range(1, len(toks)+1)) u(i)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // q33 — exact deduplication: canonical = min doc_id per content hash.
  // groupBy(md5(text)) + join-back, NOT a hash-partitioned window: the hot
  // key of exact dedup is a page duplicated millions of times, and the
  // map-side-combinable aggregate shrinks it to #partitions partial rows
  // before the shuffle (AQE then splits the skewed join-back partition).
  private def q33(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.documents(s, d).select($"doc_id", md5($"text").as("__h"))
    val canon = hashed.groupBy($"__h")
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
    hashed.join(canon, "__h")
      .select($"doc_id", $"canonical_id", $"n_copies")
      .withColumn("is_dup",
        when($"doc_id" =!= $"canonical_id", 1).otherwise(0))
      .orderBy($"doc_id")
  }
  private val q33Sql =
    """SELECT doc_id,
      | min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
      | count(*) OVER (PARTITION BY md5(text)) AS n_copies,
      | CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
      |      THEN 1 ELSE 0 END AS is_dup
      |FROM documents ORDER BY doc_id""".stripMargin

  // q34 — n-gram Jaccard near-dup pairs: inverted-index candidate join on
  // shared 4-gram shingles (equi-join, shuffles on the shingle — never
  // all-pairs), then exact Jaccard ≥ 0.8. The chain runs on the df-capped
  // shingle relation (MaxDocFreq, same cap in the oracle): without the cap a
  // shingle in D documents emits D² candidate pairs, so one corpus-wide
  // boilerplate n-gram would dominate the whole join.
  //
  // The pair graph is a shared pipeline stage: q34 reports it, q47 clusters
  // it, q49 picks winners per cluster. A real dedup pipeline materializes it
  // once, so it's memoized per (session, dir) and persisted, like shingleRows.
  /** Jaccard≥threshold pairs from a distinct (doc_id, s) shingle relation:
    * inverted-index equi-join on the shingle, shared-count agg, exact
    * Jaccard via per-doc sizes. The core the public Dedup API and the
    * oracled queries share. */
  private[operators] def jaccardPairsFrom(sh: DataFrame, threshold: Double): DataFrame = {
    val s = sh.sparkSession
    import s.implicits._
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.toDF("doc_a", "s").join(sh.toDF("doc_b", "s2"),
        $"s" === $"s2" && $"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .select($"doc_a", $"doc_b", $"shared",
        ($"shared".cast(DoubleType) / ($"na" + $"nb" - $"shared")).as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /** Shingle CONTAINMENT pairs — the asymmetric near-dup measure
    * Jaccard misses: containment = shared / |smaller doc's shingles|, so
    * an excerpt or quoted passage scores ~1 against its source even when
    * the size mismatch keeps Jaccard low. Same inverted-index candidate
    * join and df-capped vector space as [[jaccardPairsFrom]]; output
    * (doc_a, doc_b, shared, containment), doc_a < doc_b. */
  private[operators] def containmentPairsFrom(sh: DataFrame,
      threshold: Double): DataFrame = {
    val s = sh.sparkSession
    import s.implicits._
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.toDF("doc_a", "s").join(sh.toDF("doc_b", "s2"),
        $"s" === $"s2" && $"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .select($"doc_a", $"doc_b", $"shared",
        ($"shared".cast(DoubleType) / least($"na", $"nb")).as("containment"))
      .filter($"containment" >= threshold)
  }

  // q111 — excerpt/quote detection: pairs where the smaller document's
  // shingle set is ≥ 90% contained in the other — asymmetric near-dups
  // the symmetric Jaccard gate (q34) under-scores. Shares the memoized
  // capped shingle relation with the q34 chain.
  private def q111(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    containmentPairsFrom(cappedShingleRows(s, d), 0.9)
      .orderBy($"doc_a", $"doc_b")
  }
  private val q111Sql =
    s"""WITH $cappedShingleRowsSql,
       |sizes AS (SELECT doc_id, count(*) n FROM shc GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) shared
       |          FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared,
       |  CAST(shared AS DOUBLE) / least(x.n, y.n) AS containment
       |FROM pairs JOIN sizes x ON doc_a = x.doc_id JOIN sizes y ON doc_b = y.doc_id
       |WHERE CAST(shared AS DOUBLE) / least(x.n, y.n) >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin

  private val pairCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def nearDupPairs(s: SparkSession, d: String): DataFrame =
    pairCache.getOrElseUpdate((s, d),
      jaccardPairsFrom(cappedShingleRows(s, d), 0.8).persist())
  private def q34(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    nearDupPairs(s, d).orderBy($"doc_a", $"doc_b")
  }
  private val q34Sql =
    s"""WITH $cappedShingleRowsSql,
       |sizes AS (SELECT doc_id, count(*) n FROM shc GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) shared
       |          FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared,
       |  CAST(shared AS DOUBLE) / (x.n + y.n - shared) AS jaccard
       |FROM pairs JOIN sizes x ON doc_a = x.doc_id JOIN sizes y ON doc_b = y.doc_id
       |WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  // q35 — MinHash + LSH near-dup candidates: k=8 md5-derived min-hashes,
  // 2 bands × 4 rows; banding explodes to (band, key) rows so candidate
  // generation is a plain equi-join on the band key (the scalable LSH path),
  // est_sim = matching-signature fraction.
  private val K = 8

  /** k md5-derived min-hashes per doc from a distinct (doc_id, s) shingle
    * relation — permutation-free MinHash (one aggregate, columns h0..h{k-1}). */
  private[operators] def minhashSigsFrom(sh: DataFrame, k: Int): DataFrame = {
    val s = sh.sparkSession
    import s.implicits._
    sh.groupBy($"doc_id").agg(
      min(md5Long(concat(lit("s0:"), $"s"))).as("h0"),
      (1 until k).map(i => min(md5Long(concat(lit(s"s$i:"), $"s"))).as(s"h$i")): _*)
  }

  /** (doc_id, band, bkey) LSH band-key rows: `bands` bands of k/bands
    * signature rows each, band key = the concatenated row hashes. */
  private def bandedKeys(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val s = sigs.sparkSession
    import s.implicits._
    val r = k / bands
    sigs.select($"doc_id", explode(array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        concat_ws(",", (b * r until (b + 1) * r).map(i => col(s"h$i")): _*).as("bkey"))): _*))
      .as("b")).select($"doc_id", $"b.band", $"b.bkey")
  }

  /** Matching-signature fraction between the x-/y-renamed signature sides. */
  private def estSim(k: Int): Column =
    ((0 until k).map(i => when(col(s"x$i") === col(s"y$i"), 1).otherwise(0))
      .reduce(_ + _).cast(DoubleType) / k).as("est_sim")

  /** LSH banding over minhash signatures: `bands` bands of k/bands rows;
    * candidates = equi-join on (band, key); est_sim = matching fraction. */
  private[operators] def minhashPairsFrom(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val s = sigs.sparkSession
    import s.implicits._
    val banded = bandedKeys(sigs, k, bands)
    val cand = banded.toDF("doc_a", "band", "bkey")
      .join(banded.toDF("doc_b", "band2", "bkey2"),
        $"band" === $"band2" && $"bkey" === $"bkey2" && $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    val x = sigs.toDF(("doc_a" +: (0 until k).map(i => s"x$i")): _*)
    val y = sigs.toDF(("doc_b" +: (0 until k).map(i => s"y$i")): _*)
    cand.join(x, "doc_a").join(y, "doc_b")
      .select($"doc_a", $"doc_b", estSim(k))
  }

  /** Cross-corpus LSH candidates: corpus docs (sigsA) whose band keys
    * collide with reference docs (sigsB) — the fuzzy-decontamination
    * candidate path. Same band equi-join shape as [[minhashPairsFrom]], but
    * across two signature relations and without the a<b dedup (a corpus doc
    * pairs with every ref doc it collides with).
    * Output: (doc_id, ref_id, est_sim). */
  private[operators] def minhashPairsAcross(sigsA: DataFrame, sigsB: DataFrame,
      k: Int, bands: Int): DataFrame = {
    val s = sigsA.sparkSession
    import s.implicits._
    val cand = bandedKeys(sigsA, k, bands).toDF("doc_id", "band", "bkey")
      .join(bandedKeys(sigsB, k, bands).toDF("ref_id", "band2", "bkey2"),
        $"band" === $"band2" && $"bkey" === $"bkey2")
      .select($"doc_id", $"ref_id").distinct()
    val x = sigsA.toDF(("doc_id" +: (0 until k).map(i => s"x$i")): _*)
    val y = sigsB.toDF(("ref_id" +: (0 until k).map(i => s"y$i")): _*)
    cand.join(x, "doc_id").join(y, "ref_id")
      .select($"doc_id", $"ref_id", estSim(k))
  }

  // sigs feeds three branches (banding + both verify sides); memoized +
  // persisted per (session, dir) so repeat calls don't stack cached copies
  private val sigCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def minhashSigs(s: SparkSession, d: String): DataFrame =
    sigCache.getOrElseUpdate((s, d), minhashSigsFrom(shingleRows(s, d), K).persist())

  private def q35(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    minhashPairsFrom(minhashSigs(s, d), K, bands = 2).orderBy($"doc_a", $"doc_b")
  }

  // q227 — fuzzy-vs-exact near-miss audit: the q35 candidate pairs split
  // into byte-identical content (exact dedup already handles these) vs
  // TRUE near-misses — the review queue that justifies running fuzzy
  // dedup at all. One md5 join-back onto the memoized pair frame; no
  // re-shingling.
  private def q227(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = minhashPairsFrom(minhashSigs(s, d), K, bands = 2)
    val h = Tables.documents(s, d).select($"doc_id", md5($"text").as("__h"))
    pairs
      .join(h.select($"doc_id".as("doc_a"), $"__h".as("__ha")), "doc_a")
      .join(h.select($"doc_id".as("doc_b"), $"__h".as("__hb")), "doc_b")
      .withColumn("same_content", when($"__ha" === $"__hb", 1).otherwise(0))
      .select($"doc_a", $"doc_b", $"est_sim", $"same_content")
      .orderBy($"doc_a", $"doc_b")
  }
  private val q227Sql =
    s"""WITH $shingleRowsSql,
       |$minhashSigBandSql,
       |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |hh AS (SELECT doc_id, md5(text) AS h FROM documents)
       |SELECT doc_a, doc_b, CAST($minhashMatchesSql AS DOUBLE) / $K AS est_sim,
       |  CASE WHEN ha.h = hb.h THEN 1 ELSE 0 END AS same_content
       |FROM cand JOIN sigs x ON doc_a = x.doc_id JOIN sigs y ON doc_b = y.doc_id
       |JOIN hh ha ON doc_a = ha.doc_id JOIN hh hb ON doc_b = hb.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  private val q35Sql =
    s"""WITH $shingleRowsSql,
       |$minhashSigBandSql,
       |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST($minhashMatchesSql AS DOUBLE) / $K AS est_sim
       |FROM cand JOIN sigs x ON doc_a = x.doc_id JOIN sigs y ON doc_b = y.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------------
  // q231–q234 — repeated-span (ExactSubstr-style) dedup family: exact
  // token-level substring dedup re-expressed as gram-keyed aggregates
  // (Dedup.repeatedSpans and friends). Gate k=5 so the synthetic corpus
  // exposes partial-overlap spans, not only whole-document copies; the
  // public API defaults to the paper's 50.
  // ------------------------------------------------------------------
  private val SpanK = 5

  /** Shared oracle CTE prefix: positioned k-gram md5 keys + global
    * occurrence stats. DuckDB slices 1-based; p0 re-bases to the engine's
    * 0-based token offsets, and the first-occurrence key uses the same
    * doc_id*2^20+pos encoding as Dedup.PosEnc. */
  private def gramStatsSql(k: Int): String =
    s"""toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') t FROM documents),
       |starts AS (SELECT doc_id, t,
       |    unnest(range(1, greatest(len(t)-$k+2, 1))) AS pos FROM toks),
       |g AS (SELECT doc_id, pos - 1 AS p0,
       |    md5(array_to_string(t[pos:pos+$k-1], ' ')) AS h FROM starts),
       |stats AS (SELECT h, COUNT(*) AS cnt,
       |    MIN(doc_id*1048576 + p0) AS firstk FROM g GROUP BY h),
       |dup AS (SELECT doc_id, p0 FROM g JOIN stats USING(h)
       |        WHERE cnt > 1 AND doc_id*1048576 + p0 <> firstk)""".stripMargin

  /** Shared island-merge CTE block: a `dup` CTE of (doc_id, p0) flagged
    * window starts in, a `spans` CTE of maximal spans out — the one SQL
    * mirror of Dedup.spansFromStarts for BOTH span families. */
  private def islandMergeSql(k: Int): String =
    s"""lagd AS (SELECT doc_id, p0,
       |    lag(p0) OVER (PARTITION BY doc_id ORDER BY p0) AS prev FROM dup),
       |isl AS (SELECT doc_id, p0,
       |    SUM(CASE WHEN prev IS NULL OR p0 - prev > $k THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY p0 ROWS UNBOUNDED PRECEDING)
       |      AS island FROM lagd),
       |spans AS (SELECT doc_id, CAST(MIN(p0) AS BIGINT) AS span_start,
       |    CAST(MAX(p0) + $k - MIN(p0) AS BIGINT) AS span_len,
       |    CAST(COUNT(*) AS BIGINT) AS n_dup_grams
       |  FROM isl GROUP BY doc_id, island)""".stripMargin

  /** Shared removal suffix: `toks` + `spans` CTEs in, the span-removed
    * corpus (doc_id, n_toks, n_removed, clean_text) out — the SQL mirror
    * of Dedup.dropRepeatedSpans for both span families. */
  private val spanRemovalSql: String =
    """tok_rows AS (SELECT doc_id, unnest(t) AS tok,
      |    unnest(range(1, len(t)+1)) - 1 AS p0 FROM toks),
      |kept AS (SELECT r.doc_id, r.tok, r.p0 FROM tok_rows r
      |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |    WHERE sp.doc_id = r.doc_id AND r.p0 >= sp.span_start
      |      AND r.p0 < sp.span_start + sp.span_len)),
      |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY p0) AS clean_text
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_toks,
      |  CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(a.clean_text, '') AS clean_text
      |FROM toks t LEFT OUTER JOIN agg a ON t.doc_id = a.doc_id
      |ORDER BY t.doc_id""".stripMargin

  private def spansSql(k: Int): String =
    s"""${gramStatsSql(k)},
       |${islandMergeSql(k)}""".stripMargin

  // q231 — maximal repeated spans (the removal plan exact-substring dedup
  // executes): every 5-token window occurring verbatim elsewhere, merged
  // into maximal per-doc spans, globally-first occurrence kept. The span
  // frame is the natural materialization boundary of the audit → removal
  // pipeline (tiny: one row per maximal span) — memoized so q232's
  // cleanup reuses it instead of recomputing the gram aggregate.
  private val spanCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def spansOf(s: SparkSession, d: String): DataFrame =
    spanCache.getOrElseUpdate((s, d),
      Dedup.repeatedSpans(Tables.documents(s, d), "doc_id", "text", SpanK)
        .persist())
  private def q231(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    spansOf(s, d).orderBy($"doc_id", $"span_start")
  }
  private val q231Sql =
    s"""WITH ${spansSql(SpanK)}
       |SELECT doc_id, span_start, span_len, n_dup_grams FROM spans
       |ORDER BY doc_id, span_start""".stripMargin

  // q256 — the SAME repeated-span pass from Spark SQL TEXT alone (the
  // q253 recipe pattern): positioned k-gram keys in Spark dialect
  // (split/sequence/slice for DuckDB's string_split_regex/range/array
  // slicing), then the island merge — whose SQL is dialect-NEUTRAL, so
  // the statement reuses islandMergeSql verbatim and the two engines
  // can't drift on the merge logic. Gated by q231's exact oracle.
  private def gramStatsSparkSql(k: Int, table: String): String =
    s"""toks AS (SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM $table),
       |starts AS (SELECT doc_id, t, explode(sequence(0, size(t) - $k)) AS p0
       |  FROM toks WHERE size(t) >= $k),
       |g AS (SELECT doc_id, p0,
       |    md5(concat_ws(' ', slice(t, p0 + 1, $k))) AS h FROM starts),
       |stats AS (SELECT h, COUNT(*) AS cnt,
       |    MIN(doc_id*1048576 + p0) AS firstk FROM g GROUP BY h),
       |dup AS (SELECT doc_id, p0 FROM g JOIN stats USING(h)
       |        WHERE cnt > 1 AND doc_id*1048576 + p0 <> firstk)""".stripMargin
  private def q256(s: SparkSession, d: String): DataFrame = {
    Tables.registerViewOnce(s, d, "graft_documents")(Tables.documents(s, d))
    s.sql(
      s"""WITH ${gramStatsSparkSql(SpanK, "graft_documents")},
         |${islandMergeSql(SpanK)}
         |SELECT doc_id, span_start, span_len, n_dup_grams FROM spans
         |ORDER BY doc_id, span_start""".stripMargin)
  }
  private val q256Sql = q231Sql

  // q232 — span-level dedup applied: corpus with every repeated span's
  // tokens dropped (whole-copy docs come back empty), plus removal counts.
  private def q232(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.dropRepeatedSpans(Tables.documents(s, d), "doc_id", "text", SpanK,
        spansDf = Some(spansOf(s, d)))
      .orderBy($"doc_id")
  }
  private val q232Sql =
    s"""WITH ${spansSql(SpanK)},
       |$spanRemovalSql""".stripMargin

  // q233 — directional cross-source k-gram containment matrix: the
  // cross-corpus redundancy readout behind dedup-before-mixing decisions
  // (q166's vocab-overlap pattern lifted from unigrams to 5-grams, made
  // asymmetric because containment is).
  private def q233(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.crossGroupContainment(Tables.documents(s, d), "doc_id", "text",
        "source", SpanK)
      .orderBy($"group_a", $"group_b")
  }
  private val q233Sql =
    s"""WITH ${gramStatsSql(SpanK)},
       |sg AS (SELECT DISTINCT dd.source AS grp, g.h
       |  FROM g JOIN documents dd ON g.doc_id = dd.doc_id),
       |sizes AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng FROM sg GROUP BY grp),
       |sh AS (SELECT a.grp AS group_a, b.grp AS group_b,
       |    CAST(COUNT(*) AS BIGINT) AS shared_grams
       |  FROM sg a JOIN sg b ON a.h = b.h AND a.grp <> b.grp
       |  GROUP BY 1, 2)
       |SELECT group_a, group_b, x.ng AS grams_a, shared_grams,
       |  CAST(CAST(shared_grams AS HUGEINT) * 1000000 // x.ng AS BIGINT)
       |    AS containment_ppm
       |FROM sh JOIN sizes x ON group_a = x.grp
       |ORDER BY group_a, group_b""".stripMargin

  // q234 — per-document novelty ppm: the corpus-growth audit ("how much of
  // this crawl is genuinely new content?"); a doc scoring 0 is pure
  // repetition of earlier material.
  private def q234(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.noveltyScores(Tables.documents(s, d), "doc_id", "text", SpanK)
      .orderBy($"doc_id")
  }
  private val q234Sql =
    s"""WITH ${gramStatsSql(SpanK)},
       |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
       |  FROM g GROUP BY doc_id),
       |dd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
       |  FROM dup GROUP BY doc_id)
       |SELECT p.doc_id, p.n_grams, CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup,
       |  CAST((p.n_grams - coalesce(d.n_dup, 0)) * 1000000 // p.n_grams
       |    AS BIGINT) AS novelty_ppm
       |FROM per p LEFT OUTER JOIN dd d ON p.doc_id = d.doc_id
       |ORDER BY p.doc_id""".stripMargin

  // q242/q243 — winnowing fingerprints (TextStats.winnow, the MOSS local
  // fingerprinting algorithm): the bounded sub-document overlap index —
  // any verbatim match of ≥ w+k-1 tokens is guaranteed a shared selected
  // fingerprint while the index keeps ~2/(w+1) of the gram hashes. Gate
  // k=4 (the shingle width) and w=4; q243 pairs docs on shared selected
  // fingerprints under the standard df cap.
  private val WinK = 4
  private val WinW = 4

  /** Shared oracle CTE chain ending in `pick` (doc_id, pos, fp): the SQL
    * twin of TextStats.winnow — same md5 gram hash, same sortable
    * rightmost-min key fp || lpad(9999999-pos). */
  private def winnowSelSql(k: Int, w: Int): String =
    s"""toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') t FROM documents),
       |starts AS (SELECT doc_id, t,
       |    unnest(range(1, greatest(len(t)-$k+2, 1))) AS pos FROM toks),
       |gw AS (SELECT doc_id, pos - 1 AS p0,
       |    md5(array_to_string(t[pos:pos+$k-1], ' ')) AS fp FROM starts),
       |keyed AS (SELECT doc_id, p0,
       |    fp || lpad(CAST(9999999 - p0 AS VARCHAR), 7, '0') AS key FROM gw),
       |sel AS (SELECT doc_id, p0,
       |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p0
       |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS sk,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS n FROM keyed),
       |pick AS (SELECT DISTINCT doc_id,
       |    CAST(9999999 - CAST(substr(sk, 33, 7) AS BIGINT) AS BIGINT) AS pos,
       |    substr(sk, 1, 32) AS fp
       |  FROM sel WHERE p0 >= $w - 1 OR (n < $w AND p0 = n - 1))""".stripMargin

  // the selected-fingerprint frame feeds q242/q243/q246 — memoized +
  // persisted per (session, dir) like the shingle/span stages (its build
  // is surfaced COLD in Bench via q242's coldNames entry)
  private val winnowCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  // the persisted index also carries the decoded 16-byte digest (fpb),
  // computed once at build time: every consumer's equality work (the
  // overlap/span/decontam joins, distincts and df caps) keys on it
  // instead of re-hashing the 32-char hex string per row (guide §4)
  private def winnowPicks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    winnowCache.getOrElseUpdate((s, d),
      TextStats.winnow(Tables.documents(s, d), "doc_id", "text",
        WinK, WinW).withColumn("fpb", unhex($"fp")).persist())
  }

  private def q242(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    winnowPicks(s, d).select($"doc_id", $"pos", $"fp")
      .orderBy($"doc_id", $"pos")
  }
  private val q242Sql =
    s"""WITH ${winnowSelSql(WinK, WinW)}
       |SELECT doc_id, pos, fp FROM pick ORDER BY doc_id, pos""".stripMargin

  // q253 — the SAME winnow pass reachable from Spark SQL TEXT alone: a
  // SQL-only client (JDBC/Thrift, notebook %%sql) can build the winnowing
  // index with one statement over a registered view, no Scala API. The
  // statement mirrors winnowSelSql's CTE chain in Spark dialect (split/
  // sequence/slice replace DuckDB's string_split_regex/range/array
  // slicing; the rightmost-min key is the struct(digest bytes, −pos)
  // encoding of TextStats.winnow — order-identical to the oracle's
  // `fp || lpad(9999999−pos, 7)` string because fixed-width lowercase
  // hex orders exactly like its decoded bytes and 9999999−pos orders
  // exactly like −pos), and the gate proves it equal to the exact
  // oracle — so the Scala API (q242) and the SQL recipe can never drift
  // apart silently.
  private def winnowSparkSql(k: Int, w: Int, table: String): String =
    s"""WITH ${winnowSelSparkSql(k, w, table)}
       |SELECT doc_id, pos, fp FROM pick ORDER BY doc_id, pos""".stripMargin
  /** CTE chain (→ `pick`) of the Spark-dialect winnow recipe — shared by
    * q253 (the pass itself) and q258 (overlap spans built on it). */
  private def winnowSelSparkSql(k: Int, w: Int, table: String): String =
    s"""toks AS (
       |  SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM $table),
       |starts AS (
       |  SELECT doc_id, t, explode(sequence(0, size(t) - $k)) AS p0
       |  FROM toks WHERE size(t) >= $k),
       |gw AS (
       |  SELECT doc_id, p0,
       |    unhex(md5(concat_ws(' ', slice(t, p0 + 1, $k)))) AS fpb
       |  FROM starts),
       |keyed AS (
       |  SELECT doc_id, p0,
       |    named_struct('f', fpb, 'p', -CAST(p0 AS BIGINT)) AS key
       |  FROM gw),
       |sel AS (
       |  SELECT doc_id, p0,
       |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p0
       |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS sk,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS n
       |  FROM keyed),
       |pick AS (
       |  SELECT DISTINCT doc_id, -sk.p AS pos, lower(hex(sk.f)) AS fp,
       |    sk.f AS fpb
       |  FROM sel WHERE p0 >= ${w - 1} OR (n < $w AND p0 = n - 1))""".stripMargin
  private def q253(s: SparkSession, d: String): DataFrame = {
    Tables.registerViewOnce(s, d, "graft_documents")(Tables.documents(s, d))
    s.sql(winnowSparkSql(WinK, WinW, "graft_documents"))
  }
  private val q253Sql = q242Sql

  private def q243(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextStats.winnowOverlapFrom(winnowPicks(s, d),
        maxDocFreq = Some(MaxDocFreq))
      .orderBy($"doc_a", $"doc_b")
  }
  private val q243Sql =
    s"""WITH ${winnowSelSql(WinK, WinW)},
       |fps AS (SELECT DISTINCT doc_id, fp FROM pick),
       |hot AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) > $MaxDocFreq),
       |fpc AS (SELECT doc_id, fp FROM fps
       |        WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.fp = fps.fp))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS shared_fps
       |FROM fpc a JOIN fpc b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin

  // q248 — approximate aligned overlap spans from the winnowed index
  // (TextStats.winnowOverlapSpans, the MOSS report step): matched
  // fingerprints cluster on alignment diagonals and coalesce into spans —
  // sub-document overlap WITH positions, no text re-read.
  private def q248(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextStats.winnowOverlapSpansFrom(winnowPicks(s, d), WinK, gap = WinW,
        maxDocFreq = Some(MaxDocFreq))
      .orderBy($"doc_a", $"doc_b", $"start_a", $"start_b")
  }
  private val q248Sql =
    s"""WITH ${winnowSelSql(WinK, WinW)},
       |fps AS (SELECT DISTINCT doc_id, fp FROM pick),
       |hot AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) > $MaxDocFreq),
       |pk AS (SELECT p.doc_id, p.pos, p.fp FROM pick p
       |       WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.fp = p.fp)),
       |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.pos AS pos_a, b.pos AS pos_b, b.pos - a.pos AS diag
       |  FROM pk a JOIN pk b ON a.fp = b.fp AND a.doc_id < b.doc_id),
       |lagd AS (SELECT *, lag(pos_a) OVER (PARTITION BY doc_a, doc_b, diag
       |    ORDER BY pos_a) AS prev FROM m),
       |isl AS (SELECT *, SUM(CASE WHEN prev IS NULL OR pos_a - prev > $WinW
       |    THEN 1 ELSE 0 END) OVER (PARTITION BY doc_a, doc_b, diag
       |    ORDER BY pos_a ROWS UNBOUNDED PRECEDING) AS island FROM lagd)
       |SELECT doc_a, doc_b, CAST(MIN(pos_a) AS BIGINT) AS start_a,
       |  CAST(MIN(pos_a) + diag AS BIGINT) AS start_b,
       |  CAST(MAX(pos_a) - MIN(pos_a) + $WinK AS BIGINT) AS span_len,
       |  CAST(COUNT(*) AS BIGINT) AS n_fps
       |FROM isl GROUP BY doc_a, doc_b, diag, island
       |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin

  // q258 — winnow overlap SPANS from Spark SQL TEXT alone: the q253
  // winnow chain (Spark dialect) + the diagonal island merge of q248's
  // oracle, which is dialect-neutral SQL (lag / windowed SUM / CASE) —
  // reused verbatim so the two engines share the span logic character
  // for character. Gated by q248's exact oracle.
  private def q258(s: SparkSession, d: String): DataFrame = {
    Tables.registerViewOnce(s, d, "graft_documents")(Tables.documents(s, d))
    s.sql(
      s"""WITH ${winnowSelSparkSql(WinK, WinW, "graft_documents")},
         |fps AS (SELECT DISTINCT doc_id, fpb FROM pick),
         |hot AS (SELECT fpb FROM fps GROUP BY fpb HAVING COUNT(*) > $MaxDocFreq),
         |pk AS (SELECT p.doc_id, p.pos, p.fpb FROM pick p
         |       WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.fpb = p.fpb)),
         |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.pos AS pos_a, b.pos AS pos_b, b.pos - a.pos AS diag
         |  FROM pk a JOIN pk b ON a.fpb = b.fpb AND a.doc_id < b.doc_id),
         |lagd AS (SELECT *, lag(pos_a) OVER (PARTITION BY doc_a, doc_b, diag
         |    ORDER BY pos_a) AS prev FROM m),
         |isl AS (SELECT *, SUM(CASE WHEN prev IS NULL OR pos_a - prev > $WinW
         |    THEN 1 ELSE 0 END) OVER (PARTITION BY doc_a, doc_b, diag
         |    ORDER BY pos_a ROWS UNBOUNDED PRECEDING) AS island FROM lagd)
         |SELECT doc_a, doc_b, CAST(MIN(pos_a) AS BIGINT) AS start_a,
         |  CAST(MIN(pos_a) + diag AS BIGINT) AS start_b,
         |  CAST(MAX(pos_a) - MIN(pos_a) + $WinK AS BIGINT) AS span_len,
         |  CAST(COUNT(*) AS BIGINT) AS n_fps
         |FROM isl GROUP BY doc_a, doc_b, diag, island
         |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin)
  }
  private val q258Sql = q248Sql

  // q246 — winnowing decontamination (TextStats.winnowAgainst): training
  // split (source <> src0) vs the held-out benchmark (src0) on shared
  // selected fingerprints — q237's quote detection from an index
  // ~2/(w+1) the gram-set size, with approximate positions. Corpus-side
  // df cap only (the benchmark side is tiny by contract).
  private def q246(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // winnow is per-doc pure, so slicing the memoized picks by source ≡
    // winnowing the filtered corpora
    val side = Tables.documents(s, d).select($"doc_id", $"source")
    val picks = winnowPicks(s, d).join(side, "doc_id")
    TextStats.winnowAgainstFrom(
        picks.filter($"source" =!= "src0"),
        picks.filter($"source" === "src0"),
        maxDocFreq = Some(MaxDocFreq))
      .orderBy($"doc_id", $"ref_id")
  }
  private val q246Sql =
    s"""WITH ${winnowSelSql(WinK, WinW)},
       |fps AS (SELECT DISTINCT doc_id, fp FROM pick),
       |side AS (SELECT doc_id, source FROM documents),
       |cfp0 AS (SELECT f.doc_id, f.fp FROM fps f
       |         JOIN side s ON f.doc_id = s.doc_id AND s.source <> 'src0'),
       |hot AS (SELECT fp FROM cfp0 GROUP BY fp HAVING COUNT(*) > $MaxDocFreq),
       |cfp AS (SELECT doc_id, fp FROM cfp0
       |        WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.fp = cfp0.fp)),
       |rfp AS (SELECT f.doc_id AS ref_id, f.fp FROM fps f
       |        JOIN side s ON f.doc_id = s.doc_id AND s.source = 'src0')
       |SELECT c.doc_id, r.ref_id, CAST(COUNT(*) AS BIGINT) AS shared_fps
       |FROM cfp c JOIN rfp r ON c.fp = r.fp
       |GROUP BY 1, 2 ORDER BY c.doc_id, r.ref_id""".stripMargin

  // q237/q238 — span-level benchmark decontamination: spans of the
  // training split (source <> src0) whose 5-token windows occur verbatim
  // in the held-out benchmark (src0) — the n-gram-collision removal the
  // big-model training reports describe, as spans instead of q60's
  // whole-document drops — and the cleaned corpus with those quotes cut.
  private val decontamSpanCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def decontamSpansOf(s: SparkSession, d: String): DataFrame =
    decontamSpanCache.getOrElseUpdate((s, d), {
      import s.implicits._
      val docs = Tables.documents(s, d)
      Dedup.spansAgainst(docs.filter($"source" =!= "src0"), "doc_id", "text",
        docs.filter($"source" === "src0"), "doc_id", "text", SpanK).persist()
    })
  private def q237(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decontamSpansOf(s, d).orderBy($"doc_id", $"span_start")
  }
  private def decontamGramsSql(k: Int): String =
    s"""toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') t
       |  FROM documents WHERE source <> 'src0'),
       |reft AS (SELECT string_split_regex(trim(text), '\\s+') t
       |  FROM documents WHERE source = 'src0'),
       |refg AS (SELECT DISTINCT md5(array_to_string(t[pos:pos+$k-1], ' ')) AS h
       |  FROM (SELECT t, unnest(range(1, greatest(len(t)-$k+2, 1))) AS pos
       |        FROM reft)),
       |starts AS (SELECT doc_id, t,
       |    unnest(range(1, greatest(len(t)-$k+2, 1))) AS pos FROM toks),
       |g AS (SELECT doc_id, pos - 1 AS p0,
       |    md5(array_to_string(t[pos:pos+$k-1], ' ')) AS h FROM starts),
       |dup AS (SELECT doc_id, p0 FROM g
       |        WHERE EXISTS (SELECT 1 FROM refg WHERE refg.h = g.h))""".stripMargin
  private def decontamSpansSql(k: Int): String =
    s"""${decontamGramsSql(k)},
       |${islandMergeSql(k)}""".stripMargin
  private val q237Sql =
    s"""WITH ${decontamSpansSql(SpanK)}
       |SELECT doc_id, span_start, span_len, n_dup_grams FROM spans
       |ORDER BY doc_id, span_start""".stripMargin

  // q257 — span-level decontamination from Spark SQL TEXT alone: the
  // q256 recipe with the dup-flag source swapped from global gram stats
  // to a semi-join against the benchmark split's gram set (EXISTS — the
  // exact shape q237's oracle uses, so the statements stay side-by-side
  // comparable). Gated by q237's exact oracle.
  private def q257(s: SparkSession, d: String): DataFrame = {
    Tables.registerViewOnce(s, d, "graft_documents")(Tables.documents(s, d))
    val k = SpanK
    s.sql(
      s"""WITH toks AS (SELECT doc_id, split(trim(text), '\\\\s+') AS t
         |  FROM graft_documents WHERE source <> 'src0'),
         |reft AS (SELECT split(trim(text), '\\\\s+') AS t
         |  FROM graft_documents WHERE source = 'src0'),
         |refg AS (SELECT DISTINCT md5(concat_ws(' ', slice(t, p0 + 1, $k))) AS h
         |  FROM (SELECT t, explode(sequence(0, size(t) - $k)) AS p0
         |        FROM reft WHERE size(t) >= $k)),
         |starts AS (SELECT doc_id, t, explode(sequence(0, size(t) - $k)) AS p0
         |  FROM toks WHERE size(t) >= $k),
         |g AS (SELECT doc_id, p0,
         |    md5(concat_ws(' ', slice(t, p0 + 1, $k))) AS h FROM starts),
         |dup AS (SELECT doc_id, p0 FROM g
         |        WHERE EXISTS (SELECT 1 FROM refg WHERE refg.h = g.h)),
         |${islandMergeSql(k)}
         |SELECT doc_id, span_start, span_len, n_dup_grams FROM spans
         |ORDER BY doc_id, span_start""".stripMargin)
  }
  private val q257Sql = q237Sql

  private def q238(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.dropRepeatedSpans(Tables.documents(s, d).filter($"source" =!= "src0"),
        "doc_id", "text", SpanK, spansDf = Some(decontamSpansOf(s, d)))
      .orderBy($"doc_id")
  }
  private val q238Sql =
    s"""WITH ${decontamSpansSql(SpanK)},
       |$spanRemovalSql""".stripMargin

  // q36 — SimHash (16-bit) per document: per-bit majority vote over token
  // hashes; near-dup docs land within small hamming distance.
  private val BITS = 16

  /** SimHash core over a normalized (doc_id, text) frame — per-bit majority
    * vote of md5-derived token hashes, one map-side-combinable aggregate. */
  private[operators] def simhashFrom(docs: DataFrame, bits: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val votes = docs
      .withColumn("toks", toks)
      .select($"doc_id", explode($"toks").as("tok"))
      .withColumn("h", md5Long($"tok"))
      .groupBy($"doc_id")
      .agg(
        sum(when(shiftright($"h", 0).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as("s0"),
        (1 until bits).map(j =>
          sum(when(shiftright($"h", j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"s$j")): _*)
    votes.select($"doc_id",
      (0 until bits).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  private def q36(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    simhashFrom(Tables.documents(s, d).select($"doc_id", $"text"), BITS)
      .orderBy($"doc_id")
  }
  private val q36Sql = {
    val sums = (0 until BITS).map(j =>
      s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(",\n  ")
    val combine = (0 until BITS).map(j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
       |            FROM documents),
       |h AS (SELECT doc_id, ${md5LongSql("t")} AS h FROM tok),
       |votes AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($combine AS BIGINT) AS simhash
       |FROM votes ORDER BY doc_id""".stripMargin
  }

  // q47 — near-dup clustering: connected components over the Jaccard≥0.8
  // pair graph (min-label propagation), then a canonical doc per cluster.
  // The step a real dedup pipeline runs after pair detection: keep the
  // canonical, drop members. Components here are tiny (near-dup clusters),
  // so a fixed number of propagation rounds converges; at 100 TB-scale
  // graphs the same loop structure runs with large-star/small-star
  // optimizations — the per-round plan (edges ⋈ labels, min-agg) is
  // shuffle-on-key and size-stable.
  private val labelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def clusterLabels(s: SparkSession, d: String): DataFrame =
    labelCache.getOrElseUpdate((s, d), {
      import s.implicits._
      connectedComponents(nearDupPairs(s, d).select($"doc_a", $"doc_b")).persist()
    })
  private def q47(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val labels = clusterLabels(s, d)
    Tables.documents(s, d)
      .join(labels, $"doc_id" === $"n", "left_outer")
      .select($"doc_id",
        coalesce($"lbl", $"doc_id").as("canonical_id"),
        when(coalesce($"lbl", $"doc_id") =!= $"doc_id", 1).otherwise(0).as("is_dup"))
      .orderBy($"doc_id")
  }
  /** Shared CTE chain: shingles → Jaccard≥0.8 pairs → symmetric edges →
    * transitive closure → per-node component label. Used by q47 and q49. */
  private[operators] val closureCtes =
    s"""$cappedShingleRowsSql,
       |sizes AS MATERIALIZED (SELECT doc_id, count(*) n FROM shc GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) shared
       |          FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |good AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs
       |         JOIN sizes x ON doc_a = x.doc_id JOIN sizes y ON doc_b = y.doc_id
       |         WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8),
       |edges AS MATERIALIZED (SELECT doc_a src, doc_b dst FROM good
       |          UNION ALL SELECT doc_b, doc_a FROM good),
       |reach(n, m) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src),
       |comp AS (SELECT n, least(n, min(m)) AS lbl FROM reach GROUP BY n)""".stripMargin

  private val q47Sql =
    s"""WITH RECURSIVE $closureCtes
       |SELECT d.doc_id,
       |  coalesce(c.lbl, d.doc_id) AS canonical_id,
       |  CASE WHEN coalesce(c.lbl, d.doc_id) <> d.doc_id THEN 1 ELSE 0 END AS is_dup
       |FROM documents d LEFT OUTER JOIN comp c ON d.doc_id = c.n
       |ORDER BY d.doc_id""".stripMargin

  /** Connected components over an undirected pair list (doc_a, doc_b) →
    * (n, lbl) where lbl = min node id in n's component.
    *
    * Adaptive engine choice (near-dup edge sets are a vanishing fraction of
    * the corpus even at 100 TB):
    *  - small graph (≤ localThreshold edges): exact union-find on the
    *    driver — like AQE localizing a tiny shuffle;
    *  - large graph: distributed min-label propagation with eager lineage
    *    truncation (localCheckpoint) per round and a label-sum fixpoint
    *    early-exit — the standard iterative-graph pattern.
    */
  def connectedComponents(pairs: DataFrame, localThreshold: Long = 1000000L): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val p2 = pairs.toDF("doc_a", "doc_b")
    val edges = p2.unionAll(p2.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .toDF("src", "dst").localCheckpoint()
    if (edges.count() <= localThreshold) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      nodes.map(n => (n, find(n))).toSeq.toDF("n", "lbl")
    } else {
      var labels = edges.select($"src".as("n")).distinct()
        .withColumn("lbl", $"n").localCheckpoint()
      // Loop to the label-sum fixpoint, NOT a fixed round cap: a cap
      // silently splits any component it undershoots. Each round is one
      // neighbor-min hop PLUS a pointer-jump (lbl ← lbl(lbl), path
      // doubling), so label distance-to-minimum roughly halves+1 per round
      // and convergence takes O(log diameter) rounds, not O(diameter) — a
      // 1000-link chain converges in ~10 rounds. Termination is guaranteed:
      // labels only ever decrease and are bounded below by the component's
      // min id, so the sum strictly decreases until fixpoint. Sum into
      // decimal(38,0): with 64-bit-hash doc ids a Long sum can overflow
      // (ANSI mode would abort; wrap-around could falsely converge).
      var prevSum: java.math.BigDecimal = null
      var converged = false
      while (!converged) {
        val prop = edges.join(labels, $"dst" === $"n")
          .groupBy($"src").agg(min($"lbl").as("nlbl"))
        val hopped = labels.join(prop, $"n" === $"src", "left_outer")
          .select($"n", least($"lbl", coalesce($"nlbl", $"lbl")).as("lbl"))
        // pointer jump: follow one's label's label (labels are node ids, so
        // they are always present as n; left_outer only for safety)
        val jump = hopped.select($"n".as("jn"), $"lbl".as("jlbl"))
        labels = hopped.join(jump, $"lbl" === $"jn", "left_outer")
          .select($"n", least($"lbl", coalesce($"jlbl", $"lbl")).as("lbl"))
          .localCheckpoint()
        val sumNow = labels
          .agg(coalesce(sum($"lbl".cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")))
          .head().getDecimal(0)
        converged = prevSum != null && sumNow.compareTo(prevSum) == 0
        prevSum = sumNow
      }
      labels
    }
  }

  // q49 — keep-best dedup: within each near-dup cluster keep the highest-
  // quality member (longest text, tie-break lowest doc_id) — what a curation
  // pipeline actually ships, vs q47's min-id canonical.
  private def q49(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // winner per cluster = min_by over the ordering struct (-n_chars,
    // doc_id): max length, ties -> lowest id. A combiner-friendly groupBy +
    // join-back, not a row_number window partitioned by canonical_id — a
    // boilerplate mega-cluster would serialize through one window task.
    val clusters = q47(s, d).select($"doc_id", $"canonical_id")
    val docs = Tables.documents(s, d).select($"doc_id", $"n_chars")
    val joined = clusters.join(docs, "doc_id")
    val winners = joined.groupBy($"canonical_id")
      .agg(min_by($"doc_id",
        struct((-$"n_chars").as("q"), $"doc_id".as("i"))).as("__best"))
    joined.join(winners, "canonical_id")
      .select($"doc_id", $"canonical_id",
        when($"doc_id" === $"__best", 1).otherwise(0).as("keep"),
        $"n_chars")
      .orderBy($"doc_id")
  }
  private val q49Sql =
    s"""WITH RECURSIVE $closureCtes,
       |assigned AS (
       |  SELECT d.doc_id, coalesce(c.lbl, d.doc_id) AS canonical_id, d.n_chars
       |  FROM documents d LEFT OUTER JOIN comp c ON d.doc_id = c.n)
       |SELECT doc_id, canonical_id,
       |  CASE WHEN ROW_NUMBER() OVER (PARTITION BY canonical_id
       |       ORDER BY n_chars DESC, doc_id ASC) = 1 THEN 1 ELSE 0 END AS keep,
       |  n_chars
       |FROM assigned ORDER BY doc_id""".stripMargin

  // q52 — deterministic hash sharding/sampling: content-hash mod-100 shard,
  // keep shards < 20 (a 20% sample), with per-language sampled/total counts.
  // The training-pipeline primitive for reproducible subsets: membership is a
  // pure function of content (stable across engines, partitionings, reruns),
  // map-only — no shuffle until the tiny per-stratum report.
  private def q52(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("shard", md5Long(concat(lit("smp:"), $"text")) % 100L)
      .groupBy($"lang")
      .agg(count(lit(1)).as("total"),
        sum(when($"shard" < 20, 1L).otherwise(0L)).as("sampled"))
      .withColumn("rate", $"sampled".cast(DoubleType) / $"total")
      .orderBy($"lang")
  }
  private val q52Sql =
    s"""SELECT lang, COUNT(*) AS total,
       | CAST(SUM(CASE WHEN ${md5LongSql("'smp:' || text")} % 100 < 20
       |               THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
       | CAST(SUM(CASE WHEN ${md5LongSql("'smp:' || text")} % 100 < 20
       |               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rate
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // q53 — intra-document repetition (Gopher/C4-style quality signal): the
  // fraction of a doc's word 3-grams that are repeats. Map-side explode +
  // one shuffle on doc_id; high dup_ratio marks boilerplate/spam for the
  // quality-filter stage.
  private def q53(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // two-level aggregate over codegen'd gram rows: level 1 combines
    // map-side on (doc_id, gram), level 2 folds to per-doc counts. Both a
    // countDistinct plan (Expand doubling every gram) and array-expression
    // gram generation measured 3-8× slower at sf0.1 (see gramRows).
    gramRows(Tables.documents(s, d), 3)
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"), count(lit(1)).as("n_distinct"))
      .withColumn("dup_ratio",
        lit(1.0) - $"n_distinct".cast(DoubleType) / $"n_grams")
      .orderBy($"doc_id")
  }
  private val q53Sql =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1,1)),
      |      i -> array_to_string(t[i:i+2], ' '))) AS gram FROM toks)
      |SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT gram) AS n_distinct,
      | 1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*) AS dup_ratio
      |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // q54 — cross-document passage overlap (contamination detection): per doc,
  // the fraction of its distinct 4-gram passages that also appear in some
  // other document. Reuses the shared shingle relation.
  private def q54(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // sh is DISTINCT (doc_id, s), so n_shared = n_passages - n_unique, and a
    // df==1 shingle's min(doc_id) IS its owning doc — so both sides come
    // from combiner-friendly groupBy aggregates (map-side partials shrink a
    // corpus-wide boilerplate shingle to #partitions rows) plus one
    // doc-keyed join of two doc-sized frames. The shingle relation is never
    // range-partitioned by s: the previous `count over
    // Window.partitionBy(s)` put every instance of a hot shingle in ONE
    // partition — a guaranteed straggler on a real corpus.
    val sh = shingleRows(s, d)
    val perDoc = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_passages"))
    val uniq = sh.groupBy($"s")
      .agg(count(lit(1)).as("df"), min($"doc_id").as("doc_id"))
      .filter($"df" === 1)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_unique"))
    perDoc.join(uniq, Seq("doc_id"), "left")
      .withColumn("n_shared", $"n_passages" - coalesce($"n_unique", lit(0L)))
      .withColumn("overlap_ratio",
        $"n_shared".cast(DoubleType) / $"n_passages")
      .select($"doc_id", $"n_passages", $"n_shared", $"overlap_ratio")
      .orderBy($"doc_id")
  }
  private val q54Sql =
    s"""WITH $shingleRowsSql,
       |df AS (SELECT s, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY s)
       |SELECT sh.doc_id, COUNT(*) AS n_passages,
       | CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       | CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS overlap_ratio
       |FROM sh JOIN df ON sh.s = df.s
       |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin

  // q55 — corpus vocabulary top-k (exact heavy hitters): token frequencies
  // with a deterministic tie-break. Two map-side-combinable aggregations;
  // at 100 TB the same plan holds (vocab is small after the first combine).
  private def q55(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("toks", toks)
      .select(explode($"toks").as("tok"))
      .groupBy($"tok")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"tok".asc)
      .limit(15)
  }
  private val q55Sql =
    """SELECT tok, COUNT(*) AS freq
      |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
      |GROUP BY tok ORDER BY freq DESC, tok ASC LIMIT 15""".stripMargin

  // q161 — distinct-n diversity per source: distinct trigrams / total
  // trigrams, the template-detection signal (a boilerplate-heavy or
  // self-repeating source scores low). Exact integer ppm.
  //
  // Scale: gram generation is the doc-keyed window (high-cardinality);
  // the per-source rollup is one aggregate pair — COUNT(DISTINCT) plans
  // as Spark's two-phase expand, partials combine map-side. No joins.
  private def q161(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    gramRows(Tables.documents(s, d), 3, carryCols = Seq("source"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_grams"),
        count_distinct($"gram").as("n_distinct"))
      .withColumn("distinct_ppm",
        expr("CAST(CAST(n_distinct AS DECIMAL(19,0)) * 1000000 DIV n_grams AS BIGINT)"))
      .orderBy($"source")
  }
  private val q161Sql =
    """WITH toks AS (SELECT doc_id, source,
      |    string_split_regex(trim(text), '\s+') t FROM documents),
      |g AS (SELECT doc_id, source,
      |    unnest(list_transform(range(1, greatest(len(t)-1,1)),
      |      i -> array_to_string(t[i:i+2], ' '))) AS gram FROM toks)
      |SELECT source, COUNT(*) AS n_grams,
      |  COUNT(DISTINCT gram) AS n_distinct,
      |  CAST(COUNT(DISTINCT gram) * 1000000 // COUNT(*) AS BIGINT) AS distinct_ppm
      |FROM g GROUP BY source ORDER BY source""".stripMargin

  // q166 — exact pairwise vocabulary Jaccard between sources: shared
  // distinct tokens / union size, exact integer ppm. The EXACT complement
  // of q159's KMV estimate — right when the key set is small (#sources²
  // pairs); the sketch is the path when it isn't.
  //
  // Scale: the corpus collapses ONCE to the distinct (source, token)
  // relation (combiner aggregate). The token-keyed self-join fans out at
  // most #sources² rows per token — bounded by the source count, not the
  // corpus. Never a token-keyed window.
  private def q166(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select($"source", explode(toks).as("tok"))
      .distinct()
    val sizes = vocab.groupBy($"source").agg(count(lit(1)).as("nv"))
    val a = vocab.select($"source".as("sa"), $"tok")
    val b = vocab.select($"source".as("sb"), $"tok")
    val shared = a.join(b, Seq("tok")).filter($"sa" < $"sb")
      .groupBy($"sa", $"sb").agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.select($"source".as("sa"), $"nv".as("na"))), Seq("sa"))
      .join(broadcast(sizes.select($"source".as("sb"), $"nv".as("nb"))), Seq("sb"))
      .select($"sa".as("source_a"), $"sb".as("source_b"), $"shared",
        expr("shared * 1000000 DIV (na + nb - shared)").cast(LongType)
          .as("jaccard_ppm"))
      .orderBy($"source_a", $"source_b")
  }
  private val q166Sql =
    """WITH v AS (SELECT DISTINCT source,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      |sizes AS (SELECT source, COUNT(*) AS nv FROM v GROUP BY 1),
      |sh AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared
      |  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b, shared,
      |  CAST(shared * 1000000 // (x.nv + y.nv - shared) AS BIGINT) AS jaccard_ppm
      |FROM sh JOIN sizes x ON source_a = x.source
      |JOIN sizes y ON source_b = y.source
      |ORDER BY source_a, source_b""".stripMargin

  // q175 — golden-record survivorship merge: per near-dup cluster, the
  // field-level merged entity a master-data pipeline ships — longest
  // member as representative (q49's winner rule), majority-vote language
  // (ties → lexicographically first), member/source counts. Every
  // survivorship rule is a combiner-friendly min_by/max_by or count —
  // never a cluster-keyed row_number window, so a boilerplate
  // mega-cluster still reduces map-side.
  private def q175(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val clusters = q47(s, d).select($"doc_id", $"canonical_id")
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val joined = clusters.join(docs, "doc_id")
    val langPick = joined.groupBy($"canonical_id", $"lang")
      .agg(count(lit(1)).as("__c"))
      .groupBy($"canonical_id")
      .agg(min_by($"lang", struct((-$"__c").as("nc"), $"lang".as("l")))
        .as("lang"))
    val agg = joined.groupBy($"canonical_id")
      .agg(count(lit(1)).as("n_members"),
        min_by($"doc_id", struct((-$"n_chars").as("q"), $"doc_id".as("i")))
          .as("rep_doc"),
        max($"n_chars").as("max_chars"),
        count_distinct($"source").as("n_sources"))
    agg.join(langPick, "canonical_id")
      .select($"canonical_id", $"n_members", $"rep_doc", $"max_chars",
        $"n_sources", $"lang")
      .orderBy($"canonical_id")
  }
  private val q175Sql =
    s"""WITH RECURSIVE $closureCtes,
       |assigned AS MATERIALIZED (
       |  SELECT d.doc_id, coalesce(c.lbl, d.doc_id) AS canonical_id,
       |    d.lang, d.source, d.n_chars
       |  FROM documents d LEFT OUTER JOIN comp c ON d.doc_id = c.n),
       |votes AS (SELECT canonical_id, lang, COUNT(*) AS cnt
       |  FROM assigned GROUP BY 1, 2),
       |pick AS (SELECT canonical_id, lang FROM (
       |    SELECT canonical_id, lang, ROW_NUMBER() OVER (
       |      PARTITION BY canonical_id ORDER BY cnt DESC, lang ASC) AS rn
       |    FROM votes) WHERE rn = 1),
       |rep AS (SELECT canonical_id, doc_id AS rep_doc FROM (
       |    SELECT canonical_id, doc_id, ROW_NUMBER() OVER (
       |      PARTITION BY canonical_id ORDER BY n_chars DESC, doc_id ASC) AS rn
       |    FROM assigned) WHERE rn = 1),
       |agg AS (SELECT canonical_id, COUNT(*) AS n_members,
       |    MAX(n_chars) AS max_chars, COUNT(DISTINCT source) AS n_sources
       |  FROM assigned GROUP BY 1)
       |SELECT agg.canonical_id, n_members, rep_doc, max_chars, n_sources, lang
       |FROM agg JOIN rep ON agg.canonical_id = rep.canonical_id
       |JOIN pick ON agg.canonical_id = pick.canonical_id
       |ORDER BY agg.canonical_id""".stripMargin

  // q177 — LSH candidate-recall eval: what fraction of the EXACT
  // Jaccard≥0.8 pairs (q34's relation) does the MinHash+LSH candidate
  // generator (q35's relation) recover? The tuning harness for (k, bands)
  // — run it before trusting an LSH dedup pass at scale. Both inputs are
  // the memoized pipeline stages; the eval itself is one semi-join +
  // 1-row counts, exact integer ppm.
  private def q177(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val exact = jaccardPairsFrom(cappedShingleRows(s, d), 0.8)
      .select($"doc_a", $"doc_b")
    val cand = minhashPairsFrom(minhashSigs(s, d), K, bands = 2)
      .select($"doc_a", $"doc_b")
    val hits = exact.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    val ne = exact.agg(count(lit(1)).as("n_exact"))
    val nc = cand.agg(count(lit(1)).as("n_cand"))
    val nh = hits.agg(count(lit(1)).as("n_hit"))
    ne.join(broadcast(nc)).join(broadcast(nh))
      .select($"n_exact", $"n_cand", $"n_hit",
        expr("n_hit * 1000000 DIV n_exact").cast(LongType).as("recall_ppm"))
  }
  private val q177Sql = {
    val mins = (0 until K).map(i =>
      s"min(${md5LongSql(s"concat('s$i:', s)")}) AS h$i").mkString(",\n  ")
    s"""WITH $cappedShingleRowsSql,
       |sizes AS (SELECT doc_id, count(*) n FROM shc GROUP BY doc_id),
       |p AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) shared
       |      FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |exact AS (SELECT doc_a, doc_b FROM p
       |  JOIN sizes x ON doc_a = x.doc_id JOIN sizes y ON doc_b = y.doc_id
       |  WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8),
       |sigs AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, 0 AS band, concat_ws(',', h0, h1, h2, h3) AS bkey FROM sigs
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, concat_ws(',', h4, h5, h6, h7) AS bkey FROM sigs),
       |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |ne AS (SELECT COUNT(*) AS n_exact FROM exact),
       |nc AS (SELECT COUNT(*) AS n_cand FROM cand),
       |nh AS (SELECT COUNT(*) AS n_hit FROM exact
       |  WHERE EXISTS (SELECT 1 FROM cand
       |    WHERE cand.doc_a = exact.doc_a AND cand.doc_b = exact.doc_b))
       |SELECT n_exact, n_cand, n_hit,
       |  CAST(n_hit * 1000000 // n_exact AS BIGINT) AS recall_ppm
       |FROM ne CROSS JOIN nc CROSS JOIN nh""".stripMargin
  }

  // q178 — similarity threshold sweep: pair counts per exact-integer
  // Jaccard band ((shared·10) DIV (union) ∈ 5..10) from the shared pair
  // relation — the knob curve a curator reads before picking the dedup
  // cutoff. One extra aggregate over the memoized pair stage.
  private def q178(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = cappedShingleRows(s, d)
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.toDF("doc_a", "s").join(sh.toDF("doc_b", "s2"),
        $"s" === $"s2" && $"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("band", expr("(shared * 10) DIV (na + nb - shared)")
        .cast(LongType))
      .filter($"band" >= 5)
      .groupBy($"band").agg(count(lit(1)).as("n_pairs"))
      .orderBy($"band")
  }
  private val q178Sql =
    s"""WITH $cappedShingleRowsSql,
       |sizes AS (SELECT doc_id, count(*) n FROM shc GROUP BY doc_id),
       |p AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) shared
       |      FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |banded AS (SELECT (shared * 10) // (x.n + y.n - shared) AS band
       |  FROM p JOIN sizes x ON doc_a = x.doc_id
       |  JOIN sizes y ON doc_b = y.doc_id)
       |SELECT CAST(band AS BIGINT) AS band, COUNT(*) AS n_pairs
       |FROM banded WHERE band >= 5
       |GROUP BY band ORDER BY band""".stripMargin

  // q182 — near-dup cluster-size distribution: how many clusters of each
  // size the Jaccard≥0.8 graph produced (singletons included) — the
  // dedup-observability histogram a curator checks before shipping a
  // keep-best pass. Two combiner aggregates over the memoized cluster
  // stage.
  private def q182(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    q47(s, d).groupBy($"canonical_id").agg(count(lit(1)).as("sz"))
      .groupBy($"sz").agg(count(lit(1)).as("n_clusters"))
      .orderBy($"sz")
  }
  private val q182Sql =
    s"""WITH RECURSIVE $closureCtes,
       |assigned AS (SELECT d.doc_id, coalesce(c.lbl, d.doc_id) AS canonical_id
       |  FROM documents d LEFT OUTER JOIN comp c ON d.doc_id = c.n),
       |csizes AS (SELECT canonical_id, COUNT(*) AS sz FROM assigned GROUP BY 1)
       |SELECT sz, COUNT(*) AS n_clusters FROM csizes
       |GROUP BY sz ORDER BY sz""".stripMargin

  // q191 — dedup impact report: per source, docs and characters kept vs
  // dropped by the keep-best pass (q49) — the before/after table a
  // curation run prints. One join of the memoized keep-flags with doc
  // metadata + one rollup; exact integer ppm.
  private def q191(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val kept = q49(s, d).select($"doc_id", $"keep")
    Tables.documents(s, d).select($"doc_id", $"source", $"n_chars")
      .join(kept, "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"keep".cast(LongType)).as("n_kept"),
        sum($"n_chars").as("chars_total"),
        sum(when($"keep" === 1, $"n_chars").otherwise(0L)).as("chars_kept"))
      .withColumn("kept_ppm",
        expr("CAST(CAST(chars_kept AS DECIMAL(19,0)) * 1000000 DIV chars_total AS BIGINT)"))
      .orderBy($"source")
  }
  private val q191Sql =
    s"""WITH RECURSIVE $closureCtes,
       |assigned AS (
       |  SELECT d.doc_id, d.source, d.n_chars,
       |    coalesce(c.lbl, d.doc_id) AS canonical_id
       |  FROM documents d LEFT OUTER JOIN comp c ON d.doc_id = c.n),
       |flagged AS (SELECT doc_id, source, n_chars,
       |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY canonical_id
       |      ORDER BY n_chars DESC, doc_id ASC) = 1 THEN 1 ELSE 0 END AS keep
       |  FROM assigned)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(keep) AS BIGINT) AS n_kept,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       |  CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
       |  CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) * 1000000
       |    // SUM(n_chars) AS BIGINT) AS kept_ppm
       |FROM flagged GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_dedup_impact" -> q191,
    "q182_cluster_sizes" -> q182,
    "q177_lsh_recall" -> q177,
    "q178_threshold_sweep" -> q178,
    "q175_golden_record" -> q175,
    "q166_vocab_overlap" -> q166,
    "q161_distinct_ngrams" -> q161,
    "q52_sample_hash_stratified" -> q52,
    "q53_repetition_ratio" -> q53,
    "q54_passage_overlap" -> q54,
    "q55_vocab_topk" -> q55,
    "q49_dedup_keep_best" -> q49,
    "q47_dedup_clusters" -> q47,
    "q29_text_tokens" -> q29,
    "q30_text_quality" -> q30,
    "q31_lang_id" -> q31,
    "q222_langid_confusion" -> q222,
    "q227_near_miss_audit" -> q227,
    "q223_leakage_safe_split" -> q223,
    "q32_fingerprint" -> q32,
    "q33_dedup_exact" -> q33,
    "q34_dedup_ngram_jaccard" -> q34,
    "q111_containment_pairs" -> q111,
    "q35_dedup_minhash_lsh" -> q35,
    "q36_dedup_simhash" -> q36,
    "q231_repeated_spans" -> q231,
    "q232_span_dedup" -> q232,
    "q233_source_containment" -> q233,
    "q234_doc_novelty" -> q234,
    "q237_decontam_spans" -> q237,
    "q238_decontam_clean" -> q238,
    "q242_winnow_fingerprints" -> q242,
    "q243_winnow_overlap" -> q243,
    "q246_winnow_decontam" -> q246,
    "q248_winnow_spans" -> q248,
    "q253_winnow_pure_sql" -> q253,
    "q256_spans_pure_sql" -> q256,
    "q257_decontam_pure_sql" -> q257,
    "q258_winnow_spans_pure_sql" -> q258,
  )

  val oracles: Map[String, String] = Map(
    "q191_dedup_impact" -> q191Sql,
    "q182_cluster_sizes" -> q182Sql,
    "q177_lsh_recall" -> q177Sql,
    "q178_threshold_sweep" -> q178Sql,
    "q175_golden_record" -> q175Sql,
    "q166_vocab_overlap" -> q166Sql,
    "q161_distinct_ngrams" -> q161Sql,
    "q52_sample_hash_stratified" -> q52Sql,
    "q53_repetition_ratio" -> q53Sql,
    "q54_passage_overlap" -> q54Sql,
    "q55_vocab_topk" -> q55Sql,
    "q49_dedup_keep_best" -> q49Sql,
    "q47_dedup_clusters" -> q47Sql,
    "q29_text_tokens" -> q29Sql,
    "q30_text_quality" -> q30Sql,
    "q31_lang_id" -> q31Sql,
    "q222_langid_confusion" -> q222Sql,
    "q227_near_miss_audit" -> q227Sql,
    "q223_leakage_safe_split" -> q223Sql,
    "q32_fingerprint" -> q32Sql,
    "q33_dedup_exact" -> q33Sql,
    "q34_dedup_ngram_jaccard" -> q34Sql,
    "q111_containment_pairs" -> q111Sql,
    "q35_dedup_minhash_lsh" -> q35Sql,
    "q36_dedup_simhash" -> q36Sql,
    "q231_repeated_spans" -> q231Sql,
    "q232_span_dedup" -> q232Sql,
    "q233_source_containment" -> q233Sql,
    "q234_doc_novelty" -> q234Sql,
    "q237_decontam_spans" -> q237Sql,
    "q238_decontam_clean" -> q238Sql,
    "q242_winnow_fingerprints" -> q242Sql,
    "q243_winnow_overlap" -> q243Sql,
    "q246_winnow_decontam" -> q246Sql,
    "q248_winnow_spans" -> q248Sql,
    "q253_winnow_pure_sql" -> q253Sql,
    "q256_spans_pure_sql" -> q256Sql,
    "q257_decontam_pure_sql" -> q257Sql,
    "q258_winnow_spans_pure_sql" -> q258Sql,
  )
}
