package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Dedup, Similarity, TextStats}

/** Cross-corpus decontamination + corpus-statistics operators (q65/q66/q68
  * and the q67 SemDeDup path): detection semantics on planted inputs, exact
  * integer expectations, and plan-shape locks. */
class CorpusSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val bench = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "pack my box with five dozen liquor jugs right now")
  ).toDF("bid", "btext")

  private val corpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog today"), // exact copy of bench 1
    (11L, "pack my box with five dozen liquor jugs right here"), // near-dup of bench 2 (1 word)
    (12L, "completely unrelated content with none of those words at all"),
    (13L, "the quick brown fox jumps over the lazy dog today")  // second exact copy
  ).toDF("cid", "ctext")

  test("exactAgainst flags exactly the content-hash matches") {
    val out = Dedup.exactAgainst(corpus, "cid", "ctext", bench, "btext")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("in_ref")).toMap
    assert(out == Map(10L -> 1, 11L -> 0, 12L -> 0, 13L -> 1))
  }

  test("exactAgainst plans as a broadcast join, map-only over the corpus side") {
    val p = Dedup.exactAgainst(corpus, "cid", "ctext", bench, "btext")
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin"), s"ref hashes must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus side must not shuffle:\n$p")
  }

  test("exactAgainstBloom matches exactAgainst exactly (sketch changes nothing)") {
    val want = Dedup.exactAgainst(corpus, "cid", "ctext", bench, "btext")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("in_ref")).toMap
    // tiny bitmap (high fpp) AND a roomy one: false positives only ever
    // send extra rows into the exact join — the verdict must not move
    for (fpp <- Seq(0.5, 0.001)) {
      val got = Dedup.exactAgainstBloom(corpus, "cid", "ctext", bench, "btext",
          expectedRefItems = 2L, fpp = fpp)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("in_ref")).toMap
      assert(got == want, s"fpp=$fpp")
    }
    // empty reference: nothing is contaminated, nothing is lost
    val none = Dedup.exactAgainstBloom(corpus, "cid", "ctext",
        bench.filter(col("bid") < 0), "btext", expectedRefItems = 1L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("in_ref")).toMap
    assert(none == Map(10L -> 0, 11L -> 0, 12L -> 0, 13L -> 0))
  }

  test("exactAgainstBloom plans a bloom scalar-subquery probe before the join") {
    val p = Dedup.exactAgainstBloom(corpus, "cid", "ctext", bench, "btext",
        expectedRefItems = 2L)
      .queryExecution.executedPlan.toString()
    assert(p.contains("might_contain"), s"bloom probe must gate the corpus:\n$p")
    assert(p.contains("Subquery"), s"bloom must arrive as a scalar subquery:\n$p")
  }

  test("minhashAgainst: exact copy collides at est_sim 1.0; unrelated doc does not") {
    val out = Dedup.minhashAgainst(corpus, "cid", "ctext", bench, "bid", "btext",
      minSim = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("ref_id"),
        r.getAs[Double]("est_sim")))
    assert(out.exists(p => p._1 == 10L && p._2 == 1L && p._3 == 1.0), s"got ${out.toSeq}")
    assert(out.exists(p => p._1 == 13L && p._2 == 1L && p._3 == 1.0), s"got ${out.toSeq}")
    assert(!out.exists(_._1 == 12L), s"unrelated doc flagged: ${out.toSeq}")
  }

  test("termRarity: exact integer expectations on a hand-computed corpus") {
    // corpus: "a a b" and "a c" -> freq(a)=3, freq(b)=1, freq(c)=1, T=5
    // scale=1e6: ivp(a) = 5e6 div 3 = 1666666, ivp(b) = ivp(c) = 5e6
    // doc 1: (2*1666666 + 1*5000000) div 3 = 8333332 div 3 = 2777777
    // doc 2: (1*1666666 + 1*5000000) div 2 = 6666666 div 2 = 3333333
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "body")
    val out = TextStats.termRarity(docs, "id", "body")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("rarity_scaled"))).toMap
    assert(out == Map(1L -> ((3, 2777777L)), 2L -> ((2, 3333333L))))
  }

  test("termRarity join-back broadcasts the vocab side, never a term window") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "body")
    val p = TextStats.termRarity(docs, "id", "body")
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin"), s"vocab freq must broadcast back:\n$p")
    assert(!p.contains("windowspecdefinition"), s"no window anywhere in rarity:\n$p")
  }

  test("semanticDedup clusters planted near-identical vectors to one canonical") {
    // three tight groups of 4 vectors each (base direction + tiny jitter on
    // another axis), pairwise cosine within a group > 0.999, across < 0.1
    val vecs = for {
      g <- 0 until 3
      i <- 0 until 4
    } yield {
      val v = Array.fill(6)(0.01f * (i + 1))
      v(g) = 10f
      ((g * 10 + i).toLong, v.toSeq)
    }
    val df = vecs.toDF("vid", "vec")
    val out = Similarity.semanticDedup(df, "vid", "vec",
      nlist = 3, iters = 2, tau = 0.99)
    val byId = out.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(byId.size == 12, "every input vector gets a row")
    for (g <- 0 until 3; i <- 0 until 4)
      assert(byId((g * 10 + i).toLong) == g * 10L,
        s"group $g member $i -> canonical ${byId((g * 10 + i).toLong)}")
    // deterministic: a rerun replicates bit-for-bit
    val again = Similarity.semanticDedup(df, "vid", "vec",
      nlist = 3, iters = 2, tau = 0.99)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(again == byId)
  }

  test("q65/q66/q68 run on the test corpus with total output orderings") {
    val q65 = SparkEntry.queries("q65_exact_against")(spark, sf)
    assert(q65.count() > 0)
    assert(q65.filter($"in_ref" === 1).count() > 0, "ref slice must self-match")
    val q66 = SparkEntry.queries("q66_term_rarity")(spark, sf).collect()
    assert(q66.nonEmpty && q66.forall(_.getAs[Long]("rarity_scaled") > 0))
    // rarity must actually vary across documents (not a constant signal)
    assert(q66.map(_.getAs[Long]("rarity_scaled")).distinct.length > 1)
    val q68 = SparkEntry.queries("q68_minhash_against")(spark, sf)
    assert(q68.filter($"est_sim" === 1.0).count() > 0, "ref docs self-collide at 1.0")
  }

  test("q67 semantic dedup covers every vector and is idempotent warm") {
    val out = SparkEntry.queries("q67_semantic_dedup")(spark, sf)
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(out.count() == n, "one row per input vector")
    val again = SparkEntry.queries("q67_semantic_dedup")(spark, sf)
    assert(out.collect().toSeq == again.collect().toSeq)
  }

  test("invalidateCaches rebuilds q66/q68 to identical results") {
    val before68 = SparkEntry.queries("q68_minhash_against")(spark, sf).collect().toSeq
    val before66 = SparkEntry.queries("q66_term_rarity")(spark, sf).collect().toSeq
    operators.Text.invalidateCaches(spark, sf)
    assert(SparkEntry.queries("q68_minhash_against")(spark, sf).collect().toSeq == before68)
    assert(SparkEntry.queries("q66_term_rarity")(spark, sf).collect().toSeq == before66)
  }
}
