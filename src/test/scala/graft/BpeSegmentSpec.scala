package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BpeSegment

/** Kernel + plan checks for the native BPE segmentation expression. */
class BpeSegmentSpec extends AnyFunSuite {
  import TestSpark._

  // reference replay: each merge in rank order as a greedy left-to-right
  // fold (the trainer's rewrite)
  private def replay(w: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector) { case (syms, (l, r)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    }

  test("kernel equals the rank-order fold replay on random words and tables") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcd"
    for (_ <- 1 to 200) {
      val w = Seq.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(4))).mkString
      // random (possibly non-fit) merge tables, including multi-char sides
      val merges = Seq.fill(rnd.nextInt(6)) {
        val l = Seq.fill(1 + rnd.nextInt(2))(alpha(rnd.nextInt(4))).mkString
        val r = Seq.fill(1 + rnd.nextInt(2))(alpha(rnd.nextInt(4))).mkString
        (l, r)
      }
      val got = BpeSegment.segment(w, merges.toArray).toVector
      assert(got == replay(w, merges), s"word=$w merges=$merges")
    }
  }

  test("rank order matters: a later rank feeding an earlier one must NOT re-fire it") {
    // replay order: (ab,c) sees no 'ab' symbol yet -> no-op; then (a,b).
    // A lowest-rank-first shortcut would produce [abc] - pinned out.
    val merges = Seq(("ab", "c"), ("a", "b"))
    assert(BpeSegment.segment("abc", merges.toArray).toVector == Vector("ab", "c"))
    // overlapping runs merge exactly once, left to right
    assert(BpeSegment.segment("aaa", Array(("a", "a"))).toVector == Vector("aa", "a"))
    // empty table -> code points
    assert(BpeSegment.segment("xy", Array.empty).toVector == Vector("x", "y"))
  }

  test("segmentVocab via the expression matches per-word kernel output and is one job") {
    import spark.implicits._
    val docs = Seq("low lower lowest", "newest new").toDF("text")
    val merges = Seq((1, "l", "o"), (2, "lo", "w"), (3, "e", "s"), (4, "es", "t"))
      .toDF("rank", "left", "right")
    val segs = operators.TextStats.bpeSegmentVocab(docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val table = Array(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"))
    assert(segs.keySet == Set("low", "lower", "lowest", "newest", "new"))
    segs.foreach { case (w, syms) =>
      assert(syms == BpeSegment.segment(w, table).toVector, s"word=$w")
    }
    assert(segs("lowest") == Vector("low", "est"))
  }
}
