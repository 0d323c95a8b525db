package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** C113 planted-duplicate semantics (the r13 verdict's "done" bar):
  * a 60-token duplicate shared by two docs at MISALIGNED offsets (7
  * and 23 — neither a multiple of 16) must come back as exactly one
  * maximal span of exactly 60 tokens in each doc, and a 30-token
  * repeat — which the 16-gram accounting of dd_span_dedup flags —
  * must be invisible at the Lee et al. 50-token bar. This is the
  * independent hand-worked pin the shared-construction oracle can't
  * provide (the graded dd_suffix_spans query replays the same
  * construction on both engines).
  */
class SuffixSpansSpec extends AnyFunSuite {
  private def spark = graft.TestSpark.spark

  // filler vocabularies are disjoint between docs so no accidental
  // cross-doc window collides; tokens are simple lowercase words that
  // survive TextOps.tokenize unchanged
  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("60-token duplicate at misaligned offsets 7/23 -> one maximal span of 60") {
    val s = spark
    import s.implicits._
    val run60 = words("dup", 60)
    val docA = (words("fillera", 7) ++ run60 ++ words("taila", 40)).mkString(" ")
    val docB = (words("fillerb", 23) ++ run60 ++ words("tailb", 55)).mkString(" ")
    val docC = words("other", 120).mkString(" ") // clean doc, never flagged
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val out = DedupOps.suffixSpans(DedupOps.spanHashPositionsOf(df, 50), 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 1L, 60L, 60L), (2L, 1L, 60L, 60L)))
  }

  test("30-token repeat is flagged by the 16-gram tier but NOT at the 50-token bar") {
    val s = spark
    import s.implicits._
    val run30 = words("rep", 30)
    val docA = (words("ka", 11) ++ run30 ++ words("kta", 30)).mkString(" ")
    val docB = (words("kb", 19) ++ run30 ++ words("ktb", 30)).mkString(" ")
    val df = Seq((10L, docA), (20L, docB)).toDF("doc_id", "text")
    // 50-token bar: nothing
    val out50 = DedupOps.suffixSpans(DedupOps.spanHashPositionsOf(df, 50), 50)
    assert(out50.count() === 0L)
    // 16-gram positions DO collide (what dd_span_dedup would flag):
    // the 30-token run contains 15 shared 16-windows per doc
    val pos16 = DedupOps.spanHashPositionsOf(df, 16)
    val dup16 = pos16.groupBy("h").count().filter(col("count") >= 2).count()
    assert(dup16 === 15L)
  }

  test("same-doc self-repeat counts as duplication (paper semantics)") {
    val s = spark
    import s.implicits._
    val run55 = words("self", 55)
    val doc = (run55 ++ words("mid", 9) ++ run55).mkString(" ")
    val df = Seq((7L, doc)).toDF("doc_id", "text")
    val out = DedupOps.suffixSpans(DedupOps.spanHashPositionsOf(df, 50), 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // two islands of 55, one per occurrence (the 9-token gap separates them)
    assert(out.toSeq === Seq((7L, 2L, 110L, 55L)))
  }

  test("adjacent islands merge: overlapping occurrences form one maximal span") {
    val s = spark
    import s.implicits._
    // doc where a 50-window repeats immediately adjacent: token run of
    // 100 identical-period tokens would alias; instead plant a 70-token
    // run shared by two docs — coverage must merge to ONE 70-span, not
    // 21 window-spans
    val run70 = words("mrg", 70)
    val docA = (words("fa", 3) ++ run70).mkString(" ")
    val docB = (words("fb", 9) ++ run70 ++ words("fbt", 2)).mkString(" ")
    val df = Seq((100L, docA), (200L, docB)).toDF("doc_id", "text")
    val out = DedupOps.suffixSpans(DedupOps.spanHashPositionsOf(df, 50), 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((100L, 1L, 70L, 70L), (200L, 1L, 70L, 70L)))
  }
}
