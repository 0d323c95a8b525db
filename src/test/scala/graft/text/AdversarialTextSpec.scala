package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** r15 (r14 verdict item 7): hand-worked pins for the typed text
  * kernels on adversarial input — astral chars, no-whitespace CJK,
  * combining accents, control chars, empty text — independent of the
  * DuckDB oracle construction (the SuffixSpansSpec discipline). The
  * corpus-level parity gate is tools/adversarial_corpus.py + Verify +
  * tools/check.py (committed as ADVERSARIAL_r15.json); this spec pins
  * the kernel CONTRACT at the unit level so a regression names the
  * exact rule broken (SURVEY §3 charset contract).
  */
class AdversarialTextSpec extends AnyFunSuite {

  test("tokenize: astral chars are separators; token content is charset-stable") {
    // each emoji is one codepoint (two UTF-16 units) — never inside a token
    assert(TextOps.tokenize("hello 😀😀 world").toSeq ===
      Seq("hello", "world"))
    // astral math digit U+1D7DD is NOT [0-9]
    assert(TextOps.tokenize("a𝟝b").toSeq === Seq("a", "b"))
    // CJK with no whitespace and no ascii: the single-empty-token rule
    assert(TextOps.tokenize("这是中文句子").toSeq === Seq(""))
    // mixed CJK/ascii: runs break at every non-[a-z0-9] codepoint
    assert(TextOps.tokenize("中文word混合123数字text").toSeq ===
      Seq("word", "123", "text"))
    // combining accent splits the run (é = e + U+0301)
    assert(TextOps.tokenize("café ok").toSeq === Seq("cafe", "ok"))
  }

  test("lines8: preserved for exotic content, split on literal space only") {
    val t = "一 二 三 四 五 六 七 八 九 十"
    assert(TextOps.lines8(t).toSeq === Seq("一 二 三 四 五 六 七 八", "九 十"))
    assert(TextOps.lines8("").toSeq === Seq(""))
  }

  test("docQualityStats: len and punct count CODE POINTS, not UTF-16 units") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-adv").toString
    Seq(
      // "a😀b": 3 codepoints, 1 punct (the emoji), 2 toks a/b
      (0L, "a😀b", "en", "s0", 3L),
      // two emoji + space: 3 codepoints, 2 punct, zero alnum → [""]
      (1L, "😀 😀", "en", "s0", 3L),
      // sentence+vowel runs with an astral interloper: "e!𝔞?a"
      // snt runs: "!" then "?" (astral breaks the run) = 2
      // syl runs: e, a = 2 (U+1D51E is not an ASCII vowel)
      (2L, "e!𝔞?a", "en", "s0", 5L),
      (3L, "", "en", "s0", 0L),
      (4L, "   \t\n  ", "en", "s0", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val st = TextOps.docQualityStats(spark, dir)
      .select("doc_id", "n", "nd", "punct", "len", "snt", "syl")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(st(0L) === ((2L, 2L, 1L, 3L, 0L, 1L))) // toks a,b; syl run: "a"
    assert(st(1L) === ((1L, 1L, 2L, 3L, 0L, 0L))) // [""] token; 2 punct NOT 4
    assert(st(2L) === ((2L, 2L, 3L, 5L, 2L, 2L)))
    assert(st(3L) === ((1L, 1L, 0L, 0L, 0L, 0L))) // empty → single empty token
    assert(st(4L) === ((1L, 1L, 0L, 7L, 0L, 0L))) // whitespace-only: 0 punct
  }

  test("gramHashes: null and empty normalize to zero grams") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-adv2").toString
    Seq((0L, null: String, "en", "s0", 0L), (1L, "", "en", "s0", 0L),
      (2L, "abcdefgh", "en", "s0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val g = TextOps.gramHashes(spark,
      spark.read.parquet(s"$dir/documents.parquet"), 5).collect()
    assert(g.forall(_._1 == 2L)) // only the real doc emits grams
    assert(g.length === 4) // 8-char doc, 5-grams: 4 distinct
  }
}
