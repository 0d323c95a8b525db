package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** TextOps.tokenize is the JVM char-scan equivalent of the declarative
  * split(normalize(text), " ") — every typed kernel (docQualityStats,
  * docTermCounts, the span-fingerprint kernels) rides on that
  * equivalence, so it is pinned here against adversarial and random
  * inputs evaluated through the REAL Spark expressions.
  */
class TokenizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def declarative(texts: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(TextOps.tokens(col("text")).as("toks"))
      .collect().map(_.getAs[collection.Seq[String]]("toks").toSeq).toSeq
  }

  test("tokenize matches split(normalize) on adversarial inputs") {
    val cases = Seq(
      "", " ", "   ", "a", " a ", "  a  b ", "a!b", "!!!", "?!.,;:",
      "Hello, WORLD 42", "tabs\tand\nnewlinesvt\ffeed\rcr",
      "MiXeD CaSe 123abc456", "1 2  3   4", "trailing space ", " leading",
      "dash-joined words", "under_score", "a" * 500,
      "éàçü accented", "中文 mixed ascii",
      "emoji 😀 in text", "digits0nly 00 7x7")
    val expected = declarative(cases)
    cases.zip(expected).foreach { case (text, want) =>
      assert(TextOps.tokenize(text).toSeq === want, s"for input '$text'")
    }
  }

  test("tokenize matches split(normalize) on seeded random strings") {
    val rng = new scala.util.Random(42)
    val pool = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      " \t\n\f\r" ++ "!@#$%^&*()-_=+[]{};:'\",.<>/?\\|`~" ++
      "éßİı中\ud83d" // accents, sharp s, dotted/dotless I, CJK, lone surrogate
    val cases = Seq.fill(200)(
      (0 until rng.nextInt(80)).map(_ => pool(rng.nextInt(pool.length))).mkString)
    val expected = declarative(cases)
    cases.zip(expected).foreach { case (text, want) =>
      assert(TextOps.tokenize(text).toSeq === want, s"for input '$text'")
    }
  }
}
