package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** normalizeLocal / tokenCountLocal are the JVM char-loop equivalents
  * of the declarative normalize / size(tokens) — tx_ngram_profile and
  * tx_token_shards ride on that equivalence, so it is pinned against
  * adversarial and random inputs evaluated through the REAL Spark
  * expressions (the TokenizeSpec precedent).
  */
class NormalizeLocalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cases = Seq(
    "", " ", "   ", "a", " a ", "  a  b ", "a!b", "!!!", "?!.,;:",
    "Hello, WORLD 42", "tabs\tand\nnewlinesvt\ffeed\rcr",
    "MiXeD CaSe 123abc456", "1 2  3   4", "trailing space ", " leading",
    "dash-joined words", "under_score", "a" * 500,
    "éàçü accented", "中文 mixed ascii",
    "emoji 😀 in text", "digits0nly 00 7x7")

  private def declarative(texts: Seq[String]): Seq[(String, Integer)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(TextOps.normalize(col("text")).as("norm"),
        size(TextOps.tokens(col("text"))).as("n"))
      .collect().map(r => (r.getString(0), Integer.valueOf(r.getInt(1)))).toSeq
  }

  test("normalizeLocal and tokenCountLocal match the Spark expressions") {
    val expected = declarative(cases)
    cases.zip(expected).foreach { case (text, (wantNorm, wantN)) =>
      assert(TextOps.normalizeLocal(text) === wantNorm, s"norm for '$text'")
      assert(TextOps.tokenCountLocal(text) === Some(wantN.intValue), s"count for '$text'")
    }
  }

  test("random strings round-trip identically") {
    val rng = new scala.util.Random(7)
    val pool = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      " \t\n\f\r" ++ "!@#$%^&*()-_=+[]{};:'\",.<>/?\\|`~" ++ "éÉß中😀"
    val texts = (1 to 200).map { _ =>
      (1 to rng.nextInt(80)).map(_ => pool(rng.nextInt(pool.length))).mkString
    }
    val expected = declarative(texts)
    texts.zip(expected).foreach { case (text, (wantNorm, wantN)) =>
      assert(TextOps.normalizeLocal(text) === wantNorm, s"norm for '$text'")
      assert(TextOps.tokenCountLocal(text) === Some(wantN.intValue), s"count for '$text'")
    }
  }

  test("null propagates as null/None") {
    assert(TextOps.normalizeLocal(null) === null)
    assert(TextOps.tokenCountLocal(null) === None)
  }
}
