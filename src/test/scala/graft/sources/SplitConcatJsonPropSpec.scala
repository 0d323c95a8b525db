package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz for the concatenated-JSON splitter backing the rblob
  * reference-format path (same deterministic property style as
  * HashingPropSpec): for any sequence of rendered JSON values, the
  * splitter must recover exactly the rendered strings, in order —
  * including strings containing braces, brackets, escaped quotes and
  * backslashes, and optional whitespace between values (json.Decoder
  * tolerates it; so must we).
  */
class SplitConcatJsonPropSpec extends AnyFunSuite {

  private def randomString(rnd: scala.util.Random): String = {
    val alphabet = Seq("a", "b", "{", "}", "[", "]", ":", ",", "\\\"", "\\\\",
      "\\n", " ", "x1", "☃")
    (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
  }

  private def randomJson(rnd: scala.util.Random, depth: Int): String =
    rnd.nextInt(if (depth > 2) 2 else 4) match {
      case 0 => s"""{"k${rnd.nextInt(9)}":"${randomString(rnd)}"}"""
      case 1 => s"""{"n":${rnd.nextInt(1000)},"s":"${randomString(rnd)}"}"""
      case 2 =>
        val inner = (0 until rnd.nextInt(3)).map(_ => randomJson(rnd, depth + 1))
        s"""{"a":[${inner.mkString(",")}],"t":"${randomString(rnd)}"}"""
      case _ =>
        s"""[${(0 until rnd.nextInt(3)).map(_ => randomJson(rnd, depth + 1)).mkString(",")}]"""
    }

  test("splitter recovers every rendered value, in order (500 random blobs)") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val values = (0 until rnd.nextInt(6)).map(_ => randomJson(rnd, 0))
      // reference decoder tolerates whitespace between values
      val sep = if (rnd.nextBoolean()) "" else Seq("", " ", "\n", "\t")(rnd.nextInt(4))
      val blob = values.mkString(sep)
      val out = JsonBlobSource.splitConcatJson(blob)
      assert(out === values, s"blob=<$blob>")
    }
  }

  test("splitter ignores content outside values and handles empty blobs") {
    assert(JsonBlobSource.splitConcatJson("") === Seq.empty)
    assert(JsonBlobSource.splitConcatJson("   \n\t ") === Seq.empty)
    assert(JsonBlobSource.splitConcatJson("""  {"a":1}  """) === Seq("""{"a":1}"""))
  }
}
