package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Md5PrefixLongSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("md5_prefix_long is bit-identical to the conv(substring(md5)) chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val strs = (0 until 2000).map { i =>
      i % 7 match {
        case 0 => rnd.nextLong().toString
        case 1 => ""
        case 2 => "word" + i
        case 3 => rnd.nextString(1 + rnd.nextInt(20)) // arbitrary unicode
        case 4 => "émoji🙂" + i
        case 5 => i.toString + "#v"
        case _ => List.fill(rnd.nextInt(5))("tok" + rnd.nextInt(9)).mkString(" ")
      }
    } :+ null
    val df = strs.toDF("s")
    Seq(1, 4, 8, 15).foreach { n =>
      val cmp = df.select(
        GraftFunctions.md5PrefixLong(col("s"), n).as("fast"),
        conv(substring(md5(col("s")), 1, n), 16, 10).cast("long").as("ref"))
      val bad = cmp.filter(
        !(col("fast") <=> col("ref"))).count()
      assert(bad === 0, s"mismatch at nHex=$n")
    }
  }

  test("null input yields null, matching the chain") {
    val df = spark.sql("SELECT CAST(NULL AS STRING) AS s")
    val row = df.select(
      GraftFunctions.md5PrefixLong(col("s"), 8).as("fast"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("ref")).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}
