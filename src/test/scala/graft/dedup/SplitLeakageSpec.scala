package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** C114 planted-leakage semantics — the independent hand-worked pin
  * the shared-construction oracle can't provide (the graded
  * dd_split_leakage query replays the same split rule + fingerprint
  * construction on both engines, so a shared misreading would hash
  * green; this spec plants KNOWN leaks and asserts the counts):
  *
  *  - an exact train↔test duplicate counts on the test/exact row;
  *  - a val↔test duplicate does NOT count anywhere (leakage is
  *    train→eval only — eval↔eval dups don't inflate eval scores);
  *  - a long shared substring between a train and a val doc (distinct
  *    fingerprints) counts on the val/winnow row but not val/exact;
  *  - clean docs count in n_docs and never in n_contam.
  */
class SplitLeakageSpec extends AnyFunSuite {
  private def spark = graft.TestSpark.spark

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  /** The C39 md5-bucket split rule, evaluated the same way the
    * operator does (via Spark expressions, not a scala reimpl). */
  private def splitsOf(ids: Seq[Long]): Map[Long, String] = {
    val s = spark
    import s.implicits._
    val b = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("int") % 100
    ids.toDF("doc_id")
      .select(col("doc_id"),
        when(b < 80, "train").when(b < 90, "val").otherwise("test").as("sp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("planted exact + near-dup leaks land on the right (split, tier) rows") {
    val s = spark
    import s.implicits._
    val sp = splitsOf(0L until 400L)
    def firstId(split: String, skip: Set[Long] = Set.empty): Long =
      (0L until 400L).find(id => sp(id) == split && !skip(id)).get

    val trainA = firstId("train")
    val testDup = firstId("test") // exact dup of trainA
    val valNear = firstId("val") // shares a long run with trainB
    val trainB = firstId("train", Set(trainA))
    val testClean = firstId("test", Set(testDup))
    val valClean = firstId("val", Set(valNear))
    val testNearVal = firstId("test", Set(testDup, testClean)) // dup of valClean2
    val valClean2 = firstId("val", Set(valNear, valClean))

    val shared = words("sharedrun", 40).mkString(" ") // ~400 chars >> 27
    val docs = Seq(
      trainA -> words("exacta", 60).mkString(" "),
      testDup -> words("exacta", 60).mkString(" "), // exact train->test leak
      trainB -> (words("tb", 10) ++ Seq(shared) ++ words("tbt", 10)).mkString(" "),
      valNear -> (words("vn", 14) ++ Seq(shared) ++ words("vnt", 6)).mkString(" "),
      testClean -> words("cleant", 50).mkString(" "),
      valClean -> words("cleanv", 50).mkString(" "),
      // eval<->eval duplicate: must NOT count as leakage
      testNearVal -> words("evaldup", 55).mkString(" "),
      valClean2 -> words("evaldup", 55).mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("leakspec").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("dd_split_leakage")(s, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    // test split: 3 docs; exactly the planted exact dup is exact-contaminated
    assert(out(("test", "exact")) === ((3L, 1L)))
    // val split: 3 docs; the near-dup doc hits winnow but not exact
    assert(out(("val", "exact")) === ((3L, 0L)))
    assert(out(("val", "winnow"))._2 === 1L)
    // the eval<->eval duplicate never counts: test/winnow only flags
    // docs paired with TRAIN (the exact-dup pair also shares winnow
    // fingerprints, so the test side sees exactly that one doc)
    assert(out(("test", "winnow"))._2 === 1L)
  }
}
