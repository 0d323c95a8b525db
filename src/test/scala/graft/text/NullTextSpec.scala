package graft.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark

/** Null-text robustness: the typed JVM loops (gram counting, shingle
  * hashing, quality scoring) replaced null-safe HOF expressions, so a
  * single NULL text row must degrade to "zero grams / empty doc" —
  * matching the old HOF behavior and the DuckDB oracle — instead of
  * NPE-failing the task.
  */
class NullTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** temp data dir whose documents.parquet carries one null-text row */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-nulltext").toString
    val docs = (0L until 30L).map { i =>
      val text = if (i == 17L) null
        else s"the quick data stream $i joins a slow table row batch merge query filter " * 3
      (i, text, if (i % 2 == 0) "en" else "es", "webcrawl", Option(text).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(2).write.parquet(s"$d/documents.parquet")
    d
  }

  private val affected = Seq(
    "tx_ngram_profile", "tx_decontaminate", "tx_source_mix",
    "dd_minhash_lsh", "dd_simhash", "dd_exact", "tx_quality", "tx_tokens")

  for (q <- affected)
    test(s"$q tolerates a NULL text document") {
      val fn = graft.SparkEntry.queries(q)
      // must not throw; the null doc contributes nothing (or an
      // empty-doc row for per-doc scorers)
      fn(spark, dir).collect()
    }
}
