package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark

/** Exactly-once streaming dedup: first-seen fingerprints admitted
  * across micro-batch boundaries and process restarts; state stays
  * fingerprint-sized.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("admits first-seen content across batches and restarts; state is fp-sized") {
    val root = Files.createTempDirectory("graft-sdedup").toString
    val (in, state, out, ckpt) =
      (s"$root/in", s"$root/state", s"$root/out", s"$root/ckpt")

    // batch A: one in-batch dup (doc 2 repeats doc 0's content)
    Seq((0L, "alpha beta"), (1L, "gamma delta"), (2L, "alpha beta"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamingDedup.run(spark, in, state, out, ckpt).awaitTermination()
    def admitted(): Set[Long] =
      spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted() === Set(0L, 1L))

    // batch B (a separate run = process restart): one historical dup,
    // one novel doc
    Seq((3L, "gamma delta"), (4L, "epsilon zeta"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamingDedup.run(spark, in, state, out, ckpt).awaitTermination()
    assert(admitted() === Set(0L, 1L, 4L))

    // state carries one row per distinct fingerprint, not per doc
    val st = spark.read.parquet(state)
    assert(st.count() === 3L)
    assert(st.select(countDistinct("fp")).collect()(0).getLong(0) === 3L)

    // re-running with nothing new admits nothing and changes nothing
    StreamingDedup.run(spark, in, state, out, ckpt).awaitTermination()
    assert(admitted() === Set(0L, 1L, 4L))
    assert(spark.read.parquet(state).count() === 3L)
  }
}
