package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** r13 (r12 verdict item 10): streaming IVF list maintenance must
  * assign every vector to the SAME inverted list the batch build
  * (ann_ivf's quantizer) assigns it — across micro-batch boundaries,
  * against the identical broadcast pivot layer. Also pins the state
  * semantics: per-list counts accumulate across batches and the final
  * sizes equal the batch-side groupBy.
  */
class IvfStreamingParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("list assignments match the batch quantizer across micro-batches") {
    val corpus = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val cents = graft.ann.AnnOps.ivfCentroids(corpus)
    val pivots = cents.as[(Long, Seq[Double])].collect().toSeq

    // batch truth: the exact assignment frame ann_ivf scans per list
    val batchAssign = graft.ann.AnnOps.ivfAssignments(spark, corpus, cents)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap

    val all = corpus.as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(all.nonEmpty)
    val chunks = all.grouped(math.max(1, all.length / 3 + 1)).toSeq

    val mem = MemoryStream[(Long, Seq[Double])]
    val out = StreamOps.streamingIvfAssign(mem.toDS(), pivots)
    val q = out.writeStream.format("memory").queryName("ivfs")
      .outputMode("update").start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("ivfs")
        .select("vecId", "cid", "listSize").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      // every vector exactly once, on exactly the batch-chosen list
      assert(streamed.length === all.length)
      streamed.foreach { case (id, cid, _) =>
        assert(batchAssign(id) === cid, s"vec $id")
      }
      // per-list counts accumulate to the batch-side list sizes
      val finalSizes = streamed.groupBy(_._2)
        .map { case (cid, rows) => cid -> rows.map(_._3).max }
      val batchSizes = batchAssign.groupBy(_._2)
        .map { case (cid, m) => cid -> m.size.toLong }
      assert(finalSizes === batchSizes)
      // and within a list the running size is the 1..n sequence
      streamed.groupBy(_._2).foreach { case (cid, rows) =>
        assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq, s"list $cid")
      }
    } finally q.stop()
  }
}
