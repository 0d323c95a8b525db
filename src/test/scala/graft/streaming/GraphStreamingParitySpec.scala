package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** r14 (r13 verdict item 8): the graph tier's streaming maintenance
  * twin at the IvfStreamingParitySpec bar — vectors arriving across
  * micro-batches must land in exactly the L2 cell the C94 batch
  * kernel assigns, and each cell's bounded candidate-neighbor state
  * must converge to the k members closest to the cell pivot
  * regardless of arrival order.
  */
class GraphStreamingParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("arrivals land on the batch-chosen cells; neighbor lists converge to top-k") {
    val corpus = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val (seeds, nL1, _, kidsArr) = graft.ann.AnnOps.graphLayers(corpus)

    // batch truth: the exact assignment frame ann_graph_search scans
    val batchAssign = graft.ann.AnnOps.graphCellAssign(corpus, seeds, kidsArr, nL1)
      .select("vec_id", "cid2").as[(Long, Int)].collect().toMap

    val all = corpus.as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(all.nonEmpty)
    val k = 8
    val chunks = all.grouped(math.max(1, all.length / 3 + 1)).toSeq

    val mem = MemoryStream[(Long, Seq[Double])]
    val out = StreamOps.streamingGraphInsert(mem.toDS(), seeds, kidsArr, nL1, k)
    val q = out.writeStream.format("memory").queryName("graphins")
      .outputMode("update").start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("graphins")
        .select("vecId", "cid2", "neighbors", "cellSize").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2), r.getLong(3)))

      // every vector exactly once, in exactly the batch-chosen cell
      assert(streamed.length === all.length)
      streamed.foreach { case (id, cid2, _, _) =>
        assert(batchAssign(id) === cid2, s"vec $id")
      }
      // per-cell running sizes are the 1..n sequence, n = batch size
      streamed.groupBy(_._2).foreach { case (cid2, rows) =>
        assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq, s"cell $cid2")
        assert(rows.length === batchAssign.count(_._2 == cid2), s"cell $cid2")
      }
      // the emitted candidate list is a point-in-time snapshot: every
      // listed neighbor is a member of the same cell that arrived in
      // an EARLIER position (vecId order within batches)
      val cellOf = streamed.map(r => r._1 -> r._2).toMap
      streamed.foreach { case (id, cid2, nbrs, _) =>
        nbrs.foreach(nb => assert(cellOf(nb) === cid2, s"vec $id neighbor $nb"))
        assert(nbrs.size <= k)
      }
      // final state convergence: replay the arrivals driver-side with
      // the same bounded-list rule; order-insensitivity of the final
      // top-k means the state equals the k members closest to the
      // cell pivot — the list a batch rebuild would pick
      val vecOf = all.toMap
      streamed.groupBy(_._2).foreach { case (cid2, rows) =>
        val members = rows.map(_._1)
        val expected = members
          .map(id => (graft.ann.AnnOps.cos4(vecOf(id).toArray, seeds(cid2)), id))
          .sortBy { case (c, i) => (-c, i) }.take(k).map(_._2).toSeq
        // reconstruct the final state from the LAST arrival's snapshot
        // + that arrival itself, applying the same rule
        val lastArrival = rows.maxBy(_._4)
        val finalList = ((graft.ann.AnnOps.cos4(vecOf(lastArrival._1).toArray,
            seeds(cid2)), lastArrival._1) ::
          lastArrival._3.map(id =>
            (graft.ann.AnnOps.cos4(vecOf(id).toArray, seeds(cid2)), id)).toList)
          .sortBy { case (c, i) => (-c, i) }.take(k).map(_._2)
        assert(finalList === expected, s"cell $cid2 candidate list")
      }
    } finally q.stop()
  }
}
