package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark

/** The composed streaming pipeline (ingest → exact-dedup → near-dup
  * admit → quality gate → seqpack) as ONE job: each stage's admit
  * semantics hold THROUGH the chain, pack cursors continue across
  * batches, and a crash-replay of a batch (same batch id, state
  * tables already holding that batch's rows) re-derives identical
  * decisions — the provenance re-entrancy rule survives composition.
  */
class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // quality-passing filler, exactly 40 tokens: 36 unique words + 4
  // distinct stopwords — passes all four gate predicates (no dup
  // tokens, stops·20 = 80 ≥ 40, no punct, length ≥ 5)
  private def good(seed: Int): String =
    ((0 until 36).map(i => s"w${seed}q$i") ++ Seq("the", "of", "and", "in"))
      .mkString(" ")

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir)

  private def outRows(out: String): Map[Long, (Long, Long, Long)] =
    spark.read.parquet(out)
      .select("doc_id", "shard", "pack_id", "n_suspect_bands")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("each stage's semantics hold through the chain; packs continue across batches; replay is byte-identical") {
    val root = Files.createTempDirectory("graft-spipe").toString
    val (in, state, out, ckpt) =
      (s"$root/in", s"$root/state", s"$root/out", s"$root/ckpt")

    // batch A: 0 admits; 1 is an EXACT dup of 0 (stage-1 drop); 2 is
    // a reordering of 0's words = identical shingle-set... too strong
    // for 4-shingles of different word orders, so give 2 byte-equal
    // text with extra trailing space normalization identity instead:
    // "  " collapses — same fingerprint → stage-1 drop too. 3 fails
    // the gate (short). 4 admits.
    val a = Seq(
      0L -> good(0),
      1L -> good(0),
      2L -> (good(0) + "  "),
      3L -> "too short",
      4L -> good(4))
    writeDocs(in, a)
    StreamingPipeline.run(spark, in, state, out, ckpt,
      budget = 100L, nShards = 2).awaitTermination()
    val r1 = outRows(out)
    assert(r1.keySet === Set(0L, 4L), s"stage drops leaked: ${r1.keySet}")
    // both docs are 40 tokens; shard = doc_id % 2 → 0 and 4 share
    // shard 0 and FIT one 100-token pack together (80 ≤ 100)
    assert(r1(0L)._1 === 0L && r1(4L)._1 === 0L)
    assert(r1(0L)._2 === 0L && r1(4L)._2 === 0L, "both fit pack 0")

    // batch B (restart = new run, same checkpoint): 5 exact-dups 4
    // across batches (state-table history drop); 6 admits on shard 0
    // → its 40 tokens do NOT fit pack 0 (80 + 40 > 100): the cursor
    // carried across batches opens pack 1; 7 admits on shard 1 →
    // pack 0 there.
    val b = Seq(5L -> good(4), 6L -> good(6), 7L -> good(7))
    writeDocs(in, b)
    StreamingPipeline.run(spark, in, state, out, ckpt,
      budget = 100L, nShards = 2).awaitTermination()
    val r2 = outRows(out)
    assert(r2.keySet === Set(0L, 4L, 6L, 7L))
    assert(r2(6L)._1 === 0L && r2(6L)._2 === 1L,
      s"pack cursor must carry across batches: ${r2(6L)}")
    assert(r2(7L)._1 === 1L && r2(7L)._2 === 0L)

    // crash-replay of batch 1 across the composition: the crash
    // window is "every state table already holds batch 1's rows, the
    // checkpoint never committed" — at-least-once re-delivers the
    // SAME batch id with the same rows. processBatch must re-derive
    // identical decisions through ALL FOUR chained stages: its own
    // fp rows, band rows, and pack cursor are invisible to it, the
    // earlier batch's are not. Run it twice (a second crash in the
    // replay itself) to show it is a fixpoint, not a one-shot.
    val bDf = b.toDF("doc_id", "text")
    for (attempt <- 1 to 2) {
      val replayed = StreamingPipeline.processBatch(spark, bDf, state,
        batchId = 1L, budget = 100L, nShards = 2, nBuckets = 16)
        .select("doc_id", "shard", "pack_id", "n_suspect_bands")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(replayed.keySet === Set(6L, 7L),
        s"replay attempt $attempt re-admitted a dup or dropped an admit")
      assert(replayed(6L) === r2(6L) && replayed(7L) === r2(7L),
        s"replay attempt $attempt changed pack assignment")
    }
    // and the durable output is untouched by the replays
    assert(outRows(out) === r2)
  }

  test("checkpoint LOSS: recover() rebuilds from state provenance, zero duplicate output") {
    val root = Files.createTempDirectory("graft-spipe-loss").toString
    val (in, state, out, ckpt) =
      (s"$root/in", s"$root/state", s"$root/out", s"$root/ckpt")
    // two committed batches, exactly like the happy path: 0,4 admit in
    // batch 0; 6,7 admit in batch 1 (5 is a cross-batch exact dup)
    writeDocs(in, Seq(0L -> good(0), 1L -> good(0), 3L -> "too short", 4L -> good(4)))
    StreamingPipeline.run(spark, in, state, out, ckpt,
      budget = 100L, nShards = 2).awaitTermination()
    writeDocs(in, Seq(5L -> good(4), 6L -> good(6), 7L -> good(7)))
    StreamingPipeline.run(spark, in, state, out, ckpt,
      budget = 100L, nShards = 2).awaitTermination()
    val committed = outRows(out)
    assert(committed.keySet === Set(0L, 4L, 6L, 7L))
    assert(StreamingPipeline.maxCommittedBatch(spark, state) === 1L)

    // disaster: the checkpoint directory is lost; new data arrives
    graft.util.AtomicDir.deleteRec(ckpt)
    writeDocs(in, Seq(8L -> good(8)))
    StreamingPipeline.recover(spark, in, state, out, s"$root/ckpt2",
      budget = 100L, nShards = 2).awaitTermination()
    val recovered = outRows(out)
    // every re-presented doc dropped against its own provenance;
    // only the genuinely-new doc admitted, exactly once
    assert(recovered.keySet === committed.keySet + 8L,
      s"recovery duplicated or lost docs: ${recovered.keySet}")
    committed.foreach { case (id, v) =>
      assert(recovered(id) === v, s"recovery rewrote doc $id: ${recovered(id)} != $v")
    }
    // the pack cursor carried across the loss: shard 0 held pack 1 at
    // fill 40 (doc 6); doc 8 (40 tokens, shard 0) joins pack 1
    assert(recovered(8L)._1 === 0L && recovered(8L)._2 === 1L,
      s"pack cursor lost in recovery: ${recovered(8L)}")

    // a second recovery with nothing new is a fixpoint
    StreamingPipeline.recover(spark, in, state, out, s"$root/ckpt3",
      budget = 100L, nShards = 2).awaitTermination()
    assert(outRows(out) === recovered)
  }

  test("gate stage equals the batch tx_quality_gate keep set") {
    val df = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val viaCol = df.filter(graft.text.TextOps.qualityKeepCol(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaQuery = graft.SparkEntry.queries("tx_quality_gate")(spark, TestSpark.sf)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaCol === viaQuery)
  }
}
