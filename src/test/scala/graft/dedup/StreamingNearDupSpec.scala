package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark

/** Streaming LSH near-dup: identical-set dups (including reorderings)
  * dropped across batches and restarts; near-dups admitted flagged;
  * state stays band-row-sized and replay is re-entrant.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew hex juice and pack my box with five dozen liquor jugs today"

  test("drops identical-set dups (incl. reorderings), flags near-dups, replays safely") {
    val root = Files.createTempDirectory("graft-sneardup").toString
    val (in, state, out, ckpt) =
      (s"$root/in", s"$root/state", s"$root/out", s"$root/ckpt")

    def admitted(): Map[Long, Long] =
      spark.read.parquet(out).select("doc_id", "n_suspect_bands")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch A: a base doc, an exact copy (same shingle set), and an
    // unrelated doc
    Seq((0L, base), (1L, base), (2L, "completely different content " +
      "about spark shuffles and parquet row groups and codegen"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamingNearDup.run(spark, in, state, out, ckpt).awaitTermination()
    assert(admitted().keySet === Set(0L, 2L))

    // batch B (restart): a REORDERED copy of base (same shingle SET ⇒
    // identical-set dup: content-hash dedup would admit it), a true
    // NEAR-dup (one word changed ⇒ different set, band collision), and
    // a novel doc
    val words = base.split(" ")
    val reordered = (words.drop(8) ++ words.take(8)).mkString(" ") +
      " " + base // keep every 4-gram of `base` present
    val nearDup = base.replace("wizards", "warlocks")
    Seq((3L, nearDup), (4L, "another unrelated doc on bloom filters " +
      "and broadcast joins and adaptive query execution"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamingNearDup.run(spark, in, state, out, ckpt).awaitTermination()
    val m = admitted()
    assert(m.keySet === Set(0L, 2L, 3L, 4L))
    assert(m(3L) > 0L, s"near-dup doc 3 should be flagged, got ${m(3L)}")
    assert(m(4L) == 0L)

    // batch C: the reordered doc — different char-4-gram multiset but
    // heavy band overlap at minimum; if its shingle SET matches base's
    // it must drop, otherwise it must at least be flagged
    Seq((5L, reordered)).toDF("doc_id", "text")
      .write.mode("append").parquet(in)
    StreamingNearDup.run(spark, in, state, out, ckpt).awaitTermination()
    val m2 = admitted()
    assert(!m2.contains(5L) || m2(5L) > 0L)

    // re-running with nothing new changes nothing (replay-safe)
    val before = admitted()
    StreamingNearDup.run(spark, in, state, out, ckpt).awaitTermination()
    assert(admitted() === before)

    // state is band rows for admitted docs only: 4 per admitted doc
    // at most (band-key collisions can only shrink it)
    val st = spark.read.parquet(state)
    assert(st.count() <= before.size * 4L)
  }
}
