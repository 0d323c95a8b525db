package graft.events

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PatternsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val events = Event.project(
    spark.read.parquet(s"${TestSpark.sf}/events.parquet"))

  test("gaps + gapFillNoops exactly close the holes") {
    val visible = events.filter(col("id") % 97 =!= 0)
    val gaps = Patterns.gaps(visible).collect()
    assert(gaps.nonEmpty)
    // every gap is a run of the removed multiples of 97
    gaps.foreach { g =>
      val (lo, hi) = (g.getAs[Long]("gap_start"), g.getAs[Long]("gap_end"))
      (lo to hi).foreach(id => assert(id % 97 === 0))
    }
    val noops = Patterns.gapFillNoops(visible)
    val filled = visible.select("id").unionByName(noops.select("id"))
    // after filling, the id sequence between min and max is gap-free
    assert(Patterns.gaps(filled).isEmpty)
  }

  test("latestState picks the highest-id event per foreign id") {
    val latest = Patterns.latestState(events)
    assert(latest.count() === events.select("foreignId").distinct().count())
    val u12 = latest.filter(col("foreignId") === 12).collect()(0)
    val expected = events.filter(col("foreignId") === 12)
      .orderBy(col("id").desc).limit(1).collect()(0)
    assert(u12.getAs[Long]("id") === expected.getAs[Long]("id"))
  }

  test("assignBatches produces contiguous batches of the right size") {
    val b = Patterns.assignBatches(events, 128)
    val sizes = b.groupBy("batch_no").count().orderBy("batch_no")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.init.forall(_._2 === 128L))
    assert(sizes.map(_._2).sum === 1000L)
  }

  test("per-shard batch assignment needs no global sort and covers the log") {
    val b = Patterns.assignBatchesPerShard(events, nShards = 4, batchSize = 64)
    assert(b.count() === 1000L)
    // plan has no single-partition global sort window
    val plan = b.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    // batches within each shard are contiguous and bounded
    import org.apache.spark.sql.functions._
    val sizes = b.groupBy("shard", "batch_no").count()
    assert(sizes.filter(col("count") > 64).isEmpty)
  }

  test("sessionize splits on the inactivity gap") {
    val sess = Patterns.sessionize(events, gapSeconds = 1800)
    // session event counts must add back up to the log
    assert(sess.agg(sum("n_events")).collect()(0).getLong(0) === 1000L)
    // durations are non-negative and bounded by the log's span
    assert(sess.filter(col("dur_s") < 0).isEmpty)
  }

  test("shards split the log disjointly (co-location key)") {
    val sharded = Patterns.shards(events, 8)
    val total = sharded.groupBy("shard").count().agg(sum("count")).collect()(0).getLong(0)
    assert(total === 1000L)
    assert(sharded.select("shard").distinct().count() === 8L)
  }

  test("deadLetters + healthy partition the log") {
    val dl = Patterns.deadLetters(events)
    val ok = Patterns.healthy(events)
    assert(dl.count() + ok.count() === 1000L)
    assert(dl.filter(col("eventType") =!= "error").isEmpty)
  }
}
