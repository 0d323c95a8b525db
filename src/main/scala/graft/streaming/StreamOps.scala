package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.events.Event

/** Streaming transforms over the canonical event projection —
  * Structured Streaming equivalents of the batch operators in
  * EventOps, for live consumers (SURVEY.md §2.A23/A24 streaming
  * forms, D3).
  *
  * All aggregations are keyed on high-cardinality columns and carry
  * watermarks so state is bounded — the requirement for an unbounded
  * 100 TB/day event feed.
  */
object StreamOps {

  /** Tumbling-window counts per event type with a watermark (late
    * events beyond `lateness` are dropped, state is evicted).
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("eventType"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_val"))
      .select(col("window.start").as("win_start"), col("eventType"), col("n"), col("sum_val"))

  /** Session windows per foreign id (gap-based), the streaming form of
    * Patterns.sessionize.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("foreignId"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_val"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("foreignId"), col("n_events"), col("sum_val"))

  final case class UserState(foreignId: Long, nEvents: Long, lastId: Long, lastType: String)

  /** Custom keyed state via mapGroupsWithState: running per-entity
    * counters + last event — the streaming materialization of
    * Patterns.latestState (doc.go's event→current-state view).
    */
  def runningUserState(events: Dataset[Event]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.foreignId)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout()) {
        (fid: Long, it: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(fid, 0L, -1L, ""))
          var n = prev.nEvents
          var lastId = prev.lastId
          var lastType = prev.lastType
          it.foreach { e =>
            n += 1
            if (e.id > lastId) { lastId = e.id; lastType = e.eventType }
          }
          val next = UserState(fid, n, lastId, lastType)
          state.update(next)
          next
      }
  }

  /** At-least-once → exactly-once on a live stream: duplicate event
    * ids within the watermark horizon are dropped with bounded state
    * (the streaming form of the ev_dedup_ids batch operator; doc.go's
    * at-least-once note).
    */
  def exactlyOnceIds(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("id")

  /** Stream-stream interval join: each left event matched with right
    * events for the same entity within `withinSeconds` AFTER the right
    * event (e.g. purchases within an hour of a view). Watermarks on
    * both sides bound the join state.
    */
  def joinWithin(left: DataFrame, right: DataFrame, withinSeconds: Long,
      lateness: String = "30 minutes"): DataFrame = {
    val l = left.select(col("id").as("l_id"), col("foreignId").as("l_fid"),
      col("ts").as("l_ts")).withWatermark("l_ts", lateness)
    val r = right.select(col("id").as("r_id"), col("foreignId").as("r_fid"),
      col("ts").as("r_ts")).withWatermark("r_ts", lateness)
    l.join(r, expr(
      s"l_fid = r_fid AND l_ts >= r_ts AND l_ts <= r_ts + INTERVAL $withinSeconds SECONDS"))
  }

  final case class PackState(packId: Long, fill: Long)
  final case class PackAssign(shard: Long, docId: Long, nTok: Long, packId: Long)

  /** Streaming greedy sequence packing — tx_seqpack (C41) as a
    * stateful stream: docs arrive continuously, each shard keeps ONE
    * (current pack, fill) pair in keyed state, and every doc is
    * assigned its training-sequence pack id as it lands. Greedy in
    * arrival order per shard (the stream analog of the batch
    * operator's doc_id order; within a micro-batch ties resolve in
    * doc_id order so replays are deterministic). State per shard is
    * two longs — O(shards) total, unbounded-stream safe.
    *
    * Input tuples: (docId, nTok).
    */
  def streamingSeqPack(docs: Dataset[(Long, Long)], budget: Long,
      nShards: Int): Dataset[PackAssign] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1 % nShards)
      .flatMapGroupsWithState[PackState, PackAssign](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, it: Iterator[(Long, Long)], state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState(0L, 0L))
          val out = it.toSeq.sortBy(_._1).map { case (id, n) =>
            // same rule as TextOps.packGreedy: a doc joins the open
            // pack iff it fits; the first doc of a pack always joins
            // (an oversized doc gets a pack of its own)
            if (st.fill > 0 && st.fill + n > budget) st = PackState(st.packId + 1, 0L)
            st = PackState(st.packId, st.fill + n)
            PackAssign(shard, id, n, st.packId)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class TrendState(lastDay: Long, score: Long)
  final case class TrendScore(etype: String, lastDay: Long, score: Long)

  final case class MgState(keys: Array[String], counts: Array[Long])
  final case class MgEntry(shard: Int, term: String, est: Long)

  /** Streaming time-decayed trending — ev_trending (A70) as keyed
    * state: per event type, ONE (frontier day, score) pair; events at
    * the frontier add 2^30, advancing the frontier by k days shifts
    * the score right k bits (the exact integer form of a 1-day
    * half-life — no floats anywhere, so a replay reproduces scores
    * bit-identically). Late events older than 30 days add 0, exactly
    * like the batch operator. State is two longs per type —
    * unbounded-stream safe. Consistency with the batch form is
    * spec'd: after aligning each type's frontier to the global max
    * day (a right shift), streamed scores EQUAL ev_trending's.
    */
  def streamingTrending(events: DataFrame): Dataset[TrendScore] = {
    import events.sparkSession.implicits._
    events
      .select(col("eventType"), expr("unix_timestamp(ts) div 86400").as("day"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[TrendState, TrendScore](GroupStateTimeout.NoTimeout()) {
        (etype: String, it: Iterator[(String, Long)], state: GroupState[TrendState]) =>
          var st = state.getOption.getOrElse(TrendState(Long.MinValue, 0L))
          it.toSeq.sortBy(_._2).foreach { case (_, day) =>
            if (st.lastDay == Long.MinValue) st = TrendState(day, 0L)
            if (day > st.lastDay) {
              val shift = day - st.lastDay
              st = TrendState(day, if (shift >= 63) 0L else st.score >> shift.toInt)
            }
            val age = st.lastDay - day
            if (age <= 30) st = TrendState(st.lastDay, st.score + (1L << (30 - age).toInt))
          }
          state.update(st)
          TrendScore(etype, st.lastDay, st.score)
      }
  }

  /** STREAMING heavy hitters (C28's Misra-Gries sketch as keyed
    * state, SURVEY §2.C28b): terms hash-shard into `shards` groups
    * and each group's state is ONE bounded MG sketch (≤ k counters —
    * scalars, unbounded-stream-safe). A term always lands in the same
    * shard, so each shard runs textbook MG over its substream: after
    * any prefix, every term with shard-count > n_shard/(k+1) is
    * guaranteed present, and a surviving counter underestimates its
    * true count by at most n_shard/(k+1) — the same candidate-
    * superset contract the batch freq_sketch aggregate gives, held
    * ACROSS micro-batches. Update-mode output re-emits a shard's
    * current candidates each batch; downstream exact-recounts the
    * union (the C28 pass-2 discipline).
    */
  def streamingHeavyHitters(terms: Dataset[String], k: Int = 40,
      shards: Int = 8): Dataset[MgEntry] = {
    import terms.sparkSession.implicits._
    terms.map(t => (math.floorMod(t.hashCode, shards), t))
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgState, MgEntry](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (shard: Int, it: Iterator[(Int, String)], state: GroupState[MgState]) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          state.getOption.foreach(s =>
            s.keys.zip(s.counts).foreach { case (key, c) => m(key) = c })
          it.foreach { case (_, t) =>
            if (m.contains(t)) m(t) += 1L
            else if (m.size < k) m(t) = 1L
            else {
              // the MG decrement step: every counter drops by one,
              // zeroed counters evict (the arriving term is absorbed
              // by the same decrement)
              val keys = m.keys.toArray
              keys.foreach { key =>
                val c = m(key) - 1L
                if (c <= 0L) m.remove(key) else m(key) = c
              }
            }
          }
          state.update(MgState(m.keys.toArray, m.values.toArray))
          m.iterator.map { case (t, c) => MgEntry(shard, t, c) }
      }
  }

  final case class IvfAssign(vecId: Long, cid: Long, listSize: Long)

  /** Streaming IVF list maintenance (r13 — C23's streaming twin the
    * way C28b twins C28): vectors arrive continuously, each is
    * quantized against the FIXED coarse layer (the offline-trained
    * pivots, KB-scale, broadcast once) and its inverted list's
    * membership count lives as keyed state — the running signal an
    * index maintainer watches to trigger quantizer re-training when
    * lists skew. Assignment replicates the batch rule float-for-float
    * (argmax of dot/(√·√) accumulated in index order — the codegen
    * cosine's loop — ties to the lower cid; NaN ranks greatest, as
    * Spark's double ordering does), so a vector lands in the SAME
    * list whether it arrived in a batch build or on the stream
    * (IvfStreamingParitySpec). Within a micro-batch, per-list output
    * is emitted in vecId order so replays are deterministic. State is
    * one long per non-empty list — O(K), unbounded-stream safe.
    */
  def streamingIvfAssign(vecs: Dataset[(Long, Seq[Double])],
      pivots: Seq[(Long, Seq[Double])]): Dataset[IvfAssign] = {
    import vecs.sparkSession.implicits._
    val piv = pivots.map { case (cid, v) => (cid, v.toArray) }.toArray
    val bc = vecs.sparkSession.sparkContext.broadcast(piv)
    def nearest(v: Seq[Double]): Long = {
      val arr = v.toArray
      var bestCid = Long.MaxValue
      var best = 0.0
      var first = true
      bc.value.foreach { case (cid, cv) =>
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        var i = 0
        val n = math.min(arr.length, cv.length)
        while (i < n) {
          dot += arr(i) * cv(i); nx += arr(i) * arr(i); ny += cv(i) * cv(i)
          i += 1
        }
        val cs = dot / (math.sqrt(nx) * math.sqrt(ny))
        val cmp = java.lang.Double.compare(cs, best)
        if (first || cmp > 0 || (cmp == 0 && cid < bestCid)) {
          best = cs; bestCid = cid; first = false
        }
      }
      bestCid
    }
    vecs.map { case (id, v) => (nearest(v), id) }
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, IvfAssign](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (cid: Long, it: Iterator[(Long, Long)], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = it.map(_._2).toArray.sorted.map { id =>
            n += 1; IvfAssign(id, cid, n)
          }
          state.update(n)
          out.iterator
      }
  }

  final case class GraphInsert(vecId: Long, cid2: Int,
    neighbors: Seq[Long], cellSize: Long)

  /** STREAMING maintenance twin for the C94 two-layer graph tier (r13
    * verdict item 8 — the way streamingIvfAssign twins C23): new
    * vectors insert into the index as keyed state. Each arrival is
    * hierarchically assigned with the EXACT batch rule
    * (AnnOps.hierCell — nearest L1 parent, then nearest child cell,
    * cos4 arithmetic shared verbatim), so an arrival lands in the
    * same cell batch construction picks
    * (GraphStreamingParitySpec). Per-cell keyed state is the bounded
    * CANDIDATE NEIGHBOR LIST a graph insert links against — the k
    * members closest to the cell's pivot by (cos4 desc, vecId asc) —
    * and each emitted row carries the list AS OF the arrival (the
    * nodes an NSW insert would wire to) plus the running cell size.
    * State is O(|L2| · k) — unbounded-stream safe; within a
    * micro-batch arrivals process in vecId order so replays are
    * deterministic.
    */
  def streamingGraphInsert(vecs: Dataset[(Long, Seq[Double])],
      seeds: Array[Array[Double]], kidsArr: Array[Array[Int]], nL1: Int,
      k: Int = 8): Dataset[GraphInsert] = {
    import vecs.sparkSession.implicits._
    val bc = vecs.sparkSession.sparkContext.broadcast((seeds, kidsArr))
    vecs.map { case (id, v) =>
      val (sds, kids) = bc.value
      (graft.ann.AnnOps.hierCell(v.toArray, sds, kids, nL1), id, v)
    }
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, List[(Double, Long)]), GraphInsert](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (cid2: Int, it: Iterator[(Int, Long, Seq[Double])],
         state: GroupState[(Long, List[(Double, Long)])]) =>
          val (sds, _) = bc.value
          var (n, cand) = state.getOption.getOrElse((0L, List.empty[(Double, Long)]))
          val out = it.toArray.sortBy(_._2).map { case (_, id, v) =>
            val snapshot = cand.map(_._2)
            val cs = graft.ann.AnnOps.cos4(v.toArray, sds(cid2))
            n += 1
            cand = ((cs, id) :: cand)
              .sortBy { case (c, i) => (-c, i) }.take(k)
            GraphInsert(id, cid2, snapshot, n)
          }
          state.update((n, cand))
          out.iterator
      }
  }

  /** Exactly-once parquet sink for foreachBatch: each micro-batch
    * lands in its own `batch_id=N` partition with overwrite, so a
    * replayed batch (at-least-once delivery) overwrites itself instead
    * of duplicating — the standard idempotent-sink pattern.
    */
  def idempotentParquetSink(dir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")

  /** Output mode helper: state-ful ops above use Update semantics. */
  val updateMode: OutputMode = OutputMode.Update()
}
