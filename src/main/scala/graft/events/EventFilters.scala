package graft.events

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composable event filters (reference: filter.go `EventFilter`,
  * filters/combine.go, filters/metadata.go).
  *
  * Unlike the reference's per-event Go closures, a graft filter IS a
  * Catalyst `Column` predicate: it participates in predicate pushdown
  * and whole-stage codegen, so "filtering" 100 TB of events means
  * pruning row groups, not calling a function per row.
  */
sealed trait EventFilter {
  def toColumn: Column
  def &&(other: EventFilter): EventFilter = EventFilter.And(this, other)
  def ||(other: EventFilter): EventFilter = EventFilter.Or(this, other)
  def unary_! : EventFilter = EventFilter.Not(this)
}

object EventFilter {
  final case class Raw(c: Column) extends EventFilter { def toColumn: Column = c }
  final case class And(a: EventFilter, b: EventFilter) extends EventFilter {
    def toColumn: Column = a.toColumn && b.toColumn
  }
  final case class Or(a: EventFilter, b: EventFilter) extends EventFilter {
    def toColumn: Column = a.toColumn || b.toColumn
  }
  final case class Not(a: EventFilter) extends EventFilter {
    def toColumn: Column = !a.toColumn
  }

  /** reflex.IsType */
  def ofType(t: String): EventFilter = Raw(col("eventType") === t)

  /** reflex.IsAnyType — an EMPTY include list matches everything
    * (reference consumer.go:207: `len(filterIncludeTypes) == 0 || …`;
    * consumer_test.go "empty include filter provided" consumes all),
    * NOT Spark's empty-isin() which would match nothing.
    */
  def ofAnyType(ts: String*): EventFilter =
    if (ts.isEmpty) Raw(lit(true)) else Raw(col("eventType").isin(ts: _*))

  def foreignId(id: Long): EventFilter = Raw(col("foreignId") === id)

  def foreignIdIn(ids: Long*): EventFilter = Raw(col("foreignId").isin(ids: _*))

  /** filters/metadata.go: predicate over the JSON metadata payload. */
  def metadataInt(path: String)(pred: Column => Column): EventFilter =
    Raw(pred(get_json_object(col("metadata"), path).cast("int")))

  /** rpatterns/parallel.go `filterOnHash`: shard m-of-n. The hash is a
    * portable md5-prefix (identical in any engine, used by the DuckDB
    * oracle) rather than an engine-private hash; at scale the shard id
    * is also a fine pre-partitioning key.
    */
  def shardMofN(m: Int, n: Int): EventFilter =
    Raw(shardId(n) === m)

  def shardId(n: Int): Column = shardIdOf(n, col("foreignId"))

  /** shardId with an explicit hash key (parallel.go WithHashOption /
    * WithHashFn: the reference hashes the CHOSEN key — event id by
    * default, type or foreign id or a custom fn by option — with
    * fnv32 mod n; here the same portable md5-prefix hash as
    * `shardId`, parameterized on the key expression).
    */
  def shardIdOf(n: Int, key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % n
}
