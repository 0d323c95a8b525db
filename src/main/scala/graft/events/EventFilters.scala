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

  /** filters/metadata.go MetadataEventFilter[T]: deserialize the
    * metadata payload against a typed schema, then filter on the
    * TYPED struct. Error taxonomy exactly the reference's:
    *  - null schema or filter → MetadataEventFilterException at
    *    CONSTRUCTION (metadata.go:31-33);
    *  - a payload that fails to deserialize raises a CODED
    *    deserialization error from the scan (metadata.go
    *    asDeserializationErr) — the runner wraps it as a filter error,
    *    so both Errors.isDeserializationErr and Errors.isFilterErr
    *    match, and dead-letter policies refuse to eat it.
    * Spark form: from_json is PERMISSIVE (a struct of nulls on
    * malformed — indistinguishable from `{}`), so the malformed probe
    * is get_json_object(metadata, '$') IS NULL (null exactly for
    * unparseable JSON, the whole doc otherwise), turned into an
    * executor-side raise_error carrying the classification code — a
    * pure Column plan, no UDF, codegen-friendly on the happy path.
    *
    * Edge payloads (r17, r16 advice):
    *  - the valid JSON literal `null` also nulls the probe, so it is
    *    excluded explicitly — Go's json.Unmarshal("null", &T)
    *    SUCCEEDS leaving T zero-valued, and the pred here sees the
    *    all-null struct (any comparison predicate drops the row,
    *    matching the zero-value non-match);
    *  - empty/whitespace metadata IS malformed — json.Unmarshal("")
    *    fails ("unexpected end of JSON input"), so the old silent
    *    drop is now the reference's deserialization error;
    *  - SQL NULL metadata stays a non-match (documented divergence:
    *    the reference's events always carry a []byte payload, so a
    *    Go-side nil never reaches its deserializer in practice).
    */
  def metadataEventFilter(schema: org.apache.spark.sql.types.StructType,
      pred: Column => Column): EventFilter = {
    if (schema == null || pred == null) throw new Errors.MetadataEventFilterException
    val parsed = from_json(col("metadata"), schema)
    val malformed = col("metadata").isNotNull &&
      trim(col("metadata")) =!= "null" &&
      get_json_object(col("metadata"), "$").isNull
    Raw(when(malformed,
        raise_error(concat(
          lit(s"deserialization failed [${Errors.DeserializationErrCode}]: "),
          col("metadata"))))
      .otherwise(pred(parsed)))
  }

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
    *
    * A NULL key hashes as the empty string (r17, r16 advice):
    * md5(null) is null, which would compare null against EVERY
    * shard's id — the event silently matching no shard while each
    * shard's cursor advances past it, breaking the disjoint-and-
    * complete contract. Coalescing to "" lands all null-keyed events
    * deterministically in one shard instead.
    */
  def shardIdOf(n: Int, key: Column): Column =
    graft.functions.GraftFunctions.md5PrefixLong(
      coalesce(key.cast("string"), lit("")), 4).cast("int") % n
}
