package graft.events

/** Error taxonomy predicates (reference: errors.go:57 IsFilterErr,
  * filters/metadata.go IsDeserializationErr /
  * IsMetadataEventFilterErr).
  *
  * The reference classifies errors with jettison string CODES and
  * `errors.Is` over the wrap chain; here the same classification
  * walks the JVM cause chain matching either the typed exception or
  * its embedded code — the code path matters because a failure raised
  * from inside a Catalyst expression (raise_error in a filter column)
  * crosses the executor/driver boundary as a generic SparkException
  * whose MESSAGE survives serialization even when the class does not.
  *
  * Why a dead-letter policy needs this: a filter error means the
  * consumer never SAW the event — reference consumer.go:170-181 wraps
  * it (asFilterErr) and does not process the event, so routing it to
  * the dead-letter table like a consume failure would silently drop
  * an event no consumer attempted. The runner therefore re-raises
  * filter errors through BestEffort/DeadLetter instead of
  * retrying/skipping the batch.
  */
object Errors {

  /** Stable classification codes, embedded in messages exactly like
    * the reference's jettison j.C codes (errors.go ERR_cbdf33be…,
    * filters/metadata.go ERR_7e3f5b8a… / ERR_1a5f8c3e…).
    */
  val FilterErrCode = "GRAFT_ERR_FILTER"
  val DeserializationErrCode = "GRAFT_ERR_DESERIALIZATION"
  val MetadataEventFilterErrCode = "GRAFT_ERR_METADATA_EVENT_FILTER"

  /** errors.go filterErr / asFilterErr (consumer.go:177): wraps any
    * error raised while EVALUATING an event filter. */
  final class FilterException(cause: Throwable)
    extends RuntimeException(s"error in filter [$FilterErrCode]", cause)

  /** filters/metadata.go deserializationErr: metadata payload failed
    * to deserialize inside a MetadataEventFilter. */
  final class DeserializationException(detail: String, cause: Throwable = null)
    extends RuntimeException(
      s"deserialization failed [$DeserializationErrCode]: $detail", cause)

  /** filters/metadata.go metadataEventFilterErr: construction with a
    * null deserializer schema or data filter. */
  final class MetadataEventFilterException
    extends IllegalArgumentException(
      "cannot make a MetadataEventFilter from a null schema or filter " +
        s"[$MetadataEventFilterErrCode]")

  /** errors.go IsFilterErr. */
  def isFilterErr(t: Throwable): Boolean =
    matches(t, classOf[FilterException], FilterErrCode)

  /** filters/metadata.go IsDeserializationErr. */
  def isDeserializationErr(t: Throwable): Boolean =
    matches(t, classOf[DeserializationException], DeserializationErrCode)

  /** filters/metadata.go IsMetadataEventFilterErr. */
  def isMetadataEventFilterErr(t: Throwable): Boolean =
    matches(t, classOf[MetadataEventFilterException], MetadataEventFilterErrCode)

  /** r17 (r16 advice, medium): does this failure originate in
    * EVALUATING a filter expression, as opposed to reading or
    * scheduling the batch? Matches the engine's own coded raises
    * (filter / deserialization codes riding a raise_error column),
    * Spark's expression-runtime class (`SparkRuntimeException` —
    * raise_error, ANSI eval failures), and UDF-execution failures by
    * their error-class marker. Transient source/IO/executor errors
    * (FileReadException, shuffle fetch failures, executor loss)
    * deliberately do NOT match: the reference wraps only errors
    * raised by the filter function itself (consumer.go asFilterErr),
    * so everything else must stay eligible for the normal
    * error-mode/retry machinery.
    */
  def isFilterOriginated(t: Throwable): Boolean =
    isFilterErr(t) || isDeserializationErr(t) ||
    chain(t).exists { e =>
      // class-name match: SparkRuntimeException is private[spark] in
      // its Scala signature, so an isInstanceOf won't compile here
      e.getClass.getName == "org.apache.spark.SparkRuntimeException" ||
      Option(e.getMessage).exists(m =>
        m.contains("USER_RAISED_EXCEPTION") || m.contains("FAILED_EXECUTE_UDF"))
    }

  /** errors.go IsExpected: true for errors that are part of normal
    * streaming operation (stop/interrupt — the JVM analog of
    * context.Canceled / ErrStopped; head-reached is a return value
    * here, not an error).
    */
  def isExpected(t: Throwable): Boolean =
    chain(t).exists(_.isInstanceOf[InterruptedException])

  private def matches(t: Throwable, cls: Class[_], code: String): Boolean =
    chain(t).exists { e =>
      cls.isInstance(e) || Option(e.getMessage).exists(_.contains(code))
    }

  /** Bounded cause-chain walk (errors.Is over wraps). */
  private def chain(t: Throwable): Iterator[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20)
}
