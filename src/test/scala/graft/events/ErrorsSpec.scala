package graft.events

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.TestSpark

/** Error-taxonomy parity (reference errors.go IsFilterErr,
  * filters/metadata.go IsDeserializationErr / IsMetadataEventFilterErr
  * + consumer.go:170-181): filter evaluation errors are WRAPPED and
  * never processed, deserialization failures inside a metadata filter
  * classify as both, and dead-letter/best-effort policies refuse to
  * eat either — only genuine CONSUME errors are retried/skipped.
  */
class ErrorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val metaSchema = StructType(Seq(StructField("amount", IntegerType)))

  private def logWith(badMeta: Boolean): EventLog = {
    val st = new graft.testkit.TestStreamer(spark)
    st.insertEvent(0L, "pay", 1L, metadata = """{"amount": 5}""")
    st.insertEvent(1L, "pay", 2L, metadata = """{"amount": 50}""")
    st.insertEvent(2L, "pay", 3L,
      metadata = if (badMeta) """not-json{{{""" else """{"amount": 7}""")
    st.log
  }

  test("metadataEventFilter: typed happy path filters on the deserialized struct") {
    val f = EventFilter.metadataEventFilter(metaSchema, m => m.getField("amount") > 10)
    val ids = logWith(badMeta = false).df.filter(f.toColumn)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L))
  }

  test("construction with null schema or filter raises MetadataEventFilterException") {
    val e1 = intercept[Errors.MetadataEventFilterException] {
      EventFilter.metadataEventFilter(null, m => m.isNotNull)
    }
    assert(Errors.isMetadataEventFilterErr(e1))
    val e2 = intercept[Errors.MetadataEventFilterException] {
      EventFilter.metadataEventFilter(metaSchema, null)
    }
    assert(Errors.isMetadataEventFilterErr(e2))
    assert(!Errors.isFilterErr(e2) && !Errors.isDeserializationErr(e2))
  }

  test("malformed metadata: classified as BOTH deserialization and filter error; not dead-lettered") {
    val f = EventFilter.metadataEventFilter(metaSchema, m => m.getField("amount") > 10)
    val store = new MemCursorStore()
    val errors = new MemErrorStore()
    var consumed = 0L
    val spec = Spec(logWith(badMeta = true), store,
      Consumer("c-taxo", b => { consumed += b.count(); () },
        errorMode = DeadLetter(retries = 2, errors = errors)),
      filter = Some(f), batchSize = 100)
    val thrown = intercept[Throwable] { Runner.runToHead(spec) }
    // reference consumer.go:177: wrapped as a filter error...
    assert(Errors.isFilterErr(thrown), s"not a filter error: $thrown")
    // ...whose cause chain still classifies as the deserialization error
    assert(Errors.isDeserializationErr(thrown), s"not a deserialization error: $thrown")
    // NOT dead-lettered, NOT consumed, cursor untouched: the batch
    // replays after the filter is fixed
    assert(errors.list("c-taxo").isEmpty, "filter error must not be dead-lettered")
    assert(consumed === 0L)
    assert(store.get("c-taxo") === None)
  }

  test("a genuine consume error under DeadLetter IS dead-lettered (contrast case)") {
    val store = new MemCursorStore()
    val errors = new MemErrorStore()
    val f = EventFilter.metadataEventFilter(metaSchema, m => m.getField("amount") > 0)
    val spec = Spec(logWith(badMeta = false), store,
      Consumer("c-boom", _ => throw new RuntimeException("consume-boom"),
        errorMode = DeadLetter(retries = 1, errors = errors)),
      filter = Some(f), batchSize = 100)
    val res = Runner.runToHead(spec)
    assert(res.skipped === 3L)
    assert(errors.list("c-boom").map(_._2) === Seq("consume-boom"))
    assert(store.get("c-boom") === Some(2L)) // dead-lettered batch advances
  }

  test("isExpected: interrupts are normal streaming operation, consume errors are not") {
    assert(Errors.isExpected(new InterruptedException()))
    assert(Errors.isExpected(new RuntimeException(new InterruptedException())))
    assert(!Errors.isExpected(new RuntimeException("boom")))
  }

  test("predicates match through deep wrap chains (errors.Is over wraps)") {
    val deep = new RuntimeException("outer",
      new IllegalStateException("mid",
        new Errors.DeserializationException("payload x")))
    assert(Errors.isDeserializationErr(deep))
    assert(!Errors.isFilterErr(deep))
    // code-based match survives when only the MESSAGE crosses a
    // serialization boundary (executor → driver)
    val flattened = new RuntimeException(
      s"Job aborted: deserialization failed [${Errors.DeserializationErrCode}]: x")
    assert(Errors.isDeserializationErr(flattened))
  }
}
