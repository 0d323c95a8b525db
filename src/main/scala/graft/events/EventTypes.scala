package graft.events

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Typed event-type enums (reference: filter.go `EventType` — "an
  * interface for enums that act as reflex event types", IsType /
  * IsAnyType; api.go eventType).
  *
  * The log stores the string form (portable across engines and the
  * oracle); the typed layer gives consumers compile-time-safe `enum`
  * handling plus the reference's int-code contract.
  */
trait EventType extends Serializable {
  /** reference: ReflexType() int. */
  def code: Int
  def name: String
}

object EventType {
  final case class Of(code: Int, name: String) extends EventType

  /** reference filter.go IsType. */
  def isType(a: EventType, b: EventType): Boolean = a.code == b.code

  /** reference filter.go IsAnyType. */
  def isAnyType(a: EventType, targets: EventType*): Boolean =
    targets.exists(_.code == a.code)

  /** Column predicate form — composes with EventFilter. */
  def ofType(t: EventType): EventFilter = EventFilter.ofType(t.name)
  def ofAnyType(ts: EventType*): EventFilter = EventFilter.ofAnyType(ts.map(_.name): _*)

  /** The synthetic log's `enum` (driver test data). */
  object Known {
    val Click: EventType = Of(1, "click")
    val Signup: EventType = Of(2, "signup")
    val View: EventType = Of(3, "view")
    val Purchase: EventType = Of(4, "purchase")
    val Error: EventType = Of(5, "error")
    val Noop: EventType = Of(0, "noop") // gap-fill events (rsql/gapfill.go)
    val all: Seq[EventType] = Seq(Noop, Click, Signup, View, Purchase, Error)
  }

  /** Map a string column to the `enum`'s int codes (for compact storage
    * or cross-service protobuf-style transport).
    */
  def codeColumn(c: Column, `enum`: Seq[EventType] = Known.all): Column =
    `enum`.foldLeft(org.apache.spark.sql.functions.lit(-1)) { (acc, t) =>
      org.apache.spark.sql.functions.when(c === t.name, t.code).otherwise(acc)
    }
}
