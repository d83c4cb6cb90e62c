package graft.api

import java.sql.Timestamp

/**
 * The event envelope — the reference engine's one core abstraction
 * (`Event<V>`, /root/reference/src/lib.rs:20-26) as a Spark row type.
 *
 * Differences from the reference, per SURVEY.md §1.3/§7.5:
 *  - time is microsecond `java.sql.Timestamp` (Spark TimestampType), not
 *    nanosecond NaiveDateTime; the declared queries use ≥µs-granular data
 *    so the truncation is lossless.
 *  - there is no per-event `watermark_date_time` field: in Spark the
 *    watermark is an engine property (`withWatermark(col, delay)`), which
 *    coincides with the reference's per-event watermark for any source
 *    honoring the reference's own fixed-offset contract
 *    (/root/reference/src/lib.rs:560-563).
 */
final case class Event[T](
    processingTime: Timestamp,
    eventTime: Option[Timestamp],
    value: T) {

  /** Replace the payload, keep the timestamps — metadata propagation
    * through map-like ops (reference `Event::with_value`,
    * /root/reference/src/lib.rs:38-45). */
  def withValue[U](u: U): Event[U] = Event(processingTime, eventTime, u)

  /** The event time, which windowed operators require (the reference
    * `unwrap()`s it, /root/reference/src/lib.rs:459,800,857). */
  def eventTimeOrThrow: Timestamp = eventTime.getOrElse(
    throw new IllegalStateException(
      "windowed operator requires eventTime on every event (reference contract)"))
}

object Event {

  /** Wrap a value, stamping processing time = now, no event time
    * (reference `Event::new`, /root/reference/src/lib.rs:29-36). */
  def now[T](value: T): Event[T] =
    Event(new Timestamp(System.currentTimeMillis()), None, value)

  /** Event with explicit event time (event time also used as processing
    * time, like the reference tests' `new_event`,
    * /root/reference/src/lib.rs:1171-1186). */
  def at[T](value: T, eventTime: Timestamp): Event[T] =
    Event(eventTime, Some(eventTime), value)
}
