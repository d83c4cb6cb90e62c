package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/**
 * The reference's `event_reducer` as a typed Catalyst `Aggregator`
 * (SURVEY.md §4.2 "one custom Aggregator[IN, BUF, OUT] for the typed
 * path"): combine values with a user monoid, carry the element-wise MAX
 * of both timestamps (/root/reference/src/lib.rs:639-654).
 *
 * Usable anywhere a typed aggregation runs — `ds.select(agg.toColumn)`,
 * `groupByKey(...).agg(...)` — with Catalyst planning partial (map-side)
 * aggregation from `merge`, which the facade's fold-based session path
 * cannot express.
 */
final class EventMonoidAggregator[T](zero: T, combine: (T, T) => T)(
    implicit bufEnc: Encoder[Event[T]], outEnc: Encoder[Event[T]])
    extends Aggregator[Event[T], Event[T], Event[T]] {

  private val epoch = new Timestamp(0L)

  override def zero: Event[T] = Event(epoch, None, EventMonoidAggregator.this.zeroValue)
  private def zeroValue: T = zero

  private def maxTs(a: Timestamp, b: Timestamp): Timestamp =
    if (a.compareTo(b) >= 0) a else b

  private def maxOpt(a: Option[Timestamp], b: Option[Timestamp]): Option[Timestamp] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(maxTs(x, y))
      case (x, None) => x
      case (None, y) => y
    }

  override def reduce(acc: Event[T], e: Event[T]): Event[T] =
    Event(maxTs(acc.processingTime, e.processingTime),
      maxOpt(acc.eventTime, e.eventTime),
      combine(acc.value, e.value))

  override def merge(a: Event[T], b: Event[T]): Event[T] = reduce(a, b)

  override def finish(r: Event[T]): Event[T] = r

  override def bufferEncoder: Encoder[Event[T]] = bufEnc
  override def outputEncoder: Encoder[Event[T]] = outEnc
}

object EventMonoidAggregator {
  /** Convenience: a TypedColumn summing Long event values with
    * max-timestamp propagation. */
  def sumLong(implicit e: Encoder[Event[Long]]): TypedColumn[Event[Long], Event[Long]] =
    new EventMonoidAggregator[Long](0L, _ + _).toColumn
}
