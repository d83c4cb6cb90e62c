package graft.api

import org.apache.spark.sql.{Encoder, SparkSession}

/**
 * Entry point mirroring the reference `Environment`
 * (/root/reference/src/lib.rs:907-940): owns the SparkSession and
 * constructs head streams. There is no `execute()` — Spark actions are
 * the execution boundary (a batch collect/write, or
 * `writeStream.start()` + `awaitTermination()` for streaming pipelines;
 * SURVEY.md §3 mapping).
 */
final class Env(val spark: SparkSession) {

  /** Head stream from pre-built events (the reference tests'
    * `SliceEventSource`, /root/reference/src/lib.rs:1019-1033). */
  def fromEvents[T](events: Seq[Event[T]])(implicit e: Encoder[Event[T]]): GStream[T] =
    new GStream(spark.createDataset(events))

  /** Head stream from raw values: processing time = now, no event time
    * (the reference's `Event::new` ingestion / `IncrementingSource`,
    * /root/reference/src/lib.rs:29-36,:968-984). */
  def fromValues[T](values: Seq[T])(implicit e: Encoder[Event[T]]): GStream[T] =
    fromEvents(values.map(Event.now[T]))

  /** Head stream from any Dataset already shaped as events — the general
    * form (works for batch reads and `readStream` alike). */
  def fromDataset[T](ds: org.apache.spark.sql.Dataset[Event[T]]): GStream[T] =
    new GStream(ds)

  /** Name-parity with the reference `Environment::add_source`
    * (/root/reference/src/lib.rs:927-940). */
  def addSource[T](source: Source[T]): GStream[T] =
    new GStream(source.run(spark))

  /** Name-parity with the reference `Environment::execute`
    * (/root/reference/src/lib.rs:919-925): run everything to completion.
    * Batch pipelines execute at their action (`addSink`/`collect*`), so
    * this only needs to await the session's active streaming queries —
    * with finite sources + `Trigger.AvailableNow` that terminates, like
    * the reference's drained-channel cascade. */
  def execute(): Unit =
    spark.streams.active.foreach(_.awaitTermination())
}

object Env {
  def apply(spark: SparkSession): Env = new Env(spark)
}
