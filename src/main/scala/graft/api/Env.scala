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

  /**
   * Run `body` against a CLONE of `spark` with the stateful-chain
   * correctness check disabled THERE — the scoped form of
   * `processStateGlobal`'s required relaxation, shrinking the blast
   * radius its guard message warns about: the outer session keeps
   * Spark's check for every other streaming query, while the clone
   * (sharing the SparkContext, catalog, and cached data) runs the
   * multi-stateful composition.
   *
   * `newSession()` starts from the session's INITIAL conf, so the
   * parent's runtime conf (state-store provider, the `spark.graft.*`
   * flags, shuffle partitions, …) is copied over first — the clone
   * behaves identically except for the one relaxation. Build the
   * pipeline's sources FROM the clone (`body`'s argument): a streaming
   * query runs under the conf of the session that built its frames.
   */
  def withGlobalStateSession[A](spark: SparkSession)(body: SparkSession => A): A = {
    val scoped = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      // static/non-runtime keys refuse to be set on a live session; the
      // clone already inherited them through the shared context
      try scoped.conf.set(k, v)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    scoped.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    body(scoped)
  }
}
