package graft.api

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/**
 * Name-parity Source/Sink traits for reference users
 * (`Source<V>`/`Sink<V>`, /root/reference/src/lib.rs:60-76): a `Source`
 * produces the head Dataset, a `Sink` terminates a stream. Unlike the
 * reference (push one event at a time into a `Sender`), both sides are
 * batch/stream Datasets — the engine owns the pipelining.
 */
trait Source[T] {
  def run(spark: SparkSession): Dataset[Event[T]]
}

trait Sink[T] {
  def run(ds: Dataset[Event[T]]): Unit
}

object Source {

  /** Finite in-memory source (the reference tests' SliceEventSource,
    * /root/reference/src/lib.rs:1019-1033). */
  def ofEvents[T](events: Seq[Event[T]])(implicit e: Encoder[Event[T]]): Source[T] =
    new Source[T] {
      def run(spark: SparkSession): Dataset[Event[T]] = spark.createDataset(events)
    }

  /** Values stamped with processing time (IncrementingSource analogue,
    * /root/reference/src/lib.rs:968-984). */
  def ofValues[T](values: Seq[T])(implicit e: Encoder[Event[T]]): Source[T] =
    ofEvents(values.map(Event.now[T]))
}

object Sink {

  /** The reference's one production sink (StdoutSink,
    * /root/reference/src/lib.rs:943-956). */
  def stdout[T]: Sink[T] = new Sink[T] {
    def run(ds: Dataset[Event[T]]): Unit = ds.show(100, truncate = false)
  }

  /** Collect into a driver-side buffer (test sinks of the reference). */
  def collecting[T]: CollectingSink[T] = new CollectingSink[T]

  final class CollectingSink[T] extends Sink[T] {
    @volatile private var buf: Seq[Event[T]] = Nil
    def run(ds: Dataset[Event[T]]): Unit = buf = ds.collect().toSeq
    def events: Seq[Event[T]] = buf
    def values: Seq[T] = buf.map(_.value)
  }

  /** Parquet sink (batch). */
  def parquet[T](path: String): Sink[T] = new Sink[T] {
    def run(ds: Dataset[Event[T]]): Unit =
      ds.write.mode("overwrite").parquet(path)
  }
}
