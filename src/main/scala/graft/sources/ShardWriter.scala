package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Training-shard materialization — the sink half of the l30 packing
 * query: assign documents to contiguous ~`tokenBudget`-token shards per
 * source, then write ONE parquet file per (source, shard), documents in
 * assignment order inside each file.
 *
 * Scale posture:
 *  - shard assignment is the l30 running-sum in its two-pass
 *    prefix-offset form (Windows.runningSumScalable): parallelism is
 *    #sources × #id-range buckets, never capped at the source count;
 *  - `repartition(source, shard)` puts each shard's rows in exactly one
 *    task, so `partitionBy` emits one file per shard directory instead
 *    of (tasks × shards) fragments — at 100 TB the file count is the
 *    shard count, not a multiple of the cluster size;
 *  - `sortWithinPartitions` orders documents inside the file without
 *    any extra exchange (sort rides the repartition output);
 *  - `maxRecordsPerFile` is a belt-and-braces cap against a degenerate
 *    giant shard (it splits the file, never drops rows).
 *
 * Readers get hive-partitioned `source=.../shard=.../part-*.parquet`
 * they can prune by, with deterministic in-file document order.
 */
object ShardWriter {

  /** Assign shard ids (the l30 rule: shard = bucket of the cumulative
    * token offset BEFORE this document, so documents never split).
    *
    * The cumulative sum runs in the t18 two-pass prefix-offset form:
    * `idCol` (numeric) is range-bucketed by `idBucketWidth`, per-bucket
    * token totals become broadcast prefix offsets, and the window only
    * ever sorts one (source, bucket) range — a per-source window would
    * cap parallelism at the source count (~5 TB/task at 100 TB with
    * O(10) sources). `idBucketWidth` is a recipe parameter: pick it so a
    * bucket's documents fit one task comfortably (default 2^20 ids ≈
    * one bucket per million-id range). Output is bit-identical to the
    * single-window form at any width. */
  def assignShards(docs: DataFrame, textCol: String, idCol: String,
                   sourceCol: String, tokenBudget: Long,
                   idBucketWidth: Long = 1L << 20): DataFrame = {
    val withN = docs.withColumn("__n_tokens", wsTokenCount(col(textCol)))
    graft.operators.Windows.runningSumScalable(
        withN, Seq(sourceCol),
        floor(col(idCol) / lit(idBucketWidth)).cast("long"),
        Seq(col(idCol)), col("__n_tokens"), "__cum")
      .withColumn("shard",
        floor((col("__cum") - col("__n_tokens")) / lit(tokenBudget.toDouble)).cast("long"))
      .select(docs.columns.map(col) :+ col("shard"): _*)
  }

  /** Write `docs` under `outDir` as hive-partitioned
    * `<sourceCol>=…/shard=…/part-…parquet`, one file per shard (unless
    * it exceeds `maxRecordsPerFile`), documents ordered by `idCol`
    * inside each file. */
  def writeShards(docs: DataFrame, textCol: String, idCol: String,
                  sourceCol: String, outDir: String,
                  tokenBudget: Long = 2000L,
                  maxRecordsPerFile: Long = 1000000L): Unit =
    assignShards(docs, textCol, idCol, sourceCol, tokenBudget)
      .repartition(col(sourceCol), col("shard"))
      .sortWithinPartitions(col(sourceCol), col("shard"), col(idCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(sourceCol, "shard")
      .parquet(outDir)
}
