package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.bank.{Ingest, Schemas}

/** Structured Streaming twin of the reference's daily file-drop loop
  * (`main.py:85-100`): the batch loop polls a directory, consumes each
  * `transactions_DDMMYYYY.txt`, and renames it `*.backup` so a re-run
  * skips it (S13). Here the FILE SOURCE's commit log inside the
  * checkpoint directory carries that exactly-once bookkeeping instead —
  * no rename, no mutation of the inbox:
  *
  *  - `Trigger.AvailableNow` drains every not-yet-committed file in
  *    bounded micro-batches and then STOPS — the daily-cron shape, but
  *    restart-safe mid-drain (a crash between batches resumes, never
  *    re-appends);
  *  - a re-run with the same checkpoint and no new drops commits
  *    nothing (idempotent re-delivery, the archive-move semantic);
  *  - a new drop reads exactly the new file — incremental by
  *    construction at any inbox size, where the reference re-lists and
  *    filters `.backup` suffixes;
  *  - `maxFilesPerTrigger` bounds each micro-batch, so a backlog of
  *    thousands of daily files lands as many small commits rather than
  *    one giant one (bounded executor memory at 100 TB backfills).
  *
  * The typing projection is the SAME code as the batch path
  * ([[Ingest.typedTransactions]]) and the sink is laid out
  * date-partitioned like the warehouse fact table, so batch and
  * streaming ingestion are interchangeable row-for-row.
  */
object IngestStream {

  /** Unbounded source over the inbox: `;`-separated CSV drops, typed. */
  def transactionsSource(spark: SparkSession, inboxDir: String,
                         maxFilesPerTrigger: Int = 1): DataFrame =
    Ingest.typedTransactions(
      spark.readStream
        .option("sep", ";")
        .option("header", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .schema(Schemas.transactionsCsv)
        .csv(inboxDir))
      .withColumn("txn_date", to_date(col("transaction_date")))

  /** Drain all currently-available drops into a date-partitioned
    * parquet fact directory, then stop. Returns the number of
    * micro-batches that actually committed (0 ⇒ nothing new). */
  def drainAvailableNow(spark: SparkSession, inboxDir: String,
                        checkpointDir: String, outDir: String,
                        maxFilesPerTrigger: Int = 1): Long = {
    val q = transactionsSource(spark, inboxDir, maxFilesPerTrigger)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("txn_date")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progressed = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    progressed.toLong
  }
}
