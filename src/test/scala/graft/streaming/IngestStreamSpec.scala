package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.bank.Ingest

/** The AvailableNow ingestion twin against the reference's real
  * transaction drops: batch-parity row-for-row, idempotent re-run,
  * incremental pickup of a new drop — the three properties the batch
  * loop gets from the `.backup` archive move (S13), here carried by
  * the file-source checkpoint. */
class IngestStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val refData = "/root/reference/data/data"
  private val days = Seq("01032021", "02032021", "03032021")

  test("AvailableNow drain: batch parity, idempotent re-run, incremental drop") {
    val root = Files.createTempDirectory("ingest_stream")
    val inbox = Files.createDirectory(root.resolve("inbox"))
    val cp = root.resolve("checkpoint").toString
    val out = root.resolve("fact").toString
    def drop(day: String): Unit =
      Files.copy(Paths.get(refData, s"transactions_$day.txt"),
        inbox.resolve(s"transactions_$day.txt"),
        StandardCopyOption.REPLACE_EXISTING)
    def factRows(): Set[String] =
      spark.read.parquet(out)
        .selectExpr("concat_ws('|', transaction_id, transaction_date, " +
          "card_num, oper_type, amount, oper_result, terminal, txn_date)")
        .collect().map(_.getString(0)).toSet

    // day 1+2 backlog drains in one call (bounded: 1 file per batch)
    drop("01032021"); drop("02032021")
    assert(IngestStream.drainAvailableNow(spark, inbox.toString, cp, out) >= 2)
    val batch12 = days.take(2).map(d =>
        Ingest.transactions(spark, s"$refData/transactions_$d.txt")._1)
      .reduce(_ unionAll _)
      .selectExpr("concat_ws('|', transaction_id, transaction_date, " +
        "card_num, oper_type, amount, oper_result, terminal, " +
        "to_date(transaction_date))")
      .collect().map(_.getString(0)).toSet
    assert(factRows() == batch12)

    // re-run, nothing new: ZERO committing batches, fact unchanged
    assert(IngestStream.drainAvailableNow(spark, inbox.toString, cp, out) == 0)
    assert(factRows() == batch12)

    // day-3 drop: exactly the new file lands
    drop("03032021")
    assert(IngestStream.drainAvailableNow(spark, inbox.toString, cp, out) >= 1)
    val batch3 = Ingest.transactions(spark,
        s"$refData/transactions_03032021.txt")._1
      .selectExpr("concat_ws('|', transaction_id, transaction_date, " +
        "card_num, oper_type, amount, oper_result, terminal, " +
        "to_date(transaction_date))")
      .collect().map(_.getString(0)).toSet
    assert(factRows() == batch12 ++ batch3)

    // the sink is date-partitioned like the warehouse fact layout
    val parts = Files.list(Paths.get(out)).iterator()
    val dirs = scala.jdk.CollectionConverters.IteratorHasAsScala(parts)
      .asScala.map(_.getFileName.toString).filter(_.startsWith("txn_date="))
      .toSeq
    assert(dirs.size == 3, dirs)
  }
}
