package graft.bank

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Date

import graft.sources.Xlsx
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Daily file ingestion (`main.py:43-82`): CSV transactions with
  * decimal-comma amounts, xlsx terminal snapshots, xlsx cumulative
  * passport blacklist with Excel-serial dates. Files are archived as
  * `<name>.backup` after consumption — the reference's checkpointing.
  */
object Ingest {

  /** S1–S4: read a transactions CSV; returns (typed frame, batch date).
    * The batch date is the file's (single) calendar day — `min` rather
    * than the reference's first-row peek, same value on these files. */
  def transactions(spark: SparkSession, path: String): (DataFrame, Date) = {
    val raw = spark.read
      .option("sep", ";")
      .option("header", "true")
      .schema(Schemas.transactionsCsv)
      .csv(path)
    val typed = raw.select(
      col("transaction_id"), col("transaction_date"), col("card_num"),
      col("oper_type"),
      regexp_replace(col("amount"), ",", ".").cast(DecimalType(10, 2)).as("amount"),
      col("oper_result"), col("terminal"))
    val day = typed.agg(min(to_date(col("transaction_date")))).head().getDate(0)
    (typed, day)
  }

  /** S5: terminals full snapshot (4 string columns). */
  def terminals(spark: SparkSession, path: String): DataFrame = {
    val sheet = Xlsx.read(path)
    expectHeader(sheet, Seq("terminal_id", "terminal_type", "terminal_city",
      "terminal_address"), path)
    val rows = sheet.rows.map(r => Row(r.map(_.orNull): _*))
    spark.createDataFrame(java.util.List.copyOf(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Schemas.terminalsSnapshot)
  }

  /** S6: cumulative passport blacklist; Excel serial → DateType, and
    * all-null styled rows already dropped by the reader. */
  def blacklist(spark: SparkSession, path: String): DataFrame = {
    val sheet = Xlsx.read(path)
    expectHeader(sheet, Seq("date", "passport"), path)
    val rows = sheet.rows.map { r =>
      val serial = r.head.map(s => Date.valueOf(
        Xlsx.serialToDate(s.takeWhile(_ != '.').toInt)))
      Row(serial.orNull, r(1).orNull)
    }
    spark.createDataFrame(java.util.List.copyOf(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Schemas.factPassportBlacklist)
  }

  /** S13: move a consumed file to `<archiveDir>/<name>.backup`. */
  def archive(path: String, archiveDir: String): Unit = {
    val src = Paths.get(path)
    Files.createDirectories(Paths.get(archiveDir))
    Files.move(src, Paths.get(archiveDir, src.getFileName.toString + ".backup"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def expectHeader(sheet: Xlsx.Sheet, want: Seq[String], path: String): Unit =
    require(sheet.header.map(_.trim) == want,
      s"unexpected header in $path: ${sheet.header.mkString(",")}")
}
