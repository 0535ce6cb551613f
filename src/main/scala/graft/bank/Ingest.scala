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

  /** [[transactions]] with a malformed-row QUARANTINE instead of a
    * poisoned load: at 100 TB a handful of bad rows must divert, not
    * kill the job (the reference's pandas read simply throws —
    * `main.py:45`). Returns (typed good rows, quarantine, batch date):
    *
    *  - structurally malformed lines — wrong field count OR a field
    *    failing its schema type (unparseable timestamp) — via the
    *    PERMISSIVE corrupt-record column → reason `malformed_line`;
    *  - semantically bad rows (an amount string that fails the
    *    decimal-comma cast) → `bad_amount` — the silent-null class a
    *    plain cast would let through;
    *  - everything else flows through exactly [[transactions]]'
    *    projection (same schema, same decimal-comma handling), and the
    *    batch date is computed from GOOD rows only.
    *
    * The quarantine carries the raw line (reconstructed for semantic
    * rejects), per-row reason and source file — enough to replay after
    * a fix. The parsed frame is cached for the two-way split: Spark
    * disallows plans that reference ONLY the corrupt-record column,
    * and the daily-file regime makes the cache free; an unbounded load
    * would fork the split through one `foreachBatch` pass instead. */
  def transactionsQuarantined(spark: SparkSession, path: String)
      : (DataFrame, DataFrame, Date) = {
    val withCorrupt = org.apache.spark.sql.types.StructType(
      Schemas.transactionsCsv.fields :+
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType))
    val raw = spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      // file name captured BEFORE the cache boundary — input_file_name()
      // is empty once rows come from the cached relation
      .withColumn("__source_file", input_file_name())
      .cache()
    // try_cast, not cast: under ANSI semantics (the Spark 4 default) a
    // malformed decimal THROWS — the exact poisoned-load failure this
    // reader exists to prevent
    val amountCast = expr(
      "try_cast(regexp_replace(amount, ',', '.') AS DECIMAL(10,2))")
    val reason = when(col("_corrupt_record").isNotNull, "malformed_line")
      .when(col("amount").isNotNull && amountCast.isNull, "bad_amount")
    val quarantine = raw.where(reason.isNotNull)
      .select(
        coalesce(col("_corrupt_record"),
          concat_ws(";", Schemas.transactionsCsv.fieldNames.map(col): _*))
          .as("raw_line"),
        reason.as("reason"),
        col("__source_file").as("source_file"))
    val good = raw.where(reason.isNull).select(
      col("transaction_id"), col("transaction_date"), col("card_num"),
      col("oper_type"), amountCast.as("amount"),
      col("oper_result"), col("terminal"))
    // A fully-poisoned file (every row quarantined) yields a NULL min —
    // fail loudly with the path, not an NPE from getDate(0).
    val minDay = good.agg(min(to_date(col("transaction_date")))).head()
    if (minDay.isNullAt(0))
      throw new IllegalStateException(
        s"no parseable transaction rows in $path — all ${raw.count()} " +
          "line(s) quarantined; inspect the quarantine frame")
    (good, quarantine, minDay.getDate(0))
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
