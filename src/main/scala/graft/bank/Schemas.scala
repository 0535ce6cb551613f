package graft.bank

import org.apache.spark.sql.types._

/** Fixed schemas for the banking DWH tables, mirroring
  * `/root/reference/sql_scripts/create_tables.sql` and the seed DDL in
  * `data/ddl_dml.sql` (§1.2 of SURVEY.md maps the types). VARCHAR(n) →
  * StringType, NUMERIC(10,2) → DecimalType(10,2), `'infinity'::date` →
  * the 9999-12-31 sentinel (`graft.operators.Cdc.OpenDate`).
  */
object Schemas {

  /** CSV file schema, `;`-separated with header (`main.py:45`); amount
    * arrives decimal-comma and is normalized on read. */
  val transactionsCsv: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("transaction_date", TimestampType),
    StructField("amount", StringType), // "1046,40" → DecimalType(10,2) in Ingest
    StructField("card_num", StringType),
    StructField("oper_type", StringType),
    StructField("oper_result", StringType),
    StructField("terminal", StringType)))

  /** `create_tables.sql:27-35`. */
  val factTransactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("transaction_date", TimestampType),
    StructField("card_num", StringType),
    StructField("oper_type", StringType),
    StructField("amount", DecimalType(10, 2)),
    StructField("oper_result", StringType),
    StructField("terminal", StringType)))

  /** `create_tables.sql:37-40`. */
  val factPassportBlacklist: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("passport", StringType)))

  /** `create_tables.sql:44-52`. */
  val dimTerminalsHist: StructType = StructType(Seq(
    StructField("terminal_id", StringType),
    StructField("terminal_type", StringType),
    StructField("terminal_city", StringType),
    StructField("terminal_address", StringType),
    StructField("effective_from", DateType),
    StructField("effective_to", DateType),
    StructField("deleted_flg", BooleanType)))

  /** `create_tables.sql:55-62`. */
  val repFraud: StructType = StructType(Seq(
    StructField("event_dt", TimestampType),
    StructField("passport", StringType),
    StructField("fio", StringType),
    StructField("phone", StringType),
    StructField("event_type", StringType),
    StructField("report_dt", DateType)))

  /** `create_tables.sql:66-71`. */
  val metaLoading: StructType = StructType(Seq(
    StructField("table_name", StringType),
    StructField("event_dt", DateType),
    StructField("rows_processed", IntegerType),
    StructField("status", StringType)))

  /** Seed masters (`data/ddl_dml.sql`). */
  val cards: StructType = StructType(Seq(
    StructField("card_num", StringType),
    StructField("account", StringType),
    StructField("create_dt", DateType),
    StructField("update_dt", DateType)))

  val accounts: StructType = StructType(Seq(
    StructField("account", StringType),
    StructField("valid_to", DateType),
    StructField("client", StringType),
    StructField("create_dt", DateType),
    StructField("update_dt", DateType)))

  val clients: StructType = StructType(Seq(
    StructField("client_id", StringType),
    StructField("last_name", StringType),
    StructField("first_name", StringType),
    StructField("patronymic", StringType),
    StructField("date_of_birth", DateType),
    StructField("passport_num", StringType),
    StructField("passport_valid_to", DateType),
    StructField("phone", StringType),
    StructField("create_dt", DateType),
    StructField("update_dt", DateType)))

  /** Terminal snapshot (xlsx, 4 string columns). */
  val terminalsSnapshot: StructType = StructType(Seq(
    StructField("terminal_id", StringType),
    StructField("terminal_type", StringType),
    StructField("terminal_city", StringType),
    StructField("terminal_address", StringType)))
}
