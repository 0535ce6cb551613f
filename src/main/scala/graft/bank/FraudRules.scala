package graft.bank

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The four fraud-detection rules (`loading_rep_fraud.py:14-135`),
  * re-expressed as pure DataFrame functions producing REP_FRAUD-shaped
  * rows (event_dt, passport, fio, phone, event_type, report_dt).
  *
  * Spark-first notes:
  *  - the cards→accounts→clients chain (J6) is broadcast: the masters
  *    are tiny dimensions, so the fact scan is never shuffled for them;
  *  - the self band joins (rules 3/4) keep their equi key (card_num) so
  *    Catalyst plans a shuffle/sort-merge join with a range residual —
  *    no cartesian anywhere;
  *  - `DISTINCT ON` without ORDER BY (rules 3/4) is replicated as
  *    `dropDuplicates` on the key — deterministic and semantically equal
  *    because all other output columns are functionally dependent on it
  *    (SURVEY §7 quirk 2);
  *  - rules 1/2 are deliberately NOT deduplicated across days and rules
  *    3/4 anti-join the existing mart, exactly like the reference
  *    (SURVEY §7 quirk 1).
  */
object FraudRules {

  private def fio = concat(col("last_name"), lit(" "), col("first_name"),
    lit(" "), coalesce(col("patronymic"), lit("")))

  /** J6: transactions joined through the master hierarchy; masters are
    * broadcast. Prefix `t.` columns stay unqualified. */
  private def withClients(txns: DataFrame, seed: Seeds.Seed): DataFrame =
    txns
      .join(broadcast(seed.cards.select("card_num", "account")), Seq("card_num"))
      .join(broadcast(seed.accounts.select("account", "valid_to", "client")),
        Seq("account"))
      .join(broadcast(seed.clients), col("client") === col("client_id"))

  private def out(df: DataFrame, eventDt: org.apache.spark.sql.Column,
                  eventType: String, reportDt: Date): DataFrame =
    df.select(
      eventDt.as("event_dt"),
      col("passport_num").as("passport"),
      fio.as("fio"),
      col("phone"),
      lit(eventType).as("event_type"),
      lit(reportDt).as("report_dt"))

  /** Rule 1 — blocked or expired passport (`loading_rep_fraud.py:15-37`):
    * expired at transaction time, or blacklisted before it. */
  def rule1(txns: DataFrame, blacklist: DataFrame, seed: Seeds.Seed,
            reportDt: Date): DataFrame = {
    val joined = withClients(txns, seed)
      .join(broadcast(blacklist.select(col("passport").as("bl_passport"),
        col("date").as("bl_date"))),
        col("passport_num") === col("bl_passport"), "left")
      .where((col("passport_valid_to") < to_date(col("transaction_date")) ||
        (col("bl_passport").isNotNull &&
          to_date(col("transaction_date")) > col("bl_date"))) &&
        col("oper_result") === "SUCCESS")
    out(joined, col("transaction_date"), "blocked or expired passport", reportDt)
  }

  /** Rule 2 — invalid contract (`loading_rep_fraud.py:43-58`). */
  def rule2(txns: DataFrame, seed: Seeds.Seed, reportDt: Date): DataFrame = {
    val joined = withClients(txns, seed)
      .where(to_date(col("transaction_date")) > col("valid_to") &&
        col("oper_result") === "SUCCESS")
    out(joined, col("transaction_date"), "invalid contract", reportDt)
  }

  /** Rule 3 — operations in different cities within one hour
    * (`loading_rep_fraud.py:64-92`): same-card pair band join + SCD2
    * as-of residual on both endpoints + city-differs filter.
    * Postgres compares timestamp to date at midnight; `effective_to`
    * (a date) is cast to timestamp for the BETWEEN bound. */
  def rule3(txns: DataFrame, termHist: DataFrame, seed: Seeds.Seed,
            repFraud: DataFrame, reportDt: Date): DataFrame = {
    val t1 = txns.as("t1")
    val t2 = txns.as("t2")
    val pairs = t1.join(t2,
      col("t1.card_num") === col("t2.card_num") &&
        col("t1.transaction_date") < col("t2.transaction_date") &&
        unix_micros(col("t2.transaction_date")) -
          unix_micros(col("t1.transaction_date")) < 3600L * 1000000L)
    val th1 = termHist.as("th1")
    val th2 = termHist.as("th2")
    val located = pairs
      .join(th1, col("t1.terminal") === col("th1.terminal_id") &&
        col("t1.transaction_date") >= col("th1.effective_from").cast("timestamp") &&
        col("t1.transaction_date") <= col("th1.effective_to").cast("timestamp"))
      .join(th2, col("t2.terminal") === col("th2.terminal_id") &&
        col("t2.transaction_date") >= col("th2.effective_from").cast("timestamp") &&
        col("t2.transaction_date") <= col("th2.effective_to").cast("timestamp"))
      .where(col("th1.terminal_city") =!= col("th2.terminal_city") &&
        col("t2.oper_result") === "SUCCESS")
    val enriched = located
      .join(broadcast(seed.cards.select("card_num", "account")),
        col("t2.card_num") === seed.cards("card_num"))
      .join(broadcast(seed.accounts.select("account", "client")), Seq("account"))
      .join(broadcast(seed.clients), col("client") === col("client_id"))
    val candidates = out(enriched, col("t2.transaction_date"),
      "ops in diff cities less one hour", reportDt)
      .dropDuplicates("event_dt", "passport")
    antiJoinExisting(candidates, repFraud, "ops in diff cities less one hour")
  }

  /** Rule 4 — amount guessing (`loading_rep_fraud.py:98-129`):
    * REJECT → REJECT → SUCCESS with strictly decreasing amounts, all
    * gaps and the total span under 20 minutes. */
  def rule4(txns: DataFrame, seed: Seeds.Seed, repFraud: DataFrame,
            reportDt: Date): DataFrame = {
    def us(a: String) = unix_micros(col(s"$a.transaction_date"))
    val limit = 1200L * 1000000L
    val t1 = txns.as("t1")
    val t2 = txns.as("t2")
    val t3 = txns.as("t3")
    val chain = t1
      .join(t2, col("t1.card_num") === col("t2.card_num") &&
        col("t1.transaction_date") < col("t2.transaction_date") &&
        us("t2") - us("t1") < limit)
      .join(t3, col("t2.card_num") === col("t3.card_num") &&
        col("t2.transaction_date") < col("t3.transaction_date") &&
        us("t3") - us("t2") < limit)
      .where(col("t1.oper_result") === "REJECT" &&
        col("t2.oper_result") === "REJECT" &&
        col("t3.oper_result") === "SUCCESS" &&
        col("t1.amount") > col("t2.amount") &&
        col("t2.amount") > col("t3.amount") &&
        us("t3") - us("t1") < limit)
    val enriched = chain
      .join(broadcast(seed.cards.select("card_num", "account")),
        col("t3.card_num") === seed.cards("card_num"))
      .join(broadcast(seed.accounts.select("account", "client")), Seq("account"))
      .join(broadcast(seed.clients), col("client") === col("client_id"))
    val candidates = out(enriched, col("t3.transaction_date"),
      "amount guessing", reportDt)
      .dropDuplicates("event_dt", "passport")
    antiJoinExisting(candidates, repFraud, "amount guessing")
  }

  /** J12: drop candidates already reported with the same passport,
    * event_dt and event_type (`loading_rep_fraud.py:86-91,123-128`). */
  private def antiJoinExisting(candidates: DataFrame, repFraud: DataFrame,
                               eventType: String): DataFrame =
    candidates.join(
      repFraud.where(col("event_type") === eventType)
        .select("passport", "event_dt"),
      Seq("passport", "event_dt"), "left_anti")
      .select("event_dt", "passport", "fio", "phone", "event_type", "report_dt")
}
