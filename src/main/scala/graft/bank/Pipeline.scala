package graft.bank

import java.sql.Date

import graft.operators.Cdc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Daily batch orchestration, reference order (`main.py:85-117`):
  * ingest 3 files → staging views → fact append (blacklist anti-join
  * dedup, transactions blind append) → SCD2 terminals transition →
  * staging clear audit rows → four fraud rules appended to REP_FRAUD.
  * Each day is one call; state lives in the [[Warehouse]].
  */
final class Pipeline(wh: Warehouse, seed: Seeds.Seed,
                     incrementalRules12: Boolean = false,
                     // Δ-bucketed band joins are the default: byte-identical
                     // to the naive plan on the fixture (BucketedRulesSpec)
                     // and the only formulation that survives hot keys at
                     // scale (89.1 s → 1.1 s on one hot card, SCALING.md).
                     // `false` restores the reference's naive plan.
                     bucketedBandJoins: Boolean = true) {
  private val spark: SparkSession = wh.spark

  import Pipeline._

  /** Run one day given the three file paths; files are archived after
    * the run. Returns the batch date. */
  def runDay(txnPath: String, blacklistPath: String, terminalsPath: String,
             archiveDir: String): Date = {
    // --- ingestion to staging (`main.py:43-82`)
    val (txns, day) = Ingest.transactions(spark, txnPath)
    val stgTxns = txns.cache()
    wh.logMeta("stg_transactions", day, stgTxns.count())

    val stgBlacklist = Ingest.blacklist(spark, blacklistPath).cache()
    wh.logMeta("stg_passport_blacklist", day, stgBlacklist.count())

    val stgTerminals = Ingest.terminals(spark, terminalsPath).cache()
    wh.logMeta("stg_terminals", day, stgTerminals.count())

    // --- fact updates (`comm_funcs.py:47-78`)
    val blFact = wh.readOr(FactBlacklist, Schemas.factPassportBlacklist)
    val blNew = stgBlacklist.join(blFact.select("passport"),
      Seq("passport"), "left_anti")
    wh.append(FactBlacklist, blNew.select("date", "passport"))
    // facts are laid out date-partitioned: daily consumers prune to one
    // partition; the reference's full-history rules still scan all of it
    wh.append(FactTransactions, stgTxns.select(
        Schemas.factTransactions.fieldNames.map(col).toSeq: _*)
      .withColumn("txn_date", to_date(col("transaction_date"))),
      partitionCols = Seq("txn_date"))

    // --- SCD2 terminals dimension (`incr_loading.py`)
    val hist = wh.readOr(DimTerminals, Schemas.dimTerminalsHist)
    val newHist = Cdc.scd2Apply(hist, stgTerminals, day,
      keyCol = "terminal_id",
      attrCols = Seq("terminal_type", "terminal_city", "terminal_address"))
    wh.overwrite(DimTerminals, newHist
      .select(Schemas.dimTerminalsHist.fieldNames.map(col).toSeq: _*))

    // --- staging clear audit (`comm_funcs.py:28-44`)
    Seq("stg_transactions", "stg_terminals", "stg_passport_blacklist")
      .foreach(t => wh.logMeta(s"CLEAR_$t", day, 0))

    // --- fraud mart (`loading_rep_fraud.py`): rules read the FULL
    // accumulated fact table each day, like the reference.
    val facts = wh.read(FactTransactions).cache()
    val blAll = wh.read(FactBlacklist)
    val dim = wh.read(DimTerminals)

    def appendRule(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val cached = df.cache()
      val n = cached.count() // S15: rowcount before append, single compute
      wh.append(RepFraud, cached)
      wh.logMeta(name, day, n)
      cached.unpersist()
    }
    // Rules 1/2 have no cross-day joins; the reference's full-history
    // rescan re-reports prior days (SURVEY §7 quirk 1). Incremental mode
    // is the sane default at scale: scan only today's partition (pruned
    // at the source), reporting each hit exactly once.
    val facts12 =
      if (incrementalRules12) facts.where(col("txn_date") === lit(day))
      else facts
    appendRule("REP_FRAUD_passport", FraudRules.rule1(facts12, blAll, seed, day))
    appendRule("REP_FRAUD_contract", FraudRules.rule2(facts12, seed, day))
    appendRule("REP_FRAUD_diff_cities", FraudRules.rule3(facts, dim, seed,
      wh.readOr(RepFraud, Schemas.repFraud), day, bucketedBandJoins))
    appendRule("REP_FRAUD_attempt_amount", FraudRules.rule4(facts, seed,
      wh.readOr(RepFraud, Schemas.repFraud), day, bucketedBandJoins))

    stgTxns.unpersist(); stgBlacklist.unpersist(); stgTerminals.unpersist()
    facts.unpersist()

    // --- archive consumed files (`main.py:66,74,82`)
    Seq(txnPath, blacklistPath, terminalsPath)
      .foreach(Ingest.archive(_, archiveDir))
    day
  }
}

object Pipeline {
  val FactTransactions = "dwh_fact_transactions"
  val FactBlacklist = "dwh_fact_passport_blacklist"
  val DimTerminals = "dwh_dim_terminals_hist"
  val RepFraud = "rep_fraud"
  val MetaLoading = "meta_loading"
}
