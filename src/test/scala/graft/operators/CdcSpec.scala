package graft.operators

import java.sql.Date

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d1 = Date.valueOf("2021-03-01")
  private val d2 = Date.valueOf("2021-03-02")

  private def hist0 = Seq(
    ("T1", "ATM", "CityA", d1, Cdc.OpenDate, false),
    ("T2", "POS", "CityB", d1, Cdc.OpenDate, false),
    // T3 has a closed old version and an open one — "changed" must
    // count matches against BOTH (reference multiplicity quirk)
    ("T3", "POS", "CityC", d1, d1, false),
    ("T3", "POS", "CityD", d2, Cdc.OpenDate, false))
    .toDF("terminal_id", "terminal_type", "terminal_city",
      "effective_from", "effective_to", "deleted_flg")

  private def snapshot = Seq(
    ("T1", "ATM", "CityA"),   // unchanged
    ("T3", "POS", "CityE"),   // differs from both history versions
    ("T4", "ATM", "CityF"))   // brand new; T2 deleted
    .toDF("terminal_id", "terminal_type", "terminal_city")

  private val attrs = Seq("terminal_type", "terminal_city")

  test("snapshotDiff splits added/deleted/changed with reference semantics") {
    val d = Cdc.snapshotDiff(snapshot, hist0, "terminal_id", attrs)
    assert(d.added.select("terminal_id").as[String].collect().toSeq == Seq("T4"))
    assert(d.deleted.select("terminal_id").as[String].collect().toSeq == Seq("T2"))
    // T3 differs from 2 historic versions -> appears twice (CTAS join)
    assert(d.changed.select("terminal_id").as[String].collect().toSeq ==
      Seq("T3", "T3"))
  }

  test("scd2Apply closes, reopens, tombstones") {
    val day = Date.valueOf("2021-03-05")
    val out = Cdc.scd2Apply(hist0, snapshot, day, "terminal_id", attrs).cache()

    // unchanged key untouched
    assert(out.where($"terminal_id" === "T1" && $"effective_to" === Cdc.OpenDate)
      .count() == 1)
    // deleted key: old version closed at day-1, tombstone open
    val t2 = out.where($"terminal_id" === "T2").collect()
    assert(t2.length == 2)
    assert(t2.exists(r => r.getAs[Date]("effective_to") == Date.valueOf("2021-03-04")
      && !r.getAs[Boolean]("deleted_flg")))
    assert(t2.exists(r => r.getAs[Date]("effective_to") == Cdc.OpenDate
      && r.getAs[Boolean]("deleted_flg")
      && r.getAs[Date]("effective_from") == day))
    // changed key: closed old open version + TWO identical new opens
    // (multiplicity), old closed version untouched
    val t3 = out.where($"terminal_id" === "T3").collect()
    assert(t3.length == 4)
    assert(t3.count(r => r.getAs[Date]("effective_to") == Cdc.OpenDate
      && r.getAs[String]("terminal_city") == "CityE") == 2)
    // new key opens at day
    val t4 = out.where($"terminal_id" === "T4").collect()
    assert(t4.length == 1 && t4.head.getAs[Date]("effective_from") == day)
    out.unpersist()
  }
}
