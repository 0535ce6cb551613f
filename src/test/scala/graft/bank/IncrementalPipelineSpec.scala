package graft.bank

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental mode (the sane-default from SURVEY §7 quirk 1): rules
  * 1/2 scan only the current day's fact partition. The distinct hit set
  * must equal golden mode's; re-reports disappear; rules 3/4 unchanged. */
class IncrementalPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val refData = "/root/reference/data/data"
  private val days = Seq("01032021", "02032021", "03032021")

  private def replay(incremental: Boolean): Warehouse = {
    val work = Files.createTempDirectory("increspec").toString
    val inbox = Paths.get(work, "inbox")
    Files.createDirectories(inbox)
    days.foreach { d =>
      Seq(s"transactions_$d.txt", s"passport_blacklist_$d.xlsx",
        s"terminals_$d.xlsx").foreach { n =>
        Files.copy(Paths.get(refData, n), inbox.resolve(n),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val wh = new Warehouse(spark, Paths.get(work, "wh").toString)
    val seed = Seeds.load(spark, "/root/reference/data/ddl_dml.sql")
    val pipe = new Pipeline(wh, seed, incrementalRules12 = incremental)
    days.foreach { d =>
      pipe.runDay(
        inbox.resolve(s"transactions_$d.txt").toString,
        inbox.resolve(s"passport_blacklist_$d.xlsx").toString,
        inbox.resolve(s"terminals_$d.xlsx").toString,
        Paths.get(work, "archive").toString)
    }
    wh
  }

  test("incremental rules 1/2: same distinct hits, no re-reports") {
    val golden = replay(incremental = false).read(Pipeline.RepFraud).cache()
    val incr = replay(incremental = true).read(Pipeline.RepFraud).cache()

    def keyset(df: org.apache.spark.sql.DataFrame, types: Seq[String]) =
      df.where(col("event_type").isin(types: _*))
        .select("event_type", "passport", "event_dt").distinct()
        .collect().map(_.toString).toSet

    val t12 = Seq("blocked or expired passport", "invalid contract")
    assert(keyset(incr, t12) == keyset(golden, t12))
    // incremental mode reports each hit exactly once
    val incr12 = incr.where(col("event_type").isin(t12: _*))
    assert(incr12.count() ==
      incr12.select("event_type", "passport", "event_dt").distinct().count())
    // golden mode re-reports on day 3 what it already reported... it does
    // not here because days 1-2 produce no rule-1/2 hits in this fixture;
    // the seeded triggers only fire on day 3 (FIXTURES.md A4). Equality of
    // totals is therefore expected too:
    assert(incr12.count() == golden.where(col("event_type").isin(t12: _*)).count())
    // rules 3/4 identical row-for-row
    val t34 = Seq("ops in diff cities less one hour", "amount guessing")
    def rows34(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type").isin(t34: _*)).collect().map(_.toString).toSet
    assert(rows34(incr) == rows34(golden))
    golden.unpersist(); incr.unpersist()
  }
}
