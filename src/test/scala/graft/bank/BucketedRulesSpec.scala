package graft.bank

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The Δ-bucketed band-join plan for rules 3/4 (the 100 TB path, see
  * SCALING.md) is the DEFAULT; it must produce the exact same fraud
  * mart as the reference's naive plan on the fixture. */
class BucketedRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val refData = "/root/reference/data/data"
  private val days = Seq("01032021", "02032021", "03032021")

  private def replay(bucketed: Option[Boolean]): Warehouse = {
    val work = Files.createTempDirectory("bucketspec").toString
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
    val pipe = bucketed match {
      case Some(b) => new Pipeline(wh, seed, bucketedBandJoins = b)
      case None    => new Pipeline(wh, seed) // the default path
    }
    days.foreach { d =>
      pipe.runDay(
        inbox.resolve(s"transactions_$d.txt").toString,
        inbox.resolve(s"passport_blacklist_$d.xlsx").toString,
        inbox.resolve(s"terminals_$d.xlsx").toString,
        Paths.get(work, "archive").toString)
    }
    wh
  }

  test("default (bucketed) rules 3/4 replay the fixture byte-for-byte") {
    def rows(wh: Warehouse) = wh.read(Pipeline.RepFraud)
      .collect().map(_.toString).sorted.toSeq
    val naive = rows(replay(bucketed = Some(false)))
    val default = rows(replay(bucketed = None))
    assert(naive.size == 1100)
    assert(default == naive)
  }
}
