package graft.bank

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Trains the MLlib scorer on the replayed 3-day warehouse: the rule
  * labels must be learnable well above chance from the online features. */
class FraudScoringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("logistic pipeline learns the rule labels (AUC > 0.7)") {
    val refData = "/root/reference/data/data"
    val work = Files.createTempDirectory("mlspec").toString
    val inbox = Paths.get(work, "inbox")
    Files.createDirectories(inbox)
    val days = Seq("01032021", "02032021", "03032021")
    days.foreach { d =>
      Seq(s"transactions_$d.txt", s"passport_blacklist_$d.xlsx",
        s"terminals_$d.xlsx").foreach { n =>
        Files.copy(Paths.get(refData, n), inbox.resolve(n),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val wh = new Warehouse(spark, Paths.get(work, "wh").toString)
    val seed = Seeds.load(spark, "/root/reference/data/ddl_dml.sql")
    val pipe = new Pipeline(wh, seed)
    days.foreach { d =>
      pipe.runDay(
        inbox.resolve(s"transactions_$d.txt").toString,
        inbox.resolve(s"passport_blacklist_$d.xlsx").toString,
        inbox.resolve(s"terminals_$d.xlsx").toString,
        Paths.get(work, "archive").toString)
    }

    val training = FraudScoring.trainingFrame(
      wh.read(Pipeline.FactTransactions), wh.read(Pipeline.RepFraud),
      wh.read(Pipeline.FactBlacklist), seed)
      .cache()
    val pos = training.where("label = 1").count()
    assert(pos > 100, s"expected enough positive labels, got $pos")

    val Array(train, test) = training.randomSplit(Array(0.8, 0.2), seed = 42L)
    val model = FraudScoring.fit(train)
    val auc = FraudScoring.auc(model.transform(test))
    assert(auc > 0.85, s"AUC $auc")
    training.unpersist()
  }
}
