package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redact(s: String): String = {
    val df = Seq((1L, s)).toDF("id", "text")
    df.select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].head()
  }

  test("redactPii masks emails, SSNs and phone runs") {
    assert(redact("mail me at jo.doe+x@ex-ample.co.uk today") ==
      "mail me at <EMAIL> today")
    assert(redact("ssn 123-45-6789 on file") == "ssn <ID> on file")
    assert(redact("call +1 (555) 123-4567 now") == "call <PHONE> now")
    assert(redact("id 123-45-6789 or ring 555 867 5309.") ==
      "id <ID> or ring <PHONE>.")
  }

  test("redactPii leaves clean text untouched") {
    val clean = "the quick brown fox jumps over 3 lazy dogs"
    assert(redact(clean) == clean)
    // short digit runs are not phones, plain words are not emails
    assert(redact("room 1234, ext 56") == "room 1234, ext 56")
  }

  test("piiStats counts hits per document (patterns counted independently)") {
    val df = Seq(
      (1L, "a@b.com and c@d.org, ssn 111-22-3333"),
      (2L, "no pii here"),
      (3L, "call 555-123-4567 or 555-765-4321")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiStats(df, "doc_id", "text")
      .as[(Long, Int, Int, Int)].collect().toSet
    // an SSN-shaped run is also a valid phone run: stats count each
    // pattern independently (redactPii is where precedence applies)
    assert(got == Set((1L, 2, 1, 1), (2L, 0, 0, 0), (3L, 0, 0, 2)))
  }

  test("redaction order: SSN-shaped ids never leak as phone fragments") {
    assert(redact("123-45-6789") == "<ID>")
  }
}
