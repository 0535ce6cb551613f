package graft.pipeline

import graft.{SparkTestSession, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private def docs = Tables.documents(spark, sf)
  // a fixed slice of the corpus plays the eval set
  private def bench = docs.where(pmod(col("doc_id"), lit(19)) === 0)
    .select(col("doc_id"), col("text"))
  private def corpus = docs.where(pmod(col("doc_id"), lit(19)) =!= 0)

  test("curation funnel: monotone stages, deterministic, leakage-safe") {
    val c = Curation.curate(corpus, "doc_id", "text",
      benchmark = Some(bench))
    val kept = c.kept.cache()
    try {
      val n = kept.count()
      assert(n > 0 && n < corpus.count(), s"funnel must drop something: $n")

      // deterministic: a second build selects the identical id set
      val again = Curation.curate(corpus, "doc_id", "text",
        benchmark = Some(bench)).kept
      assert(kept.select("doc_id").as[Long].collect().toSet ==
        again.select("doc_id").as[Long].collect().toSet)

      // no exact duplicates survive
      val dupTexts = kept.groupBy("text").count().where(col("count") > 1).count()
      assert(dupTexts == 0, "exact duplicates must not survive curation")

      // decontamination is a fixpoint: re-running it on the kept corpus
      // finds nothing
      val stillContaminated = TextAnalysis.decontaminate(
        kept, bench, "doc_id", "text", n = 3, threshold = 0.05).count()
      assert(stillContaminated == 0)

      // split labels: pure function of the id, all three present,
      // train dominates
      val bySplit = kept.groupBy("split").count()
        .as[(String, Long)].collect().toMap
      assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
      assert(bySplit("train") > (n * 8) / 10, bySplit.toString)

      // chunks: each belongs to a kept doc, carries its doc's split,
      // and every multi-token kept doc produced at least one chunk
      val chunks = c.chunks.cache()
      try {
        val orphans = chunks.join(kept, Seq("doc_id"), "left_anti").count()
        assert(orphans == 0)
        val mislabeled = chunks.as("c")
          .join(kept.as("k"), "doc_id")
          .where(col("c.split") =!= col("k.split")).count()
        assert(mislabeled == 0)
        assert(chunks.select("doc_id").distinct().count() == n,
          "every kept doc (all have ≥5 tokens) must chunk")
      } finally chunks.unpersist()
    } finally kept.unpersist()
  }

  test("simhash near-dup strategy: deterministic funnel, no exact dups survive") {
    val c = Curation.curate(corpus, "doc_id", "text", nearDup = "simhash")
    val ids = c.kept.select("doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty && ids.size < corpus.count())
    val again = Curation.curate(corpus, "doc_id", "text", nearDup = "simhash")
      .kept.select("doc_id").as[Long].collect().toSet
    assert(ids == again)
    // signature-identical (distance-0) docs collapse: no surviving pair
    // shares an exact text either
    assert(c.kept.groupBy("text").count().where(col("count") > 1).count() == 0)
  }

  test("decontam = bloom: kept set is row-identical to the exact path") {
    val exact = Curation.curate(corpus, "doc_id", "text",
      benchmark = Some(bench)).kept
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val bloom = Curation.curate(corpus, "doc_id", "text",
      benchmark = Some(bench), decontam = "bloom").kept
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(exact == bloom,
      s"bloom dial must be a pure scale trade: ${exact.size} vs ${bloom.size}")
    assert(exact.nonEmpty)
  }

  test("quality gate drops short and digit-heavy docs before any shuffle stage") {
    val junk = Seq(
      (900001L, "one two three"),                    // 3 tokens < 5
      (900002L, "12345 67890 11111 22222 33333 44")  // digit-heavy
    ).toDF("doc_id", "text")
    val c = Curation.curate(corpus.select("doc_id", "text").unionByName(junk),
      "doc_id", "text")
    val keptIds = c.kept.select("doc_id").as[Long].collect().toSet
    assert(!keptIds.contains(900001L) && !keptIds.contains(900002L))
  }
}
