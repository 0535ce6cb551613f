package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused shingle/winnowing expressions must produce exactly the
  * same (id, value) sets as the composable higher-order-function
  * formulations they replaced — over the real corpus, not toy rows. */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ShingleArray ≡ array_distinct(transform(sequence, substr)) on the corpus") {
    val docs = Tables.documents(spark, sf)
    val k = 8
    val composable = docs.select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(0))),
          i => col("text").substr(i, lit(k))))).as("s"))
      .as[(Long, String)].collect().toSet
    val fused = docs.select(col("doc_id"),
        explode(TextExpressions.shingleArray(col("text"), k)).as("s"))
      .as[(Long, String)].collect().toSet
    assert(fused == composable)
  }

  test("ShingleArray: short and empty texts follow substr clamping") {
    val df = Seq((1L, "abc"), (2L, ""), (3L, "abcdefgh"), (4L, "abcdefghi"))
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextExpressions.shingleArray(col("text"), 8).as("ss"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("abc"))      // shorter than k -> whole text
    assert(got(2L) == Seq(""))         // empty -> one empty shingle
    assert(got(3L) == Seq("abcdefgh")) // exactly k
    assert(got(4L) == Seq("abcdefgh", "bcdefghi"))
  }

  test("ShingleMultiArray ≡ transform(sequence, substr) in order, with duplicates") {
    val docs = Tables.documents(spark, sf)
    val k = 2
    val composable = docs.select(col("doc_id"),
        transform(
          sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))),
          i => col("text").substr(i, lit(k))).as("gs"))
      .as[(Long, Seq[String])].collect().toMap
    val fused = docs.select(col("doc_id"),
        TextExpressions.shingleMultiArray(col("text"), k).as("gs"))
      .as[(Long, Seq[String])].collect().toMap
    assert(fused == composable) // ORDER and multiplicity, not just sets
    // edges: shorter-than-k and exact-k
    val edge = Seq((1L, "a"), (2L, "ab"), (3L, "aba"))
      .toDF("id", "text")
      .select(col("id"), TextExpressions.shingleMultiArray(col("text"), 2).as("gs"))
      .as[(Long, Seq[String])].collect().toMap
    assert(edge(1L) == Seq("a") && edge(2L) == Seq("ab") &&
      edge(3L) == Seq("ab", "ba"))
  }

  test("shingle_multi_array and bottomk_by_key are SQL-registered") {
    val g = spark.sql("SELECT shingle_multi_array('abc', 2) AS g")
      .collect()(0).getSeq[String](0)
    assert(g == Seq("ab", "bc"))
    val b = spark.sql(
      """SELECT bottomk_by_key(k, v, 2) AS bk
        |FROM VALUES (3L, 1.0D), (1L, 2.0D), (2L, 3.0D) AS t(k, v)""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(b == Seq((1L, 2.0), (2L, 3.0)))
  }

  test("ShingleHashArray ≡ xxhash64 over ShingleArray on the corpus + edges") {
    val k = 8
    def viaStrings(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        explode(TextExpressions.shingleArray(col("text"), k)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .as[(Long, Long)].collect().toSet
    def fused(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        explode(TextExpressions.shingleHashArray(col("text"), k)).as("h"))
      .as[(Long, Long)].collect().toSet
    val docs = Tables.documents(spark, sf)
    assert(fused(docs) == viaStrings(docs))
    // multibyte chars exercise the byte-offset walk; short/empty texts
    // the substr-clamp path
    val edges = Seq(
      (1L, "héllo wörld ünïcodé — ダメ絵文字 test"),
      (2L, ""), (3L, "abc"), (4L, "abcdefgh"), (5L, "čšžćđ žđšč"))
      .toDF("doc_id", "text")
    assert(fused(edges) == viaStrings(edges))
  }

  test("WinnowArray ≡ composable winnowing chain on the corpus") {
    val docs = Tables.documents(spark, sf)
    val (k, w) = (5, 4)
    val hashes = transform(
      sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(0))),
      i => conv(substring(md5(col("text").substr(i, lit(k)).cast("binary")),
        1, 8), 16, 10).cast("long"))
    val composable = docs.select(col("doc_id"), hashes.as("hs"))
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(0))),
          j => array_min(slice(col("hs"), j, lit(w)))))).as("fp"))
      .as[(Long, Long)].collect().toSet
    val fused = docs.select(col("doc_id"),
        explode(TextExpressions.winnowArray(col("text"), k, w)).as("fp"))
      .as[(Long, Long)].collect().toSet
    assert(fused == composable)
  }

  test("WinnowArray: texts with fewer than w k-grams fingerprint to nothing") {
    val df = Seq((1L, "abcdefg"), (2L, "")).toDF("id", "text") // 3 k-grams < w=4
    val got = df.select(col("id"),
        TextExpressions.winnowArray(col("text"), 5, 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L).isEmpty && got(2L).isEmpty)
  }

  test("TokenNgrams ≡ composable filter/transform chain on the corpus + edges") {
    val n = 3
    def composable(df: org.apache.spark.sql.DataFrame) = {
      val toks = filter(split(trim(lower(col("text"))), "\\s+"), t => t =!= "")
      val cnt = size(toks) - (n - 1)
      val grams = when(cnt >= 1, array_distinct(
          transform(sequence(lit(1), greatest(cnt, lit(1))),
            i => concat_ws(" ", slice(toks, i, lit(n))))))
        .otherwise(array().cast("array<string>"))
      df.select(col("doc_id"), explode(grams).as("g"))
        .as[(Long, String)].collect().toSet
    }
    def fused(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
          explode(TextExpressions.tokenNgrams(col("text"), n)).as("g"))
        .as[(Long, String)].collect().toSet
    val docs = Tables.documents(spark, sf)
    assert(fused(docs) == composable(docs))
    val edges = Seq((1L, "a b"), (2L, ""), (3L, "  x   y  z  "),
      (4L, "p q p q p q")).toDF("doc_id", "text")
    assert(fused(edges) == composable(edges))
    assert(fused(edges).count(_._1 == 4L) == 2) // distinct: "p q p", "q p q"
  }

  test("StopHits ≡ per-word wordHits (regex-replace form) on the corpus + edges") {
    import graft.operators.TextAnalysis
    val words = TextAnalysis.LangMarkers.flatMap(_._2).distinct
    def composable(df: org.apache.spark.sql.DataFrame) = {
      val norm = TextAnalysis.normalized(col("text"))
      df.select(col("doc_id") +:
          words.map(w => TextAnalysis.wordHits(norm, w).as(s"w_$w")): _*)
        .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getInt))
        .toMap
    }
    def fused(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
          TextExpressions.stopHits(col("text"), words).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toIndexedSeq).toMap
    val docs = Tables.documents(spark, sf)
    assert(fused(docs) == composable(docs))
    val edges = Seq(
      // " the the the ": matches at 0 and 8 — the middle occurrence
      // shares its delimiters with both and is skipped by the
      // non-overlapping scan in BOTH forms
      (1L, "the the the"),
      (2L, "the and the"),        // 2 separated hits
      (3L, ""), (4L, "  THE  "),  // case/trim normalize to 1 hit
      (5L, "und der und der und") // de markers interleaved
    ).toDF("doc_id", "text")
    assert(fused(edges) == composable(edges))
    assert(fused(edges)(1L)(words.indexOf("the")) == 2)
    assert(fused(edges)(2L)(words.indexOf("the")) == 2)
    assert(fused(edges)(4L)(words.indexOf("the")) == 1)
  }

  test("CdcBoundaries equals the composable sequence/filter form") {
    import graft.operators.Dedup
    def both(df: org.apache.spark.sql.DataFrame) = (
      df.select(col("doc_id"),
          Dedup.chunkBoundsCol(col("text"), 8, 64).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toIndexedSeq).toMap,
      df.select(col("doc_id"),
          Dedup.chunkBoundsColComposable(col("text"), 8, 64).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toIndexedSeq).toMap)
    val docs = Tables.documents(spark, sf)
    val (f, c) = both(docs)
    assert(f == c)
    assert(f.values.exists(_.length > 1), "want multi-chunk docs")
    // edge cases: empty, shorter than window, exactly window,
    // multi-byte characters (codepoint semantics must match substr)
    val edges = Seq(
      (1L, ""), (2L, "short"), (3L, "exactly8"),
      (4L, "héllo wörld ✓ çà et là — ünïcode txt " * 12),
      (5L, "a" * 200)
    ).toDF("doc_id", "text")
    val (fe, ce) = both(edges)
    assert(fe == ce)
    assert(fe(1L) == IndexedSeq(0) && fe(2L) == IndexedSeq(5))
    // bounds are strictly ascending and end at the text length
    assert(fe(4L).last == ("héllo wörld ✓ çà et là — ünïcode txt " * 12).length)
    assert(fe.values.forall(b => b == b.sorted && b.distinct == b))
  }
}
