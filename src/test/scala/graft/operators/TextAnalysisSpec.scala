package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tfidfTopTerms: hand-computed linear-idf scores and tie-breaks") {
    val docs = Seq(
      ("d1", "a b a"),
      ("d2", "b c"),
      ("d3", "c c d")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(String, String, Double, Int)].collect().toSet
    // N=3; df: a=1 b=2 c=2 d=1; score = tf*N/df
    val want = Set(
      ("d1", "a", 6.0, 1), ("d1", "b", 1.5, 2),
      ("d2", "b", 1.5, 1), ("d2", "c", 1.5, 2), // tie broken by term asc
      ("d3", "c", 3.0, 1), ("d3", "d", 3.0, 2)
    )
    assert(got == want)
  }

  test("repetition: hand-computed ratios, empty and single-token edges") {
    val docs = Seq(
      ("d1", "a a a a"),       // n=4 d=1: dup 0.75; top bigram "a a" 3/3
      ("d2", "a b c d"),       // n=4 d=4: dup 0; bigrams unique 1/3
      ("d3", ""),              // empty: all zeros
      ("d4", "  solo  "),      // n=1: no bigram slots
      ("d5", "x y x y x")      // n=5 d=2: dup 0.6; "x y" 2/4 = 0.5
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, "doc_id", "text")
      .as[(String, Int, Double, Double)].collect().toSet
    val want = Set(
      ("d1", 4, 0.75, 1.0),
      ("d2", 4, 0.0, 0.333333),
      ("d3", 0, 0.0, 0.0),
      ("d4", 1, 0.0, 0.0),
      ("d5", 5, 0.6, 0.5))
    assert(got == want)
  }

  test("fused repetition ≡ aggregation form on the sf0.001 corpus + edge cases") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Int, Double, Double)].collect().toSet
    val edges = Seq(
      ("e1", "a a a a"), ("e2", ""), ("e3", "  solo  "),
      ("e4", " \t "),              // non-space whitespace: empty tokens kept
      ("e5", "A a  B b"),          // lower + multi-space
      ("e6", "x y x y x y x y")
    ).toDF("doc_id", "text")
    assert(rows(TextAnalysis.repetition(edges, "doc_id", "text")) ==
      rows(TextAnalysis.repetitionAgg(edges, "doc_id", "text")))
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("doc_id", $"doc_id".cast("string"))
    assert(rows(TextAnalysis.repetition(docs, "doc_id", "text")) ==
      rows(TextAnalysis.repetitionAgg(docs, "doc_id", "text")))
  }

  test("decontaminate: planted overlap flagged, clean docs not") {
    val bench = Seq((100L, "the secret benchmark question about turtles"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains the full benchmark 3-gram run -> high overlap
      (1L, "prefix words the secret benchmark question about turtles suffix"),
      // shares no 3-gram
      (2L, "entirely unrelated content with different words here"),
      // shares exactly one 3-gram out of its own four
      (3L, "the secret benchmark of unrelated following text")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text",
      n = 3, threshold = 0.2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L)._3 == 4L) // the 4 benchmark-run grams hit
    assert(got(3L)._3 == 1L && got(3L)._2 == 5L)
    // threshold is exclusive of lower overlaps
    val none = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text",
      n = 3, threshold = 0.9)
      .as[(Long, Long, Long, Double)].collect()
    assert(none.isEmpty)
  }

  test("decontaminationReport attributes each leak to the right benchmark doc") {
    val bench = Seq(
      (100L, "the secret benchmark question about turtles"),
      (200L, "another held out evaluation prompt entirely")).toDF("doc_id", "text")
    val corpus = Seq(
      // leaks benchmark 100 (4 shared grams) and none of 200
      (1L, "prefix words the secret benchmark question about turtles suffix"),
      // leaks benchmark 200 only
      (2L, "copy of another held out evaluation prompt entirely with tail"),
      // clean
      (3L, "entirely unrelated content with different words here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminationReport(corpus, bench, "doc_id", "text",
        n = 3, threshold = 0.2)
      .select("doc_id", "bench_id", "shared")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((100L, 4L)), got.toString)
    assert(got(2L)._1 == 200L && got(2L)._2 >= 4L, got.toString)
  }

  test("decontaminateBloom ≡ decontaminate on the sf0.001 corpus and fixtures") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSet
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.where("doc_id % 19 <> 0")
    val bench = docs.where("doc_id % 19 = 0")
    val exact = rows(TextAnalysis.decontaminate(
      corpus, bench, "doc_id", "text", n = 3, threshold = 0.05))
    val bloom = rows(TextAnalysis.decontaminateBloom(
      corpus, bench, "doc_id", "text", n = 3, threshold = 0.05))
    assert(exact.nonEmpty && bloom == exact)
    // a deliberately saturated filter (fpp ~1) still verifies exactly:
    // every false positive must die in the exact join
    val sloppy = rows(TextAnalysis.decontaminateBloom(
      corpus, bench, "doc_id", "text", n = 3, threshold = 0.05, fpp = 0.99))
    assert(sloppy == exact)
  }

  test("bloom prefilter prunes: survivors ≪ corpus postings at tight fpp") {
    import org.apache.spark.sql.functions.{col, explode}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // disjoint vocabularies: bench grams never occur in the corpus, so
    // every surviving posting is a Bloom false positive
    val corpus = docs.where("doc_id % 19 <> 0")
    val bench = Seq((0L, "zq1 zq2 zq3 zq4 zq5 zq6")).toDF("doc_id", "text")
    val grams = graft.functions.TextExpressions.tokenNgrams(col("text"), 3)
    val benchGrams = bench.select(explode(grams).as("gram")).distinct()
    val n = benchGrams.count()
    val bits = math.ceil(-n * math.log(0.01) / (math.log(2) * math.log(2))).toLong
    val bytes = benchGrams.select(org.apache.spark.sql.graftshim.Shim
      .bloomAgg(col("gram"), n, math.max(64L, bits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val postings = corpus.select(explode(grams).as("gram"))
    val total = postings.count()
    val survivors = postings.where(org.apache.spark.sql.graftshim.Shim
      .bloomMightContain(bytes, col("gram"))).count()
    assert(total > 10000, s"corpus postings $total")
    assert(survivors < total / 20, s"bloom kept $survivors of $total")
  }

  test("quantizeInt8: codes bounded, zero vector maps to zero codes") {
    val emb = Seq(
      (1L, Array(3.0f, 4.0f)),        // norm 5 → 0.6, 0.8 → 76, 102
      (2L, Array(0.0f, 0.0f)),        // zero vector
      (3L, Array(-1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .as[(Long, Int, Int)].collect().toSet
    assert(got == Set(
      (1L, 0, 76), (1L, 1, 102),
      (2L, 0, 0), (2L, 1, 0),
      (3L, 0, -90), (3L, 1, 90)))
  }

  test("typicality: junk text scores below corpus text; exact sums verified") {
    import org.apache.spark.sql.functions._
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val junk = Seq((990001L, "qqxx zzvv kkjj wwqq xxzz vvkk jjww qqzz xxvv"))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.typicalityScore(
        corpus.unionByName(junk), "doc_id", "text")
      .select("doc_id", "typicality").as[(Long, Double)].collect().toMap
    val corpusScores = scored.view.filterKeys(_ != 990001L).values.toSeq
    // the junk doc's character transitions are rare in this corpus
    assert(scored(990001L) < corpusScores.min,
      s"junk=${scored(990001L)} min=${corpusScores.min}")
    // hand-check on a two-doc corpus: "ab" x2 → norm " ab ", bigrams
    // " a","ab","b " each C2=2, and each first char starts exactly one
    // bigram kind so C1=2 per position too → sums 6/6, typicality 1.0
    val tiny = Seq((1L, "ab"), (2L, "ab")).toDF("doc_id", "text")
    val t = TextAnalysis.typicalityScore(tiny, "doc_id", "text")
      .select("doc_id", "n_bigrams", "sum_c2", "sum_c1")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(t == Set((1L, 3L, 6L, 6L), (2L, 3L, 6L, 6L)), t.toString)
  }

  test("typicality: fused scorer equals the composed explode+join form") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    val fused = TextAnalysis.typicalityScore(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val composed = TextAnalysis
      .typicalityScoreComposed(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(fused == composed)
  }

  test("tfidfTopTerms: rank never exceeds k and is dense per document") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 3)
    val bad = out.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.collect_set("rnk").as("rs"))
      .where(org.apache.spark.sql.functions
        .array_sort($"rs") =!= org.apache.spark.sql.functions
        .sequence(org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.size($"rs")))
      .count()
    assert(bad == 0)
    assert(out.where($"rnk" > 3).count() == 0)
  }

  test("tvDistance matches the naive full-union computation") {
    // A: [x, x, y]  B: [y, z]  corpus: x:2 y:2 z:1 (c_c = 5)
    // TV(A) = ½(|2/3−2/5| + |1/3−2/5| + |0−1/5|) = 4/15
    // TV(B) = ½(|0−2/5| + |1/2−2/5| + |1/2−1/5|) = 2/5
    val toks = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "y"), ("B", "z"))
      .toDF("g", "token")
    val got = TextAnalysis.tvDistance(toks, "g", "token")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("A") == ((3L, math.rint(4.0 / 15 * 1e6) / 1e6)))
    assert(got("B") == ((2L, 0.4)))
  }

  test("tvDistance: identical distribution gives zero; disjoint gives max") {
    // C == corpus restricted to itself when there is only one group
    val one = TextAnalysis.tvDistance(
      Seq(("C", "a"), ("C", "b")).toDF("g", "token"), "g", "token")
      .as[(String, Long, Double)].collect()
    assert(one.head._3 == 0.0)
    // two groups with disjoint vocabularies of equal size: TV = 1/2 each
    val disj = TextAnalysis.tvDistance(
      Seq(("D", "a"), ("E", "b")).toDF("g", "token"), "g", "token")
      .as[(String, Long, Double)].collect().map(_._3).toSeq
    assert(disj == Seq(0.5, 0.5))
  }

  test("unigramSurprisalBits: floor-log2 of the smoothed corpus LM") {
    // corpus: "a a a b" ⇒ T=4 instances, V=2 types.
    // bits(a) = ⌊log2((4+2)/(3+1))⌋ = ⌊log2(1)⌋ = 0 (integer div 6//4=1)
    // bits(b) = ⌊log2(6/2)⌋ = ⌊log2(3)⌋ = 1
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisalBits(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 0L, 0.0)))  // 3 tokens × 0 bits
    assert(got(2L) == ((1L, 1L, 1.0)))  // 1 token × 1 bit
    // rarer token ⇒ strictly more bits than a stopword-heavy doc
    val corpus = (1L to 20L).map(i => (i, "the the the the rare" + i))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.unigramSurprisalBits(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
    // every doc: 4× "the" (c=80) + 1 unique token (c=1); all symmetric
    assert(scores.map(_._3).distinct.length == 1 && scores.head._3 > 0)
  }
}
