package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def train(texts: Seq[String], rounds: Int) =
    Bpe.train(spark, texts.toDF("text"), "text", rounds)
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("textbook trace: counts, tiebreaks and merge evolution") {
    // vocab: aaab ×2, ab ×1
    // r1: (a,a) = 2·2 = 4 beats (a,b) = 2+1 = 3  -> aaab = [aa,a,b]
    // r2: (a,b) = 2+1 = 3 beats (aa,a) = 2       -> [aa,ab], [ab]
    // r3: (aa,ab) = 2
    val got = train(Seq("aaab aaab ab"), 3)
    assert(got == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("greedy run semantics: odd runs keep their tail symbol") {
    // 'aaaa': r1 (a,a)=3 -> [aa,aa]; r2 (aa,aa)=1 -> [aaaa]; r3 exhausted
    val got = train(Seq("aaaa"), 3)
    assert(got == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "aa", "aaaa", 1L)))
    // 'aaa': greedy merges 1st+2nd, third 'a' survives to pair with 'aa'
    val got3 = train(Seq("aaa aaa"), 2)
    assert(got3.head == ((1, "a", "a", "aa", 4L)))
    // state is [aa, a] ×2: the only pair is (aa, a)
    assert(got3(1) == ((2, "aa", "a", "aaa", 2L)))
  }

  test("lexicographic tiebreak on equal counts") {
    // 'xy' and 'ab' both count 1; (a,b) < (x,y)
    val got = train(Seq("xy ab"), 1)
    assert(got == Seq((1, "a", "b", "ab", 1L)))
  }

  test("case folding and whitespace tokenization feed the vocab") {
    val got = train(Seq("  AB   ab\tAb  "), 1)
    // one word type 'ab' ×3
    assert(got == Seq((1, "a", "b", "ab", 3L)))
  }

  test("deterministic across input partitionings") {
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.train(spark, texts, "text", 3).collect().toSeq
    val b = Bpe.train(spark, texts.repartition(17), "text", 3).collect().toSeq
    assert(a == b && a.size == 3)
  }
}
