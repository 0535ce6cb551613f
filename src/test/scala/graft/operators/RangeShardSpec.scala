package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** The two-level cumulative-sum shard planner must equal the naive
  * global running sum row-for-row, keep shards contiguous, and keep
  * the only unpartitioned window over the tiny block-offset table. */
class RangeShardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private case class Shard(n: Long, w: Long, lo: Long, hi: Long)

  private def planOf(blockWidth: Long): Map[Int, Shard] =
    RangeShard.plan(Tables.documents(spark, sf), "doc_id", "n_chars",
        shards = 8, blockWidth = blockWidth)
      .collect()
      .map(r => r.getInt(0) ->
        Shard(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  /** Naive single-pass reference on the driver. */
  private lazy val ref: Map[Int, Shard] = {
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = rows.map(_._2).sum
    var cum = 0L
    val tagged = rows.map { case (id, w) =>
      val s = (cum * 8 / total).toInt; cum += w; (s, id, w)
    }
    tagged.groupBy(_._1).map { case (s, g) =>
      s -> Shard(g.length.toLong, g.map(_._3).sum,
        g.map(_._2).min, g.map(_._2).max)
    }
  }

  test("matches the naive global cumulative sum (8 shards)") {
    assert(planOf(1024L) == ref)
  }

  test("block width does not change the answer (exactness, not tuning)") {
    assert(planOf(64L) == ref)
    assert(planOf(7L) == ref)
  }

  test("shards are contiguous, disjoint, and weight-balanced") {
    val p = planOf(1024L).toSeq.sortBy(_._1)
    assert(p.map(_._1) == (0 until p.size))
    for (Seq((_, a), (_, b)) <- p.sliding(2))
      assert(a.hi < b.lo, s"overlap: $a / $b")
    val total = p.map(_._2.w).sum
    val target = total / 8.0
    // each shard within one max-doc weight of the ideal cut
    val maxW = Tables.documents(spark, sf)
      .agg(max(col("n_chars"))).head().getLong(0)
    for ((s, sh) <- p)
      assert(math.abs(sh.w - target) <= maxW + 1,
        s"shard $s weight ${sh.w} vs target $target (maxDoc $maxW)")
  }

  private def windows(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution.window.WindowExec
    df.write.format("noop").mode("overwrite").save()
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[WindowExec] = {
      val here = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          return walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          return walk(q.plan)
        case w: WindowExec => Seq(w)
        case _ => Nil
      }
      here ++ p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("only the recursion's base case is unpartitioned — and it is tiny") {
    val df = RangeShard.plan(Tables.documents(spark, sf), "doc_id",
      "n_chars", shards = 8, blockWidth = 64L)
    // 500 docs, width 64 → one partitioned within-block level + the
    // 8-row base case
    val ws = windows(df)
    assert(ws.size == 2, s"expected within-block + base windows: $ws")
    assert(ws.count(_.partitionSpec.isEmpty) == 1,
      "exactly one unpartitioned window (the base case)")
  }

  test("deep recursion: every level but the base is partitioned") {
    // width 7 over 500 docs: 500 → 72 → 11 → 2 rows (3 partitioned
    // levels + one ≤7-row base case). However deep, exactly ONE
    // unpartitioned window exists, so no task ever sorts more than
    // blockWidth rows at any input size.
    val df = RangeShard.plan(Tables.documents(spark, sf), "doc_id",
      "n_chars", shards = 8, blockWidth = 7L)
    val ws = windows(df)
    assert(ws.count(_.partitionSpec.isEmpty) == 1,
      s"exactly one unpartitioned window at any depth: $ws")
    assert(ws.count(_.partitionSpec.nonEmpty) == 3,
      s"width 7 over 500 ids should recurse through 3 partitioned levels: $ws")
  }
}
