package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Product quantization against an in-memory brute-force replay: the
  * codes, distortions and ADC rankings are exact-integer, so the Spark
  * result must equal the reference computation bit-for-bit. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val M = 8
  private val K = 16

  /** (id → milli-lattice vector), the shared quantization. */
  private lazy val vecs: Map[Long, Array[Long]] = {
    Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) " +
          "* 1000.0) AS BIGINT))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
  }

  private def sub(v: Array[Long], m: Int): Array[Long] =
    v.slice(m * 8, m * 8 + 8)
  private def l2sq(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Brute-force encode: (id, m) → (code, dist2), ties to lowest code. */
  private lazy val refEncode: Map[(Long, Int), (Int, Long)] = {
    val cbIds = vecs.keys.toSeq.sorted.take(K)
    (for (id <- vecs.keys.toSeq; m <- 0 until M) yield {
      val s = sub(vecs(id), m)
      val (d, c) = cbIds.zipWithIndex
        .map { case (cid, c) => (l2sq(s, sub(vecs(cid), m)), c) }.min
      (id, m) -> (c, d)
    }).toMap
  }

  test("encode matches brute force: codes, distortion, tie-break") {
    val got = Pq.encode(Tables.embeddings(spark, sf), "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    assert(got.size == vecs.size * M)
    assert(got == refEncode)
  }

  test("codeStats: counts per subquantizer sum to n; distortion sums agree") {
    val stats = Pq.codeStats(Tables.embeddings(spark, sf),
      "vec_id", "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    for (m <- 0 until M)
      assert(stats.collect { case ((`m`, _), (n, _)) => n }.sum == vecs.size)
    val refStats = refEncode.toSeq
      .groupBy { case ((_, m), (c, _)) => (m, c) }
      .map { case (k, rows) =>
        k -> (rows.size.toLong, rows.map(_._2._2).sum) }
    assert(stats == refStats)
  }

  test("adcTopK matches brute-force ADC on the encoded corpus") {
    val queries = vecs.keys.filter(_ % 250 == 7).toSeq.sorted
    assert(queries.nonEmpty)
    val cbIds = vecs.keys.toSeq.sorted.take(K)
    val ref = (for (q <- queries) yield {
      val best = vecs.keys.toSeq.filter(_ != q).map { id =>
        val adc = (0 until M).map { m =>
          val code = refEncode((id, m))._1
          l2sq(sub(vecs(q), m), sub(vecs(cbIds(code)), m))
        }.sum
        (adc, id)
      }.sorted.take(5)
      q -> best.zipWithIndex.map { case ((adc, id), i) => (id, adc, i + 1) }
    }).toMap
    val got = Pq.adcTopK(Tables.embeddings(spark, sf), "vec_id", "embedding",
        queryPred = pmod(col("vec_id"), lit(250)) === 7, k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3))
          .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq }
    assert(got == ref)
  }

  test("ivfPqCodeStats: residual codes cover every vector; residual " +
       "distortion beats raw-vector PQ (the point of IVF-PQ)") {
    val emb = Tables.embeddings(spark, sf)
    val ivfpq = Pq.ivfPqCodeStats(emb, "vec_id", "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
    for (m <- 0 until M) {
      val perM = ivfpq.collect { case ((`m`, _), v) => v }
      assert(perM.map(_._1).sum == vecs.size, s"subquantizer $m coverage")
    }
    val rawDist = Pq.codeStats(emb, "vec_id", "embedding").collect()
      .map(_.getLong(3)).sum
    val resDist = ivfpq.map(_._2._2).sum
    assert(resDist < rawDist,
      s"residual PQ distortion $resDist should beat raw $rawDist")
  }

  test("adcRecallAtK: hits bounded by k, consistent with brute-force sets") {
    val got = Pq.adcRecallAtK(Tables.embeddings(spark, sf),
        "vec_id", "embedding",
        queryPred = pmod(col("vec_id"), lit(250)) === 7, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val queries = vecs.keys.filter(_ % 250 == 7)
    assert(got.map(_._1).toSet == queries.toSet)
    for ((_, hits, ppm) <- got) {
      assert(hits >= 0 && hits <= 5)
      assert(ppm == hits * 200000L)
    }
  }

  test("encode plan: codebook broadcasts, no shuffle carries the n·m·k blowup") {
    val p = Pq.encode(Tables.embeddings(spark, sf), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"codebook join should broadcast:\n$p")
    // the argmin is a partial-final aggregate pair: the n·m·k candidate
    // rows collapse map-side (partial_min of the (dist2, code) struct —
    // SortAggregate, struct min is not hash-aggregable) BEFORE the only
    // shuffle, which carries n·m encoded rows
    assert(p.contains("partial_min"), s"expected map-side partial_min:\n$p")
  }
}
