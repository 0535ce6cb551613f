package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - `cosineTopK`: exact brute force — O(n²) pairs but each pair is one
  *    codegen'd array fold (O(d)), no per-dimension row explosion. The
  *    baseline and the verifier for the approximate path.
  *  - `lshTopK`: random-hyperplane LSH — deterministic md5-derived ±1
  *    planes, `planes`-bit bucket key, candidates only within a bucket
  *    (plus optional multi-probe by flipping one bit). This is the path
  *    that survives 100 TB: the all-pairs term drops to Σ bucket².
  *
  * All arithmetic is double (floats upcast first) and folds run in
  * index order, so results are reproducible run-to-run and across
  * engines for the oracle.
  */
object Similarity {

  /** Dot product of two array<double> columns: native codegen'd
    * expression ([[graft.functions.VectorExpressions.dotNative]]) —
    * strict left-to-right summation, bit-identical to the equivalent
    * `aggregate(zip_with(...))` fold but with no per-row allocation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotNative(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Pairwise cosine over all ordered pairs (a ≠ b), with per-vector norms
    * precomputed once (not per pair). */
  def cosineAllPairs(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // cached: norms are computed once per vector, not once per side
    val v = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v"))).cache()
    val a = v.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).where(col("id_a") =!= col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select("id_a", "id_b", "cosine")
  }

  /** Exact top-k neighbours per vector by cosine, deterministic tiebreak
    * on neighbour id. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    rankTopK(cosineAllPairs(emb, idCol, vecCol), k)

  /** Shared tail: best-k neighbours per id_a from (id_a, id_b, cosine)
    * via the bounded [[graft.functions.TopKAggregate]] — map-side
    * partial top-k means the shuffle carries n·k rows, not all pairs
    * (a row_number window would sort every candidate). Ordering matches
    * the window formulation exactly: cosine DESC, id_b ASC. */
  private[operators] def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .groupBy(col("id_a"))
      .agg(graft.functions.TopKAggregate
        .topkByScore(col("cosine"), col("id_b"), k).as("nn"))
      .select(col("id_a"), posexplode(col("nn")).as(Seq("i", "e")))
      .select(col("id_a"), col("e.id").as("id_b"),
        round(col("e.score"), 6).as("sim"),
        (col("i") + 1).cast("int").as("rnk"))

  /** Near-duplicate pairs: cosine ≥ threshold, id_a < id_b. */
  def cosineNearDup(emb: DataFrame, idCol: String, vecCol: String,
                    threshold: Double): DataFrame =
    cosineAllPairs(emb, idCol, vecCol)
      .where(col("id_a") < col("id_b") && col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("sim"))

  /** Deterministic ±1 hyperplane entry for (plane j, dimension d):
    * +1 iff the first md5 hex digit of "j:d" is ≥ '8'. */
  private[graft] def planeSign(j: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$d".getBytes("UTF-8"))
    if (((digest(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
  }

  /** `planes`-bit random-hyperplane bucket key for hash table `table` —
    * the composable (per-plane DotProduct) formulation. Kept as the
    * semantic reference for the fused
    * [[graft.functions.VectorExpressions.lshBucketsNative]] expression
    * (LshBucketsSpec asserts bit-identical keys); `lshTopK` uses the
    * fused form. */
  def lshBucket(vec: Column, dim: Int, planes: Int, table: Int): Column =
    (0 until planes).map { j =>
      val signs = array((0 until dim).map(d =>
        lit(planeSign(table * planes + j, d))): _*)
      when(dot(vec, signs) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** Approximate top-k with multi-table, multi-probe LSH.
    *
    * `tables` independent `planes`-bit hash tables, all computed by ONE
    * fused expression pass over a broadcast-free plane matrix (the
    * per-plane expression-tree formulation cost more than the brute
    * force it was supposed to beat). Each query row additionally probes
    * the `multiprobe` single-bit-flip neighbours of its own bucket —
    * multiprobe buys the recall extra tables would, without re-hashing.
    *
    * Scale shape: one explode to (id, table, bucket), one equi-join on
    * (table, bucket), one distinct, then vector lookups and the bounded
    * TopKAggregate — every step is a plain shuffle on bounded keys; the
    * quadratic term is Σ bucket² only.
    *
    * Parameter calibration against THIS corpus's geometry (the testdata
    * embeddings are isotropic noise — true top-5 neighbours sit at
    * cosine ≈ 0.37, per-plane agreement ≈ 0.6 — so amplification is
    * inherently weak; see SCALING.md): planes=9, tables=28,
    * multiprobe=9 reaches recall 0.93 at sf0.1 while evaluating ~44% of
    * all pairs. On clustered real-world corpora the same machinery
    * prunes far harder; the parameters are the dial. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              dim: Int, planes: Int, tables: Int, k: Int,
              multiprobe: Int = -1): DataFrame = {
    val mp = math.min(if (multiprobe < 0) planes else multiprobe, planes)
    val v = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v"))).cache()
    val keyed = v.select(col("id"),
      posexplode(graft.functions.VectorExpressions
        .lshBucketsNative(col("v"), dim, planes, tables)).as(Seq("t", "b")))
    val base = keyed.select(col("id").as("id_b"), col("t"), col("b"))
    val probe = keyed.select(col("id").as("id_a"), col("t"),
      explode(if (mp == 0) array(col("b"))
        else expr(s"concat(array(b), transform(sequence(0, ${mp - 1}), " +
          "j -> b ^ shiftleft(1L, j)))")).as("b"))
    val pairs = probe.join(base, Seq("t", "b"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    rankTopK(pairs
      .join(v.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb"))), k)
  }
}
