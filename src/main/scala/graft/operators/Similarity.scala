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

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Pairwise cosine over all ordered pairs (a ≠ b), with per-vector norms
    * precomputed once (not per pair). */
  def cosineAllPairs(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = v.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).where(col("id_a") =!= col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select("id_a", "id_b", "cosine")
  }

  /** Exact top-k neighbours per vector by cosine, deterministic tiebreak
    * on neighbour id. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cosine").desc, col("id_b"))
    cosineAllPairs(emb, idCol, vecCol)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("sim"), col("rnk"))
  }

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

  /** `planes`-bit random-hyperplane bucket key of a vector column. */
  def lshBucket(vec: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { j =>
      val signs = array((0 until dim).map(d => lit(planeSign(j, d))): _*)
      when(dot(vec, signs) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** Approximate top-k: candidates share an LSH bucket; exact cosine +
    * rank within the candidate set. Recall grows with fewer planes
    * (bigger buckets) — planes is the precision/cost dial. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              dim: Int, planes: Int, k: Int): DataFrame = {
    val v = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bucket", lshBucket(col("v"), dim, planes))
    val a = v.select(col("id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("bucket"))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cosine").desc, col("id_b"))
    a.join(b, Seq("bucket")).where(col("id_a") =!= col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("sim"), col("rnk"))
  }
}
