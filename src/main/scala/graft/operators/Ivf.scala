package graft.operators

import graft.operators.Similarity.dot
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour search: partition
  * the corpus into `nlist` KMeans cells, then search only the `nprobe`
  * cells closest to each query vector.
  *
  * This is the other classic ANN scale path next to LSH
  * ([[Similarity.lshTopK]]): candidates ≈ n·(nprobe/nlist) per query
  * instead of n, with recall controlled by nprobe. Centroids are tiny
  * (nlist × dim) and broadcast; the candidate join is an ordinary
  * equi-join on the cell id.
  */
object Ivf {

  /** Approximate top-k by cosine using an IVF index built on the same
    * corpus (self-join ANN, the dedup/similarity-search shape). */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int, nprobe: Int, seed: Long = 42L): DataFrame = {
    val v = emb.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .withColumn("vec", array_to_vector(col("v"))).cache()

    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("vec").setPredictionCol("cell")
      .fit(v)

    // corpus side: primary cell per vector (cached: probe and candidate
    // sides both read it)
    val indexed = model.transform(v).select("id", "v", "nrm", "cell").cache()

    // query side: nprobe nearest cells via broadcast centroid distances
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }.toSeq
    val centroidDf = indexed.sparkSession.createDataFrame(centroids)
      .toDF("cell", "centroid")
      .withColumn("cnorm2", dot(col("centroid"), col("centroid")))
    // ‖v−c‖² = ‖v‖² − 2⟨v,c⟩ + ‖c‖²; both norms are hoisted (one per
    // vector / per centroid), so the cross join pays a single dot each.
    // The nprobe-nearest cells come from the bounded TopKAggregate, NOT
    // a row_number window: the window would sort-shuffle n×nlist rows
    // (n×√n at the auto sizing) where the aggregate's map-side partial
    // reduces them to n×nprobe before the exchange. Ordering matches
    // the window formulation exactly (dist2 ASC, cell ASC ⇔ score
    // -dist2 DESC, id ASC).
    val probes = indexed.select(col("id"), col("v"), col("nrm"))
      .crossJoin(broadcast(centroidDf))
      .withColumn("dist2",
        col("nrm") * col("nrm") - lit(2.0) * dot(col("v"), col("centroid")) +
          col("cnorm2"))
      .groupBy(col("id"))
      .agg(first(col("v")).as("va"), first(col("nrm")).as("na"),
        graft.functions.TopKAggregate
          .topkByScore(-col("dist2"), col("cell").cast("long"), nprobe).as("cells"))
      .select(col("id").as("id_a"), col("va"), col("na"),
        explode(col("cells")).as("e"))
      .select(col("id_a"), col("va"), col("na"),
        col("e.id").cast("int").as("cell"))

    // no distinct before the ranking: a candidate pair (a, b) arises at
    // most once — b sits in exactly ONE primary cell, so at most one of
    // a's probed cells can contain it
    Similarity.rankTopK(probes
      .join(indexed.select(col("id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb"), col("cell")), Seq("cell"))
      .where(col("id_a") =!= col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select("id_a", "id_b", "cosine"), k)
  }

  /** [[ivfTopK]] with nlist ≈ √n (textbook IVF sizing) and nprobe =
    * max(4, nlist/8), from one `count()` job — the mirror of
    * [[Similarity.lshTopKAuto]]'s planes rule: candidate work per query
    * scales n·nprobe/nlist ≈ √n instead of a constant corpus fraction. */
  def ivfTopKAuto(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                  seed: Long = 42L): DataFrame = {
    val n = math.max(emb.count(), 1L)
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val nprobe = math.max(4, nlist / 8)
    ivfTopK(emb, idCol, vecCol, k, nlist, nprobe, seed)
  }
}
