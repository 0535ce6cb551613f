package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compression scheme behind
  * billion-scale ANN serving (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): the d-dim space factors into
  * `m` orthogonal subspaces of d/m dims, each with its own tiny
  * codebook of `k` centroids, so a vector stores as `m` byte codes
  * (64 dims of float32 → 8 bytes here) and query-time distance is a
  * table lookup per subspace (ADC — asymmetric distance computation)
  * instead of d multiplies.
  *
  * Everything here is exact-integer and deterministic so the DuckDB
  * oracle replays codes and distances bit-for-bit (q317/q318):
  * components quantize to milli units (⌊x·1000⌋ — same floor on both
  * engines), distances are integer L2², the codebook is the `k`
  * LOWEST-id vectors (no fitted k-means — the fitted flavour of cell
  * assignment is covered by [[Ivf]]'s spec-checked variant), and
  * argmin ties break to the lowest code.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the codebook is m·k rows (128 here) — always broadcast;
  *  - encoding is one narrow pass: explode n vectors to n·m subvector
  *    rows, broadcast-join the codebook (n·m·k intermediate rows live
  *    only inside one stage), partial-aggregate the argmin map-side,
  *    shuffle n·m encoded rows once on (id, m);
  *  - ADC serving broadcasts the query LUT (q·m·k rows) against the
  *    encoded corpus and aggregates with the bounded
  *    [[graft.functions.TopKAggregate]], so the shuffle carries q·k
  *    rows per partition, never the corpus.
  */
object Pq {

  /** ⌊x·1000⌋ per component — the shared milli-unit lattice. */
  private def milli(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000.0)).cast("long"))

  /** Integer L2² between two equal-length long arrays. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Deterministic codebook: codeword (m, c) = subvector m of the
    * vector with the c-th lowest id. `k` rows collect through a
    * limit — bounded by construction (k ≤ 256). Output:
    * (m: int, code: int, cw: array&lt;long&gt;). */
  def codebook(emb: DataFrame, idCol: String, vecCol: String,
               subvectors: Int, codewords: Int): DataFrame =
    codebookQuantized(
      emb.select(col(idCol).cast("long").as("id"), milli(col(vecCol)).as("qv")),
      subvectors, codewords)

  /** [[codebook]] over an ALREADY-quantized long-array column `qv`
    * keyed by `id` — the entry point residual schemes (IVF-PQ) use. */
  def codebookQuantized(q: DataFrame,
                        subvectors: Int, codewords: Int): DataFrame = {
    val dsub = size(col("v")) / subvectors
    q.select(col("id"), col("qv").as("v"))
      .orderBy("id").limit(codewords)
      .withColumn("code",
        (row_number().over(Window.orderBy("id")) - 1).cast("int"))
      .select(col("code"), col("v"),
        explode(sequence(lit(0), lit(subvectors - 1))).as("m"))
      .select(col("m").cast("int").as("m"), col("code"),
        slice(col("v"), col("m") * dsub + 1, dsub).as("cw"))
  }

  /** Encode every vector: per (id, m) the argmin-L2² code and its
    * distortion. Ties → lowest code (the struct min orders by dist2
    * first, then code). Output: (id, m, code, dist2). */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             subvectors: Int = 8, codewords: Int = 16): DataFrame =
    encodeQuantized(
      emb.select(col(idCol).cast("long").as("id"), milli(col(vecCol)).as("qv")),
      subvectors, codewords)

  /** [[encode]] over an ALREADY-quantized long-array column `qv` keyed
    * by `id` (IVF-PQ residuals arrive pre-quantized). */
  def encodeQuantized(q: DataFrame,
                      subvectors: Int = 8, codewords: Int = 16): DataFrame = {
    val cb = codebookQuantized(q, subvectors, codewords)
    val dsub = size(col("v")) / subvectors
    val subs = q
      .select(col("id"), col("qv").as("v"))
      .select(col("id"), col("v"),
        explode(sequence(lit(0), lit(subvectors - 1))).as("m"))
      .select(col("id"), col("m").cast("int").as("m"),
        slice(col("v"), col("m") * dsub + 1, dsub).as("sub"))
    subs.join(broadcast(cb), "m")
      .select(col("id"), col("m"),
        struct(l2sq(col("sub"), col("cw")).as("dist2"), col("code")).as("s"))
      .groupBy("id", "m")
      .agg(min(col("s")).as("best"))
      .select(col("id"), col("m"), col("best.code").as("code"),
        col("best.dist2").as("dist2"))
  }

  /** Code-usage + distortion audit per (subquantizer, code): how many
    * vectors land on each codeword and the summed quantization error —
    * the table a PQ deployment watches for dead codes and drifting
    * residuals. One broadcast-join pass + one n·m-row aggregate. */
  def codeStats(emb: DataFrame, idCol: String, vecCol: String,
                subvectors: Int = 8, codewords: Int = 16): DataFrame =
    stats(encode(emb, idCol, vecCol, subvectors, codewords))

  /** IVF-PQ residual encode audit — the storage layout of a
    * billion-scale index (FAISS's IVFPQ): every vector stores as its
    * IVF cell id plus `m` byte codes of the RESIDUAL v − mean(cell)
    * (within-cell spread is smaller than corpus spread, so the same
    * codebook budget buys lower distortion — asserted in PqSpec).
    * Cells come from the deterministic md5-sampled IVF assignment
    * ([[Ivf.buildIndexDeterministic]], the q160 machinery — ties to
    * the lowest cell); the subtracted centroid is the cell's exact
    * integer milli-lattice mean (sum DIV count per dimension, the
    * q128/q187 recipe — truncating division matches on both engines),
    * so residuals are pure integers and the code/distortion table
    * replays bit-for-bit. The nlist-row mean table broadcasts;
    * everything else is [[encodeQuantized]]'s one-pass shape. */
  def ivfPqCodeStats(emb: DataFrame, idCol: String, vecCol: String,
                     nlist: Int = 64, subvectors: Int = 8,
                     codewords: Int = 16): DataFrame = {
    val index = Ivf.buildIndexDeterministic(emb, idCol, vecCol, nlist)
    val vm = index.indexed.select(col("id").cast("long").as("id"),
      col("cell"),
      transform(col("v"), x => floor(x * lit(1000.0)).cast("long")).as("vm"))
    val means = vm
      .select(col("cell"), posexplode(col("vm")).as(Seq("pos", "qx")))
      .groupBy("cell", "pos")
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))
      .select(col("cell"), col("pos"), expr("sq DIV n").as("cm"))
      .groupBy("cell")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cm")))),
        s => s.getField("cm")).as("cmv"))
    val residuals = vm.join(broadcast(means), "cell")
      .select(col("id"),
        zip_with(col("vm"), col("cmv"), (a, b) => a - b).as("qv"))
    stats(encodeQuantized(residuals, subvectors, codewords))
  }

  /** Pack an [[encode]] result to the index's storage row: one
    * m-byte code array per vector, ordered by subquantizer.
    * `partitions` > 0 widens the index beyond the aggregate's shuffle
    * width — the serving scan is a heavy nested-loop stage, and an
    * index at exactly `spark.sql.shuffle.partitions` (= cores on this
    * rig) measured 2.5× slower than one at 4× that width purely from
    * stragglers (SCALING.md); match it to ~3–4× cluster parallelism. */
  def packCodes(enc: DataFrame, partitions: Int = 0): DataFrame = {
    val packed = enc.groupBy("id")
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))
    if (partitions > 0) packed.repartition(partitions) else packed
  }

  private def stats(enc: DataFrame): DataFrame =
    enc.groupBy("m", "code")
      .agg(count(lit(1)).as("n_vecs"), sum(col("dist2")).as("dist_sum"))
      .select(col("m"), col("code"), col("n_vecs"),
        col("dist_sum").cast("long").as("dist_sum"))

  /** Recall@k of [[adcTopK]] against the exact cosine top-k for the
    * same query set — the evaluation every quantized index ships with
    * (how much recall did 8-byte codes cost?). The exact side is the
    * broadcast query-batch scan ([[Similarity.retrieveTopK]]'s plan,
    * self excluded): the corpus streams once, the bounded top-k
    * aggregate keeps the shuffle at q·k rows. Output: (id_a, hits,
    * recall_ppm), hits = |ADC top-k ∩ exact top-k|. */
  def adcRecallAtK(emb: DataFrame, idCol: String, vecCol: String,
                   queryPred: Column, k: Int,
                   subvectors: Int = 8, codewords: Int = 16): DataFrame = {
    val adc = adcTopK(emb, idCol, vecCol, queryPred, k,
      subvectors, codewords).select(col("id_a"), col("id_b"))
    val c = emb.select(col(idCol).cast("long").as("id_b"),
        transform(col(vecCol), x => x.cast("double")).as("vb"))
      .withColumn("nb", Similarity.norm(col("vb")))
    val q = emb.where(queryPred)
      .select(col(idCol).cast("long").as("id_a"),
        transform(col(vecCol), x => x.cast("double")).as("va"))
      .withColumn("na", Similarity.norm(col("va")))
    val exact = Similarity.rankTopK(
      c.crossJoin(broadcast(q))
        .where(col("id_a") =!= col("id_b"))
        .withColumn("cosine",
          Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .select("id_a", "id_b", "cosine"), k)
      .select(col("id_a"), col("id_b"))
    adc.join(exact.withColumn("hit", lit(1L)), Seq("id_a", "id_b"), "left")
      .groupBy("id_a")
      .agg(sum(coalesce(col("hit"), lit(0L))).cast("long").as("hits"))
      .select(col("id_a"), col("hits"),
        expr(s"hits * 1000000 DIV $k").as("recall_ppm"))
  }

  /** ADC top-k: for each query (rows matching `queryPred`), the k
    * nearest corpus vectors by asymmetric distance — Σ_m
    * lut(q, m, code(v, m)) where the LUT holds exact L2² from the
    * query's subvectors to every codeword. The serving scan is the
    * real PQ shape: corpus codes PACK to one m-byte array per vector,
    * the per-query LUT flattens to an m·k array riding a broadcast,
    * and each (corpus, query) pair costs m array lookups + adds — no
    * join fan-out, no per-subvector rows. Pass `encoded` to serve
    * from a prebuilt [[packCodes]]([[encode]]) index (builds once,
    * serves many batches). Self-matches excluded; ordering (adc ASC,
    * id_b ASC) via the bounded top-k aggregate. Output:
    * (id_a, id_b, adc_dist2, rnk). */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int,
              subvectors: Int = 8, codewords: Int = 16,
              encoded: Option[DataFrame] = None): DataFrame = {
    val cb = codebook(emb, idCol, vecCol, subvectors, codewords)
    val dsub = size(col("v")) / subvectors
    // per-query LUT rows → one (m·k)-element array ordered by (m, code)
    val lut = emb.where(queryPred)
      .select(col(idCol).cast("long").as("id_a"), milli(col(vecCol)).as("v"))
      .select(col("id_a"), col("v"),
        explode(sequence(lit(0), lit(subvectors - 1))).as("m"))
      .select(col("id_a"), col("m").cast("int").as("m"),
        slice(col("v"), col("m") * dsub + 1, dsub).as("sub"))
      .join(broadcast(cb), "m")
      .select(col("id_a"), col("m"), col("code"),
        l2sq(col("sub"), col("cw")).as("lut_dist2"))
      .groupBy("id_a")
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("code"),
          col("lut_dist2")))),
        s => s.getField("lut_dist2")).as("lut"))
    val packed = encoded.getOrElse(
      packCodes(encode(emb, idCol, vecCol, subvectors, codewords)))
    // native fused lookup-sum ([[graft.functions.AdcLookup]]):
    // zip_with/aggregate ran interpreted (~3× the exact dot at 262M
    // pairs) and 8 unrolled element_at terms still paid branchy
    // per-access checks (~1.5×) — the fused loop is what makes 8-byte
    // codes actually cheaper than the 64-dim dot
    packed.crossJoin(broadcast(lut))
      .where(col("id") =!= col("id_a"))
      .withColumn("adc", graft.functions.VectorExpressions
        .adcLookupNative(col("codes"), col("lut"), codewords))
      .groupBy("id_a")
      .agg(graft.functions.TopKAggregate
        .topkByScore(-col("adc").cast("double"), col("id"), k).as("nn"))
      .select(col("id_a"), posexplode(col("nn")).as(Seq("i", "e")))
      .select(col("id_a"), col("e.id").as("id_b"),
        (-col("e.score")).cast("long").as("adc_dist2"),
        (col("i") + 1).cast("int").as("rnk"))
  }
}
