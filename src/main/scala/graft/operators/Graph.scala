package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step every dedup
  * pipeline needs between "near-duplicate PAIRS" and "which docs to
  * KEEP": pairs form a graph, a duplicate group is a connected
  * component, and the canonical document is the component's minimum id.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges
  * in O(log² n) rounds regardless of component diameter, unlike naive
  * min-label propagation whose round count is the graph diameter (a
  * pathological duplicate chain — doc A near-dups B near-dups C … —
  * would take O(n) propagation rounds). Each round is two shuffles of
  * the edge set, nothing driver-side except the convergence test.
  * Per-round frames are locally CHECKPOINTED, not merely cached: a
  * cache truncates re-execution but not the analyzed plan, and each
  * round's plan embeds the previous round's several times over
  * (largeStar references the edge set twice, the convergence test twice
  * more), so with caching alone the plan tree grows exponentially with
  * rounds and OOMs the driver. At cluster scale swap `localCheckpoint`
  * for a reliable `checkpoint` (executor loss must not drop partitions)
  * — same shape, same truncation.
  *
  * Both phases are deterministic set transforms, so the fixpoint (a
  * star per component, every member pointing at the component minimum)
  * is exact and reproducible — the DuckDB oracle replays it with a
  * recursive transitive-closure CTE (q56).
  */
object Graph {

  /** Canonical undirected edge set: (u, v) with u < v, distinct, no
    * self-loops. */
  private def canon(e: DataFrame): DataFrame =
    e.where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()

  /** Large-star: every node connects its LARGER neighbours to the
    * minimum of its neighbourhood (including itself). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    canon(sym.groupBy(col("u"))
      .agg(collect_list(col("v")).as("nbrs"))
      .withColumn("m", least(array_min(col("nbrs")), col("u")))
      .select(col("u"), col("m"),
        explode(filter(col("nbrs"), n => n > col("u"))).as("bigger"))
      .select(col("bigger").as("u"), col("m").as("v")))
  }

  /** Small-star: every node connects its SMALLER-or-equal neighbours
    * (and itself) to the minimum among them. */
  private def smallStar(e: DataFrame): DataFrame = {
    val directed = e.select(col("v").as("u"), col("u").as("v")) // v→u: u > v
    canon(directed.groupBy(col("u"))
      .agg(collect_list(col("v")).as("nbrs"))
      .withColumn("m", array_min(col("nbrs")))
      .select(explode(array_append(col("nbrs"), col("u"))).as("n"), col("m"))
      .select(col("n").as("u"), col("m").as("v")))
  }

  /** Connected components of the undirected graph given by edge pairs.
    * Returns (id, component) for every node INCIDENT TO AN EDGE, where
    * `component` is the smallest node id in its component. Isolated
    * nodes never enter the edge list — callers left-join and coalesce
    * to the node's own id (see q56).
    *
    * The convergence test (set equality of successive edge sets) costs
    * one `except` + `count` action per round — the standard price of a
    * driver-coordinated fixpoint loop; round COUNT is O(log² n), ~3-5
    * in practice on dedup graphs. */
  /** Below this edge count the driver runs union-find directly instead
    * of the star rounds: a dedup graph this small costs more in round
    * scheduling (2 shuffles + a convergence action per round, ~4 rounds)
    * than its data moves. The result is EXACTLY the same components —
    * both paths are spec'd equal — and the collect is bounded by the
    * threshold (~16 MB of edge longs), never corpus-sized. The star
    * rounds remain the path for every graph that matters at 100 TB. */
  val LocalEdgeThreshold: Long = 1L << 20

  /** Driver-side union-find with path halving; returns (id, component
    * minimum) for every node incident to an edge. */
  private def localComponents(spark: org.apache.spark.sql.SparkSession,
                              edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { // union by min keeps the root the component minimum
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.iterator.map(n => (n, find(n))).toSeq.toDF("id", "component")
  }

  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 25,
                          localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    // localCheckpoint, NOT cache — see the plan-growth note in the
    // class doc. LAZY checkpoint: the count() below is every round's
    // materializing action, so each round costs ONE job instead of two
    // (an eager checkpoint runs its own). Old rounds' blocks are freed
    // by the ContextCleaner once the previous frame goes unreferenced.
    var e = canon(edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))).localCheckpoint(eager = false)
    var eCount = e.count()
    if (eCount > 0 && eCount <= localThreshold)
      return localComponents(e.sparkSession,
        e.collect().map(r => (r.getLong(0), r.getLong(1))))
    var converged = eCount == 0
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val nextCount = next.count()
      // Both sides are canonical distinct sets, so unequal cardinality
      // already proves non-convergence — the exact (and 2-shuffle)
      // set-equality test only runs on the final round or two where
      // counts have stabilized.
      converged = nextCount == eCount &&
        next.exceptAll(e).unionByName(e.exceptAll(next)).isEmpty
      e = next
      eCount = nextCount
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")
    // fixpoint is a star per component: u = component min, v = member.
    // Member rows are already distinct (e is a canonical edge SET, one
    // row per member); only the root side needs deduplication — a
    // distinct over roots, not over the whole output.
    e.select(col("v").as("id"), col("u").as("component"))
      .unionByName(e.select(col("u")).distinct()
        .select(col("u").as("id"), col("u").as("component")))
  }

  /** Exact triangle count by degree orientation (the MapReduce-classic
    * Suri & Vassilvitskii "node-iterator++" / Cohen scheme): orient each
    * undirected edge from its lower-(degree, id) endpoint to the higher
    * one, enumerate each apex's out-neighbour WEDGES in rank order, and
    * close them against the oriented edge set — every triangle is
    * counted exactly once, at its lowest-rank vertex.
    *
    * Why this survives scale: wedge volume is Σ out-deg² and degree
    * orientation caps out-degree at O(√m) on ANY graph (a vertex's
    * out-neighbours all out-rank it), so the wedge join is
    * Σ min(deg, √m)² — the naive u–v–w triple join instead pays Σ deg²
    * with the full degree of every hub (a power-law hub with degree d
    * contributes d² wedges naive vs m wedges oriented). The degree table
    * is one map-side-combined aggregation, vertices × 1 row, and rides
    * the joins broadcast when small (AQE decides from runtime sizes).
    *
    * Returns one row: (n_vertices, n_edges, n_triangles). Exact
    * integers — the DuckDB oracle replays the count with the plain
    * a<b<c triple join (orientation never changes the count, q83). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // cached: the edge set feeds the degree aggregation, the
    // orientation join and the adjacency build — uncached, the distinct
    // recomputes once per consumer (session-scoped cache; Bench/Verify
    // clear per query)
    val e = canon(edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))).cache()
    // one bounded driver action: m sizes the adjacency-broadcast
    // decision (Σ|adj| = m longs exactly) and rides out as n_edges —
    // the same count-then-dial pattern as IntervalJoin.overlapsSelfAuto
    val m = e.count()
    // deg and oriented are each consumed by MULTIPLE branches (the two
    // orientation sides, the vertex count, the adjacency build, the
    // per-edge stream) and every broadcast build runs its subtree as
    // its own job — uncached, the orientation recomputed four times
    // over (measured: 27 jobs, 7 s; cached: 3 s)
    val deg = e.select(col("u").as("x")).unionByName(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d")).cache()
    // m bounds every broadcast here: n_vertices ≤ 2m and Σ|adj| = m, so
    // below ~64 MB the degree and adjacency tables ship to every task
    // (sort-merge re-keying of the 1.2M-edge side measured 3× slower at
    // sf0.1); above it, the plain shuffle joins a 100 TB graph needs
    // anyway — the count-then-dial pattern of IntervalJoin
    // .overlapsSelfAuto
    val small = m * 16 < (64L << 20)
    def dial(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // orient by (degree, id): src = lower rank, dst = higher
    val oriented = e
      .join(dial(deg.select(col("x").as("u"), col("d").as("du"))), "u")
      .join(dial(deg.select(col("x").as("v"), col("d").as("dv"))), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("id"), col("du").as("d")))
          .otherwise(struct(col("v").as("id"), col("dv").as("d"))).as("lo"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("v").as("id"), col("dv").as("d")))
          .otherwise(struct(col("u").as("id"), col("du").as("d"))).as("hi"))
      .select(col("lo.id").as("src"), col("hi.id").as("dst"),
        col("hi.d").as("dst_d"))
    // adjacency-intersection counting: per oriented edge (a→b), the
    // triangles closed through it are |out(a) ∩ out(b)| (every DAG
    // triangle a→b, a→c, b→c is counted exactly once, at its a→b
    // edge). The wedge-join alternative materializes and SHUFFLES
    // Σ C(outdeg, 2) wedge rows to probe the closing edges; here the
    // same comparisons run in-row over per-vertex sorted adjacency
    // arrays (built once — one aggregation, arrays degree-bounded by
    // the orientation) with a fused two-pointer walk. Measured at
    // sf0.1's co-purchase graph (1.2M edges, 1.9M triangles): 8.7 s
    // wedge join → ~2.5 s.
    val adj = dial(oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs")))
    val perEdge = oriented.select(col("src"), col("dst"))
      .join(adj.select(col("src"), col("nbrs").as("na")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nb")), Seq("dst"))
      .select(graft.functions.PairExpressions
        .sortedIntersectCount(col("na"), col("nb")).as("t"))
    // one-row side frame, no further driver actions
    val nv = deg.agg(count(lit(1)).as("n_vertices"))
    nv.select(col("n_vertices"), lit(m).as("n_edges"))
      .crossJoin(perEdge.agg(coalesce(sum(col("t")), lit(0L))
        .as("n_triangles")))
  }

  /** Degree distribution of the undirected graph: (degree, n_nodes) —
    * the first diagnostic of any graph workload (skew, hubs, whether
    * the degree cap that makes [[triangleCount]]'s orientation work is
    * doing anything). Two map-side-combined aggregations over the
    * canonical edge set; nothing driver-side, nothing degree-bounded
    * in memory — the histogram is as wide as the distinct degrees. */
  def degreeHistogram(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = canon(edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v")))
    e.select(col("u").as("x")).unionByName(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
  }

  /** Bounded-hop BFS: minimum hop distance (≤ maxHops) from a seed set
    * over the undirected graph — the "what is reachable from here"
    * primitive behind contamination blast-radius checks, related-item
    * expansion and graph feature engineering. Returns (id, dist) for
    * every node within maxHops of any seed; unreachable nodes are
    * absent.
    *
    * Shape: one frontier join + min-aggregation per hop, maxHops
    * driver iterations (bounded a priori, unlike
    * [[connectedComponents]]' data-dependent fixpoint — no convergence
    * action needed); per-hop frames locally checkpointed so lineage
    * stays flat. Level sets may revisit nodes; the final min over
    * levels restores BFS semantics exactly, which is what lets the
    * DuckDB oracle replay it with unrolled per-hop CTEs + one min. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, srcCol: String,
              dstCol: String, idCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops=$maxHops must be >= 0")
    // EAGER checkpoints throughout the iteration, and the canonical edge
    // set materialized BEFORE symmetrization. Lazy checkpoints persist on
    // first computation — but the per-hop broadcast-build jobs of the
    // final plan launch concurrently (BroadcastExchangeExec runs on its
    // own thread pool), so with lazy frames several hops' jobs each
    // re-derived the edge set from the source table before any had
    // finished persisting it (measured by the round-5 driver: ~750 MB
    // input read against an 11 MB source parquet). Eager materialization
    // serializes the derivation into one job; every later job — frontier
    // joins, broadcast builds, the final union — hits resident blocks,
    // so total input read ≈ one source scan.
    val e = canon(edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))).localCheckpoint(eager = true)
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = true)
    // A level set is bounded by the node count; when nodes are
    // broadcast-sized, ship the FRONTIER to the resident edge set each
    // hop instead of re-shuffling 2·m edge rows per hop — the
    // count-then-dial pattern of triangleCount (one bounded action).
    // Above the threshold the plain shuffle join is what a 100 TB
    // graph needs anyway.
    val nNodes = sym.select(col("u")).distinct().count()
    val small = nNodes * 16 < (64L << 20)
    def dial(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    var levels = Seq(seeds.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("d", lit(0L)).localCheckpoint(eager = true))
    for (h <- 1 to maxHops) {
      val next = sym.join(dial(levels.last.select(col("id").as("u"))), "u")
        .select(col("v").as("id")).distinct()
        .withColumn("d", lit(h.toLong)).localCheckpoint(eager = true)
      levels = levels :+ next
    }
    levels.reduce(_ unionByName _)
      .groupBy(col("id")).agg(min(col("d")).as("dist"))
  }

  /** Bounded min-label propagation: `rounds` synchronous rounds of
    * label(v) ← min(label(v), min over neighbours of label(u)), labels
    * initialized to the node id. After `rounds` ≥ graph radius this IS
    * connected components (label = component minimum); below it, it is
    * still a deterministic, engine-independent operator — the per-round
    * state is an exact BIGINT min, so a DuckDB oracle replays the same
    * unrolled rounds bit-for-bit. That oracle-checkability is what
    * [[connectedComponents]]' data-dependent fixpoint cannot offer;
    * use THIS for a fixed-budget label pass (e.g. "cluster ids after k
    * rounds" in an iterative-dataflow pipeline) and the alternating-star
    * fixpoint when true components of unknown diameter are required.
    *
    * Shape per round: ONE join of the label frame with the resident
    * symmetrized edge set + one map-side-combined min — the
    * min(own, neighbours) merge is folded into the aggregation by
    * adding a self-loop per node to the resident edge set, so no
    * second merge join exists (identical semantics: min over
    * N(v) ∪ {v}). Count-then-dial broadcast of the |nodes|-row frame
    * when it fits, shuffle join when it doesn't (the
    * [[pageRankScaled]] iteration pattern); label frames locally
    * checkpointed so lineage stays flat. */
  def labelPropagationMin(edges: DataFrame, srcCol: String, dstCol: String,
                          rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    // EAGER materialization before and inside the round loop — the lazy
    // variant let the concurrent per-round broadcast-build jobs each
    // re-derive the edge set from the source table (see the note in
    // [[bfsHops]]; the round-5 driver measured q115 reading ~756 MB
    // against an 11 MB source). e first, so nodes/symSelf derive from
    // resident blocks: total input read ≈ one source scan.
    val e = canon(edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))).localCheckpoint(eager = true)
    val nodes = e.select(col("u")).unionByName(e.select(col("v").as("u")))
      .distinct().localCheckpoint(eager = true)
    val symSelf = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .unionByName(nodes.select(col("u"), col("u").as("v")))
      .localCheckpoint(eager = true)
    val nNodes = nodes.count()
    val small = nNodes * 16 < (64L << 20)
    def dial(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    var lab = nodes.select(col("u").as("id"), col("u").as("label"))
    for (_ <- 1 to rounds) {
      lab = symSelf
        .join(dial(lab.select(col("id").as("u"), col("label"))), "u")
        .groupBy(col("v").as("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(eager = true)
    }
    lab
  }

  /** PageRank over the undirected graph (each edge walked both ways),
    * in INTEGER-QUANTIZED arithmetic: ranks live in micro-units of
    * `scale` (initial rank = scale per node), a node's per-neighbour
    * contribution is `rank DIV degree`, and the damping update is
    * r' = (15·scale) DIV 100 + (85·Σ contrib) DIV 100 — every step an
    * exact BIGINT, so the fixed-iteration result replays bit-for-bit
    * on any engine (the DuckDB oracle unrolls the iterations as CTEs).
    * Floating-point PageRank cannot cross engines: Σ over in-neighbours
    * sums doubles in shuffle order. Quantization error is bounded by
    * deg(v) units per node per iteration — at scale 1e12, parts in
    * 1e-9 — and identical on both engines, which is the point.
    *
    * Per iteration: one join of the rank table with the symmetrized
    * edge set (hash-partitioned on the node key) + one
    * map-side-combined sum — the standard iterative-dataflow shape;
    * rank frames are locally checkpointed per round like
    * [[connectedComponents]]. No dangling-node mass term: every node
    * here is incident to an edge (degree ≥ 1 by construction).
    *
    * Overflow guard: the damping update multiplies a node's in-sum by
    * 85, so the iteration is exact only while every in-sum s satisfies
    * 85·s < 2^63. The worst CASE is the star graph (all mass N·scale
    * into one hub), but gating statically on 85·N·scale rejects real
    * graphs whose in-sums sit near `scale` — measured: the 10× sf1
    * co-purchase graph (200 k nodes) trips the static bound while its
    * true max in-sum is ~1e3× below the Long ceiling. The guard is
    * therefore DYNAMIC and exact: each iteration's rank update
    * `raise_error`s on any row whose in-sum would overflow (the same
    * condition under which the DuckDB oracle's BIGINT would refuse) —
    * never a silent wrap, never a false rejection. For graphs that DO
    * trip it (a billion-node hub), drop scale to 1e8 — precision parts
    * in 1e-5, still identical on both engines. */
  /** Per-row overflow guard for the integer damping update: each
    * iteration's rank frame passes through `.where(guardInSum(scale))`,
    * so an in-sum whose 85× multiple would leave Long range fails the
    * query loudly (`raise_error`, the [[IntervalJoin]] pattern — a
    * `.where` is not prunable) instead of wrapping silently. `s ≤
    * Long.MaxValue/85` also bounds the subsequent `+ 15·scale/100` term
    * given the ctor's `scale ≤ Long.MaxValue/85`: the sum stays below
    * Long.MaxValue·(1/100 + 15/(100·85)). This replaces the former
    * static star-graph bound 85·N·scale < 2^63, which rejected real
    * graphs whose in-sums sit near `scale` (the 10× co-purchase graph
    * at 200 k nodes) a factor ~N early. */
  private def guardInSum(scale: Long): Column = {
    val maxS = Long.MaxValue / 85
    // BETWEEN, not ≤: rank contributions are non-negative by
    // construction, so a NEGATIVE in-sum is only reachable through a
    // 64-bit wrap in the contribution sum itself — under ANSI that sum
    // raises before reaching here, but with spark.sql.ansi.enabled=false
    // it wraps silently, and an upper bound alone would wave the wrapped
    // value through (ADVICE r12). Rejecting s < 0 makes the
    // never-a-silent-wrap guarantee ANSI-independent.
    when(coalesce(col("s"), lit(0L)).between(0L, maxS), lit(true))
      .otherwise(raise_error(concat(
        lit(s"pagerank in-sum overflows 85*s at scale=$scale: s="),
        col("s"), lit(s" outside [0, $maxS] - lower `scale`"))))
  }

  def pageRankScaled(edges: DataFrame, srcCol: String, dstCol: String,
                     iterations: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    // EAGER materialization (see [[bfsHops]]): e first, then sym/deg from
    // resident blocks, then one eager frame per iteration — without it
    // the concurrent broadcast builds re-derived the edge set per
    // iteration (round-5 driver: ~754 MB read vs 11 MB source on q104).
    val e = canon(edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))).localCheckpoint(eager = true)
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = true)
    val deg = sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    // Rank vectors are |nodes| rows; when that is broadcast-sized, ship
    // the RANKS to the resident edge set each iteration instead of
    // re-shuffling 2·m edge rows per iteration (count-then-dial, the
    // triangleCount pattern; deg.count() doubles as the overflow
    // sanity bound's N). Above the threshold the shuffle join is the
    // plan a billion-node graph needs anyway.
    val nNodes = deg.count()
    require(scale > 0 && scale <= Long.MaxValue / 85,
      s"scale=$scale overflows 85*scale on a single node")
    val small = nNodes * 24 < (64L << 20)
    def dial(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // deg rides inside the rank frame: one join per iteration, not two
    var rank = deg.select(col("id"), col("deg"), lit(scale).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(dial(rank.select(col("id").as("u"), expr("r DIV deg").as("c"))),
          "u")
        .groupBy(col("v").as("id")).agg(sum(col("c")).as("s"))
      // every node has an in-edge (symmetrized, deg >= 1), so the left
      // join is total — coalesce guards the type, not a real case
      rank = deg
        .join(dial(contrib), Seq("id"), "left")
        .where(guardInSum(scale))
        .select(col("id"), col("deg"),
          (lit(15L * scale / 100L) +
            expr("85 * coalesce(s, 0L) DIV 100")).as("r"))
        .localCheckpoint(eager = true)
    }
    rank.select(col("id"), col("r").as("rank_scaled"))
  }

  /** Personalized PageRank with restart to a SEED set — "importance
    * relative to these nodes", the similarity/expansion primitive
    * behind related-item panels and seed-expansion labeling (a seed
    * document set expands to its neighborhood by PPR mass). Same
    * integer-quantized iteration as [[pageRankScaled]] (ranks in
    * `scale` units, contributions by integer division — every step
    * exact BIGINT, so it replays as unrolled CTEs in DuckDB), except
    * the teleport term lands ONLY on seeds: r0 = scale·[v in seeds],
    * r' = 0.15·scale·[v in seeds] + 0.85·sum(contribs). Ranks are
    * per-seed-mass units (total injected mass = |seeds|·scale — the
    * relative ordering PPR is used for is normalization-free).
    *
    * Scale shape: identical to pageRankScaled — eagerly-materialized
    * symmetrized edge set iterated against a count-then-dialed rank
    * frame (broadcast when the node table is small, shuffle join at
    * billion-node scale); the seed flag rides INSIDE the rank frame,
    * so personalization adds zero extra joins per iteration. */
  def personalizedPageRankScaled(edges: DataFrame, srcCol: String,
                                 dstCol: String, seeds: DataFrame,
                                 seedCol: String, iterations: Int,
                                 scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    val e = canon(edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))).localCheckpoint(eager = true)
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = true)
    val deg = sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
      .join(seeds.select(col(seedCol).cast("long").as("id"),
        lit(1L).as("seed")), Seq("id"), "left")
      .select(col("id"), col("deg"), coalesce(col("seed"), lit(0L))
        .as("seed"))
      .localCheckpoint(eager = true)
    val nNodes = deg.count()
    require(scale > 0 && scale <= Long.MaxValue / 85,
      s"scale=$scale overflows 85*scale on a single node")
    val small = nNodes * 32 < (64L << 20)
    def dial(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    var rank = deg.select(col("id"), col("deg"), col("seed"),
      (col("seed") * scale).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(dial(rank.select(col("id").as("u"),
          expr("r DIV deg").as("c"))), "u")
        .groupBy(col("v").as("id")).agg(sum(col("c")).as("s"))
      rank = deg
        .join(dial(contrib), Seq("id"), "left")
        .where(guardInSum(scale))
        .select(col("id"), col("deg"), col("seed"),
          (col("seed") * lit(15L * scale / 100L) +
            expr("85 * coalesce(s, 0L) DIV 100")).as("r"))
        .localCheckpoint(eager = true)
    }
    rank.select(col("id"), col("seed"), col("r").as("ppr_scaled"))
  }

  /** Cluster assignment for a whole corpus from near-dup pairs: every
    * doc gets its component minimum as `cluster` (its own id when it
    * has no near-duplicates) and `keep` = is it the canonical doc of
    * its cluster. */
  def dedupClusters(docs: DataFrame, idCol: String,
                    pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val comp = connectedComponents(pairs, srcCol, dstCol)
      .withColumnRenamed("id", idCol)
    docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster"),
        (coalesce(col("component"), col(idCol)) === col(idCol)).as("keep"))
  }
}
