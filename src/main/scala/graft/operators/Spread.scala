package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out for CPU-heavy per-row operators (guide §2.5,
  * "input skew: one huge unsplittable file … repartition immediately
  * after the read").
  *
  * Parquet splits at ROW-GROUP granularity: a single-file,
  * single-row-group input is ONE scan task no matter how many cores
  * the session has, so every fused per-row kernel that runs in the
  * scan stage (shingle hashing, MinHash/SimHash signatures, CDC
  * chunking, winnowing, media codecs) executes single-threaded while
  * 31 cores idle — measured on the bench corpus as the wall ≈ cpu ≈ 2 s
  * cluster of text queries (bench_detail r14: q30/q45/q54/q77/q173/
  * q174/q178/q181 all within 0.2 s of their own cpu time on a 32-core
  * session).
  *
  * [[scaleOut]] round-robin repartitions to the session default
  * parallelism ONLY when the optimizer's size estimate says the whole
  * input fits inside one scan split (`spark.sql.files.maxPartitionBytes`)
  * — i.e. exactly the regime where the scan cannot parallelize itself.
  * At scale the estimate exceeds the split size, the input already
  * yields ≥ cores scan tasks, and this is the identity: no exchange is
  * ever added to a big input. The probe reads
  * `optimizedPlan.stats.sizeInBytes` — pure planning, no job, safe
  * under AQE (unlike `df.rdd.getNumPartitions`, which would
  * materialize upstream query stages).
  *
  * Correctness: every caller is partitioning-proof by spec (content
  * hashes, integer aggregates, min-id canonicals), so a round-robin
  * exchange cannot change results — only spread the per-row CPU.
  * Streaming frames are returned untouched (micro-batch sizing is the
  * stream's own dial).
  */
object Spread {

  /** Kill switch for A/B isolation and for deployments whose inputs
    * are never single-split: SPARK_GRAFT_SPREAD=0 makes scaleOut the
    * identity. Default on. */
  private val enabled: Boolean =
    sys.env.get("SPARK_GRAFT_SPREAD").forall(_ != "0")

  def scaleOut(df: DataFrame): DataFrame = {
    if (!enabled || df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target <= 1) return df
    // Only a SCAN-SHAPED plan (projections/filters/unions over file or
    // local leaves) can be stuck at one task per file: any upstream
    // shuffle-producing operator (join, aggregate, window, repartition)
    // or cached intermediate already distributed the rows, and
    // re-exchanging those is pure overhead (measured: +21% on the
    // curation funnel whose near-dup stage reads a cached join). The
    // shape test runs on the ANALYZED plan first — probing
    // `optimizedPlan` on a non-qualifying input would pay a full
    // optimizer pass over an arbitrarily large upstream tree just to
    // say no.
    import org.apache.spark.sql.catalyst.plans.logical._
    def shapeOk(p: LogicalPlan): Boolean = p.collect { case n => n }.forall {
      case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => false
      case _: Project | _: Filter | _: Union | _: SubqueryAlias => true
      case _: LeafNode => true
      case _ => false
    }
    if (!shapeOk(df.queryExecution.analyzed)) return df
    // optimizedPlan re-checked: cache substitution happens after
    // analysis, so a cached scan-shaped frame only shows its
    // InMemoryRelation here
    val plan = df.queryExecution.optimizedPlan
    if (!shapeOk(plan)) return df
    val oneSplit = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val estimated = plan.stats.sizeInBytes
    if (estimated <= oneSplit) df.repartition(target) else df
  }
}
