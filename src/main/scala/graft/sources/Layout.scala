package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical-layout writers: the storage-side half of the 100 TB story.
  *
  * Shuffles are the scale bottleneck of every big join/agg, and the two
  * standing ways to DELETE one (rather than merely speed it up) are
  * decided at WRITE time, not query time:
  *
  *  - '''Bucketing''' (`writeBucketed`): rows are hash-distributed into
  *    a fixed number of buckets by the join/agg key and each bucket is
  *    written pre-sorted. Two tables bucketed by the same key with the
  *    same bucket count join with NO exchange on either side (and no
  *    sort, when `sortCols` covers the key) — the shape for fact-fact
  *    joins run repeatedly: pay one shuffle at load time, never again.
  *    Spark's planner consumes the layout automatically; nothing about
  *    the query changes.
  *
  *  - '''Range layout''' (`writeRangeLayout`): rows are range-
  *    partitioned and sorted by a filter column (event time, date), so
  *    every output file covers a narrow, disjoint value range. Parquet
  *    footer min/max statistics then let a range predicate skip whole
  *    files/row-groups at scan time — the poor man's time index, and
  *    the difference between scanning 100 TB and scanning the two files
  *    that overlap the queried window. LayoutSpec proves the written
  *    ranges are pairwise disjoint, which is exactly the property file
  *    skipping needs.
  *
  * Both are plain Spark primitives (`bucketBy`/`repartitionByRange`) —
  * the value is using them as the default layout for warehouse facts,
  * not inventing them. The bank warehouse's date-partitioned facts
  * ([[graft.bank.Pipeline]]) compose with either: partition by date,
  * bucket by the join key within partitions.
  */
object Layout {

  /** Write `df` as a bucketed (and optionally per-bucket-sorted)
    * table registered in the session catalog. Join two tables bucketed
    * by the same keys and count and the exchange disappears from the
    * plan; sort by the same keys and the merge-join sort disappears
    * too.
    *
    * Bucket count is a layout contract: pick it for the TARGET scale
    * (buckets ≈ data size / healthy-partition size) — at 100 TB that
    * is thousands, never the 8 a laptop test uses. Mismatched bucket
    * counts between two tables still save one side's exchange. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(buckets >= 1, s"buckets=$buckets must be positive")
    // repartition by the bucket hash first: `repartition(n, keys)` and
    // bucketing share Murmur3-hash-mod-n placement, so each task holds
    // exactly one bucket and writes exactly one file. Without it every
    // input partition spills a sliver into every bucket (N×B small
    // files), and a multi-file bucket loses its sort guarantee — the
    // scan would re-Sort before every merge join.
    val w = df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back with its layout metadata (reading the
    * parquet path directly would discard the bucket spec). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write `df` range-partitioned and sorted by `rangeCols` into
    * `files` parquet files with pairwise-disjoint value ranges, so
    * range predicates on those columns skip non-overlapping files via
    * footer min/max stats. `files` sizes the layout: target
    * ~100-500 MB per file at scale. */
  def writeRangeLayout(df: DataFrame, path: String, rangeCols: Seq[String],
                       files: Int): Unit = {
    require(rangeCols.nonEmpty, "rangeCols must be non-empty")
    require(files >= 1, s"files=$files must be positive")
    df.repartitionByRange(files, rangeCols.map(col): _*)
      .sortWithinPartitions(rangeCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
