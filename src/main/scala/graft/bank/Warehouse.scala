package graft.bank

import java.nio.file.{Files, Path, Paths}
import java.sql.Date
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Parquet-backed warehouse layer: the Spark replacement for the
  * reference's PostgreSQL schema (`comm_funcs.py:10`). Tables live as
  * parquet directories under a root; facts append, dimensions swap
  * atomically (write-new → move), since Spark cannot overwrite a table
  * it is currently reading (the SCD2 dimension is input AND output of
  * the same transition — SURVEY §7 hard-part 2).
  *
  * At cluster scale the same layer maps onto object storage with a
  * rename-free committer or a table format; the call sites don't change.
  */
final class Warehouse(val spark: SparkSession, val root: String) {
  Files.createDirectories(Paths.get(root))

  private def dir(name: String): Path = Paths.get(root, name)

  def exists(name: String): Boolean = Files.exists(dir(name))

  def read(name: String): DataFrame = spark.read.parquet(dir(name).toString)

  /** Read if present, else an empty frame with the given schema. */
  def readOr(name: String, schema: StructType): DataFrame =
    if (exists(name)) read(name)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  def append(name: String, df: DataFrame,
             partitionCols: Seq[String] = Nil): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCols: _*)
      .parquet(dir(name).toString)

  /** Replace via write-new → swap: write to `<name>.tmp`, delete old,
    * move in. The source plan is fully materialized before the old
    * directory goes away, so self-referencing rewrites (SCD2) are safe.
    * NOT atomic against concurrent access — see [[compact]]'s
    * concurrency contract (single writer; crash between delete and move
    * leaves the table at `<name>.tmp` — [[recover]] moves it back). */
  def overwrite(name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s"$name.tmp")
    deleteRecursive(tmp)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    deleteRecursive(dir(name))
    Files.move(tmp, dir(name))
  }

  /** [[overwrite]] plus small metadata files written INTO the new table
    * directory before the swap, so the tags and the data version move
    * as ONE unit. This is what makes a streaming `foreachBatch`
    * overwrite sink exactly-once: the micro-batch id that produced a
    * table version is part of that version (a separate marker file
    * would race the swap — a crash between the two would replay a batch
    * against a dimension that already absorbed it). Tag file names must
    * start with `_` or `.` so Spark's file listing ignores them. */
  def overwriteTagged(name: String, df: DataFrame,
                      tags: Map[String, String]): Unit = {
    require(tags.keys.forall(t => t.startsWith("_") || t.startsWith(".")),
      s"tag files must be _/. prefixed (Spark must skip them): ${tags.keys.mkString(",")}")
    val tmp = Paths.get(root, s"$name.tmp")
    deleteRecursive(tmp)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    tags.foreach { case (f, content) =>
      Files.writeString(tmp.resolve(f), content) }
    deleteRecursive(dir(name))
    Files.move(tmp, dir(name))
  }

  /** Read a tag file written by [[overwriteTagged]], if present. */
  def readTag(name: String, tag: String): Option[String] = {
    val p = dir(name).resolve(tag)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  /** Recover a table from a crash inside the write-new → swap window
    * ([[overwrite]]/[[overwriteTagged]]/[[compact]]): if the table
    * directory is gone but `<name>.tmp` survives (the crash landed
    * between the delete and the move), move the tmp back in. Returns
    * true iff a recovery happened. Safe to call unconditionally at
    * startup for every swapped table; a healthy table (dir present) is
    * left untouched and a stale tmp BESIDE a healthy table is an
    * aborted write that never reached the delete — dropped, since the
    * live directory is the committed version. */
  def recover(name: String): Boolean = {
    val tmp = Paths.get(root, s"$name.tmp")
    if (!Files.exists(dir(name)) && Files.exists(tmp)) {
      Files.move(tmp, dir(name))
      true
    } else {
      if (Files.exists(dir(name))) deleteRecursive(tmp)
      false
    }
  }

  /** Replace exactly the partitions PRESENT IN `df`, leaving all other
    * partitions of the table untouched (Spark's dynamic partition
    * overwrite). This is the idempotent write primitive for
    * day-partitioned fact tables in a `foreachBatch` sink: a replayed
    * micro-batch re-derives the same day rows and overwrites its own
    * partition with identical content — append would double it. The
    * per-partition delete-then-write is not atomic; a crash mid-write
    * is healed by the replay itself (same batch, same partition,
    * rewritten whole). */
  def overwritePartitions(name: String, df: DataFrame,
                          partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty,
      "overwritePartitions needs partition columns; use overwrite for whole-table swap")
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(dir(name).toString)
  }

  def drop(name: String): Unit = deleteRecursive(dir(name))

  /** Number of parquet data files currently backing a table — the
    * fragmentation signal [[compactIfFragmented]] gates on. */
  def parquetFileCount(name: String): Int = {
    if (!exists(name)) 0
    else {
      val walk = Files.walk(dir(name))
      try walk.filter(_.toString.endsWith(".parquet")).count().toInt
      finally walk.close()
    }
  }

  /** Compact-behind gate for streaming drains: [[compact]] the table iff
    * its parquet file count exceeds `maxFiles`. File count — not commit
    * count — is the trigger, so the cadence self-regulates to append
    * granularity: a year of one-row daily audit appends compacts every
    * `maxFiles` days, while a drain that appends nothing never pays a
    * rewrite. Same single-writer contract as [[compact]]: call it from
    * the drain that owns the table, after the drain completes. Returns
    * true iff a compaction ran. */
  def compactIfFragmented(name: String, partitionCols: Seq[String] = Nil,
                          maxFiles: Int = 256,
                          targetFileBytes: Long = 128L << 20): Boolean = {
    val n = parquetFileCount(name)
    if (n > maxFiles) { compact(name, partitionCols, targetFileBytes); true }
    else false
  }

  /** Compact a table's small files into ~`targetFileBytes`-sized ones.
    * Daily appends leave one file-set per batch; a year of days makes
    * every scan open hundreds of tiny files (at cluster scale: NameNode
    * /object-store metadata pressure and per-file open latency dominate
    * the read). Rewrites through the write-new → swap path shared with
    * [[overwrite]]; for a partitioned table pass `partitionCols` — rows
    * re-bucket BY partition so each task writes whole files into its
    * partition directories and the layout is preserved. Run it off-peak
    * at a cadence matching append volume; appends after the swap are new
    * small files again (the usual compact-behind pattern).
    *
    * Concurrency contract: compact (and overwrite) must be SERIALIZED
    * with writers to the same table — an append landing between the
    * source materialization and the delete-then-move swap is lost, and
    * the swap itself is two filesystem ops, not one atomic rename. If a
    * crash lands between them the data survives solely at `<name>.tmp`;
    * recovery = [[recover]] (moves `<name>.tmp` back). A cluster deployment
    * gets real atomicity from a table format's commit protocol; this
    * layer deliberately keeps the single-writer filesystem shape. */
  def compact(name: String, partitionCols: Seq[String] = Nil,
              targetFileBytes: Long = 128L << 20): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val src = dir(name)
    val walk = Files.walk(src)
    val bytes =
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .mapToLong(p => Files.size(p)).sum()
      finally walk.close()
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = read(name)
    val arranged =
      if (partitionCols.nonEmpty)
        df.repartition(nFiles, partitionCols.map(col): _*)
      else df.repartition(nFiles)
    val tmp = Paths.get(root, s"$name.tmp")
    deleteRecursive(tmp)
    arranged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(tmp.toString)
    deleteRecursive(src)
    Files.move(tmp, src)
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }

  /** META_LOADING audit sink (`comm_funcs.py:13-18`). */
  def logMeta(tableName: String, eventDt: Date, rowsProcessed: Long,
              status: String = "SUCCESS"): Unit = {
    val row = Row(tableName, eventDt, rowsProcessed.toInt, status)
    append("meta_loading", spark.createDataFrame(
      java.util.List.of(row), Schemas.metaLoading))
  }
}
