package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 wrapper over [[Xlsx]]: `spark.read.format("xlsx")
  * .load(pathOrGlob)`. One xlsx FILE is one input partition — a single
  * sheet is a zip of sequential XML and cannot split, so per-file is
  * the natural parallel unit; a directory of daily snapshot drops
  * (the reference's `terminals_DDMMYYYY.xlsx` cadence, main.py:70,78)
  * parses across the cluster instead of serializing through the
  * driver. Cells surface as nullable strings (the same raw layer
  * [[Xlsx.Sheet]] exposes — typing/serial-date decoding stays a
  * downstream concern, exactly as with a raw CSV read), plus a
  * `_file` column so multi-snapshot loads keep their provenance.
  * Column pruning is pushed down; columns resolve by HEADER NAME per
  * file, so files whose columns are ordered differently still align.
  */
final class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = XlsxDataSource.resolvePaths(options)
    require(paths.nonEmpty, s"no .xlsx files match ${XlsxDataSource.rawPaths(options).mkString(",")}")
    // schema = header of the first file (lexicographically — stable
    // across listings); per-file name resolution tolerates reordered
    // columns, a missing column in a later file fails loudly at read.
    // Resolved paths are scheme-qualified URIs — go through the Hadoop
    // FileSystem, not java.util.zip's local-path constructor.
    val header = XlsxDataSource.readVia(
      SparkSession.active.sessionState.newHadoopConf(), paths.head).header
    StructType(header.map(StructField(_, StringType, nullable = true)) :+
      StructField(XlsxDataSource.FileColumn, StringType, nullable = false))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XlsxTable(schema,
      XlsxDataSource.resolvePaths(new CaseInsensitiveStringMap(properties)))
}

object XlsxDataSource {
  val FileColumn = "_file"

  /** Open a (possibly scheme-qualified) path through the Hadoop
    * FileSystem and parse it — shared by driver-side schema inference
    * and the executor-side partition reader. */
  private[sources] def readVia(conf: Configuration, path: String): Xlsx.Sheet = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(conf)
    val in = fs.open(hPath)
    val bytes = try in.readAllBytes() finally in.close()
    Xlsx.readBytes(bytes, context = path)
  }

  private[sources] def rawPaths(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("paths"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(Option(options.get("path")).map(Seq(_)))
      .getOrElse(Seq.empty)

  /** Expand globs and directories to concrete `.xlsx` files. */
  private[sources] def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    rawPaths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(s => s.isFile &&
            s.getPath.getName.toLowerCase.endsWith(".xlsx")).map(_.getPath)
        else Seq(st.getPath)
      }
    }.map(_.toString).distinct.sorted
  }
}

private final class XlsxTable(schema: StructType, paths: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"xlsx(${paths.take(3).mkString(",")}${if (paths.size > 3) ",…" else ""})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(schema, paths)
}

private final class XlsxScanBuilder(fullSchema: StructType, paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new XlsxScan(required, paths)
}

private final class XlsxScan(requiredSchema: StructType, paths: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"XlsxScan [${paths.size} file(s), columns: ${requiredSchema.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => XlsxInputPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // hadoop Configuration is not Serializable — ship the key/values
    // the executor needs to re-open the right FileSystem
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val confMap = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    XlsxReaderFactory(requiredSchema, confMap)
  }
}

private final case class XlsxInputPartition(path: String) extends InputPartition

private final case class XlsxReaderFactory(
    requiredSchema: StructType,
    confMap: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[XlsxInputPartition]
    new XlsxPartitionReader(p.path, requiredSchema, confMap)
  }
}

/** Executor-side reader: pulls the file's bytes through the Hadoop
  * FileSystem (works for local, HDFS, object stores), parses with the
  * shared [[Xlsx.readBytes]], and projects the pruned columns by
  * header name. */
private final class XlsxPartitionReader(
    path: String,
    requiredSchema: StructType,
    confMap: Map[String, String]) extends PartitionReader[InternalRow] {

  private var rows: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def ensureOpen(): Unit = if (rows == null) {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val sheet = XlsxDataSource.readVia(conf, path)
    val fileValue = UTF8String.fromString(path)
    val lookups: Array[Int => Any] = requiredSchema.fieldNames.map { name =>
      if (name == XlsxDataSource.FileColumn) (_: Int) => fileValue
      else {
        val idx = sheet.header.indexOf(name)
        require(idx >= 0, s"column '$name' missing in $path " +
          s"(header: ${sheet.header.mkString(",")})")
        (r: Int) => sheet.rows(r).lift(idx).flatten
          .map(UTF8String.fromString).orNull
      }
    }
    rows = Iterator.range(0, sheet.rows.size).map { r =>
      InternalRow.fromSeq(lookups.toIndexedSeq.map(f => f(r)))
    }
  }

  override def next(): Boolean = {
    ensureOpen()
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
