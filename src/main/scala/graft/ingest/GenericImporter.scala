package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDate

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions
import graft.model._
import graft.registry.DatasetRegistry

/** S3: directory scan with regex file-pattern match — the reference's
  * `os.listdir` + `re.match(file_pattern)` loop
  * (generic_import.py:520-545). Listing is driver-side (it's a
  * control-plane operation over one landing directory); the matched
  * paths are then read as one distributed scan.
  */
object FilePatternScanner {
  def scan(directory: String, pattern: String): Seq[Path] = {
    val dir = Paths.get(directory)
    if (!Files.isDirectory(dir)) return Seq.empty
    val re: Regex = pattern.r
    Files
      .list(dir)
      .iterator()
      .asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => re.findPrefixOf(p.getFileName.toString).isDefined) // re.match semantics
      .toSeq
      .sortBy(_.getFileName.toString)
  }
}

/** Per-file import outcome. */
final case class FileResult(
    file: String,
    datasetid: Long,
    status: DatasetStatus,
    rowsLoaded: Long,
    newColumns: Seq[String],
    truncated: Map[String, Long]
)

final case class ImportResult(files: Seq[FileResult]) {
  def loadedRows: Long = files.map(_.rowsLoaded).sum
}

/** The generic file importer — the engine's core ingestion path,
  * re-expressing `systemscripts/generic_import.py` (see SURVEY.md §3.1)
  * Spark-first:
  *
  *  1. discover files (regex pattern, S3);
  *  2. per file: extract label + dataset date from the filename (T4/T5),
  *     register a dataset version (Q22/Q29) — displacing prior actives
  *     (the single-active invariant, Q23/Q27);
  *  3. branch: invalid-marker file (T9) or headerless/0-row file (T12)
  *     → mark the dataset Empty and archive;
  *  4. otherwise: read CSV all-string (S1, schema-on-write parity),
  *     normalize headers (T1), stamp `datasetid` + metadata columns
  *     (T3), reconcile against the target schema per the configured
  *     strategy (T2/Q25/Q26), optionally enforce VARCHAR-length
  *     truncation (T6), append to the target (K1), archive the file
  *     (K5).
  *
  * Scale design: the target table is parquet partitioned by
  * `datasetid`, so registry-driven version pruning is file pruning;
  * appends never rewrite existing data; schema evolution is
  * mergeSchema-on-read over the union of partition schemas.
  */
final class GenericImporter(
    spark: SparkSession,
    registry: DatasetRegistry,
    warehouse: String,
    enforceLengths: Boolean = false,
    today: () => LocalDate = () => LocalDate.now(),
    xlsConverter: XlsConverter = new XlsxConverter
) {

  val InvalidMarker = "Invalid Event ID"

  private def targetPath(table: String): String =
    s"$warehouse/${table.replace('.', '_')}"

  def run(config: ImportConfig, typeId: Int, sourceId: Int): ImportResult = {
    require(config.isActive, s"config ${config.configId} is inactive")
    val files = FilePatternScanner.scan(config.sourceDirectory, config.filePattern)
    ImportResult(files.map(f => importFile(config, f, typeId, sourceId)))
  }

  def importFile(config: ImportConfig, file: Path, typeId: Int, sourceId: Int): FileResult = {
    // S2: XLS/XLSX go through the converter seam first (the reference
    // shells into xls_to_csv, generic_import.py:648-649); the stub
    // passthrough handles CSV-shaped test payloads
    // An over-cap spreadsheet must not be buffered OR passed through to
    // the CSV reader — it registers as Failed and archives below.
    val (readable, oversized) =
      if (config.fileType == "XLS" || config.fileType == "XLSX")
        try (xlsConverter.toCsv(file), false)
        catch {
          case _: OversizedSpreadsheetException => (file, true)
          case _: Exception => (file, false)
        }
      else (file, false)
    try doImportFile(config, file, readable, typeId, sourceId, oversized)
    finally
      // the temp CSV is removed once the load completes
      // (generic_import.py:697-704)
      if (readable != file) Files.deleteIfExists(readable)
  }

  private def doImportFile(
      config: ImportConfig,
      file: Path,
      readable: Path,
      typeId: Int,
      sourceId: Int,
      oversized: Boolean = false
  ): FileResult = {
    val fname = file.getFileName.toString
    val label = Functions
      .parseMetadata(fname, config.labelSource, config.labelLocation, config.delimiter)
      .getOrElse(fname)
    val dateTok =
      Functions.parseMetadata(fname, config.dateSource, config.dateLocation, config.delimiter)
    val dsDate = java.sql.Date.valueOf(
      Functions.parseDatasetDate(dateTok, config.dateFormat.getOrElse("yyyyMMdd'T'HHmmss"), today())
    )
    // Register first (reference inserts the dataset row before reading
    // the file: generic_import.py:585-604), then branch on content.
    val id = registry.insert(dsDate, label, typeId, sourceId)

    if (oversized) {
      registry.setStatus(id, DatasetStatus.Failed)
      archive(file, config)
      return FileResult(fname, id, DatasetStatus.Failed, 0, Nil, Map.empty)
    }

    val df0 =
      try readAllString(readable)
      catch {
        case _: Exception =>
          registry.setStatus(id, DatasetStatus.Empty)
          archive(file, config)
          return FileResult(fname, id, DatasetStatus.Empty, 0, Nil, Map.empty)
      }

    // T9 invalid-content + T12 headerless/empty branches → Empty + archive
    val isEmptyBranch =
      df0.columns.isEmpty || df0.isEmpty ||
        ((config.fileType == "XLS" || config.fileType == "XLSX") &&
          Functions.containsMarker(df0, InvalidMarker))
    if (isEmptyBranch) {
      registry.setStatus(id, DatasetStatus.Empty)
      archive(file, config)
      return FileResult(fname, id, DatasetStatus.Empty, 0, Nil, Map.empty)
    }

    val normalized = Functions.normalizeColumns(df0)
    val stamped = normalized.withColumn("datasetid", lit(id))

    val tgt = targetPath(config.targetTable)
    val existing = existingColumns(tgt)
    val (toWrite, newCols) = reconcile(stamped, existing, config.strategy) match {
      case Right(v) => v
      case Left(_) =>
        registry.setStatus(id, DatasetStatus.Failed)
        archive(file, config)
        return FileResult(fname, id, DatasetStatus.Failed, 0, Nil, Map.empty)
    }

    val (finalDf, truncated) =
      if (enforceLengths) {
        val dataCols = toWrite.columns.filterNot(_ == "datasetid")
        val lengths = Functions.inferLengths(toWrite.select(dataCols.map(c => col(s"`$c`")): _*))
        (Functions.truncateTo(toWrite, lengths), Functions.truncationCounts(toWrite, lengths))
      } else (toWrite, Map.empty[String, Long])

    val rows = finalDf.count()
    if (rows == 0) {
      registry.setStatus(id, DatasetStatus.Empty)
      archive(file, config)
      return FileResult(fname, id, DatasetStatus.Empty, 0, Nil, Map.empty)
    }

    finalDf.write
      .mode(SaveMode.Append)
      .partitionBy("datasetid")
      .parquet(tgt)
    archive(file, config)
    FileResult(fname, id, DatasetStatus.Active, rows, newCols, truncated)
  }

  /** Read the target table with schema merged across all dataset
    * partitions (Q26 evolution: later datasets may add columns).
    */
  def readTarget(table: String): DataFrame =
    // partition-dir inference types datasetid as int; pin it to long so
    // reads join/prune against the registry without implicit casts
    spark.read
      .option("mergeSchema", "true")
      .parquet(targetPath(table))
      .withColumn("datasetid", col("datasetid").cast("long"))

  def targetExists(table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(targetPath(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** S1 parity: header row is the schema, every payload column lands as
    * a string (inferSchema stays off by design — schema-on-write with
    * all-VARCHAR columns is the reference's model, SURVEY §1.2).
    */
  private def readAllString(file: Path): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(file.toString)

  private def existingColumns(tgt: String): Option[Seq[String]] = {
    val p = new org.apache.hadoop.fs.Path(tgt)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.option("mergeSchema", "true").parquet(tgt).columns.toSeq)
    else None
  }

  /** Strategy semantics (create_importconfig_table.sql:13-17):
    *  - Evolve: first import defines the table; later imports may add
    *    columns (union schema via partitioned parquet + mergeSchema);
    *  - IgnoreNew: project to the existing target columns only
    *    (case-insensitive, T2); absent target columns become null;
    *  - FailOnMissing: error when the source lacks a target column.
    * Returns (frame-to-write, newly-added column names).
    */
  private def reconcile(
      df: DataFrame,
      existing: Option[Seq[String]],
      strategy: ImportStrategy
  ): Either[String, (DataFrame, Seq[String])] = existing match {
    case None => Right((df, df.columns.filterNot(_ == "datasetid").toSeq))
    case Some(tgtCols) =>
      val dataTgt = tgtCols.filterNot(_ == "datasetid")
      val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
      val missing = dataTgt.filterNot(t => byLower.contains(t.toLowerCase))
      val extra = df.columns
        .filterNot(_ == "datasetid")
        .filterNot(c => dataTgt.exists(_.equalsIgnoreCase(c)))
      strategy match {
        case ImportStrategy.FailOnMissing if missing.nonEmpty =>
          Left(s"source missing target columns: ${missing.mkString(", ")}")
        case ImportStrategy.IgnoreNew | ImportStrategy.FailOnMissing =>
          val cols = dataTgt.map { t =>
            byLower.get(t.toLowerCase) match {
              case Some(s) => col(s"`$s`").as(t)
              case None    => lit(null).cast("string").as(t)
            }
          } :+ col("datasetid")
          Right((df.select(cols: _*), Nil))
        case ImportStrategy.Evolve =>
          // keep matched columns under target casing + append new ones
          val cols = dataTgt.flatMap(t => byLower.get(t.toLowerCase).map(s => col(s"`$s`").as(t))) ++
            extra.map(c => col(s"`$c`")) :+ col("datasetid")
          val sel = df.select(cols: _*)
          Right((sel, extra.toSeq))
      }
  }

  /** K5: post-commit archive move (generic_import.py:780-796); chmod/
    * chown of the reference are environment-specific and intentionally
    * dropped.
    */
  private def archive(file: Path, config: ImportConfig): Unit = {
    val dst = Paths.get(config.archiveDirectory)
    Files.createDirectories(dst)
    Files.move(file, dst.resolve(file.getFileName), StandardCopyOption.REPLACE_EXISTING)
  }
}
