package graft.ingest

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.model.{ImportConfig, ImportStrategy, MetaSource}

/** The config-table surface (SURVEY §1.1: "config tables as the API").
  * Import configs live as rows in a small parquet table — the
  * `dba.timportconfig` analog — and load as validated case classes;
  * invalid rows are rejected at read time the way the reference's
  * CHECK constraints reject them at INSERT
  * (create_importconfig_table.sql:28-50).
  *
  * Stored flat (all-string sources/strategies) so the table is
  * editable by any tool; the typed view is constructed on load.
  */
/** Flat storage row (top-level: Spark encoders cannot handle inner
  * classes of live objects).
  */
private[ingest] case class ConfigRow(
    configId: Int, configName: String, datasource: String, datasettype: String,
    sourceDirectory: String, archiveDirectory: String, filePattern: String,
    fileType: String, labelSource: String, labelLocation: Option[String],
    dateSource: String, dateLocation: Option[String], dateFormat: Option[String],
    delimiter: Option[String], targetTable: String, strategyId: Int, isActive: Boolean)

final class ConfigStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def toRow(c: ImportConfig) = ConfigRow(
    c.configId, c.configName, c.datasource, c.datasettype,
    c.sourceDirectory, c.archiveDirectory, c.filePattern, c.fileType,
    metaName(c.labelSource), c.labelLocation,
    metaName(c.dateSource), c.dateLocation, c.dateFormat,
    c.delimiter, c.targetTable, c.strategy.id, c.isActive)

  private def metaName(m: MetaSource): String = m match {
    case MetaSource.Filename    => "filename"
    case MetaSource.FileContent => "file_content"
    case MetaSource.Static      => "static"
  }

  private def fromRow(r: ConfigRow): Either[List[String], ImportConfig] =
    for {
      label <- MetaSource.parse(r.labelSource).left.map(List(_))
      date <- MetaSource.parse(r.dateSource).left.map(List(_))
      strat <- ImportStrategy.byId(r.strategyId).left.map(List(_))
      cfg <- ImportConfig.validated(ImportConfig(
        r.configId, r.configName, r.datasource, r.datasettype,
        r.sourceDirectory, r.archiveDirectory, r.filePattern, r.fileType,
        label, r.labelLocation, date, r.dateLocation, r.dateFormat,
        r.delimiter, r.targetTable, strat, r.isActive))
    } yield cfg

  /** Insert-or-replace by configId (the reference's upsert procs,
    * create_importconfig_table.sql:78-139). Configs must validate.
    */
  def upsert(configs: Seq[ImportConfig]): Unit = {
    configs.foreach(c =>
      ImportConfig.validated(c).left.foreach(errs =>
        throw new IllegalArgumentException(
          s"config ${c.configId} invalid: ${errs.mkString("; ")}")))
    val ids = configs.map(_.configId).toSet
    val existing = loadRaw().filterNot(r => ids.contains(r.configId))
    write(existing ++ configs.map(toRow))
  }

  /** All configs, with per-row validation results — bad rows surface
    * as Lefts instead of poisoning the batch.
    */
  def loadAll(): Seq[Either[List[String], ImportConfig]] = loadRaw().map(fromRow)

  /** Active, valid configs only — what a scheduler iterates. */
  def activeConfigs(): Seq[ImportConfig] =
    loadAll().collect { case Right(c) if c.isActive => c }

  def get(configId: Int): Option[ImportConfig] =
    loadAll().collectFirst { case Right(c) if c.configId == configId => c }

  private def loadRaw(): Seq[ConfigRow] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else spark.read.parquet(path).as[ConfigRow].collect().toSeq.sortBy(_.configId)
  }

  private def write(rows: Seq[ConfigRow]): Unit = {
    val tmp = path + ".tmp"
    spark.createDataset(rows).coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }
}
