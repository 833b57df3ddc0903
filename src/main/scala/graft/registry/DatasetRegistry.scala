package graft.registry

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{DatasetMeta, DatasetStatus}

/** The dataset registry — the keystone of the versioned data model
  * (SURVEY.md §1.1), a Spark-native `dba.tdataset`
  * (reference: onboarding/sql/dataset_setup.sql:122-139).
  *
  * Invariant (enforced app-side at generic_import.py:280-297 AND by
  * trigger at dataset_setup.sql:193-236 in the reference): at most one
  * ACTIVE dataset per (label, datasettypeid, datasetdate). Here the
  * invariant lives in the single writer path: every insert/update is a
  * serialized read-modify-overwrite of the registry table, which also
  * closes the SCD-2 `effthrudate` of displaced versions.
  *
  * Scale: the registry is control-plane metadata — thousands of rows
  * even when the fact tables are 100 TB. It is deliberately a
  * collect-and-rewrite table; fact tables are append-only and are
  * *pruned* through it (broadcast semi-join on `datasetid`, or
  * dynamic partition pruning when facts are partitioned by datasetid).
  */
final class DatasetRegistry(spark: SparkSession, path: String) {
  import spark.implicits._

  private val lock = new Object

  def load(): Dataset[DatasetMeta] =
    if (exists()) spark.read.parquet(path).as[DatasetMeta]
    else spark.emptyDataset[DatasetMeta]

  def exists(): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Register a new dataset version. Mirrors `dba.f_dataset_iu`
    * (dataset_setup.sql:252-348) + the app-side deactivation
    * (generic_import.py:280-297): the new row becomes the single
    * active version for its (label, type, date); displaced actives get
    * `isactive=false`, `effthrudate=now`, status Inactive.
    * Returns the allocated datasetid.
    */
  def insert(
      datasetdate: Date,
      label: String,
      datasettypeid: Int,
      datasourceid: Int,
      status: DatasetStatus = DatasetStatus.Active,
      createdby: String = "graft"
  ): Long = lock.synchronized {
    val now = new Timestamp(System.currentTimeMillis())
    val current = load().collect().toSeq
    val newId = if (current.isEmpty) 1L else current.map(_.datasetid).max + 1
    val makeActive = status == DatasetStatus.Active
    val displaced = current.map { m =>
      if (
        makeActive && m.isactive && m.label == label &&
        m.datasettypeid == datasettypeid && m.datasetdate == datasetdate
      )
        m.copy(
          isactive = false,
          effthrudate = Some(now),
          datastatusid = DatasetStatus.Inactive.id
        )
      else m
    }
    val row = DatasetMeta(
      datasetid = newId,
      datasetdate = datasetdate,
      label = label,
      datasettypeid = datasettypeid,
      datasourceid = datasourceid,
      datastatusid = status.id,
      efffromdate = now,
      effthrudate = None,
      isactive = makeActive,
      createddate = now,
      createdby = createdby
    )
    overwrite(displaced :+ row)
    newId
  }

  /** Update one dataset's status ONLY — `isactive` is untouched,
    * mirroring the reference's `update_dataset_empty_status`
    * (generic_import.py:307-311), which is a status-column UPDATE.
    * An Empty/Failed dataset that displaced a sibling at insert time
    * therefore REMAINS the active version of its (label, type, date)
    * — exactly the reference's registry state after a bad
    * re-delivery. Explicit deactivation is [[deactivate]].
    */
  def setStatus(datasetid: Long, status: DatasetStatus): Unit = lock.synchronized {
    overwrite(load().collect().toSeq.map { m =>
      if (m.datasetid == datasetid) m.copy(datastatusid = status.id) else m
    })
  }

  /** Explicitly deactivate a dataset, closing its SCD-2 window. */
  def deactivate(datasetid: Long): Unit = lock.synchronized {
    val now = new Timestamp(System.currentTimeMillis())
    overwrite(load().collect().toSeq.map { m =>
      if (m.datasetid == datasetid)
        m.copy(
          isactive = false,
          datastatusid = DatasetStatus.Inactive.id,
          effthrudate = Some(now))
      else m
    })
  }

  /** All currently-active dataset rows (Q-pattern: `isactive AND ...`
    * pre-filter every analytics query applies before touching facts).
    */
  def active(): Dataset[DatasetMeta] = load().filter(_.isactive)

  /** Full SCD-2 version history for one (label, type) — every version
    * ever registered, in effective order, with its window and status.
    */
  def history(label: String, datasettypeid: Int): Seq[DatasetMeta] =
    load()
      .filter(m => m.label == label && m.datasettypeid == datasettypeid)
      .collect()
      .sortBy(m => (m.datasetdate.getTime, m.efffromdate.getTime))
      .toSeq

  /** Latest active dataset date for a type — the reference's
    * `MAX(datasetdate)` scalar CTE (meetmax_url_download.py:52-58).
    */
  def latestActiveDate(datasettypeid: Int): Option[Date] =
    active()
      .filter(_.datasettypeid == datasettypeid)
      .collect()
      .map(_.datasetdate)
      .sortBy(_.getTime)
      .lastOption

  /** Resolve the active datasetids for (type, date) — broadcast these
    * into fact scans for version pruning.
    */
  def activeIds(datasettypeid: Int, date: Date): Seq[Long] =
    active()
      .filter(m => m.datasettypeid == datasettypeid && m.datasetdate == date)
      .collect()
      .map(_.datasetid)
      .toSeq

  /** Prune a fact frame to the latest active version of a type. The
    * id set is tiny → `isin` literal pushdown, which reaches parquet
    * row-group stats (and partition pruning when the fact table is
    * partitioned by datasetid).
    */
  def latestActiveFacts(facts: DataFrame, datasettypeid: Int): DataFrame =
    latestActiveDate(datasettypeid) match {
      case None => facts.limit(0)
      case Some(d) =>
        val ids = activeIds(datasettypeid, d)
        facts.filter(col("datasetid").isin(ids: _*))
    }

  private def overwrite(rows: Seq[DatasetMeta]): Unit = {
    // Registry rewrites go through a temp path + atomic-ish swap so a
    // reader never observes a half-written table.
    val tmp = path + ".tmp"
    spark.createDataset(rows).coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val hTmp = new org.apache.hadoop.fs.Path(tmp)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) fs.delete(hPath, true)
    fs.rename(hTmp, hPath)
  }
}
