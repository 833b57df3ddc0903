package graft

import java.nio.file.Files

import graft.model.ScheduledTask
import graft.ops.Backup
import graft.registry.DatasetRegistry

class BackupSchedulerSpec extends SparkSpec {
  import spark.implicits._

  test("backup/restore round-trips a table; prune keeps the newest stamps") {
    val root = Files.createTempDirectory("graft-backup")
    val table = s"$root/t"
    Seq(1, 2, 3).toDF("v").write.parquet(table)
    Backup.backup(spark, table, s"$root/backups", "20260810")
    Backup.backup(spark, table, s"$root/backups", "20260811")
    // mutate live table, then restore the newest backup
    Seq(9).toDF("v").write.mode("overwrite").parquet(table)
    assert(spark.read.parquet(table).count() == 1)
    val newest = Backup.stamps(spark, s"$root/backups", "t").head
    assert(newest == "20260811")
    Backup.restore(spark, s"$root/backups/t/$newest", table)
    assert(spark.read.parquet(table).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // retention: keep 1 → the older stamp goes
    Backup.backup(spark, table, s"$root/backups", "20260812")
    val dropped = Backup.prune(spark, s"$root/backups", "t", keep = 1)
    assert(dropped == Seq("20260811", "20260810"))
    assert(Backup.stamps(spark, s"$root/backups", "t") == Seq("20260812"))
  }

  test("ScheduledTask cron validation mirrors the reference's 5-field shape") {
    val ok = ScheduledTask(1, "daily_download", None, "0 5 * * 1-5", "/x/dl.py", Some("2"), isActive = true)
    assert(ScheduledTask.validated(ok).isRight)
    assert(ScheduledTask.validated(ok.copy(frequency = "0 5 * *")).isLeft)      // 4 fields
    assert(ScheduledTask.validated(ok.copy(frequency = "0 5 * * mon")).isLeft)  // bad charset
    assert(ScheduledTask.validated(ok.copy(taskName = " ")).isLeft)
    assert(ScheduledTask.validated(ok.copy(frequency = "*/15 0-23 1,15 * *")).isRight)
  }

  test("registry history lists every version of a key in effective order") {
    val dir = Files.createTempDirectory("graft-hist").toString
    val reg = new DatasetRegistry(spark, s"$dir/registry")
    val d = java.sql.Date.valueOf("2025-04-01")
    val id1 = reg.insert(d, "A", 1, 1)
    val id2 = reg.insert(d, "A", 1, 1) // displaces id1
    reg.insert(java.sql.Date.valueOf("2025-04-02"), "A", 1, 1)
    reg.insert(d, "B", 1, 1) // other label — excluded
    val h = reg.history("A", 1)
    assert(h.map(_.datasetid) == Seq(id1, id2, h.last.datasetid))
    assert(!h.head.isactive && h.head.effthrudate.isDefined)
    assert(h(1).isactive)
  }
}
