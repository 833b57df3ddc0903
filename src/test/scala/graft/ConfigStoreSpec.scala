package graft

import java.nio.file.Files

import graft.ingest.ConfigStore
import graft.model._

class ConfigStoreSpec extends SparkSpec {

  private def cfg(id: Int, name: String) = ImportConfig(
    id, name, "MeetMax", "MeetMaxURL", "/data/in", "/data/archive",
    """\d{8}T\d{6}_X\.csv""", "CSV",
    MetaSource.Static, Some("X"),
    MetaSource.Filename, Some("0"), Some("yyyyMMdd'T'HHmmss"), Some("_"),
    "public.t_x", ImportStrategy.Evolve, isActive = true)

  test("configs round-trip through the store with validation; upsert replaces by id") {
    val store = new ConfigStore(spark, Files.createTempDirectory("graft-cfg") + "/configs")
    store.upsert(Seq(cfg(1, "first"), cfg(2, "second")))
    assert(store.activeConfigs().map(_.configName) == Seq("first", "second"))
    // typed fields survive the flat storage
    val c = store.get(1).get
    assert(c.labelSource == MetaSource.Static && c.strategy == ImportStrategy.Evolve)
    // upsert replaces by id, keeps others
    store.upsert(Seq(cfg(1, "first-v2").copy(isActive = false)))
    assert(store.get(1).get.configName == "first-v2")
    assert(store.activeConfigs().map(_.configId) == Seq(2))
  }

  test("invalid configs are rejected at write; corrupt rows surface as Lefts at read") {
    val store = new ConfigStore(spark, Files.createTempDirectory("graft-cfg2") + "/configs")
    val bad = cfg(3, "bad").copy(fileType = "PDF")
    val e = intercept[IllegalArgumentException](store.upsert(Seq(bad)))
    assert(e.getMessage.contains("file_type"))
    // a row corrupted at rest (e.g. edited by an external tool) reads
    // as Left instead of failing the whole load
    store.upsert(Seq(cfg(1, "ok")))
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = storePath(store)
    val corrupted = spark.read.parquet(path)
      .withColumn("labelSource", lit("bogus"))
    corrupted.write.mode("overwrite").parquet(path + ".bad")
    val store2 = new ConfigStore(spark, path + ".bad")
    val loaded = store2.loadAll()
    assert(loaded.length == 1 && loaded.head.isLeft)
    assert(store2.activeConfigs().isEmpty)
  }

  private def storePath(s: ConfigStore): String = {
    val f = s.getClass.getDeclaredField("path")
    f.setAccessible(true)
    f.get(s).asInstanceOf[String]
  }
}
