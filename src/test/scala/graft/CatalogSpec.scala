package graft

import java.nio.file.Files

import graft.catalog.{FileMetastore, FieldType, SchemaField}
import graft.util.Retry

class CatalogSpec extends SparkTestBase {

  test("FileMetastore persists, lists, and round-trips schemas") {
    val root = Files.createTempDirectory("graft-ms").toString
    val ms = new FileMetastore(root)
    ms.createCollection("demo", "clicks",
      Seq(SchemaField("UserId", FieldType.LONG), SchemaField("Tags", FieldType.ARRAY(FieldType.STRING))))
    ms.createCollection("demo", "views", Seq(SchemaField("x", FieldType.DOUBLE)))
    assert(ms.listProjects == Seq("demo"))
    assert(ms.listCollections("demo") == Seq("clicks", "views"))
    val st = ms.schemaOf("demo", "clicks").get
    assert(st.fieldNames.toSeq == Seq("userid", "tags"))
    // a second instance over the same root sees the same state (durability)
    assert(new FileMetastore(root).schemaOf("demo", "views").isDefined)
    assert(ms.getCollection("demo", "nope").isEmpty)
  }

  test("JdbcMetastore (embedded Derby): same contract as InMemory/File") {
    val db = Files.createTempDirectory("graft-derby").resolve("ms").toString
    val url = s"jdbc:derby:$db;create=true"
    val ms = new graft.catalog.JdbcMetastore(url)
    val g0 = ms.generation
    ms.createCollection("demo", "clicks",
      Seq(SchemaField("UserId", FieldType.LONG), SchemaField("Tags", FieldType.ARRAY(FieldType.STRING))))
    ms.createCollection("demo", "views", Seq(SchemaField("x", FieldType.DOUBLE)))
    assert(ms.listProjects == Seq("demo"))
    assert(ms.listCollections("demo") == Seq("clicks", "views"))
    val st = ms.schemaOf("demo", "clicks").get
    assert(st.fieldNames.toSeq == Seq("userid", "tags"))
    assert(ms.getCollection("demo", "nope").isEmpty)
    // DDL bumps the generation (registration-cache contract)
    assert(ms.generation > g0)
    // re-create (schema evolution) replaces and bumps again
    val g1 = ms.generation
    ms.createCollection("demo", "clicks", Seq(SchemaField("UserId", FieldType.LONG)))
    assert(ms.schemaOf("demo", "clicks").get.fieldNames.toSeq == Seq("userid"))
    assert(ms.generation > g1)
    // a second instance over the same database sees the same state (durability)
    val ms2 = new graft.catalog.JdbcMetastore(url)
    assert(ms2.schemaOf("demo", "views").isDefined)
    assert(ms2.generation == ms.generation)
    // and the engine runs on it end-to-end
    val eng = new GraftEngine(spark, ms, graft.sources.ParquetEventSource(sfDir))
    ms.createCollection("jdbcproj", "orders",
      SchemaField.fromStructType(Tables.load(spark, sfDir, "orders").schema))
    assert(eng.sql("SELECT count(*) AS n FROM jdbcproj_orders").head().getLong(0) > 0)
  }

  test("JdbcMetastore migrates a legacy keyless graft_meta preserving the counter") {
    val db = Files.createTempDirectory("graft-derby-legacy").resolve("ms").toString
    val url = s"jdbc:derby:$db;create=true"
    // fabricate the pre-migration shape by hand
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE graft_meta (generation BIGINT NOT NULL)")
      st.execute("INSERT INTO graft_meta VALUES (7)")
      st.close()
    } finally c.close()
    val ms = new graft.catalog.JdbcMetastore(url)
    assert(ms.generation == 7L)
    ms.createCollection("p", "c", Seq(SchemaField("x", FieldType.LONG)))
    assert(ms.generation == 8L)
  }

  test("Retry: backs off with the reference's schedule, honors stopOn") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val policy = Retry.Policy(maxAttempts = 4, sleep = delays += _)
    val r = Retry("flaky", policy) {
      calls += 1
      if (calls < 4) throw new RuntimeException("transient")
      42
    }
    assert(r == 42 && calls == 4)
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L)) // 1s base, x2 (RetryDriver.java:31-34)

    var n = 0
    intercept[IllegalArgumentException] {
      Retry("fatal", policy.copy(stopOn = Seq(classOf[IllegalArgumentException]))) {
        n += 1; throw new IllegalArgumentException("no retry")
      }
    }
    assert(n == 1)
  }

  test("GraftConfig wires codec and metastore choices") {
    val cfg = GraftConfig(codec = "json", metastoreRoot = None)
    assert(cfg.payloadCodec == graft.sources.JsonPayloadCodec)
    intercept[IllegalArgumentException](GraftConfig(codec = "wat").payloadCodec)
    val eng = GraftConfig.kafkaEngine(spark, GraftConfig(kafkaNodes = "b:9092"))
    assert(eng.metastore.listProjects.isEmpty)
  }
}
