package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.mesh.EntityResolver
import graft.sources.GraftDataSource

/** DSv2 connector semantics: results equal the DataFrame resolver path;
  * filter pushdown classifies Exact vs Unsupported like the webengine
  * (P1-P4); null-padding and per-branch limits flow through the reader. */
class GraftSourceSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private val fileCols = Set("event_id", "ts", "user_id", "event_type", "value", "props")

  private def eventlogMesh: Mesh = {
    val entity = Entity("eventlog", Seq(
      Information("event_id", LongType),
      Information("etype", StringType),
      Information("val100", DoubleType),
      Information("ts", TimestampType),
      Information("missing_info", StringType)))
    def src(id: String, view: String, rows: String) = DataSource(
      id = id,
      sourceSql = s"SELECT * FROM $view",
      mappings = Seq(
        FieldMapping("event_id", "event_id"),
        FieldMapping("etype", "event_type"),
        FieldMapping("val100", "value", Transformation("{v} * 100")),
        FieldMapping("ts", "ts")),  // events.ts is parquet timestamp[us]: identity
      defaultPermission = SourcePermission(fileCols, rows),
      fileSource = Some(FileSource("parquet", s"${TestSessions.sfDir}/events.parquet")),
      viewName = Some(view))
    Mesh(Map("edge" -> Site("edge",
      entities = Map("eventlog" -> entity),
      localSources = Map("eventlog" -> Seq(
        src("edge_clicks", "events_raw_a", "event_type IN ('click', 'view')"),
        src("edge_other", "events_raw_b", "event_type NOT IN ('click', 'view')"))))))
  }

  private def dsv2(options: (String, String)*) = {
    GraftDataSource.registry.put("test_edge", eventlogMesh)
    var r = spark.read.format("graft")
      .option("mesh", "test_edge").option("site", "edge").option("entity", "eventlog")
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("DSv2 scan equals the DataFrame resolver path (incl. null-padding)") {
    // the resolver reads ts nanos as LongType via its own registration path;
    // align by disabling the raw-view memoization interference
    val viaDsv2 = dsv2()
    val viaResolver = EntityResolver.resolve(
      spark, eventlogMesh, "edge", "eventlog", None)
    assert(viaDsv2.count() == spark.read.parquet(s"${TestSessions.sfDir}/events.parquet").count())
    assert(viaDsv2.exceptAll(viaResolver).count() == 0)
    assert(viaResolver.exceptAll(viaDsv2).count() == 0)
    assert(viaDsv2.where(col("missing_info").isNotNull).count() == 0)
  }

  test("filter pushdown: simple comparisons Exact, complex Unsupported (P2/P3)") {
    val df = dsv2()
      .where(col("val100") > 5000.0 && col("etype").startsWith("cl"))
    df.collect()
    val scanDesc = df.queryExecution.executedPlan.toString
    // pushed: the comparison; not pushed: StartsWith (re-applied by Spark)
    assert(scanDesc.contains("GreaterThan(val100,5000.0)"), scanDesc)
    assert(!scanDesc.replaceAll("(?s)Filter .*", "").contains("StringStartsWith"),
      "StartsWith must not be claimed as pushed")
    // correctness: equals resolver with the same predicate
    val expect = EntityResolver.resolve(spark, eventlogMesh, "edge", "eventlog", None)
      .where(col("val100") > 5000.0 && col("etype").startsWith("cl"))
    assert(df.exceptAll(expect).count() == 0 && expect.exceptAll(df).count() == 0)
  }

  test("per-branch limit pushdown (P4) and global limit") {
    val df = dsv2().limit(3)
    assert(df.count() == 3)
  }

  test("derived-column source SQL composes into the scan (resolver equality)") {
    val entity = Entity("li", Seq(
      Information("orderkey", LongType),
      Information("qty", DoubleType),
      Information("unitprice", DoubleType)))
    val src = DataSource(
      id = "li_parquet",
      // derived column + WHERE: both must fold into the per-row scan exprs
      sourceSql = "SELECT *, l_extendedprice / l_quantity AS unitprice_phys " +
        "FROM li_raw WHERE l_orderkey % 3 = 0",
      mappings = Seq(
        FieldMapping("orderkey", "l_orderkey"),
        FieldMapping("qty", "l_quantity", Transformation("{v} * 2")),
        FieldMapping("unitprice", "unitprice_phys")),
      defaultPermission = SourcePermission(
        Set("l_orderkey", "l_quantity", "unitprice_phys"), "l_returnflag = 'N'"),
      fileSource = Some(FileSource("parquet", s"${TestSessions.sfDir}/lineitem.parquet")),
      viewName = Some("li_raw"))
    val mesh = Mesh(Map("edge" -> Site("edge",
      entities = Map("li" -> entity),
      localSources = Map("li" -> Seq(src)))))
    GraftDataSource.registry.put("test_derived", mesh)
    val viaDsv2 = spark.read.format("graft")
      .option("mesh", "test_derived").option("site", "edge").option("entity", "li")
      .load()
    val viaResolver = EntityResolver.resolve(spark, mesh, "edge", "li", None)
    assert(viaDsv2.count() > 0)
    assert(viaDsv2.exceptAll(viaResolver).count() == 0)
    assert(viaResolver.exceptAll(viaDsv2).count() == 0)
    // pushed predicate composes THROUGH the derived column
    val filtered = viaDsv2.where(col("unitprice") > 1000.0)
    val expect = viaResolver.where(col("unitprice") > 1000.0)
    assert(filtered.exceptAll(expect).count() == 0 &&
      expect.exceptAll(filtered).count() == 0)
  }

  test("CSV branches serve through the connector (resolver equality)") {
    val csvDir = java.nio.file.Files.createTempDirectory("graft_dsv2_csv").toString
    spark.read.parquet(s"${TestSessions.sfDir}/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
        col("l_shipdate"))
      .write.mode("overwrite").option("header", "true").csv(csvDir)
    val entity = Entity("licsv", Seq(
      Information("orderkey", LongType),
      Information("qty", DoubleType),
      Information("flag", StringType),
      Information("shipped", DateType)))
    val src = DataSource(
      id = "li_csv",
      sourceSql = "SELECT *, l_quantity * 2 AS q2 FROM li_csv_raw",
      mappings = Seq(
        FieldMapping("orderkey", "l_orderkey"),
        FieldMapping("qty", "q2"),
        FieldMapping("flag", "l_returnflag"),
        FieldMapping("shipped", "l_shipdate", Transformation("CAST({v} AS DATE)"))),
      defaultPermission = SourcePermission(
        Set("l_orderkey", "q2", "l_returnflag", "l_shipdate"), "l_quantity > 10"),
      fileSource = Some(FileSource("csv", csvDir)),
      viewName = Some("li_csv_raw"))
    val mesh = Mesh(Map("edge" -> Site("edge",
      entities = Map("licsv" -> entity),
      localSources = Map("licsv" -> Seq(src)))))
    GraftDataSource.registry.put("test_csv", mesh)
    val viaDsv2 = spark.read.format("graft")
      .option("mesh", "test_csv").option("site", "edge").option("entity", "licsv")
      .load()
    val viaResolver = EntityResolver.resolve(spark, mesh, "edge", "licsv", None)
    assert(viaDsv2.count() > 0)
    assert(viaDsv2.exceptAll(viaResolver).count() == 0)
    assert(viaResolver.exceptAll(viaDsv2).count() == 0)
  }

  test("JSON branches with $.-path fields serve through the connector (resolver equality)") {
    val jsonDir = java.nio.file.Files.createTempDirectory("graft_dsv2_json").toString
    // JSON-lines with a NESTED object column: `k` maps from the DataField
    // path `$.props.k` (the reference's nested-path contract); doc 7 leaves
    // props.k absent -> NULL through get_json_object on both paths
    spark.read.parquet(s"${TestSessions.sfDir}/events.parquet")
      .limit(200)
      .select(col("event_id"), col("event_type"),
        when(col("event_id") % 10 =!= 7,
          struct((col("event_id") % 5).as("k"), col("user_id").as("u")))
          .as("props"))
      .coalesce(1).write.mode("overwrite").json(jsonDir)
    val entity = Entity("jevents", Seq(
      Information("event_id", LongType),
      Information("etype", StringType),
      Information("k", LongType)))
    val src = DataSource(
      id = "events_json",
      sourceSql = "SELECT * FROM jev_raw",
      mappings = Seq(
        FieldMapping("event_id", "event_id"),
        FieldMapping("etype", "event_type"),
        FieldMapping("k", "$.props.k")),
      defaultPermission = SourcePermission(
        Set("event_id", "event_type", "props"), "event_id % 3 <> 1"),
      fileSource = Some(FileSource("json", jsonDir)),
      viewName = Some("jev_raw"))
    val mesh = Mesh(Map("edge" -> Site("edge",
      entities = Map("jevents" -> entity),
      localSources = Map("jevents" -> Seq(src)))))
    GraftDataSource.registry.put("test_json", mesh)
    val viaDsv2 = spark.read.format("graft")
      .option("mesh", "test_json").option("site", "edge").option("entity", "jevents")
      .load()
    val viaResolver = EntityResolver.resolve(spark, mesh, "edge", "jevents", None)
    assert(viaDsv2.count() > 0)
    // the JSON-path field extracts real values (not all-NULL) and the
    // absent-subfield rows null out on both paths
    assert(viaDsv2.where(col("k").isNotNull).count() > 0)
    assert(viaDsv2.where(col("k").isNull).count() > 0)
    assert(viaDsv2.exceptAll(viaResolver).count() == 0)
    assert(viaResolver.exceptAll(viaDsv2).count() == 0)
    // pushdown on a scalar column still classifies Exact over a JSON branch
    val filtered = viaDsv2.where(col("event_id") > 50L)
    val scanDesc = filtered.queryExecution.executedPlan.toString
    assert(scanDesc.contains("GreaterThan(event_id,50)"), scanDesc)
    val expect = viaResolver.where(col("event_id") > 50L)
    assert(filtered.exceptAll(expect).count() == 0 &&
      expect.exceptAll(filtered).count() == 0)
  }

  test("CSV reader honors header/sep options like the inference path") {
    val csvDir = java.nio.file.Files.createTempDirectory("graft_dsv2_csvopt").toString
    spark.read.parquet(s"${TestSessions.sfDir}/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite")
      .option("header", "false").option("sep", ";").csv(csvDir)
    val opts = Map("header" -> "false", "sep" -> ";")
    val entity = Entity("linoh", Seq(
      Information("orderkey", LongType),
      Information("qty", DoubleType)))
    val src = DataSource(
      id = "li_csv_noheader",
      sourceSql = "SELECT * FROM linoh_raw",
      // headerless inference names columns _c0, _c1
      mappings = Seq(
        FieldMapping("orderkey", "_c0"), FieldMapping("qty", "_c1")),
      defaultPermission = SourcePermission(Set("_c0", "_c1"), "true"),
      fileSource = Some(FileSource("csv", csvDir, opts)),
      viewName = Some("linoh_raw"))
    val mesh = Mesh(Map("edge" -> Site("edge",
      entities = Map("linoh" -> entity),
      localSources = Map("linoh" -> Seq(src)))))
    GraftDataSource.registry.put("test_csvopt", mesh)
    val viaDsv2 = spark.read.format("graft")
      .option("mesh", "test_csvopt").option("site", "edge").option("entity", "linoh")
      .load()
    val viaResolver = EntityResolver.resolve(spark, mesh, "edge", "linoh", None)
    assert(viaDsv2.count() ==
      spark.read.parquet(s"${TestSessions.sfDir}/lineitem.parquet").count())
    assert(viaDsv2.exceptAll(viaResolver).count() == 0)
    assert(viaResolver.exceptAll(viaDsv2).count() == 0)
  }

  test("CSV quoting/escaping from Spark's own writer reads back exactly") {
    import spark.implicits._
    val csvDir = java.nio.file.Files.createTempDirectory("graft_dsv2_csvq").toString
    Seq(
      (1L, """plain text"""),
      (2L, """comma, inside"""),
      (3L, """has "quoted" words"""),
      (4L, """mix, of "both", even"""),
      (5L, """trailing backslash \""")).toDF("id", "txt")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
    val entity = Entity("qcsv", Seq(
      Information("id", LongType), Information("txt", StringType)))
    val src = DataSource(
      id = "quoted_csv",
      sourceSql = "SELECT * FROM qcsv_raw",
      mappings = Seq(FieldMapping("id", "id"), FieldMapping("txt", "txt")),
      defaultPermission = SourcePermission(Set("id", "txt"), "true"),
      fileSource = Some(FileSource("csv", csvDir)),
      viewName = Some("qcsv_raw"))
    val mesh = Mesh(Map("edge" -> Site("edge",
      entities = Map("qcsv" -> entity),
      localSources = Map("qcsv" -> Seq(src)))))
    GraftDataSource.registry.put("test_csvq", mesh)
    val viaDsv2 = spark.read.format("graft")
      .option("mesh", "test_csvq").option("site", "edge").option("entity", "qcsv")
      .load()
    val viaResolver = EntityResolver.resolve(spark, mesh, "edge", "qcsv", None)
    assert(viaDsv2.count() == 5)
    assert(viaDsv2.exceptAll(viaResolver).count() == 0)
    assert(viaResolver.exceptAll(viaDsv2).count() == 0)
  }

  test("unsupported reader options fail at plan time, not with wrong data") {
    val csvDir = java.nio.file.Files.createTempDirectory("graft_dsv2_badopt").toString
    spark.read.parquet(s"${TestSessions.sfDir}/nation.parquet")
      .write.mode("overwrite").option("header", "true").csv(csvDir)
    val entity = Entity("bad", Seq(Information("k", LongType)))
    def meshWith(opts: Map[String, String]) = Mesh(Map("edge" -> Site("edge",
      entities = Map("bad" -> entity),
      localSources = Map("bad" -> Seq(DataSource(
        id = "bad_src", sourceSql = "SELECT * FROM bad_raw",
        mappings = Seq(FieldMapping("k", "n_nationkey")),
        defaultPermission = SourcePermission(Set("n_nationkey"), "true"),
        fileSource = Some(FileSource("csv", csvDir, opts)),
        viewName = Some("bad_raw")))))))
    // multi-char sep: silently-wrong parses are forbidden — loud failure
    GraftDataSource.registry.put("test_badopt", meshWith(Map("sep" -> "||")))
    val err = intercept[Exception] {
      spark.read.format("graft")
        .option("mesh", "test_badopt").option("site", "edge").option("entity", "bad")
        .load().collect()
    }
    assert(err.getMessage.contains("resolver path"), err.getMessage)
  }

  test("JSON branches serve through the connector (resolver equality)") {
    val jsonDir = java.nio.file.Files.createTempDirectory("graft_dsv2_json").toString
    spark.read.parquet(s"${TestSessions.sfDir}/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite").json(jsonDir)
    val entity = Entity("jord", Seq(
      Information("okey", LongType),
      Information("total_cents", LongType),
      Information("status", StringType)))
    val src = DataSource(
      id = "orders_json",
      sourceSql = "SELECT * FROM ord_json_raw WHERE o_orderstatus <> 'F'",
      mappings = Seq(
        FieldMapping("okey", "o_orderkey"),
        FieldMapping("total_cents", "o_totalprice",
          Transformation("CAST(round({v} * 100) AS BIGINT)")),
        FieldMapping("status", "o_orderstatus")),
      defaultPermission = SourcePermission(
        Set("o_orderkey", "o_totalprice", "o_orderstatus"), "true"),
      fileSource = Some(FileSource("json", jsonDir)),
      viewName = Some("ord_json_raw"))
    val mesh = Mesh(Map("edge" -> Site("edge",
      entities = Map("jord" -> entity),
      localSources = Map("jord" -> Seq(src)))))
    GraftDataSource.registry.put("test_json", mesh)
    val viaDsv2 = spark.read.format("graft")
      .option("mesh", "test_json").option("site", "edge").option("entity", "jord")
      .load()
    val viaResolver = EntityResolver.resolve(spark, mesh, "edge", "jord", None)
    assert(viaDsv2.count() > 0)
    assert(viaDsv2.exceptAll(viaResolver).count() == 0)
    assert(viaResolver.exceptAll(viaDsv2).count() == 0)
  }

  test("ACL row policies partition the branches") {
    val prov = dsv2().where(col("etype") === "click")
    // 'click' rows can only come from the edge_clicks source's policy
    assert(prov.count() ==
      spark.read.parquet(s"${TestSessions.sfDir}/events.parquet")
        .where(col("event_type") === "click").count())
  }
}
