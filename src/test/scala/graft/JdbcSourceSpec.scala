package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.mesh.EntityResolver

/** The delegated-engine seam (S3/S4) made real: a DataSource backed by
  * [[JdbcSource]] executes its `source_sql` ON the external engine (here an
  * in-process embedded Derby standing in for Trino), and Spark's JDBC source
  * serializes ACL row filters and user predicates into the engine-side WHERE
  * clause — pushdown crosses the seam instead of stopping at it. */
class JdbcSourceSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private val derbyUrl = "jdbc:derby:memory:graftjdbc;create=true"
  private val driverOpt = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  /** Rows mirrored into Derby: (orderkey, quantity, extendedprice). */
  private val rows: Seq[(Long, Double, Double)] =
    (1L to 60L).map(i => (i, (i % 17 + 1).toDouble, i * 10.5))

  private lazy val derbyReady: Unit = {
    // Derby's home (derby.log location) must be writable
    System.setProperty("derby.system.home",
      Files.createTempDirectory("graft_derby").toString)
    val conn = DriverManager.getConnection(derbyUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE app.raw_lineitem (" +
          "orderkey BIGINT, quantity DOUBLE, extendedprice DOUBLE)")
      val ps = conn.prepareStatement(
        "INSERT INTO app.raw_lineitem VALUES (?, ?, ?)")
      rows.foreach { case (k, q, e) =>
        ps.setLong(1, k); ps.setDouble(2, q); ps.setDouble(3, e)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  private def mesh: Mesh = {
    val entity = Entity("jl", Seq(
      Information("orderkey", org.apache.spark.sql.types.LongType),
      Information("qty", org.apache.spark.sql.types.DoubleType),
      Information("unitprice", org.apache.spark.sql.types.DoubleType)))
    val ds = DataSource(
      id = "derby.lineitem",
      // executes on the engine: the derived column exists only engine-side
      sourceSql = "SELECT orderkey, quantity, extendedprice / quantity " +
        "AS unitprice FROM app.raw_lineitem",
      mappings = Seq(
        FieldMapping("orderkey", "orderkey"),
        FieldMapping("qty", "quantity"),
        FieldMapping("unitprice", "unitprice")),
      defaultPermission =
        SourcePermission(Set("orderkey", "quantity", "unitprice"), "quantity > 3"),
      jdbcSource = Some(JdbcSource(derbyUrl, driverOpt)))
    Mesh(Map("site" -> Site("site",
      Map("jl" -> entity), Map("jl" -> Seq(ds)))))
  }

  test("entity resolves through the JDBC runner; engine executes source_sql") {
    derbyReady
    val df = EntityResolver.resolve(spark, mesh, "site", "jl")
    val expected = rows.filter(_._2 > 3)
    assert(df.count() == expected.length)
    val got = df.orderBy("orderkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = expected.map { case (k, q, e) => (k, q, e / q) }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("ACL row filter and user predicates push into the engine-side WHERE") {
    derbyReady
    val df = EntityResolver.resolve(spark, mesh, "site", "jl")
      .where(col("orderkey") === 7L)
    val plan = df.queryExecution.executedPlan.toString
    // Spark's JDBC scan reports engine-pushed predicates; both the ACL
    // filter (quantity > 3) and the user predicate must cross the seam
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.toUpperCase.contains("GREATERTHAN(QUANTITY,3"), plan)
    assert(plan.toUpperCase.contains("EQUALTO(ORDERKEY,7"), plan)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  private lazy val derbyOrdersReady: Unit = {
    derbyReady // derby.system.home must be set before any connection
    val conn = DriverManager.getConnection(derbyUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE app.raw_orders (okey BIGINT, total DECIMAL(12,2), odate DATE)")
      val ps = conn.prepareStatement("INSERT INTO app.raw_orders VALUES (?, ?, ?)")
      (1 to 40).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setBigDecimal(2, new java.math.BigDecimal(s"${i * 100}.25"))
        ps.setDate(3, java.sql.Date.valueOf(f"2026-01-${i % 28 + 1}%02d"))
        ps.addBatch()
      }
      ps.executeBatch(); st.close(); ps.close()
    } finally conn.close()
  }

  test("decimal and date predicates push through the JDBC seam") {
    derbyOrdersReady
    val entity = Entity("jo", Seq(
      Information("okey", org.apache.spark.sql.types.LongType),
      Information("total", org.apache.spark.sql.types.DecimalType(12, 2)),
      Information("odate", org.apache.spark.sql.types.DateType)))
    val ds = DataSource(
      id = "derby.orders",
      sourceSql = "SELECT okey, total, odate FROM app.raw_orders",
      mappings = Seq(
        FieldMapping("okey", "okey"),
        FieldMapping("total", "total"),
        FieldMapping("odate", "odate")),
      defaultPermission = SourcePermission(Set("okey", "total", "odate"), "okey > 0"),
      jdbcSource = Some(JdbcSource(derbyUrl, driverOpt)))
    val m = Mesh(Map("site" -> Site("site",
      Map("jo" -> entity), Map("jo" -> Seq(ds)))))
    val df = EntityResolver.resolve(spark, m, "site", "jo")
      .where(col("odate") >= lit(java.sql.Date.valueOf("2026-01-15")) &&
        col("total") > new java.math.BigDecimal("1000.00"))
    // the default 100-char metadata truncation would cut PushedFilters off
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    val plan =
      try {
        spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
        df.queryExecution.executedPlan.toString.toUpperCase
      } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    // date and decimal comparisons must serialize into the engine query,
    // not fall back to a full scan + Spark-side filter
    assert(plan.contains("PUSHEDFILTERS"), plan)
    assert(plan.contains("GREATERTHANOREQUAL(ODATE,2026-01-15"), plan)
    assert(plan.contains("GREATERTHAN(TOTAL,1000.00"), plan)
    val want = (1 to 40)
      .map(i => (i.toLong, new java.math.BigDecimal(s"${i * 100}.25"),
        java.sql.Date.valueOf(f"2026-01-${i % 28 + 1}%02d")))
      .filter { case (_, t, d) =>
        !d.before(java.sql.Date.valueOf("2026-01-15")) &&
          t.compareTo(new java.math.BigDecimal("1000.00")) > 0
      }
      .map(_._1).sorted
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == want)
  }

  test("Trino-kind YAML connection executes through a JDBC override e2e") {
    derbyReady
    val dir = Files.createTempDirectory("graft_cfg_jdbc")
    Files.writeString(dir.resolve("site.yaml"),
      s"""api_version: v1alpha1
         |kind: Entity
         |spec:
         |  name: jl
         |  information:
         |    - {name: orderkey, arrow_dtype: Int64}
         |    - {name: qty, arrow_dtype: Float64}
         |---
         |api_version: v1alpha1
         |kind: LocalData
         |spec:
         |  name: trino_conn
         |  connection_options:
         |    Trino:
         |      user: trino
         |      password: ''
         |      host: localhost
         |      port: "8080"
         |      secure: false
         |  data_sources:
         |    - name: lineitem_src
         |      source_sql: SELECT orderkey, quantity FROM app.raw_lineitem
         |      source_options:
         |        Trino: {}
         |      fields:
         |        - {name: orderkey, path: orderkey}
         |        - {name: quantity, path: quantity}
         |      default_permission:
         |        allowed_columns: [orderkey, quantity]
         |        allowed_rows: "true"
         |---
         |api_version: v1alpha1
         |kind: LocalMapping
         |spec:
         |  entity_name: jl
         |  mappings:
         |    - data_con_name: trino_conn
         |      source_mappings:
         |        - data_source_name: lineitem_src
         |          field_mappings:
         |            - {field: orderkey, info: orderkey}
         |            - {field: quantity, info: qty}
         |""".stripMargin)
    val site = ConfigLoader.loadSite("site", dir,
      jdbcOverrides = Map("trino_conn" -> JdbcSource(derbyUrl, driverOpt)))
    val ds = site.localSources("jl").head
    assert(ds.jdbcSource.isDefined)
    // the engine user from the Trino connection carries into JDBC options
    assert(ds.jdbcSource.get.options.get("user").contains("trino"))
    // Derby scopes the default schema by user; the explicit app.* reference
    // keeps the query valid regardless
    val df = EntityResolver.resolve(spark, Mesh(Map("site" -> site)), "site", "jl")
    assert(df.count() == rows.length)
    assert(df.agg(sum("orderkey")).head.getLong(0) == rows.map(_._1).sum)
  }

  test("jdbc:trino:// endpoint: full option plumbing, fails only at the engine") {
    // a production Trino endpoint differs from the Derby stand-in only by
    // url + driver class (zero-egress env: no live engine). The recording
    // driver proves the exact seam a real endpoint would hit: the trino
    // url, the connection properties, and the derived-table SQL rendered
    // around source_sql — and that the failure happens at CONNECTION time,
    // not in graft's own plumbing.
    val url = "jdbc:trino://trino.example:8443/memory"
    val entity = Entity("jt", Seq(
      Information("orderkey", org.apache.spark.sql.types.LongType),
      Information("qty", org.apache.spark.sql.types.DoubleType)))
    val ds = DataSource(
      id = "trino.lineitem",
      sourceSql = "SELECT orderkey, quantity FROM tpch.tiny.lineitem",
      mappings = Seq(
        FieldMapping("orderkey", "orderkey"),
        FieldMapping("qty", "quantity")),
      defaultPermission = SourcePermission(Set("orderkey", "quantity"), "true"),
      jdbcSource = Some(JdbcSource(url, Map(
        "driver" -> "graft.FakeTrinoDriver",
        "user" -> "trino",
        "fetchsize" -> "5000"))))
    val m = Mesh(Map("site" -> Site("site",
      Map("jt" -> entity), Map("jt" -> Seq(ds)))))
    FakeTrinoDriver.reset()
    val e = intercept[Throwable](
      EntityResolver.resolve(spark, m, "site", "jt").collect())
    // the failure is the simulated engine outage, nothing earlier
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("simulated trino engine unavailable"), msgs)
    // option plumbing: url, credentials reach the driver
    assert(FakeTrinoDriver.lastUrl == url)
    assert(FakeTrinoDriver.lastProps != null &&
      FakeTrinoDriver.lastProps.getProperty("user") == "trino")
    // the derived-table rendering around source_sql is what the engine sees
    assert(FakeTrinoDriver.lastSql != null &&
      FakeTrinoDriver.lastSql.contains(
        "(SELECT orderkey, quantity FROM tpch.tiny.lineitem) AS graft_delegated"),
      s"engine-side SQL: ${FakeTrinoDriver.lastSql}")
  }

  test("without an override a Trino connection stays view-backed (stand-in)") {
    val dir = Files.createTempDirectory("graft_cfg_jdbc_no")
    Files.writeString(dir.resolve("site.yaml"),
      s"""api_version: v1alpha1
         |kind: LocalData
         |spec:
         |  name: trino_conn
         |  connection_options:
         |    Trino: {user: trino, host: localhost, port: "8080"}
         |  data_sources:
         |    - name: s
         |      source_sql: SELECT 1 AS x FROM t
         |      fields:
         |        - {name: x, path: x}
         |      default_permission:
         |        allowed_columns: [x]
         |        allowed_rows: "true"
         |---
         |api_version: v1alpha1
         |kind: Entity
         |spec:
         |  name: e
         |  information:
         |    - {name: x, arrow_dtype: Int32}
         |---
         |api_version: v1alpha1
         |kind: LocalMapping
         |spec:
         |  entity_name: e
         |  mappings:
         |    - data_con_name: trino_conn
         |      source_mappings:
         |        - data_source_name: s
         |          field_mappings:
         |            - {field: x, info: x}
         |""".stripMargin)
    val site = ConfigLoader.loadSite("site", dir)
    assert(site.localSources("e").head.jdbcSource.isEmpty)
  }
}

/** Recording java.sql.Driver for the jdbc:trino:// plumbing spec: accepts
  * trino URLs, records (url, properties) and the first statement SQL, and
  * simulates an unreachable engine — connections hand out a dynamic proxy
  * whose statement methods capture the SQL then raise SQLException. */
object FakeTrinoDriver {
  @volatile var lastUrl: String = _
  @volatile var lastProps: java.util.Properties = _
  @volatile var lastSql: String = _
  def reset(): Unit = { lastUrl = null; lastProps = null; lastSql = null }
}

class FakeTrinoDriver extends java.sql.Driver {
  import FakeTrinoDriver._
  private def boom() =
    throw new java.sql.SQLException("simulated trino engine unavailable")

  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:trino:")

  override def connect(url: String, info: java.util.Properties): java.sql.Connection = {
    if (!acceptsURL(url)) return null
    lastUrl = url
    lastProps = info
    val handler = new java.lang.reflect.InvocationHandler {
      override def invoke(proxy: AnyRef, m: java.lang.reflect.Method,
          args: Array[AnyRef]): AnyRef = m.getName match {
        case "prepareStatement" | "createStatement" | "prepareCall" =>
          if (args != null && args.nonEmpty) args(0) match {
            case s: String => lastSql = s
            case _ =>
          }
          boom()
        case "close" | "setAutoCommit" | "commit" | "rollback"
            | "setTransactionIsolation" | "clearWarnings" => null
        case "isClosed" => java.lang.Boolean.FALSE
        case "isValid" => java.lang.Boolean.TRUE
        case "getAutoCommit" => java.lang.Boolean.TRUE
        case "toString" => "FakeTrinoConnection"
        case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
        case "equals" => java.lang.Boolean.valueOf(proxy eq args(0))
        case _ => boom()
      }
    }
    java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Connection]), handler)
      .asInstanceOf[java.sql.Connection]
  }

  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
