package graft.queries

import org.apache.spark.sql.SparkSession

import graft.mesh.{EntityResolver, Fixtures}

/** Registers the resolved entity views (webengine path: every entity becomes
  * an ordinary queryable table, `webengine/src/register.rs:36-90`) plus the
  * raw physical tables. Cross-entity SQL then runs on Catalyst, which pushes
  * projection/filter/limit into each per-source branch — the Spark-native
  * equivalent of the reference's scan-template pushdown (SURVEY §2.5). */
object Views {
  /** DuckDB-side reconstruction of the resolved `lineitem` entity view for
    * the all-access user. */
  val lineitemOracle: String =
    """SELECT l_orderkey AS orderkey, l_partkey AS partkey, l_suppkey AS suppkey,
      |       CAST(l_linenumber AS BIGINT) AS linenumber, l_quantity AS quantity,
      |       l_extendedprice AS extendedprice, l_discount * 100 AS discount_percent,
      |       l_tax * 100 AS tax_percent, l_tax * l_extendedprice AS tax_amount,
      |       l_extendedprice / l_quantity AS unitprice, l_returnflag AS returnflag,
      |       l_linestatus AS linestatus, CAST(l_shipdate AS DATE) AS shipdate,
      |       CAST(NULL AS DATE) AS commitdate, CAST(NULL AS DATE) AS receiptdate
      |FROM lineitem""".stripMargin

  /** Same view under the default (non-admin) policy. */
  val lineitemDefaultOracle: String =
    """SELECT l_orderkey AS orderkey, l_partkey AS partkey,
      |       CAST(NULL AS BIGINT) AS suppkey,
      |       CAST(l_linenumber AS BIGINT) AS linenumber, l_quantity AS quantity,
      |       l_extendedprice AS extendedprice, l_discount * 100 AS discount_percent,
      |       l_tax * 100 AS tax_percent, l_tax * l_extendedprice AS tax_amount,
      |       l_extendedprice / l_quantity AS unitprice, l_returnflag AS returnflag,
      |       l_linestatus AS linestatus, CAST(l_shipdate AS DATE) AS shipdate,
      |       CAST(NULL AS DATE) AS commitdate, CAST(NULL AS DATE) AS receiptdate
      |FROM lineitem WHERE l_returnflag = 'N'""".stripMargin

  val customerOracle: String =
    """SELECT c_custkey AS custkey, c_name AS customername,
      |       CAST(c_nationkey AS BIGINT) AS nationkey, c_acctbal AS acctbal,
      |       c_mktsegment AS mktsegment FROM customer""".stripMargin

  val ordersOracle: String =
    """SELECT o_orderkey AS orderkey, o_custkey AS custkey,
      |       o_orderstatus AS orderstatus, o_totalprice AS totalprice,
      |       CAST(o_orderdate AS DATE) AS orderdate,
      |       o_orderpriority AS orderpriority FROM orders""".stripMargin

  // resolved-entity plans memoized per (session, sf): resolution is pure
  // plan construction (5-site walk, per-branch SQL analysis, ACL probes —
  // ~100ms of driver time), and the resolved DataFrame captures its plan
  // eagerly, so one resolution serves every later registration
  private val resolvedCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String),
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame)]

  /** Register lineitem/customer/orders entity views (admin access) + raw
    * physical tables as temp views on `spark`. The VIEW registrations
    * re-assert on every call — mesh queries legitimately re-register
    * `lineitem_entity` under other users' ACLs (the entity name must stay
    * bare per the reference contract) — but they re-assert the MEMOIZED
    * resolved plan: a catalog put per query, not a re-resolution. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    Fixtures.registerRaw(spark, sfDir)
    val (li, cust, ord) = resolvedCache.getOrElseUpdate((spark, sfDir), {
      resolvedCache.filterKeys(_._1 eq spark).keys.foreach(resolvedCache.remove)
      val mesh = Fixtures.mesh
      val admin = Some("admin")
      (EntityResolver.resolve(spark, mesh, "global", "lineitem", admin),
        EntityResolver.resolve(spark, mesh, "global", "customer", admin),
        EntityResolver.resolve(spark, mesh, "global", "orders", admin))
    })
    // view puts are epoch-guarded like registerRaw's: mesh queries register
    // lineitem_entity under other users' ACLs (and bump the epoch), so the
    // admin views re-assert only after an actual shadow
    val epoch = graft.mesh.ViewEpoch.current
    if (!lastAsserted.get(spark).contains((sfDir, epoch))) {
      li.createOrReplaceTempView("lineitem_entity")
      cust.createOrReplaceTempView("customer_entity")
      ord.createOrReplaceTempView("orders_entity")
      lastAsserted.put(spark, (sfDir, epoch))
    }
  }

  private val lastAsserted =
    scala.collection.concurrent.TrieMap.empty[SparkSession, (String, Long)]

  /** The memoized resolved-view triple itself — the [[PlanCache]] scope
    * object for SqlSurface plans: a plan analyzed over these three frames
    * stays valid exactly as long as this instance is what [[registerAll]]
    * would (re-)assert; a re-resolution (new session/sf, or an eviction)
    * swaps the instance and every dependent cached plan misses. Builds
    * via [[registerAll]] on first use; on the hit path it deliberately
    * does NOT re-assert any temp view — a cached plan consults no
    * catalog, so the lookup stays a map read. */
  def scope(spark: SparkSession, sfDir: String): AnyRef =
    resolvedCache.getOrElse((spark, sfDir), {
      registerAll(spark, sfDir)
      resolvedCache((spark, sfDir))
    })
}
