package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.mesh.Fixtures

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query gets (SparkSession, sfDir) and returns a DataFrame whose
  * column names match the paired `oracleSql` (DuckDB) exactly; results are
  * fully ordered so hashes are deterministic.
  */
object SparkEntry {

  /** DuckDB-side reconstruction of the resolved `lineitem` entity view for
    * the all-access user (identical to what EntityResolver produces from the
    * Fixtures mesh: 3 disjoint slices unioned, transforms applied,
    * commitdate/receiptdate unmapped -> NULL). */
  private val lineitemEntityOracle: String =
    """SELECT l_orderkey AS orderkey, l_partkey AS partkey, l_suppkey AS suppkey,
      |       CAST(l_linenumber AS BIGINT) AS linenumber, l_quantity AS quantity,
      |       l_extendedprice AS extendedprice, l_discount * 100 AS discount_percent,
      |       l_tax * 100 AS tax_percent, l_tax * l_extendedprice AS tax_amount,
      |       l_extendedprice / l_quantity AS unitprice, l_returnflag AS returnflag,
      |       l_linestatus AS linestatus, CAST(l_shipdate AS DATE) AS shipdate,
      |       CAST(NULL AS DATE) AS commitdate, CAST(NULL AS DATE) AS receiptdate
      |FROM lineitem""".stripMargin

  /** Same view under the default (non-admin) policy: `l_suppkey` column
    * denied -> NULL, rows restricted to `l_returnflag = 'N'`. */
  private val lineitemEntityDefaultOracle: String =
    """SELECT l_orderkey AS orderkey, l_partkey AS partkey,
      |       CAST(NULL AS BIGINT) AS suppkey,
      |       CAST(l_linenumber AS BIGINT) AS linenumber, l_quantity AS quantity,
      |       l_extendedprice AS extendedprice, l_discount * 100 AS discount_percent,
      |       l_tax * 100 AS tax_percent, l_tax * l_extendedprice AS tax_amount,
      |       l_extendedprice / l_quantity AS unitprice, l_returnflag AS returnflag,
      |       l_linestatus AS linestatus, CAST(l_shipdate AS DATE) AS shipdate,
      |       CAST(NULL AS DATE) AS commitdate, CAST(NULL AS DATE) AS receiptdate
      |FROM lineitem WHERE l_returnflag = 'N'""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val df = Fixtures.lineitemView(spark, "/root/testdata/sf0.001")
    df.createOrReplaceTempView("lineitem_entity")
    spark.sql(
      """SELECT returnflag, linestatus, round(sum(quantity), 2) AS sum_qty,
        |       count(*) AS count_order
        |FROM lineitem_entity GROUP BY returnflag, linestatus
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  private def meshSql(user: Option[String], sql: String)(
      s: SparkSession, dir: String): DataFrame = {
    Fixtures.lineitemView(s, dir, user).createOrReplaceTempView("lineitem_entity")
    s.sql(sql)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- mesh semantics (SURVEY §2.4) -----------------------------------
    "q1_proj_filter_limit" -> ((s, dir) => meshSql(Some("admin"),
      """SELECT linenumber, tax_amount FROM lineitem_entity
        |WHERE tax_percent > 3
        |ORDER BY tax_amount DESC, orderkey, linenumber LIMIT 10""".stripMargin)(s, dir)),

    "q2_star_nullpad_acl" -> ((s, dir) => meshSql(None,
      """SELECT * FROM lineitem_entity WHERE tax_percent > 3
        |ORDER BY orderkey, linenumber LIMIT 10000""".stripMargin)(s, dir)),

    "q3_tpch_q1_mesh" -> ((s, dir) => meshSql(Some("admin"),
      """SELECT returnflag, linestatus,
        |       round(sum(quantity), 2) AS sum_qty,
        |       round(sum(extendedprice), 2) AS sum_base_price,
        |       round(sum(extendedprice * (1 - discount_percent / 100)), 2) AS sum_disc_price,
        |       round(avg(quantity), 4) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem_entity
        |WHERE shipdate <= DATE '1998-09-02'
        |GROUP BY returnflag, linestatus
        |ORDER BY returnflag, linestatus""".stripMargin)(s, dir)),

    "q4_tpch_q1_acl_default" -> ((s, dir) => meshSql(None,
      """SELECT returnflag, linestatus,
        |       round(sum(quantity), 2) AS sum_qty,
        |       round(avg(quantity), 4) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem_entity
        |GROUP BY returnflag, linestatus
        |ORDER BY returnflag, linestatus""".stripMargin)(s, dir)),

    "q5_provenance_counts" -> { (s, dir) =>
      Fixtures.lineitemView(s, dir, Some("admin"), withProvenance = true)
        .createOrReplaceTempView("lineitem_entity_prov")
      s.sql(
        """SELECT _source_relay_, _source_id_, count(*) AS n,
          |       round(sum(tax_amount), 2) AS sum_tax
          |FROM lineitem_entity_prov
          |GROUP BY _source_relay_, _source_id_
          |ORDER BY _source_relay_, _source_id_""".stripMargin)
    })

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_proj_filter_limit" ->
      s"""SELECT linenumber, tax_amount FROM ($lineitemEntityOracle)
         |WHERE tax_percent > 3
         |ORDER BY tax_amount DESC, orderkey, linenumber LIMIT 10""".stripMargin,

    "q2_star_nullpad_acl" ->
      s"""SELECT * FROM ($lineitemEntityDefaultOracle) WHERE tax_percent > 3
         |ORDER BY orderkey, linenumber LIMIT 10000""".stripMargin,

    "q3_tpch_q1_mesh" ->
      s"""SELECT returnflag, linestatus,
         |       round(sum(quantity), 2) AS sum_qty,
         |       round(sum(extendedprice), 2) AS sum_base_price,
         |       round(sum(extendedprice * (1 - discount_percent / 100)), 2) AS sum_disc_price,
         |       round(avg(quantity), 4) AS avg_qty,
         |       count(*) AS count_order
         |FROM ($lineitemEntityOracle)
         |WHERE shipdate <= DATE '1998-09-02'
         |GROUP BY returnflag, linestatus
         |ORDER BY returnflag, linestatus""".stripMargin,

    "q4_tpch_q1_acl_default" ->
      s"""SELECT returnflag, linestatus,
         |       round(sum(quantity), 2) AS sum_qty,
         |       round(avg(quantity), 4) AS avg_qty,
         |       count(*) AS count_order
         |FROM ($lineitemEntityDefaultOracle)
         |GROUP BY returnflag, linestatus
         |ORDER BY returnflag, linestatus""".stripMargin,

    "q5_provenance_counts" ->
      """SELECT CASE l_orderkey % 3 WHEN 0 THEN 'na_us' WHEN 1 THEN 'emea' ELSE 'apac' END AS _source_relay_,
        |       CASE l_orderkey % 3 WHEN 0 THEN 'na_us_lineitem_parquet'
        |            WHEN 1 THEN 'emea_lineitem_parquet' ELSE 'apac_lineitem_parquet' END AS _source_id_,
        |       count(*) AS n, round(sum(l_tax * l_extendedprice), 2) AS sum_tax
        |FROM lineitem
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
