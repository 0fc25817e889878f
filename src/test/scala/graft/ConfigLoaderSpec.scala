package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.mesh.EntityResolver

/** ConfigLoader compatibility with the reference's relayctl YAML formats:
  * (1) parses the reference's own dev-web configs verbatim; (2) a generated
  * config executes end-to-end over a CSV FileDirectory source. */
class ConfigLoaderSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private val refDeploy = Paths.get("/root/reference/deploy/development")

  test("parses every reference dev-web relay config verbatim") {
    assume(Files.isDirectory(refDeploy))
    val relays = Seq("global_data_relay", "na_data_relay", "na_us_data_relay",
      "emea_data_relay", "apac_data_relay")
    val sites = relays.map { r =>
      r -> ConfigLoader.loadSite(r, refDeploy.resolve(r).resolve("data_modeling"))
    }.toMap
    // every relay models a lineitem entity (13-15 infos; schemas differ
    // per relay in the reference dev web)
    sites.values.foreach { s =>
      assert(s.entities.contains("lineitem"))
      assert(s.entities("lineitem").informations.size >= 13)
    }
    assert(sites("na_data_relay").entities("lineitem").informations.size == 15)
    // na_us maps lineitem over a CSV FileDirectory source
    val naUs = sites("na_us_data_relay")
    val csvSrc = naUs.localSources("lineitem").find(_.fileSource.isDefined)
    assert(csvSrc.isDefined)
    assert(csvSrc.get.fileSource.get.format == "csv")
    // global peers na/emea/apac for lineitem with transformations
    val globalRms = sites("global_data_relay").remoteMappings("lineitem")
    assert(Set("na_data_relay", "emea_data_relay", "apac_data_relay")
      .subsetOf(globalRms.map(_.peer).toSet))
    val naRm = globalRms.find(_.peer == "na_data_relay").get
    val discount = naRm.infoMappings.find(_.localInfo == "discount").get
    assert(discount.remoteInfo == "discount_percent")
    assert(discount.transform.template == "{v} / 100")
    // users with per-source permissions load
    assert(sites("na_data_relay").localSources("lineitem")
      .exists(_.userPermissions.nonEmpty))
  }

  test("multiple LocalMapping docs for one entity merge cumulatively") {
    val dir = Files.createTempDirectory("graft_cfg_merge")
    def localData(conn: String) =
      s"""api_version: v1alpha1
         |kind: LocalData
         |spec:
         |  name: $conn
         |  data_sources:
         |    - name: src
         |      source_sql: select * from raw_nation
         |      fields:
         |        - {name: k, path: n_nationkey}
         |      default_permission:
         |        allowed_columns: [n_nationkey]
         |        allowed_rows: "true"
         |""".stripMargin
    def mapping(conn: String) =
      s"""api_version: v1alpha1
         |kind: LocalMapping
         |spec:
         |  entity_name: nations
         |  mappings:
         |    - data_con_name: $conn
         |      source_mappings:
         |        - data_source_name: src
         |          field_mappings:
         |            - {field: k, info: key}
         |""".stripMargin
    Files.writeString(dir.resolve("a.yaml"),
      "api_version: v1alpha1\nkind: Entity\nspec:\n  name: nations\n  information:\n" +
        "    - {name: key, arrow_dtype: Int64}\n---\n" + localData("conn_a") + "---\n" + mapping("conn_a"))
    Files.writeString(dir.resolve("b.yaml"), localData("conn_b") + "---\n" + mapping("conn_b"))
    val site = ConfigLoader.loadSite("merge", dir)
    // a last-wins toMap would keep only conn_b's source
    assert(site.localSources("nations").map(_.id).toSet == Set("conn_a.src", "conn_b.src"))
  }

  test("JSON-path DataField renders as get_json_object (nested path contract)") {
    import org.apache.spark.sql.functions._
    graft.mesh.Fixtures.registerRaw(spark, TestSessions.sfDir)
    val dir = Files.createTempDirectory("graft_cfg_json")
    Files.writeString(dir.resolve("site.yaml"),
      s"""api_version: v1alpha1
         |kind: Entity
         |spec:
         |  name: telemetry
         |  information:
         |    - {name: event_id, arrow_dtype: Int64}
         |    - {name: k, arrow_dtype: Int64}
         |---
         |api_version: v1alpha1
         |kind: LocalData
         |spec:
         |  name: ev_conn
         |  data_sources:
         |    - name: ev
         |      source_sql: select * from raw_events
         |      fields:
         |        - {name: event_id, path: event_id}
         |        - {name: k, path: "$$.props.k"}
         |      default_permission:
         |        allowed_columns: [event_id, props]
         |        allowed_rows: "true"
         |---
         |api_version: v1alpha1
         |kind: LocalMapping
         |spec:
         |  entity_name: telemetry
         |  mappings:
         |    - data_con_name: ev_conn
         |      source_mappings:
         |        - data_source_name: ev
         |          field_mappings:
         |            - {field: event_id, info: event_id}
         |            - {field: k, info: k}
         |""".stripMargin)
    val site = ConfigLoader.loadSite("solo_json", dir)
    val mesh = Mesh(Map("solo_json" -> site))
    val df = EntityResolver.resolve(spark, mesh, "solo_json", "telemetry")
    val viaSql = spark.sql(
      "SELECT event_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS k FROM raw_events")
    assert(df.count() == viaSql.count())
    assert(df.where(col("k").isNotNull).count() > 0)
    assert(df.agg(sum("k")).head.getLong(0) == viaSql.agg(sum("k")).head.getLong(0))
  }

  test("generated YAML site executes end-to-end over a CSV source") {
    val dir = Files.createTempDirectory("graft_cfg")
    // physical CSV derived from the parquet fixture
    val csvDir = s"$dir/csv_data"
    spark.read.parquet(s"${TestSessions.sfDir}/nation.parquet")
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(csvDir)

    Files.writeString(dir.resolve("site.yaml"),
      s"""api_version: v1alpha1
         |kind: Entity
         |spec:
         |  name: nations
         |  information:
         |    - name: key
         |      arrow_dtype: Int64
         |    - name: label
         |      arrow_dtype: Utf8
         |    - name: region
         |      arrow_dtype: Int64
         |---
         |api_version: v1alpha1
         |kind: LocalData
         |spec:
         |  name: csv_conn
         |  connection_options:
         |    FileDirectory:
         |      object_store_type: LocalFileSystem
         |      url: local://
         |  data_sources:
         |    - name: nation_csv
         |      source_sql: select * from nation_csv
         |      source_options:
         |        FileDirectory:
         |          prefix: $csvDir
         |          file_type: CSV
         |      fields:
         |        - name: key
         |          path: n_nationkey
         |        - name: label
         |          path: n_name
         |        - name: region
         |          path: n_regionkey
         |      default_permission:
         |        allowed_columns:
         |          - n_nationkey
         |          - n_name
         |        allowed_rows: n_nationkey < 20
         |---
         |api_version: v1alpha1
         |kind: LocalMapping
         |spec:
         |  entity_name: nations
         |  mappings:
         |    - data_con_name: csv_conn
         |      source_mappings:
         |        - data_source_name: nation_csv
         |          field_mappings:
         |            - field: key
         |              info: key
         |            - field: label
         |              info: label
         |              transformation:
         |                other_to_local_info: "upper({v})"
         |                replace_from: "{v}"
         |            - field: region
         |              info: region
         |""".stripMargin)

    val site = ConfigLoader.loadSite("solo", dir)
    val mesh = Mesh(Map("solo" -> site))
    val df = EntityResolver.resolve(spark, mesh, "solo", "nations")
    val rows = df.orderBy("key").collect()
    assert(rows.length == 20) // row ACL n_nationkey < 20
    assert(rows.forall(_.getString(1).forall(c => !c.isLower))) // upper() transform
    assert(rows.forall(_.isNullAt(2))) // region column denied -> null-padded
  }
}
