package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ConfigLoader
import graft.mesh.{EntityResolver, Fixtures}

/** Config-fidelity closure: the full 5-site fixture mesh expressed as
  * relayctl-format YAML must load into a Mesh whose resolution is
  * row-identical to the code-built Fixtures mesh — including remote hops,
  * transformation composition, ACL defaults and the admin user override. */
class YamlMeshSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private def entityYaml: String =
    """api_version: v1alpha1
      |kind: Entity
      |spec:
      |  name: lineitem
      |  information:
      |    - {name: orderkey, arrow_dtype: Int64}
      |    - {name: partkey, arrow_dtype: Int64}
      |    - {name: suppkey, arrow_dtype: Int64}
      |    - {name: linenumber, arrow_dtype: Int64}
      |    - {name: quantity, arrow_dtype: Float64}
      |    - {name: extendedprice, arrow_dtype: Float64}
      |    - {name: discount_percent, arrow_dtype: Float64}
      |    - {name: tax_percent, arrow_dtype: Float64}
      |    - {name: tax_amount, arrow_dtype: Float64}
      |    - {name: unitprice, arrow_dtype: Float64}
      |    - {name: returnflag, arrow_dtype: Utf8}
      |    - {name: linestatus, arrow_dtype: Utf8}
      |    - {name: shipdate, arrow_dtype: Date32}
      |    - {name: commitdate, arrow_dtype: Date32}
      |    - {name: receiptdate, arrow_dtype: Date32}
      |""".stripMargin

  private def leafYaml(conn: String, mod: Int, quantityTransform: String): String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate", "tax_amount_phys", "unitprice_phys")
    val allowedDefault = (cols.toSet - "l_suppkey").toSeq.sorted.map(c => s"          - $c").mkString("\n")
    val allowedAll = cols.sorted.map(c => s"            - $c").mkString("\n")
    s"""$entityYaml---
       |api_version: v1alpha1
       |kind: LocalData
       |spec:
       |  name: $conn
       |  connection_options:
       |    FileDirectory:
       |      object_store_type: LocalFileSystem
       |      url: local://
       |  data_sources:
       |    - name: slice
       |      source_sql: |
       |        SELECT *, l_tax * l_extendedprice AS tax_amount_phys,
       |               l_extendedprice / l_quantity AS unitprice_phys
       |        FROM raw_lineitem WHERE l_orderkey % 3 = $mod
       |      fields:
       |${cols.map(c => s"        - {name: $c, path: $c}").mkString("\n")}
       |      default_permission:
       |        allowed_columns:
       |$allowedDefault
       |        allowed_rows: l_returnflag = 'N'
       |---
       |api_version: v1alpha1
       |kind: LocalMapping
       |spec:
       |  entity_name: lineitem
       |  mappings:
       |    - data_con_name: $conn
       |      source_mappings:
       |        - data_source_name: slice
       |          field_mappings:
       |            - {field: l_orderkey, info: orderkey}
       |            - {field: l_partkey, info: partkey}
       |            - {field: l_suppkey, info: suppkey}
       |            - {field: l_linenumber, info: linenumber}
       |            - field: l_quantity
       |              info: quantity
       |              transformation:
       |                other_to_local_info: "$quantityTransform"
       |                replace_from: "{v}"
       |            - {field: l_extendedprice, info: extendedprice}
       |            - field: l_discount
       |              info: discount_percent
       |              transformation: {other_to_local_info: "{v} * 100", replace_from: "{v}"}
       |            - field: l_tax
       |              info: tax_percent
       |              transformation: {other_to_local_info: "{v} * 100", replace_from: "{v}"}
       |            - {field: tax_amount_phys, info: tax_amount}
       |            - {field: unitprice_phys, info: unitprice}
       |            - {field: l_returnflag, info: returnflag}
       |            - {field: l_linestatus, info: linestatus}
       |            - field: l_shipdate
       |              info: shipdate
       |              transformation: {other_to_local_info: "CAST({v} AS DATE)", replace_from: "{v}"}
       |---
       |api_version: v1alpha1
       |kind: User
       |spec:
       |  x509_cert_file: certs/admin.pem
       |  permissions:
       |    - data_con_name: $conn
       |      source_permissions:
       |        - data_source_name: slice
       |          allowed_columns:
       |$allowedAll
       |          allowed_rows: "true"
       |""".stripMargin
  }

  private def identityRelayMappings: String =
    Seq("orderkey", "partkey", "suppkey", "linenumber", "extendedprice",
      "discount_percent", "tax_percent", "tax_amount", "unitprice",
      "returnflag", "linestatus", "shipdate", "commitdate", "receiptdate")
      .map(i => s"        - {local_info: $i, info_mapped_name: $i}").mkString("\n")

  private def hubYaml(peers: Seq[(String, String)]): String =
    s"""$entityYaml---
       |api_version: v1alpha1
       |kind: RemoteMapping
       |spec:
       |  entity_name: lineitem
       |  mappings:
       |${peers.map { case (relay, qt) =>
          s"""    - relay_name: $relay
             |      remote_entity_name: lineitem
             |      relay_mappings:
             |$identityRelayMappings
             |        - local_info: quantity
             |          info_mapped_name: quantity
             |          transformation: {other_to_local_info: "$qt", replace_from: "{v}"}""".stripMargin
        }.mkString("\n")}
       |""".stripMargin

  test("YAML-loaded 5-site mesh resolves identically to the code-built mesh") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val root = Files.createTempDirectory("graft_yaml_mesh")
    def site(name: String, yaml: String): (String, Path) = {
      val d = Files.createDirectory(root.resolve(name))
      Files.writeString(d.resolve("config.yaml"), yaml)
      name -> d
    }
    val mesh = ConfigLoader.loadMesh(Map(
      site("na_us", leafYaml("na_us_conn", 0, "{v} * 2")),
      site("emea", leafYaml("emea_conn", 1, "{v}")),
      site("apac", leafYaml("apac_conn", 2, "{v}")),
      site("na", hubYaml(Seq("na_us" -> "{v} / 2"))),
      site("global", hubYaml(Seq("na" -> "{v}", "emea" -> "{v}", "apac" -> "{v}")))))

    for (user <- Seq(Some("admin"), None)) {
      val fromYaml = EntityResolver.resolve(spark, mesh, "global", "lineitem", user)
      val fromCode = Fixtures.lineitemView(spark, TestSessions.sfDir, user)
      assert(fromYaml.columns.toSeq == fromCode.columns.toSeq)
      assert(fromYaml.exceptAll(fromCode).count() == 0, s"yaml extra rows ($user)")
      assert(fromCode.exceptAll(fromYaml).count() == 0, s"yaml missing rows ($user)")
    }
  }

  private def alphaDocYaml(liveUrl: String): String =
    s"""api_version: v1alpha1
       |kind: Entity
       |spec:
       |  name: documents
       |  information:
       |    - {name: doc_id, arrow_dtype: Int64}
       |    - {name: text, arrow_dtype: Utf8}
       |    - {name: lang, arrow_dtype: Utf8}
       |    - {name: source, arrow_dtype: Utf8}
       |    - {name: n_chars, arrow_dtype: Int64}
       |---
       |api_version: v1alpha1
       |kind: LocalData
       |spec:
       |  name: alpha_conn
       |  data_sources:
       |    - name: docs_even
       |      source_sql: SELECT * FROM raw_documents WHERE doc_id % 2 = 0
       |      fields:
       |        - {name: doc_id, path: doc_id}
       |        - {name: text, path: text}
       |        - {name: lang, path: lang}
       |        - {name: source, path: source}
       |        - {name: n_chars, path: n_chars}
       |---
       |api_version: v1alpha1
       |kind: LocalMapping
       |spec:
       |  entity_name: documents
       |  mappings:
       |    - data_con_name: alpha_conn
       |      source_mappings:
       |        - data_source_name: docs_even
       |          field_mappings:
       |            - {info: doc_id, field: doc_id}
       |            - {info: text, field: text}
       |            - {info: lang, field: lang}
       |            - {info: source, field: source}
       |            - {info: n_chars, field: n_chars}
       |---
       |api_version: v1alpha1
       |kind: PeerRelay
       |spec:
       |  name: beta_relay
       |  rest_endpoint: "$liveUrl"
       |---
       |api_version: v1alpha1
       |kind: PeerRelay
       |spec:
       |  name: offline_relay
       |  rest_endpoint: "http://127.0.0.1:9"
       |---
       |api_version: v1alpha1
       |kind: RemoteMapping
       |spec:
       |  entity_name: documents
       |  mappings:
       |    - relay_name: beta_relay
       |      remote_entity_name: documents
       |      relay_mappings:
       |        - {local_info: doc_id, info_mapped_name: doc_id}
       |        - {local_info: text, info_mapped_name: text}
       |        - {local_info: lang, info_mapped_name: lang}
       |        - {local_info: source, info_mapped_name: source}
       |        - {local_info: n_chars, info_mapped_name: n_chars}
       |    - relay_name: offline_relay
       |      remote_entity_name: documents
       |      relay_mappings:
       |        - {local_info: doc_id, info_mapped_name: doc_id}
       |""".stripMargin

  test("PeerRelay endpoints: live peer registers from /catalog, offline peer skipped") {
    import graft.catalog._
    import graft.mesh.{MeshSession, QueryService}
    import graft.transport.RelayServer
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    // the live peer: a separate relay process surface over the odd slice
    val betaSrc = DataSource(
      id = "docs_odd",
      sourceSql = "SELECT * FROM raw_documents WHERE doc_id % 2 = 1",
      mappings = Fixtures.documentsEntity.informations
        .map(i => FieldMapping(i.name, i.name)),
      defaultPermission = SourcePermission(
        Set("doc_id", "text", "lang", "source", "n_chars"), "true"))
    val betaMesh = Mesh(Map("beta" -> Site("beta",
      Map("documents" -> Fixtures.documentsEntity),
      Map("documents" -> Seq(betaSrc)))))
    val betaSession = new MeshSession(spark, betaMesh, "beta")
    val resultsDir = Files.createTempDirectory("graft_beta_results").toString
    val server = new RelayServer(betaSession, new QueryService(betaSession, resultsDir))
    try {
      val root = Files.createTempDirectory("graft_yaml_peer")
      Files.writeString(root.resolve("config.yaml"), alphaDocYaml(server.url))
      val mesh = ConfigLoader.loadMesh(
        Map("alpha" -> root), connectEndpointPeers = true)
      // live peer: endpoint stub with the peer's own schemas; offline: absent
      assert(mesh.sites.contains("beta_relay"))
      assert(mesh.sites("beta_relay").endpoint.contains(server.url))
      assert(mesh.sites("beta_relay").entities("documents").schema ==
        Fixtures.documentsEntity.schema)
      assert(!mesh.sites.contains("offline_relay"))
      // the web functions without the offline relay: both live slices union
      val resolved = EntityResolver.resolve(spark, mesh, "alpha", "documents")
      assert(resolved.count() == spark.table("raw_documents").count())
    } finally server.stop()
  }
}
