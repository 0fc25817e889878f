package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** The durable-state codecs round-trip EXACTLY: a mesh snapshot must
  * restore to the same catalog value (every field — transforms,
  * per-user/relay permissions, file/jdbc physical bindings, peer stubs),
  * and task bookkeeping must restore its statuses. A lossy snapshot would
  * silently change ACLs or mappings across a relay restart — worse than no
  * durability. */
class MeshStateSpec extends AnyFunSuite {
  import org.apache.spark.sql.types._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("graft_state").resolve(name)

  private val richMesh = Mesh(Map(
    "alpha" -> Site(
      name = "alpha",
      entities = Map(
        "documents" -> Entity("documents", Seq(
          Information("doc_id", LongType),
          Information("text", StringType),
          Information("score", DoubleType),
          Information("seen", TimestampType))),
        "events" -> Entity("events", Seq(
          Information("id", IntegerType),
          Information("flag", BooleanType)))),
      localSources = Map("documents" -> Seq(
        DataSource(
          id = "conn.docs_main",
          sourceSql = "SELECT *, n * 2 AS n2 FROM raw_docs WHERE lang = 'en'",
          mappings = Seq(
            FieldMapping("doc_id", "id"),
            FieldMapping("text", "body", Transformation("upper({v})")),
            FieldMapping("score", "s")),
          defaultPermission = SourcePermission(Set("doc_id", "text"), "doc_id > 0"),
          userPermissions = Map(
            "alice" -> SourcePermission(Set("doc_id", "text", "score"), "true")),
          relayPermissions = Map(
            "beta" -> SourcePermission(Set("doc_id"), "doc_id % 2 = 0")),
          fileSource = Some(FileSource("csv", "/data/docs",
            Map("sep" -> "|", "header" -> "false"))),
          viewName = Some("raw_docs"),
          jdbcSource = None),
        DataSource(
          id = "conn.docs_jdbc",
          sourceSql = "SELECT * FROM t",
          mappings = Seq(FieldMapping("doc_id", "id")),
          defaultPermission = SourcePermission(Set("doc_id"), "true"),
          jdbcSource = Some(JdbcSource("jdbc:derby:memory:x",
            Map("user" -> "u", "fetchsize" -> "100")))))),
      remoteMappings = Map("documents" -> Seq(
        RemoteEntityMapping(
          peer = "beta",
          remoteEntity = "docs_remote",
          sqlTemplate = "SELECT * FROM {remote} WHERE ok",
          infoMappings = Seq(
            RemoteInfoMapping("doc_id", "rid"),
            RemoteInfoMapping("score", "rs", Transformation("{v} / 2"))))))),
    "beta" -> Site(
      name = "beta",
      entities = Map("docs_remote" -> Entity("docs_remote",
        Seq(Information("rid", LongType)))),
      endpoint = Some("http://token@127.0.0.1:9999"))))

  test("mesh snapshot round-trips every catalog field") {
    val p = tmp("mesh.json")
    MeshStateStore.writeMesh(richMesh, p)
    assert(MeshStateStore.readMesh(p) == richMesh)
  }

  test("snapshot write is atomic: a successful write replaces, tmp never lingers") {
    val p = tmp("mesh.json")
    MeshStateStore.writeMesh(richMesh, p)
    MeshStateStore.writeMesh(richMesh, p) // overwrite path
    assert(java.nio.file.Files.exists(p))
    assert(!java.nio.file.Files.exists(
      p.resolveSibling(p.getFileName.toString + ".tmp")))
  }

  test("task bookkeeping round-trips statuses, errors, and branch keys") {
    val p = tmp("tasks.json")
    val tasks = Map(
      "id-1" -> ("Complete", None: Option[String]),
      "id-2" -> ("Failed", Some("boom")),
      "id-3" -> ("InProgress", None: Option[String]))
    val branches = Map(
      "id-1" -> Map(
        ("global", "conn.docs_main") -> (("Complete", None: Option[String])),
        ("beta/gamma", "src with spaces") -> (("Failed", Some("peer died")))),
      "id-2" -> Map(
        ("(unattributed)", "(unattributed)") -> (("Complete", None: Option[String]))))
    MeshStateStore.writeTasks(tasks, branches, p)
    assert(MeshStateStore.readTasks(p) == ((tasks, branches)))
  }

  test("the reference dev-web configs survive a snapshot round-trip verbatim") {
    // config-tree -> Mesh -> snapshot -> restore must be a fixed point on
    // the reference's own relay definitions (decimals, transforms,
    // per-user permissions, CSV file sources — the full surface)
    val refDeploy = java.nio.file.Paths.get("/root/reference/deploy/development")
    org.scalatest.Assertions.assume(java.nio.file.Files.isDirectory(refDeploy))
    val relays = Seq("global_data_relay", "na_data_relay", "na_us_data_relay",
      "emea_data_relay", "apac_data_relay")
    val mesh = Mesh(relays.map { r =>
      r -> ConfigLoader.loadSite(r, refDeploy.resolve(r).resolve("data_modeling"))
    }.toMap)
    val p = tmp("refmesh.json")
    MeshStateStore.writeMesh(mesh, p)
    assert(MeshStateStore.readMesh(p) == mesh)
  }

  test("registry persistence: every upsert re-snapshots; restore sees the mutation") {
    val p = tmp("mesh.json")
    val reg = new graft.mesh.MeshRegistry(richMesh)
    reg.attachPersistence(p)
    assert(MeshStateStore.readMesh(p) == richMesh)
    reg.upsertEntity("alpha", Entity("fresh", Seq(Information("x", LongType))))
    val restored = MeshStateStore.readMesh(p)
    assert(restored.site("alpha").entities.contains("fresh"))
    assert(restored == reg.mesh)
  }
}
