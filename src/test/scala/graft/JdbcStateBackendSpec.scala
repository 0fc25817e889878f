package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.mesh.{Fixtures, MeshRegistry, MeshSession, QueryService}

/** The SQL-database state backend (the reference's shared-Postgres shape,
  * `core/src/schema.rs:90-145`, served here by embedded Derby): catalog
  * documents and request/task rows round-trip value-exactly vs the JSON
  * snapshot codec, and two INDEPENDENT services over the same database URL
  * see one store — service 2 serves request statuses and results that
  * service 1 executed, without ever touching service 1's snapshot files.
  *
  * Embedded Derby shares within one JVM only (the sandbox has no Derby
  * network server); a multi-process mesh points the same backend at a
  * networked RDBMS URL — a URL swap, which is exactly the property this
  * spec pins at the API boundary. */
class JdbcStateBackendSpec extends AnyFunSuite {
  import org.apache.spark.sql.types._

  lazy val spark = TestSessions.spark
  private def sfDir = TestSessions.sfDir

  private lazy val derbyReady: Unit = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft_derby_state").toString)
  }

  private def freshUrl(name: String) = s"jdbc:derby:memory:$name;create=true"

  private val richMesh = Mesh(Map(
    "alpha" -> Site(
      name = "alpha",
      entities = Map(
        "documents" -> Entity("documents", Seq(
          Information("doc_id", LongType),
          Information("text", StringType),
          Information("seen", TimestampType)))),
      localSources = Map("documents" -> Seq(
        DataSource(
          id = "conn.docs",
          sourceSql = "SELECT * FROM raw_docs WHERE lang = 'en'",
          mappings = Seq(
            FieldMapping("doc_id", "id"),
            FieldMapping("text", "body", Transformation("upper({v})"))),
          defaultPermission = SourcePermission(Set("doc_id"), "doc_id > 0"),
          userPermissions = Map(
            "alice" -> SourcePermission(Set("doc_id", "text"), "true")),
          fileSource = Some(FileSource("csv", "/data/docs",
            Map("sep" -> "|"))),
          viewName = Some("raw_docs")))),
      remoteMappings = Map("documents" -> Seq(
        RemoteEntityMapping(
          peer = "beta",
          remoteEntity = "docs_remote",
          sqlTemplate = "SELECT * FROM {remote} WHERE ok",
          infoMappings = Seq(
            RemoteInfoMapping("doc_id", "rid",
              Transformation("{v} / 2"))))))),
    "beta" -> Site(
      name = "beta",
      entities = Map("docs_remote" -> Entity("docs_remote",
        Seq(Information("rid", LongType)))),
      endpoint = Some("http://token@127.0.0.1:9999"))))

  test("mesh catalog round-trips through database rows") {
    derbyReady
    val b = new JdbcStateBackend(freshUrl("graftstate_mesh"))
    assert(b.restoreMesh().isEmpty)
    b.persistMesh(richMesh)
    assert(b.restoreMesh().contains(richMesh))
    // re-persist replaces (no duplicate-row accretion)
    b.persistMesh(richMesh)
    assert(b.restoreMesh().contains(richMesh))
  }

  test("task state round-trips: statuses, errors, branches, specs") {
    derbyReady
    val b = new JdbcStateBackend(freshUrl("graftstate_tasks"))
    assert(b.restoreTasks().isEmpty)
    val tasks = Map(
      "r1" -> ("Complete", None),
      "r2" -> (("Failed", Some("boom: relation not found"))))
    val branches = Map(
      "r1" -> Map(
        ("alpha", "src/a") -> (("Complete", Option.empty[String])),
        ("beta", "src b") -> (("Failed", Some("io")))))
    val specs = Map("r2" -> Map(
      "sql" -> "SELECT 1 FROM documents",
      "user" -> "alice"))
    b.persistTasks(tasks, branches, specs)
    assert(b.restoreTasks().contains((tasks, branches, specs)))
  }

  test("two services over one database URL see one store") {
    derbyReady
    Fixtures.registerRaw(spark, sfDir)
    val url = freshUrl("graftstate_shared")
    val mesh = Mesh(Map("beta" -> Site("beta",
      entities = Map("documents" -> Fixtures.documentsEntity),
      localSources = Map("documents" -> Seq(DataSource(
        id = "docs_all",
        sourceSql = "SELECT * FROM raw_documents",
        mappings = Fixtures.documentsEntity.informations
          .map(i => FieldMapping(i.name, i.name)),
        defaultPermission = SourcePermission(
          Set("doc_id", "text", "lang", "source", "n_chars"), "true")))))))
    // shared spill dir: results live on (shared) storage, state in the DB
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc_store").toString

    // service 1 executes a request against backend instance 1
    val session1 = new MeshSession(spark, mesh, "beta")
    val svc1 = new QueryService(session1, dir,
      Some(new JdbcStateBackend(url)))
    val id = svc1.submit(
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang")
    assert(svc1.await(id).status == graft.mesh.QueryService.Complete)

    // service 2: DIFFERENT service + backend instance, same URL — the
    // request's terminal status and results are served without svc1
    val session2 = new MeshSession(spark, mesh, "beta")
    val svc2 = new QueryService(session2, dir,
      Some(new JdbcStateBackend(url)))
    assert(svc2.isTracked(id))
    assert(svc2.status(id).status == graft.mesh.QueryService.Complete)
    assert(svc2.results(id).count() > 0)

    // catalog flows the same way: registry upserts through one backend
    // are restorable from another instance over the same URL
    val reg = new MeshRegistry(mesh)
    reg.attachPersistence(new JdbcStateBackend(url))
    assert(new JdbcStateBackend(url).restoreMesh().contains(mesh))
  }

  test("concurrent services never clobber each other's rows") {
    derbyReady
    val url = freshUrl("graftstate_concurrent")
    // two LIVE relays (distinct owners) persisting interleaved
    // snapshots: each rewrites only ITS OWN rows — an unscoped rewrite
    // would delete the other's rows between its persists
    val a = new JdbcStateBackend(url, owner = "relay_a")
    val b = new JdbcStateBackend(url, owner = "relay_b")
    a.persistTasks(Map("ra" -> (("Complete", None))), Map.empty,
      Map("ra" -> Map("sql" -> "SELECT 1 FROM documents")))
    b.persistTasks(Map("rb" -> (("InProgress", None))), Map.empty, Map.empty)
    a.persistTasks(Map("ra" -> (("Complete", None))), Map.empty,
      Map("ra" -> Map("sql" -> "SELECT 1 FROM documents")))
    // each owner restores exactly its own rows; EITHER can serve the
    // other's status read-only (the reference's all-relays-read-one-
    // Postgres sharing)
    assert(new JdbcStateBackend(url, "relay_a").restoreTasks().get._1.keySet == Set("ra"))
    assert(new JdbcStateBackend(url, "relay_b").restoreTasks().get._1.keySet == Set("rb"))
    assert(a.lookupTask("rb").contains(("InProgress", None)))
    assert(b.lookupTask("ra").contains(("Complete", None)))
    // eviction stays owner-scoped: a's next snapshot without ra drops ra
    // but leaves rb untouched
    a.persistTasks(Map.empty, Map.empty, Map.empty)
    assert(new JdbcStateBackend(url, "relay_a").restoreTasks().isEmpty)
    assert(b.lookupTask("ra").isEmpty)
    assert(b.lookupTask("rb").contains(("InProgress", None)))
    // same for the catalog: two relays persisting DIFFERENT site sets
    // over one database coexist
    val siteA = Site("sa", Map("e" -> Entity("e", Seq(
      Information("x", org.apache.spark.sql.types.LongType)))))
    val siteB = Site("sb", Map("e" -> Entity("e", Seq(
      Information("x", org.apache.spark.sql.types.LongType)))))
    // catalogs are per-owner namespaces: each relay restarts into ITS
    // full catalog (including peer stubs) — never a peer's stub of it
    a.persistMesh(Mesh(Map("sa" -> siteA, "sb" -> siteB.copy(
      endpoint = Some("http://127.0.0.1:1")))))
    b.persistMesh(Mesh(Map("sb" -> siteB)))
    val aMesh = new JdbcStateBackend(url, "relay_a").restoreMesh().get
    assert(aMesh.sites.keySet == Set("sa", "sb"))
    assert(aMesh.sites("sb").endpoint.isDefined) // a's STUB of b, intact
    assert(new JdbcStateBackend(url, "relay_b").restoreMesh().get
      .sites("sb").endpoint.isEmpty) // b's authoritative self, intact
  }
}
