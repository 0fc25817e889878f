package graft.catalog

import java.nio.file.{Files, Path}
import java.sql.{Connection, DriverManager}

/** Pluggable durability for a relay's two state families — the catalog
  * ([[Mesh]]) and request/task bookkeeping — behind one interface, so a
  * relay chooses its durability scope at startup:
  *
  *  - [[FileStateBackend]] (default): the JSON snapshots
  *    ([[MeshStateStore]]) beside the result spill — single-binary
  *    durability, zero dependencies;
  *  - [[JdbcStateBackend]]: rows in a shared SQL database — the
  *    reference's actual deployment shape, where every relay process
  *    reads/writes one Postgres (`core/src/schema.rs:90-145`: entities/
  *    mappings in catalog tables, `queries`/`query_tasks` rows for
  *    request state). Multiple services over one URL see one store.
  *
  * Both backends carry the SAME documents (the JSON codec is shared), so
  * switching backends — or migrating file → database — is a data copy,
  * not a format change.
  */
trait StateBackend {
  def persistMesh(mesh: Mesh): Unit
  def restoreMesh(): Option[Mesh]
  def persistTasks(
      tasks: Map[String, (String, Option[String])],
      branches: Map[String, Map[(String, String), (String, Option[String])]],
      specs: Map[String, Map[String, String]]): Unit
  def restoreTasks(): Option[(
      Map[String, (String, Option[String])],
      Map[String, Map[(String, String), (String, Option[String])]],
      Map[String, Map[String, String]])]
}

/** The JSON-snapshot backend: `mesh.json` + `tasks.json` under `dir`,
  * written atomically — exactly the single-binary durability the relay
  * had before this interface existed. */
final class FileStateBackend(dir: Path) extends StateBackend {
  private val meshPath = dir.resolve("mesh.json")
  private val tasksPath = dir.resolve("tasks.json")

  override def persistMesh(mesh: Mesh): Unit =
    MeshStateStore.writeMesh(mesh, meshPath)

  override def restoreMesh(): Option[Mesh] =
    if (Files.exists(meshPath)) Some(MeshStateStore.readMesh(meshPath)) else None

  override def persistTasks(
      tasks: Map[String, (String, Option[String])],
      branches: Map[String, Map[(String, String), (String, Option[String])]],
      specs: Map[String, Map[String, String]]): Unit =
    MeshStateStore.writeTasks(tasks, branches, tasksPath, specs)

  override def restoreTasks(): Option[(
      Map[String, (String, Option[String])],
      Map[String, Map[(String, String), (String, Option[String])]],
      Map[String, Map[String, String]])] =
    if (Files.exists(tasksPath)) Some(MeshStateStore.readTasksWithSpecs(tasksPath))
    else None
}

/** SQL-database state: one row per site (`graft_sites`), per request
  * (`graft_tasks`) and per branch task (`graft_branches`) — the
  * reference's Postgres shape at the granularity that matters for
  * sharing: any service over the same URL sees every other's catalog
  * upserts and request statuses (`core/src/schema.rs:90-145`,
  * `core/src/crud/query.rs`).
  *
  * Documents reuse [[MeshStateStore]]'s JSON codec (a site row carries
  * the site doc; a task row carries status/error/spec), so file and
  * database state are interchangeable. Writes replace state
  * transactionally; volumes are bounded by the service's terminal-request
  * retention, so the per-transition rewrite stays rows-not-history sized.
  *
  * Works against any JDBC database. The test harness uses embedded Derby
  * — which shares within ONE process only (the sandbox ships no Derby
  * network server); a multi-PROCESS mesh points the same code at a
  * networked RDBMS URL (the reference uses Postgres) — strictly a URL
  * swap, no code change. */
final class JdbcStateBackend(url: String) extends StateBackend {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  locally { // create-if-absent schema, first connection wins
    withConn { c =>
      val existing = {
        val rs = c.getMetaData.getTables(null, null, "%", Array("TABLE"))
        val names = scala.collection.mutable.Set.empty[String]
        while (rs.next()) names += rs.getString("TABLE_NAME").toUpperCase
        rs.close()
        names
      }
      val st = c.createStatement()
      try {
        if (!existing("GRAFT_SITES"))
          st.executeUpdate(
            "CREATE TABLE graft_sites (name VARCHAR(255) PRIMARY KEY, doc CLOB)")
        if (!existing("GRAFT_TASKS"))
          st.executeUpdate(
            "CREATE TABLE graft_tasks (id VARCHAR(255) PRIMARY KEY, " +
              "status VARCHAR(32), error CLOB, spec CLOB)")
        if (!existing("GRAFT_BRANCHES"))
          st.executeUpdate(
            "CREATE TABLE graft_branches (id VARCHAR(255), relay VARCHAR(255), " +
              "src VARCHAR(255), status VARCHAR(32), error CLOB, " +
              "PRIMARY KEY (id, relay, src))")
      } finally st.close()
    }
  }

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def tx[A](f: Connection => A): A = withConn { c =>
    c.setAutoCommit(false)
    try { val r = f(c); c.commit(); r }
    catch { case e: Throwable => c.rollback(); throw e }
  }

  // Site names THIS instance has written (same scoping rationale as
  // writtenIds below): a relay re-snapshotting its catalog must not
  // delete site rows another relay over the same database owns.
  private val writtenSites =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def persistMesh(mesh: Mesh): Unit = tx { c =>
    import scala.jdk.CollectionConverters._
    val gone = writtenSites.asScala.toSet -- mesh.sites.keySet
    val del = c.prepareStatement("DELETE FROM graft_sites WHERE name = ?")
    try (mesh.sites.keySet ++ gone).foreach { name =>
      del.setString(1, name); del.executeUpdate(): Unit
    } finally del.close()
    val ins = c.prepareStatement(
      "INSERT INTO graft_sites (name, doc) VALUES (?, ?)")
    try mesh.sites.foreach { case (name, site) =>
      ins.setString(1, name)
      ins.setString(2, MeshStateStore.siteJson(site))
      ins.executeUpdate(): Unit
    } finally ins.close()
    gone.foreach(writtenSites.remove(_))
    mesh.sites.keySet.foreach(writtenSites.add(_))
  }

  override def restoreMesh(): Option[Mesh] = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery("SELECT name, doc FROM graft_sites")
      val sites = scala.collection.mutable.LinkedHashMap.empty[String, Site]
      while (rs.next()) {
        val name = rs.getString(1)
        sites(name) = MeshStateStore.siteFromJson(rs.getString(2)).copy(name = name)
      }
      rs.close()
      if (sites.isEmpty) None else Some(Mesh(sites.toMap))
    } finally st.close()
  }

  // Request ids THIS instance has ever written — the eviction scope.
  // persistTasks receives a service's full in-memory snapshot; rows the
  // snapshot no longer carries are deleted ONLY if this instance wrote
  // them (its service evicted them past retention). A blanket
  // delete-and-reinsert would clobber rows a CONCURRENT service over the
  // same database owns — the exact sharing the reference's one-Postgres
  // deployment provides (each relay upserts its own request rows,
  // `core/src/crud/query.rs`).
  private val writtenIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def persistTasks(
      tasks: Map[String, (String, Option[String])],
      branches: Map[String, Map[(String, String), (String, Option[String])]],
      specs: Map[String, Map[String, String]]): Unit = tx { c =>
    import scala.jdk.CollectionConverters._
    val evicted = writtenIds.asScala.toSet -- tasks.keySet
    val delT = c.prepareStatement("DELETE FROM graft_tasks WHERE id = ?")
    val delB = c.prepareStatement("DELETE FROM graft_branches WHERE id = ?")
    try {
      // per-id replace: delete THIS request's rows, insert the current
      // state — portable upsert, scoped so other services' rows survive
      (tasks.keySet ++ branches.keySet ++ evicted).foreach { id =>
        delT.setString(1, id); delT.executeUpdate(): Unit
        delB.setString(1, id); delB.executeUpdate(): Unit
      }
    } finally { delT.close(); delB.close() }
    val it = c.prepareStatement(
      "INSERT INTO graft_tasks (id, status, error, spec) VALUES (?, ?, ?, ?)")
    try tasks.foreach { case (id, (status, err)) =>
      it.setString(1, id)
      it.setString(2, status)
      it.setString(3, err.orNull)
      it.setString(4, specs.get(id).map(specJson).orNull)
      it.executeUpdate(): Unit
    } finally it.close()
    val ib = c.prepareStatement(
      "INSERT INTO graft_branches (id, relay, src, status, error) " +
        "VALUES (?, ?, ?, ?, ?)")
    try branches.foreach { case (id, m) =>
      m.foreach { case ((relay, src), (status, err)) =>
        ib.setString(1, id)
        ib.setString(2, relay)
        ib.setString(3, src)
        ib.setString(4, status)
        ib.setString(5, err.orNull)
        ib.executeUpdate(): Unit
      }
    } finally ib.close()
    evicted.foreach(writtenIds.remove(_))
    (tasks.keySet ++ branches.keySet).foreach(writtenIds.add(_))
  }

  override def restoreTasks(): Option[(
      Map[String, (String, Option[String])],
      Map[String, Map[(String, String), (String, Option[String])]],
      Map[String, Map[String, String]])] = withConn { c =>
    val tasks = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, Option[String])]
    val specs = scala.collection.mutable.LinkedHashMap
      .empty[String, Map[String, String]]
    val st = c.createStatement()
    try {
      val rs = st.executeQuery("SELECT id, status, error, spec FROM graft_tasks")
      while (rs.next()) {
        val id = rs.getString(1)
        tasks(id) = (rs.getString(2), Option(rs.getString(3)))
        Option(rs.getString(4)).foreach(s => specs(id) = specOf(s))
      }
      rs.close()
    } finally st.close()
    val branches = scala.collection.mutable.LinkedHashMap
      .empty[String, Map[(String, String), (String, Option[String])]]
    val sb = c.createStatement()
    try {
      val rs = sb.executeQuery(
        "SELECT id, relay, src, status, error FROM graft_branches")
      while (rs.next()) {
        val id = rs.getString(1)
        branches(id) = branches.getOrElse(id, Map.empty) +
          ((rs.getString(2), rs.getString(3)) ->
            (rs.getString(4), Option(rs.getString(5))))
      }
      rs.close()
    } finally sb.close()
    if (tasks.isEmpty && branches.isEmpty) None
    else Some((tasks.toMap, branches.toMap, specs.toMap))
  }

  private def specJson(m: Map[String, String]): String = {
    val o = mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
    mapper.writeValueAsString(o)
  }

  private def specOf(doc: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    mapper.readTree(doc).properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
  }
}
