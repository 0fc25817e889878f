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
  *    request state).
  *
  * Rows in the shared database are OWNER-SCOPED (owner = the relay/site
  * name): a relay restores, re-runs, and evicts only its own requests —
  * never another live relay's — while [[StateBackend.lookupTask]] serves
  * any relay's request STATUS read-only, which is the sharing the
  * reference's one-Postgres deployment actually provides (each relay
  * writes its own `queries` rows, all relays can read all of them,
  * `core/src/crud/query.rs`).
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

  /** This owner's persisted request state. Iteration order of the task
    * map is FIRST-PERSIST order (oldest first) where the backend records
    * it ([[JdbcStateBackend]]'s seq column); the file backend yields its
    * snapshot's id-sorted order — the retention queue rebuilt from a
    * restore is therefore exact for the database backend and
    * deterministic-but-approximate for file snapshots. */
  def restoreTasks(): Option[(
      Map[String, (String, Option[String])],
      Map[String, Map[(String, String), (String, Option[String])]],
      Map[String, Map[String, String]])]

  /** Read-only status lookup across ALL owners — how a relay answers for
    * a request another relay over the same store executed. None for
    * single-owner backends. */
  def lookupTask(id: String): Option[(String, Option[String])] = None

  /** Read-only branch states across all owners (empty when unknown). */
  def lookupBranches(id: String): Map[(String, String), (String, Option[String])] =
    Map.empty
}

/** The JSON-snapshot backend: `mesh.json` + `tasks.json`, written
  * atomically — exactly the single-binary durability the relay had
  * before this interface existed. `tasksFile` overrides the task
  * snapshot location (RelayMain keeps its historical
  * `<results>/tasks.json` so pre-existing deployments restore their
  * request state after an upgrade). */
final class FileStateBackend(dir: Path, tasksFile: Option[Path] = None)
    extends StateBackend {
  private val meshPath = dir.resolve("mesh.json")
  private val tasksPath = tasksFile.getOrElse(dir.resolve("tasks.json"))

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
      Map[String, Map[String, String]])] = {
    // fallback covers a snapshot written to dir/tasks.json by a build
    // where tasksFile pointed elsewhere (or vice versa): restore reads
    // whichever exists, preferring the configured location
    val path = Seq(Some(tasksPath), Some(dir.resolve("tasks.json")))
      .flatten.distinct.find(Files.exists(_))
    path.map(MeshStateStore.readTasksWithSpecs(_))
  }
}

/** SQL-database state: one row per (owner, site), (owner, request) and
  * (owner, branch task) — the reference's Postgres shape. A relay's
  * persists replace only ITS OWN rows (owner-scoped full rewrite, bounded
  * by the service's terminal-request retention), so concurrent relays
  * over one database never clobber each other; any relay can READ any
  * request's status via [[lookupTask]]/[[lookupBranches]]. Each catalog
  * is likewise stored per owner — a relay restarts into its own catalog,
  * never a peer's stub of it.
  *
  * Documents reuse [[MeshStateStore]]'s JSON codec (a site row carries
  * the site doc; a task row carries status/error/spec), so file and
  * database state are interchangeable. `seq` records first-persist order
  * per request, so a restarted relay rebuilds its retention queue oldest
  * first.
  *
  * Works against any JDBC database. The test harness uses embedded Derby
  * — which shares within ONE process at a time (the sandbox ships no
  * Derby network server); a multi-PROCESS mesh points the same code at a
  * networked RDBMS URL (the reference uses Postgres) — strictly a URL
  * swap, no code change. */
final class JdbcStateBackend(url: String, owner: String = "default")
    extends StateBackend {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  locally {
    // create-if-absent schema. Two processes starting against one
    // database race the existence check, so a duplicate-table error from
    // the loser is EXPECTED — swallow it iff the table exists afterwards.
    def ensure(ddl: String, table: String): Unit = withConn { c =>
      val st = c.createStatement()
      try st.executeUpdate(ddl)
      catch {
        case e: java.sql.SQLException =>
          if (!tableExists(c, table)) throw e
      } finally st.close()
    }
    withConn { c =>
      // a table from the short-lived pre-owner schema (no owner/seq
      // columns) cannot be silently reused — fail with instructions
      // instead of a cryptic SQLSyntaxError from the first owner query
      if (tableExists(c, "GRAFT_TASKS") && !columnExists(c, "GRAFT_TASKS", "OWNER"))
        throw new IllegalStateException(
          s"$url holds a pre-owner-scoping graft_tasks table; drop the " +
            "graft_* tables (or point at a fresh database) — the schemas " +
            "are not compatible")
      if (!tableExists(c, "GRAFT_SITES"))
        ensure("CREATE TABLE graft_sites (owner VARCHAR(255), " +
          "name VARCHAR(255), doc CLOB, PRIMARY KEY (owner, name))",
          "GRAFT_SITES")
      if (!tableExists(c, "GRAFT_TASKS"))
        ensure("CREATE TABLE graft_tasks (owner VARCHAR(255), " +
          "id VARCHAR(255), status VARCHAR(32), error CLOB, spec CLOB, " +
          "seq BIGINT, PRIMARY KEY (owner, id))", "GRAFT_TASKS")
      if (!tableExists(c, "GRAFT_BRANCHES"))
        ensure("CREATE TABLE graft_branches (owner VARCHAR(255), " +
          "id VARCHAR(255), relay VARCHAR(255), src VARCHAR(255), " +
          "status VARCHAR(32), error CLOB, " +
          "PRIMARY KEY (owner, id, relay, src))", "GRAFT_BRANCHES")
      // the cross-owner status lookups predicate on id alone — without
      // this the (owner, id) PK cannot serve them and every poll scans
      val ist = c.createStatement()
      try ist.executeUpdate("CREATE INDEX graft_tasks_id ON graft_tasks (id)")
      catch { case _: java.sql.SQLException => () } // exists / concurrent creator
      finally ist.close()
    }
  }

  private def columnExists(c: Connection, table: String, col: String): Boolean = {
    val rs = c.getMetaData.getColumns(null, null, table, col)
    try rs.next() finally rs.close()
  }

  private def tableExists(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, "%", Array("TABLE"))
    try {
      while (rs.next()) if (rs.getString("TABLE_NAME").equalsIgnoreCase(name))
        return true
      false
    } finally rs.close()
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

  // first-persist sequence per request id, preserved across persists (a
  // snapshot rewrite must not reset arrival order) and reloaded on
  // construction so restarts continue the sequence
  private val seqOf = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private val nextSeq = new java.util.concurrent.atomic.AtomicLong(
    withConn { c =>
      val st = c.prepareStatement(
        "SELECT id, seq FROM graft_tasks WHERE owner = ?")
      try {
        st.setString(1, owner)
        val rs = st.executeQuery()
        var max = 0L
        while (rs.next()) {
          seqOf.put(rs.getString(1), rs.getLong(2))
          max = math.max(max, rs.getLong(2))
        }
        rs.close()
        max
      } finally st.close()
    })

  override def persistMesh(mesh: Mesh): Unit = tx { c =>
    val del = c.prepareStatement("DELETE FROM graft_sites WHERE owner = ?")
    try { del.setString(1, owner); del.executeUpdate(): Unit } finally del.close()
    val ins = c.prepareStatement(
      "INSERT INTO graft_sites (owner, name, doc) VALUES (?, ?, ?)")
    try mesh.sites.foreach { case (name, site) =>
      ins.setString(1, owner)
      ins.setString(2, name)
      ins.setString(3, MeshStateStore.siteJson(site))
      ins.executeUpdate(): Unit
    } finally ins.close()
  }

  override def restoreMesh(): Option[Mesh] = withConn { c =>
    val st = c.prepareStatement(
      "SELECT name, doc FROM graft_sites WHERE owner = ?")
    try {
      st.setString(1, owner)
      val rs = st.executeQuery()
      val sites = scala.collection.mutable.LinkedHashMap.empty[String, Site]
      while (rs.next()) {
        val name = rs.getString(1)
        sites(name) = MeshStateStore.siteFromJson(rs.getString(2)).copy(name = name)
      }
      rs.close()
      if (sites.isEmpty) None else Some(Mesh(sites.toMap))
    } finally st.close()
  }

  override def persistTasks(
      tasks: Map[String, (String, Option[String])],
      branches: Map[String, Map[(String, String), (String, Option[String])]],
      specs: Map[String, Map[String, String]]): Unit = tx { c =>
    // per-id replace WITHIN the owner scope: delete exactly the rows
    // this snapshot rewrites plus the ids this INSTANCE previously wrote
    // that have since been evicted (seqOf tracks them). An owner-blanket
    // DELETE would clobber a same-owner sibling's rows between persists;
    // note same-owner LIVE replicas remain unsupported for execution
    // (each would restore and re-run the other's in-flight requests) —
    // run one process per relay name — but a sibling's rows are never
    // silently destroyed.
    import scala.jdk.CollectionConverters._
    val evicted = seqOf.keySet.asScala.toSet -- tasks.keySet
    val delT = c.prepareStatement(
      "DELETE FROM graft_tasks WHERE owner = ? AND id = ?")
    val delB = c.prepareStatement(
      "DELETE FROM graft_branches WHERE owner = ? AND id = ?")
    try (tasks.keySet ++ branches.keySet ++ evicted).foreach { id =>
      delT.setString(1, owner); delT.setString(2, id); delT.executeUpdate(): Unit
      delB.setString(1, owner); delB.setString(2, id); delB.executeUpdate(): Unit
    } finally { delT.close(); delB.close() }
    val it = c.prepareStatement(
      "INSERT INTO graft_tasks (owner, id, status, error, spec, seq) " +
        "VALUES (?, ?, ?, ?, ?, ?)")
    try tasks.foreach { case (id, (status, err)) =>
      it.setString(1, owner)
      it.setString(2, id)
      it.setString(3, status)
      it.setString(4, err.orNull)
      it.setString(5, specs.get(id).map(specJson).orNull)
      it.setLong(6, seqOf.computeIfAbsent(id, _ => nextSeq.incrementAndGet()))
      it.executeUpdate(): Unit
    } finally it.close()
    val ib = c.prepareStatement(
      "INSERT INTO graft_branches (owner, id, relay, src, status, error) " +
        "VALUES (?, ?, ?, ?, ?, ?)")
    try branches.foreach { case (id, m) =>
      m.foreach { case ((relay, src), (status, err)) =>
        ib.setString(1, owner)
        ib.setString(2, id)
        ib.setString(3, relay)
        ib.setString(4, src)
        ib.setString(5, status)
        ib.setString(6, err.orNull)
        ib.executeUpdate(): Unit
      }
    } finally ib.close()
    // evicted ids leave the sequence map so it stays retention-bounded
    seqOf.keySet.removeIf(id => !tasks.contains(id) && !branches.contains(id)): Unit
  }

  override def restoreTasks(): Option[(
      Map[String, (String, Option[String])],
      Map[String, Map[(String, String), (String, Option[String])]],
      Map[String, Map[String, String]])] = withConn { c =>
    // VectorMap preserves insertion order, so iteration = seq order and
    // the caller's retention queue rebuilds oldest-first
    var tasks = scala.collection.immutable.VectorMap
      .empty[String, (String, Option[String])]
    var specs = Map.empty[String, Map[String, String]]
    val st = c.prepareStatement(
      "SELECT id, status, error, spec FROM graft_tasks WHERE owner = ? " +
        "ORDER BY seq")
    try {
      st.setString(1, owner)
      val rs = st.executeQuery()
      while (rs.next()) {
        val id = rs.getString(1)
        tasks = tasks.updated(id, (rs.getString(2), Option(rs.getString(3))))
        Option(rs.getString(4)).foreach(s => specs += id -> specOf(s))
      }
      rs.close()
    } finally st.close()
    var branches = Map.empty[String, Map[(String, String), (String, Option[String])]]
    val sb = c.prepareStatement(
      "SELECT id, relay, src, status, error FROM graft_branches WHERE owner = ?")
    try {
      sb.setString(1, owner)
      val rs = sb.executeQuery()
      while (rs.next()) {
        val id = rs.getString(1)
        branches += id -> (branches.getOrElse(id, Map.empty) +
          ((rs.getString(2), rs.getString(3)) ->
            (rs.getString(4), Option(rs.getString(5)))))
      }
      rs.close()
    } finally sb.close()
    if (tasks.isEmpty && branches.isEmpty) None
    else Some((tasks, branches, specs))
  }

  // A request id normally exists under ONE owner; a caller-supplied
  // request_id replayed against two relays can create two rows. Lookups
  // pick the LOWEST owner deterministically (and read that owner's
  // branches only — merging owners' branch maps would collide on
  // (relay, src)) instead of whatever the scan returns first.
  override def lookupTask(id: String): Option[(String, Option[String])] =
    withConn { c =>
      val st = c.prepareStatement(
        "SELECT status, error FROM graft_tasks WHERE id = ? " +
          "ORDER BY owner FETCH FIRST 1 ROWS ONLY")
      try {
        st.setString(1, id)
        val rs = st.executeQuery()
        val r =
          if (rs.next()) Some((rs.getString(1), Option(rs.getString(2))))
          else None
        rs.close()
        r
      } finally st.close()
    }

  override def lookupBranches(
      id: String): Map[(String, String), (String, Option[String])] =
    withConn { c =>
      val st = c.prepareStatement(
        "SELECT relay, src, status, error FROM graft_branches " +
          "WHERE id = ? AND owner = (SELECT MIN(owner) FROM graft_branches " +
          "WHERE id = ?)")
      try {
        st.setString(1, id)
        st.setString(2, id)
        val rs = st.executeQuery()
        var out = Map.empty[(String, String), (String, Option[String])]
        while (rs.next())
          out += (rs.getString(1), rs.getString(2)) ->
            (rs.getString(3), Option(rs.getString(4)))
        rs.close()
        out
      } finally st.close()
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
