package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Durable single-binary state: JSON snapshots of the live catalog
  * ([[Mesh]]) and of request/task bookkeeping, written atomically
  * (temp + rename) next to the result spill.
  *
  * The reference persists entities/mappings/requests/tasks in Postgres
  * (`core/src/schema.rs:90-145`) so a relay restart loses nothing; this is
  * that durability at single-binary scope — the snapshot is the "database",
  * the config tree is only the first-boot seed. Restore order in
  * [[graft.tools.RelayMain]]: snapshot if present, else config; admin
  * applies then keep the snapshot current via
  * [[graft.mesh.MeshRegistry.attachPersistence]].
  *
  * Dtypes cross as the same Arrow-style strings the config format and
  * `/catalog` use ([[ArrowLikeType]]), so a snapshot is engine-portable
  * and human-diffable. Round-trip exactness is spec-pinned
  * (LocalLayoutSpec's sibling `MeshStateSpec`).
  */
object MeshStateStore {

  private val mapper = new ObjectMapper()

  /** Atomic write: the snapshot is either the old state or the new one,
    * never a torn file (a crash mid-write must not poison restart). */
  private def writeAtomic(path: Path, bytes: Array[Byte]): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  // ---- mesh codec --------------------------------------------------------

  private def permNode(p: SourcePermission): ObjectNode = {
    val o = mapper.createObjectNode()
    val cols = o.putArray("allowed_columns")
    p.allowedColumns.toSeq.sorted.foreach(cols.add)
    o.put("allowed_rows", p.allowedRows)
    o
  }

  private def permOf(n: JsonNode): SourcePermission =
    SourcePermission(
      n.get("allowed_columns").elements().asScala.map(_.asText()).toSet,
      n.get("allowed_rows").asText())

  private def transformNode(t: Transformation): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("template", t.template)
    o.put("replace_from", t.replaceFrom)
    o
  }

  private def transformOf(n: JsonNode): Transformation =
    Transformation(n.get("template").asText(), n.get("replace_from").asText())

  private def permMap(o: ObjectNode, field: String,
      m: Map[String, SourcePermission]): Unit =
    if (m.nonEmpty) {
      val n = o.putObject(field)
      m.toSeq.sortBy(_._1).foreach { case (k, p) => n.set[ObjectNode](k, permNode(p)): Unit }
    }

  private def permMapOf(n: JsonNode, field: String): Map[String, SourcePermission] =
    Option(n.get(field)).map(_.properties().asScala
      .map(e => e.getKey -> permOf(e.getValue)).toMap).getOrElse(Map.empty)

  private def sourceNode(ds: DataSource): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", ds.id)
    o.put("source_sql", ds.sourceSql)
    val ms = o.putArray("mappings")
    ds.mappings.foreach { fm =>
      val m = ms.addObject()
      m.put("info", fm.info)
      m.put("field_path", fm.fieldPath)
      if (fm.transform != Transformation.identity)
        m.set[ObjectNode]("transform", transformNode(fm.transform)): Unit
    }
    o.set[ObjectNode]("default_permission", permNode(ds.defaultPermission)): Unit
    permMap(o, "user_permissions", ds.userPermissions)
    permMap(o, "relay_permissions", ds.relayPermissions)
    ds.fileSource.foreach { fs =>
      val f = o.putObject("file_source")
      f.put("format", fs.format)
      f.put("path", fs.path)
      if (fs.options.nonEmpty) {
        val op = f.putObject("options")
        fs.options.toSeq.sortBy(_._1).foreach { case (k, v) => op.put(k, v) }
      }
    }
    ds.viewName.foreach(o.put("view_name", _))
    ds.jdbcSource.foreach { js =>
      val j = o.putObject("jdbc_source")
      j.put("url", js.url)
      if (js.options.nonEmpty) {
        val op = j.putObject("options")
        js.options.toSeq.sortBy(_._1).foreach { case (k, v) => op.put(k, v) }
      }
    }
    o
  }

  private def strMapOf(n: JsonNode, field: String): Map[String, String] =
    Option(n.get(field)).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)

  private def sourceOf(n: JsonNode): DataSource =
    DataSource(
      id = n.get("id").asText(),
      sourceSql = n.get("source_sql").asText(),
      mappings = n.get("mappings").elements().asScala.map { m =>
        FieldMapping(m.get("info").asText(), m.get("field_path").asText(),
          Option(m.get("transform")).map(transformOf)
            .getOrElse(Transformation.identity))
      }.toSeq,
      defaultPermission = permOf(n.get("default_permission")),
      userPermissions = permMapOf(n, "user_permissions"),
      relayPermissions = permMapOf(n, "relay_permissions"),
      fileSource = Option(n.get("file_source")).map(f =>
        FileSource(f.get("format").asText(), f.get("path").asText(),
          strMapOf(f, "options"))),
      viewName = Option(n.get("view_name")).map(_.asText()),
      jdbcSource = Option(n.get("jdbc_source")).map(j =>
        JdbcSource(j.get("url").asText(), strMapOf(j, "options"))))

  private def siteNode(site: Site): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", site.name)
    site.endpoint.foreach(o.put("endpoint", _))
    val ents = o.putObject("entities")
    site.entities.toSeq.sortBy(_._1).foreach { case (name, e) =>
      val infos = ents.putObject(name).putArray("informations")
      e.informations.foreach { i =>
        val io = infos.addObject()
        io.put("name", i.name)
        io.put("dtype", ArrowLikeType.fromSpark(i.dtype))
      }
    }
    def perEntity[A](field: String, m: Map[String, Seq[A]])(render: A => ObjectNode): Unit =
      if (m.nonEmpty) {
        val n = o.putObject(field)
        m.toSeq.sortBy(_._1).foreach { case (entity, xs) =>
          val arr: ArrayNode = n.putArray(entity)
          xs.foreach(x => arr.add(render(x)))
        }
      }
    perEntity("local_sources", site.localSources)(sourceNode)
    perEntity("remote_mappings", site.remoteMappings) { rm =>
      val r = mapper.createObjectNode()
      r.put("peer", rm.peer)
      r.put("remote_entity", rm.remoteEntity)
      r.put("sql_template", rm.sqlTemplate)
      val ims = r.putArray("info_mappings")
      rm.infoMappings.foreach { im =>
        val io = ims.addObject()
        io.put("local_info", im.localInfo)
        io.put("remote_info", im.remoteInfo)
        if (im.transform != Transformation.identity)
          io.set[ObjectNode]("transform", transformNode(im.transform)): Unit
      }
      r
    }
    o
  }

  private def siteOf(n: JsonNode): Site =
    Site(
      name = n.get("name").asText(),
      entities = n.get("entities").properties().asScala.map { e =>
        e.getKey -> Entity(e.getKey,
          e.getValue.get("informations").elements().asScala.map(i =>
            Information(i.get("name").asText(),
              ArrowLikeType.toSpark(i.get("dtype").asText()))).toSeq)
      }.toMap,
      localSources = Option(n.get("local_sources")).map(_.properties().asScala
        .map(e => e.getKey ->
          e.getValue.elements().asScala.map(sourceOf).toSeq).toMap)
        .getOrElse(Map.empty),
      remoteMappings = Option(n.get("remote_mappings")).map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.elements().asScala.map { r =>
          RemoteEntityMapping(
            peer = r.get("peer").asText(),
            remoteEntity = r.get("remote_entity").asText(),
            sqlTemplate = r.get("sql_template").asText(),
            infoMappings = r.get("info_mappings").elements().asScala.map { im =>
              RemoteInfoMapping(im.get("local_info").asText(),
                im.get("remote_info").asText(),
                Option(im.get("transform")).map(transformOf)
                  .getOrElse(Transformation.identity))
            }.toSeq)
        }.toSeq).toMap).getOrElse(Map.empty),
      endpoint = Option(n.get("endpoint")).map(_.asText()))

  /** One site's catalog as a standalone JSON document — the unit a
    * row-per-site store ([[JdbcStateBackend]]) persists, reusing the
    * snapshot codec verbatim so both backends are value-compatible. */
  def siteJson(site: Site): String =
    mapper.writeValueAsString(siteNode(site))

  def siteFromJson(doc: String): Site =
    siteOf(mapper.readTree(doc))

  def writeMesh(mesh: Mesh, path: Path): Unit = {
    val root = mapper.createObjectNode()
    val sites = root.putObject("sites")
    mesh.sites.toSeq.sortBy(_._1).foreach { case (name, site) =>
      sites.set[ObjectNode](name, siteNode(site)): Unit
    }
    writeAtomic(path, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
  }

  def readMesh(path: Path): Mesh = {
    val root = mapper.readTree(Files.readString(path, UTF_8))
    Mesh(root.get("sites").properties().asScala
      .map(e => e.getKey -> siteOf(e.getValue).copy(name = e.getKey)).toMap)
  }

  // ---- task-state codec --------------------------------------------------

  /** (request id -> state, request id -> branch states). Status crosses as
    * its case-object name; branch keys as relay + NUL + source (relay names
    * may contain the '/' a path-ish separator would split on). `specs`
    * optionally carries each request's submission payload (flat
    * string-map: sql/user/...) so a restarted service can RE-RUN requests
    * caught non-terminal — the reference's broker redelivery against its
    * persisted request rows. */
  def writeTasks(
      tasks: Map[String, (String, Option[String])],
      branches: Map[String, Map[(String, String), (String, Option[String])]],
      path: Path,
      specs: Map[String, Map[String, String]] = Map.empty): Unit = {
    val root = mapper.createObjectNode()
    val ts = root.putObject("tasks")
    tasks.toSeq.sortBy(_._1).foreach { case (id, (status, err)) =>
      val o = ts.putObject(id)
      o.put("status", status)
      err.foreach(o.put("error", _))
      specs.get(id).foreach { sp =>
        val s = o.putObject("spec")
        sp.toSeq.sortBy(_._1).foreach { case (k, v) => s.put(k, v) }
      }
    }
    val bs = root.putObject("branches")
    branches.toSeq.sortBy(_._1).foreach { case (id, m) =>
      val o = bs.putObject(id)
      m.toSeq.sortBy(_._1).foreach { case ((relay, src), (status, err)) =>
        val b = o.putObject(relay + "\u0000" + src)
        b.put("status", status)
        err.foreach(b.put("error", _))
      }
    }
    writeAtomic(path, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
  }

  def readTasks(path: Path): (
      Map[String, (String, Option[String])],
      Map[String, Map[(String, String), (String, Option[String])]]) = {
    val (t, b, _) = readTasksWithSpecs(path)
    (t, b)
  }

  def readTasksWithSpecs(path: Path): (
      Map[String, (String, Option[String])],
      Map[String, Map[(String, String), (String, Option[String])]],
      Map[String, Map[String, String]]) = {
    val root = mapper.readTree(Files.readString(path, UTF_8))
    def stateOf(n: JsonNode): (String, Option[String]) =
      (n.get("status").asText(), Option(n.get("error")).map(_.asText()))
    // VectorMap keeps the document's (id-sorted) order so the restored
    // retention queue is deterministic — .toMap would hash-scramble it
    val tasks = root.get("tasks").properties().asScala
      .foldLeft(scala.collection.immutable.VectorMap
        .empty[String, (String, Option[String])]) { (m, e) =>
        m.updated(e.getKey, stateOf(e.getValue))
      }
    val specs = root.get("tasks").properties().asScala.flatMap { e =>
      Option(e.getValue.get("spec")).map(s =>
        e.getKey -> s.properties().asScala
          .map(f => f.getKey -> f.getValue.asText()).toMap)
    }.toMap
    val branches = root.get("branches").properties().asScala.map { e =>
      e.getKey -> e.getValue.properties().asScala.map { b =>
        val Array(relay, src) = b.getKey.split("\u0000", 2)
        (relay, src) -> stateOf(b.getValue)
      }.toMap
    }.toMap
    (tasks, branches, specs)
  }
}
