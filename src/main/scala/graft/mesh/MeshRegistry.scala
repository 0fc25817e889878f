package graft.mesh

import graft.catalog._

/** Runtime-mutable catalog — the reference's dynamic-registration surface
  * rebuilt for the single-process design.
  *
  * The reference keeps its catalog in Postgres and mutates it live through
  * `POST /admin/apply` upserts (`rest_server/src/admin/utils.rs:28-270`);
  * clients then discover the current entity list at runtime via
  * `list_flights`, whose tickets carry `(entity, Vec<Information>)`
  * (`flight_server/src/flight.rs:471-494`, consumed by
  * `webengine/src/register.rs:36-90`). Here the catalog is an immutable
  * [[Mesh]] value behind a volatile reference: upserts swap in a new value
  * atomically, every [[MeshSession]] built over the registry sees the
  * current catalog on its NEXT query (in-flight queries keep the plan they
  * resolved — exactly like a reference query that started before an admin
  * apply), and [[listEntities]] is the list_flights analogue. */
class MeshRegistry(initial: Mesh) {
  @volatile private var current: Mesh = initial
  @volatile private var persistFn: Option[Mesh => Unit] = None

  def mesh: Mesh = current

  /** Snapshot the catalog to `path` now and after every subsequent
    * mutation (atomic temp+rename writes) — the reference's Postgres
    * durability for entities/mappings at single-binary scope
    * (`core/src/schema.rs:90-145`). Restore with
    * [[graft.catalog.MeshStateStore.readMesh]] before constructing the
    * registry ([[graft.tools.RelayMain]] does both). Endpoint-backed peer
    * STUBS persist too: a restarted relay re-serves its mesh without
    * re-fetching peer catalogs (and re-registers live peers on top). */
  def attachPersistence(path: java.nio.file.Path): Unit = synchronized {
    persistFn = Some(m => MeshStateStore.writeMesh(m, path))
    MeshStateStore.writeMesh(current, path)
  }

  /** Snapshot through a pluggable [[graft.catalog.StateBackend]] instead
    * of a fixed file path — the JDBC backend makes catalog upserts
    * visible to every service over the same database URL (the reference's
    * shared-Postgres deployment shape). */
  def attachPersistence(backend: graft.catalog.StateBackend): Unit = synchronized {
    persistFn = Some(backend.persistMesh)
    backend.persistMesh(current)
  }

  private def persist(): Unit = persistFn.foreach(_(current))

  /** The `list_flights` ticket payloads for one site: every entity name
    * with its typed Information list. */
  def listEntities(site: String): Seq[(String, Seq[Information])] =
    current.site(site).entities.values
      .map(e => (e.name, e.informations)).toSeq.sortBy(_._1)

  /** Upsert an Entity declaration (the `kind: Entity` admin command). */
  def upsertEntity(siteName: String, entity: Entity): Unit =
    mutateSite(siteName)(s =>
      s.copy(entities = s.entities + (entity.name -> entity)))

  /** Upsert one local DataSource for an entity (the `kind: LocalData` +
    * `kind: LocalMapping` admin commands; sources match by `id`). */
  def upsertLocalSource(siteName: String, entityName: String, ds: DataSource): Unit =
    mutateSite(siteName) { s =>
      val prev = s.localSources.getOrElse(entityName, Nil)
      val next = prev.filterNot(_.id == ds.id) :+ ds
      s.copy(localSources = s.localSources + (entityName -> next))
    }

  /** Upsert a remote mapping (the `kind: RemoteMapping` admin command;
    * mappings match by (peer, remoteEntity)). */
  def upsertRemoteMapping(
      siteName: String, entityName: String, rm: RemoteEntityMapping): Unit =
    mutateSite(siteName) { s =>
      val prev = s.remoteMappings.getOrElse(entityName, Nil)
      val next = prev.filterNot(m =>
        m.peer == rm.peer && m.remoteEntity == rm.remoteEntity) :+ rm
      s.copy(remoteMappings = s.remoteMappings + (entityName -> next))
    }

  /** Remove an entity (and its sources/mappings) from a site. */
  def dropEntity(siteName: String, entityName: String): Unit =
    mutateSite(siteName)(s => s.copy(
      entities = s.entities - entityName,
      localSources = s.localSources - entityName,
      remoteMappings = s.remoteMappings - entityName))

  /** Merge a whole config-loaded site (relayctl `apply -f dir/` shape):
    * entities, sources, and remote mappings upsert in the reference's
    * precedence order (`core/src/model/config_commands/mod.rs:52-66`). */
  def applySite(site: Site): Unit = synchronized {
    site.entities.values.foreach(upsertEntity(site.name, _))
    for ((e, dss) <- site.localSources; ds <- dss) upsertLocalSource(site.name, e, ds)
    for ((e, rms) <- site.remoteMappings; rm <- rms) upsertRemoteMapping(site.name, e, rm)
  }

  private def mutateSite(siteName: String)(f: Site => Site): Unit =
    synchronized {
      val s = current.sites.getOrElse(siteName, Site(siteName, Map.empty))
      current = Mesh(current.sites + (siteName -> f(s)))
      persist()
    }
}
