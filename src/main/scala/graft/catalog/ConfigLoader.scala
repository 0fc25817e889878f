package graft.catalog

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Loads a Site catalog from the reference's `relayctl` YAML formats
  * (the per-relay `deploy/development/.../data_modeling` trees;
  * `core/src/model/config_commands/mod.rs:43-66`): multi-document files of
  * kinds Entity / LocalData / LocalMapping / PeerRelay / RemoteMapping /
  * User, applied in the reference's precedence order
  * Entity -> LocalData -> LocalMapping -> PeerRelay -> RemoteMapping -> User.
  *
  * Single-process notes:
  *  - FileDirectory connections map to Spark readers (csv/json/parquet);
  *  - Trino/FlightSQL connections are parsed and execute through the
  *    generic JDBC runner ([[JdbcSource]]) when `jdbcOverrides` supplies a
  *    reachable JDBC endpoint for the connection name (in production that
  *    is the engine's own JDBC driver, e.g. `jdbc:trino://host:port`);
  *    without an override they fall back to pre-registered temp views of
  *    the same name (the in-process stand-in for the zero-egress harness);
  *  - PeerRelay names link RemoteMappings to the peer Site in the Mesh;
  *    with `connectEndpointPeers`, a PeerRelay whose site is NOT among the
  *    loaded config dirs becomes an endpoint-backed stub registered from
  *    its live `rest_endpoint` (`/catalog` fetch — the reference's
  *    list_flights registration), and unreachable peers are skipped with
  *    the rest of the web functioning (the dev web's `offline_data_relay`
  *    semantics, `flight_server/src/flight.rs:302-307`);
  *  - User identity is the x509 file's basename (stand-in for the cert
  *    fingerprint).
  */
object ConfigLoader {

  private val mapper = new ObjectMapper(new YAMLFactory())

  final case class RawDoc(kind: String, spec: JsonNode)

  def parseDocs(file: Path): Seq[RawDoc] = {
    val parser = new YAMLFactory().createParser(file.toFile)
    val docs = mapper.readValues[JsonNode](parser, classOf[JsonNode]).readAll().asScala.toSeq
    docs.filter(d => d.hasNonNull("kind") && d.hasNonNull("spec"))
      .map(d => RawDoc(d.get("kind").asText(), d.get("spec")))
  }

  def parseTree(dir: Path): Seq[RawDoc] = {
    val files = Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".yaml") || p.toString.endsWith(".yml"))
      .toSeq.sortBy(_.toString)
    files.flatMap(parseDocs)
  }

  /** Parse a multi-document YAML string (the `POST /admin/apply` body —
    * the same ConfigCommand stream `relayctl apply` ships,
    * `relayctl/src/process.rs:17-68`). */
  def parseDocsString(yaml: String): Seq[RawDoc] = {
    val parser = new YAMLFactory().createParser(yaml)
    val docs = mapper.readValues[JsonNode](parser, classOf[JsonNode]).readAll().asScala.toSeq
    docs.filter(d => d.hasNonNull("kind") && d.hasNonNull("spec"))
      .map(d => RawDoc(d.get("kind").asText(), d.get("spec")))
  }

  private def textOpt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText())

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def parseTransformation(n: JsonNode): Transformation =
    Option(n.get("transformation")) match {
      case Some(t) if !t.isNull =>
        Transformation(
          t.get("other_to_local_info").asText(),
          textOpt(t, "replace_from").getOrElse("{v}"))
      case _ => Transformation.identity
    }

  private def parsePermission(n: JsonNode): SourcePermission =
    SourcePermission(
      arr(n, "allowed_columns").map(_.asText()).toSet,
      textOpt(n, "allowed_rows").getOrElse("false"))

  /** Build one Site from all YAML docs under `dir` (a relay's
    * data_modeling tree). `siteName` keys the site in the Mesh;
    * `peerNameToSite` maps the config's relay names (e.g.
    * `na_data_relay`) to Mesh site names. */
  def loadSite(
      siteName: String,
      dir: Path,
      peerNameToSite: Map[String, String] = Map.empty,
      jdbcOverrides: Map[String, JdbcSource] = Map.empty): Site =
    buildSite(siteName, parseTree(dir), peerNameToSite, jdbcOverrides)

  /** Build a Site from an already-parsed ConfigCommand batch — the unit an
    * admin apply ships (loadSite = buildSite over a config tree's docs). */
  def buildSite(
      siteName: String,
      docs: Seq[RawDoc],
      peerNameToSite: Map[String, String] = Map.empty,
      jdbcOverrides: Map[String, JdbcSource] = Map.empty): Site = {
    def ofKind(k: String) = docs.filter(_.kind == k).map(_.spec)

    // 1. Entities
    val entities: Map[String, Entity] = ofKind("Entity").map { spec =>
      val name = spec.get("name").asText()
      val infos = arr(spec, "information").map { i =>
        Information(i.get("name").asText(),
          ArrowLikeType.toSpark(i.get("arrow_dtype").asText()))
      }
      name -> Entity(name, infos)
    }.toMap

    // 2. LocalData: (connName, sourceName) -> physical source pieces
    final case class RawSource(
        connName: String, name: String, sourceSql: String,
        fields: Map[String, String], // field name -> physical path
        defaultPermission: SourcePermission,
        fileSource: Option[FileSource],
        jdbcSource: Option[JdbcSource])
    val rawSources: Map[(String, String), RawSource] = ofKind("LocalData").flatMap { spec =>
      val connName = spec.get("name").asText()
      val connOpts = Option(spec.get("connection_options"))
      val fileDir = connOpts.flatMap(c => Option(c.get("FileDirectory")))
      // delegated-engine connection kinds route through the JDBC runner
      // when an override gives them a reachable endpoint; the engine `user`
      // from the config carries over as the JDBC user option
      val engineUser = Seq("Trino", "FlightSQL")
        .flatMap(k => connOpts.flatMap(c => Option(c.get(k))))
        .headOption.flatMap(textOpt(_, "user"))
      val jdbc = jdbcOverrides.get(connName).map(js =>
        engineUser.filterNot(_ => js.options.contains("user"))
          .map(u => js.copy(options = js.options + ("user" -> u)))
          .getOrElse(js))
      arr(spec, "data_sources").map { s =>
        val name = s.get("name").asText()
        val srcFileOpts = Option(s.get("source_options"))
          .flatMap(o => Option(o.get("FileDirectory")))
        val fileSource = (fileDir, srcFileOpts) match {
          case (Some(_), Some(so)) =>
            val fmt = textOpt(so, "file_type").getOrElse("parquet").toLowerCase
            textOpt(so, "prefix").map(p => FileSource(fmt, p))
          case _ => None
        }
        val fields = arr(s, "fields")
          .map(f => f.get("name").asText() -> f.get("path").asText()).toMap
        val perm = Option(s.get("default_permission"))
          .map(parsePermission)
          .getOrElse(SourcePermission(fields.values.toSet, "true"))
        (connName, name) -> RawSource(
          connName, name, s.get("source_sql").asText(), fields, perm,
          fileSource, if (fileSource.isEmpty) jdbc else None)
      }
    }.toMap

    // 3. LocalMapping: entity -> DataSources with field mappings. Multiple
    // docs for the same entity (e.g. one per connection, across files)
    // MERGE cumulatively like the reference's apply loop — a last-wins
    // toMap would silently drop whole sources.
    val localSources: Map[String, Seq[DataSource]] = ofKind("LocalMapping").map { spec =>
      val entityName = spec.get("entity_name").asText()
      val sources = arr(spec, "mappings").flatMap { m =>
        val connName = m.get("data_con_name").asText()
        arr(m, "source_mappings").flatMap { sm =>
          val srcName = sm.get("data_source_name").asText()
          rawSources.get((connName, srcName)).map { raw =>
            val mappings = arr(sm, "field_mappings").map { fm =>
              // `field` names the DataField; its `path` is the physical column
              val fieldName = fm.get("field").asText()
              FieldMapping(
                fm.get("info").asText(),
                raw.fields.getOrElse(fieldName, fieldName),
                parseTransformation(fm))
            }
            DataSource(
              id = s"$connName.$srcName",
              sourceSql = raw.sourceSql,
              mappings = mappings,
              defaultPermission = raw.defaultPermission,
              fileSource = raw.fileSource,
              viewName = Some(srcName),
              jdbcSource = raw.jdbcSource)
          }
        }
      }
      entityName -> sources
    }.groupMapReduce(_._1)(_._2)(_ ++ _)

    // 4. PeerRelay names (endpoints ignored single-process)
    val peers = ofKind("PeerRelay").map(_.get("name").asText())

    // 5. RemoteMapping
    val remoteMappings: Map[String, Seq[RemoteEntityMapping]] =
      ofKind("RemoteMapping").map { spec =>
        val entityName = spec.get("entity_name").asText()
        val rms = arr(spec, "mappings").map { m =>
          val relayName = m.get("relay_name").asText()
          val remoteEntity = m.get("remote_entity_name").asText()
          val infoMappings = arr(m, "relay_mappings").map { rm =>
            // reference direction (`rest_server/src/admin/utils.rs:208-212`):
            // local_info names the LOCAL Information, info_mapped_name the
            // remote field it maps from
            RemoteInfoMapping(
              rm.get("local_info").asText(),
              rm.get("info_mapped_name").asText(),
              parseTransformation(rm))
          }
          RemoteEntityMapping(
            peer = peerNameToSite.getOrElse(relayName, relayName),
            remoteEntity = remoteEntity,
            // reference default = bare remote entity name
            // (`rest_server/src/admin/utils.rs:191-197`), i.e. an identity
            // scan — expressed as executable SQL over the placeholder
            sqlTemplate = textOpt(m, "sql").getOrElse("SELECT * FROM {remote}"),
            infoMappings = infoMappings)
        }
        entityName -> rms
      }.groupMapReduce(_._1)(_._2)(_ ++ _) // merge docs per entity, don't last-win

    // 6. Users: per-(conn, source) permissions keyed by cert basename
    val userPerms: Seq[(String, String, String, SourcePermission)] =
      ofKind("User").flatMap { spec =>
        val userId = textOpt(spec, "x509_cert_file")
          .map(p => Paths.get(p).getFileName.toString.stripSuffix(".pem"))
          .getOrElse("anonymous")
        arr(spec, "permissions").flatMap { p =>
          val connName = p.get("data_con_name").asText()
          arr(p, "source_permissions").map { sp =>
            (userId, connName, sp.get("data_source_name").asText(),
              parsePermission(sp))
          }
        }
      }

    val withUserPerms = localSources.map { case (entity, sources) =>
      entity -> sources.map { ds =>
        val perms = userPerms.collect {
          case (user, conn, src, perm) if s"$conn.$src" == ds.id => user -> perm
        }.toMap
        ds.copy(userPermissions = perms)
      }
    }

    val _ = peers // peer links are declared by RemoteMappings
    Site(siteName, entities, withUserPerms, remoteMappings)
  }

  /** PeerRelay declarations under `dir`: config relay name ->
    * `rest_endpoint`, for peers served by other processes. */
  def peerEndpoints(dir: Path): Map[String, String] =
    parseTree(dir).filter(_.kind == "PeerRelay").map(_.spec)
      .flatMap(s => textOpt(s, "rest_endpoint").map(s.get("name").asText() -> _))
      .toMap

  /** Assemble a Mesh from per-site config dirs. `sites` maps the mesh site
    * name -> config dir; `relayNames` maps reference relay names (used in
    * RemoteMapping/PeerRelay docs) -> mesh site names.
    *
    * @param connectEndpointPeers register PeerRelays that are NOT among the
    *   loaded dirs as endpoint-backed stub Sites from their live
    *   `rest_endpoint` (each stub's entity schemas come from the peer's own
    *   `/catalog`); unreachable peers are skipped — the mesh keeps working
    *   without them, exactly like the reference dev web's offline relay. */
  def loadMesh(
      sites: Map[String, Path],
      relayNames: Map[String, String] = Map.empty,
      jdbcOverrides: Map[String, JdbcSource] = Map.empty,
      connectEndpointPeers: Boolean = false): Mesh = {
    val named = sites.map { case (name, dir) =>
      name -> loadSite(name, dir, relayNames, jdbcOverrides)
    }
    if (!connectEndpointPeers) Mesh(named)
    else {
      val stubs = sites.values
        .flatMap(peerEndpoints).toMap
        .map { case (n, url) => relayNames.getOrElse(n, n) -> url }
        .filterNot { case (n, _) => named.contains(n) }
        .flatMap { case (n, url) =>
          scala.util.Try(graft.transport.RelayClient.catalogSite(url)) match {
            case scala.util.Success(stub) =>
              Some(n -> stub.copy(name = n, endpoint = Some(url)))
            case scala.util.Failure(e) =>
              System.err.println(
                s"[config] peer $n at $url unreachable, skipping: ${e.getMessage}")
              None
          }
        }
      Mesh(named ++ stubs)
    }
  }
}
