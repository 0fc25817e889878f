package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.{EntityResolver, Fixtures, MeshSession, QueryService}

/** Entity-resolution semantics end-to-end over the fixture mesh at sf0.001:
  * null-padding, ACL, provenance, transform-compose, cycle safety, and the
  * session/task layer. */
class ResolverSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def sfDir = TestSessions.sfDir

  test("entry flagship query returns rows (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("resolved entity covers all slices exactly once (cycle guard)") {
    val df = Fixtures.lineitemView(spark, sfDir)
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    assert(df.count() == raw.count())
    assert(df.select(sum(col("orderkey"))).head.getLong(0) ==
      raw.select(sum(col("l_orderkey"))).head.getLong(0))
  }

  test("unmapped informations null-pad; denied columns null-pad under default ACL") {
    val admin = Fixtures.lineitemView(spark, sfDir, Some("admin"))
    assert(admin.where(col("commitdate").isNotNull).count() == 0)
    assert(admin.where(col("suppkey").isNull).count() == 0)

    val default = Fixtures.lineitemView(spark, sfDir, None)
    assert(default.where(col("suppkey").isNotNull).count() == 0) // column denied
    assert(default.select(countDistinct(col("returnflag"))).head.getLong(0) == 1) // row ACL
  }

  test("two-hop transform composition is lossless for exact doubles") {
    val df = Fixtures.lineitemView(spark, sfDir)
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    assert(df.agg(sum("quantity")).head.getDouble(0) ==
      raw.agg(sum("l_quantity")).head.getDouble(0))
  }

  test("provenance identifies the executing leaf site per row") {
    val df = Fixtures.lineitemView(spark, sfDir, Some("admin"), withProvenance = true)
    val relays = df.select(collect_set(col(EntityResolver.SourceRelayCol))).head
      .getSeq[String](0).toSet
    assert(relays == Set("na_us", "emea", "apac"))
    val mism = df.where(
      (col("orderkey") % 3 === 0 && col(EntityResolver.SourceRelayCol) =!= "na_us") ||
      (col("orderkey") % 3 === 1 && col(EntityResolver.SourceRelayCol) =!= "emea") ||
      (col("orderkey") % 3 === 2 && col(EntityResolver.SourceRelayCol) =!= "apac")).count()
    assert(mism == 0)
  }

  test("MeshSession: validated SQL runs against the resolved entity") {
    Fixtures.registerRaw(spark, sfDir)
    val session = new MeshSession(spark, Fixtures.mesh, "global")
    val df = session.sql(
      "select linenumber, tax_amount from lineitem where tax_percent > 3 limit 10",
      Some("admin"))
    assert(df.count() == 10)
    assert(df.columns.toSeq == Seq("linenumber", "tax_amount"))
    // invalid entity
    intercept[graft.validation.SqlValidator.InvalidQuery] {
      session.sql("select * from nosuch", Some("admin"))
    }
  }

  test("QueryService: async submit -> Complete -> spilled parquet + NDJSON provenance") {
    Fixtures.registerRaw(spark, sfDir)
    val session = new MeshSession(spark, Fixtures.mesh, "global")
    val dir = java.nio.file.Files.createTempDirectory("graft_results").toString
    val svc = new QueryService(session, dir)
    val id = svc.submit("select orderkey, tax_amount from lineitem limit 50", Some("admin"))
    val st = svc.await(id)
    assert(st.status == QueryService.Complete, st.error.getOrElse(""))
    // per-branch execution: LIMIT applies per leaf source, like the
    // reference's 53-rows-from-limit-10 query1 (3 leaf sources here)
    assert(svc.results(id).count() == 150)
    assert(svc.results(id).select(EntityResolver.SourceRelayCol).distinct().count() == 3)
    val json = svc.resultsNdjson(id).head()
    assert(json.contains("\"_relay_metadata_\""))
    assert(json.contains("\"_source_relay_\""))

    val bad = svc.submit("insert into x values (1)", Some("admin"))
    assert(svc.await(bad).status == QueryService.Failed)
  }

  test("catalog branch enumeration matches the data's provenance (no scan)") {
    Fixtures.registerRaw(spark, sfDir)
    val static = EntityResolver
      .provenanceBranches(spark, Fixtures.mesh, "global", "lineitem").toSet
    val fromData = Fixtures.lineitemView(spark, sfDir, Some("admin"), withProvenance = true)
      .select(col(EntityResolver.SourceRelayCol), col(EntityResolver.SourceIdCol))
      .distinct().collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(static == fromData)
    assert(static.map(_._1) == Set(Some("na_us"), Some("emea"), Some("apac")))
  }

  test("provenance-dropping remote template surfaces as one (unattributed) branch") {
    Fixtures.registerRaw(spark, sfDir)
    // same 5-site mesh, but global's hop to apac projects explicit columns
    // (no SELECT *), which drops provenance for that subtree at runtime
    val base = Fixtures.mesh
    val global = base.site("global")
    val patched = base.copy(sites = base.sites + ("global" -> global.copy(
      remoteMappings = Map("lineitem" -> global.remoteMappings("lineitem").map {
        case rm if rm.peer == "apac" =>
          rm.copy(sqlTemplate =
            "SELECT orderkey, quantity, tax_amount, returnflag FROM {remote}")
        case rm => rm
      }))))

    val static = EntityResolver
      .provenanceBranches(spark, patched, "global", "lineitem").toSet
    assert(static.contains((None, None)))
    assert(static.map(_._1).intersect(Set(Option("apac"))).isEmpty)
    assert(static.size == 3) // na_us, emea, (unattributed)

    // async path: the unattributed branch still carries apac's rows
    val session = new MeshSession(spark, patched, "global")
    val dir = java.nio.file.Files.createTempDirectory("graft_nullprov").toString
    val svc = new QueryService(session, dir)
    val id = svc.submit("select orderkey, tax_amount from lineitem", Some("admin"))
    assert(svc.await(id).status == QueryService.Complete)
    assert(svc.branchStatus(id).keySet.map(_._1) ==
      Set("na_us", "emea", "(unattributed)"))
    val got = svc.results(id)
    val expected = Fixtures.lineitemView(spark, sfDir, Some("admin")).count()
    assert(got.count() == expected) // no rows silently dropped
    assert(got.where(col(EntityResolver.SourceRelayCol) === "(unattributed)")
      .count() > 0)
  }

  test("template preserving only _source_relay_ degrades per column, drops no rows") {
    Fixtures.registerRaw(spark, sfDir)
    // global's hop to apac keeps _source_relay_ but not _source_id_: the
    // runtime rows carry (apac, NULL), so the static enumeration must emit
    // (Some(apac), None) — not (None, None), which would silently drop them
    val base = Fixtures.mesh
    val global = base.site("global")
    val patched = base.copy(sites = base.sites + ("global" -> global.copy(
      remoteMappings = Map("lineitem" -> global.remoteMappings("lineitem").map {
        case rm if rm.peer == "apac" =>
          rm.copy(sqlTemplate =
            "SELECT orderkey, quantity, tax_amount, returnflag, _source_relay_ FROM {remote}")
        case rm => rm
      }))))

    val static = EntityResolver
      .provenanceBranches(spark, patched, "global", "lineitem").toSet
    assert(static.contains((Some("apac"), None)))
    assert(!static.contains((None, None)))

    val session = new MeshSession(spark, patched, "global")
    val dir = java.nio.file.Files.createTempDirectory("graft_partialprov").toString
    val svc = new QueryService(session, dir)
    val id = svc.submit("select orderkey, tax_amount from lineitem", Some("admin"))
    assert(svc.await(id).status == QueryService.Complete, svc.status(id).error.getOrElse(""))
    assert(svc.branchStatus(id).keySet.contains(("apac", "(unattributed)")))
    val got = svc.results(id)
    val expected = Fixtures.lineitemView(spark, sfDir, Some("admin")).count()
    assert(got.count() == expected) // no rows silently dropped
  }

  test("deny-all ACL'd source is omitted from branch enumeration for that user") {
    Fixtures.registerRaw(spark, sfDir)
    // apac's source denies everyone by default (reference 1=0 policy shape);
    // only admin's override reaches it
    val base = Fixtures.mesh
    val apac = base.site("apac")
    val patched = base.copy(sites = base.sites + ("apac" -> apac.copy(
      localSources = Map("lineitem" -> apac.localSources("lineitem").map(ds =>
        ds.copy(defaultPermission = ds.defaultPermission.copy(allowedRows = "1 = 0")))))))

    val anon = EntityResolver
      .provenanceBranches(spark, patched, "global", "lineitem", None).toSet
    assert(!anon.map(_._1).contains(Some("apac")))
    val admin = EntityResolver
      .provenanceBranches(spark, patched, "global", "lineitem", Some("admin")).toSet
    assert(admin.map(_._1).contains(Some("apac")))
  }

  test("relay policies gate hop-forwarded requests (Requester::Relay)") {
    import graft.catalog._
    import org.apache.spark.sql.types._
    Fixtures.registerRaw(spark, sfDir)
    val entity = Entity("li", Seq(
      Information("okey", LongType), Information("qty", DoubleType)))
    val grant = SourcePermission(
      Set("l_orderkey", "l_quantity"), "l_orderkey % 2 = 0")
    // deny-by-default source: only the relay policy for requesting peer
    // "hub" (∪'d with the empty default) grants anything
    val ds = DataSource(
      id = "b_lineitem",
      sourceSql = "SELECT * FROM raw_lineitem",
      mappings = Seq(
        FieldMapping("okey", "l_orderkey"), FieldMapping("qty", "l_quantity")),
      defaultPermission = SourcePermission(Set.empty, "false"),
      relayPermissions = Map("hub" -> grant))
    val owner = Site("owner",
      entities = Map("li" -> entity), localSources = Map("li" -> Seq(ds)))
    val hub = Site("hub",
      entities = Map("li" -> entity),
      remoteMappings = Map("li" -> Seq(RemoteEntityMapping(
        peer = "owner", remoteEntity = "li",
        infoMappings = entity.informations.map(i => RemoteInfoMapping(i.name, i.name))))))
    // a second peer with NO relay grant sees only the deny-all default
    val stranger = Site("stranger",
      entities = Map("li" -> entity),
      remoteMappings = Map("li" -> Seq(RemoteEntityMapping(
        peer = "owner", remoteEntity = "li",
        infoMappings = entity.informations.map(i => RemoteInfoMapping(i.name, i.name))))))
    val mesh = Mesh(Map("owner" -> owner, "hub" -> hub, "stranger" -> stranger))

    // direct (user-direct) request on the owner: deny-all default only
    assert(EntityResolver.resolve(spark, mesh, "owner", "li").count() == 0)
    // via the granted relay: even-orderkey rows, both columns mapped
    val viaHub = EntityResolver.resolve(spark, mesh, "hub", "li")
    assert(viaHub.count() > 0)
    assert(viaHub.where(col("okey") % 2 =!= 0).count() == 0)
    assert(viaHub.where(col("qty").isNull).count() == 0)
    // via an ungranted relay: nothing
    assert(EntityResolver.resolve(spark, mesh, "stranger", "li").count() == 0)
    // branch enumeration prunes exactly the same way
    val hubBranches = EntityResolver.provenanceBranches(spark, mesh, "hub", "li")
    val strangerBranches =
      EntityResolver.provenanceBranches(spark, mesh, "stranger", "li")
    assert(hubBranches.nonEmpty)
    assert(strangerBranches.isEmpty)
  }

  test("JSON FileDirectory sources resolve like parquet/CSV (S1)") {
    import graft.catalog._
    import org.apache.spark.sql.types._
    Fixtures.registerRaw(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_json_src").toString
    spark.table("raw_orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite").json(dir)
    val entity = Entity("jorders", Seq(
      Information("okey", LongType),
      Information("total_cents", LongType)))
    val ds = DataSource(
      id = "orders_json",
      sourceSql = "SELECT * FROM raw_orders_json WHERE o_orderstatus = 'O'",
      mappings = Seq(
        FieldMapping("okey", "o_orderkey"),
        FieldMapping("total_cents", "o_totalprice",
          Transformation("CAST(round({v} * 100) AS BIGINT)"))),
      defaultPermission = SourcePermission(
        Set("o_orderkey", "o_totalprice", "o_orderstatus"), "true"),
      fileSource = Some(FileSource("json", dir)),
      viewName = Some("raw_orders_json"))
    val mesh = Mesh(Map("site" -> Site("site",
      Map("jorders" -> entity), Map("jorders" -> Seq(ds)))))
    val df = EntityResolver.resolve(spark, mesh, "site", "jorders")
    val expect = spark.table("raw_orders").where(col("o_orderstatus") === "O")
    assert(df.count() == expect.count())
    assert(df.agg(sum(col("total_cents"))).head.getLong(0) ==
      expect.agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))).head.getLong(0))
  }

  test("brace literals in user SQL survive the mapping pipeline (query4 golden)") {
    // the reference's query4 (`test/queries.py:17-21`): `{...}` placeholders
    // inside string literals are LITERALS to the engine — template capture
    // is a client-side concern — and must not be confused with the `{v}` /
    // `{remote}` replace tokens used by Transformation/RemoteEntityMapping
    Fixtures.registerRaw(spark, sfDir)
    val session = new MeshSession(spark, Fixtures.mesh, "global")
    val braced = session.sql(
      "select linenumber, tax_percent from lineitem " +
        "where tax_percent > 3 and '{tax_val}'='{tax_val}' order by linenumber, tax_percent",
      Some("admin")).collect()
    val plain = session.sql(
      "select linenumber, tax_percent from lineitem " +
        "where tax_percent > 3 order by linenumber, tax_percent",
      Some("admin")).collect()
    assert(braced.nonEmpty)
    assert(braced.toSeq == plain.toSeq)
  }

  test("replayed request id executes once; declared return_schema is applied") {
    import org.apache.spark.sql.types._
    Fixtures.registerRaw(spark, sfDir)
    val session = new MeshSession(spark, Fixtures.mesh, "global")
    val dir = java.nio.file.Files.createTempDirectory("graft_idem").toString
    val svc = new QueryService(session, dir)
    val rid = java.util.UUID.randomUUID().toString
    val id1 = svc.submit("select orderkey, tax_amount from lineitem limit 10",
      Some("admin"), requestId = Some(rid))
    assert(id1 == rid)
    assert(svc.await(rid).status == QueryService.Complete)
    val n1 = svc.results(rid).count()
    // replay with a DIFFERENT query text: the tracked request wins
    val id2 = svc.submit("select orderkey from lineitem limit 99",
      Some("admin"), requestId = Some(rid))
    assert(id2 == rid)
    assert(svc.await(rid).status == QueryService.Complete)
    assert(svc.results(rid).count() == n1)

    // declared return schema casts the sync result column-by-column
    val schema = StructType(Seq(
      StructField("orderkey", IntegerType), StructField("tax_amount", StringType)))
    val df = session.sql("select orderkey, tax_amount from lineitem limit 5",
      Some("admin"), returnSchema = Some(schema))
    assert(df.schema("orderkey").dataType == IntegerType)
    assert(df.schema("tax_amount").dataType == StringType)
    // and the async path applies it per branch before provenance tagging
    val id3 = svc.submit("select orderkey, tax_amount from lineitem limit 5",
      Some("admin"), returnSchema = Some(schema))
    assert(svc.await(id3).status == QueryService.Complete)
    assert(svc.results(id3).schema("orderkey").dataType == IntegerType)
    assert(svc.results(id3).schema("tax_amount").dataType == StringType)
  }

  test("allow_partial: failed branch tasks don't hide completed ones") {
    Fixtures.registerRaw(spark, sfDir)
    val session = new MeshSession(spark, Fixtures.mesh, "global")
    val dir = java.nio.file.Files.createTempDirectory("graft_partial").toString
    val svc = new QueryService(session, dir)
    // ANSI division by zero only on the emea slice (orderkey % 3 = 1):
    // that branch task fails at runtime, the other two complete
    val id = svc.submit(
      """select orderkey,
        |       quantity / (case when orderkey % 3 = 1 then 0 else 1 end) as q
        |from lineitem""".stripMargin, Some("admin"))
    val st = svc.await(id)
    assert(st.status == QueryService.Failed)
    val perBranch = svc.branchStatus(id).map { case ((relay, _), s) => relay -> s.status }
    assert(perBranch("emea") == QueryService.Failed)
    assert(perBranch("na_us") == QueryService.Complete)
    assert(perBranch("apac") == QueryService.Complete)
    // strict read refuses; allow_partial returns the two completed slices
    intercept[IllegalStateException] { svc.results(id) }
    val partial = svc.results(id, allowPartial = true)
    assert(partial.select(graft.mesh.EntityResolver.SourceRelayCol)
      .distinct().collect().map(_.getString(0)).toSet == Set("na_us", "apac"))
  }
}
