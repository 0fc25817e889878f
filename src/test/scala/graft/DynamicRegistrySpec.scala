package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.mesh.{Fixtures, MeshRegistry, MeshSession}

/** Dynamic entity registration (the reference's runtime-catalog surface):
  * admin upserts change what a LIVE session can query, and `listEntities`
  * mirrors `list_flights`'s (entity, Information list) tickets
  * (`flight_server/src/flight.rs:471-494`, `webengine/src/register.rs:36-90`,
  * `rest_server/src/admin/utils.rs:28-270`). */
class DynamicRegistrySpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private def freshRegistry: MeshRegistry = new MeshRegistry(Fixtures.mesh)

  test("an entity registered mid-session becomes queryable; list reflects it") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val reg = freshRegistry
    val session = new MeshSession(spark, reg, "global")

    // not registered yet: the same query fails with the not-found error
    val e = intercept[graft.validation.SqlValidator.InvalidQuery](
      session.sql("select rname from regions2 limit 2"))
    assert(e.getMessage.contains("Entity regions2 not found"))
    assert(!reg.listEntities("global").exists(_._1 == "regions2"))

    // admin apply: Entity + LocalData upserts on the LIVE registry
    reg.upsertEntity("global", Entity("regions2", Seq(
      Information("rkey", LongType),
      Information("rname", StringType))))
    reg.upsertLocalSource("global", "regions2", DataSource(
      id = "global_region_parquet",
      sourceSql = "SELECT * FROM raw_region",
      mappings = Seq(
        FieldMapping("rkey", "r_regionkey"),
        FieldMapping("rname", "r_name")),
      defaultPermission = SourcePermission(Set("r_regionkey", "r_name"), "true")))

    // the SAME session object answers the query now
    val rows = session.sql("select rkey, rname from regions2 order by rkey")
    assert(rows.count() == 5)
    assert(reg.listEntities("global").exists { case (n, infos) =>
      n == "regions2" && infos.map(_.name) == Seq("rkey", "rname")
    })
  }

  test("upserting a source updates mappings in place (matched by id)") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val reg = freshRegistry
    val session = new MeshSession(spark, reg, "global")
    reg.upsertEntity("global", Entity("r3", Seq(Information("k", LongType))))
    def src(t: Transformation) = DataSource(
      id = "r3_src", sourceSql = "SELECT * FROM raw_region",
      mappings = Seq(FieldMapping("k", "r_regionkey", t)),
      defaultPermission = SourcePermission(Set("r_regionkey"), "true"))
    reg.upsertLocalSource("global", "r3", src(Transformation.identity))
    val before = session.sql("select k from r3 order by k").collect().map(_.getLong(0))
    // live transform change: k now maps through {v} * 10
    reg.upsertLocalSource("global", "r3", src(Transformation("{v} * 10")))
    val after = session.sql("select k from r3 order by k").collect().map(_.getLong(0))
    assert(after.toSeq == before.map(_ * 10).toSeq)
    // still exactly one source branch (upsert, not append)
    assert(reg.mesh.site("global").localSources("r3").size == 1)
  }

  test("dropEntity revokes a registered entity from the live session") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val reg = freshRegistry
    val session = new MeshSession(spark, reg, "global")
    assert(session.sql("select custkey from customer limit 1").count() == 1)
    reg.dropEntity("global", "customer")
    val e = intercept[graft.validation.SqlValidator.InvalidQuery](
      session.sql("select custkey from customer limit 1"))
    assert(e.getMessage.contains("Entity customer not found"))
    assert(!reg.listEntities("global").exists(_._1 == "customer"))
  }

  test("applySite merges a config-loaded site in precedence order") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val reg = freshRegistry
    reg.applySite(Site("global",
      entities = Map("n2" -> Entity("n2", Seq(Information("nname", StringType)))),
      localSources = Map("n2" -> Seq(DataSource(
        id = "n2_src", sourceSql = "SELECT * FROM raw_nation",
        mappings = Seq(FieldMapping("nname", "n_name")),
        defaultPermission = SourcePermission(Set("n_name"), "true"))))))
    val session = new MeshSession(spark, reg, "global")
    assert(session.sql("select nname from n2").count() == 25)
    // pre-existing entities survive the merge
    assert(reg.listEntities("global").exists(_._1 == "customer"))
  }
}
