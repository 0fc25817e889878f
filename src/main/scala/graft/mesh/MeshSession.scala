package graft.mesh

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.validation.SqlValidator

/** A relay's synchronous query entry point (Flight path, SURVEY §3.2):
  * validate -> resolve the single entity -> substitute it for the table
  * reference -> execute on Catalyst.
  *
  * Where the reference rewrites SQL text per source and ships it to backend
  * engines (`core/src/execute/map_local.rs:24-36`), this registers the
  * resolved entity DataFrame as a temp view under the entity's name, so the
  * user's SQL runs unchanged and Catalyst performs pushdown into every
  * per-source branch.
  */
class MeshSession private (
    val spark: SparkSession,
    meshProvider: () => graft.catalog.Mesh,
    val siteName: String) {

  /** Static catalog (a fixed Mesh value). */
  def this(spark: SparkSession, mesh: graft.catalog.Mesh, siteName: String) =
    this(spark, () => mesh, siteName)

  /** Live catalog: every query resolves against the registry's CURRENT
    * mesh, so admin upserts ([[MeshRegistry]]) are visible to the next
    * query without rebuilding the session — the reference's dynamic
    * registration semantics (`rest_server/src/admin/utils.rs:28-270`). */
  def this(spark: SparkSession, registry: MeshRegistry, siteName: String) =
    this(spark, () => registry.mesh, siteName)

  /** The catalog as of NOW (re-read per query for registry-backed sessions). */
  def mesh: graft.catalog.Mesh = meshProvider()

  /** Validate + execute `sqlText` as `user` against this site's catalog.
    *
    * @param returnSchema caller-declared result schema; the output is cast
    *   to it column-by-column, mirroring the reference's client-passed
    *   `return_schema` (`flight_server/src/flight.rs:565-567`).
    */
  def sql(sqlText: String, user: Option[String] = None,
      withProvenance: Boolean = false,
      returnSchema: Option[StructType] = None): DataFrame = {
    val entity = SqlValidator.validate(sqlText, spark)
    if (!mesh.site(siteName).entities.contains(entity))
      throw SqlValidator.InvalidQuery(s"Entity $entity not found on relay $siteName")
    val entityDF =
      EntityResolver.resolve(spark, mesh, siteName, entity, user, withProvenance)
    // register + analyze atomically w.r.t. concurrent async submits that
    // use the same shared-name view
    val out = QueryService.planLock.synchronized {
      entityDF.createOrReplaceTempView(entity)
      ViewEpoch.noteShadow()
      spark.sql(SqlValidator.preprocess(sqlText))
    }
    returnSchema.map(EntityResolver.castToSchema(out, _)).getOrElse(out)
  }

  /** The relay-to-relay entry point behind [[graft.transport.RelayServer]]'s
    * `/query/sync` (the Flight-path handler a peer hits,
    * `flight_server/src/flight.rs:501-630`): same validate → resolve →
    * substitute → execute pipeline as [[sql]], but the resolution carries
    * the forwarding relay's identity (Requester::Relay — relay ACLs
    * intersect user grants) and the request's visited-relay set (the wire
    * cycle guard). */
  private[graft] def sqlForPeer(sqlText: String, user: Option[String],
      viaRelay: Option[String], alsoVisited: Set[String],
      withProvenance: Boolean): DataFrame = {
    val entity = SqlValidator.validate(sqlText, spark)
    if (!mesh.site(siteName).entities.contains(entity))
      throw SqlValidator.InvalidQuery(s"Entity $entity not found on relay $siteName")
    val entityDF = EntityResolver.resolve(spark, mesh, siteName, entity, user,
      withProvenance, viaRelay, alsoVisited)
    QueryService.planLock.synchronized {
      entityDF.createOrReplaceTempView(entity)
      ViewEpoch.noteShadow()
      spark.sql(SqlValidator.preprocess(sqlText))
    }
  }

  /** [[sql]] with an x509-derived [[graft.catalog.Principal]]: the
    * principal's certificate fingerprint IS the permission key, exactly as
    * the reference joins `users.x509_sha256` to per-source grants
    * (`core/src/crud/user.rs:61-79`). Source ACLs address certificate
    * holders by listing their fingerprint in `userPermissions`. */
  def sqlAs(principal: graft.catalog.Principal, sqlText: String,
      withProvenance: Boolean = false,
      returnSchema: Option[StructType] = None): DataFrame =
    sql(sqlText, Some(principal.userKey), withProvenance, returnSchema)
}

/** Asynchronous query path (REST path, SURVEY §3.3): submitted queries are
  * tracked as tasks with Queued/InProgress/Complete/Failed statuses
  * (`core/src/model/query.rs:134-139`), results spill to
  * `<resultDir>/task_<id>/result.parquet`
  * (`core/src/execute/result_manager.rs:58-92`), and NDJSON export carries
  * `_relay_metadata_` provenance per record
  * (`rest_server/src/query/utils.rs:57-169`).
  */
class QueryService(session: MeshSession, resultDir: String) {
  import QueryService._

  private val tasks = new java.util.concurrent.ConcurrentHashMap[String, TaskState]()
  private val branchTasks =
    new java.util.concurrent.ConcurrentHashMap[String, Map[(String, String), TaskState]]()

  import QueryService.pool

  /** Submit a query; executes on a background thread, one sub-task per leaf
    * (relay, source) branch — mirroring the reference's per-DataSource
    * `QueryTask` rows with individual statuses
    * (`core/src/model/query.rs:79-167`). Returns the request id.
    *
    * @param requestId caller-supplied request uuid; a replayed id returns
    *   the already-tracked request without executing again — the
    *   reference's DB-side request dedup (`core/src/crud/query.rs:21-60`,
    *   `flight_server/src/flight.rs:543-555`).
    * @param returnSchema caller-declared result schema, applied per branch
    *   before provenance tagging (`flight_server/src/flight.rs:565-567`).
    */
  def submit(sqlText: String, user: Option[String] = None,
      requestId: Option[String] = None,
      returnSchema: Option[StructType] = None): String = {
    val id = requestId.getOrElse(java.util.UUID.randomUUID().toString)
    if (tasks.putIfAbsent(id, TaskState(Queued, None)) != null) return id
    val runnable = new Runnable {
      override def run(): Unit = {
        tasks.put(id, TaskState(InProgress, None))
        try {
          val branches = perBranchFrames(sqlText, user, returnSchema)
          branchTasks.put(id,
            branches.map { case (b, _) => b -> TaskState(Queued, None) }.toMap)
          var anyFailed = false
          branches.zipWithIndex.foreach { case ((branch, df), i) =>
            branchTasks.compute(id, (_, m) => m + (branch -> TaskState(InProgress, None)))
            try {
              // per-task spill under a collision-proof partition name, so
              // completed branches are readable even if a later one fails
              df.write.mode("overwrite")
                .parquet(s"$resultDir/task_$id/result.parquet/" +
                  s"${QueryService.BranchPartitionCol}=$i")
              branchTasks.compute(id, (_, m) => m + (branch -> TaskState(Complete, None)))
            } catch {
              case e: Throwable =>
                anyFailed = true
                branchTasks.compute(id,
                  (_, m) => m + (branch -> TaskState(Failed, Some(e.getMessage))))
            }
          }
          tasks.put(id,
            if (anyFailed) TaskState(Failed, Some("one or more branch tasks failed"))
            else TaskState(Complete, None))
        } catch {
          case e: Throwable => tasks.put(id, TaskState(Failed, Some(e.getMessage)))
        }
      }
    }
    pool.submit(runnable)
    id
  }

  /** Per-branch task statuses, keyed by (relay, sourceId). */
  def branchStatus(id: String): Map[(String, String), TaskState] =
    Option(branchTasks.get(id)).getOrElse(Map.empty)

  /** Execute the full user query once per leaf (relay, source) branch and
    * union the per-branch results with provenance — the reference's async
    * semantics: every relay runs the query over its own slice and streams
    * partial results tagged with `_relay_metadata_` back to the origin
    * (`query_runner/src/lib.rs:117-182`, `rest_server/src/query/utils.rs`).
    * A LIMIT/aggregate therefore applies per source, exactly like the
    * reference's 53-rows-from-limit-10 query1 oracle. Catalyst constant-
    * folds the provenance filter, pruning all other branches from each
    * per-branch plan. */
  private def perBranchFrames(
      sqlText: String, user: Option[String],
      returnSchema: Option[StructType] = None): Seq[((String, String), DataFrame)] = {
    import EntityResolver.{SourceIdCol, SourceRelayCol}
    val spark = session.spark
    val entity = SqlValidator.validate(sqlText, spark)
    if (!session.mesh.site(session.siteName).entities.contains(entity))
      throw SqlValidator.InvalidQuery(
        s"Entity $entity not found on relay ${session.siteName}")
    val full = EntityResolver.resolve(
      spark, session.mesh, session.siteName, entity, user, withProvenance = true)
    // enumerate branches from the CATALOG (get_flight_info semantics,
    // `flight_server/src/flight.rs:194-309`) — no data scan runs before the
    // first branch task. Remote sql templates without SELECT * degrade
    // provenance columns to NULL independently; provenanceBranches detects
    // that statically (plan analysis over a schema-only probe) and degrades
    // each dropped column to (unattributed) per branch, so the null-safe
    // filters below still keep every row. Sources deny-all'd for this user
    // are omitted.
    val branches = EntityResolver
      .provenanceBranches(spark, session.mesh, session.siteName, entity, user)
      .sortBy { case (a, b) => (a.getOrElse(""), b.getOrElse("")) }
    // plan construction registers a shared-name temp view; serialize it
    // across concurrently-submitted queries (execution stays concurrent)
    QueryService.planLock.synchronized {
      branches.toSeq.map { case (relay, srcId) =>
        full
          .where(col(SourceRelayCol) <=> relay.map(lit(_)).getOrElse(lit(null)) &&
            col(SourceIdCol) <=> srcId.map(lit(_)).getOrElse(lit(null)))
          .drop(SourceRelayCol, SourceIdCol)
          .createOrReplaceTempView(entity)
        ViewEpoch.noteShadow()
        val relayName = relay.getOrElse("(unattributed)")
        val srcName = srcId.getOrElse("(unattributed)")
        val base = spark.sql(SqlValidator.preprocess(sqlText))
        val cast = returnSchema
          .map(EntityResolver.castToSchema(base, _)).getOrElse(base)
        (relayName, srcName) -> cast
          .withColumn(SourceRelayCol, lit(relayName))
          .withColumn(SourceIdCol, lit(srcName))
      }
    }
  }

  def status(id: String): TaskState =
    Option(tasks.get(id)).getOrElse(TaskState(Failed, Some(s"unknown task $id")))

  /** Whether `id` is tracked at all (vs [[status]], which reports unknown
    * ids as Failed for the reference's status-surface parity). */
  def isTracked(id: String): Boolean = tasks.containsKey(id)

  /** S9 `do_put` ingest bookkeeping: a remote relay pushed branch `branch`'s
    * result stream for request `id` (the reference writes the parquet and a
    * FlightStream row per pushed stream, `flight_server/src/flight.rs:
    * 636-705`). The bytes land under the same per-branch spill layout as
    * locally-executed tasks, so [[results]] reads local and pushed branches
    * uniformly; the request is readable as soon as a stream lands
    * (stream-level completion — request-level completion stays with the
    * originator's own task bookkeeping). */
  private[graft] def noteIngested(id: String, branch: String): Unit = {
    branchTasks.compute(id, (_, m) =>
      Option(m).getOrElse(Map.empty) + ((branch, "do_put") -> TaskState(Complete, None)))
    tasks.put(id, TaskState(Complete, None))
  }

  /** The spill directory [[results]] reads for `id` — the ingest endpoint
    * writes pushed streams here. */
  private[graft] def taskResultDir(id: String): String =
    s"$resultDir/task_$id/result.parquet"

  /** Block until the task leaves Queued/InProgress (test convenience). */
  def await(id: String, timeoutMs: Long = 120000): TaskState = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var st = status(id)
    while ((st.status == Queued || st.status == InProgress)
        && System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
      st = status(id)
    }
    st
  }

  /** Read a task's spilled result (S7). Reference semantics
    * (`rest_server/src/query/route.rs:108-137`): unless `allowPartial`, a
    * request with failed/in-progress tasks raises instead of returning a
    * subset; with `allowPartial`, whatever branch results completed are
    * streamed. */
  def results(id: String, allowPartial: Boolean = false): DataFrame = {
    val st = status(id)
    if (!allowPartial && st.status != Complete)
      throw new IllegalStateException(
        s"query $id not complete: ${st.status}${st.error.map(e => s" ($e)").getOrElse("")}")
    val path = s"$resultDir/task_$id/result.parquet"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
      throw new IllegalStateException(
        s"no branch results available for query $id" +
          st.error.map(e => s" ($e)").getOrElse(""))
    session.spark.read
      .option("basePath", path)
      .parquet(path)
      .drop(QueryService.BranchPartitionCol)
  }

  /** NDJSON export with nested `_relay_metadata_` provenance (S8). The
    * reference drops all-NULL columns in JSON output
    * (`test/validation.py:17-19`) — `toJSON` reproduces that: null fields
    * are omitted per record. */
  def resultsNdjson(id: String): org.apache.spark.sql.Dataset[String] = {
    val df = results(id)
    val withMeta =
      if (df.columns.contains(EntityResolver.SourceRelayCol))
        df.withColumn("_relay_metadata_",
            struct(
              col(EntityResolver.SourceRelayCol).as("_source_relay_"),
              col(EntityResolver.SourceIdCol).as("_source_id_")))
          .drop(EntityResolver.SourceRelayCol, EntityResolver.SourceIdCol)
      else df
    withMeta.toJSON
  }
}

object QueryService {
  /** Serializes shared-name temp-view registration during plan building
    * across concurrent submits (and MeshSession.sql callers). */
  private[mesh] val planLock = new Object

  /** PROCESS-WIDE bounded worker pool shared by every QueryService: a
    * submit flood queues instead of exhausting driver threads (the
    * reference's query_runner drains a work queue the same way), and
    * constructing services per tenant/request doesn't accumulate idle
    * pools. Daemon threads; lives for the process like Spark's own
    * driver pools. */
  private[mesh] lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.min(8, Runtime.getRuntime.availableProcessors()),
    (r: Runnable) => {
      val t = new Thread(r, "graft-query-worker")
      t.setDaemon(true)
      t
    })
  /** Partition directory name for per-branch spill — prefixed so a user
    * query column named "branch" can't collide. */
  val BranchPartitionCol = "_graft_branch_"

  sealed trait Status
  case object Queued extends Status
  case object InProgress extends Status
  case object Complete extends Status
  case object Failed extends Status
  final case class TaskState(status: Status, error: Option[String])
}
