package graft.sources

import java.util.{Map => JMap}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog._

/** DataSource V2 connector for the federated entity scan (SURVEY §7.2.7 /
  * §2.5): `spark.read.format("graft").option("mesh", ...).option("site", ...)
  * .option("entity", ...)`.
  *
  * Mirrors the reference webengine's pushdown exactness semantics
  * (`webengine/src/web_source.rs:98-160`, `expr_to_sql.rs`):
  *  - P1 projection pushdown: `SupportsPushDownRequiredColumns`;
  *  - P2/P3 per-filter exactness: `SupportsPushDownFilters` accepts only
  *    simple comparisons/IS [NOT] NULL on entity columns with primitive
  *    literals — everything else is reported unsupported and re-applied by
  *    Spark above the scan, exactly like the reference's
  *    `Exact`-vs-`Unsupported` classification;
  *  - P4 per-source limit: `SupportsPushDownLimit` caps each branch (the
  *    reference appends `limit l` to each scan template);
  *  - S5 partitioning: one `InputPartition` per leaf (site, source) branch.
  *
  * Scope (documented): branches must be local file-backed parquet sources
  * (`DataSource.fileSource`) with single-column mapping transforms; ACL rows
  * and pushed filters are evaluated inside the reader against the file
  * schema. Remote-hop composition is served by the DataFrame resolver path.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (mesh, site, entity, _) = GraftDataSource.resolveOptions(options)
    mesh.site(site).entities(entity).schema
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val (mesh, site, entity, user) = GraftDataSource.resolveOptions(
      new CaseInsensitiveStringMap(properties))
    new GraftTable(mesh, site, entity, user)
  }
}

object GraftDataSource {
  /** Session-level registry of named meshes the connector can serve. */
  val registry: TrieMap[String, Mesh] = TrieMap.empty

  private[sources] def resolveOptions(
      options: CaseInsensitiveStringMap): (Mesh, String, String, Option[String]) = {
    val meshName = Option(options.get("mesh")).getOrElse(
      throw new IllegalArgumentException("graft source requires option 'mesh'"))
    val mesh = registry.getOrElse(meshName,
      throw new IllegalArgumentException(s"mesh '$meshName' not registered"))
    val site = Option(options.get("site")).getOrElse("global")
    val entity = Option(options.get("entity")).getOrElse(
      throw new IllegalArgumentException("graft source requires option 'entity'"))
    (mesh, site, entity, Option(options.get("user")))
  }
}

class GraftTable(mesh: Mesh, siteName: String, entityName: String, user: Option[String])
    extends Table with SupportsRead {
  private val entity = mesh.site(siteName).entities(entityName)

  override def name(): String = s"graft:$siteName/$entityName"
  override def schema(): StructType = entity.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(mesh, siteName, entity, user)
}

class GraftScanBuilder(
    mesh: Mesh, siteName: String, entity: Entity, user: Option[String])
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var required: StructType = entity.schema
  private var pushed: Array[sources.Filter] = Array.empty
  private var limit: Option[Int] = None

  /** P2 classification: a filter is Exact iff it is a simple comparison /
    * null test (possibly negated) on a plain entity column with a primitive
    * literal — the same shapes `expr_to_sql.rs:32-106` can serialize. */
  private def pushable(f: sources.Filter): Boolean = f match {
    case sources.EqualTo(_, v)            => primitive(v)
    case sources.GreaterThan(_, v)        => primitive(v)
    case sources.GreaterThanOrEqual(_, v) => primitive(v)
    case sources.LessThan(_, v)           => primitive(v)
    case sources.LessThanOrEqual(_, v)    => primitive(v)
    case sources.IsNull(_)                => true
    case sources.IsNotNull(_)             => true
    case sources.Not(child)               => pushable(child)
    case _                                => false // In/Like/StartsWith/... -> Unsupported
  }

  private def primitive(v: Any): Boolean = v match {
    case _: Boolean | _: Int | _: Long | _: Double | _: Float | _: Short |
         _: Byte | _: String | _: java.sql.Date | _: java.time.LocalDate => true
    case _ => false
  }

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (p, rest) = filters.partition(pushable)
    pushed = p
    rest // unsupported -> Spark re-applies them above the scan
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  override def build(): Scan =
    new GraftScan(mesh, siteName, entity, user, required, pushed, limit)
}

/** One partition per leaf (site, source) branch with everything the
  * executor-side reader needs: file path, bound row-filter, bound
  * projections, optional per-branch limit. */
case class GraftInputPartition(
    path: String,
    fileSchema: StructType,
    rowFilter: Expression,     // bound to file schema
    projections: Seq[Expression], // bound, one per required entity column
    limit: Option[Int]) extends InputPartition

class GraftScan(
    mesh: Mesh, siteName: String, entity: Entity, user: Option[String],
    required: StructType, pushed: Array[sources.Filter], limit: Option[Int])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"GraftScan ${siteName}/${entity.name} " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val site = mesh.site(siteName)
    site.localSources.getOrElse(entity.name, Nil).map { ds =>
      val fs = ds.fileSource.getOrElse(throw new IllegalArgumentException(
        s"graft DSv2 scan requires file-backed sources; ${ds.id} has none " +
          "(use the DataFrame resolver path for view/remote-backed branches)"))
      require(fs.format == "parquet", s"graft DSv2 scan supports parquet, got ${fs.format}")

      val fileSchema = parquetFileSchema(fs.path)
      val fileAttrs = fileSchema.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)()).toSeq

      val perm = SourcePermission.evaluate(
        ds.defaultPermission, user.flatMap(ds.userPermissions.get), None)

      def parse(sql: String): Expression =
        spark.sessionState.sqlParser.parseExpression(sql)

      // entity column -> mapping expression over file columns (or NULL)
      val mappingExpr: Map[String, Expression] = entity.informations.map { info =>
        val e = ds.mappings.find(_.info == info.name) match {
          case Some(m) if perm.allowedColumns.contains(m.fieldPath) =>
            Cast(parse(m.transform.render(m.fieldPath)), info.dtype)
          case _ => Cast(Literal(null), info.dtype)
        }
        info.name -> e
      }.toMap

      // pushed entity-level filters -> file-level by substituting mappings
      def toExpr(f: sources.Filter): Expression = f match {
        case sources.EqualTo(a, v)            => EqualTo(mappingExpr(a), Literal(v))
        case sources.GreaterThan(a, v)        => GreaterThan(mappingExpr(a), Literal(v))
        case sources.GreaterThanOrEqual(a, v) => GreaterThanOrEqual(mappingExpr(a), Literal(v))
        case sources.LessThan(a, v)           => LessThan(mappingExpr(a), Literal(v))
        case sources.LessThanOrEqual(a, v)    => LessThanOrEqual(mappingExpr(a), Literal(v))
        case sources.IsNull(a)                => IsNull(mappingExpr(a))
        case sources.IsNotNull(a)             => IsNotNull(mappingExpr(a))
        case sources.Not(c)                   => Not(toExpr(c))
        case other => throw new IllegalStateException(s"unpushable filter $other")
      }
      val aclExpr = parse(perm.allowedRows)
      val filterExpr = (Seq(aclExpr) ++ pushed.map(toExpr))
        .reduceLeft[Expression]((a, b) => And(a, b))

      val projExprs = required.fields.map(f => mappingExpr(f.name)).toSeq

      // analyze (type-coerce/resolve) + bind against the file schema via a
      // throwaway Project over a LocalRelation — reusing Spark's analyzer
      // instead of re-implementing coercion
      val all = projExprs :+ filterExpr
      val aliased = all.zipWithIndex.map { case (e, i) => Alias(e, s"c$i")() }
      val analyzed = spark.sessionState.analyzer.execute(
        Project(aliased, LocalRelation(fileAttrs)))
      val resolved = analyzed.asInstanceOf[Project].projectList
        .map(_.asInstanceOf[Alias].child)
      val bound = resolved.map(BindReferences.bindReference(_, fileAttrs.toIndexedSeq))

      GraftInputPartition(
        fs.path, StructType(fileSchema), bound.last,
        bound.dropRight(1), limit): InputPartition
    }.toArray
  }

  private def parquetFileSchema(path: String): Seq[StructField] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(path), new Configuration()))
    try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      msg.getFields.asScala.toSeq.map { t =>
        val p = t.asPrimitiveType()
        // raw physical mapping: timestamps surface as their int64 payload
        // and mapping transforms convert (e.g. timestamp_micros(ts div 1000))
        val dt = p.getPrimitiveTypeName match {
          case INT32  => IntegerType
          case INT64  => LongType
          case DOUBLE => DoubleType
          case FLOAT  => FloatType
          case BOOLEAN => BooleanType
          case BINARY => StringType
          case other  => throw new IllegalArgumentException(s"unsupported parquet type $other")
        }
        StructField(t.getName, dt, !t.isRepetition(
          org.apache.parquet.schema.Type.Repetition.REQUIRED))
      }
    } finally reader.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory()
}

class GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition])
}

/** Executor-side reader: parquet Group records -> file-schema InternalRow ->
  * filter -> projection. No nested Spark jobs; per-branch limit applied
  * here (per-source limit semantics, P4). */
class GraftPartitionReader(p: GraftInputPartition)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(p.path)).build()
  private val projection = UnsafeProjection.create(p.projections.toArray)
  private val fileRow = new GenericInternalRow(p.fileSchema.length)
  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    if (p.limit.exists(emitted >= _)) return false
    var g = reader.read()
    while (g != null) {
      fillRow(g)
      val keep = p.rowFilter.eval(fileRow)
      if (keep != null && keep.asInstanceOf[Boolean]) {
        current = projection(fileRow)
        emitted += 1
        return true
      }
      g = reader.read()
    }
    false
  }

  private def fillRow(g: Group): Unit = {
    var i = 0
    while (i < p.fileSchema.length) {
      val f = p.fileSchema(i)
      if (g.getFieldRepetitionCount(i) == 0) fileRow.update(i, null)
      else f.dataType match {
        case IntegerType => fileRow.setInt(i, g.getInteger(i, 0))
        case LongType    => fileRow.setLong(i, g.getLong(i, 0))
        case DoubleType  => fileRow.setDouble(i, g.getDouble(i, 0))
        case FloatType   => fileRow.setFloat(i, g.getFloat(i, 0))
        case BooleanType => fileRow.setBoolean(i, g.getBoolean(i, 0))
        case StringType  => fileRow.update(i, UTF8String.fromString(g.getString(i, 0)))
        case other => throw new IllegalStateException(s"unsupported $other")
      }
      i += 1
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
