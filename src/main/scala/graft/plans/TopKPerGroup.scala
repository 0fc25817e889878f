package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Custom whole-operator plan: top-k rows per group WITHOUT a total sort.
  *
  * Spark's native spelling — `row_number() OVER (PARTITION BY k ORDER BY s)
  * <= k` — must fully sort every partition before it can rank (WindowExec
  * requires child ordering), an O(n log n) pass that reads and sorts ALL
  * rows per group even when k << group size. This operator keeps a bounded
  * k-row heap per group instead: O(n log k) with O(groups·k) memory, no
  * sort of the input, single pass.
  *
  * `countAttr`, when set, appends a non-null long column holding the TOTAL
  * number of input rows in the row's group (not just the k survivors) —
  * per-group state is then heap + counter, still O(k). This is what lets a
  * KMV sketch (Sketches.kmvDistinct) read exact-count and h_(k) out of ONE
  * pass instead of aggregating the input twice.
  *
  * Built the idiomatic library-extension way (SURVEY §7.3 preference (c)):
  * a LogicalPlan node + SparkStrategy + SparkPlan, injected via
  * `GraftExtensions` (`injectPlannerStrategy`). `requiredChildDistribution`
  * declares group clustering, so Catalyst plans exactly one hash shuffle —
  * the same exchange an aggregation over the keys would need — and AQE
  * still coalesces/handles skew around it.
  */
final case class TopKPerGroupNode(
    keyExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    maxPartialGroups: Int,
    countAttr: Option[Attribute],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  // countAttr lives in the constructor (not a generated def) so exprIds
  // survive tree transformations — a fresh attribute per access would break
  // every parent reference after the first copy()
  override def output: Seq[Attribute] = child.output ++ countAttr
  // the count column originates HERE, not in the child — without this,
  // CheckAnalysis rejects the plan as referencing a missing attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(countAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Physical operator: bounded per-group heaps over clustered input.
  *
  * Planned in two phases like an aggregation: a PARTIAL pass runs on the
  * map side with no distribution requirement, shrinking each input
  * partition to at most `groups·k` rows BEFORE the exchange (top-k is
  * merge-decomposable: the global top-k of a union is contained in the
  * union of per-part top-ks), then the FINAL pass runs on the clustered
  * shuffle output. Shuffle volume drops from n rows to
  * ≤ maps·(maxPartialGroups·k + rows of keys beyond the first
  * maxPartialGroups, which pass through unreduced) — for selective k over
  * big groups, the difference between shuffling the corpus and shuffling
  * a summary; on extreme key cardinality it degrades gracefully toward n
  * instead of holding an unbounded map.
  *
  * Counting (`countAttr` set): the partial attaches its per-group row
  * count to the FIRST emitted heap row (0 on the rest, 1 on map-overflow
  * passthrough rows), so the count column sums to the true group total
  * across partials; the final sums it while heaping and stamps every
  * output row with the group total. Counts ride the existing rows — no
  * side channel, no extra shuffle. */
final case class TopKPerGroupExec(
    keyExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxPartialGroups: Int,
    countAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output ++ countAttr else child.output

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial)
      org.apache.spark.sql.catalyst.expressions.AttributeSet(countAttr.toSeq)
    else org.apache.spark.sql.catalyst.expressions.AttributeSet.empty

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  // final phase: one hash exchange on the group keys; no child ordering
  // requirement — this is the whole point (WindowExec would demand a full
  // sort here). Partial phase runs wherever the data already is.
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(keyExprs)) :: Nil

  // group-preserving: the clustering the exchange just established still
  // holds, so a downstream groupBy/join on the same keys plans no second
  // shuffle
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val isPartial = partial
    val counting = countAttr.isDefined
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      // generated row comparator for the SortOrder chain ("better" = sorts
      // first); the heap keeps the CURRENT k best with the worst on top
      val ord = new LazilyGeneratedOrdering(sortOrders, schema)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      val counts = new java.util.HashMap[UnsafeRow, Array[Long]]()

      if (isPartial) {
        // append-projection for the count column (identity + trailing long)
        val appendProj =
          if (counting)
            UnsafeProjection.create((schema.map(_.dataType) :+ LongType).toArray)
          else null
        val joined = new JoinedRow
        val cRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        def withCount(row: InternalRow, n: Long): InternalRow =
          if (!counting) row
          else { cRow.setLong(0, n); appendProj(joined(row, cRow)) }

        // the partial pass is ONLY a shuffle-volume optimization (any
        // superset is correct), so it must never cost unbounded memory on
        // high-cardinality keys: once the group map is full, rows of
        // UNSEEN keys stream through lazily — the same degradation hash
        // aggregation gets from its fallback, without the sort
        new Iterator[InternalRow] {
          private var flushed: java.util.Iterator[java.util.Map.Entry[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]] = _
          private var drain: Iterator[InternalRow] = Iterator.empty
          private var drainCount: Long = 0L     // attach to first drained row
          private var drainFirst: Boolean = false
          private var overflow: InternalRow = _

          @annotation.tailrec
          private def advance(): Unit = {
            if (iter.hasNext) {
              val row = iter.next()
              val key = keyProj(row)
              var heap = heaps.get(key)
              if (heap == null && heaps.size() < maxPartialGroups) {
                heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
                val kc = key.copy()
                heaps.put(kc, heap)
                if (counting) counts.put(kc, Array(0L))
              }
              if (heap == null) { overflow = row } // unseen key, map full
              else {
                if (counting) counts.get(key)(0) += 1
                if (heap.size < k) heap.enqueue(row.copy())
                else if (ord.compare(row, heap.head) < 0) {
                  heap.dequeue(); heap.enqueue(row.copy())
                }
                advance()
              }
            } else if (flushed == null) {
              flushed = heaps.entrySet().iterator()
              advance()
            } else if (flushed.hasNext && !drain.hasNext) {
              val e = flushed.next()
              drain = e.getValue.dequeueAll.reverseIterator
              if (counting) { drainCount = counts.get(e.getKey)(0); drainFirst = true }
              advance()
            }
          }

          override def hasNext: Boolean = {
            if (overflow == null && !drain.hasNext) advance()
            overflow != null || drain.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            if (overflow != null) {
              val r = overflow; overflow = null
              // unreduced passthrough: contributes exactly its own 1
              if (counting) withCount(r, 1L).copy() else r
            } else {
              val r = drain.next()
              if (!counting) r
              else {
                val n = if (drainFirst) drainCount else 0L
                drainFirst = false
                withCount(r, n).copy()
              }
            }
          }
        }
      } else {
        // final pass over clustered input: exact, bounded by groups·k.
        // When counting, input rows carry the count column (last ordinal);
        // sum it per group and stamp the total onto every output row.
        val cOrd = schema.length - 1
        val identProj = UnsafeProjection.create(schema.map(_.dataType).toArray)
        iter.foreach { row =>
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            val kc = key.copy()
            heaps.put(kc, heap)
            if (counting) counts.put(kc, Array(0L))
          }
          if (counting) counts.get(key)(0) += row.getLong(cOrd)
          if (heap.size < k) heap.enqueue(row.copy())
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(row.copy())
          }
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        heaps.entrySet().forEach { e =>
          // dequeueAll yields worst -> best; reverse for in-group rank order
          val ranked = e.getValue.dequeueAll.reverseIterator
          if (!counting) out ++= ranked
          else {
            val total = counts.get(e.getKey)(0)
            ranked.foreach { r =>
              val u = identProj(r).copy()
              u.setLong(cOrd, total)
              out += u
            }
          }
        }
        out.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Default partial-phase group-map bound: above this many distinct keys
    * per input partition, further unseen keys pass through unreduced
    * (still correct — the partial pass only prunes). ~64k groups × k rows
    * is a few tens of MB at k=10. */
  val MaxPartialGroups: Int = 65536
}

/** Planner strategy mapping the logical node to its exec (injected via
  * `GraftExtensions.injectPlannerStrategy`). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(keys, orders, k, maxPartial, countAttr, child) =>
      TopKPerGroupExec(keys, orders, k, partial = false, maxPartial, countAttr,
        TopKPerGroupExec(keys, orders, k, partial = true, maxPartial, countAttr,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Top `k` rows per distinct value of `keys`, ranked by `orderBy`
    * (column names + ascending flags, lexicographic). Rows emit in rank
    * order within each group; add a trailing unique tiebreak column for
    * fully deterministic output. `countCol`, when set, appends a long
    * column holding the group's TOTAL input row count (every output row of
    * a group carries the same total). Key/order columns resolve directly
    * against the input's analyzed output (a custom logical node sits
    * outside the Dataset API's column-resolution path). */
  def apply(
      df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)],
      k: Int,
      maxPartialGroups: Int = TopKPerGroupExec.MaxPartialGroups,
      countCol: Option[String] = None): DataFrame = {
    // the input's own session, NOT SparkSession.active: with concurrent
    // sessions the strategy must install where the plan executes
    val spark = df.sparkSession
    // ensure the strategy is installed even without spark.sql.extensions.
    // extraStrategies is a plain var: serialize the check-then-set on the
    // session so concurrent first calls can't double-install or lose a
    // concurrent update (the GraftExtensions injection path needs none of
    // this; the self-install stays for sessions built without it)
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
        spark.experimental.extraStrategies =
          TopKPerGroupStrategy +: spark.experimental.extraStrategies
    }
    val child = ColumnBridge.planOf(df)
    def attr(name: String): Attribute =
      child.output.find(a => spark.sessionState.analyzer.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column '$name' not in ${child.output.map(_.name).mkString(", ")}"))
    val orders = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val countAttr = countCol.map(n =>
      AttributeReference(n, LongType, nullable = false)())
    ColumnBridge.ofRows(spark,
      TopKPerGroupNode(keys.map(attr), orders, k, maxPartialGroups, countAttr, child))
  }
}
