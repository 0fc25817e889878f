package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (north-star extension — the
  * reference itself has no streaming surface, SURVEY §2.6).
  *
  * `readStream` -> watermark -> windowed aggregation -> sink; the same
  * declarative plan Spark runs incrementally on a real cluster. The events
  * parquet stores `ts` as TIMESTAMP(NANOS), which the reader surfaces as
  * nanos-long under `spark.sql.legacy.parquet.nanosAsLong`; we convert to
  * microsecond timestamps in-stream.
  */
object EventStream {

  /** Raw parquet schema of the events table, parameterized on how the file
    * stores `ts`: TIMESTAMP(NANOS) surfaces as nanos-long (under
    * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS) as a native
    * timestamp. */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of events parquet files.
    *
    * `readStream` requires an explicit schema, and forcing the wrong `ts`
    * dtype is SILENT corruption (micros read as a long then `div 1000` =
    * 1970-era garbage, no exception). So branch on the actual footer dtype
    * via a one-time batch footer read — the same guard `Fixtures.registerRaw`
    * applies on the batch path. On a real cluster the footer read is a
    * driver-side metadata operation, not a data scan. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val footerTs = spark.read.parquet(dir).schema("ts").dataType
    val stream = spark.readStream.schema(rawSchema(footerTs)).parquet(dir)
    footerTs match {
      case LongType => // legacy TIMESTAMP(NANOS)-as-long: truncate ns -> us
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => stream
      case TimestampNTZType => // UTC session: identity on the micros payload
        stream.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet dtype $other (expected " +
            "nanos-long or timestamp)")
    }
  }

  /** Hourly per-type counts/sums with a 2-hour watermark — the streaming
    * twin of batch query q20_events_hourly. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("hr"), col("event_type"), col("n"), col("sum_value"))

  /** Run the hourly aggregation to completion against a static directory via
    * the memory sink (local smoke path; on a cluster this would be a kafka/
    * delta sink with a processing-time trigger). */
  def runHourlyToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val q = hourlyAgg(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q
  }

  /** Streaming session windows — the streaming twin of batch
    * q29_session_window: 30-minute-gap sessionization per user via Spark's
    * native `session_window`, with watermark-driven state eviction. A
    * session's state lives only until the watermark passes its close, so
    * per-key state is bounded by the gap + watermark delay at any scale. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("sess_start_epoch"),
        col("n_events"), col("sum_value"))

  /** Run the session aggregation against a static directory via the memory
    * sink. Append mode: only watermark-closed sessions emit — trailing
    * sessions stay in state, exactly the production semantics. */
  def runSessionsToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery =
    sessionAgg(readEvents(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserState(nEvents: Long, sumValue: Double)

  /** Custom-state streaming: running per-user event counts/sums maintained
    * in `GroupState` across micro-batches via `mapGroupsWithState` — the
    * KeyValueGroupedDataset stateful path the north star requires. State is
    * partitioned by user key, so a 1000-executor cluster shards it
    * naturally. */
  def runningUserStats(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout

    events.selectExpr("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        val prev = state.getOption.getOrElse(UserState(0L, 0.0))
        var n = prev.nEvents
        var s = prev.sumValue
        evs.foreach { e => n += 1; s += e.value }
        state.update(UserState(n, s))
        (uid, n, s)
      }
      .toDF("user_id", "n_events", "sum_value")
  }

  /** Spark-4 arbitrary-state processor: the same running per-user stats as
    * `runningUserStats`, expressed through `transformWithState` — typed
    * state handles (`ValueState`) acquired in `init`, per-key input in
    * `handleInputRows`. This is the successor API to `mapGroupsWithState`
    * (composable multi-state, timers, TTL) and requires the RocksDB state
    * store provider, which changelog-checkpoints at cluster scale. */
  private class UserStatsProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, (Long, Long, Double)] {
    import org.apache.spark.sql.streaming.{TimerValues, ValueState}

    @transient private var stats: ValueState[UserState] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      stats = getHandle.getValueState[UserState](
        "stats", org.apache.spark.sql.Encoders.product[UserState], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val prev = if (stats.exists()) stats.get() else UserState(0L, 0.0)
      var n = prev.nEvents
      var s = prev.sumValue
      rows.foreach { e => n += 1; s += e.value }
      stats.update(UserState(n, s))
      Iterator.single((key, n, s))
    }
  }

  final case class HourCount(event_type: String, hr: Long, n: Long)
  final case class HourEntry(hr: Long, n: Long)

  /** Streaming twin of batch ts2 (GapFill.rollingZScores): per-type rolling
    * z-score anomaly detection over finalized hourly counts, as a
    * `transformWithState` processor. State per key is a bounded ring of the
    * trailing `window` observed hours (three integers each); every arriving
    * hour scores against the up-to-`window` prior observed hours exactly as
    * the batch ROWS-frame does, with the identical arithmetic (integer
    * sums, then the same correctly-rounded float ops and Spark-HALF_UP
    * rounding), so multi-batch streaming output EQUALS the batch query
    * row-for-row (PipelineSpec). Hours must arrive per-key in hour order —
    * upstream this is the append-mode output of a watermarked hourly
    * window agg, which finalizes windows in order. */
  private class AnomalyProcessor(window: Int, minPrior: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, HourCount, (String, Long, Long, Long, Boolean)] {
    import org.apache.spark.sql.streaming.{ListState, TimerValues, TTLConfig}

    @transient private var hist: ListState[HourEntry] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      hist = getHandle.getListState[HourEntry](
        "hist", org.apache.spark.sql.Encoders.product[HourEntry], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[HourCount],
        timerValues: TimerValues): Iterator[(String, Long, Long, Long, Boolean)] = {
      var entries = hist.get().toIndexedSeq.sortBy(_.hr)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long, Boolean)]
      rows.toIndexedSeq.sortBy(_.hr).foreach { r =>
        val prior = entries.takeRight(window)
        if (prior.length >= minPrior) {
          val k = prior.length.toLong
          val s = prior.map(_.n).sum
          val ss = prior.map(e => e.n * e.n).sum
          // identical op sequence to the batch SQL: every step correctly
          // rounded from exact integers, so the doubles agree bit-for-bit
          val z = (r.n - s / k.toDouble) /
            math.sqrt((ss - s * s / k.toDouble) / k + 1.0)
          // Spark's round() is BigDecimal HALF_UP (math.round would
          // diverge on negative halves)
          val zU4 = new java.math.BigDecimal(z * 1e4)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue
          out += ((key, r.hr, r.n, zU4, math.abs(z) > 3))
        }
        entries = (entries :+ HourEntry(r.hr, r.n)).takeRight(window)
      }
      hist.clear()
      entries.foreach(hist.appendValue)
      out.iterator
    }
  }

  /** Rolling z-score anomaly stream over (event_type, hr, n) hourly-count
    * rows — see [[AnomalyProcessor]]. Requires the RocksDB state store. */
  def anomalyStream(
      spark: SparkSession, hourly: DataFrame,
      window: Int = 24, minPrior: Int = 12): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    hourly.selectExpr("event_type", "hr", "n").as[HourCount]
      .groupByKey(_.event_type)
      .transformWithState(
        new AnomalyProcessor(window, minPrior), TimeMode.None(), OutputMode.Update())
      .toDF("event_type", "hr_epoch", "n", "z_u4", "anomaly")
  }

  final case class SeqEvent(
      user_id: Long, event_id: Long, tsUs: Long, event_type: String)
  final case class LastEvent(tsUs: Long, event_id: Long, event_type: String)

  /** Streaming twin of batch ev3 (Markov journey transitions): per-user
    * ValueState carries only the LAST event seen (three fields — the
    * minimal sessionless journey state), and each arriving event emits
    * its (previous → current) transition. Within a batch, rows sort by
    * the batch query's (ts, event_id) total order; across batches the
    * carried state stitches the sequence, so multi-batch streaming
    * transition counts EQUAL the batch lead()-window counts
    * (PipelineSpec) as long as each key's events arrive in order —
    * upstream that is a watermark-ordered source, exactly the
    * [[AnomalyProcessor]] contract. */
  private class TransitionProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SeqEvent, (String, String)] {
    import org.apache.spark.sql.streaming.{TimerValues, ValueState}

    @transient private var last: ValueState[LastEvent] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      last = getHandle.getValueState[LastEvent](
        "last", org.apache.spark.sql.Encoders.product[LastEvent], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[SeqEvent],
        timerValues: TimerValues): Iterator[(String, String)] = {
      var prev = if (last.exists()) Option(last.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      rows.toIndexedSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
        prev.foreach(p => out += ((p.event_type, e.event_type)))
        prev = Some(LastEvent(e.tsUs, e.event_id, e.event_type))
      }
      prev.foreach(last.update)
      out.iterator
    }
  }

  /** Streaming twin of batch ts3 (seasonal-baseline anomaly): score a
    * STREAM of finalized hourly counts against a STATIC seasonal profile
    * (the (event_type, hour-of-day) mean/variance sums trained offline
    * from history). Stateless by design — a stream-static broadcast join
    * plus row-local arithmetic, no state store: the profile is model
    * state like tx7/tx10's language models, refreshed by re-deploying the
    * query, while ts2's ROLLING monitor (stateful) adapts online. The
    * arithmetic mirrors the batch SQL over exact integer sums, so scores
    * agree bit-for-bit (PipelineSpec pins multi-batch equality).
    *
    * @param hourly  streaming (event_type, hr, hod, n) finalized hourly
    *                counts (hr = hour epoch seconds, hod = hour-of-day)
    * @param profile static (event_type, hod, s, ss, k) integer sums —
    *                batch ts3's profile CTE over the training window
    */
  def seasonalAnomalyStream(
      spark: SparkSession, hourly: DataFrame, profile: DataFrame,
      minHours: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    hourly.join(broadcast(profile), Seq("event_type", "hod"))
      .where(col("k") >= minHours)
      .selectExpr(
        "event_type",
        "hr AS hr_epoch",
        "CAST(n AS BIGINT) AS n",
        "CAST(round(s / CAST(k AS DOUBLE) * 1e4) AS BIGINT) AS baseline_u4",
        """CAST(round((n - s / CAST(k AS DOUBLE))
          | / sqrt((ss - s * s / CAST(k AS DOUBLE)) / k + CAST(1 AS DOUBLE)) * 1e4) AS BIGINT) AS z_u4""".stripMargin,
        """(abs((n - s / CAST(k AS DOUBLE))
          | / sqrt((ss - s * s / CAST(k AS DOUBLE)) / k + CAST(1 AS DOUBLE))) > 3) AS anomaly""".stripMargin)
  }

  /** TTL/TimeMode pair for an optional idle-state horizon — the
    * FunnelProcessor discipline shared by every per-user processor whose
    * state has no event-time point of provable finality: the horizon is a
    * business rule (days of INACTIVITY), so it is processing-time TTL,
    * not a watermark timer. None = replay/backfill mode, state kept for
    * the life of the query (the batch-equivalence specs' mode).
    *
    * Deployment note: in processing-time mode the stateful operator asks
    * for another batch after every batch (to advance its clock), so the
    * default 0 ms trigger busy-loops and drain-style termination
    * (processAllAvailable / Trigger.AvailableNow) never settles — a TTL
    * deployment must set a real processing-time trigger interval and
    * stop by policy. The TTL spec in PipelineSpec runs 100 ms-trigger
    * phases over a shared checkpoint, which also pins that TTL state
    * survives query restarts. */
  private def ttlMode(stateTtl: Option[java.time.Duration]):
      (org.apache.spark.sql.streaming.TTLConfig,
        org.apache.spark.sql.streaming.TimeMode) = {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    stateTtl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None => (TTLConfig.NONE, TimeMode.None())
    }
  }

  /** Per-user journey transition stream — see [[TransitionProcessor]].
    * Requires the RocksDB state store.
    *
    * Per-user state is one LastEvent (three fields), but it lives as long
    * as the user is remembered: on a months-long stream, lifetime distinct
    * users × idle last-event state is the growth term. `stateTtl` bounds
    * it (e.g. 30 days: a user idle that long restarts their journey —
    * their next event emits no transition, exactly a fresh user). */
  def transitionStream(
      spark: SparkSession, events: DataFrame,
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val (ttl, timeMode) = ttlMode(stateTtl)
    events
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS tsUs", "event_type")
      .as[SeqEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new TransitionProcessor(ttl), timeMode, OutputMode.Append())
      .toDF("from_type", "to_type")
  }

  /** `runningUserStats` on the transformWithState API. The session must run
    * the RocksDB state store provider (the API requires it).
    *
    * `stateTtl` bounds idle-user state like [[transitionStream]]: an
    * evicted user's counters restart at zero on return — the dashboard
    * semantics of a stats horizon, vs. the unbounded lifetime-total mode
    * (None) the batch-equivalence specs exercise. */
  def runningUserStatsTws(
      spark: SparkSession, events: DataFrame,
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val (ttl, timeMode) = ttlMode(stateTtl)
    events.selectExpr("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new UserStatsProcessor(ttl), timeMode, OutputMode.Update())
      .toDF("user_id", "n_events", "sum_value")
  }

  /** Run the stateful per-user stats to completion via the memory sink. */
  def runUserStatsToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery =
    runningUserStats(spark, readEvents(spark, dir))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()

  final case class DayContrib(day: Int, user_id: Long, isEventDay: Boolean)
  final case class DayCounts(dau: Long, wau: Long)

  /** DAU/WAU stickiness processor — the streaming twin of batch ev4,
    * keyed by calendar day (epoch days). Input rows are the ROW-LOCAL
    * day explode the batch query uses (each event contributes to the ≤7
    * window days at and after its own day — no day-range join in either
    * engine); state per day is the distinct-user membership map plus the
    * two running counts, so a replayed or late event inside the
    * retention window is idempotent. Emits an updated
    * (day, dau, wau, stickiness_pm) row whenever the day's counts move,
    * suppressed until the day has ≥1 OWN-day active user — exactly the
    * days batch ev4 emits (its dau⋈wau inner join). State shards by day
    * across executors; membership is per-(day, user) — a production
    * deployment at extreme user counts would swap the exact map for a
    * sketch, which changes wau to an estimate (batch ev4 stays the
    * exact-count oracle).
    *
    * Shuffle-mass divergence from the batch twin, deliberate: the stream
    * explodes every RAW event into its ≤7 day contributions before the
    * key shuffle (7·|events| rows), where batch dedups to DISTINCT
    * (day, user) first (7·|du|) — a streaming pre-dedup would be a second
    * stateful operator (update-mode chains of stateful ops are not
    * supported), so the dedup lives in this processor's state instead.
    * A replay-heavy/high-frequency feed should pre-aggregate per
    * micro-batch upstream (e.g. foreachBatch distinct) before this
    * stream.
    *
    * State lifetime: a day's last possible contribution is an event ON
    * that day (earlier days contribute forward, never backward), so once
    * the event-time watermark passes end-of-day the per-(day, user)
    * membership map is dead weight that can never change the counts
    * again. With `finalize = true` (an event-time watermark on the input
    * is then required) the first contribution registers ONE event-time
    * timer at end-of-day; on expiry the day's map and counts are dropped,
    * so live state is bounded by the watermark horizon (≈1 day of keys ×
    * their users), not the stream's age. Without it (TimeMode.None —
    * the replay/backfill mode the batch-equivalence specs use, where
    * events arrive arbitrarily out of order) state is retained forever
    * and the caller owns the horizon. */
  private class StickinessProcessor(finalize: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Int, DayContrib, (Int, Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, TimerValues, TTLConfig, ValueState}

    @transient private var seen: MapState[Long, Int] = _
    @transient private var counts: ValueState[DayCounts] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      seen = getHandle.getMapState[Long, Int]("seen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaInt, TTLConfig.NONE)
      counts = getHandle.getValueState[DayCounts]("counts",
        org.apache.spark.sql.Encoders.product[DayCounts], TTLConfig.NONE)
    }

    override def handleExpiredTimer(
        key: Int, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Int, Long, Long, Long)] = {
      // the day is final: every row that could touch it is behind the
      // watermark. Drop the whole key's state; emit nothing (the final
      // counts already went out in update mode).
      seen.clear()
      counts.clear()
      Iterator.empty
    }

    override def handleInputRows(
        key: Int, rows: Iterator[DayContrib],
        timerValues: TimerValues): Iterator[(Int, Long, Long, Long)] = {
      // late-data guard, enforced HERE rather than relying on the
      // operator's late-row filter: the day-explode projection drops the
      // watermarked ts attribute, so TransformWithStateExec cannot build
      // its own late-event predicate and WOULD deliver late rows — which
      // must not resurrect a day the expired timer already evicted
      // (a resurrected day would restart its counts from zero and emit
      // garbage update rows).
      if (finalize &&
          timerValues.getCurrentWatermarkInMs() >= (key + 1L) * 86400000L)
        return Iterator.empty
      val hadState = counts.exists()
      if (finalize && !hadState)
        // end of day `key` in epoch millis: day+1 boundary. Fires once
        // the event-time watermark passes it — timers are per-(key, ts),
        // so re-registering after an eviction is a fresh single timer.
        getHandle.registerTimer((key + 1L) * 86400000L)
      val prev = if (hadState) counts.get() else DayCounts(0L, 0L)
      var dau = prev.dau
      var wau = prev.wau
      rows.foreach { r =>
        // bit0 = active ON the day (dau), bit1 = active in the day's
        // trailing week (wau; a superset — every contribution sets it)
        val before =
          if (seen.containsKey(r.user_id)) seen.getValue(r.user_id) else 0
        val after = before | (if (r.isEventDay) 3 else 2)
        if (after != before) {
          if ((before & 2) == 0) wau += 1
          if ((before & 1) == 0 && (after & 1) != 0) dau += 1
          seen.updateValue(r.user_id, after)
        }
      }
      if (dau != prev.dau || wau != prev.wau) {
        counts.update(DayCounts(dau, wau))
        if (dau > 0) Iterator.single((key, dau, wau, 1000L * dau / wau))
        else Iterator.empty
      } else Iterator.empty
    }
  }

  final case class FunnelEvent(user_id: Long, tsUs: Long, event_type: String)
  final case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)

  /** Ordered-funnel processor — the streaming twin of batch ev2: per
    * user, the earliest view, then the earliest click AFTER that view,
    * then the earliest purchase AFTER that click (each stage's clock
    * starts at the previous stage's completion). State per user is three
    * timestamps (-1 = not reached); a stage-advance emits one
    * (user, stage) append row, so the downstream funnel report is a
    * count per stage. Events must arrive per-key in ts order (the same
    * in-order contract as [[AnomalyProcessor]] — upstream this is a
    * watermark-finalized feed); rows inside one batch are sorted here. */
  private class FunnelProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, FunnelEvent, (Long, String)] {
    import org.apache.spark.sql.streaming.{TimerValues, ValueState}

    @transient private var st: ValueState[FunnelState] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelState], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[(Long, String)] = {
      var s = if (st.exists()) st.get() else FunnelState(-1L, -1L, -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      rows.toIndexedSeq.sortBy(_.tsUs).foreach { e =>
        e.event_type match {
          case "view" if s.tView < 0 =>
            s = s.copy(tView = e.tsUs); out += ((key, "view"))
          case "click" if s.tView >= 0 && s.tClick < 0 && e.tsUs > s.tView =>
            s = s.copy(tClick = e.tsUs); out += ((key, "click_after_view"))
          case "purchase" if s.tClick >= 0 && s.tPurchase < 0 && e.tsUs > s.tClick =>
            s = s.copy(tPurchase = e.tsUs); out += ((key, "purchase_after_click"))
          case _ =>
        }
      }
      st.update(s)
      out.iterator
    }
  }

  /** Ordered-funnel stage stream over raw events — see
    * [[FunnelProcessor]]. Requires the RocksDB state store.
    *
    * Per-user funnel state is three timestamps — tiny, but a user who
    * never converts holds it for the life of the query, so an unbounded
    * deployment sets `stateTtl` (e.g. 90 days: the attribution-window
    * business rule — unlike stickiness there is no event-time point
    * after which a user's funnel is provably final, so the horizon is a
    * policy, not a watermark; TTL state requires processing-time mode). */
  def funnelStream(
      spark: SparkSession, events: DataFrame,
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val (ttl, timeMode) = ttlMode(stateTtl)
    events
      .selectExpr("user_id", "unix_micros(ts) AS tsUs", "event_type")
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(ttl), timeMode, OutputMode.Append())
      .toDF("user_id", "stage")
  }

  final case class WeekEvent(user_id: Long, wkDay: Int)
  final case class CohortState(cohortDay: Int)

  /** Retention-cohort processor — the streaming twin of batch ev1: a
    * user's cohort is their first-seen week; each NEW (user, week)
    * observation appends one (cohort_day, week_offset) row, so the
    * retention triangle is a downstream count per (cohort, offset).
    * Per-user state is the cohort week plus the set of already-emitted
    * weeks (idempotent under replay). Weeks must arrive per-key in
    * ascending order (the [[AnomalyProcessor]] in-order contract) so the
    * first observation IS the cohort. */
  private class RetentionProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, WeekEvent, (Int, Long)] {
    import org.apache.spark.sql.streaming.{MapState, TimerValues, ValueState}

    @transient private var cohort: ValueState[CohortState] = _
    @transient private var weeks: MapState[Int, Boolean] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      cohort = getHandle.getValueState[CohortState]("cohort",
        org.apache.spark.sql.Encoders.product[CohortState], ttl)
      weeks = getHandle.getMapState[Int, Boolean]("weeks",
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaBoolean, ttl)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[WeekEvent],
        timerValues: TimerValues): Iterator[(Int, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      val evs = rows.toIndexedSeq.sortBy(_.wkDay)
      if (evs.nonEmpty) {
        val c =
          if (cohort.exists()) cohort.get().cohortDay else evs.head.wkDay
        // UNCONDITIONAL re-write: ValueState TTL counts from the last
        // update, so a continuously-active user must refresh the cohort
        // every batch (the FunnelProcessor discipline). Writing only on
        // first sight would expire the cohort `ttl` after the user's
        // FIRST event and silently re-cohort a never-lapsed user — the
        // eviction contract is ttl of INACTIVITY.
        cohort.update(CohortState(c))
        // same discipline for the week markers: MapState TTL is
        // per-ENTRY from its last write, so without a re-touch an old
        // week of a continuously-active user expires on its own and an
        // at-least-once replay of that week re-emits its (cohort,
        // offset) row — the whole user's memory must age as one unit,
        // from last activity. O(markers) per active user per batch,
        // bounded by the report horizon (~52 with a 1-year ttl). The
        // re-touch exists ONLY to keep per-entry TTLs aligned: in no-TTL
        // mode nothing expires, so skip the O(markers) state writes (and
        // their changelog churn) entirely.
        if (ttl != org.apache.spark.sql.streaming.TTLConfig.NONE)
          weeks.keys().toSeq.foreach(k => weeks.updateValue(k, true))
        evs.foreach { e =>
          if (!weeks.containsKey(e.wkDay)) {
            weeks.updateValue(e.wkDay, true)
            out += ((c, (e.wkDay - c).toLong / 7L))
          }
        }
      }
      out.iterator
    }
  }

  /** Retention-cohort stage stream over raw events — see
    * [[RetentionProcessor]]. Requires the RocksDB state store.
    *
    * Per-user state (cohort week + emitted-weeks map) grows by one map
    * entry per active week, forever, on an unbounded stream. `stateTtl`
    * bounds it by the retention-report horizon (e.g. 52 weeks of
    * inactivity evicts the user; if they return, they re-cohort — the
    * standard dashboard semantics for a lapsed-and-returned user). Like
    * the funnel, the horizon is a business rule, not a watermark fact,
    * so it is processing-time TTL rather than an event-time timer. */
  def retentionStream(
      spark: SparkSession, events: DataFrame,
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val (ttl, timeMode) = ttlMode(stateTtl)
    events
      .selectExpr("user_id",
        "CAST(datediff(CAST(date_trunc('week', ts) AS DATE), DATE '1970-01-01') AS INT) AS wkDay")
      .as[WeekEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new RetentionProcessor(ttl), timeMode, OutputMode.Append())
      .toDF("cohort_day", "week_offset")
  }

  /** DAU/WAU stickiness stream over raw events — see
    * [[StickinessProcessor]]. Requires the RocksDB state store.
    *
    * `watermarkDelay = Some(d)`: production mode — an event-time
    * watermark (`ts` at most `d` late) finalizes each day and EVICTS its
    * membership state via an event-time timer, bounding live state to
    * the watermark horizon on an unbounded stream. Contributions to an
    * already-finalized day are discarded by the processor (the
    * projection drops the watermarked ts attribute, so the operator's
    * own late-row filter cannot engage — the guard lives in
    * handleInputRows). `None`: replay/backfill mode — arbitrary
    * arrival order, state retained for the life of the query. */
  def stickinessStream(
      spark: SparkSession, events: DataFrame,
      watermarkDelay: Option[String] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // finalize mode evicts on UTC day boundaries ((key+1)·86400000 ms)
    // while the day key derives from CAST(ts AS DATE) in the SESSION
    // timezone. A west-of-UTC session would see its watermark cross the
    // UTC boundary hours before the local day ends — on-time events
    // silently dropped by the late-row guard. Fail fast instead: the
    // engine's determinism contract pins UTC everywhere else already.
    if (watermarkDelay.isDefined) {
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      require(tz == "UTC" || tz == "Etc/UTC" || tz == "Z",
        s"stickinessStream with a watermark requires " +
          s"spark.sql.session.timeZone=UTC (got $tz): day keys are " +
          "session-tz dates but day-close timers fire on UTC boundaries")
    }
    val src = watermarkDelay.fold(events)(events.withWatermark("ts", _))
    val timeMode =
      if (watermarkDelay.isDefined) TimeMode.EventTime() else TimeMode.None()
    src
      .selectExpr("CAST(ts AS DATE) AS d", "user_id")
      .selectExpr(
        "explode(sequence(d, date_add(d, 6))) AS cd", "d", "user_id")
      .selectExpr(
        "CAST(datediff(cd, DATE '1970-01-01') AS INT) AS day",
        "user_id", "cd = d AS isEventDay")
      .as[DayContrib]
      .groupByKey(_.day)
      .transformWithState(
        new StickinessProcessor(finalize = watermarkDelay.isDefined),
        timeMode, OutputMode.Update())
      .toDF("day", "dau", "wau", "stickiness_pm")
  }

  /** Streaming deduplication: drop replayed events by id with state bounded
    * by the event-time watermark (`dropDuplicatesWithinWatermark`) — the
    * streaming twin of dd1 for at-least-once ingestion pipelines. */
  def dedupped(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Exactly-once parquet sink: `foreachBatch` writes every micro-batch to
    * a batch-id-keyed partition directory with overwrite semantics. After
    * a failure, Structured Streaming replays the last uncommitted batch
    * with the SAME batch id, so the rewrite lands in the same directory —
    * at-least-once delivery + idempotent write = exactly-once output for
    * downstream readers, with progress tracked in the checkpoint. This is
    * the file-sink discipline a long-running 1000-executor ingestion job
    * needs (the built-in file sink keeps a driver-side manifest; the
    * batch-id layout also works for object stores + external catalogs). */
  def writeBatch(outDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  def exactlyOnceSink(
      events: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) => writeBatch(outDir)(batch.toDF(), batchId))
      .start()

  /** Stream-stream interval join: every purchase joined to the same user's
    * clicks in the preceding hour (the streaming shape of ao1's
    * click-attribution as-of join — Structured Streaming expresses the
    * bounded-interval variant). Watermarks on BOTH sides plus the time
    * bound let Spark evict join state continuously: each side retains at
    * most watermark + interval of rows per user key, so state stays
    * bounded on a 1000-executor cluster regardless of stream length. */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts"), col("click_id"), col("c_ts"), col("value"))
  }

  final case class SessEvent(
      user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      tsUs: Long, value: Double)
  // sum carried as integer micro-units (value quantized to 1e-6 BIGINT,
  // the suite's score_micro discipline): the batch query aggregates in
  // nondeterministic partition order while this processor accumulates in
  // per-event order — double sums near a .xx5 boundary could round
  // differently at 2 dp, so both sides sum exact integers instead and
  // batch == stream holds structurally, not just on fixture values.
  final case class SessOpen(
      sessionIdx: Long, startUs: Long, lastUs: Long, n: Long, sumMicro: Long)

  /** Streaming twin of batch q21 (gap sessionization with per-session
    * aggregates), on the THIRD state API the engine demonstrates:
    * `flatMapGroupsWithState` with an EVENT-TIME TIMEOUT. The
    * `session_window` twin (q29, [[sessionAgg]]) covers the native
    * windowed-agg spelling; this one carries CUSTOM per-session state
    * (running sum + a per-user session counter, which session_window
    * cannot number) and emits one APPEND row per CLOSED session —
    * closed either by a later event arriving past the gap, or by the
    * watermark passing last-event + gap (the timeout path, which is what
    * bounds state: one open session per user, evicted as the stream
    * moves on).
    *
    * Ordering contract: like [[transitionStream]], rows sort by
    * (ts, event_id) within a batch and batches must respect per-user
    * event-time order for session numbering to match the batch query
    * (the replay/backfill specs feed in order; a production deployment
    * gets this from partitioned, time-ordered ingestion). */
  def sessionizeStream(
      spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def close(uid: Long, s: SessOpen): (Long, Long, Long, Double) =
      // the batch query's exact render: micro -> cents by one IEEE
      // division + floor-half-up, cents -> 2-dp double by an exact /100
      // (integer-valued doubles below 2^53 divide by 100 exactly), so
      // every engine produces the identical bits
      (uid, s.sessionIdx, s.n,
        math.floor(s.sumMicro / 10000.0 + 0.5).toLong / 100.0)
    def fn(uid: Long, rows: Iterator[SessEvent],
        state: GroupState[SessOpen]): Iterator[(Long, Long, Long, Double)] = {
      if (state.hasTimedOut) {
        // watermark passed last-event + gap: the open session is final.
        // Keep a MARKER row (n = 0) carrying the session counter —
        // removing state here would restart the next session at index 1
        // (measured: batch/stream ids diverged on exactly the sessions
        // following a timeout). Per-user numbering inherently costs one
        // residual row per user, the same cardinality any per-user
        // ordinal requires; no further timeout is registered, so the
        // marker is inert.
        val out = state.getOption.filter(_.n > 0).map(close(uid, _)).iterator
        state.getOption.foreach(s =>
          state.update(SessOpen(s.sessionIdx, s.lastUs, s.lastUs, 0L, 0L)))
        return out
      }
      val evs = rows.toIndexedSeq.sortBy(e => (e.tsUs, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      // n = 0 is the closed-session marker: no open session, but the
      // counter continues from sessionIdx
      var idxBase = 0L
      var cur: SessOpen = null
      state.getOption.foreach { s =>
        if (s.n > 0) cur = s else idxBase = s.sessionIdx
      }
      // the batch query's exact quantizer: floor(value * 1e6 + 0.5)
      def micro(v: Double): Long = math.floor(v * 1000000.0 + 0.5).toLong
      evs.foreach { e =>
        cur =
          if (cur == null)
            SessOpen(idxBase + 1L, e.tsUs, e.tsUs, 1L, micro(e.value))
          else if (e.tsUs / 1000000L - cur.lastUs / 1000000L > gapMinutes * 60L) {
            // batch q21's boundary test is on WHOLE SECONDS
            // (unix_timestamp lag diff > 1800) — mirror it exactly
            out += close(uid, cur)
            SessOpen(cur.sessionIdx + 1L, e.tsUs, e.tsUs, 1L, micro(e.value))
          } else
            cur.copy(lastUs = math.max(cur.lastUs, e.tsUs),
              n = cur.n + 1, sumMicro = cur.sumMicro + micro(e.value))
      }
      if (cur != null) {
        state.update(cur)
        // fires once the event-time watermark passes the FIRST instant
        // that cannot extend this session. The gap test floors to whole
        // seconds (batch q21's unix_timestamp diff > 1800), so an event
        // at floored-second diff == gap still merges — a timeout at the
        // microsecond-precise last+gap would close up to ~1 s early and
        // split a batch-mergeable session across two emissions. Boundary
        // = (floor(last_sec) + gap + 1) seconds.
        state.setTimeoutTimestamp(
          (cur.lastUs / 1000000L + gapMinutes * 60L + 1L) * 1000L)
      }
      out.iterator
    }
    events
      .withWatermark("ts", watermarkDelay)
      // ts rides along: the watermark tag lives on the column, and
      // EventTimeTimeout requires it to survive into the state operator
      .selectExpr("user_id", "event_id", "ts",
        "unix_micros(ts) AS tsUs", "value")
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
      .toDF("user_id", "session_id", "n_events", "sum_value")
  }
}
