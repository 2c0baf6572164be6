package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Encoders

/** Streaming-capable event operators. Each transform is written against a
  * DataFrame so the SAME code runs in batch (`spark.read`) and incremental
  * (`spark.readStream`) mode — Structured Streaming's core contract. The
  * reference has no streaming surface (its "Hadoop Streaming" is stdin
  * transport, SURVEY §2.11); this module is the Spark-native extension.
  *
  * The `events` schema: event_id, ts (TimestampType), user_id, event_type,
  * value, props (TESTDATA.md). Session timestamps are epoch MICROseconds
  * (unix_micros) so all arithmetic is exact int64.
  */
object EventOps {

  /** Hourly tumbling-window stats per event type; window start emitted as
    * epoch micros (exact int64). On a stream, the 2h watermark bounds state
    * and drops later-than-2h events. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           min(col("value")).as("min_value"),
           max(col("value")).as("max_value"))
      .select(unix_micros(col("w.start")).as("window_start"), col("event_type"),
        col("n_events"), col("min_value"), col("max_value"))

  /** Streaming exact deduplication: first occurrence per key wins, with a
    * watermark bounding the key state (late duplicates beyond the horizon
    * are the documented tradeoff — the batch twin over the same data is the
    * oracle). The training-pipeline "exact dedup" operator in incremental
    * form. */
  def dedupByKey(events: DataFrame, keyCols: Seq[String],
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols)

  /** Watermarked stream-stream interval join (event attribution): each
    * click pairs with every view by the same user inside the trailing
    * `within` window — Structured Streaming's stream-stream join with an
    * event-time range condition. Watermarks on BOTH sides are what bound
    * the join state (the view buffer holds `within` + watermark of
    * history, clicks age out once no future view can match); matched
    * rows emit immediately (inner join), the watermark only garbage-
    * collects. The same code runs in batch mode — the spec's oracle.
    * Inputs need (user_id, ts, event_id). For most-recent-only
    * attribution, rank downstream or use [[graft.operators.AsofJoin]]
    * in batch — a stream cannot rank without a second stateful stage. */
  def attributeWithin(clicks: DataFrame, views: DataFrame,
                      within: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val v = views.select(col("user_id").as("__vu"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    c.join(v, col("user_id") === col("__vu") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $within"))
      .select(col("user_id"),
        unix_micros(col("click_ts")).as("click_uts"), col("click_id"),
        unix_micros(col("view_ts")).as("view_uts"), col("view_id"))
  }

  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: Long,
                              session_end: Long, n_events: Int)

  /** Incremental sessionization with a gap timeout: flatMapGroupsWithState
    * keeps one open session per user and emits a row when the event-time gap
    * exceeds `gapMicros`. With `idleFlushMillis` set, a processing-time
    * timeout additionally flushes sessions of idle users (production mode;
    * leave None under `processAllAvailable`-style testing, where pending
    * timeouts keep scheduling no-data microbatches). */
  def streamingSessionize(events: DataFrame, gapMicros: Long,
                          idleFlushMillis: Option[Long] = None): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val longEnc = Encoders.scalaLong
    val timeoutConf =
      if (idleFlushMillis.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.select(col("user_id"), unix_micros(col("ts")).as("tsu"))
      .groupByKey(_.getAs[Long]("user_id"))
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        (user: Long, rows: Iterator[Row], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.last, s.n))
          } else {
            val ts = rows.map(_.getAs[Long]("tsu")).toArray.sorted
            var cur = state.getOption
            val closed = Vector.newBuilder[SessionOut]
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMicros =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              idleFlushMillis.foreach(state.setTimeoutDuration)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch sessionization (same semantics; includes each user's final open
    * session): lag-based gap detection, one shuffle on user_id. Serves as
    * the oracle for the incremental path. */
  def batchSessionize(events: DataFrame, gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tsu")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
      .withColumn("prev", lag("tsu", 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull.or(col("tsu") - col("prev") > gapMicros), 1).otherwise(0))
      .withColumn("session_no", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(min("tsu").as("session_start"), max("tsu").as("session_end"),
           count(lit(1)).cast("int").as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
  }
}
