package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}

import graft.jobs.Top10Job
import graft.model.{Event, Schemas}

/** Closed user session emitted by `StreamingReports.sessionStream`. */
case class UserSession(userId: String, startUs: Long, endUs: Long, nEvents: Long)

/** Open-session state for `sessionStream` — top-level because encoder
  * codegen cannot instantiate object-nested case classes for state.
  */
case class SessionBuf(startUs: Long, lastUs: Long, n: Long)

/** One buffered funnel event (micros, stage code) for `funnelStream`. */
case class FunnelEv(tsUs: Long, code: Int)

/** Per-user funnel buffer state — top-level for encoder codegen. */
case class FunnelBuf(evs: List[FunnelEv])

/** Final stage emitted per user when the funnel state flushes. */
case class UserStage(user_id: Long, stage: Int)

/** One buffered transition event (micros, id tiebreak, state) for
  * `transitionsStream` — top-level for encoder codegen.
  */
case class TransEv(tsUs: Long, eventId: Long, etype: String)

/** Per-user transition buffer state. */
case class TransBuf(evs: List[TransEv])

/** One consecutive (from → to) pair emitted when a user's state
  * flushes on event-time timeout.
  */
case class TransPair(user_id: Long, from_state: String, to_state: String)

/** Per-url recrawl state: the LAST fingerprint seen plus running
  * counts — O(1) per url, never the history (the whole point of the
  * streaming form: a 100-TB fetch log folds into url-count state).
  */
case class RecrawlBuf(lastFp: String, lastR: Long, n: Long, ch: Long)
case class RecrawlCounts(url: String, n_fetches: Long, n_changes: Long)

/** Streaming flavor of the ingestion + top10 pipeline (SURVEY.md §2.11):
  * the `events/` landing prefix consumed as a Structured Streaming file
  * source instead of scheduled batch — same declared schema, same
  * day-keyed counting, plus watermarked late-data handling the batch
  * reference only approximates via its processTime/eventTime split.
  *
  * Scale: the file source lists incrementally; state for the windowed
  * aggregate is bounded by the watermark (1 day of open windows per
  * key), and the stateful running-total operator keeps one long per
  * resource — both shapes survive an unbounded stream.
  */
object StreamingReports {

  /** S3, streaming form: schema-on-read JSON dir scan. */
  def eventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Schemas.event).json(dir)

  /** Streaming exact dedup — the streaming member of the dedup family:
    * at-least-once sources (file redelivery, kafka replays) re-deliver
    * events; `dropDuplicatesWithinWatermark` keeps the FIRST arrival
    * per eventId and drops re-deliveries that arrive within the
    * watermark delay, with per-key state EXPIRED once the watermark
    * passes — bounded state on an unbounded stream, unlike plain
    * `dropDuplicates` whose key set grows forever. Rows flow through
    * immediately (dedup is not an aggregation), so append mode emits
    * with no watermark latency.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withColumn("pts", to_timestamp(col("processTime"), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .withWatermark("pts", "1 day")
      .dropDuplicatesWithinWatermark("eventId")

  /** Stream-stream interval join: each event matched to the same
    * user's FOLLOW-UP events arriving within `windowMinutes` — the
    * attribution/correlation shape (view→purchase, impression→click).
    * Both sides carry a watermark and the join condition bounds b's
    * time from both directions relative to a's, which is what lets
    * Spark expire buffered rows: state per side is bounded by
    * watermark + window, not the stream's lifetime. Inner join, so
    * append mode emits matches as soon as both sides arrive.
    */
  def followupJoin(spark: SparkSession, dir: String, windowMinutes: Int): DataFrame = {
    def side(tag: String): DataFrame =
      eventStream(spark, dir)
        .withColumn("pts", to_timestamp(col("processTime"), "yyyy-MM-dd'T'HH:mm:ssXXX"))
        .select(col("eventId").as(s"${tag}_id"), col("userId").as(s"${tag}_user"),
          col("pts").as(s"${tag}_pts"))
        .withWatermark(s"${tag}_pts", "1 day")
    side("a").join(side("b"),
      col("a_user") === col("b_user") &&
        col("b_pts") > col("a_pts") &&
        col("b_pts") <= col("a_pts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      "inner")
  }

  /** Daily purchase counts per resource over event arrival day
    * (processTime, as the batch top10 keys on), tumbling 1-day windows
    * with a 1-day watermark for late files.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("pts", to_timestamp(col("processTime"), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .withWatermark("pts", "1 day")
      .groupBy(window(col("pts"), "1 day"), col("resourceId"))
      .count()
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("date"),
        col("resourceId"), col("count"))

  /** Streaming top10 report, incremental: the file source reads each
    * landing file ONCE (it tracks processed files; StreamingSpec asserts
    * per-trigger numInputRows), a streaming aggregation keeps the
    * compacted day-keyed counts as its running state, and each trigger
    * re-ranks only that compact frame — ranking needs a full-partition
    * window, which streaming aggregation can't express, so foreachBatch
    * applies `Top10Job.reportFromCounts` to the emitted aggregate and
    * rewrites the K1 pipe-CSV report.
    *
    * State and output are bounded by the report grain (days ×
    * resources), not the event stream. Complete mode re-emits that
    * grain per trigger — acceptable for a small bounded grain, a
    * scale-killer on a long-lived stream; `top10StreamUpdate` below is
    * the bounded-output variant (upserts changed rows into date
    * partitions and re-ranks only touched dates).
    */
  def top10Stream(
      spark: SparkSession, eventsDir: String,
      resources: DataFrame, categories: DataFrame, outPath: String): StreamingQuery =
    Top10Job.dailyCounts(eventStream(spark, eventsDir))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (counts: DataFrame, _: Long) =>
        Top10Job.write(Top10Job.reportFromCounts(counts, resources, categories), outPath)
      }
      .start()

  /** Update-mode streaming top10 — per-trigger work and output bounded
    * by the DATES TOUCHED in the trigger, not the total report grain:
    *
    *  1. the watermarked day-window aggregation in update mode emits
    *     only (date, resourceId, count) rows whose running count
    *     changed this trigger (state for days older than the watermark
    *     is evicted — bounded state on an unbounded stream);
    *  2. foreachBatch upserts them into a date-partitioned parquet
    *     store: changed rows ∪ (existing rows of the touched dates ∖
    *     changed keys), written with DYNAMIC partition overwrite so
    *     only touched date directories are rewritten;
    *  3. the K1 pipe-CSV report is re-ranked from that merged frame —
    *     which already holds the touched dates' full grain — and
    *     likewise dynamically overwrites only those date partitions.
    *
    * The merged frame is localCheckpointed before writing: it reads
    * the same store path it overwrites, and materializing it first is
    * what makes the read-then-overwrite safe (it is report-grain
    * small — touched dates × resources). A quiet day therefore costs
    * nothing: no emitted rows, no partition rewrites.
    */
  def top10StreamUpdate(
      spark: SparkSession, eventsDir: String,
      resources: DataFrame, categories: DataFrame,
      storePath: String, reportPath: String): StreamingQuery =
    dailyCounts(eventStream(spark, eventsDir))
      .writeStream
      .outputMode("update")
      .foreachBatch { (changed: DataFrame, _: Long) =>
        val ss = changed.sparkSession
        if (!changed.isEmpty) {
          val touched = changed.select("date").distinct()
          val existing =
            if (new java.io.File(storePath).exists())
              ss.read.parquet(storePath)
                .join(broadcast(touched), Seq("date"), "left_semi")
            else ss.createDataFrame(ss.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              changed.schema)
          val merged = changed.unionByName(
              existing.join(changed.select("date", "resourceId"),
                Seq("date", "resourceId"), "left_anti"))
            .localCheckpoint(true)
          merged.write.partitionBy("date")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(storePath)
          Top10Job.reportFromCounts(merged, resources, categories)
            .write.partitionBy("date")
            .option("header", "true").option("sep", "|")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").csv(reportPath)
        }
      }
      .start()

  // ── replay plumbing shared by the five bounded-replay surfaces:
  // closed directory streams (Files.list holds an open dir handle) and
  // landing-dir cleanup, so repeated bench runs don't accumulate temp
  // copies of the fixtures ──

  /** Bounded-replay session: same SparkContext, isolated SQLConf with
    * shuffle/state partitions sized to the FIXTURE volume (hundreds of
    * rows). Every stateful microbatch commits one state-store file per
    * partition, so 32-wide state on a bounded replay is pure fixed
    * cost — measured ~2x of several replays' wall time (round 6), and
    * 4 → 1 a further −8 % over the 13-replay family (median-of-3
    * A/B, round 20: q324 −17 %, q316 −17 %, q263 −29 %, q190 −13 %;
    * q124 +0.9 s is the one loss — its per-user state fold serializes
    * — accepted against the −5.2 s family total). Production streams
    * set the same dial to their key cardinality; the stream operators
    * themselves are partition-agnostic.
    */
  private[streaming] def replaySession(outer: SparkSession): SparkSession = {
    val s = outer.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "1")
    // Measured and DECLINED (round-20, the §1 discipline): AQE off for
    // the replays cuts job count ~25 % (q319 101→77) but RAISES wall
    // time (q324 8.4→12.4 s, q190 7.2→8.8 s) — the adaptive runtime
    // join conversions and partition coalescing on the fold joins are
    // worth more than the per-stage-job scheduling overhead they cost.
    s
  }

  /** Drain a memory-sink table: materialize the rows (eager
    * localCheckpoint) and DROP the sink's temp view — without this
    * every replay invocation leaked one cached in-memory table into
    * the session catalog for the session lifetime (round-16 ADVICE;
    * the names are UUID-suffixed so it was a leak, never a collision).
    * Downstream transforms run on the checkpointed frame.
    */
  private[graft] def drainMemorySink(spark: SparkSession, mem: String): DataFrame = {
    val out = spark.table(mem).localCheckpoint()
    spark.catalog.dropTempView(mem)
    out
  }

  private def listFixtureFiles(srcDir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(srcDir))
    try s.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  private def deliver(
      landing: java.nio.file.Path, files: Seq[java.nio.file.Path],
      suffix: String = ""): Unit =
    files.foreach(p => java.nio.file.Files.copy(
      p, landing.resolve(p.getFileName.toString + suffix),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING))

  private[streaming] def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(dir)
    try s.iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally s.close()
  }

  /** Bounded replay of `dedupStream` — the certified-query surface
    * (q82): the landing files are delivered, a full trigger cycle runs,
    * then every file is RE-DELIVERED under a new name (the at-least-once
    * redelivery the operator exists for — same eventIds, same payloads).
    * dropDuplicatesWithinWatermark must pass each eventId through
    * exactly once and drop the entire second wave. Returns the deduped
    * events as a batch frame; the oracle is a plain DISTINCT over the
    * same JSON files (redelivered payloads are byte-identical, so
    * first-arrival-wins and DISTINCT agree row-for-row).
    */
  def dedupReplay(outer: SparkSession, srcDir: String): DataFrame = {
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-dedup-replay")
    val files = listFixtureFiles(srcDir)
    deliver(landing, files)
    val mem = s"graft_dedup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = dedupStream(eventStream(spark, landing.toString))
      .select("eventId", "userId", "resourceId", "countryCode", "duration")
      .writeStream.format("memory").queryName(mem).outputMode("append").start()
    try {
      q.processAllAvailable()
      deliver(landing, files, ".redelivered.json") // same payloads, new filenames
      q.processAllAvailable()
    } finally {
      q.stop()
      deleteRecursively(landing) // results live in the memory sink
    }
    drainMemorySink(spark, mem)
  }

  /** Bounded replay of `followupJoin` — the certified-query surface
    * (q83). Stream-stream inner interval joins emit a match as soon as
    * both sides have arrived (watermarks only bound state eviction), so
    * a drained replay holds every same-user (a, b) pair with b within
    * `windowMinutes` after a — byte-comparable against the batch
    * self-join SQL over the same files.
    */
  def followupReplay(outer: SparkSession, srcDir: String, windowMinutes: Int): DataFrame = {
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-followup-replay")
    deliver(landing, listFixtureFiles(srcDir))
    val mem = s"graft_followup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = followupJoin(spark, landing.toString, windowMinutes)
      .select(col("a_id"), col("b_id"), col("a_user").as("uid"))
      .writeStream.format("memory").queryName(mem).outputMode("append").start()
    try q.processAllAvailable()
    finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem)
  }

  /** Bounded replay of `top10StreamUpdate` over a directory of landing
    * files — the certified-query surface (q80). Files are delivered in
    * TWO waves with a full trigger cycle between them, so the
    * update-mode machinery is exercised for real across triggers:
    * wave 2's changed (date, resourceId) counts must upsert into the
    * store (changed ∪ untouched rows of touched dates), and the re-rank
    * + dynamic partition overwrite must leave every date's report —
    * touched or not — equal to what a batch run over all files would
    * produce. Update mode emits per trigger (no watermark latency), so
    * no sentinel events are needed, unlike `sessionReplay`'s event-time
    * timeouts. Returns the final report read back from the K1 pipe-CSV
    * store, typed to match the batch report.
    */
  def top10ReplayUpdate(
      outer: SparkSession, srcDir: String,
      resources: DataFrame, categories: DataFrame): DataFrame = {
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-top10-replay")
    val work = java.nio.file.Files.createTempDirectory("graft-top10-out")
    val (store, report) = (s"$work/store", s"$work/report")
    val files = listFixtureFiles(srcDir)
    val (wave1, wave2) = files.splitAt(math.max(1, files.size / 2))
    deliver(landing, wave1)
    val q = top10StreamUpdate(spark, landing.toString, resources, categories, store, report)
    try {
      q.processAllAvailable()
      deliver(landing, wave2)
      q.processAllAvailable()
    } finally {
      q.stop()
      // the returned frame reads the report CSV lazily — clean the
      // landing copies and the store, keep report/ alive
      deleteRecursively(landing)
      deleteRecursively(java.nio.file.Paths.get(store))
    }
    spark.read.option("header", "true").option("sep", "|").csv(report)
      .select(col("position").cast("bigint").as("position"),
        col("date").cast("string").as("date"),
        col("categoryId"), col("categoryName"),
        col("resourceId"), col("resourceName"))
  }

  /** Gap-based sessionization over the event stream —
    * flatMapGroupsWithState with an EVENT-TIME timeout: per-user state
    * holds only the open session (three longs, bounded regardless of
    * stream length); a session closes and is emitted either when a
    * later event of the same user arrives past the gap, or when the
    * WATERMARK passes sessionEnd + gap (the timeout — so idle users'
    * sessions still flush without any further events from them).
    * Append-mode output: each closed session exactly once. The batch
    * equivalent is `operators/Sessionize`; StreamingSpec asserts they
    * agree on the replayed landing dir. Agreement boundary: events
    * arriving later than the 1-day watermark delay are dropped by the
    * stream (standard watermark semantics) but counted by batch.
    */
  def sessionStream(
      spark: SparkSession, eventsDir: String, gapMinutes: Int): Dataset[UserSession] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    eventStream(spark, eventsDir)
      .withColumn("pts", to_timestamp(col("processTime"), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      // drop null users AND unparseable timestamps: a null pts would NPE
      // inside the state function and kill the query — one bad record
      // must not take down the stream
      .filter(col("userId").isNotNull && col("pts").isNotNull)
      .select(col("userId").as[String], col("pts").as[java.sql.Timestamp])
      // a real watermark delay: with 0 seconds, an event arriving one
      // trigger after a newer event would be silently dropped and the
      // stream would diverge from the batch operator; 1 day tolerates
      // routine cross-file disorder (events later than that are dropped
      // by standard watermark semantics, which IS the documented
      // stream/batch agreement boundary)
      .withWatermark("pts", "1 day")
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuf, UserSession](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (uid, rows, state) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(UserSession(uid, s.startUs, s.lastUs, s.n))
        } else {
          // events inside one micro-batch can arrive unordered
          val ts = rows
            .map(r => r._2.getTime / 1000L * 1000000L + r._2.getNanos / 1000L)
            .toSeq.sorted
          var closed = List.empty[UserSession]
          var buf = state.getOption.getOrElse(SessionBuf(ts.head, ts.head, 0L))
          ts.foreach { t =>
            if (t - buf.lastUs > gapUs) {
              closed ::= UserSession(uid, buf.startUs, buf.lastUs, buf.n)
              buf = SessionBuf(t, t, 1L)
            } else buf = SessionBuf(buf.startUs, math.max(buf.lastUs, t), buf.n + 1)
          }
          state.update(buf)
          // flush when the watermark passes the end of the open gap
          state.setTimeoutTimestamp(buf.lastUs / 1000L + gapMinutes * 60L * 1000L)
          closed.reverseIterator
        }
      }
  }

  /** Bounded replay of `sessionStream` over a directory of landing
    * files — the certified-query surface (q45): copies the source files
    * into a fresh landing dir, streams them through the
    * flatMapGroupsWithState sessionizer, then appends two far-future
    * sentinel events so the watermark passes every real session's
    * gap and the event-time timeouts flush the open sessions
    * deterministically (timeouts fire on the trigger AFTER the
    * watermark advances, hence two waves). Returns the closed sessions
    * as a batch DataFrame (userId, startUs, endUs, nEvents) with the
    * sentinel user filtered back out — byte-comparable against the
    * batch sessionization SQL over the same files.
    */
  def sessionReplay(outer: SparkSession, srcDir: String, gapMinutes: Int): DataFrame = {
    val spark = replaySession(outer)
    import java.nio.file.Files
    val landing = Files.createTempDirectory("graft-session-replay")
    deliver(landing, listFixtureFiles(srcDir))
    val mem = s"graft_sessions_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = sessionStream(spark, landing.toString, gapMinutes)
      .toDF().writeStream.format("memory").queryName(mem).outputMode("append").start()
    try {
      q.processAllAvailable()
      for (n <- 1 to 2) {
        Files.writeString(landing.resolve(s"zz-sentinel$n.json"),
          s"""{"eventId": "sent$n", "eventTime": "2030-01-0${n}T00:00:00+00:00", "processTime": "2030-01-0${n}T00:00:00+00:00", "resourceId": "rX", "userId": "__sentinel", "countryCode": "US", "duration": 0, "itemPrice": "0"}""")
        q.processAllAvailable()
      }
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem).filter(col("userId") =!= "__sentinel")
  }

  /** Bounded replay of `runningTotals` — the certified-query surface
    * (q84). Files are delivered in two waves so the per-key state must
    * genuinely ACCUMULATE across triggers (a single trigger would never
    * read existing state back). Totals are cumulative and monotone, so
    * the final value per resource is the max over the per-trigger
    * emissions — and must equal the batch per-resource event count.
    */
  def runningTotalsReplay(outer: SparkSession, srcDir: String): DataFrame = {
    val spark = replaySession(outer)
    import spark.implicits._
    val landing = java.nio.file.Files.createTempDirectory("graft-totals-replay")
    val files = listFixtureFiles(srcDir)
    val (wave1, wave2) = files.splitAt(math.max(1, files.size / 2))
    deliver(landing, wave1)
    val mem = s"graft_totals_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = runningTotals(eventStream(spark, landing.toString).as[Event])
      .toDF("resourceId", "total")
      .writeStream.format("memory").queryName(mem).outputMode("update").start()
    try {
      q.processAllAvailable()
      deliver(landing, wave2)
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem).groupBy("resourceId").agg(max(col("total")).as("total"))
  }

  /** STREAMING CDC UPSERT — the streaming member of the Merge family:
    * each micro-batch of the change stream is compacted to
    * last-op-per-key ([[graft.operators.Merge.compactLog]]) and merged
    * into a parquet snapshot store ([[graft.operators.Merge.merge]])
    * via foreachBatch. The store is maintained as a per-resource
    * "latest event" dimension (key = resourceId, seq = processTime
    * epoch-µs, ties by eventId).
    *
    * Correctness across batches needs the OUT-OF-ORDER GUARD: the file
    * source delivers waves in arrival order, not event order, so a
    * later batch can carry an OLDER change for a key. A change applies
    * only if its (seq, eventId) exceeds the stored row's — without
    * this, replaying waves in a different order changes the result;
    * with it, the final store equals the batch compaction over ALL
    * events regardless of delivery order (which is exactly what the
    * q99 oracle checks, and the replay delivers waves REVERSED to make
    * the guard load-bearing).
    *
    * Store layout: write-audit-publish versions (store/v<batchId>);
    * each batch reads the previous version and writes a new one —
    * never an in-place overwrite of a directory being read. At scale
    * the store would be key-partitioned so a batch rewrites only
    * partitions containing its keys (Merge scaladoc); checkpointed
    * offsets make the foreachBatch idempotent-by-version on restart.
    *
    * EXACTLY-ONCE COMMIT is manifest-based (round-7 audit item #6): a
    * version exists IFF `_manifest/v<id>.json` exists, and committing
    * is ONE atomic rename of a manifest temp file. Readers resolve the
    * snapshot from the manifest directory alone — a bounded METADATA
    * listing (one small file per version), never a listing of data
    * directories, which is the operation an object store can serve
    * inconsistently mid-write (the Delta/Iceberg transaction-log
    * discipline scaled down). Every crash window replays idempotently:
    * mid-data-write (partial dir, no Spark _SUCCESS) → rebuilt;
    * data renamed but manifest missing → manifest re-committed WITHOUT
    * rewriting the data; manifest committed → batch redelivery is a
    * no-op.
    */
  def cdcUpsertStream(
      spark: SparkSession, eventsDir: String, storeRoot: String): StreamingQuery =
    eventStream(spark, eventsDir)
      .filter(col("resourceId").isNotNull)
      .withColumn("seq",
        unix_micros(to_timestamp(col("processTime"), "yyyy-MM-dd'T'HH:mm:ssXXX")))
      .select(col("resourceId"), col("seq"), col("eventId"), col("userId"), col("duration"))
      .writeStream
      .option("checkpointLocation", s"$storeRoot/_chk")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyCdcBatch(batch.toDF(), storeRoot, batchId)
      }
      .start()

  private[graft] def applyCdcBatch(
      batch: DataFrame, storeRoot: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dest = new java.io.File(f"$storeRoot/v$batchId%09d")
    // restart idempotency: committed means MANIFESTED — the checkpoint
    // can re-deliver a batch whose version already committed; skip
    if (manifestFile(storeRoot, batchId).exists()) return
    // crash window: data fully renamed into place (it carries Spark's
    // _SUCCESS) but the process died before the manifest commit — the
    // data is whole and was computed from the same prior snapshot this
    // redelivery sees, so re-commit the manifest WITHOUT rewriting.
    // Anything else at dest is a partial tree and is replaced.
    val destWhole = new java.io.File(dest, "_SUCCESS").exists()
    if (dest.exists() && !destWhole) deleteRecursively(dest.toPath)
    if (!destWhole) {
      val compacted = graft.operators.Merge.compactLog(
        batch.withColumn("op", lit("U")), "resourceId", "seq", col("eventId"))
      val merged = latestCdcVersion(storeRoot) match {
        case None => compacted.drop("op")
        case Some(dir) =>
          val snap = spark.read.parquet(dir)
          val guarded = compacted
            .join(snap.select(col("resourceId"),
                struct(col("seq"), col("eventId")).as("__cur")),
              Seq("resourceId"), "left")
            .filter(col("__cur").isNull ||
              struct(col("seq"), col("eventId")) > col("__cur"))
            .drop("__cur")
          graft.operators.Merge.merge(snap, guarded, "resourceId", "op")
      }
      // staged write + atomic rename (the IndexStore discipline):
      // readers never observe a half-written data directory
      val staging = new java.io.File(
        s"$storeRoot/.staging-v$batchId-${java.util.UUID.randomUUID().toString.take(8)}")
      merged.write.mode("errorifexists").parquet(staging.getPath)
      if (!staging.renameTo(dest)) {
        deleteRecursively(staging.toPath)
        sys.error(s"could not commit CDC store version $dest")
      }
    }
    commitManifest(storeRoot, batchId, dest.getPath)
  }

  private[streaming] def manifestFile(storeRoot: String, batchId: Long): java.io.File =
    new java.io.File(f"$storeRoot/_manifest/v$batchId%09d.json")

  /** Publish a version: write the manifest to a temp name, then one
    * atomic rename. A lost rename race (or a replayed commit) is
    * idempotent — the content for a given version is identical.
    */
  private[streaming] def commitManifest(
      storeRoot: String, batchId: Long, dataDir: String): Unit = {
    val mf = manifestFile(storeRoot, batchId)
    mf.getParentFile.mkdirs()
    val tmp = new java.io.File(mf.getParentFile,
      s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    java.nio.file.Files.write(tmp.toPath,
      s"""{"version":$batchId,"data":"${new java.io.File(dataDir).getName}"}"""
        .getBytes("UTF-8"))
    if (!tmp.renameTo(mf) && !mf.exists()) {
      tmp.delete()
      sys.error(s"could not commit CDC manifest $mf")
    }
    tmp.delete(): Unit // no-op if the rename consumed it
  }

  /** Latest COMMITTED version, resolved from the manifest directory
    * alone — a bounded metadata listing (one small file per version).
    * Data directories are never listed: a whole-looking but
    * unmanifested tree (crash before manifest commit) must not be
    * served as the snapshot, and object-store listings of in-progress
    * data directories are exactly the non-atomic operation the
    * manifest protocol exists to avoid. Orphan `.tmp-*` files from
    * crashed manifest writes are ignored by the name filter.
    */
  private def latestCdcVersion(storeRoot: String): Option[String] =
    Option(new java.io.File(storeRoot, "_manifest").listFiles())
      .map(_.filter(f => f.isFile && f.getName.matches("v\\d{9}\\.json"))
        .map(_.getName).sorted)
      .flatMap(_.lastOption)
      .map(n => new java.io.File(storeRoot, n.stripSuffix(".json")).getPath)

  /** Replay the landing dir through [[cdcUpsertStream]] in two waves —
    * REVERSED, so the second wave is older than the first and the
    * out-of-order guard must reject its stale changes — then read the
    * final store version. Must equal the batch "latest event per
    * resource" over the same files (q99's oracle).
    */
  def cdcUpsertReplay(outer: SparkSession, srcDir: String): DataFrame = {
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-cdc-replay")
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-cdc-store").toString
    val files = listFixtureFiles(srcDir)
    val (newer, older) = files.reverse.splitAt(math.max(1, files.size / 2))
    deliver(landing, newer)
    val q = cdcUpsertStream(spark, landing.toString, storeRoot)
    try {
      q.processAllAvailable()
      deliver(landing, older)
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    val latest = latestCdcVersion(storeRoot).getOrElse(
      sys.error(s"no CDC store version written under $storeRoot"))
    // vacuum: keep only the latest version (the returned frame reads it
    // lazily); superseded versions and the checkpoint would otherwise
    // leak one full snapshot copy per batch per replay into tmp
    Option(new java.io.File(storeRoot).listFiles()).foreach(_.foreach { f =>
      if (f.getPath != latest) deleteRecursively(f.toPath)
    })
    spark.read.parquet(latest)
  }

  /** All COMMITTED versions of a CDC store, ascending — resolved from
    * the manifest directory alone (same bounded metadata listing as
    * [[latestCdcVersion]]; data directories are never listed).
    */
  def committedCdcVersions(storeRoot: String): Seq[Long] =
    Option(new java.io.File(storeRoot, "_manifest").listFiles())
      .map(_.filter(f => f.isFile && f.getName.matches("v\\d{9}\\.json"))
        .map(_.getName.stripPrefix("v").stripSuffix(".json").toLong)
        .sorted.toSeq)
      .getOrElse(Nil)

  /** TIME TRAVEL: read the store AS OF a committed version. The
    * version is served IFF its manifest exists — a whole-looking but
    * unmanifested data tree is not a version (the exactly-once
    * invariant read-side). Superseded versions stay readable until a
    * retention vacuum removes them, which is what makes audits,
    * reproducible re-training ("the corpus as the run saw it"), and
    * version diffs possible at all.
    */
  def readCdcVersion(spark: SparkSession, storeRoot: String, version: Long): DataFrame = {
    if (!manifestFile(storeRoot, version).exists())
      sys.error(s"CDC store $storeRoot has no committed version $version " +
        s"(committed: ${committedCdcVersions(storeRoot).mkString(",")})")
    spark.read.parquet(f"$storeRoot/v$version%09d")
  }

  /** Streaming dead-letter triage — the batch q182 surface as a
    * running ingest: a `readStream.text` scan through
    * `Quarantine.triageLines`, so malformed lines flow to the
    * quarantine branch of a LIVE pipeline instead of killing it (the
    * FAILFAST failure mode is strictly worse on a stream: one bad line
    * would crash the query and stall ingestion until a human
    * intervenes). The pipeline is a pure per-row map — no watermark,
    * no state — so delivery order cannot matter, which the replay
    * proves by delivering the fixture files in two waves; the result
    * must equal the batch triage of the same directory line-for-line
    * (q182's own oracle).
    */
  def quarantineStreamReplay(outer: SparkSession, srcDir: String): DataFrame = {
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-quar-replay")
    val files = listFixtureFiles(srcDir)
    val (w1, w2) = files.splitAt(math.max(1, files.size / 2))
    deliver(landing, w1)
    val mem = s"graft_quar_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = graft.sources.Quarantine.triageLines(
        spark.readStream.text(landing.toString))
      .writeStream.format("memory").queryName(mem).outputMode("append").start()
    try {
      q.processAllAvailable()
      deliver(landing, w2)
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem)
  }

  /** Streaming URL-canonicalization triage — q213's projection on a
    * LIVE ingest: crawl fetch records (doc_id, url JSONL) land in two
    * delivery waves and stream through UrlCanon.canonicalUrl/Host.
    * A pure stateless per-row map (the canonicalization is regex/
    * string projections — no state store, no watermark), so the
    * accumulated append output must equal the batch projection
    * line-for-line; certified against q213's batch oracle VERBATIM
    * (the q185 discipline). `urls` must have (doc_id, url).
    */
  def urlCanonStreamReplay(outer: SparkSession, urls: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ext.UrlCanon
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-url-replay")
    def deliverWave(df: DataFrame): Unit =
      df.select(to_json(struct(col("doc_id"), col("url"))).as("value"))
        .coalesce(1).write.mode("append").text(landing.toString)
    deliverWave(urls.filter(col("doc_id") % 2 === 0))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("url", StringType)))
    val mem = s"graft_url_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val out = spark.readStream.text(landing.toString)
      .select(from_json(col("value"), schema).as("j")).select("j.*")
      .select(col("doc_id"), col("url"),
        UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
      .withColumn("host",
        when(col("canonical_url").isNull, lit(null).cast("string"))
          .otherwise(UrlCanon.canonicalHost(col("canonical_url"))))
    val q = out.writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      deliverWave(urls.filter(col("doc_id") % 2 =!= 0))
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem)
  }

  /** Streaming HTTP response triage — q236's parse on a LIVE fetch
    * feed (the q218/q232 stateless-map discipline): raw responses land
    * as JSONL waves (to_json escapes the CRLFs and quotes a wire
    * payload is full of, and from_json restores them byte-exact),
    * every record classifies independently — `HttpRecord.parse` is a
    * pure projection, so no state, no watermark — and two delivery
    * waves must accumulate exactly the batch decision table; q248
    * certifies against q236's oracle VERBATIM. This is the production
    * shape: fetchers append response blobs continuously, and the
    * ok/bad_status/bad_type/bad_encoding/malformed split is available
    * per microbatch instead of per crawl cycle.
    */
  def httpParseStreamReplay(outer: SparkSession, raws: DataFrame): DataFrame =
    projectionStreamReplay(outer, raws, "doc_id", "raw",
      df => graft.ext.HttpRecord.parse(df, "doc_id", "raw"))

  /** Stateless-projection streaming twin harness — the
    * [[httpParseStreamReplay]] shape generalized to ANY pure per-row
    * projection `f` over (id: long, payload: string) rows: replay the
    * rows as two JSONL waves (even ids, then odd) through readStream →
    * `f` → memory sink. Because `f` is a projection, the accumulated
    * table must equal the batch `f(rows)` output verbatim — certify
    * by reusing the batch query's oracle SQL unchanged (the
    * identical-oracle discipline). `f` must not shuffle or aggregate:
    * append-mode per-microbatch output only makes sense for
    * row-at-a-time transforms.
    */
  def projectionStreamReplay(
      outer: SparkSession, rows: DataFrame, idCol: String,
      payloadCol: String, f: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-proj-replay")
    def deliverWave(df: DataFrame): Unit =
      df.select(to_json(struct(col(idCol), col(payloadCol))).as("value"))
        .coalesce(1).write.mode("append").text(landing.toString)
    deliverWave(rows.filter(col(idCol) % 2 === 0))
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField(payloadCol, StringType)))
    val mem = s"graft_proj_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val out = f(
      spark.readStream.text(landing.toString)
        .select(from_json(col("value"), schema).as("j")).select("j.*"))
    val q = out.writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      deliverWave(rows.filter(col(idCol) % 2 =!= 0))
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem)
  }

  /** STATEFUL streaming recrawl estimation — UrlCanon.recrawlStats'
    * lag-over-history as an incremental fold: per url the state is
    * O(1) — the LAST fingerprint plus running (n, changes) counts,
    * never the history (a 100-TB fetch log folds into url-count
    * state; the batch form's window re-reads every revisit). Rows
    * fold in round order inside each batch; the fingerprint carried
    * ACROSS microbatches is what detects a change whose two sides
    * arrive in different waves. Event time is synthesized from the
    * revisit round; the final per-url row emits on event-time timeout
    * after the watermark passes it (the transitionsStream discipline).
    * CONTRACT: per-url rounds arrive non-decreasing across batches
    * (fetchers revisit forward in time).
    */
  def recrawlStream(spark: SparkSession, dir: String): Dataset[RecrawlCounts] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("r", LongType),
      StructField("fp", StringType)))
    spark.readStream.schema(schema).json(dir)
      .withColumn("ets", timestamp_micros(col("r") * 60000000L))
      .withWatermark("ets", "40 days")
      .filter(col("url").isNotNull && col("r").isNotNull)
      .select(col("url").as[String], col("r").as[Long], col("fp").as[String],
        col("ets").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[RecrawlBuf, RecrawlCounts](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (url, rows, state) =>
        if (state.hasTimedOut) {
          val b = state.get
          state.remove()
          Iterator.single(RecrawlCounts(url, b.n, b.ch))
        } else {
          val sorted = rows.toSeq.sortBy(_._2)
          val init = state.getOption.getOrElse(RecrawlBuf(null, -1L, 0L, 0L))
          val folded = sorted.foldLeft(init) { (b, row) =>
            val chg = if (b.n > 0L && b.lastFp != row._3) 1L else 0L
            RecrawlBuf(row._3, row._2, b.n + 1L, b.ch + chg)
          }
          state.update(folded)
          state.setTimeoutTimestamp(
            sorted.map(_._2).max * 60000L + 60L * 60L * 1000L)
          Iterator.empty
        }
      }
  }

  /** Bounded replay of [[recrawlStream]]: the q246 fetch history in
    * two waves SPLIT MID-HISTORY (rounds 1-2, then 3-5) — the change
    * a period-2 url makes between rounds 2 and 3 is only visible if
    * the fingerprint state survived the wave boundary — plus two
    * far-future sentinel waves to fire the timeouts; sentinel url
    * filtered back out; ppm/priority derived by the SAME
    * `withRecrawlDerived` code path the batch operator uses. q256
    * certifies against q246's oracle VERBATIM.
    */
  def recrawlReplay(outer: SparkSession, fetches: DataFrame): DataFrame = {
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-recrawl-replay")
    val mem = s"graft_recrawl_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    def deliverWave(name: String, df: DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-rc-$name")
      df.select(to_json(struct(col("url"), col("r"), col("fp"))).as("value"))
        .coalesce(1).write.mode("overwrite").text(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath, landing.resolve(s"$name.json"))
      deleteRecursively(tmp)
    }
    deliverWave("wave1", fetches.filter(col("r") <= 2))
    val q = recrawlStream(spark, landing.toString)
      .toDF().writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      deliverWave("wave2", fetches.filter(col("r") > 2))
      q.processAllAvailable()
      for (n <- Seq(1, 2)) {
        java.nio.file.Files.writeString(landing.resolve(s"zz-sentinel$n.json"),
          s"""{"url": "zz-sentinel", "r": ${900000 + n}, "fp": "s"}""")
        q.processAllAvailable()
      }
    } finally { q.stop(); deleteRecursively(landing) }
    graft.ext.UrlCanon.withRecrawlDerived(
      drainMemorySink(spark, mem).filter(col("url") =!= "zz-sentinel"))
  }

  /** Streaming HTML main-content extraction — q226's chain on a LIVE
    * ingest (the q218 stateless-map discipline): fetched pages land as
    * JSONL waves (to_json escapes the quotes hostile HTML is full of),
    * every row extracts independently — no state, no watermark — so
    * two delivery waves must accumulate exactly the batch table; q232
    * certifies against q226's oracle VERBATIM.
    */
  def htmlExtractStreamReplay(outer: SparkSession, pages: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-html-replay")
    def deliverWave(df: DataFrame): Unit =
      df.select(to_json(struct(col("doc_id"), col("html"))).as("value"))
        .coalesce(1).write.mode("append").text(landing.toString)
    deliverWave(pages.filter(col("doc_id") % 2 === 0))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("html", StringType)))
    val mem = s"graft_html_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val out = spark.readStream.text(landing.toString)
      .select(from_json(col("value"), schema).as("j")).select("j.*")
      .select(col("doc_id"),
        graft.ext.HtmlExtract.mainText(col("html")).as("main_text"))
      .withColumn("n_chars_text", length(col("main_text")).cast("long"))
    val q = out.writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      deliverWave(pages.filter(col("doc_id") % 2 =!= 0))
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem)
  }

  /** Streaming ANN serving — the stored IVF index probed by a LIVE
    * query stream: query embeddings land as PARQUET waves (bit-exact
    * floats — a JSONL text round-trip could drop ulps) and each
    * microbatch is probed via foreachBatch against the SAME frozen
    * index (stream-static: the index never changes mid-stream), the
    * per-batch results appended to an output dir. Per-query top-k is
    * independent across queries, so the accumulated output must equal
    * the one-shot batch probe — q224 certifies against q88's oracle
    * VERBATIM. This is the production serving shape: the corpus is
    * never re-assigned; a query batch costs O(|batch|·nprobe lists).
    */
  def ivfStreamProbeReplay(outer: SparkSession, sfDir: String): DataFrame = {
    import graft.ext.SimSearch
    val spark = replaySession(outer)
    val emb = graft.tables.Corpus.load(spark, sfDir, "embeddings")
    // the SAME stored index q88 probes (shared content-keyed seam)
    val idx = SimSearch.readIvfIndex(spark,
      SimSearch.ensureStoredIvfIndex(spark, sfDir, nlist = 16))
    // register the codegen'd cosine BEFORE the stream starts: the
    // microbatch executes under a cloned session whose function
    // registry is copied at stream START — a registration made inside
    // foreachBatch lands on the wrong registry and the probe fails
    // with UNRESOLVED_ROUTINE cosine_sim
    graft.plans.CosineSimilarity.register(spark)
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select("vec_id", "embedding")
    val landing = java.nio.file.Files.createTempDirectory("graft-ann-stream")
    val outDir = java.nio.file.Files.createTempDirectory("graft-ann-out")
    def deliverWave(df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(landing.toString)
    deliverWave(queries.filter(col("vec_id") % 100 === 0))
    val q = spark.readStream.schema(queries.schema).parquet(landing.toString)
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyAnnProbeBatch(idx, batch, outDir.toString, batchId)
      }.start()
    try {
      q.processAllAvailable()
      deliverWave(queries.filter(col("vec_id") % 100 =!= 0))
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    // recursiveFileLookup, not a "b*" glob: the glob path triggers a
    // noisy FileStreamSink metadata probe warning on every read.
    // localCheckpoint THEN delete the result dirs (the
    // noveltyStreamReplay lifetime pattern) — returning a lazy reader
    // would leak one temp tree per replay invocation
    val out = spark.read.option("recursiveFileLookup", "true")
      .parquet(outDir.toString).localCheckpoint()
    deleteRecursively(outDir)
    out
  }

  /** Apply one ANN-serving microbatch: probe the frozen index, write
    * the results to the batch's OWN overwrite dir — not a blind
    * append — so a replayed batch (restart between write and stream
    * commit) rewrites its dir instead of duplicating rows (the
    * applyCdcBatch/applyCrawlBatch idempotent-replay discipline;
    * StreamingSpec replays a batch twice and counts).
    */
  private[graft] def applyAnnProbeBatch(
      idx: graft.ext.SimSearch.IvfIndex, batch: DataFrame,
      outDir: String, batchId: Long): Unit = {
    graft.ext.SimSearch.ivfTopKAgainstIndex(
        idx, batch, "vec_id", "embedding", k = 5, nprobe = 16)
      .write.mode("overwrite").parquet(f"$outDir/b$batchId%05d")
  }

  /** Replay the landing dir in the same two reversed waves as
    * [[cdcUpsertReplay]], keep every version, then TIME-TRAVEL: diff
    * the first committed snapshot against the last via [[Diff]]'s
    * fingerprint machinery (key + 32-byte hash cross the shuffle,
    * never the payload). Because wave 2 is deliberately STALE, the
    * guard rejects its updates for keys wave 1 already wrote — so the
    * diff must show those keys `unchanged`, and `added` exactly for
    * keys whose every event sits in the older half; any `changed` row
    * means a key's true latest event lives in the older wave and the
    * guard correctly accepted it. The oracle reproduces all of it from
    * the raw files with the same filename split.
    */
  def cdcTimeTravelReplay(outer: SparkSession, srcDir: String): DataFrame = {
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-cdc-tt")
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-cdc-tt-store").toString
    val files = listFixtureFiles(srcDir)
    // wave 1 is the lexicographically-largest SIXTH (not half as in
    // cdcUpsertReplay): small enough that some keys' only events sit in
    // the older wave, so the diff exercises `added`, not just
    // `unchanged` (on the 24-file fixture: 4 added / 3 unchanged)
    val (newer, older) = files.reverse.splitAt(math.max(1, files.size / 6))
    deliver(landing, newer)
    val q = cdcUpsertStream(spark, landing.toString, storeRoot)
    try {
      q.processAllAvailable()
      deliver(landing, older)
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    val versions = committedCdcVersions(storeRoot)
    require(versions.size >= 2, s"expected >=2 CDC versions, got $versions")
    val v0 = readCdcVersion(spark, storeRoot, versions.head).localCheckpoint()
    val vN = readCdcVersion(spark, storeRoot, versions.last).localCheckpoint()
    // checkpointed above so the frames survive the store vacuum below
    Option(new java.io.File(storeRoot).listFiles())
      .foreach(_.foreach(f => deleteRecursively(f.toPath)))
    graft.operators.Diff.diff(v0, vN, "resourceId",
      Seq("seq", "eventId", "userId", "duration"))
  }

  /** Streaming ordered funnel — q114's sorted-walk fold as a
    * flatMapGroupsWithState state machine: funnel events buffer per
    * user until the event-time timeout fires, then the buffer is
    * sorted (tsUs, code) and folded exactly like the batch operator —
    * so arrival order CANNOT matter, which the replay proves by
    * delivering waves interleaved by event-id parity (maximal
    * disorder). The watermark delay must cover the corpus's time span
    * (40 days here vs the 30-day synthetic window): with the usual
    * 1-day delay, a second delivery wave containing day-1 events would
    * be silently dropped as late once the watermark reached day-29 —
    * the streaming-vs-batch divergence this design exists to rule out.
    * State is the user's FUNNEL events only (the stage-code filter
    * runs before the stateful operator), and the timeout lands 1 h
    * after the user's last buffered event.
    */
  def funnelStream(
      spark: SparkSession, dir: String, stages: Seq[String],
      sampleRate: Double, sampleSalt: String): Dataset[UserStage] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("event_type", StringType)))
    val code = stages.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (s, i)) => when(col("event_type") === s, lit(i + 1)).otherwise(acc)
    }
    spark.readStream.schema(schema).json(dir)
      .withColumn("ets", timestamp_micros(col("ts_us")))
      .withWatermark("ets", "40 days")
      .filter(col("user_id").isNotNull && col("ts_us").isNotNull)
      .filter(graft.operators.Sampling.hashUnit(col("event_id"), sampleSalt) <
        lit(graft.operators.Sampling.thresholdHex(sampleRate)))
      .withColumn("code", code).filter(col("code") > 0)
      // the watermarked column itself must reach the stateful operator
      // (Spark refuses event-time timeouts otherwise)
      .select(col("user_id").as[Long], col("ts_us").as[Long], col("code").as[Int],
        col("ets").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, UserStage](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (uid, rows, state) =>
        if (state.hasTimedOut) {
          val evs = state.get.evs
          state.remove()
          var stage = 0
          evs.sortBy(e => (e.tsUs, e.code))
            .foreach(e => if (e.code == stage + 1) stage += 1)
          Iterator.single(UserStage(uid, stage))
        } else {
          val evs = state.getOption.map(_.evs).getOrElse(Nil) ++
            rows.map(r => FunnelEv(r._2, r._3))
          state.update(FunnelBuf(evs))
          state.setTimeoutTimestamp(evs.map(_.tsUs).max / 1000L + 60L * 60L * 1000L)
          Iterator.empty
        }
      }
  }

  /** Bounded replay of streaming n-gram novelty scoring (q208's
    * certified surface): the held-out 1/5 documents are rendered to a
    * JSON landing dir in THREE waves and each MICROBATCH is scored
    * against a PRECOMPUTED reference gram set — the stream-static
    * join shape; re-deriving the set per trigger would re-shuffle the
    * whole reference every batch (TextAnalysis.ngramSet exists for
    * exactly this). Per-doc novelty is delivery-independent (no
    * cross-batch state), so the waves must be INVISIBLE in the rows:
    * the result is certified against q202's identical batch oracle.
    * foreachBatch appends each batch's scores to a parquet spool —
    * processAllAvailable runs each batch exactly once here; the full
    * manifest-commit discipline lives in q190/q99.
    */
  def noveltyStreamReplay(outer: SparkSession, sfDir: String): DataFrame = {
    val spark = replaySession(outer)
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val landing = Files.createTempDirectory("graft-novelty-replay")
    val outDir = Files.createTempDirectory("graft-novelty-out")
    val docs = graft.tables.Corpus.load(spark, sfDir, "documents")
    val refSet = graft.ext.TextAnalysis.ngramSet(
      docs.filter(col("doc_id") % 5 === 1), "text", 3).localCheckpoint()
    val scored = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    def renderWave(name: String, wave: DataFrame): Unit = {
      val tmp = Files.createTempDirectory(s"graft-novelty-$name")
      wave.coalesce(1).write.mode("overwrite").json(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".json")).head
      Files.move(part.toPath, landing.resolve(s"$name.json"))
      deleteRecursively(tmp)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    renderWave("wave1", scored.filter(col("doc_id") % 3 === 0))
    val q = spark.readStream.schema(schema).json(landing.toString)
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ext.TextAnalysis.ngramNoveltyAgainst(
            batch, refSet, "doc_id", "text", n = 3)
          .write.mode("append").parquet(outDir.toString)
        ()
      }.start()
    try {
      q.processAllAvailable()
      renderWave("wave2", scored.filter(col("doc_id") % 3 === 1))
      q.processAllAvailable()
      renderWave("wave3", scored.filter(col("doc_id") % 3 === 2))
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    val out = spark.read.parquet(outDir.toString).localCheckpoint()
    deleteRecursively(outDir)
    out
  }

  /** Bounded replay of [[funnelStream]] over the parquet events table
    * (q124's certified surface): events are rendered to a JSON landing
    * dir in TWO interleaved waves (event-id parity — every user's
    * stream is split across waves, maximal disorder), streamed through
    * the state machine, then two far-future sentinel waves advance the
    * watermark so every user's event-time timeout fires (timeouts run
    * on the trigger AFTER the watermark moves, hence two). Returns
    * (stage, n_users) with the sentinel user filtered out —
    * hash-comparable against q114's batch oracle.
    */
  def funnelReplay(outer: SparkSession, sfDir: String): DataFrame = {
    val spark = replaySession(outer)
    import java.nio.file.Files
    val landing = Files.createTempDirectory("graft-funnel-replay")
    val mem = s"graft_funnel_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ev = graft.tables.Corpus.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    def renderWave(name: String, wave: DataFrame): Unit = {
      val tmp = Files.createTempDirectory(s"graft-funnel-$name")
      wave.coalesce(1).write.mode("overwrite").json(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".json")).head
      Files.move(part.toPath, landing.resolve(s"$name.json"))
      deleteRecursively(tmp)
    }
    renderWave("wave1", ev.filter(col("event_id") % 2 === 0))
    val q = funnelStream(spark, landing.toString,
        Seq("view", "click", "signup", "purchase"), 0.05, "funnel-v1")
      .toDF().writeStream.format("memory").queryName(mem).outputMode("append").start()
    try {
      q.processAllAvailable()
      renderWave("wave2", ev.filter(col("event_id") % 2 =!= 0))
      q.processAllAvailable()
      // Sentinel ids -48/-61 are chosen to PASS the 5% md5 draw: a
      // sentinel must be a fully valid row, or the sample filter —
      // which the optimizer pushes BELOW the watermark operator —
      // drops it before the event-time stats see it and the watermark
      // never advances (debugged exactly so; the session replay's
      // sentinels survive its filters the same way).
      for ((id, n) <- Seq((-48, 1), (-61, 2))) {
        Files.writeString(landing.resolve(s"zz-sentinel$n.json"),
          s"""{"event_id": $id, "user_id": -1, "ts_us": ${1893456000000000L + n}, "event_type": "view"}""")
        q.processAllAvailable()
      }
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem)
      .filter(col("user_id") >= 0)
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
  }

  /** Streaming state-transition mining (q128's batch operator as a
    * stateful stream): per user, buffer (ts_us, event_id, type) until
    * the event-time timeout fires, then sort by the same
    * (ts_us, event_id) TOTAL order the batch lag() uses and emit every
    * consecutive (from → to) pair. Disorder-proof by construction —
    * replay waves can interleave arbitrarily because ordering happens
    * at flush, not at arrival (the funnelStream discipline).
    */
  def transitionsStream(
      spark: SparkSession, dir: String): Dataset[TransPair] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("event_type", StringType)))
    spark.readStream.schema(schema).json(dir)
      .withColumn("ets", timestamp_micros(col("ts_us")))
      .withWatermark("ets", "40 days")
      .filter(col("user_id").isNotNull && col("ts_us").isNotNull)
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("ts_us").as[Long], col("event_type").as[String],
        col("ets").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[TransBuf, TransPair](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (uid, rows, state) =>
        if (state.hasTimedOut) {
          val evs = state.get.evs
          state.remove()
          val ordered = evs.sortBy(e => (e.tsUs, e.eventId))
          ordered.iterator.zip(ordered.iterator.drop(1))
            .map { case (a, b) => TransPair(uid, a.etype, b.etype) }
        } else {
          val evs = state.getOption.map(_.evs).getOrElse(Nil) ++
            rows.map(r => TransEv(r._3, r._2, r._4))
          state.update(TransBuf(evs))
          state.setTimeoutTimestamp(evs.map(_.tsUs).max / 1000L + 60L * 60L * 1000L)
          Iterator.empty
        }
      }
  }

  /** Bounded replay of [[transitionsStream]] (the funnelReplay
    * machinery): two event-id-parity interleaved waves, two far-future
    * sentinel waves to fire every timeout, sentinel user filtered out,
    * pairs batch-aggregated to the (from, to, n) matrix — hash-
    * comparable against q128's batch oracle restricted to non-null
    * users.
    */
  def transitionsReplay(outer: SparkSession, sfDir: String): DataFrame = {
    val spark = replaySession(outer)
    import java.nio.file.Files
    val landing = Files.createTempDirectory("graft-trans-replay")
    val mem = s"graft_trans_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ev = graft.tables.Corpus.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    def renderWave(name: String, wave: DataFrame): Unit = {
      val tmp = Files.createTempDirectory(s"graft-trans-$name")
      wave.coalesce(1).write.mode("overwrite").json(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".json")).head
      Files.move(part.toPath, landing.resolve(s"$name.json"))
      deleteRecursively(tmp)
    }
    renderWave("wave1", ev.filter(col("event_id") % 2 === 0))
    val q = transitionsStream(spark, landing.toString)
      .toDF().writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      renderWave("wave2", ev.filter(col("event_id") % 2 =!= 0))
      q.processAllAvailable()
      // no row filters upstream of the watermark here, but the
      // sentinels still must be fully-valid rows (funnelReplay note)
      for (n <- Seq(1, 2)) {
        Files.writeString(landing.resolve(s"zz-sentinel$n.json"),
          s"""{"event_id": ${-40 - n}, "user_id": -1, "ts_us": ${1893456000000000L + n}, "event_type": "view"}""")
        q.processAllAvailable()
      }
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem)
      .filter(col("user_id") >= 0)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** Custom state: running per-resource event totals via
    * mapGroupsWithState (KeyValueGroupedDataset surface).
    */
  def runningTotals(events: Dataset[Event]): Dataset[(String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.resourceId)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (resourceId: String, rows: Iterator[Event], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (resourceId, total)
      }
  }

  /** Streaming fetch-decode twin — q308's bytes→text decision table
    * on a LIVE ingest (the q232 stateless-map discipline): raw
    * response records travel BASE64-encoded inside JSONL waves
    * (binary cannot ride a text landing zone raw; base64 is
    * byte-exact both ways), each row decodes independently (pure
    * projection → append mode, zero state), so two delivery waves
    * must accumulate the identical table — certified against q308's
    * batch oracle VERBATIM (q311).
    */
  def fetchDecodeStreamReplay(outer: SparkSession, fixture: DataFrame,
      maxBytes: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = replaySession(outer)
    val landing = java.nio.file.Files.createTempDirectory("graft-fetch-replay")
    def deliverWave(df: DataFrame): Unit =
      df.select(to_json(struct(col("doc_id"),
          base64(col("raw")).as("raw_b64"))).as("value"))
        .coalesce(1).write.mode("append").text(landing.toString)
    deliverWave(fixture.filter(col("doc_id") % 2 === 0))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("raw_b64", StringType)))
    val mem = s"graft_fetch_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val src = spark.readStream.text(landing.toString)
      .select(from_json(col("value"), schema).as("j")).select("j.*")
      .select(col("doc_id"), unbase64(col("raw_b64")).as("raw"))
    val out = graft.ext.FetchDecode.decodeResponses(src, "doc_id", "raw",
      maxBytes)
    val q = out.writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      deliverWave(fixture.filter(col("doc_id") % 2 =!= 0))
      q.processAllAvailable()
    } finally { q.stop(); deleteRecursively(landing) }
    drainMemorySink(spark, mem)
  }

  /** STREAMING semantic-dedup ingest — the q190 read→fold→append
    * lifecycle on the SemDeDup arc: embedding waves land as PARQUET
    * (bit-exact floats), each microbatch folds into the running
    * assignment via [[graft.ext.Dedup.semDedupIncremental]] against
    * the STORED index and then APPENDS itself to the index, so a
    * later wave's near-dups of an EARLIER wave are found directly
    * through the store. q316's wave split makes that append path
    * LOAD-BEARING, not a redundancy: the pre-stream corpus is pure
    * singletons, wave A carries each dup group's base + ×2 copy, and
    * wave B carries the ×4 copies — B's only partners live in A, so
    * without the append every B row would come back a singleton and
    * the brute-force oracle comparison would fail. The accumulated
    * assignment must equal the one-shot [[graft.ext.Dedup.semDedup]]
    * of the full corpus (q310's oracle VERBATIM).
    *
    * REPLAY CAVEAT (the applyAnnProbeBatch discipline does not apply
    * here): the fold mutates the running assignment, so THIS harness
    * is not idempotent under microbatch re-delivery — it exists to
    * certify the load-bearing append in isolation (q316). The
    * production shape is [[semDedupIngestIdempotentReplay]] /
    * [[applySemDedupIngestBatch]] (q319): folds keyed by batchId
    * under the q99/CDC manifest protocol, redelivery a no-op.
    */
  def semDedupIngestReplay(
      outer: SparkSession, corpus: DataFrame, isOld: Column,
      waveA: Column, nlist: Int, tau: Double,
      appendWaves: Boolean = true): DataFrame = {
    import graft.ext.{Dedup, SimSearch}
    val spark = replaySession(outer)
    // register the codegen'd cosine BEFORE the stream starts (the
    // ivfStreamProbeReplay registry-copy rule)
    graft.plans.CosineSimilarity.register(spark)
    // re-root the fixture under the replay session: frames from the
    // outer session must not join frames planned under the clone
    val tmp = java.nio.file.Files.createTempDirectory("graft-semdd-corpus")
    corpus.write.mode("overwrite").parquet(tmp.toString)
    val c = spark.read.parquet(tmp.toString).localCheckpoint()
    val old = c.filter(isOld)
    val batch = c.filter(!isOld)
    val store = java.nio.file.Files.createTempDirectory("graft-semdd-idx")
    SimSearch.writeIvfIndex(SimSearch.buildIvfIndex(
      old, "vec_id", "embedding", nlist, seed = 7L, lloydIters = 1),
      store.toString)
    var assign = Dedup.semDedupWithIndex(
      SimSearch.readIvfIndex(spark, store.toString), old, "vec_id", tau)
      .localCheckpoint()
    val landing = java.nio.file.Files.createTempDirectory("graft-semdd-waves")
    def deliverWave(df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(landing.toString)
    deliverWave(batch.filter(waveA))
    val q = spark.readStream.schema(batch.schema).parquet(landing.toString)
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val idx = SimSearch.readIvfIndex(spark, store.toString)
          // ONE coarse-assignment pass per wave (round-20, the q189
          // one-pass rule): the fold and the index append need the
          // identical argmax rows — appendToIvfIndex would re-read the
          // store and re-run the crossJoin-argmax for the same batch
          val assigned = SimSearch.assignToAnchors(
            b, idx.anchors, "vec_id", "embedding").localCheckpoint()
          assign = Dedup.semDedupIncrementalAssigned(
            idx, assign, assigned, "vec_id", tau).localCheckpoint()
          // appendWaves=false is the StreamingSpec NEGATIVE PROBE: it
          // must break cross-wave dedup, proving the append is
          // load-bearing (the non-vacuous-assertion discipline)
          if (appendWaves)
            assigned.write.mode("append").parquet(store.toString + "/lists")
        }
      }.start()
    try {
      q.processAllAvailable()
      deliverWave(batch.filter(!waveA))
      q.processAllAvailable()
    } finally {
      q.stop()
      deleteRecursively(landing)
      deleteRecursively(tmp)
      deleteRecursively(store)
    }
    assign
  }

  /** STREAMING perceptual-dedup ingest (round 16 — the q190/q316
    * read→probe→append lifecycle on the banded-hamming arc): media
    * fingerprints arrive in waves; each wave emits its WITHIN-wave
    * pairs ([[graft.ext.SimSearch.hammingBandedPairs]]) plus its
    * pairs AGAINST THE STORED corpus
    * ([[graft.ext.SimSearch.hammingBandedPairsAgainst]] — batch-vs-
    * store, never store-vs-store), then appends itself to the store,
    * so a later wave's near-dups of an earlier wave are found through
    * the store. The accumulated pair set must equal the one-shot
    * all-pairs batch result — q334 certifies against q326's oracle
    * VERBATIM. `appendWaves = false` is the StreamingSpec NEGATIVE
    * PROBE: cross-wave pairs vanish, proving the append is
    * load-bearing. Per-wave cost: O(batch + store scan) — the store
    * is a 16-byte-per-row hash table, ~10⁻⁴ of the media bytes it
    * fingerprints; at production scale the same probe runs against a
    * band-bucketed layout.
    */
  def hammingDedupIngestReplay(
      outer: SparkSession, hashes: DataFrame, idCol: String,
      hashCol: String, waveA: Column, maxDist: Int = 3,
      appendWaves: Boolean = true): DataFrame = {
    import graft.ext.SimSearch
    val spark = replaySession(outer)
    // re-root the fixture under the replay session (the semDedup rule)
    val tmp = java.nio.file.Files.createTempDirectory("graft-hh-corpus")
    hashes.write.mode("overwrite").parquet(tmp.toString)
    val h = spark.read.parquet(tmp.toString).localCheckpoint()
    // the store starts EMPTY (schema-only parquet) — the first wave
    // probes nothing and seeds it
    val store = java.nio.file.Files.createTempDirectory("graft-hh-store")
    h.limit(0).write.mode("overwrite").parquet(store.toString)
    var pairs = SimSearch.hammingBandedPairs(h.limit(0), idCol, hashCol,
      maxDist).localCheckpoint() // empty frame with the output schema
    val landing = java.nio.file.Files.createTempDirectory("graft-hh-waves")
    def deliverWave(df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(landing.toString)
    deliverWave(h.filter(waveA))
    val q = spark.readStream.schema(h.schema).parquet(landing.toString)
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val bb = b.localCheckpoint()
          val corpus = spark.read.parquet(store.toString).localCheckpoint()
          val p = SimSearch.hammingBandedPairs(bb, idCol, hashCol, maxDist)
            .unionByName(SimSearch.hammingBandedPairsAgainst(
              bb, corpus, idCol, hashCol, maxDist))
          pairs = pairs.unionByName(p).localCheckpoint()
          if (appendWaves)
            bb.write.mode("append").parquet(store.toString)
        }
      }.start()
    try {
      q.processAllAvailable()
      deliverWave(h.filter(!waveA))
      q.processAllAvailable()
    } finally {
      q.stop()
      deleteRecursively(landing)
      deleteRecursively(tmp)
      deleteRecursively(store)
    }
    pairs
  }

  /** STREAMING drift-report ingest (round 16 — the mergeable-state
    * discipline live on a stream): embedding waves of the CANDIDATE
    * version fold into a running [[graft.ext.SimSearch.driftState]]
    * via mergeDriftStates (sums of sums — O(dims) state per fold,
    * the cheapest possible streaming aggregate), and after the
    * stream drains the accumulated state reports against the frozen
    * REFERENCE version — q353 certifies the result equals the
    * one-shot q350 report VERBATIM. This is the production shape for
    * continuous embedding QA: the reference state is computed once,
    * each ingest batch folds in constant-size state, and the drift
    * gate runs per microbatch at dims-cost.
    */
  def driftIngestReplay(
      outer: SparkSession, reference: DataFrame, candidate: DataFrame,
      vecCol: String, waveA: Column, flagQUnits: Long): DataFrame = {
    import graft.ext.SimSearch
    val spark = replaySession(outer)
    val tmpR = java.nio.file.Files.createTempDirectory("graft-drift-ref")
    reference.write.mode("overwrite").parquet(tmpR.toString)
    val refState = SimSearch.driftState(
      spark.read.parquet(tmpR.toString), vecCol).localCheckpoint()
    val tmpC = java.nio.file.Files.createTempDirectory("graft-drift-cand")
    candidate.write.mode("overwrite").parquet(tmpC.toString)
    val cand = spark.read.parquet(tmpC.toString).localCheckpoint()
    var candState: DataFrame = null
    val landing = java.nio.file.Files.createTempDirectory("graft-drift-waves")
    def deliverWave(df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(landing.toString)
    deliverWave(cand.filter(waveA))
    val q = spark.readStream.schema(cand.schema).parquet(landing.toString)
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val st = SimSearch.driftState(b.localCheckpoint(), vecCol)
          candState = (if (candState == null) st
            else SimSearch.mergeDriftStates(candState, st)).localCheckpoint()
        }
      }.start()
    try {
      q.processAllAvailable()
      deliverWave(cand.filter(!waveA))
      q.processAllAvailable()
    } finally {
      q.stop()
      deleteRecursively(landing)
      deleteRecursively(tmpR)
      deleteRecursively(tmpC)
    }
    SimSearch.driftFromStates(refState, candState, flagQUnits)
  }

  /** EXACTLY-ONCE perceptual-dedup ingest (the q319 batchId-manifest
    * discipline on the hamming arc — [[hammingDedupIngestReplay]]
    * without this guard would double BOTH the within-wave pairs and
    * the store rows on a crash redelivery): each wave publishes its
    * hashes under `v<batchId>/` with the `_manifest/v<batchId>.json`
    * rename LAST, the effective corpus is the union of COMMITTED
    * versions, and a redelivered batchId no-ops before any fold.
    * After the stream drains, the harness RE-DELIVERS wave A
    * verbatim under its ORIGINAL batchId — the guard must make it
    * invisible and the pair set still equals q326's one-shot oracle
    * VERBATIM (q354). `redeliverGuarded = false` is the StreamingSpec
    * NEGATIVE probe: the same redelivery under a FRESH batchId (the
    * unguarded pipeline's view) duplicates wave A's within-wave
    * pair, proving the guard is load-bearing.
    */
  def hammingDedupIngestIdempotentReplay(
      outer: SparkSession, hashes: DataFrame, idCol: String,
      hashCol: String, waveA: Column, maxDist: Int = 3,
      redeliverGuarded: Boolean = true): DataFrame = {
    import graft.ext.SimSearch
    val spark = replaySession(outer)
    val tmp = java.nio.file.Files.createTempDirectory("graft-hhx-corpus")
    hashes.write.mode("overwrite").parquet(tmp.toString)
    val h = spark.read.parquet(tmp.toString).localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("graft-hhx-store")
    java.nio.file.Files.createDirectories(store.resolve("_manifest"))
    var pairs = SimSearch.hammingBandedPairs(h.limit(0), idCol, hashCol,
      maxDist).localCheckpoint()
    def committedDirs(): Seq[String] =
      Option(store.resolve("_manifest").toFile.listFiles())
        .map(_.toSeq.map(_.getName).filter(_.matches("v\\d{9}\\.json"))
          .map(_.stripSuffix(".json")).sorted
          .map(v => store.resolve(v).toString))
        .getOrElse(Seq.empty)
    def applyBatch(b: DataFrame, batchId: Long): Unit = {
      val mf = store.resolve("_manifest").resolve(f"v$batchId%09d.json")
      if (java.nio.file.Files.exists(mf)) return // redelivery no-op
      if (b.isEmpty) return
      val bb = b.localCheckpoint()
      val dirs = committedDirs()
      val corpus = if (dirs.isEmpty) h.limit(0)
        else spark.read.parquet(dirs: _*).localCheckpoint()
      val p = SimSearch.hammingBandedPairs(bb, idCol, hashCol, maxDist)
        .unionByName(SimSearch.hammingBandedPairsAgainst(
          bb, corpus, idCol, hashCol, maxDist))
      pairs = pairs.unionByName(p).localCheckpoint()
      // publish data FIRST, manifest rename LAST (the commit point)
      bb.write.mode("overwrite")
        .parquet(store.resolve(f"v$batchId%09d").toString)
      val tmpMf = store.resolve("_manifest").resolve(
        f".v$batchId%09d.json.tmp")
      java.nio.file.Files.write(tmpMf, "{}".getBytes("UTF-8"))
      java.nio.file.Files.move(tmpMf, mf): Unit
    }
    val landing = java.nio.file.Files.createTempDirectory("graft-hhx-waves")
    def deliverWave(df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(landing.toString)
    deliverWave(h.filter(waveA))
    val q = spark.readStream.schema(h.schema).parquet(landing.toString)
      .writeStream.foreachBatch(applyBatch _).start()
    try {
      q.processAllAvailable()
      deliverWave(h.filter(!waveA))
      q.processAllAvailable()
      // the crash-redelivery a checkpoint produces: wave A verbatim,
      // original batchId (guarded) or a fresh one (negative probe)
      applyBatch(h.filter(waveA), if (redeliverGuarded) 0L else 999L)
    } finally {
      q.stop()
      deleteRecursively(landing)
      deleteRecursively(tmp)
      deleteRecursively(store)
    }
    pairs
  }

  // ── EXACTLY-ONCE semantic-dedup ingest (round-15 forward item #3:
  // the replay-idempotency caveat on [[semDedupIngestReplay]],
  // closed by composing the q99/CDC manifest discipline onto the
  // semantic arc) ──

  /** Resolve the versioned ingest store: `root/index` holds the
    * frozen quantizer (anchors + the OLD corpus's inverted lists),
    * `root/init-assign` the pre-stream assignment, and each committed
    * wave `root/v<batchId>` carries BOTH the folded assignment
    * (`assign/`) and the wave's coarse-assigned list delta (`delta/`)
    * — a version exists IFF its `_manifest/v<id>.json` does (the
    * [[applyCdcBatch]] protocol verbatim), so the effective inverted
    * lists are base ∪ committed deltas and the current assignment is
    * the LATEST committed version's. Bounded metadata listing only —
    * data directories are never listed.
    */
  private[graft] def semDedupStoreState(
      spark: SparkSession, storeRoot: String)
      : (graft.ext.SimSearch.IvfIndex, DataFrame) = {
    import graft.ext.SimSearch
    val base = SimSearch.readIvfIndex(spark, s"$storeRoot/index")
    val committed = Option(new java.io.File(storeRoot, "_manifest").listFiles())
      .map(_.filter(f => f.isFile && f.getName.matches("v\\d{9}\\.json"))
        .map(_.getName.stripSuffix(".json")).sorted.toSeq)
      .getOrElse(Seq.empty)
    val deltas = committed.map(v =>
      spark.read.parquet(s"$storeRoot/$v/delta")
        .select(col("id").as("neighbor_id"), col("vec").as("__cv2"),
          col("cid").as("__cid")))
    val lists = deltas.foldLeft(base.lists)(_ unionByName _)
    val assign = committed.lastOption
      .map(v => spark.read.parquet(s"$storeRoot/$v/assign"))
      .getOrElse(spark.read.parquet(s"$storeRoot/init-assign"))
    (base.copy(lists = lists), assign)
  }

  /** One IDEMPOTENT semantic-dedup ingest fold — the batchId-keyed
    * exactly-once commit the [[semDedupIngestReplay]] caveat named:
    * a manifested batchId is a NO-OP (checkpoint redelivery), a
    * whole-but-unmanifested version re-commits its manifest without
    * rewriting (crash between rename and manifest), anything partial
    * is rebuilt from the same prior snapshot. The fold
    * ([[graft.ext.Dedup.semDedupIncremental]] against the frozen
    * quantizer + committed deltas) and the wave's index delta
    * ([[graft.ext.SimSearch.assignToAnchors]] — the rows, never a
    * mode-append side effect) publish under ONE atomic manifest
    * rename, so there is no crash window in which one mutation
    * committed and the other did not.
    *
    * 100-TB shape: per wave, O(batch · nlist) assignment + pairs
    * against touched clusters only, one bounded parquet version
    * write; the store grows one delta per wave until
    * [[graft.ext.SimSearch.compactIvfIndex]]-style maintenance folds
    * it down.
    */
  private[graft] def applySemDedupIngestBatch(
      batch: DataFrame, storeRoot: String, batchId: Long,
      tau: Double): Unit = {
    import graft.ext.{Dedup, SimSearch}
    val spark = batch.sparkSession
    if (manifestFile(storeRoot, batchId).exists()) return
    val dest = new java.io.File(f"$storeRoot/v$batchId%09d")
    val destWhole = new java.io.File(dest, "assign/_SUCCESS").exists() &&
      new java.io.File(dest, "delta/_SUCCESS").exists()
    if (dest.exists() && !destWhole) deleteRecursively(dest.toPath)
    if (!destWhole) {
      val (idx, prev) = semDedupStoreState(spark, storeRoot)
      // ONE coarse-assignment pass (round-20, the q189 one-pass rule):
      // the fold and the wave's persisted list delta need the identical
      // argmax rows — assign once, checkpoint, feed both (the fold
      // previously re-ran the crossJoin-argmax internally)
      val delta = SimSearch.assignToAnchors(
        batch, idx.anchors, "vec_id", "embedding").localCheckpoint()
      val next = Dedup.semDedupIncrementalAssigned(
        idx, prev, delta, "vec_id", tau)
      val staging = new java.io.File(
        s"$storeRoot/.staging-v$batchId-" +
          java.util.UUID.randomUUID().toString.take(8))
      next.write.mode("errorifexists")
        .parquet(new java.io.File(staging, "assign").getPath)
      delta.write.mode("errorifexists")
        .parquet(new java.io.File(staging, "delta").getPath)
      if (!staging.renameTo(dest)) {
        deleteRecursively(staging.toPath)
        sys.error(s"could not commit semantic-dedup ingest version $dest")
      }
    }
    commitManifest(storeRoot, batchId, dest.getPath)
  }

  /** Compact the versioned semantic-dedup ingest store: fold every
    * COMMITTED wave delta into the base index tree, promote the
    * latest assignment to `init-assign`, and drop the version dirs +
    * manifests — the store returns to its freshly-initialized shape
    * with identical effective state ([[semDedupStoreState]] before ==
    * after; the spec pins it), so the per-fold delta-union cost stops
    * growing with wave count. Same staged two-rename swap as the
    * index compactions: the replacement store is fully written to a
    * sibling staging root, then OLD→retired / STAGING→live — a crash
    * leaves the old store or the new one, never a half-move.
    * RETENTION RULE (the Delta/Iceberg VACUUM discipline, scaled
    * down): compaction drops the batchId manifests, so it must run
    * only after the source checkpoint has passed the compacted
    * offsets — a wave redelivered AFTER its manifest is gone would
    * re-fold (assignment-idempotent, but it would duplicate the
    * wave's list rows, the q319 negative-probe corruption).
    */
  private[graft] def compactSemDedupStore(
      spark: SparkSession, storeRoot: String): Unit = {
    import graft.ext.SimSearch
    val (idx, assign) = semDedupStoreState(spark, storeRoot)
    val lists = idx.lists.localCheckpoint()
    val frozen = assign.localCheckpoint()
    val staging = new java.io.File(
      s"$storeRoot.compact-${java.util.UUID.randomUUID().toString.take(8)}")
    SimSearch.writeIvfIndex(
      idx.copy(lists = lists), s"$staging/index")
    frozen.write.mode("errorifexists").parquet(s"$staging/init-assign")
    val root = new java.io.File(storeRoot)
    val old = new java.io.File(
      s"$storeRoot.old-${java.util.UUID.randomUUID().toString.take(8)}")
    if (!root.renameTo(old))
      sys.error(s"store compact: could not retire $storeRoot")
    if (!staging.renameTo(root)) {
      old.renameTo(root) // roll back to the intact old store
      sys.error(s"store compact: could not install $staging")
    }
    deleteRecursively(old.toPath)
  }

  /** [[semDedupIngestReplay]] with the EXACTLY-ONCE fold (q319): the
    * same two-wave ingest, but every wave commits through
    * [[applySemDedupIngestBatch]], and after the stream drains the
    * harness RE-DELIVERS wave A VERBATIM — the crash-redelivery a
    * checkpoint produces. Under its original batchId the manifest
    * guard makes the redelivery a no-op and the accumulated
    * assignment still equals q310's one-shot oracle. The NEGATIVE
    * probe lives in StreamingSpec, which drives
    * [[applySemDedupIngestBatch]] directly: an UNGUARDED pipeline
    * cannot recognize the wave and folds it as fresh data — the
    * assignment survives (incrementalClusters dedups its node set,
    * by design) but the index store corrupts with duplicate list
    * rows, and the PROBE surface then returns the same neighbor at
    * two ranks. The guard is what keeps the store sound.
    *
    * `compactAfterWaveA = true` is the q324 variant: the store is
    * COMPACTED between the waves ([[compactSemDedupStore]] — wave A's
    * delta folds into the base index, the assignment is promoted,
    * versions dropped) and wave B then folds against the compacted
    * store; the redelivery step is skipped (compaction drops the
    * manifests — the retention rule), q319 certifies it separately.
    */
  def semDedupIngestIdempotentReplay(
      outer: SparkSession, corpus: DataFrame, isOld: Column,
      waveA: Column, nlist: Int, tau: Double,
      compactAfterWaveA: Boolean = false): DataFrame = {
    import graft.ext.{Dedup, SimSearch}
    val spark = replaySession(outer)
    // register the codegen'd cosine BEFORE the stream starts (the
    // ivfStreamProbeReplay registry-copy rule)
    graft.plans.CosineSimilarity.register(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft-semddi-corpus")
    corpus.write.mode("overwrite").parquet(tmp.toString)
    val c = spark.read.parquet(tmp.toString).localCheckpoint()
    val old = c.filter(isOld)
    val batch = c.filter(!isOld)
    val store = java.nio.file.Files.createTempDirectory("graft-semddi-store")
    SimSearch.writeIvfIndex(SimSearch.buildIvfIndex(
      old, "vec_id", "embedding", nlist, seed = 7L, lloydIters = 1),
      s"$store/index")
    Dedup.semDedupWithIndex(
        SimSearch.readIvfIndex(spark, s"$store/index"), old, "vec_id", tau)
      .write.mode("overwrite").parquet(s"$store/init-assign")
    val landing = java.nio.file.Files.createTempDirectory("graft-semddi-waves")
    def deliverWave(df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(landing.toString)
    deliverWave(batch.filter(waveA))
    val q = spark.readStream.schema(batch.schema).parquet(landing.toString)
      .writeStream.foreachBatch { (b: DataFrame, batchId: Long) =>
        // no batch checkpoint: the fold consumes the wave exactly once
        // (the assignToAnchors pass inside applySemDedupIngestBatch is
        // the materialization point — round-20)
        if (!b.isEmpty) applySemDedupIngestBatch(
          b, store.toString, batchId, tau)
      }.start()
    try {
      q.processAllAvailable()
      // q324: fold wave A's delta down into the base index while the
      // stream is idle between triggers (checkpoint has passed wave
      // A's offsets — the retention rule holds)
      if (compactAfterWaveA) compactSemDedupStore(spark, store.toString)
      deliverWave(batch.filter(!waveA))
      q.processAllAvailable()
      // ── the crash-redelivery: wave A again, byte-identical, under
      // its original batchId (0 — wave A was the only file at the
      // first trigger); the manifest guard must no-op it. Skipped on
      // the compaction variant: wave A's manifest was legitimately
      // dropped with its folded-down version. ──
      if (!compactAfterWaveA)
        applySemDedupIngestBatch(batch.filter(waveA), store.toString, 0L, tau)
      val (_, fin) = semDedupStoreState(spark, store.toString)
      fin.localCheckpoint()
    } finally {
      q.stop()
      deleteRecursively(landing)
      deleteRecursively(tmp)
      deleteRecursively(store)
    }
  }
}
