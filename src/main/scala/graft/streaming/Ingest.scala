package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Per-user session state (top-level so the state Encoder codegens). */
case class SessState(lastUs: Long, nEvents: Long, nSessions: Long)

/** Streaming ingest, re-expressing the reference's transactional ingest
  * API (hcatalog/streaming/.../HiveEndPoint.java:62 — endpoint ->
  * TransactionBatch -> write/commit into ACID deltas) on Structured
  * Streaming: the checkpointed file sink gives the same exactly-once
  * batch-commit contract (offsets+commits WAL instead of metastore txns),
  * and `Trigger.AvailableNow` is the "drain one transaction batch" mode.
  *
  * Beyond reference parity (Hive 2.3 has no stream queries, SURVEY.md
  * §2.12): watermarked windowed aggregation and stateful sessionization,
  * the streaming twins of q_events_window / q_events_sessionize.
  */
object Ingest {

  /** File-stream ingest with exactly-once commit semantics. */
  def fileIngest(spark: SparkSession, srcDir: String, schema: StructType,
                 format: String, destDir: String,
                 checkpointDir: String): StreamingQuery =
    spark.readStream.format(format).schema(schema).load(srcDir)
      .writeStream.format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Watermarked tumbling-window aggregation over event time. Late rows
    * beyond the watermark are dropped — state is bounded, which is what
    * lets this run unbounded at 100 TB/day. */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("total_value"))

  /** Streaming exact dedup with BOUNDED state — the streaming twin of
    * graft.operators.Dedup.exactGroups for ingest pipelines: rows whose
    * normalized-content hash was already seen inside the watermark
    * horizon are dropped; state older than the horizon is evicted, so
    * an unbounded stream holds only `horizon` worth of hashes (8-byte
    * keys) per partition. */
  def streamingDedup(docs: DataFrame, textCol: String = "text",
                     tsCol: String = "ts",
                     horizon: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash",
        org.apache.spark.sql.functions.md5(
          graft.operators.Dedup.normalize(col(textCol))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Watermarked stream-stream interval join: each purchase joins the
    * clicks of the same user within the preceding `window`. Both sides'
    * state is bounded by their watermarks + the interval bound — the
    * planner derives the eviction horizon from the join condition, so
    * unbounded streams run with bounded memory. */
  def streamStreamAttribution(clicks: DataFrame, purchases: DataFrame,
                              window: String = "1 hour",
                              watermark: String = "2 hours"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("purchase_ts"), col("click_ts"))
  }

  /** Streaming upsert sink: each micro-batch MERGEs into a parquet
    * table keyed by `key` — the streaming twin of the reference's
    * ACID ingest-then-compact flow (HiveEndPoint transaction batches +
    * the compactor), collapsed into foreachBatch + copy-on-write MERGE.
    * Exactly-once per key: replaying a batch after a crash re-applies
    * the same upserts idempotently (matched rows overwrite with the
    * same values, unmatched insert once). Batches are deduped on the
    * key to satisfy MERGE's cardinality contract: with `seqCol` the row
    * with the highest sequence/event-time wins (true last-value-wins);
    * without, the winner is the deterministic max tuple over the
    * orderable payload columns (unorderable types like map are skipped,
    * so they never break the sort). */
  def upsertSink(updates: DataFrame, destPath: String, key: String,
                 checkpointDir: String,
                 seqCol: Option[String] = None): StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val order: org.apache.spark.sql.Column = seqCol match {
          case Some(s) => col(s).desc
          case None =>
            val orderable = batch.schema.fields.filter(f =>
              f.name != key && org.apache.spark.sql.catalyst.expressions
                .RowOrdering.isOrderable(f.dataType))
            if (orderable.isEmpty) lit(1).asc
            else struct(orderable.map(f => col(f.name)).toIndexedSeq: _*).desc
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(key).orderBy(order)
        val deduped = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val dest = new org.apache.hadoop.fs.Path(destPath)
        val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // Overwrite (not ErrorIfExists): a crashed first-batch attempt
        // can leave a partial directory behind; re-creating from the
        // replayed batch is the idempotent recovery
        if (!fs.exists(dest) ||
            fs.listStatus(dest).forall(!_.getPath.getName.endsWith(".parquet")))
          deduped.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(destPath)
        else
          graft.operators.MergeInto.merge(spark, destPath, deduped, key)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Stateful per-user sessionization via mapGroupsWithState — the
    * KeyValueGroupedDataset custom-state tier (SURVEY.md §7 streaming).
    * State per user is 24 bytes; keys partition across executors. */
  def sessionize(events: Dataset[Ev],
                 gapSeconds: Long = 1800): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessState, UserSessions](
        GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val us = e.ts.getTime * 1000L
            val isNew = st.lastUs == Long.MinValue ||
              us - st.lastUs > gapSeconds * 1000000L
            st = SessState(us, st.nEvents + 1,
              st.nSessions + (if (isNew) 1 else 0))
          }
          state.update(st)
          UserSessions(user, st.nEvents, st.nSessions)
      }
  }
}
