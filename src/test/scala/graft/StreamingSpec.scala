package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed streaming counts match the batch computation") {
    val stream = EventStreams.readEventStream(spark, sf)
    val streamed = EventStreams.windowedCounts(stream)
    val got = EventStreams.runToMemory(spark, streamed, "win_counts")
      .orderBy($"hour_start", $"event_type")
      .collect()

    val batch = Tables.load(spark, sf, "events")
      .groupBy(window($"ts", "1 hour").getField("start").as("hour_start"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .orderBy($"hour_start", $"event_type")
      .collect()

    assert(got.length == batch.length)
    assert(got.sameElements(batch))
  }

  test("checkpoint restart: aggregation state survives stop/resume; only new files read") {
    // The fault-tolerance contract a production stream lives on: run the
    // windowed aggregate over a first file drop with a checkpoint, STOP,
    // land a second drop while the query is down, restart from the same
    // checkpoint. The recovered state must (a) produce exactly the batch
    // answer over BOTH drops and (b) read only the second drop's rows
    // (offset-log recovery — no reprocessing).
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("graft_ckpt_src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_ckpt_state").toFile.getAbsolutePath
    // read the real file by its OWN schema (encoding-agnostic), write the
    // drops verbatim, and let normalizeTs adapt the stream side too
    val raw = spark.read.parquet(sf + "/events.parquet")
    val drop1 = raw.filter($"event_id" % 2 === 0)
    val drop2 = raw.filter($"event_id" % 2 === 1)
    drop1.coalesce(1).write.mode("append").parquet(srcDir)
    def agg = EventStreams.windowedCounts(
      Tables.normalizeTs(
        spark.readStream.schema(raw.schema).parquet(srcDir)))
    val q1 = agg.writeStream.outputMode("complete").format("memory")
      .queryName("ck_run1").option("checkpointLocation", ckpt).start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.table("ck_run1").agg(sum($"n")).as[Long].head() == drop1.count())
    drop2.coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = agg.writeStream.outputMode("complete").format("memory")
      .queryName("ck_run2").option("checkpointLocation", ckpt).start()
    q2.processAllAvailable()
    val readOnRestart = q2.recentProgress.map(_.numInputRows).sum
    q2.stop()
    val got = spark.table("ck_run2")
      .orderBy($"hour_start", $"event_type").collect()
    val batch = Tables.load(spark, sf, "events")
      .groupBy(window($"ts", "1 hour").getField("start").as("hour_start"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .orderBy($"hour_start", $"event_type").collect()
    assert(got.sameElements(batch),
      "recovered state + second drop must equal the batch answer over both drops")
    assert(readOnRestart == drop2.count(),
      s"restart read $readOnRestart rows, expected only drop2 = ${drop2.count()}")
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    val stream = EventStreams.readEventStream(spark, sf)
    // duplicate the stream by unioning it with itself: every event twice
    val doubled = stream.union(stream)
    val deduped = EventStreams.dedupEvents(doubled)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_events").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_events").count()
    val expect = Tables.load(spark, sf, "events").count()
    assert(got == expect)
  }

  test("stream-stream interval join matches the batch computation") {
    val stream = EventStreams.readEventStream(spark, sf)
    val joined = EventStreams.clickAttribution(stream)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attrib").count()

    val ev = Tables.load(spark, sf, "events")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    val batch = p.join(c, $"p_user" === $"c_user" &&
      $"c_ts" >= $"p_ts" - expr("INTERVAL 3600 SECONDS") && $"c_ts" < $"p_ts").count()
    assert(got == batch && got > 0)
  }

  test("stream-stream LEFT OUTER join: null-extended clicks match the batch join in the watermark-complete region") {
    import org.apache.spark.sql.streaming.OutputMode
    val stream = EventStreams.readEventStream(spark, sf)
    val joined = EventStreams.clickFollowedByPurchase(stream, windowSec = 3600)
    val got = EventStreams.withShufflePartitions(spark, 4) {
      EventStreams.runToMemory(spark, joined, "outer_click_join", OutputMode.Append())
    }
    val ev = Tables.load(spark, sf, "events")
    // clicks whose whole match window is behind the final watermark
    // (max ts - 2h delay) are fully resolved; 4h leaves safe margin
    val cutoff = ev.agg(max($"ts").cast("long")).head().getLong(0) - 4 * 3600
    val inRegion = got.filter($"c_ts".cast("long") <= cutoff)
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    val batch = c.join(p,
        $"c_user" === $"p_user" && $"p_ts" > $"c_ts" &&
          $"p_ts" <= $"c_ts" + expr("INTERVAL 3600 SECONDS"), "left_outer")
      .filter($"c_ts".cast("long") <= cutoff)
    assert(inRegion.count() == batch.count())
    val gotNulls = inRegion.filter($"purchase_id".isNull).count()
    // unconverted clicks exist and only the outer join can report them
    assert(gotNulls > 0)
    assert(gotNulls == batch.filter($"purchase_id".isNull).count())
  }

  test("stateful sessionization emits closed sessions incrementally") {
    val stream = EventStreams.readEventStream(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val sessions = EventStreams.sessionize(stream)
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("sessions").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
    // with a finite source only watermark-closed sessions emit; the count
    // must be positive and no session may exceed its user's event count
    assert(got.count() > 0)
    val perUser = got.groupBy($"user_id").agg(sum($"n_events").as("n"))
    val batchCounts = Tables.load(spark, sf, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("nb"))
    val joined = perUser.join(batchCounts, "user_id")
      .filter($"n" > $"nb")
    assert(joined.count() == 0)
  }

  test("transformWithState accumulates across micro-batches (cumulative per-key rows)") {
    import org.apache.spark.sql.functions._
    // split events into two files and trigger one file per batch: each
    // batch must emit the RUNNING cumulative row per user, not per-batch
    // deltas — the stateful semantics the single-batch oracle can't pin
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_e08_two_batches")
    val batchEvents = Tables.load(spark, sf, "events")
    // eventSchema expects raw nano-longs (as the driver's parquet has):
    // write ts back as nanos so the stream-side decode path is identical
    val asNanos = batchEvents.withColumn("ts", expr("unix_micros(ts) * 1000"))
    asNanos.filter($"event_id" % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/f0")
    asNanos.filter($"event_id" % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/f1")
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
      .transform(Tables.normalizeTs) // one source of truth for ts decode
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val got = EventStreams.withShufflePartitions(spark, 4) {
      EventStreams.runningTotals(spark, stream, "e08_two_batches")
    }
    // final (max-n) row per user must equal the full batch aggregation
    val last = got.groupBy($"user_id").agg(max($"n").as("n"))
    val batch = batchEvents.groupBy($"user_id").agg(count(lit(1)).as("nb"))
    assert(last.join(batch, "user_id").filter($"n" =!= $"nb").count() == 0)
    // and at least one user must have emitted two increasing cumulative rows
    val twoRows = got.groupBy($"user_id").agg(count(lit(1)).as("emissions"),
      max($"n").as("mx"), min($"n").as("mn"))
    assert(twoRows.filter($"emissions" === 2 && $"mx" > $"mn").count() > 0)
  }

  test("ListState last-N buffer re-bounds across micro-batches") {
    import org.apache.spark.sql.functions._
    // two files, one per trigger: the second batch must merge with the
    // FIRST batch's buffered events and re-bound to 3, not start fresh
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_e10_two_batches")
    val batchEvents = Tables.load(spark, sf, "events")
    val asNanos = batchEvents.withColumn("ts", expr("unix_micros(ts) * 1000"))
    // split by TIME (ids are time-ordered in the generator): batch 2 is
    // strictly newer, so each affected user's final emission is the one
    // with the strictly largest last_ts — unambiguous below
    val mid = batchEvents.agg(max($"event_id")).head().getLong(0) / 2
    asNanos.filter($"event_id" <= mid).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/f0")
    asNanos.filter($"event_id" > mid).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/f1")
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
      .transform(Tables.normalizeTs) // one source of truth for ts decode
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val got = EventStreams.withShufflePartitions(spark, 4) {
      EventStreams.lastNValues(spark, stream, "e10_two_batches", n = 3)
    }
    // the final emission per user (max last_ts; count ties too) must match
    // the batch-global top-3 — only possible if batch-2 rows merged with
    // batch-1 state before re-bounding
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
      .orderBy($"last_ts".desc, $"n_last".desc)
    val finals = got.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"user_id", $"n_last", round($"lastn_sum", 2).as("s"))
    val batch = {
      val w2 = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      batchEvents.withColumn("rk", row_number().over(w2)).filter($"rk" <= 3)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_last"), round(sum($"value"), 2).as("s"))
    }
    assert(finals.join(batch, Seq("user_id"))
      .filter(finals("n_last") =!= batch("n_last") || finals("s") =!= batch("s"))
      .count() == 0)
    // and users hit in both batches emitted twice
    assert(got.groupBy($"user_id").count().filter($"count" === 2).count() > 0)
  }

  test("MapState per-type totals accumulate across micro-batches") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_e11_two_batches")
    val batchEvents = Tables.load(spark, sf, "events")
    val asNanos = batchEvents.withColumn("ts", expr("unix_micros(ts) * 1000"))
    asNanos.filter($"event_id" % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/f0")
    asNanos.filter($"event_id" % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/f1")
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
      .transform(Tables.normalizeTs) // one source of truth for ts decode
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val got = EventStreams.withShufflePartitions(spark, 4) {
      EventStreams.perTypeTotals(spark, stream, "e11_two_batches")
    }
    // cumulative counts only grow: the max-n emission per (user, type)
    // is final and must equal the batch group-by
    val finals = got.groupBy($"user_id", $"event_type").agg(max($"n").as("n"))
    val batch = batchEvents.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("nb"))
    assert(finals.join(batch, Seq("user_id", "event_type"))
      .filter($"n" =!= $"nb").count() == 0)
    assert(finals.count() == batch.count())
    // some (user, type) pair must have been updated in both batches
    assert(got.groupBy($"user_id", $"event_type").count()
      .filter($"count" === 2).count() > 0)
  }

  test("event-time timers: sessions extend across micro-batches (timer delete + re-register)") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_e12_two_batches")
    val batchEvents = Tables.load(spark, sf, "events")
    val asNanos = batchEvents.withColumn("ts", expr("unix_micros(ts) * 1000"))
    val mid = batchEvents.agg(max($"event_id")).head().getLong(0) / 2
    asNanos.filter($"event_id" <= mid).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/f0")
    asNanos.filter($"event_id" > mid).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/f1")
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
      .transform(Tables.normalizeTs) // one source of truth for ts decode
      .withWatermark("ts", "1 hour")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val got = EventStreams.withShufflePartitions(spark, 4) {
      EventStreams.timerSessions(spark, stream, "e12_two_batches", gapSec = 1800)
    }.select($"user_id", $"session_start_us", $"n_events", $"duration_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    // expected: the SAME emission rule computed in batch — sessions closed
    // by a later event, plus last sessions whose timer beat the final
    // watermark. If batch-1 timers had survived a batch-2 extension, the
    // extended sessions would have been split/duplicated and this differs.
    val us = expr("unix_micros(ts)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us", $"event_id")
    val sess = batchEvents.select($"user_id", us.as("us"), $"event_id")
      .withColumn("new_sess",
        when(lag($"us", 1).over(w).isNull ||
          $"us" - lag($"us", 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sess", sum($"new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess")
      .agg(min($"us").as("start_us"), max($"us").as("last_us"),
        count(lit(1)).as("n"))
    val maxUs = batchEvents.agg(max(us)).head().getLong(0)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"sess".desc)
    val expect = sess.withColumn("rk", row_number().over(w2))
      .filter($"rk" > 1 ||
        ($"last_us" / 1000L).cast("long") + 1800000L < maxUs / 1000L - 3600000L)
      .select($"user_id", $"start_us", $"n", ($"last_us" - $"start_us").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == expect)
  }

  test("foreachBatch overwrite sink is idempotent and matches the batch aggregation") {
    import org.apache.spark.sql.functions._
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_fb_test_out").getAbsolutePath
    def run() = EventStreams.runForeachBatchOverwrite(spark,
      EventStreams.readEventStream(spark, sf)
        .groupBy($"event_type").agg(count(lit(1)).as("n")),
      out).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val first = run()
    val second = run()   // replay: overwrite must leave identical content
    assert(first == second)
    val batch = Tables.load(spark, sf, "events")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == batch)
  }
}
