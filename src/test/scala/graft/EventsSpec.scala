package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Events

// top-level so Spark can derive Encoders
case class EvIn(ts: java.sql.Timestamp, event_type: String, value: Double)
case class EvDup(event_id: Long, ts: java.sql.Timestamp, v: Double)
case class EvJ(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

class EventsSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("flatMapGroupsWithState sessionizer ≡ batch gaps-and-islands") {
    val e = Tables.events(s, sf)
    val batch = Events.sessionizeBatch(e)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4))).toSet
    val stateful = Events.sessionizeWithState(s, e)
      .collect().map(o => (o.user_id, o.session_start, o.session_end,
        o.n_events, o.dur_us)).toSet
    assert(stateful == batch)
    assert(batch.nonEmpty)
  }

  test("streaming windowed agg (watermark) ≡ batch on the same data") {
    import s.implicits._
    val batchExpected = Events.windowAggTransform(Tables.events(s, sf))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    val input = Tables.events(s, sf)
      .select(col("ts"), col("event_type"), col("value")).as[EvIn].collect()

    val mem = MemoryStream[EvIn](s)
    val q = Events.windowAggStream(mem.toDF())
      .writeStream.format("memory").queryName("d1_stream")
      .outputMode("complete").start()
    try {
      mem.addData(input.toIndexedSeq)
      q.processAllAvailable()
      val got = s.table("d1_stream")
        .select(col("window_start"), col("event_type"), col("n_events"), col("total_value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == batchExpected)
    } finally q.stop()
  }

  test("file-source stream (readStream.parquet) ≡ batch windowed agg") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    try {
      // stage the fixture as a streaming source directory
      val src = new java.io.File(s"$sf/events.parquet")
      val dst = new java.io.File(s"$tmp/events_0.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)

      val batchExpected = Events.windowAggTransform(Tables.events(s, sf))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet

      val q = Events.windowAggStream(Events.eventsStream(s, tmp))
        .writeStream.format("memory").queryName("d1_file_stream")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = s.table("d1_file_stream")
          .select(col("window_start"), col("event_type"), col("n_events"), col("total_value"))
          .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
            r.getDouble(3))).toSet
        assert(got == batchExpected)
      } finally q.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("stream-stream interval join ≡ batch on the same data") {
    import s.implicits._
    case class E3(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
    val input = Tables.events(s, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
      .collect().map(r => EvJ(r.getLong(0), r.getTimestamp(1), r.getLong(2)))

    val batchExpected = Events.queries("d4_interval_join")(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val m1 = MemoryStream[EvJ](s)
    val m2 = MemoryStream[EvJ](s)
    val q = Events.intervalJoinStream(m1.toDF(), m2.toDF())
      .writeStream.format("memory").queryName("d4_stream")
      .outputMode("append").start()
    try {
      m1.addData(input.toIndexedSeq)
      m2.addData(input.toIndexedSeq)
      q.processAllAvailable()
      val got = s.table("d4_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == batchExpected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment ≡ batch join") {
    import s.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 10.0),
      ("signup", 5.0), ("error", 0.0)).toDF("event_type", "weight")
    val batchExpected = Tables.events(s, sf)
      .join(broadcast(dim), "event_type")
      .groupBy(col("event_type"))
      .agg(sum((col("value").cast("decimal(18,2)") * col("weight").cast("decimal(18,2)")))
        .cast("double").as("weighted"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet

    val input = Tables.events(s, sf)
      .select(col("ts"), col("event_type"), col("value")).as[EvIn].collect()
    val mem = MemoryStream[EvIn](s)
    val q = mem.toDF()
      .join(broadcast(dim), "event_type") // stream-static: no state, no watermark
      .groupBy(col("event_type"))
      .agg(sum((col("value").cast("decimal(18,2)") * col("weight").cast("decimal(18,2)")))
        .cast("double").as("weighted"))
      .writeStream.format("memory").queryName("d5_stream")
      .outputMode("complete").start()
    try {
      mem.addData(input.toIndexedSeq)
      q.processAllAvailable()
      val got = s.table("d5_stream")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got == batchExpected)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    import s.implicits._
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val mem = MemoryStream[EvDup](s)
    val q = Events.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("d3_stream")
      .outputMode("append").start()
    try {
      mem.addData(EvDup(1, t(0), 1.0), EvDup(2, t(1), 2.0), EvDup(1, t(2), 99.0), EvDup(3, t(3), 3.0))
      q.processAllAvailable()
      val got = s.table("d3_stream").select("event_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
