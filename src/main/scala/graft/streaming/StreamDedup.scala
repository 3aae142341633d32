package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.DotProduct
import graft.ops.Dedup

/** D8: STREAMING near-duplicate detection — C20's bucketed embedding LSH
  * over a document stream (SURVEY.md §2.C/D).
  *
  * Each arriving vector is normalized and hashed into [[Dedup.c20Tables]]
  * LSH bucket keys (the same hyperplane tables as the batch operator);
  * per (table, bucket) a stateful operator keeps the members seen inside
  * the watermark horizon and emits verified candidate pairs (cosine ≥
  * [[Dedup.cosMin]]) as they form — each pair exactly once PER
  * (pair, residency window): only the lowest-index table where both
  * members collide emits it, mirroring the batch operator's
  * `.distinct()` on candidates, but a vec_id that RE-ARRIVES after the
  * pair was emitted re-pairs against still-resident members and emits
  * the pair again — the intended recent-window semantics (the new
  * occurrence IS a fresh near-dup event against the window), not a
  * global exactly-once. State is watermark-bounded: members
  * older than the event-time horizon are evicted on timeout, so a bucket's
  * state is O(recent occupants), never O(history) — the streaming
  * semantic is "near-dups against the recent window"; full-history dedup
  * stays a batch job (C20).
  *
  * Stream ≡ batch: the normalization and bucket-key expressions are the
  * SAME Catalyst expressions as the batch path, and the in-state cosine
  * uses the same sequential kernel ([[DotProduct.dot]]) as the batch
  * verify join — with an un-expiring watermark the emitted pair set equals
  * batch C20 exactly (asserted in StreamDedupSpec).
  */
object StreamDedup {

  /** A banded stream row: one vector occurrence in one LSH table.
    * `keys` carries the vector's bucket key for EVERY table so the state
    * operator can tell whether a colliding pair also collides in a lower
    * table (and emit from the lowest-index one only).
    */
  case class BandIn(tb: Int, bkey: Int, vec_id: Long,
                    ts: java.sql.Timestamp, nv: Seq[Double], keys: Seq[Int])

  /** An emitted near-dup pair (v1 < v2). `ts` is the later of the two
    * member times — the pair's event time for downstream watermarking.
    */
  case class PairOut(v1: Long, v2: Long, cos_sim: Double, ts: java.sql.Timestamp)

  /** Bucket state: members within the watermark horizon
    * (id, normalized vector, event-time ms, all-table bucket keys).
    */
  case class BucketState(members: List[(Long, Seq[Double], Long, Seq[Int])])

  /** Normalize + band a raw vector stream (vec_id, ts, v: array<double>)
    * with the batch operator's exact expressions.
    */
  def banded(stream: DataFrame, nTables: Int, nPlanes: Int): DataFrame = {
    val tableKeys = (0 until nTables).map { t =>
      (0 until nPlanes).map { j =>
        val p = array(Dedup.c20Plane(t, j).map(lit).toIndexedSeq: _*)
        when(DotProduct(col("nv"), p) >= 0.0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    stream
      .withColumn("nrm", sqrt(DotProduct(col("v"), col("v"))))
      .select(col("vec_id"), col("ts"), expr("transform(v, x -> x / nrm)").as("nv"))
      .withColumn("keys", array(tableKeys: _*))
      .select(col("vec_id"), col("ts"), col("nv"), col("keys"),
        posexplode(col("keys")).as(Seq("tb", "bkey")))
  }

  /** True iff `tb` is the LOWEST table index where the two key vectors
    * collide — the one group allowed to emit the pair, so a pair landing
    * in k of the LSH tables is emitted exactly once (matching the batch
    * operator's `.distinct()` on candidates).
    */
  private def lowestSharedTable(tb: Int, a: Seq[Int], b: Seq[Int]): Boolean = {
    var t = 0
    while (t < tb) { if (a(t) == b(t)) return false; t += 1 }
    true
  }

  private def stateFlat(cosMin: Double, horizon: Long)(
      key: (Int, Int), rows: Iterator[BandIn],
      state: GroupState[BucketState]): Iterator[PairOut] = {
    val wmMs = state.getCurrentWatermarkMs()
    var members = state.getOption.map(_.members).getOrElse(Nil)
      .filter(_._3 >= wmMs - horizon)
    if (state.hasTimedOut) {
      if (members.isEmpty) state.remove()
      else {
        state.update(BucketState(members))
        state.setTimeoutTimestamp(members.map(_._3).max + horizon)
      }
      Iterator.empty
    } else {
      val out = scala.collection.mutable.ArrayBuffer.empty[PairOut]
      // process deterministically (vec_id order) so same-batch pairs are
      // independent of shuffle arrival order
      rows.toSeq.sortBy(_.vec_id).foreach { r =>
        val rv = r.nv.toArray
        val rMs = r.ts.getTime
        members.foreach { case (mid, mnv, mMs, mkeys) =>
          if (mid != r.vec_id && lowestSharedTable(key._1, r.keys, mkeys)) {
            // same sequential kernel as the batch verify join; x·y ≡ y·x
            // bit-for-bit (per-element products commute, same sum order)
            val cos = DotProduct.dot(rv, mnv.toArray)
            if (cos >= cosMin) {
              val (a, b) = if (r.vec_id < mid) (r.vec_id, mid) else (mid, r.vec_id)
              out += PairOut(a, b, cos, new java.sql.Timestamp(math.max(rMs, mMs)))
            }
          }
        }
        // re-arrival of a vec_id replaces its entry (latest ts wins) so a
        // member is never represented twice in one bucket
        members = (r.vec_id, r.nv, rMs, r.keys) ::
          members.filterNot(_._1 == r.vec_id)
      }
      state.update(BucketState(members))
      state.setTimeoutTimestamp(members.map(_._3).max + horizon)
      out.iterator
    }
  }

  /** The streaming near-dup operator. `watermarkDelay` bounds both late
    * data and the dedup window (members older than the watermark minus
    * `horizonMs` are evicted).
    */
  def nearDupStream(s: SparkSession, stream: DataFrame,
                    nTables: Int = Dedup.c20Tables,
                    nPlanes: Int = Dedup.c20Planes,
                    cosMin: Double = Dedup.cosMin,
                    watermarkDelay: String = "1 hour",
                    horizonMs: Long = 3600L * 1000): Dataset[PairOut] = {
    import s.implicits._
    banded(stream, nTables, nPlanes)
      .withWatermark("ts", watermarkDelay)
      .as[BandIn]
      .groupByKey(b => (b.tb, b.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFlat(cosMin, horizonMs))
  }

  // --------------- D9: transformWithState (RocksDB ListState) variant
  /** One resident bucket member, as a row of the typed ListState. */
  case class Member(vec_id: Long, nv: Seq[Double], tsMs: Long, keys: Seq[Int])

  /** D9: the same near-dup operator on Spark 4's transformWithState API.
    * The scale win over [[nearDupStream]]'s flatMapGroupsWithState is the
    * STATE LAYOUT: fmGWS serializes the whole bucket as one blob, so
    * admitting a member rewrites O(bucket) state per batch; here members
    * live in a typed `ListState`, and the common path (no eviction, no
    * re-arrival) is `appendValue` — an O(1) RocksDB append per new
    * member. The list is rewritten only when a member is evicted or
    * replaced. Eviction runs on event-time TIMERS (registered at
    * newest-member + horizon) instead of fmGWS timeouts. Emission
    * semantics are IDENTICAL to D8 — same lowest-shared-table rule, same
    * sequential kernel — asserted stream ≡ stream ≡ batch in
    * StreamDedupSpec.
    */
  class NearDupProcessor(cosMin: Double, horizon: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Int), BandIn, PairOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TTLConfig, TimeMode, TimerValues}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var members: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Member]("members", E.product[Member], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Int), rows: Iterator[BandIn],
                                 tv: TimerValues): Iterator[PairOut] = {
      val wmMs = tv.getCurrentWatermarkInMs()
      val resident = members.get().toList
      var cur = resident.filter(_.tsMs >= wmMs - horizon)
      var rewrite = cur.size != resident.size
      val fresh = scala.collection.mutable.ArrayBuffer.empty[Member]
      val out = scala.collection.mutable.ArrayBuffer.empty[PairOut]
      rows.toSeq.sortBy(_.vec_id).foreach { r =>
        val rv = r.nv.toArray
        val rMs = r.ts.getTime
        cur.foreach { m =>
          if (m.vec_id != r.vec_id && lowestSharedTable(key._1, r.keys, m.keys)) {
            val cos = DotProduct.dot(rv, m.nv.toArray)
            if (cos >= cosMin) {
              val (a, b) =
                if (r.vec_id < m.vec_id) (r.vec_id, m.vec_id) else (m.vec_id, r.vec_id)
              out += PairOut(a, b, cos, new java.sql.Timestamp(math.max(rMs, m.tsMs)))
            }
          }
        }
        val me = Member(r.vec_id, r.nv, rMs, r.keys)
        if (cur.exists(_.vec_id == r.vec_id)) {
          rewrite = true
          cur = me :: cur.filterNot(_.vec_id == r.vec_id)
        } else {
          cur = me :: cur
          fresh += me
        }
      }
      if (rewrite) members.put(cur.reverse.toArray)
      else fresh.foreach(members.appendValue)
      if (cur.nonEmpty) getHandle.registerTimer(cur.map(_.tsMs).max + horizon)
      out.iterator
    }

    override def handleExpiredTimer(key: (Int, Int), tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[PairOut] = {
      val wmMs = tv.getCurrentWatermarkInMs()
      val live = members.get().filter(_.tsMs >= wmMs - horizon).toArray
      if (live.isEmpty) members.clear() else members.put(live)
      Iterator.empty
    }
  }

  /** D9 entry point — requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), which is what
    * makes the ListState append path an actual RocksDB merge.
    */
  def nearDupStreamTws(s: SparkSession, stream: DataFrame,
                       nTables: Int = Dedup.c20Tables,
                       nPlanes: Int = Dedup.c20Planes,
                       cosMin: Double = Dedup.cosMin,
                       watermarkDelay: String = "1 hour",
                       horizonMs: Long = 3600L * 1000): Dataset[PairOut] = {
    import s.implicits._
    banded(stream, nTables, nPlanes)
      .withWatermark("ts", watermarkDelay)
      .as[BandIn]
      .groupByKey(b => (b.tb, b.bkey))
      .transformWithState(new NearDupProcessor(cosMin, horizonMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  // ------------- D18 bucket-membership state TABLE + compaction
  /** D18: the near-dup bucket state as a TABLE — B26's merge-at-rest
    * applied to the streaming near-dup surface. D8/D9 keep the RECENT
    * window in the state store; the index a pipeline keeps across runs
    * is this table: every increment appends its banded members under
    * their `tb` partition (a directory add — raw history never re-read;
    * C47's ingestion shape with LSH bucket keys instead of exact
    * fingerprints). Appends leave one file per increment per table, so
    * read fan-in grows with ingest frequency; because the semantic
    * content is LATEST-ROW-PER-MEMBER (B25's changelog monoid — max_by
    * on ts, associative, so re-arrivals collapse deterministically),
    * compaction is a semantic merge: re-aggregate each bucket to its
    * latest member rows and rewrite each `tb` partition as ONE file via
    * dynamic partition overwrite. Merge-on-read results are unchanged
    * while per-table read fan-in drops to one file
    * (StreamDedupSpec: pairs before ≡ after ≡ batch C20, file counts,
    * and the compaction fixpoint).
    */
  def appendBatchMembers(batch: DataFrame, path: String,
                         nTables: Int = Dedup.c20Tables,
                         nPlanes: Int = Dedup.c20Planes): Unit =
    banded(batch, nTables, nPlanes)
      .select(col("tb"), col("bkey"), col("vec_id"), col("ts"),
        col("nv"), col("keys"))
      .write.mode("append").partitionBy("tb").parquet(path)

  /** The merge: latest row per (tb, bucket, member) — applied at rest by
    * [[compactMembers]] and at read by [[pairsFromMembers]]; associativity
    * of latest-per-key is what makes merging at rest then at read ≡
    * merging everything at read.
    */
  private def latestMembers(df: DataFrame): DataFrame =
    df.groupBy(col("tb"), col("bkey"), col("vec_id"))
      .agg(max_by(struct(col("ts"), col("nv"), col("keys")), col("ts")).as("m"))
      .select(col("tb"), col("bkey"), col("vec_id"),
        col("m.ts").as("ts"), col("m.nv").as("nv"), col("m.keys").as("keys"))

  def compactMembers(s: SparkSession, path: String): Unit = {
    // localCheckpoint materializes the merge BEFORE the overwrite job —
    // what makes read-then-overwrite-the-same-path safe (B26's pattern)
    val compacted = latestMembers(s.read.parquet(path))
      .repartition(col("tb"))
      .localCheckpoint(true)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "dynamic")
    try compacted.write.mode("overwrite").partitionBy("tb").parquet(path)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Merge-on-read: verified near-dup pairs from the state table — the
    * same candidate-distinct + cosine-verify shape as batch C20 (bucket
    * self-join candidates ∝ Σ bucket², distinct before the verify join
    * so a pair colliding in k tables pays ONE dot product).
    */
  def pairsFromMembers(s: SparkSession, path: String,
                       cosMin: Double = Dedup.cosMin): DataFrame = {
    val m = latestMembers(s.read.parquet(path))
    val vecs = m.select(col("vec_id"), col("nv")).dropDuplicates("vec_id")
    val ids = m.select(col("tb"), col("bkey"), col("vec_id"))
    val cands = ids.join(ids.withColumnRenamed("vec_id", "v2"), Seq("tb", "bkey"))
      .where(col("vec_id") < col("v2"))
      .select(col("vec_id").as("v1"), col("v2")).distinct()
    cands
      .join(vecs.select(col("vec_id").as("v1"), col("nv").as("nv1")), "v1")
      .join(vecs.select(col("vec_id").as("v2"), col("nv").as("nv2")), "v2")
      .select(col("v1"), col("v2"),
        DotProduct(col("nv1"), col("nv2")).as("cos_sim"))
      .where(col("cos_sim") >= cosMin)
      .orderBy(col("v1"), col("v2"))
  }

  // --------------------- D15 streaming sequence packing (C23 live)
  /** D15: C23's token-budget packing over a DOCUMENT STREAM — the
    * data-prep feeder shape: documents land, each is assigned its
    * context-window bin the moment it arrives. State per source is ONE
    * long (the running token total); bin = floor(tokens-before / budget),
    * exactly C23's prefix-sum form, so for documents arriving in the
    * batch job's (source, doc_id) order the stream assigns IDENTICAL
    * bins (StreamDedupSpec proves stream ≡ batch across micro-batch
    * splits). Within a micro-batch rows are doc_id-sorted before
    * folding — cross-batch order is the stream's contract, in-batch
    * order is not, so determinism is pinned where Spark doesn't pin it.
    */
  case class PackIn(doc_id: Long, source: String, n_tokens: Long)
  case class PackOut(doc_id: Long, source: String, n_tokens: Long, bin: Long)

  class PackingProcessor(budget: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, PackIn, PackOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", E.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[PackIn],
                                 tv: TimerValues): Iterator[PackOut] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).map { r =>
        val bin = c / budget
        c += r.n_tokens
        PackOut(r.doc_id, r.source, r.n_tokens, bin)
      }
      cum.update(c)
      out.iterator
    }
  }

  /** Streaming entry: stream carries (doc_id, source, n_tokens). */
  def packingStream(s: SparkSession, stream: DataFrame,
                    budget: Long): Dataset[PackOut] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    stream.select(col("doc_id"), col("source"), col("n_tokens")).as[PackIn]
      .groupByKey(_.source)
      .transformWithState(new PackingProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }

  // ------------- D20 streaming perceptual image dedup (C54 live)
  /** D20: C54's perceptual hash over an IMAGE STREAM — the multimodal
    * ingest-dedup shape: each arriving payload is REALLY decoded
    * (ImageIO in a stateless partition-local map, same kernel as the
    * batch pipeline), profile-hashed with the SAME Column as the batch
    * gate, and deduplicated with watermarked `dropDuplicates` on the
    * hash (D3's engine-owned state shape): the first arrival of each
    * perceptual class inside the horizon passes, re-encoded/resized
    * copies are dropped, and state is ONE tiny row per distinct hash —
    * never a decoded raster. Stream ≡ batch by construction (shared
    * decode + shared hash expression; StreamDedupSpec proves the
    * emitted classes match batch C54 and that a wider re-render of an
    * already-seen picture is dropped across micro-batches).
    */
  case class MediaIn(doc_id: Long, payload: Array[Byte],
                     ts: java.sql.Timestamp)

  def perceptualDedupStream(s: SparkSession, stream: DataFrame,
                            watermarkDelay: String = "1 hour"): DataFrame = {
    import s.implicits._
    val decoded = stream.as[MediaIn].mapPartitions { rows =>
      rows.map { m =>
        val f = graft.ops.Multimodal.decode(
          graft.ops.Multimodal.Media(m.doc_id, m.payload, 0, 0))
        (m.doc_id, m.ts, f.dec_height, f.row_blocks)
      }
    }.toDF("doc_id", "ts", "dec_height", "row_blocks")
    decoded
      .select(col("doc_id"), col("ts"),
        graft.ops.Multimodal.c54Phash.as("phash"))
      .withWatermark("ts", watermarkDelay)
      // WithinWatermark: the engine DROPS a hash's state once the
      // watermark passes its horizon — bounded state, D8's recent-window
      // semantics (a copy landing after the horizon is a fresh class)
      .dropDuplicatesWithinWatermark("phash")
  }

  // ------------- D21 streaming histogram-quantile state (B30 live)
  /** D21: B30's mergeable quantile summary maintained LIVE — the third
    * non-monoid metric served from streaming state (after D16's HLL
    * distinct and D17's Misra-Gries heavy hitters): per slice, a
    * MapState of fixed-width histogram bin counters (bin =
    * floorDiv(amount, width)). Counter addition is the monoid, so the
    * per-slice states merge downstream by plain summation exactly like
    * B30's slice partials — the spec merges the final slice states and
    * pins equality with a batch histogram of the same rows plus the
    * ≤-one-bin-width error bound against exact percentiles. Each batch
    * re-emits the slice's full histogram with a version (rows seen) so a
    * consumer reads the latest snapshot (Update-mode semantics, D17's
    * contract). State is O(value range / bin width) per slice — never
    * O(rows) — which is what lets a 100 TB stream serve live p95/p99
    * from kilobytes of state.
    */
  case class HistIn(slice: String, amount: Long)
  case class HistOut(slice: String, bin: Long, n: Long, version: Long)

  class HistQuantileProcessor(width: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, HistIn, HistOut] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var bins: MapState[Long, Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      bins = getHandle.getMapState[Long, Long]("bins",
        E.scalaLong, E.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", E.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[HistIn],
                                 tv: TimerValues): Iterator[HistOut] = {
      // touched bins this batch — read-modify-write only those
      val delta = scala.collection.mutable.Map[Long, Long]()
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { r =>
        n += 1
        val b = java.lang.Math.floorDiv(r.amount, width)
        delta(b) = delta.getOrElse(b, 0L) + 1L
      }
      delta.foreach { case (b, d) =>
        val cur = if (bins.containsKey(b)) bins.getValue(b) else 0L
        bins.updateValue(b, cur + d)
      }
      seen.update(n)
      val v = n
      bins.iterator().map { case (b, c) => HistOut(key, b, c, v) }
    }
  }

  /** Streaming entry: stream carries (slice, amount). */
  def histQuantileStream(s: SparkSession, stream: DataFrame,
                         width: Long): Dataset[HistOut] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    stream.select(col("slice"), col("amount")).as[HistIn]
      .groupByKey(_.slice)
      .transformWithState(new HistQuantileProcessor(width),
        TimeMode.None(), OutputMode.Update())
  }

  // ------------------------ D22 streaming funnel state (B33 live)
  /** D22: B33's strict sequential funnel as a LIVE per-user state
    * machine — the real-time product-analytics shape (which step is
    * each user on, right now): one ValueState per user holding (stage,
    * last advance time); an arriving event advances the machine iff it
    * is the next stage's type and strictly after the previous advance.
    * Each advance emits (user, stage, ts) in Append mode — the
    * dashboard consumes stage transitions, not snapshots.
    *
    * Stream ≡ batch: B33's cascade (t1 = first signup; t_{k+1} = first
    * next-type event strictly after t_k) is exactly what the greedy
    * machine computes over time-ordered input — in-batch rows are
    * ts-sorted before folding (D15's contract: cross-batch order is the
    * stream's, in-batch order is not), so the spec pins final stage
    * counts ≡ the batch funnel row on the same events under RocksDB.
    * State is one tiny row per user — never event history.
    */
  case class FunnelIn(user_id: Long, event_type: String,
                      ts: java.sql.Timestamp)
  case class FunnelOut(user_id: Long, stage: Int, ts: java.sql.Timestamp)
  case class FunnelState(stage: Int, lastMicros: Long)

  private val funnelStages = Array("signup", "view", "click", "purchase")

  class FunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, FunnelIn, FunnelOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        E.product[FunnelState], TTLConfig.NONE)

    // full-microsecond instant — getTime alone is millis and would make
    // the strictly-after comparison coarser than the batch operator's
    private def microsOf(t: java.sql.Timestamp): Long =
      java.lang.Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    override def handleInputRows(key: Long, rows: Iterator[FunnelIn],
                                 tv: TimerValues): Iterator[FunnelOut] = {
      var cur = if (st.exists()) st.get() else FunnelState(0, Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer[FunnelOut]()
      rows.toSeq.sortBy(r => (microsOf(r.ts), r.event_type)).foreach { r =>
        val micros = microsOf(r.ts)
        if (cur.stage < funnelStages.length &&
            r.event_type == funnelStages(cur.stage) &&
            (cur.stage == 0 || micros > cur.lastMicros)) {
          cur = FunnelState(cur.stage + 1, micros)
          out += FunnelOut(key, cur.stage, r.ts)
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** Streaming entry: stream carries (user_id, event_type, ts). */
  def funnelStream(s: SparkSession, stream: DataFrame): Dataset[FunnelOut] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    stream.select(col("user_id"), col("event_type"), col("ts")).as[FunnelIn]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  // --------------------- D23 streaming cohort feeder (B34 live)
  /** D23: B34's cohort-retention matrix fed LIVE — per user, a state
    * machine that learns the user's COHORT (first day seen, stable once
    * set under the stream's time order) and emits one (cohort,
    * day_offset) increment the FIRST time the user is active on each
    * day; the matrix is then a plain count over the emitted increments
    * (each user-day appears exactly once, so COUNT ≡ B34's
    * COUNT(DISTINCT user)). State per user = the cohort day plus the
    * set of days already emitted — bounded by the user's active days
    * inside the retention horizon, never events (production would give
    * the day-set a TTL matching the horizon; the fixture's single month
    * doesn't need one). The spec pins stream matrix ≡ batch B34 on the
    * real events fixture under RocksDB across a micro-batch split.
    */
  case class CohortIn(user_id: Long, ts: java.sql.Timestamp)
  case class CohortOut(user_id: Long, cohort: String, day_offset: Long)
  case class CohortState(cohortEpochDay: Long, seenOffsets: List[Long])

  class CohortProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, CohortIn, CohortOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var st: ValueState[CohortState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CohortState]("cohort",
        E.product[CohortState], TTLConfig.NONE)

    private def epochDay(t: java.sql.Timestamp): Long =
      java.lang.Math.floorDiv(
        java.lang.Math.floorDiv(t.getTime, 1000L), 86400L)

    override def handleInputRows(key: Long, rows: Iterator[CohortIn],
                                 tv: TimerValues): Iterator[CohortOut] = {
      var cur = if (st.exists()) st.get() else CohortState(Long.MinValue, Nil)
      val out = scala.collection.mutable.ArrayBuffer[CohortOut]()
      rows.toSeq.sortBy(r => r.ts.getTime).foreach { r =>
        val d = epochDay(r.ts)
        if (cur.cohortEpochDay == Long.MinValue)
          cur = CohortState(d, Nil)
        val off = d - cur.cohortEpochDay
        if (!cur.seenOffsets.contains(off)) {
          cur = cur.copy(seenOffsets = off :: cur.seenOffsets)
          out += CohortOut(key,
            java.time.LocalDate.ofEpochDay(cur.cohortEpochDay).toString, off)
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** Streaming entry: stream carries (user_id, ts). */
  def cohortStream(s: SparkSession, stream: DataFrame): Dataset[CohortOut] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    stream.select(col("user_id"), col("ts")).as[CohortIn]
      .groupByKey(_.user_id)
      .transformWithState(new CohortProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  // ------------------- D24 streaming feed-gap alerting (A59 live)
  /** D24: A59's acquisition-gap monitoring LIVE — the feed-health alarm
    * (a satellite downlink going quiet should page someone before the
    * nightly report): per collection, ValueState holds only the last
    * item's arrival instant; an arriving item whose gap since that
    * instant exceeds the threshold emits an alert carrying the gap.
    * In-batch rows are ts-sorted before folding (the D15/D22 contract),
    * micros-exact like the batch operator, and the state survives
    * micro-batch boundaries — a gap spanning two batches still alerts
    * (spec-pinned). State = ONE long per collection; alerts ≡ the
    * batch A59 gap list filtered to the threshold by construction
    * (same consecutive-pair semantics over the stream's time order).
    */
  case class FeedIn(collection: String, ts: java.sql.Timestamp)
  case class GapAlert(collection: String, gap_us: Long,
                      at: java.sql.Timestamp)

  class FeedGapProcessor(thresholdUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, FeedIn, GapAlert] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var last: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long]("last", E.scalaLong, TTLConfig.NONE)

    private def microsOf(t: java.sql.Timestamp): Long =
      java.lang.Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    override def handleInputRows(key: String, rows: Iterator[FeedIn],
                                 tv: TimerValues): Iterator[GapAlert] = {
      var prev = if (last.exists()) Some(last.get()) else None
      val out = scala.collection.mutable.ArrayBuffer[GapAlert]()
      rows.toSeq.sortBy(r => microsOf(r.ts)).foreach { r =>
        val m = microsOf(r.ts)
        prev.foreach { p =>
          if (m - p > thresholdUs) out += GapAlert(key, m - p, r.ts)
        }
        prev = Some(m)
      }
      prev.foreach(last.update)
      out.iterator
    }
  }

  /** Streaming entry: stream carries (collection, ts). */
  def feedGapStream(s: SparkSession, stream: DataFrame,
                    thresholdUs: Long): Dataset[GapAlert] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    stream.select(col("collection"), col("ts")).as[FeedIn]
      .groupByKey(_.collection)
      .transformWithState(new FeedGapProcessor(thresholdUs),
        TimeMode.None(), OutputMode.Append())
  }

  // ------------------- D17 streaming heavy hitters (B28 live)
  /** D17: Misra-Gries heavy hitters maintained LIVE over a token stream —
    * B28's summary as streaming state: per shard key, a MapState of at
    * most k counters updated with the classic MG step (new token with a
    * full table decrements EVERYTHING; zeros evict). The shard summaries
    * merge downstream exactly like B28's slice summaries (same theorem —
    * the spec feeds a skewed stream across micro-batches, merges the
    * final shard states with `IncrementalState.mgMerged`, and pins the
    * n/(k+1) under-count bound, heavy-hitter presence, and the ≤ k state
    * size). Each batch re-emits the shard's summary with a version so a
    * consumer reads the latest snapshot (Update-mode semantics).
    */
  case class MgIn(shard: String, word: String)
  case class MgOut(shard: String, word: String, est: Long, version: Long)

  class HeavyHitterProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, MgIn, MgOut] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var counters: MapState[String, Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long]("mg",
        E.STRING, E.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", E.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[MgIn],
                                 tv: TimerValues): Iterator[MgOut] = {
      val m = scala.collection.mutable.Map[String, Long]()
      counters.iterator().foreach { e => m(e._1) = e._2 }
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { r =>
        n += 1
        m.get(r.word) match {
          case Some(c) => m(r.word) = c + 1
          case None if m.size < k => m(r.word) = 1L
          case None =>
            // classic MG decrement: everyone pays one, zeros evict
            m.keys.toSeq.foreach { w =>
              val c = m(w) - 1
              if (c == 0L) m.remove(w) else m(w) = c
            }
        }
      }
      counters.clear()
      m.foreach { case (w, c) => counters.updateValue(w, c) }
      seen.update(n)
      m.iterator.map { case (w, c) => MgOut(key, w, c, n) }
    }
  }

  /** Streaming entry: stream carries (shard, word). */
  def heavyHitterStream(s: SparkSession, stream: DataFrame,
                        k: Int): Dataset[MgOut] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    stream.select(col("shard"), col("word")).as[MgIn]
      .groupByKey(_.shard)
      .transformWithState(new HeavyHitterProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  // ------------- D31: streaming ANN index maintenance + serving (C7 live)
  /** One routed row of the mixed index/query stream: `kind` is "i"
    * (index a vector into its bucket) or "q" (serve a top-k lookup from
    * the bucket's current members).
    */
  case class AnnIn(kind: String, vec_id: Long, nv: Seq[Double], bucket: Int)

  /** One served neighbor — the same row shape as batch C7. */
  case class AnnOut(q_id: Long, n_id: Long, rk: Int, cos_sim: Double)

  /** Bucket index state: resident members (id, normalized vector).
    * Unlike D8's recent-window state, this state IS the index — it is
    * corpus-bounded, not time-bounded (the at-rest layout for a corpus
    * that outgrows executor state is D18's bucket-state table).
    */
  case class AnnIndexState(members: List[(Long, Seq[Double])])

  /** Normalize + single-table C7 bucketing of a raw mixed stream
    * (kind, vec_id, v) — the bucket sign tests run on the RAW vector with
    * the batch operator's exact expressions, so stream and batch agree
    * bit-for-bit on bucket membership.
    */
  def annRouted(stream: DataFrame): DataFrame = {
    import graft.ops.Similarity
    val bucket = (0 until Similarity.c7NPlanes).map { j =>
      val p = array(Similarity.c7Plane(j).map(lit).toIndexedSeq: _*)
      when(DotProduct(col("v"), p) >= 0.0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    stream
      .withColumn("nrm", sqrt(DotProduct(col("v"), col("v"))))
      .select(col("kind"), col("vec_id"),
        expr("transform(v, x -> x / nrm)").as("nv"), bucket.as("bucket"))
  }

  private def annFlat(k: Int)(bucket: Int, rows: Iterator[AnnIn],
      state: GroupState[AnnIndexState]): Iterator[AnnOut] = {
    var members = state.getOption.map(_.members).getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[AnnOut]
    val rs = rows.toSeq
    // within a micro-batch: index arrivals apply before lookups, each in
    // vec_id order — deterministic regardless of shuffle arrival order
    rs.filter(_.kind == "i").sortBy(_.vec_id).foreach { r =>
      // re-arrival replaces (latest vector wins), never duplicates
      members = (r.vec_id, r.nv) :: members.filterNot(_._1 == r.vec_id)
    }
    rs.filter(_.kind == "q").sortBy(_.vec_id).foreach { q =>
      val qv = q.nv.toArray
      members
        .map { case (id, mnv) => (id, DotProduct.dot(qv, mnv.toArray)) }
        .sortBy { case (id, c) => (-c, id) } // ties break by id, like batch
        .take(k)
        .zipWithIndex
        .foreach { case ((id, c), i) => out += AnnOut(q.vec_id, id, i + 1, c) }
    }
    state.update(AnnIndexState(members))
    out.iterator
  }

  // ---------- D35: streaming EXACT-K sampling (C63 live)
  /** One arriving document: its stratum and the C63 md5-lane rank key. */
  case class ResIn(source: String, doc_id: Long, hv: Long)
  case class ResMember(hv: Long, doc_id: Long)
  case class ResState(n_seen: Long, members: Seq[ResMember])
  case class ResOut(source: String, n_seen: Long, rk: Long, doc_id: Long)

  /** D35: the live eval-set sample — C63's exact-k-per-stratum sample
    * maintained over an unbounded document stream with CONSTANT state:
    * per source, the k members with the smallest (hv, doc_id) seen so
    * far (a bounded deterministic reservoir — "keep the k smallest
    * hashes" is order-independent, so the converged sample equals batch
    * C63 over the same rows NO MATTER how arrival interleaves, unlike
    * Vitter's algorithm R whose sample is a function of arrival order
    * and RNG state; determinism is the restart-stability contract every
    * other sampling decision in the suite already honors). State is
    * k members + one counter per stratum — O(k·|sources|), independent
    * of stream length. Each batch emits the stratum's CURRENT sample
    * stamped with n_seen (monotone), so serving reads the max-n_seen
    * emission per source; at rest this is B25's latest-wins.
    */
  private def reservoirFlat(k: Int)(source: String, rows: Iterator[ResIn],
      state: GroupState[ResState]): Iterator[ResOut] = {
    val st = state.getOption.getOrElse(ResState(0L, Nil))
    val incoming = rows.toVector
    val members = (st.members.toVector ++ incoming.map(r => ResMember(r.hv, r.doc_id)))
      .sortBy(m => (m.hv, m.doc_id)).take(k)
    val n = st.n_seen + incoming.length
    state.update(ResState(n, members))
    members.iterator.zipWithIndex.map { case (m, i) =>
      ResOut(source, n, i + 1L, m.doc_id)
    }
  }

  /** The C63 rank-key expression routed per stratum — same md5 lane as
    * the batch gate, so stream and batch cannot disagree.
    */
  def exactKSampleStream(s: SparkSession, stream: DataFrame,
      k: Int = graft.ops.TextAnalysis.c63K): Dataset[ResOut] = {
    import s.implicits._
    stream
      .select(col("source"), col("doc_id"),
        expr(graft.ops.TextExprs.h64Spark("concat('ek:', CAST(doc_id AS STRING))"))
          .as("hv"))
      .as[ResIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        reservoirFlat(k))
  }

  // ---------- D37: streaming cluster-balanced sampling (C100 live)
  /** D37: C100's topic-balanced selection maintained over a vector
    * stream — the offline-trained k-means artifact assigns each arriving
    * vector its cluster ([[graft.ops.Similarity.assignOn]], the SAME
    * expressions as batch, so live and batch cannot disagree about a
    * topic), and each cluster keeps the quota-many smallest (md5 lane,
    * vec_id) — C100's hash-ordered prefix IS D35's deterministic
    * reservoir, so the converged keep set equals batch C100 exactly no
    * matter how arrival interleaves, and state is quota members + one
    * counter per cluster (constant in stream length; clusters shard the
    * state store by key). Reuses [[reservoirFlat]] verbatim: one
    * reservoir kernel, two policies (stratum sampling, topic balance).
    */
  def clusterBalanceStream(s: SparkSession, stream: DataFrame,
      cents: Array[Array[Double]], k: Int = 20): Dataset[ResOut] = {
    import s.implicits._
    val nv = stream
      .select(col("vec_id"), expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .withColumn("nrm", sqrt(graft.functions.DotProduct(col("v"), col("v"))))
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("nv"))
    graft.ops.Similarity.assignOn(nv, cents)
      .select(col("cent").cast("string").as("source"),
        col("vec_id").as("doc_id"),
        expr(graft.ops.TextExprs.h64Spark("concat('cb:', CAST(vec_id AS STRING))"))
          .as("hv"))
      .as[ResIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        reservoirFlat(k))
  }

  // ---------- D38: streaming contamination closure (C101 live)
  /** One arriving corpus document routed to its dup cluster: fingerprint
    * plus the direct-hit verdict (computed upstream against the broadcast
    * eval set — the same C19 mechanism as batch).
    */
  case class ContamIn(cluster: Long, doc_id: Long, source: String,
                      direct: Boolean)
  case class ContamMember(doc_id: Long, source: String, direct: Boolean)
  case class ContamState(dirty: Boolean, pending: Seq[ContamMember])
  case class ContamOut(cluster: Long, doc_id: Long, source: String,
                       kind: String)

  /** D38: C101's transitive decontamination LIVE — with the part batch
    * never has to think about: RETROACTIVE invalidation. A document can
    * arrive, look clean, and be accepted; when a direct eval-match lands
    * in the same near-dup cluster LATER, every previously-accepted
    * cluster-mate must be flagged after the fact. State per cluster is
    * the dirty bit plus ONLY the not-yet-flagged members (once a cluster
    * turns dirty its members are emitted and dropped — arrivals into a
    * dirty cluster flag immediately, so state for contaminated clusters
    * collapses to one bit; clean clusters hold their members pending,
    * bounded by cluster size). Converged output = batch C101's
    * direct+transitive sets exactly, regardless of arrival order —
    * spec-pinned with the direct hit arriving LAST.
    */
  private def contamFlat(cluster: Long, rows: Iterator[ContamIn],
      state: GroupState[ContamState]): Iterator[ContamOut] = {
    val st = state.getOption.getOrElse(ContamState(dirty = false, Nil))
    val incoming = rows.map(r => ContamMember(r.doc_id, r.source, r.direct)).toVector
    val nowDirty = st.dirty || incoming.exists(_.direct)
    if (nowDirty) {
      // flush everything pending plus this batch; keep nothing but the bit
      val flagged = (st.pending.toVector ++ incoming).map { m =>
        ContamOut(cluster, m.doc_id, m.source,
          if (m.direct) "direct" else "transitive")
      }
      state.update(ContamState(dirty = true, Nil))
      flagged.iterator
    } else {
      state.update(ContamState(dirty = false, st.pending ++ incoming))
      Iterator.empty
    }
  }

  def contaminationStream(s: SparkSession, stream: DataFrame): Dataset[ContamOut] = {
    import s.implicits._
    stream.as[ContamIn]
      .groupByKey(_.cluster)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        contamFlat)
  }

  // ---------- D34: streaming PATCH-LOG serving (A68 live)
  /** D34: the live merge-patch catalog — A68's per-field LWW merge
    * maintained by a changelog stream: each micro-batch appends its
    * per-scene PARTIAL (one max(version, value) cell per property +
    * a revision-count partial, built by the SAME [[graft.search
    * .StacSearch.a68PatchAggs]] expressions as batch serving, so live
    * and batch cannot disagree), and serving re-merges the partials.
    * Per-field LWW is a commutative monoid, so partials-of-partials
    * equal the one-shot merge no matter how batches split a scene —
    * the spec splits every full scene across batches, delete revisions
    * crossing batch boundaries included. State lives AT REST as
    * appended parquet (D11's shape) keyed by scene — no driver-side
    * map; folding the pile back to one row per scene is B26's
    * compaction, unchanged.
    */
  def appendPatchBatch(batch: DataFrame, root: String): Unit =
    batch.groupBy(col("collection"), col("grp"))
      .agg(graft.search.StacSearch.a68PatchAggs.head,
        graft.search.StacSearch.a68PatchAggs.tail: _*)
      .write.mode("append").parquet(root)

  /** Merge-on-read serving: re-merge the appended partials with the
    * same monoids (sum for the count, struct-max per property cell)
    * and read the cells off with the batch path's projection.
    */
  def servedPatchCatalog(s: SparkSession, root: String): DataFrame =
    graft.search.StacSearch.a68Serve(
      s.read.parquet(root)
        .groupBy(col("collection"), col("grp"))
        .agg(sum(col("n_revisions")).as("n_revisions"),
          max(col("mv")).as("mv"), max(col("mk")).as("mk"),
          max(col("ml")).as("ml")))

  // ---------- D33: streaming SEARCH-INDEX maintenance (C78 live)
  /** D33: the live inverted index — C78's postings maintained by a
    * document stream (D11's foreachBatch shape on search state): each
    * micro-batch of (doc_id, text) appends its postings partial — the
    * SAME term/position expressions as the batch index build, so the
    * streamed index and a batch rebuild cannot disagree — plus a 1-row
    * doc-count partial. Documents are append-only in this model (a
    * re-crawled doc gets a new doc_id; changelog semantics on search
    * state is D13/B25's territory), so partials are disjoint by doc_id
    * and the merge is a pure union.
    */
  def appendPostingsBatch(batch: DataFrame, root: String): Unit = {
    batch
      .select(col("doc_id"), posexplode(expr("split(text, ' ')")).as(Seq("p", "w")))
      .where(col("w") =!= "")
      .groupBy(col("w"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("p"))).as("positions"))
      .write.mode("append").parquet(s"$root/postings")
    batch.agg(count(lit(1)).as("n"))
      .write.mode("append").parquet(s"$root/meta_parts")
  }

  /** Serve the keyword query from the stream-built index: df and N are
    * derived MERGE-ON-READ from the appended partials (df = distinct
    * docs per query term — one aggregate over the term-pruned postings;
    * N = the summed doc-count partials), then the shared
    * [[graft.ops.TextAnalysis.keywordScore]] plan — bit-identical
    * doubles to the batch-built C78 path (spec-asserted).
    */
  def servedIndexSearch(s: SparkSession, root: String): org.apache.spark.sql.DataFrame = {
    import graft.ops.TextAnalysis
    val terms = TextAnalysis.searchTermList.zipWithIndex
    val postings = s.read.parquet(s"$root/postings")
    val dfCols = terms.map { case (t, i) =>
      countDistinct(when(col("w") === t, col("doc_id"))).as(s"df_$i")
    }
    val stats = s.read.parquet(s"$root/meta_parts")
      .agg(sum(col("n")).as("n"))
      .crossJoin(postings.where(col("w").isin(TextAnalysis.searchTermList: _*))
        .agg(dfCols.head, dfCols.tail: _*))
    TextAnalysis.keywordScore(postings, stats)
  }

  // ------- D32: streaming source-distribution DRIFT monitor (C74 live)
  /** One token occurrence routed to its source's profile. */
  case class VocabIn(source: String, bucket: Int)

  /** Per-batch drift report for one source: tokens seen this batch, the
    * cosine between the profile BEFORE and AFTER absorbing the batch
    * (1.0 = the batch told us nothing new about the distribution; a drop
    * = the source changed voice), and the updated count vector (C74's
    * hashed-unigram profile — the same buckets, so live state and the
    * batch similarity matrix can't disagree).
    */
  case class VocabDrift(source: String, batch_tokens: Long,
                        cos_vs_prev: Double, counts: Seq[Long])

  case class VocabState(counts: Seq[Long])

  private def vocabFlat(nBuckets: Int)(source: String, rows: Iterator[VocabIn],
      state: GroupState[VocabState]): Iterator[VocabDrift] = {
    val prev = state.getOption.map(_.counts.toArray)
      .getOrElse(new Array[Long](nBuckets))
    val next = prev.clone()
    var n = 0L
    rows.foreach { r => next(r.bucket) += 1; n += 1 }
    val dot = prev.zip(next).map { case (a, b) => a.toDouble * b }.sum
    val na = math.sqrt(prev.map(a => a.toDouble * a).sum)
    val nb = math.sqrt(next.map(b => b.toDouble * b).sum)
    val cos = if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
    state.update(VocabState(next.toSeq))
    Iterator.single(VocabDrift(source, n, cos, next.toSeq))
  }

  /** D32: the live distribution-drift monitor — C74's hashed-unigram
    * source profiles maintained as streaming state, one drift row per
    * (source, micro-batch). State is |sources| × nBuckets longs — tiny
    * and CONSTANT in corpus size (the hashed-feature trick is what makes
    * unbounded-corpus profile state safe); the accumulated counts equal
    * the batch C74 profile over the same rows (spec-asserted), so the
    * alarm and the nightly matrix read one truth.
    */
  def vocabDriftStream(s: SparkSession, stream: DataFrame): Dataset[VocabDrift] = {
    import s.implicits._
    stream
      .select(col("source"), explode(expr("split(text, ' ')")).as("w"))
      .where(col("w") =!= "")
      .select(col("source"), expr(graft.ops.TextAnalysis.c74BucketSpark)
        .cast("int").as("bucket"))
      .as[VocabIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        vocabFlat(graft.ops.TextAnalysis.c74Buckets))
  }

  /** D31: the live vector index. Index rows maintain per-bucket state;
    * query rows are served top-k from the bucket's members AT ARRIVAL
    * TIME — with the full corpus indexed first, served rows equal batch
    * C7 exactly (same bucket expressions, same query-first sequential
    * dot kernel, same (cos desc, id) tie-break; asserted in
    * StreamDedupSpec). Scale: state is partitioned by bucket key — the
    * natural shard key of a distributed vector index — and a lookup
    * touches exactly one bucket's members.
    */
  def annServeStream(s: SparkSession, stream: DataFrame,
                     k: Int = graft.ops.Similarity.c7KLsh): Dataset[AnnOut] = {
    import s.implicits._
    annRouted(stream).as[AnnIn]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        annFlat(k))
  }

  // --------------- D39 streaming perplexity bucketing (CCNet serving)

  /** Per-language tercile CUTS read off the batch C104 bucket frame —
    * the CCNet serving contract: thresholds are computed ONCE on the
    * training corpus, then applied to arriving documents (Wenzek et al.
    * 2020 compute them on a sample and score the crawl against them).
    * Ties share a batch rank (every doc at a boundary ppm sits in one
    * bucket), so `ppm >= min(bucket ppm)` reproduces the batch
    * assignment exactly. A language too small to have cut a head or
    * middle tercile (n < 3) yields NULL cuts — the CASE guards route
    * everything below the first present cut to tail, matching batch.
    */
  def lmThresholds(s: SparkSession, d: String): DataFrame =
    graft.ops.TextAnalysis.queries("c104_ngram_lm")(s, d)
      .groupBy(col("lang"))
      .agg(min(when(col("bucket") === "head", col("ppm"))).as("head_min"),
        min(when(col("bucket") === "middle", col("ppm"))).as("middle_min"))

  /** D39: score ONE micro-batch of documents against the corpus-trained
    * Stupid-Backoff LM and bucket them with the batch-computed tercile
    * cuts — D19's foreachBatch serving shape: the model (three memoized
    * count tables) and the cuts (|langs| rows, broadcast) are static;
    * each batch pays one explode + the same measured-size joins the
    * batch scorer plans, so stream and batch CANNOT drift (same
    * expressions, same tables, same cuts). Out-of-vocabulary positions
    * drop (Stupid Backoff reserves no OOV mass); a doc with zero
    * scoreable positions emits no row — both pinned in the spec.
    */
  def lmServeBatch(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    graft.ops.TextAnalysis.c104ScoreBatch(s, d, batch)
      .join(broadcast(lmThresholds(s, d)), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("ppm"),
        expr("CASE WHEN head_min IS NOT NULL AND ppm >= head_min THEN 'head'" +
          " WHEN middle_min IS NOT NULL AND ppm >= middle_min THEN 'middle'" +
          " ELSE 'tail' END").as("bucket"))
}
