package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.Sessions
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Rate-measurement harness for the streaming family — the claim
  * under test is that STATE IS BOUNDED BY THE WATERMARK, NOT BY
  * STREAM LENGTH: the state store should hold ~rate x horizon rows
  * no matter how many total events flow through, and per-batch
  * latency should stay flat across a 10x/100x longer stream.
  *
  * Deterministic synthetic stream: event i carries event time
  * base + i/simRate seconds (a simulated arrival rate in EVENT time,
  * which is what watermark eviction keys on) and key i % nKeys.
  * Events feed a MemoryStream in fixed-size chunks — one micro-batch
  * per chunk — through a noop sink; per-batch metrics come from the
  * StreamingQueryListener (numInputRows, triggerExecution ms, state
  * rows total across stateful operators).
  *
  * Ops: `admission` ([[EventStream.streamingAdmission]] — digest
  * anti-join + dropDuplicatesWithinWatermark), `strip`
  * ([[EventStream.streamingStripPassages]] — window-index probe +
  * windowed per-doc verdict fold + row-local rebuild), `embed_admission`
  * ([[EventStream.streamingEmbedAdmission]] — sign-code index probe
  * + cosine verify + windowed verdict), `interval_join`
  * ([[EventStream.streamingIntervalJoinOn]], inner, ±within),
  * `ivf_topk` / `ivfpq_topk` / `bm25_topk`
  * ([[EventStream.streamingIvfTopK]] /
  * [[EventStream.streamingIvfPqTopK]] /
  * [[EventStream.streamingBm25TopK]] — the streaming retrieval
  * faces, whose state is the in-horizon queries' candidate folds;
  * the IVF-PQ face adds the bounded refine fold on top),
  * `video_admission` ([[EventStream.streamingVideoAdmission]] —
  * frame-code index probe + per-video windowed rollup; state is the
  * in-horizon videos' distinct-frame sets),
  * and `windowed` ([[EventStream.windowedCounts]]) as the
  * aggregation baseline. Args:
  *   <op> <nEvents> [chunk=20000] [watermarkMin=5] [simRate=100]
  *   [embedBits=3] [statePartitions=1]
  * `embedBits` sizes the embed_admission code space (corpus bucket
  * width = 2000 / 2^bits - the throughput lever, since each arriving
  * doc verifies ~nTables x bucket-width cosines).
  * `statePartitions` sets spark.sql.shuffle.partitions, which fixes
  * the state-store partition count for the query's LIFETIME — the
  * multi-partition scaling axis (state rows shard by key hash; on a
  * cluster each partition is an independent store on its executor).
  * Prints ONE JSON line.
  */
object StreamBenchJob {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  final case class VDoc(doc_id: Long, ts: Timestamp, vec: Seq[Float])

  final case class FrameDoc(video_id: Long, frame_no: Int,
      ts: Timestamp, code: Long)

  private val Base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def eventTs(i: Long, simRate: Int): Timestamp =
    new Timestamp(Base + i * 1000L / simRate)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StreamBenchJob <admission|strip|embed_admission|interval_join|ivf_topk|ivfpq_topk|bm25_topk|video_admission|windowed> <nEvents> " +
        "[chunk] [watermarkMin] [simRate] [embedBits] [statePartitions]")
    val op = args(0)
    val nEvents = args(1).toLong
    val chunk = if (args.length >= 3) args(2).toInt else 20000
    val wmMin = if (args.length >= 4) args(3).toInt else 5
    val simRate = if (args.length >= 5) args(4).toInt else 100
    val embedBits = if (args.length >= 6) args(5).toInt else 3
    val statePartitions = if (args.length >= 7) args(6).toInt else 1
    val watermark = s"$wmMin minutes"
    val nKeys = 10000

    val spark = Sessions.local("graft-streambench")
    // default 1 state partition: hermetic and fork-free in this
    // container (see EventStreamSpec's note); state-row TOTALS are
    // partition-count-invariant, so the bounded-state claim is the
    // same at any width — raise statePartitions to measure scaling
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // per-batch metrics, captured for EVERY batch (recentProgress
    // truncates; the listener does not)
    final case class BatchMetric(rows: Long, ms: Long, stateRows: Long)
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetric]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val ms = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
        val state = p.stateOperators.map(_.numRowsTotal).sum
        metrics.add(BatchMetric(p.numInputRows, ms, state))
      }
    }
    spark.streams.addListener(listener)

    val t0 = System.nanoTime()
    op match {
      case "admission" =>
        // ~2% of stream docs collide with the 200-digest static index;
        // ~1% repeat an earlier stream doc's text (within-watermark
        // dup). The dup branch must point at a PLAIN-branch doc: i-1
        // is ≡6 (mod 100) and ≢0 (mod 50), so its text really is the
        // plain rendering (pointing at i-100 — itself ≡7 mod 100 —
        // would chain forever and generate zero actual duplicates)
        def text(i: Long): String =
          if (i % 50 == 0) s"indexed shared passage number ${i / 50 % 200}"
          else if (i % 100 == 7) s"stream doc body ${i - 1} tokens"
          else s"stream doc body $i tokens"
        val index = (0 until 200)
          .map(j => s"indexed shared passage number $j").toDF("text")
          .select(md5(trim(regexp_replace(col("text"), "\\s+", " ")))
            .as("digest"))
          .localCheckpoint()
        val in = MemoryStream[Doc]
        val q = EventStream.streamingAdmission(
            in.toDF(), index, textCol = "text", watermark = watermark)
          .writeStream.format("noop").start()
        var i = 0L
        while (i < nEvents) {
          val hi = math.min(i + chunk, nEvents)
          in.addData((i until hi).map(j => Doc(j, eventTs(j, simRate), text(j))))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case "strip" =>
        // ~2% of stream docs open with one of 200 indexed 10-word
        // passages (that window is cut); the rest are fresh and pass
        // whole — every doc emits, so the stateful step under test is
        // the watermark-windowed verdict fold, same equilibrium
        // family as the admission verdicts
        def passage(j: Long): String =
          (0 until 10).map(t => s"pass${j}w$t").mkString(" ")
        def filler(i: Long): String =
          (0 until 10).map(t => s"doc${i}tok$t").mkString(" ")
        def text(i: Long): String =
          if (i % 50 == 0) s"${passage(i / 50 % 200)} ${filler(i)}"
          else s"${filler(i)} tail"
        val index = graft.dedup.Dedup.windowDigestSet(
          (0L until 200L).map(j => (j, passage(j)))
            .toDF("doc_id", "text"),
          "doc_id", "text").localCheckpoint()
        val in = MemoryStream[Doc]
        val q = EventStream.streamingStripPassages(
            in.toDF(), index, watermark = watermark)
          .writeStream.format("noop").start()
        var i = 0L
        while (i < nEvents) {
          val hi = math.min(i + chunk, nEvents)
          in.addData((i until hi).map(j =>
            Doc(j, eventTs(j, simRate), text(j))))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case "embed_admission" =>
        // 2k-vector corpus + sign-code index; ~2% of stream vectors
        // are near-copies of a corpus vector (dropped), the rest are
        // index-orthogonal directions (admitted)
        val dim = 16
        val nBits = embedBits
        def baseVec(k: Long): Seq[Float] =
          Seq.tabulate(dim)(t =>
            (((k * 31 + t * 17) % 13) - 6).toFloat / 6f)
        val corpusVecs = (0L until 2000L).map(k => (k, baseVec(k)))
          .toDF("id", "vec")
          .localCheckpoint()
        val codes = graft.similarity.Similarity.signCodeIndex(
          corpusVecs, dim, nBits)
        def streamVec(i: Long): Seq[Float] =
          if (i % 50 == 0) baseVec(i / 50 % 2000) // ~corpus copy
          else Seq.tabulate(dim)(t =>
            (((i * 73 + t * 29) % 17) - 8).toFloat / 8f)
        val in = MemoryStream[VDoc]
        val q = EventStream.streamingEmbedAdmission(
            in.toDF(), corpusVecs, codes, dim = dim, nBits = nBits,
            simThreshold = 0.999, watermark = watermark)
          .writeStream.format("noop").start()
        var i = 0L
        while (i < nEvents) {
          val hi = math.min(i + chunk, nEvents)
          in.addData((i until hi).map(j =>
            VDoc(j, eventTs(j, simRate), streamVec(j))))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case "interval_join" =>
        // two streams, half the events each, same simulated clock
        val lIn = MemoryStream[Event]
        val rIn = MemoryStream[Event]
        val q = EventStream.streamingIntervalJoinOn(
            lIn.toDF(), rIn.toDF(), keyCol = "user_id", tsCol = "ts",
            within = "2 minutes", watermark = watermark)
          .writeStream.format("noop").start()
        val perSide = nEvents / 2
        var i = 0L
        while (i < perSide) {
          val hi = math.min(i + chunk / 2, perSide)
          // each side advances event time at HALF the combined rate:
          // spacing 2/simRate seconds = eventTs(2j) at the full rate
          // (integer-safe for any simRate >= 1, unlike simRate / 2)
          lIn.addData((i until hi).map(j =>
            Event(j, eventTs(j * 2, simRate), j % nKeys, "click", 1.0)))
          rIn.addData((i until hi).map(j =>
            Event(j, eventTs(j * 2, simRate), j % nKeys, "view", 1.0)))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case "ivf_topk" =>
        // persisted-IVF streaming retrieval: 2k-vector base, 16
        // cells, every stream event is a query wanting top-10 — the
        // state under test is the per-query candidate fold (bounded
        // by nProbe x cell size x in-horizon queries)
        val dim = 16
        def baseVec(k: Long): Seq[Float] =
          Seq.tabulate(dim)(t =>
            (((k * 31 + t * 17) % 13) - 6).toFloat / 6f)
        val base = (0L until 2000L).map(k => (k, baseVec(k)))
          .toDF("id", "vec")
        val (centDf, assigned) =
          graft.similarity.Similarity.ivfIndex(base, nLists = 16)
        val assignments = assigned.localCheckpoint()
        val cents = graft.similarity.Similarity.loadedCentroids(centDf)
        def qVec(i: Long): Seq[Float] =
          Seq.tabulate(dim)(t =>
            (((i * 73 + t * 29) % 17) - 8).toFloat / 8f)
        val in = MemoryStream[VDoc]
        val q = EventStream.streamingIvfTopK(
            in.toDF(), assignments, cents, k = 10, nProbe = 4,
            idCol = "doc_id", watermark = watermark)
          .writeStream.format("noop").start()
        var i = 0L
        while (i < nEvents) {
          val hi = math.min(i + chunk, nEvents)
          in.addData((i until hi).map(j =>
            VDoc(j, eventTs(j, simRate), qVec(j))))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case "ivfpq_topk" =>
        // codes-only persisted IVF-PQ streaming retrieval: same base
        // and query shape as ivf_topk, but the stream-static join
        // carries m one-byte codes per candidate (never vectors) and
        // the PQ cascade runs as two chained folds — the state under
        // test is the ADC fold (nProbe x cell size x in-horizon
        // queries) plus the refine fold (refine*k x in-horizon)
        val dim = 16
        def baseVec(k: Long): Seq[Float] =
          Seq.tabulate(dim)(t =>
            (((k * 31 + t * 17) % 13) - 6).toFloat / 6f)
        val base = (0L until 2000L).map(k => (k, baseVec(k)))
          .toDF("id", "vec")
        val (centDf, cbDf, assigned) = graft.similarity.Pq.ivfPqIndex(
          base, nLists = 16, m = 4, kCodes = 16)
        val assignments = assigned.localCheckpoint()
        val cents = graft.similarity.Similarity.loadedCentroids(centDf)
        val cb = graft.similarity.Pq.loadedCodebooks(cbDf)
        def qVec(i: Long): Seq[Float] =
          Seq.tabulate(dim)(t =>
            (((i * 73 + t * 29) % 17) - 8).toFloat / 8f)
        val in = MemoryStream[VDoc]
        val q = EventStream.streamingIvfPqTopK(
            in.toDF(), assignments, cents, cb, base, k = 10,
            nProbe = 4, refine = 4,
            idCol = "doc_id", watermark = watermark)
          .writeStream.format("noop").start()
        var i = 0L
        while (i < nEvents) {
          val hi = math.min(i + chunk, nEvents)
          in.addData((i until hi).map(j =>
            VDoc(j, eventTs(j, simRate), qVec(j))))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case "bm25_topk" =>
        // persisted-postings streaming retrieval: 2k-doc corpus over
        // a 500-term vocabulary, every stream event a 3-term query —
        // the state under test is the chained per-(query, doc) sum +
        // per-query fold (bounded by query-term df x in-horizon
        // queries)
        import graft.text.Search
        def dText(k: Long): String =
          (0 until 20).map(t => s"w${(k * 7 + t * 3) % 500}").mkString(" ")
        val corpus = (0L until 2000L).map(k => (k, dText(k)))
          .toDF("doc_id", "text")
        val post = Search.postings(corpus, "doc_id", "text")
          .localCheckpoint()
        val stats = Search.corpusStats(corpus, "text").localCheckpoint()
        def qText(i: Long): String =
          s"w${i % 500} w${(i * 13 + 7) % 500} w${(i * 29 + 3) % 500}"
        val in = MemoryStream[Doc]
        val q = EventStream.streamingBm25TopK(
            in.toDF(), post, stats, k = 10,
            idCol = "doc_id", docCol = "hit_id", watermark = watermark)
          .writeStream.format("noop").start()
        var i = 0L
        while (i < nEvents) {
          val hi = math.min(i + chunk, nEvents)
          in.addData((i until hi).map(j =>
            Doc(j, eventTs(j, simRate), qText(j))))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case "video_admission" =>
        // frame-code stream: 4 frames per video; ~2% of videos have
        // two frames within hamming 2 of an indexed corpus frame
        // (flagged at minMatchedFrames=2), the rest random-far. The
        // corpus index holds 5000 frame codes of 1250 videos.
        import graft.dedup.Dedup
        def code(k: Long): Long =
          (k * 0x9E3779B97F4A7C15L) & ((1L << 56) - 1)
        val corpusIndex = (0 until 5000)
          .map(j => ((j / 4).toLong, j % 4, code(j)))
          .toDF("media_id", "frame_no", "code")
          .select(struct(col("media_id"), col("frame_no")).as("id"),
            col("code"))
          .transform(df => Dedup.hammingBandRows(df, maxHamming = 2,
            bits = 56))
          .localCheckpoint()
        def frameCode(i: Long): Long = {
          val video = i / 4
          val frame = i % 4
          // dup videos: frames 0 and 1 land hamming 1 off corpus
          // frames; others far
          if (video % 50 == 0 && frame < 2)
            code((video / 50) % 5000) ^ 1L
          else code(1000000L + i)
        }
        val in = MemoryStream[FrameDoc]
        val q = EventStream.streamingVideoAdmission(
            in.toDF(), corpusIndex, maxHamming = 2, bits = 56,
            minMatchedFrames = 2, watermark = watermark)
          .writeStream.format("noop").outputMode("append").start()
        var i = 0L
        while (i < nEvents) {
          val hi = math.min(i + chunk, nEvents)
          in.addData((i until hi).map(j =>
            FrameDoc(j / 4, (j % 4).toInt, eventTs(j, simRate),
              frameCode(j))))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case "windowed" =>
        val in = MemoryStream[Event]
        val q = EventStream.windowedCounts(in.toDF(), watermark = watermark)
          .writeStream.format("noop").outputMode("append").start()
        var i = 0L
        while (i < nEvents) {
          val hi = math.min(i + chunk, nEvents)
          in.addData((i until hi).map(j =>
            Event(j, eventTs(j, simRate), j % nKeys,
              if (j % 3 == 0) "click" else "view", 1.0)))
          q.processAllAvailable()
          i = hi
        }
        q.stop()

      case other => sys.error(s"unknown op '$other'")
    }
    val wallS = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(listener)

    import scala.jdk.CollectionConverters._
    val ms = metrics.asScala.toVector
    val data = ms.filter(_.rows > 0) // no-data watermark-commit batches excluded from latency
    val durs = data.map(_.ms).sorted
    def pct(p: Double): Long =
      if (durs.isEmpty) 0L else durs(math.min(durs.size - 1,
        (p * durs.size).toInt))
    val maxState = if (ms.isEmpty) 0L else ms.map(_.stateRows).max
    val horizonRows = // the bound the claim predicts: rate x (wm [+within])
      simRate.toLong * (wmMin * 60L + (if (op == "interval_join") 240L else 0L))
    val extra = if (op == "embed_admission") s""","embed_bits":$embedBits""" else ""
    println(s"""{"op":"$op","events":$nEvents,"batches":${data.size}$extra,""" +
      s""""state_partitions":$statePartitions,""" +
      s""""chunk":$chunk,"watermark":"$watermark","sim_rate_eps":$simRate,""" +
      s""""max_state_rows":$maxState,"horizon_rows":$horizonRows,""" +
      s""""p50_batch_ms":${pct(0.50)},"p95_batch_ms":${pct(0.95)},""" +
      s""""wall_s":${f"$wallS%.1f"},""" +
      s""""throughput_eps":${(nEvents / math.max(wallS, 0.001)).toLong}}""")
    spark.stop()
  }
}
