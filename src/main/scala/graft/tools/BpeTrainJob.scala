package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.{Sessions, Tables}
import graft.text.Bpe

/** Timed BPE-training job over a testdata documents table — the
  * measurement harness for [[graft.text.Bpe]]'s scale claims:
  * (1) the corpus is touched once, iterations run on the vocab-sized
  * word table; (2) batched merge selection divides the DRIVER-CADENCE
  * cost — Spark jobs per merge — without touching per-round data
  * cost. Args: <sfDir> <numMerges> [batch=1] [outDir]. Prints one
  * JSON line with the corpus reduction time, training time, the
  * NUMBER OF SPARK JOBS training scheduled (the cadence metric the
  * batch knob exists to cut), and the table sizes the claim rests
  * on. With `outDir` set, exports merges.txt + vocab.tsv
  * ([[Bpe.save]]) so the artifacts are consumable outside the
  * engine.
  */
object BpeTrainJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length <= 4,
      "usage: BpeTrainJob <sfDir> <numMerges> [batch] [outDir]")
    val (sfDir, numMerges) = (args(0), args(1).toInt)
    val batch = if (args.length >= 3) args(2).toInt else 1
    val outDir = if (args.length >= 4) Some(args(3)) else None
    val spark = Sessions.local("graft-bpe")
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val words = Bpe.wordCounts(docs, "text").localCheckpoint()
    val nWords = words.count() // forces the one full-corpus pass
    val tReduce = (System.nanoTime() - t0) / 1e9

    // count the Spark jobs training schedules: with one aggregate +
    // one-row collect per merge (batch=1) a 32k vocab is 32k+ jobs of
    // scheduler round-trips; batch=B cuts that ~B-fold
    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobCounter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)

    // training consumes the ALREADY-materialized word table, so
    // train_s isolates the per-iteration cost — the corpus is never
    // scanned a second time
    val t1 = System.nanoTime()
    val trained = Bpe.trainFromWordCounts(words, numMerges, batch = batch)
    val tTrain = (System.nanoTime() - t1) / 1e9
    // listener events post asynchronously (the bus is internal);
    // poll until the count is quiescent before reading
    var prev = -1L
    var waited = 0
    while (jobCounter.get() != prev && waited < 5000) {
      prev = jobCounter.get()
      Thread.sleep(200)
      waited += 200
    }
    spark.sparkContext.removeSparkListener(listener)
    val trainJobs = jobCounter.get()
    // the vocab materialization is NOT training cadence — count it
    // outside both the timer and the job listener, or it would skew
    // the jobs-per-merge comparison the batch knob is measured by
    val vocabSize = trained.vocab.count()

    outDir.foreach(Bpe.save(trained, _))

    // encode throughput: tokenize the WHOLE corpus with the trained
    // merges through the codegen'd production encoder (bpe_encode) —
    // the number a tokenizer user actually wants
    val t2 = System.nanoTime()
    val nTokens = docs
      .select(org.apache.spark.sql.functions.explode(
        Bpe.encodeFast(org.apache.spark.sql.functions.col("text"),
          trained.merges)).as("tok"))
      .count()
    val tEncode = (System.nanoTime() - t2) / 1e9

    println(s"""{"docs":$nDocs,"distinct_words":$nWords,""" +
      s""""reduce_s":${f"$tReduce%.2f"},"merges":${trained.merges.size},""" +
      s""""batch":$batch,"train_jobs":$trainJobs,""" +
      s""""train_s":${f"$tTrain%.2f"},""" +
      s""""per_merge_s":${f"${tTrain / math.max(trained.merges.size, 1)}%.3f"},""" +
      s""""vocab":$vocabSize,"encode_s":${f"$tEncode%.2f"},""" +
      s""""tokens":$nTokens,""" +
      s""""tokens_per_s":${(nTokens / math.max(tEncode, 0.001)).toLong},""" +
      s""""sf":"$sfDir"""" +
      outDir.map(d => s""","out":"$d"""").getOrElse("") + "}")
    spark.stop()
  }
}
