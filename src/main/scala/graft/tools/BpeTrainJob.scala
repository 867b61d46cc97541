package graft.tools

import graft.{Sessions, Tables}
import graft.text.Bpe

/** Timed BPE-training job over a testdata documents table — the
  * measurement harness for [[graft.text.Bpe]]'s scale claim (corpus
  * touched once; iterations run on the vocab-sized word table). Args:
  * <sfDir> <numMerges>. Prints one JSON line with the corpus
  * reduction time, the per-iteration training time, and the table
  * sizes the claim rests on.
  */
object BpeTrainJob {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BpeTrainJob <sfDir> <numMerges>")
    val (sfDir, numMerges) = (args(0), args(1).toInt)
    val spark = Sessions.local("graft-bpe")
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val words = Bpe.wordCounts(docs, "text").localCheckpoint()
    val nWords = words.count() // forces the one full-corpus pass
    val tReduce = (System.nanoTime() - t0) / 1e9

    // training consumes the ALREADY-materialized word table, so
    // train_s isolates the per-iteration cost — the corpus is never
    // scanned a second time
    val t1 = System.nanoTime()
    val trained = Bpe.trainFromWordCounts(words, numMerges)
    val vocabSize = trained.vocab.count()
    val tTrain = (System.nanoTime() - t1) / 1e9

    println(s"""{"docs":$nDocs,"distinct_words":$nWords,""" +
      s""""reduce_s":${f"$tReduce%.2f"},"merges":${trained.merges.size},""" +
      s""""train_s":${f"$tTrain%.2f"},""" +
      s""""per_merge_s":${f"${tTrain / math.max(trained.merges.size, 1)}%.3f"},""" +
      s""""vocab":$vocabSize,"sf":"$sfDir"}""")
    spark.stop()
  }
}
