package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity-checks the distributed BPE trainer against a plain-Scala
  * reference implementation of the textbook algorithm (pair counts
  * weighted by word frequency, argmax with the same (count desc,
  * lexicographic) tie-break, greedy-left merge application). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE over a (word -> count) table. */
  private def refTrain(
      wordCounts: Map[String, Long],
      numMerges: Int,
      minPairCount: Long): (Seq[(String, String)], Map[String, Long]) = {
    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < numMerges) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, c) <- words; i <- 0 until sym.length - 1)
        pairs((sym(i), sym(i + 1))) =
          pairs.getOrElse((sym(i), sym(i + 1)), 0L) + c
      val best = pairs.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= minPairCount =>
          merges += ((a, b))
          words = words.map { case (sym, c) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            sym.foreach { x =>
              if (out.nonEmpty && out.last == a && x == b)
                out(out.length - 1) = a + b
              else out += x
            }
            out.toVector -> c
          }.groupMapReduce(_._1)(_._2)(_ + _)
        case _ => done = true
      }
    }
    val vocab = words.toSeq
      .flatMap { case (sym, c) => sym.map(_ -> c) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    (merges.toSeq, vocab)
  }

  // the classic BPE illustration corpus, with word multiplicities
  private val corpusWords = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq.fill(4)("new")
  private lazy val docs = corpusWords.grouped(4)
    .map(_.mkString(" ")).toSeq.toDF("text")

  test("distributed trainer reproduces the reference merge sequence " +
      "and final vocabulary exactly") {
    val wc = corpusWords.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val (refMerges, refVocab) = refTrain(wc, numMerges = 12, minPairCount = 2)
    assert(refMerges.nonEmpty && refMerges.size >= 6,
      s"fixture should produce several merges, got $refMerges")

    val trained = Bpe.train(docs, "text", numMerges = 12, minPairCount = 2)
    assert(trained.merges == refMerges,
      s"merge sequences diverge:\n spark=${trained.merges}\n ref  =$refMerges")
    val gotVocab = trained.vocab.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotVocab == refVocab)
  }

  test("merge sequence is partitioning-invariant (deterministic " +
      "tie-break, not an artifact of task order)") {
    val base = Bpe.train(docs, "text", numMerges = 8).merges
    val perturbed = Bpe.train(docs.repartition(7), "text", numMerges = 8).merges
    assert(base == perturbed)
  }

  test("encode replays the trained merges greedy-left per word and " +
      "matches reference tokenization, including the overlap case") {
    val trained = Bpe.train(docs, "text", numMerges = 12, minPairCount = 2)
    def refEncode(text: String): Seq[String] =
      text.trim.split("\\s+").toSeq.flatMap { w =>
        var sym = w.map(_.toString).toVector
        trained.merges.foreach { case (a, b) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          sym.foreach { x =>
            if (out.nonEmpty && out.last == a && x == b)
              out(out.length - 1) = a + b
            else out += x
          }
          sym = out.toVector
        }
        sym
      }
    val samples = Seq("lowest newest", "low low low", "newlow widest")
    val got = samples.toDF("t")
      .select(Bpe.encode(col("t"), trained.merges).as("e"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(got.toSeq == samples.map(refEncode))

    // greedy-left on overlapping pairs: "aaa" under merge (a,a) is
    // [aa, a], never [a, aa]
    val gl = Seq("aaa").toDF("t")
      .select(Bpe.encode(col("t"), Seq(("a", "a"))).as("e"))
      .collect().head.getSeq[String](0).toSeq
    assert(gl == Seq("aa", "a"))
  }

  test("early stop: merges halt when the best pair drops below " +
      "minPairCount, not at the requested count") {
    // every word unique -> all pair counts are 1 -> no merges at min 2
    val uniq = Seq("abc def", "ghi jkl").toDF("text")
    val t = Bpe.train(uniq, "text", numMerges = 5, minPairCount = 2)
    assert(t.merges.isEmpty)
    // with min 1 it merges up to the requested budget
    assert(Bpe.train(uniq, "text", numMerges = 3, minPairCount = 1)
      .merges.size == 3)
  }
}
