package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.dedup.Dedup
import graft.jobs.CorpusPipeline

/** Prices ONE admitMediaBatch call at a synthetic scale point — the
  * measurement face of the admission persist-policy decision
  * (persist-with-lineage vs localCheckpoint for the verdict frames:
  * the policy is about fault tolerance, so its WALL cost must be
  * measured, not assumed — the r12 checkpoint anti-win showed this
  * family surprises).
  *
  * Corpus: `n` pseudo-random 56-bit codes, indexed with
  * hammingBandRows the way a persisted index stores them. Batch:
  * n/5 codes — 10% within hamming 2 of a corpus code (corpus dups),
  * 5% in verbatim-identical batch-internal groups of 4 (exercising
  * the Fingerprint pair source's collapse + CC keeper), the rest
  * fresh. Times the FULL admission: probe verdict, batch-internal
  * CC, annotate joins, admitted count, delta band rows — then
  * release()s (or lets checkpoint blocks GC in the old policy).
  *
  * Usage: runMain graft.tools.MediaAdmitBenchJob [n] [maxHamming]
  * Prints one JSON line.
  */
object MediaAdmitBenchJob {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val maxHamming = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local("graft-media-admit-bench")
    import spark.implicits._

    def codeOf(c: org.apache.spark.sql.Column) =
      abs(xxhash64(c)).bitwiseAND(lit((1L << 56) - 1))
    val corpus = spark.range(n)
      .select(col("id"), codeOf(col("id")).as("code"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    val index = Dedup.hammingBandRows(corpus, maxHamming, bits = 56)
      .localCheckpoint()
    val indexRows = index.count()
    val indexWall = (System.nanoTime() - t0) / 1e9

    // batch: 10% corpus-near (hamming 2), two VERBATIM hot codes of
    // b/40 members each (over the 2000 cap, so the skew monitor
    // fires and the identical-code pre-collapse + CC keeper path is
    // exercised — the path the persist policy changed), rest fresh
    val b = n / 5
    val batch = spark.range(b).select(
        (col("id") + n).as("id"),
        when(col("id") % 10 === 0, codeOf(col("id") % n).bitwiseXOR(lit(3L)))
          .when(col("id") % 40 === 1, lit(0x00123456789abcL))
          .when(col("id") % 40 === 21, lit(0x00fedcba987654L))
          .otherwise(codeOf(col("id") + 7 * n)).as("code"))
      .localCheckpoint()
    batch.count()

    val t1 = System.nanoTime()
    def lap(prev: Long): (Long, Double) = {
      val now = System.nanoTime(); (now, (now - prev) / 1e9)
    }
    val adm = CorpusPipeline.admitMediaBatch(index, batch,
      maxHamming = maxHamming, maxBucket = 2000, bits = 56)
    val (t2, constructS) = lap(t1)
    val corpusDups = adm.annotated
      .filter(col("is_corpus_phash_dup")).count()
    val (t3, cdupS) = lap(t2)
    val batchDups = adm.annotated
      .filter(col("is_batch_phash_dup")).count()
    val (t4, bdupS) = lap(t3)
    val admitted = adm.admitted.count()
    val (t5, admS) = lap(t4)
    val deltaRows = adm.newHamming.count()
    val (_, deltaS) = lap(t5)
    System.err.println(f"[media-admit] construct=$constructS%.1f " +
      f"cdup=$cdupS%.1f bdup=$bdupS%.1f admitted=$admS%.1f " +
      f"delta=$deltaS%.1f")
    val admitWall = (System.nanoTime() - t1) / 1e9

    println(s"""{"metric":"media_admit_bench","corpus":$n,"batch":$b,""" +
      s""""maxHamming":$maxHamming,"index_rows":$indexRows,""" +
      s""""index_wall_s":${f"$indexWall%.2f"},""" +
      s""""corpus_dups":$corpusDups,"batch_dups":$batchDups,""" +
      s""""admitted":$admitted,"delta_rows":$deltaRows,""" +
      s""""admit_wall_s":${f"$admitWall%.2f"}}""")
    spark.stop()
  }
}
