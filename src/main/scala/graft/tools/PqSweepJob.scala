package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.similarity.{Pq, Similarity}

/** IVF-PQ quality sweep: recall@k of the APPROXIMATE regime vs brute
  * force across the (nProbe, refine) grid — the one curve a tuner
  * needs before trading recall for probe cost. Args: <sfDir> [k=10]
  * [nQueries=10]. Queries are the first `nQueries` vectors, base is
  * everything else (disjoint, same convention as the bench queries).
  * Prints one JSON line per grid point plus a final `sweep_done`
  * line; wall is per-search only (fits and the exact baseline are
  * outside the timer). */
object PqSweepJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PqSweepJob <sfDir> [k] [nQueries]")
    val sfDir = args(0)
    val k = if (args.length >= 2) args(1).toInt else 10
    val nQ = if (args.length >= 3) args(2).toInt else 10
    val spark = Sessions.local("graft-pqsweep")
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    val base = emb.filter(col("vec_id") >= nQ)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .localCheckpoint()
    val nBase = base.count()

    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val exact = topSet(Similarity.bruteForceTopK(queries, base, k))
    require(exact.nonEmpty, "no exact neighbors - empty fixture?")

    val nLists = 16
    for (nProbe <- Seq(1, 2, 4, 8, 16); refine <- Seq(1, 4, 16, 32)) {
      val t0 = System.nanoTime()
      val approx = topSet(Pq.ivfPqTopK(queries, base, k,
        nLists = nLists, nProbe = nProbe, m = 16, kCodes = 32,
        refine = refine))
      val wall = (System.nanoTime() - t0) / 1e9
      val recalls = exact.map { case (qid, ex) =>
        approx.get(qid).map(ap => (ap & ex).size.toDouble / ex.size)
          .getOrElse(0.0)
      }
      val mean = recalls.sum / recalls.size
      println(s"""{"n_base":$nBase,"k":$k,"n_lists":$nLists,""" +
        s""""n_probe":$nProbe,"refine":$refine,""" +
        s""""recall":${f"$mean%.3f"},"wall_s":${f"$wall%.2f"},"sf":"$sfDir"}""")
    }
    println(s"""{"sweep_done":true,"sf":"$sfDir"}""")
    spark.stop()
  }
}
