package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * times. Each query is forced with a noop-format write so the full
  * plan executes (a bare .count() lets Catalyst prune to a
  * metadata-only plan and under-measures real work). Failures are
  * recorded per-query and make the process exit nonzero instead of
  * being silently timed as successes.
  *
  * Contention defense: the shared sandbox can steal the CPU for whole
  * scheduling quanta, inflating a 2 s query to minutes (round-2's
  * recorded 883 s vs reproducible 57.7 s). Each query therefore runs
  * TWICE and reports the MIN of the two wall times — the min is the
  * best available estimate of the query's intrinsic cost under noisy
  * neighbors. Results are also flushed to bench_last.json after EVERY
  * query, so a partially-completed run still leaves a usable artifact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")

    val names =
      if (args.nonEmpty) args.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    // Warm-up outside the timed region: session init, codegen
    // compiler, parquet footer reads — otherwise the alphabetically
    // first query absorbs ~5s of one-time cost.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    def renderJson(results: Seq[(String, Double, Boolean)], partial: Boolean): String = {
      val qs = results
        .map { case (k, v, ok) => s""""$k":${if (ok) f"$v%.3f" else "-1"}""" }
        .mkString("{", ",", "}")
      val failed = results.filterNot(_._3).map(_._1)
      val total = results.filter(_._3).map(_._2).sum
      val failedS = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val partialS = if (partial) ""","partial":true""" else ""
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"n_queries":${results.size},"failed":$failedS,"sf":"$sfDir","timing":"min_of_2"$partialS}"""
    }

    def flush(results: Seq[(String, Double, Boolean)], partial: Boolean): Unit =
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_last.json"),
        renderJson(results, partial) + "\n")
      catch { case _: Throwable => () }

    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Boolean)]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try {
            // noop sink: full evaluation of every column, nothing written
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once()
      // Only re-run successes: a failure's timing is meaningless and
      // a second failure just doubles the log noise.
      val best = if (ok1) math.min(t1, once()._1) else t1
      results += ((name, best, ok1))
      flush(results.toSeq, partial = results.size < names.size)
    }

    val json = renderJson(results.toSeq, partial = false)
    // Single machine-readable line on stdout (build.sbt routes forked
    // stdout unprefixed via StdoutOutput); also persisted for humans.
    println(json)
    flush(results.toSeq, partial = false)
    spark.stop()
    val failed = results.filterNot(_._3)
    if (failed.nonEmpty) sys.exit(1)
  }
}
