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
  * Contention defense: the shared sandbox can steal the CPU for
  * minutes at a time, inflating a 2 s query 30x (round-2's recorded
  * 883 s vs reproducible 57.7 s; observed again in round 3 with a
  * DIFFERENT query inflated each run). The suite therefore runs as
  * TWO FULL PASSES, reporting the per-query MIN across passes:
  * back-to-back repeats share one contention window, but a window
  * shorter than a whole pass (~minutes) cannot inflate the same query
  * in both passes. Results are flushed to bench_last.json after every
  * query, so a partially-completed run still leaves a usable
  * artifact.
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

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val okFlags = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]

    def renderJson(partial: Boolean): String = {
      val qs = names.filter(times.contains)
        .map(k => s""""$k":${if (okFlags(k)) f"${times(k)}%.3f" else "-1"}""")
        .mkString("{", ",", "}")
      val failed = names.filter(n => okFlags.getOrElse(n, true) == false)
      val total = names.filter(n => okFlags.getOrElse(n, false)).map(times).sum
      val failedS = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val partialS = if (partial) ""","partial":true""" else ""
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"n_queries":${times.size},"failed":$failedS,"sf":"$sfDir","timing":"min_of_2_passes"$partialS}"""
    }

    def flush(partial: Boolean): Unit =
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_last.json"), renderJson(partial) + "\n")
      catch { case _: Throwable => () }

    def once(name: String): (Double, Boolean) = {
      val fn = SparkEntry.queries(name)
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

    // pass 1: every query once
    names.foreach { name =>
      val (t, ok) = once(name)
      times(name) = t
      okFlags(name) = ok
      flush(partial = true)
    }
    // pass 2: re-run successes, keep the min — samples are a full
    // pass apart in time, so one contention window can't hit both
    names.foreach { name =>
      if (okFlags(name)) {
        val (t, ok) = once(name)
        if (ok) times(name) = math.min(times(name), t)
        flush(partial = name != names.last)
      }
    }

    val json = renderJson(partial = false)
    // Single machine-readable line on stdout (build.sbt routes forked
    // stdout unprefixed via StdoutOutput); also persisted for humans.
    println(json)
    flush(partial = false)
    spark.stop()
    if (okFlags.values.exists(!_)) sys.exit(1)
  }
}
