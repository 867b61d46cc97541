package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * times. Each query is forced with a noop-format write so the full
  * plan executes (a bare .count() lets Catalyst prune to a
  * metadata-only plan and under-measures real work). Failures are
  * recorded per-query and make the process exit nonzero instead of
  * being silently timed as successes.
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
    val results = names.map { name =>
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
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }

    val qs = results
      .map { case (k, v, ok) => s""""$k":${if (ok) f"$v%.3f" else "-1"}""" }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map(_._1)
    val total = results.filter(_._3).map(_._2).sum
    val totalS = f"$total%.3f"
    val failedS = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$totalS,"unit":"sec","queries":$qs,"n_queries":${names.size},"failed":$failedS,"sf":"$sfDir"}"""
    // Single machine-readable line on stdout (build.sbt routes forked
    // stdout unprefixed via StdoutOutput); also persisted for humans.
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
