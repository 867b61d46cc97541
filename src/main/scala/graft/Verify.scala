package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Dumps run CONCURRENTLY (SPARK_GRAFT_VERIFY_PAR threads, default 6):
  * each query is an independent small job whose coalesce(1) tail
  * leaves most of local[32] idle, so submitting several at once
  * overlaps scheduling/write latency without oversubscribing cores —
  * the serial form took ~17 min for 71 dumps at sf0.01 (round-4 judge
  * measurement) against a driver budget the round cannot afford to
  * blow. SparkSession is thread-safe for job submission; every query
  * writes its own directory, so dumps share nothing but the session. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    val par = sys.env.get("SPARK_GRAFT_VERIFY_PAR")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ > 0)
      .getOrElse(6)
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    val t0 = System.nanoTime()
    // local-iteration helper: SPARK_GRAFT_VERIFY_ONLY=q_a,q_b dumps a
    // subset (the driver never sets it, so the gate always runs full)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            val q0 = System.nanoTime()
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(
              f"[verify] $name ok in ${(System.nanoTime() - q0) / 1e9}%.1fs")
          } catch { case e: Throwable =>
            failed.add(name)
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    pool.shutdown()
    val finished =
      pool.awaitTermination(2, java.util.concurrent.TimeUnit.HOURS)
    if (!finished) {
      // Timed out with dumps still running: cancel them and make sure
      // they land in `failed` rather than being logged as done — a
      // half-written parquet dir read by the DuckDB compare would be
      // silently wrong, which is worse than an explicit failure.
      System.err.println("[verify] TIMEOUT after 2h with dumps in flight")
      pool.shutdownNow()
      spark.sparkContext.cancelAllJobs()
      pool.awaitTermination(1, java.util.concurrent.TimeUnit.MINUTES)
      selected.map(_._1).foreach { name =>
        val dir = Paths.get(s"$outDir/$name")
        if (!Files.exists(dir.resolve("_SUCCESS"))) {
          failed.add(name)
          if (Files.exists(dir)) { // half-written: remove, don't let
            // the compare read a torn dump as a real result
            import scala.jdk.CollectionConverters._
            Files.walk(dir).iterator().asScala.toSeq.reverse
              .foreach(p => Files.deleteIfExists(p))
          }
        }
      }
    } else System.err.println(
      f"[verify] all dumps done in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Approximate-path recall artifact (full runs only — the driver
    // never sets SPARK_GRAFT_VERIFY_ONLY): every no-oracle query
    // measured against its exact twin recomputed on the same data.
    // Failures are recorded inside the JSON (-1 recall), never allowed
    // to fail the dump run itself.
    if (only.isEmpty && sys.env.getOrElse("SPARK_GRAFT_RECALL", "1") != "0")
      try {
        val (json, belowFloor, _) = Recall.measureAll(spark, sfDir)
        Files.writeString(Paths.get(s"$outDir/recall.json"), json + "\n")
        Files.writeString(Paths.get("RECALL.json"), json + "\n")
        System.err.println(s"[verify] recall artifact written: $json")
        if (belowFloor.nonEmpty)
          System.err.println("[verify] recall BELOW FLOOR: " +
            belowFloor.mkString(", "))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] recall artifact failed: ${e.getMessage}")
      }
    val failedNames = {
      import scala.jdk.CollectionConverters._
      failed.asScala.toList
    }
    if (failedNames.nonEmpty)
      System.err.println(
        s"[verify] FAILED queries: ${failedNames.sorted.mkString(", ")}")
    spark.stop()
  }
}
