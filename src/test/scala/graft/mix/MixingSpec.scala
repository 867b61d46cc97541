package graft.mix

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, src: String) =
    (0 until n).map(i => (s"$src-$i", src)).toDF("id", "source")

  test("weights <= 1 downsample to roughly the fraction, " +
      "deterministically for a fixed seed") {
    val base = docs(2000, "a")
    val s1 = Mixing.weighted(base, 0.25, seed = 7L)
    val s2 = Mixing.weighted(base, 0.25, seed = 7L)
    val n = s1.count()
    assert(n > 2000 * 0.15 && n < 2000 * 0.35, s"got $n")
    // same seed -> identical row set
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    // different seed -> (almost surely) different row set
    val s3 = Mixing.weighted(base, 0.25, seed = 8L)
    assert(s1.exceptAll(s3).count() > 0)
  }

  test("weights > 1 upsample with whole copies plus a fractional tail") {
    val base = docs(1000, "a")
    val up = Mixing.weighted(base, 2.5, seed = 7L)
    val n = up.count()
    assert(n > 2300 && n < 2700, s"got $n")
    // every emitted row is a real source row
    assert(up.join(base, Seq("id", "source"), "left_anti").count() == 0)
    // zero weight -> empty, schema preserved
    val zero = Mixing.weighted(base, 0.0, seed = 7L)
    assert(zero.count() == 0 && zero.columns.toSeq == base.columns.toSeq)
  }

  test("upsampling is ONE scan of the source, not floor(w) re-scans, " +
      "and is deterministic under repartitioning") {
    val dir = java.nio.file.Files.createTempDirectory("mixscan").toString
    docs(1000, "a").write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val up = Mixing.weighted(base, 3.7, seed = 5L)
    // plan-level: exactly one relation scan feeds the whole upsample
    val scans = up.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
    val n = up.count()
    assert(n > 3500 && n < 3900, s"got $n")
    // content-hash keep decision: identical result regardless of the
    // source's partitioning (stronger than sample()'s partition RNG)
    val perturbed = Mixing.weighted(base.repartition(7), 3.7, seed = 5L)
    assert(up.exceptAll(perturbed).count() == 0 &&
      perturbed.exceptAll(up).count() == 0)
  }

  test("mix unions weighted sources; stratified balances per-key " +
      "fractions") {
    val mixed = Mixing.mix(Seq(
      (docs(1000, "web"), 1.0),
      (docs(1000, "books"), 0.5),
      (docs(200, "code"), 2.0)), seed = 11L)
    val bySrc = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("web") == 1000L)
    assert(bySrc("books") > 350 && bySrc("books") < 650)
    assert(bySrc("code") == 400L)

    val strat = Mixing.stratified(
      docs(1000, "en").union(docs(1000, "de")), "source",
      Map("en" -> 0.1, "de" -> 0.9), seed = 11L)
    val byLang = strat.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") < byLang("de"))
    assert(byLang("en") > 30 && byLang("en") < 250)
    assert(byLang("de") > 750)
  }
}
