package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The scale generator backs PERF.md's measured 10x/100x datapoints,
  * so its linearity contract is itself pinned: copies must be
  * key-disjoint (counts and distinct counts scale exactly by the
  * factor) and DECORRELATED (copy 0 verbatim, other copies token-
  * salted so cross-copy near-dup structure doesn't explode
  * quadratically). */
class ScaleUpSpec extends SparkSpec {

  test("factor-2 fan-out: exact 2x rows, disjoint keys, copy 0 verbatim, " +
      "salted copies token-disjoint from the source") {
    val src = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("scaleup").toString
    ScaleUp.run(spark, src, out, 2, Set("documents", "embeddings"))

    val srcDocs = Tables.documents(spark, src)
    val outDocs = spark.read.parquet(s"$out/documents.parquet")
    val nSrc = srcDocs.count()
    assert(outDocs.count() == 2 * nSrc)
    // keys disjoint across copies: distinct ids also scale exactly
    assert(outDocs.select(countDistinct(col("doc_id"))).collect()(0)
      .getLong(0) == 2 * nSrc)

    // copy 0 (ids below the stride) is the source verbatim
    val stride = srcDocs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    val copy0 = outDocs.filter(col("doc_id") < stride)
      .select(col("doc_id"), col("text"))
    val diff = copy0.join(srcDocs.select(col("doc_id"), col("text")),
      Seq("doc_id", "text"), "left_anti").count()
    assert(diff == 0L, s"$diff copy-0 rows differ from the source")

    // salted copies share NO tokens with the source (bijective token
    // rename -> cross-copy Jaccard 0, the linearity guarantee)
    val srcToks = srcDocs
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
    val saltToks = outDocs.filter(col("doc_id") >= stride)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
    assert(saltToks.join(srcToks, Seq("tok")).count() == 0L)
    // and n_chars stays consistent with the rewritten text
    val badLen = outDocs.filter(col("doc_id") >= stride)
      .filter(col("n_chars") =!= length(col("text"))).count()
    assert(badLen == 0L)

    // embeddings: copy-0 vectors verbatim, flipped copies keep norms
    // (sign flips are isometries) but decorrelate
    val srcEmb = Tables.embeddings(spark, src)
    val outEmb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(outEmb.count() == 2 * srcEmb.count())
    val vStride = srcEmb.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L
    def norms(df: org.apache.spark.sql.DataFrame, shift: Long) = df
      .select((col("vec_id") - shift).as("vec_id"),
        round(sqrt(aggregate(col("embedding"),
          lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))), 4)
          .as("nrm"))
    val flipped = norms(outEmb.filter(col("vec_id") >= vStride), vStride)
    val orig = norms(srcEmb, 0L)
    assert(flipped.join(orig, Seq("vec_id", "nrm")).count() == srcEmb.count(),
      "sign-flipped copies must preserve every vector's norm")
  }

  test("clustered embedding mode: deterministic mixture-of-Gaussians " +
      "with real cluster structure (within-component cosines far above " +
      "cross-component), same schema and fan-out") {
    val src = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("scaleup_mog").toString
    ScaleUp.run(spark, src, out, 2, Set("embeddings"),
      embMode = "clustered:16")

    val srcEmb = Tables.embeddings(spark, src)
    val outEmb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(outEmb.count() == 2 * srcEmb.count())
    assert(outEmb.schema("embedding").dataType ==
      srcEmb.schema("embedding").dataType)

    // determinism: a second run is value-identical row for row
    val out2 = Files.createTempDirectory("scaleup_mog2").toString
    ScaleUp.run(spark, src, out2, 2, Set("embeddings"),
      embMode = "clustered:16")
    val again = spark.read.parquet(s"$out2/embeddings.parquet")
    assert(outEmb.join(again, Seq("vec_id", "embedding"), "left_anti")
      .count() == 0L, "clustered vectors must be deterministic in vec_id")

    // cluster structure: same-component pairs nearly parallel,
    // cross-component pairs near-orthogonal. Recompute the component
    // id the generator used (it is a pure function of vec_id).
    import graft.similarity.Similarity
    val withCid = outEmb.select(col("vec_id"),
      pmod(xxhash64(lit("mog_cid"), col("vec_id")), lit(16L)).as("cid"),
      col("embedding"))
    val sample = withCid.filter(col("vec_id") < 400)
    val pairs = sample.alias("l").join(sample.alias("r"),
        col("l.vec_id") < col("r.vec_id"))
      .select((col("l.cid") === col("r.cid")).as("same"),
        Similarity.cosine(col("l.embedding"), col("r.embedding")).as("cos"))
      .groupBy(col("same")).agg(avg(col("cos")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(pairs(true) > 0.7,
      s"within-component mean cosine ${pairs(true)} — no cluster structure")
    assert(math.abs(pairs(false)) < 0.2,
      s"cross-component mean cosine ${pairs(false)} — components correlate")
  }
}
