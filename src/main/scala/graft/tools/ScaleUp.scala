package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Scale-testing data generator: fans every fact table out `factor`x
  * with key-shifted copies, producing an sf(N*factor) directory from
  * an sf(N) one — the tool behind PERF.md's measured (not
  * extrapolated) scale datapoints.
  *
  * The copies are built so the WORK each operator family does scales
  * LINEARLY with the factor, i.e. the scaled directory behaves like
  * genuinely bigger data rather than like an adversarial duplicate
  * pile-up:
  *
  *  - Every key column shifts by copy x (max+1), so join
  *    fan-in/fan-out, group counts, and distinct cardinalities all
  *    scale by the factor — no key ever collides across copies.
  *    Foreign keys shift by the SAME stride as their dimension so
  *    referential joins stay 1:1 per copy.
  *  - `documents.text` gets a per-copy token salt (every token
  *    suffixed `~c<i>`; copy 0 is the verbatim original). A bijective
  *    token rename preserves each copy's internal Jaccard structure
  *    exactly, while cross-copy token sets are disjoint — so
  *    near-dup pair counts are factor x the source's, never
  *    factor^2 x (10 verbatim copies would put every doc in a
  *    10-deep duplicate cluster and quadratically inflate every
  *    pair-generator — measuring THAT is a skew test, not a scale
  *    test).
  *  - `embeddings.embedding` gets per-copy deterministic sign flips
  *    (element j of copy i flips iff hash(i, j) is odd; copy 0
  *    verbatim). Sign flips preserve norms and within-copy geometry
  *    applied uniformly, while cross-copy cosines decorrelate — ANN
  *    candidate volume scales with the factor.
  *  - Dimension tables `region`/`nation` copy through unchanged
  *    (fixed-size dims, exactly like TPC-H's).
  *
  * Single wide read per table: the copy index arrives by exploding a
  * literal 0..factor-1 array, so the source is scanned once and the
  * multiplication happens row-parallel, never on the driver.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <factor>
  *   [tables] [embMode]
  * `tables` is an optional comma-list (e.g. "documents,embeddings")
  * restricting which tables are written — the 100x corpus-only run
  * doesn't need to pay for 60M lineitem rows it will never read.
  *
  * `embMode` (default `flip`) picks the embeddings transform:
  *   - `flip`: the sign-flip decorrelation above — preserves the
  *     SOURCE distribution, which for the synthetic fixtures is
  *     near-isotropic: every direction equally likely, no cluster
  *     structure. That is PQ/IVF's WORST case (subspace codebooks and
  *     coarse cells both exploit clustering), so recall measured on
  *     it is a lower bound.
  *   - `clustered[:k[:sigma]]`: a deterministic mixture-of-Gaussians
  *     REPLACEMENT for the vector values (ids/row counts still fan
  *     out exactly as above): each scaled vec_id hashes to one of `k`
  *     mixture components (default 2048); component centers and
  *     per-vector noise are hash-seeded Irwin-Hall gaussians, noise
  *     scale `sigma` (default 0.25), so the corpus has the cluster
  *     structure real embedding models produce. Fully deterministic
  *     in vec_id alone — re-runs and different partitionings produce
  *     byte-identical vectors — and copies stay decorrelated because
  *     disjoint shifted ids draw disjoint hash streams. The
  *     representative regime for IVF-PQ recall curves (PERF.md
  *     carries both). SIZE k TO THE CORPUS: expected cluster
  *     population is N/k, and a top-k' search's candidates must
  *     cover it (recall collapses to ~candidates/population when a
  *     cluster dwarfs the candidate budget — measured, see PERF.md's
  *     k=64 mega-cluster row). N/k ~ 100 is the representative
  *     real-corpus granularity.
  */
object ScaleUp {

  /** Explode a 0..n-1 copy index onto every row, spreading the
    * source first. Shuffle the SOURCE, never the product: the pre-r15 shape
    * repartitioned AFTER the explode, moving factor x the source rows
    * through one shuffle — at factor 1000 the lineitem run had
    * spilled 29+ GB of shuffle (heading past the disk) before the
    * write could begin. Spreading the source FIRST buys the same
    * write parallelism for 1/factor the shuffle: each task explodes
    * its slice locally and streams straight to parquet, so the
    * scaled data is never shuffled at all — the generator now obeys
    * the same rule it exists to test operators against. */
  private def fanOut(df: DataFrame, n: Int): DataFrame = {
    val parts = math.max(
      df.sparkSession.sparkContext.defaultParallelism, n)
    df.repartition(parts)
      .withColumn("__i", explode(array((0 until n).map(lit): _*)))
  }

  /** key + copy x stride, preserving the column's position/name */
  private def shifted(keyCol: String, stride: Long): Column =
    col(keyCol) + col("__i") * lit(stride)

  /** Hash-seeded uniform in (0, 1), deterministic in its inputs. */
  private def unif(cols: Column*): Column =
    (pmod(xxhash64(cols: _*), lit(1000003L)).cast("double") + 0.5) / 1000003.0

  /** Hash-seeded approximate N(0,1): Irwin-Hall sum of 4 uniforms,
    * centered and scaled to unit variance (var of the sum is 1/3).
    * Plenty gaussian for benchmark geometry; exactly reproducible in
    * any engine with xxhash64. */
  private def gauss(tag: String, a: Column, b: Column): Column =
    ((1 to 4).map(s => unif(lit(tag), a, b, lit(s))).reduce(_ + _) - lit(2.0)) *
      lit(math.sqrt(3.0))

  /** Mixture-of-Gaussians embedding, deterministic in the (already
    * shifted) id: component = hash(id) mod k, value_j = center[c][j]
    * + sigma * noise[id][j]. Row-parallel column expressions — no
    * driver-side vectors, no RNG state. */
  private[tools] def clusteredVec(
      id: Column, dims: Column, k: Int, sigma: Double): Column = {
    val cid = pmod(xxhash64(lit("mog_cid"), id), lit(k.toLong))
    transform(dims, (_, j) =>
      (gauss("mog_ctr", cid, j) + lit(sigma) * gauss("mog_nz", id, j))
        .cast("float"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3 && args.length <= 5,
      "usage: ScaleUp <srcDir> <outDir> <factor> [tables] " +
        "[flip|clustered[:k[:sigma]]]")
    val only: Set[String] =
      if (args.length >= 4 && args(3).nonEmpty)
        args(3).split(",").map(_.trim).toSet
      else Set.empty
    val embMode = if (args.length >= 5) args(4) else "flip"
    val spark = Sessions.local("graft-scaleup")
    run(spark, args(0), args(1), args(2).toInt, only, embMode)
    spark.stop()
  }

  /** Library entry point — does NOT own the session (main stops the
    * one it builds; tests pass their shared session). */
  def run(spark: org.apache.spark.sql.SparkSession, src: String, out: String,
      n: Int, only: Set[String] = Set.empty,
      embMode: String = "flip"): Unit = {
    require(n >= 1, s"factor must be >= 1, got $n")
    val (embKind, mogK, mogSigma) = embMode.split(":") match {
      case Array("flip") => ("flip", 0, 0.0)
      case Array("clustered") => ("clustered", 2048, 0.25)
      case Array("clustered", k) => ("clustered", k.toInt, 0.25)
      case Array("clustered", k, s) => ("clustered", k.toInt, s.toDouble)
      case _ => sys.error(
        s"embMode must be flip or clustered[:k[:sigma]], got '$embMode'")
    }
    require(embKind == "flip" || mogK >= 1, s"clustered k must be >= 1")
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val unknown = only -- known
    require(unknown.isEmpty,
      s"unknown tables ${unknown.mkString(",")}; known: ${known.mkString(",")}")
    def wanted(name: String): Boolean = only.isEmpty || only(name)

    // One stride per key FAMILY (not per table): l_orderkey and
    // o_orderkey must shift identically or the lineitem-orders join
    // breaks across copies. max+1 from the source keeps copies
    // disjoint with no magic constants.
    def stride(df: DataFrame, c: String): Long = {
      val row = df.agg(max(col(c))).collect()(0)
      require(!row.isNullAt(0),
        s"source table has no rows for key $c — nothing to scale")
      row.getLong(0) + 1L
    }

    def write(name: String, df: => DataFrame): Unit = if (wanted(name)) {
      // no repartition here: fanOut already spread the SOURCE, so the
      // exploded frame writes with that parallelism and the scaled
      // rows never shuffle (dims are tiny and write as-is)
      df.drop("__i")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> $out/$name.parquet")
    }

    // dims copy through unchanged and need no strides — writable with
    // ANY subset (including a dims-only run)
    write("region", Tables.region(spark, src))
    write("nation", Tables.nation(spark, src))

    val relational =
      Seq("customer", "supplier", "part", "orders", "lineitem").exists(wanted)
    if (relational) {
      val orders = Tables.orders(spark, src)
      val customer = Tables.customer(spark, src)
      val part = Tables.part(spark, src)
      val supplier = Tables.supplier(spark, src)
      val sOrder = stride(orders, "o_orderkey")
      val sCust = stride(customer, "c_custkey")
      val sPart = stride(part, "p_partkey")
      val sSupp = stride(supplier, "s_suppkey")
      write("customer", fanOut(customer, n)
        .withColumn("c_custkey", shifted("c_custkey", sCust)))
      write("supplier", fanOut(supplier, n)
        .withColumn("s_suppkey", shifted("s_suppkey", sSupp)))
      write("part", fanOut(part, n)
        .withColumn("p_partkey", shifted("p_partkey", sPart)))
      write("orders", fanOut(orders, n)
        .withColumn("o_orderkey", shifted("o_orderkey", sOrder))
        .withColumn("o_custkey", shifted("o_custkey", sCust)))
      write("lineitem", fanOut(Tables.lineitem(spark, src), n)
        .withColumn("l_orderkey", shifted("l_orderkey", sOrder))
        .withColumn("l_partkey", shifted("l_partkey", sPart))
        .withColumn("l_suppkey", shifted("l_suppkey", sSupp)))
    }

    if (wanted("events")) {
      val events = Tables.events(spark, src)
      val sEvent = stride(events, "event_id")
      val sUser = stride(events, "user_id")
      write("events", fanOut(events, n)
        .withColumn("event_id", shifted("event_id", sEvent))
        .withColumn("user_id", shifted("user_id", sUser)))
    }

    if (wanted("documents")) {
      val docs = Tables.documents(spark, src)
      val sDoc = stride(docs, "doc_id")
      val salted = regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1~c"), col("__i").cast("string")))
      write("documents", fanOut(docs, n)
        .withColumn("doc_id", shifted("doc_id", sDoc))
        .withColumn("text",
          when(col("__i") === 0, col("text")).otherwise(salted))
        .withColumn("n_chars",
          when(col("__i") === 0, col("n_chars"))
            .otherwise(length(col("text")).cast("long"))))
    }

    if (wanted("embeddings")) {
      val emb = Tables.embeddings(spark, src)
      val sVec = stride(emb, "vec_id")
      val flipped = transform(col("embedding"), (x, j) =>
        (x * (lit(1) - lit(2) * pmod(hash(col("__i"), j), lit(2))))
          .cast("float"))
      val fanned = fanOut(emb, n)
        .withColumn("vec_id", shifted("vec_id", sVec))
      val scaledEmb = embKind match {
        case "flip" => fanned.withColumn("embedding",
          when(col("__i") === 0, col("embedding")).otherwise(flipped))
        case "clustered" => fanned.withColumn("embedding",
          clusteredVec(col("vec_id"), col("embedding"),
            k = mogK, sigma = mogSigma))
      }
      write("embeddings", scaledEmb)
    }
  }
}
