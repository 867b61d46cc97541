package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SimJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Brute-force truth: all-pairs exact Jaccard over the same shingle
    * construction the prefix join uses. */
  private def bruteForce(
      df: DataFrame, n: Int, t: Double): Set[(Long, Long, Double)] = {
    val docs = df
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("__t"))
      .select(col("doc_id"), array_distinct(Dedup.shingles(col("__t"), n)).as("sh"))
    val l = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("jacc", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jacc") >= t)
      .select(col("id_a"), col("id_b"), col("jacc"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
  }

  private def prefixJoin(
      df: DataFrame, n: Int, t: Double,
      positional: Boolean = true,
      suffixVerify: Boolean = true): Set[(Long, Long, Double)] =
    SimJoin.prefixJaccardJoin(df, "doc_id", "text", n, t,
        positional, suffixVerify)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet

  test("prefix join == brute force on real testdata (two thresholds)") {
    val docs = Tables.documents(spark, sf)
    for (t <- Seq(0.5, 0.3)) {
      val expected = bruteForce(docs, 3, t)
      val got = prefixJoin(docs, 3, t)
      assert(got == expected, s"threshold $t: mismatch")
      assert(expected.nonEmpty, s"threshold $t: vacuous test — no pairs")
    }
  }

  test("randomized parity: seeded corpora with planted overlap levels") {
    // Documents drawn from a small vocabulary so pair similarities
    // land densely around the thresholds — the regime where a
    // prefix-length off-by-one WOULD drop a boundary pair.
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'k').map(_.toString)
    val docs = (0 until 80).map { i =>
      val len = 4 + rnd.nextInt(8)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.8, 0.5, 0.34, 0.25))
      assert(prefixJoin(docs, 2, t) == bruteForce(docs, 2, t),
        s"threshold $t: prefix join diverged from brute force")
  }

  test("every filter/verify combination preserves brute-force parity") {
    // The flags trade pruning strength and verify shape, never
    // completeness: suffix verify alone (positional disabled), the
    // positional+accumulation path alone (relational verify), and
    // both off must all equal brute force on real testdata.
    val docs = Tables.documents(spark, sf)
    val expected = bruteForce(docs, 3, 0.3)
    assert(expected.nonEmpty, "vacuous test — no pairs at t=0.3")
    for (pos <- Seq(true, false); suf <- Seq(true, false))
      assert(prefixJoin(docs, 3, 0.3, pos, suf) == expected,
        s"positional=$pos suffixVerify=$suf diverged from brute force")
  }

  test("threshold 1.0 returns exactly the identical-shingle-set pairs") {
    val df = Seq(
      (1L, "x y z w"), (2L, "x y z w"), (3L, "x y z q"),
      (4L, "totally different text here")).toDF("doc_id", "text")
    val got = prefixJoin(df, 2, 1.0)
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("hotPrefixTokens reports boilerplate-concentrated prefix mass " +
      "and stays empty on diverse data") {
    val boiler = (0 until 50).map(i =>
      (i.toLong, "identical boilerplate text repeated across the corpus"))
      .toDF("doc_id", "text")
    val hot = SimJoin.hotPrefixTokens(
      boiler, "doc_id", "text", shingleN = 2, threshold = 0.5,
      maxPrefixDf = 10)
    assert(hot.collect().forall(_.getLong(1) == 50L))
    assert(hot.count() > 0, "identical docs must concentrate prefix mass")
    val diverse = Tables.documents(spark, sf)
    assert(SimJoin.hotPrefixTokens(
      diverse, "doc_id", "text", 3, 0.5, maxPrefixDf = 100).count() == 0)
  }

  test("plan: candidate generation is an equi-join — no cartesian/BNLJ") {
    val plan = SimJoin.prefixJaccardJoin(
        Tables.documents(spark, sf), "doc_id", "text", 3, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in plan:\n$plan")
  }
}
