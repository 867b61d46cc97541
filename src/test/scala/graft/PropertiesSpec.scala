package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.license.Licenses

/** Property tests for the pure kernels (SURVEY §5 plan):
  * sanitizer idempotence, license map round-trips, merge algebra.
  * Plain ScalaCheck Gens sampled with fixed seeds (deterministic,
  * no scalatestplus bridge needed).
  */
class PropertiesSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("license reverse map round-trips: pair -> url -> same license") {
    Licenses.reverseLicensePathMap.foreach { case ((lic, ver), path) =>
      val url = Licenses.buildLicenseUrl(path)
      val (l, v, _) = Licenses.getLicenseInfo(url, null, null)
      assert(l.contains(lic), s"($lic,$ver) -> $url -> $l")
      if (ver != "2.1") assert(v.isDefined)
    }
  }

  test("ensureVersionString is idempotent on its own output") {
    samples(Gen.chooseNum(0.5, 9.9), 100).foreach { d =>
      val once = Licenses.ensureVersionString(d.toString)
      assert(once.isDefined)
      assert(Licenses.ensureVersionString(once.get) == once, s"input=$d")
    }
  }

  test("validCcUrl output is a fixpoint of validCcUrl") {
    val urls = Seq(
      "https://creativecommons.org/licenses/by/4.0/",
      "HTTP://CREATIVECOMMONS.ORG/licenses/by-sa/3.0",
      "creativecommons.org/publicdomain/zero/1.0///",
      "https://example.com/licenses/by/4.0/")
    urls.foreach { u =>
      Licenses.validCcUrl(u).foreach { v =>
        assert(Licenses.validCcUrl(v) == Some(v), s"input=$u")
      }
    }
  }
}

/** Column-kernel properties sampled through Spark. */
class SparkPropertiesSpec extends SparkSpec {
  import spark.implicits._
  import graft.clean.Cleaning
  import graft.loadmerge.Merge

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def sanitizeBatch(xs: Seq[String]): Seq[String] =
    xs.toDF("v").select(Cleaning.sanitizeString(col("v")).as("r"))
      .collect().map(_.getString(0)).toSeq

  test("sanitizer is idempotent on backslash-free input") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.const("a \t b\n c"), Gen.const("""a "quoted" phrase"""),
      Gen.const("  edge  "), Gen.const(""),
      Gen.listOfN(8, Gen.oneOf('a', ' ', '"', '\t', '\b')).map(_.mkString))
    val inputs = samples(gen, 200)
    val once = sanitizeBatch(inputs)
    val twice = sanitizeBatch(once)
    once.zip(twice).zip(inputs).foreach { case ((o, t), in) =>
      assert(t == o, s"input=${in.map(_.toInt)}")
    }
  }

  test("sanitizer doubles backslashes on every pass (reference parity, columns.py:30-42)") {
    // the reference's sanitize_string is deliberately escape-on-write:
    // re-sanitizing escaped output escapes again, so it must run
    // exactly once per ingest (the pipelines guarantee that); this
    // pins the behavior rather than pretending idempotence
    val out = sanitizeBatch(Seq("""a\b"""))
    assert(out.head == """a\\b""")
    assert(sanitizeBatch(out).head == """a\\\\b""")
  }

  test("tags merge is idempotent and commutative up to canonical order") {
    val arrGen = Gen.listOfN(5, Gen.oneOf("a", "b", "c", "d", "e"))
    val pairs = samples(Gen.zip(arrGen, arrGen), 60)
    val df = pairs.toDF("a", "b")
    val ab = df.select(Merge.mergeJsonbArrays(col("a"), col("b")).as("m"))
      .collect().map(_.getSeq[String](0).toList).toSeq
    val ba = df.select(Merge.mergeJsonbArrays(col("b"), col("a")).as("m"))
      .collect().map(_.getSeq[String](0).toList).toSeq
    val abAgain = df.select(Merge.mergeJsonbArrays(
        Merge.mergeJsonbArrays(col("a"), col("b")), col("b")).as("m"))
      .collect().map(_.getSeq[String](0).toList).toSeq
    assert(ab == ba) // commutative (canonical sorted form)
    assert(abAgain == ab) // idempotent under re-merge
  }

  test("meta merge: new wins, old survives new-nulls, for arbitrary key sets") {
    val kvGen = Gen.mapOfN(4, Gen.zip(Gen.oneOf("k1", "k2", "k3", "k4"),
      Gen.option(Gen.alphaNumStr.map(_.take(5)))))
    val pairs = samples(Gen.zip(kvGen, kvGen), 50)
    pairs.foreach { case (o, n) =>
      val df = Seq((o, n)).toDF("o", "n")
      // reference model: strip nulls both sides, new wins per key
      val expect = (o.collect { case (k, Some(v)) => k -> v } ++
        n.collect { case (k, Some(v)) => k -> v }).toMap
      val got = df.select(Merge.mergeJsonbObjects(col("o"), col("n")).as("m"))
        .collect().head.getAs[Map[String, String]]("m")
      assert(got == expect, s"old=$o new=$n")
    }
  }

  test("star-contraction connected components equals union-find on " +
      "random sparse graphs of every shape ScalaCheck throws at it") {
    // adversarial shapes beyond DedupSpec's planted fixtures: random
    // edge soups over a small id space, so high-degree hubs, cycles,
    // multi-edges, self-loops, and reversed duplicates all occur
    val edgeGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 39L), Gen.chooseNum(0L, 39L)))
    samples(edgeGen, 12).zipWithIndex.foreach { case (edges, i) =>
      val pairs = edges.toDF("id_a", "id_b")
      val expect = TestOracles.unionFind(edges)
      val got = graft.dedup.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"sample $i: ${edges.take(8)}...")
    }
  }
}
