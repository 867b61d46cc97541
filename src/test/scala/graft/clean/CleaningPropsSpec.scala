package graft.clean

import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the cleaning kernel: a fixed-seed sample of
  * adversarial generated inputs is evaluated in ONE DataFrame pass
  * per property (hundreds of tiny Spark jobs would dominate runtime),
  * and every row is checked against the independent Scala-side
  * definition of the semantics. */
class CleaningPropsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): List[T] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  // arbitrary strings + targeted nasties: quotes, backslashes,
  // backspaces, every whitespace flavor, control chars at the edges.
  // Lone surrogates are filtered out: Spark stores UTF-8, so an
  // unpaired surrogate is mangled at ingestion — not a sanitize
  // semantic.
  private val nastyChars =
    Gen.oneOf('"', '\\', '\b', ' ', '\t', '\n', '\r', '\f',
      '\u0001', '\u000b', '\u00a0', 'a', 'Z', '9', 'é', '中')
  private val nastyString =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, nastyChars).map(_.mkString))
  private val anyString =
    Gen.oneOf(Arbitrary.arbitrary[String], nastyString)
      .map(_.filterNot(_.isSurrogate))

  test("sanitizeString (Column) agrees with sanitizeStringScala on " +
      "arbitrary and adversarial strings") {
    val inputs = sample(anyString, 600)
    val got = inputs.toDF("s")
      .select(col("s"), Cleaning.sanitizeString(col("s")).as("c"))
      .collect().map(r => Option(r.getString(0)) -> Option(r.getString(1)))
    got.foreach { case (in, out) =>
      val want = Option(Cleaning.sanitizeStringScala(in.orNull))
      assert(out == want, s"input ${in.map(_.map(_.toInt.toHexString))}")
    }
  }

  test("intCast never wraps: every non-null result equals the " +
      "truncated-toward-zero double when it fits in int range") {
    val nums: Gen[String] = Gen.oneOf(
      Arbitrary.arbitrary[Long].map(_.toString),
      Arbitrary.arbitrary[Double].map(_.toString),
      Gen.oneOf("Infinity", "-Infinity", "NaN", "junk", "", "12.9xyz",
        "3e9", "-3e9", "2147483647", "2147483648", "-2147483648",
        "-2147483649", "1e308"))
    val inputs = sample(nums, 600)
    val got = inputs.toDF("s")
      .select(col("s"), Cleaning.intCast(col("s")).as("i"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1))))
    got.foreach { case (in, out) =>
      val d = try Some(in.toDouble) catch { case _: Throwable => None }
      val want = d match {
        case Some(v) if !v.isNaN && v <= Int.MaxValue.toDouble &&
            v >= Int.MinValue.toDouble => Some(v.toLong.toInt)
        case _ => None
      }
      assert(out == want, s"input '$in': got $out want $want")
    }
  }

  test("enforceCharLimit: truncating never exceeds the limit, " +
      "non-truncating is all-or-null") {
    val inputs = sample(anyString, 400)
    val got = inputs.toDF("s").select(col("s"),
        Cleaning.enforceCharLimit(col("s"), 10, truncate = true).as("t"),
        Cleaning.enforceCharLimit(col("s"), 10, truncate = false).as("n"))
      .collect()
    got.foreach { r =>
      val in = Option(r.getString(0))
      val t = Option(r.getString(1))
      val n = Option(r.getString(2))
      in.foreach { s =>
        assert(t.exists(_.length <= 10))
        if (s.length <= 10) assert(t.contains(s) && n.contains(s))
        else assert(n.isEmpty)
      }
    }
  }

  test("boolCast range is exactly {t, f, null}") {
    val inputs = sample(anyString, 300) ++
      List("true", "True", "t", "T", "false", "False", "f", "F", "TRUE", "1")
    val got = inputs.toDF("s")
      .select(col("s"), Cleaning.boolCast(col("s")).as("b")).collect()
    got.foreach { r =>
      val in = r.getString(0)
      val out = Option(r.getString(1))
      val want =
        if (Set("true", "True", "t", "T").contains(in)) Some("t")
        else if (Set("false", "False", "f", "F").contains(in)) Some("f")
        else None
      assert(out == want, s"input '$in'")
    }
  }
}
