package graft.clean

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cleaning-kernel table tests, ported from the reference's
  * common/storage/test_columns.py (335 lines) semantics. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def sanitize(s: String): String =
    Seq(Option(s)).toDF("v")
      .select(Cleaning.sanitizeString(col("v")).as("r"))
      .collect().head.getAs[String]("r")

  test("sanitize: double quotes become single quotes") {
    assert(sanitize("""I said "hi"""") == "I said 'hi'")
  }

  test("sanitize: backspace chars dropped") {
    assert(sanitize("a\bb") == "ab")
  }

  test("sanitize: backslashes escaped") {
    assert(sanitize("""a\b""") == """a\\b""")
  }

  test("sanitize: whitespace runs collapse and ends trim") {
    assert(sanitize("  a \t\n b   c  ") == "a b c")
  }

  test("sanitize: null passes through") {
    val r = Seq(Option.empty[String]).toDF("v")
      .select(Cleaning.sanitizeString(col("v")).as("r")).collect().head
    assert(r.isNullAt(0))
  }

  test("nested-JSON sanitize: leaf strings inside nested objects and " +
      "arrays are sanitized (columns.py:131-173)") {
    val in = """{"a":"say \"hi\"","deep":{"b":"x\\y","arr":["  p  q ","c\bd"]},""" +
      """"n":7,"t":true,"z":null}"""
    val out = Cleaning.sanitizeJsonValuesScala(in)
    // every leaf: quotes swapped, backslash doubled, backspace gone,
    // whitespace collapsed; numbers/booleans/null untouched
    assert(out.contains(""""a":"say 'hi'""""))
    assert(out.contains(""""b":"x\\\\y"""")) // raw x\y -> x\\y, JSON-escaped
    assert(out.contains(""""arr":["p q","cd"]"""))
    assert(out.contains(""""n":7"""))
    assert(out.contains(""""t":true"""))
    assert(out.contains(""""z":null"""))
  }

  test("nested-JSON sanitize: depth cap stops recursion; non-JSON input " +
      "degrades to a sanitized string; null passes through") {
    // depth 1: top-level leaves sanitized, deeper subtree untouched
    val in = """{"top":"has \"q\"","deep":{"inner":"keep \"q\""}}"""
    val shallow = Cleaning.sanitizeJsonValuesScala(in, maxDepth = 1)
    assert(shallow.contains(""""top":"has 'q'""""))
    assert(shallow.contains("""keep \"q\"""")) // beyond the cap: untouched
    assert(Cleaning.sanitizeJsonValuesScala("""not  "json""") == "not 'json")
    assert(Cleaning.sanitizeJsonValuesScala(null) == null)
    // the Column form matches the Scala form
    val viaCol = Seq("""{"k":"a  \"b\""}""").toDF("j")
      .select(Cleaning.sanitizeJsonString(col("j")).as("r"))
      .collect().head.getString(0)
    assert(viaCol == """{"k":"a 'b'"}""")
  }

  test("char limit: truncate vs null-out (test_columns.py limits)") {
    val df = Seq("abcdef").toDF("v")
    assert(df.select(Cleaning.enforceCharLimit(col("v"), 3, truncate = true))
      .collect().head.getString(0) == "abc")
    assert(df.select(Cleaning.enforceCharLimit(col("v"), 3, truncate = false))
      .collect().head.isNullAt(0))
    assert(df.select(Cleaning.enforceCharLimit(col("v"), 10, truncate = false))
      .collect().head.getString(0) == "abcdef")
  }

  test("int cast: best-int-approximation, truncating toward zero") {
    val cases = Seq(
      "10" -> Some(10), "10.9" -> Some(10), "-10.9" -> Some(-10),
      "3.5e2" -> Some(350), "abc" -> None, "" -> None)
    cases.foreach { case (in, want) =>
      val r = Seq(in).toDF("v").select(Cleaning.intCast(col("v"))).collect().head
      assert((if (r.isNullAt(0)) None else Some(r.getInt(0))) == want, s"input=$in")
    }
  }

  test("bool cast: postgres t/f mapping (columns.py:99-118)") {
    val cases = Seq(
      "true" -> Some("t"), "True" -> Some("t"), "t" -> Some("t"), "T" -> Some("t"),
      "false" -> Some("f"), "False" -> Some("f"), "f" -> Some("f"), "F" -> Some("f"),
      "yes" -> None, "TRUE" -> None, "1" -> None)
    cases.foreach { case (in, want) =>
      val r = Seq(in).toDF("v").select(Cleaning.boolCast(col("v"))).collect().head
      assert((if (r.isNullAt(0)) None else Some(r.getString(0))) == want, s"input=$in")
    }
  }

  test("URL column: sanitize-changed input nulls out; valid URL passes (columns.py:225-243)") {
    val cases = Seq(
      "https://example.com/a" -> Some("https://example.com/a"),
      "https://example.com/a b" -> None, // whitespace collapse changes it
      "notaurl" -> None,
      "https://10.0.0.1/x" -> Some("https://10.0.0.1/x"))
    cases.foreach { case (in, want) =>
      val r = Seq(in).toDF("v")
        .select(Cleaning.prepareUrl(col("v"), 1000)).collect().head
      assert((if (r.isNullAt(0)) None else Some(r.getString(0))) == want, s"input=$in")
    }
  }

  test("JSON sanitize: leaf strings cleaned recursively, empties null out (columns.py:131-173)") {
    val m = Seq(Map("k" -> "a  \"b\"", "k2" -> "ok")).toDF("m")
      .select(Cleaning.sanitizeJsonMap(col("m"))).collect().head
      .getAs[Map[String, String]](0)
    assert(m == Map("k" -> "a 'b'", "k2" -> "ok"))
    val empty = Seq(Map.empty[String, String]).toDF("m")
      .select(Cleaning.sanitizeJsonMap(col("m"))).collect().head
    assert(empty.isNullAt(0))
    val arr = Seq(Seq("x\ty", "z")).toDF("a")
      .select(Cleaning.sanitizeJsonArray(col("a"))).collect().head
      .getSeq[String](0)
    assert(arr.toList == List("x y", "z"))
  }

  test("add_url_scheme strips existing scheme and trailing slash (urls.py:80-95)") {
    val cases = Seq(
      "example.com/x/" -> "https://example.com/x",
      "http://example.com" -> "https://example.com",
      "https://example.com/" -> "https://example.com")
    cases.foreach { case (in, want) =>
      val r = Seq(in).toDF("v").select(Urls.addUrlScheme(col("v"))).collect().head
      assert(r.getString(0) == want, s"input=$in")
    }
  }
}
