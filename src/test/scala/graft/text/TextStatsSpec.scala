package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("token counts") {
    assert(one[Int](TextStats.tokenCount(col("t")), "a b  c") == 3)
    // [hello][,][world][4][2] — letter runs, punctuation, single digits
    assert(one[Int](TextStats.bpeishTokenCount(col("t")), "hello, world 42") == 5)
  }

  test("stopword ratio and mean token length") {
    assert(one[Double](TextStats.stopwordRatio(col("t")), "the cat and dog") == 0.5)
    assert(one[Double](TextStats.meanTokenLen(col("t")), "ab cdef") == 3.0)
  }

  test("langId picks the language with most stopword hits") {
    assert(one[String](TextStats.langId(col("t")),
      "the cat and the dog of the house") == "en")
    assert(one[String](TextStats.langId(col("t")),
      "el perro y la casa de los gatos") == "es")
    assert(one[String](TextStats.langId(col("t")),
      "der hund und die katze ist nicht da") == "de")
    assert(one[String](TextStats.langId(col("t")),
      "xyzzy plugh qwerty") == "und")
  }

  test("fingerprint is order- and duplicate-insensitive") {
    val a = one[String](TextStats.fingerprint(col("t")), "b a c a")
    val b = one[String](TextStats.fingerprint(col("t")), "c b a")
    assert(a == b)
  }

  test("quality score stays in [0,1] and prefers real prose over symbol soup") {
    val prose = one[Double](TextStats.qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog and runs into the field " * 5)
    val soup = one[Double](TextStats.qualityScore(col("t")), "@#$ %^& *() !!")
    assert(prose > soup)
    assert(prose >= 0 && prose <= 1 && soup >= 0 && soup <= 1)
  }
}
