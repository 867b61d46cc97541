package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Redaction.redactPii(col("t")).as("r"))
      .collect().head.getString(0)

  test("redactPii masks emails, IPv4 addresses, and long digit runs, " +
      "and leaves clean prose alone") {
    assert(redact("mail a.b+tag@ex-ample.co.uk now") == "mail <EMAIL> now")
    assert(redact("host 192.168.0.1 up") == "host <IP> up")
    assert(redact("call 415-555-0199 today") == "call <NUMBER> today")
    assert(redact("card 4111 1111 1111 1111 end") == "card <NUMBER> end")
    // short numbers and versions survive
    assert(redact("version 4.1 build 42") == "version 4.1 build 42")
    assert(redact("plain words only here") == "plain words only here")
    // all three classes in one text
    assert(redact("x a@b.io 1.2.3.4 123456789 y") ==
      "x <EMAIL> <IP> <NUMBER> y")
  }

  test("content-hash split is deterministic, partition-independent, " +
      "and roughly proportional") {
    val ids = (1 to 2000).map(_.toLong).toDF("id")
    val a = ids.select(col("id"), graft.mix.Splits.assign(col("id"), 100).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = ids.repartition(13)
      .select(col("id"), graft.mix.Splits.assign(col("id"), 100).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val nValid = a.values.count(_ == "valid")
    assert(nValid > 140 && nValid < 260, s"valid count $nValid")
  }
}
