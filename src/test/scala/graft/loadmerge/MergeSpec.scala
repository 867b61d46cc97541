package graft.loadmerge

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.loadmerge.Merge.MergeSpec

/** J1 merge semantics, mirroring the reference's live-Postgres
  * acceptance rows (util/loader/test_sql.py:416-1104): insert, update,
  * no-null-replacement, meta_data jsonb merge (incl. null-valued
  * keys), tag union / keep-on-null / replace-null, plus the
  * idempotence property merge(merge(T,S),S) == merge(T,S)
  * (SURVEY §7.4.7).
  */
class MergeJ1Spec extends SparkSpec {
  import spark.implicits._

  private val spec = MergeSpec(
    provider = "provider", foreignId = "fid",
    scalarCols = Seq("url", "width"),
    mapCols = Seq("meta"),
    arrayCols = Seq("tags"),
    createdOn = Some("created_on"), updatedOn = Some("updated_on"))

  private val now = lit("2024-06-01 00:00:00").cast("timestamp")
  private val t0 = lit("2024-01-01 00:00:00").cast("timestamp")

  private def df(rows: Seq[(String, String, String, Option[Int],
      Map[String, String], Seq[String])]) =
    rows.toDF("provider", "fid", "url", "width", "meta", "tags")
      .withColumn("created_on", t0)
      .withColumn("updated_on", t0)

  private def run(t: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.DataFrame) =
    Merge.upsertMerge(t, s, spec, now)
      .orderBy("provider", "fid")

  test("new rows insert, existing absent rows survive (test_sql.py:416,484)") {
    val t = df(Seq(("p", "a", "http://a", Some(10), Map("k" -> "v"), Seq("x"))))
    val s = df(Seq(("p", "b", "http://b", Some(20), Map.empty[String, String], Seq("y"))))
    val out = run(t, s).collect()
    assert(out.length == 2)
    val byFid = out.map(r => r.getAs[String]("fid") -> r).toMap
    assert(byFid("a").getAs[String]("url") == "http://a")
    assert(byFid("b").getAs[Int]("width") == 20)
    // insert gets created_on = now; untouched row keeps t0
    assert(byFid("b").getAs[java.sql.Timestamp]("created_on").toString
      .startsWith("2024-06-01"))
    assert(byFid("a").getAs[java.sql.Timestamp]("created_on").toString
      .startsWith("2024-01-01"))
  }

  test("matched rows replace data and stamp updated_on (test_sql.py:590)") {
    val t = df(Seq(("p", "a", "http://old", Some(10), Map("k" -> "v"), Seq("x"))))
    val s = df(Seq(("p", "a", "http://new", Some(99), Map("k" -> "v2"), Seq("x"))))
    val out = run(t, s).collect().head
    assert(out.getAs[String]("url") == "http://new")
    assert(out.getAs[Int]("width") == 99)
    assert(out.getAs[java.sql.Timestamp]("updated_on").toString.startsWith("2024-06-01"))
    assert(out.getAs[java.sql.Timestamp]("created_on").toString.startsWith("2024-01-01"))
  }

  test("nulls never replace data (test_sql.py:685)") {
    val t = df(Seq(("p", "a", "http://old", Some(10), Map("k" -> "v"), Seq("x"))))
    val s = t.withColumn("url", lit(null).cast("string"))
      .withColumn("width", lit(null).cast("int"))
    val out = run(t, s).collect().head
    assert(out.getAs[String]("url") == "http://old")
    assert(out.getAs[Int]("width") == 10)
  }

  test("meta_data merges per key, new wins, nulls ignored (test_sql.py:771,831)") {
    val t = df(Seq(("p", "a", "u", Some(1), Map("keep" -> "old", "both" -> "old"), Seq())))
    val s = t.withColumn("meta",
      map(lit("both"), lit("new"), lit("add"), lit("x"),
        lit("keep"), lit(null).cast("string")))
    val out = run(t, s).collect().head
    val m = out.getAs[Map[String, String]]("meta")
    assert(m == Map("keep" -> "old", "both" -> "new", "add" -> "x"))
  }

  test("tags union distinct; kept on null; replace null (test_sql.py:893,973,1040)") {
    val t = df(Seq(
      ("p", "union", "u", None, Map.empty[String, String], Seq("a", "b")),
      ("p", "keep", "u", None, Map.empty[String, String], Seq("a")),
      ("p", "fill", "u", None, Map.empty[String, String], null.asInstanceOf[Seq[String]])))
    val s = df(Seq(
      ("p", "union", "u", None, Map.empty[String, String], Seq("b", "c")),
      ("p", "keep", "u", None, Map.empty[String, String], null.asInstanceOf[Seq[String]]),
      ("p", "fill", "u", None, Map.empty[String, String], Seq("z"))))
    val out = run(t, s).collect()
    val tags = out.map(r =>
      r.getAs[String]("fid") -> r.getSeq[String](r.fieldIndex("tags")).toList).toMap
    assert(tags("union") == List("a", "b", "c")) // sorted canonical
    assert(tags("keep") == List("a"))
    assert(tags("fill") == List("z"))
  }

  test("idempotence: merge(merge(T,S),S) == merge(T,S) (SURVEY 7.4.7)") {
    val t = df(Seq(
      ("p", "a", "http://old", Some(10), Map("k" -> "v"), Seq("x", "y")),
      ("p", "b", "u2", None, Map.empty[String, String], Seq())))
    val s = df(Seq(
      ("p", "a", "http://new", None, Map("k2" -> "v2"), Seq("y", "z")),
      ("p", "c", "u3", Some(5), Map("m" -> "1"), Seq("t"))))
    val once = Merge.upsertMerge(t, s, spec, now)
    val twice = Merge.upsertMerge(once, s, spec, now)
    assert(twice.orderBy("fid").collect().toSeq ==
      once.orderBy("fid").collect().toSeq)
  }
}

/** D3 / P7 / J2 — the loader clean path. */
class MergeCleanSpec extends SparkSpec {
  import spark.implicits._

  test("dedupeLastWins keeps the last-loaded row per key (test_sql.py:393)") {
    val df = Seq(
      ("p", "a", 1L, "first"), ("p", "a", 2L, "second"),
      ("p", "b", 3L, "only")).toDF("provider", "fid", "ord", "v")
    val out = Merge.dedupeLastWins(df, "provider", "fid", "ord")
      .orderBy("fid").collect()
    assert(out.map(_.getAs[String]("v")).toSeq == Seq("second", "only"))
  }

  test("dropRequiredNull drops rows with any required null (test_sql.py:299-392)") {
    val df = Seq(
      (Some("u"), Some("l"), "keep"),
      (None, Some("l"), "drop1"),
      (Some("u"), None, "drop2")).toDF("url", "license", "v")
    val out = Merge.dropRequiredNull(df, Seq("url", "license")).collect()
    assert(out.map(_.getAs[String]("v")).toSeq == Seq("keep"))
  }

  test("overwriteUpdate replaces data, keeps dates, never inserts (test_sql.py:1105,1163)") {
    val t = Seq(("p", "a", "old", "2024-01-01"), ("p", "b", "keep", "2024-01-01"))
      .toDF("provider", "fid", "v", "dt")
    val s = Seq(("p", "a", "new", "2024-06-01"), ("p", "c", "ghost", "2024-06-01"))
      .toDF("provider", "fid", "v", "dt")
    val spec = MergeSpec("provider", "fid", scalarCols = Seq("v"),
      createdOn = Some("dt"))
    val out = Merge.overwriteUpdate(t, s, spec).orderBy("fid").collect()
    assert(out.length == 2) // no insert of "c"
    assert(out.map(r => (r.getAs[String]("fid"), r.getAs[String]("v"),
      r.getAs[String]("dt"))).toSeq ==
      Seq(("a", "new", "2024-01-01"), ("b", "keep", "2024-01-01")))
  }
}
