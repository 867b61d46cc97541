package graft.io

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("range-clustered layout skips row groups a shuffled layout reads") {
    val n = 100000
    val tmp = Files.createTempDirectory("layout").toString
    // deterministic pseudo-shuffled key order (hash-ordered writes)
    val data = spark.range(n)
      .select(xxhash64(col("id")).as("h"), (col("id") % n).as("k"))
      .orderBy("h").select(col("k"), (col("k") * 2).as("v"))
    Layout.clusteredWrite(data, Seq(col("k")), numFiles = 20,
      path = s"$tmp/clustered")
    data.repartition(20).write.parquet(s"$tmp/shuffled")

    val pred = col("k") >= 1000 && col("k") < 6000 // ~5% of the range
    val clustered = rowsRead(spark.read.parquet(s"$tmp/clustered")
      .filter(pred))
    val shuffled = rowsRead(spark.read.parquet(s"$tmp/shuffled")
      .filter(pred))
    // shuffled: every file covers the whole key range -> no skipping;
    // clustered: only the file(s) whose range overlaps the predicate
    assert(shuffled.toDouble >= 0.9 * n, s"shuffled read $shuffled of $n")
    assert(clustered <= n / 5,
      s"clustered layout read $clustered rows; expected <= ${n / 5}")
  }

  test("zorderKey interleaves bits (a even, b odd)") {
    val out = Seq((1, 0), (0, 1), (1, 1), (2, 2), (5, 3))
      .toDF("a", "b")
      .select(Layout.zorderKey(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(5,3) = x bits {0,2} -> {0,4}; y bits {0,1} -> {1,3} = 1+16+2+8
    assert(out == Seq(1L, 2L, 3L, 12L, 27L))
  }

  test("N-dim zorderKey: 3-column round-robin interleave matches a " +
      "reference bit-walk, and the 2-col overload is the n=2 case") {
    def ref(vals: Seq[Long], bits: Int): Long = {
      val n = vals.size
      vals.zipWithIndex.map { case (v, j) =>
        (0 until bits).map(i => ((v >> i) & 1L) << (i * n + j))
          .reduce(_ | _)
      }.reduce(_ | _)
    }
    val rows = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (5L, 3L, 7L), (255L, 0L, 128L), (13L, 200L, 77L))
    val got = rows.toDF("a", "b", "c")
      .select(Layout.zorderKey(Seq(col("a"), col("b"), col("c")), bits = 8)
        .as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map { case (a, b, c) => ref(Seq(a, b, c), 8) })
    // unit vectors land on positions 0,1,2 — the round-robin base case
    assert(got.take(3) == Seq(1L, 2L, 4L))
    // 2-col overload == Seq form with n=2
    val two = Seq((5, 3)).toDF("a", "b")
      .select(Layout.zorderKey(col("a"), col("b")).as("z2"),
        Layout.zorderKey(Seq(col("a"), col("b")), bits = 21).as("zn"))
      .collect().head
    assert(two.getLong(0) == two.getLong(1))
    // bits*n must fit a signed long
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq(col("a"), col("b"), col("c")), bits = 22)
    }
  }

  test("z-order layout skips on BOTH dimensions; single-key sort only on its own") {
    val side = 256 // 64k rows over a side x side grid
    val tmp = Files.createTempDirectory("layout-z").toString
    val grid = spark.range(side.toLong * side)
      .select((col("id") % side).cast("int").as("x"),
        (col("id") / side).cast("int").as("y"))
    Layout.clusteredWrite(
      grid.withColumn("z", Layout.zorderKey(col("x"), col("y"), bits = 9)),
      Seq(col("z")), numFiles = 16, path = s"$tmp/zorder")
    Layout.clusteredWrite(grid, Seq(col("x")), numFiles = 16,
      path = s"$tmp/by_x")

    val n = side.toLong * side
    def frac(path: String, pred: org.apache.spark.sql.Column): Double =
      rowsRead(spark.read.parquet(s"$tmp/$path").filter(pred)).toDouble / n

    val xPred = col("x") < side / 16
    val yPred = col("y") < side / 16
    // x-sorted: prunes on x, reads ~everything for y
    assert(frac("by_x", xPred) <= 0.2, s"by_x/x ${frac("by_x", xPred)}")
    assert(frac("by_x", yPred) >= 0.9, s"by_x/y ${frac("by_x", yPred)}")
    // z-ordered: prunes on EITHER dimension
    assert(frac("zorder", xPred) <= 0.5, s"zorder/x ${frac("zorder", xPred)}")
    assert(frac("zorder", yPred) <= 0.5, s"zorder/y ${frac("zorder", yPred)}")
  }
}
