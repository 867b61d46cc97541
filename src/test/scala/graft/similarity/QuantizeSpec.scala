package graft.similarity

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def vectors(n: Int, seed: Long) = {
    val rnd = new Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("id", "vec")
  }

  test("codes stay in [-127, 127] and dequantization error is <= scale/2") {
    val qt = Quantize.int8(col("vec"))
    val rows = vectors(50, 1L)
      .select(col("id"), col("vec"), qt.getField("scale").as("scale"),
        qt.getField("q").as("q"))
      .collect()
    rows.foreach { r =>
      val vec = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val q = r.getSeq[Int](3)
      assert(q.forall(c => c >= -127 && c <= 127))
      vec.zip(q).foreach { case (x, c) =>
        assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-12,
          s"elem $x code $c scale $scale")
      }
    }
  }

  test("the all-zero vector quantizes to all-zero codes with scale 0") {
    val out = Seq((1L, Array.fill(dim)(0f))).toDF("id", "vec")
      .select(Quantize.int8(col("vec")).as("qt"))
      .select(col("qt.scale"), col("qt.q")).collect().head
    assert(out.getDouble(0) == 0.0)
    assert(out.getSeq[Int](1).forall(_ == 0))
  }

  test("cosine over reconstructed vectors tracks true cosine within 2%") {
    val base = vectors(40, 2L)
    val qt = Quantize.int8(col("vec"))
    val deq = base.select(col("id"),
      transform(col("vec"), x => x.cast("double")).as("v"),
      Quantize.dequantize(qt.getField("q"), qt.getField("scale")).as("dv"))
    val l = deq.select(col("id").as("ia"), col("v").as("va"), col("dv").as("da"))
    val r = deq.select(col("id").as("ib"), col("v").as("vb"), col("dv").as("db"))
    def cos(a: String, b: String) = {
      val dot = aggregate(zip_with(col(a), col(b), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      def nrm(c: String) = sqrt(aggregate(
        zip_with(col(c), col(c), (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
      dot / (nrm(a) * nrm(b))
    }
    val diffs = l.join(r, col("ia") < col("ib"))
      .select(abs(cos("va", "vb") - cos("da", "db")).as("err"))
      .agg(max(col("err"))).as[Double].collect().head
    assert(diffs < 0.02, s"max cosine drift $diffs")
  }

  test("intDot is exact symmetric integer math") {
    val df = Seq(
      (1L, Array(1f, -2f, 3f, 0f)),
      (2L, Array(-4f, 5f, -6f, 2f))).toDF("id", "vec")
      .select(col("id"), Quantize.int8(col("vec")).getField("q").as("q"))
    val a = df.filter(col("id") === 1).select(col("q").as("qa"))
    val b = df.filter(col("id") === 2).select(col("q").as("qb"))
    val fwd = a.crossJoin(b)
      .select(Quantize.intDot(col("qa"), col("qb"))).as[Long].collect().head
    val rev = a.crossJoin(b)
      .select(Quantize.intDot(col("qb"), col("qa"))).as[Long].collect().head
    assert(fwd == rev)
    // hand-check: q(1,-2,3,0) with scale 3/127 -> (42,-85,127,0);
    // q(-4,5,-6,2) with scale 6/127 -> (-85,106,-127,42)
    assert(fwd == 42L * -85 + -85L * 106 + 127L * -127 + 0L * 42)
  }
}
