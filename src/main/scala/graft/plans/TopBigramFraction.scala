package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native most-frequent-bigram mass (the Gopher-style repetition
  * signal, TextStats.topBigramFraction).
  *
  * The composable form (`transform` + `array_sort` + `aggregate` over
  * a per-row gram array) is row-local and shuffle-free but walks
  * interpreted higher-order expressions per element — 15% of the whole
  * bench suite in one kernel (VERDICT r3). This Expression fuses the
  * whole computation into one compiled pass per row: tokens are
  * interned to ints, each bigram becomes one long, and the top count
  * is a sort + longest-run scan over a primitive long[] — no boxed
  * collections, no expression-tree interpretation, still zero shuffle.
  *
  * Semantics are identical to the Column form: tokenization is
  * split(trim(text), "\\s+") (UTF8String.trim = ASCII-space ends,
  * java regex split with limit -1 — exactly Spark's StringSplit), a
  * sub-2-token text collapses to one whole-text gram -> 1.0, null in
  * -> null out.
  */
case class TopBigramFraction(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_bigram_frac expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_bigram_frac"

  override protected def nullSafeEval(input: Any): Any =
    TopBigramFraction.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TopBigramFraction.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TopBigramFraction =
    copy(child = newChild)
}

object TopBigramFraction {

  // \s+ with limit -1: bit-compatible with Spark's split(col, "\\s+")
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** One row: top-bigram count / total bigrams. Public static so the
    * generated code calls it directly (stays inside
    * WholeStageCodegen — one invokestatic per row). */
  def compute(s: UTF8String): Double = {
    // UTF8String.trim removes ASCII spaces from both ends — same as
    // Spark's trim(col) default
    val toks = Whitespace.split(s.trim.toString, -1)
    val n = toks.length
    if (n < 2) return 1.0
    // intern tokens to dense ints, encode each bigram as one long
    val ids = new java.util.HashMap[String, Integer](n * 2)
    def idOf(t: String): Int = {
      val got = ids.get(t)
      if (got != null) got.intValue()
      else { val id = ids.size(); ids.put(t, id); id }
    }
    val grams = new Array[Long](n - 1)
    var prev = idOf(toks(0))
    var i = 1
    while (i < n) {
      val cur = idOf(toks(i))
      grams(i - 1) = (prev.toLong << 32) | (cur.toLong & 0xffffffffL)
      prev = cur
      i += 1
    }
    java.util.Arrays.sort(grams)
    var best = 1
    var run = 1
    i = 1
    while (i < grams.length) {
      if (grams(i) == grams(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best.toDouble / (n - 1).toDouble
  }

  /** Column-DSL handle (registered in GraftExtensions). */
  def apply(text: Column): Column =
    org.apache.spark.sql.functions.call_function("top_bigram_frac", text)
}
