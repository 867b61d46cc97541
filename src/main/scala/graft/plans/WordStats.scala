package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row word statistics: token count, summed token length,
  * distinct-token count, default-stopword occurrence count, and
  * per-language stopword hits — ONE compiled pass over the token
  * array instead of five interpreted higher-order expressions
  * (filter/aggregate/array_distinct each re-walk the array, and Spark
  * evaluates them interpreted per element).
  *
  * Tokenization is bit-compatible with split(trim(text), "\\s+")
  * (same contract as [[TopBigramFraction]]); lengths count CODE
  * POINTS, matching Spark's length() on UTF8String. Several fields of
  * one WordStats(text) in a projection cost one evaluation — codegen
  * subexpression elimination collapses the duplicates.
  *
  * The stopword sets are the fixed public lists in
  * graft.text.TextStats (the only lists the engine's queries use);
  * custom lists keep the composable Column form.
  */
case class WordStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_stats expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = WordStats.schema
  override def prettyName: String = "word_stats"

  override protected def nullSafeEval(input: Any): Any =
    WordStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WordStats =
    copy(child = newChild)
}

object WordStats {

  val schema: StructType = StructType.fromDDL(
    """n_tokens INT, sum_len BIGINT, n_distinct INT, stop_hits INT,
      |hits_de INT, hits_en INT, hits_es INT, hits_fr INT""".stripMargin
      .replace("\n", " "))

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  private def jset(words: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(s.add)
    s
  }
  // fixed public lists — must stay in sync with graft.text.TextStats
  private val stop = jset(graft.text.TextStats.defaultStopwords)
  private val langs: Array[(String, java.util.HashSet[String])] =
    graft.text.TextStats.langStopwords.toArray.sortBy(_._1)
      .map { case (l, ws) => (l, jset(ws)) }

  /** One row -> InternalRow(n_tokens, sum_len, n_distinct, stop_hits,
    * hits_de, hits_en, hits_es, hits_fr). Public static so generated
    * code calls it directly. */
  def compute(s: UTF8String): InternalRow = {
    val toks = Whitespace.split(s.trim.toString, -1)
    val seen = new java.util.HashSet[String](toks.length * 2)
    var sumLen = 0L
    var stopHits = 0
    val langHits = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumLen += t.codePointCount(0, t.length)
      seen.add(t)
      if (stop.contains(t)) stopHits += 1
      var l = 0
      while (l < langs.length) {
        if (langs(l)._2.contains(t)) langHits(l) += 1
        l += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length, sumLen, seen.size, stopHits,
      langHits(0), langHits(1), langHits(2), langHits(3)))
  }

  /** Column-DSL handle (registered in GraftExtensions). */
  def apply(text: Column): Column =
    org.apache.spark.sql.functions.call_function("word_stats", text)
}
