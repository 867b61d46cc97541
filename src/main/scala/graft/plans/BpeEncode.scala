package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PRODUCTION BPE application as a codegen'd expression — the hot
  * path [[graft.text.Bpe.encode]]'s per-merge column fold is
  * documented as too slow for (its cost is O(merges x len) expression
  * layers per word; a 32k-merge list would stack 32k folds into the
  * plan). Here the trained merge list ships ONCE as a plan literal,
  * compiles to a rank table, and each word tokenizes with the
  * standard min-rank merge loop (Sennrich ACL'16 apply step; the HF
  * tokenizers algorithm): repeatedly find the adjacent pair with the
  * LOWEST training rank and merge all its occurrences greedy-left,
  * until no adjacent pair has a rank. Rank order replay is equivalent
  * to training-order replay — each merge k can only create pairs that
  * rank AFTER k, so processing by ascending rank applies exactly the
  * merges training-order application would (BpeSpec pins the
  * equivalence against the fold form, including the overlap case).
  *
  * Null text yields null; tokenization is whitespace-split then
  * per-word code-point symbols, matching the trainer
  * ([[graft.text.Bpe.wordCounts]] / `split(word, "")`). */
case class BpeEncode(child: Expression, merges: IndexedSeq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // ranks derived once per task from the structural-equality merge
  // list (IndexedSeq keeps plan canonicalization working, as with
  // PqEncode's codebook)
  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.rankTable(merges)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = BpeEncode.encode(input.asInstanceOf[UTF8String].toString, ranks)
    new GenericArrayData(toks.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
        "java.util.HashMap<String, Integer>")
      s"""
         |Object[] toks = graft.plans.BpeEncode.encode($v.toString(), $ranksRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(toks);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Registry builder: (text, mergesLiteral) where the literal is an
    * array<string> of "a b" lines in RANK ORDER (the merges.txt body
    * — BPE symbols are whitespace-free by construction). */
  def fromChildren(ch: Seq[Expression]): BpeEncode = {
    require(ch.length == 2, "bpe_encode(text, merges) expects 2 arguments")
    require(ch(1).foldable, "bpe_encode merges must be a literal")
    val merges = ch(1).dataType match {
      case ArrayType(StringType, _) =>
        ch(1).eval().asInstanceOf[ArrayData].toArray[UTF8String](StringType)
          .map(_.toString).toIndexedSeq
      case other => throw new IllegalArgumentException(
        s"bpe_encode merges must be array<string>, got ${other.simpleString}")
    }
    BpeEncode(ch(0), merges)
  }

  /** "a b" lines -> pair-key -> rank. The key joins the two symbols
    * with ' ' (can never occur inside a symbol — symbols come
    * from text that survived string sanitization, and the trainer's
    * own artifact format already requires space-free symbols). */
  def rankTable(merges: IndexedSeq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    while (i < merges.size) {
      val line = merges(i)
      val sp = line.indexOf(' ')
      require(sp > 0 && line.indexOf(' ', sp + 1) < 0,
        s"malformed merge line '$line' (want 'a b')")
      // first occurrence wins if a hand-edited list repeats a pair
      m.putIfAbsent(line.substring(0, sp) + " " + line.substring(sp + 1), i)
      i += 1
    }
    m
  }

  /** One implementation for both execution paths. Whitespace-split,
    * then per word: min-rank merge loop over code-point symbols.
    *
    * "Whitespace" is Java regex `\s` — the ASCII class
    * [ \t\n\x0B\f\r] — NOT Character.isWhitespace: the trainer and
    * the fold encode both tokenize with `split(trim(text), "\\s+")`,
    * whose `\s` is ASCII-only, and the DuckDB oracle's RE2 `\s` is
    * the same class. A wider Unicode class here would make the
    * production encoder split words (U+3000, U+2028, ...) the
    * trainer never split — a silent train/encode divergence. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  def encode(text: String, ranks: java.util.HashMap[String, Integer]): Array[Any] = {
    val out = new java.util.ArrayList[Any]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(text.charAt(i))) i += 1
      if (i > start) encodeWord(text.substring(start, i), ranks, out)
    }
    out.toArray
  }

  private def encodeWord(
      word: String,
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[Any]): Unit = {
    // split to code points (surrogate pair = one symbol, matching the
    // trainer's split(word, ""))
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      syms.add(word.substring(i, i + w))
      i += w
    }
    // min-rank loop: merge the lowest-rank adjacent pair (all its
    // occurrences, greedy-left) until no pair has a rank
    var done = syms.size < 2
    while (!done) {
      var best = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        // reconstruct the winning pair from any of its occurrences
        var a: String = null
        var b: String = null
        j = 0
        while (a == null && j < syms.size - 1) {
          val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
          if (r != null && r == best) { a = syms.get(j); b = syms.get(j + 1) }
          j += 1
        }
        val next = new java.util.ArrayList[String](syms.size)
        j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && syms.get(j) == a && syms.get(j + 1) == b) {
            next.add(a + b)
            j += 2
          } else {
            next.add(syms.get(j))
            j += 1
          }
        }
        syms = next
        if (syms.size < 2) done = true
      }
    }
    i = 0
    while (i < syms.size) {
      out.add(UTF8String.fromString(syms.get(i)))
      i += 1
    }
  }
}
