package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Passage chunking: split each document into overlapping fixed-size
  * token windows — the retrieval/training prep step that turns long
  * documents into model-sized passages (context windows for training
  * shards, passages for retrieval indexing).
  *
  * Window i covers tokens [i*stride, i*stride + winLen); the last
  * window may be shorter (slice clamps at the end), and every token is
  * covered as long as stride <= winLen. Everything is row-local Column
  * math (sequence + slice inside one Generate), so the operator is
  * embarrassingly parallel: no shuffle, no state, linear in corpus
  * size — the 100 TB plan is exactly the sf0.01 plan.
  */
object Chunking {

  /** Number of windows for a token count `n`: 1 when n <= winLen,
    * else ceil((n - winLen) / stride) + 1. */
  private def nChunks(n: Column, winLen: Int, stride: Int): Column =
    when(n <= winLen, lit(1)).otherwise(
      floor((n - lit(winLen) + lit(stride - 1)).cast("double") / lit(stride))
        .cast("int") + lit(1))

  /** Explode `textCol` into (idCol, chunk_idx, n_tokens, chunk_text)
    * rows. stride < winLen gives overlapping windows (retrieval);
    * stride == winLen gives an exact partition (training shards). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            winLen: Int = 64, stride: Int = 48): DataFrame = {
    require(winLen > 0 && stride > 0 && stride <= winLen,
      s"need 0 < stride <= winLen, got winLen=$winLen stride=$stride")
    val toks = split(trim(col(textCol)), "\\s+")
    val idxs = sequence(lit(0), nChunks(size(toks), winLen, stride) - 1)
    df.select(col(idCol), explode(idxs).as("chunk_idx"), toks.as("__toks"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__toks"), col("chunk_idx") * lit(stride) + lit(1),
          lit(winLen)).as("__ck"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__ck")).as("n_tokens"),
        array_join(col("__ck"), " ").as("chunk_text"))
  }
}
