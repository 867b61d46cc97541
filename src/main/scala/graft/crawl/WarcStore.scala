package graft.crawl

import java.io.{ByteArrayInputStream, RandomAccessFile}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset}

/** S3: WARC byte-range point reads (Provider.py:235-252).
  *
  * The reference issues ranged HTTP GETs `bytes=offset..offset+len-1`
  * against the crawl archive and gunzips the member to recover the
  * page. Offline, the same contract is a seek-read on a local WARC
  * file. The operator shape matters for scale: lookups run inside
  * mapPartitions — one open file handle per (partition, file), rows
  * grouped by file so a 1000-executor run does sequential-ish IO per
  * archive instead of a random seek per row.
  */
object WarcStore {

  /** One WARC member coordinate, as carried through the link table
    * (ExtractCCLinks.py:173-175). */
  final case class WarcRef(url: String, warcPath: String, offset: Long,
      deflateLength: Long)

  final case class FetchedPage(url: String, html: String)

  /** Seek-read one gzip member and inflate it. */
  def fetchOne(root: String, ref: WarcRef): Array[Byte] = {
    val raf = new RandomAccessFile(s"$root/${ref.warcPath}", "r")
    try {
      raf.seek(ref.offset)
      val buf = new Array[Byte](ref.deflateLength.toInt)
      raf.readFully(buf)
      val in = new GZIPInputStream(new ByteArrayInputStream(buf))
      try in.readAllBytes()
      finally in.close()
    } finally raf.close()
  }

  /** Distributed point-read: partition by file so each task touches
    * few archives, then fetch within partitions. */
  def fetchPages(refs: Dataset[WarcRef], root: String): Dataset[FetchedPage] = {
    import refs.sparkSession.implicits._
    refs
      .repartition(refs.sparkSession.sessionState.conf.numShufflePartitions,
        $"warcPath")
      .sortWithinPartitions($"warcPath", $"offset")
      .mapPartitions { it =>
        it.map { ref =>
          FetchedPage(ref.url, new String(fetchOne(root, ref), "UTF-8"))
        }
      }
  }
}
