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

  /** Seek-read one gzip member from an already-open handle. */
  private def readMember(raf: RandomAccessFile, offset: Long, len: Long)
      : Array[Byte] = {
    raf.seek(offset)
    val buf = new Array[Byte](len.toInt)
    raf.readFully(buf)
    val in = new GZIPInputStream(new ByteArrayInputStream(buf))
    try in.readAllBytes()
    finally in.close()
  }

  /** Seek-read one gzip member and inflate it (single-shot: opens and
    * closes the file; the batch path is fetchPages). */
  def fetchOne(root: String, ref: WarcRef): Array[Byte] = {
    val raf = new RandomAccessFile(s"$root/${ref.warcPath}", "r")
    try readMember(raf, ref.offset, ref.deflateLength)
    finally raf.close()
  }

  /** Distributed point-read: partition by file, sort by (file, offset)
    * within partitions, and keep ONE open handle across consecutive
    * rows of the same archive — sequential-ish IO per file instead of
    * an open/seek/close syscall storm per row. */
  def fetchPages(refs: Dataset[WarcRef], root: String): Dataset[FetchedPage] = {
    import refs.sparkSession.implicits._
    refs
      .repartition(refs.sparkSession.sessionState.conf.numShufflePartitions,
        $"warcPath")
      .sortWithinPartitions($"warcPath", $"offset")
      .mapPartitions { it =>
        var curPath: String = null
        var raf: RandomAccessFile = null
        def handleFor(path: String): RandomAccessFile = {
          if (path != curPath) {
            if (raf != null) raf.close()
            raf = new RandomAccessFile(s"$root/$path", "r")
            curPath = path
          }
          raf
        }
        val mapped = it.map { ref =>
          val page = FetchedPage(ref.url,
            new String(readMember(handleFor(ref.warcPath), ref.offset,
              ref.deflateLength), "UTF-8"))
          page
        }
        // close the live handle once the partition is exhausted
        new Iterator[FetchedPage] {
          override def hasNext: Boolean = {
            val more = mapped.hasNext
            if (!more && raf != null) { raf.close(); raf = null }
            more
          }
          override def next(): FetchedPage = mapped.next()
        }
      }
  }
}
