package graft.streaming

import java.io.{File, FileNotFoundException}
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, PathFilter,
  PositionedReadable, Seekable}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** A CheckpointFileManager over plain java.nio for local checkpoint
  * dirs.
  *
  * Hadoop's RawLocalFileSystem shells out (readlink/stat) for renames
  * and link-status checks when libhadoop is absent; in constrained
  * containers those forks can never be reaped and streaming wedges on
  * the first state-store commit. Everything this engine needs from the
  * checkpoint FS — atomic create-rename, seekable reads, list, mkdirs,
  * recursive delete — exists in java.nio with zero subprocesses.
  * Selected via spark.sql.streaming.checkpointFileManagerClass
  * (graft.Sessions sets it for local masters).
  */
class NioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  private def toFile(p: Path): File = new File(p.toUri.getPath)

  override def createAtomic(path: Path, overwriteIfPossible: Boolean)
      : CancellableFSDataOutputStream = {
    val target = toFile(path).toPath
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".${target.getFileName}.${UUID.randomUUID()}.tmp")
    val out = Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW,
      StandardOpenOption.WRITE)
    new CancellableFSDataOutputStream(out) {
      private var done = false
      override def cancel(): Unit = {
        done = true
        out.close()
        Files.deleteIfExists(tmp)
      }
      override def close(): Unit = if (!done) {
        done = true
        out.close()
        if (overwriteIfPossible) {
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        } else {
          // Fencing path: CheckpointFileManager relies on fail-if-exists
          // so a zombie driver loses the race instead of clobbering the
          // winner's batch file. POSIX rename (Files.move) silently
          // replaces, and exists-then-move is a check-then-act race —
          // link(2) is the atomic create-new primitive: it FAILS with
          // EEXIST if the target appeared concurrently.
          try {
            Files.createLink(target, tmp)
            Files.deleteIfExists(tmp)
          } catch {
            case e: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(tmp)
              throw e
          }
        }
      }
    }
  }

  /** Seekable, positioned-readable stream over a FileChannel. */
  private class NioSeekableStream(f: File)
      extends java.io.InputStream with Seekable with PositionedReadable {
    private val ch = FileChannel.open(f.toPath, StandardOpenOption.READ)

    override def read(): Int = {
      val b = java.nio.ByteBuffer.allocate(1)
      if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      ch.read(java.nio.ByteBuffer.wrap(b, off, len))
    override def seek(pos: Long): Unit = ch.position(pos)
    override def getPos: Long = ch.position()
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int =
      ch.read(java.nio.ByteBuffer.wrap(buffer, offset, length), position)
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      var done = 0
      while (done < length) {
        val n = read(position + done, buffer, offset + done, length - done)
        if (n < 0) throw new java.io.EOFException()
        done += n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
    override def close(): Unit = ch.close()
  }

  override def open(path: Path): FSDataInputStream = {
    val f = toFile(path)
    if (!f.exists()) throw new FileNotFoundException(path.toString)
    new FSDataInputStream(new NioSeekableStream(f))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val f = toFile(path)
    if (!f.exists()) throw new FileNotFoundException(path.toString)
    val children = Option(f.listFiles()).getOrElse(Array.empty)
    children.map { c =>
      new FileStatus(c.length(), c.isDirectory, 1, 0, c.lastModified(),
        new Path(c.toURI))
    }.filter(s => filter.accept(s.getPath))
  }

  override def mkdirs(path: Path): Unit =
    Files.createDirectories(toFile(path).toPath)

  override def exists(path: Path): Boolean = toFile(path).exists()

  override def delete(path: Path): Unit = {
    val f = toFile(path).toPath
    if (Files.exists(f)) {
      import scala.jdk.CollectionConverters._
      Files.walk(f).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    mkdirs(root)
    root
  }
}
