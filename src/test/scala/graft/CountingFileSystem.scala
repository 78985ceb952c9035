package graft

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, LocatedFileStatus, Path,
  RawLocalFileSystem, RemoteIterator}

/** Counting-FS test double (r11 verdict ask #4): a `countfs://` scheme
  * over the local filesystem that counts CLIENT-level listing calls —
  * what [[graft.sinks.BlockRangeSink.stats]] pays the metadata store
  * per invocation. Hadoop's generic `listFiles(recursive = true)` is
  * implemented as an internal per-directory walk on local FS, so the
  * recursion is drained INSIDE the guarded section and nested listings
  * don't count: one `stats()` call must cost ONE client listing, not
  * one per partition (the O(100k)-RPC shape the r12 rewrite removed).
  */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "countfs"
  override def getUri: URI = URI.create("countfs:///")

  override def listStatus(f: Path): Array[FileStatus] =
    CountingFileSystem.counted { super.listStatus(f).map(sanitize) }

  /** RawLocal's lazy statuses load permissions via `new File(uri)`,
    * which rejects the countfs:// scheme — copy to a plain FileStatus
    * (default permissions, never touches the file again).
    */
  private def sanitize(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, 1, s.getBlockSize,
      s.getModificationTime, s.getPath)

  override def listFiles(f: Path, recursive: Boolean)
      : RemoteIterator[LocatedFileStatus] =
    CountingFileSystem.counted {
      // drain the lazy walk here so its per-subdir listings stay inside
      // the reentrancy guard (they are implementation detail of ONE
      // client call, and on a real object store they are one LIST)
      val buf = scala.collection.mutable.ArrayBuffer.empty[LocatedFileStatus]
      val it = super.listFiles(f, recursive)
      while (it.hasNext) buf += it.next()
      val i = buf.iterator
      new RemoteIterator[LocatedFileStatus] {
        override def hasNext: Boolean = i.hasNext
        override def next(): LocatedFileStatus = i.next()
      }
    }
}

object CountingFileSystem {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  private val inCall = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def counted[T](body: => T): T =
    if (inCall.get()) body
    else {
      calls.incrementAndGet()
      inCall.set(java.lang.Boolean.TRUE)
      try body finally inCall.set(java.lang.Boolean.FALSE)
    }

  def reset(): Unit = calls.set(0)
}
