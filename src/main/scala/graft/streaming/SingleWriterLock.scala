package graft.streaming

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Single-writer guard (A22, reference `pg_try_advisory_lock(md5(db))`,
  * pkg/sink/postgres.go:113-118): at most one applier per target.
  * Structured Streaming already enforces one active query per
  * checkpoint dir; this adds the cross-process belt-and-braces the
  * reference gets from the advisory lock, as an OS file lock keyed by
  * the target id.
  */
final class SingleWriterLock(dir: String, targetId: String) {
  private var channel: FileChannel = _
  private var lock: java.nio.channels.FileLock = _

  /** Try to become the single writer; false if another holds it. */
  def tryAcquire(): Boolean = synchronized {
    if (lock != null) return true
    Files.createDirectories(Paths.get(dir))
    channel = FileChannel.open(
      Paths.get(dir, s"$targetId.lock"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    lock = channel.tryLock()
    if (lock == null) { channel.close(); channel = null; false } else true
  }

  def release(): Unit = synchronized {
    if (lock != null) { lock.release(); lock = null }
    if (channel != null) { channel.close(); channel = null }
  }
}
