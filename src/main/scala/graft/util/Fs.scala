package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Shared filesystem helpers for the write-temp-then-swap pattern. */
object Fs {
  /** Recursive delete that CLOSES the directory stream (Files.list leaks
    * an fd per call otherwise — one per page merge adds up fast). */
  def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        val children = try s.iterator().asScala.toList finally s.close()
        children.foreach(deleteRec)
      }
      Files.delete(p)
    }

  /** Swap `tmp` into `target` without ever exposing a torn table (r8).
    *
    * The old delete-then-move protocol had two crash defects: a crash
    * MID-deleteRec left a torn-but-readable live table (silent partial
    * data), and a crash after the delete lost the old state entirely.
    * Now the live table is MOVED aside first (rename — atomic on one
    * filesystem), the replacement moved in, and only then is the old
    * state deleted; a failed move-in restores the original. Every state
    * visible at `target` is either the complete old table, absent (the
    * documented empty-state fallback every caller handles), or the
    * complete new table — never a partial directory.
    *
    * The aside lives as a SIBLING OF TMP, not of target: the
    * PartitionedMerge callers swap `gbucket=N` partition directories
    * inside a live table root, where an aside named `gbucket=N.…`
    * would be picked up by Spark's partition discovery as a bogus
    * partition value. Tmp is always outside the live table (and for
    * bucket swaps, inside a staging dir the caller deletes), so
    * crash-leftover asides never contaminate a read.
    */
  def swapInto(tmp: Path, target: Path): Unit = {
    if (!Files.exists(target)) { Files.move(tmp, target): Unit; return }
    val aside = tmp.resolveSibling(
      tmp.getFileName.toString + s".displaced-${System.nanoTime()}")
    Files.move(target, aside)
    try Files.move(tmp, target): Unit
    catch { case e: Throwable =>
      Files.move(aside, target): Unit // restore the live table
      throw e
    }
    deleteRec(aside)
  }
}
