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

  /** Atomic-ish swap: delete target, move tmp into place. */
  def swapInto(tmp: Path, target: Path): Unit = {
    deleteRec(target)
    Files.move(tmp, target): Unit
  }
}
