package graft

import java.nio.file.{Files, Paths}

/** The r8 move-aside swap contract: complete replacement, no leftover
  * aside directories, fresh-target move-in. (The crash-window claims —
  * never a torn live table — follow from rename atomicity; the forked-JVM
  * kill tests in CompactionSpec exercise the caller-level protocols.) */
class FsSpec extends SparkSpec {

  private def writeDir(p: String, marker: String): Unit = {
    Files.createDirectories(Paths.get(p))
    Files.writeString(Paths.get(p, "data.txt"), marker): Unit
  }

  test("swapInto replaces an existing target completely and cleans up " +
      "the aside") {
    val root = tmpDir("fs-swap")
    writeDir(s"$root/live", "old")
    writeDir(s"$root/live.tmp", "new")
    graft.util.Fs.swapInto(Paths.get(s"$root/live.tmp"),
      Paths.get(s"$root/live"))
    assert(Files.readString(Paths.get(s"$root/live/data.txt")) === "new")
    assert(!Files.exists(Paths.get(s"$root/live.tmp")))
    val leftovers = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.contains("displaced"))
    assert(leftovers.isEmpty, s"aside not cleaned: ${leftovers.toSeq}")
  }

  test("swapInto onto a missing target is a plain move") {
    val root = tmpDir("fs-swap-fresh")
    writeDir(s"$root/live.tmp", "new")
    graft.util.Fs.swapInto(Paths.get(s"$root/live.tmp"),
      Paths.get(s"$root/live"))
    assert(Files.readString(Paths.get(s"$root/live/data.txt")) === "new")
    assert(!Files.exists(Paths.get(s"$root/live.tmp")))
  }
}
