package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.etl.PartitionedMerge

/** Delta-append commit + per-bucket compaction (round 3): O(page)
  * appends with merge-on-read must equal the rewrite-merge semantics,
  * and compaction must bound file growth without changing reads. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(root: String): Seq[Path] = {
    def walk(p: Path): Seq[Path] =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        val cs = try s.iterator().asScala.toList finally s.close()
        cs.flatMap(walk)
      } else Seq(p)
    walk(Paths.get(root)).filter(_.getFileName.toString.endsWith(".parquet"))
  }

  test("append + merge-on-read equals rewrite-merge; compact bounds files") {
    val dir = tmpDir("compact")
    val appendT = s"$dir/appended"
    val mergeT = s"$dir/merged"
    // 10 key-unique batches with overlapping keys — later batches win
    val batches = (1 to 10).map { b =>
      (1 to 40).map(i => (((b * 7 + i) % 60) + 1, s"v$b-$i"))
        .groupBy(_._1).map(_._2.last).toSeq  // key-unique within batch
        .toDF("id", "name")
    }
    batches.foreach { df =>
      PartitionedMerge.appendInto(spark, appendT, df, Seq("id"), 8)
      PartitionedMerge.mergeInto(spark, mergeT, df, Seq("id"), 8)
    }
    def resolved() = PartitionedMerge.readResolved(spark, appendT, Seq("id"))
      .orderBy("id").as[(Int, String)].collect().toSeq
    val viaMerge = PartitionedMerge.read(spark, mergeT)
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(resolved() === viaMerge)

    // appends accumulated delta files; compaction collapses each bucket
    val before = parquetFiles(appendT).size
    assert(before > 8, s"expected delta fragmentation, got $before files")
    val compacted = PartitionedMerge.compact(spark, appendT, Seq("id"))
    assert(compacted.nonEmpty)
    val after = parquetFiles(appendT).size
    assert(after <= 8, s"expected <=1 file per bucket, got $after")
    assert(resolved() === viaMerge) // reads unchanged by compaction

    // idempotent: nothing left to compact
    assert(PartitionedMerge.compact(spark, appendT, Seq("id")).isEmpty)

    // appends after compaction still win over the compacted base
    PartitionedMerge.appendInto(spark, appendT,
      Seq((5, "post-compact")).toDF("id", "name"), Seq("id"), 8)
    val got = PartitionedMerge.readResolved(spark, appendT, Seq("id"))
      .filter($"id" === 5).as[(Int, String)].collect().toSeq
    assert(got === Seq((5, "post-compact")))
  }

  test("append composes with a mergeInto-created base") {
    val path = tmpDir("compact2") + "/t"
    val base = (1 to 50).map(i => (i, s"base$i")).toDF("id", "name")
    PartitionedMerge.mergeInto(spark, path, base, Seq("id"), 8)
    PartitionedMerge.appendInto(spark, path,
      Seq((7, "delta7"), (51, "delta51")).toDF("id", "name"), Seq("id"), 8)
    val got = PartitionedMerge.readResolved(spark, path, Seq("id"))
    assert(got.count() === 51)
    assert(got.filter($"id" === 7).as[(Int, String)].collect().toSeq
      === Seq((7, "delta7")))
    assert(got.filter($"id" === 51).as[(Int, String)].collect().toSeq
      === Seq((51, "delta51")))
  }
}
