package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-JOIN maintenance (round 11) — the delta-join
  * algebra complement to IncrementalAgg/SketchMaintenance: a materialized
  * inner equi-join J = R ⋈_k S kept current as EITHER side receives new
  * rows, via the classic insert-only IVM identity
  *
  *   ΔJ = (ΔR ⋈ S_old) ∪ (R_old ⋈ ΔS) ∪ (ΔR ⋈ ΔS)
  *
  * so each refresh joins only the deltas against the other side's
  * accumulated state — the join HISTORY is never rescanned, and the
  * per-refresh cost is O(Δ · matching state), not O(|R|·|S| history).
  * Insert-only is the reference's append-style ingest posture; updates/
  * deletes are the natural-key upsert sink's domain (etl.Upsert), not
  * this module's.
  *
  * Crash safety is a VERSIONED COMMIT, not swap-per-table: a refresh
  * touches three tables (R, S, J) and three independent swaps can be
  * interrupted between any two, leaving states that double- or
  * half-apply a redelivered batch. Instead every refresh writes all
  * three tables under a fresh `v<epoch>/` directory and then commits by
  * atomically replacing the single `_current` pointer file — a reader or
  * a crashed-and-restarted refresh either sees the complete old version
  * or the complete new one, never a mix. Redelivery is idempotent by
  * epoch: a refresh whose epoch is ≤ the committed epoch is a no-op
  * (the driver's page-checkpoint discipline, s5, applied to IVM).
  *
  * Scale posture: the version write rewrites R ∪ ΔR and S ∪ ΔS — at
  * 100 TB those become PartitionedMerge bucketed-delta tables (append
  * O(Δ) into hash buckets; the amortized-prune pattern of
  * chunkDedupBatchBucketed) with the SAME pointer-commit on top; the
  * delta-join shape — the part that matters — is unchanged: ΔR joins
  * S's buckets on the join key with the big side never re-shuffled.
  */
object IncrementalJoin {

  private def pointer(base: String) = Paths.get(base, "_current")

  /** Committed epoch, or None before the first refresh. */
  def committedEpoch(base: String): Option[Long] = {
    val p = pointer(base)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
  }

  private def vdir(base: String, epoch: Long, table: String): String =
    Paths.get(base, s"v$epoch", table).toString

  /** The materialized join as of the last committed refresh (empty-schema
    * read errors before the first commit — callers check committedEpoch). */
  def readJoin(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(vdir(base, committedEpoch(base).get, "J"))

  /** Fold one batch (either or both sides' new rows) into the
    * materialized join. `epoch` must increase strictly across refreshes;
    * a redelivered (≤ committed) epoch is a no-op. Returns true if the
    * refresh applied. */
  def refresh(spark: SparkSession, base: String, key: String,
              deltaR: DataFrame, deltaS: DataFrame, epoch: Long): Boolean = {
    val committed = committedEpoch(base)
    if (committed.exists(epoch <= _)) return false // redelivery: no-op
    // the three ΔJ legs union BY NAME: non-key column names must be
    // disjoint across sides or the join output would alias them
    require((deltaR.columns.toSet - key)
      .intersect(deltaS.columns.toSet - key).isEmpty,
      "IncrementalJoin: R and S must have disjoint non-key column names")
    val (rOld, sOld, jOld) = committed match {
      case Some(e) => (
        Some(spark.read.parquet(vdir(base, e, "R"))),
        Some(spark.read.parquet(vdir(base, e, "S"))),
        Some(spark.read.parquet(vdir(base, e, "J"))))
      case None => (None, None, None)
    }
    // localCheckpoint the deltas: each participates in three joins below
    // and must not re-read (or re-randomize) its source plan
    val dR = deltaR.localCheckpoint()
    val dS = deltaS.localCheckpoint()
    def j(l: DataFrame, r: DataFrame): DataFrame = l.join(r, key)
    val deltaJ = Seq(
      sOld.map(j(dR, _)).getOrElse(j(dR, dS).limit(0)), // ΔR ⋈ S_old
      rOld.map(j(_, dS)).getOrElse(j(dR, dS).limit(0)), // R_old ⋈ ΔS
      j(dR, dS) // ΔR ⋈ ΔS
    ).reduce(_ unionByName _)
    val rNew = rOld.map(_.unionByName(dR)).getOrElse(dR)
    val sNew = sOld.map(_.unionByName(dS)).getOrElse(dS)
    val jNew = jOld.map(_.unionByName(deltaJ)).getOrElse(deltaJ)
    rNew.write.mode(SaveMode.Overwrite).parquet(vdir(base, epoch, "R"))
    sNew.write.mode(SaveMode.Overwrite).parquet(vdir(base, epoch, "S"))
    jNew.write.mode(SaveMode.Overwrite).parquet(vdir(base, epoch, "J"))
    // commit: single atomic pointer replace, then GC superseded versions
    val tmp = Paths.get(base, "_current.tmp")
    Files.createDirectories(Paths.get(base))
    Files.writeString(tmp, epoch.toString)
    Files.move(tmp, pointer(base), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE): Unit
    val keepName = s"v$epoch"
    val s = Files.list(Paths.get(base))
    val stale = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toList.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n != keepName
      }
    } finally s.close()
    stale.foreach(graft.util.Fs.deleteRec)
    true
  }
}
