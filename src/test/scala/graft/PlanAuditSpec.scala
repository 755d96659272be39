package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit,
  LeafNode, LogicalPlan, Window => LWindow}

/** Structural plan audit over the WHOLE registry (r9 VERDICT #1): Spark
  * implements a Window with an empty partitionSpec by moving every input
  * row to ONE partition — fine over a grouped/distinct-value table whose
  * cardinality is bounded by the value domain, a serial OOM over raw
  * base-table rows whose cardinality grows with data volume. This spec
  * walks every registered query's optimized plan and fails if any
  * unpartitioned Window can reach a file-scan leaf without passing
  * through an Aggregate (i.e. it windows raw rows, not a histogram).
  * This is the gate that would have caught x_quantile_bins' full-table
  * ntile before it shipped.
  */
class PlanAuditSpec extends SparkSpec {

  // Documented exemptions (each has a stated scale path or bounded input):
  //  - w1_pagination: reference-faithful global row_number; the scale
  //    path is w1b_keyset_pagination (SURVEY §7.4).
  //  - x_zorder_layout: deliberate whole-table layout gauge — measures
  //    the clustered write order itself, documented in PERFORMANCE.md.
  private val exempt = Set("w1_pagination", "x_zorder_layout")

  // Fixed-cardinality dimension tables: a window over these is bounded
  // by construction (TPC-H pins region=5, nation=25 at every SF).
  private val boundedDims = Seq("region.parquet", "nation.parquet")

  private def rawBelow(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => false
    // a LIMIT bounds the window's input cardinality by construction
    // (x_rrf_fusion ranks two top-30 legs — 30 rows, any corpus size)
    case _: GlobalLimit => false
    case l: LeafNode =>
      // LogicalRelation / DataSourceV2*Relation are scans of data that
      // grows with volume; LogicalRDD (a localCheckpoint boundary) and
      // LocalRelation (literals) are not — the checkpointed subplans in
      // this repo are all grouped tables (replicate medians, shortlist
      // heaps) whose own shape is audited where they are built.
      val cls = l.getClass.getSimpleName
      cls.contains("Relation") && !cls.startsWith("Local") &&
        !boundedDims.exists(l.toString.contains)
    case other => other.children.exists(rawBelow)
  }

  test("no unpartitioned Window consumes raw base-table rows") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => exempt(n) }
      .flatMap { case (name, fn) =>
        val plan =
          try fn(spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
          catch { case e: Throwable =>
            fail(s"$name failed to build: ${e.getMessage}")
          }
        plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty && rawBelow(w.child) =>
            s"$name: unpartitioned window " +
              w.windowExpressions.map(_.name).mkString(",") +
              " over a base-table scan"
        }
      }
    assert(offenders.isEmpty,
      s"${offenders.size} scale-unsafe windows:\n${offenders.mkString("\n")}")
  }
}
