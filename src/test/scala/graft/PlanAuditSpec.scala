package graft

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan,
  LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  GlobalLimit, Join, LeafNode, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.logical.BROADCAST

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
  // by construction (TPC-H pins region=5, nation=25 at every SF). The
  // scan leaf is identified by its (possibly pruned) output attributes.
  private val dimCols = Set("n_nationkey", "n_name", "n_regionkey",
    "n_comment", "r_regionkey", "r_name", "r_comment")

  // Dense surrogate keys: a `key < k` / `key = k` / `key IN (...)`
  // predicate bounds the subtree to O(k) rows at ANY data volume — the
  // idiom the ANN family uses to pin its query set (vec_id < 50) and the
  // dedup family uses for donor/benchmark sets (doc_id < 25). A
  // predicate on a VALUE column (n_chars < 500) does NOT bound — it
  // stays a constant fraction of an unbounded corpus — so only the key
  // columns below qualify.
  private val denseKeys = Set("vec_id", "doc_id", "event_id",
    "o_orderkey", "l_orderkey", "p_partkey", "s_suppkey", "c_custkey")

  private def keyPrefixBound(e: Expression): Boolean = e match {
    case And(l, r) => keyPrefixBound(l) || keyPrefixBound(r)
    case LessThan(a: AttributeReference, _: Literal) => denseKeys(a.name)
    case LessThanOrEqual(a: AttributeReference, _: Literal) => denseKeys(a.name)
    case EqualTo(a: AttributeReference, _: Literal) => denseKeys(a.name)
    case EqualTo(_: Literal, a: AttributeReference) => denseKeys(a.name)
    case GreaterThan(_: Literal, a: AttributeReference) => denseKeys(a.name)
    case GreaterThanOrEqual(_: Literal, a: AttributeReference) =>
      denseKeys(a.name)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      denseKeys(a.name)
    case _ => false
  }

  private def rawBelow(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => false
    // a LIMIT bounds the window's input cardinality by construction
    // (x_rrf_fusion ranks two top-30 legs — 30 rows, any corpus size)
    case _: GlobalLimit => false
    case f: Filter if keyPrefixBound(f.condition) => false
    case l: LeafNode =>
      // LogicalRelation / DataSourceV2*Relation are scans of data that
      // grows with volume; LogicalRDD (a localCheckpoint boundary) and
      // LocalRelation (literals) are not — the checkpointed subplans in
      // this repo are all grouped tables (replicate medians, shortlist
      // heaps) whose own shape is audited where they are built.
      val cls = l.getClass.getSimpleName
      cls.contains("Relation") && !cls.startsWith("Local") &&
        !(l.output.nonEmpty && l.output.forall(a => dimCols(a.name)))
    case other => other.children.exists(rawBelow)
  }

  // Build every registered plan ONCE and share it across the audits.
  private lazy val plans: Seq[(String, LogicalPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
        catch { case e: Throwable =>
          fail(s"$name failed to build: ${e.getMessage}")
        }
      (name, plan)
    }

  test("no unpartitioned Window consumes raw base-table rows") {
    val offenders = plans
      .filterNot { case (n, _) => exempt(n) }
      .flatMap { case (name, plan) =>
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

  test("no cross product joins two unbounded inputs") {
    // crossJoin(broadcast(oneRowAgg)) — the scalar-fanout idiom all over
    // this repo — is fine: the agg side never passes rawBelow. What this
    // catches is the O(N·M) shape: a conditionless join where BOTH sides
    // scale with data volume.
    val offenders = plans.flatMap { case (name, plan) =>
      plan.collect {
        case j: Join if j.condition.isEmpty &&
            rawBelow(j.left) && rawBelow(j.right) =>
          s"$name: cross product over two base-table scans"
      }
    }
    assert(offenders.isEmpty,
      s"${offenders.size} unbounded cross products:\n${offenders.mkString("\n")}")
  }

  test("no forced broadcast of an unbounded input") {
    // broadcast() is a FORCE — Spark ships that side to every executor
    // regardless of its size, so a broadcast of anything that grows with
    // data volume (even filtered: a predicate does not bound cardinality
    // at 100x) is a deferred OOM. Grouped/checkpointed sides are bounded
    // by construction and pass rawBelow=false.
    val offenders = plans.flatMap { case (name, plan) =>
      plan.collect {
        case j: Join =>
          val sides = Seq(
            (j.hint.leftHint, j.left, "left"),
            (j.hint.rightHint, j.right, "right"))
          sides.collect {
            case (Some(h), side, which)
                if h.strategy.contains(BROADCAST) && rawBelow(side) =>
              s"$name: forced broadcast of an unbounded $which side"
          }
      }.flatten
    }
    assert(offenders.isEmpty,
      s"${offenders.size} unbounded broadcasts:\n${offenders.mkString("\n")}")
  }
}
