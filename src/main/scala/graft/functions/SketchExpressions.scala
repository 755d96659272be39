package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe for Spark's built-in `count_min_sketch` aggregate (SURVEY.md
  * §2.11 ladder, sketch family: a6 HLL distinct, a7 KLL percentile,
  * a8 CMS frequency).
  *
  * The aggregate produces the serialized sketch as BINARY but Spark ships
  * no lookup function for it — `graft_cms_probe(sketch, item)` returns the
  * CMS frequency estimate (always ≥ the true count; ≤ true + eps·N with
  * the configured confidence). Deserialization is cached by reference
  * identity, so probing many items against one broadcast sketch parses it
  * once per partition. Eval-only (CodegenFallback): probes sit on tiny
  * result-side projections, never in the scan hot path.
  */
case class GraftCmsProbe(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_probe"

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (!(bytes.asInstanceOf[AnyRef] eq cachedRef)) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedRef = bytes.asInstanceOf[AnyRef]
    }
    cachedSketch.estimateCount(item)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftCmsProbe =
    copy(left = newLeft, right = newRight)
}

/** Merge two serialized Count-Min sketches (same eps/confidence/seed —
  * CountMinSketch.mergeInPlace rejects incompatible shapes). CMS merge is
  * element-wise counter addition: exact, commutative and associative, so
  * a sketch maintained incrementally batch-by-batch equals the sketch of
  * the full history bit-for-bit (etl.SketchMaintenance relies on this;
  * IncrementalSketchSpec proves it). Eval-only: merges touch O(1) rows. */
case class GraftCmsMerge(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_cms_merge"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = CountMinSketch.readFrom(
      new ByteArrayInputStream(a.asInstanceOf[Array[Byte]]))
    val s2 = CountMinSketch.readFrom(
      new ByteArrayInputStream(b.asInstanceOf[Array[Byte]]))
    s1.mergeInPlace(s2)
    val out = new java.io.ByteArrayOutputStream()
    s1.writeTo(out)
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftCmsMerge =
    copy(left = newLeft, right = newRight)
}
