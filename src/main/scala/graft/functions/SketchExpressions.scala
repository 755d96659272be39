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

/** Inner product of two serialized Count-Min sketches — the AGMS/CM
  * join-size estimator: for sketches of relations R and S keyed on the
  * join column, min over hash rows of the counter-wise dot product
  * estimates |R ⋈ S| = Σ_k n_R(k)·n_S(k). Never an undercount (each
  * row's dot ≥ the true sum because colliding keys only ADD mass), and
  * ≤ true + eps·|R|·|S| with the sketch's confidence (Cormode &
  * Muthukrishnan 2005, §4.2). Both sketches must share depth/width/seed
  * — enforced by comparing the parsed row-hash coefficients.
  *
  * Spark ships no accessor for the CMS counter table, so this parses the
  * sketch's serialized form directly (version 1 layout written by
  * `CountMinSketchImpl.writeTo`: version, totalCount, depth, width,
  * depth hashA longs, depth×width table longs — verified structurally by
  * the spec: a single-key sketch pair must dot to exactly c1·c2). The
  * dot accumulates in Long: sound while |R|·|S| < 2^63, i.e. up to ~3e9
  * rows per side — beyond that, sketch a uniform sample of each side and
  * scale, rather than widening the accumulator here. The bound is
  * ENFORCED, not advisory: per-term multiply and the running sum use
  * Math.multiplyExact/addExact, so exceeding it throws ArithmeticException
  * instead of silently wrapping to a garbage (possibly negative)
  * estimate. Eval-only (CodegenFallback): dots join two one-row
  * aggregate sides. */
case class GraftCmsDot(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_dot"

  private def parse(bytes: Array[Byte])
      : (Int, Int, Array[Long], Array[Long]) = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == 1,
      s"graft_cms_dot: unsupported CMS serialization version $version")
    in.readLong() // totalCount (unused)
    val depth = in.readInt()
    val width = in.readInt()
    val hashA = Array.ofDim[Long](depth)
    var i = 0
    while (i < depth) { hashA(i) = in.readLong(); i += 1 }
    val table = Array.ofDim[Long](depth * width)
    i = 0
    while (i < table.length) { table(i) = in.readLong(); i += 1 }
    (depth, width, table, hashA)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (d1, w1, t1, h1) = parse(a.asInstanceOf[Array[Byte]])
    val (d2, w2, t2, h2) = parse(b.asInstanceOf[Array[Byte]])
    require(d1 == d2 && w1 == w2 && java.util.Arrays.equals(h1, h2),
      "graft_cms_dot: sketches differ in depth, width, or seed")
    var best = Long.MaxValue
    var r = 0
    while (r < d1) {
      var s = 0L
      var c = 0
      while (c < w1) {
        try s = Math.addExact(s, Math.multiplyExact(t1(r * w1 + c),
          t2(r * w1 + c)))
        catch { case _: ArithmeticException => throw new ArithmeticException(
          "graft_cms_dot: counter dot product overflowed Long — the " +
            "documented |R|*|S| < 2^63 bound is exceeded; sketch a " +
            "uniform sample of each side and scale the estimate instead") }
        c += 1
      }
      if (s < best) best = s
      r += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftCmsDot =
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
