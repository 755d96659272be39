package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Element-type dispatch shared by the vector expressions: each side may be
  * ARRAY<FLOAT> (stored embeddings) or ARRAY<DOUBLE> (computed centroids —
  * see x_kmeans_train). Reading a double slot with getFloat would silently
  * return garbage, so the accessor is chosen from the child's dataType. */
private[functions] object VecAccess {
  def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  def get(a: ArrayData, i: Int, double: Boolean): Double =
    if (double) a.getDouble(i) else a.getFloat(i).toDouble
  def gen(arr: String, i: String, double: Boolean): String =
    if (double) s"$arr.getDouble($i)" else s"((double) $arr.getFloat($i))"
}

/** Native Catalyst expression for the embedding-similarity hot path.
  *
  * Why a custom Expression (SURVEY.md §2.11 ladder): the built-in way to dot
  * two float arrays is `aggregate(zip_with(...))`, but SQL higher-order
  * functions are interpreted — they sit outside whole-stage codegen and
  * allocate a lambda frame per element. `graft_dot` generates a tight
  * primitive loop instead. Semantics match the HOF left fold exactly
  * (ascending index, double accumulator) so results are bit-identical and
  * remain comparable to the DuckDB oracle.
  */
case class GraftDot(left: Expression, right: Expression)
  extends BinaryExpression {
  // inputs are ARRAY<FLOAT> or ARRAY<DOUBLE> by construction at the call
  // sites (VecAccess dispatches per side); ExpectsInputTypes is
  // unavailable outside org.apache.spark (private API)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = VecAccess.isDouble(left)
    val yd = VecAccess.isDouble(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += VecAccess.get(x, i, xd) * VecAccess.get(y, i, yd)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${VecAccess.gen(x, i, VecAccess.isDouble(left))}
         |        * ${VecAccess.gen(y, i, VecAccess.isDouble(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — same rationale and loop shape as GraftDot. */
case class GraftL2(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = VecAccess.isDouble(left)
    val yd = VecAccess.isDouble(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = VecAccess.get(x, i, xd) - VecAccess.get(y, i, yd)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val dd = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dd = ${VecAccess.gen(x, i, VecAccess.isDouble(left))}
         |             - ${VecAccess.gen(y, i, VecAccess.isDouble(right))};
         |  $acc += $dd * $dd;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftL2 =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Imperative registration (used by the query registry; idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => GraftDot(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2", exprs => GraftL2(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", exprs => GraftTopK(exprs.head, exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_probe", exprs => GraftCmsProbe(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_merge", exprs => GraftCmsMerge(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_dot", exprs => GraftCmsDot(exprs.head, exprs(1)),
      "scala_udf")
    // Catalyst's bloom-filter pair exists for the optimizer's runtime
    // filters but is not SQL-registered; exposing it makes the classic
    // build-bloom-then-prune-before-shuffle recipe (j7_bloom_prejoin)
    // expressible directly. The bloom side of graft_might_contain must
    // be a scalar subquery or literal (enforced by its type check).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1), exprs(2), 0, 0),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)),
      "scala_udf")
  }
}

/** SparkSessionExtensions entry point:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[GraftDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => GraftDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2"),
      new ExpressionInfo(classOf[GraftL2].getName, "graft_l2"),
      (exprs: Seq[Expression]) => GraftL2(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[GraftTopK].getName, "graft_topk"),
      (exprs: Seq[Expression]) => GraftTopK(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_probe"),
      new ExpressionInfo(classOf[GraftCmsProbe].getName, "graft_cms_probe"),
      (exprs: Seq[Expression]) => GraftCmsProbe(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_dot"),
      new ExpressionInfo(classOf[GraftCmsDot].getName, "graft_cms_dot"),
      (exprs: Seq[Expression]) => GraftCmsDot(exprs.head, exprs(1))))
    // top-k pattern rewrite: rank-window + filter → graft_topk aggregate
    ext.injectOptimizerRule(_ => TopKRewriteRule)
  }
}
