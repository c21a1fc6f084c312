package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst vector expressions (SURVEY §2.B similarity rows; the
  * "custom Expression beats UDF" rung of the builder ladder).
  *
  * The embedding queries spend their time in dot products and norms; the
  * built-in spelling — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is a
  * higher-order function, which Catalyst evaluates INTERPRETED (lambda
  * variable binding per element, no whole-stage codegen). These
  * expressions generate a tight primitive loop via doGenCode instead.
  * Summation order is left-to-right — identical to the HOF spelling and to
  * DuckDB's list_sum — so swapping them into a query changes NO result
  * bits and the DuckDB oracles stay valid.
  *
  * Registered through the public SparkSessionExtensions hook
  * ([[GraftExtensions]], `spark.sql.extensions=graft.functions.GraftExtensions`)
  * and invoked with `functions.call_function("graft_dot", ...)`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs MUST be array<double> (AbstractDataType is private[sql] in
  // Spark 4, so no ExpectsInputTypes auto-cast — call sites cast)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

/** sqrt(Σ x_i²) of an array<double> — same loop-order contract as
  * [[DotProduct]]. */
case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Σ (x_i − y_i)² — the k-means/IVF distance kernel. */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SquaredL2Distance =
    copy(left = newLeft, right = newRight)
}

/** Σ (x_i − μ_i)·w_i — the ZCA/linear-map serving kernel: a CENTERED dot
  * product as ONE codegen'd expression, so a d-wide whitening is d of
  * these in a single Project with no higher-order function anywhere in
  * the row loop. (The obvious spelling — `graft_dot(zip_with(x, μ, _-_),
  * w)` — leaves the zip_with centering as CodegenFallback, re-evaluated
  * once per OUTPUT dimension: measured 11× slower than the per-partition
  * dgemm at d=32 before this kernel existed.) Summation is left-to-right
  * over (x_i − μ_i)·w_i — bit-identical to the zip_with spelling and to
  * the dgemm path's scalar replay, so swapping it in changes NO result
  * bits. */
case class CenteredDot(x: Expression, mu: Expression, w: Expression)
    extends TernaryExpression {

  override def first: Expression = x
  override def second: Expression = mu
  override def third: Expression = w
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_centered_dot"

  override def nullSafeEval(a: Any, m: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val mus = m.asInstanceOf[ArrayData]
    val ws = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(),
      math.min(mus.numElements(), ws.numElements()))
    var s = 0.0
    var i = 0
    while (i < n) {
      s += (xs.getDouble(i) - mus.getDouble(i)) * ws.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(),
         |  java.lang.Math.min($m.numElements(), $b.numElements()));
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ($a.getDouble($i) - $m.getDouble($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CenteredDot =
    copy(x = newFirst, mu = newSecond, w = newThird)
}

/** Public extension entry point: registers the vector kernels in the
  * session's function registry
  * (`.config("spark.sql.extensions", "graft.functions.GraftExtensions")`).
  * Call sites use `functions.call_function("graft_dot", a, b)` etc. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => binary(children, DotProduct.apply)))
    ext.injectFunction((FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (children: Seq[Expression]) => unary(children, L2Norm.apply)))
    ext.injectFunction((FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SquaredL2Distance].getName, "graft_sqdist"),
      (children: Seq[Expression]) => binary(children, SquaredL2Distance.apply)))
    ext.injectFunction((FunctionIdentifier("graft_centered_dot"),
      new ExpressionInfo(classOf[CenteredDot].getName, "graft_centered_dot"),
      (children: Seq[Expression]) => ternary(children, CenteredDot.apply)))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles"),
      (children: Seq[Expression]) => binary(children, ShingleArray.apply)))
    ext.injectFunction((FunctionIdentifier("graft_pairs"),
      new ExpressionInfo(classOf[PairStructs].getName, "graft_pairs"),
      (children: Seq[Expression]) => binary(children, PairStructs.apply)))
    ext.injectFunction((FunctionIdentifier("graft_bpe"),
      new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe"),
      (children: Seq[Expression]) => binary(children, BpeEncode.apply)))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => unary(children, NfcNormalize.apply)))
    // optimizer rule: bounded edit-distance predicates run the banded
    // thresholded DP instead of the full O(n·m) one
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
  }
}

object GraftExtensions {
  private def binary(children: Seq[Expression],
      f: (Expression, Expression) => Expression): Expression = {
    require(children.length == 2, s"expected 2 arguments, got ${children.length}")
    f(children(0), children(1))
  }
  private def unary(children: Seq[Expression],
      f: Expression => Expression): Expression = {
    require(children.length == 1, s"expected 1 argument, got ${children.length}")
    f(children(0))
  }
  private def ternary(children: Seq[Expression],
      f: (Expression, Expression, Expression) => Expression): Expression = {
    require(children.length == 3, s"expected 3 arguments, got ${children.length}")
    f(children(0), children(1), children(2))
  }
}
