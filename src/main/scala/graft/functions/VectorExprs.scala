package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.sql.SparkSessionExtensions

/** Analysis-time input checks for the vector kernels. AbstractDataType
  * is private[sql] in Spark 4, so the ExpectsInputTypes auto-cast path
  * is unavailable — call sites still cast — but a WRONG type must fail
  * at analysis with a named message, not compile broken generated Java
  * (a long nprobe turns `Math.min(long, int)` into a Janino error) and
  * then throw a context-free ClassCastException from the interpreted
  * fallback. */
private[functions] object VectorTypeChecks {
  def arrayOfDouble(fn: String, what: String, dt: DataType): Option[String] =
    dt match {
      case ArrayType(DoubleType, _) => None
      case other =>
        Some(s"$fn expects $what to be array<double>, got ${other.catalogString}")
    }
  def result(msgs: Option[String]*): TypeCheckResult =
    msgs.flatten.headOption
      .map(TypeCheckResult.TypeCheckFailure(_))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
}

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

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeChecks.result(
      VectorTypeChecks.arrayOfDouble(prettyName, "left", left.dataType),
      VectorTypeChecks.arrayOfDouble(prettyName, "right", right.dataType))

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

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeChecks.result(
      VectorTypeChecks.arrayOfDouble(prettyName, "the input", child.dataType))

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

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeChecks.result(
      VectorTypeChecks.arrayOfDouble(prettyName, "left", left.dataType),
      VectorTypeChecks.arrayOfDouble(prettyName, "right", right.dataType))

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

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeChecks.result(
      VectorTypeChecks.arrayOfDouble(prettyName, "the vector", x.dataType),
      VectorTypeChecks.arrayOfDouble(prettyName, "mu", mu.dataType),
      VectorTypeChecks.arrayOfDouble(prettyName, "w", w.dataType))

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

/** The `nprobe` nearest centroid ids for a vector — the IVF coarse
  * quantizer's assignment/probe kernel in ONE expression of CONSTANT
  * generated-code size. The spelling it replaces —
  * `array_min(array(struct(graft_sqdist(v, c_0), 0), ...))` /
  * `slice(array_sort(...), 1, nprobe)` with one struct per centroid —
  * grows the fused whole-stage-codegen method linearly in `nlist` and
  * passes HotSpot's huge-method JIT limit at production centroid counts
  * (the same cliff ZcaBench measured for the ZCA Project at d=64: the
  * generated code runs interpreted, ~90× slower); this kernel is two
  * nested loops whatever `nlist` is.
  *
  * Distances are Σ(v_i−c_i)² accumulated left-to-right — bit-identical
  * to `graft_sqdist` — and selection orders by (distance, centroid id)
  * ascending with `java.lang.Double.compare` semantics, exactly
  * Spark's struct ordering in the spelling it replaces (NaN greatest,
  * ties to the lower id). Returns array<int> of min(nprobe, nlist)
  * ids. */
case class TopCells(v: Expression, centroids: Expression, nprobe: Expression)
    extends TernaryExpression {

  override def first: Expression = v
  override def second: Expression = centroids
  override def third: Expression = nprobe
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_cells"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeChecks.result(
      VectorTypeChecks.arrayOfDouble(prettyName, "the vector", v.dataType),
      centroids.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => None
        case other => Some(s"$prettyName expects centroids to be " +
          s"array<array<double>>, got ${other.catalogString}")
      },
      nprobe.dataType match {
        case IntegerType => None
        // the generated code does Math.min(nprobe, nlist) into an int —
        // any other integral type must be rejected at analysis, not left
        // to break Janino compilation
        case other =>
          Some(s"$prettyName expects nprobe to be int, got ${other.catalogString}")
      })

  override def nullSafeEval(a: Any, c: Any, np: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cents = c.asInstanceOf[ArrayData]
    val nlist = cents.numElements()
    val want = math.min(np.asInstanceOf[Int], nlist)
    val dists = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      val ci = cents.getArray(i)
      val n = math.min(x.numElements(), ci.numElements())
      var s = 0.0
      var j = 0
      while (j < n) {
        val d = x.getDouble(j) - ci.getDouble(j)
        s += d * d
        j += 1
      }
      dists(i) = s
      i += 1
    }
    val out = new Array[Int](math.max(want, 0))
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < want) {
      var best = -1
      var i2 = 0
      while (i2 < nlist) {
        if (!taken(i2) &&
          (best < 0 || java.lang.Double.compare(dists(i2), dists(best)) < 0))
          best = i2
        i2 += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c, np) => {
      val nlist = ctx.freshName("nlist")
      val want = ctx.freshName("want")
      val dists = ctx.freshName("dists")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val r = ctx.freshName("r")
      val ci = ctx.freshName("ci")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      s"""
         |int $nlist = $c.numElements();
         |int $want = java.lang.Math.min($np, $nlist);
         |if ($want < 0) $want = 0;
         |double[] $dists = new double[$nlist];
         |for (int $i = 0; $i < $nlist; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $ci = $c.getArray($i);
         |  int $n = java.lang.Math.min($a.numElements(), $ci.numElements());
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $d = $a.getDouble($j) - $ci.getDouble($j);
         |    $s += $d * $d;
         |  }
         |  $dists[$i] = $s;
         |}
         |boolean[] $taken = new boolean[$nlist];
         |int[] $out = new int[$want];
         |for (int $r = 0; $r < $want; $r++) {
         |  int $best = -1;
         |  for (int $i = 0; $i < $nlist; $i++) {
         |    if (!$taken[$i] && ($best < 0 ||
         |        java.lang.Double.compare($dists[$i], $dists[$best]) < 0))
         |      $best = $i;
         |  }
         |  $taken[$best] = true;
         |  $out[$r] = $best;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TopCells =
    copy(v = newFirst, centroids = newSecond, nprobe = newThird)
}

/** Public extension entry point: registers the vector kernels in the
  * session's function registry
  * (`.config("spark.sql.extensions", "graft.functions.GraftExtensions")`).
  * Call sites use `functions.call_function("graft_dot", a, b)` etc. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
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

  /** One (identifier, info, builder) row per kernel — the single source
    * of truth shared by the extension hook and [[ensureRegistered]]. */
  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => binary(children, DotProduct.apply)),
    (FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (children: Seq[Expression]) => unary(children, L2Norm.apply)),
    (FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SquaredL2Distance].getName, "graft_sqdist"),
      (children: Seq[Expression]) => binary(children, SquaredL2Distance.apply)),
    (FunctionIdentifier("graft_centered_dot"),
      new ExpressionInfo(classOf[CenteredDot].getName, "graft_centered_dot"),
      (children: Seq[Expression]) => ternary(children, CenteredDot.apply)),
    (FunctionIdentifier("graft_top_cells"),
      new ExpressionInfo(classOf[TopCells].getName, "graft_top_cells"),
      (children: Seq[Expression]) => ternary(children, TopCells.apply)),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles"),
      (children: Seq[Expression]) => binary(children, ShingleArray.apply)),
    (FunctionIdentifier("graft_pairs"),
      new ExpressionInfo(classOf[PairStructs].getName, "graft_pairs"),
      (children: Seq[Expression]) => binary(children, PairStructs.apply)),
    (FunctionIdentifier("graft_bpe"),
      new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe"),
      (children: Seq[Expression]) => binary(children, BpeEncode.apply)),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => unary(children, NfcNormalize.apply)),
    (FunctionIdentifier("graft_md5_split"),
      new ExpressionInfo(classOf[Md5Split].getName, "graft_md5_split"),
      (children: Seq[Expression]) => unary(children, Md5Split.apply)),
    (FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[TokenArray].getName, "graft_tokens"),
      (children: Seq[Expression]) => unary(children, TokenArray.apply)),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => unary(children, Simhash64.apply)),
    (FunctionIdentifier("graft_shingle_xxhashes"),
      new ExpressionInfo(classOf[ShingleXxHashes].getName,
        "graft_shingle_xxhashes"),
      (children: Seq[Expression]) => binary(children, ShingleXxHashes.apply)),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => binary(children, MinhashSig.apply)),
    (FunctionIdentifier("graft_srp_bands"),
      new ExpressionInfo(classOf[SrpBands].getName, "graft_srp_bands"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"expected 4 arguments, got ${children.length}")
        SrpBands(children(0), children(1), children(2), children(3))
      }))

  /** Idempotently registers every graft kernel into `spark`'s function
    * registry. Library entry points that emit `call_function("graft_*")`
    * Columns ([[graft.ml.Dedup]], `workflow.Tokenize`,
    * `ImageOps.randomTransform`) call this so they resolve on sessions
    * built WITHOUT `spark.sql.extensions=graft.functions.GraftExtensions`
    * — the kernels are ordinary Catalyst expressions, only their registry
    * entries are session-scoped. Does NOT inject the optimizer rule
    * ([[graft.plans.LevenshteinBandRule]] is a pure optimization; queries
    * are correct without it — extension-built sessions still get it). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    registrations.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
      else {
        // the identifier exists — verify it IS our kernel: a pre-existing
        // user-registered graft_* of a different shape would otherwise
        // silently shadow the kernel and entry points like Dedup.simhash
        // would compute with the wrong function
        val existing = reg.lookupFunction(id).map(_.getClassName).orNull
        if (existing != info.getClassName)
          throw new IllegalStateException(
            s"function '${id.funcName}' is already registered as " +
              s"$existing, not the graft kernel ${info.getClassName}; " +
              "rename or drop the conflicting function " +
              s"(spark.sessionState.functionRegistry.dropFunction) before " +
              "using graft entry points on this session")
      }
    }
  }

  /** [[ensureRegistered]] against the active/default session, for
    * Column-building helpers that have no session in hand. A Column built
    * with NO session anywhere is left alone — it can only ever be
    * analyzed by a session created later, and creating that session with
    * the extensions (or passing it through any DataFrame entry point,
    * which calls [[ensureRegistered]] directly) resolves the functions. */
  private[graft] def ensureActiveRegistered(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .foreach(ensureRegistered)
}
