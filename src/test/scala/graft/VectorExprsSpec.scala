package graft

import org.apache.spark.sql.functions._

/** Native codegen'd vector kernels (graft.functions.VectorExprs) vs the
  * interpreted higher-order-function spellings: must agree bit-for-bit
  * (same left-to-right summation), and must survive codegen compilation. */
class VectorExprsSpec extends GraftSuite {

  import spark.implicits._

  private lazy val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))

  test("graft_dot is bit-identical to aggregate(zip_with(...)) self-dot") {
    val cmp = vecs.select(
      call_function("graft_dot", $"v", $"v").as("native"),
      aggregate(zip_with($"v", $"v", (x, y) => x * y), lit(0.0),
        (a, x) => a + x).as("hof"))
    assert(cmp.where($"native" =!= $"hof").count() == 0)
  }

  test("graft_norm is bit-identical to sqrt(aggregate(transform(...)))") {
    val cmp = vecs.select(
      call_function("graft_norm", $"v").as("native"),
      sqrt(aggregate(transform($"v", x => x * x), lit(0.0),
        (a, x) => a + x)).as("hof"))
    assert(cmp.where($"native" =!= $"hof").count() == 0)
  }

  test("graft_sqdist is bit-identical to the aggregate+pow spelling") {
    val w = array((1 to 64).map(i => lit(i * 0.01 - 0.32)): _*)
    val cmp = vecs.select(
      call_function("graft_sqdist", $"v", w).as("native"),
      aggregate(sequence(lit(1), lit(64)), lit(0.0), (acc, i) =>
        acc + pow(element_at($"v", i) - (i.cast("double") * 0.01 - 0.32), 2))
        .as("hof"))
    assert(cmp.where($"native" =!= $"hof").count() == 0)
  }

  test("kernels compute correct values on known vectors") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      call_function("graft_dot", $"a", $"b").as("d"),
      call_function("graft_norm", $"a").as("n"),
      call_function("graft_sqdist", $"a", $"b").as("s")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-15)
    assert(r.getDouble(2) == 27.0)
  }

  test("graft_centered_dot is bit-identical to graft_dot over the zip_with centering") {
    // the ZCA serving kernel: one ternary expression vs the two-step
    // spelling it replaced (which left the centering as CodegenFallback)
    val mu = array((1 to 64).map(i => lit(math.sin(i * 0.17))): _*)
    val w = array((1 to 64).map(i => lit(i * 0.01 - 0.32)): _*)
    val cmp = vecs.select(
      call_function("graft_centered_dot", $"v", mu, w).as("native"),
      call_function("graft_dot",
        zip_with($"v", mu, (x, m) => x - m), w).as("hof"))
    assert(cmp.where($"native" =!= $"hof").count() == 0)
    // known values: (1-1)*10 + (2-1)*20 + (3-2)*30 = 50
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 1.0, 2.0),
      Array(10.0, 20.0, 30.0))).toDF("x", "m", "w")
    val r = df.select(call_function("graft_centered_dot",
      $"x", $"m", $"w")).head()
    assert(r.getDouble(0) == 50.0)
    // null input => null output (ternary null-safety)
    val withNull = Seq((Option.empty[Array[Double]],
      Some(Array(1.0)), Some(Array(2.0)))).toDF("x", "m", "w")
    assert(withNull.select(call_function("graft_centered_dot",
      $"x", $"m", $"w")).head().isNullAt(0))
    // the projection must carry the whole-stage codegen marker. NB: the
    // input is cast via the array-level Cast, not transform(_.cast) —
    // CollapseProject inlines a single-use transform lambda into this
    // Project and its CodegenFallback kicks the whole projection out of
    // whole-stage codegen (the zcaExprTransformer uses the same Cast
    // spelling for exactly this reason)
    val plan = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("v"))
      .select(call_function("graft_centered_dot", $"v", mu, w))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_centered_dot")).get
    assert(line.trim.startsWith("*("), s"expected codegen'd Project in:\n$plan")
  }

  test("graft_top_cells equals the struct/array_sort spelling it replaced") {
    // the IVF assignment/probe kernel vs the per-centroid struct
    // spelling whose fused method grows linearly in nlist (the JIT
    // cliff): same distances (left-to-right sqdist), same ordering
    // contract (ascending (distance, id), ties to the lower id)
    val rng = new scala.util.Random(7)
    val cents = Array.fill(13)(Array.fill(64)(rng.nextGaussian()))
    val centsLit = array(cents.toIndexedSeq.map(c => lit(c)): _*)
    def oldSpelling(v: org.apache.spark.sql.Column, nprobe: Int) = {
      val dists = cents.zipWithIndex.map { case (c, i) =>
        struct(call_function("graft_sqdist", v, lit(c)).as("d"),
          lit(i).as("c"))
      }
      transform(slice(array_sort(array(dists.toIndexedSeq: _*)), 1, nprobe),
        s => s.getField("c"))
    }
    val cmp = vecs.select(
      call_function("graft_top_cells", $"v", centsLit, lit(5)).as("kernel"),
      oldSpelling($"v", 5).as("old"))
    assert(cmp.where($"kernel" =!= $"old").count() == 0,
      "kernel and struct spelling must rank identically")
    // exact ties break to the lower id: duplicate centroids
    val dup = Array(Array(1.0, 2.0), Array(0.0, 0.0), Array(1.0, 2.0))
    val dupLit = array(dup.toIndexedSeq.map(c => lit(c)): _*)
    val tied = Seq(Tuple1(Array(1.0, 2.0))).toDF("x")
      .select(call_function("graft_top_cells", $"x", dupLit, lit(3)))
      .head().getSeq[Int](0)
    assert(tied == Seq(0, 2, 1), s"ties must break to the lower id: $tied")
    // nprobe past nlist truncates; null input => null output
    val all = Seq(Tuple1(Array(0.0, 0.0))).toDF("x")
      .select(call_function("graft_top_cells", $"x", dupLit, lit(99)))
      .head().getSeq[Int](0)
    assert(all.size == 3)
    val nullIn = Seq(Tuple1(Option.empty[Array[Double]])).toDF("x")
      .select(call_function("graft_top_cells", $"x", dupLit, lit(1)))
    assert(nullIn.head().isNullAt(0))
    // constant-size generated code: the projection must carry the
    // whole-stage codegen marker even at a width where the struct
    // spelling's fused method would be enormous
    val wide = array((0 until 200).map(k =>
      lit(Array.tabulate(64)(i => (k * 31 + i * 17) % 19 / 19.0))): _*)
    val plan = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("v"))
      .select(call_function("graft_top_cells", $"v", wide, lit(4)))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_top_cells")).get
    assert(line.trim.startsWith("*("), s"expected codegen'd Project in:\n$plan")
  }

  test("wrong-typed inputs fail at analysis with graft-named messages") {
    // AbstractDataType is private[sql] in Spark 4, so the kernels cannot
    // ride the ExpectsInputTypes auto-cast path — call sites cast. A
    // WRONG type must therefore fail at analysis with a named message,
    // not compile broken generated Java (a long nprobe turns
    // Math.min(long, int) into a Janino error) and then throw a
    // context-free ClassCastException from the interpreted fallback.
    val df = Seq((Array(1.0f, 2.0f), Array(1.0, 2.0), 3L)).toDF("f", "d", "n")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_dot", $"f", $"d")).head()
    }
    assert(e1.getMessage.contains(
      "graft_dot expects left to be array<double>, got array<float>"),
      e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_norm", $"n")).head()
    }
    assert(e2.getMessage.contains(
      "graft_norm expects the input to be array<double>"), e2.getMessage)
    val cents = array(lit(Array(0.0, 0.0)))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_top_cells", $"d", cents, lit(3L))).head()
    }
    assert(e3.getMessage.contains(
      "graft_top_cells expects nprobe to be int, got bigint"), e3.getMessage)
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_top_cells", $"d", $"d", lit(1))).head()
    }
    assert(e4.getMessage.contains(
      "graft_top_cells expects centroids to be array<array<double>>"),
      e4.getMessage)
    val e5 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_centered_dot", $"d", $"f", $"d")).head()
    }
    assert(e5.getMessage.contains(
      "graft_centered_dot expects mu to be array<double>"), e5.getMessage)
    // the sanctioned spelling — an explicit cast — still works
    assert(df.select(call_function("graft_dot",
      $"f".cast("array<double>"), $"d")).head().getDouble(0) == 5.0)
  }

  test("kernels handle nulls and stay inside whole-stage codegen") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None, Some(Array(1.0, 1.0)))).toDF("a", "b")
    val out = df.select(call_function("graft_dot", $"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0), "null input => null output")
    // the projection containing graft_dot must carry the whole-stage
    // codegen marker (`*(stage) Project [graft_dot(...)`)
    val plan = vecs.select(call_function("graft_dot", $"v", $"v"))
      .queryExecution.executedPlan.toString
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).get
    assert(dotLine.trim.startsWith("*("), s"expected codegen'd Project in:\n$plan")
  }
}
