package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Vectors}

/** Dedup + similarity operator checks on sf0.001 (no exact duplicates exist
  * at this sf — dedup semantics are exercised on constructed frames). */
class SimilaritySpec extends GraftSuite {

  test("graft_md5_split is bit-identical to the conv/substring digest spelling") {
    import spark.implicits._
    // the kernel replaced md5 -> hex -> substring -> conv on every
    // shingle-digest path; the ORACLES still spell the digest the old
    // way, so bit-identity over real corpus shingles is the load-bearing
    // claim (plus unicode, empty string, null, and the codegen marker)
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(call_function("graft_shingles", $"text", lit(3))).as("s"))
    val extra = Seq("", " ", "héllo wörld ünïcode", "a\u0000b", "😀😀😀")
      .toDF("s")
    val cmp = sh.unionAll(extra)
      .select(
        call_function("graft_md5_split", $"s").as("dg"),
        Similarity.digestLo(md5($"s")).as("lo"),
        Similarity.digestHi(md5($"s")).as("hi"))
    assert(cmp.where($"dg"(0) =!= $"lo" || $"dg"(1) =!= $"hi").count() == 0)
    // null in => null out (array, not [null, null])
    val nullIn = Seq(Option.empty[String]).toDF("s")
      .select(call_function("graft_md5_split", $"s"))
    assert(nullIn.head().isNullAt(0))
    // wrong type fails at analysis with the named message
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(call_function("graft_md5_split", $"x")).head()
    }
    assert(e.getMessage.contains("graft_md5_split expects a string"),
      e.getMessage)
    // the digest projection must stay inside whole-stage codegen
    val plan = sh.select(call_function("graft_md5_split", $"s"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_md5_split")).get
    assert(line.trim.startsWith("*("), s"expected codegen'd Project in:\n$plan")
  }

  test("graft_tokens equals the filter(split) HOF spelling it replaced") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet").select($"text")
    val extra = Seq("", " ", "  a  b ", "one", " leading", "trailing ",
      "héllo  wörld", "😀  😀").toDF("text")
    val cmp = docs.unionAll(extra).select(
      call_function("graft_tokens", $"text").as("k"),
      filter(split($"text", " "), x => x =!= "").as("hof"))
    assert(cmp.where(not($"k" <=> $"hof")).count() == 0)
    // null in => null out; wrong type fails at analysis
    assert(Seq(Option.empty[String]).toDF("text")
      .select(call_function("graft_tokens", $"text")).head().isNullAt(0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("x").select(call_function("graft_tokens", $"x")).head()
    }
    assert(e.getMessage.contains("graft_tokens expects a string"), e.getMessage)
    // the point of the kernel: the projection stays inside whole-stage
    // codegen (the filter HOF is CodegenFallback and evicts its Project)
    val plan = docs.select(call_function("graft_tokens", $"text"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_tokens")).get
    assert(line.trim.startsWith("*("), s"expected codegen'd Project in:\n$plan")
  }

  test("q_dedup_exact keeps every distinct text exactly once") {
    val r = Similarity.qDedupExact(spark, sf)
    assert(r.count() == 500) // sf0.001 has no duplicate texts (DuckDB-pinned)
    assert(r.where(col("n_copies") =!= 1).count() == 0)
  }

  test("exact dedup collapses injected duplicates to the min doc_id") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon"), (4L, "alpha beta gamma"), (5L, "zeta"))
      .toDF("doc_id", "text")
    val r = df.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keep_doc"), count(lit(1)).as("n_copies"))
    val kept = r.collect().map(x => x.getAs[Long]("keep_doc") -> x.getAs[Long]("n_copies")).toMap
    assert(kept == Map(1L -> 3L, 3L -> 1L, 5L -> 1L))
    // idempotence: dedup of the dedup result is a no-op
    val again = r.select($"keep_doc".as("doc_id"), $"h".as("text"))
      .groupBy($"text").agg(count(lit(1)).as("c"))
    assert(again.where($"c" =!= 1).count() == 0)
  }

  test("q_dedup_shingle_jaccard pairs are ordered, deduped, above threshold") {
    val r = rows(Similarity.qDedupShingleJaccard(spark, sf))
    r.foreach { x =>
      assert(x.getAs[Long]("doc_a") < x.getAs[Long]("doc_b"))
      val j = x.getAs[Double]("jaccard")
      assert(j >= 0.8 && j <= 1.0)
    }
    val pairs = r.map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs.distinct.size == pairs.size)
  }

  test("q_embed_neardup candidates satisfy the cosine threshold and ordering") {
    val r = rows(Similarity.qEmbedNeardup(spark, sf))
    assert(r.nonEmpty, "LSH buckets must yield at least one near-dup pair")
    r.foreach { x =>
      assert(x.getAs[Long]("id_a") < x.getAs[Long]("id_b"))
      assert(x.getAs[Double]("cos") >= 0.4)
    }
  }

  test("q_embed_neardup output is a subset of the exact all-pairs result") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(transform($"v", x => x * x), lit(0.0), (a, x) => a + x)))
    val exact = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("cos",
        aggregate(zip_with($"a.v", $"b.v", (x, y) => x * y), lit(0.0), (a, x) => a + x)
          / ($"a.nrm" * $"b.nrm"))
      .where($"cos" >= 0.4)
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val lsh = rows(Similarity.qEmbedNeardup(spark, sf))
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH candidates must never invent pairs")
    assert(lsh.nonEmpty && exact.nonEmpty)
  }

  test("q_cosine_topk: 10 probes x 5 ranked neighbors, no self-matches") {
    val r = Similarity.qCosineTopk(spark, sf)
    assert(r.count() == 50)
    assert(r.where(col("p_id") === col("vec_id")).count() == 0)
    val perProbe = r.groupBy("p_id").count()
    assert(perProbe.where(col("count") =!= 5).count() == 0)
    // ranks descend in cosine within each probe
    val bad = r.as("x").join(r.as("y"),
      col("x.p_id") === col("y.p_id") && col("x.rank") === col("y.rank") - 1)
      .where(col("x.cos") < col("y.cos")).count()
    assert(bad == 0, "cosine must be non-increasing with rank")
  }

  test("cosine similarity is symmetric (probe/candidate swap)") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .where($"vec_id" < 20)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val dots = e.as("a").crossJoin(e.as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
        round(aggregate(zip_with($"a.v", $"b.v", (x, y) => x * y), lit(0.0), (a, x) => a + x), 9).as("d"))
    val asym = dots.as("x").join(dots.as("y"),
      $"x.i" === $"y.j" && $"x.j" === $"y.i" && $"x.d" =!= $"y.d").count()
    assert(asym == 0)
  }

  test("q_multimodal_join joins every document to its embedding") {
    val r = Similarity.qMultimodalJoin(spark, sf)
    assert(r.count() == 500)
    assert(r.where(col("vec_norm") <= 0).count() == 0)
  }

  test("q_dedup_minhash is a subset of brute-force Jaccard >= 0.8 over the same digests") {
    import spark.implicits._
    val P = Similarity.MinhashP
    // same digest space as the query (md5-prefix mod P), uncapped all-pairs
    val shs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id",
        array_distinct(transform(call_function("graft_shingles", $"text", lit(3)),
          sh => conv(substring(md5(sh), 1, 15), 16, 10).cast("long") % P)).as("shs"))
    val brute = shs.as("a").join(shs.as("b"), $"a.doc_id" < $"b.doc_id")
      .withColumn("n_inter", size(array_intersect($"a.shs", $"b.shs")))
      .withColumn("j", $"n_inter".cast("double") /
        (size($"a.shs") + size($"b.shs") - $"n_inter"))
      .where($"j" >= 0.8)
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"), $"j")
    val truth = rows(brute).map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows(Similarity.qDedupMinhash(spark, sf))
    got.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val nb = r.getAs[Long]("n_bands")
      assert(nb >= 1 && nb <= Similarity.MinhashBands)
      assert(r.getAs[Double]("jaccard") >= 0.8)
    }
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs.subsetOf(truth),
      s"verify step must kill false candidates: ${gotPairs -- truth}")
    // identical shingle sets agree on every hash, hence on every band:
    // jaccard-1.0 pairs can never be missed by the blocking
    val identical = rows(brute.where($"j" >= 1.0)).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(identical.subsetOf(gotPairs),
      s"exact duplicates must always share all bands: ${identical -- gotPairs}")
  }

  test("q_ann_ivf: ranked per-probe lists with true cosines, no self-matches") {
    import spark.implicits._
    val r = rows(Similarity.qAnnIvf(spark, sf))
    assert(r.nonEmpty)
    val byProbe = r.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 10, s"10 probes expected, got ${byProbe.keySet}")
    byProbe.foreach { case (p, rs) =>
      assert(rs.size <= Similarity.IvfK)
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks == (1L to rs.size).toSeq, s"probe $p ranks: $ranks")
      val coss = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b },
        s"probe $p cosines must be rank-ordered: $coss")
      assert(rs.forall(_.getAs[Long]("cand_id") != p), "no self-matches")
    }
    // every reported cosine is the TRUE cosine of that pair (the index
    // narrows the candidate set; it must never distort scores)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", call_function("graft_norm", $"v"))
    val expected = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        round(call_function("graft_dot", $"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"), 6).as("cos"))
      .collect()
      .map(x => (Set(x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    r.foreach { x =>
      val key = Set(x.getAs[Long]("probe_id"), x.getAs[Long]("cand_id"))
      assert(math.abs(expected(key) - x.getAs[Double]("cos")) < 1e-9,
        s"reported cosine must equal the exact cosine for $key")
    }
  }

  test("q_edit_distance pairs share a blocking noun and bounded distance") {
    val r = rows(graft.ops.Scalar.qEditDistance(spark, sf))
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("key_a") < x.getAs[Long]("key_b"))
      val d = x.getAs[Long]("edit_dist")
      assert(d >= 1 && d <= 4)
      val noun = (s: String) => s.split(' ').last
      assert(noun(x.getAs[String]("name_a")) == noun(x.getAs[String]("name_b")),
        "pairs must come from the same block")
    }
  }

  test("q_curation_pipeline accounting is closed over the corpus") {
    import spark.implicits._
    val r = rows(Similarity.qCurationPipeline(spark, sf))
    assert(r.map(_.getAs[String]("lang")).toSet ==
      spark.read.parquet(s"$sf/documents.parquet")
        .select($"lang").distinct().collect().map(_.getString(0)).toSet,
      "every language present in the corpus must be accounted for")
    assert(r.map(_.getAs[Long]("docs_in")).sum == 500)
    r.foreach { x =>
      assert(x.getAs[Long]("docs_kept") <= x.getAs[Long]("docs_in"))
      val rate = x.getAs[Double]("keep_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q_dedup_simhash: identical docs identical, near-identical close") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-simhash").toString
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    Seq((0L, base), (1L, base), // exact duplicate pair
        (2L, base + "extra token"), // near-duplicate
        (3L, "совершенно другой текст не похожий ни на что прежнее вовсе"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val fp = Similarity.qDedupSimhash(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(fp(0L) == fp(1L), "identical text must fingerprint identically")
    assert(hamming(fp(0L), fp(2L)) <= 12,
      s"near-duplicate should be close: ${hamming(fp(0L), fp(2L))}")
    assert(hamming(fp(0L), fp(3L)) > hamming(fp(0L), fp(2L)),
      "unrelated text must be farther than a near-duplicate")
  }

  test("q_boilerplate_frac: row-complete, bounded, and df-threshold-consistent") {
    import spark.implicits._
    val r = rows(Similarity.qBoilerplateFrac(spark, sf))
    assert(r.size == spark.read.parquet(s"$sf/documents.parquet").count())
    r.foreach { row =>
      val n = row.getAs[Long]("n_shingles")
      val b = row.getAs[Long]("n_boiler")
      val f = row.getAs[Double]("boiler_frac")
      assert(b >= 0 && b <= n, s"boiler count $b out of [0, $n]")
      assert(f >= 0.0 && f <= 1.0)
      if (n > 0) assert(math.abs(f - math.rint(b.toDouble / n * 1e6) / 1e6) < 1e-9)
    }
    // hand-built corpus: a shingle shared by 5 docs IS boilerplate, one
    // shared by 4 is NOT (threshold = 5)
    val tmp = java.nio.file.Files.createTempDirectory("graft-boiler").toString
    val common = "click here to subscribe"        // in 5 docs
    val nearCommon = "all rights reserved now"    // in 4 docs
    val docs = (0 until 5).map(i => (i.toLong, s"$common unique$i token$i extra$i")) ++
      (5 until 9).map(i => (i.toLong, s"$nearCommon unique$i token$i extra$i"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val m = Similarity.qBoilerplateFrac(spark, tmp).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_boiler")).toMap
    assert((0L until 5L).forall(m(_) >= 2),
      "the 5-doc shared phrase's shingles must be flagged")
    assert((5L until 9L).forall(m(_) == 0),
      "a 4-doc phrase is below the df threshold")
  }

  test("q_contamination flags a planted train->test copy") {
    import spark.implicits._
    // find one id in the train bucket (< 80) and one in test (>= 90)
    // using the query's own hash spelling
    val buckets = spark.range(200)
      .select($"id", (conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
        .cast("long") % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 80 => id }.get
    val testId = buckets.collectFirst { case (id, b) if b >= 90 => id }.get
    val leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tmp = java.nio.file.Files.createTempDirectory("graft-contam").toString
    (Seq((trainId, leaked), (testId, leaked)) ++
      buckets.keys.filterNot(Set(trainId, testId)).take(20)
        .map(i => (i, s"unrelated$i filler$i text$i goes$i here$i now$i")))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val r = rows(Similarity.qContamination(spark, tmp))
    val hit = r.find(x => x.getAs[Long]("test_doc") == testId &&
      x.getAs[Long]("train_doc") == trainId)
    assert(hit.isDefined, s"planted copy $trainId->$testId not flagged: $r")
    assert(hit.get.getAs[Double]("overlap_frac") == 1.0,
      "an exact copy is fully covered")
  }

  test("q_dup_rate_by_source accounts for every near-dup pair exactly once") {
    val cells = rows(Similarity.qDupRateBySource(spark, sf))
    val nPairs = Similarity.qDedupShingleJaccard(spark, sf).count()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum == nPairs,
      "matrix cells partition the pair set")
    val shareSum = cells.map(_.getAs[Double]("pair_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-2)
    cells.foreach { row =>
      assert(row.getAs[String]("src_lo") <= row.getAs[String]("src_hi"),
        "cells are canonical (unordered)")
    }
  }

  test("q_shingle_cosine scores are valid and cover the Jaccard near-dups") {
    val cos = rows(Similarity.qShingleCosine(spark, sf))
    assert(cos.nonEmpty)
    cos.foreach { row =>
      val c = row.getAs[Double]("cosine")
      assert(c >= 0.6 && c <= 1.0 + 1e-9, s"cosine $c out of range")
      assert(row.getAs[Long]("n_common") > 0L)
      assert(row.getAs[Long]("doc_a") < row.getAs[Long]("doc_b"))
    }
    // the idf-weighted scorer must surface every set-Jaccard >= 0.8 pair:
    // same digesting, same candidate cap, and a 0.8-overlap pair cannot
    // cosine below 0.6 on this corpus (weights are near-uniform idf)
    val jac = rows(Similarity.qDedupShingleJaccard(spark, sf))
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val cosPairs = cos
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(jac.subsetOf(cosPairs),
      s"jaccard pairs missing from cosine: ${jac -- cosPairs}")
  }

  test("q_shingle_containment: directions match the pair stats exactly") {
    import spark.implicits._
    val r = Similarity.qShingleContainment(spark, sf)
    assert(r.count() > 0, "fixture corpus contains containment pairs")
    assert(r.where($"containment" < 0.9 || $"containment" > 1.0).count() == 0)
    val got = r.select($"doc_sub", $"doc_super").as[(Long, Long)].collect().toSet
    // independent direction-by-direction expansion of the shared pair
    // stats: the query's explode/role assignment must reproduce it exactly
    val expected = Similarity.shinglePairStats(spark, sf)
      .select($"doc_a", $"doc_b", $"n_inter", $"n_a", $"n_b")
      .collect().flatMap { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (inter, na, nb) =
          (row.getLong(2).toDouble, row.getLong(3), row.getLong(4))
        Seq.concat(
          if (inter / na >= 0.9) Some((a, b)) else None,
          if (inter / nb >= 0.9) Some((b, a)) else None)
      }.toSet
    assert(got == expected,
      s"direction sets differ: missing=${expected -- got} extra=${got -- expected}")
    // a high-jaccard pair with comparable sizes is contained both ways —
    // near-identical docs must appear twice
    val both = got.filter { case (a, b) => got.contains((b, a)) }
    assert(both.nonEmpty, "near-identical docs must emit both directions")
  }

  test("q_ann_recall reconciles with AnnSpec's recall guarantee") {
    import spark.implicits._
    val r = Similarity.qAnnRecall(spark, sf).head()
    val (ne, nh) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hits"))
    assert(ne == Similarity.qCosineTopk(spark, sf).count())
    assert(nh <= ne)
    val recall = r.getAs[Long]("recall_ppm")
    assert(recall == nh * 1000000 / ne)
    // sanity floor only — sf0.001's 500-vector quantizer measures ~0.48;
    // the tuned-recall guarantee lives in AnnSpec's monotone recall curve
    assert(recall >= 300000, s"IVF recall ${recall} ppm collapsed")
  }

  test("q_knn_classify: votes bounded by k, prediction among neighbor labels") {
    import spark.implicits._
    val r = Similarity.qKnnClassify(spark, sf)
    assert(r.count() == 10, "one row per probe")
    assert(r.where($"votes" < 1 || $"votes" > 5).count() == 0)
    // the predicted label must appear among the probe's top-5 neighbors
    val top = Similarity.qCosineTopk(spark, sf)
      .join(tables.Tables.embeddings(spark, sf)
        .select($"vec_id", $"label".as("nbr_label")), "vec_id")
      .select($"p_id", $"nbr_label").distinct()
    val bad = r.join(top,
      r("p_id") === top("p_id") && r("predicted") === top("nbr_label"),
      "left_anti").count()
    assert(bad == 0, "every prediction is a neighbor's label")
  }

  test("q_incremental_dedup is exactly the straddling slice of the pair set") {
    import spark.implicits._
    val r = Similarity.qIncrementalDedup(spark, sf)
    val maxId = spark.read.parquet(s"$sf/documents.parquet")
      .agg(max($"doc_id")).head.getLong(0)
    val split = (maxId + 1) * 4 / 5
    assert(r.where($"new_doc" < split || $"dup_of" >= split).count() == 0,
      "every row pairs an increment doc with a standing-corpus doc")
    val all = Similarity.qDedupShingleJaccard(spark, sf)
    val expected = all
      .where($"doc_a" < split && $"doc_b" >= split).count()
    assert(r.count() == expected)
  }

  test("q_lsh_quality: counts reconcile with the two pair sets; recall is high") {
    import spark.implicits._
    val r = Similarity.qLshQuality(spark, sf).head()
    val nCand = r.getAs[Long]("n_candidates")
    val nTruth = r.getAs[Long]("n_truth")
    val nHits = r.getAs[Long]("n_hits")
    assert(nHits <= math.min(nCand, nTruth))
    assert(nTruth == Similarity.qDedupShingleJaccard(spark, sf).count())
    assert(nCand > 0 && nTruth > 0)
    // 16x4 banding at jaccard >= 0.8: P(candidate) = 1-(1-j^4)^4 >= 0.87 —
    // on the small truth set anything below 0.5 means banding is broken
    assert(r.getAs[Double]("recall") >= 0.5,
      s"LSH recall ${r.getAs[Double]("recall")} collapsed")
    // advisor (round 20): the full-outer-join count rewrite is sound only
    // while both pair sets are per-side UNIQUE — a future upstream change
    // emitting duplicate pairs would inflate all three sums
    // multiplicatively rather than just the affected count. Pin the
    // structural guarantee explicitly.
    val cand = Similarity.minhashCore(spark, sf)._2.select("doc_a", "doc_b")
    assert(cand.count() == cand.distinct().count(),
      "minhash candidate pairs must be unique per (doc_a, doc_b)")
    val truth = Similarity.shingleJaccardPairs(spark, sf)
      .select("doc_a", "doc_b")
    assert(truth.count() == truth.distinct().count(),
      "truth pairs must be unique per (doc_a, doc_b)")
  }

  test("q_semantic_clusters: components cover exactly the paired vectors") {
    import spark.implicits._
    val r = Similarity.qSemanticClusters(spark, sf)
    val pairs = Similarity.qEmbedNeardup(spark, sf)
    val nodes = pairs.select($"id_a".as("v")).union(pairs.select($"id_b".as("v")))
      .distinct().count()
    assert(r.count() == nodes, "every paired vector lands in one cluster")
    assert(r.where($"cluster_size" < 2).count() == 0,
      "clusters come from pairs, so min size is 2")
    // both endpoints of every pair share a component
    val comp = r.select($"vec_id", $"component")
    val bad = pairs
      .join(comp.withColumnsRenamed(Map("vec_id" -> "id_a", "component" -> "ca")), "id_a")
      .join(comp.withColumnsRenamed(Map("vec_id" -> "id_b", "component" -> "cb")), "id_b")
      .where($"ca" =!= $"cb").count()
    assert(bad == 0, "near-dup pairs must never straddle two components")
  }

  test("q_semdedup matches a driver-side cluster-blocked recompute") {
    val r = rows(Similarity.qSemdedup(spark, sf))
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    // driver reference: same centroids, same threshold, same keeper rule
    val assign = rows(Vectors.qKmeansAssignFixed(spark, sf))
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(x => x.getLong(0) ->
        x.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val naive = (for {
      x <- ids; y <- ids if x < y && assign(x) == assign(y)
      c = cos(vecs(x), vecs(y)) if c >= 0.4
    } yield (x, y, c))
      .groupBy(_._2).map { case (y, ps) => ps.minBy(_._1) }
      .toSeq.sortBy(_._2)
      .map(p => (assign(p._1), p._1, p._2,
        BigDecimal(p._3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(r == naive, s"got $r\nwant $naive")
    assert(r.nonEmpty, "sf0.001 embeddings carry within-cluster near-dups")
  }

  test("q_semdedup_recall reconciles with exact truth and cluster blocking") {
    val Seq(row) = rows(Similarity.qSemdedupRecall(spark, sf))
    val (nExact, nBlocked, ppm) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nBlocked <= nExact, "blocking can only lose pairs, never invent")
    assert(ppm == nBlocked * 1000000L / nExact)
    // driver recompute of both counts
    val assign = rows(Vectors.qKmeansAssignFixed(spark, sf))
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(x => x.getLong(0) ->
        x.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val exactPairs = for (x <- ids; y <- ids
      if x < y && cos(vecs(x), vecs(y)) >= 0.4) yield (x, y)
    val blockedPairs = exactPairs.filter { case (x, y) => assign(x) == assign(y) }
    assert(nExact == exactPairs.size.toLong, s"exact: $nExact vs ${exactPairs.size}")
    assert(nBlocked == blockedPairs.size.toLong)
  }

  test("q_hybrid_rrf: scores reconcile with the two arms' ranks") {
    val r = rows(Similarity.qHybridRrf(spark, sf))
    assert(r.size <= 20 && r.nonEmpty)
    r.foreach { x =>
      val (rLex, rSem, nano) = (x.getLong(1), x.getLong(2), x.getLong(3))
      assert(rLex >= 0L && rLex <= 50L && rSem >= 0L && rSem <= 50L)
      assert(rLex > 0L || rSem > 0L, "fused doc must appear in some arm")
      val expect = (if (rLex > 0) 1.0 / (60.0 + rLex) else 0.0) +
        (if (rSem > 0) 1.0 / (60.0 + rSem) else 0.0)
      assert(math.abs(nano - expect * 1e9) <= 1.0,
        s"score_nano must equal the RRF formula: $x")
    }
    // presentation order is (score desc, doc_id)
    val key = r.map(x => (-x.getLong(3), x.getLong(0)))
    assert(key == key.sorted, "top-20 must be sorted by (score desc, doc_id)")
    // a doc ranked in BOTH arms outscores any doc seen by one arm at the
    // same or worse ranks — the whole point of fusion
    val both = r.filter(x => x.getLong(1) > 0 && x.getLong(2) > 0)
    val solo = r.filter(x => x.getLong(1) == 0 || x.getLong(2) == 0)
    for (b <- both; s <- solo
         if s.getLong(1).max(s.getLong(2)) >= b.getLong(1).max(b.getLong(2)))
      assert(b.getLong(3) > s.getLong(3))
  }

  test("q_simhash_neardup equals brute-force pairs at hamming <= 3 (perfect recall)") {
    // 4 disjoint 15-bit bands catch EVERY pair within radius 3 by
    // pigeonhole — so the banded query must equal the all-pairs scan,
    // not approximate it
    val fp = Similarity.qDedupSimhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint"))
    val brute = (for {
      (ida, fa) <- fp; (idb, fb) <- fp
      if ida < idb && java.lang.Long.bitCount(fa ^ fb) <= Similarity.SimhashMaxHamming
    } yield (ida, idb, java.lang.Long.bitCount(fa ^ fb))).toSet
    val got = rows(Similarity.qSimhashNeardup(spark, sf))
      .map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"),
        x.getAs[Int]("hamming"))).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  test("q_decontam_ngram accounts for every train doc; planted copy flagged") {
    import spark.implicits._
    val r = rows(Similarity.qDecontamNgram(spark, sf))
    val nTrain = spark.read.parquet(s"$sf/documents.parquet")
      .where((conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10)
        .cast("long") % 100) < 80).count()
    assert(r.map(_.getAs[Long]("n_train")).sum == nTrain)
    r.foreach { x =>
      val (t, c, p) = (x.getAs[Long]("n_train"),
        x.getAs[Long]("n_contaminated"), x.getAs[Long]("drop_ppm"))
      assert(c >= 0 && c <= t)
      assert(p == c * 1000000L / t)
    }
    // planted: a train doc sharing an exact 13-gram with an eval doc is
    // flagged; sharing only 12 tokens is not
    val buckets = spark.range(200)
      .select($"id", (conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
        .cast("long") % 100).as("b"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val trainIds = buckets.collect { case (id, b) if b < 80 => id }.toSeq.sorted
    val evalId = buckets.collectFirst { case (id, b) if b >= 90 => id }.get
    val thirteen = (1 to 13).map(i => s"tok$i").mkString(" ")
    val twelve = (1 to 12).map(i => s"tok$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    (Seq((trainIds(0), s"leading words $thirteen trailing text here"),
      (trainIds(1), s"only a partial $twelve overlap stays clean here"),
      (evalId, s"$thirteen padded with other eval words")) ++
      trainIds.drop(2).take(10).zipWithIndex.map { case (id, i) =>
        (id, s"unrelated$i filler$i text$i goes$i here$i") })
      .map { case (id, tx) => (id, tx, s"s${id % 3}") }
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val pr = rows(Similarity.qDecontamNgram(spark, tmp))
    assert(pr.map(_.getAs[Long]("n_contaminated")).sum == 1,
      s"exactly the planted 13-gram copy must be flagged: $pr")
    val hitSrc = s"s${trainIds(0) % 3}"
    assert(pr.find(_.getAs[String]("source") == hitSrc)
      .get.getAs[Long]("n_contaminated") >= 1)
  }

  test("q_ngram_coverage is bounded and detects a planted eval-in-train copy") {
    import spark.implicits._
    val r = rows(Similarity.qNgramCoverage(spark, sf))
    r.foreach { x =>
      val (g, c, p) = (x.getAs[Long]("n_grams"),
        x.getAs[Long]("n_covered"), x.getAs[Long]("coverage_ppm"))
      assert(c >= 0 && c <= g)
      assert(p == c * 1000000L / g)
    }
    // planted: an eval doc fully contained in a train doc → its source's
    // coverage is total; an uncovered eval doc's source is zero
    val buckets = spark.range(200)
      .select($"id", (conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
        .cast("long") % 100).as("b"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 80 => id }.get
    val evalIds = buckets.collect { case (id, b) if b >= 90 => id }.toSeq.sorted
    val fifteen = (1 to 15).map(i => s"tok$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-cov").toString
    Seq((trainId, s"prefix words $fifteen suffix words here", "sA"),
      (evalIds(0), fifteen, "sA"),
      (evalIds(1), (1 to 20).map(i => s"other$i").mkString(" "), "sB"))
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val pr = rows(Similarity.qNgramCoverage(spark, tmp))
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("coverage_ppm")).toMap
    assert(pr("sA") == 1000000L, s"fully-contained eval doc: $pr")
    assert(pr("sB") == 0L, s"unrelated eval doc: $pr")
  }

  test("q_dedup_keep_best keeps the longest member of every cluster") {
    import spark.implicits._
    val clusters = rows(Similarity.qDedupClusters(spark, sf))
      .groupBy(_.getAs[Long]("component"))
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", size(filter(split($"text", " "), x => x =!= ""))
        .cast("long").as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val r = rows(Similarity.qDedupKeepBest(spark, sf))
    assert(r.map(_.getAs[Long]("component")).toSet == clusters.keySet)
    r.foreach { x =>
      val comp = x.getAs[Long]("component")
      val members = clusters(comp).map(_.getAs[Long]("doc_id"))
      assert(x.getAs[Long]("n_members") == members.size)
      assert(x.getAs[Long]("n_dropped") == members.size - 1)
      val keeper = x.getAs[Long]("keeper_doc")
      assert(members.contains(keeper))
      val best = members.map(m => (-toks(m), m)).min
      assert(keeper == best._2, s"cluster $comp keeper $keeper != ${best._2}")
      assert(x.getAs[Long]("keeper_tokens") == toks(keeper))
    }
  }

  test("q_fuzzy_join matches a driver-side blocked-Levenshtein replay") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    val noun = (n: String) => n.split(' ').last
    val capped = parts.groupBy(p => (p._3, noun(p._2))).values
      .flatMap(_.sortBy(_._1).take(32)).toSeq
    val expected = (for {
      a <- capped; b <- capped
      if a._3 == b._3 && noun(a._2) == noun(b._2) && a._1 < b._1
      d = lev(a._2, b._2) if d >= 1 && d <= 6
    } yield (a._1, b._1, a._2, b._2, d.toLong))
      .sortBy(t => (t._5, t._1, t._2)).take(20)
    val got = rows(Similarity.qFuzzyJoin(spark, sf)).map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got == expected)
    assert(got.nonEmpty, "the name space must contain close pairs at this sf")
  }

  test("q_entity_resolution matches a union-find replay of the pair core") {
    def lev2(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    val names = parts.map(p => p._1 -> p._2).toMap
    val noun = (n: String) => n.split(' ').last
    val capped = parts.groupBy(p => (p._3, noun(p._2))).values
      .flatMap(_.sortBy(_._1).take(32)).toSeq
    val pairs = for {
      a <- capped; b <- capped
      if a._3 == b._3 && noun(a._2) == noun(b._2) && a._1 < b._1
      d = lev2(a._2, b._2) if d >= 1 && d <= 6
    } yield (a._1, b._1)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r); r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.groupBy(find).toSeq.sortBy(_._1)
      .map { case (root, ms) => (root, names(root), ms.size.toLong) }
    val got = rows(Similarity.qEntityResolution(spark, sf))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got == expected)
    assert(got.forall(_._3 >= 2), "every resolved entity links >= 2 records")
  }
}
