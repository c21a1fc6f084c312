package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Dedup + similarity-search surface (north-star operators; the reference's
  * nearest machinery is its kernel-matrix / KNN code, SURVEY.md §2.B).
  *
  * Scale design (100 TB):
  *  - exact dedup: hash-partitioned groupBy on a content hash — never
  *    `dropDuplicates` on raw text, the 16-byte digest is the shuffle key.
  *  - near-dup (text): shingle inverted index — digested posting lists
  *    with a document-frequency cap that prunes hot shingles before any
  *    pair is emitted; candidate pairs are generated inline from each
  *    capped list by a codegen'd kernel ([[graft.functions.TextKernels]]),
  *    so the candidate set is bounded by shared *rare* shingles, never
  *    all-pairs and never quadratic in a boilerplate phrase's df. The
  *    MinHash/LSH banded variant with the same output contract lives in
  *    [[graft.ml.Dedup]] for the trillion-row path (non-oracle: MinHashLSH
  *    hash functions are engine-specific).
  *  - near-dup (embeddings): sign-random-projection LSH bands computed with
  *    engine-portable integer arithmetic give every vector equi-join bucket
  *    keys; candidates = pairs sharing >= 1 band bucket; exact cosine
  *    filters the candidates. Hash join on (band, code) — no nested-loop
  *    all-pairs anywhere.
  *  - cosine top-k: the probe set is broadcast (bounded), candidates stream —
  *    brute-force exact per probe. The production ANN variants (MinHashLSH /
  *    random-projection bucketing) live in [[graft.ml.Dedup]].
  */
object Similarity {

  private def dbl(c: Column): Column = transform(c, x => x.cast("double"))

  /** 120-bit engine-portable identity digest: TWO 60-bit md5-prefix longs
    * (hex chars [1,15] and [17,31]) carried as two FLAT columns — the key
    * every near-dup/boilerplate/contamination shuffle groups and joins on.
    * A single 60-bit digest hits the birthday bound around 10⁹ distinct
    * shingles (expected collisions on a 100 TB corpus, silently merging
    * unrelated posting lists); 120 bits pushes the bound past 10¹⁷.
    * Mirrored EXACTLY in the oracles as two BIGINT columns, so collision
    * behavior — now negligible — is still identical on both engines.
    * Flat longs, not a struct: struct grouping keys fall off the
    * UnsafeRow fast path and measured 3× slower on the posting-list
    * aggregation. Apply to a PRE-COMPUTED md5 column so the digest is
    * hashed once per shingle. Used where the digest IS the identity;
    * mod-N bucketing/sampling digests (splits, band buckets, Count-Min
    * rows) keep a single long, where collisions are part of the
    * operator's contract. */
  // private[graft]: the hot paths now ride the compiled
  // `graft_md5_split` kernel (bit-identical by spec), so these conv
  // spellings remain as the oracle-mirroring reference definition the
  // equivalence test pins the kernel against
  private[graft] def digestLo(m: Column): Column =
    conv(substring(m, 1, 15), 16, 10).cast("long")
  private[graft] def digestHi(m: Column): Column =
    conv(substring(m, 17, 15), 16, 10).cast("long")
  /** First 60 md5 bits of a raw string via the compiled kernel —
    * value-identical to `digestLo(md5(c))` (spec-pinned); the spelling
    * for every hot single-long hash/bucket projection. */
  private[graft] def digest60(c: Column): Column =
    call_function("graft_md5_split", c)(0)
  // Codegen'd native kernels (graft.functions.VectorExprs, registered via
  // GraftExtensions): same left-to-right summation as the HOF spelling, so
  // results and DuckDB oracles are bit-identical — just not interpreted.
  private def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  private def l2(a: Column): Column = call_function("graft_norm", a)

  /** Exact deduplication by content hash, keeping the smallest doc_id per
    * group (ref capability: ABSENT; north-star). md5 hex is byte-identical
    * across engines. */
  def qDedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy(md5($"text").as("text_hash"))
      .agg(min($"doc_id").as("keep_doc"), count(lit(1)).as("n_copies"))
      .select($"keep_doc", $"n_copies", $"text_hash")
      .orderBy($"keep_doc")
  }

  val dedupExactSql: String =
    """SELECT min(doc_id) AS keep_doc, count(*) AS n_copies, md5(text) AS text_hash
      |FROM documents GROUP BY md5(text) ORDER BY keep_doc""".stripMargin

  /** Max document frequency for a shingle to participate in blocking: a
    * shingle shared by more than this many docs produces df² candidate rows
    * in the self-join while carrying no discriminative signal (boilerplate).
    * Mirrored verbatim in the oracle SQL, so the Jaccard is computed over
    * the pruned shingle space on both engines. */
  val ShingleMaxDf = 20

  /** Near-duplicate pairs by 3-token-shingle Jaccard >= 0.8 — the
    * inverted-index formulation, shaped for scale as ONE pass over the
    * corpus feeding ONE reusable aggregation:
    *  1. [[graft.functions.TextKernels.shingles]] (`graft_shingles`, a
    *     codegen'd Catalyst expression) shingles each doc in a single
    *     compiled loop — no interpreted HOF lambdas anywhere in the query.
    *     Each shingle is digested to a 120-bit key ([[digestLo]]/[[digestHi]]: two
    *     md5-prefix longs, mirrored EXACTLY in the oracle as (sh1, sh2)
    *     BIGINT columns), so every shuffle carries a 16-byte fixed-width
    *     key instead of a string, collision-safe past 10¹⁷ shingles.
    *     Per-doc shingle dedup happens AFTER digesting on both engines
    *     (`collect_set` / `SELECT DISTINCT doc_id, digest`), so even a
    *     digest collision behaves identically on both sides: colliding
    *     shingles merge into one key everywhere, no self-pairs, no
    *     double-counted intersections.
    *  2. Posting lists: `groupBy(sh).collect_set(doc_id)`, capped at
    *     [[ShingleMaxDf]] distinct docs — a hotter shingle is boilerplate
    *     carrying no discriminative signal and would emit df² candidate
    *     rows. The cap BOUNDS every list, so the aggregation is skew-free
    *     by construction. The oracle mirrors the cap.
    *  3. `graft_pairs(ds, withSingles = true)` emits all C(|ds|, 2)
    *     in-order candidate pairs PLUS one (doc, -1) marker per member, so
    *     a single hash aggregation keyed (a, b) yields both the pair
    *     intersection counts (b >= 0) and the per-doc pruned set sizes
    *     (b = -1). The sizes then join back onto the pairs: the counts
    *     exchange is consumed by all three branches and AQE's exchange
    *     reuse materializes it ONCE (asserted in PlanShapeSpec) — no
    *     persist, no cache lifecycle, nothing to unpersist.
    * The size joins carry no `broadcast()` hint on purpose: sizes is one
    * row per surviving doc — AQE broadcasts it at this scale, but at 10⁹+
    * docs it must grade out to a shuffle join, and a forced hint would OOM
    * the driver instead.
    *
    * This is the unsorted pair core shared by [[qDedupShingleJaccard]]
    * (which adds the presentation sort) and the cluster/curation
    * consumers (which would only throw a global sort away). */
  /** Unfiltered per-pair shingle-overlap stats (doc_a, doc_b, n_inter,
    * n_a, n_b) — the shared core behind the Jaccard near-dup and the
    * directional containment detector. */
  private[graft] def shinglePairStats(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val lists = Tables.documents(spark, sfDir)
      .select($"doc_id",
        explode(call_function("graft_shingles", $"text", lit(3))).as("shs"))
      .select($"doc_id", call_function("graft_md5_split", $"shs").as("dg"))
      .select($"doc_id", $"dg"(0).as("sh1"), $"dg"(1).as("sh2"))
      .groupBy($"sh1", $"sh2")
      .agg(sort_array(collect_set($"doc_id")).as("ds"))
      .where(size($"ds") <= ShingleMaxDf)
    val counts = lists
      .select(explode(call_function("graft_pairs", $"ds", lit(true))).as("e"))
      .select($"e.x".as("a"), $"e.y".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
    val sizes = counts.where($"b" === -1L)
      .select($"a".as("doc"), $"c".as("n_sh"))
    counts.where($"b" =!= -1L)
      .select($"a".as("doc_a"), $"b".as("doc_b"), $"c".as("n_inter"))
      .join(sizes.select($"doc".as("doc_a"), $"n_sh".as("n_a")), "doc_a")
      .join(sizes.select($"doc".as("doc_b"), $"n_sh".as("n_b")), "doc_b")
  }

  private[graft] def shingleJaccardPairs(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    shinglePairStats(spark, sfDir)
      .withColumn("jaccard",
        $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
      .where($"jaccard" >= 0.8)
  }

  /** The declared near-dup query: [[shingleJaccardPairs]] (see its doc
    * for the full algorithm) plus the rounded output projection and the
    * total presentation order. */
  def qDedupShingleJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    shingleJaccardPairs(spark, sfDir)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  val dedupShingleJaccardSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s0 AS (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 1, 15) AS BIGINT) AS sh1,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 17, 15) AS BIGINT) AS sh2
      |  FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
      |s AS (
      |  SELECT s0.* FROM s0
      |  JOIN (SELECT sh1, sh2 FROM s0 GROUP BY 1, 2 HAVING count(*) <= $ShingleMaxDf) r USING (sh1, sh2)),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM s a JOIN s b ON a.sh1 = b.sh1 AND a.sh2 = b.sh2 AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(CAST(n_inter AS DOUBLE) / (x.n_sh + y.n_sh - n_inter), 4) AS jaccard
      |FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      |WHERE CAST(n_inter AS DOUBLE) / (x.n_sh + y.n_sh - n_inter) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Directional shingle containment (|A∩B| / |A| ≥ 0.9): the
    * quote/subset detector — a short doc wholly embedded in a longer one
    * has LOW Jaccard (the union is dominated by the long doc) but HIGH
    * containment, so the near-dup query above structurally cannot find
    * it. Emits one row per qualifying direction: `doc_sub` is ≥ 90%
    * contained in `doc_super` (near-identical docs legitimately emit both
    * directions).
    *
    * Scale shape: identical to the Jaccard path — same single
    * df-capped posting-list aggregation, same compiled pair kernel; the
    * only change is the final per-direction ratio, so everything proven
    * about [[shinglePairStats]] at 100 TB carries over. */
  def qShingleContainment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    shinglePairStats(spark, sfDir)
      .select(explode(array(
        struct($"doc_a".as("doc_sub"), $"doc_b".as("doc_super"),
          $"n_inter", $"n_a".as("n_sub")),
        struct($"doc_b".as("doc_sub"), $"doc_a".as("doc_super"),
          $"n_inter", $"n_b".as("n_sub")))).as("d"))
      .select($"d.doc_sub", $"d.doc_super",
        ($"d.n_inter".cast("double") / $"d.n_sub").as("containment"))
      .where($"containment" >= 0.9)
      .select($"doc_sub", $"doc_super", round($"containment", 4).as("containment"))
      .orderBy($"doc_sub", $"doc_super")
  }

  val shingleContainmentSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s0 AS (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 1, 15) AS BIGINT) AS sh1,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 17, 15) AS BIGINT) AS sh2
      |  FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
      |s AS (
      |  SELECT s0.* FROM s0
      |  JOIN (SELECT sh1, sh2 FROM s0 GROUP BY 1, 2 HAVING count(*) <= $ShingleMaxDf) r USING (sh1, sh2)),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM s a JOIN s b ON a.sh1 = b.sh1 AND a.sh2 = b.sh2 AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |st AS (
      |  SELECT doc_a, doc_b, n_inter, x.n_sh AS n_a, y.n_sh AS n_b
      |  FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id),
      |d AS (
      |  SELECT doc_a AS doc_sub, doc_b AS doc_super,
      |    CAST(n_inter AS DOUBLE) / n_a AS containment FROM st
      |  UNION ALL
      |  SELECT doc_b AS doc_sub, doc_a AS doc_super,
      |    CAST(n_inter AS DOUBLE) / n_b AS containment FROM st)
      |SELECT doc_sub, doc_super, round(containment, 4) AS containment
      |FROM d WHERE containment >= 0.9
      |ORDER BY doc_sub, doc_super""".stripMargin

  /** Incremental dedup: the last 20% of doc_ids play "today's crawl
    * increment", the first 80% the standing corpus — every incoming doc
    * that near-duplicates (Jaccard ≥ 0.8) an EXISTING doc is reported
    * with its match. The daily-ingest shape of dedup: the increment is
    * checked against the corpus, not against itself (new-vs-new pairs are
    * next round's corpus-vs-corpus problem).
    *
    * Scale shape: identical to [[shingleJaccardPairs]] (pairs already
    * come out id-ordered, so the straddle test is two comparisons against
    * a broadcast 1-row split point); at real scale the standing corpus's
    * shingle index is the persisted half of this join. */
  def qIncrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val split = Tables.documents(spark, sfDir)
      .agg(expr("(max(doc_id) + 1) * 4 DIV 5").as("split_id"))
    shingleJaccardPairs(spark, sfDir)
      .crossJoin(broadcast(split))
      .where($"doc_a" < $"split_id" && $"doc_b" >= $"split_id")
      .select($"doc_b".as("new_doc"), $"doc_a".as("dup_of"),
        round($"jaccard", 4).as("jaccard"))
      .orderBy($"new_doc", $"dup_of")
  }

  val incrementalDedupSql: String =
    s"""WITH s AS (SELECT (max(doc_id) + 1) * 4 // 5 AS split_id FROM documents),
      |p AS (SELECT doc_a, doc_b, jaccard FROM ($dedupShingleJaccardSql))
      |SELECT doc_b AS new_doc, doc_a AS dup_of, jaccard
      |FROM p, s WHERE doc_a < split_id AND doc_b >= split_id
      |ORDER BY new_doc, dup_of""".stripMargin

  /** MinHash-LSH geometry for the oracle-gated banded near-dup: 16 hashes
    * banded 4 × 4, buckets capped at [[MinhashMaxBucket]] docs. The hash
    * family is h_j(x) = (x·A_j + B_j) mod P over the Mersenne prime
    * P = 2³¹−1 with A_j = (2654435761·j mod P) + 1, B_j = 40503·j + 1 —
    * pure 64-bit integer arithmetic (all products < 2⁶²), identical on any
    * engine, unlike MinHashLSH's seeded murmur family. */
  val MinhashP = 2147483647L
  val MinhashHashes = 16
  val MinhashBands = 4
  val MinhashMaxBucket = 64

  /** Banded-MinHash near-duplicate pairs with exact-Jaccard verification —
    * the trillion-row near-dup path ([[graft.ml.Dedup.minhashNearDup]] is
    * the parameterized library form) pulled into the DuckDB gate via
    * engine-portable hashing:
    *  1. shingle each doc with the codegen'd `graft_shingles` kernel,
    *     digest each shingle to a 60-bit md5-prefix long reduced mod P —
    *     distinct per doc, so the signature is over the shingle SET;
    *  2. 16 affine min-hashes per doc in one projection (no shuffle);
    *  3. band buckets: md5-digest of each 4-hash slice → the (band, bucket)
    *     equi-key. Candidates = pairs sharing a bucket; posting lists are
    *     `collect_set` per bucket, capped at [[MinhashMaxBucket]] (empty or
    *     boilerplate docs collapse into one bucket and would pair
    *     quadratically — the cap is the same safety valve as the library
    *     path's `maxBucket`), pairs emitted by the compiled `graft_pairs`
    *     kernel and band-counted by one hash aggregation;
    *  4. the TRUE Jaccard is computed for candidates only — the LSH
    *     narrows, the verify decides. Candidate pairs join BACK onto the
    *     exploded (doc_id, digest) relation (the oracle's `inter` CTE
    *     spelling): intersections are a hash aggregation over matched
    *     digests, per-doc sizes a count over the same relation. Recall vs
    *     the unblocked exact query is < 1 by construction (P(candidate) =
    *     1−(1−s⁴)⁴); identical arithmetic on both engines makes the blocked
    *     result itself deterministic.
    * Shape notes: the signature is NOT computed with per-element HOF
    * lambdas (those evaluate interpreted — measured 8 s at sf0.1); instead
    * the digests explode once through a codegen'd projection and the 16
    * mins are plain MIN aggregates in ONE hash aggregation — map-side
    * combinable, whole-stage codegen. The signature shuffle carries ONLY
    * the 16 mins: at 100 TB a collect_set of each doc's full digest set
    * riding that shuffle would inflate it by the corpus's token volume,
    * so the verify step re-reads the digest relation and lets the
    * (candidate-bounded) pair set broadcast against it instead. */
  /** The banded-MinHash core shared by the gated near-dup and the LSH
    * quality audit: returns (digests, candidates) — the single distinct
    * (doc_id, h) relation every consumer hangs off, and the pre-verify
    * candidate pairs with their band counts. */
  private[graft] def minhashCore(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val P = MinhashP
    // One explode+digest pass, de-dupped immediately: every downstream
    // consumer (signature, intersection joins, per-doc sizes) hangs off this
    // single distinct relation, so the corpus is shingled exactly once and
    // ReuseExchange shares the (doc_id, h) aggregate. MIN over the distinct
    // set equals MIN over the multiset, and the oracle's sh0 CTE is DISTINCT
    // too, so the signature is unchanged.
    val hd = Tables.documents(spark, sfDir)
      .select($"doc_id",
        explode(call_function("graft_shingles", $"text", lit(3))).as("shx"))
      .select($"doc_id", (digest60($"shx") % P).as("h"))
      .distinct()
    val minCols = (0 until MinhashHashes).map { j =>
      val a = 2654435761L * j % P + 1
      val b = 40503L * j + 1
      min(($"h" * a + b) % P).as(s"s$j")
    }
    val sig = hd.groupBy($"doc_id").agg(minCols.head, minCols.tail: _*)
    val rowsPerBand = MinhashHashes / MinhashBands
    val buckets = (0 until MinhashBands).map { b =>
      val slice = (0 until rowsPerBand).map(k => col(s"s${b * rowsPerBand + k}"))
      digest60(concat_ws(",", slice: _*))
    }
    val banded = sig.select($"doc_id",
      posexplode(array(buckets: _*)).as(Seq("band", "bucket")))
    val cand = banded
      .groupBy($"band", $"bucket")
      .agg(sort_array(collect_set($"doc_id")).as("ds"))
      .where(size($"ds").between(2, MinhashMaxBucket))
      .select(explode(call_function("graft_pairs", $"ds", lit(false))).as("e"))
      .groupBy($"e.x".as("doc_a"), $"e.y".as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
    (hd, cand)
  }

  def qDedupMinhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (hd, cand) = minhashCore(spark, sfDir)
    // Verify: join back onto the same distinct digest relation (oracle
    // `inter` CTE spelling).
    val sz = hd.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    cand
      .join(hd.toDF("doc_a", "h"), "doc_a")
      .join(hd.toDF("doc_b", "h"), Seq("doc_b", "h"))
      .groupBy($"doc_a", $"doc_b", $"n_bands")
      .agg(count(lit(1)).as("n_inter"))
      .join(sz.toDF("doc_a", "n_a"), "doc_a")
      .join(sz.toDF("doc_b", "n_b"), "doc_b")
      .withColumn("jaccard",
        $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
      .where($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b", $"n_bands", round($"jaccard", 4).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  val dedupMinhashSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 1, 15) AS BIGINT) % $MinhashP AS h
      |  FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
      |sig AS (
      |  SELECT doc_id, CAST(j AS BIGINT) AS j,
      |    min((h * ((2654435761 * j) % $MinhashP + 1) + (40503 * j + 1)) % $MinhashP) AS s
      |  FROM sh0, UNNEST(range(0, $MinhashHashes)) u(j) GROUP BY 1, 2),
      |band AS (
      |  SELECT doc_id, j // 4 AS band,
      |    CAST('0x' || substr(md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY j)), 1, 15) AS BIGINT) AS bucket
      |  FROM sig GROUP BY doc_id, j // 4),
      |sized AS (
      |  SELECT band, bucket FROM band GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND $MinhashMaxBucket),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
      |  FROM band a JOIN sized USING (band, bucket)
      |  JOIN band b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh0 GROUP BY 1),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, c.n_bands, count(*) AS n_inter
      |  FROM cand c JOIN sh0 a ON c.doc_a = a.doc_id
      |  JOIN sh0 b ON c.doc_b = b.doc_id AND a.h = b.h
      |  GROUP BY 1, 2, 3)
      |SELECT doc_a, doc_b, n_bands,
      |  round(CAST(n_inter AS DOUBLE) / (x.n_sh + y.n_sh - n_inter), 4) AS jaccard
      |FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      |WHERE CAST(n_inter AS DOUBLE) / (x.n_sh + y.n_sh - n_inter) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** The minhash candidate CTE chain (through pre-verify pairs) as SQL —
    * shared by [[lshQualitySql]]. */
  private val minhashCandSql: String =
    s"""SELECT doc_a, doc_b FROM (
      |WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 1, 15) AS BIGINT) % $MinhashP AS h
      |  FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
      |sig AS (
      |  SELECT doc_id, CAST(j AS BIGINT) AS j,
      |    min((h * ((2654435761 * j) % $MinhashP + 1) + (40503 * j + 1)) % $MinhashP) AS s
      |  FROM sh0, UNNEST(range(0, $MinhashHashes)) u(j) GROUP BY 1, 2),
      |band AS (
      |  SELECT doc_id, j // 4 AS band,
      |    CAST('0x' || substr(md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY j)), 1, 15) AS BIGINT) AS bucket
      |  FROM sig GROUP BY doc_id, j // 4),
      |sized AS (
      |  SELECT band, bucket FROM band GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND $MinhashMaxBucket)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM band a JOIN sized USING (band, bucket)
      |JOIN band b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      |GROUP BY 1, 2)""".stripMargin

  /** LSH quality audit: precision/recall of the banded-MinHash CANDIDATE
    * set against the exact shingle-Jaccard ≥ 0.8 truth set — the one-row
    * dashboard number that says whether the sketch's banding geometry
    * (16 hashes × 4 bands) is tuned for the corpus, published alongside
    * every production dedup run.
    *
    * Scale shape: both pair sets are the already-proven near-dup plans;
    * the audit adds one pair-keyed join and three 1-row aggregates. */
  def qLshQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Round 20 (optimization round, guide §2.4): the three counts come
    // from ONE full-outer join + ONE single-row aggregate instead of
    // three separate aggregation branches glued by crossJoins — the old
    // spelling consumed each expensive pair pipeline TWICE (its own
    // count + the hits join), paying the downstream join/agg work again
    // even where AQE exchange reuse spared the recompute. Same counts:
    // sum(is_c) over the full-outer rows = |cand|, sum(is_t) = |truth|,
    // both-present rows = |cand ∩ truth| (pair keys are unique per side,
    // so the full-outer join is 1:1 and no count inflates). coalesce
    // keeps the empty-corpus counts at 0 (sum over no rows is NULL).
    val cand = minhashCore(spark, sfDir)._2.select($"doc_a", $"doc_b")
    val truth = shingleJaccardPairs(spark, sfDir).select($"doc_a", $"doc_b")
    cand.withColumn("is_c", lit(1L))
      .join(truth.withColumn("is_t", lit(1L)), Seq("doc_a", "doc_b"),
        "full_outer")
      .agg(coalesce(sum($"is_c"), lit(0L)).as("n_candidates"),
        coalesce(sum($"is_t"), lit(0L)).as("n_truth"),
        coalesce(sum($"is_c" * $"is_t"), lit(0L)).as("n_hits"))
      .select($"n_candidates", $"n_truth", $"n_hits",
        round($"n_hits".cast("double") / nullif($"n_candidates", lit(0)), 6)
          .as("precision"),
        round($"n_hits".cast("double") / nullif($"n_truth", lit(0)), 6)
          .as("recall"))
  }

  val lshQualitySql: String =
    s"""WITH c AS ($minhashCandSql),
      |tr AS (SELECT doc_a, doc_b FROM ($dedupShingleJaccardSql)),
      |h AS (SELECT c.doc_a, c.doc_b FROM c JOIN tr USING (doc_a, doc_b))
      |SELECT
      |  (SELECT count(*) FROM c) AS n_candidates,
      |  (SELECT count(*) FROM tr) AS n_truth,
      |  (SELECT count(*) FROM h) AS n_hits,
      |  round(CAST((SELECT count(*) FROM h) AS DOUBLE)
      |    / nullif((SELECT count(*) FROM c), 0), 6) AS precision,
      |  round(CAST((SELECT count(*) FROM h) AS DOUBLE)
      |    / nullif((SELECT count(*) FROM tr), 0), 6) AS recall""".stripMargin


  /** IVF geometry for the oracle-gated ANN query: 8 cells over the 64-dim
    * embeddings, centroid k dim i = ((i·37 + k·1009) mod 83)/83 − 0.5 scaled
    * by 0.1 to sit in the data's range — integer arithmetic, so the
    * quantizer is identical on both engines (the k-means-fitted quantizer
    * lives in [[graft.ml.Ann.fitIvf]]; fitting is engine-specific, the
    * *search* is what this query gates). */
  val IvfNlist = 8
  val IvfNprobe = 2
  val IvfK = 3

  private def ivfFixedIndex: graft.ml.Ann.IvfIndex =
    graft.ml.Ann.IvfIndex(Array.tabulate(IvfNlist, 64)((k, i0) => {
      val i = i0 + 1
      (((i * 37 + k * 1009) % 83).toDouble / 83.0 - 0.5) * 0.1
    }))

  /** Shared oracle fragments for the fixed ANN indexes — the integer
    * centroid formula, the nearest-cell assignment, and the nprobe probe
    * expansion exist in ONE string, consumed by [[annIvfSql]] and
    * [[annIvfPqSql]] (editing the geometry cannot leave the oracles
    * gating different indexes). Requires a preceding CTE
    * `vecs(vec_id, v)` with double vectors. */
  private val ivfOracleCte: String =
    s"""cent AS (
      |  SELECT CAST(k AS INT) AS k, list_transform(range(1, 65), i ->
      |    (CAST((i * 37 + k * 1009) % 83 AS DOUBLE) / 83.0 - 0.5) * 0.1) AS c
      |  FROM range(0, $IvfNlist) t(k)),
      |ivfd AS (
      |  SELECT vec_id, k,
      |    list_sum(list_transform(list_zip(v, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
      |  FROM vecs, cent),
      |assign AS (
      |  SELECT vec_id, k AS cell FROM (
      |    SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn FROM ivfd)
      |  WHERE rn = 1),
      |iprobes AS (
      |  SELECT vec_id AS probe_id, k AS cell FROM (
      |    SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn FROM ivfd
      |    WHERE vec_id < 10)
      |  WHERE rn <= $IvfNprobe)""".stripMargin

  /** IVF ANN cosine top-k through [[graft.ml.Ann.ivfCosineTopK]] — the
    * coarse-quantizer similarity-search scale path in the DuckDB gate:
    * every vector is assigned to its nearest cell (argmin of codegen'd
    * graft_sqdist, ties to the lower cell id), each of the 10 probes scans
    * only its [[IvfNprobe]] nearest cells, exact cosine ranks the
    * candidates. At 100 TB the corpus shards by cell id and a probe touches
    * nprobe/nlist of it; recall@k vs brute force is asserted in AnnSpec. */
  def qAnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    graft.ml.Ann.ivfCosineTopK(ivfFixedIndex, e, e.where($"vec_id" < 10),
        "vec_id", "embedding", k = IvfK, nprobe = IvfNprobe)
      .orderBy($"probe_id", $"rank")
  }

  val annIvfSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |vecs AS (SELECT vec_id, v FROM e),
      |$ivfOracleCte
      |SELECT probe_id, rank, cand_id, round(cos, 6) + 0.0 AS cos FROM (
      |  SELECT p.probe_id, c.vec_id AS cand_id,
      |    list_sum(list_transform(list_zip(pn.v, n.v), x -> x[1] * x[2])) / (pn.nrm * n.nrm) AS cos,
      |    row_number() OVER (PARTITION BY p.probe_id ORDER BY
      |      list_sum(list_transform(list_zip(pn.v, n.v), x -> x[1] * x[2])) / (pn.nrm * n.nrm) DESC,
      |      c.vec_id) AS rank
      |  FROM iprobes p
      |  JOIN assign c ON p.cell = c.cell AND c.vec_id <> p.probe_id
      |  JOIN n pn ON pn.vec_id = p.probe_id
      |  JOIN n ON n.vec_id = c.vec_id)
      |WHERE rank <= $IvfK ORDER BY probe_id, rank""".stripMargin

  /** PQ geometry for the oracle-gated ADC query: 8 subspaces × 8 dims,
    * 16 codewords per subspace. Codeword c of subspace m, global dim
    * i = m·8+j (1-based): w = ((i·37 + c·1009 + m·7919) mod 83 / 83 − 0.5)
    * · 0.1 — integer arithmetic, identical on both engines (the
    * k-means-fitted codebooks live in [[graft.ml.Ann.fitPq]]; fitting is
    * engine-specific, the *encode + ADC search* is what this query
    * gates). */
  val PqM = 8
  val PqKsub = 16
  val PqK = 3

  private def pqFixedIndex: graft.ml.Ann.PqIndex =
    graft.ml.Ann.PqIndex(Array.tabulate(PqM, PqKsub, 8) { (m, c, j0) =>
      val i = m * 8 + j0 + 1
      (((i * 37 + c * 1009 + m * 7919) % 83).toDouble / 83.0 - 0.5) * 0.1
    })

  /** Product-quantization ADC top-k through [[graft.ml.Ann.pqAdcTopK]] —
    * the COMPRESSION scale path of similarity search in the DuckDB gate:
    * the corpus is encoded to 8 code ids per vector (argmin per subspace,
    * ties to the lower id), each of the 10 probes builds its 8×16
    * micro-quantized lookup table, and candidates rank by the integer sum
    * of 8 table lookups — no dim-wide arithmetic per pair, and the
    * order-independent integer sum is what makes the ranking
    * hash-identical across engines. At 100 TB this composes with the IVF
    * coarse quantizer (IVF-PQ): shard by cell, ADC within; recall vs
    * exact brute force is asserted in AnnSpec. */
  def qAnnPq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    graft.ml.Ann.pqAdcTopK(pqFixedIndex, e, e.where($"vec_id" < 10),
        "vec_id", "embedding", k = PqK)
      .orderBy($"probe_id", $"rank")
  }

  /** Shared oracle fragment for the fixed PQ codebooks — the codeword
    * formula, the per-subspace encode, and the probe LUT exist in ONE
    * string, consumed by [[annPqSqlK]] (and therefore the recall form)
    * and [[annIvfPqSql]]. Requires a preceding CTE `vecs(vec_id, v)`. */
  private val pqOracleCte: String =
    s"""cb AS (
      |  SELECT CAST(m AS INT) AS m, CAST(c AS INT) AS c,
      |    list_transform(range(1, 9), j ->
      |      (CAST(((m*8 + j)*37 + c*1009 + m*7919) % 83 AS DOUBLE) / 83.0 - 0.5) * 0.1) AS w
      |  FROM range(0, $PqM) mm(m), range(0, $PqKsub) cc(c)),
      |subd AS (
      |  SELECT vecs.vec_id, cb.m, cb.c,
      |    list_sum(list_transform(list_zip(v[cb.m*8+1 : cb.m*8+8], cb.w),
      |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
      |  FROM vecs, cb),
      |enc AS (
      |  SELECT vec_id, m, c AS code FROM (
      |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn
      |    FROM subd)
      |  WHERE rn = 1),
      |lut AS (
      |  SELECT vec_id AS probe_id, m, c, CAST(round(d * 1e6) AS BIGINT) AS dq
      |  FROM subd WHERE vec_id < 10)""".stripMargin

  /** The PQ-ADC ranking as SQL, parameterized by the top-k cut —
    * [[annPqSql]] is the gated k=[[PqK]] form; [[annPqRecallSql]] reuses
    * the k=50 shortlist form. */
  private def annPqSqlK(k: Int): String =
    s"""WITH vecs AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |$pqOracleCte,
      |pair AS (
      |  SELECT l.probe_id, enc.vec_id AS cand_id, CAST(sum(l.dq) AS BIGINT) AS adist
      |  FROM lut l JOIN enc ON l.m = enc.m AND l.c = enc.code
      |  WHERE enc.vec_id <> l.probe_id
      |  GROUP BY 1, 2)
      |SELECT probe_id, rank, cand_id, adist FROM (
      |  SELECT probe_id, cand_id, adist,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY adist, cand_id) AS rank
      |  FROM pair)
      |WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin

  val annPqSql: String = annPqSqlK(PqK)

  /** IVF-PQ ANN through [[graft.ml.Ann.ivfPqTopK]] — the BILLION-SCALE
    * composition in the DuckDB gate: the [[ivfFixedIndex]] coarse
    * quantizer prunes WHICH vectors each probe scans (equi-join on the
    * cell id, nprobe/nlist of the corpus), and the [[pqFixedIndex]]
    * codebooks compress HOW each survivor is scored (8 integer LUT adds,
    * no dim-wide arithmetic). Both components are already gated alone
    * (`q_ann_ivf`, `q_ann_pq`); this query gates their COMPOSITION —
    * cell-restricted candidate generation feeding ADC ranking — so the
    * production index layout (shard by cell, M-byte codes within) has
    * its own green row, not just AnnSpec's unit equivalences. */
  def qAnnIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    graft.ml.Ann.ivfPqTopK(ivfFixedIndex, pqFixedIndex, e,
        e.where($"vec_id" < 10), "vec_id", "embedding",
        k = PqK, nprobe = IvfNprobe)
      .orderBy($"probe_id", $"rank")
  }

  val annIvfPqSql: String =
    s"""WITH vecs AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |$ivfOracleCte,
      |$pqOracleCte,
      |cand AS (
      |  SELECT p.probe_id, a.vec_id AS cand_id
      |  FROM iprobes p JOIN assign a ON p.cell = a.cell
      |  WHERE a.vec_id <> p.probe_id),
      |pair AS (
      |  SELECT l.probe_id, enc.vec_id AS cand_id, CAST(sum(l.dq) AS BIGINT) AS adist
      |  FROM lut l JOIN enc ON l.m = enc.m AND l.c = enc.code
      |  JOIN cand ON cand.probe_id = l.probe_id AND cand.cand_id = enc.vec_id
      |  GROUP BY 1, 2)
      |SELECT probe_id, rank, cand_id, adist FROM (
      |  SELECT probe_id, cand_id, adist,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY adist, cand_id) AS rank
      |  FROM pair)
      |WHERE rank <= $PqK ORDER BY probe_id, rank""".stripMargin

  /** PQ shortlist recall audit: does the exact L2 top-5 land in the ADC
    * top-50 shortlist? — the dashboard number for the shortlist+re-rank
    * pattern PQ is deployed in (direct top-k agreement is the wrong
    * metric for a compressed index), the PQ twin of [[qAnnRecall]]. Both
    * sides are deterministic on both engines; output is one integer-ppm
    * row. */
  def qAnnPqRecall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val short = graft.ml.Ann.pqAdcTopK(pqFixedIndex, e,
        e.where($"vec_id" < 10), "vec_id", "embedding", k = 50)
      .select($"probe_id", $"cand_id")
    val n = e.select($"vec_id", dbl($"embedding").as("v"))
    val p = n.where($"vec_id" < 10)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    val w = Window.partitionBy($"probe_id").orderBy($"d", $"cand_id")
    val exact = n.select($"vec_id".as("cand_id"), $"v")
      .join(broadcast(p), $"cand_id" =!= $"probe_id")
      .withColumn("d", call_function("graft_sqdist", $"pv", $"v"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 5)
      .select($"probe_id", $"cand_id")
    val hits = short.join(exact, Seq("probe_id", "cand_id"))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select($"n_exact", $"n_hits",
        expr("n_hits * 1000000 DIV nullif(n_exact, 0)").as("recall_ppm"))
  }

  val annPqRecallSql: String =
    s"""WITH pr_pq AS (
      |  SELECT probe_id, cand_id FROM (${annPqSqlK(50)})),
      |pr_e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |pr_sc AS (
      |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
      |    list_sum(list_transform(list_zip(p.v, c.v),
      |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d
      |  FROM pr_e p JOIN pr_e c ON c.vec_id <> p.vec_id
      |  WHERE p.vec_id < 10),
      |pr_ex AS (
      |  SELECT probe_id, cand_id FROM (
      |    SELECT probe_id, cand_id,
      |      row_number() OVER (PARTITION BY probe_id ORDER BY d, cand_id) AS rn
      |    FROM pr_sc)
      |  WHERE rn <= 5),
      |pr_hits AS (
      |  SELECT x.probe_id, x.cand_id
      |  FROM pr_pq x JOIN pr_ex USING (probe_id, cand_id))
      |SELECT
      |  (SELECT count(*) FROM pr_ex) AS n_exact,
      |  (SELECT count(*) FROM pr_hits) AS n_hits,
      |  (SELECT count(*) FROM pr_hits) * 1000000
      |    // nullif((SELECT count(*) FROM pr_ex), 0) AS recall_ppm""".stripMargin

  /** SimHash fingerprint width (bits). 60 = what a 15-hex-digit md5 prefix
    * yields with engine-portable integer arithmetic. */
  val SimhashBits = 60

  /** Per-document SimHash fingerprints (ref capability: ABSENT; north-star
    * near-dup family — Charikar 2002). Near-identical docs differ in few
    * fingerprint bits; the Hamming-pair machinery lives in
    * [[graft.ml.Dedup.hammingDistance]] (with a 64-bit xxhash64 variant of
    * this signature in [[graft.ml.Dedup.simhash]]).
    *
    * Shape: explode tokens once, digest each to a 60-bit md5-prefix long
    * (same engine-portable digest as the shingle query), then ONE hash
    * aggregation per doc computing all 60 bit votes as map-side-combinable
    * sums — no interpreted per-bit lambdas, no second pass. The per-bit
    * majority (vote > 0, ties to 0 on both engines) assembles the
    * fingerprint in a post-agg projection. Token multiplicity weights the
    * votes (standard term-frequency SimHash). */
  def qDedupSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    simhashFingerprints(spark, sfDir).orderBy($"doc_id")
  }

  /** (doc_id, fingerprint, n_bits) SimHash relation — the shared core of
    * [[qDedupSimhash]] (which just adds the presentation sort) and
    * [[qSimhashNeardup]] (which blocks on fingerprint bands). */
  private[graft] def simhashFingerprints(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val toksH = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(call_function("graft_tokens", $"text")).as("tok"))
      .select($"doc_id", digest60($"tok").as("h"))
    val voteCols = (0 until SimhashBits).map(b =>
      sum(when(shiftright($"h", b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
    val votes = toksH.groupBy($"doc_id").agg(voteCols.head, voteCols.tail: _*)
    votes.select($"doc_id",
      (0 until SimhashBits).map(b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("fingerprint"),
      (0 until SimhashBits).map(b =>
        when(col(s"v$b") > 0, lit(1L)).otherwise(lit(0L)))
        .reduce(_ + _).as("n_bits"))
  }

  /** The fingerprint relation as a DuckDB CTE chain ending in
    * `fp(doc_id, fingerprint, n_bits)` — shared by the simhash oracles. */
  private val simhashFpCte: String =
    s"""p AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM p),
      |v AS (
      |  SELECT doc_id, b.b AS b,
      |    sum(CASE WHEN (h >> CAST(b.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM h, range(0, $SimhashBits) b(b) GROUP BY doc_id, b.b),
      |fp AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS fingerprint,
      |    CAST(sum(CASE WHEN vote > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bits
      |  FROM v GROUP BY doc_id)""".stripMargin

  val dedupSimhashSql: String =
    s"""WITH $simhashFpCte
      |SELECT doc_id, fingerprint, n_bits FROM fp ORDER BY doc_id""".stripMargin

  /** Band geometry for SimHash Hamming blocking: the 60-bit fingerprint
    * splits into 4 disjoint 15-bit bands. By pigeonhole, any pair of
    * fingerprints differing in at most [[SimhashMaxHamming]] = 3 bits has
    * at least one band identical — so the band equi-join has PERFECT
    * recall at the declared radius (unlike probabilistic LSH banding),
    * while still never comparing all pairs. */
  val SimhashBands = 4
  val SimhashBandBits = 15
  val SimhashMaxHamming = 3

  /** Occupancy cap per (band, code) bucket. Unlike MinHash band buckets
    * (hash-uniform by construction), SimHash band codes CONCENTRATE on
    * natural language — templated/boilerplate-heavy corpora put whole
    * percent of the corpus behind one 15-bit code (measured 5% in one
    * bucket on the synthetic corpus), and bucket fan-out is occ². A
    * bucket hotter than this cap is a degenerate near-identical cluster,
    * not a pair candidate source — the exact-dup and shingle passes own
    * those — so it is dropped whole, bounding every bucket's pair
    * emission at cap² (the ShingleMaxDf discipline at the band level).
    * Mirrored verbatim in the oracle; at the gated SFs the hottest
    * bucket is well under the cap, so the declared result is unchanged. */
  val SimhashBandMaxOcc = 1000

  /** SimHash near-duplicate pairs at Hamming radius ≤ 3 (north-star
    * near-dup family — the Google crawl-dedup shape, Manku et al. WWW'07):
    * block on [[SimhashBands]] 15-bit fingerprint bands (an EQUI-join on
    * (band, code), never an all-pairs scan), then the exact popcount of
    * the fingerprint XOR decides. 4×15 banding guarantees every pair
    * within radius 3 collides in ≥ 1 band (pigeonhole), so among
    * surviving buckets recall is 1.0 by construction — the blocking
    * only prunes TRUE negatives (plus whole buckets over the
    * [[SimhashBandMaxOcc]] occupancy valve, which the gated SFs never
    * hit — asserted equal to the all-pairs scan in SimilaritySpec).
    *
    * Scale: each doc emits exactly 4 (band, code) rows; candidate
    * fan-out is bounded by cap² per bucket via the occupancy valve; the
    * verify is one codegen'd xor+popcount per candidate over 8-byte
    * keys. */
  def qSimhashNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the 60-column vote aggregation feeds two subtrees (the occupancy
    // valve and the band join); one eager localCheckpoint materializes it
    // once — same shared-relation discipline as qContamination
    // (Bench/Verify release the blocks between queries)
    val fp = simhashFingerprints(spark, sfDir)
      .select($"doc_id", $"fingerprint").localCheckpoint()
    val bandMask = (1L << SimhashBandBits) - 1
    // carry the 8-byte fingerprint THROUGH the band relation: the verify
    // (xor+popcount) then runs at pair-emission time inside the band
    // join itself, BEFORE the distinct — no join-backs to fp, and the
    // distinct deduplicates only the (≤ radius) survivors instead of the
    // full candidate fan-out
    val allBands = fp.select($"doc_id", $"fingerprint",
      posexplode(array((0 until SimhashBands).map(b =>
        shiftright($"fingerprint", b * SimhashBandBits).bitwiseAND(bandMask)): _*))
        .as(Seq("band", "code")))
    // occupancy valve: drop degenerate buckets before any pair is emitted
    // (see [[SimhashBandMaxOcc]]) — the aggregation is (band, code)-keyed
    // and map-side combinable, so the valve itself is skew-free
    val keep = allBands.groupBy($"band", $"code")
      .agg(count(lit(1)).as("__occ"))
      .where($"__occ" <= SimhashBandMaxOcc)
      .select($"band", $"code")
    val bands = allBands.join(keep, Seq("band", "code"), "left_semi")
    bands.as("a").join(bands.as("b"), Seq("band", "code"))
      .where($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        bit_count($"a.fingerprint".bitwiseXOR($"b.fingerprint"))
          .cast("int").as("hamming"))
      .where($"hamming" <= SimhashMaxHamming)
      .distinct()
      .orderBy($"id_a", $"id_b")
  }

  val simhashNeardupSql: String =
    s"""WITH $simhashFpCte,
      |all_bands AS (
      |  SELECT doc_id, b.b AS band,
      |    (fingerprint >> CAST($SimhashBandBits * b.b AS INT)) & ${(1L << SimhashBandBits) - 1} AS code
      |  FROM fp, range(0, $SimhashBands) b(b)),
      |keep AS (
      |  SELECT band, code FROM all_bands
      |  GROUP BY 1, 2 HAVING count(*) <= $SimhashBandMaxOcc),
      |bands AS (
      |  SELECT a.doc_id, a.band, a.code
      |  FROM all_bands a JOIN keep USING (band, code)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.code = b.code
      |                           AND a.doc_id < b.doc_id)
      |SELECT c.id_a, c.id_b,
      |  CAST(bit_count(xor(fa.fingerprint, fb.fingerprint)) AS INT) AS hamming
      |FROM cand c JOIN fp fa ON c.id_a = fa.doc_id JOIN fp fb ON c.id_b = fb.doc_id
      |WHERE bit_count(xor(fa.fingerprint, fb.fingerprint)) <= $SimhashMaxHamming
      |ORDER BY id_a, id_b""".stripMargin

  /** LSH geometry for embedding near-dup: 16 sign-random-projection bits,
    * banded 4 × 4. Hyperplane w(j)[i] = ((i*13 + j*7919) mod 97)/97 − 0.5 is
    * pure integer arithmetic, identical on both engines; projections are
    * rounded to 6dp before the sign test so summation-order ulps can't flip
    * a bit on one engine only. */
  val LshBands = 4
  val LshBitsPerBand = 4

  /** Embedding near-duplicate candidate pairs with cosine >= 0.4 (north-star
    * near-dup at embedding granularity). Candidates are pairs sharing at
    * least one LSH band bucket — an EQUI-join on (band, code), never an
    * all-pairs nested loop — then the exact cosine filters them. The oracle
    * mirrors the identical bucketing, so the result is deterministic on both
    * engines; like any banded LSH, recall against the unblocked all-pairs
    * result is < 1 by design (tunable via [[LshBands]]/[[LshBitsPerBand]];
    * the knobs and the exhaustive variant live in [[graft.ml.Dedup]]). */
  def qEmbedNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", dbl($"embedding").as("v"))
      .withColumn("nrm", l2($"v"))
    // hyperplane weights materialize as a literal array; the projection is
    // one codegen'd dot product per bit instead of an interpreted aggregate
    def proj(j: Int): Column = {
      val w = array((1 to 64).map(i =>
        lit(((i * 13 + j * 7919) % 97).toDouble / 97.0 - 0.5)): _*)
      round(dot($"v", w), 6)
    }
    val codes = (0 until LshBands).map { b =>
      (0 until LshBitsPerBand).map { k =>
        when(proj(b * LshBitsPerBand + k) >= 0, lit(1 << k)).otherwise(lit(0))
      }.reduce(_ + _).cast("long")
    }
    val sig = e.select($"vec_id", posexplode(array(codes: _*)).as(Seq("band", "code")))
    val pairs = sig.as("a").join(sig.as("b"), Seq("band", "code"))
      .where($"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"))
      .distinct()
    pairs
      .join(e.select($"vec_id".as("id_a"), $"v".as("va"), $"nrm".as("na")), "id_a")
      .join(e.select($"vec_id".as("id_b"), $"v".as("vb"), $"nrm".as("nb")), "id_b")
      .withColumn("cos", dot($"va", $"vb") / ($"na" * $"nb"))
      .where($"cos" >= 0.4)
      .select($"id_a", $"id_b", round($"cos", 4).as("cos"))
      .orderBy($"id_a", $"id_b")
  }

  val embedNeardupSql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |proj AS (
      |  SELECT vec_id, j, round(list_sum(list_transform(range(1, 65), i ->
      |    v[i] * (CAST((i * 13 + j * 7919) % 97 AS DOUBLE) / 97.0 - 0.5))), 6) AS p
      |  FROM n, UNNEST(range(0, 16)) u(j)),
      |codes AS (
      |  SELECT vec_id, j // 4 AS band,
      |         CAST(sum(CASE WHEN p >= 0 THEN 1 << (j % 4) ELSE 0 END) AS BIGINT) AS code
      |  FROM proj GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM codes a JOIN codes b ON a.band = b.band AND a.code = b.code
      |                           AND a.vec_id < b.vec_id)
      |SELECT c.id_a, c.id_b,
      |  round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) /
      |        (a.nrm * b.nrm), 4) AS cos
      |FROM cand c JOIN n a ON c.id_a = a.vec_id JOIN n b ON c.id_b = b.vec_id
      |WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) /
      |      (a.nrm * b.nrm) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  /** SemDeDup-style semantic dedup: block by nearest fixed k-means
    * centroid ([[Vectors.fixedCentroidBest]], the same 10 synthetic
    * centroids the assignment query gates), compute exact cosine only
    * WITHIN each cluster, and drop the higher vec_id of every pair with
    * cos ≥ 0.4 — keeper = the smallest partner id. This is the
    * cluster-blocked embedding dedup of the SemDeDup recipe: recall
    * trades against the all-pairs cost by construction (cross-cluster
    * near-dups are invisible — [[qEmbedNeardup]]'s SRP-LSH is the
    * recall-oriented sibling; the audit of that trade is the same shape
    * as [[qLshQuality]]).
    *
    * Determinism: assignment + cosine reuse already-gated kernels;
    * keeper selection is a row_number over (drop_id | keep_id asc) —
    * pure integers after the threshold.
    *
    * Scale shape: the ONLY pairwise work is the per-cluster self-join —
    * at 100 TB the centroid count scales with corpus (nlist ~ √N, the
    * IVF discipline) so per-cluster population stays bounded; the join
    * keys on (cluster) with vec_id inequality, no broadcast hint (both
    * sides are the corpus — AQE picks the strategy), and the window
    * partitions by drop_id (unique key, skew-free). */
  /** The cluster-blocked pair core of [[qSemdedup]]: within-centroid
    * pairs above the cosine threshold, pre-keeper-selection. Shared with
    * the recall audit [[qSemdedupRecall]]. */
  private def semdedupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", dbl($"embedding").as("v"))
      .withColumn("nrm", l2($"v"))
      .withColumn("cluster", Vectors.fixedCentroidBest($"v").getField("k"))
    e.as("a").join(e.as("b"),
        $"a.cluster" === $"b.cluster" && $"a.vec_id" < $"b.vec_id")
      .withColumn("cos", dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"))
      .where($"cos" >= 0.4)
      .select($"a.cluster".as("cluster"), $"a.vec_id".as("x"),
        $"b.vec_id".as("y"), $"cos")
  }

  def qSemdedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = semdedupPairs(spark, sfDir)
    val w = Window.partitionBy($"y").orderBy($"x")
    pairs.withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"cluster", $"x".as("keep_id"), $"y".as("drop_id"),
        round($"cos", 4).as("cos"))
      .orderBy($"drop_id")
  }

  val semdedupSql: String =
    """WITH sd_d AS (
      |  SELECT vec_id, unnest(range(0, 10)) AS k,
      |    round(list_sum(list_transform(range(1, 65), i ->
      |      pow(CAST(embedding[i] AS DOUBLE) -
      |          (CAST((k * 31 + i * 17) % 19 AS DOUBLE) / 19.0 - 0.5) * 0.2, 2))), 6) AS dist
      |  FROM embeddings),
      |sd_r AS (
      |  SELECT vec_id, CAST(k AS BIGINT) AS cluster,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
      |  FROM sd_d),
      |sd_a AS (SELECT vec_id, cluster FROM sd_r WHERE rn = 1),
      |sd_e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sd_n AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      |  FROM sd_e),
      |sd_p AS (
      |  SELECT a1.cluster, n1.vec_id AS x, n2.vec_id AS y,
      |    list_sum(list_transform(list_zip(n1.v, n2.v), z -> z[1] * z[2]))
      |      / (n1.nrm * n2.nrm) AS cos
      |  FROM sd_a a1 JOIN sd_a a2
      |    ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
      |  JOIN sd_n n1 ON n1.vec_id = a1.vec_id
      |  JOIN sd_n n2 ON n2.vec_id = a2.vec_id),
      |sd_k AS (
      |  SELECT cluster, x, y, cos,
      |    row_number() OVER (PARTITION BY y ORDER BY x) AS rn
      |  FROM sd_p WHERE cos >= 0.4)
      |SELECT cluster, x AS keep_id, y AS drop_id, round(cos, 4) + 0.0 AS cos
      |FROM sd_k WHERE rn = 1 ORDER BY drop_id""".stripMargin

  /** Recall audit of [[qSemdedup]]'s cluster blocking against the exact
    * all-pairs cos ≥ 0.4 truth — the SemDeDup twin of [[qLshQuality]]
    * (precision is 1.0 by construction: blocked pairs are verified with
    * the exact cosine; what blocking costs is RECALL, the cross-cluster
    * pairs it can't see). One dashboard row: exact pairs, blocked pairs,
    * recall in ppm.
    *
    * Scale note: the exact-truth arm is quadratic and exists to AUDIT
    * the index at sample scale — the same contract as [[qLshQuality]];
    * at 100 TB the audit runs on a drawn sample, never the corpus. */
  def qSemdedupRecall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", dbl($"embedding").as("v"))
      .withColumn("nrm", l2($"v"))
    val exact = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("cos", dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"))
      .where($"cos" >= 0.4)
    val blocked = semdedupPairs(spark, sfDir)
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(blocked.agg(count(lit(1)).as("n_blocked"))))
      .select($"n_exact", $"n_blocked",
        expr("n_blocked * 1000000 DIV nullif(n_exact, 0)").as("recall_ppm"))
  }

  val semdedupRecallSql: String =
    """WITH sr_e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sr_n AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      |  FROM sr_e),
      |sr_x AS (
      |  SELECT a.vec_id AS x, b.vec_id AS y
      |  FROM sr_n a JOIN sr_n b ON a.vec_id < b.vec_id
      |  WHERE list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]))
      |      / (a.nrm * b.nrm) >= 0.4),
      |sr_d AS (
      |  SELECT vec_id, unnest(range(0, 10)) AS k,
      |    round(list_sum(list_transform(range(1, 65), i ->
      |      pow(CAST(embedding[i] AS DOUBLE) -
      |          (CAST((k * 31 + i * 17) % 19 AS DOUBLE) / 19.0 - 0.5) * 0.2, 2))), 6) AS dist
      |  FROM embeddings),
      |sr_r AS (
      |  SELECT vec_id, CAST(k AS BIGINT) AS cluster,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
      |  FROM sr_d),
      |sr_a AS (SELECT vec_id, cluster FROM sr_r WHERE rn = 1),
      |sr_b AS (
      |  SELECT n1.vec_id AS x, n2.vec_id AS y
      |  FROM sr_a a1 JOIN sr_a a2
      |    ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
      |  JOIN sr_n n1 ON n1.vec_id = a1.vec_id
      |  JOIN sr_n n2 ON n2.vec_id = a2.vec_id
      |  WHERE list_sum(list_transform(list_zip(n1.v, n2.v), z -> z[1] * z[2]))
      |      / (n1.nrm * n2.nrm) >= 0.4)
      |SELECT
      |  (SELECT count(*) FROM sr_x) AS n_exact,
      |  (SELECT count(*) FROM sr_b) AS n_blocked,
      |  (SELECT count(*) FROM sr_b) * 1000000
      |    // nullif((SELECT count(*) FROM sr_x), 0) AS recall_ppm""".stripMargin

  /** Embedding-space dedup clusters: the SRP-LSH near-dup pairs
    * ([[qEmbedNeardup]]) resolved into connected components with the same
    * size-aware union-find as the text-side [[qDedupClusters]] — semantic
    * dedup's final keep/drop unit, where one representative survives per
    * cluster.
    *
    * Scale shape: pair generation is the proven LSH equi-join; component
    * resolution is [[graft.ml.Dedup.connectedComponents]] (pair-bounded,
    * not corpus-bounded). */
  def qSemanticClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = qEmbedNeardup(spark, sfDir).select($"id_a", $"id_b")
    val comp = graft.ml.Dedup.connectedComponents(pairs, "id_a", "id_b")
    val sizes = comp.groupBy($"component").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select($"component", $"node".as("vec_id"), $"cluster_size")
      .orderBy($"component", $"vec_id")
  }

  val semanticClustersSql: String =
    s"""WITH RECURSIVE
      |sc_p AS (SELECT id_a, id_b FROM ($embedNeardupSql)),
      |sc_e AS (SELECT id_a AS u, id_b AS v FROM sc_p
      |         UNION SELECT id_b AS u, id_a AS v FROM sc_p),
      |sc_n AS (SELECT DISTINCT u AS node FROM sc_e),
      |sc_r AS (
      |  SELECT node, node AS reach FROM sc_n
      |  UNION
      |  SELECT sc_e.u AS node, sc_r.reach
      |  FROM sc_e JOIN sc_r ON sc_r.node = sc_e.v),
      |sc_comp AS (SELECT node, min(reach) AS component FROM sc_r GROUP BY node)
      |SELECT c.component, c.node AS vec_id, cs.cluster_size
      |FROM sc_comp c
      |JOIN (SELECT component, count(*) AS cluster_size FROM sc_comp GROUP BY 1) cs
      |  USING (component)
      |ORDER BY component, vec_id""".stripMargin

  /** Brute-force cosine top-k similarity search: 10 fixed probes (vec_id<10),
    * top-5 neighbors each. The probe side is the broadcast side of the join;
    * candidates never shuffle. */
  def qCosineTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", dbl($"embedding").as("v"))
      .withColumn("nrm", l2($"v"))
    val probes = e.where($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"v".as("pv"), $"nrm".as("pn"))
    val w = Window.partitionBy($"p_id").orderBy($"cos".desc, $"vec_id")
    e.join(broadcast(probes), $"vec_id" =!= $"p_id")
      .withColumn("cos", dot($"pv", $"v") / ($"pn" * $"nrm"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 5)
      .select($"p_id", $"rank", $"vec_id", round($"cos", 4).as("cos"))
      .orderBy($"p_id", $"rank")
  }

  /** k-NN classification over the embedding table: the 10 fixed probes'
    * labels predicted by a majority vote of their 5 nearest cosine
    * neighbors ([[qCosineTopk]]'s machinery) — deterministic tie-break
    * (votes DESC, label ASC), scored against each probe's own label. The
    * composed "similarity search powers classification" capstone at query
    * level; probe side broadcast as in every probe-shaped query here. */
  def qKnnClassify(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", dbl($"embedding").as("v"), $"label")
      .withColumn("nrm", l2($"v"))
    val probes = e.where($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"v".as("pv"), $"nrm".as("pn"),
        $"label".as("own_label"))
    val wRank = Window.partitionBy($"p_id").orderBy($"cos".desc, $"vec_id")
    val wVote = Window.partitionBy($"p_id").orderBy($"votes".desc, $"label")
    e.join(broadcast(probes), $"vec_id" =!= $"p_id")
      .withColumn("cos", dot($"pv", $"v") / ($"pn" * $"nrm"))
      .withColumn("rank", row_number().over(wRank))
      .where($"rank" <= 5)
      .groupBy($"p_id", $"own_label", $"label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .where($"vr" === 1)
      .select($"p_id", $"own_label", $"label".as("predicted"), $"votes",
        ($"own_label" === $"label").as("correct"))
      .orderBy($"p_id")
  }

  val knnClassifySql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |    label
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v, label,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |scored AS (
      |  SELECT p.vec_id AS p_id, p.label AS own_label, c.vec_id, c.label,
      |    list_sum(list_transform(list_zip(p.v, c.v), x -> x[1] * x[2])) / (p.nrm * c.nrm) AS cos
      |  FROM n p JOIN n c ON c.vec_id <> p.vec_id
      |  WHERE p.vec_id < 10),
      |r AS (
      |  SELECT p_id, own_label, vec_id, label,
      |    row_number() OVER (PARTITION BY p_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored),
      |v AS (
      |  SELECT p_id, own_label, label, count(*) AS votes
      |  FROM r WHERE rank <= 5 GROUP BY 1, 2, 3),
      |t AS (
      |  SELECT p_id, own_label, label AS predicted, votes,
      |    row_number() OVER (PARTITION BY p_id ORDER BY votes DESC, label) AS vr
      |  FROM v)
      |SELECT p_id, own_label, predicted, votes, own_label = predicted AS correct
      |FROM t WHERE vr = 1 ORDER BY p_id""".stripMargin

  /** ANN recall audit: recall@5 of the IVF index ([[qAnnIvf]]) against
    * the exact brute-force top-5 ([[qCosineTopk]]) — the one-row
    * dashboard number that says whether nprobe/nlist are tuned for the
    * corpus, the IVF twin of [[qLshQuality]]. Both sides are the
    * already-gated plans; the audit adds one pair-keyed join and integer
    * ppm arithmetic. */
  def qAnnRecall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ivf = qAnnIvf(spark, sfDir)
      .select($"probe_id", $"cand_id")
    val exact = qCosineTopk(spark, sfDir)
      .select($"p_id".as("probe_id"), $"vec_id".as("cand_id"))
    val hits = ivf.join(exact, Seq("probe_id", "cand_id"))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select($"n_exact", $"n_hits",
        expr("n_hits * 1000000 DIV nullif(n_exact, 0)").as("recall_ppm"))
  }

  // lazy: interpolates cosineTopkSql, which initializes later in the
  // object; the oracle map at the bottom forces it after everything is set
  lazy val annRecallSql: String =
    s"""WITH ar_ivf AS (
      |  SELECT probe_id, cand_id FROM ($annIvfSql)),
      |ar_bf AS (
      |  SELECT p_id AS probe_id, vec_id AS cand_id FROM ($cosineTopkSql)),
      |ar_hits AS (
      |  SELECT i.probe_id, i.cand_id
      |  FROM ar_ivf i JOIN ar_bf b USING (probe_id, cand_id))
      |SELECT
      |  (SELECT count(*) FROM ar_bf) AS n_exact,
      |  (SELECT count(*) FROM ar_hits) AS n_hits,
      |  (SELECT count(*) FROM ar_hits) * 1000000
      |    // nullif((SELECT count(*) FROM ar_bf), 0) AS recall_ppm""".stripMargin

  /** Hybrid retrieval with reciprocal-rank fusion (RRF, k = 60): the
    * lexical BM25 top-50 ([[Text.qBm25]]) and the dense cosine top-50
    * for probe vector 0 fuse by score = Σ_lists 1/(60 + rank), the
    * fusion rule modern RAG / search stacks use to combine keyword and
    * embedding retrieval. Docs appearing in only one list contribute
    * only that list's term (absent rank ⇒ 0 for the missing list, rank
    * column reported as 0).
    *
    * Determinism: each 1/(60+r) is ONE IEEE double division on integer
    * inputs, the fusion is ONE two-operand add in fixed written order,
    * and the score is quantized to nano-units before the (score, doc_id)
    * presentation sort — bit-identical on both engines.
    *
    * Scale shape: both arms end in TakeOrderedAndProject top-50s (the
    * dense arm broadcasts the 1-row probe; no global window over the
    * corpus — the rank window runs AFTER the 50-row cut, so it is
    * constant-bounded); the fusion is a full-outer join of two 50-row
    * relations. Nothing here grows with corpus size except the two
    * already-gated retrieval arms. */
  def qHybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lex = Dist.withPrefix(
        Text.qBm25(spark, sfDir).select($"doc_id", $"score_micro"),
        Seq($"score_micro".desc, $"doc_id"), Nil, Some("r_lex"))
      .select($"doc_id", $"r_lex")
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", dbl($"embedding").as("v"))
      .withColumn("nrm", l2($"v"))
    val probe = e.where($"vec_id" === 0)
      .select($"v".as("pv"), $"nrm".as("pn"))
    val sem = Dist.withPrefix(
        e.where($"vec_id" =!= 0)
          .crossJoin(broadcast(probe))
          .select($"vec_id".as("doc_id"),
            (dot($"pv", $"v") / ($"pn" * $"nrm")).as("cos"))
          .orderBy($"cos".desc, $"doc_id")
          .limit(50),
        Seq($"cos".desc, $"doc_id"), Nil, Some("r_sem"))
      .select($"doc_id", $"r_sem")
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select($"doc_id", $"r_lex", $"r_sem",
        (coalesce(lit(1.0) / (lit(60.0) + $"r_lex"), lit(0.0))
          + coalesce(lit(1.0) / (lit(60.0) + $"r_sem"), lit(0.0))).as("rrf"))
      .select($"doc_id",
        coalesce($"r_lex", lit(0L)).as("r_lex"),
        coalesce($"r_sem", lit(0L)).as("r_sem"),
        round($"rrf" * 1e9).cast("long").as("score_nano"))
      .orderBy($"score_nano".desc, $"doc_id")
      .limit(20)
  }

  // lazy: interpolates Text.bm25Sql, initialized in another object
  lazy val hybridRrfSql: String =
    s"""WITH hl AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY score_micro DESC, doc_id) AS r_lex
      |  FROM (${graft.ops.Text.bm25Sql})),
      |he AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |hn AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      |  FROM he),
      |hp AS (SELECT v AS pv, nrm AS pn FROM hn WHERE vec_id = 0),
      |hs AS (
      |  SELECT c.vec_id AS doc_id,
      |    list_sum(list_transform(list_zip(pv, c.v), x -> x[1] * x[2])) / (pn * c.nrm) AS cos
      |  FROM hn c CROSS JOIN hp WHERE c.vec_id <> 0),
      |hr AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY cos DESC, doc_id) AS r_sem
      |  FROM hs QUALIFY r_sem <= 50),
      |f AS (
      |  SELECT coalesce(hl.doc_id, hr.doc_id) AS doc_id, r_lex, r_sem,
      |    coalesce(1.0 / (60.0 + r_lex), 0.0)
      |      + coalesce(1.0 / (60.0 + r_sem), 0.0) AS rrf
      |  FROM hl FULL OUTER JOIN hr ON hl.doc_id = hr.doc_id)
      |SELECT doc_id,
      |  CAST(coalesce(r_lex, 0) AS BIGINT) AS r_lex,
      |  CAST(coalesce(r_sem, 0) AS BIGINT) AS r_sem,
      |  CAST(round(rrf * 1e9) AS BIGINT) AS score_nano
      |FROM f ORDER BY score_nano DESC, doc_id LIMIT 20""".stripMargin

  val cosineTopkSql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |scored AS (
      |  SELECT p.vec_id AS p_id, c.vec_id,
      |    list_sum(list_transform(list_zip(p.v, c.v), x -> x[1] * x[2])) / (p.nrm * c.nrm) AS cos
      |  FROM n p JOIN n c ON c.vec_id <> p.vec_id
      |  WHERE p.vec_id < 10),
      |r AS (
      |  SELECT p_id, vec_id, cos,
      |    row_number() OVER (PARTITION BY p_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT p_id, rank, vec_id, round(cos, 4) + 0.0 AS cos
      |FROM r WHERE rank <= 5 ORDER BY p_id, rank""".stripMargin

  /** Multimodal join: text stats and vector stats side by side
    * (documents ⋈ embeddings on doc_id = vec_id). */
  def qMultimodalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir), $"doc_id" === $"vec_id")
      .select($"doc_id", $"lang", $"label",
        size(call_function("graft_tokens", $"text")).cast("long").as("n_tokens"),
        round(l2(dbl($"embedding")), 4).as("vec_norm"))
      .orderBy($"doc_id")
  }

  val multimodalJoinSql: String =
    """SELECT doc_id, lang, label,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
      |  round(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS vec_norm
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |ORDER BY doc_id""".stripMargin

  /** End-to-end corpus-curation pipeline as ONE declared query (the
    * DataPipelineSpec capstone, pulled into the DuckDB gate): near-dup
    * losers from the shingle-Jaccard blocking (higher doc_id of each pair
    * drops) are anti-joined away, a token-count quality band filters the
    * survivors, and the per-language row accounting — corpus in, kept,
    * keep rate, average kept length — is what a 100 TB curation run
    * reports after every stage. One extra shuffle beyond the dedup query
    * itself (the per-lang aggregation); the anti join broadcasts the
    * loser set, which is pair-bounded, not corpus-bounded. */
  def qCurationPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .withColumn("n_toks",
        size(call_function("graft_tokens", $"text")).cast("long"))
    val losers = shingleJaccardPairs(spark, sfDir)
      .select($"doc_b".as("drop_id")).distinct()
    val kept = docs
      .join(losers, $"doc_id" === $"drop_id", "left_anti")
      .where($"n_toks".between(5, 1000))
    val inAgg = docs.groupBy($"lang").agg(count(lit(1)).as("docs_in"))
    val keptAgg = kept.groupBy($"lang").agg(
      count(lit(1)).as("docs_kept"),
      round(sum($"n_toks").cast("double") / count(lit(1)), 4).as("avg_tokens"))
    inAgg.join(keptAgg, Seq("lang"), "left")
      .select($"lang", $"docs_in",
        coalesce($"docs_kept", lit(0L)).as("docs_kept"),
        round(coalesce($"docs_kept", lit(0L)).cast("double") / $"docs_in", 4)
          .as("keep_rate"),
        $"avg_tokens")
      .orderBy($"lang")
  }

  val curationPipelineSql: String =
    s"""WITH losers AS (
      |  SELECT DISTINCT doc_b FROM ($dedupShingleJaccardSql)),
      |d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_toks
      |  FROM documents),
      |kept AS (
      |  SELECT * FROM d
      |  WHERE doc_id NOT IN (SELECT doc_b FROM losers)
      |    AND n_toks BETWEEN 5 AND 1000),
      |i AS (SELECT lang, count(*) AS docs_in FROM d GROUP BY 1),
      |k AS (SELECT lang, count(*) AS docs_kept,
      |        round(CAST(sum(n_toks) AS DOUBLE) / count(*), 4) AS avg_tokens
      |      FROM kept GROUP BY 1)
      |SELECT i.lang, docs_in, coalesce(docs_kept, 0) AS docs_kept,
      |  round(CAST(coalesce(docs_kept, 0) AS DOUBLE) / docs_in, 4) AS keep_rate,
      |  avg_tokens
      |FROM i LEFT JOIN k ON i.lang = k.lang ORDER BY i.lang""".stripMargin

  /** Minimum document frequency for a shingle to count as corpus
    * boilerplate. Mirrored in the oracle. */
  val BoilerplateMinDf = 5

  /** Corpus-level boilerplate detection (north-star curation operator —
    * the shingle-granularity analog of the line-dedup filters in public
    * web-corpus pipelines): a 3-token shingle appearing in ≥
    * [[BoilerplateMinDf]] distinct docs is boilerplate; each doc reports
    * what fraction of its distinct shingles are boilerplate. Shape: ONE
    * digested shingle explode + distinct (the same 120-bit [[digestLo]]/[[digestHi]] digest as
    * the near-dup family, so every shuffle carries a 16-byte key), a
    * document-frequency aggregation over it, and a semi-join back. The
    * digested relation feeds THREE consumers (df cap, per-doc totals,
    * the boilerplate join) — the round-17 comment here trusted AQE to
    * share the distinct's exchange, but the round-18 runtime audit
    * (graft.ReuseAudit) measured the explode+digest+distinct running
    * THREE times (four corpus scans, zero reuse fired); one eager
    * checkpoint materializes it once — the qContamination discipline.
    * All counts are integers; the only double op is the final
    * per-doc division. */
  def qBoilerplateFrac(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = Tables.documents(spark, sfDir)
      .select($"doc_id",
        explode(call_function("graft_shingles", $"text", lit(3))).as("s"))
      .select($"doc_id", call_function("graft_md5_split", $"s").as("dg"))
      .select($"doc_id", $"dg"(0).as("h1"), $"dg"(1).as("h2"))
      .distinct()
      .localCheckpoint(false)
    val bp = sh.groupBy($"h1", $"h2").agg(count(lit(1)).as("df"))
      .where($"df" >= BoilerplateMinDf).select($"h1", $"h2")
    val tot = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_shingles"))
    val boil = sh.join(bp, Seq("h1", "h2"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_boiler"))
    Tables.documents(spark, sfDir).select($"doc_id")
      .join(tot, Seq("doc_id"), "left")
      .join(boil, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_shingles", lit(0L)).as("n_shingles"),
        coalesce($"n_boiler", lit(0L)).as("n_boiler"),
        round(when(coalesce($"n_shingles", lit(0L)) === 0, 0.0)
          .otherwise(coalesce($"n_boiler", lit(0L)).cast("double") / $"n_shingles"),
          6).as("boiler_frac"))
      .orderBy($"doc_id")
  }

  val boilerplateFracSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15) AS BIGINT) AS h1,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 17, 15) AS BIGINT) AS h2
      |  FROM t, UNNEST(range(1, len(toks) - 1)) u(i)),
      |bpset AS (SELECT h1, h2 FROM sh GROUP BY 1, 2 HAVING count(*) >= $BoilerplateMinDf),
      |tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
      |boil AS (SELECT doc_id, count(*) AS n_boiler FROM sh JOIN bpset USING (h1, h2) GROUP BY 1)
      |SELECT d.doc_id, CAST(coalesce(tot.n_shingles, 0) AS BIGINT) AS n_shingles,
      |  CAST(coalesce(boil.n_boiler, 0) AS BIGINT) AS n_boiler,
      |  round(CASE WHEN coalesce(tot.n_shingles, 0) = 0 THEN 0.0
      |    ELSE CAST(coalesce(boil.n_boiler, 0) AS DOUBLE) / tot.n_shingles END, 6) AS boiler_frac
      |FROM documents d LEFT JOIN tot ON d.doc_id = tot.doc_id
      |LEFT JOIN boil ON d.doc_id = boil.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Deterministic stratified train/val/test split (north-star curation
    * operator): every doc's assignment is a pure function of its id —
    * 60-bit md5-prefix digest mod 100, bucket < 80 → train, < 90 → val,
    * else test — so the split is reproducible on any engine, any
    * partitioning, any rerun, with NO sampling state. Reports per
    * (lang, split) counts and each split's share within its language.
    * At 100 TB this is the only split that works: a seeded random sample
    * would need coordinated RNG state across 1000 executors; a hash of
    * the primary key needs nothing. */
  def qStratifiedSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val b = digest60($"doc_id".cast("string")) % 100
    val split = when(b < 80, "train").when(b < 90, "val").otherwise("test")
    Tables.documents(spark, sfDir)
      .select($"lang", split.as("split"))
      .groupBy($"lang", $"split").agg(count(lit(1)).as("docs"))
      .withColumn("lang_share",
        round($"docs".cast("double") /
          sum($"docs").over(Window.partitionBy($"lang")), 4))
      .orderBy($"lang", $"split")
  }

  val stratifiedSplitSql: String =
    """WITH a AS (
      |  SELECT lang,
      |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 80 THEN 'train'
      |         WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |g AS (SELECT lang, split, count(*) AS docs FROM a GROUP BY 1, 2)
      |SELECT lang, split, docs,
      |  round(CAST(docs AS DOUBLE) / sum(docs) OVER (PARTITION BY lang), 4) AS lang_share
      |FROM g ORDER BY lang, split""".stripMargin

  /** Source-weighted corpus mixing (north-star): each source gets a target
    * sampling rate (here derived from the source id — 25/50/75/100% — the
    * shape, not the numbers, is the operator) and docs are kept by a
    * salted hash threshold, again stateless and engine-reproducible. The
    * report per source: docs in/kept, target vs realized rate, and kept
    * token volume — what a mixing run publishes after every pass. One
    * scan, one aggregation; the keep decision is a pure projection. */
  def qSourceMix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // digit-free source names fall back to id 0 on BOTH engines (Spark's
    // regexp_extract yields '' -> null cast; the oracle nullif+coalesce)
    val ratePct = (lit(25) +
      coalesce(regexp_extract($"source", "\\d+", 0).cast("int"), lit(0)) % 4 * 25)
      .cast("long")
    val bucket =
      digest60(concat(lit("mix"), $"doc_id".cast("string"))) % 100
    val nToks = size(call_function("graft_tokens", $"text")).cast("long")
    Tables.documents(spark, sfDir)
      .select($"source", ratePct.as("target_pct"), (bucket < ratePct).as("keep"),
        nToks.as("n_toks"))
      .groupBy($"source", $"target_pct")
      .agg(count(lit(1)).as("docs_in"),
        sum(when($"keep", 1L).otherwise(0L)).as("docs_kept"),
        sum(when($"keep", $"n_toks").otherwise(0L)).as("tokens_kept"))
      .withColumn("realized_rate",
        round($"docs_kept".cast("double") / $"docs_in", 4))
      .select($"source", $"target_pct", $"docs_in", $"docs_kept",
        $"realized_rate", $"tokens_kept")
      .orderBy($"source")
  }

  val sourceMixSql: String =
    """WITH a AS (
      |  SELECT source,
      |    CAST(25 + CAST(coalesce(nullif(regexp_extract(source, '\d+'), ''), '0') AS INT) % 4 * 25 AS BIGINT) AS target_pct,
      |    CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_toks
      |  FROM documents)
      |SELECT source, target_pct, count(*) AS docs_in,
      |  CAST(sum(CASE WHEN bucket < target_pct THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
      |  round(CAST(sum(CASE WHEN bucket < target_pct THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS realized_rate,
      |  CAST(sum(CASE WHEN bucket < target_pct THEN n_toks ELSE 0 END) AS BIGINT) AS tokens_kept
      |FROM a GROUP BY 1, 2 ORDER BY source""".stripMargin

  /** Cross-source duplication matrix — which sources copy from which: the
    * near-dup pairs from [[shingleJaccardPairs]] joined back to each
    * doc's `source`, aggregated per (source_a, source_b) with each cell's
    * share of all near-dup pairs. The provenance report a curation run
    * publishes next to its dedup counts. Scale shape: the pair core is
    * pair-bounded (df-capped posting lists); the two metadata joins key
    * on doc id against a projection of `documents`; the final rollup is
    * source²-bounded. */
  def qDupRateBySource(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, sfDir).select($"doc_id", $"source")
    // Round-20 optimization note (re-measured, deliberately left alone):
    // eagerly checkpointing the (src_lo, src_hi) cell relation — so the
    // total branch reads the checkpoint instead of re-deriving the whole
    // near-dup pipeline (runtime scan audit: documents=5) — was re-tried
    // this round and was SLOWER again, reproducing the r17 adjudication
    // in PlanShapeSpec's exceptions map: min-of-4 Probe, q_theil_sen
    // reference, checkpointed 2.22 s @ ref 1.66 (ratio 1.34) vs inline
    // 2.41 s @ ref 2.11 (ratio 1.14). AQE exchange reuse already spares
    // the expensive recompute; the eager checkpoint only adds a
    // materialization barrier. Revert stands.
    val pairs = shingleJaccardPairs(spark, sfDir)
      .join(src.select($"doc_id".as("doc_a"), $"source".as("source_a")), "doc_a")
      .join(src.select($"doc_id".as("doc_b"), $"source".as("source_b")), "doc_b")
      // canonical unordered cell: (min, max) so A→B and B→A accumulate once
      .select(least($"source_a", $"source_b").as("src_lo"),
        greatest($"source_a", $"source_b").as("src_hi"))
    // Round 21 (guide §2.4): the total is Σ n_pairs over the CELL rollup,
    // not a separate count over the raw pair relation — both consumers of
    // the expensive pair pipeline now share the whole subtree up to and
    // including the (src_lo, src_hi) exchange, so ReusedExchange collapses
    // the former second pipeline derivation (runtime scan audit:
    // documents 5 → 3; the two remaining extra scans are the doc_a/doc_b
    // source projections). Identical algebra: every pair lands in exactly
    // one cell, so the cell-count sum IS the pair count.
    val cells = pairs.groupBy($"src_lo", $"src_hi")
      .agg(count(lit(1)).as("n_pairs"))
    val total = cells.agg(sum($"n_pairs").as("n_total"))
    cells.crossJoin(broadcast(total))
      .select($"src_lo", $"src_hi", $"n_pairs",
        round($"n_pairs".cast("double") / $"n_total", 4).as("pair_share"))
      .orderBy($"src_lo", $"src_hi")
  }

  val dupRateBySourceSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s0 AS (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 1, 15) AS BIGINT) AS sh1,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 17, 15) AS BIGINT) AS sh2
      |  FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
      |s AS (
      |  SELECT s0.* FROM s0
      |  JOIN (SELECT sh1, sh2 FROM s0 GROUP BY 1, 2 HAVING count(*) <= $ShingleMaxDf) r USING (sh1, sh2)),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM s a JOIN s b ON a.sh1 = b.sh1 AND a.sh2 = b.sh2 AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |nd AS (
      |  SELECT doc_a, doc_b
      |  FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      |  WHERE CAST(n_inter AS DOUBLE) / (x.n_sh + y.n_sh - n_inter) >= 0.8),
      |cells AS (
      |  SELECT least(da.source, db.source) AS src_lo,
      |    greatest(da.source, db.source) AS src_hi
      |  FROM nd JOIN documents da ON nd.doc_a = da.doc_id
      |          JOIN documents db ON nd.doc_b = db.doc_id),
      |tot AS (SELECT count(*) AS n_total FROM cells)
      |SELECT src_lo, src_hi, count(*) AS n_pairs,
      |  round(CAST(count(*) AS DOUBLE) / n_total, 4) AS pair_share
      |FROM cells CROSS JOIN tot
      |GROUP BY src_lo, src_hi, n_total ORDER BY src_lo, src_hi""".stripMargin

  /** Temperature-weighted source mixing (α = 0.7) — the up/down-sampling
    * weights a multi-source LLM pipeline derives before training: sampling
    * probability ∝ tokens^α, which upweights small sources relative to
    * their raw share. Per source: token counts (exact longs), the
    * α-power quantized to milli-units (`round(pow(tokens, 0.7)·10³)` — one
    * libm pow on identical input bits), then integer-ratio shares and the
    * resulting epoch multiplier. One aggregation plus one broadcast
    * totals row; output is source-cardinality-bounded. */
  def qSourceTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perSource = Tables.documents(spark, sfDir)
      .select($"source",
        size(call_function("graft_tokens", $"text")).cast("long").as("n_toks"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
      .withColumn("pw_milli",
        round(pow($"n_tokens".cast("double"), 0.7) * 1e3).cast("long"))
    val totals = perSource.agg(sum($"n_tokens").as("tot_tokens"),
      sum($"pw_milli").as("tot_pw"))
    perSource.crossJoin(broadcast(totals))
      .select($"source", $"n_docs", $"n_tokens",
        round($"n_tokens".cast("double") / $"tot_tokens", 6).as("raw_share"),
        round($"pw_milli".cast("double") / $"tot_pw", 6).as("temp_share"),
        round(($"pw_milli".cast("double") / $"tot_pw") /
          ($"n_tokens".cast("double") / $"tot_tokens"), 4).as("epoch_mult"))
      .orderBy($"source")
  }

  val sourceTemperatureSql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_toks
      |  FROM documents),
      |s AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |    CAST(round(pow(CAST(sum(n_toks) AS DOUBLE), 0.7) * 1e3) AS BIGINT) AS pw_milli
      |  FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
      |             CAST(sum(pw_milli) AS BIGINT) AS tot_pw FROM s)
      |SELECT source, n_docs, n_tokens,
      |  round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS raw_share,
      |  round(CAST(pw_milli AS DOUBLE) / tot_pw, 6) AS temp_share,
      |  round((CAST(pw_milli AS DOUBLE) / tot_pw) /
      |        (CAST(n_tokens AS DOUBLE) / tot_tokens), 4) AS epoch_mult
      |FROM s CROSS JOIN t ORDER BY source""".stripMargin

  /** Train-df cap for contamination candidates (a shingle in more train
    * docs than this is boilerplate, not leakage — same safety valve as
    * [[ShingleMaxDf]]) and the minimum shared-shingle count to report. */
  val ContaminationMaxDf = 20
  val ContaminationMinShared = 3

  /** Test-set contamination check (north-star eval-hygiene operator):
    * composes [[qStratifiedSplit]]'s hash split with the dedup machinery —
    * for every test-split doc, which train-split docs share ≥
    * [[ContaminationMinShared]] rare 3-token shingles, and what fraction
    * of the test doc that overlap covers. Rare = train-df ≤
    * [[ContaminationMaxDf]]: hot shingles are boilerplate and would
    * explode the join while carrying no leakage signal (the identical cap
    * discipline as the near-dup family). Shape: digested shingle explode →
    * split by the id hash → df-capped equi-join on 16-byte keys → pair
    * count + join back for the size — no all-pairs anywhere, and the join
    * fans out only on RARE keys, bounded by the cap. */
  def qContamination(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = Tables.documents(spark, sfDir)
      .select($"doc_id",
        (digest60($"doc_id".cast("string")) % 100).as("bucket"),
        explode(call_function("graft_shingles", $"text", lit(3))).as("s"))
      .select($"doc_id", $"bucket",
        call_function("graft_md5_split", $"s").as("dg"))
      .select($"doc_id", $"bucket", $"dg"(0).as("h1"), $"dg"(1).as("h2"))
      .distinct()
      // the shingle relation feeds FOUR subtrees (train side twice for the
      // df cap and the pair join, test side twice for the join and the
      // size relation): one eager localCheckpoint materializes it once and
      // collapses four copies of the explode+md5 codegen out of the plan —
      // the same shared-relation discipline as qPagerank/qOutlierFilter
      // (cold-start planning+JIT measured ~7s -> ~3s on the full plan)
      .localCheckpoint()
    val tr = sh.where($"bucket" < 80)
      .select($"doc_id".as("train_doc"), $"h1", $"h2")
    val te = sh.where($"bucket" >= 90)
      .select($"doc_id".as("test_doc"), $"h1", $"h2")
    val rare = tr.groupBy($"h1", $"h2").agg(count(lit(1)).as("df"))
      .where($"df" <= ContaminationMaxDf).select($"h1", $"h2")
    val shared = te.join(rare, Seq("h1", "h2")).join(tr, Seq("h1", "h2"))
      .groupBy($"test_doc", $"train_doc").agg(count(lit(1)).as("n_shared"))
      .where($"n_shared" >= ContaminationMinShared)
    val tsz = te.groupBy($"test_doc").agg(count(lit(1)).as("n_sh"))
    shared.join(tsz, "test_doc")
      .select($"test_doc", $"train_doc", $"n_shared",
        round($"n_shared".cast("double") / $"n_sh", 4).as("overlap_frac"))
      .orderBy($"test_doc", $"train_doc")
  }

  val contaminationSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, bucket,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15) AS BIGINT) AS h1,
      |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 17, 15) AS BIGINT) AS h2
      |  FROM t, UNNEST(range(1, len(toks) - 1)) u(i)),
      |tr AS (SELECT doc_id, h1, h2 FROM sh WHERE bucket < 80),
      |te AS (SELECT doc_id, h1, h2 FROM sh WHERE bucket >= 90),
      |rare AS (SELECT h1, h2 FROM tr GROUP BY 1, 2 HAVING count(*) <= $ContaminationMaxDf),
      |shared AS (
      |  SELECT te.doc_id AS test_doc, tr.doc_id AS train_doc, count(*) AS n_shared
      |  FROM te JOIN rare USING (h1, h2) JOIN tr USING (h1, h2)
      |  GROUP BY 1, 2),
      |tsz AS (SELECT doc_id, count(*) AS n_sh FROM te GROUP BY 1)
      |SELECT s.test_doc, s.train_doc, s.n_shared,
      |  round(CAST(s.n_shared AS DOUBLE) / t.n_sh, 4) AS overlap_frac
      |FROM shared s JOIN tsz t ON s.test_doc = t.doc_id
      |WHERE s.n_shared >= $ContaminationMinShared
      |ORDER BY test_doc, train_doc""".stripMargin

  /** N-gram order for eval-set decontamination — 13 is the canonical
    * value from the GPT-3 appendix (Brown et al. 2020, §C): long enough
    * that a shared n-gram is essentially never coincidence, short enough
    * to catch partial quotes. */
  val DecontamN = 13

  /** Eval-set decontamination report (north-star eval-hygiene operator —
    * the REMOVAL side of [[qContamination]]'s detection): a train-split
    * doc is contaminated if it shares ANY exact [[DecontamN]]-gram with
    * any eval-split doc, the standard GPT-3-style filter. Reports, per
    * source, how many train docs there are and how many the filter would
    * drop (ppm rate) — the per-source view is what a curation run reviews
    * before deleting.
    *
    * Shape: one shingle pass over the corpus (codegen'd
    * `graft_shingles(text, 13)`), 120-bit digests, split by the same
    * md5-of-id hash as [[qStratifiedSplit]]; contaminated = train shingle
    * rows semi-joined against the DISTINCT eval digest set on the
    * two-long key. No broadcast hint on the eval side on purpose: a real
    * eval set is small and AQE will broadcast it, but this query's eval
    * slice is data-derived (10% of the corpus) and a forced hint would
    * OOM the driver at scale. Docs shorter than 13 tokens emit no
    * shingles and can never be flagged — they still count in n_train. */
  def qDecontamNgram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        (digest60($"doc_id".cast("string")) % 100).as("bucket"))
    val sh = Tables.documents(spark, sfDir)
      .select($"doc_id",
        (digest60($"doc_id".cast("string")) % 100).as("bucket"),
        explode(call_function("graft_shingles", $"text", lit(DecontamN))).as("s"))
      .select($"doc_id", $"bucket",
        call_function("graft_md5_split", $"s").as("dg"))
      .select($"doc_id", $"bucket", $"dg"(0).as("h1"), $"dg"(1).as("h2"))
    val ev = sh.where($"bucket" >= 90).select($"h1", $"h2").distinct()
    val contaminated = sh.where($"bucket" < 80)
      .join(ev, Seq("h1", "h2"), "left_semi")
      .select($"doc_id").distinct()
    val trainDocs = docs.where($"bucket" < 80)
    trainDocs.join(contaminated.withColumn("__hit", lit(1)), Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_train"),
        count($"__hit").as("n_contaminated"))
      .select($"source", $"n_train", $"n_contaminated",
        expr("n_contaminated * 1000000 DIV n_train").as("drop_ppm"))
      .orderBy($"source")
  }

  val decontamNgramSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, bucket,
      |    CAST('0x' || substr(md5(array_to_string(toks[i:i+${DecontamN - 1}], ' ')), 1, 15) AS BIGINT) AS h1,
      |    CAST('0x' || substr(md5(array_to_string(toks[i:i+${DecontamN - 1}], ' ')), 17, 15) AS BIGINT) AS h2
      |  FROM t, UNNEST(range(1, len(toks) - ${DecontamN - 2})) u(i)
      |  WHERE len(toks) >= $DecontamN),
      |ev AS (SELECT DISTINCT h1, h2 FROM sh WHERE bucket >= 90),
      |cont AS (
      |  SELECT DISTINCT sh.doc_id
      |  FROM sh JOIN ev USING (h1, h2) WHERE sh.bucket < 80)
      |SELECT t.source, count(*) AS n_train,
      |  count(cont.doc_id) AS n_contaminated,
      |  count(cont.doc_id) * 1000000 // count(*) AS drop_ppm
      |FROM t LEFT JOIN cont ON t.doc_id = cont.doc_id
      |WHERE t.bucket < 80
      |GROUP BY t.source ORDER BY t.source""".stripMargin

  /** Eval-set n-gram coverage — the RECALL direction of
    * [[qDecontamNgram]]: decontam asks "which TRAIN docs must drop";
    * this asks "how much of each eval doc's content the train set
    * already contains" (the number a benchmark-leakage dashboard
    * tracks per eval source — high coverage means the benchmark can be
    * answered from memorization). Per eval-split source: eval docs,
    * distinct eval 13-grams, how many of those appear anywhere in the
    * train split, coverage ppm.
    *
    * Shape: the same one shingle pass / 120-bit digests / hash split as
    * decontam, but aggregated from the EVAL side: distinct eval
    * (source, digest) rows semi-joined against the distinct train
    * digest set. Same no-broadcast-hint rationale. */
  def qNgramCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        (digest60($"doc_id".cast("string")) % 100).as("bucket"))
    val sh = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        (digest60($"doc_id".cast("string")) % 100).as("bucket"),
        explode(call_function("graft_shingles", $"text", lit(DecontamN))).as("s"))
      .select($"source", $"bucket",
        call_function("graft_md5_split", $"s").as("dg"))
      .select($"source", $"bucket", $"dg"(0).as("h1"), $"dg"(1).as("h2"))
    val tr = sh.where($"bucket" < 80).select($"h1", $"h2").distinct()
    // ev feeds TWO consumers (the coverage semi-join and the n_grams
    // denominator) and ReuseAudit measured its explode+distinct running
    // twice — materialize the 10%-slice distinct once; tr stays lazy
    // (single consumer, and its 80% slice is the expensive side)
    val ev = sh.where($"bucket" >= 90)
      .select($"source", $"h1", $"h2").distinct()
      .localCheckpoint(true)
    val covered = ev.join(tr, Seq("h1", "h2"), "left_semi")
      .groupBy($"source").agg(count(lit(1)).as("n_covered"))
    val evalDocs = docs.where($"bucket" >= 90)
      .groupBy($"source").agg(count(lit(1)).as("n_eval_docs"))
    ev.groupBy($"source").agg(count(lit(1)).as("n_grams"))
      .join(covered, Seq("source"), "left")
      .join(evalDocs, Seq("source"), "left")
      .select($"source", coalesce($"n_eval_docs", lit(0L)).as("n_eval_docs"),
        $"n_grams", coalesce($"n_covered", lit(0L)).as("n_covered"),
        expr("coalesce(n_covered, 0) * 1000000 DIV n_grams").as("coverage_ppm"))
      .orderBy($"source")
  }

  val ngramCoverageSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
      |  FROM documents),
      |sh AS (
      |  SELECT source, bucket,
      |    CAST('0x' || substr(md5(array_to_string(toks[i:i+${DecontamN - 1}], ' ')), 1, 15) AS BIGINT) AS h1,
      |    CAST('0x' || substr(md5(array_to_string(toks[i:i+${DecontamN - 1}], ' ')), 17, 15) AS BIGINT) AS h2
      |  FROM t, UNNEST(range(1, len(toks) - ${DecontamN - 2})) u(i)
      |  WHERE len(toks) >= $DecontamN),
      |tr AS (SELECT DISTINCT h1, h2 FROM sh WHERE bucket < 80),
      |ev AS (SELECT DISTINCT source, h1, h2 FROM sh WHERE bucket >= 90),
      |cov AS (
      |  SELECT source, count(*) AS n_covered
      |  FROM ev SEMI JOIN tr USING (h1, h2)
      |  GROUP BY 1),
      |ed AS (
      |  SELECT source, count(*) AS n_eval_docs FROM t
      |  WHERE bucket >= 90 GROUP BY 1),
      |g AS (SELECT source, count(*) AS n_grams FROM ev GROUP BY 1)
      |SELECT g.source, COALESCE(ed.n_eval_docs, 0) AS n_eval_docs,
      |  g.n_grams, COALESCE(cov.n_covered, 0) AS n_covered,
      |  COALESCE(cov.n_covered, 0) * 1000000 // g.n_grams AS coverage_ppm
      |FROM g LEFT JOIN cov ON g.source = cov.source
      |LEFT JOIN ed ON g.source = ed.source
      |ORDER BY g.source""".stripMargin

  /** Near-dup cluster resolution (north-star — the dedup pipeline's FINAL
    * step): the shingle-Jaccard pair set resolved to connected components
    * via [[graft.ml.Dedup.connectedComponents]] (iterative min-label
    * propagation; see its scale notes), reporting every clustered doc
    * with its canonical representative (component = min doc id) and the
    * cluster size. Pairs alone over-delete on chains (a–b, b–c drops both
    * b and c under the naive higher-id rule); components give the correct
    * one-survivor-per-cluster answer. The oracle computes the identical
    * transitive closure with a recursive CTE — set-deterministic, so the
    * iterative and recursive spellings hash-match. */
  def qDedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = shingleJaccardPairs(spark, sfDir).select($"doc_a", $"doc_b")
    val comp = graft.ml.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val sizes = comp.groupBy($"component").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select($"component", $"node".as("doc_id"), $"cluster_size")
      .orderBy($"component", $"doc_id")
  }

  val dedupClustersSql: String =
    s"""WITH RECURSIVE
      |p AS (SELECT doc_a, doc_b FROM ($dedupShingleJaccardSql)),
      |e AS (SELECT doc_a AS u, doc_b AS v FROM p
      |      UNION SELECT doc_b AS u, doc_a AS v FROM p),
      |n AS (SELECT DISTINCT u AS node FROM e),
      |r AS (
      |  SELECT node, node AS reach FROM n
      |  UNION
      |  SELECT e.u AS node, r.reach FROM e JOIN r ON r.node = e.v),
      |comp AS (SELECT node, min(reach) AS component FROM r GROUP BY node)
      |SELECT c.component, c.node AS doc_id, cs.cluster_size
      |FROM comp c
      |JOIN (SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1) cs
      |  USING (component)
      |ORDER BY component, doc_id""".stripMargin

  /** Quality-policy cluster resolution (north-star — the KEEP side of the
    * dedup pipeline): [[qDedupClusters]] answers "which docs co-cluster";
    * this query answers "which one survives". Policy: keep the member
    * with the most tokens (ties → smallest doc_id) — the "longest
    * version wins" rule curation runs use so truncated/mirrored copies
    * lose to the fullest original, rather than min-id-wins which keeps
    * whichever copy happened to be crawled first.
    *
    * Shape: the shared pair core → connected components → one join to a
    * token-count projection → one max_by hash aggregate (map-side
    * combinable; no per-component sort window at all). Reports keeper
    * and drop count per cluster. */
  def qDedupKeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = shingleJaccardPairs(spark, sfDir).select($"doc_a", $"doc_b")
    val comp = graft.ml.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", size(call_function("graft_tokens", $"text"))
        .cast("long").as("n_tokens"))
    val m = comp.join(toks, $"node" === $"doc_id")
      .select($"component", $"node", $"n_tokens")
    // the keep-policy argmax as ONE map-side-combinable hash aggregate:
    // max_by over the (n_tokens, -node) order key — no per-component
    // sort window, no second aggregation pass. The order key is unique
    // per member (node is unique), so max_by is deterministic.
    m.groupBy($"component")
      .agg(
        max_by(struct($"node", $"n_tokens"),
          struct($"n_tokens", (-$"node").as("neg"))).as("__k"),
        count(lit(1)).as("n_members"))
      .select($"component", $"__k.node".as("keeper_doc"),
        $"__k.n_tokens".as("keeper_tokens"), $"n_members",
        ($"n_members" - 1).as("n_dropped"))
      .orderBy($"component")
  }

  val dedupKeepBestSql: String =
    s"""WITH RECURSIVE
      |p AS (SELECT doc_a, doc_b FROM ($dedupShingleJaccardSql)),
      |e AS (SELECT doc_a AS u, doc_b AS v FROM p
      |      UNION SELECT doc_b AS u, doc_a AS v FROM p),
      |n AS (SELECT DISTINCT u AS node FROM e),
      |r AS (
      |  SELECT node, node AS reach FROM n
      |  UNION
      |  SELECT e.u AS node, r.reach FROM e JOIN r ON r.node = e.v),
      |comp AS (SELECT node, min(reach) AS component FROM r GROUP BY node),
      |tk AS (
      |  SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |m AS (
      |  SELECT c.component, c.node, tk.n_tokens,
      |    row_number() OVER (PARTITION BY c.component
      |                       ORDER BY tk.n_tokens DESC, c.node) AS rn
      |  FROM comp c JOIN tk ON c.node = tk.doc_id)
      |SELECT component,
      |  min(CASE WHEN rn = 1 THEN node END) AS keeper_doc,
      |  min(CASE WHEN rn = 1 THEN n_tokens END) AS keeper_tokens,
      |  count(*) AS n_members,
      |  count(*) - 1 AS n_dropped
      |FROM m GROUP BY component ORDER BY component""".stripMargin

  /** Token capacity per training chunk for [[qSequencePack]]. */
  val PackCapacity = 2000L

  /** Sequence packing (north-star training-prep operator): assign docs to
    * fixed-token-budget training chunks — the step that turns a curated
    * corpus into trainer-shaped work units. Docs pack per language in
    * doc_id order by the STREAMING rule chunk = floor(preceding-tokens /
    * capacity): deterministic, one window pass, and the window partitions
    * by language so no unpartitioned global sort exists. (True bin
    * packing is NP-hard and order-sensitive; the streaming rule is the
    * standard scalable approximation — chunks can overflow by at most one
    * doc.) Reports per-chunk doc and token counts. */
  def qSequencePack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        size(call_function("graft_tokens", $"text")).cast("long").as("n_toks"))
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum($"n_toks").over(w))
      .select($"lang",
        floor(($"cum" - $"n_toks") / PackCapacity).cast("long").as("chunk"),
        $"n_toks")
      .groupBy($"lang", $"chunk")
      .agg(count(lit(1)).as("docs"), sum($"n_toks").as("tokens"))
      .orderBy($"lang", $"chunk")
  }

  val sequencePackSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, n_toks,
      |    sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT lang, CAST((cum - n_toks) // $PackCapacity AS BIGINT) AS chunk,
      |  count(*) AS docs, CAST(sum(n_toks) AS BIGINT) AS tokens
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** IDF-weighted shingle cosine between near-duplicate candidates — the
    * weighted-resemblance scorer beside [[qDedupShingleJaccard]]'s set
    * Jaccard (a shared rare shingle now counts for more than a shared
    * common one). The vector space is the PRUNED shingle space — shingles
    * with df ≤ [[ShingleMaxDf]] — the same boilerplate-pruning rule the
    * Jaccard path applies, and what makes the single-aggregation shape
    * below possible.
    *
    * Scale shape (mirrors the Jaccard query's one-aggregation design): tf
    * packs into the posting-list longs (`doc_id·256 + least(tf, 255)`, so
    * the list sorts by doc and unpacks in a projection), ONE sh-keyed
    * aggregation yields df + the capped packed posting list, and BOTH
    * consumers — per-doc norms (explode members) and per-pair dot
    * products (`graft_pairs`, contribution tf_a·tf_b·idfq² per shared
    * shingle) — read that aggregation's exchange, which AQE materializes
    * once. No join-back, no checkpoint, no cache lifecycle. (A join-back
    * spelling that re-scanned a (doc, sh, weight) relation from both
    * sides of the dot product benched 8–10 s at sf0.1; this one ~2 s.
    * Round 21 closed the family's one untried variant: a LAZY
    * `localCheckpoint(false)` on this lists aggregation — interleaved
    * probes, q_theil_sen reference — read ratio-to-ref 1.59/1.71 vs
    * 1.44/1.48 inline, i.e. ~15% SLOWER: the checkpoint replaces the
    * already-reused exchange with an RDD materialization plus lineage
    * truncation and buys nothing. The AQE-reuse spelling stands.)
    *
    * Determinism: idf is quantized per shingle (`round(ln(N/df)·10⁴)` as
    * BIGINT — one libm call on identical bits); the dot product and the
    * squared norms are then exact integer sums in any order; the final
    * cosine performs the ONLY floating-point steps (two correctly-rounded
    * sqrts, one multiply, one divide) on identical integer inputs, so it
    * is bit-identical across engines. */
  def qShingleCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lists = Tables.documents(spark, sfDir)
      .select($"doc_id",
        explode(call_function("graft_shingles", $"text", lit(3))).as("shs"))
      .select($"doc_id", call_function("graft_md5_split", $"shs").as("dg"))
      .select($"doc_id", $"dg"(0).as("sh1"), $"dg"(1).as("sh2"))
      .groupBy($"doc_id", $"sh1", $"sh2").agg(count(lit(1)).as("tf"))
      .groupBy($"sh1", $"sh2")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_set($"doc_id" * 256 + least($"tf", lit(255L))))
          .as("ds"))
      .where($"df" <= ShingleMaxDf)
    val n = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val idfq = round(log($"n_docs".cast("double") / $"df") * 1e4).cast("long")
    // `withSingles = true` emits one (member, -1) marker per list member
    // beside the C(df, 2) pairs — exactly the Jaccard query's trick — so
    // ONE hash aggregation keyed (a, b) accumulates BOTH the per-pair dot
    // products (b >= 0: tf_a·tf_b·idfq²) and the per-doc squared norms
    // (b = -1: (tf·idfq)²); the norm frames then join back onto the pairs
    // from the same exchange, which AQE materializes once
    val counts = lists.crossJoin(broadcast(n))
      .select(idfq.as("idfq"),
        explode(call_function("graft_pairs", $"ds", lit(true))).as("e"))
      .select(expr("e.x DIV 256").as("a"),
        when($"e.y" === -1L, -1L).otherwise(expr("e.y DIV 256")).as("b"),
        when($"e.y" === -1L, ($"e.x" % 256) * $"idfq" * ($"e.x" % 256) * $"idfq")
          .otherwise(($"e.x" % 256) * ($"e.y" % 256) * $"idfq" * $"idfq").as("c"))
      .groupBy($"a", $"b")
      .agg(sum($"c").as("v"), count(lit(1)).as("m"))
    val norms = counts.where($"b" === -1L).select($"a".as("doc"), $"v".as("n2"))
    counts.where($"b" =!= -1L)
      .select($"a", $"b", $"v".as("dot"), $"m".as("n_common"))
      .join(norms.select($"doc".as("a"), $"n2".as("na2")), "a")
      .join(norms.select($"doc".as("b"), $"n2".as("nb2")), "b")
      .withColumn("cosine",
        $"dot".cast("double") / (sqrt($"na2".cast("double")) * sqrt($"nb2".cast("double"))))
      .where($"cosine" >= 0.6)
      .select($"a".as("doc_a"), $"b".as("doc_b"), $"n_common",
        round($"cosine", 6).as("cosine"))
      .orderBy($"doc_a", $"doc_b")
  }

  val shingleCosineSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 1, 15) AS BIGINT) AS sh1,
       |    CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), 17, 15) AS BIGINT) AS sh2
       |  FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
       |tf0 AS (SELECT doc_id, sh1, sh2, count(*) AS tf FROM s GROUP BY 1, 2, 3),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |rare AS (SELECT sh1, sh2, count(*) AS df FROM tf0 GROUP BY 1, 2 HAVING count(*) <= $ShingleMaxDf),
       |w AS (
       |  SELECT tf0.doc_id, tf0.sh1, tf0.sh2, least(tf0.tf, 255) AS tfc,
       |    CAST(round(ln(CAST(n_docs AS DOUBLE) / rare.df) * 1e4) AS BIGINT) AS idfq
       |  FROM tf0 JOIN rare ON tf0.sh1 = rare.sh1 AND tf0.sh2 = rare.sh2 CROSS JOIN n),
       |norms AS (
       |  SELECT doc_id, CAST(sum(tfc * idfq * tfc * idfq) AS BIGINT) AS n2
       |  FROM w GROUP BY 1),
       |d AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b,
       |    CAST(sum(a.tfc * b.tfc * a.idfq * a.idfq) AS BIGINT) AS dot,
       |    count(*) AS n_common
       |  FROM w a JOIN w b ON a.sh1 = b.sh1 AND a.sh2 = b.sh2 AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a AS doc_a, b AS doc_b, n_common,
       |  round(CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
       |FROM d JOIN norms na ON na.doc_id = a JOIN norms nb ON nb.doc_id = b
       |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.6
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Blocked fuzzy entity-resolution join — the record-linkage operator:
    * candidate pairs come ONLY from a cheap blocking key (part size + the
    * name's head noun), the expensive edit-distance verify runs inside the
    * block, and the top-20 closest pairs are reported with a total-order
    * tie-break. Unlike `q_edit_distance`'s capped string-function demo,
    * this is the full-corpus linkage discipline.
    *
    * Scale shape: the blocked self-join is the standard ER answer to the
    * all-pairs O(n²) — pair fan-out is Σ_b |b|², and each block is CAPPED
    * at 32 members (deterministic by key, mirrored in the oracle's
    * QUALIFY) so one hot block can never quadratically blow the join; the
    * final cut is TakeOrderedAndProject, never a global sort. Levenshtein
    * is codegen'd on both engines with identical unit-cost semantics. */
  /** The shared blocked-Levenshtein pair core: capped (p_size, noun)
    * blocks self-joined, edit distance 1..6 verified in-block (the
    * [[graft.plans.LevenshteinBandRule]] turns the verify into the
    * banded thresholded DP). Consumed by [[qFuzzyJoin]] (closest pairs)
    * and [[qEntityResolution]] (transitive closure). */
  private def fuzzyPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_name", $"p_size",
        regexp_extract($"p_name", "([a-z]+)$", 1).as("noun"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"p_size", $"noun").orderBy($"p_partkey")))
      .where($"rn" <= 32).drop("rn")
    p.as("a").join(p.as("b"),
        $"a.p_size" === $"b.p_size" && $"a.noun" === $"b.noun" &&
          $"a.p_partkey" < $"b.p_partkey")
      .select($"a.p_partkey".as("key_a"), $"b.p_partkey".as("key_b"),
        $"a.p_name".as("name_a"), $"b.p_name".as("name_b"),
        levenshtein($"a.p_name", $"b.p_name").cast("long").as("dist"))
      .where($"dist".between(1, 6))
  }

  private val fuzzyPairsSql: String =
    """WITH fp_p AS (
      |  SELECT p_partkey, p_name, p_size,
      |    regexp_extract(p_name, '([a-z]+)$', 1) AS noun
      |  FROM part
      |  QUALIFY row_number() OVER (PARTITION BY p_size, noun ORDER BY p_partkey) <= 32)
      |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM fp_p a JOIN fp_p b
      |  ON a.p_size = b.p_size AND a.noun = b.noun AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 6""".stripMargin

  def qFuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    fuzzyPairs(spark, sfDir)
      .orderBy($"dist", $"key_a", $"key_b")
      .limit(20)
  }

  val fuzzyJoinSql: String =
    s"""SELECT * FROM ($fuzzyPairsSql)
       |ORDER BY dist, key_a, key_b LIMIT 20""".stripMargin

  /** Entity resolution end-to-end — the capstone the fuzzy join feeds:
    * near-identical records linked by the blocked edit-distance pairs are
    * resolved into canonical ENTITIES via transitive closure (the same
    * size-dispatched [[graft.ml.Dedup.connectedComponents]] the document
    * dedup pipeline uses), each reported with its min-key id, its
    * representative name, and its member count. Singleton records (no
    * fuzzy match) stay out — the output is exactly the duplicate-entity
    * worklist a master-data pipeline reviews.
    *
    * Scale shape: capped blocked pairs (never corpus-quadratic) →
    * components (driver union-find under the size threshold, label
    * propagation above) → one broadcast-sized join back to the part
    * dimension for the representative's name. Oracle: recursive CTE over
    * the identical pair relation.
    *
    * Clean-band adjudication (round 20 ABBA probe, anchor 0.37/0.28 s):
    * 2.72/2.60 s — repeats at its r17 reference-normalized level (~2.6);
    * the r20 full sweep's 3.95 s retried to 2.21 s (wobble). The level
    * is the bounded blocked-pair + union-find computation itself.
    * Structural; no revert. */
  def qEntityResolution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = fuzzyPairs(spark, sfDir).select($"key_a", $"key_b")
    val comp = graft.ml.Dedup.connectedComponents(pairs, "key_a", "key_b")
    comp.groupBy($"component".as("entity_id"))
      .agg(count(lit(1)).as("n_records"))
      .join(Tables.part(spark, sfDir).select($"p_partkey", $"p_name"),
        $"entity_id" === $"p_partkey")
      .select($"entity_id", $"p_name".as("rep_name"), $"n_records")
      .orderBy($"entity_id")
  }

  val entityResolutionSql: String =
    s"""WITH RECURSIVE
       |fp AS (SELECT key_a, key_b FROM ($fuzzyPairsSql)),
       |e AS (SELECT key_a AS u, key_b AS v FROM fp
       |      UNION SELECT key_b AS u, key_a AS v FROM fp),
       |n AS (SELECT DISTINCT u AS node FROM e),
       |r AS (
       |  SELECT node, node AS reach FROM n
       |  UNION
       |  SELECT e.u AS node, r.reach FROM e JOIN r ON r.node = e.v),
       |comp AS (SELECT node, min(reach) AS component FROM r GROUP BY node),
       |g AS (SELECT component AS entity_id, count(*) AS n_records
       |      FROM comp GROUP BY 1)
       |SELECT entity_id, p_name AS rep_name, n_records
       |FROM g JOIN part ON entity_id = p_partkey
       |ORDER BY entity_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> (qFuzzyJoin _),
    "q_entity_resolution" -> (qEntityResolution _),
    "q_ann_pq" -> (qAnnPq _),
    "q_ann_ivfpq" -> (qAnnIvfPq _),
    "q_ann_pq_recall" -> (qAnnPqRecall _),
    "q_shingle_cosine" -> (qShingleCosine _),
    "q_sequence_pack" -> (qSequencePack _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_contamination" -> (qContamination _),
    "q_decontam_ngram" -> (qDecontamNgram _),
    "q_ngram_coverage" -> (qNgramCoverage _),
    "q_simhash_neardup" -> (qSimhashNeardup _),
    "q_stratified_split" -> (qStratifiedSplit _),
    "q_source_mix" -> (qSourceMix _),
    "q_source_temperature" -> (qSourceTemperature _),
    "q_dup_rate_by_source" -> (qDupRateBySource _),
    "q_boilerplate_frac" -> (qBoilerplateFrac _),
    "q_curation_pipeline" -> (qCurationPipeline _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_shingle_jaccard" -> (qDedupShingleJaccard _),
    "q_shingle_containment" -> (qShingleContainment _),
    "q_lsh_quality" -> (qLshQuality _),
    "q_incremental_dedup" -> (qIncrementalDedup _),
    "q_knn_classify" -> (qKnnClassify _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_semantic_clusters" -> (qSemanticClusters _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_semdedup" -> (qSemdedup _),
    "q_semdedup_recall" -> (qSemdedupRecall _),
    "q_cosine_topk" -> (qCosineTopk _),
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_multimodal_join" -> (qMultimodalJoin _))

  val oracle: Map[String, String] = Map(
    "q_fuzzy_join" -> fuzzyJoinSql,
    "q_entity_resolution" -> entityResolutionSql,
    "q_shingle_cosine" -> shingleCosineSql,
    "q_sequence_pack" -> sequencePackSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_dedup_keep_best" -> dedupKeepBestSql,
    "q_contamination" -> contaminationSql,
    "q_decontam_ngram" -> decontamNgramSql,
    "q_ngram_coverage" -> ngramCoverageSql,
    "q_simhash_neardup" -> simhashNeardupSql,
    "q_stratified_split" -> stratifiedSplitSql,
    "q_source_mix" -> sourceMixSql,
    "q_source_temperature" -> sourceTemperatureSql,
    "q_dup_rate_by_source" -> dupRateBySourceSql,
    "q_boilerplate_frac" -> boilerplateFracSql,
    "q_curation_pipeline" -> curationPipelineSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_shingle_jaccard" -> dedupShingleJaccardSql,
    "q_shingle_containment" -> shingleContainmentSql,
    "q_lsh_quality" -> lshQualitySql,
    "q_incremental_dedup" -> incrementalDedupSql,
    "q_knn_classify" -> knnClassifySql,
    "q_ann_recall" -> annRecallSql,
    "q_semantic_clusters" -> semanticClustersSql,
    "q_dedup_minhash" -> dedupMinhashSql,
    "q_ann_ivf" -> annIvfSql,
    "q_ann_pq" -> annPqSql,
    "q_ann_ivfpq" -> annIvfPqSql,
    "q_ann_pq_recall" -> annPqRecallSql,
    "q_dedup_simhash" -> dedupSimhashSql,
    "q_embed_neardup" -> embedNeardupSql,
    "q_semdedup" -> semdedupSql,
    "q_semdedup_recall" -> semdedupRecallSql,
    "q_cosine_topk" -> cosineTopkSql,
    "q_hybrid_rrf" -> hybridRrfSql,
    "q_multimodal_join" -> multimodalJoinSql)
}
