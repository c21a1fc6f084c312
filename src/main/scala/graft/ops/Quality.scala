package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Data-quality operators: column profiling, constraint validation, and
  * checksum-verified PII detection.
  *
  * This is the audit layer every large-scale ingest runs before (and after)
  * the curation pipeline: profile what arrived, assert the invariants the
  * downstream joins assume, and find high-precision sensitive spans. The
  * reference's analogue is its loader-side sanity checking (SURVEY.md §2.A
  * loaders validate record shape on read); here the checks are declarative
  * aggregation plans so Catalyst fuses them into scans.
  *
  * Scale notes (100 TB):
  *  - The profile is ONE pass over the table. Exact multi-column distinct
  *    counts expand the aggregation buffer (Spark plans one Expand ×
  *    #distinct-columns); at petabyte scale swap `countDistinct` for
  *    `approx_count_distinct` (same plan shape, no Expand) — the gate uses
  *    exact so DuckDB can verify values.
  *  - Constraint checks are conditional aggregates fused into one scan per
  *    table + one broadcast-able anti-join for referential integrity.
  *  - Luhn validation is a fixed 16-term expression — pure codegen'd
  *    per-row arithmetic, no shuffle touches the candidate strings.
  */
object Quality {

  // ------------------------------------------------------ inline metrics

  /** Attach FREE inline metrics to a frame via `Dataset.observe` — the
    * production spelling of "profile the data you're already writing":
    * the metrics piggyback on whatever action consumes the frame (the
    * 100 TB sink write), so row counts, null counts and sums cost ZERO
    * extra scans, unlike running [[qColumnProfile]] after the fact.
    * Returns the instrumented frame plus the [[Observation]] handle to
    * read once the action completes. Numeric columns contribute a
    * null count and an exact DECIMAL(38,2) sum (summation-order-safe);
    * every column contributes a null count. */
  def observedMetrics(df: DataFrame, numericCols: Seq[String],
      otherCols: Seq[String] = Nil): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val metrics =
      count(lit(1)).as("n_rows") +:
      (numericCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        sum(col(c).cast("decimal(38,2)")).as(s"${c}_sum"))) ++
       otherCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  // ---------------------------------------------------------------- profile

  /** Per-column profile of `orders` — rows, nulls, distincts, min/max —
    * as two hash-aggregate branches over the same canonicalized scan:
    *  (1) null counts + min/max fold into ONE 1-row aggregate (then
    *      `stack` unpivots to one row per column);
    *  (2) exact distinct counts go value-level — `stack` each row into
    *      (col_name, value) pairs, hash-distinct the pairs, count per
    *      column. This deliberately AVOIDS multi-column `countDistinct`
    *      in one aggregate: Catalyst plans that as an Expand × #columns
    *      feeding SortAggregate chains (two full sorts of the expanded
    *      rows — measured 3× slower here), while the pair spelling is
    *      pure HashAggregate and shards the distinct work across the
    *      cluster by (column, value). At PB scale swap branch 2 for
    *      `approx_count_distinct` inside branch 1 — same output shape,
    *      no second scan.
    * Values are canonicalized per type before min/max so both engines
    * compare identical representations: bigints as-is, doubles to
    * floor-cents, timestamps to epoch seconds, strings lexically; the
    * result columns are strings so heterogeneous columns share a schema. */
  def qColumnProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val canon = Tables.orders(spark, sfDir).select(
      $"o_orderkey", $"o_custkey", $"o_orderstatus",
      floor($"o_totalprice" * 100).cast("long").as("price_c"),
      unix_timestamp($"o_orderdate").as("date_s"),
      $"o_orderpriority")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "price_c",
      "date_s", "o_orderpriority")
    val aggs = count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        count(col(c)).as(s"nn$i"),
        min(col(c)).cast("string").as(s"mn$i"),
        max(col(c)).cast("string").as(s"mx$i"))
    }
    val wide = canon.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', n_rows, n_rows - nn$i, mn$i, mx$i"
    }.mkString(", ")
    val base = wide.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(col_name, n_rows, n_null, min_v, max_v)")
    val pairArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    val nd = canon
      .selectExpr(s"stack(${cols.size}, $pairArgs) AS (col_name, v)")
      .where($"v".isNotNull)
      .distinct()
      .groupBy($"col_name").agg(count(lit(1)).as("n_distinct"))
    base.join(nd, Seq("col_name"), "left")
      .select($"col_name", $"n_rows", $"n_null",
        coalesce($"n_distinct", lit(0L)).as("n_distinct"), $"min_v", $"max_v")
      .orderBy($"col_name")
  }

  val columnProfileSql: String =
    """WITH c AS (SELECT
      |  o_orderkey, o_custkey, o_orderstatus,
      |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS date_s,
      |  o_orderpriority
      |FROM orders)
      |SELECT * FROM (
      |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
      |    count(*) - count(o_orderkey) AS n_null,
      |    count(DISTINCT o_orderkey) AS n_distinct,
      |    CAST(min(o_orderkey) AS VARCHAR) AS min_v,
      |    CAST(max(o_orderkey) AS VARCHAR) AS max_v FROM c
      |  UNION ALL
      |  SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
      |    count(DISTINCT o_custkey),
      |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM c
      |  UNION ALL
      |  SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
      |    count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus) FROM c
      |  UNION ALL
      |  SELECT 'price_c', count(*), count(*) - count(price_c),
      |    count(DISTINCT price_c),
      |    CAST(min(price_c) AS VARCHAR), CAST(max(price_c) AS VARCHAR) FROM c
      |  UNION ALL
      |  SELECT 'date_s', count(*), count(*) - count(date_s),
      |    count(DISTINCT date_s),
      |    CAST(min(date_s) AS VARCHAR), CAST(max(date_s) AS VARCHAR) FROM c
      |  UNION ALL
      |  SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
      |    count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority) FROM c)
      |ORDER BY col_name""".stripMargin

  // ------------------------------------------------------------ constraints

  /** Declarative constraint validation (the Deequ/dbt-test capability
    * class): primary-key uniqueness, referential integrity, domain and
    * range invariants, and two freshness checks designed to FIRE on this
    * corpus (pending orders exist; orders newer than 2000-12-31 exist) so
    * the gate proves the counters count. Plan: one conditional-aggregate
    * scan of orders, one of lineitem, one anti-join for the FK — the two
    * 1-row side relations attach via broadcast-able cross joins. */
  def qDataConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cnt = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    val ord = Tables.orders(spark, sfDir).agg(
      (count(lit(1)) - countDistinct($"o_orderkey")).as("pk_dup"),
      cnt(!$"o_orderstatus".isin("O", "F", "P")).as("bad_status"),
      cnt($"o_totalprice" <= 0).as("bad_price"),
      cnt($"o_orderdate" < to_timestamp(lit("1990-01-01")) ||
        $"o_orderdate" > to_timestamp(lit("2005-01-01"))).as("bad_date"),
      cnt($"o_orderstatus" === "P").as("pending"),
      cnt($"o_orderdate" > to_timestamp(lit("2000-12-31"))).as("recent"))
    val li = Tables.lineitem(spark, sfDir).agg(
      cnt($"l_discount" < 0 || $"l_discount" > 0.1).as("bad_disc"))
    val fk = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("fk_orphans"))
    ord.crossJoin(li).crossJoin(fk)
      .selectExpr("""stack(8,
        'pk_unique_orderkey', pk_dup,
        'fk_orders_customer', fk_orphans,
        'domain_orderstatus', bad_status,
        'range_totalprice_pos', bad_price,
        'range_date_bounds', bad_date,
        'range_discount_01', bad_disc,
        'freshness_pending', pending,
        'freshness_recent', recent) AS (check_name, violations)""")
      .orderBy($"check_name")
  }

  val dataConstraintsSql: String =
    """SELECT check_name, violations FROM (
      |  SELECT 'pk_unique_orderkey' AS check_name,
      |    count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
      |  UNION ALL
      |  SELECT 'fk_orders_customer', count(*) FROM orders o
      |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'domain_orderstatus',
      |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'range_totalprice_pos',
      |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'range_date_bounds',
      |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
      |             OR o_orderdate > TIMESTAMP '2005-01-01' THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'range_discount_01',
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'freshness_pending',
      |    CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'freshness_recent',
      |    CAST(sum(CASE WHEN o_orderdate > TIMESTAMP '2000-12-31' THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
      |ORDER BY check_name""".stripMargin

  // -------------------------------------------------------------- Luhn PII

  /** Positions (1-based, left-to-right) of a 16-digit string that the Luhn
    * algorithm doubles: every second digit from the right starting at the
    * second — i.e. odd left-indices of a 16-char string. */
  private val LuhnDoubled: Set[Int] = (1 to 16).filter(i => (17 - i) % 2 == 0).toSet

  /** SQL expression (valid in BOTH Spark and DuckDB) for the Luhn checksum
    * of a 16-digit string column `c`: Σ f(dᵢ) with f doubling the flagged
    * positions and casting back from the >9 overflow. */
  def luhnSumSql(c: String): String =
    (1 to 16).map { i =>
      val d = s"CAST(substring($c, $i, 1) AS INT)"
      if (LuhnDoubled(i)) s"(CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 ELSE $d * 2 END)"
      else d
    }.mkString("(", " + ", ")")

  /** Checksum-verified credit-card detection: candidates that merely LOOK
    * like a 16-digit PAN are accepted only when the Luhn check digit
    * verifies — the precision gate every PII scrubber needs before
    * redacting digit runs ([[graft.ml.Scrub]] holds the regex layer; this
    * is its arithmetic layer). The corpus is digit-free, so candidates are
    * formula-generated from order keys exactly like the image queries
    * generate pixels: even keys get a correct check digit, odd keys a
    * corrupted one — the gate proves the validator splits them exactly. */
  def qPiiLuhn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payloadSql =
      "lpad(CAST((o_orderkey * 2654435761) % 1000000000000000 AS STRING), 15, '0')"
    // checksum of payload shifted one position left (digit i of the payload
    // is digit i of the full PAN): doubled positions are the same odd
    // left-indices, so reuse the 16-digit rule on payload || '0'.
    val baseSum = luhnSumSql(s"concat($payloadSql, '0')")
    val checkDigit = s"(10 - $baseSum % 10) % 10"
    val wrongDigit = s"($checkDigit + 5) % 10"
    Tables.orders(spark, sfDir)
      .where($"o_orderkey" <= 500)
      .selectExpr("o_orderkey",
        s"concat($payloadSql, CAST(CASE WHEN o_orderkey % 2 = 0 THEN $checkDigit ELSE $wrongDigit END AS STRING)) AS candidate")
      .selectExpr("o_orderkey", "candidate",
        s"${luhnSumSql("candidate")} % 10 = 0 AS luhn_ok")
      .orderBy($"o_orderkey")
  }

  val piiLuhnSql: String = {
    val payloadSql =
      "lpad(CAST((o_orderkey * 2654435761) % 1000000000000000 AS VARCHAR), 15, '0')"
    val baseSum = luhnSumSql(s"concat($payloadSql, '0')")
    val checkDigit = s"(10 - $baseSum % 10) % 10"
    val wrongDigit = s"($checkDigit + 5) % 10"
    s"""WITH cand AS (
       |  SELECT o_orderkey,
       |    concat($payloadSql, CAST(CASE WHEN o_orderkey % 2 = 0 THEN $checkDigit ELSE $wrongDigit END AS VARCHAR)) AS candidate
       |  FROM orders WHERE o_orderkey <= 500)
       |SELECT o_orderkey, candidate,
       |  ${luhnSumSql("candidate")} % 10 = 0 AS luhn_ok
       |FROM cand ORDER BY o_orderkey""".stripMargin
  }

  // --------------------------------------------------------- k-anonymity

  /** K-anonymity audit over quasi-identifiers — the re-identification-risk
    * report a privacy review runs before a dataset release (Sweeney 2002;
    * ref capability: ABSENT — loaders never audit privacy; north-star for
    * a curation engine shipping derived corpora). Quasi-identifier tuple:
    * (c_nationkey, c_mktsegment, account-balance band of width 1000).
    * An equivalence class of size < k means its members are distinguishable
    * down to fewer than k candidates; the report lists every risky class
    * with its size so the release pipeline can suppress or generalize it.
    *
    * Scale shape: ONE hash aggregate over the quasi-id tuple (map-side
    * partial counts make the shuffle |classes|-bounded, not |rows|), then
    * a HAVING on the class size — output is bounded by the risky-class
    * count, never the table. Generalizing a column (widening the band)
    * to raise k is a re-run of the same one-shuffle plan. The band uses
    * an explicit floor-divide on cents so negative balances band exactly
    * the same way in both engines. */
  def qKAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 5
    Tables.customer(spark, sfDir)
      .select($"c_nationkey".cast("long").as("nation"), $"c_mktsegment",
        floor(floor($"c_acctbal" * 100).cast("long") / 100000L).as("bal_band"))
      .groupBy($"nation", $"c_mktsegment", $"bal_band")
      .agg(count(lit(1)).as("class_size"))
      .where($"class_size" < k)
      .orderBy($"nation", $"c_mktsegment", $"bal_band")
  }

  val kAnonymitySql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment,
      |  CAST(floor(floor(c_acctbal * 100) / 100000) AS BIGINT) AS bal_band,
      |  CAST(count(*) AS BIGINT) AS class_size
      |FROM customer
      |GROUP BY 1, 2, 3 HAVING count(*) < 5
      |ORDER BY nation, c_mktsegment, bal_band""".stripMargin

  // --------------------------------------------------------- l-diversity

  /** L-diversity audit — the attribute-disclosure companion to
    * [[qKAnonymity]] (Machanavajjhala 2006): a quasi-identifier class can
    * be k-anonymous yet still leak if everyone in it shares the same
    * SENSITIVE value. Quasi-identifiers here are (nation, balance band);
    * the sensitive attribute is the market segment. Classes with fewer
    * than l = 3 distinct segments are reported with their size and
    * diversity so the release pipeline can generalize or suppress them.
    *
    * Scale shape: ONE hash aggregate over the quasi-id tuple with a
    * count-distinct on the sensitive column (Spark rewrites it as a
    * two-phase expand-aggregate; the shuffle stays |classes|·|segments|-
    * bounded), then a HAVING on the diversity — identical to the
    * k-anonymity plan, so the two audits can share a scan at 100 TB. */
  def qLDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = 3
    Tables.customer(spark, sfDir)
      .select($"c_nationkey".cast("long").as("nation"),
        floor(floor($"c_acctbal" * 100).cast("long") / 100000L).as("bal_band"),
        $"c_mktsegment")
      .groupBy($"nation", $"bal_band")
      .agg(count(lit(1)).as("class_size"),
        countDistinct($"c_mktsegment").as("diversity"))
      .where($"diversity" < l)
      .orderBy($"nation", $"bal_band")
  }

  val lDiversitySql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |  CAST(floor(floor(c_acctbal * 100) / 100000) AS BIGINT) AS bal_band,
      |  CAST(count(*) AS BIGINT) AS class_size,
      |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS diversity
      |FROM customer
      |GROUP BY 1, 2 HAVING count(DISTINCT c_mktsegment) < 3
      |ORDER BY nation, bal_band""".stripMargin

  // --------------------------------------------------------- t-closeness

  /** Reporting threshold for [[qTCloseness]] in ppm (t = 0.25). */
  val TClosenessPpm = 250000L

  /** T-closeness audit — the DISTRIBUTION-disclosure member of the
    * privacy trio (Li et al., ICDE 2007): a class can be k-anonymous AND
    * l-diverse yet still leak if its sensitive-value MIX differs sharply
    * from the table's (e.g. a class that is 90% one segment against a
    * 20% base rate). For a categorical sensitive attribute the distance
    * is the variational distance ½·Σ_s |p_class(s) − p_global(s)|;
    * classes with distance > t are reported.
    *
    * Exactness: the distance is computed on the INTEGER cross-multiplied
    * numerator Σ_s |c_cs·N − g_s·n_c| (absent segments contribute their
    * full g_s·n_c via the grid join — forgetting them understates the
    * distance), scaled to ppm with one integer division. Every product,
    * the segment sum, and the ×5·10⁵ ppm scaling run WIDENED —
    * DECIMAL(38,0) here, HUGEINT in the oracle — because the chained
    * bound is num·5·10⁵ ≤ 10⁶·class_size·n_tot, which wraps a BIGINT
    * already at class_size·n_tot ≈ 9·10¹² (a 10⁵-row class in a 10⁹-row
    * table), far below the naive single-term estimate; widened, the
    * report is exact to ~10³⁸ and both engines floor identically.
    * Scale shape: two hash aggregates (per-(class, segment) and
    * per-class) plus TWO broadcast dimensions (segment totals, the 1-row
    * N); the grid join is |classes| × |segments|-bounded — fact rows
    * touch only the first aggregate. */
  def qTCloseness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.customer(spark, sfDir)
      .select($"c_nationkey".cast("long").as("nation"),
        floor(floor($"c_acctbal" * 100).cast("long") / 100000L).as("bal_band"),
        $"c_mktsegment")
    // the (class × segment) count grid supplies cls/seg/tot as exact
    // integer re-sums — ReuseAudit measured the old four-reference
    // spelling at FOUR runtime fact scans (AQE reuse never fired);
    // materializing the bounded grid pins the query at ONE fact pass
    val cs = base.groupBy($"nation", $"bal_band", $"c_mktsegment")
      .agg(count(lit(1)).as("c_cs"))
      .localCheckpoint(true)
    val cls = cs.groupBy($"nation", $"bal_band")
      .agg(sum($"c_cs").as("class_size"))
    val seg = cs.groupBy($"c_mktsegment").agg(sum($"c_cs").as("g_s"))
    // coalesce: empty corpus reads as 0 (count semantics), not NULL
    val tot = cs.agg(coalesce(sum($"c_cs"), lit(0L)).as("n_tot"))
    cls.crossJoin(broadcast(seg))
      .join(cs, Seq("nation", "bal_band", "c_mktsegment"), "left")
      .crossJoin(broadcast(tot))
      .groupBy($"nation", $"bal_band")
      .agg(min($"class_size").as("class_size"),
        sum(abs(coalesce($"c_cs", lit(0L)).cast("decimal(38,0)") * $"n_tot" -
          $"g_s".cast("decimal(38,0)") * $"class_size")).as("num"),
        min($"n_tot").as("n_tot"))
      .select($"nation", $"bal_band", $"class_size",
        expr("CAST(num * 500000 AS DECIMAL(38,0)) " +
          "DIV (CAST(class_size AS DECIMAL(38,0)) * n_tot)").as("dist_ppm"))
      .where($"dist_ppm" > TClosenessPpm)
      .orderBy($"nation", $"bal_band")
  }

  val tClosenessSql: String =
    s"""WITH base AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    CAST(floor(floor(c_acctbal * 100) / 100000) AS BIGINT) AS bal_band,
      |    c_mktsegment
      |  FROM customer),
      |cs AS (
      |  SELECT nation, bal_band, c_mktsegment, count(*) AS c_cs
      |  FROM base GROUP BY 1, 2, 3),
      |cls AS (
      |  SELECT nation, bal_band, count(*) AS class_size FROM base GROUP BY 1, 2),
      |seg AS (SELECT c_mktsegment, count(*) AS g_s FROM base GROUP BY 1),
      |tot AS (SELECT count(*) AS n_tot FROM base),
      |d AS (
      |  SELECT cls.nation, cls.bal_band, cls.class_size, tot.n_tot,
      |    sum(abs(CAST(COALESCE(cs.c_cs, 0) AS HUGEINT) * tot.n_tot
      |            - CAST(seg.g_s AS HUGEINT) * cls.class_size)) AS num
      |  FROM cls CROSS JOIN seg
      |  LEFT JOIN cs ON cs.nation = cls.nation AND cs.bal_band = cls.bal_band
      |              AND cs.c_mktsegment = seg.c_mktsegment
      |  CROSS JOIN tot
      |  GROUP BY 1, 2, 3, 4)
      |SELECT nation, bal_band, CAST(class_size AS BIGINT) AS class_size,
      |  CAST(num * 500000 // (CAST(class_size AS HUGEINT) * n_tot) AS BIGINT) AS dist_ppm
      |FROM d
      |WHERE num * 500000 // (CAST(class_size AS HUGEINT) * n_tot) > $TClosenessPpm
      |ORDER BY nation, bal_band""".stripMargin

  // ------------------------------------------------------------- registry

  /** Regexes shared by the redaction query and its oracle: the common
    * Java-regex / RE2 subset (character classes, bounded repeats — no
    * lookaround, no \b), so both engines match identically. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** doc_id-keyed PII injection, shared VERBATIM by [[qPiiRedact]] and
    * the leak-scan unit test so the test corpus can never de-sync from
    * the shipped query's. */
  private[graft] val PiiInjectExpr: String =
    """concat('contact user', doc_id, '@mail', doc_id % 10, '.com ',
      |  CASE WHEN doc_id % 2 = 0
      |       THEN concat('cc admin', doc_id, '@corp.org ') ELSE '' END,
      |  'or 555-', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-',
      |  lpad(CAST((doc_id * 7) % 10000 AS STRING), 4, '0'), ' re ',
      |  substr(text, 1, 80)) AS t""".stripMargin

  /** The masking transform itself — also shared with the leak-scan test
    * (the test's PROBES stay independent of these regexes). */
  private[graft] def redact(t: Column): Column =
    regexp_replace(regexp_replace(t, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")

  /** PII REDACTION — the transform half of the scrubber ([[qPiiLuhn]] is
    * the detection half): emails → `[EMAIL]`, dashed phone numbers →
    * `[PHONE]`, with per-doc match counts and the md5 of the redacted
    * text under the gate (so a single swallowed character anywhere in
    * the masking fails the hash). The PII is INJECTED deterministically
    * from doc_id on both engines (the documents fixture is pure ASCII
    * with no @/digits — the q_html_extract formula-wrapping precedent):
    * every doc gets one email and one phone, even ids a second email,
    * exercising multi-match global replacement. Stateless per-row
    * expression work; corpus size only enters the scan. */
  def qPiiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", PiiInjectExpr)
      .select($"doc_id",
        regexp_count($"t", lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count($"t", lit(PhoneRe)).cast("long").as("n_phones"),
        redact($"t").as("r"))
      .select($"doc_id", $"n_emails", $"n_phones",
        length($"r").cast("long").as("red_len"), md5($"r").as("red_md5"))
      .orderBy($"doc_id")
  }

  val piiRedactSql: String = {
    // DuckDB standard string literals pass backslashes through verbatim,
    // so the runtime regex strings interpolate directly
    val email = EmailRe
    val phone = PhoneRe
    s"""WITH base AS (
       |  SELECT doc_id,
       |    concat('contact user', doc_id, '@mail', doc_id % 10, '.com ',
       |      CASE WHEN doc_id % 2 = 0
       |           THEN concat('cc admin', doc_id, '@corp.org ') ELSE '' END,
       |      'or 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-',
       |      lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0'), ' re ',
       |      substr(text, 1, 80)) AS t
       |  FROM documents),
       |red AS (
       |  SELECT doc_id, t,
       |    regexp_replace(regexp_replace(t, '$email', '[EMAIL]', 'g'),
       |      '$phone', '[PHONE]', 'g') AS r
       |  FROM base)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
       |  CAST(length(r) AS BIGINT) AS red_len, md5(r) AS red_md5
       |FROM red ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pii_redact" -> (qPiiRedact _),
    "q_column_profile" -> (qColumnProfile _),
    "q_data_constraints" -> (qDataConstraints _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_l_diversity" -> (qLDiversity _),
    "q_t_closeness" -> (qTCloseness _),
    "q_pii_luhn" -> (qPiiLuhn _))

  val oracle: Map[String, String] = Map(
    "q_pii_redact" -> piiRedactSql,
    "q_column_profile" -> columnProfileSql,
    "q_data_constraints" -> dataConstraintsSql,
    "q_k_anonymity" -> kAnonymitySql,
    "q_l_diversity" -> lDiversitySql,
    "q_t_closeness" -> tClosenessSql,
    "q_pii_luhn" -> piiLuhnSql)
}
