package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scalar function surface: string / date / math / array / JSON expressions.
  *
  * The reference's scalar layer is its Transformer nodes (`Trim`,
  * `LowerCase`, per-element vector math — SURVEY.md §2.A nodes.nlp /
  * nodes.stats / nodes.util). Here every one of those is a built-in Catalyst
  * expression inside whole-stage codegen — no UDFs, so the parquet scan,
  * the projections, and the filters all stay in one generated loop.
  *
  * DuckDB-parity notes encoded below:
  *  - Spark `length`/`year`/`row_number` return INT, DuckDB BIGINT → cast.
  *  - Spark `regexp_replace` replaces all matches; DuckDB needs the 'g' flag.
  *  - DuckDB `log` is base-10; natural log is `ln` (Spark `log` = ln).
  *  - Spark `floor`/`ceil` on double return LONG; DuckDB return DOUBLE → cast.
  *  - Float arrays are cast element-wise to double before arithmetic on both
  *    sides (float32 → double is exact).
  */
object Scalar {

  /** String expression battery over part. */
  def qStringFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .select($"p_partkey",
        upper($"p_name").as("uname"),
        length($"p_name").cast("long").as("name_len"),
        substring($"p_name", 1, 5).as("name_pfx"),
        concat_ws("#", $"p_brand", $"p_type").as("brand_type"),
        $"p_name".like("%red%").as("is_red"),
        regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
        lpad($"p_brand", 10, "_").as("brand_pad"),
        regexp_replace($"p_type", "E", "3").as("leet_type"))
      .orderBy($"p_partkey")
  }

  val stringFuncsSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS uname,
      |  length(p_name) AS name_len,
      |  substring(p_name, 1, 5) AS name_pfx,
      |  concat_ws('#', p_brand, p_type) AS brand_type,
      |  p_name LIKE '%red%' AS is_red,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  lpad(p_brand, 10, '_') AS brand_pad,
      |  regexp_replace(p_type, 'E', '3', 'g') AS leet_type
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time functions: monthly revenue rollup via year/month extraction. */
  def qDateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy(
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(12,2)")).cast("double"), 4).as("revenue"))
      .orderBy($"y", $"m")
  }

  val dateFuncsSql: String =
    """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS revenue
      |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin

  /** Math expression battery over lineitem (per-row, deterministic: sqrt is
    * IEEE-correctly-rounded; ln/log10 differences are killed by round(4)). */
  def qMathFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        round(sqrt($"l_extendedprice"), 4).as("sqrt_price"),
        round(log($"l_extendedprice"), 4).as("ln_price"),
        round(log10($"l_extendedprice"), 4).as("log10_price"),
        round(abs($"l_discount" - 0.05), 4).as("abs_disc_ctr"),
        pow($"l_quantity", 2).cast("long").as("qty_sq"),
        floor($"l_extendedprice" / 100.0).cast("long").as("price_floor"),
        ceil($"l_extendedprice" / 100.0).cast("long").as("price_ceil"),
        (($"l_orderkey" % 7)).cast("long").as("key_mod7"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val mathFuncsSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  round(sqrt(l_extendedprice), 4) AS sqrt_price,
      |  round(ln(l_extendedprice), 4) AS ln_price,
      |  round(log10(l_extendedprice), 4) AS log10_price,
      |  round(abs(l_discount - 0.05), 4) AS abs_disc_ctr,
      |  CAST(pow(l_quantity, 2) AS BIGINT) AS qty_sq,
      |  CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_extendedprice / 100.0) AS BIGINT) AS price_ceil,
      |  l_orderkey % 7 AS key_mod7
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Array function battery over embeddings (higher-order functions on the
    * float32 vector column — keystone's per-element vector nodes, columnar).
    * All outputs are scalar columns (the slice is emitted as h1..h3) so any
    * downstream comparator can sort/hash the rows. */
  def qArrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dbl = transform($"embedding", x => x.cast("double"))
    Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        size($"embedding").cast("long").as("dim"),
        round(element_at($"embedding", 1).cast("double"), 4).as("first_val"),
        round(element_at($"embedding", -1).cast("double"), 4).as("last_val"),
        round(array_max($"embedding").cast("double"), 4).as("max_val"),
        round(array_min($"embedding").cast("double"), 4).as("min_val"),
        round(aggregate(dbl, lit(0.0), (a, x) => a + x), 4).as("sum_val"),
        round(element_at($"embedding", 1).cast("double"), 4).as("h1"),
        round(element_at($"embedding", 2).cast("double"), 4).as("h2"),
        round(element_at($"embedding", 3).cast("double"), 4).as("h3"))
      .orderBy($"vec_id")
  }

  val arrayFuncsSql: String =
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
      |  round(CAST(embedding[-1] AS DOUBLE), 4) + 0.0 AS last_val,
      |  round(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0 AS max_val,
      |  round(CAST(list_min(embedding) AS DOUBLE), 4) + 0.0 AS min_val,
      |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) + 0.0 AS sum_val,
      |  round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS h1,
      |  round(CAST(embedding[2] AS DOUBLE), 4) + 0.0 AS h2,
      |  round(CAST(embedding[3] AS DOUBLE), 4) + 0.0 AS h3
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Map function battery (ref: TermFrequency emits Map values): per-doc
    * token→count map built with map_from_entries, filtered with map_filter
    * (count >= 2), read back with map_keys/element_at via explode — emitted
    * as canonical (doc_id, token, cnt) rows, which is the engine-portable
    * serialization of a map (SURVEY §2.B flags raw maps as non-oracle). */
  def qMapFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = call_function("graft_tokens", $"text")
    val counted = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(toks).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(map_from_entries(collect_list(struct($"token", $"cnt"))).as("tf"))
    counted
      .select($"doc_id",
        explode(map_filter($"tf", (_, v) => v >= 2)).as(Seq("token", "cnt")))
      .orderBy($"doc_id", $"token")
  }

  val mapFuncsSql: String =
    """SELECT doc_id, token, count(*) AS cnt
      |FROM (SELECT doc_id,
      |        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |      FROM documents)
      |GROUP BY doc_id, token HAVING count(*) >= 2
      |ORDER BY doc_id, token""".stripMargin

  /** JSON extraction from events.props (the reference's JSON surface is its
    * Amazon-reviews loader — SURVEY.md §2.A loaders). */
  def qJsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        round(sum($"k").cast("double") / count(lit(1)), 4).as("avg_k"))
      .orderBy($"event_type")
  }

  val jsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  min(k) AS min_k, max(k) AS max_k,
      |  round(CAST(sum(k) AS DOUBLE) / count(*), 4) AS avg_k
      |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Blocked fuzzy string matching via edit distance: part names pair up
    * inside same-last-word blocks (an equi-join — the blocking key bounds
    * the candidate set exactly like the dedup family's LSH buckets), then
    * codegen'd `levenshtein` scores each candidate. The never-do-this
    * alternative — levenshtein across an unblocked cross join — is
    * quadratic in the table; this shape stays linear in block sizes at
    * any scale. */
  def qEditDistance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .where($"p_partkey" < 200)
      .select($"p_partkey", $"p_name",
        regexp_extract($"p_name", "([a-z]+)$", 1).as("noun"))
    p.as("a").join(p.as("b"),
        $"a.noun" === $"b.noun" && $"a.p_partkey" < $"b.p_partkey")
      .select($"a.p_partkey".as("key_a"), $"b.p_partkey".as("key_b"),
        $"a.p_name".as("name_a"), $"b.p_name".as("name_b"),
        levenshtein($"a.p_name", $"b.p_name").cast("long").as("edit_dist"))
      .where($"edit_dist".between(1, 4))
      .orderBy($"key_a", $"key_b")
  }

  val editDistanceSql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_name, regexp_extract(p_name, '([a-z]+)$', 1) AS noun
      |  FROM part WHERE p_partkey < 200)
      |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
      |FROM p a JOIN p b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 4
      |ORDER BY key_a, key_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_math_funcs" -> (qMathFuncs _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_edit_distance" -> (qEditDistance _),
    "q_json_extract" -> (qJsonExtract _))

  val oracle: Map[String, String] = Map(
    "q_string_funcs" -> stringFuncsSql,
    "q_date_funcs" -> dateFuncsSql,
    "q_math_funcs" -> mathFuncsSql,
    "q_array_funcs" -> arrayFuncsSql,
    "q_map_funcs" -> mapFuncsSql,
    "q_edit_distance" -> editDistanceSql,
    "q_json_extract" -> jsonExtractSql)
}
