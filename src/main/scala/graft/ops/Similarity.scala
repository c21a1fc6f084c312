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
  *  - near-dup: shingle inverted index (explode + self-join on shingle) is
  *    the *blocked* exact algorithm; its candidate set is bounded by shared
  *    shingles, never all-pairs. The MinHash/LSH variant (banded signatures)
  *    with the same output contract lives in `graft.ml.Dedup` for the
  *    trillion-row path (non-oracle: hash functions differ per engine).
  *  - cosine top-k: the probe set is broadcast (bounded), candidates stream —
  *    brute-force exact per probe. The IVF-partitioned variant that prunes
  *    candidates by coarse centroid also lives in `graft.ml`.
  */
object Similarity {

  private def dbl(c: Column): Column = transform(c, x => x.cast("double"))
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def l2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

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

  /** Near-duplicate pairs by 3-token-shingle Jaccard >= 0.8 — the exact,
    * inverted-index-blocked formulation: explode distinct shingles, self-join
    * on the shingle (candidates only), count intersections, Jaccard on
    * distinct-set sizes. */
  def qDedupShingleJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = filter(split($"text", " "), x => x =!= "")
    val shingles = when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
      .otherwise(array().cast("array<string>"))
    val sh = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(shingles).as("sh"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"), Seq("sh"))
      .where($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b")), "doc_b")
      .withColumn("jaccard",
        $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
      .where($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  val dedupShingleJaccardSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
      |  FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(CAST(n_inter AS DOUBLE) / (x.n_sh + y.n_sh - n_inter), 4) AS jaccard
      |FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      |WHERE CAST(n_inter AS DOUBLE) / (x.n_sh + y.n_sh - n_inter) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Embedding near-duplicate pairs: cosine >= 0.4 over all pairs — exact
    * baseline for the LSH-bucketed variant in graft.ml (all-pairs is the
    * oracle contract at test scale; production path blocks by LSH bucket). */
  def qEmbedNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", dbl($"embedding").as("v"))
      .withColumn("nrm", l2($"v"))
    val a = e.select($"vec_id".as("id_a"), $"v".as("va"), $"nrm".as("na"))
    val b = e.select($"vec_id".as("id_b"), $"v".as("vb"), $"nrm".as("nb"))
    a.join(b, $"id_a" < $"id_b")
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
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) /
      |        (a.nrm * b.nrm), 4) AS cos
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) /
      |      (a.nrm * b.nrm) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

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
        size(filter(split($"text", " "), x => x =!= "")).cast("long").as("n_tokens"),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_shingle_jaccard" -> (qDedupShingleJaccard _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_cosine_topk" -> (qCosineTopk _),
    "q_multimodal_join" -> (qMultimodalJoin _))

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_shingle_jaccard" -> dedupShingleJaccardSql,
    "q_embed_neardup" -> embedNeardupSql,
    "q_cosine_topk" -> cosineTopkSql,
    "q_multimodal_join" -> multimodalJoinSql)
}
