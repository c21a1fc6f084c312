package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NGramIndexer

/** Generalized Stupid-Backoff n-gram language model (Brants et al. 2007,
  * "Large Language Models in Machine Translation"; ref:
  * StupidBackoffEstimator/Model — SURVEY §2.A nlp table) over
  * [[NGramIndexer]]'s packed encodings:
  *
  *   S(w_n | w_1..w_{n-1}) = c(w_1..w_n) / c(w_1..w_{n-1})   if observed
  *                         = α · S(w_n | w_2..w_{n-1})        otherwise,
  *   bottoming out at S(w) = α^{n-1} · c(w) / N.
  *
  * The declared bigram/trigram queries unroll this cascade by hand over
  * string keys; this builder is the parameterized-n form. Every count
  * table of every order is keyed on ONE packed long in the shared n-slot
  * layout, so each backoff step — the k-gram's denominator prefix and its
  * (k−1)-gram context — is a shift/mask on the candidate's packed key, and
  * every join in the cascade is an 8-byte-key equi-join. At corpus scale
  * the count tables shuffle once each at build; scoring joins them onto
  * the (bounded) candidate frame — AQE broadcasts the small side at test
  * scale and grades to shuffle joins when the tables are corpus-sized.
  *
  * Id budget: the n-slot layout holds ids up to `maxIdFor(n)` (32766 for
  * n = 4); wider-model vocabularies must pre-filter to the budget (OOV
  * bucket) — [[NGramIndexer.packN]] raises on overflow rather than
  * corrupting a neighboring slot.
  */
object StupidBackoff {

  /** Backoff discount (the paper's α). */
  val Alpha = 0.4

  /** Left-associated α^p, so the oracle SQL can reproduce the exact IEEE
    * product as `0.4 * 0.4 * ...` (math.pow may differ in the last ulp). */
  def alphaMult(p: Int): Double = (1 to p).foldLeft(1.0)((a, _) => a * Alpha)

  /** Order-k count table over per-doc dense-id arrays (`idsCol`:
    * array<long>): one row per distinct k-gram, keyed on the packed key in
    * the `slots`-layout — (g: long, c: long). */
  def countTable(docIds: DataFrame, idsCol: String, k: Int, slots: Int): DataFrame = {
    val t = col(idsCol)
    val windows = when(size(t) >= k,
      transform(sequence(lit(1), size(t) - (k - 1)), i => slice(t, i, lit(k))))
      .otherwise(array().cast("array<array<bigint>>"))
    docIds.select(explode(windows).as("__w"))
      .select(NGramIndexer.packN(
        (1 to k).map(j => element_at(col("__w"), j)), slots).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
  }

  /** All order-1..n count tables in the n-slot layout, plus the total
    * token count (1-row frame, crossJoin-broadcast at score time). */
  def countTables(docIds: DataFrame, idsCol: String,
      n: Int): (Seq[DataFrame], DataFrame) = {
    val tables = (1 to n).map(k => countTable(docIds, idsCol, k, n))
    (tables, tables.head.agg(sum(col("c")).as("__total")))
  }

  /** Score each candidate's packed n-gram (`gCol`, n-slot layout) with the
    * recursive cascade; adds `out` plus `seen_k` flags (k = 2..n, where
    * seen_k = the order-k suffix gram was observed). Internal join columns
    * use the reserved `__` prefix. */
  def score(candidates: DataFrame, gCol: String, counts: Seq[DataFrame],
      total: DataFrame, out: String): DataFrame = {
    val n = counts.size
    require(n >= 2, "Stupid-Backoff needs order >= 2")
    val g = col(gCol)
    var acc = candidates
    for (k <- 2 to n) {
      val gk = NGramIndexer.lastN(g, n, k, n)
      val pk = NGramIndexer.prefixDropLast(gk, k, n)
      acc = acc
        .join(counts(k - 1).select(col("g").as(s"__g$k"), col("c").as(s"__c$k")),
          gk === col(s"__g$k"), "left")
        .join(counts(k - 2).select(col("g").as(s"__p$k"), col("c").as(s"__pc$k")),
          pk === col(s"__p$k"), "left")
    }
    acc = acc
      .join(counts.head.select(col("g").as("__g1"), col("c").as("__c1")),
        NGramIndexer.lastN(g, n, 1, n) === col("__g1"), "left")
      .crossJoin(broadcast(total))
    val base: Column = coalesce(col("__c1"), lit(0L)).cast("double") /
      col("__total") * lit(alphaMult(n - 1))
    val cascade = (2 to n).foldLeft(base) { (lower, k) =>
      when(col(s"__c$k").isNotNull && col(s"__pc$k").isNotNull,
        col(s"__c$k").cast("double") / col(s"__pc$k") * lit(alphaMult(n - k)))
        .otherwise(lower)
    }
    val flags = (2 to n).map(k => col(s"__c$k").isNotNull.as(s"seen_$k"))
    acc.withColumn(out, cascade)
      .select(candidates.columns.map(col).toSeq ++ (col(out) +: flags): _*)
  }
}
