package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Packed n-gram encoding (ref: NGramIndexer — SURVEY §2.A nlp table): a
  * trigram of dense word ids becomes ONE 64-bit key (21 bits per id, ids
  * shifted by +1 so 0 marks "absent"), so LM count tables shuffle and join
  * on an 8-byte long instead of two-or-three strings. Prefix extraction
  * (the backoff step n-gram → (n−1)-gram) is a single shift — no
  * re-tokenization. Ids come from the frequency-ordered dense vocabulary
  * (q_word_id_encode's zipWithIndex ranking), which keeps hot n-grams in
  * small id ranges. */
object NGramIndexer {

  val BitsPerId = 21
  val MaxId: Long = (1L << BitsPerId) - 2 // one value reserved for "absent"

  /** Pack up to 3 word-id columns (each in [0, MaxId]) into one long.
    * Order of significance: w1 highest — so sorting packed keys sorts by
    * (w1, w2, w3). An id outside [0, MaxId] raises at evaluation time:
    * silently overflowing the 21-bit slot would corrupt the NEIGHBORING
    * word's slot and produce wrong counts with no error, so a >2M-token
    * vocabulary must either pre-filter OOV ids or widen the encoding —
    * never pass them through. */
  def pack(ids: Column*): Column = {
    require(ids.nonEmpty && ids.size <= 3, "pack takes 1..3 id columns")
    val checked = ids.map(id =>
      when(id.between(0L, MaxId), id).otherwise(raise_error(concat(
        lit(s"NGramIndexer.pack: id out of range [0, $MaxId]: "),
        id.cast("string")))))
    val slots = checked.padTo(3, lit(-1L))
    slots.zipWithIndex.map { case (id, i) =>
      shiftleft(id + 1L, BitsPerId * (2 - i))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Extract slot `pos` (0-based; -1 when the slot is absent). */
  def unpack(packed: Column, pos: Int): Column = {
    require(pos >= 0 && pos < 3)
    shiftright(packed, BitsPerId * (2 - pos))
      .bitwiseAND((1L << BitsPerId) - 1) - 1L
  }

  /** Backoff prefix: drop the LAST word — trigram(w1,w2,w3) → bigram
    * (w1,w2) — by zeroing the lowest slot. */
  def prefix(packed: Column): Column =
    packed.bitwiseAND(~((1L << BitsPerId) - 1))

  /** Backoff suffix: drop the FIRST word — trigram(w1,w2,w3) → bigram
    * (w2,w3) — by shifting the lower slots up. */
  def suffix(packed: Column): Column =
    shiftleft(packed.bitwiseAND((1L << (2 * BitsPerId)) - 1), BitsPerId)
}
