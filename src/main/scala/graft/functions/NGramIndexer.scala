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

  // ------------------------------------------------ parameterized layouts
  // An n-slot layout divides the 63 usable bits of a long evenly: 21 bits
  // per id for trigrams, 15 for 4-grams, 12 for 5-grams. The id budget
  // shrinks with n (maxIdFor(4) = 32766), so wider models must pre-filter
  // their vocabulary to the budget (OOV bucket) — pack raises on overflow
  // rather than corrupting the neighboring slot.

  /** Bits per id slot in an n-slot layout. */
  def bitsFor(slots: Int): Int = {
    require(slots >= 1 && slots <= 6, "layouts support 1..6 slots per long")
    63 / slots
  }

  /** Largest packable id in an n-slot layout (one value reserved for
    * "absent"). */
  def maxIdFor(slots: Int): Long = (1L << bitsFor(slots)) - 2

  /** Pack up to `slots` word-id columns into one long in the `slots`-wide
    * layout; w1 most significant, trailing slots absent. Ids outside
    * [0, maxIdFor(slots)] raise at evaluation time. */
  def packN(ids: Seq[Column], slots: Int): Column = {
    require(ids.nonEmpty && ids.size <= slots,
      s"packN takes 1..$slots id columns for a $slots-slot layout")
    val bits = bitsFor(slots)
    val mx = maxIdFor(slots)
    val checked = ids.map(id =>
      when(id.between(0L, mx), id).otherwise(raise_error(concat(
        lit(s"NGramIndexer.packN($slots): id out of range [0, $mx]: "),
        id.cast("string")))))
    checked.padTo(slots, lit(-1L)).zipWithIndex.map { case (id, i) =>
      shiftleft(id + 1L, bits * (slots - 1 - i))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Extract slot `pos` (0-based; -1 when absent) from a `slots`-layout
    * packed value. */
  def unpackN(packed: Column, pos: Int, slots: Int): Column = {
    require(pos >= 0 && pos < slots)
    val bits = bitsFor(slots)
    shiftright(packed, bits * (slots - 1 - pos))
      .bitwiseAND((1L << bits) - 1) - 1L
  }

  /** Keep the LAST `k` words of a packed value holding `have` words,
    * re-anchored at slot 0 (the backoff-context step n-gram → suffix
    * (n−1)-gram, generalized). Pure shift/mask — no re-tokenization. */
  def lastN(packed: Column, have: Int, k: Int, slots: Int): Column = {
    require(k >= 1 && k <= have && have <= slots)
    if (k == have) packed
    else {
      val bits = bitsFor(slots)
      shiftleft(
        packed.bitwiseAND((1L << (bits * (slots - have + k))) - 1),
        bits * (have - k))
    }
  }

  /** Drop the LAST word of a packed value holding `have` words (the count
    * denominator step k-gram → (k−1)-gram prefix): zero slot have−1. */
  def prefixDropLast(packed: Column, have: Int, slots: Int): Column = {
    require(have >= 1 && have <= slots)
    val bits = bitsFor(slots)
    packed.bitwiseAND(~(((1L << bits) - 1) << (bits * (slots - have))))
  }

  /** Pack up to 3 word-id columns (each in [0, MaxId]) into one long.
    * Order of significance: w1 highest — so sorting packed keys sorts by
    * (w1, w2, w3). An id outside [0, MaxId] raises at evaluation time:
    * silently overflowing the 21-bit slot would corrupt the NEIGHBORING
    * word's slot and produce wrong counts with no error, so a >2M-token
    * vocabulary must either pre-filter OOV ids or widen the encoding —
    * never pass them through. */
  def pack(ids: Column*): Column = packN(ids, 3)

  /** Extract slot `pos` (0-based; -1 when the slot is absent). */
  def unpack(packed: Column, pos: Int): Column = unpackN(packed, pos, 3)

  /** Backoff prefix: drop the LAST word — trigram(w1,w2,w3) → bigram
    * (w1,w2) — by zeroing the lowest slot. */
  def prefix(packed: Column): Column = prefixDropLast(packed, 3, 3)

  /** Backoff suffix: drop the FIRST word — trigram(w1,w2,w3) → bigram
    * (w2,w3) — by shifting the lower slots up. */
  def suffix(packed: Column): Column = lastN(packed, 3, 2, 3)
}
