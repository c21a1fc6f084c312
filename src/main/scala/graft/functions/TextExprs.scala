package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text/blocking kernels for the dedup pipeline (same "custom
  * Expression beats interpreted HOF" rung as [[VectorExprs]]).
  *
  * The shingle query's hot path used to be a chain of higher-order
  * functions — `filter(split(text))` + `transform(sequence, concat_ws)` for
  * shingling, and either a lambda-per-pair `transform` or a posexplode
  * self-join for candidate-pair generation. HOF lambdas evaluate
  * interpreted (per-element binding, no codegen), which at sf0.1 cost more
  * than every shuffle in the query combined. These expressions do the same
  * work as ONE compiled static call per row; codegen emits a plain static
  * invoke, so the surrounding stage stays inside whole-stage codegen.
  *
  * Both are registered in [[GraftExtensions]] (`graft_shingles`,
  * `graft_pairs`) and invoked via `functions.call_function`.
  */
object TextKernels {

  /** Byte-range single-space tokenizer: fills starts/lens over the raw
    * UTF-8 bytes and returns the token count. 0x20 is never a
    * continuation byte in UTF-8, so byte-level splitting is EXACTLY the
    * char-level split — and the token bytes are EXACTLY the bytes
    * `UTF8String.fromString(javaToken)` would re-encode, so hashing or
    * wrapping the ranges is bit-identical to the old decode→substring→
    * re-encode path, minus all of its per-token allocation. */
  private def tokenRanges(bytes: Array[Byte], starts: Array[Int],
      lens: Array[Int]): Int = {
    val n = bytes.length
    var t = 0
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == 0x20) i += 1
      val s = i
      while (i < n && bytes(i) != 0x20) i += 1
      if (i > s) { starts(t) = s; lens(t) = i - s; t += 1 }
    }
    t
  }

  /** Whitespace tokens of `text` — exactly
    * `filter(split(text, " "), _ =!= "")`, as ONE compiled call. Exists
    * because the filter HOF evaluates interpreted (per-element lambda
    * binding) AND, being CodegenFallback, kicks its whole Project out of
    * whole-stage codegen — every expression sharing the projection pays.
    * Tokens are zero-copy byte-range views over one shared byte array
    * (at most one copy of the whole text, no per-token decode/encode). */
  def tokens(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length / 2 + 1)
    val lens = new Array[Int](bytes.length / 2 + 1)
    val t = tokenRanges(bytes, starts, lens)
    val out = new Array[Any](t)
    var j = 0
    while (j < t) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), lens(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Whitespace n-gram shingles of `text`: split on single spaces, drop
    * empty tokens (exactly `filter(split(text, " "), _ =!= "")`), then join
    * each run of `n` consecutive tokens with one space. Returns an empty
    * array when the doc has fewer than `n` tokens. One byte copy per
    * shingle (the space-joined bytes) — no String round trip. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length / 2 + 1)
    val lens = new Array[Int](bytes.length / 2 + 1)
    val t = tokenRanges(bytes, starts, lens)
    if (t < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](t - n + 1)
    var j = 0
    while (j <= t - n) {
      var len = n - 1
      var k = 0
      while (k < n) { len += lens(j + k); k += 1 }
      val sh = new Array[Byte](len)
      var pos = 0
      k = 0
      while (k < n) {
        if (k > 0) { sh(pos) = 0x20; pos += 1 }
        System.arraycopy(bytes, starts(j + k), sh, pos, lens(j + k))
        pos += lens(j + k)
        k += 1
      }
      out(j) = UTF8String.fromBytes(sh)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Canonical BPE application of `rules` (priority-ordered (a, b) merge
    * pairs) to one word: symbols start as the word's characters plus a
    * final `</w>` marker; each rule merges, leftmost-first, every
    * adjacent (a, b) occurrence to `ab` before the next rule runs. One
    * in-place scan per rule reaches the per-rule fixpoint: merging at
    * position i can never create a NEW (a, b) adjacency at i-1 or i
    * (that would need b == ab or a == ab, impossible for non-empty
    * sides), so the scan never has to back up. Returns the subword
    * symbols without the `</w>` marker. */
  def bpe(word: UTF8String, rules: Array[Array[String]]): ArrayData = {
    val w = word.toString
    val syms = new java.util.ArrayList[String](w.length + 1)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    syms.add("</w>")
    var r = 0
    while (r < rules.length) {
      val a = rules(r)(0); val b = rules(r)(1)
      var j = 0
      while (j < syms.size - 1) {
        if (syms.get(j) == a && syms.get(j + 1) == b) {
          syms.set(j, a + b); syms.remove(j + 1)
        } else j += 1
      }
      r += 1
    }
    // drop bare `</w>` markers (a rule MAY legitimately merge the marker
    // into a subword like "s</w>" — those survive)
    val out = new java.util.ArrayList[Any](syms.size)
    var k = 0
    while (k < syms.size) {
      if (syms.get(k) != "</w>") out.add(UTF8String.fromString(syms.get(k)))
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Parse a `;`-separated "a b;th e;…" merge-rule literal. An empty
    * string is the valid zero-rule table (a trainer's starting state). */
  def parseBpeRules(rules: UTF8String): Array[Array[String]] =
    rules.toString.split(";").filter(_.contains(" ")).map(_.split(" ", 2))

  /** All ordered pairs (x, y) with x before y in `arr` (callers pass a
    * sorted distinct array, so x < y), as structs — plus, when
    * `withSingles`, one (x, -1) marker struct per element so one explode
    * feeds both the pair-count and the set-size aggregations. -1 is safe:
    * doc ids are non-negative by contract. */
  def pairs(arr: ArrayData, withSingles: Boolean): ArrayData = {
    val n = arr.numElements()
    val nPairs = n * (n - 1) / 2
    val out = new Array[Any](if (withSingles) nPairs + n else nPairs)
    var w = 0
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(w) = InternalRow(x, arr.getLong(j))
        w += 1; j += 1
      }
      i += 1
    }
    if (withSingles) {
      var k = 0
      while (k < n) {
        out(w) = InternalRow(arr.getLong(k), -1L)
        w += 1; k += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Unicode NFC canonical composition (see [[NfcNormalize]]). Fast path:
    * pure-ASCII bytes are already NFC — skip the Normalizer round trip
    * (and its String allocation) for the overwhelmingly common case. */
  def nfc(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1L
    }
    if (ascii) text
    else {
      val s = text.toString
      val out = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      if (out == s) text else UTF8String.fromString(out)
    }
  }

  /** 64-bit SimHash of a text's whitespace tokens (see [[Simhash64]]):
    * per-bit majority vote of xxhash64(token), every OCCURRENCE votes
    * (not distinct tokens) — bit-identical to the 64-aggregate HOF
    * spelling it replaced ([[graft.ml.Dedup.simhash]]'s old body), in
    * one compiled ZERO-ALLOCATION pass (token hashes come straight off
    * the text's byte ranges) instead of 64 interpreted array
    * traversals. */
  def simhash64(text: UTF8String): Long = {
    val n = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      while (i < n && text.getByte(i) == 0x20) i += 1
      val s = i
      while (i < n && text.getByte(i) != 0x20) i += 1
      if (i > s) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + s, i - s, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Distinct xxhash64 hashes of a text's w-token shingles in
    * first-occurrence order (see [[ShingleXxHashes]]) — bit-identical to
    * `array_distinct(transform(sequence(...), i => xxhash64(concat_ws(
    * " ", tokens...))))` with the `when(size >= w, ..., empty)` guard.
    * Shingle bytes assemble into ONE reused buffer (tokens can be
    * separated by runs of spaces, so the joined bytes are not generally
    * contiguous in the source) and hash from there — no String round
    * trip, no per-shingle buffer. */
  def shingleXxHashes(text: UTF8String, w: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length / 2 + 1)
    val lens = new Array[Int](bytes.length / 2 + 1)
    val t = tokenRanges(bytes, starts, lens)
    if (t < w) return new GenericArrayData(Array.empty[Any])
    val buf = new Array[Byte](bytes.length)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= t - w) {
      var pos = 0
      var k = 0
      while (k < w) {
        if (k > 0) { buf(pos) = 0x20; pos += 1 }
        System.arraycopy(bytes, starts(j + k), buf, pos, lens(j + k))
        pos += lens(j + k)
        k += 1
      }
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          pos, 42L))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature of a hashed-shingle array (see [[MinhashSig]]):
    * per seeded permutation j, min over hashes of
    * pmod((h % p)·a_j + b_j, p) with p = 2^31−1, a_j = j·2654435761 mod
    * p + 1, b_j = j·40503 + 1 — the exact integer algebra of the HOF
    * spelling ([[graft.ml.Dedup.minhashSignature]]), including the
    * empty-input contract (array_min of empty = null per slot). */
  def minhashSig(hashes: ArrayData, numHashes: Int): ArrayData = {
    val p = 2147483647L
    val n = hashes.numElements()
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      if (n == 0) out(j) = null
      else {
        val a = j * 2654435761L % p + 1L
        val b = j * 40503L + 1L
        var mn = Long.MaxValue
        var i = 0
        while (i < n) {
          // (h % p) keeps Java remainder sign; the pmod then normalizes —
          // matches pmod((h % p) * a + b, p) exactly ((h%p)·a stays
          // within ±2^62, no overflow)
          val x = hashes.getLong(i) % p * a + b
          var m = x % p
          if (m < 0L) m += p
          if (m < mn) mn = m
          i += 1
        }
        out(j) = mn
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Sign-random-projection band codes of a double vector (see
    * [[SrpBands]]): band b's code packs bitsPerBand sign bits, bit k
    * from projection j = b·bitsPerBand+k with weights
    * ((i·13 + j·7919) mod 97)/97 − 0.5 over 1-based i ≤ dim, summed
    * left-to-right — the exact float algebra of the aggregate-HOF
    * spelling. A null element nulls its projection (bit 0), matching
    * null-propagating arithmetic; dim beyond the vector is a named
    * error (ANSI element_at would have raised out-of-bounds). Accepted
    * divergence: a NON-ANSI session's element_at would have degraded to
    * band code 0 instead of erroring — this repo runs Spark 4's ANSI
    * default everywhere, and a loud named error beats a silent
    * all-rows-one-bucket degeneration if that ever changes. */
  def srpBands(vec: ArrayData, dim: Int, bands: Int,
      bitsPerBand: Int): ArrayData = {
    val n = vec.numElements()
    if (n < dim) throw new IllegalArgumentException(
      s"graft_srp_bands: vector of width $n shorter than dim=$dim")
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var code = 0L
      var k = 0
      while (k < bitsPerBand) {
        val j = b * bitsPerBand + k
        var acc = 0.0
        var isNull = false
        var i = 1
        while (!isNull && i <= dim) {
          if (vec.isNullAt(i - 1)) isNull = true
          else {
            acc += vec.getDouble(i - 1) *
              (((i * 13 + j * 7919) % 97).toDouble / 97.0 - 0.5)
            i += 1
          }
        }
        if (!isNull && acc >= 0) code += (1L << k)
        k += 1
      }
      out(b) = code
      b += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The 120-bit md5-prefix digest pair (see [[Md5Split]]): md5 the
    * string's UTF-8 bytes and return [lo, hi] where lo is the big-endian
    * value of hex chars 1-15 (= bytes 0-7 shifted right one nibble) and
    * hi of hex chars 17-31 (= bytes 8-15 shifted right one nibble) —
    * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` /
    * `...(17, 15)...` without materializing the 32-char hex string or
    * parsing it back. MessageDigest rides a ThreadLocal (digest()
    * resets it), so the hot path allocates only the 16-byte digest and
    * the 2-slot result. */
  def md5Split(text: UTF8String): ArrayData = {
    val d = md5Local.get().digest(text.getBytes)
    var lo = 0L
    var hi = 0L
    var i = 0
    while (i < 8) {
      lo = (lo << 8) | (d(i) & 0xffL)
      hi = (hi << 8) | (d(i + 8) & 0xffL)
      i += 1
    }
    new GenericArrayData(Array[Any](lo >>> 4, hi >>> 4))
  }
}

/** Analysis-time validation of the kernels' documented "foldable
  * positive int" parameter contracts: a non-foldable, NULL, zero, or
  * negative width/count fails by name instead of producing degenerate
  * output (w=0 would shingle empty byte runs, a negative numHashes would
  * throw NegativeArraySizeException from the executor). */
private[functions] object FoldableIntArg {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def check(pretty: String, name: String, e: Expression,
      max: Int = Int.MaxValue): Option[TypeCheckResult.TypeCheckFailure] = {
    if (e.dataType != org.apache.spark.sql.types.IntegerType)
      Some(TypeCheckResult.TypeCheckFailure(
        s"$pretty expects $name to be int, got ${e.dataType.catalogString}"))
    else if (!e.foldable)
      Some(TypeCheckResult.TypeCheckFailure(
        s"$pretty expects $name to be a foldable int literal"))
    else {
      // a foldable expression may still THROW on evaluation (e.g. an ANSI
      // 1/0 literal) — surface that as a named analysis failure, not a
      // raw runtime exception escaping checkInputDataTypes
      val evaluated =
        try Right(e.eval(null))
        catch { case scala.util.control.NonFatal(ex) => Left(ex) }
      evaluated match {
        case Left(ex) => Some(TypeCheckResult.TypeCheckFailure(
          s"$pretty $name failed to evaluate at analysis time: " +
            s"${ex.getClass.getSimpleName}: ${ex.getMessage}"))
        case Right(null) => Some(TypeCheckResult.TypeCheckFailure(
          s"$pretty $name must not be NULL"))
        case Right(v: Int) if v < 1 || v > max =>
          Some(TypeCheckResult.TypeCheckFailure(
            s"$pretty $name must be in [1, $max], got $v"))
        case Right(_) => None
      }
    }
  }
}

/** `graft_shingles(text, n)` → array<string> of whitespace n-gram shingles.
  * `n` must be a foldable positive integer (analysis-enforced). */
case class ShingleArray(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects text to be string, got ${left.dataType.catalogString}")
    else FoldableIntArg.check(prettyName, "n", right)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def nullSafeEval(text: Any, n: Any): Any =
    TextKernels.shingles(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.TextKernels.shingles($t, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleArray = copy(left = newLeft, right = newRight)
}

/** `graft_pairs(sortedArr, withSingles)` → array<struct<x:long, y:long>> of
  * all in-order pairs of an array<long> (plus (x, -1) markers when
  * `withSingles`). Replaces both the interpreted nested-transform pair
  * lambda and the posexplode self-join: pair generation is a compiled loop
  * and the posting-list table needs no second pass. */
case class PairStructs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_pairs"

  override def nullSafeEval(arr: Any, withSingles: Any): Any =
    TextKernels.pairs(arr.asInstanceOf[ArrayData], withSingles.asInstanceOf[Boolean])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, ws) =>
      s"${ev.value} = graft.functions.TextKernels.pairs($a, $ws);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PairStructs = copy(left = newLeft, right = newRight)
}

/** `graft_bpe(word, rules)` → array<string> of BPE subword tokens under a
  * `;`-separated "a b;th e;…" merge-rule literal (`rules` must be
  * foldable — the table parses ONCE per plan, and codegen passes it as a
  * referenced object). Exists because the expression-chain spelling of
  * BPE (dozens of nested `replace` calls) generates pathological
  * codegen/JIT load — one compiled kernel call keeps the stage inside
  * whole-stage codegen at constant plan size. */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe"

  // the rule table parses ONCE per plan, so the argument must be a
  // non-null literal — enforced at ANALYSIS time (the function is on the
  // public SQL front door; without this check a column argument would
  // surface as an opaque NPE from eval(null) during planning)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (word STRING, rules STRING), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName rules must be a foldable string literal")
    else if (right.eval(null) == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName rules must not be NULL")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val rules: Array[Array[String]] =
    TextKernels.parseBpeRules(right.eval(null).asInstanceOf[UTF8String])

  override def nullSafeEval(word: Any, rulesArg: Any): Any =
    TextKernels.bpe(word.asInstanceOf[UTF8String], rules)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("bpeRules", rules, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.TextKernels.bpe($w, $rulesRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeEncode = copy(left = newLeft, right = newRight)
}

/** `graft_tokens(text)` → array<string> whitespace tokens (see
  * [[TextKernels.tokens]]): the compiled replacement for the
  * interpreted `filter(split(text, " "), _ =!= "")` HOF across the
  * token-level text queries. */
case class TokenArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(text: Any): Any =
    TextKernels.tokens(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.tokens($t);")

  override protected def withNewChildInternal(newChild: Expression): TokenArray =
    copy(child = newChild)
}

/** `graft_simhash64(text)` → bigint SimHash fingerprint (see
  * [[TextKernels.simhash64]]): replaces the library spelling that
  * unrolled to 64 interpreted `aggregate` traversals of the token-hash
  * array per row. */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(text: Any): Any =
    TextKernels.simhash64(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.simhash64($t);")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** `graft_shingle_xxhashes(text, w)` → array<long> distinct w-shingle
  * xxhash64 hashes in first-occurrence order (see
  * [[TextKernels.shingleXxHashes]]); `w` must be a foldable positive
  * int. */
case class ShingleXxHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_xxhashes"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects text to be string, got ${left.dataType.catalogString}")
    else FoldableIntArg.check(prettyName, "w", right)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def nullSafeEval(text: Any, w: Any): Any =
    TextKernels.shingleXxHashes(text.asInstanceOf[UTF8String],
      w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.TextKernels.shingleXxHashes($t, $w);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleXxHashes =
    copy(left = newLeft, right = newRight)
}

/** `graft_minhash_sig(hashes, numHashes)` → array<long> MinHash
  * signature (see [[TextKernels.minhashSig]]); slots are null for an
  * empty hash array (array_min-of-empty contract), hence
  * containsNull=true. */
case class MinhashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    left.dataType match {
      case ArrayType(LongType, _) =>
        FoldableIntArg.check(prettyName, "numHashes", right)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects hashes to be array<bigint>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(hashes: Any, n: Any): Any =
    TextKernels.minhashSig(hashes.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, n) =>
      s"${ev.value} = graft.functions.TextKernels.minhashSig($h, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MinhashSig =
    copy(left = newLeft, right = newRight)
}

/** `graft_srp_bands(vec, dim, bands, bitsPerBand)` → array<long> band
  * codes (see [[TextKernels.srpBands]]): replaces the library spelling
  * that unrolled to bands·bitsPerBand interpreted `aggregate`
  * traversals of the embedding per row. dim/bands/bitsPerBand ride as
  * int literals. */
case class SrpBands(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_bands"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.DoubleType
    first.dataType match {
      case ArrayType(DoubleType, _) =>
        // bitsPerBand caps at 63: bit k shifts into a signed long
        FoldableIntArg.check(prettyName, "dim", second)
          .orElse(FoldableIntArg.check(prettyName, "bands", third))
          .orElse(FoldableIntArg.check(prettyName, "bitsPerBand", fourth,
            max = 63))
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects vec to be array<double>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(v: Any, d: Any, b: Any, k: Any): Any =
    TextKernels.srpBands(v.asInstanceOf[ArrayData], d.asInstanceOf[Int],
      b.asInstanceOf[Int], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, d, b, k) =>
      s"${ev.value} = graft.functions.TextKernels.srpBands($v, $d, $b, $k);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SrpBands =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** `graft_md5_split(s)` → array<long> [lo, hi]: the dedup family's
  * 120-bit md5-prefix digest pair in ONE compiled call — bit-identical
  * to the `conv(substring(md5(s), 1, 15), 16, 10)` /
  * `conv(substring(md5(s), 17, 15), 16, 10)` spelling every oracle
  * mirrors, but without materializing the 32-char hex string and
  * parsing two 15-char substrings back through conv's base-conversion
  * loop. Exists because the digest projection sits on the hottest path
  * in the suite (the shingle explode feeding every near-dup/decontam
  * query): measured +0.28 s of the shared core's 2.0 s at sf0.1. */
case class Md5Split(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_split"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(text: Any): Any =
    TextKernels.md5Split(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.md5Split($t);")

  override protected def withNewChildInternal(newChild: Expression): Md5Split =
    copy(child = newChild)
}

/** Unicode NFC canonical composition of one string — the normalization
  * step a crawl-ingest pipeline runs before any hashing or dedup (the
  * same text arrives composed from one site and decomposed from another;
  * without NFC they hash apart). A compiled static call per row (the
  * JDK's java.text.Normalizer is the reference implementation), so the
  * surrounding stage stays inside whole-stage codegen — the interpreted
  * alternative would be a Scala UDF with per-row boxing. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(text: Any): Any =
    TextKernels.nfc(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.nfc($t);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
