package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The one md5-prefix hash convention every text operator and every
  * DuckDB oracle shares: first `nibbles` hex chars of md5(s) parsed
  * base-16 (== high 4·nibbles bits of the digest). Centralized so a
  * convention change cannot silently diverge between expressions. */
object Md5Prefix {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def hash(bytes: Array[Byte], nibbles: Int): Long = {
    val md = digest.get()
    md.reset()
    val dig = md.digest(bytes)
    var h = 0L
    var b = 0
    while (b < (nibbles + 1) / 2) {
      h = (h << 8) | (dig(b) & 0xffL)
      b += 1
    }
    if (nibbles % 2 == 1) h >>>= 4
    h
  }

  def hash(s: String, nibbles: Int): Long =
    hash(s.getBytes(StandardCharsets.UTF_8), nibbles)
}

/** Scalar md5-prefix hash: the engine's shared 60-bit (or shorter)
  * deterministic-bucketing convention as ONE codegen'd expression.
  * Replaces the 4-step string pipeline
  * `conv(substring(md5(c), 1, nibbles), 16, 10).cast("long")` — hex
  * render (32 chars) + substring + base-16 STRING parse + cast —
  * whose string churn measured ~4.7× the digest cost itself (q443's
  * 1.8M-hash stack fan-out: 1.64 s → the md5 line dominated the whole
  * query). Semantics are bit-identical: the first `nibbles` hex chars
  * of md5 parsed base-16 == the high 4·nibbles bits of the digest,
  * which [[Md5Prefix.hash]] extracts arithmetically. Accepts STRING
  * (hashes its UTF-8 bytes, like Spark's md5's implicit cast) or
  * BINARY. DuckDB twins keep their
  * `('0x' || substr(md5(x), 1, n))::BIGINT` form — same bits. */
case class HashPrefix(child: Expression, nibbles: Int)
    extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix expects STRING or BINARY input, got ${t.sql}")
    }
  }

  override def dataType: DataType = LongType

  private def isString = child.dataType ==
    org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) Md5Prefix.hash(input.asInstanceOf[UTF8String].getBytes, nibbles)
    else Md5Prefix.hash(input.asInstanceOf[Array[Byte]], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = if (isString) s"$c.getBytes()" else c
      s"${ev.value} = graft.functions.Md5Prefix.hash($bytes, $nibbles);"
    })

  override protected def withNewChildInternal(c: Expression): HashPrefix =
    copy(child = c)
}

/** Shared single-pass implementation of shingle hashing, callable from
  * both interpreted eval and generated code. */
object ShingleHashSeqImpl {

  /** text → md5-prefix hashes of word w-gram shingles IN POSITION
    * ORDER (non-distinct): element i is the hash of tokens i..i+w−1.
    * The positional sibling of [[ShingleHashesImpl]] for operators
    * that need window STARTS (q286 dup-span coverage), where set
    * semantics would lose the offsets. */
  def compute(input: UTF8String, width: Int, nibbles: Int): ArrayData = {
    val text = input.toString
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val n = toks.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var k = 0
      while (k < width) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = Md5Prefix.hash(sb.toString, nibbles)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Positional (non-distinct) variant of [[ShingleHashes]] — same
  * tokenization, shingle text, and md5-prefix hash, but one element
  * per shingle START, in order. Same codegen argument: a static call
  * keeps the expression inside the whole-stage span (the HOF
  * `transform(sequence(...), 8 × element_at + concat_ws + md5)`
  * formulation it replaces is interpreted per element — measured 2.2 s
  * → the scan floor on q286 at sf0.1). */
case class ShingleHashSeq(child: Expression, width: Int, nibbles: Int)
    extends UnaryExpression {
  require(width >= 1 && nibbles >= 1 && nibbles <= 15)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashSeqImpl.compute(input.asInstanceOf[UTF8String], width, nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashSeqImpl.compute($c, $width, $nibbles);")

  override protected def withNewChildInternal(c: Expression): ShingleHashSeq =
    copy(child = c)
}

object ShingleHashesImpl {

  /** text → distinct md5-prefix hashes of word w-gram shingles. */
  def compute(input: UTF8String, width: Int, nibbles: Int): ArrayData = {
    val text = input.toString
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val n = toks.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var k = 0
      while (k < width) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(Md5Prefix.hash(sb.toString, nibbles))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native distinct-hashed-shingle extraction: text → array<long> of
  * md5-prefix hashes of word w-grams.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference (b)): the
  * composable formulation
  * `transform(array_distinct(shingles3(tokens(text))), md5-hash)`
  * is catastrophically slow in Spark — higher-order functions are
  * CodegenFallback, and `element_at(tokens(text), i)` inside the
  * shingle lambda re-evaluates the whole regex tokenization once per
  * element access (measured: ~17 s just to materialize shingle hashes
  * for 5 000 docs at sf0.1; this expression does it in <1 s). One
  * compiled pass per row: split, slide a w-window, dedup, hash.
  *
  * Codegen: emits a static call into [[ShingleHashesImpl]] rather than
  * CodegenFallback — the expression stays INSIDE the whole-stage span
  * (a fallback child splits the span and forces the surrounding
  * projection back to interpreted row-at-a-time glue).
  *
  * Semantics (bit-equal to the DuckDB oracle twin):
  *  - tokens: split on `\s+`, drop empties;
  *  - shingles: tokens i..i+w-1 joined with a single space, i ≥ 0,
  *    none if fewer than w tokens;
  *  - hash: first `nibbles` hex chars of md5(shingle) parsed base-16
  *    (DuckDB: `('0x' || substr(md5(x), 1, nibbles))::BIGINT`);
  *  - distinct (set semantics).
  */
case class ShingleHashes(child: Expression, width: Int, nibbles: Int)
    extends UnaryExpression {
  require(width >= 1 && nibbles >= 1 && nibbles <= 15)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashesImpl.compute(input.asInstanceOf[UTF8String], width, nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashesImpl.compute($c, $width, $nibbles);")

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** Shared single-pass SimHash implementation (interpreted + codegen). */
object SimHash60Impl {

  /** text → 60-bit SimHash over whitespace tokens, or null if the text
    * has no tokens (matching the explode-based formulation, where a
    * token-less doc vanishes from the aggregation).
    *
    * Per token: h = [[Md5Prefix]] at 15 nibbles (high 60 bits of the
    * digest). Bit j of the fingerprint is 1 iff
    * Σ_tokens (bit_j(h) ? +1 : −1) > 0. Every occurrence votes (no
    * dedup) — same as the oracle's unnest. */
  def compute(input: UTF8String): java.lang.Long = {
    val toks = input.toString.split("\\s+")
    val votes = new Array[Int](60)
    var any = false
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        any = true
        val h = Md5Prefix.hash(t, 15)
        var j = 0
        while (j < 60) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sh = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sh |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sh)
  }
}

/** Native single-pass SimHash: text → 60-bit fingerprint long.
  *
  * Why (same argument as [[ShingleHashes]]): the declarative
  * formulation explodes every token and runs a 60-aggregate-column
  * groupBy — a full shuffle of |tokens| rows just to come back to one
  * row per document. This expression folds tokenize → md5 → 60
  * majority votes → bit-pack into one compiled pass per row, keeping
  * the whole query shuffle-free (scan → project → sort). Bit-equal to
  * the DuckDB twin (md5-prefix token hash, +1/−1 votes, vote>0 ⇒ bit
  * set). Null for token-less text, matching the explode formulation
  * where such docs drop out of the aggregation. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash60Impl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("simhashRes")
      s"""
      java.lang.Long $tmp = graft.functions.SimHash60Impl.compute($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

/** Shared single-pass repetition-profile implementation (interpreted +
  * codegen): one tokenize pass builds the unigram and bigram count maps
  * together, replacing q35's explode → two groupBys → window-lead →
  * groupBy → join pipeline (5 shuffling operators) with a per-row
  * scalar. Null for token-less docs (they vanish from the explode
  * formulation too). Bigrams are over consecutive NON-EMPTY tokens —
  * the same sequence the filtered-token explode produces. */
object RepetitionStatsImpl {
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val raw = input.toString.split("\\s+")
    val uni = new java.util.HashMap[String, Int]()
    val bi = new java.util.HashMap[String, Int]()
    var n = 0
    var prev: String = null
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (t.nonEmpty) {
        n += 1
        uni.merge(t, 1, Integer.sum)
        if (prev != null) bi.merge(prev + " " + t, 1, Integer.sum)
        prev = t
      }
      i += 1
    }
    if (n == 0) return null
    var top = 0
    val uit = uni.values().iterator()
    while (uit.hasNext) { val v = uit.next(); if (v > top) top = v }
    var dup = 0L
    val bit = bi.values().iterator()
    while (bit.hasNext) { val v = bit.next(); if (v > 1) dup += v }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, uni.size.toLong, top.toLong, (n - 1).toLong, dup))
  }
}

/** text → struct(n_tokens, n_distinct, top_c, n_bigrams, dup_occ) in
  * one compiled pass (see [[RepetitionStatsImpl]]). */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStats.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("repStats")
      s"""
      org.apache.spark.sql.catalyst.InternalRow $tmp =
        graft.functions.RepetitionStatsImpl.compute($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {
  import org.apache.spark.sql.types.{StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup_occ", LongType, nullable = false)))
}

object TextExprs {
  /** Distinct md5-prefix hashes of word w-gram shingles (see
    * [[ShingleHashes]]). */
  def shingle_hashes(text: Column, width: Int, nibbles: Int): Column =
    ColumnBridge.column(
      ShingleHashes(ColumnBridge.expression(text), width, nibbles))

  /** Positional w-gram shingle hashes (see [[ShingleHashSeq]]). */
  def shingle_hash_seq(text: Column, width: Int, nibbles: Int): Column =
    ColumnBridge.column(
      ShingleHashSeq(ColumnBridge.expression(text), width, nibbles))

  /** 60-bit SimHash of whitespace tokens (see [[SimHash60]]). */
  def simhash60(text: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(text)))

  /** Single-pass repetition profile (see [[RepetitionStats]]). */
  def repetition_stats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))

  /** md5-prefix hash of a string/binary column (see [[HashPrefix]]). */
  def md5_prefix(c: Column, nibbles: Int): Column =
    ColumnBridge.column(HashPrefix(ColumnBridge.expression(c), nibbles))
}
