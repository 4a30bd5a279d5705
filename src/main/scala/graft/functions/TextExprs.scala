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

/** Shared single-pass implementation of shingle hashing, callable from
  * both interpreted eval and generated code. */
object ShingleHashesImpl {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** text → distinct md5-prefix hashes of word w-gram shingles. */
  def compute(input: UTF8String, width: Int, nibbles: Int): ArrayData = {
    val text = input.toString
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val n = toks.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = digest.get()
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
      md.reset()
      val dig = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first `nibbles` hex chars == high 4*nibbles bits of the digest
      var h = 0L
      var b = 0
      while (b < (nibbles + 1) / 2) {
        h = (h << 8) | (dig(b) & 0xffL)
        b += 1
      }
      if (nibbles % 2 == 1) h >>>= 4
      seen.add(h)
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

object TextExprs {
  /** Distinct md5-prefix hashes of word w-gram shingles (see
    * [[ShingleHashes]]). */
  def shingle_hashes(text: Column, width: Int, nibbles: Int): Column =
    ColumnBridge.column(
      ShingleHashes(ColumnBridge.expression(text), width, nibbles))
}
