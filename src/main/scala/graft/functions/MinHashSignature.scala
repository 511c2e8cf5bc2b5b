package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-element MinHash signature of a text column in ONE native pass —
  * byte-identical to the declarative md5 fold it replaces
  * (`TextFunctions.minhashSignatureFold`, kept as the reference form and
  * pinned equal by TextFunctionsSpec).
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.11 preference order):
  * the declarative fold evaluates `aggregate`/`zip_with` higher-order
  * functions interpreted per shingle, allocating k md5 HEX STRINGS plus
  * two lambda arrays per shingle — measured ~4.3 ms·core per document at
  * 30 M pages (the op that dominated the round-5 compute-scaling leg).
  * This expression walks the shingle windows over pre-encoded word bytes,
  * digests into ONE reusable 16-byte scratch (`MessageDigest.digest(buf,
  * off, len)`), and keeps k running minima as raw digests — no per-shingle
  * allocation at all. Hex rendering happens once, on the k winners, so the
  * output (and therefore every LSH band key, q28/q29 and their DuckDB
  * oracles) is unchanged.
  *
  * Semantics replicated exactly from the declarative form:
  *   - words  = split(trim(text), " +")   (trim strips 0x20 only — Spark's
  *     `trim` — and the regex split matches Spark's `split(str, " +")`)
  *   - shingles = word n-grams joined by " "; texts with 0 < #words < n
  *     yield ONE whole-text shingle; empty/all-space text yields none
  *   - signature(i) = min over shingles of hex(md5(utf8("i|" + shingle)))
  *     — minimizing the raw digest bytes unsigned-lexicographically is
  *     order-identical to minimizing the lowercase-hex strings
  *   - no shingles → k NULL entries (the fold's untouched init array);
  *     NULL text → NULL signature
  *
  * Digest minima are per-seed independent, so the value is partition- and
  * order-invariant (checkpoint-resume determinism, SURVEY.md §7.6(5)).
  */
case class MinHashSignature(child: Expression, shingleN: Int, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(shingleN >= 1 && k >= 1, s"shingleN=$shingleN k=$k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"minhash_signature needs string, got $other")
    }

  // per-seed md5 prefixes "0|", "1|", … — the declarative form's
  // md5(concat(lit(s"$seed|"), shingle)) byte streams
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // Spark `trim`: strip the space character only (NOT Java String.trim,
    // which also strips \t \n and would split differently)
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    if (e == b) return new GenericArrayData(new Array[Any](k)) // k nulls
    val words = raw.substring(b, e).split(" +")
    val win = math.min(words.length, shingleN)
    val nShingles = math.max(words.length - shingleN + 1, 1)
    val wordBytes = new Array[Array[Byte]](words.length)
    var wi = 0
    while (wi < words.length) { wordBytes(wi) = words(wi).getBytes("UTF-8"); wi += 1 }

    val md = MessageDigest.getInstance("MD5")
    val scratch = new Array[Byte](16)
    val minima = new Array[Array[Byte]](k)
    var s = 0
    while (s < nShingles) {
      var seed = 0
      while (seed < k) {
        md.update(prefixes(seed))
        var w = 0
        while (w < win) {
          if (w > 0) md.update(' '.toByte)
          md.update(wordBytes(s + w))
          w += 1
        }
        md.digest(scratch, 0, 16) // finalizes into scratch and resets md
        val cur = minima(seed)
        if (cur == null) minima(seed) = scratch.clone()
        else if (unsignedLess(scratch, cur)) System.arraycopy(scratch, 0, cur, 0, 16)
        seed += 1
      }
      s += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = UTF8String.fromString(toHex(minima(i))); i += 1 }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(d: Array[Byte]): String = {
    val hex = MinHashSignature.HexChars
    val cs = new Array[Char](32)
    var i = 0
    while (i < 16) {
      cs(2 * i) = hex((d(i) >> 4) & 0xf)
      cs(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(cs)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  private[functions] val HexChars = "0123456789abcdef".toCharArray

  def of(text: Column, shingleN: Int, k: Int): Column =
    GraftBridge.toColumn(
      MinHashSignature(GraftBridge.toExpression(text), shingleN, k))
}
