package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-dup fingerprint `md5(regexp_replace(lower(trim(text)), " +", " "))`
  * fused into ONE native pass — byte-identical to the declarative chain
  * (TextFunctionsSpec pins the equality), which allocated three full string
  * copies per row (trim → lower → regex-normalized) before hashing. Here
  * the space-run collapse feeds the MD5 digest directly from the lowered
  * bytes segment-by-segment: no normalized copy, no regex engine, one hex
  * render of the 16-byte digest.
  *
  * Semantics replicated exactly:
  *   - trim strips the SPACE character only (Spark `trim`);
  *   - lower is Spark's Unicode lowercase (`UTF8String.toLowerCase` — the
  *     same call Spark's `Lower` expression makes), applied to the trimmed
  *     slice (case mapping never creates or removes 0x20, so collapse
  *     order is unaffected);
  *   - runs of 0x20 collapse to a single 0x20 (the `" +"` regex matches
  *     spaces only — tabs/newlines pass through untouched);
  *   - md5 renders as 32 lowercase hex chars (Spark `md5`);
  *   - NULL text → NULL; empty/all-space text → md5 of "".
  */
case class NormFingerprint(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "norm_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"norm_fingerprint needs string, got $other")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].trim().toLowerCase
    val bytes = lowered.getBytes
    val md = SimHash64.localMd5.get()
    md.reset()
    var i = 0
    val n = bytes.length
    while (i < n) {
      val start = i
      while (i < n && bytes(i) != ' ') i += 1
      if (i > start) md.update(bytes, start, i - start)
      if (i < n) { // a space run: emit ONE space, skip the rest
        md.update(' '.toByte)
        while (i < n && bytes(i) == ' ') i += 1
      }
    }
    val dig = SimHash64.localDigestBuf.get()
    md.digest(dig, 0, 16)
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = hexChars((dig(j) >> 4) & 0xf).toByte
      hex(2 * j + 1) = hexChars(dig(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  override protected def withNewChildInternal(newChild: Expression): NormFingerprint =
    copy(child = newChild)
}

object NormFingerprint {
  def of(text: Column): Column =
    GraftBridge.toColumn(NormFingerprint(GraftBridge.toExpression(text)))
}
