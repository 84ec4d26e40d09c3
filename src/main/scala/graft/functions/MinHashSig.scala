package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash signature of a shingle array: element i of the
  * result is the lexicographic min of `md5("i|" + shingle)` (lowercase
  * hex) over the doc's shingles — exactly the arithmetic of the
  * relational twin ([[graft.operators.Dedup.minhashSignaturesViaExplode]])
  * and of the DuckDB oracles that replay it in SQL.
  *
  * Why native: the twin explodes to one row per SHINGLE and shuffles that
  * table through a k-column min aggregation just to fold per-doc minima —
  * at 100 TB the exchange of the exploded corpus is the dominant cost of
  * every MinHash pipeline (LSH candidates, verified near-dups, the
  * curation family), and it exists only because the per-doc fold was
  * expressed relationally. Here the fold happens inside the row: MinHash
  * signatures become a pure scan projection, and the FIRST shuffle of
  * those pipelines is the (much smaller) band-bucket exchange.
  *
  * Bit-compatibility: lowercase-hex strings of equal length compare
  * character-wise exactly as the underlying 16 digest bytes compare
  * unsigned (nibble → hex char is monotonic), so the byte-wise min here
  * IS the twin's string min. The k digests per shingle match
  * `md5(concat(lit("i|"), s))` byte-for-byte (UTF-8 both sides).
  *
  * Null handling: a null ARRAY returns null (the twin's explode drops the
  * doc — callers filter, keeping the forms row-identical). An EMPTY array
  * returns null too (no shingle rows → no aggregated row in the twin).
  * Null ELEMENTS are skipped (the twin's `md5(concat(...))` nulls out and
  * `min` ignores nulls); tokenized shingles never contain them.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.MinHashSig.compute($c, $k);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  // seed prefixes depend only on k — cache per k instead of re-encoding
  // k strings on every row of the hottest projection in the pipeline
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixesFor(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k, k => {
      val ps = new Array[Array[Byte]](k)
      var j = 0
      while (j < k) {
        ps(j) = s"$j|".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        j += 1
      }
      ps
    })

  /** unsigned byte-wise comparison: is a < b? (equal lengths) */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Static seam shared by eval and codegen (identical arithmetic).
    * Returns null when the array holds no non-null shingle. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val digest = md5.get()
    val prefixes = prefixesFor(k)
    val minima = new Array[Array[Byte]](k)
    var any = false
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        any = true
        val sBytes = s.getBytes
        var j = 0
        while (j < k) {
          digest.update(prefixes(j))
          digest.update(sBytes)
          val d = digest.digest()
          if (minima(j) == null || less(d, minima(j))) minima(j) = d
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    val out = new Array[AnyRef](k)
    var m = 0
    while (m < k) {
      val d = minima(m)
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexChars((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexChars(d(b) & 0xf)
        b += 1
      }
      out(m) = UTF8String.fromString(new String(hex))
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: signature of a shingle-array attribute. */
  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))
}
