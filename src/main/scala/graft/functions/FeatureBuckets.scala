package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass hashed n-gram feature extractor: the bucket array of
  * [[graft.operators.Dsir.featureBucketsHof]] (lowercase whitespace
  * unigrams then adjacent-pair bigrams, each md5-hashed to
  * `conv(substr(md5(salt|f), 1, 8), 16, 10) % numBuckets`), computed
  * inside the row.
  *
  * Why native: the composable twin runs three interpreted higher-order
  * lambdas per document (filter, zip_with, transform) and inside the
  * last one a 5-node expression tree (concat → md5 → substring → conv →
  * cast) PER FEATURE — the per-element interpretation is the dominant
  * cost of every hashed-feature pass (DSIR weighting, quality-filter
  * training and serving score ~2 features per token, so a 100 TB corpus
  * pays it ~2×10¹³ times). Here tokenization and hashing happen in one
  * compiled pass over the string's bytes with a single thread-local
  * digest.
  *
  * Bit-compatibility with the twin, by construction: lowering/trimming/
  * splitting call the SAME `UTF8String` operations Spark's `lower`/
  * `trim`/`split` evaluate (toLowerCase → trim → split("\\s+", -1)),
  * the digest runs over the identical UTF-8 bytes (`salt|feature`,
  * bigrams joined with a single space), and the first-8-hex-chars
  * `conv` is exactly the big-endian unsigned int of the first 4 digest
  * bytes. Unigrams precede bigrams in the output, the twin's `concat`
  * order.
  *
  * Null text → null (the twin's `split(null)` propagates; explodes drop
  * the doc). Whitespace-only text → EMPTY array (length-0 tokens are
  * filtered, as the twin filters them).
  */
case class FeatureBuckets(child: Expression, numBuckets: Int, salt: String)
    extends UnaryExpression {

  require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"feature_buckets requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  // salt + '|' as UTF-8, computed once per expression instance
  private lazy val saltPrefix: Array[Byte] =
    (salt + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    FeatureBuckets.compute(input.asInstanceOf[UTF8String], numBuckets,
      saltPrefix)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("saltPrefix", saltPrefix, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("buckets")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.FeatureBuckets.compute($c, $numBuckets,
         |    $prefixRef);
         |${ev.value} = $tmp;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeatureBuckets {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val SplitPattern = UTF8String.fromString("\\s+")
  private val SpaceByte = ' '.toByte

  /** `conv(substr(md5(prefix ++ feature), 1, 8), 16, 10)` as a long —
    * the big-endian unsigned int of the first 4 digest bytes — mod
    * `numBuckets`. */
  private def bucketOf(md: MessageDigest, prefix: Array[Byte],
      feature: Array[Byte], numBuckets: Int): Long = {
    md.reset()
    md.update(prefix)
    md.update(feature)
    val d = md.digest()
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % numBuckets
  }

  def compute(text: UTF8String, numBuckets: Int,
      saltPrefix: Array[Byte]): ArrayData = {
    // the twin's exact chain: lower → trim → split("\s+", -1) → drop ""
    val parts = text.toLowerCase.trim().split(SplitPattern, -1)
    var n = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i) != null && parts(i).numBytes() > 0) n += 1
      i += 1
    }
    val toks = new Array[Array[Byte]](n)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (parts(i) != null && parts(i).numBytes() > 0) {
        toks(j) = parts(i).getBytes
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](if (n == 0) 0 else 2 * n - 1)
    val md = md5.get()
    i = 0
    while (i < n) { // unigrams first (the twin's concat order)
      out(i) = bucketOf(md, saltPrefix, toks(i), numBuckets)
      i += 1
    }
    i = 0
    while (i < n - 1) { // then adjacent bigrams, space-joined
      val a = toks(i); val b = toks(i + 1)
      val f = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, f, 0, a.length)
      f(a.length) = SpaceByte
      System.arraycopy(b, 0, f, a.length + 1, b.length)
      out(n + i) = bucketOf(md, saltPrefix, f, numBuckets)
      i += 1
    }
    new GenericArrayData(out)
  }
}
