package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernel: `k` permutations simulated as the
  * minimum over shingles of `md5(i + "|" + shingle)` — the SAME hash
  * family as the declarative
  * `transform(sequence(0, k-1), i => array_min(transform(sh, s => md5(...))))`
  * it replaces, but computed in one JVM pass per row instead of an
  * interpreted nested-lambda tree (k × |sh| expression-tree walks with
  * per-element string concat/allocation).
  *
  * Parity contract (the DuckDB oracle replays the same arithmetic):
  * lowercase-hex md5 strings compared lexicographically. Hex lexicographic
  * order equals UNSIGNED byte order of the 16-byte digest, so the kernel
  * compares raw digests and hex-encodes only each permutation's winner.
  * Null shingle elements are skipped (array_min ignores nulls); an
  * empty/all-null shingle set yields null signature entries.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${other.catalogString}")
  }

  /** Per-permutation salt bytes, computed once per expression instance —
    * not once per row. */
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(p => (p.toString + "|").getBytes("UTF-8"))

  private def hex(bytes: Array[Byte]): UTF8String =
    UTF8String.fromBytes(HexBytes.lowerHex(bytes))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // shingle bytes decoded once, reused across all k permutations
    val shingles = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) shingles(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](k)
    var p = 0
    while (p < k) {
      val prefix = prefixes(p)
      var min: Array[Byte] = null
      var j = 0
      while (j < n) {
        val s = shingles(j)
        if (s != null) {
          md.reset()
          md.update(prefix)
          md.update(s)
          val d = md.digest()
          if (min == null || java.util.Arrays.compareUnsigned(d, min) < 0)
            min = d
        }
        j += 1
      }
      out(p) = if (min == null) null else hex(min)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHash {
  /** MinHash signature of a shingle-array column (k lowercase-hex md5
    * minima, identical to the declarative HOF form). */
  def signature(sh: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(sh), k))
}

/** Native 32-bit SimHash kernel over a token array: bit b of the hash is
  * set when the signed sum over tokens of the parity of md5 hex digit b
  * is positive — EXACTLY the arithmetic of the declarative form
  * (`aggregate` fold per bit over `transform(tokens, md5)`), but with one
  * digest per token and all 32 bit-counters updated in a single pass,
  * instead of 32 interpreted lambda folds per document.
  *
  * Hex digit b of the digest is the high nibble of byte b/2 for even b,
  * low nibble for odd b; its parity is the nibble's lowest bit. A null
  * token contributes −1 to every bit (the HOF `otherwise` branch on a
  * null md5). A null token ARRAY yields null. */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 32) { counts(b) -= 1; b += 1 }
      } else {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          val nib = if ((b & 1) == 0) (d(b >> 1) >> 4) & 0xf else d(b >> 1) & 0xf
          counts(b) += (if ((nib & 1) == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash {
  /** 32-bit simhash of a token-array column (md5-hex-parity bits,
    * identical to the declarative fold form and the DuckDB oracle). */
  def simhash32(tokens: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(tokens)))
}

/** Native winnowing kernel: distinct selected fingerprints of a document
  * (character k-gram md5s, sliding window of `w` hashes, RIGHTMOST
  * minimum per window — Schleimer/Wilkerson/Aiken).
  *
  * Exact parity with the declarative form (`min` over a window frame of
  * `md5hex || sortable-position-suffix` strings): hex lexicographic
  * order equals unsigned digest order, and the suffix's rightmost-on-tie
  * rule collapses to "pop while the new digest compares ≤ the back of
  * the deque" — a textbook monotonic-deque sliding minimum, one pass per
  * document instead of ~|text| interpreted lambda md5s plus an exploded
  * window/distinct. Texts shorter than k+w−1 yield an empty array. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, s"k and w must be >= 1: k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.catalogString}")
  }

  private def hex(bytes: Array[Byte]): String =
    new String(HexBytes.lowerHex(bytes), java.nio.charset.StandardCharsets.US_ASCII)

  override def nullSafeEval(v: Any): Any = {
    // CODE POINTS, not UTF-16 units: SQL length()/substr() count code
    // points in both engines, and a k-gram must never split a surrogate
    // pair (it would md5 replacement bytes and break oracle parity)
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    if (len < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val ng = len - k + 1
    val md = MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](ng)
    var i = 0
    while (i < ng) {
      md.reset()
      digests(i) = md.digest(new String(cps, i, k).getBytes("UTF-8"))
      i += 1
    }
    val selected = new java.util.LinkedHashSet[String]()
    val deque = new java.util.ArrayDeque[Int]()
    var j = 0
    while (j < ng) {
      // new key ≤ back key ⟺ digest ≤ (equal digest → later index wins)
      while (!deque.isEmpty &&
        java.util.Arrays.compareUnsigned(digests(j), digests(deque.peekLast())) <= 0)
        deque.pollLast()
      deque.addLast(j)
      if (j >= w - 1) {
        while (deque.peekFirst() < j - w + 1) deque.pollFirst()
        selected.add(hex(digests(deque.peekFirst())))
      }
      j += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object Winnow {
  /** Distinct winnowing fingerprints of a text column. */
  def fingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))
}

/** Shared lowercase-hex encoder for the md5-digest kernels — one
  * implementation, two string representations (UTF8String for the
  * expression path, String for the fingerprint path). */
private[functions] object HexBytes {
  private val hexDigits = "0123456789abcdef".getBytes("US-ASCII")
  def lowerHex(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    out
  }
}
