package graft.sim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-set Jaccard as one allocation-free kernel — exact mirror of
  * the builtin chain `array_distinct(filter(split(x, " "), _ != ""))`
  * → `|∩| / |∪|` with both-sides-empty → 1.0 ([[Similarity
  * .tokenJaccard]]'s former formula, still the DuckDB oracle's shape),
  * without the per-row regex split, array allocations, and hash-set
  * builds the builtin chain pays. The kernel runs at millions of calls
  * per task inside the scoring pass (reference similarity stage,
  * oagdedupe db/postgres/orm.py:64-96).
  *
  * Tokens are maximal runs of non-space BYTES: in UTF-8 no multi-byte
  * sequence contains 0x20, so byte-splitting equals the builtin's
  * character split for EVERY input — no ASCII gate needed. Set
  * semantics need only a consistent total order, so tokens are
  * index-sorted with a signed-byte comparator (insertion sort; token
  * counts are tens per field), deduped adjacent for the per-side
  * distinct, and merge-intersected: |∪| = na + nb − |∩|.
  */
object TokenSets {

  /** per-thread token index scratch (offsets/lengths per side). */
  private final class TokScratch {
    var offA: Array[Int] = new Array[Int](64)
    var lenA: Array[Int] = new Array[Int](64)
    var offB: Array[Int] = new Array[Int](64)
    var lenB: Array[Int] = new Array[Int](64)
    def ensureA(n: Int): Unit = if (offA.length < n) {
      offA = new Array[Int](n * 2); lenA = new Array[Int](n * 2)
    }
    def ensureB(n: Int): Unit = if (offB.length < n) {
      offB = new Array[Int](n * 2); lenB = new Array[Int](n * 2)
    }
  }
  private val scratch = new ThreadLocal[TokScratch] {
    override def initialValue(): TokScratch = new TokScratch
  }

  private def compareTok(buf: Array[Byte], o1: Int, l1: Int,
                         o2: Int, l2: Int): Int = {
    val n = math.min(l1, l2)
    var i = 0
    while (i < n) {
      val d = buf(o1 + i) - buf(o2 + i)
      if (d != 0) return d
      i += 1
    }
    l1 - l2
  }

  private def compareAB(a: Array[Byte], oa: Int, la: Int,
                        b: Array[Byte], ob: Int, lb: Int): Int = {
    val n = math.min(la, lb)
    var i = 0
    while (i < n) {
      val d = a(oa + i) - b(ob + i)
      if (d != 0) return d
      i += 1
    }
    la - lb
  }

  /** Above this many RAW tokens the one-pass insertion sort (O(t²)
    * compares/moves) hands off to scan + quicksort + adjacent dedupe
    * (O(t log t)) — the round-5 kernel insertion-sorted unconditionally,
    * which regressed quadratically on long-document operands (a 10k-token
    * field is ~10⁸ byte-compares per row). Small fields stay on the
    * insertion path: at the tens-of-tokens typical of dedupe attributes
    * it beats the quicksort's pivot machinery. */
  private final val QuicksortMinTokens = 48

  /** tokenize buf[0,len) on 0x20, sort token indexes, dedupe adjacent;
    * returns the distinct count with off/lenArr holding the sorted
    * distinct tokens. Dispatch: one-pass insertion sort below
    * [[QuicksortMinTokens]] raw tokens, scan + quicksort + adjacent
    * dedupe above — identical output order (the byte comparator is the
    * same total order), only the algorithm differs. */
  private def distinctTokens(buf: Array[Byte], len: Int,
                             off: Array[Int], lenArr: Array[Int]): Int = {
    var n = 0
    var i = 0
    while (i < len) {
      if (buf(i) != ' ') {
        val start = i
        while (i < len && buf(i) != ' ') i += 1
        // insertion sort by token bytes; equal tokens collapse
        var lo = 0; var dup = false
        var j = n - 1
        var placed = false
        // find insertion point from the right (tokens arrive in text
        // order; sortedness lets dedupe be adjacency)
        while (j >= 0 && !placed) {
          val c = compareTok(buf, off(j), lenArr(j), start, i - start)
          if (c == 0) { dup = true; placed = true }
          else if (c < 0) { lo = j + 1; placed = true }
          else j -= 1
        }
        if (!placed) lo = 0
        if (!dup) {
          var k = n
          while (k > lo) { off(k) = off(k - 1); lenArr(k) = lenArr(k - 1); k -= 1 }
          off(lo) = start; lenArr(lo) = i - start
          n += 1
        }
        if (n == QuicksortMinTokens)
          return distinctTokensLarge(buf, len, i, n, off, lenArr)
      } else i += 1
    }
    n
  }

  /** Long-operand continuation: the first `sorted` tokens in off/lenArr
    * are already sorted+distinct (handed over mid-scan by
    * [[distinctTokens]]); append the remaining raw tokens from
    * buf[from,len) unsorted, quicksort the whole index range, dedupe
    * adjacent in place. */
  private def distinctTokensLarge(buf: Array[Byte], len: Int, from: Int,
                                  sorted: Int, off0: Array[Int],
                                  lenArr0: Array[Int]): Int = {
    var off = off0; var lenArr = lenArr0
    var n = sorted
    var i = from
    while (i < len) {
      if (buf(i) != ' ') {
        val start = i
        while (i < len && buf(i) != ' ') i += 1
        if (n == off.length) { // grow (caller sized for len/2+1 tokens,
          // but the handoff path can see more via scratch reuse)
          off = java.util.Arrays.copyOf(off, n * 2)
          lenArr = java.util.Arrays.copyOf(lenArr, n * 2)
        }
        off(n) = start; lenArr(n) = i - start
        n += 1
      } else i += 1
    }
    quicksortTokens(buf, off, lenArr, 0, n - 1)
    // adjacent dedupe in place (comparator is a total order, so equal
    // tokens are adjacent after the sort)
    var w = 0
    var r = 1
    while (r < n) {
      if (compareTok(buf, off(w), lenArr(w), off(r), lenArr(r)) != 0) {
        w += 1
        off(w) = off(r); lenArr(w) = lenArr(r)
      }
      r += 1
    }
    if (off ne off0) { // hand results back in the caller's arrays if they
      // fit (they always do: caller sized to len/2+1 ≥ token count)
      System.arraycopy(off, 0, off0, 0, w + 1)
      System.arraycopy(lenArr, 0, lenArr0, 0, w + 1)
    }
    if (n == 0) 0 else w + 1
  }

  /** in-place dual-array quicksort of token indexes by token bytes
    * (median-of-three pivot, insertion sort below 12 elements). */
  private def quicksortTokens(buf: Array[Byte], off: Array[Int],
                              lenArr: Array[Int], lo0: Int, hi0: Int): Unit = {
    var lo = lo0; var hi = hi0
    while (lo < hi) {
      if (hi - lo < 12) {
        // insertion sort for small ranges
        var i = lo + 1
        while (i <= hi) {
          val o = off(i); val l = lenArr(i)
          var j = i - 1
          while (j >= lo && compareTok(buf, off(j), lenArr(j), o, l) > 0) {
            off(j + 1) = off(j); lenArr(j + 1) = lenArr(j); j -= 1
          }
          off(j + 1) = o; lenArr(j + 1) = l
          i += 1
        }
        return
      }
      // median-of-three pivot, moved to hi
      val mid = (lo + hi) >>> 1
      def swap(a: Int, b: Int): Unit = {
        val to = off(a); off(a) = off(b); off(b) = to
        val tl = lenArr(a); lenArr(a) = lenArr(b); lenArr(b) = tl
      }
      if (compareTok(buf, off(mid), lenArr(mid), off(lo), lenArr(lo)) < 0)
        swap(mid, lo)
      if (compareTok(buf, off(hi), lenArr(hi), off(lo), lenArr(lo)) < 0)
        swap(hi, lo)
      if (compareTok(buf, off(hi), lenArr(hi), off(mid), lenArr(mid)) < 0)
        swap(hi, mid)
      swap(mid, hi)
      val po = off(hi); val pl = lenArr(hi)
      var i = lo - 1
      var j = lo
      while (j < hi) {
        if (compareTok(buf, off(j), lenArr(j), po, pl) <= 0) {
          i += 1; swap(i, j)
        }
        j += 1
      }
      swap(i + 1, hi)
      val p = i + 1
      // recurse into the smaller half, loop on the larger (O(log t) stack)
      if (p - lo < hi - p) {
        quicksortTokens(buf, off, lenArr, lo, p - 1)
        lo = p + 1
      } else {
        quicksortTokens(buf, off, lenArr, p + 1, hi)
        hi = p - 1
      }
    }
  }

  def jaccardUTF8(a: UTF8String, b: UTF8String): Double = {
    // equal operands tokenize identically: |∩| = |∪| ⇒ 1.0 (and the
    // both-token-less convention is 1.0 as well) — one memcmp instead
    // of two tokenize+sort passes
    if (a.numBytes() == b.numBytes() && a.equals(b)) return 1.0
    val la = a.numBytes(); val lb = b.numBytes()
    val o = OperandBuffers.threadLocal.get()
    val ab = o.copyA(a); val bb = o.copyB(b)
    val s = scratch.get()
    s.ensureA(la / 2 + 1); s.ensureB(lb / 2 + 1)
    val na = distinctTokens(ab, la, s.offA, s.lenA)
    val nb = distinctTokens(bb, lb, s.offB, s.lenB)
    if (na == 0 && nb == 0) return 1.0
    // merge-intersect the two sorted distinct lists
    var inter = 0
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val c = compareAB(ab, s.offA(i), s.lenA(i), bb, s.offB(j), s.lenB(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** Token-set Jaccard as a codegen'd expression — same value as the
  * builtin split/distinct/intersect chain, one pass, allocation-free. */
case class TokenJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    TokenSets.jaccardUTF8(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.sim.TokenSets.jaccardUTF8($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenJaccardExpr =
    copy(left = newLeft, right = newRight)
}
