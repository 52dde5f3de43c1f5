package graft.sim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel Levenshtein distance (Myers 1999, Hyyrö's block
  * formulation) — EXACT edit distance, bit-identical to Spark's
  * builtin `levenshtein` / `UTF8String.levenshteinDistance`, at
  * ~1/15th the work on this corpus's field lengths: the classic DP
  * touches m·n cells (full_text ≈ 131 chars avg → ~17k cells/pair),
  * the bit-vector form does n·⌈m/64⌉ word-steps (~400). The scoring
  * kernel runs this millions of times per task, so the win lands
  * directly on the headline pairs/sec (reference similarity stage:
  * oagdedupe db/postgres/orm.py:64-96 scores every candidate pair).
  *
  * ASCII fast path over UTF8String bytes (bytes == code points);
  * any non-ASCII operand falls back to the builtin's own
  * `levenshteinDistance`, so the value is the builtin's by
  * construction on every input. DuckDB's `levenshtein` mirrors the
  * same classic definition — the oracle compare stays exact.
  *
  * Algorithm notes (single block, pattern length m ≤ 64): Pv/Mv hold
  * the vertical +1/−1 deltas of the current DP column; per text char
  * the Xh/Ph/Mh recurrence advances one column in O(1) word ops, and
  * the score (D[m][j]) is tracked via the bit at position m−1. The
  * multi-block path chains the same step through ⌈m/64⌉ words with a
  * horizontal carry (hin/hout ∈ {−1,0,+1}); carries in the `(Eq & Pv)
  * + Pv` addition propagate low→high only, so the garbage bits above
  * m−1 in the last partial block never contaminate tracked rows.
  */
object Levenshtein {

  /** per-thread DP scratch: Peq (128 ASCII chars × W blocks,
    * flattened) + Pv + Mv for the multi-block path; operand copies go
    * through the kernels' shared [[OperandBuffers]] (see there for
    * why getBytes is off-limits on this path). The kernel runs
    * allocation-free after warm-up. */
  /** Peq rows carry a per-call generation stamp (same scheme as
    * JaroWinkler.BitScratch): `gen(c) == cur` ⇔ row c was written by
    * THIS call; stale rows read as all-zero and are lazily zeroed on
    * first write — no pre-clear or post-clear pass. Safe across the
    * stride-1 / stride-W layouts because a row is only ever trusted
    * when stamped by the current call. */
  private final class Scratch {
    var w: Int = 0
    var peq: Array[Long] = null
    var pv: Array[Long] = null
    var mv: Array[Long] = null
    val gen: Array[Long] = new Array[Long](128)
    var cur: Long = 0L
    def ensure(wNeed: Int): Unit = if (wNeed > w) {
      w = wNeed
      peq = new Array[Long](128 * wNeed)
      pv = new Array[Long](wNeed)
      mv = new Array[Long](wNeed)
      java.util.Arrays.fill(gen, 0L)
      cur = 0L
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }
  import OperandBuffers.isAscii

  def distanceUTF8(a: UTF8String, b: UTF8String): Int = {
    val la = a.numBytes(); val lb = b.numBytes()
    if (la == 0 || lb == 0) {
      // distance to empty = other's LENGTH in code points
      if (la == 0 && lb == 0) 0
      else if (la == 0) b.numChars()
      else a.numChars()
    } else if (a.equals(b)) 0
    else {
      val o = OperandBuffers.threadLocal.get()
      val ab = o.copyA(a); val bb = o.copyB(b)
      if (isAscii(ab, la) && isAscii(bb, lb)) {
        // strip the common prefix and suffix first — unit-cost edit
        // distance is invariant under both (classic identity; the
        // builtin does the same trim), every stripped byte is a DP
        // column avoided, and a pattern shortened under 64 chars drops
        // from the 3-block chain to the all-registers single block.
        // Byte-wise is exact here: both operands are pure ASCII.
        val minLen = math.min(la, lb)
        var pre = 0
        while (pre < minLen && ab(pre) == bb(pre)) pre += 1
        var suf = 0
        while (suf < minLen - pre &&
          ab(la - 1 - suf) == bb(lb - 1 - suf)) suf += 1
        val ma = la - pre - suf; val mb = lb - pre - suf
        if (ma == 0) mb
        else if (mb == 0) ma
        else if (ma <= mb) distanceAscii(ab, pre, ma, bb, pre, mb)
        else distanceAscii(bb, pre, mb, ab, pre, ma)
      } else a.levenshteinDistance(b)
    }
  }

  /** pattern p[po, po+m) (m ≤ n), single-block or chained. */
  private def distanceAscii(p: Array[Byte], po: Int, m: Int,
                            t: Array[Byte], to: Int, n: Int): Int =
    if (m <= 64) distance1(p, po, m, t, to, n)
    else distanceW(p, po, m, t, to, n)

  /** m ≤ 64: all state in registers, Peq in a local 128-slot table. */
  private def distance1(p: Array[Byte], po: Int, m: Int,
                        t: Array[Byte], to: Int, n: Int): Int = {
    val s = scratch.get(); s.ensure(1)
    val peq = s.peq; val gen = s.gen
    s.cur += 1
    val g = s.cur
    var i = 0
    while (i < m) {
      val c = p(po + i)
      if (gen(c) != g) { peq(c) = 0L; gen(c) = g }
      peq(c) |= 1L << i; i += 1
    }
    val last = 1L << (m - 1)
    var pvv = -1L; var mvv = 0L
    var score = m
    var j = 0
    while (j < n) {
      val tc = t(to + j)
      val eq = if (gen(tc) == g) peq(tc) else 0L
      val xv = eq | mvv
      val xh = (((eq & pvv) + pvv) ^ pvv) | eq
      var ph = mvv | ~(xh | pvv)
      var mh = pvv & xh
      if ((ph & last) != 0L) score += 1
      else if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pvv = mh | ~(xv | ph)
      mvv = ph & xv
      j += 1
    }
    score
  }

  /** m > 64: W = ⌈m/64⌉ blocks, horizontal carry chained low→high;
    * score tracked at bit (m−1) mod 64 of the last block. */
  private def distanceW(p: Array[Byte], po: Int, m: Int,
                        t: Array[Byte], to: Int, n: Int): Int = {
    val w = (m + 63) >> 6
    val s = scratch.get(); s.ensure(w)
    val peq = s.peq; val pv = s.pv; val mv = s.mv; val gen = s.gen
    s.cur += 1
    val g = s.cur
    var i = 0
    while (i < m) {
      val c = p(po + i)
      if (gen(c) != g) { // first touch this call: lazy-zero the row
        java.util.Arrays.fill(peq, c * w, c * w + w, 0L)
        gen(c) = g
      }
      peq(c * w + (i >> 6)) |= 1L << (i & 63); i += 1
    }
    i = 0
    while (i < w) { pv(i) = -1L; mv(i) = 0L; i += 1 }
    val lastBlock = w - 1
    val lastMask = 1L << ((m - 1) & 63)
    var score = m
    var j = 0
    while (j < n) {
      val tc = t(to + j)
      // stale row ⇔ text char absent from the pattern: Eq = 0 for
      // every block (the recurrence still advances)
      val c = if (gen(tc) == g) tc * w else -1
      var hin = 1 // row-0 boundary: D[0][j] − D[0][j−1] = +1
      i = 0
      while (i < w) {
        var eq = if (c >= 0) peq(c + i) else 0L
        val pvi = pv(i); val mvi = mv(i)
        val xv = eq | mvi
        if (hin < 0) eq |= 1L
        val xh = (((eq & pvi) + pvi) ^ pvi) | eq
        var ph = mvi | ~(xh | pvi)
        var mh = pvi & xh
        if (i == lastBlock) {
          if ((ph & lastMask) != 0L) score += 1
          else if ((mh & lastMask) != 0L) score -= 1
        }
        val hout = (if ((ph & Long.MinValue) != 0L) 1 else 0) -
          (if ((mh & Long.MinValue) != 0L) 1 else 0)
        ph = ph << 1
        mh = mh << 1
        if (hin > 0) ph |= 1L
        else if (hin < 0) mh |= 1L
        pv(i) = mh | ~(xv | ph)
        mv(i) = ph & xv
        hin = hout
        i += 1
      }
      j += 1
    }
    score
  }
}

/** Exact Levenshtein distance as a codegen'd expression — same value
  * as the builtin `levenshtein`, bit-parallel kernel. */
case class LevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    Levenshtein.distanceUTF8(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.sim.Levenshtein.distanceUTF8($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinExpr =
    copy(left = newLeft, right = newRight)
}
