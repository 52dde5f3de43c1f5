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

  /** tokenize buf[0,len) on 0x20, insertion-sort token indexes,
    * dedupe adjacent; returns the distinct count with off/lenArr
    * holding the sorted distinct tokens. */
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
      } else i += 1
    }
    n
  }

  def jaccardUTF8(a: UTF8String, b: UTF8String): Double = {
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
