package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.classic.GraftBridge

/** Sequence-alignment similarity kernels — the last three entries of
  * the reference's 17-metric pg_similarity menu (docs distance.md):
  * Needleman-Wunsch, Smith-Waterman, Smith-Waterman-Gotoh. Quadratic
  * DPs over the char sequences, implemented as codegen'd Catalyst
  * expressions with two rolling rows of thread-local scratch (same
  * no-per-call-allocation discipline as the JaroWinkler kernel).
  * DuckDB has no alignment builtins, so the oracle mirror
  * ([[graft.OracleSql.alignmentOracle]]) evaluates the same DPs via an
  * anti-diagonal recursive CTE (bit-exact: all intermediates are
  * dyadic rationals); the kernels are additionally golden-tested in
  * AlignmentSpec.
  *
  * Conventions (documented, normalized to [0, 1]):
  *   - nw:  global alignment with unit indel cost and substitution
  *          cost 2 (an optimal alignment then never substitutes), so
  *          distance = |a| + |b| − 2·LCS(a,b);
  *          sim = 1 − d/(|a|+|b|) = 2·LCS/(|a|+|b|). Both empty → 1.
  *   - sw:  local alignment, match +2 / mismatch −1 / gap −1;
  *          sim = bestScore / (2·min(|a|,|b|)). Both empty → 1,
  *          one empty → 0.
  *   - swg: Gotoh affine gaps, match +2 / mismatch −1 / gap open −2 /
  *          gap extend −0.5; sim = bestScore / (2·min(|a|,|b|)).
  */
object Alignment {

  def nw(a: Column, b: Column): Column =
    GraftBridge.column(NeedlemanWunschExpr(
      GraftBridge.expr(a), GraftBridge.expr(b)))

  def sw(a: Column, b: Column): Column =
    GraftBridge.column(SmithWatermanExpr(
      GraftBridge.expr(a), GraftBridge.expr(b)))

  def swg(a: Column, b: Column): Column =
    GraftBridge.column(SmithWatermanGotohExpr(
      GraftBridge.expr(a), GraftBridge.expr(b)))

  // ---- kernels ----

  private val intRows = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](512)
  }
  private def intRow(n: Int): Array[Int] = {
    var r = intRows.get()
    if (r.length < n) { r = new Array[Int](n); intRows.set(r) }
    r
  }

  private val dblRows = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](1536)
  }
  private def dblRow(n: Int): Array[Double] = {
    var r = dblRows.get()
    if (r.length < n) { r = new Array[Double](n); dblRows.set(r) }
    r
  }

  /** LCS length via two rolling int rows (one shared scratch array,
    * first n+1 = previous row, next n+1 = current). */
  private def lcs(a: CharSequence, b: CharSequence): Int = {
    val (m, n) = (a.length, b.length)
    if (m == 0 || n == 0) return 0
    val buf = intRow(2 * (n + 1))
    java.util.Arrays.fill(buf, 0, 2 * (n + 1), 0)
    var prevOff = 0
    var curOff = n + 1
    var i = 1
    while (i <= m) {
      buf(curOff) = 0
      var j = 1
      while (j <= n) {
        buf(curOff + j) =
          if (a.charAt(i - 1) == b.charAt(j - 1)) buf(prevOff + j - 1) + 1
          else math.max(buf(prevOff + j), buf(curOff + j - 1))
        j += 1
      }
      val t = prevOff; prevOff = curOff; curOff = t
      i += 1
    }
    buf(prevOff + n)
  }

  def nwSim(au: UTF8String, bu: UTF8String): Double = {
    val a = au.toString; val b = bu.toString
    val (m, n) = (a.length, b.length)
    if (m == 0 && n == 0) return 1.0
    if (m == 0 || n == 0) return 0.0
    2.0 * lcs(a, b) / (m + n)
  }

  def swSim(au: UTF8String, bu: UTF8String): Double = {
    val a = au.toString; val b = bu.toString
    val (m, n) = (a.length, b.length)
    if (m == 0 && n == 0) return 1.0
    if (m == 0 || n == 0) return 0.0
    val buf = intRow(2 * (n + 1))
    java.util.Arrays.fill(buf, 0, 2 * (n + 1), 0)
    var prevOff = 0
    var curOff = n + 1
    var best = 0
    var i = 1
    while (i <= m) {
      buf(curOff) = 0
      var j = 1
      while (j <= n) {
        val diag = buf(prevOff + j - 1) +
          (if (a.charAt(i - 1) == b.charAt(j - 1)) 2 else -1)
        var v = if (diag > 0) diag else 0
        val up = buf(prevOff + j) - 1
        if (up > v) v = up
        val left = buf(curOff + j - 1) - 1
        if (left > v) v = left
        buf(curOff + j) = v
        if (v > best) best = v
        j += 1
      }
      val t = prevOff; prevOff = curOff; curOff = t
      i += 1
    }
    best.toDouble / (2.0 * math.min(m, n))
  }

  def swgSim(au: UTF8String, bu: UTF8String): Double = {
    val a = au.toString; val b = bu.toString
    val (m, n) = (a.length, b.length)
    if (m == 0 && n == 0) return 1.0
    if (m == 0 || n == 0) return 0.0
    val NegInf = -1e18
    // three rolling rows (H, E, F), each 2·(n+1) in one scratch buffer
    val buf = dblRow(6 * (n + 1))
    val hPrev0 = 0; val hCur0 = n + 1
    val ePrev0 = 2 * (n + 1); val eCur0 = 3 * (n + 1)
    val fPrev0 = 4 * (n + 1); val fCur0 = 5 * (n + 1)
    var j = 0
    while (j <= n) {
      buf(hPrev0 + j) = 0.0; buf(ePrev0 + j) = NegInf; buf(fPrev0 + j) = NegInf
      j += 1
    }
    var best = 0.0
    var i = 1
    while (i <= m) {
      buf(hCur0) = 0.0; buf(eCur0) = NegInf; buf(fCur0) = NegInf
      j = 1
      while (j <= n) {
        // E: gap in a (left), F: gap in b (up); open −2, extend −0.5
        val e = math.max(buf(hCur0 + j - 1) - 2.0, buf(eCur0 + j - 1) - 0.5)
        val f = math.max(buf(hPrev0 + j) - 2.0, buf(fPrev0 + j) - 0.5)
        val diag = buf(hPrev0 + j - 1) +
          (if (a.charAt(i - 1) == b.charAt(j - 1)) 2.0 else -1.0)
        var h = math.max(math.max(diag, math.max(e, f)), 0.0)
        buf(eCur0 + j) = e
        buf(fCur0 + j) = f
        buf(hCur0 + j) = h
        if (h > best) best = h
        j += 1
      }
      // roll: cur becomes prev
      System.arraycopy(buf, hCur0, buf, hPrev0, n + 1)
      System.arraycopy(buf, eCur0, buf, ePrev0, n + 1)
      System.arraycopy(buf, fCur0, buf, fPrev0, n + 1)
      i += 1
    }
    best / (2.0 * math.min(m, n))
  }
}

case class NeedlemanWunschExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    Alignment.nwSim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sim.Alignment.nwSim($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NeedlemanWunschExpr =
    copy(left = newLeft, right = newRight)
}

case class SmithWatermanExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    Alignment.swSim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sim.Alignment.swSim($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SmithWatermanExpr =
    copy(left = newLeft, right = newRight)
}

case class SmithWatermanGotohExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    Alignment.swgSim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sim.Alignment.swgSim($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SmithWatermanGotohExpr =
    copy(left = newLeft, right = newRight)
}
