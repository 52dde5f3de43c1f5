package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions._
import org.apache.spark.sql.classic.GraftBridge

/** String-similarity kernels for the distance stage (reference M1:
  * oagdedupe db/postgres/orm.py:64-96 — Jaro-Winkler via the
  * pg_similarity C extension, funcs.py:12-21).
  *
  * Jaro-Winkler here is the standard algorithm (prefix scale p = 0.1,
  * max prefix 4, boost threshold 0.7) — pinned by golden tests to the
  * values DuckDB's `jaro_winkler_similarity` produces, because DuckDB is
  * the correctness oracle.
  */
object JaroWinkler {

  /** per-thread scratch (match flags) — the kernel runs millions of
    * times per task; per-call allocation would dominate via GC at high
    * core counts. */
  private val scratch = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](256)
  }
  private def flags(n: Int): Array[Boolean] = {
    var a = scratch.get()
    if (a.length < n) { a = new Array[Boolean](n); scratch.set(a) }
    else java.util.Arrays.fill(a, 0, n, false)
    a
  }

  /** Core kernel over byte sequences (exact for ASCII; callers pass
    * code-point arrays for non-ASCII). matched1/matched2 share one
    * scratch array (first len1 slots + next len2 slots).
    */
  private def jaroBytes(s1: Array[Byte], len1: Int,
                        s2: Array[Byte], len2: Int): Double = {
    // DuckDB (the oracle) returns 0 when EITHER side is empty
    if (len1 == 0 || len2 == 0) return 0.0
    // long strings take the bit-parallel matching phase (identical
    // greedy lowest-index semantics, word ops instead of a byte scan);
    // short ones keep the plain scan — its setup-free inner loop wins
    // below ~32 chars, and head/role fields live there
    if (math.max(len1, len2) > 32) return jaroBits(s1, len1, s2, len2)
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val f = flags(len1 + len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!f(len1 + j) && s1(i) == s2(j)) {
          f(i) = true; f(len1 + j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (f(i)) {
        while (!f(len1 + k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    // DuckDB counts transposition pairs with INTEGER division (an odd
    // trailing mismatch is dropped) — pinned bit-exact on 8000 random
    // cases against jaro_winkler_similarity
    val mt = t / 2
    (m.toDouble / len1 + m.toDouble / len2 + (m - mt).toDouble / m) / 3.0
  }

  /** per-thread scratch for [[jaroBits]]: per-char position bitmasks
    * of s2 (128 ASCII chars × W 64-bit blocks, flattened) plus the
    * matched-position mask. Peq rows carry a per-call GENERATION stamp
    * (`gen(c) == cur` ⇔ row c was written by THIS call): a stale row
    * is treated as all-zero and lazily zeroed on first write, which
    * removes both full zeroing passes the round-5 kernel paid per call
    * (pre-clear + post-clear, ~2·len2·W word writes per pair) and lets
    * the matching loop skip s1 chars absent from s2 entirely. */
  private final class BitScratch {
    var w: Int = 0
    var peq: Array[Long] = null
    var matched: Array[Long] = null
    val gen: Array[Long] = new Array[Long](128)
    var cur: Long = 0L
    def ensure(wNeed: Int): Unit = if (wNeed > w) {
      w = wNeed
      peq = new Array[Long](128 * wNeed)
      matched = new Array[Long](wNeed)
      java.util.Arrays.fill(gen, 0L)
      cur = 0L
    }
  }
  private val bitScratch = new ThreadLocal[BitScratch] {
    override def initialValue(): BitScratch = new BitScratch
  }

  /** Jaro with the MATCHING phase bit-parallel: candidate positions
    * for s1(i) are `Peq2[c] & ~matched & windowMask(i)`, and the
    * greedy lowest-index match is the lowest set bit — O(W) word ops
    * per character instead of an O(window) byte scan (window ≈ the
    * whole other string for Jaro's max/2−1 definition). Semantics are
    * EXACTLY [[jaroBytes]]'s scan: first unmatched occurrence within
    * the inclusive [i−window, i+window] band, integer-division
    * transposition pairs — the equivalence is spec-pinned against the
    * scalar kernel across the 32/64/128-char boundaries.
    */
  private def jaroBits(s1: Array[Byte], len1: Int,
                       s2: Array[Byte], len2: Int): Double = {
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val w2 = (len2 + 63) >> 6
    val s = bitScratch.get(); s.ensure(w2)
    val peq = s.peq; val matched = s.matched; val gen = s.gen
    s.cur += 1
    val g = s.cur
    var j = 0
    while (j < len2) {
      val c = s2(j)
      if (gen(c) != g) { // first touch this call: lazy-zero the row
        java.util.Arrays.fill(peq, c * w2, c * w2 + w2, 0L)
        gen(c) = g
      }
      peq(c * w2 + (j >> 6)) |= 1L << (j & 63); j += 1
    }
    java.util.Arrays.fill(matched, 0, w2, 0L)
    val f = flags(len1) // s1-side matched booleans only
    var m = 0
    var i = 0
    while (i < len1) {
      // stale generation ⇔ s1(i) does not occur in s2 at all — no
      // candidate positions, skip the band walk outright
      if (gen(s1(i)) == g) {
        val lo = math.max(0, i - window)
        val hi = math.min(len2 - 1, i + window)
        if (lo <= hi) {
          val c = s1(i) * w2
          val bLo = lo >> 6; val bHi = hi >> 6
          var b = bLo
          var done = false
          while (b <= bHi && !done) {
            var mask = peq(c + b) & ~matched(b)
            if (b == bLo) mask &= -1L << (lo & 63)
            if (b == bHi) mask &= -1L >>> (63 - (hi & 63))
            if (mask != 0L) {
              matched(b) |= mask & -mask // lowest set bit = lowest j
              f(i) = true; m += 1; done = true
            }
            b += 1
          }
        }
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: pair matched s1 chars (ascending i) with matched
    // s2 positions (ascending bit order) — same walk as the scalar
    var t = 0
    var b = 0
    var cur = matched(0)
    i = 0
    while (i < len1) {
      if (f(i)) {
        while (cur == 0L) { b += 1; cur = matched(b) }
        val k = (b << 6) + java.lang.Long.numberOfTrailingZeros(cur)
        cur &= cur - 1
        if (s1(i) != s2(k)) t += 1
      }
      i += 1
    }
    val mt = t / 2
    (m.toDouble / len1 + m.toDouble / len2 + (m - mt).toDouble / m) / 3.0
  }

  private def winkler(j: Double, s1: Array[Byte], len1: Int,
                      s2: Array[Byte], len2: Int): Double = {
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(len1, len2))
    while (l < maxL && s1(l) == s2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Zero-copy path over Spark's UTF8String (ASCII fast path; general
    * code points fall back to a per-char byte-widening copy which is
    * still allocation-light). */
  // operand copies go through the kernels' shared thread-local
  // buffers — see [[OperandBuffers]] for why getBytes is off-limits
  // on this path
  import OperandBuffers.isAscii

  def jaroWinklerUTF8(a: UTF8String, b: UTF8String): Double = {
    // equal operands: jaro = (1+1+1)/3 = 1.0 exactly, winkler(1.0) =
    // 1.0 — EXCEPT the both-empty case, where the kernel (like DuckDB)
    // returns 0.0. Identical strings are structurally common in this
    // domain (role_seq is a deterministic function of the turn count),
    // and the byte-equality check is one early-exit memcmp vs a full
    // matching scan.
    val la = a.numBytes(); val lb = b.numBytes()
    if (la == lb && a.equals(b)) return if (la == 0) 0.0 else 1.0
    val o = OperandBuffers.threadLocal.get()
    val ab = o.copyA(a); val bb = o.copyB(b)
    if (isAscii(ab, la) && isAscii(bb, lb))
      winkler(jaroBytes(ab, la, bb, lb), ab, la, bb, lb)
    else jaroWinkler(a.toString, b.toString)
  }

  /** Plain Jaro over UTF8String (same kernel, no Winkler boost). */
  def jaroUTF8(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes(); val lb = b.numBytes()
    if (la == lb && a.equals(b)) return if (la == 0) 0.0 else 1.0
    val o = OperandBuffers.threadLocal.get()
    val ab = o.copyA(a); val bb = o.copyB(b)
    if (isAscii(ab, la) && isAscii(bb, lb)) jaroBytes(ab, la, bb, lb)
    else jaro(a.toString, b.toString)
  }

  /** general kernel over char sequences (identical logic; used for
    * non-ASCII input). */
  private def jaroChars(s1: String, s2: String): Double = {
    val len1 = s1.length; val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val f = flags(len1 + len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!f(len1 + j) && s1.charAt(i) == s2.charAt(j)) {
          f(i) = true; f(len1 + j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (f(i)) {
        while (!f(len1 + k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mt = t / 2
    (m.toDouble / len1 + m.toDouble / len2 + (m - mt).toDouble / m) / 3.0
  }

  def jaro(s1: String, s2: String): Double = jaroChars(s1, s2)

  /** Winkler boost: applied only when jaro > 0.7 (DuckDB semantics). */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaroChars(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(s1.length, s2.length))
    while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** Native Catalyst expression with codegen — keeps the distance stage
  * inside whole-stage codegen instead of a deserializing Scala UDF.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.jaroWinklerUTF8(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.sim.JaroWinkler.jaroWinklerUTF8($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** Plain Jaro (no Winkler prefix boost) — same codegen'd kernel. */
case class JaroExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.jaroUTF8(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.sim.JaroWinkler.jaroUTF8($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroExpr =
    copy(left = newLeft, right = newRight)
}

object Similarity {

  /** Jaro-Winkler similarity as a Column (codegen'd expression). */
  def jw(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerExpr(GraftBridge.expr(a), GraftBridge.expr(b)))

  /** Exact Levenshtein distance as a Column — [[LevenshteinExpr]]'s
    * bit-parallel kernel, same value as the builtin `levenshtein`
    * at ~1/15th the work on this corpus's field lengths. */
  def levDistance(a: Column, b: Column): Column =
    GraftBridge.column(LevenshteinExpr(GraftBridge.expr(a), GraftBridge.expr(b)))

  /** Normalized Levenshtein similarity in [0,1] — exact integer
    * distance over max length, exact across engines (the DuckDB
    * mirror uses its builtin `levenshtein`; same classic definition).
    */
  def levSim(a: Column, b: Column): Column =
    when(length(a) === 0 && length(b) === 0, lit(1.0))
      .otherwise(lit(1.0) -
        levDistance(a, b).cast("double") /
          greatest(length(a), length(b)).cast("double"))

  /** Token-set Jaccard over whitespace tokens — pure builtins. */
  def tokenJaccard(a: Column, b: Column): Column =
    GraftBridge.column(TokenJaccardExpr(GraftBridge.expr(a), GraftBridge.expr(b)))

  /** the builtin-chain formulation tokenJaccard used to be — kept as
    * the independent reference the kernel is spec-pinned against. */
  private[sim] def tokenJaccardBuiltin(a: Column, b: Column): Column = {
    val ta = array_distinct(filter(split(a, " "), w => w =!= ""))
    val tb = array_distinct(filter(split(b, " "), w => w =!= ""))
    val inter = size(array_intersect(ta, tb)).cast("double")
    val uni = size(array_union(ta, tb)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  // ---- token-set coefficient family (pg_similarity menu relatives:
  //      jaccard / dice / overlap / cosine, docs distance.md) ----
  // Conventions shared with tokenJaccard: both sides token-less → 1.0
  // (two empty strings are identical); exactly one side token-less →
  // 0.0 for the coefficients whose denominator vanishes.

  private def tokenSet(x: Column): Column =
    array_distinct(filter(split(x, " "), w => w =!= ""))

  private def setCoefficient(a: Column, b: Column)
                            (coeff: (Column, Column, Column) => Column): Column = {
    val (ta, tb) = (tokenSet(a), tokenSet(b))
    val (na, nb) = (size(ta).cast("double"), size(tb).cast("double"))
    val inter = size(array_intersect(ta, tb)).cast("double")
    when(na === 0 && nb === 0, lit(1.0))
      .when(na === 0 || nb === 0, lit(0.0))
      .otherwise(coeff(inter, na, nb))
  }

  /** Sørensen–Dice: 2|∩| / (|A| + |B|). */
  def tokenDice(a: Column, b: Column): Column =
    setCoefficient(a, b)((i, na, nb) => i * 2.0 / (na + nb))

  /** Overlap coefficient: |∩| / min(|A|, |B|). */
  def tokenOverlap(a: Column, b: Column): Column =
    setCoefficient(a, b)((i, na, nb) => i / least(na, nb))

  /** Token-set cosine (Ochiai): |∩| / sqrt(|A|·|B|). */
  def tokenCosine(a: Column, b: Column): Column =
    setCoefficient(a, b)((i, na, nb) => i / sqrt(na * nb))

  /** Hamming similarity (pg_similarity menu): defined only for
    * equal-length strings — 1 − mismatches/len; unequal lengths → 0.0;
    * two empties → 1.0. Char-wise zip over builtins.
    */
  def hammingSim(a: Column, b: Column): Column = {
    val mism = size(filter(
      zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y),
      m => m))
    when(length(a) === 0 && length(b) === 0, lit(1.0))
      .when(length(a) =!= length(b), lit(0.0))
      .otherwise(lit(1.0) - mism.cast("double") / length(a).cast("double"))
  }

  /** DuckDB SQL mirrors (same rounding applied at the call site). */
  def levSimSql(a: String, b: String): String =
    s"CASE WHEN length($a) = 0 AND length($b) = 0 THEN 1.0 " +
      s"ELSE 1.0 - CAST(levenshtein($a, $b) AS DOUBLE) / " +
      s"greatest(length($a), length($b)) END"

  def jwSql(a: String, b: String): String =
    s"jaro_winkler_similarity($a, $b)"

  private def tokenSetSql(x: String): String =
    s"list_distinct(list_filter(string_split($x, ' '), w -> w != ''))"

  private def setCoefficientSql(a: String, b: String, coeff: String): String =
    s"""CASE
       |  WHEN length(${tokenSetSql(a)}) = 0 AND length(${tokenSetSql(b)}) = 0 THEN 1.0
       |  WHEN length(${tokenSetSql(a)}) = 0 OR length(${tokenSetSql(b)}) = 0 THEN 0.0
       |  ELSE $coeff END""".stripMargin

  private def interSql(a: String, b: String): String =
    s"CAST(length(list_intersect(${tokenSetSql(a)}, ${tokenSetSql(b)})) AS DOUBLE)"
  private def nSql(x: String): String =
    s"CAST(length(${tokenSetSql(x)}) AS DOUBLE)"

  def tokenJaccardSql(a: String, b: String): String =
    setCoefficientSql(a, b,
      s"${interSql(a, b)} / CAST(length(list_distinct(list_concat(" +
        s"${tokenSetSql(a)}, ${tokenSetSql(b)}))) AS DOUBLE)")

  def tokenDiceSql(a: String, b: String): String =
    setCoefficientSql(a, b,
      s"${interSql(a, b)} * 2.0 / (${nSql(a)} + ${nSql(b)})")

  def tokenOverlapSql(a: String, b: String): String =
    setCoefficientSql(a, b,
      s"${interSql(a, b)} / least(${nSql(a)}, ${nSql(b)})")

  def tokenCosineSql(a: String, b: String): String =
    setCoefficientSql(a, b,
      s"${interSql(a, b)} / sqrt(${nSql(a)} * ${nSql(b)})")

  def hammingSimSql(a: String, b: String): String =
    s"""CASE WHEN length($a) = 0 AND length($b) = 0 THEN 1.0
       |  WHEN length($a) != length($b) THEN 0.0
       |  ELSE 1.0 - CAST(length(list_filter(range(1, length($a) + 1),
       |    i -> substring($a, i, 1) != substring($b, i, 1))) AS DOUBLE) /
       |    length($a) END""".stripMargin

  // ---- pg_similarity menu, long tail (docs distance.md lists 17
  //      metrics; conventions documented per metric, every one
  //      mirrored in DuckDB SQL below) ----

  /** Plain Jaro similarity (codegen'd kernel, no Winkler boost) —
    * DuckDB mirror: jaro_similarity. */
  def jaroSim(a: Column, b: Column): Column =
    GraftBridge.column(JaroExpr(GraftBridge.expr(a), GraftBridge.expr(b)))

  def jaroSimSql(a: String, b: String): String =
    s"jaro_similarity($a, $b)"

  private def toks(x: Column): Column =
    filter(split(x, " "), w => w =!= "")

  private def toksSql(x: String): String =
    s"list_filter(string_split($x, ' '), w -> w != '')"

  /** Monge-Elkan: mean over a's tokens of the best Jaro-Winkler match
    * in b's tokens (the classic asymmetric form). Both token-less →
    * 1.0; exactly one token-less → 0.0. */
  def mongeElkan(a: Column, b: Column): Column = {
    val (ta, tb) = (toks(a), toks(b))
    val best = transform(ta, w => array_max(transform(tb, v => jw(w, v))))
    when(size(ta) === 0 && size(tb) === 0, lit(1.0))
      .when(size(ta) === 0 || size(tb) === 0, lit(0.0))
      .otherwise(
        aggregate(best, lit(0.0d), (acc, x) => acc + x) /
          size(ta).cast("double"))
  }

  def mongeElkanSql(a: String, b: String): String =
    s"""CASE WHEN length(${toksSql(a)}) = 0 AND length(${toksSql(b)}) = 0 THEN 1.0
       |  WHEN length(${toksSql(a)}) = 0 OR length(${toksSql(b)}) = 0 THEN 0.0
       |  ELSE list_sum(list_transform(${toksSql(a)},
       |    w -> list_max(list_transform(${toksSql(b)},
       |      v -> jaro_winkler_similarity(w, v))))) /
       |    length(${toksSql(a)}) END""".stripMargin

  /** Matching coefficient: |A∩B| / max(|A|,|B|) over token sets. */
  def tokenMatching(a: Column, b: Column): Column =
    setCoefficient(a, b)((i, na, nb) => i / greatest(na, nb))

  def tokenMatchingSql(a: String, b: String): String =
    setCoefficientSql(a, b,
      s"${interSql(a, b)} / greatest(${nSql(a)}, ${nSql(b)})")

  /** L1 / city-block ("block" in pg_similarity) over token-FREQUENCY
    * vectors: sim = 1 − Σ_t |cnt_a(t) − cnt_b(t)| / (n_a + n_b).
    * Integer counts → exact across engines. Both token-less → 1.0. */
  def l1Sim(a: Column, b: Column): Column = {
    val (ta, tb) = (toks(a), toks(b))
    val u = array_distinct(concat(ta, tb))
    val d = aggregate(
      transform(u, t =>
        abs(size(filter(ta, w => w === t)) - size(filter(tb, w => w === t)))),
      lit(0), (acc, x) => acc + x)
    val n = size(ta) + size(tb)
    when(n === 0, lit(1.0))
      .otherwise(lit(1.0) - d.cast("double") / n.cast("double"))
  }

  def l1SimSql(a: String, b: String): String = {
    val (ta, tb) = (toksSql(a), toksSql(b))
    s"""CASE WHEN length($ta) + length($tb) = 0 THEN 1.0
       |  ELSE 1.0 - CAST(list_sum(list_transform(
       |    list_distinct(list_concat($ta, $tb)),
       |    t -> abs(length(list_filter($ta, w -> w = t)) -
       |             length(list_filter($tb, w -> w = t))))) AS DOUBLE) /
       |    (length($ta) + length($tb)) END""".stripMargin
  }

  /** Euclidean over the same token-frequency vectors, squashed to
    * (0, 1]: sim = 1 / (1 + ‖cnt_a − cnt_b‖₂). Integer squares summed
    * exactly; one IEEE sqrt both engines share. */
  def euclideanSim(a: Column, b: Column): Column = {
    val (ta, tb) = (toks(a), toks(b))
    val u = array_distinct(concat(ta, tb))
    val d2 = aggregate(
      transform(u, t => {
        val diff = size(filter(ta, w => w === t)) -
          size(filter(tb, w => w === t))
        diff * diff
      }),
      lit(0), (acc, x) => acc + x)
    lit(1.0) / (lit(1.0) + sqrt(d2.cast("double")))
  }

  def euclideanSimSql(a: String, b: String): String = {
    val (ta, tb) = (toksSql(a), toksSql(b))
    s"""1.0 / (1.0 + sqrt(CAST(coalesce(list_sum(list_transform(
       |  list_distinct(list_concat($ta, $tb)),
       |  t -> (length(list_filter($ta, w -> w = t)) -
       |        length(list_filter($tb, w -> w = t))) *
       |       (length(list_filter($ta, w -> w = t)) -
       |        length(list_filter($tb, w -> w = t))))), 0) AS DOUBLE)))""".stripMargin
  }

  /** Q-gram distance over char-trigram MULTISETS:
    * sim = 1 − Σ_g |cnt_a(g) − cnt_b(g)| / (n_a + n_b). Strings shorter
    * than 3 chars have zero trigrams; both gram-less → 1.0. */
  def qgramSim(a: Column, b: Column): Column = {
    def grams(x: Column): Column =
      when(length(x) >= 3,
        transform(sequence(lit(1), length(x) - 2), i => x.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))
    val (ga, gb) = (grams(a), grams(b))
    val u = array_distinct(concat(ga, gb))
    val d = aggregate(
      transform(u, t =>
        abs(size(filter(ga, w => w === t)) - size(filter(gb, w => w === t)))),
      lit(0), (acc, x) => acc + x)
    val n = size(ga) + size(gb)
    when(n === 0, lit(1.0))
      .otherwise(lit(1.0) - d.cast("double") / n.cast("double"))
  }

  def qgramSimSql(a: String, b: String): String = {
    def grams(x: String) =
      s"[substring($x, i, 3) FOR i IN range(1, greatest(length($x) - 1, 1))]"
    val (ga, gb) = (grams(a), grams(b))
    s"""CASE WHEN length($ga) + length($gb) = 0 THEN 1.0
       |  ELSE 1.0 - CAST(list_sum(list_transform(
       |    list_distinct(list_concat($ga, $gb)),
       |    t -> abs(length(list_filter($ga, w -> w = t)) -
       |             length(list_filter($gb, w -> w = t))))) AS DOUBLE) /
       |    (length($ga) + length($gb)) END""".stripMargin
  }

  /** Simplified American Soundex (H/W treated like vowels rather than
    * skip-through — deviation documented; IDENTICAL formula on both
    * engines, which is what the oracle checks): first letter + the
    * first 3 non-zero digit codes after collapsing adjacent repeats,
    * zero-padded. sim = 1.0 iff the codes match ('' == '' for
    * letter-less strings → 1.0). Pure builtins — no UDF. The
    * adjacent-repeat collapse uses a positional filter (keep char i iff
    * i = 1 or char i ≠ char i−1), NOT a regex backreference: DuckDB's
    * RE2 engine has no backreferences and fails to match them
    * SILENTLY, which skewed the oracle until this was caught at
    * sf0.01. */
  private val SoundexDigits = "01230120022455012623010202"

  def soundexSim(a: Column, b: Column): Column = {
    def code(x: Column): Column = {
      val letters = regexp_replace(upper(x), "[^A-Z]", "")
      val mapped = translate(letters,
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", SoundexDigits)
      val keep = filter(sequence(lit(1), length(mapped)),
        i => (i === 1) ||
          (mapped.substr(i, lit(1)) =!= mapped.substr(i - 1, lit(1))))
      val collapsed = array_join(
        transform(keep, i => mapped.substr(i, lit(1))), "")
      val tail = regexp_replace(
        collapsed.substr(lit(2), length(collapsed)), "0", "")
      when(letters === "", lit(""))
        .otherwise(concat(letters.substr(1, 1),
          rpad(tail.substr(lit(1), lit(3)), 3, "0")))
    }
    when(code(a) === code(b), lit(1.0)).otherwise(lit(0.0))
  }

  def soundexSimSql(a: String, b: String): String = {
    def code(x: String): String = {
      val letters = s"regexp_replace(upper($x), '[^A-Z]', '', 'g')"
      val mapped = s"translate($letters, " +
        s"'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '$SoundexDigits')"
      val collapsed = s"array_to_string([($mapped)[i] " +
        s"FOR i IN range(1, length($mapped) + 1) " +
        s"IF i = 1 OR ($mapped)[i] != ($mapped)[i - 1]], '')"
      val tail = s"replace(substring($collapsed, 2), '0', '')"
      s"(CASE WHEN $letters = '' THEN '' ELSE " +
        s"substring($letters, 1, 1) || rpad(substring($tail, 1, 3), 3, '0') " +
        s"END)"
    }
    s"CASE WHEN ${code(a)} = ${code(b)} THEN 1.0 ELSE 0.0 END"
  }
}
