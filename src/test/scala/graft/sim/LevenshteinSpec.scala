package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSuite

/** The bit-parallel Levenshtein kernel must be bit-identical to the
  * classic DP / Spark's builtin on EVERY input — it feeds the scored
  * feature the DuckDB oracle hash-compares (q10/q37/q47). */
class LevenshteinSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** trusted reference: classic two-row DP over code points. */
  private def classicDp(a: String, b: String): Int = {
    val s = a.codePoints().toArray; val t = b.codePoints().toArray
    var prev = Array.tabulate(t.length + 1)(identity)
    var cur = new Array[Int](t.length + 1)
    var i = 1
    while (i <= s.length) {
      cur(0) = i
      var j = 1
      while (j <= t.length) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(t.length)
  }

  private def fast(a: String, b: String): Int =
    Levenshtein.distanceUTF8(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("matches the classic DP on edges and block boundaries") {
    val cases = Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("a", "a"), ("a", "b"),
      ("kitten", "sitting"), ("flaw", "lawn"),
      // pattern lengths crossing the 64-bit block boundaries
      ("x" * 63, "x" * 63 + "y"), ("x" * 64, "x" * 64),
      ("x" * 64, "y" + "x" * 64), ("x" * 65, "x" * 64),
      ("ab" * 64, "ba" * 64), ("x" * 128, "x" * 129),
      ("x" * 129, "y" * 129), ("x" * 191, "x" * 193),
      (("abcd" * 131).take(524), ("abce" * 131).take(524)))
    cases.foreach { case (a, b) =>
      assert(fast(a, b) == classicDp(a, b), s"($a, $b)")
      assert(fast(b, a) == classicDp(a, b), s"swap ($a, $b)")
    }
  }

  test("matches the classic DP on 2000 random pairs (seeded)") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnop ",
      "aàbβc日本") // incl. non-ASCII (fallback path)
    (0 until 2000).foreach { k =>
      val alpha = alphabets(k % alphabets.size)
      def mk(maxLen: Int) = {
        val n = rnd.nextInt(maxLen)
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val (a, b) = (mk(200), mk(200))
      assert(fast(a, b) == classicDp(a, b),
        s"len ${a.length}/${b.length} alpha=$alpha a=$a b=$b")
    }
  }

  test("LevenshteinExpr equals the builtin levenshtein column") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { _ =>
      def mk = (0 until rnd.nextInt(150)).map(_ =>
        "abd日é".charAt(rnd.nextInt(5))).mkString
      (mk, mk)
    } :+ (("", "")) :+ (("x" * 200, "y" * 200))
    val df = rows.toDF("a", "b")
    val bad = df.select(
      Similarity.levDistance(col("a"), col("b")).as("fast"),
      levenshtein(col("a"), col("b")).as("builtin"))
      .filter(col("fast") =!= col("builtin"))
    assert(bad.count() == 0)
  }
}
