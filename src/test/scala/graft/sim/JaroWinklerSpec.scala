package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** Golden values pinned to DuckDB 1.0.0 `jaro_winkler_similarity`
  * (the correctness oracle; probed 2026-08-16): standard Jaro-Winkler,
  * prefix scale 0.1, max prefix 4, boost threshold 0.7 — same family as
  * the reference's pg_similarity C implementation (orm.py:70-74).
  */
class JaroWinklerSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val golden = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0), // DuckDB: either side empty → 0
    ("bca", "adbcec", 0.7222222222222222), // integer transposition halving
    ("bedd", "edbc d", 0.8055555555555555),
    ("abcdefgh", "abzzzzzz", 0.5),
    ("aaaaaa", "aazzzz", 0.5555555555555555),
    ("ab", "ba", 0.0),
    ("a", "", 0.0),
    ("a", "a", 1.0),
    ("abcdefgh", "abcdefgz", 0.95),
    ("prefixes", "prefixzz", 0.9),
    ("xy", "yx", 0.0),
    ("12345", "12354", 0.9533333333333333),
    ("order 1", "order 2", 0.9428571428571428),
    ("aaaaaaaaaa", "aaaaabbbbb", 0.6666666666666666),
    ("ABC", "abc", 0.0))

  test("scala kernel matches DuckDB golden values exactly") {
    golden.foreach { case (a, b, expect) =>
      val got = JaroWinkler.jaroWinkler(a, b)
      assert(got == expect, s"jw($a, $b): got $got expected $expect")
    }
  }

  test("symmetry") {
    golden.foreach { case (a, b, _) =>
      assert(JaroWinkler.jaroWinkler(a, b) == JaroWinkler.jaroWinkler(b, a))
    }
  }

  test("bit-parallel matching phase (UTF8 byte path, >32 chars) is " +
    "bit-identical to the scalar char kernel") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(13)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnop _.")
    // lengths span the 32-char dispatch threshold and the 64/128-bit
    // block boundaries of the position masks
    val lens = Seq(0, 1, 20, 31, 32, 33, 63, 64, 65, 100, 127, 128,
      129, 200, 520)
    (0 until 3000).foreach { k =>
      val alpha = alphabets(k % alphabets.size)
      def mk = {
        val n = lens(rnd.nextInt(lens.size))
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val (a, b) = (mk, mk)
      val viaBytes = JaroWinkler.jaroWinklerUTF8(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val viaChars = JaroWinkler.jaroWinkler(a, b)
      assert(viaBytes == viaChars,
        s"len ${a.length}/${b.length}: $viaBytes vs $viaChars a=$a b=$b")
      val jBytes = JaroWinkler.jaroUTF8(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(jBytes == JaroWinkler.jaro(a, b), s"jaro len ${a.length}/${b.length}")
    }
  }

  test("catalyst expression path (codegen) agrees with the kernel") {
    val df = golden.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(Similarity.jw(col("a"), col("b"))).collect()
      .map(_.getDouble(0)).toSeq
    assert(got == golden.map(_._3))
  }

  test("tokenJaccard kernel is bit-identical to the builtin chain") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(29)
    val words = Seq("alpha", "beta", "gamma", "x", "yy", "日本語", "é",
      "alpha") // repeated word → in-side dup dedupe exercised
    def mk = {
      val n = rnd.nextInt(12)
      // random runs of spaces between tokens, plus leading/trailing
      (0 until n).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" " * (1 + rnd.nextInt(3))) +
        (if (rnd.nextBoolean()) "  " else "")
    }
    val rows = (0 until 800).map(_ => (mk, mk)) ++
      Seq(("", ""), ("", "a b"), ("   ", "a"), ("a b c", "c b a"),
        ("a a a", "a"), ("ab", "ab "))
    val df = rows.toDF("a", "b")
    val bad = df.select(
      Similarity.tokenJaccard(col("a"), col("b")).as("fast"),
      Similarity.tokenJaccardBuiltin(col("a"), col("b")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() == 0)
  }

  test("tokenJaccard long-document operands: quicksort path is " +
    "bit-identical to the builtin chain and bounded in time") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(31)
    // vocabulary large enough that 5k-token docs cross the 48-distinct
    // dispatch threshold immediately; sizes straddle the boundary too
    val vocab = (0 until 3000).map(i => s"w$i")
    def doc(tokens: Int) =
      (0 until tokens).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val rows = Seq(40, 47, 48, 49, 96, 500, 5000).flatMap(n =>
      (0 until 3).map(_ => (doc(n), doc(n)))) ++
      (0 until 100).map(_ => (doc(rnd.nextInt(200)), doc(rnd.nextInt(200))))
    val df = rows.toDF("a", "b")
    val t0 = System.nanoTime()
    val bad = df.select(
      Similarity.tokenJaccard(col("a"), col("b")).as("fast"),
      Similarity.tokenJaccardBuiltin(col("a"), col("b")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() == 0)
    // 121 rows incl. three 5k-token pairs: far under a second on the
    // n log n path; the round-5 insertion sort took O(t²) byte moves
    assert((System.nanoTime() - t0) / 1e9 < 30.0)
  }

  test("levSim golden") {
    val df = Seq(("kitten", "sitting")).toDF("a", "b")
    val got = df.select(Similarity.levSim(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - (1.0 - 3.0 / 7.0)) < 1e-12)
  }

  test("tokenJaccard golden") {
    val df = Seq(("a b c", "b c d")).toDF("a", "b")
    val got = df.select(Similarity.tokenJaccard(col("a"), col("b")))
      .head().getDouble(0)
    assert(got == 0.5)
  }
}
