package graft.block

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Golden signature values ported from the reference:
  * - db/base.py:120-128 forward-index docstring example
  * - tests/simple/test_simple_schemes.py
  * - PL/Python definitions funcs.py:23-71
  */
class SchemesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def sig(scheme: Scheme, value: String): Any = {
    val df = Seq(value).toDF("attr")
    df.select(scheme.expr("attr").as("s")).head().get(0)
  }

  test("first_nchars = s[:n] (funcs.py:23-31)") {
    assert(sig(FirstNChars(4), "john smith") == "john")
    assert(sig(FirstNChars(6), "ab") == "ab")
  }

  test("last_nchars = s[-n:] (funcs.py:33-41)") {
    assert(sig(LastNChars(4), "john smith") == "mith")
    assert(sig(LastNChars(6), "ab") == "ab")
  }

  test("find_ngrams = char n-grams; empty when len<n (funcs.py:43-51)") {
    assert(sig(FindNgrams(4), "abcde") == Seq("abcd", "bcde"))
    assert(sig(FindNgrams(4), "abcd") == Seq("abcd"))
    assert(sig(FindNgrams(6), "abc") == Seq.empty)
  }

  test("acronym = first char of each token (funcs.py:53-61)") {
    assert(sig(Acronym, "john francis smith") == "jfs")
    assert(sig(Acronym, "a  double  space") == "ads")
    assert(sig(Acronym, "solo") == "s")
  }

  test("exactmatch = identity (funcs.py:63-71)") {
    assert(sig(ExactMatch, "anything at all") == "anything at all")
  }

  test("first_letter_first_word (simple/schemes.py:6-7)") {
    assert(sig(FirstLetterFirstWord, "testing this value") == "t")
    assert(sig(FirstLetterFirstWord, "123 some road") == "1")
  }

  test("forward index: db/base.py:120-128 musician example") {
    val df = Seq("Bob Alice", "Bob Alice", "bob alice").toDF("name")
    val schemes = Seq(BoundScheme(FirstNChars(2), "name"),
      BoundScheme(Acronym, "name"))
    val fwd = Blocking.forwardIndex(df.withColumn("conv_id", col("name")),
      schemes)
    val rows = fwd.collect().map(r => (r.getString(1), r.getString(2)))
    assert(rows.count(_ == ("Bo", "BA")) == 2)
    assert(rows.count(_ == ("bo", "ba")) == 1)
  }

  test("scheme menu is the reference's 11-per-attribute (schemes.py:48-59)") {
    assert(Schemes.menu.size == 11)
    assert(Schemes.forAttributes(Seq("a", "b")).size == 22)
  }
}
