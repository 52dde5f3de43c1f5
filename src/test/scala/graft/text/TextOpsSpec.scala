package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextOpsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val corpus = TextOps.corpus(spark, sfDir).cache()

  test("corpus plants exact (id+1e6) and near (id+2e6) duplicates") {
    val base = TextOps.documents(spark, sfDir).count()
    val n = corpus.count()
    assert(n > base)
    val exactIds = corpus.filter(col("doc_id") >= 1000000 &&
      col("doc_id") < 2000000).count()
    assert(exactIds > 0)
  }

  test("exact dedup: planted copies share canonical_id with originals") {
    val groups = TextOps.exactDupGroups(corpus)
    val dups = groups.filter(col("group_size") >= 2)
    assert(dups.count() > 0)
    // every planted exact copy maps to its original as canonical
    val bad = groups.filter(col("doc_id") >= 1000000 &&
        col("doc_id") < 2000000)
      .filter(col("canonical_id") =!= col("doc_id") - 1000000)
    assert(bad.count() == 0)
  }

  test("minhash LSH finds every planted near-duplicate pair") {
    val pairs = TextOps.minhashPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = TextOps.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0).select("doc_id").collect()
      .map(_.getLong(0)).map(id => (id, id + 2000000L)).toSet
    assert(planted.subsetOf(pairs),
      s"missing ${planted.diff(pairs).take(5)}")
  }

  test("ngram jaccard finds planted near-duplicates with high score") {
    val pairs = TextOps.ngramJaccardPairs(corpus)
    val planted = pairs.filter(col("id_r") === col("id_l") + 2000000L)
    assert(planted.count() > 0)
    assert(planted.agg(min(col("jaccard"))).head().getDouble(0) >= 0.8)
  }

  test("simhash: identical texts get identical simhash; tokens golden") {
    val sh = TextOps.simhash(corpus)
    val orig = sh.filter(col("doc_id") < 1000000)
      .withColumnRenamed("simhash", "s1")
    val copy = sh.filter(col("doc_id") >= 1000000 && col("doc_id") < 2000000)
      .select((col("doc_id") - 1000000).as("doc_id"),
        col("simhash").as("s2"))
    val joined = orig.join(copy, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("s1") =!= col("s2")).count() == 0)
  }

  test("token stats on a tiny fixture") {
    val df = Seq((1L, "the cat sat"), (2L, "a a b")).toDF("doc_id", "text")
    val stats = TextOps.tokenStats(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(stats(1L) == ((3, 3)))
    assert(stats(2L) == ((3, 2)))
  }

  test("langId picks marker-majority language with deterministic tiebreak") {
    val df = Seq(
      (1L, "the cat of the house"),
      (2L, "el perro de la casa es"),
      (3L, "xyz qrs")).toDF("doc_id", "text")
    val got = TextOps.langId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "und")
  }

  test("fingerprint: fewer than 5 tokens yields zero shingles") {
    val df = Seq((1L, "one two"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val fp = TextOps.fingerprint(df).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fp(1L) == 0)
    assert(fp(2L) == 2)
  }

  test("repetition ratios: hand-checked top-token and top-bigram dominance") {
    val docs = Seq(
      (1L, "spam spam spam eggs"),      // top token 3/4; bigram "spam spam" 2/3
      (2L, "a b c d"),                  // all unique: 1/4, 1/3
      (3L, "")).toDF("doc_id", "text")  // empty → 0
    val got = TextOps.repetition(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((0.75, 0.6666)))
    assert(got(2L) == ((0.25, 0.3333)))
    assert(got(3L) == ((0.0, 0.0)))
  }

  test("repetition completes fast on a 10k-distinct-token document " +
    "(linear run-length, not distinct-squared)") {
    // 10^4 distinct tokens: the old distinct×filter shape did 10^8
    // comparisons per row here; the sorted run-length pass is ~10^4 log
    val big = (0 until 10000).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, big), (2L, ("dup " * 5000).trim))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = TextOps.repetition(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got(1L) == ((0.0001, 0.0001)))   // all distinct
    assert(got(2L)._1 == 1.0)               // one dominant token
    assert(secs < 30.0, s"repetition took ${secs}s on a 10k-token doc")
  }

  test("simhash hamming pairs: identical docs at distance 0, disjoint docs excluded") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // identical → hamming 0
      (3L, "zulu yankee xray whiskey victor uniform tango sierra"))
      .toDF("doc_id", "text")
    val got = TextOps.simhashHammingPairs(docs, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0)
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }

  test("simhash64 is a deterministic pure function of tokens") {
    val docs = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val sig = TextOps.simhash64(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L)) // order-independent (bag of tokens)
    assert(sig(1L) != sig(3L))
  }

  test("minhash band cap drops boilerplate-hot buckets") {
    // 250 identical docs: every band bucket holds all 250 (> BandCap
    // 200) — without the cap this is a quadratic straggler; with it
    // the bucket is dropped entirely
    val hot = spark.range(250).select(col("id").as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta").as("text"))
    assert(TextOps.minhashPairs(hot).count() == 0)
    // a cap above the bucket size re-admits the block
    assert(TextOps.minhashPairs(hot, bandCap = 300).count() ==
      250L * 249 / 2)
  }

  test("chunking: windows, stride, short tail, single-chunk and empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 150).map(i => s"t$i").mkString(" ")), // 150 tokens
      (2L, "a b c"),                                   // 3 tokens → 1 chunk
      (3L, ""))                                        // empty → 0 chunks
      .toDF("doc_id", "text")
    val ch = TextOps.chunk(docs, maxTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: stride 48 → chunks at 0,48,96 = sizes 64,64,54 → 3 chunks
    val d1 = ch.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(d1.map(_.getInt(2)).toSeq == Seq(64, 64, 54))
    assert(d1(1).getString(3).startsWith("t49 "))
    val d2 = ch.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getInt(2) == 3 &&
      d2(0).getString(3) == "a b c")
    assert(!ch.exists(_.getLong(0) == 3L))
  }
}
