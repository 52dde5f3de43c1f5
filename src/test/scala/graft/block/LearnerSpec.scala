package graft.block

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Learner semantics ported from the reference's unit tests
  * (tests/block/test_learner.py:56-81, test_optimizers.py:59-87):
  * conjunction list is deduped and sorted desc by (rr, positives,
  * −negatives); seeds failing the rr/positives cut yield nothing;
  * stats match hand-computed values on a tiny fixture.
  */
class LearnerSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // 6 records: r1/r2 near-identical (labeled match), r5/r6 distinct
  // (labeled non-match)
  private lazy val train = Seq(
    ("r1", "alpha beta", "u a"),
    ("r2", "alpha beta", "u a"),
    ("r3", "gamma delta", "u t"),
    ("r4", "epsilon zeta", "a t"),
    ("r5", "eta theta", "u a"),
    ("r6", "iota kappa", "t t")).toDF("conv_id", "head_text", "role_seq")

  private lazy val labels = Seq(
    ("r1", "r2", 1),
    ("r5", "r6", 0)).toDF("id_l", "id_r", "label")

  private def learner(seedCut: Double = 0.0) =
    new Learner(train, labels, Seq("head_text"), k = 2,
      seedRrCut = seedCut, maxBlockSize = 100)

  test("score: stats match hand computation (J3+A1+A2)") {
    val s = learner().score(Seq("exactmatch_head_text"))
    // only r1/r2 share identical head_text → 1 pair, the labeled match
    assert(s.nPairs == 1 && s.positives == 1 && s.negatives == 0)
    // rr = 1 − 1/C(6,2)
    assert(math.abs(s.rr - (1.0 - 1.0 / 15.0)) < 1e-12)
  }

  test("learn: list deduped and sorted desc by (rr, positives, -negatives)") {
    val conjs = learner().learn()
    assert(conjs.nonEmpty)
    val keys = conjs.map(_.key)
    assert(keys == keys.sortBy(identity)(
      Ordering[(Double, Long, Long)].reverse))
    assert(conjs.map(_.conjunction.sorted).distinct.size == conjs.size)
    // every kept conjunction passes _keep_if (optimizers.py:52-61)
    conjs.foreach { c =>
      assert(c.positives > 0 && c.rr < 1.0 && c.nPairs > 1 ||
        c.conjunction.size == 1) // seeds are kept via the seed cut only
    }
  }

  test("seed cut prunes low-rr seeds (optimizers.py:87)") {
    // with the hardcoded 0.99 cut, nothing on 6 records can pass
    // (1 pair ⇒ rr = 14/15 < 0.99) → no conjunctions at all
    assert(learner(seedCut = 0.99).learn().isEmpty)
  }

  test("budget-derived DP seed skip: a below-min_rr seed keeps its " +
    "depth-1 stats but is never refined") {
    // maxCompare = 1 over C(6,2) = 15 comparisons ⇒ min_rr = 14/15: the
    // budget loop will refuse any conjunction admitting > 1 pair, so
    // the DP must not spend corpus-scale batches refining seeds the
    // budget already refuses at depth 1
    val l = new Learner(train, labels, Seq("head_text"), k = 2,
      seedRrCut = 0.0, maxBlockSize = 100, maxCompare = 1L)
    val singles = l.scoreBatch(Nil, l.schemes.map(_.name))
    assert(math.abs(l.budgetMinRr - 14.0 / 15.0) < 1e-12)
    // find_ngrams_4 over head_text: r1/r2 share 7 four-gram keys ⇒
    // n_pairs = 7 (join-work counting) ⇒ rr = 8/15 < min_rr: covered
    // (positives = 1) but refused by the budget at depth 1
    val refused = "find_ngrams_4_head_text"
    assert(singles(refused).positives > 0 &&
      singles(refused).rr < l.budgetMinRr)
    val refinable = l.refinableSeeds(singles)
    assert(!refinable.contains(refused),
      "below-min_rr seed must be skipped for the BUDGET reason")
    // exactmatch admits exactly 1 pair ⇒ rr = 14/15 = min_rr: refinable
    assert(refinable.contains("exactmatch_head_text"))
    val conjs = l.learn()
    // the refused seed survives at depth 1 (the learned list still
    // carries its stats)...
    assert(conjs.exists(_.conjunction == Seq(refused)))
    // ...but no DP chain was seeded from it
    assert(conjs.filter(_.conjunction.size > 1)
      .forall(_.conjunction.head != refused))
  }

  test("parallel seed DP chains produce the bit-identical learned list " +
    "(dpParallelism is an execution knob, not a semantic one)") {
    val sequential = new Learner(train, labels, Seq("head_text", "role_seq"),
      k = 3, seedRrCut = 0.0, maxBlockSize = 100, dpParallelism = 1).learn()
    val parallel = new Learner(train, labels, Seq("head_text", "role_seq"),
      k = 3, seedRrCut = 0.0, maxBlockSize = 100, dpParallelism = 4).learn()
    // exact element-wise equality INCLUDING order — stats are a pure
    // function of the data, chains are awaited in seed order, and
    // distinctBy/sortBy are order-preserving/stable, so ties must land
    // identically at any parallelism
    assert(parallel == sequential)
    assert(parallel.nonEmpty)
  }

  test("coverage-gap escalation: refinements of budget-refused seeds " +
    "are learned when the admitted prefix would miss a labeled positive") {
    // Two labeled positives, NO depth-1 seed admissible: the b-block
    // (5 identical heads) puts ≥ 10 pairs under every head scheme, the
    // 7-strong "u a" role block ≥ 21 under every role scheme — so with
    // maxCompare = 2 over C(16,2) = 120 (min_rr = 118/120) every seed
    // is refused at depth 1 and refinableSeeds is EMPTY. Only
    // refinements (e.g. head-prefix ∧ role-exact: blocks {a1,a2} and
    // {b1,b2}, 2 pairs) clear the cutoff — exactly the case the
    // primary skip would lose and the label-coverage guard must catch.
    val recs = Seq(
      ("a1", "zeta one", "u a"), ("a2", "zeta two", "u a"),
      ("b1", "alpha beta", "q q"), ("b2", "alpha beta", "q q"),
      ("b3", "alpha beta", "r r"), ("b4", "alpha beta", "s s"),
      ("b5", "alpha beta", "t v"),
      ("n1", "zeta n1", "t t"), ("n2", "zeta n2", "t u"),
      ("n3", "zeta n3", "u t"), ("n4", "zeta n4", "a a"),
      ("m1", "golf gg", "u a"), ("m2", "hotel hh", "u a"),
      ("m3", "india ii", "u a"), ("m4", "juliet jj", "u a"),
      ("m5", "kilo kk", "u a")).toDF("conv_id", "head_text", "role_seq")
    val labs = Seq(("a1", "a2", 1), ("b1", "b2", 1), ("n1", "m1", 0))
      .toDF("id_l", "id_r", "label")
    val l = new Learner(recs, labs, Seq("head_text", "role_seq"), k = 3,
      seedRrCut = 0.0, maxBlockSize = 100, maxCompare = 2L)
    val singles = l.scoreBatch(Nil, l.schemes.map(_.name))
    // premise: covering seeds exist but every one is budget-refused at
    // depth 1, so the eager criterion refines nothing
    assert(l.schemes.map(_.name).exists { s =>
      singles(s).positives > 0 && singles(s).rr < l.budgetMinRr })
    assert(l.refinableSeeds(singles).isEmpty)
    val learned = l.learn()
    val admitted = learned.takeWhile(_.rr >= l.budgetMinRr)
    // escalation refined the refused seeds: the admitted prefix now
    // holds multi-scheme refinements and covers BOTH labeled positives
    assert(admitted.nonEmpty && admitted.forall(_.conjunction.size > 1))
    assert(l.coveredPositives(admitted.map(_.conjunction)) == 2L)
    // no stale in-flight claims leak out of a learn() call
    assert(l.inflight.isEmpty)
  }

  test("ngram constraint: conjunctions never contain 2 ngram schemes") {
    val conjs = learner().learn()
    conjs.foreach { c =>
      assert(c.conjunction.count(_.startsWith("find_ngrams")) <= 1)
    }
  }
}
