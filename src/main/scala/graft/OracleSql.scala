package graft

import graft.synth.Transcripts
import graft.normalize.Normalize

/** DuckDB oracle SQL builders shared by SparkEntry.oracleSql.
  *
  * Every transcript-based oracle query starts from the same two CTEs:
  * `transcripts` (derived from orders ⋈ lineitem exactly like
  * graft.synth.Transcripts) and `normalized` (the per-conversation
  * signature records exactly like graft.normalize.Normalize).
  */
object OracleSql {

  val preamble: String =
    "WITH " + Transcripts.oracleCte + ",\nnormalized AS (\n" +
      Normalize.oracleSelect + "\n)"

  def withNormalized(extraCtes: Seq[String], select: String): String = {
    val ctes = if (extraCtes.isEmpty) "" else extraCtes.mkString(",\n", ",\n", "")
    s"$preamble$ctes\n$select"
  }

  /** Mark the named CTEs `AS MATERIALIZED` (DuckDB ≥ 0.10 hint).
    *
    * DuckDB INLINES CTEs by default, so a CTE referenced k times — or
    * referenced from inside a recursive CTE's step — is re-evaluated k
    * times (× iterations). With whole pipelines stacked as CTEs
    * (transcripts → normalized → pairs → features → scored → edges →
    * sym → recursive walk) that turned the driver's correctness compare
    * into minutes per query (the round-2 artifact came back EMPTY
    * because of it: q16 alone took 381 s un-materialized, 0.8 s
    * materialized). Applied SELECTIVELY — materialization blocks
    * projection pushdown, so cheap single-reference chains stay inline.
    */
  def materialize(sql: String, names: Seq[String]): String =
    names.foldLeft(sql) { (s, n) =>
      // word-boundary match: a raw substring replace would also hit
      // CTEs that merely END with the name ("sig_l" inside
      // "nsig_l AS (") and silently materialize the wrong one
      s.replaceAll(
        "(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(n) + " AS \\(",
        java.util.regex.Matcher.quoteReplacement(n + " AS MATERIALIZED ("))
    }

  /** char n-gram list comprehension (range is upper-exclusive):
    * empty list when len < n — mirrors graft.block.FindNgrams. */
  def ngramList(attr: String, n: Int): String =
    s"[substring($attr, i, $n) FOR i IN range(1, greatest(length($attr) - ${n - 2}, 1))]"

  /** signatures CTE for a first_nchars(n) conjunction on one attribute. */
  def prefixSignatures(attr: String, n: Int): String =
    s"""signatures AS (
       |  SELECT conv_id, substring($attr, 1, $n) AS sig_0 FROM normalized
       |  WHERE substring($attr, 1, $n) != ''
       |)""".stripMargin

  /** signatures CTE for an n-gram (set-overlap) conjunction — DISTINCT
    * per record, mirroring invertedIndex's map-side array_distinct
    * (block size counts records, not n-gram occurrences). */
  def ngramSignatures(attr: String, n: Int): String =
    s"""signatures AS (
       |  SELECT conv_id, unnest(list_distinct(${ngramList(attr, n)})) AS sig_0
       |  FROM normalized
       |)""".stripMargin

  /** capped candidate-pair CTEs over a `signatures(conv_id, sig_0...)`
    * CTE — mirror of graft.block.Blocking.{capHotSignatures,
    * candidatePairs}. */
  def cappedPairs(nSigs: Int, cap: Int): String = {
    val sigs = (0 until nSigs).map(i => s"sig_$i").mkString(", ")
    val eqs = (0 until nSigs).map(i => s"l.sig_$i = r.sig_$i").mkString(" AND ")
    s"""capped AS (
       |  SELECT * FROM signatures WHERE ($sigs) IN (
       |    SELECT ($sigs) FROM signatures GROUP BY $sigs
       |    HAVING count(*) <= $cap)
       |),
       |pairs AS (
       |  SELECT DISTINCT l.conv_id AS id_l, r.conv_id AS id_r
       |  FROM capped l JOIN capped r ON $eqs AND l.conv_id < r.conv_id
       |)""".stripMargin
  }

  /** labels CTE (graft.block.Labels.plantedLabels). */
  val labelsCte: String =
    "labels AS (\n" + graft.block.Labels.oracleSelect + "\n)"

  /** per-pair similarity feature columns over a pairs CTE hydrated from
    * `normalized` — each quantized with floor(x·10⁴)/10⁴ (exact double
    * ops; decimal round() half-tie handling differs between engines). */
  val featureSelect: String =
    """hydrated AS (
      |  SELECT p.id_l, p.id_r,
      |         l.head_text AS head_l, r.head_text AS head_r,
      |         l.role_seq AS role_l, r.role_seq AS role_r,
      |         l.full_text AS full_l, r.full_text AS full_r
      |  FROM pairs p
      |  JOIN normalized l ON p.id_l = l.conv_id
      |  JOIN normalized r ON p.id_r = r.conv_id
      |),
      |features AS (
      |  SELECT id_l, id_r,
      |    floor(jaro_winkler_similarity(head_l, head_r) * 10000.0) / 10000.0 AS jw_head,
      |    floor(jaro_winkler_similarity(role_l, role_r) * 10000.0) / 10000.0 AS jw_role,
      |    floor(jaro_winkler_similarity(full_l, full_r) * 10000.0) / 10000.0 AS jw_full,
      |    floor((CASE WHEN length(full_l) = 0 AND length(full_r) = 0 THEN 1.0
      |         ELSE 1.0 - CAST(levenshtein(full_l, full_r) AS DOUBLE) /
      |              greatest(length(full_l), length(full_r)) END) * 10000.0) / 10000.0 AS lev_full,
      |    floor((CASE WHEN length(list_distinct(list_concat(
      |           list_filter(string_split(full_l, ' '), w -> w != ''),
      |           list_filter(string_split(full_r, ' '), w -> w != '')))) = 0 THEN 1.0
      |         ELSE CAST(length(list_intersect(
      |           list_distinct(list_filter(string_split(full_l, ' '), w -> w != '')),
      |           list_distinct(list_filter(string_split(full_r, ' '), w -> w != '')))) AS DOUBLE) /
      |           length(list_distinct(list_concat(
      |           list_filter(string_split(full_l, ' '), w -> w != ''),
      |           list_filter(string_split(full_r, ' '), w -> w != '')))) END) * 10000.0) / 10000.0 AS jac_full
      |  FROM hydrated
      |)""".stripMargin

  /** deterministic rule score (graft.sim.Distances.ruleScore over
    * quantized features). */
  val ruleScoreCte: String =
    """scored AS (
      |  SELECT id_l, id_r,
      |    floor(((jw_head + jw_role + jw_full + lev_full + jac_full) / 5.0) * 10000.0) / 10000.0 AS score
      |  FROM features
      |)""".stripMargin

  /** name-parameterized hydrate → features → rule-score block: reads
    * pairs from `<p>pairs`, emits `<p>scored(id_l, id_r, score)` —
    * for oracles that score more than one pair set (q54 scores the
    * corpus edges, the linkage pairs, AND the leftover pairs). */
  def scoredBlock(p: String): String = {
    // boundary-aware token renames (same guard as [[materialize]]): a
    // blind substring replace would corrupt any future identifier that
    // merely CONTAINS one of these names ("features" inside
    // "pair_features", "scored" inside "rescored")
    def renameIdent(sql: String, name: String): String =
      sql.replaceAll(
        "(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(name) +
          "(?![A-Za-z0-9_])",
        java.util.regex.Matcher.quoteReplacement(p + name))
    Seq("pairs", "hydrated", "features", "scored")
      .foldLeft(featureSelect + ",\n" + ruleScoreCte)(renameIdent)
  }

  /** Full DuckDB mirror of the three alignment DPs (q49): NW (via
    * LCS), SW, and SW-Gotoh over `head_text` of the labeled pairs —
    * the DP matrices evaluated along ANTI-DIAGONALS by a recursive
    * CTE. On diagonal d (cells i+j = d) every entry depends only on
    * diagonals d−1 and d−2 — including Gotoh's affine E/F gap states,
    * whose recurrences read only (i,j−1) and (i−1,j) — so each
    * recursion step computes one whole diagonal with pure elementwise
    * list comprehensions (no within-step dependency), depth m+n,
    * O(m·n) total per pair. Every diagonal is stored as a fixed
    * (m+1)-list indexed by row i (cell (i, d−i); NULL where d−i is
    * outside 0..n), so neighbor positions are just i and i+1 in the
    * previous lists.
    *
    * Exactness: all three kernels combine only dyadic-rational
    * constants (±1, ±2, −0.5, −1e18) by add/max — every intermediate
    * is exactly representable, and the final single division matches
    * [[graft.sim.Alignment]] bit-for-bit, so the driver's hash compare
    * is exact, not approximate. Sentinel −1e18 follows the kernel's
    * NegInf: |x| ≫ 2^53 absorbs the −0.5 gap-extend in BOTH engines.
    *
    * `swbestn`/`hbestn` fold the diagonal just computed by referencing
    * the `sw1n`/`h1n` aliases from the same SELECT list (DuckDB
    * lateral column aliases), so each step evaluates its dominant
    * list expression once instead of re-inlining it.
    *
    * Character model: the Spark kernels index UTF-16 code units
    * (Scala `charAt`/`length`), this mirror DuckDB CODEPOINTS
    * (`length`/`string_split`). Identical over the BMP — all of the
    * synthetic corpus — but an astral-plane character (emoji) counts 2
    * units vs 1 codepoint, so a unicode-heavy corpus would need a
    * code-unit-level split here before the hash compare could stay
    * exact.
    */
  def alignmentOracle: String = {
    val ctes = Seq(
      labelsCte,
      """hyd AS (
        |  SELECT p.id_l, p.id_r,
        |         string_split(l.head_text, '') AS ca,
        |         string_split(r.head_text, '') AS cb,
        |         length(l.head_text) AS m, length(r.head_text) AS n
        |  FROM (SELECT id_l, id_r FROM labels) p
        |  JOIN normalized l ON p.id_l = l.conv_id
        |  JOIN normalized r ON p.id_r = r.conv_id
        |)""".stripMargin,
      // recursion state per pair: current diagonal number d plus, for
      // each kernel, its last two diagonals (lc/sw/h) or last one
      // (e/f), and the running local-alignment maxima (swbest/hbest)
      """align AS (
        |  SELECT id_l, id_r, ca, cb, m, n, 1 AS d,
        |    [CASE WHEN 1 - i BETWEEN 0 AND n THEN 0 END FOR i IN range(0, m + 1)] AS lc1,
        |    [CASE WHEN 0 - i BETWEEN 0 AND n THEN 0 END FOR i IN range(0, m + 1)] AS lc2,
        |    [CASE WHEN 1 - i BETWEEN 0 AND n THEN 0 END FOR i IN range(0, m + 1)] AS sw1,
        |    [CASE WHEN 0 - i BETWEEN 0 AND n THEN 0 END FOR i IN range(0, m + 1)] AS sw2,
        |    0 AS swbest,
        |    [CASE WHEN 1 - i BETWEEN 0 AND n THEN 0.0::DOUBLE END FOR i IN range(0, m + 1)] AS h1,
        |    [CASE WHEN 0 - i BETWEEN 0 AND n THEN 0.0::DOUBLE END FOR i IN range(0, m + 1)] AS h2,
        |    [CASE WHEN 1 - i BETWEEN 0 AND n THEN -1e18::DOUBLE END FOR i IN range(0, m + 1)] AS e1,
        |    [CASE WHEN 1 - i BETWEEN 0 AND n THEN -1e18::DOUBLE END FOR i IN range(0, m + 1)] AS f1,
        |    0.0::DOUBLE AS hbest
        |  FROM hyd WHERE m > 0 AND n > 0
        |  UNION ALL
        |  SELECT id_l, id_r, ca, cb, m, n, d + 1,
        |    [CASE WHEN d + 1 - i BETWEEN 0 AND n THEN
        |       CASE WHEN i = 0 OR d + 1 - i = 0 THEN 0
        |            ELSE greatest(lc1[i], lc1[i + 1],
        |                          lc2[i] + CASE WHEN ca[i] = cb[d + 1 - i] THEN 1 ELSE 0 END)
        |       END END FOR i IN range(0, m + 1)] AS lc1n,
        |    lc1,
        |    [CASE WHEN d + 1 - i BETWEEN 0 AND n THEN
        |       CASE WHEN i = 0 OR d + 1 - i = 0 THEN 0
        |            ELSE greatest(0,
        |                          sw2[i] + CASE WHEN ca[i] = cb[d + 1 - i] THEN 2 ELSE -1 END,
        |                          sw1[i] - 1, sw1[i + 1] - 1)
        |       END END FOR i IN range(0, m + 1)] AS sw1n,
        |    sw1,
        |    greatest(swbest,
        |      coalesce(list_aggregate(sw1n, 'max'), 0)) AS swbestn,
        |    [CASE WHEN d + 1 - i BETWEEN 0 AND n THEN
        |       CASE WHEN i = 0 OR d + 1 - i = 0 THEN 0.0::DOUBLE
        |            ELSE greatest(0.0,
        |                   h2[i] + CASE WHEN ca[i] = cb[d + 1 - i] THEN 2.0::DOUBLE ELSE -1.0::DOUBLE END,
        |                   greatest(h1[i + 1] - 2.0, e1[i + 1] - 0.5),
        |                   greatest(h1[i] - 2.0, f1[i] - 0.5))
        |       END END FOR i IN range(0, m + 1)] AS h1n,
        |    h1,
        |    [CASE WHEN d + 1 - i BETWEEN 0 AND n THEN
        |       CASE WHEN i = 0 OR d + 1 - i = 0 THEN -1e18::DOUBLE
        |            ELSE greatest(h1[i + 1] - 2.0, e1[i + 1] - 0.5)
        |       END END FOR i IN range(0, m + 1)] AS e1n,
        |    [CASE WHEN d + 1 - i BETWEEN 0 AND n THEN
        |       CASE WHEN i = 0 OR d + 1 - i = 0 THEN -1e18::DOUBLE
        |            ELSE greatest(h1[i] - 2.0, f1[i] - 0.5)
        |       END END FOR i IN range(0, m + 1)] AS f1n,
        |    greatest(hbest,
        |      coalesce(list_aggregate(h1n, 'max'), 0.0::DOUBLE)) AS hbestn
        |  FROM align WHERE d < m + n
        |)""".stripMargin)
    val select =
      """SELECT id_l, id_r,
        |  floor((2.0 * lc1[m + 1] / (m + n)) * 10000.0) / 10000.0 AS nw_head_text,
        |  floor((CAST(swbest AS DOUBLE) / (2.0 * least(m, n))) * 10000.0) / 10000.0 AS sw_head_text,
        |  floor((hbest / (2.0 * least(m, n))) * 10000.0) / 10000.0 AS swg_head_text
        |FROM align WHERE d = m + n
        |UNION ALL
        |SELECT id_l, id_r,
        |  CASE WHEN m = 0 AND n = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END,
        |  CASE WHEN m = 0 AND n = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END,
        |  CASE WHEN m = 0 AND n = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
        |FROM hyd WHERE m = 0 OR n = 0""".stripMargin
    materialize(withNormalized(ctes, select), Seq("normalized", "hyd"))
      .replaceFirst("^WITH ", "WITH RECURSIVE ")
  }

  /** the recursive min-propagation walk over `<p>edges(id_l, id_r)` →
    * `<p>comp(id, component)` — name-parameterized so one query can
    * run several independent connected-components passes. */
  def walkBlock(p: String): String =
    s"""${p}sym AS MATERIALIZED (
       |  SELECT id_l AS u, id_r AS v FROM ${p}edges
       |  UNION SELECT id_r, id_l FROM ${p}edges
       |),
       |${p}walk(u, c) AS (
       |  SELECT u, u FROM ${p}sym
       |  UNION
       |  SELECT s.u, w.c FROM ${p}sym s JOIN ${p}walk w ON s.v = w.u
       |),
       |${p}comp AS (SELECT u AS id, min(c) AS component FROM ${p}walk GROUP BY u)""".stripMargin
}
