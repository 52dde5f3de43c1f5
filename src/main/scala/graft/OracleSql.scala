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
