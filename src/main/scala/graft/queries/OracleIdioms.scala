package graft.queries

/** Shared DuckDB SQL fragments that mirror graft Spark expressions. The
  * determinism contract requires every oracle to track its Spark twin
  * expression-for-expression; keeping one copy of each idiom means a change
  * to the Spark side has exactly one SQL string to update (drift in a
  * second copy silently breaks oracle parity for that file's queries).
  */
private[queries] object OracleIdioms {

  /** DuckDB mirror of [[graft.functions.TextFunctions.tokens]] over the
    * `documents.text` column.
    */
  val toksSql: String =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x != '')"

  /** DuckDB mirror of the md5-prefix hash-to-long: 15 hex chars < 2^60
    * keeps it positive; equals Spark
    * `conv(substring(md5(e),1,15),16,10).cast("long")`.
    */
  def md5Long(sqlExpr: String): String =
    s"('0x' || substr(md5($sqlExpr), 1, 15))::BIGINT"

  /** DuckDB mirror of [[graft.operators.Sampling.hashUniform]]: stable
    * uniform [0,1) from an id expression. 1152921504606846976 = 2^60.
    */
  def uniformSql(idExpr: String): String =
    s"${md5Long(s"CAST($idExpr AS VARCHAR)")} / 1152921504606846976.0"

  /** DuckDB mirror of the closed-form decimal-moment z-score (Spark twin:
    * BehaviorQueries.zCol). Callers guard n > 1 and positive variance.
    */
  def zScoreSql(x: String, n: String, sx: String, sxx: String): String =
    s"round(($x - $sx / $n) / sqrt(($sxx - $sx * $sx / $n) / ($n - 1.0)), 6)"

  /** DuckDB mirror of [[graft.operators.Sharding.shardByTokenBudget]]'s
    * arithmetic over a relation `$src(doc_id, n_tokens)` — exclusive
    * running token sum in doc order → floor-div shard index.
    */
  def shardSql(src: String, budget: Long): String =
    s"""SELECT doc_id, n_tokens,
       |  CAST(floor(prior / $budget) AS INT) AS shard FROM (
       |  SELECT doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM $src)""".stripMargin

  /** DuckDB mirror of CorpusSignals.qualityGate's signal CTE body (over a
    * relation `t(doc_id, tk)`) and the default-threshold keep predicate.
    * Single copy: t_cc_filter and the composed pipeline both build on it.
    */
  val qualitySignalsSql: String =
    """SELECT doc_id, coalesce(len(tk), 0) AS n_words,
      |  CAST(len(list_distinct(tk)) AS DOUBLE)
      |    / nullif(len(tk), 0) AS uniq_ratio,
      |  CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE)
      |    / nullif(len(tk), 0) AS mean_wl FROM t""".stripMargin

  val keptPredicateSql: String =
    "n_words >= 20 AND n_words <= 80 AND uniq_ratio >= 0.45" +
      " AND mean_wl >= 3.8 AND mean_wl <= 5.2"

  /** DuckDB mirror of [[graft.operators.CorpusSignals.bigrams]] (word
    * bigrams WITH duplicates) over a token-list expression.
    */
  def bigramsSql(tk: String): String =
    s"""CASE WHEN len($tk) >= 2
       |      THEN list_transform(generate_series(1, len($tk) - 1),
       |           i -> array_to_string(list_slice($tk, i, i + 1), ' '))
       |      ELSE [] END""".stripMargin
}
