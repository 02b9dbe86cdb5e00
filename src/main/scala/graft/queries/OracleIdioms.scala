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
}
