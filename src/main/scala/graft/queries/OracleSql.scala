package graft.queries

/** Shared DuckDB-side idioms for the oracle SQL — ONE definition per
  * cross-engine contract, so the Spark and oracle sides cannot drift
  * apart between query files. */
private[queries] object OracleSql {

  /** DuckDB replica of [[graft.operators.CurationOps.md5Hash32]]:
    * first 8 hex chars of md5 read as a big-endian integer (mirrors
    * Spark's `conv(substring(md5(x), 1, 8), 16, 10)`). */
  def hex32(h: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9), j -> CAST(strpos('0123456789abcdef', substr($h, j, 1)) - 1 AS BIGINT))), (a, x) -> a * 16 + x)"

  /** Left-to-right 0.0-seeded sum fold over a DOUBLE list expression —
    * the DuckDB mirror of Spark's `aggregate(..., 0.0, (a, x) -> a + x)`
    * vector folds (bit-identical accumulation order, the q28-family
    * contract). */
  def foldSum(listExpr: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, $listExpr), (x, y) -> x + y)"
}
