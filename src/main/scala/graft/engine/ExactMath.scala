package graft.engine

/** Cross-engine exact-arithmetic text generators — SQL fragments
  * emitted identically into Spark `expr(...)` and DuckDB oracle
  * strings, parameterized only by each engine's integer-division
  * spelling (`DIV` / `//`).
  */
object ExactMath {

  /** Overflow-free floored `num·10⁹ / den` for SHARES (`0 ≤ num ≤
    * den`) as three base-1000 long-division digits: the largest
    * intermediate is `den·1000`, so the expression is safe for any
    * denominator up to 9.2·10¹⁵, where the naive `num · 10⁹` wraps
    * (Spark) or raises (DuckDB) past den ≈ 9.2·10⁹. All operands
    * must be non-negative (floor division and `%` agree across
    * engines only there).
    */
  def ppbSql(num: String, den: String, div: String): String = {
    val n = s"($num)"
    val d = s"($den)"
    s"(((($n * 1000) $div $d) * 1000000) + " +
      s"((((($n * 1000) % $d) * 1000) $div $d) * 1000) + " +
      s"(((((($n * 1000) % $d) * 1000) % $d) * 1000) $div $d))"
  }
}
