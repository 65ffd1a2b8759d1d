package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Shared engine-exact arithmetic for oracle-checked queries. */
object Exact {

  /** Percentile position in pure BIGINT over a running-count column:
    * p = k/100 ⇒ ceil(k·n/100) = (k·n + 99) div 100 — no cross-engine
    * double ever feeds row selection (the round-5 `q_quantiles_exact`
    * driver-gate fix; every DuckDB oracle carries the identical
    * integer form). `nCol` is the per-group total-count column in the
    * calling plan. */
  def pctPos(k: Int, nCol: String = "n"): Column =
    expr(s"(($k * $nCol + 99) div 100)")
}
