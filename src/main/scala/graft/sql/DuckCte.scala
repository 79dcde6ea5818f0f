package graft.sql

/** DuckDB oracle-side CTE materialization hint.
  *
  * DuckDB inlines a CTE at every reference site, so an oracle whose
  * final SELECT references a chained CTE k times re-computes the whole
  * upstream pipeline k times — er_incremental's oracle (three
  * references to `m`, which chains through two recursive-reachability
  * components) cost 26.5 s of the 71.6 s round-14 oracle pass at
  * sf0.01; with its shared CTEs materialized it runs in 0.17 s with
  * byte-identical output (measured via tools OracleDump + DuckDB
  * directly). `AS MATERIALIZED` is the standard Postgres/DuckDB hint
  * and changes results in no way — it only pins the evaluation
  * strategy, exactly what the Spark side's localCheckpoint does for
  * the same DAGs.
  *
  * The transform annotates every uniquely-named, non-recursive CTE
  * head (`name AS (` at line start). Skipped on purpose:
  *  - recursive CTE heads (`name(cols…) AS (`) — the paren'd column
  *    list never matches, and DuckDB cannot materialize them anyway;
  *  - duplicate CTE names (one oracle shadows `still` in two scopes —
  *    legal when inlined, a binder error when materialized);
  *  - heads sharing a line with `WITH`/`WITH RECURSIVE` — anchoring at
  *    line start leaves them inlined, which is fine (they are
  *    single-reference in practice).
  * Applied per-oracle, only where the A/B measured a win — CTE
  * materialization blocks filter pushdown into the CTE, so blanket
  * application can regress scan-heavy oracles.
  */
object DuckCte {
  private val Head = "(?m)^(\\s*)([A-Za-z_][A-Za-z0-9_]*) AS \\(".r
  // dup detection must ALSO see heads hinted on a previous pass — a
  // composite oracle that embeds an already-transformed oracle as a
  // nested WITH (pipeline_ingest_tick wraps dedup_semantic_incremental)
  // shadows names across scopes, and materializing a shadowed name is a
  // DuckDB binder error even when the two heads sit in different WITHs.
  private val AnyHead =
    "(?m)^\\s*([A-Za-z_][A-Za-z0-9_]*) AS (?:MATERIALIZED )?\\(".r

  def materialized(sql: String): String = {
    val names = AnyHead.findAllMatchIn(sql).map(_.group(1)).toList
    val dups = names.groupBy(identity).collect {
      case (n, xs) if xs.size > 1 => n
    }.toSet
    Head.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (dups(m.group(2))) m.matched
        else s"${m.group(1)}${m.group(2)} AS MATERIALIZED ("))
  }
}
