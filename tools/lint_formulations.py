"""Engine-robustness lint for every ``queries()``/``oracle_sql()`` pair.

The r3/r4 driver rounds proved that "bit-exact vs local DuckDB" is NOT
the same thing as "bit-exact vs the driver's DuckDB": formulations that
lean on engine-library statistics or on digit-materialization of huge
doubles ship green locally and go red at the driver when the engine
version differs. The driver samples 50 of the 183 entries, so the other
133 carry un-exercised instances of whatever this lint would catch —
it therefore runs over ALL entries and is wired into the test suite
(tests/test_lint.py).

Rules (each with the incident that motivated it):

A. BANNED ORACLE FUNCTIONS — ``ntile`` / ``percent_rank`` /
   ``cume_dist`` / ``nth_value`` and the statistic aggregates
   (``corr``, ``stddev*``, ``var_samp/var_pop``, ``covar*``,
   ``skewness``, ``kurtosis``, ``regr_*``) may not appear in an oracle
   at all. w_customer_value_bands was driver-red in r3 AND r4 while
   bit-green against local DuckDB at three SFs; the only constructs it
   used beyond integer-exact window functions were ntile (a GROUP key)
   and nth_value. DuckDB's rank-statistic behavior has changed across
   releases; row_number()/rank()/count(*) are the only window
   functions every engine agrees on bit-for-bit. Derive bands and
   ranks from those via pure integer arithmetic (Spark ``DIV`` ↔
   DuckDB ``//``) on BOTH sides — see w_customer_value_bands /
   w_order_stats (operators/relational.py) for the house pattern, and
   stat_sales_corr for corr/slope from exact decimal sums.

B. NO WIDE-DECIMAL MATERIALIZATION OF DOUBLES — no ``CAST(expr AS
   DECIMAL(p>18, ...))`` where ``expr`` involves double arithmetic
   (ROUND / a DOUBLE cast / division / float literals).
   orders_value_anova REGRESSED green→red in r4 when ``ROUND(x, 0)``
   of a ~1e19 double was cast to DECIMAL(38,0): converting a >2^53
   double to decimal digits is engine-dependent (Spark
   BigDecimal.valueOf shortest-repr vs DuckDB exact-binary). Scale the
   double below 2^53 FIRST (``ROUND(x / 1e6)`` → BIGINT) or keep the
   algebra exact. Widening an exact integer/decimal (e.g. ``CAST(s AS
   DECIMAL(19,0))`` of a BIGINT so products don't overflow, cf.
   emb_label_centroids) is the one legitimate wide-decimal use and is
   not flagged.

B2. NO DECIMAL MATERIALIZATION OF DOUBLE-SOURCED VALUES AT *ANY*
   PRECISION — the r5-verdict hole that kept w_customer_value_bands
   red for three rounds while rule B looked only at p>18: its exposed
   ``CAST(MIN/MAX(c_acctbal) AS DECIMAL(12,2))`` materializes the
   decimal digits of an aggregated DOUBLE, and even below 2^53 that
   conversion differs across engine versions (Spark shortest-repr
   BigDecimal + HALF_UP vs DuckDB exact-binary conversion whose
   rounding mode changed across releases). Flag every ``CAST(expr AS
   DECIMAL(p,s))`` — any precision — whose body still touches a raw
   DOUBLE after the sanctioned normalizations are masked out:
     - a raw DOUBLE-typed source column (c_acctbal, o_totalprice,
       l_extendedprice, events.value, …) that is NOT bare-column
       decimal-normalized (``CAST(col AS DECIMAL(p,s))`` — the
       scan-time idiom proven driver-green by
       orders_median_by_priority, masked before matching);
     - an ``AS DOUBLE`` cast inside the body (a double value flowing
       into decimal digits);
     - a scientific-notation literal (``1e6`` is DOUBLE in both
       engines).
   Exact-DECIMAL-sourced casts (sums of normalized decimals, integer
   grids widened to DECIMAL) pass the mask automatically; anything
   else must be rewritten onto a BIGINT grid or audited into
   ``B2_ALLOWLIST`` with the reason recorded there.

E. NO ENGINE STRINGIFICATION OF DOUBLES OR TIMESTAMPS — no
   ``CAST(expr AS VARCHAR/STRING)`` where ``expr`` is double-sourced
   (same mask as rule B2) or a raw TIMESTAMP column. Double→string
   rendering is shortest-repr vs printf-style across engines, and
   timestamp→string differs in fractional-second padding — both are
   the hash-mismatch class with rows+schema green. Integer/boolean
   stringification (every current use: id grids, `SUM(viol) = 0`
   flags) renders identically and passes. Render timestamps with an
   explicit ``date_format``/``strftime`` pattern instead.

C. NO FRACTIONAL ROUND — ``ROUND(x, k>=1)`` exposed from an oracle is
   the r3 incident class: the 10^-k scaling path rounds a last-ulp
   boundary differently across engine versions. Integer ROUND
   (``ROUND(x)`` / ``ROUND(x, 0)``) of a sub-2^53 double is the safe
   class (both engines round half-away-from-zero); ppm/millions
   BIGINT grids are the house style.

D. EXPOSED DOUBLES ARE AUDITED — an output column of type DOUBLE is
   only allowed if (entry, column) is in ``DOUBLE_ALLOWLIST`` below.
   Every listed column was audited to be deterministic by
   construction, i.e. one of:
     (1) a raw input column passed through unchanged;
     (2) a single row-local CAST(exact DECIMAL/BIGINT AS DOUBLE) as
         the final operation (identical correctly-rounded conversion
         on both engines);
     (3) row-local IEEE arithmetic whose operands are exact
         (integer counts / decimal sums cast to double) — identical
         expression tree => identical bits on both engines.
   What is NEVER safe (and why a new double must be audited here):
   cross-row SUM/AVG over doubles (accumulation order differs by
   engine AND by partitioning) and engine statistic libraries (rule
   A). Adding an entry to the allowlist is a statement that you
   checked the column against (1)-(3).

Run: ``python tools/lint_formulations.py`` (exit 1 on any finding).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

BANNED_FNS = re.compile(
    r"\b(ntile|percent_rank|cume_dist|nth_value|corr|stddev|stddev_samp|"
    r"stddev_pop|var_samp|var_pop|variance|covar_samp|covar_pop|skewness|"
    r"kurtosis|regr_[a-z]+)\s*\(",
    re.IGNORECASE,
)

# Inner-expression markers that mean "this value went through double
# arithmetic" — digit-materializing such a value into a wide DECIMAL
# is the rule-B incident class.
_DOUBLEISH = re.compile(r"\bROUND\b|\bDOUBLE\b|/|\d\.\d|\de\d", re.IGNORECASE)


def _decimal_casts(sql: str):
    """Yield (precision, inner_expr) for EVERY CAST(expr AS DECIMAL(p,...)),
    by balancing parens from each CAST( site. Only THIS cast's own
    target type counts: the ``AS DECIMAL`` must sit at paren depth 0
    within the body, not inside a nested CAST."""
    for m in re.finditer(r"\bCAST\s*\(", sql, re.IGNORECASE):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        body = sql[m.end():i - 1]
        for tail in re.finditer(r"\bAS\s+DECIMAL\s*\(\s*(\d+)\s*[,)]",
                                body, re.IGNORECASE):
            prefix = body[:tail.start()]
            if prefix.count("(") == prefix.count(")"):
                yield int(tail.group(1)), prefix
                break


# Rule B2 machinery: the raw DOUBLE-typed source columns across the ten
# testdata tables (embeddings' FLOAT[] never meets a DECIMAL cast).
DOUBLE_SOURCE_COLS = (
    "c_acctbal", "s_acctbal", "p_retailprice", "o_totalprice",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax", "value",
)
_RAW_DOUBLE_COL = re.compile(
    r"\b(" + "|".join(DOUBLE_SOURCE_COLS) + r")\b", re.IGNORECASE
)
# The sanctioned scan-time normalization — a BARE double column cast
# straight to DECIMAL, no arithmetic and no aggregate inside the cast
# (orders_median_by_priority's driver-green idiom). Masked out before
# rule B2 looks for raw doubles.
_DECNORM = re.compile(
    r"CAST\s*\(\s*(?:[A-Za-z_][A-Za-z0-9_]*\s*\.\s*)?(?:"
    + "|".join(DOUBLE_SOURCE_COLS)
    + r")\s+AS\s+DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\)\s*\)",
    re.IGNORECASE,
)
# Double markers surviving the mask: an AS DOUBLE cast in the body, or
# a scientific-notation literal (DOUBLE-typed in Spark AND DuckDB).
_B2_DOUBLE_MARKER = re.compile(
    r"\bAS\s+DOUBLE\b|\b\d+(?:\.\d+)?[eE][-+]?\d+\b"
)

# (key) entries whose flagged DECIMAL cast was hand-audited safe.
# Adding a key here is a statement that every rule-B2 hit in its oracle
# was traced to an exact-DECIMAL/BIGINT source (alias shadowing a
# normalized column, never a raw double). Keep the reason inline.
B2_ALLOWLIST: dict[str, str] = {}

# Rule E: CAST(... AS VARCHAR/STRING) extraction mirrors _decimal_casts
_STRING_CAST_TAIL = re.compile(r"\bAS\s+(?:VARCHAR|STRING)\s*\)",
                               re.IGNORECASE)
_RAW_TS_COL = re.compile(r"\bts\b", re.IGNORECASE)


def _string_casts(sql: str):
    """Yield the inner expr of every CAST(expr AS VARCHAR/STRING), with
    the AS at paren depth 0 of the cast body."""
    for m in re.finditer(r"\bCAST\s*\(", sql, re.IGNORECASE):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        body = sql[m.end():i - 1]
        for tail in re.finditer(r"\bAS\s+(?:VARCHAR|STRING)\b",
                                body, re.IGNORECASE):
            prefix = body[:tail.start()]
            if prefix.count("(") == prefix.count(")"):
                yield prefix
                break

# ROUND with an explicit second argument; nested parens up to 2 deep.
FRACTIONAL_ROUND = re.compile(
    r"\bROUND\s*\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*,\s*([1-9]\d*)\s*\)",
    re.IGNORECASE,
)

# (entry, column) pairs audited deterministic-by-construction per rule
# D's classes (1)-(3). Grouped by family; every pair is local-green at
# sf0.001/0.01/0.1 and the relational core is driver-green (r4).
DOUBLE_ALLOWLIST: dict[str, set[str]] = {
    # -- relational core: exact DECIMAL sum -> one final double cast (2)
    "q1_pricing_summary": {"sum_qty", "sum_base_price", "sum_disc_price",
                           "sum_charge", "avg_qty", "avg_price", "avg_disc"},
    "q2_min_cost_supplier": {"unit_cost"},
    "q3_shipping_priority": {"revenue"},
    "q5_local_supplier_volume": {"revenue"},
    "q6_revenue_forecast": {"revenue"},
    "q7_volume_shipping": {"revenue"},
    "q8_market_share": {"mkt_share"},
    "q9_product_profit": {"sum_profit"},
    "q10_returned_items": {"c_acctbal", "revenue"},
    "q11_important_stock": {"part_value"},
    "q14_promo_revenue": {"promo_revenue"},
    "q15_top_supplier": {"total_revenue"},
    "q17_small_quantity": {"avg_yearly"},
    "q18_large_orders": {"o_totalprice", "sum_qty"},
    "q19_banded_revenue": {"revenue"},
    "q22_idle_customers": {"totacctbal"},
    "rollup_sales": {"total_sales"},
    "cube_sales": {"total_sales"},
    "grouping_sets_orders": {"total_price"},
    "sql_revenue_by_region": {"revenue"},
    "sql_top_customer_per_nation": {"total_spend"},
    "yoy_nation_growth": {"revenue", "prev_revenue", "yoy_growth"},
    "nation_trade_balance": {"export_rev", "import_rev", "balance"},
    "part_type_hhi": {"total_cost"},
    "supplier_scorecard": {"revenue", "on_time_rate", "avg_ship_days"},
    "customer_ltv_cohorts": {"cum_revenue"},
    "w_running_totals": {"running_total", "prev_price"},
    "w_topk_orders_per_cust": {"o_totalprice"},
    "stats_equidepth_hist": {"lo", "hi"},
    "agg_incremental_rollup": {"total_sales"},
    "snapshot_merge_cow": {"total_sales"},
    # same audited construction as snapshot_merge_cow: DOUBLE cast
    # of an exact DECIMAL(18,4) sum (safe construction #2)
    "snapshot_dv_read": {"total_sales"},
    "snapshot_partition_retention": {"total_sales"},
    "snapshot_generated_retention": {"total_sales"},
    # DOUBLE cast of an exact DECIMAL(18,4) sum merged decimal-
    # exact from CDF deltas (safe construction #2)
    "agg_incremental_cdf": {"total_sales"},
    "snapshot_read_version": {"total_sales"},
    "cdc_merge_orders": {"o_totalprice"},
    "snapshot_changes_cdf": {"o_totalprice"},
    "hidden_partition_prune": {"total_value"},
    "profile_columns": {"min_val", "max_val"},
    # -- events: value is a raw input column (1) or exact-decimal cast (2)
    "ev_tumbling_window": {"total_value", "avg_value"},
    "ev_skew_salted_join": {"total_value"},
    "ev_sessionize": {"total_value"},
    "ev_session_window": {"total_value"},
    "ev_topk_users": {"total_value"},
    "ev_dedup_latest": {"value"},
    "ev_asof_view": {"value"},
    "ev_error_window_join": {"window_value"},
    "ev_attribution_revenue": {"revenue"},
    "ev_daily_anomaly": {"day_value"},
    "ev_moving_avg_7d": {"day_value"},
    "ev_daily_gapfill": {"total_value"},
    "ev_hourly_heatmap": {"total_value"},
    "ev_value_histogram": {"bucket_value"},
    "ev_rfm_segments": {"monetary"},
    "ev_user_lifetime": {"events_per_active_day", "total_value"},
    "ev_bounce_rate": {"bounce_rate"},
    "ev_power_users_pareto": {"user_frac"},
    "ev_transition_matrix": {"prob"},
    "ev_ab_test": {"rate_a", "rate_b", "z_stat"},
    "ev_exp_smoothing": {"last_value", "smoothed"},
    "ev_holt_forecast": {"level", "trend", "forecast_next"},
    "ev_holtwinters_forecast": {"level", "trend", "season_next",
                                "forecast_next"},
    # lower median is an actual observation passed through unchanged (1)
    "ev_rolling_median_7d": {"med_lo"},
    # -- documents/text: row-local IEEE over exact integer counts (3)
    "doc_quality": {"dup_ratio", "avg_word_len", "stop_ratio",
                    "quality_score"},
    "doc_gopher_quality": {"mean_word_len", "frac_stop", "top_bigram_frac"},
    "doc_contamination": {"overlap_frac"},
    "doc_split_leakage": {"leak_frac"},
    "doc_ngram_jaccard": {"jaccard"},
    "doc_ngram_novelty": {"novelty"},
    "doc_oov_rate": {"oov_rate"},
    "doc_bpe_pretokens": {"pretokens_per_word"},
    "doc_mixture_report": {"mean_tokens", "doc_share", "token_share"},
    "doc_dedup_report": {"keep_rate"},
    "doc_minhash_pairs": {"est_jaccard"},
    "doc_minhash64_pairs": {"est_jaccard"},
    "doc_minhash_verified": {"est_jaccard", "exact_jaccard"},
    "doc_pagerank": {"rank"},
    # -- embeddings: row-local IEEE over the (identical) float inputs (3)
    "emb_cosine_topk": {"sim"},
    # margin = difference of two sims from exact integer dot/norms
    # (safe construction #2: deterministic doubles from exact inputs)
    "emb_knn_margin": {"margin"},
    "emb_bq_rerank": {"sim"},
    "emb_filtered_topk": {"sim"},
    "emb_incr_ann": {"sim"},
    "emb_ivf_ann": {"sim"},
    "emb_kmeans_ivf": {"sim"},
    "emb_lsh_ann": {"sim"},
    "emb_lsh_range": {"sim"},
    "emb_neardup_pairs": {"sim"},
    "emb_range_search": {"sim"},
    "emb_ivfpq_adc": {"adc_dist"},
    "emb_pq_adc": {"adc_dist"},
    "emb_pq4_encode": {"distortion"},
    "emb_dim_stats": {"min_x", "max_x", "mean_x"},
    "emb_label_centroids": {"centroid_norm"},
    "emb_outliers": {"z_score"},
    "emb_whiten": {"white_norm"},
    # -- multimodal: row-local decode math over opaque bytes (3)
    "mm_audio_features": {"duration_ms"},
    "mm_frame_sample": {"frame_mean"},
    "mm_image_features": {"mean_pixel"},
}


def lint_oracles(oracles: dict[str, str]) -> list[str]:
    """Static rules A-C over every oracle SQL string."""
    findings = []
    for key, sql in sorted(oracles.items()):
        for m in BANNED_FNS.finditer(sql):
            findings.append(
                f"{key}: rule A — banned engine function "
                f"'{m.group(1)}' in oracle SQL"
            )
        for prec, inner in _decimal_casts(sql):
            if prec > 18 and _DOUBLEISH.search(inner):
                findings.append(
                    f"{key}: rule B — CAST of double-arithmetic expression "
                    f"to DECIMAL({prec},...) in oracle SQL "
                    f"(digit-materialization of a >2^53 double is "
                    f"engine-dependent; scale below 2^53 first)"
                )
            if re.fullmatch(r"\s*[A-Za-z_][A-Za-z0-9_.]*\s*", inner):
                # bare-column normalization — the sanctioned scan-time
                # idiom (orders_median_by_priority, driver-green)
                continue
            masked = _DECNORM.sub("__DECNORM__", inner)
            if key not in B2_ALLOWLIST and (
                _RAW_DOUBLE_COL.search(masked)
                or _B2_DOUBLE_MARKER.search(masked)
            ):
                hit = (_RAW_DOUBLE_COL.search(masked)
                       or _B2_DOUBLE_MARKER.search(masked)).group(0)
                findings.append(
                    f"{key}: rule B2 — CAST(... AS DECIMAL({prec},...)) "
                    f"materializes a double-sourced value ('{hit}' in the "
                    f"cast body after masking bare-column normalizations); "
                    f"decimal digits of a double differ across engine "
                    f"versions — normalize at the scan and use a BIGINT "
                    f"grid (house pattern: orders_median_by_priority)"
                )
        for inner in _string_casts(sql):
            masked = _DECNORM.sub("__DECNORM__", inner)
            if (_RAW_DOUBLE_COL.search(masked)
                    or _B2_DOUBLE_MARKER.search(masked)
                    or _RAW_TS_COL.search(masked)):
                hit = (_RAW_DOUBLE_COL.search(masked)
                       or _B2_DOUBLE_MARKER.search(masked)
                       or _RAW_TS_COL.search(masked)).group(0)
                findings.append(
                    f"{key}: rule E — CAST(... AS VARCHAR/STRING) of a "
                    f"double-sourced or timestamp value ('{hit}'): "
                    f"engine rendering differs (shortest-repr vs printf; "
                    f"fractional-second padding) — use integer grids or "
                    f"an explicit date_format pattern"
                )
        for m in FRACTIONAL_ROUND.finditer(sql):
            findings.append(
                f"{key}: rule C — fractional ROUND(..., {m.group(1)}) "
                f"in oracle SQL (use an integer BIGINT grid instead)"
            )
    return findings


def lint_schemas(spark, queries, sf_dir: str) -> list[str]:
    """Rule D: every exposed DOUBLE column must be in the audited
    allowlist. Builds each DataFrame lazily (no execution)."""
    findings = []
    for key, fn in sorted(queries.items()):
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            findings.append(f"{key}: rule D — cannot build plan: {exc!r}")
            continue
        allowed = DOUBLE_ALLOWLIST.get(key, set())
        for col, dtype in df.dtypes:
            if dtype == "double" and col not in allowed:
                findings.append(
                    f"{key}: rule D — exposed DOUBLE column '{col}' is not "
                    f"in the audited allowlist (audit it against the three "
                    f"safe constructions, then list it)"
                )
        for col in allowed:
            if col not in {c for c, _ in df.dtypes}:
                findings.append(
                    f"{key}: rule D — allowlisted column '{col}' no longer "
                    f"in the output schema (stale allowlist entry)"
                )
    return findings


def main() -> int:
    import __spark_entry__ as entrymod
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    findings = lint_oracles(entrymod.oracle_sql())
    spark = get_spark("lint-formulations")
    findings += lint_schemas(spark, entrymod.queries(), sf_dir)
    for f in findings:
        print("LINT", f)
    n = len(entrymod.queries())
    print(f"{len(findings)} findings over {n} entries"
          if findings else f"lint clean over {n} entries")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
