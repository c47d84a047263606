"""Engine-robustness lint gate (tools/lint_formulations.py).

The driver's correctness gate samples 50 of the 183 registry entries;
the other 133 carry un-exercised instances of whatever the lint would
catch, so the lint must be green repo-wide, not just on the sample.
See the lint module docstring for the r3/r4 incidents behind each rule.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL
from tools.lint_formulations import (
    DOUBLE_ALLOWLIST,
    F_ALLOWLIST,
    lint_oracles,
    lint_overflow,
    lint_schemas,
)


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


def test_oracles_pass_static_rules():
    _, oracles = _registry()
    assert lint_oracles(oracles) == []


def test_schemas_pass_double_audit(spark):
    queries, _ = _registry()
    assert lint_schemas(spark, queries, SF_SMALL) == []


def test_allowlist_has_no_orphan_entries():
    queries, _ = _registry()
    orphans = set(DOUBLE_ALLOWLIST) - set(queries)
    assert orphans == set(), f"allowlist names unknown entries: {orphans}"
    orphans_f = set(F_ALLOWLIST) - set(queries)
    assert orphans_f == set(), f"F allowlist unknown entries: {orphans_f}"


def test_oracles_pass_overflow_headroom():
    """Rule F over the full registry: no BIGINT product chain may pass
    2^63 at 100 TB magnitudes unless its bound is audited into
    F_ALLOWLIST."""
    _, oracles = _registry()
    assert lint_overflow(oracles) == []


def test_rule_f_catches_the_r9_overflow_incidents():
    """The three r9 formulations (gini CRASHED the driver bench at
    sf0.1; Simpson/Fano were latent) must stay flagged forever — if a
    refactor of the masker stops catching them, the overflow class can
    ship lint-clean again."""
    old = {
        "old_gini": """
            SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
                   CAST(SUM(x) AS BIGINT) AS total_cents,
                   CAST((2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x))
                       * 1000000
                       // (COUNT(*) * SUM(x)) AS BIGINT) AS gini_ppm
            FROM ranked GROUP BY n_name
        """,
        "old_simpson": """
            SELECT day, CAST(1000000 - 1000000 * SUM(c * c)
                       // (SUM(c) * SUM(c)) AS BIGINT) AS simpson_ppm
            FROM counts GROUP BY day
        """,
        "old_fano": """
            SELECT event_type,
                   CAST(1000000 * (COUNT(*) * SUM(x * x)
                       - SUM(x) * SUM(x))
                       // (COUNT(*) * SUM(x)) AS BIGINT) AS fano_ppm
            FROM daily GROUP BY event_type
        """,
    }
    for name, sql in old.items():
        assert lint_overflow({name: sql}), f"{name} no longer flagged"
    # ... and the FIXED formulations pass clean
    fixed = {
        "new_gini": """
            SELECT n_name,
                   CAST((2 * SUM(CAST(i AS HUGEINT) * x)
                       - (CAST(COUNT(*) AS HUGEINT) + 1) * SUM(x))
                       * 1000000
                       // (CAST(COUNT(*) AS HUGEINT) * SUM(x))
                       AS BIGINT) AS gini_ppm
            FROM ranked GROUP BY n_name
        """,
        "new_simpson": """
            SELECT day,
                   CAST(1000000 - 1000000 * SUM(CAST(c AS HUGEINT) * c)
                       // (CAST(SUM(c) AS HUGEINT) * SUM(c))
                       AS BIGINT) AS simpson_ppm
            FROM counts GROUP BY day
        """,
    }
    assert lint_overflow(fixed) == []


def test_static_rules_catch_the_incident_constructs():
    """The three driver incidents, as regression fixtures."""
    findings = lint_oracles({
        # r3/r4: w_customer_value_bands (ntile as group key)
        "vb": "SELECT ntile(4) OVER w AS band FROM t",
        # r4: orders_value_anova (>2^53 double into DECIMAL(38,0))
        "an": "SELECT CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
              " / n, 0) AS DECIMAL(38,0)) FROM t",
        # r3: fractional-ROUND exposure
        "fr": "SELECT ROUND(percent_rank() OVER w, 6) FROM t",
    })
    assert any("vb: rule A" in f for f in findings)
    assert any("an: rule B" in f for f in findings)
    assert any("fr: rule C" in f for f in findings)
    # and the legitimate wide-decimal use is NOT flagged
    assert lint_oracles({
        "ok": "SELECT CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))"
              " FROM t",
    }) == []


def test_rule_b2_catches_decimal_of_double_at_any_precision():
    """The r5 false-negative hole: w_customer_value_bands shipped red
    three rounds running on CAST(MIN/MAX(DOUBLE) AS DECIMAL(12,2)) —
    narrow precision, so rule B's p>18 threshold never fired. Rule B2
    must flag agg-of-raw-double and AS-DOUBLE bodies at ANY precision,
    while leaving the sanctioned constructs alone."""
    findings = lint_oracles({
        # the literal r3-r5 red construct (narrow DECIMAL)
        "red": "SELECT CAST(MIN(c_acctbal) AS DECIMAL(12,2)) AS min_bal"
               " FROM customer",
        # a double value laundered through AS DOUBLE inside the cast
        "dbl": "SELECT CAST(CAST(s AS DOUBLE) / n AS DECIMAL(12,6)) FROM t",
        # scientific-notation literal (DOUBLE in both engines)
        "sci": "SELECT CAST(x * 1e6 AS DECIMAL(18,0)) FROM t",
    })
    assert any("red: rule B2" in f for f in findings)
    assert any("dbl: rule B2" in f for f in findings)
    assert any("sci: rule B2" in f for f in findings)
    # sanctioned constructs pass:
    assert lint_oracles({
        # bare-column scan-time normalization (the house fix itself)
        "n1": "SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer",
        # same, table-qualified (part_type_hhi / customer_ltv_cohorts)
        "n2": "SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))"
              " AS DECIMAL(18,2)) AS cost FROM lineitem l",
        # exact-decimal aggregation over a pre-normalized CTE column
        "n3": "WITH c AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p"
              " FROM orders) SELECT CAST(SUM(p) AS DECIMAL(18,2)) FROM c",
        # nested BIGINT-grid cast never materializes decimal digits
        "n4": "SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100"
              " AS BIGINT) AS bal_c FROM customer",
    }) == []


def test_rule_e_catches_double_and_timestamp_stringification():
    """Rule E: engine rendering of doubles (shortest-repr vs printf)
    and timestamps (fractional-second padding) differs — stringifying
    either is the next foreseeable hash-drift class. Integer/boolean
    stringification stays allowed."""
    findings = lint_oracles({
        "d1": "SELECT CAST(o_totalprice AS VARCHAR) AS s FROM orders",
        "d2": "SELECT CAST(SUM(value) / n AS STRING) AS s FROM t",
        "t1": "SELECT CAST(ts AS VARCHAR) AS s FROM events",
    })
    assert any("d1: rule E" in f for f in findings)
    assert any("d2: rule E" in f for f in findings)
    assert any("t1: rule E" in f for f in findings)
    assert lint_oracles({
        # integer and boolean stringification render identically
        "ok1": "SELECT CAST(user_id AS VARCHAR) AS s FROM events",
        "ok2": "SELECT CAST(SUM(viol) = 0 AS VARCHAR) AS s FROM t",
        # decimal-normalized cents grid stringified as an integer
        "ok3": "SELECT CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 "
               "AS BIGINT) AS STRING) AS s FROM customer",
    }) == []


def test_registry_dedup_gate_catches_seeded_twin():
    """The near-twin gate (preflight stage 0): the live registry is
    clean against the adjudicated ALLOW list, and a cosmetically
    edited copy of an existing oracle — the r11 duplicate-entry
    incident's shape — is flagged."""
    import __spark_entry__ as entry
    from tools.dedup_registry import ALLOW, THRESHOLD, find_twins

    oracles = entry.oracle_sql()
    assert find_twins(oracles) == []  # live registry: no unadjudicated twins

    seeded = dict(oracles)
    seeded["stat_orders_mannwhitney_twin"] = (
        oracles["stat_orders_mannwhitney"]
        .replace("u_stat", "mw_u").replace("  ", " "))
    twins = find_twins(seeded)
    assert any({a, b} == {"stat_orders_mannwhitney",
                          "stat_orders_mannwhitney_twin"}
               for _, a, b in twins), twins
    # every ALLOW pair names real entries (the list can't rot)
    for pair in ALLOW:
        for name in pair:
            assert name in oracles, f"stale ALLOW entry: {name}"
    assert 0.5 < THRESHOLD < 1.0
