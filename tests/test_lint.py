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
    lint_oracles,
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
