"""Driver-contract smoke: entry() runs and returns a stable schema;
queries()/oracle_sql() keys line up. (Full oracle comparison is
tools/check_oracles.py — run separately against DuckDB.)"""

import __spark_entry__ as entry_mod


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query has an oracle (all are SQL-expressible here)
    assert set(oracles) == set(qs)
    assert len(qs) >= 12


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert df.columns == ["sketch", "estimate", "exact"]
    assert len(rows) == 4
    by_name = {r["sketch"]: r for r in rows}
    # flagship HLL estimate within 3σ of the exact distinct count it reports
    r = by_name["hll_parts"]
    assert abs(r["estimate"] - r["exact"]) <= 3 * (1.03896 / (1 << 7)) * r["exact"]
    assert by_name["cms_total"]["estimate"] == by_name["cms_total"]["exact"]
