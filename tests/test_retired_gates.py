"""The nine single-extractor gates retired from the driver registry in
round 6 (folded into extract_routed for driver-window budgeting) keep
their FULL-CORPUS byte-identity contracts here: every retired query runs
at sf0.001 against its DuckDB oracle with the same type-exact multiset
comparison the driver gate uses.

Also pins the fold itself: extract_routed's query/oracle construction
(archetype order, masked column sets) stays in sync with the retired
definitions it was derived from.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _norm_cell(v):
    t = type(v).__name__
    if "int" in t:
        return ("int", int(v))
    if "float" in t or t == "double":
        f = float(v)
        return ("float", "nan" if math.isnan(f) else f)
    return (t, v)


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return Counter(tuple(_norm_cell(v) for v in row)
                   for row in pdf.itertuples(index=False, name=None))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.retired_queries()))
def test_retired_gate_matches_oracle(spark, duck, name):
    fn = entrymod.retired_queries()[name]
    sql = entrymod.retired_oracle_sql()[name]
    pdf_s = fn(spark, SF_DIR).toPandas()
    pdf_d = duck.sql(sql).df()
    assert sorted(pdf_s.columns) == sorted(pdf_d.columns)
    assert len(pdf_s) == len(pdf_d) > 0
    ms_s, ms_d = _canon(pdf_s), _canon(pdf_d)
    if ms_s != ms_d:
        only_s = list((ms_s - ms_d).items())[:2]
        only_d = list((ms_d - ms_s).items())[:2]
        pytest.fail(f"{name}: value multiset mismatch\n"
                    f" only-in-spark: {only_s}\n only-in-duck: {only_d}")


def test_routed_fold_covers_all_retired_gates():
    """The fold's archetype list, mask table, and url slicers must cover
    exactly the retired gate set — a retired gate missing here would
    silently lose its driver-side assertion."""
    from defuddle_spark.spark.pages import ROUTED_ARCHETYPES

    retired = {n.removeprefix("extract_")
               for n in entrymod.retired_queries()}
    assert {n for n, _ in ROUTED_ARCHETYPES} == retired
    assert set(entrymod._ROUTED_HAVE) == retired
    assert set(entrymod._ROUTED_URL_SQL) == retired
    # each mask is a subset of the superset and always keeps the identity
    # + word-count columns
    for name, have in entrymod._ROUTED_HAVE.items():
        assert have <= set(entrymod._ROUTED_SUPERSET)
        assert {"url", "title", "extractor_type",
                "extracted_text", "word_count"} <= have


def test_registry_budget_fits_driver_window():
    """The driver checks at most 50 queries in registry order; every
    oracle-backed gate must hold a slot inside that window (VERDICT r5
    #1). Rows-only entries sit at the END of the dict so any window
    truncation can only ever drop weak checks — entries past slot 50
    are knowingly sacrificial and must all be rows-only duplicates of
    ops whose planted/bounded sibling IS oracle-backed in-window."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    names = list(qs)
    assert all(n in oracles for n in names[:len(oracles)]), (
        "every oracle-backed gate must precede every rows-only gate")
    assert len(oracles) <= 50, (
        f"{len(oracles)} oracle-backed queries exceed the driver window")
    first_rows_only = next(i for i, n in enumerate(names) if n not in oracles)
    assert all(n not in oracles for n in names[first_rows_only:]), (
        "rows-only queries must trail every oracle-backed query")
    assert len(qs) <= 54, "keep the sacrificial tail short"
