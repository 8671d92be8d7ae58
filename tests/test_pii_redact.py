"""PII redaction: exact replacement strings on hand-built docs, count
semantics on overlap, DuckDB twin parity, and the map-only plan."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest

from talna_spark.pipeline.text import pii_redact, pii_redact_sql


@pytest.fixture(scope="module")
def pii_dir():
    d = tempfile.mkdtemp(prefix="talna_pii_")
    rows = [
        {"doc_id": 0, "text": "contact bob.smith+x@example-site.co.uk today"},
        {"doc_id": 1, "text": "call 555-123-4567 or 555.867.5309 now"},
        {"doc_id": 2, "text": "server at 10.0.0.1 and 192.168.1.254 up"},
        {"doc_id": 3, "text": "mixed: a@b.io then 123-456-7890 at 8.8.8.8"},
        {"doc_id": 4, "text": "clean text with no identifiers at all"},
    ]
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_redact_exact_strings(spark, pii_dir):
    out = {r["doc_id"]: r for r in pii_redact(spark, pii_dir).collect()}
    assert out[0]["text_redacted"] == "contact [EMAIL] today"
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 0
    assert out[1]["text_redacted"] == "call [PHONE] or [PHONE] now"
    assert out[1]["n_phones"] == 2
    assert out[2]["text_redacted"] == "server at [IP] and [IP] up"
    assert out[2]["n_ips"] == 2
    assert out[3]["text_redacted"] == "mixed: [EMAIL] then [PHONE] at [IP]"
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ips"]) == (
        1, 1, 1,
    )
    assert out[4]["text_redacted"] == "clean text with no identifiers at all"
    assert (out[4]["n_emails"], out[4]["n_phones"], out[4]["n_ips"]) == (
        0, 0, 0,
    )


def test_redact_matches_duckdb(spark, pii_dir):
    import duckdb

    got = (
        pii_redact(spark, pii_dir)
        .orderBy("doc_id")
        .toPandas()
        .to_dict("records")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pii_dir}/documents.parquet')"
    )
    ora = con.execute(pii_redact_sql() + " ORDER BY doc_id").df().to_dict(
        "records"
    )
    for g, o in zip(got, ora):
        assert g["text_redacted"] == o["text_redacted"]
        for c in ("n_emails", "n_phones", "n_ips"):
            assert g[c] == o[c], (g["doc_id"], c)


def test_redact_plan_is_map_only(spark, pii_dir):
    plan = (
        pii_redact(spark, pii_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
