"""PII redaction: masking behavior, ordering interactions, counts,
shuffle-free plan."""

from __future__ import annotations

import pandas as pd

from eth_options_data_pipeline_spark.operators.pii import redact_pii

DOCS = [
    (0, "contact me at jane.doe+spam@example.co.uk for details"),
    (1, "server lives at 192.168.0.1 and backup at 10.0.0.254 ok"),
    (2, "call +1 (415) 555-0172 or 020 7946 0958 today"),
    (3, "mixed: bob@x.org from 8.8.8.8 dialed 555-123-4567"),
    (4, "clean text with number 42 and version 3.5 nothing else"),
    (5, "call555@x.com is an address not a phone"),
]


def _rows(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return {r["doc_id"]: r for r in redact_pii(df).collect()}


def test_each_kind_masked(spark):
    got = _rows(spark)
    assert got[0]["text_redacted"] == "contact me at <|EMAIL|> for details"
    assert got[1]["text_redacted"] == "server lives at <|IP|> and backup at <|IP|> ok"
    assert got[2]["text_redacted"] == "call <|PHONE|> or <|PHONE|> today"
    assert got[3]["text_redacted"] == "mixed: <|EMAIL|> from <|IP|> dialed <|PHONE|>"


def test_clean_text_untouched(spark):
    got = _rows(spark)
    assert got[4]["text_redacted"] == DOCS[4][1]
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (0, 0, 0)


def test_email_wins_over_phone(spark):
    # digit-bearing local part must be consumed by the email rule whole
    got = _rows(spark)
    assert got[5]["text_redacted"] == "<|EMAIL|> is an address not a phone"
    assert got[5]["n_phones"] == 0


def test_counts(spark):
    got = _rows(spark)
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) == (1, 1, 1)
    assert got[1]["n_ips"] == 2
    assert got[2]["n_phones"] == 2


def test_shuffle_free(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
