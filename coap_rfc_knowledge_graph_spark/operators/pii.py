"""PII redaction — the pre-training scrub every public-web corpus runs
(C4 removed pages with bad-word hits; Dolma/RefinedWeb mask emails, IP
addresses and phone numbers in place). Pure regexp projections: zero
shuffles, whole-stage codegen, pushdown-friendly.

The patterns deliberately stick to constructs whose semantics are
identical in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b`` — so the DuckDB oracle mirrors them
verbatim. They are the standard recall-oriented curation patterns, not
validators (an over-match costs one masked token; an under-match leaks
PII into a trained model).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PAT = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PAT = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_pii_expr(text_col: Column) -> Column:
    """Masked text as one nested regexp_replace chain. Email runs FIRST
    (an IPv4-shaped substring inside a hostname must disappear with the
    whole address, not leave ``user@<IP>`` behind); phone before bare
    IPv4 would be wrong the same way if phones contained dots — they
    don't, so phone/ip order is free; fixed anyway for determinism."""
    out = F.regexp_replace(text_col, EMAIL_PAT, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_PAT, IP_TOKEN)
    return F.regexp_replace(out, PHONE_PAT, PHONE_TOKEN)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Adds ``out_col`` (masked text) plus exact match counts
    (n_emails, n_ips, n_phones) — the counts feed the per-domain PII
    prevalence stats a curation pipeline reports. Counts are taken on
    the SAME intermediate the replacement chain sees (ips counted after
    email masking), so counts always equal replaced occurrences."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_PAT, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_PAT, IP_TOKEN)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(EMAIL_PAT)),
            "n_ips": F.regexp_count(after_email, F.lit(IPV4_PAT)),
            "n_phones": F.regexp_count(after_ip, F.lit(PHONE_PAT)),
            out_col: redact_pii_expr(t),
        }
    )
