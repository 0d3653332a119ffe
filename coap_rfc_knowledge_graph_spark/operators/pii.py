"""PII redaction — the pre-training scrub every public-web corpus runs
(C4 removed pages with bad-word hits; Dolma/RefinedWeb mask emails, IP
addresses and phone numbers in place). Pure regexp projections: zero
shuffles, whole-stage codegen, pushdown-friendly.

The patterns deliberately stick to constructs whose semantics are
identical in Java regex (Spark) and RE2 (DuckDB). That EXCLUDES ``\\b``:
Java's word boundary treats Unicode letters as word characters while
RE2's is ASCII-only, so ``1.2.3.4é`` masks under RE2 but not under Java
— found by the cross-engine differential fuzz
(tests/test_curation_ops.py). RE2 also has no lookarounds, so
boundaries are expressed as EXPLICIT captured guard characters
(``(^|[^0-9.]) … (\\z|[^0-9.])``) re-emitted by the replacement
(Java ``$1``/RE2 ``\\1`` backrefs — each engine's own syntax, same
semantics).

Guard-consumption and the second IPv4 pass: when two IPs are separated
by a SINGLE delimiter character (``1.2.3.4 5.6.7.8`` — server lists and
log dumps are common in crawl text), the first match's scan consumes
the delimiter as its right guard, so the second IP lacks left context
and survives one replace pass. The IPv4 replace therefore runs TWICE:
every span left unmasked by pass one is, in pass one's OUTPUT, preceded
by a re-emitted guard or a token character (guards are restored by the
``$1 … $3`` replacement), so a second identical pass provably masks the
rest — chains of any length alternate masked/unmasked per pass and the
leftovers are never themselves guard-adjacent. Identical semantics in
Java regex and RE2, checked by the cross-engine fuzz. Email needs no
guards; the phone pattern's left edge is the literal ``+`` (its own
anchor), so neither chains this way.

The patterns are the standard recall-oriented curation shapes, not
validators (an over-match costs one masked token; an under-match leaks
PII into a trained model).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# guard classes exclude digits AND dots so a 5-part dotted string never
# yields a 4-octet prefix match
IPV4_PAT = r"(^|[^0-9.])([0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3})(\z|[^0-9.])"
PHONE_PAT = r"(\+[0-9]{1,3}-[0-9]{3}-[0-9]{4})(\z|[^0-9])"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# Java-dialect replacements (Spark). The DuckDB oracle uses \1-style.
_IP_REPL = "$1" + IP_TOKEN + "$3"
_PHONE_REPL = PHONE_TOKEN + "$2"


def redact_pii_expr(text_col: Column) -> Column:
    """Masked text as one nested regexp_replace chain. Email runs FIRST
    (an IPv4-shaped substring inside a hostname must disappear with the
    whole address, not leave ``user@<IP>`` behind); ip-then-phone order
    is free (phones contain no dots) but fixed for determinism."""
    out = F.regexp_replace(text_col, EMAIL_PAT, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_PAT, _IP_REPL)
    # second pass: spans whose left guard was consumed by a neighbouring
    # match in pass one (see module docstring)
    out = F.regexp_replace(out, IPV4_PAT, _IP_REPL)
    return F.regexp_replace(out, PHONE_PAT, _PHONE_REPL)


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
    after_ip1 = F.regexp_replace(after_email, IPV4_PAT, _IP_REPL)
    after_ip = F.regexp_replace(after_ip1, IPV4_PAT, _IP_REPL)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(EMAIL_PAT)),
            # both passes' matches count (pass two catches guard-consumed
            # neighbours), keeping counts == replaced occurrences
            "n_ips": F.regexp_count(after_email, F.lit(IPV4_PAT))
            + F.regexp_count(after_ip1, F.lit(IPV4_PAT)),
            "n_phones": F.regexp_count(after_ip, F.lit(PHONE_PAT)),
            out_col: redact_pii_expr(t),
        }
    )
