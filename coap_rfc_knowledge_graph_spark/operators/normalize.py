"""Unicode text normalization for crawled corpora.

Crawled pages mix composed and decomposed forms, compatibility glyphs
(ligatures, fullwidth forms), stray C0/C1 controls, and inconsistent
whitespace. Every downstream operator that KEYS ON TEXT — exact dedup
(md5 of text), MinHash shingles, line/paragraph dedup, winnowing
fingerprints, the tokenizer — silently fragments if 'café' appears
both NFC- and NFD-encoded, so normalization must run BEFORE the dedup
family, once, at ingest.

Spark has no JVM-native Unicode normalizer, so NFC/NFKC is the one
deliberate Arrow-batched pandas UDF on the curation path
(`unicodedata.normalize` over a whole batch; no per-row Python).
Everything else here — control stripping, whitespace collapse — stays
in native `regexp_replace` codegen. The whole pass is a projection:
zero shuffle at any corpus size.

The NFC form is value-verified cross-engine: the driver oracle runs
DuckDB's `nfc_normalize()` against the UDF output (both implement the
same Unicode normalization spec, which is version-stable for assigned
code points under normalization stability guarantees).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# C0 controls minus \t\n\r, DEL, C1 controls: never content in a text
# column (they survive charset transcoding bugs and PDF extraction)
_CONTROLS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x80-\x9f]"


def _normalizer(form: str):
    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize(form, t) if t is not None else None)

    return norm


def normalize_text(
    docs: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
    out_col: str = "norm_text",
) -> DataFrame:
    """Append ``out_col``: the Unicode-normalized text. ``form`` in
    NFC/NFKC/NFD/NFKD (NFC for storage identity; NFKC before
    tokenization when compatibility folding is wanted)."""
    if form not in {"NFC", "NFKC", "NFD", "NFKD"}:
        raise ValueError(f"unknown normalization form: {form}")
    return docs.withColumn(out_col, _normalizer(form)(F.col(text_col)))


def strip_controls(docs: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Drop C0/C1 control characters (keeping \\t \\n \\r) — native
    regexp codegen, no Python."""
    return docs.withColumn(out_col or text_col, F.regexp_replace(F.col(text_col), _CONTROLS, ""))


def collapse_whitespace(docs: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Runs of spaces/tabs -> one space; trim line edges. Newlines are
    PRESERVED (paragraph/line dedup depends on them) — native codegen."""
    c = F.regexp_replace(F.col(text_col), r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    return docs.withColumn(out_col or text_col, F.trim(c))


def normalize_corpus(docs: DataFrame, form: str = "NFC", text_col: str = "text") -> DataFrame:
    """The composed ingest pass: strip controls -> Unicode-normalize ->
    collapse whitespace, in place on ``text_col``. One projection, one
    Arrow exchange for the UDF, zero shuffle."""
    out = strip_controls(docs, text_col=text_col)
    out = normalize_text(out, form=form, text_col=text_col, out_col=text_col)
    return collapse_whitespace(out, text_col=text_col)
