"""Document -> clean sentence list: the byte-identical text contract.

Re-implements, as pure Python run one-document-at-a-time inside a pandas
UDF, the reference preprocessing semantics:

- RFC txt path  : ``src/prepare_pretrain_data.py:10-103`` (P1-P5 in SURVEY.md)
- PDF-spec path : ``src/prepare_pretrain_data.py:115-160`` (P6-P7) -- the
  line-filter/cleanup stages are real; actual PDF byte decoding is stubbed
  (pdfplumber is not available in this environment, see ``decode_pdf``).
- generic web path: the cleanup pipeline applied to Common-Crawl-style
  pages (html tag strip + the P6-style line cleanup + P7 sentence cleanup).

The reference uses ``nltk.sent_tokenize`` (Punkt). nltk is not available
here, so :func:`sent_tokenize` is a deterministic Punkt-like boundary
detector. The *byte-identical* contract enforced by tests is: the Spark
UDF output equals this module's in-process output for every document,
byte for byte (tests/test_text_extract.py, tests/test_sentences_spark.py).

Everything here is deliberately dependency-free so that the identical
code object runs on driver (oracle) and executors (UDF) with no skew.
"""

from __future__ import annotations

import re

# --- sentence tokenizer ----------------------------------------------------

# Abbreviations that never end a sentence (lower-cased, no trailing dot).
_ABBREVIATIONS = frozenset(
    {
        "e.g", "i.e", "cf", "vs", "al", "fig", "sec", "no",
        "resp", "approx", "incl", "rev", "ver", "st", "mr", "ms", "dr",
    }
)

_OPENERS = "\"'([{"
_CLOSERS = "\"')]}"


def _word_before(text: str, idx: int) -> str:
    """The maximal non-space run ending just before ``idx`` (exclusive)."""
    j = idx
    while j > 0 and not text[j - 1].isspace():
        j -= 1
    return text[j:idx]


def sent_tokenize(text: str) -> list[str]:
    """Deterministic Punkt-like sentence splitter.

    A candidate boundary is ``.``/``!``/``?`` (plus trailing closers)
    followed by whitespace and an upper-case letter, digit+``.`` heading,
    or an opener. Candidates are suppressed after known abbreviations,
    single capital initials ("B. Frank"), and dotted tokens like "7.1"
    or "e.g." (token containing an interior dot).
    """
    sentences: list[str] = []
    n = len(text)
    start = 0
    i = 0
    while i < n:
        c = text[i]
        if c not in ".!?":
            i += 1
            continue
        # consume a run of terminals plus any closing quotes/brackets
        j = i + 1
        while j < n and text[j] in ".!?":
            j += 1
        end = j
        while end < n and text[end] in _CLOSERS:
            end += 1
        # must be followed by whitespace then a plausible sentence opener
        k = end
        while k < n and text[k].isspace():
            k += 1
        if k == end or k >= n:
            i = end
            if k >= n:
                break
            continue
        nxt = text[k]
        # "o "/"* " are RFC bullet markers: Punkt splits before bullets
        is_bullet = nxt in "o*" and k + 1 < n and text[k + 1].isspace()
        if not (nxt.isupper() or nxt in _OPENERS or nxt.isdigit() or is_bullet):
            i = end
            continue
        if c == "." and j - i == 1:
            word = _word_before(text, i)
            if word and word[-1] in _CLOSERS:
                word = ""  # ".)"-style: period outside the bracket -> boundary
            bare = word.rstrip(".").lstrip("\"'([{")
            low = bare.lower()
            # a pure dotted-number token ("1.1.", "Section 5.1.") is a
            # boundary — Punkt splits after numeric references
            word_start = i - len(word)
            numeric_heading = bare != "" and all(ch.isdigit() or ch == "." for ch in bare)
            if low in _ABBREVIATIONS:
                i = end
                continue
            if len(bare) == 1 and bare.isupper():
                # single initial ("B. Frank") — except document references
                # like "Appendix A.", which Punkt treats as boundaries
                prev = _word_before(text, word_start - 1) if word_start > 0 else ""
                if prev not in ("Appendix", "Annex"):
                    i = end
                    continue
            elif "." in bare and not bare.endswith("..") and not numeric_heading:
                i = end  # dotted token: "7.1bis", "e.g", mid-line "5.1."
                continue
        sentences.append(text[start:end])
        start = k
        i = end
    tail = text[start:]
    if tail.strip():
        sentences.append(tail)
    return sentences


# --- RFC txt path (P1-P5) ---------------------------------------------------


def extract_rfc_sentences(raw: str, author_heading: str, rfc_heading: str) -> list[str]:
    """Whole-RFC-document extraction, reference-equivalent.

    Faithful to ``src/prepare_pretrain_data.py:10-103`` including its
    quirks: header removal uses first-occurrence ``list.remove`` semantics;
    body start is the SECOND line ending "Introduction" when present (the
    ToC entry is the first); body end is the earlier of Acknowledg(e)ments
    / References; Figure/Table lines get a "." appended before sentence
    split so they form their own sentence, then captioned sentences are
    blanked. Only divergence: the reference raises TypeError when one of
    the end markers is missing (never happens on its corpus); we treat a
    missing marker as +infinity.
    """
    lines = raw.split("\n")
    kept = lines.copy()
    for i in range(len(lines)):
        line = lines[i].strip()
        if line.startswith(author_heading) and line.endswith("]"):
            kept.remove(lines[i])
        elif line == "":
            kept.remove(lines[i])
        elif rfc_heading in lines[i]:
            kept.remove(lines[i])

    start1 = None
    start2 = None
    for i, line in enumerate(kept):
        if line.strip().endswith("Introduction"):
            if start1 is None:
                start1 = i
                continue
            start2 = i
            break
    start = start2 if start2 is not None else start1
    kept = kept[start:] if start is not None else kept

    end1 = None
    end2 = None
    for i, line in enumerate(kept):
        s = line.strip()
        if end1 is None and (s.endswith("Acknowledgements") or s.endswith("Acknowledgments")):
            end1 = i
        if end2 is None and s.endswith("References"):
            end2 = i
        if end1 is not None and end2 is not None:
            break

    for i, line in enumerate(kept):
        s = line.strip()
        if s.startswith("Figure") or s.startswith("Table"):
            kept[i] = kept[i] + "."

    if end1 is None and end2 is None:
        body = "\n".join(kept)
    elif end2 is None or (end1 is not None and end1 < end2):
        body = "\n".join(kept[:end1])
    else:
        body = "\n".join(kept[:end2])

    sentences = sent_tokenize(body)
    return _clean_rfc_sentences(sentences)


def _clean_rfc_sentences(sentences: list[str]) -> list[str]:
    """P3+P5 cleanup — ``src/prepare_pretrain_data.py:77-102``."""
    out = []
    for s in sentences:
        s = s.replace("\n", "")
        if not any(ch.isalpha() for ch in s):
            s = ""
        if "Figure" in s and ":" in s:
            s = ""
        if "Table" in s and ":" in s:
            s = ""
        if "+---" in s:
            s = ""
        if "no state!" in s:
            s = ""
        if s == "":
            continue
        s = re.sub(" +", " ", s)
        if s.startswith(" "):
            s = s[1:]
        if "- " in s:
            s = s.replace("- ", "-")
        out.append(s)
    return out


# --- PDF-spec path (P6-P7) ---------------------------------------------------


def decode_pdf(data: bytes) -> list[str]:  # pragma: no cover - stub
    """Decode PDF bytes to text lines (pdfplumber page-range semantics,
    ``src/prepare_pretrain_data.py:115-119``). pdfplumber is not installed
    in this container; the Spark-side plumbing (binary column -> pandas UDF
    -> line cleanup) is real and tested with the txt/html paths."""
    raise NotImplementedError(
        "PDF decoding requires pdfplumber; install it and ship via "
        "spark-submit --archives. Line/sentence cleanup stages are "
        "implemented and tested independently of the decoder."
    )


def clean_spec_lines(lines: list[str], drop_prefixes: tuple[str, ...]) -> list[str]:
    """P6 line cleanup — ``src/prepare_pretrain_data.py:120-141``.

    Strip, drop all-non-alpha lines and boilerplate prefixes, and strip a
    leading page number (first whitespace token all-digits).
    """
    out = []
    for line in lines:
        line = line.strip()
        if not any(c.isalpha() for c in line):
            line = ""
        for p in drop_prefixes:
            if line.startswith(p):
                line = ""
                break
        if line == "":
            continue
        separate = line.split(" ", 1)
        if separate[0].isdigit() and len(separate) > 1:
            out.append(separate[1])
        else:
            out.append(line)
    return out


def clean_spec_sentences(sentences: list[str], drop_contains: tuple[str, ...] = ("Figure",),
                         drop_startswith: tuple[str, ...] = ()) -> list[str]:
    """P7 sentence cleanup — ``src/prepare_pretrain_data.py:146-158, 211-238``."""
    out = []
    for s in sentences:
        s = s.strip().replace("\n", " ")
        s = re.sub(" +", " ", s)
        if not any(c.isalpha() for c in s):
            s = ""
        for sub in drop_contains:
            if sub in s:
                s = ""
                break
        for p in drop_startswith:
            if s.startswith(p):
                s = ""
                break
        if s:
            out.append(s)
    return out


# --- generic Common-Crawl-style web path -------------------------------------

_TAG_RE = re.compile(rb"<script\b.*?</script>|<style\b.*?</style>", re.S | re.I)
_TAG_STRIP_RE = re.compile(rb"<[^>]+>")
_BLOCK_TAG_RE = re.compile(rb"</?(p|div|br|li|tr|h[1-6]|section|article)\b[^>]*>", re.I)


def strip_html(html: bytes) -> str:
    """Minimal deterministic boilerplate strip for the ``html`` binary
    column: drop script/style, turn block tags into newlines, strip the
    rest, decode utf-8 (replace)."""
    body = _TAG_RE.sub(b" ", html)
    body = _BLOCK_TAG_RE.sub(b"\n", body)
    body = _TAG_STRIP_RE.sub(b" ", body)
    text = body.decode("utf-8", errors="replace")
    text = text.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">").replace("&nbsp;", " ")
    return text


def extract_web_sentences(text: str) -> list[str]:
    """Generic page text -> clean sentences (the at-scale default path):
    P6-style line cleanup (no spec prefixes) + split + P7 cleanup."""
    lines = clean_spec_lines(text.split("\n"), drop_prefixes=())
    joined = "\n".join(lines)
    sentences = sent_tokenize(joined)
    return clean_spec_sentences(sentences, drop_contains=("Figure",))


# --- dispatcher used by the Spark UDF ----------------------------------------

# per-source heading metadata for the four RFC docs embedded in fixtures
# (``src/prepare_pretrain_data.py:106-112``)
RFC_HEADINGS = {
    "rfc7252": ("Shelby, et al.", "RFC 7252"),
    "rfc7959": ("Bormann & Shelby", "RFC 7959"),
    "rfc8613": ("Selander, et al.", "RFC 8613"),
    "rfc8974": ("?", "?"),
}


def extract_document(url: str, html: bytes | None, text: str | None, lang: str | None) -> list[str]:
    """One page -> sentence list. Routing:

    - url containing a known rfc id -> the RFC txt contract (byte-identical path)
    - text present -> generic web path
    - html present only -> strip_html then generic web path
    """
    for key, (author, heading) in RFC_HEADINGS.items():
        if key in url and text is not None:
            return extract_rfc_sentences(text, author, heading)
    if text:
        return extract_web_sentences(text)
    if html:
        return extract_web_sentences(strip_html(html))
    return []
