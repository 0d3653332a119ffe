"""Document -> clean sentence list: the byte-identical text contract.

Re-implements, as pure Python run one-document-at-a-time inside a pandas
UDF, the reference preprocessing semantics:

- RFC txt path  : ``src/prepare_pretrain_data.py:10-103`` (P1-P5 in SURVEY.md)
- PDF-spec path : ``src/prepare_pretrain_data.py:115-160`` (S2+P6-P7) --
  PDF bytes are decoded by the vendored pure-Python extractor in
  :mod:`.pdf_text` (pdfplumber is not installable here); the MQTT path
  including the positional ``[:46]+[49:]`` splice reproduces the
  reference's frozen corpus block sentence-for-sentence.
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
# Deliberately NOT here: "e.g"/"i.e" — the pretrained Punkt english model
# splits after bare "e.g." even before a lowercase token (rfc8613:
# "...a new security context, e.g. / as described in Appendix B.2.");
# the common "e.g.,"/"i.e.," forms never reach the period rule at all.
_ABBREVIATIONS = frozenset(
    {
        "cf", "vs", "al", "fig", "sec", "no",
        "resp", "approx", "incl", "rev", "ver", "st", "mr", "ms", "dr",
    }
)

# Capitalized tokens Punkt's pretrained model treats as frequent sentence
# starters: after an initial ("...with: A.") these force a boundary, while
# unknown capitalized words ("OSCORE") do not.
_SENT_STARTERS = frozenset({"If", "In", "The", "For"})

# Initial letters whose period splits before a sentence starter or a
# digit. Punkt's decision here is per-type learned statistics: the
# frozen corpus shows "A. If" / "Appendix A. The" / "with: B. In" /
# "Class U. For" / "Appendix B. 5.10.2." splitting, but "Class E. The"
# and "Appendix D. 12.1." merging — the pretrained model treats "e."
# and "d." as abbreviation-like types. Pinned from the frozen corpus.
_SPLITTING_INITIALS = frozenset({"A", "B", "U"})

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

    Mirrors Punkt's first-pass decision rule (the one nltk's pretrained
    ``english.pickle`` applies to token-final periods): a ``.`` after a
    token that is not a known abbreviation, a single-letter initial, or a
    number is a sentence boundary *regardless of the case of the next
    token* (nltk splits "accept it. error 0x87 ..." before lowercase
    "error"). Bare "e.g."/"i.e." split too (NOT in ``_ABBREVIATIONS`` —
    see the note there); abbreviation lookup is on the raw token, so a
    leading opener defeats it ("(cf." splits while "cf." does not), as
    the pretrained Punkt model behaves. Ambiguous candidates (ellipsis
    runs, numeric tokens) still require an upper/digit/opener/bullet
    start.
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
        # must be followed by whitespace (token-final punctuation)...
        k = end
        while k < n and text[k].isspace():
            k += 1
        if k == end or k >= n:
            if k >= n:
                break
            # ...EXCEPT "target.); or"-style sites: Punkt's period-context
            # regex still sees the period inside "target.);" as a
            # candidate, and boundary realignment only pulls the closer
            # run back into the previous sentence when it is followed by
            # whitespace — ");" is not, so the break lands AFTER the
            # period and "); or ..." starts the next sentence (rfc7252
            # §11.3 attack list). Only a single period after a plain
            # multi-letter non-abbreviation word behaves this way.
            word = _word_before(text, i)
            if (
                j - i == 1
                and c == "."
                and end > j  # closers were consumed
                and len(word) > 1
                and word[-1:].isalpha()
                and word.lower() not in _ABBREVIATIONS
            ):
                sentences.append(text[start:j])  # period in, closers out
                start = j
            i = end
            continue
        nxt = text[k]
        # "•" bullets start sentences; lowercase "o "/"* " RFC bullets only
        # rescue ambiguous (ellipsis) candidates — after a NUMBER Punkt
        # merges "...range 0 to 63. o Name: ..." (lowercase next, no break)
        is_bullet = (nxt in "o*" and k + 1 < n and text[k + 1].isspace()) or nxt == "•"
        # openers do NOT rescue an ambiguous run: Punkt merges
        # "d5 ... [binary]" (rfc8613 appendix A examples) — "[" starts an
        # ortho-unknown token
        nxt_ok = nxt.isupper() or nxt.isdigit() or nxt == "•"
        if j - i > 1:
            # ellipsis / "?!" runs: ambiguous, need a sentence-looking
            # start; a run wrapped by a closing quote ('or ".." (as ...')
            # is not period-final at all for Punkt -> never a boundary
            if end > j or not (nxt_ok or is_bullet):
                i = end
                continue
        elif c == ".":
            word = _word_before(text, i)
            if word and word[-1] in _CLOSERS:
                word = ""  # ".)"-style: period outside the bracket -> boundary
            low = word.lower()
            numeric = word != "" and all(ch.isdigit() or ch in ".," for ch in word)
            if low in _ABBREVIATIONS:
                i = end  # known abbreviation (raw token: "(e.g" fails -> split)
                continue
            if len(word) == 1 and word.isalpha():
                # single initial: lowercase initials ("...length n. If")
                # always merge; capitalized ones split before a digit
                # ("Appendix B. 5.10.2.") or before a frequent sentence
                # starter — and only for initials whose learned type
                # statistics say so ("A. If" splits, "Class E. The"
                # merges; "B. Frank" merges — next word not a starter)
                nxt_word = text[k:k + 12].split()[0] if text[k:] else ""
                starter = nxt_word.rstrip(",.;:").strip("\"'()[]") in _SENT_STARTERS
                split_initial = (nxt.isdigit() or starter) and word in _SPLITTING_INITIALS
                if not split_initial:
                    i = end
                    continue
            elif numeric and (nxt.isalpha() and not nxt.isupper()):
                # number+period: Punkt merges before a lowercase word
                # ("...range 0 to 63. o Name: ...") but breaks before
                # symbols/figure-art (ortho-unknown -> break)
                i = end
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


def decode_pdf(data: bytes, first: int = 0, last: int | None = None) -> list[str]:
    """Decode PDF bytes to text lines (pdfplumber page-range semantics,
    ``src/prepare_pretrain_data.py:115-119``), via the vendored pure-Python
    extractor in :mod:`.pdf_text` (ISO 32000-1 subset; reproduces
    ``extract_text(layout=False)`` for Office-generated documents)."""
    from .pdf_text import pdf_page_lines

    return pdf_page_lines(data, first, last)


def extract_mqtt_sentences(data: bytes) -> list[str]:
    """Full MQTT-spec path S2+P6+P7 — ``src/prepare_pretrain_data.py:115-160``:
    pages[10:118] -> line cleanup (drop "mqtt-v5"/"Standards Track Work
    Product" boilerplate, strip margin line numbers) -> sentence split ->
    P7 cleanup -> the reference's positional reference-splice
    ``[:46] + [49:]`` (drops three front-matter citation sentences).

    Reproduces ``data/pretrain_sentences.txt`` block 4 sentence-for-sentence
    (tests/test_pdf_text.py::test_mqtt_pdf_matches_reference_corpus).
    """
    lines, is_spec = _spec_pdf_lines(data, 10, 118, "mqtt-v5")
    cleaned = clean_spec_lines(lines, ("mqtt-v5", "Standards Track Work Product"))
    sentences = sent_tokenize("\n".join(cleaned))
    sentences = clean_spec_sentences(sentences, drop_contains=("Figure",))
    if not is_spec:
        return sentences  # not the actual spec: no positional splice
    return sentences[:46] + sentences[49:]


def _spec_pdf_lines(data: bytes, first: int, last: int,
                    fingerprint: str) -> tuple[list[str], bool]:
    """Page lines for a spec-shaped PDF. The MQTT/AMQP page ranges and
    the MQTT positional splice are reference-corpus fidelity behaviors
    for the REAL spec documents; an arbitrary crawled PDF whose url
    merely mentions the protocol (e.g. a 5-page "mqtt-tutorial.pdf")
    must not get pages sliced away or sentences spliced out. Two gates:
    the document must span the spec's page range, AND the selected pages
    must carry the spec's own boilerplate marker (``fingerprint`` — the
    per-page document identifier the OASIS template stamps on every
    page, e.g. "mqtt-v5"). A long crawled PDF that merely matches the
    url pattern fails the fingerprint and is decoded whole, unspliced."""
    from .pdf_text import PDFDocument, chunks_to_lines, page_chunks

    doc = PDFDocument(data)
    pages = doc.pages()

    def decode(selected) -> list[str]:
        lines: list[str] = []
        for page in selected:
            lines.extend(chunks_to_lines(page_chunks(doc, page)))
        return lines

    if len(pages) < last:
        return decode(pages), False
    sliced = decode(pages[first:last])
    if any(fingerprint in ln for ln in sliced):
        return sliced, True
    # fingerprint gate failed: a long crawled PDF, not the spec. Reuse the
    # already-decoded slice and decode only the pages OUTSIDE it (each page
    # decodes independently) — previously the whole document was decoded a
    # second time (ADVICE r3).
    return decode(pages[:first]) + sliced + decode(pages[last:]), False


def extract_amqp_sentences(data: bytes) -> list[str]:
    """AMQP-spec path — ``src/prepare_pretrain_data.py:163-238``:
    pages[16:119] -> line cleanup (boilerplate prefixes incl. the XML-ish
    type/encoding/descriptor fragments and hex dump lines) -> split ->
    P7 cleanup with the AMQP-specific sentence drops (XML leftovers,
    ASCII-art arrows/tables). The reference's AMQP source PDF is not part
    of its frozen test data, so this path is pinned structurally
    (tests/test_pdf_text.py) rather than against a frozen corpus block.
    """
    lines, _ = _spec_pdf_lines(data, 16, 119, "amqp-core")
    cleaned = clean_spec_lines(
        lines,
        (
            "amqp-core", "PART", "0x", "<type", "label=", "<encoding",
            "<descriptor", "Standards Track Work Product",
        ),
    )
    sentences = sent_tokenize("\n".join(cleaned))
    return clean_spec_sentences(
        sentences,
        drop_contains=("Figure", "-->", "--+", "||"),
        drop_startswith=("</type>", "<field"),
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
    - PDF magic in the binary column -> the spec-PDF path (MQTT page-range
      semantics for the known spec, generic full-document decode otherwise)
    - text present -> generic web path
    - html present only -> strip_html then generic web path
    """
    for key, (author, heading) in RFC_HEADINGS.items():
        if key in url and text is not None:
            return extract_rfc_sentences(text, author, heading)
    if html and html[:5] == b"%PDF-":
        try:
            low = url.lower()
            if "mqtt" in low:
                return extract_mqtt_sentences(html)
            if "amqp" in low:
                return extract_amqp_sentences(html)
            lines = clean_spec_lines(decode_pdf(html), drop_prefixes=())
            sentences = sent_tokenize("\n".join(lines))
            return clean_spec_sentences(sentences, drop_contains=("Figure",))
        except Exception:
            return []  # malformed PDF: skip the document, don't kill the task
    if text:
        return extract_web_sentences(text)
    if html:
        return extract_web_sentences(strip_html(html))
    return []
