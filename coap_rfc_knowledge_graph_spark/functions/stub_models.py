"""Deterministic stand-ins for the reference's fine-tuned models.

The reference ships no model weights (``.gitignore``-ed; see
``/root/reference/.MISSING_LARGE_BLOBS`` note in FIXTURES.md) and this
container has no torch/transformers, so every learned component is
replaced by a deterministic, process-stable function with the same
input/output contract. Each is batch-oriented (list in -> list out) so it
drops into an Arrow-batched pandas UDF with zero per-row Python dispatch
overhead at the Spark boundary.

Swap points for real models are documented per class; the pipeline code
only depends on these call signatures.

Contracts emulated:
- NER tagger     : ``src/entity_extractor.py:54`` (4-label token classifier)
- relation clf   : ``src/relation_extractor.py:59-68`` (8-class sequence clf)
- phrase encoder : PhraseBERT ``src/CoAP_contradiction_checking.py:269-271``
- condition split: GPT-2 prompt "Sentence: X\\nAntecedent:" ``src/condition_split.py:60-66``
- properties gen : GPT-2 "entity @ behaviour = bool;" grammar
  ``src/properties_extractor.py:64-71, 119-564``
- coref QA       : ``src/corefernece_resolution.py:277-305``
"""

from __future__ import annotations

import hashlib
import math
import re

from ..config import EMBED_DIM, MODAL_KEYWORDS, RELATIONS
from .tokenizer import CLS, PAD, SEP

# --- NER tagger --------------------------------------------------------------

# B-entity=0, I-entity=1, Other=2, PAD=3 (src/extract_all_MQTT_entities.py:26)
B, I, O, P = 0, 1, 2, 3

_LEXICON = frozenset(
    {
        "message", "messages", "server", "client", "option", "options",
        "token", "response", "request", "endpoint", "payload", "packet",
        "field", "value", "version", "code", "header", "broker", "session",
        "topic", "frame", "channel", "link", "connection",
        # web-corpus nouns so the linking stages stay non-trivial on the
        # synthetic documents/pages tables (a real NER model generalizes;
        # the stub needs its vocabulary spelled out)
        "table", "row", "column", "key", "query", "window", "stream",
        "vector", "batch", "customer", "order", "part", "join", "hash",
        "merge", "sort", "line", "scan", "data", "supplier", "nation",
    }
)
_MODALS = frozenset(MODAL_KEYWORDS)


def _is_entity_token(tok: str) -> bool:
    if tok in _MODALS or not tok[:1].isalpha():
        return False
    return tok[0].isupper() or tok.lower() in _LEXICON


def tag_tokens(tokens: list[str]) -> list[int]:
    """BIO tags for one padded token sequence. Deterministic rule 'model':
    maximal runs of capitalized/lexicon tokens are entities. First real
    token of a sentence is only an entity if in the lexicon (it is
    capitalized merely by position)."""
    tags: list[int] = []
    prev_entity = False
    for idx, tok in enumerate(tokens):
        if tok == PAD:
            tags.append(P)
            prev_entity = False
            continue
        if tok in (CLS, SEP):
            tags.append(O)
            prev_entity = False
            continue
        is_first_word = idx == 1
        ent = _is_entity_token(tok)
        if ent and is_first_word and tok.lower() not in _LEXICON:
            ent = False
        if ent:
            tags.append(I if prev_entity else B)
        else:
            tags.append(O)
        prev_entity = ent
    return tags


def tag_batch(token_lists: list[list[str]]) -> list[list[int]]:
    """Batch entry point (what a real model would replace: broadcast a
    torch checkpoint, run ``model(input_ids).logits.argmax(-1)`` per Arrow
    batch under ``torch.no_grad()``)."""
    return [tag_tokens(toks) for toks in token_lists]


# --- BIO span decode ----------------------------------------------------------


def decode_spans(tags: list[int]) -> list[tuple[int, int]]:
    """State machine over tag ids, reference-equivalent to
    ``src/extract_all_MQTT_entities.py:107-138``: emits (begin, end)
    inclusive token index pairs; B->B closes the open span; O closes; PAD
    breaks."""
    spans: list[tuple[int, int]] = []
    current: list[int] = []
    for j, t in enumerate(tags):
        if t == B and not current:
            current = [j]
        elif t == B and current:
            spans.append((current[0], current[-1] + 1))  # ref includes j
            current = [j]
        elif t == I and current:
            current.append(j)
        elif t == O and current:
            spans.append((current[0], current[-1]))
            current = []
        elif t == P:
            break
    return spans


# --- relation classifier -------------------------------------------------------

_N_RELATIONS = len(RELATIONS)


def _md5_int(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def classify_relation(marked_sentence: str) -> int:
    """8-class prediction for a sentence with [E1]/[E2] markers.
    Deterministic hash model: ~40% of pairs get a non-zero relation."""
    h = _md5_int(marked_sentence)
    if h % 100 < 60:
        return 0
    return 1 + (h // 100) % (_N_RELATIONS - 1)


def classify_relation_batch(marked_sentences: list[str]) -> list[int]:
    return [classify_relation(s) for s in marked_sentences]


# --- phrase encoder -------------------------------------------------------------


_STOP_PREFIX = ("the", "a", "an")


def _stem(word: str) -> str:
    if len(word) > 3 and word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


def embed_phrase(phrase: str, dim: int = EMBED_DIM) -> list[float]:
    """Hashing embedding over stemmed-word features (weight 2) + char
    trigrams (weight 1), L2-normalized. Morphological variants land above
    the 0.9 merge threshold, unrelated phrases well below — the cosine
    geometry the PhraseBERT stage it stands in for relies on."""
    words = [_stem(w) for w in re.findall(r"[a-z0-9]+", phrase.lower())]
    if words and words[0] in _STOP_PREFIX:
        words = words[1:] or words
    vec = [0.0] * dim
    for w in words:
        h = _md5_int("w:" + w)
        vec[h % dim] += 2.0 if (h >> 33) & 1 else -2.0
    text = f"##{' '.join(words)}##"
    for i in range(len(text) - 2):
        h = _md5_int(text[i : i + 3])
        vec[h % dim] += 1.0 if (h >> 33) & 1 else -1.0
    norm = math.sqrt(sum(v * v for v in vec))
    if norm == 0.0:
        vec[0] = 1.0
        return vec
    return [v / norm for v in vec]


def embed_batch(phrases: list[str], dim: int = EMBED_DIM) -> list[list[float]]:
    return [embed_phrase(p, dim) for p in phrases]


def cosine(a: list[float], b: list[float]) -> float:
    return sum(x * y for x, y in zip(a, b))  # inputs are L2-normalized


# --- condition splitter -----------------------------------------------------------

_COND_RE = re.compile(
    r"\b(if|when|unless|in case)\b(?P<ante>[^,;]*)", re.IGNORECASE
)


def split_condition(sentence: str) -> list[tuple[str, str]]:
    """Sentence -> [(condition_kind, clause_text)] where kind is one of
    'Entity rule' | 'Antecedent rule' | 'Consequent rule'.

    Emulates the generative splitter's downstream contract
    (``src/condition_split.py:60-66`` output grammar; consumption at
    ``src/CoAP_contradiction_checking.py:335-377``): unconditional
    sentences produce a single Entity rule; conditional sentences produce
    an Antecedent rule (the if/when clause) followed by a Consequent rule
    (the remainder)."""
    m = _COND_RE.search(sentence)
    if not m:
        return [("Entity rule", sentence)]
    ante = m.group(0).strip()
    conseq = (sentence[: m.start()] + " " + sentence[m.end() :]).strip(" ,;")
    conseq = re.sub(" +", " ", conseq)
    if not conseq:
        return [("Entity rule", sentence)]
    # the reference's generative splitter may emit MULTIPLE consequents
    # for one antecedent ("possibly multiple A/C pairs",
    # src/condition_split.py:60-66) — the '; also ' coordination is the
    # stub's deterministic trigger for that shape (exercises the N10
    # antecedent x consequents fan-out and Q5)
    parts = [p.strip(" ,;") for p in re.split(r";\s*also\s+", conseq)]
    return [("Antecedent rule", ante)] + [("Consequent rule", p) for p in parts if p]


def split_condition_batch(sentences: list[str]) -> list[list[tuple[str, str]]]:
    return [split_condition(s) for s in sentences]


# --- properties generator -----------------------------------------------------------

_SET_TO_RE = re.compile(r"\bset to ([\w.\" ]{1,24}?)(?:[,.;]|$)", re.IGNORECASE)
_BETWEEN_RE = re.compile(r"\bbetween (\d+) and (\d+)\b", re.IGNORECASE)
_NEG_RE = re.compile(r"\b(MUST NOT|SHALL NOT|SHOULD NOT|MAY NOT|NOT RECOMMENDED)\b")


def generate_properties(clause: str, entity_surface: str) -> str:
    """Clause + subject entity -> 'entity @ behaviour = True|False; ...'
    string in the grammar parsed by operators/properties.py. Deterministic
    keyword rules chosen to exercise every branch of the reference's
    ``extract_properties`` (``src/CoAP_contradiction_checking.py:26-202``)."""
    sentiment = "False" if _NEG_RE.search(clause) else "True"
    entity = (entity_surface or "unknown entity").strip().lower()
    low = clause.lower()
    m = _BETWEEN_RE.search(clause)
    if m:
        behaviour = f"be between {m.group(1)} and {m.group(2)}"
    else:
        m2 = _SET_TO_RE.search(clause)
        if m2:
            behaviour = f"be set to {m2.group(1).strip()}"
        elif "silently ignored" in low or "ignored" in low:
            behaviour = "be ignored"
        elif "ignore" in low:
            behaviour = "ignore the option"
        elif "message format error" in low:
            behaviour = "be processed as a message format error"
        elif "reject" in low and "message" in low:
            behaviour = "reject the message"
        elif "rejected" in low:
            behaviour = "be rejected"
        elif "idempotent" in low:
            behaviour = "be idempotent"
        elif "empty" in low:
            behaviour = "be Empty"
        elif "default value" in low:
            behaviour = "use the default value"
        elif "response code" in low:
            digits = re.findall(r"\b\d+\b", clause)[:2]
            behaviour = "return a Response Code " + ".".join(digits or ["4", "04"])
        else:
            words = re.findall(r"[a-z]+", low)
            behaviour = "value be " + (words[-1] if words else "unspecified")
    return f"{entity} @ {behaviour} = {sentiment};"


def generate_properties_batch(clauses: list[str], entities: list[str]) -> list[str]:
    return [generate_properties(c, e) for c, e in zip(clauses, entities)]


# --- coreference QA -------------------------------------------------------------------

_CAP_RUN_RE = re.compile(r"\b([A-Z][\w-]*(?: [A-Z][\w-]*)*)\b")


def answer_coref(context: str, pronoun: str, occurrence: int) -> str:
    """QA model stand-in: the antecedent of a pronoun is the last
    capitalized token run in the context before the pronoun's occurrence
    (``src/corefernece_resolution.py:277-305`` contract: span text out)."""
    pat = re.compile(r"\b" + re.escape(pronoun) + r"\b")
    starts = [m.start() for m in pat.finditer(context)]
    cut = starts[occurrence - 1] if 0 < occurrence <= len(starts) else len(context)
    skip = {"The", "Then", "A", "An", "This", "That", "If", "When", "It", "Its",
            "These", "Those", "They", "There", "Thus", "In", "For", "As", "See"}
    cands = []
    for m in _CAP_RUN_RE.finditer(context, 0, cut):
        words = [w for w in m.group(1).split() if w not in skip]
        c = " ".join(words)
        if c and c not in _MODALS and len(c) > 1:
            cands.append(c)
    return cands[-1] if cands else ""


def answer_coref_batch(rows: list[tuple[str, str, int]]) -> list[str]:
    return [answer_coref(c, p, n) for c, p, n in rows]


# --- M13 variable extractor (sentence-only generative head) ---------------------------

_SKIP_CAPS = {"The", "Then", "A", "An", "This", "That", "If", "When", "It", "Its",
              "These", "Those", "They", "There", "Thus", "In", "For", "As", "See"}


def extract_variables(sentence: str) -> str:
    """GPT-2 variable-extractor stand-in: ``Sentence: X\\nBehaviours:``
    -> the same ``entity @ behaviour = True|False;`` grammar as M10, but
    with the subject inferred from the SENTENCE ALONE (the reference's
    M13 model sees no context — ``src/variable_extractor_generate_
    GPT-2.py:56-62`` prompts with just the rule sentence). Subject =
    first capitalized run that isn't a determiner/modal."""
    for m in _CAP_RUN_RE.finditer(sentence):
        words = [w for w in m.group(1).split() if w not in _SKIP_CAPS and w not in _MODALS]
        c = " ".join(words)
        if c and len(c) > 1:
            return generate_properties(sentence, c)
    return generate_properties(sentence, "unknown entity")


def extract_variables_batch(sentences: list[str]) -> list[str]:
    return [extract_variables(s) for s in sentences]
