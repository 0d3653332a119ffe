"""Generate + certify the vendored numpy NER checkpoint
(``coap_rfc_knowledge_graph_spark/assets/tiny_bert_ner.npz``).

The weights are CONSTRUCTED, not trained (no training framework in this
container), but the forward pass they parameterize is a real 1-layer
transformer (``functions/wordpiece.TinyBertTagger``): token+position
embeddings, one softmax attention head, ReLU MLP, layer norm, linear
head. Construction:

- token embeddings carry entity-ness on dim 0 (+3 entity piece, -3
  otherwise) and small seeded noise on dims 2..31;
- position embeddings are the standard basis of dims 32..63 (so max
  context = 32 pieces — the checkpoint's truncation window);
- the attention head attends (softly, ~1-1e-8) to the PREVIOUS
  position: W_q shifts the position one-hot back by one and scales it,
  W_k projects the position part, W_v writes the attended token's
  entity-ness onto dim 1 — so B-vs-I is a contextual decision computed
  by attention, as in a real BIO tagger;
- the classifier reads dims 0/1 after layer norm into the REFERENCE's
  label scheme B=0, I=1, O=2, PAD=3
  (``src/extract_all_MQTT_entities.py:26``); PAD wins only at [PAD]
  tokens via a dedicated embedding dim.

Certification (the part that makes the checkpoint usable as a test
oracle): for EVERY vocab piece in EVERY prev-piece context class
(entity / non-entity / [CLS]) the argmax label must equal the closed
form rule  label(p | prev) = B if p entity and prev not, I if both
entity, O otherwise  — generation fails otherwise. The certified
entity-piece set ships inside the npz.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coap_rfc_knowledge_graph_spark.functions.stub_models import _LEXICON
from coap_rfc_knowledge_graph_spark.functions.wordpiece import (
    CLS,
    PAD,
    SEP,
    UNK,
    TinyBertTagger,
)

D, H, C, MAX_POS = 64, 128, 4, 32
B_TAG, I_TAG, O_TAG, P_TAG = 0, 1, 2, 3

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "coap_rfc_knowledge_graph_spark",
    "assets",
    "tiny_bert_ner.npz",
)


def build_vocab() -> tuple[list[str], frozenset[str]]:
    entity_pieces = sorted(_LEXICON) + ["co", "##ap", "mq", "##tt"]
    filler = [
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
        "be", "been", "must", "may", "should", "shall", "not", "send",
        "sends", "sent", "reset", "empty", "set", "uses", "use", "with",
        "for", "each", "this", "that", "it", "on", "as", "by", "if", "then",
        "when", "new", "all", "any", "no", "over", "after", "before",
        "##ing", "##ed", "##s", "##er", ".", ",", ";", ":", "(", ")",
    ] + [str(i) for i in range(10)]
    specials = [PAD, UNK, CLS, SEP]
    seen: set[str] = set()
    vocab: list[str] = []
    for t in specials + entity_pieces + filler:
        if t not in seen:
            seen.add(t)
            vocab.append(t)
    return vocab, frozenset(entity_pieces)


def build_weights(vocab: list[str], entity: frozenset[str]) -> dict[str, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(key=20260817))
    V = len(vocab)
    tok = np.zeros((V, D))
    tok[:, 2:32] = 0.1 * rng.standard_normal((V, 30))
    for i, t in enumerate(vocab):
        tok[i, 0] = 3.0 if t in entity else -3.0
    pad_id = vocab.index(PAD)
    tok[pad_id, 2] = 6.0  # dedicated PAD signal dim

    pos = np.zeros((MAX_POS, D))
    for i in range(MAX_POS):
        pos[i, 32 + i] = 1.0

    scale = 160.0  # score = 160/sqrt(64) = 20 on the prev position, 0 elsewhere
    wq = np.zeros((D, D))
    for i in range(1, MAX_POS):
        wq[32 + i, 32 + i - 1] = scale
    wk = np.zeros((D, D))
    for i in range(MAX_POS):
        wk[32 + i, 32 + i] = 1.0
    wv = np.zeros((D, D))
    wv[0, 1] = 1.0  # attended token's entity-ness -> dim 1

    mlp_w1 = 0.02 * rng.standard_normal((D, H))
    mlp_w2 = 0.02 * rng.standard_normal((H, D))
    ln_g = np.ones(D)
    ln_b = np.zeros(D)

    cls_w = np.zeros((D, C))
    cls_w[0, B_TAG], cls_w[1, B_TAG] = 2.0, -2.0
    cls_w[0, I_TAG], cls_w[1, I_TAG] = 2.0, 2.0
    cls_w[0, O_TAG] = -2.0
    cls_w[2, P_TAG] = 3.0
    cls_b = np.array([0.0, 0.0, 0.0, -8.0])

    return {
        "tok_emb": tok, "pos_emb": pos, "wq": wq, "wk": wk, "wv": wv,
        "mlp_w1": mlp_w1, "mlp_w2": mlp_w2, "ln_g": ln_g, "ln_b": ln_b,
        "cls_w": cls_w, "cls_b": cls_b,
    }


def certify(clf: TinyBertTagger, vocab: list[str], entity: frozenset[str]) -> None:
    ids = clf.tokenizer.ids
    ent_probe, non_probe = vocab.index("server"), vocab.index("the")
    failures = []
    for p in vocab:
        if p in (PAD, CLS, SEP):
            continue
        for prev_name, prev_id, prev_is_ent in [
            ("ent", ent_probe, True), ("non", non_probe, False), ("cls", ids[CLS], False),
        ]:
            seq = np.array([[ids[CLS], prev_id, ids[p], ids[SEP], ids[PAD]]])
            got = int(clf.tag_ids(seq)[0, 2])
            if p in entity:
                want = I_TAG if prev_is_ent else B_TAG
            else:
                want = O_TAG
            if got != want:
                failures.append((p, prev_name, got, want))
            pad_got = int(clf.tag_ids(seq)[0, 4])
            if pad_got != P_TAG:
                failures.append((PAD, p, pad_got, P_TAG))
    if failures:
        raise SystemExit(f"certification FAILED for {len(failures)} probes: {failures[:10]}")
    print(f"certified {len(vocab) - 3} pieces x 3 contexts + PAD positions: all match the rule")


def main() -> None:
    vocab, entity = build_vocab()
    weights = build_weights(vocab, entity)
    clf = TinyBertTagger(weights, vocab)
    certify(clf, vocab, entity)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(
        OUT,
        vocab=np.array(vocab),
        entity_pieces=np.array(sorted(entity)),
        **{k: v for k, v in weights.items()},
    )
    size = os.path.getsize(OUT)
    print(f"wrote {OUT} ({size/1024:.1f} KiB, |V|={len(vocab)})")


if __name__ == "__main__":
    main()
