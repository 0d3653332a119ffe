"""M12 few-shot prompt construction vs an in-process replica of the
reference's ``construct_contextual_prompt``
(``src/variable_extraction_GPT-3.py:21-41``)."""

import numpy as np


def _reference_prompt(query_sentence, context):
    # replica of construct_contextual_prompt: context is an ORDERED list
    # of (sentence, behaviours), most-similar first
    prompt = ""
    for s, b in context:
        prompt += "Sentence: " + s + "\n"
        prompt += "Behaviours: " + b + "\n"
    prompt += "Sentence: " + query_sentence + "\n"
    prompt += "Behaviours: "
    return prompt


def test_fewshot_prompts_match_reference_semantics(spark):
    from coap_rfc_knowledge_graph_spark.operators.prompts import fewshot_prompts, scaled_int_vec
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    d = 8
    ex_rows = [
        (j, f"example sentence {j}", f"label {j} = True;", rng.standard_normal(d).astype(float).tolist())
        for j in range(6)
    ]
    q_rows = [(100 + i, f"query sentence {i}", rng.standard_normal(d).astype(float).tolist()) for i in range(4)]
    ex = spark.createDataFrame(ex_rows, "ex_id long, sentence string, behaviours string, vec array<double>")
    qs = spark.createDataFrame(q_rows, "query_id long, sentence string, vec array<double>")
    ex = ex.withColumn("iv", scaled_int_vec(F.col("vec")))
    qs = qs.withColumn("iv", scaled_int_vec(F.col("vec")))

    k = 3
    got = {r.query_id: r.prompt for r in fewshot_prompts(qs, ex, k=k).collect()}

    # in-process oracle: scaled-int dots, reverse tuple sort (sim, ex_id)
    ev = {j: np.round(np.array(v) * 1e6).astype(np.int64) for j, _, _, v in ex_rows}
    for qid, qsent, qv in q_rows:
        qiv = np.round(np.array(qv) * 1e6).astype(np.int64)
        sims = sorted(((int(ev[j] @ qiv), j) for j in ev), reverse=True)[:k]
        context = [(f"example sentence {j}", f"label {j} = True;") for _, j in sims]
        assert got[qid] == _reference_prompt(qsent, context), qid

    # prompt shape: k context blocks + trailing query block
    any_prompt = next(iter(got.values()))
    assert any_prompt.count("Sentence: ") == k + 1
    assert any_prompt.endswith("Behaviours: ")
