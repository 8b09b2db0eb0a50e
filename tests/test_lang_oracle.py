"""LangID's SQL oracle replays the Python classifier bit-exactly:
trigram profile construction, min-intersection scoring, and the
first-dict-order-wins tie rule (including the all-zero → 'unknown'
case). No Ray needed — the classifier itself is pure."""

import duckdb
import pandas as pd

from rdf_mapper_ray.ops.text import LANG_ID_ORACLE_SQL, LangID


def test_lang_id_oracle_matches_classifier():
    lid = LangID()
    docs = pd.DataFrame({"doc_id": range(10), "text": [
        "",                                   # no words -> unknown
        "   ",                                # whitespace only
        "the der le de 的",                   # five-way near-tie
        "xyzzy qwfp vvv",                     # zero overlap -> unknown
        "the the the und und und",            # en-vs-de tie -> en (order)
        "  the and of to in is  ",            # leading/trailing ws
        "的 一 是 在 不 了 有",                # zh unicode trigrams
        "le la et les des en un du",          # fr
        "de la que el en y los del",          # es (shares words with fr)
        ("word " * 300).strip(),              # >200-word truncation path
    ]})
    py = {i: lid.classify(t) for i, t in zip(docs.doc_id, docs.text)}
    con = duckdb.connect()
    con.register("documents", docs)
    out = con.execute(LANG_ID_ORACLE_SQL).df()
    assert len(out) == len(docs)
    for d, s in zip(out.doc_id, out.predicted_lang):
        assert py[int(d)] == s, (d, py[int(d)], s)
