"""ops/containment.py: asymmetric n-gram containment pairs."""

import numpy as np
import pytest


def test_containment_planted(ray_session):
    """A short doc pasted inside a long one: containment(short→long)=1,
    the reverse direction is small, Jaccard would be small both ways."""
    import ray.data
    from rdf_mapper_ray.ops.containment import ngram_containment_pairs
    from rdf_mapper_ray.ops.dedup import _shingle_hashes

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i}" for i in range(200))
    long_doc = filler + " " + short + " " + " ".join(
        f"v{i}" for i in range(200))
    ds = ray.data.from_items([
        {"doc_id": 1, "text": short},
        {"doc_id": 2, "text": long_doc},
        {"doc_id": 3, "text": "totally different words only here"},
    ])
    out = ngram_containment_pairs(ds, threshold=0.8).to_pandas()
    pairs = {(int(l), int(r)): c for l, r, c in
             zip(out["left_id"], out["right_id"], out["containment"])}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (2, 1) not in pairs  # reverse direction far below 0.8
    assert not any(3 in p for p in pairs)

    # reported value is the true hashed-shingle containment
    a = set(_shingle_hashes(short, 5).tolist())
    b = set(_shingle_hashes(long_doc, 5).tolist())
    assert pairs[(1, 2)] == len(a & b) / len(a)


def test_containment_identical_docs_both_directions(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.containment import ngram_containment_pairs

    t = "one two three four five six seven eight nine ten"
    ds = ray.data.from_items([
        {"doc_id": 10, "text": t},
        {"doc_id": 20, "text": t},
    ])
    out = ngram_containment_pairs(ds, threshold=0.9).to_pandas()
    got = {(int(l), int(r)): c for l, r, c in
           zip(out["left_id"], out["right_id"], out["containment"])}
    assert got == {(10, 20): 1.0, (20, 10): 1.0}


def test_containment_no_shared_shingles(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.containment import ngram_containment_pairs

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "aa bb cc dd ee ff"},
        {"doc_id": 2, "text": "gg hh ii jj kk ll"},
    ])
    out = ngram_containment_pairs(ds, threshold=0.1).to_pandas()
    assert len(out) == 0
