"""Round-4 session-9 ops: RDFS domain/range inference and friends."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_domain_range_planted(ray_session):
    """rdfs2/rdfs3 on a tiny graph: domain types subjects, range types
    objects, distinct entities counted once per class."""
    import ray.data
    from rdf_mapper_ray.ops.ontology import domain_range_infer

    rows = [
        {"subject": "s1", "predicate": "knows", "object_value": "s2"},
        {"subject": "s1", "predicate": "knows", "object_value": "s3"},
        {"subject": "s2", "predicate": "knows", "object_value": "s3"},
        {"subject": "s1", "predicate": "owns", "object_value": "car1"},
        {"subject": "s9", "predicate": "ignored", "object_value": "x"},
    ]
    out = domain_range_infer(
        ray.data.from_items(rows),
        {"knows": ("Person", "Person"), "owns": ("Person", None)},
    ).to_pandas()
    got = dict(zip(out["class"], out["n_entities"]))
    # Person: s1, s2 (subjects) ∪ s2, s3 (objects) = {s1,s2,s3}
    assert got == {"Person": 3}
    assert out["n_entities"].dtype == np.int64


def test_domain_range_range_only_class(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.ontology import domain_range_infer

    rows = [
        {"subject": "a", "predicate": "p", "object_value": "v1"},
        {"subject": "b", "predicate": "p", "object_value": "v1"},
        {"subject": "a", "predicate": "q", "object_value": "v2"},
    ]
    out = domain_range_infer(
        ray.data.from_items(rows),
        {"p": ("S", "V"), "q": (None, "V")},
    ).to_pandas()
    got = dict(zip(out["class"], out["n_entities"]))
    assert got == {"S": 2, "V": 2}
    assert list(out["class"]) == sorted(out["class"])
