"""HITS (unnormalized-integer contract) and Luby MIS: venue equality,
hand-computed cases, and a pure-python Luby reference."""

import hashlib

import numpy as np
import pyarrow as pa


def _edges(pairs, cols=("src", "dst")):
    import ray.data
    return ray.data.from_arrow(pa.table({
        cols[0]: pa.array([a for a, _ in pairs], pa.int64()),
        cols[1]: pa.array([b for _, b in pairs], pa.int64())}))


def test_hits_hand_case_and_venue_equality(ray_session):
    from rdf_mapper_ray.ops.graphs import hits_int
    # s1->{p10,p12,p14}, s3->p10, s5->p14
    ds = _edges([(1, 10), (1, 12), (1, 14), (3, 10), (5, 14)])
    a = hits_int(ds, rounds=2, venue="actors").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    d = hits_int(ds, rounds=2, venue="dataset").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a.equals(d)
    got = {int(r.node): (int(r.hub_score), int(r.auth_score))
           for r in a.itertuples()}
    # a1 = indeg: p10=2 p12=1 p14=2; h1: s1=5 s3=2 s5=2
    # a2: p10=7 p12=5 p14=7; h2: s1=19 s3=7 s5=7
    assert got == {1: (19, 0), 3: (7, 0), 5: (7, 0),
                   10: (0, 7), 12: (0, 5), 14: (0, 7)}


def test_hits_cycle_nonbipartite(ray_session):
    from rdf_mapper_ray.ops.graphs import hits_int
    # directed 3-cycle: every node is both hub and authority
    ds = _edges([(1, 2), (2, 3), (3, 1)])
    out = hits_int(ds, rounds=2, venue="dataset").to_pandas()
    got = {int(r.node): (int(r.hub_score), int(r.auth_score))
           for r in out.itertuples()}
    # a1 = 1 each; h1 = 1 each; a2 = 1; h2 = 1 (regular graph)
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 1)}


def _ref_luby(pairs, rounds=6):
    nodes = sorted({x for e in pairs for x in e})
    pri = {v: int.from_bytes(
        hashlib.md5(str(v).encode()).digest()[:8], "big")
        for v in nodes}
    nbr = {v: set() for v in nodes}
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    status = {v: 0 for v in nodes}
    for _ in range(rounds):
        join = [v for v in nodes if status[v] == 0 and
                all(pri[v] < pri[u] for u in nbr[v] if status[u] == 0)]
        for v in join:
            status[v] = 1
        for v in join:
            for u in nbr[v]:
                if status[u] == 0:
                    status[u] = 2
        if all(status.values()):
            break
    return status


def test_mis_matches_reference_on_random_graphs(ray_session):
    from rdf_mapper_ray.ops.graphs import mis_luby
    rng = np.random.RandomState(7)
    for _ in range(2):
        pairs = set()
        for _ in range(60):
            a, b = rng.randint(0, 35, 2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        out = mis_luby(_edges(pairs, cols=("a", "b")),
                       rounds=6).to_pandas()
        got = dict(zip(out["node"].astype(int),
                       out["status"].astype(int)))
        assert got == _ref_luby(pairs)
        # independence + maximality
        mis = {v for v, s in got.items() if s == 1}
        assert not any(a in mis and b in mis for a, b in pairs)
        for v, s in got.items():
            if s == 2:
                assert any((min(v, u), max(v, u)) in set(pairs)
                           for u in mis)


def test_mis_star_takes_leaves_or_center(ray_session):
    from rdf_mapper_ray.ops.graphs import mis_luby
    pairs = [(0, i) for i in range(1, 6)]
    out = mis_luby(_edges(pairs, cols=("a", "b")), rounds=4) \
        .to_pandas()
    got = dict(zip(out["node"].astype(int), out["status"].astype(int)))
    assert got == _ref_luby(pairs)
    assert 0 not in {v for v, s in got.items() if s == 0}


def _ref_stress(pairs):
    from collections import deque, defaultdict
    nbr = defaultdict(set)
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    nodes = sorted(nbr)
    stress = {v: 0 for v in nodes}
    for s in nodes:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            for u in nbr[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    sigma[u] = 0
                    q.append(u)
                    order.append(u)
                if dist[u] == dist[v] + 1:
                    sigma[u] += sigma[v]
        tau = {v: 0 for v in dist}
        for v in reversed(order):
            for u in nbr[v]:
                if u in dist and dist[u] == dist[v] + 1:
                    tau[v] += 1 + tau[u]
        for v in dist:
            if v != s:
                stress[v] += sigma[v] * tau[v]
    return stress


def test_stress_centrality_matches_brandes_reference(ray_session):
    from rdf_mapper_ray.ops.graphs import stress_centrality
    rng = np.random.RandomState(13)
    pairs = set()
    for _ in range(50):
        a, b = rng.randint(0, 28, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)
    out = stress_centrality(_edges(pairs, cols=("a", "b")),
                            max_levels=16).to_pandas()
    got = dict(zip(out["node"].astype(int), out["stress"].astype(int)))
    assert got == _ref_stress(pairs)


def test_stress_path_graph_hand_case(ray_session):
    from rdf_mapper_ray.ops.graphs import stress_centrality
    # path 0-1-2-3: interior node v at position i has
    # stress = 2 * i * (n-1-i) ordered pairs
    pairs = [(0, 1), (1, 2), (2, 3)]
    out = stress_centrality(_edges(pairs, cols=("a", "b")),
                            max_levels=8).to_pandas()
    got = dict(zip(out["node"].astype(int), out["stress"].astype(int)))
    assert got == {0: 0, 1: 4, 2: 4, 3: 0}


def test_eccentricity_path_and_components(ray_session):
    from rdf_mapper_ray.ops.graphs import eccentricity
    # path 0-1-2-3 (ecc 3,2,2,3) + separate edge 10-11 (ecc 1,1)
    pairs = [(0, 1), (1, 2), (2, 3), (10, 11)]
    out = eccentricity(_edges(pairs, cols=("a", "b")),
                       max_levels=8).to_pandas()
    got = dict(zip(out["node"].astype(int), out["ecc"].astype(int)))
    assert got == {0: 3, 1: 2, 2: 2, 3: 3, 10: 1, 11: 1}


def test_dag_layers_chain_with_shortcut(ray_session):
    from rdf_mapper_ray.ops.graphs import dag_layers
    # chain 0-1-2-3 plus shortcut 0-3: longest path wins (layer 3)
    out = dag_layers(_edges([(0, 1), (1, 2), (2, 3), (0, 3)],
                            cols=("a", "b")), max_rounds=8).to_pandas()
    got = dict(zip(out["node"].astype(int), out["layer"].astype(int)))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_stress_sampled_matches_restricted_reference(ray_session):
    from rdf_mapper_ray.ops.graphs import stress_centrality
    rng = np.random.RandomState(31)
    pairs = sorted({(min(a, b), max(a, b))
                    for a, b in rng.randint(0, 24, (45, 2)) if a != b})
    out = stress_centrality(_edges(pairs, cols=("a", "b")),
                            max_levels=16, source_mod=3).to_pandas()
    got = dict(zip(out["node"].astype(int), out["stress"].astype(int)))
    # reference restricted to sources s % 3 == 0
    from collections import deque, defaultdict
    nbr = defaultdict(set)
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    exp = {v: 0 for v in nbr}
    for s in sorted(nbr):
        if s % 3 != 0:
            continue
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            for u in nbr[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    sigma[u] = 0
                    q.append(u)
                    order.append(u)
                if dist[u] == dist[v] + 1:
                    sigma[u] += sigma[v]
        tau = {v: 0 for v in dist}
        for v in reversed(order):
            for u in nbr[v]:
                if u in dist and dist[u] == dist[v] + 1:
                    tau[v] += 1 + tau[u]
        for v in dist:
            if v != s:
                exp[v] += sigma[v] * tau[v]
    assert got == exp
