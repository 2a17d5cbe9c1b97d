"""Connected-components + cluster-dedup tests."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def test_connected_components_chains_and_isolates(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.components import connected_components

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star)
    pairs = pd.DataFrame(
        {"id_a": [1, 2, 3, 10, 20, 20], "id_b": [2, 3, 4, 11, 21, 22]}
    )
    comp = connected_components(rd.from_pandas(pairs))
    m = dict(zip(comp.node_id, comp.component_id))
    assert m[1] == m[2] == m[3] == m[4] == 1
    assert m[10] == m[11] == 10
    assert m[20] == m[21] == m[22] == 20


def test_dedup_keep_cluster_min(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.components import dedup_keep_cluster_min

    docs = rd.from_arrow(
        pa.table({"doc_id": list(range(8)), "text": [f"t{i}" for i in range(8)]})
    )
    pairs = rd.from_pandas(pd.DataFrame({"id_a": [1, 2, 5], "id_b": [2, 3, 6]}))
    out = dedup_keep_cluster_min(docs, pairs).take_all()
    kept = sorted(r["doc_id"] for r in out)
    # clusters {1,2,3} -> keep 1; {5,6} -> keep 5; isolates kept
    assert kept == [0, 1, 4, 5, 7]


def test_dedup_keep_cluster_min_distributed_route_equivalent(ray_session):
    """Forcing the distributed route (threshold 0) produces exactly the
    broadcast route's output: same kept ids, same schema — the left_anti
    join path is a drop-in for the in-filter drop-set."""
    import ray.data as rd

    from ocr_suite_ray.stages.components import dedup_keep_cluster_min

    docs = rd.from_arrow(
        pa.table({"doc_id": list(range(8)), "text": [f"t{i}" for i in range(8)]})
    )
    pairs = pd.DataFrame({"id_a": [1, 2, 5], "id_b": [2, 3, 6]})
    broadcast = dedup_keep_cluster_min(docs, rd.from_pandas(pairs)).take_all()
    routed = dedup_keep_cluster_min(
        docs, rd.from_pandas(pairs), max_broadcast_edges=0
    ).take_all()
    key = lambda r: r["doc_id"]
    assert sorted(routed, key=key) == sorted(broadcast, key=key)
    assert sorted(r["doc_id"] for r in routed) == [0, 1, 4, 5, 7]


def test_minhash_to_clusters_end_to_end(ray_session):
    """Full near-dedup chain: minhash pairs -> components -> keep-one."""
    import ray.data as rd

    from ocr_suite_ray.stages.components import dedup_keep_cluster_min
    from ocr_suite_ray.stages.dedup_text import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    rows = []
    for i in range(6):
        rows.append({"doc_id": i, "text": base + f"tail {i % 2}"})  # 2 clusters of 3
    rows.append({"doc_id": 99, "text": "completely different words here entirely"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = minhash_lsh_pairs(ds, threshold=0.8)
    out = dedup_keep_cluster_min(ds, pairs).take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert 99 in kept
    assert len(kept) <= 4  # 6 near-dups collapse to <= 3 representatives


def test_connected_components_raises_on_non_convergence(ray_session):
    import pytest
    import ray.data as rd

    from ocr_suite_ray.stages.components import connected_components

    # a 6-node chain has diameter 5; min-label propagation halves the
    # distance per round, so 1 round cannot converge
    chain = pd.DataFrame({"id_a": [1, 2, 3, 4, 5], "id_b": [2, 3, 4, 5, 6]})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_pandas(chain), max_rounds=1)
    # and with enough rounds the same graph resolves to one component
    out = connected_components(rd.from_pandas(chain), max_rounds=16)
    assert set(out["component_id"]) == {1}


def test_distributed_cc_matches_broadcast(ray_session):
    """The Dataset-label variant computes the same components as the
    broadcast version on chains, random graphs, and singleton-free sets."""
    import numpy as np
    import ray.data as rd

    from ocr_suite_ray.stages.components import (
        connected_components,
        connected_components_distributed,
    )

    # one case keeps suite wall-time sane: a chain (worst-case diameter for
    # label propagation), a triangle, and random extra edges in one graph
    rng = np.random.RandomState(7)
    pairs = (
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
        + [(int(a), int(b)) for a, b in rng.randint(20, 36, size=(10, 2)) if a != b]
    )
    ds = rd.from_items([{"id_a": a, "id_b": b} for a, b in pairs])
    want = connected_components(ds).sort_values("node_id").reset_index(drop=True)
    got = (
        connected_components_distributed(ds, num_partitions=2)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    assert list(got["node_id"]) == list(want["node_id"])
    assert list(got["component_id"]) == list(want["component_id"])

def test_dedup_keep_cluster_best_policy_and_ties(ray_session):
    """Winner per cluster = max score, ties -> min id; isolates pass."""
    import ray.data as rd

    from ocr_suite_ray.stages.components import dedup_keep_cluster_best

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(8)),
                "score": [5, 1, 9, 9, 3, 2, 7, 4],
            }
        )
    )
    # clusters {1,2,3} (scores 1,9,9 -> tie 2 vs 3 -> keep 2) and
    # {5,6} (2 vs 7 -> keep 6); isolates 0,4,7 kept
    pairs = rd.from_pandas(pd.DataFrame({"id_a": [1, 2, 5], "id_b": [2, 3, 6]}))
    out = dedup_keep_cluster_best(docs, pairs, score_col="score").take_all()
    assert sorted(r["doc_id"] for r in out) == [0, 2, 4, 6, 7]


def test_dedup_keep_cluster_best_distributed_route_equivalent(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.components import dedup_keep_cluster_best

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(10)),
                "score": [5, 1, 9, 9, 3, 2, 7, 4, 0, 6],
            }
        )
    )
    pairs = pd.DataFrame({"id_a": [1, 2, 5, 8], "id_b": [2, 3, 6, 9]})
    broadcast = dedup_keep_cluster_best(
        docs, rd.from_pandas(pairs), score_col="score"
    ).take_all()
    routed = dedup_keep_cluster_best(
        docs, rd.from_pandas(pairs), score_col="score", max_broadcast_edges=0
    ).take_all()
    key = lambda r: r["doc_id"]
    assert sorted(routed, key=key) == sorted(broadcast, key=key)
    assert sorted(r["doc_id"] for r in routed) == [0, 2, 4, 6, 7, 9]


def test_dedup_keep_cluster_best_no_pairs_passthrough(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.components import dedup_keep_cluster_best

    docs = rd.from_arrow(pa.table({"doc_id": [1, 2], "score": [3, 4]}))
    pairs = rd.from_pandas(pd.DataFrame({"id_a": [], "id_b": []}).astype("int64"))
    out = dedup_keep_cluster_best(docs, pairs, score_col="score").take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2]
