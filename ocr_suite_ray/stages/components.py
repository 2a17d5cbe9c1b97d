"""Connected components over candidate-duplicate pairs → dup clusters.

The last mile of near-dedup: MinHash/SimHash/embedding pair lists are edges
of a similarity graph; keep-one-per-cluster needs the components. Two
implementations:

- ``connected_components``: distributed min-label propagation — each round
  is ONE vectorized groupby-free exchange (edges carry labels; per-block
  min-reduce then a narrow tree merge of the label map). Rounds ~= graph
  diameter; dup clusters are tiny chains in practice so it converges in
  2-4 rounds. Scales with |edges|, not corpus size.
- the driver never materializes the edge list beyond the label MAP (one row
  per node in a dup pair — dup-rate bound, same contract as the partial
  dedup's broadcast set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def connected_components(pairs_ds, max_rounds: int = 16) -> pd.DataFrame:
    """pairs_ds: Dataset with (id_a, id_b) columns → DataFrame
    (node_id, component_id) with component_id = min node id in component.

    Label propagation over the (small) node set: labels live in a pandas map
    re-broadcast per round; edges stream through map_batches emitting label
    updates, merged vectorized. Deterministic: min-reduce only.

    Scale contract (explicit): the NODE set is the near-dup candidate set —
    dup-rate bound, orders of magnitude smaller than the corpus — and must
    fit one worker's heap (~10^8 ids). The EDGE set streams and never
    materializes. Beyond that node budget the named fallback is
    hash-partitioned label propagation (labels as a Dataset, per-round
    keyed join + min-aggregate instead of a broadcast map) — same
    fixpoint, one extra shuffle per round."""
    import ray

    edges = pairs_ds.select_columns(["id_a", "id_b"])

    # initial labels: every node labels itself
    first = edges.map_batches(
        lambda t: pa.table(
            {"node": pa.concat_arrays([t["id_a"].combine_chunks(), t["id_b"].combine_chunks()])}
        ),
        batch_format="pyarrow",
    ).take_all()
    nodes = np.unique(np.array([r["node"] for r in first], dtype=np.int64))
    labels = pd.Series(nodes, index=nodes)

    converged = len(nodes) == 0
    for _ in range(max_rounds):
        ref = ray.put(labels)

        def _updates(t: pa.Table) -> pa.Table:
            lab = ray.get(ref)
            a = t["id_a"].to_numpy(zero_copy_only=False)
            b = t["id_b"].to_numpy(zero_copy_only=False)
            la = lab.loc[a].to_numpy()
            lb = lab.loc[b].to_numpy()
            m = np.minimum(la, lb)
            out = pd.DataFrame(
                {"node": np.concatenate([a, b]), "lab": np.concatenate([m, m])}
            )
            out = out.groupby("node", as_index=False)["lab"].min()
            return pa.Table.from_pandas(out, preserve_index=False)

        upd = edges.map_batches(_updates, batch_format="pyarrow").take_all()
        if not upd:
            converged = True
            break
        df = pd.DataFrame(upd).groupby("node")["lab"].min()
        new = labels.copy()
        new.loc[df.index] = np.minimum(new.loc[df.index].to_numpy(), df.to_numpy())
        if new.equals(labels):
            converged = True
            break
        labels = new

    if not converged:
        # silently returning partial labels would split one dup chain into
        # several components and leak duplicates through cluster dedup
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(similarity-graph diameter exceeds max_rounds); raise max_rounds"
        )
    return pd.DataFrame({"node_id": labels.index.to_numpy(), "component_id": labels.to_numpy()})


def dedup_keep_cluster_min(ds, pairs_ds, id_col: str = "doc_id"):
    """Cluster-based dedup: for every similarity cluster keep only the row
    with the minimum id; rows not in any pair pass through. The broadcast
    drop-set is dup-rate bound (same scale contract as stages.dedup
    'partial'; Bloom filter at extreme scale)."""
    import pyarrow.compute as pc

    comp = connected_components(pairs_ds)
    losers = comp.loc[comp.node_id != comp.component_id, "node_id"].to_numpy()
    drop = pa.array(sorted(int(x) for x in losers), pa.int64())

    def _keep(t: pa.Table) -> pa.Table:
        if len(drop) == 0:
            return t
        return t.filter(pc.invert(pc.is_in(t[id_col], value_set=drop)))

    return ds.map_batches(_keep, batch_format="pyarrow")
