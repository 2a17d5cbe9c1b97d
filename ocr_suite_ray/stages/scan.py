"""Distributed prefix scan (cumulative sum) and sequence packing.

The prefix scan is the order-dependent primitive the Dataset API lacks
(reference analogue: the monotone ``last_processed_frame`` watermark,
``src/common/database.cpp:135-150``, generalized to a running total over a
keyed order). Standard two-pass shape:

  1. sort by the order key (range-partitioned blocks, disjoint key ranges);
  2. per-block partial sums -> a TINY (blocks x 2) summary table;
  3. exclusive per-block offsets from the summary (driver holds one row per
     block, never row data);
  4. second vectorized pass adds block offset + within-block cumsum.

Partitioning assumption (documented per the custom-operator contract):
``ds.sort(key)`` yields blocks with disjoint, ordered key ranges — Ray's
range-partitioned sort guarantees this; ties within a key must carry the
whole tie run in one block for a deterministic scan, so use a unique order
key (doc_id here).

Sequence packing sits on top: assign each document to training sequence
``floor(tokens_before / seq_len)`` — the deterministic sharding of a packed
pre-training corpus (docs may straddle a boundary; the assignment records
where each doc STARTS, which is what a packing writer needs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _assert_unique_min_keys(summaries: pd.DataFrame, order_col: str) -> None:
    """Guard for the unique-order-key contract: if a tie run ever straddles
    a sorted-block boundary, two blocks share a min_key, the offset map
    collapses them, and every row of one block gets a silently wrong base.
    Fail fast instead (defense-in-depth — Ray's range partitioner routes
    equal keys to one partition today, but that is an implementation
    detail, not a contract)."""
    if summaries["min_key"].duplicated().any():
        raise ValueError(
            f"prefix_sum requires unique {order_col!r} values: duplicate "
            "order keys straddle a sorted-block boundary (use a unique "
            "key, e.g. suffix a tiebreak id)"
        )


def prefix_sum(ds, order_col: str, value_col: str, out_col: str = "cum_before"):
    """Exclusive running sum of ``value_col`` in ``order_col`` order.

    Returns the input rows (sorted) plus ``out_col`` = sum of all values of
    strictly earlier rows. Two narrow passes; the only driver-side state is
    one (min_key, sum) pair per block."""
    import ray

    # materialize the sorted blocks ONCE: both passes must see identical
    # block boundaries (a re-executed sort may re-sample split points).
    # Callers pass a narrow projection (order + value columns), so the
    # pinned blocks are small relative to the corpus.
    sorted_ds = ds.sort(order_col).materialize()

    # pass 1: per-block summaries — tiny, bounded by block count
    def _summary(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"min_key": [], "total": []})
        return pd.DataFrame(
            {"min_key": [df[order_col].iloc[0]], "total": [df[value_col].sum()]}
        )

    summaries = sorted_ds.map_batches(
        _summary, batch_size=None, batch_format="pandas"
    ).to_pandas()
    if summaries.empty or "min_key" not in summaries.columns:
        # empty input: no blocks produced a summary — the scan is the
        # identity with a constant-zero out_col (schema preserved)
        def _zero(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(**{out_col: pd.Series(dtype="int64")})

        return sorted_ds.map_batches(
            _zero, batch_size=None, batch_format="pandas"
        )
    summaries = summaries.sort_values("min_key").reset_index(drop=True)
    _assert_unique_min_keys(summaries, order_col)
    offsets = summaries["total"].cumsum().shift(fill_value=0)
    # broadcast {block min_key -> exclusive offset} (one entry per block)
    off_by_min = dict(zip(summaries["min_key"], offsets))
    off_ref = ray.put(off_by_min)

    from ocr_suite_ray.stages._bcast import cached_get

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(**{out_col: pd.Series(dtype="int64")})
        # per-worker cached deserialize — a bare ray.get here re-inflates
        # the O(blocks)-entry dict once per block (O(blocks^2) total)
        table = cached_get(off_ref)
        base = table[df[order_col].iloc[0]]
        cum = df[value_col].cumsum().shift(fill_value=0) + base
        return df.assign(**{out_col: cum})

    return sorted_ds.map_batches(_scan, batch_size=None, batch_format="pandas")


def grouped_prefix_sum(
    ds,
    group_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
):
    """Exclusive running sum of ``value_col`` within each ``group_col``
    partition, in ``order_col`` order — the keyed generalization of
    :func:`prefix_sum` (SQL ``SUM(v) OVER (PARTITION BY g ORDER BY k) - v``).

    Same two-pass shape over ONE composite sort ``(group, order)``; the
    per-block summary carries one ``(group, total)`` row per group present
    in the block, so driver state is O(sum over blocks of distinct groups
    per block) <= O(blocks + groups) — never row data. Unlike a
    ``groupby(group).map_groups`` ranking, a hot group spans MANY sorted
    blocks and its scan work stays distributed; no single task ever holds
    a whole group. Order keys must be unique within their group (same
    tie contract as :func:`prefix_sum`)."""
    import ray

    sorted_ds = ds.sort([group_col, order_col]).materialize()

    # pass 1: per-(block, group) partial sums — tiny
    def _summary(df: pd.DataFrame) -> pd.DataFrame:
        import uuid

        if df.empty:
            return pd.DataFrame(
                {"blk_g": [], "blk_k": [], "blk_uid": [], "grp": [],
                 "total": []}
            )
        # dropna=False: null groups get offsets too (string/object group
        # keys; None is hashable and maps consistently in both passes)
        per_g = df.groupby(group_col, sort=True, dropna=False)[value_col].sum()
        return pd.DataFrame(
            {
                "blk_g": df[group_col].iloc[0],
                "blk_k": df[order_col].iloc[0],
                "blk_uid": uuid.uuid4().hex,  # guard-only block identity
                "grp": per_g.index.to_numpy(),
                "total": per_g.to_numpy(),
            }
        )

    summaries = sorted_ds.map_batches(
        _summary, batch_size=None, batch_format="pandas"
    ).to_pandas()
    if summaries.empty or "blk_g" not in summaries.columns:
        # empty input: identity with a constant-zero out_col
        def _zero(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(**{out_col: pd.Series(dtype="int64")})

        return sorted_ds.map_batches(
            _zero, batch_size=None, batch_format="pandas"
        )
    # tie-straddle guard: two DIFFERENT blocks (distinct uids) must never
    # share a first-row key, or the offset map collides and silently
    # corrupts bases (the old drop_duplicates().duplicated() form could
    # never fire — a just-deduplicated frame has no duplicates)
    if (
        summaries.groupby(["blk_g", "blk_k"], dropna=False)["blk_uid"]
        .nunique()
        .gt(1)
        .any()
    ):
        raise ValueError(
            "grouped_prefix_sum: two sorted blocks share a first row key — "
            f"({group_col}, {order_col}) must be unique"
        )
    # exclusive offset of each (block, group): sum of that group's totals
    # in all earlier blocks (block order = composite sort order)
    summaries = summaries.sort_values(["grp", "blk_g", "blk_k"]).reset_index(
        drop=True
    )
    csum = summaries.groupby("grp", sort=False)["total"].cumsum()
    summaries["offset"] = csum - summaries["total"]
    off_by_key = {
        (bg, bk, g): o
        for bg, bk, g, o in zip(
            summaries["blk_g"], summaries["blk_k"], summaries["grp"],
            summaries["offset"],
        )
    }
    off_ref = ray.put(off_by_key)

    from ocr_suite_ray.stages._bcast import cached_get

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(**{out_col: pd.Series(dtype="int64")})
        table = cached_get(off_ref)
        bg, bk = df[group_col].iloc[0], df[order_col].iloc[0]
        # per-distinct-group dict map (groups-per-block entries, C path)
        base_by_g = {
            g: table[(bg, bk, g)] for g in df[group_col].unique()
        }
        base = df[group_col].map(base_by_g).to_numpy()
        within = (
            df.groupby(group_col, sort=False)[value_col].cumsum().to_numpy()
            - df[value_col].to_numpy()
        )
        return df.assign(**{out_col: base + within})

    return sorted_ds.map_batches(_scan, batch_size=None, batch_format="pandas")


def shuffle_shards(
    ds,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuf",
):
    """Deterministic global shuffle + shard assignment — the training-shard
    export primitive: every row gets a pseudo-random but reproducible
    position (salted-md5 order), then ``shard`` = position % n_shards and
    ``pos`` = position // n_shards (round-robin keeps shards balanced to
    within one row regardless of key skew). Unlike ``random_shuffle`` the
    result is identical at any parallelism and across re-runs — a resumable
    export can re-derive any shard independently.

    The order key is md5(id+salt) hex prefixed to a zero-padded id, so keys
    are UNIQUE (the prefix-scan tie contract) and collisions in the 32-bit
    hash cannot reorder nondeterministically. One global sort (the one
    honest all-to-all this op needs) + the two narrow prefix-scan passes
    over (id, key) only — payload columns join by id afterwards.
    The md5 is per-row Python by design (DuckDB hash parity, cf.
    ``q_hash_sample``).
    """
    import pyarrow as pa

    def _key(t: pa.Table) -> pa.Table:
        from ocr_suite_ray.functions.hashing import salted_order_keys

        okey = salted_order_keys(t[id_col].to_pylist(), salt)
        return pa.table(
            {
                id_col: t[id_col],
                "okey": pa.array(okey, pa.string()),
                "one": pa.array(np.ones(len(okey), np.int64), pa.int64()),
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    ranked = prefix_sum(keyed, "okey", "one", out_col="rank")

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rank"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "shard": r % n_shards,
                "pos": r // n_shards,
            }
        )

    return ranked.map_batches(_assign, batch_format="pandas")


def pack_sequences(ds, order_col: str, tokens_col: str, seq_len: int):
    """Deterministic sequence packing: each doc gets ``seq_id`` =
    floor(tokens_before / seq_len) and ``seq_offset`` = tokens_before mod
    seq_len (its start position inside the sequence)."""
    scanned = prefix_sum(ds, order_col, tokens_col, out_col="tokens_before")

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        tb = df["tokens_before"].to_numpy()
        df = df.copy()
        df["tokens_before"] = tb.astype(np.int64)
        df["seq_id"] = (tb // seq_len).astype(np.int64)
        df["seq_offset"] = (tb % seq_len).astype(np.int64)
        return df

    return scanned.map_batches(_assign, batch_format="pandas")
