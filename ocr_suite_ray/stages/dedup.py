"""Newest-capture-wins dedup by url — the engine's keyed exact dedup.

Reference analogue: ``text_entries.value TEXT UNIQUE`` + ``INSERT OR IGNORE``
(store each distinct value once, ``src/common/db/updates/v3.inl:15-20``,
``src/common/database.cpp:181``) combined with the idempotent re-processing
check (``database.cpp:58-60``). Per ``BASELINE.json north_star`` the required
semantics is: one output row per ``url``, winner = max ``warc_ts``,
deterministic tiebreak (content hash) when timestamps tie — the result is
identical at any parallelism, partitioning, or replay.

All stages are Arrow-native (``batch_format="pyarrow"``); the nested
``spans`` column is carried as a flat JSON string through the exchange
(Ray's shuffle/aggregate machinery mishandles list<struct> in several code
paths) and re-nested on the way out.

Strategies (same result):

- ``bucket`` (default, scale path): classic hash-partitioned reduce.
  1. within-block combiner: vectorized keep-max-rank-per-url (cuts duplicate
     captures before any data moves);
  2. add ``bucket = crc32(url) % P``;
  3. ``groupby(bucket).map_groups`` — ONE shuffle; the UDF runs once per
     *bucket* (P calls total, not per url) and does the same vectorized
     keep-last. P bounds per-task memory: size P so total_bytes/P fits a
     worker (at trillion-row scale P grows with the input, the shuffle stays
     all-to-all once).
  The rank is a lexicographic string (zero-padded warc_ts || content hash),
  so "max rank" == newest-capture-wins with a deterministic tiebreak.
- ``map_groups``: the obvious per-url ``groupby(url).map_groups`` — one
  Python call per url group; kept for small inputs and as the semantics
  oracle for the scale path.
"""

from __future__ import annotations

import hashlib
import json
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_suite_ray.schemas import EXTRACTED_SCHEMA, SPAN_TYPE

RANK_COL = "__rank"
BUCKET_COL = "__bucket"
SPANS_JSON = "__spans_json"


def encode_spans(t: pa.Table) -> pa.Table:
    """list<struct> spans → compact JSON string column (shuffle-safe)."""
    if "spans" not in t.column_names:
        return t
    enc = pa.array(
        [
            json.dumps([[s["start"], s["stop"], s["kind"]] for s in row], separators=(",", ":"))
            for row in t["spans"].to_pylist()
        ],
        pa.large_string(),
    )
    return t.drop_columns(["spans"]).append_column(SPANS_JSON, enc)


def decode_spans(t: pa.Table) -> pa.Table:
    if SPANS_JSON not in t.column_names:
        return t
    dec = pa.array(
        [
            [{"start": s[0], "stop": s[1], "kind": s[2]} for s in json.loads(row)]
            for row in t[SPANS_JSON].to_pylist()
        ],
        pa.large_list(SPAN_TYPE),
    )
    t = t.drop_columns([SPANS_JSON]).append_column("spans", dec)
    order = [n for n in EXTRACTED_SCHEMA.names if n in t.column_names]
    order += [n for n in t.column_names if n not in order]
    return t.select(order)


def _rank_array(t: pa.Table) -> pa.Array:
    """Lexicographic rank: zero-padded warc_ts_us || sha256 over every
    observable payload-derived field — rows with equal rank are
    interchangeable, so the winner's content is a pure function of the
    input *set* (not its order)."""
    ts = pc.cast(t["warc_ts"], pa.int64()).to_pylist()
    texts = t["text"].to_pylist()
    status = t["status"].to_pylist()
    kinds = t["payload_kind"].to_pylist()
    nk = t["n_blocks_kept"].to_pylist()
    nd = t["n_blocks_dropped"].to_pylist()
    ranks = [
        f"{ti:020d}|" + hashlib.sha256(f"{x}|{s}|{k}|{a}|{b}".encode()).hexdigest()[:16]
        for ti, x, s, k, a, b in zip(ts, texts, status, kinds, nk, nd)
    ]
    return pa.array(ranks, pa.string())


def _keep_last_per_url(t: pa.Table) -> pa.Table:
    """Sort by (url, rank), keep the last row of each url run — vectorized
    run-boundary detection, no per-group calls."""
    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(t, sort_keys=[("url", "ascending"), (RANK_COL, "ascending")])
    t = t.take(idx)
    urls = np.asarray(t["url"].to_pylist(), dtype=object)
    mask = np.append(urls[:-1] != urls[1:], True)
    return t.filter(pa.array(mask))


def _local_best(t: pa.Table) -> pa.Table:
    if RANK_COL not in t.column_names:
        t = t.append_column(RANK_COL, _rank_array(t))
    return _keep_last_per_url(t)


def _add_bucket(t: pa.Table, num_partitions: int) -> pa.Table:
    buckets = [
        zlib.crc32(u.encode()) % num_partitions for u in t["url"].to_pylist()
    ]
    return t.append_column(BUCKET_COL, pa.array(buckets, pa.int32()))


def dedup_latest(
    ds,
    strategy: str = "partial",
    num_partitions: int = 32,
    bloom_threshold: int = 1_000_000,
):
    """Dataset[extracted rows] -> Dataset[one row per url].

    Default ``partial``: duplicate-capture urls are the rare case (~2% in a
    crawl), so the full-payload shuffle of a naive groupby is ~98% wasted
    motion. Instead:

    1. ONE url-column-only aggregate finds urls with >1 capture (tiny
       exchange: key strings + partial counts, never the text payload);
    2. the dup-url set is broadcast; rows of unique urls stream straight
       from the extracted store to the output — zero shuffle, zero
       re-encode, Arrow pass-through;
    3. only the dup subset (2x dup-url count rows) goes through the exact
       per-url groupby reduce.

    At trillion-row scale the broadcast set becomes a Bloom filter (false
    positives merely route extra rows through the exact path — semantics
    unchanged); the groupby in (3) scales with the dup rate, not the corpus.
    """
    if strategy == "partial":
        return _dedup_partial(ds, max_exact=bloom_threshold)
    if strategy in ("agg_join",):  # legacy alias for the bucket scale path
        strategy = "bucket"
    if strategy == "map_groups":
        def _best_group(t: pa.Table) -> pa.Table:
            return _local_best(t.combine_chunks()).drop_columns([RANK_COL])

        enc = ds.map_batches(encode_spans, batch_format="pyarrow")
        out = enc.groupby("url").map_groups(_best_group, batch_format="pyarrow")
        return out.map_batches(decode_spans, batch_format="pyarrow")
    if strategy != "bucket":
        raise ValueError(f"unknown dedup strategy: {strategy}")

    ranked = ds.map_batches(
        lambda t: _add_bucket(_local_best(encode_spans(t)), num_partitions),
        batch_format="pyarrow",
    )

    def _bucket_best(t: pa.Table) -> pa.Table:
        t = _keep_last_per_url(t.combine_chunks())
        return decode_spans(t.drop_columns([RANK_COL, BUCKET_COL]))

    return ranked.groupby(BUCKET_COL).map_groups(_bucket_best, batch_format="pyarrow")


def _dedup_partial(ds, max_exact: int = 1_000_000):
    import ray

    from ocr_suite_ray.state.dupset import (
        DupMembership,
        dup_key_table_ref,
        dup_meta,
        membership_ref,
    )

    # dup-url membership is built distributively and broadcast as ONE
    # object-store payload (exact set below max_exact keys, Bloom above —
    # false positives only route a url through the exact reduce, which keeps
    # a single capture unchanged); the driver sees two scalars, never keys
    dup_ref = dup_key_table_ref(ds, key_exchange="narrow")
    n_dups, _fp = dup_meta(dup_ref)
    if n_dups == 0:
        return ds
    member_box = [membership_ref(dup_ref, max_exact=max_exact)]

    def _uniques(t: pa.Table) -> pa.Table:
        member = DupMembership(ray.get(member_box[0]))
        return t.filter(pc.invert(member.mask(t["url"])))

    def _dups(t: pa.Table) -> pa.Table:
        member = DupMembership(ray.get(member_box[0]))
        return t.filter(member.mask(t["url"]))

    uniques = ds.map_batches(_uniques, batch_format="pyarrow")

    def _best_group(t: pa.Table) -> pa.Table:
        return decode_spans(
            _local_best(encode_spans(t.combine_chunks())).drop_columns([RANK_COL])
        )

    winners = (
        ds.map_batches(_dups, batch_format="pyarrow")
        .groupby("url")
        .map_groups(_best_group, batch_format="pyarrow")
    )
    return uniques.union(winners)
