"""Packed-token binary shard sink/source — the pre-training artifact.

``export_token_shards`` lays a tokenized corpus out as fixed-length
uint32 sequences in numbered binary shards (``shard_000000.bin`` + a JSON
sidecar ``shard_000000.idx.json``), the Megatron-style format a training
loader memory-maps. Layout is a pure function of the corpus and the
config (deterministic at any parallelism):

  global token stream = docs concatenated in ``order_col`` order
  sequence s          = tokens [s*seq_len, (s+1)*seq_len)
  shard k             = sequences [k*seqs_per_shard, (k+1)*seqs_per_shard)
  trailing tokens that don't fill a final sequence are dropped (standard).

Scale shape: ONE range-partitioned sort (the packing order IS the
semantics — same contract as ``shuffle_shards``) assigns every document a
global token offset via the distributed prefix scan; a vectorized chunk
pass splits each block's flat token array at shard boundaries (numpy
masks, no per-doc Python); ONE groupby exchange co-locates each shard's
chunks (the exchange carries exactly the token bytes being written — the
physical minimum for a co-located sink); each shard writer scatters its
chunks into a preallocated buffer, verifies position contiguity, and
writes tmp+rename (idempotent re-runs). The driver holds one metadata row
per shard, never token data.

Reference analogue: the recognition DB writer's transactional one-file-
per-unit layout (``src/common/database.cpp``), re-expressed as a
resumable partitioned binary sink.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def tokenize_ids(ds, text_col: str, vocab_ref, out_col: str = "token_ids"):
    """Map whitespace tokens to int32 ids under a broadcast vocabulary
    (id = 1-based rank by (count desc, token asc) over the vocab table's
    (tok, n) rows; OOV -> 0). One reindex hash-join per batch against the
    per-worker cached id Series — the id-assignment half of a tokenizer,
    shuffle-free."""
    import pyarrow.compute as pc

    from ocr_suite_ray.stages._bcast import cached_build
    from ocr_suite_ray.stages.text_ops import _tokens

    def _ids_series(tbl) -> pd.Series:
        if tbl is None:  # empty vocab corpus: every token is OOV -> 0
            return pd.Series(np.array([], dtype=np.int32),
                             index=pd.Index([], dtype=object))
        df = tbl.select(["tok", "n"]).to_pandas()
        df = df.sort_values(["n", "tok"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
        return pd.Series(
            np.arange(1, len(df) + 1, dtype=np.int32), index=df["tok"]
        )

    def _map(t: pa.Table) -> pa.Table:
        series = cached_build(vocab_ref, _ids_series)
        n_tok, flat, off = _tokens(t[text_col])
        vals = series.reindex(flat.to_pandas()).to_numpy()
        ids = np.where(np.isnan(vals), 0, vals).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), pa.array(ids, pa.int32())
        )
        return t.append_column(out_col, lists)

    return ds.map_batches(_map, batch_format="pyarrow")


def export_token_shards(ds, out_dir: str, *, order_col: str = "doc_id",
                        ids_col: str = "token_ids", seq_len: int = 2048,
                        seqs_per_shard: int = 1024) -> dict:
    """Write the corpus as packed uint32 token shards (see module doc).

    ``ds`` needs ``order_col`` (a UNIQUE, totally ordered key — int64 or
    string both work; the packing scan sorts generically, pretrain's
    pass C orders by the string ``url``) and ``ids_col``
    (list<int32/uint32>). Returns a summary dict with per-shard metadata
    (shard_id, n_seqs, path) and the dropped-tail token count.
    """
    import pyarrow.compute as pc

    from ocr_suite_ray.stages.scan import prefix_sum

    os.makedirs(out_dir, exist_ok=True)
    # clear previous shards: a smaller re-export must not leave stale
    # higher-numbered shards for read_token_shards to silently include
    for f in os.listdir(out_dir):
        if f.startswith("shard_") and (
            f.endswith(".bin") or f.endswith(".idx.json")
            or f.endswith(".tmp")
        ):
            os.unlink(os.path.join(out_dir, f))
    shard_tokens = seq_len * seqs_per_shard

    def _with_counts(t: pa.Table) -> pa.Table:
        # serialize each doc's ids to a binary cell (uint32 LE): binary
        # survives the scan's sort/pandas passes untouched, where a
        # list<int32> column would be coerced to Ray's tensor extension
        # type. Zero-copy-shaped: one flatten + one buffer reinterpret.
        lists = t[ids_col]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        counts = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        data = flat.astype("<u4").tobytes()
        if len(data) > 2**31 - 1:  # binary offsets are int32; fail loudly
            raise ValueError(
                f"block flat token payload {len(data)} B exceeds int32 "
                "offsets — lower the read batch/block size"
            )
        off = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(counts * 4, out=off[1:])
        ids_bin = pa.Array.from_buffers(
            pa.binary(), len(counts),
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(data)],
        )
        return pa.table({
            order_col: t[order_col],
            "ids_bin": ids_bin,
            "n_tokens": pa.array(counts, pa.int64()),
        })

    narrow = ds.map_batches(_with_counts, batch_format="pyarrow")
    scanned = prefix_sum(narrow, order_col, "n_tokens",
                         out_col="tokens_before")

    def _chunks(t: pa.Table) -> pa.Table:
        # split each doc's contiguous global token range at shard
        # boundaries and emit one (shard_id, start, ids) RUN per piece.
        # Runs tile the block's flat token bytes exactly in order, so the
        # ids column is ONE zero-copy binary array over the flat buffer —
        # the exchange carries 4 B/token plus O(docs) run headers (the
        # first cut carried an 8 B/token position column and tripled the
        # shuffle; it blew the disk on the 10x drive).
        cells = t["ids_bin"]
        if isinstance(cells, pa.ChunkedArray):
            cells = cells.combine_chunks()
        counts = (pc.binary_length(cells).to_numpy().astype(np.int64)) // 4
        tb = t["tokens_before"].to_numpy()
        empty = pa.table({
            "shard_id": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "ids": pa.array([], pa.binary()),
        })
        if int(counts.sum()) == 0:
            return empty
        nz = counts > 0
        tb_nz, c_nz = tb[nz], counts[nz]
        first = tb_nz // shard_tokens
        last = (tb_nz + c_nz - 1) // shard_tokens
        n_pieces = (last - first + 1).astype(np.int64)
        total_p = int(n_pieces.sum())
        doc_idx = np.repeat(np.arange(len(c_nz), dtype=np.int64), n_pieces)
        piece_base = np.concatenate([[0], np.cumsum(n_pieces)[:-1]])
        rank = np.arange(total_p, dtype=np.int64) - np.repeat(
            piece_base, n_pieces
        )
        shard = first[doc_idx] + rank
        p_start = np.maximum(tb_nz[doc_idx], shard * shard_tokens)
        p_end = np.minimum(
            tb_nz[doc_idx] + c_nz[doc_idx], (shard + 1) * shard_tokens
        )
        run_len = p_end - p_start
        if int(run_len.sum()) * 4 > 2**31 - 1:
            raise ValueError(
                "block run payload exceeds int32 binary offsets — lower "
                "the read batch/block size"
            )
        off = np.zeros(total_p + 1, dtype=np.int32)
        np.cumsum(run_len * 4, out=off[1:])
        # flat token bytes of the block, in (doc, piece) order == run order
        data = b"".join(cells.take(
            pa.array(np.flatnonzero(nz), pa.int64())
        ).to_pylist())
        ids_bin = pa.Array.from_buffers(
            pa.binary(), total_p,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(data)],
        )
        return pa.table({
            "shard_id": pa.array(shard, pa.int64()),
            "start": pa.array(p_start, pa.int64()),
            "ids": ids_bin,
        })

    chunks = scanned.map_batches(_chunks, batch_format="pyarrow")

    def _write(df: pd.DataFrame) -> pd.DataFrame:
        sid = int(df["shard_id"].iloc[0])
        base = sid * shard_tokens
        rel = df["start"].to_numpy() - base
        order = np.argsort(rel, kind="stable")
        cells = df["ids"].to_numpy()[order]
        lens = np.fromiter((len(b) // 4 for b in cells), dtype=np.int64,
                           count=len(cells))
        # contiguity check: runs must tile [0, total) — a dropped chunk
        # would leave a hole
        expect = np.zeros(len(cells), dtype=np.int64)
        np.cumsum(lens[:-1], out=expect[1:])
        if len(cells) and not np.array_equal(rel[order], expect):
            raise ValueError(
                f"shard {sid}: non-contiguous token runs "
                f"(first bad run at index "
                f"{int(np.argmax(rel[order] != expect))})"
            )
        ids = np.frombuffer(b"".join(cells), dtype=np.uint32)
        n_seqs = len(ids) // seq_len
        dropped = len(ids) - n_seqs * seq_len
        path = os.path.join(out_dir, f"shard_{sid:06d}.bin")
        if n_seqs > 0:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(ids[: n_seqs * seq_len].tobytes())
            os.replace(tmp, path)
            meta = {"shard_id": sid, "seq_len": seq_len, "n_seqs": n_seqs,
                    "first_seq": sid * seqs_per_shard}
            tmpi = path + ".idx.tmp"
            with open(tmpi, "w") as f:
                json.dump(meta, f)
            os.replace(tmpi, path[: -len(".bin")] + ".idx.json")
        return pd.DataFrame({
            "shard_id": [sid], "n_seqs": [n_seqs], "dropped_tail": [dropped],
            "path": [path if n_seqs else ""],
        })

    meta = (
        chunks.groupby("shard_id")
        .map_groups(_write, batch_format="pandas")
        .to_pandas()
    )
    if meta.empty or "shard_id" not in meta.columns:  # empty input corpus
        meta = pd.DataFrame(
            {"shard_id": [], "n_seqs": [], "dropped_tail": [], "path": []}
        )
    meta = meta.sort_values("shard_id").reset_index(drop=True)
    return {
        "shards": meta[meta["n_seqs"] > 0].to_dict("records"),
        "n_seqs_total": int(meta["n_seqs"].sum()),
        "dropped_tail_tokens": int(meta["dropped_tail"].sum()),
        "seq_len": seq_len,
        "out_dir": out_dir,
    }


def read_token_shards(out_dir: str):
    """Read packed shards back as a Dataset of ``(seq_id:int64,
    ids:list<uint32>)`` — one remote read task per shard file, sequence
    ids reconstructed from the sidecar index."""
    import ray.data as rd

    paths = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".bin")
    )
    if not paths:
        raise FileNotFoundError(f"no .bin shards under {out_dir}")

    def _load(row: dict) -> list[dict]:
        path = row["path"]
        with open(path[: -len(".bin")] + ".idx.json") as f:
            meta = json.load(f)
        ids = np.fromfile(path, dtype=np.uint32)
        L = meta["seq_len"]
        assert len(ids) == meta["n_seqs"] * L
        return [
            {"seq_id": meta["first_seq"] + i,
             "ids": ids[i * L: (i + 1) * L]}
            for i in range(meta["n_seqs"])
        ]

    return rd.from_items([{"path": p} for p in paths]).flat_map(_load)
