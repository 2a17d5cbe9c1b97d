"""Packed-token binary shard sink: layout determinism + roundtrip."""

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from ocr_suite_ray.sources.token_shards import (
    export_token_shards,
    read_token_shards,
    tokenize_ids,
)

SEQ_LEN = 8
SEQS_PER_SHARD = 4  # 32 tokens per shard


def _docs(n_docs=40, rng_seed=7):
    rng = np.random.default_rng(rng_seed)
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(1, 20))
        rows.append({"doc_id": i,
                     "token_ids": rng.integers(1, 1000, n).astype(np.int32)})
    return rows


def _export(rows, out, parallelism=1):
    shutil.rmtree(out, ignore_errors=True)
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "token_ids": pa.array([r["token_ids"].tolist() for r in rows],
                              pa.list_(pa.int32())),
    })
    ds = rd.from_arrow(t).repartition(parallelism)
    return export_token_shards(ds, out, order_col="doc_id",
                               ids_col="token_ids", seq_len=SEQ_LEN,
                               seqs_per_shard=SEQS_PER_SHARD)


def _dir_hashes(out):
    return {
        f: hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(out)) if f.endswith(".bin")
    }


def test_roundtrip_matches_global_stream(tmp_path):
    rows = _docs()
    out = str(tmp_path / "shards")
    summary = _export(rows, out)
    stream = np.concatenate([r["token_ids"] for r in rows]).astype(np.uint32)
    n_full = len(stream) // SEQ_LEN
    assert summary["n_seqs_total"] == n_full
    assert summary["dropped_tail_tokens"] == len(stream) - n_full * SEQ_LEN

    back = read_token_shards(out).to_pandas().sort_values("seq_id")
    assert back["seq_id"].tolist() == list(range(n_full))
    got = np.concatenate([np.asarray(x, dtype=np.uint32) for x in back["ids"]])
    assert np.array_equal(got, stream[: n_full * SEQ_LEN])


def test_parallelism_invariant_and_idempotent(tmp_path):
    rows = _docs()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _export(rows, a, parallelism=1)
    _export(rows, b, parallelism=5)
    assert _dir_hashes(a) == _dir_hashes(b)
    # re-run over the same dir: identical bytes (tmp+rename idempotency)
    before = _dir_hashes(a)
    _export(rows, a, parallelism=3)
    assert _dir_hashes(a) == before


def test_tokenize_ids_ranks_and_oov():
    vocab = pa.table({"tok": ["b", "a", "c"], "n": [5, 5, 9]})
    ref = ray.put(vocab)
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1],
                                 "text": ["c a b zzz", "a a"]}))
    out = tokenize_ids(ds, "text", ref).to_pandas().sort_values("doc_id")
    # ranks: c (n=9) -> 1, then ties n=5 break token-asc: a -> 2, b -> 3
    assert list(out["token_ids"].iloc[0]) == [1, 2, 3, 0]
    assert list(out["token_ids"].iloc[1]) == [2, 2]


def test_smaller_reexport_clears_stale_shards(tmp_path):
    out = str(tmp_path / "s")
    _export(_docs(40), out)
    big = _dir_hashes(out)
    _export(_docs(8), out)
    small = sorted(_dir_hashes(out))
    assert len(small) < len(big)
    back = read_token_shards(out).to_pandas()
    stream = np.concatenate(
        [r["token_ids"] for r in _docs(8)]
    ).astype(np.uint32)
    got = np.concatenate(
        [np.asarray(x, np.uint32)
         for x in back.sort_values("seq_id")["ids"]]
    )
    assert np.array_equal(got, stream[: len(got)])


def test_tokenize_ids_empty_vocab_all_oov():
    import ray

    ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a b c"]}))
    ref = ray.put(None)  # what an empty-corpus vocab reduce resolves to
    out = tokenize_ids(ds, "text", ref).take(1)[0]
    assert list(out["token_ids"]) == [0, 0, 0]
