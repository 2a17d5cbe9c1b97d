"""Post-extraction corpus curation over the final store — the bridge from
"extracted web pages" to "training-ready text shards".

Chains the hygiene operators over ``<out>/final``: ok-status gate →
quality gate → exact text dedup (keep the lexicographically-first url per
distinct text) → unigram-LM score annotation → optional deterministic
subsample — then writes partitioned parquet (one directory per hash bucket
of the url, so a re-run or a downstream reader can address shards
independently; a re-run replaces the output atomically: the write lands in
a fresh staging directory that is renamed over the previous one).

Reference analogue: the viewer's export path (SURVEY §3) — the reference
stops at the recognition DB; a training-data engine must also emit the
curated corpus. All steps reuse the queries()-tested kernels
(``text_ops.quality_score``, ``text_ops.lm_scores``, keyed top-1 dedup),
so the CLI surface inherits their oracle-checked semantics.
"""

from __future__ import annotations

import hashlib
import os


def run_curation(
    final_dir: str,
    out_dir: str,
    quality_min: int = 70,
    sample_e4: int | None = None,
    n_buckets: int = 16,
) -> dict:
    """Returns a summary dict: rows in/out per gate. Streaming end-to-end:
    one enrichment pass (broadcast vocab table), one keyed top-1 reduce,
    one partitioned write."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ocr_suite_ray.stages.relational import topk_per_group
    from ocr_suite_ray.stages.text_ops import (
        lm_scores,
        quality_score,
        unigram_count_ref,
    )

    ds = rd.read_parquet(final_dir, columns=["url", "text", "status"])

    def _ok(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["status"], "ok"))

    ok = ds.map_batches(_ok, batch_format="pyarrow")
    counts_ref = unigram_count_ref(ok, "text")

    def _enrich(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "text": pa.array([], pa.large_string()),
                    "quality": pa.array([], pa.int64()),
                    "lm_score_e4": pa.array([], pa.int64()),
                    "text_hash": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        # quality_score expects a doc_id column; feed a dummy (it is only
        # echoed through, we keep our own keys)
        q = quality_score(
            t.append_column("doc_id", pa.array(np.arange(len(t)), pa.int64()))
        )
        lm = lm_scores(t["text"], counts_ref)
        texts = t["text"].to_pylist()
        th = [hashlib.md5(x.encode()).hexdigest() for x in texts]
        bucket = np.array(
            [int(h[:8], 16) % n_buckets for h in th], dtype=np.int32
        )
        out = pa.table(
            {
                "url": pc.cast(t["url"], pa.string()),
                "text": t["text"],
                "quality": q["quality"],
                "lm_score_e4": pa.array(lm, pa.int64()),
                "text_hash": pa.array(th, pa.string()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )
        mask = pc.greater_equal(out["quality"], quality_min)
        if sample_e4 is not None:
            keep = pa.array(
                np.array(
                    [
                        int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 10000
                        < sample_e4
                        for u in out["url"].to_pylist()
                    ]
                )
            )
            mask = pc.and_(mask, keep)
        return out.filter(mask)

    gated = ok.map_batches(_enrich, batch_format="pyarrow")
    # keep ONE representative per distinct text: lexicographically-first url
    # (deterministic at any parallelism; the flagship already guarantees one
    # row per url, so (text_hash, url) is a total order)
    kept = topk_per_group(gated, ["text_hash"], "url", 1, descending=False)
    kept = kept.drop_columns(["text_hash"])

    import shutil

    staging = out_dir.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)
    kept.write_parquet(staging, partition_cols=["bucket"])
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(staging, out_dir)

    import pyarrow.dataset as pads

    n_out = pads.dataset(out_dir, partitioning="hive").count_rows()
    return {"rows_out": int(n_out), "out_dir": out_dir}
