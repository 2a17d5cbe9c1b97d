"""Post-extraction corpus curation over the final store — the bridge from
"extracted web pages" to "training-ready text shards".

Chains the hygiene operators over ``<out>/final``: ok-status gate →
quality gate → exact text dedup (keep the lexicographically-first url per
distinct text) → unigram-LM score annotation → optional deterministic
subsample — then writes partitioned parquet (one directory per hash bucket
of the TEXT — the post-dedup row identity IS the distinct text, so a
reader can address the single shard a given text can live in; a re-run replaces the output atomically: the write lands in
a fresh staging directory that is renamed over the previous one).

Reference analogue: the viewer's export path (SURVEY §3) — the reference
stops at the recognition DB; a training-data engine must also emit the
curated corpus. All steps reuse the queries()-tested kernels
(``text_ops.quality_score``, ``text_ops.lm_scores``, keyed top-1 dedup),
so the CLI surface inherits their oracle-checked semantics.
"""

from __future__ import annotations

import os



def run_curation(
    final_dir: str,
    out_dir: str,
    quality_min: int = 70,
    sample_e4: int | None = None,
    n_buckets: int = 16,
    dup_exchange: str = "tree",
) -> dict:
    """Returns a summary dict: rows out + output dir.

    100-TB shape — ZERO corpus shuffles in the default tier (rewritten
    after a 10M-doc run showed the previous keyed top-1 reduce pushing
    the full text corpus through a sort exchange, BASELINE.md round-3
    section):

    1. ONE fused narrow pass over the ok rows builds BOTH broadcast
       artifacts (the curation_v2 fusion pattern): per-block partials
       tagged by kind — kind 1 = unigram counts for the LM, kind 0 = per
       text-hash (count, min url) — merge in a remote TREE, and a worker
       task splits the root into (a) the dup-winner table (hashes with
       count > 1 only, so it is DUP-RATE bound, the flagship dup-set
       contract) and (b) the vocab count table. Text payloads never leave
       their read tasks.

       TIER CONTRACT: the fused tree's ROOT holds one row per corpus-
       DISTINCT text (the vocab side is vocab-bound, the winner side is
       not) — right while the distinct-text hash+url table fits one
       worker. Beyond that, ``dup_exchange="shuffle"`` splits pass 1:
       the winner table routes through ONE bucket shuffle + per-bucket
       C folds (``dupset.winner_table_ref``) where only the dup-rate-
       bound count>1 survivors reach the final merge, and the vocab
       keeps its (vocab-bound) tree — at the cost of a second narrow
       read pass. Both tiers produce identical output (equivalence-
       tested).
    2. ONE enrichment + filter + write pass: quality, LM score, text hash
       per batch; keep a row iff quality passes AND (its text is unique OR
       this url IS the winner). Exact dedup (keep lexicographically-first
       url per distinct text) holds because quality is a pure function of
       text — every copy of a text gates identically. The optional
       ``sample_e4`` url-hash subsample applies after dedup.

    The write lands in a staging directory renamed over the previous
    output (atomic re-run).
    """
    import hashlib as _hl

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import _tokens, lm_scores, quality_score
    from ocr_suite_ray.state.dupset import coalesce_reduce

    # crash recovery: a kill inside the promote's two-rename window (below)
    # leaves the previous output parked at .old with the published path
    # absent — restore it first so readers see the prior curated set while
    # this run recomputes
    _old = out_dir.rstrip("/") + ".old"
    if not os.path.exists(out_dir) and os.path.exists(_old):
        os.replace(_old, out_dir)

    ds = rd.read_parquet(final_dir, columns=["url", "text", "status"])

    def _ok(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["status"], "ok"))

    ok = ds.map_batches(_ok, batch_format="pyarrow")

    # ---- pass 1 (fused artifacts): kind 0 = (text_hash, n, min url),
    # kind 1 = (token, count, "") ------------------------------------
    def _partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table(
                {
                    "kind": pa.array([], pa.int32()),
                    "s": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "u": pa.array([], pa.string()),
                }
            )
        _nt, flat, _off = _tokens(t["text"])
        vc = pc.value_counts(flat)
        texts = t["text"].to_pylist()
        th = [_hl.md5(x.encode()).hexdigest() for x in texts]
        g = (
            pd.DataFrame({"s": th, "u": t["url"].to_pylist()})
            .groupby("s", as_index=False)
            .agg(n=("u", "size"), u=("u", "min"))
        )
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(g), np.int32), np.ones(len(vc), np.int32)]
                    ),
                    pa.int32(),
                ),
                "s": pa.concat_arrays(
                    [
                        pa.array(g["s"], pa.string()),
                        vc.field("values").cast(pa.string()),
                    ]
                ),
                "n": pa.concat_arrays(
                    [
                        pa.array(g["n"].to_numpy(np.int64), pa.int64()),
                        vc.field("counts").cast(pa.int64()),
                    ]
                ),
                "u": pa.concat_arrays(
                    [pa.array(g["u"], pa.string()), pa.array([""] * len(vc))]
                ),
            }
        )

    def _merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["kind", "s"]).aggregate([("n", "sum"), ("u", "min")])
        # select by NAME first: pyarrow group_by output order is
        # release-fragile (the _tree_keyed_sum rule)
        return g.select(["kind", "s", "n_sum", "u_min"]).rename_columns(
            ["kind", "s", "n", "u"]
        )

    if dup_exchange not in ("tree", "shuffle"):
        raise ValueError(f"dup_exchange must be tree|shuffle, got {dup_exchange!r}")
    combined_ref = None
    if dup_exchange == "tree":
        combined_ref = coalesce_reduce(
            ok.map_batches(_partial, batch_format="pyarrow"),
            _merge,
            None,
            materialize=False,
        )

    _NO_DUPS = pa.table(
        {"s": pa.array([], pa.string()), "u": pa.array([], pa.string())}
    )

    @ray.remote
    def _split_dups(t):
        # an EMPTY table, not None: cached_get treats None as a cache
        # miss, so a dedup-clean corpus would re-fetch the ref per batch
        if t is None:
            return _NO_DUPS
        d = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater(t["n"], 1)))
        return d.select(["s", "u"]) if d.num_rows else _NO_DUPS

    @ray.remote
    def _split_counts(t):
        if t is None:
            return None
        return t.filter(pc.equal(t["kind"], 1)).select(["s", "n"]).rename_columns(
            ["tok", "n"]
        )

    if dup_exchange == "shuffle":
        from ocr_suite_ray.stages.text_ops import unigram_count_ref
        from ocr_suite_ray.state.dupset import winner_table_ref

        def _win_partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "s": [_hl.md5(x.encode()).hexdigest()
                      for x in t["text"].to_pylist()],
                "u": t["url"].to_pandas(),
            })
            g = df.groupby("s", as_index=False).agg(
                n=("u", "size"), u=("u", "min")
            )
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

        raw_ref = winner_table_ref(
            ok.map_batches(_win_partial, batch_format="pyarrow"),
            key_col="s", n_col="n", win_col="u",
        )
        # normalize a None root to the empty table so the per-worker
        # cache can hold it (None is a cache miss)
        dup_ref = (
            _split_dups.remote(None) if raw_ref is None
            else ray.remote(lambda t: t if t is not None else _NO_DUPS).remote(raw_ref)
        )
        counts_ref = unigram_count_ref(ok, "text")
    else:
        dup_ref = _split_dups.remote(combined_ref) if combined_ref is not None else None
        counts_ref = (
            _split_counts.remote(combined_ref) if combined_ref is not None else None
        )

    # ---- pass 2: enrich + gate + dedup-filter + write ----------------
    def _final(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "url": pa.array([], pa.string()),
                "text": pa.array([], pa.large_string()),
                "quality": pa.array([], pa.int64()),
                "lm_score_e4": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int32()),
            }
        )
        if not len(t):
            return empty
        q = quality_score(
            t.append_column("doc_id", pa.array(np.arange(len(t)), pa.int64()))
        )
        lm = lm_scores(t["text"], counts_ref)
        texts = t["text"].to_pylist()
        th = [_hl.md5(x.encode()).hexdigest() for x in texts]
        urls = np.asarray(t["url"].to_pylist(), dtype=object)

        def _dup_series(tbl):
            # per-worker cached winner index (rebuilding the Series per
            # batch paid two to_pylist passes + an O(dups) hash build on
            # every block)
            if tbl is None or tbl.num_rows == 0:
                return None
            return pd.Series(tbl["u"].to_pylist(), index=tbl["s"].to_pylist())

        from ocr_suite_ray.stages._bcast import cached_build

        w = cached_build(dup_ref, _dup_series) if dup_ref is not None else None
        if w is not None:
            wu = w.reindex(th).to_numpy()
            keep_dup = pd.isna(wu) | (wu == urls)
        else:
            keep_dup = np.ones(len(t), dtype=bool)
        bucket = np.array([int(h[:8], 16) % n_buckets for h in th], dtype=np.int32)
        out = pa.table(
            {
                "url": pc.cast(t["url"], pa.string()),
                "text": t["text"],
                "quality": q["quality"],
                "lm_score_e4": pa.array(lm, pa.int64()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )
        mask = pc.and_(
            pc.greater_equal(out["quality"], quality_min), pa.array(keep_dup)
        )
        if sample_e4 is not None:
            from ocr_suite_ray.functions.hashing import md5_mod

            mask = pc.and_(mask, pa.array(md5_mod(urls, 10000) < sample_e4))
        out = out.filter(mask)
        return out if out.num_rows else empty

    kept = ok.map_batches(_final, batch_format="pyarrow")

    import shutil

    staging = out_dir.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)
    kept.write_parquet(staging, partition_cols=["bucket"])
    # Near-atomic promote: the previous output is renamed aside FIRST, so a
    # crash never leaves a half-written dir at the published path and never
    # loses data — but POSIX has no two-dir RENAME_EXCHANGE, so there IS a
    # brief window between the two renames where out_dir is absent (old
    # output parked at .old). A crash inside that window is healed by the
    # restore at the top of this function on the next run.
    old = out_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(out_dir):
        os.replace(out_dir, old)
    os.replace(staging, out_dir)
    shutil.rmtree(old, ignore_errors=True)

    import pyarrow.dataset as pads

    n_out = pads.dataset(out_dir, partitioning="hive").count_rows()
    return {"rows_out": int(n_out), "out_dir": out_dir}
