"""Similarity search over embedding columns (list<float>).

- ``knn_brute``: exact cosine top-k. Query matrix is broadcast ONCE via
  ``ray.put``; each batch does one numpy matmul (rows x dim @ dim x q) and
  emits its local top-k per query (combiner), then a single small global
  top-k reduce. Never ships the query matrix per batch, never materializes
  scores for more than one batch at a time — the scale path for "score 10^12
  docs against q probes".
- ``embedding_near_dup``: all-pairs cosine >= threshold. The comparison side
  is broadcast once (fits memory at probe scale); each batch matmuls against
  it and emits canonical (a < b) pairs. For corpora where the full matrix
  can't be broadcast, LSH-bucket first (``lsh_bucket_pairs``).
- ``lsh_bucket_pairs``: random-hyperplane LSH — one groupby shuffle on the
  bucket key, exact verification inside buckets (the IVF-ish scale variant).

Scores are emitted fixed-point (e4/e6 int64) computed in float64 so the
DuckDB oracle (list_cosine_similarity) hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _mat(series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_brute(ds, query_df: pd.DataFrame, k: int = 10, id_col: str = "vec_id",
              vec_col: str = "embedding", scale: int = 6):
    """Exact top-k cosine neighbours for each query row.

    query_df: columns (query_id, embedding). Returns (query_id, vec_id,
    score_e{scale}) with deterministic tiebreak (score desc, vec_id asc)."""
    import ray

    from ocr_suite_ray.stages.relational import topk_per_group

    qm = _norm(_mat(query_df[vec_col]))
    qids = query_df["query_id"].to_numpy()
    ref = ray.put((qm, qids))
    mult = 10 ** scale

    from ocr_suite_ray.stages._bcast import cached_get

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        qm_l, qids_l = cached_get(ref)  # once per worker process
        m = _norm(_mat(batch[vec_col]))
        scores = m @ qm_l.T  # (rows, q)
        rows = []
        ids = batch[id_col].to_numpy()
        for qi, qid in enumerate(qids_l):
            # local selection on the SAME key the global reduce orders by
            # — (rounded score desc, id asc). Raw-float selection with a
            # batch-position tiebreak can drop a score-tied row with the
            # smaller id before the global reduce ever sees it, breaking
            # the oracle-exact contract
            se = np.floor(scores[:, qi] * mult + 0.5).astype(np.int64)
            top = np.lexsort((ids, -se))[:k]
            for t in top:
                rows.append((int(qid), int(ids[t]), int(se[t])))
        return pd.DataFrame(
            rows, columns=["query_id", id_col, f"score_e{scale}"]
        ).astype("int64")

    local = ds.map_batches(_score, batch_format="pandas")
    return topk_per_group(
        local, ["query_id"], f"score_e{scale}", k,
        descending=True, tiebreak_col=id_col,
    )


EMBED_BROADCAST_ROW_BUDGET = 2_000_000


def embedding_near_dup(ds, all_df: pd.DataFrame, threshold_e4: int = 4000,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       max_broadcast_rows: int = EMBED_BROADCAST_ROW_BUDGET):
    """Pairs (a < b) with cosine*1e4 >= threshold_e4. ``all_df`` (the full
    id+embedding table) is broadcast once; each batch compares its rows
    against it. O(n^2) scores but streamed batch-by-batch.

    This is the EXACT variant: broadcast memory is O(corpus vectors), so it
    holds up to ~10^7-10^8 vectors per worker heap. The guard enforces that
    contract instead of trusting the caller: above ``max_broadcast_rows``
    it raises with the scale fallback named (``lsh_bucket_pairs`` —
    hyperplane-signature buckets, one shuffle, memory O(bucket))."""
    import ray

    if len(all_df) > max_broadcast_rows:
        raise ValueError(
            f"embedding_near_dup is the exact broadcast tier: {len(all_df)} "
            f"vectors exceed the {max_broadcast_rows}-row broadcast budget "
            "(O(corpus) per worker heap). Use lsh_bucket_pairs for the "
            "bucketed scale path, or raise max_broadcast_rows explicitly."
        )

    am = _norm(_mat(all_df[vec_col]))
    aids = all_df[id_col].to_numpy()
    ref = ray.put((am, aids))

    from ocr_suite_ray.stages._bcast import cached_get

    # Per-task score memory is chunk_rows x n_broadcast float64; budget it to
    # ~256 MB so concurrency x chunk never approaches the worker heap (a
    # 1024-row batch vs a 200k-vector broadcast is 1.6 GB of scores alone,
    # which OOMed the 10x drive at 32-way concurrency before chunking).
    score_budget_floats = 32_000_000

    def _pairs(batch: pd.DataFrame) -> pd.DataFrame:
        am_l, aids_l = cached_get(ref)
        m = _norm(_mat(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        chunk = max(1, score_budget_floats // max(1, len(aids_l)))
        out_a, out_b, out_e = [], [], []
        for s in range(0, len(m), chunk):
            scores = m[s:s + chunk] @ am_l.T
            e4 = np.floor(scores * 10000 + 0.5).astype(np.int64)
            bi, aj = np.nonzero(e4 >= threshold_e4)
            a = ids[s:s + chunk][bi]
            b = aids_l[aj]
            keep = a < b  # canonical orientation; also drops self-pairs
            out_a.append(a[keep])
            out_b.append(b[keep])
            out_e.append(e4[bi[keep], aj[keep]])
        return pd.DataFrame({
            "id_a": np.concatenate(out_a) if out_a else np.array([], np.int64),
            "id_b": np.concatenate(out_b) if out_b else np.array([], np.int64),
            "cosine_e4": np.concatenate(out_e) if out_e
            else np.array([], np.int64),
        }).astype("int64")

    return ds.map_batches(_pairs, batch_format="pandas")


def _kmeans(sample: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Tiny deterministic k-means (numpy) for the IVF coarse quantizer —
    trained on a driver-side sample (the standard IVF recipe: train small,
    assign at scale).

    Distances use the ||x||^2 - 2 x.c + ||c||^2 matmul expansion with the
    n x k matrix built in row chunks, so memory is O(chunk x k) no matter
    the sample size. The original n x k x d broadcast held ~52 GB at the
    10x drive's (train_sample=100k, k=2048, d=64) and pinned the driver
    for 40 min; this form is a BLAS matmul. Centroid update is one
    np.add.at scatter + bincount instead of a k-pass boolean scan."""
    rng = np.random.RandomState(seed)
    sample = np.ascontiguousarray(sample, dtype=np.float64)
    if len(sample) < k:
        raise ValueError(
            f"k-means needs train_sample >= k: got {len(sample)} sample rows "
            f"for k={k} — raise train_sample (k centroids are seeded by "
            "sampling without replacement)"
        )
    cent = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    n, d = sample.shape
    x2 = (sample * sample).sum(1)
    # bound the chunk x k distance matrix near ~128 MB of float64
    step = max(1, min(n, 16_000_000 // max(k, 1)))
    assign = np.empty(n, np.int64)
    for _ in range(iters):
        c2 = (cent * cent).sum(1)
        for s in range(0, n, step):
            x = sample[s : s + step]
            dist = x2[s : s + step, None] - 2.0 * (x @ cent.T) + c2[None, :]
            assign[s : s + step] = dist.argmin(1)
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, assign, sample)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
    return _norm(cent)


def ivf_knn(ds, query_df: pd.DataFrame, k: int = 10, n_lists: int = 16,
            nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
            scale: int = 4, train_sample: int = 512, seed: int = 42):
    """IVF approximate top-k cosine: a k-means coarse quantizer partitions
    the corpus into n_lists inverted lists; each query searches only its
    nprobe nearest lists.

    Ray shape: centroids are broadcast; ONE map_batches pass assigns rows
    to lists and scores them against only the queries probing that list
    (vectorized matmul), emitting local top-k candidates; a final keyed
    top-k reduce merges. No all-pairs work, no shuffle of the vectors.
    Approximate (recall depends on nprobe/n_lists) — verified against the
    brute-force oracle in tests."""
    import ray

    from ocr_suite_ray.stages.relational import topk_per_group

    # train the quantizer on a deterministic driver-side sample
    sample_rows = ds.limit(train_sample).to_pandas()
    cent = _kmeans(_norm(_mat(sample_rows[vec_col])), n_lists, seed=seed)

    qm = _norm(_mat(query_df[vec_col]))
    qids = query_df["query_id"].to_numpy()
    qprobe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # lists per query
    # invert: list -> query indices probing it
    probes: dict[int, list[int]] = {}
    for qi, lists in enumerate(qprobe):
        for l in lists:
            probes.setdefault(int(l), []).append(qi)
    ref = ray.put((cent, qm, qids, probes))
    mult = 10 ** scale

    from ocr_suite_ray.stages._bcast import cached_get

    def _search(batch: pd.DataFrame) -> pd.DataFrame:
        cent_l, qm_l, qids_l, probes_l = cached_get(ref)
        m = _norm(_mat(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        assign = (m @ cent_l.T).argmax(1)
        rows = []
        for l in np.unique(assign):
            qis = probes_l.get(int(l))
            if not qis:
                continue
            sel = assign == l
            sub, sub_ids = m[sel], ids[sel]
            scores = sub @ qm_l[qis].T  # (rows_in_list, probing queries)
            for j, qi in enumerate(qis):
                # same rounded-key local selection as knn_brute (the
                # raw-float argsort could drop a tied smaller id)
                se = np.floor(scores[:, j] * mult + 0.5).astype(np.int64)
                top = np.lexsort((sub_ids, -se))[:k]
                for t in top:
                    rows.append(
                        (int(qids_l[qi]), int(sub_ids[t]), int(se[t]))
                    )
        return pd.DataFrame(
            rows, columns=["query_id", id_col, f"score_e{scale}"]
        ).astype("int64")

    local = ds.map_batches(_search, batch_format="pandas")
    return topk_per_group(
        local, ["query_id"], f"score_e{scale}", k,
        descending=True, tiebreak_col=id_col,
    )


def lsh_bucket_pairs(ds, n_planes: int = 12, threshold_e4: int = 4000,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     dim: int | None = None, seed: int = 42,
                     max_bucket: int = 100_000, pair_chunk: int = 4096):
    """Approximate near-dup: random-hyperplane signature buckets + exact
    cosine verification inside each bucket (ONE groupby shuffle). The scale
    path when the full matrix cannot be broadcast.

    ``dim`` is inferred from the data by default (planes are a pure
    function of (seed, dim), so every worker derives the same matrix).
    Verification is a CHUNKED slab scan (O(chunk x bucket) memory, the
    semantic_dedup shape — a full n x n matrix on a skewed 200k-row
    bucket would be ~320 GB); ``max_bucket`` fails fast on degenerate
    signatures (near-identical corpora) instead of letting one bucket
    run quadratically — raise the cap or pre-dedup exactly first."""

    def _planes_for(d: int) -> np.ndarray:
        return np.random.RandomState(seed).normal(size=(d, n_planes))

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = _norm(_mat(df[vec_col]))
        planes = _planes_for(m.shape[1] if dim is None else dim)
        bits = (m @ planes) > 0
        keys = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        out = df[[id_col]].copy()
        out["bucket"] = keys
        out["vec"] = [v.tolist() for v in m]
        return out

    bucketed = ds.map_batches(_bucket, batch_format="pandas")

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        n = len(ids)
        if n > max_bucket:
            raise ValueError(
                f"lsh bucket of {n} rows exceeds max_bucket={max_bucket} "
                "(degenerate signature — near-identical corpus?); raise "
                "the cap or exact-dedup first"
            )
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64"),
             "cosine_e4": pd.Series(dtype="int64")}
        )
        if n < 2:
            return empty
        m = np.stack([np.asarray(v) for v in g["vec"]])
        out_a, out_b, out_s = [], [], []
        for lo in range(0, n, pair_chunk):
            hi = min(lo + pair_chunk, n)
            e4 = np.floor(m[lo:hi] @ m.T * 10000 + 0.5).astype(np.int64)
            ii, jj = np.nonzero(e4 >= threshold_e4)
            gi = ii + lo
            keep = gi < jj  # upper triangle only, a < b by sorted ids
            out_a.append(ids[gi[keep]])
            out_b.append(ids[jj[keep]])
            out_s.append(e4[ii[keep], jj[keep]])
        if not out_a:
            return empty
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "cosine_e4": np.concatenate(out_s),
        }).astype("int64")

    pairs = bucketed.groupby("bucket").map_groups(_verify, batch_format="pandas")
    from ocr_suite_ray.stages.relational import distinct

    return distinct(pairs, ["id_a", "id_b", "cosine_e4"])


def semantic_dedup(
    ds,
    threshold_e4: int = 9500,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 512,
    seed: int = 42,
    pair_chunk: int = 4096,
    max_pairs: int | None = None,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): k-means-cluster the embeddings, then within each cluster link
    pairs with cosine >= threshold and keep ONE representative (min id) per
    linked component.

    Ray shape: the coarse quantizer is trained on a deterministic
    driver-side sample and the centroid matrix broadcast once (``ray.put``
    + per-worker cache); ONE map_batches pass assigns every row to its
    cluster (a single matmul — the vectors never shuffle more than once);
    ONE groupby shuffle on the cluster key; the within-cluster dedup is a
    vectorized pairwise matmul + a pair-count-bound union-find. Cross-
    cluster duplicates are missed by construction — that is the documented
    SemDeDup approximation (recall rises with fewer clusters; cost falls
    with more).

    Cost contract (explicit): per-cluster TIME is quadratic in the cluster
    population n (every pair is scored — that is SemDeDup's semantics),
    but MEMORY is linear: the cosine matrix is computed in ``pair_chunk``-
    row slabs (O(pair_chunk × n) floats live at once, never the full
    n×n + triu index arrays), and only the hit edges (duplicate-rate
    bound) accumulate. Partitioning assumption: the cluster's VECTORS
    (O(n·d), i.e. corpus/k rows) must fit one worker; scale k with the
    corpus (the paper uses k ~ sqrt(N)), or pre-shard hot clusters.
    ``max_pairs`` is the runaway guard analogous to minhash's
    ``max_bucket``: when set, a cluster whose scored-pair count would
    exceed it raises with the remedy (raise n_clusters) named, instead of
    silently burning a worker-week on one mega-cluster.

    Output: ``(id_col, cluster, rep_id, is_dup)`` — one row per input row;
    ``is_dup=1`` iff the row is dropped by dedup (``rep_id`` kept).
    Reference analogue: the newest-capture-wins duplicate skip
    (``src/ocr/service.cpp`` ``is_frame_processed``) lifted from exact key
    equality to embedding-space equivalence classes.
    """
    import ray

    from ocr_suite_ray.stages._bcast import cached_get

    sample_rows = ds.limit(train_sample).to_pandas()
    cent = _kmeans(_norm(_mat(sample_rows[vec_col])), n_clusters, seed=seed)
    ref = ray.put(cent)

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        cent_l = cached_get(ref)
        m = _norm(_mat(df[vec_col]))
        out = df[[id_col]].copy()
        out["cluster"] = (m @ cent_l.T).argmax(1).astype(np.int64)
        out["vec"] = [v.tolist() for v in m]
        return out

    assigned = ds.map_batches(_assign, batch_format="pandas")

    def _dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        n = len(ids)
        if max_pairs is not None and n * (n - 1) // 2 > max_pairs:
            raise ValueError(
                f"semantic_dedup cluster of {n} rows would score "
                f"{n * (n - 1) // 2} pairs > max_pairs={max_pairs}; "
                "raise n_clusters (SemDeDup uses k ~ sqrt(N)) or raise "
                "the cap"
            )
        m = np.stack([np.asarray(v) for v in g["vec"]])
        # pair scan in row slabs: O(pair_chunk * n) floats live, never the
        # full n*n matrix; only hit edges (dup-rate bound) accumulate
        edges_a, edges_b = [], []
        for i0 in range(0, n, pair_chunk):
            i1 = min(i0 + pair_chunk, n)
            e4 = np.floor((m[i0:i1] @ m.T) * 10000 + 0.5).astype(np.int64)
            hi, hj = np.nonzero(e4 >= threshold_e4)
            hi = hi + i0
            keep = hj > hi  # upper triangle only
            edges_a.append(hi[keep])
            edges_b.append(hj[keep])
        iu = np.concatenate(edges_a) if edges_a else np.empty(0, np.int64)
        ju = np.concatenate(edges_b) if edges_b else np.empty(0, np.int64)
        # union-find over the (pair-count-bound) hit edges; ids sorted, so
        # path roots are the component minima
        parent = np.arange(n)

        def _find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(iu, ju):
            ra, rb = _find(int(a)), _find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([_find(int(i)) for i in range(n)])
        rep = ids[roots]
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": g["cluster"].to_numpy(),
                "rep_id": rep,
                "is_dup": (rep != ids).astype(np.int64),
            }
        )

    return assigned.groupby("cluster").map_groups(
        _dedup_cluster, batch_format="pandas"
    )


def random_project(ds, out_dim: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Johnson-Lindenstrauss-style dimensionality reduction with a
    DETERMINISTIC Rademacher (+-1) projection matrix — the cheap front
    half of "shrink 10^12 embeddings before ANN/clustering" (Achlioptas
    2003 database-friendly projections). Distances are preserved up to
    the JL distortion bound; no training pass, no state.

    Bit-exactness contract: each element is first quantized to int64 e3
    fixed point (round half away from zero, the repo convention), then
    projected by INTEGER matmul against signs derived from a Knuth bit
    mix of (k, j) — every arithmetic step is exact in both numpy and the
    DuckDB twin, so the oracle hash-matches without any float tolerance.

    Output is long format (id, dim, proj_e3): one row per projected
    coordinate. Execution: embarrassingly parallel map_batches, the sign
    matrix is rebuilt per batch from the mix (d x out_dim ints — cheaper
    than any broadcast), nothing shuffles.
    """
    import pyarrow as pa

    def _project(df: pd.DataFrame) -> pd.DataFrame:
        x = _mat(df[vec_col]) * 1000.0
        xq = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)
        d = xq.shape[1]
        k = np.arange(d, dtype=np.int64)[:, None]
        j = np.arange(out_dim, dtype=np.int64)[None, :]
        signs = (((k * 2654435761 + j * 40503) >> 7) & 1) * 2 - 1
        proj = xq @ signs
        n = len(df)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), out_dim),
            "dim": np.tile(np.arange(out_dim, dtype=np.int64), n),
            "proj_e3": proj.reshape(-1),
        })

    return ds.map_batches(_project, batch_format="pandas")
