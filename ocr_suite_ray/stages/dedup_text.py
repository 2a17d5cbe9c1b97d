"""Content-dedup operator family for training-data pipelines.

Generalizes the reference's exact dedup (``text_entries.value TEXT UNIQUE``
+ ``INSERT OR IGNORE``, ``src/common/db/updates/v3.inl:15-20``) from exact
string identity to the standard near-dup ladder:

- ``exact_dedup``           hash → two-level keyed min-reduce (one shuffle)
- ``ngram_jaccard_pairs``   exact word-shingle Jaccard within a blocking key
- ``minhash_lsh_pairs``     MinHash signatures + LSH banding → candidate
                            buckets → exact-Jaccard verification
- ``simhash_pairs``         64-bit SimHash + chunk banding → Hamming verify

Scale shapes: every per-doc computation is a vectorized/numpy ``map_batches``
stage; every candidate-generation step is ONE hash-shuffle (groupby on
band/bucket) with per-bucket vectorized verification; nothing does an
all-pairs pass except inside a bounded blocking group. Pair outputs are
canonicalized (a < b) and deduplicated, so results are independent of block
layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# MinHash parameters (fixed => deterministic): 128 permutations, 32 bands x 4
# rows — S-curve threshold (1/b)^(1/r) ≈ 0.42, so recall at jaccard >= 0.5 is
# ~0.87 and at >= 0.7 is ~0.9998 (tested in tests/test_dedup_text.py).
NUM_PERM = 128
LSH_BANDS = 32
ROWS_PER_BAND = NUM_PERM // LSH_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)


def _shingles(text: str, k: int = 3) -> set:
    """Word k-gram shingle hashes (64-bit)."""
    words = text.split(" ")
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return {
        int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
        for g in grams
    }


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _minhash_sig(sh: set) -> np.ndarray:
    """128 x 64-bit universal-hash minima over the shingle set."""
    if not sh:
        return np.full(NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    v = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (a*x + b) mod p, vectorized over shingles x permutations
    prod = (v[None, :] * _PERM_A[:, None] + _PERM_B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """One row per distinct text, keeper = min id. Two-level: per-block
    min-per-hash combiner, then one vectorized hash aggregate."""
    from ray.data.aggregate import Min

    def _hash(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame()
        out["text_hash"] = [hashlib.md5(t.encode()).hexdigest() for t in df[text_col]]
        out[id_col] = df[id_col].values
        return out.groupby("text_hash", as_index=False)[id_col].min()

    return (
        ds.map_batches(_hash, batch_format="pandas")
        .groupby("text_hash")
        .aggregate(Min(id_col, alias_name=id_col))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard within a blocking key
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds,
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_e4: int = 1000,
    k: int = 3,
):
    """All-pairs word-k-gram Jaccard inside each blocking group; emits
    (id_a < id_b, jaccard_e4 >= threshold). The blocking column bounds the
    quadratic term; for unblocked corpora use minhash_lsh_pairs."""

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        shs = [set(_distinct_word_kgrams(t, k)) for t in g[text_col]]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(shs[i], shs[j])
                e4 = int(np.floor(jac * 10000 + 0.5))
                if e4 >= threshold_e4:
                    rows.append((ids[i], ids[j], e4))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard_e4"]).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard_e4": "int64"}
        )

    return ds.groupby(block_col).map_groups(_pairs, batch_format="pandas")


def _distinct_word_kgrams(text: str, k: int) -> set:
    words = text.split(" ")
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = 3,
):
    """Candidate pairs via LSH banding, verified with exact shingle Jaccard.

    Stages: (1) per-batch signatures (numpy); (2) explode to one row per
    (band, band_hash) — the LSH bucket key; (3) ONE groupby shuffle on the
    bucket key; (4) per-bucket pairing + exact verification against the
    broadcast shingle sets... no — shingles are recomputed per bucket member
    from the text carried along, keeping the stage self-contained (no global
    state). Pairs are deduped across buckets by a final distinct.
    """

    def _sig_explode(df: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_band, rows_hash, rows_text = [], [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            sig = _minhash_sig(_shingles(t, k))
            for b in range(LSH_BANDS):
                band = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                h = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
                rows_id.append(i)
                rows_band.append(b)
                rows_hash.append(h)
                rows_text.append(t)
        return pd.DataFrame(
            {
                id_col: pd.Series(rows_id, dtype="int64"),
                "band": pd.Series(rows_band, dtype="int32"),
                "band_hash": rows_hash,
                text_col: rows_text,
            }
        )

    exploded = ds.map_batches(_sig_explode, batch_format="pandas")

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "jaccard_e4": pd.Series(dtype="int64")}
            )
        ids = g[id_col].tolist()
        shs = [_shingles(t, k) for t in g[text_col]]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(shs[i], shs[j])
                if jac >= threshold:
                    rows.append((ids[i], ids[j], int(np.floor(jac * 10000 + 0.5))))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard_e4"]).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard_e4": "int64"}
        )

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # same pair can surface from several bands -> distinct
    from ocr_suite_ray.stages.relational import distinct

    return distinct(pairs, ["id_a", "id_b", "jaccard_e4"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over whitespace tokens (weight 1 each)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split(" "):
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


def simhash_table(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, simhash) per doc — signed int64 (bit 63 folded) for Arrow/SQL."""

    def _sh(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col]].copy()
        out["simhash"] = pd.Series(
            [simhash64(t) & 0x7FFFFFFFFFFFFFFF for t in df[text_col]], dtype="int64",
            index=df.index,
        )
        return out

    return ds.map_batches(_sh, batch_format="pandas")


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3):
    """Near-dup pairs by SimHash: band the 64 bits into max_hamming+1 chunks
    (pigeonhole: any pair within the radius shares >= 1 exact chunk), ONE
    groupby on (chunk_idx, chunk_value), verify Hamming inside buckets."""
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, chunks, vals, hashes = [], [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            h = simhash64(t)
            for c in range(n_chunks):
                ids.append(i)
                chunks.append(c)
                vals.append((h >> (c * chunk_bits)) & ((1 << chunk_bits) - 1))
                hashes.append(h)
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "chunk": pd.Series(chunks, dtype="int32"),
                "chunk_val": pd.Series(vals, dtype="int64"),
                # full 64 bits, reinterpreted as signed int64 (no bit-63
                # mask: masking would underreport Hamming distance by 1 for
                # pairs differing at the top bit while the chunking above
                # banded on the unmasked value)
                "simhash": pd.Series(
                    np.array(hashes, dtype=np.uint64).view(np.int64)
                ),
            }
        )

    exploded = ds.map_batches(_explode, batch_format="pandas")

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        rows = []
        ids = g[id_col].tolist()
        # back to unsigned for the XOR popcount (signed ^ signed on Python
        # ints would sign-extend)
        hs = g["simhash"].to_numpy().view(np.uint64).tolist()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    rows.append((ids[i], ids[j], d))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).astype(
            {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
        )

    pairs = exploded.groupby(["chunk", "chunk_val"]).map_groups(
        _verify, batch_format="pandas"
    )
    from ocr_suite_ray.stages.relational import distinct

    return distinct(pairs, ["id_a", "id_b", "hamming"])
