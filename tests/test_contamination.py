"""Decontamination / stratified sampling / group quota: exact semantics vs
pure-Python oracles on constructed corpora, plus partition invariance."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from ocr_suite_ray.stages.contamination import (
    _word_ngrams,
    decontaminate,
    group_quota,
    stratified_sample,
)


def _py_ngrams(text: str, n: int) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_word_ngrams_matches_python():
    import pyarrow as pa

    texts = [
        "a b c d e f",
        "one two",          # shorter than n -> nothing
        "",                 # empty -> nothing
        "x x x x x",        # repeats allowed (distinctness is caller's job)
    ]
    rows, grams = _word_ngrams(pa.array(texts), 3)
    got: dict = {}
    for r, g in zip(rows.tolist(), grams.to_pylist()):
        got.setdefault(r, []).append(g)
    assert set(got.get(0, [])) == _py_ngrams(texts[0], 3)
    assert 1 not in got and 2 not in got
    assert got[3] == ["x x x"] * 3  # every window, in order


def test_decontaminate_flags_planted_overlap(ray_session):
    import ray.data as rd

    ev = pd.DataFrame(
        {"doc_id": [1000, 1001], "text": ["the secret eval answer is tau", "benchmark row two here now yes"]}
    )
    corpus = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "prefix words the secret eval answer is tau suffix",  # contaminated
                "completely unrelated text with no overlap at all",
                "benchmark row two here now yes",  # exact eval doc
            ],
        }
    )
    out = (
        decontaminate(rd.from_pandas(corpus), rd.from_pandas(ev), n=5)
        .to_pandas()
        .set_index("doc_id")
    )
    # doc 0 shares the 5-gram windows of the planted sentence (2 distinct
    # eval 5-grams from "the secret eval answer is" / "secret eval answer is tau")
    assert out.loc[0, "flagged"] == 1 and out.loc[0, "n_contam"] == 2
    assert out.loc[1, "flagged"] == 0 and out.loc[1, "n_contam"] == 0
    assert out.loc[2, "flagged"] == 1 and out.loc[2, "n_contam"] == 2


def test_decontaminate_empty_eval_flags_nothing(ray_session):
    import ray.data as rd

    corpus = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e f", "g h i j k l"]})
    ev = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype="object")})
    out = decontaminate(rd.from_pandas(corpus), rd.from_pandas(ev), n=5).to_pandas()
    assert (out.flagged == 0).all() and (out.n_contam == 0).all()


def test_decontaminate_partition_invariant(ray_session):
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                f"shared phrase block alpha beta gamma {i % 4} tail word {i}"
                for i in range(40)
            ],
        }
    )
    ev = docs.iloc[:4][["doc_id", "text"]]
    a = (
        decontaminate(rd.from_pandas(docs), rd.from_pandas(ev), n=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        decontaminate(rd.from_pandas(docs).repartition(7), rd.from_pandas(ev).repartition(3), n=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert a.flagged.sum() > 0  # the shared phrase actually collides


def test_stratified_sample_matches_md5_oracle(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": range(400), "lang": [["en", "de", "fr", "zh"][i % 4] for i in range(400)]}
    )
    fr = {"en": 8000, "de": 3000, "fr": 0}
    got = (
        stratified_sample(rd.from_pandas(df), "lang", "doc_id", fr, default_e4=1000)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    keep = []
    for r in df.itertuples():
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 10000
        if h < fr.get(r.lang, 1000):
            keep.append(r.doc_id)
    assert got.doc_id.tolist() == keep
    assert (got.lang != "fr").all()  # zero-fraction stratum fully dropped


def test_group_quota_matches_window_oracle(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "doc_id": range(60),
            "lang": [["en", "de"][i % 2] for i in range(60)],
            "n_chars": [100 * (1 + i % 7) for i in range(60)],
        }
    )
    got = (
        group_quota(rd.from_pandas(df).repartition(5), "lang", "doc_id", "n_chars", 1500)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want_rows = []
    for lang, g in df.groupby("lang"):
        run = 0
        for r in g.sort_values("doc_id").itertuples():
            run += r.n_chars
            if run > 1500:
                break
            want_rows.append((r.doc_id, lang, r.n_chars, run))
    want = pd.DataFrame(want_rows, columns=["doc_id", "lang", "n_chars", "running"]).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert got[["doc_id", "lang", "n_chars", "running"]].equals(want)


def test_lm_unigram_score_matches_python_oracle(ray_session):
    import math

    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import lm_unigram_score

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a a b", "b c", "a rare tokens here"],
        }
    )
    # corpus counts: a:3 b:2 c:1 rare:1 tokens:1 here:1 -> N=9, V=6
    counts = {}
    for t in df.text:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    N, V = sum(counts.values()), len(counts)
    want = {}
    for r in df.itertuples():
        lps = [math.log((counts[w] + 1.0) / (N + V)) for w in r.text.split(" ")]
        want[r.doc_id] = math.floor(-(sum(lps) / len(lps)) * 10000 + 0.5)
    got_a = lm_unigram_score(rd.from_pandas(df)).to_pandas()
    got_b = lm_unigram_score(rd.from_pandas(df).repartition(3)).to_pandas()
    for g in (got_a, got_b):
        assert {r.doc_id: r.lm_score_e4 for r in g.itertuples()} == want
    # common-token docs score lower (less surprising) than rare-token docs
    m = {r.doc_id: r.lm_score_e4 for r in got_a.itertuples()}
    assert m[0] < m[2]


def test_tfidf_top_terms_matches_python_oracle(ray_session):
    import math

    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import tfidf_top_terms

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "apple apple banana common",
                "banana cherry common common",
                "cherry date common",
                "apple date date common",
            ],
        }
    )
    # python oracle
    n_docs = len(df)
    docs = {r.doc_id: r.text.split(" ") for r in df.itertuples()}
    dfreq: dict = {}
    for ws in docs.values():
        for w in set(ws):
            dfreq[w] = dfreq.get(w, 0) + 1
    want = {}
    for did, ws in docs.items():
        tf: dict = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        scored = [
            (w, math.floor(c * math.log((n_docs + 1) / (dfreq[w] + 1)) * 10000 + 0.5))
            for w, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        want[did] = scored[:2]
    got = tfidf_top_terms(rd.from_pandas(df).repartition(3), k=2).to_pandas()
    for did, g in got.groupby("doc_id"):
        pairs = list(zip(g.term, g.score_e4))
        assert pairs == want[did], (did, pairs, want[did])
    # "common" appears everywhere -> idf ln(5/5)=0 -> never a top term
    assert "common" not in set(got.term)


# ---------------------------------------------------------------------------
# BPE tokenizer training (sequential oracle)
# ---------------------------------------------------------------------------

def _bpe_train_py(texts, n_merges):
    counts: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    words = {w: (tuple(w), n) for w, n in counts.items()}
    merges = []
    for _ in range(n_merges):
        pc_: dict = {}
        for seq, n in words.values():
            for a, b in zip(seq, seq[1:]):
                pc_[(a, b)] = pc_.get((a, b), 0) + n
        if not pc_:
            break
        pair = max(pc_.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        nw = {}
        for sym, (seq, n) in words.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
                    out.append(merged); i += 2
                else:
                    out.append(seq[i]); i += 1
            nw[sym] = (tuple(out), n)
        words = nw
    return merges


def _bpe_len_py(tok, ranks):
    seq = list(tok)
    while len(seq) >= 2:
        cands = [(ranks[(a, b)], i) for i, (a, b) in enumerate(zip(seq, seq[1:]))
                 if (a, b) in ranks]
        if not cands:
            break
        _, i = min(cands)
        seq[i:i + 2] = [seq[i] + seq[i + 1]]
    return len(seq)


def test_bpe_matches_sequential_oracle(ray_session):
    import ray
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import bpe_encode, bpe_train_ref

    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "wide wider widest wide",
        "low newer wide lowest",
    ] * 3
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    want_merges = _bpe_train_py(texts, 16)
    ds = rd.from_pandas(df).repartition(3)
    ref = bpe_train_ref(ds, n_merges=16)
    got_merges = [tuple(p) for p in ray.get(ref)]
    assert got_merges == want_merges
    ranks = {p: i for i, p in enumerate(want_merges)}
    got = bpe_encode(ds, ref).to_pandas().set_index("doc_id")
    for r in df.itertuples():
        ws = r.text.split(" ")
        want_n = sum(_bpe_len_py(w, ranks) for w in ws)
        assert got.loc[r.doc_id, "n_bpe"] == want_n
        assert got.loc[r.doc_id, "n_tokens"] == len(ws)
    # merges actually compress: fewer symbols than characters
    total_chars = sum(len(w) for t in texts for w in t.split(" "))
    assert got.n_bpe.sum() < total_chars


def test_chunk_documents_matches_python_oracle(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import chunk_documents

    texts = {
        0: " ".join(f"w{i}" for i in range(10)),  # 10 words, 3 chunks @ size4/stride3
        1: "single",
        2: "",
        3: " ".join(f"x{i}" for i in range(4)),   # exactly size -> 2 starts? no: starts 0,3
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    got = (
        chunk_documents(rd.from_pandas(df).repartition(2), size=4, overlap=1)
        .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    want_rows = []
    for did, t in texts.items():
        w = t.split(" ")
        k = 0
        while k * 3 < len(w):
            seg = w[k * 3 : k * 3 + 4]
            want_rows.append((did, k, " ".join(seg), len(seg)))
            k += 1
    want = pd.DataFrame(
        want_rows, columns=["doc_id", "chunk_id", "chunk_text", "n_words"]
    ).sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    got = got.astype({"doc_id": "int64", "chunk_id": "int64", "n_words": "int64"})
    assert got.equals(want.astype({"doc_id": "int64", "chunk_id": "int64", "n_words": "int64"}))
    # overlap property: consecutive chunks share exactly `overlap` words
    c0 = got[(got.doc_id == 0) & (got.chunk_id == 0)].chunk_text.iloc[0].split(" ")
    c1 = got[(got.doc_id == 0) & (got.chunk_id == 1)].chunk_text.iloc[0].split(" ")
    assert c0[-1:] == c1[:1]


def _ws_oracle(df: pd.DataFrame, id_col, w_col, k, seed="ws"):
    import math

    rows = []
    for d, w in zip(df[id_col], df[w_col]):
        if w is None or not (w > 0):
            continue
        h = int(hashlib.md5(f"{d}-{seed}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        rows.append((d, float(w), -math.log(u) / w))
    rows.sort(key=lambda r: (r[2], r[0]))
    return pd.DataFrame(rows[:k], columns=[id_col, w_col, "score"])


@pytest.mark.parametrize("nparts", [1, 5, 13])
def test_weighted_sample_matches_oracle_any_partitioning(ray_session, nparts):
    import numpy as np
    import ray.data as rd

    from ocr_suite_ray.stages.contamination import weighted_sample

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {"doc_id": np.arange(2000, dtype="int64"), "w": rng.randint(1, 1000, 2000).astype("int64")}
    )
    got = weighted_sample(
        rd.from_pandas(df).repartition(nparts), "doc_id", "w", k=40
    ).to_pandas()
    want = _ws_oracle(df, "doc_id", "w", 40)
    pd.testing.assert_frame_equal(got, want)


def test_weighted_sample_skips_nonpositive_and_prefers_heavy(ray_session):
    import numpy as np
    import ray.data as rd

    from ocr_suite_ray.stages.contamination import weighted_sample

    n = 1000
    # 20 heavy rows (weight 10000) among 980 light ones (weight 1)
    w = np.ones(n, dtype="int64")
    w[:20] = 10_000
    w[500] = 0
    w[501] = -3
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "w": w})
    got = weighted_sample(rd.from_pandas(df).repartition(4), "doc_id", "w", k=25).to_pandas()
    assert not set(got["doc_id"]) & {500, 501}
    # all 20 heavy rows should land in the top 25 with overwhelming probability
    assert len(set(got["doc_id"]) & set(range(20))) >= 18
    pd.testing.assert_frame_equal(got, _ws_oracle(df, "doc_id", "w", 25))


def test_weighted_sample_k_exceeds_rows(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.contamination import weighted_sample

    df = pd.DataFrame({"doc_id": [1, 2, 3], "w": [5, 5, 5]})
    got = weighted_sample(rd.from_pandas(df), "doc_id", "w", k=10).to_pandas()
    assert len(got) == 3


@pytest.mark.parametrize("nparts", [1, 6])
def test_temperature_resample_matches_python(ray_session, nparts):
    """Exact python twin of the alpha=0.5 rule + the md5 filter, any
    partitioning; realized per-group shares track sqrt-proportional targets."""
    import math

    import numpy as np
    import ray.data as rd

    from ocr_suite_ray.stages.contamination import temperature_resample

    rng = np.random.RandomState(13)
    langs = ["en"] * 6000 + ["de"] * 2000 + ["fr"] * 500 + ["sw"] * 100
    df = pd.DataFrame(
        {"doc_id": np.arange(len(langs), dtype="int64"), "lang": langs}
    ).sample(frac=1.0, random_state=rng).reset_index(drop=True)
    target = 3000
    got = (
        temperature_resample(
            rd.from_pandas(df).repartition(nparts), "lang", "doc_id", target_total=target
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # python twin
    n = df.groupby("lang").size()
    order = sorted(n.index)
    z = float(np.sum([math.sqrt(n[g]) for g in order]))
    thr = {g: int(math.floor(10000 * min(target * math.sqrt(n[g]) / z, n[g]) / n[g])) for g in order}
    keep = [
        int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 10000 < thr[g]
        for d, g in zip(df["doc_id"], df["lang"])
    ]
    want = df[keep].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # direction: the rare language keeps a larger FRACTION than the big one
    got_n = got.groupby("lang").size()
    assert got_n["sw"] / n["sw"] > got_n["en"] / n["en"]
    # groups are never upsampled and the realized total respects the target
    assert len(got) <= target


def test_temperature_resample_empty(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.contamination import temperature_resample

    df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "lang": pd.Series([], dtype="object")})
    got = temperature_resample(rd.from_pandas(df), "lang", "doc_id", 100)
    assert got.count() == 0


def test_word_ngrams_large_string_input():
    """The extracted/final store carries large_string text; the kernel must
    cast rather than die in binary_join_element_wise (which has no
    (large_string…, string) variant)."""
    import pyarrow as pa

    texts = ["a b c d e f", "x y z"]
    rows_s, grams_s = _word_ngrams(pa.array(texts, pa.string()), 3)
    rows_l, grams_l = _word_ngrams(pa.array(texts, pa.large_string()), 3)
    assert rows_s.tolist() == rows_l.tolist()
    assert grams_s.to_pylist() == grams_l.to_pylist()


def test_lm_scores_oov_uses_smoothing_floor(ray_session):
    """Cross-corpus scoring: tokens absent from the model's unigram table
    must score at the add-one smoothing floor ln(1/(total+vocab)), not
    poison the cumsum with NaN -> INT64_MIN garbage."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import lm_scores, unigram_count_ref

    model_corpus = pd.DataFrame({"text": ["aa bb aa", "bb cc"]})
    ref = unigram_count_ref(rd.from_pandas(model_corpus))
    # model stats: counts aa=2 bb=2 cc=1, total=5, vocab=3
    total, vocab = 5.0, 3.0
    floor = math.log(1.0 / (total + vocab))
    lp = {
        "aa": math.log(3.0 / 8.0),
        "bb": math.log(3.0 / 8.0),
        "cc": math.log(2.0 / 8.0),
    }
    got = lm_scores(pa.array(["aa zz", "zz zz zz"]), ref)
    want0 = int(np.floor(-(lp["aa"] + floor) / 2 * 10000 + 0.5))
    want1 = int(np.floor(-floor * 10000 + 0.5))
    assert got.tolist() == [want0, want1]
    assert (got > 0).all() and (got < 10**9).all()  # sane magnitudes, no INT64_MIN


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------

def _bigram_oracle(docs):
    """Sequential bigram-LM twin: add-one ln P(cur|prev), c1 = prev
    marginal of the bigram table, V = distinct continuation vocab."""
    import math
    from collections import Counter

    import numpy as np

    c2, c1 = Counter(), Counter()
    curs = set()
    for d in docs:
        toks = d.split(" ")
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
            curs.add(b)
    v = float(len(curs))
    out = {}
    for i, d in enumerate(docs):
        toks = d.split(" ")
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out[i] = None
            continue
        s = sum(math.log((c2[p] + 1.0) / (c1[p[0]] + v)) for p in pairs)
        out[i] = int(np.floor(-s / len(pairs) * 10000 + 0.5))
    return out


def test_bigram_lm_matches_python_oracle(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import bigram_lm_score

    docs = [
        "aa bb aa bb cc",
        "bb cc dd",
        "single",          # no bigram -> NULL
        "aa aa aa aa",
        "",                # empty text -> [''] -> no bigram -> NULL
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    want = _bigram_oracle(docs)
    for parts in (1, 4):
        got = (
            bigram_lm_score(rd.from_pandas(df).repartition(parts))
            .to_pandas().set_index("doc_id")["bigram_nll_e4"]
        )
        for i in range(len(docs)):
            if want[i] is None:
                assert pd.isna(got[i]), i
            else:
                assert int(got[i]) == want[i], i


def test_bigram_lm_large_string_input(ray_session):
    """The extracted store carries large_string text; the bigram kernel
    must not hit the missing (large_string, string) join kernel."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import bigram_lm_score

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aa bb cc", "bb cc"], pa.large_string()),
    })
    got = bigram_lm_score(rd.from_arrow(t)).to_pandas()
    want = _bigram_oracle(["aa bb cc", "bb cc"])
    assert [int(x) for x in got["bigram_nll_e4"]] == [want[0], want[1]]


def test_bigram_broadcast_budget_raises():
    import pyarrow as pa

    from ocr_suite_ray.stages import text_ops

    big = pa.table({
        "gram": pa.array(["a b"], pa.string()),
        "n": pa.array([1], pa.int64()),
    })
    old = text_ops._BIGRAM_BROADCAST_BUDGET
    text_ops._BIGRAM_BROADCAST_BUDGET = 0
    try:
        with pytest.raises(ValueError, match="broadcast budget"):
            text_ops._bigram_logp_series(big)
    finally:
        text_ops._BIGRAM_BROADCAST_BUDGET = old


def test_decontaminate_hash64_twin(ray_session):
    """The hash64 scale mode (no gram-string materialization on either
    side) produces the same report as the exact mode — planted overlaps,
    short rows, large_string input, and the sf documents table."""
    import pyarrow as pa
    import ray.data as rd

    ev = pd.DataFrame({
        "doc_id": [1000, 1001],
        "text": ["the secret eval answer is tau",
                 "benchmark row two here now yes"],
    })
    corpus = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "prefix words the secret eval answer is tau suffix",
            "completely unrelated text with no overlap at all",
            "benchmark row two here now yes",
            "short row",  # < n words: contributes nothing in both modes
        ],
    })
    a = (
        decontaminate(rd.from_pandas(corpus), rd.from_pandas(ev), n=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        decontaminate(rd.from_pandas(corpus).repartition(3),
                      rd.from_pandas(ev), n=5, gram_key="hash64")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)

    # large_string corpus input (the extracted store's type)
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(
            ["prefix words the secret eval answer is tau suffix"],
            pa.large_string(),
        ),
    })
    c = decontaminate(
        rd.from_arrow(t), rd.from_pandas(ev), n=5, gram_key="hash64"
    ).to_pandas()
    assert c.loc[0, "n_contam"] == 2 and c.loc[0, "flagged"] == 1

    # sf-scale twin: identical report on the real documents table
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ds = rd.from_arrow(docs)
    ev_ds = rd.from_arrow(docs.slice(0, 25))
    ex = (
        decontaminate(ds, ev_ds, n=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    hs = (
        decontaminate(ds, ev_ds, n=5, gram_key="hash64")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ex, hs)
