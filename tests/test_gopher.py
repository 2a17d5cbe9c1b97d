"""gopher_signals vs a sequential python oracle over constructed edge
cases: rule boundaries, empty text, non-alpha tokens, repetition, and the
large_string store type."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ocr_suite_ray.stages.text_ops import STOPWORDS, gopher_signals


def _oracle_row(text: str) -> dict:
    toks = text.split(" ")
    n = max(len(toks), 1)
    mean_e2 = int(np.floor(sum(len(t) for t in toks) * 100.0 / n + 0.5))
    n_alpha = sum(1 for t in toks if re.search("[A-Za-z]", t))
    alpha_e4 = int(np.floor(n_alpha * 10000.0 / n + 0.5))
    stop_hits = sum(1 for sw in STOPWORDS if sw in toks)
    top = max(toks.count(t) for t in set(toks))
    top_e4 = int(np.floor(top * 10000.0 / n + 0.5))
    keep = (
        50 <= n <= 100000
        and 300 <= mean_e2 <= 1000
        and alpha_e4 >= 8000
        and stop_hits >= 2
        and top_e4 <= 2000
    )
    return {
        "n_tokens": n,
        "mean_token_len_e2": mean_e2,
        "alpha_frac_e4": alpha_e4,
        "stop_hits": stop_hits,
        "top_token_frac_e4": top_e4,
        "keep": keep,
    }


def _distinct_words(n: int) -> str:
    # 60 distinct 4-char words + the two stop words keep every rule green
    return " ".join(f"ab{i:02d}" for i in range(n))


CASES = [
    "",  # empty text: split ⇒ [''], n_tokens clamps to 1
    "one two three",  # under the 50-word floor
    "the a " + _distinct_words(60),  # passes every rule
    "the " + _distinct_words(60),  # 1 distinct stop word: fails
    "the a " + _distinct_words(49),  # n=51 boundary pass
    "the a " + " ".join(["dup"] * 20) + " " + _distinct_words(40),  # >20% top token
    "the a " + " ".join("123.4" for _ in range(60)),  # non-alpha words
    "the a " + " ".join("x" * 30 for _ in range(60)),  # mean len > 10
    "the a of to and " + _distinct_words(55),  # all 5 stop words
]


def test_gopher_signals_matches_sequential_oracle():
    t = pa.table({"doc_id": list(range(len(CASES))), "text": CASES})
    got = gopher_signals(t).to_pydict()
    for i, text in enumerate(CASES):
        want = _oracle_row(text)
        for col, v in want.items():
            assert got[col][i] == v, (i, col, got[col][i], v)
    # sanity: the fixture covers both outcomes
    assert True in got["keep"] and False in got["keep"]


def test_gopher_signals_large_string_input():
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["the a " + _distinct_words(60)], pa.large_string()),
        }
    )
    out = gopher_signals(t)
    assert out["keep"][0].as_py() is True


def test_dup_ngram_stats_matches_sequential_oracle(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import dup_ngram_stats

    docs = [
        "",  # no grams
        "one",  # single token: no 2-grams
        "a b a b a b c",  # repeated 2-gram "a b"
        "x y z w v " * 4 + "tail",  # repeated 5-gram
        "p q r s",  # 2-grams only, under the 5-gram width
    ]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    )
    got = (
        dup_ngram_stats(ds, "doc_id", "text", n_top=2, n_dup=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def _grams(toks, n):
        return [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]

    import collections

    import numpy as np

    for i, text in enumerate(docs):
        toks = text.split(" ")
        n_chars = max(len(text), 1)
        c2 = collections.Counter(_grams(toks, 2))
        top2 = max((c * len(g) for g, c in c2.items()), default=0)
        c5 = collections.Counter(_grams(toks, 5))
        dup5 = sum(c * len(g) for g, c in c5.items() if c > 1)
        assert got.top2_gram_cover_e4[i] == int(
            np.floor(top2 * 10000.0 / n_chars + 0.5)
        ), (i, "top2")
        assert got.dup5_gram_chars_e4[i] == int(
            np.floor(dup5 * 10000.0 / n_chars + 0.5)
        ), (i, "dup5")
    assert got.dup5_gram_chars_e4[3] > 0  # fixture exercises the dup path


def test_badword_filter_case_empty_and_large_string(ray_session):
    """Blocklist gate: case-insensitive token match, empty docs and
    large_string input pass through the same kernel."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import badword_filter

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": pa.array(
                [
                    "clean text here",
                    "has DUP inside",        # case-insensitive hit
                    "",                       # empty -> kept
                    "duplicate is a prefix not a token",  # no hit
                    "ends with dup",
                ],
                pa.large_string(),
            ),
        }
    )
    out = badword_filter(rd.from_arrow(t), ("dup",)).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 3, 4]
