"""unicode_clean: lower + NFC + whitespace collapse (CC-Net hygiene pass)."""

import unicodedata

import pyarrow as pa
import pytest
import ray.data as rd

from ocr_suite_ray.stages.text_ops import unicode_clean


def _run(values, typ=pa.string()):
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(values))),
                  "text": pa.array(values, typ)})
    )
    out = unicode_clean(ds, "text").to_pandas().sort_values("doc_id")
    return out["text_clean"].tolist()


def test_composed_and_decomposed_collapse_to_same_bytes():
    composed = "Café x"
    decomposed = "Café x"
    got = _run([composed, decomposed])
    assert got[0] == got[1] == "café x"


def test_whitespace_runs_collapse_and_trim():
    assert _run(["  a\t\tb\n\nc  "]) == ["a b c"]


def test_ascii_fast_path_matches_unicodedata():
    vals = ["Plain  ASCII Text", "MiXeD case"]
    expect = [" ".join(unicodedata.normalize("NFC", v.lower()).split()) for v in vals]
    assert _run(vals) == expect


def test_null_passthrough_and_fullwidth_lower():
    got = _run([None, "\uFF21\uFF22\uFF23"])
    assert got[0] is None or (isinstance(got[0], float))  # pandas NaN for null
    assert got[1] == "ａｂｃ"


def test_large_string_offsets_preserved():
    # the extracted store carries large_string; the rebuilt non-ASCII
    # column must keep the 64-bit offset width
    vals = ["Café", "plain"]
    ds = rd.from_arrow(
        pa.table({"doc_id": [0, 1], "text": pa.array(vals, pa.large_string())})
    )
    t = unicode_clean(ds, "text").take_all()
    assert sorted(r["text_clean"] for r in t) == ["café", "plain"]
