"""Link-graph ops: href extraction semantics + integer PageRank vs a
sequential pure-Python oracle, plus partitioning invariance."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _pure_pagerank_e9(edges, n_iter=3, d_e2=85):
    """Sequential oracle: same integer fixed-point recurrence."""
    E9 = 1_000_000_000
    edges = sorted(set(edges))
    hosts = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(hosts)
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    r = {h: E9 // n for h in hosts}
    for _ in range(n_iter):
        inflow = {h: 0 for h in hosts}
        for s, d in edges:
            inflow[d] += r[s] // od[s]
        r = {
            h: ((100 - d_e2) * E9) // (100 * n) + (d_e2 * inflow[h]) // 100
            for h in hosts
        }
    return r


def test_extract_links_resolution(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.graph import extract_links

    html = (
        '<a href="https://Other.COM/x">abs</a> '
        '<a href="//CDN.example.net:443/y">prel</a> '
        '<a href="/rel/path">rel</a> '
        "<a href='https://Quoted.io/z'>single</a> "
        "<a href=https://bare.dev/w>bare</a> "
        '<a href="" >empty-matches-but-resolves-relative</a> '
        '<a href="unterminated'
    )
    t = pa.table(
        {
            "url": pa.array(["https://www.Me.org/page"], pa.string()),
            "html": pa.array([html.encode()], pa.large_binary()),
        }
    )
    got = extract_links(rd.from_arrow(t)).to_pandas()
    assert list(got.src_host) == ["me.org"] * 6
    assert list(got.dst_host) == [
        "other.com", "cdn.example.net", "me.org",  # abs / prel / rel
        "quoted.io", "bare.dev",                   # single-quoted / bare
        "me.org",                                  # empty value -> relative
    ]


def test_extract_links_on_flagship_corpus(ray_session, tmp_path):
    """The synthetic page corpus carries real relative anchors; every link
    must resolve to the page's own host, and counts must match a
    stdlib-parser differential oracle."""
    import re

    import ray.data as rd

    from ocr_suite_ray.sources.synthetic import generate_pages_table
    from ocr_suite_ray.stages.graph import extract_links

    t = generate_pages_table(60, seed=7)
    ds = rd.from_arrow(t)
    import pyarrow.compute as pc

    got = extract_links(ds).to_pandas()
    # differential: count href= occurrences in the utf-8-decodable payloads
    want = 0
    for h in t["html"].to_pylist():
        try:
            s = h.decode("utf-8")
        except UnicodeDecodeError:
            continue
        want += len(re.findall(r'href="[^"]*"', s))
    assert len(got) == want
    assert (got.src_host == got.dst_host).all()  # relative links only


def test_pagerank_matches_pure_python(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.graph import pagerank_e9

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "c"),  # dup edge collapses
        ("e", "a"),  # e dangles (no in-links), a feeds the cycle
    ]
    t = pa.table(
        {
            "src_host": pa.array([s for s, _ in edges]),
            "dst_host": pa.array([d for _, d in edges]),
        }
    )
    for nparts in (1, 4):
        ds = rd.from_arrow(t).repartition(nparts)
        got = (
            pagerank_e9(ds, n_iter=3)
            .to_pandas()
            .set_index("host")["rank_e9"]
            .to_dict()
        )
        assert got == _pure_pagerank_e9(edges, n_iter=3)


def test_pagerank_empty_and_guard(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.graph import pagerank_e9

    empty = pa.table(
        {"src_host": pa.array([], pa.string()), "dst_host": pa.array([], pa.string())}
    )
    assert pagerank_e9(rd.from_arrow(empty)).count() == 0

    two = pa.table(
        {"src_host": pa.array(["a", "b"]), "dst_host": pa.array(["b", "a"])}
    )
    with pytest.raises(ValueError, match="broadcast tier"):
        pagerank_e9(rd.from_arrow(two), max_broadcast_rows=1)
    with pytest.raises(ValueError, match="d_e2"):
        pagerank_e9(rd.from_arrow(two), d_e2=101)


def test_extract_links_tolerates_invalid_utf8_and_case_variants():
    import pyarrow as pa
    import ray.data as rd

    from ocr_suite_ray.stages.graph import extract_links

    pages = pa.table({
        "url": ["https://a.example.com/1", "https://b.example.com/2"],
        "html": pa.array([
            b'junk \xff\xfe <a HREF="https://t1.example.org/x">l</a>',
            b'<a href = "https://t2.example.org/y">l</a>',
        ], pa.binary()),
    })
    out = extract_links(
        rd.from_arrow(pages), url_col="url", html_col="html"
    ).to_pandas()
    dsts = set(out["dst_host"])
    assert "t1.example.org" in dsts  # invalid bytes elsewhere didn't crash
    assert "t2.example.org" in dsts  # spaced attr form


def test_pagerank_drops_null_endpoint_edges(ray_session):
    """An edge with a null src/dst host must be ignored (not crash the
    host-universe sort or flow NaN outdegrees into int64 garbage)."""
    import pandas as pd
    import ray.data as rd

    from ocr_suite_ray.stages.graph import pagerank_e9

    clean = pd.DataFrame({"src_host": ["a", "b"], "dst_host": ["b", "a"]})
    noisy = pd.DataFrame({
        "src_host": ["a", "b", None, "c"],
        "dst_host": ["b", "a", "x", None],
    })
    got_clean = pagerank_e9(rd.from_pandas(clean)).to_pandas().sort_values(
        "host").reset_index(drop=True)
    got_noisy = pagerank_e9(rd.from_pandas(noisy)).to_pandas().sort_values(
        "host").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_clean, got_noisy)
