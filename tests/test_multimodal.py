"""Multimodal plumbing tests: the decode kernel is a stub, the Ray-side
schema/batching/actor wiring is real and must behave."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from ocr_suite_ray.stages.multimodal import (
    FakeDecoder,
    FrameSampler,
    attach_media_meta,
    decode_media,
)


def _media_table(n=40):
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(
                [b"\x89PNG" + bytes([i]) * (100 + i) for i in range(n)], pa.binary()
            ),
        }
    )


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        FakeDecoder(codec="real")


def test_attach_media_meta_schema():
    out = attach_media_meta(_media_table())
    m = out.column("media_meta").to_pylist()[0]
    assert set(m) == {"media_kind", "n_bytes", "content_hash"}
    assert m["media_kind"] == "image"


def test_decode_media_deterministic_across_batching(ray_session):
    import ray.data as rd

    t = _media_table()
    a = decode_media(rd.from_arrow(t), batch_size=7).take_all()
    b = decode_media(rd.from_arrow(t).repartition(5), batch_size=3).take_all()
    key = lambda r: r["media_id"]
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert a == b
    assert all(len(r["feature"]) == 16 for r in a)
    assert all(64 <= r["width"] <= 255 for r in a)


def test_frame_sampler_explodes_rows(ray_session):
    import ray.data as rd

    out = (
        rd.from_arrow(_media_table(10))
        .map_batches(FrameSampler, batch_format="pyarrow", batch_size=4,
                     concurrency=2)
        .take_all()
    )
    ids = {r["media_id"] for r in out}
    assert ids == set(range(10))
    assert len(out) > 10  # exploded
    per0 = [r for r in out if r["media_id"] == 0]
    assert [r["frame_idx"] for r in per0] == sorted(r["frame_idx"] for r in per0)
