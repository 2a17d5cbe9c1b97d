"""Single-writer lock parity test (reference: two-subprocess lock race in
``tools/ocs-watcher/tests/test_single_instance.py``)."""

from __future__ import annotations

import pytest

from ocr_suite_ray.pipelines.extract import PipelineLock


def test_lock_excludes_second_holder(tmp_path):
    out = str(tmp_path)
    with PipelineLock(out):
        with pytest.raises(RuntimeError, match="another extract run"):
            PipelineLock(out).__enter__()
    # released -> can acquire again
    with PipelineLock(out):
        pass


def test_lock_released_on_error(tmp_path):
    out = str(tmp_path)
    try:
        with PipelineLock(out):
            raise ValueError("boom")
    except ValueError:
        pass
    with PipelineLock(out):
        pass
