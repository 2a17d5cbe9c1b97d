"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on a deterministic
synthetic page corpus (BASELINE.json input_hint shape) at smoke scale.
``queries()`` / ``oracle_sql()`` expose the operator catalog from
``ocr_suite_ray.pipelines.queries`` — one entry per operator class in
SURVEY.md §2 plus the training-data ops; each SQL string is the DuckDB
oracle the driver compares against at sf=0.01.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
# Ray workers must import ocr_suite_ray too.
_pp = os.environ.get("PYTHONPATH", "")
if REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = REPO_ROOT + (os.pathsep + _pp if _pp else "")


def _register_by_value() -> None:
    """Ship this package's code inside task/actor specs (cloudpickle
    by-value) so Ray workers never need to import ``ocr_suite_ray`` from
    disk. The driver may have called ray.init() from any cwd/env before
    importing this module — module-level actor classes would otherwise be
    pickled by reference and fail to deserialize in the workers."""
    import importlib
    import pkgutil

    import ocr_suite_ray

    for m in pkgutil.walk_packages(ocr_suite_ray.__path__, "ocr_suite_ray."):
        try:
            importlib.import_module(m.name)
        except Exception:
            pass
    try:
        from ray import cloudpickle

        for name, mod in list(sys.modules.items()):
            if name == "ocr_suite_ray" or name.startswith("ocr_suite_ray."):
                if mod is not None:
                    cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass  # best effort; PYTHONPATH covers the normal case


_register_by_value()


def entry() -> Any:
    """Flagship pipeline: synthetic pages (t1 smoke tier) → extract →
    newest-capture-wins dedup → final extracted store, returned as a
    Dataset. Driver checks rows >= 0 and a stable schema."""
    import ray.data as rd

    from ocr_suite_ray.pipelines.extract import ExtractConfig, run_pipeline
    from ocr_suite_ray.sources.synthetic import generate_corpus

    pages_dir = "/tmp/ocs_entry/pages"
    out_dir = "/tmp/ocs_entry/out"
    generate_corpus(pages_dir, 1000, seed=42, n_files=4)
    run_pipeline(pages_dir, out_dir, ExtractConfig(wave_size=4, pool_size=4))
    return rd.read_parquet(os.path.join(out_dir, "final"))


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_suite_ray.pipelines.queries import ALL_QUERIES

    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from ocr_suite_ray.pipelines.queries import ALL_QUERIES

    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
