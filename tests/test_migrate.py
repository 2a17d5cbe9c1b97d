"""Store schema migration: the reference's versioned update ladder
(update.inl v0->v4, v3.inl live-data rewrite) over the flagship store —
migrate without re-extracting, lineage carried so resume stays intact."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from ocr_suite_ray.pipelines.extract import ExtractConfig, run_pipeline
from ocr_suite_ray.sources.synthetic import generate_corpus
from ocr_suite_ray.state import lineage as lin
from ocr_suite_ray.state.migrate import migrate_store


def _make_v2_step():
    """Sample v1->v2 step: append a derived text_len column. Built as a
    closure so cloudpickle ships it by value (test modules are not
    importable on Ray workers; real ladders live in ocr_suite_ray)."""

    def _step(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return t.append_column(
            "text_len", pc_.cast(pc_.utf8_length(t["text"]), pa.int32())
        )

    return _step


_v2_add_text_len = _make_v2_step()


@pytest.fixture(scope="module")
def v1_store(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("mig")
    pages = str(root / "pages")
    out = str(root / "out")
    generate_corpus(pages, 300, seed=7, n_files=3)
    run_pipeline(pages, out, ExtractConfig(wave_size=3, pool_size=3))
    return pages, out, str(root)


def test_migrate_v1_to_v2_byte_identical_plus_column(v1_store):
    pages, out, root = v1_store
    dst = os.path.join(root, "out_v2")
    summary = migrate_store(
        out, dst, to_version=2, steps={2: _v2_add_text_len}
    )
    assert summary["from_version"] == 1 and summary["to_version"] == 2
    assert summary["partitions"] == 3

    old_final = pads.dataset(
        sorted(
            f for f in glob.glob(os.path.join(out, "final", "*.parquet"))
            if not f.endswith("winners.parquet")
        )
    ).to_table().sort_by("url")
    new_final = pads.dataset(
        sorted(
            f for f in glob.glob(os.path.join(dst, "final", "*.parquet"))
            if not f.endswith("winners.parquet")
        )
    ).to_table().sort_by("url")
    # byte-identical except the appended column
    assert new_final.column_names == old_final.column_names + ["text_len"]
    assert new_final.drop_columns(["text_len"]).equals(old_final)
    got_len = new_final["text_len"].to_pylist()
    want_len = [len(x) for x in old_final["text"].to_pylist()]
    assert got_len == want_len

    # per-partition extracted dirs migrated file-for-file
    for pid in range(3):
        olds = sorted(glob.glob(
            os.path.join(out, "extracted", f"partition_id={pid}",
                         "**", "*.parquet"),
            recursive=True,
        ))
        news = sorted(glob.glob(
            os.path.join(dst, "extracted", f"partition_id={pid}",
                         "**", "*.parquet"),
            recursive=True,
        ))
        assert olds, f"partition {pid} has no extracted files"
        assert [os.path.relpath(f, dst) for f in news] == [
            os.path.relpath(f, out) for f in olds
        ]
        for o, n in zip(olds, news):
            to, tn = pq.read_table(o), pq.read_table(n)
            assert tn.drop_columns(["text_len"]).equals(to)

    # winners carry the extracted schema -> migrated, not copied
    w_new = pq.read_table(os.path.join(dst, "final", "winners.parquet"))
    w_old = pq.read_table(os.path.join(out, "final", "winners.parquet"))
    assert w_new.drop_columns(["text_len"]).equals(w_old)
    # url/ts membership state IS carried verbatim
    assert pq.read_table(os.path.join(dst, "dup_urls.parquet")).equals(
        pq.read_table(os.path.join(out, "dup_urls.parquet"))
    )


def test_migrate_carries_lineage_resume_intact(v1_store):
    pages, out, root = v1_store
    dst = os.path.join(root, "out_v2b")
    migrate_store(out, dst, to_version=2, steps={2: _v2_add_text_len})

    old_recs = lin.load_records(out)
    new_recs = lin.load_records(dst)
    assert set(new_recs) == set(old_recs)
    for pid, rec in new_recs.items():
        o = old_recs[pid]
        assert rec.schema_version == 2
        assert rec.input_fingerprint == o.input_fingerprint
        assert rec.rows_done == o.rows_done
        assert rec.status == lin.STATUS_DONE

    # the whole point: a v2 engine resuming against the migrated store
    # has NOTHING pending (fingerprints still match the untouched pages)
    files = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    # records carry salted fingerprints (dup-membership component), so
    # compare via the record fingerprints' partition_fingerprint prefix
    pend = [
        (pid, f) for pid, f in enumerate(files)
        if not (
            new_recs[pid].status == lin.STATUS_DONE
            and new_recs[pid].schema_version == 2
            and new_recs[pid].input_fingerprint.startswith(
                lin.partition_fingerprint(f)
            )
        )
    ]
    assert pend == []
    # and the generic helper honours the migrated version
    assert lin.pending_partitions(files, dst, schema_version=1) != []


def test_migrate_rejects_gap_and_downgrade(v1_store):
    _pages, out, root = v1_store
    with pytest.raises(ValueError, match="no migration step"):
        migrate_store(out, os.path.join(root, "x1"), to_version=3,
                      steps={2: _v2_add_text_len})
    with pytest.raises(ValueError, match="downgrade"):
        # fake a v2 store record set by migrating first, then ask for v1
        dst = os.path.join(root, "x2")
        migrate_store(out, dst, to_version=2, steps={2: _v2_add_text_len})
        migrate_store(dst, os.path.join(root, "x3"), to_version=1, steps={})


def test_migrate_row_count_guard(v1_store):
    _pages, out, root = v1_store

    def _drops_rows(t: pa.Table) -> pa.Table:
        return t.slice(0, max(0, t.num_rows - 1))

    with pytest.raises(Exception, match="row count"):
        migrate_store(out, os.path.join(root, "x4"), to_version=2,
                      steps={2: _drops_rows})


def test_migrate_records_provenance(v1_store):
    _pages, out, root = v1_store
    dst = os.path.join(root, "x5")
    migrate_store(out, dst, to_version=2, steps={2: _v2_add_text_len})
    with open(os.path.join(dst, "_migration.json")) as fh:
        m = json.load(fh)
    assert m["from_version"] == 1 and m["to_version"] == 2


def test_migrate_staging_resume_skips_done_units(v1_store, tmp_path):
    """A killed migration's staging is reusable: units with a matching
    marker (same plan, same source fingerprint) are skipped; a plan
    mismatch wipes the staging instead."""
    import shutil

    pages, out, root = v1_store
    cnt_dir = str(tmp_path / "calls")
    os.makedirs(cnt_dir)

    def _make_counting_step(cnt):
        def _step(t):
            import os as _os
            import uuid as _uuid

            import pyarrow.compute as pc_

            open(_os.path.join(cnt, f"c-{_uuid.uuid4().hex}"), "w").close()
            return t.append_column(
                "text_len", pc_.cast(pc_.utf8_length(t["text"]), pa.int32())
            )

        return _step

    step = _make_counting_step(cnt_dir)
    dst_a = os.path.join(root, "res_a")
    migrate_store(out, dst_a, to_version=2, steps={2: step})
    calls_full = len(os.listdir(cnt_dir))
    assert calls_full > 0

    # fabricate a partial staging for dst_b: plan + partition-0 files +
    # its marker, exactly what a kill after one completed unit leaves
    recs = lin.load_records(out)
    dst_b = os.path.join(root, "res_b")
    staging = dst_b + ".staging"
    os.makedirs(os.path.join(staging, "_mig_done"))
    plan = {
        "from_version": 1,
        "to_version": 2,
        "source_dir": os.path.abspath(out),
        "source_done": lin.done_fingerprint_set(out),
    }
    with open(os.path.join(staging, "_migration_plan.json"), "w") as fh:
        json.dump(plan, fh, sort_keys=True)
    shutil.copytree(
        os.path.join(dst_a, "extracted", "partition_id=0"),
        os.path.join(staging, "extracted", "partition_id=0"),
    )
    n_p0_files = len(glob.glob(
        os.path.join(dst_a, "extracted", "partition_id=0", "**", "*.parquet"),
        recursive=True,
    ))
    with open(os.path.join(staging, "_mig_done", "part-00000.json"), "w") as fh:
        json.dump({"fp": recs[0].input_fingerprint, "rows": 0}, fh)

    for f in os.listdir(cnt_dir):
        os.unlink(os.path.join(cnt_dir, f))
    s = migrate_store(out, dst_b, to_version=2, steps={2: step})
    assert s["partitions_resumed"] == 1
    assert len(os.listdir(cnt_dir)) == calls_full - n_p0_files
    # identical promoted output either way
    a = pads.dataset(
        glob.glob(os.path.join(dst_a, "final", "*.parquet"))
    ).to_table().sort_by("url")
    b = pads.dataset(
        glob.glob(os.path.join(dst_b, "final", "*.parquet"))
    ).to_table().sort_by("url")
    assert a.equals(b)
    # no staging bookkeeping leaked into the promoted store
    assert not os.path.exists(os.path.join(dst_b, "_mig_done"))
    assert not os.path.exists(os.path.join(dst_b, "_migration_plan.json"))

    # plan mismatch (different to_version in staging) -> wiped, full run
    dst_c = os.path.join(root, "res_c")
    staging_c = dst_c + ".staging"
    os.makedirs(os.path.join(staging_c, "_mig_done"))
    with open(os.path.join(staging_c, "_migration_plan.json"), "w") as fh:
        json.dump({**plan, "to_version": 3}, fh, sort_keys=True)
    with open(os.path.join(staging_c, "_mig_done", "part-00000.json"), "w") as fh:
        json.dump({"fp": recs[0].input_fingerprint, "rows": 0}, fh)
    s2 = migrate_store(out, dst_c, to_version=2, steps={2: step})
    assert s2["partitions_resumed"] == 0
