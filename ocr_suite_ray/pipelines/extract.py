"""Flagship pipeline: pages parquet → extract → dedup → extracted store.

The Ray-Data restatement of the reference's recognition loop (``SURVEY.md``
§3.1: CLI → DB watermark → seek → bounded queue → N OCR threads → store):

    read_parquet(pending partitions, columns pruned)
      → map_batches(sniff + within-block size clustering)      [stateless]
      → map_batches(PageExtractor, concurrency=pool, batch_size=B)  [ACTOR POOL]
      → write_parquet(partitioned by partition_id) + lineage   [phase 1]
    read(extracted) → dedup_latest(url)  → final store         [phase 2]

Phase 1 runs in **waves** of input partitions: each wave is one streaming
Dataset execution whose per-partition outputs are committed atomically
(temp dir + rename) together with their lineage records. A killed job loses
at most the in-flight wave; `pending_partitions` prunes everything already
committed — the watermark+seek resume of the reference (``src/common/
database.cpp:110-150``, ``src/ffmpeg/decoder.cpp:178-211``) at partition
granularity. Wave size trades checkpoint frequency against pipeline depth;
the default keeps ≥ 2 blocks per CPU in flight.

Skew (north_star): the sniff stage sorts every block by (payload_kind,
payload_bytes) so giant DOMs and PDF payloads cluster into their *own*
batches instead of riding along with fast rows — one straggler batch then
occupies one actor slot while the rest of the pool streams on (the
VisionKit-serialization lesson, ``README.md:80-81``). Set
``split_pdf_pool=True`` to additionally route PDFs to a dedicated
``PdfExtractor`` pool (costs a second pass over the wave's input).

Phase 2 (dedup + finalize) is cheap relative to extraction and re-runs only
when the set of done partitions changed (``done_fingerprint_set``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ocr_suite_ray.stages.dedup import dedup_latest
from ocr_suite_ray.stages.extract import PageExtractor, PdfExtractor, sniff_batch
from ocr_suite_ray.state import lineage as lin

PAGES_COLUMNS = ["url", "warc_ts", "html"]  # prune at the read: text/lang unused


@dataclass
class ExtractConfig:
    batch_size: int = 128            # pages per extractor call (wide binary rows)
    pool_size: int | tuple = 8       # extractor actor pool (concurrency)
    wave_size: int = 8               # input partitions committed per wave
    dedup_strategy: str = "agg_join"
    split_pdf_pool: bool = False     # dedicated PDF pool (second input pass)
    pdf_pool_size: int = 2
    num_partitions: int = 32         # hash-join partitions for dedup


def list_pages_files(pages_dir: str) -> list[str]:
    return sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )


def _sniff_and_cluster(batch: pa.Table) -> pa.Table:
    """Sniff payload kind/size, then sort the block by (kind, size) so
    map_batches slices homogeneous batches (block-level size bucketing)."""
    t = sniff_batch(batch)
    idx = pc.sort_indices(
        t, sort_keys=[("payload_kind", "ascending"), ("payload_bytes", "ascending")]
    )
    return t.take(idx)


def _read_wave(wave: list[tuple[int, str]], cfg: ExtractConfig):
    """One Dataset over a wave's files with a partition_id column attached
    via the include_paths hook (no extra pass, keeps Ray's per-file/row-group
    read parallelism)."""
    import ray.data as rd

    pid_by_path = {path: pid for pid, path in wave}

    def _attach_pid(batch: pa.Table) -> pa.Table:
        pids = [pid_by_path[p] for p in batch["path"].to_pylist()]
        batch = batch.drop_columns(["path"])
        return batch.append_column("partition_id", pa.array(pids, pa.int64()))

    ds = rd.read_parquet(
        [path for _, path in wave],
        columns=PAGES_COLUMNS,
        include_paths=True,
    )
    return ds.map_batches(_attach_pid, batch_format="pyarrow")


def _extract_ds(ds, cfg: ExtractConfig):
    ds = ds.map_batches(_sniff_and_cluster, batch_format="pyarrow")
    if cfg.split_pdf_pool:
        html = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["payload_kind"], "pdf")),
            batch_format="pyarrow",
        ).map_batches(
            PageExtractor,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.pool_size,
        )
        pdf = ds.map_batches(
            lambda t: t.filter(pc.equal(t["payload_kind"], "pdf")),
            batch_format="pyarrow",
        ).map_batches(
            PdfExtractor,
            batch_format="pyarrow",
            batch_size=max(4, cfg.batch_size // 8),
            concurrency=cfg.pdf_pool_size,
        )
        return html.union(pdf)
    return ds.map_batches(
        PageExtractor,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.pool_size,
    )


def _commit_wave(tmp_dir: str, extracted_dir: str, wave: list[tuple[int, str]], wall: float) -> int:
    """Atomically promote each partition's output dir and write its lineage
    record. Returns rows committed."""
    total = 0
    per_pid_rows: dict[int, int] = {pid: 0 for pid, _ in wave}
    for pid, _ in wave:
        src = os.path.join(tmp_dir, f"partition_id={pid}")
        dst = os.path.join(extracted_dir, f"partition_id={pid}")
        if not os.path.isdir(src):  # partition produced zero rows
            os.makedirs(src, exist_ok=True)
        n = sum(
            pq.read_metadata(os.path.join(src, f)).num_rows
            for f in os.listdir(src)
            if f.endswith(".parquet")
        )
        per_pid_rows[pid] = n
        total += n
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)
    rate = total / wall if wall > 0 else 0.0
    for pid, path in wave:
        lin.write_record(
            os.path.dirname(extracted_dir),
            lin.LineageRecord(
                partition_id=pid,
                input_path=path,
                input_fingerprint=lin.partition_fingerprint(path),
                rows_done=per_pid_rows[pid],
                status=lin.STATUS_DONE,
                stage_metrics={"wave_wall_s": round(wall, 3), "wave_rows_per_s": round(rate, 1)},
            ),
        )
    return total


def run_extract_phase(pages_dir: str, out_dir: str, cfg: ExtractConfig | None = None) -> dict:
    """Phase 1: extract all pending partitions, wave by wave. Idempotent."""
    cfg = cfg or ExtractConfig()
    files = list_pages_files(pages_dir)
    if not files:
        raise FileNotFoundError(f"no pages parquet under {pages_dir}")
    extracted_dir = os.path.join(out_dir, "extracted")
    os.makedirs(extracted_dir, exist_ok=True)
    pending = lin.pending_partitions(files, out_dir)
    summary = {
        "partitions_total": len(files),
        "partitions_skipped": len(files) - len(pending),
        "partitions_processed": 0,
        "rows_extracted": 0,
        "waves": 0,
    }
    for w0 in range(0, len(pending), cfg.wave_size):
        wave = pending[w0 : w0 + cfg.wave_size]
        tmp_dir = os.path.join(out_dir, "_wave_tmp")
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)  # leftovers from a killed run
        t0 = time.monotonic()
        ds = _extract_ds(_read_wave(wave, cfg), cfg)
        ds.write_parquet(tmp_dir, partition_cols=["partition_id"])
        wall = time.monotonic() - t0
        summary["rows_extracted"] += _commit_wave(tmp_dir, extracted_dir, wave, wall)
        summary["partitions_processed"] += len(wave)
        summary["waves"] += 1
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
    return summary


def run_finalize_phase(out_dir: str, cfg: ExtractConfig | None = None) -> dict:
    """Phase 2: newest-capture-wins dedup over all done partitions → final/.

    Skipped when the done-set fingerprint matches the last finalize (the
    global-watermark check)."""
    import ray.data as rd

    cfg = cfg or ExtractConfig()
    extracted_dir = os.path.join(out_dir, "extracted")
    final_dir = os.path.join(out_dir, "final")
    manifest_path = os.path.join(out_dir, "final_manifest.json")
    fp = lin.done_fingerprint_set(out_dir)
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            if json.load(fh).get("done_fingerprint") == fp and os.path.isdir(final_dir):
                return {"skipped": True, "done_fingerprint": fp}
    ds = rd.read_parquet(extracted_dir)
    if "partition_id" in ds.schema().names:
        ds = ds.drop_columns(["partition_id"])
    deduped = dedup_latest(
        ds, strategy=cfg.dedup_strategy, num_partitions=cfg.num_partitions
    )
    tmp_final = final_dir + ".tmp"
    if os.path.isdir(tmp_final):
        shutil.rmtree(tmp_final)
    deduped.write_parquet(tmp_final)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_final, final_dir)
    with open(manifest_path + ".tmp", "w") as fh:
        json.dump({"done_fingerprint": fp}, fh)
    os.replace(manifest_path + ".tmp", manifest_path)
    return {"skipped": False, "done_fingerprint": fp}


def run_pipeline(pages_dir: str, out_dir: str, cfg: ExtractConfig | None = None) -> dict:
    """End-to-end: resumable extract waves, then dedup/finalize."""
    s1 = run_extract_phase(pages_dir, out_dir, cfg)
    s2 = run_finalize_phase(out_dir, cfg)
    return {**s1, "finalize": s2, "final_dir": os.path.join(out_dir, "final")}
