"""Flagship pipeline: pages parquet → extract → dedup → extracted store.

The Ray-Data restatement of the reference's recognition loop (``SURVEY.md``
§3.1: CLI → DB watermark → seek → bounded queue → N OCR threads → store):

    phase 0: url-column-only scan → global dup-url set           [narrow reduce]
    phase 1 (per wave, resumable): Dataset of (file,row_group,pid) specs
      → map_batches(FusedExtractWriter, concurrency=pool)        [ACTOR POOL:
        read row group → sniff → warm-parser extract → tag is_dup
        → write partition_id=N/is_dup=K files; emits only counts]
      → atomic commit + per-partition lineage
    phase 2: hardlink unique-url files into final/ + exact reduce
      of the tiny dup subset                                     [narrow]

Phase 1 runs in **waves** of input partitions: each wave is one streaming
Dataset execution whose per-partition outputs are committed atomically
(temp dir + rename) together with their lineage records. A killed job loses
at most the in-flight row-group UNITS of the current wave (per-unit
completion markers, `_load_unit_markers`); `pending_partitions` prunes
everything already committed — the watermark+seek resume of the reference
(``src/common/database.cpp:110-150``, ``src/ffmpeg/decoder.cpp:178-211``)
at row-group granularity. Partitions are salted with the fingerprint of
their OWN dup-membership decisions (`_per_file_dup_fp_refs`), so growing the
input re-extracts only partitions whose flags actually changed.

The fused wave exists because Ray cannot fuse a task-based ReadParquet into
an actor-pool map_batches: the unfused pipeline moves every payload byte
through the object store twice (measured in BASELINE.md's ablation). Set
``fused_wave=False`` for the classic operator pipeline
(read → sniff → extract → tag → sink), e.g. when ``split_pdf_pool=True``
routes PDFs to a dedicated high-memory pool (the VisionKit-isolation
analogue, ``README.md:80-81``).

Skew (north_star): work units are row groups, which are written with a
fixed ROW count — so a byte-heavy unit is exactly one carrying giant DOMs,
and it delays only its own task while the pool streams on. The explicit
``size_cluster`` sniff-sort remains available for sub-batch clustering
(ablation showed whole-unit tasks faster at high core counts).

Phase 2 (dedup + finalize) costs O(dup rate), not O(corpus): unique-url
partition files are hardlinked, only dup-url rows are reduced; it re-runs
only when the set of done partitions changed (``done_fingerprint_set``).
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
from ocr_suite_ray.state.dupset import (
    DupMembership,
    coalesce_reduce,
    dup_key_table_ref,
    dup_meta,
    dup_meta_ref,
    load_dup_table_ref,
    membership_ref,
)

PAGES_COLUMNS = ["url", "warc_ts", "html"]  # prune at the read: text/lang unused


@dataclass
class ExtractConfig:
    # None = one extractor call per block. Ray's read path splits blocks by
    # BYTES (SplitBlocks), so a block holds either ~1000 median pages or a
    # handful of giant DOMs — the size bucketing the skew isolation needs
    # falls out of block formation, and whole-block tasks measured faster at
    # high core counts than sub-batch slicing (see BASELINE.md ablation).
    batch_size: int | None = None
    pool_size: int | tuple = 8       # extractor actor pool (concurrency)
    # input partitions (files) committed per wave. "auto" bounds the wave
    # COUNT instead of the wave size (see _resolve_wave_size): every wave
    # barrier pays a fixed pipeline-ramp cost (~1.8 s at 32 cpus — warm
    # 10M-page A/B in BASELINE.md: 16 waves 167.4 s vs 4 waves 145.6 s,
    # identical output fingerprint), so a fixed size that is right for 16
    # files is 16x too small for 256 and 6000x too small for a 100 TB
    # corpus. Resume granularity does NOT depend on wave size — unit
    # completion markers checkpoint each (file, row_group) unit inside the
    # running wave.
    wave_size: int | str = "auto"
    dedup_strategy: str = "partial"
    split_pdf_pool: bool = False     # dedicated PDF pool (second input pass)
    pdf_pool_size: int = 2
    num_partitions: int = 32         # hash partitions for shuffle dedup paths
    key_exchange: str = "narrow"     # dup-url detection: narrow | shuffle
    size_cluster: bool = False       # explicit within-block (kind,size) sort
    fused_wave: bool = True          # one-operator read+extract+write waves
    fused_compute: str = "tasks"     # fused stage scheduling: tasks (warm
                                     # per-worker cache, no pool ramp) | actors
    bloom_threshold: int = 1_000_000 # dup-set size above which a Bloom
                                     # filter replaces the exact broadcast
    debug_dump: bool = False         # side-dump raw payloads of error rows
                                     # to out_dir/debug/ (bmp.cpp triage
                                     # analogue); fused waves only
    # "raise" (default): a corrupt/unreadable input parquet fails the run
    # fast. "quarantine": probe every file's footer + schema up front
    # (parallel remote tasks) and EXCLUDE unreadable shards — at 100 TB a
    # truncated upload must not kill a multi-hour job. Quarantined paths
    # land in summary["quarantined"] and out_dir/quarantine.jsonl; they
    # never enter lineage, so a later run picks up the fixed file
    # automatically. Payload-level decode errors inside readable files are
    # already per-row status="error:..." records either way.
    on_bad_input: str = "raise"
    # OCR engine for image-only (scanned) PDFs: None (default) keeps them
    # deterministic error:NotImplementedError rows; "stub" uses the byte-
    # deterministic fake; "real" requires pytesseract+pillow (guarded
    # import); "auto" picks real when installed, stub otherwise. The engine
    # is resolved ONCE per worker (warm TessBaseAPI analogue).
    ocr_engine: str | None = None


def list_pages_files(pages_dir: str) -> list[str]:
    return sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )


def _probe_inputs(files: list[str], out_dir: str) -> tuple[list[str], list[dict]]:
    """Parallel footer/schema probe: returns (readable files, quarantined
    [{path, error}]). One metadata read per file, chunked into remote tasks
    (64 files/task) so 100k-shard inputs stay one short scheduling round;
    the probe reads only the parquet footer, never payload bytes."""
    import ray

    @ray.remote
    def _probe_chunk(chunk: list[str]) -> list:
        out = []
        for path in chunk:
            try:
                md = pq.read_metadata(path)
                names = set(md.schema.to_arrow_schema().names)
                missing = [c for c in PAGES_COLUMNS if c not in names]
                if missing:
                    raise ValueError(f"missing columns {missing}")
                out.append((path, None))
            except Exception as exc:  # corrupt footer, truncation, schema
                out.append((path, f"{type(exc).__name__}: {exc}"))
        return out

    chunks = [files[i : i + 64] for i in range(0, len(files), 64)]
    results = [r for rs in ray.get([_probe_chunk.remote(c) for c in chunks]) for r in rs]
    good = [p for p, err in results if err is None]
    bad = [{"path": p, "error": err} for p, err in results if err is not None]
    qpath = os.path.join(out_dir, "quarantine.jsonl")
    if bad:
        os.makedirs(out_dir, exist_ok=True)
        with open(qpath + ".tmp", "w") as fh:
            for rec in bad:
                fh.write(json.dumps(rec) + "\n")
        os.replace(qpath + ".tmp", qpath)
    elif os.path.exists(qpath):
        os.remove(qpath)  # all previously-bad files fixed
    return good, bad


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

    # key by resolved ABSOLUTE path: Ray's include_paths exposes the
    # filesystem-resolved path, so a relative pages_dir would KeyError
    pid_by_path = {os.path.abspath(path): pid for pid, path in wave}

    def _attach_pid(batch: pa.Table) -> pa.Table:
        pids = [pid_by_path[os.path.abspath(p)]
                for p in batch["path"].to_pylist()]
        batch = batch.drop_columns(["path"])
        return batch.append_column("partition_id", pa.array(pids, pa.int64()))

    ds = rd.read_parquet(
        [path for _, path in wave],
        columns=PAGES_COLUMNS,
        include_paths=True,
    )
    return ds.map_batches(_attach_pid, batch_format="pyarrow")


def _input_dup_membership(
    files: list[str], out_dir: str, cfg: ExtractConfig
) -> tuple[list, str]:
    """Broadcast membership of "urls captured more than once across the WHOLE
    pages input", plus the dup-set fingerprint.

    Everything key-shaped stays off the driver (see ``state/dupset.py``): the
    column-pruned url scan is counted distributively, the dup-url table is
    persisted as a parquet artifact by a worker task (cached per input
    fingerprint set, so resumes don't re-scan), and the exact-set/Bloom
    payload is built in a worker task. The driver holds two scalars and an
    ObjectRef, returned BOXED in a one-element list so Ray ships the ref —
    not the payload — to each actor (each actor ray.gets the node-local copy
    once in __init__)."""
    import hashlib

    import ray.data as rd

    inputs_fp = hashlib.sha256(
        "".join(lin.partition_fingerprint(f) for f in files).encode()
    ).hexdigest()[:16]
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "dup_urls_meta.json")
    table_path = os.path.join(out_dir, "dup_urls.parquet")
    if os.path.exists(meta_path) and os.path.exists(table_path):
        with open(meta_path) as fh:
            data = json.load(fh)
        if data.get("inputs_fp") == inputs_fp and set(
            data.get("file_fps", {})
        ) == set(files):
            dup_ref = load_dup_table_ref(table_path)
            box = [membership_ref(dup_ref, max_exact=cfg.bloom_threshold)]
            return box, data["dupset_fp"], data["file_fps"]
    if cfg.key_exchange == "narrow":
        # per-row-group remote read tasks: skips the Dataset ramp (~1-2 s)
        from ocr_suite_ray.state.dupset import dup_key_table_ref_from_files

        dup_ref = dup_key_table_ref_from_files(files)
    else:
        ds = rd.read_parquet(files, columns=["url"])
        dup_ref = dup_key_table_ref(ds, key_exchange=cfg.key_exchange)
    # launch the meta persist, the membership build, and the per-file fp
    # tasks as ONE concurrent graph — serializing their ray.gets costs
    # 3 worker round-trips on the pre-wave critical path (a constant that,
    # like any driver-adjacent serial stage, taxes the 32-cpu leg ~3x
    # harder than the 8-cpu leg)
    import ray as _ray

    meta_ref = dup_meta_ref(dup_ref, persist_path=table_path)
    box = [membership_ref(dup_ref, max_exact=cfg.bloom_threshold)]
    fp_refs = _per_file_dup_fp_refs(files, box)
    (n_dups, dupset_fp), *fp_pairs = _ray.get([meta_ref] + fp_refs)
    file_fps = dict(fp_pairs)
    with open(meta_path + ".tmp", "w") as fh:
        json.dump(
            {
                "inputs_fp": inputs_fp,
                "dupset_fp": dupset_fp,
                "n_dups": n_dups,
                "file_fps": file_fps,
            },
            fh,
        )
    os.replace(meta_path + ".tmp", meta_path)
    return box, dupset_fp, file_fps


def _per_file_dup_fp_refs(files: list[str], member_box: list) -> list:
    """Refs to (path, fingerprint of THIS file's dup-membership decisions) —
    the per-partition share of the global dup state. A partition's extract
    output depends on the dup set only through the is_dup flags of ITS OWN
    urls, so salting each partition with the fingerprint of its flagged-url
    set (computed with the SAME membership payload the tag step uses —
    Bloom false positives included, they change the output layout too) makes
    input growth invalidate exactly the partitions whose flags changed,
    instead of the whole store. Narrow: one url-column read per file, all
    remote, driver sees only hashes. Returned unresolved so the caller can
    overlap them with sibling tasks in one ray.get."""
    import ray

    @ray.remote
    def _fp(path: str, payload):
        import hashlib

        member = DupMembership(payload)
        t = pq.ParquetFile(path).read(columns=["url"])
        flagged = t.filter(member.mask(t["url"]))["url"].to_pylist()
        h = hashlib.sha256("\n".join(sorted(set(flagged))).encode())
        return path, h.hexdigest()[:16]

    return [_fp.remote(p, member_box[0]) for p in files]


def _tag_dup(ds, member_box: list):
    """Append is_dup (0/1) — becomes a hive partition key so the finalize
    step can link unique files instead of rewriting them. ``member_box`` is
    the boxed payload ObjectRef; each task reads the node-local copy."""
    import ray

    def _tag(t: pa.Table) -> pa.Table:
        member = DupMembership(ray.get(member_box[0]))
        return t.append_column("is_dup", member.flags(t["url"]))

    return ds.map_batches(_tag, batch_format="pyarrow")


def _extract_ds(ds, cfg: ExtractConfig):
    ds = ds.map_batches(
        _sniff_and_cluster if cfg.size_cluster else sniff_batch,
        batch_format="pyarrow",
    )
    main_kw: dict = {"batch_format": "pyarrow", "concurrency": cfg.pool_size}
    if cfg.batch_size is not None:
        main_kw["batch_size"] = cfg.batch_size
    ctor = {"fn_constructor_kwargs": {"ocr_engine": cfg.ocr_engine}}
    if cfg.split_pdf_pool:
        html = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["payload_kind"], "pdf")),
            batch_format="pyarrow",
        ).map_batches(PageExtractor, **main_kw, **ctor)
        pdf = ds.map_batches(
            lambda t: t.filter(pc.equal(t["payload_kind"], "pdf")),
            batch_format="pyarrow",
        ).map_batches(
            PdfExtractor,
            batch_format="pyarrow",
            batch_size=max(4, (cfg.batch_size or 128) // 8),
            concurrency=cfg.pdf_pool_size,
            **ctor,
        )
        return html.union(pdf)
    return ds.map_batches(PageExtractor, **main_kw, **ctor)


def _parquet_files_under(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, names in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in names if f.endswith(".parquet"))
    return sorted(out)


def _commit_wave(
    tmp_dir: str,
    extracted_dir: str,
    wave: list[tuple[int, str]],
    wall: float,
    salt: str = "",
    counts: list | None = None,
) -> int:
    """Atomically promote each partition's output dir and write its lineage
    record. Returns rows committed. ``counts`` = [(pid, n)] rows from the
    fused sink; when absent, row counts come from parquet footers."""
    total = 0
    per_pid_rows: dict[int, int] = {pid: 0 for pid, _ in wave}
    if counts is not None:
        for r in counts:
            per_pid_rows[int(r["pid"])] = per_pid_rows.get(int(r["pid"]), 0) + int(r["n"])
    for pid, _ in wave:
        src = os.path.join(tmp_dir, f"partition_id={pid}")
        dst = os.path.join(extracted_dir, f"partition_id={pid}")
        if not os.path.isdir(src):  # partition produced zero rows
            os.makedirs(src, exist_ok=True)
        else:
            # scrub truncated 'part-*.parquet.tmp<sig>' leftovers from a
            # killed prior run whose pid dir survived the marker-based
            # resume: by the time a wave commits, every live unit has
            # os.replace'd its FINAL '.parquet' name, so anything else in
            # the dir is garbage — promoting it would permanently plant a
            # corrupt file that pyarrow dataset discovery (the unfused
            # finalize fallback) trips over
            for root, _dirs, fns in os.walk(src):  # incl. is_dup= level
                for fn in fns:
                    if not fn.endswith(".parquet") and ".tmp" in fn:
                        os.remove(os.path.join(root, fn))
        if counts is None:
            files_under = _parquet_files_under(src)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=16) as ex:
                per_pid_rows[pid] = sum(
                    ex.map(lambda f: pq.read_metadata(f).num_rows, files_under)
                )
        n = per_pid_rows[pid]
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
                input_fingerprint=lin.fingerprint_with_salt(path, salt),
                rows_done=per_pid_rows[pid],
                status=lin.STATUS_DONE,
                stage_metrics={"wave_wall_s": round(wall, 3), "wave_rows_per_s": round(rate, 1)},
            ),
        )
    return total


class PipelineLock:
    """Single-writer guard per output dir (flock) — the reference's
    single-instance lock (``tools/ocs-watcher/src/ocsw/single_instance.py:
    12-24``): two concurrent extract runs over one store would race the
    wave-temp dir and lineage records."""

    def __init__(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, ".lock")
        self._fh = None

    def __enter__(self):
        import fcntl

        self._fh = open(self._path, "w")
        try:
            fcntl.flock(self._fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            self._fh.close()
            self._fh = None
            raise RuntimeError(
                f"another extract run holds {self._path}; refusing concurrent "
                "writes to one output store"
            )
        return self

    def __exit__(self, *exc):
        import fcntl

        if self._fh is not None:
            fcntl.flock(self._fh, fcntl.LOCK_UN)
            self._fh.close()


def run_extract_phase(pages_dir: str, out_dir: str, cfg: ExtractConfig | None = None) -> dict:
    """Phase 1: extract all pending partitions, wave by wave. Idempotent.
    Guarded by a per-store single-writer lock."""
    with PipelineLock(out_dir):
        return _run_extract_phase_locked(pages_dir, out_dir, cfg)


def _resolve_wave_size(wave_size: int | str, n_pending: int) -> int:
    """``"auto"`` sizes waves to bound the wave COUNT at ~4 regardless of
    corpus size (warm 10M-page A/B in BASELINE.md: 16 waves → 4 waves cut
    wall 167.4 → 145.6 s; each barrier pays a fixed pipeline-ramp cost). The commit
    barrier exists for atomic per-wave promotion, not resume granularity —
    unit markers checkpoint (file, row_group) units inside a running wave —
    so fewer, bigger waves lose nothing. Floor 32 keeps bench-sized corpora
    (<= 32 files) single-wave."""
    if wave_size == "auto":
        return max(32, -(-n_pending // 4))
    if not isinstance(wave_size, int) or wave_size < 1:
        raise ValueError(f"wave_size must be a positive int or 'auto': {wave_size!r}")
    return wave_size


def _run_extract_phase_locked(
    pages_dir: str, out_dir: str, cfg: ExtractConfig | None = None
) -> dict:
    cfg = cfg or ExtractConfig()
    files = list_pages_files(pages_dir)
    if not files:
        raise FileNotFoundError(f"no pages parquet under {pages_dir}")
    quarantined: list[dict] = []
    if cfg.on_bad_input == "quarantine":
        files, quarantined = _probe_inputs(files, out_dir)
        if not files:
            raise FileNotFoundError(
                f"all pages parquet under {pages_dir} quarantined: "
                f"{[q['path'] for q in quarantined]}"
            )
    elif cfg.on_bad_input != "raise":
        raise ValueError(f"on_bad_input must be 'raise' or 'quarantine': {cfg.on_bad_input!r}")
    extracted_dir = os.path.join(out_dir, "extracted")
    os.makedirs(extracted_dir, exist_ok=True)
    # global dup-url set first (url-column-only scan of the whole input);
    # its fingerprint — plus the extraction-code fingerprint — salts every
    # partition fingerprint, so an input change that alters cross-partition
    # dup relationships OR a change to the extraction code invalidates
    # dependent partitions (code-version lineage)
    from ocr_suite_ray.version import extract_code_fingerprint

    t_dup0 = time.monotonic()
    member_box, _global_fp, file_fps = _input_dup_membership(files, out_dir, cfg)
    code_fp = extract_code_fingerprint()
    # per-partition salt: this file's dup-decision fingerprint + code
    # version + the configured OCR engine — input growth elsewhere leaves
    # this partition's salt (and its done record) intact unless its own
    # flags changed; switching ocr_engine changes scanned-PDF rows (error
    # rows vs OCR text), so it must invalidate like a code change
    engine_tag = cfg.ocr_engine or "none"
    dupset_fp = {
        p: f"{fp}-{code_fp}-ocr:{engine_tag}" for p, fp in file_fps.items()
    }
    dup_scan_s = time.monotonic() - t_dup0
    # drop partitions no longer present in the (possibly shrunk) input —
    # their outputs would otherwise leak into the linked final store
    for pid, rec in lin.load_records(out_dir).items():
        if pid >= len(files):
            stale_dir = os.path.join(extracted_dir, f"partition_id={pid}")
            if os.path.isdir(stale_dir):
                shutil.rmtree(stale_dir)
            os.remove(lin.record_path(out_dir, pid))
    pending = lin.pending_partitions(files, out_dir, salt=dupset_fp)
    summary = {
        "partitions_total": len(files),
        "partitions_skipped": len(files) - len(pending),
        "partitions_processed": 0,
        "rows_extracted": 0,
        "waves": 0,
        "dup_scan_s": round(dup_scan_s, 3),
        "waves_s": 0.0,
        "commit_s": 0.0,
    }
    if quarantined:
        summary["quarantined"] = quarantined
    first_wave = True
    wave_size = _resolve_wave_size(cfg.wave_size, len(pending))
    for w0 in range(0, len(pending), wave_size):
        wave = pending[w0 : w0 + wave_size]
        tmp_dir = os.path.join(out_dir, "_wave_tmp")
        done_units: dict = {}
        if os.path.isdir(tmp_dir):
            if first_wave and cfg.fused_wave and not cfg.split_pdf_pool:
                # leftovers from a killed run: units that completed (files
                # written + marker committed, verified against the current
                # input fingerprint + code salt) are reused — a killed job
                # loses at most the in-flight row-group units, not the wave
                # (reference row-level skip, src/ffmpeg/decoder.cpp:301-304)
                done_units = _load_unit_markers(tmp_dir, dupset_fp)
            if not done_units:
                shutil.rmtree(tmp_dir)
        first_wave = False
        t0 = time.monotonic()
        if cfg.fused_wave and not cfg.split_pdf_pool:
            # fully fused: read + extract + tag + write in one actor-pool
            # operator over (file, row_group) specs — neither input payloads
            # nor outputs ever cross the object store
            import ray.data as rd

            specs = _wave_specs(wave, salt=dupset_fp)
            reused: list[dict] = []
            if done_units:
                keep = []
                for k in range(specs.num_rows):
                    key = (specs["path"][k].as_py(), specs["row_group"][k].as_py())
                    done = done_units.get(key)
                    # pid must match too: if the input list shifted, a
                    # marker's rows sit under the wrong partition dir
                    if done is not None and done["pid"] == specs["partition_id"][k].as_py():
                        reused.append(done)
                    else:
                        keep.append(k)
                specs = specs.take(pa.array(keep, pa.int64()))
                # prune stale partition dirs the reused markers do NOT
                # account for: when the input list shifts (a new file sorts
                # before existing ones), the killed run's partition_id=<old>
                # dirs hold a DIFFERENT file's rows under a pid this wave
                # will commit — promoting them would duplicate urls in
                # final/. Re-run units rewrite their content-named files
                # deterministically, so deleting any unreused pid dir only
                # costs redundant work, never correctness. (pid→file is
                # injective per run, so a dir with a reused marker cannot
                # also hold another file's stale rows.)
                reused_pids = {r["pid"] for r in reused}
                for d in os.listdir(tmp_dir):
                    if not d.startswith("partition_id="):
                        continue
                    if int(d.split("=", 1)[1]) not in reused_pids:
                        shutil.rmtree(os.path.join(tmp_dir, d))
                # ... and their ORPHANED markers: a pruned pid's marker
                # left behind could be "reused" by a later resume whose
                # input list shifted back, committing a done partition
                # whose output files this rmtree just deleted (silently
                # missing rows). Marker pid not in reused set -> delete.
                udir = os.path.join(tmp_dir, _UNITS_DIR)
                if os.path.isdir(udir):
                    for f in os.listdir(udir):
                        if not f.endswith(".json"):
                            continue
                        fp_path = os.path.join(udir, f)
                        try:
                            with open(fp_path) as fh:
                                mpid = json.load(fh).get("pid")
                        except (OSError, ValueError):
                            mpid = None
                        if mpid not in reused_pids:
                            os.unlink(fp_path)
            if cfg.fused_compute == "tasks":
                # task pool + per-worker warm cache: reuses the session's
                # warm workers (no per-wave actor spawn/import ramp)
                debug_dir = os.path.join(out_dir, "debug") if cfg.debug_dump else None
                map_kw: dict = {
                    "batch_format": "pyarrow",
                    "batch_size": 1,
                    "fn_kwargs": {
                        "tmp_dir": tmp_dir,
                        "member_box": member_box,
                        "debug_dir": debug_dir,
                        "ocr_engine": cfg.ocr_engine,
                    },
                }
                if isinstance(cfg.pool_size, int):
                    map_kw["concurrency"] = cfg.pool_size
                stage = fused_extract_task
            else:
                map_kw = {
                    "batch_format": "pyarrow",
                    "batch_size": 1,
                    "concurrency": cfg.pool_size,
                    "fn_constructor_args": (
                        tmp_dir,
                        member_box,
                        os.path.join(out_dir, "debug") if cfg.debug_dump else None,
                        cfg.ocr_engine,
                    ),
                }
                stage = FusedExtractWriter
            counts = (
                rd.from_arrow(specs)
                .repartition(specs.num_rows)  # one block per spec => full task parallelism
                .map_batches(stage, **map_kw)
                .take_all()
            ) if specs.num_rows else []
            counts = counts + reused
        else:
            ds = _extract_ds(_read_wave(wave, cfg), cfg)
            ds = _tag_dup(ds, member_box)
            # fused sink: each extract task writes its own partition files
            # and emits only (pid, rows) counts — no separate Write operator
            # (the no-shared-writer design, cf. SURVEY §4 shared-writer row)
            counts = ds.map_batches(
                _SinkWriter(tmp_dir), batch_format="pyarrow"
            ).take_all()
        wall = time.monotonic() - t0
        summary["waves_s"] = round(summary["waves_s"] + wall, 3)
        if counts and any("read_s" in r for r in counts):
            # pool busy-time decomposition (reused-marker rows carry no
            # timings; live rows are 1 spec per call)
            for phase in ("read_s", "extract_s", "tag_s", "write_s"):
                summary[f"pool_{phase}"] = round(
                    summary.get(f"pool_{phase}", 0.0)
                    + sum(r.get(phase, 0.0) for r in counts),
                    2,
                )
        t_c0 = time.monotonic()
        summary["rows_extracted"] += _commit_wave(
            tmp_dir, extracted_dir, wave, wall, salt=dupset_fp, counts=counts
        )
        summary["commit_s"] = round(
            summary["commit_s"] + (time.monotonic() - t_c0), 3
        )
        summary["partitions_processed"] += len(wave)
        summary["waves"] += 1
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
    return summary


def _wave_specs(wave: list[tuple[int, str]], salt: str = "") -> pa.Table:
    """(path, row_group, pid, fp) work units for the fused wave — row-group
    granularity gives ~seconds-long tasks and natural size bucketing (row
    groups are written with a fixed row count, so byte-heavy groups carry
    the giant DOMs). ``fp`` is the salted input fingerprint the worker
    stamps into each unit's completion marker (computed here so the worker
    never touches lineage code)."""
    paths, rgs, pids, fps = [], [], [], []
    for pid, path in wave:
        md = pq.read_metadata(path)
        fp = lin.fingerprint_with_salt(path, salt)
        for rg in range(md.num_row_groups):
            paths.append(path)
            rgs.append(rg)
            pids.append(pid)
            fps.append(fp)
    return pa.table(
        {
            "path": pa.array(paths, pa.string()),
            "row_group": pa.array(rgs, pa.int32()),
            "partition_id": pa.array(pids, pa.int64()),
            "fp": pa.array(fps, pa.string()),
        }
    )


_UNITS_DIR = "_units"


def _unit_marker_name(path: str, row_group: int) -> str:
    import hashlib

    h = hashlib.sha1(f"{path}|{row_group}".encode()).hexdigest()[:16]
    return f"u-{h}.json"


def _load_unit_markers(tmp_dir: str, salt: str) -> dict:
    """{(path, row_group): {"pid","n"}} for every completed unit of a killed
    wave whose input file still fingerprints identically under the current
    salt (input content + dup-set + extraction-code version). Any invalid or
    unreadable marker invalidates the whole leftover dir (caller deletes) —
    correctness first, the rerun merely redoes the wave."""
    udir = os.path.join(tmp_dir, _UNITS_DIR)
    if not os.path.isdir(udir):
        return {}
    out: dict = {}
    for f in os.listdir(udir):
        if not f.endswith(".json"):
            continue
        try:
            with open(os.path.join(udir, f)) as fh:
                m = json.load(fh)
            if m["fp"] != lin.fingerprint_with_salt(m["path"], salt):
                return {}
            out[(m["path"], m["row_group"])] = {"pid": m["pid"], "n": m["n"]}
        except (OSError, ValueError, KeyError):
            return {}
    return out


_FUSED_CACHE: dict = {}


def fused_extract_task(
    spec: pa.Table,
    *,
    tmp_dir: str,
    member_box: list,
    debug_dir: str | None = None,
    ocr_engine: str | None = None,
) -> pa.Table:
    """Task-pool form of the fused wave stage: a plain ``map_batches``
    function with the warm state cached per WORKER PROCESS (module global
    keyed by sink dir + membership ref). Tasks reuse the session's
    already-warm workers, so a wave pays ZERO pool ramp — measured ~2-3 s
    of actor-process spawn+import per wave at 28-actor concurrency, the
    dominant fixed cost once the extract kernel got fast. Cache holds one
    entry (waves are sequential); a new wave's key evicts the old."""
    key = (tmp_dir, member_box[0], debug_dir, ocr_engine)
    writer = _FUSED_CACHE.get(key)
    if writer is None:
        _FUSED_CACHE.clear()
        writer = FusedExtractWriter(tmp_dir, member_box, debug_dir, ocr_engine)
        _FUSED_CACHE[key] = writer
    return writer(spec)


class FusedExtractWriter:
    """The whole wave in ONE operator: each call takes one
    (path, row_group, pid) spec, reads that row group directly (no object
    store transfer — Ray cannot fuse task-based reads into pool stages, so
    we fuse by hand), sniffs, extracts with the warm parser, tags is_dup,
    writes the partition files, and returns only (pid, n) counts.

    The reference analogue is exact: one consumer thread = warm Tesseract +
    direct frame access + its own DB writes (``src/recognition/main.cpp:
    174-183``) — no shared writer, no intermediate hand-off."""

    def __init__(
        self,
        tmp_dir: str,
        member_box: list,
        debug_dir: str | None = None,
        ocr_engine: str | None = None,
    ) -> None:
        # NB: no runtime package imports here — this body runs in the worker,
        # which may not have the repo on sys.path (classes ship by value).
        # member_box holds the membership payload's ObjectRef (boxed so Ray
        # ships the ref, not the payload) — one node-local get per actor.
        import ray

        self._sink = _SinkWriter(tmp_dir)
        self._extract = PageExtractor(ocr_engine)
        self._member = DupMembership(ray.get(member_box[0]))
        self._units_dir = os.path.join(tmp_dir, _UNITS_DIR)
        self._debug_dir = debug_dir

    def _dump_errors(self, src: pa.Table, ext: pa.Table) -> None:
        """BMP-debug-sink analogue (``src/recognition/bmp.cpp:52-87`` dumps
        the raw frame a recognizer choked on): side-write the RAW payloads
        of error-status rows for triage. Positional 1:1 between src and ext
        rows; content-derived names keep retries idempotent. Side channel —
        not part of the atomic wave commit (triage aid, not lineage)."""
        bad = pc.starts_with(ext["status"], "error:")
        if not pc.any(bad).as_py():
            return
        dump = pa.table(
            {
                "url": src["url"],
                "warc_ts": src["warc_ts"],
                "payload": src["html"],
                "status": ext["status"],
            }
        ).filter(bad)
        os.makedirs(self._debug_dir, exist_ok=True)
        sig = _SinkWriter._content_sig(dump.combine_chunks())
        path = os.path.join(self._debug_dir, f"errors-{sig}.parquet")
        pq.write_table(dump, path + f".tmp{sig}", use_dictionary=False)
        os.replace(path + f".tmp{sig}", path)

    def _write_marker(self, path: str, rg: int, pid: int, n: int, fp: str) -> None:
        """Unit completion marker, written AFTER the unit's sink files are in
        place: a resume reuses (path, row_group) outputs with a valid marker
        and redoes only unmarked units — row-group-level resume granularity
        (reference row-level skip, ``src/ffmpeg/decoder.cpp:301-304``)."""
        os.makedirs(self._units_dir, exist_ok=True)
        name = _unit_marker_name(path, rg)
        tmp = os.path.join(self._units_dir, name + f".tmp{os.getpid()}")
        with open(tmp, "w") as fh:
            json.dump(
                {"path": path, "row_group": rg, "pid": pid, "n": n, "fp": fp}, fh
            )
        os.replace(tmp, os.path.join(self._units_dir, name))

    def __call__(self, spec: pa.Table) -> pa.Table:
        outs = []
        has_fp = "fp" in spec.column_names
        for k, (path, rg, pid) in enumerate(zip(
            spec["path"].to_pylist(),
            spec["row_group"].to_pylist(),
            spec["partition_id"].to_pylist(),
        )):
            t0 = time.monotonic()
            t = pq.ParquetFile(path).read_row_group(rg, columns=PAGES_COLUMNS)
            t = t.append_column(
                "partition_id", pa.array([pid] * t.num_rows, pa.int64())
            )
            t_read = time.monotonic()
            ext = self._extract(t)
            t_ext = time.monotonic()
            if self._debug_dir is not None:
                self._dump_errors(t, ext)
            ext = ext.append_column("is_dup", self._member.flags(ext["url"]))
            t_tag = time.monotonic()
            counts = self._sink(ext)
            if has_fp:
                self._write_marker(
                    path, rg, pid,
                    int(pc.sum(counts["n"]).as_py() or 0),
                    spec["fp"][k].as_py(),
                )
            t_done = time.monotonic()
            counts = counts.append_column(
                "read_s", pa.array([t_read - t0] * counts.num_rows, pa.float64())
            ).append_column(
                "extract_s", pa.array([t_ext - t_read] * counts.num_rows, pa.float64())
            ).append_column(
                "tag_s", pa.array([t_tag - t_ext] * counts.num_rows, pa.float64())
            ).append_column(
                "write_s", pa.array([t_done - t_tag] * counts.num_rows, pa.float64())
            )
            outs.append(counts)
        return pa.concat_tables(outs) if outs else pa.table(
            {"pid": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )


class _SinkWriter:
    """Fused per-task parquet sink for the wave pipeline: splits each block
    by (partition_id, is_dup), writes one file per group with a
    deterministic content-derived name (idempotent under task retries) and
    returns only the per-pid row counts."""

    def __init__(self, tmp_dir: str) -> None:
        self._tmp = tmp_dir

    @staticmethod
    def _content_sig(out: pa.Table) -> str:
        """Content-derived filename: hashes EVERY column's buffers (not just
        url+text — two blocks identical in url+text but differing in warc_ts
        would otherwise collide and silently overwrite each other), so
        distinct blocks can never share a name while a retried task still
        rewrites its own file (same block content, same name)."""
        import hashlib

        h = hashlib.sha1()
        for name, chunked in zip(out.schema.names, out.itercolumns()):
            h.update(name.encode())
            chunks = chunked.chunks if isinstance(chunked, pa.ChunkedArray) else [chunked]
            for chunk in chunks:
                for buf in chunk.buffers():
                    if buf is not None:
                        h.update(buf)
        h.update(str(out.num_rows).encode())
        return h.hexdigest()[:16]

    def __call__(self, t: pa.Table) -> pa.Table:
        pids: list[int] = []
        ns: list[int] = []
        uniq_pids = pc.unique(t["partition_id"]).to_pylist()
        for pid in uniq_pids:
            # single-pid blocks (always true on the fused path: one spec =
            # one row group = one partition) skip the filter copy — the
            # output column is bandwidth-expensive to rewrite
            sub_p = (
                t if len(uniq_pids) == 1
                else t.filter(pc.equal(t["partition_id"], pid))
            )
            uniq_flags = pc.unique(sub_p["is_dup"]).to_pylist()
            for flag in uniq_flags:
                sub = (
                    sub_p if len(uniq_flags) == 1
                    else sub_p.filter(pc.equal(sub_p["is_dup"], flag))
                )
                out = sub.drop_columns(["partition_id", "is_dup"]).combine_chunks()
                d = os.path.join(self._tmp, f"partition_id={pid}", f"is_dup={flag}")
                os.makedirs(d, exist_ok=True)
                sig = self._content_sig(out)
                path = os.path.join(d, f"part-{sig}.parquet")
                # dictionary encoding is pure overhead for near-unique text/
                # url values, and statistics only pay for themselves on url
                # (fetch_payload's pushdown key) — both measurably inflate
                # write CPU under full-box concurrency
                pq.write_table(
                    out,
                    path + f".tmp{sig}",
                    use_dictionary=False,
                    write_statistics=["url", "warc_ts"],
                )
                os.replace(path + f".tmp{sig}", path)
            pids.append(int(pid))
            ns.append(sub_p.num_rows)
        return pa.table(
            {"pid": pa.array(pids, pa.int64()), "n": pa.array(ns, pa.int64())}
        )


def run_finalize_phase(out_dir: str, cfg: ExtractConfig | None = None) -> dict:
    """Phase 2 (single-writer-locked, same flock as the extract phase — a
    finalize racing another process's extract/finalize on one store would
    corrupt final.tmp / final_manifest.json): newest-capture-wins dedup over
    all done partitions → final/."""
    with PipelineLock(out_dir):
        return _run_finalize_phase_locked(out_dir, cfg)


def _run_finalize_phase_locked(out_dir: str, cfg: ExtractConfig | None = None) -> dict:
    """Newest-capture-wins dedup over all done partitions → final/.

    Single-pass split-write (the ``partial`` dedup specialized for a sink):
    after a url-column-only count finds the (rare) duplicate-capture urls,
    ONE streaming pass writes unique-url rows straight to the final store
    from inside the filter task (deterministic per-block filenames make task
    retries idempotent) and forwards only dup rows; the tiny dup subset then
    gets the exact per-url groupby reduce. Total motion: one full read, one
    full write, zero payload shuffle. Other cfg.dedup_strategy values fall
    back to dedup_latest + write.

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
    tmp_final = final_dir + ".tmp"
    if os.path.isdir(tmp_final):
        shutil.rmtree(tmp_final)
    has_dup_layout = any(
        d.startswith("is_dup=")
        for pdir in os.listdir(extracted_dir)
        if os.path.isdir(os.path.join(extracted_dir, pdir))
        for d in os.listdir(os.path.join(extracted_dir, pdir))
    ) if os.path.isdir(extracted_dir) else False
    if cfg.dedup_strategy == "partial" and has_dup_layout:
        _finalize_linked(extracted_dir, tmp_final)
    else:
        ds = rd.read_parquet(extracted_dir)
        drop = [c for c in ("partition_id", "is_dup") if c in ds.schema().names]
        if drop:
            ds = ds.drop_columns(drop)
        if cfg.dedup_strategy == "partial":
            _finalize_split_write(
                ds, tmp_final, cfg.key_exchange, max_exact=cfg.bloom_threshold
            )
        else:
            deduped = dedup_latest(
                ds, strategy=cfg.dedup_strategy, num_partitions=cfg.num_partitions
            )
            deduped.write_parquet(tmp_final)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_final, final_dir)
    with open(manifest_path + ".tmp", "w") as fh:
        json.dump({"done_fingerprint": fp}, fh)
    os.replace(manifest_path + ".tmp", manifest_path)
    return {"skipped": False, "done_fingerprint": fp}


def _link_partition_task(pfull: str, pid: str, tmp_final: str) -> list[str]:
    """Per-partition finalize unit (runs as a remote task): hardlink this
    partition's unique-url files into the final store and return its dup
    file paths. Pure filesystem metadata work — safe to retry (os.link EEXIST
    after a retry falls into the copy branch which overwrites in place)."""
    uniq_dir = os.path.join(pfull, "is_dup=0")
    if os.path.isdir(uniq_dir):
        for k, f in enumerate(sorted(os.listdir(uniq_dir))):
            if f.endswith(".parquet"):
                src = os.path.join(uniq_dir, f)
                dst = os.path.join(tmp_final, f"uniq-{pid}-{k:04d}.parquet")
                try:
                    os.link(src, dst)
                except OSError:
                    try:
                        shutil.copy2(src, dst)
                    except shutil.SameFileError:
                        # a retried task re-links a file it already
                        # hardlinked: dst IS src's inode — done
                        pass
    ddir = os.path.join(pfull, "is_dup=1")
    if not os.path.isdir(ddir):
        return []
    return [
        os.path.join(ddir, f)
        for f in sorted(os.listdir(ddir))
        if f.endswith(".parquet")
    ]


def _finalize_linked(extracted_dir: str, tmp_final: str) -> None:
    """Finalize for the is_dup-partitioned layout: unique-url files are
    HARDLINKED into the final store (zero data movement — the extract phase
    already wrote them in final schema), and only the tiny dup subset is
    read, exactly-reduced (block combiner + one coalesce task) and written.
    On a distributed filesystem the links become either copies or manifest
    references; the point stands: finalize cost scales with the dup rate,
    not the corpus.

    The link walk is SHARDED: the driver does exactly one listdir (one entry
    per partition) and fans out a remote task per partition that lists and
    links that partition's files — at 10^6+ output files the per-file
    metadata ops run across the pool instead of serializing on the driver.
    The driver only ever holds partition names and dup file paths."""
    import ray

    from ocr_suite_ray.stages.dedup import (
        _local_best,
        decode_spans,
        encode_spans,
    )

    os.makedirs(tmp_final, exist_ok=True)
    link_task = ray.remote(num_cpus=0.25)(_link_partition_task)
    link_refs = []
    for pdir in sorted(os.listdir(extracted_dir)):
        pfull = os.path.join(extracted_dir, pdir)
        if not (os.path.isdir(pfull) and pdir.startswith("partition_id=")):
            continue
        pid = pdir.split("=", 1)[1]
        link_refs.append(link_task.remote(pfull, pid, tmp_final))
    dup_files = [f for part in ray.get(link_refs) for f in part]
    if not dup_files:
        return
    # dup subset is tiny (dup-rate bound): per-file remote read+combine tasks
    # feed the tree directly — no Dataset execution ramp
    from ocr_suite_ray.state.dupset import tree_reduce_refs

    @ray.remote
    def _read_best(path: str):
        return _local_best(encode_spans(pq.read_table(path)))

    winners = tree_reduce_refs(
        [_read_best.remote(f) for f in dup_files],
        _local_best,
        decode_spans,
    )
    if winners is not None:
        pq.write_table(winners, os.path.join(tmp_final, "winners.parquet"))


# shared tree-reduce (moved to state/dupset.py; alias kept for callers/tests)
_coalesce_reduce = coalesce_reduce


def _finalize_split_write(
    ds, tmp_final: str, key_exchange: str = "narrow", max_exact: int = 1_000_000
) -> None:
    """One streaming pass: unique-url rows written in place, dup rows (the
    ~2%) forwarded to an exact per-url reduce. See run_finalize_phase.

    The dup-url membership is built distributively (state/dupset.py): exact
    value set below ``max_exact`` keys, Bloom filter above — a Bloom false
    positive merely routes a single-capture url through the exact reduce,
    which keeps it unchanged. No key list ever lands on the driver."""
    import ray
    import pyarrow.parquet as pq_mod

    from ocr_suite_ray.stages.dedup import (
        _local_best,
        decode_spans,
        encode_spans,
    )

    os.makedirs(tmp_final, exist_ok=True)
    dup_ref = dup_key_table_ref(ds, key_exchange=key_exchange)
    n_dups, _fp = dup_meta(dup_ref)
    member_box = [membership_ref(dup_ref, max_exact=max_exact)]

    def _split(t: pa.Table) -> pa.Table:
        member = DupMembership(ray.get(member_box[0]))
        is_dup = member.mask(t["url"])
        uniq = t.filter(pc.invert(is_dup))
        dups = t.filter(is_dup)
        if uniq.num_rows:
            # deterministic content-derived name => a retried task overwrites
            # its own partial file instead of duplicating rows
            sig = _SinkWriter._content_sig(uniq.combine_chunks())
            path = os.path.join(tmp_final, f"uniq-{sig}.parquet")
            pq_mod.write_table(
                uniq,
                path + ".tmp" + sig,
                use_dictionary=False,
                write_statistics=["url", "warc_ts"],
            )
            os.replace(path + ".tmp" + sig, path)
        return dups

    dups_ds = ds.map_batches(_split, batch_format="pyarrow")

    if n_dups == 0:
        dups_ds.count()  # consume: triggers the side-effect writes
        return
    # winners: per-block combiner pre-reduces each block to <= 1 row per url,
    # then ONE coalesce task does the exact global reduce — the dup subset is
    # tiny (dup-rate bound), so no shuffle machinery is warranted. (For a
    # corpus whose *dup subset* alone exceeds one worker, fall back to
    # dedup_latest(strategy="bucket") on the dup rows.)
    pre = dups_ds.map_batches(
        lambda t: _local_best(encode_spans(t)), batch_format="pyarrow"
    )
    winners = _coalesce_reduce(
        pre,
        _local_best,
        decode_spans,
    )
    if winners is not None:
        pq_mod.write_table(winners, os.path.join(tmp_final, "winners.parquet"))


def run_pipeline(pages_dir: str, out_dir: str, cfg: ExtractConfig | None = None) -> dict:
    """End-to-end: resumable extract waves, then dedup/finalize."""
    s1 = run_extract_phase(pages_dir, out_dir, cfg)
    t0 = time.monotonic()
    s2 = run_finalize_phase(out_dir, cfg)
    s2["finalize_s"] = round(time.monotonic() - t0, 3)
    return {**s1, "finalize": s2, "final_dir": os.path.join(out_dir, "final")}
