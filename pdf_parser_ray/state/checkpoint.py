"""Partition-granularity checkpointed extraction runs.

North-rule requirement: "streaming execution with per-partition checkpoint
manifests records lineage + counters so a killed job resumes at partition
granularity" (BASELINE.json; SURVEY.md §7.4).

Layout under ``out_dir``:
    part-0000/ ... part-NNNN/      parquet output per partition
    _manifest/part-0000.json ...   manifest, written atomically AFTER the
                                   partition's parquet is complete

A partition is a fixed slice of the input file list (the resume unit; size
it so one partition saturates the cluster).  A manifest records lineage
(input files), counters (rows, pages, blocks, tables, errors, output
bytes), wall time, and a config fingerprint — a changed pipeline config
invalidates old checkpoints instead of silently mixing outputs.  On resume,
partitions with a valid manifest are skipped; half-written partition
directories (no manifest) are cleared and redone.

Multi-node story (round 5): pass ``filesystem=`` (any public
``pyarrow.fs.FileSystem`` — S3FileSystem, GcsFileSystem,
SubTreeFileSystem, ...) and every path operation routes through it, so
resume works when workers do not share a local /tmp.  Object stores
have no atomic directory rename, so the fs path uses the MANIFEST
COMMIT protocol instead of staging+rename: partition parquet writes go
straight to the part dir, and the manifest — written LAST as one put,
which IS atomic on object stores — is the commit record.  Correctness
holds because resume (and any manifest-respecting consumer) treats a
part dir without a valid manifest as garbage to delete and redo; only
the local-filesystem default additionally publishes via atomic rename
so even glob-the-part-dirs consumers never see partial output.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def _config_fingerprint(config: dict) -> str:
    blob = json.dumps(config, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def plan_partitions(input_files: list[str], files_per_part: int) -> list[list[str]]:
    ordered = sorted(input_files)
    return [ordered[i:i + files_per_part]
            for i in range(0, len(ordered), files_per_part)]


def _manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, "_manifest", f"part-{part_id:04d}.json")


def _part_dir(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part-{part_id:04d}")


def _load_manifest(path: str) -> dict | None:
    try:
        with open(path) as f:
            m = json.load(f)
        return m if m.get("status") == "complete" else None
    except (OSError, json.JSONDecodeError):
        return None


def _write_manifest_atomic(path: str, manifest: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _partition_counters(part_dir: str) -> dict:
    """Counters from the written partition: row counts from parquet footers
    (metadata-only), error/page counts from a column scan of the small
    counter columns."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(part_dir, format="parquet")
    rows = dataset.count_rows()
    counters = {"rows": rows, "pages": 0, "blocks": 0, "tables": 0, "errors": 0}
    scanned = dataset.to_table(columns=["n_pages", "n_blocks", "n_tables", "error"])
    counters["pages"] = sum(scanned.column("n_pages").to_pylist())
    counters["blocks"] = sum(scanned.column("n_blocks").to_pylist())
    counters["tables"] = sum(scanned.column("n_tables").to_pylist())
    counters["errors"] = sum(1 for e in scanned.column("error").to_pylist() if e)
    counters["bytes_out"] = sum(
        os.path.getsize(os.path.join(root, name))
        for root, _, names in os.walk(part_dir)
        for name in names
    )
    return counters


def _remove_stale_parts(out_dir: str, parts_total: int) -> None:
    """Delete part dirs and manifests whose part_id >= parts_total."""
    import re

    part_rx = re.compile(r"^part-(\d{4,})$")
    for entry in os.listdir(out_dir):
        m = part_rx.match(entry)
        if m and int(m.group(1)) >= parts_total:
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
    mdir = os.path.join(out_dir, "_manifest")
    man_rx = re.compile(r"^part-(\d{4,})\.json$")
    if os.path.isdir(mdir):
        for entry in os.listdir(mdir):
            m = man_rx.match(entry)
            if m and int(m.group(1)) >= parts_total:
                try:
                    os.remove(os.path.join(mdir, entry))
                except OSError:
                    pass


class _FsOps:
    """Path operations over a public ``pyarrow.fs.FileSystem`` for the
    object-store checkpoint protocol (module docstring). Every method
    is total over a missing path."""

    def __init__(self, fs):
        self.fs = fs

    def makedirs(self, p: str) -> None:
        self.fs.create_dir(p, recursive=True)

    def exists(self, p: str) -> bool:
        from pyarrow.fs import FileType

        return self.fs.get_file_info(p).type != FileType.NotFound

    def rmtree(self, p: str) -> None:
        try:
            self.fs.delete_dir(p)
        except (FileNotFoundError, OSError):
            pass

    def delete_file(self, p: str) -> None:
        try:
            self.fs.delete_file(p)
        except (FileNotFoundError, OSError):
            pass

    def listdir(self, p: str) -> list[str]:
        from pyarrow.fs import FileSelector

        try:
            infos = self.fs.get_file_info(FileSelector(p, recursive=False))
        except (FileNotFoundError, OSError):
            return []
        return [os.path.basename(i.path.rstrip("/")) for i in infos]

    def read_json(self, p: str) -> dict | None:
        try:
            with self.fs.open_input_stream(p) as f:
                return json.loads(f.read().decode())
        except Exception:
            return None

    def write_json(self, p: str, obj: dict) -> None:
        # ONE put: atomic on object stores — this IS the commit
        data = json.dumps(obj, indent=1, sort_keys=True).encode()
        with self.fs.open_output_stream(p) as f:
            f.write(data)

    def tree_bytes(self, p: str) -> int:
        from pyarrow.fs import FileSelector, FileType

        infos = self.fs.get_file_info(FileSelector(p, recursive=True))
        return sum(i.size or 0 for i in infos if i.type == FileType.File)


def _partition_counters_fs(part_dir: str, ops: _FsOps) -> dict:
    """The _partition_counters twin over a pyarrow filesystem."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(part_dir, format="parquet", filesystem=ops.fs)
    counters = {"rows": dataset.count_rows()}
    scanned = dataset.to_table(
        columns=["n_pages", "n_blocks", "n_tables", "error"])
    counters["pages"] = sum(scanned.column("n_pages").to_pylist())
    counters["blocks"] = sum(scanned.column("n_blocks").to_pylist())
    counters["tables"] = sum(scanned.column("n_tables").to_pylist())
    counters["errors"] = sum(
        1 for e in scanned.column("error").to_pylist() if e)
    counters["bytes_out"] = ops.tree_bytes(part_dir)
    return counters


def _remove_stale_parts_fs(ops: _FsOps, out_dir: str,
                           parts_total: int) -> None:
    import re

    part_rx = re.compile(r"^part-(\d{4,})$")
    for entry in ops.listdir(out_dir):
        m = part_rx.match(entry)
        if m and int(m.group(1)) >= parts_total:
            ops.rmtree(os.path.join(out_dir, entry))
    man_rx = re.compile(r"^part-(\d{4,})\.json$")
    for entry in ops.listdir(os.path.join(out_dir, "_manifest")):
        m = man_rx.match(entry)
        if m and int(m.group(1)) >= parts_total:
            ops.delete_file(os.path.join(out_dir, "_manifest", entry))


def _run_checkpointed_fs(input_files, out_dir, files_per_part,
                         pipeline_kwargs, fingerprint, filesystem,
                         accepted=None) -> dict:
    """Manifest-commit protocol over a pyarrow filesystem (no staging
    rename — the manifest put is the commit record; see module
    docstring).

    DELIBERATE twin of the local loop in ``run_checkpointed``: the two
    differ in their PUBLISH step (atomic rename vs manifest-commit) and
    the local path's behaviour is pinned by the kill/resume suites, so
    they are kept separate rather than parameterized. A change to
    manifest fields, counters, or the skip rule must be applied in BOTH
    loops — grep for 'input_lineage' to find them."""
    from pdf_parser_ray.pipelines.extraction import extract_paths

    ops = _FsOps(filesystem)
    ops.makedirs(os.path.join(out_dir, "_manifest"))
    parts = plan_partitions(input_files, files_per_part)
    _remove_stale_parts_fs(ops, out_dir, parts_total=len(parts))

    skipped = run = total_rows = 0
    for part_id, files in enumerate(parts):
        mpath = _manifest_path(out_dir, part_id)
        manifest = ops.read_json(mpath)
        if manifest is not None and manifest.get("status") != "complete":
            manifest = None
        if manifest and manifest.get("config") in (accepted
                                                   or {fingerprint}) \
                and manifest.get("input_lineage") == files:
            skipped += 1
            total_rows += manifest["counters"]["rows"]
            continue

        # uncommitted (no valid manifest) part data is garbage: delete
        # the dir AND any stale manifest, then redo
        ops.delete_file(mpath)
        pdir = _part_dir(out_dir, part_id)
        if ops.exists(pdir):
            ops.rmtree(pdir)

        started = time.time()
        ds = extract_paths(files, **dict(pipeline_kwargs))
        ds.write_parquet(pdir, filesystem=filesystem)
        counters = _partition_counters_fs(pdir, ops)
        ops.write_json(mpath, {
            "partition_id": part_id,
            "input_lineage": files,
            "config": fingerprint,
            "counters": counters,
            "started_at": started,
            "finished_at": time.time(),
            "status": "complete",
        })
        run += 1
        total_rows += counters["rows"]

    return {
        "parts_total": len(parts),
        "parts_skipped": skipped,
        "parts_run": run,
        "rows": total_rows,
    }


def run_checkpointed(
    input_files: list[str],
    out_dir: str,
    *,
    files_per_part: int = 1,
    pipeline_kwargs: dict | None = None,
    filesystem=None,
) -> dict:
    """Run (or resume) a checkpointed extraction over ``input_files``.

    ``filesystem``: optional public ``pyarrow.fs.FileSystem``; when set,
    output + manifests live on it under the object-store commit
    protocol (module docstring) so resume works without a shared local
    filesystem. Returns a summary dict {parts_total, parts_skipped,
    parts_run, rows}.
    """
    from pdf_parser_ray.pipelines.extraction import extract_paths

    pipeline_kwargs = dict(pipeline_kwargs or {})
    # default-valued (None/False) kwargs are EXCLUDED from the
    # fingerprint: adding a new opt-in pipeline flag must not change the
    # fingerprint of runs that don't use it, or every pre-existing
    # checkpoint would silently invalidate on resume with a newer binary
    # (round-5 review catch). "v" bumps when semantics change for real.
    fingerprint = _config_fingerprint(
        {k: v for k, v in pipeline_kwargs.items()
         if v is not None and v is not False} | {"v": 1}
    )
    # migration: manifests written BEFORE the exclusion rule hashed the
    # defaults too; accept that legacy spelling on resume (second review
    # catch — the rule change itself must not trigger the re-run it
    # exists to prevent). New manifests always carry the new form.
    legacy_fingerprint = _config_fingerprint(
        {k: v for k, v in pipeline_kwargs.items()
         if k not in ("detect_lang", "quality_signals")
         or v not in (None, False)} | {"v": 1}
    )
    accepted = {fingerprint, legacy_fingerprint}
    if filesystem is not None:
        return _run_checkpointed_fs(input_files, out_dir, files_per_part,
                                    pipeline_kwargs, fingerprint,
                                    filesystem, accepted=accepted)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    parts = plan_partitions(input_files, files_per_part)

    # a resume with a shorter input list (or larger files_per_part) must not
    # leave stale part dirs/manifests beyond the new plan — consumers that
    # glob part-* would silently include rows from the previous run
    _remove_stale_parts(out_dir, parts_total=len(parts))

    skipped = run = total_rows = 0

    for part_id, files in enumerate(parts):
        mpath = _manifest_path(out_dir, part_id)
        manifest = _load_manifest(mpath)
        if manifest and manifest.get("config") in accepted \
                and manifest.get("input_lineage") == files:
            skipped += 1
            total_rows += manifest["counters"]["rows"]
            continue

        pdir = _part_dir(out_dir, part_id)
        if os.path.exists(pdir):  # half-written: clear and redo
            shutil.rmtree(pdir)
        # clear stale staging dirs from crashed runs (a SIGKILLed driver's
        # workers can keep writing briefly — but only ever into their own
        # staging dir, which no one will rename)
        parent = os.path.dirname(pdir) or "."
        base = os.path.basename(pdir)
        for entry in os.listdir(parent):
            if entry.startswith(base + ".staging-"):
                shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)

        started = time.time()
        staging = f"{pdir}.staging-{os.getpid()}-{int(started * 1e6)}"
        ds = extract_paths(files, **pipeline_kwargs)
        ds.write_parquet(staging)
        os.rename(staging, pdir)  # publish atomically
        counters = _partition_counters(pdir)
        _write_manifest_atomic(mpath, {
            "partition_id": part_id,
            "input_lineage": files,
            "config": fingerprint,
            "counters": counters,
            "started_at": started,
            "finished_at": time.time(),
            "status": "complete",
        })
        run += 1
        total_rows += counters["rows"]

    return {
        "parts_total": len(parts),
        "parts_skipped": skipped,
        "parts_run": run,
        "rows": total_rows,
    }
