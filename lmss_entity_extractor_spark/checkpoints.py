"""Checkpoint manifests — stage-level cache/resume (SURVEY.md §4 O3).

The reference's resume mechanism is a whole-build content hash: sha256 of
the ontology file + existence of artifacts skips the build
(/root/reference/app/run_parser.py:39-45, app/main.py:95-112,
lmss_parser.py:36-42).  Generalized here to per-stage manifests keyed by

  (input fingerprint, config hash, code version)

stored as ``_checkpoints/<stage>.json`` next to the stage outputs.  A
stage whose key matches and whose output exists is skipped and its
materialized table reused — so a killed run resumes from the last
completed stage boundary, and a changed input/config/code invalidates
exactly the stages downstream of the change.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

from . import __version__


_SAMPLE_BYTES = 65536


def atomic_write_text(path: Path, text: str) -> None:
    """Write-then-rename so a crash mid-write never leaves a truncated
    manifest (readers either see the old complete file or the new one);
    rename is atomic on POSIX within one filesystem."""
    import os

    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(text)
    os.replace(tmp, path)


def _update_file(h, f: Path, rel: str) -> None:
    size = f.stat().st_size
    h.update(rel.encode())
    h.update(str(size).encode())
    # Content samples, not mtime: a byte-identical deterministic
    # regeneration still hits the cache.  Files up to 128 KiB are hashed
    # IN FULL; larger files hash the first and last 64 KiB only, so a
    # same-size mid-file edit in a >128 KiB file is NOT detected (for
    # parquet this is unlikely to matter — row-group offsets and stats
    # live in the sampled footer — but it is a weaker guarantee than the
    # reference's full-file sha256; use sha256_file where that matters).
    with open(f, "rb") as fh:
        if size <= 2 * _SAMPLE_BYTES:
            h.update(fh.read())
        else:
            h.update(fh.read(_SAMPLE_BYTES))
            fh.seek(size - _SAMPLE_BYTES)
            h.update(fh.read(_SAMPLE_BYTES))


def file_fingerprint(path: str | Path) -> str:
    """Fingerprint of a file or directory tree: relative names + sizes +
    content (full for files <= 128 KiB, else 64 KiB head+tail samples —
    see _update_file for the exact guarantee).

    Content-based so a byte-identical rewrite — e.g. the deterministic
    datagen regenerating the same input — still hits the cache, close to
    the reference's content-hash gate semantics (exact for small files,
    sampled above 128 KiB); the driver never reads more than 128 KiB per
    file at any input scale.
    """
    p = Path(path)
    h = hashlib.sha256()
    if p.is_file():
        _update_file(h, p, p.name)
    elif p.is_dir():
        for f in sorted(p.rglob("*")):
            if f.is_file() and not f.name.startswith("."):
                _update_file(h, f, str(f.relative_to(p)))
    else:
        h.update(b"<missing>")
    return h.hexdigest()


def sha256_file(path: str | Path) -> str:
    """Streamed sha256 of file contents — the reference's ontology cache
    key (/root/reference/app/lmss_parser.py:36-42)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(4096), b""):
            h.update(block)
    return h.hexdigest()


def input_snapshot(path: str | Path) -> dict:
    """Snapshot of an input directory in the Iceberg-snapshot shape
    (SURVEY.md §2.9 option (a), sans jars): the exact per-file state plus
    a content-derived ``snapshot_id``.

    ``files`` maps each relative file name to its individual fingerprint;
    two snapshots therefore support an exact delta ("which files were
    ADDED since snapshot N", and whether any existing file changed or
    vanished — which invalidates incremental processing entirely).
    """
    p = Path(path)
    files: dict[str, str] = {}
    if p.is_file():
        candidates = [(p, p.name)]
    else:
        candidates = [
            (f, str(f.relative_to(p)))
            for f in sorted(p.rglob("*"))
            if f.is_file() and not f.name.startswith((".", "_"))
        ]
    for f, rel in candidates:
        h = hashlib.sha256()
        _update_file(h, f, rel)
        files[rel] = h.hexdigest()
    sid = hashlib.sha256(json.dumps(files, sort_keys=True).encode()).hexdigest()[:16]
    return {"snapshot_id": sid, "files": files}


def snapshot_delta(prev: dict | None, cur: dict) -> dict:
    """Compare two input_snapshot dicts.

    Returns ``{"added": [rel...], "changed": [...], "removed": [...]}``.
    ``added`` alone means incremental processing of just those files is
    sound; any ``changed``/``removed`` entry means the append-only
    assumption broke and callers must fall back to a full rebuild."""
    pf = (prev or {}).get("files", {})
    cf = cur["files"]
    return {
        "added": sorted(set(cf) - set(pf)),
        "changed": sorted(k for k in set(cf) & set(pf) if cf[k] != pf[k]),
        "removed": sorted(set(pf) - set(cf)),
    }


def config_hash(config_dict: dict) -> str:
    return hashlib.sha256(
        json.dumps(config_dict, sort_keys=True, default=str).encode()
    ).hexdigest()


class CheckpointManager:
    def __init__(self, warehouse: str | Path):
        self.warehouse = Path(warehouse)
        self.dir = self.warehouse / "_checkpoints"
        self.dir.mkdir(parents=True, exist_ok=True)

    def _manifest_path(self, stage: str) -> Path:
        return self.dir / f"{stage}.json"

    def output_path(self, stage: str) -> Path:
        return self.warehouse / stage

    def is_current(self, stage: str, input_fp: str, cfg_hash: str) -> bool:
        mp = self._manifest_path(stage)
        out = self.output_path(stage)
        if not mp.exists() or not out.exists():
            return False
        # parquet dirs are complete only once Spark wrote _SUCCESS
        if out.is_dir() and not (out / "_SUCCESS").exists():
            return False
        try:
            m = json.loads(mp.read_text())
        except (json.JSONDecodeError, OSError):
            return False
        return (
            m.get("input_fingerprint") == input_fp
            and m.get("config_hash") == cfg_hash
            and m.get("code_version") == __version__
        )

    def record(self, stage: str, input_fp: str, cfg_hash: str, rows: int | None = None, extra: dict | None = None) -> None:
        manifest = {
            "stage": stage,
            "input_fingerprint": input_fp,
            "config_hash": cfg_hash,
            "code_version": __version__,
            "rows": rows,
            "output": str(self.output_path(stage)),
        }
        if extra:
            manifest.update(extra)
        atomic_write_text(self._manifest_path(stage), json.dumps(manifest, indent=2))

    def invalidate(self, stage: str) -> None:
        mp = self._manifest_path(stage)
        if mp.exists():
            mp.unlink()

    # -- input snapshots (poor-man's Iceberg snapshot ids) ------------------

    def _snapshot_path(self, name: str) -> Path:
        return self.dir / f"{name}.snapshot.json"

    def load_snapshot(self, name: str) -> dict | None:
        sp = self._snapshot_path(name)
        if not sp.exists():
            return None
        try:
            return json.loads(sp.read_text())
        except (json.JSONDecodeError, OSError):
            return None

    def invalidate_snapshot(self, name: str) -> None:
        sp = self._snapshot_path(name)
        if sp.exists():
            sp.unlink()

    def record_snapshot(self, name: str, snapshot: dict, extra: dict | None = None) -> None:
        payload = dict(snapshot)
        if extra:
            payload.update(extra)
        atomic_write_text(self._snapshot_path(name), json.dumps(payload, indent=2, sort_keys=True))
