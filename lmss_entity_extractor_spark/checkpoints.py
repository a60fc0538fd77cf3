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


def _update_file(h, f: Path, rel: str) -> None:
    size = f.stat().st_size
    h.update(rel.encode())
    h.update(str(size).encode())
    # head+tail content samples: a same-size in-place edit must change the
    # fingerprint (names+sizes alone would silently resume from stale
    # outputs), while a byte-identical deterministic regeneration still
    # hits the cache — mtime would break that property
    with open(f, "rb") as fh:
        h.update(fh.read(_SAMPLE_BYTES))
        if size > 2 * _SAMPLE_BYTES:
            fh.seek(size - _SAMPLE_BYTES)
            h.update(fh.read(_SAMPLE_BYTES))


def file_fingerprint(path: str | Path) -> str:
    """Fingerprint of a file or directory tree: relative names + sizes +
    head/tail content samples (64 KiB each end per file).

    Content-based so a byte-identical rewrite — e.g. the deterministic
    datagen regenerating the same input — still hits the cache, mirroring
    the reference's content-hash gate semantics; sampled so the driver
    never reads more than 128 KiB per file at any input scale.
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
        self._manifest_path(stage).write_text(json.dumps(manifest, indent=2))

    def invalidate(self, stage: str) -> None:
        mp = self._manifest_path(stage)
        if mp.exists():
            mp.unlink()
