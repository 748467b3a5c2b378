"""Commit protocol for persisted multi-table index artifacts (the corpus
dedup index, the IVF ANN index): parquet sub-tables plus a top-level
``_COMMITTED`` manifest.

The manifest is deleted BEFORE any sub-table write and created after ALL
of them, so a crash mid-build — or mid-REBUILD of an existing index,
where every per-table ``_SUCCESS`` marker can be present while the tables
span two generations — is always detected as torn and rebuilt, never
probed. The manifest also carries the build parameters (shingle n, LSH
bands, k-means cells, seeds): the probe side loads them back instead of
trusting its caller to repeat them, because a parameter mismatch between
build and probe does not fail — it silently degrades (wrong band hashes
match nothing; wrong cell count mis-probes).
"""

from __future__ import annotations

import contextlib
import json
import os

_MARKER = "_COMMITTED"


def begin_build(out_dir: str) -> None:
    """Invalidate any previous committed state before the first write."""
    os.makedirs(out_dir, exist_ok=True)
    with contextlib.suppress(FileNotFoundError):
        os.remove(os.path.join(out_dir, _MARKER))


def commit(out_dir: str, params: dict) -> None:
    """Publish the build: write the manifest LAST — to a temp name, then
    an atomic rename, so a crash mid-write can never leave a truncated
    manifest that parses as committed (or crashes the probe)."""
    tmp = os.path.join(out_dir, f".{_MARKER}.tmp")
    with open(tmp, "w") as fh:
        json.dump(params, fh)
    os.replace(tmp, os.path.join(out_dir, _MARKER))


def committed_params(out_dir: str, subtables: tuple[str, ...]) -> dict | None:
    """The manifest of a complete single-generation build, else ``None``
    (missing marker, or any sub-table without Spark's ``_SUCCESS``)."""
    marker = os.path.join(out_dir, _MARKER)
    if not os.path.exists(marker):
        return None
    if not all(
        os.path.exists(os.path.join(out_dir, sub, "_SUCCESS"))
        for sub in subtables
    ):
        return None
    try:
        with open(marker) as fh:
            return json.load(fh)
    except (json.JSONDecodeError, OSError):
        # A manifest that cannot be read IS torn state (belt to the
        # atomic-rename suspenders in commit()) — report torn, rebuild.
        return None


def input_stamp(*paths: str) -> str:
    """Cheap driver-side fingerprint of input files (path, size, mtime) —
    bake into an index directory key so regenerated inputs never silently
    reuse a stale artifact. Directories are walked; order is normalized."""
    import hashlib

    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(r, f) for r, _, fs in os.walk(p) for f in fs
            )
        else:
            files.append(p)
    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]
