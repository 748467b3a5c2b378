"""The reference's JSON batch-file entry point, Spark-first.

Reference clients submit a literal JSON ``Batch`` file — parsed with
protobuf ``JsonFormat`` (unknown fields ignored, proto3 defaults for
omitted ones) in ``mains/client/src/main/java/pl.edu.mimuw.mapreduce/
ClientMain.java:44-52`` — naming BINARY ids and DIRECTORY ids inside a
shared storage root (fixtures: ``src/test/resources/client/
batch-resource.json:1-7``, ``mr-bins/batchJsons/batch1.json:1-9``)::

    {"map_bin_ids": [0], "partition_bin_id": 1, "reduce_bin_ids": [2],
     "input_id": "0", "final_dest_dir_id": "1",
     "split_count": 10, "r_num": 2}

Binaries live in the reserved ``__BINARY`` directory keyed by numeric id
(``storage/Storage.java:13``, loaded per worker and fork/exec'd —
``worker/util/TaskProcessor.java``); data directories hold consecutively
numbered files (``DistrStorage.java:158-189``). This module maps that
surface 1:1:

* :func:`batch_from_json` — the ``JsonFormat`` parse: accepts exactly the
  reference JSON shape, ignores unknown fields, applies proto3 defaults.
* :class:`BinaryRegistry` — the ``__BINARY`` model: bin id -> executable.
  An id resolves to a registered shell command / Python line-callable, or
  falls back to the executable file at ``<root>/__BINARY/<id>`` (the
  reference's storage layout), fork/exec'd via ``RDD.pipe``.
* :func:`submit_json_batch` — Client -> Master -> TaskManager collapsed to
  one call: resolves directory ids against the storage root and runs the
  map-chain -> hash-partition -> reduce-chain pipeline via
  :func:`irio_mapreduce_spark.pipeline.pipe_batch` (text lines, external
  commands — the reference's execution contract).

Semantics notes (verified against the reference source):

* ``partition_bin_id`` is accepted for JSON-shape parity but the hash
  exchange is Spark's: the reference appends the partition binary to the
  map task's chain (``TaskManagerImpl.java:150-151``) to bucket lines by
  ``hash(key) % r_num`` (``mr-bins/partition/partition.cpp:33-38``); here
  the engine's ``partitionBy`` provides the same KEY CO-LOCATION contract
  with a different hash function — bucket membership may differ, which the
  reference itself does not promise across binaries (SURVEY.md §7).
* ``split_count == 0`` (the proto3 default when the JSON omits it — as the
  reference's OWN test fixture ``batch-resource.json`` does) makes
  ``DistrStorage.getSplitsForDir`` return an EMPTY split list
  (``DistrStorage.java:140-142``): the reference runs ZERO map tasks and
  silently writes nothing — its ``ClientTest`` golden output is therefore
  unreachable from the committed fixture. Likewise ``r_num == 0`` makes
  the concatenation phase produce zero reduce inputs
  (``TaskManagerImpl.java:220-235``). A silent empty result is a footgun,
  not a semantic worth porting: this module raises a clear error for both
  and documents the reference behavior here.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from irio_mapreduce_spark.pipeline import pipe_batch

#: The reference's reserved binary directory (storage/Storage.java:13).
BINARY_DIR = "__BINARY"

_BATCH_FIELDS = {
    "map_bin_ids": list,
    "partition_bin_id": int,
    "reduce_bin_ids": list,
    "input_id": str,
    "final_dest_dir_id": str,
    "split_count": int,
    "r_num": int,
}


@dataclass
class JsonBatch:
    """Field-for-field image of the reference ``Batch`` proto
    (``src/main/proto/common/common.proto:14-23``)."""

    map_bin_ids: list[int] = field(default_factory=list)
    partition_bin_id: int = 0
    reduce_bin_ids: list[int] = field(default_factory=list)
    input_id: str = ""
    final_dest_dir_id: str = ""
    split_count: int = 0
    r_num: int = 0


def batch_from_json(source: str) -> JsonBatch:
    """Parse a reference batch JSON file (or a literal JSON string) into a
    :class:`JsonBatch` — ``JsonFormat.parser().ignoringUnknownFields()``
    semantics (``ClientMain.java:44-52``): unknown fields are ignored,
    omitted fields take proto3 defaults (0 / empty)."""
    if os.path.exists(source):
        with open(source) as fh:
            raw = json.load(fh)
    else:
        raw = json.loads(source)
    if not isinstance(raw, dict):
        raise ValueError(f"batch JSON must be an object, got {type(raw).__name__}")
    kwargs = {}
    for name, typ in _BATCH_FIELDS.items():
        if name not in raw:
            continue
        v = raw[name]
        if typ is list:
            kwargs[name] = [int(x) for x in v]
        elif typ is int:
            kwargs[name] = int(v)
        else:
            kwargs[name] = str(v)
    return JsonBatch(**kwargs)


LineStep = "str | list | Callable[[str], Iterable[str]]"


class BinaryRegistry:
    """The ``__BINARY`` directory model: numeric bin id -> runnable step.

    Steps registered via :meth:`put` may be shell command strings / argv
    lists (fork/exec'd through ``RDD.pipe`` — the reference's
    ProcessBuilder contract) or Python per-line callables (1 -> N lines).
    Unregistered ids fall back to the executable FILE at
    ``<storage_root>/__BINARY/<id>`` when a root is given — exactly where
    ``Storage.putFile(Storage.BINARY_DIR, binId, ...)`` places reference
    binaries (``ClientTest.java:64-69``)."""

    def __init__(self, storage_root: str | None = None):
        self._steps: dict[int, object] = {}
        self._root = storage_root

    def put(self, bin_id: int, step) -> "BinaryRegistry":
        self._steps[int(bin_id)] = step
        return self

    def resolve(self, bin_id: int):
        bin_id = int(bin_id)
        if bin_id in self._steps:
            return self._steps[bin_id]
        if self._root is not None:
            path = os.path.join(self._root, BINARY_DIR, str(bin_id))
            if os.path.isfile(path) and os.access(path, os.X_OK):
                return path
        raise KeyError(
            f"binary id {bin_id} neither registered nor present as an "
            f"executable under {BINARY_DIR}/"
        )


def submit_json_batch(
    spark: SparkSession,
    storage_root: str,
    batch: JsonBatch | str,
    registry: BinaryRegistry | None = None,
    key_of: Callable[[str], str] | None = None,
):
    """Execute a reference JSON batch against a directory-storage root.

    ``batch`` may be a parsed :class:`JsonBatch` or a path/JSON string for
    :func:`batch_from_json`. Directory ids resolve as ``<root>/<id>``
    (``DistrStorage.getDirPath``, a plain path resolve); binary ids
    resolve through ``registry`` (defaulting to the ``__BINARY`` file
    fallback). Returns the result RDD of text lines; the sink writes
    exactly ``r_num`` files under ``<root>/<final_dest_dir_id>`` when a
    dest id is given (reference R9 contract).

    Raises on ``split_count == 0`` / ``r_num == 0`` instead of silently
    computing nothing — see the module docstring for the reference's
    (surprising) behavior at these proto3 defaults.
    """
    if isinstance(batch, str):
        batch = batch_from_json(batch)
    if registry is None:
        registry = BinaryRegistry(storage_root)
    if batch.split_count <= 0:
        raise ValueError(
            "split_count must be >= 1: the reference treats 0 (the proto3 "
            "default for an omitted field) as an empty split list and runs "
            "zero map tasks (DistrStorage.java:140-142) — a silent no-op "
            "this engine refuses to reproduce"
        )
    if batch.r_num <= 0:
        raise ValueError(
            "r_num must be >= 1: the reference's concatenation phase loops "
            "over r_num merged files (TaskManagerImpl.java:220-235), so 0 "
            "reduces nothing — a silent no-op this engine refuses to "
            "reproduce"
        )
    if not batch.input_id:
        raise ValueError("batch names no input_id")
    # partition_bin_id intentionally NOT executed: the engine's hash
    # exchange is the partition phase (see module docstring).
    map_steps = [registry.resolve(b) for b in batch.map_bin_ids]
    reduce_steps = [registry.resolve(b) for b in batch.reduce_bin_ids]
    dest = (
        os.path.join(storage_root, batch.final_dest_dir_id)
        if batch.final_dest_dir_id
        else None
    )
    return pipe_batch(
        spark,
        os.path.join(storage_root, batch.input_id),
        dest,
        map_steps=map_steps,
        reduce_steps=reduce_steps,
        r_num=batch.r_num,
        key_of=key_of,
        split_count=batch.split_count,
    )
