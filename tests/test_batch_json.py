"""The reference's JSON batch-file entry point (ClientMain.java:44-83 ->
Master -> TaskManager -> workers) against the reference ClientTest
topology: the 13-file wordcount corpus, binary ids 0/1/2 for
map/partition/reduce, directory ids "0" -> "1"
(ClientTest.java:111-140)."""

from __future__ import annotations

import collections
import glob
import os
import stat

import pytest

from irio_mapreduce_spark.batch_json import (
    BinaryRegistry,
    batch_from_json,
    submit_json_batch,
)

# The exact corpus ClientTest writes (ClientTest.java:113-125), files 0..12.
CLIENT_TEST_CORPUS = [
    "a b c",
    "d bi ooooooo c",
    "d b beee c",
    "d b beee beee  aaaa c",
    "d affffffffff  ffc",
    "a  j c j c j c j c j cj c",
    "a beee c",
    "a bbeee beee beee beee  c",
    "a bbeee bee  e beee beee  c",
    "a bbzzzz zzzzzzzzz beee  c",
    "a bzzzz zzzzzzzzze beee  c",
    "a bzzzz zzz zzzzzze beee  c",
    "a bzzzzzzzz zzzzze beee  c",
]

# mr-bins/batchJsons/batch1.json verbatim (split_count=10 there; the corpus
# has 13 files so we submit 13 — the reference divides files across splits
# the same way, DistrStorage.java:137-155).
BATCH1_JSON = """{
  "map_bin_ids": [0],
  "partition_bin_id": 1,
  "reduce_bin_ids": [2],
  "input_id": "0",
  "final_dest_dir_id": "1",
  "split_count": 13,
  "r_num": 2
}"""

# src/test/resources/client/batch-resource.json verbatim: split_count and
# r_num OMITTED -> proto3 default 0.
BATCH_RESOURCE_JSON = """{
  "map_bin_ids": [0],
  "partition_bin_id": 1,
  "reduce_bin_ids": [2],
  "input_id": "0",
  "final_dest_dir_id": "1"
}"""

# The reference binaries' contracts (mr-bins/map/map.cpp:16-23 tokenizes to
# "word 1" lines; mr-bins/reduce/reduce.cpp:19-31 sums per key) as real
# fork/exec'd commands through RDD.pipe.
MAP_CMD = "awk '{for (i = 1; i <= NF; i++) print $i, 1}'"
REDUCE_CMD = "awk '{c[$1] += $2} END {for (k in c) print k, c[k]}'"


def _storage_root(tmp_path) -> str:
    root = tmp_path / "storage"
    data = root / "0"
    data.mkdir(parents=True)
    for i, content in enumerate(CLIENT_TEST_CORPUS):
        (data / str(i)).write_text(content)
    return str(root)


def _expected_counts() -> dict[str, int]:
    # Independent recount of the corpus — the golden the reference's
    # ClientTest INTENDS (its committed literal "a 2\nb 2\nc 2" is
    # unreachable: batch-resource.json omits split_count, and splits==0
    # yields an empty split list / zero map tasks, DistrStorage.java:140-142
    # — and no subset of the corpus even counts a=2,b=2,c=2).
    c = collections.Counter()
    for line in CLIENT_TEST_CORPUS:
        c.update(line.split())
    return dict(c)


def test_batch_from_json_parses_reference_fixtures():
    b = batch_from_json(BATCH1_JSON)
    assert b.map_bin_ids == [0] and b.partition_bin_id == 1
    assert b.reduce_bin_ids == [2]
    assert (b.input_id, b.final_dest_dir_id) == ("0", "1")
    assert (b.split_count, b.r_num) == (13, 2)

    b2 = batch_from_json(BATCH_RESOURCE_JSON)
    assert (b2.split_count, b2.r_num) == (0, 0)  # proto3 defaults

    # JsonFormat ignoringUnknownFields parity
    b3 = batch_from_json('{"input_id": "x", "wholly_unknown_field": 7}')
    assert b3.input_id == "x" and b3.map_bin_ids == []


def test_json_batch_wordcount_end_to_end(spark, tmp_path):
    """The whole reference client path: JSON file -> Batch -> binary-id
    chain over the 13-file corpus -> exactly r_num output files with
    co-located keys and full-corpus counts."""
    root = _storage_root(tmp_path)
    batch_path = tmp_path / "batch1.json"
    batch_path.write_text(BATCH1_JSON)

    reg = BinaryRegistry(root).put(0, MAP_CMD).put(2, REDUCE_CMD)
    rdd = submit_json_batch(spark, root, str(batch_path), registry=reg)

    got = dict(line.split() for line in rdd.collect())
    assert {k: int(v) for k, v in got.items()} == _expected_counts()

    out_files = sorted(glob.glob(os.path.join(root, "1", "part-*")))
    assert len(out_files) == 2  # exactly r_num sink files (R9)
    # key co-location: every word's total lives in exactly one file
    seen: dict[str, int] = {}
    for f in out_files:
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    w, n = line.split()
                    assert w not in seen, f"{w} split across reduce files"
                    seen[w] = int(n)
    assert seen == _expected_counts()


def test_json_batch_binary_dir_fallback(spark, tmp_path):
    """Unregistered bin ids resolve to executables in <root>/__BINARY/<id>
    — the reference's Storage.putFile(BINARY_DIR, ...) layout."""
    root = _storage_root(tmp_path)
    bin_dir = os.path.join(root, "__BINARY")
    os.makedirs(bin_dir)
    map_bin = os.path.join(bin_dir, "0")
    with open(map_bin, "w") as fh:
        fh.write("#!/bin/sh\n" + MAP_CMD + "\n")
    os.chmod(map_bin, os.stat(map_bin).st_mode | stat.S_IXUSR)

    reg = BinaryRegistry(root).put(2, REDUCE_CMD)
    rdd = submit_json_batch(spark, root, BATCH1_JSON, registry=reg)
    got = {k: int(v) for k, v in (line.split() for line in rdd.collect())}
    assert got == _expected_counts()


def test_json_batch_refuses_silent_noop_defaults(spark, tmp_path):
    """The reference's committed fixture omits split_count/r_num; at those
    proto3 defaults it runs ZERO map tasks and writes nothing
    (DistrStorage.java:140-142) — we raise instead of silently no-op'ing."""
    root = _storage_root(tmp_path)
    reg = BinaryRegistry(root).put(0, MAP_CMD).put(2, REDUCE_CMD)
    with pytest.raises(ValueError, match="split_count"):
        submit_json_batch(spark, root, BATCH_RESOURCE_JSON, registry=reg)

    with pytest.raises(KeyError, match="binary id 5"):
        BinaryRegistry(root).resolve(5)
