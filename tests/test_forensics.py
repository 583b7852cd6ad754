"""Spark-free tests for the forensics scripts (round-4 ADVICE items):
GC pause parsing must handle parenthesis-free G1 records, and the
suite-JSON loader must accept both indent-formatted artifacts and
JSONL logs."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.gc_forensics import parse_pauses  # noqa: E402
from scripts.superstep_forensics import _java_pid  # noqa: E402

import pytest  # noqa: E402

GC_LOG = """\
[2026-08-18T14:45:12.345+0000][12.345s][info][gc] GC(7) Pause Young (Normal) (G1 Evacuation Pause) 512M->128M(24576M) 43.210ms
[2026-08-18T14:45:13.345+0000][13.345s][info][gc] GC(8) Pause Remark 500M->500M(24576M) 12.300ms
[2026-08-18T14:45:14.345+0000][14.345s][info][gc] GC(8) Pause Cleanup 500M->500M(24576M) 1.200ms
[2026-08-18T14:45:15.345+0000][15.345s][info][gc] GC(9) Pause Full (System.gc()) 900M->100M(24576M) 2100.000ms
[2026-08-18T14:45:16.345+0000][16.345s][info][gc,phases] GC(9) not a pause line 1.0ms
"""


def test_parse_pauses_handles_parenthesis_free_kinds(tmp_path):
    p = tmp_path / "gc.log"
    p.write_text(GC_LOG)
    recs = parse_pauses(str(p))
    kinds = [k for _, _, k in recs]
    assert kinds == [
        "Young (Normal) (G1 Evacuation Pause)",
        "Remark",
        "Cleanup",
        "Full (System.gc())",
    ]
    # heap-size text must never leak into the kind
    assert not any("->" in k or "M(" in k for k in kinds)
    assert [ms for _, ms, _ in recs] == [43.21, 12.3, 1.2, 2100.0]
    assert [t for t, _, _ in recs] == [12.345, 13.345, 14.345, 15.345]


def test_suite_json_loader_accepts_indented_and_jsonl(tmp_path):
    # gc_forensics.main loads the suite file with json.load first and
    # falls back to last-line JSONL parsing; replicate both branches
    suite = {"pagerank_step_walls": [2.0, 3.0, 4.0]}
    indented = tmp_path / "full.json"
    indented.write_text(json.dumps(suite, indent=1))
    jsonl = tmp_path / "log.jsonl"
    jsonl.write_text('{"other": 1}\n' + json.dumps(suite) + "\n")
    for path in (indented, jsonl):
        body = path.read_text()
        try:
            loaded = json.loads(body)
        except ValueError:
            loaded = json.loads(body.strip().splitlines()[-1])
        assert loaded["pagerank_step_walls"] == [2.0, 3.0, 4.0]


def test_java_pid_raises_clear_error_without_jvm():
    # no SparkSession given and (in this test env) no matching newest
    # pgrep hit should raise RuntimeError, never a bare int('') crash
    class FakeProc:
        pid = 4321

    class FakeGateway:
        proc = FakeProc()

    class FakeSC:
        _gateway = FakeGateway()

    class FakeSpark:
        sparkContext = FakeSC()

    assert _java_pid(FakeSpark()) == 4321
    import subprocess

    has_jvm = subprocess.run(
        ["pgrep", "-f", "java.*pyspark"], capture_output=True
    ).returncode == 0
    if not has_jvm:
        with pytest.raises(RuntimeError, match="no pyspark JVM"):
            _java_pid()
