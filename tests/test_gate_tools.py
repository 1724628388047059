"""Unit tests for the local verification tooling itself — the gate
must stay trustworthy (a false-green gate is worse than no gate)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, os.path.join(HERE, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_type_class_collapses_engine_families():
    cc = _load("cc_tool", "tools/check_correctness.py")
    tc = cc.type_class
    assert tc("BIGINT") == tc("bigint") == tc("HUGEINT") == "int"
    assert tc("DOUBLE") == tc("float") == tc("DECIMAL(18,3)") == "float"
    assert tc("VARCHAR") == tc("string") == tc("JSON") == "str"
    assert tc("BOOLEAN") == "bool"
    assert tc("TIMESTAMP WITH TIME ZONE") == tc("timestamp") == "ts"
    assert tc("DATE") == "date"
    assert tc("array<double>") == tc("DOUBLE[]") == "list"
    # int vs float families must NOT collapse together
    assert tc("BIGINT") != tc("DOUBLE")


def test_bench_compare_numeric_round_sort(tmp_path, capsys, monkeypatch):
    bc = _load("bc_tool", "tools/bench_compare.py")
    # exercise main(): fake repo dir with artifacts + bench_last_run;
    # lexicographic sort would pick r9 over r10 — numeric must pick r10
    for n, t in (("BENCH_r9.json", 9.0), ("BENCH_r10.json", 10.0)):
        (tmp_path / n).write_text(json.dumps({"parsed": {"queries": {"q": t}}}))
    (tmp_path / "bench_last_run.json").write_text(
        json.dumps({"queries": {"q": 1.0}})
    )
    (tmp_path / "tools").mkdir()
    monkeypatch.setattr(
        bc.os.path, "abspath", lambda p: str(tmp_path / "tools" / "x.py")
    )
    monkeypatch.setattr(sys, "argv", ["bench_compare.py"])
    assert bc.main() == 0
    out = capsys.readouterr().out
    assert "BENCH_r10.json" in out  # numeric latest, not lexicographic
    assert "BENCH_r9.json" not in out
    assert "10.00 ->   1.00" in out


def test_bench_compare_handles_unparsed_artifact(tmp_path, capsys, monkeypatch):
    bc = _load("bc_tool2", "tools/bench_compare.py")
    (tmp_path / "BENCH_r1.json").write_text(json.dumps({"parsed": None}))
    (tmp_path / "bench_last_run.json").write_text(json.dumps({"queries": {"q": 1.0}}))
    (tmp_path / "tools").mkdir()
    monkeypatch.setattr(
        bc.os.path, "abspath", lambda p: str(tmp_path / "tools" / "x.py")
    )
    monkeypatch.setattr(sys, "argv", ["bench_compare.py"])
    assert bc.main() == 0
    assert "no parsed query map" in capsys.readouterr().out
