"""Tests for the convergence-run glue (tools/learning_demo.py helpers +
tools/record_convergence.py).

The 400-iteration convergence demo spans sessions via checkpoint
resume; these pin the session-independent pieces: checkpoint pruning
keeps only the newest iterations, and the curve parser/summarizer turn
raw demo output into the CONVERGENCE.json contract bench.py reads.
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    # importlib, not sys.path.insert: a session-wide path mutation would
    # let tools/*.py shadow same-named modules in later-collected tests
    # (advisor r4)
    spec = importlib.util.spec_from_file_location(
        f"_tools_{name}", os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


prune_checkpoints = _load_tool("learning_demo").prune_checkpoints
_rc = _load_tool("record_convergence")
parse_curve, summarize = _rc.parse_curve, _rc.summarize


def test_prune_checkpoints_keeps_newest(tmp_path):
    for it in (50, 100, 150):
        (tmp_path / f"ckpt_iter{it}").mkdir()
    # orbax in-progress dirs must never be pruned or counted
    (tmp_path / "ckpt_iter200.orbax-checkpoint-tmp-x").mkdir()
    (tmp_path / "unrelated").mkdir()
    prune_checkpoints(str(tmp_path), keep=1)
    left = sorted(os.listdir(tmp_path))
    assert "ckpt_iter150" in left
    assert "ckpt_iter50" not in left and "ckpt_iter100" not in left
    assert "ckpt_iter200.orbax-checkpoint-tmp-x" in left
    assert "unrelated" in left


def test_prune_checkpoints_keep2(tmp_path):
    for it in (10, 20, 30):
        (tmp_path / f"ckpt_iter{it}").mkdir()
    prune_checkpoints(str(tmp_path), keep=2)
    assert sorted(os.listdir(tmp_path)) == ["ckpt_iter20", "ckpt_iter30"]


def _demo_log_lines():
    return [
        "WARNING: platform 'axon' is experimental",
        json.dumps({"iter": 0, "success": 0.0, "spl": 0.0}),
        json.dumps({"resumed_at": 50}),
        "not json {",
        json.dumps({"iter": 50, "IL_loss": 2.1, "sec_per_iter": 28.0,
                    "success": 0.05, "spl": 0.02}),
        json.dumps({"iter": 100, "IL_loss": 1.4, "sec_per_iter": 27.0,
                    "success": 0.30, "spl": 0.21}),
        json.dumps({"iter": 150, "IL_loss": 1.2, "sec_per_iter": 27.5,
                    "success": 0.25, "spl": 0.18}),
        json.dumps({"interrupted_at": 170}),
    ]


def test_parse_curve_filters_non_eval_lines(tmp_path):
    p = tmp_path / "run.log"
    p.write_text("\n".join(_demo_log_lines()) + "\n")
    curve = parse_curve(str(p))
    assert [d["iter"] for d in curve] == [0, 50, 100, 150]


def test_summarize_best_and_final(tmp_path):
    p = tmp_path / "run.log"
    p.write_text("\n".join(_demo_log_lines()) + "\n")
    s = summarize(parse_curve(str(p)), note="unit")
    assert s["iters"] == 150
    assert s["sr_final"] == 0.25 and s["spl_final"] == 0.18
    assert s["sr_best"] == 0.30 and s["best_iter"] == 100
    assert s["il_loss_final"] == 1.2
    assert s["sr_curve"] == {"0": 0.0, "50": 0.05, "100": 0.30,
                             "150": 0.25}
    assert s["note"] == "unit"


def test_record_convergence_cli(tmp_path):
    log = tmp_path / "run.log"
    log.write_text("\n".join(_demo_log_lines()) + "\n")
    out = tmp_path / "CONV.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "record_convergence.py"),
         str(log), "--note", "cli-test", "--out", str(out)],
        capture_output=True, text=True, check=True)
    doc = json.loads(out.read_text())
    assert len(doc["curve"]) == 4
    assert doc["summary"]["sr_best"] == 0.30
    assert doc["summary"]["note"] == "cli-test"
    # last stdout line is the summary JSON
    assert json.loads(r.stdout.strip().splitlines()[-1])["iters"] == 150
