"""uniformity_report: later files override earlier per (formula, sampler)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import uniformity_report


def _rec(counts):
    return {"formula": 0, "n_vars": 5, "n_clauses": 10, "n_solutions": 4,
            "diffusion": {"counts": counts, "chi2_p": 0.1,
                          "success_rate": 1.0}}


def test_later_file_overrides(tmp_path, capsys):
    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text(json.dumps(_rec({"1": 5, "2": 5})) + "\n")
    b.write_text(json.dumps(_rec({"1": 2, "2": 3, "3": 5})) + "\n")
    out = tmp_path / "s.json"
    uniformity_report.main([str(a), str(b), "--json", str(out)])
    summary = json.loads(out.read_text())
    d = summary["diffusion"]
    # one merged row (not two appended), with file b's diversity 3/4
    assert d["n_formulas"] == 1
    assert abs(d["mean_diversity"] - 0.75) < 1e-9
