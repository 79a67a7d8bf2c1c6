"""make_eval_record composes round EVAL records from artifact EVALs —
hand-edited records shipped a "%d fine-tune steps" template in round 4
(VERDICT r4 item 9), so the generator itself is under test."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _eval_json(d: Path, cer: float) -> None:
    d.mkdir(parents=True)
    (d / "EVAL.json").write_text(json.dumps({
        "cer": cer,
        "cer_ci95": [cer * 0.8, cer * 1.2],
        "pages": 6,
        "failed_pages": 0,
        "lines_detected": 30,
        "charset_size": 77,
        "per_distribution": {"clean": {"pages": 3, "cer": cer}},
        "backend": "cpu",
        "eval_seconds": 1.0,
        "provenance": {"recognizer": "generated, no templates"},
    }))


def test_compose_round_record(tmp_path):
    _eval_json(tmp_path / "primary", 0.01)
    _eval_json(tmp_path / "other", 0.05)
    prefix = tmp_path / "prefix.json"
    prefix.write_text(json.dumps(
        {"cer": 0.09, "per_distribution": {"clean": {"pages": 3,
                                                     "cer": 0.09}}}
    ))
    lm = tmp_path / "lm.json"
    lm.write_text(json.dumps({"markov": {"enabled": True}}))
    out = tmp_path / "EVAL_rX.json"

    subprocess.run(
        [sys.executable, str(REPO / "make_eval_record.py"),
         "--primary", str(tmp_path / "primary"),
         "--out", str(out),
         "--compare", f"baseline={tmp_path / 'other'}",
         "--compare-file", f"before_fix={prefix}",
         "--lm", str(lm),
         "--note", "smoke"],
        check=True, cwd=REPO,
    )
    rec = json.loads(out.read_text())
    assert rec["cer"] == 0.01
    assert rec["provenance"] == {"recognizer": "generated, no templates"}
    assert rec["baseline"]["cer"] == 0.05
    assert rec["baseline"]["source"].endswith("other/EVAL.json")
    assert rec["before_fix"]["cer"] == 0.09
    assert rec["before_fix"]["source"] == str(prefix)
    assert rec["lm_fusion"] == {"markov": {"enabled": True}}
    assert rec["note"] == "smoke"
    # no unformatted %-templates anywhere in the record (the r4 failure)
    assert "%d" not in out.read_text()


def test_committed_round_records_have_no_templates():
    for p in REPO.glob("EVAL_r0*.json"):
        if p.name == "EVAL_r04.json":
            # the historical record VERDICT r4 item 9 flagged (hand-edited,
            # ships the "%d fine-tune steps" template) — kept as-is; this
            # test exists so no LATER record regresses to hand-editing
            continue
        body = p.read_text()
        assert "%d" not in body and "%s" not in body, p
