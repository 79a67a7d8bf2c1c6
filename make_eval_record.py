"""Assemble EVAL_r{N}.json from selftrain EVAL artifacts — never by hand.

VERDICT r4 item 9: the round-4 eval record carried an unformatted
"%d fine-tune steps" template because it was hand-edited. This script
composes the round record purely from the EVAL.json files the selftrain
CLI emitted (which since r5 carry generated provenance from the weight
sidecars) plus explicitly-labeled comparison rows from sibling artifacts.

Usage:
    python make_eval_record.py --primary artifacts/full77f \
        --out EVAL_r05.json \
        [--compare name=artifacts/dir ...] [--note "..."]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def load(d: str) -> dict:
    p = Path(d) / "EVAL.json"
    with open(p) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--primary", required=True,
                    help="artifact dir of the flagship stack's eval")
    ap.add_argument("--out", required=True)
    ap.add_argument("--compare", action="append", default=[],
                    metavar="NAME=DIR",
                    help="extra labeled rows (per_distribution + cer only)")
    ap.add_argument("--compare-file", action="append", default=[],
                    metavar="NAME=JSON",
                    help="extra labeled rows from an explicit EVAL-format "
                         "json file (e.g. a preserved pre-fix record)")
    ap.add_argument("--lm", default=None, metavar="JSON",
                    help="LM-fusion outcome record to embed verbatim "
                         "(a JSON file with the calibrated win/no-op rows)")
    ap.add_argument("--note", default=None)
    args = ap.parse_args()

    primary = load(args.primary)
    rec = {
        k: primary[k]
        for k in (
            "cer", "cer_ci95", "pages", "failed_pages", "lines_detected",
            "charset_size", "per_distribution", "backend", "eval_seconds",
            "provenance",
        )
        if k in primary
    }
    rec["primary_artifact"] = str(args.primary)

    specs = [(s, True) for s in args.compare] + [
        (s, False) for s in args.compare_file
    ]
    for spec, is_dir in specs:
        name, _, d = spec.partition("=")
        if is_dir:
            c = load(d)
        else:
            with open(d) as f:
                c = json.load(f)
        row = {
            "cer": c.get("cer"),
            "per_distribution": c.get("per_distribution"),
            "source": str(Path(d) / "EVAL.json") if is_dir else str(d),
        }
        if "cer_ci95" in c:
            row["cer_ci95"] = c["cer_ci95"]
        if "provenance" in c:
            row["provenance"] = c["provenance"]
        rec[name] = row

    if args.lm:
        with open(args.lm) as f:
            rec["lm_fusion"] = json.load(f)

    if args.note:
        rec["note"] = args.note

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
