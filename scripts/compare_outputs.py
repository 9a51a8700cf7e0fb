"""Compare two KG job output directories and emit a verdict.

Reference analog: scripts/compare_reports.py (load both reports, count
deltas with /max(x,1) zero-guards, quality improvements/regressions at ±10%
thresholds, improved/degraded/mixed/unchanged verdict, --fail-on-regression
CI gate — compare_reports.py:139-345,512-515).  Here the artifacts are the
triples/entities Parquet dirs + manifest written by scripts/run_kg.py, plus
a P/R computation of NEW vs OLD on normalized (subj, pred, obj) — the same
join the conformance gate uses against the serial oracle.

Driver-side pyarrow/duckdb only (outputs are small relative to inputs); no
Ray session needed.

Usage: python scripts/compare_outputs.py OLD_DIR NEW_DIR
           [--output metrics.json] [--fail-on-regression]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.dataset as pads

from kgx.functions.text import normalize_triple_part

QUALITY_BAND = 0.10  # ±10% threshold, reference compare_reports.py:225-274


def load_outputs(out_dir: str) -> dict:
    d = Path(out_dir)
    triples = pads.dataset(
        str(d / "triples"), format="parquet", partitioning="hive"
    ).to_table()
    entities = pads.dataset(str(d / "entities"), format="parquet").to_table()
    manifest = {}
    mpath = d / "_manifest" / "manifest.json"
    if mpath.exists():
        manifest = json.loads(mpath.read_text())
    return {"triples": triples, "entities": entities, "manifest": manifest}


def triple_keys(tbl) -> set[tuple[str, str, str]]:
    return {
        (normalize_triple_part(s), p, normalize_triple_part(o))
        for s, p, o in zip(
            tbl["subj"].to_pylist(), tbl["pred"].to_pylist(), tbl["obj"].to_pylist()
        )
    }


def precision_recall(old_keys: set, new_keys: set) -> dict:
    inter = len(old_keys & new_keys)
    return {
        "precision": inter / max(len(new_keys), 1),
        "recall": inter / max(len(old_keys), 1),
        "added": len(new_keys - old_keys),
        "removed": len(old_keys - new_keys),
    }


def quality_metrics(tbl) -> dict:
    n = max(tbl.num_rows, 1)
    confs = tbl["conf"].to_pylist()
    cats = tbl["category"].to_pylist()
    return {
        "n_triples": tbl.num_rows,
        "avg_conf": sum(confs) / n,
        "general_ratio": sum(1 for c in cats if c == "general") / n,
    }


def compare(old_dir: str, new_dir: str) -> dict:
    old, new = load_outputs(old_dir), load_outputs(new_dir)
    pr = precision_recall(triple_keys(old["triples"]), triple_keys(new["triples"]))
    qo, qn = quality_metrics(old["triples"]), quality_metrics(new["triples"])

    improvements, regressions = [], []

    def judge(name: str, old_v: float, new_v: float, higher_is_better: bool):
        base = max(abs(old_v), 1e-9)
        delta = (new_v - old_v) / base
        if not higher_is_better:
            delta = -delta
        if delta > QUALITY_BAND:
            improvements.append({"metric": name, "old": old_v, "new": new_v})
        elif delta < -QUALITY_BAND:
            regressions.append({"metric": name, "old": old_v, "new": new_v})

    judge("n_triples", qo["n_triples"], qn["n_triples"], True)
    judge("avg_conf", qo["avg_conf"], qn["avg_conf"], True)
    judge("general_ratio", qo["general_ratio"], qn["general_ratio"], False)
    judge("n_entities", old["entities"].num_rows, new["entities"].num_rows, True)

    if improvements and regressions:
        verdict = "mixed"
    elif improvements:
        verdict = "improved"
    elif regressions:
        verdict = "degraded"
    else:
        verdict = "unchanged"

    return {
        "triples_pr": pr,
        "old_quality": qo,
        "new_quality": qn,
        "improvements": improvements,
        "regressions": regressions,
        "verdict": verdict,
        "has_regressions": bool(regressions),
    }


def to_markdown(metrics: dict, old_dir: str, new_dir: str) -> str:
    """Human-readable comparison report (reference
    compare_reports.py:348-446: summary table + verdict + per-change
    sections).  Deterministic: no wall clock in the body."""
    qo, qn = metrics["old_quality"], metrics["new_quality"]
    pr = metrics["triples_pr"]
    emoji = {"improved": "✅", "degraded": "❌", "mixed": "⚠️",
             "unchanged": "➖"}[metrics["verdict"]]
    md = ["# KG Output Comparison", ""]
    md += [f"**Old:** `{old_dir}`  ", f"**New:** `{new_dir}`  ", ""]
    md += ["## Summary", "", "| Metric | Old | New | Change |",
           "|--------|-----|-----|--------|"]

    def row(name, o, n, fmt="{:.4g}"):
        delta = n - o
        return f"| {name} | {fmt.format(o)} | {fmt.format(n)} | {delta:+.4g} |"

    md += [row("Triples", qo["n_triples"], qn["n_triples"], "{:d}")]
    md += [row("Avg confidence", qo["avg_conf"], qn["avg_conf"])]
    md += [row("General ratio", qo["general_ratio"], qn["general_ratio"])]
    md += ["", "## Triple set vs old", "",
           f"- precision (new kept): {pr['precision']:.4f}",
           f"- recall (old covered): {pr['recall']:.4f}",
           f"- added: {pr['added']}, removed: {pr['removed']}", ""]
    md += [f"## Overall Verdict {emoji}", "", f"**{metrics['verdict']}**", ""]
    if metrics["improvements"]:
        md += ["## Improvements ✅", ""]
        md += [f"- {i['metric']}: {i['old']:.4g} → {i['new']:.4g}"
               for i in metrics["improvements"]] + [""]
    if metrics["regressions"]:
        md += ["## Regressions ❌", ""]
        md += [f"- {r['metric']}: {r['old']:.4g} → {r['new']:.4g}"
               for r in metrics["regressions"]] + [""]
    return "\n".join(md)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old_dir")
    ap.add_argument("new_dir")
    ap.add_argument("--output", help="write metrics JSON here")
    ap.add_argument("--markdown", help="write a human-readable report here")
    ap.add_argument("--fail-on-regression", action="store_true")
    args = ap.parse_args()

    metrics = compare(args.old_dir, args.new_dir)
    text = json.dumps(metrics, indent=2, sort_keys=True)
    print(text)
    if args.output:
        Path(args.output).write_text(text)
    if args.markdown:
        Path(args.markdown).write_text(
            to_markdown(metrics, args.old_dir, args.new_dir)
        )
    if args.fail_on_regression and metrics["has_regressions"]:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
