"""Compare repro_baseline.sh outputs against BASELINE.md's external rows.

The only published quality numbers for the reference are the ICLR'24
paper's CIRR-test / FashionIQ-val tables (BASELINE.md:17-18 — approximate,
VAL-vs-TEST caveat below); the repo-level acceptance gate is "Recall@K
within 0.1 of the PyTorch reference" (BASELINE.json), which strictly means
re-running reference ``src/blip_validate.py`` on the same machine. This
checker therefore reports BOTH:

  * a hard gate vs ``<out>/reference_<name>.json`` files if present —
    drop the reference script's printed metrics there (same key names)
    to activate the 0.1-point comparison;
  * a soft sanity band (±2.0 points) vs the paper rows, catching import
    or protocol blunders even without a local reference run. Note the
    paper's CIRR rows are TEST-split numbers while validate runs VAL, so
    only the band, not the gate, applies to them.

Exit code 1 on any hard-gate failure or sanity-band miss.
"""

from __future__ import annotations

import json
import pathlib
import sys

# BASELINE.md:17-18 (external, approximate). CIRR rows are test-split.
PAPER = {
    "cirr_vitg": {
        "recall_at1": 51.96,
        "recall_at5": 82.12,
        "recall_at10": 89.74,
        "recall_at50": 97.69,
        "group_recall_at1": 80.65,
    },
    "fiq_vitg": {"average_recall_at10": 55.0, "average_recall_at50": 75.0},
}
HARD_TOL = 0.1   # BASELINE.json: vs a local reference run
SOFT_TOL = 2.0   # vs the approximate paper rows (and VAL-vs-TEST skew)


def main(out_dir: str) -> int:
    out = pathlib.Path(out_dir)
    failures = 0
    for run in sorted(out.glob("*.json")):
        if run.name.startswith("reference_"):
            continue
        name = run.stem
        got = json.loads(run.read_text())
        ref_file = out / f"reference_{name}.json"
        if ref_file.exists():
            ref = json.loads(ref_file.read_text())
            for k, rv in ref.items():
                if not isinstance(rv, (int, float)) or k not in got:
                    continue
                ok = abs(got[k] - rv) <= HARD_TOL
                failures += not ok
                print(f"[{'PASS' if ok else 'FAIL'}] {name}.{k}: "
                      f"{got[k]:.2f} vs reference {rv:.2f} (tol {HARD_TOL})")
        elif name in PAPER:
            for k, pv in PAPER[name].items():
                ok = abs(got.get(k, float('nan')) - pv) <= SOFT_TOL
                failures += not ok
                print(f"[{'pass' if ok else 'MISS'}] {name}.{k}: "
                      f"{got.get(k)} vs paper ~{pv} (band {SOFT_TOL}; "
                      "approximate — run the torch reference for the hard gate)")
        else:
            print(f"[info] {name}: no baseline row; recorded only")
    print("\nSummary:", "FAIL" if failures else "OK", f"({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "baseline_repro"))
