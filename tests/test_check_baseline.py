"""Gate logic of scripts/check_baseline.py (the weights-present repro
checker; see scripts/repro_baseline.sh and README 'Golden Recall@K')."""

import importlib.util
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location(
    "check_baseline", REPO / "scripts" / "check_baseline.py")
check_baseline = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check_baseline)


def _write(d, name, obj):
    pathlib.Path(d, name).write_text(json.dumps(obj))


def test_soft_band_vs_paper_rows(tmp_path):
    _write(tmp_path, "cirr_vitg.json", {
        "recall_at1": 51.5, "recall_at5": 82.0, "recall_at10": 89.9,
        "recall_at50": 97.7, "group_recall_at1": 80.2})
    assert check_baseline.main(str(tmp_path)) == 0
    _write(tmp_path, "cirr_vitg.json", {
        "recall_at1": 40.0, "recall_at5": 82.0, "recall_at10": 89.9,
        "recall_at50": 97.7, "group_recall_at1": 80.2})
    assert check_baseline.main(str(tmp_path)) == 1


def test_hard_gate_vs_local_reference(tmp_path):
    _write(tmp_path, "fiq_vitl.json", {"average_recall_at10": 50.0})
    _write(tmp_path, "reference_fiq_vitl.json", {"average_recall_at10": 50.05})
    assert check_baseline.main(str(tmp_path)) == 0
    _write(tmp_path, "reference_fiq_vitl.json", {"average_recall_at10": 50.2})
    assert check_baseline.main(str(tmp_path)) == 1


def test_missing_metric_key_fails_not_crashes(tmp_path):
    _write(tmp_path, "cirr_vitg.json", {"recall_at1": 51.9})
    assert check_baseline.main(str(tmp_path)) == 1  # other paper keys absent


def test_unknown_run_recorded_only(tmp_path):
    _write(tmp_path, "cirr_vitl.json", {"recall_at1": 10.0})
    assert check_baseline.main(str(tmp_path)) == 0
