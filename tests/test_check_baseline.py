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


def test_soft_band_vs_paper_rows_warn_only(tmp_path):
    _write(tmp_path, "cirr_vitg.json", {
        "recall_at1": 51.5, "recall_at5": 82.0, "recall_at10": 89.9,
        "recall_at50": 97.7, "group_recall_at1": 80.2})
    assert check_baseline.main(str(tmp_path)) == 0
    # paper rows are test-split vs our val run: a band miss WARNS but
    # never drives the exit code (ADVICE r3 low #2)
    _write(tmp_path, "cirr_vitg.json", {
        "recall_at1": 40.0, "recall_at5": 82.0, "recall_at10": 89.9,
        "recall_at50": 97.7, "group_recall_at1": 80.2})
    assert check_baseline.main(str(tmp_path)) == 0


def test_hard_gate_vs_local_reference(tmp_path):
    _write(tmp_path, "fiq_vitl.json", {"average_recall_at10": 50.0})
    _write(tmp_path, "reference_fiq_vitl.json", {"average_recall_at10": 50.05})
    assert check_baseline.main(str(tmp_path)) == 0
    _write(tmp_path, "reference_fiq_vitl.json", {"average_recall_at10": 50.2})
    assert check_baseline.main(str(tmp_path)) == 1


def test_missing_paper_key_warns_not_crashes(tmp_path):
    _write(tmp_path, "cirr_vitg.json", {"recall_at1": 51.9})
    assert check_baseline.main(str(tmp_path)) == 0  # warn-only paper band


def test_missing_reference_key_is_hard_failure(tmp_path):
    # a truncated run JSON must not slip past the 0.1 gate (ADVICE r3 medium)
    _write(tmp_path, "fiq_vitl.json", {"average_recall_at10": 50.0})
    _write(tmp_path, "reference_fiq_vitl.json", {
        "average_recall_at10": 50.0, "average_recall_at50": 70.0})
    assert check_baseline.main(str(tmp_path)) == 1


def test_zero_comparable_reference_keys_fails(tmp_path):
    _write(tmp_path, "fiq_vitl.json", {"average_recall_at10": 50.0})
    _write(tmp_path, "reference_fiq_vitl.json", {"note": "wrong keys"})
    assert check_baseline.main(str(tmp_path)) == 1


def test_unparseable_run_file_fails_not_crashes(tmp_path):
    pathlib.Path(tmp_path, "cirr_vitg.json").write_text("")
    assert check_baseline.main(str(tmp_path)) == 1


def test_unknown_run_recorded_only(tmp_path):
    _write(tmp_path, "cirr_vitl.json", {"recall_at1": 10.0})
    assert check_baseline.main(str(tmp_path)) == 0
