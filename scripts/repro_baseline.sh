#!/usr/bin/env bash
# Reproduce BASELINE.md's golden Recall@K rows with the RELEASED reference
# checkpoints — the one acceptance gate that cannot run in the zero-egress
# build environment (VERDICT r2 missing #1). Run this wherever the weights
# and datasets exist; everything else (import paths, metrics, rerank) is
# already parity-tested against the reference implementation in tests/.
#
# Inputs (env):
#   SPRC_CKPT_DIR  directory holding the released checkpoints
#                  (reference README.md:124-128 links):
#                    sprc_cirr.pt        ViT-g  (OneDrive)
#                    sprc_fiq.pt         ViT-g  (OneDrive)
#                    sprc_cirr_vitl.pt   ViT-L  (Google Drive)
#                    sprc_fiq_vitl.pt    ViT-L  (Google Drive)
#   SPRC_DATA_DIR  directory holding cirr_dataset/ and fashionIQ_dataset/
#                  laid out as the reference expects (data/datasets.py doc)
#   SPRC_OUT_DIR   results directory (default ./baseline_repro)
#
# Emits one JSON per run plus a summary (scripts/check_baseline.py): the
# 0.1-point HARD gate (BASELINE.json) applies only when local torch-reference
# runs are dropped in as <out>/reference_<name>.json; otherwise the external
# paper rows (BASELINE.md:17-18) get a warn-only ±2.0 sanity band.
set -euo pipefail

CKPT=${SPRC_CKPT_DIR:?set SPRC_CKPT_DIR to the released-checkpoint directory}
DATA=${SPRC_DATA_DIR:?set SPRC_DATA_DIR to the dataset root}
OUT=${SPRC_OUT_DIR:-baseline_repro}
mkdir -p "$OUT"

# Rehearsal/customization knobs (tests/test_golden_rehearsal.py drives the
# whole harness with a fabricated tiny checkpoint through these):
#   SPRC_MODEL_OVERRIDES  extra key=value config overrides, ONE PER LINE
#                         (values are inline-YAML and may contain spaces;
#                         passed through as --model-overrides entries)
#   SPRC_VOCAB_PATH       explicit bert vocab.txt
#   SPRC_DRESS_TYPES      FashionIQ categories (default: dress shirt toptee)
#   SPRC_ENCODE_BATCH / SPRC_QUERY_BATCH  batch-size overrides
EXTRA=()
if [ -n "${SPRC_MODEL_OVERRIDES:-}" ]; then
  EXTRA+=(--model-overrides)
  while IFS= read -r line; do
    [ -n "$line" ] && EXTRA+=("$line")
  done <<< "$SPRC_MODEL_OVERRIDES"
fi
if [ -n "${SPRC_VOCAB_PATH:-}" ]; then
  EXTRA+=(--vocab-path "$SPRC_VOCAB_PATH")
fi
EB=${SPRC_ENCODE_BATCH:-64}
QB=${SPRC_QUERY_BATCH:-32}

run() { # name dataset data-sub model-type ckpt [extra args...]
  local name=$1 ds=$2 sub=$3 mt=$4 ck=$5; shift 5
  echo "[repro] $name" >&2
  python -m sprc_tpu.cli.validate \
    --dataset "$ds" --data-path "$DATA/$sub" \
    --model-type "$mt" --model-path "$CKPT/$ck" \
    --transform targetpad --target-ratio 1.25 \
    --encode-batch "$EB" --query-batch "$QB" "$@" "${EXTRA[@]}" \
    > "$OUT/$name.json"
}

DT=(${SPRC_DRESS_TYPES:-dress shirt toptee})

# ViT-g (the paper's headline rows) + ViT-L released variants.
run cirr_vitg     CIRR      cirr_dataset      pretrain      sprc_cirr.pt
run fiq_vitg      fashionIQ fashionIQ_dataset pretrain      sprc_fiq.pt --query-batch 16 --dress-types "${DT[@]}"
run cirr_vitl     CIRR      cirr_dataset      pretrain_vitL sprc_cirr_vitl.pt
run fiq_vitl      fashionIQ fashionIQ_dataset pretrain_vitL sprc_fiq_vitl.pt --query-batch 16 --dress-types "${DT[@]}"

# Two-stage rerank protocol (reference validate_blip_rerank.py; needs the
# Fformer twin checkpoint — skipped unless present).
if [ -f "$CKPT/sprc_cirr_rerank.pt" ]; then
  echo "[repro] cirr_vitg_rerank" >&2
  python -m sprc_tpu.cli.validate_rerank \
    --dataset CIRR --data-path "$DATA/cirr_dataset" \
    --model-type pretrain --model-path "$CKPT/sprc_cirr.pt" \
    --rerank-model-path "$CKPT/sprc_cirr_rerank.pt" \
    --encode-batch "$EB" --query-batch "$QB" "${EXTRA[@]}" \
    ${SPRC_RERANK_ARGS:-} \
    > "$OUT/cirr_vitg_rerank.json"
fi

# CIRR test1 submission files (reference cirr_test_submission.py) — the
# third leg of the protocol; written next to the metric JSONs.
if [ -f "$DATA/cirr_dataset/cirr/captions/cap.rc2.test1.json" ]; then
  echo "[repro] cirr_vitg_submission" >&2
  python -m sprc_tpu.cli.submission \
    --dataset CIRR --data-path "$DATA/cirr_dataset" \
    --model-type pretrain --model-path "$CKPT/sprc_cirr.pt" \
    --submission-name sprc_tpu --output-dir "$OUT/submission" \
    --encode-batch "$EB" --query-batch "$QB" "${EXTRA[@]}" >&2
fi

python "$(dirname "$0")/check_baseline.py" "$OUT"
