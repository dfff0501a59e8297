#!/usr/bin/env bash
# One-command real-data parity runbook (BASELINE.json configs 1-3).
#
# The moment the reference's released assets land (setup_data_and_models.sh
# layout: data/<scene>/ + out/<scene>_human/checkpoint.pth.tar), this
# converts the torch checkpoint, renders the canonical 360 sanity frames
# and the full held-out test-view eval (PSNR/SSIM/LPIPS, reference
# render_test_views.py:27-41), and appends the measured numbers to
# BASELINE.md's "Real-data parity" section.
#
# Usage:
#   tools/run_real_parity.sh [scene]            # default scene: bike
#   tools/run_real_parity.sh --dry-run          # synthetic-scene self-test
#
# Env overrides: DATA_ROOT (default ./data), MODELS_ROOT (default ./out),
# RENDER_H/RENDER_W (test-view resolution; default full res),
# LPIPS_WEIGHTS (calibrated lpips_alex.npz; metrics skip LPIPS if absent).
set -euo pipefail
cd "$(dirname "$0")/.."

SCENE=bike
DRY=0
for arg in "$@"; do
  case "$arg" in
    --dry-run) DRY=1 ;;
    *) SCENE="$arg" ;;
  esac
done

DATA_ROOT=${DATA_ROOT:-./data}
MODELS_ROOT=${MODELS_ROOT:-./out}
RENDER_H=${RENDER_H:-}
RENDER_W=${RENDER_W:-}
LPIPS_WEIGHTS=${LPIPS_WEIGHTS:-}

TINY=""
if [ "$DRY" = 1 ]; then
  # Self-test: build a synthetic scene + train a 3-iter checkpoint so every
  # stage below (convert -> render -> eval -> record) runs end-to-end.
  # CPU-forced so it works on any box (tests/test_cli.py drives this).
  export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
  WORK=$(mktemp -d)
  trap 'rm -rf "$WORK"' EXIT
  python - "$WORK/fixture" <<'EOF'
import sys
from tests.fixtures import build_synthetic_scene
build_synthetic_scene(sys.argv[1])
EOF
  DATA_ROOT="$WORK/fixture"; MODELS_ROOT="$WORK/out"; SCENE=scene
  export NEUMAN_DATA_ROOT="$WORK/fixture/data"
  TINY="--nerf_depth 2 --nerf_width 32 --pos_N_freqs 4 --pos_max_freq 3
        --dir_N_freqs 2 --dir_max_freq 1 --samples_per_ray 8
        --importance_samples_per_ray 8 --rays_per_batch 256"
  python train.py --train_mode=smpl_and_offset --scene_dir "$DATA_ROOT/$SCENE" \
    --name "${SCENE}_human" --out_dir "$MODELS_ROOT" --max_iter 3 \
    --penalize_lpips 0 --geo_threshold 0.25 --valid_iter 1000 $TINY
  RENDER_H=${RENDER_H:-48}; RENDER_W=${RENDER_W:-48}
  CKPT_IN="$MODELS_ROOT/${SCENE}_human/checkpoint.npz"  # native already
else
  CKPT_IN="$MODELS_ROOT/${SCENE}_human/checkpoint.pth.tar"
  [ -f "$CKPT_IN" ] || { echo "missing $CKPT_IN — run the reference's setup_data_and_models.sh first"; exit 2; }
fi

SCENE_DIR="$DATA_ROOT/$SCENE"
[ -d "$SCENE_DIR" ] || { echo "missing scene dir $SCENE_DIR"; exit 2; }

CKPT="$MODELS_ROOT/${SCENE}_human/checkpoint.npz"
if [ "$CKPT_IN" != "$CKPT" ]; then
  echo "== converting $CKPT_IN -> $CKPT"
  python tools/convert_torch_checkpoint.py --input "$CKPT_IN" --output "$CKPT" --kind hybrid
fi

SIZE_FLAG=""
[ -n "$RENDER_H" ] && SIZE_FLAG="--render_h $RENDER_H --render_w ${RENDER_W:-$RENDER_H}"
LPIPS_FLAG=""
[ -n "$LPIPS_WEIGHTS" ] && LPIPS_FLAG="--lpips_weights $LPIPS_WEIGHTS"

echo "== config 2: canonical-360 sanity frames"
python render_360.py --scene_dir "$SCENE_DIR" --weights_path "$CKPT" \
  --mode canonical_360 --render_h "${RENDER_H:-512}" --render_w "${RENDER_W:-512}" \
  --trajectory_resolution "${TRAJ_RES:-4}" $TINY

echo "== configs 1+3: held-out test views + PSNR/SSIM/LPIPS"
METRICS=$(python render_test_views.py --scene_dir "$SCENE_DIR" --weights_path "$CKPT" \
  $SIZE_FLAG $LPIPS_FLAG $TINY | tail -1)
echo "$METRICS"

STAMP=$(date -u +%Y-%m-%dT%H:%MZ)
if [ "$DRY" = 1 ]; then
  echo "DRY-RUN OK: $METRICS"
else
  {
    grep -q '^## Real-data parity' BASELINE.md || printf '\n## Real-data parity (recorded by tools/run_real_parity.sh)\n\n| when | scene | render_size | metrics |\n|---|---|---|---|\n'
    printf '| %s | %s | %s | `%s` |\n' "$STAMP" "$SCENE" "${RENDER_H:-full}x${RENDER_W:-full}" "$METRICS"
  } >> BASELINE.md
  echo "recorded to BASELINE.md"
fi
