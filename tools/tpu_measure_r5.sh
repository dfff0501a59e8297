#!/bin/bash
# Round-5 unattended TPU measurement sequence, phase 2 (after the
# hbm-tape scoped-VMEM fix). Phase 1 already recorded, in
# /tmp/tpu_measure_r5.log (2026-08-20T02:31Z):
#   tape=recompute bench rc=0 — 120.6M rs/s, human 74.1 ms, bkg 67.8 ms,
#   hybrid 28.7 ms/chunk, 2.98 s/frame; tape=hbm failed to compile
#   (scoped-VMEM 16.79M/16M in raymarch_vjp.py, 16.04M/16M raymarch.py).
# This phase re-measures hbm with the capped tape tile, then attributes
# and gates:
#   1. bench.py full step, NEUMAN_MLP_TAPE=hbm (the fixed path)
#   2. step-parts bench: canonical MLP fwd+bwd recompute vs hbm tape
#   3. profiler attribution of the (current-default) step
#   4. quick Pallas envelope sweep (compile gate)
#   5. bench.py --assert-floor 10 at the winning default (perf ratchet)
# Everything appends to $LOG so a detached run is fully reconstructable.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_measure_r5.log}
echo "=== tpu_measure_r5 phase2 start $(date -u +%FT%TZ) ===" >> "$LOG"

probe() {
    timeout 150 python -c "import jax; print('BACKEND=' + jax.default_backend())" 2>/dev/null | grep -Eq 'BACKEND=(axon|tpu)'
}

tries=0
until probe; do
    tries=$((tries + 1))
    echo "probe $tries failed $(date -u +%T)" >> "$LOG"
    if [ "$tries" -ge "${MAX_TRIES:-40}" ]; then
        echo "backend never came back; giving up" >> "$LOG"
        exit 1
    fi
    sleep 120
done
echo "backend up after $tries retries $(date -u +%T)" >> "$LOG"

{
    echo "--- [1] bench full step: tape=hbm (capped tape tile) ---"
    NEUMAN_MLP_TAPE=hbm timeout 2400 python bench.py
    echo "bench hbm rc=$?"

    echo "--- [2] step-parts mlpvjp A/B ---"
    timeout 1800 python tools/bench_step_parts.py mlpvjp
    echo "parts rc=$?"

    echo "--- [3] profile attribution ---"
    timeout 1800 python tools/profile_step.py --top 30
    echo "profile rc=$?"

    echo "--- [4] envelope sweep (quick + tape corners) ---"
    timeout 2400 python tools/sweep_pallas_envelope.py --quick
    echo "sweep rc=$?"

    echo "--- [5] perf ratchet at defaults ---"
    timeout 2400 python bench.py --assert-floor 10
    echo "ratchet rc=$?"

    echo "=== done $(date -u +%FT%TZ) ==="
} >> "$LOG" 2>&1
