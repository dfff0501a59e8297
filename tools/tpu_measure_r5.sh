#!/bin/bash
# Round-5 unattended TPU measurement sequence. Waits (bounded) for the
# axon backend to come back, then runs, in order:
#   1. quick Pallas envelope sweep (compile gate)
#   2. step-parts bench: canonical MLP fwd+bwd recompute vs hbm tape
#   3. bench.py full step, NEUMAN_MLP_TAPE=recompute then =hbm
#   4. profiler attribution of the (current-default) step
# Everything appends to $LOG so a detached run is fully reconstructable.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_measure_r5.log}
echo "=== tpu_measure_r5 start $(date -u +%FT%TZ) ===" >> "$LOG"

probe() {
    timeout 150 python -c "import jax; print('BACKEND=' + jax.default_backend())" 2>/dev/null | grep -q BACKEND=axon
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
    echo "--- [1] envelope sweep (quick + tape corners) ---"
    timeout 2400 python tools/sweep_pallas_envelope.py --quick
    echo "sweep rc=$?"

    echo "--- [2] step-parts mlpvjp A/B ---"
    timeout 2400 python tools/bench_step_parts.py mlpvjp
    echo "parts rc=$?"

    echo "--- [3] bench full step: tape=recompute ---"
    NEUMAN_MLP_TAPE=recompute timeout 3000 python bench.py
    echo "bench recompute rc=$?"

    echo "--- [3b] bench full step: tape=hbm ---"
    NEUMAN_MLP_TAPE=hbm timeout 3000 python bench.py
    echo "bench hbm rc=$?"

    echo "--- [4] profile attribution ---"
    timeout 3000 python tools/profile_step.py --top 30
    echo "profile rc=$?"

    echo "=== done $(date -u +%FT%TZ) ==="
} >> "$LOG" 2>&1
