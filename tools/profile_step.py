"""Per-op device attribution of the human train step via jax.profiler.

bench_step_parts.py measures components in ISOLATION; the sum has never
matched the measured step (74.5 ms vs ~65 of parts at round 5's start),
and the residual "glue" is exactly what isolated benches cannot see:
XLA fusions, layout changes, copies between the pieces. This tool traces
the REAL step (the same lax.scan bench.bench_human_train_step times,
via its NEUMAN_PROFILE_DIR hook), parses the resulting xplane.pb with
tensorboard_plugin_profile, and prints every TensorCore op-group's self
time, so the gap is attributed instead of estimated.

Usage (repo root, real TPU):
    python tools/profile_step.py [--top 40] [--keep-dir DIR]

Output: one line per XLA op category + the top individual ops, with
per-step ms (device total / scan_iters) and % of the step. Groups whose
name contains "fusion" are the glue the isolated benches miss.

Reference counterpart: the torch reference has no profiling story; this
replaces eyeballing `nvprof` with the TPU-native xplane pipeline.
"""

import argparse
import collections
import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN_ITERS = 10


def run_traced_step(trace_dir, scan_iters):
    os.environ["NEUMAN_PROFILE_DIR"] = trace_dir
    import bench

    ms = bench.bench_human_train_step(scan_iters=scan_iters)
    print(f"measured step (traced run): {ms:.1f} ms", flush=True)
    return ms


def load_plane(trace_dir):
    """Parse the xplane.pb and return (plane_name, [(op, group, dur_ps)])."""
    # xplane_pb2 ships inside tensorflow's tsl tree in this image (the
    # tensorboard_plugin_profile wheel here omits it).
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())
    # prefer the TensorCore device plane; fall back to any /device: plane
    device_planes = [
        p for p in xspace.planes
        if "TPU" in p.name or "/device:" in p.name.lower()
    ]
    if not device_planes:
        # CPU smoke runs only have host planes; attribute those instead so
        # the parse path is testable without a TPU.
        device_planes = [p for p in xspace.planes if p.lines]
    if not device_planes:
        raise SystemExit(
            f"no device plane in trace (planes: {[p.name for p in xspace.planes]})"
            " — the axon relay may not forward device traces"
        )
    plane = max(
        device_planes,
        key=lambda p: sum(len(line.events) for line in p.lines),
    )
    events = []
    stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
    for line in plane.lines:
        for ev in line.events:
            meta = plane.event_metadata[ev.metadata_id]
            group = ""
            for st in ev.stats:
                if stats_meta.get(st.metadata_id) in ("tf_op", "hlo_category"):
                    which = st.WhichOneof("value")
                    if which == "str_value":
                        group = st.str_value
                    elif which == "ref_value":
                        group = stats_meta.get(st.ref_value, "")
                    break
            events.append((meta.name, group, ev.duration_ps))
    return plane.name, events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep-dir", default=None,
                    help="write the trace here and keep it (default: tmp)")
    ap.add_argument("--scan-iters", type=int, default=SCAN_ITERS,
                    help="scan length for the traced run (lower it for "
                         "CPU smoke tests)")
    args = ap.parse_args()
    iters = args.scan_iters

    trace_dir = args.keep_dir or tempfile.mkdtemp(prefix="neuman_trace_")
    try:
        run_traced_step(trace_dir, args.scan_iters)
        plane_name, events = load_plane(trace_dir)
    finally:
        if not args.keep_dir:
            shutil.rmtree(trace_dir, ignore_errors=True)

    total_ps = sum(d for _, _, d in events)
    print(f"\ndevice plane: {plane_name}")
    print(f"device total: {total_ps / 1e9 / iters:.2f} ms/step "
          f"({len(events)} events)\n")

    by_op = collections.Counter()
    for name, _, dur in events:
        # collapse fusion instances: "fusion.123" -> "fusion", keep the
        # leading op kind for everything else
        base = name.split(".")[0]
        by_op[base] += dur
    print(f"{'op kind':<40} {'ms/step':>9} {'%':>6}")
    for name, dur in by_op.most_common(args.top):
        ms = dur / 1e9 / iters
        print(f"{name:<40} {ms:>9.3f} {100.0 * dur / total_ps:>5.1f}%")

    print(f"\ntop individual ops (un-collapsed):")
    by_full = collections.Counter()
    for name, _, dur in events:
        by_full[name] += dur
    for name, dur in by_full.most_common(args.top):
        ms = dur / 1e9 / iters
        print(f"{name[:70]:<70} {ms:>8.3f} {100.0 * dur / total_ps:>5.1f}%")


if __name__ == "__main__":
    main()
