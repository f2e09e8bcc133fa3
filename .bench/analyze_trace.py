"""Summarize a jax.profiler xplane.pb: per-step device time per HLO op on the
'XLA Ops' line (the real op timeline — 'Async XLA Ops' shows overlapped copy
latencies being hidden, not cost). Usage:
    python .bench/analyze_trace.py <xplane.pb> [top_n] [n_steps_traced=3]
"""
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

xs = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    md = plane.event_metadata
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        per = defaultdict(float)
        cnt = defaultdict(int)
        for ev in line.events:
            nm = md[ev.metadata_id].name if ev.metadata_id in md else str(ev.metadata_id)
            per[nm] += ev.duration_ps / 1e9  # ms
            cnt[nm] += 1
        rows = sorted(per.items(), key=lambda kv: -kv[1])
        print(f"=== {plane.name} / XLA Ops: top {top_n} (summed over {n_steps} steps) ===")
        for nm, ms in rows[:top_n]:
            print(f"  {ms / n_steps:8.2f} ms/step x{cnt[nm] // n_steps:<4d} {nm[:105]}")
        fam = defaultdict(float)
        for nm, ms in per.items():
            key = nm.split(".")[0].rstrip("0123456789_").lstrip("%").split(" ")[0]
            fam[key] += ms
        print("--- grouped by fusion family (ms/step) ---")
        for k, ms in sorted(fam.items(), key=lambda kv: -kv[1])[:22]:
            print(f"  {ms / n_steps:8.2f}  {k}")
        print(f"TOTAL: {sum(per.values()) / n_steps:.1f} ms/step on-device")
