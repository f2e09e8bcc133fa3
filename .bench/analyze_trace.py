"""Summarize a jax.profiler xplane.pb: total device time per HLO op name,
grouped by fusion kind. Usage: python .bench/analyze_trace.py <xplane.pb> [top_n]"""
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

xs = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    # sum inclusive duration per event metadata name on XLA-op lines
    per_name = defaultdict(float)
    count = defaultdict(int)
    md = plane.event_metadata
    for line in plane.lines:
        lname = line.name.lower()
        if "xla op" in lname or "xla ops" in lname or "step" in lname:
            pass
        for ev in line.events:
            name = md[ev.metadata_id].name if ev.metadata_id in md else str(ev.metadata_id)
            per_name[(line.name, name)] += ev.duration_ps / 1e9  # ms
            count[(line.name, name)] += 1
    if not per_name:
        continue
    print(f"=== plane: {plane.name} ===")
    by_line = defaultdict(float)
    for (ln, nm), ms in per_name.items():
        by_line[ln] += ms
    for ln, tot in sorted(by_line.items(), key=lambda kv: -kv[1]):
        print(f"  line '{ln}': {tot:.1f} ms total")
    # pick the busiest line (the op-level one) and show top ops
    opline = max(by_line, key=by_line.get)
    print(f"--- top {top_n} ops on '{opline}' (3 steps traced) ---")
    rows = [(nm, ms, count[(ln, nm)]) for (ln, nm), ms in per_name.items() if ln == opline]
    for nm, ms, c in sorted(rows, key=lambda r: -r[1])[:top_n]:
        print(f"  {ms:8.2f} ms  x{c:<4d}  {nm[:110]}")
    # grouped by prefix family
    fam = defaultdict(float)
    for nm, ms, c in rows:
        key = nm.split(".")[0].rstrip("0123456789_")
        fam[key] += ms
    print("--- grouped by family ---")
    for k, ms in sorted(fam.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:8.2f} ms  {k}")
