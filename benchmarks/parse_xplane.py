"""Aggregate per-op durations from a jax.profiler xplane capture.

The tensorboard profile plugin's native converter is incompatible with the
installed TF, so this parses the xplane proto directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2; run with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python).

Only the device plane's 'XLA Ops' line is aggregated — the 'Steps'/'XLA
Modules' lines hold umbrella events (whole jit invocations / while-loop
regions) that dwarf and obscure the per-op numbers if mixed in. Output is a
category rollup by HLO opcode (where the time goes by op class) followed by
the top individual ops.

Usage: python benchmarks/parse_xplane.py /tmp/chimera_trace [topk]
"""

import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

# "%fusion.190 = (bf16[...]) fusion(...)" -> "fusion"; "%copy-start.628 ..."
# -> "copy-start". Digits are allowed inside the opcode (atan2, log1p) —
# only a trailing ".<uid>" instance suffix is stripped.
_OPCODE = re.compile(r"^%?([a-zA-Z][a-zA-Z0-9_-]*?)(?:\.\d+)?(?:[\s=.]|$)")


def _opcode(name: str) -> str:
    m = _OPCODE.match(name)
    return m.group(1) if m else name[:24]


def parse(trace_dir: str, topk: int = 40, op_lines=("XLA Ops",)):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    totals = collections.Counter()
    counts = collections.Counter()
    plane_names = [p.name for p in space.planes]
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name not in op_lines:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
    if not totals:  # no matching line (CPU capture etc.): take every line
        for plane in space.planes:
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps / 1e9
                    counts[name] += 1
    print("planes:", plane_names)
    grand = sum(totals.values())

    # rollup by HLO opcode: where the time goes by op class
    cat_ms = collections.Counter()
    cat_n = collections.Counter()
    for name, ms in totals.items():
        c = _opcode(name)
        cat_ms[c] += ms
        cat_n[c] += counts[name]
    print(f"-- by op class (device-busy total {grand:.1f} ms) --")
    print(f"{'total_ms':>10}  {'n':>7}  {'%':>5}  class")
    for c, ms in cat_ms.most_common(15):
        print(f"{ms:10.2f}  {cat_n[c]:7d}  {100*ms/grand:5.1f}  {c}")

    print(f"-- top ops --")
    print(f"{'total_ms':>10}  {'n':>6}  {'%':>5}  op")
    for name, ms in totals.most_common(topk):
        print(f"{ms:10.2f}  {counts[name]:6d}  {100*ms/grand:5.1f}  {name[:110]}")
    return totals


if __name__ == "__main__":
    parse(sys.argv[1] if len(sys.argv) > 1 else "/tmp/chimera_trace",
          int(sys.argv[2]) if len(sys.argv) > 2 else 40)
