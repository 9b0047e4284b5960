"""Aggregate per-op durations from a jax.profiler xplane capture.

The tensorboard profile plugin's native converter is incompatible with the
installed TF, so this parses the xplane proto directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2; run with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python).

Usage: python benchmarks/parse_xplane.py /tmp/chimera_trace [topk]
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse(trace_dir: str, topk: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    # device planes hold per-op events; pick the TPU/device plane(s)
    totals = collections.Counter()
    counts = collections.Counter()
    plane_names = []
    for plane in space.planes:
        plane_names.append(plane.name)
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
    if not totals:  # fall back: aggregate every plane
        for plane in space.planes:
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps / 1e9
                    counts[name] += 1
    print("planes:", plane_names)
    grand = sum(totals.values())
    print(f"{'total_ms':>10}  {'n':>6}  {'%':>5}  op")
    for name, ms in totals.most_common(topk):
        print(f"{ms:10.2f}  {counts[name]:6d}  {100*ms/grand:5.1f}  {name[:110]}")
    return totals


if __name__ == "__main__":
    parse(sys.argv[1] if len(sys.argv) > 1 else "/tmp/chimera_trace",
          int(sys.argv[2]) if len(sys.argv) > 2 else 40)
