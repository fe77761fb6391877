"""Parse a jax.profiler trace.json.gz and print top device ops by total
duration. Usage: python tools/trace_ops.py /tmp/xprof_dir [top_n]

Device events live on TensorCore pid rows; host python/runtime rows are
filtered by pid name. Durations are summed per op name across occurrences.
"""

import collections
import glob
import gzip
import json
import sys


def load(trace_dir):
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    data = load(trace_dir)
    events = data["traceEvents"]
    # map pid -> process name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"]["name"]
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    print("processes:", {p: n for p, n in pid_names.items()}, file=sys.stderr)
    tot = collections.Counter()
    cnt = collections.Counter()
    t_min, t_max = 1e30, 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        dur = e.get("dur", 0)
        tot[name] += dur
        cnt[name] += 1
        t_min = min(t_min, e["ts"])
        t_max = max(t_max, e["ts"] + dur)
    total = sum(tot.values())
    print(f"device span {t_max - t_min:.0f} us, busy {total:.0f} us")
    for name, dur in tot.most_common(top_n):
        print(f"{dur:10.0f} us  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
