"""Capture a bench.py run inside a healthy memory-bandwidth window.

The shared sandbox host's DRAM bandwidth oscillates between ~2 GiB/s
(healthy) and ~0.005-0.06 GiB/s (collapsed) on a minutes timescale
(BASELINE.md "Measurement-window health"). Absolute walls from a
collapsed window are meaningless, so this script:

  1. probes a 64 MiB copy every ``--interval`` seconds (cheap),
  2. when bandwidth >= ``--threshold`` GiB/s, launches ``bench.py``
     in a fresh process,
  3. accepts the run only if the bench's own start AND end probes
     (``membw_gib_s`` / ``membw_end_gib_s``) are both healthy —
     otherwise the window closed mid-run and we go back to waiting.

Accepted output is written to ``--out`` (default
/tmp/bench_healthy_verified.json). Run it when nothing else heavy is
running: a concurrent job both skews the bench and can fake a
collapsed probe.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def probe() -> float:
    import numpy as np
    mb = np.empty(1 << 23)
    mb[:] = 1.0
    t0 = time.time()
    mb2 = mb.copy()
    bw = (mb.nbytes / 2**30) / max(time.time() - t0, 1e-9)
    del mb, mb2
    return round(bw, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--interval", type=float, default=120.0)
    ap.add_argument("--max-wait", type=float, default=14400.0,
                    help="give up after this many seconds")
    ap.add_argument("--out", default="/tmp/bench_healthy_verified.json")
    ap.add_argument("--scaling", action="store_true",
                    help="run bench.py --scaling instead")
    args = ap.parse_args()

    t_start = time.time()
    while time.time() - t_start < args.max_wait:
        bw = probe()
        print(f"[watch] membw={bw} GiB/s", flush=True)
        if bw < args.threshold:
            time.sleep(args.interval)
            continue
        # double-probe 5 s apart: don't trigger on a single blip
        time.sleep(5)
        bw2 = probe()
        if bw2 < args.threshold:
            print(f"[watch] blip (second probe {bw2}); waiting",
                  flush=True)
            time.sleep(args.interval)
            continue
        print("[watch] healthy window — launching bench", flush=True)
        cmd = [sys.executable, "bench.py"]
        if args.scaling:
            cmd.append("--scaling")
        r = subprocess.run(cmd, capture_output=True, text=True,
                           cwd="/root/repo")
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            res = json.loads(line)
        except json.JSONDecodeError:
            print(f"[watch] bench failed rc={r.returncode}: "
                  f"{r.stderr[-500:]}", flush=True)
            time.sleep(args.interval)
            continue
        # scaling runs now carry membw spanning both inner runs
        # (membw_min_gib_s) — hold them to the same health bar as a
        # plain run instead of accepting unconditionally
        s = res.get("membw_min_gib_s", res.get("membw_gib_s"))
        e = res.get("membw_end_gib_s", s)
        lo = args.threshold
        if (s is not None and s >= lo
                and e is not None and e >= lo):
            with open(args.out, "w") as f:
                json.dump(res, f)
            print(f"[watch] ACCEPTED (start={s}, end={e}) -> "
                  f"{args.out}", flush=True)
            return 0
        print(f"[watch] window closed mid-run (start={s}, end={e}); "
              "retrying", flush=True)
        time.sleep(args.interval)
    print("[watch] gave up (max-wait)", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
