"""Paired A/B: does a 2x-cores task grid (write_partitions = 2*cores)
improve the measured 2->8 scaling efficiency over the default 1x grid?

Uses the same pre-warmed persistent workers as bench.py's scaling
protocol; each round fires the (2, 8) pair back-to-back at grid A then
immediately at grid B, so both grids see the same host phase and the
A/B delta is paired.  Prints per-round times and efficiencies.
"""

from __future__ import annotations

import json
import os
import select
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SENT = "@SCALE@ "

CORPUS = os.path.join(REPO, "_data", "pages_100000_s1337_sorted256")
WARM = os.path.join(REPO, "_data", "pages_20000_s1337_sorted256")
N = 100000
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


def spawn(cores: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "scale_worker.py"),
         str(cores), CORPUS, str(N), f"/tmp/ab_idx_c{cores}", WARM],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=open(f"/tmp/ab_worker_{cores}.log", "w"), text=True, bufsize=1,
    )


def read_scale(p: subprocess.Popen, timeout_s: float) -> dict | None:
    deadline = time.monotonic() + timeout_s
    while True:
        rem = deadline - time.monotonic()
        if rem <= 0:
            return None
        r, _, _ = select.select([p.stdout], [], [], min(rem, 5.0))
        if not r:
            if p.poll() is not None:
                return None
            continue
        line = p.stdout.readline()
        if not line:
            return None
        if line.startswith(SENT):
            return json.loads(line[len(SENT):])


def build(p: subprocess.Popen, wp: int | None, timeout_s: float = 480.0) -> float:
    cmd = "build" if wp is None else f"build {wp}"
    p.stdin.write(cmd + "\n")
    p.stdin.flush()
    res = read_scale(p, timeout_s)
    if res is None:
        raise RuntimeError("worker died")
    return float(res["t"])


def main() -> None:
    w2, w8 = spawn(2), spawn(8)
    for w in (w2, w8):
        if read_scale(w, 600.0) is None:
            raise RuntimeError("worker failed to warm")
    print("workers ready", flush=True)
    grids = [("1x", None, None), ("2x", 4, 16), ("3x", 6, 24)]
    for rnd in range(ROUNDS):
        for name, wp2, wp8 in grids:
            t2 = build(w2, wp2)
            t8 = build(w8, wp8)
            eff = (t2 / t8) / 4
            print(f"round {rnd} grid {name}: t2={t2:.2f} t8={t8:.2f} "
                  f"eff={eff:.3f}", flush=True)
    for w in (w2, w8):
        try:
            w.stdin.write("quit\n"); w.stdin.flush(); w.wait(timeout=30)
        except Exception:
            w.kill()


if __name__ == "__main__":
    main()
