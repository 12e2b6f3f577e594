"""Anti-inverse-crime accuracy matrix.

Every historical accuracy number in this repo came from GT trajectories in
the SAME order-4/0.05 s B-spline family the estimator fits — a textbook
inverse crime (the reference never has this problem: it evaluates on real
TUM-RSVI bags, `README.md:37-54`, unavailable here). This tool runs the
full bench (noise ON, full visual self-bootstrap, streaming TPU path) over
a matrix of GT families x seeds x motion speeds:

  spline    — in-model-class control (what every earlier round measured)
  fine      — 0.01 s-knot spline GT: spectral content the estimator's
              0.05 s basis cannot represent (sim/synthetic.py gt_knot_dt)
  lissajous — analytic C-infinity curve; not a B-spline of any knot spacing

and writes ACCURACY.json (machine-checkable, the shape of the paper's
seq1-10 per-sequence table) plus a markdown table on stdout.

Run:  python tools/accuracy_matrix.py [--preset tpu|cpu-smoke] [--out path]

Each row is one bench.py child (sequential — never two TPU processes at
once); the supervisor inside bench.py handles tunnel wedges.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# families x seeds x speeds: 10 rows, the shape of the paper's seq1-10
# table. Speeds scale the GT dynamics (1.4x ~ brisk handheld).
MATRIX = [
    ("spline", 3, 1.0),
    ("spline", 5, 1.0),
    ("spline", 3, 1.4),
    ("fine", 3, 1.0),
    ("fine", 5, 1.0),
    ("fine", 3, 1.4),
    ("lissajous", 3, 1.0),
    ("lissajous", 5, 1.0),
    ("lissajous", 3, 1.4),
    ("lissajous", 5, 1.4),
]


def run_row(gt, seed, speed, preset, duration=None, timeout=3600):
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
           "--preset", preset, "--gt", gt, "--seed", str(seed),
           "--speed", str(speed)]
    if duration:
        cmd += ["--duration", str(duration)]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=ROOT, timeout=timeout,
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                       text=True)
    line = next((ln for ln in reversed(r.stdout.splitlines())
                 if ln.startswith("{")), None)
    row = dict(gt=gt, seed=seed, speed=speed, rc=r.returncode,
               wall_s=round(time.time() - t0, 1))
    if line:
        row.update(json.loads(line))
    if r.returncode != 0:
        tail = [ln for ln in r.stderr.splitlines() if ln.strip()][-3:]
        row["error"] = " | ".join(tail)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=["tpu", "cpu-smoke"], default="tpu")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--out", default=os.path.join(ROOT, "ACCURACY.json"))
    args = ap.parse_args()

    rows = []
    for gt, seed, speed in MATRIX:
        print(f"[matrix] {gt} seed={seed} speed={speed} ...", flush=True)
        row = run_row(gt, seed, speed, args.preset, args.duration)
        rows.append(row)
        print(f"[matrix]   -> rc={row['rc']} "
              f"ATE online {row.get('ate_online_cm', '?')} cm / "
              f"post-hoc {row.get('ate_posthoc_cm', '?')} cm, "
              f"ld err {row.get('ld_err_us', '?')} us, "
              f"{row.get('value', '?')} fps ({row['wall_s']}s)", flush=True)

    art = {
        "what": "anti-inverse-crime accuracy matrix: full bench (noise ON, "
                "visual self-bootstrap, streaming path) over GT families "
                "the estimator's basis cannot represent",
        "preset": args.preset,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "gates": {"ate_cm": 10.0 if args.preset == "tpu" else 6.0,
                  "ld_err_us": 2.0},
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"[matrix] artifact -> {args.out}")

    print("\n| GT family | seed | speed | ATE online (cm) | ATE post-hoc "
          "(cm) | ld err (us) | fps |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['gt']} | {r['seed']} | {r['speed']} | "
              f"{r.get('ate_online_cm', 'FAIL')} | "
              f"{r.get('ate_posthoc_cm', 'FAIL')} | "
              f"{r.get('ld_err_us', 'FAIL')} | {r.get('value', 0)} |")
    bad = [r for r in rows if r["rc"] != 0]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
