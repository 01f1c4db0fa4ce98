"""Chip re-certification sweep of every example workflow (VERDICT r3
item 5): run each `examples/*.py` with small-but-real arguments on the
TPU, serially (one chip process at a time — CLAUDE.md), and emit a
markdown table for PARITY.md.

    python benchmarks/run_examples_recert.py [name-substr ...]

Writes recert_results.md next to this file.  Each row: example, args,
PASS/FAIL, wall seconds, last interesting output line.
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (script, args, timeout_s) — args sized to certify the workflow, not to
# converge; heavyweight synthetic runs are certified by their full runs.
MANIFEST = [
    ("multistate_inference.py", ["--batch", "2", "--num-sample", "256"], 2400),
    ("train_predictive.py", ["--steps", "4"], 2400),
    ("train_subsample.py", ["--steps", "4"], 2400),
    ("train_multistate.py", ["--steps", "4", "--batch", "4"], 2400),
    ("train_saccadic.py", ["--steps", "3", "--batch", "4"], 2400),
    ("saccadic_demo.py", [], 2400),
    ("ncut_compare.py", [], 1800),
    ("spectral_debug.py", [], 2400),
    ("serve_vit.py", ["--mode", "bf16", "--rps", "60", "--seconds", "3"], 2400),
    ("serve_vit.py", ["--mode", "int8", "--rps", "60", "--seconds", "3"], 3000),
    ("export_serving.py", ["--requests", "16"], 2400),
    ("eval_classifier.py", ["--eval-batches", "2"], 1800),
    ("train_digits.py", ["--steps", "120"], 2400),
    (
        "train_multistate_digits.py",
        ["--steps", "120", "--ms-steps", "120"],
        3000,
    ),
    (
        "pretrain_synthetic.py",
        ["--preset", "small", "--steps", "30", "--corpus-size", "128",
         "--eval-size", "64", "--out", "runs/recert"],
        2400,
    ),
    (
        "train_subsample_synthetic.py",
        ["--warmup", "20", "--steps", "20", "--corpus-size", "128",
         "--eval-size", "64", "--out", "runs/recert"],
        3000,
    ),
    (
        "train_multistate_synthetic.py",
        ["--preset", "small", "--eval-size", "16", "--batch", "8",
         "--out", "runs/recert"],
        2400,
    ),
    (
        "train_predictive_synthetic.py",
        ["--steps", "10", "--batch", "8", "--corpus-size", "128",
         "--log-every", "5", "--out", "runs/recert"],
        3000,
    ),
]


def last_line(text: str) -> str:
    lines = [
        ln.strip()
        for ln in text.strip().splitlines()
        if ln.strip() and "WARNING" not in ln and "cpu_aot" not in ln
    ]
    return lines[-1][:110] if lines else ""


def main():
    filters = [a for a in sys.argv[1:]]
    rows = []
    for script, args, tmo in MANIFEST:
        if filters and not any(f in script for f in filters):
            continue
        label = f"{script} {' '.join(args)}"
        print(f"=== {label}", flush=True)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(ROOT, "examples", script), *args],
                capture_output=True, text=True, timeout=tmo, cwd=ROOT,
            )
            ok = p.returncode == 0
            tail = last_line(p.stdout or p.stderr)
            if not ok:
                tail = last_line(p.stderr) or tail
        except subprocess.TimeoutExpired:
            ok, tail = False, f"TIMEOUT {tmo}s"
        dt = time.time() - t0
        rows.append((label, ok, dt, tail))
        print(f"    {'PASS' if ok else 'FAIL'} in {dt:.0f}s — {tail}",
              flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "recert_results.md")
    import subprocess as sp

    commit = sp.run(["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
                    capture_output=True, text=True).stdout.strip()
    with open(out, "w") as f:
        f.write(f"# Example re-certification @ {commit}\n\n")
        f.write("| example | status | wall | last line |\n|---|---|---|---|\n")
        for label, ok, dt, tail in rows:
            f.write(f"| `{label}` | {'PASS' if ok else '**FAIL**'} "
                    f"| {dt:.0f}s | {tail} |\n")
    n_ok = sum(1 for r in rows if r[1])
    print(f"\n{n_ok}/{len(rows)} green -> {out}")


if __name__ == "__main__":
    main()
