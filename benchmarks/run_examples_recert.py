"""Chip re-certification sweep of every example workflow (VERDICT r3
item 5): run each `examples/*.py` with small-but-real arguments on the
TPU, serially (one chip process at a time — CLAUDE.md), and emit a
markdown table for PARITY.md.

    python benchmarks/run_examples_recert.py [name-substr ...]

Writes recert_results.md next to this file.  Each row: example, args,
PASS/FAIL, wall seconds, last interesting output line.
"""

import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---- success predicates (VERDICT r4 item 8): each returns None on
# success or a reason string.  Where a workflow claims LEARNING, the
# recert args use step counts the workflow is known to learn at, and the
# oracle asserts direction/accuracy — a rising loss or chance top-1 can
# no longer PASS.  Mechanism-only smokes assert their key output exists.


def _floats(pattern: str, text: str):
    return [float(m) for m in re.findall(pattern, text)]


def check_loss_falls(tag: str = r"loss ([\d.]+) -> ([\d.]+)"):
    def check(out: str) -> str:
        m = re.search(tag, out)
        if not m:
            return f"no loss trajectory matching {tag!r}"
        first, last = float(m.group(1)), float(m.group(2))
        if not last < first:
            return f"loss did not fall: {first} -> {last}"
        return None

    return check


def check_top1(pattern: str, minimum: float):
    def check(out: str) -> str:
        vals = _floats(pattern, out)
        if not vals:
            return f"no top-1 matching {pattern!r}"
        if max(vals) < minimum:
            return f"top-1 {max(vals)} below required {minimum}"
        return None

    return check


def check_contains(*needles: str):
    def check(out: str) -> str:
        for n in needles:
            if not re.search(n, out):
                return f"missing expected output {n!r}"
        return None

    return check


# (script, args, timeout_s, check) — args sized to certify the workflow;
# heavyweight synthetic runs are certified by their full runs.
MANIFEST = [
    ("multistate_inference.py", ["--batch", "2", "--num-sample", "256"], 2400,
     check_contains(r"receiver_to_transmitter_attentions")),
    ("train_predictive.py", ["--steps", "4"], 2400,
     check_contains(r"\bdone\b")),
    ("train_subsample.py", ["--steps", "4"], 2400,
     check_contains(r"\bdone\b")),
    ("train_multistate.py", ["--steps", "4", "--batch", "4"], 2400,
     check_loss_falls()),
    ("train_saccadic.py", ["--steps", "3", "--batch", "4"], 2400,
     check_loss_falls()),
    ("saccadic_demo.py", [], 2400, check_contains(r"constructed edges")),
    ("ncut_compare.py", [], 1800, check_contains(r"within-blob spread")),
    ("spectral_debug.py", [], 2400, check_contains(r"wrote \d+ figures")),
    ("serve_vit.py", ["--mode", "bf16", "--rps", "60", "--seconds", "3"], 2400,
     check_contains(r"batches: [1-9]")),
    ("serve_vit.py", ["--mode", "int8", "--rps", "60", "--seconds", "3"], 3000,
     check_contains(r"batches: [1-9]")),
    ("export_serving.py", ["--requests", "16"], 2400,
     check_contains(r"served 16 requests")),
    # learning oracle: 60 steps cycling 2 fixed batches at lr 1e-3
    # memorizes the noise set — loss must FALL (r4's 2-step smoke showed
    # a rising loss as PASS)
    ("eval_classifier.py",
     ["--eval-batches", "2", "--steps", "60", "--lr", "1e-3"], 1800,
     check_loss_falls(r"augmented fine-tune loss ([\d.]+) -> ([\d.]+)")),
    # learning oracle: 400 steps is past the knee (900 → 95-97%); the
    # r4 smoke at 120 steps certified chance top-1 as PASS
    ("train_digits.py", ["--steps", "400"], 2400,
     check_top1(r"test top-1[^:]*: ([\d.]+)", 0.30)),
    (
        "train_multistate_digits.py",
        ["--steps", "400", "--ms-steps", "200"],
        3000,
        check_top1(r"multistate test top-1: ([\d.]+)", 0.30),
    ),
    (
        "pretrain_synthetic.py",
        ["--preset", "small", "--steps", "30", "--corpus-size", "128",
         "--eval-size", "64", "--out", "runs/recert"],
        2400,
        check_contains(r"held-out top-1", r"checkpoint \+ summary"),
    ),
    (
        "train_subsample_synthetic.py",
        ["--warmup", "20", "--steps", "20", "--corpus-size", "128",
         "--eval-size", "64", "--out", "runs/recert"],
        3000,
        check_contains(r"learned policy", r"figure \+ metrics"),
    ),
    (
        "train_multistate_synthetic.py",
        ["--preset", "small", "--eval-size", "16", "--batch", "8",
         "--out", "runs/recert"],
        2400,
        check_contains(r"trained trunk\s*: ARI", r"figure \+ summary"),
    ),
    (
        "train_predictive_synthetic.py",
        ["--steps", "10", "--batch", "8", "--corpus-size", "128",
         "--log-every", "5", "--out", "runs/recert"],
        3000,
        check_contains(r"figures \+ metrics"),
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
    for script, args, tmo, check in MANIFEST:
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
            elif check is not None:
                reason = check(p.stdout or "")
                if reason is not None:
                    ok, tail = False, f"ORACLE: {reason} | {tail}"
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
