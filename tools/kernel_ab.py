"""Automated previous-round kernel A/B (verdict r6 #7): the definitive
code-vs-platform discriminator the probe ratio only approximates.

The driver ends each round with a ``round N: …`` commit, so the
previous round's kernel is always addressable. This tool checks that
tree out into a scratch worktree and runs the SAME single-core probe on
both kernels, interleaved rep-by-rep (prev, cur, prev, cur, …) so
platform drift inside the measurement window cancels instead of
landing on one side. ``kernel_ab_ratio`` = current best / previous
best: ~1.0 means any bench delta this round is platform/load, not
kernel code.

Each rep is its own pinned subprocess (two package versions cannot be
imported into one interpreter); the probe's in-process warmup keeps
import/JIT cost out of the timed loop.

Usage: python tools/kernel_ab.py [sf_dir]  (importable: run_kernel_ab)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE_SNIPPET = """\
import json, sys
sys.path.insert(0, {root!r})
from tools.kernel_probe import run_probe
print(json.dumps(run_probe({sf!r}, {n}, reps=1, pin_core=0)))
"""


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, check=True,
                          capture_output=True, text=True).stdout.strip()


def _probe_once(root: str, sf_dir: str, n_docs: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c",
         _PROBE_SNIPPET.format(root=root, sf=sf_dir, n=n_docs)],
        check=True, capture_output=True, text=True, cwd=root)
    return float(json.loads(out.stdout.strip().splitlines()[-1])
                 ["kernel_ms_per_doc"])


def _prev_round_sha() -> str:
    """The newest 'round N:' commit belonging to a COMPLETED round —
    capped by max(CORRECTNESS_r*.json), the same completed-round rule
    bench.py's shared-sum comparison uses. Without the cap, a bench
    re-run after the driver commits the CURRENT round's ledger would
    A/B the kernel against itself and report ratio 1.0 over any real
    regression."""
    import glob
    import re

    corr = [int(m.group(1)) for p in
            glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
            if (m := re.search(r"_r(\d+)\.json$", p))]
    if not corr:
        return ""  # round 1: nothing completed to compare against
    cap = max(corr)
    lines = _git("log", "-E", "--grep", r"^round [0-9]+:",
                 "-n", "10", "--format=%H %s")
    for line in lines.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+):", subject)
        if m and int(m.group(1)) <= cap:
            return sha
    return ""


def run_kernel_ab(sf_dir: str = "/root/testdata/sf0.01",
                  n_docs: int = 500, reps: int = 3) -> dict:
    """Returns the kernel_ab_* fields, or {} when there is no previous
    round commit / no usable git state (round 1, detached sandboxes)."""
    try:
        sha = _prev_round_sha()
    except (subprocess.CalledProcessError, OSError):
        return {}
    if not sha:
        return {}
    wt = tempfile.mkdtemp(prefix="defuddle_kernel_ab_")
    try:
        # mkdtemp creates the dir; worktree add wants to create it itself
        os.rmdir(wt)
        _git("worktree", "add", "--detach", wt, sha)
        prev_best = cur_best = float("inf")
        for _ in range(reps):
            prev_best = min(prev_best, _probe_once(wt, sf_dir, n_docs))
            cur_best = min(cur_best, _probe_once(REPO, sf_dir, n_docs))
        return {
            "kernel_ab_prev_sha": sha[:12],
            "kernel_ab_prev_ms_per_doc": round(prev_best, 4),
            "kernel_ab_cur_ms_per_doc": round(cur_best, 4),
            "kernel_ab_ratio": round(cur_best / prev_best, 4),
        }
    except (subprocess.CalledProcessError, OSError, ValueError,
            KeyError, json.JSONDecodeError):
        return {}
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    print(json.dumps(run_kernel_ab(sf)))
