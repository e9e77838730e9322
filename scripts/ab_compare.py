"""Same-window A/B of the working tree vs a git rev (or env-flag variants).

The CLAUDE.md rule is "don't re-litigate a design decision without a
same-window A/B" — this makes those A/Bs one command. It alternates
subprocess timing runs (scripts/_time_attn.py) between sides within the
same chip window, pairing each NEW run with the immediately following OLD
run so contention phases hit both sides equally, and reports per-pair
ratios plus each run's matmul speed-of-light for window gating.

Sides:
  --rev REV          side B imports flashattention_tpu from a git worktree
                     of REV (created under /tmp, reused if present)
  --env-b K=V[,K=V]  side B runs with extra FAT_* env flags instead of
                     (or in addition to) a different rev
  --env-a K=V[,K=V]  extra env for side A (default: working tree, no flags)

Examples:
  python scripts/ab_compare.py --rev HEAD~1 --what bwd,sol
  python scripts/ab_compare.py --env-b FAT_FWD_SCALE_FOLD=1 --what fwd,sol
  python scripts/ab_compare.py --rev HEAD --env-b FAT_BWD_IMPL=split
"""

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "scripts", "_time_attn.py")


def worktree_for(rev: str) -> str:
    sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", rev],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    path = f"/tmp/fat_ab_{sha}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", path, sha],
            check=True, capture_output=True,
        )
    return path


def run_side(pypath: str, extra_env: dict, child_args: list,
             timeout: float) -> dict | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = pypath + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    env.update(extra_env)
    try:
        proc = subprocess.run(
            [sys.executable, CHILD, *child_args],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        print("  side timed out (wedged window?)", flush=True)
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("TIMING "):
            return json.loads(line[len("TIMING "):])
    print("  side failed:", proc.stderr.strip().splitlines()[-3:], flush=True)
    return None


def parse_env(s: str | None) -> dict:
    if not s:
        return {}
    return dict(kv.split("=", 1) for kv in s.split(","))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", default=None,
                    help="git rev for side B (default: same tree as A)")
    ap.add_argument("--env-a", default=None)
    ap.add_argument("--env-b", default=None)
    ap.add_argument("--shape", default="1,8,8192,128")
    ap.add_argument("--what", default="fwd,bwd,sol")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--blocks", default=None)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--timeout", type=float, default=1200.0,
                    help="per-side timeout, s (first run pays compiles)")
    args = ap.parse_args()
    if args.rev is None and not args.env_b:
        ap.error("need --rev and/or --env-b to define side B")

    path_a = REPO
    path_b = worktree_for(args.rev) if args.rev else REPO
    env_a, env_b = parse_env(args.env_a), parse_env(args.env_b)
    child_args = ["--shape", args.shape, "--what", args.what]
    if args.causal:
        child_args.append("--causal")
    if args.blocks:
        child_args += ["--blocks", args.blocks]

    label_a = f"A[{path_a}{' ' + str(env_a) if env_a else ''}]"
    label_b = f"B[{path_b}{' ' + str(env_b) if env_b else ''}]"
    print(f"{label_a}\nvs {label_b}\n", flush=True)

    keys = [w + "_ms" for w in args.what.split(",") if w != "sol"]
    ratios = {k: [] for k in keys}
    for i in range(args.pairs):
        ra = run_side(path_a, env_a, child_args, args.timeout)
        rb = run_side(path_b, env_b, child_args, args.timeout)
        if not ra or not rb:
            continue
        row = [f"pair {i}:"]
        for k in keys:
            if k in ra and k in rb:
                r = rb[k] / ra[k]
                ratios[k].append(r)
                row.append(f"{k} A={ra[k]:.3f} B={rb[k]:.3f} B/A={r:.3f}")
        row.append(f"sol A={ra.get('sol_tflops')} B={rb.get('sol_tflops')}")
        print("  ".join(row), flush=True)

    print()
    for k in keys:
        if ratios[k]:
            med = statistics.median(ratios[k])
            verdict = ("A faster" if med > 1.02
                       else "B faster" if med < 0.98 else "within noise")
            print(f"{k}: median B/A = {med:.3f} over {len(ratios[k])} pairs "
                  f"-> {verdict}", flush=True)


if __name__ == "__main__":
    main()
