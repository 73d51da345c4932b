"""Mechanical per-query bench comparison across rounds.

Reads every BENCH_r*.json the driver recorded (whose stdout tails are
often truncated — parse defensively) plus the repo's bench_full.json,
and prints per-query ratios newest-vs-previous so regressions are a
table, not an archaeology project. Ratios inside the observed ±12%
co-tenant variance band (NOTES.md) are marked noise.

Usage: python scripts/bench_compare.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import math as _math

# NOTES.md records a ±12% co-tenant variance band from a same-config
# rerun; flag anything whose |log-ratio| exceeds exactly that.
NOISE_BAND = _math.log(1.12)


def load_rounds(repo_root: str) -> dict[str, dict[str, float]]:
    """label -> {query: sec}; truncated driver files are salvaged by
    regex over whatever per-query pairs survived."""
    out: dict[str, dict[str, float]] = {}

    def _round_no(p: str) -> int:
        # Numeric sort: BENCH_r9 must precede BENCH_r10 even if the
        # two-digit zero padding is ever dropped (lexicographic would
        # silently compare against the wrong "previous" round).
        m = re.search(r"BENCH_r0*(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    for path in sorted(glob.glob(os.path.join(repo_root, "BENCH_r*.json")),
                       key=_round_no):
        label = os.path.basename(path)[: -len(".json")]
        text = open(path).read()
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            data = None
        queries = None
        if isinstance(data, dict):
            raw = data.get("parsed") or data
            queries = raw.get("queries") if isinstance(raw, dict) else None
            if not queries and isinstance(data.get("tail"), str):
                # Driver records hold the (truncated) stdout in "tail";
                # json.loads already unescaped it — regex out whatever
                # per-query pairs survived the truncation.
                text = data["tail"]
        if not queries:
            queries = {
                m.group(1): float(m.group(2))
                for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', text)
                if m.group(1)
                not in ("value", "sf", "n_queries", "loadavg5", "ts")
            }
        if queries:
            out[label] = queries
    full = os.path.join(repo_root, "bench_full.json")
    if os.path.exists(full):
        out["bench_full(latest)"] = json.load(open(full))["queries"]
    return out


def main() -> int:
    import math

    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    rounds = load_rounds(root)
    if len(rounds) < 2:
        print("need at least two bench records to compare")
        return 1
    labels = list(rounds)
    prev, cur = labels[-2], labels[-1]
    a, b = rounds[prev], rounds[cur]
    common = sorted(set(a) & set(b), key=lambda q: b[q] / max(a[q], 1e-9))
    print(f"{cur} vs {prev}: {len(common)} common queries "
          f"({len(set(b) - set(a))} new, {len(set(a) - set(b))} dropped)")
    total_a = sum(a[q] for q in common)
    total_b = sum(b[q] for q in common)
    print(f"common-query totals: {total_b:.1f}s vs {total_a:.1f}s "
          f"({total_b / max(total_a, 1e-9):.2f}x)\n")
    print(f"{'query':34} {'prev':>7} {'cur':>7} {'ratio':>6}")
    for q in common:
        r = b[q] / max(a[q], 1e-9)
        flag = "" if abs(math.log(r)) < NOISE_BAND else (
            "  <-- slower" if r > 1 else "  <-- faster"
        )
        print(f"{q:34} {a[q]:7.2f} {b[q]:7.2f} {r:6.2f}{flag}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        sys.exit(0)
