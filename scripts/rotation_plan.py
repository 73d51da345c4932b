"""Rotation planner: compute per-query evidence age from the driver's
CORRECTNESS_r*.json files and propose the next round's 50-slot scored
head — queries whose LAST row was red first (they must stay scored
until green), then never-scored queries (no driver evidence at all),
then by oldest green row.

The scored window is the FIRST 50 names in the registry (observed
driver behavior, see queries/__init__.py); this script makes the
reshuffle mechanical so no query's evidence silently goes stale.

Usage: python scripts/rotation_plan.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES

SLOTS = 50


def evidence(repo_root: str) -> dict[str, tuple[int, bool]]:
    """name -> (last scored round, was it fully green) from every
    CORRECTNESS_r*.json present."""
    out: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            prev = out.get(name)
            if prev is None or rnd >= prev[0]:
                out[name] = (rnd, green)
    return out


def plan(repo_root: str) -> dict:
    ev = evidence(repo_root)
    names = list(QUERIES)
    never = [n for n in names if n not in ev]
    red = sorted(
        (n for n in names if n in ev and not ev[n][1]),
        key=lambda n: ev[n][0],
    )
    stale_first = sorted(
        (n for n in names if n in ev and ev[n][1]),
        key=lambda n: (ev[n][0], names.index(n)),
    )
    mandatory = red + never
    if len(mandatory) > SLOTS:
        print(
            f"WARNING: {len(mandatory)} red/never-scored queries exceed the "
            f"{SLOTS}-slot window — {len(mandatory) - SLOTS} of them will "
            f"remain unscored this round: "
            + ", ".join(mandatory[SLOTS:]),
            file=sys.stderr,
        )
    head = (mandatory + stale_first)[:SLOTS]
    tail = [n for n in names if n not in head]
    return {
        "n_queries": len(names),
        "never_scored": never,
        "red_rows": red,
        "proposed_head": head,
        "proposed_tail": tail,
        "evidence_age": {
            n: ev.get(n, (None, None))[0] for n in names
        },
    }


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    p = plan(root)
    print(f"{p['n_queries']} queries; {len(p['never_scored'])} never scored; "
          f"{len(p['red_rows'])} with a red last row")
    if p["red_rows"]:
        print("RED (must lead the head):", ", ".join(p["red_rows"]))
    print("\nproposed _HEAD (50):")
    for n in p["proposed_head"]:
        age = p["evidence_age"][n]
        print(f'    "{n}",' + (f"  # last scored r{age}" if age else "  # never scored"))
    print(f"\nproposed _TAIL ({len(p['proposed_tail'])} entries): "
          + ", ".join(p["proposed_tail"][:8]) + ", ...")
    return 0


if __name__ == "__main__":
    sys.exit(main())
