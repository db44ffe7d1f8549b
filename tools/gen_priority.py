"""Regenerate plans/registry.py PRIORITY from driver correctness history.

Protocol (established r6, re-mandated VERDICT r12 task #2): the driver
samples ~50 registry queries per round preferring earlier entries, so
PRIORITY must lead with queries that have NEVER produced a driver-green
row (new this round or added since the last sample), followed by every
other query ordered oldest-driver-green-row-first (ascending newest
green round, alphabetical within a round).

Usage:  python tools/gen_priority.py            # print the list
        python tools/gen_priority.py --apply    # rewrite the PRIORITY
                                                # block in registry.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG_PATH = os.path.join(REPO, "blinkit_etl_pipeline_spark", "plans", "registry.py")


def newest_green_rounds() -> dict[str, int]:
    """query -> newest round with a fully-green driver row."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("err"):
                continue
            if row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match", True
            ):
                if newest.get(name, -1) < rnd:
                    newest[name] = rnd
    return newest


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    from blinkit_etl_pipeline_spark.plans import registry

    return list(registry.all_queries().keys())


def build_priority() -> list[str]:
    greens = newest_green_rounds()
    names = registry_names()
    never = [n for n in names if n not in greens]
    seen = sorted((n for n in names if n in greens), key=lambda n: (greens[n], n))
    return never + seen


def main() -> None:
    pri = build_priority()
    greens = newest_green_rounds()
    if "--apply" in sys.argv:
        with open(REG_PATH) as f:
            src = f.read()
        lines = ["PRIORITY = ["]
        cur_round = None
        for n in pri:
            rnd = greens.get(n)
            tag = "never driver-green" if rnd is None else f"newest green r{rnd}"
            if tag != cur_round:
                lines.append(f"    # --- {tag} ---")
                cur_round = tag
            lines.append(f'    "{n}",')
        lines.append("]")
        block = "\n".join(lines)
        new_src, count = re.subn(
            r"PRIORITY = \[.*?\n\]", block, src, count=1, flags=re.S
        )
        if count != 1:
            raise SystemExit("PRIORITY block not found in registry.py")
        with open(REG_PATH, "w") as f:
            f.write(new_src)
        print(f"rewrote PRIORITY with {len(pri)} entries "
              f"({sum(1 for n in pri if n not in greens)} never-green first)")
    else:
        for n in pri:
            print(n, greens.get(n, "NEVER"))


if __name__ == "__main__":
    main()
