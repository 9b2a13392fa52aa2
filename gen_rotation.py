"""Rebuild queries.py's rotation staleness dict from CORRECTNESS_r*.json.

Run at the START of each round (after reading the new VERDICT):

    python gen_rotation.py

Prints the `_LAST_DRIVER_ROUND` literal to paste into
rusty_timeseries_db_spark/queries.py, plus the window composition
preview for a given modified-set size. `_ROUND_MODIFIED` itself is
authored by hand — it is this round's intent, not derivable from
history.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def latest_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in json.load(open(path)):
            last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> None:
    from rusty_timeseries_db_spark import queries as Q

    last = latest_rounds()
    names = {q.name for q in Q._REGISTRY}
    stale = {k: v for k, v in last.items() if k in names}
    dropped = sorted(set(last) - names)
    if dropped:
        print(f"# WARNING: {len(dropped)} checked queries no longer declared:"
              f" {dropped}")
    tiers: dict[int, list[str]] = {}
    for k, v in sorted(stale.items()):
        tiers.setdefault(v, []).append(k)
    rounds = sorted(tiers)
    # the MEDIAN tier becomes the dict default (omit-from-dict tier):
    # pick the tier holding the most queries to keep the literal short
    default_tier = max(rounds, key=lambda r: len(tiers[r]))
    print(f"# tiers: " + ", ".join(f"r{r:02d}={len(tiers[r])}" for r in rounds))
    print(f"# default (omit from dict): {default_tier} — set "
          f"`_LAST_DRIVER_ROUND.get(q.name, {default_tier})` in "
          "_ordered_registry accordingly")
    print("_LAST_DRIVER_ROUND: dict[str, int] = {")
    for r in rounds:
        if r == default_tier:
            continue
        print(f"    **dict.fromkeys([")
        for n in tiers[r]:
            print(f'        "{n}",')
        print(f"    ], {r}),")
    print("}")
    never = sorted(names - set(stale))
    print(f"# never driver-checked ({len(never)} — belong in "
          f"_ROUND_MODIFIED when new this round): {never}")


if __name__ == "__main__":
    main()
