"""Plan the next round's driver-checked 50-query prefix.

The external driver verifies only the FIRST 50 entries of queries() per
round, so the prefix must rotate to bound staleness (ADVICE r04 item 4,
policy documented at plans/registry.py:_PRIORITY). This tool reads every
CORRECTNESS_r*.json, computes each registered query's latest driver
verdict and its age, and prints a suggested prefix:

  1. queries with NO driver record ever (highest priority)
  2. queries whose latest record is a FAIL or rows-only
  3. everything else, oldest-last-green first

Queries changed in the current round must be added by hand (the tool
cannot know the working diff); slot them at the top and trim from the
bottom of the suggestion. Run from the repo root:

    python tools/rotation_plan.py [prefix_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREFIX_SIZE_DEFAULT = 50


def main() -> None:
    prefix_size = int(sys.argv[1]) if len(sys.argv) > 1 else PREFIX_SIZE_DEFAULT

    from spark_sql_custom_mq_datasource_spark.plans.registry import get_queries

    registered = list(get_queries())

    latest: dict[str, tuple[int, str]] = {}  # name -> (round, verdict)
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path)
        rnd = int(m.group(1)) if m else 0
        for name, rec in json.load(open(path)).items():
            if rec.get("hash_match"):
                verdict = "green"
            elif rec.get("err") == "no_oracle":
                verdict = "rows-only"
            else:
                verdict = "FAIL"
            latest[name] = (rnd, verdict)

    never = [q for q in registered if q not in latest]
    bad = [q for q in registered if q in latest and latest[q][1] != "green"]
    green = sorted(
        (q for q in registered if q in latest and latest[q][1] == "green"),
        key=lambda q: (latest[q][0], registered.index(q)),
    )

    print(f"# registered: {len(registered)}  prefix size: {prefix_size}")
    print(f"# never driver-checked: {len(never)}")
    print(f"# latest verdict not green: {len(bad)}")
    if green:
        oldest = latest[green[0]][0]
        n_oldest = sum(1 for q in green if latest[q][0] == oldest)
        print(f"# stalest green round: r{oldest:02d} ({n_oldest} queries)")
    print()
    print("# Suggested prefix (add queries changed this round at the top,")
    print("# then trim to size from the bottom):")
    suggestion = (never + bad + green)[:prefix_size]
    for q in suggestion:
        rnd, verdict = latest.get(q, (None, "never-checked"))
        tag = f"r{rnd:02d} {verdict}" if rnd is not None else verdict
        print(f'    "{q}",  # {tag}')


if __name__ == "__main__":
    main()
