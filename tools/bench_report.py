"""Diff two bench JSON lines (BENCH_r{N}.json or bench.py output).

Prints per-query deltas sorted by regression size, flags queries beyond a
noise threshold, and summarizes the totals — the per-round perf triage the
VERDICT tables are built from. Usage:

    python tools/bench_report.py BENCH_r04.json BENCH_r05.json [--noise 0.15]

A file may contain log noise around the JSON line; the last parseable
line wins (bench.py prints exactly one).
"""

from __future__ import annotations

import json
import sys


def _last_json_line(text: str) -> dict | None:
    last = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                last = json.loads(line)
            except json.JSONDecodeError:
                continue
    return last


def load(path: str) -> dict:
    """Accept either bench.py's one-line output or the driver's
    BENCH_r{N}.json wrapper (whole-file JSON with the bench line embedded
    in its 'tail' field)."""
    raw = open(path).read()
    try:
        doc = json.loads(raw)
        if "queries" in doc:
            return doc
        inner = _last_json_line(doc.get("tail", ""))
        if inner is not None:
            return inner
    except json.JSONDecodeError:
        pass
    inner = _last_json_line(raw)
    if inner is None:
        raise SystemExit(f"{path}: no bench JSON found")
    return inner


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noise = 0.15
    for a in sys.argv[1:]:
        if a.startswith("--noise"):
            noise = float(a.split("=", 1)[1]) if "=" in a else noise
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])

    if old.get("value") is None or new.get("value") is None:
        print("WARNING: one side has value=null (crashed run) — totals not comparable")

    oq, nq = old.get("queries", {}), new.get("queries", {})
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "only-one-side"))
            continue
        delta = (b - a) / a if a else float("inf")
        flag = ""
        if delta > noise:
            flag = "REGRESSED"
        elif delta < -noise:
            flag = "improved"
        rows.append((-(delta), name, a, b, flag))

    print(f"{'query':36} {'old':>8} {'new':>8} {'delta':>8}  flag")
    for _, name, a, b, flag in sorted(rows):
        if a is None or b is None:
            print(f"{name:36} {a or '—':>8} {b or '—':>8} {'':>8}  {flag}")
        else:
            print(f"{name:36} {a:8.3f} {b:8.3f} {100 * (b - a) / a:+7.1f}%  {flag}")

    if old.get("value") is not None and new.get("value") is not None:
        tv, nv = old["value"], new["value"]
        print(
            f"\ntotal: {tv:.3f}s -> {nv:.3f}s "
            f"({100 * (nv - tv) / tv:+.1f}%)  sf={new.get('sf')}"
        )
    for side, d in (("old", old), ("new", new)):
        if d.get("errors"):
            print(f"{side} errors: {d['errors']}")


if __name__ == "__main__":
    main()
