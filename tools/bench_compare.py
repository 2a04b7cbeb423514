"""Per-query norm guard for the bench contract (r6 verdict #6).

The driver's 2x gate is tracked on the TOTAL; host-steal bursts move
individual queries 2-5x between runs of unchanged code, so a total-level
gate can't separate rotating-spike noise from a real per-query
regression.  This tool makes that machine-separable:

- ``tools/bench_norms.json`` holds each query's QUIET NORM — the fastest
  wall-second ever recorded for it in a BENCH_DETAIL.json run (min is
  the right statistic: host steal only ever adds time, so the minimum
  over runs converges on the query's true cost on a quiet box).
- ``compare(detail, norms)`` flags every query whose latest time exceeds
  ``factor`` x its norm AND is more than ``abs_floor`` seconds over it
  (sub-second queries jitter multiplicatively; the absolute floor keeps
  0.1 s -> 0.35 s noise out of the report), carrying the run's
  host-steal context so a reader can see at a glance whether the whole
  run was steal-scaled.
- ``update_norms`` folds a new run in (elementwise min, new keys added).

CLI:
    python tools/bench_compare.py            # report vs current norms
    python tools/bench_compare.py --update   # fold the run into norms
    python tools/bench_compare.py --factor 3 --floor 1.0
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
DETAIL_PATH = os.path.join(REPO, "BENCH_DETAIL.json")
NORMS_PATH = os.path.join(_HERE, "bench_norms.json")


def compare(
    detail: dict,
    norms: dict[str, float],
    factor: float = 2.0,
    abs_floor: float = 0.75,
) -> dict:
    """Return {flagged, new_queries, host, factor, abs_floor}.

    ``flagged``: [{query, sec, norm, ratio}] sorted by ratio desc — every
    query over ``factor`` x norm AND ``abs_floor`` seconds over norm.
    ``new_queries``: keys in the run with no recorded norm yet (first
    run after adding an operator — they seed the norm on --update).
    """
    timings: dict[str, float] = detail.get("queries", {})
    flagged = []
    new_queries = []
    for name, sec in timings.items():
        norm = norms.get(name)
        if norm is None:
            new_queries.append(name)
            continue
        if norm <= 0:
            continue
        if sec > factor * norm and (sec - norm) > abs_floor:
            flagged.append(
                {
                    "query": name,
                    "sec": sec,
                    "norm": norm,
                    "ratio": round(sec / norm, 2),
                }
            )
    flagged.sort(key=lambda r: r["ratio"], reverse=True)
    return {
        "flagged": flagged,
        "new_queries": sorted(new_queries),
        "host": detail.get("host", {}),
        "factor": factor,
        "abs_floor": abs_floor,
        "n_queries": len(timings),
    }


def update_norms(detail: dict, norms: dict[str, float]) -> dict[str, float]:
    """Elementwise min of the run into the norms; new keys seed at their
    first observed time. Returns the updated dict (caller persists)."""
    out = dict(norms)
    for name, sec in detail.get("queries", {}).items():
        if sec <= 0:
            continue
        prev = out.get(name)
        out[name] = round(min(prev, sec), 3) if prev is not None else sec
    return out


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> int:
    factor = 2.0
    abs_floor = 0.75
    argv = sys.argv[1:]
    if "--factor" in argv:
        factor = float(argv[argv.index("--factor") + 1])
    if "--floor" in argv:
        abs_floor = float(argv[argv.index("--floor") + 1])
    detail = _load(DETAIL_PATH)
    norms = _load(NORMS_PATH) if os.path.exists(NORMS_PATH) else {}

    report = compare(detail, norms, factor=factor, abs_floor=abs_floor)
    host = report["host"]
    print(
        f"run: {report['n_queries']} queries, total {detail.get('value')}s, "
        f"steal {host.get('steal_pct', '?')}% busy {host.get('busy_pct', '?')}%"
    )
    if report["flagged"]:
        print(f"\n{len(report['flagged'])} queries over {factor}x their quiet norm "
              f"(+{abs_floor}s floor):")
        for r in report["flagged"]:
            print(
                f"  {r['query']}: {r['sec']}s vs norm {r['norm']}s "
                f"({r['ratio']}x)"
            )
        print(
            "\ncontext: uniform flagging across unrelated families = box-state/"
            "steal artifact; isolated flags on touched code = investigate."
        )
    else:
        print("no queries over their quiet-norm band — clean run.")
    if report["new_queries"]:
        print(f"\n{len(report['new_queries'])} new queries (no norm yet): "
              + ", ".join(report["new_queries"]))

    if "--update" in argv:
        updated = update_norms(detail, norms)
        with open(NORMS_PATH, "w") as f:
            json.dump(updated, f, indent=1, sort_keys=True)
        print(f"\nnorms updated -> {NORMS_PATH} ({len(updated)} keys)")
    return 1 if report["flagged"] else 0


if __name__ == "__main__":
    sys.exit(main())
