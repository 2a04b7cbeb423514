"""Regenerate docs/operators.md from the live operator registry.

Usage: python tools/gen_catalog.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

HEADER = """# Operator catalog

Every registered query (the `queries()` driver contract), grouped by
module. Each entry has a DuckDB oracle twin unless marked rows-only;
`python tools/verify_local.py <sf_dir> <name>` verifies any one of
them value-exactly.
"""


def main() -> None:
    from iceberg_loader_spark.operators import _modules, all_oracles

    oracles = all_oracles()
    out = [HEADER]
    for mod in _modules():
        name = mod.__name__.rsplit(".", 1)[-1]
        queries = mod.QUERIES
        out.append(f"\n## {name} ({len(queries)} queries)\n")
        doc = (mod.__doc__ or "").strip().split("\n\n")[0].replace("\n", " ")
        if doc:
            out.append(f"{doc}\n")
        for key, fn in queries.items():
            line = f"- `{key}`"
            fdoc = (fn.__doc__ or "").strip().split("\n")[0].rstrip()
            if fdoc:
                line += f" — {fdoc}"
            if key not in oracles:
                line += " (rows-only)"
            out.append(line)
        out.append("")
    with open("docs/operators.md", "w") as f:
        f.write("\n".join(out).rstrip() + "\n")
    total = sum(len(m.QUERIES) for m in _modules())
    print(f"docs/operators.md regenerated: {total} queries")


if __name__ == "__main__":
    main()
