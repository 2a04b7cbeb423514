"""Static docs-site validation — the offline equivalent of
`mkdocs build --strict` for a sandbox with no mkdocs toolchain.

Checks:
1. every nav entry in mkdocs.yml points at an existing file in docs/;
2. every relative .md link inside docs/*.md resolves;
3. docs/operators.md is fresh enough to mention every registered
   operator module (it is generated — staleness here means
   tools/gen_operator_docs.py was not re-run).

Exit 0 = the site would build; non-zero prints each violation.
"""

from __future__ import annotations

import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
DOCS = os.path.join(REPO, "docs")


def nav_files() -> list[str]:
    """Parse the nav: block of mkdocs.yml without a YAML dependency —
    entries are single-level `  - Title: file.md` lines."""
    out = []
    in_nav = False
    with open(os.path.join(REPO, "mkdocs.yml")) as f:
        for line in f:
            if line.startswith("nav:"):
                in_nav = True
                continue
            if in_nav:
                m = re.match(r"\s+- .*?:\s*(\S+\.md)\s*$", line)
                if m:
                    out.append(m.group(1))
                elif line.strip() and not line.startswith(" "):
                    break
    return out


def main() -> int:
    errors = []
    nav = nav_files()
    if not nav:
        errors.append("mkdocs.yml: empty or unparseable nav block")
    for f in nav:
        if not os.path.isfile(os.path.join(DOCS, f)):
            errors.append(f"mkdocs.yml nav entry missing: docs/{f}")

    link_re = re.compile(r"\]\(([^)#]+\.md)(#[^)]*)?\)")
    for name in sorted(os.listdir(DOCS)):
        if not name.endswith(".md"):
            continue
        text = open(os.path.join(DOCS, name)).read()
        for m in link_re.finditer(text):
            target = m.group(1)
            if target.startswith(("http://", "https://")):
                continue
            if not os.path.isfile(os.path.join(DOCS, target)):
                errors.append(f"docs/{name}: broken link -> {target}")

    gen = open(os.path.join(DOCS, "operators.md")).read()
    ops_dir = os.path.join(REPO, "iceberg_loader_spark", "operators")
    for mod in sorted(os.listdir(ops_dir)):
        if mod.endswith(".py") and not mod.startswith("_"):
            stem = mod[:-3]
            if f"## {stem} " not in gen and f"## {stem}\n" not in gen:
                errors.append(
                    f"docs/operators.md: no section for operator module "
                    f"{stem} (re-run tools/gen_operator_docs.py)"
                )

    if errors:
        print("\n".join(errors))
        return 1
    print(f"docs check OK: {len(nav)} nav entries, links resolve, "
          "operator catalog covers every module")
    return 0


if __name__ == "__main__":
    sys.exit(main())
