"""Offline-robust install smoke (r9 verdict #4): prove the package
installs and imports from a CLEAN virtualenv in THIS environment.

The modern path (`pip install -e .`, PEP 621/660) needs either network
access (build isolation fetches setuptools>=68) or a local toolchain
with `wheel`; fully offline sandboxes with a pre-PEP-660 setuptools
(65.x) fail it with `invalid command 'bdist_wheel'`. This check
detects-and-degrades:

1. try `pip install -e .` with `--no-build-isolation` (uses whatever
   toolchain is present — succeeds on any current setup);
2. on failure, fall back to the legacy `python setup.py develop`
   (works on setuptools 65 with no wheel/network);
3. either way, assert `import iceberg_loader_spark` in the venv
   resolves to THIS repo checkout and exposes the public API.

Usage:
    python tools/install_check.py            # run the check
    python tools/install_check.py --keep DIR # keep the venv at DIR

Exit 0 = one of the install paths works offline and the import
resolves correctly. Prints which path succeeded (the honest claim for
README/BASELINE).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)


def _run(cmd: list[str], cwd: str | None = None) -> tuple[int, str]:
    proc = subprocess.run(
        cmd,
        cwd=cwd,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=600,
    )
    return proc.returncode, proc.stdout


def check(venv_dir: str) -> str:
    """Create a venv at venv_dir, install the repo into it, verify the
    import. Returns the name of the install path that worked."""
    # --system-site-packages: pyspark/pandas/numpy come from the host
    # environment (offline — the deps are not re-resolvable); the check
    # is about THIS package's metadata and import path, not its deps.
    rc, out = _run(
        [sys.executable, "-m", "venv", "--system-site-packages", venv_dir]
    )
    if rc != 0:
        raise RuntimeError(f"venv creation failed:\n{out}")
    vpy = os.path.join(venv_dir, "bin", "python")

    path_used = None
    rc, out = _run(
        [
            vpy,
            "-m",
            "pip",
            "install",
            "--no-build-isolation",
            "--no-deps",
            "-e",
            ".",
        ],
        cwd=REPO,
    )
    if rc == 0:
        path_used = "pip install -e . (--no-build-isolation)"
    else:
        print("modern editable path failed (expected on offline "
              "pre-PEP-660 toolchains); falling back to setup.py develop")
        rc2, out2 = _run([vpy, "setup.py", "develop"], cwd=REPO)
        if rc2 != 0:
            raise RuntimeError(
                f"BOTH install paths failed.\npip:\n{out}\ndevelop:\n{out2}"
            )
        path_used = "python setup.py develop"

    # import must resolve to THIS checkout and expose the public API —
    # run from a neutral cwd so the bare source tree can't shadow the
    # installed package.
    probe = (
        "import iceberg_loader_spark as p, os, sys;"
        "from iceberg_loader_spark import LoaderConfig, Warehouse, get_spark;"
        f"root = os.path.realpath({REPO!r});"
        "got = os.path.realpath(os.path.dirname(p.__file__));"
        "assert got == os.path.join(root, 'iceberg_loader_spark'), got;"
        "print('import OK from', got)"
    )
    rc, out = _run([vpy, "-c", probe], cwd=tempfile.gettempdir())
    if rc != 0:
        raise RuntimeError(f"venv import check failed:\n{out}")
    print(out.strip())
    return path_used


def main() -> int:
    argv = sys.argv[1:]
    keep = argv[argv.index("--keep") + 1] if "--keep" in argv else None
    venv_dir = keep or tempfile.mkdtemp(prefix="ils_install_check_")
    try:
        path_used = check(venv_dir)
        print(f"install check PASSED via: {path_used}")
        return 0
    finally:
        if not keep:
            shutil.rmtree(venv_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
