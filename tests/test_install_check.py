"""The packaging claim, tested where the repo lives: a clean venv must
end up importing THIS checkout through at least one documented install
path (modern editable, or the offline setup.py develop fallback)."""

from __future__ import annotations

import tempfile

from tools.install_check import check


def test_clean_venv_install_and_import():
    with tempfile.TemporaryDirectory(prefix="ils_install_t_") as d:
        path_used = check(d)
    assert path_used in (
        "pip install -e . (--no-build-isolation)",
        "python setup.py develop",
    )
