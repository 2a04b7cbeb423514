"""The docs-site scaffolding must stay buildable: nav entries exist,
relative links resolve, and the generated operator catalog covers
every operator module (the static equivalent of mkdocs build --strict
in a sandbox without the mkdocs toolchain)."""

from tools.docs_check import main


def test_docs_site_static_build():
    assert main() == 0
