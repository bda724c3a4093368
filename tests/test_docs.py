"""Docs integrity guards runnable WITHOUT mkdocs (the CI docs job runs
``mkdocs build --strict``; this pins the same failure modes locally —
nav entries and relative markdown links must resolve)."""

import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DOCS = os.path.join(_REPO, "docs")


def test_mkdocs_nav_files_exist():
    nav_files = []
    for line in open(os.path.join(_REPO, "mkdocs.yml")):
        line = line.strip()
        if line.startswith("- ") and line.endswith(".md"):
            nav_files.append(line.split(":")[-1].strip())
    assert nav_files, "mkdocs.yml nav empty?"
    missing = [f for f in nav_files if not os.path.exists(os.path.join(_DOCS, f))]
    assert not missing, missing


def test_docs_relative_links_resolve():
    link = re.compile(r"\]\(([^)#\s]+)(#[^)]*)?\)")
    bad = []
    for name in os.listdir(_DOCS):
        if not name.endswith(".md"):
            continue
        for target, _frag in link.findall(open(os.path.join(_DOCS, name)).read()):
            if target.startswith(("http://", "https://", "mailto:")):
                continue
            if not os.path.exists(os.path.normpath(os.path.join(_DOCS, target))):
                bad.append((name, target))
    assert not bad, bad
