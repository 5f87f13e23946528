"""Docs ↔ artifacts integrity: every ``artifacts/...`` path cited in the
measurement docs must exist in the repo.

Round-4 verdict finding: SPEEDUP.md pointed at
artifacts/certification/n16k/.../n16k_final.json before the file was ever
produced, so a reader believed a pending measurement was a landed result.
The stamp system (tests/test_certification_stamp.py) catches WRONG-model
artifacts; this catches MISSING ones.  Docs must not cite an artifact path
until the artifact is committed — pending work cites the producing script
instead.
"""

import glob
import itertools
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "SPEEDUP.md", "ARCHITECTURE.md", "BASELINE.md"]

# artifacts/ path tokens, incl. {a,b} brace sets and * globs; stops at
# whitespace, quotes/backticks, and markdown/sentence punctuation.
_PATH_RE = re.compile(r"artifacts/[A-Za-z0-9_\-./{},*]+")


def _expand_braces(path):
    """Expand shell-style {a,b} sets: 'w{0,2}/x' -> ['w0/x', 'w2/x']."""
    m = re.search(r"\{([^{}]*)\}", path)
    if not m:
        return [path]
    pre, post = path[: m.start()], path[m.end():]
    out = []
    for alt in m.group(1).split(","):
        out.extend(_expand_braces(pre + alt + post))
    return out


def _cited_paths(doc):
    with open(os.path.join(REPO, doc)) as f:
        text = f.read()
    for tok in _PATH_RE.findall(text):
        tok = tok.rstrip(".,;:")  # sentence punctuation
        yield from _expand_braces(tok)


def _all_citations():
    return sorted(
        set(
            itertools.chain.from_iterable(
                ((doc, p) for p in _cited_paths(doc)) for doc in DOCS
            )
        )
    )


@pytest.mark.parametrize("doc,path", _all_citations(),
                         ids=lambda v: v if isinstance(v, str) else None)
def test_cited_artifact_exists(doc, path):
    full = os.path.join(REPO, path)
    if "*" in path:
        assert glob.glob(full), (
            f"{doc} cites artifact glob {path!r} matching nothing"
        )
    else:
        assert os.path.exists(full), (
            f"{doc} cites artifact path {path!r} which does not exist — "
            "either commit the artifact or cite the producing script until "
            "it lands"
        )


def test_citations_found_at_all():
    """Guard the guard: the regex must keep finding citations (an empty
    parametrize list would silently pass if the docs changed shape)."""
    assert len(_all_citations()) > 10
