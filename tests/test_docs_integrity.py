"""Evidence hygiene (VERDICT r3 weak #2): any committed file that cites a
repo path — a docs/ log, a benchmark script, a tool — must cite one that
exists. Round 3 shipped docstrings referencing
``docs/quant_divergence_r03.log`` as committed evidence when no such file
was in the tree; this test makes that class of claim a test failure.
"""

import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# repo-relative path citations: docs/foo.log, benchmarks/bar.py, ...
_PAT = re.compile(
    r"\b((?:docs|benchmarks|tools|examples|tests)/"
    r"[A-Za-z0-9_.\-/]+\.(?:log|md|py|json|txt|model))\b")

# prose may legitimately name paths that are outputs of commands the
# reader is told to run later, or paths INSIDE the reference repo being
# described — marked by these nearby words
_FUTURE_MARKERS = ("will ", "would ", "to be written", "producing",
                   "| tee ", "> docs/", "reference", "Reference")

# files describing external content (the reference repo's layout, the
# judge's round reviews) cite paths that are not this repo's; this test
# file itself holds deliberately-nonexistent example paths
_EXTERNAL = {"SURVEY.md", "VERDICT.md", "ADVICE.md", "BASELINE.md",
             "PAPERS.md", "SNIPPETS.md", "test_docs_integrity.py"}


def _tracked_files():
    out = subprocess.run(["git", "ls-files", "*.py", "*.md"],
                         cwd=REPO, capture_output=True, text=True)
    return [REPO / p for p in out.stdout.split()
            if Path(p).name not in _EXTERNAL]


def test_cited_repo_paths_exist():
    missing = []
    for f in _tracked_files():
        text = f.read_text(errors="replace")
        for m in _PAT.finditer(text):
            rel = m.group(1)
            if (REPO / rel).exists():
                continue
            # tolerate explicit run-this-to-produce-it instructions
            line_start = text.rfind("\n", 0, m.start()) + 1
            line = text[line_start:text.find("\n", m.end())]
            if any(k in line for k in _FUTURE_MARKERS):
                continue
            missing.append(f"{f.relative_to(REPO)}: {rel}")
    assert not missing, (
        "committed files cite repo paths that do not exist "
        "(evidence must be in the tree, or the sentence must say the "
        "file is produced by running a command):\n  "
        + "\n  ".join(missing))
