"""Docs-integrity checks: every results_* artifact a doc cites must exist.

Round-2 verdict found COMPONENTS.md citing `results_ns/summary.json` and
`results_wave_dt01/summary.json` before those runs had ever been executed.
This test makes aspirational citations impossible: any `results_<name>`
mention in a repo-authored .md must correspond to a directory in the tree,
and any explicit `results_<name>/summary.json` mention to an existing file
with parseable JSON.

VERDICT.md / ADVICE.md are judge/advisor-authored records of past rounds and
may legitimately reference directories that were since renamed; SURVEY.md
describes the *reference's* output directories. They are excluded.
"""

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
EXCLUDED = {"VERDICT.md", "ADVICE.md", "SURVEY.md"}

# results_ mentions that end with an underscore or wildcard are glob-style
# ("results_no_mlp_2d_*") — require at least one match instead of an exact dir.
MENTION_RE = re.compile(r"results_[a-zA-Z0-9_]*[a-zA-Z0-9*]")


def _md_files():
    return [p for p in REPO.glob("*.md") if p.name not in EXCLUDED]


def test_cited_results_dirs_exist():
    missing = []
    for md in _md_files():
        text = md.read_text()
        for mention in set(MENTION_RE.findall(text)):
            pattern = mention if "*" in mention else mention
            if not list(REPO.glob(pattern + "*" if mention.endswith("_") else pattern)):
                missing.append(f"{md.name}: {mention}")
    assert not missing, (
        "docs cite results directories that do not exist (aspirational "
        f"citations are banned): {missing}"
    )


def test_cited_summary_jsons_exist_and_parse():
    path_re = re.compile(r"(results_[a-zA-Z0-9_*]+)/summary\.json")
    bad = []
    for md in _md_files():
        for dirname in set(path_re.findall(md.read_text())):
            hits = list(REPO.glob(dirname)) if "*" in dirname else [REPO / dirname]
            for d in hits:
                f = d / "summary.json"
                if not f.is_file():
                    bad.append(f"{md.name}: {f.relative_to(REPO)} missing")
                    continue
                try:
                    json.loads(f.read_text())
                except ValueError as e:
                    bad.append(f"{md.name}: {f.relative_to(REPO)} unparseable: {e}")
    assert not bad, f"cited summary.json problems: {bad}"
