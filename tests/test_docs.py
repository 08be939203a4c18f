"""Docs-integrity checks: every results_* artifact a doc cites must be real.

Round-2 verdict found COMPONENTS.md citing `results_ns/summary.json` and
`results_wave_dt01/summary.json` before those runs had ever been executed.
Round-4 verdict found NOTES.md claiming a committed Poisson result
("see results_poisson_dt01") while no Poisson artifact existed anywhere in
git — and noted that the round-3 version of this test was too weak to catch
the next variant (an *empty untracked* directory with the right name would
have passed).

So the contract is now (round-4 verdict "next round" #2):

  any `results_<name>` mention in a repo-authored .md must correspond to a
  directory that is GIT-TRACKED (contains at least one tracked file) and
  holds a parseable `summary.json` that is itself git-tracked.  A directory
  merely existing on disk proves nothing about a claim of a committed run.

VERDICT.md / ADVICE.md are judge/advisor-authored records of past rounds and
may legitimately reference directories that were since renamed; SURVEY.md
describes the *reference's* output directories. They are excluded.
"""

import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
EXCLUDED = {"VERDICT.md", "ADVICE.md", "SURVEY.md"}

# results_ mentions that end with an underscore or wildcard are glob-style
# ("results_no_mlp_2d_*") — require at least one match instead of an exact dir.
MENTION_RE = re.compile(r"results_[a-zA-Z0-9_]*[a-zA-Z0-9*]")


def _md_files():
    return [p for p in REPO.glob("*.md") if p.name not in EXCLUDED]


def _tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=REPO, check=True,
                         capture_output=True, text=True).stdout
    return set(out.splitlines())


def _mention_dirs(mention):
    """Disk directories a doc mention refers to (glob-aware)."""
    pattern = mention + "*" if mention.endswith("_") else mention
    return [d for d in REPO.glob(pattern) if d.is_dir()]


def test_cited_results_dirs_are_committed_runs():
    """Every cited results_* dir: git-tracked + tracked parseable summary.json.

    This is the strong form: an empty or untracked directory with a cited
    name fails, as does a tracked directory whose summary.json was never
    committed.  Aspirational citations cannot pass in any variant.
    """
    tracked = _tracked_files()
    tracked_dirs = {f.split("/", 1)[0] for f in tracked if "/" in f}
    bad = []
    for md in _md_files():
        text = md.read_text()
        for mention in sorted(set(MENTION_RE.findall(text))):
            dirs = _mention_dirs(mention)
            if not dirs:
                bad.append(f"{md.name}: {mention} matches no directory")
                continue
            for d in dirs:
                name = d.name
                if name not in tracked_dirs:
                    bad.append(f"{md.name}: {name} exists but is not "
                               "git-tracked")
                    continue
                summ = f"{name}/summary.json"
                if summ not in tracked:
                    bad.append(f"{md.name}: {summ} is not git-tracked")
                    continue
                try:
                    json.loads((REPO / summ).read_text())
                except (OSError, ValueError) as e:
                    bad.append(f"{md.name}: {summ} unreadable/unparseable: "
                               f"{e}")
    assert not bad, (
        "docs cite results directories that are not committed runs "
        f"(aspirational citations are banned): {bad}"
    )


def test_no_orphan_results_dirs_matching_cited_globs():
    """A glob citation must not sweep in untracked scratch directories.

    If docs say `results_no_mlp_2d_*` and an untracked
    results_no_mlp_2d_scratch/ exists, the claim silently covers a dir that
    was never committed — ban that too.  (Exact-name citations are already
    covered by the tracked check above.)
    """
    tracked = _tracked_files()
    tracked_dirs = {f.split("/", 1)[0] for f in tracked if "/" in f}
    orphans = []
    for md in _md_files():
        for mention in set(MENTION_RE.findall(md.read_text())):
            if "*" not in mention and not mention.endswith("_"):
                continue
            for d in _mention_dirs(mention):
                if d.name not in tracked_dirs:
                    orphans.append(f"{md.name}: glob {mention} matches "
                                   f"untracked {d.name}")
    assert not orphans, f"cited globs match untracked dirs: {orphans}"
