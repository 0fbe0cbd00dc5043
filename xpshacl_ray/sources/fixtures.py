"""Deterministic synthetic ``code_files`` fixtures (FIXTURES.md §1-2).

Engine analog of the reference's synthetic data generator
(``data/synthetic_data_generator.py:12-63``): clean rows + seeded violation
injection at known rates, so expected violation counts are exactly
computable.  Injection rates mirror the reference's 0.1/0.1/0.05/0.05
scheme plus the uniqueness/referential defects from FIXTURES.md:

- 10%  lang outside the allowed set            (C10, sh:in)
- 10%  content replaced by an overlong string  (C9, sh:maxLength)
- 5%   commit truncated/uppercased             (C5/C8, sh:pattern)
- 5%   duplicate (repo,path,commit) appended   (C2, maxCount/uniqueness)
- 5%   commit absent from the commits table    (C4, referential)
- 2%   path set to empty string                (C1, required/minCount)

Every injected defect is recorded in a sidecar list so tests can assert
exact violation rows.  Seed fixed (default 42); pure numpy — no network.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Set

import numpy as np
import pyarrow as pa

LANGS = ["python", "java", "c", "cpp", "go", "rust", "js"]
LANG_WEIGHTS = [0.3, 0.2, 0.1, 0.1, 0.12, 0.08, 0.1]
LANG_EXT = {"python": "py", "java": "java", "c": "c", "cpp": "cc", "go": "go",
            "rust": "rs", "js": "js"}
BAD_LANGS = ["klingon", "cobol77", "x"]
WORDS = [
    "alpha", "beta", "gamma", "delta", "engine", "core", "util", "data",
    "index", "batch", "stream", "shard", "merge", "hash", "vector", "graph",
]
MAX_CONTENT_LEN = 4000


@dataclass
class ExpectedViolation:
    row_index: int
    kind: str  # in | maxlength | pattern | duplicate | referential | required
    column: str
    value: str


@dataclass
class CodeFixture:
    table: pa.Table
    commits: pa.Table
    expected: List[ExpectedViolation] = field(default_factory=list)

    def expected_by_kind(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for e in self.expected:
            out[e.kind] = out.get(e.kind, 0) + 1
        return out


def _content(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(WORDS), size=n_words)
    return " ".join(WORDS[i] for i in idx)


def generate_code_files(n_rows: int = 10_000, seed: int = 42,
                        skew_megarepo: bool = True) -> CodeFixture:
    """Seeded code_files table + commits dim + expected-violations sidecar."""
    rng = np.random.default_rng(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_rows):
        if skew_megarepo and rng.random() < 0.3:
            repo = "org0/megarepo"  # ~30% of rows: the skew fixture
        else:
            repo = f"org{i % 7}/repo{i % 53}"
        lang = LANGS[rng.choice(len(LANGS), p=LANG_WEIGHTS)]
        w1, w2 = WORDS[rng.integers(len(WORDS))], WORDS[rng.integers(len(WORDS))]
        path = f"src/{w1}/{w2}_{i}.{LANG_EXT[lang]}"
        commit = "".join(rng.choice(list("0123456789abcdef"), size=40))
        content = _content(rng, int(rng.integers(4, 400)))
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)

    valid_commits = sorted(set(commits))
    expected: List[ExpectedViolation] = []

    def sample(rate: float, exclude: Set[int]) -> np.ndarray:
        pool = np.array([i for i in range(n_rows) if i not in exclude])
        k = int(round(rate * n_rows))
        return rng.choice(pool, size=min(k, len(pool)), replace=False)

    tainted: Set[int] = set()
    # 10% bad lang (C10)
    for i in sample(0.10, tainted):
        langs[i] = BAD_LANGS[int(rng.integers(len(BAD_LANGS)))]
        expected.append(ExpectedViolation(int(i), "in", "lang", langs[i]))
        tainted.add(int(i))
    # 10% overlong content (C9)
    for i in sample(0.10, tainted):
        contents[i] = "x" * (MAX_CONTENT_LEN + 1 + int(rng.integers(500)))
        expected.append(ExpectedViolation(int(i), "maxlength", "content",
                                          f"len={len(contents[i])}"))
        tainted.add(int(i))
    # 5% broken commit hash (C5/C8)
    for i in sample(0.05, tainted):
        commits[i] = commits[i][:12].upper()
        expected.append(ExpectedViolation(int(i), "pattern", "commit", commits[i]))
        tainted.add(int(i))
    # 5% dangling commit (C4) — valid hex form but absent from commits dim
    for i in sample(0.05, tainted):
        commits[i] = "f" * 39 + str(int(rng.integers(10)))
        expected.append(ExpectedViolation(int(i), "referential", "commit",
                                          commits[i]))
        tainted.add(int(i))
    # 2% empty path (C1)
    for i in sample(0.02, tainted):
        paths[i] = ""
        expected.append(ExpectedViolation(int(i), "required", "path", ""))
        tainted.add(int(i))
    # 5% duplicate natural keys appended (C2)
    dup_src = rng.choice(
        np.array([i for i in range(n_rows) if i not in tainted]),
        size=int(round(0.05 * n_rows)), replace=False)
    for i in dup_src:
        repos.append(repos[i])
        paths.append(paths[i])
        commits.append(commits[i])
        langs.append(langs[i])
        contents.append(contents[i])
        expected.append(ExpectedViolation(int(i), "duplicate", "path",
                                          f"{repos[i]}/{paths[i]}"))

    table = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )
    commits_dim = pa.table(
        {
            "commit": pa.array(valid_commits, pa.string()),
            "author_ts": pa.array(
                np.datetime64("2024-01-01", "us")
                + np.arange(len(valid_commits)).astype("timedelta64[us]")
            ),
        }
    )
    return CodeFixture(table=table, commits=commits_dim, expected=expected)


def oracle_sha256(fixture: CodeFixture) -> List[str]:
    """Independently computed content sha256 — the per-row invariant
    (BASELINE.json: "content sha256 equality")."""
    return [
        hashlib.sha256(v.encode("utf-8")).hexdigest()
        for v in fixture.table["content"].to_pylist()
    ]
