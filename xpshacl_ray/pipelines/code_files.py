"""The flagship pipeline: validating a source-code Parquet table.

This is the north-star workload (BASELINE.json input_hint): a table
``(repo, path, commit, lang, content)`` at 10^12-file scale, validated by
compiled constraint predicates over zero-copy Arrow batches with
per-partition stats, lineage manifests and resumability.

The default spec mirrors the synthetic fixture's injected defects
(FIXTURES.md §1; rates mirror the reference's
data/synthetic_data_generator.py:43-59):

==========================  =========================================
constraint                  defect caught
==========================  =========================================
InSet(lang)                 lang outside the allowed set        (C10)
MaxLength(content)          overlong content                    (C9)
Pattern(commit)             malformed commit hash               (C5/C8)
Required(path)              empty path                          (C1)
MaxCount((repo,path,commit)) duplicate file-at-commit rows      (C2/C11)
Referential(commit)         commit absent from commits dim      (C4)
==========================  =========================================
"""

from __future__ import annotations

from typing import Optional, Sequence


from ..context import DomainRule
from ..sources.fixtures import LANGS, MAX_CONTENT_LEN
from ..spec import (
    InSet,
    MaxCount,
    MaxLength,
    Pattern,
    Referential,
    Required,
    ValidationSpec,
)
from ..stages.stats import StatsConfig
from .validate import ValidationEngine

COMMIT_RE = "^[0-9a-f]{40}$"


def code_files_spec(
    allowed_langs: Sequence[str] = tuple(LANGS),
    max_content_len: int = MAX_CONTENT_LEN,
) -> ValidationSpec:
    return ValidationSpec(
        constraints=[
            InSet(column="lang", allowed=list(allowed_langs),
                  shape_id="http://xpshacl.org/#LangShape"),
            MaxLength(column="content", max_length=max_content_len,
                      shape_id="http://xpshacl.org/#ContentShape"),
            Pattern(column="commit", pattern=COMMIT_RE,
                    shape_id="http://xpshacl.org/#CommitShape"),
            Required(column="path",
                     shape_id="http://xpshacl.org/#PathShape"),
            MaxCount(column="content", group_by=["repo", "path", "commit"],
                     max_count=1,
                     shape_id="http://xpshacl.org/#UniqueFileShape"),
            Referential(column="commit", ref_table="commits",
                        ref_column="commit",
                        shape_id="http://xpshacl.org/#KnownCommitShape"),
        ],
        id_columns=["row_id", "repo", "path", "commit", "content_sha256"],
        focus_template="file://{repo}/{path}@{commit}",
    )


def code_files_stats_config(salt_buckets: int = 0) -> StatsConfig:
    """Per-(repo,lang) profile: the north-star stats keys (skew: salted)."""
    return StatsConfig(
        group_keys=["repo", "lang"],
        numeric_cols=["content_len"],
        categorical_cols=["lang"],
        distinct_cols=["path"],
        salt_buckets=salt_buckets,
    )


def default_rules() -> list:
    return [
        DomainRule("http://xpshacl.org/#rule_lang", "lang",
                   "Allowed languages",
                   "Files must be written in a supported language."),
        DomainRule("http://xpshacl.org/#rule_commit", "commit",
                   "Commit integrity",
                   "Commits must be 40-char lowercase hex and known to the "
                   "commit manifest."),
    ]


def build_engine(
    kg_path: Optional[str] = None,
    languages: Sequence[str] = ("en",),
    allowed_langs: Sequence[str] = tuple(LANGS),
    max_content_len: int = MAX_CONTENT_LEN,
) -> ValidationEngine:
    return ValidationEngine(
        code_files_spec(allowed_langs, max_content_len),
        rules=default_rules(),
        kg_path=kg_path,
        languages=languages,
    )
