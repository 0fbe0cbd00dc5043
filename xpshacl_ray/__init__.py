"""xpshacl_ray — a Ray-Data-native schema + constraint validation engine.

From-scratch re-expression of xpSHACL's shape-graph validation semantics
(reference: gcpdev/xpshacl) as ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches.  See SURVEY.md for the
operator inventory and the reference file:line parity citations.

This package NEVER calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

from .context import ContextRetriever, DomainContext, DomainRule
from .explain import (
    ExplainerActor,
    TemplateExplanationGenerator,
    ViolationKnowledgeGraph,
)
from .justify import build_justification_tree
from .model import (
    JustificationNode,
    JustificationTree,
    ViolationType,
    classify_violation_type,
    signature_key,
    signature_string,
    signature_uri,
)
from .pipelines.validate import ValidationEngine, ValidationResult
from .spec import (
    And,
    CustomConstraint,
    Datatype,
    Disjoint,
    Equals,
    GroupedSparql,
    GroupPredicate,
    Closed,
    NodeConformance,
    InSet,
    LessThan,
    LessThanOrEquals,
    MaxCount,
    MaxExclusive,
    MaxInclusive,
    MaxLength,
    MinCount,
    MinExclusive,
    MinInclusive,
    MinLength,
    NodeKind,
    LanguageIn,
    UniqueLang,
    Not,
    Or,
    Pattern,
    Referential,
    Required,
    SqlCheck,
    ValidationSpec,
    Xone,
    compile_spec,
)

__version__ = "0.1.0"
