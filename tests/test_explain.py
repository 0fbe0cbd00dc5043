"""Explainer + KG cache tests.

Mirrors the reference's KG ledger pinning (tests/test_violation_kg.py:25-125):
9 payload fields per record, has/get round-trip, suggestions `\\n\\n`
separator round-trip, signature→URI stability, idempotent re-add with model
overwrite.
"""

import os

import pyarrow as pa
import pytest

from xpshacl_ray.explain import (
    KG_FIELDS,
    SUGGESTION_SEPARATOR,
    ExplainerActor,
    TemplateExplanationGenerator,
    ViolationKnowledgeGraph,
    merge_kg_updates,
)
from xpshacl_ray.model import SH, ViolationType, signature_key, signature_string


def viol(vtype="value_range", path="http://example.org/age"):
    sig = signature_string(
        f"{SH}MinInclusiveConstraintComponent", path,
        ViolationType.VALUE_RANGE, {})
    return {
        "signature": sig,
        "signature_key": signature_key(sig),
        "constraint_id": f"{SH}MinInclusiveConstraintComponent",
        "violation_type": vtype,
        "property_path": path,
        "context": '{"minInclusive": 0}',
        "message": "Value is not >= 0",
    }


def test_nine_field_ledger():
    # parity with the reference's 9-triple full add
    # (tests/test_violation_kg.py:44-62)
    assert len(KG_FIELDS) == 9


def test_generator_deterministic_and_multilang():
    g = TemplateExplanationGenerator()
    out = g.generate_explanation_output(viol(), languages=["en", "de"])
    assert set(out) == {"en", "de"}
    en_expl, en_sugg = out["en"]
    de_expl, _ = out["de"]
    assert "range" in en_expl
    assert de_expl.startswith("[de] ")
    assert SUGGESTION_SEPARATOR in en_sugg  # \n\n joins suggestions
    # deterministic
    assert g.generate_explanation_output(viol(), ["en"])["en"] == out["en"]


def test_kg_add_get_roundtrip(tmp_path):
    kg = ViolationKnowledgeGraph()
    v = viol()
    kg.add_violation(v["signature_key"], v, "expl", "s1\n\ns2", "en")
    assert kg.has_violation(v["signature_key"], "en")
    assert not kg.has_violation(v["signature_key"], "de")
    rec = kg.get_explanation(v["signature_key"], "en")
    assert rec["explanation"] == "expl"
    assert rec["suggestions"].split(SUGGESTION_SEPARATOR) == ["s1", "s2"]
    assert rec["signature_uri"].startswith("http://xpshacl.org/#sig_")
    # idempotent re-add: only the model name refreshes
    kg.add_violation(v["signature_key"], v, "other", "other", "en",
                     model="m2")
    rec2 = kg.get_explanation(v["signature_key"], "en")
    assert rec2["explanation"] == "expl"
    assert rec2["model"] == "m2"
    # save / load round-trip
    p = kg.save(str(tmp_path / "kg.parquet"))
    kg2 = ViolationKnowledgeGraph(p)
    assert len(kg2) == 1
    assert kg2.get_explanation(v["signature_key"], "en")["explanation"] == "expl"


def test_signature_uri_stable_and_distinct():
    v1, v2 = viol(), viol(path="http://example.org/other")
    kg = ViolationKnowledgeGraph()
    kg.add_violation(v1["signature_key"], v1, "e", "s", "en")
    kg.add_violation(v2["signature_key"], v2, "e", "s", "en")
    uris = {r["signature_uri"] for r in kg._cache.values()}
    assert len(uris) == 2


def test_explainer_actor_cache_hit_flow(tmp_path):
    v = viol()
    batch = pa.Table.from_pylist([v])
    # cold: no cache
    actor = ExplainerActor(kg_path=None, languages=["en", "fr"])
    out = actor(batch).to_pylist()
    assert len(out) == 2
    assert {r["language"] for r in out} == {"en", "fr"}
    assert all(r["cache_hit"] == "false" for r in out)
    # persist, then warm actor sees hits
    kg = ViolationKnowledgeGraph()
    merge_kg_updates(kg, actor(batch))  # actor's in-memory kg now has entries
    p = kg.save(str(tmp_path / "kg.parquet"))
    warm = ExplainerActor(kg_path=p, languages=["en", "fr"])
    out2 = warm(batch).to_pylist()
    assert all(r["cache_hit"] == "true" for r in out2)
    assert out2[0]["explanation"] == out[0]["explanation"]


def test_llm_backend_error_in_band():
    # no endpoint configured → the reference's exact in-band error shape
    # (tests/test_explanation_generator.py:130-159 analog)
    from xpshacl_ray.explain import LLMExplanationGenerator

    g = LLMExplanationGenerator(base_url=None, api_key=None)
    g.base_url = None  # ensure env doesn't leak in
    out = g.generate_explanation_output(viol(), ["en"])
    expl, sugg = out["en"]
    assert expl.startswith("Error generating explanation in en:")
    assert sugg.startswith("Error generating correction suggestions in en:")


def test_merge_kg_first_writer_wins():
    v = viol()
    kg = ViolationKnowledgeGraph()
    kg.add_violation(v["signature_key"], v, "original", "s", "en")
    new = pa.Table.from_pylist(
        [dict(kg.get_explanation(v["signature_key"], "en"),
              explanation="overwrite")]
    )
    merge_kg_updates(kg, new)
    assert kg.get_explanation(v["signature_key"], "en")["explanation"] == "original"
