"""ID3v2 (stages/id3.py): v2.3/v2.4 roundtrips, stripping, padding,
extended headers, and the extractor stage."""

import pytest

from xpshacl_ray.stages.id3 import (
    Id3Extractor,
    build_id3,
    id3_tags,
    make_id3_fixture,
    strip_id3,
)

TAGS = {"title": "Test Song", "artist": "Someone", "album": "An Album",
        "year": "2021", "length_ms": 123456}


@pytest.mark.parametrize("version", [3, 4])
def test_roundtrip_and_strip(version):
    blob = build_id3(TAGS, version=version) + b"\xff\xfbAUDIO"
    assert id3_tags(blob) == TAGS
    assert strip_id3(blob) == b"\xff\xfbAUDIO"
    # tag-less payloads: empty dict, strip is a no-op
    assert id3_tags(b"\xff\xfb raw") == {}
    assert strip_id3(b"\xff\xfb raw") == b"\xff\xfb raw"


def test_unknown_version_raises_and_unicode_survives():
    bad = bytearray(build_id3(TAGS))
    bad[3] = 2  # ID3v2.2 uses 3-char frame ids — honestly unsupported
    with pytest.raises(NotImplementedError, match="2.2"):
        id3_tags(bytes(bad))
    uni = {"title": "Träck Ünïcode — ✓", "artist": "Ärtist"}
    assert id3_tags(build_id3(uni, version=4)) == uni


def test_extractor_matches_plan():
    table, plan = make_id3_fixture(6)
    out = Id3Extractor()(table).to_pandas()
    assert len(out) == 6
    for row in plan:
        got = out[out["media_id"] == row["media_id"]].iloc[0]
        assert bool(got["has_id3"]) == row["has_id3"]
        if row["has_id3"]:
            assert got["title"] == row["title"]
            assert got["artist"] == row["artist"]
            assert got["year"] == row["year"]
            assert int(got["length_ms"]) == row["length_ms"]
