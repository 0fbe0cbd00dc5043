"""EXIF (stages/exif.py): APP1/TIFF-IFD parse, all 8 orientations,
metadata stripping, writer roundtrips, and the extractor stage."""

import numpy as np
import pytest

from xpshacl_ray.stages import exif
from xpshacl_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _img(h=24, w=36):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(np.stack([yy * 8, xx * 5, (yy + xx) * 3], -1),
                   0, 255).astype(np.uint8)


def test_exif_write_parse_roundtrip():
    base = encode_jpeg(_img(), quality=92)
    tags = {"make": "SynthCam", "model": "SC-1000 Ultra",
            "orientation": 6, "datetime": "2026:08:19 12:00:00",
            "software": "xr", "exposure_time": 1 / 250, "iso": 200,
            "datetime_original": "2026:08:19 11:59:58",
            "pixel_x_dimension": 36, "pixel_y_dimension": 24}
    jp = exif.inject_app1(base, exif.build_exif_app1(tags))
    got = exif.exif_tags(jp)
    for k, v in tags.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v)
        else:
            assert got[k] == v
    # APP1 does not disturb the image data
    assert np.array_equal(decode_jpeg(jp), decode_jpeg(base))
    assert exif.exif_tags(base) == {}  # no-EXIF → empty, not an error


def test_all_eight_orientations_invert():
    rng = np.random.default_rng(91)
    src = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for o in range(1, 9):
        k, mirror = exif._ORIENT[o]
        stored = np.rot90(src, -k)  # what the camera wrote
        if mirror:
            stored = stored[:, ::-1]
        assert np.array_equal(exif.apply_orientation(stored, o), src), o
    # oriented decode transposes dims for the 90°-family tags
    jp = exif.inject_app1(encode_jpeg(_img(), quality=92),
                          exif.build_exif_app1({"orientation": 6}))
    assert exif.decode_jpeg_oriented(jp).shape == (36, 24, 3)


def test_strip_exif_removes_metadata_keeps_pixels():
    base = encode_jpeg(_img(), quality=92)
    jp = exif.inject_app1(base, exif.build_exif_app1(
        {"make": "X", "orientation": 3}))
    stripped = exif.strip_exif(jp)
    assert exif.exif_tags(stripped) == {}
    assert np.array_equal(decode_jpeg(stripped), decode_jpeg(base))
    assert len(stripped) < len(jp)
    with pytest.raises(ValueError, match="JPEG"):
        exif.exif_tags(b"not a jpeg")


def test_extractor_stage_and_fixture_plan():
    table, plan = exif.make_exif_fixture(8)
    out = exif.ExifExtractor()(table).to_pandas()
    for row in plan:
        got = out[out["media_id"] == row["media_id"]].iloc[0]
        assert bool(got["has_exif"]) == row["has_exif"]
        if row["has_exif"]:
            assert got["make"] == row["make"]
            assert int(got["orientation"]) == row["orientation"]
            assert int(got["iso"]) == row["iso"]
        else:
            assert got["make"] is None or got["make"] != got["make"]
