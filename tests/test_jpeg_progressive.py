"""Progressive JPEG (SOF2, T.81 Annex G) — encoder emits libjpeg's
default scan script (spectral selection + successive approximation),
decoder reconstructs EXACTLY the coefficients of the equivalent
baseline stream, so progressive and baseline decodes of the same
pixels must be bit-identical.  Closes the 'progressive JPEG raises'
boundary carried since round 3 (the reference treats images as opaque
payloads; multimodal decode is this repo's addition)."""

import numpy as np
import pytest

from xpshacl_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w, seed):
    r = np.random.default_rng(seed)
    base = r.integers(0, 255, (4, 4, 3)).astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        y = np.linspace(0, 3, h)
        x = np.linspace(0, 3, w)
        yi = np.floor(y).astype(int)
        xi = np.floor(x).astype(int)
        yf = (y - yi)[:, None]
        xf = (x - xi)[None, :]
        y2 = np.minimum(yi + 1, 3)
        x2 = np.minimum(xi + 1, 3)
        img[..., c] = (base[np.ix_(yi, xi)][..., c] * (1 - yf) * (1 - xf)
                       + base[np.ix_(yi, x2)][..., c] * (1 - yf) * xf
                       + base[np.ix_(y2, xi)][..., c] * yf * (1 - xf)
                       + base[np.ix_(y2, x2)][..., c] * yf * xf)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("hw,sub,q", [
    ((24, 24), "444", 90),
    ((20, 28), "420", 75),   # padded MCU grid wider than the coded grid
    ((17, 19), "444", 50),   # odd dims
    ((33, 18), "420", 95),
    ((8, 8), "444", 90),     # single block
    ((40, 40), "420", 25),   # coarse quantization: long EOB runs
])
def test_progressive_equals_baseline(hw, sub, q):
    img = _smooth(*hw, seed=hw[0] * hw[1])
    base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
    prog = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub,
                                   progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_stream_is_sof2_with_many_scans():
    img = _smooth(24, 24, seed=5)
    payload = encode_jpeg(img, progressive=True)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    assert payload.count(b"\xff\xda") == 10  # libjpeg default script


def test_progressive_noise_dense_coefficients():
    # noise at high quality = dense AC coefficients, stressing ZRL /
    # refinement-run interleaving rather than EOB runs
    noise = np.random.default_rng(1).integers(
        0, 255, (24, 16, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(noise, quality=95))
    prog = decode_jpeg(encode_jpeg(noise, quality=95, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_flat_all_eob():
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, progressive=True)),
        decode_jpeg(encode_jpeg(flat)))


def test_progressive_restart_intervals():
    img = _smooth(32, 48, seed=7)
    with_rst = encode_jpeg(img, quality=80, subsampling="420",
                           progressive=True, restart_interval=3)
    assert b"\xff\xd0" in with_rst  # RST0 present in some scan
    assert np.array_equal(
        decode_jpeg(with_rst),
        decode_jpeg(encode_jpeg(img, quality=80, subsampling="420")))


def test_progressive_through_media_decoder():
    from xpshacl_ray.stages.multimodal import MediaDecoder

    img = _smooth(20, 30, seed=10)
    f_base = MediaDecoder()._decode_one("image/jpeg", encode_jpeg(img))
    f_prog = MediaDecoder()._decode_one(
        "image/jpeg", encode_jpeg(img, progressive=True))
    assert np.allclose(f_base, f_prog)
