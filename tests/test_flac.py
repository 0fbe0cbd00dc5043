"""FLAC codec (stages/flac.py): bit-exact roundtrips through every
subframe type, stereo decorrelation mode, Rice escape, wasted bits and
CRC/MD5 integrity checks."""

import numpy as np
import pytest

from xpshacl_ray.stages import flac


def _tone(n=10000, rate=8000, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(n)
    return np.clip(x * 32767, -32768, 32767).astype(np.int64)


def test_mono_roundtrip_bit_exact_and_compresses():
    x = _tone()
    payload = flac.encode_flac(x, rate=8000, blocksize=4096)
    info = flac.parse_streaminfo(payload)
    assert (info["sample_rate"], info["channels"],
            info["bits_per_sample"], info["total_samples"]) \
        == (8000, 1, 16, len(x))
    dec, rate = flac.decode_flac(payload)
    assert rate == 8000 and np.array_equal(dec[:, 0], x)
    assert len(payload) < len(x) * 2  # actually compresses the tone


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_stereo_decorrelation_modes(mode):
    x = _tone(6000)
    st = np.stack([x, np.roll(x, 3)], axis=1)
    payload = flac.encode_flac(st, rate=8000, blocksize=1024,
                               stereo_mode=mode)
    dec, _ = flac.decode_flac(payload)
    assert np.array_equal(dec, st)


def test_lpc_subframes_bit_exact():
    rng = np.random.default_rng(7)
    sm = np.cumsum(rng.standard_normal(8000))
    sm = np.clip(sm / np.abs(sm).max() * 20000, -32768, 32767).astype(
        np.int64)
    p_fix = flac.encode_flac(sm, rate=8000, blocksize=2048)
    p_lpc = flac.encode_flac(sm, rate=8000, blocksize=2048, lpc_order=8)
    assert len(p_lpc) != len(p_fix)  # the LPC path was actually taken
    dec, _ = flac.decode_flac(p_lpc)
    assert np.array_equal(dec[:, 0], sm)


def test_constant_verbatim_escape_and_wasted_bits():
    # constant subframe
    c = np.full(5000, -123, dtype=np.int64)
    dec, _ = flac.decode_flac(flac.encode_flac(c, rate=16000))
    assert np.array_equal(dec[:, 0], c)
    # white noise forces Rice-escape partitions
    rng = np.random.default_rng(8)
    noise = rng.integers(-32768, 32768, size=3000).astype(np.int64)
    dec, _ = flac.decode_flac(flac.encode_flac(noise, blocksize=1024))
    assert np.array_equal(dec[:, 0], noise)
    # all samples multiples of 8 → 3 wasted bits, smaller stream
    wb = (_tone() // 8) * 8
    p_wb = flac.encode_flac(wb, blocksize=4096)
    p_full = flac.encode_flac(_tone(), blocksize=4096)
    assert len(p_wb) < len(p_full)
    dec, _ = flac.decode_flac(p_wb)
    assert np.array_equal(dec[:, 0], wb)


@pytest.mark.parametrize("bps,scale", [(8, 127), (24, (1 << 23) - 1)])
def test_other_bit_depths(bps, scale):
    t = np.arange(4000) / 8000
    v = np.clip(0.7 * np.sin(2 * np.pi * 300 * t) * scale,
                -scale - 1, scale).astype(np.int64)
    payload = flac.encode_flac(v, rate=8000, bps=bps, blocksize=1024,
                               lpc_order=4)
    dec, _ = flac.decode_flac(payload)
    assert np.array_equal(dec[:, 0], v)


def test_integrity_checks_fire():
    x = _tone(3000)
    payload = bytearray(flac.encode_flac(x, blocksize=1024))
    with pytest.raises(ValueError, match="fLaC"):
        flac.decode_flac(b"RIFF" + bytes(payload)[4:])
    # flip one bit inside the first frame's audio data → CRC-16 or a
    # structural error, never silent corruption
    info = flac.parse_streaminfo(bytes(payload))
    payload[info["audio_offset"] + 40] ^= 0x10
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(payload))
    # MD5 covers cross-frame corruption even if a frame parses
    assert flac._audio_md5(x[:, None], 16) != b"\x00" * 16


def test_utf8_framenumber_coding_roundtrip():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              0x3FFFFFF, 2 ** 31]:
        enc = flac._utf8_encode(n)
        r = flac._BitReader(enc)
        assert flac._utf8_decode(r) == n


def test_media_decoder_integration():
    from xpshacl_ray.stages.multimodal import (
        MediaDecoder,
        audio_features,
    )

    rng = np.random.default_rng(9)
    t = np.arange(2000) / 8000
    x = 0.5 * np.sin(2 * np.pi * 330 * t) + 0.01 * rng.standard_normal(2000)
    payload = flac.encode_flac_audio(x, 8000, blocksize=512, lpc_order=4)
    f = MediaDecoder()._decode_one("audio/flac", payload)
    assert f.shape == (MediaDecoder.FEATURE_DIM,)
    # lossless: features match the 16-bit-quantized source exactly
    # (encode_flac_audio quantizes by truncation, mirror it here)
    q = np.trunc(np.clip(x * 32767, -32768, 32767)) / 32768.0
    assert np.abs(f - audio_features(q, 8000)).max() < 1e-12


# ---------------------------------------------------------------------------
# property-based fuzz (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=1500),
       st.sampled_from([192, 256, 577, 1024]),
       st.sampled_from([0, 4]))
def test_flac_roundtrip_fuzz_mono(vals, blocksize, lpc_order):
    x = np.array(vals, dtype=np.int64)
    payload = flac.encode_flac(x, rate=44100, blocksize=blocksize,
                               lpc_order=lpc_order)
    dec, rate = flac.decode_flac(payload)
    assert rate == 44100
    assert np.array_equal(dec[:, 0], x)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(-32768, 32767),
                          st.integers(-32768, 32767)),
                min_size=2, max_size=800),
       st.sampled_from(["independent", "left_side", "right_side",
                        "mid_side"]))
def test_flac_roundtrip_fuzz_stereo(pairs, mode):
    st_arr = np.array(pairs, dtype=np.int64)
    payload = flac.encode_flac(st_arr, rate=8000, blocksize=256,
                               stereo_mode=mode)
    dec, _ = flac.decode_flac(payload)
    assert np.array_equal(dec, st_arr)
