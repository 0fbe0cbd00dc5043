"""TIFF codec (stages/tiff.py): IFD walk, strips, PackBits + TIFF-LZW
(early change, 12-bit clear), Predictor 2, gray/RGB/palette
photometrics, roundtrips and honest boundaries."""

import numpy as np
import pytest

from xpshacl_ray.stages import tiff


def test_rgb_uncompressed_single_and_multi_strip():
    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for rps in (None, 4, 1):
        dec = tiff.decode_tiff(tiff.encode_tiff(img, rows_per_strip=rps))
        assert np.array_equal(dec, img), rps


def test_packbits_strips_and_raw_fuzz():
    rng = np.random.default_rng(52)
    img = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    dec = tiff.decode_tiff(tiff.encode_tiff(img, compression=32773,
                                            rows_per_strip=5))
    assert np.array_equal(dec, img)
    for _ in range(80):
        n = int(rng.integers(0, 400))
        data = bytes(rng.integers(0, 4, size=n, dtype=np.uint8))
        assert tiff.packbits_decode(tiff.packbits_encode(data), n) == data


def test_lzw_with_predictor_and_width_growth():
    rng = np.random.default_rng(53)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for pred in (1, 2):
        dec = tiff.decode_tiff(tiff.encode_tiff(img, compression=5,
                                                rows_per_strip=6,
                                                predictor=pred))
        assert np.array_equal(dec, img), pred
    # enough data to walk the code width up and trigger the 12-bit clear
    big = rng.integers(0, 8, size=(200, 120, 3), dtype=np.uint8)
    dec = tiff.decode_tiff(tiff.encode_tiff(big, compression=5))
    assert np.array_equal(dec, big)
    # gradient compresses well under predictor 2
    grad = np.repeat(np.arange(0, 200, dtype=np.uint8)[None, :, None],
                     3, axis=2).repeat(40, axis=0)
    plain = tiff.encode_tiff(grad, compression=5, predictor=1)
    pred2 = tiff.encode_tiff(grad, compression=5, predictor=2)
    assert len(pred2) < len(plain)
    assert np.array_equal(tiff.decode_tiff(pred2), grad)


def test_lzw_raw_roundtrip_fuzz():
    rng = np.random.default_rng(54)
    for _ in range(30):
        n = int(rng.integers(0, 3000))
        data = bytes(rng.integers(0, 16, size=n, dtype=np.uint8))
        assert tiff.tiff_lzw_decode(tiff.tiff_lzw_encode(data), n) == data


def test_gray_palette_and_bilevel():
    rng = np.random.default_rng(55)
    g = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    dec = tiff.decode_tiff(tiff.encode_tiff(g, photometric=1))
    assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))
    # WhiteIsZero inverts
    dec0 = tiff.decode_tiff(tiff.encode_tiff(g, photometric=0))
    assert np.array_equal(dec0, np.repeat((255 - g)[:, :, None], 3, axis=2))
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, size=(8, 9), dtype=np.uint8)
    dec = tiff.decode_tiff(tiff.encode_tiff(idx, photometric=3,
                                            colormap=pal))
    assert np.array_equal(dec, pal[idx])


def test_big_endian_and_16bit_decode():
    import struct

    # hand-build a tiny big-endian 16-bit gray TIFF: 2x2, one strip
    vals = np.array([[0x1234, 0xABCD], [0x0102, 0xFFEE]], dtype=np.uint16)
    data = vals.astype(">u2").tobytes()
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, None), (277, 3, 1, 1),
        (278, 3, 1, 2), (279, 4, 1, len(data)),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + len(entries) * 12 + 4
    body = struct.pack(">H", len(entries))
    for tag, typ, count, val in entries:
        v = data_off if val is None else val
        if typ == 3:
            packed = struct.pack(">H", v) + b"\x00\x00"
        else:
            packed = struct.pack(">I", v)
        body += struct.pack(">HHI", tag, typ, count) + packed
    body += struct.pack(">I", 0)
    payload = b"MM" + struct.pack(">HI", 42, 8) + body + data
    dec = tiff.decode_tiff(payload)
    want = (vals >> 8).astype(np.uint8)
    assert np.array_equal(dec, np.repeat(want[:, :, None], 3, axis=2))


def test_honest_boundaries():
    rng = np.random.default_rng(56)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = bytearray(tiff.encode_tiff(img))
    with pytest.raises(ValueError, match="TIFF"):
        tiff.decode_tiff(b"XX" + bytes(payload)[2:])
    # unsupported compression surfaces with the plug-in point named
    import struct
    pos = bytes(payload).find(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", payload, pos + 8, 7)  # JPEG-in-TIFF
    with pytest.raises(NotImplementedError, match="compression 7"):
        tiff.decode_tiff(bytes(payload))


def test_media_decoder_integration():
    from xpshacl_ray.stages.multimodal import MediaDecoder, image_features

    rng = np.random.default_rng(57)
    img = rng.integers(0, 256, size=(15, 10, 3), dtype=np.uint8)
    payload = tiff.encode_tiff(img, compression=5, predictor=2,
                               rows_per_strip=4)
    f = MediaDecoder()._decode_one("image/tiff", payload)
    assert np.abs(f - image_features(img)).max() < 1e-12  # lossless
