"""FLAC (Free Lossless Audio Codec) decode/encode in pure numpy+stdlib.

Implements the public xiph.org format spec (RFC 9639): ``fLaC`` marker,
STREAMINFO metadata, frame headers (UTF-8 frame numbers, CRC-8), all
four subframe types — CONSTANT, VERBATIM, FIXED orders 0–4, LPC with
quantized coefficients — Rice/Rice2 partitioned residuals with escape
codes, wasted bits, stereo decorrelation (left/side, right/side,
mid/side), and the frame CRC-16.  Decoded audio is verified against
the STREAMINFO MD5 when present.

The encoder emits fixed-predictor frames (order chosen per frame by
residual magnitude, Rice parameter per partition, escape fallback) and
optional mid/side stereo — enough to roundtrip-test every decoder path
bit-exactly without fixtures from external tools.  The reference treats
audio as opaque bytes; the codec surface is this engine's addition
(same contract as :mod:`.jpeg` / :mod:`.mp4`).
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional, Tuple

import numpy as np

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tab[i] = c & mask
    return tab


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit-level IO
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over a byte string; unary scans use a
    precomputed one-bit index (numpy) instead of per-bit loops."""

    def __init__(self, data: bytes):
        self.data = data
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.bits):
            raise ValueError("FLAC bitstream truncated")
        chunk = self.bits[self.pos:end]
        self.pos = end
        val = 0
        for b in chunk:  # n ≤ 36 in practice
            val = (val << 1) | int(b)
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        if i >= len(self.ones):
            raise ValueError("FLAC bitstream truncated in unary code")
        stop = int(self.ones[i])
        q = stop - self.pos
        self.pos = stop + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    def __init__(self):
        self.buf: List[int] = []  # bits

    def write(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.buf.append((val >> i) & 1)

    def write_signed(self, val: int, n: int) -> None:
        self.write(val & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        self.buf.extend([0] * q)
        self.buf.append(1)

    def align(self) -> None:
        while len(self.buf) % 8:
            self.buf.append(0)

    def tobytes(self) -> bytes:
        self.align()
        return np.packbits(np.array(self.buf, dtype=np.uint8)).tobytes()


# ---------------------------------------------------------------------------
# frame-number UTF-8 coding (FLAC reuses the UTF-8 scheme for integers)
# ---------------------------------------------------------------------------


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    for total in range(2, 8):
        if n < (1 << (total * 5 + 1)) or total == 7:
            lead = (0xFF << (8 - total)) & 0xFF
            shifts = (total - 1) * 6
            out.append(lead | (n >> shifts))
            for s in range(shifts - 6, -1, -6):
                out.append(0x80 | ((n >> s) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    # leading-one count = total byte count; 10xxxxxx is an invalid lead
    total = 0
    for i in range(8):
        if not (b0 >> (7 - i)) & 1:
            total = i
            break
    if total < 2:
        raise ValueError("bad UTF-8-coded frame number")
    n_bytes = total - 1  # continuation bytes
    val = b0 & (0x3F >> n_bytes)
    for _ in range(n_bytes):
        c = r.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        val = (val << 6) | (c & 0x3F)
    return val


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}


def parse_streaminfo(payload: bytes) -> dict:
    """``fLaC`` header walk → STREAMINFO fields + audio-data offset."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos = 4
    info: Optional[dict] = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        head = payload[pos]
        last, btype = head >> 7, head & 0x7F
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            r = _BitReader(body)
            info = {
                "min_blocksize": r.read(16), "max_blocksize": r.read(16),
                "min_framesize": r.read(24), "max_framesize": r.read(24),
                "sample_rate": r.read(20),
                "channels": r.read(3) + 1,
                "bits_per_sample": r.read(5) + 1,
                "total_samples": r.read(36),
                "md5": body[18:34],
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    info["audio_offset"] = pos
    return info


def _decode_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition order does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    k = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            for i in range(n):
                out[k] = r.read_signed(raw) if raw else 0
                k += 1
        else:
            for i in range(n):
                q = r.unary()
                v = (q << param) | r.read(param)
                out[k] = (v >> 1) ^ -(v & 1)  # zigzag
                k += 1
    return out


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(blocksize, r.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coef):
                pred += c * out[i - 1 - j]
            out[i] = pred + resid[i - order]
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coef = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coef[j] * int(out[i - 1 - j])
            out[i] = (pred >> shift) + resid[i - order]
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted if wasted else out


def decode_flac(payload: bytes,
                verify_md5: bool = True) -> Tuple[np.ndarray, int]:
    """FLAC bytes → ``((n, channels) int32 samples, rate)`` — all frame
    types, CRC-8/CRC-16 checked, MD5-verified against STREAMINFO."""
    info = parse_streaminfo(payload)
    rate, nch = info["sample_rate"], info["channels"]
    bps_default = info["bits_per_sample"]
    total = info["total_samples"]
    r = _BitReader(payload[info["audio_offset"]:])
    chans: List[np.ndarray] = [np.empty(0, np.int64) for _ in range(nch)]
    got = 0
    while (total == 0 or got < total) and r.pos + 16 <= len(r.bits):
        frame_start = r.byte_pos()
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        r.read(1)  # blocking strategy (frame vs sample numbering)
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        _utf8_decode(r)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise ValueError("invalid sample rate code")
        bps = _SAMPLE_SIZE_CODES.get(size_code, bps_default)
        header_crc = r.read(8)
        if crc8(payload[info["audio_offset"] + frame_start:
                        info["audio_offset"] + r.byte_pos() - 1]) \
                != header_crc:
            raise ValueError("frame header CRC-8 mismatch")
        if chan_code < 8:
            if chan_code + 1 != nch:
                raise ValueError("frame/STREAMINFO channel mismatch")
            sub = [_decode_subframe(r, blocksize, bps) for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if chan_code == 8:  # left/side
                left = _decode_subframe(r, blocksize, bps)
                side = _decode_subframe(r, blocksize, bps + 1)
                sub = [left, left - side]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(r, blocksize, bps + 1)
                right = _decode_subframe(r, blocksize, bps)
                sub = [side + right, right]
            else:  # mid/side
                mid = _decode_subframe(r, blocksize, bps)
                side = _decode_subframe(r, blocksize, bps + 1)
                m2 = (mid << 1) | (side & 1)
                sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {chan_code}")
        r.align()
        frame_crc = r.read(16)
        body = payload[info["audio_offset"] + frame_start:
                       info["audio_offset"] + r.byte_pos() - 2]
        if crc16(body) != frame_crc:
            raise ValueError("frame CRC-16 mismatch")
        for c in range(nch):
            chans[c] = np.concatenate([chans[c], sub[c]])
        got += blocksize
        if total == 0 and r.byte_pos() >= len(r.data):
            break
    out = np.stack(chans, axis=1)
    if total:
        out = out[:total]
    if verify_md5 and info["md5"] != b"\x00" * 16:
        if _audio_md5(out, bps_default) != info["md5"]:
            raise ValueError("decoded audio MD5 mismatch")
    return out.astype(np.int32), rate


def _audio_md5(samples: np.ndarray, bps: int) -> bytes:
    """MD5 of the interleaved little-endian audio exactly as the spec
    hashes it (bps/8 bytes per sample)."""
    nbytes = (bps + 7) // 8
    inter = samples.astype(np.int64).reshape(-1)
    h = hashlib.md5()
    buf = np.zeros((len(inter), nbytes), dtype=np.uint8)
    v = np.where(inter < 0, inter + (1 << (8 * nbytes)), inter)
    for b in range(nbytes):
        buf[:, b] = (v >> (8 * b)) & 0xFF
    h.update(buf.tobytes())
    return h.digest()


# ---------------------------------------------------------------------------
# encoder (fixed predictors, Rice partitions, optional mid/side)
# ---------------------------------------------------------------------------


def _levinson(ac: np.ndarray, order: int) -> Optional[np.ndarray]:
    """Autocorrelation → LPC coefficients (prediction
    x̂[i] = Σ lpc[j]·x[i-1-j]), the classic Levinson-Durbin recursion."""
    err = float(ac[0])
    if err <= 0:
        return None
    lpc = np.zeros(order)
    for i in range(order):
        r = float(ac[i + 1])
        for j in range(i):
            r -= lpc[j] * ac[i - j]
        r /= err
        lpc[i] = r
        for j in range(i >> 1):
            tmp = lpc[j]
            lpc[j] -= r * lpc[i - 1 - j]
            lpc[i - 1 - j] -= r * tmp
        if i & 1:
            lpc[i >> 1] -= r * lpc[i >> 1]
        err *= 1.0 - r * r
        if err <= 0:
            return None
    return lpc


def _quantize_lpc(lpc: np.ndarray,
                  precision: int = 12) -> Optional[Tuple[np.ndarray, int]]:
    cmax = float(np.abs(lpc).max())
    if cmax <= 0:
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.round(lpc * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    order = len(q)
    n = len(x)
    resid = np.empty(n - order, dtype=np.int64)
    for i in range(order, n):
        pred = 0
        for j in range(order):
            pred += int(q[j]) * int(x[i - 1 - j])
        resid[i - order] = int(x[i]) - (pred >> shift)
    return resid


def _best_fixed_order(x: np.ndarray, max_order: int = 4) -> int:
    best, best_cost = 0, None
    d = x.astype(np.int64)
    for o in range(max_order + 1):
        if len(d) == 0:
            break
        cost = np.abs(d).sum()
        if best_cost is None or cost < best_cost:
            best, best_cost = o, cost
        d = np.diff(d)
    return best


def _rice_param(resid: np.ndarray, plen: int) -> int:
    if len(resid) == 0:
        return 0
    mean = max(float(np.abs(resid).mean()), 0.25)
    k = max(0, int(np.ceil(np.log2(mean))) + 1)
    return min(k, (1 << plen) - 2)


def _write_residual(w: _BitWriter, resid: np.ndarray, order: int,
                    blocksize: int, porder: int = 0) -> None:
    w.write(0, 2)  # 4-bit Rice
    w.write(porder, 4)
    nparts = 1 << porder
    k = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        part = resid[k:k + n]
        k += n
        param = _rice_param(part, 4)
        zig = (np.abs(part) << 1) - (part < 0)
        # escape to raw if rice would explode (pathological partitions)
        if len(part) and int((zig >> param).max()) > 48:
            raw = max(int(np.abs(part).max()).bit_length() + 1, 1)
            w.write(15, 4)
            w.write(raw, 5)
            for v in part:
                w.write_signed(int(v), raw)
        else:
            w.write(param, 4)
            for v, z in zip(part, zig):
                w.write_unary(int(z) >> param)
                w.write(int(z) & ((1 << param) - 1), param)


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int,
                    blocksize: int, lpc_order: int = 0) -> None:
    if len(x) and (x == x[0]).all():
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(int(x[0]), bps)
        return
    # wasted bits: trailing zero bits common to every sample
    wasted = 0
    nz = x[x != 0]
    if len(nz):
        orall = int(np.bitwise_or.reduce(nz))
        wasted = (orall & -orall).bit_length() - 1
    if wasted:
        x = x >> wasted
        bps -= wasted

    def _emit_wasted():
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    order = _best_fixed_order(x)
    d = x.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    # LPC beats the fixed predictor? (only when requested)
    lpc_choice = None
    if lpc_order and len(x) > 2 * lpc_order:
        xf = x.astype(np.float64)
        ac = np.array([np.dot(xf[:len(xf) - k], xf[k:])
                       for k in range(lpc_order + 1)])
        lpc = _levinson(ac, lpc_order)
        q = _quantize_lpc(lpc) if lpc is not None else None
        if q is not None:
            resid = _lpc_residual(x, q[0], q[1])
            if np.abs(resid).sum() < np.abs(d).sum():
                lpc_choice = (q[0], q[1], resid)
    porder = 2 if blocksize % 4 == 0 and blocksize // 4 > max(
        order, lpc_order) else 0
    if lpc_choice is not None:
        qcoef, shift, resid = lpc_choice
        w.write(0, 1)
        w.write(31 + lpc_order, 6)  # LPC, order = code - 31
        _emit_wasted()
        for i in range(lpc_order):
            w.write_signed(int(x[i]), bps)
        w.write(12 - 1, 4)  # precision 12
        w.write_signed(shift, 5)
        for c in qcoef:
            w.write_signed(int(c), 12)
        _write_residual(w, resid, lpc_order, blocksize, porder)
        return
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    _emit_wasted()
    for i in range(order):
        w.write_signed(int(x[i]), bps)
    _write_residual(w, d, order, blocksize, porder)


_STEREO_CODES = {"independent": None, "left_side": 8, "right_side": 9,
                 "mid_side": 10}


def encode_flac(samples: np.ndarray, rate: int = 8_000, bps: int = 16,
                blocksize: int = 4096, mid_side: bool = False,
                stereo_mode: Optional[str] = None,
                lpc_order: int = 0) -> bytes:
    """``(n,)`` or ``(n, channels)`` int samples → FLAC bytes.

    ``stereo_mode`` ∈ independent/left_side/right_side/mid_side picks
    the decorrelation (``mid_side=True`` kept as a shorthand);
    ``lpc_order>0`` enables quantized-LPC subframes (Levinson-Durbin,
    precision 12) whenever they beat the best fixed predictor."""
    if stereo_mode is None:
        stereo_mode = "mid_side" if mid_side else "independent"
    if stereo_mode not in _STEREO_CODES:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if stereo_mode != "independent" and nch != 2:
        raise ValueError(f"{stereo_mode} requires stereo input")
    # STREAMINFO
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.tobytes() + _audio_md5(x, bps)
    out = [b"fLaC", bytes([0x80]) + len(body).to_bytes(3, "big"), body]
    for fi, off in enumerate(range(0, n, blocksize)):
        blk = x[off:off + blocksize]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit blocksize-1 at end of header
        w.write(0, 4)  # rate from STREAMINFO
        chan_code = _STEREO_CODES[stereo_mode]
        w.write(nch - 1 if chan_code is None else chan_code, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.write(0, 1)
        for byte in _utf8_encode(fi):
            w.write(byte, 8)
        w.write(bs - 1, 16)
        header = w.tobytes()
        header += bytes([crc8(header)])
        w2 = _BitWriter()
        if chan_code is not None:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if chan_code == 8:  # left/side
                _write_subframe(w2, left, bps, bs, lpc_order)
                _write_subframe(w2, side, bps + 1, bs, lpc_order)
            elif chan_code == 9:  # right/side
                _write_subframe(w2, side, bps + 1, bs, lpc_order)
                _write_subframe(w2, right, bps, bs, lpc_order)
            else:  # mid/side
                _write_subframe(w2, (left + right) >> 1, bps, bs, lpc_order)
                _write_subframe(w2, side, bps + 1, bs, lpc_order)
        else:
            for c in range(nch):
                _write_subframe(w2, blk[:, c], bps, bs, lpc_order)
        frame = header + w2.tobytes()
        frame += struct.pack(">H", crc16(frame))
        out.append(frame)
    return b"".join(out)


def decode_flac_audio(payload: bytes) -> Tuple[np.ndarray, int]:
    """FLAC → (float64 channel-mean samples in [-1, 1], rate) — the
    :mod:`.multimodal` audio-decode signature."""
    info = parse_streaminfo(payload)
    s, rate = decode_flac(payload)
    x = s.astype(np.float64) / float(1 << (info["bits_per_sample"] - 1))
    return x.mean(axis=1), rate


def encode_flac_audio(samples: np.ndarray, rate: int = 8_000,
                      **kw) -> bytes:
    """float64 [-1, 1] mono/stereo → 16-bit FLAC (fixture-side inverse
    of :func:`decode_flac_audio`)."""
    pcm = np.clip(np.asarray(samples) * 32767, -32768, 32767).astype(
        np.int64)
    return encode_flac(pcm, rate=rate, bps=16, **kw)
