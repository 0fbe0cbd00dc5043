"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib — no imaging
libraries.

Closes the last stubbed image format in :mod:`multimodal`: the reference
pipeline treats images as opaque binary payloads decoded inside an actor
pool; with this module ``image/jpeg`` payloads decode for real, like
PNG (zlib) and GIF (LZW) already do.

Scope — the sequential AND progressive Huffman DCT subsets that cover
the vast majority of real-world JPEGs:

- **decode**: 8-bit baseline (SOF0/SOF1) and PROGRESSIVE (SOF2 —
  spectral selection, successive approximation, EOBRUN runs, DC/AC
  refinement scans, per T.81 Annex G), grayscale or YCbCr, arbitrary
  sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart intervals (DRI /
  RSTn, sequential and progressive), byte stuffing.  Arithmetic coding
  and hierarchical/lossless SOFs raise.
- **encode**: quality-scaled Annex-K quantization tables, standard
  Huffman tables, 4:4:4 or 4:2:0 chroma subsampling, optional restart
  interval, and ``progressive=True`` emitting a libjpeg-style scan
  script (interleaved DC first scan with point transform, per-component
  AC spectral bands, then DC/AC successive-approximation refinement
  scans) — so every progressive decode path is roundtrip-tested against
  the baseline decode of the same pixels.

The per-block entropy coding is a Python loop (inherently sequential bit
I/O); everything around it — color transform, 2-D DCT/IDCT (einsum over
all blocks at once), quantization, zigzag gather — is vectorized numpy.
Fixture images here are tiny; at production scale this stage is exactly
where PIL/libjpeg-turbo would plug into ``MediaDecoder.__init__``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Row-major indices of the 8x8 block in zigzag scan order."""
    idx = []
    for s in range(15):
        diag = [(s - j, j) for j in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 1:
            diag = diag[::-1]
        idx += [r * 8 + c for r, c in diag]
    return np.array(idx)


_ZZ = _zigzag_order()
assert list(_ZZ[:6]) == [0, 1, 8, 16, 9, 2]

# Annex K quantization tables (luminance / chrominance), natural order
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K Huffman specs: (bits[16], values).  Only *validity* matters for
# the roundtrip (tables travel in DHT and the decoder parses them), but
# these are the interchange-standard tables real encoders emit.
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
# progressive AC table: the Annex-K baseline tables carry no EOBn
# symbols (0x10..0xE0), which only exist in progressive scans.  A flat
# 8-bit canonical code over every symbol a progressive AC scan can emit
# — (r<<4)|s for s 1..10, EOBn for r 0..14, ZRL — is a valid Huffman
# table (176 codes of 256 slots); suboptimal compression, simple and
# fully decodable by any conforming decoder.
_AC_PROG_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)} | {0xF0})
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_VALS),
             0, 0, 0, 0, 0, 0, 0, 0], _AC_PROG_VALS)

for _bits, _vals in (_DC_L, _DC_C, _AC_L, _AC_C, _AC_PROG):
    assert sum(_bits) == len(_vals)

# orthonormal DCT-II basis: coef = C @ block @ C.T, block = C.T @ coef @ C
_C = np.array([
    [np.cos((2 * n + 1) * k * np.pi / 16)
     * (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
     for n in range(8)]
    for k in range(8)
])
# T.81 uses the scaled DCT where coef[0,0] of a flat block of x is 8x/8;
# the orthonormal basis above matches the spec's normalization exactly:
# forward S(u,v) = 1/4 C(u)C(v) sum..., which equals _C @ B @ _C.T.


def _encode_codes(bits, values):
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_codes(bits, values):
    """Canonical Huffman: (length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# bit I/O (byte stuffing + restart markers)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self._emit(self.acc)
                self.acc = 0
                self.n = 0

    def _emit(self, b):
        self.out.append(b)
        if b == 0xFF:  # byte stuffing
            self.out.append(0x00)

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self._emit((self.acc << pad) | ((1 << pad) - 1))  # 1-pad
            self.acc = 0
            self.n = 0

    def marker(self, m):
        """Byte-align and emit a bare marker (RSTn)."""
        self.flush()
        self.out += bytes([0xFF, m])


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2  # stuffed
                else:
                    # marker mid-stream: treat as zero fill (T.81 F.2.2.5
                    # allows the decoder to pad at a marker boundary)
                    b = 0
            else:
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expect: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.n = 0
        if (self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + expect):
            raise ValueError(
                f"expected RST{expect} at byte {self.pos}, got "
                f"{self.data[self.pos:self.pos + 2].hex()}")
        self.pos += 2


def _read_symbol(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map the s low-order bits back to a signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _bitlen(v: int) -> int:
    return int(v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _quality_tables(quality: int):
    """libjpeg-compatible quality scaling of the Annex K tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W % 8 == 0 -> (nby, nbx, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _fdct_quant(blocks: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 64) quantized zigzag ints."""
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    q = np.round(coef / qtbl.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZZ]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    diff = int(zz[0]) - pred
    s = _bitlen(abs(diff))
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            w.write(zc, zl)
            run -= 16
        s = _bitlen(abs(v))
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def _pad_edge(img: np.ndarray, mult: int) -> np.ndarray:
    h, w = img.shape[:2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        img = np.pad(img, [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2),
                     mode="edge")
    return img


def _seg(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G; scan script mirrors libjpeg's default)
# ---------------------------------------------------------------------------


class _AcProgState:
    """Per-scan AC progressive entropy state: the cross-block EOB run
    counter and (for refinement scans) the correction bits buffered
    until the run's EOBn symbol is emitted."""

    def __init__(self, w: "_BitWriter", ac_codes: dict):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.bits: list = []  # BE buffer: corrections owed after EOBn

    def emit_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[nbits << 4]
            self.w.write(code, ln)
            if nbits:
                self.w.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []


def _enc_ac_first_block(st: _AcProgState, zz, ss, se, al):
    """One block of an AC first scan: magnitudes point-transformed by
    Al (division truncating toward zero), EOB folded into EOBRUN."""
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        if t < 0:
            temp = (-t) >> al
            temp2 = ~temp
        else:
            temp = t >> al
            temp2 = temp
        if temp == 0:
            r += 1
            continue
        st.emit_eobrun()
        while r > 15:
            c, ln = st.ac[0xF0]  # ZRL
            st.w.write(c, ln)
            r -= 16
        s = temp.bit_length()
        c, ln = st.ac[(r << 4) | s]
        st.w.write(c, ln)
        st.w.write(temp2 & ((1 << s) - 1), s)
        r = 0
    if r:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.emit_eobrun()


def _enc_ac_refine_block(st: _AcProgState, zz, ss, se, al):
    """One block of an AC refinement scan: correction bits for
    previously-sent coefficients, new +-1 coefficients at bit Al,
    trailing corrections folded into the EOB run (libjpeg
    encode_mcu_AC_refine)."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k  # last NEWLY-nonzero coefficient
    r = 0
    br: list = []  # this block's pending correction bits
    for k in range(ss, se + 1):
        temp = absv[k - ss]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.emit_eobrun()
            c, ln = st.ac[0xF0]
            st.w.write(c, ln)
            r -= 16
            for b in br:
                st.w.write(b, 1)
            br = []
        if temp > 1:
            br.append(temp & 1)  # already nonzero: correction bit only
            continue
        st.emit_eobrun()
        c, ln = st.ac[(r << 4) | 1]
        st.w.write(c, ln)
        st.w.write(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            st.w.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.bits.extend(br)
        if st.eobrun == 0x7FFF or len(st.bits) > 937:
            st.emit_eobrun()


def _sos_seg(scan_comps, ss, se, ah, al) -> bytes:
    body = bytes([len(scan_comps)])
    for cid, dc_id, ac_id in scan_comps:
        body += bytes([cid, (dc_id << 4) | ac_id])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _encode_progressive(out: bytearray, comps, mcus_y, mcus_x,
                        h0, w0, hmax, vmax, dri) -> None:
    """Emit the progressive scan sequence (libjpeg's default script)
    into ``out``: interleaved DC first scan at Al=1, per-component AC
    spectral bands at Al>0, then DC and AC successive-approximation
    refinement scans down to Al=0."""
    def dc_scan(ah, al):
        w = _BitWriter()
        preds = {c["cid"]: 0 for c in comps}
        n = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and n and n % dri == 0:
                    w.marker(0xD0 + rst)
                    rst = (rst + 1) % 8
                    preds = {c["cid"]: 0 for c in comps}
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = c["blocks"][
                                (my * c["v"] + by) * c["bw"]
                                + mx * c["h"] + bx]
                            if ah == 0:
                                v = int(blk[0]) >> al
                                diff = v - preds[c["cid"]]
                                preds[c["cid"]] = v
                                s = _bitlen(abs(diff))
                                code, ln = c["dc"][s]
                                w.write(code, ln)
                                if s:
                                    w.write(diff if diff > 0
                                            else diff + (1 << s) - 1, s)
                            else:
                                w.write((int(blk[0]) >> al) & 1, 1)
                n += 1
        w.flush()
        out.extend(_sos_seg([(c["cid"], c["dcid"], 0) for c in comps],
                            0, 0, ah, al))
        out.extend(w.out)

    def ac_scan(c, ss, se, ah, al):
        w = _BitWriter()
        st = _AcProgState(w, c["acc"])
        xs = -(-w0 * c["h"] // hmax)   # ceil(w0 * h / hmax) samples
        ys = -(-h0 * c["v"] // vmax)
        cw, chd = -(-xs // 8), -(-ys // 8)
        n = 0
        rst = 0
        for row in range(chd):
            for col in range(cw):
                if dri and n and n % dri == 0:
                    st.emit_eobrun()
                    w.marker(0xD0 + rst)
                    rst = (rst + 1) % 8
                blk = c["blocks"][row * c["bw"] + col]
                if ah == 0:
                    _enc_ac_first_block(st, blk, ss, se, al)
                else:
                    _enc_ac_refine_block(st, blk, ss, se, al)
                n += 1
        st.emit_eobrun()
        w.flush()
        out.extend(_sos_seg([(c["cid"], 0, c["acid"])], ss, se, ah, al))
        out.extend(w.out)

    y, cb, cr = comps
    dc_scan(0, 1)            # DC first, point transform 1
    ac_scan(y, 1, 5, 0, 2)   # Y low band
    ac_scan(cb, 1, 63, 0, 1)
    ac_scan(cr, 1, 63, 0, 1)
    ac_scan(y, 6, 63, 0, 2)  # Y high band
    ac_scan(y, 1, 63, 2, 1)  # Y refine Al 2 -> 1
    dc_scan(1, 0)            # DC refine
    ac_scan(y, 1, 63, 1, 0)  # final refinements to full precision
    ac_scan(cb, 1, 63, 1, 0)
    ac_scan(cr, 1, 63, 1, 0)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> JFIF JPEG bytes (baseline, or progressive
    with ``progressive=True``).

    ``subsampling``: ``"444"`` (no chroma subsampling) or ``"420"``
    (2x2 chroma, the web default).  ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs / blocks (exercises the decoder's
    restart path; also what a resumable scan would use).
    ``progressive=True`` emits SOF2 with libjpeg's default scan script —
    the SAME quantized coefficients as the baseline stream, so both
    decode to identical pixels."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h0, w0 = img.shape[:2]
    ql, qc = _quality_tables(quality)

    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    if subsampling == "420":
        sh, sv = 2, 2
        y = _pad_edge(y, 16)
        cb = _pad_edge(cb, 16)
        cr = _pad_edge(cr, 16)
        # 2x2 mean subsample of the chroma planes
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
    else:
        sh, sv = 1, 1
        y = _pad_edge(y, 8)
        cb = _pad_edge(cb, 8)
        cr = _pad_edge(cr, 8)

    yq = _fdct_quant(_to_blocks(y - 128.0).reshape(-1, 8, 8), ql)
    yby = y.shape[0] // 8
    ybx = y.shape[1] // 8
    cbq = _fdct_quant(_to_blocks(cb - 128.0).reshape(-1, 8, 8), qc)
    crq = _fdct_quant(_to_blocks(cr - 128.0).reshape(-1, 8, 8), qc)
    cbx = cb.shape[1] // 8

    dc_l, ac_l = _encode_codes(*_DC_L), _encode_codes(*_AC_L)
    dc_c, ac_c = _encode_codes(*_DC_C), _encode_codes(*_AC_C)

    if progressive:
        ac_p = _encode_codes(*_AC_PROG)
        comps = [
            dict(cid=1, blocks=yq, bw=ybx, h=sh, v=sv,
                 dc=dc_l, acc=ac_p, dcid=0, acid=0),
            dict(cid=2, blocks=cbq, bw=cbx, h=1, v=1,
                 dc=dc_c, acc=ac_p, dcid=1, acid=1),
            dict(cid=3, blocks=crq, bw=cbx, h=1, v=1,
                 dc=dc_c, acc=ac_p, dcid=1, acid=1),
        ]
        out = bytearray(b"\xff\xd8")
        out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += _seg(0xDB, bytes([0x00]) + bytes(ql[_ZZ].tolist()))
        out += _seg(0xDB, bytes([0x01]) + bytes(qc[_ZZ].tolist()))
        sof = struct.pack(">BHHB", 8, h0, w0, 3)
        sof += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1])
        out += _seg(0xC2, sof)
        for cls, tid, (bits, vals) in ((0, 0, _DC_L), (1, 0, _AC_PROG),
                                       (0, 1, _DC_C), (1, 1, _AC_PROG)):
            out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                        + bytes(vals))
        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        _encode_progressive(out, comps, yby // sv, ybx // sh,
                            h0, w0, sh, sv, restart_interval)
        out += b"\xff\xd9"
        return bytes(out)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcus_y = yby // sv
    mcus_x = ybx // sh
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for by in range(sv):
                for bx in range(sh):
                    blk = yq[(my * sv + by) * ybx + (mx * sh + bx)]
                    preds[0] = _encode_block(bw, blk, preds[0], dc_l, ac_l)
            preds[1] = _encode_block(bw, cbq[my * cbx + mx], preds[1],
                                     dc_c, ac_c)
            preds[2] = _encode_block(bw, crq[my * cbx + mx], preds[2],
                                     dc_c, ac_c)
            mcu_count += 1
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql[_ZZ].tolist()))
    out += _seg(0xDB, bytes([0x01]) + bytes(qc[_ZZ].tolist()))
    sof = struct.pack(">BHHB", 8, h0, w0, 3)
    sof += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)
    for cls, tid, (bits, vals) in ((0, 0, _DC_L), (1, 0, _AC_L),
                                   (0, 1, _DC_C), (1, 1, _AC_C)):
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                    + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _reconstruct(order, qtabs, hmax, vmax, fh, fw) -> np.ndarray:
    """Coefficient planes -> (h, w, 3) uint8 RGB: vectorized dequant +
    IDCT + chroma upsampling + color transform (shared by the baseline
    and progressive decode paths)."""
    planes = []
    for c in order:
        nat = np.zeros((len(c["blocks"]), 64), np.float64)
        nat[:, _ZZ] = c["blocks"]
        coef = nat.reshape(-1, 8, 8) * qtabs[c["tq"]].reshape(8, 8)
        pix = np.einsum("ji,njk,kl->nil", _C, coef, _C) + 128.0
        plane = (pix.reshape(c["bh"], c["bw"], 8, 8)
                 .swapaxes(1, 2).reshape(c["bh"] * 8, c["bw"] * 8))
        plane = plane.repeat(vmax // c["v"], 0).repeat(hmax // c["h"], 1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        yv = np.clip(planes[0], 0, 255)
        return np.ascontiguousarray(
            np.stack([yv, yv, yv], axis=-1).astype(np.uint8))
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    yv, cbv, crv = planes
    cbv = cbv - 128.0
    crv = crv - 128.0
    r = yv + 1.402 * crv
    g = yv - 0.344136 * cbv - 0.714136 * crv
    b = yv + 1.772 * cbv
    rgb = np.stack([r, g, b], axis=-1)
    return np.ascontiguousarray(np.clip(np.round(rgb), 0, 255)
                                .astype(np.uint8))


def _refine_nonzero(reader: _BitReader, blk: np.ndarray, k: int,
                    p1: int, m1: int) -> None:
    """AC successive-approximation correction of one already-nonzero
    coefficient (T.81 G.2.2 / libjpeg decode_mcu_AC_refine).  Blocks
    are stored in ZIGZAG order (like the baseline path), so the band
    index k addresses the array directly."""
    if reader.read_bit():
        v = int(blk[k])
        if (abs(v) & p1) == 0:
            blk[k] = v + (p1 if v >= 0 else m1)


def _decode_ac_first(reader, blk, ss, se, al, ac_tbl, eobrun: int) -> int:
    """One block of an AC FIRST scan (Ah == 0): spectral band ss..se,
    new coefficients arrive shifted left by the point transform; EOBn
    codes start runs of entirely-skipped blocks.  Returns eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOBn
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(reader, blk, ss, se, al, ac_tbl,
                      eobrun: int) -> int:
    """One block of an AC REFINEMENT scan (Ah > 0): correction bits for
    known coefficients, new +-1<<Al coefficients, EOB runs that still
    carry corrections (T.81 G.2.2).  Returns eobrun."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(reader, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:  # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: skip 16 zero-history positions (with corrections)
            else:
                if s != 1:
                    raise ValueError("refinement scan with size > 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(reader, blk, k, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                _refine_nonzero(reader, blk, k, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(payload, pos, frame, scan, ss, se, ah, al,
                             htabs, qtabs, dri, hmax, vmax):
    """Entropy-decode ONE progressive scan into the components'
    coefficient arrays; returns the byte position of the next marker.
    Interleaved MCU order for multi-component (DC) scans, component
    raster order over the component's OWN ceil-dims for single-component
    scans (T.81 A.2.2 — the padded MCU-grid columns are not coded)."""
    byid = {c["id"]: c for c in frame["comps"]}
    comps = [byid[sc["id"]] for sc in scan]
    for sc, c in zip(scan, comps):
        if ss == 0 and ah == 0:
            c["dc_tbl"] = htabs[(0, sc["dc"])]
        if se > 0:
            c["ac_tbl"] = htabs[(1, sc["ac"])]
        c["pred"] = 0
    reader = _BitReader(payload, pos)
    eobrun = 0
    interleaved = len(comps) > 1

    def restart(expect):
        nonlocal eobrun
        reader.sync_restart(expect)
        for c in comps:
            c["pred"] = 0
        eobrun = 0

    if ss == 0:  # DC scan (spec: Ss=0 implies Se=0)
        mcus_x = frame["mcus_x"] if interleaved else _comp_block_dims(
            comps[0], frame, hmax, vmax)[0]
        mcus_y = frame["mcus_y"] if interleaved else _comp_block_dims(
            comps[0], frame, hmax, vmax)[1]
        n = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and n and n % dri == 0:
                    restart(rst)
                    rst = (rst + 1) % 8
                for c in comps:
                    bys = range(c["v"]) if interleaved else (0,)
                    bxs = range(c["h"]) if interleaved else (0,)
                    for by in bys:
                        for bx in bxs:
                            if interleaved:
                                idx = ((my * c["v"] + by) * c["bw"]
                                       + mx * c["h"] + bx)
                            else:
                                idx = my * c["bw"] + mx
                            blk = c["blocks"][idx]
                            if ah == 0:
                                s = _read_symbol(reader, c["dc_tbl"])
                                diff = (_extend(reader.read_bits(s), s)
                                        if s else 0)
                                c["pred"] += diff
                                blk[0] = c["pred"] << al
                            elif reader.read_bit():
                                blk[0] = int(blk[0]) | (1 << al)
                n += 1
    else:  # AC scan: always single-component, non-interleaved
        if interleaved:
            raise ValueError("interleaved AC progressive scan")
        c = comps[0]
        cw, ch = _comp_block_dims(c, frame, hmax, vmax)
        n = 0
        rst = 0
        for row in range(ch):
            for col in range(cw):
                if dri and n and n % dri == 0:
                    restart(rst)
                    rst = (rst + 1) % 8
                blk = c["blocks"][row * c["bw"] + col]
                if ah == 0:
                    eobrun = _decode_ac_first(
                        reader, blk, ss, se, al, c["ac_tbl"], eobrun)
                else:
                    eobrun = _decode_ac_refine(
                        reader, blk, ss, se, al, c["ac_tbl"], eobrun)
                n += 1
    # byte-align, then skip to the next marker (stuffed FF00 and RSTn
    # belong to this scan's entropy data)
    p = reader.pos
    while p < len(payload) - 1:
        if payload[p] == 0xFF and payload[p + 1] != 0x00 \
                and not (0xD0 <= payload[p + 1] <= 0xD7):
            return p
        p += 1
    return len(payload)


def _comp_block_dims(c, frame, hmax, vmax):
    """Non-interleaved block dims of a component: ceil over the
    component's OWN sample dimensions (T.81 A.2.2), not the padded MCU
    grid."""
    w_samples = -(-frame["w"] * c["h"] // hmax)   # ceil(w * h / hmax)
    h_samples = -(-frame["h"] * c["v"] // vmax)
    return -(-w_samples // 8), -(-h_samples // 8)


def _decode_block(reader: _BitReader, dc_tbl: dict, ac_tbl: dict,
                  pred: int) -> tuple:
    zz = np.zeros(64, dtype=np.int32)
    s = _read_symbol(reader, dc_tbl)
    zz[0] = pred + (_extend(reader.read_bits(s), s) if s else 0)
    k = 1
    while k < 64:
        rs = _read_symbol(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz, int(zz[0])


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB.

    Pure numpy + stdlib: marker parse, DHT/DQT from the file, Huffman MCU
    scan (with restart markers), vectorized dequant + IDCT, chroma
    upsampling, YCbCr->RGB.  Progressive/arithmetic/12-bit raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs = {}
    htabs = {}
    frame = None
    dri = 0
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        m = payload[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2:pos + length]
        pos += length
        if m == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(body, np.uint8, 64, i + 1)
                nat = np.zeros(64, np.int32)
                nat[_ZZ] = zz
                qtabs[tq] = nat
                i += 65
        elif m == 0xC4:  # DHT: one or more tables
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                htabs[(cls, tid)] = _decode_codes(bits, vals)
                i += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append(dict(id=cid, h=hv >> 4, v=hv & 0x0F, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps, progressive=(m == 0xC2))
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame["mcus_x"] = -(-fw // (8 * hmax))
            frame["mcus_y"] = -(-fh // (8 * vmax))
            for c in comps:
                c["bw"] = frame["mcus_x"] * c["h"]
                c["bh"] = frame["mcus_y"] * c["v"]
                c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
                c["pred"] = 0
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0xFF{m:02X}): sequential "
                "and progressive DCT Huffman decode here")
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body)
        elif m == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append(dict(id=cid, dc=tt >> 4, ac=tt & 0x0F))
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame["progressive"]:
                break  # entropy data follows; baseline single scan
            ss, se, aa = body[1 + 2 * ns:4 + 2 * ns]
            pos = _decode_progressive_scan(
                payload, pos, frame, scan, ss, se, aa >> 4, aa & 0x0F,
                htabs, qtabs, dri,
                max(c["h"] for c in frame["comps"]),
                max(c["v"] for c in frame["comps"]))
        # APPn / COM / others: skipped
    if frame is None:
        raise ValueError("JPEG missing SOF")
    if frame.get("progressive"):
        if scan is None:
            raise ValueError("progressive JPEG with no scan")
        hmax = max(c["h"] for c in frame["comps"])
        vmax = max(c["v"] for c in frame["comps"])
        return _reconstruct(frame["comps"], qtabs, hmax, vmax,
                            frame["h"], frame["w"])
    if scan is None:
        raise ValueError("JPEG missing SOS")

    comps = frame["comps"]
    byid = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    fh, fw = frame["h"], frame["w"]
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    for sc in scan:
        c = byid[sc["id"]]
        c["dc_tbl"] = htabs[(0, sc["dc"])]
        c["ac_tbl"] = htabs[(1, sc["ac"])]
        c["bw"] = mcus_x * c["h"]  # blocks per row in the component plane
        c["bh"] = mcus_y * c["v"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        c["pred"] = 0

    order = [byid[sc["id"]] for sc in scan]
    reader = _BitReader(payload, pos)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) % 8
                for c in order:
                    c["pred"] = 0
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, c["pred"] = _decode_block(
                            reader, c["dc_tbl"], c["ac_tbl"], c["pred"])
                        c["blocks"][(my * c["v"] + by) * c["bw"]
                                    + mx * c["h"] + bx] = zz
            mcu_count += 1

    return _reconstruct(order, qtabs, hmax, vmax, fh, fw)
