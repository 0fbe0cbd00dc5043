"""Generate golden oracles for the non-SQL-expressible driver queries.

Writes ``xpshacl_ray/goldens.py``: a dict of self-contained DuckDB
``VALUES``-literal SELECT statements, one per query, computed at sf0.01
(the scale the driver's correctness gate runs at).

Two golden classes, labeled per entry:

- **independent**: a from-scratch reimplementation in this file (pure
  numpy/pandas over the parquet — NO xpshacl_ray imports) of the
  documented algorithm.  For pair queries it is a BRUTE-FORCE all-pairs
  sweep (every pair with ≥1 agreeing LSH band and metric past threshold),
  so it checks the engine's bucketed/sharded LSH plumbing against the
  quadratic ground truth, not against itself.
- **frozen**: engine output snapshotted to pin regressions (justification
  trees / explanations — reference-parity strings already pinned by
  goldens in tests/).

Run:  python tools/make_goldens.py  (owns its own ray.init for the frozen
entries; everything else is ray-free).
"""

from __future__ import annotations

import hashlib
import re
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
OUT = "/root/repo/xpshacl_ray/goldens.py"

_MERSENNE = np.uint64((1 << 61) - 1)
_HASH_KEY = "0123456789123456"


# ---------------------------------------------------------------------------
# independent reimplementations (documented algorithms, no engine imports)
# ---------------------------------------------------------------------------


def minhash_signatures(texts, num_perm=64, shingle_k=5, seed=42):
    """Spec: sig_i = min over distinct k-byte shingles s of
    (a_i*h(s)+b_i) mod (2^61-1); h = FNV-prime polynomial over bytes."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    base = np.uint64(1099511628211)
    sigs = np.zeros((len(texts), num_perm), dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        by = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(by) < shingle_k:
            pows = base ** np.arange(len(by), dtype=np.uint64)
            x = np.array([(by * pows).sum() & _MERSENNE], dtype=np.uint64)
        else:
            n_sh = len(by) - shingle_k + 1
            h = np.zeros(n_sh, dtype=np.uint64)
            for j in range(shingle_k):
                h = h * base + by[j : j + n_sh]
            x = np.unique(h & _MERSENNE)
        vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
        sigs[i] = vals.min(axis=1)
    return sigs


def brute_minhash_pairs(ids, sigs, bands=16, threshold=0.8, sig_bits=16):
    """ALL-pairs ground truth: emitted iff ≥1 of the 16 band chunks agree
    (the LSH candidate condition) AND signature-agreement Jaccard ≥ t.
    ``sig_bits=16`` applies the engine's default slot quantization (low 16
    bits) so banding + estimation match the documented algorithm."""
    if sig_bits == 16:
        sigs = (sigs & np.uint64(0xFFFF)).astype(np.uint16)
    n, num_perm = sigs.shape
    r = num_perm // bands
    chunks = sigs.reshape(n, bands, r)
    rows = []
    for i in range(n):
        eq = (sigs[i][None, :] == sigs[i + 1 :]).mean(axis=1)
        band_agree = (chunks[i][None, :, :] == chunks[i + 1 :]).all(
            axis=2).any(axis=1)
        for off in np.flatnonzero((eq >= threshold) & band_agree):
            j = i + 1 + off
            rows.append((int(ids[i]), int(ids[j]), round(float(eq[off]), 6)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard_est"])


def word_ngram_jaccard(a, b, n=3):
    ta, tb = a.lower().split(), b.lower().split()
    sa = ({tuple(ta[i : i + n]) for i in range(len(ta) - n + 1)}
          if len(ta) >= n else ({tuple(ta)} if ta else set()))
    sb = ({tuple(tb[i : i + n]) for i in range(len(tb) - n + 1)}
          if len(tb) >= n else ({tuple(tb)} if tb else set()))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def brute_ngram_pairs(ids, texts, sigs, bands=16, cand_threshold=0.8,
                      threshold=0.8):
    cand = brute_minhash_pairs(ids, sigs, bands, cand_threshold)
    tmap = dict(zip(ids, texts))
    rows = []
    for a, b in zip(cand["id_a"], cand["id_b"]):
        j = round(word_ngram_jaccard(tmap[a], tmap[b]), 6)
        if j >= threshold:
            rows.append((a, b, j))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


def simhash64(texts):
    """Spec: 64-bit SimHash over \\w+ word tokens of lower(text), token
    hashes = pandas hash_array (fixed key), count-weighted sign sum;
    stored as the int64 reinterpretation of the uint64 fingerprint."""
    word_re = re.compile(r"\w+", re.UNICODE)
    bit_idx = np.arange(64, dtype=np.uint64)
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        toks = word_re.findall(t.lower())
        if not toks:
            out.append(0)
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
        hs = pd.util.hash_array(uniq.astype(object), hash_key=_HASH_KEY,
                                categorize=False)
        bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
            np.int64)
        acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        word = np.where(acc > 0, np.uint64(1), np.uint64(0))
        h = int((word << bit_idx).sum())
        out.append(h - (1 << 64) if h >= (1 << 63) else h)
    return out


def brute_simhash_pairs(ids, hashes_i64, max_hamming=3):
    """ALL-pairs ground truth: Hamming ≤ max AND ≥1 agreeing 16-bit band
    (the banded-LSH candidate condition — pigeonhole-complete for ≤3)."""
    h = np.ascontiguousarray(np.asarray(hashes_i64, dtype=np.int64)).view(
        np.uint64)
    bands = np.stack(
        [(h >> np.uint64(bb * 16)) & np.uint64(0xFFFF) for bb in range(4)],
        axis=1)
    rows = []
    for i in range(len(ids)):
        x = h[i] ^ h[i + 1 :]
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        d = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
        agree = (bands[i][None, :] == bands[i + 1 :]).any(axis=1)
        for off in np.flatnonzero((d <= max_hamming) & agree):
            j = i + 1 + off
            rows.append((int(ids[i]), int(ids[j]), int(d[off])))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])


def ivf_knn_golden(emb_path, n_centroids=8, iters=5, k=10, nprobe=4,
                   sample_pct=20, seed=42):
    """Spec: deterministic md5-bucket sample → cosine k-means (argmax
    assignment, mean+renormalize update) → assign all vectors → probe the
    nprobe nearest lists → exact cosine top-k within them."""
    t = pq.read_table(emb_path)
    ids = np.asarray(t["vec_id"])
    mat = np.asarray(t["embedding"].combine_chunks().flatten(),
                     dtype=np.float64).reshape(len(ids), -1)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms

    def bucket(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 100

    keep = np.array([bucket(v) < sample_pct for v in ids])
    order = np.argsort(ids[keep])
    sample = unit[keep][order]
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            m = sample[assign == c]
            if len(m):
                v = m.mean(axis=0)
                nn = np.linalg.norm(v)
                if nn > 0:
                    cent[c] = v / nn
    lists = (unit @ cent.T).argmax(axis=1)
    q = unit[ids.tolist().index(0)]
    probe = np.argsort(-(cent @ q))[:nprobe]
    mask = np.isin(lists, probe)
    sims = unit[mask] @ q
    sub_ids = ids[mask]
    order = np.lexsort((sub_ids, -sims))[:k]
    return pd.DataFrame(
        {"vec_id": sub_ids[order].astype("int64"),
         "cosine": np.round(sims[order], 3),
         "rank": np.arange(1, len(order) + 1, dtype="int64")})


def kmeans_clusters_golden(emb_path, k=8, iters=5):
    """Spec (independent of engine code): seeds = the k vectors with the
    smallest md5(vec_id) hex strings (sorted ascending); spherical
    Lloyd's — argmax-cosine assignment, per-cluster mean + renormalize,
    empty clusters keep their centroid; per-vector assignment with
    cosine rounded to 6 decimals."""
    t = pq.read_table(emb_path)
    ids = np.asarray(t["vec_id"])
    mat = np.asarray(t["embedding"].combine_chunks().flatten(),
                     dtype=np.float64).reshape(len(ids), -1)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    keys = [hashlib.md5(str(v).encode()).hexdigest() for v in ids]
    seed_idx = np.argsort(np.asarray(keys, dtype=object),
                          kind="stable")[:k]
    cent = unit[seed_idx].copy()
    for _ in range(iters):
        assign = (unit @ cent.T).argmax(axis=1)
        for c in range(k):
            m = unit[assign == c]
            if len(m):
                v = m.sum(axis=0) / len(m)
                nn = np.linalg.norm(v)
                if nn > 0:
                    cent[c] = v / nn
    sims = unit @ cent.T
    assign = sims.argmax(axis=1)
    return pd.DataFrame({
        "vec_id": ids.astype("int64"),
        "cluster": assign.astype("int64"),
        "cosine": np.round(sims[np.arange(len(ids)), assign], 6),
    })


# ---------------------------------------------------------------------------
# VALUES-literal SQL emission
# ---------------------------------------------------------------------------

_SQL_TYPES = {"int64": "BIGINT", "int32": "INTEGER", "float64": "DOUBLE",
              "object": "VARCHAR", "bool": "BOOLEAN",
              "Int64": "BIGINT", "boolean": "BOOLEAN"}


def _lit(v):
    if v is None or v is pd.NA or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        return repr(float(v))  # repr round-trips the exact double
    s = str(v).replace("'", "''")
    return f"'{s}'"


def df_to_values_sql(df: pd.DataFrame) -> str:
    cols = list(df.columns)
    casts = ", ".join(
        f"CAST({c} AS {_SQL_TYPES[str(df[c].dtype)]}) AS {c}" for c in cols)
    rows = ",\n".join(
        "(" + ", ".join(_lit(v) for v in row) + ")"
        for row in df.itertuples(index=False))
    return (f"SELECT {casts} FROM (VALUES\n{rows}\n) AS t({', '.join(cols)})")


def main():
    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    ids = np.asarray(docs["doc_id"])
    texts = docs["text"].to_pylist()

    goldens = {}

    sh = simhash64(texts)
    goldens["simhash"] = ("independent", pd.DataFrame(
        {"doc_id": ids.astype("int64"),
         "simhash64": pd.array(sh, dtype="int64")}).astype(
             {"simhash64": "int64"}))

    sigs = minhash_signatures(texts)
    goldens["minhash_pairs"] = ("independent",
                                brute_minhash_pairs(ids, sigs))
    goldens["ngram_jaccard_pairs"] = ("independent",
                                      brute_ngram_pairs(ids, texts, sigs))
    goldens["simhash_pairs"] = ("independent", brute_simhash_pairs(ids, sh))
    goldens["ivf_knn"] = ("independent",
                          ivf_knn_golden(f"{SF_DIR}/embeddings.parquet"))
    goldens["kmeans_clusters"] = (
        "independent",
        kmeans_clusters_golden(f"{SF_DIR}/embeddings.parquet"))

    # media features: ray-free direct decode (deterministic synthesized
    # PPM/BMP/WAV media; stdlib+numpy codecs) — frozen snapshot
    from xpshacl_ray.stages.multimodal import MediaDecoder, make_real_media_table

    mt = make_real_media_table(12)
    dec = MediaDecoder()
    feats = np.stack([
        dec._decode_one(m, p)
        for m, p in zip(mt["mime"].to_pylist(), mt["payload"].to_pylist())
    ])
    mdf = pd.DataFrame({"media_id": np.asarray(mt["media_id"]).astype("int64"),
                        "mime": mt["mime"].to_pylist()})
    for i in range(feats.shape[1]):
        mdf[f"f{i}"] = np.round(feats[:, i], 6)
    goldens["media_features"] = ("frozen", mdf)

    # tar-shard listing: INDEPENDENT stdlib-tarfile walk of the same
    # on-disk fixture the engine query reads (no engine reader code)
    import hashlib as _hl
    import os as _os
    import tarfile as _tf

    from xpshacl_ray.sources.tar import MIME_BY_EXT, make_tar_fixture

    rows = []
    for path in make_tar_fixture("/tmp/xpshacl_tar_fixture"):
        with _tf.open(path) as t:
            for m in t:
                if not m.isfile():
                    continue
                payload = t.extractfile(m).read()
                base = m.name.rsplit("/", 1)[-1]
                key, ext = (base.split(".", 1) + [""])[:2]
                ext = ext.lower()
                rows.append((_os.path.basename(path), key, m.name, ext,
                             MIME_BY_EXT.get(ext.rsplit(".", 1)[-1],
                                             "application/octet-stream"),
                             len(payload),
                             _hl.sha256(payload).hexdigest()[:16]))
    tdf = pd.DataFrame(rows, columns=["shard", "key", "member", "ext",
                                      "mime", "n_bytes", "sha16"])
    tdf = tdf.sort_values(["shard", "member"]).reset_index(drop=True)
    goldens["tar_ingest"] = ("independent", tdf)

    # perceptual image hash: INDEPENDENT explicit-formula pHash (loop
    # DCT-II, loop bin-means — no engine kernels) + brute-force pairs
    from xpshacl_ray.stages.multimodal import (
        decode_jpeg as _djpg,
        decode_png as _dpng,
        make_phash_fixture,
    )

    def indep_phash(img):
        gray = img.astype(np.float64).mean(axis=2)
        ih, iw = gray.shape
        out = np.zeros((32, 32))
        ye = [y * ih // 32 for y in range(33)]
        xe = [x * iw // 32 for x in range(33)]
        for i in range(32):
            for j in range(32):
                out[i, j] = gray[ye[i]:ye[i + 1], xe[j]:xe[j + 1]].mean()
        n = 32
        dd = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                cu = np.sqrt(1 / n) if u == 0 else np.sqrt(2 / n)
                cv = np.sqrt(1 / n) if v == 0 else np.sqrt(2 / n)
                acc = 0.0
                for y in range(n):
                    for x in range(n):
                        acc += (out[y, x]
                                * np.cos(np.pi * (2 * y + 1) * u / (2 * n))
                                * np.cos(np.pi * (2 * x + 1) * v / (2 * n)))
                dd[u, v] = cu * cv * acc
        block = dd.reshape(-1)
        med = np.median(block[1:])
        val = 0
        for b in (block > med):
            val = (val << 1) | int(b)
        return val - (1 << 64) if val >= (1 << 63) else val

    pt = make_phash_fixture(6)
    pdec = {"image/png": _dpng, "image/jpeg": _djpg}
    prows = [(mid, mime, indep_phash(pdec[mime](p)))
             for mid, mime, p in zip(pt["media_id"].to_pylist(),
                                     pt["mime"].to_pylist(),
                                     pt["payload"].to_pylist())]
    pdf = pd.DataFrame(prows, columns=["media_id", "mime", "phash64"])
    goldens["image_phash"] = ("independent",
                              pdf.sort_values("media_id")
                              .reset_index(drop=True))
    def _bin_means(gray, out_h, out_w):
        ih, iw = gray.shape
        out = np.zeros((out_h, out_w))
        ye = [y * ih // out_h for y in range(out_h + 1)]
        xe = [x * iw // out_w for x in range(out_w + 1)]
        for i in range(out_h):
            for j in range(out_w):
                out[i, j] = gray[ye[i]:ye[i + 1], xe[j]:xe[j + 1]].mean()
        return out

    def _pack(bits):
        val = 0
        for b in bits:
            val = (val << 1) | int(b)
        return val - (1 << 64) if val >= (1 << 63) else val

    def indep_dhash(img):
        g = _bin_means(img.astype(np.float64).mean(axis=2), 8, 9)
        return _pack((g[:, :-1] > g[:, 1:]).reshape(-1))

    def indep_ahash(img):
        g = _bin_means(img.astype(np.float64).mean(axis=2), 8, 8)
        return _pack((g > g.mean()).reshape(-1))

    hrows = [(mid, indep_phash(pdec[mime](p)), indep_dhash(pdec[mime](p)),
              indep_ahash(pdec[mime](p)))
             for mid, mime, p in zip(pt["media_id"].to_pylist(),
                                     pt["mime"].to_pylist(),
                                     pt["payload"].to_pylist())]
    goldens["image_hashes"] = ("independent", pd.DataFrame(
        hrows, columns=["media_id", "phash64", "dhash64", "ahash64"])
        .sort_values("media_id").reset_index(drop=True))

    hs = pdf.sort_values("media_id")["phash64"].to_numpy()
    pair_rows = []
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            d = bin((int(hs[i]) ^ int(hs[j])) & ((1 << 64) - 1)).count("1")
            if d <= 7:
                pair_rows.append((i, j, d))
    goldens["phash_pairs"] = ("independent", pd.DataFrame(
        pair_rows, columns=["id_a", "id_b", "hamming"]))

    # WebDataset cross-shard image dedup: independent tarfile walk +
    # the same explicit-formula pHash + brute-force pairs + drop rule
    import tarfile as _tf2

    from xpshacl_ray.stages.multimodal import make_wds_dup_fixture

    wrows = []
    for path in make_wds_dup_fixture("/tmp/xpshacl_wds_dup"):
        with _tf2.open(path) as t:
            for m in t:
                if not m.isfile():
                    continue
                payload = t.extractfile(m).read()
                base = m.name.rsplit("/", 1)[-1]
                key, ext = base.split(".", 1)
                mime = {"png": "image/png", "jpg": "image/jpeg"}[ext]
                img = pdec[mime](payload)
                wrows.append((int(key), mime, indep_phash(img)))
    wdf = pd.DataFrame(wrows, columns=["media_id", "mime", "phash64"])
    wdf = wdf.sort_values("media_id").reset_index(drop=True)
    whs = wdf["phash64"].to_numpy()
    wids = wdf["media_id"].to_numpy()
    wdrop = set()
    for i in range(len(whs)):
        for j in range(i + 1, len(whs)):
            d = bin((int(whs[i]) ^ int(whs[j])) & ((1 << 64) - 1)
                    ).count("1")
            if d <= 7:
                wdrop.add(int(max(wids[i], wids[j])))
    wdf["keep"] = ~wdf["media_id"].isin(wdrop)
    goldens["wds_dedup"] = ("independent", wdf)

    # media integrity: the oracle IS the corruption plan — ok=false at
    # the planted ids, mimes straight from the fixture (no decoder)
    from xpshacl_ray.stages.multimodal import make_corrupt_media_table

    ct = make_corrupt_media_table(11)
    goldens["media_integrity"] = ("independent", pd.DataFrame({
        "media_id": np.asarray(ct["media_id"]).astype("int64"),
        "mime": ct["mime"].to_pylist(),
        "ok": [i not in (0, 3, 6) for i in range(11)],
    }))

    # EXIF extraction: the oracle is the fixture's construction PLAN
    # (orientation/make/model/iso per id), independent of the parser
    from xpshacl_ray.stages.exif import make_exif_fixture

    _t, plan = make_exif_fixture(8)
    edf = pd.DataFrame(plan)[["media_id", "has_exif", "make", "model",
                              "orientation", "iso"]]
    edf["orientation"] = edf["orientation"].astype("Int64")
    edf["iso"] = edf["iso"].astype("Int64")
    goldens["exif_extract"] = ("independent", edf)

    # audio fingerprints: INDEPENDENT per-frame reimplementation
    # (explicit frame loop, formula-built triangular mel filters) over
    # the decoded fixture clips + brute-force all-pairs Hamming
    from xpshacl_ray.stages.flac import decode_flac_audio as _dfa
    from xpshacl_ray.stages.multimodal import decode_wav as _dwav
    from xpshacl_ray.stages.multimodal import make_audio_dup_fixture

    def indep_afp(x, rate, n_fft=256, hop=128, n_bands=65):
        if len(x) < n_fft + hop:
            x = np.concatenate([x, np.zeros(n_fft + hop - len(x))])
        # formula-built mel filter bank
        def mel(f):
            return 2595.0 * np.log10(1.0 + f / 700.0)

        def imel(m):
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

        pts = imel(np.linspace(mel(0.0), mel(rate / 2.0), n_bands + 2))
        bins = np.floor((n_fft + 1) * pts / rate).astype(int)
        win = np.hanning(n_fft)
        n_frames = 1 + (len(x) - n_fft) // hop
        acc = np.zeros(n_bands)
        for fidx in range(n_frames):
            seg = x[fidx * hop:fidx * hop + n_fft] * win
            p = np.abs(np.fft.rfft(seg)) ** 2
            e = np.zeros(n_bands)
            for m in range(n_bands):
                lo, mid, hi = bins[m], bins[m + 1], bins[m + 2]
                for k in range(lo, mid):
                    e[m] += p[k] * (k - lo) / max(mid - lo, 1)
                for k in range(mid, hi):
                    e[m] += p[k] * (hi - k) / max(hi - mid, 1)
            acc += np.log10(e + 1e-12)
        env = acc / n_frames
        val = 0
        for b in (env[:-1] > env[1:]):
            val = (val << 1) | int(b)
        return val - (1 << 64) if val >= (1 << 63) else val

    at = make_audio_dup_fixture(5)
    arows = []
    for mid, mime, p in zip(at["media_id"].to_pylist(),
                            at["mime"].to_pylist(),
                            at["payload"].to_pylist()):
        dec = _dfa if mime == "audio/flac" else _dwav
        x, rate = dec(p)
        arows.append((mid, mime, indep_afp(x, rate)))
    adf2 = pd.DataFrame(arows, columns=["media_id", "mime", "afp64"])
    adf2 = adf2.sort_values("media_id").reset_index(drop=True)
    goldens["audio_fingerprint"] = ("independent", adf2)
    ah = adf2["afp64"].to_numpy()
    aids = adf2["media_id"].to_numpy()
    apairs = []
    for i in range(len(ah)):
        for j in range(i + 1, len(ah)):
            d = bin((int(ah[i]) ^ int(ah[j])) & ((1 << 64) - 1)).count("1")
            if d <= 7:
                apairs.append((int(aids[i]), int(aids[j]), d))
    goldens["audio_dup_pairs"] = ("independent", pd.DataFrame(
        apairs, columns=["id_a", "id_b", "hamming"]))

    # video near-dup: independent loop-dHash + per-bit majority over
    # the engine-sampled frames + brute-force pairs
    from xpshacl_ray.stages.multimodal import (
        decode_mp4_frames,
        make_video_dup_fixture,
    )

    def indep_vfp(payload, k=5):
        frames = decode_mp4_frames(payload, k)
        hashes = []
        for fr in frames:
            g = _bin_means(fr.astype(np.float64).mean(axis=2), 8, 9)
            hashes.append([int(g[r, c] > g[r, c + 1])
                           for r in range(8) for c in range(8)])
        maj = [int(sum(h[b] for h in hashes) * 2 > len(hashes))
               for b in range(64)]
        return _pack(maj)

    vt2 = make_video_dup_fixture(4)
    vfp = [(mid, indep_vfp(p)) for mid, p in
           zip(vt2["media_id"].to_pylist(), vt2["payload"].to_pylist())]
    vpairs = []
    for i in range(len(vfp)):
        for j in range(i + 1, len(vfp)):
            d = bin((vfp[i][1] ^ vfp[j][1]) & ((1 << 64) - 1)).count("1")
            if d <= 7:
                vpairs.append((vfp[i][0], vfp[j][0], d))
    goldens["video_dup_pairs"] = ("independent", pd.DataFrame(
        vpairs, columns=["id_a", "id_b", "hamming"]))

    # subtitle cues: the oracle is the fixture's cue PLAN (timings and
    # texts as constructed, independent of the parser)
    from xpshacl_ray.sources.subtitles import make_subtitle_fixture

    _st, splan = make_subtitle_fixture(4)
    sdf = pd.DataFrame(splan)[["doc_id", "cue_idx", "start_ms",
                               "end_ms", "text"]]
    goldens["subtitle_cues"] = ("independent", sdf.sort_values(
        ["doc_id", "cue_idx"]).reset_index(drop=True))

    # frame-caption alignment: computed from the fixture PLAN alone
    # (durations + cue windows — no container or subtitle parsing)
    from xpshacl_ray.sources.subtitles import make_av_fixture

    _avt, avplan = make_av_fixture(3)
    frows = []
    for doc in avplan:
        times = np.linspace(0, max(doc["duration_ms"] - 1, 0),
                            6).astype(np.int64)
        for si, t in enumerate(times):
            hit = next((c for c in doc["cues"]
                        if c["start_ms"] <= t < c["end_ms"]), None)
            frows.append((doc["doc_id"], si, int(t),
                          None if hit is None else hit["cue_idx"],
                          None if hit is None else hit["text"]))
    fdf = pd.DataFrame(frows, columns=["doc_id", "sample_idx", "t_ms",
                                       "cue_idx", "caption"])
    fdf["cue_idx"] = fdf["cue_idx"].astype("Int64")
    goldens["frame_captions"] = ("independent", fdf)

    # ID3 extraction: the oracle is the fixture's tag PLAN
    from xpshacl_ray.stages.id3 import make_id3_fixture

    _it, iplan = make_id3_fixture(6)
    idf = pd.DataFrame(iplan)[["media_id", "has_id3", "title", "artist",
                               "album", "year", "length_ms"]]
    idf["length_ms"] = idf["length_ms"].astype("Int64")
    goldens["id3_extract"] = ("independent", idf)

    # audio spectral features: ray-free direct stage call (frozen)
    from xpshacl_ray.stages.multimodal import AudioSpectral

    adf = AudioSpectral()(make_real_media_table(22)).to_pandas()
    adf = adf.sort_values("media_id").reset_index(drop=True)
    for j in range(AudioSpectral.N_MELS):
        adf[f"m{j}"] = np.round(adf[f"m{j}"].astype(float), 6)
    goldens["audio_spectral"] = ("frozen", adf)

    # zip-shard listing: INDEPENDENT stdlib-zipfile walk (incl. the
    # member-.gz inflation convention applied independently)
    import gzip as _gz
    import zipfile as _zf

    from xpshacl_ray.sources.tar import make_zip_fixture

    zrows = []
    for path in make_zip_fixture("/tmp/xpshacl_zip_fixture"):
        with _zf.ZipFile(path) as z:
            for info in z.infolist():
                if info.is_dir():
                    continue
                name, payload = info.filename, z.read(info.filename)
                if name.endswith(".gz"):
                    name, payload = name[:-3], _gz.decompress(payload)
                base = name.rsplit("/", 1)[-1]
                key, ext = (base.split(".", 1) + [""])[:2]
                ext = ext.lower()
                zrows.append((_os.path.basename(path), key, name, ext,
                              MIME_BY_EXT.get(ext.rsplit(".", 1)[-1],
                                              "application/octet-stream"),
                              len(payload),
                              _hl.sha256(payload).hexdigest()[:16]))
    zdf = pd.DataFrame(zrows, columns=["shard", "key", "member", "ext",
                                       "mime", "n_bytes", "sha16"])
    goldens["zip_ingest"] = ("independent",
                             zdf.sort_values(["shard", "member"])
                             .reset_index(drop=True))

    # video probe: ray-free direct stage call over the deterministic MP4
    # fixture (MJPEG + one AVC error-in-band row) — frozen snapshot
    from xpshacl_ray.stages.multimodal import VideoProbe, make_video_table

    vt = make_video_table(10)
    vdf = VideoProbe(3)(vt).to_pandas()
    for j in range(VideoProbe.FEATURE_DIM):
        vdf[f"f{j}"] = np.round(vdf[f"f{j}"].astype(float), 6)
    goldens["video_frames"] = ("frozen", vdf)

    # frozen engine snapshots (reference-parity strings pinned in tests/)
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    for name in ["justification_trees", "explanations"]:
        got = entrymod.queries()[name](SF_DIR)
        df = got.to_pandas() if hasattr(got, "to_pandas") else got
        goldens[name] = ("frozen", df.sort_values(list(df.columns)[0])
                         .reset_index(drop=True))
    ray.shutdown()

    # record the input fingerprint: goldens are pinned to THIS sf0.01
    # data — if the driver ever regenerates testdata differently, a red
    # golden row traces here instead of looking like an engine bug
    fps = {}
    for t in ["documents", "embeddings"]:
        with open(f"{SF_DIR}/{t}.parquet", "rb") as f:
            fps[t] = hashlib.sha256(f.read()).hexdigest()

    lines = [
        '"""AUTO-GENERATED by tools/make_goldens.py — do not hand-edit.',
        "",
        "Golden oracles (DuckDB VALUES-literal SQL) for driver queries with",
        "no closed-form SQL equivalent, computed at sf0.01.  Entries tagged",
        "'independent' come from from-scratch brute-force reimplementations",
        "in tools/make_goldens.py (all-pairs ground truth, no engine code);",
        "'frozen' entries snapshot engine output to pin regressions.",
        '"""',
        "",
        "# sha256 of the input parquet these goldens were computed from",
        f"INPUT_FINGERPRINT = {fps!r}",
        "",
        "GOLDEN_KIND = {",
    ]
    for name, (kind, _) in goldens.items():
        lines.append(f"    {name!r}: {kind!r},")
    lines.append("}")
    lines.append("")
    lines.append("GOLDEN_SQL = {")
    for name, (_, df) in goldens.items():
        # repr() escapes backslashes/quotes correctly for the generated
        # module (JSON goldens contain \" and \n that must survive import)
        lines.append(f"    {name!r}: {df_to_values_sql(df)!r},")
    lines.append("}")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    for name, (kind, df) in goldens.items():
        print(f"{name}: {kind}, {len(df)} rows")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
