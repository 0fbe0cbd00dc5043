"""Subtitle on-ramp: SubRip (.srt) and WebVTT (.vtt) → cue rows.

Video-text training pairs come from subtitle tracks; this module parses
both common formats into ``(cue_idx, start_ms, end_ms, text)`` rows —
the alignment key for frame-caption pair mining.  Pure stdlib parsing;
a writer for each format keeps the parsers fixture-free.

SRT:  ``index\\nHH:MM:SS,mmm --> HH:MM:SS,mmm\\ntext...\\n\\n``
VTT:  ``WEBVTT`` header; cues ``[id\\n]HH:MM:SS.mmm --> HH:MM:SS.mmm
[settings]\\ntext...``; NOTE/STYLE blocks skipped.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import pyarrow as pa

_TS = re.compile(
    r"(?:(\d{1,2}):)?(\d{1,2}):(\d{2})[.,](\d{3})")
_ARROW = re.compile(
    r"(?:(?:\d{1,2}:)?\d{1,2}:\d{2}[.,]\d{3})\s*-->\s*"
    r"(?:(?:\d{1,2}:)?\d{1,2}:\d{2}[.,]\d{3})")


def _parse_ts(s: str) -> int:
    m = _TS.match(s.strip())
    if not m:
        raise ValueError(f"bad subtitle timestamp {s!r}")
    hh = int(m.group(1) or 0)
    return ((hh * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 \
        + int(m.group(4))


def parse_subtitles(text: str) -> List[Dict]:
    """SRT or VTT text → list of ``{cue_idx, start_ms, end_ms, text}``
    (format auto-detected via the WEBVTT header)."""
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    is_vtt = bool(lines) and lines[0].strip().startswith("WEBVTT")
    cues: List[Dict] = []
    i = 1 if is_vtt else 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        if is_vtt and (line.startswith("NOTE") or line == "STYLE"
                       or line == "REGION"):
            while i < n and lines[i].strip():
                i += 1
            continue
        # optional numeric index / cue id line before the timing line
        if "-->" not in line:
            i += 1
            if i >= n:
                break
            line = lines[i].strip()
        if "-->" not in line or not _ARROW.match(line):
            raise ValueError(f"expected a cue timing line, got {line!r}")
        start_s, end_s = line.split("-->")
        start = _parse_ts(start_s)
        end = _parse_ts(end_s)  # trailing cue settings ignored by regex
        i += 1
        body: List[str] = []
        while i < n and lines[i].strip():
            body.append(lines[i].strip())
            i += 1
        cues.append({"cue_idx": len(cues), "start_ms": start,
                     "end_ms": end, "text": " ".join(body)})
    return cues


def cues_to_table(doc_id: int, cues: List[Dict]) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([doc_id] * len(cues), pa.int64()),
        "cue_idx": pa.array([c["cue_idx"] for c in cues], pa.int64()),
        "start_ms": pa.array([c["start_ms"] for c in cues], pa.int64()),
        "end_ms": pa.array([c["end_ms"] for c in cues], pa.int64()),
        "text": pa.array([c["text"] for c in cues], pa.string()),
    })


class SubtitleParser:
    """Actor-pool stage: (doc_id, payload[, mime]) rows of SRT/VTT
    bytes → exploded cue rows (one row per cue)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for doc_id, payload in zip(batch["doc_id"].to_pylist(),
                                   batch["payload"].to_pylist()):
            cues = parse_subtitles(payload.decode("utf-8", "replace"))
            parts.append(cues_to_table(int(doc_id), cues))
        if not parts:
            return cues_to_table(0, [])[:0]
        return pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# writers (fixtures)
# ---------------------------------------------------------------------------


def _fmt_ts(ms: int, sep: str) -> str:
    s, msr = divmod(ms, 1000)
    m, ss = divmod(s, 60)
    h, mm = divmod(m, 60)
    return f"{h:02d}:{mm:02d}:{ss:02d}{sep}{msr:03d}"


def write_srt(cues: List[Dict]) -> str:
    out = []
    for i, c in enumerate(cues, 1):
        out.append(f"{i}\n{_fmt_ts(c['start_ms'], ',')} --> "
                   f"{_fmt_ts(c['end_ms'], ',')}\n{c['text']}\n")
    return "\n".join(out)


def write_vtt(cues: List[Dict], note: Optional[str] = None) -> str:
    out = ["WEBVTT", ""]
    if note:
        out += [f"NOTE {note}", ""]
    for c in cues:
        out.append(f"{_fmt_ts(c['start_ms'], '.')} --> "
                   f"{_fmt_ts(c['end_ms'], '.')} align:start")
        out.append(c["text"])
        out.append("")
    return "\n".join(out)


def make_subtitle_fixture(n_docs: int = 4, seed: int = 53):
    """Deterministic (doc_id, payload) SRT/VTT rows + the cue PLAN
    (the ground truth, independent of the parser)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ids, payloads, plan = [], [], []
    for d in range(n_docs):
        n_cues = int(rng.integers(3, 7))
        t = int(rng.integers(0, 5000))
        cues = []
        for ci in range(n_cues):
            dur = int(rng.integers(800, 4000))
            gap = int(rng.integers(0, 1500))
            cues.append({"cue_idx": ci, "start_ms": t,
                         "end_ms": t + dur,
                         "text": f"cue {ci} of doc {d} "
                                 f"({rng.integers(0, 1000)})"})
            t += dur + gap
        if d % 2 == 0:
            payloads.append(write_srt(cues).encode())
        else:
            payloads.append(write_vtt(cues, note="generated").encode())
        ids.append(d)
        for c in cues:
            plan.append({"doc_id": d, **c})
    table = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "payload": pa.array(payloads, pa.binary())})
    return table, plan


def make_av_fixture(n_docs: int = 3, seed: int = 59):
    """Deterministic audio-visual fixture: per doc an MJPEG MP4 (known
    frame count → known duration at 25 fps) + subtitle cues covering
    parts of it, plus the PLAN (durations + cue windows) — ground truth
    for frame-caption alignment, independent of the join code."""
    import numpy as np

    from xpshacl_ray.stages.multimodal import encode_mjpeg_mp4

    rng = np.random.default_rng(seed)
    ids, videos, subs, plan = [], [], [], []
    for d in range(n_docs):
        nf = int(rng.integers(8, 14))
        h, w = int(rng.integers(10, 20)), int(rng.integers(10, 20))
        frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        videos.append(encode_mjpeg_mp4(frames, quality=90))
        duration_ms = nf * 40  # encode_mjpeg_mp4's 40 ms sample delta
        cues, t = [], 0
        ci = 0
        while t < duration_ms - 60:
            dur = int(rng.integers(60, 160))
            gap = int(rng.integers(0, 80))
            end = min(t + dur, duration_ms)
            cues.append({"cue_idx": ci, "start_ms": t, "end_ms": end,
                         "text": f"d{d}c{ci}"})
            ci += 1
            t = end + gap
        subs.append(write_srt(cues).encode())
        ids.append(d)
        plan.append({"doc_id": d, "duration_ms": duration_ms,
                     "cues": cues})
    table = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "video": pa.array(videos, pa.binary()),
                      "subs": pa.array(subs, pa.binary())})
    return table, plan


class FrameCaptionAligner:
    """Actor-pool frame-caption pair miner: (doc_id, video, subs) rows
    → (doc_id, sample_idx, t_ms, cue_idx, caption) for ``k`` evenly-
    spaced sample times derived from the CONTAINER duration (no frame
    decodes — alignment is metadata-only), each matched to the covering
    cue (nulls when the time falls in a gap)."""

    def __init__(self, k: int = 6):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from xpshacl_ray.stages import mp4 as m

        cols = {"doc_id": [], "sample_idx": [], "t_ms": [],
                "cue_idx": [], "caption": []}
        for doc_id, video, subs in zip(batch["doc_id"].to_pylist(),
                                       batch["video"].to_pylist(),
                                       batch["subs"].to_pylist()):
            info = m.parse_mp4(video)
            duration_ms = int(round(info["duration_s"] * 1000))
            cues = parse_subtitles(subs.decode("utf-8", "replace"))
            times = np.linspace(0, max(duration_ms - 1, 0),
                                self.k).astype(np.int64)
            for si, t in enumerate(times):
                hit = next((c for c in cues
                            if c["start_ms"] <= t < c["end_ms"]), None)
                cols["doc_id"].append(int(doc_id))
                cols["sample_idx"].append(si)
                cols["t_ms"].append(int(t))
                cols["cue_idx"].append(None if hit is None
                                       else hit["cue_idx"])
                cols["caption"].append(None if hit is None
                                       else hit["text"])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "sample_idx": pa.array(cols["sample_idx"], pa.int64()),
            "t_ms": pa.array(cols["t_ms"], pa.int64()),
            "cue_idx": pa.array(cols["cue_idx"], pa.int64()),
            "caption": pa.array(cols["caption"], pa.string()),
        })
