"""Subtitle on-ramp (sources/subtitles.py): SRT + WebVTT parsing,
writers, edge cases, and the exploding actor stage."""

import numpy as np
import pytest
import ray.data

from xpshacl_ray.sources.subtitles import (
    SubtitleParser,
    make_subtitle_fixture,
    parse_subtitles,
    write_srt,
    write_vtt,
)


def test_srt_and_vtt_writer_parser_roundtrip():
    cues = [{"cue_idx": 0, "start_ms": 1500, "end_ms": 3250,
             "text": "hello world"},
            {"cue_idx": 1, "start_ms": 4000, "end_ms": 7999,
             "text": "second cue, two lines joined"}]
    assert parse_subtitles(write_srt(cues)) == cues
    assert parse_subtitles(write_vtt(cues, note="meta")) == cues


def test_vtt_edge_cases():
    # hourless timestamps, cue ids, NOTE blocks, multi-line bodies
    v = ("WEBVTT\n\nNOTE skip me\nmore note\n\n"
         "id-1\n01:02.500 --> 01:04.000 align:start\nhello\nworld\n")
    assert parse_subtitles(v) == [{"cue_idx": 0, "start_ms": 62500,
                                   "end_ms": 64000,
                                   "text": "hello world"}]
    # CRLF input and a bad timing line
    assert parse_subtitles("1\r\n00:00:01,000 --> 00:00:02,000\r\nx\r\n"
                           ) == [{"cue_idx": 0, "start_ms": 1000,
                                  "end_ms": 2000, "text": "x"}]
    with pytest.raises(ValueError, match="timing"):
        parse_subtitles("1\nnot a timing line\nx\n")


def test_stage_explodes_fixture_to_plan():
    table, plan = make_subtitle_fixture(4)
    out = (ray.data.from_arrow(table)
           .map_batches(SubtitleParser, batch_format="pyarrow",
                        concurrency=2)
           .to_pandas().sort_values(["doc_id", "cue_idx"])
           .reset_index(drop=True))
    assert len(out) == len(plan)
    for row in plan:
        got = out[(out["doc_id"] == row["doc_id"])
                  & (out["cue_idx"] == row["cue_idx"])].iloc[0]
        assert (int(got["start_ms"]), int(got["end_ms"]), got["text"]) \
            == (row["start_ms"], row["end_ms"], row["text"])
    # cues are non-overlapping and ordered within each doc
    for _d, g in out.groupby("doc_id"):
        g = g.sort_values("cue_idx")
        assert (g["end_ms"].to_numpy()[:-1]
                <= g["start_ms"].to_numpy()[1:]).all()
        assert (np.diff(g["start_ms"].to_numpy()) > 0).all()


def test_frame_caption_alignment_matches_plan():
    from xpshacl_ray.sources.subtitles import (
        FrameCaptionAligner,
        make_av_fixture,
    )

    table, plan = make_av_fixture(3)
    out = FrameCaptionAligner(6)(table).to_pandas()
    assert len(out) == 18
    for doc in plan:
        g = out[out["doc_id"] == doc["doc_id"]].sort_values("sample_idx")
        times = np.linspace(0, doc["duration_ms"] - 1, 6).astype(int)
        assert g["t_ms"].tolist() == times.tolist()  # container duration
        for t, cap in zip(times, g["caption"]):
            hit = next((c for c in doc["cues"]
                        if c["start_ms"] <= t < c["end_ms"]), None)
            if hit is None:
                assert cap is None or cap != cap
            else:
                assert cap == hit["text"]
    # at least one gap (null caption) and one match exist in the fixture
    assert out["caption"].isna().any() and out["caption"].notna().any()


# ---------------------------------------------------------------------------
# property-based fuzz (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_cue_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF,
                           blacklist_characters="\n\r"),
    min_size=1, max_size=60).map(lambda s: " ".join(s.split()) or "x")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3_000_000),
                          st.integers(1, 60_000), _cue_text),
                min_size=1, max_size=12),
       st.booleans())
def test_subtitle_roundtrip_fuzz(raw, use_vtt):
    # build strictly-increasing, non-overlapping cues from the raw data
    t = 0
    cues = []
    for start_off, dur, text in raw:
        start = t + start_off % 5000
        cues.append({"cue_idx": len(cues), "start_ms": start,
                     "end_ms": start + dur, "text": text})
        t = start + dur + 1
    doc = write_vtt(cues) if use_vtt else write_srt(cues)
    assert parse_subtitles(doc) == cues
