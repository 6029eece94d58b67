"""Multimodal plumbing tests: schema, batch shape, determinism of the
byte-level features, stubbed decode, frame-sampling arithmetic, and the
span->media resolution join."""

from __future__ import annotations

import math

from pdf_extract_spark.operators import multimodal as M

N = 90
SEED = 5


def _media_df(spark):
    return spark.createDataFrame(M.make_media_corpus(N, seed=SEED), schema=M.MEDIA)


def test_media_features_deterministic_and_real(spark):
    df = _media_df(spark)
    rows = {r["media_ref"]: r for r in M.media_features(df).collect()}
    assert len(rows) == N
    corpus = {r["media_ref"]: r for r in M.make_media_corpus(N, seed=SEED)}
    for ref, r in rows.items():
        payload = bytes(corpus[ref]["content"])
        assert r["n_bytes"] == len(payload)
        assert len(r["histogram"]) == M.HIST_BINS
        assert math.isclose(sum(r["histogram"]), 1.0, abs_tol=1e-4)
        assert 0.0 <= r["byte_entropy"] <= 4.0  # 16 bins -> max 4 bits
    # rerun == same values (pure function of bytes)
    rows2 = {r["media_ref"]: r["phash64"] for r in M.media_features(df).collect()}
    assert rows2 == {k: v["phash64"] for k, v in rows.items()}


def test_decode_images_stub_shape(spark):
    df = _media_df(spark)
    out = M.decode_images(df).collect()
    n_images = sum(1 for r in M.make_media_corpus(N, seed=SEED) if r["kind"] == "image")
    assert len(out) == n_images
    for r in out:
        assert r["decoder"] == "stub"
        assert len(r["thumb"]) == M.THUMB_W * M.THUMB_H
        assert all(0.0 <= v <= 1.0 for v in r["thumb"])
        assert r["width"] > 0 and r["height"] > 0


def test_sample_frames_arithmetic(spark):
    df = _media_df(spark)
    out = M.sample_frames(df, fps=2.0)  # every 500 ms
    rows = out.collect()
    by_ref: dict[str, list] = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append((r["frame_idx"], r["ts_ms"]))
    corpus = {r["media_ref"]: r for r in M.make_media_corpus(N, seed=SEED)}
    for ref, frames in by_ref.items():
        dur = corpus[ref]["meta"]["duration_ms"]
        assert corpus[ref]["kind"] == "video"
        frames.sort()
        assert frames[0] == (0, 0)
        assert len(frames) == math.ceil(dur / 500)
        assert all(ts == i * 500 for i, ts in frames)


def test_join_spans_to_media(spark):
    """Extracted media spans resolve to payload rows by media_ref."""
    media = _media_df(spark)
    spans = spark.createDataFrame(
        [
            {"doc_id": "d1", "kind": "media", "media_ref": "m:000000", "offset": 3},
            {"doc_id": "d1", "kind": "P", "media_ref": "", "offset": 4},
            {"doc_id": "d2", "kind": "media", "media_ref": "m:000001", "offset": 0},
            {"doc_id": "d2", "kind": "media", "media_ref": "m:999999", "offset": 1},
        ],
        schema="doc_id string, kind string, media_ref string, offset int",
    )
    out = {(r["doc_id"], r["media_ref"]): r for r in M.join_spans_to_media(spans, media).collect()}
    assert len(out) == 3  # P span filtered out
    assert out[("d1", "m:000000")]["kind"] == "image"
    assert out[("d2", "m:999999")]["content"] is None  # unresolved ref survives as left join


def test_sample_frames_rejects_degenerate_fps(spark):
    """fps outside (0, 1000] must fail on the driver with a clear error,
    not crash every task with a zero sequence step or divide by zero."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("v0", "video", bytearray(b"x"), {"duration_ms": 3000,
                                           "width": None, "height": None})],
        "media_ref string, kind string, content binary, "
        "meta struct<duration_ms:long,width:int,height:int>",
    )
    for bad in (0.0, -1.0, 1500.0):
        with _pytest.raises(ValueError, match="fps must be"):
            M.sample_frames(df, fps=bad)
