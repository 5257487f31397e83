"""Multimodal plumbing: schemas, Arrow-batch UDF shapes, deterministic
fake decode (real codecs stubbed — not in this container)."""

from __future__ import annotations

import numpy as np
import pytest

from xsearch_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    return mm.synth_assets(spark, 30).persist()


def test_schema(assets):
    assert assets.schema == mm.ASSET_SCHEMA
    assert assets.count() == 30


def test_extract_meta_matches_declared(assets):
    meta = {r["asset_id"]: r for r in mm.extract_meta(assets).collect()}
    for r in assets.select("asset_id", "meta", "payload").collect():
        m = meta[r["asset_id"]]
        assert m["width"] == r["meta"]["width"]
        assert m["height"] == r["meta"]["height"]
        assert m["n_frames"] == r["meta"]["n_frames"]
        assert m["payload_bytes"] == len(r["payload"])


def test_decode_image_stub_and_fake():
    payload = mm._fake_payload(5, 12, 8, 1)
    with pytest.raises(NotImplementedError):
        mm.decode_image(payload)  # real codec path is stubbed
    img = mm.decode_image(payload, fake=True)
    assert img.shape == (8, 12)
    assert img.dtype == np.uint8


def test_extract_features_shape_and_norm(assets):
    feats = mm.extract_features(assets).collect()
    assert len(feats) == 30
    for r in feats:
        v = np.array(r["features"])
        assert v.shape == (mm.FEATURE_DIM,)
        assert abs(v.sum() - 1.0) < 1e-9


def test_features_deterministic(spark, assets):
    a = {r["asset_id"]: r["features"] for r in mm.extract_features(assets).collect()}
    b = {
        r["asset_id"]: r["features"]
        for r in mm.extract_features(mm.synth_assets(spark, 30)).collect()
    }
    assert a == b


def test_sample_frames(assets):
    frames = mm.sample_frames(assets, every=2).collect()
    metas = {
        r["asset_id"]: r["meta"]
        for r in assets.filter("media_type = 'video'").collect()
    }
    assert frames
    by_asset: dict[int, list] = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for aid, rows in by_asset.items():
        m = metas[aid]
        expect = len(range(0, m["n_frames"], 2))
        assert len(rows) == expect
        for r in rows:
            assert len(r["frame"]) == m["width"] * m["height"]
