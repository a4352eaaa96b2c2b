"""Plumbing tests for multimodal binary-column operators
(pd_utils_spark/extensions/multimodal.py). Codecs are stubbed
(fake=True); the Spark plumbing — schemas, Arrow batches, row
explosion — is real."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from pd_utils_spark.extensions import multimodal as M


@pytest.fixture()
def media(spark):
    pdf = pd.DataFrame(
        {
            "media_id": [0, 1, 2],
            "data": [b"\x00" * 128, bytes(range(256)), b""],
        }
    )
    return spark.createDataFrame(pdf)


class TestDecodeStub:
    def test_raises_without_codec(self, media):
        with pytest.raises(NotImplementedError, match="fake=True"):
            M.decode_image(media)

    def test_fake_decode_deterministic(self, media):
        out = M.decode_image(media, fake=True).toPandas().set_index("media_id")
        assert {"width", "height", "channels"} <= set(out.columns)
        w, h, c = M._fake_image_dims(b"\x00" * 128)
        assert (out.loc[0, "width"], out.loc[0, "height"], out.loc[0, "channels"]) == (w, h, c)
        # run twice -> identical (deterministic stub)
        again = M.decode_image(media, fake=True).toPandas().set_index("media_id")
        assert (out[["width", "height"]] == again[["width", "height"]]).all().all()


class TestByteFeatures:
    def test_entropy_and_histogram(self, media):
        out = M.byte_features(media).toPandas().set_index("media_id")
        # all-zero payload: entropy 0, all mass in bucket 0
        assert out.loc[0, "byte_entropy"] == 0.0
        assert out.loc[0, "byte_hist"][0] == pytest.approx(1.0)
        # uniform 0..255 payload: entropy 8 bits, uniform histogram
        assert out.loc[1, "byte_entropy"] == pytest.approx(8.0)
        assert out.loc[1, "byte_hist"][7] == pytest.approx(1 / 16)
        # empty payload: zeros, no crash
        assert out.loc[2, "n_bytes"] == 0
        assert out.loc[2, "byte_entropy"] == 0.0

    def test_input_columns_preserved(self, media):
        out = M.byte_features(media)
        assert out.columns[:2] == ["media_id", "data"]

    def test_bins_must_divide_256(self, media):
        # validated up front — not a runtime reshape error in the kernel
        with pytest.raises(ValueError, match="divide 256"):
            M.byte_features(media, bins=10)


class TestResizeStub:
    def test_fake_resize_binary_roundtrip(self, media):
        out = M.resize_images(media, 8, 8, fake=True).toPandas().set_index("media_id")
        expect = hashlib.md5(b"\x00" * 128 + b"8x8").digest()
        assert bytes(out.loc[0, "data"]) == expect
        assert all(len(bytes(d)) == 16 for d in out["data"])


class TestFrameSampling:
    def test_explodes_every_nth_frame(self, spark):
        payload = bytes(range(256))  # 4 frames of 64 bytes
        df = spark.createDataFrame(pd.DataFrame({"media_id": [7], "data": [payload]}))
        out = M.sample_video_frames(df, every_n=2, frame_size=64).toPandas()
        assert out.frame_index.tolist() == [0, 2]
        assert bytes(out.frame_data.iloc[0]) == payload[0:64]
        assert bytes(out.frame_data.iloc[1]) == payload[128:192]

    def test_short_payload_yields_no_frames(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"media_id": [1], "data": [b"tiny"]}))
        assert M.sample_video_frames(df, frame_size=64).count() == 0


class TestTextToMedia:
    def test_documents_adapter(self, spark):
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["hello"]})
        )
        out = M.text_to_media(docs).toPandas()
        assert list(out.columns) == ["media_id", "kind", "data", "mime"]
        assert bytes(out.data.iloc[0]) == b"hello"
