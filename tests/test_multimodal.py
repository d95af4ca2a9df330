"""Multimodal column plumbing tests: binary payloads + Arrow-batched
metadata extraction / resize / frame sampling (pixel decode stubbed; PNG and
JPEG dimension parsing are real byte-level parsers)."""

import pytest

from pgsf_spark.analytics.multimodal import (
    MEDIA_SCHEMA,
    decode_image_meta,
    extract_media_meta,
    frame_sample_plan,
    jpeg_dimensions,
    make_synthetic_jpeg,
    make_synthetic_png,
    resize_stub,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", make_synthetic_png(640, 480), None, None, None, None),
        (2, "image", make_synthetic_png(1920, 1080), None, None, None, None),
        (3, "image", make_synthetic_jpeg(800, 600), None, None, None, None),
        (4, "video", b"\x00" * 5000, None, None, None, None),
        (5, "image", None, None, None, None, None),
        (6, "image", b"\xff\xd8\xff\xe0garbage", None, None, None, None),  # truncated jpeg
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestDecode:
    def test_png_header_parsed_for_real(self):
        assert decode_image_meta(make_synthetic_png(640, 480)) == ("png", 640, 480)

    def test_jpeg_sof_parsed_for_real(self):
        assert decode_image_meta(make_synthetic_jpeg(800, 600)) == ("jpeg", 800, 600)
        assert decode_image_meta(make_synthetic_jpeg(1, 65535)) == ("jpeg", 1, 65535)

    def test_jpeg_dimensions_walks_past_other_segments(self):
        # APP0 precedes SOF0 in make_synthetic_jpeg; add a COM segment too
        import struct

        raw = make_synthetic_jpeg(320, 240)
        com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
        with_com = raw[:2] + com + raw[2:]
        assert jpeg_dimensions(with_com) == (320, 240)

    def test_jpeg_truncated_reports_unknown_dims(self):
        assert decode_image_meta(b"\xff\xd8\xff\xe0garbage") == ("jpeg", -1, -1)

    def test_junk_unknown(self):
        assert decode_image_meta(b"junkjunkjunk")[0] == "unknown"
        assert decode_image_meta(None)[0] == "unknown"


class TestMapInPandas:
    def test_extract_media_meta(self, media_df):
        out = {r["media_id"]: r for r in extract_media_meta(media_df).collect()}
        assert (out[1]["meta_format"], out[1]["meta_width"], out[1]["meta_height"]) == ("png", 640, 480)
        assert out[2]["meta_width"] == 1920
        assert (out[3]["meta_format"], out[3]["meta_width"], out[3]["meta_height"]) == ("jpeg", 800, 600)
        assert out[4]["meta_format"] == "unknown" and out[4]["meta_bytes"] == 5000
        assert out[5]["meta_bytes"] == 0
        assert (out[6]["meta_format"], out[6]["meta_width"]) == ("jpeg", -1)  # truncated, no crash

    def test_schema_stable(self, media_df):
        out = extract_media_meta(media_df)
        assert out.schema.fieldNames() == MEDIA_SCHEMA.fieldNames()

    def test_resize_updates_meta_keeps_bytes(self, media_df):
        meta = extract_media_meta(media_df)
        resized = resize_stub(meta, 224, 224)
        r = {x["media_id"]: x for x in resized.collect()}
        assert r[1]["meta_width"] == 224 and r[1]["meta_height"] == 224
        assert bytes(r[1]["content"]) == make_synthetic_png(640, 480)  # payload untouched

    def test_frame_sampling(self, media_df):
        meta = extract_media_meta(media_df)
        frames = frame_sample_plan(meta, every_n=2).collect()
        # video #4: 5000 bytes -> 6 stub frames, sampled every 2 -> 3 rows
        assert {f["media_id"] for f in frames} == {4}
        assert [f["frame_idx"] for f in frames] == [0, 2, 4]
