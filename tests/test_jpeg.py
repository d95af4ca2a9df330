"""Baseline JPEG codec (jpeg_codec.py): structural compliance, lossy
roundtrip bounds, exact DC-only closed form, loud rejection of unsupported
variants, and integration with the multimodal mapInPandas pipeline."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pgsf_spark.analytics.jpeg_codec import (
    AC_BITS,
    AC_VALS,
    DC_BITS,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_scaled_quant,
    rha,
)


def _gray(w, h, fn):
    return np.array([[fn(x, y) % 256 for x in range(w)] for y in range(h)], dtype=np.uint8)


class TestStructure:
    def test_zigzag_is_the_standard_order(self):
        # first 16 entries of the T.81 zigzag scan, hard-coded
        assert ZIGZAG[:16] == [
            (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
            (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
        ]
        assert sorted(ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]

    def test_huffman_tables_are_wellformed(self):
        assert sum(DC_BITS) == 12
        assert sum(AC_BITS) == len(AC_VALS) == 162
        # kraft inequality holds with equality margin for a prefix code
        assert sum(n / (1 << (i + 1)) for i, n in enumerate(AC_BITS)) <= 1

    def test_markers_and_dimensions(self):
        enc = encode_jpeg(_gray(24, 16, lambda x, y: x + y).tobytes(), 24, 16, 1)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        from pgsf_spark.analytics.multimodal import decode_image_meta

        assert decode_image_meta(enc) == ("jpeg", 24, 16)

    def test_quality_scaling(self):
        assert quality_scaled_quant(50)[0, 0] == 16  # Annex K as-is
        assert (quality_scaled_quant(100) == 1).all()
        assert (quality_scaled_quant(10) >= quality_scaled_quant(90)).all()


class TestRoundtrip:
    def test_gradient_quality90_tight(self):
        img = _gray(24, 16, lambda x, y: x * 3 + y * 5)
        w, h, c, px = decode_jpeg(encode_jpeg(img.tobytes(), 24, 16, 1, quality=90))
        assert (w, h, c) == (24, 16, 1)
        err = np.abs(np.frombuffer(px, dtype=np.uint8).reshape(16, 24).astype(int) - img)
        assert err.max() <= 2

    def test_quality100_near_lossless(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (16, 16), dtype=np.uint8)  # noise: worst case
        _w, _h, _c, px = decode_jpeg(encode_jpeg(img.tobytes(), 16, 16, 1, quality=100))
        err = np.abs(np.frombuffer(px, dtype=np.uint8).reshape(16, 16).astype(int) - img)
        assert err.max() <= 3  # unit quant table: only DCT rounding remains

    def test_odd_dimensions_pad_and_crop(self):
        img = _gray(13, 11, lambda x, y: x * 7 + y * 11)
        w, h, c, px = decode_jpeg(encode_jpeg(img.tobytes(), 13, 11, 1, quality=85))
        assert (w, h, c) == (13, 11, 1)
        err = np.abs(np.frombuffer(px, dtype=np.uint8).reshape(11, 13).astype(int) - img)
        assert err.max() <= 4

    def test_color_roundtrip(self):
        rgb = np.zeros((8, 16, 3), dtype=np.uint8)
        rgb[:, :, 0] = np.arange(16)[None, :] * 10 % 256
        rgb[:, :, 1] = 100
        rgb[:, :, 2] = np.arange(8)[:, None] * 20 % 256
        w, h, c, px = decode_jpeg(encode_jpeg(rgb.tobytes(), 16, 8, 3, quality=95))
        assert (w, h, c) == (16, 8, 3)
        err = np.abs(np.frombuffer(px, dtype=np.uint8).reshape(8, 16, 3).astype(int) - rgb)
        assert err.max() <= 4  # color convert + DCT, both lossy

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(8, 33),
        h=st.integers(8, 33),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_property_random_images_bounded_error(self, w, h, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        W, H, C, px = decode_jpeg(encode_jpeg(img.tobytes(), w, h, 1, quality=100))
        assert (W, H, C) == (w, h, 1)
        err = np.abs(np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int) - img)
        assert err.max() <= 3

    def test_deterministic(self):
        img = _gray(16, 16, lambda x, y: x * y)
        assert encode_jpeg(img.tobytes(), 16, 16, 1) == encode_jpeg(img.tobytes(), 16, 16, 1)


class TestDcOnlyClosedForm:
    @pytest.mark.parametrize("v", [0, 1, 7, 64, 127, 128, 129, 200, 254, 255])
    def test_block_constant_matches_oracle_formula(self, v):
        img = np.full((8, 8), v, dtype=np.uint8)
        _w, _h, _c, px = decode_jpeg(encode_jpeg(img.tobytes(), 8, 8, 1, quality=50))
        d = v - 128
        half = (abs(d) + 1) // 2
        expect = min(255, max(0, 128 + 2 * (half if d >= 0 else -half)))
        assert list(px) == [expect] * 64

    def test_rha_half_boundaries(self):
        assert rha(np.array([0.5, 1.5, -0.5, -1.5, 2.4999, 0.5 + 1e-13])).tolist() == [
            1.0, 2.0, -1.0, -2.0, 2.0, 1.0,
        ]


class TestRejection:
    def test_progressive_rejected(self):
        enc = bytearray(encode_jpeg(_gray(8, 8, lambda x, y: x).tobytes(), 8, 8, 1))
        i = enc.index(b"\xff\xc0")
        enc[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg(bytes(enc))

    def test_subsampling_rejected(self):
        enc = bytearray(encode_jpeg(_gray(8, 8, lambda x, y: x).tobytes(), 8, 8, 1))
        i = enc.index(b"\xff\xc0")
        enc[i + 11] = 0x22  # 2x2 sampling factors
        with pytest.raises(ValueError, match="subsampling"):
            decode_jpeg(bytes(enc))

    def test_restart_interval_rejected(self):
        enc = encode_jpeg(_gray(8, 8, lambda x, y: x).tobytes(), 8, 8, 1)
        i = enc.index(b"\xff\xda")
        dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
        with pytest.raises(ValueError, match="restart"):
            decode_jpeg(enc[:i] + dri + enc[i:])

    def test_fill_bytes_before_marker_accepted(self):
        # ADVICE r4 / ITU-T81 B.1.1.2: any number of 0xFF fill bytes may pad
        # before a marker; a padded-but-compliant stream must decode, and
        # identically to the unpadded one.
        img = _gray(16, 16, lambda x, y: 8 * x + y)
        enc = encode_jpeg(img.tobytes(), 16, 16, 1, quality=90)
        i = enc.index(b"\xff\xc0")  # pad before SOF0
        j = enc.index(b"\xff\xda")  # and before SOS
        padded = enc[:i] + b"\xff" * 3 + enc[i:j] + b"\xff" + enc[j:]
        assert decode_jpeg(padded) == decode_jpeg(enc)

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")

    def test_bad_channel_count(self):
        with pytest.raises(ValueError, match="channels"):
            encode_jpeg(b"\x00" * 64, 8, 8, 2)


class TestPipelineIntegration:
    def test_resize_images_handles_jpeg(self, spark):
        from pgsf_spark.analytics.multimodal import MEDIA_SCHEMA, resize_images

        img = _gray(24, 16, lambda x, y: x * 3 + y * 5)
        enc = encode_jpeg(img.tobytes(), 24, 16, 1, quality=90)
        df = spark.createDataFrame(
            [(1, "image", bytearray(enc), "jpeg", 24, 16, len(enc))], MEDIA_SCHEMA
        )
        row = resize_images(df, 12, 8).collect()[0]
        w, h, c, px = decode_jpeg(bytes(row["content"]))
        assert (w, h, c, row["meta_width"], row["meta_height"]) == (12, 8, 1, 12, 8)

    def test_image_ahash_jpeg_matches_png_for_same_pixels(self, spark):
        from pgsf_spark.analytics.multimodal import MEDIA_SCHEMA, encode_png, image_ahash

        # a high-contrast block pattern survives JPEG quantization, so the
        # perceptual hash of the JPEG equals the hash of the lossless PNG
        img = np.zeros((16, 16), dtype=np.uint8)
        img[:8, :8] = 255
        img[8:, 8:] = 255
        jp = encode_jpeg(img.tobytes(), 16, 16, 1, quality=90)
        pn = encode_png(img.tobytes(), 16, 16, 1)
        df = spark.createDataFrame(
            [
                (1, "image", bytearray(jp), None, None, None, None),
                (2, "image", bytearray(pn), None, None, None, None),
            ],
            MEDIA_SCHEMA,
        )
        rows = {r["media_id"]: (r["ahash_hi"], r["ahash_lo"]) for r in image_ahash(df).collect()}
        assert rows[1] == rows[2]


class TestMalformedPayloads:
    def test_truncated_entropy_raises_valueerror(self):
        enc = encode_jpeg(_gray(16, 16, lambda x, y: x * y).tobytes(), 16, 16, 1)
        for cut in (len(enc) // 2, len(enc) - 3, 20):
            with pytest.raises(ValueError):
                decode_jpeg(enc[:cut])

    def test_missing_dht_raises_valueerror(self):
        enc = encode_jpeg(_gray(8, 8, lambda x, y: x).tobytes(), 8, 8, 1)
        i = enc.index(b"\xff\xc4")
        (seglen,) = struct.unpack(">H", enc[i + 2 : i + 4])
        with pytest.raises(ValueError):
            decode_jpeg(enc[:i] + enc[i + 2 + seglen :])  # drop DC table

    def test_fill_byte_tail_raises_valueerror_not_indexerror(self):
        # ADVICE r5 (low): a stream ending in a run of 0xFF fill bytes left
        # pos at n-1 after the fill-skip loop, and content[pos + 1] raised
        # IndexError from _decode_jpeg directly -- breaking its documented
        # every-malformation-raises-ValueError contract for direct callers.
        from pgsf_spark.analytics.jpeg_codec import _decode_jpeg

        # tails of >=5 fill bytes reach the fill-skip loop (shorter ones
        # fail the outer pos+4<=n guard and raise "no SOS" instead)
        for tail in (b"\xff" * 5, b"\xff" * 9):
            with pytest.raises(ValueError, match="truncated after fill bytes"):
                _decode_jpeg(b"\xff\xd8" + tail)
        for tail in (b"\xff\xff", b"\xff\xff\xff"):
            with pytest.raises(ValueError):
                _decode_jpeg(b"\xff\xd8" + tail)

    def test_non_interleaved_scan_rejected(self):
        rgb = np.zeros((8, 8, 3), dtype=np.uint8)
        enc = bytearray(encode_jpeg(rgb.tobytes(), 8, 8, 3))
        i = enc.index(b"\xff\xda")
        # rewrite SOS to claim a single-component scan (non-interleaved)
        new_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
        (seglen,) = struct.unpack(">H", bytes(enc[i + 2 : i + 4]))
        with pytest.raises(ValueError, match="non-interleaved"):
            decode_jpeg(bytes(enc[:i]) + new_sos + bytes(enc[i + 2 + seglen :]))

    def test_resize_images_passes_corrupt_jpeg_through(self, spark):
        from pgsf_spark.analytics.multimodal import MEDIA_SCHEMA, resize_images

        enc = encode_jpeg(_gray(16, 16, lambda x, y: x + y).tobytes(), 16, 16, 1)
        trunc = enc[: len(enc) // 2]  # FF D8 FF prefix, truncated entropy
        df = spark.createDataFrame(
            [(1, "image", bytearray(trunc), "jpeg", 16, 16, len(trunc))], MEDIA_SCHEMA
        )
        row = resize_images(df, 8, 8).collect()[0]
        assert bytes(row["content"]) == trunc  # byte-identical pass-through
