"""PNG codec + multimodal operator tests.

The codec is the real work here: genuine chunk parsing, CRC validation,
zlib inflation, and filter reversal. Roundtrips are checked against the
raw pixel arrays (not against the encoder's own output), and each filter
type 0-4 is exercised explicitly — including the per-pixel Average/Paeth
recurrences the fixtures don't normally hit.
"""

from __future__ import annotations

import numpy as np
import pytest

from cig_etl_s3_to_sql_data_ingestor_spark.operators.multimodal import (
    attach_png,
    decode_image,
    image_features,
    make_png_codec,
    resize_image,
)

encode_png, decode_png = make_png_codec()


def _pixels(w, h, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter_type(ft):
    px = _pixels(23, 9)
    data = encode_png(px, filters=[ft] * 9)
    out = decode_png(data)
    assert out.dtype == np.uint8
    assert np.array_equal(out, px), f"filter {ft} roundtrip mismatch"


def test_roundtrip_mixed_filters_and_default_cycle():
    px = _pixels(64, 64, seed=3)
    assert np.array_equal(decode_png(encode_png(px, filters=[(3 + y) % 5 for y in range(64)])), px)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_roundtrip_degenerate_shapes():
    for w, h in [(1, 1), (1, 17), (17, 1)]:
        px = _pixels(w, h, seed=w * 100 + h)
        assert np.array_equal(decode_png(encode_png(px)), px)


def test_decoder_rejects_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png at all........")


def test_decoder_rejects_corrupt_crc():
    data = bytearray(encode_png(_pixels(8, 8)))
    # flip one byte inside the IDAT payload (after signature+IHDR chunk)
    idat_at = bytes(data).index(b"IDAT") + 6
    data[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_decoder_rejects_unsupported_color_type():
    import struct
    import zlib

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    # color type 2 (truecolor) — valid PNG, outside the codec's subset.
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="grayscale"):
        decode_png(data)


def test_attach_png_payloads_are_real_pngs(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(5)
    rows = attach_png(d).collect()
    assert len(rows) == 5
    for r in rows:
        px = decode_png(r.payload)  # driver-side decode of executor bytes
        assert px.shape == (r.meta.height, r.meta.width)
        base = r.doc_id * 31
        xs, ys = np.arange(r.meta.width), np.arange(r.meta.height)
        expect = ((base + 7 * xs[None, :] + 13 * ys[:, None]) % 256).astype(np.uint8)
        assert np.array_equal(px, expect)


def test_decode_image_stats_match_direct_formula(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(8)
    out = {r.doc_id: r for r in decode_image(attach_png(d)).collect()}
    for r in d.select("doc_id", "n_chars").collect():
        w, h = 1 + r.n_chars % 64, 1 + (r.n_chars * 7) % 64
        xs, ys = np.arange(w, dtype=np.int64), np.arange(h, dtype=np.int64)
        px = (r.doc_id * 31 + 7 * xs[None, :] + 13 * ys[:, None]) % 256
        got = out[r.doc_id]
        assert (got.width, got.height) == (w, h)
        assert got.decoded_bytes == w * h
        assert got.pixel_sum == int(px.sum())
        assert got.mean_pixel == pytest.approx(px.mean())


def test_resize_image_nearest_neighbor_semantics(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(8)
    out = {r.doc_id: r for r in resize_image(attach_png(d), max_side=32).collect()}
    for r in d.select("doc_id", "n_chars").collect():
        w, h = 1 + r.n_chars % 64, 1 + (r.n_chars * 7) % 64
        scale = min(1.0, 32 / max(w, h))
        ow, oh = max(1, int(np.floor(w * scale))), max(1, int(np.floor(h * scale)))
        sx = (np.arange(ow, dtype=np.int64) * w) // ow
        sy = (np.arange(oh, dtype=np.int64) * h) // oh
        px = (r.doc_id * 31 + 7 * sx[None, :] + 13 * sy[:, None]) % 256
        got = out[r.doc_id]
        assert (got.out_width, got.out_height) == (ow, oh)
        assert got.resized_pixel_sum == int(px.sum())


def test_image_features_integer_exact(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(8)
    out = {r.doc_id: r for r in image_features(attach_png(d)).collect()}
    for r in d.select("doc_id", "n_chars").collect():
        w, h = 1 + r.n_chars % 64, 1 + (r.n_chars * 7) % 64
        xs, ys = np.arange(w, dtype=np.int64), np.arange(h, dtype=np.int64)
        px = (r.doc_id * 31 + 7 * xs[None, :] + 13 * ys[:, None]) % 256
        got = out[r.doc_id]
        assert got.n_pixels == w * h
        assert got.min_pixel == int(px.min()) and got.max_pixel == int(px.max())
        assert got.n_distinct_pixels == int(np.unique(px).size)
        expect_grad = int(np.abs(np.diff(px, axis=1)).sum()) if w > 1 else 0
        assert got.grad_sum == expect_grad
