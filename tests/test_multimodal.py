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


def _pixels(w, h, seed=7, ch=None):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def _doc_pixels(doc_id, n_chars, frame=0):
    """The attach_png generative formula: channels cycle doc_id % 3 over
    1/3/4; channel c of pixel (x, y) = (did*31 + 7x + 13y + 17f + 19c)
    mod 256. Returns 2-D for gray docs (the decoder's shape contract)."""
    w, h = 1 + n_chars % 64, 1 + (n_chars * 7) % 64
    ch = (1, 3, 4)[doc_id % 3]
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    cs = np.arange(ch, dtype=np.int64)
    px = (
        doc_id * 31 + 7 * xs[None, :, None] + 13 * ys[:, None, None]
        + 17 * frame + 19 * cs[None, None, :]
    ) % 256
    return (px[:, :, 0] if ch == 1 else px).astype(np.uint8)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter_type(ft):
    px = _pixels(23, 9)
    data = encode_png(px, filters=[ft] * 9)
    out = decode_png(data)
    assert out.dtype == np.uint8
    assert np.array_equal(out, px), f"filter {ft} roundtrip mismatch"


@pytest.mark.parametrize("ch", [3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_color_each_filter_type(ft, ch):
    """RGB/RGBA exercise the bpp-strided left neighbor in every filter."""
    px = _pixels(23, 9, seed=ft * 10 + ch, ch=ch)
    out = decode_png(encode_png(px, filters=[ft] * 9))
    assert out.shape == (9, 23, ch)
    assert np.array_equal(out, px), f"filter {ft} ch {ch} roundtrip mismatch"


def test_roundtrip_mixed_filters_and_default_cycle():
    px = _pixels(64, 64, seed=3)
    assert np.array_equal(decode_png(encode_png(px, filters=[(3 + y) % 5 for y in range(64)])), px)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_roundtrip_color_mixed_filters():
    for ch in (3, 4):
        px = _pixels(31, 17, seed=ch, ch=ch)
        filters = [(3 + y) % 5 for y in range(17)]
        assert np.array_equal(decode_png(encode_png(px, filters=filters)), px)


def test_roundtrip_degenerate_shapes():
    for w, h in [(1, 1), (1, 17), (17, 1)]:
        px = _pixels(w, h, seed=w * 100 + h)
        assert np.array_equal(decode_png(encode_png(px)), px)
        for ch in (3, 4):
            pxc = _pixels(w, h, seed=w * 100 + h + ch, ch=ch)
            assert np.array_equal(decode_png(encode_png(pxc)), pxc)


def test_explicit_3d_single_channel_decodes_to_2d():
    """(h, w, 1) input encodes as grayscale; decode returns the 2-D
    shape per the codec's shape contract."""
    px = _pixels(5, 4, seed=9, ch=1)
    out = decode_png(encode_png(px))
    assert out.shape == (4, 5)
    assert np.array_equal(out, px[:, :, 0])


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


def _chunk(tag, payload):
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def test_decoder_rejects_bad_depth_combos():
    import struct

    # depth 2 RGB — illegal combination per the spec.
    ihdr = struct.pack(">IIBBBBB", 2, 2, 2, 2, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(data)


ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_png(px, filters_cycle=True):
    """Hand-built Adam7-interlaced PNG (8-bit, any channel layout):
    split pixels into the seven passes, filter each pass's scanlines
    independently (cycling None/Sub/Up when filters_cycle)."""
    import struct
    import zlib

    if px.ndim == 2:
        px3 = px[:, :, None]
    else:
        px3 = px
    h, w, ch = px3.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for x0, y0, xs, ys in ADAM7:
        sub = px3[y0::ys, x0::xs]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        nb = pw * ch
        prev = np.zeros(nb, dtype=np.int64)
        for y in range(ph):
            row = sub[y].astype(np.int64).reshape(nb)
            ft = (y % 3) if filters_cycle else 0
            left = (
                np.concatenate((np.zeros(ch, dtype=np.int64), row[:-ch]))
                if nb > ch
                else np.zeros(nb, dtype=np.int64)
            )
            filt = (row, row - left, row - prev)[ft]
            raw.append(ft)
            raw.extend((filt % 256).astype(np.uint8).tobytes())
            prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_adam7_interlaced_decode(ch):
    """Adam7 passes deinterlace back to the original image for gray,
    RGB and RGBA — including canvases smaller than one 8x8 tile."""
    for w, h in [(13, 9), (3, 2), (8, 8), (1, 1)]:
        px = _pixels(w, h, seed=ch * 100 + w, ch=None if ch == 1 else ch)
        out = decode_png(_adam7_png(px))
        assert np.array_equal(out, px), (ch, w, h)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_16bit_roundtrip_all_color_types(ch):
    """Depth-16 (big-endian samples, 2-byte-strided filters) roundtrips
    for every non-palette color type; gray returns 2-D uint16."""
    rng = np.random.default_rng(90 + ch)
    shape = (5, 11) if ch == 1 else (5, 11, ch)
    px = rng.integers(0, 65536, size=shape, dtype=np.uint16)
    for ft in range(5):
        out = decode_png(encode_png(px, filters=[ft] * 5))
        assert out.dtype == np.uint16
        assert np.array_equal(out, px), f"ch {ch} filter {ft}"


def test_gray_alpha_roundtrip():
    """Color type 4 (gray+alpha, bpp=2) roundtrips through every filter."""
    for ft in range(5):
        px = _pixels(14, 9, seed=60 + ft, ch=2)
        out = decode_png(encode_png(px, filters=[ft] * 9))
        assert out.shape == (9, 14, 2)
        assert np.array_equal(out, px), f"filter {ft}"


def _palette_png(idxs, palette, with_trns=False, drop_plte=False):
    """Hand-built color-type-3 PNG: per-row filter byte 0 + raw indices."""
    import struct
    import zlib

    h, w = idxs.shape
    raw = b"".join(b"\x00" + idxs[y].tobytes() for y in range(h))
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    )
    if not drop_plte:
        out += _chunk(b"PLTE", palette.tobytes())
    if with_trns:
        out += _chunk(b"tRNS", bytes([128] * len(palette)))
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_palette_png_decodes_through_plte():
    """Color type 3 (the common small-graphics form) expands indices
    through the PLTE lookup to (h, w, 3) RGB; indices filter as bpp=1."""
    rng = np.random.default_rng(5)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idxs = rng.integers(0, 16, size=(6, 9), dtype=np.uint8)
    out = decode_png(_palette_png(idxs, palette))
    assert out.shape == (6, 9, 3)
    assert np.array_equal(out, palette[idxs])


def test_palette_trns_decodes_to_rgba():
    """A palette tRNS alpha table (the common transparent-web-PNG form)
    decodes to RGBA — alpha semantics survive, never dropped."""
    rng = np.random.default_rng(6)
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idxs = rng.integers(0, 4, size=(3, 3), dtype=np.uint8)
    out = decode_png(_palette_png(idxs, palette, with_trns=True))
    assert out.shape == (3, 3, 4)
    assert np.array_equal(out[:, :, :3], palette[idxs])
    assert (out[:, :, 3] == 128).all()  # the test table sets every alpha


def test_palette_png_rejections_are_loud():
    rng = np.random.default_rng(6)
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idxs = rng.integers(0, 4, size=(3, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_palette_png(idxs, palette, drop_plte=True))
    bad = idxs.copy()
    bad[0, 0] = 9  # beyond the 4-entry palette
    with pytest.raises(ValueError, match="index out of range"):
        decode_png(_palette_png(bad, palette))


def test_gray_and_rgb_trns_add_alpha_channel():
    """Gray/RGB single-transparent-sample tRNS decodes to an explicit
    alpha channel with 0 exactly at matching pixels."""
    import struct
    import zlib

    # Gray depth 8: transparent value 7.
    g = np.array([[7, 8], [9, 7]], dtype=np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(2))
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"tRNS", struct.pack(">H", 7))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (2, 2, 2)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], np.where(g == 7, 0, 255))

    # RGB depth 8: transparent color (1, 2, 3).
    px = np.array(
        [[[1, 2, 3], [1, 2, 4]], [[9, 9, 9], [1, 2, 3]]], dtype=np.uint8
    )
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(2))
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (2, 2, 4)
    assert np.array_equal(out[:, :, :3], px)
    assert np.array_equal(
        out[:, :, 3], np.array([[0, 255], [255, 0]], dtype=np.uint8)
    )


def test_attach_png_payloads_are_real_pngs(spark, sf_dir):
    """limit(9) spans all three channel layouts (doc_id % 3)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(9)
    rows = attach_png(d).collect()
    assert len(rows) == 9
    seen_ch = set()
    for r in rows:
        px = decode_png(r.payload)  # driver-side decode of executor bytes
        ch = 1 if px.ndim == 2 else px.shape[2]
        seen_ch.add(ch)
        assert ch == r.meta.n_channels == (1, 3, 4)[r.doc_id % 3]
        assert px.shape[:2] == (r.meta.height, r.meta.width)
    nchars = {x.doc_id: x.n_chars for x in d.select("doc_id", "n_chars").collect()}
    for r in rows:
        expect = _doc_pixels(r.doc_id, nchars[r.doc_id])
        assert np.array_equal(decode_png(r.payload), expect)
    assert seen_ch == {1, 3, 4}


def test_decode_image_stats_match_direct_formula(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(9)
    out = {r.doc_id: r for r in decode_image(attach_png(d)).collect()}
    for r in d.select("doc_id", "n_chars").collect():
        w, h = 1 + r.n_chars % 64, 1 + (r.n_chars * 7) % 64
        ch = (1, 3, 4)[r.doc_id % 3]
        px = _doc_pixels(r.doc_id, r.n_chars).astype(np.int64)
        got = out[r.doc_id]
        assert (got.width, got.height, got.n_channels) == (w, h, ch)
        assert got.decoded_bytes == w * h * ch
        assert got.pixel_sum == int(px.sum())
        assert got.mean_pixel == pytest.approx(px.mean())


def test_resize_image_nearest_neighbor_semantics(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(9)
    out = {r.doc_id: r for r in resize_image(attach_png(d), max_side=32).collect()}
    for r in d.select("doc_id", "n_chars").collect():
        w, h = 1 + r.n_chars % 64, 1 + (r.n_chars * 7) % 64
        scale = min(1.0, 32 / max(w, h))
        ow, oh = max(1, int(np.floor(w * scale))), max(1, int(np.floor(h * scale)))
        sx = (np.arange(ow, dtype=np.int64) * w) // ow
        sy = (np.arange(oh, dtype=np.int64) * h) // oh
        px = _doc_pixels(r.doc_id, r.n_chars).astype(np.int64)
        if px.ndim == 2:
            px = px[:, :, None]
        res = px[sy][:, sx, :]
        got = out[r.doc_id]
        assert (got.out_width, got.out_height) == (ow, oh)
        assert got.n_channels == px.shape[2]
        assert got.resized_bytes == ow * oh * px.shape[2]
        assert got.resized_pixel_sum == int(res.sum())


def test_image_features_integer_exact(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(9)
    out = {r.doc_id: r for r in image_features(attach_png(d)).collect()}
    for r in d.select("doc_id", "n_chars").collect():
        w, h = 1 + r.n_chars % 64, 1 + (r.n_chars * 7) % 64
        px = _doc_pixels(r.doc_id, r.n_chars).astype(np.int64)
        if px.ndim == 2:
            px = px[:, :, None]
        got = out[r.doc_id]
        assert got.n_pixels == w * h
        assert got.n_channels == px.shape[2]
        assert got.min_pixel == int(px.min()) and got.max_pixel == int(px.max())
        assert got.n_distinct_pixels == int(np.unique(px).size)
        expect_grad = int(np.abs(np.diff(px, axis=1)).sum()) if w > 1 else 0
        assert got.grad_sum == expect_grad


# ---- APNG (multi-frame) codec -------------------------------------------


from cig_etl_s3_to_sql_data_ingestor_spark.operators.multimodal import (  # noqa: E402
    attach_wav,
    audio_features,
    make_apng_codec,
    make_wav_codec,
    sample_frames,
)

encode_apng, decode_apng_frames = make_apng_codec()
encode_wav, decode_wav = make_wav_codec()


def _frames(w, h, n, seed=11):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(n)]


def test_apng_roundtrip_all_frames():
    frames = _frames(19, 7, 6)
    out, w, h, n = decode_apng_frames(encode_apng(frames))
    assert (w, h, n) == (19, 7, 6)
    for i, fr in enumerate(frames):
        assert np.array_equal(out[i], fr), f"frame {i}"


def test_apng_metadata_probe_inflates_nothing():
    """wanted=[] must do the CRC-validated chunk walk but never inflate —
    proven by poisoning every frame's compressed stream: the probe still
    succeeds (streams aren't touched) while a full decode fails."""
    frames = _frames(9, 5, 4)
    data = bytearray(encode_apng(frames))
    # corrupt one byte inside each fdAT/IDAT payload AND fix up its CRC,
    # so the chunk walk passes but zlib inflation cannot.
    import struct
    import zlib

    pos = 8
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        if tag in (b"IDAT", b"fdAT") and length > 8:
            data[pos + 8 + length - 1] ^= 0xFF
            payload = bytes(data[pos + 8 : pos + 8 + length])
            data[pos + 8 + length : pos + 12 + length] = struct.pack(
                ">I", zlib.crc32(tag + payload) & 0xFFFFFFFF
            )
        pos += 12 + length
    probe, w, h, n = decode_apng_frames(bytes(data), wanted=[])
    assert probe == {} and (w, h, n) == (9, 5, 4)
    with pytest.raises(Exception):
        decode_apng_frames(bytes(data))


def test_apng_partial_decode_selects_indices():
    frames = _frames(12, 12, 7)
    out, _, _, n = decode_apng_frames(encode_apng(frames), wanted=[0, 3, 6, 99])
    assert sorted(out) == [0, 3, 6]  # out-of-range ignored
    assert np.array_equal(out[3], frames[3])


def test_apng_decoder_accepts_plain_png():
    px = _pixels(10, 4)
    out, w, h, n = decode_apng_frames(encode_png(px))
    assert n == 1 and np.array_equal(out[0], px)


def test_apng_frame0_readable_by_plain_png_decoder():
    """Downstream single-frame consumers (decode_image etc.) must read
    frame 0 of an APNG through the ordinary PNG path."""
    frames = _frames(8, 8, 3)
    assert np.array_equal(decode_png(encode_apng(frames)), frames[0])


def test_apng_rejects_frame_count_mismatch():
    frames = _frames(6, 6, 3)
    data = bytearray(encode_apng(frames))
    import struct
    import zlib

    at = bytes(data).index(b"acTL") + 4
    data[at : at + 4] = struct.pack(">I", 5)  # lie about the frame count
    payload = bytes(data[at : at + 8])
    data[at + 8 : at + 12] = struct.pack(
        ">I", zlib.crc32(b"acTL" + payload) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="declares"):
        decode_apng_frames(bytes(data), wanted=[])


# ---- WAV codec -----------------------------------------------------------


def test_wav_roundtrip():
    s = ((np.arange(1000, dtype=np.int64) * 2654435761) % 65536 - 32768).astype(
        np.int16
    )
    out, rate = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000
    assert np.array_equal(out, s)


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)


def _wav_container(fmt_code, channels, bits, payload, rate=8000):
    import struct

    return (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, fmt_code, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits,
        )
        + b"data" + struct.pack("<I", len(payload)) + payload
    )


def test_wav_rejects_float_format():
    with pytest.raises(NotImplementedError, match="integer PCM"):
        decode_wav(_wav_container(3, 2, 32, b""))


def test_wav_decodes_pcm8_unsigned():
    """Spec: 8-bit PCM is UNSIGNED, midpoint 128 — decode re-centers."""
    raw = bytes([0, 128, 255, 1])
    out, rate = decode_wav(_wav_container(1, 1, 8, raw))
    assert rate == 8000
    assert out.tolist() == [-128, 0, 127, -127]


def test_wav_decodes_pcm24_signed_le():
    def pack24(vals):
        return b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )

    vals = [0, 1, -1, 8_388_607, -8_388_608, -12345]
    out, _ = decode_wav(_wav_container(1, 1, 24, pack24(vals)))
    assert out.tolist() == vals

    # stereo: interleaved frames de-interleave to (n, 2)
    stereo = [10, -10, 300_000, -300_000]
    out2, _ = decode_wav(_wav_container(1, 2, 24, pack24(stereo)))
    assert out2.shape == (2, 2)
    assert out2.tolist() == [[10, -10], [300_000, -300_000]]

    with pytest.raises(ValueError, match="whole samples"):
        decode_wav(_wav_container(1, 1, 24, b"\x00\x01"))


# ---- Spark-side operators ------------------------------------------------


def test_sample_frames_matches_formula(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(40)
    rows = (
        sample_frames(attach_png(d), every_nth=3)
        .orderBy("doc_id", "frame_idx")
        .collect()
    )
    assert rows
    seen_ch = set()
    for r in rows[:60]:
        assert r.frame_idx % 3 == 0 and r.frame_idx < r.n_frames
        assert r.n_channels == (1, 3, 4)[r.doc_id % 3]
        seen_ch.add(r.n_channels)
        w, h, ch = r.width, r.height, r.n_channels
        xs = np.arange(w, dtype=np.int64)
        ys = np.arange(h, dtype=np.int64)
        cs = np.arange(ch, dtype=np.int64)
        expect = int(
            (
                (r.doc_id * 31 + 7 * xs[None, :, None] + 13 * ys[:, None, None]
                 + 17 * r.frame_idx + 19 * cs[None, None, :]) % 256
            ).sum()
        )
        assert r.pixel_sum == expect, (r.doc_id, r.frame_idx)
        assert r.mean_pixel == pytest.approx(expect / (w * h * ch))
    assert seen_ch == {1, 3, 4}


def test_audio_features_match_formula(spark, sf_dir):
    """Covers mono (even doc_id) and stereo (odd doc_id) clips."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(40)
    rows = audio_features(attach_wav(d)).orderBy("doc_id").collect()
    assert rows
    seen_ch = set()
    for r in rows[:50]:
        assert r.n_channels == 1 + r.doc_id % 2
        seen_ch.add(r.n_channels)
        i = np.arange(r.n_samples, dtype=np.int64)
        cs = np.arange(r.n_channels, dtype=np.int64)
        s = (
            r.doc_id * 7919 + i[:, None] * 2654435761 + 97 * cs[None, :]
        ) % 65536 - 32768
        assert r.sum_sq == int((s * s).sum())
        assert r.peak == int(np.abs(s).max())
        assert r.zero_crossings == int(((s[:-1, :] * s[1:, :]) < 0).sum())
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate
    assert seen_ch == {1, 2}


def test_wav_stereo_roundtrip_interleaved():
    """Multi-channel encode→decode is lossless and truly interleaved:
    byte i of the data chunk belongs to frame i//(2*ch), channel
    (i//2)%ch."""
    n, ch = 300, 2
    s = (
        (np.arange(n * ch, dtype=np.int64) * 2654435761) % 65536 - 32768
    ).astype(np.int16).reshape(n, ch)
    data = encode_wav(s, rate=44100)
    out, rate = decode_wav(data)
    assert rate == 44100 and out.shape == (n, ch)
    assert np.array_equal(out, s)
    # interleaving check against the raw container bytes
    raw = data[data.index(b"data") + 8 :]
    flat = np.frombuffer(raw, dtype="<i2")
    assert np.array_equal(flat.reshape(n, ch), s)


# ---- property-based codec roundtrip --------------------------------------


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, ch, seed, data):
    """Any (shape, channels, per-row filter sequence) roundtrips
    losslessly — the unfilter recurrences (incl. the bpp-strided
    left/upper-left neighbors) are exact inverses for arbitrary pixel
    data, not just the fixture formulas."""
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    px = _pixels(w, h, seed=seed, ch=None if ch == 1 else ch)
    out = decode_png(encode_png(px, filters=filters))
    assert np.array_equal(out, px)


# ---- APNG delta (sub-frame) compositing ----------------------------------


def _idat_payload(png_bytes):
    import struct

    pos, out = 8, bytearray()
    while pos + 12 <= len(png_bytes):
        (length,) = struct.unpack(">I", png_bytes[pos : pos + 4])
        if png_bytes[pos + 4 : pos + 8] == b"IDAT":
            out += png_bytes[pos + 8 : pos + 8 + length]
        pos += 12 + length
    return bytes(out)


def _delta_apng(canvas_wh, frames, color_type=0):
    """Hand-built APNG with per-frame (pixels, x, y, dispose, blend);
    depth follows the frame dtype (uint16 -> 16)."""
    import struct

    w, h = canvas_wh
    depth = 16 if frames[0][0].dtype == np.uint16 else 8
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    )
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for k, (px, x, y, dispose, blend) in enumerate(frames):
        fh, fw = px.shape[:2]
        out += _chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", seq, fw, fh, x, y, 1, 10, dispose, blend),
        )
        seq += 1
        stream = _idat_payload(encode_png(px))
        if k == 0:
            out += _chunk(b"IDAT", stream)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + stream)
            seq += 1
    return bytes(out + _chunk(b"IEND", b""))


def test_apng_delta_frames_composite_on_canvas():
    """Sub-rectangle SOURCE frames with dispose NONE accumulate; every
    returned frame is the full composited canvas."""
    base = _pixels(8, 6, seed=1)
    patch = _pixels(3, 2, seed=2)  # (2 rows, 3 cols)
    data = _delta_apng(
        (8, 6),
        [(base, 0, 0, 0, 0), (patch, 4, 3, 0, 0)],
    )
    out, w, h, n = decode_apng_frames(data)
    assert (w, h, n) == (8, 6, 2)
    assert np.array_equal(out[0], base)
    expect = base.copy()
    expect[3:5, 4:7] = patch
    assert np.array_equal(out[1], expect)


def test_apng_delta_dispose_background_and_previous():
    base = _pixels(6, 6, seed=3)
    p1 = _pixels(2, 2, seed=4)
    p2 = _pixels(2, 2, seed=5)
    # frame 1 disposes to BACKGROUND: its region is cleared before f2.
    data = _delta_apng(
        (6, 6),
        [(base, 0, 0, 0, 0), (p1, 1, 1, 1, 0), (p2, 4, 4, 0, 0)],
    )
    out, _, _, _ = decode_apng_frames(data, wanted=[2])
    expect = base.copy()
    expect[1:3, 1:3] = 0  # p1's region cleared by its dispose
    expect[4:6, 4:6] = p2
    assert np.array_equal(out[2], expect)

    # dispose PREVIOUS reverts p1's region to the base content.
    data = _delta_apng(
        (6, 6),
        [(base, 0, 0, 0, 0), (p1, 1, 1, 2, 0), (p2, 4, 4, 0, 0)],
    )
    out, _, _, _ = decode_apng_frames(data, wanted=[2])
    expect = base.copy()
    expect[4:6, 4:6] = p2
    assert np.array_equal(out[2], expect)


def test_apng_delta_blend_over_rules():
    # OVER on an alpha-free type == SOURCE (accepted).
    base = _pixels(5, 5, seed=6, ch=3)
    patch = _pixels(2, 2, seed=7, ch=3)
    data = _delta_apng(
        (5, 5), [(base, 0, 0, 0, 0), (patch, 2, 2, 0, 1)], color_type=2
    )
    out, _, _, _ = decode_apng_frames(data)
    expect = base.copy()
    expect[2:4, 2:4] = patch
    assert np.array_equal(out[1], expect)

    # OVER onto RGBA composites with exact integer source-over math —
    # verify cell-by-cell against an independent pure-Python model.
    base4 = _pixels(5, 5, seed=8, ch=4)
    patch4 = _pixels(2, 2, seed=9, ch=4)
    data = _delta_apng(
        (5, 5), [(base4, 0, 0, 0, 0), (patch4, 2, 2, 0, 1)], color_type=6
    )
    out, _, _, _ = decode_apng_frames(data)

    def py_over(dst_px, src_px):
        sa, da = src_px[3], dst_px[3]
        na = sa * 255 + da * (255 - sa)  # out_a * 255, exact
        chans = []
        for c in range(3):
            num = sa * src_px[c] * 255 + da * dst_px[c] * (255 - sa)
            chans.append((num + na // 2) // na if na else 0)
        return chans + [(na + 127) // 255]

    expect = base4.astype(np.int64).copy()
    for yy in range(2):
        for xx in range(2):
            expect[2 + yy, 2 + xx] = py_over(
                [int(v) for v in base4[2 + yy, 2 + xx]],
                [int(v) for v in patch4[yy, xx]],
            )
    assert np.array_equal(out[1], expect.astype(np.uint8))

    # A fully-opaque OVER source must degenerate to SOURCE exactly.
    opaque = patch4.copy()
    opaque[:, :, 3] = 255
    data = _delta_apng(
        (5, 5), [(base4, 0, 0, 0, 0), (opaque, 1, 1, 0, 1)], color_type=6
    )
    out, _, _, _ = decode_apng_frames(data)
    assert np.array_equal(out[1][1:3, 1:3], opaque)


def test_apng_delta_region_bounds_checked():
    base = _pixels(4, 4, seed=10)
    patch = _pixels(3, 3, seed=11)
    data = _delta_apng((4, 4), [(base, 0, 0, 0, 0), (patch, 2, 2, 0, 0)])
    with pytest.raises(ValueError, match="exceeds the canvas"):
        decode_apng_frames(data, wanted=[])


def test_sample_frames_on_delta_apng_payload(spark):
    """The Spark-side frame sampler must handle delta-encoded APNG
    payloads end-to-end: sampled frames report stats of the full
    COMPOSITED canvas, not the raw sub-rectangle."""
    base = _pixels(8, 6, seed=21)
    patch = _pixels(3, 2, seed=22)
    data = _delta_apng(
        (8, 6),
        [(base, 0, 0, 0, 0), (patch, 4, 3, 0, 0), (patch, 0, 0, 0, 0)],
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.multimodal import (
        sample_frames,
    )

    mm = spark.createDataFrame(
        [(1, bytearray(data))], "doc_id long, payload binary"
    )
    rows = {r.frame_idx: r for r in sample_frames(mm, every_nth=2).collect()}
    assert sorted(rows) == [0, 2]
    assert rows[0].pixel_sum == int(base.astype(np.int64).sum())
    canvas2 = base.copy()
    canvas2[3:5, 4:7] = patch
    canvas2[0:2, 0:3] = patch
    assert rows[2].pixel_sum == int(canvas2.astype(np.int64).sum())
    assert (rows[2].width, rows[2].height, rows[2].n_frames) == (8, 6, 3)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    """Any (frames, channels, rate) PCM16 clip roundtrips losslessly
    through the interleaved container."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    if ch == 1:
        s = s[:, 0]
    out, r = decode_wav(encode_wav(s, rate=rate))
    assert r == rate
    assert np.array_equal(out, s)


def test_apng_delta_over_gray_alpha():
    """Blend OVER onto gray+alpha composites with the same exact
    integer source-over as RGBA (alpha is the LAST channel)."""
    base = _pixels(4, 4, seed=70, ch=2)
    patch = _pixels(2, 2, seed=71, ch=2)
    data = _delta_apng(
        (4, 4), [(base, 0, 0, 0, 0), (patch, 1, 1, 0, 1)], color_type=4
    )
    out, _, _, _ = decode_apng_frames(data)

    def py_over(dst_px, src_px):
        sa, da = src_px[1], dst_px[1]
        na = sa * 255 + da * (255 - sa)
        num = sa * src_px[0] * 255 + da * dst_px[0] * (255 - sa)
        return [(num + na // 2) // na if na else 0, (na + 127) // 255]

    expect = base.astype(np.int64).copy()
    for yy in range(2):
        for xx in range(2):
            expect[1 + yy, 1 + xx] = py_over(
                [int(v) for v in base[1 + yy, 1 + xx]],
                [int(v) for v in patch[yy, xx]],
            )
    assert np.array_equal(out[1], expect.astype(np.uint8))


def test_apng_default_image_excluded_from_animation():
    """The spec's default-image form — IDAT before any fcTL is a
    standalone still, with the animation carried entirely in fdAT —
    must decode to exactly the fcTL frames, not count the still."""
    import struct

    still = _pixels(5, 4, seed=80)
    f0 = _pixels(5, 4, seed=81)
    f1 = _pixels(5, 4, seed=82)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 0, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", 2, 0))
    out += _chunk(b"IDAT", _idat_payload(encode_png(still)))  # default image
    seq = 0
    for fr in (f0, f1):
        out += _chunk(
            b"fcTL", struct.pack(">IIIIIHHBB", seq, 5, 4, 0, 0, 1, 10, 0, 0)
        )
        seq += 1
        out += _chunk(
            b"fdAT", struct.pack(">I", seq) + _idat_payload(encode_png(fr))
        )
        seq += 1
    data = bytes(out + _chunk(b"IEND", b""))

    frames, w, h, n = decode_apng_frames(data)
    assert (w, h, n) == (5, 4, 2)
    assert np.array_equal(frames[0], f0)
    assert np.array_equal(frames[1], f1)
    # the plain-PNG decoder still sees the default image (frame-0 path)
    assert np.array_equal(decode_png(data), still)


def _sub8_png(samples, depth, color_type, palette=None, filters=None):
    """Hand-built sub-8-bit PNG: pack d-bit samples MSB-first per row,
    then apply byte-level filters (bpp=1 per spec)."""
    import struct
    import zlib

    h, w = samples.shape
    nb = (w * depth + 7) // 8
    rows = []
    for y in range(h):
        bits = np.zeros(nb * 8, dtype=np.uint8)
        for x in range(w):
            v = int(samples[y, x])
            for b in range(depth):
                bits[x * depth + b] = (v >> (depth - 1 - b)) & 1
        rows.append(np.packbits(bits)[:nb].astype(np.int64))
    raw = bytearray()
    prev = np.zeros(nb, dtype=np.int64)
    for y, row in enumerate(rows):
        ft = 0 if filters is None else filters[y]
        left = np.concatenate(([0], row[:-1])) if nb > 1 else np.zeros(nb, dtype=np.int64)
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - ((left + prev) // 2)
        else:
            ul = np.concatenate(([0], prev[:-1])) if nb > 1 else np.zeros(nb, dtype=np.int64)
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = row - pred
        raw.append(ft)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    )
    if palette is not None:
        out += _chunk(b"PLTE", palette.tobytes())
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub8bit_gray_png_decodes_with_bit_replication(depth):
    """1/2/4-bit grayscale unpacks MSB-first and scales by the exact
    255/(2^d-1) replication factor, across all filters."""
    rng = np.random.default_rng(depth)
    samples = rng.integers(0, 1 << depth, size=(7, 19), dtype=np.uint8)
    filters = [(y % 5) for y in range(7)]
    out = decode_png(_sub8_png(samples, depth, 0, filters=filters))
    assert out.shape == (7, 19)
    assert np.array_equal(out, samples * (255 // ((1 << depth) - 1)))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub8bit_palette_png_decodes_through_plte(depth):
    rng = np.random.default_rng(10 + depth)
    palette = rng.integers(0, 256, size=(1 << depth, 3), dtype=np.uint8)
    samples = rng.integers(0, 1 << depth, size=(5, 13), dtype=np.uint8)
    out = decode_png(_sub8_png(samples, depth, 3, palette=palette))
    assert out.shape == (5, 13, 3)
    assert np.array_equal(out, palette[samples])


def test_wav_extensible_pcm_decodes():
    """WAVE_FORMAT_EXTENSIBLE wrapping integer PCM (the typical 24-bit
    and >2-channel container) decodes like plain PCM; extensible
    wrapping a float SubFormat stays rejected."""
    import struct

    def ext_container(sub_fmt, channels, bits, payload, rate=48000):
        # 40-byte fmt: base(16) + cbSize(2) + validbits(2) + mask(4) + GUID(16)
        guid = struct.pack("<H", sub_fmt) + bytes(14)
        fmt = struct.pack(
            "<HHIIHH", 0xFFFE, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits,
        ) + struct.pack("<HHI", 22, bits, 0) + guid
        return (
            b"RIFF" + struct.pack("<I", 36 + 24 + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )

    s = (np.arange(12, dtype=np.int64) * 997 % 65536 - 32768).astype(np.int16)
    stereo = s.reshape(6, 2)
    out, rate = decode_wav(ext_container(1, 2, 16, stereo.tobytes()))
    assert rate == 48000
    assert np.array_equal(out, stereo)

    with pytest.raises(NotImplementedError, match="integer PCM"):
        decode_wav(ext_container(3, 2, 32, b""))  # IEEE float SubFormat


# ---- review-pass regressions: ancillary chunks through the APNG path ----


from cig_etl_s3_to_sql_data_ingestor_spark.operators.multimodal import (  # noqa: E402
    frame_sample_plan,  # noqa: F401  (import guard: module must stay importable)
)


def test_apng_path_forwards_plte_and_trns():
    """Per-frame mini-PNG rebuilds must carry PLTE and tRNS: paletted
    payloads decode (not crash) and tRNS-derived alpha survives the
    APNG path exactly as it does the plain-PNG path."""
    rng = np.random.default_rng(30)
    palette = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idxs = rng.integers(0, 8, size=(4, 6), dtype=np.uint8)
    data = _palette_png(idxs, palette)
    frames, w, h, n = decode_apng_frames(data)
    assert (w, h, n) == (6, 4, 1)
    assert np.array_equal(frames[0], palette[idxs])

    # palette + tRNS -> RGBA through the frame path too
    data = _palette_png(idxs, palette, with_trns=True)
    frames, _, _, _ = decode_apng_frames(data)
    assert frames[0].shape == (4, 6, 4)
    assert (frames[0][:, :, 3] == 128).all()

    # gray + tRNS keeps its alpha plane through the frame path
    import struct
    import zlib

    g = np.array([[7, 8], [9, 7]], dtype=np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(2))
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"tRNS", struct.pack(">H", 7))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    frames, _, _, _ = decode_apng_frames(data)
    assert frames[0].shape == (2, 2, 2)
    assert np.array_equal(frames[0][:, :, 1], np.where(g == 7, 0, 255))


def test_apng_delta_16bit_canvas_not_truncated():
    """A 16-bit delta animation must composite on a uint16 canvas —
    values above 255 survive (previously cast-wrapped to uint8)."""
    base = (
        (np.arange(24, dtype=np.int64).reshape(4, 6) * 4096) % 65536
    ).astype(np.uint16)
    patch = np.full((2, 2), 60000, dtype=np.uint16)
    data = _delta_apng((6, 4), [(base, 0, 0, 0, 0), (patch, 1, 1, 0, 0)])
    frames, _, _, _ = decode_apng_frames(data)
    assert frames[0].dtype == np.uint16
    assert np.array_equal(frames[0], base)
    expect = base.copy()
    expect[1:3, 1:3] = patch
    assert np.array_equal(frames[1], expect)


def test_apng_delta_over_uses_trns_derived_alpha():
    """blend OVER on a gray+tRNS animation composites with the DERIVED
    alpha: a patch pixel equal to the transparent sample leaves the
    canvas pixel unchanged instead of pasting it."""
    import struct
    import zlib

    base = np.full((3, 3), 50, dtype=np.uint8)
    patch = np.array([[7, 200]], dtype=np.uint8)  # 7 = transparent value

    def frame_stream(px):
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(px.shape[0]))
        return zlib.compress(raw)

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0))
    out += _chunk(b"tRNS", struct.pack(">H", 7))
    out += _chunk(b"acTL", struct.pack(">II", 2, 0))
    out += _chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 3, 3, 0, 0, 1, 10, 0, 0))
    out += _chunk(b"IDAT", frame_stream(base))
    out += _chunk(b"fcTL", struct.pack(">IIIIIHHBB", 1, 2, 1, 1, 1, 1, 10, 0, 1))
    out += _chunk(b"fdAT", struct.pack(">I", 2) + frame_stream(patch))
    data = bytes(out + _chunk(b"IEND", b""))

    frames, _, _, _ = decode_apng_frames(data)
    f1 = frames[1]
    assert f1.shape == (3, 3, 2)
    # transparent patch pixel -> canvas keeps the base gray value
    assert f1[1, 1, 0] == 50 and f1[1, 1, 1] == 255
    # opaque patch pixel -> pasted
    assert f1[1, 2, 0] == 200 and f1[1, 2, 1] == 255


def test_encode_png_rejects_wrapping_dtypes():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.array([[300, 5]], dtype=np.int32))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_adam7_sub8bit_palette_decode(depth):
    """Interlaced sub-8-bit palette (legacy icon form): per-pass bit
    packing + scatter must reproduce the image through PLTE."""
    import struct
    import zlib

    rng = np.random.default_rng(40 + depth)
    palette = rng.integers(0, 256, size=(1 << depth, 3), dtype=np.uint8)
    w, h = 11, 9
    samples = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, xs, ys in ADAM7:
        sub = samples[y0::ys, x0::xs]
        ph, pw = sub.shape
        if ph == 0 or pw == 0:
            continue
        nb = (pw * depth + 7) // 8
        for y in range(ph):
            bits = np.zeros(nb * 8, dtype=np.uint8)
            for x in range(pw):
                v = int(sub[y, x])
                for b in range(depth):
                    bits[x * depth + b] = (v >> (depth - 1 - b)) & 1
            raw.append(0)  # filter None
            raw.extend(np.packbits(bits)[:nb].tobytes())
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 1))
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, palette[samples])
