"""Multimodal (binary) column handling with a REAL image codec.

Model: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct (format, width, height, n_frames, ...). Decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators (``mapInPandas``) so the per-record Python cost is amortized
over whole record batches — the pattern that scales to 100 TB because
the heavy bytes never leave the executor and the UDF sees columnar
batches. This generalizes the reference's binary-column neutralization
(`/root/reference/CigEolHostingIngestionLogic.py:120-128` turns `Logo`/
`Picture` into constants) into genuine byte→pixel work.

The image path is REAL: a pure-stdlib (zlib/struct) + numpy PNG codec
covering the full integer-PNG matrix — all five color types
(gray/gray+alpha/RGB/RGBA/palette-via-PLTE) at 8-bit, 1/2/4-bit gray
and palette, 16-bit non-palette, tRNS transparency decoded to an
explicit alpha channel, Adam7 interlace, filters 0–4
(None/Sub/Up/Average/Paeth) over the bpp-strided byte stream, per-chunk
CRC validation — decodes actual pixel data inside the batch functions,
and every downstream statistic (pixel sums, nearest-neighbor resize,
per-channel gradient energy) is computed from the decoded pixels.

Video-ish payloads are REAL APNG (animated PNG: acTL/fcTL/fdAT chunks):
each frame is an independently-compressed PNG stream, so the frame
sampler (`sample_frames`) walks the chunk list cheaply and inflates
ONLY the frames it keeps — the property that matters when sampling 1-in
-N frames of a 100 TB video corpus. Audio payloads are REAL RIFF/WAVE
PCM16 (any channel count, interleaved) parsed with struct
(`make_wav_codec`). ffmpeg/librosa-class
codecs (JPEG, H.264, MP3) are not in this container: payloads that are
not PNG/APNG/WAV fail their signature check with a clear error.

Every batch function is closure-self-contained (the codec is built by a
factory and captured by value): cloudpickle serializes module-level
functions BY REFERENCE, and Spark's Python workers don't necessarily
have this package importable when the driver runs from a foreign cwd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..partitioning import fan_out

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def make_png_codec():
    """(encode_png, decode_png) as nested functions — cloudpickle ships
    nested (non-module-attribute) functions by value, so closures built
    from these run on workers with no package import.

    The codec covers the PNG subset the fixtures need — 8-bit grayscale
    (color type 0), truecolor RGB (type 2) and RGBA (type 6),
    non-interlaced, filters 0-4 — and validates chunk CRCs on decode.
    Per the spec, filters operate on the row BYTE stream with the
    "left" neighbor ``bpp`` (bytes per pixel: 1/3/4) positions back, so
    every multi-channel image exercises the strided filter paths.
    Sub/Up rows encode+decode vectorized (Sub decode is a per-channel
    prefix-sum recurrence → ``np.cumsum`` over a ``(w, bpp)`` view);
    Average/Paeth decode is a per-pixel recurrence (left-neighbor
    dependency), vectorized across channels.

    Shape convention: 2-D ``(h, w)`` arrays are grayscale; 3-D
    ``(h, w, ch)`` with ch in {1, 3, 4} map to color types {0, 2, 6}.
    ``decode_png`` returns 2-D for grayscale payloads and 3-D
    otherwise, so existing single-channel callers are unchanged.
    """

    def encode_png(pixels, filters=None):
        """pixels: ``(h, w)`` grayscale or ``(h, w, ch)`` with ch in
        {1, 2, 3, 4} → PNG bytes (color type 0/4/2/6). uint8 input
        encodes at depth 8; uint16 input encodes at depth 16 (big-
        endian samples per spec).

        ``filters``: optional per-row filter-type list; default cycles
        y % 3 over None/Sub/Up so decoding always exercises real
        unfiltering work.
        """
        import struct
        import zlib

        import numpy as np

        if pixels.ndim == 2:
            pixels = pixels[:, :, None]
        height, width, ch = pixels.shape
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
        if color_type is None:
            raise ValueError(f"unsupported channel count {ch} (want 1/2/3/4)")
        if pixels.dtype not in (np.uint8, np.uint16):
            # Depth is dispatched on dtype; any other integer dtype
            # would silently wrap mod 256 below — reject instead.
            raise ValueError(
                f"encode_png wants uint8 (depth 8) or uint16 (depth 16) "
                f"pixels, got {pixels.dtype}"
            )
        depth = 16 if pixels.dtype == np.uint16 else 8
        # Filters operate on the BYTE stream; bpp is bytes per pixel.
        bpp = ch * (depth // 8)
        raw = bytearray()
        nb = width * bpp
        prev = np.zeros(nb, dtype=np.int32)
        zeros = np.zeros(bpp, dtype=np.int32)
        for y in range(height):
            if depth == 16:
                row = np.frombuffer(
                    pixels[y].astype(">u2").tobytes(), dtype=np.uint8
                ).astype(np.int32)
            else:
                row = pixels[y].astype(np.int32).reshape(nb)
            ft = (y % 3) if filters is None else filters[y]
            left = np.concatenate((zeros, row[:-bpp])) if nb > bpp else (
                np.zeros(nb, dtype=np.int32)
            )
            if ft == 0:  # None
                filt = row
            elif ft == 1:  # Sub
                filt = row - left
            elif ft == 2:  # Up
                filt = row - prev
            elif ft == 3:  # Average
                filt = row - ((left + prev) // 2)
            elif ft == 4:  # Paeth
                ul = np.concatenate((zeros, prev[:-bpp])) if nb > bpp else (
                    np.zeros(nb, dtype=np.int32)
                )
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
                )
                filt = row - pred
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            raw.append(ft)
            raw.extend((filt % 256).astype(np.uint8).tobytes())
            prev = row

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    def decode_png(data):
        """PNG bytes → uint8 pixel array, ``(h, w)`` for grayscale
        payloads and ``(h, w, ch)`` for RGB/RGBA; validates signature,
        IHDR and every chunk CRC, and reverses filters 0-4 with the
        spec's ``bpp``-strided left neighbor. Palette images (color
        type 3) decode through the PLTE lookup to ``(h, w, 3)`` RGB —
        their indices filter as bpp=1 per the spec. A tRNS chunk is
        DECODED, never dropped: palette alpha tables yield
        ``(h, w, 4)`` RGBA (missing entries default to opaque per
        spec), and the single transparent sample on gray/RGB adds an
        explicit alpha channel (``(h, w, 2)`` / ``(h, w, 4)``) with 0
        at matching pixels — alpha semantics always survive decode."""
        import struct
        import zlib

        import numpy as np

        if bytes(data[:8]) != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG: bad signature")
        pos = 8
        width = height = bpp = None
        paletted = False
        palette = None
        trns = None
        color = None
        interlace = 0
        idat = bytearray()
        while pos + 12 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = bytes(data[pos + 4 : pos + 8])
            payload = bytes(data[pos + 8 : pos + 8 + length])
            (crc,) = struct.unpack(
                ">I", data[pos + 8 + length : pos + 12 + length]
            )
            if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
            if tag == b"IHDR":
                width, height, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", payload
                )
                paletted = color == 3
                # Channel count per color type (palette = 1 index).
                bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
                # Legal depths: 8 everywhere; 1/2/4 for gray and
                # palette (icons — MSB-first unpack after unfilter);
                # 16 for the non-palette types (big-endian samples).
                depth_ok = (
                    depth == 8
                    or (depth in (1, 2, 4) and color in (0, 3))
                    or (depth == 16 and color in (0, 2, 4, 6))
                )
                if not depth_ok or bpp is None or comp != 0 or interlace not in (0, 1):
                    raise NotImplementedError(
                        "codec supports 8/16-bit grayscale/gray+alpha/RGB/"
                        "RGBA and 1/2/4/8-bit palette or gray PNG only "
                        "(non-interlaced or Adam7)"
                    )
            elif tag == b"PLTE":
                if length % 3 or length == 0:
                    raise ValueError("PLTE length must be a positive multiple of 3")
                palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
            elif tag == b"tRNS":
                if color in (4, 6):
                    raise ValueError(
                        "tRNS is invalid on color types with an alpha channel"
                    )
                trns = payload
            elif tag == b"IDAT":
                idat.extend(payload)
            elif tag == b"IEND":
                break
            pos += 12 + length
        if width is None:
            raise ValueError("PNG missing IHDR")
        if paletted and palette is None:
            raise ValueError("paletted PNG missing PLTE")
        raw = zlib.decompress(bytes(idat))

        def scan_geometry(w_px):
            """(scanline bytes, filter units, filter stride) for a
            w_px-pixel-wide image or interlace pass."""
            if depth in (8, 16):
                # The filter's left neighbor sits a full PIXEL of
                # bytes back.
                return w_px * bpp * (depth // 8), w_px, bpp * (depth // 8)
            # Sub-8-bit: ceil(w*d/8) packed bytes; the "left neighbor"
            # is ONE byte back (spec: bpp rounds up to 1 byte).
            return (w_px * depth + 7) // 8, (w_px * depth + 7) // 8, 1

        def unfilter(buf, off, n_rows, w_px):
            """Reverse filters 0-4 over ``n_rows`` scanlines of a
            ``w_px``-wide image/pass starting at byte ``off``; returns
            ((n_rows, nb) reconstructed bytes, bytes consumed)."""
            nb, f_units, f_bpp = scan_geometry(w_px)
            stride = nb + 1
            if off + stride * n_rows > len(buf):
                raise ValueError("PNG decoded stream length mismatch")
            out = np.empty((n_rows, nb), dtype=np.uint8)
            prev = np.zeros(nb, dtype=np.int64)
            for y in range(n_rows):
                ft = buf[off + y * stride]
                line = np.frombuffer(
                    buf, dtype=np.uint8, count=nb, offset=off + y * stride + 1
                ).astype(np.int64)
                if ft == 0:  # None
                    rec = line
                elif ft == 1:  # Sub: per-channel prefix sum of filtered bytes
                    rec = (
                        np.cumsum(line.reshape(f_units, f_bpp), axis=0) % 256
                    ).reshape(nb)
                elif ft == 2:  # Up
                    rec = (line + prev) % 256
                elif ft == 3:  # Average (left recurrence -> per pixel)
                    ln = line.reshape(f_units, f_bpp)
                    pv = prev.reshape(f_units, f_bpp)
                    rec2 = np.empty((f_units, f_bpp), dtype=np.int64)
                    left = np.zeros(f_bpp, dtype=np.int64)
                    for x in range(f_units):
                        left = (ln[x] + ((left + pv[x]) >> 1)) % 256
                        rec2[x] = left
                    rec = rec2.reshape(nb)
                elif ft == 4:  # Paeth (left recurrence -> per pixel)
                    ln = line.reshape(f_units, f_bpp)
                    pv = prev.reshape(f_units, f_bpp)
                    rec2 = np.empty((f_units, f_bpp), dtype=np.int64)
                    left = np.zeros(f_bpp, dtype=np.int64)
                    ul = np.zeros(f_bpp, dtype=np.int64)
                    for x in range(f_units):
                        up = pv[x]
                        p = left + up - ul
                        pa, pb, pc = (
                            np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                        )
                        pred = np.where(
                            (pa <= pb) & (pa <= pc),
                            left,
                            np.where(pb <= pc, up, ul),
                        )
                        left = (ln[x] + pred) % 256
                        rec2[x] = left
                        ul = up
                    rec = rec2.reshape(nb)
                else:
                    raise ValueError(f"unknown PNG filter type {ft}")
                out[y] = rec.astype(np.uint8)
                prev = rec
            return out, stride * n_rows

        def rows_to_samples(rows_bytes, n_rows, w_px):
            """(n_rows, nb) reconstructed bytes → int64 sample array at
            STORAGE resolution: (n_rows, w_px) for 1-channel/palette,
            (n_rows, w_px, channels) otherwise."""
            if depth < 8:
                bits = np.unpackbits(rows_bytes, axis=1)[:, : w_px * depth]
                weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.int64)
                return (
                    bits.reshape(n_rows, w_px, depth).astype(np.int64) * weights
                ).sum(axis=2)
            if depth == 16:
                u16 = (
                    (rows_bytes[:, 0::2].astype(np.int64) << 8)
                    | rows_bytes[:, 1::2]
                ).reshape(n_rows, w_px, bpp)
                return u16[:, :, 0] if bpp == 1 else u16
            s8 = rows_bytes.astype(np.int64)
            return (
                s8.reshape(n_rows, w_px)
                if bpp == 1
                else s8.reshape(n_rows, w_px, bpp)
            )

        if interlace == 0:
            full, used = unfilter(raw, 0, height, width)
            if used != len(raw):
                raise ValueError("PNG decoded stream length mismatch")
            samples = rows_to_samples(full, height, width)
        else:
            # Adam7: seven passes, each an independently-filtered
            # sub-image; scatter each pass's samples onto the canvas.
            shape = (
                (height, width) if bpp == 1 else (height, width, bpp)
            )
            samples = np.zeros(shape, dtype=np.int64)
            off = 0
            for x0, y0, xs, ys in (
                (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
            ):
                pw = max(0, (width - x0 + xs - 1) // xs)
                ph = max(0, (height - y0 + ys - 1) // ys)
                if pw == 0 or ph == 0:
                    continue  # empty pass contributes no scanlines
                rows_bytes, used = unfilter(raw, off, ph, pw)
                off += used
                samples[y0::ys, x0::xs] = rows_to_samples(rows_bytes, ph, pw)
            if off != len(raw):
                raise ValueError("PNG decoded stream length mismatch")

        def palette_expand(idxs):
            if int(idxs.max(initial=0)) >= len(palette):
                raise ValueError("palette index out of range")
            rgb = palette[idxs]
            if trns is None:
                return rgb  # (h, w, 3)
            # Per-index alpha table; entries beyond it are opaque (spec).
            at = np.full(len(palette), 255, dtype=np.uint8)
            k = min(len(trns), len(palette))
            at[:k] = np.frombuffer(trns[:k], dtype=np.uint8)
            return np.dstack([rgb, at[idxs]])  # (h, w, 4)

        def gray_alpha(samples_raw, gray8):
            if trns is None:
                return gray8  # (h, w)
            # 2-byte big-endian transparent SAMPLE value, compared at
            # the stored sample depth (pre-scaling).
            (tv,) = struct.unpack(">H", trns[:2])
            alpha = np.where(samples_raw == tv, 0, 255).astype(np.uint8)
            return np.dstack([gray8, alpha])  # (h, w, 2)

        if depth < 8:
            if paletted:
                return palette_expand(samples)
            # Gray scaling: left-bit replication == exact v*255/(2^d-1).
            gray8 = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
            return gray_alpha(samples, gray8)
        if depth == 16:
            u16 = samples.astype(np.uint16)
            if bpp == 1:
                if trns is not None:
                    (tv,) = struct.unpack(">H", trns[:2])
                    alpha = np.where(u16 == tv, 0, 65535).astype(np.uint16)
                    return np.dstack([u16, alpha])
                return u16
            if bpp == 3 and trns is not None:
                tr, tg, tb = struct.unpack(">HHH", trns[:6])
                match = (
                    (u16[:, :, 0] == tr)
                    & (u16[:, :, 1] == tg)
                    & (u16[:, :, 2] == tb)
                )
                alpha = np.where(match, 0, 65535).astype(np.uint16)
                return np.dstack([u16, alpha])
            return u16
        if paletted:
            return palette_expand(samples)
        if bpp == 1:
            gray8 = samples.astype(np.uint8)
            return gray_alpha(samples, gray8)
        rgb = samples.astype(np.uint8)
        if bpp == 3 and trns is not None:
            # 3 x 2-byte big-endian transparent RGB sample (low bytes
            # carry the 8-bit values); a pixel is transparent only when
            # all three channels match.
            tr, tg, tb = struct.unpack(">HHH", trns[:6])
            match = (
                (rgb[:, :, 0] == (tr & 0xFF))
                & (rgb[:, :, 1] == (tg & 0xFF))
                & (rgb[:, :, 2] == (tb & 0xFF))
            )
            alpha = np.where(match, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])  # (h, w, 4)
        return rgb

    return encode_png, decode_png


def make_apng_codec():
    """(encode_apng, decode_apng_frames) — REAL APNG (animated PNG,
    acTL/fcTL/fdAT per the W3C spec), built BY VALUE on the single-frame
    codec so worker closures stay import-free.

    Every frame is an independently-compressed zlib stream (frame 0 in
    IDAT, later frames in fdAT with their 4-byte sequence prefix), which
    is what lets ``decode_apng_frames(data, wanted=[...])`` inflate and
    unfilter ONLY the wanted frames: the chunk walk is O(container
    bytes) of CRC checks, the expensive inflate+unfilter is O(sampled
    frames). A plain single-frame PNG decodes as a 1-frame animation.
    """
    encode_png, decode_png = make_png_codec()

    def _chunk(tag, data):
        import struct
        import zlib

        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def encode_apng(frames):
        """frames: list of same-shape uint8 arrays — ``(h, w)`` gray or
        ``(h, w, ch)`` color, all frames one shape — → APNG bytes."""
        import struct

        def idat_payload(png_bytes):
            pos, out = 8, bytearray()
            while pos + 12 <= len(png_bytes):
                (length,) = struct.unpack(">I", png_bytes[pos : pos + 4])
                if png_bytes[pos + 4 : pos + 8] == b"IDAT":
                    out += png_bytes[pos + 8 : pos + 8 + length]
                pos += 12 + length
            return bytes(out)

        height, width = frames[0].shape[:2]
        ch = 1 if frames[0].ndim == 2 else frames[0].shape[2]
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        out = bytearray(b"\x89PNG\r\n\x1a\n")
        out += _chunk(
            b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
        )
        out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
        seq = 0
        shape0 = frames[0].shape
        for k, fr in enumerate(frames):
            if fr.shape != shape0:
                raise ValueError("APNG frames must share one full-frame shape")
            # fcTL: seq, w, h, x_off, y_off, delay 1/10 s, dispose 0, blend 0
            out += _chunk(
                b"fcTL",
                struct.pack(">IIIIIHHBB", seq, width, height, 0, 0, 1, 10, 0, 0),
            )
            seq += 1
            stream = idat_payload(encode_png(fr))
            if k == 0:
                out += _chunk(b"IDAT", stream)
            else:
                out += _chunk(b"fdAT", struct.pack(">I", seq) + stream)
                seq += 1
        out += _chunk(b"IEND", b"")
        return bytes(out)

    def decode_apng_frames(data, wanted=None):
        """APNG/PNG bytes → ({frame_idx: full-canvas uint8 array}, w, h,
        n_frames).

        ``wanted=None`` decodes every frame; a list decodes only those
        indices (out-of-range entries ignored); ``[]`` is the metadata
        probe — full CRC-validated chunk walk, zero inflates. A CALLABLE
        ``wanted`` receives n_frames after the walk and returns the
        indices to decode — the one-pass form samplers use so the
        O(container-bytes) chunk walk and CRC work run once, not twice.

        Delta animations (the common real-corpus form: fcTL sub-
        rectangles with x/y offsets) composite per the spec — blend
        SOURCE pastes the region, dispose NONE/BACKGROUND/PREVIOUS
        leave/clear/revert it before the next frame — and every
        returned frame is the FULL canvas at that point. Sampling a
        delta animation necessarily inflates frames 0..max(wanted)
        (each frame depends on the canvas before it); the inflate-only-
        sampled property holds exactly when every frame is an
        independent full-canvas SOURCE frame, which is what
        ``encode_apng`` emits. Blend OVER on alpha-free color types
        equals SOURCE (spec); OVER onto RGBA composites with EXACT
        integer arithmetic over the 255-denominator rationals
        (round-half-up at the final division), so the result is
        bit-identical on every platform — the determinism contract the
        whole codec keeps."""
        import struct
        import zlib

        import numpy as np

        if bytes(data[:8]) != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG/APNG: bad signature")
        pos, width, ihdr, n_frames = 8, None, None, None
        height = None
        streams = []
        regions = []  # (w_f, h_f, x, y, dispose, blend) per fcTL
        default_stream = bytearray()  # IDAT seen before any fcTL
        plte = None  # ancillary-but-critical chunks the per-frame
        trns_chunk = None  # mini-PNGs must carry (palette, transparency)
        while pos + 12 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = bytes(data[pos + 4 : pos + 8])
            payload = bytes(data[pos + 8 : pos + 8 + length])
            (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
            if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
                raise ValueError(f"chunk {tag!r} CRC mismatch")
            if tag == b"IHDR":
                ihdr = payload
                width, height = struct.unpack(">II", payload[:8])
            elif tag == b"acTL":
                (n_frames,) = struct.unpack(">I", payload[:4])
            elif tag == b"PLTE":
                plte = payload
            elif tag == b"tRNS":
                trns_chunk = payload
            elif tag == b"fcTL":
                _seq, w_f, h_f, x_off, y_off, _dn, _dd, dispose, blend = (
                    struct.unpack(">IIIIIHHBB", payload[:26])
                )
                streams.append(bytearray())
                regions.append((w_f, h_f, x_off, y_off, dispose, blend))
            elif tag == b"IDAT":
                # IDAT belongs to the animation only when an fcTL
                # preceded it (the spec's frame-0-in-IDAT form). IDAT
                # before any fcTL is the DEFAULT IMAGE — a standalone
                # still that is NOT part of the animation (or simply a
                # plain PNG when no animation chunks exist at all).
                if streams:
                    streams[-1] += payload
                else:
                    default_stream += payload
            elif tag == b"fdAT":
                if not streams:
                    # Malformed container: animation frame data before
                    # any fcTL. Raise the codec's documented error
                    # type, not a bare IndexError from streams[-1].
                    raise ValueError("fdAT before any fcTL stream")
                streams[-1] += payload[4:]  # strip the sequence number
            elif tag == b"IEND":
                break
            pos += 12 + length
        if ihdr is None:
            raise ValueError("missing IHDR")
        if not streams:  # plain PNG (no fcTL anywhere)
            streams.append(default_stream)
            regions.append((width, height, 0, 0, 0, 0))
        n = n_frames if n_frames is not None else len(streams)
        if len(streams) != n:
            raise ValueError(f"acTL declares {n} frames, found {len(streams)}")
        for w_f, h_f, x, y, _d, _b in regions:
            if x + w_f > width or y + h_f > height:
                raise ValueError("fcTL region exceeds the canvas")
        if wanted is None:
            idxs = list(range(n))
        else:
            req = wanted(n) if callable(wanted) else wanted
            idxs = [i for i in req if 0 <= i < n]

        def one(stream, w_f, h_f):
            sub_ihdr = struct.pack(">II", w_f, h_f) + ihdr[8:]
            mini = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", sub_ihdr)
            # Forward the image-wide ancillary chunks: palette frames
            # crash without PLTE, and tRNS-derived alpha must survive
            # the per-frame rebuild (the codec's no-silent-alpha-drop
            # contract).
            if plte is not None:
                mini += _chunk(b"PLTE", plte)
            if trns_chunk is not None:
                mini += _chunk(b"tRNS", trns_chunk)
            mini += _chunk(b"IDAT", bytes(stream)) + _chunk(b"IEND", b"")
            return decode_png(mini)

        independent = all(
            (w_f, h_f, x, y) == (width, height, 0, 0) and blend == 0
            for w_f, h_f, x, y, _d, blend in regions
        )
        if independent:
            # Fast path (encode_apng's output shape): each frame is a
            # self-contained full canvas — inflate ONLY the wanted ones.
            return (
                {i: one(streams[i], width, height) for i in idxs},
                width, height, n,
            )

        # An alpha channel is present when the color type carries one
        # (4 = gray+alpha, 6 = RGBA) OR a tRNS chunk derives one — the
        # decoded arrays then always store alpha LAST, and OVER must
        # composite with it (OVER == SOURCE only when truly alpha-free).
        has_alpha = (len(ihdr) >= 10 and ihdr[9] in (4, 6)) or (
            trns_chunk is not None
        )

        def over_alpha(dst, src):
            """Exact integer source-over for alpha-last layouts: with
            sample maximum M (255 or 65535 by dtype), alphas are a/M
            rationals, so out_a*M = src_a*M + dst_a*(M-src_a) is an
            exact integer, and each color channel out_c = (src_a*src_c*M
            + dst_a*dst_c*(M-src_a)) / (out_a*M) rounds half-up — one
            deterministic rounding rule, no floats anywhere."""
            m = 65535 if src.dtype == np.uint16 else 255
            sa = src[:, :, -1].astype(np.int64)
            da = dst[:, :, -1].astype(np.int64)
            na = sa * m + da * (m - sa)  # = out_a * m
            out = np.empty_like(src)
            for c in range(src.shape[2] - 1):
                num = (
                    sa * src[:, :, c].astype(np.int64) * m
                    + da * dst[:, :, c].astype(np.int64) * (m - sa)
                )
                out[:, :, c] = np.where(
                    na > 0, (num + na // 2) // np.maximum(na, 1), 0
                ).astype(src.dtype)
            out[:, :, -1] = ((na + m // 2) // m).astype(src.dtype)
            return out

        out = {}
        canvas = None
        wanted_set = set(idxs)
        for k in range(0, (max(idxs) + 1) if idxs else 0):
            w_f, h_f, x, y, dispose, blend = regions[k]
            sub = one(streams[k], w_f, h_f)
            if sub.ndim == 2:
                sub = sub[:, :, None]
            if canvas is None:
                # Spec: canvas starts fully transparent black (zeros);
                # dtype follows the decoded samples (uint8 or uint16).
                canvas = np.zeros(
                    (height, width, sub.shape[2]), dtype=sub.dtype
                )
            before = canvas[y : y + h_f, x : x + w_f].copy()
            if blend == 1 and has_alpha:
                canvas[y : y + h_f, x : x + w_f] = over_alpha(before, sub)
            else:
                # SOURCE; OVER == SOURCE for truly alpha-free layouts.
                canvas[y : y + h_f, x : x + w_f] = sub
            if k in wanted_set:
                snap = canvas.copy()
                out[k] = snap[:, :, 0] if snap.shape[2] == 1 else snap
            if dispose == 1:  # BACKGROUND: clear the region
                canvas[y : y + h_f, x : x + w_f] = 0
            elif dispose == 2:  # PREVIOUS: revert the region
                # Spec: dispose PREVIOUS on frame 0 acts as BACKGROUND
                # (`before` is the zero canvas then — same effect).
                canvas[y : y + h_f, x : x + w_f] = before
        return out, width, height, n

    return encode_apng, decode_apng_frames


def make_wav_codec():
    """(encode_wav, decode_wav) — REAL RIFF/WAVE, PCM16, any channel
    count (interleaved frames per the spec).

    The decoder parses the RIFF chunk list with word alignment, reads
    the fmt block (rejecting non-PCM16 loudly), de-interleaves the
    frames, and returns the int16 sample array — so audio statistics
    downstream come from actual decoded PCM, not metadata. Shape
    convention mirrors the PNG codec: mono decodes to a 1-D ``(n,)``
    array (existing callers unchanged), multi-channel to ``(n, ch)``."""

    def encode_wav(samples, rate=8000):
        """samples: int16 array, ``(n,)`` mono or ``(n, ch)``
        channel-major frames → RIFF/WAVE bytes (interleaved PCM16)."""
        import struct

        ch = 1 if samples.ndim == 1 else samples.shape[1]
        data = samples.astype("<i2").tobytes()  # C-order == interleaved
        return (
            b"RIFF"
            + struct.pack("<I", 36 + len(data))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * 2 * ch, 2 * ch, 16)
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )

    def decode_wav(data):
        """Integer PCM decode: 16-bit natively, plus the other common
        real-corpus integer widths — unsigned 8-bit (offset binary per
        the spec) and signed little-endian 24-bit — normalized to the
        int32 sample domain of their width (no rescaling: an 8-bit
        sample decodes to [-128, 127], a 24-bit one to +/-2^23).
        Float/compressed codecs are rejected loudly."""
        import struct

        import numpy as np

        if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos, rate, pcm, channels, bits = 12, None, None, None, None
        while pos + 8 <= len(data):
            tag = bytes(data[pos : pos + 4])
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            payload = bytes(data[pos + 8 : pos + 8 + length])
            if tag == b"fmt ":
                fmt_code, channels, rate, _brate, _align, bits = struct.unpack(
                    "<HHIIHH", payload[:16]
                )
                if fmt_code == 0xFFFE and len(payload) >= 40:
                    # WAVE_FORMAT_EXTENSIBLE (how >2-channel and 24-bit
                    # files are typically written): the real format is
                    # the SubFormat GUID; its first two bytes are the
                    # wrapped format code (1 = integer PCM). wValidBits
                    # (payload[18:20]) may be below the container width
                    # — samples are already MSB-aligned, so the integer
                    # decode is unchanged.
                    (fmt_code,) = struct.unpack("<H", payload[24:26])
                if fmt_code != 1 or bits not in (8, 16, 24) or channels < 1:
                    raise NotImplementedError(
                        "codec supports integer PCM 8/16/24-bit only "
                        "(plain or WAVE_FORMAT_EXTENSIBLE; PCM16 is the "
                        "native encode width)"
                    )
            elif tag == b"data":
                pcm = payload
            pos += 8 + length + (length % 2)  # RIFF chunks are word-aligned
        if rate is None or pcm is None:
            raise ValueError("WAV missing fmt or data chunk")
        if bits == 16:
            flat = np.frombuffer(pcm, dtype="<i2")
        elif bits == 8:  # spec: 8-bit PCM is UNSIGNED, midpoint 128
            flat = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
        else:  # 24-bit signed little-endian: widen 3 bytes -> int32
            if len(pcm) % 3:
                raise ValueError("WAV 24-bit data chunk is not whole samples")
            b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
            flat = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            flat = flat - ((flat & 0x800000) << 1)  # sign-extend bit 23
        if channels == 1:
            return flat, rate
        if len(flat) % channels:
            raise ValueError("WAV data chunk is not whole interleaved frames")
        return flat.reshape(-1, channels), rate

    return encode_wav, decode_wav


MM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_channels", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def attach_png(df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars") -> DataFrame:
    """Multimodal fixture frame from documents: REAL PNG/APNG payloads.

    Each doc gets a deterministic animation — dims derived from
    ``n_chars`` (w = 1 + n_chars % 64, h = 1 + 7*n_chars % 64),
    channels cycling doc_id % 3 over grayscale/RGB/RGBA (1/3/4),
    1 + doc_id % 8 frames, channel c of pixel (x, y, frame f) =
    (doc_id*31 + 7x + 13y + 17f + 19c) mod 256 — encoded to genuine
    bytes (zlib streams, CRCs, filters cycling None/Sub/Up over the
    bpp-strided byte stream; single-frame docs are plain PNG,
    multi-frame docs are spec-shaped APNG). The metadata struct's
    ``n_frames`` matches the container's acTL — it is real, not
    decorative. Downstream operators must actually parse and unfilter
    these bytes; the DuckDB oracles recompute the expected statistics
    from the generative formula, so a decoder bug is a value mismatch,
    not a silent pass. (In production the payload column arrives from
    object storage via ``binaryFile`` or a parquet binary column; this
    generator stands in for that source.)
    """
    codec = make_png_codec()
    apng_codec = make_apng_codec()

    def gen_batches(batches):
        import numpy as np
        import pandas as pd

        encode_png, _ = codec
        encode_apng, _ = apng_codec

        for pdf in batches:
            payloads, metas = [], []
            for did, nc in zip(pdf[id_col], pdf[size_col]):
                did, nc = int(did), int(nc)
                w, h = 1 + nc % 64, 1 + (nc * 7) % 64
                ch = (1, 3, 4)[did % 3]
                n_frames = 1 + did % 8
                xs = np.arange(w, dtype=np.int64)
                ys = np.arange(h, dtype=np.int64)
                cs = np.arange(ch, dtype=np.int64)
                base = (
                    did * 31
                    + 7 * xs[None, :, None]
                    + 13 * ys[:, None, None]
                    + 19 * cs[None, None, :]
                )
                frames = [
                    ((base + 17 * f) % 256).astype(np.uint8)
                    for f in range(n_frames)
                ]
                if ch == 1:
                    frames = [fr[:, :, 0] for fr in frames]
                payloads.append(
                    encode_png(frames[0]) if n_frames == 1 else encode_apng(frames)
                )
                metas.append(
                    {
                        "format": "png",
                        "width": w,
                        "height": h,
                        "n_channels": ch,
                        "n_frames": n_frames,
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "meta": metas,
                }
            )

    # Encoding is CPU-heavy Python work — rebalance before the workers.
    return fan_out(df.select(id_col, size_col)).mapInPandas(gen_batches, MM_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decoded_bytes", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_image(mm: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: parse the PNG container, inflate IDAT,
    unfilter, and report dimensions FROM THE HEADER plus pixel-level
    stats from the decoded array. ``width``/``height``/``n_channels``
    come from IHDR (not the metadata struct), ``decoded_bytes`` is the
    decoded pixel buffer size (w*h*channels), ``pixel_sum``/
    ``mean_pixel`` aggregate over every channel byte and prove the
    unfiltering reproduced the actual image content."""
    codec = make_png_codec()

    def decode_batches(batches):
        import numpy as np
        import pandas as pd

        _, decode_png = codec

        for pdf in batches:
            rows = []
            for did, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                px = decode_png(payload)
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w, ch = px.shape
                s = int(px.sum(dtype=np.int64))
                nb = w * h * ch
                rows.append(
                    (int(did), "png", w, h, ch, int(meta["n_frames"]), nb, s, s / nb)
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "width", "height", "n_channels",
                    "n_frames", "decoded_bytes", "pixel_sum", "mean_pixel",
                ],
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["n_channels"] = out["n_channels"].astype("int32")
            out["n_frames"] = out["n_frames"].astype("int32")
            out["decoded_bytes"] = out["decoded_bytes"].astype("int64")
            out["pixel_sum"] = out["pixel_sum"].astype("int64")
            yield out

    # Decode is the CPU-heavy stage of a multimodal pipeline — fan the
    # batches across all cores before the Python workers see them.
    return fan_out(mm).mapInPandas(decode_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_pixel_sum", T.LongType()),
    ]
)


def resize_image(mm: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL aspect-preserving resize: decode, then nearest-neighbor
    sample into a ``max_side`` bounding square (src index = floor of the
    integer ratio — deterministic and closed-form, so the oracle can
    reproduce the exact sampled pixels). Channels resample together (one
    lattice, every channel kept). ``resized_pixel_sum`` is the sum over
    the RESAMPLED array across all channels — wrong source indexing
    shows up as a value mismatch."""
    codec = make_png_codec()

    def resize_batches(batches):
        import math

        import numpy as np
        import pandas as pd

        _, decode_png = codec
        side = max_side  # bind into the closure (no module-level refs)

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_png(payload)
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w, ch = px.shape
                scale = min(1.0, side / max(w, h))
                # floor, not round: banker's rounding differs between
                # engines at exact .5 — floor is unambiguous.
                out_w = max(1, math.floor(w * scale))
                out_h = max(1, math.floor(h * scale))
                src_x = (np.arange(out_w, dtype=np.int64) * w) // out_w
                src_y = (np.arange(out_h, dtype=np.int64) * h) // out_h
                res = px[src_y][:, src_x, :]
                rows.append(
                    (
                        int(did), out_w, out_h, ch, out_w / w, out_h / h,
                        out_w * out_h * ch, int(res.sum(dtype=np.int64)),
                    )
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "out_width", "out_height", "n_channels",
                    "scale_x", "scale_y", "resized_bytes", "resized_pixel_sum",
                ],
            )
            out["out_width"] = out["out_width"].astype("int32")
            out["out_height"] = out["out_height"].astype("int32")
            out["n_channels"] = out["n_channels"].astype("int32")
            out["resized_bytes"] = out["resized_bytes"].astype("int64")
            out["resized_pixel_sum"] = out["resized_pixel_sum"].astype("int64")
            yield out

    return fan_out(mm).mapInPandas(resize_batches, RESIZED_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("min_pixel", T.IntegerType()),
        T.StructField("max_pixel", T.IntegerType()),
        T.StructField("n_distinct_pixels", T.LongType()),
        T.StructField("grad_sum", T.LongType()),
    ]
)


def image_features(mm: DataFrame) -> DataFrame:
    """REAL feature extraction over decoded pixels — the stand-in for an
    embedding-model forward pass. All features are integer-exact (sums,
    extrema, distinct channel-byte values, per-channel horizontal
    gradient energy) plus one double division, so a single-threaded SQL
    oracle reproduces them bit-for-bit with no float-fold hazards.
    ``n_pixels`` counts geometric pixels (w*h); value statistics range
    over every channel byte."""
    codec = make_png_codec()

    def feature_batches(batches):
        import numpy as np
        import pandas as pd

        _, decode_png = codec

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_png(payload)
                if px.ndim == 2:
                    px = px[:, :, None]
                px = px.astype(np.int64)
                h, w, ch = px.shape
                s = int(px.sum())
                grad = int(np.abs(np.diff(px, axis=1)).sum()) if w > 1 else 0
                rows.append(
                    (
                        int(did), w * h, ch, s / px.size, int(px.min()),
                        int(px.max()), int(np.unique(px).size), grad,
                    )
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_pixels", "n_channels", "mean_pixel",
                    "min_pixel", "max_pixel", "n_distinct_pixels", "grad_sum",
                ],
            )
            out["n_pixels"] = out["n_pixels"].astype("int64")
            out["n_channels"] = out["n_channels"].astype("int32")
            out["min_pixel"] = out["min_pixel"].astype("int32")
            out["max_pixel"] = out["max_pixel"].astype("int32")
            out["n_distinct_pixels"] = out["n_distinct_pixels"].astype("int64")
            out["grad_sum"] = out["grad_sum"].astype("int64")
            yield out

    return fan_out(mm).mapInPandas(feature_batches, FEATURES_SCHEMA)


def frame_sample_plan(mm: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    Native explode of a frame-index sequence — the decode of each
    sampled frame would then be a mapInPandas over (payload, frame_idx)
    with the same batch shape as :func:`decode_image`. (Multi-frame
    codecs — APNG/video — are not in this container; the sampling plan
    itself is the operator.)"""
    return mm.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def sample_frames(mm: DataFrame, every_nth: int = 2) -> DataFrame:
    """REAL frame sampling: one output row per kept frame, with stats
    computed from that frame's decoded pixels.

    ONE pass over each payload's chunk list: the sampler hands the
    codec a callable that picks every ``nth`` index once n_frames is
    known, so the CRC-validated walk runs once and ONLY the sampled
    indices hit zlib — APNG's independently-compressed frame streams
    make the skipped frames free. One Arrow-batched ``mapInPandas``
    after a ``fan_out`` rebalance (decode is CPU-heavy Python work; an
    under-split input would serialize it)."""
    codec = make_apng_codec()
    nth = int(every_nth)

    def frame_batches(batches):
        import numpy as np
        import pandas as pd

        _, decode_frames = codec

        for pdf in batches:
            out = {k.name: [] for k in FRAME_SCHEMA.fields}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, w, h, n = decode_frames(
                    payload, wanted=lambda nf: range(0, nf, nth)
                )
                idxs = sorted(frames)
                for i in idxs:
                    fr = frames[i]
                    ch = 1 if fr.ndim == 2 else fr.shape[2]
                    ps = int(fr.astype(np.int64).sum())
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(i)
                    out["n_frames"].append(n)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_channels"].append(ch)
                    out["pixel_sum"].append(ps)
                    out["mean_pixel"].append(ps / (w * h * ch))
            pdfout = pd.DataFrame(out)
            for c in ("frame_idx", "n_frames", "width", "height", "n_channels"):
                pdfout[c] = pdfout[c].astype("int32")
            yield pdfout

    return fan_out(mm.select("doc_id", "payload")).mapInPandas(
        frame_batches, FRAME_SCHEMA
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_channels", T.IntegerType()),
                    T.StructField("n_samples", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def attach_wav(
    df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars", rate: int = 8000
) -> DataFrame:
    """Audio fixture frame from documents: REAL RIFF/WAVE PCM16 payloads.

    Deterministic clips — channels = 1 + doc_id % 2 (mono/stereo
    alternating), n_samples (frames) = 256 + (n_chars*13) % 512,
    channel c of sample i = ((doc_id*7919 + i*2654435761 + 97*c) mod
    65536) − 32768, interleaved per the RIFF spec — so the DuckDB
    oracles can recompute every statistic from the formula while the
    operator must genuinely parse RIFF chunks, de-interleave, and read
    PCM bytes."""
    codec = make_wav_codec()

    def gen_batches(batches):
        import numpy as np
        import pandas as pd

        encode_wav, _ = codec

        for pdf in batches:
            payloads, metas = [], []
            for did, nc in zip(pdf[id_col], pdf[size_col]):
                did, nc = int(did), int(nc)
                ch = 1 + did % 2
                n = 256 + (nc * 13) % 512
                i = np.arange(n, dtype=np.int64)
                cs = np.arange(ch, dtype=np.int64)
                samples = (
                    (did * 7919 + i[:, None] * 2654435761 + 97 * cs[None, :])
                    % 65536
                ) - 32768
                if ch == 1:
                    samples = samples[:, 0]
                payloads.append(encode_wav(samples.astype(np.int16), rate=rate))
                metas.append(
                    {
                        "format": "wav",
                        "sample_rate": rate,
                        "n_channels": ch,
                        "n_samples": n,
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return fan_out(df.select(id_col, size_col)).mapInPandas(gen_batches, AUDIO_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(aw: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: parse the RIFF container,
    de-interleave, and compute clip statistics from the PCM samples.
    Integer accumulators (sum of squares over every channel, peak over
    every channel, per-channel sign-change counts summed) keep every
    value exactly engine-reproducible; ``rms`` is one final sqrt of an
    exact ratio over all channel samples. ``n_samples`` counts FRAMES
    (per-channel sample positions), matching duration semantics."""
    codec = make_wav_codec()

    def feature_batches(batches):
        import numpy as np
        import pandas as pd

        _, decode_wav = codec

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_wav(payload)
                s = samples.astype(np.int64)
                if s.ndim == 1:
                    s = s[:, None]
                n, ch = s.shape
                sum_sq = int((s * s).sum())
                out["doc_id"].append(int(did))
                out["sample_rate"].append(int(rate))
                out["n_channels"].append(ch)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // rate)
                out["peak"].append(int(np.abs(s).max()) if n else 0)
                out["sum_sq"].append(sum_sq)
                out["rms"].append(
                    float(np.sqrt(sum_sq / (n * ch))) if n else 0.0
                )
                out["zero_crossings"].append(
                    int(((s[:-1, :] * s[1:, :]) < 0).sum()) if n > 1 else 0
                )
            pdfout = pd.DataFrame(out)
            pdfout["sample_rate"] = pdfout["sample_rate"].astype("int32")
            pdfout["n_channels"] = pdfout["n_channels"].astype("int32")
            yield pdfout

    return fan_out(aw.select("doc_id", "payload")).mapInPandas(
        feature_batches, AUDIO_FEATURES_SCHEMA
    )


def make_signature_kernels():
    """(ahash_bits, energy_bits) — the pure-numpy perceptual-signature
    kernels shared by the batch operators (image_ahash,
    audio_fingerprint) and the streaming asset gate
    (streaming/asset_ingest.fingerprint_assets). Nested functions so
    closures capture them BY VALUE (same worker-import-free rule as the
    codecs); one implementation so a channel-weighting or thresholding
    change cannot silently diverge the two fingerprint surfaces."""

    def ahash_bits(px, grid=8):
        """uint8 pixels (2-D gray or 3-D color) → 64-char '0'/'1'
        average-hash over a nearest-neighbor lattice of the per-pixel
        integer channel sum; threshold by integer cross-multiplication
        (no float mean)."""
        import numpy as np

        if px.ndim == 2:
            px = px[:, :, None]
        h, w, _ch = px.shape
        lum = px.astype(np.int64).sum(axis=2)
        src_x = (np.arange(grid, dtype=np.int64) * w) // grid
        src_y = (np.arange(grid, dtype=np.int64) * h) // grid
        lat = lum[src_y][:, src_x]
        total = int(lat.sum())
        bits = lat * (grid * grid) >= total
        # Row-major (y, then x) — matches the oracle's ORDER BY j, i.
        return "".join("1" if b else "0" for b in bits.ravel())

    def energy_bits(samples, n_windows=32):
        """int16 samples (1-D mono or 2-D (n, ch)) → n_windows-char
        energy-profile bits: frame-index windows, per-window integer
        energy summed across channels, integer threshold vs clip mean."""
        import numpy as np

        s = samples.astype(np.int64)
        if s.ndim == 1:
            s = s[:, None]
        n = s.shape[0]
        w = (np.arange(n, dtype=np.int64) * n_windows) // max(n, 1)
        energy = np.zeros(n_windows, dtype=np.int64)
        np.add.at(energy, w, (s * s).sum(axis=1))
        bits = energy * n_windows >= int(energy.sum())
        return "".join("1" if b else "0" for b in bits)

    return ahash_bits, energy_bits


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.StringType()),
    ]
)


def image_ahash(mm: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash of frame 0 from REAL decoded pixels: the
    image-dedup signature (near-identical images share hashes; shifted/
    re-encoded copies usually do too) a multimodal curation pipeline
    groups on before any expensive pairwise comparison.

    The hash is engine-exact by construction: sample an ``grid x grid``
    nearest-neighbor lattice (src index = (i * w) // grid — the same
    closed-form indexing as resize_image) of the per-pixel CHANNEL SUM
    (the integer luminance proxy — gray images are just their single
    channel), then threshold each sample against the lattice mean using
    INTEGER cross-multiplication (v * grid² >= sum — no float mean, so
    no rounding ambiguity), and emit the 64 bits as a string. A 100 TB
    corpus groups on the hash — one shuffle of 8-byte-equivalent
    signatures, never pixels.
    """
    codec = make_png_codec()
    kernels = make_signature_kernels()

    def hash_batches(batches):
        import pandas as pd

        _, decode_png = codec
        ahash_bits, _ = kernels
        g = grid

        for pdf in batches:
            ids, hashes = [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                hashes.append(ahash_bits(decode_png(payload), grid=g))
                ids.append(int(did))
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    return fan_out(mm).mapInPandas(hash_batches, AHASH_SCHEMA)


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprint", T.StringType()),
    ]
)


def audio_fingerprint(aw: DataFrame, n_windows: int = 32) -> DataFrame:
    """Energy-profile audio fingerprint from REAL decoded samples: the
    clip splits into ``n_windows`` FRAME-index buckets (window of frame
    i = (i * n_windows) // n — same closed-form bucketing as the image
    lattice), each window's integer energy (sum of squares across every
    channel) is thresholded against the clip mean by integer
    cross-multiplication (e_w * n_windows >= total), and the bits form
    the signature a near-dup audio pass groups on. Engine-exact
    throughout — integer energies, integer compares."""
    codec = make_wav_codec()
    kernels = make_signature_kernels()

    def fp_batches(batches):
        import pandas as pd

        _, decode_wav = codec
        _, energy_bits = kernels
        nw = n_windows

        for pdf in batches:
            ids, fps = [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _rate = decode_wav(payload)
                fps.append(energy_bits(samples, n_windows=nw))
                ids.append(int(did))
            yield pd.DataFrame({"doc_id": ids, "fingerprint": fps})

    return fan_out(aw.select("doc_id", "payload")).mapInPandas(
        fp_batches, AUDIO_FP_SCHEMA
    )
