"""Pure-stdlib codec tests: exact roundtrips for PNG (every filter and
colour type), BMP, PNM, WAV, plus sniffing, resize, and honest-rejection
paths.  No Spark session needed — these run in milliseconds."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from biobloom_spark.functions.codecs import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_pnm,
    encode_wav,
    resize_nearest,
    sniff,
)


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a


class TestPNG:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_roundtrip_every_colortype_and_filter(self, channels, filt):
        img = _img(13, 7, channels, seed=channels * 10 + filt)
        out = decode_png(encode_png(img, row_filters=filt))
        np.testing.assert_array_equal(out, img)

    def test_roundtrip_mixed_filters_per_row(self):
        img = _img(10, 9, 3, seed=99)
        out = decode_png(encode_png(img, row_filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
        np.testing.assert_array_equal(out, img)

    def test_single_pixel_and_single_row(self):
        for shape in [(1, 1, 3), (1, 20, 4), (20, 1, 1)]:
            img = _img(*shape, seed=7)
            for filt in range(5):
                np.testing.assert_array_equal(
                    decode_png(encode_png(img, row_filters=filt)), img
                )

    def test_palette_decode(self):
        # hand-build an indexed (colour type 3) PNG: 2x3, 4-entry palette
        palette = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]], dtype=np.uint8
        )
        idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
        raster = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", palette.tobytes())
            + chunk(b"IDAT", zlib.compress(raster))
            + chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(decode_png(blob), palette[idx])

    def test_rejects_16bit_and_interlace(self):
        img = _img(4, 4, 3)
        good = encode_png(img)
        # flip depth byte (offset: 8 sig + 8 chunk hdr + 8 w/h)
        bad_depth = bytearray(good)
        bad_depth[24] = 16
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(bytes(bad_depth))
        bad_ilace = bytearray(good)
        bad_ilace[28] = 1
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(bytes(bad_ilace))

    def test_truncated_raises(self):
        good = encode_png(_img(6, 6, 3))
        with pytest.raises(ValueError):
            decode_png(good[: len(good) // 2])


class TestBMP:
    def test_roundtrip_24bit(self):
        for w in (5, 8, 13):  # cover every 4-byte row-padding phase
            img = _img(6, w, 3, seed=w)
            np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)

    def test_32bit_and_topdown_decode(self):
        # hand-build: 2x2 32-bit top-down (negative height) BGRA
        px = np.array(
            [[[1, 2, 3, 4], [5, 6, 7, 8]], [[9, 10, 11, 12], [13, 14, 15, 16]]],
            dtype=np.uint8,
        )  # RGBA
        bgra = px[:, :, [2, 1, 0, 3]].tobytes()  # top-down: no flip
        off = 14 + 40
        hdr = b"BM" + struct.pack("<IHHI", off + len(bgra), 0, 0, off)
        dib = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(bgra), 0, 0, 0, 0)
        np.testing.assert_array_equal(decode_bmp(hdr + dib + bgra), px)

    def test_rejects_compressed(self):
        good = bytearray(encode_bmp(_img(3, 3, 3)))
        struct.pack_into("<I", good, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError, match="unsupported BMP"):
            decode_bmp(bytes(good))


class TestPNM:
    @pytest.mark.parametrize("channels", [1, 3])
    def test_roundtrip(self, channels):
        img = _img(9, 4, channels, seed=channels)
        np.testing.assert_array_equal(decode_pnm(encode_pnm(img)), img)

    def test_comment_in_header(self):
        img = _img(3, 5, 3, seed=2)
        blob = encode_pnm(img, comment="made by a test")
        assert b"# made by a test" in blob
        np.testing.assert_array_equal(decode_pnm(blob), img)

    def test_rejects_16bit(self):
        with pytest.raises(ValueError, match="16-bit"):
            decode_pnm(b"P5\n2 2\n65535\n" + b"\x00" * 8)


class TestWAV:
    def test_roundtrip_16bit_stereo(self):
        rng = np.random.default_rng(5)
        samples = rng.integers(-30000, 30000, size=(480, 2)).astype(np.int16)
        out, rate = decode_wav(encode_wav(samples, 16000))
        assert rate == 16000
        np.testing.assert_array_equal(out, samples.astype(np.int32))

    def test_8bit_mono_is_centred(self):
        import io
        import wave as wv

        buf = io.BytesIO()
        with wv.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(1)
            f.setframerate(8000)
            f.writeframes(bytes([0, 128, 255]))
        out, rate = decode_wav(buf.getvalue())
        np.testing.assert_array_equal(out[:, 0], [-128, 0, 127])


class TestSniffAndResize:
    def test_sniff_all_formats(self):
        img = _img(4, 4, 3)
        assert sniff(encode_png(img)) == "png"
        assert sniff(encode_bmp(img)) == "bmp"
        assert sniff(encode_pnm(img)) == "pnm"
        assert sniff(encode_wav(np.zeros((16, 1), dtype=np.int16), 8000)) == "wav"
        assert sniff(b"garbage here") is None
        assert sniff(None) is None
        from biobloom_spark.operators.multimodal import synthesize_media

        assert sniff(synthesize_media(1, 0, 8, 8, 1)) == "bbmm"

    def test_decode_image_dispatch(self):
        img = _img(5, 6, 3, seed=11)
        for blob in (encode_png(img), encode_bmp(img), encode_pnm(img)):
            np.testing.assert_array_equal(decode_image(blob), img)
        with pytest.raises(ValueError):
            decode_image(encode_wav(np.zeros((4, 1), dtype=np.int16), 8000))

    def test_resize_identity_and_integral_upscale(self):
        img = _img(6, 4, 3, seed=3)
        np.testing.assert_array_equal(resize_nearest(img, 6, 4), img)
        up = resize_nearest(img, 12, 8)
        np.testing.assert_array_equal(up[::2, ::2], img)  # 2x nearest repeats
        down = resize_nearest(img, 3, 2)
        assert down.shape == (3, 2, 3)

    def test_cross_container_content_equality(self):
        """The same pixels through PNG and BMP decode identically — the
        content-level invariant the stdlib feature extractor relies on."""
        img = _img(12, 12, 3, seed=42)
        np.testing.assert_array_equal(
            decode_png(encode_png(img, row_filters=4)), decode_bmp(encode_bmp(img))
        )
