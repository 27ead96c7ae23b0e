"""Pure-stdlib media codecs: PNG / BMP / PNM images and RIFF-WAVE audio.

No third-party codec library (pillow, torchaudio, opencv) ships in this
container, but the stdlib that does ship — ``zlib``, ``struct``,
``wave`` — is enough to implement the *baseline profiles* of the
standard formats exactly from their public specifications:

- **PNG** (W3C PNG spec / RFC 2083): bit depth 8, colour types 0
  (greyscale), 2 (truecolour), 3 (indexed + ``PLTE``), 4 (grey+alpha),
  6 (truecolour+alpha), non-interlaced, all five scanline filters
  (None / Sub / Up / Average / Paeth).
- **BMP** (``BITMAPINFOHEADER``): uncompressed 24/32-bit ``BI_RGB``,
  bottom-up or top-down.
- **PNM** (netpbm ``P5`` greymap / ``P6`` pixmap): binary, maxval ≤ 255,
  comment-tolerant headers.
- **WAV** (RIFF PCM, via stdlib ``wave``): 8/16/32-bit integer PCM, any
  channel count.
- **GIF** (GIF87a/89a): full LZW decode (variable code width, clear/EOI,
  the KwKwK case), global/local colour tables, interlacing, frame
  composition honouring transparency and disposal methods 0-3 — i.e.
  *animated* GIF decodes to a real frame stack, which gives the
  multimodal ``sample_frames`` operator a genuinely decodable moving-
  picture format.
- **TIFF** (6.0 baseline): uncompressed, both byte orders (II/MM),
  greyscale / RGB / RGBA at 8 bits per sample, multi-strip.

Decoders return numpy arrays — images ``(H, W, C) uint8``, audio
``(frames, channels) int32`` — so the downstream feature UDFs stay
vectorized.  Every decoder has a matching encoder so the test suite can
prove *exact* roundtrips, including each PNG filter inverse (the encoder
takes a forced per-row filter list).

Scope notes (honest limits, enforced with ``ValueError``): PNG bit
depths other than 8, interlaced PNGs, paletted BMPs, RLE BMPs, float
PCM and 24-bit PCM WAV are rejected, not mis-decoded.  JPEG and every
video codec need entropy-coding/DSP libraries that are genuinely absent
from this container and stay behind the ``stub`` decoder in
``operators/multimodal.py``.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "sniff",
    "decode_image",
    "decode_png",
    "encode_png",
    "decode_bmp",
    "encode_bmp",
    "decode_pnm",
    "encode_pnm",
    "decode_wav",
    "encode_wav",
    "decode_gif",
    "encode_gif",
    "decode_tiff",
    "encode_tiff",
    "resize_nearest",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: colour type → channels (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_COLORTYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels → colour type (encode)


def sniff(blob: bytes | None) -> str | None:
    """Magic-number format sniff: ``png``/``bmp``/``pnm``/``wav``/``bbmm``
    (the engine's synthetic test format) or ``None``."""
    if not blob or len(blob) < 12:
        return None
    if blob[:8] == _PNG_SIG:
        return "png"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] in (b"P5", b"P6") and blob[2:3].isspace():
        return "pnm"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if blob[:4] == b"BBMM":
        return "bbmm"
    return None


def decode_image(blob: bytes) -> np.ndarray:
    """Dispatch on magic → ``(H, W, C) uint8``.  Raises ``ValueError`` for
    unknown or audio blobs."""
    kind = sniff(blob)
    if kind == "png":
        return decode_png(blob)
    if kind == "bmp":
        return decode_bmp(blob)
    if kind == "pnm":
        return decode_pnm(blob)
    if kind == "gif":  # first composed frame, alpha dropped over black
        frames, _delays = decode_gif(blob)
        return np.ascontiguousarray(frames[0, :, :, :3])
    if kind == "tiff":
        return decode_tiff(blob)
    raise ValueError(f"not a decodable image format: {kind!r}")


# ---------------------------------------------------------------------------
# PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_row(f: int, raw: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Invert one PNG scanline filter.  ``raw``/``prior`` are uint8 vectors
    of length W*bpp (``prior`` is the *reconstructed* previous row, zeros
    for the first).  uint8 arithmetic wraps — exactly PNG's mod-256."""
    if f == 0:
        return raw.copy()
    if f == 2:  # Up
        return raw + prior
    if f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp] → per-phase cumsum
        out = raw.copy()
        for p in range(bpp):
            np.cumsum(out[p::bpp], dtype=np.uint8, out=out[p::bpp])
        return out
    out = np.empty_like(raw)
    w = raw.size // bpp
    if f == 3:  # Average: + floor((left + up) / 2) in full precision
        left = np.zeros(bpp, dtype=np.int32)
        for x in range(w):
            s = slice(x * bpp, (x + 1) * bpp)
            rec = (raw[s].astype(np.int32) + (left + prior[s]) // 2) & 0xFF
            out[s] = rec.astype(np.uint8)
            left = rec
        return out
    if f == 4:  # Paeth
        left = np.zeros(bpp, dtype=np.int32)
        upleft = np.zeros(bpp, dtype=np.int32)
        for x in range(w):
            s = slice(x * bpp, (x + 1) * bpp)
            up = prior[s].astype(np.int32)
            pred = np.array(
                [_paeth(int(left[i]), int(up[i]), int(upleft[i])) for i in range(bpp)],
                dtype=np.int32,
            )
            rec = (raw[s].astype(np.int32) + pred) & 0xFF
            out[s] = rec.astype(np.uint8)
            left, upleft = rec, up
        return out
    raise ValueError(f"unknown PNG filter type {f}")


def _filter_row(f: int, recon: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Apply one PNG scanline filter (the encode direction)."""
    if f == 0:
        return recon.copy()
    shifted = np.zeros_like(recon)
    shifted[bpp:] = recon[:-bpp]
    if f == 1:
        return recon - shifted
    if f == 2:
        return recon - prior
    if f == 3:
        avg = (shifted.astype(np.int32) + prior.astype(np.int32)) // 2
        return (recon.astype(np.int32) - avg).astype(np.uint8)
    if f == 4:
        prior_shift = np.zeros_like(prior)
        prior_shift[bpp:] = prior[:-bpp]
        pred = np.array(
            [
                _paeth(int(shifted[i]), int(prior[i]), int(prior_shift[i]))
                for i in range(recon.size)
            ],
            dtype=np.int32,
        )
        return (recon.astype(np.int32) - pred).astype(np.uint8)
    raise ValueError(f"unknown PNG filter type {f}")


def _png_chunks(blob: bytes):
    pos = 8
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def decode_png(blob: bytes) -> np.ndarray:
    """PNG → ``(H, W, C) uint8`` (palette images expand to RGB, C=3)."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    width = height = None
    colortype = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(blob):
        if ctype == b"IHDR":
            width, height, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
            if colortype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG colour type {colortype}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    bpp = _PNG_CHANNELS[colortype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + width * bpp
    if raw.size != height * stride:
        raise ValueError("PNG pixel data size mismatch")
    rows = raw.reshape(height, stride)
    out = np.empty((height, width * bpp), dtype=np.uint8)
    prior = np.zeros(width * bpp, dtype=np.uint8)
    for y in range(height):
        prior = _unfilter_row(int(rows[y, 0]), rows[y, 1:], prior, bpp)
        out[y] = prior
    img = out.reshape(height, width, bpp)
    if colortype == 3:
        if palette is None:
            raise ValueError("indexed PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray, row_filters=None) -> bytes:
    """``(H, W, C) uint8`` → PNG bytes.  ``row_filters`` forces the filter
    type per row (int or list, default 0) — the test hook that exercises
    every decoder filter path."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in _PNG_COLORTYPE:
        raise ValueError(f"unsupported channel count {c}")
    if row_filters is None:
        row_filters = [0] * h
    elif isinstance(row_filters, int):
        row_filters = [row_filters] * h
    flat = img.reshape(h, w * c)
    lines = bytearray()
    prior = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        f = int(row_filters[y])
        lines.append(f)
        lines.extend(_filter_row(f, flat[y], prior, c).tobytes())
        prior = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLORTYPE[c], 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP


def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit ``BI_RGB`` BMP → ``(H, W, 3|4) uint8``."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", blob[10:14])
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    width, height = struct.unpack("<ii", blob[18:26])
    planes, bitcount = struct.unpack("<HH", blob[26:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if compression != 0 or bitcount not in (24, 32):
        raise ValueError(f"unsupported BMP: {bitcount}-bit compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    nchan = bitcount // 8
    row_bytes = (width * nchan + 3) & ~3  # rows pad to 4 bytes
    pix = np.frombuffer(blob, dtype=np.uint8, count=height * row_bytes, offset=data_off)
    rows = pix.reshape(height, row_bytes)[:, : width * nchan]
    img = rows.reshape(height, width, nchan)
    if bottom_up:
        img = img[::-1]
    # BGR(A) → RGB(A)
    img = img[:, :, [2, 1, 0] + ([3] if nchan == 4 else [])]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """``(H, W, 3) uint8`` → 24-bit bottom-up BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp writes 24-bit RGB only")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


# ---------------------------------------------------------------------------
# PNM (netpbm binary)


def decode_pnm(blob: bytes) -> np.ndarray:
    """``P5`` (grey) / ``P6`` (RGB) binary netpbm, maxval ≤ 255."""
    magic = blob[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if pos < len(blob) and blob[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(blob) and blob[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(int(blob[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    c = 1 if magic == b"P5" else 3
    pix = np.frombuffer(blob, dtype=np.uint8, count=h * w * c, offset=pos)
    return pix.reshape(h, w, c).copy()


def encode_pnm(img: np.ndarray, comment: str | None = None) -> bytes:
    """``(H, W, 1|3) uint8`` → binary ``P5``/``P6``."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError("PNM is grey or RGB only")
    magic = b"P5" if c == 1 else b"P6"
    head = magic + b"\n"
    if comment:
        head += b"# " + comment.encode() + b"\n"
    head += f"{w} {h}\n255\n".encode()
    return head + img.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF PCM via stdlib `wave`)


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV → ``((frames, channels) int32, sample_rate)``.

    8-bit PCM is unsigned per the RIFF spec and is centred to [-128, 127];
    16/32-bit are signed little-endian.  24-bit and float PCM raise."""
    with wave.open(io.BytesIO(blob), "rb") as f:
        nch, sw, rate, nframes = f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes()
        raw = f.readframes(nframes)
    if sw == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif sw == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported WAV sample width {sw} bytes")
    return samples.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """``(frames, channels)`` int → 16-bit PCM WAV bytes."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# GIF (LZW)

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) rows


def _lzw_decode(data: bytes, min_code: int) -> bytearray:
    """GIF-flavoured LZW: variable code width ``min_code+1``..12 bits,
    LSB-first bit packing, CLEAR/EOI codes, and the KwKwK special case."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Inverse of ``_lzw_decode``.  The decoder's string table runs one
    entry behind the encoder's, so the width bump here triggers when the
    *decoder's* table (len(table) - 1) fills the current width — that
    off-by-one is the classic GIF interop bug, pinned by the roundtrip
    tests crossing every width boundary and the 4096-entry reset."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4097:  # table full: reset mid-stream
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        w = wk[-1:]
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_subblocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0 terminator)."""
    chunks = []
    while True:
        n = blob[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(blob[pos : pos + n])
        pos += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder interlaced GIF rows (4 passes) back to top-to-bottom."""
    h = rows.shape[0]
    order = [y for start, step in _GIF_INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


def decode_gif(blob: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF87a/89a → ``((n_frames, H, W, 4) uint8 RGBA, delays)``.

    Frames are *composed* onto the logical screen exactly as a viewer
    renders them: each frame draws its (possibly partial, possibly
    interlaced) patch through its transparency index, then applies its
    disposal method — 0/1 leave, 2 restores the patch to transparent,
    3 restores the pre-frame canvas.  Delays are per frame in
    centiseconds (0 when no graphic control extension is present)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height, packed, _bg, _aspect = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((height, width, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = blob[pos]
            pos += 1
            data, pos = _gif_subblocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags, delay = struct.unpack("<BH", data[:3])
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(
                blob, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(-1, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame with no colour table")
        min_code = blob[pos]
        pos += 1
        data, pos = _gif_subblocks(blob, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode(data, min_code)), dtype=np.uint8, count=fw * fh
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        saved = canvas.copy() if disposal == 3 else None
        patch = np.empty((fh, fw, 4), dtype=np.uint8)
        patch[:, :, :3] = table[idx]
        patch[:, :, 3] = 255
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = patch[opaque]
        else:
            region[:] = patch
        frames.append(canvas.copy())
        delays.append(int(delay))
        if disposal == 2:  # restore patch region to transparent
            canvas[top : top + fh, left : left + fw] = 0
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent, disposal, delay = None, 0, 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames), delays


def encode_gif(
    frames: np.ndarray, delays: list[int] | None = None, interlace: bool = False
) -> bytes:
    """``(n, H, W, 3) uint8`` (≤256 distinct colours across all frames) →
    animated GIF89a with a global colour table, full-canvas frames and
    disposal 1.  ``interlace=True`` writes rows in the 4-pass order (the
    decoder-path test hook).  Raises if the palette exceeds 256."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("encode_gif takes RGB frames")
    colors, inverse = np.unique(frames.reshape(-1, 3), axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError(f"GIF palette overflow: {colors.shape[0]} colours")
    gct_bits = max(1, int(colors.shape[0] - 1).bit_length())
    gct_n = 1 << gct_bits
    palette = np.zeros((gct_n, 3), dtype=np.uint8)
    palette[: colors.shape[0]] = colors
    indices = inverse.astype(np.uint8).reshape(n, h, w)
    if delays is None:
        delays = [4] * n
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 0x07), 0, 0)
    out += palette.tobytes()
    min_code = max(2, gct_bits)
    for f in range(n):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 1 << 2, int(delays[f]), 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        rows = indices[f]
        if interlace:
            order = [
                y for start, step in _GIF_INTERLACE_PASSES for y in range(start, h, step)
            ]
            rows = rows[np.array(order)]
        out.append(min_code)
        packed = _lzw_encode(rows.tobytes(), min_code)
        for i in range(0, len(packed), 255):
            chunk = packed[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (6.0 baseline, uncompressed)

_TIFF_TAGS = {
    256: "width",          # ImageWidth
    257: "height",         # ImageLength
    258: "bits",           # BitsPerSample
    259: "compression",
    262: "photometric",
    273: "strip_offsets",
    277: "spp",            # SamplesPerPixel
    278: "rows_per_strip",
    279: "strip_counts",
}
_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}  # BYTE ASCII SHORT LONG


def decode_tiff(blob: bytes) -> np.ndarray:
    """Baseline uncompressed TIFF → ``(H, W, C) uint8``.  Both byte
    orders; greyscale (photometric 1), RGB, RGBA; 8 bits/sample;
    multi-strip.  Compressed / paletted / tiled TIFFs raise."""
    if blob[:4] == b"II*\x00":
        e = "<"
    elif blob[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(e + "I", blob[4:8])
    (n_entries,) = struct.unpack(e + "H", blob[ifd_off : ifd_off + 2])
    tags: dict[str, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(e + "HHI", blob[off : off + 8])
        name = _TIFF_TAGS.get(tag)
        if name is None or typ not in _TIFF_TYPE_SIZE:
            continue
        size = _TIFF_TYPE_SIZE[typ] * count
        if size <= 4:
            raw = blob[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(e + "I", blob[off + 8 : off + 12])
            raw = blob[voff : voff + size]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[name] = list(struct.unpack(e + fmt * count, raw))
    for req in ("width", "height", "strip_offsets", "strip_counts"):
        if req not in tags:
            raise ValueError(f"TIFF missing required tag {req}")
    if tags.get("compression", [1])[0] != 1:
        raise ValueError("compressed TIFF unsupported (baseline uncompressed only)")
    photometric = tags.get("photometric", [1])[0]
    if photometric not in (1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    spp = tags.get("spp", [1])[0]
    if spp not in (1, 3, 4) or (photometric == 1) != (spp == 1):
        raise ValueError(f"unsupported TIFF samples/pixel {spp}")
    if any(b != 8 for b in tags.get("bits", [8])):
        raise ValueError("only 8-bit TIFF samples supported")
    w, h = tags["width"][0], tags["height"][0]
    data = b"".join(
        blob[o : o + c] for o, c in zip(tags["strip_offsets"], tags["strip_counts"])
    )
    pix = np.frombuffer(data, dtype=np.uint8, count=h * w * spp)
    return pix.reshape(h, w, spp).copy()


def encode_tiff(img: np.ndarray, big_endian: bool = False) -> bytes:
    """``(H, W, 1|3|4) uint8`` → uncompressed single-strip TIFF (II by
    default, MM with ``big_endian`` — the decoder-path test hook)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3, 4):
        raise ValueError("TIFF is grey, RGB or RGBA here")
    e = ">" if big_endian else "<"
    pix = img.tobytes()
    entries = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (259, 3, 1, 1),                    # uncompressed
        (262, 3, 1, 1 if c == 1 else 2),   # photometric
        (273, 4, 1, None),                 # strip offset (patched below)
        (277, 3, 1, c),
        (278, 3, 1, h),
        (279, 4, 1, len(pix)),
    ]
    bits_off = None
    if c > 1:  # BitsPerSample needs c SHORTs → out-of-line value
        entries.insert(2, (258, 3, c, None))
    else:
        entries.insert(2, (258, 3, 1, 8))
    entries.sort(key=lambda t: t[0])
    header = struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = 8 + ifd_size
    extra = b""
    if c > 1:
        bits_off = extra_off
        extra = struct.pack(e + "H" * c, *([8] * c))
    strip_off = extra_off + len(extra)
    out = bytearray(header)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, count, val in entries:
        if tag == 273:
            val = strip_off
        if tag == 258 and count > 1:
            val = bits_off
        if typ == 3 and count == 1:
            payload = struct.pack(e + "HH", val, 0)
        else:
            payload = struct.pack(e + "I", val)
        out += struct.pack(e + "HHI", tag, typ, count) + payload
    out += struct.pack(e + "I", 0)  # next-IFD pointer
    out += extra
    out += pix
    return bytes(out)


# ---------------------------------------------------------------------------
# Resize


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resample to ``(out_h, out_w, C)`` — pure index
    map (pixel-centre convention: source index ``floor((i + 0.5) * scale)``),
    deterministic and exact for integral upscales."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * (h / out_h)).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * (w / out_w)).astype(np.int64), w - 1)
    return np.ascontiguousarray(img[ys[:, None], xs[None, :]])
