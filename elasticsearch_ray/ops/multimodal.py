"""Multimodal (image/audio/video) column processing for training-data
pipelines.

Media travel as opaque ``binary`` columns with typed metadata columns
(mime, width/height/duration). Stages are actor-pool ``map_batches`` classes.

Codec status (no image/audio libraries ship in this container):

- **REAL, from scratch**: uncompressed formats decoded/encoded with
  stdlib + numpy only — 24-bit BI_RGB **BMP** (BITMAPFILEHEADER +
  BITMAPINFOHEADER, bottom-up rows, 4-byte row padding), binary **PPM**
  (P6), and 16-bit PCM **WAV** (stdlib ``wave``). Round-trip tested.
- **REAL, from scratch (compressed)**: **PNG** via stdlib ``zlib`` —
  encoder (filter 0 + deflate) and decoder (8-bit gray/RGB/palette/RGBA,
  all five scanline filters per the public PNG spec §9; Adam7 interlace
  rejected). Round-trip + filter-matrix tested. **GIF** (87a/89a) — LZW
  decoder per the public spec (variable-width LSB-first codes, CLEAR/EOI,
  KwKwK case, 12-bit cap), global/local palettes, multi-frame composition
  (the real compressed "video" path for frame sampling); paletted
  encoder. Interlace rejected.
- **REAL, from scratch (DCT)**: baseline **JPEG** (:mod:`.jpeg`) —
  8×8 DCT + Annex-K quant/Huffman tables per ITU-T T.81; grayscale and
  4:4:4 YCbCr color, self-describing DHT decode. Lossy round-trip
  (PSNR) tested. Progressive/subsampled/12-bit rejected.
- **STUBBED**: the remaining DSP codecs (MP3/H.264 …) raise
  ``NotImplementedError`` from the dispatching decoders; swapping in
  PIL/torchaudio means replacing only the decoder-dispatch bodies.
- The deterministic ``ESRIMG`` synthetic format (``synthesize_media``)
  remains for multi-frame "video" tests.

Batch-size guidance encoded here (SURVEY memory-aware rule): media rows are
large, so stages default to small ``batch_size`` and ``batch_format="pyarrow"``
(binary columns round-trip Arrow zero-copy; pandas would objectify them).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .jpeg import decode_jpeg, encode_jpeg

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("payload", pa.binary()),
    ]
)

_MAGIC = b"ESRIMG1\x00"


def synthesize_media(n: int, seed: int = 42, max_side: int = 32, n_frames: int = 1) -> pa.Table:
    """Deterministic fake media: payload = magic + w,h,frames header + uint8
    'pixel' planes. Stands in for real JPEG/WAV bytes."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "mime", "width", "height", "n_frames", "payload")}
    for i in range(n):
        w = int(rng.integers(8, max_side + 1))
        h = int(rng.integers(8, max_side + 1))
        f = n_frames if n_frames > 1 else 1
        pixels = rng.integers(0, 256, size=f * h * w, dtype=np.uint8)
        payload = (
            _MAGIC
            + np.array([w, h, f], dtype="<i4").tobytes()
            + pixels.tobytes()
        )
        rows["media_id"].append(i)
        rows["mime"].append("image/fake" if f == 1 else "video/fake")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(f)
        rows["payload"].append(payload)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "payload": pa.array(rows["payload"], pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


# ------------------------------------------------------------- real codecs

def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up rows,
    BGR order, rows padded to 4 bytes — the on-disk format, not a sketch)."""
    arr = np.asarray(arr, np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    bgr = arr[::-1, :, ::-1]  # bottom-up, BGR
    padded = np.zeros((h, row_size), np.uint8)
    padded[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + padded.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (1, h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP decodes here (bpp={bpp}, "
            f"compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=row_size * h,
                         offset=data_off).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = (bgr if top_down else bgr[::-1])[:, :, ::-1]
    return rgb[None, :, :, :].copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6)."""
    arr = np.asarray(arr, np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (1, h, w, 3) uint8 RGB. Handles comment lines."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM decodes here")
    rgb = np.frombuffer(payload, np.uint8, count=h * w * 3, offset=pos)
    return rgb.reshape(1, h, w, 3).copy()


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n,) or (n, channels) int16 PCM → WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, channels) int16, sample_rate). 16-bit PCM only;
    compressed audio (MP3/AAC/…) raises — no codecs in this container."""
    import io
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        # full container check: other RIFF formats (WebP 'RIFF..WEBP',
        # AVI 'RIFF..AVI ') must take the documented missing-codec path,
        # not leak wave.Error out of wave.open
        raise NotImplementedError(
            "compressed audio codecs are unavailable in this environment; "
            "only PCM WAV decodes")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV decodes here")
        n, ch, rate = wf.getnframes(), wf.getnchannels(), wf.getframerate()
        raw = wf.readframes(n)
    return np.frombuffer(raw, np.int16).reshape(n, ch).copy(), rate


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------------ GIF


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-variant LZW (public GIF89a spec appendix F): variable-width
    codes packed LSB-first, CLEAR resets the table, EOI ends, table caps
    at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    out: list[int] = []
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out[:n_pixels]
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= n_pixels:
                return out[:n_pixels]
    return out[:n_pixels]


def _lzw_encode_simple(indices: np.ndarray, min_code_size: int) -> bytes:
    """Valid GIF LZW stream that never grows the table: CLEAR before
    every literal, so codes stay at ``min_code_size + 1`` bits. Larger
    than real LZW, byte-exact on decode — the encoder half of the
    round-trip contract."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    acc = bits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    for v in indices:
        emit(int(v))
        emit(clear)  # keep the decoder's table (and code width) fixed
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: np.ndarray) -> bytes:
    """(f, h, w, 3) uint8 → animated GIF89a with one global palette built
    from the distinct colors (> 256 distinct colors raises — the format's
    own limit; quantization is a modeling choice left to callers)."""
    a = np.asarray(frames, np.uint8)
    if a.ndim == 3:
        a = a[None]
    f, h, w, _c = a.shape
    flat = a.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <= 256 distinct colors, "
                         f"got {len(palette)}")
    pal_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal_size = 1 << pal_bits
    pal = np.zeros((pal_size, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF0 | (pal_bits - 1), 0, 0)
    out += pal.tobytes()
    idx = inverse.reshape(f, h * w)
    min_code = max(2, pal_bits)
    for fi in range(f):
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        stream = _lzw_encode_simple(idx[fi], min_code)
        for off in range(0, len(stream), 255):
            chunk = stream[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a → (frames, h, w, 3) uint8. Global + local color
    tables, multi-frame (frames composite onto the running canvas at
    their offsets — the spec's do-not-dispose behavior), extensions
    skipped; interlaced images raise NotImplementedError."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames = []
    canvas = np.zeros((h, w, 3), np.uint8)
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", payload,
                                                       pos)
        pos += 9
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload, np.uint8,
                                  n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        stream = bytearray()
        while payload[pos]:
            ln = payload[pos]
            stream += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(stream), min_code, iw * ih)
        if len(idx) != iw * ih:
            raise ValueError("GIF pixel data truncated")
        frame = table[np.asarray(idx, np.int64)].reshape(ih, iw, 3)
        canvas[top:top + ih, left:left + iw] = frame
        frames.append(canvas.copy())
    if not frames:
        raise ValueError("GIF has no image data")
    return np.stack(frames)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """PNG encoder (public spec, stdlib zlib): 8-bit gray (h,w) / RGB
    (h,w,3) / RGBA (h,w,4), filter 0 on every scanline, one IDAT."""
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"PNG encode supports 1/3/4 channels, got {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8),  # filter byte 0 per scanline
         a.reshape(h, w * c)], axis=1).tobytes()
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def _png_unfilter(data: np.ndarray, h: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters (spec §9: None/Sub/Up/
    Average/Paeth). Sub/Up vectorize (per-lane cumsum / row add); Average
    and Paeth carry an in-row dependency, so those rows walk bytes."""
    rows = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else \
            np.zeros(stride, np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            rec = cur.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(cur[lane::bpp]) % 256
        elif f == 2:  # Up
            rec = (cur + prior) % 256
        elif f == 3:  # Average
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + (left + prior[x]) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                cc = prior[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else cc)
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG decoder (public spec, stdlib zlib): 8-bit depth, color types
    0 (gray), 2 (RGB), 3 (palette), 6 (RGBA); every scanline filter;
    Adam7 interlace raises NotImplementedError. Returns (h, w, c) uint8."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    idat = b""
    plte = None
    w = h = depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"only 8-bit PNG decodes (depth {depth})")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    stride = w * channels
    data = np.frombuffer(zlib.decompress(idat), np.uint8)
    if len(data) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = _png_unfilter(data, h, stride, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[out.reshape(h, w)]
    return out.reshape(h, w, channels)


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatching image/video decoder → (frames, h, w, channels) uint8.
    BMP ('BM'), PPM ('P6'), PNG, GIF and baseline JPEG decode for real;
    the synthetic ESRIMG format decodes via its header (channels=1);
    anything else (H.264/…) raises like a missing codec."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload.startswith(_PNG_SIG):
        a = decode_png(payload)
        return a[None, :, :, :]
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        a = decode_jpeg(payload)
        if a.ndim == 2:
            a = a[:, :, None]
        return a[None, :, :, :]
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)[None, :, :, :]
    if payload.startswith(_MAGIC):
        return decode_image_stub(payload)[:, :, :, None]
    raise NotImplementedError(
        "H.264-class codecs are unavailable in this environment; "
        "BMP, P6 PPM, PNG, GIF, baseline JPEG and the synthetic ESRIMG "
        "format decode")


def _encode_like(src_payload: bytes, arr: np.ndarray) -> bytes:
    """Re-encode ``(f, h, w, c)`` pixels in ``src_payload``'s own format
    (the decode → transform → encode round trip stays within one codec)."""
    if src_payload[:2] == b"BM":
        return encode_bmp(arr[0])
    if src_payload[:2] == b"P6":
        return encode_ppm(arr[0])
    if src_payload.startswith(_PNG_SIG):
        frame = arr[0]
        return encode_png(frame[:, :, 0] if frame.shape[2] == 1 else frame)
    if src_payload[:6] in (b"GIF87a", b"GIF89a"):
        return encode_gif(arr if arr.shape[3] == 3 else
                          np.repeat(arr, 3, axis=3))
    if src_payload[:2] == b"\xff\xd8":
        frame = arr[0]
        return encode_jpeg(frame[:, :, 0] if frame.shape[2] == 1
                           else frame)
    if src_payload[:4] in (b"II*\x00", b"MM\x00*"):
        return encode_tiff(arr[0])
    f, h, w, _c = arr.shape
    return (_MAGIC + np.array([w, h, f], dtype="<i4").tobytes()
            + np.ascontiguousarray(arr[:, :, :, 0]).tobytes())


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: parses the synthetic header → (frames, h, w) uint8 array.
    Real deployment: replace body with PIL.Image.open / cv2.imdecode.
    Raises on foreign bytes like a real decoder would."""
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real image codecs are unavailable in this environment; "
            "only the synthetic ESRIMG format decodes"
        )
    w, h, f = np.frombuffer(payload, dtype="<i4", count=3, offset=len(_MAGIC))
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=len(_MAGIC) + 12)
    return pixels.reshape(int(f), int(h), int(w))


class DecodeStats:
    """Actor-pool stage: decode → per-media pixel stats (mean/std/entropy
    proxy). Setup (none here; a model would load in __init__) amortized per
    actor; small batch_size recommended for large payloads."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, stds, frames = [], [], [], []
        for mid, payload in zip(batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()):
            arr = decode_image(payload)
            ids.append(mid)
            means.append(float(arr.mean()))
            stds.append(float(arr.std()))
            frames.append(arr.shape[0])
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "pix_mean": pa.array(np.round(means, 6)),
                "pix_std": pa.array(np.round(stds, 6)),
                "n_frames": pa.array(frames, pa.int32()),
            }
        )


class ResizeStage:
    """Actor-pool stage: nearest-neighbor resize to (out_h, out_w), re-encoded
    into the same payload format (decode → transform → encode round trip)."""

    def __init__(self, out_h: int, out_w: int, payload_col: str = "payload"):
        self.out_h, self.out_w = out_h, out_w
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.payload_col].to_pylist():
            arr = decode_image(payload)
            _f, h, w, _c = arr.shape
            yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            resized = arr[:, yi][:, :, xi]
            out.append(_encode_like(payload, resized))
        cols = {c: batch[c] for c in batch.column_names if c != self.payload_col}
        cols["width"] = pa.array(np.full(len(batch), self.out_w, np.int32))
        cols["height"] = pa.array(np.full(len(batch), self.out_h, np.int32))
        cols[self.payload_col] = pa.array(out, pa.binary())
        return pa.table(cols)


class EmbedStage:
    """Actor-pool stage: media → fixed-dim feature vector (downsampled pixel
    histogram — the stub for a vision model forward pass; a real model loads
    in __init__ ONCE per actor and runs batched inference in __call__)."""

    def __init__(self, dim: int = 16, payload_col: str = "payload", id_col: str = "media_id"):
        self.dim, self.payload_col, self.id_col = dim, payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, vecs = [], []
        for mid, payload in zip(batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()):
            arr = decode_image(payload)
            hist, _ = np.histogram(arr, bins=self.dim, range=(0, 256))
            v = hist.astype(np.float32)
            n = np.linalg.norm(v)
            vecs.append((v / n if n else v).tolist())
            ids.append(mid)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )


class FrameSampleStage:
    """Video frame sampling: keep every k-th frame (decode → slice →
    re-encode), the scale pattern for frame-level training data."""

    def __init__(self, every_k: int = 2, payload_col: str = "payload"):
        self.every_k = every_k
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, nf = [], []
        for payload in batch[self.payload_col].to_pylist():
            arr = decode_image(payload)
            sampled = arr[:: self.every_k]
            out.append(_encode_like(payload, sampled))
            nf.append(sampled.shape[0])
        cols = {c: batch[c] for c in batch.column_names if c not in (self.payload_col, "n_frames")}
        cols["n_frames"] = pa.array(nf, pa.int32())
        cols[self.payload_col] = pa.array(out, pa.binary())
        return pa.table(cols)


class AudioFeatures:
    """Actor-pool stage: PCM WAV payload → real DSP features (all numpy):
    duration, RMS level, zero-crossing rate, spectral centroid via rFFT.
    A learned audio model would load in __init__ once per actor and run
    batched inference here instead."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, dur, rms, zcr, cent = [], [], [], [], []
        for mid, payload in zip(batch[self.id_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            samples, rate = decode_audio(payload)
            x = samples.mean(axis=1) / 32768.0  # downmix to mono, [-1, 1)
            n = len(x)
            spec = np.abs(np.fft.rfft(x)) ** 2  # power weighting: robust to
            freqs = np.fft.rfftfreq(n, d=1.0 / rate)  # a broadband noise floor
            power = spec.sum()
            ids.append(mid)
            dur.append(round(n / rate, 6))
            rms.append(round(float(np.sqrt(np.mean(x * x))), 6))
            zcr.append(round(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))), 6))
            cent.append(round(float((freqs * spec).sum() / power) if power else 0.0, 3))
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "duration_s": pa.array(dur, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_cross_rate": pa.array(zcr, pa.float64()),
                "spectral_centroid_hz": pa.array(cent, pa.float64()),
            }
        )


def synthesize_png_media(n: int, seed: int = 42,
                         max_side: int = 24) -> pa.Table:
    """Deterministic REAL PNG payloads (gradient + noise RGB, deflated)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "mime", "width", "height",
                            "n_frames", "payload")}
    for i in range(n):
        w = int(rng.integers(8, max_side + 1))
        h = int(rng.integers(8, max_side + 1))
        grad = (np.arange(h)[:, None, None] * 8
                + np.arange(w)[None, :, None] * 4)
        img = ((grad + rng.integers(0, 64, (h, w, 3))) % 256).astype(np.uint8)
        rows["media_id"].append(i)
        rows["mime"].append("image/png")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(1)
        rows["payload"].append(encode_png(img))
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "payload": pa.array(rows["payload"], pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def synthesize_jpeg_media(n: int, seed: int = 42,
                          max_side: int = 24) -> pa.Table:
    """Deterministic REAL baseline-JPEG payloads (smooth gradient + mild
    noise RGB — the content JPEG's DCT model is built for)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "mime", "width", "height",
                            "n_frames", "payload")}
    for i in range(n):
        w = int(rng.integers(9, max_side + 1))
        h = int(rng.integers(9, max_side + 1))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            np.sin(xx / 7.0 + i) * 60 + 128,
            np.cos(yy / 5.0) * 50 + 120,
            (xx + yy + rng.integers(0, 16, (h, w))) % 200 + 20,
        ], axis=2).astype(np.uint8)
        rows["media_id"].append(i)
        rows["mime"].append("image/jpeg")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(1)
        rows["payload"].append(encode_jpeg(img, quality=85))
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "payload": pa.array(rows["payload"], pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def synthesize_gif_media(n: int, seed: int = 42, max_side: int = 20,
                         max_frames: int = 5) -> pa.Table:
    """Deterministic REAL animated-GIF payloads (paletted noise)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "mime", "width", "height",
                            "n_frames", "payload")}
    for i in range(n):
        w = int(rng.integers(6, max_side + 1))
        h = int(rng.integers(6, max_side + 1))
        f = int(rng.integers(1, max_frames + 1))
        colors = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        frames = colors[rng.integers(0, 8, (f, h, w))]
        rows["media_id"].append(i)
        rows["mime"].append("image/gif")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(f)
        rows["payload"].append(encode_gif(frames))
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "payload": pa.array(rows["payload"], pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def synthesize_bmp_media(n: int, seed: int = 42, max_side: int = 24) -> pa.Table:
    """Deterministic REAL 24-bit BMP payloads (gradient + noise RGB)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "mime", "width", "height", "n_frames", "payload")}
    for i in range(n):
        w = int(rng.integers(8, max_side + 1))
        h = int(rng.integers(8, max_side + 1))
        grad = (np.arange(h)[:, None, None] * 8 + np.arange(w)[None, :, None] * 4)
        img = ((grad + rng.integers(0, 64, (h, w, 3))) % 256).astype(np.uint8)
        rows["media_id"].append(i)
        rows["mime"].append("image/bmp")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(1)
        rows["payload"].append(encode_bmp(img))
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "payload": pa.array(rows["payload"], pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def synthesize_wav_media(n: int, seed: int = 42, rate: int = 8000) -> pa.Table:
    """Deterministic REAL PCM-WAV payloads: pure tones at known frequencies
    (so spectral features have closed-form expectations) + mild noise."""
    rng = np.random.default_rng(seed)
    ids, mimes, payloads, tones = [], [], [], []
    for i in range(n):
        f0 = float(rng.integers(200, 1800))
        secs = float(rng.integers(1, 3)) / 2.0
        t = np.arange(int(rate * secs)) / rate
        x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.normal(size=len(t))
        s = np.clip(x * 32767, -32768, 32767).astype(np.int16)
        ids.append(i)
        mimes.append("audio/wav")
        payloads.append(encode_wav(s, rate))
        tones.append(f0)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(mimes, pa.string()),
            "tone_hz": pa.array(tones, pa.float64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def media_pipeline(ds: Dataset, out_h: int = 16, out_w: int = 16, dim: int = 16,
                   batch_size: int = 64, concurrency=2) -> Dataset:
    """decode→resize→embed chained actor-pool stages; small batches because
    payload rows are large (memory-aware rule)."""
    return (
        ds.map_batches(ResizeStage, fn_constructor_args=(out_h, out_w),
                       batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
        .map_batches(EmbedStage, fn_constructor_args=(dim,),
                     batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
    )


# ------------------------------------------------------------------ TIFF
# Real baseline-TIFF codec from the published TIFF 6.0 specification
# (Adobe, 1992): little- and big-endian IFDs, grayscale and RGB uint8,
# Compression=1 (none) and Compression=32773 (PackBits — the spec's
# Section 9 byte-oriented RLE), multi-strip via RowsPerStrip.

_TIFF_TAGS = {"width": 256, "length": 257, "bits": 258, "compression": 259,
              "photometric": 262, "strip_offsets": 273, "spp": 277,
              "rows_per_strip": 278, "strip_counts": 279}


def _packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits (spec section 9 / Apple PackBits): literal runs
    ``(n-1, bytes)`` and replicate runs ``(257-n, byte)``, n <= 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a replicate run of >= 3 (spec: do not break literals for
        # a pair) or >= 2 at the start of a chunk
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal run up to the next >=3 replicate (or 128 bytes)
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3 or (r >= 2 and j + r >= n):
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected and i < len(data):
        h = data[i]
        i += 1
        if h < 128:
            out.extend(data[i:i + h + 1])
            i += h + 1
        elif h > 128:
            out.extend(data[i:i + 1] * (257 - h))
            i += 1
        # h == 128: no-op per spec
    if len(out) != expected:
        raise ValueError("PackBits stream truncated")
    return bytes(out)


def encode_tiff(arr: np.ndarray, compression: int = 32773,
                rows_per_strip: int = 8) -> bytes:
    """(h, w) or (h, w, {1,3}) uint8 -> little-endian baseline TIFF."""
    import struct

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3):
        raise ValueError("TIFF encoder supports 1 or 3 samples/pixel")
    if compression not in (1, 32773):
        raise ValueError("compression must be 1 (none) or 32773 (PackBits)")
    raw = np.ascontiguousarray(a).tobytes()
    stride = w * c
    strips = []
    for r0 in range(0, h, rows_per_strip):
        chunk = raw[r0 * stride: min(r0 + rows_per_strip, h) * stride]
        strips.append(_packbits_encode(chunk) if compression == 32773
                      else chunk)
    n_strips = len(strips)
    # layout: header(8) | strip data | [bits array if c==3] |
    #         [offset/count arrays if n_strips > 2] | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = b""
    bits_off = None
    if c == 3:
        bits_off = pos
        extra += struct.pack("<3H", 8, 8, 8)
        pos += 6
    off_arr_off = cnt_arr_off = None
    if n_strips > 1:
        # a LONG array of count > 1 cannot inline in the 4-byte value
        # slot — write both arrays out-of-line
        off_arr_off = pos
        extra += struct.pack(f"<{n_strips}I", *strip_offsets)
        pos += 4 * n_strips
        cnt_arr_off = pos
        extra += struct.pack(f"<{n_strips}I", *(len(s) for s in strips))
        pos += 4 * n_strips
    ifd_off = pos

    def entry(tag, typ, count, value) -> bytes:
        if typ == 3 and count == 1:  # SHORT inlines left-justified
            return struct.pack("<HHIHH", tag, 3, 1, value, 0)
        return struct.pack("<HHII", tag, typ, count, value)

    t = _TIFF_TAGS
    entries = [
        entry(t["width"], 3, 1, w),
        entry(t["length"], 3, 1, h),
        (entry(t["bits"], 3, 3, bits_off) if c == 3
         else entry(t["bits"], 3, 1, 8)),
        entry(t["compression"], 3, 1, compression),
        entry(t["photometric"], 3, 1, 2 if c == 3 else 1),
        (entry(t["strip_offsets"], 4, n_strips, off_arr_off)
         if n_strips > 1
         else entry(t["strip_offsets"], 4, 1, strip_offsets[0])),
        entry(t["spp"], 3, 1, c),
        entry(t["rows_per_strip"], 3, 1, rows_per_strip),
        (entry(t["strip_counts"], 4, n_strips, cnt_arr_off)
         if n_strips > 1
         else entry(t["strip_counts"], 4, 1, len(strips[0]))),
    ]
    ifd = struct.pack("<H", len(entries))
    ifd += b"".join(entries) + struct.pack("<I", 0)
    head = struct.pack("<2sHI", b"II", 42, ifd_off)
    return head + b"".join(strips) + extra + ifd


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF -> (h, w, c) uint8. Handles II and MM byte order,
    Compression 1/32773, 1 or 3 samples, multi-strip."""
    import struct

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    (n_ent,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags = {}
    for i in range(n_ent):
        tag, typ, count = struct.unpack_from(
            bo + "HHI", payload, ifd_off + 2 + 12 * i)
        voff = ifd_off + 2 + 12 * i + 8
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        if size * count <= 4:
            base = voff
        else:
            (base,) = struct.unpack_from(bo + "I", payload, voff)
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        vals = struct.unpack_from(bo + str(count) + fmt, payload, base)
        tags[tag] = list(vals)
    t = _TIFF_TAGS
    w = tags[t["width"]][0]
    h = tags[t["length"]][0]
    c = tags.get(t["spp"], [1])[0]
    comp = tags.get(t["compression"], [1])[0]
    if comp not in (1, 32773):
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    offsets = tags[t["strip_offsets"]]
    counts = tags[t["strip_counts"]]
    rps = tags.get(t["rows_per_strip"], [h])[0]
    stride = w * c
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - si * rps)
        chunk = payload[off:off + cnt]
        raw.extend(_packbits_decode(chunk, rows * stride)
                   if comp == 32773 else chunk)
    a = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, c)
    return a


def synthesize_tiff_media(n: int, seed: int = 42,
                          max_side: int = 24) -> pa.Table:
    """Deterministic TIFF corpus: gradient+noise frames, alternating
    gray/RGB and none/PackBits compression."""
    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        h = int(rng.integers(6, max_side))
        w = int(rng.integers(6, max_side))
        c = 3 if i % 2 == 0 else 1
        base = (np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5) % 251
        img = (base[:, :, None] + rng.integers(0, 40, size=(h, w, c))
               ).astype(np.uint8)
        comp = 32773 if i % 3 else 1
        payloads.append(encode_tiff(img if c == 3 else img[:, :, 0],
                                    compression=comp))
        ids.append(i)
        ws.append(w)
        hs.append(h)
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "payload": pa.array(payloads, pa.binary()),
                     "width": pa.array(ws, pa.int64()),
                     "height": pa.array(hs, pa.int64()),
                     "format": pa.array(["tiff"] * n)})
