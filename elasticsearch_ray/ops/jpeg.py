"""Baseline JPEG codec — from the PUBLIC ITU-T T.81 (1992) specification.

Encoder and decoder for baseline sequential DCT, Huffman-coded JPEG:
grayscale and 4:4:4 YCbCr color (JFIF). This upgrades the last
compressed-IMAGE stub in :mod:`ops.multimodal` to a real codec, like the
PNG (stdlib zlib) and GIF (from-scratch LZW) codecs before it.

Spec pieces implemented (T.81 section / annex):
- 8×8 forward/inverse DCT-II, orthonormal matrix form (A.3.3) — all
  blocks transformed in ONE einsum, no per-block Python math;
- quantization with the Annex K.1 example tables, scaled by the
  ubiquitous libjpeg quality formula (public IJG source);
- zigzag coefficient order (A.3.6) generated from the diagonal rule;
- DC prediction + magnitude/size coding (F.1.2.1), AC run/size RLE with
  EOB and ZRL (F.1.2.2);
- canonical Huffman tables from (BITS, HUFFVAL) (C.2) — the Annex K
  example tables ship in the DHT segments, and the DECODER always
  rebuilds its codes from the stream's own DHT, so the bitstream is
  self-describing;
- byte stuffing (0xFF → 0xFF 0x00, B.1.1.5) and marker framing (B.2):
  SOI / APP0-JFIF / DQT / SOF0 / DHT / SOS / EOI.

NOT implemented (raise ``NotImplementedError``, documented): progressive
(SOF2), arithmetic coding, chroma subsampling (sampling factors > 1),
12-bit precision, restart intervals.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants


def _zigzag() -> np.ndarray:
    """Zigzag scan order (T.81 A.3.6): raster index of each scan slot,
    generated from the diagonal traversal rule."""
    coords = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda p: (p[0] + p[1],
                       p[0] if (p[0] + p[1]) % 2 else -p[0]))
    return np.array([r * 8 + c for r, c in coords], dtype=np.int64)


ZIGZAG = _zigzag()
INV_ZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 example quantization tables
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# Annex K.3 example Huffman specs: (BITS[1..16], HUFFVAL). The decoder
# rebuilds from the stream's DHT, so these only pick the code lengths.
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))


def _ac_huffval(first: list[int]) -> list[int]:
    """The Annex K AC value lists share a tail structure: after the
    table-specific prefix, the remaining (run,size) symbols in
    ascending order."""
    allsym = [0x00, 0xF0] + [(r << 4) | s
                             for r in range(16) for s in range(1, 11)]
    rest = [s for s in sorted(allsym) if s not in first]
    return first + rest


_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUM_FIRST = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROM_FIRST = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1]

_AC_LUM = (_AC_LUM_BITS, _ac_huffval(_AC_LUM_FIRST))
_AC_CHROM = (_AC_CHROM_BITS, _ac_huffval(_AC_CHROM_FIRST))

_C = np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                * (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
                for x in range(8)] for u in range(8)])


# --------------------------------------------------------- huffman core


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(BITS, HUFFVAL) → {symbol: (code, length)} (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing (B.1.1.5)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker inside scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v


def _decode_tree(bits: list[int], vals: list[int]) -> dict:
    """{(length, code): symbol} for the reader."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _read_symbol(reader: _BitReader, tree: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = tree.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC value coding (F.1.2.1): (size, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------- encode


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((q * scale + 50) / 100), 1, 255)


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to 8-multiples by edge replication → (nblocks, 8, 8) float."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane.astype(np.float64), ((0, ph), (0, pw)), mode="edge")
    hh, ww = p.shape
    b = (p.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
         .reshape(-1, 8, 8))
    return b, hh // 8, ww // 8


def _encode_plane(writer: _BitWriter, plane: np.ndarray, qt: np.ndarray,
                  dc_codes: dict, ac_codes: dict) -> None:
    blocks, _bh, _bw = _blocks(plane)
    d = np.einsum("ux,nxy,vy->nuv", _C, blocks - 128.0, _C)
    qz = np.round(d.reshape(-1, 64) / qt.reshape(1, 64)).astype(np.int64)
    zz = qz[:, ZIGZAG]
    prev_dc = 0
    for row in zz:
        size, bits = _magnitude(int(row[0]) - prev_dc)
        prev_dc = int(row[0])
        code, ln = dc_codes[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
        run = 0
        nz = np.flatnonzero(row[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_codes[(run << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB
            writer.write(code, ln)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(arr: np.ndarray, quality: int = 75) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JFIF bytes."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    color = a.ndim == 3
    if color and a.shape[2] != 3:
        raise ValueError("encode_jpeg takes gray or RGB")
    h, w = a.shape[:2]
    qy = _quality_scale(QT_LUM, quality)
    qc = _quality_scale(QT_CHROM, quality)
    if color:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    else:
        planes = [a.astype(np.float64)]

    out = bytearray(b"\xff\xd8")                      # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in
                                         qy.reshape(64)[ZIGZAG]))
    if color:
        out += _seg(0xDB, bytes([1]) + bytes(int(v) for v in
                                             qc.reshape(64)[ZIGZAG]))
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)                            # SOF0 baseline

    def dht(cls, tid, spec):
        bits, vals = spec
        return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                    + bytes(vals))

    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    if color:
        out += dht(0, 1, _DC_CHROM) + dht(1, 1, _AC_CHROM)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    writer = _BitWriter()
    dcl, acl = _canonical_codes(*_DC_LUM), _canonical_codes(*_AC_LUM)
    dcc, acc = _canonical_codes(*_DC_CHROM), _canonical_codes(*_AC_CHROM)
    # 4:4:4 non-interleaved-equivalent: with all sampling factors 1 the
    # MCU interleave is per-block round-robin across components
    planes_q = [(planes[0], qy, dcl, acl)]
    if color:
        planes_q += [(planes[1], qc, dcc, acc),
                     (planes[2], qc, dcc, acc)]
    if color:
        # interleaved MCUs: one 8×8 block per component per MCU
        blocked = []
        for p, qt, dcod, acod in planes_q:
            blk, bh, bw = _blocks(p)
            d = np.einsum("ux,nxy,vy->nuv", _C, blk - 128.0, _C)
            qz = np.round(d.reshape(-1, 64)
                          / qt.reshape(1, 64)).astype(np.int64)
            blocked.append((qz[:, ZIGZAG], dcod, acod))
        prev = [0, 0, 0]
        nmcu = blocked[0][0].shape[0]
        for m in range(nmcu):
            for ci, (zz, dcod, acod) in enumerate(blocked):
                row = zz[m]
                _emit_block(writer, row, prev, ci, dcod, acod)
    else:
        _encode_plane(writer, planes[0], qy, dcl, acl)
    out += writer.flush()
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


def _emit_block(writer, row, prev, ci, dc_codes, ac_codes):
    size, bits = _magnitude(int(row[0]) - prev[ci])
    prev[ci] = int(row[0])
    code, ln = dc_codes[size]
    writer.write(code, ln)
    if size:
        writer.write(bits, size)
    run = 0
    nz = np.flatnonzero(row[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(bits, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        writer.write(code, ln)


# --------------------------------------------------------------- decode


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w) or (h, w, 3) uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple, dict] = {}
    frame = None
    while pos < len(payload):
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (marker cut short)")
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker framing")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (segment length cut short)")
        ln = struct.unpack(">H", payload[pos:pos + 2])[0]
        if pos + ln > len(payload):
            raise ValueError("truncated JPEG (segment body cut short)")
        body = payload[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                prec_id = b[0]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit DQT not supported")
                qts[prec_id & 0xF] = np.array(list(b[1:65]),
                                              np.float64)[INV_ZIGZAG]
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                cls_id = b[0]
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17:17 + n])
                hts[(cls_id >> 4, cls_id & 0xF)] = _decode_tree(bits, vals)
                b = b[17 + n:]
        elif marker == 0xC0:  # SOF0
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling not supported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG decodes")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            sel = []
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                sel.append((cid, tabs >> 4, tabs & 0xF))
            return _decode_scan(payload[pos:], frame, sel, qts, hts)
    raise ValueError("no SOS scan in JPEG")


def _decode_scan(data: bytes, frame, sel, qts, hts) -> np.ndarray:
    if frame is None:
        raise ValueError("SOS before SOF0")
    h, w, comps = frame
    bh, bw = -(-h // 8), -(-w // 8)
    reader = _BitReader(data)
    ncomp = len(sel)
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(ncomp)]
    prev = [0] * ncomp
    comp_q = {cid: tq for cid, tq in comps}
    for by in range(bh):
        for bx in range(bw):
            for ci, (cid, dct, act) in enumerate(sel):
                dc_tree = hts[(0, dct)]
                ac_tree = hts[(1, act)]
                zz = np.zeros(64, np.int64)
                size = _read_symbol(reader, dc_tree)
                diff = _extend(reader.receive(size), size)
                prev[ci] += diff
                zz[0] = prev[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(reader, ac_tree)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient overrun")
                    zz[k] = _extend(reader.receive(size), size)
                    k += 1
                qt = qts[comp_q[cid]]
                block = (zz[INV_ZIGZAG].astype(np.float64)
                         * qt).reshape(8, 8)
                pix = _C.T @ block @ _C + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = pix
    planes = [p[:h, :w] for p in planes]
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)
