"""Dependency-free baseline JPEG codec (numpy + stdlib only).

Closes the last compressed-media gap in the multimodal layer
(multimodal.py previously raised ``NotImplementedError`` for JPEG):
``jpeg_decode`` handles baseline sequential DCT JFIF streams — DQT /
SOF0 / DHT / (DRI) / SOS parsing, huffman entropy decode with byte
unstuffing and restart markers, dequantize, inverse zigzag, IDCT,
chroma upsampling (4:4:4, 4:2:2 and 4:2:0), YCbCr->RGB. Same spirit
as the PNG/Y4M/WAV triad (png.py / y4m.py / wav.py): a real codec for
the testable subset, honest errors beyond it (progressive JPEG /
arithmetic coding still raise).

``jpeg_encode`` exists to MAKE test data (no Pillow in this
container): baseline 4:4:4 or 4:2:0, quality-scaled Annex-K-style
quantization, simple canonical huffman tables emitted in DHT — the
decoder builds its tables from the stream, so it decodes any
spec-conforming baseline file, not just ours.

Spec: ITU-T T.81 (public). No reference-repo counterpart — the
reference transforms byte payloads opaquely; this is engine-extension
territory for the multimodal pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_encode", "jpeg_decode", "JPEG_SOI"]

JPEG_SOI = b"\xff\xd8"

# ---------------------------------------------------------------- tables

#: Annex K example luminance/chrominance quantization tables
_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    # libjpeg's documented quality scaling of the Annex K tables
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255)


# ----------------------------------------------------------- huffman (enc)

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _enc_tables():
    """Simple valid tables: 12 DC categories at 4 bits, the 162 AC
    (run,size) symbols at 9 bits (161 would fit in 8 but the all-ones
    code of the final length must stay unassigned; 9 bits leaves
    slack). Emitted in DHT, so any conforming decoder reads them."""
    dc_bits = [0] * 16
    dc_bits[3] = 12  # twelve 4-bit codes (16 slots, all-ones unused)
    dc_vals = list(range(12))
    ac_vals = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    ac_bits = [0] * 16
    ac_bits[8] = len(ac_vals)  # 9-bit codes: 512 slots for 162 symbols
    return (dc_bits, dc_vals, _canonical_codes(dc_bits, dc_vals)), (
        ac_bits, ac_vals, _canonical_codes(ac_bits, ac_vals)
    )


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    # JPEG magnitude coding: negatives as (v - 1) & mask
    return v if v >= 0 else (v - 1) & ((1 << size) - 1)


def _encode_block(
    w: _BitWriter, coef: np.ndarray, pred: int,
    dc: dict, ac: dict,
) -> int:
    zz = coef.flatten()[_ZIGZAG]
    dc_val = int(zz[0])
    diff = dc_val - pred
    size = _category(diff)
    code, ln = dc[size]
    w.write(code, ln)
    if size:
        w.write(_mag_bits(diff, size), size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac[0xF0]  # ZRL
            w.write(c, l)
            run -= 16
        size = _category(v)
        c, l = ac[(run << 4) | size]
        w.write(c, l)
        w.write(_mag_bits(v, size), size)
        run = 0
    if last_nz < 63:
        c, l = ac[0x00]  # EOB
        w.write(c, l)
    return dc_val


def _block_split(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded to 8-multiples by edge replication -> blocks in
    raster order, shape (nbh, nbw, 8, 8)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)


def jpeg_encode(
    img: np.ndarray, *, quality: int = 85, subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """uint8 image (H, W) grayscale or (H, W, 3) RGB -> baseline JFIF
    bytes. ``subsampling``: '4:4:4', '4:2:2' or '4:2:0' (color only).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (resilience markers real capture pipelines produce — and the
    decoder's restart resync path needs conforming input to test
    against)."""
    if img.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4', '4:2:2' or '4:2:0'")
    if restart_interval < 0:
        raise ValueError("restart_interval must be >= 0")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:2:2":
            pw = -(-w // 2) * 2
            cbp = np.pad(cb, ((0, 0), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, 0), (0, pw - w)), mode="edge")
            cb = cbp.reshape(h, pw // 2, 2).mean(axis=2)
            cr = crp.reshape(h, pw // 2, 2).mean(axis=2)
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    qts = [_scaled_qt(_QT_LUMA, quality)]
    if not gray:
        qts.append(_scaled_qt(_QT_CHROMA, quality))
    (dc_bits, dc_vals, dc_codes), (ac_bits, ac_vals, ac_codes) = _enc_tables()

    out = bytearray(JPEG_SOI)
    # APP0 / JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for i, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i])
        out += bytes(int(v) for v in qt.flatten()[_ZIGZAG])
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else min(1, len(qts) - 1)])
    for cls, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([cls << 4])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00])  # same DC/AC table ids for all
    out += b"\x00\x3f\x00"

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mcu_x, n_mcu_y = -(-w // mcu_w), -(-h // mcu_h)
    blocks = []
    for ci, plane in enumerate(planes):
        qt = qts[0] if ci == 0 else qts[min(1, len(qts) - 1)]
        bl = _block_split(plane)
        coefs = np.round(
            np.einsum("ij,abjk,lk->abil", _C, bl, _C) / qt
        ).astype(np.int64)
        blocks.append(coefs)

    wtr = _BitWriter()
    preds = [0] * nc
    mcu_i = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # close the entropy segment (1-pad to a byte), emit
                # RSTn (n cycles 0..7), reset DC predictors
                out += wtr.flush()
                wtr = _BitWriter()
                out += bytes(
                    [0xFF, 0xD0 + ((mcu_i // restart_interval) - 1) % 8]
                )
                preds = [0] * nc
            mcu_i += 1
            for ci in range(nc):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        r = my * sv + by
                        c = mx * sh + bx
                        nbh, nbw = blocks[ci].shape[:2]
                        coef = blocks[ci][min(r, nbh - 1), min(c, nbw - 1)]
                        preds[ci] = _encode_block(
                            wtr, coef, preds[ci], dc_codes, ac_codes
                        )
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------- huffman (dec)

class _HuffTable:
    """Canonical decode table: (length-indexed min/max codes + symbol
    offsets), the classic T.81 DECODE procedure."""

    def __init__(self, bits: list[int], vals: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, rdr: "_BitReader") -> int:
        code = rdr.bit()
        length = 1
        while length <= 16:
            if code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
            code = (code << 1) | rdr.bit()
            length += 1
        raise ValueError("invalid huffman code in entropy stream")


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # past a marker: the spec says feed 1-bits (the decoder
            # terminates the block via EOB before consuming garbage)
            self.acc = (self.acc << 8) | 0xFF
            self.n += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume the pending RSTn marker and realign to a byte."""
        self.acc = 0
        self.n = 0
        if self.marker is None:
            # marker not yet reached through the bit accumulator: it
            # sits next in the byte stream
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
            self.pos += 1
            self.marker = self.data[self.pos]
            self.pos += 1
        else:
            self.pos += 1  # step past the marker byte
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RSTn, found FF{self.marker:02X}")
        self.marker = None


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array, (H, W) for grayscale or
    (H, W, 3) RGB. Progressive (SOF2) and arithmetic-coded streams
    raise ValueError naming the unsupported marker; truncated or
    corrupt streams raise ValueError too (never a raw IndexError from
    the bit reader — media-pipeline callers catch ValueError per
    record, the same contract as the PNG codec)."""
    try:
        return _jpeg_decode(data)
    except (IndexError, struct.error, KeyError) as e:
        raise ValueError(
            f"truncated or corrupt JPEG stream ({type(e).__name__}: {e})"
        ) from e


def _jpeg_decode(data: bytes) -> np.ndarray:
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = None
    scan_comp_ids: list[tuple[int, int, int]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(seg):
                prec, tid = seg[o] >> 4, seg[o] & 0xF
                o += 1
                n = 64 * (2 if prec else 1)
                raw = seg[o:o + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec else
                    np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                qt = np.zeros(64, dtype=np.int64)
                qt[_ZIGZAG] = vals
                qts[tid] = qt.reshape(8, 8)
                o += n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, sampb, qid = seg[6 + 3 * i:9 + 3 * i]
                comps.append({
                    "id": cid, "sh": sampb >> 4, "sv": sampb & 0xF,
                    "qid": qid,
                })
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker FF{marker:02X}"
                f") — only baseline sequential DCT is implemented"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            o = 0
            while o < len(seg):
                cls, tid = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1:o + 17])
                nv = sum(bits)
                vals = seg[o + 17:o + 17 + nv]
                huff[(cls, tid)] = _HuffTable(bits, vals)
                o += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comp_ids = []
            for i in range(ns):
                cid, tbl = seg[1 + 2 * i:3 + 2 * i]
                scan_comp_ids.append((cid, tbl >> 4, tbl & 0xF))
            scan_pos = pos + seg_len
            break
        pos += seg_len
    if scan_pos is None or not comps:
        raise ValueError("no SOS/SOF0 found — truncated or non-baseline JPEG")

    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mcu_x, n_mcu_y = -(-w // mcu_w), -(-h // mcu_h)
    for c in comps:
        c["bw"] = n_mcu_x * c["sh"]
        c["bh"] = n_mcu_y * c["sv"]
        c["coef"] = np.zeros((c["bh"], c["bw"], 8, 8), dtype=np.int64)
    by_id = {c["id"]: c for c in comps}
    rdr = _BitReader(data, scan_pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rdr.sync_restart()
                preds = {c["id"]: 0 for c in comps}
            for cid, dc_id, ac_id in scan_comp_ids:
                c = by_id[cid]
                dc_t, ac_t = huff[(0, dc_id)], huff[(1, ac_id)]
                for by in range(c["sv"]):
                    for bx in range(c["sh"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc_t.decode(rdr)
                        diff = _extend(rdr.bits(size), size) if size else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(rdr)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(rdr.bits(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.int64)
                        blk[_ZIGZAG] = zz
                        c["coef"][
                            my * c["sv"] + by, mx * c["sh"] + bx
                        ] = blk.reshape(8, 8)
            mcu_count += 1

    planes = []
    for c in comps:
        qt = qts[c["qid"]]
        deq = c["coef"] * qt
        spatial = np.einsum("ji,abjk,kl->abil", _C, deq.astype(np.float64), _C)
        nbh, nbw = spatial.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8) + 128.0
        # upsample to full resolution by pixel replication
        ry, rx = vmax // c["sv"], hmax // c["sh"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
