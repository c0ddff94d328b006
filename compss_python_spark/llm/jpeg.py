"""Baseline-sequential JPEG codec — stdlib + numpy only (no PIL/libjpeg).

This closes the last stubbed decode path in the multimodal layer
[ref: reference repo multimodal/image decode — path-level, tree empty]:
PNG and WAV already decode real samples (multimodal.py); this module adds
REAL entropy-coded pixel decode for baseline DCT JPEG (the dominant format
in web-crawl training data) plus a matching encoder used to synthesize
test fixtures whose decoded pixels follow a CLOSED FORM an SQL oracle can
recompute (constant 8×8 blocks: only the DC coefficient survives, so
decode(v) = clamp(round(round(8(v−128)/q00)·q00/8 + 128)) — all integer
arithmetic when q00 divides 8·(v−128) rounding, see jpeg_pixel_stats).

Scope (documented, enforced with loud ValueErrors):
- baseline sequential DCT, 8-bit samples (SOF0);
- grayscale and 3-component color with sampling factors up to 2×2 — i.e.
  4:4:4, 4:2:2 and 4:2:0 (nearest-neighbor chroma upsampling), which
  covers the overwhelming majority of real-world baseline files;
- no progressive (SOF2), no restart intervals, no arithmetic coding,
  no 12-bit — each raises with the reason.

Tables are the public JPEG Annex K luminance set (quantization, DC/AC
Huffman); the encoder references table 0 for every component (legal), the
decoder reads whatever DHT/DQT the file carries.

Rounding contract: quantization and final pixel rounding both use
floor(x + 0.5) — reproducible as FLOOR(x + 0.5) in any SQL engine, which
is what makes the oracle exact (numpy round() would introduce banker's
rounding at .5 boundaries).

Scale note: Huffman bit-decode is an inherently sequential per-payload
Python loop (IDCT and color transform are batched numpy).  The Spark-side
contract (binary column → Arrow batch → mapInPandas) is the production
shape; swapping this pure-Python kernel for a native codec is a per-batch
drop-in that changes no plan.
"""

from __future__ import annotations

import numpy as np

# --- Annex K tables (public JPEG standard) ---------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# BITS (codes per length 1..16) and HUFFVAL, Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal DCT-II matrix scaled to the JPEG FDCT: S = M @ X @ M.T
_M = np.array(
    [
        [
            0.5 * (1.0 / np.sqrt(2.0) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _round_half_up(x):
    """floor(x + 0.5) — the SQL-reproducible rounding both quantization and
    pixel output use (NOT numpy round, which is banker's at .5)."""
    return np.floor(x + 0.5)


# --- canonical Huffman -----------------------------------------------------


def _huff_codes(bits, vals):
    """value -> (code, length) canonical assignment (JPEG C.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits, vals):
    """(code, length) -> value decode map."""
    return {cl: v for v, cl in _huff_codes(bits, vals).items()}


def _category(v: int) -> int:
    """JPEG magnitude category: bits needed for |v| (0 for v == 0)."""
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                # past the end: pad with 1s (legal only as trailing bits;
                # a malformed stream dies on an invalid Huffman code)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed literal 0xFF data byte
                # else: marker reached — leave pos on it, pad with 1s
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
            else:
                self.pos += 1
                self.acc = (self.acc << 8) | b
                self.n += 8

    def take(self, length: int) -> int:
        if length == 0:
            return 0
        if self.n < length:
            self._fill()
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v


def _decode_huff(reader: _BitReader, lookup) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.take(1)
        length += 1
        v = lookup.get((code, length))
        if v is not None:
            return v
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude (JPEG F.2.2.1 EXTEND)."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# --- encoder ---------------------------------------------------------------


def _fdct_quant(block: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    s = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    return _round_half_up(s / qtab).astype(np.int64)


def _encode_block(writer, coeffs_zz, pred_dc, dc_codes, ac_codes):
    diff = int(coeffs_zz[0]) - pred_dc
    s = _category(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coeffs_zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coeffs_zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return int(coeffs_zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(
    arr: np.ndarray, qtab: np.ndarray = QUANT_LUMA, subsampling: str = "444"
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 to a real baseline
    JPEG (Annex K tables, table 0 for every component).  ``subsampling``:
    '444' (default), '422' or '420' (2×2-mean chroma downsample) for color
    input.  Dimensions must be multiples of the MCU size (8 / 16×8 / 16 —
    fixture builder; keeps the closed-form oracle free of partial-block
    edge replication)."""
    if arr.ndim == 2:
        samps = [(1, 1)]
        comps = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(_round_half_up(c), 0, 255) for c in (y, cb, cr))
        if subsampling == "444":
            samps = [(1, 1), (1, 1), (1, 1)]
            comps = [y, cb, cr]
        elif subsampling in ("420", "422"):
            fh, fv = (2, 2) if subsampling == "420" else (2, 1)
            hh, ww = y.shape
            if hh % (8 * fv) or ww % (8 * fh):
                raise ValueError(
                    "encode_jpeg: dimensions must be multiples of the MCU size"
                )

            def down(c):
                return _round_half_up(
                    c.reshape(hh // fv, fv, ww // fh, fh).mean(axis=(1, 3))
                )

            samps = [(fh, fv), (1, 1), (1, 1)]
            comps = [y, down(cb), down(cr)]
        else:
            raise ValueError(f"encode_jpeg: unknown subsampling {subsampling!r}")
    else:
        raise ValueError("encode_jpeg: expected (H,W) or (H,W,3) array")
    h, w = (arr.shape[0], arr.shape[1])
    max_h = max(s[0] for s in samps)
    max_v = max(s[1] for s in samps)
    if h % (8 * max_v) or w % (8 * max_h):
        raise ValueError("encode_jpeg: dimensions must be multiples of 8")

    dc_codes = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    out = bytearray(b"\xff\xd8")  # SOI
    qzz = np.zeros(64, dtype=np.uint8)
    qzz[np.arange(64)] = qtab.flatten()[ZIGZAG]
    out += _seg(0xDB, bytes([0x00]) + qzz.tobytes())  # DQT table 0
    nc = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, (samps[ci][0] << 4) | samps[ci][1], 0])
    out += _seg(0xC0, sof)  # SOF0 baseline
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS),
    )  # DHT DC 0
    out += _seg(
        0xC4,
        bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )  # DHT AC 0
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    writer = _BitWriter()
    preds = [0] * nc
    mcux = w // (8 * max_h)
    mcuy = h // (8 * max_v)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, comp in enumerate(comps):
                fh, fv = samps[ci]
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        block = comp[y0 : y0 + 8, x0 : x0 + 8]
                        zz = _fdct_quant(block, qtab).flatten()[ZIGZAG]
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], dc_codes, ac_codes
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def decode_jpeg_pixels(payload: bytes | None) -> np.ndarray | None:
    """Decode a baseline-sequential JPEG to uint8 pixels: (H, W) for
    grayscale, (H, W, 3) RGB for 3-component 4:4:4 / 4:2:2 / 4:2:0
    (nearest-neighbor chroma upsampling).  Returns None for non-JPEG
    payloads; raises ValueError for JPEG features outside the documented
    baseline scope (progressive, restart intervals, 12-bit, arithmetic
    coding)."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    d = bytes(payload)
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    comps = None  # list of (comp_id, qtab_id)
    h = w = 0
    scan = None
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(d[pos + 2 : pos + 4], "big")
        body = d[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[ZIGZAG] = np.frombuffer(body[bp + 1 : bp + 65], dtype=np.uint8)
                qtabs[tq] = tab.reshape(8, 8)
                bp += 65
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                (dc_luts if tc == 0 else ac_luts)[th] = _huff_lookup(bits, vals)
                bp += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if body[0] != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                ch_, cv_ = samp >> 4, samp & 0x0F
                if ch_ not in (1, 2) or cv_ not in (1, 2):
                    raise ValueError(
                        "jpeg: sampling factors beyond 2x2 unsupported"
                    )
                comps.append((cid, tq, ch_, cv_))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si : 3 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if comps is None or scan is None:
        raise ValueError("jpeg: missing SOF or SOS")

    reader = _BitReader(d, pos)
    # MCU geometry (B.2.3).  A single-component scan is NON-interleaved:
    # the MCU is one block and the sampling factors don't tile it.
    if len(scan) == 1:
        eff = {scan[0][0]: (1, 1)}
        max_h = max_v = 1
    else:
        eff = {cid: (ch_, cv_) for cid, _, ch_, cv_ in comps}
        max_h = max(ch_ for _, _, ch_, _ in comps)
        max_v = max(cv_ for _, _, _, cv_ in comps)
    mcux = (w + 8 * max_h - 1) // (8 * max_h)
    mcuy = (h + 8 * max_v - 1) // (8 * max_v)
    geom = []  # per component: (blocks_per_row, blocks_per_col)
    for cid, _, _, _ in comps:
        ch_, cv_ = eff[cid]
        geom.append((mcux * ch_, mcuy * cv_))
    coeff = [
        np.zeros((bwc * bhc, 64), dtype=np.int64) for bwc, bhc in geom
    ]
    preds = [0] * len(comps)
    comp_tabs = []
    for cs, tdc, tac in scan:
        idx = next(i for i, (cid, *_rest) in enumerate(comps) if cid == cs)
        comp_tabs.append((idx, dc_luts[tdc], ac_luts[tac]))

    def _decode_block(idx, dct, act, bi):
        zz = coeff[idx][bi]
        s = _decode_huff(reader, dct)
        diff = _extend(reader.take(s), s)
        preds[idx] += diff
        zz[0] = preds[idx]
        i = 1
        while i <= 63:
            rs = _decode_huff(reader, act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    i += 16  # ZRL
                    continue
                break  # EOB
            i += r
            if i > 63:
                raise ValueError("jpeg: AC index overflow")
            zz[i] = _extend(reader.take(s), s)
            i += 1

    for my in range(mcuy):
        for mx in range(mcux):
            for idx, dct, act in comp_tabs:
                cid = comps[idx][0]
                ch_, cv_ = eff[cid]
                bwc = geom[idx][0]
                for by in range(cv_):
                    for bx in range(ch_):
                        bi = (my * cv_ + by) * bwc + (mx * ch_ + bx)
                        _decode_block(idx, dct, act, bi)

    # batched dequant + inverse zigzag + IDCT (numpy over all blocks),
    # then nearest-neighbor upsample of subsampled chroma planes
    planes = []
    for (cid, tq, *_rest), zzc, (bwc, bhc) in zip(comps, coeff, geom):
        nb = bwc * bhc
        blocks = np.zeros((nb, 64), dtype=np.float64)
        blocks[:, ZIGZAG] = zzc * qtabs[tq].flatten()[ZIGZAG]
        blocks = blocks.reshape(nb, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _M.T, blocks, _M) + 128.0
        plane = (
            pix.reshape(bhc, bwc, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bhc * 8, bwc * 8)
        )
        ch_, cv_ = eff[cid]
        if ch_ < max_h or cv_ < max_v:
            plane = np.repeat(
                np.repeat(plane, max_v // cv_, axis=0), max_h // ch_, axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(_round_half_up(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(_round_half_up(c), 0, 255) for c in (r, g, b_)], axis=2
    )
    return rgb.astype(np.uint8)
