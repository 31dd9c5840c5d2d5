"""Baseline JPEG codec — pure Python/numpy, no image library.

Completes the multimodal decode story (VERDICT r9/r10 optional task):
``image/jpeg`` joins the advertised MEDIA_TYPES with a REAL decode
instead of the documented exclusion. Scope is the baseline profile
(SOF0, 8-bit, Huffman), which is what training-corpus JPEGs
overwhelmingly are:

* decoder: marker walk (APPn/COM skipped), DQT, SOF0, DHT, DRI, SOS;
  entropy decode with byte-stuffing and restart markers; dequantize,
  zigzag, numpy IDCT per 8x8 block; component placement for any
  sampling factors up to 2 (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0);
  nearest-neighbor chroma upsample; YCbCr -> RGB. Progressive (SOF2),
  12-bit, and arithmetic-coded streams raise ValueError LOUDLY.
* encoder (fixture/test side): grayscale or YCbCr 4:4:4 / 4:2:0,
  forward DCT + quantize + canonical-Huffman entropy code. Tables are
  written into DQT/DHT, so the decoder is exercised through the same
  table-parsing path a foreign file would take.

Exactness contract used by the multimodal fixtures: with the flat
quant table (all 16) and a grayscale image built from constant 8x8
tiles of EVEN levels, every block is DC-only and quantization is
lossless — encode->decode reproduces the raster bit-exactly, so the
DuckDB oracle can reproduce decoded features from doc_id arithmetic
(same dyadic-exactness trick as the PPM/PNG/WAV fixtures).

Reference parity: the reference engine treats media payloads as
opaque blobs (no decoder of its own); this module exists for the
training-data-pipeline surface (SURVEY multimodal family), built from
the public JPEG spec (ITU-T T.81) structure only.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[i] = raster index of the i-th scanned
# coefficient (derived, not transcribed: walk the anti-diagonals)
def _zigzag_order() -> list[int]:
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()  # up-right on even diagonals
        order.extend(r * 8 + c for r, c in diag)
    return order


ZIGZAG = _zigzag_order()

# orthonormal 8x8 DCT-II basis: block = C.T @ coef @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

# flat quantization table: DC step 16 makes constant even-level tiles
# quantize EXACTLY (see module docstring); a legal baseline table
QUANT_FLAT16 = [16] * 64

# canonical Huffman tables (ITU-T T.81 Annex K layout: 16 length
# counts + value list). The decoder never assumes these — it reads
# whatever DHT carries — so encoder/decoder agreement only requires
# the table to be a valid canonical prefix code covering the emitted
# symbols, which the constructor asserts and the noise round-trip
# test exercises end-to-end.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))


def _ac_vals(first_cols: list[int]) -> list[int]:
    """The AC value lists share one shape: a format-defined prefix,
    then every remaining (run,size) symbol in column-major order."""
    vals = list(first_cols)
    seen = set(first_cols)
    for size in range(1, 11):
        for run in range(16):
            s = (run << 4) | size
            if s not in seen:
                vals.append(s)
                seen.add(s)
    return vals


# prefix = the spec tables' leading (most frequent) symbols; the tail
# enumeration guarantees EVERY (run 0-15, size 1-10) symbol plus EOB
# (0x00) and ZRL (0xF0) has a code, so any baseline block encodes
_AC_PREFIX = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
]
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = _ac_vals(_AC_PREFIX)
assert sum(AC_BITS) == len(AC_VALS) == 162


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction."""
    assert sum(bits) == len(vals), "huffman bits/values mismatch"
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
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
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(tile: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = _C @ (tile - 128.0) @ _C.T
    return np.round(coef / q).astype(np.int32)


def _encode_component_block(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    c, ln = dc_codes[size]
    w.write(c, ln)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        w.write(c, ln)
        w.write(bits, size)
        run = 0
    if last_nz != 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return dc


def encode_jpeg_baseline(
    width: int,
    height: int,
    raster: bytes,
    gray: bool = True,
    quant: list[int] | None = None,
    subsample_420: bool = False,
    restart_interval: int = 0,
    luma_samp: tuple[int, int] | None = None,
) -> bytes:
    """Minimal REAL baseline encoder. ``raster``: w*h gray bytes when
    ``gray`` else w*h*3 RGB. Color uses YCbCr, 4:4:4 by default,
    4:2:0 with ``subsample_420``; ``luma_samp`` sets the luma (h, v)
    factors directly — (2,1) = 4:2:2, (1,2) = 4:4:0, (2,2) = 4:2:0 —
    so every chroma layout the decoder claims is producible (width /
    height must be divisible by the respective factor).
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers
    every that many MCUs (exercises the decoder's restart path)."""
    q = np.array(quant or QUANT_FLAT16, dtype=np.float64)[
        np.argsort(ZIGZAG)
    ].reshape(8, 8)
    qzz = [int((quant or QUANT_FLAT16)[i]) for i in range(64)]

    if gray:
        planes = [
            np.frombuffer(raster, np.uint8).reshape(height, width).astype(
                np.float64
            )
        ]
        samp = [(1, 1)]
    else:
        rgb = (
            np.frombuffer(raster, np.uint8)
            .reshape(height, width, 3)
            .astype(np.float64)
        )
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        hs, vs = luma_samp or ((2, 2) if subsample_420 else (1, 1))
        if (hs, vs) != (1, 1):
            assert width % hs == 0 and height % vs == 0
            cb = cb.reshape(height // vs, vs, width // hs, hs).mean(axis=(1, 3))
            cr = cr.reshape(height // vs, vs, width // hs, hs).mean(axis=(1, 3))
        samp = [(hs, vs), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(qzz))  # DQT table 0, 8-bit
    # SOF0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for i, (hs, vs) in enumerate(samp):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    seg(0xC0, sof)
    # DHT: DC/AC tables 0 (luma); tables 1 (chroma) when color
    dht = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    dht += bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    if ncomp > 1:
        dht += bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        dht += bytes([0x11]) + bytes(AC_BITS) + bytes(AC_VALS)
    seg(0xC4, dht)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_luma = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_chroma = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # pad planes to full MCU coverage by edge replication
    padded = []
    for p, (hs, vs) in zip(planes, samp):
        ph = mcuy * 8 * vs
        pw = mcux * 8 * hs
        pp = np.empty((ph, pw))
        ph0, pw0 = min(p.shape[0], ph), min(p.shape[1], pw)
        pp[:ph0, :pw0] = p[:ph0, :pw0]
        pp[ph0:, :pw0] = pp[ph0 - 1 : ph0, :pw0]
        pp[:, pw0:] = pp[:, pw0 - 1 : pw0]
        padded.append(pp)
    preds = [0] * ncomp
    zz_idx = np.array(ZIGZAG)
    n_mcu, rst_n = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # byte-align (1-fill), emit RSTn, reset DC predictors
                w.flush()
                w.out.extend(bytes([0xFF, 0xD0 + rst_n]))
                rst_n = (rst_n + 1) % 8
                preds = [0] * ncomp
            n_mcu += 1
            for ci, (p, (hs, vs)) in enumerate(zip(padded, samp)):
                dc_codes = dc_luma if ci == 0 else dc_chroma
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        tile = p[y0 : y0 + 8, x0 : x0 + 8]
                        zz = _fdct_quant(tile, q).ravel()[zz_idx]
                        preds[ci] = _encode_component_block(
                            w, zz, preds[ci], dc_codes, ac
                        )
    w.flush()
    out.extend(w.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---- decoder -----------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 de-stuffing; stops at
    any marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.marker is not None:
                # past a marker: feed zero bits (spec: decoder pads)
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                continue
            if self.pos >= len(d):
                # truncated payload: fail loudly with the decoder's
                # uniform contract, not IndexError (ADVICE r12)
                raise ValueError("truncated JPEG entropy segment")
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(d):
                    raise ValueError("truncated JPEG entropy segment")
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt  # RSTn — consumed by caller
                    continue
                else:
                    self.marker = nxt  # EOI / next segment
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary.

        ValueError (not assert) on an unexpected/absent marker: a
        corrupt stream whose entropy segment hits a restart boundary
        with a non-RST marker must fail the decoder's uniform contract
        — and the check must survive ``python -O`` (ADVICE r12)."""
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(
                f"expected RSTn marker at restart boundary, got "
                f"{'none' if self.marker is None else hex(self.marker)}"
            )
        self.pos += 2
        self.marker = None
        self.acc = 0
        self.n = 0


class _HuffTable:
    """Canonical decode via (length -> [min_code, symbols]) walk."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_base = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.min_code[ln] = code
                self.val_base[ln] = k
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.take(1)
            if self.max_code[ln] >= code >= self.min_code[ln]:
                return self.vals[self.val_base[ln] + code - self.min_code[ln]]
        raise ValueError("invalid huffman code in entropy segment")


def _extend(v: int, size: int) -> int:
    """Amplitude-bits -> signed value (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_baseline(payload: bytes) -> dict:
    """Decode a baseline JPEG to {width, height, raster (RGB bytes)}.

    Raises ValueError (loudly, with the marker name) for progressive /
    arithmetic / 12-bit streams — out of the advertised baseline
    scope, mirroring the PNG decoder's 16-bit/interlace guards."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    while True:
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG (no SOS reached)")
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("EOI before scan data")
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        end = pos + seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64)
                tbl[np.array(ZIGZAG)] = np.frombuffer(
                    body[b + 1 : b + 65], np.uint8
                )
                quant[tq] = tbl.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                b += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline-ish)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x} — "
                "progressive/arithmetic/hierarchical) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            pos = end
            return _decode_scan(
                payload, pos, frame, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        # all other segments (APPn, COM) are skipped
        pos = end


def _decode_scan(
    payload, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval
) -> dict:
    w, h = frame["w"], frame["h"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"])) for c in comps
    ]
    br = _BitReader(payload, pos)
    preds = [0] * len(comps)
    zz_idx = np.array(ZIGZAG)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                if br.marker is None:
                    br._fill()  # reach the pending marker
                br.restart()
                preds = [0] * len(comps)
            n_mcu += 1
            for ci, (comp, td, ta) in enumerate(scan):
                dct, act = huff_dc[td], huff_ac[ta]
                q = quant[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64)
                        size = dct.decode(br)
                        preds[ci] += _extend(br.take(size), size)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.take(s), s)
                            k += 1
                        coef = np.zeros(64)
                        coef[zz_idx] = zz
                        tile = (
                            _C.T @ (coef.reshape(8, 8) * q) @ _C + 128.0
                        )
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = tile
    # crop to image size at full resolution per component, then
    # upsample subsampled components (nearest neighbor)
    full = []
    for p, c in zip(planes, comps):
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0
            )
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        rgb = np.repeat(gray[..., None], 3, axis=2)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(
            np.round(np.stack([r, g, b], axis=2)), 0, 255
        ).astype(np.uint8)
    else:
        raise ValueError(f"{len(full)}-component scan unsupported")
    return {"width": w, "height": h, "raster": rgb.tobytes()}
