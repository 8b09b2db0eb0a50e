"""Pure-python/numpy baseline JPEG codec — no PIL/libjpeg in this
container, so the engine carries its own ITU-T T.81 subset:

- :func:`parse_dims` — marker scan for (width, height, ncomponents);
  works on ANY JPEG flavor (baseline, extended, progressive).
- :class:`JPEGDecoder` — full baseline sequential decode (SOF0/SOF1):
  DQT/DHT/DRI/SOS parsing, Huffman entropy decode with byte
  unstuffing and restart markers, dequantization, zigzag, exact 8×8
  float IDCT, chroma upsampling (sample replication) and JFIF
  YCbCr→RGB. Progressive (SOF2) and arithmetic coding raise a clean
  ``NotImplementedError`` (the ops/multimodal.py refusal discipline).
- :func:`encode_gray_dc` — a tiny DC-only grayscale baseline encoder
  used to synthesize deterministic fixture JPEGs with EXACTLY known
  pixel values (an 8×8 block whose only nonzero coefficient is DC=8k
  under an all-ones quant table decodes to the constant 128+k), so
  the decoder is ground-truth-testable without any external library.

Entropy decoding is a per-bit Python loop — correct, not fast; at
scale the actor-pool stage swaps in libjpeg the moment it is
importable (ops/multimodal.py ``_load_codec``), and the fixture
images are DC-only so tests stay quick.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> position in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
_BASELINE_SOF = {0xC0, 0xC1}


def _idct_basis() -> np.ndarray:
    """A[u, x] = c(u)/2 · cos((2x+1)uπ/16); IDCT(F) = Aᵀ·F·A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = (c / 2) * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_IDCT_A = _idct_basis()


def parse_dims(data: bytes) -> tuple[int, int, int]:
    """-> (width, height, ncomponents) from the first SOF marker of
    any JPEG flavor. Raises ValueError on a non-JPEG payload."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if marker in _SOF_MARKERS:
            _, h, w, nc = struct.unpack(
                ">BHHB", data[pos + 4:pos + 10])
            return w, h, nc
        pos += 2 + seglen
    raise ValueError("no SOF marker found")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at (and reports) real markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None:
                # feed 1-bits past a marker (spec: decoder pads)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            if self.pos >= len(self.data):
                self.marker = 0xD9
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] \
                    if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_marker(self) -> int:
        """Consume the pending RST marker; realigns to byte start."""
        self.bitbuf = 0
        self.nbits = 0
        m = self.marker
        self.marker = None
        # skip the 2 marker bytes in the raw stream
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and \
                    self.data[self.pos + 1] == m:
                self.pos += 2
                return m
            self.pos += 1
        return m if m is not None else 0xD9


class _HuffTable:
    def __init__(self, bits: list[int], vals: bytes):
        # (length, code) -> value, built per Annex C
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            v = self.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


class JPEGDecoder:
    """Baseline sequential JPEG → (width, height, samples bytes):
    1 byte/pixel grayscale or 3 bytes/pixel interleaved RGB."""

    def decode(self, data: bytes
               ) -> tuple[int, int, bytes]:
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], _HuffTable] = {}
        restart = 0
        frame = None
        pos = 2
        n = len(data)
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                raise ValueError("marker expected")
            marker = data[pos + 1]
            if 0xD0 <= marker <= 0xD7 or marker in (0x01,):
                pos += 2
                continue
            if marker == 0xD9:
                break
            seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
            seg = data[pos + 4:pos + 2 + seglen]
            if marker == 0xDB:                         # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 15
                    i += 1
                    if pq:
                        t = np.frombuffer(seg[i:i + 128],
                                          dtype=">u2").astype(np.int64)
                        i += 128
                    else:
                        t = np.frombuffer(seg[i:i + 64],
                                          dtype=np.uint8) \
                            .astype(np.int64)
                        i += 64
                    qt[tq] = t
            elif marker == 0xC4:                       # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 15
                    bits = list(seg[i + 1:i + 17])
                    cnt = sum(bits)
                    vals = seg[i + 17:i + 17 + cnt]
                    huff[(tc, th)] = _HuffTable(bits, vals)
                    i += 17 + cnt
            elif marker == 0xDD:                       # DRI
                restart = struct.unpack(">H", seg[:2])[0]
            elif marker in _SOF_MARKERS:
                if marker not in _BASELINE_SOF:
                    raise NotImplementedError(
                        f"SOF{marker - 0xC0}: only baseline "
                        "sequential JPEG is supported natively")
                prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8:
                    raise NotImplementedError("only 8-bit JPEG")
                comps = []
                for c in range(nc):
                    cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                    comps.append({"id": cid, "h": hv >> 4,
                                  "v": hv & 15, "tq": tq})
                frame = (w, h, comps)
            elif marker == 0xDA:                       # SOS
                if frame is None:
                    raise ValueError("SOS before SOF")
                ns = seg[0]
                scan = {}
                for c in range(ns):
                    cid, tt = seg[1 + 2 * c:3 + 2 * c]
                    scan[cid] = (tt >> 4, tt & 15)
                return self._scan(data, pos + 2 + seglen, frame,
                                  scan, qt, huff, restart)
            pos += 2 + seglen
        raise ValueError("no SOS marker found")

    def _scan(self, data, pos, frame, scan, qt, huff, restart):
        w, h, comps = frame
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        planes = []
        for c in comps:
            planes.append(np.zeros((mcuy * c["v"] * 8,
                                    mcux * c["h"] * 8),
                                   dtype=np.float64))
        br = _BitReader(data, pos)
        pred = {c["id"]: 0 for c in comps}
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_count and \
                        mcu_count % restart == 0:
                    br.align_past_marker()
                    pred = {c["id"]: 0 for c in comps}
                for ci, c in enumerate(comps):
                    dc_t, ac_t = scan[c["id"]]
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = self._block(
                                br, huff[(0, dc_t)],
                                huff[(1, ac_t)], q, pred, c["id"])
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
                mcu_count += 1
        out = []
        for ci, c in enumerate(comps):
            p = planes[ci]
            # sample-replication upsample to full MCU-grid resolution
            ry, rx = vmax // c["v"], hmax // c["h"]
            if ry > 1 or rx > 1:
                p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
            out.append(p[:h, :w])
        if len(out) == 1:
            gray = np.clip(np.round(out[0] + 128), 0, 255) \
                .astype(np.uint8)
            return w, h, gray.tobytes()
        y, cb, cr = out[0] + 128, out[1], out[2]
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
        rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return w, h, rgb.tobytes()

    def _block(self, br, dc_tab, ac_tab, q, pred, cid) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        t = dc_tab.decode(br)
        diff = _extend(br.receive(t), t)
        pred[cid] += diff
        zz[0] = pred[cid]
        k = 1
        while k < 64:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break                                  # EOB
            k += r
            zz[k] = _extend(br.receive(s), s)
            k += 1
        coeff = np.zeros(64, dtype=np.float64)
        coeff[ZIGZAG] = zz * q
        f = coeff.reshape(8, 8)
        return _IDCT_A.T @ f @ _IDCT_A


# --- fixture encoder ---------------------------------------------------------

# Annex K.3 standard luminance Huffman tables (public spec constants)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = bytes(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _encode_codes(bits: list[int], vals: bytes) -> dict[int, tuple]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)      # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def encode_gray_dc(width: int, height: int,
                   block_k: np.ndarray) -> bytes:
    """DC-only grayscale baseline JPEG: block (i, j) decodes to the
    EXACT constant value ``128 + block_k[i, j]`` (all-ones quant
    table; DC coefficient 8·k has IDCT k on every sample). ``block_k``
    must be (ceil(h/8), ceil(w/8)) of ints in [-128, 127]."""
    by, bx = -(-height // 8), -(-width // 8)
    assert block_k.shape == (by, bx), block_k.shape
    dc_codes = _encode_codes(_DC_BITS, _DC_VALS)
    ac_codes = _encode_codes(_AC_BITS, _AC_VALS)
    seg = bytearray()
    seg += b"\xff\xd8"                                 # SOI
    seg += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    seg += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    seg += b"\x01\x11\x00"                             # comp 1, 1x1, tq0
    dht = bytes(_DC_BITS) + _DC_VALS
    seg += b"\xff\xc4" + struct.pack(">H", 3 + len(dht)) + b"\x00" + dht
    aht = bytes(_AC_BITS) + _AC_VALS
    seg += b"\xff\xc4" + struct.pack(">H", 3 + len(aht)) + b"\x10" + aht
    seg += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00" \
        + b"\x00\x3f\x00"                              # SOS
    bw = _BitWriter()
    pred = 0
    for i in range(by):
        for j in range(bx):
            dc = int(block_k[i, j]) * 8
            diff = dc - pred
            pred = dc
            mag = abs(diff)
            t = mag.bit_length()
            length, code = dc_codes[t]
            bw.put(code, length)
            if t:
                bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
            al, ac = ac_codes[0x00]                    # EOB
            bw.put(ac, al)
    return bytes(seg) + bw.flush() + b"\xff\xd9"
