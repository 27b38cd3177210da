"""Independent baseline-JPEG encoder used by tests (forward path only)."""
import struct

import numpy as np

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_u = np.arange(8)[:, None]
_x = np.arange(8)[None, :]
B = 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16)
B[0] *= 1 / np.sqrt(2)

# uniform-length canonical Huffman tables (valid, not Annex K):
DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0]
AC_VALS = list(range(256))


def canonical(bits, vals):
    out, code, idx = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[idx]] = (code, ln)
            code += 1
            idx += 1
        code <<= 1
    return out

DC_CODES = canonical(DC_BITS, DC_VALS)
AC_CODES = canonical(AC_BITS, AC_VALS)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s
        return bytes(self.out)


def _cat(v):
    return int(abs(v)).bit_length()


def _encode_block(w, block, pred, q):
    coef = B @ (block - 128.0) @ B.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / q).astype(int)
    diff = int(zz[0]) - pred
    size = _cat(diff)
    c, ln = DC_CODES[size]
    w.write(c, ln)
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        w.write(bits, size)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = AC_CODES[0xF0]
            w.write(c, ln)
            run -= 16
        size = _cat(v)
        c, ln = AC_CODES[(run << 4) | size]
        w.write(c, ln)
        bits = v if v > 0 else v + (1 << size) - 1
        w.write(bits, size)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        c, ln = AC_CODES[0x00]
        w.write(c, ln)
    return int(zz[0])


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def jpeg_bytes(img, subsample="444", quant=1, restart_interval=0):
    h, w_, c = img.shape
    if c == 3:
        R, G, Bc = (img[:, :, i].astype(np.float64) for i in range(3))
        Y = 0.299 * R + 0.587 * G + 0.114 * Bc
        Cb = -0.168736 * R - 0.331264 * G + 0.5 * Bc + 128.0
        Cr = 0.5 * R - 0.418688 * G - 0.081312 * Bc + 128.0
        if subsample == "420":
            comps = [(Y, 2, 2), (Cb, 1, 1), (Cr, 1, 1)]
        else:
            comps = [(Y, 1, 1), (Cb, 1, 1), (Cr, 1, 1)]
    else:
        comps = [(img[:, :, 0].astype(np.float64), 1, 1)]
    hmax = max(cc[1] for cc in comps)
    vmax = max(cc[2] for cc in comps)
    mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for plane, ch, cv in comps:
        if (ch, cv) != (hmax, vmax):  # box-downsample chroma
            fy, fx = vmax // cv, hmax // ch
            py = -plane.shape[0] % fy
            px = -plane.shape[1] % fx
            p2 = np.pad(plane, ((0, py), (0, px)), mode="edge")
            plane = p2.reshape(
                p2.shape[0] // fy, fy, p2.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        th, tw = mcuy * cv * 8, mcux * ch * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        planes.append(plane)
    q = float(quant)
    wtr = BitWriter()
    preds = [0] * len(comps)
    ent_parts = []
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                ent_parts.append(wtr.flush())
                ent_parts.append(
                    bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                )
                wtr = BitWriter()
                preds = [0] * len(comps)
            for ci, (plane, ch, cv) in enumerate(zip(planes, [c[1] for c in comps], [c[2] for c in comps])):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[ci] = _encode_block(
                            wtr, plane[y0:y0 + 8, x0:x0 + 8], preds[ci], q
                        )
            mcu_count += 1
    ent_parts.append(wtr.flush())
    entropy = b"".join(ent_parts)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([int(quant)] * 64))
    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w_, nc)
    for i, (_, ch, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
