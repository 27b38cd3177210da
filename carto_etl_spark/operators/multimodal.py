"""Multimodal columns: images/audio/video as opaque binary columns with typed
metadata, processed by Arrow-batched pandas functions over ``mapInPandas``.

Decoding is REAL for the formats the standard library + numpy can parse —
uncompressed BMP and binary PPM images (struct-level header parsing, per-
channel mean features, nearest-neighbor resize), PNG (stdlib ``zlib``
inflate + full scanline unfiltering, 8-bit gray/RGB/RGBA/palette), GIF
(stdlib LZW decode incl. interlace, first frame), baseline JPEG (marker
walk, canonical Huffman, dequant + IDCT, 4:4:4/4:2:0, restart markers,
YCbCr->RGB), and PCM WAV audio (stdlib ``wave``, RMS/duration features).
Formats needing media libraries absent from this container
(progressive JPEG/MP4/...) raise
NotImplementedError at executor time, decode through the pluggable
``decoder`` hook / PIL when present, or a deterministic hash-derived fake
(``fake=True``) exercises the full Spark plumbing — schema, batching,
partitioning — which is the part that has to be right at 100 TB.

Scale notes: binary payloads ride in their own column so column pruning keeps
metadata-only queries off the bytes; `maxRecordsPerBatch` bounds Arrow batch
memory; `binaryFile` reads stream file contents without driver involvement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, kind: str = "image") -> DataFrame:
    """Distributed binary ingest via the ``binaryFile`` source -> MEDIA_SCHEMA."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.col("path"),
            F.regexp_extract("path", r"\.(\w+)$", 1).alias("format"),
            F.col("length").alias("bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real image decoder: dimensions and an
    8-dim feature derived from the content digest."""
    digest = hashlib.sha256(payload or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feats = [b / 255.0 for b in digest[2:10]]
    return width, height, 3, feats


# -- real stdlib decoders ----------------------------------------------------

def _decode_bmp(data: bytes):
    """Uncompressed 24/32-bit BMP -> (width, height, channels, HxWxC uint8
    array).  Pure struct parsing; rows are 4-byte aligned, bottom-up unless
    height is negative."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    width = struct.unpack_from("<i", data, 18)[0]
    raw_height = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    height = abs(raw_height)
    channels = bpp // 8
    stride = (width * channels + 3) // 4 * 4
    rows = []
    for r in range(height):
        start = pixel_offset + r * stride
        row = np.frombuffer(data, dtype=np.uint8, count=width * channels,
                            offset=start).reshape(width, channels)
        rows.append(row)
    img = np.stack(rows)
    if raw_height > 0:
        img = img[::-1]  # bottom-up storage -> top-down array
    return width, height, channels, img


def _decode_ppm(data: bytes):
    """Binary PPM (P6, maxval<=255) -> (width, height, 3, HxWx3 uint8)."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <w> <h> <maxval> then one whitespace byte, then raw RGB;
    # '#' comments allowed between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
            continue
        tok = b""
        while pos < len(data) and not data[pos:pos + 1].isspace():
            tok += data[pos:pos + 1]
            pos += 1
        tokens.append(int(tok))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    img = np.frombuffer(
        data, dtype=np.uint8, count=width * height * 3, offset=pos
    ).reshape(height, width, 3)
    return width, height, 3, img


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(data: bytes):
    """Real PNG decode with stdlib ``zlib`` + numpy only (no PIL): 8-bit
    grayscale / RGB / RGBA / palette / gray+alpha, non-interlaced, all five
    scanline filters.  Sub/Up unfilter vectorize through uint8 wraparound
    ``np.add.accumulate``; Average/Paeth carry a left-neighbor dependency and
    run per pixel-group.  16-bit depth and Adam7 interlacing raise honestly.

    Returns (width, height, channels, HxWxC uint8)."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, [], None
    width = height = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        length, ctag = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + payload + CRC
        if ctag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
        elif ctag == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctag == b"IDAT":
            idat.append(chunk)
        elif ctag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            recon = line
        elif ftype == 1:  # Sub: cumulative along x per channel lane
            recon = np.add.accumulate(
                line.reshape(width, nch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ftype == 2:  # Up
            recon = line + prev
        elif ftype in (3, 4):  # Average / Paeth: left-dependency, per group
            recon = np.zeros(stride, dtype=np.uint8)
            for x in range(width):
                s = x * nch
                left = recon[s - nch:s] if x else np.zeros(nch, np.uint8)
                up = prev[s:s + nch]
                if ftype == 3:
                    pred = ((left.astype(np.int16) + up) // 2).astype(np.uint8)
                else:
                    ul = (
                        prev[s - nch:s] if x else np.zeros(nch, np.uint8)
                    ).astype(np.int16)
                    a, b = left.astype(np.int16), up.astype(np.int16)
                    p = a + b - ul
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, ul)
                    ).astype(np.uint8)
                recon[s:s + nch] = line[s:s + nch] + pred
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[r] = recon
        prev = recon
    img = out.reshape(height, width, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
        nch = 3
    return width, height, nch, img


def _decode_gif(data: bytes):
    """Real GIF decode with the standard library only: header/LSD parsing,
    palette handling, and the GIF-variant LZW decompressor (variable code
    width, clear/EOI codes).  First frame only; interlaced frames are
    de-interlaced.  Returns (width, height, 3, HxWx3 uint8).

    The LZW inner loop is per-code Python — appropriate for thumbnails and
    test fixtures; route large GIF corpora through the ``decoder`` hook with
    a native library.  (GIF87a/GIF89a, public W3C/CompuServe spec.)"""
    import struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF frame has no palette")
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            stream = b"".join(chunks)
            # --- GIF-LZW decode (LSB-first bit packing) ---
            clear = 1 << min_code_size
            eoi = clear + 1
            code_size = min_code_size + 1
            dict_base = [bytes([i]) for i in range(clear)] + [b"", b""]
            table = list(dict_base)
            out = bytearray()
            acc = nbits = 0
            prev = None
            for byte in stream:
                acc |= byte << nbits
                nbits += 8
                while nbits >= code_size:
                    code = acc & ((1 << code_size) - 1)
                    acc >>= code_size
                    nbits -= code_size
                    if code == clear:
                        table = list(dict_base)
                        code_size = min_code_size + 1
                        prev = None
                        continue
                    if code == eoi:
                        prev = "done"
                        break
                    if prev is None or prev == "done":
                        entry = table[code]
                    elif code < len(table):
                        entry = table[code]
                        table.append(table[prev] + entry[:1])
                    else:  # the KwKwK case
                        entry = table[prev] + table[prev][:1]
                        table.append(entry)
                    out += entry
                    prev = code
                    if len(table) == (1 << code_size) and code_size < 12:
                        code_size += 1
                if prev == "done":
                    break
            idx = np.frombuffer(bytes(out[: iw * ih]), np.uint8).reshape(ih, iw)
            if iflags & 0x40:  # Adam-less GIF interlace: 4 passes
                deinterlaced = np.zeros_like(idx)
                rows = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                for src_r, dst_r in enumerate(rows):
                    deinterlaced[dst_r] = idx[src_r]
                idx = deinterlaced
            img = pal[idx]
            return iw, ih, 3, img
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def _decode_jpeg(data: bytes):
    """Baseline JPEG (ITU-T T.81) decode with stdlib + numpy only: marker
    walk, DQT/DHT table build (general canonical Huffman, any valid tables),
    interleaved-MCU entropy decode with byte-stuffing and restart markers,
    dequant + de-zigzag + separable float IDCT, component assembly for
    4:4:4 / 4:2:2 / 4:2:0 sampling, JFIF YCbCr->RGB.  Progressive (SOF2),
    12-bit, and arithmetic-coded streams raise honestly.

    Returns (width, height, channels, HxWxC uint8)."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")

    ZIGZAG = np.array([
        0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ])
    # separable IDCT basis: B[u, x] = C(u)/2 * cos((2x+1)u*pi/16)
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    B = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    B[0] *= 1 / np.sqrt(2)

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode tables
    frame = None
    restart_interval = 0
    pos = 2

    def build_huffman(bits, vals):
        # canonical JPEG code assignment (T.81 C.2): returns per-length
        # {first_code, first_index} for the fast range decode
        codes, code, idx = {}, 0, 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                codes[ln] = (code, idx)
                code += n
                idx += n
            code <<= 1
        return {"codes": codes, "bits": bits, "vals": vals}

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, s + 1).astype(
                    np.float64
                )
                s += 65
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1:s + 17])
                n = sum(bits)
                vals = list(seg[s + 17:s + 17 + n])
                huff[(tc, th)] = build_huffman(bits, vals)
                s += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scomp.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    else:
        raise ValueError("JPEG truncated before SOS")
    if frame is None:
        raise ValueError("JPEG missing SOF")

    # de-stuffed entropy bytes up to the next non-RST marker; remember RST cuts
    ent = bytearray()
    rst_byte_positions = []
    p = pos
    while p < len(data) - 1:
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1]
            if nxt == 0x00:
                ent.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                rst_byte_positions.append(len(ent))
                p += 2
                continue
            break  # EOI or next segment
        ent.append(b)
        p += 1
    ent = bytes(ent)

    class BitReader:
        def __init__(self, buf):
            self.buf = buf
            self.bytepos = 0
            self.bitpos = 0

        def read_bit(self):
            byte = self.buf[self.bytepos]
            bit = (byte >> (7 - self.bitpos)) & 1
            self.bitpos += 1
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            return bit

        def read_bits(self, n):
            v = 0
            for _ in range(n):
                v = (v << 1) | self.read_bit()
            return v

        def align_to(self, byte_offset):
            self.bytepos = byte_offset
            self.bitpos = 0

    def huff_decode(r, table):
        code, ln = 0, 0
        codes = table["codes"]
        while ln < 16:
            code = (code << 1) | r.read_bit()
            ln += 1
            entry = codes.get(ln)
            if entry is not None:
                first_code, first_idx = entry
                if code - first_code < table["bits"][ln - 1]:
                    return table["vals"][first_idx + (code - first_code)]
        raise ValueError("invalid Huffman code")

    def extend(v, size):
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    sc_by_id = {s["id"]: s for s in scomp}
    reader = BitReader(ent)
    preds = [0] * len(comps)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if rst_idx < len(rst_byte_positions):
                    reader.align_to(rst_byte_positions[rst_idx])
                    rst_idx += 1
                    preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                sel = sc_by_id[comp["id"]]
                dct_t = huff[(0, sel["dc"])]
                act_t = huff[(1, sel["ac"])]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64)
                        size = huff_decode(reader, dct_t)
                        diff = (
                            extend(reader.read_bits(size), size) if size else 0
                        )
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = huff_decode(reader, act_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = extend(reader.read_bits(size), size)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = zz * q
                        spatial = B.T @ block.reshape(8, 8) @ B
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial + 128.0
            mcu_count += 1

    h, w = frame["h"], frame["w"]
    out_planes = []
    for ci, comp in enumerate(comps):
        plane = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        img = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, img[:, :, None]
    Y, Cb, Cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = Y + 1.402 * Cr
    g = Y - 0.344136 * Cb - 0.714136 * Cr
    b = Y + 1.772 * Cb
    img = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )
    return w, h, 3, img


def _try_pil_decode(payload: bytes):
    """Attempt a PIL decode AT EXECUTOR TIME (covers JPEG/PNG/WebP/... when
    Pillow is installed on the cluster); returns None when PIL is absent so
    the caller can fall through to the honest raise.  The import lives here,
    not module-level, so driver environments without Pillow can still ship
    this operator to executors that have it."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None
    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as im:
        if im.mode not in ("RGB", "RGBA", "L"):
            im = im.convert("RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    return width, height, channels, arr


def _real_decode(payload: bytes, decoder=None):
    """Dispatch on magic bytes; built-in decoders first, then — for unknown
    formats OR streams a built-in cannot handle (truncated file, progressive
    JPEG, 16-bit PNG) — the injected ``decoder`` hook, then PIL if
    importable, then the original error / honest raise.

    ``decoder``: optional ``payload -> (width, height, channels, HxWxC
    uint8 array) | None`` callable (None = decline).  This is the pluggable
    seam for formats and variants beyond the built-ins: pass a
    PIL/cv2/ffmpeg-backed callable in a real deployment, or a deterministic
    fake in tests — the Spark plumbing (Arrow batches, schema, partitioning)
    is identical either way."""
    builtin = None
    if payload[:2] == b"BM":
        builtin = _decode_bmp
    elif payload[:2] == b"P6":
        builtin = _decode_ppm
    elif payload[:8] == PNG_MAGIC:
        builtin = _decode_png
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        builtin = _decode_gif
    elif payload[:2] == b"\xff\xd8":
        builtin = _decode_jpeg
    builtin_err = None
    if builtin is not None:
        try:
            return builtin(payload)
        except Exception as exc:  # fall through to hook/PIL for variants
            builtin_err = exc
    if decoder is not None:
        out = decoder(payload)
        if out is not None:
            return out
    out = _try_pil_decode(payload)
    if out is not None:
        return out
    if builtin_err is not None:
        raise builtin_err
    raise NotImplementedError(
        "only BMP / PPM / PNG / GIF / baseline-JPEG decode is available without "
        "PIL/cv2 (not in this container); install Pillow on the executors, "
        "pass decoder=<callable> for other formats, or fake=True to "
        "exercise the pipeline"
    )


def decode_image_features(
    df: DataFrame,
    *,
    fake: bool = False,
    decoder=None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Image decode / feature-extract over ``mapInPandas`` (Arrow-batched).

    Real decode for BMP/PPM (stdlib+numpy): dimensions, channel count, and
    per-channel mean intensities as the feature vector.  Compressed formats
    go through the pluggable ``decoder`` hook, then PIL when the executors
    have it; otherwise they raise NotImplementedError *at executor time*
    (the way real import failures surface).  ``fake=True`` selects the
    deterministic stand-in for every row (plumbing-only mode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content or b"")
                if fake:
                    w, h, c, feats = _fake_decode(payload)
                else:
                    w, h, c, img = _real_decode(payload, decoder)
                    feats = [
                        float(m) / 255.0
                        for m in img.reshape(-1, c).mean(axis=0)
                    ]
                rows.append((media_id, w, h, c, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "feature"]
            )

    return df.select("media_id", "content").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),  # re-encoded binary PPM
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, *, decoder=None
) -> DataFrame:
    """Nearest-neighbor resize of BMP/PPM payloads, re-encoded as binary PPM
    (the stdlib-writable interchange format).  The resample is index
    arithmetic on the decoded array — numpy fancy indexing inside the Arrow
    batch, no Python-per-pixel loop.  ``decoder``: same pluggable hook as
    ``decode_image_features`` for compressed inputs."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                w0, h0, c, img = _real_decode(bytes(content or b""), decoder)
                if c > 3:
                    img = img[:, :, :3]  # drop alpha for PPM
                elif c == 1:
                    img = np.repeat(img, 3, axis=2)
                ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                resized = img[ys][:, xs]
                payload = (
                    b"P6\n%d %d\n255\n" % (width, height)
                    + resized.astype(np.uint8).tobytes()
                )
                rows.append((media_id, width, height, payload))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "content"]
            )

    return df.select("media_id", "content").mapInPandas(run, schema=RESIZED_SCHEMA)


_synth_wav_udf = None


def synth_square_wav_expr(n_frames, sample_rate: int = 8000,
                          amplitude: int = 16384):
    """Deterministic PCM WAV synthesizer (mono 16-bit alternating-sign square
    wave) as an Arrow-batched pandas UDF over a frame-count column.  A
    constant-|amplitude| square wave has exactly rms = amplitude/32768 — a
    dyadic rational, bit-identical in any IEEE engine — which makes the
    decode operator oracle-checkable end to end: the oracle predicts every
    output field from the synthesis arithmetic alone."""
    global _synth_wav_udf
    if _synth_wav_udf is None:
        import io
        import struct
        import wave

        def synth(frames):
            def one(n):
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(
                        b"".join(
                            struct.pack("<h", amplitude if i % 2 == 0 else -amplitude)
                            for i in range(int(n))
                        )
                    )
                return buf.getvalue()

            return frames.map(one)

        _synth_wav_udf = F.pandas_udf(synth, "binary")
    return _synth_wav_udf(n_frames)


_synth_png_udf = None


def synth_gradient_png_expr(media_id, width: int = 16, height: int = 8):
    """Deterministic RGB PNG synthesizer as an Arrow-batched pandas UDF over
    an id column: pixel (r, x) of channel c is ``(id*7 + c*31 + r*width + x)
    % 256``, and the scanline filter type cycles ``id % 5`` over all five
    PNG filters (None/Sub/Up/Average/Paeth), so every unfilter path sits
    under the oracle.  Because r*width+x sweeps 0..width*height-1 consecutively,
    each channel's decoded mean is an integer-arithmetic sum an oracle can
    recompute exactly — putting the REAL PNG decode chain (chunk walk, zlib
    inflate, unfiltering) under the value-level correctness gate."""
    global _synth_png_udf
    if _synth_png_udf is None:
        import struct
        import zlib

        import numpy as np

        def encode(img, ftype):
            h, w, c = img.shape
            stride = w * c
            flat = img.reshape(h, stride)
            prev = np.zeros(stride, dtype=np.uint8)
            lines = []
            for r in range(h):
                line = flat[r]
                if ftype == 1:
                    left = np.zeros_like(line)
                    left[c:] = line[:-c]
                    enc = line - left
                elif ftype == 2:
                    enc = line - prev
                elif ftype in (3, 4):
                    # encoding has NO sequential dependency (the left
                    # neighbor is the ORIGINAL pixel, unlike decode): whole
                    # rows vectorize as shifted int16 arrays
                    li = line.astype(np.int16)
                    left = np.zeros_like(li)
                    left[c:] = li[:-c]
                    up = prev.astype(np.int16)
                    if ftype == 3:
                        pred = (left + up) // 2
                    else:
                        ul = np.zeros_like(up)
                        ul[c:] = up[:-c]
                        p = left + up - ul
                        pa, pb, pc = (
                            np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                        )
                        pred = np.where(
                            (pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, ul),
                        )
                    enc = ((li - pred) % 256).astype(np.uint8)
                else:
                    enc = line
                lines.append(bytes([ftype]) + enc.tobytes())
                prev = line
            raw = zlib.compress(b"".join(lines))

            def chunk(tag, payload):
                body = tag + payload
                return (
                    struct.pack(">I", len(payload))
                    + body
                    + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                PNG_MAGIC
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", raw)
                + chunk(b"IEND", b"")
            )

        def synth(ids):
            def one(i):
                i = int(i)
                k = np.arange(width * height, dtype=np.int64).reshape(
                    height, width
                )
                img = np.stack(
                    [(i * 7 + c * 31 + k) % 256 for c in range(3)], axis=2
                ).astype(np.uint8)
                return encode(img, i % 5)

            return ids.map(one)

        _synth_png_udf = F.pandas_udf(synth, "binary")
    return _synth_png_udf(media_id)


_synth_gif_udf = None


def synth_palette_gif_expr(media_id, width: int = 12, height: int = 10):
    """Deterministic palette GIF synthesizer (pandas UDF over an id column):
    16-color palette with channel value ``(j*37 + c*11) % 256`` and pixel k
    indexing ``(id + k) % 16``.  The LZW stream is the literal encoding
    (CLEAR before every pixel code — valid GIF, zero dictionary reliance),
    so a decoded image proves header/palette parsing plus the LZW code loop;
    every channel mean is integer arithmetic an oracle recomputes exactly."""
    global _synth_gif_udf
    if _synth_gif_udf is None:
        import struct

        def one(i):
            i = int(i)
            n_px = width * height
            min_code = 4
            clear, eoi = 16, 17
            cw = 5
            codes = [clear]
            for k in range(n_px):
                codes.append((i + k) % 16)
                codes.append(clear)
            codes.append(eoi)
            acc = nbits = 0
            packed = bytearray()
            for code in codes:
                acc |= code << nbits
                nbits += cw
                while nbits >= 8:
                    packed.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
            if nbits:
                packed.append(acc & 0xFF)
            pal = bytearray()
            for j in range(16):
                for c in range(3):
                    pal.append((j * 37 + c * 11) % 256)
            out = bytearray(b"GIF89a")
            out += struct.pack("<HHBBB", width, height, 0x80 | 3, 0, 0)
            out += pal
            out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
            out += bytes([min_code])
            for s in range(0, len(packed), 255):
                chunk = packed[s:s + 255]
                out += bytes([len(chunk)]) + chunk
            out += b"\x00\x3b"
            return bytes(out)

        def synth(ids):
            return ids.map(one)

        _synth_gif_udf = F.pandas_udf(synth, "binary")
    return _synth_gif_udf(media_id)


_synth_jpeg_udf = None


def synth_const_jpeg_expr(media_id):
    """Deterministic constant-color 8x8 baseline JPEG per id (pandas UDF):
    RGB = (id*7, id*13, id*29) mod 256, unit quantization, one MCU, DC-only
    blocks (a constant block's AC coefficients are zero, so the stream is
    DC + EOB per component with minimal canonical tables).  Because every
    stage of the decode — DC dequant, single-product IDCT, YCbCr->RGB,
    half-even rounding, clipping — is closed-form arithmetic on ONE value
    per channel, a SQL oracle can recompute the decoded means exactly,
    putting the real JPEG decode chain under the value-level gate."""
    global _synth_jpeg_udf
    if _synth_jpeg_udf is None:
        import struct

        def one(i):
            i = int(i)
            R, G, Bv = (i * 7) % 256, (i * 13) % 256, (i * 29) % 256
            Y = 0.299 * R + 0.587 * G + 0.114 * Bv
            Cb = -0.168736 * R - 0.331264 * G + 0.5 * Bv + 128.0
            Cr = 0.5 * R - 0.418688 * G - 0.081312 * Bv + 128.0
            # DC-only "DCT" of a constant block; numpy/python round is
            # half-even, matched by the oracle's round_even
            import numpy as np

            dcs = [int(np.round(8.0 * (v - 128.0))) for v in (Y, Cb, Cr)]

            out = bytearray(b"\xff\xd8")

            def seg(marker, payload):
                return (
                    bytes([0xFF, marker])
                    + struct.pack(">H", len(payload) + 2)
                    + payload
                )

            out += seg(0xDB, bytes([0]) + bytes([1] * 64))
            sof = struct.pack(">BHHB", 8, 8, 8, 3)
            for ci in range(3):
                sof += bytes([ci + 1, 0x11, 0])
            out += seg(0xC0, sof)
            # DC: 12 size categories at code length 5; AC: EOB alone at length 1
            dc_bits = [0, 0, 0, 0, 12] + [0] * 11
            out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
            ac_bits = [1] + [0] * 15
            out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00]))
            sos = bytes([3])
            for ci in range(3):
                sos += bytes([ci + 1, 0x00])
            sos += bytes([0, 63, 0])
            out += seg(0xDA, sos)

            acc, nbits, ent = 0, 0, bytearray()

            def put(code, ln):
                nonlocal acc, nbits
                for b in range(ln - 1, -1, -1):
                    acc = (acc << 1) | ((code >> b) & 1)
                    nbits += 1
                    if nbits == 8:
                        ent.append(acc)
                        if acc == 0xFF:
                            ent.append(0x00)
                        acc = 0
                        nbits = 0

            # canonical codes: DC size s -> code s at length 5; AC EOB -> 0@1
            for dc in dcs:  # predictors start at 0; diff == dc per component
                size = abs(dc).bit_length()
                put(size, 5)
                if size:
                    bits = dc if dc > 0 else dc + (1 << size) - 1
                    put(bits, size)
                put(0, 1)  # EOB
            while nbits:
                put(1, 1)
            out += ent + b"\xff\xd9"
            return bytes(out)

        def synth(ids):
            return ids.map(one)

        _synth_jpeg_udf = F.pandas_udf(synth, "binary")
    return _synth_jpeg_udf(media_id)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.ArrayType(T.FloatType())),  # per channel
    ]
)


def decode_audio_features(df: DataFrame) -> DataFrame:
    """PCM WAV decode via stdlib ``wave``: sample rate, channel count,
    duration, and per-channel RMS (normalized to [0,1] full scale).  Non-WAV
    payloads raise at executor time — compressed audio needs codecs this
    container lacks."""
    import io
    import wave

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                with wave.open(io.BytesIO(bytes(content or b""))) as w:
                    rate, nch = w.getframerate(), w.getnchannels()
                    n = w.getnframes()
                    sampwidth = w.getsampwidth()
                    raw = w.readframes(n)
                if sampwidth == 2:
                    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                    full = 32768.0
                elif sampwidth == 1:
                    samples = (
                        np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                        - 128.0
                    )
                    full = 128.0
                else:
                    raise NotImplementedError(
                        f"{8 * sampwidth}-bit WAV unsupported (8/16-bit only)"
                    )
                per_ch = samples.reshape(-1, nch)
                rms = [
                    float(np.sqrt(np.mean((per_ch[:, i] / full) ** 2)))
                    for i in range(nch)
                ]
                rows.append(
                    (media_id, rate, nch, n, n / rate if rate else 0.0, rms)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame, every_n_seconds: float = 1.0, *, fake: bool = False
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx, ts_seconds)
    rows; the decoded frame payload is stubbed like ``decode_image_features``."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_seconds", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding unavailable; pass fake=True"
                )
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                digest = hashlib.sha256(bytes(content or b"")).digest()
                n_frames = 1 + digest[0] % 8  # fake duration
                for i in range(n_frames):
                    rows.append((media_id, i, i * every_n_seconds))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_seconds"])

    return df.select("media_id", "content").mapInPandas(run, schema=schema)


# -- video frame sampling -----------------------------------------------------

VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        # float32 like IMAGE_FEATURES_SCHEMA: mean intensities carry ~8
        # significant bits of signal; float is the storage convention the
        # oracles mirror with a REAL cast
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def split_mjpeg_frames(payload: bytes) -> list:
    """Frame boundaries of a Motion-JPEG stream (concatenated baseline
    JPEGs — the classic AVI / multipart-HTTP video payload): split on
    SOI..EOI marker pairs.  Sound without decoding: JPEG byte stuffing
    escapes every 0xFF in entropy-coded data as FF 00 (restart markers are
    FF D0-D7), so FF D9 can only terminate a frame."""
    frames = []
    i = 0
    while True:
        soi = payload.find(b"\xff\xd8", i)
        if soi < 0:
            break
        eoi = payload.find(b"\xff\xd9", soi + 2)
        if eoi < 0:
            break
        frames.append(payload[soi : eoi + 2])
        i = eoi + 2
    return frames


def sample_video_frames(
    df: DataFrame,
    every_n: int = 1,
    *,
    fake: bool = False,
    decoder=None,
    max_frames: int | None = None,
) -> DataFrame:
    """Frame-sample video binary columns over ``mapInPandas`` (Arrow
    batches): one output row per SAMPLED frame (indices 0, every_n,
    2*every_n, ...), each carrying dimensions and per-channel mean
    intensities.

    Built-in container: Motion-JPEG.  The stream splits into frames on
    marker boundaries WITHOUT decoding (``split_mjpeg_frames``), and only
    the selected frames are decoded — at a 100 TB video corpus the whole
    point of frame sampling is skipping the decode cost of the frames you
    don't keep, so selection happens before decode, not after.  Individual
    frames route through ``_real_decode``, so the per-frame pluggable
    ``decoder`` hook / PIL fallback apply as for still images.

    Other containers (MP4, WebM — no codec in this container): the
    ``decoder`` hook is consulted with the WHOLE payload and may return an
    iterable of (width, height, channels, HxWxC uint8 array) frames (the
    ffmpeg-backed callable in a real deployment); ``fake=True`` selects a
    deterministic stand-in (digest-derived frame count and features) that
    exercises the full Spark plumbing; otherwise the honest
    NotImplementedError surfaces at executor time."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def frame_rows(media_id, payload):
        if fake:
            digest = hashlib.sha256(payload or b"").digest()
            n_frames = 2 + digest[0] % 7
            for idx in range(0, n_frames, every_n):
                w, h, c, feats = _fake_decode(payload + bytes([idx]))
                yield (media_id, idx, w, h, c, feats)
            return
        decoded = None
        if payload[:2] == b"\xff\xd8":
            frames = split_mjpeg_frames(payload)
            decoded = (
                (idx, _real_decode(frames[idx], decoder))
                for idx in range(0, len(frames), every_n)
            )
        elif decoder is not None:
            all_frames = decoder(payload)
            if all_frames is not None:
                decoded = (
                    (idx, f)
                    for idx, f in enumerate(all_frames)
                    if idx % every_n == 0
                )
        if decoded is None:
            raise NotImplementedError(
                "only Motion-JPEG (concatenated baseline JPEGs) has a "
                "built-in container parser; pass decoder=<callable> for "
                "MP4/WebM or fake=True to exercise the pipeline"
            )
        for idx, (w, h, c, img) in decoded:
            feats = [
                float(m) / 255.0 for m in img.reshape(-1, c).mean(axis=0)
            ]
            yield (media_id, idx, w, h, c, feats)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content or b"")
                for row in frame_rows(media_id, payload):
                    rows.append(row)
                    if max_frames is not None and row[1] // every_n + 1 >= max_frames:
                        break
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "n_channels", "feature",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        run, schema=VIDEO_FRAMES_SCHEMA
    )


# -- perceptual image hashing (dHash) + near-duplicate pairs -----------------
# The image leg of the dedup family: resized crops, re-encodes and minor
# edits keep byte hashes apart but perceptual hashes close.  dHash (the
# difference hash: compare horizontally adjacent pixels of a small
# grayscale downscale) is the standard cheap one.  The 64 bits are stored
# as TWO 32-bit halves: both engines xor/bit_count BIGINTs without ever
# touching bit 63, which DuckDB's left-shift refuses to produce.

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dh_lo", T.LongType()),
        T.StructField("dh_hi", T.LongType()),
    ]
)

#: dHash sampling grid: 9 columns x 8 rows -> 8x8 = 64 comparisons
DHASH_COLS = 9
DHASH_ROWS = 8


def dhash_grid(width: int, height: int) -> tuple[list[int], list[int]]:
    """Floor-division sample positions (engine-portable: integer math)."""
    xs = [x * width // DHASH_COLS for x in range(DHASH_COLS)]
    ys = [y * height // DHASH_ROWS for y in range(DHASH_ROWS)]
    return xs, ys


def image_dhash(
    df: DataFrame,
    *,
    decoder=None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + dHash over ``mapInPandas`` (Arrow batches): grayscale =
    integer mean of the channels (floor division — exact in any engine),
    sample the 9x8 grid, bit (y, x) = gray[y][x] < gray[y][x+1].  Same
    decoder dispatch as ``decode_image_features`` (stdlib built-ins, then
    the pluggable hook, then PIL)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                w, h, c, img = _real_decode(bytes(content or b""), decoder)
                gray = (
                    img.reshape(h, w, c).astype(np.int64).sum(axis=2) // c
                )
                xs, ys = dhash_grid(w, h)
                lo = hi = 0
                for y in range(DHASH_ROWS):
                    row = gray[ys[y]]
                    for x in range(DHASH_COLS - 1):
                        if row[xs[x]] < row[xs[x + 1]]:
                            idx = y * (DHASH_COLS - 1) + x
                            if idx < 32:
                                lo |= 1 << idx
                            else:
                                hi |= 1 << (idx - 32)
                rows.append((media_id, w, h, lo, hi))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "dh_lo", "dh_hi"]
            )

    return df.select("media_id", "content").mapInPandas(
        run, schema=DHASH_SCHEMA
    )


def image_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 2,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate image pairs from dHash halves: pigeonhole blocking on
    the four 16-bit blocks (any pair within hamming <= 3 shares at least
    one block — the simhash blocking argument), exact hamming on
    candidates.  Shuffle key = (block, value); never all-pairs."""
    if max_hamming > 3:
        raise ValueError("16-bit blocking guarantees recall only to hamming 3")
    mask = F.lit((1 << 16) - 1)
    # materialize the (id, lo, hi) hash table BEFORE the blocking
    # self-join: both join sides reference it, and unmaterialized each
    # side replays the whole upstream — the mapInPandas image decode, the
    # most expensive stage of the pipeline — once per side (the dedup.py
    # _materialize rule).  The checkpoint is 24 bytes/row: sketch-sized at
    # any corpus size, the classic "fingerprints only" staging of guide
    # §8 (decide on small rows, decode heavy bytes once).
    h = hashes.select(
        F.col(id_col).alias("__id"), "dh_lo", "dh_hi"
    ).localCheckpoint(eager=True)
    block_exprs = [
        F.col("dh_lo").bitwiseAND(mask),
        F.shiftrightunsigned("dh_lo", 16).bitwiseAND(mask),
        F.col("dh_hi").bitwiseAND(mask),
        F.shiftrightunsigned("dh_hi", 16).bitwiseAND(mask),
    ]
    blocks = h.select(
        "__id", "dh_lo", "dh_hi",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("blk"), e.alias("key"))
                for i, e in enumerate(block_exprs)
            ])
        ).alias("b"),
    ).select("__id", "dh_lo", "dh_hi", "b.blk", "b.key")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (
                F.bit_count(
                    F.col("a.dh_lo").bitwiseXOR(F.col("b.dh_lo"))
                )
                + F.bit_count(
                    F.col("a.dh_hi").bitwiseXOR(F.col("b.dh_hi"))
                )
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


_synth_noise_ppm_udf = None


def synth_noise_ppm_expr(media_id, width: int = 16, height: int = 8):
    """Deterministic NOISE binary-PPM synthesizer (pandas UDF over an id
    column): channel byte p (p = (y*width + x)*3 + c) of SOURCE id s is the
    first md5 byte of ``"{s}:{p}"`` — genuinely mixed (an affine formula
    mod 256 leaves dHash bits correlated across ids and floods the pair
    join), so distinct images sit at expected pairwise hamming ~32 and the
    ONLY near-pairs are the injected ones.  Ids >= 1_000_000 are
    NEAR-COPIES of id-1_000_000: identical bytes except pixel (0,0)
    channel 0 gets +128 mod 256 — at most one dHash comparison can flip,
    so the copy sits within hamming 1 of its source.  md5 bytes are
    engine-portable: an oracle replays every pixel with its own md5."""
    global _synth_noise_ppm_udf
    if _synth_noise_ppm_udf is None:
        import hashlib

        header = f"P6\n{width} {height}\n255\n".encode()
        npx = width * height * 3

        def synth(ids):
            def one(i):
                i = int(i)
                s = i - 1_000_000 if i >= 1_000_000 else i
                vals = bytearray(
                    hashlib.md5(f"{s}:{p}".encode()).digest()[0]
                    for p in range(npx)
                )
                if i >= 1_000_000:
                    vals[0] = (vals[0] + 128) % 256
                return header + bytes(vals)

            return ids.map(one)

        _synth_noise_ppm_udf = F.pandas_udf(synth, "binary")
    return _synth_noise_ppm_udf(media_id)


# -- perceptual audio fingerprint --------------------------------------------
# The audio leg of the dedup family (text: minhash/simhash; embeddings:
# LSH/SemDeDup; images: dHash): re-encoded or lightly edited clips keep
# byte hashes apart but their ENERGY CONTOUR is stable.  The fingerprint is
# the sign of the energy derivative across 65 fixed time bins — 64 bits in
# the same two-32-bit-halves layout as the image dHash, so
# ``image_near_dup_pairs`` (pigeonhole hamming blocking) works on audio
# hashes unchanged.  Bin energies are INTEGER sums of |sample| — exact in
# any engine, so the whole fingerprint is oracle-reproducible.

AUDIO_FP_BINS = 65  # 64 adjacent-bin comparisons

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("dh_lo", T.LongType()),
        T.StructField("dh_hi", T.LongType()),
    ]
)


def audio_fp_bounds(n: int) -> list[int]:
    """The 66 bin boundaries over ``n`` samples (floor division — integer,
    engine-portable)."""
    return [b * n // AUDIO_FP_BINS for b in range(AUDIO_FP_BINS + 1)]


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """PCM-WAV energy-contour fingerprint over ``mapInPandas``: decode with
    stdlib ``wave`` (mono or first channel of interleaved), integer
    |sample| sums per bin, bit b = energy[b] < energy[b+1]."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                with wave.open(io.BytesIO(bytes(content or b""))) as w:
                    n, ch = w.getnframes(), w.getnchannels()
                    raw = np.frombuffer(
                        w.readframes(n), dtype="<i2"
                    ).reshape(-1, ch)[:, 0]
                e = np.abs(raw.astype(np.int64))
                bounds = audio_fp_bounds(len(e))
                energy = [
                    int(e[bounds[b]:bounds[b + 1]].sum())
                    for b in range(AUDIO_FP_BINS)
                ]
                lo = hi = 0
                for b in range(AUDIO_FP_BINS - 1):
                    if energy[b] < energy[b + 1]:
                        if b < 32:
                            lo |= 1 << b
                        else:
                            hi |= 1 << (b - 32)
                rows.append((media_id, len(e), lo, hi))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "dh_lo", "dh_hi"]
            )

    return df.select("media_id", "content").mapInPandas(
        run, schema=AUDIO_FP_SCHEMA
    )


_synth_noise_wav_udf = None


def synth_noise_wav_expr(media_id, n_frames: int = 200,
                         sample_rate: int = 8000):
    """Deterministic noise-WAV synthesizer (pandas UDF over an id column):
    sample i of SOURCE id s is ``md5_byte("{s}:{i}") * 128 - 16384`` —
    md5-mixed so distinct clips sit at expected fingerprint hamming ~32.
    Ids >= 1_000_000 are NEAR-COPIES of id-1_000_000 with sample 0 pinned
    to 16256 (one bin's energy moves, at most one comparison flips).  Every
    sample value is integer arithmetic an oracle replays with its own
    md5."""
    global _synth_noise_wav_udf
    if _synth_noise_wav_udf is None:
        import hashlib
        import io
        import struct
        import wave

        def synth(ids):
            def one(i):
                i = int(i)
                s = i - 1_000_000 if i >= 1_000_000 else i
                vals = [
                    hashlib.md5(f"{s}:{j}".encode()).digest()[0] * 128 - 16384
                    for j in range(n_frames)
                ]
                if i >= 1_000_000:
                    vals[0] = 16256
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(struct.pack(f"<{n_frames}h", *vals))
                return buf.getvalue()

            return ids.map(one)

        _synth_noise_wav_udf = F.pandas_udf(synth, "binary")
    return _synth_noise_wav_udf(media_id)
