"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets travel as opaque `binary` columns (or
`media_ref` pointers) with typed metadata structs. Decode /
feature-extract / resize / frame-sample run as Arrow-batched UDFs over
``mapInPandas`` — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested.

Container/header decode is REAL and dependency-free:
``decode_image_header`` struct-parses PNG / JPEG / GIF / BMP headers
(format, width, height) from the payload bytes. PIXEL decode is REAL
for binary Netpbm (P5/P6), 8-bit PNG (``decode_png_pixels``: chunk
walk, stdlib-zlib inflate, all five scanline filters), GIF
(``decode_gif_pixels``: variable-width LZW, palette resolution),
uncompressed 24/32-bit BMP (``decode_bmp_pixels``), and
baseline JPEG (``kernel.jpeg.decode_jpeg_pixels``: huffman entropy
decode, dequant, exact float IDCT, chroma upsampling, BT.601 —
progressive/arithmetic return unsupported). Only LEARNED feature
extraction remains stubbed (it genuinely needs a model):

  * ``decode_stub_mode="fake"`` produces deterministic fake features
    (seeded by the payload digest) so pipelines are testable
    end-to-end;
  * ``decode_stub_mode="raise"`` raises NotImplementedError where a
    real decoder (PIL/ffmpeg/torchaudio) would plug in.

At scale: media rows are orders of magnitude larger than text rows —
keep them in their own table partitioned by (modality, bucket), size
``spark.sql.files.maxPartitionBytes`` down (e.g. 32m) so a scan split
of binaries fits the Python worker, and never shuffle raw payloads
(extract features first, shuffle features).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_ref string, modality string, mime string, width int, height int, "
    "duration_ms int, n_bytes bigint"
)

IMAGE_FEATURES_DDL = (
    "media_ref string, n_bytes bigint, sha256 string, "
    "fmt string, width int, height int, "
    "feat array<float>, status string, error string"
)

_FEAT_DIM = 8


def decode_image_header(data: bytes):
    """(fmt, width, height) from raw image bytes, or None.

    Pure-Python struct parsing of the container headers — no image
    library needed, so it runs in any executor Python:
      * PNG: 8-byte signature, IHDR width/height as big-endian u32
      * JPEG: marker walk to the first SOF0-SOF15 frame header
      * GIF: logical screen descriptor, little-endian u16
      * BMP: BITMAPINFOHEADER, little-endian i32
    """
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return ("png", w, h)
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        i = 2
        n = len(data)
        while i + 9 < n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return ("gif", w, h)
    if len(data) >= 26 and data[:2] == b"BM":
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        return ("bmp", w, abs(h))
    return None


AUDIO_FEATURES_DDL = (
    "media_ref string, n_bytes bigint, sha256 string, fmt string, "
    "channels int, sample_rate int, duration_ms int, status string, "
    "error string"
)


def decode_audio_header(data: bytes):
    """(fmt, channels, sample_rate, duration_ms) from raw audio bytes,
    or None. Pure-Python RIFF/WAVE chunk walk — `fmt ` gives channel
    count / sample rate / byte rate, `data` gives payload size;
    duration_ms = data_size * 1000 // byte_rate (floor: deterministic).
    """
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    channels = sample_rate = byte_rate = data_size = None
    i = 12
    n = len(data)
    while i + 8 <= n:
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= n:
            channels = int.from_bytes(data[i + 10 : i + 12], "little")
            sample_rate = int.from_bytes(data[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(data[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not byte_rate or channels is None or data_size is None:
        return None
    return ("wav", channels, sample_rate, data_size * 1000 // byte_rate)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
) -> DataFrame:
    """binary audio payloads -> container metadata via mapInPandas.

    Real WAV/RIFF header decode (no audio library needed); non-RIFF
    payloads get status='unsupported' rows, never task failures.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_ref": [], "n_bytes": [], "sha256": [], "fmt": [],
                "channels": [], "sample_rate": [], "duration_ms": [],
                "status": [], "error": [],
            }
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                out["media_ref"].append(ref)
                if payload is None:
                    out["n_bytes"].append(0)
                    out["sha256"].append(None)
                    out["fmt"].append(None)
                    out["channels"].append(None)
                    out["sample_rate"].append(None)
                    out["duration_ms"].append(None)
                    out["status"].append("error")
                    out["error"].append("null payload")
                    continue
                data = bytes(payload)
                out["n_bytes"].append(len(data))
                out["sha256"].append(hashlib.sha256(data).hexdigest())
                hdr = decode_audio_header(data)
                if hdr is None:
                    out["fmt"].append(None)
                    out["channels"].append(None)
                    out["sample_rate"].append(None)
                    out["duration_ms"].append(None)
                    out["status"].append("unsupported")
                    out["error"].append("not a RIFF/WAVE container")
                else:
                    out["fmt"].append(hdr[0])
                    out["channels"].append(hdr[1])
                    out["sample_rate"].append(hdr[2])
                    out["duration_ms"].append(hdr[3])
                    out["status"].append("ok")
                    out["error"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=AUDIO_FEATURES_DDL)


def media_manifest(
    docs: "DataFrame",
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> "DataFrame":
    """Manifest of media spans in an interleaved document: one row per
    media span with its offset, ref, and how many text spans precede it
    (the anchor a caption/alt-text joiner or a media fetcher needs).

    Pure array expressions — a map-only operator with no shuffle and no
    Python, so it runs at scan speed on 10^12-row interleaved tables.
    """
    from pyspark.sql import functions as F

    spans = F.col(spans_col)
    media = F.filter(spans, lambda x: x["kind"] == F.lit("media"))
    entries = F.transform(
        media,
        lambda x: F.struct(
            x["offset"].alias("offset"),
            x["media_ref"].alias("media_ref"),
            F.size(
                F.filter(
                    spans,
                    lambda y: (y["kind"] == F.lit("text"))
                    & (y["offset"] < x["offset"]),
                )
            ).cast("int").alias("texts_before"),
        ),
    )
    return (
        docs.select(F.col(id_col), F.explode(entries).alias("m"))
        .select(
            id_col,
            F.col("m.offset").alias("offset"),
            F.col("m.media_ref").alias("media_ref"),
            F.col("m.texts_before").alias("texts_before"),
        )
    )


def _decode_jpeg(data: bytes):
    from ..kernel.jpeg import decode_jpeg_pixels

    return decode_jpeg_pixels(data)


PIXEL_STATS_DDL = (
    "media_ref string, fmt string, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double, status string, "
    "error string"
)


def decode_netpbm(data: bytes):
    """REAL pixel decode for binary Netpbm (P5 gray / P6 RGB).

    Pure Python: header tokens (width, height, maxval; '#' comments
    allowed), then raw samples. Returns (fmt, width, height, channels,
    per-channel means) or None. See :func:`decode_png_pixels` for the
    PNG path; only JPEG pixel decode still needs a real codec library
    and stays stubbed.
    """
    if data[:2] not in (b"P5", b"P6"):
        return None
    channels = 3 if data[:2] == b"P6" else 1
    i = 2
    fields = []
    n = len(data)
    while len(fields) < 3 and i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            j = i
            while j < n and not data[j : j + 1].isspace():
                j += 1
            tok = data[i:j]
            if not tok.isdigit():
                return None
            fields.append(int(tok))
            i = j
    if len(fields) < 3 or i >= n:
        return None
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0:
        return None  # 16-bit samples out of scope
    need = w * h * channels
    pixels = data[i : i + need]
    if len(pixels) < need:
        return None
    sums = [0] * channels
    for c in range(channels):
        sums[c] = sum(pixels[c::channels])
    cnt = w * h
    means = [s / cnt for s in sums]
    return ("ppm" if channels == 3 else "pgm", w, h, channels, means)


def decode_png_pixels(data: bytes):
    """REAL PNG pixel decode — pure Python, stdlib ``zlib`` only.

    Supports the common web subset: 8-bit depth, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. Walks the chunk
    stream, inflates the concatenated IDAT payload, reverses the five
    scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6), and
    returns (fmt, width, height, channels, per-color-channel means) —
    alpha is excluded from the means. Palette (3), 16-bit, and
    interlaced images return None (unsupported), as does any structural
    corruption: callers surface status='unsupported', never a task
    failure.

    At corpus scale the per-byte filter loops are the slow path — swap
    in a numpy scanline unfilter (Up/Average vectorize; Sub/Paeth are
    sequential in x but vectorize over rows) before pointing this at
    billions of images.
    """
    import zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, n = 8, len(data)
    w = h = bit_depth = color_type = interlace = None
    idat = bytearray()
    while i + 8 <= n:
        ln = int.from_bytes(data[i : i + 4], "big")
        ctype = data[i + 4 : i + 8]
        if i + 8 + ln > n:
            return None
        chunk = data[i + 8 : i + 8 + ln]
        if ctype == b"IHDR":
            if ln < 13:
                return None
            w = int.from_bytes(chunk[0:4], "big")
            h = int.from_bytes(chunk[4:8], "big")
            bit_depth, color_type = chunk[8], chunk[9]
            interlace = chunk[12]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        i += 12 + ln  # length + type + data + crc
    if not w or not h or bit_depth != 8 or interlace != 0:
        return None
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        return None
    sums = [0] * channels
    prev = bytearray(stride)
    pos = 0
    for _y in range(h):
        f = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if f == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            return None
        for c in range(channels):
            sums[c] += sum(line[c::channels])
        prev = line
    color_ch = 3 if color_type in (2, 6) else 1
    cnt = w * h
    means = [sums[c] / cnt for c in range(color_ch)]
    return ("png", w, h, channels, means)


def extract_pixel_stats(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
) -> DataFrame:
    """binary image payloads -> real per-channel statistics.

    REAL decode paths: binary Netpbm (P5/P6) and PNG (8-bit gray/RGB/
    +alpha, all five scanline filters, stdlib zlib). Unsupported
    containers get status='unsupported' rows; the Arrow plumbing is
    shared with the other media operators.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_ref": [], "fmt": [], "width": [], "height": [],
                "channels": [], "mean_r": [], "mean_g": [], "mean_b": [],
                "status": [], "error": [],
            }

            def row(ref, fmt=None, w=None, h=None, ch=None, means=None,
                    status="ok", error=None):
                out["media_ref"].append(ref)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                # means carries only COLOR channels (1 for gray, 3 for
                # RGB/RGBA — alpha never contributes a mean)
                m = (means or []) + [None] * 3
                out["mean_r"].append(m[0])
                out["mean_g"].append(m[1] if means and len(means) >= 3 else None)
                out["mean_b"].append(m[2] if means and len(means) >= 3 else None)
                out["status"].append(status)
                out["error"].append(error)

            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                if payload is None:
                    row(ref, status="error", error="null payload")
                    continue
                data = bytes(payload)
                dec = (
                    decode_netpbm(data)
                    or decode_png_pixels(data)
                    or decode_gif_pixels(data)
                    or decode_bmp_pixels(data)
                    or _decode_jpeg(data)
                )
                if dec is None:
                    row(ref, status="unsupported",
                        error="not binary netpbm (P5/P6), 8-bit PNG, GIF, "
                              "24/32-bit BMP, or baseline JPEG")
                else:
                    fmt, w, h, ch, means = dec
                    row(ref, fmt, w, h, ch, means)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=PIXEL_STATS_DDL)


def _fake_decode(payload: bytes):
    """Deterministic stand-in for image decode + feature extraction.

    Features = first bytes of sha256(payload) scaled to [0,1) — stable
    across runs/machines, so tests can pin values.
    """
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:_FEAT_DIM]]


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    decode_stub_mode: str = "fake",
) -> DataFrame:
    """binary payloads -> fixed-dim feature vectors via mapInPandas.

    Real decoders replace `_fake_decode`; everything else (Arrow
    batching, schema, error-as-status rows) is production plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_ref": [], "n_bytes": [], "sha256": [],
                "fmt": [], "width": [], "height": [],
                "feat": [], "status": [], "error": [],
            }
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                out["media_ref"].append(ref)
                if payload is None:
                    out["n_bytes"].append(0)
                    out["sha256"].append(None)
                    out["fmt"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["feat"].append(None)
                    out["status"].append("error")
                    out["error"].append("null payload")
                    continue
                data = bytes(payload)
                out["n_bytes"].append(len(data))
                out["sha256"].append(hashlib.sha256(data).hexdigest())
                hdr = decode_image_header(data)
                out["fmt"].append(hdr[0] if hdr else None)
                out["width"].append(hdr[1] if hdr else None)
                out["height"].append(hdr[2] if hdr else None)
                try:
                    if decode_stub_mode == "raise":
                        raise NotImplementedError(
                            "learned image-feature extraction needs an "
                            "embedding model — not in this container "
                            "(pixel decode itself is real: see "
                            "extract_pixel_stats)"
                        )
                    out["feat"].append(_fake_decode(data))
                    out["status"].append("ok")
                    out["error"].append(None)
                except NotImplementedError as exc:
                    out["feat"].append(None)
                    out["status"].append("unsupported")
                    out["error"].append(str(exc))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_FEATURES_DDL)


def _gif_lzw(data: bytes, min_code: int, max_pixels: int):
    """GIF variable-width LZW decode (LSB-first bit packing) -> color
    indices, or None on corruption. Bounded by max_pixels."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = nbits = pos = 0
    n = len(data)
    table = None
    code_size = 0
    prev = None

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code + 1
        prev = None

    reset()
    while True:
        while nbits < code_size and pos < n:
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        if len(out) > max_pixels:
            return None
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return out


def _gif_first_frame(data: bytes):
    """First image frame of a GIF: (width, height, palette indices,
    palette bytes, interlaced) or None. Local color tables override
    the global one; indices are in STORAGE order (deinterlacing is the
    caller's concern — channel means don't need it, rasters do)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = data[10]
    i = 13
    gct = None
    if packed & 0x80:
        gct_len = 3 * (2 << (packed & 0x07))
        gct = data[i : i + gct_len]
        if len(gct) < gct_len:
            return None
        i += gct_len
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0x3B:  # trailer
            return None
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < n and data[i] != 0:
                i += 1 + data[i]
            i += 1
            continue
        if b != 0x2C:  # not an image descriptor
            return None
        if i + 10 > n:
            return None
        w = int.from_bytes(data[i + 5 : i + 7], "little")
        h = int.from_bytes(data[i + 7 : i + 9], "little")
        ipacked = data[i + 9]
        i += 10
        pal = gct
        if ipacked & 0x80:
            lct_len = 3 * (2 << (ipacked & 0x07))
            pal = data[i : i + lct_len]
            if len(pal) < lct_len:
                return None
            i += lct_len
        if pal is None or w <= 0 or h <= 0 or i >= n:
            return None
        min_code = data[i]
        i += 1
        if not 2 <= min_code <= 11:
            return None
        lzw = bytearray()
        while i < n and data[i] != 0:
            blen = data[i]
            lzw += data[i + 1 : i + 1 + blen]
            i += 1 + blen
        idx = _gif_lzw(bytes(lzw), min_code, w * h)
        if idx is None or len(idx) < w * h:
            return None
        npal = len(pal) // 3
        if any(px >= npal for px in idx[: w * h]):
            return None
        return (w, h, idx[: w * h], pal, bool(ipacked & 0x40))
    return None


def decode_gif_pixels(data: bytes):
    """REAL GIF pixel decode — pure Python (variable-width LZW per the
    GIF89a spec), first image frame only.

    Returns (fmt, width, height, channels=3, [mean_r, mean_g, mean_b])
    over the frame's palette-resolved RGB values, or None. Channel
    means are pixel-ORDER independent, so interlaced frames need no
    deinterlacing; transparency is ignored (the transparent index still
    contributes its palette color — documented, deterministic). Local
    color tables override the global one for the frame.
    """
    frame = _gif_first_frame(data)
    if frame is None:
        return None
    w, h, idx, pal, _interlaced = frame
    sums = [0, 0, 0]
    for px in idx:
        p = px * 3
        sums[0] += pal[p]
        sums[1] += pal[p + 1]
        sums[2] += pal[p + 2]
    cnt = w * h
    return ("gif", w, h, 3, [s / cnt for s in sums])


# GIF interlace passes: (first row, row step) per the GIF89a spec
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_gray(data: bytes):
    """(fmt, width, height, row-major luma raster) for a GIF first
    frame — the perceptual-hash feed. Interlaced frames ARE
    deinterlaced here (a raster, unlike channel means, is
    order-sensitive); palette RGB reduces by the shared integer BT.601
    :func:`_luma`."""
    frame = _gif_first_frame(data)
    if frame is None:
        return None
    w, h, idx, pal, interlaced = frame
    lum_pal = [
        _luma(pal[p * 3], pal[p * 3 + 1], pal[p * 3 + 2])
        for p in range(len(pal) // 3)
    ]
    if not interlaced:
        return ("gif", w, h, [lum_pal[px] for px in idx])
    gray = [0] * (w * h)
    src_row = 0
    for first, step in _GIF_INTERLACE_PASSES:
        for y in range(first, h, step):
            base_s, base_t = src_row * w, y * w
            for x in range(w):
                gray[base_t + x] = lum_pal[idx[base_s + x]]
            src_row += 1
    return ("gif", w, h, gray)


def decode_bmp_pixels(data: bytes):
    """REAL BMP pixel decode — uncompressed 24/32-bit BITMAPINFOHEADER.

    Rows are 4-byte aligned (24-bit) and stored bottom-up (negative
    height = top-down); channel means are row-order independent so both
    orientations share one path. Palette/RLE/16-bit return None.
    """
    if len(data) < 54 or data[:2] != b"BM":
        return None
    pix_off = int.from_bytes(data[10:14], "little")
    dib = int.from_bytes(data[14:18], "little")
    if dib < 40:
        return None
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if w <= 0 or h == 0 or comp != 0 or bpp not in (24, 32):
        return None
    nrows = abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3 if bpp == 24 else w * 4
    need = pix_off + stride * nrows
    if len(data) < need:
        return None
    sums = [0, 0, 0]
    for row in range(nrows):
        base = pix_off + row * stride
        line = data[base : base + w * nbytes]
        # BGR(A) order
        sums[2] += sum(line[0::nbytes])
        sums[1] += sum(line[1::nbytes])
        sums[0] += sum(line[2::nbytes])
    cnt = w * nrows
    return ("bmp", w, nrows, 3, [s / cnt for s in sums])


# -- perceptual image hashing (aHash / dHash) -------------------------------------


def _luma(r: int, g: int, b: int) -> int:
    # integer BT.601 luma, deterministic across platforms
    return (299 * r + 587 * g + 114 * b) // 1000


def decode_gray_raster(data: bytes):
    """(fmt, width, height, gray row-major list 0..255) for every
    container with a real pixel decoder: binary Netpbm (P5/P6), 8-bit
    non-interlaced PNG, uncompressed 24/32-bit BMP, GIF first frame
    (:func:`decode_gif_gray`, deinterlaced), and baseline JPEG
    (``kernel.jpeg.decode_jpeg_gray``). All color paths reduce through
    the SAME integer BT.601 :func:`_luma`, so one image stored in two
    containers lands on identical rasters (lossless formats) or
    IDCT-tolerance-close ones (JPEG) — the property the perceptual
    hashes bank on.
    """
    # Netpbm
    if data[:2] in (b"P5", b"P6"):
        dec = decode_netpbm(data)
        if dec is None:
            return None
        fmt, w, h, ch, _ = dec
        # re-walk the (validated) header to find the sample offset
        i, fields, n = 2, [], len(data)
        while len(fields) < 3 and i < n:
            c = data[i : i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":
                j = data.find(b"\n", i)
                i = n if j < 0 else j + 1
            else:
                j = i
                while j < n and not data[j : j + 1].isspace():
                    j += 1
                fields.append(int(data[i:j]))
                i = j
        i += 1
        px = data[i : i + w * h * ch]
        if ch == 1:
            gray = list(px)
        else:
            gray = [
                _luma(px[p], px[p + 1], px[p + 2])
                for p in range(0, w * h * 3, 3)
            ]
        return (fmt, w, h, gray)
    # BMP (24/32-bit uncompressed; bottom-up or top-down)
    if data[:2] == b"BM" and len(data) >= 54:
        pix_off = int.from_bytes(data[10:14], "little")
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        comp = int.from_bytes(data[30:34], "little")
        if w <= 0 or h == 0 or comp != 0 or bpp not in (24, 32):
            return None
        nrows = abs(h)
        nbytes = bpp // 8
        stride = (w * nbytes + 3) & ~3 if bpp == 24 else w * 4
        if len(data) < pix_off + stride * nrows:
            return None
        rows = []
        for row in range(nrows):
            base = pix_off + row * stride
            line = data[base : base + w * nbytes]
            rows.append([
                _luma(line[p + 2], line[p + 1], line[p])  # BGR(A)
                for p in range(0, w * nbytes, nbytes)
            ])
        if h > 0:  # bottom-up storage -> flip to row-major top-down
            rows.reverse()
        return ("bmp", w, nrows, [g for r in rows for g in r])
    # PNG: same validated unfilter walk as decode_png_pixels, but
    # materializing luma per pixel instead of channel sums
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        import zlib

        i, n = 8, len(data)
        w = h = bit_depth = color_type = interlace = None
        idat = bytearray()
        while i + 8 <= n:
            ln = int.from_bytes(data[i : i + 4], "big")
            ctype = data[i + 4 : i + 8]
            if i + 8 + ln > n:
                return None
            chunk = data[i + 8 : i + 8 + ln]
            if ctype == b"IHDR":
                if ln < 13:
                    return None
                w = int.from_bytes(chunk[0:4], "big")
                h = int.from_bytes(chunk[4:8], "big")
                bit_depth, color_type = chunk[8], chunk[9]
                interlace = chunk[12]
            elif ctype == b"IDAT":
                idat += chunk
            elif ctype == b"IEND":
                break
            i += 12 + ln
        if not w or not h or bit_depth != 8 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if channels is None or not idat:
            return None
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error:
            return None
        stride = w * channels
        if len(raw) != h * (stride + 1):
            return None
        gray = []
        prev = bytearray(stride)
        pos = 0
        for _y in range(h):
            f = raw[pos]
            pos += 1
            line = bytearray(raw[pos : pos + stride])
            pos += stride
            if f == 1:
                for x in range(channels, stride):
                    line[x] = (line[x] + line[x - channels]) & 0xFF
            elif f == 2:
                for x in range(stride):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif f == 3:
                for x in range(stride):
                    a = line[x - channels] if x >= channels else 0
                    line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
            elif f == 4:
                for x in range(stride):
                    a = line[x - channels] if x >= channels else 0
                    b = prev[x]
                    c = prev[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    line[x] = (line[x] + pr) & 0xFF
            elif f != 0:
                return None
            if color_type in (2, 6):
                gray.extend(
                    _luma(line[p], line[p + 1], line[p + 2])
                    for p in range(0, stride, channels)
                )
            else:  # gray / gray+alpha
                gray.extend(line[0::channels])
            prev = line
        return ("png", w, h, gray)
    # baseline JPEG: full IDCT raster -> integer luma
    if data[:2] == b"\xff\xd8":
        from ..kernel.jpeg import decode_jpeg_gray

        return decode_jpeg_gray(data)
    # GIF first frame (deinterlaced palette raster -> luma)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_gray(data)
    return None


def _block_grid(w: int, h: int, gray, gw: int, gh: int):
    """gh x gw grid of block means over a row-major gray raster; blocks
    are floor-partitioned with guaranteed-nonempty ranges, so any
    image size (including < grid size) hashes deterministically."""
    grid = []
    for gy in range(gh):
        y0, y1 = gy * h // gh, max(gy * h // gh + 1, (gy + 1) * h // gh)
        row = []
        for gx in range(gw):
            x0, x1 = gx * w // gw, max(gx * w // gw + 1, (gx + 1) * w // gw)
            s = cnt = 0
            for y in range(y0, min(y1, h)):
                base = y * w
                for x in range(x0, min(x1, w)):
                    s += gray[base + x]
                    cnt += 1
            row.append(s / cnt if cnt else 0.0)
        grid.append(row)
    return grid


def _to_i64(bits: int) -> int:
    """64-bit hash -> SIGNED int64 (two's complement) — Spark BIGINT
    has no unsigned form; XOR/bit_count/band masking are bit-identical
    either way (the band mask strips arithmetic-shift sign bits)."""
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def ahash64(w: int, h: int, gray) -> int:
    """Average hash: 8x8 block means, bit = 1 where block >= overall
    mean (row-major, MSB first). Solid images hash to all-ones."""
    grid = _block_grid(w, h, gray, 8, 8)
    mean = sum(sum(r) for r in grid) / 64.0
    bits = 0
    for gy in range(8):
        for gx in range(8):
            bits = (bits << 1) | (1 if grid[gy][gx] >= mean else 0)
    return _to_i64(bits)


def dhash64(w: int, h: int, gray) -> int:
    """Difference hash: 8x9 grid, bit = 1 where left block mean >
    right neighbor (horizontal gradient sign, row-major, MSB first).
    Solid images hash to 0; brightness shifts cancel out."""
    grid = _block_grid(w, h, gray, 9, 8)
    bits = 0
    for gy in range(8):
        for gx in range(8):
            bits = (bits << 1) | (1 if grid[gy][gx] > grid[gy][gx + 1] else 0)
    return _to_i64(bits)


IMAGE_HASHES_DDL = (
    "media_ref string, fmt string, width int, height int, "
    "ahash bigint, dhash bigint, status string, error string"
)


def image_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
) -> DataFrame:
    """Perceptual 64-bit image hashes (aHash + dHash) per media row —
    the multimodal arm of the dedup families. One mapInPandas batch
    stage over the binary payloads (real decode for
    Netpbm/PNG/BMP/GIF/baseline-JPEG — the formats that dominate a web
    crawl; anything else surfaces status='unsupported', never task
    failures); near-dup pairing happens downstream in
    :func:`image_near_duplicates` via the shared Hamming banding.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.split(" ")[0]: []
                   for k in IMAGE_HASHES_DDL.split(", ")}
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                out["media_ref"].append(ref)
                if payload is None:
                    out["fmt"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["ahash"].append(None)
                    out["dhash"].append(None)
                    out["status"].append("error")
                    out["error"].append("null payload")
                    continue
                dec = decode_gray_raster(bytes(payload))
                if dec is None:
                    out["fmt"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["ahash"].append(None)
                    out["dhash"].append(None)
                    out["status"].append("unsupported")
                    out["error"].append(
                        "not netpbm/png/bmp/gif/baseline-jpeg "
                        "(transcode to P6 first)"
                    )
                    continue
                fmt, w, h, gray = dec
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(ahash64(w, h, gray))
                out["dhash"].append(dhash64(w, h, gray))
                out["status"].append("ok")
                out["error"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_HASHES_DDL)


PIXEL_STATS_HASHES_DDL = (
    "media_ref string, fmt string, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double, status string, "
    "ahash bigint, dhash bigint"
)


def pixel_stats_with_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
) -> DataFrame:
    """Per-channel statistics AND perceptual hashes in ONE decode stage.

    Value-identical to ``extract_pixel_stats(df)`` inner-joined with
    ``image_hashes(df)`` on the (unique) ref column, but the payloads
    cross the Arrow boundary once and there is no join: at corpus scale
    the two-branch form ships every binary payload through two separate
    Python stages and shuffles the results back together. Stats columns
    follow exactly the `extract_pixel_stats` decode ladder; ahash/dhash
    follow exactly the `image_hashes` gray-raster path (null when the
    gray decode is unsupported — callers coalesce as before).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_ref": [], "fmt": [], "width": [], "height": [],
                "channels": [], "mean_r": [], "mean_g": [], "mean_b": [],
                "status": [], "ahash": [], "dhash": [],
            }
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                out["media_ref"].append(ref)
                if payload is None:
                    for k in ("fmt", "width", "height", "channels",
                              "mean_r", "mean_g", "mean_b",
                              "ahash", "dhash"):
                        out[k].append(None)
                    out["status"].append("error")
                    continue
                data = bytes(payload)
                dec = (
                    decode_netpbm(data)
                    or decode_png_pixels(data)
                    or decode_gif_pixels(data)
                    or decode_bmp_pixels(data)
                    or _decode_jpeg(data)
                )
                if dec is None:
                    for k in ("fmt", "width", "height", "channels",
                              "mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
                    out["status"].append("unsupported")
                else:
                    fmt, w, h, ch, means = dec
                    out["fmt"].append(fmt)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    m = list(means or [])
                    out["mean_r"].append(m[0] if m else None)
                    out["mean_g"].append(m[1] if len(m) >= 3 else None)
                    out["mean_b"].append(m[2] if len(m) >= 3 else None)
                    out["status"].append("ok")
                gray = decode_gray_raster(data)
                if gray is None:
                    out["ahash"].append(None)
                    out["dhash"].append(None)
                else:
                    _, gw, gh, graster = gray
                    out["ahash"].append(ahash64(gw, gh, graster))
                    out["dhash"].append(dhash64(gw, gh, graster))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=PIXEL_STATS_HASHES_DDL)


def image_near_duplicates(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    max_hamming: int = 6,
    bands: int = 8,
) -> DataFrame:
    """(a, b, hamming) near-duplicate image pairs by dHash distance —
    hashes from :func:`image_hashes`, candidate pairs via the SAME
    banded pigeonhole join the text SimHash family uses
    (signature_hamming_pairs): never all-pairs, sound for
    max_hamming <= bands - 1.
    """
    from .dedup_families import signature_hamming_pairs

    sigs = (
        image_hashes(df, payload_col, ref_col)
        .where(F.col("status") == "ok")
        .select(F.col(ref_col).alias("id"), F.col("dhash").alias("sig"))
    )
    return signature_hamming_pairs(
        sigs, bits=64, bands=bands, max_hamming=max_hamming
    )


# -- resize + thumbnails ----------------------------------------------------------


def resize_gray(w: int, h: int, gray, tw: int, th: int):
    """Nearest-neighbor resize of a row-major gray raster — REAL,
    dependency-free (the resize step of the mandate's multimodal
    decode/feature/resize/frame-sample family). Deterministic center
    sampling: source index = (t + 0.5) * src / dst floored."""
    out = bytearray(tw * th)
    for ty in range(th):
        sy = min(h - 1, (2 * ty + 1) * h // (2 * th))
        base_s = sy * w
        base_t = ty * tw
        for tx in range(tw):
            sx = min(w - 1, (2 * tx + 1) * w // (2 * tw))
            out[base_t + tx] = gray[base_s + sx]
    return bytes(out)


THUMBNAILS_DDL = (
    "media_ref string, fmt string, width int, height int, "
    "thumb_w int, thumb_h int, thumb binary, status string, error string"
)


def image_thumbnails(
    df: DataFrame,
    thumb_w: int = 32,
    thumb_h: int = 32,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
) -> DataFrame:
    """Decode -> grayscale -> nearest-neighbor resize -> re-encode as
    binary Netpbm P5, one mapInPandas stage: a REAL end-to-end image
    transform (the thumbnail/preview path of a multimodal training
    pipeline). Raster formats only (see decode_gray_raster)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.split(" ")[0]: [] for k in THUMBNAILS_DDL.split(", ")}

            def row(ref, fmt=None, w=None, h=None, thumb=None,
                    status="ok", error=None):
                out["media_ref"].append(ref)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["thumb_w"].append(thumb_w if thumb else None)
                out["thumb_h"].append(thumb_h if thumb else None)
                out["thumb"].append(thumb)
                out["status"].append(status)
                out["error"].append(error)

            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                if payload is None:
                    row(ref, status="error", error="null payload")
                    continue
                dec = decode_gray_raster(bytes(payload))
                if dec is None:
                    row(ref, status="unsupported",
                        error="not netpbm/png/bmp (transcode to P6 first)")
                    continue
                fmt, w, h, gray = dec
                resized = resize_gray(w, h, gray, thumb_w, thumb_h)
                p5 = f"P5\n{thumb_w} {thumb_h}\n255\n".encode() + resized
                row(ref, fmt, w, h, p5)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=THUMBNAILS_DDL)


# -- video containers (ISO BMFF / MP4) --------------------------------------------


def decode_mp4_meta(data: bytes):
    """(brand, duration_ms, timescale, n_tracks) from an ISO base
    media file (MP4/MOV): REAL box-structure walk — ftyp major brand,
    moov/mvhd duration (version 0 and 1 layouts), trak count. Returns
    None for non-BMFF payloads or structural corruption."""
    n = len(data)
    if n < 12 or data[4:8] != b"ftyp":
        return None
    brand = data[8:12].decode("latin-1")
    duration_ms = timescale = None
    n_tracks = 0

    def walk(start: int, end: int, depth: int) -> bool:
        nonlocal duration_ms, timescale, n_tracks
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(data[pos:pos + 4], "big")
            btype = data[pos + 4:pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return False
                size = int.from_bytes(data[pos + 8:pos + 16], "big")
                hdr = 16
            elif size == 0:  # box extends to EOF
                size = end - pos
            if size < hdr or pos + size > end:
                return False
            body = pos + hdr
            if btype == b"moov" and depth == 0:
                if not walk(body, pos + size, 1):
                    return False
            elif btype == b"mvhd" and depth == 1:
                if body >= pos + size:
                    return False
                version = data[body]
                # v1: ver/flags(4) ctime(8) mtime(8) ts(4) dur(8) = 32
                # v0: ver/flags(4) ctime(4) mtime(4) ts(4) dur(4) = 20
                if version == 1 and body + 32 <= pos + size:
                    ts = int.from_bytes(data[body + 20:body + 24], "big")
                    dur = int.from_bytes(data[body + 24:body + 32], "big")
                elif version == 0 and body + 20 <= pos + size:
                    ts = int.from_bytes(data[body + 12:body + 16], "big")
                    dur = int.from_bytes(data[body + 16:body + 20], "big")
                else:
                    return False
                if ts:
                    timescale = ts
                    duration_ms = dur * 1000 // ts
            elif btype == b"trak" and depth == 1:
                n_tracks += 1
            pos += size
        return True

    if not walk(0, n, 0) or timescale is None:
        return None
    return (brand, duration_ms, timescale, n_tracks)


VIDEO_FEATURES_DDL = (
    "media_ref string, fmt string, brand string, duration_ms bigint, "
    "timescale bigint, n_tracks int, n_bytes bigint, "
    "frame_times_ms array<bigint>, status string, error string"
)


def extract_video_features(
    df: DataFrame,
    frame_every_ms: int = 1000,
    max_frames: int = 32,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    decode_stub_mode: str = "plan",
) -> DataFrame:
    """Video container metadata + frame-sampling PLAN via mapInPandas.

    The container walk (ftyp/moov/mvhd/trak) is REAL and dependency-
    free; `frame_times_ms` is the deterministic sample schedule
    (every `frame_every_ms`, capped at `max_frames` — evenly thinned,
    never truncated to the head, so long videos still cover the
    tail). Actual pixel decode of the sampled frames genuinely needs
    a codec (no av library in this container): decode_stub_mode
    'plan' emits the schedule only; 'raise' surfaces
    NotImplementedError as status='unsupported' rows — the honest
    boundary, same policy as the learned image-feature stub. The one
    codec-free exception is motion JPEG: route .mjpeg payloads to
    :func:`extract_mjpeg_frames` for REAL sampled-frame pixel decode.
    """

    def schedule(duration_ms: int):
        times = list(range(0, max(duration_ms, 1), frame_every_ms))
        if len(times) > max_frames:
            step = len(times) / max_frames
            times = [times[int(i * step)] for i in range(max_frames)]
        return times

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.split(" ")[0]: []
                   for k in VIDEO_FEATURES_DDL.split(", ")}

            def row(ref, nb, fmt=None, brand=None, dur=None, ts=None,
                    trk=None, times=None, status="ok", error=None):
                out["media_ref"].append(ref)
                out["fmt"].append(fmt)
                out["brand"].append(brand)
                out["duration_ms"].append(dur)
                out["timescale"].append(ts)
                out["n_tracks"].append(trk)
                out["n_bytes"].append(nb)
                out["frame_times_ms"].append(times)
                out["status"].append(status)
                out["error"].append(error)

            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                if payload is None:
                    row(ref, 0, status="error", error="null payload")
                    continue
                data = bytes(payload)
                meta = decode_mp4_meta(data)
                if meta is None:
                    row(ref, len(data), status="unsupported",
                        error="not an ISO-BMFF container")
                    continue
                brand, dur, ts, trk = meta
                if decode_stub_mode == "raise":
                    row(ref, len(data), "mp4", brand, dur, ts, trk,
                        status="unsupported",
                        error="frame pixel decode needs a video codec "
                              "— not in this container (the schedule "
                              "and container walk are real)")
                    continue
                row(ref, len(data), "mp4", brand, dur, ts, trk,
                    schedule(dur))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=VIDEO_FEATURES_DDL)


# -- MJPEG: the codec-free real-decode lane ---------------------------------


def _jpeg_frame_end(data: bytes, pos: int, n: int) -> int:
    """Index just past the EOI of the JPEG starting at ``pos`` (SOI),
    or -1. Walks marker segments by their length fields — a raw FFD9
    inside a metadata segment payload (e.g. an EXIF APP1 thumbnail,
    itself a nested JPEG with its own EOI) is legal and must NOT end
    the frame; only inside entropy-coded data is 0xFF always stuffed
    (0xFF00) or a marker."""
    i = pos + 2
    while i + 2 <= n:
        if data[i] != 0xFF:
            return -1  # corrupt marker stream
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0xD9:  # EOI
            return i + 2
        if 0xD0 <= marker <= 0xD7 or marker == 0x01 or marker == 0xD8:
            i += 2  # standalone markers carry no length
            continue
        if i + 4 > n:
            return -1
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        if seglen < 2:
            return -1
        i += 2 + seglen
        if marker == 0xDA:  # SOS: entropy data follows the header
            while i + 1 < n:
                if data[i] != 0xFF:
                    i += 1
                    continue
                b2 = data[i + 1]
                if b2 == 0x00 or 0xD0 <= b2 <= 0xD7:
                    i += 2  # stuffed FF / restart marker
                    continue
                break  # real marker (EOI, DNL, next SOS, ...)
    return -1


def split_mjpeg_frames(data: bytes):
    """Split a motion-JPEG stream (concatenated SOI..EOI baseline
    JPEGs — the .mjpeg / multipart-camera convention) into its frame
    payloads, or None if the payload is not an MJPEG stream. Frame
    ends are found by walking marker segments up to SOS and scanning
    only entropy-coded data for the EOI (a raw FFD9 may legally appear
    inside metadata payloads such as EXIF thumbnails). Trailing bytes
    after the last complete frame are ignored (truncated tail frame)."""
    if not data.startswith(b"\xff\xd8"):
        return None
    frames, pos, n = [], 0, len(data)
    while pos < n and data[pos : pos + 2] == b"\xff\xd8":
        end = _jpeg_frame_end(data, pos, n)
        if end < 0:
            break
        frames.append(data[pos:end])
        pos = end
    return frames or None


MJPEG_FRAMES_DDL = (
    "media_ref string, fmt string, n_frames int, frame_idx int, "
    "t_ms bigint, width int, height int, mean_luma double, "
    "status string, error string"
)


def extract_mjpeg_frames(
    df: DataFrame,
    frame_every_ms: int = 1000,
    max_frames: int = 32,
    fps: float = 25.0,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
) -> DataFrame:
    """REAL video-frame pixel decode for the one codec this container
    can do without a library: motion JPEG. One row per SAMPLED frame —
    the same every-`frame_every_ms`, `max_frames`-capped,
    evenly-thinned schedule as :func:`extract_video_features`, applied
    to the stream's `fps`-derived timeline — with the frame decoded
    through ``kernel.jpeg.decode_jpeg_gray`` (full huffman + IDCT
    raster, the perceptual-hash luma path) and reduced to its mean
    luma. Non-MJPEG payloads surface one status='unsupported' row
    (MP4 et al. stay honestly stubbed in extract_video_features — a
    real codec is still a codec)."""
    from ..kernel.jpeg import decode_jpeg_gray

    frame_ms = 1000.0 / fps

    def schedule(duration_ms: int):
        times = list(range(0, max(duration_ms, 1), frame_every_ms))
        if len(times) > max_frames:
            step = len(times) / max_frames
            times = [times[int(i * step)] for i in range(max_frames)]
        return times

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.split(" ")[0]: [] for k in MJPEG_FRAMES_DDL.split(", ")}

            def row(ref, fmt=None, nf=None, idx=None, t=None, w=None,
                    h=None, luma=None, status="ok", error=None):
                out["media_ref"].append(ref)
                out["fmt"].append(fmt)
                out["n_frames"].append(nf)
                out["frame_idx"].append(idx)
                out["t_ms"].append(t)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(luma)
                out["status"].append(status)
                out["error"].append(error)

            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                if payload is None:
                    row(ref, status="error", error="null payload")
                    continue
                frames = split_mjpeg_frames(bytes(payload))
                if frames is None:
                    row(ref, status="unsupported",
                        error="not an MJPEG stream")
                    continue
                duration_ms = int(len(frames) * frame_ms)
                for t in schedule(duration_ms):
                    idx = min(int(t / frame_ms), len(frames) - 1)
                    dec = decode_jpeg_gray(frames[idx])
                    if dec is None:
                        row(ref, "mjpeg", len(frames), idx, t,
                            status="error",
                            error=f"frame {idx} not baseline JPEG")
                        continue
                    _, w, h, gray = dec
                    row(ref, "mjpeg", len(frames), idx, t, w, h,
                        sum(gray) / len(gray))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=MJPEG_FRAMES_DDL)
