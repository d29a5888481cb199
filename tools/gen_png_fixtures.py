"""Generate the committed deterministic PNG fixtures under
``fixtures/images/`` — the input for the ``png_chunks`` query (the
second codec-free multimodal compute under the driver's hard signal:
a VARIABLE-OFFSET chunk walk, where ``wav_pcm_windows`` was a
fixed-offset header + sample fold).

Everything is integer arithmetic and hand-built DEFLATE *stored*
blocks — no ``zlib.compress`` call — so the byte content is
reproducible on any platform and zlib version (``zlib.crc32`` /
``zlib.adler32`` are pure CRC/Adler math, not compression).  The
files are nonetheless fully valid PNGs (a real decoder inflates the
stored blocks).  Re-running this script must be a no-op diff:

    python tools/gen_png_fixtures.py
"""

from __future__ import annotations

import os
import struct
import zlib

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(HERE, "fixtures", "images")


def chunk(ctype: bytes, data: bytes) -> bytes:
    """One PNG chunk: big-endian length, type, data, CRC32(type+data)."""
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def deflate_stored(raw: bytes) -> bytes:
    """A valid zlib stream using only STORED (uncompressed) deflate
    blocks: 0x78 0x01 header (30721 % 31 == 0, no preset dict), then
    BFINAL/BTYPE=00 blocks with LEN/NLEN, then Adler-32 of the raw
    payload — deterministic bytes with no compressor involved."""
    out = b"\x78\x01"
    blocks = [raw[i : i + 65535] for i in range(0, len(raw), 65535)] or [b""]
    for k, b in enumerate(blocks):
        final = 1 if k == len(blocks) - 1 else 0
        out += bytes([final]) + struct.pack("<HH", len(b), len(b) ^ 0xFFFF) + b
    return out + struct.pack(">I", zlib.adler32(raw) & 0xFFFFFFFF)


def ihdr(width: int, height: int, color_type: int, bit_depth: int = 8) -> bytes:
    return chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0),
    )


SIG = b"\x89PNG\r\n\x1a\n"


def png_gradient_gray() -> bytes:
    """16×8 grayscale, the minimal three-chunk layout."""
    w, h = 16, 8
    raw = b"".join(
        b"\x00" + bytes((x * 16 + y * 3) % 256 for x in range(w))
        for y in range(h)
    )
    return SIG + ihdr(w, h, 0) + chunk(b"IDAT", deflate_stored(raw)) + chunk(
        b"IEND", b""
    )


def png_bands_rgb() -> bytes:
    """8×8 RGB with ancillary chunks and the zlib stream SPLIT across
    three IDAT chunks (the PNG spec's concatenated-IDAT rule) — the
    walk must count all three."""
    w, h = 8, 8
    raw = b"".join(
        b"\x00"
        + bytes(
            v
            for x in range(w)
            for v in ((x * 31) % 256, (y * 53) % 256, ((x + y) * 17) % 256)
        )
        for y in range(h)
    )
    z = deflate_stored(raw)
    cut1, cut2 = len(z) // 3, 2 * len(z) // 3
    return (
        SIG
        + ihdr(w, h, 2)
        + chunk(b"pHYs", struct.pack(">IIB", 2835, 2835, 1))
        + chunk(b"tEXt", b"Software\x00gen_png_fixtures")
        + chunk(b"IDAT", z[:cut1])
        + chunk(b"IDAT", z[cut1:cut2])
        + chunk(b"IDAT", z[cut2:])
        + chunk(b"tEXt", b"Comment\x00deterministic fixture")
        + chunk(b"IEND", b"")
    )


def png_palette_dots() -> bytes:
    """12×6 palette image with PLTE/tRNS and a ZERO-LENGTH IDAT in the
    stream (legal per spec) — pins the L=0 step of the offset walk."""
    w, h = 12, 6
    palette = bytes(
        v for i in range(16) for v in ((i * 17) % 256, (i * 29) % 256, (i * 47) % 256)
    )
    raw = b"".join(
        b"\x00" + bytes(((x * 7 + y * 5) % 16) for x in range(w)) for y in range(h)
    )
    return (
        SIG
        + ihdr(w, h, 3)
        + chunk(b"PLTE", palette)
        + chunk(b"tRNS", bytes(range(0, 256, 16)))
        + chunk(b"IDAT", b"")
        + chunk(b"IDAT", deflate_stored(raw))
        + chunk(b"IEND", b"")
    )


# --- filtered-scanline fixtures (fixtures/images_filters/) -----------
# The Sub/Up decode rung (png_filtered_pixel_stats) gets its OWN lake
# so the registered filter-0 queries' committed inputs never change.

OUT_DIR_FILTERS = os.path.join(HERE, "fixtures", "images_filters")


def filter_rows(
    pixels: list[list[int]], bpp: int, ftypes: list[int]
) -> bytes:
    """Encode raw pixel rows with the given per-row PNG filter types
    (0 None, 1 Sub, 2 Up) — the inverse of the reconstruction the
    decoder performs, so fixtures carry KNOWN pixel values."""
    out = b""
    prev = [0] * len(pixels[0])
    for line, ft in zip(pixels, ftypes):
        if ft == 0:
            enc = line[:]
        elif ft == 1:
            enc = [
                (line[x] - (line[x - bpp] if x >= bpp else 0)) % 256
                for x in range(len(line))
            ]
        elif ft == 2:
            enc = [(line[x] - prev[x]) % 256 for x in range(len(line))]
        else:  # written verbatim: a deliberately-undecodable stray row
            enc = line[:]
        prev = line
        out += bytes([ft]) + bytes(enc)
    return out


def png_sub_gray() -> bytes:
    """16×8 grayscale, every row Sub-filtered — the single most common
    filter in real encoder output."""
    w, h = 16, 8
    pixels = [[(x * 13 + y * 29) % 256 for x in range(w)] for y in range(h)]
    raw = filter_rows(pixels, 1, [1] * h)
    return SIG + ihdr(w, h, 0) + chunk(b"IDAT", deflate_stored(raw)) + chunk(
        b"IEND", b""
    )


def png_up_rgb() -> bytes:
    """8×8 RGB: row 0 unfiltered, the rest an unbroken Up chain."""
    w, h = 8, 8
    pixels = [
        [((x // 3) * 31 + (x % 3) * 77 + y * 11) % 256 for x in range(w * 3)]
        for y in range(h)
    ]
    raw = filter_rows(pixels, 3, [0] + [2] * (h - 1))
    return SIG + ihdr(w, h, 2) + chunk(b"IDAT", deflate_stored(raw)) + chunk(
        b"IEND", b""
    )


def png_mixed_palette() -> bytes:
    """12×6 palette image cycling filters 2,1,0,2,2,1 — starts with Up
    (zeros above row 0, per spec) and breaks the Up chain twice, so
    the segmented reconstruction is exercised end to end."""
    w, h = 12, 6
    palette = bytes(
        v for i in range(16) for v in ((i * 23) % 256, (i * 41) % 256, (i * 59) % 256)
    )
    pixels = [[((x * 5 + y * 7) % 16) for x in range(w)] for y in range(h)]
    raw = filter_rows(pixels, 1, [2, 1, 0, 2, 2, 1])
    return (
        SIG
        + ihdr(w, h, 3)
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", deflate_stored(raw))
        + chunk(b"IEND", b"")
    )


def png_avg_stray() -> bytes:
    """6×3 grayscale whose middle row claims filter 3 (Average) —
    outside the decodable set, so the whole file must FILTER (never
    error) on both engines."""
    w, h = 6, 3
    pixels = [[(x * 19 + y * 3) % 256 for x in range(w)] for y in range(h)]
    raw = filter_rows(pixels, 1, [0, 3, 0])
    return SIG + ihdr(w, h, 0) + chunk(b"IDAT", deflate_stored(raw)) + chunk(
        b"IEND", b""
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    images = {
        "gradient_gray.png": png_gradient_gray(),
        "bands_rgb.png": png_bands_rgb(),
        "palette_dots.png": png_palette_dots(),
    }
    for name, payload in images.items():
        path = os.path.join(OUT_DIR, name)
        with open(path, "wb") as fh:
            fh.write(payload)
        print(f"wrote {path} ({len(payload)} bytes)")
    os.makedirs(OUT_DIR_FILTERS, exist_ok=True)
    filtered = {
        "sub_gray.png": png_sub_gray(),
        "up_rgb.png": png_up_rgb(),
        "mixed_palette.png": png_mixed_palette(),
        "avg_stray.png": png_avg_stray(),
    }
    for name, payload in filtered.items():
        path = os.path.join(OUT_DIR_FILTERS, name)
        with open(path, "wb") as fh:
            fh.write(payload)
        print(f"wrote {path} ({len(payload)} bytes)")


if __name__ == "__main__":
    main()
