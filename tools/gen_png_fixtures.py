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


if __name__ == "__main__":
    main()
