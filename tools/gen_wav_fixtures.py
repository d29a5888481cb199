"""Generate the committed deterministic WAV fixtures under
``fixtures/audio/`` — the input for the ``wav_pcm_windows`` query (the
first multimodal query that does SAMPLE-LEVEL math under the driver's
hard signal, not just container sniffing) — and the STEREO lake under
``fixtures/audio_stereo/`` for the staged ``wav_stereo_features``
(its own directory so the registered mono queries' inputs never
change, the PNG-filter-lake precedent).

Everything is integer arithmetic (no float synthesis), so the byte
content is reproducible on any platform: a triangle wave, a stepped
modular ramp, and an LCG noise track, each 2048 samples of canonical
44-byte-header PCM16 mono WAV at 8 kHz; the stereo lake interleaves
those same tracks as LR frames (plus a mono stray and a
trailing-partial-frame file to pin the gates).  Re-running this
script must be a no-op diff:

    python tools/gen_wav_fixtures.py
"""

from __future__ import annotations

import os
import struct

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(HERE, "fixtures", "audio")
STEREO_DIR = os.path.join(HERE, "fixtures", "audio_stereo")

N_SAMPLES = 2048
SAMPLE_RATE = 8000


def _samples_triangle() -> list[int]:
    # symmetric triangle, period 64, amplitude ±12800
    out = []
    for i in range(N_SAMPLES):
        ph = i % 64
        v = ph if ph < 32 else 64 - ph  # 0..32..1
        out.append((v - 16) * 800)
    return out


def _samples_ramp() -> list[int]:
    # stepped modular ramp with a prime stride: exercises both signs
    return [(((i * 7) % 200) - 100) * 300 for i in range(N_SAMPLES)]


def _samples_lcg() -> list[int]:
    # glibc-style LCG; full int16 range including the -32768 edge
    out = []
    x = 42
    for _ in range(N_SAMPLES):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((x % 65536) - 32768)
    return out


def wav_bytes(samples: list[int], channels: int = 1) -> bytes:
    """``samples`` is the flat interleaved sample stream (for stereo:
    L0 R0 L1 R1 …); the header's byte-rate/block-align follow
    ``channels``."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH",
        16,
        1,
        channels,
        SAMPLE_RATE,
        SAMPLE_RATE * 2 * channels,
        2 * channels,
        16,
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def _interleave(left: list[int], right: list[int]) -> list[int]:
    out = []
    for lo, ro in zip(left, right):
        out.append(lo)
        out.append(ro)
    return out


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    tracks = {
        "tone_triangle.wav": _samples_triangle(),
        "tone_ramp.wav": _samples_ramp(),
        "noise_lcg.wav": _samples_lcg(),
    }
    for name, samples in tracks.items():
        path = os.path.join(OUT_DIR, name)
        payload = wav_bytes(samples)
        with open(path, "wb") as fh:
            fh.write(payload)
        print(f"wrote {path} ({len(payload)} bytes)")

    # stereo lake: distinct per-channel content so the per-channel
    # folds are distinguishable (L tonal triangle vs R LCG noise pins
    # the ac1 separation; ramp vs negated ramp pins sign symmetry)
    os.makedirs(STEREO_DIR, exist_ok=True)
    tri, ramp, lcg = (
        _samples_triangle(),
        _samples_ramp(),
        _samples_lcg(),
    )
    stereo = {
        "stereo_tri_noise.wav": wav_bytes(_interleave(tri, lcg), channels=2),
        "stereo_ramp_inv.wav": wav_bytes(
            _interleave(ramp, [-s for s in ramp]), channels=2
        ),
        # mono stray: the channels==2 gate must FILTER it, never error
        "mono_stray.wav": wav_bytes(tri),
        # trailing partial frame: one extra 2-byte sample after the
        # last full LR frame — data_bytes % 4 == 2, truncated by the
        # frame div on both engines
        "stereo_partial_tail.wav": wav_bytes(
            _interleave(tri[:64], lcg[:64]) + [777], channels=2
        ),
    }
    for name, payload in stereo.items():
        path = os.path.join(STEREO_DIR, name)
        with open(path, "wb") as fh:
            fh.write(payload)
        print(f"wrote {path} ({len(payload)} bytes)")


if __name__ == "__main__":
    main()
