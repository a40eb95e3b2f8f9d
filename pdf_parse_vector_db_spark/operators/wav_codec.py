"""Pure-stdlib WAV codec + real audio features: the audio analog of the
round-8 PNG tier (operators/png_codec.py).

PCM WAV is stdlib-reachable (`wave` + struct), so the audio modality gets
one REAL format end-to-end too: true sample rate / channel count / frame
count from the header, decoded int16 samples, and deterministic DSP
features (RMS, zero-crossing rate, 8-band spectral energy profile via
numpy rfft) — the waveform statistics an audio-corpus curation pipeline
filters on (silence/clipping detection, speech-vs-tone heuristics).
Non-PCM encodings (float, ADPCM, mu-law) raise with the ffmpeg plug
point named, mirroring the PNG tier's out-of-scope rule.
"""

from __future__ import annotations

import io
import wave

import numpy as np

#: spectral bands in the feature vector
N_BANDS = 8


def is_wav(content: bytes) -> bool:
    return content[:4] == b"RIFF" and content[8:12] == b"WAVE"


def decode_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (sample_rate, n_channels, samples[int16] of shape
    (n_frames, n_channels)). 16-bit PCM only — the stdlib `wave` module
    rejects compressed encodings itself; 8/24/32-bit PCM raise here with
    the plug point named."""
    if not is_wav(content):
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    with wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"{8 * w.getsampwidth()}-bit PCM needs ffmpeg/soundfile; "
                "this tier decodes 16-bit PCM"
            )
        n_ch = w.getnchannels()
        rate = w.getframerate()
        # stdlib wave does NOT validate framerate on read — a corrupt or
        # crafted fmt chunk with rate=0 would otherwise surface as a
        # ZeroDivisionError deep inside an executor batch instead of the
        # module's designed ValueError tier.
        if rate <= 0:
            raise ValueError("not a WAV: zero frame rate")
        raw = w.readframes(w.getnframes())
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, n_ch)
    return rate, n_ch, samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) int16 → 16-bit PCM WAV bytes (fixture
    generator for the round-trip tests)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def audio_features(content: bytes) -> dict:
    """Deterministic waveform features over the mono mixdown:
    rms (normalized to [0,1] full scale), zero-crossing rate (fraction of
    sign changes), peak (normalized), and an N_BANDS-band spectral energy
    profile (rfft power folded into equal-width bands, L1-normalized) —
    all float64, rounded to 6 dp so results hash stably across hosts.

    Container-universal (round 10): FLAC payloads decode through
    operators/flac_codec into the identical int16 sample space, so the
    same features come out of either container — and a WAV→FLAC
    re-encode of the same audio yields IDENTICAL features (both
    lossless), the audio analog of the image tiers' cross-container
    dedup (pinned in tests/test_flac_codec.py)."""
    from pdf_parse_vector_db_spark.operators import flac_codec

    if flac_codec.is_flac(content):
        rate, n_ch, samples = flac_codec.decode_flac(content)
        samples = samples.astype(np.int16)
    else:
        rate, n_ch, samples = decode_wav(content)
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    if n == 0:
        bands = [0.0] * N_BANDS
        return {
            "sample_rate": rate, "n_channels": n_ch, "n_frames": 0,
            "duration_s": 0.0, "rms": 0.0, "zcr": 0.0, "peak": 0.0,
            "bands": bands,
        }
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    peak = float(np.max(np.abs(mono)))
    power = np.abs(np.fft.rfft(mono)) ** 2
    # drop DC, fold into N_BANDS equal-width bands
    p = power[1:] if len(power) > 1 else power
    edges = [1 + (len(p) * i) // N_BANDS for i in range(N_BANDS + 1)]
    raw_bands = [
        float(p[edges[i] - 1 : edges[i + 1] - 1].sum()) for i in range(N_BANDS)
    ]
    tot = sum(raw_bands)
    # ansi: driver/worker-side Python floats; tot > 0 guarded inline
    bands = [round(b / tot, 6) if tot > 0 else 0.0 for b in raw_bands]
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_frames": n,
        # ansi: Python ints; rate > 0 validated in decode_wav
        "duration_s": round(n / rate, 6),
        "rms": round(rms, 6),
        "zcr": round(zcr, 6),
        "peak": round(peak, 6),
        "bands": bands,
    }
