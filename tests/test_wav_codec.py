"""WAV codec + audio column tests: hand-built byte golden (breaks
encode/decode circularity), lossless roundtrips, chunk-walking, subset
rejection, and the synth waveform's closed-form properties."""

import struct

import numpy as np
import pytest

from mit_spark.operators.wav_codec import decode_wav, encode_wav


def test_hand_built_golden():
    """A 4-sample mono WAV written byte-by-byte: samples 100, -100, 257,
    -32768 little-endian int16."""
    pcm = struct.pack("<4h", 100, -100, 257, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    raw = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    rate, arr = decode_wav(raw)
    assert rate == 8000
    assert arr.shape == (4, 1)
    assert arr[:, 0].tolist() == [100, -100, 257, -32768]


def test_roundtrip_mono_and_stereo_bit_exact():
    rng = np.random.RandomState(0)
    mono = rng.randint(-32768, 32768, 1000).astype(np.int16)
    rate, out = decode_wav(encode_wav(mono, rate=22050))
    assert rate == 22050 and np.array_equal(out[:, 0], mono)
    stereo = rng.randint(-32768, 32768, (500, 2)).astype(np.int16)
    _, out2 = decode_wav(encode_wav(stereo))
    assert np.array_equal(out2, stereo)


def test_unknown_chunks_skipped():
    mono = np.arange(-5, 5, dtype=np.int16)
    raw = encode_wav(mono)
    # splice a LIST chunk between fmt and data (players do this)
    di = raw.find(b"data")
    spliced = raw[:di] + b"LIST" + struct.pack("<I", 4) + b"INFO" + raw[di:]
    _, arr = decode_wav(spliced)
    assert np.array_equal(arr[:, 0], mono)


def test_unsupported_rejected():
    mono = np.zeros(4, dtype=np.int16)
    raw = encode_wav(mono)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"XXXX" + raw[4:])
    # float format tag (3)
    bad = raw.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bad)
    with pytest.raises(ValueError, match="int16"):
        encode_wav(np.zeros(4, dtype=np.float32))


def test_synth_waveform_closed_forms():
    """The properties the SQL oracle states: RMS == peak == a,
    zero crossings == n/half - 1, n a whole number of periods."""
    import hashlib

    from mit_spark.operators.multimodal import synth_audio_samples

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    for ref in ["aaaabbbbccccdddd", "0123456789abcdef"]:
        s = synth_audio_samples(ref).astype(np.int64)
        a = 256 * (1 + h(f"au:{ref}:amp") % 100)
        half = 8 * (1 + h(f"au:{ref}:per") % 16)
        n = s.shape[0]
        assert n % (2 * half) == 0
        assert int(np.abs(s).max()) == a
        assert int(round(float(np.sqrt(np.mean(s * s))))) == a
        zc = int(np.count_nonzero(np.sign(s[1:]) != np.sign(s[:-1])))
        assert zc == n // half - 1
        assert n // (zc + 1) == half
