"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side architecture is the real deliverable here: binary
payload + typed metadata struct columns, Arrow-batched ``mapInPandas``
for decode/feature-extraction (the only sane shape for per-blob Python
work at scale — whole Arrow batches cross the JVM↔Python boundary, not
rows), and frame-sampling as an explode over a sequence.

The actual codec calls are STUBBED (no image/audio libraries in this
container): ``decode_image_batch`` computes deterministic fake
dimensions from the payload bytes, and ``decode_image_real`` raises
``NotImplementedError`` where PIL/ffmpeg would plug in. The batch
shapes, schemas, and partitioning are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the (stubbed) image decode.
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FORMATS = ["jpeg", "png", "webp"]


def to_binary_docs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model the corpus as multimodal rows: payload = opaque binary
    (here: utf-8 bytes of the text, a deterministic stand-in for image
    bytes), with the id carried alongside."""
    return df.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_image_real(payload: bytes) -> dict:
    """Where a real codec (PIL / libjpeg / ffmpeg) plugs in."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use decode_image_batch's deterministic stub"
    )


def _fake_meta(doc_id: pd.Series, payload: pd.Series) -> pd.DataFrame:
    n = payload.str.len().astype("int32")
    return pd.DataFrame(
        {
            "doc_id": doc_id.astype("int64"),
            "n_bytes": n,
            "width": (n % 640 + 1).astype("int32"),
            "height": ((n * 7) % 480 + 1).astype("int32"),
            "channels": 3,
            "format": (n % 3).map(dict(enumerate(FORMATS))),
        }
    )


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in → decoded metadata batch out.
    Deterministic stub (dimensions derived from byte length) so the
    full Spark plumbing is oracle-checkable; swap ``_fake_meta`` for a
    real codec without touching the plan."""
    for pdf in batches:
        yield _fake_meta(pdf["doc_id"], pdf["payload"])


def decode_images(df: DataFrame) -> DataFrame:
    """Distributed decode over the binary column: Arrow-batched, one
    Python worker per partition, no row-at-a-time serialization.
    Repartitions under-split scans first — decode cost is per-blob CPU,
    so partition count IS the parallelism."""
    from ..io import ensure_parallelism

    return ensure_parallelism(to_binary_docs(df)).mapInPandas(
        decode_image_batch, IMAGE_META_SCHEMA
    )


def sample_frames(df: DataFrame, step: int = 5) -> DataFrame:
    """Video-frame sampling as relational explode: each doc models a
    clip with (doc_id % 30)+1 frames; emit every ``step``-th frame
    index. Pure Catalyst — the pattern for frame-level fan-out."""
    n_frames_minus1 = F.col("doc_id") % 30
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames_minus1, F.lit(step))
        ).alias("frame_idx"),
    )


#: Output schema of the (stubbed) audio feature extraction.
AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)

AUDIO_WINDOW = 64


def audio_energy_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary waveform → windowed energy features.

    Real shape of an audio feature extractor (decode blob → sample
    array → fixed-size windows → per-window aggregate), with the codec
    stubbed deterministically: samples are the payload's raw bytes
    (ASCII corpus ⇒ equal to code points, so the DuckDB oracle can
    recompute them from the text), energy is the exact integer sum of
    squared samples per 64-sample window. Swap the np.frombuffer line
    for soundfile/librosa decode without touching schema or plan. The
    per-blob loop mirrors a real codec (variable-length blobs decode
    one at a time); all arithmetic on each blob is vectorized numpy."""
    import numpy as np

    for pdf in batches:
        ids, wins, ns, es = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n = len(samples)
            if n == 0:
                continue
            n_win = (n + AUDIO_WINDOW - 1) // AUDIO_WINDOW
            idx = np.arange(n) // AUDIO_WINDOW
            energy = np.bincount(idx, weights=samples * samples, minlength=n_win)
            count = np.bincount(idx, minlength=n_win)
            ids.extend([doc_id] * n_win)
            wins.extend(range(n_win))
            ns.extend(count.astype(np.int64))
            es.extend(energy.astype(np.int64))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_idx": pd.Series(wins, dtype="int64"),
                "n_samples": pd.Series(ns, dtype="int64"),
                "energy": pd.Series(es, dtype="int64"),
            }
        )


def audio_energy(df: DataFrame) -> DataFrame:
    """Distributed windowed-energy extraction over the binary column —
    same Arrow-batched plumbing as :func:`decode_images`."""
    from ..io import ensure_parallelism

    return ensure_parallelism(to_binary_docs(df)).mapInPandas(
        audio_energy_batch, AUDIO_ENERGY_SCHEMA
    )


PATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_patches", T.IntegerType()),
        T.StructField("first_patch_sum", T.LongType()),
        T.StructField("total_sum", T.LongType()),
    ]
)


def patchify_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: ViT-style patchify plumbing. The patch GRID
    comes from the (stubbed) decoded dimensions — ceil(w/16)·ceil(h/16)
    patches, the ViT formula mm7 budgets with — and each byte of the
    payload is assigned round-robin to a patch (index mod n_patches),
    a deterministic stand-in for the pixel→patch gather a real decoder
    performs. Per patch the feature is the byte sum; the returned
    summary (first patch's sum + the total, which must equal the whole
    payload's byte sum) makes the gather oracle-checkable byte-for-
    byte while keeping the Arrow batch shapes, variable patch counts,
    and numpy vectorization identical to the real-codec path
    (np.frombuffer → bincount — no per-byte Python)."""
    import numpy as np

    for pdf in batches:
        meta = _fake_meta(pdf["doc_id"], pdf["payload"])
        out = []
        for payload, doc_id, w, h in zip(
            pdf["payload"], meta["doc_id"], meta["width"], meta["height"]
        ):
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n_patches = int(-(-int(w) // 16) * (-(-int(h) // 16)))
            idx = np.arange(arr.size) % n_patches
            sums = np.bincount(idx, weights=arr, minlength=n_patches)
            out.append(
                (
                    int(doc_id),
                    n_patches,
                    int(sums[0]) if n_patches else 0,
                    int(arr.sum()),
                )
            )
        yield pd.DataFrame(
            out, columns=["doc_id", "n_patches", "first_patch_sum", "total_sum"]
        )


#: Single-bin DFT (Goertzel) coefficients for tone detection: bin
#: GOERTZEL_BIN cycles per AUDIO_WINDOW samples, cos/sin quantized to
#: integers at 1e4 so the window power is EXACT int64 arithmetic on
#: both engines (|dot| <= 255*1e4*64 ≈ 1.6e8; its square ≈ 2.7e16 —
#: two of those fit int64 with 300x headroom; the d56-literals
#: pattern: quantize once Python-side, inline the SAME integers into
#: the Spark kernel and the DuckDB oracle so no engine ever evaluates
#: trig).
GOERTZEL_BIN = 5
_2PI_K_OVER_N = 2.0 * 3.141592653589793 * GOERTZEL_BIN / AUDIO_WINDOW
GOERTZEL_COS = tuple(
    round(__import__("math").cos(_2PI_K_OVER_N * i) * 10_000)
    for i in range(AUDIO_WINDOW)
)
GOERTZEL_SIN = tuple(
    round(__import__("math").sin(_2PI_K_OVER_N * i) * 10_000)
    for i in range(AUDIO_WINDOW)
)

GOERTZEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("power_q", T.LongType()),
    ]
)


def goertzel_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per FULL 64-sample window, the quantized
    single-bin DFT power — (Σ x·cos_q)² + (Σ x·sin_q)² — the Goertzel
    tone-detection primitive (DTMF / pilot-tone / alias probes). Codec
    stubbed as in audio_energy_batch (bytes = samples); the window dot
    products are one int64 matmul per blob (numpy reshape → @), no
    per-sample Python. Partial tail windows are dropped: the
    coefficient table is aligned to full windows by construction."""
    import numpy as np

    cosq = np.asarray(GOERTZEL_COS, dtype=np.int64)
    sinq = np.asarray(GOERTZEL_SIN, dtype=np.int64)
    for pdf in batches:
        ids, wins, pows = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n_win = len(samples) // AUDIO_WINDOW
            if n_win == 0:
                continue
            mat = samples[: n_win * AUDIO_WINDOW].reshape(n_win, AUDIO_WINDOW)
            dc = mat @ cosq
            ds = mat @ sinq
            ids.extend([doc_id] * n_win)
            wins.extend(range(n_win))
            pows.extend((dc * dc + ds * ds).tolist())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_idx": pd.Series(wins, dtype="int64"),
                "power_q": pd.Series(pows, dtype="int64"),
            }
        )


def goertzel_power(df: DataFrame) -> DataFrame:
    """Distributed single-bin tone power per full window — same
    Arrow-batched plumbing as :func:`audio_energy`."""
    from ..io import ensure_parallelism

    return ensure_parallelism(to_binary_docs(df)).mapInPandas(
        goertzel_batch, GOERTZEL_SCHEMA
    )


#: Video keyframe-selection stub parameters: a "frame" is FRAME_BYTES
#: consecutive payload bytes (codec seam — a real decoder yields per-
#: frame luma instead), a scene cut is an absolute luma jump >=
#: CUT_THRESHOLD between adjacent frames.
FRAME_BYTES = 16
CUT_THRESHOLD = 96

KEYFRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("luma", T.LongType()),
        T.StructField("delta", T.LongType()),  # |luma - prev|; 0 @ frame 0
    ]
)


def keyframe_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary clip → per-frame luma + adjacent-frame
    delta. The per-frame "luma" is the exact int64 sum of that frame's
    bytes (codec stub, same seam as audio_energy_batch); the delta is
    numpy diff WITHIN the blob — frames of one clip are local to one
    worker by construction, so no cross-row Spark dependency and no
    window shuffle is ever needed for it. Partial tail frames are
    dropped (aligned-frame contract, as goertzel_batch)."""
    import numpy as np

    for pdf in batches:
        ids, fidx, lumas, deltas = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            v = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n_fr = len(v) // FRAME_BYTES
            if n_fr == 0:
                continue
            luma = v[: n_fr * FRAME_BYTES].reshape(n_fr, FRAME_BYTES).sum(axis=1)
            delta = np.abs(np.diff(luma, prepend=luma[:1]))
            ids.extend([doc_id] * n_fr)
            fidx.extend(range(n_fr))
            lumas.extend(luma.tolist())
            deltas.extend(delta.tolist())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(fidx, dtype="int64"),
                "luma": pd.Series(lumas, dtype="int64"),
                "delta": pd.Series(deltas, dtype="int64"),
            }
        )


def keyframes(df: DataFrame) -> DataFrame:
    """Distributed per-frame luma/delta — same Arrow-batched plumbing
    as :func:`audio_energy` / :func:`goertzel_power`."""
    from ..io import ensure_parallelism

    return ensure_parallelism(to_binary_docs(df)).mapInPandas(
        keyframe_batch, KEYFRAME_SCHEMA
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def dhash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary image → 63-bit difference hash. The
    decoded "luma grid" is the payload's first 72 bytes as 8 rows x 9
    columns (codec stub — swap a real decode+resize at this seam); bit
    b (row = b//8, col = b%8) is set iff grid[row, col] >
    grid[row, col+1]. Bit 63 stays unused so the hash lives in a
    signed 64-bit lane portable to engines without unsigned ints.
    Vectorized numpy per Arrow batch — an earlier pure-expression form
    (126 element_at references over the codepoint array) was re-inlined
    by CollapseProject and cost 51 s at sf0.1; this kernel is the
    multimodal family's standard one-Arrow-boundary shape (mm9/mm10)."""
    import numpy as np

    weights = (1 << np.arange(63, dtype=np.int64))
    for pdf in batches:
        ids, hashes = [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            v = np.frombuffer(payload, dtype=np.uint8)
            if len(v) < 72:
                continue
            grid = v[:72].astype(np.int64).reshape(8, 9)
            bits = (grid[:, :8] > grid[:, 1:]).reshape(-1)[:63]
            ids.append(doc_id)
            hashes.append(int((bits * weights).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "dhash": pd.Series(hashes, dtype="int64"),
            }
        )


def image_dhashes(df: DataFrame) -> DataFrame:
    """Distributed per-image dHash — same Arrow-batched plumbing as
    :func:`keyframes` / :func:`audio_energy`."""
    from ..io import ensure_parallelism

    return ensure_parallelism(to_binary_docs(df)).mapInPandas(
        dhash_batch, DHASH_SCHEMA
    )


#: Mel-style filterbank stub over the 64-sample window: 4 DFT bins
#: (Goertzel form) mixed into 3 overlapping triangular bands. Trig is
#: quantized at 1e2 (not mm9's 1e4) so the band mix stays in int64:
#: |dot| <= 255*100*64 ≈ 1.6e6, power ≈ 2.7e12, × weight (<=1000) ×
#: 4 bins ≈ 1.1e16 per window — exact on both engines (the
#: d56-literals pattern: no engine evaluates trig).
MEL_BINS = (2, 5, 9, 14)
MEL_WEIGHTS = (  # 3 bands × 4 bins, each row sums to 1000
    (700, 300, 0, 0),
    (0, 500, 500, 0),
    (0, 0, 400, 600),
)
_MEL_QUANT = 100


def _mel_trig():
    import math

    cos_t, sin_t = [], []
    for k in MEL_BINS:
        w = 2.0 * math.pi * k / AUDIO_WINDOW
        cos_t.append(
            tuple(round(math.cos(w * i) * _MEL_QUANT) for i in range(AUDIO_WINDOW))
        )
        sin_t.append(
            tuple(round(math.sin(w * i) * _MEL_QUANT) for i in range(AUDIO_WINDOW))
        )
    return tuple(cos_t), tuple(sin_t)


MEL_COS, MEL_SIN = _mel_trig()

MEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("e0", T.LongType()),
        T.StructField("e1", T.LongType()),
        T.StructField("e2", T.LongType()),
    ]
)


def mel_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per full window, 4 quantized Goertzel bin
    powers mixed into 3 integer band energies — two int64 matmuls per
    blob (samples → bin dots, powers → band mix)."""
    import numpy as np

    C = np.asarray(MEL_COS, dtype=np.int64).T  # (WINDOW, 4)
    S = np.asarray(MEL_SIN, dtype=np.int64).T
    W = np.asarray(MEL_WEIGHTS, dtype=np.int64)  # (3, 4)
    for pdf in batches:
        ids, wins, es = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n_win = len(samples) // AUDIO_WINDOW
            if n_win == 0:
                continue
            mat = samples[: n_win * AUDIO_WINDOW].reshape(n_win, AUDIO_WINDOW)
            dc = mat @ C  # (n_win, 4)
            ds = mat @ S
            p = dc * dc + ds * ds
            e = p @ W.T  # (n_win, 3)
            ids.extend([doc_id] * n_win)
            wins.extend(range(n_win))
            es.append(e)
        if ids:
            e_all = np.vstack(es)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(wins, dtype="int64"),
                    "e0": e_all[:, 0],
                    "e1": e_all[:, 1],
                    "e2": e_all[:, 2],
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "window_idx": pd.Series([], dtype="int64"),
                    "e0": pd.Series([], dtype="int64"),
                    "e1": pd.Series([], dtype="int64"),
                    "e2": pd.Series([], dtype="int64"),
                }
            )


def mel_filterbank(df: DataFrame) -> DataFrame:
    """Distributed mel-style band energies per full window — same
    Arrow-batched plumbing as :func:`goertzel_power`."""
    from ..io import ensure_parallelism

    return ensure_parallelism(to_binary_docs(df)).mapInPandas(
        mel_batch, MEL_SCHEMA
    )


#: Cepstral mix for the MFCC-style coefficients: DCT-II over the 3
#: mel bands, quantized at 1e3 (round(cos(pi*k*(2m+1)/6) * 1000)) so
#: the whole cepstrum stays exact int64 — no engine evaluates trig or
#: ln. The "log" step is the integer bit-length of the (>> 10)-scaled
#: band energy: exact on both engines (numpy frexp below 2^53 after
#: the shift — energies cap at ~1.1e16, shifted ~1.1e13; DuckDB/Spark
#: length(bin(x))), and monotone in the energy, which is all the
#: cepstral mix needs from a log.
MFCC_DCT = (
    (1000, 1000, 1000),
    (866, 0, -866),
    (500, -1000, 500),
)

MFCC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_windows", T.LongType()),
        T.StructField("mfcc0", T.LongType()),
        T.StructField("mfcc1", T.LongType()),
        T.StructField("mfcc2", T.LongType()),
    ]
)


def mfcc_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: mm14's mel band energies per window →
    integer log (bit_length of the >>10-scaled energy) → quantized
    DCT-II mix → per-doc coefficient sums. Three int64 matmuls and one
    frexp per blob — no per-row Python."""
    import numpy as np

    C = np.asarray(MEL_COS, dtype=np.int64).T
    S = np.asarray(MEL_SIN, dtype=np.int64).T
    W = np.asarray(MEL_WEIGHTS, dtype=np.int64)
    Q = np.asarray(MFCC_DCT, dtype=np.int64)
    for pdf in batches:
        ids, nw, cs = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n_win = len(samples) // AUDIO_WINDOW
            if n_win == 0:
                continue
            mat = samples[: n_win * AUDIO_WINDOW].reshape(n_win, AUDIO_WINDOW)
            dc = mat @ C
            ds = mat @ S
            e = (dc * dc + ds * ds) @ W.T  # (n_win, 3) band energies
            x = 1 + (e >> 10)  # < 2^53 ⇒ float64-exact
            bl = np.frexp(x.astype(np.float64))[1].astype(np.int64)
            c = bl @ Q.T  # (n_win, 3) cepstra
            ids.append(doc_id)
            nw.append(n_win)
            cs.append(c.sum(axis=0))
        if ids:
            c_all = np.vstack(cs)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_windows": pd.Series(nw, dtype="int64"),
                    "mfcc0": c_all[:, 0],
                    "mfcc1": c_all[:, 1],
                    "mfcc2": c_all[:, 2],
                }
            )


def audio_mfcc(df: DataFrame) -> DataFrame:
    """Distributed MFCC-style cepstra — same Arrow plumbing as
    :func:`image_dhashes` / :func:`audio_energy`."""
    from ..io import ensure_parallelism

    return ensure_parallelism(to_binary_docs(df)).mapInPandas(
        mfcc_batch, MFCC_SCHEMA
    )


LUMA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dom_bin", T.LongType()),
        T.StructField("dom_n", T.LongType()),
        T.StructField("conc", T.LongType()),
    ]
)

#: 16x16 luma grid (stub decode: first 256 payload bytes) and the
#: 8-bin histogram bucket width (256 levels >> 5).
LUMA_PIXELS = 256
LUMA_BINS = 8


def luma_hist_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary image → 8-bin luma histogram stats.
    The decoded "luma grid" is the payload's first 256 bytes (16x16,
    codec stub — swap a real decode+resize at the mm2 seam); per image
    it emits the DOMINANT bin (argmax, ties to the lowest bin — the
    oracle mirrors with ORDER BY n DESC, bin ASC), the dominant-bin
    pixel count, and an integer CONCENTRATION score
    Σ_b n_b·bit_length(n_b) — maximal for a single-bin (flat/empty)
    image, minimal for a uniform histogram; exact on both engines
    (bit_length = frexp exponent here, length(bin(n)) in DuckDB), the
    mm15 integer-log discipline. Vectorized numpy per Arrow batch —
    one bincount + one frexp per image, no per-pixel Python.

    ASCII seam contract: the stub "decode" reads raw UTF-8 BYTES while
    the DuckDB oracle reads CODEPOINTS — identical only when the
    decoded grid is pure ASCII. Rather than assume the corpus is (the
    repo's fixtures are, arbitrary input isn't), any image whose
    256-byte grid contains a byte >= 128 is FILTERED here, and the
    oracle filters the same images with a [^\\x00-\\x7F] regex over
    its first 256 chars — the two predicates are equivalent (a
    256-byte all-ASCII prefix decodes to exactly the oracle's first
    256 all-ASCII chars, and multibyte sequences trip both). Filtering
    (not raising) keeps the 100 TB shape: one stray non-ASCII doc
    must not kill a full-corpus gate job."""
    import numpy as np

    for pdf in batches:
        ids, dom_bins, dom_ns, concs = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            v = np.frombuffer(payload, dtype=np.uint8)
            if len(v) < LUMA_PIXELS or (v[:LUMA_PIXELS] >= 128).any():
                continue
            bins = v[:LUMA_PIXELS] >> 5
            counts = np.bincount(bins, minlength=LUMA_BINS).astype(np.int64)
            dom = int(np.argmax(counts))  # first max = lowest bin on ties
            nz = counts[counts > 0].astype(np.float64)
            bitlen = np.frexp(nz)[1]  # exact for counts <= 2^53
            ids.append(doc_id)
            dom_bins.append(dom)
            dom_ns.append(int(counts[dom]))
            concs.append(int((nz.astype(np.int64) * bitlen).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "dom_bin": pd.Series(dom_bins, dtype="int64"),
                "dom_n": pd.Series(dom_ns, dtype="int64"),
                "conc": pd.Series(concs, dtype="int64"),
            }
        )


def image_luma_stats(df: DataFrame) -> DataFrame:
    """Distributed per-image luma-histogram stats — same Arrow-batched
    plumbing as :func:`image_dhashes`."""
    from ..io import ensure_parallelism

    return ensure_parallelism(to_binary_docs(df)).mapInPandas(
        luma_hist_batch, LUMA_SCHEMA
    )
