"""Multimodal media operators: decode → resize → feature-extract in batches.

The training-data pipeline treats image/audio/video as opaque media_refs with
typed metadata (SURVEY.md §1.3 span conventions); feature extraction runs as
mapInPandas so payloads decode inside Arrow batches, never per-row Python at
the DataFrame layer. The sandbox decoders are deterministic fakes
(media.resolve_image/resolve_frames — PIL/ffmpeg absent); the Spark plumbing
(schemas, batching, resize/pool kernels, frame-sampling) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from geotreehealth_spark import media


def image_features(
    refs: DataFrame,
    id_col: str = "doc_id",
    ref_col: str = "media_ref",
    src_hw: tuple[int, int] = (64, 64),
    out_hw: tuple[int, int] = (16, 16),
) -> DataFrame:
    """Per image: decode, bilinear-resize to out_hw, per-channel mean/std.

    Output: (id, feat: array<double> of 6 = mean_rgb + std_rgb, n_px int).
    """
    schema = f"{id_col} string, feat array<double>, n_px long"
    sh, sw = src_hw
    oh, ow = out_hw

    def per_batch(it):
        for pdf in it:
            ids, feats, npx = [], [], []
            for row in pdf.itertuples():
                img = media.resolve_image(getattr(row, ref_col), sh, sw)
                small = media.resize_bilinear(img, oh, ow)
                flat = small.reshape(-1, small.shape[2])
                feats.append(
                    np.concatenate([flat.mean(axis=0), flat.std(axis=0)]).tolist()
                )
                ids.append(str(getattr(row, id_col)))
                npx.append(oh * ow)
            yield pd.DataFrame({id_col: ids, "feat": feats, "n_px": npx})

    return refs.select(id_col, ref_col).mapInPandas(per_batch, schema)


def audio_features(
    refs: DataFrame,
    id_col: str = "doc_id",
    ref_col: str = "media_ref",
    n_samples: int = 16000,
    sample_rate: int = 16000,
    frame: int = 1024,
    hop: int = 512,
) -> DataFrame:
    """Per clip: windowed audio features over the decoded waveform.

    Output: (id, frame_idx int, rms double, zcr double, centroid double) —
    one row per analysis window (the exploded layout downstream filters
    expect): RMS energy, zero-crossing rate, and FFT spectral centroid in Hz.
    Decode + framing + FFT all run vectorized inside the Arrow batch; the
    sandbox decoder is the deterministic media.resolve_audio (production
    audio decode is the decode_external hook).
    """
    schema = f"{id_col} string, frame_idx int, rms double, zcr double, centroid double"

    def per_batch(it):
        freqs = np.fft.rfftfreq(frame, d=1.0 / sample_rate)
        for pdf in it:
            ids, fidx, rms, zcr, cent = [], [], [], [], []
            for row in pdf.itertuples():
                wave = media.resolve_audio(
                    getattr(row, ref_col), n_samples, sample_rate
                ).astype(np.float64)
                n_frames = max((len(wave) - frame) // hop + 1, 0)
                if n_frames == 0:
                    continue
                idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
                frames = wave[idx]  # (n_frames, frame) — one strided gather
                e = np.sqrt(np.mean(frames * frames, axis=1))
                z = np.mean(np.abs(np.diff(np.signbit(frames), axis=1)), axis=1)
                mag = np.abs(np.fft.rfft(frames, axis=1))
                denom = mag.sum(axis=1)
                c = np.where(denom > 0, (mag * freqs[None, :]).sum(axis=1) /
                             np.where(denom > 0, denom, 1.0), 0.0)
                ids.extend([str(getattr(row, id_col))] * n_frames)
                fidx.extend(range(n_frames))
                rms.extend(e.tolist())
                zcr.extend(z.tolist())
                cent.extend(c.tolist())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "rms": rms, "zcr": zcr, "centroid": cent}
            )

    return refs.select(id_col, ref_col).mapInPandas(per_batch, schema)


def frame_sample_features(
    refs: DataFrame,
    id_col: str = "doc_id",
    ref_col: str = "media_ref",
    n_frames: int = 32,
    stride: int = 8,
    hw: tuple[int, int] = (32, 32),
) -> DataFrame:
    """Per clip: sample every `stride`-th frame, per-frame channel means.

    Output: (id, frame_idx int, feat array<double> of 3). One row per sampled
    frame — the exploded layout downstream dedup/similarity ops expect.
    """
    schema = f"{id_col} string, frame_idx int, feat array<double>"
    h, w = hw

    def per_batch(it):
        for pdf in it:
            ids, fidx, feats = [], [], []
            for row in pdf.itertuples():
                frames = media.resolve_frames(
                    getattr(row, ref_col), n_frames, stride, h, w
                )
                for i, fr in enumerate(frames):
                    ids.append(str(getattr(row, id_col)))
                    fidx.append(i)
                    feats.append(fr.reshape(-1, 3).mean(axis=0).tolist())
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx, "feat": feats})

    return refs.select(id_col, ref_col).mapInPandas(per_batch, schema)
