"""Multimodal payload transform stage: decode -> resample to a canonical
sample rate -> feature/checksum, in ONE Arrow crossing.

The audio analog of the image-resize / video-frame-sample preprocessing
stage of a multimodal training pipeline (reference analog: the Step1
decode-and-reformat pass that normalizes every trajectory into one
canonical representation before any rule runs,
Step1-Read-Data-Formatting.R:16-34,59-62): every clip is normalized to one
sample rate before featurization or model consumption.  Same UDF
discipline as scoring: codec-dispatched decode (never PCM-interpreting
compressed bytes), batch iterator (no per-row Python), `bytes` consumed
inside the UDF so downstream rows are ~100 B.

The emitted columns are the resampled clip's STATS + content checksum
rather than the payload itself — the common case is writing the
normalized payload to a new table, which jobs do by adding the pcm bytes
to the schema; the demo entry keeps scalar outputs so the driver harness
can canonicalize rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import audio_core, config

TARGET_SR = 16000

RESAMPLED_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("sr_from", T.IntegerType(), True),
    T.StructField("sr_to", T.IntegerType(), False),
    T.StructField("n_samples_out", T.IntegerType(), True),
    T.StructField("rms_out", T.DoubleType(), True),
    T.StructField("resampled_checksum", T.StringType(), True),
])


def _resample_batch(pdf: pd.DataFrame, target_sr: int) -> pd.DataFrame:
    n = len(pdf)
    n_out = [None] * n
    rms = [None] * n
    ck = [None] * n
    srs = [None] * n
    for i, (payload, sr, codec) in enumerate(
            zip(pdf["bytes"], pdf["sr_hz"], pdf["codec"])):
        sr_i = int(sr) if pd.notna(sr) else None
        if sr_i is None or sr_i < 1000:
            continue  # unusable rate -> null outputs (SR_INVALID's concern)
        p = bytes(payload) if payload is not None else None
        pcm = audio_core.decode_payload(p, config.canon_codec(codec))
        if pcm is None or pcm.size == 0:
            continue
        out = audio_core.resample_linear(pcm, sr_i, target_sr)
        srs[i] = sr_i
        n_out[i] = int(out.size)
        x = out.astype(np.float32)
        # einsum keeps this per-clip reduction BLAS-free (see
        # audio_core._features_pcm for the thread-wake-cost rationale)
        rms[i] = (float(np.sqrt(np.einsum("i,i->", x, x) / out.size)
                        / audio_core.INT16_FULL_SCALE) if out.size else 0.0)
        ck[i] = hashlib.blake2b(out, digest_size=16).hexdigest()
    return pd.DataFrame({
        "clip_id": pdf["clip_id"].values,
        "sr_from": pd.array(srs, dtype="Int32"),
        "sr_to": pd.array([target_sr] * n, dtype="int32"),
        "n_samples_out": pd.array(n_out, dtype="Int32"),
        "rms_out": pd.array(rms, dtype="Float64"),
        "resampled_checksum": ck,
    })


def resample_clips(clips: DataFrame, target_sr: int = TARGET_SR) -> DataFrame:
    """clips -> per-clip resample stats at the canonical rate (bytes
    consumed inside the UDF)."""
    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _resample_batch(pdf, target_sr)

    cols = ["clip_id", "bytes", "sr_hz", "codec"]
    return clips.select(*cols).mapInPandas(_iter, schema=RESAMPLED_SCHEMA)
