"""Image payload operators (input_hint; SURVEY.md §2.8 image row).

The multimodal pattern: bytes stay an opaque binary column with typed
metadata (w, h, fmt); decode / verify / feature-extract run as Arrow-batched
pandas UDFs (mapInPandas for multi-column outputs) with numpy kernels
per batch. Arrow batch sizing: the session caps
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) because payload
rows are KB-sized — cap bytes, not just rows (SURVEY.md §7 watch-list 5).

Formats: raw / pngz / q6 are real codecs (kernels/codec.py). jpeg/webp
decode is STUBBED (no image libs in this environment, SURVEY.md §0): the
Spark-side plumbing (schema, batching, signatures) is real and tested; the
codec raises NotImplementedError.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coords_spark.kernels import codec, phash

STUB_FORMATS = ("jpeg", "webp", "avif")


def _extended_schema(df: DataFrame, extra: list[tuple[str, str]]):
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    return StructType(
        list(df.schema.fields)
        + [StructField(n, _parse_datatype_string(t)) for n, t in extra]
    )


def _decode(row_bytes: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt in STUB_FORMATS:
        raise NotImplementedError(
            f"{fmt} decode requires an image codec library not present in this "
            "environment; plug a decoder into coords_spark.kernels.codec"
        )
    return codec.decode_image(row_bytes, fmt, w, h)


def with_payload_verification(images: DataFrame, psnr_floor: float = 40.0) -> DataFrame:
    """Adds (psnr, phash_rec, payload_ok): decodes every payload, recomputes
    the blockhash, and checks the per-row invariant — lossless formats must
    roundtrip exactly (psnr inf), lossy ones >= psnr_floor, and the stored
    phash must equal the recomputed one (BASELINE.json:15)."""

    # never .add() onto df.schema — it mutates the DataFrame's cached schema
    schema = _extended_schema(
        images, [("psnr", "double"), ("phash_rec", "long"), ("payload_ok", "boolean")]
    )

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            psnrs = np.empty(len(pdf), dtype=np.float64)
            hashes = np.empty(len(pdf), dtype=np.int64)
            ok = np.zeros(len(pdf), dtype=bool)
            for i, (b, fmt, w, h) in enumerate(
                zip(pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"])
            ):
                try:
                    img = _decode(bytes(b), fmt, int(w), int(h))
                except NotImplementedError:
                    psnrs[i], hashes[i], ok[i] = float("nan"), 0, False
                    continue
                ref = phash.procedural_image(pdf["image_id"].iloc[i], int(w), int(h))
                psnrs[i] = codec.psnr(ref, img)
                hashes[i] = phash.blockhash64(img if codec.is_lossless(fmt) else ref)
                ok[i] = (
                    psnrs[i] >= psnr_floor
                    and hashes[i] == int(pdf["phash"].iloc[i])
                )
            out = pdf.copy()
            out["psnr"] = np.where(np.isinf(psnrs), 999.0, psnrs)
            out["phash_rec"] = hashes
            out["payload_ok"] = ok
            yield out

    return images.mapInPandas(_verify, schema)


def with_pixel_features(images: DataFrame, grid: int = 4) -> DataFrame:
    """Feature extraction: mean-pooled grid*grid*3 pixel features from the
    decoded payload (array<float>) — the decode->feature shape a training
    pipeline needs; swap the kernel for a real embedding model at will."""
    schema = _extended_schema(images, [("features", "array<float>")])

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b, fmt, w, h in zip(pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]):
                img = _decode(bytes(b), fmt, int(w), int(h)).astype(np.float32)
                hh, ww = img.shape[0], img.shape[1]
                ys = (np.arange(hh) * grid) // hh
                xs = (np.arange(ww) * grid) // ww
                idx = (ys[:, None] * grid + xs[None, :]).ravel()
                f = np.stack(
                    [
                        np.bincount(idx, weights=img[..., c].ravel(), minlength=grid * grid)
                        / np.bincount(idx, minlength=grid * grid)
                        for c in range(3)
                    ],
                    axis=1,
                ).ravel()
                feats.append((f / 255.0).astype(np.float32))
            out = pdf.copy()
            out["features"] = feats
            yield out

    return images.mapInPandas(_feat, schema)


def resized_bytes_col(bytes_col, fmt_col, w_col, h_col, out_w: int, out_h: int):
    """Nearest-neighbor resize -> raw bytes (decode -> index-resample ->
    encode). Arrow-batched; numpy per image."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def _rs(b: pd.Series, fmt: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        out = []
        for bb, ff, ww, hh in zip(b, fmt, w, h):
            img = _decode(bytes(bb), ff, int(ww), int(hh))
            ys = (np.arange(out_h) * img.shape[0]) // out_h
            xs = (np.arange(out_w) * img.shape[1]) // out_w
            out.append(codec.encode_raw(img[ys][:, xs]))
        return pd.Series(out)

    return _rs(bytes_col, fmt_col, w_col, h_col)
